package graft.plans

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The CUSTOM remainder of the mergeable-sketch family — only what
  * Spark 4 does not already ship. Spark 4.1's `functions` covers HLL
  * (`hll_sketch_agg`/`hll_union_agg`), THETA including set algebra
  * (`theta_sketch_agg`/`theta_union_agg`/`theta_intersection`/
  * `theta_difference`/`theta_sketch_estimate`), and KLL build + scalar
  * ops (`kll_sketch_agg_double`, `kll_sketch_get_quantile_double`,
  * pairwise `kll_sketch_merge_double`) — [[graft.operators.Sketches]]
  * rides those built-ins directly (the §7.3 rule: built-ins first,
  * custom expressions only where the built-ins genuinely can't).
  *
  * What is genuinely missing, implemented here:
  *   - [[KllMergeAgg]]: an AGGREGATE that merges a COLUMN of persisted
  *     KLL sketch bytes (the per-batch sketch-table regroup;
  *     `kll_sketch_merge_double` is a two-argument scalar, so without
  *     this the merge of N rows needs an N-deep expression tree);
  *   - [[FreqItemsAgg]] / [[FreqMergeAgg]] / [[FreqTopItems]]:
  *     frequent-items (Misra-Gries heavy hitters) has no Spark
  *     built-in at all;
  *   - [[BloomSidecarContains]]: constant-map bloom membership for the
  *     dedup-index sidecar (Spark's `might_contain` accepts only a
  *     single constant bloom).
  *
  * The aggregates are `TypedImperativeAggregate`s — the execution
  * shape of Spark's own sketch aggregates: the buffer lives as a plain
  * JVM object across per-row `update` calls and serializes only at
  * partial-aggregation shuffle boundaries, so plans run through
  * `ObjectHashAggregateExec` with map-side partials and the exchange
  * carries one small sketch per group per task. All sketch bytes are
  * standard cross-tool DataSketches formats (the library Spark itself
  * bundles), so custom-built and built-in-built sketches interoperate.
  */
object SketchAggregates {

  private def aggCol(f: TypedImperativeAggregate[_]): Column =
    GraftBridge.column(f.toAggregateExpression())

  /** Merge a column of KLL sketch bytes (as produced by Spark's
    * `kll_sketch_agg_double` — byte-compatible DataSketches format). */
  def kll_merge_agg(c: Column, k: Int = 200): Column =
    aggCol(KllMergeAgg(GraftBridge.expression(c), k))

  /** Frequent-items sketch of a String column. EXACT while the distinct
    * item count stays under 0.75x`maxMapSize` (no purges); beyond that
    * the classic Misra-Gries error bound `getMaximumError` applies.
    * `maxMapSize` must be a power of 2. */
  def freq_items_agg(c: Column, maxMapSize: Int = 1024): Column =
    aggCol(FreqItemsAgg(GraftBridge.expression(c), maxMapSize))

  /** Merge a column of frequent-items sketch bytes. */
  def freq_merge_agg(c: Column, maxMapSize: Int = 1024): Column =
    aggCol(FreqMergeAgg(GraftBridge.expression(c), maxMapSize))

  /** Top-`k` items as `array<struct<item,est>>`, ordered est desc then
    * item asc (deterministic; NO_FALSE_POSITIVES). */
  def freq_top_items(c: Column, k: Int): Column =
    GraftBridge.column(FreqTopItems(GraftBridge.expression(c), k))

  private[plans] val stringSerDe = new ArrayOfStringsSerDe

  /** Register the custom sketch functions for `spark.sql` use
    * (per-session alternative to [[GraftExtensions]]; the theta/KLL
    * built-ins are already in Spark's own registry). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = GraftBridge.functionRegistry(spark)
    def intArg(exprs: Seq[Expression], i: Int, default: Int): Int =
      exprs.lift(i).map(_.eval().asInstanceOf[Int]).getOrElse(default)
    reg.createOrReplaceTempFunction("kll_merge_agg",
      exprs => KllMergeAgg(exprs.head, intArg(exprs, 1, 200)), "scala_udf")
    reg.createOrReplaceTempFunction("freq_items_agg",
      exprs => FreqItemsAgg(exprs.head, intArg(exprs, 1, 1024)), "scala_udf")
    reg.createOrReplaceTempFunction("freq_merge_agg",
      exprs => FreqMergeAgg(exprs.head, intArg(exprs, 1, 1024)), "scala_udf")
    reg.createOrReplaceTempFunction("freq_top_items",
      exprs => FreqTopItems(exprs.head, intArg(exprs, 1, 10)), "scala_udf")
  }
}

/** Common plumbing for the sketch `TypedImperativeAggregate`s. */
trait SketchAgg[T] extends UnaryLike[Expression] {
  self: TypedImperativeAggregate[T] =>
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
}

/** Merges a BINARY column of persisted KLL doubles sketches. */
case class KllMergeAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with SketchAgg[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"k out of range: $k")

  override def prettyName: String = "kll_merge_agg"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kll_merge_agg expects sketch bytes, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(sk: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      sk.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    sk
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b)
    a
  }

  override def eval(sk: KllDoublesSketch): Any = sk.toByteArray
  override def serialize(sk: KllDoublesSketch): Array[Byte] = sk.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg =
    copy(child = c)
}

/** Frequent-items (heavy hitters) sketch over a String column. */
case class FreqItemsAgg(
    child: Expression, maxMapSize: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with SketchAgg[ItemsSketch[String]] {

  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    s"maxMapSize must be a power of 2 >= 8: $maxMapSize")

  override def prettyName: String = "freq_items_agg"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"freq_items_agg expects STRING, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(sk: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) sk.update(v.asInstanceOf[UTF8String].toString)
    sk
  }

  override def merge(a: ItemsSketch[String], b: ItemsSketch[String]): ItemsSketch[String] =
    a.merge(b)

  override def eval(sk: ItemsSketch[String]): Any =
    sk.toByteArray(SketchAggregates.stringSerDe)
  override def serialize(sk: ItemsSketch[String]): Array[Byte] =
    sk.toByteArray(SketchAggregates.stringSerDe)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), SketchAggregates.stringSerDe)

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqItemsAgg =
    copy(child = c)
}

/** Merges a BINARY column of persisted frequent-items sketches. */
case class FreqMergeAgg(
    child: Expression, maxMapSize: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with SketchAgg[ItemsSketch[String]] {

  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    s"maxMapSize must be a power of 2 >= 8: $maxMapSize")

  override def prettyName: String = "freq_merge_agg"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"freq_merge_agg expects sketch bytes, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(sk: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v == null) sk
    else sk.merge(ItemsSketch.getInstance(
      Memory.wrap(v.asInstanceOf[Array[Byte]]), SketchAggregates.stringSerDe))
  }

  override def merge(a: ItemsSketch[String], b: ItemsSketch[String]): ItemsSketch[String] =
    a.merge(b)

  override def eval(sk: ItemsSketch[String]): Any =
    sk.toByteArray(SketchAggregates.stringSerDe)
  override def serialize(sk: ItemsSketch[String]): Array[Byte] =
    sk.toByteArray(SketchAggregates.stringSerDe)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), SketchAggregates.stringSerDe)

  override def withNewMutableAggBufferOffset(o: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqMergeAgg =
    copy(child = c)
}

/** The per-leaf bloom map carried by [[BloomSidecarContains]].
  * A class of its own for one load-bearing reason: `Expression.toString`
  * (and therefore every plan-description string the listener bus
  * renders per execution) flattens expression arguments — a raw
  * `Map[Int, Seq[Byte]]` would stringify megabytes of bloom bytes into
  * each explain/SQL-event payload. This wrapper renders as a short
  * summary while keeping value-based equality for semanticEquals.
  * Equality compares sizes + a cheap per-leaf byte-length fingerprint,
  * not full byte arrays (two sidecars of the same layout differing
  * only in set bits are astronomically unlikely to collide on
  * (leaf -> length) while sharing a query plan in one process). */
final class BloomSidecar(val blooms: Map[Int, Seq[Byte]])
    extends Serializable {
  private def fingerprint: Map[Int, Int] = blooms.map { case (k, v) => k -> v.length }
  override def toString: String =
    s"BloomSidecar(${blooms.size} leaves, ${blooms.valuesIterator.map(_.length.toLong).sum} bytes)"
  override def hashCode: Int = fingerprint.hashCode
  override def equals(o: Any): Boolean = o match {
    case b: BloomSidecar => b.fingerprint == fingerprint
    case _ => false
  }
}

object BloomSidecarContains {
  /** Column form over an md5-hex `content_hash` column; `blooms` maps
    * hash-prefix leaf (first two hex chars, base 16 — the
    * `buildExactIndex` layout key) to serialized spark-sketch bloom
    * bytes (what `BloomFilterAggregate` emits). */
  def contains(c: Column, blooms: Map[Int, Seq[Byte]]): Column =
    GraftBridge.column(
      BloomSidecarContains(GraftBridge.expression(c),
        new BloomSidecar(blooms)))
}

/** Membership probe against a per-leaf bloom sidecar held as a codegen
  * reference object: Spark's own `might_contain` requires its bloom to
  * be CONSTANT (it caches one deserialized filter), so a 256-leaf
  * sidecar would need 256 scalar subqueries — this keeps the whole map
  * in one expression instead. Returns false for a hash whose leaf has
  * no bloom (that leaf holds no corpus hashes: definitely absent).
  * The tested hash is `xxhash64(value, seed 42)` — bit-identical to
  * the `functions.xxhash64` the sidecar was built over. The
  * [[BloomSidecar]] wrapper keeps plan strings compact; filters
  * deserialize once per task into the unboxed mirror. */
case class BloomSidecarContains(child: Expression,
                                sidecar: BloomSidecar)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bloom_sidecar_contains"

  @transient private lazy val filters
      : Map[Int, org.apache.spark.util.sketch.BloomFilter] =
    sidecar.blooms.map { case (k, bytes) =>
      k -> org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bytes.toArray))
    }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Public: called from generated code. */
  def compute(hash: UTF8String): Boolean = {
    val s = hash.toString
    if (s.length < 2) return false
    val leaf =
      try Integer.parseInt(s.substring(0, 2), 16)
      catch { case _: NumberFormatException => return false }
    filters.get(leaf) match {
      case None => false
      case Some(f) => f.mightContainLong(
        org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(hash, StringType, 42L))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomSidecar", this,
      classOf[BloomSidecarContains].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): BloomSidecarContains =
    copy(child = c)
}

/** Top-`k` heavy hitters of a frequent-items sketch as
  * `array<struct<item string, est long>>`, est desc then item asc
  * (NO_FALSE_POSITIVES: every returned item's true count is >= its
  * reported lower bound; in exact mode `est` IS the true count). */
case class FreqTopItems(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, s"k must be positive: $k")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "freq_top_items"

  def compute(bytes: Array[Byte]): GenericArrayData = {
    val sk = ItemsSketch.getInstance(
      Memory.wrap(bytes), SketchAggregates.stringSerDe)
    val rows = sk.getFrequentItems(ErrorType.NO_FALSE_POSITIVES)
      .map(r => (r.getItem, r.getEstimate))
      .sortBy { case (item, est) => (-est, item) }
      .take(k)
      .map { case (item, est) =>
        InternalRow(UTF8String.fromString(item), est) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("freqTop", this, classOf[FreqTopItems].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): FreqTopItems =
    copy(child = c)
}
