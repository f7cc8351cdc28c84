package graft.plans

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.datasketches.theta.{SetOperation, Sketch => ThetaSketch, Sketches => ThetaSketches, Union => ThetaUnion}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable-sketch AGGREGATES beyond Spark's built-in HLL pair
  * (`hll_sketch_agg`/`hll_union_agg`, already used by
  * [[graft.operators.Sketches]]): Theta (distinct counting WITH set
  * algebra — intersection and difference, which HLL cannot do), KLL
  * (mergeable rank/quantile sketches), and frequent-items (heavy
  * hitters). All three wrap Apache DataSketches (the library Spark
  * itself bundles for its HLL functions), so the persisted binary
  * columns are the standard cross-tool DataSketches formats.
  *
  * Each aggregate is a `TypedImperativeAggregate` — the same execution
  * shape as Spark's own `HllSketchAgg`: the buffer lives as a plain JVM
  * object across per-row `update` calls and is serialized ONLY at
  * partial-aggregation shuffle boundaries, so a map task pays one
  * sketch-serialize per (group x task), not per row. Plans run through
  * `ObjectHashAggregateExec` with map-side partial aggregation: the
  * exchange carries one small sketch per group per task — the property
  * that makes the pattern work at 100 TB (see SCALE.md).
  *
  * The post-processing scalars ([[ThetaEstimate]], [[ThetaIntersect]],
  * [[ThetaAnotB]], [[KllQuantile]], [[FreqTopItems]]) evaluate over
  * already-merged sketch rows — metadata-sized inputs, one row per
  * group — and use the same reference-object codegen pattern as
  * [[TextExpressions]] so they never force a stage out of whole-stage
  * codegen.
  */
object SketchAggregates {

  private def aggCol(f: TypedImperativeAggregate[_]): Column =
    GraftBridge.column(f.toAggregateExpression())

  /** Theta distinct sketch of a Long/Int/String/Double/Binary column.
    * `lgK` bounds memory at ~8x2^lgK bytes and the estimate is EXACT
    * while the distinct count stays under ~2^lgK. */
  def theta_sketch_agg(c: Column, lgK: Int = 12): Column =
    aggCol(ThetaSketchAgg(GraftBridge.expression(c), lgK))

  /** Merge a column of theta sketch bytes into one sketch. */
  def theta_union_agg(c: Column, lgK: Int = 12): Column =
    aggCol(ThetaUnionAgg(GraftBridge.expression(c), lgK))

  def theta_estimate(c: Column): Column =
    GraftBridge.column(ThetaEstimate(GraftBridge.expression(c)))

  /** |A ∩ B| as sketch bytes (compose with [[theta_estimate]]). */
  def theta_intersect(a: Column, b: Column): Column =
    GraftBridge.column(
      ThetaIntersect(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** |A \ B| as sketch bytes. */
  def theta_a_not_b(a: Column, b: Column): Column =
    GraftBridge.column(
      ThetaAnotB(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** KLL rank sketch of a Double column; `k`=200 ≈ 1.65% normalized
    * rank error at 99% confidence, ~3 KB serialized. */
  def kll_sketch_agg(c: Column, k: Int = 200): Column =
    aggCol(KllDoublesAgg(GraftBridge.expression(c), k))

  /** Merge a column of KLL sketch bytes. */
  def kll_merge_agg(c: Column, k: Int = 200): Column =
    aggCol(KllMergeAgg(GraftBridge.expression(c), k))

  /** Quantile at rank `q` (INCLUSIVE criteria, matching DuckDB/Spark
    * rank conventions closely enough for band gates); null for an empty
    * sketch. */
  def kll_quantile(c: Column, q: Double): Column =
    GraftBridge.column(KllQuantile(GraftBridge.expression(c), q))

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

  // ---- shared (de)serialization helpers ----

  private[plans] def heapifyTheta(bytes: Array[Byte]): ThetaSketch =
    ThetaSketches.heapifySketch(Memory.wrap(bytes))

  private[plans] def newThetaUnion(lgK: Int): ThetaUnion =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  private[plans] val stringSerDe = new ArrayOfStringsSerDe

  /** Register the sketch aggregates + scalars for `spark.sql` use
    * (per-session alternative to [[GraftExtensions]]). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = GraftBridge.functionRegistry(spark)
    def intArg(exprs: Seq[Expression], i: Int, default: Int): Int =
      exprs.lift(i).map(_.eval().asInstanceOf[Int]).getOrElse(default)
    reg.createOrReplaceTempFunction("theta_sketch_agg",
      exprs => ThetaSketchAgg(exprs.head, intArg(exprs, 1, 12)), "scala_udf")
    reg.createOrReplaceTempFunction("theta_union_agg",
      exprs => ThetaUnionAgg(exprs.head, intArg(exprs, 1, 12)), "scala_udf")
    reg.createOrReplaceTempFunction("theta_estimate",
      exprs => ThetaEstimate(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("theta_intersect",
      exprs => ThetaIntersect(exprs.head, exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("theta_a_not_b",
      exprs => ThetaAnotB(exprs.head, exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("kll_sketch_agg",
      exprs => KllDoublesAgg(exprs.head, intArg(exprs, 1, 200)), "scala_udf")
    reg.createOrReplaceTempFunction("kll_merge_agg",
      exprs => KllMergeAgg(exprs.head, intArg(exprs, 1, 200)), "scala_udf")
    reg.createOrReplaceTempFunction("kll_quantile",
      exprs => KllQuantile(exprs.head,
        exprs(1).eval().asInstanceOf[Double]), "scala_udf")
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

/** Theta distinct sketch over raw values. The buffer is a theta
  * `Union` (which accepts raw updates directly), so build and merge
  * share one buffer type. */
case class ThetaSketchAgg(
    child: Expression, lgK: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ThetaUnion] with SketchAgg[ThetaUnion] {

  require(lgK >= 4 && lgK <= 26, s"lgK out of range: $lgK")

  override def prettyName: String = "theta_sketch_agg"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | StringType | DoubleType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"theta_sketch_agg does not support ${other.simpleString}")
    }

  override def createAggregationBuffer(): ThetaUnion =
    SketchAggregates.newThetaUnion(lgK)

  override def update(u: ThetaUnion, input: InternalRow): ThetaUnion = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType    => u.update(v.asInstanceOf[Long])
      case IntegerType => u.update(v.asInstanceOf[Int].toLong)
      case StringType  => u.update(v.asInstanceOf[UTF8String].toString)
      case DoubleType  => u.update(v.asInstanceOf[Double])
      case BinaryType  => u.update(v.asInstanceOf[Array[Byte]])
      case other => throw new IllegalStateException(other.simpleString)
    }
    u
  }

  override def merge(a: ThetaUnion, b: ThetaUnion): ThetaUnion = {
    a.union(b.getResult)
    a
  }

  override def eval(u: ThetaUnion): Any = u.getResult.toByteArray

  override def serialize(u: ThetaUnion): Array[Byte] = u.toByteArray
  override def deserialize(bytes: Array[Byte]): ThetaUnion =
    SetOperation.heapify(Memory.wrap(bytes)).asInstanceOf[ThetaUnion]

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
}

/** Merges a BINARY column of persisted theta sketches (re-aggregation /
  * coarser regroup without rescanning data). */
case class ThetaUnionAgg(
    child: Expression, lgK: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ThetaUnion] with SketchAgg[ThetaUnion] {

  override def prettyName: String = "theta_union_agg"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"theta_union_agg expects sketch bytes, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): ThetaUnion =
    SketchAggregates.newThetaUnion(lgK)

  override def update(u: ThetaUnion, input: InternalRow): ThetaUnion = {
    val v = child.eval(input)
    if (v != null) u.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    u
  }

  override def merge(a: ThetaUnion, b: ThetaUnion): ThetaUnion = {
    a.union(b.getResult)
    a
  }

  override def eval(u: ThetaUnion): Any = u.getResult.toByteArray
  override def serialize(u: ThetaUnion): Array[Byte] = u.toByteArray
  override def deserialize(bytes: Array[Byte]): ThetaUnion =
    SetOperation.heapify(Memory.wrap(bytes)).asInstanceOf[ThetaUnion]

  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaUnionAgg =
    copy(child = c)
}

/** KLL doubles rank sketch over a Double column. */
case class KllDoublesAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with SketchAgg[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"k out of range: $k")

  override def prettyName: String = "kll_sketch_agg"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kll_sketch_agg expects DOUBLE, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(sk: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) sk.update(v.asInstanceOf[Double])
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

  override def withNewMutableAggBufferOffset(o: Int): KllDoublesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllDoublesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllDoublesAgg =
    copy(child = c)
}

/** Merges a BINARY column of persisted KLL sketches. */
case class KllMergeAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with SketchAgg[KllDoublesSketch] {

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

// ---- post-processing scalars over sketch bytes ----

/** Distinct-count estimate of a theta sketch (0.0 for empty). */
case class ThetaEstimate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"

  def compute(bytes: Array[Byte]): Double =
    SketchAggregates.heapifyTheta(bytes).getEstimate

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("thetaEst", this, classOf[ThetaEstimate].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
}

/** Intersection of two theta sketches, as compact sketch bytes. */
case class ThetaIntersect(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_intersect"

  def compute(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().buildIntersection()
      .intersect(SketchAggregates.heapifyTheta(a),
        SketchAggregates.heapifyTheta(b))
      .toByteArray

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("thetaInt", this, classOf[ThetaIntersect].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaIntersect = copy(left = l, right = r)
}

/** Set difference A \ B of two theta sketches, as compact sketch bytes. */
case class ThetaAnotB(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_a_not_b"

  def compute(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().buildANotB()
      .aNotB(SketchAggregates.heapifyTheta(a), SketchAggregates.heapifyTheta(b))
      .toByteArray

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("thetaAnb", this, classOf[ThetaAnotB].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaAnotB = copy(left = l, right = r)
}

/** Quantile of a KLL sketch at rank `q`; null for an empty sketch. */
case class KllQuantile(child: Expression, q: Double) extends UnaryExpression {
  require(q >= 0.0 && q <= 1.0, s"rank out of [0,1]: $q")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantile"

  def compute(bytes: Array[Byte]): java.lang.Double = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (sk.isEmpty) null
    else java.lang.Double.valueOf(
      sk.getQuantile(q, QuantileSearchCriteria.INCLUSIVE))
  }

  override def nullSafeEval(input: Any): Any = {
    val r = compute(input.asInstanceOf[Array[Byte]])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kllQ", this, classOf[KllQuantile].getName)
    val r = ctx.freshName("kllq")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Double $r = $ref.compute($c);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }""")
  }

  override protected def withNewChildInternal(c: Expression): KllQuantile =
    copy(child = c)
}

object BloomSidecarContains {
  /** Column form over an md5-hex `content_hash` column; `blooms` maps
    * hash-prefix leaf (first two hex chars, base 16 — the
    * `buildExactIndex` layout key) to serialized spark-sketch bloom
    * bytes (what `BloomFilterAggregate` emits). */
  def contains(c: Column, blooms: Map[Int, Seq[Byte]]): Column =
    GraftBridge.column(
      BloomSidecarContains(GraftBridge.expression(c), blooms))
}

/** Membership probe against a per-leaf bloom sidecar held as a codegen
  * reference object: Spark's own `might_contain` requires its bloom to
  * be CONSTANT (it caches one deserialized filter), so a 256-leaf
  * sidecar would need 256 scalar subqueries — this keeps the whole map
  * in one expression instead. Returns false for a hash whose leaf has
  * no bloom (that leaf holds no corpus hashes: definitely absent).
  * The tested hash is `xxhash64(value, seed 42)` — bit-identical to
  * the `functions.xxhash64` the sidecar was built over. `Seq[Byte]`
  * values keep case-class structural equality (semanticEquals);
  * filters deserialize once per task into the unboxed mirror. */
case class BloomSidecarContains(child: Expression,
                                blooms: Map[Int, Seq[Byte]])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bloom_sidecar_contains"

  @transient private lazy val filters
      : Map[Int, org.apache.spark.util.sketch.BloomFilter] =
    blooms.map { case (k, bytes) =>
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
