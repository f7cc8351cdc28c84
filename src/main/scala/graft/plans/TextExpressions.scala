package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the sketch functions whose
  * higher-order-function formulations are interpreter-bound (SURVEY.md
  * §7.3: the one place custom expressions are expected).
  *
  * The declarative `transform`/`aggregate` versions in
  * [[graft.operators.Dedup]] evaluate ~tokens x numHashes interpreted
  * lambda calls per row (~1.5 ms/doc measured); these do the same math
  * in one JIT-compiled loop (~15 us/doc). Semantics are identical —
  * `DedupSimilaritySpec` asserts expression == declarative on real docs.
  *
  * All five implement `doGenCode` (NOT `CodegenFallback`): each keeps its
  * per-row loop in a public `compute` method and generates a direct call
  * to it through a codegen reference object, so any projection containing
  * a sketch column stays inside whole-stage codegen — a `CodegenFallback`
  * anywhere in a projection forces the whole stage back to interpreted
  * rows (`CollapseCodegenStages` rejects the node), taxing exactly the
  * dedup/ANN queries these expressions exist to speed up.
  */
object TextExpressions {

  val Prime: Long = 2147483647L // 2^31 - 1

  /** The universal-hash coefficient family both implementations share. */
  def minhashCoefficients(numHashes: Int): (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(42)
    val as = Array.fill(numHashes)(math.floorMod(rnd.nextLong(), Prime - 1) + 1)
    val bs = Array.fill(numHashes)(math.floorMod(rnd.nextLong(), Prime))
    (as, bs)
  }

  def minhash_signature(c: Column, numHashes: Int = 32,
                        shingleN: Int = 3): Column =
    GraftBridge.column(
      MinHashSig(GraftBridge.expression(c), numHashes, shingleN))

  def simhash64(c: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(c)))

  def word_shingles(c: Column, n: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(c), n))

  def word_shingles_from_tokens(c: Column, n: Int): Column =
    GraftBridge.column(WordShinglesFromTokens(GraftBridge.expression(c), n))

  def char_bigrams(c: Column): Column =
    GraftBridge.column(CharBigrams(GraftBridge.expression(c)))

  def char_entropy(c: Column): Column =
    GraftBridge.column(CharEntropy(GraftBridge.expression(c)))

  def word_shingle_offsets(c: Column, n: Int): Column =
    GraftBridge.column(WordShingleOffsets(GraftBridge.expression(c), n))

  def srp_signature(c: Column, nBits: Int): Column =
    GraftBridge.column(SrpSignature(GraftBridge.expression(c), nBits))

  def id_pairs(c: Column): Column =
    GraftBridge.column(IdPairs(GraftBridge.expression(c)))

  def nfc_normalize(c: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))

  def nearest_centroid(c: Column, centroids: Seq[Seq[Double]]): Column =
    GraftBridge.column(NearestCentroid(GraftBridge.expression(c), centroids))

  def strip_accents(c: Column): Column =
    GraftBridge.column(StripAccents(GraftBridge.expression(c)))

  /** SQL registration: `SELECT minhash_signature(text, 32, 3), simhash64(text)`. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    GraftBridge.functionRegistry(spark).createOrReplaceTempFunction(
      "minhash_signature",
      exprs => MinHashSig(exprs.head,
        exprs.lift(1).map(_.eval().asInstanceOf[Int]).getOrElse(32),
        exprs.lift(2).map(_.eval().asInstanceOf[Int]).getOrElse(3)),
      "scala_udf")
    GraftBridge.functionRegistry(spark).createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "scala_udf")
    GraftBridge.functionRegistry(spark).createOrReplaceTempFunction(
      "word_shingles",
      exprs => WordShingles(exprs.head,
        exprs.lift(1).map(_.eval().asInstanceOf[Int]).getOrElse(3)),
      "scala_udf")
    GraftBridge.functionRegistry(spark).createOrReplaceTempFunction(
      "char_bigrams", exprs => CharBigrams(exprs.head), "scala_udf")
    GraftBridge.functionRegistry(spark).createOrReplaceTempFunction(
      "char_entropy", exprs => CharEntropy(exprs.head), "scala_udf")
    GraftBridge.functionRegistry(spark).createOrReplaceTempFunction(
      "srp_signature",
      exprs => SrpSignature(exprs.head,
        exprs.lift(1).map(_.eval().asInstanceOf[Int]).getOrElse(8)),
      "scala_udf")
    GraftBridge.functionRegistry(spark).createOrReplaceTempFunction(
      "id_pairs", exprs => IdPairs(exprs.head), "scala_udf")
    GraftBridge.functionRegistry(spark).createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs.head), "scala_udf")
    GraftBridge.functionRegistry(spark).createOrReplaceTempFunction(
      "strip_accents", exprs => StripAccents(exprs.head), "scala_udf")
    GraftBridge.functionRegistry(spark).createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs.head, exprs(1)), "scala_udf")
  }

  private[plans] def tokenize(text: String): Array[String] = {
    val t = text.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }
}

/** MinHash signature over word shingles, as one JIT'd loop per row.
  * Returns null for docs with fewer than `shingleN` tokens (mirrors the
  * declarative guard). */
case class MinHashSig(child: Expression, numHashes: Int, shingleN: Int)
    extends UnaryExpression {
  import TextExpressions._

  require(numHashes > 0 && shingleN > 0)
  private lazy val (as, bs) = minhashCoefficients(numHashes)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Null when the doc has fewer than `shingleN` tokens. Public: called
    * from generated code via a codegen reference object. */
  def compute(input: UTF8String): ArrayData = {
    val toks = tokenize(input.toString)
    if (toks.length < shingleN) return null
    val mins = Array.fill(numHashes)(Prime)
    val seen = new java.util.HashSet[String]()
    val crc = new java.util.zip.CRC32()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + shingleN <= toks.length) {
      sb.setLength(0)
      var k = 0
      while (k < shingleN) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      val sh = sb.toString
      if (seen.add(sh)) {
        crc.reset()
        val bytes = sh.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        crc.update(bytes, 0, bytes.length)
        val h = java.lang.Math.floorMod(crc.getValue, Prime)
        var j = 0
        while (j < numHashes) {
          val v = java.lang.Math.floorMod(as(j) * h + bs(j), Prime)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSig", this, classOf[MinHashSig].getName)
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      $javaType ${ev.value} = null;
      if (!${childGen.isNull}) {
        ${ev.value} = $ref.compute(${childGen.value});
        ${ev.isNull} = (${ev.value} == null);
      }""")
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** Distinct word n-gram shingles (insertion order), same strings as the
  * declarative `TextFunctions.shingles`; docs with fewer than n tokens
  * get an empty array. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {
  import TextExpressions._

  require(n > 0)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Never null for non-null input (short docs get an empty array).
    * Public: called from generated code. */
  def compute(input: UTF8String): ArrayData = {
    val toks = tokenize(input.toString)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

/** [[WordShingles]] over a PRE-TOKENIZED `array<string>` column: the
  * same distinct n-gram strings (insertion order) as
  * `WordShingles(text, n)` whenever the input equals
  * `TextFunctions.tokens(text)` — spec-pinned in TextFunctionsSpec.
  * Exists so a pipeline that already carries a shared token array
  * (curateV2's single-tokenization relation) can derive its
  * decontamination shingles without re-splitting every document.
  * Contract: elements are non-null (what `tokens` produces); fewer
  * than n tokens yields an empty array. */
case class WordShinglesFromTokens(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "word_shingles_from_tokens"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles_from_tokens needs array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Never null for non-null input. Public: called from generated code. */
  def compute(toks: ArrayData): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + n <= m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i + k).toString)
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShinglesFromTokens", this,
      classOf[WordShinglesFromTokens].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): WordShinglesFromTokens =
    copy(child = c)
}

/** POSITIONAL word n-gram spans: every stride-1 offset (not the
  * deduplicated set [[WordShingles]] emits) as
  * `array<struct<pos:int, span:string>>`, `pos` the 0-based token
  * offset. One JIT'd StringBuilder loop per row — the declarative
  * `transform(sequence(0, m-n), i -> array_join(slice(tk, i+1, n)))`
  * formulation re-slices and re-joins per offset and measured ~5x
  * slower end-to-end on the span-range pipeline (SCALE.md r13). Short
  * docs get an empty array. */
case class WordShingleOffsets(child: Expression, n: Int)
    extends UnaryExpression {
  import TextExpressions._

  require(n > 0)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("span", StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "word_shingle_offsets"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Never null for non-null input. Public: called from generated
    * code. */
  def compute(input: UTF8String): ArrayData = {
    val toks = tokenize(input.toString)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      out(i) = org.apache.spark.sql.catalyst.InternalRow(
        i, UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingleOffsets", this,
      classOf[WordShingleOffsets].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): WordShingleOffsets =
    copy(child = c)
}

/** Character bigrams of the lowercased text, non-letters dropped,
  * bigrams spanning a word boundary excluded — same output (order and
  * duplicates included) as the declarative
  * `TextAnalysis.charBigramsDeclarative`, whose
  * `transform(sequence(...), i => substr(cleaned, i, 2))` formulation
  * re-runs the regex clean per character (O(len^2) per doc). */
case class CharBigrams(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "char_bigrams"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Never null for non-null input. Public: called from generated code. */
  def compute(input: UTF8String): ArrayData = {
    val raw = input.toString.toLowerCase
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val ch = raw.charAt(i)
      if ((ch >= 'a' && ch <= 'z') || ch == ' ') sb.append(ch)
      i += 1
    }
    val s = sb.toString
    if (s.length < 2) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any](s.length - 1)
    var j = 0
    while (j < s.length - 1) {
      val a = s.charAt(j); val b = s.charAt(j + 1)
      if (a != ' ' && b != ' ')
        out += UTF8String.fromString(s.substring(j, j + 2))
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charBigrams", this, classOf[CharBigrams].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): CharBigrams =
    copy(child = c)
}

/** Shannon entropy of a string's characters, in bits per character —
  * the compressibility proxy quality filters use to catch gibberish
  * (entropy near log2(alphabet): random noise) and degenerate repetition
  * (entropy near 0: one char dominates) in a single cheap scalar.
  * Natural language sits in a stable band between the two.
  *
  * One JIT'd pass per row: sort the char array, run-length the sorted
  * runs, accumulate -p*log2(p) in CHARACTER order (a fixed summation
  * order, so the value is partition-independent; a differential oracle
  * summing in its own order differs only in low bits — round at the
  * query site, the house register's class). Empty string -> 0.0. No
  * per-row histogram allocation beyond the char array itself. */
case class CharEntropy(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "char_entropy"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Public: called from generated code. */
  def compute(input: UTF8String): Double = {
    val cs = input.toString.toCharArray
    if (cs.length == 0) return 0.0d
    java.util.Arrays.sort(cs)
    val n = cs.length.toDouble
    val ln2 = math.log(2.0d)
    var h = 0.0d
    var i = 0
    while (i < cs.length) {
      var j = i
      while (j < cs.length && cs(j) == cs(i)) j += 1
      val p = (j - i) / n
      h -= p * math.log(p) / ln2
      i = j
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charEntropy", this, classOf[CharEntropy].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): CharEntropy =
    copy(child = c)
}

/** Sign-random-projection bit signature of a float-vector column:
  * `nBits` sign bits of dot products against deterministic pseudo-random
  * +-1 hyperplanes (per-(bit, dim) parity of chained xxhash64, seed 42 —
  * bit-identical to the declarative `xxhash64(bit, d)` formulation kept
  * as the spec in [[graft.operators.Similarity.srpSignatureDeclarative]]).
  *
  * The declarative version is interpreter-bound AND rebuilds the
  * hyperplane array per row (O(nBits x dim) lambda calls + hashes per
  * row, for a matrix that is identical on every row — the r2 bench's
  * q_srp_topk 5x regression). Here the sign matrix is computed once per
  * (expression instance, dimension) and the projection is one JIT'd
  * double loop per row. */
case class SrpSignature(child: Expression, nBits: Int)
    extends UnaryExpression {

  require(nBits > 0 && nBits <= 63)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "srp_signature"

  // reject non-floating element types at analysis time — nullSafeEval
  // reads the array with getFloat/getDouble, which would silently
  // reinterpret e.g. int bytes into garbage sign bits
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> or array<double> input, " +
            s"got ${other.catalogString}")
    }

  // sign matrix cache keyed by vector dimension (dims are uniform per
  // corpus; ConcurrentHashMap because one expression instance may be
  // evaluated by many local-mode tasks concurrently)
  @transient private lazy val signCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Double]]]()

  // accept array<float> (the corpus type) and array<double> (literals)
  @transient private lazy val elementIsDouble = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def signsFor(dim: Int): Array[Array[Double]] =
    signCache.computeIfAbsent(dim, _ =>
      Array.tabulate(nBits) { b =>
        // declarative spec: xxhash64(bit, d) = chained per-column hash,
        // int values, seed 42 (Spark's XxHash64 default)
        val hb = XxHash64Function.hash(b, IntegerType, 42L)
        Array.tabulate(dim) { d =>
          val h = XxHash64Function.hash(d, IntegerType, hb)
          if (java.lang.Math.floorMod(h, 2L) == 0L) 1.0d else -1.0d
        }
      })

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[ArrayData]))

  /** Public: called from generated code. */
  def compute(arr: ArrayData): Long = {
    val dim = arr.numElements()
    val signs = signsFor(dim)
    var out = 0L
    var b = 0
    while (b < nBits) {
      val row = signs(b)
      var acc = 0.0d
      var d = 0
      while (d < dim) {
        // float -> double promotion BEFORE the multiply, matching the
        // declarative zip_with's implicit cast
        val x = if (elementIsDouble) arr.getDouble(d)
                else arr.getFloat(d).toDouble
        acc += x * row(d)
        d += 1
      }
      if (acc >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("srpSig", this, classOf[SrpSignature].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): SrpSignature =
    copy(child = c)
}

/** 64-bit SimHash (per-bit majority vote over xxhash64(token), seed 42 —
  * identical values to Spark's `xxhash64` builtin). */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  import TextExpressions._

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[UTF8String]))

  /** Public: called from generated code. */
  def compute(input: UTF8String): Long = {
    val toks = tokenize(input.toString)
    val counts = new Array[Int](64)
    var n = 0
    toks.foreach { t =>
      val h = XxHash64Function.hash(UTF8String.fromString(t), StringType, 42L)
      var b = 0
      while (b < 64) {
        if ((h & (1L << b)) != 0) counts(b) += 1
        b += 1
      }
      n += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > n) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHash", this, classOf[SimHash64].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** All i < j element pairs of a (pre-sorted) long array, as one JIT'd
  * double loop emitting `array<struct<id_a, id_b>>`.
  *
  * Replaces the declarative
  * `flatten(transform(ids, (a, i) => transform(slice(ids, i + 2, cap),
  * b => struct(a, b))))` nest in the dedup pair generators: higher-order
  * functions stay interpreted (no whole-stage codegen) and that shape
  * allocates a lambda frame plus a sliced array copy PER ELEMENT and a
  * struct per pair through three interpreter layers — the dominant CPU
  * of the candidate-expansion stage at sf0.1. Here the quadratic loop
  * runs inside generated code with one flat output buffer. Input order
  * is preserved (callers pre-sort ascending so id_a < id_b
  * positionally); null input -> null, 0/1-element input -> empty. */
case class IdPairs(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id_a", LongType, nullable = false),
      StructField("id_b", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "id_pairs"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Public: called from generated code. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = arr.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = org.apache.spark.sql.catalyst.InternalRow(a, arr.getLong(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("idPairs", this, classOf[IdPairs].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): IdPairs =
    copy(child = c)
}

/** Argmax-dot cell assignment against a FIXED centroid matrix: the
  * index of the centroid with the largest dot product against the input
  * `array<double>` vector; ties break to the smallest index. The IVF /
  * SemDeDup assignment primitive ([[graft.operators.Similarity]]).
  *
  * The matrix rides along as a codegen REFERENCE OBJECT (serialized
  * once per task with the expression), NOT as a literal expression
  * tree: the declarative form materializes k x dim literal doubles
  * into the generated source, which past a few hundred centroids blows
  * the JVM method-size limit and drops the whole stage to interpreted
  * rows — exactly when derived k grows with the corpus. Here codegen
  * emits one `compute` call regardless of k; per-row cost is the
  * irreducible O(k x dim) multiply-adds in a single JIT'd loop.
  *
  * Accumulation order matches the declarative
  * `aggregate(zip_with(...))` left fold (element order, IEEE double),
  * so assignments are bit-identical to the literal form — asserted in
  * `DedupSimilaritySpec`. Dimensions beyond the shorter of
  * (vector, centroid) are ignored; input vectors are expected
  * normalized and null-element-free (both guaranteed by
  * `l2normalize`). */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  require(centroids.nonEmpty, "nearest_centroid: empty centroid matrix")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nearest_centroid"

  // Seq fields keep case-class structural equality (semanticEquals /
  // subexpression elimination work); the hot loop reads the unboxed
  // mirror, built once per task.
  @transient private lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Public: called from generated code. */
  def compute(v: ArrayData): Int = {
    val n = v.numElements()
    var best = 0
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < matrix.length) {
      val cen = matrix(c)
      val m = if (n < cen.length) n else cen.length
      var s = 0.0d
      var i = 0
      while (i < m) { s += v.getDouble(i) * cen(i); i += 1 }
      if (s > bestSim) { bestSim = s; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this,
      classOf[NearestCentroid].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroid =
    copy(child = c)
}

/** Unicode NFC normalization (canonical composition): `e` + combining
  * acute becomes the single codepoint `é`. The canonicalization step
  * every dedup/fingerprint pipeline needs BEFORE hashing — the same
  * visible text in composed vs decomposed form hashes to different
  * MinHash/SimHash/md5 values and silently defeats exact and near dedup.
  *
  * Fast path: `Normalizer.isNormalized` is a scan without allocation,
  * and already-NFC input (the overwhelming case — most real corpora are
  * composed) returns the input buffer unchanged. Cost is therefore
  * ~one codepoint scan per row unless normalization actually rewrites. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Public: called from generated code. */
  def compute(input: UTF8String): UTF8String = {
    val s = input.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfcNormalize", this, classOf[NfcNormalize].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

/** Accent stripping: decompose to NFD, drop combining marks (Unicode
  * category Mn), recompose to NFC — `café` → `cafe`, `Ångström` →
  * `Angstrom`. Letters that are not base+mark compositions (ø, ł, æ)
  * are left alone; this removes DIACRITICS, it does not transliterate.
  * Used for fuzzy-matching keys (header reconciliation, language-ID
  * n-grams, dedup shingles) where accent variance is noise.
  *
  * Fast path: pure-ASCII input (checked bytewise on the UTF8String,
  * no decode) returns the input buffer unchanged, so on mostly-English
  * corpora the cost is one byte scan per row. */
case class StripAccents(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "strip_accents"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Public: called from generated code. */
  def compute(input: UTF8String): UTF8String = {
    var i = 0
    val n = input.numBytes
    var ascii = true
    while (ascii && i < n) {
      if ((input.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return input
    val d = java.text.Normalizer.normalize(input.toString,
      java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var j = 0
    while (j < d.length) {
      val ch = d.charAt(j)
      if (Character.getType(ch) != Character.NON_SPACING_MARK) sb.append(ch)
      j += 1
    }
    UTF8String.fromString(java.text.Normalizer.normalize(sb.toString,
      java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stripAccents", this, classOf[StripAccents].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): StripAccents =
    copy(child = c)
}
