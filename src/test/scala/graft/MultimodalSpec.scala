package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.asMediaTable(
    Tables.documents(spark, sfDir), "doc_id", "text", "text")

  test("asMediaTable: blob + typed metadata struct schema") {
    val schema = media.schema
    assert(schema("blob").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val m = media.selectExpr("meta.n_bytes", "meta.kind", "length(blob)")
      .as[(Int, String, Int)].collect()
    assert(m.forall { case (n, kind, len) => n == len && kind == "text" })
  }

  test("extractFeatures: deterministic across partitionings") {
    val a = Multimodal.extractFeatures(spark, media.repartition(1))
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    val b = Multimodal.extractFeatures(spark, media.repartition(7))
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(a == b)
    assert(a.values.forall(_.length == 16))
  }

  test("resize: bounded output size, deterministic") {
    val out = Multimodal.resize(spark, media, 8, 8).collect()
    assert(out.forall(r => r.blob.length <= 64 && r.blob.nonEmpty))
    assert(out.forall(r => r.width == 8 && r.height == 8))
  }

  test("sampleFrames: long-form fan-out with strided indices") {
    val frames = Multimodal.sampleFrames(spark, media,
      frameBytes = 64, everyNth = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame.length <= 64))
    assert(frames.forall(_.frame_idx % 2 == 0))
    // frame count per doc matches the stride arithmetic
    val perDoc = frames.groupBy(_.media_id).view.mapValues(_.length)
    val expected = media.selectExpr("media_id", "length(blob)")
      .as[(Long, Int)].collect().toMap
      .view.mapValues(len => (0 until len / 64 by 2).size)
    perDoc.foreach { case (id, n) => assert(n == expected(id)) }
  }
}
