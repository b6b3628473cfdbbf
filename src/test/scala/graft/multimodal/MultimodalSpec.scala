package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def docsWithContent = sf("documents").limit(50)
    .withColumn("content", encode(col("text"), "utf-8"))

  test("decodeStub is deterministic and yields plausible typed metadata") {
    val d = docsWithContent.withColumn("meta", Multimodal.decodeStub(col("content")))
    val twice = docsWithContent.withColumn("meta", Multimodal.decodeStub(col("content")))
    assert(d.select("doc_id", "meta").collect().toSet ===
      twice.select("doc_id", "meta").collect().toSet)
    val metas = d.select(col("meta.width"), col("meta.height"), col("meta.n_frames")).collect()
    assert(metas.forall(r => r.getInt(0) >= 160 && r.getInt(0) <= 1280))
    assert(metas.forall(r => r.getInt(2) >= 1))
  }

  test("decodeBatched (mapPartitions shape) matches the per-row stub") {
    val perRow = docsWithContent
      .withColumn("meta", Multimodal.decodeStub(col("content")))
      .select(col("doc_id"), col("meta"))
    val batched = Multimodal.decodeBatched(docsWithContent, "content")
      .select(col("doc_id"), col("meta"))
    assert(batched.collect().toSet === perRow.collect().toSet)
  }

  test("resizeMeta caps the longest side preserving other fields") {
    val d = docsWithContent
      .withColumn("meta", Multimodal.decodeStub(col("content")))
      .withColumn("small", Multimodal.resizeMeta(col("meta"), 320))
    val rows = d.select(col("meta.width"), col("small.width"),
      col("meta.height"), col("small.height"),
      col("meta.n_frames"), col("small.n_frames")).collect()
    rows.foreach { r =>
      assert(math.max(r.getInt(1), r.getInt(3)) <= 320)
      assert(r.getInt(4) === r.getInt(5))
      if (math.max(r.getInt(0), r.getInt(2)) <= 320) {
        assert(r.getInt(1) === r.getInt(0)) // no upscale
      }
    }
  }

  test("sampleFrames emits every step-th frame index") {
    import spark.implicits._
    val one = Seq((1L, 49)).toDF("id", "nf")
      .withColumn("meta", struct(lit("webm").as("format"), lit(640).as("width"),
        lit(480).as("height"), col("nf").as("n_frames"), lit(2.0).as("duration_s")))
    val frames = Multimodal.sampleFrames(one, col("meta"), step = 24)
      .select("frame_idx").collect().map(_.getInt(0)).toSeq
    assert(frames === Seq(0, 24, 48))
  }
}
