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

  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("REAL image path: decode, auto-routing, resize, quadrant features") {
    import spark.implicits._
    val red = png(640, 480, 0xff0000)
    val blue = png(1600, 1200, 0x0000ff)
    val notAnImage = "RIFFxxxxWAVE-pretend-audio".getBytes("UTF-8")

    // header-only decode reports true dimensions and format
    val m = Multimodal.decodeImage(red)
    assert(m.format === "png" && m.width === 640 && m.height === 480)
    // auto-routing: images take the real path, other bytes the stub
    assert(Multimodal.decodeAuto(blue).width === 1600)
    assert(Multimodal.decodeAuto(notAnImage) === Multimodal.decodeMeta(notAnImage))

    // real resize: bytes shrink AND re-decode at the expected dimensions
    val small = Multimodal.resizeImage(blue, maxDim = 800)
    val sm = Multimodal.decodeImage(small)
    assert(sm.width === 800 && sm.height === 600)
    assert(Multimodal.resizeImage(red, maxDim = 800) eq red) // already small: pass-through
    assert(Multimodal.resizeImage(notAnImage, 800) === null)

    // features reflect actual pixel content: every quadrant of the red image
    // is red-dominant, of the blue image blue-dominant
    val fr = Multimodal.imageFeatures(red)
    val fb = Multimodal.imageFeatures(blue)
    assert(fr.length === 12 && fb.length === 12)
    (0 until 4).foreach { q =>
      assert(fr(q * 3) === 1.0f && fr(q * 3 + 2) === 0.0f)
      assert(fb(q * 3) === 0.0f && fb(q * 3 + 2) === 1.0f)
    }

    // the same functions as Spark UDFs inside a distributed plan
    val df = Seq((1L, red), (2L, blue), (3L, notAnImage)).toDF("id", "content")
      .withColumn("meta", Multimodal.decodeAutoUdf(col("content")))
      .withColumn("thumb", Multimodal.resizeImageUdf(col("content"), lit(100)))
      .withColumn("feat", Multimodal.imageFeaturesUdf(col("content")))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("width") === 640)
    assert(rows(1).getAs[org.apache.spark.sql.Row]("meta").getAs[String]("format") === "png")
    assert(Multimodal.decodeImage(rows(1).getAs[Array[Byte]]("thumb")).width === 100)
    assert(rows(2).isNullAt(rows(2).fieldIndex("feat"))) // non-image: no features

    // featuresStub (the marked stand-in for audio/video embeddings — no
    // codecs in this container): fixed width, deterministic, content-
    // sensitive, and defined even for bytes no codec recognizes
    val stub = Seq((1L, notAnImage), (2L, notAnImage), (3L, red))
      .toDF("id", "content")
      .withColumn("feat", Multimodal.featuresStub(col("content")))
      .orderBy("id").collect()
      .map(_.getAs[scala.collection.Seq[Float]]("feat"))
    assert(stub.forall(_.length === 8))
    assert(stub(0) === stub(1))   // same bytes → same embedding
    assert(stub(0) !== stub(2))   // different bytes → different embedding
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

  test("GFTV container probe reads header-only metadata") {
    val p = Multimodal.makeAvPayload(640, 480, 120, formatCode = 0, pad = 32)
    assert(Multimodal.decodeMeta(p) === Multimodal.MediaMeta("webm", 640, 480, 120, 5.0))
    assert(Multimodal.decodeMeta(
      Multimodal.makeAvPayload(1280, 720, 48, formatCode = 1, pad = 0)).format === "wav")
    // auto-routing: GFTV bytes are not an image — they take the probe path
    assert(Multimodal.decodeAuto(p) === Multimodal.decodeMeta(p))
    // makePng round-trips through the real decoder at the requested dims
    val img = Multimodal.makePng(176, 132, seed = 7L)
    val m = Multimodal.decodeImage(img)
    assert(m.format === "png" && m.width === 176 && m.height === 132)
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
