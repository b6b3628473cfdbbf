package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column handling (builder contract): image/audio/video travel
  * as opaque `binary` columns with typed metadata structs; decode /
  * feature-extract / resize / frame-sample are per-row map-side transforms.
  *
  * IMAGE decode/resize/features are REAL — `javax.imageio` ships with the
  * JDK (PNG/JPEG/GIF/BMP readers, no external codec needed), and header-only
  * metadata reads never decode pixels. AUDIO/VIDEO decode remains a
  * clearly-marked deterministic STUB (ffmpeg-class codecs genuinely aren't
  * in this container); [[decodeAuto]] routes bytes ImageIO recognizes to the
  * real path and everything else to the stub. Either way the surrounding
  * plumbing — schema, UDF signatures, batch shape, partitioning — is the
  * production plan. At 100 TB: binary payloads stay columnar in parquet,
  * decode is embarrassingly parallel, and metadata-only queries never touch
  * the bytes thanks to parquet column pruning.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  case class MediaMeta(format: String, width: Int, height: Int,
                       n_frames: Int, duration_s: Double)

  /** The ONE stub decode implementation; both the scalar UDF and the batched
    * mapPartitions path call it, so they can never desynchronize.
    *
    * Payloads carrying the 16-byte GFTV container header are probed
    * HEADER-ONLY — width/height/frame-count read from fixed offsets, exactly
    * how a production ffprobe-style pass stays cheap on multi-GB media (the
    * bytes after the header are never touched). Arbitrary bytes fall back to
    * checksum-derived metadata so the plumbing stays total. Production =
    * replace the fallback with real codec probing. */
  def decodeMeta(content: Array[Byte]): MediaMeta = {
    if (content == null) return null
    if (content.length >= GftvHeaderLen &&
        content(0) == 'G' && content(1) == 'F' && content(2) == 'T' && content(3) == 'V') {
      def u8(i: Int) = content(i) & 0xff
      val w = (u8(4) << 8) | u8(5)
      val ht = (u8(6) << 8) | u8(7)
      val nf = (u8(8) << 24) | (u8(9) << 16) | (u8(10) << 8) | u8(11)
      return MediaMeta(if (u8(12) == 0) "webm" else "wav", w, ht, nf, nf / 24.0)
    }
    val h = graft.util.Hashing.fnv1a64(content)
    val w = 160 + (math.abs(h) % 8).toInt * 160            // 160..1280
    val ht = 120 + (math.abs(h >> 8) % 8).toInt * 120      // 120..960
    val frames = 1 + (math.abs(h >> 16) % 240).toInt
    MediaMeta(
      format = Seq("jpeg", "png", "webm", "wav")((math.abs(h >> 24) % 4).toInt),
      width = w, height = ht, n_frames = frames,
      duration_s = frames / 24.0)
  }

  /** STUB decode as a scalar UDF. */
  val decodeStub = udf { content: Array[Byte] => decodeMeta(content) }

  private val GftvHeaderLen = 16

  /** Build a GFTV container payload: the 16-byte header [[decodeMeta]]
    * probes (magic, u16 width, u16 height, u32 frame count, format code
    * 0=webm/1=wav) followed by `pad` opaque body bytes. Used by fixtures to
    * make a/v metadata independently derivable — a correctness oracle can
    * predict what the probe must report without running it. */
  def makeAvPayload(width: Int, height: Int, nFrames: Int,
                    formatCode: Int, pad: Int): Array[Byte] = {
    val out = new Array[Byte](GftvHeaderLen + pad)
    out(0) = 'G'; out(1) = 'F'; out(2) = 'T'; out(3) = 'V'
    out(4) = (width >> 8).toByte; out(5) = width.toByte
    out(6) = (height >> 8).toByte; out(7) = height.toByte
    out(8) = (nFrames >> 24).toByte; out(9) = (nFrames >> 16).toByte
    out(10) = (nFrames >> 8).toByte; out(11) = nFrames.toByte
    out(12) = formatCode.toByte
    var i = GftvHeaderLen
    while (i < out.length) { out(i) = ((width + height + i) & 0x7f).toByte; i += 1 }
    out
  }

  /** Render a real PNG of the given dimensions (deterministic gradient fill
    * seeded by `seed`) — fixture counterpart of the REAL javax.imageio
    * decode path: the oracle knows the dimensions it asked for; the engine
    * must recover them by actually decoding the bytes. */
  def makePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, ((x * 7 + y * 13 + seed).toInt) & 0xffffff)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image metadata via javax.imageio — header-only: the reader reports
    * dimensions and format without decoding pixel data, exactly how a
    * production metadata pass stays cheap. Returns null for bytes no
    * installed reader recognizes. */
  def decodeImage(content: Array[Byte]): MediaMeta = {
    if (content == null) return null
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(content))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) null
      else {
        val r = readers.next()
        try {
          r.setInput(in)
          MediaMeta(r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0),
            n_frames = 1, duration_s = 0.0)
        } finally r.dispose()
      }
    } catch { case _: Exception => null } finally if (in != null) in.close()
  }

  /** Auto-routed decode: REAL for image bytes, deterministic stub for the
    * formats whose codecs aren't available here (audio/video). */
  def decodeAuto(content: Array[Byte]): MediaMeta = {
    val real = decodeImage(content)
    if (real != null) real else decodeMeta(content)
  }

  val decodeAutoUdf = udf { content: Array[Byte] => decodeAuto(content) }

  /** REAL resize: decode, bilinear-scale so max(width,height) <= maxDim
    * (no-op pass-through when already small enough), re-encode as PNG.
    * Returns null for non-image bytes. */
  def resizeImage(content: Array[Byte], maxDim: Int): Array[Byte] = {
    if (content == null) return null
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case _: Exception => null }
    if (img == null) return null
    val scale = math.min(1.0, maxDim.toDouble / math.max(img.getWidth, img.getHeight))
    if (scale >= 1.0) return content
    val w = math.max(1, math.floor(img.getWidth * scale).toInt)
    val h = math.max(1, math.floor(img.getHeight * scale).toInt)
    val out = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  val resizeImageUdf = udf { (content: Array[Byte], maxDim: Int) =>
    resizeImage(content, maxDim) }

  /** REAL image features: mean R,G,B per 2×2 quadrant → 12 floats in [0,1]
    * (a deterministic, content-sensitive stand-in for an image-encoder
    * embedding; quadrant means change when the picture does). Null for
    * non-image bytes. */
  def imageFeatures(content: Array[Byte]): Array[Float] = {
    if (content == null) return null
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case _: Exception => null }
    if (img == null) return null
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Float](12)
    var qy = 0
    while (qy < 2) {
      var qx = 0
      while (qx < 2) {
        val (x0, x1) = (qx * w / 2, math.max(qx * w / 2 + 1, (qx + 1) * w / 2))
        val (y0, y1) = (qy * h / 2, math.max(qy * h / 2 + 1, (qy + 1) * h / 2))
        var (r, g, b, n) = (0L, 0L, 0L, 0L)
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = img.getRGB(x, y)
            r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff; n += 1
            x += 1
          }
          y += 1
        }
        val base = (qy * 2 + qx) * 3
        out(base) = r.toFloat / n / 255f
        out(base + 1) = g.toFloat / n / 255f
        out(base + 2) = b.toFloat / n / 255f
        qx += 1
      }
      qy += 1
    }
    out
  }

  val imageFeaturesUdf = udf { content: Array[Byte] => imageFeatures(content) }

  /** STUB feature extraction: fixed-width float vector from the payload —
    * stands in for an image/audio embedding model. Deterministic. */
  val featuresStub = udf { content: Array[Byte] =>
    val h = graft.util.Hashing.fnv1a64(content)
    Array.tabulate(8)(i => (((h >> (i * 8)) & 0xff).toInt - 128) / 128.0f)
  }

  /** Resize plan step: pure metadata arithmetic (a real resize would also
    * rewrite bytes in the same projection). */
  def resizeMeta(meta: Column, maxDim: Int): Column = {
    val scale = least(lit(1.0),
      lit(maxDim) / greatest(meta.getField("width"), meta.getField("height")).cast("double"))
    struct(
      meta.getField("format").as("format"),
      floor(meta.getField("width") * scale).cast("int").as("width"),
      floor(meta.getField("height") * scale).cast("int").as("height"),
      meta.getField("n_frames").as("n_frames"),
      meta.getField("duration_s").as("duration_s"))
  }

  /** Frame sampling: one output row per sampled frame index (every `step`-th
    * frame) — posexplode over a sequence, no data movement beyond the row. */
  def sampleFrames(df: DataFrame, meta: Column, step: Int): DataFrame =
    df.withColumn("frame_idx",
      explode(sequence(lit(0), greatest(meta.getField("n_frames") - 1, lit(0)), lit(step))))

  /** Batched decode over partitions: the mapPartitions shape a real codec
    * runs in — the decoder library loads ONCE per partition (not per row)
    * and processes an iterator of payloads. The stub mirrors `decodeStub`;
    * swapping in javax.imageio/ffmpeg touches only the marked line. */
  def decodeBatched(df: DataFrame, contentCol: String): DataFrame = {
    import df.sparkSession.implicits._
    val schema = df.schema
    val idx = schema.fieldIndex(contentCol)
    val encoder = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.row(schema),
      org.apache.spark.sql.Encoders.product[MediaMeta])
    df.mapPartitions { rows =>
      // per-partition decoder init goes here (the expensive native handle);
      // the per-row work delegates to the shared decodeMeta
      rows.map(r => (r, decodeMeta(r.getAs[Array[Byte]](idx))))
    }(encoder)
      .toDF("row", "meta")
      .select(col("row.*"), col("meta"))
  }
}
