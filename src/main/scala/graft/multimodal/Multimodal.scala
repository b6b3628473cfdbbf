package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column handling (builder contract): image/audio/video travel
  * as opaque `binary` columns with typed metadata structs; decode /
  * feature-extract / resize / frame-sample are per-row map-side transforms.
  *
  * The decode step is a clearly-marked deterministic STUB — real codecs
  * (JPEG/PNG/ffmpeg) are not available in this container. Everything around
  * it — schema, UDF signatures, batch shape, partitioning — is the real
  * Spark plumbing a production decoder would plug into (swap `decodeStub`
  * for a mapPartitions batch over a native library; the surrounding plan is
  * unchanged). At 100 TB: binary payloads stay columnar in parquet, decode is
  * embarrassingly parallel, and metadata-only queries never touch the bytes
  * thanks to parquet column pruning.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  case class MediaMeta(format: String, width: Int, height: Int,
                       n_frames: Int, duration_s: Double)

  /** The ONE stub decode implementation (deterministic metadata from a
    * content checksum); both the scalar UDF and the batched mapPartitions
    * path call it, so they can never desynchronize. Production = replace
    * this body with javax.imageio / ffmpeg probing. */
  def decodeMeta(content: Array[Byte]): MediaMeta = {
    if (content == null) return null
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
