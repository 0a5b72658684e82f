package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns + typed
  * metadata, with decode/feature steps batched per partition.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB ([[StubCodec]]) — the Spark-side
  * contract (schema, partitioning, batch shape, null policy) is real and
  * tested, and swapping in a real codec changes only the kernel body.
  * This mirrors how a Python pipeline would structure `mapInPandas`
  * batches; in Scala the idiomatic equivalent is a typed `mapPartitions`
  * over an iterator of rows, which keeps the per-partition batching (codec
  * contexts initialized once per partition, not per row).
  */
object Multimodal {

  case class MediaRow(media_id: Long, content: Array[Byte], media_type: String)
  case class DecodedRow(media_id: Long, media_type: String, byte_len: Long,
      width: Int, height: Int, n_frames: Int, ok: Boolean)

  /** STUB decode kernel: deterministic pseudo-metadata from the byte
    * payload. A real deployment replaces this body with an actual codec
    * (??? markers intentionally absent — the stub must run in tests).
    */
  object StubCodec {
    def decode(bytes: Array[Byte], mediaType: String): (Int, Int, Int, Boolean) = {
      if (bytes == null || bytes.isEmpty) return (0, 0, 0, false)
      val n = bytes.length
      val width = 1 + (n * 7) % 1024
      val height = 1 + (n * 13) % 768
      val frames = if (mediaType == "video") 1 + n % 30 else 1
      (width, height, frames, true)
    }
  }

  /** Wrap a text table as a binary media table (UTF-8 payloads) — the
    * ingest shape a real pipeline would produce from raw media files.
    */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("content"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast("int")).as("media_type"))

  /** Batched decode: one `mapPartitions` pass, codec state per partition. */
  def decodeBatched(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition codec init would go here (expensive in real codecs)
      rows.map { r =>
        val (w, h, f, ok) = StubCodec.decode(r.content, r.media_type)
        DecodedRow(r.media_id, r.media_type,
          Option(r.content).map(_.length.toLong).getOrElse(0L), w, h, f, ok)
      }
    }
  }

  /** Frame sampling over decoded video rows: every `stride`-th frame index
    * becomes its own row with a deterministic STUB frame fingerprint
    * (md5-derived). A real pipeline swaps the fingerprint expression for a
    * decoded frame tensor/embedding; the explode shape, keys, and
    * per-frame row contract stay identical — and the explode is a narrow
    * generator, so frame fan-out never shuffles.
    */
  def sampleFrames(decoded: DataFrame, stride: Int = 5): DataFrame = {
    require(stride > 0)
    // n_frames > 0 keeps the generator total: a real codec can report
    // ok=true with zero frames, and sequence(0, -1, stride) throws
    decoded.filter(col("media_type") === "video" && col("ok") &&
        col("n_frames") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))
      .withColumn("frame_idx", col("frame_idx").cast("long"))
      .withColumn("frame_fp",
        conv(substring(md5(concat_ws(":", col("media_id"), col("frame_idx"))),
          1, 8), 16, 10).cast("long"))
  }
}
