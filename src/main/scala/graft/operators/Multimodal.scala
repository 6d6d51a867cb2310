package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, plus decode/feature-extraction/frame-sampling
  * operators.
  *
  * The Spark-side plumbing (schema, partitioning, batch iteration shape)
  * is real; the byte-level decode is a STUB — this container ships no
  * image/audio codecs, so `decodeFeatures` computes deterministic fake
  * features from the raw bytes where a real deployment would call the
  * codec inside the same `mapPartitions` loop (one codec init per
  * partition, streaming batches — the Scala analog of PySpark's
  * `mapInPandas`).
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, format: String, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, format: String, n_bytes: Int,
      width: Int, height: Int, brightness: Double)

  /** Synthesize a media table from `documents`: payload = utf-8 bytes of
    * the text (a stand-in for real image/audio/video bytes), format
    * assigned round-robin. Metadata travels as ordinary columns next to
    * the opaque binary. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      element_at(array(lit("png"), lit("wav"), lit("mp4")),
        (col("doc_id") % 3).cast("int") + 1).as("format"),
      col("text").cast("binary").as("payload"))

  /** Typed-metadata projection over the binary column (no decode). */
  def mediaMetadata(media: DataFrame): DataFrame =
    media.select(col("doc_id"), col("format"),
      octet_length(col("payload")).as("n_bytes"))

  /** STUB decode + feature extraction. Real version: open codec per
    * partition, decode each payload, emit features. The fake features are
    * pure deterministic byte math so tests/benches exercise the identical
    * distributed shape (binary in, struct out, partition-batched). */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "format", "payload").as[MediaRow]
      .mapPartitions { rows =>
        // real impl: val codec = Codec.open() — once per partition
        rows.map { r =>
          val bytes = r.payload
          val n = bytes.length
          val brightness = // fake: mean of first 16 bytes
            if (n == 0) 0.0
            else {
              val k = math.min(16, n)
              var s = 0; var i = 0
              while (i < k) { s += bytes(i) & 0xff; i += 1 }
              s.toDouble / k
            }
          MediaFeatures(r.doc_id, r.format, n,
            width = if (n == 0) 0 else (bytes(0) & 0xff) * 4,     // ??? fake decode
            height = if (n < 2) 0 else (bytes(1) & 0xff) * 3,    // ??? fake decode
            brightness = math.rint(brightness * 100) / 100)
        }
      }
  }

  /** Frame sampling plumbing for video rows: one output row per sampled
    * frame with its offset — `posexplode(sequence(...))`, fully
    * distributed, no decode needed to plan the sampling. */
  def sampleFrames(media: DataFrame, fps: Int = 25): DataFrame =
    media.where(col("format") === "mp4")
      .withColumn("n_frames", (col("doc_id") % 5 + 1).cast("int"))
      .select(col("doc_id"), col("n_frames"),
        posexplode(sequence(lit(0), col("n_frames") - 1)))
      .toDF("doc_id", "n_frames", "frame_pos", "frame_idx")
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * (lit(1000) / fps)).cast("long").as("offset_ms"))
}
