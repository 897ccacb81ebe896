package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque binary
  * columns with typed metadata, partition-parallel decode / feature-extract.
  *
  * The decode kernels themselves are STUBBED with a deterministic fake
  * (no image/audio libraries in this environment) — everything Spark-side is
  * real: the envelope schema, the batch-shaped mapPartitions plumbing, the
  * metadata projection, and partitioning behavior. Swapping `stubDecode` for
  * a real codec is a one-function change.
  */
object MultimodalOps {

  /** Typed envelope for an opaque media payload. */
  case class MediaEnvelope(
      media_id: Long,
      kind: String,          // "image" | "audio" | "video"
      payload: Array[Byte],  // opaque encoded bytes
      mime: String)

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      content_fp: String,    // hex fingerprint of the payload
      width: Int,            // decoded dims (stubbed deterministically)
      height: Int,
      n_frames: Int)

  /** STUB decode: deterministic pseudo-dimensions derived from the payload
    * fingerprint — stands in for a real image/audio decoder, keeping the
    * pipeline shape (per-partition batch iteration, no driver collect) real.
    */
  private def stubDecode(payload: Array[Byte]): (Int, Int, Int) = {
    val h = java.util.Arrays.hashCode(payload)
    val w = 16 + math.abs(h % 1024)
    val ht = 16 + math.abs((h / 1024) % 1024)
    val fr = 1 + math.abs((h / 1048576) % 64)
    (w, ht, fr)
  }

  private def hex(bytes: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(bytes).map("%02x".format(_)).mkString
  }

  /** The production ingestion path: read opaque media files from a
    * directory with Spark's `binaryFile` source (path/length pushdown via
    * pathGlobFilter; content never touches the driver) and wrap them as
    * typed envelopes. Kind is derived from the file extension.
    */
  def envelopesFromBinaryFiles(spark: SparkSession, dir: String, glob: String = "*"): Dataset[MediaEnvelope] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        abs(xxhash64(col("path"))).as("media_id"),
        when(lower(col("path")).rlike("\\.(png|jpe?g|gif)$"), "image")
          .when(lower(col("path")).rlike("\\.(wav|mp3|flac)$"), "audio")
          .otherwise("video").as("kind"),
        col("content").as("payload"),
        lit("application/octet-stream").as("mime"))
      .as[MediaEnvelope]
  }

  /** Wrap a text table as media envelopes (test harness for the plumbing;
    * in production the payloads come from [[envelopesFromBinaryFiles]]).
    */
  def envelopesFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaEnvelope] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
        encode(col("text"), "utf-8").as("payload"),
        lit("application/octet-stream").as("mime"))
      .as[MediaEnvelope]
  }

  /** Partition-parallel feature extraction over opaque payloads: the batch
    * shape is an iterator per partition (constant memory per task), the
    * decode is per-record, and no data ever reaches the driver.
    */
  def extractFeatures(envelopes: Dataset[MediaEnvelope]): Dataset[MediaFeatures] = {
    import envelopes.sparkSession.implicits._
    envelopes.mapPartitions { it =>
      it.map { e =>
        val (w, h, f) = stubDecode(e.payload)
        MediaFeatures(e.media_id, e.kind, e.payload.length.toLong, hex(e.payload), w, h, f)
      }
    }
  }
}
