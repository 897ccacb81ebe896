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

  case class ResizedMedia(
      media_id: Long,
      kind: String,
      src_w: Int,
      src_h: Int,
      out_w: Int,
      out_h: Int,
      out_fp: String)       // fingerprint of the (stubbed) re-encoded payload

  /** Bounded-resolution resize (the image-normalization step of a training
    * pipeline): scale every image so its longer side is at most `maxDim`,
    * preserving aspect ratio in integer arithmetic; never upscale. The
    * pixel resample is STUBBED (fingerprint chaining stands in for the
    * re-encoded payload) but the Spark shape is the real one: a NARROW
    * mapPartitions consuming the iterator in fixed-size batches — the same
    * batch discipline `mapInPandas` imposes via Arrow record batches, so a
    * real codec drops in per-batch (amortized codec init, bounded memory)
    * without replanning. No shuffle, no driver materialization.
    */
  def resizeImages(envelopes: Dataset[MediaEnvelope], maxDim: Int,
      batchSize: Int = 64): Dataset[ResizedMedia] = {
    import envelopes.sparkSession.implicits._
    require(maxDim > 0, s"maxDim must be positive, got $maxDim")
    envelopes.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch block: a real implementation initializes the codec
        // here, once per batch, not once per record
        batch.iterator.map { e =>
          val (w, h, _) = stubDecode(e.payload)
          val long = math.max(w, h)
          val (ow, oh) =
            if (long <= maxDim) (w, h)
            else (math.max(1, w * maxDim / long), math.max(1, h * maxDim / long))
          ResizedMedia(e.media_id, e.kind, w, h, ow, oh,
            hex(e.payload ++ s"#resize:${ow}x$oh".getBytes("UTF-8")))
        }
      }
    }
  }

  case class SampledFrame(
      media_id: Long,
      frame_idx: Int,
      frame_fp: String)

  /** Video frame sampling: every `stride`-th frame of each video envelope
    * (frame 0 always included) as one row per kept frame. The frame decode
    * is STUBBED (fingerprint of payload digest + index), but the shape is
    * the production one: frames are generated IN-ROW by a flatMap bounded
    * by the envelope's frame count — a video's frames stay in its task,
    * row inflation is n_frames/stride per video, and nothing is collected.
    * Downstream (dedup by frame_fp, embedding per frame) sees plain rows.
    */
  def sampleFrames(envelopes: Dataset[MediaEnvelope], stride: Int,
      batchSize: Int = 64): Dataset[SampledFrame] = {
    import envelopes.sparkSession.implicits._
    require(stride > 0, s"stride must be positive, got $stride")
    envelopes.filter(_.kind == "video").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { e =>
          val (_, _, nFrames) = stubDecode(e.payload)
          val base = hex(e.payload)
          (0 until nFrames by stride).iterator.map { idx =>
            SampledFrame(e.media_id, idx, hex(s"$base#frame:$idx".getBytes("UTF-8")))
          }
        }
      }
    }
  }
}
