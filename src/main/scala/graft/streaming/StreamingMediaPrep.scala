package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.ops.MultimodalOps
import graft.ops.MultimodalOps.MediaEnvelope

/** [[graft.ops.MultimodalPrep]] as a CONTINUOUS pipeline — the media twin
  * of [[StreamingPrep]]: a stream of media envelopes is content-deduped
  * within a watermark and pushed through the per-modality REAL kernels,
  * emitting one artifact row per surviving envelope.
  *
  * State budget (the always-on media-ingest constraint):
  *   - dedup: `dropDuplicatesWithinWatermark` on the payload's md5 — state
  *     is O(watermark-window volume) of 16-byte keys, watermark-evicted;
  *     payload BYTES are not part of the state;
  *   - kernels: stateless per-row maps ([[MultimodalOps.resizeOne]] /
  *     `trimOne` / `sampleOne` — the SAME functions the batch composite
  *     maps, so stream and batch agree by shared code, and the parity spec
  *     checks artifacts, not just counts);
  *   - every stage is append-mode-safe; exactly-once across restarts falls
  *     out of offset-tracked sources + deterministic kernels (chaos-pinned
  *     in the spec).
  *
  * Dedup survivor choice: the watermark dedup keeps the FIRST-SEEN copy,
  * the batch composite keeps the smallest media_id — but duplicates have
  * IDENTICAL bytes, so every content-derived artifact field agrees no
  * matter which copy survived; only `media_id` can differ. Parity is
  * therefore defined (and spec-checked) on (kind, content_fp, n_outputs,
  * artifact_fp).
  */
object StreamingMediaPrep {

  /** One row per surviving envelope: what the kernel produced, identified
    * by content. `artifact_fp` digests the kernel OUTPUT (resized bytes /
    * trim bounds / sampled-frame fingerprints) — the shard-key-grade id of
    * the processed artifact.
    */
  final case class MediaArtifact(
      media_id: Long,
      kind: String,
      content_fp: String,
      n_outputs: Long,
      artifact_fp: String)

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** The shared per-envelope kernel dispatch — pure, total, deterministic
    * (the property replay-based exactly-once rests on).
    */
  def artifactOf(e: MediaEnvelope, contentFp: String, maxDim: Int,
      silenceThresholdMilli: Long, frameStride: Int): MediaArtifact = e.kind match {
    case "image" =>
      val r = MultimodalOps.resizeOne(e, maxDim)
      MediaArtifact(e.media_id, e.kind, contentFp, 1L,
        md5hex(s"${r.out_w}x${r.out_h}:${r.out_fp}"))
    case "audio" =>
      MultimodalOps.trimOne(e, silenceThresholdMilli) match {
        case Some(t) =>
          MediaArtifact(e.media_id, e.kind, contentFp, 1L,
            md5hex(s"${t.start_ms}-${t.end_ms}/${t.duration_ms}"))
        case None => // undecodable audio: surfaced, not dropped
          MediaArtifact(e.media_id, e.kind, contentFp, 0L, contentFp)
      }
    case _ => // video
      val frames = MultimodalOps.sampleOne(e, frameStride).toVector
      MediaArtifact(e.media_id, e.kind, contentFp, frames.length.toLong,
        md5hex(frames.map(_.frame_fp).mkString(",")))
  }

  /** Continuous prep over a streaming (media_id, kind, payload, mime, ts)
    * frame. Emits one [[MediaArtifact]] per distinct payload content.
    */
  def prep(env: DataFrame, watermark: String = "10 minutes", maxDim: Int = 512,
      silenceThresholdMilli: Long = 10, frameStride: Int = 5): Dataset[MediaArtifact] = {
    val spark = env.sparkSession
    import spark.implicits._
    env
      .withColumn("__fp", md5(col("payload")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .select(col("media_id"), col("kind"), col("payload"), col("mime"), col("__fp"))
      .as[(Long, String, Array[Byte], String, String)]
      .map { case (id, kind, payload, mime, fp) =>
        artifactOf(MediaEnvelope(id, kind, payload, mime), fp,
          maxDim, silenceThresholdMilli, frameStride)
      }
  }

  /** The BATCH twin with identical semantics (smallest-media_id survivor
    * per content) — what the parity spec compares the stream against.
    */
  def prepBatch(env: Dataset[MediaEnvelope], maxDim: Int = 512,
      silenceThresholdMilli: Long = 10, frameStride: Int = 5): Dataset[MediaArtifact] = {
    val spark = env.sparkSession
    import spark.implicits._
    val byFp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__fp")).orderBy(col("media_id"))
    env.toDF()
      .withColumn("__fp", md5(col("payload")))
      .withColumn("__rn", row_number().over(byFp))
      .filter(col("__rn") === 1)
      .select(col("media_id"), col("kind"), col("payload"), col("mime"), col("__fp"))
      .as[(Long, String, Array[Byte], String, String)]
      .map { case (id, kind, payload, mime, fp) =>
        artifactOf(MediaEnvelope(id, kind, payload, mime), fp,
          maxDim, silenceThresholdMilli, frameStride)
      }
  }

  /** Per-kind datasheet of an artifact frame (batch side, or the collected
    * stream output): survivors, total kernel outputs, undecodable count.
    */
  def datasheet(artifacts: DataFrame): DataFrame =
    artifacts.groupBy(col("kind"))
      .agg(count(lit(1)).as("n_unique"),
        sum(col("n_outputs")).as("n_outputs"),
        count(when(col("n_outputs") === 0, 1)).as("n_undecodable"))
      .orderBy("kind")
}
