package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The media twin of [[TrainingDataPrep]]: one composite that takes raw
  * media envelopes through content dedup and the per-modality real
  * kernels, emitting training-ready artifacts plus a per-kind datasheet —
  * the audit a 100 TB media corpus build publishes next to its shards.
  *
  * Stages (all lazy; branches share the deduped frame):
  *   1. EXACT content dedup on the payload digest — one survivor per
  *      distinct byte content (smallest media_id, deterministic), via a
  *      fp-partitioned top-1 window: 16-byte digests shuffle, payloads
  *      never leave their partition twice.
  *   2. Per-modality kernels on the survivors: images -> bounded-resolution
  *      resize ([[ImageCodec]], real pixels for PPM/BMP), audio ->
  *      silence trim ([[WavCodec]], real samples for WAV PCM), video ->
  *      stride frame sampling (real frames for PPM streams, canonical-
  *      bytes fingerprints so identical frames dedup across videos).
  *   3. Datasheet: per kind — envelopes in, unique contents, rows emitted
  *      by the kernel branch. The n_in/n_unique gap IS the duplication
  *      rate; datasheet rows are bounded by the kind domain (3).
  *
  * The envelope source is scanned once per branch plus once for the
  * datasheet counts; callers preparing from an expensive source should
  * persist the input (caller-owned cache lifecycle, the repo convention).
  */
object MultimodalPrep {

  final case class MediaPrepResult(
      unique: Dataset[MultimodalOps.MediaEnvelope],
      images: Dataset[MultimodalOps.ResizedMedia],
      audio: Dataset[MultimodalOps.TrimmedAudio],
      frames: Dataset[MultimodalOps.SampledFrame],
      datasheet: DataFrame)

  def prepare(
      envelopes: Dataset[MultimodalOps.MediaEnvelope],
      maxDim: Int = 512,
      silenceThresholdMilli: Long = 10,
      frameStride: Int = 5): MediaPrepResult = {
    val spark = envelopes.sparkSession
    import spark.implicits._

    // 1. content dedup: top-1 per digest, smallest media_id survives
    val byFp = Window.partitionBy(col("__fp")).orderBy(col("media_id"))
    val unique = envelopes.toDF()
      .withColumn("__fp", md5(col("payload")))
      .withColumn("__rn", row_number().over(byFp))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")
      .as[MultimodalOps.MediaEnvelope]

    // 2. per-modality kernels (each filters its kind internally or here)
    val images = MultimodalOps.resizeImages(unique.filter(_.kind == "image"), maxDim)
    val audio = MultimodalOps.trimSilence(unique, silenceThresholdMilli)
    val frames = MultimodalOps.sampleFrames(unique, frameStride)

    // 3. per-kind datasheet: in / unique / emitted
    val nIn = envelopes.toDF().groupBy(col("kind")).agg(count(lit(1)).as("n_in"))
    val nUniq = unique.toDF().groupBy(col("kind")).agg(count(lit(1)).as("n_unique"))
    val emitted = images.toDF().select(lit("image").as("kind"))
      .unionByName(audio.toDF().select(lit("audio").as("kind")))
      .unionByName(frames.toDF().select(lit("video").as("kind")))
      .groupBy(col("kind")).agg(count(lit(1)).as("n_emitted"))
    val datasheet = nIn
      .join(nUniq, Seq("kind"), "left")
      .join(emitted, Seq("kind"), "left")
      .select(col("kind"),
        col("n_in"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        coalesce(col("n_emitted"), lit(0L)).as("n_emitted"))
      .orderBy("kind")

    MediaPrepResult(unique, images, audio, frames, datasheet)
  }
}
