package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.IvfIncremental

/** Continuous ANN-index maintenance: attach an embedding STREAM to a
  * persisted [[IvfIncremental]] index, so the index tracks a corpus that
  * never stops arriving — the closing piece of the embedding pipeline
  * (generate → quantize → index → probe) in its production shape (ref:
  * Abishek257/ETL_Data_Ingestion has no vector surface; this is the
  * mandated similarity-search extension plane meeting the streaming
  * plane).
  *
  * Each micro-batch runs [[IvfIncremental.addBatchAuto]]: vectors append
  * into the cell-partitioned store, per-cell integer sums merge (a
  * #cells-row rewrite — never a corpus pass), and the drift trigger fires
  * a recluster when the persisted-target imbalance trips, so a stream
  * whose distribution wanders self-heals without an operator watching.
  *
  * Delivery contract — at-least-once, hardened to effectively-once by a
  * per-batch commit marker (the sink layer's idempotent-batchId pattern):
  * a marker under `<indexPath>/_stream_commits/<batchId>` is written
  * AFTER the batch merges; a restarted query replays the batch, sees the
  * marker, and skips. The unprotected window (crash between merge and
  * marker) double-appends that one batch — same window as
  * [[StreamIngest]], same remedy (dedupe on vec_id downstream where
  * exactly-once matters); centroid counts inflated by a replay are
  * health-state, not truth-state, and the next recluster rebuilds them
  * from the store.
  *
  * Scale shape: the stream side only ever touches the BATCH (bounded by
  * the trigger) and the #cells-row control plane; nothing here scans the
  * accumulated corpus except a fired recluster, which is the documented
  * one-job rebuild over `vectors/`.
  */
object StreamingIvf {

  private def commitsDir(indexPath: String) = s"$indexPath/_stream_commits"

  private def fsOf(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private[streaming] def isCommitted(spark: SparkSession, indexPath: String,
      batchId: Long): Boolean =
    fsOf(spark, indexPath).exists(
      new org.apache.hadoop.fs.Path(s"${commitsDir(indexPath)}/$batchId"))

  private[streaming] def markCommitted(spark: SparkSession, indexPath: String,
      batchId: Long): Unit = {
    val fs = fsOf(spark, indexPath)
    fs.mkdirs(new org.apache.hadoop.fs.Path(commitsDir(indexPath)))
    fs.create(new org.apache.hadoop.fs.Path(s"${commitsDir(indexPath)}/$batchId"), true)
      .close()
  }

  /** One micro-batch against the index — package-visible so the spec can
    * drive every replay/crash interleaving without a streaming runtime.
    * Returns whether the batch was APPLIED (false = already committed,
    * skipped) and whether a recluster fired.
    */
  private[streaming] def processBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, indexPath: String, nCells: Int,
      policy: IvfIncremental.AutoPolicy): (Boolean, Boolean) = {
    if (isCommitted(spark, indexPath, batchId)) (false, false)
    else if (batch.isEmpty) { markCommitted(spark, indexPath, batchId); (false, false) }
    else {
      val (_, fired) = IvfIncremental.addBatchAuto(spark, batch, indexPath, nCells, policy)
      markCommitted(spark, indexPath, batchId)
      (true, fired)
    }
  }

  /** Attach `stream` — a streaming frame of (vec_id long, embedding
    * array<float>) — to the index at `indexPath` (which must already be
    * bootstrapped). Returns the started query; stop it to detach.
    */
  def attach(stream: DataFrame, indexPath: String, nCells: Int,
      checkpoint: String,
      policy: IvfIncremental.AutoPolicy = IvfIncremental.AutoPolicy()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, batchId, indexPath, nCells, policy): Unit
      }
      .start()
}
