package graft.streaming

import graft.config.GraftConfig
import graft.ingest.{CtbIngest, Sink}
import graft.notify.Notifier
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.util.concurrent.atomic.AtomicLong

/** The reference's poll -> process -> ack cycle (reference main.py:648-687)
  * as a Structured Streaming file-source pipeline:
  *
  *   - discovery: `readStream` over an input directory (the "mailbox"),
  *     `Trigger.AvailableNow` = one poll cycle that drains everything
  *     currently pending (the reference's batch run); `pathGlobFilter`
  *     carries the source-pushed predicate (the GMAIL_QUERY / CTB-prefix
  *     idiom, A1);
  *   - processing: the same CtbIngest per-row semantics applied in
  *     `foreachBatch`, with the C2 sink precondition and the C3 batched
  *     append (partial-success accounting);
  *   - commit/ack: checkpointed offsets ARE the INBOX-label removal — a
  *     second run is a no-op for already-seen files (main.py:667 semantics);
  *     `cleanSource=archive` mirrors the Unprocessed->Processed move
  *     (main.py:493-494);
  *   - reporting: D2/D3/D4 notifications fire on the same conditions as the
  *     reference (success with inserted count; error with the accumulated
  *     report; no-data when nothing was found OR nothing succeeded,
  *     main.py:679-685).
  *
  * Per-file isolation (E1): a malformed or poison file records its failure
  * and notification and the run continues (reference's per-message
  * try/except, main.py:662-677).
  *
  * Scale note: the whole micro-batch is parsed and validated as ONE
  * distributed plan (CtbIngest.ingestManyLines — per-file line numbers from
  * a single stats pass, one row-rule pipeline per distinct header layout),
  * so ingest cost is O(#layouts) Spark jobs per trigger, not O(#files).
  * Only the sink COMMIT remains a per-file driver loop: it preserves the
  * reference's per-file batched-append accounting (C3 partial success is
  * per file), and concurrent parquet appends to ONE directory would race on
  * the committer's _temporary dir anyway — the commits are cheap filters
  * over the already-parsed, persisted batch.
  */
object StreamIngest {

  final case class RunStats(filesSeen: Long, filesSucceeded: Long)

  /** Run one AvailableNow drain cycle. Returns after the stream finishes. */
  def runOnce(spark: SparkSession, cfg: GraftConfig, notifier: Notifier): RunStats = {
    val seen = new AtomicLong(0)
    val succeeded = new AtomicLong(0)

    val raw = spark.readStream
      .option("cleanSource", "archive")
      .option("sourceArchiveDir", cfg.archiveDir)
      .option("maxFilesPerTrigger", 64)
      .option("pathGlobFilter", cfg.sourceGlob)
      .text(cfg.inputDir)

    val q = raw.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // Only file NAMES and per-file stats reach the driver (the reference
        // materialized whole files in driver memory, main.py:366 — rejected
        // here); the batch's rows are parsed as one distributed plan.
        val spark2 = batch.sparkSession
        val files = batch.select(input_file_name().as("f")).distinct()
          .collect().map(_.getString(0)).sorted
        if (files.nonEmpty) {
          val sinkOk = Sink.tableExists(spark2, cfg.sinkDir)
          val empty = CtbIngest.MultiIngestResult(
            spark2.emptyDataFrame, spark2.emptyDataFrame, Map.empty)
          val multi =
            if (!sinkOk) empty // C2 short-circuit: don't parse
            else try CtbIngest.ingestManyLines(spark2, batch)
            catch { case e: Exception =>
              // a scan-level poison batch (unreadable file, vanished split)
              // must not kill the run (E1): fail the batch's files with the
              // cause, keep draining subsequent triggers
              empty.copy(fileFailed = files.map(f => f -> s"Batch parse failed: $e").toMap)
            }
          val clean = if (sinkOk) multi.clean.persist() else multi.clean
          val errors = if (sinkOk) multi.errors.persist() else multi.errors
          try files.foreach { file =>
            seen.incrementAndGet()
            val name = new org.apache.hadoop.fs.Path(file).getName
            try {
              if (!sinkOk) {
                // C2: missing destination table fails the file, no auto-create
                fileFailed(spark2, cfg, notifier, name,
                  s"Destination table '${cfg.sinkDir}' does not exist. " +
                    "Please ensure the table is created before running.")
              } else if (multi.fileFailed.contains(file)) {
                fileFailed(spark2, cfg, notifier, name, multi.fileFailed(file))
              } else {
                // per-file commit section over the persisted parsed batch:
                // C3 batched append + accounting stay per file
                val mine = col(CtbIngest.SRC_FILE) === file
                val rowErrors = errors.filter(mine).drop(CtbIngest.SRC_FILE)
                val nErrors = rowErrors.count()
                rowErrors.write.mode("append").parquet(cfg.errorsDir)
                val w = Sink.appendBatched(
                  clean.filter(mine).drop(CtbIngest.SRC_FILE), cfg.sinkDir, cfg.batchSize)
                if (w.insertedRows > 0) {
                  // partial success IS success (reference main.py:470-495)
                  succeeded.incrementAndGet()
                  if (w.batchErrors.isEmpty && nErrors == 0)
                    notifier.notifySuccess(name, w.insertedRows)
                  else
                    notifier.notifyError(name,
                      s"Inserted ${w.insertedRows} rows with ${nErrors} row-level " +
                        s"errors and ${w.batchErrors.size} batch errors:\n" +
                        (w.batchErrors ++ errorSample(rowErrors)).mkString("\n"))
                } else {
                  fileFailed(spark2, cfg, notifier, name,
                    s"No valid rows from '$name' could be inserted into the sink." +
                      (if (nErrors > 0) "\nRow-level errors:\n" + errorSample(rowErrors).mkString("\n") else ""))
                }
              }
            } catch {
              case e: Exception => // poison file must not kill the run (E1)
                try fileFailed(spark2, cfg, notifier, name, e.toString)
                catch { case _: Exception => () }
            }
          } finally if (sinkOk) { clean.unpersist(false); errors.unpersist(false) }
        }
      }
      .start()
    q.awaitTermination()

    // D4: nothing found, or found but nothing succeeded (main.py:679-685)
    if (succeeded.get() == 0)
      notifier.notifyNoData(s"${cfg.inputDir}/${cfg.sourceGlob}")
    RunStats(seen.get(), succeeded.get())
  }

  /** Failure path: every file-scoped failure converges on error-sink write +
    * D3 notification (reference §3.3 convergence).
    */
  private def fileFailed(
      spark: SparkSession, cfg: GraftConfig, notifier: Notifier,
      name: String, reason: String): Unit = {
    import spark.implicits._
    Seq(s"$name: $reason").toDF("error")
      .write.mode("append").parquet(cfg.errorsDir)
    notifier.notifyError(name, reason)
  }

  /** First few error strings for the notification body (the reference embeds
    * the full report; the engine bounds it — the complete channel is the
    * errors sink).
    */
  private def errorSample(errors: DataFrame, n: Int = 20): Seq[String] =
    errors.limit(n).collect().map(_.getString(0)).toSeq
}
