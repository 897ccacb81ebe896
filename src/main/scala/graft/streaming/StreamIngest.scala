package graft.streaming

import graft.ingest.{CtbIngest, Lifecycle}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The reference's poll -> process -> ack cycle (reference main.py:648-687)
  * as a Structured Streaming file-source pipeline:
  *
  *   - discovery: `readStream` over an input directory (the "mailbox"),
  *     `Trigger.AvailableNow` = one poll cycle that drains everything
  *     currently pending (the reference's batch run);
  *   - processing: the same CtbIngest per-row semantics applied in
  *     `foreachBatch`;
  *   - commit/ack: checkpointed offsets ARE the INBOX-label removal — a
  *     second run is a no-op for already-seen files (main.py:667 semantics);
  *     `cleanSource=archive` mirrors the Unprocessed->Processed move
  *     (main.py:493-494).
  *
  * Per-file isolation (E1): a malformed file routes its rows to the errors
  * sink rather than failing the stream — the whole-file failure modes
  * (unknown header) are detected per input file and reported to the errors
  * sink as well.
  */
object StreamIngest {

  /** Run one AvailableNow drain cycle. Returns after the stream finishes.
    *
    * @param inputDir    directory being polled for TSV files
    * @param outDir      parquet sink for clean typed rows
    * @param errorsDir   parquet sink for the error channel
    * @param checkpoint  offset/commit log (the ack state)
    * @param archiveDir  processed raw files are moved here by the source
    */
  def runOnce(
      spark: SparkSession,
      inputDir: String,
      outDir: String,
      errorsDir: String,
      checkpoint: String,
      archiveDir: String): Unit = {

    val raw = spark.readStream
      .option("cleanSource", "archive")
      .option("sourceArchiveDir", archiveDir)
      .option("maxFilesPerTrigger", 64)
      .text(inputDir)

    val q = raw.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // Only file NAMES reach the driver (the reference materialized whole
        // files in driver memory, main.py:366 — explicitly rejected here);
        // each file's rows are then processed as a distributed plan, with
        // per-file error isolation (E1).
        val spark2 = batch.sparkSession
        val files = batch.select(input_file_name().as("f")).distinct()
          .collect().map(_.getString(0)).sorted
        files.foreach { file =>
          try {
            val res = CtbIngest.ingestFile(spark2, file)
            if (!res.fileFailed) {
              res.clean.write.mode("append").parquet(outDir)
              res.errors.write.mode("append").parquet(errorsDir)
            } else {
              import spark2.implicits._
              spark2.createDataset(Seq(s"$file: ${res.failureReason.getOrElse("file failed")}"))
                .toDF("error").write.mode("append").parquet(errorsDir)
            }
          } catch {
            case e: Exception => // poison file must not kill the run (E1)
              import spark2.implicits._
              spark2.createDataset(Seq(s"$file: ${e.getMessage}"))
                .toDF("error").write.mode("append").parquet(errorsDir)
          }
        }
      }
      .start()
    q.awaitTermination()
  }
}
