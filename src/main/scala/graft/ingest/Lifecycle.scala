package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** File lifecycle routing + source acknowledgment, on any Hadoop FileSystem
  * (local fs in tests; object stores in production).
  *
  * Mirrors the reference's post-processing file moves and source ack
  * (reference main.py:222-264, 493-494, 630-645):
  *   - archive: copy raw input bytes to an archive prefix (C1)
  *   - route:   Unprocessed -> Processed on success, -> Failed on failure (C4);
  *     done with an atomic rename AFTER the sink commit, so replay after a
  *     crash re-processes (at-least-once, matching the reference's
  *     no-dedup-key streaming insert, main.py:459)
  *   - ack:     marker write after successful end-to-end processing (C5) —
  *     the reference's INBOX-label removal re-expressed as a manifest entry
  */
object Lifecycle {

  sealed trait Outcome
  case object Processed extends Outcome
  case object Failed extends Outcome

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** C1: archive raw bytes by copying to `archiveDir/<name>`. */
  def archive(spark: SparkSession, file: String, archiveDir: String): String = {
    val src = new Path(file)
    val dstDir = new Path(archiveDir)
    val f = fs(spark, src)
    f.mkdirs(dstDir)
    val dst = new Path(dstDir, src.getName)
    org.apache.hadoop.fs.FileUtil.copy(f, src, fs(spark, dst), dst, false, spark.sparkContext.hadoopConfiguration)
    dst.toString
  }

  /** C4: route a file by rewriting its "Unprocessed" path segment — the exact
    * idiom the reference uses (`path.replace("Unprocessed", "Processed")`,
    * main.py:493-494). Rename is atomic on HDFS/local; on an OBJECT STORE it
    * is copy+delete, and a crash inside that window leaves the file at BOTH
    * paths (copy done, delete pending) or at src with a PARTIAL dst (copy
    * interrupted). Either way the source is never lost, so the driver loop's
    * replay re-processes it — the reference's at-least-once contract
    * (no-dedup-key streaming insert, main.py:459) already absorbs the
    * duplicate sink rows. This method is therefore REPLAY-IDEMPOTENT: when
    * the rename reports failure it distinguishes
    *   - dst only (a PREVIOUS rename fully completed; this call is a replay)
    *     → success, nothing to do;
    *   - src AND dst (crashed mid copy+delete; dst may be a partial copy)
    *     → drop dst — the conservative choice, src is the known-complete
    *     bytes (the [[Sink.recoverCompact]] stage-and-swap rule) — and
    *     rename again;
    *   - src only / neither → a real failure, surfaced.
    */
  def route(spark: SparkSession, file: String, outcome: Outcome): String = {
    val target = outcome match {
      case Processed => file.replace("Unprocessed", "Processed")
      case Failed    => file.replace("Unprocessed", "Failed")
    }
    val src = new Path(file)
    val dst = new Path(target)
    val f = fs(spark, src)
    f.mkdirs(dst.getParent)
    if (!f.rename(src, dst)) {
      val srcThere = f.exists(src)
      if (!srcThere && f.exists(dst)) () // completed by a prior (crashed) call
      else if (srcThere && f.exists(dst)) {
        f.delete(dst, false)
        if (!f.rename(src, dst))
          throw new java.io.IOException(
            s"rename $file -> $target failed after dropping stale target")
      } else
        throw new java.io.IOException(s"rename $file -> $target failed")
    }
    target
  }

  /** C5: acknowledge a fully-processed source item by appending its id to a
    * manifest directory (one marker file per id — idempotent, no
    * read-modify-write, safe under concurrent drivers).
    */
  def ack(spark: SparkSession, manifestDir: String, id: String): Unit = {
    val dir = new Path(manifestDir)
    val f = fs(spark, dir)
    f.mkdirs(dir)
    val marker = new Path(dir, java.net.URLEncoder.encode(id, "UTF-8"))
    val out = f.create(marker, true)
    out.close()
  }

  /** C5: has this id already been acknowledged? (the reference's "not in
    * INBOX anymore" check, inverted)
    */
  def isAcked(spark: SparkSession, manifestDir: String, id: String): Boolean = {
    val marker = new Path(new Path(manifestDir), java.net.URLEncoder.encode(id, "UTF-8"))
    fs(spark, marker).exists(marker)
  }
}
