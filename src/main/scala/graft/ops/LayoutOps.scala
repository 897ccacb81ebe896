package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Write-side data layout for scan-time pruning — the third leg of the
  * engine's 100 TB locality story next to bucketed co-located joins
  * ([[ScaleJoins]]) and partition-pruned vector cells ([[IvfIncremental]]).
  *
  * Parquet readers skip whole row groups whose footer min/max stats cannot
  * satisfy a pushed predicate. On an unclustered table every row group
  * spans nearly the full value range of every column, so the stats prune
  * nothing; range-clustering on the columns queries actually filter by
  * makes the ranges disjoint, and a selective predicate then reads only
  * the row groups it needs. At 100 TB this is the difference between
  * scanning terabytes and scanning gigabytes for the same query — no
  * index, no extra storage, just write-order.
  *
  * `repartitionByRange` samples the column to build balanced range bounds
  * (one shuffle at write time), `sortWithinPartitions` orders rows inside
  * each output task so every row group covers a narrow slice, and
  * `maxRecordsPerFile` bounds file size so the cluster granularity is
  * controllable independently of task count.
  */
object LayoutOps {

  /** Range-cluster `df` on `byCols` and write parquet whose row-group
    * stats are selective for predicates on those columns.
    *
    * @param targetRowsPerFile upper bound per output file — choose so one
    *   file ~= one row group at the table's row width (row-group skipping
    *   granularity IS this knob at scale)
    * @param numPartitions write-task count; None = spark.sql.shuffle.partitions
    */
  def writeRangeClustered(
      df: DataFrame, path: String, byCols: Seq[String],
      targetRowsPerFile: Long = 1000000L,
      numPartitions: Option[Int] = None): Unit = {
    val cols = byCols.map(col)
    val ranged = numPartitions match {
      case Some(n) => df.repartitionByRange(n, cols: _*)
      case None    => df.repartitionByRange(cols: _*)
    }
    ranged
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRowsPerFile)
      .parquet(path)
  }

  // morton bit-spreading constants (16-bit value -> even bits of a 32-bit
  // word) — the same decimal literals as ScaleOps' oracle-paired fn_morton
  private val Masks = Seq(16711935L -> 8, 252645135L -> 4, 858993459L -> 2, 1431655765L -> 1)

  private def spread16(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Masks.foldLeft(c) { case (v, (m, s)) => v.bitwiseOR(shiftleft(v, s)).bitwiseAND(lit(m)) }

  /** Interleaved z-order key of two 16-bit grid coordinates. Callers map
    * raw columns onto 0..65535 first (at scale: quantile-bucket via
    * ntile(65536) so skew cannot crowd the curve).
    */
  def zOrderKey(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Range-cluster `df` along the z-order (morton) curve of two columns
    * and write parquet. A single-column sort leaves the OTHER column's
    * row-group min/max stats spanning the whole domain — predicates on it
    * prune nothing; the space-filling curve keeps every row group inside
    * a small (x, y) rectangle, so stats stay selective for predicates on
    * EITHER dimension (or both) from ONE write order. This is the layout
    * for the two-sided access pattern (time x tenant, user x day) that
    * partitioning can only serve one side of. Pruning evidence:
    * LayoutOpsSpec.
    */
  def writeZOrdered(
      df: DataFrame, path: String, xCol: String, yCol: String,
      targetRowsPerFile: Long = 1000000L,
      numPartitions: Option[Int] = None): Unit = {
    val keyed = df.withColumn("__z", zOrderKey(col(xCol), col(yCol)))
    val ranged = numPartitions match {
      case Some(n) => keyed.repartitionByRange(n, col("__z"))
      case None    => keyed.repartitionByRange(col("__z"))
    }
    ranged
      .sortWithinPartitions(col("__z"))
      .drop("__z") // projection only — within-partition order survives
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRowsPerFile)
      .parquet(path)
  }

  /** Write parquet with a column BLOOM FILTER on each of `bloomCols` —
    * the third pruning mechanism next to min/max stats and partition
    * pruning, and the only one that serves EQUALITY lookups on columns
    * the layout is NOT ordered by: range-clustering keeps min/max tight
    * on the cluster key, but a point lookup on any other high-cardinality
    * column spans every row group's [min, max]; its bloom filter answers
    * "this row group provably lacks the value" in one bitset probe at
    * footer-read time. Costs a few bits/value of file size; pays off when
    * the workload has needle-in-haystack lookups (id joins, debugging).
    * Pruning evidence: LayoutOpsSpec.
    */
  def writeWithBloomFilter(df: DataFrame, path: String, bloomCols: Seq[String],
      expectedNdv: Long = 100000L, targetRowsPerFile: Long = 1000000L): Unit = {
    val w0 = df.write.mode("overwrite").option("maxRecordsPerFile", targetRowsPerFile)
    val w = bloomCols.foldLeft(w0) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", expectedNdv.toString)
    }
    w.parquet(path)
  }

  /** Per-file min/max stats manifest over `cols` for a parquet directory —
    * the hand-rolled core of what Delta/Iceberg keep in their manifests.
    * Parquet row-group stats prune at SCAN time (every file still gets a
    * footer read and a task); a stats table prunes at PLANNING time: the
    * driver decides which files exist for the query before any task
    * launches. At 100 TB the difference is listing+footer I/O on ~10⁶
    * files per query vs one small-table lookup. One distributed pass
    * builds it (groupBy input_file_name — the shuffle is one row per
    * FILE); refresh incrementally by collecting stats for new files only
    * and unioning.
    */
  def collectFileStats(spark: org.apache.spark.sql.SparkSession, path: String,
      cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    spark.read.parquet(path)
      .select((col(cols.head) +: cols.tail.map(col)) :+ input_file_name().as("file"): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Read only the files whose stats interval can satisfy
    * `lo <= c <= hi`, then apply the exact predicate. The file list is a
    * driver-side collect BOUNDED by file count (control-plane, like the
    * repo's header/batch-id collects); files with a NULL min/max (all-null
    * column) are kept — stats may only ever prune files that provably
    * cannot match. Equivalence and the pruning win are spec-pinned.
    */
  def statsPrunedRead(spark: org.apache.spark.sql.SparkSession, path: String,
      stats: DataFrame, c: String, lo: Long, hi: Long): DataFrame = {
    val keep = stats.filter(
        col(s"${c}_max").isNull || col(s"${c}_min").isNull ||
          (col(s"${c}_max") >= lo && col(s"${c}_min") <= hi))
      .select("file").collect().map(_.getString(0))
    val pred = col(c).between(lo, hi)
    if (keep.isEmpty)
      spark.read.parquet(path).filter(pred).limit(0) // schema-stable empty
    else
      spark.read.parquet(keep.toIndexedSeq: _*).filter(pred)
  }

  /** Outcome of a [[compactSmallFiles]] rewrite, for the caller's metrics
    * sink (silent compaction is how a pipeline loses track of write
    * amplification).
    */
  final case class CompactionStats(
      filesBefore: Int, bytesBefore: Long, filesAfter: Int, rows: Long)

  /** Rewrite a parquet directory of many small files into few near-target-
    * size files — the standing maintenance job of every streaming/incremental
    * sink (each micro-batch or incremental-state swap leaves one file per
    * task; a year of 5-minute triggers is ~100k files whose open/footer
    * overhead dominates scans and whose listing breaks planning long before
    * the data itself is big).
    *
    * Scale shape: file count is computed from actual on-disk bytes
    * (ceil(bytes / targetBytes)), and the rewrite uses `coalesce`, NOT
    * `repartition` — coalesce merges input splits within tasks with ZERO
    * shuffle, so compaction cost is one read + one write of the data.
    * The trade: coalesce preserves input order but not any hash/range
    * placement; when the table should also be clustered, use
    * [[writeRangeClustered]] (which pays its one shuffle deliberately).
    * Writes to `tmpPath` then swaps via rename, so a crash mid-compaction
    * leaves the original directory intact (same stage-and-swap discipline
    * as IvfIncremental's centroid commit).
    */
  def compactSmallFiles(spark: org.apache.spark.sql.SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): CompactionStats = {
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(hadoopPath).filter(_.getPath.getName.startsWith("part-"))
    val bytes = parts.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
    val old = new org.apache.hadoop.fs.Path(path + "__compact_old")
    spark.read.parquet(path).coalesce(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    val rows = spark.read.parquet(tmp.toString).count()
    val nAfter = fs.listStatus(tmp).count(_.getPath.getName.startsWith("part-"))
    // stage-and-swap: the original stays readable until the compacted copy
    // is complete; a crash between the two renames leaves __compact_old for
    // manual recovery rather than an empty table root
    fs.rename(hadoopPath, old)
    fs.rename(tmp, hadoopPath)
    fs.delete(old, true)
    CompactionStats(parts.length, bytes, nAfter, rows)
  }
}
