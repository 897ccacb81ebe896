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
}
