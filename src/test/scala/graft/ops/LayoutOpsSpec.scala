package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Evidence that range-clustered write order turns parquet row-group
  * min/max stats into real scan pruning: the same selective predicate
  * reads a small fraction of the rows from a clustered table that it
  * reads from an unclustered one. The scan operator's own numOutputRows
  * metric (rows surviving row-group skipping) is the measurement.
  */
class LayoutOpsSpec extends AnyFunSuite with SparkSpec {

  /** Rows the parquet reader actually surfaced for this plan's scans. */
  private def scannedRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan
      .collect { case s: FileSourceScanExec => s.metrics("numOutputRows").value }
      .sum
  }

  test("range-clustered layout prunes row groups an unclustered layout reads") {
    val root = java.nio.file.Files.createTempDirectory("layout").toString
    val src = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val total = src.count()

    // clustered: 4 range partitions x ~4k-row files => narrow disjoint
    // l_orderkey ranges per row group
    LayoutOps.writeRangeClustered(src, s"$root/clustered", Seq("l_orderkey"),
      targetRowsPerFile = 4000, numPartitions = Some(4))
    // control: same data, same file granularity, hash-scrambled order =>
    // every row group spans nearly the whole key range
    src.repartition(4).write.mode("overwrite")
      .option("maxRecordsPerFile", 4000).parquet(s"$root/scrambled")

    val pred = col("l_orderkey").between(100, 1500)
    val clustered = spark.read.parquet(s"$root/clustered").filter(pred)
    val scrambled = spark.read.parquet(s"$root/scrambled").filter(pred)

    // identical query results on both layouts
    val a = clustered.orderBy("l_orderkey", "l_linenumber", "l_partkey")
      .collect().toSeq
    val b = scrambled.orderBy("l_orderkey", "l_linenumber", "l_partkey")
      .collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)

    val prunedRows = scannedRows(clustered)
    val fullRows = scannedRows(scrambled)
    // scrambled layout: stats prune nothing, the reader surfaces ~all rows
    assert(fullRows > (total * 0.9).toLong,
      s"control layout unexpectedly pruned: $fullRows of $total")
    // clustered layout: only the row groups overlapping [100, 1500] decode
    assert(prunedRows < total / 4,
      s"clustered layout should skip most row groups: read $prunedRows of $total")
    assert(prunedRows < fullRows / 3)
  }
}
