package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DistributedRank is the replacement for global single-partition windows
  * (the one scale-killer pattern the round-7 audit flagged). These pins
  * prove (a) the mergeable rank/running-sum is BIT-equal to the
  * single-partition window it replaces, (b) exactNtile reproduces engine
  * ntile semantics across uneven-bucket regimes, and (c) the two re-shaped
  * queries' plans really carry no global Window and no SinglePartition
  * Exchange any more.
  */
class DistributedRankSpec extends AnyFunSuite with SparkSpec {

  private def sampleDf(n: Int) = {
    import spark.implicits._
    // keys deliberately non-monotone in id, with duplicate values so the
    // unique-id tiebreak is load-bearing; 7 input partitions so range
    // repartitioning actually moves rows
    (1 to n).map(i => (i.toLong, ((i * 37) % 11).toLong, ((i * 53) % 17).toLong))
      .toDF("id", "v", "amt").repartition(7)
  }

  test("withGlobalRank matches the single-partition window bit-for-bit") {
    val df = sampleDf(101)
    val rk = DistributedRank.withGlobalRank(df,
      Seq(col("v").desc, col("id")), "r", cum = Some(("amt", "c")))
    assert(rk.n == 101)
    val w = Window.orderBy(col("v").desc, col("id"))
    val expect = df
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("c", sum(col("amt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "r", "c").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = rk.df.select("id", "r", "c").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    assert(rk.grandSum == expect.toSeq.map(_._3).max)
  }

  test("exactNtile matches ntile across uneven-bucket regimes") {
    import spark.implicits._
    // n sweeps the interesting cases: n < tiles, n == tiles, n % tiles == 0,
    // and every remainder class
    for (n <- Seq(1, 3, 5, 10, 12, 13, 14, 23, 50); tiles <- Seq(4, 5)) {
      val df = (1 to n).map(_.toLong).toDF("id")
      val expect = df.withColumn("t", ntile(tiles).over(Window.orderBy("id")))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got = df.withColumn("t",
          DistributedRank.exactNtile(col("id"), n.toLong, tiles))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == expect, s"n=$n tiles=$tiles")
    }
  }

  private def assertNoGlobalFunnel(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
    val globalWindows = df.queryExecution.optimizedPlan.collect {
      case w: LogicalWindow if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty,
      s"$name still has a Window over an empty partitionBy")
    // SinglePartition Exchanges are only acceptable when fed by a partial
    // aggregate (scalar agg final step: one row per upstream partition —
    // control-plane bounded). Anything else funnels data rows through one
    // partition.
    val lines = df.queryExecution.executedPlan.toString.linesIterator.toVector
    val offenders = lines.zipWithIndex.collect {
      case (l, i) if l.contains("Exchange SinglePartition") &&
        !lines.lift(i + 1).exists(_.contains("Aggregate")) => l.trim
    }
    assert(offenders.isEmpty,
      s"$name physical plan funnels data through SinglePartition: $offenders")
  }

  test("events_rfm and agg_pareto plans have no single-partition funnel") {
    val dir = "/root/testdata/sf0.001"
    assertNoGlobalFunnel(TemporalOps.queries("events_rfm")(spark, dir), "events_rfm")
    assertNoGlobalFunnel(ExtraRelational.queries("agg_pareto")(spark, dir), "agg_pareto")
  }
}
