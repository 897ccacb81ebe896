package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SpaceSaving guarantees under both regimes:
  *   - m >= distinct: exact counts, zero err (the oracle-gated regime);
  *   - m < distinct: every stored count overestimates by at most its
  *     stored err, err <= N/m, and items with true count > N/m are present;
  *   - merge across partitions preserves all of the above (the partial
  *     states travel through Spark's two-phase aggregation for real here —
  *     repartition(7) forces multi-partition partials).
  */
class HeavyHittersSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // skewed stream: item i appears (40 - i)^2 times, i = 0..39 -> N = sum
  private def skewed = (0 until 40).flatMap(i => Seq.fill((40 - i) * (40 - i))(s"w$i"))

  test("non-numeric capacity fails analysis cleanly, not with a ClassCastException") {
    val df = Seq("a", "b").toDF("w")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(call_function("graft_heavy_hitters", col("w"), lit("x"))).collect()
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("exact regime (m >= distinct): counts match groupBy exactly, err = 0") {
    val df = spark.sparkContext.parallelize(skewed, 7).toDF("w")
    val got = df.agg(call_function("graft_heavy_hitters", col("w"), lit(64)).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select($"e.item", $"e.cnt", $"e.err")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = skewed.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    assert(got.length == 40)
    assert(got.forall(_._3 == 0L), "no eviction may happen when m >= distinct")
    got.foreach { case (item, cnt, _) => assert(cnt == want(item), s"count of $item") }
    // output ordering contract: (cnt desc, item asc)
    assert(got.sortBy { case (item, cnt, _) => (-cnt, item) }.toSeq == got.toSeq)
  }

  test("constrained regime (m < distinct): N/m error bound and heavy-hitter presence") {
    val m = 8
    val n = skewed.size.toLong
    val df = spark.sparkContext.parallelize(skewed, 7).toDF("w")
    val got = df.agg(call_function("graft_heavy_hitters", col("w"), lit(m)).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select($"e.item", $"e.cnt", $"e.err")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val truth = skewed.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    assert(got.length == m)
    // merged-summary bound is TWO-SIDED: a partition's summary that
    // evicted an item contributes none of its occurrences, so a merged
    // count may under- as well as overestimate — within N/m either way
    // (HeavyHittersProps falsified the one-sided sequential claim here)
    got.foreach { case (item, cnt, _) =>
      assert(math.abs(cnt - truth.getOrElse(item, 0L)) <= n / m,
        s"$item exceeds the two-sided N/m band")
    }
    // any item with true count > N/m must be present (w0: 1600 > N/m)
    val present = got.map(_._1).toSet
    truth.filter(_._2 > n / m).keys.foreach(k => assert(present(k), s"heavy hitter $k missing"))
  }

  test("partition count cannot change the exact-regime result") {
    val df1 = spark.sparkContext.parallelize(skewed, 1).toDF("w")
    val df13 = spark.sparkContext.parallelize(skewed, 13).toDF("w")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.agg(call_function("graft_heavy_hitters", col("w"), lit(64)).as("hh"))
        .select(explode(col("hh")).as("e")).select($"e.item", $"e.cnt", $"e.err")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run(df1) == run(df13))
  }

  test("grouped: per-group budgets are independent") {
    val rows = Seq.tabulate(300)(i => (s"g${i % 3}", s"it${i % 5}"))
    val df = spark.sparkContext.parallelize(rows, 5).toDF("g", "w")
    val got = df.groupBy("g")
      .agg(call_function("graft_heavy_hitters", col("w"), lit(8)).as("hh"))
      .select(col("g"), explode(col("hh")).as("e"))
      .select($"g", $"e.item", $"e.cnt", $"e.err")
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    for (g <- 0 until 3; it <- 0 until 5) {
      val want = rows.count(r => r._1 == s"g$g" && r._2 == s"it$it").toLong
      assert(got((s"g$g", s"it$it")) == (want, 0L))
    }
  }
}
