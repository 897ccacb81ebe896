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

  test("regression: the round-18 falsifying merge case satisfies the repaired contract") {
    // Captured by HeavyHittersProps (seed 0Dg-SwstycotK1pmjYRbZT8ZTG4oqgCHEM
    // VnmkK80AL=): m = 12, a 5-way split of a 342-item zipf stream. Under
    // the old keep-m-largest prune a dropped counter's whole mass vanished
    // and |cnt − true| blew past n/m; the PODS'12 pivot prune must keep
    // the interval invariant and the 2n/m band on exactly this input.
    val chunks = Seq(
      "w2 w21 w17 w0 w1 w19 w22 w7 w2 w6 w6 w8 w2 w25 w1 w0 w0 w3 w26 w12 w5 w4 w12 w7 w16 w9 w4 w5 w16",
      "w11 w0 w8 w13 w23 w5 w5 w5 w9 w8",
      "w10 w13 w15 w13 w0 w19 w4 w16 w2 w5 w10 w12 w1 w6 w4 w0 w20 w0 w9 w0 w2 w10 w4 w1 w0 w5 w7 w16 w6 w8 w4 w19 w1 w9 w0 w0 w0 w16 w10 w6",
      "w21 w23 w7",
      "w10 w2 w8 w2 w20 w7 w12 w13 w6 w4 w4 w4 w11 w7 w10 w12 w6 w12 w6 w13 w5 w21 w6 w4 w14 w21 w12 w12 w2 w6 w3 w3 w0 w0 w4 w0 w2 w14 w6 w7 w2 w2 w13 w2 w5 w1 w6 w8 w5 w25 w1 w6 w2 w18 w14 w15 w5 w2 w11 w8 w6 w7 w3 w18 w1 w2 w2 w9 w17 w3 w13 w6 w11 w5 w2 w2 w1 w3 w7 w12 w3 w15 w4 w0 w1 w1 w11 w25 w0 w14 w3 w7 w16 w9 w15 w0 w4 w0 w1 w4 w10 w4 w2 w9 w9 w26 w10 w5 w12 w7 w11 w15 w12 w10 w16 w15 w6 w1 w19 w24 w20 w6 w15 w5 w13 w3 w14 w5 w18 w6 w9 w5 w26 w0 w0 w6 w25 w9 w9 w13 w6 w19 w2 w2 w11 w0 w5 w1 w7 w1 w8 w7 w6 w11 w3 w21 w1 w19 w25 w8 w3 w23 w8 w4 w19 w3 w12 w4 w7 w13 w6 w0 w1 w2 w7 w20 w12 w2 w13 w0 w1 w4 w7 w1 w9 w15 w17 w3 w6 w23 w3 w1 w0 w6 w10 w3 w19 w8 w9 w15 w14 w9 w4 w11 w13 w0 w2 w0 w22 w21 w5 w18 w19 w8 w1 w8 w6 w2 w16 w12 w8 w7 w14 w11 w1 w14 w2 w3 w3 w10 w16 w3 w7 w5 w5")
      .map(_.split(" ").toSeq)
    val m = 12
    val items = chunks.flatten
    val n = items.size.toLong
    val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val a = graft.expressions.HeavyHitters(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.catalyst.expressions.Literal(m,
        org.apache.spark.sql.types.IntegerType))
    val partials = chunks.map { chunk =>
      val b = a.createAggregationBuffer()
      chunk.foreach(s => a.update(b,
        org.apache.spark.sql.catalyst.InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(s))))
      a.deserialize(a.serialize(b))
    }
    val merged = partials.reduceLeft(a.merge)
    val out = a.eval(merged).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val got = (0 until out.numElements()).map { i =>
      val r = out.getStruct(i, 3)
      (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2))
    }
    assert(got.size <= m)
    got.foreach { case (it, cnt, err) =>
      val t = truth.getOrElse(it, 0L)
      val lower = cnt - err
      assert(lower <= t, s"$it: lower $lower overestimates true $t")
      assert(t - lower <= n / m, s"$it: undershoot ${t - lower} > ${n / m}")
      assert(math.abs(cnt - t) <= 2 * n / m, s"$it: |cnt−true| ${math.abs(cnt - t)}")
    }
    truth.filter(_._2 > n / m).keys.foreach { k =>
      assert(got.exists(_._1 == k), s"heavy item $k missing")
    }
  }
}
