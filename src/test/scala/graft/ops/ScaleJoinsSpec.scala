package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The plan-shape guarantees of the scale-join utilities: bucketed joins
  * run shuffle-free; salted joins spread a hot key and keep join results
  * exactly equal to the unsalted join.
  */
class ScaleJoinsSpec extends AnyFunSuite with SparkSpec {

  test("bucketed co-located join has no Exchange on either side") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val fact = (1 to 1000).map(i => (i.toLong % 100, s"l$i")).toDF("k", "lv")
      val dim = (1 to 500).map(i => (i.toLong % 100, s"r$i")).toDF("k", "rv")
      ScaleJoins.writeBucketed(fact, "b_fact", "k", 8)
      ScaleJoins.writeBucketed(dim, "b_dim", "k", 8)
      val joined = ScaleJoins.bucketedJoin(spark, "b_fact", "b_dim", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 5000) // 10 left x 5 right per key x 100 keys
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_fact")
      spark.sql("DROP TABLE IF EXISTS b_dim")
    }
  }

  test("salted join equals the plain join and spreads the hot key") {
    import spark.implicits._
    // 10k rows of one hot key + a tail
    val big = ((1 to 10000).map(_ => 1L) ++ (1 to 100).map(_.toLong + 1))
      .toDF("k").withColumn("v", monotonically_increasing_id())
    val small = (1L to 101L).toDF("k").withColumn("name", concat(lit("n"), col("k")))
    val plain = big.join(small, "k")
    val salted = ScaleJoins.saltedJoin(big, small, "k", saltFactor = 8)
    assert(salted.count() == plain.count())
    // same result set (k, v, name)
    assert(salted.select("k", "v", "name").exceptAll(plain.select("k", "v", "name")).isEmpty)
    // the hot key's rows really get distinct salt values
    val saltSpread = big.filter($"k" === 1L)
      .withColumn("_salt", pmod(hash(struct(big.columns.map(col): _*)), lit(8)))
      .select("_salt").distinct().count()
    assert(saltSpread == 8)
  }

  test("bloom prefilter prunes non-matching rows and preserves the exact join result") {
    import spark.implicits._
    // big side: 100k keys; small side: 500 of them — a selective dim where
    // ~99.5% of big rows can't match and should never reach the join
    val big = (1L to 100000L).toDF("k").withColumn("v", col("k") * 2)
    val small = (1L to 500L).map(_ * 200).toDF("k").withColumn("name", concat(lit("n"), col("k")))
    val plain = big.join(small, "k")
    val bloomed = ScaleJoins.bloomPrefilteredJoin(big, small, "k",
      expectedKeys = 1000L, fpp = 0.01)
    // no false negatives: result sets identical
    assert(bloomed.select("k", "v", "name").exceptAll(plain.select("k", "v", "name")).isEmpty)
    assert(plain.select("k", "v", "name").exceptAll(bloomed.select("k", "v", "name")).isEmpty)
    // the prefilter actually prunes: survivors = 500 matches + fpp stragglers
    val bf = small.stat.bloomFilter("k", 1000L, 0.01)
    val survivors = big.filter(udf((x: Long) => bf.mightContain(x)).apply(col("k"))).count()
    assert(survivors < 3000, s"bloom should prune ~99% of 100k rows, kept $survivors")
    assert(survivors >= 500)
  }
}
