package graft.expressions

import graft.SparkSpec
import graft.ops.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The test session installs GraftExtensions (SparkSpec sets
  * `spark.sql.extensions`), so these queries run under the real deployment
  * path: [[DotProductRewrite]] sits in the optimizer batch list, not
  * hand-applied to plans.
  *
  * Inputs read from parquet on purpose: a driver-local relation is fully
  * constant-folded by ConvertToLocalRelation before any plan inspection
  * can see the kernel (the DPP spec pinned the same gotcha for its dim
  * side).
  */
class DotProductRewriteSpec extends AnyFunSuite with SparkSpec {

  private val SF = "/root/testdata/sf0.001"

  private def hofDot(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"

  private def optimizedHasKernel(df: DataFrame): Boolean = {
    var found = false
    df.queryExecution.optimizedPlan.transformAllExpressions {
      case e: DotProductI64 => found = true; e
    }
    found
  }

  /** sequence() arrays have containsNull = false — the provably-safe shape. */
  private def seqDf = Tables.t(spark, SF, "part")
    .filter(col("p_partkey") <= 50)
    .withColumn("a", expr("sequence(p_partkey, p_partkey + 15)"))
    .withColumn("b", expr("sequence(p_partkey * 3, p_partkey * 3 + 15)"))

  test("the natural HOF dot product is rewritten to graft_dot_i64 and agrees with brute force") {
    val q = seqDf.select(col("p_partkey"), expr(hofDot("a", "b")).as("dot"))
    assert(optimizedHasKernel(q), "expected DotProductI64 in the optimized plan")
    val got = q.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = got.keySet.map { k =>
      k -> (0 to 15).map(i => (k + i) * (k * 3 + i)).sum
    }.toMap
    assert(got === brute)
  }

  test("operand and lambda-variable order don't matter; the zero/merge shape does") {
    // swapped multiply operands and swapped add operands still fire
    val swapped = seqDf.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> y * x), 0L, (acc, v) -> v + acc)").as("dot"))
    assert(optimizedHasKernel(swapped))
    // a non-zero seed is NOT a dot product — must not fire
    val seeded = seqDf.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 1L, (acc, v) -> acc + v)").as("x"))
    assert(!optimizedHasKernel(seeded))
    // a different combine (max) must not fire
    val maxed = seqDf.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> greatest(acc, v))").as("x"))
    assert(!optimizedHasKernel(maxed))
  }

  test("nullable-element arrays are left on the interpreted path (null semantics preserved)") {
    // a lambda producing nulls -> containsNull = true on a parquet-backed row
    val df = Tables.t(spark, SF, "part")
      .filter(col("p_partkey") <= 3)
      .withColumn("a", expr("transform(sequence(1L, 2L), x -> if(x = p_partkey, null, x))"))
      .withColumn("b", expr("sequence(1L, 2L)"))
    val q = df.select(expr(hofDot("a", "b")).as("dot"))
    assert(!optimizedHasKernel(q))
    // and the HOF null contract survives: null element -> null result
    val rows = q.collect()
    assert(rows.exists(_.isNullAt(0)) && rows.exists(!_.isNullAt(0)))
  }

  test("overflow semantics follow the session's eval mode in both directions") {
    def big = Tables.t(spark, SF, "part")
      .filter(col("p_partkey") === 1)
      .withColumn("a", expr(s"transform(sequence(1L, 2L), x -> if(x = 1L, ${Long.MaxValue}L, 3L))"))
      .withColumn("b", expr("transform(sequence(1L, 2L), x -> if(x = 1L, 2L, 5L))"))
    // ANSI (Spark 4 session default): the kernel raises exactly as the
    // interpreted fold would
    assert(spark.conf.get("spark.sql.ansi.enabled") === "true")
    val ansiQ = big.select(expr(hofDot("a", "b")).as("dot"))
    assert(optimizedHasKernel(ansiQ))
    assertThrows[Exception](ansiQ.head())
    // LEGACY: both the analyzed fold and the kernel wrap
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val legQ = big.select(expr(hofDot("a", "b")).as("dot"))
      assert(optimizedHasKernel(legQ))
      assert(legQ.head().getLong(0) === (Long.MaxValue * 2L + 15L)) // wraps, no throw
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }
}
