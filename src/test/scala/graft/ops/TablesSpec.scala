package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Guard-rail for the events TIMESTAMP(NANOS) workaround: reading `events`
  * requires `spark.sql.legacy.parquet.nanosAsLong=true` at session build
  * time, and Tables.t must fail with its own clear message — not a Spark
  * internal error whose shape could change across upgrades — when a caller
  * builds a session without it.
  */
class TablesSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("reading events without nanosAsLong fails fast with the named conf") {
    // sibling session: same SparkContext, independent SQL conf — flipping
    // the conf here must not leak into the shared test session
    val ns = spark.newSession()
    ns.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    val e = intercept[IllegalArgumentException](Tables.t(ns, sfDir, "events"))
    assert(e.getMessage.contains("spark.sql.legacy.parquet.nanosAsLong"))
    // the properly-configured shared session still reads events fine
    assert(Tables.t(spark, sfDir, "events").count() > 0)
  }

  test("events ts survives nanos->micros rebuild with full integer precision") {
    val ts = Tables.t(spark, sfDir, "events")
      .selectExpr("cast(ts as string) AS s").limit(1).collect().head.getString(0)
    // a real timestamp, not epoch garbage from double-routed division
    assert(ts.startsWith("20"), ts)
  }
}
