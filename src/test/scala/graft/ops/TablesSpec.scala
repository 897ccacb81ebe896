package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Guard-rail for the events `ts` encoding workarounds: the testdata has
  * shipped `ts` as parquet TIMESTAMP(NANOS) (readable only through
  * `spark.sql.legacy.parquet.nanosAsLong=true`, then rebuilt) and as plain
  * TIMESTAMP(MICROS) (directly readable). Tables.t must serve BOTH as one
  * normalized TimestampType column, and the normalization must not depend
  * on the session carrying the legacy conf when the data doesn't need it.
  */
class TablesSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("events reads under either ts encoding; no dependence on the legacy conf") {
    // sibling session: same SparkContext, independent SQL conf — flipping
    // the conf here must not leak into the shared test session
    val ns = spark.newSession()
    ns.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    // micros-encoded testdata must read regardless of the legacy conf; the
    // nanos-encoded variant's path is covered by the LongType branch (its
    // fixture data no longer ships — the branch guards older deployments)
    assert(Tables.t(ns, sfDir, "events").count() > 0)
    assert(Tables.t(spark, sfDir, "events").count() > 0)
  }

  test("events ts is a normalized TimestampType with real values") {
    val df = Tables.t(spark, sfDir, "events")
    // NTZ parquet must surface as the session's (UTC-pinned) TimestampType,
    // so every downstream query sees ONE timestamp type across encodings
    assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    val ts = df.selectExpr("cast(ts as string) AS s").limit(1).collect().head.getString(0)
    // a real timestamp, not epoch garbage from double-routed division
    assert(ts.startsWith("20"), ts)
  }
}
