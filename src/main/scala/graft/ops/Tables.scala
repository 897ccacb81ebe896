package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table access for the engine's query surface.
  *
  * Each query receives `(SparkSession, sfDir)` and must read only from that
  * directory (driver contract, SparkEntry). Scans are plain parquet reads so
  * Catalyst's pushdown/pruning applies; at cluster scale the same call sites
  * would point at partitioned table roots instead of single files.
  */
object Tables {
  /** A query function as declared in SparkEntry.queries. */
  type Q = (SparkSession, String) => DataFrame

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.parquet stores ts as parquet TIMESTAMP(NANOS), which Spark's
      // reader rejects outright. Read the raw nanos as LONG and rebuild a
      // microsecond TimestampType column. Integer division (`div`) keeps full
      // precision — `/` would route through double and corrupt epoch-nanos
      // (~1.7e18 > 2^53). Requires spark.sql.legacy.parquet.nanosAsLong=true
      // at session build time (all entry points set it); setting it here as
      // a side effect would leak session-global state and make query
      // construction order load-bearing.
      require(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
        "reading 'events' requires spark.sql.legacy.parquet.nanosAsLong=true at session build time")
      spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** A pack couples each Spark query with its DuckDB oracle SQL so the two
    * stay reviewable side by side (oracle parity is the correctness gate).
    */
  trait Pack {
    def queries: Map[String, Q]
    def oracles: Map[String, String]
  }
}
