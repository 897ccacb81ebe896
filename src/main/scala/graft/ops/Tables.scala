package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** A pack couples each Spark query with its DuckDB oracle SQL so the two
    * stay reviewable side by side (oracle parity is the correctness gate).
    */
  trait Pack {
    def queries: Map[String, Q]
    def oracles: Map[String, String]
  }
}
