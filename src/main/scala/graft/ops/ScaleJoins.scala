package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-path join utilities for the 100 TB deployment shapes the small-SF
  * oracle queries can't exhibit:
  *
  *   - bucketed co-located joins: both fact tables written bucketed on the
  *     join key join WITHOUT a shuffle (the scan satisfies the required
  *     hash distribution) — the difference between re-shuffling 100 TB per
  *     join and reading it pre-placed;
  *   - salted joins: a hot key (power-law user, null-surrogate, etc.) is
  *     split across `saltFactor` sub-keys so one reducer doesn't receive the
  *     whole key's data; the small side is replicated per salt. AQE's skew
  *     handling covers moderate skew at runtime — salting is the explicit
  *     plan-level tool for the extreme keys you know about.
  */
object ScaleJoins {

  /** Write `df` as a bucketed managed table on `key` (sorted within buckets
    * for merge-friendly scans). The bucketing metadata is what later lets
    * Catalyst drop the Exchange under joins/aggregations on `key`.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Join two bucketed tables on their bucket key. With matching bucket
    * counts the plan contains no Exchange on either side.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Skew-safe equi-join of a skewed big side against a small side:
    * big rows get a random-but-deterministic salt in [0, saltFactor);
    * small rows are replicated across every salt value, so each hot key's
    * rows spread over `saltFactor` reducers.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    // salt = deterministic hash of the whole row (join keys must be
    // deterministic in Spark); hot-key rows differ in their payload columns
    // and therefore spread across salts
    val saltedBig = big.withColumn("_salt",
      pmod(hash(struct(big.columns.map(col): _*)), lit(saltFactor)))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
