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

  /** Join a PARTITIONED fact table against a filtered dimension so Spark's
    * dynamic partition pruning (DPP) skips fact partitions at runtime: the
    * dim filter's surviving join keys become a subquery predicate on the
    * fact scan's partition column, evaluated BEFORE files are listed into
    * tasks. At 100 TB with a date- or tenant-partitioned fact this is the
    * difference between touching every partition and touching the handful
    * the dim actually selects — static pruning can't do it because the
    * surviving keys are only known at runtime. The spec asserts the scan
    * carries a `dynamicpruning` partition filter and reads fewer partitions
    * than the table has.
    *
    * @param factPath  parquet root written with `partitionBy(partKey)`
    * @param dim       already-filtered dimension carrying `partKey`
    */
  def dppJoin(spark: SparkSession, factPath: String, dim: DataFrame,
      partKey: String): DataFrame =
    spark.read.parquet(factPath).join(dim, partKey)

  /** Pre-filter the big side with a Bloom filter of the small side's join
    * keys BEFORE the join's shuffle. When the small side is selective (a
    * filtered dimension), most big-side rows can't match — at 100 TB the
    * win is not shuffling them at all. No false negatives, so the join
    * result is exactly the plain join's; `fpp` only controls how many
    * non-matching rows slip through to the join to be dropped there.
    *
    * Spark injects this automatically for some shuffle joins (runtime
    * bloom filters) when size thresholds align; the explicit form works
    * for any join shape and lets the caller size the filter from known
    * key counts. Long keys only (the common surrogate-key case): the
    * driver-side filter build collects NO rows — `stat.bloomFilter` runs
    * one distributed aggregation and ships back the bit array.
    */
  def bloomPrefilteredJoin(big: DataFrame, small: DataFrame, key: String,
      expectedKeys: Long = 1 << 20, fpp: Double = 0.01): DataFrame = {
    val bf = small.stat.bloomFilter(key, expectedKeys, fpp)
    val bcast = big.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bcast.value.mightContain(k.longValue()))
    big.filter(mightContain(col(key))).join(small, key)
  }
}
