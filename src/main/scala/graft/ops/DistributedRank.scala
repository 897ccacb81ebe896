package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact global ranking without a single-partition Exchange.
  *
  * `Window.orderBy(...)` with an empty `partitionBy` funnels the whole input
  * through ONE partition — the canonical scale-killer for any table that
  * grows with the corpus. This helper computes the SAME exact global
  * `row_number` (and, optionally, running sum) with a mergeable plan:
  *
  *   1. `repartitionByRange` on the sort keys (the same sampling-based range
  *      Exchange a global sort uses — parallel, skew-resistant),
  *   2. `sortWithinPartitions` + a per-PARTITION window (hash Exchange on the
  *      partition id, `spark.sql.shuffle.partitions`-way — never one),
  *   3. per-partition row/sum offsets collected on the driver — bounded by
  *      the partition COUNT (control plane, ≤ shuffle.partitions rows),
  *      broadcast-joined back.
  *
  * Because callers use unique-key tiebreaks (engine-parity rule), ranks are
  * total and deterministic, so ntile/decile assignments derived from the
  * exact rank reproduce the oracle's window results bit-for-bit while the
  * physical plan stays fully parallel. The ranked intermediate is persisted
  * so the offset pass and the final pass see identical range partitions;
  * the cache lives in the session's CacheManager until released — the
  * Verify/Bench harnesses clear it per query (clearCache + unpersist of
  * persistent RDDs, the repo convention), and library callers should do
  * the same after their terminal action.
  */
object DistributedRank {

  /** `df` plus `rankCol` = exact global row_number under `sort`, and (when
    * `cum` is set) `cum._2` = exact global running sum of column `cum._1`.
    * Also returns the total row count and (if requested) the grand sum —
    * free by-products of the offset pass, so callers avoid extra jobs.
    *
    * `release()` unpersists the internal cached intermediate. The offset
    * pass has already materialized the cache by the time `withGlobalRank`
    * returns, so in a CHAIN of rank passes the caller should release pass
    * k as soon as pass k+1 has been constructed (its offset collect fully
    * consumed pass k's output); the LAST pass's cache must live until the
    * terminal action on `df` and be released after it (the Verify/Bench
    * harnesses clear the session cache per query, which covers it too).
    * Releasing early is safe for correctness — callers use unique-key
    * tiebreaks, so a recompute reproduces identical ranks — it only costs
    * the recompute.
    */
  final case class Ranked(df: DataFrame, n: Long, grandSum: Long,
      release: () => Unit)

  def withGlobalRank(
      df: DataFrame,
      sort: Seq[Column],
      rankCol: String,
      cum: Option[(String, String)] = None): Ranked = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val arranged = df
      .repartitionByRange(parts, sort: _*)
      .sortWithinPartitions(sort: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Per-partition stats: one row per range partition (≤ `parts` rows on
    // the driver — control-plane bounded, same class as a header collect).
    val statAggs = Seq(count(lit(1)).as("__c")) ++
      cum.map { case (v, _) => sum(col(v)).as("__s") }
    val stats = arranged.groupBy(col("__pid"))
      .agg(statAggs.head, statAggs.tail: _*)
      .collect()
      .map { r =>
        val pid = r.getInt(0)
        val c = r.getLong(1)
        val s = if (cum.isDefined && !r.isNullAt(2)) r.getLong(2) else 0L
        (pid, c, s)
      }
      .sortBy(_._1)

    val n = stats.map(_._2).sum
    val grand = stats.map(_._3).sum

    // Exclusive prefix offsets per pid; pids with no rows simply never join.
    var rowOff = 0L
    var sumOff = 0L
    val offsets = stats.map { case (pid, c, s) =>
      val o = (pid, rowOff, sumOff)
      rowOff += c; sumOff += s
      o
    }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__roff", "__soff")

    val w = Window.partitionBy(col("__pid")).orderBy(sort: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = arranged.join(broadcast(offDf), Seq("__pid"))
    val ranked0 = joined.withColumn(rankCol, row_number().over(w) + col("__roff"))
    val ranked = cum match {
      case Some((v, out)) =>
        ranked0.withColumn(out, sum(col(v)).over(run) + col("__soff"))
      case None => ranked0
    }
    Ranked(ranked.drop("__pid", "__roff", "__soff"), n, grand,
      () => { arranged.unpersist(blocking = false); () })
  }

  /** Exact `ntile(tiles)` tile number from an exact 1-based global rank —
    * the same uneven-bucket rule every engine implements: with `n` rows the
    * first `n % tiles` buckets hold `n/tiles + 1` rows, the rest `n/tiles`.
    * `n` is a driver scalar (from the offset pass), so this is pure per-row
    * integer arithmetic — no window, no shuffle.
    */
  def exactNtile(rank: Column, n: Long, tiles: Int): Column = {
    val q = n / tiles
    val rem = n % tiles
    if (n <= tiles) rank.cast("int")
    else if (rem == 0L) (idiv(rank - 1L, q) + 1L).cast("int")
    else {
      val cut = rem * (q + 1)
      when(rank <= cut, (idiv(rank - 1L, q + 1) + 1L).cast("int"))
        .otherwise((idiv(rank - cut - 1L, q) + rem + 1L).cast("int"))
    }
  }

  /** Exact integral division (`div`) — `/` on Columns routes through double,
    * which silently rounds past 2^53; ranks stay exact at any n this way.
    */
  private def idiv(a: Column, b: Long): Column = call_function("div", a, lit(b))
}
