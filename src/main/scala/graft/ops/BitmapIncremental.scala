package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental EXACT distinct-id counts per key — the persisted-state form
  * of the oracle-checked `agg_bitmap` query, and the fourth member of the
  * incremental-state family ([[MinHashIncremental]], [[IvfIncremental]],
  * [[GramDfIncremental]]): maintain "distinct users per segment, ever"
  * over a continuously-arriving event stream without re-reading history.
  *
  * Persisted state under `statePath`: one (key, chunk, mask) row per
  * 64-id block that has ever seen a member — chunk = id >> 6, bit
  * i = id & 63 (floor semantics; div/% would collide negative ids,
  * CorpusOpsSpec pins the failure). The state is a bitmap of the id
  * domain: size is bounded by (keys × occupied 64-id blocks), independent
  * of event volume.
  *
  * Why bitmaps and not a distinct-pair table or HLL:
  *   - masks merge by `bit_or`, which is IDEMPOTENT — replaying a batch
  *     after a crash (the at-least-once delivery every sink in this
  *     engine assumes) cannot inflate a count, where a "+= new rows"
  *     counter would double-count (spec-pinned);
  *   - counts stay EXACT, unlike the HLL sketch path (agg_sketch_merge),
  *     at the cost of state linear in the live id domain — the classic
  *     warehouse trade (bitmap for uniques you bill on, sketch for
  *     uniques you chart);
  *   - the batch pass is two map-side-combinable hash aggregates; the
  *     merge is one full-outer equi-join on (key, chunk) — every shuffle
  *     key is 16 bytes, never an id list.
  */
object BitmapIncremental {

  /** (key, chunk, mask) bitmap of a (key, id) batch. */
  def chunked(batch: DataFrame): DataFrame =
    batch.groupBy(col("key"), expr("shiftright(id, 6)").as("chunk"))
      .agg(expr("bit_or(shiftleft(1L, int(id & 63)))").as("mask"))

  /** Fold a (key, id: long) batch into the state and report per-key
    * (n_distinct, n_new) — n_new counts ids never seen before this batch
    * (computed as popcount(batch & ~state) during the same merge join, so
    * a replayed batch reports n_new = 0 and leaves counts unchanged).
    *
    * The report is returned as a lazy scan over a PERSISTED report table
    * (`statePath + "_report"`, one row per key touched by state or batch,
    * stage-and-swapped with the same crash-window discipline as the state
    * itself): the pre-merge state files are deleted by the swap, so a
    * plan over them could not be consumed late — and a driver
    * materialization would pin one row per KEY on the driver, unbounded
    * for per-user-keyed deployments. Both stagings are written from the
    * same persisted merge before either swap, and the internal caches are
    * released before returning (the round-6 leak rule). Contract: the
    * returned report reads the CURRENT report table — consume it before
    * the next addBatch swaps that table, like any state read here.
    */
  def addBatch(spark: SparkSession, batch: DataFrame, statePath: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val b = chunked(batch)
    val stateOpt =
      if (fs.exists(new org.apache.hadoop.fs.Path(statePath)))
        Some(spark.read.parquet(statePath))
      else None
    val merged = stateOpt
      .map { st =>
        st.select(col("key"), col("chunk"), col("mask").as("m_old"))
          .join(b.select(col("key"), col("chunk"), col("mask").as("m_new")),
            Seq("key", "chunk"), "full_outer")
          .select(col("key"), col("chunk"),
            expr("coalesce(m_old, 0L) | coalesce(m_new, 0L)").as("mask"),
            expr("bit_count(coalesce(m_new, 0L) & ~coalesce(m_old, 0L))").cast("long").as("new_bits"))
      }
      .getOrElse(b.withColumn("new_bits", expr("bit_count(mask)").cast("long")))
      .persist() // consumed by the state write AND the report aggregate

    // stage-and-swap (the GramDfIncremental/IvfIncremental crash-window
    // discipline: a reader never sees a half table). Both stagings are
    // computed from the persisted merge BEFORE either swap so the report
    // never reads state files the swap is about to delete.
    def swapInto(target: String): Unit = {
      val tp = new org.apache.hadoop.fs.Path(target)
      val op = new org.apache.hadoop.fs.Path(target + "_old")
      fs.delete(op, true)
      if (fs.exists(tp)) fs.rename(tp, op)
      fs.rename(new org.apache.hadoop.fs.Path(target + "_staging"), tp)
      fs.delete(op, true)
    }
    merged.select(col("key"), col("chunk"), col("mask"))
      .write.mode("overwrite").parquet(statePath + "_staging")
    val repPath = statePath + "_report"
    merged.groupBy(col("key"))
      .agg(sum(expr("bit_count(mask)")).cast("long").as("n_distinct"),
        sum(col("new_bits")).as("n_new"))
      .write.mode("overwrite").parquet(repPath + "_staging")
    swapInto(statePath)
    swapInto(repPath)
    merged.unpersist(false)
    spark.read.parquet(repPath)
  }

  /** Per-key exact distinct counts from the persisted state alone. */
  def counts(spark: SparkSession, statePath: String): DataFrame =
    spark.read.parquet(statePath)
      .groupBy(col("key"))
      .agg(sum(expr("bit_count(mask)")).cast("long").as("n_distinct"))
}
