package graft.ops

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Single-pass pipeline accounting via `Observation`: the counts a
  * production prep job must report (rows in, rows passing the gate, rows
  * surviving dedup) ride the SAME job as the data, as accumulator-backed
  * observed metrics on the plan — instead of the naive shape that re-runs
  * the pipeline once per counter (`df.count()` per stage), which at
  * 100 TB means scanning the corpus N extra times to fill a dashboard.
  *
  * The trade observed metrics make (and the spec pins): they are
  * task-accumulator sums, so a re-executed task double-counts — fine for
  * monitoring, not for billing; exact-once accounting stays with the
  * aggregate-in-the-data-path pattern (CtbIngest's stats rows). Metrics
  * become available only after ANY action on the observed frame
  * completes.
  */
object ObservedPrep {

  /** Quality-gate + exact-dedup prep with observed accounting. Returns
    * the lazy deduped frame and the Observation whose metrics (rows_in,
    * rows_pass, and the dedup survivor count rows_out) materialize with
    * the frame's first action.
    */
  def gateDedupObserved(docs: DataFrame,
      minChars: Long = 100L): (DataFrame, Observation, Observation) = {
    val gateObs = new Observation("gate")
    val outObs = new Observation("out")
    val gated = docs
      .withColumn("ok", col("n_chars") >= minChars)
      .observe(gateObs,
        count(lit(1)).as("rows_in"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("rows_pass"))
      .filter(col("ok"))
      .drop("ok")
    val deduped = gated
      .withColumn("fp", md5(col("text")))
      .withColumn("rn", expr(
        "row_number() OVER (PARTITION BY fp ORDER BY doc_id)"))
      .filter(col("rn") === 1)
      .drop("rn", "fp")
      .observe(outObs, count(lit(1)).as("rows_out"))
    (deduped, gateObs, outObs)
  }
}
