package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pass blocked fuzzy matching — the production form of `join_fuzzy`
  * (whose single trailing-token pass its own comment calls out as the
  * simplification). Entity resolution at scale never trusts ONE blocking
  * key: any single key misses every true match that disagrees on exactly
  * that key (two product names differing in their last token never share a
  * trailing-token block, however close they are). The standard remedy is
  * several COMPLEMENTARY passes — here trailing token and leading token —
  * each independently bounded, unioned and deduplicated before the verify
  * filter.
  *
  * Scale discipline (same as the n-gram dedup df-cap): a block larger than
  * `blockCap` is dropped from that pass entirely — candidate volume within
  * a block is quadratic, and one degenerate key ("the", "inc") must not
  * produce |block|² pairs. Dropped volume is SURFACED, not silently
  * discarded: per-pass stats report dropped blocks, names, and the exact
  * candidate-pair count the cap removed, so a calibration run can see
  * precisely what coverage the cap costs (the `droppedShingles` channel,
  * generalized). A name dropped from one pass can still match in the other
  * — that is the point of complementary keys.
  *
  * Candidates are sum over kept blocks of C(size, 2) — never |names|²; the
  * verify (Levenshtein <= maxDist) rides the block equi-join. No cartesian
  * anywhere, and pair dedup shuffles only (name_a, name_b) strings that
  * already passed verification.
  */
object FuzzyMatch {

  /** Per-pass accounting of what the block cap removed. */
  final case class FuzzyPassStats(
      pass: String,
      blocksDropped: Long,
      namesDropped: Long,
      candidatesDropped: Long)

  final case class FuzzyMatchResult(matches: DataFrame, passStats: Seq[FuzzyPassStats])

  /** The standard complementary pair: trailing token + leading token. */
  val defaultPasses: Seq[(String, org.apache.spark.sql.Column)] = Seq(
    "tail" -> element_at(split(col("nm"), " "), -1),
    "head" -> element_at(split(col("nm"), " "), 1))

  /** The single-key simplification `join_fuzzy` runs (capped, one pass). */
  val tailPass: Seq[(String, org.apache.spark.sql.Column)] = defaultPasses.take(1)

  /** @param names    frame with a string column `nameCol` (deduped here)
    * @param maxDist  Levenshtein verify threshold
    * @param blockCap max names per block per pass; larger blocks drop
    * @param passes   blocking keys over the deduped `nm` column, one pass
    *                 each — every pass shares the capped-union-verify kernel
    */
  def matchPairs(names: DataFrame, nameCol: String, maxDist: Int,
      blockCap: Int,
      passes: Seq[(String, org.apache.spark.sql.Column)] = defaultPasses): FuzzyMatchResult = {
    require(maxDist >= 0 && blockCap >= 2, s"bad maxDist=$maxDist / blockCap=$blockCap")
    require(passes.nonEmpty, "need at least one blocking pass")
    val nm = names.select(lower(col(nameCol)).as("nm")).distinct()

    val perPass = passes.map { case (passName, key) =>
      val blocked = nm.withColumn("blk", key)
      val sizes = blocked.groupBy(col("blk")).agg(count(lit(1)).as("bn"))
      val kept = blocked.join(sizes.filter(col("bn") <= blockCap).select("blk"), "blk")
      val matches = kept.as("x").join(kept.as("y"),
          col("x.blk") === col("y.blk") && col("x.nm") < col("y.nm"))
        .withColumn("dist", levenshtein(col("x.nm"), col("y.nm")).cast("long"))
        .filter(col("dist") <= maxDist)
        .select(col("x.nm").as("name_a"), col("y.nm").as("name_b"), col("dist"))
      // one row per pass on the driver — control-plane bounded
      val r = sizes.filter(col("bn") > blockCap)
        .agg(count(lit(1)).as("blocks"),
          coalesce(sum(col("bn")), lit(0L)).as("names"),
          coalesce(expr("sum(bn * (bn - 1) div 2)"), lit(0L)).as("cands"))
        .head()
      (matches, FuzzyPassStats(passName, r.getLong(0), r.getLong(1), r.getLong(2)))
    }

    // a pair found by several passes is ONE match; dist is a pure function
    // of the pair so distinct over all three columns is exact
    val all = perPass.map(_._1).reduce(_ unionByName _).distinct()
    FuzzyMatchResult(all, perPass.map(_._2))
  }
}
