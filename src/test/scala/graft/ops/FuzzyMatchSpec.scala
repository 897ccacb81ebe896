package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The multi-pass blocking contract: a second complementary pass catches
  * matches the first provably can't, the block cap drops hot blocks with
  * EXACT surfaced accounting, and pairs found by both passes dedup to one.
  */
class FuzzyMatchSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def names(ns: String*) = ns.toDF("p_name")

  /** join_fuzzy's original single trailing-token pass, for the miss proof. */
  private def tailOnly(ns: Seq[String]): Set[(String, String)] = {
    val nm = names(ns: _*).select(lower(col("p_name")).as("nm")).distinct()
      .withColumn("blk", element_at(split(col("nm"), " "), -1))
    nm.as("x").join(nm.as("y"),
        col("x.blk") === col("y.blk") && col("x.nm") < col("y.nm"))
      .filter(levenshtein(col("x.nm"), col("y.nm")) <= 4)
      .select(col("x.nm"), col("y.nm"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
  }

  test("a match that disagrees on the tail token is missed by one pass, caught by two") {
    // near-identical names whose LAST tokens differ: no shared trailing
    // block exists, so single-pass tail blocking cannot ever pair them —
    // the head pass ("copper") does
    val ns = Seq("copper widget deluxe", "copper widget delux", "steel anvil mk2")
    assert(!tailOnly(ns).contains(("copper widget delux", "copper widget deluxe")),
      "premise: the single-pass form misses this true match")
    val got = FuzzyMatch.matchPairs(names(ns: _*), "p_name", maxDist = 4, blockCap = 100)
    val pairs = got.matches.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.contains(("copper widget delux", "copper widget deluxe")))
    assert(got.passStats.forall(s => s.blocksDropped == 0 && s.candidatesDropped == 0))
  }

  test("hot blocks drop with exact candidate accounting; the other pass still covers") {
    // 5 names share tail "rod" (hot block, cap 4 -> dropped: C(5,2)=10
    // candidates surfaced); head tokens are distinct so the head pass has
    // only singleton blocks EXCEPT the crafted "hot x"/"hot y" pair
    val ns = Seq("alpha rod", "beta rod", "gamma rod", "delta rod", "hot rod",
                 "hot ring")
    val got = FuzzyMatch.matchPairs(names(ns: _*), "p_name", maxDist = 4, blockCap = 4)
    val byPass = got.passStats.map(s => s.pass -> s).toMap
    assert(byPass("tail").blocksDropped == 1)
    assert(byPass("tail").namesDropped == 5)
    assert(byPass("tail").candidatesDropped == 10, "C(5,2) exact")
    assert(byPass("head").blocksDropped == 0)
    val pairs = got.matches.collect().map(r => (r.getString(0), r.getString(1))).toSet
    // tail-block pairs are gone (capped), but the head pass still pairs the
    // two "hot *" names — a name dropped from one pass matches in the other
    assert(pairs == Set(("hot ring", "hot rod")))
  }

  test("a pair caught by BOTH passes appears exactly once, dist carried") {
    // same head AND same tail: "blue rod" vs "blue rodx" shares both blocks
    val got = FuzzyMatch.matchPairs(names("blue rod", "blue rodx"), "p_name", 4, 100)
    val rows = got.matches.collect()
    assert(rows.length == 1)
    assert((rows.head.getString(0), rows.head.getString(1), rows.head.getLong(2))
      == (("blue rod", "blue rodx", 1L)))
  }
}
