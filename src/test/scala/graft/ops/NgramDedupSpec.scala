package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** The n-gram near-dup coverage contract: the df cap may drop hot shingles'
  * pairing evidence, but the dropped volume must be OBSERVABLE (round-4
  * verdict: a production pipeline needs the loss surfaced, not silent).
  */
class NgramDedupSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("a hot shingle past the df cap lands in droppedShingles with its df") {
    // "x y z" appears in all 6 docs (df 6 > cap 5) and is their ONLY shared
    // evidence; docs 1 and 2 additionally share three rare shingles
    val corpus = docs(
      (1L, "x y z a b c d e"),
      (2L, "x y z a b c d f"),
      (3L, "x y z p1 q1 r1 s1"),
      (4L, "x y z p2 q2 r2 s2"),
      (5L, "x y z p3 q3 r3 s3"),
      (6L, "x y z p4 q4 r4 s4"))
    val res = TextOps.ngramNearDups(corpus, dfCap = 5, minShared = 3)

    val dropped = res.droppedShingles.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dropped.length == 1, s"expected exactly the one hot shingle, got ${dropped.toSeq}")
    assert(dropped.head._2 == 6L) // "x y z" occurs in all 6 docs

    // pairs supported only by the dropped shingle must NOT appear; the
    // rare-shingle pair (1,2) must survive: grams "a b c"/"b c d" + one of
    // the y-z bridge grams clear minShared=3
    val pairs = res.pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a >= 3L || b >= 3L },
      s"docs 3-6 share only the capped shingle, got pairs $pairs")
  }

  test("under the cap the same shingle contributes pairs and nothing is dropped") {
    val corpus = docs(
      (1L, "x y z a b c"),
      (2L, "x y z a b d"))
    val res = TextOps.ngramNearDups(corpus, dfCap = 200, minShared = 3)
    assert(res.droppedShingles.count() == 0)
    // shared grams: "x y z", "y z a", "z a b" => shared=3 for pair (1,2)
    val p = res.pairs.collect()
    assert(p.length == 1 && p.head.getLong(0) == 1L && p.head.getLong(1) == 2L)
  }
}
