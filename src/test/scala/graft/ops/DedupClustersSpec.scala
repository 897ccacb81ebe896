package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Min-label propagation connected components over pair edges. */
class DedupClustersSpec extends AnyFunSuite with SparkSpec {

  private def pairs(es: (Long, Long)*) = {
    import spark.implicits._
    es.toDF("doc_a", "doc_b")
  }

  test("chains, triangles and singleton pairs resolve to min-id components") {
    // chain 1-2-3 (1 and 3 never directly paired), triangle 10-11-12,
    // isolated pair 20-21, reversed-orientation edge 31->30
    val comp = DedupClusters.components(pairs(
        (1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (10L, 12L),
        (20L, 21L), (31L, 30L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L,
      30L -> 30L, 31L -> 30L))
    val dropped = DedupClusters.dropIds(pairs((1L, 2L), (2L, 3L)))
      .collect().map(_.getLong(0)).toSet
    assert(dropped == Set(2L, 3L)) // rep 1 survives the whole chain
  }

  test("a 20k-edge pseudo-random graph matches a union-find ground truth") {
    // deterministic LCG edges over 5000 nodes: mixed component sizes,
    // cycles, self-contained islands
    var seed = 12345L
    def nxt(): Long = { seed = (seed * 6364136223846793005L + 1442695040888963407L); (seed >>> 33) }
    val es = (1 to 20000).map { _ =>
      val a = nxt() % 5000; val b = nxt() % 5000
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct
    // driver-side union-find ground truth
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = es.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> find(n)).toMap
    val got = DedupClusters.components(pairs(es: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == want.size)
    // min-label CC and min-root union-find must agree exactly
    assert(got == want)
  }

  test("a long path converges within the iteration bound") {
    // path 0-1-2-...-12: diameter 12 — worst case for label propagation
    val es = (0L until 12L).map(i => (i, i + 1))
    val comp = DedupClusters.components(pairs(es: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.values.toSet == Set(0L))
    assert(comp.size == 13)
    val tight = intercept[IllegalArgumentException](
      DedupClusters.components(pairs(es: _*), maxIter = 2))
    assert(tight.getMessage.contains("not converged"))
  }
}
