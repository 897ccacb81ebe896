package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Connected components over pair edges: min-label propagation and the
  * large-star/small-star contraction, cross-checked against a driver-side
  * union-find ground truth, plus the resource-lifecycle contract (no RDD
  * blocks may outlive a call — the round-4 bench-contamination defect).
  */
class DedupClustersSpec extends AnyFunSuite with SparkSpec {

  private def pairs(es: (Long, Long)*) = {
    import spark.implicits._
    es.toDF("doc_a", "doc_b")
  }

  /** Driver-side union-find: node -> min-id root, for every node in es. */
  private def unionFind(es: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    es.flatMap(e => Seq(e._1, e._2)).distinct.map(n => n -> find(n)).toMap
  }

  test("chains, triangles and singleton pairs resolve to min-id components") {
    // chain 1-2-3 (1 and 3 never directly paired), triangle 10-11-12,
    // isolated pair 20-21, reversed-orientation edge 31->30
    val es = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L), (31L, 30L))
    val want = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L,
      30L -> 30L, 31L -> 30L)
    // dispatch parity: the driver union-find (default — small graph),
    // the distributed label rounds (localMaxEdges = 0), and the star
    // contraction must all agree exactly
    val comp = DedupClusters.components(pairs(es: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == want)
    val compDist = DedupClusters.components(pairs(es: _*), localMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(compDist == want)
    val compLogN = DedupClusters.componentsLogN(pairs(es: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(compLogN == want)
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
    val want = unionFind(es)
    val got = DedupClusters.components(pairs(es: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == want.size)
    // min-label CC and min-root union-find must agree exactly
    assert(got == want)
    // and the distributed rounds produce the identical labeling
    val gotDist = DedupClusters.components(pairs(es: _*), localMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotDist == want)
  }

  test("componentsLogN: chain of depth 80 + side components, in O(log n) rounds") {
    // a single path 0-1-2-...-80 (diameter 80 — label propagation's worst
    // case) plus a triangle and an isolated pair; ids deliberately
    // interleaved so min-roots aren't chain heads
    val chain = (0L until 80L).map(i => (i + 1, i))
    val es = chain ++ Seq((200L, 202L), (202L, 204L), (204L, 200L), (300L, 301L))
    val want = unionFind(es)
    // depth 80 must converge well inside the O(log n) bound — 12 rounds
    // would already be generous for 85 nodes
    val got = DedupClusters.componentsLogN(pairs(es: _*), maxIter = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("components past its diameter bound dispatches to the contraction") {
    // path 0-1-2-...-12: diameter 12; maxIter=2 cannot converge by
    // propagation, so the call must fall through to the star contraction
    // (fed the MATERIALIZED edges — round-19 refactor) and still return
    // the right answer, releasing every chain the attempt materialized
    val sc = spark.sparkContext
    spark.catalog.clearCache()
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val before = sc.getPersistentRDDs.keySet
    val es = (0L until 12L).map(i => (i, i + 1))
    val comp = DedupClusters.components(pairs(es: _*), maxIter = 2, localMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.values.toSet == Set(0L))
    assert(comp.size == 13)
    val leaked = sc.getPersistentRDDs.keySet.diff(before)
    assert(leaked.isEmpty, s"fallback path leaked RDD blocks: $leaked")
  }

  test("self-pair-only docs get identical coverage from both algorithms") {
    // a doc appearing ONLY as (x, x) — e.g. an exact-dup pair source emitting
    // reflexive edges — must be labeled (x, x) by BOTH algorithms; the
    // round-5 advice found componentsLogN dropped it after self-edge
    // filtering, so coverage differed depending on which path ran
    val es = Seq((1L, 2L), (7L, 7L), (9L, 9L))
    val want = Map(1L -> 1L, 2L -> 1L, 7L -> 7L, 9L -> 9L)
    val prop = DedupClusters.components(pairs(es: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val propDist = DedupClusters.components(pairs(es: _*), localMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(propDist == want)
    val star = DedupClusters.componentsLogN(pairs(es: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(prop == want)
    assert(star == want)
    // degenerate all-self-pair graph: nothing to contract, everyone labeled
    val onlySelf = DedupClusters.componentsLogN(pairs((3L, 3L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(onlySelf == Map(3L -> 3L))
  }

  test("no persistent RDD blocks survive a components() call") {
    // the round-4 defect: per-round localCheckpoint blocks leaked past the
    // call and clearCache() couldn't release them, contaminating every
    // later query in a long-lived session. With a checkpoint dir set (all
    // entry points set one) the result rides checkpoint FILES and the
    // registry must return to its prior state.
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isDefined) // SparkSpec configures it
    spark.catalog.clearCache()
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val before = sc.getPersistentRDDs.keySet
    val es = (1 to 400).map(i => (i.toLong % 97L, (i * 31).toLong % 97L)).filter(e => e._1 != e._2)
    val out = DedupClusters.components(pairs(es: _*), localMaxEdges = 0L)
    assert(out.count() > 0)
    val leakedProp = sc.getPersistentRDDs.keySet.diff(before)
    assert(leakedProp.isEmpty, s"components leaked RDD blocks: $leakedProp")
    val out2 = DedupClusters.componentsLogN(pairs(es: _*))
    assert(out2.count() > 0)
    val leakedStar = sc.getPersistentRDDs.keySet.diff(before)
    assert(leakedStar.isEmpty, s"componentsLogN leaked RDD blocks: $leakedStar")
    // the handed-off results stay usable after the loop blocks are gone
    assert(out.collect().length == out2.collect().length)
  }
}
