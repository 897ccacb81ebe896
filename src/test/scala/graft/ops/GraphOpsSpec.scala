package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** PageRank vs a driver-side dense power iteration on identical semantics
  * (damping, uniform dangling redistribution), plus the iterative-family
  * resource contract: no RDD blocks outlive a call.
  */
class GraphOpsSpec extends AnyFunSuite with SparkSpec {

  private def edges(es: (Long, Long)*) = {
    import spark.implicits._
    es.toDF("src", "dst")
  }

  /** Dense reference implementation of the same fixed point. */
  private def densePagerank(es: Seq[(Long, Long)], d: Double = 0.85,
                            iters: Int = 200): Map[Long, Double] = {
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.size
    val out = es.distinct.groupBy(_._1).map { case (s, g) => idx(s) -> g.size }
    val adj = es.distinct.map { case (s, t) => (idx(s), idx(t)) }
    var pr = Array.fill(n)(1.0 / n)
    for (_ <- 1 to iters) {
      val dangling = (0 until n).filter(!out.contains(_)).map(pr).sum
      val next = Array.fill(n)((1.0 - d) / n + d * dangling / n)
      adj.foreach { case (s, t) => next(t) += d * pr(s) / out(s) }
      pr = next
    }
    nodes.map(v => v -> pr(idx(v))).toMap
  }

  test("classic 4-node graph with a dangling node matches dense power iteration") {
    // 1->2, 1->3, 2->3, 3->1 form the classic cycle-with-shortcut; 4->3
    // makes 3 heavy; 5 (fed by 3) has no out-edges — the dangling case.
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L), (3L, 5L))
    val want = densePagerank(es)
    val got = GraphOps.pagerank(edges(es: _*))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (v, p) => assert(math.abs(p - want(v)) < 1e-6, s"node $v") }
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("pseudo-random 2k-edge graph: converges, sums to 1, matches dense reference") {
    var seed = 987654321L
    def nxt(): Long = { seed = (seed * 6364136223846793005L + 1442695040888963407L); (seed >>> 33) }
    val es = (1 to 2000).map(_ => (nxt() % 300, nxt() % 300)).filter(e => e._1 != e._2).distinct
    val want = densePagerank(es)
    val got = GraphOps.pagerank(edges(es: _*))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (v, p) => assert(math.abs(p - want(v)) < 1e-6, s"node $v") }
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("convergence stop: a fast-mixing graph halts well before maxIter with unchanged ranks") {
    // complete digraph K5 (every ordered pair): the uniform start IS the
    // fixed point, so the first round's L1 delta is ~0 — the tolerance
    // stop must fire immediately, not after 30 rounds
    val k5 = for (a <- 1L to 5L; b <- 1L to 5L if a != b) yield (a, b)
    val (fast, fastRounds) = GraphOps.pagerankWithRounds(edges(k5: _*), maxIter = 30, tol = 1e-9)
    assert(fastRounds == 1, s"expected immediate halt, ran $fastRounds rounds")
    // tol = 0 is the fixed-round form; early halt must not change the result
    val (fixed, fixedRounds) = GraphOps.pagerankWithRounds(edges(k5: _*), maxIter = 30, tol = 0.0)
    assert(fixedRounds == 30)
    val f = fast.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val x = fixed.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(f.keySet == x.keySet)
    f.foreach { case (v, p) => assert(math.abs(p - x(v)) < 1e-9, s"node $v") }
    // slow-mixing case: the classic dangling graph contracts its L1 delta
    // by ~damping per round, so tol = 1e-3 must fire well before the
    // maxIter=100 bound and land within the tail bound of the fixed point
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L), (3L, 5L))
    val (pr, rounds) = GraphOps.pagerankWithRounds(edges(es: _*), maxIter = 100, tol = 1e-3)
    assert(rounds < 100, s"tolerance stop never fired: $rounds rounds")
    assert(rounds > 5, s"suspiciously fast for a slow-mixing graph: $rounds rounds")
    val want = densePagerank(es)
    val got = pr.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // remaining error after an L1-delta-tol stop is bounded by tol*d/(1-d)
    got.foreach { case (v, p) => assert(math.abs(p - want(v)) < 1e-2, s"node $v") }
  }

  test("bfsHops: exact hop distances on a chain; other components unreachable") {
    // chain 1-2-3-4 (undirected, given in mixed direction) + separate pair 10-11
    val got = GraphOps.bfsHops(edges((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("bfsHops: explicit source overrides the min-node default") {
    val got = GraphOps.bfsHops(edges((1L, 2L), (2L, 3L)), source = Some(3L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 0L, 2L -> 1L, 1L -> 2L))
  }

  test("bfsHops: odd maxIter bounds HOPS despite 2-hop round packing") {
    // chain 1..6 has eccentricity 5 from node 1; maxIter = 3 must stop at
    // hop 3 exactly — the packed round shape expands two hops per fused
    // plan, so the last round on an odd budget must suppress its second hop
    val got = GraphOps.bfsHops(
        edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)), maxIter = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("no persistent RDD blocks survive a bfsHops call") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = GraphOps.bfsHops(edges((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)))
    assert(out.count() == 4)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"leaked RDD blocks: ${(after -- before).mkString(",")}")
  }

  test("jaccardNeighbors matches a brute-force set computation") {
    // two triangle-ish families sharing a bridge + a pendant:
    // 1-2, 1-3, 2-3, 3-4, 4-5, 4-6, 5-6, 2-6
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L), (2L, 6L))
    val got = CorpusOps.jaccardNeighbors(
        edges(es: _*).toDF("a", "b"), 100)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    // brute force over all node pairs with a shared neighbor
    val nbrs = (es ++ es.map(_.swap)).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val nodes = nbrs.keys.toSeq.sorted
    val want = (for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      a = nodes(i); b = nodes(j)
      cn = (nbrs(a) intersect nbrs(b)).size.toLong if cn > 0
      un = nbrs(a).size + nbrs(b).size - cn
    } yield (a, b) -> ((cn, 1000L * cn / un))).toMap
    assert(got == want, s"got $got want $want")
  }

  test("no persistent RDD blocks survive a pagerank call") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = GraphOps.pagerank(edges((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)))
    assert(out.count() == 4)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"leaked RDD blocks: ${(after -- before).mkString(",")}")
  }

  /** Sequential reference peel: core numbers by repeated min-degree removal. */
  private def denseKcore(es: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = es.filter(e => e._1 != e._2).flatMap(e => Seq(e, e.swap)).distinct
    var nbrs = und.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val core = scala.collection.mutable.Map.empty[Long, Long]
    var k = 1L
    while (nbrs.nonEmpty) {
      val victims = nbrs.filter(_._2.size < k + 1).keySet
      if (victims.isEmpty) k += 1
      else {
        victims.foreach(core(_) = k)
        nbrs = (nbrs -- victims).map { case (n, s) => n -> (s -- victims) }
      }
    }
    core.toMap
  }

  private def gotKcore(es: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    GraphOps.kcore(es.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("kcore: clique, cycle, tree, and star have the textbook core numbers") {
    // K5: every node core 4
    val k5 = for (i <- 0L until 5L; j <- (i + 1) until 5L) yield (i, j)
    assert(gotKcore(k5) == (0L until 5L).map(_ -> 4L).toMap)
    // 6-cycle: all core 2
    val cyc = (0L until 6L).map(i => (i, (i + 1) % 6))
    assert(gotKcore(cyc) == (0L until 6L).map(_ -> 2L).toMap)
    // star: center AND leaves core 1 (the hub-discount case — degree 5,
    // many wedges, but core 1; this is what triangle counts get wrong)
    val star = (1L to 5L).map(i => (0L, i))
    assert(gotKcore(star) == (0L to 5L).map(_ -> 1L).toMap)
    // path: all core 1
    val path = (0L until 4L).map(i => (i, i + 1))
    assert(gotKcore(path) == (0L to 4L).map(_ -> 1L).toMap)
  }

  test("kcore: clique with a tail — the cascade case where removal empties a node's edges") {
    // K4 on {0,1,2,3} + tail 3-4-5: tail peels at k=2 (cascade), K4 is core 3
    val es = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 4L), (4L, 5L))
    val want = Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 1L, 5L -> 1L)
    assert(gotKcore(es) == want)
    assert(denseKcore(es) == want, "reference peel agrees")
  }

  test("kcore: pseudo-random graphs match the sequential reference peel") {
    val rnd = new scala.util.Random(17)
    (0 until 5).foreach { trial =>
      val n = 12 + rnd.nextInt(20)
      val es = Seq.fill(n * 3)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      if (es.nonEmpty)
        assert(gotKcore(es) == denseKcore(es), s"trial $trial: $es")
    }
  }

  /** Driver Kruskal under the same (w, a, b) total order — the unique MSF. */
  private def kruskal(es: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val canon = es.filter(e => e._1 != e._2)
      .map { case (s, t, w) => (math.min(s, t), math.max(s, t), w) }
      .groupBy(e => (e._1, e._2)).map { case ((a, b), g) => (a, b, g.map(_._3).min) }
      .toSeq.sortBy { case (a, b, w) => (w, a, b) }
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    canon.foreach { case (a, b, w) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { parent(ra) = rb; out += ((a, b, w)) }
    }
    out.toSet
  }

  private def gotMst(es: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    import spark.implicits._
    GraphOps.boruvkaMst(es.toDF("src", "dst", "w")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("boruvkaMst: textbook cases — triangle, chain, forest, parallel edges") {
    // triangle: drops the heaviest edge
    assert(gotMst(Seq((1L, 2L, 1L), (2L, 3L, 2L), (1L, 3L, 5L))) ==
      Set((1L, 2L, 1L), (2L, 3L, 2L)))
    // chain is its own MST
    val chain = Seq((1L, 2L, 9L), (2L, 3L, 4L), (3L, 4L, 7L))
    assert(gotMst(chain) == chain.toSet)
    // two components stay two trees (spanning FOREST)
    val forest = Seq((1L, 2L, 1L), (2L, 3L, 2L), (1L, 3L, 3L), (10L, 11L, 5L))
    assert(gotMst(forest) == Set((1L, 2L, 1L), (2L, 3L, 2L), (10L, 11L, 5L)))
    // parallel edges collapse to the min; self-loops drop
    assert(gotMst(Seq((1L, 2L, 8L), (2L, 1L, 3L), (1L, 1L, 1L))) == Set((1L, 2L, 3L)))
  }

  test("boruvkaMst: tied weights resolve by the (w, a, b) total order, same as Kruskal") {
    // K4 with ALL weights equal: the unique MSF under the total order
    val k4 = for (i <- 0L until 4L; j <- (i + 1) until 4L) yield (i, j, 7L)
    val got = gotMst(k4)
    assert(got == kruskal(k4))
    assert(got == Set((0L, 1L, 7L), (0L, 2L, 7L), (0L, 3L, 7L)))
  }

  test("boruvkaMst: pseudo-random graphs match driver Kruskal") {
    val rnd = new scala.util.Random(29)
    (0 until 5).foreach { trial =>
      val n = 10 + rnd.nextInt(15)
      val es = Seq.fill(n * 3)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong, rnd.nextInt(40).toLong))
        .filter(e => e._1 != e._2)
      if (es.nonEmpty) {
        val got = gotMst(es)
        val want = kruskal(es)
        assert(got == want, s"trial $trial")
        // forest size = nodes - components
        val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.size
        assert(got.size <= nodes - 1)
      }
    }
  }

  test("no persistent RDD blocks survive a boruvkaMst call") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    import spark.implicits._
    val out = GraphOps.boruvkaMst(
      Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 1L, 3L)).toDF("src", "dst", "w"))
    assert(out.count() == 2)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"leaked RDD blocks: ${(after -- before).mkString(",")}")
  }

  test("no persistent RDD blocks survive a kcore call") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = GraphOps.kcore(edges((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)))
    assert(out.count() == 4)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"leaked RDD blocks: ${(after -- before).mkString(",")}")
  }
}
