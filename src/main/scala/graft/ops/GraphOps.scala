package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.IterativeCompute.CheckpointChain

/** PageRank over a directed edge list — the canonical "importance from link
  * structure" signal a training-data pipeline uses to weight or filter web
  * documents (domain/page authority), and the second member of the engine's
  * iterative-compute family next to [[DedupClusters]].
  *
  * Semantics (the standard damped random surfer, dangling mass
  * redistributed uniformly):
  *
  *   pr'(v) = (1-d)/N + d * ( sum_{u->v} pr(u)/out(u)  +  dangling/N )
  *
  * where `dangling` is the total rank sitting on nodes with no out-edges.
  * Ranks sum to exactly 1 at every iteration (up to float addition), so the
  * result is directly usable as a sampling weight.
  *
  * Scale shape: the edge list is pre-joined ONCE with out-degrees so each
  * iteration is a single equi-join (edges ⋈ ranks on src, the only big
  * shuffle, partitioned the same way every round) plus a dst hash-agg with
  * map-side combine. Ranks are one row per node — broadcast-sized relative
  * to edges on real graphs. The dangling term and the L1 convergence delta
  * are two scalar aggregates per round (driver scalars, like the
  * convergence count in [[DedupClusters.components]] — never per-node
  * driver state). Lineage is truncated every round through
  * [[IterativeCompute.CheckpointChain]] and the result is handed off with
  * zero retained storage blocks.
  *
  * Not oracle-comparable (float fixed point) — verified in GraphOpsSpec
  * against a driver-side dense power iteration on the same semantics.
  */
object GraphOps {

  /** Both orientations of a pair list in ONE pass: explode replaces the
    * `pairs.union(pairs.swap)` idiom, whose two branches each re-executed
    * the (possibly expensive) upstream pair pipeline, and whose usual
    * trailing `.distinct()` added an Exchange + HashAggregate over edge
    * volume. Callers must pass a DISTINCT pair list with a != b (true of
    * every near-dup pair kernel: pairs are keyed by an unordered rep pair,
    * generated exactly once) — then the symmetrized set is distinct by
    * construction and needs no shuffle at all (guide §2.4).
    */
  private[ops] def symmetrized(pairs: DataFrame, a: String, b: String): DataFrame =
    pairs.select(explode(array(
        struct(col(a).as("src"), col(b).as("dst")),
        struct(col(b).as("src"), col(a).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))

  /** @param edges   (src: long, dst: long) directed edges; duplicates are
    *                collapsed (a repeated link is one edge, the usual
    *                web-graph convention)
    * @param damping d in [0,1); 0.85 is the classic choice
    * @param maxIter hard round bound
    * @param tol     stop once sum |pr' - pr| < tol
    * @return (node, pagerank) for every node appearing as src or dst
    */
  /** Single-source BFS hop distances over an UNDIRECTED edge list — the
    * third iterative-compute member next to [[DedupClusters]] (components)
    * and [[pagerank]]. In a dedup pipeline this is the "blast radius" query:
    * how far does a near-dup neighborhood extend from a given document, and
    * at what transitive depth — chains of pairwise-similar docs are how
    * template families evade pairwise thresholds.
    *
    * Scale shape: classic frontier expansion — each round is ONE equi-join
    * of the current frontier against the (symmetrized) edge list plus an
    * anti-join against the settled set; work per round is proportional to
    * the frontier's edge neighborhood, never the whole graph. Rounds =
    * eccentricity of the source (exact termination on an empty frontier —
    * no convergence tolerance). Lineage is cut per round by
    * [[IterativeCompute.CheckpointChain]]; zero storage blocks survive the
    * call. Unlike min-label propagation this visits each node once, so BFS
    * from a seed set is also the cheap way to extract one component.
    *
    * @param edges  (src: long, dst: long) undirected pairs (symmetrized here)
    * @param source start node; if None, the smallest node id in the edge set
    *               (deterministic without a caller-side action)
    * @return (node, hop) for every node reachable from the source, hop 0 = source
    */
  def bfsHops(edges: DataFrame, source: Option[Long] = None, maxIter: Int = 100): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val group = new IterativeCompute.DispatchGroup
    val chain = new CheckpointChain(spark, group)
    val dir = edges.select(col("src").cast("long"), col("dst").cast("long"))
    // both orientations from ONE pass (r19): the old self-union executed
    // the whole upstream pair pipeline once per branch; distinct stays —
    // this is a public op whose callers may pass duplicate edges
    val e = chain.next(dir.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("p"))
      .select(col("p.src").as("src"), col("p.dst").as("dst")).distinct())
    val src0 = source.getOrElse(
      e.agg(min(col("src"))).head().getLong(0)) // one tiny scalar job; edge list already materialized
    // Round shape (r19): ONE chain carrying (node, hop) — the frontier is
    // dist.filter(hop == h), a narrow read of the just-materialized
    // blocks, and progress is the dist row-count delta. The old shape
    // checkpointed frontier AND dist separately (3 fixed-floor jobs per
    // round: two materializations + a count); this is 2 — and each round
    // packs TWO expansion hops into the one fused plan (the
    // DedupClusters.components 2-hop discipline: recomputing the small
    // first-hop frontier inside the fused plan is cheaper than paying the
    // per-round materialization floor twice), so the job count rides
    // ceil(eccentricity/2), not eccentricity. maxIter still bounds HOPS:
    // the second hop is suppressed on an odd budget's last round.
    // name-based joins throughout: the second hop's frontier is itself
    // e-derived INSIDE the same fused plan, so df("col") references would
    // hit self-join attribute ambiguity; usingColumns joins resolve clean
    def expand(frontier: DataFrame, settled: DataFrame, h: Long): DataFrame =
      e.join(frontier.withColumnRenamed("node", "src").select(col("src")),
          Seq("src"), "left_semi")
        .select(col("dst").as("node")).distinct()
        .join(settled, Seq("node"), "left_anti")
        .withColumn("hop", lit(h))
    val distChain = new CheckpointChain(spark, group)
    var dist = distChain.next(Seq(src0).toDF("node").withColumn("hop", lit(0L)))
    var hop = 0L
    var settled = 1L // rows in dist (after hop k, nodes within k hops)
    var growing = true
    while (growing && hop < maxIter) {
      val frontier = dist.filter(col("hop") === hop).select(col("node"))
      val f1 = expand(frontier, dist, hop + 1)
      val next =
        if (hop + 2 <= maxIter)
          dist.union(f1).union(
            expand(f1.select(col("node")), dist.union(f1), hop + 2))
        else dist.union(f1)
      hop = math.min(hop + 2, maxIter)
      dist = distChain.next(next)
      val n = dist.count()
      growing = n > settled
      settled = n
    }
    IterativeCompute.handoff(dist, distChain, chain)
  }

  def pagerank(edges: DataFrame, damping: Double = 0.85,
               maxIter: Int = 30, tol: Double = 1e-7): DataFrame =
    pagerankWithRounds(edges, damping, maxIter, tol)._1

  /** [[pagerank]] plus the number of rounds actually run — the observable
    * for the convergence-based early halt (a fast-mixing graph stops well
    * before maxIter; tol = 0 degrades to the fixed-round form).
    *
    * Picking (maxIter, tol): the L1 delta contracts by ~`damping` per
    * round, so rounds-to-tol ≈ log(tol/δ₀)/log(damping) — at d = 0.85,
    * tol = 1e-3 needs ~35 rounds and 1e-7 needs ~90; residual error after
    * the stop is bounded by tol·d/(1-d). The defaults (30, 1e-7) therefore
    * act as a fixed-round bound on slow-mixing graphs; pass an explicit
    * tol matched to the downstream use (sampling weights rarely need
    * better than 1e-3) to get the early halt.
    */
  private[ops] def pagerankWithRounds(edges: DataFrame, damping: Double = 0.85,
               maxIter: Int = 30, tol: Double = 1e-7): (DataFrame, Int) = {
    val spark = edges.sparkSession
    val group = new IterativeCompute.DispatchGroup
    val chain = new CheckpointChain(spark, group)

    val e = edges.select(col("src").cast("long"), col("dst").cast("long")).distinct()
    // one materialized pass: every edge carries its source's 1/out-degree so
    // iterations never re-join degrees
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("out"))
    val wEdges = chain.next(
      e.join(outDeg, "src").select(col("src"), col("dst"),
        (lit(1.0) / col("out")).as("w")))

    val nodes = chain.next(
      e.select(col("src").as("node")).union(e.select(col("dst").as("node"))).distinct())
    val n = nodes.count()
    val srcSet = wEdges.select(col("src").as("node")).distinct()

    val rankChain = new CheckpointChain(spark, group)
    var ranks = rankChain.next(nodes.withColumn("pr", lit(1.0 / n)))
    var iter = 0
    var delta = Double.MaxValue
    while (iter < maxIter && delta >= tol) {
      // rank mass on dangling nodes (no out-edges) — redistributed uniformly
      val dangling = ranks.join(srcSet, Seq("node"), "left_anti")
        .agg(coalesce(sum(col("pr")), lit(0.0))).head().getDouble(0)
      val contribs = wEdges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("pr") * col("w")).as("contrib"))
      val next = rankChain.next(
        ranks.select(col("node"), col("pr").as("old"))
          .join(contribs, Seq("node"), "left")
          .select(col("node"), col("old"),
            (lit((1.0 - damping) / n) +
              lit(damping) * (coalesce(col("contrib"), lit(0.0)) + lit(dangling / n)))
              .as("pr")))
      delta = next.agg(sum(abs(col("pr") - col("old")))).head().getDouble(0)
      ranks = next.select(col("node"), col("pr"))
      iter += 1
    }
    (IterativeCompute.handoff(ranks.select(col("node"), col("pr").as("pagerank")),
      rankChain, chain), iter)
  }

  /** k-core decomposition over an undirected edge list — the fourth
    * iterative-compute member. Core number of a node = the largest k such
    * that it survives in a subgraph where every node has degree >= k. In
    * the near-dup graph this separates DENSE duplication families (high
    * core — every member similar to many members, the template case) from
    * stringy drift chains (core 1-2) more robustly than triangle counts:
    * a hub with many degree-1 neighbors has high degree and many wedges
    * but core 1 neighbors, and peeling discounts it automatically.
    *
    * Algorithm: increasing-k cascade peeling. For k = 2, 3, ...: repeat
    * {remove every node whose CURRENT degree < k} until stable; nodes
    * removed while peeling toward the k-core have core number k−1. The
    * graph is empty when k exceeds the degeneracy. Deterministic — the
    * removal set per round is degree-defined, no ordering choices.
    *
    * Scale shape (round-27 DELTA-DEGREE rewrite — the r26 sf100
    * measurement pinned the old per-round degree re-aggregation + two
    * full-|edges| anti-joins as ~17.8×/decade real cost growth,
    * BASELINE.md "Third decade CLOSED"): degrees are MAINTAINED, not
    * recomputed — deg_k(v) = deg_{k-1}(v) − |edges v→removed_{k-1}|,
    * where removed_{k-1} is the small victim set of the previous round.
    * Each round scans the persisted edge frame once, hash-probing the
    * BROADCAST victim set (no edge shuffle; a victim wave past the
    * 4M-node broadcast cap degrades to a plain shuffle join), shuffles
    * only the matched rows (map-side combine, ≤ Σdeg(victims)), and
    * left-joins the node-sized delta into the survivor frame. Edges
    * incident to earlier victims may linger in the frame — they can
    * never probe-match (victims are always current survivors) — and are
    * COMPACTED away by one semi-join pass whenever the live degree mass
    * (Σdeg of survivors, free from the same aggregate that counts them)
    * falls under half the materialized frame's rows, so total compaction
    * work telescopes to O(|E|). Victim counts are driver scalars (the
    * frontier-size pattern); per-round lineage cuts via
    * [[IterativeCompute.CheckpointChain]], zero retained blocks after
    * handoff. Rounds are bounded by the degeneracy (small on real
    * web/dedup graphs) times cascade depth.
    *
    * Not oracle-comparable (unbounded iteration); GraphOpsSpec verifies
    * against a driver-side sequential peel on crafted and random graphs.
    *
    * @return (node, core) for every node in the edge list
    */
  def kcore(edges: DataFrame, maxK: Int = 1 << 20, maxRounds: Int = 100000): DataFrame = {
    val spark = edges.sparkSession
    val group = new IterativeCompute.DispatchGroup
    val chain = new CheckpointChain(spark, group)
    val resChain = new CheckpointChain(spark, group)
    val dir = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .filter(col("src") =!= col("dst"))
    // symmetrized: each undirected edge present in both orientations, so
    // degree(v) = row count with src = v
    var g = chain.next(
      dir.union(dir.select(col("dst").as("src"), col("src").as("dst"))).distinct())
    // the maintained survivor frame carries (node, CURRENT degree); a node
    // whose neighbors are all removed decrements to degree 0 and peels
    // like any other sub-k-degree node (its core is k−1) — the explicit
    // frame keeps it from vanishing unassigned
    val nodeChain = new CheckpointChain(spark, group)
    var nodes = nodeChain.next(
      g.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg")))
    var result = resChain.next(
      nodes.filter(lit(false)).select(col("node"), lit(0L).as("core")))
    // one aggregate job per use: survivor count + live degree mass
    // (= directed edge rows of the survivor-induced subgraph, since the
    // maintained degrees are exact)
    def nodeStats(n: DataFrame): (Long, Long) = {
      val r = n.agg(count(lit(1)), sum(col("deg"))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val bcastCap = 4L << 20
    var k = 2
    var (alive, liveMass) = nodeStats(nodes)
    var gMass = liveMass // rows in the materialized edge frame (incl. stale)
    var rounds = 0
    while (alive > 0 && k <= maxK && rounds < maxRounds) {
      val victims = nodes.filter(col("deg") < k)
      val nv = victims.count()
      rounds += 1
      if (nv == 0) k += 1
      else {
        result = resChain.next(result.union(
          victims.select(col("node"), lit(k.toLong - 1).as("core"))))
        val removed = victims.select(col("node").as("dst"))
        val probe = if (nv <= bcastCap) broadcast(removed) else removed
        val delta = g.join(probe, Seq("dst"))
          .groupBy(col("src").as("node")).agg(count(lit(1)).as("dd"))
        nodes = nodeChain.next(
          nodes.filter(col("deg") >= k).join(delta, Seq("node"), "left")
            .select(col("node"),
              (col("deg") - coalesce(col("dd"), lit(0L))).as("deg")))
        val s = nodeStats(nodes); alive = s._1; liveMass = s._2
        if (alive > 0 && liveMass < gMass / 2) {
          val nn = nodes.select(col("node"))
          g = chain.next(
            g.join(nn.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
              .join(nn.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi"))
          gMass = liveMass
        }
      }
    }
    IterativeCompute.handoff(result, resChain, nodeChain, chain)
  }

  /** Borůvka minimum spanning forest over a weighted undirected edge list
    * — the fifth iterative-compute member. In a dedup pipeline the MST of
    * the near-dup graph (weight = hamming / 1 − similarity) is the
    * cluster BACKBONE: which members are closest inside a family, and
    * which single cut splits a family that banding over-merged — the
    * question components/kcore (membership/density) cannot answer.
    *
    * Determinism: edge weights are totally ordered by (w, a, b) — the
    * classic distinct-weights trick — so the MSF is UNIQUE and every
    * engine/partitioning/retry computes the same edge set (ties in w
    * cannot produce two valid answers).
    *
    * Per round (Borůvka): every component picks its minimum outgoing
    * edge under the total order (ONE map-side-combined min-struct
    * aggregate over edges tagged with endpoint components), the picked
    * edges join the forest, and the merge graph — component-sized, it
    * HALVES per round — collapses through the shared
    * [[DedupClusters.components]] kernel; surviving labels relabel via
    * one join. Rounds ≤ log₂(n); lineage cut per round, zero retained
    * blocks. Not oracle-comparable (nested unbounded iteration);
    * GraphOpsSpec verifies edge-set equality against driver Kruskal
    * under the same total order.
    *
    * @param edges (src, dst, w) undirected; parallel edges collapse to
    *              their minimum weight, self-loops drop
    * @return (a, b, w) rows of the minimum spanning forest, a < b
    */
  def boruvkaMst(edges: DataFrame, maxRounds: Int = 40): DataFrame = {
    val spark = edges.sparkSession
    val group = new IterativeCompute.DispatchGroup
    val chain = new CheckpointChain(spark, group)
    val compChain = new CheckpointChain(spark, group)
    val mstChain = new CheckpointChain(spark, group)
    val e0 = chain.next(edges
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"),
        col("w").cast("long").as("w"))
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b")).agg(min(col("w")).as("w")))
    var comp = compChain.next(
      e0.select(col("a").as("node")).union(e0.select(col("b").as("node")))
        .distinct().withColumn("comp", col("node")))
    var mst = mstChain.next(e0.filter(lit(false)))
    var rounds = 0
    var active = true
    while (active && rounds < maxRounds) {
      rounds += 1
      val tagged = e0
        .join(comp.select(col("node").as("a"), col("comp").as("ca")), "a")
        .join(comp.select(col("node").as("b"), col("comp").as("cb")), "b")
        .filter(col("ca") =!= col("cb"))
      // each endpoint component sees the edge; min under (w, a, b)
      val cand = tagged.select(col("ca").as("c"),
          struct(col("w"), col("a"), col("b"), col("cb").as("other")).as("pick"))
        .union(tagged.select(col("cb").as("c"),
          struct(col("w"), col("a"), col("b"), col("ca").as("other")).as("pick")))
      val sel = cand.groupBy(col("c")).agg(min(col("pick")).as("pick"))
        .select(col("c"), col("pick.a").as("a"), col("pick.b").as("b"),
          col("pick.w").as("w"), col("pick.other").as("other"))
      val selEdges = sel.select(col("a"), col("b"), col("w")).distinct()
      val nSel = selEdges.count() // driver scalar, the frontier pattern
      if (nSel == 0) active = false
      else {
        mst = mstChain.next(mst.union(selEdges))
        // merge graph is component-sized and halves per round
        val merged = DedupClusters.components(
          sel.select(col("c").as("doc_a"), col("other").as("doc_b")))
          .select(col("doc_id").as("oldc"), col("component").as("newc"))
        comp = compChain.next(
          comp.join(merged, comp("comp") === merged("oldc"), "left")
            .select(col("node"), coalesce(col("newc"), col("comp")).as("comp")))
      }
    }
    IterativeCompute.handoff(mst, mstChain, compChain, chain)
  }
}
