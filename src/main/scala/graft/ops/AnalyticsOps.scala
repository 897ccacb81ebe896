package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables._

/** Graph/ops pack rounding out the analytics surface: triangle counting on
  * the near-dup graph, deterministic hash-based train/val/test splitting,
  * hash-ordered uniform sampling, null-aware NOT IN anti joins, sliding
  * distinct-count windows, and hopping (overlapping) time windows.
  *
  * House rules carried over from the other packs:
  *   - every hash the oracle must reproduce derives from md5;
  *   - money/ratios are exact integers (cents / permille) — never float
  *     accumulation;
  *   - every query ends in a deterministic ORDER BY over a unique key.
  */
object AnalyticsOps extends Pack {

  private val tokSql = "string_split(text, ' ')"

  /** The simhash hamming-1..3 near-dup pair graph shared with
    * dedup_simhash_near / graph_bfs_hops, as one self-contained CTE prefix
    * ending in `pairs(rep_a, rep_b)` (house style: each oracle is
    * standalone SQL the driver can run verbatim).
    */
  private val bandCte: String =
    s"""WITH tok AS (
       |  SELECT doc_id, w, count(*) AS wt, ('0x'||substr(md5(w),1,15))::BIGINT AS h
       |  FROM (SELECT doc_id, unnest($tokSql) AS w FROM documents)
       |  WHERE w <> '' GROUP BY doc_id, w),
       |bal AS (
       |  SELECT doc_id, i, SUM(CASE WHEN (h >> i) % 2 = 1 THEN wt ELSE -wt END) AS bal
       |  FROM tok, (SELECT unnest(generate_series(0, 31)) AS i)
       |  GROUP BY doc_id, i),
       |sh AS (
       |  SELECT doc_id, SUM(CASE WHEN bal > 0 THEN (1::BIGINT << i) ELSE 0 END)::BIGINT AS simhash
       |  FROM bal GROUP BY doc_id),
       |reps AS (
       |  SELECT simhash, min(doc_id) AS rep_doc FROM sh GROUP BY simhash),
       |bands AS (
       |  SELECT simhash, rep_doc, b, (simhash >> (b * 8)) & 255 AS bv
       |  FROM reps, (SELECT unnest(generate_series(0, 3)) AS b))""".stripMargin

  private[ops] val pairCte: String =
    bandCte +
      s""",
         |pairs AS (
         |  SELECT DISTINCT x.rep_doc AS rep_a, y.rep_doc AS rep_b
         |  FROM bands x JOIN bands y ON x.b = y.b AND x.bv = y.bv AND x.simhash < y.simhash
         |  WHERE bit_count(xor(x.simhash, y.simhash)) BETWEEN 1 AND 3)""".stripMargin

  /** The same pair graph with its hamming WEIGHT retained — the weighted
    * edge list `pairsw(a, b, w)`, a < b — for the MST oracle row.
    */
  private val pairWCte: String =
    bandCte +
      s""",
         |pairsw AS (
         |  SELECT DISTINCT least(x.rep_doc, y.rep_doc) AS a,
         |         greatest(x.rep_doc, y.rep_doc) AS b,
         |         bit_count(xor(x.simhash, y.simhash))::BIGINT AS w
         |  FROM bands x JOIN bands y ON x.b = y.b AND x.bv = y.bv AND x.simhash < y.simhash
         |  WHERE bit_count(xor(x.simhash, y.simhash)) BETWEEN 1 AND 3)""".stripMargin

  /** Triangle census of an undirected graph given as (a, b) pairs in any
    * orientation (duplicates collapsed here). Degree-ordered orientation:
    * every edge points from its (degree, id)-smaller endpoint, so each
    * triangle is counted exactly once at its lowest-degree corner and
    * per-node wedge work is bounded by OUT-degree — on a power-law graph
    * the hub that would make id-ordering quadratic gets mostly IN-edges
    * instead. Wedges close via one equi-join against the oriented edge
    * list (never an all-pairs product). The count is
    * orientation-invariant, so an id-ordered a<b<c double join (the
    * oracle, the spec's brute force) agrees while the distributed plan
    * keeps the skew bound. Returns one row:
    * (n_nodes, n_edges, n_wedges, n_triangles, cc_permille) where
    * cc_permille = 3000 * triangles / wedges, the global clustering
    * coefficient in exact permille.
    */
  private[ops] def triangleStats(raw: DataFrame,
      distinctPairs: Boolean = false): DataFrame = {
    // e0/deg/out are each consumed 2-3 times downstream (wedge self-join +
    // closing semi-join + degree stats) — without persist the WHOLE
    // upstream pipeline (for graph_triangles: the simhash fingerprint
    // build) re-evaluates once per reference (~9x, measured 16 s -> 2 s at
    // sf0.1). The bench/verify harness sweeps cached blocks after each
    // query.
    // distinctPairs (r19): the kernel-fed query passes true — its pairs
    // are a distinct unordered set with a != b, so the generic
    // dup-collapsing distinct would be a no-op Exchange over edge volume.
    // Arbitrary callers (the spec's crafted graphs carry reversed and
    // repeated edges) keep the collapsing default. Degree instances come
    // from ONE explode pass over the persisted canonical edges instead of
    // a two-branch self-union.
    val canon = raw
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v"))
    val e0 = (if (distinctPairs) canon else canon.distinct()).persist()
    val deg = e0.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .persist()
    // orient by (deg, id): struct comparison gives the total order directly
    val ed = e0
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .withColumn("ku", struct(col("du").as("kd"), col("u").as("kn")))
      .withColumn("kv", struct(col("dv").as("kd"), col("v").as("kn")))
    val out = ed.select(
        when(col("ku") < col("kv"), col("u")).otherwise(col("v")).as("src"),
        when(col("ku") < col("kv"), col("kv")).otherwise(col("ku")).as("kdst"))
      .withColumn("dst", col("kdst").getField("kn"))
      .persist()
    val wedges = out.as("p").join(out.as("q"),
        col("p.src") === col("q.src") && col("p.kdst") < col("q.kdst"))
      .select(col("p.dst").as("wu"), col("q.dst").as("wv"))
    val tri = wedges.join(out.select(col("src").as("wu"), col("dst").as("wv")),
        Seq("wu", "wv"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val base = deg.agg(
      count(lit(1)).as("n_nodes"),
      expr("sum(deg) div 2").as("n_edges"),
      sum(expr("(deg * (deg - 1)) div 2")).as("n_wedges"))
    base.crossJoin(tri)
      .withColumn("cc_permille", expr("(n_triangles * 3000) div n_wedges"))
  }

  /** Synchronous 3-round LPA over the near-dup pair graph, shared by
    * graph_communities (the labels themselves) and graph_modularity (the
    * partition-quality score). Returns (symmetrized distinct edge list,
    * (node, label) frame). The edge frame is query-held-persisted (it is
    * re-joined every round): released by the engine-entry convention —
    * Verify/Bench sweep sc.getPersistentRDDs after every query (the
    * contract pinned on SparkEntry.queries); standalone callers must
    * sweep likewise.
    */
  private def lpaLabels(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    // kernel pairs are distinct unordered rep pairs (a != b), so the
    // exploded symmetrization is distinct by construction — the old
    // union+distinct both re-executed the pair kernel per branch and paid
    // an edge-volume Exchange (GraphOps.symmetrized doc)
    val edges = GraphOps.symmetrized(
      TextOps.simhashNearPairs(s, d), "rep_a", "rep_b").persist()
    var lab = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to 3) {
      val freq = lab.as("l")
        .join(edges.as("e"), col("l.node") === col("e.src"))
        .groupBy(col("e.dst").as("nd"), col("l.label").as("lb"))
        .agg(count(lit(1)).as("c"))
      // argmax by (count, -label): max count wins, ties take the
      // smallest label — one struct-max agg, no window needed
      lab = freq
        .groupBy(col("nd").as("node"))
        .agg(max(struct(col("c"), (-col("lb")).as("neg"))).as("m"))
        .select(col("node"), (-col("m.neg")).as("label"))
    }
    // the fixed point is consumed up to 3× by callers (graph_modularity:
    // lu, lv, and the degree rollup) — unpersisted, EACH consumption
    // re-ran all three LPA rounds (measured r23: ~2.3 s of the query's
    // 7.1 s subset median). Query-held persist under the documented
    // caller-sweeps contract, same as `edges` above.
    (edges, lab.persist())
  }

  val queries: Map[String, Q] = Map(

    "graph_triangles" -> ((s, d) => {
      // Triangle census of the near-dup pair graph — the density signal
      // that separates a template FAMILY (clique-ish: many triangles) from
      // a drift CHAIN (path-ish: none), which components/BFS alone can't
      // see. Algorithm + scale shape: [[triangleStats]].
      triangleStats(TextOps.simhashNearPairs(s, d)
        .select(col("rep_a").as("a"), col("rep_b").as("b")), distinctPairs = true)
    }),

    "graph_pagerank" -> ((s, d) => {
      // PageRank over the near-dup pair graph — link-structure authority
      // as a keep-which-copy signal (the most-linked representative of a
      // template family is the canonical one). This row is the ORACLE
      // GATE for the iterative-rank plane: the production float kernel
      // ([[GraphOps.pagerank]], spec-gated — float fixed points aren't
      // hash-comparable across engines) shares its shape; here every
      // quantity is scaled INTEGER arithmetic (scale 1e12, damping
      // 85/100, THREE fixed iterations, floor division throughout) so
      // both engines produce bit-identical ranks. The graph is
      // symmetrized, so every node has out-edges and the dangling term
      // vanishes by construction.
      //
      // Scale shape (same as the float kernel): per round ONE equi-join
      // of ranks (a row per node) against the edge list on src — the
      // only big shuffle, same partitioning every round — plus a dst
      // hash-agg with map-side combine. Rounds are FIXED (3), so the
      // lineage is bounded and needs no checkpoint chain.
      // symmetrized via explode: one kernel execution, no edge-volume
      // distinct Exchange (kernel pairs are distinct with a != b)
      val edges = GraphOps.symmetrized(
        TextOps.simhashNearPairs(s, d), "rep_a", "rep_b").persist()
      val nodes = edges.groupBy("src").agg(count(lit(1)).as("outd"))
        .select(col("src").as("node"), col("outd")).persist()
      val n = math.max(nodes.count(), 1L) // one scalar job — control plane
      val p0 = 1000000000000L / n
      val base = 15L * p0 / 100L
      var pr = nodes.withColumn("pr", lit(p0))
      for (_ <- 1 to 3) {
        val contrib = pr.as("p")
          .join(edges.as("e"), col("p.node") === col("e.src"))
          .select(col("e.dst").as("cn"), expr("pr div outd").as("c"))
          .groupBy("cn").agg(sum(col("c")).as("s"))
        pr = nodes.join(contrib, col("node") === col("cn"), "left")
          .select(col("node"), col("outd"),
            (lit(base) + expr("(85 * coalesce(s, 0L)) div 100")).as("pr"))
      }
      pr.select(col("node").as("doc_id"), col("outd").as("degree"),
          col("pr").as("pr_scaled"))
        .orderBy("doc_id")
    }),

    "graph_kcore_peel" -> ((s, d) => {
      // 2-core peeling, THREE fixed rounds — the degeneracy gate that
      // separates tightly-coupled template families (core survivors)
      // from stragglers attached by a single near-dup edge (peeled).
      // ORACLE GATE for the iterative-peel plane: [[GraphOps.kcore]]
      // (spec-gated) runs the data-dependent fixed point; here rounds
      // are FIXED so lineage is bounded and the readout hash-exact
      // (the graph_pagerank discipline). Per node: starting degree,
      // the round that peeled it (0 = survived all three), and the
      // qualifying degree entering the last round.
      // Scale shape (round-27 DELTA-DEGREE rewrite — the r26 sf100
      // measurement pinned the old per-round full-|edges| semi-join +
      // re-aggregation shape as the 17.8×/decade real-growth driver,
      // BASELINE.md "Third decade CLOSED"): round k's degrees need no
      // edge re-aggregation at all, because
      //   deg_k(v) = deg_{k-1}(v) − |edges v→removed_{k-1}|
      // where removed_{k-1} is the SMALL fringe peeled last round.
      // Counting v→removed over the FULL persisted edge list equals
      // counting over the previous survivor subgraph — both endpoints of
      // any such edge were alive last round — so the output (and the
      // oracle hash) is unchanged. Each round therefore scans the
      // persisted edges ONCE, hash-probing the BROADCAST removed set (no
      // edge shuffle; a fringe past the 4M-node broadcast cap degrades
      // to the plain shuffle join, i.e. the r26 shape), shuffles only
      // the matched rows (map-side combine, ≤ Σdeg(removed) rows), and
      // left-joins the node-sized delta into the survivor frame.
      // symmetrized via explode: one kernel execution, no edge-volume
      // distinct Exchange (kernel pairs are distinct with a != b)
      val edges = GraphOps.symmetrized(
        TextOps.simhashNearPairs(s, d), "rep_a", "rep_b").persist()
      val d0 = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        .select(col("src").as("node"), col("deg")).persist()
      val bcastCap = 4L << 20
      // prev: (node, deg) over the subgraph its own parent survivor set
      // induces. Returns the NEXT survivor degrees: prev's deg>=2 nodes
      // with deg over the subgraph THEY induce. Persisted — each round
      // frame feeds the next round's two filters plus the readout
      // (caller sweeps per the SparkEntry persist contract).
      def peelDelta(prev: DataFrame): DataFrame = {
        val removed = prev.filter(col("deg") < 2).select(col("node").as("dst"))
        val probe = if (removed.count() <= bcastCap) broadcast(removed) else removed
        val delta = edges.join(probe, Seq("dst"))
          .groupBy(col("src").as("node")).agg(count(lit(1)).as("dd"))
        prev.filter(col("deg") >= 2).join(delta, Seq("node"), "left")
          .select(col("node"),
            (col("deg") - coalesce(col("dd"), lit(0L))).as("deg"))
          .persist()
      }
      val u1 = peelDelta(d0) // a1's nodes, degrees over the a1-subgraph
      val u2 = peelDelta(u1) // a2's nodes, degrees over the a2-subgraph
      d0.select(col("node").as("doc_id"), col("deg").as("degree0"))
        .join(d0.filter(col("deg") >= 2)
          .select(col("node").as("doc_id"), lit(true).as("in1")),
          Seq("doc_id"), "left")
        .join(u1.filter(col("deg") >= 2)
          .select(col("node").as("doc_id"), lit(true).as("in2")),
          Seq("doc_id"), "left")
        .join(u2.filter(col("deg") >= 2)
          .select(col("node").as("doc_id"), col("deg").as("deg3"),
          lit(true).as("in3")), Seq("doc_id"), "left")
        .select(col("doc_id"), col("degree0"),
          when(col("in1").isNull, 1L).when(col("in2").isNull, 2L)
            .when(col("in3").isNull, 3L).otherwise(0L).as("peel_round"),
          coalesce(col("deg3"), lit(0L)).as("deg_final"))
        .orderBy("doc_id")
    }),

    "graph_mst_round" -> ((s, d) => {
      // ONE Borůvka round over the WEIGHTED near-dup pair graph (edge
      // weight = simhash hamming distance 1..3 — minimum weight picks the
      // CLOSEST near-dup) — the oracle gate for the iterative-MSF plane:
      // [[GraphOps.boruvkaMst]] (spec-gated against driver Kruskal) runs
      // the data-dependent fixed point; here exactly one round runs so
      // lineage is bounded and the readout hash-exact (the
      // graph_kcore_peel discipline). Weights are heavily tied (three
      // values), so the row exercises the (w, a, b) total order that
      // makes the MSF unique — the determinism the whole plane rests on.
      // Per selected edge: endpoints, weight, and how many nodes picked
      // it (2 = mutual minimum, the halving guarantee's witness).
      // Scale shape: one groupBy(a,b) dedupe, one union (each edge seen
      // by both endpoints), ONE map-side-combined min-struct aggregate
      // keyed by node, one count agg on the selected-edge key — all
      // 8-byte-key shuffles, no self-joins beyond the shared kernel.
      // the kernel emits each unordered rep pair exactly once with its
      // (pair-determined) hamming weight, so the old groupBy(a,b).min(w)
      // dedupe was a no-op Exchange — dropped; both endpoint picks come
      // from ONE explode pass instead of a self-union that executed the
      // kernel twice (the GraphOps.symmetrized discipline)
      val cand = TextOps.simhashNearPairs(s, d)
        .select(least(col("rep_a"), col("rep_b")).as("a"),
          greatest(col("rep_a"), col("rep_b")).as("b"), col("hamming").as("w"))
        .select(explode(array(
          struct(col("a").as("node"), struct(col("w"), col("a"), col("b")).as("pick")),
          struct(col("b").as("node"), struct(col("w"), col("a"), col("b")).as("pick")))).as("x"))
        .select(col("x.node").as("node"), col("x.pick").as("pick"))
      cand.groupBy(col("node")).agg(min(col("pick")).as("pick"))
        .groupBy(col("pick.a").as("edge_a"), col("pick.b").as("edge_b"),
          col("pick.w").as("w"))
        .agg(count(lit(1)).as("n_pickers"))
        .orderBy("edge_a", "edge_b")
    }),

    "graph_hits" -> ((s, d) => {
      // HITS hubs & authorities over the DIRECTED near-dup pair graph
      // (pairs keep their canonical rep_a→rep_b orientation, min-id
      // pointing at its family peers) — the asymmetric complement to
      // pagerank's symmetrized authority: a node referenced by many
      // low-ids is an AUTHORITY (canonical copy), a node fanning out to
      // many targets is a HUB (template source). Kleinberg's mutual
      // recursion, TWO fixed rounds, UN-normalized exact BIGINT scores
      // (h0 = 1): normalization divides by a float L2 norm — an
      // engine-divergent sqrt fold — while the unnormalized fixed-round
      // scores are pure integer sums (bounded by max-degree⁴, far from
      // Long range on a df-capped near-dup graph), so ranking order is
      // identical and the readout hash-exact.
      //   a1(v) = indeg(v);  h1(u) = Σ_{u→v} a1(v);  a2(v) = Σ_{u→v} h1(u)
      // Scale shape (the pagerank discipline): per half-round ONE
      // equi-join of the score frame (a row per node) against the edge
      // list on its key + one map-side-combinable agg; edges never
      // self-join, rounds are fixed so lineage is bounded.
      // kernel pairs are already distinct — the .distinct() was a no-op
      // Exchange over edge volume, dropped; the node set comes from ONE
      // explode pass over the persisted pairs instead of a self-union
      val pairs = TextOps.simhashNearPairs(s, d)
        .select(col("rep_a").as("src"), col("rep_b").as("dst")).persist()
      val nodes = pairs
        .select(explode(array(col("src"), col("dst"))).as("node")).distinct()
      val a1 = pairs.groupBy(col("dst")).agg(count(lit(1)).as("a1"))
      val h1 = pairs.join(a1, "dst")
        .groupBy(col("src")).agg(sum(col("a1")).as("h1"))
      val a2 = pairs.join(h1, "src")
        .groupBy(col("dst")).agg(sum(col("h1")).as("a2"))
      nodes
        .join(a1.select(col("dst").as("node"), col("a1")), Seq("node"), "left")
        .join(h1.select(col("src").as("node"), col("h1")), Seq("node"), "left")
        .join(a2.select(col("dst").as("node"), col("a2")), Seq("node"), "left")
        .select(col("node").as("doc_id"),
          coalesce(col("a1"), lit(0L)).as("auth1"),
          coalesce(col("h1"), lit(0L)).as("hub1"),
          coalesce(col("a2"), lit(0L)).as("auth2"))
        .orderBy("doc_id")
    }),

    "graph_communities" -> ((s, d) => {
      // Label-propagation COMMUNITIES over the near-dup pair graph —
      // the third member of the iterative-graph plane next to components
      // (min-label to convergence) and pagerank: synchronous LPA,
      // label_{t+1}(v) = the most frequent label among v's neighbors at
      // t (ties -> smallest label), THREE fixed rounds, initial label =
      // node id. Distinct semantics from connected components: a single
      // bridge edge between two dense template families does NOT merge
      // them — frequency voting keeps each clique on its own label,
      // which is exactly the dedup-triage question ("one family or two
      // bridged ones?") components can't answer. Deterministic by
      // construction: counts + min tie-break, no randomized update
      // order.
      //
      // Scale shape (the pagerank discipline): per round ONE equi-join
      // of the label frame (a row per node) against the edge list on
      // src — same key, same partitioning every round — then a
      // (dst, label) count agg and a per-dst argmax, both map-side
      // combinable; labels are 8-byte ids, text never rides. Rounds are
      // FIXED (3), so lineage is bounded and needs no checkpoint chain.
      val (_, lab) = lpaLabels(s, d)
      lab.select(col("node").as("doc_id"), col("label").as("community"))
        .orderBy("doc_id")
    }),

    "graph_modularity" -> ((s, d) => {
      // Newman MODULARITY Q of the LPA community partition — the quality
      // score for graph_communities' own output (Q = Σ_c [e_c/m −
      // (d_c/2m)²]): near 0 the "communities" are no better than random
      // edge placement, toward 1 they are genuinely dense families —
      // the gate deciding whether community-wise dedup actions are safe.
      // Exact: per-community q_num = 4m·e_in − d_sum² in BIGINT (valid
      // for m < ~1.5·10⁹ edges — past that the factored per-community
      // terms ship and consumers assemble in big-decimal, the
      // events_autocorr rule), Q = Σq_num / (4m²) is ONE IEEE division.
      // Scale shape: LPA rounds as in graph_communities; then one
      // edges⋈labels⋈labels equi-join pair for internal edges, one
      // degree rollup, and a scalar edge-count broadcast (events_rfm
      // shape, allowlisted); everything map-side combinable.
      val (edges, lab) = lpaLabels(s, d)
      val e1 = edges.filter(col("src") < col("dst"))
      val mEdges = e1.agg(count(lit(1)).as("mm"))
      val lu = lab.select(col("node").as("src"), col("label").as("cu"))
      val lv = lab.select(col("node").as("dst"), col("label").as("cv"))
      val ein = e1.join(lu, "src").join(lv, "dst")
        .filter(col("cu") === col("cv"))
        .groupBy(col("cu").as("comm")).agg(count(lit(1)).as("e_in"))
      val dsum = edges.groupBy(col("src")).agg(count(lit(1)).as("dg"))
        .join(lab.select(col("node").as("src"), col("label")), "src")
        .groupBy(col("label").as("comm"))
        .agg(sum(col("dg")).as("d_sum"), count(lit(1)).as("n_nodes"))
      dsum.join(ein, Seq("comm"), "left")
        .select(col("comm"), coalesce(col("e_in"), lit(0L)).as("e_in"),
          col("d_sum"))
        .crossJoin(broadcast(mEdges))
        .select(col("comm"),
          (lit(4L) * col("mm") * col("e_in") - col("d_sum") * col("d_sum")).as("q_num"),
          col("mm"))
        .agg(count(lit(1)).as("n_communities"), min(col("mm")).as("n_edges"),
          sum(col("q_num")).as("q_num_sum"))
        .select(col("n_communities"), col("n_edges"), col("q_num_sum"),
          (col("q_num_sum").cast("double") /
            (lit(4L) * col("n_edges") * col("n_edges")).cast("double")).as("modularity"))
    }),

    "graph_assortativity" -> ((s, d) => {
      // Degree ASSORTATIVITY (Newman 2002): the Pearson correlation of
      // endpoint degrees over every directed edge instance — positive
      // means hubs link to hubs (social-graph shape), negative means
      // hubs link to leaves (web/star shape). On a near-dup graph it
      // answers "do big template families cross-link each other, or
      // orbit isolated hubs?" — which decides whether family-merge
      // passes cascade. agg_corr's exact-integer-moment discipline: both
      // orientations of each undirected edge contribute a (du, dv)
      // pair, the five moment sums stay in BIGINT, and the only float
      // ops are two IEEE sqrts + one mul + one div on identical
      // integers. Zero-variance (regular) graphs yield NULL.
      // Scale shape: one degree aggregate on 8-byte node ids, two
      // degree joins onto the edge list (sort-merge at scale), one
      // map-side-combinable moment rollup — no window, no all-pairs.
      // kernel pairs are distinct unordered rep pairs with a != b: the old
      // .distinct() was a no-op Exchange (dropped); degree instances and
      // the both-orientations moment stream each come from ONE explode
      // pass instead of self-unions that re-read (or re-computed) their
      // input per branch (the GraphOps.symmetrized discipline)
      val e = TextOps.simhashNearPairs(s, d)
        .select(least(col("rep_a"), col("rep_b")).as("u"),
          greatest(col("rep_a"), col("rep_b")).as("v"))
        .persist() // degree aggregate AND the moment pass both read it
      val deg = e.select(explode(array(col("u"), col("v"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val both = e
        .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
        .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
        .select(col("du"), col("dv"))
      val m = both.select(explode(array(
          struct(col("du").as("x"), col("dv").as("y")),
          struct(col("dv").as("x"), col("du").as("y")))).as("p"))
        .select(col("p.x").as("x"), col("p.y").as("y"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
      m.select(expr("n div 2").as("n_edges"),
        when(col("n") * col("sxx") - col("sx") * col("sx") > 0,
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
             sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
          .as("assortativity"))
    }),

    "graph_degree_dist" -> ((s, d) => {
      // Degree DISTRIBUTION of the near-dup pair graph in power-of-2
      // buckets — the shape diagnostic every web-scale graph job runs
      // first: a heavy tail (high buckets populated) says hub templates
      // exist and the downstream pair/wedge work needs a df cap or skew
      // salt; a flat head says plain per-edge plans are safe. Bucket =
      // bit length of the degree (floor(log2 d)+1) computed EXACTLY as
      // length(bin(d)) — integer-only, no float log at bucket borders
      // (both engines' bin() emits the minimal binary string). Scale
      // shape: degrees via one union+count agg on 8-byte node ids, then
      // a ~60-row bucket rollup; both aggs map-side combine, and the
      // histogram is what you'd publish in a dataset card at 100 TB.
      // kernel pairs are distinct unordered rep pairs with a != b, so the
      // old least/greatest + distinct + two-branch union (which executed
      // the kernel TWICE and paid an edge-volume Exchange) collapses to
      // one explode of both endpoints per pair — same degree multiset
      TextOps.simhashNearPairs(s, d)
        .select(explode(array(col("rep_a"), col("rep_b"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
        .withColumn("bucket", length(bin(col("deg"))).cast("long"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_nodes"), min(col("deg")).as("min_deg"),
          max(col("deg")).as("max_deg"), sum(col("deg")).as("sum_deg"))
        .orderBy("bucket")
    }),

    "prep_split" -> ((s, d) => {
      // Deterministic train/val/test split by content-free key hash — the
      // way a 100 TB corpus splits WITHOUT a global shuffle, a rand() seed
      // to coordinate across executors, or any state: assignment is a
      // narrow per-row map (md5 of the key), stable under reruns,
      // backfills and repartitioning, and new documents land in the same
      // split forever. Thresholds are lexicographic prefixes of the hex
      // digest ('cc' = 204/256 ~ 79.7%, 'e6' = 230/256 ~ 89.8%) so both
      // engines compare plain ASCII strings — no hex->int conversion in
      // the hot path. The only shuffle is the 3-group audit aggregate.
      t(s, d, "documents")
        .withColumn("h", md5(col("doc_id").cast("string").cast("binary")))
        .withColumn("split",
          when(col("h") < "cc", "train").when(col("h") < "e6", "val").otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          countDistinct(col("source")).as("n_sources"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy("split")
    }),

    "sample_hash" -> ((s, d) => {
      // Deterministic uniform k-sample: order by md5(key) and take the
      // first k — reproducible across runs/engines (unlike rand(seed),
      // whose stream depends on partitioning), and it plans as
      // TakeOrderedAndProject: per-partition top-k heaps, no global sort,
      // no sample-fraction guess-and-retry. The hash order IS the uniform
      // order; event_id tiebreak makes the sample total and exact.
      t(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          md5(col("event_id").cast("string").cast("binary")).as("h"))
        .orderBy(col("h"), col("event_id"))
        .limit(100)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .orderBy("event_id")
    }),

    "subquery_not_in" -> ((s, d) => {
      // NOT IN with a subquery — the null-aware anti join. Parquet keys
      // are nullable as far as Catalyst can prove, so Spark must plan a
      // null-aware BroadcastHashJoin (one NULL in the subquery would empty
      // the result; a plain anti join can't express that). At scale the
      // null-aware form REQUIRES a broadcastable right side — when the
      // subquery is big, rewrite to NOT EXISTS (plain anti, shuffleable)
      // after establishing non-nullness; AnalyticsOpsSpec pins that both
      // forms agree here.
      t(s, d, "customer").createOrReplaceTempView("naaj_customer")
      t(s, d, "orders").createOrReplaceTempView("naaj_orders")
      s.sql(
        """SELECT c_mktsegment, count(*) AS n_cust, min(c_custkey) AS min_key
          |FROM naaj_customer
          |WHERE c_custkey NOT IN (SELECT o_custkey FROM naaj_orders WHERE o_orderstatus = 'F')
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    }),

    "window_distinct" -> ((s, d) => {
      // Sliding distinct-count: per event, how many DISTINCT event types
      // its user produced in the trailing 7 days — the engagement-breadth
      // signal. Spark has no count(DISTINCT) over a window, so the
      // composition is size(collect_set(...)) over a RANGE frame on epoch
      // seconds; state per frame is bounded by the type vocabulary (5
      // here), not the event count, so executor memory is safe at any
      // frame width. RANGE frames are peer-inclusive in both engines
      // (same-second events share a frame), which is what makes the
      // oracle's count(DISTINCT ...) OVER RANGE agree exactly. Rolled up
      // to a (type, breadth) histogram: small, total, order-stable.
      val cs = unix_timestamp(col("ts"))
      val w = Window.partitionBy(col("user_id")).orderBy(cs)
        .rangeBetween(-604799, Window.currentRow)
      t(s, d, "events")
        .withColumn("nd", size(collect_set(col("event_type")).over(w)).cast("long"))
        .groupBy(col("event_type"), col("nd"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy("event_type", "nd")
    }),

    "window_median" -> ((s, d) => {
      // Trailing discrete median (robust running baseline — the outlier-
      // resistant twin of a moving average) over each customer's last 4
      // orders. Spark has no percentile over a window, so the composition
      // is element_at(array_sort(collect_list), ceil(n/2)) — per-frame
      // state is the 4-row frame, never the partition: the buffer is
      // CONSTANT-bounded (rowsBetween(-3, 0)), not corpus-driven, so this
      // shape survives scale-up unchanged (contrast window_mad/window_ewma,
      // which needed the rank-select / streaming-fold re-shapes because
      // their state grew with a customer's history). The (date, key)
      // window order is TOTAL (dates tie at sf scale); the oracle's
      // quantile_disc(0.5) picks the same lower-middle element (pinned by
      // a probe: n=4 frames agree on the 2nd sorted value).
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-3, Window.currentRow)
      t(s, d, "orders")
        .withColumn("price_c", round(col("o_totalprice") * 100).cast("long"))
        .withColumn("lst", array_sort(collect_list(col("price_c")).over(w)))
        .withColumn("med_c", element_at(col("lst"), expr("(size(lst) + 1) div 2").cast("int")))
        .select(col("o_orderkey"), col("o_custkey"), col("price_c"), col("med_c"))
        .orderBy("o_orderkey")
    }),

    "fn_hof" -> ((s, d) => {
      // Higher-order array functions — transform/filter/exists/zip_with/
      // aggregate, the in-row compute surface a feature pipeline uses on
      // array columns (embeddings, token lists) WITHOUT exploding: all
      // five run inside whole-stage codegen on a bounded in-row sequence,
      // so the plan is a pure scan-project with zero row inflation — the
      // anti-pattern it replaces is explode + groupBy, which shuffles the
      // array's full volume to recompute what a lambda folds in place.
      t(s, d, "part")
        .withColumn("seq", expr("sequence(1L, 1L + pmod(p_partkey, 7))"))
        .select(col("p_partkey"),
          expr("aggregate(transform(seq, x -> x * x), 0L, (a, x) -> a + x)").as("sq_sum"),
          expr("size(filter(seq, x -> x % 2 = 0))").cast("long").as("n_even"),
          expr("exists(seq, x -> x % 5 = 0)").as("has_div5"),
          expr("aggregate(zip_with(seq, reverse(seq), (x, y) -> x * y), 0L, (a, x) -> a + x)")
            .as("zip_sum"))
        .orderBy("p_partkey")
    }),

    "window_ewma" -> ((s, d) => {
      // Exponentially weighted moving average of each customer's order
      // values — the recency-weighted spend signal. EWMA is inherently
      // recursive (no window frame or rank-select expresses it: each
      // output depends on the PREVIOUS output), which is the one genuine
      // per-partition-imperative case — so the shape is repartition on
      // the group key + sortWithinPartitions (Spark's EXTERNAL sort —
      // spills, never heap-bound) + a streaming fold whose state is three
      // scalars (key, count, accumulator) regardless of group size. This
      // replaces the collect_list hash-agg whose per-group array was the
      // last corpus-driven agg buffer in the surface. alpha = 0.3 as the
      // exact integer recurrence (7a + 3x) div 10, seeded with the first
      // element — truncation agrees with DuckDB's // on the positive
      // domain, and the (date, orderkey) sort is total so the fold order
      // is engine- and retry-deterministic.
      import s.implicits._
      t(s, d, "orders")
        .select(col("o_custkey").cast("long").as("ck"),
          datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("dd"),
          col("o_orderkey").cast("long").as("ok"),
          round(col("o_totalprice") * 100).cast("long").as("pc"))
        .repartition(col("ck"))
        .sortWithinPartitions(col("ck"), col("dd"), col("ok"))
        .as[(Long, Long, Long, Long)]
        .mapPartitions { it =>
          // groups are contiguous after the sort; emit on key change
          var key = 0L; var n = 0L; var acc = 0L; var open = false
          (it.map(Option(_)) ++ Iterator(None)).flatMap {
            case Some((ck, _, _, pc)) =>
              if (open && ck == key) {
                n += 1; acc = (7 * acc + 3 * pc) / 10; Iterator.empty
              } else {
                val prev = if (open) Iterator.single((key, n, acc)) else Iterator.empty
                key = ck; n = 1L; acc = pc; open = true
                prev
              }
            case None =>
              if (open) Iterator.single((key, n, acc)) else Iterator.empty
          }
        }
        .toDF("o_custkey", "n_orders", "ewma_c")
        .orderBy("o_custkey")
    }),

    "events_sliding" -> ((s, d) => {
      // Hopping (overlapping) windows: 6-hour windows sliding every 3
      // hours — each event lands in exactly width/hop = 2 windows. Spark's
      // window() generates both assignments IN-ROW (a 2-row Expand, no
      // join against a window table) and the aggregate map-side-combines
      // per (window, group), so the shuffle carries ~2x group cardinality,
      // not 2x events. Epoch-aligned starts (1970-01-01 UTC) are emitted
      // as epoch SECONDS — the cross-engine-stable form (stream_tumbling
      // house rule). Revenue in exact cents.
      t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(window(col("ts"), "6 hours", "3 hours"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("cents"))
        .select(unix_timestamp(col("window.start")).as("w_start_s"),
          unix_timestamp(col("window.end")).as("w_end_s"),
          col("n"), col("cents"))
        .orderBy("w_start_s")
    }),

    "graph_clustering_coeff" -> ((s, d) => {
      // Per-node LOCAL clustering coefficient over the near-dup pair
      // graph — the node-level refinement of graph_triangles' global
      // census: lcc(v) = 2·t(v)/(d(v)·(d(v)−1)) in exact permille names
      // WHICH nodes sit inside cliquey template families (lcc→1000) vs
      // on chain/bridge positions (lcc→0) — the triage graph_communities
      // acts on. Triangle discovery reuses the degree-ordered orientation
      // (each triangle found exactly once at its lowest-degree corner,
      // per-node wedge work bounded by out-degree — the hub-skew bound);
      // the corner explode then credits all three nodes. Exact integers
      // throughout: (t·2000) div (d·(d−1)).
      // Persists follow the triangleStats contract (harness sweeps).
      // kernel pairs are distinct unordered rep pairs with a != b: the old
      // .distinct() was a no-op Exchange (dropped), and degree instances
      // come from ONE explode pass over the persisted canonical edges
      val e0 = TextOps.simhashNearPairs(s, d)
        .select(least(col("rep_a"), col("rep_b")).as("u"),
          greatest(col("rep_a"), col("rep_b")).as("v"))
        .persist()
      val deg = e0.select(explode(array(col("u"), col("v"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("degree"))
        .persist()
      val ed = e0
        .join(deg.select(col("node").as("u"), col("degree").as("du")), "u")
        .join(deg.select(col("node").as("v"), col("degree").as("dv")), "v")
        .withColumn("ku", struct(col("du").as("kd"), col("u").as("kn")))
        .withColumn("kv", struct(col("dv").as("kd"), col("v").as("kn")))
      val out = ed.select(
          when(col("ku") < col("kv"), col("u")).otherwise(col("v")).as("src"),
          when(col("ku") < col("kv"), col("kv")).otherwise(col("ku")).as("kdst"))
        .withColumn("dst", col("kdst").getField("kn"))
        .persist()
      val triNodes = out.as("p").join(out.as("q"),
          col("p.src") === col("q.src") && col("p.kdst") < col("q.kdst"))
        .select(col("p.src").as("w0"), col("p.dst").as("wu"), col("q.dst").as("wv"))
        .join(out.select(col("src").as("wu"), col("dst").as("wv")), Seq("wu", "wv"))
        .select(explode(array(col("w0"), col("wu"), col("wv"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("triangles"))
      deg.join(triNodes, Seq("node"), "left")
        .select(col("node").as("doc_id"), col("degree"),
          coalesce(col("triangles"), lit(0L)).as("triangles"))
        .withColumn("lcc_permille",
          when(col("degree") >= 2,
            expr("(triangles * 2000) div (degree * (degree - 1))"))
            .otherwise(lit(0L)))
        .orderBy("doc_id")
    }),

    "graph_reciprocity" -> ((s, d) => {
      // Reciprocity of the DIRECTED behavior graph (event_type → next
      // event_type per user sequence, self-loops excluded): the share of
      // edges whose reverse also exists — near 10000 bp the "graph" is
      // really an undirected co-occurrence (direction carries no signal);
      // near 0 it is a genuine flow (funnels have direction). The
      // companion diagnostic to events_transitions' top edges.
      // Exact: edge counts are BIGINT, readout is ONE integer division
      // to basis points. Scale shape: the lead window shuffles once on
      // user_id; the distinct edge set rides type-pair cardinality; the
      // reverse check is a self-join on the (src,dst) key.
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val edges = t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull && col("next_type") =!= col("event_type"))
        .select(col("event_type").as("src"), col("next_type").as("dst"))
        .distinct()
      val rev = edges.select(col("dst").as("src"), col("src").as("dst"))
        .withColumn("has_rev", lit(1L))
      edges.join(rev, Seq("src", "dst"), "left")
        .agg(count(lit(1)).as("n_edges"),
          sum(coalesce(col("has_rev"), lit(0L))).as("n_reciprocal"))
        .select(col("n_edges"), col("n_reciprocal"),
          expr("(n_reciprocal * 10000) div n_edges").as("reciprocity_bp"))
    })
  )

  /** 3-round synchronous LPA as chained CTEs (expects `pairs` in scope,
    * ends in `lab3(node, label)`) — shared by the graph_communities and
    * graph_modularity oracles; the row_number tie-break mirrors the
    * struct-max argmax.
    */
  private val lpaCte: String =
    s""",
       |edges AS (
       |  SELECT rep_a AS src, rep_b AS dst FROM pairs
       |  UNION SELECT rep_b, rep_a FROM pairs),
       |lab0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
       |f1 AS (SELECT e.dst AS node, l.label, count(*)::BIGINT AS c
       |       FROM lab0 l JOIN edges e ON l.node = e.src GROUP BY e.dst, l.label),
       |lab1 AS (SELECT node, label FROM (
       |  SELECT node, label,
       |         row_number() OVER (PARTITION BY node ORDER BY c DESC, label ASC) AS rn
       |  FROM f1) WHERE rn = 1),
       |f2 AS (SELECT e.dst AS node, l.label, count(*)::BIGINT AS c
       |       FROM lab1 l JOIN edges e ON l.node = e.src GROUP BY e.dst, l.label),
       |lab2 AS (SELECT node, label FROM (
       |  SELECT node, label,
       |         row_number() OVER (PARTITION BY node ORDER BY c DESC, label ASC) AS rn
       |  FROM f2) WHERE rn = 1),
       |f3 AS (SELECT e.dst AS node, l.label, count(*)::BIGINT AS c
       |       FROM lab2 l JOIN edges e ON l.node = e.src GROUP BY e.dst, l.label),
       |lab3 AS (SELECT node, label FROM (
       |  SELECT node, label,
       |         row_number() OVER (PARTITION BY node ORDER BY c DESC, label ASC) AS rn
       |  FROM f3) WHERE rn = 1)""".stripMargin

  val oracles: Map[String, String] = Map(

    "graph_triangles" ->
      (pairCte +
        s""",
           |e AS (
           |  SELECT DISTINCT least(rep_a, rep_b) AS u, greatest(rep_a, rep_b) AS v FROM pairs),
           |degt AS (
           |  SELECT node, count(*)::BIGINT AS deg FROM (
           |    SELECT u AS node FROM e UNION ALL SELECT v FROM e) GROUP BY node),
           |tri AS (
           |  SELECT count(*)::BIGINT AS n_triangles
           |  FROM e e1 JOIN e e2 ON e2.u = e1.v JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
           |base AS (
           |  SELECT count(*)::BIGINT AS n_nodes, (sum(deg) // 2)::BIGINT AS n_edges,
           |         (sum(deg * (deg - 1)) // 2)::BIGINT AS n_wedges
           |  FROM degt)
           |SELECT n_nodes, n_edges, n_wedges, n_triangles,
           |       (n_triangles * 3000 // n_wedges)::BIGINT AS cc_permille
           |FROM base, tri""".stripMargin),

    // integer fixed-point twin: scale//n seed, floor-div contributions,
    // (15*p0)//100 + (85*S)//100 per round — every op truncating on
    // nonnegative values, so both engines agree bit-for-bit
    "graph_pagerank" ->
      (pairCte +
        s""",
           |edges AS (
           |  SELECT rep_a AS src, rep_b AS dst FROM pairs
           |  UNION SELECT rep_b, rep_a FROM pairs),
           |nodes AS (SELECT src AS node, count(*)::BIGINT AS outd FROM edges GROUP BY src),
           |c AS (SELECT (1000000000000 // count(*))::BIGINT AS p0 FROM nodes),
           |pr0 AS (SELECT node, outd, p0 AS pr FROM nodes, c),
           |s1 AS (SELECT e.dst AS node, sum(p.pr // p.outd)::BIGINT AS s
           |       FROM pr0 p JOIN edges e ON p.node = e.src GROUP BY e.dst),
           |pr1 AS (SELECT nd.node, nd.outd,
           |          ((15 * c.p0) // 100 + (85 * coalesce(s1.s, 0)) // 100)::BIGINT AS pr
           |        FROM nodes nd LEFT JOIN s1 ON nd.node = s1.node, c),
           |s2 AS (SELECT e.dst AS node, sum(p.pr // p.outd)::BIGINT AS s
           |       FROM pr1 p JOIN edges e ON p.node = e.src GROUP BY e.dst),
           |pr2 AS (SELECT nd.node, nd.outd,
           |          ((15 * c.p0) // 100 + (85 * coalesce(s2.s, 0)) // 100)::BIGINT AS pr
           |        FROM nodes nd LEFT JOIN s2 ON nd.node = s2.node, c),
           |s3 AS (SELECT e.dst AS node, sum(p.pr // p.outd)::BIGINT AS s
           |       FROM pr2 p JOIN edges e ON p.node = e.src GROUP BY e.dst),
           |pr3 AS (SELECT nd.node, nd.outd,
           |          ((15 * c.p0) // 100 + (85 * coalesce(s3.s, 0)) // 100)::BIGINT AS pr
           |        FROM nodes nd LEFT JOIN s3 ON nd.node = s3.node, c)
           |SELECT node AS doc_id, outd AS degree, pr AS pr_scaled
           |FROM pr3 ORDER BY doc_id""".stripMargin),

    // fixed-round integer peel twin of GraphOps.kcore: survivors lose
    // their sub-2-degree fringe three times; every round is a degree
    // agg + alive-set membership — the same joins the Spark plan runs
    "graph_kcore_peel" ->
      (pairCte +
        s""",
           |edges AS (
           |  SELECT rep_a AS src, rep_b AS dst FROM pairs
           |  UNION SELECT rep_b, rep_a FROM pairs),
           |d0 AS (SELECT src AS node, count(*)::BIGINT AS deg FROM edges GROUP BY src),
           |a1 AS (SELECT node, deg FROM d0 WHERE deg >= 2),
           |e1 AS (SELECT e.src, e.dst FROM edges e
           |       WHERE e.src IN (SELECT node FROM a1) AND e.dst IN (SELECT node FROM a1)),
           |d1 AS (SELECT src AS node, count(*)::BIGINT AS deg FROM e1 GROUP BY src),
           |a2 AS (SELECT a1.node, coalesce(d1.deg, 0)::BIGINT AS deg
           |       FROM a1 LEFT JOIN d1 USING (node) WHERE coalesce(d1.deg, 0) >= 2),
           |e2 AS (SELECT e.src, e.dst FROM edges e
           |       WHERE e.src IN (SELECT node FROM a2) AND e.dst IN (SELECT node FROM a2)),
           |d2 AS (SELECT src AS node, count(*)::BIGINT AS deg FROM e2 GROUP BY src),
           |a3 AS (SELECT a2.node, coalesce(d2.deg, 0)::BIGINT AS deg
           |       FROM a2 LEFT JOIN d2 USING (node) WHERE coalesce(d2.deg, 0) >= 2)
           |SELECT d0.node AS doc_id, d0.deg AS degree0,
           |  (CASE WHEN a1.node IS NULL THEN 1 WHEN a2.node IS NULL THEN 2
           |        WHEN a3.node IS NULL THEN 3 ELSE 0 END)::BIGINT AS peel_round,
           |  coalesce(a3.deg, 0)::BIGINT AS deg_final
           |FROM d0 LEFT JOIN a1 ON d0.node = a1.node
           |        LEFT JOIN a2 ON d0.node = a2.node
           |        LEFT JOIN a3 ON d0.node = a3.node
           |ORDER BY doc_id""".stripMargin),

    // one Borůvka round: every node picks its minimum incident edge under
    // the (w, a, b) total order (row_number twin of the min-struct argmax);
    // the selected edge set with picker counts is the round's exact readout
    "graph_mst_round" ->
      (pairWCte +
        s""",
           |e AS (SELECT a, b, min(w)::BIGINT AS w FROM pairsw GROUP BY a, b),
           |cand AS (
           |  SELECT a AS node, w, a, b FROM e
           |  UNION ALL SELECT b AS node, w, a, b FROM e),
           |sel AS (
           |  SELECT node, w, a, b FROM (
           |    SELECT node, w, a, b,
           |           row_number() OVER (PARTITION BY node ORDER BY w, a, b) AS rn
           |    FROM cand) WHERE rn = 1)
           |SELECT a AS edge_a, b AS edge_b, w, count(*)::BIGINT AS n_pickers
           |FROM sel GROUP BY a, b, w ORDER BY edge_a, edge_b""".stripMargin),

    "graph_hits" ->
      (pairCte +
        s""",
           |e AS (SELECT DISTINCT rep_a AS src, rep_b AS dst FROM pairs),
           |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
           |a1 AS (SELECT dst, count(*)::BIGINT AS a1 FROM e GROUP BY dst),
           |h1 AS (SELECT e.src, sum(a1.a1)::BIGINT AS h1
           |       FROM e JOIN a1 ON e.dst = a1.dst GROUP BY e.src),
           |a2 AS (SELECT e.dst, sum(h1.h1)::BIGINT AS a2
           |       FROM e JOIN h1 ON e.src = h1.src GROUP BY e.dst)
           |SELECT n.node AS doc_id,
           |       coalesce(a1.a1, 0)::BIGINT AS auth1,
           |       coalesce(h1.h1, 0)::BIGINT AS hub1,
           |       coalesce(a2.a2, 0)::BIGINT AS auth2
           |FROM nodes n
           |LEFT JOIN a1 ON n.node = a1.dst
           |LEFT JOIN h1 ON n.node = h1.src
           |LEFT JOIN a2 ON n.node = a2.dst
           |ORDER BY doc_id""".stripMargin),

    "graph_communities" ->
      (pairCte + lpaCte +
        s"""
           |SELECT node AS doc_id, label AS community
           |FROM lab3 ORDER BY doc_id""".stripMargin),

    "graph_modularity" ->
      (pairCte + lpaCte +
        s""",
           |e1 AS (
           |  SELECT least(rep_a, rep_b) AS u, greatest(rep_a, rep_b) AS v
           |  FROM pairs GROUP BY 1, 2),
           |mm AS (SELECT count(*)::BIGINT AS mm FROM e1),
           |ein AS (
           |  SELECT l1.label AS comm, count(*)::BIGINT AS e_in
           |  FROM e1 JOIN lab3 l1 ON e1.u = l1.node JOIN lab3 l2 ON e1.v = l2.node
           |  WHERE l1.label = l2.label GROUP BY 1),
           |degm AS (SELECT src AS node, count(*)::BIGINT AS dg FROM edges GROUP BY src),
           |ds AS (
           |  SELECT l.label AS comm, sum(dg)::BIGINT AS d_sum
           |  FROM degm JOIN lab3 l ON degm.node = l.node GROUP BY 1),
           |per AS (
           |  SELECT ds.comm, coalesce(ein.e_in, 0)::BIGINT AS e_in, ds.d_sum
           |  FROM ds LEFT JOIN ein ON ds.comm = ein.comm)
           |SELECT count(*)::BIGINT AS n_communities, min(mm.mm)::BIGINT AS n_edges,
           |       sum(4 * mm.mm * e_in - d_sum * d_sum)::BIGINT AS q_num_sum,
           |       sum(4 * mm.mm * e_in - d_sum * d_sum)::DOUBLE
           |         / (4 * min(mm.mm) * min(mm.mm))::DOUBLE AS modularity
           |FROM per, mm""".stripMargin),

    "graph_assortativity" ->
      (pairCte +
        s""",
           |e AS (
           |  SELECT DISTINCT least(rep_a, rep_b) AS u, greatest(rep_a, rep_b) AS v
           |  FROM pairs WHERE rep_a <> rep_b),
           |degt AS (
           |  SELECT node, count(*)::BIGINT AS deg FROM (
           |    SELECT u AS node FROM e UNION ALL SELECT v FROM e) GROUP BY node),
           |ed AS (
           |  SELECT du.deg AS du, dv.deg AS dv
           |  FROM e JOIN degt du ON du.node = e.u JOIN degt dv ON dv.node = e.v),
           |xy AS (
           |  SELECT du AS x, dv AS y FROM ed
           |  UNION ALL SELECT dv AS x, du AS y FROM ed),
           |m AS (
           |  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
           |         sum(x*x)::BIGINT AS sxx, sum(y*y)::BIGINT AS syy,
           |         sum(x*y)::BIGINT AS sxy
           |  FROM xy)
           |SELECT (n // 2)::BIGINT AS n_edges,
           |  CASE WHEN n*sxx - sx*sx > 0
           |       THEN (n*sxy - sx*sy)::DOUBLE /
           |            (sqrt((n*sxx - sx*sx)::DOUBLE) * sqrt((n*syy - sy*sy)::DOUBLE))
           |  END AS assortativity
           |FROM m""".stripMargin),

    "graph_degree_dist" ->
      (pairCte +
        s""",
           |e AS (
           |  SELECT DISTINCT least(rep_a, rep_b) AS u, greatest(rep_a, rep_b) AS v
           |  FROM pairs WHERE rep_a <> rep_b),
           |degt AS (
           |  SELECT node, count(*)::BIGINT AS deg FROM (
           |    SELECT u AS node FROM e UNION ALL SELECT v FROM e) GROUP BY node)
           |SELECT length(bin(deg))::BIGINT AS bucket, count(*)::BIGINT AS n_nodes,
           |       min(deg)::BIGINT AS min_deg, max(deg)::BIGINT AS max_deg,
           |       sum(deg)::BIGINT AS sum_deg
           |FROM degt GROUP BY bucket ORDER BY bucket""".stripMargin),

    "prep_split" ->
      """SELECT CASE WHEN md5(doc_id::VARCHAR) < 'cc' THEN 'train'
        |            WHEN md5(doc_id::VARCHAR) < 'e6' THEN 'val'
        |            ELSE 'test' END AS split,
        |  count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS sum_chars,
        |  count(DISTINCT source)::BIGINT AS n_sources,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents GROUP BY split ORDER BY split""".stripMargin,

    "sample_hash" ->
      """SELECT event_id, user_id, event_type FROM (
        |  SELECT event_id, user_id, event_type
        |  FROM events ORDER BY md5(event_id::VARCHAR), event_id LIMIT 100)
        |ORDER BY event_id""".stripMargin,

    "subquery_not_in" ->
      """SELECT c_mktsegment, count(*)::BIGINT AS n_cust, min(c_custkey) AS min_key
        |FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "window_distinct" ->
      """WITH pe AS (
        |  SELECT event_type, floor(epoch(ts))::BIGINT AS cs, user_id FROM events),
        |nd AS (
        |  SELECT event_type,
        |    count(DISTINCT event_type) OVER (
        |      PARTITION BY user_id ORDER BY cs
        |      RANGE BETWEEN 604799 PRECEDING AND CURRENT ROW)::BIGINT AS nd
        |  FROM pe)
        |SELECT event_type, nd, count(*)::BIGINT AS n_events
        |FROM nd GROUP BY event_type, nd ORDER BY event_type, nd""".stripMargin,

    "window_median" ->
      """SELECT o_orderkey, o_custkey,
        |  round(o_totalprice * 100)::BIGINT AS price_c,
        |  quantile_disc(round(o_totalprice * 100)::BIGINT, 0.5) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS med_c
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_hof" ->
      """SELECT p_partkey,
        |  list_aggregate(list_transform(generate_series(1, 1 + p_partkey % 7), x -> x * x),
        |    'sum')::BIGINT AS sq_sum,
        |  len(list_filter(generate_series(1, 1 + p_partkey % 7), x -> x % 2 = 0))::BIGINT AS n_even,
        |  len(list_filter(generate_series(1, 1 + p_partkey % 7), x -> x % 5 = 0)) > 0 AS has_div5,
        |  list_aggregate(list_transform(
        |    list_zip(generate_series(1, 1 + p_partkey % 7),
        |             list_reverse(generate_series(1, 1 + p_partkey % 7))),
        |    p -> p[1] * p[2]), 'sum')::BIGINT AS zip_sum
        |FROM part ORDER BY p_partkey""".stripMargin,

    "window_ewma" ->
      """WITH g AS (
        |  SELECT o_custkey,
        |    list(round(o_totalprice * 100)::BIGINT ORDER BY o_orderdate, o_orderkey) AS cs
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_custkey, len(cs)::BIGINT AS n_orders,
        |  list_reduce(cs, (a, x) -> (7 * a + 3 * x) // 10)::BIGINT AS ewma_c
        |FROM g ORDER BY o_custkey""".stripMargin,

    "events_sliding" ->
      """WITH p AS (
        |  SELECT (floor(epoch(ts))::BIGINT // 10800) * 10800 AS b,
        |         round(value * 100)::BIGINT AS c
        |  FROM events WHERE event_type = 'purchase'),
        |w AS (SELECT unnest([b, b - 10800]) AS w_start_s, c FROM p)
        |SELECT w_start_s, w_start_s + 21600 AS w_end_s,
        |       count(*)::BIGINT AS n, sum(c)::BIGINT AS cents
        |FROM w GROUP BY w_start_s ORDER BY w_start_s""".stripMargin,

    "graph_clustering_coeff" ->
      (pairCte +
        s""",
           |e AS (
           |  SELECT least(rep_a, rep_b) AS u, greatest(rep_a, rep_b) AS v
           |  FROM pairs WHERE rep_a <> rep_b GROUP BY 1, 2),
           |deg AS (
           |  SELECT node, count(*)::BIGINT AS degree FROM (
           |    SELECT u AS node FROM e UNION ALL SELECT v FROM e)
           |  GROUP BY node),
           |tri AS (
           |  SELECT node, count(*)::BIGINT AS triangles FROM (
           |    SELECT unnest([e1.u, e1.v, e2.v]) AS node
           |    FROM e e1
           |    JOIN e e2 ON e1.v = e2.u
           |    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
           |  GROUP BY node)
           |SELECT deg.node AS doc_id, degree,
           |       coalesce(triangles, 0)::BIGINT AS triangles,
           |       (CASE WHEN degree >= 2
           |             THEN (coalesce(triangles, 0) * 2000) // (degree * (degree - 1))
           |             ELSE 0 END)::BIGINT AS lcc_permille
           |FROM deg LEFT JOIN tri ON deg.node = tri.node
           |ORDER BY doc_id""".stripMargin),

    "graph_reciprocity" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |         LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS next_type
        |  FROM events),
        |e AS (
        |  SELECT DISTINCT event_type AS src, next_type AS dst FROM seq
        |  WHERE next_type IS NOT NULL AND next_type <> event_type),
        |r AS (SELECT dst AS src, src AS dst, 1 AS has_rev FROM e)
        |SELECT count(*)::BIGINT AS n_edges,
        |       sum(coalesce(has_rev, 0))::BIGINT AS n_reciprocal,
        |       ((sum(coalesce(has_rev, 0)) * 10000) // count(*))::BIGINT AS reciprocity_bp
        |FROM e LEFT JOIN r ON e.src = r.src AND e.dst = r.dst""".stripMargin
  )
}
