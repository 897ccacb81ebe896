package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables._

/** Distribution-drift and dependence statistics for training-data QA.
  *
  * A 100 TB ingestion pipeline re-trains on data whose distribution moves
  * under it; the standard gate between "new snapshot" and "train on it" is
  * a battery of drift tests (reference window vs current window) plus
  * dependence checks between columns that are supposed to be independent.
  * Reference scope: Abishek257/ETL_Data_Ingestion main.py:268-414 validates
  * each batch structurally (schema/row checks) before load; these operators
  * are the statistical extension of that gate.
  *
  * Engine discipline (the agg_corr rule): every statistic is computed from
  * BIGINT counts/moments with at most a handful of IEEE float ops applied
  * in the same order on identical integers in both engines — no
  * transcendentals (ln/exp diverge across libm builds), so classic
  * PSI/entropy forms are deliberately replaced by their integer-exact
  * cousins (total-variation distance, chi-squared, KS-D).
  *
  * Scale shape shared by all five: ONE map-side-combinable hash aggregate
  * collapses event/lineitem volume to a value-histogram or per-key moment
  * frame that rides CARDINALITY (≤ a few hundred rows), and all cumulative
  * /total passes run on that collapsed frame. Nothing here re-shuffles the
  * raw fact table twice.
  */
object StatsOps extends Pack {

  val queries: Map[String, Q] = Map(

    "agg_chi2" -> ((s, d) => {
      // Pearson chi-squared test of independence: o_orderpriority x
      // o_orderstatus contingency table with per-cell contributions.
      // Per cell: observed O, expected E = rowTot*colTot/N. The statistic
      // is emitted per cell in exact micro-units: num = (O*N - rt*ct) is
      // an EXACT double (|num| << 2^53), term_micro =
      // floor(num*num*1e6 / (rt*ct*N)) — two IEEE multiplies + one IEEE
      // divide + floor on identical integers, bit-equal cross-engine.
      // A drifted/broken feed shows up as a fat term on one cell.
      // Exactness bound (the graph_modularity convention): |O·N − rt·ct|
      // ≤ N² must stay under 2⁵³ for the double to be exact, so the
      // bit-equal contract holds for N ≤ 9·10⁷ orders; rt·ct·1000 ≤
      // N²·10³ stays in Long to N ≤ 3·10⁹. Past 9·10⁷ rows, run the test
      // per calendar shard (chi² is additive over disjoint partitions of
      // the population) or assemble from the factored exact terms
      // (observed, rt, ct, n are all emitted or derivable per cell).
      // Scale: one map-side-combinable count to the <=25-cell frame; row/
      // col/grand totals are windows over that tiny frame (cardinality-
      // bound, never data-bearing at scale).
      val cells = t(s, d, "orders")
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("observed"))
      val wr = Window.partitionBy(col("o_orderpriority"))
      val wc = Window.partitionBy(col("o_orderstatus"))
      val wg = Window.partitionBy(lit(1))
      cells
        .withColumn("rt", sum(col("observed")).over(wr))
        .withColumn("ct", sum(col("observed")).over(wc))
        .withColumn("n", sum(col("observed")).over(wg))
        .select(col("o_orderpriority"), col("o_orderstatus"), col("observed"),
          expr("(rt * ct * 1000) div n").as("expected_milli"),
          expr("cast(floor(cast(observed * n - rt * ct as double)" +
            " * cast(observed * n - rt * ct as double) * 1e6" +
            " / cast(rt * ct * n as double)) as bigint)").as("term_micro"))
        .orderBy("o_orderpriority", "o_orderstatus")
    }),

    "agg_ks_test" -> ((s, d) => {
      // Two-sample Kolmogorov-Smirnov D between the l_quantity
      // distributions of two cohorts (orderkey parity stands in for the
      // reference/current snapshot split). D = max_v |F1(v) - F2(v)| is
      // computed EXACTLY in integers: per quantity value the cumulative
      // counts c1, c2 give |c1*n2 - c2*n1| as BIGINT; the max is exact
      // and only the final D = d_num / (n1*n2) is one IEEE division.
      // Scale: one map-side-combinable count to the <=50-row value
      // histogram; the cumulative window and totals ride that frame.
      val hist = t(s, d, "lineitem")
        .select(round(col("l_quantity")).cast("long").as("v"),
          (col("l_orderkey") % 2).as("cohort"))
        .groupBy(col("v"))
        .agg(sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("c1"),
          sum(when(col("cohort") === 1, 1L).otherwise(0L)).as("c2"))
      val wcum = Window.partitionBy(lit(1)).orderBy(col("v"))
      val wg = Window.partitionBy(lit(1))
      hist
        .withColumn("cum1", sum(col("c1")).over(wcum))
        .withColumn("cum2", sum(col("c2")).over(wcum))
        .withColumn("n1", sum(col("c1")).over(wg))
        .withColumn("n2", sum(col("c2")).over(wg))
        .select(col("n1"), col("n2"),
          abs(col("cum1") * col("n2") - col("cum2") * col("n1")).as("dn"))
        .groupBy(col("n1"), col("n2"))
        .agg(max(col("dn")).as("d_num"))
        .select(col("n1"), col("n2"), col("d_num"),
          (col("d_num").cast("double") /
            (col("n1") * col("n2")).cast("double")).as("ks_d"))
    }),

    "agg_drift_tvd" -> ((s, d) => {
      // Total-variation distance between the same two cohort
      // distributions — the integer-exact stand-in for PSI (whose ln()
      // is not bit-stable cross-engine): TVD = Σ_v |p(v)-q(v)| / 2
      // = Σ|c1*n2 - c2*n1| / (2*n1*n2), numerator exact BIGINT, one
      // IEEE division at the end. Emitted per value too (top-5 diverging
      // buckets) so the drift is attributable, not just detectable.
      val hist = t(s, d, "lineitem")
        .select(round(col("l_quantity")).cast("long").as("v"),
          (col("l_orderkey") % 2).as("cohort"))
        .groupBy(col("v"))
        .agg(sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("c1"),
          sum(when(col("cohort") === 1, 1L).otherwise(0L)).as("c2"))
      val wg = Window.partitionBy(lit(1))
      hist
        .withColumn("n1", sum(col("c1")).over(wg))
        .withColumn("n2", sum(col("c2")).over(wg))
        .withColumn("contrib", abs(col("c1") * col("n2") - col("c2") * col("n1")))
        .groupBy(col("n1"), col("n2"))
        .agg(sum(col("contrib")).as("tvd_num"),
          max(col("contrib")).as("max_bucket_num"))
        .select(col("n1"), col("n2"), col("tvd_num"),
          (col("tvd_num").cast("double") /
            (lit(2L) * col("n1") * col("n2")).cast("double")).as("tvd"),
          col("max_bucket_num"))
    }),

    "agg_spearman" -> ((s, d) => {
      // Spearman rank correlation between per-user event volume and
      // per-user active-day span — "do heavy users stick around?".
      // Min-rank (SQL rank()) tie convention, computed WITHOUT a global
      // data-bearing window: rank(v) = 1 + Σ_{u<v} cnt(u) falls out of a
      // cumulative sum over the value HISTOGRAM (agg_ks_test's trick),
      // joined back on the value — so ranking scales with value
      // cardinality, not user count. Pearson on the integer ranks uses
      // agg_corr's exact-BIGINT moments; the readout is two IEEE sqrts,
      // one multiply, one divide on identical integers.
      val per = t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("x"),
          countDistinct(to_date(col("ts"))).as("y"))
      def ranks(frame: org.apache.spark.sql.DataFrame, c: String) = {
        val w = Window.partitionBy(lit(1)).orderBy(col(c))
        frame.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
          .withColumn("rk",
            sum(col("cnt")).over(w) - col("cnt") + lit(1L))
          .select(col(c), col("rk"))
      }
      val rx = ranks(per, "x").withColumnRenamed("rk", "rx")
      val ry = ranks(per, "y").withColumnRenamed("rk", "ry")
      per.join(rx, "x").join(ry, "y")
        .agg(count(lit(1)).as("n"),
          sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
          sum(col("rx") * col("rx")).as("sxx"),
          sum(col("ry") * col("ry")).as("syy"),
          sum(col("rx") * col("ry")).as("sxy"))
        .select(col("n"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
              sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
            .as("spearman"))
    }),

    "agg_hhi" -> ((s, d) => {
      // Herfindahl-Hirschman concentration of supplier share (quantity-
      // weighted) within each return-flag cohort — "is one upstream
      // source dominating the feed?", the supplier-mix twin of
      // prep_mixture's source-mix accounting. Exact: per-supplier BIGINT
      // quantity sums, Σ share² = Σ s_i² / tot² with both sums BIGINT and
      // ONE IEEE division for the 0-10000 basis-point readout.
      // Scale: two map-side-combinable aggregates (fact → supplier sums →
      // cohort rollup); nothing else.
      val sup = t(s, d, "lineitem")
        .select(col("l_returnflag"),
          col("l_suppkey"), round(col("l_quantity")).cast("long").as("q"))
        .groupBy(col("l_returnflag"), col("l_suppkey"))
        .agg(sum(col("q")).as("sq"))
      sup.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum(col("sq")).as("tot"),
          sum(col("sq") * col("sq")).as("ssq"))
        .select(col("l_returnflag"), col("n_suppliers"),
          ((col("ssq") * lit(10000L)).cast("double") /
            (col("tot") * col("tot")).cast("double")).as("hhi_bp"))
        .orderBy("l_returnflag")
    }),

    "window_skewness" -> ((s, d) => {
      // Rolling 14-day skewness of each type's daily close series — the
      // asymmetry drift monitor next to window_bollinger's dispersion:
      // a stable series reads ~0, a regime with occasional spikes reads
      // hard positive long before the mean moves. Exact-moment form:
      // g1 = √n·m3num / m2num^1.5 with m2num = n·Σx²−(Σx)² and
      // m3num = n²·Σx³−3n·Σx·Σx²+2(Σx)³ both EXACT BIGINT, then two
      // IEEE sqrts + two muls + one div in identical order. Warm-up and
      // zero-variance frames yield NULL (window_rsi rule).
      // Exactness domain, ENFORCED (not just assumed): the largest cubic
      // term is 3n·Σx·Σx² ≤ 3·14·(14x)·(14x²) = 8232·x³, inside Long for
      // |x| ≤ 10⁵ cents (8232·10¹⁵ < 2⁶³−1 ≈ 9.22·10¹⁸). The guard below
      // raise_error's on the collapsed DAILY frame (cardinality-bounded,
      // never the fact table) if the value domain ever outgrows the bound,
      // instead of letting Spark wrap Long while DuckDB's HUGEINT throws —
      // the cross-engine parity break is loud on both sides. Today's
      // events generator keeps cents ≤ 5·10⁴, half the enforced bound.
      // Scale shape: ONE daily map-side-combinable aggregate collapses
      // event volume to the calendar-bounded per-type series; one window
      // pass carries all three moment sums.
      val daily = t(s, d, "events")
        .select(col("event_type"), unix_timestamp(col("ts")).as("es"),
          col("event_id"), round(col("value") * 100).cast("long").as("cents"))
        .withColumn("day", expr("es div 86400"))
        .groupBy(col("event_type"), col("day"))
        .agg(max_by(col("cents"), struct(col("es"), col("event_id"))).as("x0"))
        .withColumn("x", when(abs(col("x0")) <= lit(100000L), col("x0"))
          .otherwise(raise_error(concat(
            lit("window_skewness: |cents|="), abs(col("x0")).cast("string"),
            lit(" exceeds the exact-Long moment domain (1e5)"))).cast("long")))
        .drop("x0")
      val wf = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-13, 0)
      daily
        .withColumn("nf", count(lit(1)).over(wf))
        .withColumn("s1", sum(col("x")).over(wf))
        .withColumn("s2", sum(col("x") * col("x")).over(wf))
        .withColumn("s3", sum(col("x") * col("x") * col("x")).over(wf))
        .withColumn("m2num", expr("nf * s2 - s1 * s1"))
        .withColumn("m3num",
          expr("nf * nf * s3 - 3 * nf * s1 * s2 + 2 * s1 * s1 * s1"))
        .withColumn("skew",
          when(col("nf") === 14 && col("m2num") > 0,
            expr("sqrt(cast(nf as double)) * cast(m3num as double)" +
              " / (cast(m2num as double) * sqrt(cast(m2num as double)))")))
        .select(col("event_type"), col("day"), col("x").as("close"),
          col("m2num"), col("m3num"), col("skew"))
        .orderBy("event_type", "day")
    }),

    "agg_mannwhitney" -> ((s, d) => {
      // Mann–Whitney U between the two cohort value distributions — the
      // NONPARAMETRIC location test completing the drift battery (KS
      // reads shape, TVD mass, U asks "is one cohort systematically
      // larger?"). Doubled-U convention keeps ties integer-exact:
      // 2·U1 = Σ_v c1(v)·(2·cum2(<v) + c2(v)) — EXACT BIGINT from the
      // value histogram; the common-language effect size
      // cles = 2U1/(2·n1·n2) is ONE IEEE division. The tie correction
      // Σ(t³−t) is emitted as a factored BIGINT term (the events_autocorr
      // house rule: z-score assembly stays with the consumer — combining
      // it with n³-scale factors would overflow Long at corpus scale).
      // Scale: same histogram collapse as agg_ks_test.
      val hist = t(s, d, "lineitem")
        .select(round(col("l_quantity")).cast("long").as("v"),
          (col("l_orderkey") % 2).as("cohort"))
        .groupBy(col("v"))
        .agg(sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("c1"),
          sum(when(col("cohort") === 1, 1L).otherwise(0L)).as("c2"))
      val wcum = Window.partitionBy(lit(1)).orderBy(col("v"))
      val wg = Window.partitionBy(lit(1))
      hist
        .withColumn("cum2prev", sum(col("c2")).over(wcum) - col("c2"))
        .withColumn("n1", sum(col("c1")).over(wg))
        .withColumn("n2", sum(col("c2")).over(wg))
        .withColumn("u_term", col("c1") * (lit(2L) * col("cum2prev") + col("c2")))
        .withColumn("t", col("c1") + col("c2"))
        .groupBy(col("n1"), col("n2"))
        .agg(sum(col("u_term")).as("u1_x2"),
          sum(col("t") * col("t") * col("t") - col("t")).as("tie_term"))
        .select(col("n1"), col("n2"), col("u1_x2"), col("tie_term"),
          (col("u1_x2").cast("double") /
            (lit(2L) * col("n1") * col("n2")).cast("double")).as("cles"))
    }),

    "agg_welch_t" -> ((s, d) => {
      // Welch's unequal-variance t statistic between the two cohorts —
      // the parametric member of the drift battery (U/KS/TVD are its
      // nonparametric siblings; Welch is what a metrics dashboard
      // actually quotes). Exact-moment discipline: ONE pass collects
      // both cohorts' BIGINT (n, Σx, Σx²); the variance numerators
      // nᵢΣxᵢ²−(Σxᵢ)² stay exact and ship as factored columns (the
      // events_autocorr rule — the Welch–Satterthwaite df assembly is
      // the consumer's); t itself is a fixed sequence of IEEE ops on
      // identical integers (divisions/sqrt in the same order in both
      // engines — the denominators n²(n−1) are formed in DOUBLE because
      // they overflow Long at corpus scale).
      val m = t(s, d, "lineitem")
        .select(round(col("l_quantity")).cast("long").as("x"),
          (col("l_orderkey") % 2).as("cohort"))
        .agg(
          sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("n1"),
          sum(when(col("cohort") === 0, col("x")).otherwise(0L)).as("s1"),
          sum(when(col("cohort") === 0, col("x") * col("x")).otherwise(0L)).as("ss1"),
          sum(when(col("cohort") === 1, 1L).otherwise(0L)).as("n2"),
          sum(when(col("cohort") === 1, col("x")).otherwise(0L)).as("s2"),
          sum(when(col("cohort") === 1, col("x") * col("x")).otherwise(0L)).as("ss2"))
      m.select(col("n1"), col("n2"),
          (col("n1") * col("ss1") - col("s1") * col("s1")).as("var_num1"),
          (col("n2") * col("ss2") - col("s2") * col("s2")).as("var_num2"),
          expr("(cast(s1 as double) / cast(n1 as double)" +
            " - cast(s2 as double) / cast(n2 as double))" +
            " / sqrt(cast(n1 * ss1 - s1 * s1 as double)" +
            "          / (cast(n1 as double) * cast(n1 as double) * cast(n1 - 1 as double))" +
            "        + cast(n2 * ss2 - s2 * s2 as double)" +
            "          / (cast(n2 as double) * cast(n2 as double) * cast(n2 - 1 as double)))")
            .as("welch_t"))
    }),

    "agg_winsorized_mean" -> ((s, d) => {
      // Winsorized mean of order value (5%/95% caps) — the robust
      // location estimate a revenue monitor alarms on when raw means are
      // whipsawed by outlier orders. Exact: the cap VALUES are the
      // elements at fixed integer ranks (agg_quantile_edges' tie-
      // insensitive k-th-smallest), clamping and the sum stay BIGINT
      // cents, and the mean is ONE IEEE division. Scale: DistributedRank
      // range exchange (fully parallel), a 1-row edge aggregate broadcast
      // back onto the corpus scan (the events_rfm scalar shape), one
      // map-side-combinable final aggregate.
      val v = t(s, d, "orders")
        .select(round(col("o_totalprice") * 100).cast("long").as("c"))
      val rk = DistributedRank.withGlobalRank(v, Seq(col("c")), "rn")
      val kLo = math.max(1L, (rk.n + 1) * 5 / 100)
      val kHi = math.max(1L, (rk.n + 1) * 95 / 100)
      val edges = rk.df.filter(col("rn") === kLo || col("rn") === kHi)
        .agg(max(when(col("rn") === kLo, col("c"))).as("lo_c"),
          max(when(col("rn") === kHi, col("c"))).as("hi_c"))
      rk.df.crossJoin(broadcast(edges))
        .select(col("lo_c"), col("hi_c"),
          greatest(col("lo_c"), least(col("hi_c"), col("c"))).as("w"))
        .groupBy(col("lo_c"), col("hi_c"))
        .agg(count(lit(1)).as("n"), sum(col("w")).as("win_sum"))
        .select(col("n"), col("lo_c"), col("hi_c"), col("win_sum"),
          (col("win_sum").cast("double") / col("n").cast("double")).as("win_mean"))
    }),

    "events_lorenz" -> ((s, d) => {
      // Lorenz concentration curve of user activity: users ranked by
      // event volume, split into min-rank deciles, each decile's exact
      // share and cumulative share of total events in permille — the
      // curve behind agg_gini's scalar ("the top decile is 40% of
      // traffic" is the actionable form of "gini = 0.6"). Tied users
      // share a min-rank and therefore a decile (deterministic; decile
      // sizes may be uneven under heavy ties — documented convention).
      // Scale shape (the agg_spearman trick): ranks come from a
      // cumulative sum over the per-user-count HISTOGRAM, so the only
      // per-user pass is ONE map-side-combinable count; every window
      // rides the value-histogram / 10-row decile frames (allowlisted
      // domain-bounded single partitions).
      val per = t(s, d, "events")
        .groupBy(col("user_id")).agg(count(lit(1)).as("x"))
      val hx = per.groupBy(col("x")).agg(count(lit(1)).as("cnt"))
      val wv = Window.partitionBy(lit(1)).orderBy(col("x"))
      val wg = Window.partitionBy(lit(1))
      val ranked = hx
        .withColumn("rk", sum(col("cnt")).over(wv) - col("cnt") + lit(1L))
        .withColumn("n_users", sum(col("cnt")).over(wg))
        .withColumn("tot_events", sum(col("x") * col("cnt")).over(wg))
        .withColumn("decile", expr("((rk - 1) * 10) div n_users + 1"))
      val wd = Window.partitionBy(lit(1)).orderBy(col("decile"))
      ranked.groupBy(col("decile"))
        .agg(sum(col("cnt")).as("n_users"),
          sum(col("x") * col("cnt")).as("n_events"),
          min(col("tot_events")).as("tot"))
        .withColumn("cum_events", sum(col("n_events")).over(wd))
        .select(col("decile"), col("n_users"), col("n_events"),
          expr("(n_events * 1000) div tot").as("share_permille"),
          expr("(cum_events * 1000) div tot").as("cum_permille"))
        .orderBy("decile")
    })
  )

  val oracles: Map[String, String] = Map(

    "agg_chi2" ->
      """WITH cells AS (
        |  SELECT o_orderpriority, o_orderstatus, count(*)::BIGINT AS observed
        |  FROM orders GROUP BY 1, 2),
        |tot AS (
        |  SELECT o_orderpriority, o_orderstatus, observed,
        |         sum(observed) OVER (PARTITION BY o_orderpriority)::BIGINT AS rt,
        |         sum(observed) OVER (PARTITION BY o_orderstatus)::BIGINT AS ct,
        |         sum(observed) OVER ()::BIGINT AS n
        |  FROM cells)
        |SELECT o_orderpriority, o_orderstatus, observed,
        |       (rt * ct * 1000) // n AS expected_milli,
        |       floor((observed * n - rt * ct)::DOUBLE
        |             * (observed * n - rt * ct)::DOUBLE * 1e6
        |             / (rt * ct * n)::DOUBLE)::BIGINT AS term_micro
        |FROM tot ORDER BY o_orderpriority, o_orderstatus""".stripMargin,

    "agg_ks_test" ->
      """WITH hist AS (
        |  SELECT round(l_quantity)::BIGINT AS v,
        |         sum(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS c1,
        |         sum(CASE WHEN l_orderkey % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS c2
        |  FROM lineitem GROUP BY 1),
        |cum AS (
        |  SELECT sum(c1) OVER (ORDER BY v)::BIGINT AS cum1,
        |         sum(c2) OVER (ORDER BY v)::BIGINT AS cum2,
        |         sum(c1) OVER ()::BIGINT AS n1,
        |         sum(c2) OVER ()::BIGINT AS n2
        |  FROM hist)
        |SELECT n1, n2, max(abs(cum1 * n2 - cum2 * n1))::BIGINT AS d_num,
        |       max(abs(cum1 * n2 - cum2 * n1))::DOUBLE / (n1 * n2)::DOUBLE AS ks_d
        |FROM cum GROUP BY n1, n2""".stripMargin,

    "agg_drift_tvd" ->
      """WITH hist AS (
        |  SELECT round(l_quantity)::BIGINT AS v,
        |         sum(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS c1,
        |         sum(CASE WHEN l_orderkey % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS c2
        |  FROM lineitem GROUP BY 1),
        |c AS (
        |  SELECT abs(c1 * sum(c2) OVER () - c2 * sum(c1) OVER ())::BIGINT AS contrib,
        |         sum(c1) OVER ()::BIGINT AS n1, sum(c2) OVER ()::BIGINT AS n2
        |  FROM hist)
        |SELECT n1, n2, sum(contrib)::BIGINT AS tvd_num,
        |       sum(contrib)::DOUBLE / (2 * n1 * n2)::DOUBLE AS tvd,
        |       max(contrib)::BIGINT AS max_bucket_num
        |FROM c GROUP BY n1, n2""".stripMargin,

    "agg_spearman" ->
      """WITH per AS (
        |  SELECT user_id, count(*)::BIGINT AS x,
        |         count(DISTINCT ts::DATE)::BIGINT AS y
        |  FROM events GROUP BY user_id),
        |hx AS (SELECT x, count(*)::BIGINT AS cnt FROM per GROUP BY x),
        |rx AS (SELECT x, (sum(cnt) OVER (ORDER BY x) - cnt + 1)::BIGINT AS rx FROM hx),
        |hy AS (SELECT y, count(*)::BIGINT AS cnt FROM per GROUP BY y),
        |ry AS (SELECT y, (sum(cnt) OVER (ORDER BY y) - cnt + 1)::BIGINT AS ry FROM hy),
        |m AS (
        |  SELECT count(*)::BIGINT AS n,
        |         sum(rx)::BIGINT AS sx, sum(ry)::BIGINT AS sy,
        |         sum(rx * rx)::BIGINT AS sxx, sum(ry * ry)::BIGINT AS syy,
        |         sum(rx * ry)::BIGINT AS sxy
        |  FROM per JOIN rx USING (x) JOIN ry USING (y))
        |SELECT n,
        |       (n * sxy - sx * sy)::DOUBLE /
        |         (sqrt((n * sxx - sx * sx)::DOUBLE) * sqrt((n * syy - sy * sy)::DOUBLE))
        |         AS spearman
        |FROM m""".stripMargin,

    "agg_hhi" ->
      """WITH sup AS (
        |  SELECT l_returnflag, l_suppkey, sum(round(l_quantity)::BIGINT)::BIGINT AS sq
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, count(*)::BIGINT AS n_suppliers,
        |       (sum(sq * sq) * 10000)::DOUBLE / (sum(sq) * sum(sq))::DOUBLE AS hhi_bp
        |FROM sup GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "window_skewness" ->
      """WITH ev AS (
        |  SELECT event_type, floor(epoch(ts))::BIGINT AS es, event_id,
        |         round(value * 100)::BIGINT AS cents
        |  FROM events),
        |daily AS (
        |  SELECT event_type, (es // 86400)::BIGINT AS day,
        |         last(cents ORDER BY es, event_id) AS x
        |  FROM ev GROUP BY event_type, es // 86400),
        |m AS (
        |  SELECT event_type, day, x,
        |         count(*)    OVER win AS nf,
        |         sum(x)      OVER win AS s1,
        |         sum(x*x)    OVER win AS s2,
        |         sum(x*x*x)  OVER win AS s3
        |  FROM daily
        |  WINDOW win AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
        |n AS (
        |  SELECT event_type, day, x,
        |         (nf * s2 - s1 * s1)::BIGINT AS m2num,
        |         (nf * nf * s3 - 3 * nf * s1 * s2 + 2 * s1 * s1 * s1)::BIGINT AS m3num,
        |         nf
        |  FROM m)
        |SELECT event_type, day, x AS close, m2num, m3num,
        |       CASE WHEN nf = 14 AND m2num > 0
        |            THEN sqrt(nf::DOUBLE) * m3num::DOUBLE
        |                 / (m2num::DOUBLE * sqrt(m2num::DOUBLE)) END AS skew
        |FROM n ORDER BY event_type, day""".stripMargin,

    "agg_mannwhitney" ->
      """WITH hist AS (
        |  SELECT round(l_quantity)::BIGINT AS v,
        |         sum(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS c1,
        |         sum(CASE WHEN l_orderkey % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS c2
        |  FROM lineitem GROUP BY 1),
        |c AS (
        |  SELECT c1, c2, (c1 + c2)::BIGINT AS t,
        |         (sum(c2) OVER (ORDER BY v) - c2)::BIGINT AS cum2prev,
        |         sum(c1) OVER ()::BIGINT AS n1, sum(c2) OVER ()::BIGINT AS n2
        |  FROM hist)
        |SELECT n1, n2,
        |       sum(c1 * (2 * cum2prev + c2))::BIGINT AS u1_x2,
        |       sum(t * t * t - t)::BIGINT AS tie_term,
        |       sum(c1 * (2 * cum2prev + c2))::DOUBLE / (2 * n1 * n2)::DOUBLE AS cles
        |FROM c GROUP BY n1, n2""".stripMargin,

    "agg_welch_t" ->
      """WITH m AS (
        |  SELECT
        |    sum(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n1,
        |    sum(CASE WHEN l_orderkey % 2 = 0 THEN round(l_quantity)::BIGINT ELSE 0 END)::BIGINT AS s1,
        |    sum(CASE WHEN l_orderkey % 2 = 0 THEN round(l_quantity)::BIGINT * round(l_quantity)::BIGINT ELSE 0 END)::BIGINT AS ss1,
        |    sum(CASE WHEN l_orderkey % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n2,
        |    sum(CASE WHEN l_orderkey % 2 = 1 THEN round(l_quantity)::BIGINT ELSE 0 END)::BIGINT AS s2,
        |    sum(CASE WHEN l_orderkey % 2 = 1 THEN round(l_quantity)::BIGINT * round(l_quantity)::BIGINT ELSE 0 END)::BIGINT AS ss2
        |  FROM lineitem)
        |SELECT n1, n2,
        |       (n1 * ss1 - s1 * s1)::BIGINT AS var_num1,
        |       (n2 * ss2 - s2 * s2)::BIGINT AS var_num2,
        |       (s1::DOUBLE / n1::DOUBLE - s2::DOUBLE / n2::DOUBLE)
        |         / sqrt((n1 * ss1 - s1 * s1)::DOUBLE
        |                  / (n1::DOUBLE * n1::DOUBLE * (n1 - 1)::DOUBLE)
        |                + (n2 * ss2 - s2 * s2)::DOUBLE
        |                  / (n2::DOUBLE * n2::DOUBLE * (n2 - 1)::DOUBLE)) AS welch_t
        |FROM m""".stripMargin,

    "agg_winsorized_mean" ->
      """WITH v AS (
        |  SELECT round(o_totalprice * 100)::BIGINT AS c,
        |         row_number() OVER (ORDER BY round(o_totalprice * 100)::BIGINT) AS rn,
        |         count(*) OVER () AS n
        |  FROM orders),
        |e AS (
        |  SELECT max(CASE WHEN rn = greatest(1, (n + 1) * 5 // 100) THEN c END)::BIGINT AS lo_c,
        |         max(CASE WHEN rn = greatest(1, (n + 1) * 95 // 100) THEN c END)::BIGINT AS hi_c
        |  FROM v)
        |SELECT count(*)::BIGINT AS n, lo_c, hi_c,
        |       sum(greatest(lo_c, least(hi_c, c)))::BIGINT AS win_sum,
        |       sum(greatest(lo_c, least(hi_c, c)))::DOUBLE / count(*)::DOUBLE AS win_mean
        |FROM v, e GROUP BY lo_c, hi_c""".stripMargin,

    "events_lorenz" ->
      """WITH per AS (
        |  SELECT user_id, count(*)::BIGINT AS x FROM events GROUP BY user_id),
        |hx AS (SELECT x, count(*)::BIGINT AS cnt FROM per GROUP BY x),
        |r AS (
        |  SELECT x, cnt,
        |         (sum(cnt) OVER (ORDER BY x) - cnt + 1)::BIGINT AS rk,
        |         sum(cnt) OVER ()::BIGINT AS n_users,
        |         sum(x * cnt) OVER ()::BIGINT AS tot_events
        |  FROM hx),
        |dec AS (
        |  SELECT ((rk - 1) * 10) // n_users + 1 AS decile,
        |         sum(cnt)::BIGINT AS n_users, sum(x * cnt)::BIGINT AS n_events,
        |         min(tot_events)::BIGINT AS tot
        |  FROM r GROUP BY 1)
        |SELECT decile::BIGINT AS decile, n_users, n_events,
        |       ((n_events * 1000) // tot)::BIGINT AS share_permille,
        |       ((sum(n_events) OVER (ORDER BY decile) * 1000) // tot)::BIGINT AS cum_permille
        |FROM dec ORDER BY decile""".stripMargin
  )
}
