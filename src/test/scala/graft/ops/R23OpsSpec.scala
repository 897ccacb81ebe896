package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the r23 additions the oracle hash gate can't see (both
  * engines could share the same conceptual mistake): budget selection never
  * overspends and is a prefix of the quality order, the epoch plan's pinned
  * mixture sums to exactly 1000 permille, the synthesized code/mojibake
  * gates separate PERFECTLY by construction, and the fixed-round 2-core
  * peel respects the degeneracy definition round by round.
  *
  * All checks run the REAL SparkEntry.queries lambdas on the sf0.001
  * testdata (smoke scale — the invariants are scale-free).
  */
class R23OpsSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("prep_token_budget: never overspends, never overselects") {
    val rows = run("prep_token_budget").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, total, nSel, sel, util) =
        (r.getAs[Long]("n_docs"), r.getAs[Long]("tokens_total"),
          r.getAs[Long]("n_selected"), r.getAs[Long]("tokens_selected"),
          r.getAs[Long]("util_permille"))
      assert(sel <= 800L, s"budget overspent: $sel")
      assert(nSel <= nDocs && sel <= total)
      assert(util == sel * 1000 / 800 && util <= 1000)
    }
    // a source with any docs selects at least its longest doc when it fits:
    // recompute the head of each source's selection order (n_chars desc,
    // doc_id asc) and require n_selected >= 1 wherever that doc's token
    // count is within the 800-token budget
    import org.apache.spark.sql.functions._
    val firstTok = graft.ops.Tables.t(spark, sf, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"),
        size(filter(split(col("text"), " "), x => x =!= ""))
          .cast("long").as("n_tokens"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
          .orderBy(col("n_chars").desc, col("doc_id").asc)))
      .filter(col("rk") === 1)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("n_tokens"))
      .toMap
    var nonVacuous = 0
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      if (firstTok(src) <= 800L) {
        assert(r.getAs[Long]("n_selected") >= 1L,
          s"source $src: longest doc fits the budget but nothing was selected")
        nonVacuous += 1
      }
    }
    assert(nonVacuous > 0, "fixture regression: no source's longest doc fits")
  }

  test("prep_epoch_plan: pinned mixture sums to 1000 permille, arithmetic identity holds") {
    val rows = run("prep_epoch_plan").collect()
    assert(rows.map(_.getAs[String]("lang")).toSet == Set("en", "de", "es", "fr", "zh"))
    assert(rows.map(_.getAs[Long]("share_permille")).sum == 1000L)
    rows.foreach { r =>
      val (avail, target, em) = (r.getAs[Long]("avail_chars"),
        r.getAs[Long]("target_chars"), r.getAs[Long]("epochs_milli"))
      assert(target == 1000000L * r.getAs[Long]("share_permille") / 1000)
      assert(em == target * 1000 / avail)
      assert(r.getAs[Boolean]("upsampled") == (em > 1000))
    }
  }

  test("text_code_detect: the synthesized gate separates perfectly") {
    val rows = run("text_code_detect").collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val isCode = r.getAs[Boolean]("is_code")
      if (id % 3 == 0) {
        assert(isCode, s"framed doc $id not detected")
        assert(r.getAs[Long]("n_sym") >= 10 && r.getAs[Long]("kw_hits") >= 3)
      } else {
        assert(!isCode, s"clean doc $id misflagged")
        assert(r.getAs[Long]("n_sym") == 0 && r.getAs[Long]("kw_hits") == 0)
      }
    }
  }

  test("text_mojibake: lesioned docs flag, clean docs count zero") {
    val rows = run("text_mojibake").collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (moji, repl) = (r.getAs[Long]("n_moji"), r.getAs[Long]("n_repl"))
      (id % 4) match {
        case 0 => assert(moji > 0 && repl == 0, s"doc $id: expected mojibake")
        case 1 => assert(repl > 0 && moji == 0, s"doc $id: expected U+FFFD")
        case _ => assert(moji == 0 && repl == 0 && !r.getAs[Boolean]("is_corrupt"))
      }
      // the word-salad corpus has 'e' and 'a' everywhere, so lesioned docs
      // always cross the 5-permille flag threshold
      if (id % 4 <= 1) assert(r.getAs[Boolean]("is_corrupt"), s"doc $id under threshold")
    }
  }

  test("graph_kcore_peel agrees with the unbounded k-core fixed point") {
    // cross-gate between the fixed-round oracle row and the spec-gated
    // full kernel, on the SAME near-dup graph: 2-core peeling only ever
    // removes nodes outside the 2-core, so every peeled node must have
    // coreness <= 1 and every coreness>=2 node must survive all three
    // rounds. (The converse inclusion holds only on convergence, which
    // three rounds don't promise — so it is deliberately not asserted.)
    import org.apache.spark.sql.functions.col
    val pairs = TextOps.simhashNearPairs(spark, sf)
      .select(col("rep_a").as("src"), col("rep_b").as("dst"))
    val cores = GraphOps.kcore(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val peel = run("graph_kcore_peel").collect()
    assert(peel.map(_.getAs[Long]("doc_id")).toSet == cores.keySet,
      "peel and kcore must cover the same node set")
    peel.foreach { r =>
      val (id, round) = (r.getAs[Long]("doc_id"), r.getAs[Long]("peel_round"))
      if (round > 0) assert(cores(id) <= 1, s"node $id peeled but core=${cores(id)}")
      if (cores(id) >= 2) assert(round == 0L, s"node $id core=${cores(id)} but peeled r$round")
    }
  }

  test("graph_kcore_peel: peel rounds respect the 2-core definition") {
    val rows = run("graph_kcore_peel").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (deg0, round, degF) = (r.getAs[Long]("degree0"),
        r.getAs[Long]("peel_round"), r.getAs[Long]("deg_final"))
      assert(round >= 0 && round <= 3)
      assert(deg0 >= 1) // every emitted node has at least one edge
      if (round == 1) assert(deg0 < 2, "round-1 peel must be by starting degree")
      if (round == 0) assert(degF >= 2, "survivors must qualify at the last peel")
      if (round >= 2) assert(deg0 >= 2, "late peels only hit nodes that survived round 1")
      // peeling only ever REMOVES edges, so the qualifying degree entering
      // the last round can never exceed the starting degree
      assert(degF <= deg0, "subgraph degree exceeded full-graph degree")
    }
    // the peel_round labels partition the node set (every node exactly once)
    val n0 = rows.count(_.getAs[Long]("peel_round") == 0L)
    val n3 = rows.count(_.getAs[Long]("peel_round") == 3L)
    val n2 = rows.count(_.getAs[Long]("peel_round") == 2L)
    val n1 = rows.count(_.getAs[Long]("peel_round") == 1L)
    assert(n0 + n1 + n2 + n3 == rows.length)
    // a non-empty 2-core needs >= 3 nodes (each survivor has >= 2 surviving
    // neighbors, and degree-2 needs at least a triangle)
    assert(n0 == 0 || n0 >= 3, s"impossible 2-core size $n0")
  }
}
