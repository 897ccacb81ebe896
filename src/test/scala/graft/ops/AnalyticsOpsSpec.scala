package graft.ops

import graft.{SparkEntry, SparkSpec}
import org.scalatest.funsuite.AnyFunSuite

/** Ground-truth checks for the analytics pack on adversarial shapes the
  * DuckDB oracle's fixed tables can't isolate: crafted graphs for the
  * triangle census, null-poisoned NOT IN subqueries, partitioning-
  * invariance of the hash split, and a brute-forced sliding distinct
  * window.
  */
class AnalyticsOpsSpec extends AnyFunSuite with SparkSpec {

  private val SF = "/root/testdata/sf0.001"

  private def tri(es: (Long, Long)*): Map[String, Long] = {
    import spark.implicits._
    val row = AnalyticsOps.triangleStats(es.toDF("a", "b")).head()
    row.schema.fieldNames.zip(row.toSeq.map(_.asInstanceOf[Long])).toMap
  }

  /** Brute-force census: canonicalize, then count a<b<c closed triples. */
  private def bruteTri(es: Seq[(Long, Long)]): (Long, Long, Long) = {
    val e = es.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      .filter { case (x, y) => x != y }.distinct.toSet
    val nodes = e.flatMap { case (x, y) => Seq(x, y) }
    val deg = nodes.map(n => n -> e.count { case (x, y) => x == n || y == n }).toMap
    val wedges = deg.values.map(d => d.toLong * (d - 1) / 2).sum
    val ns = nodes.toSeq.sorted
    val triangles = (for {
      a <- ns; b <- ns if a < b && e((a, b))
      c <- ns if b < c && e((b, c)) && e((a, c))
    } yield 1).size.toLong
    (e.size.toLong, wedges, triangles)
  }

  test("triangle census on crafted graphs matches brute force") {
    // triangle + pendant, two triangles sharing an edge, a 4-star (0
    // triangles, 6 wedges), K4 (4 triangles, cc=1000), and a hub graph
    // where id-ordering would misbehave but degree-ordering bounds work
    val graphs = Seq(
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)),
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L)),
      Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L)),
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)),
      // hub 1 connected to everyone, plus a chain among the leaves;
      // reversed/duplicate input orientations must collapse
      Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L),
        (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (2L, 3L)))
    graphs.foreach { g =>
      val (edges, wedges, triangles) = bruteTri(g)
      val got = tri(g: _*)
      assert(got("n_edges") == edges, s"edges in $g")
      assert(got("n_wedges") == wedges, s"wedges in $g")
      assert(got("n_triangles") == triangles, s"triangles in $g")
      if (wedges > 0)
        assert(got("cc_permille") == 3000 * triangles / wedges, s"cc in $g")
    }
  }

  test("K4 is fully clustered: cc_permille = 1000") {
    val got = tri((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(got("n_triangles") == 4L)
    assert(got("cc_permille") == 1000L)
  }

  test("NOT IN agrees with NOT EXISTS when the subquery is null-free") {
    val notIn = SparkEntry.queries("subquery_not_in")(spark, SF)
    Tables.t(spark, SF, "customer").createOrReplaceTempView("ne_customer")
    Tables.t(spark, SF, "orders").createOrReplaceTempView("ne_orders")
    val notExists = spark.sql(
      """SELECT c_mktsegment, count(*) AS n_cust, min(c_custkey) AS min_key
        |FROM ne_customer c
        |WHERE NOT EXISTS (SELECT 1 FROM ne_orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    assert(notIn.collect().toSeq == notExists.collect().toSeq)
    assert(notIn.count() > 0) // non-degenerate fixture
  }

  test("NOT IN over a subquery containing NULL returns no rows (three-valued logic)") {
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").createOrReplaceTempView("naaj_probe")
    Seq(Some(2L), None).toDF("k").createOrReplaceTempView("naaj_nulls")
    val n = spark.sql(
      "SELECT * FROM naaj_probe WHERE k NOT IN (SELECT k FROM naaj_nulls)").count()
    assert(n == 0L, "one NULL in a NOT IN subquery must empty the result")
  }

  test("hash split is exhaustive, disjoint, and invariant under repartitioning") {
    val a = SparkEntry.queries("prep_split")(spark, SF).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a.keySet == Set("train", "val", "test"))
    val total = a.values.sum
    val nDocs = Tables.t(spark, SF, "documents").count()
    assert(total == nDocs, "every doc lands in exactly one split")
    // ~80/10/10 with slack for a small corpus
    assert(a("train") * 10 > total * 7 && a("train") * 10 < total * 9, a.toString)
    // assignment is a pure function of doc_id: recompute over a different
    // partitioning and compare per-split counts
    import org.apache.spark.sql.functions._
    val re = Tables.t(spark, SF, "documents").repartition(13)
      .withColumn("h", md5(col("doc_id").cast("string").cast("binary")))
      .withColumn("split",
        when(col("h") < "cc", "train").when(col("h") < "e6", "val").otherwise("test"))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(re == a)
  }

  test("hash sample is deterministic and drawn from the table") {
    val s1 = SparkEntry.queries("sample_hash")(spark, SF).collect().toSeq
    val s2 = SparkEntry.queries("sample_hash")(spark, SF).collect().toSeq
    assert(s1 == s2, "same hash order => same sample, every run")
    assert(s1.size == 100)
    val ids = Tables.t(spark, SF, "events")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(s1.map(_.getLong(0)).forall(ids.contains))
  }

  test("sliding distinct window matches a driver-side brute force") {
    val ev = Tables.t(spark, SF, "events")
      .select("user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000, r.getString(2)))
    // brute force: for each event, distinct types of the same user in
    // (cs - 604799, cs] — peer-inclusive like a RANGE frame
    val byUser = ev.groupBy(_._1)
    val brute = ev.map { case (u, cs, tpe) =>
      val nd = byUser(u).filter(e => e._2 <= cs && e._2 >= cs - 604799)
        .map(_._3).distinct.size.toLong
      (tpe, nd)
    }.groupBy(identity).map { case ((tpe, nd), hits) => (tpe, nd, hits.size.toLong) }
      .toSeq.sorted
    val got = SparkEntry.queries("window_distinct")(spark, SF).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got == brute)
  }

  test("hopping windows cover each purchase exactly width/hop times") {
    import org.apache.spark.sql.functions._
    val purchases = Tables.t(spark, SF, "events")
      .filter(col("event_type") === "purchase")
    val nP = purchases.count()
    val centsP = purchases
      .agg(sum(round(col("value") * 100).cast("long"))).head().getLong(0)
    val win = SparkEntry.queries("events_sliding")(spark, SF)
      .agg(sum("n"), sum("cents"), min(expr("w_end_s - w_start_s"))).head()
    assert(win.getLong(0) == 2 * nP, "each event in exactly 2 hopping windows")
    assert(win.getLong(1) == 2 * centsP)
    assert(win.getLong(2) == 21600L, "6-hour window width")
  }
}
