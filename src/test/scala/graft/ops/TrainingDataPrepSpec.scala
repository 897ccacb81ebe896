package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** The composed shard-prep pipeline: each stage drops exactly the engineered
  * offender and survivors come through intact.
  */
class TrainingDataPrepSpec extends AnyFunSuite with SparkSpec {

  private def mkDocs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "text")
  }

  private val good1 = (1 to 30).map(i => s"alpha$i").mkString(" ")
  private val good2 = (1 to 30).map(i => s"beta$i").mkString(" ")
  private val good3 = (1 to 30).map(i => s"gamma$i").mkString(" ")

  test("pipeline drops low-quality, exact-dup, near-dup and contaminated docs") {
    import spark.implicits._
    val docs = mkDocs(
      (1L, "en", good1),
      (2L, "en", good2),
      (3L, "en", good3),
      (4L, "en", "too short"),        // fails quality (length / tokens)
      (5L, "en", good1),              // exact dup of 1
      (6L, "en", good2),              // exact dup of 2
      (7L, "de", (1 to 30).map(i => s"delta$i").mkString(" ")))
    // benchmark shares a 4-gram run with good3 -> doc 3 is contaminated
    val bench = Seq((100L, (10 to 20).map(i => s"gamma$i").mkString(" ")))
      .toDF("doc_id", "text")

    val (out, Some(stats)) = TrainingDataPrep.prepare(docs, bench)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 7L), s"got $ids")
    assert(stats.input == 7 && stats.afterQuality == 6)
    assert(stats.afterExactDedup == 4)  // 5,6 dropped
    assert(stats.afterNearDedup == 4)   // exact dups already gone; no near-dups left
    assert(stats.afterDecontam == 3)    // 3 dropped
    assert(stats.sampled == 3)
  }

  test("near-dedup stage drops one side of a non-identical near-dup pair") {
    // 30 shared tokens + 1 differing -> Jaccard ~0.94, agreement >= 14/16
    val nearA = ((1 to 30).map(i => s"omega$i") :+ "unique-a").mkString(" ")
    val nearB = ((1 to 30).map(i => s"omega$i") :+ "unique-b").mkString(" ")
    val docs = mkDocs((1L, "en", nearA), (2L, "en", nearB), (3L, "en", good1))
    val dropped = TrainingDataPrep.nearDupIds(docs)
      .collect().map(_.getLong(0)).toSet
    assert(dropped == Set(2L), s"got $dropped") // larger id of the pair
  }

  test("pipeline runs end-to-end on the real documents corpus") {
    // sf0.001 testdata: the corpus the oracle queries run on — catches
    // shape assumptions synthetic fixtures can't (real near-dup clusters,
    // lang distribution, punctuation)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "text")
    val bench = docs.filter(org.apache.spark.sql.functions.col("doc_id") < 3)
      .select("doc_id", "text")
    val (out, Some(stats)) = TrainingDataPrep.prepare(docs, bench, samplePct = 50)
    assert(stats.input == docs.count())
    // each stage is monotone non-increasing and none empties the corpus
    assert(stats.afterQuality <= stats.input && stats.afterQuality > 0)
    assert(stats.afterExactDedup <= stats.afterQuality && stats.afterExactDedup > 0)
    assert(stats.afterNearDedup <= stats.afterExactDedup && stats.afterNearDedup > 0)
    assert(stats.afterDecontam <= stats.afterNearDedup)
    assert(stats.sampled <= stats.afterDecontam)
    // this corpus is engineered near-dup-heavy: the dedup stages must bite
    assert(stats.afterNearDedup < stats.input)
    assert(out.count() == stats.sampled)
  }

  test("sampling is deterministic and stratified") {
    // per-doc unique vocabulary so the dedup stages keep everything
    val docs = mkDocs((1L to 200L).map(i =>
      (i, if (i % 2 == 0) "en" else "de",
        (1 to 30).map(j => s"tok${i}x$j").mkString(" "))): _*)
    val bench = mkDocs().select("doc_id", "text")
    val (a, Some(sa)) = TrainingDataPrep.prepare(docs, bench, samplePct = 20)
    val (b, _) = TrainingDataPrep.prepare(docs, bench, samplePct = 20, withStats = false)
    assert(sa.afterDecontam == 200) // dedup/quality/decontam kept everything
    val idsA = a.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(idsA == b.select("doc_id").collect().map(_.getLong(0)).toSet) // reproducible
    assert(idsA.size > 10 && idsA.size < 80) // ~20% of 200, hash-spread
    val langs = a.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs == Set("en", "de")) // both strata survive
  }

  test("prepareTokenized: survivors tokenize under their own vocabulary and pack per source") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "s0", good1),
      (2L, "en", "s0", good2),
      (3L, "en", "s1", good3),
      (4L, "en", "s1", "too short"), // quality-dropped, must not be tokenized
      (5L, "en", "s1", good1))       // exact dup of 1, dropped
      .toDF("doc_id", "lang", "source", "text")
    val bench = Seq((100L, "nothing shared here")).toDF("doc_id", "text")
    val (packed, merges) = TrainingDataPrep.prepareTokenized(
      docs, bench, nMerges = 16, shardTokenBudget = 20)
    val rows = packed.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Seq[String]]("tokens"), r.getAs[Long]("n_tokens"),
          r.getAs[String]("source"), r.getAs[Long]("shard")))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L), s"only survivors tokenize: ${rows.keySet}")
    assert(merges.nonEmpty && merges.size <= 16)
    // concat identity under the learned vocabulary
    Seq(1L -> good1, 2L -> good2, 3L -> good3).foreach { case (id, text) =>
      val want = text.split(" ").map(_ + "</w>").mkString
      assert(rows(id)._1.mkString == want, s"doc $id")
    }
    // packing: doc 3 is alone in s1 -> shard 0; s0 docs pack by cum-before
    assert(rows(3L)._4 == 0L)
    assert(rows(1L)._4 == 0L, "first s0 doc starts shard 0")
    val cumBefore2 = rows(1L)._2 // doc 2 follows doc 1 in s0
    assert(rows(2L)._4 == cumBefore2 / 20, "shard = tokens-before div budget")
  }
}
