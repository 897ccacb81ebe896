package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Incremental MinHash dedup: each batch is checked against the persisted
  * band table — historical TEXT is never re-read, old-vs-old pairs are
  * never generated, and state accumulates across commits.
  */
class MinHashIncrementalSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val textA = (1 to 30).map(i => s"alpha$i").mkString(" ")
  private val textB = (1 to 30).map(i => s"beta$i").mkString(" ")
  private val textC = (1 to 30).map(i => s"gamma$i").mkString(" ")

  test("batches dedup against accumulated state without re-reading old text") {
    val state = Files.createTempDirectory("mhinc").resolve("bands").toString

    // batch 1: two unrelated docs — no pairs, state seeded
    val b1 = MinHashIncremental.dedupBatch(spark, docs(1L -> textA, 2L -> textB), state)
    assert(b1.pairs.count() == 0)
    MinHashIncremental.commit(b1, state)
    assert(spark.read.parquet(state).count() == 4) // 2 band rows per doc

    // batch 2: d3 duplicates historical d1; d4/d5 duplicate each other
    val b2 = MinHashIncremental.dedupBatch(
      spark, docs(3L -> textA, 4L -> textC, 5L -> textC), state)
    val got2 = b2.pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got2 == Set((1L, 3L, 16L), (4L, 5L, 16L)),
      s"cross-batch + in-batch dups expected, got $got2")
    MinHashIncremental.commit(b2, state)

    // batch 3: d6 duplicates d2 (two commits back) — found from state alone;
    // the historical old-vs-old dup (1,3) is NOT re-reported
    val b3 = MinHashIncremental.dedupBatch(spark, docs(6L -> textB), state)
    val got3 = b3.pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got3 == Set((2L, 6L)), s"got $got3")
    MinHashIncremental.commit(b3, state)
    assert(spark.read.parquet(state).count() == 12) // 6 docs × 2 bands
  }

  test("incremental signatures agree with the batch dedup_minhash query") {
    // the same doc set, processed as one batch vs. via the shared builder,
    // yields identical band rows (the incremental path IS the oracle path)
    val d = docs(10L -> textA, 11L -> textA, 12L -> textB)
    val bands = MinHashIncremental.signatures(d)
    assert(bands.count() == 6)
    val pairApi = TextOps.minhashPairs(bands, bands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairApi == Set((10L, 11L)))
  }
}
