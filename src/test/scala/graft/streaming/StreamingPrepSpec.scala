package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral test of the continuous prep pipeline: quality gate,
  * watermark-bounded cross-batch dedup, benchmark decontamination against
  * a broadcast gram constant, and the reproducible sample — end to end on
  * a MemoryStream.
  */
class StreamingPrepSpec extends AnyFunSuite with SparkSpec {

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  // >= 40 chars, >= 5 tokens, low punctuation: passes the quality gate
  private val goodA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val goodB = "one two three four five six seven eight nine ten eleven"
  private val benchText = "secret eval question answer pattern holdout set marker"

  test("streaming prep gates, decontaminates, and dedups across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val bench = Seq((0L, benchText)).toDF("doc_id", "text")
    val grams = StreamingPrep.benchGramHashes(bench)
    assert(grams.length == 5) // 8 tokens -> 5 sliding 4-grams

    val mem = MemoryStream[(Long, java.sql.Timestamp, String, String, Long)]
    val docs = mem.toDF.toDF("doc_id", "ts", "text", "lang", "n_chars")
    val q = StreamingPrep.prep(docs, grams, watermark = "10 minutes")
      .writeStream.format("memory").queryName("prep").outputMode("append").start()
    try {
      mem.addData(
        (1L, ts(10), goodA, "en", goodA.length.toLong),                   // survives
        (2L, ts(11), "too short", "en", 9L),                              // quality-dropped
        (3L, ts(12), s"prefix $benchText suffix words", "en", 60L),       // contaminated
        (4L, ts(13), goodA, "en", goodA.length.toLong))                   // dup of 1 (same batch)
      q.processAllAvailable()
      mem.addData(
        (5L, ts(70), goodA, "en", goodA.length.toLong),                   // dup of 1 (cross-batch, within watermark)
        (6L, ts(71), goodB, "en", goodB.length.toLong))                   // new content: survives
      q.processAllAvailable()

      val got = spark.table("prep").collect().map(_.getLong(0)).toSet
      assert(got.contains(1L), "quality survivor must flow through")
      assert(got.contains(6L), "distinct content must flow through")
      assert(!got.contains(2L), "quality gate must drop short docs")
      assert(!got.contains(3L), "benchmark 4-gram overlap must drop the doc")
      assert(!got.contains(4L) && !got.contains(5L),
        "same- and cross-batch duplicates within the watermark must drop")
      assert(got == Set(1L, 6L))
    } finally q.stop()
  }

  test("the sample knob is reproducible and monotone") {
    import spark.implicits._
    // batch-mode check of the same predicate: permille=1000 keeps all,
    // permille=0 keeps none, and a mid dial keeps a stable subset
    val docs = (1 to 200).map(i =>
      (i.toLong, ts(i.toLong), s"$goodA tail$i", "en", 60L))
      .toDF("doc_id", "ts", "text", "lang", "n_chars")
    val all = StreamingPrep.gateAndSample(docs, Array.empty[Long], samplePermille = 1000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val none = StreamingPrep.gateAndSample(docs, Array.empty[Long], samplePermille = 0)
      .select("doc_id").collect()
    val half1 = StreamingPrep.gateAndSample(docs, Array.empty[Long], samplePermille = 500)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val half2 = StreamingPrep.gateAndSample(docs, Array.empty[Long], samplePermille = 500)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(all.size == 200 && none.isEmpty)
    assert(half1 == half2, "keyed-hash sample must be run-reproducible")
    assert(half1.nonEmpty && half1.size < 200)
    assert(half1.subsetOf(all))
  }
}
