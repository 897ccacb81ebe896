package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Observed metrics equal independently recomputed counts, and the
  * observed pipeline fills all its counters with FEWER Spark jobs than
  * the count()-per-stage shape — the "no extra corpus scans for the
  * dashboard" contract.
  */
class ObservedPrepSpec extends AnyFunSuite with SparkSpec {

  private val SF = "/root/testdata/sf0.001"
  private def docs = Tables.t(spark, SF, "documents")

  private def countJobs(tag: String)(body: => Unit): Int = {
    spark.sparkContext.setJobGroup(tag, tag, interruptOnCancel = false)
    try body finally spark.sparkContext.clearJobGroup()
    spark.sparkContext.statusTracker.getJobIdsForGroup(tag).length
  }

  test("observed metrics match independently recomputed counts") {
    val (out, gateObs, outObs) = ObservedPrep.gateDedupObserved(docs)
    val survivors = out.count() // the ONE action; metrics ride it
    val g = gateObs.get
    val o = outObs.get
    val wantIn = docs.count()
    val wantPass = docs.filter(col("n_chars") >= 100).count()
    val wantOut = docs.filter(col("n_chars") >= 100)
      .groupBy(md5(col("text"))).agg(min(col("doc_id"))).count()
    assert(g("rows_in") == wantIn)
    assert(g("rows_pass") == wantPass)
    assert(o("rows_out") == wantOut)
    assert(survivors == wantOut)
    assert(wantPass < wantIn, "fixture should exercise the gate")
  }

  test("observed accounting costs fewer jobs than count()-per-stage") {
    val observedJobs = countJobs("observed-prep") {
      val (out, _, _) = ObservedPrep.gateDedupObserved(docs)
      out.write.mode("overwrite").format("noop").save()
    }
    val naiveJobs = countJobs("naive-prep") {
      val gated = docs.filter(col("n_chars") >= 100)
      docs.count()           // rows_in
      gated.count()          // rows_pass
      val deduped = gated.withColumn("fp", md5(col("text")))
        .withColumn("rn", expr("row_number() OVER (PARTITION BY fp ORDER BY doc_id)"))
        .filter(col("rn") === 1)
      deduped.count()        // rows_out
      deduped.write.mode("overwrite").format("noop").save()
    }
    assert(observedJobs < naiveJobs,
      s"observe should save whole jobs: observed=$observedJobs naive=$naiveJobs")
  }
}
