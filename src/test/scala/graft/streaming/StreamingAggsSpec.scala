package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral tests of the true streaming operators: watermark semantics
  * (late-data drop, append-mode finalization) and mapGroupsWithState
  * cross-batch state.
  */
class StreamingAggsSpec extends AnyFunSuite with SparkSpec {

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("watermarked tumbling window finalizes buckets and drops late data") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = mem.toDF.toDF("ts", "event_type", "value")
    val q = StreamingAggs.tumblingCounts(events, "1 minute")
      .writeStream.format("memory").queryName("tumbling").outputMode("append").start()
    try {
      mem.addData((ts(5), "click", 1.0), (ts(20), "click", 2.0)) // bucket [0,60)
      q.processAllAvailable()
      mem.addData((ts(180), "click", 1.0)) // watermark -> 180-60=120: finalizes [0,60)
      q.processAllAvailable()
      mem.addData((ts(7), "click", 99.0))  // LATE for [0,60) — beyond watermark
      mem.addData((ts(300), "click", 1.0)) // watermark -> 240: finalizes [180,240)
      q.processAllAvailable()

      val rows = spark.table("tumbling").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
      assert(rows.contains((0L, 2L, 3.0)))      // on-time events only, emitted once
      assert(!rows.exists(_._3 == 99.0))        // late event dropped, bucket NOT re-emitted
      assert(rows.contains((180L, 1L, 1.0)))    // second finalized bucket
    } finally q.stop()
  }

  test("mapGroupsWithState accumulates per-user state across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[StreamingAggs.UserEvent]
    val q = StreamingAggs.runningUserTotals(mem.toDS())
      .writeStream.format("memory").queryName("totals").outputMode("update").start()
    try {
      mem.addData(StreamingAggs.UserEvent(1, 10.0), StreamingAggs.UserEvent(1, 5.0),
        StreamingAggs.UserEvent(2, 1.0))
      q.processAllAvailable()
      mem.addData(StreamingAggs.UserEvent(1, 2.5)) // second batch: state must carry over
      q.processAllAvailable()

      val latest = spark.table("totals").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
      assert(latest(1L) == ((3L, 17.5))) // 10+5 then +2.5 across batches
      assert(latest(2L) == ((1L, 1.0)))
    } finally q.stop()
  }
}
