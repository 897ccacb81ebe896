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

  test("streaming OHLC candles: open/close exact across micro-batch splits") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, Long, Double)]
    val events = mem.toDF.toDF("ts", "user_id", "event_id", "value")
    val q = StreamingAggs.ohlcCandles(events, "1 minute")
      .writeStream.format("memory").queryName("ohlc").outputMode("append").start()
    try {
      // window [0,60) for user 7 built across TWO batches: the open (first
      // by (ts, event_id)) arrives in batch 1, the close and the low in
      // batch 2 — the merged candle must read open=5.0, close=2.0
      mem.addData((ts(10), 7L, 1L, 5.0), (ts(20), 7L, 2L, 9.0))
      q.processAllAvailable()
      mem.addData((ts(30), 7L, 3L, 1.0), (ts(50), 7L, 4L, 2.0))
      q.processAllAvailable()
      mem.addData((ts(200), 7L, 5L, 4.0)) // watermark 200-60=140 finalizes [0,60)
      q.processAllAvailable()
      val rows = spark.table("ohlc").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
      assert(rows.toSeq == Seq((0L, 7L, 5.0, 9.0, 1.0, 2.0, 4L)), rows.toSeq)
    } finally q.stop()
  }

  test("streaming drift monitor: exact TVD vs reference, merged across batches, finalized once") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val events = mem.toDF.toDF("ts", "value")
    // reference: uniform 10 per cell (n_ref = 100)
    val q = StreamingAggs.driftMonitor(events, Seq.fill(10)(10L), "1 minute")
      .writeStream.format("memory").queryName("drift").outputMode("append").start()
    try {
      // window [0,60): 4 events — cells: 0 (v=10 -> 1000c), 0 (v=20),
      // 1 (v=60 -> 6000c), 9 (v=480 -> 48000c) — split across two
      // micro-batches so the cell counters must merge in the state store
      mem.addData((ts(5), 10.0), (ts(10), 20.0))
      q.processAllAvailable()
      mem.addData((ts(20), 60.0), (ts(30), 480.0))
      q.processAllAvailable()
      mem.addData((ts(200), 1.0)) // watermark 140 finalizes [0,60)
      q.processAllAvailable()
      val rows = spark.table("drift").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // live: c0=2, c1=1, c9=1, n_live=4, n_ref=100.
      // tvd_num = |2*100-10*4| + |1*100-10*4|*2 (cells 1 and 9)
      //         + |0*100-10*4|*7 = 160 + 60 + 60 + 280 = 560
      // tvd_permille = 560*1000 div (2*100*4) = 700
      assert(rows.toSeq == Seq((0L, 4L, 560L, 700L)), rows.toSeq)
      // late event inside the finalized window must NOT restate the row
      mem.addData((ts(15), 10.0))
      q.processAllAvailable()
      assert(spark.table("drift").count() == 1)
    } finally q.stop()
  }

  test("streaming KS monitor: exact worst CDF gap vs reference, merged across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val events = mem.toDF.toDF("ts", "value")
    // reference: uniform 10 per cell (n_ref = 100, rcum_i = 10(i+1))
    val q = StreamingAggs.ksMonitor(events, Seq.fill(10)(10L), "1 minute")
      .writeStream.format("memory").queryName("ksmon").outputMode("append").start()
    try {
      // window [0,60): cells 0,0,1,9 (as in the drift test), split across
      // batches so the cell counters must merge through the state store
      mem.addData((ts(5), 10.0), (ts(10), 20.0))
      q.processAllAvailable()
      mem.addData((ts(20), 60.0), (ts(30), 480.0))
      q.processAllAvailable()
      mem.addData((ts(200), 1.0)) // watermark 140 finalizes [0,60)
      q.processAllAvailable()
      val rows = spark.table("ksmon").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // live cum CDF (n=4): cum0=2, cum1=3, cum2..8=3, cum9=4.
      // d_num_i = |cum_i*100 - 10(i+1)*4|: i=0: 160; i=1: 220; i=2: 180;
      // i=3..8 decreasing then rising negative gap: |300-40(i+1)*... =
      // i=8: |300-360|=60; max at i=1 -> 220. ks_permille = 220*1000
      // div (100*4) = 550
      assert(rows.toSeq == Seq((0L, 4L, 220L, 550L)), rows.toSeq)
      // late event inside the finalized window must NOT restate the row
      mem.addData((ts(15), 10.0))
      q.processAllAvailable()
      assert(spark.table("ksmon").count() == 1)
    } finally q.stop()
  }

  test("streaming A/B monitor: variant counters merge across batches, finalize once, match the batch twin") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String, Double)]
    val events = mem.toDF.toDF("ts", "user_id", "event_type", "value")
    val q = StreamingAggs.abMonitor(events, "1 minute")
      .writeStream.format("memory").queryName("abmon").outputMode("append").start()
    try {
      // window [0,60): variant 0 = users 2,4 (one purchase), variant 1 =
      // user 3 (purchase) — split ACROSS two micro-batches so the
      // counters must merge through the state store
      mem.addData((ts(5), 2L, "view", 1.0), (ts(10), 3L, "purchase", 2.5))
      q.processAllAvailable()
      mem.addData((ts(20), 4L, "purchase", 1.25), (ts(30), 2L, "click", 9.0))
      q.processAllAvailable()
      mem.addData((ts(200), 8L, "view", 1.0)) // watermark 140 finalizes [0,60)
      q.processAllAvailable()
      val rows = spark.table("abmon").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
      // variant 0: 3 events, 1 purchase (125 cents), conv 333 permille
      // variant 1: 1 event, 1 purchase (250 cents), conv 1000 permille
      assert(rows == Set((0L, 0L, 3L, 1L, 125L, 333L), (0L, 1L, 1L, 1L, 250L, 1000L)),
        s"got $rows")
      // late event inside the finalized window must NOT restate the row
      mem.addData((ts(15), 6L, "purchase", 3.0))
      q.processAllAvailable()
      assert(spark.table("abmon").count() == 2)
    } finally q.stop()
  }

  test("windowed heavy hitters merge sketch state across micro-batches and finalize exactly") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val docs = mem.toDF.toDF("ts", "text")
    val q = StreamingAggs.windowedHeavyHitters(docs, m = 8, watermark = "1 minute")
      .writeStream.format("memory").queryName("hhwin").outputMode("append").start()
    try {
      // window [0,60): "a" x3 + "b" x1 split ACROSS two micro-batches — the
      // sketch buffer must survive a state-store round trip in between
      mem.addData((ts(5), "a a"), (ts(10), "b"))
      q.processAllAvailable()
      mem.addData((ts(20), "a"))
      q.processAllAvailable()
      mem.addData((ts(180), "c")) // watermark -> 120: finalizes [0,60)
      q.processAllAvailable()

      val rows = spark.table("hhwin").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(rows.contains((0L, "a", 3L, 0L)), s"got $rows")
      assert(rows.contains((0L, "b", 1L, 0L)))
      assert(!rows.exists(_._2 == "c")) // [180,240) not finalized yet
    } finally q.stop()
  }

  test("windowed quantiles: digest state survives micro-batch splits; exact in the small-n regime") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val vals = mem.toDF.toDF("ts", "v")
    // k = 1000 >> per-window n: the q-digest never compresses, so the
    // streamed estimates are EXACT order statistics — a state-store
    // serialization defect shows as a wrong quartile, not a fuzzy one
    val q = StreamingAggs.windowedQuantiles(vals, bits = 8, k = 1000, watermark = "1 minute")
      .writeStream.format("memory").queryName("qwin").outputMode("append").start()
    try {
      // window [0,60): values 1..8 split across two micro-batches
      mem.addData((ts(5), 1L), (ts(10), 5L), (ts(15), 3L), (ts(20), 7L))
      q.processAllAvailable()
      mem.addData((ts(25), 2L), (ts(30), 6L), (ts(35), 4L), (ts(40), 8L))
      q.processAllAvailable()
      mem.addData((ts(180), 50L)) // watermark -> 120: finalizes [0,60)
      q.processAllAvailable()
      val rows = spark.table("qwin").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      // n=8: targets ceil(.25*8)=2, ceil(.5*8)=4, ceil(.75*8)=6
      assert(rows(0L) == ((2L, 4L, 6L, 8L)), s"got $rows")
      assert(!rows.contains(180L), "[180,240) must not finalize yet")
    } finally q.stop()
  }

  test("streaming Count-Min matrix equals the batch sketch over the same keys") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Long]
    val ids = mem.toDF.toDF("user_id")
    val q = StreamingAggs.streamingCountMin(ids, width = 8)
      .writeStream.format("memory").queryName("cmstream").outputMode("complete").start()
    try {
      // keys split across micro-batches: cells must ACCUMULATE
      mem.addData(1L, 2L, 3L, 1L)
      q.processAllAvailable()
      mem.addData(1L, 4L, 2L)
      q.processAllAvailable()
      val streamed = spark.table("cmstream").collect()
        .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
      val batch = StreamingAggs.streamingCountMin(
          Seq(1L, 2L, 3L, 1L, 1L, 4L, 2L).toDF("user_id"), width = 8)
        .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      // the matrix never stores keys: exactly depth x width cells at most
      assert(streamed.size <= 4 * 8)
      // estimate for key 1 (min over its probed cells) >= its true count 3
      val est = (0 until 4).map { r =>
        val w = ((graft.ops.CountMin.A(r) * 1L + graft.ops.CountMin.B(r))
          % graft.ops.CountMin.P) % 8
        streamed((r, w))
      }.min
      assert(est >= 3L)
    } finally q.stop()
  }

  test("sliding windows emit one finalized row per overlapping window") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = mem.toDF.toDF("ts", "event_type", "value")
    // 2-minute windows sliding by 1 minute: an event at t=70 belongs to
    // [0,120) and [60,180)
    val q = StreamingAggs.slidingCounts(events, "2 minutes", "1 minute", "1 minute")
      .writeStream.format("memory").queryName("sliding").outputMode("append").start()
    try {
      mem.addData((ts(70), "click", 1.0), (ts(130), "click", 1.0))
      q.processAllAvailable()
      mem.addData((ts(600), "click", 1.0)) // watermark 540 finalizes all early windows
      q.processAllAvailable()
      val rows = spark.table("sliding").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      assert(rows.contains((0L, 120L, 1L)))    // t=70 only
      assert(rows.contains((60L, 180L, 2L)))   // t=70 and t=130 overlap here
      assert(rows.contains((120L, 240L, 1L)))  // t=130 only
    } finally q.stop()
  }

  test("stream-static join enriches each micro-batch against the dimension") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val stream = mem.toDF.toDF("user_id", "value")
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = StreamingAggs.enrichAgainstDim(stream, dim, "user_id")
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try {
      mem.addData((1L, 5.0), (3L, 7.0))
      q.processAllAvailable()
      mem.addData((2L, 1.0))
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2)))).toSet
      assert(rows == Set((1L, 5.0, Some("gold")), (3L, 7.0, None), (2L, 1.0, Some("basic"))))
    } finally q.stop()
  }

  test("streaming dedup keeps one copy per fingerprint and evicts state past the watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val q = StreamingAggs.dedupWithinWatermark(
        mem.toDF.toDF("ts", "text"), watermark = "1 minute")
      .writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    try {
      mem.addData((ts(10), "alpha"), (ts(12), "alpha"), (ts(15), "beta")) // in-batch dup
      q.processAllAvailable()
      mem.addData((ts(20), "alpha")) // cross-batch dup, within watermark
      q.processAllAvailable()
      assert(spark.table("sdedup").collect().map(_.getString(1)).sorted.toSeq
        == Seq("alpha", "beta"))
      // advance event time so the watermark passes alpha's fingerprint state,
      // then the same content is admitted again — state really evicted
      mem.addData((ts(500), "gamma"))
      q.processAllAvailable()
      mem.addData((ts(510), "alpha"))
      q.processAllAvailable()
      val texts = spark.table("sdedup").collect().map(_.getString(1)).sorted.toSeq
      assert(texts == Seq("alpha", "alpha", "beta", "gamma"), texts)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization emits on event-time timeout and evicts state") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[StreamingAggs.Click]
    val q = StreamingAggs.streamingSessions(mem.toDS(), gapSec = 30L, watermark = "1 minute")
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // user 1: two events 10 s apart (one session); user 2: one event
      mem.addData(StreamingAggs.Click(1, ts(100)), StreamingAggs.Click(1, ts(110)),
        StreamingAggs.Click(2, ts(105)))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0) // nothing closed yet
      // advance event time far enough that watermark (max - 1 min) passes
      // last_event + 30 s for both users -> both sessions time out and emit
      mem.addData(StreamingAggs.Click(1, ts(400)))
      q.processAllAvailable()
      mem.addData(StreamingAggs.Click(1, ts(600))) // watermark on, closes the ts(400) session
      q.processAllAvailable()
      mem.addData(StreamingAggs.Click(9, ts(900))) // push watermark past 600+30
      q.processAllAvailable()

      val rows = spark.table("sessions").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(rows.contains((1L, 100L, 110L, 2L))) // first session: both events, correct bounds
      assert(rows.contains((2L, 105L, 105L, 1L)))
      assert(rows.contains((1L, 400L, 400L, 1L))) // cross-batch split became its own session
      // in-batch split: two sessions in ONE addData, leading one emits eagerly
      mem.addData(StreamingAggs.Click(5, ts(1000)), StreamingAggs.Click(5, ts(1200)))
      q.processAllAvailable()
      val u5 = spark.table("sessions").collect().filter(_.getLong(0) == 5L)
        .map(r => (r.getLong(1), r.getLong(3)))
      assert(u5.toSeq == Seq((1000L, 1L)))
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks to views within the horizon") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val vmem = MemoryStream[(Long, java.sql.Timestamp)]
    val cmem = MemoryStream[(Long, java.sql.Timestamp)]
    val q = StreamingAggs.clickAttribution(
        vmem.toDF.toDF("user_id", "view_ts"),
        cmem.toDF.toDF("user_id", "click_ts"),
        horizonSec = 30L, watermark = "1 minute")
      .writeStream.format("memory").queryName("attrib").outputMode("append").start()
    try {
      vmem.addData((1L, ts(100)), (2L, ts(100)))
      cmem.addData((1L, ts(110)))  // user 1: within 30 s of the view -> joins
      cmem.addData((2L, ts(170)))  // user 2: 70 s later -> outside horizon
      cmem.addData((3L, ts(115)))  // user 3: no view at all
      q.processAllAvailable()
      // advance both watermarks so the join state finalizes and emits
      vmem.addData((9L, ts(600)))
      cmem.addData((9L, ts(900)))
      q.processAllAvailable()
      val rows = spark.table("attrib").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows.contains((1L, 100L, 110L)))
      assert(!rows.exists(_._1 == 2L)) // outside the horizon never joins
      assert(!rows.exists(_._1 == 3L)) // clicks without a view never join
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

  test("streamingAnomaly matches the batch integer z-test across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // deterministic daily series with an obvious spike at day 10
    val cnts = Seq[Long](100, 102, 98, 101, 99, 103, 100, 101, 99, 102, 250, 101, 100)
    val series = cnts.zipWithIndex.map { case (c, i) =>
      StreamingAggs.DayCount("click", i.toLong, c) }

    // driver-side reference: the batch events_anomaly formula over the
    // trailing 7 OBSERVED days
    val want = (7 until series.size).map { i =>
      val w = cnts.slice(i - 7, i)
      val s = w.sum; val q = w.map(c => c * c).sum
      val d = 7 * cnts(i) - s
      (i.toLong, cnts(i), s, q, d > 0 && d * d > 4 * (7 * q - s * s))
    }.toSet

    val mem = MemoryStream[StreamingAggs.DayCount]
    val q = StreamingAggs.streamingAnomaly(mem.toDS())
      .writeStream.format("memory").queryName("anom").outputMode("update").start()
    try {
      mem.addData(series.take(9): _*)  // first batch: 9 days (2 verdicts)
      q.processAllAvailable()
      mem.addData(series.drop(9): _*)  // rest, incl. the spike: state carries
      q.processAllAvailable()
      val got = spark.table("anom").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toSet
      assert(got == want)
      // the spike day (and only it) is flagged
      assert(got.filter(_._5).map(_._1) == Set(10L))
    } finally q.stop()
  }
}
