package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming aggregations over event streams — the true streaming form of
  * the oracle-checked batch `stream_tumbling` query, plus a custom keyed
  * state machine on the `mapGroupsWithState` extension point.
  *
  * Scale design: both operators keep state partitioned by key (window ×
  * event_type, or user) in Spark's state store; the watermark bounds state
  * size by evicting finalized windows — no unbounded driver or executor
  * accumulation at 100 TB/day event volume.
  */
object StreamingAggs {

  /** Watermarked 1-minute tumbling counts. Late events beyond the watermark
    * are dropped; in append mode a window emits exactly once, when the
    * watermark passes its end. The same plan runs on a static DataFrame
    * (that batch form is the oracle-checked `stream_tumbling`).
    */
  def tumblingCounts(events: DataFrame, watermark: String = "2 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("bucket_s"),
        col("event_type"), col("n"), col("sum_value"))

  /** Watermarked SLIDING window counts: each event lands in len/slide
    * overlapping windows (the Expand that materializes the window
    * assignments is linear in that overlap factor, not in window length).
    * State per (window, event_type) evicts when the watermark passes the
    * window end — same bound as tumbling, times the overlap factor.
    */
  def slidingCounts(events: DataFrame, winLen: String = "2 minutes",
      slide: String = "1 minute", watermark: String = "2 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), winLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("win_start_s"),
        unix_timestamp(col("window.end")).as("win_end_s"),
        col("event_type"), col("n"))

  /** Watermarked per-user OHLC candles — the streaming form of the
    * oracle-checked `window_ohlc`: per (user, 1-minute window) open/close
    * via min_by/max_by on the (event time, event_id) total order.
    * Selection aggregates merge associatively, so the candle is exact
    * across arbitrary micro-batch splits — the open seen in batch 1
    * survives a close arriving in batch 3 (pinned in spec). Append mode:
    * a candle emits ONCE when the watermark passes its window end; state
    * per (user, window) evicts on finalization — bounded by active
    * windows × users, not by stream length.
    */
  def ohlcCandles(events: DataFrame, watermark: String = "2 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 minute"), col("user_id"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("window.start")).as("bucket_s"), col("user_id"),
        col("open"), col("high"), col("low"), col("close"), col("n_events"))

  /** Streaming twin of the batch `events_ab_test` counter core: per
    * event-time tumbling window and experiment variant (the same
    * content-free user_id parity assignment — stable across batches,
    * retries and backfills), event count, purchase count, revenue cents
    * and per-event conversion in exact integer permille. Watermarked
    * append: each (window, variant) row finalizes exactly once, so the
    * experiment dashboard's history is immutable — late events beyond
    * the watermark are dropped, not restated (the reference-pipeline
    * at-least-once counters, main.py:432, upgraded to exactly-once
    * window semantics). Cents quantize as round(value·100) BEFORE the
    * sum — the house integer-money rule — so a re-run, a different
    * partitioning, or the batch twin produces bit-identical counters.
    * Scale shape: ONE map-side-combinable windowed aggregate on a
    * (window, variant) key space of 2 rows per window; state is bounded
    * by the watermark horizon, per-event work is a projection.
    */
  def abMonitor(events: DataFrame, watermark: String = "2 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 minute"), pmod(col("user_id"), lit(2)).as("variant"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"),
        sum(when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).otherwise(0L)).as("cents"))
      .select(unix_timestamp(col("window.start")).as("bucket_s"), col("variant"),
        col("n_events"), col("n_purchases"), col("cents"),
        expr("(n_purchases * 1000) div n_events").as("conv_permille"))

  /** Streaming twin of the batch drift battery (`agg_drift_tvd`):
    * per event-time tumbling window, the exact total-variation distance
    * between the live value distribution and a FIXED reference histogram
    * (the training snapshot's profile) — the "is production drifting off
    * the data we trained on" alarm, finalized exactly once per window.
    *
    * `refCounts(i)` is the reference count of value bucket i (bucket =
    * cents div 5000, capped into the last cell — ten fixed cells over the
    * value domain). A fixed bucket DOMAIN is what makes this a single
    * windowed aggregate: the per-window histogram is one conditional sum
    * per cell (map-side combinable, mergeable across micro-batches
    * through the state store), so no chained stateful aggregation is
    * needed. TVD stays integer-exact (the StatsOps discipline):
    * tvd_num = Σᵢ |cᵢ·n_ref − rᵢ·n_live| in BIGINT, readout
    * (tvd_num·1000) div (2·n_ref·n_live) in exact permille.
    * State: one row of 10 BIGINTs per open window — bounded by the
    * watermark horizon; late events drop, history never restates.
    */
  /** Streaming twin of `agg_ks_test`: per event-time window, the exact
    * Kolmogorov–Smirnov D (over the same fixed 10-cell bucket domain as
    * [[driftMonitor]]) between the live value distribution and the
    * reference histogram — TVD reads total drifted mass, KS-D reads the
    * worst single CDF gap, the two alarms a drift dashboard pairs.
    * Integer-exact: d_num = maxᵢ |cumᵢ·n_ref − rcumᵢ·n_live| is a
    * greatest() over ten BIGINT terms whose cumulative sums are plain
    * column additions (the bucket domain is FIXED, so the CDF needs no
    * window and no second stateful aggregate); readout
    * (d_num·1000) div (n_ref·n_live) in exact permille. Same state
    * bound and exactly-once semantics as driftMonitor.
    */
  def ksMonitor(events: DataFrame, refCounts: Seq[Long],
      watermark: String = "2 minutes"): DataFrame = {
    require(refCounts.length == 10 && refCounts.forall(_ >= 0) && refCounts.sum > 0,
      "refCounts must be 10 non-negative cells with positive total")
    val nRef = refCounts.sum
    val refCum = refCounts.scanLeft(0L)(_ + _).tail // rcum_0..rcum_9
    val bucket = least(lit(9), greatest(lit(0),
      expr("cast(round(value * 100) as bigint) div 5000").cast("int")))
    val cells = count(lit(1)).as("n_live") +: (0 until 10).map(i =>
      sum(when(bucket === i, 1L).otherwise(0L)).as(s"c$i"))
    val dNum = (0 until 10).map { i =>
        val cum = (0 to i).map(j => col(s"c$j")).reduce(_ + _)
        abs(cum * lit(nRef) - lit(refCum(i)) * col("n_live"))
      }.reduce((a, b) => greatest(a, b))
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 minute"))
      .agg(cells.head, cells.tail: _*)
      .withColumn("d_num", dNum)
      .select(unix_timestamp(col("window.start")).as("bucket_s"),
        col("n_live"), col("d_num"),
        expr(s"(d_num * 1000) div ($nRef * n_live)").as("ks_permille"))
  }

  def driftMonitor(events: DataFrame, refCounts: Seq[Long],
      watermark: String = "2 minutes"): DataFrame = {
    require(refCounts.length == 10 && refCounts.forall(_ >= 0) && refCounts.sum > 0,
      "refCounts must be 10 non-negative cells with positive total")
    val nRef = refCounts.sum
    val bucket = least(lit(9), greatest(lit(0),
      expr("cast(round(value * 100) as bigint) div 5000").cast("int")))
    val cells = count(lit(1)).as("n_live") +: (0 until 10).map(i =>
      sum(when(bucket === i, 1L).otherwise(0L)).as(s"c$i"))
    val tvdNum = (0 until 10).map(i =>
        abs(col(s"c$i") * lit(nRef) - lit(refCounts(i)) * col("n_live")))
      .reduce(_ + _)
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 minute"))
      .agg(cells.head, cells.tail: _*)
      .withColumn("tvd_num", tvdNum)
      .select(unix_timestamp(col("window.start")).as("bucket_s"),
        col("n_live"), col("tvd_num"),
        expr(s"(tvd_num * 1000) div (2 * $nRef * n_live)").as("tvd_permille"))
  }

  /** Stream-static enrichment: join each micro-batch against a slowly
    * changing dimension. The static side is broadcast (re-planned per
    * batch, so an updated dim TABLE is re-read at its next batch) — the
    * streaming side never shuffles for the join, which is the only
    * per-event cost that matters at 100 TB/day.
    */
  def enrichAgainstDim(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  case class UserEvent(user_id: Long, value: Double)
  case class UserTotals(user_id: Long, n_events: Long, total: Double)

  /** Running per-user (count, sum) maintained across micro-batches via
    * `mapGroupsWithState` — the extension point for state machines the
    * built-in aggregations can't express (the reference's per-source
    * counters, main.py:432,657, generalized to keyed streaming state).
    */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserTotals, UserTotals](GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          val batch = it.toSeq
          val next = UserTotals(uid, prev.n_events + batch.size,
            prev.total + batch.map(_.value).sum)
          state.update(next)
          next
      }
  }

  /** Streaming exact dedup by content fingerprint with BOUNDED state:
    * `dropDuplicatesWithinWatermark` keeps a fingerprint only until the
    * watermark passes its event time, so state is O(dedup-window volume),
    * not O(stream history) — the streaming form of the batch `dedup_exact`
    * operator (which a plain streaming `dropDuplicates` cannot provide at
    * 100 TB/day: its state never evicts). The fingerprint is md5(text), so
    * the shuffle key is 16 bytes, never the document.
    */
  def dedupWithinWatermark(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")

  /** Watermarked per-window heavy hitters via the native SpaceSaving
    * aggregate ([[graft.expressions.HeavyHitters]]): top words per
    * 1-minute window with at most `m` bounded-error counters of state per
    * window — the streaming top-k that a (window, word) keyed aggregation
    * cannot provide at 100 TB/day (its state grows with the live
    * vocabulary; this grows with m). The sketch's partial buffer
    * round-trips through the state store between micro-batches (its
    * serialize/deserialize is the state format), merges on arrival of
    * each batch's partials, and the window's FINAL counters emit once
    * when the watermark passes — exact whenever the window's distinct
    * words fit m; otherwise the cross-batch merges put counts in the
    * TWO-SIDED |cnt - true| <= N/m band with > N/m items guaranteed
    * present (the merged-summary contract HeavyHittersProps pinned).
    */
  def windowedHeavyHitters(
      docs: DataFrame, m: Int = 64, watermark: String = "2 minutes"): DataFrame = {
    graft.expressions.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col("ts"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 minute"))
      .agg(call_function("graft_heavy_hitters", col("w"), lit(m)).as("hh"))
      .select(unix_timestamp(col("window.start")).as("bucket_s"),
        explode(col("hh")).as("e"))
      .select(col("bucket_s"), col("e.item").as("word"),
        col("e.cnt").as("cnt"), col("e.err").as("err"))
  }

  /** Watermarked per-window streaming QUANTILES via the native q-digest
    * aggregate ([[graft.expressions.QDigest]]) — the latency-percentile /
    * size-distribution dashboard query: per event-time window, quartile
    * estimates of a value stream. State per window is the O(k·bits)
    * dyadic counter map, NOT the value multiset — the exact form
    * (sorted per-window values) grows with event volume; the sketch
    * round-trips the state store between micro-batches (its
    * serialize/deserialize IS the state format, as with
    * [[windowedHeavyHitters]]'s SpaceSaving buffer) and finalizes when
    * the watermark passes. Rank error ≤ bits/k · n per window.
    */
  def windowedQuantiles(
      values: DataFrame, bits: Int = 16, k: Int = 256,
      watermark: String = "2 minutes"): DataFrame = {
    graft.expressions.GraftFunctions.register(values.sparkSession)
    values
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 minute"))
      .agg(call_function("graft_qdigest", col("v"), lit(bits), lit(k)).as("q"),
        count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("bucket_s"),
        col("q")(0).as("q25"), col("q")(1).as("q50"), col("q")(2).as("q75"),
        col("n"))
  }

  /** Continuous Count-Min maintenance: the depth-4 × `width` matrix of
    * [[graft.ops.CountMin]] kept live over an UNBOUNDED key stream with
    * NO watermark — the sketch is the point: state is the d·w cell
    * counters forever, never the key set, so this is the streaming
    * frequency summary that works when `runningUserTotals`-style per-key
    * state would grow without bound. Cells are additive, so the streamed
    * matrix equals the batch matrix over the same rows (spec-pinned) and
    * two matrices merge cell-wise. Emit in update/complete mode;
    * estimates read `min` over a key's probed cells downstream.
    */
  def streamingCountMin(ids: DataFrame, width: Int = 32): DataFrame =
    ids
      .select(explode(graft.ops.CountMin.probeArray(col("user_id"), width)).as("p"))
      .groupBy(col("p.r").as("r"), col("p.w").as("w"))
      .agg(count(lit(1)).as("cell_n"))

  /** Stream-stream INTERVAL join: each click pairs with the view it
    * followed within `horizonSec` for the same user — the canonical
    * attribution join. BOTH sides are watermarked and the join condition
    * bounds the event-time distance, so each side's state store holds only
    * watermark+horizon of history — the condition every 100 TB/day
    * stream-stream join must satisfy (an unbounded-time equi-join's state
    * never evicts, and Spark rejects it in append mode for exactly that
    * reason). Inner join: a click emits once per qualifying view, final
    * when the watermark passes — no retraction.
    *
    * @param views  (user_id, view_ts) impression stream
    * @param clicks (user_id, click_ts) click stream
    */
  def clickAttribution(
      views: DataFrame, clicks: DataFrame,
      horizonSec: Long = 30L, watermark: String = "1 minute"): DataFrame = {
    val v = views.withWatermark("view_ts", watermark)
      .select(col("user_id").as("v_user"), col("view_ts"))
    val c = clicks.withWatermark("click_ts", watermark)
      .select(col("user_id").as("c_user"), col("click_ts"))
    v.join(c,
      col("v_user") === col("c_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $horizonSec SECONDS"))
      .select(col("v_user").as("user_id"),
        unix_timestamp(col("view_ts")).as("view_s"),
        unix_timestamp(col("click_ts")).as("click_s"))
  }

  case class Click(user_id: Long, ts: java.sql.Timestamp)
  case class SessionState(start_ms: Long, last_ms: Long, n: Long)
  case class SessionOut(user_id: Long, start_s: Long, end_s: Long, n_events: Long)

  /** Streaming sessionization via `flatMapGroupsWithState` + event-time
    * timeout — the 0..N-outputs-per-group extension point the batch
    * `sessionize` query mirrors. A user's session EMITS exactly when the
    * watermark passes `last_event + gap` (the state times out), so output
    * is append-mode-final and per-user state is evicted on close — bounded
    * state at any event volume, like the watermarked window aggregates.
    *
    * In-batch events more than `gap` apart split eagerly (only the trailing
    * session stays in state); cross-batch splits close via the timeout.
    */
  def streamingSessions(
      clicks: Dataset[Click], gapSec: Long = 30L,
      watermark: String = "2 minutes"): Dataset[SessionOut] = {
    import clicks.sparkSession.implicits._
    val gapMs = gapSec * 1000L
    clicks.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Click], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(uid, s.start_ms / 1000, s.last_ms / 1000, s.n))
          } else {
            val times = it.map(_.ts.getTime).toArray.sorted
            val closed = Seq.newBuilder[SessionOut]
            var cur = state.getOption
            times.foreach { t =>
              cur match {
                case Some(s) if t - s.last_ms <= gapMs =>
                  cur = Some(SessionState(s.start_ms, math.max(s.last_ms, t), s.n + 1))
                case Some(s) => // in-batch gap: close the old session eagerly
                  closed += SessionOut(uid, s.start_ms / 1000, s.last_ms / 1000, s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last_ms + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  case class DayCount(event_type: String, day: Long, cnt: Long)
  case class TrailingDays(days: Seq[Long], cnts: Seq[Long])
  case class AnomalyVerdict(event_type: String, day: Long, cnt: Long,
                            s7: Long, q7: Long, is_spike: Boolean)

  /** Streaming twin of the batch `events_anomaly` query: per event type,
    * each arriving day-count is tested against the trailing 7 OBSERVED
    * days with the identical exact integer z-test,
    * (7c - S)² > 4(7Q - S²) — same verdicts as the batch form on the same
    * series (proven in spec). Upstream is a watermarked tumbling-day
    * aggregation (tumblingCounts' shape), so day-counts arrive closed and
    * in order per key once the watermark passes.
    *
    * Scale design: state per key is EXACTLY the last 7 (day, count) pairs —
    * bounded regardless of stream history; verdicts emit only for days with
    * a full 7-day history, matching the batch query's n7 = 7 gate. Keys
    * (event types) partition the state store; no driver accumulation.
    */
  def streamingAnomaly(dayCounts: Dataset[DayCount]): Dataset[AnomalyVerdict] = {
    import dayCounts.sparkSession.implicits._
    dayCounts.groupByKey(_.event_type)
      .flatMapGroupsWithState[TrailingDays, AnomalyVerdict](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (etype: String, it: Iterator[DayCount], state: GroupState[TrailingDays]) =>
          var st = state.getOption.getOrElse(TrailingDays(Nil, Nil))
          val out = Seq.newBuilder[AnomalyVerdict]
          it.toSeq.sortBy(_.day).foreach { dc =>
            if (st.days.size == 7) {
              val s = st.cnts.sum
              val q = st.cnts.map(c => c * c).sum
              val d = 7 * dc.cnt - s
              out += AnomalyVerdict(etype, dc.day, dc.cnt, s, q,
                d > 0 && d * d > 4 * (7 * q - s * s))
            }
            st = TrailingDays((st.days :+ dc.day).takeRight(7),
              (st.cnts :+ dc.cnt).takeRight(7))
          }
          state.update(st)
          out.result().iterator
      }
  }
}
