package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Tables.{t, Pack, Q}

/** Round-8 surface extensions: temporal / change-data analytics — anomaly
  * detection on daily series, gap-fill (fill-forward), SCD type-2 history
  * construction, CDC keep-latest upsert merge, and an interval-overlap
  * join expressed as a bin equi-join (the scale-honest alternative to a
  * nested-loop range join).
  *
  * Determinism rules (memory: cross-engine oracle parity):
  *   - event time is integer epoch seconds (`unix_timestamp` truncation vs
  *     DuckDB `floor(epoch(ts))::BIGINT`); day/hour ids are integer
  *     divisions of non-negative operands;
  *   - money/value quantization is `round(x * 100)` on the SAME double in
  *     both engines (one product + one half-away round — bit-identical);
  *   - the anomaly test is pure integer algebra: z > 2 rewritten as
  *     (7c - S)^2 > 4(7Q - S^2) — no float mean/stddev ever compared;
  *   - window orders use unique keys (event_id) or total orders (es,
  *     event_id) so ties cannot arise.
  */
object TemporalOps extends Pack {

  /** Per-user sessions (>1h gap starts a new one) as [start, end] epoch-sec
    * intervals. Shared by join_interval; same gaps-and-islands kernel as
    * the sessionize query, aggregated to one row per session.
    */
  private[ops] def sessions(s: org.apache.spark.sql.SparkSession, d: String) = {
    val byU = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
    val run = byU.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, d, "events")
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("es"))
      .withColumn("prev", lag(col("es"), 1).over(byU))
      .withColumn("is_new",
        when(col("prev").isNull || col("es") - col("prev") > 3600, 1).otherwise(0))
      .withColumn("sid", sum(col("is_new")).over(run))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("es")).as("s_start"), max(col("es")).as("s_end"))
  }

  val queries: Map[String, Q] = Map(

    "events_anomaly" -> ((s, d) => {
      // spike detection on the daily event-count series, per event type:
      // flag days whose count exceeds the trailing-7-observed-day mean by
      // more than 2 sigma. The z-test is rewritten in integers so both
      // engines decide from identical exact arithmetic:
      //   (c - S/7)^2 > 4 * (7Q - S^2)/49   <=>   (7c - S)^2 > 4(7Q - S^2)
      // Scale shape: one (day, type) hash agg (map-side combined) collapses
      // event volume to a bounded calendar x type series; the trailing
      // window then runs on that tiny frame — the window never sees rows
      // proportional to event volume.
      val daily = t(s, d, "events")
        .select(expr("unix_timestamp(ts) div 86400").as("ed"), col("event_type"))
        .groupBy(col("ed"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("ed")).rowsBetween(-7, -1)
      daily
        .withColumn("n7", count(lit(1)).over(w))
        .withColumn("s7", sum(col("cnt")).over(w))
        .withColumn("q7", sum(col("cnt") * col("cnt")).over(w))
        .filter(col("n7") === 7)
        .withColumn("is_spike",
          (lit(7) * col("cnt") - col("s7") > 0) &&
            ((lit(7) * col("cnt") - col("s7")) * (lit(7) * col("cnt") - col("s7")) >
              lit(4) * (lit(7) * col("q7") - col("s7") * col("s7"))))
        .select(col("ed"), col("event_type"), col("cnt"), col("s7"), col("q7"), col("is_spike"))
        .orderBy("event_type", "ed")
    }),

    "window_fill_forward" -> ((s, d) => {
      // gap-fill: carry the last purchase amount forward over each user's
      // event stream (the telemetry "sample-and-hold" op). last(ignoreNulls)
      // over an unbounded-preceding frame is one pass per partition — no
      // self-join, no recursive fill. Amounts are quantized to integer
      // cents (same double product + half-away round in both engines).
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .withColumn("pv",
          when(col("event_type") === "purchase",
            round(col("value") * 100).cast("long")))
        .select(col("event_id"), col("user_id"),
          last(col("pv"), ignoreNulls = true).over(w).as("last_purchase_cents"))
        .orderBy("event_id")
    }),

    "scd2_history" -> ((s, d) => {
      // slowly-changing-dimension type-2 build from a change log: per user,
      // keep only rows where the tracked attribute (value tier) CHANGES,
      // then close each version with the next change's timestamp. Two
      // window passes over the same (user_id | es, event_id) order — one
      // shuffle; the change filter drops rows before the second window
      // ranks them. Tier = floor(value/100): one double division, floored
      // identically by both engines.
      val byU = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("es"),
          floor(col("value") / 100).cast("long").as("tier"))
      ev.withColumn("prev_tier", lag(col("tier"), 1).over(byU))
        .filter(col("prev_tier").isNull || col("tier") =!= col("prev_tier"))
        .withColumn("valid_to", lead(col("es"), 1).over(byU) - 1)
        .select(col("user_id"), col("event_id"), col("tier"),
          col("es").as("valid_from"), col("valid_to"))
        .orderBy("user_id", "valid_from", "event_id")
    }),

    "join_scd2_pit" -> ((s, d) => {
      // POINT-IN-TIME join against the SCD2 dimension — the canonical
      // warehouse question scd2_history exists to answer: each purchase
      // attributed to the tier version valid AT its timestamp (not the
      // current one — that's the lookahead bug PIT joins exist to
      // prevent). Implemented as the as-of carry-forward, NOT an
      // interval join: dimension-version rows and fact rows union into
      // one per-user stream ordered by (es, event_id, is_dim DESC) —
      // dim-before-fact on ties, so a purchase that itself changes the
      // tier sees its own change — and one IGNORE NULLS carry paints
      // every fact with the version in force. ONE user_id shuffle total;
      // at 100 TB this replaces the unbounded interval self-join with a
      // linear merge per key, the join_asof discipline.
      val byU0 = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("es"), col("event_type"), col("value"),
          floor(col("value") / 100).cast("long").as("tier0"))
      val dim = ev
        .withColumn("prev", lag(col("tier0"), 1).over(byU0))
        .filter(col("prev").isNull || col("tier0") =!= col("prev"))
        .select(col("user_id"), col("es"), col("event_id"),
          col("tier0").as("tier"), lit(1).as("is_dim"),
          lit(null).cast("long").as("cents"))
      val fact = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("es"), col("event_id"),
          lit(null).cast("long").as("tier"), lit(0).as("is_dim"),
          round(col("value") * 100).cast("long").as("cents"))
      val carry = Window.partitionBy(col("user_id"))
        .orderBy(col("es"), col("event_id"), col("is_dim").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dim.unionByName(fact)
        .withColumn("pit_tier", last(col("tier"), ignoreNulls = true).over(carry))
        .filter(col("is_dim") === 0)
        .groupBy(col("pit_tier").as("tier"))
        .agg(count(lit(1)).as("n_purchases"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("cents")).as("cents_sum"))
        .orderBy("tier")
    }),

    "events_ab_test" -> ((s, d) => {
      // Deterministic A/B evaluation: assignment is the content-free key
      // hash discipline (user_id parity — stable under reruns and
      // backfills, the prep_split rule), metric is purchase conversion.
      // One wide row: per-variant users/converters/revenue, conversion
      // and lift in exact integer permille (the lift numerator is kept
      // non-negative before the shift so trunc-vs-floor division can
      // never diverge), and the pooled two-proportion z-score under the
      // agg_corr float discipline — exact BIGINT counts into three IEEE
      // sqrts, one multiply, one divide, identically ordered in both
      // engines; degenerate pools (zero or all converters) yield NULL.
      // Scale shape: one map-side-combinable per-user aggregate, then a
      // single global conditional rollup — no shuffle after the first.
      val ul = t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"),
          sum(when(col("event_type") === "purchase",
            round(col("value") * 100).cast("long")).otherwise(0L)).as("cents"))
        .withColumn("variant", pmod(col("user_id"), lit(2)))
      ul.agg(
          sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("variant") === 0, col("conv")).otherwise(0L)).as("c0"),
          sum(when(col("variant") === 0, col("cents")).otherwise(0L)).as("cents0"),
          sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("variant") === 1, col("conv")).otherwise(0L)).as("c1"),
          sum(when(col("variant") === 1, col("cents")).otherwise(0L)).as("cents1"))
        .withColumn("nn", col("n0") + col("n1"))
        .withColumn("cc", col("c0") + col("c1"))
        .select(col("n0"), col("c0"), col("cents0"),
          col("n1"), col("c1"), col("cents1"),
          expr("(c0 * 1000) div n0").as("conv0_permille"),
          expr("(c1 * 1000) div n1").as("conv1_permille"),
          when(col("c0") * col("n1") > 0,
            expr("(c1 * n0 * 1000) div (c0 * n1)") - 1000).as("lift_permille"),
          when(col("cc") > 0 && col("cc") < col("nn"),
            (col("c1") * col("n0") - col("c0") * col("n1")).cast("double")
              * sqrt(col("nn").cast("double"))
              / (sqrt((col("cc") * (col("nn") - col("cc"))).cast("double"))
                * sqrt((col("n0") * col("n1")).cast("double"))))
            .as("z_score"))
    }),

    "merge_upsert" -> ((s, d) => {
      // CDC upsert (MERGE): a base table absorbs a delta of updates and
      // inserts; latest version per key wins. The delta here is derived
      // deterministically from orders (keys %7 get a 10% price bump; keys
      // %13 arrive as new +10M keys) so both engines see the same merge.
      // Scale shape: union is free (no shuffle); the keep-latest is a
      // WindowGroupLimit top-1 per key — partial per-partition heaps mean
      // at most one row per key per input partition reaches the shuffle,
      // exactly the dedup_latest compaction shape.
      val base = t(s, d, "orders").select(
        col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        lit(0L).as("version"))
      val upd = base.filter(col("k") % 7 === 0)
        .select(col("k"), lit("U").as("st"),
          expr("(cents * 11) div 10").as("cents"), lit(1L).as("version"))
      val ins = base.filter(col("k") % 13 === 0)
        .select((col("k") + 10000000L).as("k"), lit("I").as("st"),
          col("cents"), lit(1L).as("version"))
      val w = Window.partitionBy(col("k")).orderBy(col("version").desc)
      base.unionByName(upd).unionByName(ins)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .withColumn("op",
          when(col("k") >= 10000000L, "inserted")
            .when(col("version") === 1, "updated")
            .otherwise("unchanged"))
        .select(col("k").as("o_orderkey"), col("st").as("status"),
          col("cents").as("price_cents"), col("version"), col("op"))
        .orderBy("o_orderkey")
    }),

    "merge_ivm" -> ((s, d) => {
      // INCREMENTAL VIEW MAINTENANCE: a per-customer (count, sum)
      // aggregate view absorbs a ±multiplicity delta — retractions of
      // existing rows (mult −1) and insertions (mult +1, including rows
      // for keys the view has never seen) — WITHOUT re-touching base
      // rows: the maintained view merges with the AGGREGATED delta in
      // one full-outer join, groups whose count reaches zero drop out.
      // The classic delta rule dV = γ(Δ) applied to a distributive
      // aggregate; the oracle recomputes from the modified base, so the
      // merge arithmetic (coalesce seams, zero-count deletion, brand-new
      // keys) is all hash-gated. Delta derived deterministically from
      // orders: %9 keys retract, %11 keys insert a half-price echo
      // (%33 of those under a brand-new +1e6 customer).
      //
      // Scale shape: the base view is maintained state (at rest it's a
      // table, not a recompute); per refresh only |delta| rows shuffle
      // into one pre-aggregate + one key-partitioned outer join — the
      // whole point of IVM at 100 TB is that refresh cost tracks the
      // delta, never the corpus.
      val base = t(s, d, "orders").select(col("o_custkey").as("k"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderkey"))
      val view = base.groupBy(col("k"))
        .agg(count(lit(1)).as("n0"), sum("cents").as("s0"))
      val delta = base.filter(col("o_orderkey") % 9 === 0)
        .select(col("k"), col("cents"), lit(-1L).as("mult"))
        .unionByName(base.filter(col("o_orderkey") % 11 === 0)
          .select(
            when(col("o_orderkey") % 33 === 0, col("k") + 1000000L)
              .otherwise(col("k")).as("k"),
            expr("cents div 2 + 50").as("cents"), lit(1L).as("mult")))
      val dAgg = delta.groupBy(col("k"))
        .agg(sum("mult").as("dn"), sum(expr("mult * cents")).as("ds"))
      view.join(dAgg, Seq("k"), "full_outer")
        .select(col("k").as("o_custkey"),
          (coalesce(col("n0"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_orders"),
          (coalesce(col("s0"), lit(0L)) + coalesce(col("ds"), lit(0L))).as("cents_sum"),
          when(col("dn").isNotNull, 1L).otherwise(0L).as("touched"))
        .filter(col("n_orders") > 0)
        .orderBy("o_custkey")
    }),

    "events_cusum" -> ((s, d) => {
      // CUSUM change-point detection over per-type daily volumes, fully
      // relational and integer-exact: the textbook recursion
      // S_d = max(0, S_{d-1} + (x_d − k)) is the prefix identity
      // S_d = P_d − min(0, min_{j<=d} P_j) with P the running sum of
      // deviations — so the "recursive" detector is two ordinary
      // cumulative windows, no iteration, no fold. Deviations are scaled
      // by the day count (dev = x·nd − total) to keep the drift term k =
      // mean exact without division. Alarm threshold is self-normalizing
      // (S >= 3/4 of the type's own max S) so both alarm classes appear
      // at every scale factor. Per type: days, alarms, peak S, first
      // alarm day.
      //
      // Scale shape: ONE hash agg collapses event volume to (type, day)
      // cells before any window; every window partitions by type over
      // calendar-bounded rows. The sequential dependence lives entirely
      // in per-type cumulative windows — the spillable WindowExec path,
      // never a driver fold.
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          expr("unix_timestamp(ts) div 86400").as("day"))
        .agg(count(lit(1)).as("x"))
      val byType = Window.partitionBy(col("event_type"))
      val cum = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("total", sum("x").over(byType))
        .withColumn("nd", count(lit(1)).over(byType))
        .withColumn("p", sum(col("x") * col("nd") - col("total")).over(cum))
        .withColumn("s_val", col("p") - least(lit(0L), min("p").over(cum)))
        .withColumn("peak", max("s_val").over(byType))
        .withColumn("alarm",
          (col("peak") > 0 && col("s_val") * 4 >= col("peak") * 3).cast("long"))
        .groupBy(col("event_type"))
        .agg(max("nd").as("n_days"), sum("alarm").as("n_alarms"),
          max("s_val").as("max_s"),
          coalesce(min(when(col("alarm") === 1L, col("day"))), lit(-1L))
            .as("first_alarm_day"))
        .orderBy("event_type")
    }),

    "events_forecast" -> ((s, d) => {
      // naive-baseline forecast audit: predict each day's count as the
      // trailing-7-observed-day mean, report per-type absolute-error
      // permille (the denominator every fancier model must beat). Rides
      // the events_anomaly daily frame; all arithmetic is exact integers —
      // the prediction is an integer division, the error a subtraction.
      val daily = t(s, d, "events")
        .select(expr("unix_timestamp(ts) div 86400").as("ed"), col("event_type"))
        .groupBy(col("ed"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("ed")).rowsBetween(-7, -1)
      daily
        .withColumn("n7", count(lit(1)).over(w))
        .withColumn("s7", sum(col("cnt")).over(w))
        .filter(col("n7") === 7)
        .withColumn("pred", expr("s7 div 7"))
        .withColumn("err", abs(col("cnt") - col("pred")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"), sum(col("err")).as("sum_abs_err"),
          sum(col("cnt")).as("sum_cnt"))
        .withColumn("mae_permille", expr("(sum_abs_err * 1000) div sum_cnt"))
        .orderBy("event_type")
    }),

    "events_gaps" -> ((s, d) => {
      // inter-arrival profile: histogram of per-user gaps between
      // consecutive events in 10-minute buckets — the input statistic for
      // choosing session timeouts and stream watermarks. One lag window on
      // the user_id shuffle + one tiny hash agg on the bucket id.
      val byU = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("es"))
        .withColumn("gap", col("es") - lag(col("es"), 1).over(byU))
        .filter(col("gap").isNotNull)
        .groupBy(expr("gap div 600").as("bucket"))
        .agg(count(lit(1)).as("n_gaps"), min(col("gap")).as("min_gap"),
          max(col("gap")).as("max_gap"))
        .orderBy("bucket")
    }),

    "events_bursts" -> ((s, d) => {
      // burst detection by gaps-and-islands: hourly counts per event
      // type, hours at >= 6 events are "hot", CONSECUTIVE hot hours
      // merge into one burst (island id = hour − row_number, the
      // classic trick — no self-join, no iteration). Per type: burst
      // count, longest run, peak hour, total burst volume. Scale shape:
      // the raw stream collapses to (type, hour) counts in one map-side
      // combined agg — everything after operates on bounded calendar
      // cardinality, so the window's per-type partition is hours, not
      // events.
      val byType = Window.partitionBy(col("event_type")).orderBy(col("hh"))
      t(s, d, "events")
        .groupBy(col("event_type"), expr("unix_timestamp(ts) div 3600").as("hh"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 6)
        .withColumn("grp", col("hh") - row_number().over(byType))
        .groupBy(col("event_type"), col("grp"))
        .agg(count(lit(1)).as("len"), max(col("n")).as("peak"), sum(col("n")).as("vol"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_bursts"), max(col("len")).as("max_len"),
          max(col("peak")).as("peak_n"), sum(col("vol")).as("burst_events"))
        .orderBy("event_type")
    }),

    "join_temporal" -> ((s, d) => {
      // point-in-time (dim-snapshot) join: each purchase picks up the
      // user's value-tier AS OF the purchase instant, against the SCD2-style
      // change log scd2_history builds. No range join: change rows (kind 0)
      // and fact rows (kind 1) UNION into one stream, a carry-forward
      // last(ignoreNulls) window assigns the in-effect tier, and a filter
      // keeps the facts — ONE user_id shuffle total. kind breaks the tie so
      // an event that is itself a change point sees its own new tier,
      // matching the oracle's (es, event_id) <= (fact es, id) predicate.
      val ev = t(s, d, "events").select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"),
        floor(col("value") / 100).cast("long").as("tier"),
        col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      val chw = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
      val changes = ev
        .withColumn("prev_tier", lag(col("tier"), 1).over(chw))
        .filter(col("prev_tier").isNull || col("tier") =!= col("prev_tier"))
        .select(col("user_id"), col("es"), col("event_id"), lit(0).as("kind"),
          col("tier"), lit(null).cast("long").as("cents"))
      val facts = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("es"), col("event_id"), lit(1).as("kind"),
          lit(null).cast("long").as("tier"), col("cents"))
      val carry = Window.partitionBy(col("user_id"))
        .orderBy(col("es"), col("event_id"), col("kind"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      changes.unionByName(facts)
        .withColumn("tier_at", last(col("tier"), ignoreNulls = true).over(carry))
        .filter(col("kind") === 1)
        .select(col("user_id"), col("event_id"), col("es"), col("cents"), col("tier_at"))
        .orderBy("event_id")
    }),

    "events_rfm" -> ((s, d) => {
      // RFM segmentation: per purchasing user, recency (days since last
      // purchase vs corpus max), frequency, monetary (integer cents), each
      // cut into quintiles. The oracle says ntile(5) — but ntile over an
      // empty partitionBy funnels the whole user dimension (which GROWS
      // with the corpus) through one partition. Instead: exact global rank
      // per dimension via DistributedRank (range Exchange + per-partition
      // offsets — the mergeable shape), then the exact ntile bucket rule
      // applied as per-row integer arithmetic with the driver-known n.
      // Unique user_id tiebreaks make ranks total, so the tile assignment
      // is bit-identical to the oracle's ntile while the plan never has a
      // single-partition Exchange.
      val p = t(s, d, "events").filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
          round(col("value") * 100).cast("long").as("cents"))
      val per = p.groupBy(col("user_id"))
        .agg(max(col("es")).as("last_es"), count(lit(1)).as("freq"),
          sum(col("cents")).as("monetary"))
      // corpus max: scalar aggregate of the per-user frame, broadcast back
      // (1-row build side — the standard scalar-subquery shape)
      val mx = per.agg(max(col("last_es")).as("gmax"))
      val base = per.crossJoin(broadcast(mx))
        .withColumn("rec_days", expr("(gmax - last_es) div 86400"))
        .drop("gmax")
      // three exact-rank passes, chained so each carries the prior tiles —
      // narrow all-numeric schema, no join-back needed
      val r1 = DistributedRank.withGlobalRank(base,
        Seq(col("rec_days"), col("user_id")), "__rr")
      val d1 = r1.df.withColumn("r_tile",
        DistributedRank.exactNtile(col("__rr"), r1.n, 5)).drop("__rr")
      val r2 = DistributedRank.withGlobalRank(d1,
        Seq(col("freq").desc, col("user_id")), "__rf")
      r1.release() // r2's offset pass fully consumed r1's cache
      val d2 = r2.df.withColumn("f_tile",
        DistributedRank.exactNtile(col("__rf"), r2.n, 5)).drop("__rf")
      val r3 = DistributedRank.withGlobalRank(d2,
        Seq(col("monetary").desc, col("user_id")), "__rm")
      r2.release() // likewise; r3's cache is released by the harness post-action
      r3.df.withColumn("m_tile",
          DistributedRank.exactNtile(col("__rm"), r3.n, 5)).drop("__rm")
        .withColumn("rfm", col("r_tile") * 100 + col("f_tile") * 10 + col("m_tile"))
        .select(col("user_id"), col("rec_days"), col("freq"), col("monetary"),
          col("r_tile"), col("f_tile"), col("m_tile"), col("rfm"))
        .orderBy("user_id")
    }),

    "join_interval" -> ((s, d) => {
      // interval-overlap join without a nested loop: count concurrent
      // session pairs (different users, overlapping [start,end]) per day.
      // Each session EXPLODES into the hour bins it covers; candidates come
      // from an equi-join on the bin id, the exact overlap predicate then
      // filters within the bin, and a distinct collapses pairs that share
      // several bins. Scale shape: candidate volume is (sessions per hour)^2
      // per bin — local density, never |sessions|^2; the bin id is the only
      // shuffle key. The DuckDB oracle runs the same semantics as a direct
      // quadratic range join (its IEJoin), independent of the binning.
      val sess = sessions(s, d).persist() // both sides of the self-join
      val binned = sess.select(col("user_id"), col("s_start"), col("s_end"),
        explode(expr("sequence(s_start div 3600, s_end div 3600)")).as("hb"))
      val a = binned.select(col("hb").as("ha"), col("user_id").as("ua"),
        col("s_start").as("sa"), col("s_end").as("ea"))
      val b = binned.select(col("hb").as("hb2"), col("user_id").as("ub"),
        col("s_start").as("sb"), col("s_end").as("eb"))
      a.join(b, col("ha") === col("hb2") && col("ua") < col("ub") &&
          col("sa") <= col("eb") && col("sb") <= col("ea"))
        .select(col("ua"), col("sa"), col("ub"), col("sb"),
          greatest(col("sa"), col("sb")).as("ov_start"))
        .distinct()
        .groupBy(expr("ov_start div 86400").as("day"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("day")
    }),

    "events_autocorr" -> ((s, d) => {
      // Lag-k autocorrelation DIAGNOSTIC of the daily count series
      // (lags 1..3): is yesterday predictive of today? Reported as the
      // exact integer moment sums and the factored correlation terms
      // num = n·Σxy − Σx·Σy, den_x = n·Σxx − (Σx)², den_y = n·Σyy −
      // (Σy)² — r² = num²/(den_x·den_y) but the sqrt/division stays
      // with the CONSUMER (the house rule: no float accumulation under
      // the hash gate; the factored integers carry everything). Bigint
      // bound: safe to ~1e9 events/day/type. Scale shape: one daily
      // agg shuffle, one event_type window, one map-side-combinable
      // agg per lag over the calendar-bounded frame.
      val daily = t(s, d, "events")
        .select(expr("unix_timestamp(ts) div 86400").as("ed"), col("event_type"))
        .groupBy(col("ed"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("ed"))
      val lagged = daily
        .withColumn("l1", lag(col("cnt"), 1).over(w))
        .withColumn("l2", lag(col("cnt"), 2).over(w))
        .withColumn("l3", lag(col("cnt"), 3).over(w))
      def one(lagN: Int) = lagged.filter(col(s"l$lagN").isNotNull)
        .select(col("event_type"), col("cnt").as("x"), col(s"l$lagN").as("y"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .withColumn("lag", lit(lagN.toLong))
      one(1).unionByName(one(2)).unionByName(one(3))
        .withColumn("num", expr("n * sxy - sx * sy"))
        .withColumn("den_x", expr("n * sxx - sx * sx"))
        .withColumn("den_y", expr("n * syy - sy * sy"))
        .select(col("event_type"), col("lag"), col("n"),
          col("num"), col("den_x"), col("den_y"))
        .orderBy("event_type", "lag")
    }),

    "window_drawdown" -> ((s, d) => {
      // Maximum drawdown — the risk metric over a per-user value series:
      // running peak (cumulative max over the (es, event_id) total
      // order), drawdown = value − peak (≤ 0), and the per-user worst
      // trough with its timestamp. All integer cents, and the trough
      // pick rides a value-total ordering key so peak/trough ties can't
      // flip the readout between engines. Scale shape: ONE user_id
      // shuffle shared by the window sort and the final agg.
      val ev = t(s, d, "events").select(col("user_id"),
        unix_timestamp(col("ts")).as("es"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("es"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("runmax", max(col("cents")).over(w))
        .withColumn("dd", col("cents") - col("runmax"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), max(col("cents")).as("max_cents"),
          min(col("dd")).as("max_drawdown_cents"),
          min_by(col("es"), struct(col("dd"), col("es"), col("event_id"))).as("trough_es"))
        .orderBy("user_id")
    }),

    "events_holt" -> ((s, d) => {
      // Holt DOUBLE-exponential smoothing (level + trend) over the daily
      // count series — the first RECURSIVE forecaster next to the
      // moving-average baseline (events_forecast): each day folds into a
      // (level, trend) state, so a steadily growing series extrapolates
      // its slope where the trailing mean lags it. α = β = 1/2 in
      // milli-unit EXACT integer arithmetic (truncating div on both
      // engines — verified on negatives, trends go negative):
      //   l_t = (1000·y_t + l_{t-1} + b_{t-1}) div 2
      //   b_t = (b_{t-1} + l_t - l_{t-1}) div 2,  l_0 = 1000·y_0, b_0 = 0.
      // The recurrence is inherently sequential, so it folds IN-ROW: one
      // aggregate() lambda over the per-type day array (bounded by the
      // CALENDAR — ~365 structs/group/year — not by corpus size; the
      // oracle replays it as a recursive CTE). Scale shape: one daily
      // count shuffle, one per-type collect of calendar-bounded arrays,
      // zero further exchanges.
      val daily = t(s, d, "events")
        .select(expr("unix_timestamp(ts) div 86400").as("ed"), col("event_type"))
        .groupBy(col("ed"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      daily.groupBy(col("event_type"))
        .agg(sort_array(collect_list(struct(col("ed"), col("cnt")))).as("days"))
        .withColumn("st", expr(
          """aggregate(
            |  slice(days, 2, size(days) - 1),
            |  named_struct('l', days[0].cnt * 1000L, 'b', 0L),
            |  (acc, x) -> named_struct(
            |    'l', (1000L * x.cnt + acc.l + acc.b) div 2,
            |    'b', (acc.b + ((1000L * x.cnt + acc.l + acc.b) div 2) - acc.l) div 2))""".stripMargin))
        .select(col("event_type"), size(col("days")).cast("long").as("n_days"),
          col("st.l").as("level_milli"), col("st.b").as("trend_milli"),
          (col("st.l") + col("st.b")).as("forecast_next_milli"))
        .orderBy("event_type")
    }),

    "window_ohlc" -> ((s, d) => {
      // OHLC candle downsampling — the standard time-series compaction
      // (per user per hour: first/max/min/last of the value stream) that
      // turns a raw event stream into fixed-rate bars for dashboards and
      // feature windows. Exactness: open/high/low/close are SELECTIONS
      // (min_by/max/min/max_by — no float arithmetic at all), so the
      // doubles hash-match across engines; order within a bar is the
      // house (es, event_id) total order (DuckDB: first/last with
      // ORDER BY in the aggregate). Scale shape: ONE hash shuffle on
      // (user_id, hour), all five aggregates map-side combinable —
      // min_by/max_by carry only their (value, key) champion through the
      // partial aggregation, never the bar's row set.
      t(s, d, "events")
        .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
          col("event_id"), col("value"))
        .withColumn("hh", expr("es div 3600"))
        .groupBy(col("user_id"), col("hh"))
        .agg(
          min_by(col("value"), struct(col("es"), col("event_id"))).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max_by(col("value"), struct(col("es"), col("event_id"))).as("close"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id", "hh")
    }),

    "window_rolling_corr" -> ((s, d) => {
      // 7-day ROLLING Pearson correlation between daily event volume and
      // daily active users, per event type — the drift monitor that says
      // whether growth is new users or heavier use. agg_corr's exact-
      // integer-moment discipline applied over a moving frame: the five
      // moment SUMS accumulate in BIGINT inside the window, and the only
      // float ops are two correctly-rounded IEEE sqrts, one multiply and
      // one divide on identical integers — bit-identical cross-engine.
      // Degenerate frames (n < 3 or zero variance) yield NULL, not NaN.
      // Scale shape: one (event_type, day) pre-aggregate collapses the
      // event volume to a bounded daily series (map-side combinable
      // count; the exact distinct swaps for agg_bitmap's mergeable form
      // at larger id domains), then ONE partitioned window pass computes
      // all five frame sums — no self-join, no per-frame re-scan.
      val daily = t(s, d, "events")
        .select(expr("unix_timestamp(ts) div 86400").as("day"),
          col("event_type"), col("user_id"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("x"), countDistinct(col("user_id")).as("y"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-6, Window.currentRow)
      daily.select(col("event_type"), col("day"), col("x"), col("y"),
          count(lit(1)).over(w).as("n"),
          sum(col("x")).over(w).as("sx"), sum(col("y")).over(w).as("sy"),
          sum(col("x") * col("x")).over(w).as("sxx"),
          sum(col("y") * col("y")).over(w).as("syy"),
          sum(col("x") * col("y")).over(w).as("sxy"))
        .withColumn("corr_xy",
          when(col("n") >= 3
              && col("n") * col("sxx") - col("sx") * col("sx") > 0
              && col("n") * col("syy") - col("sy") * col("sy") > 0,
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
               sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double")))))
        .select(col("event_type"), col("day"), col("x"), col("y"),
          col("n"), col("corr_xy"))
        .orderBy("event_type", "day")
    }),

    "window_rsi" -> ((s, d) => {
      // Relative Strength Index (Cutler's SMA form) over each user's
      // event-value series — the momentum readout next to the level
      // monitors (ewma / drawdown / pct_change): RSI = gains/(gains+
      // losses) over the trailing 7 moves, in exact integer PERMILLE.
      // Wilder's original recursive EMA form is deliberately not used:
      // its per-step float fold accumulates engine-specific rounding,
      // while Cutler's moving-sum form is two BIGINT window sums and one
      // integer division — hash-exact (both operands non-negative, so
      // trunc-vs-floor can't diverge). Flat frames (all 7 moves zero)
      // yield NULL, the honest "no momentum signal" — never 0/0.
      // Scale shape: ONE user_id shuffle shared by the lag and the
      // moving sums (same window spec); no self-join, no global order.
      val byU = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
      val frame = byU.rowsBetween(-6, Window.currentRow)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("es"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("diff", col("cents") - lag(col("cents"), 1).over(byU))
        .withColumn("nd", count(col("diff")).over(frame))
        .withColumn("gains",
          sum(greatest(col("diff"), lit(0L))).over(frame))
        .withColumn("losses",
          sum(greatest(-col("diff"), lit(0L))).over(frame))
        .filter(col("nd") === 7)
        .select(col("user_id"), col("es"), col("event_id"),
          when(col("gains") + col("losses") > 0,
            expr("(gains * 1000) div (gains + losses)")).as("rsi_permille"))
        .orderBy("user_id", "es", "event_id")
    }),

    "window_bollinger" -> ((s, d) => {
      // Bollinger bands over each customer's order-price series — rolling
      // mean ± 2σ and the %B position of the newest price inside the
      // band: the mean-reversion readout next to window_rsi's momentum.
      // agg_corr's exact-integer-moment discipline on a moving frame: the
      // 5-row sum and sum-of-squares stay BIGINT, variance numerator
      // n²·σ² = n·Σx² − (Σx)² is exact, and the only float ops are one
      // IEEE sqrt, divisions and one multiply on identical integers —
      // identically ordered in both engines, so doubles are bit-equal.
      // Zero-width bands (5 equal prices) yield NULL %B, never 0/0.
      // Scale shape: ONE o_custkey shuffle shared by the window sort and
      // both frame sums; no self-join, no global order.
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("ds"), col("o_orderkey"))
        .rowsBetween(-4, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          unix_timestamp(col("o_orderdate")).as("ds"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("s1", sum(col("cents")).over(w))
        .withColumn("s2", sum(col("cents") * col("cents")).over(w))
        .filter(col("n") === 5)
        .withColumn("varnum", lit(5L) * col("s2") - col("s1") * col("s1"))
        .withColumn("mid", col("s1").cast("double") / lit(5.0))
        .withColumn("dev", lit(2.0) * sqrt(col("varnum").cast("double")) / lit(5.0))
        .select(col("o_custkey"), col("ds"), col("o_orderkey"), col("cents"),
          col("mid"), (col("mid") - col("dev")).as("lower"),
          (col("mid") + col("dev")).as("upper"),
          when(col("varnum") > 0,
            (col("cents").cast("double") - (col("mid") - col("dev"))) /
              (lit(2.0) * col("dev"))).as("pct_b"))
        .orderBy("o_custkey", "ds", "o_orderkey")
    }),

    "events_survival" -> ((s, d) => {
      // Discrete survival analysis of user lifetimes — the Kaplan-Meier
      // risk table every retention model starts from: a user's lifetime
      // is last-seen − first-seen in whole days; users still active near
      // the corpus edge (last event within 7 days of the global max) are
      // CENSORED — they attest "survived ≥ L" without contributing a
      // death. Per lifetime-day: the at-risk count (users with lifetime
      // ≥ k — censored and observed both hold a place in the risk set
      // through their last day), deaths, censored exits, and the discrete
      // hazard d·1000/n in exact integer permille. The KM product itself
      // is left to callers (it is a 60-row fold over this table); the
      // engines compare on the exact integer risk table, never on a
      // float product chain.
      // Scale shape: one map-side-combinable per-user aggregate collapses
      // event volume; the corpus-max censor horizon is a 1-row scalar
      // aggregate BROADCAST back onto the per-user frame (the events_rfm
      // shape — allowlisted scalar BNLJ); the reverse cumulative risk sum
      // rides a single-partition window over the per-DAY frame, bounded
      // by the observation span in days (≤ ~60 here, never data volume —
      // the events_benford adjudication).
      val perUser = t(s, d, "events")
        .select(col("user_id"), unix_timestamp(col("ts")).as("es"))
        .groupBy(col("user_id"))
        .agg(min(col("es")).as("fs"), max(col("es")).as("ls"))
      val horizon = perUser.agg(max(col("ls")).as("gmax"))
      val users = perUser.crossJoin(broadcast(horizon))
        .select(expr("(ls - fs) div 86400").as("day"),
          when(col("ls") < col("gmax") - 604800L, 1L).otherwise(0L).as("obs"))
      val byDay = users.groupBy(col("day"))
        .agg(sum(col("obs")).as("deaths"),
          sum(lit(1L) - col("obs")).as("censored"))
      val rev = Window.partitionBy(lit(1)).orderBy(col("day").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byDay
        .withColumn("at_risk", sum(col("deaths") + col("censored")).over(rev))
        .select(col("day"), col("at_risk"), col("deaths"), col("censored"),
          expr("(deaths * 1000) div at_risk").as("hazard_permille"))
        .orderBy("day")
    }),

    "window_stochastic" -> ((s, d) => {
      // Stochastic oscillator (%K/%D, 14-period, 3-period signal) over
      // each event type's DAILY close series — where window_rsi reads
      // momentum and window_bollinger mean-reversion, %K reads position-
      // in-range: close at the frame's high → 10000 bp, at its low → 0.
      // Exactness: close is a SELECTION (max_by on the (es, event_id)
      // total order), %K = floor((close−lo)·10⁴ / (hi−lo)) is one exact
      // integer multiply + one IEEE division + floor on identical
      // integers — deterministic cross-engine (the agg_chi2 floor rule);
      // %D = (k₀+k₁+k₂) div 3 stays in BIGINT. Warm-up rows (frame < 14)
      // and flat frames (hi = lo) yield NULL, never 0/0 (window_rsi
      // rule). Scale shape: ONE map-side-combinable daily aggregate
      // collapses event volume to the calendar-bounded per-type series;
      // all three windows share the (event_type, day) sort.
      val daily = t(s, d, "events")
        .select(col("event_type"), unix_timestamp(col("ts")).as("es"),
          col("event_id"), round(col("value") * 100).cast("long").as("cents"))
        .withColumn("day", expr("es div 86400"))
        .groupBy(col("event_type"), col("day"))
        .agg(max_by(col("cents"), struct(col("es"), col("event_id"))).as("close"))
      val wf = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-13, 0)
      val w1 = Window.partitionBy(col("event_type")).orderBy(col("day"))
      daily
        .withColumn("hi", max(col("close")).over(wf))
        .withColumn("lo", min(col("close")).over(wf))
        .withColumn("nf", count(lit(1)).over(wf))
        .withColumn("k_bp",
          when(col("nf") === 14 && col("hi") > col("lo"),
            expr("cast(floor(cast((close - lo) * 10000 as double)" +
              " / cast(hi - lo as double)) as bigint)")))
        .withColumn("k1", lag(col("k_bp"), 1).over(w1))
        .withColumn("k2", lag(col("k_bp"), 2).over(w1))
        .withColumn("d_bp",
          when(col("k_bp").isNotNull && col("k1").isNotNull && col("k2").isNotNull,
            expr("(k_bp + k1 + k2) div 3")))
        .select(col("event_type"), col("day"), col("close"),
          col("k_bp"), col("d_bp"))
        .orderBy("event_type", "day")
    }),

    "window_vwap" -> ((s, d) => {
      // Running volume-weighted average price per part — the execution-
      // quality benchmark on the lineitem "tape": cumulative
      // Σ(price)/Σ(qty) up to each ship date. Exactness: both cumulative
      // sums are BIGINT (cents / whole units) under the default RANGE
      // frame, so same-day peers share one exact prefix (tie order can't
      // perturb the sums — the reason this is NOT a ROWS frame); vwap is
      // ONE IEEE division per row on identical integers. Scale shape: a
      // single l_partkey shuffle shared by the window sort and both
      // running sums; partitions ride per-part history length.
      val wc = Window.partitionBy(col("l_partkey")).orderBy(col("ds"))
      t(s, d, "lineitem")
        .select(col("l_partkey"), unix_timestamp(col("l_shipdate")).as("ds"),
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity")).cast("long").as("q"),
          round(col("l_extendedprice") * 100).cast("long").as("pc"))
        .withColumn("cum_q", sum(col("q")).over(wc))
        .withColumn("cum_pc", sum(col("pc")).over(wc))
        .withColumn("vwap_cents",
          col("cum_pc").cast("double") / col("cum_q").cast("double"))
        .orderBy("l_partkey", "ds", "l_orderkey", "l_linenumber", "pc", "q")
    })
  )

  val oracles: Map[String, String] = Map(

    "events_anomaly" ->
      """WITH daily AS (
        |  SELECT floor(epoch(ts))::BIGINT // 86400 AS ed, event_type,
        |         count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT ed, event_type, cnt,
        |         count(*)  OVER win AS n7,
        |         sum(cnt)  OVER win AS s7,
        |         sum(cnt*cnt) OVER win AS q7
        |  FROM daily
        |  WINDOW win AS (PARTITION BY event_type ORDER BY ed
        |                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT ed, event_type, cnt, s7::BIGINT AS s7, q7::BIGINT AS q7,
        |       (7*cnt - s7 > 0 AND
        |        (7*cnt - s7)*(7*cnt - s7) > 4*(7*q7 - s7*s7)) AS is_spike
        |FROM w WHERE n7 = 7 ORDER BY event_type, ed""".stripMargin,

    "window_fill_forward" ->
      """SELECT event_id, user_id,
        |  last_value(CASE WHEN event_type = 'purchase'
        |                  THEN round(value * 100)::BIGINT END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS last_purchase_cents
        |FROM events ORDER BY event_id""".stripMargin,

    "join_scd2_pit" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS es, event_type, value,
        |         floor(value / 100)::BIGINT AS tier0
        |  FROM events),
        |dim AS (
        |  SELECT user_id, es, event_id, tier0 AS tier, 1 AS is_dim, NULL::BIGINT AS cents
        |  FROM (SELECT *, lag(tier0) OVER (PARTITION BY user_id ORDER BY es, event_id) AS prev
        |        FROM ev)
        |  WHERE prev IS NULL OR tier0 <> prev),
        |fact AS (
        |  SELECT user_id, es, event_id, NULL::BIGINT AS tier, 0 AS is_dim,
        |         round(value * 100)::BIGINT AS cents
        |  FROM ev WHERE event_type = 'purchase'),
        |u AS (SELECT * FROM dim UNION ALL SELECT * FROM fact),
        |c AS (
        |  SELECT *, last_value(tier IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY es, event_id, is_dim DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pit_tier
        |  FROM u)
        |SELECT pit_tier AS tier, count(*)::BIGINT AS n_purchases,
        |       count(DISTINCT user_id)::BIGINT AS n_users, sum(cents)::BIGINT AS cents_sum
        |FROM c WHERE is_dim = 0 GROUP BY pit_tier ORDER BY tier""".stripMargin,

    "events_ab_test" ->
      """WITH ul AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS conv,
        |    sum(CASE WHEN event_type = 'purchase' THEN round(value * 100)::BIGINT ELSE 0 END)::BIGINT AS cents,
        |    user_id % 2 AS variant
        |  FROM events GROUP BY user_id),
        |m AS (
        |  SELECT
        |    sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
        |    sum(CASE WHEN variant = 0 THEN conv ELSE 0 END)::BIGINT AS c0,
        |    sum(CASE WHEN variant = 0 THEN cents ELSE 0 END)::BIGINT AS cents0,
        |    sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
        |    sum(CASE WHEN variant = 1 THEN conv ELSE 0 END)::BIGINT AS c1,
        |    sum(CASE WHEN variant = 1 THEN cents ELSE 0 END)::BIGINT AS cents1
        |  FROM ul)
        |SELECT n0, c0, cents0, n1, c1, cents1,
        |  (c0 * 1000) // n0 AS conv0_permille,
        |  (c1 * 1000) // n1 AS conv1_permille,
        |  CASE WHEN c0 * n1 > 0 THEN (c1 * n0 * 1000) // (c0 * n1) - 1000 END AS lift_permille,
        |  CASE WHEN c0 + c1 > 0 AND c0 + c1 < n0 + n1
        |       THEN (c1*n0 - c0*n1)::DOUBLE * sqrt((n0 + n1)::DOUBLE)
        |            / (sqrt(((c0 + c1) * (n0 + n1 - c0 - c1))::DOUBLE)
        |               * sqrt((n0*n1)::DOUBLE))
        |  END AS z_score
        |FROM m""".stripMargin,

    "scd2_history" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS es,
        |         floor(value / 100)::BIGINT AS tier
        |  FROM events),
        |ch AS (
        |  SELECT user_id, event_id, es, tier FROM (
        |    SELECT user_id, event_id, es, tier,
        |           lag(tier) OVER (PARTITION BY user_id ORDER BY es, event_id) AS pt
        |    FROM ev)
        |  WHERE pt IS NULL OR tier <> pt)
        |SELECT user_id, event_id, tier, es AS valid_from,
        |       lead(es) OVER (PARTITION BY user_id ORDER BY es, event_id) - 1 AS valid_to
        |FROM ch ORDER BY user_id, valid_from, event_id""".stripMargin,

    "merge_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |         round(o_totalprice * 100)::BIGINT AS cents, 0::BIGINT AS version
        |  FROM orders),
        |delta AS (
        |  SELECT k, 'U' AS st, ((cents * 11) // 10)::BIGINT AS cents, 1::BIGINT AS version
        |  FROM base WHERE k % 7 = 0
        |  UNION ALL
        |  SELECT k + 10000000 AS k, 'I' AS st, cents, 1::BIGINT AS version
        |  FROM base WHERE k % 13 = 0),
        |merged AS (SELECT * FROM base UNION ALL SELECT * FROM delta),
        |latest AS (
        |  SELECT k, st, cents, version FROM (
        |    SELECT *, row_number() OVER (PARTITION BY k ORDER BY version DESC) AS rn
        |    FROM merged)
        |  WHERE rn = 1)
        |SELECT k AS o_orderkey, st AS status, cents AS price_cents, version,
        |       CASE WHEN k >= 10000000 THEN 'inserted'
        |            WHEN version = 1 THEN 'updated'
        |            ELSE 'unchanged' END AS op
        |FROM latest ORDER BY o_orderkey""".stripMargin,

    // the oracle recomputes the view FROM THE MODIFIED BASE (kept rows +
    // inserted rows) — the Spark side never touches base rows, so the
    // incremental merge arithmetic is what the hash gate checks
    "merge_ivm" ->
      """WITH base AS (
        |  SELECT o_custkey AS k, round(o_totalprice * 100)::BIGINT AS cents,
        |         o_orderkey
        |  FROM orders),
        |modified AS (
        |  SELECT k, cents FROM base WHERE o_orderkey % 9 <> 0
        |  UNION ALL
        |  SELECT CASE WHEN o_orderkey % 33 = 0 THEN k + 1000000 ELSE k END,
        |         cents // 2 + 50
        |  FROM base WHERE o_orderkey % 11 = 0),
        |touched AS (
        |  SELECT DISTINCT k FROM (
        |    SELECT k FROM base WHERE o_orderkey % 9 = 0
        |    UNION ALL
        |    SELECT CASE WHEN o_orderkey % 33 = 0 THEN k + 1000000 ELSE k END
        |    FROM base WHERE o_orderkey % 11 = 0))
        |SELECT m.k AS o_custkey, count(*)::BIGINT AS n_orders,
        |       sum(m.cents)::BIGINT AS cents_sum,
        |       (CASE WHEN t.k IS NULL THEN 0 ELSE 1 END)::BIGINT AS touched
        |FROM modified m LEFT JOIN touched t ON m.k = t.k
        |GROUP BY m.k, t.k ORDER BY m.k""".stripMargin,

    // prefix-identity CUSUM: S = P − min(0, running min P); threshold is
    // 3/4 of the per-type max so alarms exist at every scale factor
    "events_cusum" ->
      """WITH daily AS (
        |  SELECT event_type, floor(epoch(ts))::BIGINT // 86400 AS day,
        |         count(*)::BIGINT AS x
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, day, x,
        |         sum(x) OVER (PARTITION BY event_type) AS total,
        |         count(*) OVER (PARTITION BY event_type) AS nd
        |  FROM daily),
        |p AS (
        |  SELECT event_type, day, total, nd,
        |         sum(x * nd - total) OVER (PARTITION BY event_type ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv
        |  FROM w),
        |s AS (
        |  SELECT event_type, day, total, nd,
        |         pv - least(0, min(pv) OVER (PARTITION BY event_type ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s_val
        |  FROM p),
        |s2 AS (
        |  SELECT *, max(s_val) OVER (PARTITION BY event_type) AS peak FROM s)
        |SELECT event_type, max(nd)::BIGINT AS n_days,
        |       sum(CASE WHEN peak > 0 AND s_val * 4 >= peak * 3 THEN 1 ELSE 0 END)::BIGINT AS n_alarms,
        |       max(s_val)::BIGINT AS max_s,
        |       coalesce(min(CASE WHEN peak > 0 AND s_val * 4 >= peak * 3 THEN day END), -1)::BIGINT AS first_alarm_day
        |FROM s2 GROUP BY event_type ORDER BY event_type""".stripMargin,

    "events_forecast" ->
      """WITH daily AS (
        |  SELECT floor(epoch(ts))::BIGINT // 86400 AS ed, event_type,
        |         count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT ed, event_type, cnt,
        |         count(*) OVER win AS n7, sum(cnt) OVER win AS s7
        |  FROM daily
        |  WINDOW win AS (PARTITION BY event_type ORDER BY ed
        |                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        |e AS (
        |  SELECT event_type, cnt, abs(cnt - (s7 // 7)::BIGINT) AS err
        |  FROM w WHERE n7 = 7)
        |SELECT event_type, count(*)::BIGINT AS n_days,
        |       sum(err)::BIGINT AS sum_abs_err, sum(cnt)::BIGINT AS sum_cnt,
        |       ((sum(err) * 1000) // sum(cnt))::BIGINT AS mae_permille
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,

    "events_gaps" ->
      """WITH g AS (
        |  SELECT es - lag(es) OVER (PARTITION BY user_id ORDER BY es, event_id) AS gap
        |  FROM (SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS es FROM events))
        |SELECT (gap // 600)::BIGINT AS bucket, count(*)::BIGINT AS n_gaps,
        |       min(gap)::BIGINT AS min_gap, max(gap)::BIGINT AS max_gap
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY bucket ORDER BY bucket""".stripMargin,

    "events_bursts" ->
      """WITH h AS (
        |  SELECT event_type, floor(epoch(ts))::BIGINT // 3600 AS hh, count(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2),
        |hot AS (
        |  SELECT event_type, hh, n,
        |         hh - row_number() OVER (PARTITION BY event_type ORDER BY hh) AS grp
        |  FROM h WHERE n >= 6),
        |runs AS (
        |  SELECT event_type, grp, count(*)::BIGINT AS len, max(n)::BIGINT AS peak,
        |         sum(n)::BIGINT AS vol
        |  FROM hot GROUP BY 1, 2)
        |SELECT event_type, count(*)::BIGINT AS n_bursts, max(len)::BIGINT AS max_len,
        |       max(peak)::BIGINT AS peak_n, sum(vol)::BIGINT AS burst_events
        |FROM runs GROUP BY event_type ORDER BY event_type""".stripMargin,

    "join_temporal" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS es,
        |         floor(value / 100)::BIGINT AS tier, event_type,
        |         round(value * 100)::BIGINT AS cents
        |  FROM events),
        |ch AS (
        |  SELECT user_id, es, event_id, tier FROM (
        |    SELECT user_id, es, event_id, tier,
        |           lag(tier) OVER (PARTITION BY user_id ORDER BY es, event_id) AS pt
        |    FROM ev)
        |  WHERE pt IS NULL OR tier <> pt),
        |f AS (
        |  SELECT user_id, event_id, es, cents FROM ev WHERE event_type = 'purchase')
        |SELECT f.user_id, f.event_id, f.es, f.cents,
        |       (SELECT c.tier FROM ch c
        |        WHERE c.user_id = f.user_id
        |          AND (c.es < f.es OR (c.es = f.es AND c.event_id <= f.event_id))
        |        ORDER BY c.es DESC, c.event_id DESC LIMIT 1) AS tier_at
        |FROM f ORDER BY f.event_id""".stripMargin,

    "events_rfm" ->
      """WITH p AS (
        |  SELECT user_id, floor(epoch(ts))::BIGINT AS es,
        |         round(value * 100)::BIGINT AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |per AS (
        |  SELECT user_id, max(es) AS last_es, count(*)::BIGINT AS freq,
        |         sum(cents)::BIGINT AS monetary
        |  FROM p GROUP BY user_id),
        |mx AS (SELECT max(es) AS gmax FROM p),
        |r AS (
        |  SELECT user_id, ((gmax - last_es) // 86400)::BIGINT AS rec_days,
        |         freq, monetary
        |  FROM per CROSS JOIN mx),
        |tiles AS (
        |  SELECT user_id, rec_days, freq, monetary,
        |         ntile(5) OVER (ORDER BY rec_days, user_id)          AS r_tile,
        |         ntile(5) OVER (ORDER BY freq DESC, user_id)         AS f_tile,
        |         ntile(5) OVER (ORDER BY monetary DESC, user_id)     AS m_tile
        |  FROM r)
        |SELECT user_id, rec_days, freq, monetary, r_tile, f_tile, m_tile,
        |       (r_tile * 100 + f_tile * 10 + m_tile) AS rfm
        |FROM tiles ORDER BY user_id""".stripMargin,

    "join_interval" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS es FROM events),
        |marked AS (
        |  SELECT user_id, event_id, es,
        |         CASE WHEN prev IS NULL OR es - prev > 3600 THEN 1 ELSE 0 END AS is_new
        |  FROM (SELECT user_id, event_id, es,
        |               lag(es) OVER (PARTITION BY user_id ORDER BY es, event_id) AS prev
        |        FROM ev)),
        |numbered AS (
        |  SELECT user_id, es,
        |         sum(is_new) OVER (PARTITION BY user_id ORDER BY es, event_id
        |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked),
        |sess AS (
        |  SELECT user_id, sid, min(es) AS s_start, max(es) AS s_end
        |  FROM numbered GROUP BY user_id, sid)
        |SELECT (greatest(a.s_start, b.s_start) // 86400)::BIGINT AS day,
        |       count(*)::BIGINT AS n_pairs
        |FROM sess a JOIN sess b
        |  ON a.user_id < b.user_id
        | AND a.s_start <= b.s_end AND b.s_start <= a.s_end
        |GROUP BY day ORDER BY day""".stripMargin,

    "events_autocorr" ->
      """WITH daily AS (
        |  SELECT floor(epoch(ts))::BIGINT // 86400 AS ed, event_type,
        |         count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |lagged AS (
        |  SELECT event_type, cnt,
        |         lag(cnt, 1) OVER w AS l1, lag(cnt, 2) OVER w AS l2,
        |         lag(cnt, 3) OVER w AS l3
        |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY ed)),
        |u AS (
        |  SELECT event_type, 1::BIGINT AS lag, cnt AS x, l1 AS y FROM lagged WHERE l1 IS NOT NULL
        |  UNION ALL
        |  SELECT event_type, 2::BIGINT, cnt, l2 FROM lagged WHERE l2 IS NOT NULL
        |  UNION ALL
        |  SELECT event_type, 3::BIGINT, cnt, l3 FROM lagged WHERE l3 IS NOT NULL)
        |SELECT event_type, lag, count(*)::BIGINT AS n,
        |  (count(*) * sum(x*y) - sum(x) * sum(y))::BIGINT AS num,
        |  (count(*) * sum(x*x) - sum(x) * sum(x))::BIGINT AS den_x,
        |  (count(*) * sum(y*y) - sum(y) * sum(y))::BIGINT AS den_y
        |FROM u GROUP BY event_type, lag ORDER BY event_type, lag""".stripMargin,

    "window_drawdown" ->
      """WITH ev AS (
        |  SELECT user_id, floor(epoch(ts))::BIGINT AS es, event_id,
        |         round(value * 100)::BIGINT AS cents
        |  FROM events),
        |w AS (
        |  SELECT *, max(cents) OVER (PARTITION BY user_id ORDER BY es, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS runmax
        |  FROM ev),
        |dd AS (SELECT *, cents - runmax AS dd FROM w)
        |SELECT user_id, count(*)::BIGINT AS n_events, max(cents)::BIGINT AS max_cents,
        |  min(dd)::BIGINT AS max_drawdown_cents,
        |  first(es ORDER BY dd, es, event_id)::BIGINT AS trough_es
        |FROM dd GROUP BY user_id ORDER BY user_id""".stripMargin,

    "events_holt" ->
      """WITH daily AS (
        |  SELECT floor(epoch(ts))::BIGINT // 86400 AS ed, event_type,
        |         count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |seq AS (
        |  SELECT event_type, cnt,
        |         row_number() OVER (PARTITION BY event_type ORDER BY ed) AS i
        |  FROM daily),
        |rec AS (
        |  WITH RECURSIVE r(event_type, i, l, b) AS (
        |    SELECT event_type, 1::BIGINT, cnt * 1000, 0::BIGINT
        |    FROM seq WHERE i = 1
        |    UNION ALL
        |    SELECT s.event_type, s.i,
        |           (1000 * s.cnt + r.l + r.b) // 2,
        |           (r.b + ((1000 * s.cnt + r.l + r.b) // 2) - r.l) // 2
        |    FROM r JOIN seq s ON s.event_type = r.event_type AND s.i = r.i + 1)
        |  SELECT * FROM r)
        |SELECT event_type, max(i)::BIGINT AS n_days,
        |  arg_max(l, i)::BIGINT AS level_milli,
        |  arg_max(b, i)::BIGINT AS trend_milli,
        |  (arg_max(l, i) + arg_max(b, i))::BIGINT AS forecast_next_milli
        |FROM rec GROUP BY event_type ORDER BY event_type""".stripMargin,

    "window_ohlc" ->
      """WITH ev AS (
        |  SELECT user_id, floor(epoch(ts))::BIGINT AS es, event_id, value
        |  FROM events)
        |SELECT user_id, (es // 3600)::BIGINT AS hh,
        |  first(value ORDER BY es, event_id) AS open,
        |  max(value) AS high, min(value) AS low,
        |  last(value ORDER BY es, event_id) AS close,
        |  count(*)::BIGINT AS n_events
        |FROM ev GROUP BY user_id, hh ORDER BY user_id, hh""".stripMargin,

    "window_rolling_corr" ->
      """WITH e AS (
        |  SELECT floor(epoch(ts))::BIGINT // 86400 AS day, event_type, user_id
        |  FROM events),
        |d AS (
        |  SELECT event_type, day, count(*)::BIGINT AS x,
        |         count(DISTINCT user_id)::BIGINT AS y
        |  FROM e GROUP BY event_type, day),
        |m AS (
        |  SELECT event_type, day, x, y,
        |         count(*) OVER w::BIGINT AS n,
        |         sum(x) OVER w::BIGINT AS sx, sum(y) OVER w::BIGINT AS sy,
        |         sum(x*x) OVER w::BIGINT AS sxx, sum(y*y) OVER w::BIGINT AS syy,
        |         sum(x*y) OVER w::BIGINT AS sxy
        |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day
        |                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT event_type, day, x, y, n,
        |  CASE WHEN n >= 3 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
        |       THEN (n*sxy - sx*sy)::DOUBLE /
        |            (sqrt((n*sxx - sx*sx)::DOUBLE) * sqrt((n*syy - sy*sy)::DOUBLE))
        |  END AS corr_xy
        |FROM m ORDER BY event_type, day""".stripMargin,

    "window_rsi" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS es,
        |         round(value * 100)::BIGINT AS cents
        |  FROM events),
        |df AS (
        |  SELECT user_id, event_id, es,
        |         cents - lag(cents, 1) OVER (PARTITION BY user_id
        |                                     ORDER BY es, event_id) AS diff
        |  FROM ev),
        |m AS (
        |  SELECT user_id, event_id, es,
        |         count(diff) OVER w::BIGINT AS nd,
        |         sum(greatest(diff, 0)) OVER w::BIGINT AS gains,
        |         sum(greatest(-diff, 0)) OVER w::BIGINT AS losses
        |  FROM df WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id
        |                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT user_id, es, event_id,
        |  CASE WHEN gains + losses > 0
        |       THEN (gains * 1000 // (gains + losses))::BIGINT END AS rsi_permille
        |FROM m WHERE nd = 7 ORDER BY user_id, es, event_id""".stripMargin,

    "window_bollinger" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, floor(epoch(o_orderdate))::BIGINT AS ds,
        |         round(o_totalprice * 100)::BIGINT AS cents
        |  FROM orders),
        |m AS (
        |  SELECT o_custkey, o_orderkey, ds, cents,
        |         count(*) OVER w::BIGINT AS n,
        |         sum(cents) OVER w::BIGINT AS s1,
        |         sum(cents * cents) OVER w::BIGINT AS s2
        |  FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY ds, o_orderkey
        |                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)),
        |b AS (
        |  SELECT o_custkey, ds, o_orderkey, cents,
        |         5 * s2 - s1 * s1 AS varnum,
        |         s1::DOUBLE / 5.0 AS mid,
        |         2.0 * sqrt((5 * s2 - s1 * s1)::DOUBLE) / 5.0 AS dev
        |  FROM m WHERE n = 5)
        |SELECT o_custkey, ds, o_orderkey, cents, mid,
        |       mid - dev AS lower, mid + dev AS upper,
        |       CASE WHEN varnum > 0
        |            THEN (cents::DOUBLE - (mid - dev)) / (2.0 * dev) END AS pct_b
        |FROM b ORDER BY o_custkey, ds, o_orderkey""".stripMargin,

    "events_survival" ->
      """WITH u AS (
        |  SELECT user_id, min(floor(epoch(ts))::BIGINT) AS fs,
        |         max(floor(epoch(ts))::BIGINT) AS ls
        |  FROM events GROUP BY user_id),
        |g AS (SELECT max(ls) AS gmax FROM u),
        |lt AS (
        |  SELECT (ls - fs) // 86400 AS day,
        |         CASE WHEN ls < gmax - 604800 THEN 1 ELSE 0 END AS obs
        |  FROM u, g),
        |d AS (
        |  SELECT day, sum(obs)::BIGINT AS deaths,
        |         sum(1 - obs)::BIGINT AS censored
        |  FROM lt GROUP BY day),
        |r AS (
        |  SELECT day, deaths, censored,
        |         sum(deaths + censored) OVER (ORDER BY day DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS at_risk
        |  FROM d)
        |SELECT day, at_risk, deaths, censored,
        |       (deaths * 1000 // at_risk)::BIGINT AS hazard_permille
        |FROM r ORDER BY day""".stripMargin,

    "window_stochastic" ->
      """WITH ev AS (
        |  SELECT event_type, floor(epoch(ts))::BIGINT AS es, event_id,
        |         round(value * 100)::BIGINT AS cents
        |  FROM events),
        |daily AS (
        |  SELECT event_type, (es // 86400)::BIGINT AS day,
        |         last(cents ORDER BY es, event_id) AS close
        |  FROM ev GROUP BY event_type, es // 86400),
        |f AS (
        |  SELECT event_type, day, close,
        |         max(close) OVER win AS hi, min(close) OVER win AS lo,
        |         count(*)   OVER win AS nf
        |  FROM daily
        |  WINDOW win AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
        |k AS (
        |  SELECT event_type, day, close,
        |         CASE WHEN nf = 14 AND hi > lo
        |              THEN floor(((close - lo) * 10000)::DOUBLE / (hi - lo)::DOUBLE)::BIGINT
        |              END AS k_bp
        |  FROM f),
        |l AS (
        |  SELECT event_type, day, close, k_bp,
        |         lag(k_bp, 1) OVER (PARTITION BY event_type ORDER BY day) AS k1,
        |         lag(k_bp, 2) OVER (PARTITION BY event_type ORDER BY day) AS k2
        |  FROM k)
        |SELECT event_type, day, close, k_bp,
        |       CASE WHEN k_bp IS NOT NULL AND k1 IS NOT NULL AND k2 IS NOT NULL
        |            THEN (k_bp + k1 + k2) // 3 END::BIGINT AS d_bp
        |FROM l ORDER BY event_type, day""".stripMargin,

    "window_vwap" ->
      """WITH li AS (
        |  SELECT l_partkey, floor(epoch(l_shipdate))::BIGINT AS ds,
        |         l_orderkey, l_linenumber,
        |         round(l_quantity)::BIGINT AS q,
        |         round(l_extendedprice * 100)::BIGINT AS pc
        |  FROM lineitem),
        |c AS (
        |  SELECT l_partkey, ds, l_orderkey, l_linenumber, q, pc,
        |         sum(q)  OVER win::BIGINT AS cum_q,
        |         sum(pc) OVER win::BIGINT AS cum_pc
        |  FROM li
        |  WINDOW win AS (PARTITION BY l_partkey ORDER BY ds
        |                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT l_partkey, ds, l_orderkey, l_linenumber, q, pc, cum_q, cum_pc,
        |       cum_pc::DOUBLE / cum_q::DOUBLE AS vwap_cents
        |FROM c ORDER BY l_partkey, ds, l_orderkey, l_linenumber, pc, q""".stripMargin
  )
}
