package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/** Relational operator surface (SURVEY §2-B): scans, joins, aggregations,
  * windows, sorts, set ops, scalar function suites.
  *
  * Oracle-parity rules applied throughout (SURVEY §2-B rules):
  *   - every query ends with a deterministic ORDER BY over a unique key;
  *   - money math is done in exact decimal (cast each 2-dp double to
  *     DECIMAL(10,2) *before* arithmetic) so Spark and DuckDB produce
  *     bit-identical results regardless of summation order — floating sums
  *     are never compared;
  *   - raw double/float columns are passed through untouched (bit-exact);
  *   - timestamps are reduced to DATE or epoch-second BIGINT.
  *
  * Scale notes: joins keep their natural shuffle keys; small dims are
  * broadcast explicitly; top-k uses orderBy+limit which Spark plans as
  * TakeOrderedAndProject (no global sort materialization).
  */
object Relational extends Pack {

  /** exact 2-dp decimal view of a money/qty double column */
  private def dec2(c: Column): Column = c.cast("decimal(10,2)")
  private val one = lit(1).cast("decimal(10,2)")

  // shared SQL fragment: exact revenue sum; the FINAL output is cast to
  // DOUBLE on both sides so the driver's pandas hash sees identical float64
  // on the Spark-parquet and DuckDB paths (arithmetic stays exact decimal —
  // only the last projection converts, and the same decimal value maps to
  // the same nearest double in both engines).
  private val revSql =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (CAST(1 AS DECIMAL(10,2)) - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE)"
  private def rev: Column =
    sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount")))).cast("double")

  val queries: Map[String, Q] = Map(
    // ---- scans / projection / filter -------------------------------------
    "scan_parquet" -> ((s, d) => {
      t(s, d, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        min(col("l_orderkey")).as("min_key"),
        max(col("l_orderkey")).as("max_key"),
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"))
    }),

    "project_rename" -> ((s, d) => {
      t(s, d, "part")
        .select(
          col("p_partkey").as("part_id"),
          col("p_name").as("part_name"),
          col("p_brand").as("brand"),
          col("p_retailprice").as("retail_price"))
        .orderBy("part_id")
    }),

    "filter_pred" -> ((s, d) => {
      // raw-timestamp bounds (not to_date(col)) so the predicate reaches the
      // parquet scan as PushedFilters; [1996-01-01, 1998-01-01) over the
      // timestamp is exactly "date between 1996-01-01 and 1997-12-31"
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp")
          && col("l_discount") >= 0.03 && col("l_quantity") < 25
          && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          to_date(col("l_shipdate")).as("ship_date"))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "ship_date")
    }),

    // ---- joins -----------------------------------------------------------
    "join_broadcast" -> ((s, d) => {
      t(s, d, "nation")
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
        .orderBy("n_nationkey")
    }),

    "join_hash" -> ((s, d) => {
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"), rev.as("revenue"))
        .orderBy("o_orderpriority")
    }),

    "join_multiway" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_lines"), rev.as("revenue"))
        .orderBy("r_name", "n_name")
    }),

    "join_left" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(dec2(col("o_totalprice"))).cast("double"),
            lit(0.0)).as("total_spent"))
        .orderBy("c_custkey")
    }),

    "join_semi" -> ((s, d) => {
      val bigOrders = t(s, d, "orders").filter(col("o_totalprice") > 20000)
      t(s, d, "customer")
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }),

    "join_anti" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
        .orderBy("c_custkey")
    }),

    "join_full" -> ((s, d) => {
      // FULL OUTER: unmatched rows preserved from BOTH sides — the
      // reconciliation join (source-vs-sink diffs). Both inputs are
      // filtered so each genuinely has keys the other lacks; the output
      // classifies every key as matched / left-only / right-only.
      val big = t(s, d, "orders").filter(col("o_totalprice") > 150000)
        .select(col("o_custkey").as("k")).distinct()
      val rich = t(s, d, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("k2")).distinct()
      big.join(rich, col("k") === col("k2"), "full_outer")
        .agg(
          sum(when(col("k").isNotNull && col("k2").isNotNull, 1L).otherwise(0L)).as("n_both"),
          sum(when(col("k2").isNull, 1L).otherwise(0L)).as("n_left_only"),
          sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_right_only"))
    }),

    "join_asof" -> ((s, d) => {
      // as-of join: each click event picks the most recent prior-or-equal
      // view event of the same user. Implemented as ONE window pass over the
      // unioned event stream (carry-forward of the last view id) — a single
      // shuffle on user_id, instead of the naive range self-join whose
      // candidate set is quadratic per user. Event order is second-resolution
      // ts with event_id tiebreak so both engines sort identically.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_timestamp(col("ts")), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .filter(col("event_type").isin("click", "view"))
        .withColumn("view_eid", when(col("event_type") === "view", col("event_id")))
        .withColumn("asof_view", last(col("view_eid"), ignoreNulls = true).over(w))
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("asof_view"))
        .orderBy("event_id")
    }),

    "join_asof_tol" -> ((s, d) => {
      // TOLERANCE-bounded as-of join — the feature-store staleness rule:
      // a click only picks up the most recent prior view if it is at
      // most 1 h old, else NULL (serving a stale feature is worse than
      // serving none). Same single carry-forward window as join_asof —
      // the carried row also brings its timestamp, and the tolerance is
      // one in-row CASE on the distance. No second pass, no range join;
      // staleness_s rides along for the latency histogram.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_timestamp(col("ts")), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .filter(col("event_type").isin("click", "view"))
        .withColumn("es", unix_timestamp(col("ts")))
        .withColumn("view_row",
          when(col("event_type") === "view", struct(col("es"), col("event_id"))))
        .withColumn("carried", last(col("view_row"), ignoreNulls = true).over(w))
        .filter(col("event_type") === "click")
        .withColumn("fresh",
          col("carried").isNotNull && col("es") - col("carried.es") <= 3600L)
        .select(col("event_id"), col("user_id"),
          when(col("fresh"), col("carried.event_id")).as("asof_view"),
          when(col("fresh"), col("es") - col("carried.es")).as("staleness_s"))
        .orderBy("event_id")
    }),

    "join_range" -> ((s, d) => {
      // non-equi band join in its 100 TB form: the band predicate
      // price ∈ [acctbal, acctbal+500) confines every match to TWO
      // fixed-width price buckets, so candidates come from an EQUI-join
      // on the bucket id (each supplier row explodes into its two
      // admissible buckets — the join_interval bin discipline) and the
      // exact band predicate verifies inside the bucket. Results are
      // identical to the raw theta-join (the oracle is unchanged); the
      // BNLJ form this replaced evaluated part × supplier — the
      // round-20 sf1 sweep measured it 12.6× for 10× data (both sides
      // grow, so work grows ~quadratically), while the bucketed form
      // shuffles nothing (bucketed equi-condition rides the same
      // broadcast) and scales with matches, not the cross product.
      val sup = broadcast(t(s, d, "supplier")
        .withColumn("bucket", explode(array(
          floor(col("s_acctbal") / 500.0), floor(col("s_acctbal") / 500.0) + 1))))
      t(s, d, "part")
        .withColumn("bucket", floor(col("p_retailprice") / 500.0))
        .join(sup, Seq("bucket"))
        .filter(col("p_retailprice") >= col("s_acctbal")
          && col("p_retailprice") < col("s_acctbal") + 500.0)
        .groupBy(col("s_suppkey"))
        .agg(count(lit(1)).as("n_parts"),
          min(col("p_partkey")).as("min_part"),
          max(col("p_partkey")).as("max_part"))
        .orderBy("s_suppkey")
    }),

    // ---- aggregation -----------------------------------------------------
    "agg_groupby" -> ((s, d) => {
      // TPC-H Q1 shape; sums in exact decimal, final outputs as double.
      // Filter on the raw timestamp (ts < day-after-midnight ≡ date <= day)
      // so parquet min/max pushdown applies.
      t(s, d, "lineitem")
        .filter(col("l_shipdate") < lit("1998-09-03").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount")))
            * (one + dec2(col("l_tax")))).cast("double").as("sum_charge"),
          round(avg(col("l_quantity")), 2).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "agg_distinct" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("d_parts"),
          countDistinct(col("l_suppkey")).as("d_supps"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    "agg_approx_distinct" -> ((s, d) => {
      // HLL sketch — the approximate count itself is engine-specific, so the
      // oracle checks the deterministic error bound instead: the HLL estimate
      // (default rsd 5%) must land within 10% of the exact distinct count
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"),
          col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")) * 10 <= col("exact_parts"))
            .as("within_10pct"))
        .orderBy("l_returnflag")
    }),

    "agg_percentile" -> ((s, d) => {
      // exact percentiles (median + p90) of integral-valued quantities:
      // both engines linearly interpolate, and interpolation on integral
      // doubles at q=0.5/0.9 yields exactly-representable values, so the
      // comparison is bit-stable. (Approximate percentiles are engine-
      // specific sketches — the exact form is the oracle-checkable one.)
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    "agg_approx_percentile" -> ((s, d) => {
      // the 100 TB percentile: approx_percentile is a mergeable one-pass
      // sketch (map-side combinable, bounded memory) where the exact form
      // needs per-group sorted values. The sketch's value is
      // engine/accuracy specific, so — like agg_approx_distinct — the
      // oracle checks the deterministic BOUND, not the estimate: at
      // accuracy 10000 the rank error is <= n/10000, which on this
      // distribution keeps the estimate within 10% of the exact median.
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("approx_percentile(l_quantity, 0.5, 10000)").as("approx_med"),
          expr("percentile(l_quantity, 0.5)").as("exact_med"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("exact_med"), col("n"),
          (abs(col("approx_med") - col("exact_med")) * 10 <= col("exact_med"))
            .as("within_10pct"))
        .orderBy("l_returnflag")
    }),

    "agg_rollup" -> ((s, d) => {
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    "agg_cube" -> ((s, d) => {
      t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),

    "agg_grouping_sets" -> ((s, d) => {
      // the general form rollup/cube specialize: an explicit grouping-set
      // list — here the two per-dimension marginals WITHOUT the cross table
      // or grand total. Plans as ONE Expand over the scan (each row
      // replicated once per set) feeding a single hash aggregate: no
      // re-scan per set, map-side partial agg intact
      t(s, d, "lineitem")
        .groupingSets(Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // ---- windows ---------------------------------------------------------
    "window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("rk", rank().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("rk"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_custkey", "rk", "o_orderkey")
    }),

    "window_lag" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      t(s, d, "events")
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .select(col("event_id"), col("user_id"), col("value"), col("prev_value"),
          (dec2(col("value")) - dec2(col("prev_value"))).cast("double").as("delta"))
        .orderBy("event_id")
    }),

    "window_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(dec2(col("o_totalprice"))).over(w).cast("double").as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "window_range" -> ((s, d) => {
      // VALUE-based (RANGE) frame — a different frame evaluator than the
      // ROWS frames above: the 30-day trailing sum is bounded by the ORDER
      // BY value, so peer rows (same day) always land in the same frame.
      // Ordered on the integer epoch-day so both engines frame identically.
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("epoch_day"))
        .rangeBetween(-30, 0)
      t(s, d, "orders")
        .withColumn("epoch_day", datediff(col("o_orderdate"), lit("1970-01-01")).cast("long"))
        .select(col("o_custkey"), col("o_orderkey"), col("epoch_day"),
          sum(dec2(col("o_totalprice"))).over(w).cast("double").as("trailing_30d"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "window_ntile" -> ((s, d) => {
      // quartile assignment within each customer's order history — the
      // window is partitioned (a no-partition global window funnels the
      // table through one task, the round-1 anti-pattern)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          ntile(4).over(w).as("price_quartile"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "window_first_last" -> ((s, d) => {
      // first/last value over a full-partition frame per customer
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_totalprice")).over(w).as("first_price"),
          last(col("o_totalprice")).over(w).as("last_price"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "agg_collect" -> ((s, d) => {
      // collection aggregates, scalar-ized deterministically: sorted list
      // joined to a string, set size (array outputs crash the driver hash)
      t(s, d, "nation")
        .groupBy(col("n_regionkey"))
        .agg(
          array_join(sort_array(collect_list(col("n_name"))), "|").as("names"),
          size(collect_set(col("n_name"))).as("n_distinct"),
          count(lit(1)).as("n"))
        .orderBy("n_regionkey")
    }),

    "fn_struct" -> ((s, d) => {
      // StructType scalar surface: build a struct, access fields, nest one
      val st = struct(col("p_brand").as("brand"), col("p_retailprice").as("price"))
      t(s, d, "part").select(
        col("p_partkey"),
        st.getField("brand").as("s_brand"),
        st.getField("price").as("s_price"),
        struct(st.as("inner"), col("p_size").as("sz"))
          .getField("inner").getField("brand").as("nested_brand"))
        .orderBy("p_partkey")
    }),

    "sessionize" -> ((s, d) => {
      // gaps-and-islands: new session when >1h since previous event
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .withColumn("ep", unix_timestamp(col("ts")))
        .withColumn("prev_ep", lag(col("ep"), 1).over(byUser))
        .withColumn("is_new",
          when(col("prev_ep").isNull || col("ep") - col("prev_ep") > 3600, 1).otherwise(0))
        .select(col("user_id"), col("event_id"),
          sum(col("is_new")).over(run).as("session_seq"))
        .orderBy("user_id", "event_id")
    }),

    "events_funnel" -> ((s, d) => {
      // sequential-pattern funnel: per user, first view -> first click
      // STRICTLY AFTER it -> first purchase strictly after that. Three
      // per-user aggregations chained on the previous stage's timestamp —
      // each stage is one shuffle keyed user_id (AQE coalesces the tiny
      // ones), never a per-user driver loop; nulls mark where the user
      // dropped out of the funnel.
      val ev = t(s, d, "events").select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("es"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("es")).as("view_s"))
      val clicks = ev.filter(col("event_type") === "click")
        .join(views, "user_id").filter(col("es") > col("view_s"))
        .groupBy(col("user_id")).agg(min(col("es")).as("click_s"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .join(clicks, "user_id").filter(col("es") > col("click_s"))
        .groupBy(col("user_id")).agg(min(col("es")).as("purchase_s"))
      views
        .join(clicks, Seq("user_id"), "left")
        .join(purchases, Seq("user_id"), "left")
        .orderBy("user_id")
    }),

    "events_funnel_window" -> ((s, d) => {
      // TIME-BOXED funnel: events_funnel with a 7-day conversion budget
      // per step — first view, first click within 7 days OF THAT VIEW,
      // first purchase within 7 days of that click. The unbounded funnel
      // credits a purchase two years later; attribution and campaign
      // reporting never do. Output is the step summary (entrants +
      // conversion in exact basis points), the form a funnel dashboard
      // reads. Scale shape identical to events_funnel: three user_id-
      // keyed aggregations chained on the previous stage's timestamp,
      // then ONE scalar rollup (auto-allowed single-row aggregate).
      val week = 604800L
      val ev = t(s, d, "events").select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("es"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("es")).as("view_s"))
      val clicks = ev.filter(col("event_type") === "click")
        .join(views, "user_id")
        .filter(col("es") > col("view_s") && col("es") <= col("view_s") + week)
        .groupBy(col("user_id")).agg(min(col("es")).as("click_s"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .join(clicks, "user_id")
        .filter(col("es") > col("click_s") && col("es") <= col("click_s") + week)
        .groupBy(col("user_id")).agg(min(col("es")).as("purchase_s"))
      views
        .join(clicks, Seq("user_id"), "left")
        .join(purchases, Seq("user_id"), "left")
        .agg(count(lit(1)).as("n_view"),
          count(col("click_s")).as("n_click_7d"),
          count(col("purchase_s")).as("n_purchase_7d"))
        .select(col("n_view"), col("n_click_7d"), col("n_purchase_7d"),
          expr("(n_click_7d * 10000) div n_view").as("click_bp"),
          expr("case when n_click_7d > 0 then (n_purchase_7d * 10000) div n_click_7d end")
            .as("purchase_bp"))
    }),

    // ---- sort / limit / set ops ------------------------------------------
    "sort_limit" -> ((s, d) => {
      t(s, d, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .limit(100)
    }),

    "set_union" -> ((s, d) => {
      t(s, d, "customer").select(col("c_nationkey").as("nkey"))
        .unionByName(t(s, d, "supplier").select(col("s_nationkey").as("nkey")))
        .groupBy(col("nkey")).agg(count(lit(1)).as("n"))
        .orderBy("nkey")
    }),

    "set_intersect" -> ((s, d) => {
      t(s, d, "customer").select(col("c_nationkey").as("nkey"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nkey")))
        .orderBy("nkey")
    }),

    "set_except" -> ((s, d) => {
      t(s, d, "customer").select(col("c_nationkey").as("nkey"))
        .except(t(s, d, "supplier").select(col("s_nationkey").as("nkey")))
        .orderBy("nkey")
    }),

    // ---- scalar function suites ------------------------------------------
    "fn_string" -> ((s, d) => {
      t(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        lower(col("p_brand")).as("lo_brand"),
        substring(col("p_name"), 1, 8).as("prefix8"),
        concat_ws("#", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_type"), " ", "_").as("type_u"),
        length(col("p_name")).as("name_len"),
        col("p_name").startsWith("a").as("starts_a"),
        instr(col("p_name"), "re").as("pos_re"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
        translate(col("p_brand"), "#", "_").as("brand_t"))
        .orderBy("p_partkey")
    }),

    "fn_date" -> ((s, d) => {
      t(s, d, "orders")
        .withColumn("od", to_date(col("o_orderdate")))
        .select(
          col("o_orderkey"), col("od"),
          year(col("od")).as("y"), month(col("od")).as("m"), dayofmonth(col("od")).as("dd"),
          quarter(col("od")).as("q"),
          date_add(col("od"), 30).as("plus30"),
          datediff(col("od"), lit("1995-01-01").cast("date")).as("days_since"),
          trunc(col("od"), "month").as("month_start"),
          last_day(col("od")).as("month_end"))
        .orderBy("o_orderkey")
    }),

    "fn_math" -> ((s, d) => {
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (dec2(col("l_extendedprice")) * (one - dec2(col("l_discount")))
          * (one + dec2(col("l_tax")))).cast("double").as("charge"),
        (dec2(col("l_discount")) * 100).cast("double").as("disc_pct"),
        ceil(col("l_quantity")).cast("long").as("qty_ceil"),
        floor(col("l_quantity")).cast("long").as("qty_floor"),
        abs(dec2(col("l_extendedprice")) - lit(1000).cast("decimal(10,2)"))
          .cast("double").as("abs_delta"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        pmod(col("l_orderkey"), lit(7)).as("key_mod7"),
        greatest(col("l_quantity"), col("l_discount")).as("gmax"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
        // charge breaks the tie so the output order is total
        .orderBy("l_orderkey", "l_linenumber", "charge")
    }),

    "fn_array" -> ((s, d) => {
      t(s, d, "embeddings").select(
        col("vec_id"), col("label"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first_v"),
        element_at(col("embedding"), 64).as("last_v"),
        array_max(col("embedding")).as("max_v"),
        array_min(col("embedding")).as("min_v"),
        // array-valued outputs crash the driver's pandas hash (ndarray is
        // unhashable) — project scalars out of the slice/sort instead
        element_at(slice(col("embedding"), 1, 3), 3).as("head3_last"),
        element_at(sort_array(slice(col("embedding"), 1, 5)), 2).as("sorted5_2nd"))
        .orderBy("vec_id")
    }),

    "fn_map" -> ((s, d) => {
      // MapType surface: build a per-row map, then extract/inspect it. The
      // oracle verifies the VALUES via their scalar equivalents (DuckDB map
      // extraction semantics vary by version; the values are the contract).
      val m = map(lit("brand"), col("p_brand"), lit("type"), col("p_type"))
      t(s, d, "part").select(
        col("p_partkey"),
        element_at(m, "brand").as("m_brand"),
        element_at(m, "nope").as("m_missing"),
        size(m).as("m_size"),
        array_join(map_keys(m), ",").as("m_keys"),
        map_contains_key(m, "type").as("has_type"))
        .orderBy("p_partkey")
    }),

    "fn_json" -> ((s, d) => {
      t(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").try_cast("long").as("k_int"))
        .orderBy("event_id")
    }),

    // ---- time buckets (batch form of the streaming tumbling window) ------
    "stream_tumbling" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 minute"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("value"))).cast("double").as("sum_value"))
        .select(unix_timestamp(col("window.start")).as("bucket_s"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("bucket_s", "event_type")
    }),

    // ---- subquery / pivot / headline -------------------------------------
    "sql_surface" -> ((s, d) => {
      // the spark.sql(...) entry point over registered views — same engine,
      // SQL front end (everything else on the surface uses the DSL)
      t(s, d, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT o_orderpriority, count(*) AS n,
          |CAST(SUM(CAST(o_totalprice AS DECIMAL(10,2))) AS DOUBLE) AS sum_price,
          |MIN(o_orderkey) AS min_key
          |FROM orders_v GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    }),

    "subquery_scalar" -> ((s, d) => {
      // a TRUE scalar subquery, so the engine's subquery planning path is
      // exercised (Subquery hosting expressions) rather than a hand-composed
      // crossJoin: each subquery executes as a tiny side job whose
      // single-row result feeds the main scan's filter as a runtime
      // literal — no nested-loop join appears anywhere in the plan.
      t(s, d, "part").createOrReplaceTempView("graft_sq_part")
      t(s, d, "lineitem").createOrReplaceTempView("graft_sq_lineitem")
      s.sql(
        """SELECT count(*) AS n_above,
          |       (SELECT max(p_retailprice) FROM graft_sq_part) AS max_retail
          |FROM graft_sq_lineitem
          |WHERE l_extendedprice > (SELECT max(p_retailprice) FROM graft_sq_part)""".stripMargin)
    }),

    "subquery_exists" -> ((s, d) => {
      // correlated EXISTS — Catalyst's decorrelation rewrites the per-row
      // subquery into one LEFT SEMI join on the correlation key: the scan
      // of orders happens once, not once per customer row
      t(s, d, "customer").createOrReplaceTempView("graft_sq_cust")
      t(s, d, "orders").createOrReplaceTempView("graft_sq_ord")
      s.sql(
        """SELECT c.c_custkey, c.c_name FROM graft_sq_cust c
          |WHERE EXISTS (SELECT 1 FROM graft_sq_ord o
          |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
          |ORDER BY c.c_custkey""".stripMargin)
    }),

    "subquery_correlated" -> ((s, d) => {
      // correlated scalar aggregate — decorrelates into a per-key aggregate
      // joined back on the correlation key (max, not avg: max is
      // order-insensitive, so both engines agree bit-for-bit; a float avg's
      // summation order would not). Counts lineitems holding their part's
      // maximum quantity.
      t(s, d, "lineitem").createOrReplaceTempView("graft_sq_li")
      s.sql(
        """SELECT count(*) AS n_at_max
          |FROM graft_sq_li l
          |WHERE l.l_quantity = (SELECT max(l2.l_quantity) FROM graft_sq_li l2
          |                      WHERE l2.l_partkey = l.l_partkey)""".stripMargin)
    }),

    "pivot_manual" -> ((s, d) => {
      // conditional aggregation (portable pivot)
      t(s, d, "documents")
        .groupBy(col("lang"))
        .agg(
          sum(when(col("source") === "src0", 1).otherwise(0)).as("n_src0"),
          sum(when(col("source") === "src1", 1).otherwise(0)).as("n_src1"),
          sum(when(col("source") === "src2", 1).otherwise(0)).as("n_src2"),
          sum(when(!col("source").isin("src0", "src1", "src2"), 1).otherwise(0)).as("n_other"))
        .orderBy("lang")
    }),

    "top_revenue" -> ((s, d) => {
      // TPC-H Q3 shape: filtered 3-way join, exact-decimal revenue, top 10
      // raw-timestamp bounds so both date filters push down to the scans:
      // date < 1998-01-01  ≡  ts < 1998-01-01 00:00
      // date > 1998-01-01  ≡  ts >= 1998-01-02 00:00
      val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, d, "orders").filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = t(s, d, "lineitem").filter(col("l_shipdate") >= lit("1998-01-02").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), to_date(col("o_orderdate")).as("order_date"))
        .agg(rev.as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
    })
  )

  val oracles: Map[String, String] = Map(
    "scan_parquet" ->
      """SELECT count(*) AS n_rows, min(l_orderkey) AS min_key, max(l_orderkey) AS max_key,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS sum_qty FROM lineitem""".stripMargin,

    "project_rename" ->
      """SELECT p_partkey AS part_id, p_name AS part_name, p_brand AS brand,
        |p_retailprice AS retail_price FROM part ORDER BY part_id""".stripMargin,

    "filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate::DATE AS ship_date
        |FROM lineitem
        |WHERE l_shipdate::DATE BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
        |  AND l_discount >= 0.03 AND l_quantity < 25 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber, l_quantity, ship_date""".stripMargin,

    "join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,

    "join_hash" ->
      s"""SELECT o_orderpriority, count(*) AS n_lines, $revSql AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "join_multiway" ->
      s"""SELECT r_name, n_name, count(*) AS n_lines, $revSql AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(10,2))) AS DOUBLE), 0.0) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 20000)
        |ORDER BY c_custkey""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "join_full" ->
      """WITH big AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 150000),
        |rich AS (SELECT DISTINCT c_custkey AS k2 FROM customer WHERE c_acctbal > 5000)
        |SELECT
        |  SUM(CASE WHEN k IS NOT NULL AND k2 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_both,
        |  SUM(CASE WHEN k2 IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_left_only,
        |  SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_right_only
        |FROM big FULL OUTER JOIN rich ON k = k2""".stripMargin,

    "join_asof" ->
      """SELECT event_id, user_id, asof_view FROM (
        |  SELECT event_id, user_id, event_type,
        |    LAST_VALUE(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY floor(epoch(ts))::BIGINT, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_view
        |  FROM events WHERE event_type IN ('click', 'view'))
        |WHERE event_type = 'click' ORDER BY event_id""".stripMargin,

    "join_asof_tol" ->
      """SELECT event_id, user_id,
        |  CASE WHEN fresh THEN v_eid END AS asof_view,
        |  CASE WHEN fresh THEN es - v_es END AS staleness_s
        |FROM (
        |  SELECT event_id, user_id, event_type, es, v_eid, v_es,
        |    (v_es IS NOT NULL AND es - v_es <= 3600) AS fresh
        |  FROM (
        |    SELECT event_id, user_id, event_type, floor(epoch(ts))::BIGINT AS es,
        |      LAST_VALUE(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS) OVER w AS v_eid,
        |      LAST_VALUE(CASE WHEN event_type = 'view' THEN floor(epoch(ts))::BIGINT END IGNORE NULLS) OVER w AS v_es
        |    FROM events WHERE event_type IN ('click', 'view')
        |    WINDOW w AS (PARTITION BY user_id ORDER BY floor(epoch(ts))::BIGINT, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))
        |WHERE event_type = 'click' ORDER BY event_id""".stripMargin,

    "join_range" ->
      """SELECT s_suppkey, count(*) AS n_parts, min(p_partkey) AS min_part, max(p_partkey) AS max_part
        |FROM part JOIN supplier ON p_retailprice >= s_acctbal AND p_retailprice < s_acctbal + 500.0
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin,

    "agg_groupby" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS sum_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) AS sum_base_price,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (CAST(1 AS DECIMAL(10,2)) - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE) AS sum_disc_price,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (CAST(1 AS DECIMAL(10,2)) - CAST(l_discount AS DECIMAL(10,2))) * (CAST(1 AS DECIMAL(10,2)) + CAST(l_tax AS DECIMAL(10,2)))) AS DOUBLE) AS sum_charge,
        |ROUND(AVG(l_quantity), 2) AS avg_qty,
        |count(*) AS count_order
        |FROM lineitem WHERE l_shipdate::DATE <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "agg_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts, TRUE AS within_10pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS d_parts,
        |count(DISTINCT l_suppkey) AS d_supps, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_percentile" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty,
        |quantile_cont(l_quantity, 0.9) AS p90_qty, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_approx_percentile" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS exact_med,
        |count(*) AS n, TRUE AS within_10pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS sum_qty,
        |count(*) AS n, GROUPING(l_returnflag)::BIGINT AS g_flag, GROUPING(l_linestatus)::BIGINT AS g_status
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(10,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS sum_qty,
        |count(*) AS n, GROUPING(l_returnflag)::BIGINT AS g_flag, GROUPING(l_linestatus)::BIGINT AS g_status
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "window_rank" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders) WHERE rk <= 3
        |ORDER BY o_custkey, rk, o_orderkey""".stripMargin,

    "window_lag" ->
      """SELECT event_id, user_id, value, prev_value,
        |CAST(CAST(value AS DECIMAL(10,2)) - CAST(prev_value AS DECIMAL(10,2)) AS DOUBLE) AS delta FROM (
        |  SELECT event_id, user_id, value,
        |         LAG(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value
        |  FROM events) ORDER BY event_id""".stripMargin,

    "window_frame" ->
      """SELECT o_custkey, o_orderkey,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(10,2))) OVER (
        |  PARTITION BY o_custkey ORDER BY o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "window_range" ->
      """SELECT o_custkey, o_orderkey, epoch_day,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(10,2))) OVER (
        |  PARTITION BY o_custkey ORDER BY epoch_day
        |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_30d
        |FROM (SELECT *, date_diff('day', DATE '1970-01-01', o_orderdate)::BIGINT AS epoch_day
        |      FROM orders)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "window_ntile" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS price_quartile
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "window_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |FIRST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_price,
        |LAST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "agg_collect" ->
      """SELECT n_regionkey,
        |array_to_string(list_sort(list(n_name)), '|') AS names,
        |len(list_distinct(list(n_name))) AS n_distinct,
        |count(*) AS n
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

    "fn_struct" ->
      """SELECT p_partkey, p_brand AS s_brand, p_retailprice AS s_price,
        |p_brand AS nested_brand
        |FROM part ORDER BY p_partkey""".stripMargin,

    "sessionize" ->
      """SELECT user_id, event_id,
        |SUM(is_new) OVER (PARTITION BY user_id ORDER BY event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_seq
        |FROM (
        |  SELECT user_id, event_id,
        |    CASE WHEN prev_ep IS NULL OR ep - prev_ep > 3600 THEN 1 ELSE 0 END AS is_new
        |  FROM (
        |    SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS ep,
        |           LAG(floor(epoch(ts))::BIGINT, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ep
        |    FROM events))
        |ORDER BY user_id, event_id""".stripMargin,

    "events_funnel" ->
      """WITH e AS (SELECT user_id, event_type, floor(epoch(ts))::BIGINT AS es FROM events),
        |v AS (SELECT user_id, min(es) AS view_s FROM e WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(es) AS click_s FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND es > view_s GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(es) AS purchase_s FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND es > click_s GROUP BY e.user_id)
        |SELECT v.user_id, view_s, click_s, purchase_s
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        |ORDER BY v.user_id""".stripMargin,

    "events_funnel_window" ->
      """WITH e AS (SELECT user_id, event_type, floor(epoch(ts))::BIGINT AS es FROM events),
        |v AS (SELECT user_id, min(es) AS view_s FROM e WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(es) AS click_s FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND es > view_s AND es <= view_s + 604800
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(es) AS purchase_s FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND es > click_s AND es <= click_s + 604800
        |      GROUP BY e.user_id),
        |f AS (SELECT count(*)::BIGINT AS n_view, count(click_s)::BIGINT AS n_click_7d,
        |             count(purchase_s)::BIGINT AS n_purchase_7d
        |      FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id))
        |SELECT n_view, n_click_7d, n_purchase_7d,
        |       ((n_click_7d * 10000) // n_view)::BIGINT AS click_bp,
        |       (CASE WHEN n_click_7d > 0 THEN (n_purchase_7d * 10000) // n_click_7d END)::BIGINT
        |         AS purchase_bp
        |FROM f""".stripMargin,

    "sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC LIMIT 100""".stripMargin,

    "set_union" ->
      """SELECT nkey, count(*) AS n FROM (
        |  SELECT c_nationkey AS nkey FROM customer
        |  UNION ALL SELECT s_nationkey FROM supplier)
        |GROUP BY nkey ORDER BY nkey""".stripMargin,

    "set_intersect" ->
      """SELECT c_nationkey AS nkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nkey""".stripMargin,

    "set_except" ->
      """SELECT c_nationkey AS nkey FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nkey""".stripMargin,

    "fn_string" ->
      """SELECT p_partkey, upper(p_name) AS up_name, lower(p_brand) AS lo_brand,
        |substring(p_name, 1, 8) AS prefix8, concat_ws('#', p_brand, p_type) AS brand_type,
        |regexp_replace(p_type, ' ', '_', 'g') AS type_u, length(p_name) AS name_len,
        |starts_with(p_name, 'a') AS starts_a, instr(p_name, 're') AS pos_re,
        |lpad(p_size::VARCHAR, 4, '0') AS size_pad, translate(p_brand, '#', '_') AS brand_t
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_date" ->
      """SELECT o_orderkey, o_orderdate::DATE AS od,
        |year(o_orderdate::DATE) AS y, month(o_orderdate::DATE) AS m, day(o_orderdate::DATE) AS dd,
        |quarter(o_orderdate::DATE) AS q,
        |o_orderdate::DATE + 30 AS plus30,
        |datediff('day', DATE '1995-01-01', o_orderdate::DATE) AS days_since,
        |date_trunc('month', o_orderdate::DATE)::DATE AS month_start,
        |last_day(o_orderdate::DATE) AS month_end
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |CAST(CAST(l_extendedprice AS DECIMAL(10,2)) * (CAST(1 AS DECIMAL(10,2)) - CAST(l_discount AS DECIMAL(10,2))) * (CAST(1 AS DECIMAL(10,2)) + CAST(l_tax AS DECIMAL(10,2))) AS DOUBLE) AS charge,
        |CAST(CAST(l_discount AS DECIMAL(10,2)) * 100 AS DOUBLE) AS disc_pct,
        |ceil(l_quantity)::BIGINT AS qty_ceil, floor(l_quantity)::BIGINT AS qty_floor,
        |CAST(abs(CAST(l_extendedprice AS DECIMAL(10,2)) - CAST(1000 AS DECIMAL(10,2))) AS DOUBLE) AS abs_delta,
        |sqrt(l_quantity) AS qty_sqrt,
        |l_orderkey % 7 AS key_mod7,
        |greatest(l_quantity, l_discount) AS gmax
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, charge""".stripMargin,

    "fn_array" ->
      """SELECT vec_id, label, len(embedding) AS dim,
        |embedding[1] AS first_v, embedding[64] AS last_v,
        |list_aggregate(embedding, 'max') AS max_v, list_aggregate(embedding, 'min') AS min_v,
        |embedding[3] AS head3_last, list_sort(embedding[1:5])[2] AS sorted5_2nd
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "fn_map" ->
      """SELECT p_partkey, p_brand AS m_brand, NULL::VARCHAR AS m_missing, 2::INT AS m_size,
        |'brand,type' AS m_keys, TRUE AS has_type
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_json" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k_str,
        |TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
        |FROM events ORDER BY event_id""".stripMargin,

    "stream_tumbling" ->
      """SELECT (floor(epoch(ts))::BIGINT // 60) * 60 AS bucket_s, event_type, count(*) AS n,
        |CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY bucket_s, event_type ORDER BY bucket_s, event_type""".stripMargin,

    "sql_surface" ->
      """SELECT o_orderpriority, count(*) AS n,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(10,2))) AS DOUBLE) AS sum_price,
        |MIN(o_orderkey) AS min_key
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "subquery_scalar" ->
      """SELECT count(*) AS n_above, (SELECT max(p_retailprice) FROM part) AS max_retail
        |FROM lineitem WHERE l_extendedprice > (SELECT max(p_retailprice) FROM part)""".stripMargin,

    "subquery_exists" ->
      """SELECT c.c_custkey, c.c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
        |ORDER BY c.c_custkey""".stripMargin,

    "subquery_correlated" ->
      """SELECT count(*) AS n_at_max
        |FROM lineitem l
        |WHERE l.l_quantity = (SELECT max(l2.l_quantity) FROM lineitem l2
        |                      WHERE l2.l_partkey = l.l_partkey)""".stripMargin,

    "pivot_manual" ->
      """SELECT lang,
        |SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)::BIGINT AS n_src0,
        |SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)::BIGINT AS n_src1,
        |SUM(CASE WHEN source = 'src2' THEN 1 ELSE 0 END)::BIGINT AS n_src2,
        |SUM(CASE WHEN source NOT IN ('src0','src1','src2') THEN 1 ELSE 0 END)::BIGINT AS n_other
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "top_revenue" ->
      s"""SELECT o_orderkey, o_orderdate::DATE AS order_date, $revSql AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate::DATE < DATE '1998-01-01' AND l_shipdate::DATE > DATE '1998-01-01'
         |GROUP BY o_orderkey, order_date
         |ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin
  )
}
