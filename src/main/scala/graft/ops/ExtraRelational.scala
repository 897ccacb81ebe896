package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.Tables.{t, Pack, Q}

/** Round-6 surface extensions: distribution-window statistics, wide-to-long
  * reshape, regexp scalar suite, calendar-interval arithmetic, an explicit
  * salted join (the manual skew remedy AQE's skew-split generalizes), PII
  * detection/redaction for training-data hygiene, and FILTER-clause /
  * histogram aggregates.
  *
  * Determinism rules (memory: cross-engine oracle parity):
  *   - money aggregates go through DECIMAL(10,2) and surface as DOUBLE;
  *   - percent_rank/cume_dist are single IEEE divisions of identical exact
  *     integers — bit-identical across engines;
  *   - histogram buckets come from floor(x / width) where both engines do
  *     ONE double division (never a double->int cast, which ROUNDS in
  *     DuckDB and TRUNCATES in Spark).
  */
object ExtraRelational extends Pack {

  private val S = 8 // salt fan-out for the skew join

  val queries: Map[String, Q] = Map(

    "window_cume" -> ((s, d) => {
      // distribution windows: percent_rank = (rank-1)/(N-1) and
      // cume_dist = |rows <= key| / N are rank statistics — ties share a
      // value, so engine-side sort nondeterminism can't leak; ntile needs
      // the unique o_orderkey tiebreak to be deterministic
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, d, "orders").select(
        col("o_orderkey"), col("o_orderpriority"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        ntile(4).over(w).as("quartile"))
        .orderBy("o_orderkey")
    }),

    "unpivot_wide" -> ((s, d) => {
      // wide->long reshape via the native unpivot operator (one Expand
      // node, no join/union of N scans — the SQL UNION ALL oracle reads
      // the table three times, this plan reads it once)
      t(s, d, "part").select(
        col("p_partkey"),
        col("p_size").cast("double").as("size"),
        col("p_retailprice").as("retailprice"),
        length(col("p_name")).cast("double").as("name_len"))
        .unpivot(
          Array(col("p_partkey")),
          Array(col("size"), col("retailprice"), col("name_len")),
          "metric", "value")
        .orderBy("p_partkey", "metric")
    }),

    "fn_regexp" -> ((s, d) => {
      // regexp scalar suite over real document text: global extraction
      // counts, group capture, boolean match, global replacement
      t(s, d, "documents").select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).as("n_words"),
        size(regexp_extract_all(col("text"), lit("[aeiou][a-z]*"), lit(0))).as("n_vowel_runs"),
        regexp_extract(col("text"), "([a-z]*v[a-z]*)", 1).as("first_v_word"),
        when(col("text").rlike("vector"), 1).otherwise(0).as("has_vector"),
        length(regexp_replace(col("text"), "[aeiou]", "")).as("len_novowels"))
        .orderBy("doc_id")
    }),

    "fn_interval" -> ((s, d) => {
      // calendar-interval arithmetic: day/month addition (month addition
      // clamps to month end in both engines), day diffs, truncation,
      // month-end resolution
      t(s, d, "orders").select(
        col("o_orderkey"),
        (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("plus_30d"),
        add_months(col("o_orderdate"), 2).as("plus_2m"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since_95"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        last_day(col("o_orderdate")).as("month_end"))
        .orderBy("o_orderkey")
    }),

    "join_salted_skew" -> ((s, d) => {
      // the manual skew remedy: a hot fact key floods one reducer in a
      // plain shuffle join, so the fact side salts each ROW into one of S
      // sub-keys (deterministic row hash — NOT a key hash, which would
      // keep the hot key whole) and the dim side replicates each row S
      // ways; (key, salt) equi-join spreads the hot key over S tasks and
      // the aggregate is salt-oblivious. AQE's skew-split automates this
      // for sort-merge joins; the explicit form works for any join and
      // any skew threshold, at the cost of an S-times dim replication.
      val fact = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"), col("l_quantity"))
        .withColumn("_salt",
          pmod(xxhash64(col("l_orderkey"), col("l_partkey"), col("l_linenumber")), lit(S.toLong)))
      val dim = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
        .withColumn("_salt", explode(sequence(lit(0L), lit(S.toLong - 1))))
      fact.join(dim,
          fact("l_orderkey") === dim("o_orderkey") && fact("_salt") === dim("_salt"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast(DecimalType(10, 2))).cast("double").as("sum_qty"))
        .orderBy("o_orderpriority")
    }),

    "text_pii" -> ((s, d) => {
      // PII hygiene for training corpora: the synthetic corpus carries no
      // PII, so deterministic pseudo-PII (derived from doc_id, identically
      // in the oracle) is woven in, then detected and redacted — the
      // detection/redaction pipeline is what's under test
      val synth = concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com or 192.168."),
        pmod(col("doc_id"), lit(256)), lit("."), pmod(col("doc_id"), lit(100)),
        lit(" ref user"), pmod(col("doc_id"), lit(7)), lit("@test.org"))
      val email = "[a-z0-9]+@[a-z]+\\.[a-z]+"
      val ipv4 = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"
      t(s, d, "documents").select(col("doc_id"), synth.as("t"))
        .select(
          col("doc_id"),
          size(regexp_extract_all(col("t"), lit(email), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("t"), lit(ipv4), lit(0))).as("n_ips"),
          length(regexp_replace(regexp_replace(col("t"), email, "[EMAIL]"),
            ipv4, "[IP]")).as("redacted_len"))
        .orderBy("doc_id")
    }),

    "agg_histogram" -> ((s, d) => {
      // fixed-width value histogram: ONE shuffle of (bucket, partials);
      // bucket boundaries via floor(x/width) — a single IEEE division is
      // bit-identical across engines where a double->int cast is not
      t(s, d, "orders")
        .groupBy(floor(col("o_totalprice") / lit(25000.0)).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice").cast(DecimalType(10, 2))).cast("double").as("min_price"),
          max(col("o_totalprice").cast(DecimalType(10, 2))).cast("double").as("max_price"))
        .orderBy("bucket")
    }),

    "agg_filtered" -> ((s, d) => {
      // FILTER-clause aggregates: conditional counts/sums inside ONE
      // hash aggregate (no self-joins, no second scan)
      t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          count(when(col("l_quantity") > 25, 1)).as("n_bulk"),
          coalesce(
            sum(when(col("l_discount") > 0.05, col("l_extendedprice").cast(DecimalType(10, 2))))
              .cast("double"), lit(0.0)).as("disc_rev"),
          countDistinct(when(col("l_linestatus") === "F", col("l_suppkey"))).as("supps_f"))
        .orderBy("l_returnflag")
    }))

  val oracles: Map[String, String] = Map(

    "window_cume" ->
      """SELECT o_orderkey, o_orderpriority,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  ntile(4) OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "unpivot_wide" ->
      """SELECT p_partkey, metric, value FROM (
        |  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        |  UNION ALL SELECT p_partkey, 'retailprice', p_retailprice FROM part
        |  UNION ALL SELECT p_partkey, 'name_len', CAST(length(p_name) AS DOUBLE) FROM part)
        |ORDER BY p_partkey, metric""".stripMargin,

    "fn_regexp" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '[a-z]+')) AS n_words,
        |  len(regexp_extract_all(text, '[aeiou][a-z]*')) AS n_vowel_runs,
        |  regexp_extract(text, '([a-z]*v[a-z]*)', 1) AS first_v_word,
        |  CASE WHEN regexp_matches(text, 'vector') THEN 1 ELSE 0 END AS has_vector,
        |  length(regexp_replace(text, '[aeiou]', '', 'g')) AS len_novowels
        |FROM documents ORDER BY doc_id""".stripMargin,

    "fn_interval" ->
      """SELECT o_orderkey,
        |  o_orderdate + INTERVAL 30 DAY AS plus_30d,
        |  (o_orderdate + INTERVAL 2 MONTH)::DATE AS plus_2m,
        |  date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_95,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  last_day(o_orderdate::DATE) AS month_end
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "join_salted_skew" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "text_pii" ->
      """WITH synth AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com or 192.168.' ||
        |    (doc_id % 256) || '.' || (doc_id % 100) || ' ref ' ||
        |    'user' || (doc_id % 7) || '@test.org' AS t
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(t, '[a-z0-9]+@[a-z]+\.[a-z]+')) AS n_emails,
        |  len(regexp_extract_all(t, '[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+')) AS n_ips,
        |  length(regexp_replace(regexp_replace(t,
        |    '[a-z0-9]+@[a-z]+\.[a-z]+', '[EMAIL]', 'g'),
        |    '[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+', '[IP]', 'g')) AS redacted_len
        |FROM synth ORDER BY doc_id""".stripMargin,

    "agg_histogram" ->
      """SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket,
        |  count(*) AS n,
        |  CAST(min(CAST(o_totalprice AS DECIMAL(10,2))) AS DOUBLE) AS min_price,
        |  CAST(max(CAST(o_totalprice AS DECIMAL(10,2))) AS DOUBLE) AS max_price
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,

    "agg_filtered" ->
      """SELECT l_returnflag,
        |  count(*) AS n,
        |  count(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
        |  CAST(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(10,2))) FILTER (WHERE l_discount > 0.05), 0) AS DOUBLE) AS disc_rev,
        |  count(DISTINCT l_suppkey) FILTER (WHERE l_linestatus = 'F') AS supps_f
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
