package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/** The reference's ingestion operators (SURVEY §2-A engine op names)
  * re-expressed as oracle-checkable data operators over the test tables.
  *
  * The file-oriented implementation of the same semantics lives in
  * graft.ingest.CtbIngest (driven by ScalaTest on real TSV fixtures);
  * these queries exercise the identical per-row rules — comma-stripped
  * integer casts, strict date parsing, empty->NULL, width filtering and the
  * row-drop composite — as pure Catalyst expressions, so the DuckDB oracle
  * can verify them (reference main.py:287-414).
  */
object CtbOps extends Pack {

  // Synthesized "dirty TSV field" columns derived deterministically from
  // orders: a comma-formatted integer that is corrupt for keys % 97 == 0 and
  // empty for keys % 7 == 0, and a date string that is invalid for % 89 == 0
  // and d/m/y-formatted (wrong pattern -> parse failure) for % 53 == 0.
  private def qtyStr: Column = {
    val n = col("o_orderkey")
    val commaFmt = when(n >= 1000,
      concat(expr("o_orderkey div 1000"), lit(","),
        lpad((n % 1000).cast("string"), 3, "0")))
      .otherwise(n.cast("string"))
    when(n % 7 === 0, lit(""))
      .when(n % 97 === 0, concat(lit("x"), n.cast("string")))
      .otherwise(commaFmt)
  }
  private val qtyStrSql =
    """CASE WHEN o_orderkey % 7 = 0 THEN ''
      |     WHEN o_orderkey % 97 = 0 THEN 'x' || o_orderkey::VARCHAR
      |     WHEN o_orderkey >= 1000 THEN (o_orderkey // 1000)::VARCHAR || ',' || lpad((o_orderkey % 1000)::VARCHAR, 3, '0')
      |     ELSE o_orderkey::VARCHAR END""".stripMargin

  private def dateStr: Column = {
    val n = col("o_orderkey")
    val od = to_date(col("o_orderdate"))
    when(n % 89 === 0, lit("2024-13-77"))
      .when(n % 53 === 0, date_format(od, "dd/MM/yyyy"))
      .otherwise(date_format(od, "yyyy-MM-dd"))
  }
  private val dateStrSql =
    """CASE WHEN o_orderkey % 89 = 0 THEN '2024-13-77'
      |     WHEN o_orderkey % 53 = 0 THEN strftime(o_orderdate::DATE, '%d/%m/%Y')
      |     ELSE strftime(o_orderdate::DATE, '%Y-%m-%d') END""".stripMargin

  private def parseQty(c: Column): Column =
    regexp_replace(c, ",", "").try_cast("long")
  private def parseDate(c: Column): Column = try_to_date(c, "yyyy-MM-dd")

  private val parseQtySql = "TRY_CAST(replace(%s, ',', '') AS BIGINT)"
  private val parseDateSql = "try_strptime(%s, '%%Y-%%m-%%d')::DATE"

  val queries: Map[String, Q] = Map(
    // A1: source listing with a pushed-down predicate (the Gmail query /
    // CTB-prefix filter idiom -> filter + aggregate over a manifest)
    "source_list" -> ((s, d) => {
      t(s, d, "documents")
        .filter(col("source").startsWith("src") && col("n_chars") > 0)
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .orderBy("source")
    }),

    // A3: base64 blob decode (the attachment fetch's urlsafe-b64 step)
    "unbase64_blob" -> ((s, d) => {
      // Spark's base64() emits RFC-2045 MIME output (CRLF every 76 chars);
      // strip the chunking so it matches DuckDB's RFC-4648 form
      t(s, d, "documents")
        .select(col("doc_id"),
          regexp_replace(base64(to_binary(col("text"), lit("utf-8"))), "\r\n", "").as("b64"),
          length(unbase64(base64(to_binary(col("text"), lit("utf-8"))))).as("rt_len"))
        .orderBy("doc_id")
    }),

    // A4: nested-envelope flatten + prefix filter + first-match-wins
    "flatten_filter_first" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      t(s, d, "events")
        .filter(col("event_type") === "click")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("value"))
        .orderBy("user_id")
    }),

    // B3: header normalization as a data op
    "clean_headers" -> ((s, d) => {
      val raw = concat(lit("  "), col("source"), lit(" name \r"))
      t(s, d, "documents").select(col("source")).distinct()
        .select(col("source"),
          upper(regexp_replace(regexp_replace(trim(raw), "\r", ""), " ", "_")).as("cleaned"))
        .orderBy("source")
    }),

    // B5: schema validation (membership check against a known set)
    "validate_schema" -> ((s, d) => {
      t(s, d, "documents").select(col("source")).distinct()
        .withColumn("status",
          when(col("source").isin("src0", "src1", "src2", "src3", "src4"), "known")
            .otherwise("unknown"))
        .orderBy("source")
    }),

    // B6: row-width filter over synthesized delimited lines
    "filter_malformed" -> ((s, d) => {
      val line = when(col("o_orderkey") % 11 === 0,
        concat_ws("\t", col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"), lit("EXTRA")))
        .otherwise(concat_ws("\t", col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")))
      t(s, d, "orders")
        .select(size(split(line, "\t", -1)).as("width"))
        .groupBy("width").agg(count(lit(1)).as("n"))
        .orderBy("width")
    }),

    // B7: field trimming
    "trim_fields" -> ((s, d) => {
      val padded = concat(lit("  "), col("p_name"), lit("  "))
      t(s, d, "part")
        .select(col("p_partkey"), trim(padded).as("trimmed"),
          length(padded).as("len_before"), length(trim(padded)).as("len_after"))
        .orderBy("p_partkey")
    }),

    // B8: empty string -> NULL
    "null_if_empty" -> ((s, d) => {
      val v = when(col("p_partkey") % 5 === 0, lit("")).otherwise(col("p_brand"))
      t(s, d, "part")
        .select(col("p_partkey"), nullif(v, lit("")).as("brand_or_null"),
          nullif(v, lit("")).isNull.as("was_empty"))
        .orderBy("p_partkey")
    }),

    // B9: INTEGER cast with thousands-separator stripping
    "cast_int_comma" -> ((s, d) => {
      t(s, d, "orders")
        .select(col("o_orderkey"), qtyStr.as("raw_qty"),
          parseQty(qtyStr).as("qty"),
          (qtyStr === "" || parseQty(qtyStr).isNotNull).as("cast_ok"))
        .orderBy("o_orderkey")
    }),

    // B10: strict yyyy-MM-dd date cast
    "cast_date_iso" -> ((s, d) => {
      t(s, d, "orders")
        .select(col("o_orderkey"), dateStr.as("raw_date"),
          parseDate(dateStr).as("parsed"),
          parseDate(dateStr).isNotNull.as("cast_ok"))
        .orderBy("o_orderkey")
    }),

    // B12: the row-drop composite — summary counts of kept vs dropped
    "drop_bad_rows" -> ((s, d) => {
      val qOk = qtyStr === "" || parseQty(qtyStr).isNotNull
      val dOk = parseDate(dateStr).isNotNull
      t(s, d, "orders")
        .select((qOk && dOk).as("row_ok"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("row_ok"), 1).otherwise(0)).as("n_kept"),
          sum(when(!col("row_ok"), 1).otherwise(0)).as("n_dropped"))
    }),

    // B1-B12 fused: the whole ingest as one query — typed survivors only
    "ingest_ctb" -> ((s, d) => {
      val qOk = qtyStr === "" || parseQty(qtyStr).isNotNull
      val dOk = parseDate(dateStr).isNotNull
      t(s, d, "orders")
        .filter(qOk && dOk)
        .select(col("o_orderkey"), parseQty(qtyStr).as("qty"), parseDate(dateStr).as("due_date"))
        .orderBy("o_orderkey")
    }),

    // B13: the error channel — one row per failed field with a reason
    "collect_errors" -> ((s, d) => {
      val badQty = t(s, d, "orders")
        .filter(qtyStr =!= "" && parseQty(qtyStr).isNull)
        .select(col("o_orderkey"), lit("bad_int").as("err_type"), qtyStr.as("raw_value"))
      val badDate = t(s, d, "orders")
        .filter(parseDate(dateStr).isNull)
        .select(col("o_orderkey"), lit("bad_date").as("err_type"), dateStr.as("raw_value"))
      badQty.unionByName(badDate).orderBy("o_orderkey", "err_type")
    })
  )

  val oracles: Map[String, String] = Map(
    "source_list" ->
      """SELECT source, count(*) AS n_docs FROM documents
        |WHERE starts_with(source, 'src') AND n_chars > 0
        |GROUP BY source ORDER BY source""".stripMargin,

    "unbase64_blob" ->
      """SELECT doc_id, base64(encode(text)) AS b64,
        |octet_length(from_base64(base64(encode(text)))) AS rt_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "flatten_filter_first" ->
      """SELECT user_id, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        |  FROM events WHERE event_type = 'click') WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    "clean_headers" ->
      """SELECT source,
        |upper(replace(replace(trim('  ' || source || ' name ' || chr(13)), chr(13), ''), ' ', '_')) AS cleaned
        |FROM (SELECT DISTINCT source FROM documents) ORDER BY source""".stripMargin,

    "validate_schema" ->
      """SELECT source,
        |CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 'known' ELSE 'unknown' END AS status
        |FROM (SELECT DISTINCT source FROM documents) ORDER BY source""".stripMargin,

    "filter_malformed" ->
      """SELECT len(string_split(line, chr(9))) AS width, count(*) AS n FROM (
        |  SELECT CASE WHEN o_orderkey % 11 = 0
        |    THEN o_orderkey::VARCHAR || chr(9) || o_orderstatus || chr(9) || o_totalprice::VARCHAR || chr(9) || 'EXTRA'
        |    ELSE o_orderkey::VARCHAR || chr(9) || o_orderstatus || chr(9) || o_totalprice::VARCHAR END AS line
        |  FROM orders)
        |GROUP BY width ORDER BY width""".stripMargin,

    "trim_fields" ->
      """SELECT p_partkey, trim('  ' || p_name || '  ') AS trimmed,
        |length('  ' || p_name || '  ') AS len_before,
        |length(trim('  ' || p_name || '  ')) AS len_after
        |FROM part ORDER BY p_partkey""".stripMargin,

    "null_if_empty" ->
      """SELECT p_partkey,
        |nullif(CASE WHEN p_partkey % 5 = 0 THEN '' ELSE p_brand END, '') AS brand_or_null,
        |(nullif(CASE WHEN p_partkey % 5 = 0 THEN '' ELSE p_brand END, '') IS NULL) AS was_empty
        |FROM part ORDER BY p_partkey""".stripMargin,

    "cast_int_comma" ->
      (s"""SELECT o_orderkey, ($qtyStrSql) AS raw_qty,
         |""" + parseQtySql.format(s"($qtyStrSql)") + s""" AS qty,
         |(($qtyStrSql) = '' OR """ + parseQtySql.format(s"($qtyStrSql)") + s""" IS NOT NULL) AS cast_ok
         |FROM orders ORDER BY o_orderkey""").stripMargin,

    "cast_date_iso" ->
      (s"""SELECT o_orderkey, ($dateStrSql) AS raw_date,
         |""" + parseDateSql.format(s"($dateStrSql)") + s""" AS parsed,
         |(""" + parseDateSql.format(s"($dateStrSql)") + s""" IS NOT NULL) AS cast_ok
         |FROM orders ORDER BY o_orderkey""").stripMargin,

    "drop_bad_rows" ->
      (s"""WITH flags AS (
         |  SELECT ((($qtyStrSql) = '' OR """ + parseQtySql.format(s"($qtyStrSql)") + s""" IS NOT NULL)
         |     AND """ + parseDateSql.format(s"($dateStrSql)") + s""" IS NOT NULL) AS row_ok
         |  FROM orders)
         |SELECT count(*) AS n_total,
         |SUM(CASE WHEN row_ok THEN 1 ELSE 0 END)::BIGINT AS n_kept,
         |SUM(CASE WHEN NOT row_ok THEN 1 ELSE 0 END)::BIGINT AS n_dropped FROM flags""").stripMargin,

    "ingest_ctb" ->
      (s"""SELECT o_orderkey, """ + parseQtySql.format(s"($qtyStrSql)") + s""" AS qty,
         |""" + parseDateSql.format(s"($dateStrSql)") + s""" AS due_date
         |FROM orders
         |WHERE (($qtyStrSql) = '' OR """ + parseQtySql.format(s"($qtyStrSql)") + s""" IS NOT NULL)
         |  AND """ + parseDateSql.format(s"($dateStrSql)") + s""" IS NOT NULL
         |ORDER BY o_orderkey""").stripMargin,

    "collect_errors" ->
      (s"""SELECT o_orderkey, 'bad_int' AS err_type, ($qtyStrSql) AS raw_value FROM orders
         |WHERE ($qtyStrSql) <> '' AND """ + parseQtySql.format(s"($qtyStrSql)") + s""" IS NULL
         |UNION ALL
         |SELECT o_orderkey, 'bad_date' AS err_type, ($dateStrSql) AS raw_value FROM orders
         |WHERE """ + parseDateSql.format(s"($dateStrSql)") + s""" IS NULL
         |ORDER BY o_orderkey, err_type""").stripMargin
  )
}
