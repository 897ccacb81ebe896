package graft.ops

import org.apache.spark.sql.functions._
import graft.udf.Udfs
import Tables._

/** Oracle-checked queries exercising the UDF/UDAF extension points.
  * The synthesized dirty field reuses CtbOps' deterministic generators so
  * the DuckDB oracle can reproduce the values with pure SQL arithmetic.
  */
object UdfQueries extends Pack {

  // same dirty-integer generator as CtbOps (kept textually identical)
  private val qtyStrSql =
    """CASE WHEN o_orderkey % 7 = 0 THEN ''
      |     WHEN o_orderkey % 97 = 0 THEN 'x' || o_orderkey::VARCHAR
      |     WHEN o_orderkey >= 1000 THEN (o_orderkey // 1000)::VARCHAR || ',' || lpad((o_orderkey % 1000)::VARCHAR, 3, '0')
      |     ELSE o_orderkey::VARCHAR END""".stripMargin

  private def qtyStr = {
    val n = col("o_orderkey")
    val commaFmt = when(n >= 1000,
      concat(expr("o_orderkey div 1000"), lit(","),
        lpad((n % 1000).cast("string"), 3, "0")))
      .otherwise(n.cast("string"))
    when(n % 7 === 0, lit(""))
      .when(n % 97 === 0, concat(lit("x"), n.cast("string")))
      .otherwise(commaFmt)
  }

  val queries: Map[String, Q] = Map(
    "udf_scalar" -> ((s, d) => {
      t(s, d, "orders")
        .select(col("o_orderkey"), qtyStr.as("raw_qty"),
          Udfs.parseIntComma(qtyStr).as("parsed"))
        .orderBy("o_orderkey")
    }),

    "udaf_agg" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(Udfs.errPermille(qtyStr).as("err_permille"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),

    "agg_topk" -> ((s, d) => {
      // top-3 orders by total price per priority via the bounded-heap
      // TopKAggregator: partial aggregation caps the shuffle at k rows per
      // (group × map partition), vs the window row_number plan that
      // shuffles+sorts every row of every group (see Udfs.TopKAggregator)
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(Udfs.topK(3)(col("o_totalprice").cast("double"), col("o_orderkey")).as("top"))
        .select(col("o_orderpriority"), posexplode(col("top")))
        .select(col("o_orderpriority"), (col("pos") + 1).cast("long").as("rank"),
          col("col.v").as("total"), col("col.k").as("okey"))
        .orderBy("o_orderpriority", "rank")
    })
  )

  val oracles: Map[String, String] = Map(
    "udf_scalar" ->
      s"""SELECT o_orderkey, ($qtyStrSql) AS raw_qty,
         |TRY_CAST(replace(($qtyStrSql), ',', '') AS BIGINT) AS parsed
         |FROM orders ORDER BY o_orderkey""".stripMargin,

    "udaf_agg" ->
      s"""SELECT o_orderpriority,
         |((SUM(CASE WHEN ($qtyStrSql) <> '' AND TRY_CAST(replace(($qtyStrSql), ',', '') AS BIGINT) IS NULL THEN 1 ELSE 0 END) * 1000)
         |  // count(*))::BIGINT AS err_permille,
         |count(*) AS n
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "agg_topk" ->
      """SELECT o_orderpriority, rank, total, okey FROM (
        |  SELECT o_orderpriority,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice::DOUBLE DESC, o_orderkey ASC) AS rank,
        |    o_totalprice::DOUBLE AS total, o_orderkey AS okey
        |  FROM orders)
        |WHERE rank <= 3 ORDER BY o_orderpriority, rank""".stripMargin
  )
}
