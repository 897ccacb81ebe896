package graft.ops

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DistributedRank vs the single-partition window it replaces, under RANDOM
  * data: random sizes (including empty), heavy duplicate sort values (so
  * the unique-id tiebreak is load-bearing), random input partitioning, and
  * random ntile widths. The model is Spark's own global window + ntile —
  * the exact thing the mergeable form must reproduce bit-for-bit.
  *
  * Default 15 samples (each runs real Spark jobs); deep-soak with
  * GRAFT_PROP_N=100.
  */
object DistributedRankProps extends Properties("DistributedRank") {

  private lazy val spark = SparkSpec.session

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(sys.env.getOrElse("GRAFT_PROP_N", "15").toInt)

  private val cases = for {
    n <- Gen.oneOf(0, 1, 2, 3, 7, 20, 101, 500)
    dupDomain <- Gen.choose(1, 12) // tiny domain -> massive sort-key ties
    parts <- Gen.choose(1, 9)
    tiles <- Gen.oneOf(2, 3, 5, 10)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield (n, dupDomain, parts, tiles, seed)

  property("rank, running sum and ntile match the global window exactly") =
    forAllNoShrink(cases) { case (n, dupDomain, parts, tiles, seed) =>
      import spark.implicits._
      val rnd = new scala.util.Random(seed)
      val rows = (1 to n).map(i =>
        (i.toLong, rnd.nextInt(dupDomain).toLong, rnd.nextInt(1000).toLong))
      val df = rows.toDF("id", "v", "amt").repartition(parts)

      val rk = DistributedRank.withGlobalRank(df,
        Seq(col("v").desc, col("id")), "r", cum = Some(("amt", "c")))
      val gotRows = rk.df.select("id", "r", "c").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet

      val w = Window.orderBy(col("v").desc, col("id"))
      val wantRows = df
        .withColumn("r", row_number().over(w).cast("long"))
        .withColumn("c", sum(col("amt")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("id", "r", "c").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet

      val tilesGot = rk.df.withColumn("t",
          DistributedRank.exactNtile(col("r"), rk.n, tiles))
        .select("id", "t").collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
      val tilesWant = df.withColumn("t", ntile(tiles).over(w))
        .select("id", "t").collect().map(x => x.getLong(0) -> x.getInt(1)).toMap

      val ok = gotRows == wantRows && rk.n == n.toLong &&
        rk.grandSum == rows.map(_._3).sum && tilesGot == tilesWant
      if (!ok) println(s"MISMATCH n=$n dup=$dupDomain parts=$parts tiles=$tiles seed=$seed")
      ok
    }
}
