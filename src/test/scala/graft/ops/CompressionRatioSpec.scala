package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** The DEFLATE-ratio quality gate: ordering is the contract (exact
  * deflated byte counts are zlib-version detail and deliberately NOT
  * pinned) — boilerplate compresses far below prose, prose below noise;
  * counts are exact and totality covers empty/null text.
  */
class CompressionRatioSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("ratio ordering separates boilerplate, prose, and noise") {
    val rnd = new scala.util.Random(9)
    val boiler = ("lorem ipsum dolor " * 60).trim
    val prose = Seq.fill(120)(Seq("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")(rnd.nextInt(8))).mkString(" ")
    val noise = Seq.fill(900)((rnd.nextInt(94) + 33).toChar).mkString
    val df = Seq((1L, boiler), (2L, prose), (3L, noise)).toDF("doc_id", "text")
    val got = TextOps.compressionRatio(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // byte counts exact
    assert(got(1L)._1 == boiler.getBytes("UTF-8").length)
    assert(got(3L)._1 == 900L)
    // ordering: boilerplate << prose << noise
    assert(got(1L)._3 < got(2L)._3, s"boilerplate must compress better than prose: $got")
    assert(got(2L)._3 < got(3L)._3, s"prose must compress better than noise: $got")
    assert(got(1L)._3 < 200, s"repeated boilerplate should be highly compressible: $got")
    assert(got(3L)._3 > 700, s"random printable noise is near-incompressible: $got")
  }

  test("empty and null text degrade to ratio 1000, not a crash") {
    val df = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "abc"))
      .toDF("doc_id", "text")
    val got = TextOps.compressionRatio(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(got(1L) == ((0L, 1000L)))
    assert(got(2L) == ((0L, 1000L)))
    assert(got(3L)._1 == 3L)
  }

  test("deterministic across partitionings (same JVM, same zlib)") {
    val docs = (0L until 40L).map(i => (i, s"document $i " * (i.toInt + 1)))
    val a = TextOps.compressionRatio(spark.sparkContext.parallelize(docs, 2).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    val b = TextOps.compressionRatio(spark.sparkContext.parallelize(docs, 7).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    assert(a == b)
  }
}
