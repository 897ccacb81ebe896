package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Float similarity-search paths (not oracle-compared): brute-force cosine
  * top-k and the LSH-bucketed ANN variant.
  */
class VectorOpsSpec extends AnyFunSuite with SparkSpec {

  private val dim = 16

  /** tiny corpus: vec 0 = probe twin, vec 1 = opposite, rest pseudo-random */
  private def corpus() = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum).toFloat
      v.map(_ / n)
    }
    val probe = unit(Array.tabulate(dim)(i => (i + 1).toFloat))
    val rows = Seq(
      (0L, probe),
      (1L, probe.map(-_))
    ) ++ (2L until 50L).map(i => (i, unit(Array.fill(dim)(rnd.nextGaussian().toFloat))))
    (probe, rows.toDF("vec_id", "embedding"))
  }

  test("cosineTopK ranks the identical vector first with cosine ~ 1") {
    val (probe, df) = corpus()
    val top = VectorOps.cosineTopK(df, probe, 3).collect()
    assert(top(0).getAs[Long]("vec_id") == 0L)
    assert(math.abs(top(0).getAs[Double]("cosine") - 1.0) < 1e-5)
    // the antipodal vector must rank last of all 50
    val all = VectorOps.cosineTopK(df, probe, 50).collect()
    assert(all.last.getAs[Long]("vec_id") == 1L)
    assert(math.abs(all.last.getAs[Double]("cosine") + 1.0) < 1e-5)
  }

  test("lshBucketCosine finds the probe's twin through its bucket") {
    val (probe, df) = corpus()
    val top = VectorOps.lshBucketCosine(df, probe, 3).collect()
    assert(top.nonEmpty)
    assert(top(0).getAs[Long]("vec_id") == 0L) // twin shares every sign bucket
    // candidates are a strict subset of the corpus (it actually bucketed)
    assert(top.length <= 3)
  }
}
