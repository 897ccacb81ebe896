package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q-digest guarantees under both regimes:
  *   - EXACT (n < k: compression threshold floor(n/k) = 0, nothing
  *     collapses): quartiles are exact order statistics at ceil(q·n);
  *   - COMPRESSED (n >> k): each estimate's rank interval intersects
  *     target ± bits·n/k, across many partitionings (the partial states
  *     travel Spark's two-phase aggregation for real — parallelize(p));
  *   - state boundedness: the serialized partial stays O(k·bits) however
  *     long the stream.
  */
class QDigestSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def quartiles(df: org.apache.spark.sql.DataFrame, bits: Int, k: Int): Seq[Long] = {
    GraftFunctions.register(spark)
    val r = df.agg(call_function("graft_qdigest", col("v"), lit(bits), lit(k)).as("q"))
      .select(col("q")).collect()(0).getSeq[Long](0)
    r
  }

  test("bad arguments fail analysis cleanly") {
    val df = Seq(1L, 2L).toDF("v")
    GraftFunctions.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(call_function("graft_qdigest", col("v"), lit("x"), lit(4))).collect()
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(call_function("graft_qdigest", col("v"), lit(63), lit(4))).collect()
    }
    assert(e2.getMessage.contains("[1, 62]"), e2.getMessage)
  }

  test("exact regime (n < k): quartiles are exact order statistics, any partitioning") {
    val vals = Seq(5L, 1L, 9L, 3L, 7L, 2L, 8L, 4L, 6L, 10L, 0L) // n = 11
    (1 to 4).foreach { p =>
      val df = spark.sparkContext.parallelize(vals, p).toDF("v")
      val got = quartiles(df, 8, 1000)
      // targets ceil(.25*11)=3, ceil(.5*11)=6, ceil(.75*11)=9 (1-based)
      val sorted = vals.sorted
      assert(got == Seq(sorted(2), sorted(5), sorted(8)), s"partitions=$p")
    }
  }

  test("exact regime respects duplicates and clamping") {
    val vals = Seq.fill(10)(4L) ++ Seq.fill(10)(7L) ++ Seq(-5L, 999L) // clamp to 0 and 255
    val df = spark.sparkContext.parallelize(vals, 3).toDF("v")
    val got = quartiles(df, 8, 1000)
    val sorted = (Seq.fill(10)(4L) ++ Seq.fill(10)(7L) ++ Seq(0L, 255L)).sorted
    def t(q: Double) = sorted((q * sorted.size).ceil.toInt - 1)
    assert(got == Seq(t(0.25), t(0.5), t(0.75)))
  }

  test("compressed regime: rank bound holds across partitionings; state stays bounded") {
    val bits = 10; val k = 64
    val rnd = new scala.util.Random(5)
    // lumpy distribution: ties, gaps, a heavy cluster
    val vals = Seq.tabulate(20000) { i =>
      if (i % 3 == 0) 100L + (i % 7)
      else if (i % 3 == 1) rnd.nextInt(1024).toLong
      else 800L
    }
    val n = vals.size.toLong
    val sorted = vals.sorted
    val err = bits.toLong * n / k + 1
    Seq(1, 4, 13).foreach { p =>
      val df = spark.sparkContext.parallelize(vals, p).toDF("v")
      val got = quartiles(df, bits, k)
      Seq((1, 4), (1, 2), (3, 4)).zip(got).foreach { case ((num, den), est) =>
        val target = (n * num + den - 1) / den
        val lt = sorted.count(_ < est).toLong
        val le = sorted.count(_ <= est).toLong
        assert(lt <= target + err && le >= target - err,
          s"partitions=$p q=$num/$den est=$est lt=$lt le=$le target=$target err=$err")
      }
    }
  }

  test("digest state is bounded: far fewer live nodes than distinct values") {
    // direct exercise of the buffer via the expression API
    val bits = 16; val k = 32
    val agg = QDigest(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.catalyst.expressions.Literal(bits),
      org.apache.spark.sql.catalyst.expressions.Literal(k))
    val buf = agg.createAggregationBuffer()
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    val rnd = new scala.util.Random(11)
    (0 until 100000).foreach { _ =>
      row.update(0, rnd.nextInt(1 << 16).toLong)
      agg.update(buf, row)
    }
    // ~65k distinct leaves flowed through; live nodes must be far less
    // than distinct (the compression trigger is 8*k*bits = 4096 here)
    assert(buf.size <= 8 * k * bits + 1, s"live nodes ${buf.size}")
    // serialize/deserialize round trip preserves the state exactly
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf)
    // the n=100k median from the restored buffer is within the bound
    val est = agg.eval(back).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val med = est.getLong(1)
    assert(med >= 0 && med < (1 << 16))
  }

  test("merge is commutative-ish: split+merge bound equals direct bound (property)") {
    val bits = 8; val k = 16
    val rnd = new scala.util.Random(23)
    (0 until 20).foreach { trial =>
      val n = 500 + rnd.nextInt(3000)
      val vals = Seq.fill(n)(rnd.nextInt(256).toLong)
      val sorted = vals.sorted
      val err = bits.toLong * n / k + 1
      val p = 1 + rnd.nextInt(8)
      val df = spark.sparkContext.parallelize(vals, p).toDF("v")
      val got = quartiles(df, bits, k)
      Seq((1, 4), (1, 2), (3, 4)).zip(got).foreach { case ((num, den), est) =>
        val target = (n.toLong * num + den - 1) / den
        val lt = sorted.count(_ < est).toLong
        val le = sorted.count(_ <= est).toLong
        assert(lt <= target + err && le >= target - err,
          s"trial $trial p=$p q=$num/$den: est=$est target=$target err=$err lt=$lt le=$le")
      }
    }
  }
}
