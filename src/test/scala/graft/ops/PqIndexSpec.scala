package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PQ index contract on REAL embeddings (sf0.001): code compactness,
  * codebook bounds, determinism, and measured recall of ADC search
  * against integer brute force — the honest number, not folklore.
  */
class PqIndexSpec extends AnyFunSuite with SparkSpec {

  private val SF = "/root/testdata/sf0.001"

  // UNSHIFTED quantized space: PQ is Spark-only (no cross-engine div to
  // pin), and ADC error is the quantization residual dotted with the
  // probe — a +1000 shift would add 1000*sum(residual) of pure noise per
  // subspace and measurably wreck recall (tried: 5/10 shifted vs 9+/10
  // centered)
  private def vecs = Tables.t(spark, SF, "embeddings")
    .select(col("vec_id"),
      expr("transform(embedding, x -> bigint(round(double(x) * 1000)))").as("q"))

  test("codes are nSub small ids; codebook has at most nSub*k centroids") {
    val v = vecs.persist()
    val cents = PqIndex.train(spark, v)
    assert(cents.count() <= 8 * 16)
    assert(cents.select(max(size(col("cv")))).head.getInt(0) == 8)
    val codes = PqIndex.encode(v, cents).persist()
    assert(codes.count() == v.count())
    val stats = codes.select(
      min(size(col("codes"))).as("mn"), max(size(col("codes"))).as("mx"),
      max(expr("array_max(codes)")).as("mc"), min(expr("array_min(codes)")).as("lc")).head
    assert(stats.getInt(0) == 8 && stats.getInt(1) == 8)
    assert(stats.getInt(2) < 16 && stats.getInt(3) >= 0)
    v.unpersist(false); codes.unpersist(false); cents.unpersist(false): Unit
  }

  test("ADC search recall@10 vs integer brute force is measured and high") {
    val v = vecs.persist()
    val cents = PqIndex.train(spark, v)
    val codes = PqIndex.encode(v, cents)
    graft.expressions.GraftFunctions.register(spark)
    val probe = v.filter(col("vec_id") === 0).select(col("q").as("pq"))
    val truth = v.filter(col("vec_id") =!= 0).crossJoin(broadcast(probe))
      .select(col("vec_id"), call_function("graft_dot_i64", col("q"), col("pq")).as("dot"))
      .orderBy(col("dot").desc, col("vec_id").asc).limit(10)
      .collect().map(_.getLong(0)).toSet
    val got = PqIndex.search(v, codes, cents, probeId = 0L, k = 10, candidates = 100)
      .collect().map(_.getLong(0)).toSet
    val recall = (truth intersect got).size
    // 100 candidates of ~500 vectors + exact rerank: distortion would have
    // to evict a true neighbor from the top 20% to lose it
    assert(recall >= 8, s"recall@10 = $recall/10 (got $got, want $truth)")
    v.unpersist(false): Unit
  }

  test("training and encoding are deterministic across repartitionings") {
    val v = vecs
    def run(parts: Int): Map[Long, Seq[Int]] = {
      val vv = v.repartition(parts).persist()
      val cents = PqIndex.train(spark, vv)
      val m = PqIndex.encode(vv, cents).collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
      vv.unpersist(false)
      m
    }
    assert(run(2) == run(9))
  }
}
