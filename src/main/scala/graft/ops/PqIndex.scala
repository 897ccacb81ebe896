package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product-quantization (PQ) index over the quantized embedding table —
  * the memory tier BELOW sim_sq8: each vector compresses to `nSub` small
  * centroid ids (8 bytes here vs sim_sq8's 65 B and the raw f32's 256 B),
  * and queries score codes against a per-probe lookup table (ADC,
  * asymmetric distance computation) without touching the vectors at all.
  * This is the layout behind every billion-vector ANN deployment (IVF-PQ):
  * the codes fit in memory when the vectors never could.
  *
  * Training IS [[graft.ops]]' exact-integer k-means run independently per
  * subspace (seed -> assign -> integer-mean update, [[VectorOps]]
  * `ml_kmeans` discipline): assignment is one pass with the (nSub × k)-row
  * centroid table broadcast; the update is ONE hash aggregate of subDim
  * sum() columns keyed (subspace, cell) — map-side combined, no
  * per-dimension explode. Encoding is the same assignment pass, collected
  * to an nSub-int code array per vector (in-row sort makes the collect
  * order-proof).
  *
  * Search (ADC): the probe's subvectors dot every centroid ONCE
  * ((nSub × k) rows — independent of corpus size), codes explode to
  * (vec, subspace, cell) and join that broadcast table on the 2-int key;
  * the per-vector sum of partial dots approximates the full dot. Exact
  * rerank touches only the top `candidates` rows. Recall is bounded by
  * quantization distortion — [[PqIndexSpec]] measures it against brute
  * force on real embeddings rather than asserting folklore.
  */
object PqIndex {

  /** (vec_id, q) -> per-subspace training rows (vec_id, j, sv). */
  private def subvectors(vecs: DataFrame, nSub: Int, subDim: Int): DataFrame =
    vecs.select(col("vec_id"), explode(expr(
        s"transform(sequence(0, ${nSub - 1}), j -> struct(int(j) AS j, slice(q, j * $subDim + 1, $subDim) AS sv))"
      )).as("e"))
      .select(col("vec_id"), col("e.j").as("j"), col("e.sv").as("sv"))

  /** argmin-by-d² assignment of subvectors to their subspace's centroids;
    * d² = |sv|² - 2·sv·cv + |cv|² in pure int64 via the codegen'd kernel.
    */
  private def assign(sub: DataFrame, cents: DataFrame): DataFrame =
    sub.join(broadcast(cents.withColumn("n2c",
        call_function("graft_dot_i64", col("cv"), col("cv")))), "j")
      .withColumn("d2",
        call_function("graft_dot_i64", col("sv"), col("sv"))
          - lit(2L) * call_function("graft_dot_i64", col("sv"), col("cv"))
          + col("n2c"))
      .groupBy(col("vec_id"), col("j"))
      .agg(min_by(col("cell"), struct(col("d2"), col("cell"))).as("cell"),
        first(col("sv")).as("sv"))

  /** Train per-subspace codebooks: k seeds from the first k vectors, then
    * `rounds` Lloyd updates with integer-mean centroids (sum div count).
    * Signed inputs are fine — div's truncate-toward-zero is deterministic
    * within Spark, and unlike ml_kmeans there is no second engine to
    * agree with; training CENTERED keeps the ADC residual orthogonal to a
    * shift baseline (PqIndexSpec measured the recall cost of shifting).
    * Returns (j, cell, cv).
    */
  def train(spark: SparkSession, vecs: DataFrame,
      nSub: Int = 8, subDim: Int = 8, k: Int = 16, rounds: Int = 2): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    val sub = subvectors(vecs, nSub, subDim).persist()
    val sumCols = (0 until subDim).map(i => sum(element_at(col("sv"), i + 1)).as(s"s$i"))
    var cents = sub.filter(col("vec_id") < k)
      .select(col("j"), col("vec_id").cast("int").as("cell"), col("sv").as("cv"))
    for (_ <- 1 to rounds) {
      cents = assign(sub, cents)
        .groupBy(col("j"), col("cell"))
        .agg(count(lit(1)).as("n"), sumCols: _*)
        .select(col("j"), col("cell"),
          array((0 until subDim).map(i => expr(s"s$i div n")): _*).as("cv"))
    }
    val out = cents.persist()
    out.count(): Unit // materialize before the training explode unpersists
    sub.unpersist(false)
    out
  }

  /** Encode every vector as its per-subspace nearest-centroid ids:
    * (vec_id, codes array<int>), codes[j] = cell of subspace j.
    */
  def encode(vecs: DataFrame, cents: DataFrame,
      nSub: Int = 8, subDim: Int = 8): DataFrame =
    assign(subvectors(vecs, nSub, subDim), cents)
      .groupBy(col("vec_id"))
      .agg(expr("transform(array_sort(collect_list(struct(j, cell))), p -> p.cell)").as("codes"))

  /** ADC top-`candidates` by approximate dot + exact top-`k` rerank
    * against the probe (vec_id = `probeId`). Returns (vec_id, dot_q).
    */
  def search(vecs: DataFrame, codes: DataFrame, cents: DataFrame,
      probeId: Long, k: Int = 10, candidates: Int = 100,
      nSub: Int = 8, subDim: Int = 8): DataFrame = {
    val probe = vecs.filter(col("vec_id") === probeId).select(col("q").as("pq"))
    // per-probe lookup table: partial dot of every centroid with the
    // probe's matching subvector — (nSub x k) rows, corpus-independent
    val lut = cents.crossJoin(broadcast(probe))
      .select(col("j"), col("cell"),
        call_function("graft_dot_i64", col("cv"),
          expr(s"slice(pq, j * $subDim + 1, $subDim)")).as("pdot"))
    val approx = codes.filter(col("vec_id") =!= probeId)
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("j", "cell")))
      .join(broadcast(lut), Seq("j", "cell"))
      .groupBy(col("vec_id"))
      .agg(sum(col("pdot")).as("adc"))
      .orderBy(col("adc").desc, col("vec_id").asc)
      .limit(candidates)
    approx
      .join(vecs.select(col("vec_id"), col("q")), "vec_id")
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), call_function("graft_dot_i64", col("q"), col("pq")).as("dot_q"))
      .orderBy(col("dot_q").desc, col("vec_id").asc)
      .limit(k)
  }
}
