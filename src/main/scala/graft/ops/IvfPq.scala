package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ: the two quantizers composed — a coarse inverted file (IVF)
  * partitions the corpus into cells, and PQ codes each vector's RESIDUAL
  * (vector minus its cell centroid) in 8 bytes. This is the
  * billion-vector production layout (FAISS's IVFPQ): the cell prunes the
  * corpus to nprobe lists, the codes keep the candidate scan in-memory at
  * 8 B/vector, and the exact rerank touches only the final handful.
  * Residual coding matters: residuals are centered and small, so the same
  * codebook budget quantizes them far more finely than raw vectors
  * ([[PqIndexSpec]] measured the same effect as the shift-baseline trap).
  *
  * Search decomposes exactly: dot(v, p) = dot(c_cell, p) + dot(r, p),
  * and dot(r, p) ≈ Σ_j LUT[j, code_j] where LUT[j, c] = dot(codebook_jc,
  * p_sub_j) — so the approximate score is a per-cell constant plus nSub
  * lookups, with the LUT built ONCE per probe ((nSub × k) rows,
  * corpus-independent) and shared across all probed cells.
  *
  * Scale shape: build = one coarse assignment pass (k-row broadcast) +
  * PQ training on residuals ([[PqIndex]]'s one-aggregate update); search
  * = centroid scoring (k rows) -> semi-join on the nprobe cell ids
  * (partition the codes BY cell at rest and this prunes file groups
  * before any scan) -> broadcast-LUT join -> exact rerank of `candidates`
  * rows.
  */
object IvfPq {

  /** The built index. All three frames are persisted (search reads each
    * repeatedly); the CALLER owns their lifecycle — long-lived pipelines
    * call [[Index.unpersist]] when the index is dropped or rebuilt (the
    * IvfIncremental round-6 lesson: a persisted frame a caller cannot
    * release accretes storage forever).
    */
  final case class Index(cents: DataFrame, codebooks: DataFrame, codes: DataFrame) {
    def unpersist(): Unit = {
      cents.unpersist(false)
      codebooks.unpersist(false)
      codes.unpersist(false): Unit
    }
  }

  /** Coarse argmin assignment of vectors to cell centroids (exact integer
    * d², codegen'd dots) — the ml_kmeans discipline.
    */
  private def coarseAssign(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(cents.withColumn("n2c",
        call_function("graft_dot_i64", col("cv"), col("cv")))))
      .withColumn("d2",
        call_function("graft_dot_i64", col("q"), col("q"))
          - lit(2L) * call_function("graft_dot_i64", col("q"), col("cv"))
          + col("n2c"))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("cell"), col("cv")), struct(col("d2"), col("cell"))).as("best"),
        first(col("q")).as("q"))
      .select(col("vec_id"), col("q"), col("best.cell").as("cell"), col("best.cv").as("cv"))

  /** Build the index over (vec_id, q: array<long>): coarse k-means cells
    * (seeded from the first kCells vectors, `rounds` integer-mean Lloyd
    * updates), then PQ codebooks trained on the residuals.
    */
  def build(spark: SparkSession, vecs: DataFrame,
      kCells: Int = 8, rounds: Int = 2,
      nSub: Int = 8, subDim: Int = 8, kCodes: Int = 16): Index = {
    graft.expressions.GraftFunctions.register(spark)
    val v = vecs.select(col("vec_id"), col("q")).persist()
    val dim = nSub * subDim
    var cents = v.filter(col("vec_id") < kCells)
      .select(col("vec_id").cast("int").as("cell"), col("q").as("cv"))
    val sumCols = (0 until dim).map(i => sum(element_at(col("q"), i + 1)).as(s"s$i"))
    for (_ <- 1 to rounds) {
      cents = coarseAssign(v, cents)
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"), sumCols: _*)
        .select(col("cell"),
          array((0 until dim).map(i => expr(s"s$i div n")): _*).as("cv"))
    }
    val c = cents.persist()
    c.count(): Unit
    val assigned = coarseAssign(v, c)
      .select(col("vec_id"), col("cell"),
        expr("zip_with(q, cv, (x, y) -> x - y)").as("q")) // residuals
      .persist()
    val codebooks = PqIndex.train(spark, assigned.select(col("vec_id"), col("q")),
      nSub, subDim, kCodes, rounds).persist()
    codebooks.count(): Unit
    val codes = PqIndex.encode(assigned.select(col("vec_id"), col("q")), codebooks, nSub, subDim)
      .join(assigned.select(col("vec_id"), col("cell")), "vec_id")
      .persist()
    codes.count(): Unit
    assigned.unpersist(false)
    v.unpersist(false)
    Index(c, codebooks, codes)
  }

  /** nprobe-cell ADC search + exact rerank against probe `probeId`.
    * Returns (vec_id, dot_q) of the top `k`.
    */
  def search(idx: Index, vecs: DataFrame, probeId: Long,
      nprobe: Int = 4, k: Int = 10, candidates: Int = 50,
      nSub: Int = 8, subDim: Int = 8): DataFrame = {
    val probe = vecs.filter(col("vec_id") === probeId).select(col("q").as("pq"))
    // cell scores: per-cell constant dot(c_cell, p); keep the nprobe best
    val cellScores = idx.cents.crossJoin(broadcast(probe))
      .select(col("cell"), call_function("graft_dot_i64", col("cv"), col("pq")).as("cdot"))
      .orderBy(col("cdot").desc, col("cell").asc)
      .limit(nprobe)
    // residual LUT: dot of every codebook centroid with the probe's
    // matching subvector — shared across cells
    val lut = idx.codebooks.crossJoin(broadcast(probe))
      .select(col("j"), col("cell").as("code"),
        call_function("graft_dot_i64", col("cv"),
          expr(s"slice(pq, j * $subDim + 1, $subDim)")).as("pdot"))
    val approx = idx.codes.filter(col("vec_id") =!= probeId)
      .join(broadcast(cellScores), "cell") // the nprobe semi-join prune
      .select(col("vec_id"), col("cdot"), posexplode(col("codes")).as(Seq("j", "code")))
      .join(broadcast(lut), Seq("j", "code"))
      .groupBy(col("vec_id"))
      .agg((first(col("cdot")) + sum(col("pdot"))).as("adc"))
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
