package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-dup pair graph: turns pairwise
  * similarity edges into transitive clusters with a canonical (min-id)
  * representative — the principled form of "keep one copy per duplicate
  * cluster" (pairwise drop rules over- or under-delete on chains).
  *
  * Algorithm: min-label propagation. Each doc starts labeled with its own
  * id; every iteration each doc takes the minimum label in its
  * neighborhood (including itself); converged when no label changes. All
  * iterations are shuffle-by-key DataFrame joins — no driver-side graph.
  * Iteration count is bounded by cluster DIAMETER, not size: near-dup
  * clusters are dense (a hub document pairs with most members), so real
  * corpora converge in a handful of rounds. A 100 TB deployment with
  * adversarially long chains would switch to the large-star/small-star
  * contraction (O(log n) rounds) — same DataFrame skeleton.
  */
object DedupClusters {

  /** @param pairs (doc_a, doc_b) similarity edges, any orientation
    * @param maxIter safety bound; throws if not converged (raise it, or the
    *                graph is pathological)
    * @return (doc_id, component) — every doc appearing in any pair, labeled
    *         with its cluster's minimum doc_id
    */
  def components(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    // Both edge orientations from ONE pass over the pair source (a
    // self-union would execute the upstream pair pipeline twice), then
    // materialized once for all iterations.
    val edges = pairs.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .persist()
    edges.count()

    // Iterative plans MUST truncate lineage every round: persist() caches
    // data but keeps the logical plan, so N iterations nest N joins and
    // the plan (and its analysis/stringification) grows exponentially —
    // localCheckpoint materializes AND cuts the lineage to the stored
    // partitions. On a cluster, reliable checkpoint() (HDFS dir) is the
    // fault-tolerant equivalent.
    var labels = edges.select(col("dst").as("doc_id")).distinct()
      .withColumn("component", col("doc_id"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // one fused plan per round, materialized by a single localCheckpoint —
      // every checkpoint+convergence pass costs two fixed-floor jobs, so
      // the plan packs TWO neighbor-min propagations (2-hop label spread)
      // plus two pointer jumps (label-of-label against the materialized
      // frame) into each round; labels are tiny relative to edges and
      // broadcast, so re-computing the intermediate step inside the fused
      // plan is cheaper than materializing it
      def nbrMin(l: DataFrame): DataFrame = edges
        .join(l.withColumnRenamed("doc_id", "dst"), "dst")
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("component")).as("nbr_min"))
      def step(l: DataFrame): DataFrame = l.join(nbrMin(l), Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("component"), coalesce(col("nbr_min"), col("component"))).as("component"))
      def jump(df: DataFrame, from: String, to: String): DataFrame = df
        .join(labels.select(col("doc_id").as(s"_k_$to"), col("component").as(s"_c_$to")),
          df(from) === col(s"_k_$to"), "left")
        .withColumn(to, least(col(from), coalesce(col(s"_c_$to"), col(from))))
        .drop(s"_k_$to", s"_c_$to")
      val twoHop = step(step(labels)).withColumnRenamed("component", "c1")
        .join(labels.select(col("doc_id"), col("component").as("old")), "doc_id")
      val next = jump(jump(twoHop, "c1", "c2"), "c2", "c3")
        .select(col("doc_id"), col("old"), col("c3").as("component"))
        .localCheckpoint(true)
      val changed = next.filter(col("component") =!= col("old")).limit(1).count()
      labels = next.select(col("doc_id"), col("component"))
      converged = changed == 0
      iter += 1
    }
    edges.unpersist(false)
    require(converged, s"components: not converged after $maxIter iterations")
    labels
  }

  /** Doc ids to DROP so exactly one doc (the min id) survives per cluster. */
  def dropIds(pairs: DataFrame, maxIter: Int = 25): DataFrame =
    components(pairs, maxIter)
      .filter(col("doc_id") =!= col("component"))
      .select("doc_id")
}
