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
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .persist()
    // Iterative plans MUST truncate lineage every round: persist() caches
    // data but keeps the logical plan, so N iterations nest N joins and
    // the plan (and its analysis/stringification) grows exponentially —
    // localCheckpoint materializes AND cuts the lineage to the stored
    // partitions. On a cluster, reliable checkpoint() (HDFS dir) is the
    // fault-tolerant equivalent.
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("component", col("doc_id"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // each doc pulls the min label among its neighbors...
      val nbrMin = edges
        .join(labels.withColumnRenamed("doc_id", "dst"), "dst")
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("component")).as("nbr_min"))
      // ...and keeps the smaller of (own, neighborhood) labels
      val next = labels.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("component"), coalesce(col("nbr_min"), col("component"))).as("component"))
        .localCheckpoint(true)
      val changed = next.as("n").join(labels.as("o"), "doc_id")
        .filter(col("n.component") =!= col("o.component")).limit(1).count()
      labels = next
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
