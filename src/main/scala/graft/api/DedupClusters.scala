package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-dup pairs — the TRANSITIVE closure
  * the pairwise dedup operators (q_dedup_minhash_df, q_dedup_*)
  * deliberately stop short of. A greedy "drop the higher id of every
  * pair" keeps every doc that is never an edge's higher endpoint,
  * which is NOT the set of cluster minima: in the chain 1–5, 3–5 the
  * doc 3 survives greedy but is transitively a near-dup of 1. Cluster
  * assignment makes "keep one exemplar per near-dup CLUSTER" exact.
  *
  * Algorithm: iterative min-label propagation (the standard
  * GraphX-free connected components) — label(v) starts at v, each
  * round becomes min(label(v), min over neighbors' labels), until no
  * label changes. Rounds needed = graph diameter, and near-dup
  * clusters are shallow (duplicates of a common source), so this
  * converges in a handful of rounds; each round is one join + one
  * aggregation over the EDGE list (pairs-sized, not corpus-sized).
  * The per-round `count` action is the fixpoint check — driver-side
  * control flow over distributed data, the same shape as any
  * iterative MLlib algorithm.
  */
object DedupClusters {

  /** (doc_id, cluster) for every doc appearing in `pairs`
    * (columns doc_a, doc_b); cluster = min doc_id reachable via
    * pair edges. Docs in no pair are their own exemplar and are
    * simply absent here.
    *
    * Throws if labels have not converged within `maxIters` rounds (a
    * component deeper than maxIters hops) — silently returning
    * partial labels would break the one-exemplar-per-cluster
    * guarantee downstream. The returned DataFrame is CACHED (it is
    * the product of the iteration); `unpersist()` it when done.
    */
  def assign(pairs: DataFrame, maxIters: Int = 50): DataFrame = {
    val edges = pairs
      .select(col("doc_a").cast("long").as("src"), col("doc_b").cast("long").as("dst"))
      .unionByName(pairs
        .select(col("doc_b").cast("long").as("src"), col("doc_a").cast("long").as("dst")))
      .distinct()
      .cache()
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster", col("doc_id"))
      .cache()
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIters) {
      // min neighbor label per node: one edge-list join + one agg
      val neighborMin = edges
        .join(labels.select(col("doc_id").as("dst"), col("cluster").as("_nc")), "dst")
        .groupBy(col("src").as("doc_id")).agg(min(col("_nc")).as("_minNc"))
      val joined = labels.join(neighborMin, Seq("doc_id"), "left").cache()
      changed = joined.filter(col("_minNc") < col("cluster")).count()
      val next = joined.select(col("doc_id"),
          least(col("cluster"), coalesce(col("_minNc"), col("cluster"))).as("cluster"))
        .cache()
      next.count() // materialize before freeing what it was built from
      labels.unpersist()
      joined.unpersist()
      labels = next
      iter += 1
    }
    edges.unpersist()
    if (changed > 0)
      throw new IllegalStateException(
        s"DedupClusters did not converge in $maxIters rounds " +
          s"($changed labels still moving) — raise maxIters for components deeper than that")
    labels
  }
}
