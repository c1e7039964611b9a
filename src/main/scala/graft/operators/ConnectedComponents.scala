package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by min-label propagation — the step that turns a
  * near-dup PAIR list into dedup DECISIONS (every doc labeled with its
  * cluster representative, the minimum id reachable through near-dup edges).
  *
  * Each iteration: every vertex takes the min of its own label and its
  * neighbors' labels (one shuffle join + one aggregation); converges in
  * O(component diameter) iterations — near-dup clusters are dense, so
  * diameter is tiny. This is the simple form of the large-star/small-star
  * algorithm (Kiveris et al., "Connected Components in MapReduce"); at
  * 100 TB you'd add the star-contraction steps to cut iteration count on
  * long chains, but the join shape per iteration is identical.
  *
  * @param vertices single-column DataFrame of vertex ids (named `id`)
  * @param edges    two-column DataFrame (`src`, `dst`), undirected
  * @return (id, component) — component = min vertex id in the component
  */
object ConnectedComponents {
  def apply(vertices: DataFrame, edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // symmetric closure materialized once (localCheckpoint also cuts the
    // upstream pair-mining plan out of every iteration's lineage)
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    // labels are RE-CHECKPOINTED each iteration: an iterative self-join
    // otherwise nests the whole history into one exponentially-growing
    // logical plan (measured: driver OOM on analysis by iteration ~4)
    var labels = vertices.select(col("id"), col("id").as("component"))
      .localCheckpoint(true)
    // labels can only DECREASE, so the label sum is a strictly-decreasing
    // convergence witness — one cheap aggregate per iteration instead of a
    // self-join + count
    def labelSum(df: DataFrame): Long =
      df.agg(sum("component")).head().getLong(0)
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = sym
        .join(labels, sym("src") === labels("id"))
        .groupBy(col("dst").as("id2"))
        .agg(min("component").as("nbr_min"))
      // lazy checkpoint: the convergence-sum action below materializes it,
      // so each iteration costs ONE job, not two
      labels = labels
        .join(neighborMin, labels("id") === col("id2"), "left_outer")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component"))
        .localCheckpoint(false)
      val newSum = labelSum(labels)
      converged = newSum == prevSum
      prevSum = newSum
      i += 1
    }
    labels
  }
}
