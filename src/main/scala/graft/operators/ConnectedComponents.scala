package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the standard
  * Pregel-style shape (GraphX/GraphFrames use the same driver-side
  * iterate-until-fixed-point loop; the per-iteration work is fully
  * distributed joins/aggregations, nothing is collected).
  *
  * Used by the dedup operators so `cluster_id` is a true transitive-closure
  * component label, not the single-hop min-neighbor it was in round 1
  * (ADVICE r1: a chain A~B~C previously split across two "clusters").
  *
  * At 100 TB scale: min-label propagation converges in O(component
  * diameter) rounds; near-dup clusters are shallow (diameter ≤ a few), so
  * this terminates in 2-4 rounds in practice. For adversarial long-chain
  * graphs the alternating large-star/small-star algorithm (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) halves rounds
  * to O(log n); not needed for dedup-shaped graphs.
  */
object ConnectedComponents {

  /** Component label (the minimum vertex id in the component) for every
    * vertex that appears in `edges` (columns `a`, `b`). Isolated vertices
    * (not in any edge) are simply absent — callers union them back with
    * label = own id. Output: (id, component). */
  def minLabel(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val und = edges.select(col("a"), col("b"))
      .unionAll(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint(true)
    var labels = und.select(col("a").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // candidate label via each neighbor, then keep the minimum seen
      val viaNbr = und.join(labels, und("b") === labels("id"))
        .select(und("a").as("id"), col("component"))
      val next = labels.unionByName(viaNbr)
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint(true)
      changed = next.join(labels.withColumnRenamed("component", "old"), "id")
        .filter(col("component") =!= col("old")).count()
      labels = next
      iter += 1
    }
    require(changed == 0, s"connected components did not converge in $maxIter rounds")
    labels
  }
}
