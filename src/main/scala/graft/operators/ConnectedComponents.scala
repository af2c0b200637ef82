package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.Staging

/** Connected components by alternating large-star / small-star contraction
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14) — the algorithm GraphFrames ships for the same job. All
  * per-round work is distributed joins/aggregations; nothing is collected.
  *
  * Used by the dedup operators so `cluster_id` is a true transitive-closure
  * component label, not the single-hop min-neighbor it was in round 1
  * (ADVICE r1: a chain A~B~C previously split across two "clusters").
  *
  * Why star contraction and not label propagation: propagation moves the
  * component minimum ONE graph hop per round — O(diameter) rounds. Pointer
  * jumping doesn't rescue it (labels point at local minima whose own labels
  * are themselves, so pointer chains stay short; measured on the sf0.1
  * near-dup graph: 19 rounds plain, still 13 with path halving). The
  * alternating stars rewire the EDGES toward each neighborhood minimum, so
  * components flatten in O(log n) rounds regardless of diameter (measured:
  * same graph converges in a handful of rounds). At 100 TB a round is a
  * full shuffle of the edge set, so round count IS the cost model — and the
  * edge set also shrinks monotonically toward one edge per non-root vertex.
  *
  * Round-17 per-round cost work (guide §2.4/§1.2 — measured: the sf0.1
  * simhash graph, 354 edges, spent 3.5 s here, ALL fixed per-round
  * overhead; at that size the cost model is actions × stages, not bytes):
  *   - the convergence check is ONE job: the new edge count and the
  *     new-minus-old difference come from a single left-join aggregate
  *     instead of a count plus a separate left-anti probe (both sides are
  *     canonical distinct sets, so equal counts plus zero unmatched rows
  *     IS set equality — exact, not probabilistic);
  *   - NOT unrolled: materializing two star rounds per checkpoint looked
  *     like it would halve the driver round-trips, but without a
  *     materialization barrier every reference to the first application's
  *     output duplicates its whole logical subtree into the second — the
  *     composed plan's stage count grows multiplicatively and the measured
  *     cycle cost was ~4× a single round (2.3–4.2 s vs 0.6–0.9 s). Kept
  *     single-round materialization deliberately.
  *
  * Skew note: a giant component funnels its edges to one root key during
  * the final rounds; large-star groups by each vertex (bounded degree after
  * the first contraction) and AQE skew-join splitting covers the join side.
  */
object ConnectedComponents {

  /** Component label (the minimum vertex id in the component) for every
    * vertex that appears in `edges` (columns `a`, `b`). Isolated vertices
    * (not in any edge) are simply absent — callers union them back with
    * label = own id. Output: (id, component). */
  def minLabel(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    // canonical undirected edge set: u < v, no self loops
    // stageIterative, not stage: each round's plan builds on the last, so
    // lineage MUST truncate (under the `persist` policy a kept lineage
    // would grow the logical plan round over round)
    var e = Staging.stageIterative(edges.where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
              greatest(col("a"), col("b")).as("v"))
      .distinct())
    var eCnt = e.count()
    val verts = e.select(col("u").as("id"))
      .unionAll(e.select(col("v").as("id")))
      .distinct()

    val debug = sys.env.contains("GRAFT_CC_DEBUG")
    if (debug) println(s"[cc] initial edges=$eCnt")
    var iter = 0
    var changed = eCnt > 0
    while (changed && iter < maxIter) {
      val tr0 = System.nanoTime()
      // -- large-star: per vertex x (over the directed adjacency), connect
      // every LARGER neighbor to m = min(N(x) ∪ {x}). (Joining `e`
      // directly instead of dir.where(v > u) — the same row set — was
      // tried and reverted: e's attribute ids then appear on BOTH join
      // sides via `dir`, and Union constraint rewriting crashes on the
      // ambiguous reference.)
      val dir = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val mn = dir.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val ls = dir.where(col("v") > col("u"))
        .join(mn, "u")
        .select(col("m").as("u"), col("v"))
        .where(col("u") =!= col("v")) // m ≤ u < v keeps canonical form
      // -- small-star: per vertex x, connect every SMALLER neighbor (and x
      // itself) to m = min of the smaller neighbors. Grouping canonical
      // edges by their larger endpoint covers every edge exactly once.
      // `ls` feeds two consumers inside ONE materialized plan — Spark's
      // ReuseExchange dedupes its shuffle.
      val mn2 = ls.groupBy("v").agg(min("u").as("m")) // m < v
      val newE = Staging.stageIterative(mn2.select(col("m").as("u"), col("v"))
        .unionAll(ls.join(mn2, "v")
          .select(col("m").as("u"), ls("u").as("v"))
          .where(col("u") =!= col("v")))
        .distinct())
      // one-job convergence check: canonical distinct sets are equal iff
      // the counts match and every new-side edge matches an old-side edge
      val st = newE
        .join(e.withColumn("_old", lit(1)), Seq("u", "v"), "left")
        .agg(count(lit(1)).as("cnt"), count(col("_old")).as("matched"))
        .head()
      val newCnt = st.getLong(0)
      changed = newCnt != eCnt || st.getLong(1) != newCnt
      if (debug) println(f"[cc] round ${iter + 1} cnt=$newCnt matched=${st.getLong(1)} ${(System.nanoTime() - tr0) / 1e9}%.3f s")
      e = newE
      eCnt = newCnt
      iter += 1
    }
    require(!changed, s"connected components did not converge in $maxIter rounds")
    // star forest: (root, child) edges; roots label themselves
    verts.join(e.select(col("v").as("id"), col("u").as("_root")), Seq("id"), "left")
      .select(col("id"), coalesce(col("_root"), col("id")).as("component"))
  }
}
