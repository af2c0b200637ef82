package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One scored candidate row. Ordering: higher score first, then smaller id
  * (the deterministic tiebreak every top-k surface in this repo uses). */
case class ScoredNeighbor(neighbor_id: Long, cosine_sim: Double)

/** Bounded top-k as a typed Aggregator — the scale-correct replacement for
  * `row_number() OVER (PARTITION BY query_id ORDER BY ...)` (VERDICT r1:
  * with 10 query ids the window sorts the whole scored corpus inside 10
  * partitions). As a TypedImperativeAggregate this gets map-side partial
  * aggregation: every input partition reduces to at most k candidates per
  * group before the shuffle, so the exchange carries O(k · partitions ·
  * groups) rows instead of the full corpus, and nothing ever sorts more
  * than k elements at once.
  */
class TopKByScore(k: Int)
    extends Aggregator[ScoredNeighbor, Seq[ScoredNeighbor], Seq[ScoredNeighbor]] {

  private def beats(x: ScoredNeighbor, y: ScoredNeighbor): Boolean =
    x.cosine_sim > y.cosine_sim ||
      (x.cosine_sim == y.cosine_sim && x.neighbor_id < y.neighbor_id)

  /** Insert into a best-first sorted buffer, trimmed to k (k is small;
    * linear insertion beats heap constant-factors here). A full buffer
    * rejects anything that does not strictly beat its last element —
    * including exact ties with it (ADVICE r2: a tie used to slip past the
    * guard, find no insertion slot, and grow the buffer to k+1). */
  private def insert(buf: Seq[ScoredNeighbor], x: ScoredNeighbor): Seq[ScoredNeighbor] = {
    if (buf.size >= k && !beats(x, buf.last)) buf
    else {
      val idx = buf.indexWhere(b => beats(x, b)) match {
        case -1 => buf.size
        case i  => i
      }
      (buf.take(idx) :+ x) ++ buf.drop(idx).take(k - idx - 1)
    }
  }

  override def zero: Seq[ScoredNeighbor] = Vector.empty
  override def reduce(b: Seq[ScoredNeighbor], a: ScoredNeighbor): Seq[ScoredNeighbor] = insert(b, a)
  override def merge(b1: Seq[ScoredNeighbor], b2: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] =
    b2.foldLeft(b1)(insert)
  override def finish(r: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] = r
  override def bufferEncoder: Encoder[Seq[ScoredNeighbor]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredNeighbor]] = ExpressionEncoder()
}

object TopKByScore {

  /** `scored(query_id, neighbor_id, cosine_sim)` → one row per (query,
    * rank ≤ k): (query_id, neighbor_id, rank, cosine_sim), best first. */
  def perGroup(scored: DataFrame, k: Int, groupCol: String = "query_id"): DataFrame =
    perGroups(scored, k, Seq(groupCol))

  /** [[perGroup]] over a composite group key — the fused-sweep form: one
    * aggregation pass funds every (sweep point, query) cell instead of
    * one sub-plan per sweep point. The top-k set per group is identical
    * to a per-point filter + single-key aggregation (the comparator is a
    * total order, so the selected set is arrival-order independent). */
  def perGroups(scored: DataFrame, k: Int, groupCols: Seq[String]): DataFrame = {
    val topk: Column = udaf(new TopKByScore(k))
      .apply(col("neighbor_id"), col("cosine_sim")).as("topk")
    scored.groupBy(groupCols.map(col): _*)
      .agg(topk)
      .select(groupCols.map(col) :+ posexplode(col("topk")): _*)
      .select(groupCols.map(col) ++ Seq(col("col.neighbor_id").as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.cosine_sim").as("cosine_sim")): _*)
  }
}
