package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded DISTINCT bottom-k over int64 values — the KMV (k-minimum-values)
  * distinct-count sketch's accumulator (Bar-Yossef et al. 2002; the Θ-sketch
  * family): keep the k smallest DISTINCT hash values seen. Mergeable by
  * construction (bottom-k of a union = bottom-k of the union of bottom-ks),
  * and — unlike HLL register blobs — the state is pure integer order
  * statistics, so two engines replaying the same hashes agree BIT-FOR-BIT:
  * the DuckDB oracle can check the estimate exactly.
  *
  * Scale shape: [[TopKByScore]]'s discipline — as a typed aggregator it
  * gets map-side partial aggregation, so every input partition reduces to
  * ≤k values per group before the shuffle; a day with 100M distinct users
  * ships k longs, not a collect_set. */
class BottomKDistinctLongs(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {

  /** Insert into an ascending sorted distinct buffer, trimmed to k. */
  private def insert(buf: Seq[Long], x: Long): Seq[Long] = {
    if (buf.size >= k && x >= buf.last) buf // full and not smaller: dup of last or too big
    else {
      val idx = buf.indexWhere(x <= _)
      if (idx >= 0 && buf(idx) == x) buf    // distinct: already present
      else {
        val at = if (idx == -1) buf.size else idx
        (buf.take(at) :+ x) ++ buf.drop(at).take(k - at - 1)
      }
    }
  }

  override def zero: Seq[Long] = Vector.empty
  override def reduce(b: Seq[Long], a: Long): Seq[Long] = insert(b, a)
  override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
    b2.foldLeft(b1)(insert)
  override def finish(r: Seq[Long]): Seq[Long] = r
  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
