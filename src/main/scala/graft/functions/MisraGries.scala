package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One Misra-Gries counter: a surviving candidate item and its
  * (under-)estimate. */
case class MgCounter(item: String, est: Long)

/** Misra-Gries frequent-items sketch (Misra & Gries 1982; mergeable form
  * per Agarwal et al., "Mergeable Summaries", PODS'12) as a typed Spark
  * [[Aggregator]] — the bounded-state heavy-hitter pass Spark does not
  * ship natively (its approx family is HLL + t-digest): at most `k`
  * counters per partial aggregate, whatever the corpus size.
  *
  * Semantics: per-element reduce increments a held counter, opens one
  * below capacity, else decrements ALL counters (dropping zeros) — the
  * classic k-way cancellation. Merge sums counter maps, then subtracts
  * the (k+1)-th largest value from every counter and keeps the strictly
  * positive ones (the mergeable-summaries rule), restoring the ≤k bound.
  *
  * Guarantee (the one [[graft.operators.TextAnalysis.heavyHittersOver]]
  * builds on): every estimate undercounts its true frequency by at most
  * N/(k+1), so ANY item with true frequency > N/(k+1) still holds a
  * positive counter at the end — with k+1 ≥ the heavy-hitter denominator,
  * the candidate set is a SUPERSET of the true heavy hitters (no false
  * negatives), and one exact recount of the ≤k candidates makes the final
  * answer exact and deterministic even though intermediate sketch states
  * depend on merge order.
  *
  * 100 TB shape: map-side partial state is k counters per partition (vs
  * a full per-partition vocabulary for a naive two-phase count); the
  * shuffle moves k-row sketches, and only the ≤k candidates are ever
  * exactly counted corpus-wide. */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[MgCounter]] {
  require(k >= 1, s"capacity must be positive, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], x: String): Map[String, Long] =
    m.get(x) match {
      case Some(c)            => m.updated(x, c + 1)
      case None if m.size < k => m.updated(x, 1L)
      case None => // cancellation: one decrement against every counter
        m.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val s = (a.keySet ++ b.keySet).iterator
      .map(i => i -> (a.getOrElse(i, 0L) + b.getOrElse(i, 0L))).toMap
    if (s.size <= k) s
    else {
      // subtract the (k+1)-th largest value; at most k survive strictly
      val cut = s.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      s.flatMap { case (i, c) => if (c > cut) Some(i -> (c - cut)) else None }
    }
  }

  /** Deterministic presentation: estimate-desc, item-asc. */
  override def finish(m: Map[String, Long]): Seq[MgCounter] =
    m.toSeq.sortBy { case (i, c) => (-c, i) }
      .map { case (i, c) => MgCounter(i, c) }

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[MgCounter]] = ExpressionEncoder()
}

object MisraGries {
  /** The sketch as a ready aggregation Column over a string column. */
  def of(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MisraGries(k))
}

/** [[MisraGries]] over PRE-AGGREGATED (item, weight) cells — r18: the
  * heavy-hitter pass consumes per-document term counts (a cell per
  * distinct term per document) instead of one row per token instance.
  *
  * The weighted reduce IS the mergeable-summaries merge with a singleton
  * {item → weight} sketch: when the item is held (or capacity remains)
  * it adds the weight; when full, the (k+1)-th largest of the k+1 values
  * is min(weight, min counter) — subtract it everywhere, keep strictly
  * positive. A weighted stream's sketch is therefore a tree of merges
  * over singletons, so the Agarwal et al. bound holds verbatim with
  * N = Σ weights (= token instances): every estimate undercounts by at
  * most N/(k+1), no false negatives above that bar, and the exact
  * recount downstream makes the final answer identical to the
  * instance-stream sketch's — deterministically, although intermediate
  * states differ. */
class MisraGriesWeighted(k: Int)
    extends Aggregator[(String, Long), Map[String, Long], Seq[MgCounter]] {
  require(k >= 1, s"capacity must be positive, got $k")

  private val inner = new MisraGries(k)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], xw: (String, Long)): Map[String, Long] = {
    val (x, w) = xw
    m.get(x) match {
      case Some(c)            => m.updated(x, c + w)
      case None if m.size < k => m.updated(x, w)
      case None => // singleton merge: cut = (k+1)-th largest of k+1 values
        val cut = math.min(w, m.values.min)
        val out = m.flatMap { case (i, c) =>
          if (c > cut) Some(i -> (c - cut)) else None }
        if (w > cut) out.updated(x, w - cut) else out
    }
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    inner.merge(a, b)

  override def finish(m: Map[String, Long]): Seq[MgCounter] = inner.finish(m)

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[MgCounter]] = ExpressionEncoder()
}

object MisraGriesWeighted {
  /** The weighted sketch as an aggregation over (item, weight) columns. */
  def of(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MisraGriesWeighted(k))
}
