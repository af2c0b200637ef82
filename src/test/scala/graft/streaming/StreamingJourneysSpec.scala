package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Events
import graft.streaming.StreamingJourneys.Ev

/** Keyed-state journey extraction: streamed transitions equal the batch
  * Markov pair counts, INCLUDING the pair whose two events arrive in
  * different micro-batches — the case per-batch recomputation cannot
  * produce and the reason this face uses flatMapGroupsWithState. */
class StreamingJourneysSpec extends SparkSpec {

  private def us(minutes: Long): Long = minutes * 60L * 1000000L

  private val rows = Seq(
    Ev(1L, us(0), 7L, "view"),
    Ev(2L, us(10), 7L, "click"),
    Ev(3L, us(20), 7L, "view"),     // arrives in batch 2: cross-batch link
    Ev(4L, us(400), 7L, "view"),    // past the gap: new session, no pair
    Ev(5L, us(0), 8L, "view"),
    Ev(6L, us(5), 8L, "purchase"))

  private def pairBag(ts: Seq[(String, String)]): Map[(String, String), Int] =
    ts.groupBy(identity).view.mapValues(_.size).toMap

  test("streamed transitions match batch markov counts; cross-batch pairs link") {
    val sp = spark; import sp.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingJourneys.transitions(in.toDS())
      .writeStream.format("memory").queryName("journeys_out")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-journeys-").toString)
      .start()
    try {
      in.addData(rows.take(2)) // user 7: view, click
      q.processAllAvailable()
      val afterB1 = sp.table("journeys_out").collect()
        .map(r => (r.getString(2), r.getString(3)))
      pairBag(afterB1.toSeq) shouldBe Map(("view", "click") -> 1)

      in.addData(rows.drop(2)) // the cross-batch click->view + the rest
      q.processAllAvailable()
      val all = sp.table("journeys_out").collect()
        .map(r => (r.getString(2), r.getString(3)))
      // the click(b1) -> view(b2) pair exists ONLY because state carried over
      pairBag(all.toSeq) shouldBe Map(
        ("view", "click") -> 1, ("click", "view") -> 1, ("view", "purchase") -> 1)

      // parity with the batch operator on the same rows (counts, pre-normalization)
      val batch = Events.markovTransitions(
        rows.map(e => (e.event_id, e.ts, e.user_id, e.event_type, 0.0, "{}"))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      batch shouldBe pairBag(all.toSeq).map { case (k, v) => k -> v.toLong }

      // session numbering: the post-gap view opened session 2 silently
      val sessions = sp.table("journeys_out").collect()
        .filter(_.getLong(0) == 7L).map(_.getLong(1)).toSet
      sessions shouldBe Set(1L) // transitions only ever came from session 1
    } finally q.stop()
  }

  test("batch-mode fold equals the batch operator (state store starts empty)") {
    val sp = spark; import sp.implicits._
    val out = StreamingJourneys.transitions(rows.toDS()).collect()
      .map(t => (t.from_type, t.to_type))
    pairBag(out.toSeq) shouldBe Map(
      ("view", "click") -> 1, ("click", "view") -> 1, ("view", "purchase") -> 1)
  }
}
