package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Events
import graft.streaming.StreamingGrowth.Ev

/** Keyed-state growth accounting: streamed increments equal the batch
  * decomposition for new/retained/resurrected, churn retro-emits at
  * resurrection time (cross-batch), and the ONLY batch-streamed delta is
  * the terminal churn of never-returning users — the censored mass a
  * running stream structurally cannot see. */
class StreamingGrowthSpec extends SparkSpec {

  private def dus(day: Long): Long = day * 86400L * 1000000L

  private def rollup(incs: Seq[(Long, String)]): Map[(Long, String), Long] =
    incs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def batchKinds(rows: Seq[Ev]): Map[(Long, String), Long] = {
    val sp = spark; import sp.implicits._
    Events.growthAccounting(
      rows.map(e => (e.event_id, e.ts, e.user_id, "view", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect().flatMap { r =>
        Seq("new" -> r.getLong(1), "retained" -> r.getLong(2),
          "resurrected" -> r.getLong(3), "churned" -> r.getLong(4))
          .collect { case (k, n) if n > 0 => (r.getLong(0), k) -> n }
      }.toMap
  }

  // user 7: days 0,1,3 (churn at 2 proven by the day-3 return);
  // user 8: day 1 only — returns on day 3 in batch 2 (cross-batch retro churn)
  private val rows = Seq(
    Ev(1L, dus(0), 7L), Ev(2L, dus(0) + 5L, 7L), // same-day repeat: no increment
    Ev(3L, dus(1), 7L), Ev(4L, dus(3), 7L),
    Ev(5L, dus(1), 8L), Ev(6L, dus(3), 8L))

  test("streamed increments == batch decomposition when every churn is followed by a return") {
    val sp = spark; import sp.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingGrowth.increments(in.toDS())
      .writeStream.format("memory").queryName("growth_out")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-growth-").toString)
      .start()
    try {
      in.addData(rows.take(4)) // user 7's full arc + nothing of user 8
      q.processAllAvailable()
      val b1 = sp.table("growth_out").collect()
        .map(r => (r.getLong(1), r.getString(2)))
      rollup(b1.toSeq) shouldBe Map(
        (0L, "new") -> 1L, (1L, "retained") -> 1L,
        (2L, "churned") -> 1L, (3L, "resurrected") -> 1L)

      in.addData(rows.drop(4)) // user 8: new in this batch, returns day 3
      q.processAllAvailable()
      val all = sp.table("growth_out").collect()
        .map(r => (r.getLong(1), r.getString(2)))
      // user 8's churn at day 2 retro-emits ONLY because day-1 state
      // carried across the batch boundary
      rollup(all.toSeq) shouldBe batchKinds(rows)
    } finally q.stop()
  }

  test("state is O(users), not O(events): heavy per-user volume never grows the store") {
    val sp = spark; import sp.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingGrowth.increments(in.toDS())
      .writeStream.format("memory").queryName("growth_state_out")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-growth-state-").toString)
      .start()
    try {
      var id = 0L
      // 5 users × 20 days × 10 events/day across 4 batches: 1000 events
      (0 until 4).foreach { b =>
        val evs = for (d <- (b * 5) until (b * 5 + 5); u <- 0 until 5;
                       i <- 0 until 10)
          yield { id += 1; Ev(id, dus(d.toLong) + i.toLong, u.toLong) }
        in.addData(evs); q.processAllAvailable()
      }
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      stateRows shouldBe 5L // one last-day number per user, ever
    } finally q.stop()
  }

  test("terminal churn is the exact batch-streamed delta: never-returning users censor") {
    val sp = spark; import sp.implicits._
    // user 9 stops on day 1 and never returns; corpus runs to day 4
    val term = rows ++ Seq(Ev(7L, dus(1), 9L), Ev(8L, dus(4), 7L))
    val streamed = StreamingGrowth.increments(
      term.toDS()).collect().map(i => (i.day, i.kind))
    val batch = batchKinds(term)
    val sRoll = rollup(streamed.toSeq)
    // three kinds match exactly
    batch.filter(_._1._2 != "churned") shouldBe sRoll.filter(_._1._2 != "churned")
    // churn differs by exactly user 9's terminal churn at day 2
    val sChurn = sRoll.collect { case ((d, "churned"), n) => d -> n }.toMap
    val bChurn = batch.collect { case ((d, "churned"), n) => d -> n }.toMap
    bChurn shouldBe (sChurn.updated(2L, sChurn.getOrElse(2L, 0L) + 1L) ++
      Map(4L -> 1L)) // user 8 stops at day 3 < corpus end 4: terminal at 4
  }
}
