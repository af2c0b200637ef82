package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Events
import graft.streaming.StreamingBotFlag.{BotState, Ev}

/** Continuous bot monitor: keyed state carries the gap run ACROSS
  * micro-batches, burst columns equal the batch query exactly, and the
  * metronome flag fires only once the identical-gap run crosses the
  * threshold. */
class StreamingBotFlagSpec extends SparkSpec {

  private val sec = 1000000L

  // metronome: 25 events, 300 s cadence, split mid-stream so the run
  // must survive the batch boundary; human: all-distinct gaps; burster:
  // 12 events inside minute zero
  private val metro = (0 until 25).map(i =>
    Ev(100L + i, 1000L * sec + i * 300 * sec, 2L))
  private val human = (0 until 25).scanLeft(2000000L * sec) {
    (t, i) => t + (120 + i) * sec }.tail.zipWithIndex.map {
    case (t, i) => Ev(200L + i, t, 3L) }
  private val burst = (0 until 12).map(i => Ev(300L + i, i * 5 * sec, 1L))

  private def toEventsDf(es: Seq[Ev]) = {
    val sp = spark; import sp.implicits._
    es.map(e => (e.event_id, e.ts, e.user_id, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("gap run survives the batch boundary; burst columns == batch botFlag") {
    val sp = spark; import sp.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[Ev]
    val served = scala.collection.mutable.Map[Long, BotState]()
    val q = StreamingBotFlag.monitor(in.toDS())
      .writeStream.outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-bot-").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[BotState], _: Long) =>
        b.collect().foreach(s => served(s.user_id) = s); ()
      }
      .start()
    try {
      // batch 1: first 10 metronome beats (9 gaps) + half the human
      in.addData(metro.take(10) ++ human.take(12))
      q.processAllAvailable()
      served(2L).max_run shouldBe 9L
      served(2L).is_bot shouldBe false // run below the threshold so far

      // batch 2: the rest — gap continuity means run = 24, flag fires
      in.addData(metro.drop(10) ++ human.drop(12) ++ burst)
      q.processAllAvailable()
      served(2L).max_run shouldBe 24L
      served(2L).is_bot shouldBe true
      served(3L).max_run shouldBe 1L   // human never repeats a gap
      served(3L).is_bot shouldBe false
      served(1L).max_per_min shouldBe 12L
      served(1L).is_bot shouldBe true  // burst path

      // burst-signal parity with the batch operator, per user
      val batch = Events.botFlag(toEventsDf(metro ++ human ++ burst))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      Seq(1L, 2L, 3L).foreach { u =>
        (served(u).n_events, served(u).max_per_min) shouldBe batch(u)
      }
    } finally q.stop()
  }
}
