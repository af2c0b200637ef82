package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Events
import graft.streaming.StreamingCusum.{CusumState, DayCount}

/** Continuous CUSUM monitor: the O(1) keyed recurrence against the frozen
  * model lands on the batch face's prefix-identity values (same reals,
  * different op order → float tolerance), silent days fold as zeros
  * across the micro-batch boundary, and alarms agree. */
class StreamingCusumSpec extends SparkSpec {

  private val usDay = 86400L * 1000000L

  // type A: quiet 2/day on days 0-1, loud 12/day on days 2 and 4, SILENT
  // day 3 (the outage must register); type B: constant 3/day
  private val counts: Seq[(String, Long, Long)] =
    Seq(("A", 0L, 2L), ("A", 1L, 2L), ("A", 2L, 12L), ("A", 4L, 12L)) ++
      (0L to 4L).map(d => ("B", d, 3L))

  private def eventsDf: DataFrame = {
    val sp = spark; import sp.implicits._
    counts.flatMap { case (t, d, n) =>
      (0L until n).map(i => (d * 1000 + i, d * usDay + i * 1000000L, 1L, t, 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("streamed recurrence == batch prefix identity; gap days fold as zeros") {
    val sp = spark; import sp.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val model = StreamingCusum.modelOf(Events.cusumModel(eventsDf))
    val batch = Events.cusum(eventsDf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    val in = MemoryStream[DayCount]
    val got = scala.collection.mutable.Map[String, CusumState]()
    val q = StreamingCusum.monitor(in.toDS(), model)
      .writeStream.outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-cusum-").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[CusumState], _: Long) =>
        b.collect().foreach(s => got(s.event_type) = s); ()
      }
      .start()
    try {
      val (early, late) = counts.partition(_._2 <= 2)
      in.addData(early.map { case (t, d, n) => DayCount(t, d, n) }: _*)
      q.processAllAvailable()
      val mid = got("A")
      mid.last_day shouldBe 2L
      in.addData(late.map { case (t, d, n) => DayCount(t, d, n) }: _*)
      q.processAllAvailable()
      Seq("A", "B").foreach { t =>
        val st = got(t)
        st.last_day shouldBe 4L
        st.n_days shouldBe 5L // A's silent day 3 was folded as a zero
        val (bp, bn, alarm) = batch((t, 4L))
        st.cusum_pos shouldBe bp +- 1e-5
        st.cusum_neg shouldBe bn +- 1e-5
        st.alarm shouldBe alarm
      }
      // constant series carries zero cusum mass on both sides
      got("B").cusum_pos shouldBe 0.0 +- 1e-9
      got("B").cusum_neg shouldBe 0.0 +- 1e-9
    } finally q.stop()
  }
}
