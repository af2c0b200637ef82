package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Events
import graft.streaming.StreamingChurn.{Ev, UserLedger}

/** Continuous churn ledger: per-user state accumulates ACROSS
  * micro-batches (update-mode re-emission), the final upserted snapshot
  * equals the batch groupBy(user) aggregate, and the read-time segment
  * rollup over that snapshot equals the batch churn query exactly. */
class StreamingChurnSpec extends SparkSpec {

  private def dus(day: Long, m: Long = 0): Long =
    day * 86400L * 1000000L + m * 60L * 1000000L

  private val rows = Seq(
    Ev(1L, dus(0), 1L, "view", 0.0),
    Ev(2L, dus(0, 30), 1L, "purchase", 10.0),
    Ev(3L, dus(1), 2L, "purchase", 5.0),
    Ev(4L, dus(20), 1L, "view", 0.0),       // batch 2: user 1 stays active
    Ev(5L, dus(20, 5), 3L, "purchase", 2.5)) // batch 2: new user appears

  private def toEventsDf(es: Seq[Ev]) = {
    val sp = spark; import sp.implicits._
    es.map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("ledger state accumulates across batches; upsert snapshot == batch aggregate") {
    val sp = spark; import sp.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[Ev]
    // the serving-table consumer: latest emission per user wins (upsert)
    val served = scala.collection.mutable.Map[Long, UserLedger]()
    val q = StreamingChurn.ledger(in.toDS())
      .writeStream.outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-churn-").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[UserLedger], _: Long) =>
        batch.collect().foreach(l => served(l.user_id) = l); ()
      }
      .start()
    try {
      in.addData(rows.take(3))
      q.processAllAvailable()
      served(1L) shouldBe UserLedger(1L, dus(0, 30), 2L, 10.0)
      served(2L) shouldBe UserLedger(2L, dus(1), 1L, 5.0)

      in.addData(rows.drop(3))
      q.processAllAvailable()
      // user 1's batch-2 event folded INTO carried state, not a fresh row
      served(1L) shouldBe UserLedger(1L, dus(20), 3L, 10.0)
      served(3L) shouldBe UserLedger(3L, dus(20, 5), 1L, 2.5)

      // the upserted snapshot is exactly the batch per-user aggregate
      val batchLedger = toEventsDf(rows).groupBy("user_id").agg(
        org.apache.spark.sql.functions.max("ts").as("last_ts"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_events"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.when(
            org.apache.spark.sql.functions.col("event_type") === "purchase",
            org.apache.spark.sql.functions.col("value")).otherwise(0.0))
          .as("purchase_value"))
        .collect().map(r => r.getLong(0) ->
          UserLedger(r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toMap
      served.toMap shouldBe batchLedger

      // read-time segmentation over the snapshot == the batch churn query
      val snapshot = served.values.toSeq.toDS().toDF()
      val streamedSeg = StreamingChurn.segments(snapshot).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
      val batchSeg = Events.churnSegments(toEventsDf(rows)).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
      streamedSeg shouldBe batchSeg
      // and the crafted stream genuinely exercises both sides of a boundary:
      // users 1,3 active at the day-20 anchor; user 2 (19 days stale) churned
      streamedSeg.keySet shouldBe Set("active", "churned")
    } finally q.stop()
  }

  test("batch-mode fold equals the batch aggregate (state store starts empty)") {
    val sp = spark; import sp.implicits._
    val out = StreamingChurn.ledger(rows.toDS()).collect()
      .map(l => l.user_id -> l).toMap
    out(1L) shouldBe UserLedger(1L, dus(20), 3L, 10.0)
    out(2L) shouldBe UserLedger(2L, dus(1), 1L, 5.0)
    out(3L) shouldBe UserLedger(3L, dus(20, 5), 1L, 2.5)
  }
}
