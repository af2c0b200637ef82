package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.StreamingGrowth.Ev

/** [[StateStores]]: a keyed `mapGroupsWithState` face produces IDENTICAL
  * output under the RocksDB state-store provider — provider choice is a
  * placement decision (on-heap map vs off-heap SSD), never a semantic
  * one — and a checkpoint written by RocksDB restarts under RocksDB with
  * its state intact. This is the 100 TB path: user-cardinality ledgers
  * do not fit an on-heap HDFSBackedStateStore (VERDICT r10 #7). */
class RocksDbStateSpec extends SparkSpec {

  private def dus(day: Long): Long = day * 86400L * 1000000L

  private val chunk1 = Seq(Ev(1L, dus(0), 7L), Ev(2L, dus(1), 7L),
    Ev(3L, dus(1), 8L), Ev(4L, dus(0), 9L))
  private val chunk2 = Seq(Ev(5L, dus(3), 7L), Ev(6L, dus(2), 8L))

  /** Run the growth face over `chunks` (each chunk its own trigger) into
    * a foreachBatch buffer; returns the emitted increments. */
  private def runGrowth(ckpt: String,
                        chunks: Seq[Seq[Ev]]): Seq[(Long, Long, String)] = {
    val sp = spark; import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[Ev]
    var sunk = Seq.empty[(Long, Long, String)]
    val q = StreamingGrowth.increments(in.toDS())
      .writeStream.outputMode("append").option("checkpointLocation", ckpt)
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[StreamingGrowth.Inc],
                       _: Long) =>
        sunk ++= ds.collect().toSeq.map(i => (i.user_id, i.day, i.kind))
      }.start()
    try chunks.foreach { c => in.addData(c); q.processAllAvailable() }
    finally q.stop()
    sunk
  }

  test("growth increments under RocksDB == default provider; state survives a RocksDB restart") {
    val sp = spark; import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val expected = runGrowth(
      Files.createTempDirectory("graft-heap-").toString, Seq(chunk1, chunk2))

    StateStores.useRocksDb(spark)
    try {
      spark.conf.get(StateStores.ProviderKey) shouldBe StateStores.RocksDbProvider
      val ckpt = Files.createTempDirectory("graft-rocks-").toString
      // incarnation 1 under RocksDB
      val inc1 = runGrowth(ckpt, Seq(chunk1))

      // incarnation 2: a NEW query over the same checkpoint restores the
      // RocksDB store — the cross-restart gap retro-classifies off the
      // restored lastDay (chunk 2 was produced while the query was down)
      val in = MemoryStream[Ev]
      in.addData(chunk1) // source replay space; offsets resume past it
      in.addData(chunk2)
      var inc2 = Seq.empty[(Long, Long, String)]
      val q2 = StreamingGrowth.increments(in.toDS())
        .writeStream.outputMode("append").option("checkpointLocation", ckpt)
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[StreamingGrowth.Inc],
                         _: Long) =>
          inc2 ++= ds.collect().toSeq.map(i => (i.user_id, i.day, i.kind))
        }.start()
      try q2.processAllAvailable() finally q2.stop()

      (inc1 ++ inc2).toSet shouldBe expected.toSet
      inc2.toSet shouldBe
        Set((7L, 2L, "churned"), (7L, 3L, "resurrected"), (8L, 2L, "retained"))
    } finally StateStores.useDefault(spark)
  }
}
