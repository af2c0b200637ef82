package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.{EnvelopeTransformer, Schemas}

/** The side pipelines beyond the 13 queries (SURVEY §2.3): the envelope
  * transformer ELT channel (batch AND streaming over a real file source)
  * and observe() input metrics (the peek analog). */
class SideChannelsSpec extends SparkSpec {

  private val routeJson =
    """{"routeId":"r1","origin":"a","destination":"b","transportType":"Bus","capacity":42,"operator":"OpA"}"""

  test("envelope transformer: raw JSON -> typed -> Connect envelope (batch)") {
    val sp = spark; import sp.implicits._
    val out = EnvelopeTransformer.routes(Seq(routeJson).toDF("value")).collect()
    out.length shouldBe 1
    out(0).getString(0) shouldBe "r1"
    val v = out(0).getString(1)
    v should include ("""{"field":"capacity","type":"int32"}""")
    v should include (""""operator":"OpA"""")
  }

  test("envelope transformer runs as a streaming query over a file source") {
    val inDir = Files.createTempDirectory("graft-files-")
    Files.writeString(inDir.resolve("routes-0.json"), routeJson + "\n")
    val raw = spark.readStream
      .schema("value STRING")
      .format("text").load(inDir.toString)
      .select(col("value"))
    val got = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val q = EnvelopeTransformer.routes(raw).writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-ft-").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= b.collect().map(r => (r.getString(0), r.getString(1)))
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      Files.writeString(inDir.resolve("routes-1.json"),
        routeJson.replace("r1", "r2") + "\n")
      q.processAllAvailable()
      got.map(_._1).toSet shouldBe Set("r1", "r2")
      got.foreach(_._2 should include (""""payload":{"""))
    } finally q.stop()
  }

  test("observe() surfaces per-trigger input metrics on the union runner") {
    val sp = spark; import sp.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val routesIn = MemoryStream[Schemas.Route]
    val tripsIn = MemoryStream[Schemas.Trip]
    val job = new TransitStreamingJob(spark, routesIn.toDF(), tripsIn.toDF())
    val queries = job.startAll(Files.createTempDirectory("graft-obs-").toString)
    try {
      routesIn.addData(Schemas.Route("r1", "a", "b", "Bus", 10, "Op", ts("2024-01-01 09:00:00")))
      tripsIn.addData(Schemas.Trip("t1", null, "a", "b", "Bus", "P", ts("2024-01-01 10:00:00")))
      queries.foreach(_.processAllAvailable())
      val union = queries.find(_.name == "union_runner").get
      // inputs may land in separate micro-batches: sum over all triggers
      val metrics = union.recentProgress.toSeq.flatMap(p =>
        Option(p.observedMetrics.get("graft_input")))
      metrics should not be empty
      metrics.map(_.getAs[Long]("events")).sum shouldBe 2L
      metrics.map(_.getAs[Long]("keyed_events")).sum shouldBe 1L // null trip key
    } finally queries.foreach(_.stop())
  }
}
