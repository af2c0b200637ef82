package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSpec, TransitFixture}
import graft.engine.{Encode, Envelope}
import graft.operators.TransitQueries
import graft.sources.StreamAdapters
import graft.sources.StreamAdapters.TopicRef
import graft.streaming.{JdbcUpsertSink, ResultPublisher, TransitStreamingJob}

/** The reference's COMPLETE data path in one test, over the file transport:
  * producers → input topics → subscribe+decode → the 13-query streaming job
  * → per-query `projeto3_*` envelope topics (exact reference keys/fields)
  * → Connect-style JDBC upsert keyed on record_key → queryable tables.
  * Mirrors `MainStreamApp` + `KafkaSchemaTransformer` + the sink configs
  * end-to-end. */
class FullLoopSpec extends SparkSpec {

  private lazy val root = Files.createTempDirectory("graft-loop-").toString
  private def ref(topic: String) = TopicRef(topic, fallbackDir = Some(root))
  private val url = "jdbc:derby:memory:graftloop;create=true"

  test("topics in -> 13 queries -> envelope topics out -> JDBC upsert, end to end") {
    // -- produce the fixture to the input topics
    val routesT = ref("Routes_topic"); val tripsT = ref("Trips_topic")
    Seq(routesT, tripsT).foreach(StreamAdapters.createTopicIfNotExists(_))
    StreamAdapters.writeBatchRaw(Encode.routesRaw(routesDf(TransitFixture.routes)), routesT)
    StreamAdapters.writeBatchRaw(Encode.tripsRaw(tripsDf(TransitFixture.trips)), tripsT)

    // -- run the streaming job from the topics
    val job = TransitStreamingJob.fromTopics(spark, routesT, tripsT)
    val queries = job.startAll(Files.createTempDirectory("graft-loop-ckpt-").toString)
    try queries.foreach(_.processAllAvailable())
    finally queries.foreach(_.stop())

    // -- publish every result table to its projeto3_* topic
    ResultPublisher.publishAll(job.store, ref)

    // -- q5's topic carries the reference wire format exactly
    val q5Raw = StreamAdapters.readBatchRaw(spark, ref("projeto3_passengers_per_route"))
    val q5 = Envelope.unwrap(q5Raw,
      StructType(Seq(StructField("passengerCount", LongType))))
    val expect = TransitQueries.q5(tripsDf(TransitFixture.trips)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    q5.collect().map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe expect
    q5.select(explode(col("declared_fields"))).select("col.field", "col.type")
      .distinct().collect().map(r => (r.getString(0), r.getString(1))).toSeq shouldBe
      Seq(("passengerCount", "int64"))

    // -- constant-key topics: one key, reference string
    val q3 = StreamAdapters.readBatchRaw(spark, ref("projeto3_most_trips_passenger"))
    q3.select("key").distinct().collect().map(_.getString(0)).toSeq shouldBe
      Seq("maxTripsPassenger")

    // -- Connect-style JDBC upsert of the q5 topic, pk = record_key
    // (column named record_key: `key` is a SQL reserved word)
    val flat = q5.select(col("key").as("record_key"), col("passengerCount"))
    val sink = new JdbcUpsertSink(url, "projeto3_passengers_per_route",
      Seq("record_key"), flat.schema)
    sink.ensureTable()
    sink.writeBatch(flat, 0L)

    // -- a re-emission upserts (latest wins), never duplicates
    val bumped = flat.withColumn("passengerCount", col("passengerCount") + 100L)
    sink.writeBatch(bumped, 1L)
    val table = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "projeto3_passengers_per_route").load()
    table.count() shouldBe flat.count()
    table.collect().map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
      expect.map { case (k, v) => k -> (v + 100L) }
  }
}
