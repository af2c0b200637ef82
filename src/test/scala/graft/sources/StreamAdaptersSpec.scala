package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSpec, TransitFixture}
import graft.engine.{Decode, Encode, Envelope}
import graft.operators.TransitQueries
import graft.sources.StreamAdapters.TopicRef
import graft.streaming.TransitStreamingJob

/** The transport-agnostic topic adapter, exercised over its file fallback:
  * produce wire JSON → topic dir → stream-subscribe → decode → run the
  * 13-query job → envelope → produce results to an output topic → re-read
  * and unwrap. The Kafka branch's option wiring is asserted brokerless. */
class StreamAdaptersSpec extends SparkSpec {

  private lazy val root = Files.createTempDirectory("graft-topics-").toString
  private def ref(topic: String) = TopicRef(topic, fallbackDir = Some(root))

  test("the Kafka connector is absent here and the option builders carry the topology") {
    StreamAdapters.kafkaConnectorPresent shouldBe false
    val r = TopicRef("Routes_topic", bootstrap = "b1:9092,b2:9092")
    StreamAdapters.kafkaSourceOptions(r) shouldBe Map(
      "kafka.bootstrap.servers" -> "b1:9092,b2:9092",
      "subscribe" -> "Routes_topic",
      "startingOffsets" -> "earliest")
    StreamAdapters.kafkaSinkOptions(r) shouldBe Map(
      "kafka.bootstrap.servers" -> "b1:9092,b2:9092",
      "topic" -> "Routes_topic")
  }

  test("a topic ref without connector or fallbackDir is rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      StreamAdapters.readBatchRaw(spark, TopicRef("nowhere"))
    }
    e.getMessage should include("nowhere")
  }

  test("createTopicIfNotExists is idempotent on the file transport") {
    StreamAdapters.createTopicIfNotExists(ref("ddl_topic"))
    StreamAdapters.createTopicIfNotExists(ref("ddl_topic"))
    Files.isDirectory(Paths.get(s"$root/ddl_topic")) shouldBe true
  }

  test("wire encode → topic → decode round-trips the transit views, orphans and nulls intact") {
    val routesT = ref("Routes_topic")
    StreamAdapters.createTopicIfNotExists(routesT)
    StreamAdapters.writeBatchRaw(Encode.routesRaw(routesDf(TransitFixture.routes)), routesT)

    val back = Decode.routes(StreamAdapters.readBatchRaw(spark, routesT))
    assertSameRows(back, routesDf(TransitFixture.routes))
  }

  test("a topic-fed streaming job converges to the batch answers") {
    val routesT = ref("Routes_topic_job")
    val tripsT = ref("Trips_topic_job")
    Seq(routesT, tripsT).foreach(StreamAdapters.createTopicIfNotExists(_))
    StreamAdapters.writeBatchRaw(Encode.routesRaw(routesDf(TransitFixture.routes)), routesT)
    StreamAdapters.writeBatchRaw(Encode.tripsRaw(tripsDf(TransitFixture.trips)), tripsT)

    val job = TransitStreamingJob.fromTopics(spark, routesT, tripsT)
    val ckpt = Files.createTempDirectory("graft-adapter-ckpt-").toString
    val queries = job.startAll(ckpt)
    try {
      queries.foreach(_.processAllAvailable())
      assertSameRows(job.store("q1_seats_per_route"),
        TransitQueries.q1(routesDf(TransitFixture.routes)))
      assertSameRows(job.store("q5_passengers_per_route"),
        TransitQueries.q5(tripsDf(TransitFixture.trips)))
      assertSameRows(job.store("q9_total_passengers"),
        TransitQueries.q9(tripsDf(TransitFixture.trips)))
    } finally queries.foreach(_.stop())
  }

  test("envelope results produce to an output topic and unwrap downstream") {
    val outT = ref("projeto3_available_seats")
    StreamAdapters.createTopicIfNotExists(outT)
    val result = TransitQueries.q1(routesDf(TransitFixture.routes))
    StreamAdapters.writeBatchRaw(
      Envelope.wrap(result, "route_id").withColumn("ts", lit(null).cast("timestamp")),
      outT)

    val unwrapped = Envelope.unwrap(
      StreamAdapters.readBatchRaw(spark, outT),
      StructType(Seq(StructField("total_capacity", LongType))))
    unwrapped.select(col("key").as("route_id"), col("total_capacity"))
      .collect().toSet shouldBe
      result.select(col("route_id"), col("total_capacity")).collect().toSet
    // the declared wire tags travel with every record
    unwrapped.select(explode(col("declared_fields"))).select("col.type")
      .distinct().collect().map(_.getString(0)).toSeq shouldBe Seq("int64")
  }
}
