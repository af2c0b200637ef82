package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSpec, TransitFixture}
import graft.engine.{Encode, Envelope}
import graft.operators.TransitQueries
import graft.sources.StreamAdapters
import graft.sources.StreamAdapters.TopicRef

/** The reference's complete data path over the REAL Kafka transport
  * (VERDICT r16 #3) — `FullLoopSpec`'s twin with the file fallback
  * swapped for a live broker: AdminClient topic DDL (3 partitions, the
  * `commands.sh:48-49` contract), JSON wire producers keyed by entity
  * id, the 13-query streaming job subscribed to
  * `Routes_topic`/`Trips_topic`, and the `projeto3_*` envelope topics
  * read back with the reference's record keys.
  *
  * GATED, not skipped silently: this build is zero-egress and ships
  * without `spark-sql-kafka-0-10` (offline coursier — the connector and
  * kafka-clients cannot resolve, and no broker exists in the sandbox),
  * so the spec CANCELS with that reason here. A deployment that adds
  * the connector jar and exports `GRAFT_KAFKA_BOOTSTRAP=<host:port>`
  * runs the full loop against its broker — every Kafka call sits behind
  * [[StreamAdapters]]' soft-dependency seam, so nothing here needs the
  * jar at compile time. Until then the transport-independent semantics
  * stay covered by `FullLoopSpec` (file twin) and
  * `StreamAdaptersSpec` (brokerless option builders). */
class KafkaIntegrationSpec extends SparkSpec {

  test("full reference loop over a live Kafka broker " +
    "(needs spark-sql-kafka on the classpath + GRAFT_KAFKA_BOOTSTRAP)") {
    assume(StreamAdapters.kafkaConnectorPresent,
      "spark-sql-kafka-0-10 is not on the classpath (zero-egress build); " +
        "the file-backed twin FullLoopSpec covers the adapter contract")
    val bootstrap = sys.env.get("GRAFT_KAFKA_BOOTSTRAP")
    assume(bootstrap.isDefined,
      "no GRAFT_KAFKA_BOOTSTRAP=<host:port> broker provided")
    def ref(topic: String) = TopicRef(topic, bootstrap = bootstrap.get)

    // -- topic DDL through the REAL AdminClient path (reflective seam)
    val routesT = ref("Routes_topic"); val tripsT = ref("Trips_topic")
    Seq(routesT, tripsT).foreach(
      StreamAdapters.createTopicIfNotExists(_, partitions = 3))
    // idempotence: the reference calls this on every boot
    StreamAdapters.createTopicIfNotExists(routesT, partitions = 3)

    // -- produce the fixture (JSON wire, record key = entity id)
    StreamAdapters.writeBatchRaw(
      Encode.routesRaw(routesDf(TransitFixture.routes)), routesT)
    StreamAdapters.writeBatchRaw(
      Encode.tripsRaw(tripsDf(TransitFixture.trips)), tripsT)

    // -- the 13-query job subscribed over the wire
    val job = TransitStreamingJob.fromTopics(spark, routesT, tripsT)
    val queries = job.startAll(
      Files.createTempDirectory("graft-kafka-ckpt-").toString)
    try queries.foreach(_.processAllAvailable())
    finally queries.foreach(_.stop())

    // -- publish every result table to its projeto3_* topic and read the
    //    wire back: serialization, key partitioning, envelope — the three
    //    things the file twin cannot prove
    ResultPublisher.publishAll(job.store, ref)
    val q5 = Envelope.unwrap(
      StreamAdapters.readBatchRaw(spark, ref("projeto3_passengers_per_route")),
      StructType(Seq(StructField("passengerCount", LongType))))
    val expect = TransitQueries.q5(tripsDf(TransitFixture.trips)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    q5.collect().map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe expect
    val q3 = StreamAdapters.readBatchRaw(
      spark, ref("projeto3_most_trips_passenger"))
    q3.select("key").distinct().collect().map(_.getString(0)).toSeq shouldBe
      Seq("maxTripsPassenger")
  }
}
