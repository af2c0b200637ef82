package graft

import java.nio.file.Files

import graft.TransitFixture
import graft.engine.Encode
import graft.sources.StreamAdapters

/** The runner's wiring: arg parsing and one subscribe→run→publish cycle
  * over the file transport. */
class MainAppSpec extends SparkSpec {

  test("parse: full flag set and rejection of malformed command lines") {
    val c = MainApp.parse(Array("--topics", "/t", "--bootstrap", "b:9092",
      "--checkpoint", "/c", "--state", "/s", "--publish-every", "5",
      "--staging", "reliable-checkpoint", "--staging-dir", "/stg",
      "--state-store", "rocksdb"))
    c shouldBe MainApp.Conf(Some("/t"), "b:9092", "/c", Some("/s"), 5L,
      Some("reliable-checkpoint"), Some("/stg"), "rocksdb")
    intercept[IllegalArgumentException](MainApp.parse(Array("--bogus", "x")))
    intercept[IllegalArgumentException](
      MainApp.parse(Array("--staging", "ramdisk"))) // unknown policy
    intercept[IllegalArgumentException](
      MainApp.parse(Array("--state-store", "leveldb"))) // unknown provider
    // a flag missing its value must not swallow the next flag
    intercept[IllegalArgumentException](
      MainApp.parse(Array("--topics", "--checkpoint")))
    intercept[IllegalArgumentException](MainApp.parse(Array("--topics")))
    intercept[IllegalArgumentException](
      MainApp.parse(Array("--publish-every", "0")))
  }

  test("wire refuses an existing checkpoint without durable state") {
    val root = Files.createTempDirectory("graft-main-guard-").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$root/ckpt"))
    val e = intercept[IllegalArgumentException] {
      MainApp.wire(spark, MainApp.Conf(topicsDir = Some(root),
        checkpoint = s"$root/ckpt"))
    }
    e.getMessage should include("--state")
  }

  test("wire runs the 13 queries from topics and publishes envelopes") {
    val root = Files.createTempDirectory("graft-main-").toString
    val conf = MainApp.Conf(topicsDir = Some(root),
      checkpoint = s"$root/ckpt", stateDir = Some(s"$root/state"))
    val ref = MainApp.topicRef(conf) _
    Seq("Routes_topic", "Trips_topic")
      .foreach(t => StreamAdapters.createTopicIfNotExists(ref(t)))
    StreamAdapters.writeBatchRaw(
      Encode.routesRaw(routesDf(TransitFixture.routes)), ref("Routes_topic"))
    StreamAdapters.writeBatchRaw(
      Encode.tripsRaw(tripsDf(TransitFixture.trips)), ref("Trips_topic"))

    val (job, queries, publish) = MainApp.wire(spark, conf)
    try {
      queries.foreach(_.processAllAvailable())
      publish()
      val out = StreamAdapters.readBatchRaw(spark, ref("projeto3_total_passengers"))
        .collect()
      out.length shouldBe 1
      out(0).getString(0) shouldBe "totalPassengers"
      out(0).getString(1) should include(""""totalPassengers":9""")

      // an idle cycle publishes nothing new (changed-only publishing)
      publish()
      StreamAdapters.readBatchRaw(spark, ref("projeto3_total_passengers"))
        .count() shouldBe 1
    } finally queries.foreach(_.stop())
    job.store.names should contain("q13_most_occupied_operator")
  }
}
