package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.engine.Schemas.Route

/** The reference's persistence contract, end-to-end against embedded Derby:
  * a streaming aggregation upserts into a JDBC table keyed on the result
  * key (`pk.mode=record_key`), updates overwrite, and the table converges
  * to the final state. */
class JdbcUpsertSinkSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("streaming aggregation upserts into Derby and converges to final state") {
    val sp = spark; import sp.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[Route]
    val agg = in.toDF()
      .filter(org.apache.spark.sql.functions.col("route_id").isNotNull)
      .groupBy("route_id")
      .agg(org.apache.spark.sql.functions.sum("capacity").as("total_capacity"))

    val sink = new JdbcUpsertSink(url, "q1_seats", Seq("route_id"),
      StructType(Seq(StructField("route_id", StringType),
        StructField("total_capacity", LongType))))
    sink.ensureTable()

    val q = agg.writeStream.outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("jdbc-sink-").toString)
      .foreachBatch(sink.writeBatch _)
      .start()
    try {
      in.addData(Route("r1", "a", "b", "Bus", 100, "Op", ts("2024-01-01 09:00:00")),
                 Route("r2", "a", "b", "Bus", 50, "Op", ts("2024-01-01 09:00:01")))
      q.processAllAvailable()
      in.addData(Route("r1", "a", "b", "Bus", 20, "Op", ts("2024-01-01 09:10:00")))
      q.processAllAvailable()

      val back = spark.read.format("jdbc")
        .option("url", url).option("dbtable", "q1_seats").load()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      back shouldBe Map("r1" -> 120L, "r2" -> 50L) // r1 upserted, not duplicated
    } finally q.stop()
  }

  test("a batch with duplicate keys across partitions writes exactly one row per key") {
    val sp = spark; import sp.implicits._
    // ADVICE r2: same key in two partitions used to insert twice (separate
    // transactions), with a nondeterministic survivor; writeBatch now
    // compacts to one row per key (max payload wins) before writing
    val df = Seq(("r1", 10L), ("r1", 30L), ("r1", 20L), ("r2", 5L))
      .toDF("route_id", "total_capacity").repartition(4)
    val sink = new JdbcUpsertSink(url, "q1_seats_dup", Seq("route_id"), df.schema)
    sink.ensureTable()
    sink.writeBatch(df, 0L)
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "q1_seats_dup").load()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    back shouldBe Map("r1" -> 30L, "r2" -> 5L)
  }

  test("auto-created table carries a PRIMARY KEY on the key columns") {
    val sp = spark; import sp.implicits._
    val df = Seq(("r1", 1L)).toDF("route_id", "total_capacity")
    val sink = new JdbcUpsertSink(url, "q1_seats_pk", Seq("route_id"), df.schema)
    sink.ensureTable()
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getPrimaryKeys(null, null, "Q1_SEATS_PK")
      val pkCols = Iterator.continually(rs).takeWhile(_.next())
        .map(_.getString("COLUMN_NAME")).toSet
      pkCols shouldBe Set("ROUTE_ID")
    } finally conn.close()
  }

  test("auto.evolve: a widened batch adds nullable columns and upserts through them") {
    val sp = spark; import sp.implicits._
    val v1 = Seq(("r1", 10L), ("r2", 20L)).toDF("route_id", "total_capacity")
    val sink = new JdbcUpsertSink(url, "q1_seats_ev", Seq("route_id"), v1.schema)
    sink.ensureTable()
    sink.writeBatch(v1, 0L)
    // the producer widened: a new operator column appears mid-stream
    val v2 = Seq(("r2", 25L, "OpB"), ("r3", 30L, "OpC"))
      .toDF("route_id", "total_capacity", "operator")
    sink.writeBatch(v2, 1L)
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "q1_seats_ev").load()
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.getString(2))))).toMap
    back shouldBe Map(
      "r1" -> ((10L, None)),        // pre-evolution row: new column NULL
      "r2" -> ((25L, Some("OpB"))), // upserted through the widened schema
      "r3" -> ((30L, Some("OpC"))))
    // replaying the widened batch against the evolved table stays idempotent
    sink.writeBatch(v2, 1L)
    spark.read.format("jdbc").option("url", url)
      .option("dbtable", "q1_seats_ev").load().count() shouldBe 3
  }

  test("auto.evolve refuses a new PRIMARY KEY column loudly") {
    val sp = spark; import sp.implicits._
    val v1 = Seq(("r1", 1L)).toDF("route_id", "total_capacity")
    val sink = new JdbcUpsertSink(url, "q1_seats_evk", Seq("route_id", "shard"),
      StructType(Seq(StructField("route_id", StringType),
        StructField("shard", LongType), StructField("total_capacity", LongType))))
    sink.ensureTable()
    // a batch that carries a NEVER-SEEN column named like a key cannot
    // evolve (the PK is fixed at creation) — but first, a batch missing a
    // key column must be refused outright
    val e1 = intercept[IllegalArgumentException] { sink.writeBatch(v1, 0L) }
    e1.getMessage should include("shard")
    val sink2 = new JdbcUpsertSink(url, "q1_seats_evk2", Seq("route_id"),
      StructType(Seq(StructField("route_id", StringType))))
    // keyCols claims 'extra' is a key the moment it appears — simulate a
    // misconfigured widening by constructing a sink whose key list grew
    val sink3 = new JdbcUpsertSink(url, "q1_seats_evk2", Seq("route_id", "extra"),
      StructType(Seq(StructField("route_id", StringType))))
    sink2.ensureTable()
    val widened = Seq(("r1", "boom")).toDF("route_id", "extra")
    val e2 = intercept[IllegalArgumentException] { sink3.writeBatch(widened, 0L) }
    e2.getMessage should include("PRIMARY KEY")
  }

  test("re-running a batch is idempotent (delete+insert per key)") {
    val sp = spark; import sp.implicits._
    val df = Seq(("r9", 7L)).toDF("route_id", "total_capacity")
    val sink = new JdbcUpsertSink(url, "q1_seats_b", Seq("route_id"),
      df.schema)
    sink.ensureTable()
    sink.writeBatch(df, 0L)
    sink.writeBatch(df, 0L) // replayed trigger, e.g. after recovery
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "q1_seats_b").load().collect()
    back.length shouldBe 1
  }
}
