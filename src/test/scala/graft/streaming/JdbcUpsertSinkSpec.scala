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
