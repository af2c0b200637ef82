package graft.engine

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Connect-envelope codec contract (`utils/KafkaSchemaTransformer.java:45-66`,
  * `streamFunctions/AvailableSeatsPerRoute.java:47-61`): schema tags, payload
  * round-trip, key extraction. */
class EnvelopeSpec extends SparkSpec {

  test("wire tags match the reference's int32/int64/double/string literals") {
    Envelope.wireType(IntegerType) shouldBe "int32"
    Envelope.wireType(LongType) shouldBe "int64"
    Envelope.wireType(DoubleType) shouldBe "double"
    Envelope.wireType(StringType) shouldBe "string"
    an[IllegalArgumentException] should be thrownBy Envelope.wireType(TimestampType)
  }

  test("per-query wrap: {schema,payload}, key excluded, no name/optional tags") {
    val sp = spark; import sp.implicits._
    val df = Seq(("r1", 100L, 4.5)).toDF("route_id", "total", "pct")
    val out = Envelope.wrap(df, "route_id").collect()
    out.length shouldBe 1
    out(0).getString(0) shouldBe "r1"
    val v = out(0).getString(1)
    // AvailableSeatsPerRoute.java:47-55 — per-query schemas carry type+fields
    // only, and the payload excludes the record key
    v should startWith ("""{"schema":{"type":"struct","fields":[""")
    v should include ("""{"field":"total","type":"int64"}""")
    v should include ("""{"field":"pct","type":"double"}""")
    (v should not).include(""""name":""")
    (v should not).include(""""optional":""")
    v should include (""""payload":{"total":100,"pct":4.5}""")
  }

  test("transformer wrap: camelCase wire names, name tag, key kept in payload") {
    val sp = spark; import sp.implicits._
    val df = Seq(("r1", "Bus", 42)).toDF("route_id", "transport_type", "capacity")
    // KafkaSchemaTransformer.java:45-66 (ADVICE r2): schema is named Route
    // with optional:false, fields use the wire's camelCase, and the payload
    // is the record value verbatim — routeId included
    val v = Envelope.wrap(df, "route_id", Some("Route"),
      keepKeyInPayload = true, rename = Decode.viewToWire).collect()(0).getString(1)
    v should include (""""optional":false,"name":"Route"""")
    v should include ("""{"field":"routeId","type":"string"}""")
    v should include ("""{"field":"transportType","type":"string"}""")
    v should include ("""{"field":"capacity","type":"int32"}""")
    v should include (""""payload":{"routeId":"r1","transportType":"Bus","capacity":42}""")
    (v should not).include("route_id")
  }

  test("unwrap round-trips wrap and exposes the declared wire tags") {
    val sp = spark; import sp.implicits._
    val df = Seq(("r1", 100L, 4.5), ("r2", 7L, 0.0)).toDF("route_id", "total", "pct")
    val wrapped = Envelope.wrap(df, "route_id")
    val payload = StructType(Seq(
      StructField("total", LongType), StructField("pct", DoubleType)))
    val back = Envelope.unwrap(wrapped, payload)
      .select(col("key").as("route_id"), col("total"), col("pct"))
    assertSameRows(back, df)
    val tags = Envelope.unwrap(wrapped, payload)
      .select(explode(col("declared_fields")).as("f"))
      .select("f.field", "f.type").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    tags shouldBe Map("total" -> "int64", "pct" -> "double")
  }

  test("decode parses the reference's camelCase wire JSON into the views") {
    val sp = spark; import sp.implicits._
    val raw = Seq(
      """{"routeId":"r1","origin":"a","destination":"b","transportType":"Bus","capacity":42,"operator":"OpA"}""",
      """not json at all""").toDF("value")
    val out = Decode.routes(raw).collect()
    out.length shouldBe 2
    val ok = out.find(_.getString(0) == "r1").get
    (ok.getString(3), ok.getInt(4), ok.getString(5)) shouldBe (("Bus", 42, "OpA"))
    // malformed input nulls out (PERMISSIVE) instead of failing the stream
    out.find(r => r.isNullAt(0)) should not be empty
  }

  test("decode keeps an event-time column when present (streaming source shape)") {
    val sp = spark; import sp.implicits._
    val raw = Seq((
      """{"tripId":"t1","routeId":"r1","origin":"a","destination":"b","transportType":"Bus","passengerName":"P1"}""",
      ts("2024-01-01 10:00:00"))).toDF("value", "ts")
    val out = Decode.trips(raw).collect()(0)
    out.getString(0) shouldBe "t1"
    out.getTimestamp(6) shouldBe ts("2024-01-01 10:00:00")
  }
}
