package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkSpec

/** Schema-drift tripwire (VERDICT r8 #2): the driver has regenerated the
  * events testdata with a DIFFERENT physical `ts` encoding once already
  * (TIMESTAMP(NANOS) int64 → TIMESTAMP(MICROS)), silently breaking 12
  * queries. This spec pins [[Tables.events]]' contract — `ts` is epoch-µs
  * int64 no matter what parquet ships — against every encoding seen so
  * far, so the next regen fails HERE, in one named test, not across the
  * events family. */
class TablesSpec extends SparkSpec {

  // one instant, three physical encodings: 2024-01-02 03:04:05.123456 UTC
  private val instantUs = 1704164645123456L

  private def writeRead(dir: String, cast: String): org.apache.spark.sql.DataFrame = {
    val sp = spark; import sp.implicits._
    Seq((1L, instantUs)).toDF("event_id", "us")
      .select(col("event_id"), expr(cast).as("ts"))
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-tables-$tag-").toString

  test("normalizeEventTs: µs-timestamp, timestamp_ntz, and int64-nanos encodings all land on the same epoch-µs long") {
    val asLtz   = writeRead(tmp("ltz"), "timestamp_micros(us)")
    val asNtz   = writeRead(tmp("ntz"), "cast(timestamp_micros(us) as timestamp_ntz)")
    val asNanos = writeRead(tmp("ns"), "us * 1000")  // int64 epoch-nanos (legacy nanosAsLong shape)
    for (raw <- Seq(asLtz, asNtz, asNanos)) {
      val out = Tables.normalizeEventTs(raw)
      out.schema("ts").dataType shouldBe LongType
      out.select("ts").collect().map(_.getLong(0)).toSeq shouldBe Seq(instantUs)
    }
  }

  test("normalizeEventTs: the NTZ branch is timezone-independent") {
    val dir = tmp("ntz-tz")
    writeRead(dir, "cast(timestamp_micros(us) as timestamp_ntz)")
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      Tables.normalizeEventTs(spark.read.parquet(dir))
        .select("ts").collect().map(_.getLong(0)).toSeq shouldBe Seq(instantUs)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("normalizeEventTs: an unsupported ts type fails loudly, not downstream") {
    val sp = spark; import sp.implicits._
    val raw = Seq((1L, "not-a-time")).toDF("event_id", "ts")
    an[IllegalArgumentException] should be thrownBy Tables.normalizeEventTs(raw)
  }

  // ---- live-testdata smoke: expected columns + the normalized ts type ----

  private val sf = "/root/testdata/sf0.001"

  test("events: normalized schema over the driver's current testdata") {
    val ev = Tables.events(spark, sf)
    ev.schema("ts").dataType shouldBe LongType
    ev.columns.toSet shouldBe Set("event_id", "ts", "user_id", "event_type", "value", "props")
    // sanity: normalized instants sit in a plausible epoch-µs band
    // (year 2000..2100), which a silently-wrong unit would leave by 1000×
    val r = ev.agg(min("ts"), max("ts")).collect()(0)
    r.getLong(0) should be > 946684800000000L   // 2000-01-01 in µs
    r.getLong(1) should be < 4102444800000000L  // 2100-01-01 in µs
  }

  test("every table exposes the columns the registry depends on") {
    Map(
      "part"       -> Set("p_partkey", "p_size", "p_brand"),
      "lineitem"   -> Set("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_shipdate"),
      "documents"  -> Set("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Set("vec_id", "embedding", "label"),
    ).foreach { case (name, needed) =>
      val cols = Tables.table(spark, sf, name).columns.toSet
      withClue(s"$name: ") { needed.subsetOf(cols) shouldBe true }
    }
  }

  // ---- generalized schema tripwire (VERDICT r9 #2): one named test per
  // table, so a driver regen that renames/retypes/drops a column breaks
  // exactly one test naming the table and column, not a query family ----

  for (name <- Tables.ExpectedColumns.keys.toSeq.sorted) {
    test(s"schema contract: $name matches the driver's current testdata and is readable") {
      val df = Tables.table(spark, sf, name)  // validates via the reader memo
      noException should be thrownBy Tables.validateSchema(name, df.schema)
      df.limit(1).count() shouldBe 1L  // 1-row smoke read: footer AND pages decode
    }
  }

  test("schema contract: a renamed column fails loudly, naming table and column") {
    val perturbed = org.apache.spark.sql.types.StructType(
      Tables.documents(spark, sf).schema.fields.map(f =>
        if (f.name == "text") f.copy(name = "body") else f))
    val e = the[IllegalArgumentException] thrownBy
      Tables.validateSchema("documents", perturbed)
    e.getMessage should (include("documents") and include("text"))
  }

  test("schema contract: a retyped column fails loudly") {
    val perturbed = org.apache.spark.sql.types.StructType(
      Tables.embeddings(spark, sf).schema.fields.map(f =>
        if (f.name == "embedding")
          f.copy(dataType = org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType))
        else f))
    val e = the[IllegalArgumentException] thrownBy
      Tables.validateSchema("embeddings", perturbed)
    e.getMessage should (include("embeddings") and include("array<double>"))
  }

  test("schema contract: sanctioned events.ts variance all passes; a fourth encoding does not") {
    val base = Tables.table(spark, sf, "events").schema
    for (t <- Seq("timestamp", "timestamp_ntz", "bigint")) {
      val s = org.apache.spark.sql.types.StructType(base.fields.map(f =>
        if (f.name == "ts")
          f.copy(dataType = org.apache.spark.sql.types.DataType.fromDDL(t)) else f))
      noException should be thrownBy Tables.validateSchema("events", s)
    }
    val bad = org.apache.spark.sql.types.StructType(base.fields.map(f =>
      if (f.name == "ts")
        f.copy(dataType = org.apache.spark.sql.types.StringType) else f))
    an[IllegalArgumentException] should be thrownBy
      Tables.validateSchema("events", bad)
  }

  test("schema contract: an additive regen (extra column) stays backwards-compatible") {
    val extended = org.apache.spark.sql.types.StructType(
      Tables.documents(spark, sf).schema.fields :+
        org.apache.spark.sql.types.StructField("quality_tier",
          org.apache.spark.sql.types.StringType))
    noException should be thrownBy Tables.validateSchema("documents", extended)
  }
}
