package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka-Connect JSON envelope codec — the reference's output contract.
  *
  * Every reference query emits `{"schema": {...}, "payload": {...}}` with
  * per-field wire types `int32|int64|double|string`, built by string
  * formatting in each topology (e.g.
  * `streamFunctions/AvailableSeatsPerRoute.java:47-61`,
  * `utils/KafkaSchemaTransformer.java:45-66`). Here it is ONE reusable
  * helper: the schema half is a static literal derived from the DataFrame's
  * own schema; the payload half is `to_json(struct(...))` (codegen'd, no
  * per-query formatting). Output is compact canonical JSON — the reference's
  * text-block whitespace is not reproduced (JSON-equivalent, documented
  * divergence).
  *
  * Two reference envelope shapes, both supported (ADVICE r2):
  *   - '''per-query''' (`AvailableSeatsPerRoute.java:47-61`): schema has
  *     `type` + `fields` only (no `optional`, no `name`), and the payload
  *     excludes the record key — `wrap(df, key)`;
  *   - '''transformer''' (`KafkaSchemaTransformer.java:45-66`): schema adds
  *     `"optional":false,"name":"Route"`, and the payload is the record
  *     value verbatim, so the key field (`routeId`) STAYS in the payload
  *     with the wire's camelCase names —
  *     `wrap(df, key, Some("Route"), keepKeyInPayload = true, rename = ...)`.
  */
object Envelope {

  /** Spark type → Connect wire tag (the four tags the reference uses;
    * `AvailableSeatsPerRoute.java:51`, `PassengersPerRoute.java:48`,
    * `OccupancyPerRoute.java:75`, `NamePassengerMostTrips.java:64`). */
  def wireType(dt: DataType): String = dt match {
    case IntegerType => "int32"
    case LongType    => "int64"
    case DoubleType  => "double"
    case StringType  => "string"
    case other => throw new IllegalArgumentException(
      s"no Connect wire tag for $other (reference uses int32/int64/double/string only)")
  }

  /** The static `"schema"` half for the given payload fields. `name`
    * present → the transformer shape (`"optional":false,"name":...`,
    * `KafkaSchemaTransformer.java:45-59`); absent → the per-query shape
    * (`type`+`fields` only, `AvailableSeatsPerRoute.java:47-55`). */
  def schemaJson(fields: Seq[StructField], name: Option[String] = None): String = {
    val fieldList = fields.map(f =>
      s"""{"field":"${f.name}","type":"${wireType(f.dataType)}"}""").mkString(",")
    val tail = name.map(n => s""","optional":false,"name":"$n"""").getOrElse("")
    s"""{"type":"struct","fields":[$fieldList]$tail}"""
  }

  /** Wrap a result frame into the Connect envelope: output is
    * (key string, value string) where value =
    * `{"schema":<static literal>,"payload":<to_json>}`.
    * Key = the grouping key, matching the reference's `pk.mode=record_key`
    * JDBC upsert contract (`config/sink-passangers_per_route.json:13-15`).
    * By default the key column is excluded from the payload (the per-query
    * shape); `keepKeyInPayload` keeps it (the transformer passes
    * `record.value()` verbatim, key field and all). `rename` maps DataFrame
    * column names to wire field names (snake_case view → camelCase wire). */
  def wrap(df: DataFrame, keyCol: String, schemaName: Option[String] = None,
           keepKeyInPayload: Boolean = false,
           rename: Map[String, String] = Map.empty): DataFrame = {
    val payloadFields = df.schema.fields.toSeq
      .filter(f => keepKeyInPayload || f.name != keyCol)
      .map(f => f.copy(name = rename.getOrElse(f.name, f.name)))
    val payloadCols = df.schema.fields.toSeq
      .filter(f => keepKeyInPayload || f.name != keyCol)
      .map(f => col(f.name).as(rename.getOrElse(f.name, f.name)))
    val schemaLit = schemaJson(payloadFields, schemaName)
    df.select(
      col(keyCol).cast("string").as("key"),
      concat(
        lit(s"""{"schema":$schemaLit,"payload":"""),
        to_json(struct(payloadCols: _*)),
        lit("}")).as("value"))
  }

  /** Inverse of [[wrap]] for round-trip tests and downstream re-ingest:
    * parse (key, value) back into key + payload columns, exposing the
    * declared per-field wire tags for assertion. */
  def unwrap(df: DataFrame, payload: StructType): DataFrame = {
    val envSchema = StructType(Seq(
      StructField("schema", StructType(Seq(
        StructField("type", StringType),
        StructField("fields", ArrayType(StructType(Seq(
          StructField("field", StringType),
          StructField("type", StringType))))),
        StructField("optional", BooleanType),
        StructField("name", StringType)))),
      StructField("payload", payload)))
    val parsed = df.withColumn("_e", from_json(col("value"), envSchema))
    val payloadCols: Seq[Column] = payload.fieldNames.toSeq.map(f => col(s"_e.payload.$f").as(f))
    parsed.select(
      (col("key") +: payloadCols) :+
        col("_e.schema.fields").as("declared_fields"): _*)
  }
}
