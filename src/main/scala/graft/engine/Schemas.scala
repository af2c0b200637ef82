package graft.engine

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's two input entity types and their wire decode.
  *
  * Reference: `src/main/java/classes/Route.java:4-9` /
  * `classes/Trip.java:4-9` (plain JavaBeans), deserialized from raw JSON
  * bytes by Jackson (`utils/JsonDeserializer.java:21-27`). Spark-first
  * equivalent: case classes + explicit `StructType`s + `from_json` over the
  * raw `value` column — schema is declared, never inferred, so a malformed
  * record nulls out instead of failing the stream (PERMISSIVE mode).
  *
  * Column naming: snake_case to match the analytical views in
  * [[graft.sources.Tables]]; the wire format keeps the reference's
  * camelCase field names (see [[Decode.routeWireSchema]]).
  */
object Schemas {

  /** `classes/Route.java:4-9`; `ts` added as the event-time column the wire
    * lacks (the reference windows on Kafka ingestion time — SURVEY.md §7.3
    * "Event time"). */
  case class Route(
      route_id: String,
      origin: String,
      destination: String,
      transport_type: String,
      capacity: Int,
      operator: String,
      ts: Timestamp)

  /** `classes/Trip.java:4-9`. */
  case class Trip(
      trip_id: String,
      route_id: String,
      origin: String,
      destination: String,
      transport_type: String,
      passenger_name: String,
      ts: Timestamp)
}

/** JSON wire encode — the producer side (`utils/JsonSerializer.java:16-22`:
  * plain Jackson bean JSON, camelCase field names, record key = entity id,
  * `producers/RoutesProducer.java:50`). Inverse of [[Decode]]; output is the
  * raw (key, value, ts) frame [[graft.sources.StreamAdapters]] transports. */
object Encode {

  private def encode(df: DataFrame, keyCol: String): DataFrame = {
    val wireCols = df.columns.filter(_ != "ts").toSeq
      .map(c => col(c).as(Decode.viewToWire.getOrElse(c, c)))
    df.select(col(keyCol).cast("string").as("key"),
      to_json(struct(wireCols: _*)).as("value"), col("ts"))
  }

  /** Route view frame → raw wire frame keyed by routeId. */
  def routesRaw(routes: DataFrame): DataFrame = encode(routes, "route_id")

  /** Trip view frame → raw wire frame keyed by tripId. */
  def tripsRaw(trips: DataFrame): DataFrame = encode(trips, "trip_id")
}

/** JSON wire decode (`utils/JsonDeserializer.java:21-27` → `from_json`). */
object Decode {

  /** Wire schema with the reference's exact camelCase field names
    * (`classes/Route.java:4-9`). */
  val routeWireSchema: StructType = StructType(Seq(
    StructField("routeId", StringType),
    StructField("origin", StringType),
    StructField("destination", StringType),
    StructField("transportType", StringType),
    StructField("capacity", IntegerType),
    StructField("operator", StringType)))

  /** `classes/Trip.java:4-9`. */
  val tripWireSchema: StructType = StructType(Seq(
    StructField("tripId", StringType),
    StructField("routeId", StringType),
    StructField("origin", StringType),
    StructField("destination", StringType),
    StructField("transportType", StringType),
    StructField("passengerName", StringType)))

  private[engine] val wireToView: Map[String, String] = Map(
    "routeId" -> "route_id", "tripId" -> "trip_id",
    "transportType" -> "transport_type", "passengerName" -> "passenger_name",
    "origin" -> "origin", "destination" -> "destination",
    "capacity" -> "capacity", "operator" -> "operator")

  /** View-name → wire-name (snake_case → the reference's camelCase), for
    * re-encoding view frames back to the wire (`Envelope.wrap(rename = ...)`). */
  val viewToWire: Map[String, String] = wireToView.map(_.swap)

  private def decode(df: DataFrame, schema: StructType): DataFrame = {
    val parsed = df.withColumn("_j", from_json(col("value").cast("string"), schema))
    val cols = schema.fieldNames.toSeq.map(f => col(s"_j.$f").as(wireToView(f))) ++
      (if (df.columns.contains("ts")) Seq(col("ts")) else Nil)
    parsed.select(cols: _*)
  }

  /** Decode a raw (value[, ts]) frame of Route JSON into the snake_case
    * analytical view. Works identically on batch and streaming frames. */
  def routes(raw: DataFrame): DataFrame = decode(raw, routeWireSchema)

  /** Decode a raw (value[, ts]) frame of Trip JSON. */
  def trips(raw: DataFrame): DataFrame = decode(raw, tripWireSchema)
}
