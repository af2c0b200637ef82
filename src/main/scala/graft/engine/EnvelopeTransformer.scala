package graft.engine

import org.apache.spark.sql.DataFrame

/** The reference's standalone ELT side-channel
  * (`utils/KafkaSchemaTransformer.java:41-77`): a consume→wrap→produce loop
  * that attaches the static Connect schema to raw route JSON so the JDBC
  * sink can type it (`Routes_topic` → `Routes_topic_transformed`).
  *
  * Spark-first: one declarative pass — decode, re-encode with the envelope
  * — that runs identically as a batch job or a streaming query
  * (`raw.isStreaming` decides; no code difference). The reference's 100 ms
  * poll loop becomes the micro-batch trigger. */
object EnvelopeTransformer {

  /** Raw route-JSON `value` column → (key = routeId, value = Connect
    * envelope). Wire parity with `KafkaSchemaTransformer.java:45-66`
    * (ADVICE r2): camelCase field names, schema name `Route`, and the key
    * field kept in the payload (the reference passes `record.value()`
    * verbatim). */
  def routes(raw: DataFrame): DataFrame =
    Envelope.wrap(Decode.routes(raw).drop("ts"), "route_id", Some("Route"),
      keepKeyInPayload = true, rename = Decode.viewToWire)

  /** Same pass for trips (no counterpart in the reference — its transformer
    * handles `Routes_topic` only; schema name `Trip` by symmetry). */
  def trips(raw: DataFrame): DataFrame =
    Envelope.wrap(Decode.trips(raw).drop("ts"), "trip_id", Some("Trip"),
      keepKeyInPayload = true, rename = Decode.viewToWire)
}
