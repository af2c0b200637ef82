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
    * envelope). */
  def routes(raw: DataFrame): DataFrame =
    Envelope.wrap(Decode.routes(raw).drop("ts"), "route_id", "routes")

  /** Same pass for trips. */
  def trips(raw: DataFrame): DataFrame =
    Envelope.wrap(Decode.trips(raw).drop("ts"), "trip_id", "trips")
}
