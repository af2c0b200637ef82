package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Replay-mode running-extreme folds — the reserved SURVEY §7.4 item:
  * reproduce the reference's NON-RETRACTABLE constant-key aggregates
  * bit-for-bit, for diffing this engine against a LIVE reference
  * deployment rather than the oracle.
  *
  * The registered queries implement the *intended* semantics (a true
  * `max_by`/`min_by` re-evaluated per trigger); the reference's folds
  * (Q3 `NamePassengerMostTrips.java:38-51`, Q10
  * `TransportTypeMaxPassengers.java:33-52`, Q11
  * `TransportTypeMaxPassengersWindow.java:42-53`, Q6 min
  * `RouteWithLeastOccupancyPerTransportType.java:73-85`) differ in two
  * observable ways:
  *
  *   - TIES keep the INCUMBENT (`newCount > currentCount` — strict), so
  *     the first key to reach a count wins until strictly beaten; a
  *     `max_by` may return the other tie member.
  *   - the fold never RETRACTS: when the current winner's metric later
  *     FALLS (possible for occupancy, which moves both ways), the stale
  *     winner is kept until some key strictly beats the stored value.
  *
  * Execution shape: the reference re-keys every such fold to ONE
  * constant key, which in Kafka Streams means ONE topic partition
  * folding updates sequentially — so the faithful replay is exactly
  * that: the changelog sorted into one partition and folded in order.
  * This is a COMPAT face, not a scale path (the constant-key fold is
  * single-threaded in the reference too); the changelog it folds is the
  * per-key update stream, bounded by the upstream aggregate's update
  * count. */
object ReplayFold {

  /** One changelog update: the fold's input record in emission order. */
  case class Update(seq: Long, key: String, metric: Double)

  /** Fold state / output: the stored winner ('seen' false = empty seed,
    * mirroring the reference's `""` initializer + non-empty filter). */
  case class Winner(key: String, metric: Double, seen: Boolean)

  /** The reference aggregate: keep the incumbent unless STRICTLY beaten
    * (`newCount > currentCount ? newValue : currentMax`). Non-retractable
    * by construction — `reduce` never looks back at the key's current
    * value, only at the stored winner.
    *
    * `seedMetric` is the value the reference's initializer PARSES to, and
    * it competes like a real incumbent (ADVICE r11): the max folds seed
    * with `""` → count 0, so a first update with metric ≤ 0 is REJECTED
    * there (nothing ever emitted) — pass 0.0 to match; the min folds seed
    * with `Double.MAX_VALUE` — pass -Double.MaxValue on the negated
    * metric. The default (-∞) is the generic running-argmax face: the
    * seed still competes STRICTLY, so any FINITE first update wins, but
    * a first update of -∞ is rejected and NaN updates are always dropped
    * (`NaN > x` is false) — the fold assumes finite metrics.
    *
    * CONTRACT: order-dependent — `merge` only ever meets the zero buffer
    * when the input is one sorted partition, which [[runningArgmax]]
    * enforces; never use this aggregator on multi-partition input. */
  class NonRetractableArgmax(seedMetric: Double = Double.NegativeInfinity)
      extends Aggregator[Update, Winner, Winner] {
    def zero: Winner = Winner("", seedMetric, seen = false)
    def reduce(b: Winner, u: Update): Winner =
      if (u.metric > b.metric) Winner(u.key, u.metric, seen = true)
      else b
    def merge(a: Winner, b: Winner): Winner =
      if (!a.seen) b else if (!b.seen) a
      else throw new IllegalStateException(
        "NonRetractableArgmax replay requires a single sorted partition")
    def finish(r: Winner): Winner = r
    def bufferEncoder: Encoder[Winner] = Encoders.product[Winner]
    def outputEncoder: Encoder[Winner] = Encoders.product[Winner]
  }

  /** Replay a (seq, key, metric) changelog through the reference fold.
    * Output: one row (key, metric) — the reference topic's final value —
    * or zero rows when nothing beat the seed (the empty-seed filter,
    * `NamePassengerMostTrips.java:53`). For the reference's running-MIN
    * folds pass the negated metric with `seedMetric = -Double.MaxValue`;
    * for its count-max folds pass `seedMetric = 0.0` (the `""` parse). */
  def runningArgmax(changelog: DataFrame,
                    seedMetric: Double = Double.NegativeInfinity): DataFrame = {
    val spark = changelog.sparkSession
    import spark.implicits._
    changelog.select(col("seq").cast("long").as("seq"),
        col("key").cast("string").as("key"),
        col("metric").cast("double").as("metric"))
      .as[Update]
      .repartition(1).sortWithinPartitions("seq")
      .select(new NonRetractableArgmax(seedMetric).toColumn)
      .where(col("seen"))
      .select(col("key"), col("metric"))
  }

  /** The reference's OTHER terminal fold — `(k, new, cur) -> newValue`
    * (Q12 `LeastOccupiedTransportTypeWindow.java:92`, Q13 per-operator
    * `MostOccupiedOperator.java:109`): the stored value is simply the
    * newest update. Order-insensitive to express: `max_by(·, seq)`. */
  def latest(changelog: DataFrame): DataFrame =
    changelog.agg(max_by(struct(col("key"), col("metric")), col("seq")).as("w"))
      .select(col("w.key").as("key"), col("w.metric").as("metric"))
      .where(col("key").isNotNull)

  /** Q3 in replay mode — the reference's exact emission-final winner.
    * The count changelog is reconstructed deterministically from the
    * trips alone (each trip increments its passenger's count by one, in
    * event order), which is exactly the update stream the reference's
    * `count()` KTable emits under per-record caching-off semantics.
    * Ties resolve to the FIRST passenger to reach the count — where this
    * diverges from the registered [[TransitQueries.q3]], the reference
    * is what it matches (`ReplayFoldSpec`). */
  def q3Replay(trips: DataFrame): DataFrame = {
    val w = Window.partitionBy("passenger_name").orderBy("ts", "trip_id")
    val changelog = trips.filter(col("passenger_name").isNotNull)
      .select(col("passenger_name").as("key"),
        count(lit(1)).over(w).cast("double").as("metric"),
        col("ts"), col("trip_id"))
      .withColumn("seq", row_number().over(
        Window.partitionBy().orderBy("ts", "trip_id")).cast("long"))
    runningArgmax(changelog.select("seq", "key", "metric"), seedMetric = 0.0)
      .select(col("key").as("passenger_name"))
  }

  /** Q10 in replay mode — the same count-max fold as Q3 keyed by
    * transport type (`TransportTypeMaxPassengers.java:33-52`), with the
    * reference's `""`-parse seed (0.0): ties keep the first type to
    * reach the count, where the registered [[TransitQueries.q10]]'s
    * deterministic (count desc, type asc) order may pick the other tie
    * member. */
  def q10Replay(trips: DataFrame): DataFrame = {
    val w = Window.partitionBy("transport_type").orderBy("ts", "trip_id")
    val changelog = trips.filter(col("transport_type").isNotNull)
      .select(col("transport_type").as("key"),
        count(lit(1)).over(w).cast("double").as("metric"),
        col("ts"), col("trip_id"))
      .withColumn("seq", row_number().over(
        Window.partitionBy().orderBy("ts", "trip_id")).cast("long"))
    runningArgmax(changelog.select("seq", "key", "metric"), seedMetric = 0.0)
      .select(col("key").as("transport_type"),
        col("metric").cast("long").as("max_passengers"))
  }

  /** Q11 in replay mode: the per-window non-retractable argmax
    * (`TransportTypeMaxPassengersWindow.java:42-53`) — same fold, one
    * winner per 1h window, ties to the first type that reached the
    * count. Windows are independent constant keys in the reference, so
    * each window replays its own changelog; the global sort is per
    * window (bounded), not corpus-global. */
  def q11Replay(trips: DataFrame): DataFrame = {
    val wCnt = Window.partitionBy("window_start", "transport_type")
      .orderBy("ts", "trip_id")
    val wSeq = Window.partitionBy("window_start").orderBy("ts", "trip_id")
    val changelog = trips
      .filter(col("transport_type").isNotNull)
      .withColumn("window_start", date_trunc("hour", col("ts")))
      .select(col("window_start"), col("transport_type").as("key"),
        count(lit(1)).over(wCnt).cast("double").as("metric"),
        row_number().over(wSeq).cast("long").as("seq"))
    // closed form of the per-window fold, valid because counts are
    // MONOTONE within a window: the stored metric only grows, so the
    // final winner is the FIRST update to attain the window's maximum
    // count M (a later tie at M is not strictly greater and is
    // rejected, `TransportTypeMaxPassengersWindow.java:49`). For
    // non-monotone metrics use [[runningArgmax]] — the closed form does
    // not hold there (ReplayFoldSpec demonstrates with occupancy).
    val wmax = max(col("metric")).over(Window.partitionBy("window_start"))
    changelog.withColumn("wmax", wmax)
      .where(col("metric") === col("wmax"))
      .groupBy("window_start")
      .agg(min_by(col("key"), col("seq")).as("transport_type"),
        max(col("metric")).cast("long").as("max_passengers"))
      .select("window_start", "transport_type", "max_passengers")
  }
}
