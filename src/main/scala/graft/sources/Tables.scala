package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated parquet tables (TESTDATA.md) plus the
  * transit-domain views that project the star schema onto the reference's
  * Route/Trip data model (reference: `src/main/java/classes/Route.java:4-9`,
  * `src/main/java/classes/Trip.java:4-9`).
  *
  * Mapping (kept textually identical between the Spark `Column` form and the
  * DuckDB SQL form so every query is oracle-checkable):
  *   - `part`     -> routes: route_id = p_partkey, transport_type = f(p_partkey),
  *                   capacity = p_size, operator = p_brand
  *   - `lineitem` -> trips:  trip_id = l_orderkey_l_linenumber,
  *                   route_id = l_partkey (FK), transport_type = f(l_partkey)
  *                   (trips copy their route's type, mirroring
  *                   `producers/TripsProducerCenario.java:59-65`),
  *                   passenger_name = P_<l_suppkey>, ts = l_shipdate
  *
  * transport_type is a deterministic function of the route key, mirroring the
  * reference's 5-value enum (`producers/RoutesProducer.java:31`).
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Widen a narrow frame to the session's parallelism before a CPU-heavy
    * per-row pipeline (hashing/shingling/vector math).
    *
    * Why: a parquet file with a single row group scans as ONE partition
    * (row groups are the split unit), so everything until the first shuffle
    * runs single-threaded — at sf0.1 this made MinHash 30x slower than its
    * plan deserved. Guarded: when the scan is already at least as wide as
    * the cluster (the 100 TB case — thousands of row groups), this is a
    * no-op and adds no shuffle. */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // toRdd is the already-planned internal-row RDD (lazy, cached on the
    // QueryExecution) — unlike df.rdd it adds no deserializer re-analysis,
    // and reading getNumPartitions runs no job.
    if (df.queryExecution.toRdd.getNumPartitions < p) df.repartition(p) else df
  }

  def part(spark: SparkSession, sfDir: String): DataFrame      = table(spark, sfDir, "part")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "orders")
  /** The events fact table with `ts` normalized to epoch-MICROSECOND
    * int64 whatever the parquet physically stores — the driver has shipped
    * this column as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across
    * testdata generations, and every Events operator does exact integer-µs
    * arithmetic against the DuckDB oracle's `epoch_us(ts)` (µs is the
    * finest resolution both engines agree on exactly). Normalization
    * happens HERE, once, so a future physical-type change breaks one
    * branch of [[normalizeEventTs]] (tripwired by `TablesSpec`), not every
    * downstream query. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // Legacy int64-NANOS encodings are unreadable without this flag; it is
    // a no-op for µs-typed files and no other table carries a NANOS field.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(spark, sfDir, "events"))
  }

  /** Rewrite a raw events frame's `ts` to epoch-µs int64. Branches on the
    * type the reader actually produced: int64 (legacy NANOS via
    * `nanosAsLong`) → integer-divide to µs; timestamp / timestamp_ntz →
    * exact µs since the epoch. The NTZ branch measures from the NTZ epoch
    * literal rather than casting through the session zone, so the result
    * is timezone-independent — identical to DuckDB's `epoch_us` on the
    * same naive value. */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val us: Column = raw.schema("ts").dataType match {
      case LongType         => expr("ts div 1000")
      case TimestampNTZType =>
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
      case TimestampType    => unix_micros(col("ts"))
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported type $other; expected int64-nanos, timestamp, or timestamp_ntz")
    }
    raw.withColumn("ts", us)
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  private val TransportTypes = Seq("Bus", "Taxi", "Train", "Metro", "Scooter")

  /** Deterministic transport type from a numeric route key. `pmod` keeps the
    * index in [0,5) for any sign; the DuckDB CASE in [[transportTypeSql]]
    * matches only for non-negative keys (p_partkey/l_partkey are 1-based —
    * positivity assumed, per ADVICE r1). */
  def transportTypeOf(key: Column): Column =
    element_at(array(TransportTypes.map(lit): _*), pmod(key, lit(5)).cast("int") + 1)

  /** Route dimension view (one row per route; keys unique, so "latest per
    * key" == the row itself — see SURVEY.md §7.3 latest-value-per-key). */
  def routes(spark: SparkSession, sfDir: String): DataFrame =
    part(spark, sfDir).select(
      col("p_partkey").cast("string").as("route_id"),
      transportTypeOf(col("p_partkey")).as("transport_type"),
      col("p_size").as("capacity"),
      col("p_brand").as("operator"))

  /** Trip fact view: one row = one passenger boarding
    * (`streamFunctions/AveragePassengersPerTransportType.java:36-39`). */
  def trips(spark: SparkSession, sfDir: String): DataFrame =
    lineitem(spark, sfDir).select(
      concat(col("l_orderkey").cast("string"), lit("_"),
             col("l_linenumber").cast("string")).as("trip_id"),
      col("l_partkey").cast("string").as("route_id"),
      transportTypeOf(col("l_partkey")).as("transport_type"),
      concat(lit("P_"), col("l_suppkey").cast("string")).as("passenger_name"),
      col("l_shipdate").as("ts"))

  // ---- DuckDB-SQL equivalents of the views, for the oracle -----------------

  def transportTypeSql(key: String): String =
    s"CASE ($key % 5) WHEN 0 THEN 'Bus' WHEN 1 THEN 'Taxi' WHEN 2 THEN 'Train' " +
      s"WHEN 3 THEN 'Metro' ELSE 'Scooter' END"

  val routesSql: String =
    "SELECT CAST(p_partkey AS VARCHAR) AS route_id, " +
      transportTypeSql("p_partkey") + " AS transport_type, " +
      "p_size AS capacity, p_brand AS operator FROM part"

  val tripsSql: String =
    "SELECT CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR) AS trip_id, " +
      "CAST(l_partkey AS VARCHAR) AS route_id, " +
      transportTypeSql("l_partkey") + " AS transport_type, " +
      "'P_' || CAST(l_suppkey AS VARCHAR) AS passenger_name, " +
      "l_shipdate AS ts FROM lineitem"

  /** Common oracle prologue: the two transit views as CTEs. */
  val transitWith: String = s"WITH routes AS ($routesSql), trips AS ($tripsSql)"
}
