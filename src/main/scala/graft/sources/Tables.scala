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

  /** Expected raw (pre-normalization) schema per testdata table — the
    * events-`ts` tripwire generalized to every table (VERDICT r9 #2): a
    * driver regen that renames, retypes, or drops a column now fails in
    * ONE named place (here, and one named `TablesSpec` test per table)
    * instead of surfacing as a family of opaque query failures. Types are
    * Spark `simpleString` names; a multi-element set encodes SANCTIONED
    * variance — timestamp columns have shipped as both tz-adjusted and
    * NTZ across generations, and `events.ts` additionally as int64-nanos
    * (all three normalized by [[normalizeEventTs]]). Extra columns are
    * allowed (an additive regen is backwards-compatible); missing columns
    * and type drift are not. */
  private val Timestampish = Set("timestamp", "timestamp_ntz")
  private[graft] val ExpectedColumns: Map[String, Seq[(String, Set[String])]] = {
    def exact(cols: (String, String)*) = cols.map { case (n, t) => n -> Set(t) }
    Map(
      "region"   -> exact("r_regionkey" -> "int", "r_name" -> "string"),
      "nation"   -> exact("n_nationkey" -> "int", "n_name" -> "string",
                          "n_regionkey" -> "int"),
      "customer" -> exact("c_custkey" -> "bigint", "c_name" -> "string",
                          "c_nationkey" -> "int", "c_acctbal" -> "double",
                          "c_mktsegment" -> "string"),
      "supplier" -> exact("s_suppkey" -> "bigint", "s_name" -> "string",
                          "s_nationkey" -> "int", "s_acctbal" -> "double"),
      "part"     -> exact("p_partkey" -> "bigint", "p_name" -> "string",
                          "p_brand" -> "string", "p_type" -> "string",
                          "p_size" -> "int", "p_retailprice" -> "double"),
      "orders"   -> (exact("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
                           "o_orderstatus" -> "string", "o_totalprice" -> "double")
                     ++ Seq("o_orderdate" -> Timestampish)
                     ++ exact("o_orderpriority" -> "string")),
      "lineitem" -> (exact("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
                           "l_suppkey" -> "bigint", "l_linenumber" -> "int",
                           "l_quantity" -> "double", "l_extendedprice" -> "double",
                           "l_discount" -> "double", "l_tax" -> "double",
                           "l_returnflag" -> "string", "l_linestatus" -> "string")
                     ++ Seq("l_shipdate" -> Timestampish)),
      "events"   -> (exact("event_id" -> "bigint")
                     ++ Seq("ts" -> (Timestampish + "bigint"))
                     ++ exact("user_id" -> "bigint", "event_type" -> "string",
                              "value" -> "double", "props" -> "string")),
      "documents" -> exact("doc_id" -> "bigint", "text" -> "string",
                           "lang" -> "string", "source" -> "string",
                           "n_chars" -> "bigint"),
      "embeddings" -> exact("vec_id" -> "bigint", "embedding" -> "array<float>",
                            "label" -> "int"),
    )
  }

  /** Validate a raw schema against [[ExpectedColumns]]; unknown table
    * names pass (ad-hoc frames carry no contract). Throws
    * [[IllegalArgumentException]] naming the table and every drifted
    * column — the [[normalizeEventTs]] fail-loudly discipline. */
  private[graft] def validateSchema(
      name: String, schema: org.apache.spark.sql.types.StructType): Unit =
    ExpectedColumns.get(name).foreach { expected =>
      val actual = schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
      val drift = expected.flatMap { case (col, ok) =>
        actual.get(col) match {
          case None    => Some(s"$col: MISSING (expected ${ok.mkString("|")})")
          case Some(t) if !ok(t) =>
            Some(s"$col: has $t, expected ${ok.mkString("|")}")
          case _ => None
        }
      }
      if (drift.nonEmpty) throw new IllegalArgumentException(
        s"testdata table '$name' drifted from its schema contract — " +
          s"${drift.mkString("; ")}. If the driver regenerated testdata with " +
          "a new encoding, extend Tables.ExpectedColumns (and the reader " +
          "normalization) in ONE place rather than patching queries.")
    }

  /** Once-per-(dir, table, mtime) memo so the contract costs one
    * footer-schema comparison per session, not one per query — keyed on
    * the parquet path's modification time so a testdata regeneration
    * into the SAME directory mid-session re-validates instead of riding
    * a stale pass (ADVICE r10: a process-lifetime memo bypassed the very
    * tripwire it guards). */
  private val schemaChecked =
    new scala.collection.concurrent.TrieMap[(String, String, Long), Unit]

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val df = spark.read.parquet(path)
    schemaChecked.getOrElseUpdate(
      (sfDir, name, new java.io.File(path).lastModified),
      validateSchema(name, df.schema))
    df
  }

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
    // NOT spread, measured r17: the sf0.1 lineitem scan is one row group,
    // so the trips aggregates run single-task — but adding spread() here
    // REGRESSED every trips consumer ~1 s (keyless repartition(n) pays a
    // full local sort of its input for retry determinism — guide §2.5 —
    // and the sort + exchange cost more than the 600k-row single-task
    // aggregations they parallelize; latest_per_key went 1.52 → 2.02 s).
    // At real scale the scan is already wide and the question is moot.
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
