package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: generate the FOURTH decade — an amplified ~sf10 fixture
  * (100× sf0.1: 500k documents, 200k embeddings, 10M events, 60M
  * lineitem) under /tmp, for the engine-side zero-errors gate and the
  * cross-decade scaling bench (VERDICT r14 #1). One measured decade
  * (sf0.1→sf1, exponent 0.27) is a line through two points; the second
  * decade turns the per-family exponents into a trend.
  *
  * Same discipline as [[ProfileAll.amplify]] (the ~sf1 generator):
  * deterministic, and copies must NOT collapse into the exact-dup
  * pre-collapse or correlate into artificial near-dup clusters —
  *   - documents: copy c rewrites the first token to `k<c>x<doc_id%17>`
  *     (distinct contents per copy, ≤3 shingles changed per doc); with
  *     c ∈ 1..99 every copy's first token is distinct, so no two copies
  *     of the same source can collide;
  *   - embeddings: copy c applies rotation by (c mod 64) positions and
  *     negates the vector when c ≥ 64 — the (rotation, sign) pair is
  *     distinct for every c ∈ 0..99, so unlike a pure rotation (only 64
  *     available) no two of the 100 copies of one vector are identical;
  *     norms and within-copy geometry are preserved, cross-copy pairs
  *     decorrelate as in a real 100× corpus;
  *   - events: 100× the user population at the same per-user density;
  *   - part/lineitem: 100× the routes at the same per-route trip
  *     density (keys offset per copy → referential integrity kept);
  *   - small dims (region/nation/customer/supplier/orders) copied
  *     verbatim, matching the ~sf1 fixture's convention, so per-decade
  *     plans differ only in fact volume.
  * Id offsets are multiples of 5 so the incremental split
  * (doc_id % IncomingMod) keeps its 20% incoming fraction.
  *
  * Run: sbt "Test/runMain graft.Sf10Gen [outDir]"   (default /tmp/graft_sf10)
  */
object Sf10Gen {

  private val Factor = 100
  private val Off = 10000000L // id offset per copy; % 5 == 0
  private val Version = "v1"

  private def copies(df: DataFrame)(oneCopy: Int => DataFrame): DataFrame =
    (0 until Factor).map(c => if (c == 0) df else oneCopy(c))
      .reduce(_ unionByName _)

  /** Rotate a 64-dim array column left by r positions (r ∈ 0..63). */
  private def rotate(e: Column, r: Int, dim: Int): Column =
    if (r == 0) e else concat(slice(e, r + 1, dim - r), slice(e, 1, r))

  def generate(spark: SparkSession, srcDir: String, outDir: String): Unit = {
    val done = new java.io.File(s"$outDir/_done")
    if (done.isFile &&
      java.nio.file.Files.readString(done.toPath).trim == Version) {
      println(s"[sf10] fixture already at $Version in $outDir"); return
    }
    new java.io.File(outDir).mkdirs()
    println(s"[sf10] generating amplified ${Factor}x corpus at $outDir ...")

    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    copies(docs) { c =>
      docs.select(
        (col("doc_id") + c * Off).as("doc_id"),
        regexp_replace(col("text"), lit("^\\S+"),
          concat(lit(s"k${c}x"), pmod(col("doc_id"), lit(17)))).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.repartition(64).write.mode("overwrite")
      .parquet(s"$outDir/documents.parquet")
    println("[sf10] documents done")

    val embs = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val dim = 64
    copies(embs) { c =>
      val rotated = rotate(col("embedding"), c % 64, dim)
      embs.select(
        (col("vec_id") + c * Off).as("vec_id"),
        (if (c >= 64) transform(rotated, x => -x) else rotated).as("embedding"),
        col("label"))
    }.repartition(64).write.mode("overwrite")
      .parquet(s"$outDir/embeddings.parquet")
    println("[sf10] embeddings done")

    val evs = spark.read.parquet(s"$srcDir/events.parquet")
    copies(evs) { c =>
      evs.select((col("event_id") + c * Off).as("event_id"), col("ts"),
        (col("user_id") + c * Off).as("user_id"), col("event_type"),
        col("value"), col("props"))
    }.repartition(64).write.mode("overwrite")
      .parquet(s"$outDir/events.parquet")
    println("[sf10] events done")

    val part = spark.read.parquet(s"$srcDir/part.parquet")
    copies(part)(c => part.withColumn("p_partkey", col("p_partkey") + c * Off))
      .repartition(64).write.mode("overwrite")
      .parquet(s"$outDir/part.parquet")
    val li = spark.read.parquet(s"$srcDir/lineitem.parquet")
    copies(li) { c =>
      li.withColumn("l_orderkey", col("l_orderkey") + c * Off)
        .withColumn("l_partkey", col("l_partkey") + c * Off)
        .withColumn("l_suppkey", col("l_suppkey") + c * Off)
    }.repartition(64).write.mode("overwrite")
      .parquet(s"$outDir/lineitem.parquet")
    println("[sf10] part/lineitem done")

    // small dims verbatim (single parquet files in the source fixture)
    Seq("region", "nation", "customer", "supplier", "orders").foreach { t =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$srcDir/$t.parquet"),
        java.nio.file.Paths.get(s"$outDir/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    java.nio.file.Files.writeString(done.toPath, Version)
    println(s"[sf10] fixture complete at $outDir")
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("PROF_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, "/root/testdata/sf0.1", outDir)
    spark.stop()
  }
}
