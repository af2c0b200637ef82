package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: scale sweep of the top bench queries over sf0.01 → sf0.1 →
  * an amplified ~sf1 (10× sf0.1, generated on first use under /tmp) —
  * evidence that the 100 TB growth claims hold beyond the dedup-only
  * sweep (VERDICT r6 #3). Prints per-query wall times and the log10
  * growth exponent of the final decade; an exponent near 1 is linear,
  * 2 is quadratic.
  *
  * Amplification is NOT naive copying — copies must not collapse into
  * the exact-dup pre-collapse or the profile measures nothing:
  *   - documents: copy k rewrites the first token to `k<k>x<doc_id%17>`
  *     (distinct contents, ≤3 shingles changed per doc, per-copy token
  *     spread over 17 ids so no new universal shingle);
  *   - embeddings: copy k rotates the vector by k positions (norms and
  *     within-copy geometry preserved; cross-copy pairs decorrelate, as
  *     in a real 10× corpus).
  * doc_id/vec_id offsets are multiples of 5 so the incremental split
  * (doc_id % IncomingMod) keeps its 20% incoming fraction.
  *
  * Run: sbt "Test/runMain graft.ProfileAll [queries...]"
  */
object ProfileAll {

  private val Factor = 10
  private val Off = 10000000L // id offset per copy; % 5 == 0

  val TopQueries: Seq[String] = Seq(
    "dedup_simhash", "dedup_embedding", "corpus_near_decontaminate",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_containment",
    "dedup_minhash_incremental", "sim_ann_recall", "sim_ann_lsh_topk",
    "mm_block_dedup",
    // round-9 session additions worth watching across decades
    "text_novelty", "dedup_threshold_histogram", "text_tfidf_keywords",
    // round-10: the suffix-array-grain span family + arrival gates
    "dedup_span_exact", "dedup_span_probe", "mm_block_probe",
    "events_survival",
    // round-10 second wave: the KL drift pair (token-grain count + model)
    "corpus_kl_divergence", "corpus_kl_probe",
    // round-14: the binary-quantization scan tiers (8 bytes/vector first
    // pass, bounded rerank) and the IVF-composed variant
    "sim_hamming_topk", "sim_ivf_bq_topk")

  private val AmplifyVersion = "v3" // v2: + events; v3: + part/lineitem (full-suite sf1 bench)

  private def amplify(spark: SparkSession, srcDir: String, outDir: String): Unit = {
    val done = new java.io.File(s"$outDir/_done")
    if (done.isFile &&
      java.nio.file.Files.readString(done.toPath).trim == AmplifyVersion) return
    println(s"[prof] generating amplified ${Factor}x corpus at $outDir ...")
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val docCopies = (0 until Factor).map { k =>
      if (k == 0) docs
      else docs.select(
        (col("doc_id") + k * Off).as("doc_id"),
        regexp_replace(col("text"), lit("^\\S+"),
          concat(lit(s"k${k}x"), pmod(col("doc_id"), lit(17)))).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    docCopies.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite")
      .parquet(s"$outDir/documents.parquet")

    val embs = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val dim = 64
    val embCopies = (0 until Factor).map { k =>
      if (k == 0) embs
      else embs.select(
        (col("vec_id") + k * Off).as("vec_id"),
        concat(slice(col("embedding"), k + 1, dim - k),
          slice(col("embedding"), 1, k)).as("embedding"),
        col("label"))
    }
    embCopies.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite")
      .parquet(s"$outDir/embeddings.parquet")

    // events: 10x the user population at the same per-user density
    // (event/user ids offset per copy; timestamps and props unchanged)
    val evs = spark.read.parquet(s"$srcDir/events.parquet")
    val evCopies = (0 until Factor).map { k =>
      if (k == 0) evs
      else evs.select((col("event_id") + k * Off).as("event_id"), col("ts"),
        (col("user_id") + k * Off).as("user_id"), col("event_type"),
        col("value"), col("props"))
    }
    evCopies.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite")
      .parquet(s"$outDir/events.parquet")

    // transit dimensions/facts: 10x the routes at the same per-route trip
    // density (all keys offset per copy, so each copy keeps referential
    // integrity; Off % 5 == 0 preserves the key->transport-type mapping)
    val part = spark.read.parquet(s"$srcDir/part.parquet")
    (0 until Factor).map { k =>
      if (k == 0) part
      else part.withColumn("p_partkey", col("p_partkey") + k * Off)
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite")
      .parquet(s"$outDir/part.parquet")
    val li = spark.read.parquet(s"$srcDir/lineitem.parquet")
    (0 until Factor).map { k =>
      if (k == 0) li
      else li.withColumn("l_orderkey", col("l_orderkey") + k * Off)
        .withColumn("l_partkey", col("l_partkey") + k * Off)
        .withColumn("l_suppkey", col("l_suppkey") + k * Off)
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite")
      .parquet(s"$outDir/lineitem.parquet")
    java.nio.file.Files.writeString(done.toPath, AmplifyVersion)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("PROF_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("PROF_PARTS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.maxFields", "200")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // tolerate legacy TIMESTAMP(NANOS) events testdata (no-op for the
      // current µs encoding; Tables.events normalizes either to epoch-µs)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def release(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))

    val sf1Dir = sys.env.getOrElse("PROF_SF1_DIR", "/tmp/graft_sf1")
    amplify(spark, "/root/testdata/sf0.1", sf1Dir)

    val names = if (args.nonEmpty) args.toSeq else TopQueries
    val scales = Seq(
      "sf0.01" -> "/root/testdata/sf0.01",
      "sf0.1"  -> "/root/testdata/sf0.1",
      "sf1~"   -> sf1Dir)

    // warm the JVM/codegen once on the smallest scale
    names.foreach { n => noop(SparkEntry.queries(n)(spark, scales.head._2)); release() }

    val results = names.map { n =>
      val times = scales.map { case (label, dir) =>
        val t0 = System.nanoTime()
        noop(SparkEntry.queries(n)(spark, dir))
        release()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[prof] $n%-28s $label%-7s ${s}%7.2f s")
        s
      }
      n -> times
    }
    println(f"\n[prof] ${"query"}%-28s ${"sf0.01"}%8s ${"sf0.1"}%8s ${"sf1~"}%8s  x(0.1->1)  exp")
    results.foreach { case (n, ts) =>
      val ratio = ts(2) / ts(1)
      val exp = math.log10(ratio)
      println(f"[prof] $n%-28s ${ts(0)}%8.2f ${ts(1)}%8.2f ${ts(2)}%8.2f  ${ratio}%8.1fx ${exp}%5.2f")
    }
    spark.stop()
  }
}
