package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Retry-determinism harness: prove that operator results are
  * BIT-IDENTICAL when tasks fail and are recomputed.
  *
  * At 1000 executors, task retries and speculative re-execution are
  * routine, and Spark's recovery contract assumes recomputed partitions
  * reproduce their original content. An operator that violates that —
  * `rand()`-based sampling, time-dependent expressions, ordering pulled
  * out of thin air — passes every single-run oracle while silently
  * corrupting results at scale (a retried map task feeds DIFFERENT rows
  * to the shuffle than its first attempt did). The suite pins
  * bit-identity across shuffle parallelism (CrossOpInvariantSpec); this
  * is the missing sibling: bit-identity across TASK RE-EXECUTION.
  *
  * Mechanism: the session runs under `local[8, 3]` (maxFailures 3), and
  * the input table is wrapped so every task reading an even-numbered
  * partition THROWS on its first attempt (TaskContext.attemptNumber == 0)
  * and succeeds on retry — every job over the wrapped frame really
  * executes half its scan tasks twice. An accumulator counts injected
  * failures so a configuration where the chaos never fires (e.g. a
  * future maxFailures regression) fails the harness instead of passing
  * it vacuously. The battery leans on the operators whose determinism is
  * DESIGNED rather than accidental: the salted-hash sampling family
  * (sample/mix/shuffle/kfold — deterministic BECAUSE they hash, never
  * rand()), the iterative MinHash closure (staged rounds recomputed),
  * and window/rank pipelines (ordering with pinned tiebreaks).
  *
  * Run: sbt "Test/runMain graft.ChaosCheck [sfDir]"
  * Emits one JSON line (the bench_out convention) — published as
  * CHAOS.json by tools/chaos_check.sh.
  */
object ChaosCheck {

  /** Injected-failure tally. A Spark accumulator would NOT work here:
    * updates from failed tasks are discarded (countFailedValues=false),
    * and the whole point is to count inside tasks that fail. The harness
    * always runs `local[...]` (tasks share the driver JVM), so a static
    * atomic is exact. */
  val injected = new AtomicLong(0)

  /** Wrap a frame identically on both sides of the A/B — repartition(8)
    * plus an identity mapPartitions — with failure injection only on the
    * chaos side. Both arms share the SAME wrap so the only delta between
    * them is the injected retries: a mismatch can't be blamed on
    * partitioning-sensitivity, because both arms see 8 partitions.
    *
    * Why widen to 8: the sf0.01 parquet reads as 1-2 tasks, which would
    * leave most jobs with a single injected failure — after the widen
    * every job re-executes 4 of its 8 scan tasks, and the retried tasks
    * sit AFTER a shuffle (post-shuffle recompute is exercised too, not
    * just source re-reads). */
  private def wrap(df: DataFrame, inject: Boolean): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
    val rdd = df.repartition(8).rdd.mapPartitions { it =>
      val tc = TaskContext.get()
      if (inject && tc != null && tc.attemptNumber() == 0 &&
          tc.partitionId() % 2 == 0) {
        ChaosCheck.injected.incrementAndGet()
        throw new RuntimeException(
          s"chaos: injected first-attempt failure (partition ${tc.partitionId()})")
      }
      it
    }
    spark.createDataFrame(rdd, schema)
  }

  private def snapshot(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8, 3]") // 3 = task maxFailures: attempt 0 dies, retry lands
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.maxFields", "200")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR") // injected failures spam WARN

    import graft.operators._
    import graft.sources.Tables
    // calm arm: same repartition(8)+identity wrap, no injection — the A/B
    // isolates the retries as the only variable (round-15 advice)
    val docs = wrap(Tables.documents(spark, sfDir), inject = false)
    val events = wrap(Tables.events(spark, sfDir), inject = false)
    val cdocs = wrap(Tables.documents(spark, sfDir), inject = true)
    val cevents = wrap(Tables.events(spark, sfDir), inject = true)

    // name -> (clean result, chaos result). Each pair runs the SAME
    // operator body; only the input wrap differs.
    val battery: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("dedup_exact", () => Dedup.exact(docs), () => Dedup.exact(cdocs)),
      ("dedup_minhash_lsh", () => Dedup.minhashLsh(docs),
        () => Dedup.minhashLsh(cdocs)),
      ("text_token_stats", () => TextAnalysis.tokenStats(docs),
        () => TextAnalysis.tokenStats(cdocs)),
      ("text_quality", () => TextAnalysis.quality(docs),
        () => TextAnalysis.quality(cdocs)),
      ("text_tfidf_keywords", () => TextAnalysis.tfidfKeywords(docs),
        () => TextAnalysis.tfidfKeywords(cdocs)),
      ("sample_stratified", () => Corpus.sampleStratified(docs),
        () => Corpus.sampleStratified(cdocs)),
      ("sample_weighted", () => Corpus.sampleWeighted(docs),
        () => Corpus.sampleWeighted(cdocs)),
      ("sample_holdout_split", () => Corpus.holdoutSplit(docs),
        () => Corpus.holdoutSplit(cdocs)),
      ("corpus_mix_apply", () => Corpus.mixApply(docs),
        () => Corpus.mixApply(cdocs)),
      ("corpus_shuffle", () => Corpus.epochShuffle(docs),
        () => Corpus.epochShuffle(cdocs)),
      ("corpus_kfold_plan", () => Corpus.kfoldPlan(docs),
        () => Corpus.kfoldPlan(cdocs)),
      ("events_sessionize", () => Events.sessionize(events),
        () => Events.sessionize(cevents)),
      ("events_growth_accounting", () => Events.growthAccounting(events),
        () => Events.growthAccounting(cevents)))

    var failures = List.empty[String]
    val results = battery.map { case (name, clean, chaotic) =>
      val before = injected.get()
      val a = snapshot(clean())
      val b = snapshot(chaotic())
      val fired = injected.get() - before
      val ok = a == b && a.nonEmpty
      if (!ok) failures ::= name
      System.err.println(
        f"[chaos] $name%-28s rows ${a.size}%6d  injected $fired%3d  " +
          (if (ok) "IDENTICAL" else "MISMATCH"))
      (name, a.size, fired, ok)
    }
    val totalInjected = injected.get()
    require(totalInjected > 0,
      "chaos harness vacuous: no failure was ever injected")

    val checks = results.map { case (n, rows, fired, ok) =>
      s""""$n":{"rows":$rows,"injected":$fired,"identical":$ok}"""
    }.mkString(",")
    // the single-line verdict (bench_out convention; final stdout line)
    println(s"""{"metric":"graft_chaos","checks":${results.size},""" +
      s""""mismatches":${failures.size},"injected_failures":$totalInjected,""" +
      s""""task_max_failures":3,"sf":"$sfDir","results":{$checks}}""")
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
