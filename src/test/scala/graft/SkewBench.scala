package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured AQE skew-join engagement (VERDICT r14 #7): the skew-safety
  * story so far is asserted (`events_skew_profile`, `SkewStressSpec`) but
  * no record shows Spark's runtime skew-join split actually FIRING on
  * this engine's plans. This harness:
  *
  *   1. builds a hot-key-amplified events fixture (30% of all events
  *      remapped to ONE user) at the largest available decade,
  *   2. runs the join-bearing sessionize/attribution family
  *      (retention: user_id join; sessionStats/sessionSequences:
  *      event_id join back through the session assignment) with AQE
  *      skew-join ON vs OFF,
  *   3. records wall-times and the `skew=true` / AQEShuffleRead markers
  *      from the executed adaptive plans.
  *
  * Harness knobs (documented, not production defaults): the skewed-
  * partition threshold drops to 8 MB (default 256 MB — the hot key at
  * this fixture scale is ~100 MB, real 100 TB hot keys are far past
  * either bar) and auto-broadcast is disabled so the joins stay
  * sort-merge — the skew-join rule only rewrites shuffle joins, and the
  * point is to measure the rewrite, not to dodge it with a broadcast.
  *
  * Run: sbt "Test/runMain graft.SkewBench [eventsDir]"
  * Emits one JSON line; tools/skew_bench.sh publishes SKEWBENCH.json.
  */
object SkewBench {

  private val HotUser = 7L
  private val Version = "v1"

  /** 30% of events remapped to one user, written once (deterministic —
    * pmod of event_id, no rng). */
  private def hotFixture(spark: SparkSession, srcDir: String,
                         outDir: String): String = {
    val done = new java.io.File(s"$outDir/_done")
    if (!(done.isFile &&
        java.nio.file.Files.readString(done.toPath).trim == Version)) {
      new java.io.File(outDir).mkdirs()
      graft.sources.Tables.events(spark, srcDir)
        .withColumn("user_id",
          when(pmod(col("event_id"), lit(10)) < 3, lit(HotUser))
            .otherwise(col("user_id")))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/events.parquet")
      java.nio.file.Files.writeString(done.toPath, Version)
    }
    outDir
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse {
      if (new java.io.File("/tmp/graft_sf10/_done").isFile) "/tmp/graft_sf10"
      else "/root/testdata/sf0.1"
    }
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.maxFields", "200")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fixDir = hotFixture(spark, srcDir, "/tmp/graft_skew")
    // the fixture was written from Tables.events (already ts-normalized)
    val events = spark.read.parquet(s"$fixDir/events.parquet")

    // the joins must stay sort-merge and the hot partition must clear the
    // skew bar at THIS fixture's scale (see scaladoc)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")

    import graft.operators.Events
    val ops: Seq[(String, () => DataFrame)] = Seq(
      "events_retention" -> (() => Events.retention(events)),
      "events_session_stats" -> (() => Events.sessionStats(events)),
      "events_session_sequences" -> (() => Events.sessionSequences(events)))

    def skewMarkers(df: DataFrame): Int = {
      val plan = df.queryExecution.executedPlan.toString
      "skew=true".r.findAllIn(plan).length
    }

    def measure(skewOn: Boolean): Seq[(String, Double, Int)] = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
      ops.map { case (name, op) =>
        // warm pass (parquet footer cache, codegen), then two timed, min
        op().write.format("noop").mode("overwrite").save()
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val df = op()
          df.write.format("noop").mode("overwrite").save()
          ((System.nanoTime() - t0) / 1e9, skewMarkers(df))
        }
        val best = times.minBy(_._1)
        System.err.println(f"[skew] $name%-26s skewOn=$skewOn " +
          f"${best._1}%7.2f s  skew_markers=${best._2}")
        (name, best._1, best._2)
      }
    }

    val off = measure(skewOn = false)
    val on = measure(skewOn = true)
    val loadAvg = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

    val rows = on.zip(off).map { case ((n, tOn, mOn), (_, tOff, mOff)) =>
      s""""$n":{"skew_on_s":${"%.2f".format(tOn)},""" +
        s""""skew_off_s":${"%.2f".format(tOff)},""" +
        s""""speedup":${"%.2f".format(tOff / tOn)},""" +
        s""""skew_markers_on":$mOn,"skew_markers_off":$mOff}"""
    }.mkString(",")
    val fired = on.exists(_._3 > 0)
    println(s"""{"metric":"graft_skew_join","fixture":"$fixDir",""" +
      s""""source":"$srcDir","hot_user_share":0.3,""" +
      s""""loadavg":${"%.2f".format(loadAvg)},"skew_join_fired":$fired,""" +
      s""""harness_knobs":"threshold=8m, advisory=8m, broadcast off",""" +
      s""""queries":{$rows}}""")
    spark.stop()
    require(fired, "skew-join never engaged — the record is vacuous")
  }
}
