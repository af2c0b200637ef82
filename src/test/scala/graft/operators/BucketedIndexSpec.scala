package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** The persisted-index scale path made concrete: a MinHash index written
  * as bucketed tables is probed without ever shuffling the corpus side
  * again — the bucketing-for-co-located-joins story, pinned against the
  * executed plans. */
class BucketedIndexSpec extends SparkSpec {

  private val db = "graft_bucketed_idx"

  private def corpusDf = {
    val sp = spark; import sp.implicits._
    Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (101L, "red orange yellow green blue indigo violet cyan magenta white"),
      (102L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (103L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
  }

  private def incomingDf = {
    val sp = spark; import sp.implicits._
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (2L, "unrelated words entirely disjoint from every corpus text"))
      .toDF("doc_id", "text")
  }

  test("persisted bucketed index: probe parity, and co-bucketed joins elide the shuffle") {
    val warehouse = Files.createTempDirectory("graft-bidx-").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$warehouse'")
    try {
      val index = Dedup.buildIndex(corpusDf)
      Dedup.saveIndex(index, s"$db.idx")
      val loaded = Dedup.loadIndex(spark, s"$db.idx")

      // parity: probing the reopened index = probing the in-memory one
      assertSameRows(
        Dedup.probeIndex(loaded, incomingDf),
        Dedup.probeIndex(index, incomingDf))

      // the co-located join proof: joining the two band tables on their
      // bucket keys runs with ZERO exchange — the corpus index is never
      // re-shuffled once written. At test size the planner would rather
      // broadcast (and rightly disable bucketed reads); pin the 100 TB
      // regime by taking broadcast off the table.
      val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
      val saved = spark.conf.get(thresholdKey)
      try {
        spark.conf.set(thresholdKey, "-1")
        val j = loaded.bands.join(loaded.okBuckets, Seq("band", "bkey"))
        j.collect()
        val plan = j.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        plan should not include "Exchange" // neither shuffle nor broadcast
        plan should include("SortMergeJoin")
        plan should include("Bucketed: true") // both scans read their buckets
      } finally spark.conf.set(thresholdKey, saved)
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
