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

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  private def exchanges(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).length

  /** Run `body` with broadcast joins off — at test size the planner would
    * rather broadcast (rightly disabling bucketed reads); the pins below
    * are about the 100 TB regime where both sides are too big for that. */
  private def noBroadcast[A](body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try { spark.conf.set(key, "-1"); body }
    finally spark.conf.set(key, saved)
  }

  test("persisted span index: probe parity, and the corpus grams never reshuffle") {
    val warehouse = Files.createTempDirectory("graft-sidx-").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$warehouse'")
    try {
      val sp = spark; import sp.implicits._
      def uniq(tag: String, n: Int) = (0 until n).map(i => s"$tag$i")
      val block = uniq("res", 60)
      val resident = Seq(1L -> (uniq("pre", 15) ++ block ++ uniq("post", 10))
        .mkString(" ")).toDF("doc_id", "text")
      val incoming = Seq(
        10L -> (uniq("a", 20) ++ block ++ uniq("b", 5)).mkString(" "),
        11L -> uniq("fresh", 90).mkString(" ")).toDF("doc_id", "text")

      val index = Dedup.buildSpanIndex(resident)
      Dedup.saveSpanIndex(index, s"$db.spanidx")
      val loaded = Dedup.loadSpanIndex(spark, s"$db.spanidx")

      assertSameRows(
        Dedup.probeSpans(loaded, incoming),
        Dedup.probeSpans(index, incoming))

      noBroadcast {
        val plan = finalPlan(Dedup.probeSpans(loaded, incoming))
        plan should include("Bucketed: true") // the index scan reads its buckets
        // probe grams exchange on gh + the islands window's doc_id
        // exchange — and NOTHING for the corpus side (a third exchange
        // here means the persisted index got reshuffled per probe)
        exchanges(plan) shouldBe 2
        plan should include("SortMergeJoin")
      }
    } finally spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }

  test("persisted block index: probe parity, and the store's blocks never reshuffle") {
    val warehouse = Files.createTempDirectory("graft-bkidx-").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$warehouse'")
    try {
      val sp = spark; import sp.implicits._
      val blocks = Seq("aaaaaaaaaaaaaaaa", "bbbbbbbbbbbbbbbb",
        "cccccccccccccccc", "dddddddddddddddd")
      val resident = Seq(1L -> blocks.mkString).toDF("doc_id", "text")
      val incoming = Seq(
        10L -> blocks.mkString,                    // re-upload: 1.0
        11L -> ("pppppppppppppppp" * 4)).toDF("doc_id", "text")

      val index = Multimodal.buildBlockIndex(resident)
      Multimodal.saveBlockIndex(index, s"$db.blockidx")
      val loaded = Multimodal.loadBlockIndex(spark, s"$db.blockidx")

      assertSameRows(
        Multimodal.probeBlocks(loaded, incoming),
        Multimodal.probeBlocks(index, incoming))

      noBroadcast {
        val plan = finalPlan(Multimodal.probeBlocks(loaded, incoming))
        plan should include("Bucketed: true")
        // incoming blocks exchange on bh + the per-record rollup's doc_id
        // exchange; zero for the store side
        exchanges(plan) shouldBe 2
        plan should include("SortMergeJoin")
      }
    } finally spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }

  test("persisted BQ index: probe parity, and the co-bucketed " +
    "signature→vector-store join elides the shuffle") {
    val warehouse = Files.createTempDirectory("graft-bqidx-").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$warehouse'")
    try {
      val sfDir = "/root/testdata/sf0.001"
      val vs = Similarity.annCorpus(spark, sfDir)
      val corpus = vs.where(
        org.apache.spark.sql.functions.col("vec_id") >=
          Similarity.NumQueryVectors)
      val queries = vs.where(
          org.apache.spark.sql.functions.col("vec_id") <
            Similarity.NumQueryVectors)
        .select(org.apache.spark.sql.functions.col("vec_id").as("query_id"),
          org.apache.spark.sql.functions.col("v").as("qv"),
          org.apache.spark.sql.functions.col("nrm").as("qn"))

      val index = Similarity.buildBqIndex(corpus)
      Similarity.saveBqIndex(index, s"$db.bqidx")
      val loaded = Similarity.loadBqIndex(spark, s"$db.bqidx")

      // parity: probing the reopened index = probing the in-memory one
      // (= the oracle-checked sim_bq_probe answer)
      assertSameRows(
        Similarity.probeHamming(loaded, queries),
        Similarity.probeHamming(index, queries))

      // the co-located join proof for the rerank path: at 100 TB a query
      // batch too large to broadcast joins its candidate ids against the
      // vector store by vec_id — both persisted tables bucket AND sort by
      // vec_id, so that join runs with ZERO exchange on either side
      noBroadcast {
        val j = loaded.packed.join(loaded.vecs, Seq("vec_id"))
        val plan = finalPlan(j)
        plan should not include "Exchange" // neither shuffle nor broadcast
        plan should include("SortMergeJoin")
        plan should include("Bucketed: true")
      }
    } finally spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }
}
