package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The shard plan executed: the partitioned write lays out `shard=K/`
  * directories whose contents match the (oracle-checked) shard_plan
  * stats, and a shard predicate on read-back prunes at the directory
  * level — the partition-pruning half of the corpus write story. */
class ShardedWriteSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("sharded write matches the shard plan and prunes on read-back") {
    val docs = Tables.documents(spark, sf)
    val out = Files.createTempDirectory("graft-shards-").toString
    Corpus.writeSharded(docs, out)

    // directory layout: one shard=K dir per plan row
    val plan = Corpus.shardPlan(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dirs = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.startsWith("shard=")).map(_.stripPrefix("shard=").toLong).toSet
    dirs shouldBe plan.keySet

    // read-back totals per shard equal the plan's preview stats
    val back = spark.read.parquet(out)
    // the partition column reads back as int (inferred from the dir name)
    val counts = back.groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    counts shouldBe plan

    // a shard predicate prunes to ONE partition directory at planning
    // time: the scan reports the pushed partition filter and reads a
    // single shard's rows without touching the others
    val one = back.where(col("shard") === dirs.head)
    one.count() shouldBe plan(dirs.head)
    val p = one.queryExecution.executedPlan.toString
    p should include("PartitionFilters")
    // rendered with the attribute's expr id: "(shard#12 = 3)" — the filter
    // sits in the scan's partition-filter slot, so only that directory's
    // files are listed into the scan (not a post-scan Filter over all rows)
    (s"\\(shard#\\d+ = ${dirs.head}\\)".r.findFirstIn(p)) shouldBe defined
  }
}
