package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The epoch shuffle executed (VERDICT r16 #7): the written sharded
  * layout must carry exactly the plan's assignment and payload, replay
  * the permutation in file order, prune per shard at the directory
  * level (the `ShardedWriteSpec` convention), and give each epoch an
  * independent permutation. */
class EpochShuffleApplySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val applied = Corpus.epochShuffleApply(spark, sf).cache()
  private def ep1Dir = new org.apache.hadoop.fs.Path(
    graft.engine.Artifacts.root(spark),
    "graft-epochshuffle-apply/epoch=1").toString

  test("apply round-trips the plan: epoch-1 read-back equals epochShuffle " +
    "plus the document payload") {
    val docs = Tables.documents(spark, sf)
    val plan = Corpus.epochShuffle(docs)
      .join(docs.select("doc_id", "n_chars"), "doc_id")
      .select(lit(1).as("epoch"), col("doc_id"), col("shard"), col("pos"),
        col("n_chars"))
    assertSameRows(applied.where(col("epoch") === 1), plan)
  }

  test("each epoch is a full permutation, and epochs 1 and 2 differ") {
    val n = Tables.documents(spark, sf).count()
    Corpus.ApplyEpochs.foreach { ep =>
      applied.where(col("epoch") === ep).count() shouldBe n
      applied.where(col("epoch") === ep)
        .select("doc_id").distinct().count() shouldBe n
    }
    // salt independence: the two epochs must not produce the same
    // (shard, pos) for every document
    val same = applied.where(col("epoch") === 1)
      .select(col("doc_id"), col("shard").as("s1"), col("pos").as("p1"))
      .join(applied.where(col("epoch") === 2)
        .select(col("doc_id"), col("shard").as("s2"), col("pos").as("p2")),
        "doc_id")
      .where(col("s1") === col("s2") && col("p1") === col("p2"))
      .count()
    assert(same < n, s"epoch 1 and 2 assigned identical (shard, pos) to " +
      s"all $n documents — the per-epoch salt is not reaching the hash")
  }

  test("a shard predicate on the written layout prunes at the directory " +
    "level, and file row order replays the plan's pos order") {
    applied.count() // force the write
    val back = spark.read.parquet(ep1Dir)
    val shard = back.select("shard").distinct().limit(1)
      .collect().head.getInt(0)
    val one = back.where(col("shard") === shard)
    val p = one.queryExecution.executedPlan.toString
    p should include("PartitionFilters")
    (s"\\(shard#\\d+ = $shard\\)".r.findFirstIn(p)) shouldBe defined
    // within the shard's file(s), scan order = pos order (the training
    // reader replays the permutation with a plain sequential read)
    val inOrder = one.select(col("pos"))
      .withColumn("scan_order", monotonically_increasing_id())
      .collect().sortBy(_.getLong(1)).map(_.getInt(0))
    inOrder shouldBe inOrder.sorted
    inOrder.head shouldBe 1
  }
}
