package graft.functions

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bounded top-k aggregator must agree exactly with the window-based
  * formulation it replaces (including tiebreaks), while aggregating with
  * map-side partials instead of a per-group global sort. */
class TopKByScoreSpec extends SparkSpec {

  test("perGroup matches row_number window semantics incl. ties, across partitions") {
    val sp = spark; import sp.implicits._
    val rnd = new Random(42)
    val rows = (0 until 2000).map { i =>
      (i % 7L, rnd.nextInt(5000).toLong, rnd.nextInt(100) / 100.0)
    } ++ Seq((0L, 111L, 0.99), (0L, 110L, 0.99)) // exact tie -> smaller id first
    val scored = rows.toDF("query_id", "neighbor_id", "cosine_sim")
      .repartition(8) // force multi-partition partial aggregation

    val k = 5
    val viaAgg = TopKByScore.perGroup(scored, k).collect().toSet
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
    val viaWindow = scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("int").as("rank"), col("cosine_sim"))
      .collect().toSet
    viaAgg shouldBe viaWindow
  }

  test("groups smaller than k return all members, ranked") {
    val sp = spark; import sp.implicits._
    val scored = Seq((1L, 10L, 0.5), (1L, 20L, 0.9))
      .toDF("query_id", "neighbor_id", "cosine_sim")
    val out = TopKByScore.perGroup(scored, 5).collect()
      .map(r => (r.getLong(1), r.getInt(2)))
    out.toSet shouldBe Set((20L, 1), (10L, 2))
  }

  test("duplicate of the buffer's last element never grows a full buffer past k") {
    val sp = spark; import sp.implicits._
    // ADVICE r2: with a full buffer, a row exactly equal to buf.last used to
    // find no insertion slot and emit a rank-(k+1) row
    val scored = Seq((1L, 1L, 0.9), (1L, 2L, 0.5), (1L, 2L, 0.5), (1L, 3L, 0.5))
      .toDF("query_id", "neighbor_id", "cosine_sim").coalesce(1)
    val out = TopKByScore.perGroup(scored, 2).collect()
    out.length shouldBe 2
    out.map(_.getInt(2)).max shouldBe 2
    out.map(r => (r.getLong(1), r.getInt(2))).toSet shouldBe Set((1L, 1), (2L, 2))
  }

  test("aggregation plan is a partial/final ObjectHashAggregate, not a window sort") {
    val sp = spark; import sp.implicits._
    val scored = Seq((1L, 10L, 0.5)).toDF("query_id", "neighbor_id", "cosine_sim")
    val plan = TopKByScore.perGroup(scored, 5).queryExecution.executedPlan.toString()
    plan should include ("ObjectHashAggregate")
    (plan should not).include("Window")
  }
}
