package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The curriculum executed (VERDICT r16 #7): the phase-ordered emission
  * must tie exactly to the phase plan (the `dedup_span_apply`
  * cross-op-invariant convention), the global order must be a dense
  * permutation that sorts by (phase, difficulty), and the per-phase
  * sequence chunking must follow the packPlan rule in curriculum
  * order. */
class CurriculumApplySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, sf)
  private lazy val plan = Corpus.curriculum(docs).cache()
  private lazy val applied =
    Corpus.curriculumApplyFrom(plan, docs).cache()

  test("apply ties to plan: identical (doc_id, phase) assignment") {
    assertSameRows(applied.select("doc_id", "phase"),
      plan.select("doc_id", "phase"))
  }

  test("global_pos is a dense 1..N permutation ordered by (phase, ce, " +
    "doc_id) — the training order, computed without a global sort") {
    val n = docs.count()
    applied.count() shouldBe n
    applied.agg(min("global_pos"), max("global_pos"),
        countDistinct("global_pos"))
      .collect().head.toSeq shouldBe Seq(1L, n, n)
    // the broadcast-offset composition equals the global window it avoids
    val direct = plan
      .withColumn("global_pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("phase").asc, col("ce").asc, col("doc_id").asc))
        .cast("long"))
      .select("doc_id", "global_pos")
    assertSameRows(applied.select("doc_id", "global_pos"), direct)
  }

  test("per-phase sequence chunking follows the packPlan rule in " +
    "curriculum order: seq_id starts at 0 and steps by the running " +
    "token sum, never mixing phases") {
    val toks = docs.select(col("doc_id"),
      org.apache.spark.sql.functions.size(split(col("text"), " "))
        .cast("long").as("n_tok"))
    val rows = applied.join(toks, "doc_id")
      .select("phase", "pos", "seq_id", "n_tok")
      .collect().groupBy(_.getInt(0))
    rows.foreach { case (phase, rs) =>
      var cum = 0L
      rs.sortBy(_.getLong(1)).foreach { r =>
        withClue(s"phase $phase pos ${r.getLong(1)}: ") {
          r.getLong(2) shouldBe cum / Corpus.SeqTokenBudget
        }
        cum += r.getLong(3)
      }
    }
  }
}
