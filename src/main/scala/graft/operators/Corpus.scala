package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Corpus-level pipeline operators — the composition layer of the
  * training-data extension surface: a cleaning pipeline chaining the
  * per-document signal operators into keep/drop decisions, and
  * deterministic stratified sampling. No counterpart in the reference
  * (SURVEY.md §2.2 "not have" list); both are standard stages of a
  * large-scale corpus build.
  *
  * 100 TB shape: both are map-only scans plus one digest-keyed shuffle for
  * the duplicate check — no state, no driver-side anything; sampling is a
  * pushdown-able filter (the hash predicate reaches the scan, so a sampled
  * read never materializes the rejected rows downstream).
  */
object Corpus {

  /** Minimum composite quality ([[TextAnalysis.quality]]) to keep a
    * document — calibrated to reject the low tail (~35% of the synthetic
    * corpus) while keeping the pipeline's output non-trivial. */
  val QualityKeepThreshold = 0.5

  /** Per-language keep rates in per-mille for [[sampleStratified]]:
    * downsample the over-represented head language, keep the tail.
    * Languages outside the map fall back to [[DefaultRatePerMille]]. */
  val SampleRatesPerMille: Seq[(String, Int)] =
    Seq("en" -> 400, "de" -> 800, "es" -> 800, "fr" -> 800, "zh" -> 600)
  val DefaultRatePerMille = 100

  /** Cleaning pipeline: exact-duplicate drop (keep the min-doc_id copy)
    * then quality gate, composing [[Dedup]]'s digest grouping with
    * [[TextAnalysis.quality]]. One row per document:
    * (doc_id, keep, reason ∈ kept|duplicate|low_quality) — the keep/drop
    * ledger a corpus build audits.
    *
    * Reason priority mirrors production pipelines: dedup before quality
    * (a duplicate is 'duplicate' even when it would also fail quality). */
  def clean(documents: DataFrame): DataFrame = {
    // one digest convention, one implementation: Dedup's (doc_id, rep) map
    val dr = Dedup.docReps(documents)
    val q = TextAnalysis.quality(documents).select(col("doc_id"), col("quality_score"))
    dr.join(q, "doc_id")
      .select(
        col("doc_id"),
        (col("doc_id") === col("rep") &&
          col("quality_score") >= QualityKeepThreshold).as("keep"),
        when(col("doc_id") =!= col("rep"), lit("duplicate"))
          .when(col("quality_score") < QualityKeepThreshold, lit("low_quality"))
          .otherwise(lit("kept")).as("reason"))
  }

  /** The sampling hash: uniform in [0, 1000) per document, independent of
    * the strata, portable ([[Dedup.h32]] is md5-derived on both engines).
    * Salted so it is independent of every other hash in the engine. */
  private def sampleHash(docId: Column): Column =
    Dedup.h32(concat(lit("smp:"), docId.cast("string"))) % 1000

  private def rateFor(lang: Column): Column =
    SampleRatesPerMille.foldLeft(lit(DefaultRatePerMille)) {
      case (acc, (l, r)) => when(lang === l, lit(r)).otherwise(acc)
    }

  /** Deterministic stratified Bernoulli sample over the `lang` strata:
    * keep a document iff hash(doc_id) mod 1000 < rate(lang). Reproducible
    * across runs/engines (no RNG state), unbiased within each stratum, and
    * a pure filter — at scale it prunes at the scan. */
  def sampleStratified(documents: DataFrame): DataFrame =
    documents
      .where(sampleHash(col("doc_id")) < rateFor(col("lang")))
      .select(col("doc_id"), col("lang"), col("source"))

  /** Output shard count for [[shardPlan]] (a real corpus build picks
    * shards ≈ corpus_bytes / target_shard_bytes). */
  val NumShards = 32

  /** Deterministic output-shard planning — the write-side stage of a
    * corpus build: every document hashes to one of [[NumShards]] shards
    * (salted portable hash, independent of the sampling hash), and the
    * plan reports each shard's document count and byte mass so skew is
    * visible before the expensive write. At scale the same expression
    * feeds `repartitionByRange`/`partitionBy` for the actual write; the
    * stats are one map-side-combined aggregation. */
  def shardPlan(documents: DataFrame): DataFrame =
    documents
      .select(
        (Dedup.h32(concat(lit("shard:"), col("doc_id").cast("string"))) % NumShards)
          .as("shard"),
        col("n_chars"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_clean"      -> ((s, d) => clean(Tables.documents(s, d))),
    "sample_stratified" -> ((s, d) => sampleStratified(Tables.documents(s, d))),
    "shard_plan"        -> ((s, d) => shardPlan(Tables.documents(s, d))),
  )

  private def ratesCaseSql =
    SampleRatesPerMille.map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
      .mkString(" ")

  val oracleSql: Map[String, String] = Map(
    "corpus_clean" ->
      s"""WITH k AS (SELECT md5(text) AS sha, MIN(doc_id) AS keeper
         |   FROM documents GROUP BY md5(text)),
         | ${TextAnalysis.qualityScoreSqlWith}
         | SELECT d.doc_id,
         |   d.doc_id = k.keeper AND sc.quality_score >= $QualityKeepThreshold AS keep,
         |   CASE WHEN d.doc_id <> k.keeper THEN 'duplicate'
         |        WHEN sc.quality_score < $QualityKeepThreshold THEN 'low_quality'
         |        ELSE 'kept' END AS reason
         | FROM documents d
         | JOIN k ON md5(d.text) = k.sha
         | JOIN qscore sc ON sc.doc_id = d.doc_id""".stripMargin,

    "sample_stratified" ->
      s"""SELECT doc_id, lang, source FROM documents
         | WHERE ('0x' || substring(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000
         |   < (CASE $ratesCaseSql ELSE $DefaultRatePerMille END)""".stripMargin,

    "shard_plan" ->
      s"""SELECT ('0x' || substring(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
         |     % $NumShards AS shard,
         |   CAST(COUNT(*) AS BIGINT) AS n_docs,
         |   CAST(SUM(n_chars) AS BIGINT) AS total_chars
         | FROM documents GROUP BY 1""".stripMargin,
  )
}
