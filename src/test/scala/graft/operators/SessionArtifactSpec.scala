package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Parity pins for the round-10 train-once session artifacts (VERDICT r9
  * #1/#5): the registered surprisal queries now score against a parquet
  * n-gram model written once per (session, dir, split), and the LSH audit
  * queries consume a signature table written once per (session, dir).
  * Both must be BIT-IDENTICAL detours — same rows as the inline builds
  * they replace — or the memo is an optimization that changed answers. */
class SurprisalArtifactSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, sf)

  /** Per-doc float compare: doubles travel through identical arithmetic
    * on both paths, but aggregation ORDER differs between plans, so the
    * last ulp may not — compare at 1e-9, far tighter than the oracle's
    * own float tolerance. */
  private def assertScoresMatch(a: DataFrame, b: DataFrame): Unit = {
    val j = a.select(col("doc_id"), col("cross_entropy").as("cea"),
        col("n_tokens").as("na"))
      .join(b.select(col("doc_id"), col("cross_entropy").as("ceb"),
        col("n_tokens").as("nb")), Seq("doc_id"), "full")
    j.where(col("cea").isNull || col("ceb").isNull).count() shouldBe 0L
    j.where(col("na") =!= col("nb")).count() shouldBe 0L
    j.where(abs(col("cea") - col("ceb")) > 1e-9).count() shouldBe 0L
  }

  test("unigram surprisal via the session model artifact == inline build") {
    assertScoresMatch(
      TextAnalysis.queries("text_unigram_surprisal")(spark, sf),
      TextAnalysis.unigramSurprisal(docs))
  }

  test("bigram surprisal via the session model artifact == inline build") {
    assertScoresMatch(
      TextAnalysis.queries("text_bigram_surprisal")(spark, sf),
      TextAnalysis.bigramSurprisal(docs))
  }

  test("unigram probe via the ref-split artifact == inline split build") {
    assertScoresMatch(
      TextAnalysis.queries("text_surprisal_probe")(spark, sf),
      TextAnalysis.surprisalProbeSplit(docs))
  }

  test("bigram probe via the ref-split artifact == inline split build") {
    assertScoresMatch(
      TextAnalysis.queries("text_bigram_probe")(spark, sf),
      TextAnalysis.bigramProbeSplit(docs))
  }

  test("curriculum via the session model artifact assigns identical phases") {
    val viaArtifact = Corpus.queries("corpus_curriculum")(spark, sf)
      .select("doc_id", "phase")
    val inline = Corpus.curriculum(docs).select("doc_id", "phase")
    assertSameRows(viaArtifact, inline)
  }

  test("the artifact memoizes: a second open rereads the same frozen counts") {
    val m1 = TextAnalysis.surprisalModelArtifact(spark, sf, full = true)
    val m2 = TextAnalysis.surprisalModelArtifact(spark, sf, full = true)
    assertSameRows(m2.unigrams, m1.unigrams)
    m2.bigrams.count() shouldBe m1.bigrams.count()
  }

  test("ngram jaccard via the session pair artifact == inline build") {
    assertSameRows(
      Dedup.queries("dedup_ngram_jaccard")(spark, sf),
      Dedup.ngramJaccardBestMatch(docs))
  }

  test("containment via the session pair artifact == inline build") {
    assertSameRows(
      Dedup.queries("dedup_containment")(spark, sf),
      Dedup.containmentBestMatch(docs))
  }

  test("incremental minhash via the session signature artifact == inline build") {
    assertSameRows(
      Dedup.queries("dedup_minhash_incremental")(spark, sf),
      Dedup.minhashLshIncremental(docs))
  }

  test("near decontamination via the session signature artifact == inline build") {
    assertSameRows(
      Corpus.queries("corpus_near_decontaminate")(spark, sf),
      Corpus.nearDecontaminate(docs))
  }

  test("full and ref splits are distinct models (the probe must not see the incoming 20%)") {
    val full = TextAnalysis.surprisalModelArtifact(spark, sf, full = true)
    val ref  = TextAnalysis.surprisalModelArtifact(spark, sf, full = false)
    val fullTotal = full.total.collect()(0).getLong(0)
    val refTotal  = ref.total.collect()(0).getLong(0)
    refTotal should be < fullTotal
  }
}

/** [[Dedup.sigArtifact]] parity: the audit family and the cluster
  * artifact consume stored signatures — same rows as signing inline. */
class SigArtifactSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, sf)

  test("band profile via the signature artifact == inline signing") {
    assertSameRows(
      Dedup.queries("dedup_band_profile")(spark, sf),
      Dedup.bandProfile(docs))
  }

  test("threshold histogram via the signature artifact == inline signing") {
    assertSameRows(
      Dedup.queries("dedup_threshold_histogram")(spark, sf),
      Dedup.thresholdHistogram(docs))
  }

  test("sig calibration via the signature artifact == inline signing") {
    assertSameRows(
      Dedup.queries("dedup_sig_calibration")(spark, sf),
      Dedup.sigCalibration(docs))
  }

  test("cluster artifact built from stored signatures == inline minhashLsh") {
    assertSameRows(
      Dedup.lshClusterArtifact(spark, sf),
      Dedup.minhashLsh(docs))
  }

  test("the signature artifact stores one row per exact-dup representative") {
    val (withSig, _) = Dedup.sigArtifact(spark, sf)
    val nReps = Dedup.drArtifact(spark, sf)
      .where(col("doc_id") === col("rep")).count()
    withSig.count() shouldBe nReps
    withSig.select("doc_id").distinct().count() shouldBe nReps
  }

  test("simhash dedup via the session signature artifact == inline signing (r11)") {
    assertSameRows(
      Dedup.queries("dedup_simhash")(spark, sf),
      Dedup.simhashDedup(docs))
  }

  test("the simhash artifact rides the shared exact-dup map: one row per representative") {
    val reps = Dedup.simhashArtifact(spark, sf)
    val nReps = Dedup.drArtifact(spark, sf)
      .where(col("doc_id") === col("rep")).count()
    reps.count() shouldBe nReps
    reps.columns.toSeq shouldBe Seq("doc_id", "simhash")
  }
}
