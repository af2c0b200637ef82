package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** [[Dedup.spanExact]] — exact duplicated-span extraction at the
  * suffix-array grain (Lee et al. 2022 §4): maximal exactly-repeated
  * substrings of ≥ [[Dedup.MinSpanTokens]] tokens, with hand-built
  * fixtures whose span boundaries are known exactly, plus the cross-op
  * containment invariant against [[Dedup.chunkExact]]'s strided
  * approximation on the real testdata. */
class SpanExactSpec extends SparkSpec {
  private val K = Dedup.MinSpanTokens

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    val sp = spark; import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  private def uniq(tag: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$tag$i")

  test("a cross-document shared 80-token passage yields one maximal span per doc at the exact offsets") {
    val shared = uniq("s", 80)
    val a = (uniq("p", 10) ++ shared ++ uniq("q", 10)).mkString(" ")   // shared at 10..89
    val b = (uniq("r", 20) ++ shared ++ uniq("u", 5)).mkString(" ")    // shared at 20..99
    val out = Dedup.spanExact(docsDf(Seq(1L -> a, 2L -> b)))
      .orderBy("doc_id").collect()
    out.length shouldBe 2
    val Array(sa, sb) = out
    (sa.getLong(0), sa.getLong(1), sa.getLong(2)) shouldBe ((1L, 10L, 80L))
    (sb.getLong(0), sb.getLong(1), sb.getLong(2)) shouldBe ((2L, 20L, 80L))
    // n_positions = span_tokens - K + 1 by construction; min_occ = 2 sites
    sa.getLong(3) shouldBe 2L
    sa.getLong(4) shouldBe (80L - K + 1)
  }

  test("a WITHIN-document repeat is found: self-repetition counts as duplication") {
    val block = uniq("w", 60)
    val c = (block ++ uniq("f", 5) ++ block).mkString(" ")  // 125 tokens
    val out = Dedup.spanExact(docsDf(Seq(7L -> c)))
      .orderBy("span_start").collect()
    out.length shouldBe 2
    (out(0).getLong(1), out(0).getLong(2)) shouldBe ((0L, 60L))
    (out(1).getLong(1), out(1).getLong(2)) shouldBe ((65L, 60L))
  }

  test("an all-unique corpus and sub-threshold docs yield zero spans") {
    val short = uniq("t", K - 1).mkString(" ")          // under the grain
    val unique1 = uniq("x", 120).mkString(" ")
    val unique2 = uniq("y", 120).mkString(" ")
    Dedup.spanExact(docsDf(Seq(1L -> short, 2L -> unique1, 3L -> unique2)))
      .count() shouldBe 0L
  }

  test("a repeat shorter than MinSpanTokens is ignored — the threshold is a floor, not a stride") {
    val small = uniq("m", K - 1)                         // 49 shared tokens
    val a = (small ++ uniq("g", 60)).mkString(" ")
    val b = (uniq("h", 60) ++ small).mkString(" ")
    Dedup.spanExact(docsDf(Seq(1L -> a, 2L -> b))).count() shouldBe 0L
  }

  test("cross-op invariant: every duplicated chunkExact chunk of ≥ MinSpanTokens tokens sits inside a span (testdata)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val toks = split(col("text"), " ")
    val lens = docs.select(col("doc_id"),
      org.apache.spark.sql.functions.size(toks).cast("long").as("n_tok"))
    val chunks = Dedup.chunkExact(docs)
      .where(col("duplicated"))
      .join(lens, "doc_id")
      .select(col("doc_id"),
        (col("chunk_idx") * Corpus.ChunkStride).as("c_start"),
        least(lit(Corpus.ChunkTokens.toLong),
          col("n_tok") - col("chunk_idx") * Corpus.ChunkStride).as("c_len"))
      .where(col("c_len") >= K)
    val spans = Dedup.spanExact(docs)
      .select(col("doc_id"), col("span_start"),
        (col("span_start") + col("span_tokens")).as("span_end"))
    val uncovered = chunks.join(spans, Seq("doc_id"), "left")
      .groupBy("doc_id", "c_start", "c_len")
      .agg(max(col("span_start") <= col("c_start") &&
        col("span_end") >= col("c_start") + col("c_len")).as("covered"))
      .where(!coalesce(col("covered"), lit(false)))
    withClue("duplicated ≥50-token chunks not covered by any span: ") {
      uncovered.count() shouldBe 0L
    }
  }

  test("spanSavings: the one-row rollup matches the hand-countable fixture") {
    val shared = uniq("s", 80)
    val a = (uniq("p", 10) ++ shared ++ uniq("q", 10)).mkString(" ")  // 100 tokens
    val b = (uniq("r", 20) ++ shared ++ uniq("u", 5)).mkString(" ")   // 105 tokens
    val row = Dedup.spanSavings(docsDf(Seq(1L -> a, 2L -> b))).collect()(0)
    row.getLong(0) shouldBe 2L            // n_docs
    row.getLong(1) shouldBe 205L          // tokens_total
    row.getLong(2) shouldBe 2L            // n_spanned_docs
    row.getLong(3) shouldBe 2L            // n_spans
    row.getLong(4) shouldBe 160L          // tokens_in_spans (80 per doc)
    row.getDouble(5) shouldBe (160.0 / 205) +- 1e-6
  }

  test("spanSavings: overlapping maximal spans merge — union accounting never double-counts (ADVICE r10)") {
    // A's grams at 0 (= B) and 10 (= C) are each duplicated but nothing
    // between them is: two maximal spans [0,50) and [10,60) overlap by 40
    // tokens. Union accounting must report 60 for A, not 100.
    val a  = uniq("a", 60)
    val docA = (a ++ uniq("f", 50)).mkString(" ")       // 110 tokens
    val docB = a.take(K).mkString(" ")                  // = A[0..49]
    val docC = a.slice(10, 60).mkString(" ")            // = A[10..59]
    val row = Dedup.spanSavings(docsDf(Seq(1L -> docA, 2L -> docB, 3L -> docC)))
      .collect()(0)
    row.getLong(0) shouldBe 3L                          // n_docs
    row.getLong(1) shouldBe 210L                        // tokens_total
    row.getLong(2) shouldBe 3L                          // n_spanned_docs
    row.getLong(3) shouldBe 3L                          // disjoint union intervals
    row.getLong(4) shouldBe 160L                        // 60 + 50 + 50, no overlap
    row.getDouble(5) shouldBe (160.0 / 210) +- 1e-6
    // ...while the maximal-span report still shows all four fine-grain spans
    Dedup.spanExact(docsDf(Seq(1L -> docA, 2L -> docB, 3L -> docC)))
      .count() shouldBe 4L
  }

  test("spanApply: removes every covered token, keeps the rest in order") {
    val shared = uniq("s", 80)
    val a = (uniq("p", 10) ++ shared ++ uniq("q", 10)).mkString(" ")
    val b = (uniq("r", 20) ++ shared ++ uniq("u", 5)).mkString(" ")
    val out = Dedup.spanApply(docsDf(Seq(1L -> a, 2L -> b)))
      .orderBy("doc_id").collect()
    out.length shouldBe 2
    // ExactSubstr tool semantics: EVERY occurrence of the span goes
    (out(0).getLong(1), out(0).getLong(2)) shouldBe ((100L, 80L))
    out(0).getString(3) shouldBe (uniq("p", 10) ++ uniq("q", 10)).mkString(" ")
    (out(1).getLong(1), out(1).getLong(2)) shouldBe ((105L, 80L))
    out(1).getString(3) shouldBe (uniq("r", 20) ++ uniq("u", 5)).mkString(" ")
  }

  test("spanApply: overlapping spans cut once; a fully-covered doc empties") {
    val a  = uniq("a", 60)
    val docA = (a ++ uniq("f", 50)).mkString(" ")
    val docB = a.take(K).mkString(" ")
    val out = Dedup.spanApply(docsDf(Seq(1L -> docA, 2L -> docB,
        3L -> a.slice(10, 60).mkString(" ")))).orderBy("doc_id").collect()
    (out(0).getLong(1), out(0).getLong(2)) shouldBe ((110L, 60L))
    out(0).getString(3) shouldBe uniq("f", 50).mkString(" ") // union cut [0,60)
    (out(1).getLong(2), out(1).getString(3)) shouldBe ((50L, ""))
    (out(2).getLong(2), out(2).getString(3)) shouldBe ((50L, ""))
  }

  test("spanAttribution: the carrying source localizes the mass; clean sources report zero") {
    val sp = spark; import sp.implicits._
    val shared = uniq("s", 80)
    val rows = Seq(
      (1L, (uniq("p", 20) ++ shared).mkString(" "), "feedA"),  // 100 tok, 80 in span
      (2L, (shared ++ uniq("q", 20)).mkString(" "), "feedA"),  // 100 tok, 80 in span
      (3L, uniq("z", 100).mkString(" "), "feedB"))             // clean
    val out = Dedup.spanAttribution(rows.toDF("doc_id", "text", "source"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    out("feedA") shouldBe ((2L, 2L, 200L, 160L, 0.8))
    out("feedB") shouldBe ((1L, 0L, 100L, 0L, 0.0))
  }

  test("spanApply: a span-free corpus passes through byte-identical") {
    val texts = Seq(1L -> uniq("x", 120).mkString(" "),
      2L -> uniq("y", K - 1).mkString(" "))              // incl. sub-grain doc
    val out = Dedup.spanApply(docsDf(texts)).orderBy("doc_id").collect()
    out.map(_.getLong(2)).sum shouldBe 0L
    out.map(_.getString(3)).toSeq shouldBe texts.map(_._2)
  }

  test("spanSavings: a span-free corpus reports zero coverage, not null") {
    val row = Dedup.spanSavings(docsDf(Seq(
      1L -> uniq("x", 120).mkString(" "),
      2L -> uniq("y", 120).mkString(" ")))).collect()(0)
    (row.getLong(2), row.getLong(3), row.getLong(4)) shouldBe ((0L, 0L, 0L))
    row.getDouble(5) shouldBe 0.0
  }

  test("spanExact finds duplication on the real testdata (non-vacuous fixture)") {
    val out = Dedup.spanExact(Tables.documents(spark, "/root/testdata/sf0.001"))
    out.count() should be > 0L
    // every span respects the floor and the positions/tokens identity
    out.where(col("span_tokens") < K).count() shouldBe 0L
    out.where(col("n_positions") =!= col("span_tokens") - K + 1)
      .count() shouldBe 0L
    out.where(col("min_occurrences") < 2).count() shouldBe 0L
  }
}
