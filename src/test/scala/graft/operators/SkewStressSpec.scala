package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Skewed-fixture stress for the cap guards (VERDICT r6 #4) — the caps are
  * the load-bearing 100 TB guarantee, so they get adversarial data, not
  * just uniform synthetics:
  *
  *   - a HOT KEY: one content duplicated 10⁴× (the "a million identical
  *     boilerplate pages" shape). The exact-dup pre-collapse must turn it
  *     into ONE LSH vertex — candidate generation never sees the copies.
  *   - a UNIVERSAL SHINGLE: one 3-gram present in every document (the
  *     "same header on every page" shape). [[Dedup.MaxShingleDf]] must
  *     drop it from the inverted index, leaving zero candidates, with the
  *     documented recall cost and nothing else.
  *
  * Candidate COUNTS are pinned (not just "it finishes"), so a cap
  * regression fails loudly rather than slowly. */
class SkewStressSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    val sp = spark; import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  private val words = (0 until 30).map(i => s"w$i")
  private def text(replace: Map[Int, String] = Map.empty): String =
    words.indices.map(i => replace.getOrElse(i, words(i))).mkString(" ")

  test("hot key: 10^4 exact copies collapse to one LSH vertex before banding") {
    val copies = (0L until 10000L).map(_ -> text())
    val nearDup = Seq(20000L -> text(Map(5 -> "zz")))
    val unrelated = Seq(30000L -> (0 until 30).map(i => s"q$i").mkString(" "))
    val docs = docsDf(copies ++ nearDup ++ unrelated)

    // pre-collapse ceiling: 3 distinct contents → 3 LSH vertices, however
    // many copies exist
    val dr = Dedup.docReps(docs)
    dr.select("rep").distinct().count() shouldBe 3L

    // candidate ceiling AFTER collapse: bands over the 3 representatives
    // can produce at most C(3,2)=3 pairs — pinned via the real band path
    val reps = docs.join(dr.where(col("doc_id") === col("rep")).select("doc_id"), "doc_id")
    val bands = Dedup.minhashSignatures(
        reps.select(col("doc_id"), Dedup.hashedShingles(col("text")).as("sh")))
      .select(col("doc_id"), posexplode(Dedup.bandKeys(col("sig"))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
    Dedup.cappedBandPairs(bands).count() should be <= 3L

    val t0 = System.nanoTime()
    val out = Dedup.minhashLsh(docs).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"10k-copy hot key end-to-end: $secs%.1f s")
    out.length shouldBe 10002
    val byDoc = out.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // all copies + the near-dup in cluster 0 (10001 members), loner alone
    byDoc(0L) shouldBe ((0L, 10000L))
    byDoc(9999L) shouldBe ((0L, 10000L))
    byDoc(20000L) shouldBe ((0L, 10000L))
    byDoc(30000L) shouldBe ((30000L, 0L))
    assert(secs < 60.0, s"hot-key stress took ${secs}s — pre-collapse not bounding the join?")
  }

  // (doc_id, sh) set frames crafted directly against the df-capped
  // inverted index, so the ceilings below are exact pins
  private def setsDf(rows: Seq[(Long, Seq[Long])]): DataFrame = {
    val sp = spark; import sp.implicits._
    rows.toDF("doc_id", "sh")
  }

  test("universal shingle: df above the cap yields ZERO candidates (documented recall floor)") {
    // every doc: the hot shingle 7 + two unique fillers (df=1 each)
    val n = 10000L
    val frame = setsDf((0L until n).map(i => i -> Seq(7L, 1000L + 2 * i, 1001L + 2 * i)))
    Dedup.dfCappedCandidates(frame).count() shouldBe 0L
  }

  test("df exactly at the cap pairs fully; one more document zeroes that shingle") {
    val cap = Dedup.MaxShingleDf.toLong
    val atCap = setsDf((0L until cap).map(i => i -> Seq(7L, 1000L + i)))
    Dedup.dfCappedCandidates(atCap).count() shouldBe cap * (cap - 1) / 2
    val overCap = setsDf((0L to cap).map(i => i -> Seq(7L, 1000L + i)))
    Dedup.dfCappedCandidates(overCap).count() shouldBe 0L
  }

  test("universal shingle degrades ONLY the hot shingle: rare overlaps still match") {
    // all docs share the leading 3-gram "h h h" (df = 52 > MaxShingleDf);
    // docs 100/101 additionally share a rare tail — they must still match
    // through the rare shingles alone
    val hot = "h h h"
    val uniq = (0L until 50L).map(i => i -> s"$hot u$i v$i w$i x$i")
    val pair = Seq(
      100L -> s"$hot same tail tokens here now",
      101L -> s"$hot same tail tokens here now2")
    val out = Dedup.ngramJaccardBestMatch(docsDf(uniq ++ pair)).collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    out(100L) shouldBe Some(101L)
    out(101L) shouldBe Some(100L)
    // the 50 only-hot-shingle docs got nothing: the universal shingle is
    // capped out of the index, and that is the WHOLE recall cost
    (0L until 50L).foreach(i => out(i) shouldBe None)
  }

  test("incremental probe: a hot corpus bucket above the cap answers no probes") {
    // corpus: MaxBandBucket+4 DISTINCT texts ("a b c" repeated m times,
    // m varying) with the IDENTICAL 3-shingle set {abc, bca, cab} — the
    // pre-collapse keeps them apart (different bytes) yet every doc lands
    // in the same band bucket in all 16 bands, all over the cap. A probe
    // with Jaccard 1.0 against the whole corpus must come back unmatched
    // (the documented recall cost of the cap), not fan out 68 ways.
    val corpus = (0 until Dedup.MaxBandBucket + 4)
      .map(i => i.toLong -> Seq.fill(i + 2)("a b c").mkString(" "))
    val idx = Dedup.buildIndex(docsDf(corpus))
    idx.okBuckets.count() shouldBe 0L // every bucket capped out
    val probe = docsDf(Seq(900L -> "a b c a b c"))
    val hits = Dedup.probeIndex(idx, probe).collect()
    hits.length shouldBe 1
    hits(0).isNullAt(1) shouldBe true
  }

  test("novelty: a universal boilerplate gram attributes to every doc without a hot window") {
    // every document opens with the same 5-gram (the shared-header shape
    // that motivated the combine+join df derivation) + a unique tail
    val out = TextAnalysis.novelty(docsDf((1L to 200L).map(i =>
      i -> s"x1 x2 x3 x4 x5 u$i a$i b$i c$i d$i"))).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).distinct
    // 10 tokens -> 6 gram slots; exactly the header gram is shared
    out shouldBe Array((6L, 1L, BigDecimal(1.0 - 1.0 / 6).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  test("threshold histogram: an over-cap hot bucket contributes no pairs to any bucket") {
    // one text duplicated 200x pre-collapses to a single rep — the
    // histogram must see ZERO pairs from the pile (no bucket at all),
    // exactly like the LSH candidate stage it audits
    val out = Dedup.thresholdHistogram(docsDf(
      (1L to 200L).map(i => i -> text()))).collect()
    out.length shouldBe 0
  }

  test("span dedup: a universal boilerplate block in 10^3 docs stays linear — one span per doc, no pair blowup") {
    // the "same license header on every page" shape at the span grain:
    // every doc opens with the SAME 60-token block, then unique tail.
    // spanExact has no pairing stage to blow up — coverage is per-position
    // (a gram's dup verdict is ONE count row however many sites carry it,
    // map-side combined; the hot gh join-back is one row per site, linear)
    // — so the output must be exactly one span per doc at [0, 60).
    val n = 1000L
    val block = (0 until 60).map(i => s"hdr$i")
    val docs = docsDf((0L until n).map(id =>
      id -> (block ++ (0 until 10).map(i => s"u${id}x$i")).mkString(" ")))
    val t0 = System.nanoTime()
    val spans = Dedup.spanExact(docs).collect()
    info(f"1k-doc universal-block spanExact: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spans.length shouldBe n
    all(spans.map(r => (r.getLong(1), r.getLong(2)))) shouldBe ((0L, 60L))
    // every gram of the block occurs once per doc → min_occurrences = n
    all(spans.map(_.getLong(3))) shouldBe n
    // and the probe side: a frozen index answers the hot block in O(batch)
    val probed = Dedup.probeSpans(Dedup.buildSpanIndex(docs),
      docsDf(Seq(100000L -> (block ++ (0 until 10).map(i => s"inc$i")).mkString(" "))))
      .collect()
    probed.length shouldBe 1
    (probed(0).getLong(1), probed(0).getLong(2)) shouldBe ((0L, 60L))
    // and the REWRITE: every doc loses exactly the 60-token block and
    // keeps its unique 10-token tail — the hot span costs one interval
    // row per doc, never a pairing, and no doc survives with block text
    val applied = Dedup.spanApply(docs).collect()
    applied.length shouldBe n
    all(applied.map(r => (r.getLong(1), r.getLong(2)))) shouldBe ((70L, 60L))
    val tails = applied.map(r => r.getLong(0) -> r.getString(3)).toMap
    (0L until n).foreach { id =>
      tails(id) shouldBe (0 until 10).map(i => s"u${id}x$i").mkString(" ")
    }
  }

  test("kl: a 10^4x hot source combines map-side; exact integers and kl bit-stable across 2-vs-32 partitions") {
    // the r10 KL claim under adversarial skew (VERDICT r10 #4): one
    // source carries 10^4 copies of one document (one blazing-hot
    // (source, word) cell per word) while two cold sources stay tiny.
    // The count grain collapses the hot cells map-side — nothing later
    // runs at token grain — and the exact-integer columns plus the
    // term-wise kl sum must be BIT-identical however the tokens were
    // partitioned.
    val sp = spark; import sp.implicits._
    val rows = (1L to 10000L).map(i => (i, "the quick brown fox", "hot")) ++
      Seq((20001L, "the slow green fox", "coldA"),
        (20002L, "a quick red dog", "coldB"))
    val df = rows.toDF("doc_id", "text", "source")
    def snap(): Map[String, (Long, Long, Double)] =
      Corpus.klDivergence(df).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val a = snap()
    a("hot")._1 shouldBe 40000L // every token in-vocab, exact
    a("hot")._2 shouldBe 4L
    // the model IS dominated by the hot source, so the hot source
    // diverges least and a cold source with off-model mass scores higher
    a("hot")._3 should be < a("coldB")._3
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    val b = try {
      spark.conf.set("spark.sql.shuffle.partitions", "2"); snap()
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
    // integers bit-equal; the term-wise kl sum reorders across partition
    // counts by design — ~1 ulp per term, pinned far inside the oracle's
    // 1e-9 band (the CrossOpInvariantSpec convention for the KL doubles)
    b.keySet shouldBe a.keySet
    a.foreach { case (s, (t, m, k)) =>
      (b(s)._1, b(s)._2) shouldBe ((t, m))
      b(s)._3 shouldBe k +- 1e-9
    }
  }

  test("growth accounting: a 10^4-event user never leaves its partition; flows exact across 2-vs-32 partitions") {
    // the r10 growth claim under per-user volume skew: one user fires
    // 10^4 same-day events plus a gap-and-return arc; the day collapse
    // is user-local (hash(user) exchange, partition-local sort), so the
    // hot user costs one task ONE sorted slice, and the exact flow
    // counts cannot depend on parallelism.
    val sp = spark; import sp.implicits._
    val us = 86400L * 1000000L
    val rows = (1L to 10000L).map(i => (i, (i % 7) * us / 7, 1L)) ++ // day 0, 10^4 events
      Seq((20001L, 1L * us, 1L), (20002L, 3L * us, 1L),  // retained, gap → churn+resurrect
        (20003L, 0L * us, 2L))                           // cold user
    val df = rows.map { case (e, t, u) => (e, t, u, "view", 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def snap(): Set[Seq[Any]] =
      Events.growthAccounting(df).collect().map(_.toSeq.toSeq).toSet
    val a = snap()
    // day 0: both users new; day 1: u1 retained; day 2: u1 churned;
    // day 3: u1 resurrected — and u2's terminal churn at day 1
    a.map(r => (r(0), r(1), r(2), r(3), r(4))) shouldBe Set(
      (0L, 2L, 0L, 0L, 0L), (1L, 0L, 1L, 0L, 1L),
      (2L, 0L, 0L, 0L, 1L), (3L, 0L, 0L, 1L, 0L))
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    val b = try {
      spark.conf.set("spark.sql.shuffle.partitions", "2"); snap()
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
    b shouldBe a
  }

  test("source attribution: one text duplicated 10^4 times combines before it moves") {
    val sp = spark; import sp.implicits._
    val rows = (1L to 10000L).map(i => (i, "same boilerplate", "feedA")) ++
      Seq((20001L, "unique one", "feedA"), (20002L, "unique two", "feedB"))
    val out = Dedup.sourceAttribution(
      rows.toDF("doc_id", "text", "source")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    out("feedA") shouldBe ((10001L, 2L, 10000L))
    out("feedB") shouldBe ((1L, 1L, 0L))
  }
}
