package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Corpus pipeline semantics on crafted fixtures: reason priority
  * (duplicate beats low_quality), keeper selection, and the determinism +
  * stratification of the hash sample. */
class CorpusSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String, String, String)]): DataFrame = {
    val sp = spark; import sp.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
  }

  // a high-quality text: long, stopword-rich, no punctuation, varied
  // (stopword/unique-word alternation keeps every bigram distinct so the
  // repetition gate stays quiet)
  private val stops = Vector("the", "a", "of", "to", "and", "is")
  private val good =
    (1 to 60).flatMap(i => Seq(stops(i % stops.size), s"u$i")).mkString(" ")
  // a low-quality text: short and punctuation-heavy
  private val bad = "@@@ ### !!! %%% &&&"
  // degenerate repetition: long enough for the gate, one bigram dominates
  private val loopy = Seq.fill(40)("spam").mkString(" ")

  test("source profile: per-(source, lang) mass, quality, and dup rate") {
    val out = Corpus.sourceProfile(docsDf(Seq(
      (1L, good, "en", "web"),
      (2L, good, "en", "web"),  // exact dup of 1 within the stratum
      (3L, bad, "en", "web"),
      (4L, good + " anders", "de", "books"), // distinct content
      (5L, good, "en", "books")))) // same content as 1 but other stratum:
      .collect()                   // still a dup (content-global collapse)
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5), r.getDouble(6))))
      .toMap
    val goodTok = good.split(" ").length.toLong
    val badTok = bad.split(" ").length.toLong
    out(("web", "en"))._1 shouldBe 3L
    out(("web", "en"))._2 shouldBe (2 * goodTok + badTok)
    out(("web", "en"))._4 shouldBe 1L // doc 2
    out(("web", "en"))._5 shouldBe (1.0 / 3) +- 1e-12
    out(("books", "de")) shouldBe ((1L, goodTok + 1, out(("books", "de"))._3, 0L, 0.0))
    out(("books", "en"))._4 shouldBe 1L // doc 5 duplicates doc 1's content
    // quality is the SAME composite the cleaning gate uses
    val q = TextAnalysis.quality(docsDf(Seq((1L, good, "en", "web"))).select("doc_id", "text"))
      .collect()(0).getDouble(3)
    out(("books", "en"))._3 shouldBe q +- 1e-12
  }

  test("clean: duplicate beats low_quality; min doc_id is the keeper") {
    val out = Corpus.clean(docsDf(Seq(
      (5L, good, "en", "web"),
      (2L, good, "en", "web"),   // same content: keeper (min id)
      (7L, bad, "en", "web"),
      (9L, bad, "en", "web")))) // duplicate of a low-quality text
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    out(2L) shouldBe ((true, "kept"))
    out(5L) shouldBe ((false, "duplicate"))
    out(7L) shouldBe ((false, "low_quality"))
    out(9L) shouldBe ((false, "duplicate")) // NOT low_quality: dedup ranks first
  }

  test("clean: repetitive ranks below duplicate, above low_quality") {
    val out = Corpus.clean(docsDf(Seq(
      (1L, loopy, "en", "web"),    // repetitive keeper
      (2L, loopy, "en", "web"),    // duplicate of a repetitive text
      (3L, good, "en", "web"))))
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    out(1L) shouldBe ((false, "repetitive")) // keeper, but gated
    out(2L) shouldBe ((false, "duplicate"))  // dedup still ranks first
    out(3L) shouldBe ((true, "kept"))
  }

  test("clean with learned gate: clf_rejected ranks last; heuristics unchanged") {
    // build a heuristic-clean text the classifier must reject (70 distinct
    // tokens that all hash to strongly-negative weight buckets: logit
    // ≈ −0.62) and one it must keep (positive buckets, ≈ +0.88), via an
    // INDEPENDENT JVM md5 replication of the hash→weight lookup — both
    // pass the heuristic gate (no punctuation, ~450 chars ⇒ quality 0.66
    // ≥ 0.5; all-distinct tokens keep the repetition gate quiet)
    def tw(term: String): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(term.getBytes("UTF-8"))
      val hex = d.take(4).map(b => f"$b%02x").mkString
      TextAnalysis.ClfWeights((java.lang.Long.parseLong(hex, 16) %
        TextAnalysis.ClfDim).toInt)
    }
    val rejText = (0 until 2000).map(i => s"neg$i")
      .filter(t => tw(t) <= -0.5).take(70).mkString(" ")
    val keptText = (0 until 2000).map(i => s"pos$i")
      .filter(t => tw(t) >= 0.5).take(70).mkString(" ")
    val out = Corpus.clean(docsDf(Seq(
      (1L, keptText, "en", "web"),
      (2L, rejText, "en", "web"),   // heuristics pass, classifier rejects
      (3L, rejText, "en", "web"),   // duplicate still ranks above clf
      (4L, bad, "en", "web"))),     // low_quality still ranks above clf
      learnedGate = true)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    out(1L) shouldBe ((true, "kept"))
    out(2L) shouldBe ((false, "clf_rejected"))
    out(3L) shouldBe ((false, "duplicate"))
    out(4L) shouldBe ((false, "low_quality"))
    // flag off: the exact same fixture keeps the classifier reject
    val off = Corpus.clean(docsDf(Seq((2L, rejText, "en", "web"))))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    off(2L) shouldBe true
  }

  test("clean emits exactly one row per document") {
    val rows = (0L until 50L).map(i => (i, if (i % 3 == 0) good else s"$bad $i", "en", "web"))
    val out = Corpus.clean(docsDf(rows))
    out.count() shouldBe 50
    out.select("doc_id").distinct().count() shouldBe 50
  }

  test("stratified sample is deterministic and respects per-stratum rates") {
    val rows = (0L until 2000L).map(i =>
      (i, s"text $i", if (i % 2 == 0) "en" else "zh", "web"))
    val s1 = Corpus.sampleStratified(docsDf(rows)).collect().map(_.getLong(0)).sorted
    val s2 = Corpus.sampleStratified(docsDf(rows)).collect().map(_.getLong(0)).sorted
    s1 shouldBe s2 // no RNG state: same input, same sample

    val byLang = Corpus.sampleStratified(docsDf(rows)).collect()
      .groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // 1000 docs per stratum at 400‰ (en) and 600‰ (zh): binomial mean 400
    // and 600, sd ≈ 15.5 — assert within ~4 sd
    byLang("en").toDouble shouldBe 400.0 +- 65.0
    byLang("zh").toDouble shouldBe 600.0 +- 65.0
  }

  test("shard plan: every doc lands in exactly one shard, mass conserved, no hot shard") {
    val sp = spark; import sp.implicits._
    val docs = (0L until 3200L).map(i => (i, s"text $i", "en", "web", 100L + i % 7))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val plan = Corpus.shardPlan(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
    plan.map(_._1).distinct.length shouldBe Corpus.NumShards
    plan.map(_._2._1).sum shouldBe 3200L                      // docs conserved
    plan.map(_._2._2).sum shouldBe (0L until 3200L).map(100L + _ % 7).sum
    // uniform hash: 100/shard expected, sd ~10 — no shard past ~5 sd
    all(plan.map(_._2._1)) should (be >= 50L and be <= 150L)
  }

  test("unknown strata fall back to the default rate") {
    val rows = (0L until 1000L).map(i => (i, s"t $i", "xx", "web"))
    val n = Corpus.sampleStratified(docsDf(rows)).count()
    // 100‰ of 1000: sd ≈ 9.5, assert within ~5 sd
    n.toDouble shouldBe 100.0 +- 50.0
  }

  test("mix plan: shares sum to 1, weights move toward the target and cap") {
    val sp = spark; import sp.implicits._
    // en: 900 docs x 10 tokens; zh: 100 x 10; xx: 10 x 10 (not in target)
    val docs = ((0 until 900).map(i => (i.toLong, "a b c d e f g h i j", "en", "w")) ++
      (900 until 1000).map(i => (i.toLong, "a b c d e f g h i j", "zh", "w")) ++
      (1000 until 1010).map(i => (i.toLong, "a b c d e f g h i j", "xx", "w")))
      .toDF("doc_id", "text", "lang", "source")
    val out = Corpus.mixPlan(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(3), r.getDouble(5)))).toMap
    out.values.map(_._2).sum shouldBe 1.0 +- 1e-12 // shares partition the corpus
    out("en")._1 shouldBe 9000L
    // en is over-represented (89%) vs target 35% -> downweighted
    out("en")._3 shouldBe (0.35 / out("en")._2) +- 1e-12
    out("en")._3 should be < 1.0
    // zh under-represented (10%) vs 20% -> upweighted
    out("zh")._3 should be > 1.0
    // xx absent from the target mix -> weight 0 (dropped)
    out("xx")._3 shouldBe 0.0
  }

  test("mix plan: a tiny stratum's upsampling is capped") {
    val sp = spark; import sp.implicits._
    val docs = ((0 until 999).map(i => (i.toLong, "a b", "en", "w")) :+
      (999L, "a b", "zh", "w")).toDF("doc_id", "text", "lang", "source")
    val zh = Corpus.mixPlan(docs).collect()
      .find(_.getString(0) == "zh").get
    // raw weight would be 0.2/0.001 = 200; capped at MaxUpsample
    zh.getDouble(5) shouldBe Corpus.MaxUpsample
  }

  test("temperature mix: α ∈ (0,1) flattens toward uniform — head damped, tail lifted, shares renormalize") {
    val sp = spark; import sp.implicits._
    // web: 900 docs × 10 tokens (90%); niche: 100 × 10 (10%)
    val docs = ((0 until 900).map(i => (i.toLong, "a b c d e f g h i j", "en", "web")) ++
      (900 until 1000).map(i => (i.toLong, "a b c d e f g h i j", "en", "niche")))
      .toDF("doc_id", "text", "lang", "source")
    val out = Corpus.temperatureMix(docs).collect()
      .map(r => r.getString(0) -> ((r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    out.values.map(_._1).sum shouldBe 1.0 +- 1e-12
    out.values.map(_._2).sum shouldBe 1.0 +- 1e-12
    val a = Corpus.MixTemperature
    val (pw, pn) = (0.9, 0.1)
    val z = math.pow(pw, a) + math.pow(pn, a)
    out("web")._2 shouldBe (math.pow(pw, a) / z) +- 1e-12
    out("niche")._2 shouldBe (math.pow(pn, a) / z) +- 1e-12
    out("web")._3 should be < 1.0     // head downweighted
    out("niche")._3 should be > 1.0   // tail upweighted
    // temp share still orders by size: flattened, not inverted
    out("web")._2 should be > out("niche")._2
  }

  test("temperature mix: a balanced corpus is a fixed point (weight 1 everywhere)") {
    val sp = spark; import sp.implicits._
    val docs = (0 until 400).map(i =>
      (i.toLong, "a b c d", "en", if (i % 2 == 0) "s1" else "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val out = Corpus.temperatureMix(docs).collect()
    out.foreach(r => r.getDouble(5) shouldBe 1.0 +- 1e-12)
  }

  test("filter ablation: alone vs marginal attribution, and marginal sums equal clean's drops") {
    val sp = spark; import sp.implicits._
    // doc 1: clean keeper; doc 2: exact dup of 1 AND low quality (dup wins
    // marginally); doc 3: repetitive; doc 4: low quality only
    val docs = Seq(
      (1L, good, "en", "web"), (2L, good, "en", "web"),
      (3L, loopy, "en", "web"), (4L, bad, "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val out = Corpus.filterAblation(docs).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(4)))).toMap
    out("duplicate") shouldBe ((1L, 1L))          // doc 2, alone == marginal
    out("repetitive") shouldBe ((1L, 1L))         // doc 3
    // doc 2 (dup+lowq) and doc 4 flagged alone; only doc 4 survives to the gate
    out("low_quality") shouldBe ((2L, 1L))
    // marginal attribution == clean's first-reason ledger, total drops agree
    val dropped = Corpus.clean(docs).where(!org.apache.spark.sql.functions.col("keep")).count()
    out.values.map(_._2).sum shouldBe dropped
  }

  test("kl divergence: a corpus-mirroring source scores near zero, a skewed source far above it") {
    val sp = spark; import sp.implicits._
    val common = "the of and to a in is it you that"
    // mirror: two sources with identical token distributions;
    // skew: a third source speaking a disjoint vocabulary
    val docs = ((0 until 50).map(i => (i.toLong, common, "en", "s1")) ++
      (50 until 100).map(i => (i.toLong, common, "en", "s2")) ++
      (100 until 110).map(i => (i.toLong, "zx qv wk jm", "en", "skew")))
      .toDF("doc_id", "text", "lang", "source")
    val out = Corpus.klDivergence(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // smoothing keeps the mirrored sources slightly above exact zero
    out("s1")._3 should (be >= 0.0 and be < 0.05)
    out("s2")._3 shouldBe out("s1")._3 +- 1e-12   // identical sources, identical score
    out("skew")._3 should be > 1.0                // disjoint vocabulary
    out("s1")._1 shouldBe 500L                    // 50 docs × 10 vocab tokens
    out("skew")._2 shouldBe 4L                    // 4 vocab words present
  }

  test("kl divergence: the vocabulary cap bounds the model (absent-mass closed form still sums to a distribution)") {
    val sp = spark; import sp.implicits._
    // vocabulary wider than the cap: 600 distinct words, each once, plus a
    // head word that dominates so the cap keeps deterministic winners
    val wide = (0 until 600).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, wide, "en", "s1"), (2L, "head head head head", "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val out = Corpus.klDivergence(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // s1 presents at most V vocab words even though it speaks 600
    out("s1")._1 should be <= Corpus.KlVocabSize.toLong
    out.values.foreach(_._2 should be >= 0.0)     // KL is non-negative
  }

  test("pack plan: concat-and-chunk invariants hold per shard") {
    val sp = spark; import sp.implicits._
    // 10 tokens per doc, budget 256: within a shard, doc i starts at 10*i
    val docs = (0L until 400L).map(i => (i, (1 to 10).map(j => s"w$j").mkString(" "), "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val out = Corpus.packPlan(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.length shouldBe 400
    all(out.map(_._4)) should be < Corpus.SeqTokenBudget.toLong // offset bounded
    out.groupBy(_._2).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._1)
      // first doc of every shard opens sequence 0 at offset 0
      ordered.head._3 shouldBe 0L
      ordered.head._4 shouldBe 0L
      // reconstruct: position of doc n = 10 * (rank within shard)
      ordered.zipWithIndex.foreach { case ((_, _, seq, off), idx) =>
        val cum = 10L * idx
        seq shouldBe cum / Corpus.SeqTokenBudget
        off shouldBe cum % Corpus.SeqTokenBudget
      }
    }
  }

  test("end-to-end build: packs exactly the cleaned-and-sampled survivors") {
    val sp = spark; import sp.implicits._
    val docs = ((0 until 300).map(i => (i.toLong, good + s" u$i", "en", "web")) ++
      (300 until 350).map(i => (i.toLong, bad, "en", "web")))
      .toDF("doc_id", "text", "lang", "source")
    val out = Corpus.endToEnd(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val kept = Corpus.clean(docs).where("keep").collect().map(_.getLong(0)).toSet
    val sampled = Corpus.sampleStratified(docs).collect().map(_.getLong(0)).toSet
    out.map(_._1).toSet shouldBe (kept intersect sampled)
    all(out.map(_._4)) should be < Corpus.SeqTokenBudget.toLong
    // low-quality dups never reach the pack stage
    out.map(_._1).toSet.intersect((300L until 350L).toSet) shouldBe empty
  }

  test("decontaminate: flags training docs sharing an 8-gram with the eval split") {
    val evalWords = (1 to 20).map(i => s"e$i")
    // doc 7 is eval (7 % 20 == 7); doc 1 lifts words 5..12 verbatim
    // (one exact 8-gram); doc 2 shares nothing 8 words long
    val leaked = Seq("x1", "x2") ++ evalWords.slice(4, 12) ++ Seq("x3")
    val out = Corpus.decontaminate(docsDf(Seq(
      (7L, evalWords.mkString(" "), "en", "web"),
      (1L, leaked.mkString(" "), "en", "web"),
      (2L, (1 to 15).map(i => s"z$i").mkString(" "), "en", "web"))))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    out.keySet shouldBe Set(1L, 2L) // eval docs are not reported
    out(1L) shouldBe ((1L, true))
    out(2L) shouldBe ((0L, false))
  }

  test("decontaminate: a train doc overlapping a longer span yields multiple hit shingles") {
    val evalWords = (1 to 30).map(i => s"e$i")
    // words 3..14 lifted: twelve tokens contain 12-8+1 = 5 distinct 8-grams
    val out = Corpus.decontaminate(docsDf(Seq(
      (7L, evalWords.mkString(" "), "en", "web"),
      (1L, evalWords.slice(2, 14).mkString(" "), "en", "web"))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out(1L) shouldBe 5L
  }

  test("bloom decontaminate: identical relation to the exact query (no false negatives)") {
    val evalWords = (1 to 30).map(i => s"e$i")
    val docs = docsDf(Seq(
      (7L, evalWords.mkString(" "), "en", "web"),                  // eval
      (1L, evalWords.slice(2, 14).mkString(" "), "en", "web"),     // leaked span
      (2L, (1 to 15).map(i => s"z$i").mkString(" "), "en", "web"), // clean
      (3L, "short", "en", "web")))                                 // no 8-gram at all
    assertSameRows(Corpus.bloomDecontaminate(docs), Corpus.decontaminate(docs))
  }

  test("bloom decontaminate: empty eval split means nothing is contaminated") {
    // no doc_id % 20 == 7 -> empty filter; gate must yield all-false, not crash
    val out = Corpus.bloomDecontaminate(docsDf(Seq(
      (1L, (1 to 12).map(i => s"a$i").mkString(" "), "en", "web"),
      (2L, (1 to 12).map(i => s"b$i").mkString(" "), "en", "web"))))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    out(1L) shouldBe ((0L, false))
    out(2L) shouldBe ((0L, false))
  }

  test("near decontamination: a lightly-edited eval text is flagged with its match") {
    val base = (1 to 30).map(i => s"e$i")
    val out = Corpus.nearDecontaminate(docsDf(Seq(
      (7L, base.mkString(" "), "en", "web"),                       // eval (7 % 20 = 7)
      (1L, base.updated(5, "xx").mkString(" "), "en", "web"),      // near-dup of eval
      (2L, (1 to 30).map(i => s"z$i").mkString(" "), "en", "web")))) // clean
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), r.getBoolean(3)))).toMap
    out.keySet shouldBe Set(1L, 2L) // eval docs are never reported
    out(1L)._1 shouldBe Some(7L)
    out(1L)._2 shouldBe true
    out(2L) shouldBe ((None, false))
  }

  test("fixed-N sample: exactly N, deterministic, insensitive to row order") {
    val rows = (0L until 1000L).map(i => (i, s"doc $i", "en", "web"))
    val a = Corpus.sampleFixedN(docsDf(rows)).collect().map(_.getLong(0)).toSet
    val b = Corpus.sampleFixedN(docsDf(scala.util.Random.shuffle(rows)))
      .collect().map(_.getLong(0)).toSet
    a.size shouldBe Corpus.FixedSampleN
    b shouldBe a // membership depends on content hashes, not input order
    // monotone displacement: an old document that wins among MORE
    // candidates must already have won among fewer — new docs can push
    // winners out but never promote a previously-losing old doc
    val grown = Corpus.sampleFixedN(docsDf(rows ++ (1000L until 1200L)
      .map(i => (i, s"doc $i", "en", "web")))).collect().map(_.getLong(0)).toSet
    grown.filter(_ < 1000L).subsetOf(a) shouldBe true
  }

  test("per-stratum exactly-K: every language gets K rows despite corpus skew") {
    val rows = (0L until 900L).map(i => (i, s"doc $i", "en", "web")) ++   // huge
      (900L until 960L).map(i => (i, s"doc $i", "de", "web")) ++          // medium
      (960L until 1000L).map(i => (i, s"doc $i", "fr", "web"))            // exactly K
    val out = Corpus.sampleStratifiedN(docsDf(rows)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val byLang = out.groupBy(_._1)
    byLang("en").length shouldBe Corpus.PerStratumN
    byLang("de").length shouldBe Corpus.PerStratumN
    byLang("fr").length shouldBe Corpus.PerStratumN // the whole stratum
    byLang("fr").map(_._2).toSet shouldBe (960L until 1000L).toSet
    // ranks dense 1..K per stratum
    byLang.values.foreach(_.map(_._3).sorted.toSeq shouldBe (1 to Corpus.PerStratumN))
  }

  private def word(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")

  test("chunk plan: short docs yield one full-coverage chunk") {
    val out = Corpus.chunkPlan(docsDf(Seq(
      (1L, word(10), "en", "web"),                     // 10 < 64: one chunk
      (2L, word(Corpus.ChunkTokens), "en", "web"))))   // exactly 64: one chunk
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.toSet shouldBe Set((1L, 0L, 0L, 10L), (2L, 0L, 0L, 64L))
  }

  test("chunk plan: strided chunks overlap and the last one reaches the end") {
    // 100 tokens, width 64, stride 48: starts 0 and 48; chunk 1 len 52
    val out = Corpus.chunkPlan(docsDf(Seq((1L, word(100), "en", "web"))))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    out.toSeq shouldBe Seq((0L, 0L, 64L), (1L, 48L, 52L))
    // coverage: last chunk ends exactly at n_tok
    out.last._2 + out.last._3 shouldBe 100L
    // overlap: chunk 1 starts before chunk 0 ends
    out(1)._2 should be < out(0)._2 + out(0)._3
  }

  test("chunk plan: every chunk is within bounds and non-empty at any length") {
    val lens = Seq(1, 47, 48, 49, 63, 64, 65, 96, 97, 200)
    val out = Corpus.chunkPlan(docsDf(lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, word(n), "en", "web") }))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byDoc = out.groupBy(_._1)
    lens.zipWithIndex.foreach { case (n, i) =>
      val chunks = byDoc(i.toLong).sortBy(_._2)
      all(chunks.map(_._4)) should be > 0L
      all(chunks.map(c => c._3 + c._4)) should be <= n.toLong
      chunks.last._3 + chunks.last._4 shouldBe n.toLong // full coverage
      chunks.map(_._2) shouldBe chunks.indices.map(_.toLong) // dense idx
    }
  }

  test("holdout split: deterministic, complete, and stable under corpus growth") {
    val full = docsDf((0L until 400L).map(i => (i, s"doc $i", "en", "web")))
    val out = Corpus.holdoutSplit(full).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    out.keySet should have size 400
    out.values.toSet shouldBe Set("train", "val", "test")
    // ~90/5/5: train dominates by construction
    val n = out.values.groupBy(identity).view.mapValues(_.size).toMap
    n("train") should be > 300
    // growth stability: the same doc gets the same split when scored alone
    // (membership is a pure function of doc_id, never of corpus contents)
    val solo = Corpus.holdoutSplit(docsDf(Seq((17L, "other text", "de", "books"))))
      .collect()(0).getString(2)
    solo shouldBe out(17L)
  }

  test("mix apply: over-represented strata downsample toward target, scarce pass whole") {
    // 90% en / 10% de by tokens: en's target (0.35) => rate ~0.39, de's
    // (0.15) is above its 0.10 share => weight > 1, rate capped at 1
    val docs = docsDf(
      (0L until 180L).map(i => (i, "w w w w w", "en", "web")) ++
        (900L until 920L).map(i => (i, "w w w w w", "de", "web")))
    val out = Corpus.mixApply(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byLang = out.groupBy(_._2)
    // de: weight = .15/.10 = 1.5 capped to rate 1.0 -> every doc kept
    byLang("de").map(_._1).toSet shouldBe (900L until 920L).toSet
    all(byLang("de").map(_._3)) shouldBe 1.0
    // en: rate = .35/.90 ~ 0.389 -> a strict, deterministic subset
    val enRate = byLang("en").head._3
    enRate shouldBe (0.35 / 0.9) +- 1e-12
    val kept = byLang("en").size.toDouble / 180
    kept should (be > enRate - 0.15 and be < enRate + 0.15)
    // deterministic: same keep-set on a re-run
    Corpus.mixApply(docs).collect().map(r => r.getLong(0)).toSet shouldBe
      out.map(_._1).toSet
  }

  test("dsir: an all-target corpus weighs every document exactly zero") {
    // target model == raw model bucket for bucket, so every per-instance
    // log ratio cancels to literal 0.0 — no tolerance needed
    import org.apache.spark.sql.functions.lit
    val out = Corpus.dsirWeightsBy(docsDf(Seq(
      (1L, "aa bb cc", "en", "web"),
      (2L, "bb cc dd", "de", "web"))), lit(true)).collect()
    out.length shouldBe 2
    all(out.map(_.getDouble(2))) shouldBe 0.0
  }

  test("dsir: n_feats counts unigrams plus bigrams") {
    import org.apache.spark.sql.functions.lit
    val out = Corpus.dsirWeightsBy(docsDf(Seq(
      (1L, "aa bb cc", "en", "web"),   // 3 + 2
      (2L, "dd", "en", "web"))), lit(true)).collect() // 1 + 0
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 5L, 2L -> 1L)
  }

  test("dsir: weights separate target-typical from off-target content") {
    // en docs are pure 'aa' runs, de docs pure 'bb' runs; 'aa'/'bb' and
    // their bigrams occupy four DISTINCT buckets (verified offline), so
    // the target model concentrates on the aa-buckets: every en doc must
    // score strictly positive, every de doc strictly negative — and the
    // de side exercises the tc=0 smoothing branch
    val out = Corpus.dsirWeights(docsDf(Seq(
      (1L, "aa aa aa", "en", "web"), (2L, "aa aa aa", "en", "web"),
      (3L, "aa aa aa", "en", "web"),
      (4L, "bb bb bb", "de", "web"), (5L, "bb bb bb", "de", "web"),
      (6L, "bb bb bb", "de", "web"))))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    all(Seq(1L, 2L, 3L).map(out)) should be > 0.0
    all(Seq(4L, 5L, 6L).map(out)) should be < 0.0
  }

  test("dsir probe: the single-doc target leaves buckets empty yet scores all docs") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Corpus.dsirProbe(real).collect()
    out.length shouldBe real.count()
    // doc 0 is the whole target domain: its weight must be strongly
    // positive and near the top (word-soup docs sharing its gram profile
    // can edge past it — the weight is a SUM, not an average — so exact
    // argmax is not guaranteed), while the overwhelming majority of the
    // corpus leans negative against so narrow a target
    val ranked = out.sortBy(-_.getDouble(2))
    val doc0 = out.find(_.getLong(0) == 0L).get.getDouble(2)
    doc0 should be > 0.0
    ranked.indexWhere(_.getLong(0) == 0L) should be < 3
    out.count(_.getDouble(2) < 0) should be > (out.length / 2)
  }

  test("weighted sampling: exact N, A-ES priorities, weight tilts inclusion") {
    val good = (1 to 80).map(i => s"the word$i of thing$i").mkString(" ")
    // 300 docs: even ids carry high-quality text, odd ids a bare stub
    val corpus = (0L until 300L).map(i =>
      (i, if (i % 2 == 0) good else "x", "en", "src"))
    val out = Corpus.sampleWeighted(docsDf(corpus)).collect()
    out.length shouldBe Corpus.WeightedSampleN
    // every priority is ln(u)/w recomputed driver-side
    out.foreach { r =>
      val (id, w, p) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
      val h = graft.functions.MinHashSeeds.h32(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"wsm:$id"))
      val u = (h + 0.5) / 4294967296.0
      p shouldBe BigDecimal(math.log(u) / w)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9
    }
    // weight tilts inclusion: high-quality docs (half the corpus) must
    // take well over half the sample
    val nGood = out.count(_.getLong(0) % 2 == 0)
    nGood should be > 60
    nGood should be < 100 // but low-weight docs still appear (it's WOR sampling, not a cutoff)
  }

  test("epoch shuffle: exact permutation, contiguous shard positions, per-epoch orders") {
    def order(epoch: Int): Seq[Long] =
      Corpus.epochShuffle(docsDf((1L to 40L).map(i => (i, s"t$i", "en", "web"))), epoch)
        .collect().sortBy(r => (r.getLong(1), r.getInt(2))).map(_.getLong(0)).toSeq

    val out = Corpus.epochShuffle(
      docsDf((1L to 40L).map(i => (i, s"t$i", "en", "web")))).collect()
    // a permutation: every doc exactly once, shards within range
    out.map(_.getLong(0)).toSet shouldBe (1L to 40L).toSet
    all(out.map(_.getLong(1))) should (be >= 0L and be < Corpus.NumShards.toLong)
    // positions within each shard are 1..n with no gaps (shard-local replay
    // can trust `pos` as a dense cursor)
    out.groupBy(_.getLong(1)).values.foreach { rows =>
      rows.map(_.getInt(2)).sorted.toSeq shouldBe (1 to rows.length)
    }
    // deterministic per epoch, different across epochs
    order(1) shouldBe order(1)
    order(1) should not be order(2)
  }

  test("dataset card: counts, dup rate, and PII share on a known fixture") {
    val out = Corpus.datasetCard(docsDf(Seq(
      (1L, "the cat sat", "en", "web"),
      (2L, "the cat sat", "en", "web"),          // exact dup of 1
      (3L, "mail me at a@b.co now", "en", "books"),
      (4L, "der hund lief weit weg", "de", "web"))))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    out("n_docs") shouldBe 4.0
    out("n_langs") shouldBe 2.0
    out("n_sources") shouldBe 2.0
    out("total_tokens") shouldBe (3 + 3 + 5 + 5).toDouble
    out("total_chars") shouldBe (11 + 11 + 21 + 22).toDouble
    out("mean_doc_tokens") shouldBe 4.0
    out("exact_dup_rate") shouldBe 0.25 +- 1e-12
    out("pct_pii_docs") shouldBe 0.25 +- 1e-12   // only doc 3's email
    out("mean_quality") should (be > 0.0 and be < 1.0)
    out.size shouldBe 9
  }

  test("length profile: exact power-of-two buckets, shares sum to one") {
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val out = Corpus.lengthProfile(docsDf(Seq(
      (1L, words(1), "en", "w"),    // bucket 1: [1, 2)
      (2L, words(2), "en", "w"),    // bucket 2: [2, 4)
      (3L, words(3), "en", "w"),
      (4L, words(4), "en", "w"),    // bucket 3: [4, 8) — the 2^k edge
      (5L, words(7), "en", "w"),
      (6L, words(8), "en", "w"))))  // bucket 4: [8, 16)
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    out(1) shouldBe ((1L, 1L, 1L, 1.0 / 6))
    out(2) shouldBe ((2L, 2L, 5L, 2.0 / 6))
    out(3) shouldBe ((4L, 2L, 11L, 2.0 / 6))
    out(4) shouldBe ((8L, 1L, 8L, 1.0 / 6))
    out.values.map(_._4).sum shouldBe 1.0 +- 1e-12
  }

  test("token budget: keep == the maximal quality-ordered prefix that fits") {
    val corpus = (1L to 120L).map { i =>
      val uniq = (1 to (i % 13 + 1).toInt).map(j => s"w${i}x$j")
      val stop = Seq.fill((i % 7).toInt)("the")
      (i, (uniq ++ stop).mkString(" "), "en", "web")
    }
    val out = Corpus.tokenBudget(docsDf(corpus), budget = 300L).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getBoolean(3)))
    out.length shouldBe 120
    // reference semantics, recomputed driver-side: sort by (quality desc,
    // doc_id asc), keep exactly the rows whose INCLUSIVE running token
    // mass fits the budget (prefix semantics — the first overflow and
    // everything after it is out, cheaper docs later do not re-enter)
    var cum = 0L
    val expect = out.sortBy { case (id, q, _, _) => (-q, id) }
      .map { case (id, _, tok, _) => cum += tok; id -> (cum <= 300L) }.toMap
    out.foreach { case (id, _, _, k) => assert(k == expect(id), s"doc $id") }
    out.count(_._4) should be > 0
    out.count(!_._4) should be > 0
  }
}
