package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Cross-operator invariants on the real sf0.001 tables: independent
  * operators must agree on the quantities they share — a disagreement
  * means one of them is wrong even when both pass their own oracle. */
class CrossOpInvariantSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, sf)
  private def events = Tables.events(spark, sf)

  test("chunk plan covers exactly token-stats' token count per document") {
    val nTok = TextAnalysis.tokenStats(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val chunks = Corpus.chunkPlan(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    chunks.keySet shouldBe nTok.keySet
    chunks.foreach { case (doc, cs) =>
      val last = cs.maxBy(_._2)
      last._3 + last._4 shouldBe nTok(doc) // full coverage, no overhang
      cs.map(_._2).sorted.toSeq shouldBe cs.indices.map(_.toLong) // dense
    }
  }

  test("anomaly daily counts partition the event stream (vs daily rollup)") {
    val anomalyTotal = Events.dailyAnomaly(events)
      .agg(sum("n_events")).collect()(0).getLong(0)
    // the rollup's grand-total row (both grouping columns null)
    val grand = Events.dailyRollup(events)
      .where(col("day_idx").isNull && col("event_type").isNull)
      .collect()(0).getLong(2)
    anomalyTotal shouldBe grand
    anomalyTotal shouldBe events.count()
  }

  test("wau bounds dau and matches retention's active-day grain") {
    val rows = Events.rollingActives(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    all(rows.map(r => r._3 >= r._2)) shouldBe true // wau >= dau
    // day-0 cohort accounting and wau use the same distinct (user, day)
    // grain: total distinct actives per day from retention offset rows
    val dauDirect = events
      .select(col("user_id"), expr("ts div 86400000000").as("day"))
      .distinct().groupBy("day").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.filter(r => dauDirect.contains(r._1)).foreach { case (day, dau, _) =>
      dau shouldBe dauDirect(day)
    }
  }

  test("growth accounting flows reconcile with wau's stock and retention's cohorts") {
    val growth = Events.growthAccounting(events).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // flow identity: new + retained + resurrected == the day's DAU (the
    // same distinct (user, day) grain wau and retention stand on)
    val dau = events
      .select(col("user_id"), expr("ts div 86400000000").as("day"))
      .distinct().groupBy("day").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    growth.foreach { case (day, (nw, re, rs, _)) =>
      (nw + re + rs) shouldBe dau.getOrElse(day, 0L)
    }
    // stock identity: total news == the user population, and each day's
    // news == retention's cohort size for that cohort day
    val cohorts = Events.retention(events).collect()
      .filter(r => r.getLong(1) == 0L)
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    growth.collect { case (d, (nw, _, _, _)) if nw > 0 => d -> nw } shouldBe cohorts
    growth.values.map(_._1).sum shouldBe events.select("user_id").distinct().count()
    // conservation: every churn ends one activity SPELL, and spells open
    // as news or resurrections (a user can churn repeatedly) — cumulative
    // churn through day D never exceeds cumulative spell-opens before D
    val days = growth.keys.toSeq.sorted
    days.foreach { d =>
      val churnTo = days.filter(_ <= d).map(growth(_)._4).sum
      val opensBefore = days.filter(_ < d).map(g => growth(g)._1 + growth(g)._3).sum
      churnTo should be <= opensBefore
    }
  }

  test("asof click agrees with attribution's latest in-horizon pair") {
    // for every purchase whose attribution pairs are non-empty, the as-of
    // value must equal the latest-click pair's value whenever the as-of
    // click lies inside the horizon (asof looks back unboundedly;
    // attribution cuts at 1h — where both see the same click they must
    // agree on its value)
    val pairs = Events.attribution(events).collect()
      .groupBy(_.getLong(0))
      .map { case (pid, rs) => pid -> rs.maxBy(r => (r.getLong(3), r.getDouble(4))) }
    val asof = Events.asofClickValue(events).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    pairs.nonEmpty shouldBe true // the fixture actually exercises the overlap
    pairs.foreach { case (pid, latest) =>
      withClue(s"purchase $pid: ") {
        asof(pid) shouldBe Some(latest.getDouble(4))
      }
    }
  }

  test("surprisal's token grain agrees with token stats") {
    val nTok = TextAnalysis.tokenStats(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val sup = TextAnalysis.unigramSurprisal(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sup shouldBe nTok
  }

  test("char entropy's character grain agrees with token stats; entropy inside the ceiling") {
    // '.' extracts every character of the newline-free corpus, so the
    // entropy op's n_chars must equal token-stats' length(text) doc-by-doc,
    // and H is bounded by ln(distinct) — the uniform ceiling
    val nChars = TextAnalysis.tokenStats(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ent = TextAnalysis.charEntropy(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    ent.view.mapValues(_._1).toMap shouldBe nChars
    ent.values.foreach { case (_, distinct, h) =>
      h should (be >= 0.0 and be <= math.log(distinct.toDouble) + 1e-9)
    }
  }

  test("zipf head size agrees with the distinct-term count") {
    val r = TextAnalysis.zipf(docs).collect()(0)
    val nTerms = r.getLong(0)
    r.getLong(1) shouldBe math.min(nTerms, TextAnalysis.ZipfTerms.toLong)
    r.getDouble(2) should be < 0.0 // frequencies fall with rank
  }

  test("shard plan masses add up to the whole corpus") {
    val plan = Corpus.shardPlan(docs).collect()
    plan.map(_.getLong(1)).sum shouldBe docs.count()
    val chars = docs.agg(sum("n_chars")).collect()(0).getLong(0)
    plan.map(_.getLong(2)).sum shouldBe chars
  }

  test("pq reconstruction error is bounded by int8's coarser budget only for members") {
    // codebook members reconstruct exactly; everything else pays a positive
    // residual — and the packed code always unpacks to valid codewords
    val rows = Similarity.pqCodes(spark, sf).collect()
    rows.foreach { r =>
      val (id, code, err) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      (0 until Similarity.PqSubspaces).foreach { m =>
        val c = (code >> (4 * m)) & 0xF
        c should (be >= 0L and be < Similarity.PqCodebookSize.toLong)
      }
      if (id < Similarity.PqCodebookSize) err shouldBe 0.0
      else err should be > 0.0
    }
  }

  test("curriculum: phases are ordered by difficulty and cover the corpus") {
    val rows = Corpus.curriculum(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    rows.length shouldBe docs.count()
    rows.map(_._3).toSet shouldBe (1 to Corpus.CurriculumPhases).toSet
    // difficulty ordering: every doc in phase k scores ≤ every doc in k+1
    val byPhase = rows.groupBy(_._3)
    (1 until Corpus.CurriculumPhases).foreach { k =>
      byPhase(k).map(_._2).max should be <= byPhase(k + 1).map(_._2).min
    }
    // quartiles of a mostly-distinct score split roughly evenly
    byPhase.values.foreach { ph =>
      ph.length should be >= (rows.length / Corpus.CurriculumPhases / 2)
    }
  }

  test("hard negatives: never the query's label, never beating the unrestricted top-1") {
    val labels = Tables.embeddings(spark, sf).select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    val hn = Similarity.hardNegatives(spark, sf).collect()
    hn.nonEmpty shouldBe true
    hn.foreach { r =>
      withClue(s"query ${r.getLong(0)} neighbor ${r.getLong(1)}: ") {
        labels(r.getLong(1)) should not be labels(r.getLong(0))
      }
    }
    val cosBest = Similarity.cosineTopK(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getDouble(3)).max).toMap
    hn.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      // ranks dense 1..k, sims non-increasing, constrained best ≤ unrestricted best
      rs.map(_.getInt(2)).sorted.toSeq shouldBe (1 to rs.length)
      val sims = rs.sortBy(_.getInt(2)).map(_.getDouble(3))
      sims.zip(sims.drop(1)).foreach { case (a, b) => a should be >= b }
      sims.head should be <= cosBest(q) + 1e-12
    }
  }

  test("pack apply conserves tokens and fills every non-final sequence to the budget") {
    val seqs = Corpus.packApply(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getString(4)))
    // token conservation: Σ sequence tokens == Σ document tokens
    val corpusTok = TextAnalysis.tokenStats(docs).collect().map(_.getLong(2)).sum
    seqs.map(_._3).sum shouldBe corpusTok
    // packing discipline: within a shard, all but the last sequence carry
    // exactly the budget (zero padding is the point of concat-and-chunk)
    seqs.groupBy(_._1).values.foreach { rs =>
      val lastSeq = rs.map(_._2).max
      rs.filter(_._2 != lastSeq).foreach(_._3 shouldBe Corpus.SeqTokenBudget.toLong)
    }
    // the text really carries n_tokens tokens
    seqs.foreach { case (_, _, n, text) => text.split(" ").length.toLong shouldBe n }
    // and the sequence ids per shard are dense from 0
    seqs.groupBy(_._1).values.foreach { rs =>
      rs.map(_._2).sorted.toSeq shouldBe (0L until rs.length).toSeq
    }
  }

  test("dsir apply resamples the kept mass toward the target domain") {
    val kept = Corpus.dsirApply(docs).collect()
    val weights = Corpus.dsirWeights(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val langs = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    kept.length should be > 0
    kept.length should be < weights.size // something was actually thinned
    // every target-leaning document (log_weight >= 0 -> rate 1) survives
    val keptIds = kept.map(_.getLong(0)).toSet
    weights.filter(_._2 >= 0.0).keys.foreach(id => keptIds should contain(id))
    // rates are exp(log_weight) clipped to 1
    kept.foreach { r =>
      r.getDouble(2) shouldBe math.min(1.0, math.exp(r.getDouble(1))) +- 1e-12
    }
    // the selection moves composition toward the target: kept en-fraction
    // strictly exceeds the raw corpus's en-fraction
    def enFrac(ids: Iterable[Long]) =
      ids.count(langs(_) == Corpus.DsirTargetLang).toDouble / ids.size
    enFrac(keptIds) should be > enFrac(langs.keys)
  }

  test("tokenizer round-trip: frozen merges decode back to the source corpus exactly") {
    // merges are reversible by construction ('_' never occurs in the word
    // alphabet), so replacing every '_' with a space must recover the
    // lowercased source verbatim — including any repeated-space structure
    // (split/join round-trips empty tokens)
    val enc = TextAnalysis.bpeApply(TextAnalysis.bpeMerges(docs), docs)
    val joined = docs.select(col("doc_id"), lower(col("text")).as("orig"))
      .join(enc.select(col("doc_id"),
        replace(col("encoded"), lit("_"), lit(" ")).as("decoded")), "doc_id")
    joined.count() shouldBe docs.count()
    joined.where(col("orig") =!= col("decoded")).count() shouldBe 0L
  }

  test("tokenizer faces agree on the corpus token mass (vocab × encode)") {
    val enc = TextAnalysis.bpeApply(TextAnalysis.bpeMerges(docs), docs)
    val vocab = TextAnalysis.bpeVocabOf(enc)
    // every token instance the encode face emits is counted once by vocab
    vocab.agg(sum("freq")).collect()(0).getLong(0) shouldBe
      enc.agg(sum("n_tokens")).collect()(0).getLong(0)
    // word mass is conserved through merging: Σ freq·n_words == Σ n_words
    vocab.agg(sum(col("freq") * col("n_words"))).collect()(0).getLong(0) shouldBe
      enc.agg(sum("n_words")).collect()(0).getLong(0)
    // and the training-loop vocab face equals the apply-derived one
    assertSameRows(TextAnalysis.bpeVocab(docs), vocab)
  }

  test("hopping cells sum to hops-per-event x the event count (vs rollup grand total)") {
    val hopMass = Events.hoppingCounts(events)
      .agg(sum("n_events")).collect()(0).getLong(0)
    val grand = Events.dailyRollup(events)
      .where(col("day_idx").isNull && col("event_type").isNull)
      .collect()(0).getLong(2)
    hopMass shouldBe grand * (Events.HopWindowMinutes / Events.HopAdvanceMinutes)
  }

  test("scd2 intervals tile each user's change history without overlap") {
    val rows = Events.scd2History(events).collect()
      .map(r => (r.getLong(0), r.getLong(2),
        if (r.isNullAt(3)) Long.MaxValue else r.getLong(3), r.getBoolean(4)))
      .groupBy(_._1)
    rows.foreach { case (_, ivs) =>
      val sorted = ivs.sortBy(_._2)
      sorted.init.zip(sorted.tail).foreach { case (a, b) =>
        a._3 shouldBe b._2 // half-open: each interval closes at the next
      }
      sorted.count(_._4) shouldBe 1       // exactly one current row
      sorted.last._3 shouldBe Long.MaxValue
    }
  }

  test("running ltv's final value per user equals rfm's monetary") {
    val ltv = Events.runningLtv(events)
      .groupBy("user_id").agg(max(struct(col("n_prior_events"), col("ltv_after"))).as("m"))
      .select(col("user_id"), col("m.ltv_after")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rfm = Events.rfm(events).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    rfm.keySet shouldBe ltv.keySet
    rfm.foreach { case (u, m) => ltv(u) shouldBe m +- 1e-9 }
  }

  test("replay dedup preserves the id set and the exact min arrival") {
    val out = Events.replayDedup(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.map(_._3).distinct.toSeq shouldBe Seq(2L) // every id exactly twice
    val orig = events.select("event_id", "ts").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, ts, _) => ts shouldBe orig(id) }
  }

  test("every embedding-dedup pair above its tau appears in the range join") {
    // same banded candidates, lower tau: the range join must contain every
    // pair the dedup verify accepted
    val range = Similarity.rangeSimJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dupPairs = Similarity.pairCosineArtifact(spark, sf)
      .where(col("cosine_sim") >= Similarity.CosDupThreshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (dupPairs -- range) shouldBe empty
  }

  test("collocation pair counts never exceed either unigram count") {
    val rows = TextAnalysis.collocations(docs).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.foreach { case (nxy, nx, ny) =>
      nxy should be <= nx
      nxy should be <= ny
    }
  }

  test("heavy hitters are exactly the top-terms frequency rows above the line") {
    val hh = TextAnalysis.heavyHitters(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // independent exact recount from the raw corpus
    val exact = docs.select(explode(split(lower(col("text")), " ")).as("t"))
      .groupBy("t").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val expected = exact.filter { case (_, c) => c * TextAnalysis.HeavyDenom > n }
    hh shouldBe expected
  }

  test("interarrival's over-gap count is exactly the user's session count minus one") {
    // each gap beyond SessionGapMicros is one session boundary, so
    // n_over_gap + 1 == max(session_seq) for every multi-event user
    val sessions = Events.sessionize(events)
      .groupBy("user_id").agg(max("session_seq").as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gaps = Events.interarrival(events).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    gaps should not be empty
    gaps.foreach { case (u, nOver) => nOver + 1 shouldBe sessions(u) }
  }

  test("skew profile agrees with rfm on the per-user count distribution") {
    val rfm = Events.rfm(events).collect().map(r => r.getLong(2))
    val p = Events.skewProfile(events).collect()(0)
    p.getLong(0) shouldBe rfm.length.toLong      // n_keys == rfm's user count
    p.getLong(1) shouldBe rfm.sum                // n_rows == Σ frequency
    p.getLong(2) shouldBe rfm.max                // max_rows == max frequency
    p.getDouble(3) shouldBe rfm.sum.toDouble / rfm.length // avg
  }

  test("seasonality's weekday masses tile the rollup grand total and the day set") {
    val seas = Events.seasonality(events).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val grand = Events.dailyRollup(events)
      .where(col("day_idx").isNull && col("event_type").isNull)
      .collect()(0).getLong(2)
    seas.map(_._2).sum shouldBe grand            // Σ n_events == all events
    val nDays = events.select(expr("ts div 86400000000").as("d"))
      .distinct().count()
    seas.map(_._1).sum shouldBe nDays            // Σ n_days == distinct days
  }

  test("forecast backtest scores exactly the lag-7-covered days; |bias| never beats mae") {
    val daily = Events.dailyCounts(events).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val coverable = daily.count { case (t, d) => daily.contains((t, d - 7)) }
    val bt = Events.forecastBacktest(events).collect()
    bt.map(_.getLong(1)).sum shouldBe coverable.toLong
    bt.foreach { r =>
      val (mae, bias) = (r.getDouble(2), r.getDouble(4))
      mae should be >= 0.0
      math.abs(bias) should be <= mae + 1e-9 // |Σe| ≤ Σ|e| per type
    }
  }

  test("ab lift's arm totals and conversions recount from first principles") {
    val firsts = events.groupBy("user_id").agg(
        min("ts").as("ft"),
        min(when(col("event_type") === "purchase", col("ts"))).as("fp"))
      .collect().map(r => (r.getLong(0),
        r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val conv = firsts.filter { case (_, ft, fp) =>
      fp.exists(_ <= ft + Events.AbConvHorizonUs) }.map(_._1).toSet
    val r = Events.abLift(events).collect()(0)
    r.getLong(0) shouldBe firsts.count(_._1 % 2 == 0).toLong // n_a
    r.getLong(1) shouldBe firsts.count(_._1 % 2 == 1).toLong // n_b
    r.getLong(2) shouldBe conv.count(_ % 2 == 0).toLong      // conv_a
    r.getLong(3) shouldBe conv.count(_ % 2 == 1).toLong      // conv_b
  }

  test("the duplication histogram tiles the minhash cluster ledger") {
    val clusters = Dedup.minhashLsh(docs).select("doc_id", "cluster_id")
    val hist = Dedup.clusterStats(clusters).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    hist.map(_._3).sum shouldBe docs.count()      // doc mass conserved
    hist.foreach { case (sz, n, nd) => nd shouldBe sz * n }
    // singleton count agrees with the lsh query's own n_dups == 0 rows
    val singles = Dedup.minhashLsh(docs).where(col("n_dups") === 0).count()
    hist.find(_._1 == 1L).map(_._2).getOrElse(0L) shouldBe singles
  }

  test("churn segments partition rfm's users, with consistent recency bucketing") {
    val rfm = Events.rfm(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = rfm.groupBy { case (_, rec, _) =>
      if (rec <= Events.ChurnActiveDays) "active"
      else if (rec <= Events.ChurnAtRiskDays) "at_risk" else "churned"
    }.view.mapValues(g => (g.size.toLong, g.map(_._3).sum)).toMap
    val got = Events.churnSegments(events).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got.view.mapValues(_._1).toMap shouldBe expected.view.mapValues(_._1).toMap
    got.foreach { case (seg, (_, nEvents)) => nEvents shouldBe expected(seg)._2 }
    got.values.map(_._1).sum shouldBe rfm.size.toLong
  }

  test("edit distance zero iff identical text; exact-dup clones always meet") {
    // the synthetic corpus has no exact dups (the exactProbe convention),
    // so clone two short docs — BOTH operators see the same augmented input
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val shortIds = texts.filter(_._2.length <= Dedup.MaxEditLen).keys.take(2).toSeq
    val base = texts.keys.max
    val sp = spark; import sp.implicits._
    val clones = shortIds.zipWithIndex
      .map { case (src, i) => (base + i + 1, texts(src), "en", "web", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val aug = docs.unionByName(clones)
    val augTexts = texts ++ shortIds.zipWithIndex
      .map { case (src, i) => (base + i + 1) -> texts(src) }
    val ed = Dedup.editDistanceBestMatch(aug).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some((r.getLong(1), r.getInt(2))))).toMap
    ed.keySet shouldBe augTexts.keySet // one row per document
    ed.foreach {
      case (id, Some((other, 0))) => augTexts(id) shouldBe augTexts(other)
      case (id, Some((other, d))) if d > 0 =>
        augTexts(id) should not be augTexts(other)
      case _ => ()
    }
    // completeness: every injected clone pair meets at distance zero
    // (identical text shares every block key within the length gate)
    shortIds.zipWithIndex.foreach { case (src, i) =>
      ed(base + i + 1) shouldBe Some((src, 0))
      ed(src).map(_._2) shouldBe Some(0)
    }
  }

  test("MMR rank-1 is exactly the cosine top-1; MMR set stays inside the score order") {
    val top = Similarity.cosineTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(1)))
    val top1 = top.filter(_._2 == 1).map(t => t._1 -> t._3).toMap
    val mmr = Similarity.mmrTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    mmr.filter(_._2 == 1).map(t => t._1 -> t._3).toMap shouldBe top1
    // every MMR pick comes from the relevance-ranked pool
    mmr.groupBy(_._1).size shouldBe Similarity.NumQueryVectors
  }

  test("bot flag agrees with interarrival on per-user gap counts") {
    val gaps = Events.interarrival(events).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bot = Events.botFlag(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    bot.foreach { case (u, n, g) =>
      g shouldBe gaps.getOrElse(u, 0L)
      g shouldBe (n - 1) // gap count is events minus one, per user
    }
    bot.map(_._2).sum shouldBe events.count()
  }

  test("dataset card totals agree with token stats, exact dedup, and the raw scan") {
    val card = Corpus.datasetCard(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    card("n_docs") shouldBe docs.count().toDouble
    val tok = TextAnalysis.tokenStats(docs)
      .agg(sum("n_tokens"), sum("n_chars")).collect()(0)
    card("total_tokens") shouldBe tok.getLong(0).toDouble
    card("total_chars") shouldBe tok.getLong(1).toDouble
    // dup rate from the independent sha-collapse operator (one row per
    // distinct content)
    val distinctContents = Dedup.exact(docs).count()
    card("exact_dup_rate") shouldBe
      (1.0 - distinctContents.toDouble / docs.count()) +- 1e-12
  }

  test("token budget kept mass fits and is maximal; counts match token stats") {
    val out = Corpus.tokenBudget(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getBoolean(3)))
    val nTok = TextAnalysis.tokenStats(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    out.foreach { case (id, _, t, _) => t shouldBe nTok(id) }
    val kept = out.filter(_._4).map(_._3).sum
    kept should be <= Corpus.TokenBudget
    // maximality: the best-quality dropped doc would overflow the budget
    val dropped = out.filterNot(_._4)
    if (dropped.nonEmpty) {
      val next = dropped.maxBy { case (id, q, _, _) => (q, -id) }
      (kept + next._3) should be > Corpus.TokenBudget
    }
  }

  test("mix epochs executes the plan: repeats bracket the weight, downsample face agrees") {
    val weights = Corpus.mixPlan(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(5)).toMap
    val epochs = Corpus.mixEpochs(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    epochs.length shouldBe docs.count()
    epochs.foreach { case (_, lang, w, n) =>
      w shouldBe weights(lang)
      n should (be >= math.floor(w).toLong and be <= math.ceil(w).toLong)
    }
    // for weight <= 1 languages, n_repeats == 1 iff mixApply keeps the doc
    // (same salt, same rule — the two execution faces cannot disagree)
    val kept = Corpus.mixApply(docs).collect().map(_.getLong(0)).toSet
    epochs.filter(e => weights(e._2) <= 1.0).foreach { case (id, _, _, n) =>
      n shouldBe (if (kept(id)) 1L else 0L)
    }
    // upsampled languages always keep every document at least once
    epochs.filter(e => weights(e._2) > 1.0).foreach(_._4 should be >= 1L)
  }

  test("tokenizer fertility re-derives from the encode face's per-doc counts") {
    val enc = TextAnalysis.bpeApply(
      TextAnalysis.trainedMerges(spark, sf), docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(2).toLong, r.getInt(3).toLong)))
      .toMap
    val langOf = docs.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val expected = enc.groupBy { case (id, _) => langOf(id) }
      .map { case (l, g) =>
        l -> ((g.size.toLong, g.values.map(_._1).sum, g.values.map(_._2).sum)) }
    val got = TextAnalysis.bpeFertility(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    got.keySet shouldBe expected.keySet
    got.foreach { case (l, (nd, nt, nw, f)) =>
      (nd, nt, nw) shouldBe expected(l)
      f shouldBe nt.toDouble / nw
      f should (be > 0.0 and be <= 1.0) // word-merge BPE only compresses
    }
  }

  test("lang confusion cells re-derive from langId x labels; rows normalize to 1") {
    val pred = TextAnalysis.langId(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val langOf = docs.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val expected = langOf.toSeq.groupBy { case (id, l) => (l, pred(id)) }
      .view.mapValues(_.size.toLong).toMap
    val cm = TextAnalysis.langConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    cm.map(c => (c._1, c._2) -> c._3).toMap shouldBe expected
    cm.groupBy(_._1).values.foreach { row =>
      row.map(_._4).sum shouldBe 1.0 +- 1e-9
    }
  }

  test("cluster purity agrees with kmeans training on membership counts") {
    val trainSizes = Similarity.kmeansTrain(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val purity = Similarity.clusterPurity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getDouble(4)))
    purity.map(p => p._1 -> p._2).toMap shouldBe trainSizes
    purity.foreach { case (_, n, _, topN, pu) =>
      topN should be <= n
      pu shouldBe topN.toDouble / n
      pu should (be > 0.0 and be <= 1.0)
    }
    purity.map(_._2).sum shouldBe Tables.embeddings(spark, sf).count()
  }

  test("session funnel is monotone and consistent with the user funnel and session stats") {
    val sess = Events.sessionFunnel(events).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    val user = Events.funnel(events).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    // both funnels narrow monotonically
    (1 until 4).foreach { i =>
      sess(i + 1) should be <= sess(i)
      user(i + 1) should be <= user(i)
    }
    // every signing-up user contributes at least one signing-up session
    sess(1) should be >= user(1)
    // no stage can exceed the total session count
    val nSessions = Events.sessionStats(events).count()
    sess.values.foreach(_ should be <= nSessions)
  }

  test("k-anonymity audit partitions the stream; apply suppresses exactly the flagged cells") {
    val audit = Events.kAnonymity(events).collect()
      .map(r => ((r.getString(0), if (r.isNullAt(1)) None else Some(r.getLong(1))),
        (r.getLong(2), r.getLong(3), r.getBoolean(4))))
    audit.map(_._2._2).sum shouldBe events.count() // cells partition events
    audit.foreach { case (_, (users, evs, _)) => users should be <= evs }
    val flaggedMass = audit.filterNot(_._2._3).map(_._2._2).sum
    val applied = Events.kAnonymityApply(events).collect()
    applied.length.toLong shouldBe flaggedMass // apply = exactly the flagged rows
    val flaggedCells = audit.filterNot(_._2._3).map(_._1).toSet
    applied.foreach { r =>
      flaggedCells should contain ((r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    }
  }

  test("epoch shuffle permutes exactly the corpus doc ids") {
    val sh = Corpus.epochShuffle(docs).collect().map(_.getLong(0))
    sh.length shouldBe docs.count()
    sh.toSet shouldBe docs.select("doc_id").collect().map(_.getLong(0)).toSet
  }

  test("novelty gram slots re-derive from token stats; keywords cover every document") {
    val nTok = TextAnalysis.tokenStats(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val nov = TextAnalysis.novelty(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    // every ≥5-token doc appears, with exactly n_tokens−4 gram slots
    nov.map(_._1).toSet shouldBe nTok.filter(_._2 >= 5).keySet
    nov.foreach { case (d, grams, shared) =>
      grams shouldBe nTok(d) - (TextAnalysis.NoveltyN - 1)
      shared should be <= grams
    }
    val kw = TextAnalysis.tfidfKeywords(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // top-K keyword ranks are dense from 1 for every non-empty doc
    kw.groupBy(_._1).values.foreach { rs =>
      rs.map(_._2).sorted.toSeq shouldBe (1L to rs.length.toLong)
    }
    kw.map(_._1).toSet shouldBe nTok.keySet // the fixture has no empty text
  }

  test("streak active-day mass equals retention's and the direct distinct grain") {
    val streakMass = Events.streaks(events)
      .agg(sum("n_active_days")).collect()(0).getLong(0)
    val direct = events
      .select(col("user_id"), expr("ts div 86400000000").as("day"))
      .distinct().count()
    streakMass shouldBe direct
    // retention's Σ n_active over (cohort, offset) cells is the same
    // distinct (user, day) mass counted by cohort instead of by streak
    val retMass = Events.retention(events)
      .agg(sum("n_active")).collect()(0).getLong(0)
    streakMass shouldBe retMass
  }

  test("markov entropy coheres with transitions, the argmax eval, and ln-support bound") {
    val tr = Events.markovTransitions(events).collect()
    val ent = Events.markovEntropy(events).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val nByFrom = tr.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum)
    ent.keySet shouldBe nByFrom.keySet.toSet
    ent.foreach { case (f, (n, _, _)) => n shouldBe nByFrom(f) }
    val total = tr.map(_.getLong(2)).sum.toDouble
    // weighted contributions re-derive from (n_from, h_from) alone
    ent.values.foreach { case (n, h, hc) => hc shouldBe (n / total * h) +- 2e-6 }
    // a state the argmax eval predicts perfectly carries zero entropy
    val acc = Events.markovEval(events).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    ent.foreach { case (f, (_, h, _)) => if (acc(f) == 1.0) h shouldBe 0.0 }
    // and no row exceeds the uniform bound over its support
    val support = tr.groupBy(_.getString(0)).view.mapValues(_.length)
    ent.foreach { case (f, (_, h, _)) =>
      h should be <= math.log(support(f).toDouble) + 1e-9
    }
  }

  test("exact-integer analytics are bit-identical across shuffle parallelism") {
    // the session's exact-arithmetic claims, pinned the way the kmeans
    // float32-rounding claim is: rerun under a different partition count
    // and demand EQUALITY, not tolerance
    def snapshot(): (Double, Set[(String, Option[Double])], Seq[(Long, Long, Long)],
        Seq[(String, Long, Long, Double)]) = (
      Events.gini(events).collect()(0).getDouble(2),
      Corpus.metricCorr(spark, sf).collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet,
      Corpus.kfoldPlan(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq,
      Events.dispersion(events).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(_._1).toSeq)
    val a = snapshot()
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    val b = try {
      spark.conf.set("spark.sql.shuffle.partitions", "3"); snapshot()
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
    b shouldBe a
  }

  test("span-family results are bit-identical across shuffle parallelism") {
    // the r10 suffix-array-grain family: integer positions/hashes through
    // a per-doc window — nothing may depend on how grams were partitioned
    def snapshot(): (Set[(Long, Long, Long, Long, Long)], Seq[Long], Set[(Long, Long, Long)],
        Set[(Long, Long, Long, String)]) = (
      Dedup.spanExact(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet,
      Dedup.spanSavings(docs).collect()(0).toSeq.take(5).map(_.asInstanceOf[Long]),
      Dedup.spanProbeSplit(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet,
      Dedup.spanApply(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet)
    val a = snapshot()
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    val b = try {
      spark.conf.set("spark.sql.shuffle.partitions", "3"); snapshot()
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
    b shouldBe a
  }

  test("span attribution tiles the savings headline source-by-source") {
    // per-source masses must re-aggregate to the one-row headline as
    // exact integers — same covered-position relation, two groupings
    val savings = Dedup.spanSavings(docs).collect()(0)
    val attr = Dedup.spanAttribution(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    attr.map(_._2).sum shouldBe savings.getLong(0) // n_docs
    attr.map(_._3).sum shouldBe savings.getLong(2) // n_spanned_docs
    attr.map(_._4).sum shouldBe savings.getLong(1) // tokens_total
    attr.map(_._5).sum shouldBe savings.getLong(4) // tokens_in_spans
  }

  test("spanApply removes EXACTLY the token mass spanSavings prices, doc-by-doc") {
    // the plan→apply contract at the substring-dedup grain: the rewrite's
    // removed mass must reconcile with the priced union coverage as exact
    // integers — globally AND per document, where the per-doc union mass
    // is re-derived from spanApply's own output (n_tokens - kept tokens)
    val savings = Dedup.spanSavings(docs).collect()(0)
    val applied = Dedup.spanApply(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    applied.map(_._3).sum shouldBe savings.getLong(4) // tokens_in_spans
    applied.map(_._2).sum shouldBe savings.getLong(1) // tokens_total
    applied.count(_._3 > 0) shouldBe savings.getLong(2) // n_spanned_docs
    // reconstruction identity: kept text has exactly n_tokens - n_removed
    // tokens, in original order (spot-checked via token multiset per doc)
    applied.foreach { case (_, nTok, nRem, text) =>
      val kept = if (text.isEmpty) 0 else text.split(" ").length
      kept shouldBe (nTok - nRem)
    }
    // every doc the rewrite left untouched must be byte-identical input
    val untouched = Dedup.spanApply(docs).where(col("n_removed") === 0)
      .join(docs, "doc_id")
      .where(col("text_out") =!= col("text"))
    untouched.count() shouldBe 0L
  }

  test("mixing/accounting wave is bit-identical across shuffle parallelism") {
    // the r10 closing wave's exact-integer outputs (growth flows, gate
    // ablation ledger, coverage masses): bit-equality. The KL doubles are
    // term-wise sums, so a partition-count change may reorder partial
    // sums within ~1 ulp — those are pinned to the oracle's 1e-9 band,
    // which a regression to the cancelling decomposed aggregates (the
    // docstring's warning) would blow by orders of magnitude.
    def snapshot(): (Set[(Long, Long, Long, Long, Long)],
        Set[(Int, String, Long, Long, Long, Long)],
        Set[(String, Long, Long)], Set[(String, Long, Long)]) = (
      Events.growthAccounting(events).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet,
      Corpus.filterAblation(docs).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet,
      Corpus.klDivergence(docs).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet,
      Similarity.embeddingCoverage(spark, sf).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet)
    def klScores(): Map[String, Double] =
      Corpus.klDivergence(docs).collect()
        .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val a = snapshot()
    val ka = klScores()
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    val (b, kb) = try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      (snapshot(), klScores())
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
    b shouldBe a
    kb.keySet shouldBe ka.keySet
    kb.foreach { case (s, v) => v shouldBe ka(s) +- 1e-9 }
  }

  test("dow anomaly's slot means and seasonality's weekly profile stand on the same masses") {
    val dowRows = Events.dowAnomaly(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // the slot mean is exactly the slot's average day count, and every
    // member of a slot carries the same mean
    dowRows.groupBy(r => (r._1, r._3)).foreach { case (_, rows) =>
      val mean = rows.head._5
      mean shouldBe (rows.map(_._4).sum.toDouble / rows.size) +- 1e-9
      all(rows.map(_._5).toSeq) shouldBe mean
    }
    // bucketed by dow and summed over types, the anomaly face's day-grain
    // counts equal seasonality's per-dow event mass — the two weekly
    // views must agree on what a weekday weighs
    val seas = Events.seasonality(events).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    dowRows.groupBy(_._3).view.mapValues(_.map(_._4).sum).foreach {
      case (dow, n) => n shouldBe seas(dow.toInt)
    }
  }

  test("kfold plan partitions the corpus; dim variance audit is well-formed") {
    val folds = Corpus.kfoldPlan(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    folds.map(_._1).toSet.subsetOf((0L until Corpus.KFolds).toSet) shouldBe true
    folds.map(_._2).sum shouldBe docs.count()
    val nTok = TextAnalysis.tokenStats(docs)
      .agg(org.apache.spark.sql.functions.sum("n_tokens")).collect()(0).getLong(0)
    folds.map(_._3).sum shouldBe nTok
    val dims = Similarity.dimVariance(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    dims.map(_._1).toSeq.sorted shouldBe (0L until 64L)
    dims.foreach { case (_, n, mean, variance, mn, mx) =>
      n shouldBe 500L
      variance should be >= -1e-9 // rounding can graze zero from below
      mn should be <= mean
      mx should be >= mean
    }
  }

  test("near-dup attribution masses re-derive from the cluster report") {
    val att = Dedup.nearDupAttribution(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val clusters = Dedup.queries("dedup_minhash_lsh")(spark, sf).collect()
      .map(r => r.getLong(2)) // n_dups per doc
    att.map(_._1).sum shouldBe clusters.length.toLong
    att.map(_._2).sum shouldBe clusters.count(_ > 0).toLong
  }

  test("dedup savings re-derives from the cluster artifact and token stats") {
    val b = Dedup.dedupSavings(spark, sf).collect()(0)
    val clusters = Dedup.queries("dedup_minhash_lsh")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    b.getLong(0) shouldBe clusters.length.toLong
    b.getLong(1) shouldBe clusters.map(_._2).distinct.length.toLong
    b.getLong(2) shouldBe b.getLong(1) // one keeper per cluster
    val nTok = TextAnalysis.tokenStats(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    b.getLong(3) shouldBe nTok.values.sum
    val keepers = clusters.groupBy(_._2).values.map(_.map(_._1).min).toSet
    b.getLong(4) shouldBe keepers.toSeq.map(nTok).sum
    b.getDouble(5) should (be >= 0.0 and be < 1.0)
  }

  test("bpe compression curve: starts at the raw stream, monotone, lands on encode") {
    val rows = TextAnalysis.bpeCompressionCurve(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).sortBy(_._1)
    rows.map(_._1).toSeq shouldBe (0 to TextAnalysis.BpeMergeRounds)
    rows.head._2._2 shouldBe 1.0
    rows.map(_._2._1).toSeq.sliding(2).foreach {
      case Seq(a, b) => b should be <= a
      case _ =>
    }
    // round 0 == the raw whitespace token mass
    val raw = TextAnalysis.tokenStats(docs)
      .agg(sum(col("n_tokens"))).collect()(0).getLong(0)
    rows.head._2._1 shouldBe raw
    // the final prefix == exactly what the registered encode face emits
    val enc = TextAnalysis
      .bpeApply(TextAnalysis.trainedMerges(spark, sf), docs)
      .agg(sum(col("n_tokens").cast("long"))).collect()(0).getLong(0)
    rows.last._2._1 shouldBe enc
  }

  test("shard balance re-derives from the shard plan it summarizes") {
    val plan = Corpus.shardPlan(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val b = Corpus.shardBalance(docs).collect()(0)
    b.getLong(0) shouldBe plan.length.toLong
    b.getLong(1) shouldBe plan.map(_._1).sum
    b.getLong(2) shouldBe plan.map(_._2).min
    b.getLong(3) shouldBe plan.map(_._2).max
    b.getDouble(4) should be >= 1.0 // max can never undercut the mean
  }

  test("metric correlations re-derive exactly from the registered signal queries") {
    val out = Corpus.metricCorr(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    out.keySet shouldBe Set("quality~novelty", "quality~tokens", "novelty~tokens")
    // rebuild the scaled-integer signal table from the independent faces
    val q = TextAnalysis.quality(docs).collect()
      .map(r => r.getLong(0) ->
        math.round(BigDecimal(r.getDouble(3)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6)).toMap
    val nTok = TextAnalysis.tokenStats(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val nov = TextAnalysis.novelty(docs).collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(3) * 1e6)).toMap
    val ids = nov.keySet.toSeq.sorted
    out.values.map(_._1).toSet shouldBe Set(ids.length.toLong)
    def pearson(xs: Seq[Long], ys: Seq[Long]): Option[Double] = {
      val n = xs.length.toDouble
      val num = n * xs.zip(ys).map { case (a, b) => a * b }.sum.toDouble -
        xs.sum.toDouble * ys.sum.toDouble
      val da = n * xs.map(a => a * a).sum.toDouble - xs.sum.toDouble * xs.sum.toDouble
      val db = n * ys.map(b => b * b).sum.toDouble - ys.sum.toDouble * ys.sum.toDouble
      if (da <= 0 || db <= 0) None else Some(num / (math.sqrt(da) * math.sqrt(db)))
    }
    def check(pair: String, xs: Seq[Long], ys: Seq[Long]): Unit =
      (out(pair)._2, pearson(xs, ys)) match {
        case (Some(r), Some(e)) => r shouldBe e +- 1e-6
        case (a, b) => a.isDefined shouldBe b.isDefined
      }
    check("quality~novelty", ids.map(q), ids.map(nov))
    check("quality~tokens", ids.map(q), ids.map(nTok))
    check("novelty~tokens", ids.map(nov), ids.map(nTok))
  }

  test("gini totals agree with the per-user grain; silhouette sizes match purity's") {
    val g = Events.gini(events).collect()(0)
    val perUser = events.groupBy("user_id").count().collect().map(_.getLong(1))
    g.getLong(0) shouldBe perUser.length.toLong
    g.getLong(1) shouldBe perUser.sum
    // independent O(n log n) re-derivation of the ledger's exact-integer S
    val sorted = perUser.sorted
    val s = sorted.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
    val n = sorted.length.toLong; val t = sorted.sum
    val expected = BigDecimal(2.0 * s / (n.toDouble * t.toDouble) -
      (n + 1).toDouble / n.toDouble).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    g.getDouble(2) shouldBe expected +- 1e-9
    val silSizes = Similarity.silhouette(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val puritySizes = Similarity.clusterPurity(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    silSizes shouldBe puritySizes
  }

  test("wau_approx's exact column tiles events_wau day-by-day; its referee is honest") {
    val exact = Events.rollingActives(events).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val approx = Events.rollingActivesApprox(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    approx.map(_._1).toSet shouldBe exact.keySet // same reported days
    approx.foreach { case (day, wau, est, rel) =>
      wau shouldBe exact(day) // the sketch face carries the true wau verbatim
      rel shouldBe math.abs(est - wau) / wau +- 1e-12
    }
  }

  test("bq probe serves the index split: corpus-only neighbors, full k per " +
    "query, cosines bit-equal to hamming_topk on shared pairs") {
    val probe = Similarity.bqProbe(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val whole = Similarity.hammingTopK(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    // every query answered with exactly TopK dense ranks
    probe.groupBy(_._1).foreach { case (_, rows) =>
      rows.map(_._3).sorted.toSeq shouldBe (1 to Similarity.TopK)
    }
    // neighbors come only from the indexed split, never the query set
    all(probe.map(_._2 >= Similarity.NumQueryVectors)) shouldBe true
    // a (query, neighbor) pair ranked by BOTH faces carries the SAME
    // exact-rerank cosine — one shared probeHamming core, one arithmetic
    val shared = probe.filter(p => whole.contains((p._1, p._2)))
    shared should not be empty
    shared.foreach { case (q, n, _, cos) => cos shouldBe whole((q, n)) }
  }

  test("ivf+bq stays inside the probed cells, never beats ivf rank-for-rank, " +
    "and reranks with ivf's exact arithmetic") {
    val out = Similarity.ivfBqTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    // dense ranks for every query
    out.groupBy(_._1).keySet shouldBe (0L until Similarity.NumQueryVectors).toSet
    out.groupBy(_._1).values.foreach { rows =>
      rows.map(_._3).sorted.toSeq shouldBe (1 to Similarity.TopK)
    }
    // IVF membership, re-derived from the raw embeddings: each neighbor's
    // nearest centroid (cosine argmax, tie to min cent_id) must be one of
    // the query's NProbe best centroids — the composition can never leak
    // a candidate the coarse quantizer didn't probe
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val cents = (0L until Similarity.NumCentroids).map(c => c -> vecs(c))
    def assign(id: Long): Long =
      cents.map { case (c, cv) => (c, cos(vecs(id), cv)) }
        .maxBy { case (c, s) => (s, -c) }._1
    def probes(q: Long): Set[Long] =
      cents.map { case (c, cv) => (c, cos(vecs(q), cv)) }
        .sortBy { case (c, s) => (-s, c) }.take(Similarity.NProbe).map(_._1).toSet
    out.foreach { case (q, n, _, _) =>
      withClue(s"query $q neighbor $n: ") {
        probes(q) should contain(assign(n))
      }
    }
    // shared (query, neighbor) pairs carry bit-equal cosines (one rerank
    // arithmetic), and rank-for-rank the BQ-restricted ranking can never
    // beat IVF's exact ranking over the same candidate superset
    val ivf = Similarity.ivfTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val ivfCos = ivf.map(r => ((r._1, r._2), r._4)).toMap
    val shared = out.filter(o => ivfCos.contains((o._1, o._2)))
    shared should not be empty
    shared.foreach { case (q, n, _, c) => c shouldBe ivfCos((q, n)) }
    val ivfByRank = ivf.map(r => ((r._1, r._3), r._4)).toMap
    out.foreach { case (q, _, rk, c) =>
      c should be <= ivfByRank((q, rk)) + 1e-12
    }
  }
}
