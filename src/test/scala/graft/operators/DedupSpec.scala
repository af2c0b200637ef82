package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Dedup semantics on crafted fixtures: transitive clustering, exact-dup
  * hot-bucket pre-collapse, and the df-cap behavior. */
class DedupSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    val sp = spark; import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  private val words = (0 until 30).map(i => s"w$i")
  private def text(replace: Map[Int, String] = Map.empty): String =
    words.indices.map(i => replace.getOrElse(i, words(i))).mkString(" ")

  // A ~ B (1 token differs, J=25/31≈0.81) and B ~ C (J≈0.81), but
  // A vs C differ in 2 far-apart tokens (J=22/34≈0.65 < 0.7):
  // a true chain — transitive closure must put all three in one cluster.
  private val chain = Seq(
    1L -> text(),
    2L -> text(Map(5 -> "xx")),
    3L -> text(Map(5 -> "xx", 20 -> "yy")))

  test("minhash LSH clusters a similarity chain transitively (A~B~C, A!~C)") {
    val out = Dedup.minhashLsh(docsDf(chain)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    out(1L) shouldBe ((1L, 2L))
    out(2L) shouldBe ((1L, 2L))
    out(3L) shouldBe ((1L, 2L)) // round-1 single-hop would have split C off
  }

  test("quality keeper: the best-quality member wins the cluster, not the min id") {
    // same chain geometry, but doc 3 carries the longest content → highest
    // composite quality (no stopwords/punct anywhere, so quality is purely
    // the length term): it must be the keeper for EVERY member — a plain
    // min-id representative would pick doc 1. The unrelated singleton
    // keeps itself, and an exact-dup pair (identical text → identical
    // quality) falls back to the min-id tiebreak.
    val out = Dedup.qualityKeeper(docsDf(Seq(
      1L -> text(),
      2L -> text(Map(5 -> "xx")),
      3L -> text(Map(5 -> "xx", 20 -> "yyyyyyyyyy")),
      9L -> (0 until 30).map(i => s"z$i").mkString(" "),
      20L -> (0 until 30).map(i => s"p$i").mkString(" "),
      21L -> (0 until 30).map(i => s"p$i").mkString(" "))))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    out(1L) shouldBe ((3L, false))
    out(2L) shouldBe ((3L, false))
    out(3L) shouldBe ((3L, true))
    out(9L) shouldBe ((9L, true))
    out(20L) shouldBe ((20L, true))
    out(21L) shouldBe ((20L, false))
  }

  test("exact-duplicate hot bucket pre-collapses: 200 copies are one LSH vertex") {
    val copies = (10L until 210L).map(_ -> text())
    val nearDup = Seq(500L -> text(Map(5 -> "zz")))
    val unrelated = Seq(900L -> (0 until 30).map(i => s"q$i").mkString(" "))
    val out = Dedup.minhashLsh(docsDf(copies ++ nearDup ++ unrelated)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    out.size shouldBe 202
    // all copies + the near-dup share cluster 10 (min id), 201 members
    out(10L) shouldBe ((10L, 200L))
    out(209L) shouldBe ((10L, 200L))
    out(500L) shouldBe ((10L, 200L))
    out(900L) shouldBe ((900L, 0L))
  }

  test("simhash clusters exact copies and near-identical texts together") {
    val fixture = Seq(
      1L -> text(),
      2L -> text(),                   // exact copy
      3L -> text(Map(5 -> "xx")),     // 1-token change: few bit flips
      9L -> (0 until 30).map(i => s"zz$i").mkString(" "))
    val out = Dedup.simhashDedup(docsDf(fixture)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    out(1L)._1 shouldBe 1L
    out(2L)._1 shouldBe 1L
    out(2L)._2 should be >= 1L
    out(9L) shouldBe ((9L, 0L))
    // exact copies share the simhash value by construction
    val sims = Dedup.simhashDedup(docsDf(fixture)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sims(1L) shouldBe sims(2L)
  }

  test("exact dedup groups identical contents with min-id keeper") {
    val out = Dedup.exact(docsDf(Seq(5L -> "a b c", 2L -> "a b c", 7L -> "d e f")))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    out shouldBe Map(2L -> 2L, 7L -> 1L)
  }

  test("exact probe: collapses a distinct corpus ExactProbeGroup-fold, leader keepers") {
    // 20 distinct docs, dense ids -> 4 groups of 5, keeper = group leader
    val out = Dedup.exactProbe(docsDf((0L until 20L).map(i => i -> s"unique text $i")))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    out shouldBe Map(0L -> 5L, 5L -> 5L, 10L -> 5L, 15L -> 5L)
  }

  test("incremental minhash: incoming docs match the corpus, never each other") {
    // incoming = doc_id % 5 == 0 → {5, 10}; corpus = {1, 2, 3}
    val out = Dedup.minhashLshIncremental(docsDf(Seq(
      1L -> text(Map(5 -> "xx")),                       // corpus near-dup (J≈0.81)
      2L -> text(),                                     // corpus exact copy of 5
      3L -> (0 until 30).map(i => s"c$i").mkString(" "), // unrelated corpus
      5L -> text(),                                     // incoming: best match = 2 (J=1)
      10L -> (0 until 30).map(i => s"q$i").mkString(" ")))) // incoming: no match
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    out.keySet shouldBe Set(5L, 10L) // one row per incoming doc only
    out(5L)._1 shouldBe Some(2L)     // exact copy beats the near-dup
    out(5L)._2 shouldBe Some(1.0)
    out(10L) shouldBe ((None, None))
  }

  test("incremental minhash: a heavily-duplicated corpus content still matches " +
       "(pre-collapsed, no bucket cap-out)") {
    // 70 identical corpus copies (> MaxBandBucket=64) + an incoming exact dup:
    // without the corpus pre-collapse every band bucket would cap out and the
    // incoming doc would silently get no match
    val copies = (1L until 90L).filter(_ % 5 != 0).take(70).map(_ -> text())
    val out = Dedup.minhashLshIncremental(docsDf(copies :+ (5L -> text())))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    out(5L) shouldBe Some(copies.map(_._1).min) // the min-id representative
  }

  test("ngram best-match respects the shingle df cap (solo shingles pair nothing)") {
    val out = Dedup.ngramJaccardBestMatch(docsDf(Seq(
      1L -> text(), 2L -> text(Map(5 -> "xx")),
      9L -> (0 until 30).map(i => s"zz$i").mkString(" "))))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    out(1L) shouldBe Some(2L)
    out(2L) shouldBe Some(1L)
    out(9L) shouldBe None // its shingles appear once: df < 2, no candidates
  }

  test("containment: an excerpt scores 1.0 against its source while Jaccard stays low") {
    val source = (1 to 40).map(i => s"w$i").mkString(" ")        // 38 shingles
    val excerpt = (10 to 19).map(i => s"w$i").mkString(" ")      // 8, all in source
    val out = Dedup.containmentBestMatch(docsDf(Seq(
      1L -> source, 2L -> excerpt,
      9L -> (0 until 30).map(i => s"qq$i").mkString(" "))))
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    out(2L)._1 shouldBe Some(1L)
    out(2L)._2.get.asInstanceOf[Double] shouldBe 1.0           // fully contained
    out(1L)._2.get.asInstanceOf[Double] shouldBe (8.0 / 38.0) +- 1e-12
    out(9L) shouldBe ((None, None))
    // the symmetric measure would have been 8/38 for BOTH directions —
    // the excerpt relationship is only visible asymmetrically
    val jac = Dedup.ngramJaccardBestMatch(docsDf(Seq(1L -> source, 2L -> excerpt)))
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    jac(2L).get.asInstanceOf[Double] shouldBe (8.0 / 38.0) +- 1e-12
  }

  test("chunk-grain passage dedup flags a lifted 64-token window across documents") {
    val passage = (1 to Corpus.ChunkTokens).map(i => s"p$i")
    val tail = (1 to Corpus.ChunkStride).map(i => s"t$i")
    val other = (1 to 20).map(i => s"o$i")
    val out = Dedup.chunkExact(docsDf(Seq(
      1L -> passage.mkString(" "),              // exactly one chunk: the passage
      2L -> (passage ++ tail).mkString(" "),    // chunk 0 = the same passage
      9L -> other.mkString(" "))))              // unrelated short doc
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(3), r.getBoolean(4))))
      .toMap
    out((1L, 0L)) shouldBe ((2L, true))  // the passage occurs in docs 1 and 2
    out((2L, 0L)) shouldBe ((2L, true))
    out((2L, 1L)) shouldBe ((1L, false)) // doc 2's tail window is unique
    out((9L, 0L)) shouldBe ((1L, false))
    // geometry matches corpus_chunk_plan: same chunk count per doc
    val plan = Corpus.chunkPlan(docsDf(Seq(2L -> (passage ++ tail).mkString(" "))))
      .collect()
    plan.length shouldBe out.keys.count(_._1 == 2L)
  }

  test("cluster stats: histogram tiles the clustered corpus exactly") {
    val docs = docsDf(chain)
    val clusters = Dedup.minhashLsh(docs).select("doc_id", "cluster_id")
    val hist = Dedup.clusterStats(clusters).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // independent recount from the cluster table itself
    val expected = clusters.collect().map(_.getLong(1))
      .groupBy(identity).values.map(_.length.toLong)
      .groupBy(identity).map { case (sz, g) => sz -> ((g.size.toLong, sz * g.size)) }
    hist shouldBe expected
    // partition property: histogram doc mass == corpus size
    hist.values.map(_._2).sum shouldBe docs.count()
  }

  test("edit clusters: chains close transitively beyond the pair threshold") {
    val a = "aaa bbb ccc ddd eee fff ggg hhh iii jjj"
    val b = a.replace("eee", "eez").replace("fff", "ffz")   // d(a,b) = 2
    val c = b.replace("ggg", "gqz")                          // d(b,c) = 2
    // d(a,c) = 4 > MaxEditDistance: only the closure links a to c
    val out = Dedup.editDistanceClusters(docsDf(Seq(
      1L -> a, 2L -> b, 3L -> c,
      4L -> "kkk lll mmm nnn ooo ppp qqq rrr sss ttt")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    out(1L) shouldBe ((1L, 2L))
    out(2L) shouldBe ((1L, 2L))
    out(3L) shouldBe ((1L, 2L))
    out(4L) shouldBe ((4L, 0L)) // untouched text: singleton of itself
  }

  test("edit distance: middle/end edits matched, both-ends miss and caps pinned") {
    val tA = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val tC = "kilo lima mike november oscar papa quebec romeo sierra tango"
    val tE = "uniform victor whiskey xray yankee zulu one two three four"
    val tH = "hotel india kilo lima mike november oscar papa"
    val tJ = "juliet kilo lima echo echo echo whiskey tango foxtrot"
    val out = Dedup.editDistanceBestMatch(docsDf(Seq(
      10L -> tA,
      11L -> tA.replace("echo", "ecko"),            // 1 middle edit
      20L -> tC,
      21L -> ("kilt" + tC.drop(4)),                 // 1 edit inside prefix-16
      30L -> tE,                                    // edits in BOTH affixes:
      31L -> ("unzform" + tE.drop(7).dropRight(4) + "fouz"), // documented miss
      40L -> ("g " * 1500),                         // > MaxEditLen: excluded
      50L -> tH,
      51L -> tH.replace("mike november", "mjkz nxvembzr"), // 4 edits > cap
      60L -> tJ,
      61L -> tJ)))                                  // exact dup: distance 0
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getInt(2)))))
      .toMap
    out.size shouldBe 11
    out(10L) shouldBe Some((11L, 1))
    out(11L) shouldBe Some((10L, 1))
    out(20L) shouldBe Some((21L, 1))  // caught via the suffix key
    out(21L) shouldBe Some((20L, 1))
    out(30L) shouldBe None            // recall bound: both ends edited
    out(31L) shouldBe None
    out(40L) shouldBe None            // length gate
    out(50L) shouldBe None            // past the distance cap
    out(51L) shouldBe None
    out(60L) shouldBe Some((61L, 0))
    out(61L) shouldBe Some((60L, 0))
  }

  test("band profile: exact dups pre-collapse; per-band doc mass is the rep count") {
    // 3 distinct texts + 2 verbatim clones -> 3 reps enter the banding
    val out = Dedup.bandProfile(docsDf(Seq(
      1L -> text(), 2L -> text(Map(5 -> "xx")), 3L -> text(Map(20 -> "zz")),
      4L -> text(), 5L -> text()))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    out.length shouldBe Dedup.Bands
    out.foreach { case (_, nBuckets, nDocs, maxB, nPairs, nCapped) =>
      nDocs shouldBe 3L                  // every band sees each rep once
      nBuckets should (be >= 1L and be <= 3L)
      maxB should be <= 3L
      nCapped shouldBe 0L
      // pair mass re-derives from the bucket partition of 3 docs
      nPairs should (be >= 0L and be <= 3L)
    }
  }

  test("threshold histogram: buckets flag exactly the clustering side of 0.7") {
    val out = Dedup.thresholdHistogram(docsDf(chain)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    out.foreach { case (b, n, cl) =>
      b should (be >= 0L and be <= 10L)
      n should be >= 1L
      cl shouldBe (b >= 7L) // the flag is the threshold bucket-edge test
    }
    // the two designed near-dup pairs (J ≈ 0.806) land in the 0.8 bucket
    out.find(_._1 == 8L).map(_._2).getOrElse(0L) should be >= 2L
  }

  test("sig calibration: buckets span the estimator range, near-dups read high") {
    val out = Dedup.sigCalibration(docsDf(chain)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    out.foreach { case (b, n, mj) =>
      b should (be >= 0L and be <= 16L)
      n should be >= 1L
      mj should (be >= 0.0 and be <= 1.0)
    }
    // the designed J≈0.8 chain pairs must populate a high bucket whose
    // mean exact jaccard agrees with the estimate's neighborhood
    val hi = out.filter(_._1 >= 12)
    hi.map(_._2).sum should be >= 2L
    hi.foreach { case (b, _, mj) => mj should be >= (b - 3) * 8.0 / 128 }
  }

  test("source attribution: cross-source copies count against every carrier") {
    val sp = spark; import sp.implicits._
    val out = Dedup.sourceAttribution(Seq(
      (1L, "x", "A"), (2L, "y", "A"), (3L, "x", "B"), (4L, "z", "B"))
      .toDF("doc_id", "text", "source")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    out("A") shouldBe ((2L, 2L, 1L, 0.5))  // doc 1's text recurs in B
    out("B") shouldBe ((2L, 2L, 1L, 0.5))  // doc 3 is the other carrier
  }
}
