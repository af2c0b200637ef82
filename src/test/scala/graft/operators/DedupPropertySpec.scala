package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Property-based invariants for the dedup and corpus families over
  * randomized corpora with exact duplicates, near-duplicates, and
  * unrelated documents:
  *   - exact duplicates ALWAYS share a minhash cluster (the pre-collapse
  *     guarantee — no cap or banding parameter can split them);
  *   - cluster labels are the min member id and n_dups = size - 1;
  *   - clean's ledger partitions the corpus (keep ⇔ reason = kept, one
  *     keeper per content);
  *   - the stratified sample is a subset and deterministic.
  */
class DedupPropertySpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    val sp = spark; import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  private val vocabulary = (0 until 40).map(i => s"w$i")

  /** A corpus: some base texts, each replicated 1..4 times under distinct
    * ids, some with a 1-token mutation. */
  private val genCorpus: Gen[Seq[(Long, String)]] = for {
    nBases <- Gen.choose(2, 5)
    specs <- Gen.listOfN(nBases, Gen.zip(
      Gen.choose(0, 9),      // base variant: rotate vocabulary
      Gen.choose(1, 4),      // exact copies
      Gen.oneOf(true, false) // add a near-dup mutation too
    ))
  } yield {
    var id = 0L
    specs.zipWithIndex.flatMap { case ((rot, copies, addNear), i) =>
      val base = (vocabulary.drop(rot) ++ vocabulary.take(rot))
        .updated(5, s"base$i").mkString(" ")
      val exact = (0 until copies).map { _ => id += 1; id -> base }
      val near =
        if (addNear) { id += 1; Seq(id -> base.replace("w20", s"mut$i")) }
        else Nil
      exact ++ near
    }
  }

  private def run(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(5).withWorkers(1), p)
    withClue(res.status.toString)(res.passed shouldBe true)
  }

  test("spanExact: a planted shared block ≥ MinSpanTokens is covered by a span in BOTH docs at any offset; shorter never flags") {
    val K = Dedup.MinSpanTokens
    val gen = for {
      l  <- Gen.choose(K - 10, K + 40)  // straddles the threshold
      o1 <- Gen.choose(0, 25); t1 <- Gen.choose(0, 25)
      o2 <- Gen.choose(0, 25); t2 <- Gen.choose(0, 25)
    } yield (l, o1, t1, o2, t2)
    run(Prop.forAll(gen) { case (l, o1, t1, o2, t2) =>
      // fillers are globally unique, so the planted block is the ONLY
      // duplicated content and straddling grams can never match
      val block = (0 until l).map(i => s"blk$i")
      val a = ((0 until o1).map(i => s"fa$i") ++ block ++
        (0 until t1).map(i => s"ga$i")).mkString(" ")
      val b = ((0 until o2).map(i => s"fb$i") ++ block ++
        (0 until t2).map(i => s"gb$i")).mkString(" ")
      val spans = Dedup.spanExact(docsDf(Seq(1L -> a, 2L -> b))).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(1) + r.getLong(2)))
        .toSeq
      if (l >= K)
        spans.exists { case (d, s, e) => d == 1L && s <= o1 && e >= o1 + l } &&
          spans.exists { case (d, s, e) => d == 2L && s <= o2 && e >= o2 + l }
      else spans.isEmpty
    })
  }

  test("bounded levenshtein kernel == reference DP thresholded, on random pairs") {
    // reference: full O(mn) Wagner-Fischer, then threshold
    def ref(s: String, t: String, k: Int): Int = {
      val dp = Array.tabulate(s.length + 1, t.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to s.length; j <- 1 to t.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      if (dp(s.length)(t.length) <= k) dp(s.length)(t.length) else -1
    }
    // small alphabet forces long common affixes AND near-threshold pairs
    val genStr = for {
      n <- Gen.choose(0, 40)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val genPair = for {
      s <- genStr
      // half the time mutate s a little (the near-dup regime), half
      // independent (the reject regime)
      t <- Gen.oneOf(genStr, for {
        nEdits <- Gen.choose(0, 5)
        edits <- Gen.listOfN(nEdits, Gen.zip(Gen.choose(0, 200), Gen.oneOf('a', 'b', 'x')))
      } yield edits.foldLeft(s) { case (acc, (p, c)) =>
        if (acc.isEmpty) acc + c
        else acc.updated(p % acc.length, c) })
      k <- Gen.choose(0, 6)
    } yield (s, t, k)
    // pure JVM function — no Spark in the loop, so afford 300 cases
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300).withWorkers(1),
      Prop.forAll(genPair) { case (s, t, k) =>
        val got = graft.functions.BoundedLevenshtein.of(s, t, k)
        val want = ref(s, t, k)
        Prop(got == want) :| s"lev('$s','$t',$k): got $got want $want"
      })
    withClue(res.status.toString)(res.passed shouldBe true)
  }

  test("bounded levenshtein grain is UTF-8 BYTES (the oracle's native grain)") {
    // é = 2 UTF-8 bytes: substituting it for 'e' costs 2 byte edits
    // (1 sub + 1 del), exactly what DuckDB levenshtein returns — the
    // round-15 fuzz gate caught the old char-grain kernel returning 1
    graft.functions.BoundedLevenshtein.of("héllo", "hello", 6) shouldBe 2
    // 🚀 = 4 UTF-8 bytes
    graft.functions.BoundedLevenshtein.of("a🚀b", "ab", 6) shouldBe 4
    graft.functions.BoundedLevenshtein.of("中文", "中文", 6) shouldBe 0
    graft.functions.BoundedLevenshtein.of("kitten", "sitting", 6) shouldBe 3 // ASCII: byte == char grain
  }

  test("minhash clusters: exact dups always together, labels minimal, sizes consistent") {
    run(Prop.forAll(genCorpus) { corpus =>
      val out = Dedup.minhashLsh(docsDf(corpus)).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val byText = corpus.groupBy(_._2).values
      val exactTogether = byText.forall(g =>
        g.map(x => out(x._1)._1).distinct.size == 1)
      val byCluster = out.groupBy(_._2._1)
      val labelsMinimal = byCluster.forall { case (cid, m) => m.keys.min == cid }
      val sizes = byCluster.forall { case (_, m) =>
        m.values.forall(_._2 == m.size - 1)
      }
      (Prop(exactTogether) :| "exact dups share a cluster") &&
        (Prop(labelsMinimal) :| "cluster label = min member") &&
        (Prop(sizes) :| "n_dups = size - 1") &&
        (Prop(out.size == corpus.size) :| "one row per doc")
    })
  }

  test("clean ledger: partitions the corpus, exactly one keeper per distinct content") {
    run(Prop.forAll(genCorpus) { corpus =>
      val sp = spark; import sp.implicits._
      val df = corpus.map { case (id, t) => (id, t, "en", "web") }
        .toDF("doc_id", "text", "lang", "source")
      val out = Corpus.clean(df).collect()
        .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
      val keepIffKept = out.values.forall { case (k, r) => k == (r == "kept") }
      val byText = corpus.groupBy(_._2).values
      val oneNonDupPerContent = byText.forall { g =>
        val reasons = g.map(x => out(x._1)._2)
        reasons.count(_ != "duplicate") == 1 &&
          out(g.map(_._1).min)._2 != "duplicate" // the min id is the keeper
      }
      (Prop(keepIffKept) :| "keep ⇔ reason=kept (fixture is high-quality)") &&
        (Prop(oneNonDupPerContent) :| "one keeper per content") &&
        (Prop(out.size == corpus.size) :| "one ledger row per doc")
    })
  }

  test("kl divergence: always ≥ 0, and twin sources with identical content score identically") {
    // random corpora with a TWIN pair: two sources carrying the exact same
    // document multiset must get the same KL (they see the same corpus
    // model and have the same own-distribution), and every score is ≥ 0
    // because model and source distributions normalize over the same
    // smoothed vocabulary support
    val genDocs = for {
      nDocs <- Gen.choose(2, 6)
      texts <- Gen.listOfN(nDocs, Gen.nonEmptyListOf(Gen.choose(0, 12))
        .map(_.map(i => s"w$i").mkString(" ")))
      extra <- Gen.nonEmptyListOf(Gen.choose(0, 39))
    } yield (texts, extra.map(i => s"w$i").mkString(" "))
    run(Prop.forAll(genDocs) { case (twinTexts, otherText) =>
      val sp = spark; import sp.implicits._
      var id = 0L
      val rows =
        twinTexts.flatMap { t => Seq("twinA", "twinB").map { s =>
          id += 1; (id, t, "en", s) } } :+ { id += 1; (id, otherText, "en", "other") }
      val out = Corpus.klDivergence(
          rows.toDF("doc_id", "text", "lang", "source")).collect()
        .map(r => r.getString(0) -> r.getDouble(3)).toMap
      (Prop(out.values.forall(_ >= -1e-12)) :| s"non-negative: $out") &&
        (Prop(math.abs(out("twinA") - out("twinB")) < 1e-12) :|
          s"twins equal: $out")
    })
  }

  test("stratified sample: subset, deterministic, stratum-pure") {
    run(Prop.forAll(Gen.choose(50, 300)) { n =>
      val sp = spark; import sp.implicits._
      val df = (0L until n.toLong)
        .map(i => (i, s"t $i", if (i % 3 == 0) "en" else "de", "web"))
        .toDF("doc_id", "text", "lang", "source")
      val s1 = Corpus.sampleStratified(df).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val s2 = Corpus.sampleStratified(df).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      (Prop(s1 == s2) :| "deterministic") &&
        (Prop(s1.forall { case (id, lang) =>
          id < n && lang == (if (id % 3 == 0) "en" else "de")
        }) :| "subset with original strata")
    })
  }
}
