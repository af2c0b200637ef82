package graft.functions

import java.security.MessageDigest
import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native sketch expressions against independent plain-Scala reference
  * implementations on random inputs — guards the generated-code path (the
  * default under whole-stage codegen) and the interpreted eval against
  * each other and against the spec. */
class SketchesSpec extends SparkSpec {

  private val rnd = new Random(42)

  // independent reference implementations (no shared code with the
  // expressions beyond the P / seed constants they are specified by)
  private def refMd5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def refH32(s: String): Long = java.lang.Long.parseLong(refMd5Hex(s).take(8), 16)
  private def refH60(s: String): Long = java.lang.Long.parseLong(refMd5Hex(s).take(15), 16)

  private def refMinhash(sh: Seq[Long]): Seq[Long] =
    (0 until MinHashSignatures.NumHashes).map { i =>
      if (sh.isEmpty) Long.MaxValue
      else sh.map(h => (MinHashSeeds.a(i) * h + MinHashSeeds.b(i)) % MinHashSeeds.P).min
    }

  private def refSimhash(tokens: Seq[String]): Long =
    (0 until SimHash60.Bits).map { i =>
      val vote = tokens.map(t => if (((refH60(t) >> i) & 1L) == 1L) 1 else -1).sum
      if (vote > 0) 1L << i else 0L
    }.sum

  test("graft_minhash_sig matches the per-seed min reference on random sets") {
    val sp = spark; import sp.implicits._
    val rows = (0 until 100).map { _ =>
      (0 until (1 + rnd.nextInt(60)))
        .map(_ => rnd.nextLong().abs % MinHashSeeds.P)
    }
    val out = sp.createDataset(rows).toDF("sh")
      .select(MinHashSignatures.of(col("sh"))).collect()
      .map(_.getSeq[Long](0))
    out.zip(rows).foreach { case (got, sh) => got shouldBe refMinhash(sh) }
  }

  test("graft_simhash60 matches the voting reference, duplicates counted") {
    val sp = spark; import sp.implicits._
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x", "", "ümlaut", "中文")
    val rows = (0 until 100).map { _ =>
      (0 until (1 + rnd.nextInt(40))).map(_ => vocab(rnd.nextInt(vocab.size)))
    }
    val out = sp.createDataset(rows).toDF("t")
      .select(SimHash60.of(col("t"))).collect().map(_.getLong(0))
    out.zip(rows).foreach { case (got, toks) => got shouldBe refSimhash(toks) }
    all(out) should be >= 0L // 60 bits always fit positive
  }

  test("graft_repetition_stats matches brute-force counting on random token lists") {
    val sp = spark; import sp.implicits._
    val vocab = Vector("a", "b", "c", "d")
    val rows = (0 until 100).map { _ =>
      (0 until rnd.nextInt(30)).map(_ => vocab(rnd.nextInt(vocab.size)))
    }
    def grams(t: Seq[String], k: Int): Seq[String] =
      if (t.size < k) Seq.empty else t.sliding(k).map(_.mkString(" ")).toSeq
    val out = sp.createDataset(rows).toDF("t")
      .select(RepetitionStats.of(col("t")).as("r")).select("r.*").collect()
    out.zip(rows).foreach { case (r, t) =>
      val expDup = if (t.isEmpty) 0.0 else (t.size - t.distinct.size).toDouble / t.size
      val bg = grams(t, 2)
      val expTop = if (bg.isEmpty) 0.0
        else bg.groupBy(identity).values.map(_.size).max.toDouble / bg.size
      val tg = grams(t, 3)
      val expTri = if (tg.isEmpty) 0.0
        else tg.count(g => tg.count(_ == g) >= 2).toDouble / tg.size
      r.getDouble(0) shouldBe expDup
      r.getDouble(1) shouldBe expTop
      r.getDouble(2) shouldBe expTri
    }
  }

  test("h60 drops the low nibble of the 8th digest byte, staying under 2^60") {
    import org.apache.spark.unsafe.types.UTF8String
    val samples = Seq("", "a", "hello world", "中文字符", "x" * 1000)
    samples.foreach { s =>
      val got = MinHashSeeds.h60(UTF8String.fromString(s))
      got shouldBe refH60(s)
      got should (be >= 0L and be < (1L << 60))
    }
  }

  test("graft_hashed_shingles matches the declarative HOF formulation as a sorted set") {
    val sp = spark; import sp.implicits._
    // the declarative form the native expression replaced — and the form
    // every DuckDB oracle mirrors: split(" "), k-gram concat_ws(" "),
    // distinct strings, h32 % P, distinct hashes. The native expression
    // emits the SAME set SORTED ascending (no consumer is
    // order-sensitive; sortedness feeds the merge-based intersect).
    def declarative(text: org.apache.spark.sql.Column, k: Int) =
      array_distinct(transform(graft.operators.Dedup.wordShingles(text, k),
        s => graft.operators.Dedup.h32(s) % MinHashSeeds.P))
    val vocab = Vector("spark", "row", "batch", "", "ümlaut", "中文", "x")
    val texts = (0 until 200).map { _ =>
      (0 until rnd.nextInt(30)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    } ++ Seq("", " ", "  ", "one", "one two", "a  b c", "tail space ")
    for (k <- Seq(1, 3, 8)) {
      val df = sp.createDataset(texts).toDF("text")
      val got = df.select(HashedShingles.of(col("text"), k)).collect()
        .map(_.getSeq[Long](0))
      val exp = df.select(declarative(col("text"), k)).collect()
        .map(_.getSeq[Long](0))
      got.zip(exp).zip(texts).foreach { case ((g, e), t) =>
        withClue(s"k=$k text=${t.take(40)}: ") {
          g shouldBe e.sorted // same set, sorted contract
          g.toSeq shouldBe g.sorted.toSeq
        }
      }
    }
  }

  test("sorted intersect count equals the set-intersection size on random inputs") {
    val sp = spark; import sp.implicits._
    val cases = (1 to 50).map { _ =>
      val a = (0 until rnd.nextInt(60)).map(_ => rnd.nextLong().abs % 100L)
        .distinct.sorted
      val b = (0 until rnd.nextInt(60)).map(_ => rnd.nextLong().abs % 100L)
        .distinct.sorted
      (a, b, a.toSet.intersect(b.toSet).size)
    }
    val out = cases.toDF("a", "b", "expect")
      .select(SortedIntersectCount.of(col("a"), col("b")).as("got"), col("expect"))
      .collect()
    out.foreach(r => r.getInt(0) shouldBe r.getInt(1))
  }

  test("the expressions are SQL-registered via GraftExtensions") {
    val sp = spark
    // injectFunction-based registration happens at session build; register
    // directly here since the shared test session predates the functions
    sp.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash_sig", es => MinHashSignatures(es.head), "scala_udf")
    sp.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash60", es => SimHash60(es.head), "scala_udf")
    sp.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sorted_intersect_count",
      es => SortedIntersectCount(es.head, es(1)), "scala_udf")
    val r = sp.sql(
      "SELECT graft_minhash_sig(array(1L, 2L))[0] AS m, graft_simhash60(array('a')) AS s, " +
        "graft_sorted_intersect_count(array(1L, 3L, 7L), array(3L, 6L, 7L)) AS c")
      .collect()(0)
    r.getLong(0) shouldBe refMinhash(Seq(1L, 2L)).head
    r.getLong(1) shouldBe refSimhash(Seq("a"))
    r.getInt(2) shouldBe 2
  }

  test("checkSorted guard rejects inputs violating the sorted-distinct contract") {
    val sp = spark; import sp.implicits._
    SortedIntersectCount.checkSorted = true
    try {
      // sorted inputs still evaluate under the guard
      Seq((Seq(1L, 2L), Seq(2L, 3L))).toDF("a", "b")
        .select(SortedIntersectCount.of(col("a"), col("b")))
        .collect()(0).getInt(0) shouldBe 1
      // unsorted input → loud failure instead of a silent undercount
      val e = intercept[Exception] {
        Seq((Seq(3L, 1L), Seq(1L, 3L))).toDF("a", "b")
          .select(SortedIntersectCount.of(col("a"), col("b"))).collect()
      }
      val messages = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString("\n")
      messages should include("strictly-ascending")
    } finally SortedIntersectCount.checkSorted = false
  }

  test("sig agreement counts equal positions, codegen and eval paths alike") {
    val sp = spark; import sp.implicits._
    val cases = (1 to 20).map { _ =>
      val n = 128
      val a = Seq.fill(n)(rnd.nextLong().abs % 1000)
      // perturb a random subset so agreement varies across the full range
      val flips = rnd.nextInt(n + 1)
      val idx = rnd.shuffle((0 until n).toList).take(flips).toSet
      val b = a.zipWithIndex.map { case (v, i) => if (idx(i)) v + 1 else v }
      (a, b, a.zip(b).count { case (x, y) => x == y })
    }
    val out = cases.toDF("a", "b", "expect")
      .select(SigAgreement.of(col("a"), col("b")).as("got"), col("expect"))
      .collect()
    out.foreach(r => r.getInt(0) shouldBe r.getInt(1))
    // degenerate: unequal lengths count over the shorter prefix
    val short = Seq((Seq(1L, 2L, 3L), Seq(1L, 9L))).toDF("a", "b")
      .select(SigAgreement.of(col("a"), col("b"))).collect()(0).getInt(0)
    short shouldBe 1
  }
}
