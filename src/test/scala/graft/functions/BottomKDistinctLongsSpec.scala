package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.util.Random

/** The KMV accumulator's algebra, checked directly (no Spark session):
  * whatever order values arrive in and however the stream is split into
  * merge partitions, the buffer must equal the k smallest DISTINCT
  * values — that identity is exactly why the DuckDB oracle's direct
  * window bottom-K equals Spark's merged per-day sketches. Fixed-seed
  * randomized sweep (the MisraGries spec convention). */
class BottomKDistinctLongsSpec extends AnyFunSuite with Matchers {

  private def expected(xs: Seq[Long], k: Int): Seq[Long] =
    xs.distinct.sorted.take(k)

  test("reduce over any stream yields the k smallest distinct values") {
    val rnd = new Random(42)
    for (_ <- 1 to 300) {
      val k = 1 + rnd.nextInt(8)
      val xs = Seq.fill(rnd.nextInt(60))(rnd.nextInt(50).toLong)
      val agg = new BottomKDistinctLongs(k)
      xs.foldLeft(agg.zero)(agg.reduce).toSeq shouldBe expected(xs, k)
    }
  }

  test("merge of split streams == reduce of the concatenation (mergeability)") {
    val rnd = new Random(43)
    for (_ <- 1 to 300) {
      val k = 1 + rnd.nextInt(8)
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(50).toLong)
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(50).toLong)
      val agg = new BottomKDistinctLongs(k)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      merged.toSeq shouldBe expected(a ++ b, k)
    }
  }

  test("buffer never exceeds k and stays sorted distinct, full-range values") {
    val rnd = new Random(44)
    for (_ <- 1 to 200) {
      val k = 1 + rnd.nextInt(5)
      val xs = Seq.fill(rnd.nextInt(50))(rnd.nextLong())
      val agg = new BottomKDistinctLongs(k)
      val buf = xs.foldLeft(agg.zero)(agg.reduce).toSeq
      buf.size should be <= k
      buf shouldBe buf.distinct.sorted
    }
  }
}
