package graft.functions

import scala.util.Random

import graft.SparkSpec

/** The Misra-Gries guarantee, directly on the Aggregator (no Spark
  * plan): bounded state, undercount ≤ N/(k+1), no false negatives above
  * the guarantee line — under both streaming reduce and arbitrary
  * pairwise merges. */
class MisraGriesSpec extends SparkSpec {

  private def runReduce(mg: MisraGries, xs: Seq[String]) =
    xs.foldLeft(mg.zero)(mg.reduce)

  test("state never exceeds k, under reduce or merge") {
    val mg = new MisraGries(5)
    val stream = (1 to 500).map(i => s"w${i % 37}")
    val m = runReduce(mg, stream)
    m.size should be <= 5
    val merged = mg.merge(runReduce(mg, stream.take(250)),
      runReduce(mg, stream.drop(250)))
    merged.size should be <= 5
  }

  test("undercount bound and no false negatives over random skewed streams") {
    val rnd = new Random(7)
    for (trial <- 1 to 20) {
      val k = 2 + rnd.nextInt(10)
      val n = 200 + rnd.nextInt(800)
      // zipf-ish skew: item id ~ floor(sqrt(uniform)) compresses the head
      val stream = Seq.fill(n)(s"i${math.sqrt(rnd.nextInt(400)).toInt}")
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val mg = new MisraGries(k)
      // random split points + pairwise merges — merge order must not break
      // the guarantee
      val parts = stream.grouped(1 + rnd.nextInt(n)).toSeq
      val state = parts.map(p => runReduce(mg, p)).reduce(mg.merge)
      state.size should be <= k
      state.foreach { case (i, est) =>
        est should be <= truth(i) // never overcounts
        (truth(i) - est) should be <= (n.toLong / (k + 1)) // bounded undercount
      }
      // any item above N/(k+1) must still hold a counter
      truth.collect { case (i, c) if c > n.toLong / (k + 1) => i }
        .foreach(hh => withClue(s"trial $trial lost $hh:") {
          state.keySet should contain(hh)
        })
    }
  }

  test("finish orders estimate-desc then item-asc") {
    val mg = new MisraGries(4)
    val out = mg.finish(Map("b" -> 3L, "a" -> 3L, "c" -> 9L))
    out.map(_.item) shouldBe Seq("c", "a", "b")
  }
}
