package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val sp = spark; import sp.implicits._
    ConnectedComponents.minLabel(edges.toDF("a", "b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain collapses to one component with min label") {
    cc(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L)) shouldBe
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L)
  }

  test("separate components keep separate labels") {
    cc(Seq(5L -> 2L, 9L -> 7L)) shouldBe
      Map(2L -> 2L, 5L -> 2L, 7L -> 7L, 9L -> 7L)
  }

  test("long path converges (diameter > a couple of rounds)") {
    val path = (1L until 20L).map(i => i -> (i + 1))
    val labels = cc(path)
    labels.values.toSet shouldBe Set(1L)
    labels.keySet shouldBe (1L to 20L).toSet
  }

  test("cycle plus bridge converges to the global min") {
    cc(Seq(10L -> 11L, 11L -> 12L, 12L -> 10L, 12L -> 3L)) shouldBe
      Map(3L -> 3L, 10L -> 3L, 11L -> 3L, 12L -> 3L)
  }

  test("giant star: a 5000-leaf hub (the worst hot key) converges") {
    // the skew shape the scaladoc's AQE note is about: every edge funnels
    // into one root key
    val sp = spark; import sp.implicits._
    val star = (1L to 5000L).map(i => 0L -> i)
    val labels = ConnectedComponents.minLabel(star.toDF("a", "b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    labels.length shouldBe 5001
    labels.map(_._2).distinct.toSeq shouldBe Seq(0L)
  }

  test("deep path: 512 nodes converge within an O(log n) round budget") {
    // label propagation would need ~512 rounds here; the alternating-star
    // contraction must land far under that — the pin that the round count
    // (the 100 TB cost model: one edge shuffle per round) stays
    // logarithmic, not linear in diameter
    val sp = spark; import sp.implicits._
    val path = (1L until 512L).map(i => i -> (i + 1))
    val labels = ConnectedComponents.minLabel(path.toDF("a", "b"), maxIter = 14)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    labels.values.toSet shouldBe Set(1L)
    labels.keySet shouldBe (1L to 512L).toSet
  }
}
