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
}
