package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Property-based invariants for the events family over randomized
  * activity patterns: growth accounting is checked against a pure-Scala
  * reference implementation of the new/retained/resurrected/churned
  * decomposition (every flow, every day, exact equality) — stronger than
  * spot fixtures because the generator covers gap shapes, corpus-edge
  * censoring, and single-day users the fixtures would have to enumerate. */
class EventsPropertySpec extends SparkSpec {

  private val UsPerDay = 86400L * 1000000L

  private def eventsDf(rows: Seq[(Long, Long, Long)]): DataFrame = {
    val sp = spark; import sp.implicits._
    rows.map { case (id, ts, u) => (id, ts, u, "view", 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private def run(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8).withWorkers(1), p)
    withClue(res.status.toString)(res.passed shouldBe true)
  }

  test("growth accounting == pure-Scala reference on random activity sets") {
    val gen = for {
      nUsers <- Gen.choose(1, 8)
      daySets <- Gen.listOfN(nUsers, Gen.nonEmptyListOf(Gen.choose(0L, 12L)))
    } yield daySets.zipWithIndex.map { case (ds, u) =>
      u.toLong -> ds.distinct.sorted }
    run(Prop.forAll(gen) { users =>
      val lastDay = users.flatMap(_._2).max
      // reference: walk each user's sorted day list
      val flows = scala.collection.mutable.Map[(Long, String), Long]()
        .withDefaultValue(0L)
      users.foreach { case (_, ds) =>
        ds.zipWithIndex.foreach { case (d, i) =>
          val kind =
            if (i == 0) "new"
            else if (ds(i - 1) == d - 1) "retained"
            else "resurrected"
          flows((d, kind)) += 1
          val next = if (i < ds.size - 1) Some(ds(i + 1)) else None
          if (d < lastDay && next.forall(_ > d + 1))
            flows((d + 1, "churned")) += 1
        }
      }
      var id = 0L
      val rows = users.flatMap { case (u, ds) =>
        ds.map { d => id += 1; (id, d * UsPerDay, u) } }
      val out = Events.growthAccounting(eventsDf(rows)).collect()
        .flatMap { r =>
          Seq("new" -> r.getLong(1), "retained" -> r.getLong(2),
            "resurrected" -> r.getLong(3), "churned" -> r.getLong(4))
            .collect { case (k, n) if n > 0 => (r.getLong(0), k) -> n }
        }.toMap
      out == flows.toMap
    })
  }
}
