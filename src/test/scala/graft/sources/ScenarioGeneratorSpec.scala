package graft.sources

import graft.SparkSpec
import graft.operators.TransitQueries

/** Generator determinism + golden invariants over the generated scenario —
  * the workload shape the reference's producers define (FKs resolve via the
  * recent-routes window; trips copy route fields; orphans from the simple
  * producer). */
class ScenarioGeneratorSpec extends SparkSpec {

  private val routes = ScenarioGenerator.scenarioRoutes(5L, nTicks = 4)
  private val trips = ScenarioGenerator.scenarioTrips(5L, routes, nTrips = 120)

  test("deterministic: same seed, same events") {
    ScenarioGenerator.scenarioRoutes(5L, 4) shouldBe routes
    ScenarioGenerator.scenarioTrips(5L, routes, 120) shouldBe trips
    ScenarioGenerator.scenarioRoutes(6L, 4) should not be routes
  }

  test("scenario trips reference existing routes and copy their fields") {
    val byId = routes.map(r => r.route_id -> r).toMap
    trips should not be empty
    trips.foreach { t =>
      val r = byId(t.route_id) // FK must resolve
      t.transport_type shouldBe r.transport_type
      (t.origin, t.destination) shouldBe ((r.origin, r.destination))
    }
  }

  test("simple trips produce orphan FKs (left-join branches get exercised)") {
    val simple = ScenarioGenerator.simpleTrips(5L, 50)
    val known = routes.map(_.route_id).toSet
    simple.exists(t => !known.contains(t.route_id)) shouldBe true
  }

  test("golden invariants hold on the generated scenario") {
    val rdf = routesDf(routes)
    val tdf = tripsDf(trips)
    val q1 = TransitQueries.q1(rdf).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val q5 = TransitQueries.q5(tdf).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val q4 = TransitQueries.q4(rdf, tdf).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    q5.values.sum shouldBe trips.size.toLong
    q4.foreach { case (rid, occ) =>
      val expected =
        if (q1.getOrElse(rid, 0L) == 0L || !q5.contains(rid)) 0.0
        else q5(rid).toDouble * 100 / q1(rid)
      occ shouldBe expected
    }
    TransitQueries.q9(tdf).collect()(0).getLong(0) shouldBe trips.size.toLong
  }
}
