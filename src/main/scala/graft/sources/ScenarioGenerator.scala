package graft.sources

import java.sql.Timestamp

import scala.collection.mutable
import scala.util.Random

import graft.engine.Schemas.{Route, Trip}

/** Deterministic scenario generators mirroring the reference's producers
  * (SURVEY.md §2.3): seeded like `new Random(5)`
  * (`producers/RoutesProducerCenario.java:26`), same field recipes, plus
  * explicit event timestamps (the wire lacks them; windows need them).
  *
  *   - [[scenarioRoutes]]: batches of 5 routes per 2-minute tick, ids
  *     `Route_<counter>`, capacity 50..249, `Operator_0..4`, the 5-type
  *     enum (`RoutesProducerCenario.java:38-55`).
  *   - [[scenarioTrips]]: one trip per 10 s, built FROM a random route in
  *     the recent-100 window so FKs resolve and the trip copies the
  *     route's transportType (`TripsProducerCenario.java:48-78`).
  *   - [[simpleTrips]]: the simple producer — random `Route_0..99` FK that
  *     may be an orphan (`TripsProducer.java:36-40`).
  *
  * Useful properties for tests: referential integrity MOSTLY holds
  * (scenario) but orphans exist (simple); route ids never repeat in the
  * scenario (counter-based) so upsert tests should inject re-emissions
  * explicitly. */
object ScenarioGenerator {

  val TransportTypes: Vector[String] = Vector("Bus", "Taxi", "Train", "Metro", "Scooter")

  private def at(baseMs: Long, offsetS: Long) = new Timestamp(baseMs + offsetS * 1000L)

  /** `nTicks` ticks × 5 routes, one tick per 2 simulated minutes. */
  def scenarioRoutes(seed: Long, nTicks: Int,
                     baseMs: Long = 1704096000000L): Seq[Route] = {
    val rnd = new Random(seed)
    var counter = 1
    (0 until nTicks).flatMap { tick =>
      (0 until 5).map { _ =>
        val r = Route(
          route_id = s"Route_$counter",
          origin = s"Origin_${rnd.nextInt(10)}",
          destination = s"Destination_${rnd.nextInt(10)}",
          transport_type = TransportTypes(rnd.nextInt(TransportTypes.size)),
          capacity = rnd.nextInt(200) + 50,
          operator = s"Operator_${rnd.nextInt(5)}",
          ts = at(baseMs, tick * 120L))
        counter += 1
        r
      }
    }
  }

  /** One trip per 10 simulated seconds, each copying a random recent
    * route's fields (recent = last 100 routes emitted before the trip's
    * timestamp — the producer's sliding window). */
  def scenarioTrips(seed: Long, routes: Seq[Route], nTrips: Int,
                    baseMs: Long = 1704096000000L): Seq[Trip] = {
    val rnd = new Random(seed)
    val recent = mutable.ArrayBuffer.empty[Route]
    var nextRoute = 0
    (1 to nTrips).flatMap { i =>
      val tripTs = at(baseMs, i * 10L)
      while (nextRoute < routes.size && !routes(nextRoute).ts.after(tripTs)) {
        recent += routes(nextRoute)
        if (recent.size > 100) recent.remove(0)
        nextRoute += 1
      }
      if (recent.isEmpty) None
      else {
        val r = recent(rnd.nextInt(recent.size))
        Some(Trip(s"Trip_$i", r.route_id, r.origin, r.destination,
          r.transport_type, s"Passenger_${rnd.nextInt(1000)}", tripTs))
      }
    }
  }

  /** The simple producer: random FK `Route_0..99` — orphans by design. */
  def simpleTrips(seed: Long, nTrips: Int,
                  baseMs: Long = 1704096000000L): Seq[Trip] = {
    val rnd = new Random(seed)
    (1 to nTrips).map { i =>
      Trip(s"Trip_$i", s"Route_${rnd.nextInt(100)}",
        s"Origin_${rnd.nextInt(10)}", s"Destination_${rnd.nextInt(10)}",
        TransportTypes(rnd.nextInt(TransportTypes.size)),
        s"Passenger_${rnd.nextInt(1000)}", at(baseMs, i * 5L))
    }
  }
}
