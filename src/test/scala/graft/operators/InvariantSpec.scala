package graft.operators

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec
import graft.engine.Schemas.{Route, Trip}

/** Property-based cross-query invariants (SURVEY.md §5.4) over randomized
  * small fixtures with nulls, orphans, zero capacities and duplicate keys:
  *   - Σ q5 = #(non-null-route trips); q9 = #trips
  *   - q4 = q5/q1·100 with the 0-guards, per route
  *   - windowed counts partition the per-type counts (q11 vs q10 bases)
  *   - argmax/argmin results are members and extreme
  *   - latestPerKey returns exactly one row per key, the max-ord one
  */
class InvariantSpec extends SparkSpec {

  private val types = Seq("Bus", "Taxi", "Train", "Metro", "Scooter")
  private val base = ts("2024-01-01 00:00:00").getTime

  private val genFixture: Gen[(Seq[Route], Seq[Trip])] = for {
    nR <- Gen.choose(1, 6)
    rAttrs <- Gen.listOfN(nR, Gen.zip(
      Gen.oneOf(types), Gen.oneOf(0, 10, 50, 100), Gen.oneOf("OpA", "OpB")))
    nT <- Gen.choose(0, 25)
    tAttrs <- Gen.listOfN(nT, Gen.zip(
      Gen.frequency(8 -> Gen.choose(1, 8).map("r" + _), 1 -> Gen.const(null: String)),
      Gen.frequency(9 -> Gen.oneOf(types), 1 -> Gen.const(null: String)),
      Gen.frequency(9 -> Gen.choose(1, 5).map("P" + _), 1 -> Gen.const(null: String)),
      Gen.choose(0, 47))) // half-hour slots across one day
  } yield {
    val routes = rAttrs.zipWithIndex.map { case ((ty, cap, op), i) =>
      Route(s"r${i + 1}", "a", "b", ty, cap, op, ts("2024-01-01 09:00:00"))
    }
    val trips = tAttrs.zipWithIndex.map { case ((rid, ty, p, slot), i) =>
      Trip(s"t$i", rid, "a", "b", ty, p, new Timestamp(base + slot * 1800000L))
    }
    (routes, trips)
  }

  private def run(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(6).withWorkers(1), p)
    withClue(res.status.toString)(res.passed shouldBe true)
  }

  test("aggregation invariants hold on randomized fixtures") {
    run(Prop.forAll(genFixture) { case (rs, trs) =>
      val routes = routesDf(rs)
      val trips = tripsDf(trs)

      val q1 = TransitQueries.q1(routes).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val q4 = TransitQueries.q4(routes, trips).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      val q5 = TransitQueries.q5(trips).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val q9 = TransitQueries.q9(trips).collect()(0).getLong(0)
      val q10 = TransitQueries.q10(trips).collect()
      val q11 = TransitQueries.q11(trips).collect()
      val windowed = TransitQueries.windowedTypeCounts(trips).collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2))

      val sumQ5 = Prop(q5.values.sum == trs.count(_.route_id != null)) :| "sum(q5)"
      val q9All = Prop(q9 == trs.size.toLong) :| "q9 counts all"

      // q4 = q5/q1*100 with guards, for every route in the routes table
      val q4Formula = Prop(q4.forall { case (rid, occ) =>
        val cap = q1.getOrElse(rid, 0L)
        val cnt = q5.get(rid)
        val expect =
          if (cap == 0L || cnt.isEmpty) 0.0 else cnt.get.toDouble * 100 / cap
        occ == expect
      }) :| "q4 = q5/q1*100"

      // windowed counts partition the per-type counts (both drop null type;
      // windowed additionally needs non-null ts — generator never makes one)
      val perType = trs.filter(_.transport_type != null)
        .groupBy(_.transport_type).view.mapValues(_.size.toLong).toMap
      val windowSums = windowed.groupBy(_._1._2).view
        .mapValues(_.map(_._2).sum).toMap
      val partition = Prop(windowSums == perType) :| "windows partition types"

      // q10 is a member and maximal
      val q10Prop = Prop(
        if (perType.isEmpty) q10.isEmpty
        else {
          val r = q10(0)
          perType(r.getString(0)) == r.getLong(1) &&
            r.getLong(1) == perType.values.max
        }) :| "q10 argmax"

      // every q11 row is the window's max count
      val perWindow = windowed.groupBy(_._1._1)
      val q11Prop = Prop(q11.forall { r =>
        val inWin = perWindow(r.getTimestamp(0)).map(_._2)
        r.getLong(2) == inWin.max
      } && q11.length == perWindow.size) :| "q11 per-window argmax"

      sumQ5 && q9All && q4Formula && partition && q10Prop && q11Prop
    })
  }

  test("latestPerKey: one row per key, each the max-ord row") {
    run(Prop.forAll(genFixture) { case (_, trs) =>
      val trips = tripsDf(trs)
      val latest = TransitQueries.latestTripPerRoute(trips).collect()
        .map(r => Option(r.getString(1)) -> ((r.getTimestamp(6), r.getString(0))))
      val byKey = trs.groupBy(t => Option(t.route_id))
      val oneRowPerKey = Prop(latest.length == byKey.size) :| "one per key"
      val isMax = Prop(latest.forall { case (k, (t, id)) =>
        val best = byKey(k).map(x => (x.ts.getTime, x.trip_id)).max
        (t.getTime, id) == best
      }) :| "is max ord"
      oneRowPerKey && isMax
    })
  }
}
