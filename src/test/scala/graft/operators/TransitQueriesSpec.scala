package graft.operators

import org.apache.spark.sql.DataFrame

import graft.{SparkSpec, TransitFixture}

/** Hand-computed expectations over [[TransitFixture]] — the edge rows TPC-H
  * never produces: orphan trips, zero capacity, null route/passenger/type
  * keys, an exact argmax tie, window-boundary events. */
class TransitQueriesSpec extends SparkSpec {

  lazy val routes: DataFrame = routesDf(TransitFixture.routes)
  lazy val trips: DataFrame = tripsDf(TransitFixture.trips)

  private def asMap1[K](df: DataFrame): Map[K, Any] =
    df.collect().map(r => r.get(0).asInstanceOf[K] -> r.get(1)).toMap

  test("q1: capacity per route, null route key dropped") {
    asMap1[String](TransitQueries.q1(routes)) shouldBe
      Map("r1" -> 100L, "r2" -> 0L, "r3" -> 50L, "r4" -> 80L)
  }

  test("q2: avg passengers per type = trips / distinct routes (orphans count)") {
    asMap1[String](TransitQueries.q2(trips)) shouldBe
      Map("Bus" -> 2.0, "Taxi" -> 1.5) // Bus 4/2; Taxi 3 trips over r3,r9
  }

  test("q3: top passenger with deterministic tiebreak (P1 and P2 tie at 2)") {
    val r = TransitQueries.q3(trips).collect()
    r.length shouldBe 1
    (r(0).getString(0), r(0).getLong(1)) shouldBe ("P1", 2L)
  }

  test("q4: occupancy with zero-capacity and no-trip guards returning 0.0") {
    asMap1[String](TransitQueries.q4(routes, trips)) shouldBe
      Map("r1" -> 4.0, // 4 trips (incl. null-type t8) / 100
          "r2" -> 0.0, // capacity 0 guard
          "r3" -> 4.0, // 2 trips (incl. null-passenger t7) / 50
          "r4" -> 0.0) // no trips guard
  }

  test("q5: passengers per route includes orphan FK routes") {
    asMap1[String](TransitQueries.q5(trips)) shouldBe
      Map("r1" -> 4L, "r2" -> 1L, "r3" -> 2L, "r9" -> 1L)
  }

  test("q6: least-occupied route per type") {
    val r = TransitQueries.q6(routes, trips).collect()
      .map(x => x.getString(0) -> ((x.getString(1), x.getDouble(2)))).toMap
    r shouldBe Map(
      "Bus" -> (("r2", 0.0)), "Taxi" -> (("r3", 4.0)), "Train" -> (("r4", 0.0)))
  }

  test("q7: total capacity drops null-key routes (Kafka Streams groupBy drop)") {
    TransitQueries.q7(routes).collect()(0).getLong(0) shouldBe 230L
  }

  test("q8: total occupancy counts all trips over non-null-key capacity") {
    TransitQueries.q8(routes, trips).collect()(0).getDouble(0) shouldBe
      (9.0 * 100 / 230) +- 1e-12
  }

  test("q9: total passengers counts every trip including null keys") {
    TransitQueries.q9(trips).collect()(0).getLong(0) shouldBe 9L
  }

  test("q10: top transport type counts null-route trips") {
    val r = TransitQueries.q10(trips).collect()(0)
    (r.getString(0), r.getLong(1)) shouldBe ("Bus", 4L)
  }

  test("q11: per-window argmax with 10:59:59 / 11:00:00 boundary split") {
    val r = TransitQueries.q11(trips).collect()
      .map(x => x.getTimestamp(0).toString -> ((x.getString(1), x.getLong(2)))).toMap
    r shouldBe Map(
      "2024-01-01 10:00:00.0" -> (("Bus", 3L)),  // t1,t2,t3 (t3 at 10:59:59)
      "2024-01-01 11:00:00.0" -> (("Taxi", 3L))) // t4 Bus=1, Taxi=3, Metro=1
  }

  test("q12: per-window least-occupied type; missing capacity -> 0.0 guard") {
    val r = TransitQueries.q12(routes, trips).collect()
      .map(x => x.getTimestamp(0).toString -> ((x.getString(1), x.getDouble(2)))).toMap
    // Bus capacity 110 (incl. null-key route's 10: q12 cap side filters only
    // on transport_type, per LeastOccupiedTransportTypeWindow.java:40)
    r("2024-01-01 10:00:00.0")._1 shouldBe "Bus"
    r("2024-01-01 10:00:00.0")._2 shouldBe (3.0 * 100 / 110) +- 1e-12
    r("2024-01-01 11:00:00.0") shouldBe (("Metro", 0.0)) // no Metro capacity
  }

  test("q13: most-occupied operator over intended per-operator sums") {
    val r = TransitQueries.q13(routes, trips).collect()
    r.length shouldBe 1
    r(0).getString(0) shouldBe "OpA" // 5/100 = 5.0 vs OpB 2/130
    r(0).getDouble(1) shouldBe 5.0 +- 1e-12
  }

  test("latestPerKey: latest trip per route by (ts, trip_id)") {
    val r = TransitQueries.latestTripPerRoute(trips).collect()
      .map(x => Option(x.getString(1)).getOrElse("NULL") -> x.getString(0)).toMap
    r shouldBe Map("r1" -> "t8", "r2" -> "t4", "r3" -> "t7", "r9" -> "t6",
      "NULL" -> "t9")
  }

  test("latestPerKey: tiebreak on trip_id when timestamps are equal") {
    import graft.engine.Schemas.Trip
    val same = tripsDf(Seq(
      Trip("a1", "r1", "x", "y", "Bus", "P1", ts("2024-01-01 10:00:00")),
      Trip("a2", "r1", "x", "y", "Bus", "P2", ts("2024-01-01 10:00:00"))))
    val r = TransitQueries.latestTripPerRoute(same).collect()
    r.length shouldBe 1
    r(0).getString(0) shouldBe "a2"
  }

  test("q2 approx variant tracks the exact answer within sketch error") {
    val trips = graft.sources.Tables.trips(spark, "/root/testdata/sf0.01")
    val exact = TransitQueries.q2(trips).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val approx = TransitQueries.q2Approx(trips).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    approx.keySet shouldBe exact.keySet
    exact.foreach { case (k, v) =>
      math.abs(approx(k) - v) / v should be < 0.1 // HLL++ at rsd=2%: ~5 sigma
    }
  }
}
