package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, TransitFixture}
import graft.engine.Schemas.Trip

/** The SURVEY §7.4 replay-mode folds: bit-for-bit reproduction of the
  * reference's non-retractable constant-key aggregates, pinned exactly
  * where they DIVERGE from the registered true-extreme queries — ties
  * keep the first key to reach the value, and a falling metric keeps the
  * stale winner. */
class ReplayFoldSpec extends SparkSpec {

  private def changelog(rows: (Long, String, Double)*): DataFrame = {
    val sp = spark; import sp.implicits._
    rows.toDF("seq", "key", "metric")
  }

  test("tie keeps the incumbent: first key to reach the count wins (strict >)") {
    // b reaches 2 first; a ties at 2 later — the reference keeps b
    // (NamePassengerMostTrips.java:48: newCount > currentCount)
    val out = ReplayFold.runningArgmax(changelog(
      (1L, "a", 1.0), (2L, "b", 1.0), (3L, "b", 2.0), (4L, "a", 2.0)))
      .collect()
    out.map(r => (r.getString(0), r.getDouble(1))).toSeq shouldBe
      Seq(("b", 2.0))
  }

  test("falling metric keeps the stale winner (the non-retractable quirk)") {
    // x peaks at 10 then falls to 1; y sits at 5 the whole time. The
    // true argmax of the FINAL state is y(5); the reference fold stores
    // x(10) forever because nothing strictly beats 10.
    val out = ReplayFold.runningArgmax(changelog(
      (1L, "y", 5.0), (2L, "x", 10.0), (3L, "x", 1.0)))
      .collect()
    out.map(r => (r.getString(0), r.getDouble(1))).toSeq shouldBe
      Seq(("x", 10.0))
  }

  test("empty changelog emits nothing (the empty-seed filter)") {
    ReplayFold.runningArgmax(changelog()).collect() shouldBe empty
  }

  test("latest fold: the newest update wins regardless of metric") {
    val out = ReplayFold.latest(changelog(
      (1L, "big", 99.0), (2L, "small", 1.0))).collect()
    out.map(r => (r.getString(0), r.getDouble(1))).toSeq shouldBe
      Seq(("small", 1.0))
  }

  test("q3 replay == registered q3 winner on the fixture (no tie), reference tie-break on a crafted one") {
    val trips = tripsDf(TransitFixture.trips)
    val replay = ReplayFold.q3Replay(trips).collect()
    replay.map(_.getString(0)).toSeq shouldBe
      Seq(TransitQueries.q3(trips).collect()(0).getString(0))

    // crafted tie: P9 and P8 both end at 2 trips; P9 reaches 2 FIRST.
    // max_by with the registered deterministic (count desc, name asc)
    // order returns P8 — replay mode returns the reference's P9.
    def t(id: String, p: String, s: String) =
      Trip(id, "r1", "a", "b", "Bus", p, Timestamp.valueOf(s))
    val tie = tripsDf(Seq(
      t("t1", "P9", "2024-01-01 10:00:00"), t("t2", "P9", "2024-01-01 10:01:00"),
      t("t3", "P8", "2024-01-01 10:02:00"), t("t4", "P8", "2024-01-01 10:03:00")))
    ReplayFold.q3Replay(tie).collect()(0).getString(0) shouldBe "P9"
    TransitQueries.q3(tie).collect()(0).getString(0) shouldBe "P8"
  }

  test("q11 replay: per-window winners match q11 except ties, which keep first-to-reach") {
    val trips = tripsDf(TransitFixture.trips)
    // the fixture's windows are tie-free: replay == registered
    val replay = ReplayFold.q11Replay(trips).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val reg = TransitQueries.q11(trips).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    replay shouldBe reg

    // crafted within-window tie: Taxi reaches 2 before Bus does; the
    // registered query's (cnt desc, type asc) rank picks Bus
    def t(id: String, ty: String, s: String) =
      Trip(id, "r1", "a", "b", ty, "P1", Timestamp.valueOf(s))
    val tie = tripsDf(Seq(
      t("t1", "Taxi", "2024-01-01 10:00:00"), t("t2", "Taxi", "2024-01-01 10:05:00"),
      t("t3", "Bus", "2024-01-01 10:10:00"), t("t4", "Bus", "2024-01-01 10:15:00")))
    ReplayFold.q11Replay(tie).collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq shouldBe Seq(("Taxi", 2L))
    TransitQueries.q11(tie).collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq shouldBe Seq(("Bus", 2L))
  }

  test("reference seeds compete like incumbents: the max fold's ''-parse (0.0) rejects a first update at 0") {
    // ADVICE r11: the reference's max folds initialize with "" which
    // parses to count 0 under strict newCount > currentCount — a first
    // update with metric <= 0 is rejected there and nothing is emitted.
    ReplayFold.runningArgmax(changelog((1L, "a", 0.0)), seedMetric = 0.0)
      .collect() shouldBe empty
    ReplayFold.runningArgmax(changelog((1L, "a", -3.0)), seedMetric = 0.0)
      .collect() shouldBe empty
    // the generic default face still accepts any first update
    ReplayFold.runningArgmax(changelog((1L, "a", 0.0)))
      .collect().map(_.getString(0)).toSeq shouldBe Seq("a")
    // and a seed rejection leaves the seed standing: 0.4 must still beat 0.0
    ReplayFold.runningArgmax(changelog((1L, "a", -3.0), (2L, "b", 0.4)),
        seedMetric = 0.0)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq shouldBe
      Seq(("b", 0.4))
  }

  test("q10 replay: fixture parity with registered q10; crafted tie keeps first-to-reach") {
    val trips = tripsDf(TransitFixture.trips)
    val replay = ReplayFold.q10Replay(trips).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val reg = TransitQueries.q10(trips).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    replay shouldBe reg // the fixture's global max is tie-free

    // crafted tie (TransportTypeMaxPassengers.java:44: strict >): Taxi
    // reaches 2 before Bus; the registered (count desc, type asc) order
    // picks Bus
    def t(id: String, ty: String, s: String) =
      Trip(id, "r1", "a", "b", ty, "P1", Timestamp.valueOf(s))
    val tie = tripsDf(Seq(
      t("t1", "Taxi", "2024-01-01 10:00:00"), t("t2", "Taxi", "2024-01-01 10:05:00"),
      t("t3", "Bus", "2024-01-01 10:10:00"), t("t4", "Bus", "2024-01-01 10:15:00")))
    ReplayFold.q10Replay(tie).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq shouldBe Seq(("Taxi", 2L))
    TransitQueries.q10(tie).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq shouldBe Seq(("Bus", 2L))
  }

  test("q6 replay: the per-type running-min fold keeps a stale route minimum the registered q6 has moved past") {
    // One Bus type, two routes of capacity 10. Trips arrive: three to A,
    // then one to B — A's occupancy walks 10% -> 20% -> 30%, then B posts
    // 10%. The reference fold (RouteWithLeastOccupancyPerTransportType
    // .java:73-85, seed Double.MAX_VALUE, strict <) accepts A at 10%,
    // rejects every later update (20/30 are higher; B's 10 ties, not
    // strictly lower) — the stored winner is (A, 10%) even though the
    // FINAL state is A:30%, B:10% and the intended min is B.
    import graft.engine.Schemas.Route
    def rt(id: String) =
      Route(id, "a", "b", "Bus", 10, "OP", Timestamp.valueOf("2024-01-01 09:00:00"))
    def t(id: String, r: String, s: String) =
      Trip(id, r, "a", "b", "Bus", "P1", Timestamp.valueOf(s))
    val routes = routesDf(Seq(rt("A"), rt("B")))
    val trips = tripsDf(Seq(
      t("t1", "A", "2024-01-01 10:00:00"), t("t2", "A", "2024-01-01 10:01:00"),
      t("t3", "A", "2024-01-01 10:02:00"), t("t4", "B", "2024-01-01 10:03:00")))
    // the occupancy changelog those arrivals emit for the Bus key,
    // negated for the min-as-argmax replay, reference MIN seed
    val replay = ReplayFold.runningArgmax(changelog(
        (1L, "A", -10.0), (2L, "A", -20.0), (3L, "A", -30.0), (4L, "B", -10.0)),
        seedMetric = -Double.MaxValue)
      .collect().map(r => (r.getString(0), -r.getDouble(1))).toSeq
    replay shouldBe Seq(("A", 10.0)) // stale: A's true occupancy is now 30%
    val reg = TransitQueries.q6(routes, trips).collect()
      .map(r => (r.getString(1), r.getDouble(2))).toSeq
    reg shouldBe Seq(("B", 10.0))    // the intended per-type minimum
  }

  test("q13 replay: the per-operator fold stores the LAST route update, not the operator sum") {
    // Operator OP runs routes A and B (capacity 10 each). Three trips to
    // A, then one to B. The reference's per-operator fold
    // (MostOccupiedOperator.java:109, (k, new, cur) -> newValue) stores
    // whichever route updated LAST — B's 1 trip — so OP's stored
    // occupancy is 1/20; the registered q13 sums routes: 4/20.
    import graft.engine.Schemas.Route
    def rt(id: String) =
      Route(id, "a", "b", "Bus", 10, "OP", Timestamp.valueOf("2024-01-01 09:00:00"))
    def t(id: String, r: String, s: String) =
      Trip(id, r, "a", "b", "Bus", "P1", Timestamp.valueOf(s))
    val routes = routesDf(Seq(rt("A"), rt("B")))
    val trips = tripsDf(Seq(
      t("t1", "A", "2024-01-01 10:00:00"), t("t2", "A", "2024-01-01 10:01:00"),
      t("t3", "A", "2024-01-01 10:02:00"), t("t4", "B", "2024-01-01 10:03:00")))
    // OP's count changelog under latest-fold semantics: each update
    // carries the LAST-UPDATED route's running count
    val replay = ReplayFold.latest(changelog(
      (1L, "OP", 1.0), (2L, "OP", 2.0), (3L, "OP", 3.0), (4L, "OP", 1.0)))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    replay shouldBe Seq(("OP", 1.0)) // B's count — A's three trips forgotten
    val reg = TransitQueries.q13(routes, trips).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    reg shouldBe Seq(("OP", 20.0))   // intended: (3+1)/(10+10) = 20%
  }

  test("running-min replay via negated metric: stale minimum survives a rising occupancy") {
    // occupancy u falls... rises back: 80 -> 20 -> 60. The reference's
    // running-min fold (RouteWithLeastOccupancyPerTransportType.java:73-85)
    // stores 20 forever; the final true value is 60.
    val out = ReplayFold.runningArgmax(changelog(
      (1L, "u", -80.0), (2L, "u", -20.0), (3L, "u", -60.0)))
      .collect()
    out.map(r => (r.getString(0), -r.getDouble(1))).toSeq shouldBe
      Seq(("u", 20.0))
  }
}
