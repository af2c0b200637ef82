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
