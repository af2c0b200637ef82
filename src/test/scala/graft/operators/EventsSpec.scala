package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Sessionization, funnel, and props-extraction semantics on crafted
  * event streams (ts in epoch-MICROS, as [[graft.sources.Tables.events]]
  * delivers). */
class EventsSpec extends SparkSpec {

  private def us(minutes: Long): Long = minutes * 60L * 1000000L

  private def eventsDf(rows: Seq[(Long, Long, Long, String, Double, String)]): DataFrame = {
    val sp = spark; import sp.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("sessionize: a gap beyond the threshold opens a new session") {
    val out = Events.sessionize(eventsDf(Seq(
      (1L, us(0), 7L, "view", 1.0, "{}"),
      (2L, us(60), 7L, "click", 1.0, "{}"),     // 60min < 120min gap: same session
      (3L, us(300), 7L, "view", 1.0, "{}"),     // 240min gap: new session
      (4L, us(10), 8L, "view", 1.0, "{}"))))    // other user: own numbering
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    out(1L) shouldBe ((1L, true))
    out(2L) shouldBe ((1L, false))
    out(3L) shouldBe ((2L, true))
    out(4L) shouldBe ((1L, true))
  }

  test("retention: users cohort by first active day; offsets count distinct actives") {
    def dus(day: Long, minutes: Long = 0): Long = day * 86400L * 1000000L + us(minutes)
    val out = Events.retention(eventsDf(Seq(
      (1L, dus(0), 1L, "view", 0.0, "{}"),
      (2L, dus(0, 30), 1L, "view", 0.0, "{}"), // same user+day: one active
      (3L, dus(1), 1L, "view", 0.0, "{}"),
      (4L, dus(3), 1L, "view", 0.0, "{}"),
      (5L, dus(0), 2L, "view", 0.0, "{}"),
      (6L, dus(2), 2L, "view", 0.0, "{}"),
      (7L, dus(1), 3L, "view", 0.0, "{}")))) // joins a day later: own cohort
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    out((0L, 0L)) shouldBe ((2L, 2L, 1.0))
    out((0L, 1L)) shouldBe ((1L, 2L, 0.5))
    out((0L, 2L)) shouldBe ((1L, 2L, 0.5))
    out((0L, 3L)) shouldBe ((1L, 2L, 0.5))
    out((1L, 0L)) shouldBe ((1L, 1L, 1.0))
    out.size shouldBe 5
  }

  test("growth accounting: new/retained/resurrected classify active days; churn lands on the first silent day, censored at corpus end") {
    def dus(day: Long): Long = day * 86400L * 1000000L
    // user 1 active days 0,1,3; user 2 active day 1 only; last day = 3
    val out = Events.growthAccounting(eventsDf(Seq(
      (1L, dus(0), 1L, "view", 0.0, "{}"),
      (2L, dus(1), 1L, "view", 0.0, "{}"),
      (3L, dus(3), 1L, "view", 0.0, "{}"),
      (4L, dus(1), 2L, "view", 0.0, "{}"))))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    out(0L) shouldBe ((1L, 0L, 0L, 0L))  // u1 first seen
    out(1L) shouldBe ((1L, 1L, 0L, 0L))  // u2 new, u1 retained
    out(2L) shouldBe ((0L, 0L, 0L, 2L))  // both silent on day 2: churn flow
    out(3L) shouldBe ((0L, 0L, 1L, 0L))  // u1 returns after the gap; no churn
    out.size shouldBe 4                  //   past the last observed day
  }

  test("growth accounting: DAU identity — new + retained + resurrected equals the day's distinct actives") {
    def dus(day: Long): Long = day * 86400L * 1000000L
    val evs = (0L until 60L).map(i =>
      (i, dus(i % 7), i % 5, "view", 0.0, "{}"))
    val out = Events.growthAccounting(eventsDf(evs)).collect()
    val dau = eventsDf(evs).select(
        org.apache.spark.sql.functions.expr("ts div 86400000000").as("day"),
        org.apache.spark.sql.functions.col("user_id"))
      .distinct().groupBy("day").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      (r.getLong(1) + r.getLong(2) + r.getLong(3)) shouldBe dau.getOrElse(r.getLong(0), 0L)
    }
  }

  test("dow anomaly: weekly seasonality is normal within its slot; a masked quiet weekday alarms") {
    def dus(day: Long, i: Long): Long = day * 86400L * 1000000L + i * 60000000L
    // 12 weeks: weekdays 20 events, weekends 2 — plus ONE quiet weekday
    // (day 8, dow 1) at weekend volume
    var id = 0L
    val rows = (0L until 84L).flatMap { d =>
      val n = if (d % 7 == 6 || d == 8L) 2 else 20
      (0 until n).map { i =>
        id += 1; (id, dus(d, i.toLong), id % 50, "view", 0.0, "{}") }
    }
    val dow = Events.dowAnomaly(eventsDf(rows)).collect()
      .map(r => r.getLong(1) -> ((r.getLong(3), r.getDouble(5), r.getBoolean(6)))).toMap
    // the quiet weekday alarms against its OWN slot (z = -sqrt(11))
    dow(8L)._3 shouldBe true
    dow(8L)._2 should be < -3.0
    // weekends are normal among weekends: constant slot, z exactly 0
    dow(6L) shouldBe ((2L, 0.0, false))
    // the raw face is MASKED: weekend variance inflates the pooled sd, so
    // the same day scores under 3 sigma and passes silently
    val raw = Events.dailyAnomaly(eventsDf(rows)).collect()
      .map(r => r.getLong(1) -> ((r.getDouble(4), r.getBoolean(5)))).toMap
    raw(8L)._2 shouldBe false
    math.abs(raw(8L)._1) should be < 3.0
  }

  test("session stats: counts, errors, value mass, duration from the session span") {
    val out = Events.sessionStats(eventsDf(Seq(
      (1L, us(0), 7L, "view", 1.5, "{}"),
      (2L, us(30), 7L, "error", 2.5, "{}"),
      (3L, us(90), 7L, "click", 4.0, "{}"),
      (4L, us(600), 7L, "view", 9.0, "{}"))))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    out((7L, 1L)) shouldBe ((3L, 1L, 8.0, 90 * 60.0))
    out((7L, 2L)) shouldBe ((1L, 0L, 9.0, 0.0))
  }

  test("session sequences: time-ordered journeys, one row per session") {
    val out = Events.sessionSequences(eventsDf(Seq(
      (2L, us(5), 7L, "click", 1.0, "{}"),      // out of id order: ts decides
      (1L, us(0), 7L, "view", 1.0, "{}"),
      (3L, us(30), 7L, "purchase", 1.0, "{}"),
      (4L, us(300), 7L, "view", 1.0, "{}"),     // 240min gap: new session
      (5L, us(0), 8L, "signup", 1.0, "{}"))))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3)))).toMap
    out((7L, 1L)) shouldBe (("view click purchase", 3L))
    out((7L, 2L)) shouldBe (("view", 1L))
    out((8L, 1L)) shouldBe (("signup", 1L))
    out.size shouldBe 3
  }

  test("session sequences: simultaneous events break ties by event_id") {
    val out = Events.sessionSequences(eventsDf(Seq(
      (2L, us(0), 7L, "b", 1.0, "{}"),
      (1L, us(0), 7L, "a", 1.0, "{}"))))
      .collect().map(r => r.getString(2))
    out.toSeq shouldBe Seq("a b")
  }

  test("rfm: recency anchored to the corpus's last event; purchase-only monetary") {
    def dus(day: Long): Long = day * 86400L * 1000000L
    val out = Events.rfm(eventsDf(Seq(
      (1L, dus(0), 7L, "view", 5.0, "{}"),       // views never count as monetary
      (2L, dus(2), 7L, "purchase", 9.5, "{}"),
      (3L, dus(3), 7L, "purchase", 0.5, "{}"),
      (4L, dus(10), 8L, "view", 3.0, "{}"))))    // corpus anchor; no purchases
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    out(7L) shouldBe ((7L, 3L, 10.0))  // last active day 3, anchor day 10
    out(8L) shouldBe ((0L, 1L, 0.0))
  }

  test("markov transitions: session-bounded pairs, row-normalized probabilities") {
    val out = Events.markovTransitions(eventsDf(Seq(
      (1L, us(0), 7L, "view", 0.0, "{}"),
      (2L, us(10), 7L, "click", 0.0, "{}"),
      (3L, us(20), 7L, "view", 0.0, "{}"),
      (4L, us(400), 7L, "view", 0.0, "{}"),      // new session: 3->4 must NOT count
      (5L, us(0), 8L, "view", 0.0, "{}"),
      (6L, us(5), 8L, "purchase", 0.0, "{}"))))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // from 'view': ->click and ->purchase, one each (the session-crossing
    // view->view pair is excluded), so p = 0.5 each
    out(("view", "click")) shouldBe ((1L, 0.5))
    out(("view", "purchase")) shouldBe ((1L, 0.5))
    out(("click", "view")) shouldBe ((1L, 1.0))
    out.size shouldBe 3
  }

  test("top journeys: recurring whole-session paths ranked by count, tiebreak on the path") {
    val rows = Seq(
      (1L, us(0), 1L, "view", 0.0, "{}"), (2L, us(5), 1L, "click", 0.0, "{}"),
      (3L, us(0), 2L, "view", 0.0, "{}"), (4L, us(5), 2L, "click", 0.0, "{}"),
      (5L, us(0), 3L, "signup", 0.0, "{}"))
    val out = Events.topJourneys(eventsDf(rows)).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    out.head shouldBe (("view click", 2L))
    out.toSet should contain(("signup", 1L))
    out.length shouldBe 2
  }

  test("funnel: strict first-occurrence ordering decides the reached stage") {
    val rows =
      // user 1: full ordered funnel
      Seq((1L, us(0), 1L, "signup", 0.0, "{}"), (2L, us(1), 1L, "view", 0.0, "{}"),
        (3L, us(2), 1L, "click", 0.0, "{}"), (4L, us(3), 1L, "purchase", 0.0, "{}")) ++
      // user 2: first purchase BEFORE first click — the click ordering
      // holds (view@1 < click@3) but purchase@2 <= click@3 fails: stage 3
      Seq((5L, us(0), 2L, "signup", 0.0, "{}"), (6L, us(1), 2L, "view", 0.0, "{}"),
        (7L, us(2), 2L, "purchase", 0.0, "{}"), (8L, us(3), 2L, "click", 0.0, "{}")) ++
      // user 3: never signed up: reaches nothing
      Seq((9L, us(0), 3L, "view", 0.0, "{}"))
    val out = Events.funnel(eventsDf(rows)).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    out("signup") shouldBe 2L   // users 1 and 2
    out("view") shouldBe 2L
    out("click") shouldBe 2L
    out("purchase") shouldBe 1L // only user 1 completes in order
  }

  test("value quantiles: interpolated exact percentiles per type") {
    // values 1..5 for 'view': p50 = 3.0, p95 = 4.8, p99 = 4.96
    val rows = (1 to 5).map(i => (i.toLong, us(i), 1L, "view", i.toDouble, "{}"))
    val out = Events.valueQuantiles(eventsDf(rows)).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    out("view")._1 shouldBe 3.0
    out("view")._2 shouldBe 4.8 +- 1e-12
    out("view")._3 shouldBe 4.96 +- 1e-12
  }

  test("daily rollup: per-cell, per-day, and grand-total rows in one pass") {
    val day = 24L * 60
    val rows = Seq(
      (1L, us(1), 1L, "view", 0.0, "{}"),
      (2L, us(2), 1L, "click", 0.0, "{}"),
      (3L, us(day + 1), 1L, "view", 0.0, "{}"))
    val out = Events.dailyRollup(eventsDf(rows)).collect()
      .map(r => (Option(r.get(0)), Option(r.get(1))) -> r.getLong(2)).toMap
    out((Some(0L), Some("view"))) shouldBe 1L // fixture ts counts from epoch
    out((Some(0L), None)) shouldBe 2L         // day-0 subtotal
    out((Some(1L), None)) shouldBe 1L
    out((None, None)) shouldBe 3L             // grand total
  }

  test("as-of join: each purchase carries the most recent prior click value") {
    val out = Events.asofClickValue(eventsDf(Seq(
      (1L, us(0), 7L, "click", 10.0, "{}"),
      (2L, us(5), 7L, "purchase", 99.0, "{}"),  // sees click@0 -> 10.0
      (3L, us(6), 7L, "click", 20.0, "{}"),
      (4L, us(7), 7L, "purchase", 99.0, "{}"),  // sees click@6 -> 20.0
      (5L, us(1), 8L, "purchase", 99.0, "{}"))))// user 8: no click -> null
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    out(2L) shouldBe Some(10.0)
    out(4L) shouldBe Some(20.0)
    out(5L) shouldBe None
  }

  test("props extract: typed value from the JSON column, null on absence") {
    val out = Events.propsExtract(eventsDf(Seq(
      (1L, us(0), 1L, "view", 0.0, """{"k": 42}"""),
      (2L, us(1), 1L, "view", 0.0, """{"other": 1}"""))))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    out(1L) shouldBe Some(42L)
    out(2L) shouldBe None
  }

  test("rolling actives: wau covers the trailing window; stickiness = dau/wau") {
    def dus(day: Long): Long = day * 86400L * 1000000L
    val out = Events.rollingActives(eventsDf(Seq(
      (1L, dus(0), 1L, "view", 0.0, "{}"),
      (2L, dus(0), 1L, "view", 0.0, "{}"),  // same user+day: one active
      (3L, dus(0), 2L, "view", 0.0, "{}"),
      (4L, dus(3), 1L, "view", 0.0, "{}"),
      (5L, dus(20), 3L, "view", 0.0, "{}")))) // isolated burst much later
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    out(0L) shouldBe ((2L, 2L, 1.0))   // both users active day 0
    out(3L) shouldBe ((1L, 2L, 0.5))   // user 1 active; window still sees user 2
    out(6L) shouldBe ((0L, 2L, 0.0))   // nobody active; day-0 pair in window
    out(9L)._2 shouldBe 1L             // only the day-3 activity remains
    out.keySet should not contain 10L  // day-3 activity ages out after day 9
    out(20L) shouldBe ((1L, 1L, 1.0))  // the isolated burst
    out.keySet should not contain 15L  // gap days with empty windows: absent
  }

  test("wau approx: sub-K windows are exact; the estimate referees itself above K") {
    def dus(day: Long): Long = day * 86400L * 1000000L
    // sub-K regime: a handful of users — the sketch holds every hash, so
    // the estimate IS the distinct-hash count and rel_err is 0 exactly
    // (barring a 32-bit hash collision among 3 users: none here)
    val small = Events.rollingActivesApprox(eventsDf(Seq(
      (1L, dus(0), 1L, "view", 0.0, "{}"),
      (2L, dus(0), 2L, "view", 0.0, "{}"),
      (3L, dus(1), 3L, "view", 0.0, "{}"))))
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    small(0L) shouldBe ((2L, 2.0, 0.0))
    small(1L) shouldBe ((3L, 3.0, 0.0))

    // estimation regime: 5000 users per day over 3 days (disjoint
    // thirds overlap pairwise) — window cardinalities ~5000-10000 >> K,
    // so the kth-min estimator actually runs. KMV rsd ≈ 1/√(K−2) ≈ 13%
    // at K=64; pin the referee columns to sane bounds, not luck: every
    // day within 4σ, mean within 2σ.
    var id = 0L
    val rows = for (d <- 0L to 2L; u <- 1L to 5000L) yield {
      id += 1; (id, dus(d), d * 2500L + u, "view", 0.0, "{}")
    }
    val out = Events.rollingActivesApprox(eventsDf(rows))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    out.foreach { case (_, wau, est, rel) =>
      rel shouldBe math.abs(est - wau) / wau +- 1e-12 // the referee column is honest
      rel should be < 4.0 * 0.13
    }
    (out.map(_._4).sum / out.length) should be < 2.0 * 0.13
    // and the exact column agrees with the exact face
    val exact = Events.rollingActives(eventsDf(rows))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    out.foreach { case (day, wau, _, _) => wau shouldBe exact(day) }
  }

  test("conversion lag: first view to first strictly-LATER purchase, else unconverted") {
    val out = Events.conversionLag(eventsDf(Seq(
      (1L, us(10), 1L, "view", 0.0, "{}"),
      (2L, us(40), 1L, "purchase", 9.0, "{}"),   // 30 min after first view
      (3L, us(50), 1L, "purchase", 9.0, "{}"),   // later purchase ignored
      (4L, us(5), 2L, "purchase", 9.0, "{}"),    // pre-view purchase: not a conversion
      (5L, us(9), 2L, "view", 0.0, "{}"),
      (8L, us(40), 2L, "purchase", 9.0, "{}"),   // ...but this one is (31 min)
      (6L, us(3), 3L, "view", 0.0, "{}"),        // never purchases
      (7L, us(8), 4L, "purchase", 9.0, "{}"))))  // never views: excluded
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(3)), r.getBoolean(4)))).toMap
    out.keySet shouldBe Set(1L, 2L, 3L) // user 4 has no view
    out(1L) shouldBe ((Some(1800.0), true))
    // the pre-view purchase must NOT hide the later real conversion
    out(2L) shouldBe ((Some((40 - 9) * 60.0), true))
    out(3L) shouldBe ((None, false))
  }

  test("daily anomaly: a spike day z-scores against the type's own baseline") {
    def dus(day: Long, i: Long): Long = day * 86400L * 1000000L + i * 1000000L
    // 'view': 16 quiet days of 2 events + one day of 22. A single outlier
    // among n identical days z-scores at exactly sqrt(n-1) = 4 here — above
    // the 3.0 band (with only 10 days it would be exactly 3.0: never flagged)
    val quiet = (0L until 16L).flatMap(d =>
      Seq((d * 10 + 1, dus(d, 1)), (d * 10 + 2, dus(d, 2))))
    val spike = (0L until 22L).map(i => (900 + i, dus(16L, i)))
    // 'error': perfectly flat -> variance 0 -> z defined as 0, not NaN
    val flat = (0L until 5L).map(d => (700 + d, dus(d, 3)))
    val rows =
      quiet.map { case (id, t) => (id.toLong, t, 1L, "view", 0.0, "{}") } ++
      spike.map { case (id, t) => (id.toLong, t, 1L, "view", 0.0, "{}") } ++
      flat.map { case (id, t) => (id.toLong, t, 1L, "error", 0.0, "{}") }
    val out = Events.dailyAnomaly(eventsDf(rows))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    val (n9, mean9, z9, flag9) = out(("view", 16L))
    n9 shouldBe 22L
    mean9 shouldBe (54.0 / 17) +- 1e-12 // (16*2 + 22) / 17
    z9 shouldBe 4.0 +- 1e-12 // sqrt(n_days - 1) for a lone outlier
    flag9 shouldBe true
    // quiet days sit below the mean but inside the band
    val (_, _, z0, flag0) = out(("view", 0L))
    z0 should be < 0.0
    flag0 shouldBe false
    // zero-variance type: z pinned to 0, never NaN
    val (_, _, zf, flagf) = out(("error", 0L))
    zf shouldBe 0.0
    flagf shouldBe false
  }

  test("anomaly probe: the spiked first day flags, its flat neighbors do not") {
    def dus(day: Long, m: Long) = day * 86400L * 1000000L + us(m)
    // 18 flat days, one event each: the 5x spike on day 0 must stand out
    val out = Events.anomalyProbe(eventsDf((0L until 18L).map(d =>
      (d, dus(d, d), 1L, "view", 0.0, "{}"))))
      .collect().map(r => r.getLong(1) -> r.getBoolean(5)).toMap
    out(0L) shouldBe true
    (1L until 18L).foreach(out(_) shouldBe false)
  }

  test("hopping: each event lands in window/advance overlapping windows") {
    // advance 15min, size 60min -> 4 hops per event
    val out = Events.hoppingCounts(eventsDf(Seq(
      (1L, us(0), 7L, "view", 1.0, "{}"),
      (2L, us(20), 8L, "view", 2.0, "{}"))))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // event@0 -> starts {-45,-30,-15,0}min; event@20 -> starts {-30,-15,0,15}
    out(us(-45)) shouldBe ((1L, 1.0))
    out(us(-30)) shouldBe ((2L, 3.0))
    out(us(-15)) shouldBe ((2L, 3.0))
    out(us(0)) shouldBe ((2L, 3.0))
    out(us(15)) shouldBe ((1L, 2.0))
    out.size shouldBe 5
  }

  test("scd2: equal-value runs compact to half-open intervals, last one current") {
    def p(k: Long) = s"""{"k": $k}"""
    val out = Events.scd2History(eventsDf(Seq(
      (1L, us(0), 7L, "view", 0.0, p(5)),
      (2L, us(10), 7L, "view", 0.0, p(5)),    // same k: absorbed into the run
      (3L, us(20), 7L, "view", 0.0, p(9)),    // change point
      (4L, us(30), 7L, "view", 0.0, p(5)),    // back to 5: a NEW interval
      (5L, us(5), 8L, "view", 0.0, "{}"),     // no k: ignored entirely
      (6L, us(15), 8L, "view", 0.0, p(3)))))
      .collect().map(r => (r.getLong(0), r.getLong(2)) ->
        ((r.getLong(1), if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))))
      .toMap
    out((7L, us(0))) shouldBe ((5L, us(20), false))
    out((7L, us(20))) shouldBe ((9L, us(30), false))
    out((7L, us(30))) shouldBe ((5L, -1L, true))
    out((8L, us(15))) shouldBe ((3L, -1L, true))
    out.size shouldBe 4
  }

  test("replay dedup: every id collapses to its earliest arrival, copies counted") {
    val out = Events.replayDedup(eventsDf(Seq(
      (1L, us(10), 7L, "view", 0.0, "{}"),
      (2L, us(20), 7L, "view", 0.0, "{}"))))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    out(1L) shouldBe ((us(10), 2L)) // the +1ms replay never wins the min
    out(2L) shouldBe ((us(20), 2L))
    out.size shouldBe 2
  }

  test("approx quantiles stay within tolerance of the exact sort-based answer") {
    val rows = (1 to 2000).map(i =>
      (i.toLong, us(i.toLong), 1L, "view", i.toDouble, "{}"))
    val exact = Events.valueQuantiles(eventsDf(rows)).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val approx = Events.valueQuantilesApprox(eventsDf(rows)).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val (e50, e95, e99) = exact("view")
    val (a50, a95, a99) = approx("view")
    // accuracy=10000 on 2000 distinct values: rank error <= n/accuracy < 1,
    // so the sketch may only land on a neighboring value (exact uses
    // linear interpolation, the sketch snaps to an observed value)
    math.abs(a50 - e50) should be <= 2.0
    math.abs(a95 - e95) should be <= 2.0
    math.abs(a99 - e99) should be <= 2.0
  }

  test("running ltv: cumulative purchase mass and prior-event count per user") {
    val out = Events.runningLtv(eventsDf(Seq(
      (1L, us(0), 7L, "view", 9.0, "{}"),      // views never count
      (2L, us(10), 7L, "purchase", 2.5, "{}"),
      (3L, us(20), 7L, "purchase", 1.5, "{}"),
      (4L, us(5), 8L, "purchase", 4.0, "{}"))))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    out(1L) shouldBe ((0L, 0.0))
    out(2L) shouldBe ((1L, 2.5))
    out(3L) shouldBe ((2L, 4.0))
    out(4L) shouldBe ((0L, 4.0))
  }

  test("hll day sketches estimate dau, and their union answers the range query") {
    def dus(day: Long, m: Long) = day * 86400L * 1000000L + us(m)
    // day 0: users 1..50; day 1: users 26..75 -> distinct overall 75
    val rows = (1L to 50L).map(u => (u, dus(0, u), u, "view", 0.0, "{}")) ++
      (26L to 75L).map(u => (1000L + u, dus(1, u), u, "view", 0.0, "{}"))
    val daily = Events.dauSketches(eventsDf(rows))
    val ests = daily.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // lgK=12 on 50 items: HLL is exact-ish; allow 2%
    ests(0L).toDouble shouldBe 50.0 +- 1.0
    ests(1L).toDouble shouldBe 50.0 +- 1.0
    val total = Events.distinctFromSketches(daily).collect()(0).getLong(0)
    total.toDouble shouldBe 75.0 +- 2.0
  }

  test("conversion probe: even users with views come back unconverted, null lag") {
    val out = Events.conversionProbe(eventsDf(Seq(
      (1L, us(0), 2L, "view", 0.0, "{}"),
      (2L, us(5), 2L, "purchase", 1.0, "{}"),   // dropped: even user
      (3L, us(0), 3L, "view", 0.0, "{}"),
      (4L, us(5), 3L, "purchase", 1.0, "{}")))) // kept: odd user
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(4), r.isNullAt(2)))).toMap
    out(2L) shouldBe ((false, true))
    out(3L) shouldBe ((true, false))
  }

  test("churn segments: recency buckets split on the active/at-risk day bounds") {
    def dus(day: Long, m: Long = 0) = day * 86400L * 1000000L + us(m)
    // anchor = day 20 (user 1). user 1 active (0d), user 2 at 13d -> at_risk,
    // user 3 at 20d -> churned, user 4 at 7d -> active (boundary inclusive)
    val out = Events.churnSegments(eventsDf(Seq(
      (1L, dus(20), 1L, "purchase", 10.0, "{}"),
      (2L, dus(19), 1L, "view", 0.0, "{}"),
      (3L, dus(7), 2L, "purchase", 5.0, "{}"),
      (4L, dus(0), 3L, "view", 0.0, "{}"),
      (5L, dus(13), 4L, "click", 0.0, "{}"))))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    out("active") shouldBe ((2L, 3L, 10.0))   // users 1 (0d) and 4 (7d)
    out("at_risk") shouldBe ((1L, 1L, 5.0))   // user 2 (13d)
    out("churned") shouldBe ((1L, 1L, 0.0))   // user 3 (20d)
  }

  test("ab lift: horizon conversion per arm; a symmetric split zeroes lift and z") {
    def h(hours: Long) = hours * 3600L * 1000000L
    val out = Events.abLift(eventsDf(Seq(
      (1L, h(0), 0L, "view", 0.0, "{}"),
      (2L, h(1), 0L, "purchase", 1.0, "{}"),   // arm A, converts (1h)
      (3L, h(0), 2L, "view", 0.0, "{}"),
      (4L, h(30), 2L, "purchase", 1.0, "{}"),  // arm A, too late (30h)
      (5L, h(0), 1L, "view", 0.0, "{}"),
      (6L, h(23), 1L, "purchase", 1.0, "{}"),  // arm B, converts (23h)
      (7L, h(0), 3L, "view", 0.0, "{}"))))     // arm B, never buys
      .collect()
    out.length shouldBe 1
    val r = out(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe ((2L, 2L, 1L, 1L))
    r.getDouble(4) shouldBe 0.5
    r.getDouble(5) shouldBe 0.5
    r.getDouble(6) shouldBe 0.0
    r.getDouble(7) shouldBe 0.0 // se = 0.5 > 0, so z is defined and exactly 0
  }

  test("ab lift: a fully-converted corpus degenerates to a NULL z, not an error") {
    val out = Events.abLift(eventsDf(Seq(
      (1L, us(0), 0L, "purchase", 1.0, "{}"),
      (2L, us(0), 1L, "purchase", 1.0, "{}"))))
      .collect()(0)
    out.getDouble(6) shouldBe 0.0 // lift
    out.isNullAt(7) shouldBe true // pooled variance 0 -> nullif guard
  }

  test("seasonality: weekday averages against the overall daily mean") {
    // two full epoch-weeks; day d carries (d%7)+1 events
    val rows = for {
      d <- 0L until 14L
      i <- 0L until (d % 7) + 1
    } yield (d * 100 + i, d * 86400L * 1000000L + us(i), i, "view", 0.0, "{}")
    val out = Events.seasonality(eventsDf(rows))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    out.keySet shouldBe (0 to 6).toSet
    (0 to 6).foreach { dow =>
      // overall avg = (1+..+7)*2/14 = 4 events/day
      out(dow) shouldBe ((2L, 2L * (dow + 1), (dow + 1).toDouble, (dow + 1) / 4.0))
    }
  }

  test("forecast backtest: lag-7 seasonal naive scored only where history exists") {
    def dus(day: Long, m: Long) = day * 86400L * 1000000L + us(m)
    // "view": day d carries d+1 events (growing) -> err 7 on every scored day
    // "click": constant 2/day -> perfect naive forecast
    val rows =
      (for { d <- 0L until 14L; i <- 0L to d }
        yield (d * 1000 + i, dus(d, i), i, "view", 0.0, "{}")) ++
      (for { d <- 0L until 14L; i <- 0L until 2L }
        yield (100000 + d * 10 + i, dus(d, 30 + i), i, "click", 0.0, "{}"))
    val out = Events.forecastBacktest(eventsDf(rows)).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val (nV, maeV, mapeV, biasV) = out("view")
    nV shouldBe 7L
    maeV shouldBe 7.0
    biasV shouldBe -7.0 // actual outgrows the naive forecast
    mapeV shouldBe (8 to 14).map(a => 7.0 / a).sum / 7 +- 1e-12
    out("click") shouldBe ((7L, 0.0, 0.0, 0.0))
  }

  test("markov eval: modal transition wins with smaller-type tiebreak; accuracy exact") {
    // user 7 session: v->c, c->v, v->c, c->p  |  user 8: v->p
    // from v: c twice, p once -> predict c, 2/3
    // from c: v once, p once  -> tie, predict p? no: smaller type wins -> p? 'p'<'v' -> p, 1/2
    val out = Events.markovEval(eventsDf(Seq(
      (1L, us(0), 7L, "v", 0.0, "{}"),
      (2L, us(1), 7L, "c", 0.0, "{}"),
      (3L, us(2), 7L, "v", 0.0, "{}"),
      (4L, us(3), 7L, "c", 0.0, "{}"),
      (5L, us(4), 7L, "p", 0.0, "{}"),
      (6L, us(0), 8L, "v", 0.0, "{}"),
      (7L, us(1), 8L, "p", 0.0, "{}"))))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))).toMap
    out("v") shouldBe ((3L, "c", 2L, 2.0 / 3))
    out("c") shouldBe ((2L, "p", 1L, 0.5)) // count tie: 'p' < 'v' wins
    out.contains("p") shouldBe false       // terminal type: no outgoing pairs
  }

  test("skew profile: distribution shape from exact moments; degenerate cv is null") {
    // per-user counts 1,2,3,4
    val rows = for {
      (u, k) <- Seq((1L, 1), (2L, 2), (3L, 3), (4L, 4))
      i <- 0 until k
    } yield (u * 100 + i, us(i.toLong), u, "view", 0.0, "{}")
    val r = Events.skewProfile(eventsDf(rows)).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2)) shouldBe ((4L, 10L, 4L))
    r.getDouble(3) shouldBe 2.5 // avg
    r.getDouble(4) shouldBe 2.5 // p50 of {1,2,3,4}, interpolated
    r.getDouble(6) shouldBe 0.4 // top1_share
    r.getDouble(7) shouldBe 1.6 // hot_ratio = max/avg
    r.getDouble(8) shouldBe math.sqrt(5.0 / 3.0) / 2.5 +- 1e-12 // cv

    val one = Events.skewProfile(eventsDf(Seq((1L, us(0), 9L, "view", 0.0, "{}"))))
      .collect()(0)
    one.isNullAt(8) shouldBe true // n_keys = 1: variance undefined, not an error
  }

  test("interarrival: lower-median gap, session-gap exceedances, per user") {
    // user 7 gaps: 30m, 60m, 240m (one over the 120m session gap)
    val out = Events.interarrival(eventsDf(Seq(
      (1L, us(0), 7L, "view", 0.0, "{}"),
      (2L, us(30), 7L, "view", 0.0, "{}"),
      (3L, us(90), 7L, "view", 0.0, "{}"),
      (4L, us(330), 7L, "view", 0.0, "{}"),
      (5L, us(0), 8L, "view", 0.0, "{}"))))   // single event: no gaps, absent
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    out(7L) shouldBe ((3L, us(110).toDouble, us(60), us(240), 1L))
    out.contains(8L) shouldBe false
  }

  test("session funnel: stages count per visit, order enforced within the session") {
    // user 7: session A completes all four stages; a long gap opens
    // session B which stalls after view; user 8's single session has
    // purchase BEFORE its first click - the chain reaches click (first
    // click is after first view) but purchase must not count
    val out = Events.sessionFunnel(eventsDf(Seq(
      (1L, us(0), 7L, "signup", 0.0, "{}"),
      (2L, us(1), 7L, "view", 0.0, "{}"),
      (3L, us(2), 7L, "click", 0.0, "{}"),
      (4L, us(3), 7L, "purchase", 0.0, "{}"),
      (5L, us(300), 7L, "signup", 0.0, "{}"),   // 297min > 120min gap
      (6L, us(301), 7L, "view", 0.0, "{}"),
      (7L, us(0), 8L, "signup", 0.0, "{}"),
      (8L, us(1), 8L, "view", 0.0, "{}"),
      (9L, us(2), 8L, "purchase", 0.0, "{}"),
      (10L, us(3), 8L, "click", 0.0, "{}"))))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    out(1) shouldBe 3L // all three sessions sign up
    out(2) shouldBe 3L // all three reach view
    out(3) shouldBe 2L // 7's session A, plus 8 (click follows view)
    out(4) shouldBe 1L // only 7's session A purchases in order
  }

  test("k-anonymity: sparse quasi-identifier cells flag, null key is its own cell") {
    val rows =
      (1 to 6).map(u => (u.toLong, us(u), u.toLong, "view", 0.0, """{"k": 1}""")) ++
      Seq(
        (10L, us(10), 1L, "view", 0.0, """{"k": 2}"""),   // k=2 seen for 2 users
        (11L, us(11), 2L, "view", 0.0, """{"k": 2}"""),
        (12L, us(12), 2L, "view", 0.0, """{"k": 2}"""),   // repeat event, same user
        (13L, us(13), 3L, "click", 0.0, "{}"))             // no k: null cell
    val out = Events.kAnonymity(eventsDf(rows)).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getLong(1))) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    out(("view", Some(1L))) shouldBe ((6L, 6L, true))   // 6 users ≥ threshold
    out(("view", Some(2L))) shouldBe ((2L, 3L, false))  // 2 users: re-identifying
    out(("click", None)) shouldBe ((1L, 1L, false))
    out.size shouldBe 3
  }

  test("bot flag: burst and metronome trip independently; humans and singletons pass") {
    val sec = 1000000L
    var id = 0L
    def ev(ts: Long, user: Long): (Long, Long, Long, String, Double, String) = {
      id += 1; (id, ts, user, "view", 0.0, "{}")
    }
    val burst = (0 until 12).map(i => ev(i * 5 * sec, 1L)) // 12 in minute 0
    val metro = (0 until 25).map(i => ev(1000L * sec + i * 300 * sec, 2L))
    val human = (0 until 25).scanLeft(2000000L * sec) {
      (t, i) => t + (120 + i) * sec }.tail.map(ev(_, 3L)) // all-distinct gaps
    val lone = Seq(ev(5000000L * sec, 4L))
    val out = Events.botFlag(eventsDf(burst ++ metro ++ human ++ lone))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          r.getBoolean(5)))).toMap
    out(1L) shouldBe ((12L, 12L, 11L, Some(1.0), true))  // burst, gate un-met
    out(2L) shouldBe ((25L, 1L, 24L, Some(1.0), true))   // metronome
    val (n3, m3, g3, s3, b3) = out(3L)
    (n3, m3, g3, b3) shouldBe ((25L, 1L, 24L, false))
    s3.get shouldBe (1.0 / 24) +- 1e-12                  // no dominant gap
    out(4L) shouldBe ((1L, 1L, 0L, None, false))         // singleton: null share
  }

  test("dispersion: metronome scores 0, a one-minute burst scores N-1") {
    // global span: minutes 0..9 (N=10). A: one event per minute (VMR 0);
    // B: all ten events in minute 0 (VMR (10*100-100)/100 = 9)
    val rows = (0 until 10).map(i => (i.toLong, us(i.toLong), 1L, "A", 1.0, "{}")) ++
      (0 until 10).map(i => (100L + i, i * 1000000L, 2L, "B", 1.0, "{}"))
    val out = Events.dispersion(eventsDf(rows)).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    out("A") shouldBe ((10L, 10L, 0.0))
    out("B") shouldBe ((10L, 10L, 9.0))
  }

  test("cusum: window prefix identity equals the sequential recurrence; shift alarms") {
    // 10 quiet days (2 events) then 10 loud days (12): mu=7, sigma=5,
    // k=2.5, h=20 — s+ climbs 2.5/day after the shift, s- during the
    // quiet half (two-sided by design)
    val rows = (0 until 20).flatMap { d =>
      val nEv = if (d < 10) 2 else 12
      (0 until nEv).map(i => (d * 100L + i, day(d.toLong) + us(i.toLong),
        1L, "A", 1.0, "{}"))
    }
    val out = Events.cusum(eventsDf(rows)).collect()
      .map(r => r.getLong(1) ->
        ((r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    val xs = (0 until 20).map(d => if (d < 10) 2.0 else 12.0)
    val mu = xs.sum / 20
    val sigma = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / 20)
    val k = sigma / 2; val h = 4 * sigma
    var sp = 0.0; var sn = 0.0
    xs.zipWithIndex.foreach { case (x, d) =>
      sp = math.max(0, sp + x - mu - k)
      sn = math.max(0, sn + mu - k - x)
      val (gp, gn, alarm) = out(d.toLong)
      gp shouldBe sp +- 1e-6
      gn shouldBe sn +- 1e-6
      alarm shouldBe (sp > h || sn > h)
    }
    // the level shift is caught on the positive side by day 18 (2.5·8 > 20)
    out(18L)._3 shouldBe true
  }

  test("session duration histogram: log2 buckets with an exact zero bucket") {
    val out = Events.sessionDurationHist(eventsDf(Seq(
      (1L, us(0), 7L, "view", 1.0, "{}"),
      (2L, us(30), 7L, "view", 1.0, "{}"),      // one 1800-second session
      (3L, us(1000), 8L, "view", 1.0, "{}"))))  // singleton: zero duration
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    out(0L) shouldBe ((0L, 1L, 1L, 0L))
    // 1800 = 0b11100001000 -> 11 bits -> bucket 11, lower edge 1024 s
    out(11L) shouldBe ((1024L, 1L, 2L, 1800L))
    out.size shouldBe 2
  }

  private def day(d: Long): Long = d * 86400L * 1000000L

  test("streaks: gaps-and-islands over distinct active days") {
    val out = Events.streaks(eventsDf(Seq(
      // user 7: days 0,1,2 then 5,6 — two islands, longest 3
      (1L, day(0), 7L, "view", 1.0, "{}"),
      (2L, day(0) + us(30), 7L, "view", 1.0, "{}"),  // same day: one active day
      (3L, day(1), 7L, "view", 1.0, "{}"),
      (4L, day(2), 7L, "view", 1.0, "{}"),
      (5L, day(5), 7L, "view", 1.0, "{}"),
      (6L, day(6), 7L, "view", 1.0, "{}"),
      // user 8: one day
      (7L, day(9), 8L, "view", 1.0, "{}"))))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    out(7L) shouldBe ((5L, 2L, 3L))
    out(8L) shouldBe ((1L, 1L, 1L))
  }

  test("gini: exact tie-group rank arithmetic matches the sorted-rank formula") {
    // counts per user: u1=1, u2=1, u3=2 -> x=[1,1,2], n=3, T=4,
    // S = 1·1 + 2·1 + 3·2 = 9, G = 2·9/(3·4) − 4/3 = 1/6
    val rows = Seq((1L, us(0), 1L), (2L, us(1), 2L), (3L, us(2), 3L),
      (4L, us(3), 3L)).map { case (e, t, u) => (e, t, u, "view", 1.0, "{}") }
    val r = Events.gini(eventsDf(rows)).collect()(0)
    r.getLong(0) shouldBe 3L
    r.getLong(1) shouldBe 4L
    r.getDouble(2) shouldBe BigDecimal(2.0 * 9 / 12 - 4.0 / 3).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("markov entropy: deterministic rows score 0; mixed rows match hand arithmetic") {
    // one session: A B A B A C — transitions A→B:2, A→C:1, B→A:2
    val types = Seq("A", "B", "A", "B", "A", "C")
    val out = Events.markovEntropy(eventsDf(types.zipWithIndex.map {
      case (t, i) => (i.toLong, us(i), 1L, t, 1.0, "{}")
    })).collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    out("B") shouldBe ((2L, 0.0, 0.0))   // B always returns to A
    val hA = -(2.0 / 3) * math.log(2.0 / 3) - (1.0 / 3) * math.log(1.0 / 3)
    val (nA, hFromA, hContribA) = out("A")
    nA shouldBe 3L
    hFromA shouldBe hA +- 1e-6
    hContribA shouldBe (3.0 / 5) * hA +- 1e-6
  }

  test("kaplan-meier: hand-computed curve with mixed deaths and censoring") {
    def day(d: Long): Long = d * 86400L * 1000000L
    // anchor = day 30 (u1's last). ChurnAtRiskDays = 14:
    //   u1 0..30  recency 0  → censored at 30
    //   u2 0..5   recency 25 → DEATH  t=5
    //   u3 2..10  recency 20 → DEATH  t=8
    //   u4 20..29 recency 1  → censored at 10
    //   u5 0 only recency 30 → DEATH  t=0
    var id = 0L
    def ev(u: Long, d: Long) = { id += 1; (id, day(d), u, "view", 1.0, "{}") }
    val events = eventsDf(Seq(
      ev(1, 0), ev(1, 30), ev(2, 0), ev(2, 5), ev(3, 2), ev(3, 10),
      ev(4, 20), ev(4, 29), ev(5, 0)))
    val out = Events.kaplanMeier(events).orderBy("t_days").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    out.length shouldBe 3
    out(0) shouldBe ((0L, 5L, 1L, 0.8))      // S = 4/5
    out(1) shouldBe ((5L, 4L, 1L, 0.6))      // S = 4/5 · 3/4
    out(2) shouldBe ((8L, 3L, 1L, 0.4))      // S = 4/5 · 3/4 · 2/3
  }

  test("kaplan-meier: a death that exhausts the risk set reports survival 0.0, not a silently-dropped log(0)") {
    def day(d: Long): Long = d * 86400L * 1000000L
    // u1: days 28..30 → censored at t = 2; u2: days 0..10 → recency 20 →
    // DEATH at t = 10 with n_risk = 1 (u1's lifetime 2 < 10): the 1−d/n
    // factor is 0, so S(10) must be exactly 0.0 — Spark's log(0) is NULL
    // and a window sum silently drops NULLs, which would report 1.0
    val events = eventsDf(Seq(
      (1L, day(28), 1L, "view", 1.0, "{}"), (2L, day(30), 1L, "view", 1.0, "{}"),
      (3L, day(0), 2L, "view", 1.0, "{}"), (4L, day(10), 2L, "view", 1.0, "{}")))
    val out = Events.kaplanMeier(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    out.toSeq shouldBe Seq((10L, 1L, 1L, 0.0))
  }

  test("kaplan-meier: an all-active corpus has no observed deaths — empty curve, not a crash") {
    def day(d: Long): Long = d * 86400L * 1000000L
    val events = eventsDf(Seq(
      (1L, day(0), 1L, "view", 1.0, "{}"), (2L, day(10), 1L, "view", 1.0, "{}"),
      (3L, day(5), 2L, "view", 1.0, "{}"), (4L, day(10), 2L, "view", 1.0, "{}")))
    Events.kaplanMeier(events).count() shouldBe 0L
  }

  test("kaplan-meier: survival is monotone non-increasing on the registered probe face") {
    val out = Events.queries("events_survival")(spark,
      "/root/testdata/sf0.001").orderBy("t_days").collect()
    out.length should be > 0
    val s = out.map(_.getDouble(3))
    s.zip(s.tail).foreach { case (a, b) => b should be <= a }
    all(s) should (be > 0.0 or be >= 0.0)
    all(s) should be <= 1.0
  }

  test("gini: uniform traffic scores 0, degenerate single user scores 0") {
    val uniform = (1L to 6L).map(i => (i, us(i), i % 3, "view", 1.0, "{}"))
    Events.gini(eventsDf(uniform)).collect()(0).getDouble(2) shouldBe 0.0
    val solo = Seq((1L, us(0), 5L, "view", 1.0, "{}"),
      (2L, us(1), 5L, "view", 1.0, "{}"))
    Events.gini(eventsDf(solo)).collect()(0).getDouble(2) shouldBe 0.0
  }
}
