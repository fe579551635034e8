package etlmudah.analytics

import graft.SparkSpec
import java.sql.Timestamp

class EventsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("cohortRetention: offsets, shares, and cap on a two-cohort log") {
    import spark.implicits._
    val events = Seq(
      // cohort 2024-01-01: users 1,2; user 1 returns D1, user 2 returns D2
      (1L, ts("2024-01-01 09:00:00")), (1L, ts("2024-01-02 09:00:00")),
      (2L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-03 10:00:00")),
      (1L, ts("2024-01-01 23:59:59")),                   // same-day dup: D0 once
      // cohort 2024-01-05: user 3 only, returns far outside the cap
      (3L, ts("2024-01-05 08:00:00")), (3L, ts("2024-03-01 08:00:00"))
    ).toDF("user_id", "ts")
    val out = Events.cohortRetention(events, "ts", "user_id", maxOffsetDays = 14)
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 0, 2L, 2L, 100.0),
      ("2024-01-01", 1, 1L, 2L, 50.0),
      ("2024-01-01", 2, 1L, 2L, 50.0),
      ("2024-01-05", 0, 1L, 1L, 100.0)))   // the March return is capped away
  }

  test("rollingActive: trailing-window distinct actives, ramp days excluded") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 09:00:00")), (2L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-02 09:00:00")),
      (3L, ts("2024-01-04 09:00:00")), (3L, ts("2024-01-04 12:00:00"))
    ).toDF("user_id", "ts")
    val out = Events.rollingActive(events, "ts", "user_id", windowDays = 3)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // only 01-04 has a full 3-day trailing window past the first day;
    // window [01-02, 01-04] saw users {1, 3}, DAU(01-04) = {3}
    assert(out.toSeq == Seq(("2024-01-04", 1L, 2L, 50.0)))
  }

  test("funnel: strictly-after ordering drops out-of-order conversions") {
    import spark.implicits._
    val events = Seq(
      // user 1: full ordered funnel
      (1L, "view", ts("2024-01-01 09:00:00")),
      (1L, "click", ts("2024-01-01 09:05:00")),
      (1L, "purchase", ts("2024-01-01 09:10:00")),
      // user 2: clicked BEFORE the first view — click must not count
      (2L, "click", ts("2024-01-01 08:00:00")),
      (2L, "view", ts("2024-01-01 09:00:00")),
      (2L, "purchase", ts("2024-01-01 10:00:00")),
      // user 3: view only
      (3L, "view", ts("2024-01-01 11:00:00")),
      // user 4: never viewed (enters the denominator only)
      (4L, "error", ts("2024-01-01 12:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = Events.funnel(events, "ts", "user_id", "event_type",
        Seq("view", "click", "purchase")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1, "view", 3L, 75.0, 75.0),          // of 4 users
      (2, "click", 1L, 25.0, 33.3333),      // only user 1's ordered click
      (3, "purchase", 1L, 25.0, 100.0)))
  }

  test("funnel: same-microsecond event does not satisfy strict order") {
    import spark.implicits._
    val events = Seq(
      (1L, "view", ts("2024-01-01 09:00:00")),
      (1L, "click", ts("2024-01-01 09:00:00"))  // ties the view exactly
    ).toDF("user_id", "event_type", "ts")
    val out = Events.funnel(events, "ts", "user_id", "event_type",
        Seq("view", "click")).collect().map(r => (r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("view", 1L), ("click", 0L)))
  }

  test("funnel with conversion window: in-window converts, out-of-window drops") {
    import spark.implicits._
    val events = Seq(
      // user 1: click 30 min after view -> converts under a 1h window
      (1L, "view", ts("2024-01-01 09:00:00")),
      (1L, "click", ts("2024-01-01 09:30:00")),
      // user 2: click 2h after view -> outside the window
      (2L, "view", ts("2024-01-01 09:00:00")),
      (2L, "click", ts("2024-01-01 11:00:00")),
      // user 3: click exactly AT the bound (inclusive) -> converts
      (3L, "view", ts("2024-01-01 09:00:00")),
      (3L, "click", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = Events.funnel(events, "ts", "user_id", "event_type",
        Seq("view", "click"), maxGapUs = Some(3600L * 1000000))
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("view", 3L), ("click", 2L)))
    // unbounded: all three convert
    val open = Events.funnel(events, "ts", "user_id", "event_type",
        Seq("view", "click")).collect().map(r => (r.getString(1), r.getLong(2)))
    assert(open.toSeq == Seq(("view", 3L), ("click", 3L)))
  }

  test("transitionMatrix: hand log — per-user chains, row-normalized, id tie-break") {
    import spark.implicits._
    val events = Seq(
      // user 1 chain: view -> click -> view  => (view,click), (click,view)
      (1L, 1L, "view", ts("2024-01-01 09:00:00")),
      (2L, 1L, "click", ts("2024-01-01 09:01:00")),
      (3L, 1L, "view", ts("2024-01-01 09:02:00")),
      // user 2 chain: view -> view           => (view,view)
      (4L, 2L, "view", ts("2024-01-01 10:00:00")),
      (5L, 2L, "view", ts("2024-01-01 10:05:00")),
      // user 3: same-timestamp pair ordered by event_id: click -> buy
      (6L, 3L, "click", ts("2024-01-01 11:00:00")),
      (7L, 3L, "buy", ts("2024-01-01 11:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Events.transitionMatrix(events, "ts", "user_id",
        "event_type", "event_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // user1 contributes (view,click),(click,view); user2 (view,view);
    // user3 (click,buy). Row totals: from=view 2, from=click 2.
    assert(out.toSeq == Seq(
      ("click", "buy", 1L, 0.5), ("click", "view", 1L, 0.5),
      ("view", "click", 1L, 0.5), ("view", "view", 1L, 0.5)))
  }

  test("transitionMatrix: chains never cross users; single-event users emit nothing") {
    import spark.implicits._
    val events = Seq(
      (1L, 1L, "a", ts("2024-01-01 09:00:00")),
      (2L, 2L, "b", ts("2024-01-01 09:01:00"))  // later, different user
    ).toDF("event_id", "user_id", "event_type", "ts")
    assert(Events.transitionMatrix(events, "ts", "user_id", "event_type",
      "event_id").count() == 0L)
  }

  test("eventPaths: trigram paths never cross users, count correctly, tie-break on path") {
    import spark.implicits._
    // user 1: a b a b  -> a>b>a, b>a>b ; user 2: a b a -> a>b>a
    val ev = Seq(
      (1L, 1L, "a", ts("2024-01-01 00:00:01")),
      (2L, 1L, "b", ts("2024-01-01 00:00:02")),
      (3L, 1L, "a", ts("2024-01-01 00:00:03")),
      (4L, 1L, "b", ts("2024-01-01 00:00:04")),
      (5L, 2L, "a", ts("2024-01-01 00:00:05")),
      (6L, 2L, "b", ts("2024-01-01 00:00:06")),
      (7L, 2L, "a", ts("2024-01-01 00:00:07"))
    ).toDF("event_id", "user_id", "et", "ts")
    val out = Events.eventPaths(ev, "ts", "user_id", "et", "event_id",
        len = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a>b>a", 2L), ("b>a>b", 1L)), out.toSeq.toString)
  }

  test("resampleFill: dense grid, forward fill flagged, per-bucket last pick, null drop") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val step = 10L                         // 10-microsecond buckets
    val df = Seq(
      // k1: buckets 0 (two obs -> later one wins), 1 empty, 2 empty,
      //     3 observed; grid must span 0..3 with 1,2 filled from b0
      ("k1", 3L, Some(1.0)), ("k1", 7L, Some(2.0)),
      ("k1", 35L, Some(9.0)),
      // a NULL observation is not an observation
      ("k1", 16L, None),
      // k2: a single bucket — grid is that bucket alone
      ("k2", 100L, Some(5.0))
    ).toDF("k", "us", "v")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = Events.resampleFill(df, "k", col("ts"), col("v"), step)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).toSeq
    assert(got == Seq(
      ("k1", 0L, 2.0, true),    // last obs of bucket 0 (us=7) wins
      ("k1", 10L, 2.0, false),  // filled (the null obs at us=16 is not observed)
      ("k1", 20L, 2.0, false),  // filled
      ("k1", 30L, 9.0, true),
      ("k2", 100L, 5.0, true)), got.toString)
    // same-microsecond tie: larger value wins the bucket pick
    val tie = Seq(("k", 5L, 1.0), ("k", 5L, 4.0)).toDF("k", "us", "v")
      .withColumn("ts", timestamp_micros(col("us")))
    assert(Events.resampleFill(tie, "k", col("ts"), col("v"), step)
      .collect()(0).getDouble(2) == 4.0)
  }

  test("twap: LOCF integral, not the plain average; single-event keys omitted") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 00:00:10"), 4.0),
      (1L, ts("2024-01-01 00:00:30"), 99.0),   // last value carries 0 time
      (2L, ts("2024-01-01 00:00:00"), 7.0)     // single event: no span
    ).toDF("k", "t", "v")
    val r = Events.twap(df, "k", col("t"), col("v")).collect()
    assert(r.length == 1)
    val row = r.head
    // (1*10s + 4*20s) / 30s = 3.0 — far from avg(1,4,99)
    assert(row.getLong(0) == 1L && row.getAs[Double]("twap") == 3.0 &&
      row.getAs[Long]("span_us") == 30000000L, row.toString)
  }
}
