package graft

import graft.functions.{Cdc, Graph, TimeSeries}
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {

  import spark.implicits._

  // Epoch-nanos base well past 2^53 — catches any double-division bucketing.
  private val T0 = 1700000000000000000L
  private val Day = 86400000000000L

  test("ohlcBars: open/close by event order, buckets exact at nanos magnitude") {
    val rows = Seq(
      // day 0, type A: values in event order 5.0, 1.0, 9.0, 3.0
      (T0 - (T0 % Day) + 1L, 1L, "A", 5.0),
      (T0 - (T0 % Day) + 2L, 2L, "A", 1.0),
      (T0 - (T0 % Day) + 3L, 3L, "A", 9.0),
      (T0 - (T0 % Day) + 4L, 4L, "A", 3.0),
      // same ts tie on day 0 type B: event_id breaks the tie
      (T0 - (T0 % Day) + 9L, 10L, "B", 2.0),
      (T0 - (T0 % Day) + 9L, 11L, "B", 7.0),
      // next day, type A: single event
      (T0 - (T0 % Day) + Day + 1L, 20L, "A", 4.0)
    ).toDF("ts", "event_id", "event_type", "value")
    val out = TimeSeries.ohlcBars(rows, "ts", "value", Seq("event_type"),
        Day, Seq("ts", "event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(7)))
      .toMap
    val d0 = T0 / Day
    assert(out((d0, "A")) === ((5.0, 9.0, 1.0, 3.0, 4L)))
    assert(out((d0, "B")) === ((2.0, 7.0, 2.0, 7.0, 2L)))
    assert(out((d0 + 1, "A")) === ((4.0, 4.0, 4.0, 4.0, 1L)))
  }

  test("rollingDistinct: sliding window counts, clipped to observed buckets") {
    // Users per day: d0 {1,2}, d1 {2}, d3 {3}. Window = 2 days.
    // d0 -> {1,2} = 2; d1 -> {1,2} = 2 (union d0 ∪ d1); d3 -> {3} = 1
    // (d2 is unobserved -> no output row; d3's window [d2,d3] sees only d3).
    val d0 = T0 - (T0 % Day)
    val rows = Seq(
      (d0 + 5L, 1L), (d0 + 9L, 2L), (d0 + 9L, 2L), // dup (day, user) collapses
      (d0 + Day + 1L, 2L),
      (d0 + 3 * Day + 7L, 3L)
    ).toDF("ts", "user_id")
    val out = TimeSeries.rollingDistinct(rows, "ts", "user_id", Day, windowBuckets = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b0 = d0 / Day
    assert(out === Map(b0 -> 2L, (b0 + 1) -> 2L, (b0 + 3) -> 1L))
  }

  test("rollingDistinct: seeded random histories match a brute-force band count") {
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 3; w <- Seq(2, 7)) {
      val rows = Seq.fill(120)((T0 + rnd.nextInt(20).toLong * Day + rnd.nextInt(1000).toLong,
        rnd.nextInt(8).toLong))
      val byDay = rows.map { case (ts, u) => (ts / Day, u) }.distinct
      val days = byDay.map(_._1).distinct
      val expected = days.map(d =>
        d -> byDay.filter { case (bd, _) => bd >= d - (w - 1) && bd <= d }
          .map(_._2).distinct.size.toLong).toMap
      val out = TimeSeries.rollingDistinct(
          rows.toDF("ts", "user_id"), "ts", "user_id", Day, windowBuckets = w)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out === expected, s"trial=$trial w=$w")
    }
  }

  test("rollingDistinct: window of 1 equals plain per-bucket distinct counts") {
    val d0 = T0 - (T0 % Day)
    val rows = Seq(
      (d0 + 1L, 1L), (d0 + 2L, 2L), (d0 + Day, 1L), (d0 + Day + 1L, 1L)
    ).toDF("ts", "user_id")
    val out = TimeSeries.rollingDistinct(rows, "ts", "user_id", Day, windowBuckets = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b0 = d0 / Day
    assert(out === Map(b0 -> 2L, (b0 + 1) -> 1L))
  }

  test("timeWeighted: step-function integral, integer-exact; last event holds zero time") {
    val rows = Seq(
      // user 1: 2.00 for 10s, then 4.00 for 5s, then last (no hold)
      (1L, T0, 1L, 2.0),
      (1L, T0 + 10L * 1000000000L, 2L, 4.0),
      (1L, T0 + 15L * 1000000000L, 3L, 6.0),
      // user 2: single event -> zero active time, null average
      (2L, T0, 4L, 9.99)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeries.timeWeighted(rows, Seq("user_id"), "ts", "value",
        Seq("ts", "event_id"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) null else r.getLong(4))).toMap
    // user 1: 200c*10s + 400c*5s = 4000 cent-seconds over 15s -> avg 266c
    assert(out(1L) === ((4000L, 15L, 3L, 266L)))
    assert(out(2L) === ((0L, 0L, 1L, null)))
  }

  test("scd2History: transition intervals with null-safe change detection") {
    val log = Seq(
      (1L, 1L, 101L, "a"), (1L, 2L, 102L, "a"), (1L, 3L, 103L, "b"),
      (1L, 4L, 104L, "b"), (1L, 5L, 105L, "a"),
      (2L, 1L, 201L, null), (2L, 2L, 202L, null), (2L, 3L, 203L, "x")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Cdc.scd2History(log, Seq("user_id"), Seq("ts", "event_id"), "event_type")
      .select(col("user_id"), col("event_type"), col("valid_from.ts").as("f"),
        col("valid_to.ts").as("t"), col("version_n"))
      .collect().map(r => (r.getLong(0), r.getLong(4)) ->
        (Option(r.getString(1)).orNull, r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    assert(out === Map(
      (1L, 1L) -> (("a", 1L, 3L)), (1L, 2L) -> (("b", 3L, 5L)),
      (1L, 3L) -> (("a", 5L, -1L)),
      (2L, 1L) -> ((null, 1L, 3L)), (2L, 2L) -> (("x", 3L, -1L))))
  }

  test("cusumChangepoint: level shift lands on the last pre-shift bucket; flat series ties to bucket 1") {
    import spark.implicits._
    val day = 86400000000000L
    // Key "a": value 0 for days 1-3, 6.0 for days 4-6 (cents s = [0,0,0,
    // 600,600,600], T = 1800, n = 6). D_i = 6*cum_i - i*1800 =
    // [-1800,-3600,-5400,-3600,-1800,0] -> argmax |D| at i=3 (the last
    // pre-shift day), d_abs = 5400.
    // Key "b": constant value -> every D_i = 0 -> tie to the FIRST bucket.
    val rows =
      (1 to 6).map(i => ("a", i * day + 7L, if (i <= 3) 0.0 else 6.0)) ++
        (1 to 4).map(i => ("b", i * day + 7L, 2.5))
    val out = graft.functions.TimeSeries.cusumChangepoint(
        rows.toDF("event_type", "ts", "value"), "ts", "value",
        Seq("event_type"), day)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out === Map("a" -> ((3L, 6L, 5400L)), "b" -> ((1L, 4L, 0L))))
    // Partitioning-invariant (integer arithmetic end to end).
    val repart = graft.functions.TimeSeries.cusumChangepoint(
        rows.toDF("event_type", "ts", "value").repartition(7), "ts", "value",
        Seq("event_type"), day)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(repart === out)
  }

  test("Graph.pushRound: fixed-point degree-normalized push") {
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("src", "dst")
    val out = Graph.pushRound(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // outdeg(1)=2 -> contrib 500000 each; outdeg(2)=1 -> 1000000.
    // node 10: 150000 + 850000*1500000//1000000 = 1425000; node 11: 575000.
    assert(out === Map(10L -> ((2L, 1425000L)), 11L -> ((1L, 575000L))))
  }
}
