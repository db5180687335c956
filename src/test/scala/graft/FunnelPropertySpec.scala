package graft

import graft.streaming.{Funnel, FunnelEvent}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Randomized property coverage for the funnel semantics: the cascaded
 * strictly-preceding-frame WINDOW implementation (the `funnel_conv` /
 * `funnel_by_cohort` plan shape) must agree with the sequential
 * `Funnel.fold` (the streaming state machine) on arbitrary event
 * sequences under arbitrary partitioning. The two are deliberately
 * different algorithms — a frame-boundary bug (e.g. `-1` vs `0` in the
 * preceding frame, which silently weakens "strictly earlier" to
 * "earlier-or-same") cannot cancel out across both.
 */
class FunnelPropertySpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val types = Vector("view", "click", "purchase", "error", "signup")

  private val eventsGen: Gen[Seq[FunnelEvent]] = for {
    nUsers <- Gen.chooseNum(1, 6)
    n <- Gen.chooseNum(1, 60)
    evs <- Gen.listOfN(n, for {
      u <- Gen.chooseNum(1L, nUsers.toLong)
      // Small ts range on purpose: ties across users and repeated ts per
      // user exercise the (ts, event_id) tie-break.
      ts <- Gen.chooseNum(0L, 20L)
      t <- Gen.oneOf(types)
    } yield (u, ts, t))
  } yield evs.zipWithIndex.map { case ((u, ts, t), i) =>
    FunnelEvent(u, ts, i.toLong, t)
  }

  /** The production window-cascade flags per user — THE shared
    * `Funnel.withStageMarkers` construction, not a private replica, so
    * this spec pins the implementation the queries actually run. */
  private def windowFlags(events: Seq[FunnelEvent], parts: Int): Map[Long, (Boolean, Boolean, Boolean)] =
    Funnel.withStageMarkers(events.toDF().repartition(parts),
        "user_id", "ts", "event_id", "event_type")
      .groupBy(col("user_id"))
      .agg(
        max(col("is_s1")).as("f1"),
        max(col("is_s2")).as("f2"),
        max(col("is_s3")).as("f3"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1) == 1, r.getInt(2) == 1, r.getInt(3) == 1)))
      .toMap

  test("windowed (horizon) cascade equals a scalar range-scan replica on random sequences") {
    // Scalar replica: is_s2 iff a view exists at ts' in [ts-H, ts-1];
    // is_s3 iff a QUALIFYING click exists in that range — independently
    // recomputed per row by brute-force scan, so a RANGE-frame boundary
    // bug (inclusive vs exclusive, H vs H-1) cannot cancel out.
    val H = 5L
    val seqs = Iterator.from(0)
      .map(i => eventsGen.apply(Gen.Parameters.default, rng.Seed(31337L + i)))
      .flatten.take(15).toSeq
    for ((events, i) <- seqs.zipWithIndex) {
      val byUser = events.groupBy(_.user_id)
      val expected = byUser.flatMap { case (u, es) =>
        val views = es.filter(_.event_type == "view").map(_.ts)
        val s2 = es.filter(e => e.event_type == "click" &&
          views.exists(t => t >= e.ts - H && t <= e.ts - 1)).map(_.ts)
        val s3 = es.filter(e => e.event_type == "purchase" &&
          s2.exists(t => t >= e.ts - H && t <= e.ts - 1))
        Seq(
          (u, 1, views.nonEmpty),
          (u, 2, s2.nonEmpty),
          (u, 3, s3.nonEmpty))
      }.toSet
      val out = Funnel.withStageMarkersWithin(
          events.toDF().repartition(1 + (i % 4)), "user_id", "ts", "event_type", H)
        .groupBy(col("user_id"))
        .agg(max(col("is_s1")).as("f1"), max(col("is_s2")).as("f2"), max(col("is_s3")).as("f3"))
        .collect()
        .flatMap(r => Seq(
          (r.getLong(0), 1, r.getInt(1) == 1),
          (r.getLong(0), 2, r.getInt(2) == 1),
          (r.getLong(0), 3, r.getInt(3) == 1)))
        .toSet
      assert(out == expected, s"case $i: $events")
    }
  }

  test("last-touch attribution equals a brute-force scan on random sequences") {
    // Replica: for each purchase, walk the user's events in (ts, event_id)
    // order and take the type of the latest strictly-earlier non-purchase
    // event ("direct" when none) — recomputed per row, so an off-by-one in
    // the window frame (UNBOUNDED..0 vs ..-1) cannot cancel out.
    val seqs = Iterator.from(0)
      .map(i => eventsGen.apply(Gen.Parameters.default, rng.Seed(4242L + i)))
      .flatten.take(15).toSeq
    for ((events, i) <- seqs.zipWithIndex) {
      val expected = events.groupBy(_.user_id).toSeq.flatMap { case (_, es) =>
        val ordered = es.sortBy(e => (e.ts, e.event_id))
        ordered.zipWithIndex.collect { case (e, k) if e.event_type == "purchase" =>
          ordered.take(k).reverse.find(_.event_type != "purchase")
            .map(_.event_type).getOrElse("direct")
        }
      }.groupBy(identity).map { case (touch, v) => touch -> v.size.toLong }
      val out = Funnel.withLastTouch(
          events.toDF().repartition(1 + (i % 4)),
          "user_id", "ts", "event_id", "event_type", convType = "purchase")
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("touch"), lit("direct")).as("touch"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out == expected, s"case $i: $events")
    }
  }

  test("window-cascade funnel equals the sequential fold on random sequences") {
    val seqs = Iterator.from(0)
      .map(i => eventsGen.apply(Gen.Parameters.default, rng.Seed(777L + i)))
      .flatten.take(20).toSeq
    for ((events, i) <- seqs.zipWithIndex) {
      val folded = events.groupBy(_.user_id).map { case (u, es) =>
        u -> Funnel.fold(s1 = false, s2 = false, s3 = false,
          es.sortBy(e => (e.ts, e.event_id)).iterator)
      }
      val windowed = windowFlags(events, parts = 1 + (i % 5))
      assert(windowed == folded, s"case $i: $events")
    }
  }
}
