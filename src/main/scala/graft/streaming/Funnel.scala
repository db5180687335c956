package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One event on the funnel path (ts in epoch nanos; event_id breaks ties). */
final case class FunnelEvent(user_id: Long, ts: Long, event_id: Long, event_type: String)

/** A user's funnel progress: reached view / click-after-view /
  * purchase-after-that-click. Flags are monotone — they never unset. */
final case class FunnelStage(user_id: Long, s1: Boolean, s2: Boolean, s3: Boolean)

/**
 * Streaming face of the ordered funnel (`funnel_conv`): per-user
 * view → click → purchase progress over an unbounded event stream.
 *
 * State is three monotone booleans per user — a dozen bytes, O(users)
 * total, the smallest state any funnel can carry — via
 * `mapGroupsWithState` in Update mode: each micro-batch emits the current
 * stage record for every user that appeared, and a downstream aggregation
 * turns stages into conversion counts. Events fold in (ts, event_id)
 * order WITHIN a batch; across batches the fold follows delivery order,
 * so the result is exactly the batch operator's whenever each user's
 * events arrive in order (e.g. a Kafka topic partitioned by user) — the
 * same at-least-once posture as the other streaming faces, and replay
 * is idempotent because the flags are monotone. A later step counts only
 * when a STRICTLY earlier event completed the previous one (the
 * sequential fold sees only prior events), matching `funnel_conv`'s
 * strictly-preceding window frame.
 */
object Funnel {

  /** Batch-side stage markers: adds `is_s1` (this row is a view), `is_s2`
    * (a click some STRICTLY earlier event of the user made count by
    * completing step 1), and `is_s3` (a purchase strictly after such a
    * click) — cascaded strictly-preceding ROWS-frame windows over ONE
    * (user, ts, id) ordering, so every caller shares a single exchange
    * AND a single implementation: a frame-boundary edit here (e.g. -1 vs
    * 0, which would weaken "strictly earlier" to "earlier-or-same")
    * cannot drift between `funnel_conv`, `funnel_by_cohort`, and the
    * property spec that cross-checks the fold. All input columns pass
    * through. */
  def withStageMarkers(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String): DataFrame = {
    val prior = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df
      .withColumn("is_s1", when(col(typeCol) === "view", 1).otherwise(0))
      .withColumn("__s1_seen", max(col("is_s1")).over(prior))
      .withColumn("is_s2",
        when(col(typeCol) === "click" && col("__s1_seen") === 1, 1).otherwise(0))
      .withColumn("__s2_seen", max(col("is_s2")).over(prior))
      .withColumn("is_s3",
        when(col(typeCol) === "purchase" && col("__s2_seen") === 1, 1).otherwise(0))
      .drop("__s1_seen", "__s2_seen")
  }

  /** [[withStageMarkers]] with a conversion HORIZON: a step counts only
    * when the previous step completed within `horizonNanos` BEFORE it —
    * the industry-standard windowed attribution form ("click within a
    * day of a view, purchase within a day of that click"). The cascade
    * swaps the unbounded ROWS frame for a value RANGE frame
    * [-horizon, -1] (inclusive at both ends — a previous step at exactly
    * ts - horizon qualifies): same single user exchange, and the frame bound is
    * by event-time VALUE, so same-timestamp ties are excluded entirely
    * (strictly-earlier by time, not by row). */
  def withStageMarkersWithin(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      horizonNanos: Long): DataFrame = {
    require(horizonNanos > 0, "horizonNanos must be positive")
    val recent = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol))
      .rangeBetween(-horizonNanos, -1)
    df
      .withColumn("is_s1", when(col(typeCol) === "view", 1).otherwise(0))
      .withColumn("__s1_recent", max(col("is_s1")).over(recent))
      .withColumn("is_s2",
        when(col(typeCol) === "click" && col("__s1_recent") === 1, 1).otherwise(0))
      .withColumn("__s2_recent", max(col("is_s2")).over(recent))
      .withColumn("is_s3",
        when(col(typeCol) === "purchase" && col("__s2_recent") === 1, 1).otherwise(0))
      .drop("__s1_recent", "__s2_recent")
  }

  /** Last-touch attribution marker: on every row, `touch` = the
    * `typeCol` of the user's most recent STRICTLY earlier event whose
    * type differs from `convType` (null when no prior touch exists — the
    * "direct" conversion). One `last(..., ignoreNulls)` over the same
    * strictly-preceding (user, ts, id) ROWS frame the funnel cascade
    * uses, so attribution and funnel stages can ride one exchange when
    * composed. The caller filters to `typeCol === convType` rows and
    * rolls credit up per touch — per-user window, never a global one. */
  def withLastTouch(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      convType: String): DataFrame = {
    val prior = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("touch",
      last(when(col(typeCol) =!= convType, col(typeCol)), ignoreNulls = true)
        .over(prior))
  }

  /** Fold a user's in-order events into their funnel flags. */
  private[graft] def fold(
      s1: Boolean, s2: Boolean, s3: Boolean,
      ordered: Iterator[FunnelEvent]): (Boolean, Boolean, Boolean) = {
    var (a, b, c) = (s1, s2, s3)
    for (e <- ordered) e.event_type match {
      case "click" if a    => b = true
      case "purchase" if b => c = true
      case "view"          => a = true
      case _               => ()
    }
    (a, b, c)
  }

  /** Funnel flags are CUMULATIVE lifetime state (a user who viewed last
    * month still counts as s1), so state here deliberately has no TTL —
    * expiring it would change the semantics, not just bound memory; cap
    * the user universe upstream if it is genuinely unbounded. */
  def stageStream(events: Dataset[FunnelEvent]): Dataset[FunnelStage] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelStage, FunnelStage](
        GroupStateTimeout.NoTimeout()) {
        (user: Long, batch: Iterator[FunnelEvent], state: GroupState[FunnelStage]) =>
          val prev = state.getOption.getOrElse(FunnelStage(user, s1 = false, s2 = false, s3 = false))
          val (a, b, c) = fold(prev.s1, prev.s2, prev.s3,
            batch.toSeq.sortBy(e => (e.ts, e.event_id)).iterator)
          val next = FunnelStage(user, a, b, c)
          state.update(next)
          next
      }
  }

  /** Streaming face of [[withLastTouch]]: per-user state is ONE string —
    * the type of the last non-`convType` event seen so far (the smallest
    * state last-touch attribution can carry). Each micro-batch folds its
    * events in (ts, event_id) order and EMITS one credit row per
    * conversion (Append semantics via `flatMapGroupsWithState`):
    * `(user_id, event_id, touch)` with touch = "direct" when no prior
    * touch exists — exactly the batch operator's per-purchase rows
    * whenever each user's events arrive in order (the Kafka
    * partitioned-by-user posture the other faces assume; replays
    * re-emit, keyed by the conversion's unique event_id so downstream
    * dedup is a key filter).
    *
    * Unlike [[stageStream]]'s cumulative flags, touch state goes STALE
    * once the attribution window closes, and the user population is
    * unbounded — so `idleTtl` (a duration string, e.g. "30 days") bounds
    * state with a processing-time timeout: a user idle past the TTL has
    * their one-string state dropped and their next conversion attributes
    * as "direct", which is the correct semantics for an expired window.
    * None keeps the unbounded posture for bounded user universes.
    *
    * With `idleTtl` set, run the query with an explicit trigger interval
    * (e.g. `Trigger.ProcessingTime("1 minute")`): processing-time
    * timeouts make every trigger run a state-check micro-batch, so the
    * default as-fast-as-possible trigger degenerates into a busy loop of
    * empty batches (observed: ~14 batches/s on an idle MemoryStream). */
  def lastTouchStream(events: Dataset[FunnelEvent], convType: String,
      idleTtl: Option[String] = None): Dataset[TouchCredit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastTouchState, TouchCredit](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        timeoutConf) {
        (user: Long, batch: Iterator[FunnelEvent], state: GroupState[LastTouchState]) =>
          if (state.hasTimedOut) {
            state.remove() // idle past the TTL: drop the stale touch
            Iterator.empty
          } else {
            val (credits, touch) = lastTouchFold(
              user, state.getOption.flatMap(_.touch), convType,
              batch.toSeq.sortBy(e => (e.ts, e.event_id)))
            state.update(LastTouchState(touch))
            idleTtl.foreach(state.setTimeoutDuration)
            credits.iterator
          }
      }
  }

  /** One micro-batch of the last-touch fold — the pure core of
    * [[lastTouchStream]], extracted so the TTL semantics (timeout drops
    * state → `prior = None` → "direct") are unit-testable without a live
    * timeout-triggering query. Returns (credits to emit, next touch). */
  private[graft] def lastTouchFold(
      user: Long,
      prior: Option[String],
      convType: String,
      ordered: Seq[FunnelEvent]): (Seq[TouchCredit], Option[String]) = {
    var touch = prior
    val out = scala.collection.mutable.ArrayBuffer.empty[TouchCredit]
    for (e <- ordered) {
      if (e.event_type == convType)
        out += TouchCredit(user, e.event_id, touch.getOrElse("direct"))
      else touch = Some(e.event_type)
    }
    (out.toSeq, touch)
  }
}

/** [[Funnel.lastTouchStream]] state: the user's most recent non-conversion
  * event type (None before any touch). */
final case class LastTouchState(touch: Option[String])

/** One attributed conversion: `event_id` is the conversion event's unique
  * id (the replay-dedup key); `touch` the credited channel. */
final case class TouchCredit(user_id: Long, event_id: Long, touch: String)
