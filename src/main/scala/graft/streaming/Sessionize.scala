package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One user event on the sessionization path (ts in epoch nanos). */
final case class SessionEvent(user_id: Long, ts: Long)

/** A closed session. */
final case class UserSession(
    user_id: Long,
    session_id: Long,
    n_events: Long,
    start_ts: Long,
    end_ts: Long)

private final case class SessionState(
    sessionId: Long,
    nEvents: Long,
    startTs: Long,
    endTs: Long)

/**
 * Gap-based sessionization: consecutive events of a user belong to one
 * session while the gap between them stays <= `gapNanos`.
 *
 * Two implementations with identical semantics:
 *  - '''batch''': two window functions — a lag to flag session starts, a
 *    running sum to number them — then one aggregation. Exactly one shuffle
 *    on user_id (Catalyst reuses the hash partitioning across both windows
 *    and the final groupBy).
 *  - '''streaming''': `flatMapGroupsWithState` with event-time timeout —
 *    the engine-managed-state form that scales to unbounded keys; closed
 *    sessions are emitted as the watermark passes their gap horizon.
 */
object Sessionize {

  /** Batch sessionization. Input needs (userCol: long, tsCol: long nanos).
    * Output: user_id, session_id (1-based per user), n_events, start_ts,
    * end_ts. Deterministic without a tie-break: equal-ts events of a user
    * have gap 0 <= gapNanos, so they land in the same session whatever
    * order the window visits them, and every output aggregate
    * (count/min/max) is order-insensitive. */
  def batchSessions(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      gapNanos: Long): DataFrame =
    // ONE implementation of the gap rule: withSessionIds is the shared
    // session-numbering core (a boundary edit there cannot desynchronize
    // this aggregate face from session_paths' per-event face).
    withSessionIds(
        df.select(col(userCol).cast("long").as("user_id"), col(tsCol).cast("long").as("ts")),
        "user_id", "ts", gapNanos, orderCols = Seq("ts"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("start_ts"),
        max(col("ts")).as("end_ts"))

  /** Per-event session assignment: adds `session_id` (1-based per user,
    * same 30-min-gap rule as [[batchSessions]]) while KEEPING every input
    * column — for consumers that need the events themselves (path mining,
    * per-session features), where batchSessions collapses to aggregates.
    * `orderCols` must totally order a user's events (include a unique
    * tiebreaker); session BOUNDARIES are tie-insensitive (equal-ts events
    * have gap 0), the explicit order matters only for downstream
    * order-sensitive consumers. Lag, running sum, and any later
    * groupBy(user, session) all ride ONE user exchange.
    *
    * `session_id` (output) and `__prev_ts`/`__new_s` (scratch) are
    * RESERVED names: `withColumn` replaces by name, so a pre-existing
    * column would be silently overwritten — guarded with a require. */
  def withSessionIds(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      gapNanos: Long,
      orderCols: Seq[String]): DataFrame = {
    val reserved = Seq("__prev_ts", "__new_s", "session_id").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"withSessionIds reserves column name(s) ${reserved.mkString(", ")} — rename them on the input frame")
    val byUser = Window.partitionBy(col(userCol)).orderBy(orderCols.map(col): _*)
    df
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(byUser))
      .withColumn(
        "__new_s",
        when(col("__prev_ts").isNull || col(tsCol) - col("__prev_ts") > gapNanos, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__new_s")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev_ts", "__new_s")
  }

  /** Streaming sessionization over an event-time watermarked stream.
    * Emits a session when `gap` passes with no new event for the user
    * (event-time timeout driven by the watermark). */
  def streamingSessions(
      events: Dataset[SessionEvent],
      gapNanos: Long): Dataset[UserSession] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    events
      .withColumn("event_time", timestamp_micros((col("ts") / 1000L).cast("long")))
      .withWatermark("event_time", "30 minutes")
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(UserSession(userId, s.sessionId, s.nEvents, s.startTs, s.endTs))
          } else {
            val sortedTs = rows.map(_._2).toSeq.sorted
            var closed = List.empty[UserSession]
            var cur = state.getOption
            var nextId = cur.map(_.sessionId).getOrElse(0L)
            sortedTs.foreach { ts =>
              cur match {
                case Some(s) if ts - s.endTs <= gapNanos =>
                  cur = Some(s.copy(nEvents = s.nEvents + 1, endTs = math.max(s.endTs, ts)))
                case Some(s) =>
                  closed ::= UserSession(userId, s.sessionId, s.nEvents, s.startTs, s.endTs)
                  nextId = s.sessionId + 1
                  cur = Some(SessionState(nextId, 1L, ts, ts))
                case None =>
                  nextId += 1
                  cur = Some(SessionState(nextId, 1L, ts, ts))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // Close the open session once the watermark passes its gap.
              state.setTimeoutTimestamp((s.endTs + gapNanos) / 1000000L)
            }
            closed.reverseIterator
          }
      }
  }
}
