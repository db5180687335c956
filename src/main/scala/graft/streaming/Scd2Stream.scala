package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One attribute observation on a keyed mutation stream (ts epoch nanos;
  * event_id breaks ties). `attr` may be null — null transitions count. */
final case class AttrEvent(key: Long, ts: Long, event_id: Long, attr: String)

/** An emitted SCD2 change point: `attr` became current for `key` at
  * (from_ts, from_event), as change number `version_n`. The interval is
  * OPEN — the next emitted change for the same key closes it, exactly the
  * CDC change-feed contract (a consumer folds valid_to locally; an
  * unbounded stream cannot know valid_to at emission time). */
final case class Scd2Change(
    key: Long, attr: String, from_ts: Long, from_event: Long, version_n: Long)

/**
 * Streaming face of `Cdc.scd2History`: per-key attribute-transition
 * change points over an unbounded mutation stream.
 *
 * State per key is the last seen attribute plus a change counter — two
 * fields, O(keys) total — via `flatMapGroupsWithState` in Append mode:
 * each micro-batch folds its events in (ts, event_id) order and emits one
 * [[Scd2Change]] per detected transition (null-safe, matching the batch
 * operator's IS DISTINCT FROM). Across batches the fold follows delivery
 * order, so the emitted feed equals the batch operator's open intervals
 * whenever each key's events arrive in order (a topic partitioned by key)
 * — the same at-least-once posture as the other streaming faces. Replay
 * of an already-folded event is idempotent: an attribute equal to the
 * state's last never re-emits.
 */
object Scd2Stream {

  final case class Scd2State(hasLast: Boolean, last: String, version: Long)

  def changes(events: Dataset[AttrEvent]): Dataset[Scd2Change] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[Scd2State, Scd2Change](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, batch: Iterator[AttrEvent], state: GroupState[Scd2State]) =>
          var st = state.getOption.getOrElse(Scd2State(hasLast = false, null, 0L))
          val out = Seq.newBuilder[Scd2Change]
          for (e <- batch.toSeq.sortBy(e => (e.ts, e.event_id)))
            if (!st.hasLast || st.last != e.attr) {
              st = Scd2State(hasLast = true, e.attr, st.version + 1)
              out += Scd2Change(key, e.attr, e.ts, e.event_id, st.version)
            }
          state.update(st)
          out.result().iterator
      }
  }
}
