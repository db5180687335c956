package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Watermarked stream-stream interval joins — the correlation stage
 * (impression ↔ click attribution, request ↔ response pairing) that a
 * streaming pipeline cannot express as a stream-static join because BOTH
 * sides are unbounded.
 *
 * State is the scale concern, and watermarks are the answer: with both
 * sides watermarked and the join condition bounding event-time distance,
 * Spark buffers each side only until the other side's watermark passes
 * the interval — join state is O(rate × (delay + interval)), constant in
 * stream lifetime, NOT O(stream). An un-watermarked stream-stream join
 * buffers forever; this wrapper makes the bounded form the only
 * constructible one (both watermarks and the interval are required).
 *
 * Output semantics (engine-defined, asserted by StreamingSpec):
 *  - inner: a match emits as soon as both rows have arrived;
 *  - left outer: additionally emits (left, null) once the RIGHT side's
 *    watermark passes the point where a match could still arrive — so
 *    outer rows trail by the watermark delay, the price of correctness
 *    under out-of-order data.
 */
object StreamJoin {

  /** Inner interval join:
    * `left.key = right.key AND right.time ∈ [left.time - before, left.time + after]`.
    * Columns are prefixed (`l_`/`r_`) to keep the output unambiguous. */
  def interval(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      before: String,
      after: String,
      delay: String,
      joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left_outer").contains(joinType),
      s"joinType must be inner or left_outer, got $joinType")
    val l = prefixed(left, "l_").withWatermark(s"l_$leftTimeCol", delay)
    val r = prefixed(right, "r_").withWatermark(s"r_$rightTimeCol", delay)
    l.join(r,
      col(s"l_$keyCol") === col(s"r_$keyCol") &&
        col(s"r_$rightTimeCol") >= col(s"l_$leftTimeCol") - expr(s"INTERVAL $before") &&
        col(s"r_$rightTimeCol") <= col(s"l_$leftTimeCol") + expr(s"INTERVAL $after"),
      joinType)
  }

  private def prefixed(df: DataFrame, p: String): DataFrame =
    df.select(df.columns.map(c => col(c).as(p + c)): _*)
}
