package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: for every left row, attach the attributes of the most recent
 * right row with the same key and `rightTs <= leftTs` — the temporal-enrich
 * operator (events joined to the latest prior dimension state) that Spark
 * has no native form of.
 *
 * Spark-first composition rather than a custom physical operator: both
 * sides are unioned with a side tag and processed by ONE window over
 * (key, ts, side), carrying the last non-null right-attribute struct
 * forward. Exactly one shuffle on the key — the same cost as the equi-join
 * Spark would plan — no broadcast, no range explosion (a range join would
 * go nested-loop in Catalyst), linear in |L|+|R| per key, and skew behaves
 * like any keyed window.
 *
 * Tie semantics: right rows should be unique per (key, ts) — pre-aggregate
 * multiplicities away (mirrors DuckDB's ASOF JOIN time-series assumption).
 * Equal timestamps match (`<=`): the right row sorts before the left row
 * at the same ts. Left rows with no prior right row get nulls (left-outer).
 */
object AsOfJoin {

  /**
   * @param left    probe side
   * @param right   time-series side, unique per (key, ts)
   * @param key     equality key column name (same name both sides)
   * @param leftTs  left event-time column (cast to long for ordering)
   * @param rightTs right event-time column
   * @param attrs   right columns to carry: rightName -> outputName
   */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      attrs: Map[String, String]): DataFrame =
    asofImpl(left, right, key, leftTs, rightTs, attrs, forward = false)

  /** Forward as-of: the NEAREST FOLLOWING right row (`rightTs >= leftTs`)
    * instead of the most recent prior one — "time to next purchase",
    * label-attachment windows, next-state enrichment. Same one-shuffle
    * union+window composition, same tie semantics (equal timestamps
    * match); only the ordering direction flips. */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      attrs: Map[String, String]): DataFrame =
    asofImpl(left, right, key, leftTs, rightTs, attrs, forward = true)

  private def asofImpl(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      attrs: Map[String, String],
      forward: Boolean): DataFrame = {
    val outAttrs = attrs.toSeq
    val passthrough = left.columns.toSeq.filterNot(c => c == key || c == leftTs)
    val collisions = outAttrs.map(_._2).filter(o => o == key || o == leftTs || passthrough.contains(o))
    require(collisions.isEmpty,
      s"output attr name(s) collide with left columns: ${collisions.mkString(", ")}")

    // NULL timestamps never match (DuckDB ASOF's comparison semantics):
    // null-ts right rows are dropped, and the orderings below pin null-ts
    // LEFT rows to sort before every right row in frame order (asc ->
    // nulls first; desc -> nulls FIRST explicitly, where Spark's default
    // desc puts nulls last and would hand a null-ts left row the
    // minimum-ts right match).
    val r = right.filter(col(rightTs).isNotNull).select(
      col(key), col(rightTs).cast("long").as("__ts"), lit(0).as("__side"),
      struct(outAttrs.map { case (rc, out) => col(rc).as(out) }: _*).as("__attrs"))
    val rPadded = r.select(
      col(key) +: col("__ts") +: col("__side") +: col("__attrs") +:
        passthrough.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      col(key) +: col(leftTs).cast("long").as("__ts") +: lit(1).as("__side") +:
        lit(null).cast(r.schema("__attrs").dataType).as("__attrs") +:
        passthrough.map(col): _*)

    // Backward: ascending ts, carry the last prior right row forward.
    // Forward: DESCENDING ts, so "previous rows in frame" are the LATER
    // timestamps and the carried row is the nearest following one. In
    // both directions right rows (__side = 0) sort before the left row
    // at an equal timestamp, so equal ts matches.
    val ord = if (forward) col("__ts").desc_nulls_first else col("__ts").asc_nulls_first
    val w = Window.partitionBy(col(key)).orderBy(ord, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rPadded.unionByName(l)
      .withColumn("__m", last(col("__attrs"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col(key) +: col("__ts").as(leftTs) +: passthrough.map(col) ++:
        outAttrs.map { case (_, out) => col(s"__m.$out").as(out) }: _*)
  }
}
