package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Change-data-capture primitives for incremental corpus maintenance: log
 * compaction (latest record per key wins) and snapshot diffing (the
 * merge/upsert change feed between two corpus versions). A training-data
 * pipeline receives its corpus as either an append-only mutation log or
 * periodic full snapshots; these are the two operators that turn either
 * form into "what changed", which every incremental stage downstream
 * (re-dedup, re-embed, re-pack) keys on.
 *
 * 100 TB shape: each operator moves the corpus through exactly ONE keyed
 * shuffle. [[compactLog]] is a map-side-combining `max(struct)`
 * aggregation — the shuffle carries one partially-compacted struct per
 * key per map partition, never the raw log. [[snapshotDiff]] is a single
 * full-outer equi-join on the key: AQE-splittable, and deliberately
 * UN-hinted — both snapshots are corpus-scale, so no broadcast
 * assumption is safe (the dedup_keep lesson).
 */
object Cdc {

  /** Log compaction — one row per key, the record with the greatest
    * `versionCols` tuple wins (Kafka's compacted-topic semantics as a
    * batch operator). The comparison is the lexicographic struct order
    * over `versionCols ++ payloadCols`, so the winner is deterministic
    * even on version ties — the payload breaks the tie, never arrival
    * order. Appends `n_versions`, the number of log records compacted
    * into each surviving row.
    *
    * The aggregation state is ONE struct per key — constant-size and
    * mergeable — so `max` partial-aggregates map-side and the shuffle
    * carries compacted keys only. The same call works unchanged on a
    * streaming DataFrame in update/complete mode (it is a plain
    * streaming aggregation; see StreamingSpec). */
  def compactLog(
      df: DataFrame,
      keyCols: Seq[String],
      versionCols: Seq[String],
      payloadCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && versionCols.nonEmpty, "need key and version columns")
    val ordered = struct((versionCols ++ payloadCols).map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(max(ordered).as("__last"), count(lit(1)).as("n_versions"))
      .select(keyCols.map(col) ++
        (versionCols ++ payloadCols).map(c => col(s"__last.`$c`").as(c)) :+
        col("n_versions"): _*)
  }

  /** Snapshot diff — the CDC change feed that turns two full corpus
    * snapshots into a merge/upsert log: one row per CHANGED key with
    * `op` ∈ {'I','U','D'} and the old/new value of every compare column.
    * Keys whose compare columns are all null-safe-equal are dropped.
    * Presence is tracked with literal marker columns added before the
    * join, so a key that exists with all-NULL compare values is an
    * update/delete, never misread as an insert. */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty, "need key and compare columns")
    val o = oldDf.select(
      keyCols.map(col) ++ compareCols.map(c => col(c).as(s"old_$c")) :+ lit(1).as("__op"): _*)
    val n = newDf.select(
      keyCols.map(col) ++ compareCols.map(c => col(c).as(s"new_$c")) :+ lit(1).as("__np"): _*)
    val changed = compareCols.map(c => !(col(s"old_$c") <=> col(s"new_$c"))).reduce(_ || _)
    o.join(n, keyCols, "full_outer")
      .withColumn("op",
        when(col("__op").isNull, lit("I"))
          .when(col("__np").isNull, lit("D"))
          .when(changed, lit("U")))
      .filter(col("op").isNotNull)
      .select(keyCols.map(col) ++ (col("op") +:
        compareCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c")))): _*)
  }

  /** SCD Type-2 history build — the third CDC form: an attribute's full
    * validity-interval history per key, from an event/mutation log. Where
    * [[compactLog]] answers "what is the value NOW", this answers "what
    * was the value WHEN": one row per (key, change point) carrying the
    * new attribute value, `valid_from` (the change's version), `valid_to`
    * (the NEXT change's version; null = current), and `version_n` (1-based
    * change ordinal). A log record is a change point iff its attribute
    * differs from the key's previous record (IS DISTINCT FROM — null
    * transitions count).
    *
    * One exchange: both windows (the change-detection lag and the
    * valid_to lead) and the change ordinal ride the same
    * partitionBy(key) ordering, so Spark plans a single sort+shuffle;
    * state per task is one row of lookahead. `orderCols` must be a
    * deterministic total order within each key (include a unique
    * tiebreaker — the same contract as compactLog's version tuple). */
  def scd2History(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      attrCol: String): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty, "need key and order columns")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val versionTuple = struct(orderCols.map(col): _*)
    val changed = df
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .withColumn("__first", row_number().over(w) === 1)
      // First record per key always opens an interval; later records only
      // on a value transition (null-safe, so value->null and null->value
      // both close/open intervals).
      .filter(col("__first") || !(col(attrCol) <=> col("__prev")))
    changed
      .withColumn("valid_from", versionTuple)
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("version_n", row_number().over(w).cast("long"))
      .select(keyCols.map(col) ++ Seq(
        col(attrCol),
        col("valid_from"),
        col("valid_to"),
        col("version_n")): _*)
  }
}
