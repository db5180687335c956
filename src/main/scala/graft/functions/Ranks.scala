package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/**
 * Distribution window functions (percent_rank / cume_dist / ntile) WITHOUT
 * a whole-group window partition — the scale path for per-group ranking.
 *
 * The built-in form (`Window.partitionBy(grp).orderBy(ord)`) funnels every
 * row of a group through ONE task; with few, huge groups (market segments,
 * languages) that is a single-task sort of corpus/|groups| rows at 100 TB —
 * the same funnel the three-level prefix sum removes from `pack_sequences`.
 * This operator applies that trick to ranking:
 *
 *  1. bin rows by the integer floor of the order value — a map-side
 *     projection;
 *  2. count rows per (group, bin) — mergeable partial aggregation; the
 *     shuffle carries one row per OCCUPIED BIN, never per input row;
 *  3. a window over the bin-count frame (partitioned by group, rows =
 *     occupied bins per group — value-domain-bounded, metadata-scale like
 *     pack_sequences' superbucket totals) yields each bin's cumulative
 *     predecessor count;
 *  4. rank within a bin is a window partitioned by (group, bin) — the
 *     partition is one bin's occupancy, not one group's corpus share;
 *  5. exact rank = predecessors + intra-bin row_number, and every
 *     distribution function is integer arithmetic on (rank, n):
 *     percent_rank = (r-1)/(n-1) (0.0 for the n=1 group, the SQL rule),
 *     cume_dist = r/n (exact because the (ord, tie) key is unique),
 *     ntile   = the standard big-buckets-first split via integer div.
 *
 * Values are bit-identical to the built-ins (RanksSpec asserts it; the
 * oracle runs the plain WINDOW SQL). Requires (ord, tie) unique per group —
 * the same condition that makes the built-in's output deterministic at all.
 * Worst case degrades gracefully: if every row of a group lands in one bin
 * (a constant order value), step 4's partition is the group itself — the
 * built-in's funnel, no worse; real value distributions spread.
 */
object Ranks {

  /** Adds `rank`, plus `pct_rank`, `cume` and `quartile`-style columns.
    * @param tiles ntile bucket count (the output column is named per
    *              `tileCol`).
    * @param binScale multiplier applied before flooring into bins. Bins are
    *                 INTERNAL (never in the output, no cross-engine
    *                 concern) — their only job is spreading each group over
    *                 many intra-bin partitions. Match it to the order
    *                 value's spread: 1.0 for values spanning thousands of
    *                 integers (spend in dollars); 2^20 for a bounded
    *                 continuous score in [-10, 10] (the Median trick —
    *                 without it such a score occupies ~20 integer bins and
    *                 each intra-bin partition is still corpus/20·|groups|). */
  def distributionRanks(
      df: DataFrame,
      grp: String,
      ord: Column,
      tie: Column,
      tiles: Int,
      rankCol: String = "rank",
      pctCol: String = "pct_rank",
      cumeCol: String = "cume",
      tileCol: String = "quartile",
      binScale: Double = 1.0): DataFrame = {
    require(tiles > 0, "tiles must be positive")
    require(binScale > 0, "binScale must be positive")
    // Fail fast on collisions/injection instead of silently overwriting a
    // caller column (withColumn replaces in place) or breaking the
    // integer-div SQL below.
    val internal = Seq("__bin", "__before", "__n")
    val outputs = Seq(rankCol, pctCol, cumeCol, tileCol)
    val clash = (internal ++ outputs).filter(df.columns.contains)
    require(clash.isEmpty, s"input columns collide with rank outputs/internals: ${clash.mkString(", ")}")
    require(!rankCol.contains("`"), "rankCol must not contain backticks")
    // Special-value bins, matching the built-in window's value order
    // exactly: NULL sorts FIRST (nulls-first ascending) → bottom bin; NaN
    // sorts LAST (after +Infinity) → top bin; ±Infinity itself is safe
    // because the long cast saturates to Long.{Max,Min}Value. Shared bins
    // (NULL with -Inf, NaN with +Inf) are fine — the intra-bin (ord, tie)
    // sort restores the exact order inside them.
    val binned = df.withColumn("__bin",
      when(ord.isNull, lit(Long.MinValue))
        .when(isnan(ord), lit(Long.MaxValue))
        .otherwise(floor(ord * lit(binScale)).cast(LongType)))
    val binCounts = binned
      .groupBy(col(grp), col("__bin"))
      .agg(count(lit(1)).as("__c"))
    val wBins = Window.partitionBy(col(grp)).orderBy(col("__bin"))
    val wGrp = Window.partitionBy(col(grp))
    // (group, bin) -> rows in earlier bins of the same group, plus the
    // group total — both window sums over the SAME metadata-scale bin
    // frame, so the corpus-frame join below stays the plan's only join.
    val cum = binCounts
      .withColumn("__before", sum(col("__c")).over(wBins) - col("__c"))
      .withColumn("__n", sum(col("__c")).over(wGrp))
      .drop("__c")
    val wIntra = Window.partitionBy(col(grp), col("__bin")).orderBy(ord, tie)
    val r = col(rankCol)
    // Null-safe (<=>) group keys: a NULL group is a real ranking partition
    // for the built-in window, so an EqualTo join would silently drop its
    // rows. Still an equi-join (EqualNullSafe keys) — AQE broadcast applies.
    val ranked = binned
      .join(cum.withColumnRenamed(grp, "__cg").withColumnRenamed("__bin", "__cbin"),
        col(grp) <=> col("__cg") && col("__bin") === col("__cbin"))
      .drop("__cg", "__cbin")
      .withColumn(rankCol, col("__before") + row_number().over(wIntra))
    // All-integer ntile: big-buckets-first split, lazy CASE keeps the
    // qd = 0 (n < tiles) arm from ever dividing by zero.
    val qd = expr(s"`__n` div $tiles")
    val rem = col("__n") % tiles
    ranked
      .withColumn(pctCol,
        when(col("__n") === 1, lit(0.0))
          .otherwise((r - 1).cast(DoubleType) / (col("__n") - 1).cast(DoubleType)))
      .withColumn(cumeCol, r.cast(DoubleType) / col("__n").cast(DoubleType))
      .withColumn(tileCol,
        when(r <= (qd + 1) * rem,
          expr(s"(`$rankCol` - 1) div (`__n` div $tiles + 1)") + 1)
          .otherwise(rem +
            expr(s"(`$rankCol` - 1 - (`__n` div $tiles + 1) * (`__n` % $tiles)) div (`__n` div $tiles)") + 1)
          .cast("int"))
      .drop("__bin", "__before", "__n")
  }
}
