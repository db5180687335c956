package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Robust per-group outlier detection: median / MAD (median absolute
 * deviation) at 2^-20 fixed-point granularity — the data-quality screen a
 * training pipeline runs over metric columns (event values, doc lengths,
 * score drift) where mean/stddev would be dragged by the very outliers
 * being hunted.
 *
 * Scale shape (the graft.functions.Median argument, extended):
 *
 *  1. ONE corpus aggregation builds the per-(group, bin) histogram —
 *     map-side partial, state bounded by the value range x 2^20, constant
 *     in the corpus size.
 *  2. The MEDIAN comes off that histogram; the DEVIATION histogram is then
 *     derived FROM THE SAME HISTOGRAM (|bin - med_bin| re-binning, counts
 *     summed) — never from a second corpus pass — and the MAD is its
 *     median. Everything after step 1 is bin-universe-sized metadata.
 *  3. The flagging pass re-scans the corpus ONCE, narrow: the one-row-per-
 *     group (med, mad) table broadcasts, and no corpus row ever enters an
 *     exchange.
 *
 * Exactness: `Median.bin` multiplies by 2^20 — an exponent shift, never a
 * rounding — so both engines bin bit-identically; every downstream value
 * (|bin - med|, cumulative counts, the n-MAD gate) is integer arithmetic,
 * reproducible anywhere at any scale.
 */
object Robust {

  /** Per-group (med_bin, mad_bin): exact lower medians of the binned value
    * and of the absolute deviation from it, both derived from one corpus
    * histogram pass. Output: one row per group. */
  def medianMadPerGroup(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    require(!df.columns.exists(Set("__b", "__c", "__d", "med_bin", "mad_bin")),
      "input already has a __b/__c/__d/med_bin/mad_bin column; rename it first")
    val hist = df
      .groupBy(col(groupCol), Median.bin(col(valueCol)).as("__b"))
      .agg(count(lit(1)).as("__c"))
    val med = Median.medianFromHist(hist, groupCol, "__b", "__c")
    // Deviation histogram folds out of the value histogram: |b - med| is a
    // many-to-one re-binning, so summing counts is exact — the corpus is
    // not consulted again.
    val devHist = hist
      .join(broadcast(med), groupCol)
      .groupBy(col(groupCol), abs(col("__b") - col("med_bin")).as("__d"))
      .agg(sum(col("__c")).as("__c"))
    val mad = Median.medianFromHist(devHist, groupCol, "__d", "__c")
      .withColumnRenamed("med_bin", "mad_bin")
    med.join(mad, groupCol)
  }

  /** Per-group winsorized summary: clip the binned value to the group's
    * [pLo, pHi] quantile bins and report counts + the winsorized mean —
    * the outlier-robust location estimate a pipeline clips metric
    * columns with before feeding them to anything mean-based.
    *
    * Same scale shape as [[medianMadPerGroup]]: ONE corpus histogram
    * pass; both quantiles come off the bin-universe frame
    * (`Median.quantileFromHist` with exact rational ranks); the clip
    * pass re-scans the corpus narrowly against the broadcast one-row-
    * per-group bounds. The winsorized mean uses the fixed-point trick
    * (sum of clamped 2^-20 bins as an exact integer, one final double
    * division), so it is order-independent and oracle-reproducible.
    * Output: (group, lo_bin, hi_bin, n, n_lo, n_hi, wmean). */
  def winsorStats(df: DataFrame, groupCol: String, valueCol: String,
      loNum: Int = 5, hiNum: Int = 95, den: Int = 100): DataFrame = {
    require(loNum <= hiNum, "need loNum <= hiNum")
    val hist = df
      .groupBy(col(groupCol), Median.bin(col(valueCol)).as("__b"))
      .agg(count(lit(1)).as("__c"))
    val lo = Median.quantileFromHist(hist, groupCol, "__b", "__c", loNum, den)
      .withColumnRenamed("q_bin", "lo_bin")
    val hi = Median.quantileFromHist(hist, groupCol, "__b", "__c", hiNum, den)
      .withColumnRenamed("q_bin", "hi_bin")
    df.withColumn("__b", Median.bin(col(valueCol)))
      .join(broadcast(lo.join(hi, groupCol)), groupCol)
      .groupBy(col(groupCol), col("lo_bin"), col("hi_bin"))
      .agg(
        count(lit(1)).as("n"),
        sum((col("__b") < col("lo_bin")).cast("long")).as("n_lo"),
        sum((col("__b") > col("hi_bin")).cast("long")).as("n_hi"),
        (sum(least(greatest(col("__b"), col("lo_bin")), col("hi_bin"))).cast("double")
          / (count(lit(1)) * lit(Median.Scale))).as("wmean"))
  }

  /** Rows whose binned value sits more than `nMads` MADs from their
    * group's median — the robust analogue of a z-score > n filter. Adds
    * `dev_bins`, `med_bin`, `mad_bin` to the surviving rows. The (med,
    * mad) table is one row per group (broadcast); the corpus itself never
    * shuffles. A group with mad_bin = 0 (over half its mass in one bin)
    * flags every row off the median bin — the standard MAD caveat; feed a
    * genuinely continuous column. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String, nMads: Int = 3): DataFrame = {
    val mm = medianMadPerGroup(df.select(col(groupCol), col(valueCol)), groupCol, valueCol)
    df.withColumn("__b", Median.bin(col(valueCol)))
      .join(broadcast(mm), groupCol)
      .withColumn("dev_bins", abs(col("__b") - col("med_bin")))
      .filter(col("dev_bins") > lit(nMads.toLong) * col("mad_bin"))
      .drop("__b")
  }
}
