package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Bounded-memory exact median at fixed-point granularity — the scale-safe
 * replacement for `percentile(value, 0.5)` over a continuous double.
 *
 * Spark's exact `Percentile` aggregate materializes a value→count map PER
 * GROUP inside one aggregation buffer; over a continuous score the map
 * holds O(group rows) distinct doubles on a single executor — an OOM at
 * 100 TB with a handful of language groups. (Over a bounded-integer column
 * like `n_chars` the buffer is bounded by the distinct-value universe,
 * which is why `q24_quantiles` keeps the built-in.)
 *
 * This operator instead bins the value at 2^-20 fixed-point granularity
 * and takes the exact lower median OF THE BINNED VALUE:
 *
 *  1. histogram: `groupBy(group, bin).count` — partial map-side
 *     aggregation; state is one counter per (group, bin), bounded by the
 *     value RANGE × 2^20 (for the quality score, range ⊆ [-5, 2] ⇒
 *     ≤ 7.4 M bins), CONSTANT in the corpus size, and spillable/mergeable
 *     like any hash aggregate. The shuffle carries one row per occupied
 *     bin, never one per document.
 *  2. median bin: one cumulative-count window PARTITIONED BY the group
 *     over the occupied bins only — each window partition holds at most
 *     the bin universe, again constant in the corpus.
 *
 * Exactness: `floor(v * 2^20)` multiplies by a power of two — an exponent
 * shift, never a rounding — so both engines (and the DuckDB oracle) bin
 * bit-identically, and the result is the true median rounded down to
 * 2^-20. The gate `bin(v) >= medBin` is therefore exactly
 * `v >= medBin * 2^-20`: a deterministic keep-set, reproducible anywhere.
 *
 * Precondition: the value must have a bounded range (true for any
 * ratio-of-counts score); the bin universe — and the memory bound — is
 * `range × 2^20`.
 */
object Median {

  /** 2^20: fixed-point scale. Power of two ⇒ `v * Scale` is exact. */
  val Scale = 1048576.0

  /** `floor(v * 2^20)` as a long — the bin id. */
  def bin(value: Column): Column = floor(value * lit(Scale)).cast(LongType)

  /** Per-group lower median of `binCol`: the smallest bin b such that at
    * least `ceil(n/2)` of the group's rows fall in bins <= b. Output:
    * one row per group, `(groupCol, med_bin)`. */
  def binnedMedianPerGroup(df: DataFrame, groupCol: String, binCol: String): DataFrame =
    medianFromHist(
      df.groupBy(col(groupCol), col(binCol)).agg(count(lit(1)).as("c")),
      groupCol, binCol, "c")

  /** [[binnedMedianPerGroup]] over a PRE-AGGREGATED histogram
    * `(groupCol, binCol, cntCol)` — lets a caller derive several medians
    * (e.g. median + MAD, graft.functions.Robust) from ONE corpus pass:
    * every input here is already bin-universe-sized, so the windows and
    * the weighted cumulative count never see corpus rows. Output:
    * one row per group, `(groupCol, med_bin)`. */
  def medianFromHist(hist: DataFrame, groupCol: String, binCol: String, cntCol: String): DataFrame =
    quantileFromHist(hist, groupCol, binCol, cntCol, 1, 2)
      .withColumnRenamed("q_bin", "med_bin")

  /** General lower quantile over a pre-aggregated histogram: the smallest
    * bin holding the ceil(n * num / den)-th row of its group. num/den as
    * an exact rational — `(n * num + den - 1) div den` is integer
    * arithmetic at any group size, where a double `n * q` drifts past
    * 2^53 rows (num=1, den=2 is the lower median). Output: one row per
    * group, `(groupCol, q_bin)`. */
  def quantileFromHist(hist: DataFrame, groupCol: String, binCol: String, cntCol: String,
      num: Int, den: Int): DataFrame = {
    require(num >= 0 && num <= den && den >= 1, "need 0 <= num <= den, den >= 1")
    val cumW = Window.partitionBy(col(groupCol)).orderBy(col(binCol))
    val allW = Window.partitionBy(col(groupCol))
    hist
      .withColumn("cum", sum(col(cntCol)).over(cumW))
      .withColumn("n", sum(col(cntCol)).over(allW))
      .filter(col("cum") >= expr(s"(n * $num + ${den - 1}) div $den"))
      .groupBy(col(groupCol))
      .agg(min(col(binCol)).as("q_bin"))
  }

  /** Keep rows at or above their group's binned median of `valueCol` —
    * "the best half per group". The median table is one row per group
    * (broadcast); the corpus itself is never shuffled by the gate. */
  def gateAtBinnedMedian(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    require(!df.columns.exists(c => c == "__qb" || c == "med_bin"),
      "input already has a __qb/med_bin column; rename it before gating")
    val binned = df.withColumn("__qb", bin(col(valueCol)))
    val med = binnedMedianPerGroup(
      binned.select(col(groupCol), col("__qb")), groupCol, "__qb")
    binned
      .join(broadcast(med), groupCol)
      .filter(col("__qb") >= col("med_bin"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }
}
