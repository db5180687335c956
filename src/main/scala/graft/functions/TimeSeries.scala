package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/**
 * Time-series resampling primitives over the epoch-nanos-long event-time
 * contract (see SparkEntry.t): OHLC bar aggregation (the financial
 * downsample: first/last/min/max of a value per time bucket) and
 * time-weighted aggregation (the IoT/sensor downsample: integrate a
 * step-function signal over its holding durations, so irregular sampling
 * does not bias the mean toward chatty periods).
 *
 * 100 TB shape: ohlcBars is one window + one aggregation over the SAME
 * (bucket, key) hash partitioning — EnsureRequirements reuses the window's
 * exchange for the agg, so the operator moves the events through exactly
 * one shuffle, partitioned by bucket x key (calendar-bounded cardinality,
 * no per-key funnel). timeWeighted is one window (per-key lookahead) + one
 * per-key aggregation on the window's own partitioning — again a single
 * exchange. Both are integer/decimal-exact: no floating-point accumulation
 * order can flip a result (the dsum/DECIMAL convention from SparkEntry).
 */
object TimeSeries {

  /** OHLC bars: per (bucket = tsNanos div bucketNanos, keyCols) emit
    * open/close (value at the first/last event in `orderCols` order),
    * high/low (max/min), the exact decimal-summed total, and the event
    * count. `orderCols` must totally order events within a bar (include a
    * unique tiebreaker). */
  def ohlcBars(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      keyCols: Seq[String],
      bucketNanos: Long,
      orderCols: Seq[String]): DataFrame = {
    require(bucketNanos > 0, "bucket width must be positive")
    val withBucket = df.withColumn("bucket", intDiv(col(tsCol), lit(bucketNanos)))
    val part = (col("bucket") +: keyCols.map(col)).toSeq
    val wAsc = Window.partitionBy(part: _*).orderBy(orderCols.map(col): _*)
    val wDesc = Window.partitionBy(part: _*).orderBy(orderCols.map(c => col(c).desc): _*)
    withBucket
      .withColumn("__rn_a", row_number().over(wAsc))
      .withColumn("__rn_d", row_number().over(wDesc))
      .groupBy(part: _*)
      .agg(
        max(when(col("__rn_a") === 1, col(valueCol))).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max(when(col("__rn_d") === 1, col(valueCol))).as("close"),
        sum(col(valueCol).cast(DecimalType(18, 4))).cast(DoubleType).as("total"),
        count(lit(1)).as("n_events"))
  }

  /** Time-weighted value integral per key: each event's value holds until
    * the key's next event (step-function/last-observation-carried-forward
    * semantics); the last event holds for zero time. Integer-exact: values
    * are fixed-pointed to `floor(value * 100)` (cents) and durations to
    * whole seconds, so the weighted sum and the integer-division mean are
    * bit-identical across engines and row orders. Output per key:
    * `tw_cents_s` (Σ cents·seconds), `active_s` (Σ seconds), `tw_avg_cents`
    * (tw_cents_s div active_s; null for keys with no elapsed time). */
  def timeWeighted(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: String,
      orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(col): _*)
    val durS = intDiv((lead(col(tsCol), 1).over(w) - col(tsCol)).cast(LongType),
      lit(1000000000L))
    val cents = floor(col(valueCol) * lit(100)).cast(LongType)
    df
      .withColumn("__dur_s", coalesce(durS, lit(0L)))
      .withColumn("__cents", cents)
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("__cents") * col("__dur_s")).as("tw_cents_s"),
        sum(col("__dur_s")).as("active_s"),
        count(lit(1)).as("n_events"))
      .withColumn(
        "tw_avg_cents",
        when(col("active_s") > 0, intDiv(col("tw_cents_s"), col("active_s"))))
  }

  /** Rolling distinct actives (the sliding DAU/WAU/MAU counter): for each
    * bucket `b` present in the data, the EXACT count of distinct `idCol`
    * values seen in buckets `[b - windowBuckets + 1, b]`.
    *
    * The naive form — per-day self-join or a range-frame
    * `count(DISTINCT)` window — rescans the corpus once per bucket (or
    * funnels it through one task per day). This is the reshape that
    * scales instead: dedup to (bucket, id) FIRST (the one corpus-sized
    * shuffle; map-side combining distinct), then each surviving row
    * replicates map-side to the `windowBuckets` target buckets it serves
    * (sequence+explode — ×W on the already-deduped row count, not the
    * corpus), a second distinct collapses multi-day actives, and the
    * final per-bucket count is calendar-sized. Buckets beyond the
    * observed range are clipped with a broadcast semi-join against the
    * distinct observed buckets (calendar-sized by construction).
    * Everything is exact 64-bit arithmetic on `tsNanos div bucketNanos`
    * — no timestamp/double rounding can move a row across a bucket
    * boundary. */
  def rollingDistinct(
      df: DataFrame,
      tsCol: String,
      idCol: String,
      bucketNanos: Long,
      windowBuckets: Int): DataFrame = {
    require(bucketNanos > 0, "bucket width must be positive")
    require(windowBuckets > 0, "window must span at least one bucket")
    val perBucket = df
      .select(intDiv(col(tsCol), lit(bucketNanos)).as("bucket"), col(idCol).as("id"))
      .distinct()
    val observed = perBucket.select(col("bucket")).distinct()
    // The clip join is deliberately UN-hinted (the keepCanonical lesson):
    // observed is calendar-sized for day/hour buckets and AQE broadcasts
    // it, but a caller bucketing at millisecond grain over a long range
    // would make a hard broadcast a driver OOM — AQE falls back to a
    // shuffle semi-join there.
    perBucket
      .select(explode(sequence(col("bucket"),
        col("bucket") + lit(windowBuckets - 1L))).as("bucket"), col("id"))
      .distinct()
      .join(observed, Seq("bucket"), "left_semi")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** CUSUM changepoint per key: the bucket where the cumulative deviation
    * from the series mean peaks — the classical Page/CUSUM "where did the
    * level shift" detector, in EXACT integer arithmetic. Per ordered
    * bucket i of n with fixed-point cents sums s_b, the deviation
    * C_i = Σ_{b≤i} s_b − i·(T/n) is rational; scaling by n clears the
    * denominator: `D_i = n·cum_i − i·T`, an integer — the stumpSplit
    * cleared-denominator discipline, CUSUM face. The changepoint is
    * argmax |D_i| (ties to the earlier bucket, min-over-struct posture).
    * At Σ|cents| ≈ 10^15 and n ≈ 10^4 buckets, n·cum stays inside 64
    * bits; past that, lift the two products to Decimal(38,0) as in
    * stumpSplit. Gaps: CUSUM runs over OBSERVED buckets (i = rank among
    * them), so an empty day contributes nothing rather than a zero.
    *
    * Scale shape: ONE map-side-combining (key, bucket) corpus
    * aggregation; the cumulative window and the argmax run on the
    * per-bucket frame (keys × buckets — calendar-scale), partitioned by
    * key. Output: keyCols ++ (cp_bucket, n_buckets, d_abs). */
  def cusumChangepoint(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      keyCols: Seq[String],
      bucketNanos: Long): DataFrame = {
    require(bucketNanos > 0, "bucket width must be positive")
    require(keyCols.nonEmpty, "at least one key column")
    val g = keyCols.map(col)
    val perBucket = df
      .select(g :+ intDiv(col(tsCol), lit(bucketNanos)).as("bucket") :+
        floor(col(valueCol).cast(DoubleType) * lit(100.0)).cast(LongType).as("cents"): _*)
      .groupBy(g :+ col("bucket"): _*)
      .agg(sum(col("cents")).as("s"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(g: _*)
    perBucket
      .select(g :+ col("bucket") :+
        sum(col("s")).over(wCum).as("cum") :+
        row_number().over(Window.partitionBy(g: _*).orderBy(col("bucket"))).as("i") :+
        sum(col("s")).over(wAll).as("t") :+
        count(lit(1)).over(wAll).as("n"): _*)
      .select(g :+ col("bucket") :+ col("n") :+
        (col("n") * col("cum") - col("i") * col("t")).as("d"): _*)
      .groupBy(g: _*)
      .agg(min(struct((-abs(col("d"))).as("na"), col("bucket").as("b"),
        col("n").as("n"))).as("w"))
      .select(g :+ col("w.b").as("cp_bucket") :+ col("w.n").as("n_buckets") :+
        (-col("w.na")).as("d_abs"): _*)
  }

  /** Integral division on longs — SQL `div`, NOT Column `/` (double
    * division: a numerator past 2^53, e.g. an epoch-nanos timestamp,
    * rounds before the divide and can land in the wrong bucket). */
  private def intDiv(x: Column, y: Column): Column =
    call_function("div", x.cast(LongType), y.cast(LongType))
}
