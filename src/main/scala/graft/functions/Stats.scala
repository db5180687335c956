package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/**
 * One-pass exact statistics from integer moments: Pearson correlation
 * matrices and per-group OLS line fits — the "is doc quality drifting
 * with length / time / source" analytics a corpus pipeline runs after
 * every ingest.
 *
 * Both operators reduce the corpus to EXACT integer moment sums
 * (count, Σx, Σy, Σx², Σxy as DECIMAL(38,0) — callers pass fixed-point
 * integer columns, e.g. cents or `floor(q·2²⁰)`), then evaluate the
 * closed-form estimator once per group from those moments. That makes
 * them bit-reproducible across engines (a DuckDB oracle computing the
 * same HUGEINT sums and the same double expression gets the same bits:
 * integer sums are order-independent, unlike naive double sums) and
 * gives the 100 TB shape for free: the corpus is consumed by a
 * map-side-combining aggregation whose state is a handful of decimals,
 * the shuffle carries one moment row per group (or ONE row total for
 * the matrix), and the estimator arithmetic runs on that metadata-scale
 * frame. Built-ins `corr`/`regr_slope` stream partial double sums whose
 * value depends on partitioning — fine for exploration, unusable for a
 * reproducibility-audited pipeline.
 */
object Stats {

  private val Moment = DecimalType(38, 0)

  /** Pearson correlation for every pair of `cols` (name → fixed-point
    * integer column), as rows `(col_x, col_y, corr)`. One aggregation
    * over the corpus computes all k(k+3)/2 moments; the pair expansion
    * runs on the single moment row. */
  def corrMatrix(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val xs = cols.map(_._2.cast(Moment))
    val moments: Seq[Column] =
      (count(lit(1)).cast(DoubleType).as("n") +:
        cols.indices.map(i => sum(xs(i)).cast(DoubleType).as(s"s$i"))) ++
        (for { i <- cols.indices; j <- i until cols.size }
          yield sum(xs(i) * xs(j)).cast(DoubleType).as(s"s${i}_$j"))
    val m = df.agg(moments.head, moments.tail: _*)
    val pairs = for { i <- cols.indices; j <- (i + 1) until cols.size } yield
      struct(
        lit(cols(i)._1).as("col_x"),
        lit(cols(j)._1).as("col_y"),
        ((col("n") * col(s"s${i}_$j") - col(s"s$i") * col(s"s$j")) /
          (sqrt(col("n") * col(s"s${i}_$i") - col(s"s$i") * col(s"s$i")) *
            sqrt(col("n") * col(s"s${j}_$j") - col(s"s$j") * col(s"s$j")))).as("corr"))
    m.select(explode(array(pairs: _*)).as("r"))
      .select(col("r.col_x").as("col_x"), col("r.col_y").as("col_y"), col("r.corr").as("corr"))
  }

  /** Per-group least-squares line fit y = slope·x + intercept from exact
    * integer moments. `y` is a fixed-point column scaled by 2^`yShift`
    * (an exponent shift, so dividing it back out at the end is exact);
    * pass `yShift = 0` for an already-integer y. Output:
    * `(group, n, slope, intercept)` in real units. */
  def olsFit(
      df: DataFrame,
      groupCol: String,
      x: Column,
      yFp: Column,
      yShift: Int = 20): DataFrame = {
    val scale = math.pow(2.0, yShift)
    val xd = x.cast(Moment)
    val yd = yFp.cast(Moment)
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).cast(DoubleType).as("__n"),
        sum(xd).cast(DoubleType).as("__sx"),
        sum(yd).cast(DoubleType).as("__sy"),
        sum(xd * xd).cast(DoubleType).as("__sxx"),
        sum(xd * yd).cast(DoubleType).as("__sxy"))
      .withColumn("__slope_fp",
        (col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
          (col("__n") * col("__sxx") - col("__sx") * col("__sx")))
      .select(
        col(groupCol),
        col("__n").cast(LongType).as("n"),
        (col("__slope_fp") / scale).as("slope"),
        (((col("__sy") - col("__slope_fp") * col("__sx")) / col("__n")) / scale).as("intercept"))
  }
}
