package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextFunctions.xhash32

/**
 * Deterministic sampling for reproducible training-data pipelines.
 *
 * `df.sample()` draws from a per-partition RNG: the selected set changes
 * with partitioning, retries, and engine — unacceptable when a training
 * run must be reproducible and auditable. Both operators here select by a
 * content/key hash instead, so the sample is a pure function of the data:
 * stable under repartitioning, re-execution, engine replacement (the
 * DuckDB oracle reproduces it row-for-row), and incremental reruns (a row
 * keeps its verdict when new data arrives).
 *
 * Both are narrow or single-shuffle: Bernoulli is a pushdown-friendly
 * filter; stratified is one window shuffle on the stratum key.
 */
object Sampling {

  /** Keep a row iff xhash32(salt || key) < rate * 2^32 — a deterministic
    * Bernoulli(rate) draw. NOTE: two Bernoulli samples under different
    * salts are independent, NOT disjoint (they overlap at ~rate1·rate2);
    * for provably disjoint train/val/test splits use [[hashRange]]. */
  def bernoulli(keyCol: Column, rate: Double, salt: String): Column = {
    require(rate >= 0 && rate <= 1, "rate must be in [0, 1]")
    xhash32(concat(lit(salt), keyCol)) < (rate * 4294967296.0).toLong
  }

  /** Keep rows whose hash falls in [lo, hi) of the unit interval —
    * disjoint ranges give provably disjoint splits (train/val/test). */
  def hashRange(keyCol: Column, lo: Double, hi: Double, salt: String): Column = {
    require(0 <= lo && lo <= hi && hi <= 1, "need 0 <= lo <= hi <= 1")
    val h = xhash32(concat(lit(salt), keyCol))
    h >= (lo * 4294967296.0).toLong && h < (hi * 4294967296.0).toLong
  }

  /** Per-stratum quota sample: the `quota` rows of each stratum with the
    * smallest (hash, key) — a deterministic "random" quota per group
    * (language balancing, source balancing). One shuffle on the stratum. */
  def stratifiedQuota(
      df: DataFrame,
      stratumCol: Column,
      keyCol: Column,
      quota: Int,
      salt: String): DataFrame = {
    require(quota > 0, "quota must be positive")
    require(!df.columns.contains("__rk"),
      "input already has a __rk column; rename it before stratifiedQuota")
    val w = Window.partitionBy(stratumCol)
      .orderBy(xhash32(concat(lit(salt), keyCol)), keyCol)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= quota)
      .drop("__rk")
  }
}
