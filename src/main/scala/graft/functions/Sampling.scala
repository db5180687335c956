package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

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

  /** Deterministic training-shard assignment + intra-shard order: shard by
    * one key hash, position within the shard by an independent hash — a
    * reproducible global shuffle of the corpus into `nShards` streams
    * (the "randomize example order for training" stage, stable across
    * partitioning, retries, and engines). One partitioned window keyed on
    * the shard id; no global sort ever exists in the plan. At scale pick
    * nShards >= cluster parallelism so each window partition holds
    * ~corpus/nShards rows. Adds columns `shard` and `shard_pos`.
    *
    * `keyCol` must uniquely identify rows: rows sharing a key get
    * identical (hash, key) ordering tuples, and row_number breaks that
    * tie by arrival order — their relative `shard_pos` would then vary
    * across runs, violating the determinism contract. Dedup first (or
    * key by a content digest) if keys can repeat. */
  def shards(df: DataFrame, keyCol: Column, nShards: Int, salt: String): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    require(!df.columns.exists(c => c == "shard" || c == "shard_pos"),
      "input already has a shard/shard_pos column")
    df.withColumn("shard", pmod(xhash32(concat(lit(salt + "_s"), keyCol)), lit(nShards)))
      .withColumn("shard_pos",
        row_number().over(
          Window.partitionBy(col("shard"))
            .orderBy(xhash32(concat(lit(salt + "_p"), keyCol)), keyCol)) - 1)
  }

  /** Temperature-flattened stratum rebalancing (the "data mixing" stage):
    * downsample over-represented strata toward the tau = 0.5 temperature
    * distribution — each stratum's target share is proportional to
    * sqrt(its count) — keeping ~`targetFrac` of the corpus overall. Rare
    * strata cap at keep-everything (rate 1).
    *
    * Per-stratum keep rate: `targetFrac * tot * w_c / (S * n_c)` where
    * `w_c = floor(sqrt(n_c) * 2^20)` and `S = sum(w_c)`. tau is FIXED at
    * 0.5: sqrt is the one power IEEE 754 requires correctly rounded, so
    * the rate — integer inputs through sqrt, exact exponent-shift
    * scaling, exact integer sums, then one identically-parenthesized
    * double expression — is bit-reproducible across engines (pow(x, tau)
    * for general tau is NOT correctly rounded and drifts by ulps between
    * libm implementations, which can flip a hash-threshold comparison).
    * Selection is then the [[bernoulli]] draw against that rate: a pure
    * function of the data, stable under repartitioning/retries/engines.
    *
    * 100 TB shape: stratum counts are a map-side-combined aggregation
    * (one row per stratum); rates broadcast back onto the corpus, which
    * itself never shuffles — the keep filter is narrow. */
  def temperatureMix(
      df: DataFrame,
      stratumCol: String,
      keyCol: Column,
      targetFrac: Double,
      salt: String): DataFrame = {
    require(targetFrac > 0 && targetFrac <= 1, "targetFrac must be in (0, 1]")
    require(!df.columns.contains("__thr"), "input already has a __thr column")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
    val weighted = counts.withColumn("__w",
      floor(sqrt(col("__n").cast(DoubleType)) * 1048576.0))
    val totals = weighted.agg(sum(col("__w")).as("__s"), sum(col("__n")).as("__tot"))
    val rates = weighted.crossJoin(broadcast(totals))
      .select(col(stratumCol),
        least(lit(4294967296L),
          floor(
            (col("__tot").cast(DoubleType) * lit(targetFrac) * col("__w").cast(DoubleType))
              / (col("__s").cast(DoubleType) * col("__n").cast(DoubleType)) * 4294967296.0))
          .as("__thr"))
    df.join(broadcast(rates), stratumCol)
      .filter(xhash32(concat(lit(salt), keyCol)) < col("__thr"))
      .drop("__thr")
  }

  /** Deterministic oversampling to parity (the up-sampling half of data
    * mixing, complementing [[temperatureMix]]): every stratum is repeated
    * up to the size of the LARGEST stratum — each row emits
    * `n_max div n_c` copies plus one more iff its hash draw falls under
    * the fractional remainder `(n_max mod n_c) / n_c`, so a stratum's
    * expected output count is exactly n_max. Adds a `copy` column
    * (0-based) so downstream sharding/packing can distinguish epochs
    * deterministically.
    *
    * Cross-engine exact: base count and remainder are integer arithmetic;
    * the fractional threshold is one identically-parenthesized double
    * expression over integers (same argument as [[temperatureMix]]); the
    * draw is the usual salted hash. 100 TB shape: stratum counts are one
    * map-side-combined aggregation; (base, thr) broadcast back; the
    * copy explode is narrow — the corpus never shuffles. */
  def oversampleToParity(
      df: DataFrame,
      stratumCol: String,
      keyCol: Column,
      salt: String): DataFrame = {
    require(!df.columns.exists(c => c == "copy" || c == "__base" || c == "__thr"),
      "input already has a copy/__base/__thr column")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
    val mx = counts.agg(max(col("__n")).as("__nmax"))
    val rates = counts.crossJoin(broadcast(mx))
      .select(col(stratumCol),
        expr("__nmax div __n").as("__base"),
        floor((col("__nmax") % col("__n")).cast(DoubleType)
          / col("__n").cast(DoubleType) * 4294967296.0).as("__thr"))
    df.join(broadcast(rates), stratumCol)
      .withColumn("__copies",
        col("__base") + when(xhash32(concat(lit(salt), keyCol)) < col("__thr"), 1L).otherwise(0L))
      .withColumn("copy", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__base", "__thr", "__copies")
  }

  /** Per-stratum quota sample: the `quota` rows of each stratum with the
    * smallest (hash, key) — a deterministic "random" quota per group
    * (language balancing, source balancing).
    *
    * Two-phase for scale: a single window per stratum would funnel every
    * row of a stratum through ONE partition (a handful of languages over a
    * 100 TB corpus = a handful of active tasks). Phase 1 pre-selects the
    * quota per (stratum, hash-bucket) across `preBuckets` parallel
    * partitions; phase 2 takes the true quota from the surviving
    * quota×preBuckets rows per stratum. Identical output to the single
    * window: every globally-selected row is also top-quota within its own
    * bucket, so phase 1 never discards a winner. */
  def stratifiedQuota(
      df: DataFrame,
      stratumCol: Column,
      keyCol: Column,
      quota: Int,
      salt: String,
      preBuckets: Int = 32): DataFrame =
    quotaByDraw(df, stratumCol, keyCol,
      xhash32(concat(lit(salt), keyCol)), quota, preBuckets)

  /** Per-stratum WEIGHTED quota sample without replacement (probability
    * proportional to an integer weight): each row draws `weight`
    * independent salted hashes and keeps the MINIMUM as its sort key;
    * the `quota` rows with the smallest (draw, key) per stratum win.
    * Pairwise, P(row i outdraws row j) = w_i / (w_i + w_j) — the
    * successive-sampling (PPSWOR) scheme restricted to integer weights,
    * expressed entirely in md5 draws so the DuckDB oracle reproduces the
    * selection bit-for-bit. The usual continuous forms (u^(1/w) of
    * Efraimidis–Spirakis, or -ln(u)/w exponential clocks) need pow/log,
    * which drift by ulps between libm implementations and can flip a
    * rank comparison; min-of-w-uniforms needs only hashing and is
    * order-equivalent.
    *
    * `weightCol` must be a SMALL bounded positive integer (quality tier,
    * duplication count …): the draw is a narrow
    * `array_min(transform(sequence(0, w-1), …))` projection — O(w) per
    * row, no explode, no extra shuffle. The bound is ENFORCED: a weight
    * above `maxWeight` (default 1024) raises a clear contract error at
    * execution instead of materializing a w-element array per row and
    * OOMing the task (an un-capped upstream count, e.g. a duplication
    * tally of 10^9, would otherwise do exactly that). Selection scale
    * shape is the same two-phase window as [[stratifiedQuota]]. */
  def weightedQuota(
      df: DataFrame,
      stratumCol: Column,
      keyCol: Column,
      weightCol: Column,
      quota: Int,
      salt: String,
      preBuckets: Int = 32,
      maxWeight: Int = 1024): DataFrame = {
    require(maxWeight >= 1, "maxWeight must be positive")
    // Rows whose weight is NULL or < 1 are excluded up front (a NULL
    // weight would otherwise yield a NULL draw and, under NULLS FIRST
    // ordering, silently WIN a quota slot; w = 0 would make sequence()
    // count downward and draw from salts no oracle computes). Weights
    // are integers by contract (scaladoc); a fractional weight in (0, 1)
    // is excluded too, not rounded up to one draw.
    val w = weightCol.cast("long")
    // The guard is kept OUT of the sequence bound: the bound itself is the
    // branch-free `least(w, max)` (so the array codegen sees a simple
    // arithmetic expression, r7 had the CaseWhen+raise_error as the bound
    // and bench-regressed), and the contract error rides as a separate
    // additive term that is the constant 0 on every valid row. NOTE the
    // ordering: Add evaluates its left operand first, so an over-weight
    // row DOES materialize its (maxWeight-capped) draw array before the
    // guard raises — `least` is the actual OOM protection; the guard
    // only reports the contract breach. Do not remove the cap believing
    // the guard pre-empts materialization.
    val maxW = lit(maxWeight.toLong)
    val guardTerm = when(w <= maxW, lit(0L)).otherwise(raise_error(concat(
      lit(s"weightedQuota: weight "), w.cast("string"),
      lit(s" exceeds maxWeight=$maxWeight for key "), keyCol.cast("string"))))
    quotaByDraw(df.filter(weightCol.isNotNull && weightCol >= 1), stratumCol, keyCol,
      array_min(transform(
        sequence(lit(0L), least(w, maxW) - 1L),
        c => xhash32(concat(lit(salt), keyCol, lit("_"), c.cast("string"))))) + guardTerm,
      quota, preBuckets)
  }

  /** Shared two-phase per-stratum top-`quota` by an arbitrary
    * deterministic draw expression. A single window per stratum would
    * funnel every row of a stratum through ONE task (a handful of
    * languages over a 100 TB corpus = a handful of active tasks); phase 1
    * pre-selects the quota per (stratum, hash-bucket) across `preBuckets`
    * parallel partitions, phase 2 takes the true quota from the surviving
    * quota×preBuckets rows. Identical output to the single window: every
    * globally-selected row is also top-quota within its own bucket, so
    * phase 1 never discards a winner. */
  private def quotaByDraw(
      df: DataFrame,
      stratumCol: Column,
      keyCol: Column,
      draw: Column,
      quota: Int,
      preBuckets: Int): DataFrame = {
    require(quota > 0, "quota must be positive")
    require(preBuckets > 0, "preBuckets must be positive")
    require(!df.columns.exists(c => c == "__rk" || c == "__h"),
      "input already has a __rk/__h column; rename it before the quota sample")
    val pre = Window.partitionBy(stratumCol, pmod(col("__h"), lit(preBuckets)))
      .orderBy(col("__h"), keyCol)
    val fin = Window.partitionBy(stratumCol).orderBy(col("__h"), keyCol)
    df.withColumn("__h", draw)
      .withColumn("__rk", row_number().over(pre))
      .filter(col("__rk") <= quota)
      .withColumn("__rk", row_number().over(fin))
      .filter(col("__rk") <= quota)
      .drop("__rk", "__h")
  }
}
