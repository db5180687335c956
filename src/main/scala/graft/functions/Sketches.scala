package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Distinct-count sketching with engine-reproducible semantics.
 *
 * KMV (k-minimum-values): keep the k smallest distinct values of a uniform
 * 32-bit hash; estimate distinct = (k-1) * 2^32 / kth_min (exact count when
 * fewer than k distinct hashes were seen). Unlike HyperLogLog
 * (`approx_count_distinct`), whose register layout is engine-private, the
 * KMV estimate is a pure function of the hash family — built here on
 * `xhash32` — so a DuckDB oracle reproduces it bit-for-bit.
 *
 * Scale shape: the aggregation buffer is a bounded sorted array of at most
 * k longs regardless of group size, and merge is a k-way bounded merge, so
 * map-side partial aggregation ships k values per (partition, group) — the
 * same profile as any algebraic aggregate. Standard error ~ 1/sqrt(k-2)
 * (~12.6% at k=64).
 */
object Sketches {

  /** Bounded k-min buffer over already-hashed values. Buffer invariant:
    * sorted ascending, distinct, size <= k. NULL inputs are skipped (the
    * SQL aggregate convention — a null hash means a null value, and
    * distinct counts never include null), which lets the sketch ride
    * inside one null-safe profiling aggregate. */
  class KMVDistinct(k: Int) extends Aggregator[java.lang.Long, Seq[Long], Double] {
    require(k >= 2, "KMV needs k >= 2")
    override def zero: Seq[Long] = Vector.empty
    // Per-row path: O(log k) membership/insert against the sorted buffer —
    // this runs once per input row, so no full re-sort here.
    override def reduce(buf: Seq[Long], boxed: java.lang.Long): Seq[Long] = {
      if (boxed == null) return buf
      val h = boxed.longValue
      if (buf.size == k && h >= buf.last) return buf
      val v = buf.toVector
      val i = lowerBound(v, h)
      if (i < v.size && v(i) == h) v
      else {
        val inserted = (v.take(i) :+ h) ++ v.drop(i)
        if (inserted.size > k) inserted.dropRight(1) else inserted
      }
    }
    private def lowerBound(v: Vector[Long], h: Long): Int = {
      var lo = 0; var hi = v.size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (v(mid) < h) lo = mid + 1 else hi = mid
      }
      lo
    }
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      (a ++ b).distinct.sorted.take(k)
    override def finish(mins: Seq[Long]): Double =
      if (mins.size < k) mins.size.toDouble
      else (k - 1).toDouble * 4294967296.0 / mins.last
    override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column form: KMV distinct estimate of `hashed` (a 32-bit hash column,
    * e.g. `TextFunctions.xhash32`). */
  def kmvDistinct(hashed: Column, k: Int): Column =
    udaf(new KMVDistinct(k), Encoders.LONG)(hashed)

  // ---- count-min sketch ------------------------------------------------

  import org.apache.spark.sql.functions._

  /** Row-r bucket of a token: xhash32("cms{r}_" || token) % width — the
    * md5-derived family every cross-engine hash here uses, so a DuckDB
    * oracle reproduces the sketch cell-for-cell. */
  private def cmsBucket(tok: Column, r: Int, width: Int): Column =
    TextFunctions.xhash32(concat(lit(s"cms${r}_"), tok)) % width

  /** Build the depth x width count-min table over `tokenCol`: one row per
    * OCCUPIED (r, b) cell, `c` = total hits. The sketch is an additive
    * constant-size summary (<= depth*width cells at any corpus size):
    * map-side partial aggregation ships cell partials, two sketches merge
    * by summing cells, and a streaming build is the same groupBy in
    * update mode. */
  def countMinTable(tokens: DataFrame, tokenCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, "need depth >= 1, width >= 2")
    tokens
      .select(posexplode(array((0 until depth).map(r =>
        cmsBucket(col(tokenCol), r, width)): _*)).as(Seq("r", "b")))
      .groupBy(col("r"), col("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** [[countMinTable]] from a (word, count) INVENTORY instead of the raw
    * token stream: cell mass = sum of the counts of the words hashing
    * into it — identical cells by the distributive sum, but the explode
    * runs over the vocabulary (millions) instead of the corpus token
    * stream (trillions at 100 TB). Callers that already paid the
    * word-count aggregation (heavy_hitters' exact side) get the sketch
    * for a vocabulary-scale pass, and the corpus-scale exchange is
    * shared with the exact side via ReusedExchange (PlanSpec-pinned). */
  def countMinTableWeighted(
      wordCounts: DataFrame, wordCol: String, countCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, "need depth >= 1, width >= 2")
    wordCounts
      .select(col(countCol).as("__n"),
        posexplode(array((0 until depth).map(r =>
          cmsBucket(col(wordCol), r, width)): _*)).as(Seq("r", "b")))
      .groupBy(col("r"), col("b"))
      .agg(sum(col("__n")).as("c"))
  }

  /** Point-query the sketch for each row of `words` (tiny, broadcast):
    * estimate = min over rows of the word's cell — an overestimate by at
    * most the collision mass, never an under. Passes `words`' other
    * columns through. */
  def cmsEstimate(cms: DataFrame, words: DataFrame, wordCol: String, depth: Int, width: Int): DataFrame = {
    val passThrough = words.columns.map(col).toIndexedSeq
    val probes = words.select(
      passThrough :+ posexplode(array((0 until depth).map(r =>
        cmsBucket(col(wordCol), r, width)): _*)).as(Seq("r", "b")): _*)
    cms
      .join(broadcast(probes), Seq("r", "b"))
      .groupBy(words.columns.map(col).toIndexedSeq: _*)
      .agg(min(col("c")).as("n_est"))
  }

  // ---- HyperLogLog -----------------------------------------------------

  /** Per-group HyperLogLog distinct estimate (Flajolet et al. 2007) with
    * ENGINE-REPRODUCIBLE semantics — the register-based complement to
    * [[kmvDistinct]]: state is m integer registers per group (vs KMV's k
    * hashes), registers merge by MAX (so sketches union losslessly across
    * partitions, engines, and increments), and the per-group shuffle rows
    * are bounded by m at any corpus size.
    *
    * Built on the portable `xhash32` (a 32-bit value): bucket = h mod m,
    * the remaining w = 32 − log2(m) bits give
    * rho = w − floor(log2 rest) (rest > 0; rest = 0 → w + 1) — the
    * leading-zero rank as a pure integer/length-of-bin computation, so
    * DuckDB reproduces every register. The estimate keeps the raw HLL
    * form alpha_m·m²/Z with Z = Σ_j 2^−M[j]: each 2^−M is 1.0/(1<<M)
    * (an EXACT IEEE double), and the dyadic exponents span < 53 bits, so
    * Z is exact and order-independent — the whole estimate hash-compares
    * across engines. DELIBERATELY no ln-based small-range correction
    * (linear counting): ln is not bit-portable; callers needing the
    * small-range regime have `n_empty` (the linear-counting input) and
    * the exact [[kmvDistinct]] / COUNT DISTINCT below ~2.5·m anyway.
    * Standard error 1.04/sqrt(m) (~13% at m = 64).
    *
    * Output: groupCols ++ (n_empty, est). */
  def hllDistinct(
      df: DataFrame, keyCol: Column, groupCols: Seq[String],
      m: Int = 64, salt: String = "hll"): DataFrame =
    // Registers are already (group, bucket)-unique here — skip
    // hllEstimate's defensive max-merge pass.
    scoreRegisters(hllRegisters(df, keyCol, groupCols, m, salt), groupCols, m)

  /** The per-group register frame `groupCols ++ (bucket, reg)` — the
    * sketch STATE [[hllEstimate]] scores and the store below persists.
    * One map-side-combining (group, bucket) max aggregation. */
  def hllRegisters(
      df: DataFrame, keyCol: Column, groupCols: Seq[String],
      m: Int, salt: String): DataFrame = {
    require(m >= 4 && (m & (m - 1)) == 0 && m <= 65536,
      s"m must be a power of two in [4, 65536], got $m")
    val w = 32 - java.lang.Integer.numberOfTrailingZeros(m)
    val g = groupCols.map(col)
    val h = TextFunctions.xhash32(concat(lit(salt), keyCol.cast("string")))
    val rest = call_function("div", h, lit(m.toLong))
    val rho = when(rest === 0, lit((w + 1).toLong))
      .otherwise(lit(w.toLong) - (length(bin(rest)) - lit(1)).cast("long"))
    df.select(g :+ pmod(h, lit(m.toLong)).as("bucket") :+ rho.as("rho"): _*)
      .groupBy(g :+ col("bucket"): _*)
      .agg(max(col("rho")).as("reg"))
  }

  /** The raw estimate over a (possibly multi-slice) register frame:
    * registers re-merge by MAX first, so the input may carry one row per
    * (group, bucket) per SLICE (the merge-on-read store path). */
  def hllEstimate(regs: DataFrame, groupCols: Seq[String], m: Int): DataFrame =
    scoreRegisters(
      regs.groupBy(groupCols.map(col) :+ col("bucket"): _*)
        .agg(max(col("reg")).as("reg")),
      groupCols, m)

  private def scoreRegisters(
      regs: DataFrame, groupCols: Seq[String], m: Int): DataFrame = {
    val g = groupCols.map(col)
    regs
      .groupBy(g: _*)
      .agg(
        count(lit(1)).as("nb"),
        // 1.0 / 2^reg is exact IEEE division by a power of two — never
        // pow(), whose last-ulp behavior is library-dependent.
        sum(lit(1.0) / call_function("shiftleft", lit(1L),
          col("reg").cast(org.apache.spark.sql.types.IntegerType))).as("zp"))
      .select(g :+
        (lit(m.toLong) - col("nb")).as("n_empty") :+
        // alpha_m stays the literal expression 0.7213/(1 + 1.079/m) on
        // both engines (the bm25 never-pre-evaluate convention).
        ((lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble)))
          * lit(m.toDouble) * lit(m.toDouble)
          / (col("zp") + (lit(m.toLong) - col("nb")).cast("double"))).as("est"): _*)
  }

  /** Persist a corpus slice's HLL registers (the LM-counts log-structured
    * posture — slices land as files, [[readHllEstimate]] merges on read).
    * Registers merge by MAX, which is IDEMPOTENT — so unlike the additive
    * LM/BM25 stores, append slices may OVERLAP what the store already
    * holds (re-sketching a day after a partial load cannot inflate the
    * estimate); the caller contract is only that m and salt never change
    * for one store path. */
  def writeHllRegisters(
      df: DataFrame, keyCol: Column, groupCols: Seq[String], path: String,
      m: Int = 64, salt: String = "hll"): Unit =
    hllRegisters(df, keyCol, groupCols, m, salt)
      .write.mode("overwrite").parquet(path)

  /** Add a slice to an existing register store (see
    * [[writeHllRegisters]] — overlap-tolerant). */
  def appendHllRegisters(
      df: DataFrame, keyCol: Column, groupCols: Seq[String], path: String,
      m: Int = 64, salt: String = "hll"): Unit =
    hllRegisters(df, keyCol, groupCols, m, salt)
      .write.mode("append").parquet(path)

  /** Estimate from the stored registers: slices max-merge on read, so the
    * result is bit-identical to one batch [[hllDistinct]] over the union
    * of everything ever written (SketchesSpec pins the parity). */
  def readHllEstimate(
      spark: org.apache.spark.sql.SparkSession, path: String,
      groupCols: Seq[String], m: Int = 64): DataFrame =
    hllEstimate(spark.read.parquet(path), groupCols, m)
}
