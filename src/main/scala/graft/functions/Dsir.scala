package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * DSIR-style data selection via hashed n-gram importance weights
 * (Xie et al., "Data Selection for Language Models via Importance
 * Resampling", 2023): fit hashed word-bigram count distributions on a
 * small curated TARGET domain and on the RAW pool being selected from,
 * weight every hash bucket by the smoothed target/raw rate ratio, score
 * each raw document by the sum of its bigrams' bucket weights, and keep
 * the top fraction.
 *
 * Cross-engine determinism (the repo's oracle rules):
 *  - the bucket hash is the md5-mirror xhash32 (`('0x' ||
 *    substr(md5(bg), 1, 8))::BIGINT` in DuckDB) mod `buckets`;
 *  - the bucket weight is computed as ONE left-associated chain of
 *    correctly-rounded IEEE ops over exactly-representable integers —
 *    `(t+1)::DOUBLE / (r+1) * (R+B) / (T+B) * 2^20`, floored to BIGINT —
 *    identical bits in any engine that evaluates the same chain (the
 *    final factor is a power of two, an exact exponent shift);
 *  - document scores are BIGINT sums of BIGINT weights — exact and
 *    order-independent, so the top-fraction boundary never drifts.
 * The paper sums LOG ratios and adds Gumbel noise for sampling; summing
 * fixed-point LINEAR ratios with a deterministic top-fraction keeps the
 * same "most target-like documents win" selection while staying
 * bit-reproducible across engines and retries (a log() or a Gumbel draw
 * would drift in the last ulp between libm implementations — the
 * corpus_mix sqrt-only lesson).
 *
 * Shape at 100 TB: fit-then-apply is inherently two passes over the raw
 * pool, both NARROW over the corpus — the count pass map-side-combines
 * into at most `buckets` rows per task before a buckets-bounded shuffle,
 * and the scoring pass joins a BROADCAST weight table (<= `buckets` rows
 * by construction — explicitly metadata-scale, the allowed broadcast
 * class) then map-side-combines per-doc partial sums. Document text
 * never shuffles; nothing corpus-sized is ever sorted. The target side
 * is small by construction (a curated domain), mirroring the
 * decontamination eval-side argument.
 */
object Dsir {

  /** Word bigrams of a whitespace-tokenized text column, one entry per
    * OCCURRENCE (DSIR's counts are multinomial, not distinct-set).
    * Mirrors the bpe_pairs adjacency construction: zip_with over the two
    * shifted slices. Words are space-split, so joining with a space is
    * collision-free. */
  def wordBigrams(text: Column): Column = {
    val tk = TextFunctions.wsTokens(text)
    val n = greatest(size(tk) - 1, lit(0))
    zip_with(
      slice(tk, lit(1), n), slice(tk, lit(2), n),
      (a, b) => concat(a, lit(" "), b))
  }

  /** One row per bigram occurrence: (docId untyped pass-through, bucket).
    * The md5 kernel runs AFTER the explode, so any filter the optimizer
    * might infer through the generator re-runs only the cheap
    * split/slice/concat, never the hash (the kernel-in-scan-filter
    * anti-pattern). */
  /** The bucket expression is wrapped non-nullable (`coalesce(·, 0)` — a
    * semantic no-op: post-explode bigrams of a non-null text are never
    * null) so the bucket joins' inferred `isnotnull(b)` constraint FOLDS
    * AWAY instead of planning a Filter that re-computes the md5 per
    * bigram above every Generate — the kernel-runs-twice anti-pattern,
    * here worth one full hash pass per fit/score stage. */
  private def bucket(bg: Column, buckets: Int): Column =
    coalesce(pmod(TextFunctions.xhash32(bg), lit(buckets.toLong)), lit(0L))

  private def bucketRows(df: DataFrame, idCol: String, textCol: String, buckets: Int): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), explode(wordBigrams(col(textCol))).as("bg"))
      .select(col("doc_id"), bucket(col("bg"), buckets).as("b"))

  /** Bucket occurrences only — the fit passes never carry an id. */
  private def bucketOnly(df: DataFrame, textCol: String, buckets: Int): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(explode(wordBigrams(col(textCol))).as("bg"))
      .select(bucket(col("bg"), buckets).as("b"))

  /** The fitted bucket-weight table: one BIGINT weight per bucket seen in
    * EITHER pool (<= `buckets` rows — metadata-scale by construction).
    * Add-one smoothing keeps every weight finite, including buckets the
    * raw fit never saw — a NEW document (a later increment, a stream
    * micro-batch) probing such a bucket must get the smoothed ratio, not
    * a silent zero: with t_b > 0 and r_b = 0 these are precisely the most
    * target-like buckets.
    *
    * weight(b) = floor( (t_b+1)/(r_b+1) * (R+B)/(T+B) * scale )
    * — the fixed-point smoothed rate ratio p_target(b)/p_raw(b). */
  def importanceWeights(
      target: DataFrame,
      raw: DataFrame,
      textCol: String,
      buckets: Int = 4096,
      scale: Double = 1048576.0): DataFrame =
    weightsWithTotals(target, raw, textCol, buckets, scale).select(col("b"), col("w"))

  /** (b, w, tt, rr): the weight rows plus the totals that parameterize
    * the smoothing — the array face needs the totals to fill
    * never-seen-anywhere slots with the same formula at t=r=0. */
  private def weightsWithTotals(
      target: DataFrame,
      raw: DataFrame,
      textCol: String,
      buckets: Int,
      scale: Double): DataFrame = {
    val tc = bucketOnly(target, textCol, buckets)
      .groupBy(col("b")).agg(count(lit(1)).as("t"))
    val rc = bucketOnly(raw, textCol, buckets)
      .groupBy(col("b")).agg(count(lit(1)).as("r"))
    val tTot = tc.agg(coalesce(sum(col("t")), lit(0L)).as("tt"))
    val rTot = rc.agg(coalesce(sum(col("r")), lit(0L)).as("rr"))
    rc.join(tc, Seq("b"), "full")
      .crossJoin(broadcast(tTot))
      .crossJoin(broadcast(rTot))
      // ONE left-associated double chain — mirrored verbatim in the oracle
      // SQL. Every intermediate integer is exact in double far past any
      // real corpus size's bucket counts (< 2^53).
      .select(
        col("b"),
        floor(
          (coalesce(col("t"), lit(0L)) + 1).cast(DoubleType)
            / (coalesce(col("r"), lit(0L)) + 1)
            * (col("rr") + buckets)
            / (col("tt") + buckets)
            * scale).as("w"),
        col("tt"), col("rr"))
  }

  /** Per-document importance score over THE FITTED raw pool: (doc_id,
    * n_bigrams, score) with score = sum of the doc's bigrams' bucket
    * weights (BIGINT — exact under any aggregation order). The inner join
    * drops buckets absent from the weight table, which is correct only
    * when every probed bucket was fitted — i.e. when `raw` IS the fit
    * pool; to score NEW documents (increments, streams) use
    * [[scoreDocsLit]], whose array covers every bucket with the smoothed
    * default. Documents with fewer than two tokens have no bigrams and
    * are not scored (no evidence either way — the paper's featurization
    * is equally silent on them). */
  def scoreDocs(
      raw: DataFrame,
      weights: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 4096): DataFrame =
    bucketRows(raw, idCol, textCol, buckets)
      .join(broadcast(weights), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("w")).as("score"))

  /** The fitted weights collected at plan time into a dense bucket-indexed
    * literal (metadata-scale BY CONSTRUCTION — <= `buckets` longs; the
    * lm_coverage literal convention). Every slot is filled: buckets seen
    * in neither pool get the same smoothing formula at t=r=0 (the neutral
    * prior ratio (R+B)/(T+B), scaled and floored with the identical
    * left-associated double chain), so a NEW document probing a
    * never-fitted bucket scores the smoothed prior rather than a silent
    * zero. */
  def importanceWeightArray(
      target: DataFrame,
      raw: DataFrame,
      textCol: String,
      buckets: Int = 4096,
      scale: Double = 1048576.0): Array[Long] = {
    val rows = weightsWithTotals(target, raw, textCol, buckets, scale).collect()
    val default = if (rows.isEmpty) 0L
    else {
      val (tt, rr) = (rows.head.getLong(2), rows.head.getLong(3))
      math.floor(1.0 / 1.0 * (rr + buckets) / (tt + buckets) * scale).toLong
    }
    val arr = Array.fill(buckets)(default)
    rows.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** [[scoreDocs]] against the collected literal weight array: one narrow
    * join-free projection per corpus pass (`element_at` into the literal),
    * returning (doc_id, score) ONLY. Both choices exist so a selection
    * that consumes the scored frame twice — the ranks' corpus and
    * bin-count branches — collapses to ONE materialized scoring pass
    * under AQE stage reuse: the join form's asymmetric broadcast reuse
    * defeats the stage cache, and any extra aggregate (an n_bigrams
    * count) gets column-pruned out of the bin-count branch, making the
    * two subtrees canonically unequal — either way the corpus pays the
    * hash twice. Need per-doc bigram counts? That's [[scoreDocs]]. */
  def scoreDocsLit(
      raw: DataFrame,
      weights: Array[Long],
      idCol: String,
      textCol: String): DataFrame =
    bucketRows(raw, idCol, textCol, weights.length)
      .select(col("doc_id"),
        element_at(lit(weights), (col("b") + 1).cast(IntegerType)).as("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("w")).as("score"))

  /** Per-micro-batch importance filter: only documents scoring at least
    * `minScore` against the batch-fitted weights reach `sink` — the
    * streaming face of DSIR selection, mirroring
    * [[Contamination.cleanStream]]: the "state" is the persisted/fitted
    * weight array, not the state store, so the stream is
    * unbounded-corpus-safe and a re-fit swaps in without restarting
    * state. A stream cannot rank against the full corpus distribution,
    * so the global top-fraction boundary is replaced by an absolute
    * threshold the caller derives from a batch fit (e.g. the score at
    * the desired pct_rank of a reference run of [[selectTopFraction]]).
    * Documents with fewer than two tokens have no bigrams, hence no
    * score, and are dropped — consistent with the batch face. */
  def selectStream(
      stream: DataFrame,
      weights: Array[Long],
      idCol: String,
      textCol: String,
      minScore: Long)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        val kept = scoreDocsLit(batch, weights, idCol, textCol)
          .filter(col("score") >= minScore)
          .select(col("doc_id").as("__keep_id"))
        sink(
          batch.join(broadcast(kept), batch(idCol) === col("__keep_id"), "left_semi"),
          id)
      }
    }

  /** Fit on `target`, score `raw`, keep the top `frac` by (score, id):
    * (doc_id, score, pct_rank). The fit runs eagerly (two bounded
    * aggregations) and the weights ride as a literal; the top-fraction
    * boundary rides the funnel-free distribution ranks
    * (Ranks.distributionRanks with a constant group), so no corpus-wide
    * window ever funnels through one task; the pct_rank >= 1-frac
    * comparison is the same bit-identical (r-1)/(n-1) double both
    * engines produce. */
  def selectTopFraction(
      target: DataFrame,
      raw: DataFrame,
      idCol: String,
      textCol: String,
      frac: Double,
      buckets: Int = 4096): DataFrame = {
    require(frac > 0 && frac <= 1, "frac must be in (0, 1]")
    val scored = scoreDocsLit(raw,
      importanceWeightArray(target, raw, textCol, buckets), idCol, textCol)
    // binScale 2^-20 (an exact exponent shift — bins never round): scores
    // are near-UNIQUE integers, so unit bins would put one bin per
    // document and the global selection's bin frame would grow with the
    // corpus — recreating the single-task funnel at the bin level.
    // Dividing out the weights' 2^20 fixed-point factor bounds the bin
    // universe by the score RANGE (max bigrams/doc × max ratio — a data
    // property, constant in corpus size), the Median-histogram argument
    // run in reverse.
    Ranks.distributionRanks(
        scored.withColumn("g", lit(1)), "g",
        col("score"), col("doc_id"), tiles = 4, rankCol = "rnk",
        binScale = 1.0 / 1048576.0)
      .filter(col("pct_rank") >= lit(1.0 - frac))
      .select(col("doc_id"), col("score"), col("pct_rank"))
  }
}
