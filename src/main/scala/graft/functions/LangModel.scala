package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/**
 * N-gram language-model quality filtering — the CCNet-style "how typical is
 * this document under a reference LM" stage of a training-data pipeline
 * (reference pipelines score documents with a small LM and drop the
 * high-perplexity tail; here the LM is a bigram stupid-backoff model
 * trained on a held-out slice of the corpus itself).
 *
 * Arithmetic is QUANTIZED TO WHOLE BITS deliberately: per-token surprisal
 * uses floor(log2 n) = length(bin(n)) - 1 — a pure integer/string
 * computation both Spark and DuckDB evaluate identically — so per-document
 * bit totals are exact order-independent integer sums and the only double
 * is one final division (bits / n_trans). A float log would differ between
 * engines in the last ulp and be unverifiable (the fixed-point PageRank /
 * 2^-20 k-means convention, DESIGN.md "exactness").
 *
 * Model: for transition prev→cur,
 *   - observed bigram:  bits = flog2(c(prev·)) − flog2(c(prev,cur))
 *   - backoff (unseen bigram, seen unigram):
 *                       bits = flog2(T) − flog2(c(cur)) + backoffBits
 *   - OOV:              bits = flog2(T) + backoffBits        (c := 1)
 * where c(prev·) is prev's transition-context count, T the reference
 * corpus token total, and backoffBits the integer analogue of stupid
 * backoff's α discount (2 bits ≈ α 0.25).
 *
 * 100 TB shape: training is one explode + pair-count aggregation (the
 * shuffle carries one row per DISTINCT bigram — Zipf-bounded, corpus-
 * sublinear) plus a prev-keyed context sum over the already-aggregated
 * pairs. Scoring is two UN-HINTED left equi-joins of the transition stream
 * against the LM tables (AQE broadcasts them while the vocabulary is
 * small; at web scale they shuffle-join on token keys) and one integer
 * per-document aggregation — no window, no driver-side loop. The single
 * driver action is the 1-row reference token total (metadata-scale by
 * construction, the sampledIvfCentroids / lm_coverage convention), inlined
 * as a literal so the scoring plan stays one lazy pipeline.
 */
object LangModel {

  /** floor(log2 n) for a positive count, as the engine-portable
    * length-of-binary-string computation (DuckDB: `length(bin(n)) - 1`). */
  private def flog2(c: Column): Column = (length(bin(c)) - lit(1)).cast(LongType)

  private def flog2Driver(n: Long): Long = {
    require(n > 0, s"flog2 of non-positive count $n")
    63L - java.lang.Long.numberOfLeadingZeros(n)
  }

  /** Whitespace-token transition stream `(id, prev, cur)` — one row per
    * adjacent token pair per document, generated narrowly with
    * slice + arrays_zip + explode (no positional self-join). Documents
    * with null text or fewer than two tokens contribute no rows. */
  private def transitions(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = TextFunctions.wsTokens(col(textCol))
    df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        explode(arrays_zip(
          slice(tk, lit(1), size(tk) - 1).as("prev"),
          slice(tk, lit(2), size(tk) - 1).as("cur"))).as("t"))
      .select(col(idCol), col("t.prev").as("prev"), col("t.cur").as("cur"))
  }

  /** Distinct observed transitions of `ref` with their counts
    * `(prev, cur, n)` — the ONE corpus-scanning aggregation of training;
    * contexts, unigram targets, and the token total all derive from this
    * (Zipf-bounded) frame, so its exchange is shared across every consumer
    * in one plan (ReusedExchange) instead of re-scanning the corpus. */
  private def pairCounts(ref: DataFrame, idCol: String, textCol: String): DataFrame =
    transitions(ref, idCol, textCol)
      .groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("n"))

  /** The trained bigram table `(prev, cur, n, bits)`: every transition
    * observed in `ref` with its count and quantized surprisal
    * flog2(c(prev·)) − flog2(n). Two aggregations, the second over the
    * already-distinct pair frame (corpus rows shuffle once). */
  def bigramLm(ref: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pairs = pairCounts(ref, idCol, textCol)
    val ctx = pairs.groupBy(col("prev")).agg(sum(col("n")).as("n_prev"))
    pairs.join(ctx, "prev")
      .select(col("prev"), col("cur"), col("n"),
        (flog2(col("n_prev")) - flog2(col("n"))).as("bits"))
  }

  /** A trained stupid-backoff bigram LM: the two reference tables plus the
    * OOV-base literal (flog2 of the transition total + the backoff
    * penalty). Pure reference STATE — persist with [[writeLm]], reload
    * with [[readLm]]; the streaming face holds it in storage, never in
    * the state store (the MinhashIndex convention). */
  final case class Lm(bigrams: DataFrame, unigrams: DataFrame, oovBase: Long)

  /** Build an [[Lm]] from a bigram COUNT frame `(prev, cur, n)`: contexts,
    * target unigrams (Σ_prev c(prev, cur)), and the transition total all
    * derive from it (shared exchange — the corpus scans once in the
    * scoring plan), the total being the ONE driver action (a 1-row
    * aggregate, inlined as the OOV literal). Counts, not bits, are the
    * model's canonical form — counts ADD, so snapshots merge
    * ([[appendLmCounts]]); bits are a derived view. */
  def lmFromPairs(pairs: DataFrame, backoffBits: Int = 2, minPairCount: Long = 1L): Lm = {
    require(backoffBits >= 0, "backoffBits must be non-negative")
    require(minPairCount >= 1, "minPairCount must be at least 1")
    val ctx = pairs.groupBy(col("prev")).agg(sum(col("n")).as("n_prev"))
    // Hapax pruning bounds the bigram table at web scale (the long tail of
    // once-seen pairs dominates its row count); pruned transitions fall
    // back to the unigram level, whose counts — like the contexts and the
    // total — stay UNPRUNED (probability mass is conserved; only the
    // bigram-level resolution coarsens).
    val kept =
      if (minPairCount > 1) pairs.filter(col("n") >= minPairCount) else pairs
    val big = kept.join(ctx, "prev")
      .select(col("prev"), col("cur"),
        (flog2(col("n_prev")) - flog2(col("n"))).as("__bg_bits"))
    val uni = pairs.groupBy(col("cur")).agg(sum(col("n")).as("un"))
      .select(col("cur"), flog2(col("un")).as("__u_flog2"))
    val total = pairs.agg(sum(col("n"))).collect()(0) match {
      case r if r.isNullAt(0) => 0L
      case r                  => r.getLong(0)
    }
    require(total > 0, "reference corpus has no token transitions to train on")
    Lm(big, uni, flog2Driver(total) + backoffBits)
  }

  /** Train the LM on `ref`: one distinct-bigram aggregation feeding
    * [[lmFromPairs]]. */
  def trainLm(
      ref: DataFrame, idCol: String, textCol: String, backoffBits: Int = 2): Lm =
    lmFromPairs(pairCounts(ref, idCol, textCol), backoffBits)

  /** Persist the LM's bigram counts — the train-once / score-forever
    * storage. LOG-STRUCTURED: [[appendLmCounts]] adds a daily increment as
    * a new partition and [[readLm]] re-aggregates on load (merge-on-read,
    * the additive-counts property), so increments never rewrite the
    * store — the MinhashIndex daily-increments posture for models.
    * [[compactLm]] rewrites the merged view to a fresh path when the
    * partition count grows. */
  def writeLmCounts(ref: DataFrame, idCol: String, textCol: String, path: String): Unit =
    pairCounts(ref, idCol, textCol).write.mode("overwrite").parquet(s"$path/pairs")

  /** Append a new corpus slice's counts as a delta partition (see
    * [[writeLmCounts]]); the merged model equals one trained on the union
    * of all slices — exactly, counts being additive integers. */
  def appendLmCounts(ref: DataFrame, idCol: String, textCol: String, path: String): Unit =
    pairCounts(ref, idCol, textCol).write.mode("append").parquet(s"$path/pairs")

  /** Append one slice TAGGED with a replay-stable batch id — the
    * [[StoreLedger]] move: a re-delivered batch (at-least-once delivery,
    * foreachBatch checkpoint recovery) rewrites byte-identical tagged
    * rows that [[readLm]]'s distinct collapses, so replays cannot
    * double-count. Tagged or untagged per store, never mixed. */
  def appendLmCounts(
      ref: DataFrame, idCol: String, textCol: String, path: String,
      batchId: Long): Unit =
    StoreLedger.tag(pairCounts(ref, idCol, textCol), batchId)
      .write.mode("append").parquet(s"$path/pairs")

  /** Takedown (GDPR/decontamination) for the ADDITIVE store: append the
    * doomed documents' pair counts NEGATED — the additive algebra makes
    * the read-side sum land exactly where retraining without those
    * documents would (bit-identical; LangModelSpec pins it), with no
    * retrain pass over the surviving corpus. Tagged through the ledger
    * like any slice, so a replayed takedown cannot double-decrement.
    * Caller contract: the doomed docs must actually be in the store
    * (decrementing an absent doc drives counts negative; [[readLm]]'s
    * net-positive filter drops such keys rather than corrupting bits). */
  def appendLmCountsNegated(
      ref: DataFrame, idCol: String, textCol: String, path: String,
      batchId: Long): Unit =
    StoreLedger.tag(
        pairCounts(ref, idCol, textCol)
          .select(col("prev"), col("cur"), (-col("n")).as("n")),
        batchId)
      .write.mode("append").parquet(s"$path/pairs")

  /** Load the merged model: re-aggregate the stored count partitions
    * (merge-on-read) and derive the bit tables. */
  def readLm(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      backoffBits: Int = 2): Lm =
    lmFromPairs(
      // n > 0: a fully-decremented pair ([[appendLmCountsNegated]]) nets
      // to zero and must vanish — an n=0 row would otherwise reach
      // flog2 in the bigram table and score as a (nonsense) hit instead
      // of falling through to the unigram/OOV chain. Plain stores only
      // ever hold positive counts, so the filter is free there.
      StoreLedger.collapse(spark.read.parquet(s"$path/pairs"))
        .groupBy(col("prev"), col("cur")).agg(sum(col("n")).as("n"))
        .filter(col("n") > 0),
      backoffBits)

  /** Rewrite the merged count view to a fresh store (compaction — run when
    * appended deltas accumulate; `dest` must differ from `src`). */
  def compactLm(spark: org.apache.spark.sql.SparkSession, src: String, dest: String): Unit = {
    require(src != dest, "compaction writes a FRESH store; cannot overwrite the source in place")
    // Net-positive only, matching readLm: fully-decremented pairs vanish
    // at compaction instead of riding along as n=0 rows forever.
    StoreLedger.collapse(spark.read.parquet(s"$src/pairs"))
      .groupBy(col("prev"), col("cur")).agg(sum(col("n")).as("n"))
      .filter(col("n") > 0)
      .write.mode("overwrite").parquet(s"$dest/pairs")
  }

  /** Score `docs` against an already-trained [[Lm]]:
    * `(idCol, n_trans, bits, bits_per_token)`. Every document survives —
    * a doc with < 2 tokens (or null text) scores (0, 0, null).
    * `bits_per_token` is the one double (a single exact division),
    * everything upstream is integer. Two un-hinted left equi-joins (AQE
    * broadcasts small LM tables; token-keyed shuffle joins at web scale)
    * + one integer per-doc aggregation. */
  def surprisalWith(docs: DataFrame, lm: Lm, idCol: String, textCol: String): DataFrame = {
    val scored = transitions(docs, idCol, textCol)
      .join(lm.bigrams, Seq("prev", "cur"), "left")
      .join(lm.unigrams, Seq("cur"), "left")
      .select(col(idCol),
        coalesce(col("__bg_bits"),
          lit(lm.oovBase) - coalesce(col("__u_flog2"), lit(0L))).as("__b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trans"), sum(col("__b")).as("bits"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trans"), lit(0L)).as("n_trans"),
        coalesce(col("bits"), lit(0L)).as("bits"),
        when(col("n_trans") > 0,
          col("bits").cast(DoubleType) / col("n_trans")).as("bits_per_token"))
  }

  /** Per-document surprisal under the stupid-backoff bigram LM trained on
    * `ref` — [[trainLm]] + [[surprisalWith]] in one call (the
    * oracle-checked batch face). */
  def surprisal(
      docs: DataFrame,
      ref: DataFrame,
      idCol: String,
      textCol: String,
      backoffBits: Int = 2): DataFrame =
    surprisalWith(docs, trainLm(ref, idCol, textCol, backoffBits), idCol, textCol)

  /** Order-3 transition stream `(id, w1, w2, w3)` — one row per adjacent
    * token triple. Documents with fewer than three tokens contribute no
    * rows. */
  private def transitions3(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = TextFunctions.wsTokens(col(textCol))
    df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        explode(arrays_zip(
          slice(tk, lit(1), size(tk) - 2).as("w1"),
          slice(tk, lit(2), size(tk) - 2).as("w2"),
          slice(tk, lit(3), size(tk) - 2).as("w3"))).as("t"))
      .select(col(idCol),
        col("t.w1").as("w1"), col("t.w2").as("w2"), col("t.w3").as("w3"))
  }

  /** A trigram stupid-backoff LM: the trigram table stacked on the full
    * bigram [[Lm]] (the backoff chain trigram → bigram → unigram → OOV,
    * one `backoffBits` penalty per level — the order-n generalization of
    * the bigram model; CCNet's KenLM plays this role at order 5). */
  final case class Lm3(trigrams: DataFrame, base: Lm, backoffBits: Int)

  /** Train the trigram layer (one distinct-triple aggregation + a
    * (w1, w2)-context sum over it) plus the bigram base. Two corpus
    * scans — the two explode shapes (pairs, triples) cannot share one
    * aggregation — both with Zipf-bounded exchanges. */
  def trainLm3(
      ref: DataFrame, idCol: String, textCol: String, backoffBits: Int = 2): Lm3 = {
    val tri = tripleCounts(ref, idCol, textCol)
    val ctx = tri.groupBy(col("w1"), col("w2")).agg(sum(col("n")).as("nc"))
    val trigrams = tri.join(ctx, Seq("w1", "w2"))
      .select(col("w1"), col("w2"), col("w3"),
        (flog2(col("nc")) - flog2(col("n"))).as("__t_bits"))
    Lm3(trigrams, trainLm(ref, idCol, textCol, backoffBits), backoffBits)
  }

  /** Distinct observed triples of `ref` with counts `(w1, w2, w3, n)` —
    * the trigram layer's canonical (additive, mergeable) form. */
  private def tripleCounts(ref: DataFrame, idCol: String, textCol: String): DataFrame =
    transitions3(ref, idCol, textCol)
      .groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("n"))

  /** Score `docs` against a trained [[Lm3]]:
    * `(idCol, n_trans, bits, bits_per_token)` over token TRIPLES
    * (n_trans = tokens − 2; docs with < 3 tokens score (0, 0, null)).
    * Per-triple bits, the backoff chain:
    *   - trigram hit:  flog2(c(w1 w2 ·)) − flog2(c(w1 w2 w3))
    *   - bigram hit:   flog2(c(w2 ·)) − flog2(c(w2 w3)) + backoffBits
    *   - unigram hit:  flog2(T) − flog2(c(w3)) + 2·backoffBits
    *   - OOV:          flog2(T) + 2·backoffBits
    * Three un-hinted left equi-joins + one integer per-doc aggregation —
    * the same scale shape as the bigram face, one join deeper. */
  def surprisal3With(docs: DataFrame, lm: Lm3, idCol: String, textCol: String): DataFrame = {
    val scored = transitions3(docs, idCol, textCol)
      .join(lm.trigrams, Seq("w1", "w2", "w3"), "left")
      .join(lm.base.bigrams
          .select(col("prev").as("w2"), col("cur").as("w3"), col("__bg_bits")),
        Seq("w2", "w3"), "left")
      .join(lm.base.unigrams.select(col("cur").as("w3"), col("__u_flog2")),
        Seq("w3"), "left")
      .select(col(idCol),
        coalesce(
          col("__t_bits"),
          col("__bg_bits") + lit(lm.backoffBits.toLong),
          // base.oovBase = flog2(T) + backoffBits, so + one more level:
          lit(lm.base.oovBase + lm.backoffBits) -
            coalesce(col("__u_flog2"), lit(0L))).as("__b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trans"), sum(col("__b")).as("bits"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trans"), lit(0L)).as("n_trans"),
        coalesce(col("bits"), lit(0L)).as("bits"),
        when(col("n_trans") > 0,
          col("bits").cast(DoubleType) / col("n_trans")).as("bits_per_token"))
  }

  /** Trigram surprisal trained on `ref` — [[trainLm3]] + [[surprisal3With]]
    * (the oracle-checked batch face). */
  def surprisal3(
      docs: DataFrame,
      ref: DataFrame,
      idCol: String,
      textCol: String,
      backoffBits: Int = 2): DataFrame =
    surprisal3With(docs, trainLm3(ref, idCol, textCol, backoffBits), idCol, textCol)

  /** The filter face: documents of `docs` whose per-token surprisal under
    * the `ref`-trained LM is at most `maxBitsPerToken` (unusually
    * high-perplexity text — boilerplate soup, wrong-language, garbled
    * encodings — is the drop set). Documents too short to score (< 2
    * tokens) pass through: shortness is [[TextFunctions]] quality-gate
    * territory, not an LM judgment. Output: the full `docs` columns plus
    * `(n_trans, bits, bits_per_token)`. */
  def perplexityGate(
      docs: DataFrame,
      ref: DataFrame,
      idCol: String,
      textCol: String,
      maxBitsPerToken: Double,
      backoffBits: Int = 2): DataFrame = {
    // Fail fast on collisions instead of silently producing duplicate
    // output columns (the Ranks clash-guard convention).
    val clash = Seq("n_trans", "bits", "bits_per_token").filter(docs.columns.contains)
    require(clash.isEmpty,
      s"input columns collide with surprisal outputs: ${clash.mkString(", ")}")
    docs.join(
        surprisal(docs, ref, idCol, textCol, backoffBits)
          .filter(col("n_trans") === 0 || col("bits_per_token") <= maxBitsPerToken)
          .select(col(idCol), col("n_trans"), col("bits"), col("bits_per_token")),
        Seq(idCol))
  }

  /** Per-group surprisal report `(groupCol, n_docs, n_scored, n_trans,
    * bits, bits_per_token)` — the observability face (which sources/
    * languages does the reference LM find atypical, and how much would a
    * gate drop?). One extra groupCol join + one bounded aggregation on
    * top of [[surprisal]]; the corpus-wide bits_per_token is again a
    * single exact division of order-independent integer sums. */
  def surprisalReport(
      docs: DataFrame,
      ref: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      backoffBits: Int = 2): DataFrame =
    surprisal(docs, ref, idCol, textCol, backoffBits)
      .join(docs.select(col(idCol), col(groupCol)), Seq(idCol))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum((col("n_trans") > 0).cast(LongType)).as("n_scored"),
        sum(col("n_trans")).as("n_trans"),
        sum(col("bits")).as("bits"))
      .withColumn("bits_per_token",
        when(col("n_trans") > 0,
          col("bits").cast(DoubleType) / col("n_trans")))

  /** Persist the trigram layer's counts next to the bigram store (same
    * log-structured merge-on-read contract as [[writeLmCounts]] /
    * [[appendLmCounts]]); [[readLm3]] re-aggregates both layers. */
  def writeLm3Counts(ref: DataFrame, idCol: String, textCol: String, path: String): Unit = {
    writeLmCounts(ref, idCol, textCol, path)
    tripleCounts(ref, idCol, textCol).write.mode("overwrite").parquet(s"$path/triples")
  }

  def appendLm3Counts(ref: DataFrame, idCol: String, textCol: String, path: String): Unit = {
    appendLmCounts(ref, idCol, textCol, path)
    tripleCounts(ref, idCol, textCol).write.mode("append").parquet(s"$path/triples")
  }

  /** Tagged trigram-layer append (see the bigram overload): both layers
    * carry the same batch id, so a replayed batch collapses in each. */
  def appendLm3Counts(
      ref: DataFrame, idCol: String, textCol: String, path: String,
      batchId: Long): Unit = {
    appendLmCounts(ref, idCol, textCol, path, batchId)
    StoreLedger.tag(tripleCounts(ref, idCol, textCol), batchId)
      .write.mode("append").parquet(s"$path/triples")
  }

  /** Takedown for the trigram store — both layers decremented under one
    * batch id (see [[appendLmCountsNegated]] for the algebra and the
    * caller contract). */
  def appendLm3CountsNegated(
      ref: DataFrame, idCol: String, textCol: String, path: String,
      batchId: Long): Unit = {
    appendLmCountsNegated(ref, idCol, textCol, path, batchId)
    StoreLedger.tag(
        tripleCounts(ref, idCol, textCol)
          .select(col("w1"), col("w2"), col("w3"), (-col("n")).as("n")),
        batchId)
      .write.mode("append").parquet(s"$path/triples")
  }

  def readLm3(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      backoffBits: Int = 2): Lm3 = {
    // n > 0 for the same reason as readLm: fully-decremented triples must
    // fall through to the bigram/unigram backoff chain, not score as hits.
    val tri = StoreLedger.collapse(spark.read.parquet(s"$path/triples"))
      .groupBy(col("w1"), col("w2"), col("w3")).agg(sum(col("n")).as("n"))
      .filter(col("n") > 0)
    val ctx = tri.groupBy(col("w1"), col("w2")).agg(sum(col("n")).as("nc"))
    val trigrams = tri.join(ctx, Seq("w1", "w2"))
      .select(col("w1"), col("w2"), col("w3"),
        (flog2(col("nc")) - flog2(col("n"))).as("__t_bits"))
    Lm3(trigrams, readLm(spark, path, backoffBits), backoffBits)
  }

  /** Top-k adjacent-token collocations by whole-bit PMI — the
    * word2phrase / multi-word-expression mining stage that feeds phrase
    * vocabularies. PMI = log2(p(a,b) / (p(a)·p(b))) quantized PER TERM:
    * `pmi_bits = flog2(n_ab) + flog2(T) − flog2(n_a·) − flog2(n_·b)`
    * with every count taken from the transition frame (n_a· = a's
    * occurrences as bigram-left, n_·b = b's as bigram-right, T = total
    * transitions). Term-wise flog2 — NOT flog2 of the products — keeps
    * every operand in 64 bits at any corpus size (the products overflow
    * past ~10^9 transitions) at the cost of ±2 bits of quantization,
    * the same whole-bit contract as the surprisal family. `minCount`
    * floors the pair count first: PMI famously explodes on hapax pairs
    * (two typos that co-occur once have maximal PMI).
    *
    * 100 TB shape: ONE corpus-scanning pair aggregation ([[pairCounts]];
    * Zipf-bounded exchange); left/right marginals and T derive from that
    * frame (shared exchange); two un-hinted vocabulary joins (AQE
    * broadcasts while marginals fit, token-keyed shuffle joins at web
    * scale); T rides a 1-row broadcast (the q14_subq shape); the cut is
    * a bounded TakeOrderedAndProject with a full deterministic
    * tie-break (bits, count, pair). */
  def collocations(
      ref: DataFrame, idCol: String, textCol: String,
      minCount: Long = 2L, k: Int = 20): DataFrame = {
    require(minCount >= 1, s"minCount must be positive, got $minCount")
    require(k >= 1, s"k must be positive, got $k")
    val pairs = pairCounts(ref, idCol, textCol)
    val left = pairs.groupBy(col("prev")).agg(sum(col("n")).as("n_prev"))
    val right = pairs.groupBy(col("cur")).agg(sum(col("n")).as("n_cur"))
    val total = pairs.agg(sum(col("n")).as("t"))
    pairs
      .filter(col("n") >= minCount)
      .join(left, "prev")
      .join(right, "cur")
      .crossJoin(broadcast(total))
      .select(col("prev").as("w1"), col("cur").as("w2"),
        col("n").as("n_pair"),
        (flog2(col("n")) + flog2(col("t")) -
          flog2(col("n_prev")) - flog2(col("n_cur"))).as("pmi_bits"))
      .orderBy(col("pmi_bits").desc, col("n_pair").desc, col("w1"), col("w2"))
      .limit(k)
  }
}
