package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Column-level text-analysis primitives for large-scale training-data
 * pipelines. Everything here is built from codegen'd built-in functions
 * (`org.apache.spark.sql.functions`) — no UDFs — so the whole layer stays
 * inside whole-stage codegen and is a narrow (shuffle-free) transformation.
 *
 * Determinism contract: every function is bit-reproducible and expressible
 * in ANSI-ish SQL, so each has a DuckDB oracle (SparkEntry.oracleSql). The
 * shared 32-bit hash is the first 8 hex digits of md5 — identical in any
 * engine that has `md5` — rather than Spark's Murmur3 `hash()`, whose seed
 * and variant are engine-private.
 */
object TextFunctions {

  /** Mersenne prime 2^31-1 — modulus for all derived hash families. */
  val P: Long = 2147483647L

  /** Cross-engine 32-bit hash: unsigned value of the first 8 hex chars of
    * md5. Range [0, 2^32). */
  def xhash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)

  /** Distinct character k-grams ("shingles") of a string, in first-seen
    * order. `sequence` is guarded to stay ascending on short inputs. */
  def charShingles(c: Column, k: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(c) - (k - 1), lit(1))),
        i => c.substr(i, lit(k))))

  /** Distinct hashed character k-grams — the set representation used by all
    * dedup operators (MinHash, SimHash, exact Jaccard). */
  def shingleHashes(c: Column, k: Int): Column =
    array_distinct(transform(charShingles(c, k), xhash32 _))

  // -------------------------------------------------------------------
  // MinHash
  // -------------------------------------------------------------------

  /** Deterministic universal-hash coefficients h_i(x) = (a_i*x + b_i) mod P. */
  private[graft] def coefA(i: Int): Long = ((i * 2654435761L + 1) % (P - 1)) + 1
  private[graft] def coefB(i: Int): Long = (i * 40503L + 12345L) % P

  /** MinHash signature: k permutation-minima over a set of 32-bit shingle
    * hashes.
    *
    * Expression shape matters here: a Catalyst lambda re-evaluates every
    * captured subtree once per element it iterates, so the naive
    * `transform(0..k-1, i => array_min(transform(hashes, ...)))` evaluates
    * the (md5-bearing) `hashes` input k times per row. This single
    * `aggregate` fold consumes `hashes` exactly once — each element updates
    * all k running minima — making the cost |hashes| md5 + k·|hashes|
    * integer ops per row no matter how Catalyst collapses projections. */
  def minhashSignature(hashes: Column, k: Int): Column = {
    val as = typedLit((0 until k).map(coefA))
    val bs = typedLit((0 until k).map(coefB))
    // lit(P) is an identity for min: every (a*x+b) mod P is < P.
    aggregate(
      hashes,
      array_repeat(lit(P), k),
      (mins, h) =>
        transform(mins, (m, i) => least(m, ((h % P) * element_at(as, i + 1) + element_at(bs, i + 1)) % P)))
  }

  /** LSH band keys for a signature: `bands` buckets, each combining
    * `len(sig)/bands` consecutive signature values into one 64-bit rolling
    * polynomial key. Docs agreeing on any band are join candidates.
    *
    * Single-pass fold for the same reason as [[minhashSignature]]: `sig` is
    * consumed once, so an upstream signature projection can be collapsed
    * into this expression without re-evaluating it per band. Keys never
    * leave the engine (a mod-P collision only adds a candidate pair that
    * exact verification discards), so cross-engine stability is not needed.
    * The mod-P reduction keeps `acc * K + v` under 2^63 (ANSI-safe). */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column = {
    val bandOf = typedLit((0 until bands * rowsPerBand).map(i => (i / rowsPerBand).toLong))
    aggregate(
      zip_with(sig, bandOf, (v, b) => struct(v.as("v"), b.as("b"))),
      array_repeat(lit(17L), bands),
      (acc, x) =>
        transform(acc, (a, i) =>
          when(x.getField("b") === i, (a * lit(1000003L) + x.getField("v")) % P).otherwise(a)))
  }

  // -------------------------------------------------------------------
  // SimHash
  // -------------------------------------------------------------------

  /** 32-bit SimHash over a set of 32-bit shingle hashes: bit b of the result
    * is set iff the sum over shingles of (bit b of hash ? +1 : -1) is >= 0.
    *
    * One `aggregate` fold keeps 32 running bit-sums in an array accumulator,
    * so `hashes` (md5-bearing) is evaluated once per row — the naive
    * 32-separate-aggregates form re-evaluates it 32 times (see
    * [[minhashSignature]]). The final reduction folds the sums array into
    * the signature value, again consuming it exactly once. */
  def simhash32(hashes: Column): Column = {
    val bitSums = aggregate(
      hashes,
      array_repeat(lit(0L), 32),
      (acc, h) =>
        transform(acc, (s, b) =>
          s + (call_function("shiftright", h, b).bitwiseAND(lit(1L)) * 2 - 1)))
    aggregate(
      transform(bitSums, (s, b) =>
        when(s >= 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L),
      (acc, v) => acc + v)
  }

  /** Hamming distance between two simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // -------------------------------------------------------------------
  // Tokenization / language ID / quality
  // -------------------------------------------------------------------

  /** BPE-ish tokenizer: letter runs, digit runs, and single non-alnum
    * non-space chars (so CJK text yields one token per char). Case is NOT
    * folded — keeps the regex engine-portable. */
  val TokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokens(c: Column): Column = regexp_extract_all(c, lit(TokenPattern), lit(0))

  /** Whitespace tokens (the cheap path). */
  def wsTokens(c: Column): Column = split(c, " ")

  /** Dedup-normalized text: ASCII case-fold + whitespace-run collapse +
    * trim. `translate` over the 26 ASCII letters, NOT `lower()` — full
    * Unicode case mapping is locale/library-dependent (Java vs utf8proc
    * differ on dotted-I, sharp-s, etc.), while a fixed 26-char table is
    * bit-portable to any engine. The whitespace collapse is the literal
    * regex `' +'` (both engines replace ALL matches; DuckDB needs the 'g'
    * flag spelled in the oracle). Codegen'd string ops, shuffle-free. */
  def normText(c: Column): Column =
    trim(regexp_replace(
      translate(c, "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"),
      " +", " "))

  /** Learn a BPE merge table: the top-`n` adjacent [[bpeTokens]] pairs by
    * corpus count (ties on binary pair order), in rank order — the
    * merge-table face of the `bpe_pairs` training step. One tokenize +
    * pair-count aggregation (the shuffle carries one row per DISTINCT
    * pair, Zipf-bounded) + a bounded TakeOrderedAndProject top-n; the
    * result is metadata-scale (n rows) and rides subsequent plans as a
    * literal — the same collect posture as IVF centroids. */
  def learnBpeMerges(df: DataFrame, textCol: Column, n: Int): Seq[(String, String)] = {
    val cnt = greatest(size(col("tk")) - 1, lit(0))
    df.select(bpeTokens(textCol).as("tk"))
      .select(explode(zip_with(
        slice(col("tk"), lit(1), cnt), slice(col("tk"), lit(2), cnt),
        (a, b) => struct(a.as("a"), b.as("b")))).as("pr"))
      .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("n_pairs").desc, col("a"), col("b"))
      .limit(n)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
  }

  /** TRUE iterative BPE training (Sennrich et al.): rule r+1 is the top
    * adjacent pair of the corpus AFTER merges 1..r are applied — each
    * merge changes downstream pair counts, so on any corpus where the
    * top pairs overlap (e.g. (x,y) then (y,z)), the resulting table
    * diverges from [[learnBpeMerges]]' one-shot top-n from rule 2 on.
    * One rule is learned per round; returns (a, b, count-at-learn-time)
    * in rule order.
    *
    * Posture: chained restartable rounds (the pagerank_k3 / stumpChain
    * discipline) — each round is ONE pair-count aggregation (the shuffle
    * carries one row per DISTINCT pair, Zipf-bounded) + a bounded top-1,
    * and the round's merged token frame is persisted before the next
    * round consumes it. The per-round persist is the chained-rounds
    * EXCEPTION to the ≥3-consumer rule: each frame is consumed by an
    * ACTION (the top-1 collect) before the next round exists, so lazy
    * chaining would re-plan tokenize + r merge kernels multiplicatively
    * (the kcore_k3 lesson). Rounds apply ONLY the newest rule to the
    * previous round's frame — exact, because the greedy kernel applies
    * rules sequentially: bpeApply(x, m1 ++ m2) == bpeApply(bpeApply(x,
    * m1), m2). All frames release before return; only 1-row rule picks
    * reach the driver. */
  def learnBpeMergesChained(
      df: DataFrame, textCol: Column, rounds: Int): Seq[(String, String, Long)] = {
    var cur = df.filter(textCol.isNotNull)
      .select(bpeTokens(textCol).as("tk")).persist()
    val persisted = scala.collection.mutable.ArrayBuffer(cur)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    try {
      for (r <- 1 to rounds) {
        val cnt = greatest(size(col("tk")) - 1, lit(0))
        val top = cur
          .select(explode(zip_with(
            slice(col("tk"), lit(1), cnt), slice(col("tk"), lit(2), cnt),
            (a, b) => struct(a.as("a"), b.as("b")))).as("pr"))
          .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("n_pairs").desc, col("a"), col("b"))
          .limit(1)
          .collect()
        require(top.nonEmpty, s"bpe training round $r: no adjacent pairs left")
        val rule = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += rule
        if (r < rounds) {
          cur = cur.select(
            bpeApply(col("tk"), Seq((rule._1, rule._2))).as("tk")).persist()
          persisted += cur
        }
      }
      out.toSeq
    } finally persisted.foreach(_.unpersist(blocking = false))
  }

  /** Apply a learned merge table to a token array: greedy left-to-right
    * non-overlapping pair merges, one merge rule after another (kernel-
    * backed, [[graft.expressions.BpeApply]]) — turns [[bpeTokens]] +
    * [[learnBpeMerges]] into an actual tokenizer stage whose output ids
    * feed token counting and sequence packing. Map-side, shuffle-free. */
  def bpeApply(tokens: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.BpeApply(
        org.apache.spark.sql.GraftColumnBridge.expression(tokens), merges))

  /** Encode merged tokens to vocab ids: in-vocab tokens map through the
    * literal vocab (collected driver-side, metadata-scale — the
    * IVF-centroid posture), OOV -> `unkId`. The map rides the projection
    * as a literal, so the pass is map-side and shuffle-free. */
  def bpeEncodeIds(tokens: Column, vocab: Map[String, Int], unkId: Int): Column =
    transform(tokens, t => coalesce(element_at(typedLit(vocab), t), lit(unkId)))

  /** [[bpeEncodeIds]] at vocabulary scale: the vocab ships as a Spark
    * BROADCAST (one torrent fetch per executor; the plan carries only the
    * handle) instead of a typedLit that rides every task closure — the
    * face for >64k-entry vocabularies, where the literal map's wire cost
    * grows with the plan rather than the data. Same output bit-for-bit
    * ([[graft.expressions.BpeEncodeBcast]]); still map-side and
    * shuffle-free. */
  def bpeEncodeIdsBcast(
      spark: org.apache.spark.sql.SparkSession,
      tokens: Column,
      vocab: Map[String, Int],
      unkId: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.BpeEncodeBcast(
        org.apache.spark.sql.GraftColumnBridge.expression(tokens),
        vocabBroadcastOf(spark, vocab), unkId))

  /** One live Broadcast per (SparkContext, vocab): repeated calls (bench
    * iterations, re-built plans) reuse the context's existing broadcast
    * instead of registering a fresh never-destroyed one per call — the
    * driver-side twin of BcastVocab's executor-side dedupe. Keyed by the
    * context's app id so a restarted context (whose broadcasts are dead)
    * can never serve a stale handle; the map holds the previous context's
    * entries only until the first call under the new one. Vocab equality
    * is map equality — metadata-scale (the vocab is an index definition),
    * so the hash/compare is noise next to the query it serves. */
  private val vocabBcasts = new java.util.concurrent.ConcurrentHashMap[
    (String, Map[String, Int]),
    org.apache.spark.broadcast.Broadcast[Map[String, Int]]]()
  private def vocabBroadcastOf(
      spark: org.apache.spark.sql.SparkSession,
      vocab: Map[String, Int])
      : org.apache.spark.broadcast.Broadcast[Map[String, Int]] = {
    val app = spark.sparkContext.applicationId
    vocabBcasts.keySet.removeIf(_._1 != app)
    vocabBcasts.computeIfAbsent((app, vocab), _ =>
      spark.sparkContext.broadcast(vocab))
  }

  /** Decode vocab ids back to tokens through the inverted vocab; any id
    * outside the table (the unk id included) -> `unkToken`. Same
    * literal-map shuffle-free posture as [[bpeEncodeIds]] — together they
    * are the tokenizer round-trip: decode(encode(tok)) == tok exactly for
    * in-vocab tokens. */
  def bpeDecodeIds(ids: Column, vocab: Map[String, Int],
      unkToken: String = "<unk>"): Column = {
    val inv: Map[Int, String] = vocab.map(_.swap)
    transform(ids, i => coalesce(element_at(typedLit(inv), i), lit(unkToken)))
  }

  /** Directional skip-gram pairs within a forward window: for each token
    * position i, pairs (tok[i], tok[j]) for j in (i, i+window]. Generated
    * MAP-SIDE by higher-order functions — no positional self-join, so the
    * co-occurrence pipeline's only shuffle is the final pair-count
    * aggregation (pair volume is n_tokens x window, linear in corpus
    * size). Output: array<struct<w1,w2>>. */
  def skipgramPairs(toks: Column, window: Int): Column = {
    require(window >= 1, "skip-gram window must be >= 1")
    // sequence(a, b) is DESCENDING when a > b, so the single-token case
    // must be guarded explicitly rather than relying on an empty range.
    when(size(toks) < 2, array().cast(s"array<struct<w1:string,w2:string>>"))
      .otherwise(flatten(transform(sequence(lit(1), size(toks) - 1), i =>
        transform(sequence(i + 1, least(i + lit(window), size(toks))), j =>
          struct(element_at(toks, i).as("w1"), element_at(toks, j).as("w2"))))))
  }

  /** Stopword lists for the n-gram language heuristic. ASCII-only so that
    * no case-folding of accented chars is involved. */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "pas"),
    "es" -> Seq("el", "los", "las", "y", "es", "una", "del", "por", "con", "para")
  )

  private def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Heuristic language ID: CJK-ratio gate for zh, then argmax of stopword
    * hits with a fixed tie-break order (en > de > fr > es). Integer-only
    * comparisons — no float thresholds. */
  def langId(c: Column): Column = {
    val cjk = size(regexp_extract_all(c, lit("[一-鿿]"), lit(0)))
    val toks = split(lower(c), " ")
    val hits = Stopwords.map { case (lang, words) => lang -> stopwordHits(toks, words) }.toMap
    val (en, de, fr, es) = (hits("en"), hits("de"), hits("fr"), hits("es"))
    when(cjk * 10 >= length(c) * 3, lit("zh"))
      .when(en >= de && en >= fr && en >= es, lit("en"))
      .when(de >= fr && de >= es, lit("de"))
      .when(fr >= es, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Quality-score components. All counts are integers; every ratio is a
    * single int/int division (one correctly-rounded double op) and the
    * score has an all-integer numerator — bit-reproducible anywhere. */
  def qualityColumns(c: Column): Seq[Column] = {
    val n = length(c)
    // Single-char class counts via length-difference, NOT
    // size(regexp_extract_all(...)): extract_all materializes an array of
    // every matched character (one boxed String per letter of every doc)
    // just to take its size — measured ~0.2 s of per-task allocation/GC
    // churn on the quality kernel at sf0.1. regexp_replace produces one
    // string per pass; the counts (and hence every downstream ratio and
    // hash) are integer-identical.
    def matches(pat: String): Column = n - length(regexp_replace(c, pat, ""))
    val letters = matches("[A-Za-z]")
    val digits = matches("[0-9]")
    val puncts = matches("[.,;:!?]")
    val spaces = matches(" ")
    Seq(
      n.as("n_chars"),
      (letters.cast(DoubleType) / n).as("alpha_ratio"),
      (digits.cast(DoubleType) / n).as("digit_ratio"),
      (puncts.cast(DoubleType) / n).as("punct_ratio"),
      ((letters * 2 + spaces - digits * 3 - puncts * 5).cast(DoubleType) / n).as("quality_score")
    )
  }

  /** The composite quality score alone (the last of [[qualityColumns]]) —
    * named accessor so consumers don't couple to positional ordering. */
  def qualityScore(c: Column): Column = qualityColumns(c).last

  /** Word-repetition ratio (a Gopher-style quality gate): the fraction of
    * word occurrences that repeat an earlier word, `1 - distinct/total`
    * over whitespace tokens. High values flag boilerplate/spam. One
    * int/int division — bit-reproducible cross-engine. */
  def wordRepetitionRatio(c: Column): Column = {
    val toks = wsTokens(c)
    lit(1.0) - size(array_distinct(toks)).cast(DoubleType) / size(toks)
  }

  // -------------------------------------------------------------------
  // PII redaction
  // -------------------------------------------------------------------

  /** (pattern, replacement) pairs for the standard scrub pass. Patterns are
    * deliberately RE2-compatible (no backrefs/lookaround) so any engine's
    * regex implementation — and the DuckDB oracle — applies them
    * identically. Order matters: emails before phones (an email's digits
    * must not be half-eaten by the phone pattern). */
  val PiiPatterns: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("\\+?[0-9][0-9()\\- ]{6,}[0-9]", "<PHONE>"),
    ("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"))

  /** Redact emails, phone-like digit runs, and IPv4 addresses — the
    * standard pre-training scrub stage. A narrow chain of codegen'd
    * regexp_replace calls: no shuffle, pushes through any partitioning. */
  def redactPii(c: Column): Column =
    PiiPatterns.foldLeft(c) { case (acc, (p, r)) => regexp_replace(acc, p, r) }

  // -------------------------------------------------------------------
  // Fingerprinting
  // -------------------------------------------------------------------

  /** Document fingerprint: the `k` smallest distinct 8-gram hashes (a k-min
    * sketch — the winnowing idea with a global window). Two docs sharing
    * most 8-grams share most fingerprint slots. */
  def kMinFingerprint(c: Column, k: Int): Column =
    slice(array_sort(shingleHashes(c, 8)), 1, k)

  /** POSITIONAL (non-distinct, in-order) hashed character k-grams — the
    * sequence representation winnowing needs; [[shingleHashes]] is the SET
    * representation the dedup operators use. */
  def positionalShingleHashes(c: Column, k: Int): Column =
    transform(
      sequence(lit(1), greatest(length(c) - (k - 1), lit(1))),
      i => xhash32(c.substr(i, lit(k))))

  /** Winnowing window-minima selector (Schleimer, Wilkerson, Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD'03 — the MOSS selector): the distinct set of per-window
    * minima over `w` consecutive entries of a POSITIONAL hash array
    * ([[positionalShingleHashes]]). Winnowing guarantees every shared
    * substring of length >= w + k - 1 contributes a shared fingerprint
    * hash, while keeping the selected set a ~2/(w+1) fraction of all
    * grams — the position-robust plagiarism/attribution fingerprint
    * [[kMinFingerprint]]'s global k-min sketch cannot give (a k-min slot
    * says nothing about WHERE the overlap is, and local edits shift
    * which grams win globally). Map-side HOFs over the document — the
    * fingerprint never shuffles more than its distinct minima.
    *
    * `hs` MUST be a MATERIALIZED column (its own projection step), not
    * the gram-hash expression inlined: this lambda references `hs` once
    * per window, and Catalyst re-evaluates a non-attribute subexpression
    * at every reference — inlining [[positionalShingleHashes]] here
    * turns O(n) md5s per document into O(n²) (measured: a single-core
    * multi-minute stall at sf0.1 vs sub-second materialized).
    * CollapseProject will NOT fold a multiply-referenced non-cheap
    * projection back in, so a two-step select is safe. */
  def winnowMinima(hs: Column, w: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(hs) - (w - 1), lit(1))),
        j => array_min(slice(hs, j, lit(w)))))
}
