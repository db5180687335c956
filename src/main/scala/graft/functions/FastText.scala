package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge => B}

import graft.expressions.{BandKeys, ContainmentSortedLongBounded, CoverageCounts, HashedShingles, IntraDocStrip, JaccardSorted, JaccardSortedLong, JaccardSortedLongBounded, MinHashSig, SimHash32, SkipgramConcat, SortedLongContains, HashedWordGrams, SortedShingles, TokenEntropyBits, WinnowDigest, XHash32Array}

/**
 * Column API over the codegen'd dedup kernels
 * ([[graft.expressions.TextHashExpressions]]). Drop-in replacements for the
 * equivalent [[TextFunctions]] compositions on the dedup hot path — same
 * values (FastKernelSpec asserts it), ~100x faster per row because the
 * per-element work runs as a primitive JVM loop inside whole-stage codegen
 * instead of interpreted higher-order-function evaluation.
 */
object FastText {

  /** Distinct char k-grams, sorted — set-equal to TextFunctions.charShingles. */
  def sortedShingles(c: Column, k: Int): Column = B.column(SortedShingles(B.expression(c), k))

  /** Sorted distinct xhash32 per element — set-equal to TextFunctions.shingleHashes
    * given shingle input. */
  def xhash32Array(c: Column): Column = B.column(XHash32Array(B.expression(c)))

  /** [n_distinct_k_grams, n_hits_in_ref] in one pass — value-equal to
    * (size(sortedShingles), size(array_intersect(sortedShingles, ref))). */
  def coverageCounts(c: Column, k: Int, ref: Seq[String]): Column =
    B.column(CoverageCounts(B.expression(c), k, ref))

  /** [n_spans, n_kept, clean_hash] — one-pass intra-document span strip,
    * value-equal to Spans.intraDocStripRef's HOF composition. */
  def intraDocStrip(c: Column, k: Int): Column =
    B.column(IntraDocStrip(B.expression(c), k))

  /** [n_tokens, bits] — one-pass whole-bit token entropy over the
    * `split(text, ' ')` frame (see TextKernels.tokenEntropyBits). */
  def tokenEntropyBits(c: Column): Column =
    B.column(TokenEntropyBits(B.expression(c)))

  /** Sorted distinct xhash32 of every word n-gram — hash-equal to the
    * HOF transform+xhash32+distinct composition it replaces. */
  def hashedWordGrams(c: Column, n: Int): Column =
    B.column(HashedWordGrams(B.expression(c), n))

  /** MinHash signature — value-equal to TextFunctions.minhashSignature. */
  def minhashSig(hashes: Column, k: Int): Column = B.column(MinHashSig(B.expression(hashes), k))

  /** LSH band keys — value-equal to TextFunctions.bandKeys. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    B.column(BandKeys(B.expression(sig), bands, rowsPerBand))

  /** 32-bit SimHash — value-equal to TextFunctions.simhash32. */
  def simhash32(hashes: Column): Column = B.column(SimHash32(B.expression(hashes)))

  /** Jaccard of two sorted distinct string arrays — value-equal to
    * size(array_intersect)/size(array_union). */
  def jaccardSorted(a: Column, b: Column): Column =
    B.column(JaccardSorted(B.expression(a), B.expression(b)))

  /** Distinct char k-grams as sorted 64-bit XXH64 hashes — the narrow
    * (8 B/element) set representation for dedup joins and verification. */
  def hashedShingles(c: Column, k: Int): Column = B.column(HashedShingles(B.expression(c), k))

  /** [[hashedShingles]] wrapped non-nullable (coalesce with an empty
    * array): join-key constraint propagation can then not infer an
    * `isnotnull(<kernel chain>)` filter and push it into the parquet scan,
    * which would re-run the whole shingle kernel once in the filter and
    * again in the projection. Pair with a cheap `col(raw).isNotNull`
    * filter on the RAW column to preserve null-row semantics (pushes to
    * parquet as a plain IsNotNull). The single shared home for this
    * workaround — keep call sites on this, not on ad-hoc coalesces. */
  def hashedShinglesNN(c: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.{coalesce, typedLit}
    coalesce(hashedShingles(c, k), typedLit(Array.empty[Long]))
  }

  /** Binary-search membership of a long in a SORTED long array — O(log n)
    * vs array_contains' O(n). For membership filters probed once per
    * element of the same row's array (span reassembly), this turns an
    * O(n^2)-per-document filter into O(n log n). */
  def sortedLongContains(arr: Column, v: Column): Column =
    B.column(SortedLongContains(B.expression(arr), B.expression(v)))

  /** Jaccard of two sorted distinct long arrays. */
  def jaccardSortedLong(a: Column, b: Column): Column =
    B.column(JaccardSortedLong(B.expression(a), B.expression(b)))

  /** Threshold-aware Jaccard: -1.0 for pairs provably below `t` (early
    * exit — the verify-time suffix filter), exact value otherwise. Only
    * for call sites that filter `>= t` afterwards. */
  def jaccardSortedLongBounded(a: Column, b: Column, t: Double): Column =
    B.column(JaccardSortedLongBounded(B.expression(a), B.expression(b), t))

  /** Forward-window skip-gram pairs as NUL-joined strings — the codegen'd
    * replacement for TextFunctions.skipgramPairs' interpreted HOF tree on
    * the co-occurrence hot path (value-equal modulo encoding; binary order
    * of the encoded pair == (w1, w2) tuple order). */
  def skipgramConcat(toks: Column, window: Int): Column =
    B.column(SkipgramConcat(B.expression(toks), window))

  /** Threshold-aware containment |A∩B|/|A|: -1.0 for pairs provably below
    * `t` (early exit), exact value otherwise. Only for call sites that
    * filter `>= t` afterwards. */
  def containmentSortedLongBounded(a: Column, b: Column, t: Double): Column =
    B.column(ContainmentSortedLongBounded(B.expression(a), B.expression(b), t))

  /** [n_fp, fp_xor] — one-pass winnowing fingerprint digest, value-equal
    * to size/xor-fold over TextFunctions.positionalShingleHashes(k) →
    * winnowMinima(w) (FastKernelSpec asserts it). */
  def winnowDigest(c: Column, k: Int, w: Int): Column =
    B.column(WinnowDigest(B.expression(c), k, w))
}
