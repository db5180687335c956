package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Cross-document span-level cleaning: the C4/CCNet-style stages that edit
 * *inside* documents instead of dropping whole ones. A "span" is a fixed
 * run of `k` consecutive whitespace words (the corpus here is single-space
 * separated; a line- or sentence-split corpus would swap the splitter).
 *
 *  - [[spanDedup]]: keep only the FIRST corpus-wide occurrence of every
 *    span (C4's line-dedup, over fixed word windows) — a doc whose every
 *    span appeared earlier disappears entirely, which is exactly the
 *    exact-duplicate-document case.
 *  - [[boilerplateStrip]]: drop EVERY occurrence of spans that appear in
 *    >= `minDf` distinct documents (headers, footers, license blurbs —
 *    repeated-across-docs boilerplate), keeping unique content.
 *
 * 100 TB shape (shared by both): decisions are made on hash-only frames —
 * every exchange keyed by span content carries a (xxhash64, md5) digest
 * pair plus id metadata, ~48 B/row, never the span text (the
 * identity-by-digest convention of [[Dedup.exactGroups]]; a false merge
 * needs a simultaneous 64-bit + 128-bit collision). Span text normally
 * shuffles exactly once, keyed by doc id, into the reassembly group-by;
 * see each operator's doc for its decision join-back (spanDedup contracts
 * a per-doc keep set; boilerplateStrip anti-joins its typically-tiny
 * broadcast drop set, with an AQE shuffle fallback for pathological ones).
 */
object Spans {

  /** One row per fixed `k`-word span: (id, n_spans, span_idx, span).
    * Narrow — a split + windowed-slice explode fused into the scan; span
    * count arithmetic is integer-exact (`div`). Empty/null docs are
    * dropped (they have no spans). */
  def spansOf(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, "span length k must be positive")
    df.filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .withColumn("__w", split(col(textCol), " "))
      .withColumn("n_spans", expr(s"(size(__w) + ${k - 1}) div $k"))
      .select(col(idCol), col("n_spans"),
        posexplode(expr(
          s"transform(sequence(0, cast(n_spans - 1 as int)), i -> array_join(slice(__w, i * $k + 1, $k), ' '))"))
          .as(Seq("span_idx", "span")))
  }

  /** Intra-document repetition strip — the within-doc half of span dedup
    * (the cross-doc half is [[spanDedup]]): cut each document into fixed
    * `k`-word spans, keep each span's FIRST occurrence within its own
    * document, and fingerprint the reassembly. Unlike every other dedup
    * family member this is fully NARROW — each document is processed
    * inside its own row with array HOFs, so the plan has zero shuffles at
    * any corpus size. The first-occurrence test is positional
    * (`array_position` returns the first index of a value, so a span
    * survives iff it sits at its own first position); O(spans²) per doc,
    * bounded by document length, not corpus size.
    * Output: (id, n_spans, n_kept, clean_hash). */
  def intraDocStrip(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, "span length k must be positive")
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), FastText.intraDocStrip(col(textCol), k).as("__r"))
      .select(
        col(idCol),
        col("__r").getItem(0).as("n_spans"),
        col("__r").getItem(1).as("n_kept"),
        col("__r").getItem(2).as("clean_hash"))
  }

  /** The HOF composition [[intraDocStrip]]'s kernel is bit-equivalent to —
    * kept as the reference implementation (FastKernelSpec asserts
    * equality; it is O(spans²) per document via the positional
    * `array_position` probe, which is why production runs the kernel). */
  private[graft] def intraDocStripRef(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), split(col(textCol), " ").as("__tk"))
      .withColumn("__spans", expr(
        s"transform(sequence(0, cast((size(__tk) + ${k - 1}) div $k - 1 as int)), " +
          s"i -> array_join(slice(__tk, i * $k + 1, $k), ' '))"))
      .withColumn("__kept", expr(
        "filter(__spans, (sp, i) -> array_position(__spans, sp) = i + 1)"))
      .select(
        col(idCol),
        size(col("__spans")).cast(LongType).as("n_spans"),
        size(col("__kept")).cast(LongType).as("n_kept"),
        TextFunctions.xhash32(array_join(col("__kept"), " ")).as("clean_hash"))

  /** The hash-only decision frame: span content reduced to its digest pair
    * so every decision exchange stays ~48 B/row. The md5 input is
    * coalesced non-nullable (spans are never null — array_join can't
    * produce one) so downstream joins/aggregates never infer an
    * `isnotnull(md5(span))` constraint that would re-run the digest
    * kernel inside a scan filter. */
  private def digestPair(spanCol: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] =
    Seq(xxhash64(spanCol).as("__h64"), md5(coalesce(spanCol, lit(""))).as("__h128"))

  private def digests(spans: DataFrame, idCol: String): DataFrame =
    spans.select(col(idCol) +: col("span_idx") +: digestPair(col("span")): _*)

  /** Keep only the first corpus-wide occurrence (min (id, span_idx)) of
    * each span, then reassemble the survivors per document. Output:
    * (id, n_spans, n_kept, clean_text); docs with zero surviving spans
    * (i.e. exact-duplicate documents) are dropped. One digest-keyed
    * window over the hash-only frame; see class doc for the full shape. */
  def spanDedup(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val sp = spansOf(df, idCol, textCol, k)
    val keep = digests(sp, idCol)
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("__h64"), col("__h128"))
          .orderBy(col(idCol), col("span_idx"))))
      .filter(col("__rk") === 1)
      .select(col(idCol), col("span_idx"))
    reassemble(sp, keep, idCol)
  }

  /** Drop every occurrence of spans appearing in >= `minDf` distinct
    * documents; reassemble the rest. Same output contract as
    * [[spanDedup]]. The boilerplate set is found by a digest-keyed
    * count-distinct over the hash-only frame and removed with an
    * un-hinted anti-join (AQE broadcasts it when small — the typical
    * case: boilerplate is by definition a tiny fraction of distinct
    * spans — and falls back to a shuffle when not). */
  def boilerplateStrip(
      df: DataFrame, idCol: String, textCol: String, k: Int, minDf: Int): DataFrame = {
    require(minDf >= 2, "minDf < 2 would strip every span")
    // Boilerplate is a property of span CONTENT — every occurrence of a
    // digest shares the verdict — and the boilerplate set is small by
    // definition (spans repeated across many docs are a sliver of the
    // distinct-span universe). So, unlike spanDedup's per-occurrence keep
    // set, the decision joins back DIRECTLY: one digest pipeline feeds a
    // skew-safe two-phase count-distinct whose surviving digests anti-join
    // the span frame un-hinted — AQE broadcasts the typical tiny set (the
    // span frame then never shuffles before reassembly), and falls back
    // to a shuffle for a pathological one. Two corpus passes total: the
    // decision pipeline and the reassembly pass.
    val bp = spansOf(df, idCol, textCol, k)
      .select(col(idCol) +: digestPair(col("span")): _*)
      .groupBy(col("__h64"), col("__h128"))
      .agg(count_distinct(col(idCol)).as("__df"))
      .filter(col("__df") >= minDf)
      .select(col("__h64"), col("__h128"))
    val sp = spansOf(df, idCol, textCol, k)
    val withDigest = sp.select(
      col(idCol) +: col("n_spans") +: col("span_idx") +: col("span") +: digestPair(col("span")): _*)
    rebuildDocs(withDigest.join(bp, Seq("__h64", "__h128"), "left_anti"), idCol)
  }

  /** The persisted side of streaming span dedup: for every distinct span
    * digest, its corpus-wide FIRST occurrence — (__h64, __h128, __sid,
    * __sidx), one ~40 B row per distinct span, never the text. The
    * occurrence provenance is what makes [[cleanStream]] replay-safe: a
    * store row only blocks STRICTLY-LATER occurrences, so a re-run batch
    * whose own digests already landed reproduces its output instead of
    * sinking nothing. Compute once over the existing corpus, then let
    * [[cleanStream]] append each batch's novel digests. */
  def spanIndex(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    digests(spansOf(df, idCol, textCol, k), idCol)
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("__h64"), col("__h128"))
          .orderBy(col(idCol), col("span_idx"))))
      .filter(col("__rk") === 1)
      .select(col("__h64"), col("__h128"),
        col(idCol).cast(LongType).as("__sid"),
        col("span_idx").cast(LongType).as("__sidx"))

  def writeSpanIndex(df: DataFrame, idCol: String, textCol: String, k: Int, path: String): Unit =
    spanIndex(df, idCol, textCol, k).write.mode("overwrite").parquet(path)

  /** Per-micro-batch streaming face of [[spanDedup]]: each batch drops
    * spans already present in the persisted digest store at `indexPath`
    * (plus intra-batch repeats, first occurrence winning), sinks the
    * reassembled documents, then APPENDS its novel digests to the store —
    * so later batches dedup against everything sunk so far. Mirrors
    * [[graft.streaming.StreamDedup.nearDupFilterAgainstIndex]] /
    * [[Contamination.cleanStream]]: dedup state lives in storage, not the
    * state store, so an unbounded corpus never pressures watermarks, and
    * re-running batch [[spanDedup]] over (store corpus ++ batches) gives
    * the identical result (SpansSpec asserts the parity). A store row
    * blocks only STRICTLY-EARLIER-provenance occurrences (`(__sid,
    * __sidx) < (id, span_idx)`), which makes an at-least-once replay
    * idempotent: the failed attempt's own appended digests have EQUAL
    * provenance and so don't suppress the re-run's output (the
    * semDedupStream ordered-guard rule; SpansSpec replay test). */
  def cleanStream(
      stream: DataFrame,
      indexPath: String,
      idCol: String,
      textCol: String,
      k: Int)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        val seen = batch.sparkSession.read.parquet(indexPath)
        val sp = spansOf(batch, idCol, textCol, k)
        val firstInBatch = digests(sp, idCol)
          .withColumn("__rk", row_number().over(
            Window.partitionBy(col("__h64"), col("__h128"))
              .orderBy(col(idCol), col("span_idx"))))
          .filter(col("__rk") === 1)
        val novel = firstInBatch.as("b")
          .join(seen,
            col("b.__h64") === seen("__h64") && col("b.__h128") === seen("__h128") &&
              (col("__sid") < col(s"b.$idCol") ||
                (col("__sid") === col(s"b.$idCol") && col("__sidx") < col("b.span_idx"))),
            "left_anti")
        sink(reassemble(sp, novel.select(col(idCol), col("span_idx")), idCol), id)
        // Append AFTER the sink: novel's plan reads the store's file list
        // as of batch start, so the append never feeds its own input.
        novel.select(col("__h64"), col("__h128"),
            col(idCol).cast(LongType).as("__sid"),
            col("span_idx").cast(LongType).as("__sidx"))
          .write.mode("append").parquet(indexPath)
      }
    }

  /** Rebuild each document from its kept spans, in span order. The keep
    * set is first contracted to one (id, sorted idx array) row per doc —
    * metadata-scale next to the span frame — so span text joins and
    * regroups on the SAME key (id): Catalyst plans one exchange for both
    * (the join's output partitioning satisfies the group-by). */
  private def reassemble(sp: DataFrame, keep: DataFrame, idCol: String): DataFrame = {
    // Sorted keep set + binary-search membership: array_contains is O(n)
    // per probe, and the filter probes once per span of the same doc —
    // O(spans^2) for a pathological multi-megabyte document. The sorted
    // kernel makes the whole doc O(spans log spans).
    val keepPerDoc = keep.groupBy(col(idCol))
      .agg(sort_array(collect_list(col("span_idx").cast(LongType))).as("__keep"))
    rebuildDocs(
      sp.join(keepPerDoc, Seq(idCol))
        .filter(FastText.sortedLongContains(col("__keep"), col("span_idx").cast(LongType))),
      idCol)
  }

  /** The shared tail of every span operator: group the surviving span
    * rows by doc and emit (id, n_spans, n_kept, clean_text) with spans
    * rejoined in span order. Runs on its input join's own partitioning
    * (same key) — no extra exchange. */
  private def rebuildDocs(kept: DataFrame, idCol: String): DataFrame =
    kept.groupBy(col(idCol))
      .agg(
        first(col("n_spans")).as("n_spans"),
        count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("span_idx").as("i"), col("span").as("s")))),
            x => x.getField("s")),
          " ").as("clean_text"))
}
