package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import TextFunctions.{wsTokens => wsTok}

/**
 * BM25 top-k retrieval over the corpus — the "find the documents most
 * relevant to these terms" primitive behind eval-set mining, targeted
 * decontamination review, and seed-document expansion.
 *
 * Scoring is Robertson BM25 with the UNLOGGED idf ratio
 * `(N - df + 0.5) / (df + 0.5)` (log-free, the tfidf_topk convention):
 * every input (tf, df, dl, N) is an exact integer and every operation in
 * the score is a single correctly-rounded IEEE op, written with IDENTICAL
 * parenthesization in the engine and the DuckDB oracle — so the doubles
 * are bit-equal cross-engine, no log() ulp drift. Per-term scores are
 * fixed-pointed (floor(s * 2^20)) before the per-doc sum, making the sum
 * an order-independent integer — safe under any partitioning.
 *
 * Scale shape:
 *  - one narrow corpus aggregation for (N, sum dl) — a 1-row broadcast
 *    (the q14_subq shape), reusable across every query of the corpus;
 *  - one corpus explode pass whose very next operator drops every
 *    non-query token, so the tf shuffle carries only query-term hits;
 *  - df is derived from the (tiny) tf frame, broadcast back;
 *  - the final top-k is a bounded TakeOrderedAndProject, never a global
 *    sort of the scored set.
 */
object Retrieval {

  /** Top `topK` documents by summed BM25 (k1 = 1.2, b = 0.75) over the
    * literal `terms`. Output: (doc_id, n_terms, score_fp) where score_fp
    * is the fixed-point (2^-20) score sum; ties break on doc_id. */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      topK: Int): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val d = docs.filter(col(textCol).isNotNull)
    val stats = d.agg(
      count(lit(1)).cast(LongType).as("n_docs"),
      sum(size(wsTok(col(textCol))).cast(LongType)).as("sum_dl"))
    val hits = d
      .select(col(idCol).as("doc_id"),
        size(wsTok(col(textCol))).cast(LongType).as("dl"),
        explode(wsTok(col(textCol))).as("word"))
      .filter(col("word").isin(terms: _*))
    val tf = hits
      .groupBy(col("doc_id"), col("dl"), col("word"))
      .agg(count(lit(1)).cast(LongType).as("tf"))
    val dfreq = tf.groupBy(col("word")).agg(count(lit(1)).cast(LongType).as("df"))
    // Identical parse tree to the oracle SQL — literals 0.5/2.2/1.2/0.25/
    // 0.75 appear verbatim on both sides (never derived, e.g. 1.2 + 1.0
    // need not round to the double of "2.2").
    val avgdl = col("sum_dl") / col("n_docs")
    val idf = (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val norm = (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / avgdl)))
    tf.join(broadcast(dfreq), "word")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        floor(idf * norm * lit(Median.Scale)).cast(LongType).as("s_fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("s_fp")).as("score_fp"))
      .orderBy(col("score_fp").desc, col("doc_id"))
      .limit(topK)
  }

  /** Persist the corpus as a BM25 inverted index — the retrieval story at
    * storage scale: a query should read the QUERY TERMS' postings, not
    * the corpus. Layout (the writeIvfPqIndex / MinhashIndex posture):
    *
    *  - `postings/` — (word, doc_id, tf, dl), PARTITIONED BY a
    *    `bucket = xxhash64(word) mod buckets` column, so a term lookup
    *    directory-prunes to ≤ |terms| buckets of ~vocab/buckets words
    *    each (a raw partitionBy(word) would mint one directory per vocab
    *    entry);
    *  - `stats/` — one (n_docs, sum_dl) row. LOG-STRUCTURED:
    *    [[appendBm25Index]] lands a NEW corpus slice's postings + stats
    *    delta and [[bm25TopKFromIndex]] sums stats on read (additive
    *    integers, the LM-counts convention). Per-term df is derived at
    *    query time from the pruned postings — no separate table to keep
    *    consistent across increments.
    *
    * Append slices must be DISJOINT from what the index already holds
    * (re-indexing a document double-counts it — the same caller contract
    * as the MinHash index increments). */
  def writeBm25Index(
      docs: DataFrame, idCol: String, textCol: String, path: String,
      buckets: Int = 256): Unit =
    writeIndexSlice(docs, idCol, textCol, path, buckets, overwrite = true,
      batchId = None)

  /** Add a disjoint corpus slice to an existing index (see
    * [[writeBm25Index]]). */
  def appendBm25Index(
      docs: DataFrame, idCol: String, textCol: String, path: String,
      buckets: Int = 256): Unit =
    writeIndexSlice(docs, idCol, textCol, path, buckets, overwrite = false,
      batchId = None)

  /** Append one slice TAGGED with a replay-stable batch id — the
    * [[StoreLedger]] move: a re-delivered batch (at-least-once delivery,
    * foreachBatch checkpoint recovery) rewrites byte-identical tagged
    * postings + stats rows that [[bm25TopKFromIndex]]'s distinct
    * collapses, so replays cannot double-count. Tagged or untagged per
    * store, never mixed. */
  def appendBm25Index(
      docs: DataFrame, idCol: String, textCol: String, path: String,
      buckets: Int, batchId: Long): Unit =
    writeIndexSlice(docs, idCol, textCol, path, buckets, overwrite = false,
      batchId = Some(batchId))

  /** Takedown for the ADDITIVE BM25 index: append the doomed documents'
    * postings with NEGATED tf and a negated stats delta under one batch
    * id — [[bm25TopKFromIndex]]'s net-sum read then lands exactly where
    * re-indexing without those documents would (df, avgdl, and every
    * fixed-point score bit-identical; RetrievalSpec pins it). A replayed
    * takedown collapses in the ledger. Caller contract: the doomed docs
    * must actually be in the index (net-negative postings are dropped by
    * the read-side tf > 0 filter rather than scoring). */
  def appendBm25Decrement(
      docs: DataFrame, idCol: String, textCol: String, path: String,
      buckets: Int, batchId: Long): Unit =
    writeIndexSlice(docs, idCol, textCol, path, buckets, overwrite = false,
      batchId = Some(batchId), negate = true)

  private def writeIndexSlice(
      docs: DataFrame, idCol: String, textCol: String, path: String,
      buckets: Int, overwrite: Boolean, batchId: Option[Long],
      negate: Boolean = false): Unit = {
    require(buckets > 0, "buckets must be positive")
    val mode = if (overwrite) "overwrite" else "append"
    val sign = if (negate) -1L else 1L
    def tagged(df: DataFrame): DataFrame =
      batchId.fold(df)(StoreLedger.tag(df, _))
    val d = docs.filter(col(textCol).isNotNull)
    tagged(d.agg(
        (count(lit(1)) * sign).cast(LongType).as("n_docs"),
        (sum(size(wsTok(col(textCol))).cast(LongType)) * sign).as("sum_dl")))
      .write.mode(mode).parquet(s"$path/stats")
    tagged(d.select(col(idCol).as("doc_id"),
        size(wsTok(col(textCol))).cast(LongType).as("dl"),
        explode(wsTok(col(textCol))).as("word"))
      .groupBy(col("doc_id"), col("dl"), col("word"))
      .agg((count(lit(1)) * sign).cast(LongType).as("tf"))
      .withColumn("bucket", pmod(xxhash64(col("word")), lit(buckets.toLong))))
      .write.mode(mode).partitionBy("bucket").parquet(s"$path/postings")
  }

  /** Top-k BM25 against the PERSISTED index: the postings scan
    * directory-prunes to the query terms' buckets (plus a pushed `word`
    * filter inside them), stats merge on read, df derives from the pruned
    * hits — so query cost scales with the terms' posting lists, never the
    * corpus. Scores are bit-identical to [[bm25TopK]] over the same
    * corpus (RetrievalSpec pins the parity). */
  def bm25TopKFromIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      terms: Seq[String],
      topK: Int,
      buckets: Int = 256): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    // Term -> bucket via the SAME engine hash the writer used: a
    // metadata-scale local job, not a driver-side hash reimplementation
    // that could drift from xxhash64's seed/variant.
    import spark.implicits._
    val bucketIds = terms.toDS()
      .select(pmod(xxhash64(col("value")), lit(buckets.toLong)))
      .collect().map(_.getLong(0)).distinct.toSeq
    val stats = StoreLedger.collapse(spark.read.parquet(s"$path/stats"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    // Ledger collapse AFTER the bucket/word prune: the distinct runs on
    // the query terms' posting rows only, never the corpus's. The
    // net-sum + tf > 0 filter is the decrement algebra
    // ([[appendBm25Decrement]]): a taken-down doc's postings cancel to
    // zero and vanish; for plain disjoint-slice stores each (doc, word)
    // has exactly one row, so the sum is the identity.
    val tf = StoreLedger.collapse(spark.read.parquet(s"$path/postings")
        .filter(col("bucket").isInCollection(bucketIds) && col("word").isin(terms: _*)))
      .groupBy(col("doc_id"), col("dl"), col("word"))
      .agg(sum(col("tf")).as("tf"))
      .filter(col("tf") > 0)
      .select(col("doc_id"), col("dl"), col("word"), col("tf"))
    val dfreq = tf.groupBy(col("word")).agg(count(lit(1)).cast(LongType).as("df"))
    val avgdl = col("sum_dl") / col("n_docs")
    val idf = (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val norm = (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / avgdl)))
    tf.join(broadcast(dfreq), "word")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        floor(idf * norm * lit(Median.Scale)).cast(LongType).as("s_fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("s_fp")).as("score_fp"))
      .orderBy(col("score_fp").desc, col("doc_id"))
      .limit(topK)
  }

  /** [[bm25TopK]] with an explicit 1-based `rank` column (score desc,
    * doc_id tie-break — the ann rank contract), the shape [[rrfFuse]]
    * consumes. Rank assignment is one bounded TopKByScore aggregation
    * over the ALREADY-limited top-k frame (≤ topK rows) — no window
    * (partitioned or otherwise) and no self-join ever exists in the
    * plan; score_fp < 2^53 so the Double round-trip through the
    * aggregator buffer is exact. */
  def bm25TopKRanked(
      docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], topK: Int): DataFrame = {
    import org.apache.spark.sql.Encoders
    val topk = udaf(new Similarity.TopKByScore(topK),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
    bm25TopK(docs, idCol, textCol, terms, topK)
      .agg(topk(col("doc_id"), col("score_fp").cast("double")).as("top"))
      .select(posexplode(col("top")).as(Seq("r", "hit")))
      .select((col("r") + 1).cast(LongType).as("rank"),
        col("hit._1").as("doc_id"),
        col("hit._2").cast(LongType).as("score_fp"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of N
    * rankings — the hybrid-retrieval combiner (lexical BM25 + semantic
    * ANN is the canonical pair): each list contributes
    * `2^20 div (k0 + rank)` to its documents, fused docs order by summed
    * contribution. INTEGER fixed-point, not 1/(k0+rank) doubles — the
    * sum is order-independent and the DuckDB oracle reproduces it
    * exactly (`1048576 // (k0 + rank)`); k0 = 60 is the paper's
    * constant. Rankings need (doc_id, rank); rank ≥ 1.
    *
    * 100 TB shape: no join at all — the lists union (map-side), one
    * doc-keyed partial aggregation sums contributions, and the final cut
    * is a bounded TakeOrderedAndProject. Fusing k-bounded lists means
    * every frame here is lists·k rows — but the same plan fuses
    * corpus-sized rankings (e.g. full quality orderings) unchanged,
    * which is why nothing assumes the input fits anywhere. */
  def rrfFuse(rankings: Seq[DataFrame], k0: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k0 >= 1, "k0 must be positive")
    rankings
      .map(_.select(col("doc_id"),
        call_function("div", lit(1048576L),
          lit(k0.toLong) + col("rank").cast(LongType)).as("c")))
      .reduce(_ unionAll _)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lists"), sum(col("c")).as("rrf_fp"))
      .orderBy(col("rrf_fp").desc, col("doc_id"))
      .limit(topK)
  }
}
