package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/**
 * Streaming ingestion faces for the remaining log-structured stores —
 * one thin per-micro-batch appender per store, completing the pattern
 * [[GraphStream]] / [[AnnStream]] / [[HllStream]] set: every expensive
 * derived artifact (signatures, postings, counts, inventories) can
 * accumulate from an unbounded stream with ALL state in storage, none in
 * the state store, and the batch reader sees every slice ingested so far.
 *
 * Two algebras, two replay postures (each store's own contract):
 *  - SET stores (pHash signatures, gram inventory): the stored unit is a
 *    set row merged by distinct-on-read — replayed batches
 *    (at-least-once delivery, checkpoint recovery) are IDEMPOTENT.
 *  - ADDITIVE stores (LM counts, NB counts, BM25 postings): slices SUM
 *    on read, so disjoint increments compose exactly — but a replayed
 *    batch double-counts. Run these sinks with exactly-once batch ids
 *    (checkpointed foreachBatch skips re-delivered batch ids on restart)
 *    or dedupe upstream; the same caveat their batch append faces carry.
 *
 * Empty batches append nothing (no zero-row parquet files accumulate
 * under restart loops).
 */
object StoreIngest {

  private def ingest(stream: DataFrame)(
      append: DataFrame => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty) append(batch)
    }

  /** Perceptual-signature ingestion (SET algebra; the codec runs once per
    * blob ever — see [[graft.multimodal.Multimodal.writePhashIndex]]). */
  def phashSignatures(
      stream: DataFrame, idCol: String, binCol: String, path: String): DataStreamWriter[Row] =
    ingest(stream)(b =>
      graft.multimodal.Multimodal.appendPhashIndex(b, idCol, binCol, path))

  /** Cross-source gram-inventory ingestion (SET algebra; feeds
    * [[graft.functions.Dedup.overlapMatrixFromInventory]]). */
  def gramInventory(
      stream: DataFrame, textCol: String, srcCol: String, path: String,
      n: Int = 8): DataStreamWriter[Row] =
    ingest(stream)(b =>
      graft.functions.Dedup.appendGramInventory(b, textCol, srcCol, path, n))

  /** Bigram-LM count ingestion (ADDITIVE algebra; feeds
    * [[graft.functions.LangModel.readLm]] / the LmStream scoring face). */
  def lmCounts(
      stream: DataFrame, idCol: String, textCol: String, path: String): DataStreamWriter[Row] =
    ingest(stream)(b =>
      graft.functions.LangModel.appendLmCounts(b, idCol, textCol, path))

  /** Naive-Bayes count ingestion (ADDITIVE algebra; feeds
    * [[graft.functions.NaiveBayes.readNb]] / the NbStream scoring face). */
  def nbCounts(
      stream: DataFrame, labelCol: String, textCol: String, path: String): DataStreamWriter[Row] =
    ingest(stream)(b =>
      graft.functions.NaiveBayes.appendNbCounts(b, labelCol, textCol, path))

  /** BM25 posting ingestion (ADDITIVE algebra; feeds
    * [[graft.functions.Retrieval]]'s index reader). */
  def bm25Postings(
      stream: DataFrame, idCol: String, textCol: String, path: String): DataStreamWriter[Row] =
    ingest(stream)(b =>
      graft.functions.Retrieval.appendBm25Index(b, idCol, textCol, path))

  /** Embedding-drift reference ingestion — additive algebra, but
    * REPLAY-SAFE: each slice is tagged with the micro-batch id (replay-
    * stable under checkpoint recovery), and the read side collapses
    * re-delivered slices by the batch-id ledger
    * ([[graft.functions.Drift.appendEmbStats]]'s tagged overload) — the
    * prototype for closing at-least-once on the other additive stores. */
  def embStats(
      stream: DataFrame, vecCol: String, path: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty)
        graft.functions.Drift.appendEmbStats(batch, vecCol, path, id)
    }
}
