package graft.streaming

import graft.functions.Dedup
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/**
 * Streaming deduplication wrappers. State size is the scale concern:
 *  - `exactForever` keeps every key seen — only for bounded key domains.
 *  - `exactWithinWatermark` bounds state by event time — the 100 TB-safe
 *    default: state holds only keys younger than the watermark.
 *  - `nearDupFilterAgainstIndex` is near-dup (not exact) streaming dedup:
 *    state lives in the persisted corpus index, not in the streaming
 *    engine, so it is unbounded-corpus-safe.
 */
object StreamDedup {

  def exactForever(stream: DataFrame, keyCols: Seq[String]): DataFrame =
    stream.dropDuplicates(keyCols)

  /** Requires `eventTimeCol` to be a timestamp column; sets the watermark
    * and drops duplicate keys arriving within it. */
  def exactWithinWatermark(
      stream: DataFrame,
      keyCols: Seq[String],
      eventTimeCol: String,
      delay: String): DataFrame =
    stream
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Per-micro-batch NEAR-dup filter against a persisted corpus
    * [[graft.functions.Dedup.MinhashIndex]] — the streaming face of
    * incremental dedup: each batch is indexed (a narrow, batch-sized
    * pass), banded-joined against the stored corpus bands, exact-verified,
    * and only documents with no corpus near-dup at `threshold` reach
    * `sink`. The corpus index is loaded once per query, not per batch;
    * at warehouse scale the stored bands are bucketed by join key so the
    * per-batch candidate join shuffles only the (small) batch side — see
    * [[graft.functions.Dedup.writeMinhashIndex]]. The surviving batch
    * would typically also be indexed and appended to the store so later
    * batches dedup against it — a caller doing that must make the drop
    * rule order-aware (drop i only for index partners j < i) or a
    * replayed micro-batch finds its own appended signatures and drops
    * every row (the ordered-guard rule of `Similarity.semDedupStream` /
    * `Spans.cleanStream`, both replay-spec'd; this function itself never
    * appends and is replay-safe against a fixed index). */
  def nearDupFilterAgainstIndex(
      stream: DataFrame,
      index: Dedup.MinhashIndex,
      idCol: String,
      textCol: String,
      shingleK: Int = 4,
      numHashes: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.8)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        val pairs = Dedup.minhashPairsAcross(
          Dedup.buildMinhashIndex(batch, idCol, textCol, shingleK, numHashes, bands),
          index, threshold)
        val dupIds = pairs.select(col("i").as("__dup_id")).distinct()
        sink(
          batch.join(broadcast(dupIds), batch(idCol) === col("__dup_id"), "left_anti"),
          id)
      }
    }

  /** Streaming INCREMENTAL duplicate clustering — the daily-ingest
    * capstone over the whole near-dup store lifecycle. Per micro-batch:
    *
    *  1. the batch is MinHash-indexed once (a narrow, batch-sized pass)
    *     and its signature slice appended to the corpus index at
    *     `indexPath` ([[graft.functions.Dedup.appendMinhashIndex]] —
    *     replay collapses on distinct-read, both tables being pure
    *     functions of (id, text, params));
    *  2. near-dup pairs are computed batch-vs-everything-indexed-so-far
    *     (the store read includes this slice, so intra-batch pairs ride
    *     the same banded join — never an extra self-join);
    *  3. the new pairs fold into the persisted `(id, cluster_id)`
    *     assignment via
    *     [[graft.functions.Dedup.duplicateClustersIncremental]] — star
    *     edges preserve every prior component, so the store always equals
    *     clustering over ALL pairs ever seen without re-deriving
    *     yesterday's pairs from text;
    *  4. only CHANGED rows (new docs + docs relabeled by a merge) append
    *     to the assignment log at `assignPath` under the LWW
    *     [[graft.functions.StoreLog]] algebra with the micro-batch id as
    *     generation. The slice is O(affected docs), not O(corpus) — at
    *     100 TB the daily append is proportional to the day's dup
    *     activity; labels only ever merge downward, so an unchanged id's
    *     old row stays the winner.
    *
    * Replay-safe end to end: a redelivered batch re-appends byte-identical
    * signature rows, re-derives the same pairs, folds to the SAME
    * assignment (the fold is idempotent once absorbed), and its
    * changed-slice is empty. Read the live assignment with
    * [[readClusterAssignment]]. */
  def incrementalClusters(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String,
      assignPath: String,
      shingleK: Int = 4,
      numHashes: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.8): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, gen: Long) =>
      if (!batch.isEmpty) {
        val spark = batch.sparkSession
        val batchIdx = Dedup.buildMinhashIndex(
          batch, idCol, textCol, shingleK, numHashes, bands)
        Dedup.appendMinhashIndex(batchIdx, indexPath)
        val store = Dedup.readMinhashIndexDedup(spark, indexPath)
        val pairs = Dedup.minhashPairsAcross(batchIdx, store, threshold)
          .filter(col("i") =!= col("j")) // the batch's own store rows
          .select(col("i"), col("j"))
        val hPath = new org.apache.hadoop.fs.Path(assignPath)
        val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
        val prior =
          if (fs.exists(hPath))
            graft.functions.StoreLog.readLive(spark, assignPath, Seq("id"))
          else
            spark.range(0).select(col("id"), col("id").as("cluster_id"))
        val next = Dedup.duplicateClustersIncremental(prior, pairs)
        val changed = next.join(prior, Seq("id", "cluster_id"), "left_anti")
        graft.functions.StoreLog.appendInserts(changed, assignPath, gen)
      }
    }

  /** The live `(id, cluster_id)` assignment under the log's LWW algebra —
    * the read face of [[incrementalClusters]]' store. Docs with no
    * near-dup partner at the threshold are absent (their implicit cluster
    * is themselves), matching the batch `duplicateClusters` contract. */
  def readClusterAssignment(
      spark: org.apache.spark.sql.SparkSession, assignPath: String): DataFrame =
    graft.functions.StoreLog.readLive(spark, assignPath, Seq("id"))

  /** Content-hash dedup: dedup on a 32-bit content hash instead of the full
    * payload — shrinks both shuffle width and state size; use for
    * document-level streaming dedup. */
  def byContentHash(
      stream: DataFrame,
      contentCol: String,
      eventTimeCol: String,
      delay: String): DataFrame =
    stream
      .withColumn("__content_hash", xxhash64(col(contentCol)))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(Seq("__content_hash"))
      .drop("__content_hash")
}
