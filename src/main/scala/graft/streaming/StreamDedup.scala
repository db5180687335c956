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
        // Guarded: an all-singletons first batch must not seed the log
        // with a schema-less empty write.
        if (!changed.isEmpty)
          graft.functions.StoreLog.appendInserts(changed, assignPath, gen)
      }
    }

  /** [[incrementalClusters]] with TAKEDOWNS riding the same stream — the
    * full lifecycle face. Input columns: `(op, idCol, textCol)` with
    * op = 0 (insert) / 1 (takedown; text ignored), all ops under ONE
    * foreachBatch id clock (the graphEdgeOps rule: a second stream with
    * an unrelated generation sequence breaks the LWW ordering). The
    * INDEX here is the LOG-structured layout ([[graft.functions.StoreLog]]
    * over `shingles`/`bands`, the dedup_retract posture) — takedown-able,
    * at the cost of a key-grouped read; the insert-only face keeps the
    * cheaper plain-append layout. Per batch (generation g):
    *
    *  1. surviving inserts (not taken down in the same batch — a same-gen
    *     insert+tombstone resolves to TOMBSTONE by the log algebra, so the
    *     fold must not see their pairs either) are indexed and appended;
    *  2. takedowns tombstone the shingle row and all `bands` rows;
    *  3. arrivals fold into the prior assignment (the incremental star
    *     fold), then [[graft.functions.Dedup.duplicateClustersRetractFromIndex]]
    *     re-clusters ONLY the components a takedown touched, off the live
    *     index restricted to their survivors;
    *  4. the assignment log gets the CHANGED rows as inserts and the
    *     DEPARTED ids (doomed docs + singleton survivors whose last
    *     partner left) as tombstones, all at generation g — a later
    *     re-arrival re-inserts at a higher generation and resurrects by
    *     the algebra.
    *
    * Replay-safe like the insert face: re-delivered slices re-tag
    * identical rows at the same generation; the fold/retract reproduce
    * the absorbed assignment, so the changed/departed slices are empty. */
  def incrementalClustersOps(
      stream: DataFrame,
      opCol: String,
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
        val conf = spark.sessionState.newHadoopConf()
        def exists(p: String) = {
          val hp = new org.apache.hadoop.fs.Path(p)
          hp.getFileSystem(conf).exists(hp)
        }
        val doomed = batch.filter(col(opCol) === 1)
          .select(col(idCol).as("id")).distinct()
        val inserts = batch.filter(col(opCol) === 0)
          .join(doomed, batch(idCol) === doomed("id"), "left_anti")
        val insertIdx = Dedup.buildMinhashIndex(
          inserts, idCol, textCol, shingleK, numHashes, bands)
        if (!inserts.isEmpty) {
          graft.functions.StoreLog.appendInserts(
            insertIdx.shingled, s"$indexPath/shingles", gen)
          graft.functions.StoreLog.appendInserts(
            insertIdx.banded, s"$indexPath/bands", gen)
        }
        // A takedown before any insert slice has nothing to retract (the
        // appendTombstones contract) — and nothing to re-cluster.
        if (exists(s"$indexPath/shingles")) {
          if (!doomed.isEmpty) {
            graft.functions.StoreLog.appendTombstones(
              doomed, s"$indexPath/shingles", gen)
            graft.functions.StoreLog.appendTombstones(
              doomed.select(col("id"),
                explode(sequence(lit(0), lit(bands - 1))).as("band")),
              s"$indexPath/bands", gen)
          }
          val live = Dedup.MinhashIndex(
            graft.functions.StoreLog.readLive(spark, s"$indexPath/shingles", Seq("id")),
            graft.functions.StoreLog.readLive(spark, s"$indexPath/bands", Seq("id", "band")))
          val newPairs = Dedup.minhashPairsAcross(insertIdx, live, threshold)
            .filter(col("i") =!= col("j"))
            .select(col("i"), col("j"))
          val prior =
            if (exists(assignPath))
              graft.functions.StoreLog.readLive(spark, assignPath, Seq("id"))
            else
              spark.range(0).select(col("id"), col("id").as("cluster_id"))
          // Persisted per the retract's caller contract (3 consumers of an
          // expensive fold); unpersisted before the batch closure exits —
          // the appends below are actions, so the cache never outlives the
          // micro-batch.
          val folded = Dedup.duplicateClustersIncremental(prior, newPairs)
            .persist()
          try {
            val next = Dedup.duplicateClustersRetractFromIndex(
              folded, live, doomed, threshold)
            val changed = next.join(prior, Seq("id", "cluster_id"), "left_anti")
            val departed = prior.select(col("id"))
              .join(next.select(col("id")), Seq("id"), "left_anti")
            if (!changed.isEmpty)
              graft.functions.StoreLog.appendInserts(changed, assignPath, gen)
            if (exists(assignPath) && !departed.isEmpty)
              graft.functions.StoreLog.appendTombstones(departed, assignPath, gen)
          } finally folded.unpersist(blocking = false)
        }
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
