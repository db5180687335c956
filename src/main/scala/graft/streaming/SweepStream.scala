package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.functions.{Dedup, Similarity}

/**
 * Per-micro-batch SWEEP READINGS over the persisted stores — the
 * observability counters a live ingest pipeline actually watches
 * ("which dedup threshold / which probe setting is the growing corpus
 * asking for"), streaming faces of the `dedup_sweep` / `ann_sweep` gate
 * entries. Each micro-batch (a) appends its slice to the store and (b)
 * appends the CUMULATIVE reading, tagged with the replay-stable batch
 * id, to `<readings>` — all state in storage, none in the state store
 * (the StoreIngest convention).
 *
 * Replay posture: both store slices are pure functions of the batch's
 * rows (shingle/band rows; bucketed vectors), so a redelivered batch
 * rewrites byte-identical rows the dedup-on-read collapses; the reading
 * it re-appends carries the SAME batch id and identical values, so the
 * reading log's distinct collapses it too. [[latestReading]] is the
 * consumer: the newest batch's rows, replay-deduped.
 */
object SweepStream {

  private def readingFiles(readings: String): String = s"$readings/rows"

  /** The newest reading in the log, replay-collapsed — what a dashboard
    * polls. */
  def latestReading(
      spark: org.apache.spark.sql.SparkSession, readings: String): DataFrame = {
    val all = spark.read.parquet(readingFiles(readings)).distinct()
    all.join(broadcast(all.agg(max(col("batch_id")).as("batch_id"))), "batch_id")
  }

  /** Dedup threshold-sweep ingestion + readings: each micro-batch of
    * `(idCol, textCol)` documents appends its MinHash index slice (the
    * batch is shingled and signed ONCE, here — never again), then emits
    * [[Dedup.sweepReport]] over the exact PPJoin pair list of the
    * cumulative replay-deduped store. Batch-parity: after any prefix of
    * batches, the latest reading equals the batch `dedup_sweep`
    * computation over the union of those batches (StreamingSpec). */
  def dedupSweep(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String,
      readings: String,
      thresholds: Seq[Double] = Seq(0.7, 0.95, 0.98),
      shingleK: Int = 4,
      numHashes: Int = 128,
      bands: Int = 32): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        Dedup.appendMinhashIndex(
          Dedup.buildMinhashIndex(batch, idCol, textCol, shingleK, numHashes, bands),
          indexPath)
        val idx = Dedup.readMinhashIndexDedup(batch.sparkSession, indexPath)
        Dedup.sweepReport(
            Dedup.ngramJaccardPairsFromShingled(idx.shingled, thresholds.min),
            thresholds)
          .withColumn("batch_id", lit(id))
          .write.mode("append").parquet(readingFiles(readings))
      }
    }

  /** ANN operating-point ingestion + readings: each micro-batch of
    * `(idCol, vecCol)` vectors appends to the cell-bucketed IVF store
    * (centroids fixed up front — the index definition, the AnnStream
    * contract), then emits [[Similarity.ivfSweepReading]] over the
    * cumulative replay-deduped store: recall@k vs a brute-force pass on
    * the SAME cumulative corpus (ground truth must track the growing
    * corpus — a frozen list would report recall against vectors that
    * don't exist yet) plus measured candidate volume per nProbe. */
  def annSweep(
      stream: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Array[(Long, Vector[Double])],
      indexPath: String,
      readings: String,
      k: Int = 5,
      nProbes: Seq[Int] = Seq(1, 2, 4, 8),
      queryPred: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        _ % 50 === 0): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        Similarity.appendIvfBucketed(batch, idCol, vecCol, cents, indexPath)
        val s = batch.sparkSession
        // Replay-collapse per vec_id rows (slices are pure functions of
        // the vectors, so duplicates are byte-identical).
        val corpus = s.read.parquet(indexPath)
          .select(col("vec_id"), col("v").as("embedding")).distinct()
        val queries = corpus.filter(queryPred(col("vec_id")))
        val gt = Similarity.bruteForceTopK(
            corpus, queries, "vec_id", "embedding", k)
          .select(col("query_id"), col("vec_id"))
        Similarity.ivfSweepReading(
            corpus, queries, gt, "vec_id", "embedding", k, cents, nProbes)
          .withColumn("batch_id", lit(id))
          .write.mode("append").parquet(readingFiles(readings))
      }
    }
}
