package graft.streaming

import graft.functions.{Contamination, Dedup, Median, TextFunctions}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/**
 * Streaming face of the batch `pipeline_train_prep` capstone: quality gate
 * → benchmark decontamination → near-dup filter, on one unbounded stream.
 *
 * Every piece of reference state lives in STORAGE, none in the state
 * store — the design rule shared by [[StreamDedup.nearDupFilterAgainstIndex]]
 * and [[graft.functions.Contamination.cleanStream]], which this operator
 * composes:
 *
 *  - per-group quality thresholds: one row per group from
 *    [[graft.functions.Median.binnedMedianPerGroup]], computed by a batch
 *    job over the historical corpus (a median is not meaningfully
 *    streamable per micro-batch — a batch's median is not the corpus's);
 *  - the eval-set shingle table ([[Contamination.evalShingles]]);
 *  - the corpus MinHash index ([[Dedup.writeMinhashIndex]]).
 *
 * So the stream is unbounded-corpus-safe and each reference refreshes by
 * re-running its batch job — no query restart, no state migration.
 *
 * Per micro-batch: the gate is a stateless broadcast stream-static join
 * (binned score >= the group's median bin — identical semantics to the
 * batch `quality_gate`); decontamination and near-dup are per-batch
 * anti-joins whose per-document verdicts don't depend on batch boundaries,
 * so the composition's output equals the batch pipeline's on the same
 * rows (StreamingSpec asserts set parity against the batch operators).
 */
object TrainPrep {

  def prepStream(
      stream: DataFrame,
      thresholds: DataFrame, // (groupCol, med_bin) — Median.binnedMedianPerGroup
      groupCol: String,
      evShingles: DataFrame,
      index: Dedup.MinhashIndex,
      idCol: String,
      textCol: String,
      k: Int = 16,
      minOverlap: Int = 10,
      threshold: Double = 0.8)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val gated = stream
      .filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .withColumn("__qb",
        Median.bin(coalesce(TextFunctions.qualityScore(col(textCol)), lit(0.0))))
      .join(broadcast(thresholds), groupCol)
      .filter(col("__qb") >= col("med_bin"))
      .drop("__qb", "med_bin")
    gated.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        val dirty = Contamination
          .contaminatedAgainst(batch, evShingles, idCol, textCol, k, minOverlap)
          .select(col("doc_id").as("__drop_id"))
        val cleaned =
          batch.join(broadcast(dirty), batch(idCol) === col("__drop_id"), "left_anti")
        val dupIds = Dedup.minhashPairsAcross(
            Dedup.buildMinhashIndex(cleaned, idCol, textCol), index, threshold)
          .select(col("i").as("__dup_id")).distinct()
        sink(
          cleaned.join(broadcast(dupIds), cleaned(idCol) === col("__dup_id"), "left_anti"),
          id)
      }
    }
  }
}
