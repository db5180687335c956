package graft.streaming

import graft.functions.LangModel
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/**
 * Streaming face of the bigram-LM perplexity filter
 * ([[graft.functions.LangModel]]): score an unbounded document stream
 * against a TRAINED, PERSISTED model — train once on the historical
 * corpus ([[LangModel.trainLm]] + [[LangModel.writeLm]]), score forever.
 *
 * All reference state lives in storage (the MinhashIndex / TrainPrep
 * convention), none in the state store: the LM tables are loaded once per
 * query and each micro-batch runs the SAME scoring plan as the batch
 * operator — per-document transitions live entirely within the document's
 * own row, so a verdict never depends on batch boundaries and the stream's
 * output equals the batch gate on the same rows (StreamingSpec asserts set
 * parity). Replay-idempotent for the same reason: re-scoring a replayed
 * batch against the fixed model reproduces identical verdicts. The model
 * refreshes by re-running the batch trainer — no query restart, no state
 * migration.
 */
object LmStream {

  /** Per-micro-batch perplexity gate: documents whose per-token surprisal
    * under `lm` is at most `maxBitsPerToken` (plus unscorable < 2-token
    * docs — length gates own those) reach `sink`, with the
    * `(n_trans, bits, bits_per_token)` scores appended. */
  def perplexityGateStream(
      stream: DataFrame,
      lm: LangModel.Lm,
      idCol: String,
      textCol: String,
      maxBitsPerToken: Double)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        val keep = LangModel.surprisalWith(batch, lm, idCol, textCol)
          .filter(col("n_trans") === 0 || col("bits_per_token") <= maxBitsPerToken)
        sink(batch.join(keep, Seq(idCol)), id)
      }
    }
}
