package graft.streaming

import graft.functions.NaiveBayes
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/**
 * Streaming face of the naive-Bayes classifier
 * ([[graft.functions.NaiveBayes]]): label an unbounded document stream
 * against a TRAINED, PERSISTED model — train once on the historical
 * corpus ([[NaiveBayes.train]] / [[NaiveBayes.writeNbCounts]] +
 * [[NaiveBayes.readNb]]), classify forever; the routing/tagging stage of
 * a streaming ingestion pipeline (language routing, domain tagging).
 *
 * All reference state lives in storage (the LmStream / MinhashIndex
 * convention), none in the state store: the model tables load once per
 * query and each micro-batch runs the SAME scoring plan as the batch
 * operator. A document's eighth-bit score depends only on its own tokens
 * and the fixed model, so a verdict never depends on batch boundaries and
 * the stream's output equals the batch classifier on the same rows
 * (StreamingSpec asserts parity); replaying a batch reproduces identical
 * labels. The model refreshes by appending counts and re-reading — no
 * query restart, no state migration.
 */
object NbStream {

  /** Per-micro-batch classification: every non-null-text document reaches
    * `sink` with `(pred, bits8)` appended. */
  def classifyStream(
      stream: DataFrame,
      model: NaiveBayes.NbModel,
      idCol: String,
      textCol: String)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        val scored = NaiveBayes.classify(batch, model, idCol, textCol)
          .withColumnRenamed("doc_id", idCol)
        sink(batch.join(scored, Seq(idCol)), id)
      }
    }
}
