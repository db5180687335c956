package graft.streaming

import graft.functions.Affinity
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/**
 * Streaming ingestion face of the copresence-graph pipeline
 * ([[graft.functions.Affinity]]): an unbounded (basket, item) event
 * stream — order lines, session page-views, playlist adds — lands in the
 * persisted basket-items store micro-batch by micro-batch; the graph
 * family (triangles, CC, LPA, k-core, link prediction) reads the
 * accumulated store through `Affinity.copresenceGraphFromStore` (or a
 * `Graph.writeGraphEdges` materialization of it) on its own cadence.
 *
 * All state lives in storage (the LmStream / TrainPrep convention),
 * none in the state store: each micro-batch runs the SAME distinct
 * (basket, item) projection as the batch operator and appends set rows.
 * Storing basket MEMBERSHIP (not derived edges) is what makes micro-batch
 * boundaries invisible — a basket split across batches contributes its
 * full item set to the read-side union, so cross-batch pairs are found;
 * and a replayed batch (at-least-once delivery, checkpoint recovery)
 * re-appends rows the distinct-on-read union already absorbs — the
 * stream's accumulated graph equals the batch operator over the union of
 * everything delivered (StreamingSpec asserts exactly this, split baskets
 * and replays included).
 */
object GraphStream {

  /** Per-micro-batch basket-items ingestion into the store at `path`.
    * Start with `.queryName(...).start()`; graph queries read the store
    * independently. Empty batches append nothing (no zero-row parquet
    * files accumulate under checkpoint-recovery restarts). */
  def ingestBasketsStream(
      stream: DataFrame,
      basketCol: String,
      itemCol: String,
      path: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty)
        Affinity.appendBasketItems(batch, basketCol, itemCol, path)
    }
}
