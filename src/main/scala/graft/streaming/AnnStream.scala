package graft.streaming

import graft.functions.Similarity
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/**
 * Streaming ingestion face of the cell-partitioned ANN index
 * ([[graft.functions.Similarity.writeIvfBucketed]]): an unbounded
 * embedding stream lands in the bucketed layout micro-batch by
 * micro-batch; queries probe the accumulated store on their own cadence
 * through `ivfTopKFromBucketed` (partition-pruned, so reads touch only
 * probed cells no matter how many batches have landed).
 *
 * All state lives in storage (the GraphStream / LmStream convention).
 * The centroid set is the INDEX DEFINITION, trained once before the
 * stream starts and passed as a literal — every micro-batch assigns to
 * the SAME cells, so probe semantics never shift mid-stream; re-training
 * is a rebuild, not a state migration. Replayed batches (at-least-once
 * delivery, checkpoint recovery) append duplicate (vec_id, …) rows that
 * the read side's per-id dedup collapses — stable-payload contract, as
 * with the pHash signature store.
 */
object AnnStream {

  /** Per-micro-batch vector ingestion into the bucketed layout at `path`.
    * Start with `.queryName(...).start()`. Empty batches append nothing.
    * `metaCols` carries filterable metadata into the layout (the
    * filtered-search design point, streaming face) — each append also
    * extends the write-time stats ledger, so the serving planner's arm
    * decision ([[graft.functions.Similarity.filteredTopKAutoFromBucketed]])
    * re-derives from CURRENT stats at every evaluation: ingestion growth
    * that crosses the brute/probe thresholds flips the arm on the next
    * query with no cache to go stale (StreamingSpec pins the flip). */
  def ingestVectorsStream(
      stream: DataFrame,
      idCol: String,
      vecCol: String,
      centRows: Array[(Long, Vector[Double])],
      path: String,
      metaCols: Seq[String] = Nil): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty)
        Similarity.appendIvfBucketed(batch, idCol, vecCol, centRows, path,
          metaCols = metaCols)
    }
}
