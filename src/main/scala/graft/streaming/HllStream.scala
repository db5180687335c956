package graft.streaming

import graft.functions.Sketches
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/**
 * Streaming face of the HyperLogLog register store
 * ([[graft.functions.Sketches]]): each micro-batch sketches its rows and
 * APPENDS the (group, bucket, reg) slice to the log-structured store;
 * readers estimate on demand via [[Sketches.readHllEstimate]] (slices
 * max-merge on read). The live distinct-counter shape — "users seen so
 * far, per day" — without any state-store state (the MinhashIndex /
 * TrainPrep / LmStream storage convention).
 *
 * Replay safety comes from the store's ALGEBRA, not the sink: registers
 * merge by MAX, which is idempotent, so a replayed or overlapping
 * micro-batch re-appends rows the merge-on-read collapses — an
 * at-least-once sink suffices where the additive LM/BM25 stores would
 * need exactly-once slice discipline (StreamingSpec pins batch parity and
 * replay invariance). The caller contract is the store's: m and salt
 * never change for one path.
 */
object HllStream {

  /** Append one register slice per non-empty micro-batch. */
  def registerStream(
      stream: DataFrame,
      keyCol: Column,
      groupCols: Seq[String],
      path: String,
      m: Int = 64,
      salt: String = "hll"): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty)
        Sketches.appendHllRegisters(batch, keyCol, groupCols, path, m, salt)
    }
}
