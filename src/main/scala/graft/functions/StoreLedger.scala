package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit

/**
 * The batch-id replay ledger shared by the ADDITIVE log-structured
 * stores (LM pair/triple counts, Naive-Bayes counts, BM25 postings,
 * embedding-drift stats). Set-algebra stores are replay-idempotent for
 * free (distinct-on-read); additive stores sum on read, so a replayed
 * slice — at-least-once delivery, foreachBatch checkpoint recovery
 * re-running the last uncommitted batch with the SAME id — would
 * double-count. The ledger closes that: each appended slice is tagged
 * with a replay-stable batch id, and because a slice's aggregated rows
 * are a pure function of the slice's content, a re-delivered batch
 * rewrites byte-identical `(batch_id, key…, count…)` rows that the read
 * side's distinct collapses, while two genuinely different batches
 * always differ in `batch_id` and both survive the distinct.
 *
 * Caller contract (the [[Drift.appendEmbStats]] prototype's, now
 * shared): ids are unique per logical batch and replay-stable (a
 * Structured Streaming foreachBatch id, a pipeline run id), and a store
 * mixes tagged OR untagged appends, never both — an untagged store
 * cannot tell a replay from a coincidence, and parquet schema
 * resolution across mixed slices is undefined.
 *
 * Scale shape: the distinct runs on ledger rows (≤ batches × keys of
 * the READ subset — for BM25 the already-pruned query-term postings),
 * never on corpus data, and collapses map-side first like any
 * hash-aggregate.
 */
object StoreLedger {

  /** The ledger column name; its presence in a stored slice marks the
    * store as tagged. */
  val BatchCol = "batch_id"

  /** Tag one slice's aggregated rows with its replay-stable batch id
    * (append this frame, not the untagged one). */
  def tag(df: DataFrame, batchId: Long): DataFrame =
    df.withColumn(BatchCol, lit(batchId))

  /** Collapse re-delivered slices on read: tagged stores distinct away
    * byte-identical replay rows then drop the ledger column; untagged
    * stores pass through unchanged (their documented caveat stands). */
  def collapse(df: DataFrame): DataFrame =
    if (df.columns.contains(BatchCol)) df.distinct().drop(BatchCol) else df
}
