package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Generic last-writer-wins log for SET stores — the retraction face
 * (document takedowns, entity deletes) generalized from the graph edge
 * log ([[Graph.appendGraphEdgeOps]]) to any (key, payload) row store:
 * pHash signatures keyed by media id, gram inventories keyed by
 * (src, hash), basket memberships keyed by (basket, item).
 *
 * Algebra (identical to the edge log's): each slice carries a
 * caller-supplied GENERATION — monotone per logical slice, replay-stable
 * (the batch-id-ledger discipline: a redelivered slice re-tags the same
 * gen, so at-least-once delivery is idempotent) — and an op bit
 * (0 = insert, 1 = tombstone). The winner per key is
 * `max(struct(gen, op, payload…))`: the newest generation decides, a
 * same-gen insert+tombstone tie resolves to TOMBSTONE, and payload
 * columns ride the struct only as a deterministic tie-break within one
 * (gen, op). A later re-insert resurrects the key. Compaction keeps one
 * winner row per key INCLUDING tombstones — dropping a tombstone would
 * let a replayed pre-delete insert slice silently resurrect the row;
 * tombstone GC is only safe once no pre-delete slice can be redelivered.
 *
 * Read cost: one key-grouped aggregation — the same shuffle shape as the
 * plain set store's distinct-on-read, so retraction support costs
 * nothing extra at scale.
 */
object StoreLog {

  private val GenCol = "__gen"
  private val OpCol = "__op"

  /** Append an insert slice: every column of `df` is part of the logical
    * row; the columns a tombstone later addresses are the `keyCols`
    * passed at read time. */
  def appendInserts(df: DataFrame, path: String, gen: Long): Unit =
    df.select(df.columns.map(col).toIndexedSeq :+
        lit(gen).as(GenCol) :+ lit(0).as(OpCol): _*)
      .write.mode("append").parquet(path)

  /** Append a tombstone slice addressed by KEY COLUMNS ONLY (a takedown
    * knows the id, not the payload): the log's payload columns are
    * nulled from the existing log schema, so the slice is
    * schema-compatible with every insert slice. The log must already
    * hold at least one slice (there is nothing to retract otherwise). */
  def appendTombstones(keys: DataFrame, path: String, gen: Long): Unit = {
    val spark = keys.sparkSession
    val logSchema = spark.read.parquet(path).schema
    val keyNames = keys.columns.toSet
    val cols = logSchema.fields.toIndexedSeq
      .filterNot(f => f.name == GenCol || f.name == OpCol)
      .map { f =>
        if (keyNames.contains(f.name)) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }
    keys.select(cols :+ lit(gen).as(GenCol) :+ lit(1).as(OpCol): _*)
      .write.mode("append").parquet(path)
  }

  /** The live rows under the log's algebra: one key-grouped aggregation,
    * keep = the newest op is an insert; output columns are the logical
    * row (keys + the winning insert's payload), ledger columns dropped. */
  def readLive(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      keyCols: Seq[String]): DataFrame = {
    val log = spark.read.parquet(path)
    val payload = log.columns.toIndexedSeq
      .filterNot(c => c == GenCol || c == OpCol || keyCols.contains(c))
    val w = struct((col(GenCol) +: col(OpCol) +: payload.map(col)): _*)
    log.groupBy(keyCols.map(col): _*)
      .agg(max(w).as("__w"))
      .filter(col("__w").getField(OpCol) === 0)
      .select(keyCols.map(col) ++
        payload.map(c => col("__w").getField(c).as(c)): _*)
  }

  /** Rewrite the log as one winner row per key — tombstones RETAINED
    * (see the class-level resurrection argument); read-side results are
    * invariant across the rewrite. */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      src: String,
      dest: String,
      keyCols: Seq[String]): Unit = {
    val log = spark.read.parquet(src)
    val payload = log.columns.toIndexedSeq
      .filterNot(c => c == GenCol || c == OpCol || keyCols.contains(c))
    val w = struct((col(GenCol) +: col(OpCol) +: payload.map(col)): _*)
    log.groupBy(keyCols.map(col): _*)
      .agg(max(w).as("__w"))
      .select(keyCols.map(col) ++
        payload.map(c => col("__w").getField(c).as(c)) :+
        col("__w").getField(GenCol).as(GenCol) :+
        col("__w").getField(OpCol).as(OpCol): _*)
      .write.mode("overwrite").parquet(dest)
  }
}
