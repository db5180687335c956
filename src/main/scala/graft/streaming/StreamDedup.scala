package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming deduplication wrappers. State size is the scale concern:
 *  - `exactForever` keeps every key seen — only for bounded key domains.
 *  - `exactWithinWatermark` bounds state by event time — the 100 TB-safe
 *    default: state holds only keys younger than the watermark.
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
