package graft.streaming

import graft.schema.JsonSchemaInference
import graft.transform.ExpandJson
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.DataType
import org.apache.spark.sql.Row

/**
 * Streaming forms of the ExpandJson operator.
 *
 * The reference is itself a stream transform (a Kafka Connect SMT,
 * record-at-a-time); its 16-entry schema cache makes "first record's schema
 * sticks" the de-facto semantics (reference: ExpandJson.java:73, 132-134).
 * Structured Streaming's analogues:
 *
 *  - '''fixed schema''' (production path): schema known up front — a pure
 *    narrow `from_json` projection, stateless, watermark-transparent;
 *    works with any trigger including continuous processing.
 *  - '''per-microbatch inference''' (`foreachBatchExpand`): re-infers from
 *    each micro-batch — the reference's cache semantics at micro-batch
 *    granularity (SURVEY.md §1.4); schema drift between batches is allowed,
 *    within a batch the merged sample schema wins.
 */
object ExpandJsonStreaming {

  /** Fixed-schema streaming expand of one whole column (schemaless path). */
  def expandWhole(stream: DataFrame, column: String, schema: DataType): DataFrame =
    ExpandJson.whole(column, schemaOverride = Some(schema))(stream)

  /** Fixed-schema streaming per-field expand (with-schema path). */
  def expandFields(stream: DataFrame, schemas: Map[String, DataType]): DataFrame =
    ExpandJson.onFields(schemas.keys.toSeq, schemaOverrides = schemas)(stream)

  /** Per-record dynamic schema on a stream: variant mode needs no
    * plan-time schema at all, so it is watermark-transparent and drift-proof
    * — the closest streaming analogue of the reference's cache-free
    * schemaless path. */
  def expandVariant(stream: DataFrame, column: String, permissive: Boolean = false): DataFrame =
    ExpandJson.wholeVariant(column, permissive)(stream)

  /** Per-microbatch inference: each batch is sampled, inferred with the
    * KIP-301-faithful rules, expanded, and handed to `sink`. */
  def foreachBatchExpand(
      stream: DataFrame,
      transform: ExpandJson,
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) sink(transform(batch), id)
    }

  /** Convenience: infer once from a static sample frame (e.g. a parquet
    * replay of the topic), then run the stream with that fixed schema —
    * the recommended production recipe at scale (zero per-batch cost). */
  def inferThenExpand(staticSample: DataFrame, stream: DataFrame, column: String): DataFrame = {
    val sample = staticSample
      .select(org.apache.spark.sql.functions.col(column).cast("string"))
      .na.drop().limit(1024)
      .collect().map(_.getString(0)).toSeq
    val dt = JsonSchemaInference.inferFromSample(sample).getOrElse(
      throw new IllegalArgumentException(s"No non-null sample rows for '$column'"))
    expandWhole(stream, column, dt)
  }
}
