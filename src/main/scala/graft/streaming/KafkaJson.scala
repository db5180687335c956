package graft.streaming

import graft.transform.ExpandJson
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.DataType
import org.apache.spark.sql.Row

/**
 * Kafka wiring for the ExpandJson pipeline — the Spark-native analogue of
 * deploying the reference SMT on a connector (reference: ExpandJson.java
 * Key/Value variants at :277-319 map to the Kafka source's key/value
 * columns).
 *
 * Uses the string-addressed `format("kafka")` DataSource so there is no
 * compile-time dependency; at runtime it needs the spark-sql-kafka
 * connector on the classpath (not present in this container — covered by
 * unit tests through MemoryStream instead, which exercises the identical
 * DataFrame surface).
 */
object KafkaJson {

  /** Subscribe to topics; key/value arrive as binary per the Kafka source
    * contract. */
  def readStream(spark: SparkSession, bootstrap: String, topics: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topics)
      .load()

  /** Expand the JSON in `value` (and optionally `key`) against fixed
    * schemas — the production streaming path. */
  def expand(
      kafka: DataFrame,
      valueSchema: DataType,
      keySchema: Option[DataType] = None): DataFrame = {
    val withValue = ExpandJson.value(Some(valueSchema))(kafka)
    keySchema.fold(withValue)(ks => ExpandJson.key(Some(ks))(withValue))
  }

  /** Write back to Kafka as JSON (value re-serialized with `to_json`). */
  def writeStream(
      df: DataFrame,
      bootstrap: String,
      topic: String,
      checkpoint: String): DataStreamWriter[Row] =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
}
