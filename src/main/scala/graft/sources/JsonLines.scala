package graft.sources

import graft.schema.JsonSchemaInference
import graft.schema.JsonSchemaInference.{Merge, Mode}
import graft.transform.ExpandJson
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/**
 * JSON-lines file source with the engine's KIP-301-faithful inference
 * instead of Spark's own (`spark.read.json` infers bigint for every
 * integer, decimal for big numbers, and unifies array element types — all
 * deliberate divergences from the reference semantics, SURVEY.md §1.2).
 *
 * Two-pass, scale-shaped like ExpandJson's batch mode: pass 1 samples
 * `sampleSize` lines (a limit-collect — touches only the first file
 * splits), pass 2 is a full scan with one codegen'd `from_json`
 * projection against the inferred schema.
 */
object JsonLines {

  def read(
      spark: SparkSession,
      path: String,
      mode: Mode = Merge,
      sampleSize: Int = 1024,
      permissive: Boolean = false): DataFrame = {
    val lines = spark.read.text(path).select(col("value"))
    lines
      .transform(ExpandJson.whole("value", inferenceMode = mode,
        sampleSize = sampleSize, permissive = permissive))
      .select(col("value.*"))
  }

  /** The inferred schema alone (driver-side; for schema-registry style
    * workflows that need the schema before reading). */
  def inferSchema(spark: SparkSession, path: String, mode: Mode = Merge,
      sampleSize: Int = 1024): Option[org.apache.spark.sql.types.DataType] = {
    val sample = spark.read.text(path).limit(sampleSize)
      .collect().map(_.getString(0)).toSeq
    JsonSchemaInference.inferFromSample(sample, mode)
  }
}
