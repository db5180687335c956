package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge into Spark's `private[sql]` classic Column <-> Catalyst Expression
 * converters. Needed because graft builds some Catalyst expressions directly
 * (e.g. `JsonToStructs` with a metadata-bearing schema, which the public
 * `functions.from_json` would strip via its DDL round-trip).
 */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge into the `private[sql]` function registry of a live session, for
  * registering graft's Catalyst expressions as SQL functions after session
  * construction (the `spark.sql.extensions` path needs no bridge). */
object GraftFunctionRegistryBridge {
  def register(
      spark: SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
