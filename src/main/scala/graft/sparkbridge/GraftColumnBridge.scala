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
