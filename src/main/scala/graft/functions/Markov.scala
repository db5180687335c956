package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/**
 * First-order Markov transition estimation over per-key event sequences —
 * the clickstream "what happens after X" model (next-event prediction
 * features, anomalous-flow detection, session simulation).
 *
 * Scale shape: consecutive pairs come from ONE `lag` window on the
 * per-key exchange (per-key row counts bound the window task, never the
 * corpus); the (prev, next) count aggregation map-side combines down to
 * the state-space size; and the row-normalizing sum is a window over the
 * METADATA-scale count matrix (|states|² rows), partitioned by `prev` —
 * the corpus never moves again after the first exchange.
 *
 * Determinism: probabilities are one IEEE division of two exact 64-bit
 * counts — bitwise-identical across engines and partition orders (the
 * count matrix is exact, and the division is correctly rounded).
 */
object Markov {

  /** Transition counts + row-normalized probabilities. `orderCols` must
    * totally order events within a key (include a unique tiebreaker).
    * Output: `(prev_type, next_type, n, p)` with Σ p = 1 per prev_type. */
  def transitionMatrix(
      df: DataFrame,
      keyCol: String,
      typeCol: String,
      orderCols: Seq[String]): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    df
      .withColumn("prev_type", lag(col(typeCol), 1).over(byKey))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        col("n").cast(DoubleType) /
          sum(col("n")).over(Window.partitionBy(col("prev_type"))))
  }
}
