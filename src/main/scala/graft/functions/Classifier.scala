package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Distributed linear-classifier training in the single-step, restartable
 * rounds posture of [[Similarity.kmeansStep]] / `pcaPowerStep` /
 * `Graph.pushRoundFrom`: each call is ONE pass over the corpus computing
 * one exact update; N training rounds are N chained jobs, the driver
 * holding only the (tiny) weight vector between them.
 *
 * The update rule is the classical perceptron — `w += y·x` over the rows
 * the current weights misclassify (`y·⟨w,x⟩ <= 0`) — chosen over logistic
 * gradients deliberately: with INTEGER features and integer weights every
 * margin, comparison, and delta is exact 64-bit arithmetic, so the
 * trained weights are bit-identical across engines, partitionings, and
 * summation orders (a sigmoid's `exp` drifts in the last ulp per engine —
 * unverifiable). This is the trainable face of the quality/language
 * gating family: cheap count features (stopword hits, char classes) are
 * exactly the integer features the rule wants.
 *
 * Scale shape: the margin and per-feature deltas fold in ONE partial
 * aggregation (map-side combine; the shuffle carries |features|+1 longs
 * per partition); only the weight vector reaches the driver.
 */
object Classifier {

  /** One perceptron round. `features` must be integer-valued columns
    * (cast to long), `label` must evaluate to +1 / -1. Returns the
    * updated weights and the round's mistake count. */
  def perceptronStep(
      df: DataFrame,
      features: Seq[Column],
      label: Column,
      weights: Seq[Long]): (Seq[Long], Long) = {
    require(features.nonEmpty && weights.length == features.length,
      s"got ${weights.length} weights for ${features.length} features")
    val xs = features.map(_.cast(LongType))
    val y = label.cast(LongType)
    val margin = xs.zip(weights).map { case (x, w) => x * lit(w) }.reduce(_ + _)
    val mis = y * margin <= 0 // a zero margin counts as a mistake (w0 = 0 learns)
    val aggs = xs.zipWithIndex.map { case (x, i) =>
      coalesce(sum(when(mis, y * x)), lit(0L)).as(s"d$i")
    } :+ coalesce(sum(when(mis, 1L)), lit(0L)).as("n_mis")
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val next = weights.zipWithIndex.map { case (w, i) => w + row.getLong(i) }
    (next, row.getLong(features.length))
  }

  /** `rounds` chained perceptron rounds from zero weights. Returns the
    * weight vector AFTER each round (rounds+0 history, index 0 = after
    * round 1) and the per-round mistake counts. */
  def perceptronTrain(
      df: DataFrame,
      features: Seq[Column],
      label: Column,
      rounds: Int): (Seq[Seq[Long]], Seq[Long]) = {
    require(rounds >= 1, "at least one round")
    var w: Seq[Long] = Seq.fill(features.length)(0L)
    val hist = Seq.newBuilder[Seq[Long]]
    val mistakes = Seq.newBuilder[Long]
    for (_ <- 1 to rounds) {
      val (next, nMis) = perceptronStep(df, features, label, w)
      w = next
      hist += next
      mistakes += nMis
    }
    (hist.result(), mistakes.result())
  }

  /** Apply trained weights as a gate and tally the confusion counts:
    * (actual, pred, n) with pred = ⟨w,x⟩ > 0 (a zero margin predicts
    * negative — the decision rule's strict side). One aggregation pass;
    * the weights ride as literals. */
  def confusionMatrix(
      df: DataFrame,
      features: Seq[Column],
      label: Column,
      weights: Seq[Long]): DataFrame = {
    require(weights.length == features.length,
      s"got ${weights.length} weights for ${features.length} features")
    val margin = features.zip(weights)
      .map { case (f, w) => f.cast(LongType) * lit(w) }.reduce(_ + _)
    df.select(
        when(label.cast(LongType) === 1L, 1).otherwise(0).as("actual"),
        when(margin > 0, 1).otherwise(0).as("pred"))
      .groupBy(col("actual"), col("pred"))
      .agg(count(lit(1)).as("n"))
  }

  /** The integer count features the language/quality perceptron trains
    * on: bias + one stopword-hit count per [[TextFunctions.Stopwords]]
    * language (the same split-lower tokenization as `lang_id`). */
  def stopwordFeatures(text: Column): Seq[Column] = {
    val toks = split(lower(text), " ")
    lit(1L) +: TextFunctions.Stopwords.map { case (_, words) =>
      size(filter(toks, t => t.isin(words: _*))).cast(LongType)
    }
  }
  /** Per-class embedding centroids in exact fixed-point — the training
    * stage of a nearest-class-mean classifier (and the labeled sibling of
    * [[Similarity.kmeansStep]]'s centroid update): every (label, dim)
    * cell averages that class's component values. Components are floored
    * to 2^-20 fixed-point BEFORE aggregation (a float times a power of
    * two is an exact exponent shift), so the sums are order-independent
    * 64-bit integer arithmetic and the final mean is one IEEE division of
    * exact integers — bit-identical across engines and partitionings.
    *
    * Scale shape: posexplode fans each vector into dim rows, but the
    * groupBy partial-aggregates map-side, so the exchange carries at most
    * |classes| x dim cells per task (the kmeans_step combine posture) —
    * corpus rows never shuffle. Output: (label, dim_idx, n, centroid).
    */
  def classCentroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    df
      .filter(col(vecCol).isNotNull && col(labelCol).isNotNull)
      .select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("dim_idx", "comp")))
      .select(col("label"), col("dim_idx"),
        floor(col("comp").cast(org.apache.spark.sql.types.DoubleType) * lit(1048576.0))
          .cast(LongType).as("fp"))
      .groupBy(col("label"), col("dim_idx"))
      .agg(count(lit(1)).as("n"), sum(col("fp")).as("sum_fp"))
      .select(col("label"), col("dim_idx"), col("n"),
        (col("sum_fp").cast(org.apache.spark.sql.types.DoubleType) /
          (col("n") * lit(1048576L)).cast(org.apache.spark.sql.types.DoubleType))
          .as("centroid"))
  }

}
