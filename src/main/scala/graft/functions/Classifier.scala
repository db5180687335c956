package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

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

  /** Best single-feature threshold split by weighted Gini impurity — the
    * CART decision-stump trainer, in exact integer arithmetic. The
    * feature is quantile-free binned with `floor(feature · binScale)`
    * (keep `binScale` a power of two: a float times 2^k is an exact
    * exponent shift, so the binning is bit-identical across engines);
    * candidate thresholds are the bin edges. For a split putting bins
    * ≤ s left: minimizing weighted Gini
    * `(nL·(1 − Σ cL²/nL²) + nR·(1 − Σ cR²/nR²)) / N` is, after clearing
    * the N·nL·nR denominator, minimizing the INTEGER
    * `score = nR·(nL² − Σ cL²) + nL·(nR² − Σ cR²)` — computed in
    * Decimal(38,0) so it stays exact to ~10^12 rows, with ties broken on
    * the lower bin. Gini's rationality is why it is the impurity here and
    * entropy/log-loss is not (the whole-bit-exactness contract; see
    * LangModel for the flog2 alternative).
    *
    * Scale shape: ONE corpus aggregation (map-side combining groupBy on
    * (bin, label) — the exchange carries one row per occupied cell,
    * ≤ bins × classes); everything after runs on that metadata-scale
    * frame (zero-filled grid, per-label cumulative windows PARTITIONED by
    * label, one more metadata-scale aggregation, a 1-row argmin via min
    * over a (score, bin)-first struct — the type-generic tie-break
    * posture). Output (one row): split_bin, threshold (left = feature <
    * threshold), n_left, n_right, gini (the one double division). */
  def stumpSplit(
      df: DataFrame, feature: Column, labelCol: String,
      binScale: Long = 16L): DataFrame =
    stumpScored(df, feature, labelCol, binScale)
      .agg(min(struct(col("score"), col("bin"), col("nl"), col("nr"),
        col("n"))).as("w"))
      .select(
        col("w.bin").as("split_bin"),
        ((col("w.bin") + lit(1L)).cast(DoubleType) / lit(binScale.toDouble))
          .as("threshold"),
        col("w.nl").as("n_left"),
        col("w.nr").as("n_right"),
        (col("w.score").cast(DoubleType) /
          (col("w.n").cast(DoubleType) * col("w.nl").cast(DoubleType) *
            col("w.nr").cast(DoubleType))).as("gini"))
      .filter(col("split_bin").isNotNull)

  /** [[stumpSplit]] plus the per-side MAJORITY labels — the applicable
    * form of the stump (predict left_label below the threshold,
    * right_label at/above it). Majorities come from the same cumulative
    * frame (min over the (−count, label) struct per side — the
    * type-generic tie-break posture), so the corpus is still scanned by
    * exactly one (bin, label) aggregation. Output is EMPTY (not a null
    * row) when no valid split exists (empty input, or a single bin). */
  def stumpModel(
      df: DataFrame, feature: Column, labelCol: String,
      binScale: Long = 16L): DataFrame =
    stumpModelFrom(stumpScored(df, feature, labelCol, binScale), binScale)

  /** [[stumpModel]] over WEIGHTED rows — the boosting face: every count
    * in the trainer becomes a weight sum, so the same exact-integer
    * Gini machinery trains against a reweighted distribution without
    * materializing duplicated rows. Keep weights INTEGER (the boosted
    * chain multiplies misclassified rows by 2) and the whole pipeline
    * stays bit-exact across engines — the perceptron discipline applied
    * to boosting (an exp(alpha) real-weight scheme would drift in the
    * last ulp and break oracle replay). Weighted totals can reach
    * rows·2^rounds; they accumulate in the same Decimal(38,0) the
    * unweighted trainer uses, good to ~10^12·2^8. */
  def stumpModelWeighted(
      df: DataFrame, feature: Column, labelCol: String, weight: Column,
      binScale: Long = 16L): DataFrame =
    stumpModelFrom(stumpScoredW(df, feature, labelCol, weight, binScale), binScale)

  private def stumpModelFrom(scored: DataFrame, binScale: Long): DataFrame =
    scored
      .agg(min(struct(col("score"), col("bin"), col("nl"), col("nr"),
        col("n"), col("lw"), col("rw"))).as("w"))
      .select(
        col("w.bin").as("split_bin"),
        ((col("w.bin") + lit(1L)).cast(DoubleType) / lit(binScale.toDouble))
          .as("threshold"),
        col("w.lw.l").as("left_label"),
        col("w.rw.l").as("right_label"),
        col("w.nl").as("n_left"),
        col("w.nr").as("n_right"),
        (col("w.score").cast(DoubleType) /
          (col("w.n").cast(DoubleType) * col("w.nl").cast(DoubleType) *
            col("w.nr").cast(DoubleType))).as("gini"),
        // Per-side majority counts (the majority structs order by negated
        // count, so the winning count rides in as its negation) — what a
        // confidence-ordered rule list needs to weigh each side's purity.
        (-col("w.lw.nc")).cast(LongType).as("n_left_maj"),
        (-col("w.rw.nc")).cast(LongType).as("n_right_maj"))
      .filter(col("split_bin").isNotNull)

  /** Per-candidate-split frame shared by [[stumpSplit]] / [[stumpModel]]:
    * one (bin, label) corpus aggregation, zero-filled grid, per-label
    * cumulative windows, the cleared-denominator integer score, and
    * per-side majority structs — everything after the first aggregation
    * is metadata-scale (≤ bins × classes rows). */
  private def stumpScored(
      df: DataFrame, feature: Column, labelCol: String,
      binScale: Long): DataFrame =
    stumpScoredW(df, feature, labelCol, lit(1L), binScale)

  private def stumpScoredW(
      df: DataFrame, feature: Column, labelCol: String, weight: Column,
      binScale: Long): DataFrame = {
    require(binScale >= 1, s"binScale must be positive, got $binScale")
    val dec = DecimalType(38, 0)
    val counts = df
      .filter(feature.isNotNull && col(labelCol).isNotNull)
      .select(floor(feature.cast(DoubleType) * lit(binScale.toDouble))
          .cast(LongType).as("bin"),
        col(labelCol).as("label"),
        weight.cast(LongType).as("__sw"))
      .groupBy(col("bin"), col("label")).agg(sum(col("__sw")).as("c"))
    val grid = counts.select(col("bin")).distinct()
      .crossJoin(counts.select(col("label")).distinct())
      .join(counts, Seq("bin", "label"), "left")
      .select(col("bin"), col("label"), coalesce(col("c"), lit(0L)).as("c"))
    val cum = grid.select(col("bin"), col("label"),
      sum(col("c")).over(Window.partitionBy(col("label")).orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cl"),
      sum(col("c")).over(Window.partitionBy(col("label"))).as("tot"))
    cum.groupBy(col("bin")).agg(
        sum(col("cl")).as("nl"),
        sum(col("cl").cast(dec) * col("cl").cast(dec)).as("sl2"),
        sum((col("tot") - col("cl")).cast(dec) *
          (col("tot") - col("cl")).cast(dec)).as("sr2"),
        sum(col("tot")).as("n"),
        min(struct((-col("cl")).as("nc"), col("label").as("l"))).as("lw"),
        min(struct((col("cl") - col("tot")).as("nc"),
          col("label").as("l"))).as("rw"))
      .withColumn("nr", col("n") - col("nl"))
      .filter(col("nl") > 0 && col("nr") > 0)
      .withColumn("score",
        col("nr").cast(dec) *
          (col("nl").cast(dec) * col("nl").cast(dec) - col("sl2")) +
        col("nl").cast(dec) *
          (col("nr").cast(dec) * col("nr").cast(dec) - col("sr2")))
  }

  /** The training-time left-branch test of a [[stumpModel]] row — the
    * EXACT binning the trainer used (`floor(feature · binScale) ≤
    * split_bin`, a power-of-two scale so the float multiply is an exact
    * exponent shift), so routing and training can never disagree on
    * which side a row falls. */
  def stumpLeft(feature: Column, splitBin: Long, binScale: Long = 16L): Column =
    floor(feature.cast(DoubleType) * lit(binScale.toDouble))
      .cast(LongType) <= lit(splitBin)

  /** Label-free routing for a trained decision list — the inference face
    * that closes the train→apply loop for chained [[stumpModel]] rounds
    * (the perceptron/naive-Bayes families' discipline). Semantics: rules
    * fire in TRAINING ORDER; rule r claims a row iff its left-branch
    * test holds ([[stumpLeft]] on the row's round-r feature), routing to
    * that round's left majority; a row no rule claims falls through to
    * `fallback` — the natural choice is the LAST stump's right majority,
    * since falling through every left branch leaves the row on the final
    * stump's right side.
    *
    * 100 TB shape: the trained list is a handful of driver-side literals
    * (7-field model rows), so routing is ONE literal CASE projection —
    * no join, no shuffle, whole-stage-codegen'd; scoring a corpus costs
    * exactly a scan. */
  def decisionListRoute(rules: Seq[(Column, Column)], fallback: Column): Column =
    rules.foldRight(fallback) { case ((fires, pred), rest) =>
      when(fires, pred).otherwise(rest)
    }
}
