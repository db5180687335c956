package graft

import graft.functions.Classifier
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {

  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .filter(col("text").isNotNull && col("lang").isNotNull)

  test("perceptronStep equals the scalar reference on crafted data") {
    // (y, x) rows; feature 0 is the bias.
    val rows = Seq(
      (1L, Seq(1L, 3L, 0L)), (1L, Seq(1L, 2L, 1L)),
      (-1L, Seq(1L, 0L, 3L)), (-1L, Seq(1L, 1L, 2L)))
    val df = rows.map { case (y, x) => (y, x(0), x(1), x(2)) }.toDF("y", "x0", "x1", "x2")
    def ref(w: Seq[Long]): (Seq[Long], Long) = {
      var next = w
      var m = 0L
      for ((y, x) <- rows) {
        val margin = x.zip(w).map { case (a, b) => a * b }.sum
        if (y * margin <= 0) { next = next.zip(x).map { case (a, b) => a + y * b }; m += 1 }
      }
      (next, m)
    }
    var w: Seq[Long] = Seq(0L, 0L, 0L)
    var wRef: Seq[Long] = Seq(0L, 0L, 0L)
    for (r <- 1 to 4) {
      val (nw, nm) = Classifier.perceptronStep(
        df, Seq(col("x0"), col("x1"), col("x2")), col("y"), w)
      val (rw, rm) = ref(wRef)
      assert(nw == rw && nm == rm, s"round $r: ($nw, $nm) vs ($rw, $rm)")
      w = nw; wRef = rw
    }
    // This toy set is separable: training converges to zero mistakes.
    var mis = -1L
    for (_ <- 1 to 20) { val (nw, nm) = Classifier.perceptronStep(
      df, Seq(col("x0"), col("x1"), col("x2")), col("y"), w); w = nw; mis = nm }
    assert(mis == 0L, s"separable toy set did not converge: $mis mistakes, w=$w")
  }

  test("training trajectory is exact under repartitioning; corpus rounds reduce mistakes") {
    val feats = Classifier.stopwordFeatures(col("text"))
    val label = when(col("lang") === "en", 1L).otherwise(-1L)
    val (h1, m1) = Classifier.perceptronTrain(docs, feats, label, rounds = 3)
    val (h2, m2) = Classifier.perceptronTrain(docs.repartition(13), feats, label, rounds = 3)
    assert(h1 == h2 && m1 == m2, "integer updates must be partitioning-invariant")
    // Round 1 misclassifies everything (w = 0); later rounds must do
    // better than that degenerate start.
    assert(m1.head == docs.count(), "zero weights mark every row a mistake")
    assert(m1.last < m1.head, s"mistakes did not drop: $m1")
  }

  test("perceptronStep: empty frame is a no-op round") {
    val empty = docs.filter(lit(false))
    val (w, m) = Classifier.perceptronStep(
      empty, Classifier.stopwordFeatures(col("text")),
      when(col("lang") === "en", 1L).otherwise(-1L), Seq(1L, 2L, 3L, 4L, 5L))
    assert(w == Seq(1L, 2L, 3L, 4L, 5L) && m == 0L)
  }
}
