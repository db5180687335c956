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

  test("NaiveBayes: eighth-bit scores match the hand-computed reference") {
    // Train: class a = {"x x y", "x z"}, class b = {"y y z"}.
    // cnt_a: x->3 y->1 z->1 (tot 5); cnt_b: y->2 z->1 (tot 3); V=3, N=3.
    // l8: 1->0, 2->8, 3->12, 4->16, 6->20, 8->24.
    // prior8: a = l8(3)-l8(2) = 4, b = l8(3)-l8(1) = 12;
    // base8:  a = l8(5+3) = 24,  b = l8(3+3) = 20.
    val train = Seq((1L, "a", "x x y"), (2L, "a", "x z"), (3L, "b", "y y z"))
      .toDF("doc_id", "lang", "text")
    val model = graft.functions.NaiveBayes.train(train, "lang", "text")
    val out = graft.functions.NaiveBayes.classify(
        Seq((10L, "x x"), (11L, "y y"), (12L, "q")).toDF("doc_id", "text"),
        model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // 10: a = 4 + 2*24 - 2*l8(4) = 20 beats b = 12 + 2*20 = 52.
    // 11: b = 12 + 2*20 - 2*l8(3) = 28 beats a = 4 + 48 - 2*l8(2) = 36.
    // 12 (all-OOV): priors decide — a = 4 + 24 = 28 beats b = 12 + 20 = 32.
    assert(out === Map(
      10L -> (("a", 20L)), 11L -> (("b", 28L)), 12L -> (("a", 28L))))
  }

  test("NaiveBayes: separable classes are learned perfectly, incl. mixed docs") {
    // Two sources with disjoint characteristic vocab plus shared filler.
    // A real-corpus accuracy assertion is impossible here: the synthetic
    // documents' text is generated independently of lang/source (even a
    // float-precision NB scores at/below majority on it), so LEARNING is
    // asserted on a corpus where signal exists; the real corpus is covered
    // by the nb_confusion engine-parity oracle.
    val train = (1 to 20).map(i => (i.toLong, "wiki",
        s"the of fact cite ref$i infobox cite fact")) ++
      (21 to 40).map(i => (i.toLong, "web",
        s"the of click buy now deal$i click buy"))
    val model = graft.functions.NaiveBayes.train(
      train.toDF("doc_id", "src", "text"), "src", "text")
    val test = Seq(
      (100L, "wiki", "fact cite the infobox"),
      (101L, "web", "buy now the click"),
      (102L, "wiki", "of the cite fact fact"),
      (103L, "web", "deal99 click buy of"))
    val conf = graft.functions.NaiveBayes.confusion(
        test.toDF("doc_id", "src", "text"), model, "doc_id", "src", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(conf === Map(("wiki", "wiki") -> 2L, ("web", "web") -> 2L))
  }

  test("NaiveBayes store: disjoint increments sum to the batch model, bit-identical") {
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val held = docs.filter(col("doc_id") % 10 === 0)
    val dir = java.nio.file.Files.createTempDirectory("nb_inc").toString
    graft.functions.NaiveBayes.writeNbCounts(
      train.filter(col("doc_id") % 2 === 1), "lang", "text", dir)
    graft.functions.NaiveBayes.appendNbCounts(
      train.filter(col("doc_id") % 2 === 0), "lang", "text", dir)
    def preds(m: graft.functions.NaiveBayes.NbModel) =
      graft.functions.NaiveBayes.classify(held, m, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
        .sortBy(_._1).toSeq
    val stored = preds(graft.functions.NaiveBayes.readNb(spark, dir))
    val batch = preds(graft.functions.NaiveBayes.train(train, "lang", "text"))
    assert(stored === batch && stored.nonEmpty)
  }

  test("NaiveBayes store batch-id ledger: a replayed tagged slice cannot double-count") {
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val held = docs.filter(col("doc_id") % 10 === 0)
    val s1 = train.filter(col("doc_id") % 2 === 1)
    val s2 = train.filter(col("doc_id") % 2 === 0)
    val replayed = java.nio.file.Files.createTempDirectory("nb_ledger_r").toString
    graft.functions.NaiveBayes.appendNbCounts(s1, "lang", "text", replayed, batchId = 3L)
    graft.functions.NaiveBayes.appendNbCounts(s1, "lang", "text", replayed, batchId = 3L) // re-delivery
    graft.functions.NaiveBayes.appendNbCounts(s2, "lang", "text", replayed, batchId = 4L)
    def preds(m: graft.functions.NaiveBayes.NbModel) =
      graft.functions.NaiveBayes.classify(held, m, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
        .sortBy(_._1).toSeq
    val got = preds(graft.functions.NaiveBayes.readNb(spark, replayed))
    assert(got === preds(graft.functions.NaiveBayes.train(train, "lang", "text")))
    assert(got.nonEmpty)
  }

  test("NaiveBayes decrement slices: takedown equals retraining without the docs") {
    // Negated count slices must net the store to exactly the
    // retrained-without model: vocabulary size, class totals, priors,
    // and every eighth-bit score — a fully-decremented token leaves V,
    // a fully-removed class leaves the prior table. Replay collapses.
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val doomed = train.filter(col("doc_id") % 3 === 0)
    val held = docs.filter(col("doc_id") % 10 === 0)
    val dir = java.nio.file.Files.createTempDirectory("nb_dec").toString
    graft.functions.NaiveBayes.appendNbCounts(train, "lang", "text", dir, batchId = 0L)
    graft.functions.NaiveBayes.appendNbCountsNegated(doomed, "lang", "text", dir, batchId = 1L)
    graft.functions.NaiveBayes.appendNbCountsNegated(doomed, "lang", "text", dir, batchId = 1L) // replay
    def preds(m: graft.functions.NaiveBayes.NbModel) =
      graft.functions.NaiveBayes.classify(held, m, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
        .sortBy(_._1).toSeq
    val got = preds(graft.functions.NaiveBayes.readNb(spark, dir))
    assert(got === preds(graft.functions.NaiveBayes.train(
      train.filter(col("doc_id") % 3 =!= 0), "lang", "text")))
    assert(got.nonEmpty)
  }

  test("NaiveBayes: predictions are partitioning-invariant on the real corpus") {
    val model = graft.functions.NaiveBayes.train(
      docs.filter(col("doc_id") % 10 =!= 0), "lang", "text")
    def preds(d: org.apache.spark.sql.DataFrame) =
      graft.functions.NaiveBayes.classify(d, model, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
        .sortBy(_._1).toSeq
    val held = docs.filter(col("doc_id") % 10 === 0)
    val one = preds(held.repartition(1))
    val many = preds(held.repartition(13))
    assert(one === many && one.nonEmpty,
      "integer scores must make the argmin partitioning-invariant")
  }

  test("stumpSplit: hand-computed Gini argmin, perfect split found") {
    import spark.implicits._
    // binScale 4: bins 0:{A:2} 1:{A:1} 2:{B:2} 3:{B:1}, N=6.
    //   s=0: score = 4*(4-4) + 2*(16-10) = 12
    //   s=1: perfectly separates A|B -> score 0 (argmin)
    //   s=2: score = 1*(25-13) + 5*(1-1) = 12
    val df = Seq(
      (0.1, "A"), (0.2, "A"), (0.3, "A"),
      (0.6, "B"), (0.7, "B"), (0.9, "B")
    ).toDF("f", "label")
    val r = Classifier.stumpSplit(df, col("f"), "label", binScale = 4L).collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getLong(0) === 1L, "split_bin")
    assert(row.getDouble(1) === 0.5, "threshold = (bin+1)/binScale")
    assert(row.getLong(2) === 3L && row.getLong(3) === 3L)
    assert(row.getDouble(4) === 0.0, "perfect split has zero gini")
  }

  test("stumpModel: per-side majority labels; empty/one-bin input yields no row") {
    import spark.implicits._
    // Occupied bins 0 (A:3, B:1) and 2 (A:2, B:2): the only valid split
    // is after bin 0. Left majority: A by count; right majority: the 2-2
    // TIE must break to the smaller label (A) — the same min-over-struct
    // posture as knnClassify/labelPropRound, never label arithmetic.
    val df = Seq(
      (0.1, "A"), (0.15, "A"), (0.2, "A"), (0.22, "B"),
      (0.6, "A"), (0.62, "B"), (0.7, "A"), (0.72, "B")
    ).toDF("f", "label")
    val row = Classifier.stumpModel(df, col("f"), "label", binScale = 4L).collect()(0)
    assert(row.getLong(0) === 0L)
    assert(row.getDouble(1) === 0.25)
    assert(row.getString(2) === "A", "left majority by count")
    assert(row.getString(3) === "A", "right 2-2 tie breaks to the smaller label")
    assert(row.getLong(4) === 4L && row.getLong(5) === 4L)
    assert(Classifier.stumpModel(df.limit(0), col("f"), "label", binScale = 4L).isEmpty,
      "empty input must yield zero rows, not a null row")
    val oneBin = Seq((0.1, "A"), (0.2, "B")).toDF("f", "label")
    assert(Classifier.stumpModel(oneBin, col("f"), "label", binScale = 4L).isEmpty,
      "a single occupied bin admits no valid split")
  }

  test("stumpSplit: negative bins, all-score ties break to the lowest bin") {
    import spark.implicits._
    // (-0.3, 0.3) at binScale 4 -> bins -2 and 1; single row per side
    // makes every valid split score 0 -> argmin must pick bin -2.
    val df = Seq((-0.3, 0), (0.3, 1)).toDF("f", "label")
    val row = Classifier.stumpSplit(df, col("f"), "label", binScale = 4L).collect()(0)
    assert(row.getLong(0) === -2L)
    assert(row.getDouble(1) === -0.25)
    assert(row.getLong(2) === 1L && row.getLong(3) === 1L)
    assert(row.getDouble(4) === 0.0)
    // One-class corpus: all splits tie at 0 -> lowest bin again.
    val one = Seq((0.1, 7), (0.6, 7), (0.9, 7)).toDF("f", "label")
    assert(Classifier.stumpSplit(one, col("f"), "label", binScale = 4L)
      .collect()(0).getLong(0) === 0L)
  }

  test("stumpSplit is partitioning-invariant on the embeddings corpus (integer scores)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      Classifier.stumpSplit(df, element_at(col("embedding"), 1), "label", binScale = 16L)
        .collect()(0).toSeq
    assert(run(emb) === run(emb.repartition(13)))
  }

  test("decisionListRoute: training-order routing, fall-through, boundary bins") {
    import spark.implicits._
    // Two rules: f1 < 0.5 (bin <= 1 at scale 4) -> 10; f2 < 0.25 (bin <= 0)
    // -> 20; fallback 30. Row A fires rule 1 even though rule 2 would also
    // match (training order wins); row B skips rule 1, fires rule 2; row C
    // falls through both; row D sits EXACTLY on rule 1's threshold (0.5 ->
    // bin 2 > 1): thresholds are exclusive on the left side, so it must
    // not fire.
    val df = Seq(
      ("A", 0.1, 0.1), ("B", 0.9, 0.1), ("C", 0.9, 0.9), ("D", 0.5, 0.9)
    ).toDF("id", "f1", "f2")
    val rules = Seq(
      (Classifier.stumpLeft(col("f1"), 1L, binScale = 4L), lit(10)),
      (Classifier.stumpLeft(col("f2"), 0L, binScale = 4L), lit(20)))
    val out = df.select(col("id"),
        Classifier.decisionListRoute(rules, lit(30)).as("pred"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out === Map("A" -> 10, "B" -> 20, "C" -> 30, "D" -> 30))
    // Empty rule list: everything takes the fallback.
    assert(df.select(Classifier.decisionListRoute(Nil, lit(7)).as("p"))
      .collect().forall(_.getInt(0) === 7))
  }

  test("decisionList inference agrees with a scalar walk of the trained chain") {
    // Train a 2-round chain on a crafted frame, then check the routed
    // prediction for every row matches a scalar walk of the same literal
    // rules: rule r = round r's left branch, fall-through = the last
    // round's right majority.
    import spark.implicits._
    val df = Seq(
      (Array(0.1f, 0.9f), 0), (Array(0.2f, 0.8f), 0), (Array(0.3f, 0.9f), 1),
      (Array(0.8f, 0.1f), 1), (Array(0.9f, 0.2f), 1), (Array(0.7f, 0.3f), 0)
    ).toDF("embedding", "label")
    var cur = df
    val trained = (1 to 2).map { r =>
      val m = Classifier.stumpModel(
        cur, element_at(col("embedding"), r), "label", binScale = 16L).collect()(0)
      val (bin, ll, rl) = (m.getLong(0), m.getInt(2), m.getInt(3))
      val pred = when(Classifier.stumpLeft(element_at(col("embedding"), r), bin),
        lit(ll)).otherwise(lit(rl))
      cur = cur.filter(pred =!= col("label"))
      (r, bin, ll, rl)
    }
    val rules = trained.map { case (r, bin, ll, _) =>
      (Classifier.stumpLeft(element_at(col("embedding"), r), bin), lit(ll))
    }
    val routed = df.select(col("embedding"),
        Classifier.decisionListRoute(rules, lit(trained.last._4)).as("pred"))
      .collect()
    def binOf(x: Float) = math.floor(x.toDouble * 16.0).toLong
    routed.foreach { row =>
      val emb = row.getSeq[Float](0)
      val walked = trained.find { case (r, bin, _, _) => binOf(emb(r - 1)) <= bin }
        .map(_._3).getOrElse(trained.last._4)
      assert(row.getInt(1) === walked, s"row ${emb.mkString(",")}")
    }
  }

  test("stumpModelWeighted equals the unweighted trainer over weight-duplicated rows") {
    // The boosting face's foundation. NOTE: the unit-weight degeneration
    // is true BY CONSTRUCTION since the r13 refactor (stumpModel
    // delegates to stumpScoredW(lit(1L)) — both paths are one plan), so
    // asserting it would be vacuous. The semantic contract worth pinning
    // is the weight SUM machinery itself: training with integer weight w
    // must equal training over the corpus with each row physically
    // duplicated w times — same split, same majorities, same integer
    // score — because that is exactly what the boosted chain's
    // double-the-misclassified reweighting means.
    val df = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .filter(col("embedding").isNotNull && col("label").isNotNull)
      // Deterministic integer weights 1..4 varying with the row.
      .withColumn("w", (pmod(col("vec_id"), lit(4L)) + lit(1L)))
    val expanded = df.select(col("embedding"), col("label"),
      explode(sequence(lit(1L), col("w"))).as("rep"))
    for (dim <- Seq(1, 2, 7)) {
      val weighted = Classifier.stumpModelWeighted(
          df, element_at(col("embedding"), dim), "label", col("w"))
        .collect().map(_.toSeq).toSeq
      val duplicated = Classifier.stumpModel(
          expanded, element_at(col("embedding"), dim), "label")
        .collect().map(_.toSeq).toSeq
      assert(weighted === duplicated,
        s"dim $dim: weighted stump differs from duplicate-row training")
    }
  }

  test("boosted vote accuracy >= the chained decision list on the gate corpus") {
    // The round-13 rule_boosted contract (DESIGN candidate (d)):
    // reweight-instead-of-filter training + majority vote must not lose
    // accuracy vs the filtered chain's training-order routing, at either
    // gate scale. Accuracies read from the faces' own confusion outputs.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      def acc(name: String): Double = {
        val rows = SparkEntry.queries(name)(spark, dir)
          .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
        rows.collect { case (l, p, n) if l == p => n }.sum.toDouble /
          rows.map(_._3).sum
      }
      val (boosted, chained) = (acc("rule_boosted"), acc("stump_confusion"))
      assert(boosted >= chained,
        s"$dir: boosted vote accuracy $boosted < chained list $chained")
    }
  }

  test("boosted two-level trees beat boosted stumps at both gate scales") {
    // The round-14 tree_boosted contract (DESIGN candidate (d), second
    // stage): a four-leaf tree can express axis-aligned quadrant
    // structure a stump cannot, so under the same integer-weight
    // boosting the tree vote must be STRICTLY more accurate than the
    // stump vote on the gate corpus (measured 0.132/0.134 vs
    // 0.124/0.122 at sf0.001/sf0.01). Accuracies read from the faces'
    // own confusion outputs.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      def acc(name: String): Double = {
        val rows = SparkEntry.queries(name)(spark, dir)
          .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
        rows.collect { case (l, p, n) if l == p => n }.sum.toDouble /
          rows.map(_._3).sum
      }
      val (tree, stump) = (acc("tree_boosted"), acc("rule_boosted"))
      assert(tree > stump,
        s"$dir: tree vote accuracy $tree not above stump vote $stump")
    }
  }
}
