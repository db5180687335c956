package graft

import graft.functions.Dedup
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Randomized property coverage for the union-find contraction behind
 * `duplicateClusters`: on arbitrary random graphs under arbitrary
 * partitioning, the output must equal an independent BFS reference
 * (cluster_id = min node id of each connected component). The BFS is a
 * deliberately different algorithm, so a shared systematic bug can't
 * cancel out.
 */
class DedupPropertySpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def bfsComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
    for ((a, b) <- edges) {
      adj(a) = b :: adj.getOrElse(a, Nil)
      adj(b) = a :: adj.getOrElse(b, Nil)
    }
    val label = scala.collection.mutable.Map.empty[Long, Long]
    for (start <- adj.keys) if (!label.contains(start)) {
      // collect the whole component, then label with its minimum
      val seen = scala.collection.mutable.Set(start)
      var frontier = List(start)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(adj(_)).filterNot(seen)
        seen ++= frontier
      }
      val m = seen.min
      seen.foreach(n => label(n) = m)
    }
    label.toMap
  }

  private val graphGen: Gen[Seq[(Long, Long)]] = for {
    nodes <- Gen.chooseNum(2, 60)
    nEdges <- Gen.chooseNum(1, 90)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.chooseNum(0L, nodes.toLong - 1)
      b <- Gen.chooseNum(0L, nodes.toLong - 1) if a != b
    } yield (a, b))
  } yield edges

  test("duplicateClusters equals BFS min-labeling on random graphs under random partitioning") {
    val graphs = Iterator.from(0)
      .map(i => graphGen.apply(Gen.Parameters.default, rng.Seed(1234L + i)))
      .flatten.take(25).toSeq
    for ((edges, i) <- graphs.zipWithIndex) {
      val parts = 1 + (i % 7)
      val out = Dedup.duplicateClusters(edges.toDF("i", "j").repartition(parts))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(out == bfsComponents(edges), s"graph $i (parts=$parts): $edges")
    }
  }

  // Random low-alphabet corpora make shingle overlaps dense — the worst
  // case for the containment prefix filter's exactness argument.
  private val corpusGen: Gen[Seq[String]] = for {
    nDocs <- Gen.chooseNum(3, 25)
    docs <- Gen.listOfN(nDocs, for {
      len <- Gen.chooseNum(0, 40)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c', ' '))
    } yield cs.mkString)
  } yield docs

  test("containmentPairs equals the brute-force definition on random dense corpora") {
    def sh(s: String): Set[String] =
      (1 to math.max(s.length - 3, 1)).map(i => s.slice(i - 1, i + 3)).toSet
    val corpora = Iterator.from(0)
      .map(i => corpusGen.apply(Gen.Parameters.default, rng.Seed(77L + i)))
      .flatten.take(15).toSeq
    for ((docs, n) <- corpora.zipWithIndex; t <- Seq(0.6, 0.9)) {
      val df = docs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "text").repartition(1 + n % 5)
      val got = Dedup.containmentPairs(df, "doc_id", "text",
          shingleK = 4, threshold = t, minShingles = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val expected = (for {
        (a, i) <- docs.zipWithIndex; (b, j) <- docs.zipWithIndex
        if i != j && sh(a).size >= 2
        c = sh(a).intersect(sh(b)).size.toDouble / sh(a).size
        if c >= t
      } yield (i.toLong, j.toLong) -> c).toMap
      assert(got.keySet === expected.keySet, s"corpus $n t=$t: $docs")
      got.foreach { case (k, v) =>
        assert(math.abs(v - expected(k)) < 1e-12, s"corpus $n t=$t pair $k") }
    }
  }

  test("dedup_sweep facets are monotone: pairs and docs never grow as the threshold tightens") {
    // Structural invariant of the calibration sweep (SparkEntry dedup_sweep
    // shape): both facets count a subset of the looser threshold's
    // survivors, so each must be non-increasing in the threshold — a
    // violated monotonicity means the sweep's explode/filter wiring broke.
    val out = SparkEntry.queries("dedup_sweep")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(0.7, 0.95, 0.98))
    assert(out.sliding(2).forall { case Array(a, b) =>
      b._2 <= a._2 && b._3 <= a._3 }, out.mkString(", "))
    // And the loosest row must agree with the raw pair list it sweeps.
    val base = SparkEntry.queries("dedup_ngram")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.head._2 == base.length)
    assert(out.head._3 == base.flatMap(p => Seq(p._1, p._2)).distinct.length)
  }
}
