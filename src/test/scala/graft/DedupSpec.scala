package graft

import graft.functions.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  import spark.implicits._

  test("duplicateClusters labels a chain graph in diameter rounds (+1 to detect fixpoint)") {
    // Chain 0-1-2-...-7: worst case for hash-to-min (min propagates one hop
    // per round) — diameter 7, so 7 propagation rounds + 1 no-change round.
    val chain = (0L until 7L).map(i => (i, i + 1)).toDF("i", "j")
    val (labels, rounds) = Dedup.duplicateClustersWithRounds(chain, maxIter = 20)
    val out = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.size == 8)
    assert(out.values.forall(_ == 0L), out.toString)
    assert(rounds == 8, s"expected 8 rounds (7 diameter + 1 detect), got $rounds")
  }

  test("duplicateClusters separates disjoint components deterministically") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("i", "j")
    val out = Dedup.duplicateClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("duplicateClusters on empty pair input returns empty") {
    val empty = Seq.empty[(Long, Long)].toDF("i", "j")
    assert(Dedup.duplicateClusters(empty).count() == 0)
  }

  test("incremental dedup against a persisted index equals recomputation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // "Corpus" = docs 0..399, "new day" = docs 400..499 (overlapping dups
    // exist across the boundary in the synthetic corpus).
    val corpus = docs.filter(col("doc_id") < 400)
    val newDay = docs.filter(col("doc_id") >= 400)

    val dir = java.nio.file.Files.createTempDirectory("graft-mh-index").toString
    try {
      Dedup.writeMinhashIndex(
        Dedup.buildMinhashIndex(corpus, "doc_id", "text"), dir)
      val persisted = Dedup.minhashPairsAcross(
        Dedup.buildMinhashIndex(newDay, "doc_id", "text"),
        Dedup.readMinhashIndex(spark, dir),
        threshold = 0.8)
      val recomputed = Dedup.minhashPairsBetween(
        newDay, corpus, "doc_id", "text", threshold = 0.8)
      val p = persisted.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val r = recomputed.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(p.nonEmpty, "expected cross-boundary duplicates in the synthetic corpus")
      assert(p == r, s"persisted-index pairs differ: only-persisted=${p -- r} only-recomputed=${r -- p}")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }
}
