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
}
