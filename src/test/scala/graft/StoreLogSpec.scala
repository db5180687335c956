package graft

import graft.functions.StoreLog
import org.apache.spark.sql.functions._

/**
 * The generic LWW tombstone log (retraction face for set stores):
 * insert/tombstone/resurrect choreography, key-only takedowns with
 * payload columns nulled from the log schema, replay idempotence, and
 * compaction that keeps tombstones.
 */
class StoreLogSpec extends SparkSpec {

  import spark.implicits._

  test("inserts, key-only takedowns, replay, resurrection, composite keys") {
    val dir = java.nio.file.Files.createTempDirectory("store_log").toString + "/log"
    // Composite key (src, h) with a payload column — the gram-inventory
    // shape.
    val s1 = Seq(("a", 1L, "p1"), ("a", 2L, "p2"), ("b", 1L, "p3"))
      .toDF("src", "h", "payload")
    StoreLog.appendInserts(s1, dir, gen = 0L)
    def live() = StoreLog.readLive(spark, dir, Seq("src", "h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(live() === Set(("a", 1L, "p1"), ("a", 2L, "p2"), ("b", 1L, "p3")))
    // Key-only takedown: payload column must not be needed.
    val down = Seq(("a", 2L)).toDF("src", "h")
    StoreLog.appendTombstones(down, dir, gen = 1L)
    StoreLog.appendTombstones(down, dir, gen = 1L) // replayed slice
    assert(live() === Set(("a", 1L, "p1"), ("b", 1L, "p3")))
    // Later re-insert resurrects with the NEW payload.
    StoreLog.appendInserts(Seq(("a", 2L, "p2v2")).toDF("src", "h", "payload"),
      dir, gen = 2L)
    assert(live() === Set(("a", 1L, "p1"), ("a", 2L, "p2v2"), ("b", 1L, "p3")))
    // Same-gen insert + tombstone tie resolves to TOMBSTONE.
    StoreLog.appendTombstones(Seq(("b", 1L)).toDF("src", "h"), dir, gen = 3L)
    StoreLog.appendInserts(Seq(("b", 1L, "p3v2")).toDF("src", "h", "payload"),
      dir, gen = 3L)
    assert(live() === Set(("a", 1L, "p1"), ("a", 2L, "p2v2")))
  }

  test("compaction: read-invariant, one winner per key, tombstones retained") {
    val dir = java.nio.file.Files.createTempDirectory("store_log_c").toString + "/log"
    StoreLog.appendInserts(Seq((1L, 10L), (2L, 20L)).toDF("id", "sig"), dir, gen = 0L)
    StoreLog.appendTombstones(Seq(Tuple1(2L)).toDF("id"), dir, gen = 1L)
    StoreLog.appendInserts(Seq((3L, 30L)).toDF("id", "sig"), dir, gen = 2L)
    val dest = dir + "_compact"
    StoreLog.compact(spark, dir, dest, Seq("id"))
    def live(p: String) = StoreLog.readLive(spark, p, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(live(dest) === live(dir))
    assert(live(dest) === Set((1L, 10L), (3L, 30L)))
    // One row per key, including id=2's tombstone.
    val raw = spark.read.parquet(dest)
    assert(raw.count() === 3)
    // A replayed PRE-delete insert slice must not resurrect id=2.
    StoreLog.appendInserts(Seq((2L, 20L)).toDF("id", "sig"), dest, gen = 0L)
    assert(live(dest) === Set((1L, 10L), (3L, 30L)),
      "a retained tombstone must beat a replayed pre-delete insert")
  }

  test("minhash index through the log (the dedup_retract shape): takedown, replay, compaction") {
    import graft.functions.Dedup
    val dir = java.nio.file.Files.createTempDirectory("store_log_mh").toString
    // Three docs: 1 and 2 near-identical, 3 distant; doc 2 gets taken down.
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again!"),
      (3L, "completely different content with nothing shared at all here"))
      .toDF("doc_id", "text")
    val idx = Dedup.buildMinhashIndex(docs, "doc_id", "text")
    StoreLog.appendInserts(idx.shingled, s"$dir/shingles", gen = 0L)
    StoreLog.appendInserts(idx.banded, s"$dir/bands", gen = 0L)
    def pairs(p: String) = Dedup.minhashPairsFromIndex(
        Dedup.MinhashIndex(
          StoreLog.readLive(spark, s"$p/shingles", Seq("id")),
          StoreLog.readLive(spark, s"$p/bands", Seq("id", "band"))),
        threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(dir) === Set((1L, 2L)))
    // Key-only takedown of doc 2: the band tombstones fan the id over the
    // static band indexes (a takedown knows the id, not the signatures).
    val down = Seq(Tuple1(2L)).toDF("id")
    val downBands = down.select(col("id"),
      explode(sequence(lit(0), lit(31))).as("band"))
    StoreLog.appendTombstones(down, s"$dir/shingles", gen = 1L)
    StoreLog.appendTombstones(downBands, s"$dir/bands", gen = 1L)
    StoreLog.appendTombstones(down, s"$dir/shingles", gen = 1L) // replay
    StoreLog.appendTombstones(downBands, s"$dir/bands", gen = 1L) // replay
    assert(pairs(dir) === Set.empty, "taken-down doc must leave no pairs")
    // Compaction is pair-invariant and RETAINS the tombstones: a replayed
    // pre-delete insert slice must not resurrect doc 2's index rows.
    val dest = java.nio.file.Files.createTempDirectory("store_log_mhc").toString
    StoreLog.compact(spark, s"$dir/shingles", s"$dest/shingles", Seq("id"))
    StoreLog.compact(spark, s"$dir/bands", s"$dest/bands", Seq("id", "band"))
    assert(pairs(dest) === Set.empty)
    StoreLog.appendInserts(idx.shingled.filter(col("id") === 2L),
      s"$dest/shingles", gen = 0L)
    StoreLog.appendInserts(idx.banded.filter(col("id") === 2L),
      s"$dest/bands", gen = 0L)
    assert(pairs(dest) === Set.empty,
      "retained tombstones must beat replayed pre-delete inserts")
  }

  test("live signatures feed the phash pair operator (the mm_phash_retract shape)") {
    val dir = java.nio.file.Files.createTempDirectory("store_log_mm").toString + "/log"
    // Two near-identical sigs (Hamming 1) + one distant; take down one
    // member of the near pair — the pair must vanish from the live view.
    StoreLog.appendInserts(
      Seq((1L, 0x00F0L), (2L, 0x00F1L), (3L, 0x0F00L)).toDF("id", "sig"),
      dir, gen = 0L)
    def pairs() = graft.multimodal.Multimodal.phashPairsFromSigs(
        StoreLog.readLive(spark, dir, Seq("id")), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs() === Set((1L, 2L)))
    StoreLog.appendTombstones(Seq(Tuple1(2L)).toDF("id"), dir, gen = 1L)
    assert(pairs() === Set.empty)
  }
}
