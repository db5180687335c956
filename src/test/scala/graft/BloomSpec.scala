package graft

import graft.functions.{Bloom, Contamination}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom-pre-filtered decontamination: no false negatives ever, and the
  * full pipeline is bit-identical to the exact path at any FPR (the
  * verify join removes every bloom false positive). */
class BloomSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("mightContain: every inserted key probes true (no false negatives)") {
    val keys = (1L to 2000L).map(_ * 2654435761L).toDF("sh")
    val bits = Bloom.buildBits(keys, "sh", mBits = 1 << 14, kHashes = 2)
    val misses = keys
      .filter(!Bloom.mightContain(bits, col("sh"), kHashes = 2))
      .count()
    assert(misses === 0L)
  }

  test("buildBits: bitset population matches a driver-side reference build") {
    // Same seeded-XXH64 positions computed through the engine itself, then
    // folded on the driver — buildBits' word-packing must agree bit-for-bit.
    val keys = (1L to 500L).map(i => i * 40503L + 7).toDF("sh")
    val m = 1 << 12
    val bits = Bloom.buildBits(keys, "sh", mBits = m, kHashes = 3)
    val pos = keys
      .select(explode(array((0 until 3).map(s =>
        xxhash64(lit(s), col("sh")).bitwiseAND(lit(m - 1L))): _*)).as("p"))
      .as[Long].collect()
    val ref = new Array[Long](m / 64)
    pos.foreach(p => ref((p >> 6).toInt) |= (1L << (p & 63)))
    assert(bits.toSeq === ref.toSeq)
  }

  test("bloom pipeline == exact decontamination, even at a high-FPR sizing") {
    val corpus = docs.filter(col("doc_id") % 100 =!= 0)
    val eval = docs.filter(col("doc_id") % 100 === 0)
    val exact = Contamination
      .contaminatedDocs(corpus, eval, "doc_id", "text", k = 16, minOverlap = 10)
      .as[(Long, Long)].collect().toSet
    // 2^10 bits over thousands of shingles: most probes are false
    // positives — the verify join must still reduce to the exact answer.
    for (mBits <- Seq(1 << 10, 1 << 18)) {
      val bloom = Bloom
        .contaminatedDocsBloom(corpus, eval, "doc_id", "text",
          k = 16, minOverlap = 10, mBits = mBits, kHashes = 2)
        .as[(Long, Long)].collect().toSet
      assert(bloom === exact, s"mBits=$mBits")
    }
  }

  test("cleanStreamBloom: micro-batch filtering == the exact batch keep set") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val eval = docs.filter(col("doc_id") % 100 === 0)
    val ev = Contamination.evalShingles(eval, "text", 16)
    val bits = Bloom.buildBits(ev, "sh", mBits = 1 << 14, kHashes = 2)
    val corpus = docs.filter(col("doc_id") % 100 =!= 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val dirty = Contamination
      .contaminatedDocs(docs.filter(col("doc_id") % 100 =!= 0), eval, "doc_id", "text")
      .select(col("doc_id")).as[Long].collect().toSet
    val in = MemoryStream[(Long, String)]
    val kept = scala.collection.mutable.Set[Long]()
    val q = Bloom.cleanStreamBloom(
      in.toDF.toDF("doc_id", "text"), bits, ev, "doc_id", "text") { (df, _) =>
      kept ++= df.select(col("doc_id")).as[Long].collect()
    }.start()
    val (b1, b2) = corpus.splitAt(corpus.size / 2)
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    q.stop()
    assert(kept.toSet === corpus.map(_._1).toSet -- dirty)
    assert(dirty.nonEmpty, "fixture sanity: some docs must be contaminated")
  }

  test("pre-filter actually prunes: clean shingles mostly fail the probe") {
    // At a production-shaped sizing (bits >> keys), a disjoint key set
    // should see a tiny pass rate — the map-side pruning the operator is
    // for. FPR for k=2, m=2^18, n~2k shingles is well under 1%.
    val ev = Contamination.evalShingles(docs.filter(col("doc_id") % 100 === 0), "text", 16)
    val bits = Bloom.buildBits(ev, "sh", mBits = 1 << 18, kHashes = 2)
    val disjoint = (1L to 10000L).map(i => -i * 9062003L).toDF("sh")
      .join(ev, Seq("sh"), "left_anti")
    val total = disjoint.count()
    val passed = disjoint.filter(Bloom.mightContain(bits, col("sh"), 2)).count()
    assert(passed.toDouble / total < 0.05, s"FPR $passed/$total")
  }
}
