package graft

import graft.functions.{FastText, TextFunctions => TF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The codegen'd kernels (graft.expressions via FastText) must be
 * value-equal to their Column-level reference implementations in
 * TextFunctions on real corpus data — the reference forms mirror the DuckDB
 * oracle SQL, so this equality is what keeps the fast path oracle-exact.
 */
class FastKernelSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(col("doc_id"), col("text"))

  test("sortedShingles == sort_array(charShingles) on the documents corpus") {
    // k = 3 is lm_coverage's oracle assumption, 4 the dedup family's,
    // 16 decontamination's.
    for (k <- Seq(3, 4, 16)) {
      val diff = docs.select(
        FastText.sortedShingles(col("text"), k).as("fast"),
        sort_array(TF.charShingles(col("text"), k)).as("ref"))
        .filter(col("fast") =!= col("ref"))
      assert(diff.count() === 0, s"k=$k")
    }
  }

  test("xhash32Array == sort_array(shingleHashes) on the documents corpus") {
    val diff = docs.select(
      FastText.xhash32Array(TF.charShingles(col("text"), 4)).as("fast"),
      sort_array(TF.shingleHashes(col("text"), 4)).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() === 0)
  }

  test("minhashSig == minhashSignature (order-insensitive input)") {
    val diff = docs.select(
      FastText.minhashSig(FastText.xhash32Array(TF.charShingles(col("text"), 4)), 32).as("fast"),
      TF.minhashSignature(TF.shingleHashes(col("text"), 4), 32).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() === 0)
  }

  test("bandKeys == reference bandKeys") {
    val sig = FastText.minhashSig(FastText.xhash32Array(TF.charShingles(col("text"), 4)), 32)
    val diff = docs.select(
      FastText.bandKeys(sig, 8, 4).as("fast"),
      TF.bandKeys(sig, 8, 4).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() === 0)
  }

  test("simhash32 == reference simhash32") {
    val diff = docs.select(
      FastText.simhash32(FastText.xhash32Array(TF.charShingles(col("text"), 4))).as("fast"),
      TF.simhash32(TF.shingleHashes(col("text"), 4)).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() === 0)
  }

  test("jaccardSorted == size(intersect)/size(union) on cross-doc pairs") {
    val a = docs.limit(40).select(col("doc_id").as("i"), FastText.sortedShingles(col("text"), 4).as("sa"))
    val b = docs.limit(40).select(col("doc_id").as("j"), FastText.sortedShingles(col("text"), 4).as("sb"))
    val diff = a.crossJoin(b).select(
      FastText.jaccardSorted(col("sa"), col("sb")).as("fast"),
      (size(array_intersect(col("sa"), col("sb"))).cast("double") /
        size(array_union(col("sa"), col("sb")))).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() === 0)
  }

  test("hashed-shingle Jaccard == string-set Jaccard across corpus pairs") {
    val a = docs.limit(60).select(col("doc_id").as("i"),
      FastText.sortedShingles(col("text"), 4).as("sa"),
      FastText.hashedShingles(col("text"), 4).as("ha"))
    val b = docs.limit(60).select(col("doc_id").as("j"),
      FastText.sortedShingles(col("text"), 4).as("sb"),
      FastText.hashedShingles(col("text"), 4).as("hb"))
    val diff = a.crossJoin(b).select(
      FastText.jaccardSortedLong(col("ha"), col("hb")).as("fast"),
      (size(array_intersect(col("sa"), col("sb"))).cast("double") /
        size(array_union(col("sa"), col("sb")))).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() === 0)
  }

  test("kMinFingerprint reference == kernel prefix path (fingerprint query)") {
    val diff = docs.select(
      TF.kMinFingerprint(col("text"), 4).as("ref"),
      slice(FastText.xhash32Array(FastText.sortedShingles(col("text"), 8)), 1, 4).as("fast"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() === 0)
  }

  test("minhashSig on 64-bit XXH64 inputs stays in [0, P) (production path)") {
    import graft.functions.TextFunctions.P
    val sigs = docs.select(
      FastText.minhashSig(FastText.hashedShingles(col("text"), 4), 32).as("sig"))
    val bad = sigs.filter(exists(col("sig"), v => v < 0 || v >= P))
    assert(bad.count() === 0)
  }

  test("kernel dotSeq == HOF fold on the embeddings corpus (float arrays)") {
    import graft.functions.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = e.select(col("vec_id").as("i"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("j"), col("embedding").as("vb"))
    val pairs = a.join(b, col("i") < col("j")).limit(2000)
    val diff = pairs.select(
      Similarity.dotSeq(col("va"), col("vb")).as("fast"),
      Similarity.dotSeqRef(col("va"), col("vb")).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() === 0)
  }

  test("bounded Jaccard kernel: exact value above threshold, only sub-threshold pairs bailed") {
    // All-pairs over a doc sample: every pair the unbounded kernel puts at
    // >= t must get the identical value from the bounded kernel; every
    // bailed (-1) pair must truly be < t.
    val sh = docs.limit(120).select(
      col("doc_id").as("id"), FastText.hashedShingles(col("text"), 4).as("sh"))
    val pairs = sh.as("l").join(sh.as("r"), col("l.id") < col("r.id"))
      .select(
        FastText.jaccardSortedLong(col("l.sh"), col("r.sh")).as("ref"),
        FastText.jaccardSortedLongBounded(col("l.sh"), col("r.sh"), 0.7).as("bounded"))
    assert(pairs.filter(col("ref") >= 0.7 && col("bounded") =!= col("ref")).count() === 0)
    assert(pairs.filter(col("bounded") === -1.0 && col("ref") >= 0.7).count() === 0)
    assert(pairs.filter(col("ref") >= 0.7).count() > 0, "sample has no above-threshold pair")
  }

  test("sortedLongContains == array_contains over random sorted arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // Arrays of varied size (incl. empty and singleton) probed with a mix
    // of present and absent values, including boundary elements.
    val rows = (1 to 500).map { _ =>
      val n = rnd.nextInt(20)
      val arr = Array.fill(n)(rnd.nextInt(50).toLong).distinct.sorted
      val probe = rnd.nextInt(60).toLong
      (arr.toSeq, probe)
    } ++ Seq((Seq.empty[Long], 0L), (Seq(7L), 7L), (Seq(7L), 6L), (Seq(7L), 8L))
    val df = rows.toDF("arr", "v")
    val diff = df.select(
      FastText.sortedLongContains(col("arr"), col("v")).as("fast"),
      array_contains(col("arr"), col("v")).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() === 0)
  }

  test("kernels handle edge strings: empty, shorter than k, multi-byte") {
    import spark.implicits._
    val edge = Seq("", "ab", "日本語のテキスト", "aaaa", "日日日日日").toDF("text")
    val diff = edge.select(
      FastText.sortedShingles(col("text"), 4).as("fast"),
      sort_array(TF.charShingles(col("text"), 4)).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() === 0)
    val hdiff = edge.select(
      FastText.xhash32Array(TF.charShingles(col("text"), 4)).as("fast"),
      sort_array(TF.shingleHashes(col("text"), 4)).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(hdiff.count() === 0)
  }
}
