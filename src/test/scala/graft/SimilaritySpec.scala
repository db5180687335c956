package graft

import graft.functions.Similarity
import org.apache.spark.sql.functions._

/**
 * The brute-force O(n²) `cosinePairs` is deliberately NOT a production
 * query entry (textbook scale-killer); its job is here — the exact recall
 * oracle for the canonical sign-LSH `emb_pairs` form.
 */
class SimilaritySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("cosinePairsLsh finds every brute-force pair at cosine >= 0.4 (recall 1.0 here)") {
    val exact = Similarity.cosinePairs(emb, "vec_id", "embedding", 0.4)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.cosinePairsLsh(emb, "vec_id", "embedding", threshold = 0.4, dim = 64)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "brute-force baseline found no pairs — test data too sparse")
    // LSH can only miss pairs (recall), never invent them (precision = 1 by
    // the exact verify step).
    assert(lsh.subsetOf(exact), s"LSH invented pairs: ${lsh -- exact}")
    val recall = lsh.size.toDouble / exact.size
    assert(recall == 1.0, s"recall $recall < 1.0: missed ${exact -- lsh}")
  }

  test("cosinePairsLsh scores are bitwise equal to brute force on shared pairs") {
    val exact = Similarity.cosinePairs(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val lsh = Similarity.cosinePairsLsh(emb, "vec_id", "embedding", threshold = 0.4, dim = 64)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    for ((pair, c) <- lsh)
      assert(exact(pair) == c, s"pair $pair: lsh cosine $c != exact ${exact(pair)}")
  }
}
