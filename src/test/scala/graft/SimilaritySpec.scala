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

  test("trained IVF centroids: recall vs brute force >= sampled centroids") {
    def recall(ann: org.apache.spark.sql.DataFrame, exact: org.apache.spark.sql.DataFrame): Double = {
      val a = ann.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val e = exact.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (a & e).size.toDouble / e.size
    }
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
    val sampled = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", k = 5)
    val trained = Similarity.ivfTopKTrained(emb, queries, "vec_id", "embedding", k = 5)
    val (rs, rt) = (recall(sampled, exact), recall(trained, exact))
    assert(rt >= rs, s"trained recall $rt < sampled recall $rs")
    assert(rt > 0.0)
  }

  test("k-means training preserves centroid count and dimension, ids stay stable") {
    val seeds = Similarity.sampledIvfCentroids(emb, "vec_id", "embedding")
    val trained = Similarity.trainIvfCentroids(emb, "vec_id", "embedding", iters = 2)
    assert(trained.map(_._1).toSeq == seeds.map(_._1).toSeq)
    assert(trained.forall(_._2.size == 64))
    // Training moved at least one centroid off its seed.
    assert(trained.zip(seeds).exists { case ((_, t), (_, s)) => t != s })
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
