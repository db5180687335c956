package graft.tmp

import graft.functions.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (deleted before commit): recall@5 of the IVF-PQ face at
  * candidate codebook configs, choosing the round-14 lift (verdict #4). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = e.filter(col("vec_id") % 50 === 0)
    val cents = Similarity.trainIvfCentroids(e, "vec_id", "embedding",
      graft.SparkEntry.AnnDefaultCentroids, graft.SparkEntry.AnnDefaultIters)
    val exact = Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((cw, it, candN) <- Seq((16, 2, 40), (32, 2, 40), (64, 2, 40),
        (32, 3, 40), (32, 2, 80), (64, 3, 40))) {
      val t0 = System.nanoTime()
      val cb = Similarity.trainPqCodebook(e, "embedding", dim = 64, cents,
        numSub = 4, codesPerSub = cw, iters = it)
      val got = Similarity.ivfPqTopKWithCodebook(e, queries, "vec_id", "embedding",
          k = 5, cents, cb, subDim = 16, nProbe = graft.SparkEntry.AnnDefaultNProbe,
          candN = candN)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PQPROBE cw=$cw iters=$it candN=$candN recall=${(got & exact).size.toDouble / exact.size}%.3f sec=$sec%.1f")
    }
    spark.stop()
  }
}
