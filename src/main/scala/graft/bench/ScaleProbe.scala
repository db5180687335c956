package graft.bench

import graft.functions.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/**
 * Two-slice scale probe for the bucketed ANN stores (r12 verdict item 8):
 * duplicates the sf0.1 embeddings 1x/2x/4x/8x under synthetic ids, lands
 * each corpus in the cell-partitioned `writeIvfBucketed` layout (trained
 * centroids from the 1x corpus — the index definition does not re-train
 * as the corpus grows), and measures the DEFAULT and FILTERED probe reads:
 * wall time plus the scan's post-pruning file count and bytes
 * (FileSourceScanExec's numFiles/filesSize metrics — what the executors
 * actually open after cell partition pruning).
 *
 * The 100 TB claim under test: probing nProbe of |C| cells reads a FIXED
 * FRACTION of the store's files — scan bytes grow with the probed cells'
 * share of the corpus, never with unprobed cells — and the label
 * predicate composes at the same scan (row-group pushdown on the carried
 * metadata column). Results are recorded in BASELINE.md.
 *
 * Prints one JSON line per (face, multiplier).
 */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = e.count()
    val cents = Similarity.trainIvfCentroids(e, "vec_id", "embedding",
      graft.SparkEntry.AnnDefaultCentroids, graft.SparkEntry.AnnDefaultIters)
    // A FIXED query set across multipliers: scan cost curves must isolate
    // corpus growth, not query-set growth.
    val queries = e.filter(col("vec_id") % 50 === 0)
    val base = java.nio.file.Files.createTempDirectory("graft-scaleprobe").toString

    // AQE hides stage subtrees from `collect` (QueryStageExec exposes no
    // children), so walk explicitly through adaptive plans and stages.
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val expand: Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      p +: expand.flatMap(allNodes)
    }

    def scanStats(df: org.apache.spark.sql.DataFrame): (Long, Long, Double) = {
      val t0 = System.nanoTime()
      // collect(), not a noop write: a write command wraps the plan in a
      // NEW execution, leaving this queryExecution's metrics untouched.
      // The top-k result is queries×k rows — driver-safe.
      df.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val scans = allNodes(df.queryExecution.executedPlan).collect {
        case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("graft-scaleprobe")) => f
      }
      (scans.map(_.metrics("numFiles").value).sum,
        scans.map(_.metrics("filesSize").value).sum, sec)
    }

    for (mult <- Seq(1, 2, 4, 8)) {
      val corpus = (0 until mult).map { k =>
        e.select((col("vec_id") + lit(k * n)).as("vec_id"),
          col("embedding"), col("label"))
      }.reduce(_ union _)
      val path = s"$base/cells$mult"
      Similarity.writeIvfBucketed(corpus, "vec_id", "embedding", cents, path,
        metaCols = Seq("label"))
      def lsStore(p: String): (Long, Long) = {
        val fs = new org.apache.hadoop.fs.Path(p)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
        var c = 0L
        var b = 0L
        while (it.hasNext) {
          val f = it.next()
          if (f.getPath.getName.endsWith(".parquet")) { c += 1; b += f.getLen }
        }
        (c, b)
      }
      val (totalFiles, storeBytes) = lsStore(path)
      // The memory story measured: the same corpus as a codes-only PQ
      // index (4 B of codes + id per vector vs 64 floats + id + norm).
      val pqPath = s"$base/pq$mult"
      Similarity.writeIvfPqIndex(corpus, "vec_id", "embedding", cents,
        Similarity.pqCodebook(4, 16, 16), 16, pqPath)
      val (_, pqBytes) = lsStore(pqPath)
      spark.sharedState.cacheManager.clearCache()
      // Pruning curve: ONE point-lookup query (the per-query cost a
      // serving path pays). A 40-query batch's probed-cell UNION covers
      // all 16 cells and hides pruning entirely — the batch numbers
      // below carry the throughput story instead.
      val one = e.filter(col("vec_id") === 0)
      val dflt = Similarity.ivfTopKFromBucketed(spark, path, one,
        "vec_id", "embedding", k = 5, cents, nProbe = 2)
      val (df1, db1, dt1) = scanStats(dflt)
      val filt = Similarity.ivfTopKFromBucketed(spark, path, one,
        "vec_id", "embedding", k = 5, cents, nProbe = 2,
        where = col("label") === 1)
      val (ff1, fb1, ft1) = scanStats(filt)
      // Batch throughput at the shipped default (40 queries, nProbe=8).
      val batch = Similarity.ivfTopKFromBucketed(spark, path, queries,
        "vec_id", "embedding", k = 5, cents, nProbe = graft.SparkEntry.AnnDefaultNProbe)
      val (bf1, bb1, bt1) = scanStats(batch)
      println(s"""SCALEPROBE {"mult":$mult,"rows":${n * mult},"store_files":$totalFiles,"store_bytes":$storeBytes,"pq_bytes":$pqBytes,""" +
        s""""one_np2":{"files":$df1,"bytes":$db1,"sec":$dt1},""" +
        s""""one_np2_filtered":{"files":$ff1,"bytes":$fb1,"sec":$ft1},""" +
        s""""batch_np8":{"files":$bf1,"bytes":$bb1,"sec":$bt1}}""")
    }
    spark.stop()
  }
}
