package graft.bench

import org.apache.spark.sql.SparkSession

/**
 * Dumps `.explain("formatted")` for declared queries into a directory —
 * the optimization rounds' evidence trail (plans/rNN/<query>_<tag>.txt).
 *
 * Usage: runMain graft.bench.PlanDump <outDir> <tag> [query...]
 * Env: SPARK_GRAFT_SF_DIR (data dir), SPARK_GRAFT_CPUS (local cores).
 *
 * Plans are captured at plan time (no execution), but queries that build
 * plan-time artifacts (persisted stores via oncePerDir, collected
 * metadata-scale literals) run those builds exactly as Bench/Verify do.
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <tag> [query...]")
    val outDir = args(0)
    val tag = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.memory.storageFraction", "0.3")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = args.drop(2).toSet
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only.contains(n))
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val out = new java.io.File(outDir, s"${name}_$tag.txt")
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(out, "UTF-8")
        try w.write(plan) finally w.close()
        println(s"[plandump] $name -> ${out.getPath}")
      } catch {
        case e: Throwable =>
          println(s"[plandump] FAIL $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
