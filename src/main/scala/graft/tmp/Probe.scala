package graft.tmp

import org.apache.spark.sql.SparkSession

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val out = "/tmp/out"
    val names = Seq("q26_rolling_range")
    names.foreach { n =>
      graft.SparkEntry.queries(n)(spark, dir).write.mode("overwrite").parquet(s"$out/$n")
    }
    val sqls = graft.SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
    val json = sqls.map { case (k, v) =>
      "\"" + k + "\": \"" + v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n") + "\""
    }.mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/oracle_sql.json"),
      json.getBytes("UTF-8"))
    println("DBG wrote " + names.mkString(","))
    spark.stop()
  }
}
