package graft.tmp
import graft.SparkEntry
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries("sessionize")(spark, "/root/testdata/sf0.01")
      .coalesce(1).write.mode("overwrite").parquet("/tmp/verify_out/sessionize")
    spark.stop()
  }
}
