package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    println("DBG docs partitions=" + docs.rdd.getNumPartitions)
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    println("DBG emb partitions=" + emb.rdd.getNumPartitions)
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    println("DBG lineitem partitions=" + li.rdd.getNumPartitions)
    val ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    println("DBG events partitions=" + ev.rdd.getNumPartitions)
    spark.stop()
  }
}
