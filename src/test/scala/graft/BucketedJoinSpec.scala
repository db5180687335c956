package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Bucketed-table co-located join: writing both sides bucketed by the join
 * key lets the sort-merge join read pre-partitioned data with NO exchange
 * on either side — the storage-level answer to repeated large joins at
 * 100 TB (shuffle once at write time, never again at read time).
 */
class BucketedJoinSpec extends AnyFunSuite with SparkSpec {

  test("join of two tables bucketed on the key plans no shuffle exchange") {
    import spark.implicits._
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // The join itself must consume bucketed scans directly: the only
      // exchange allowed is the one for the final groupBy on c_nationkey.
      // Count anywhere in the line: branch lines render with ':' prefixes
      // that a prefix-strip would miss.
      val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(exchanges <= 1, plan)
      // And the result matches the plain (shuffling) join.
      val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
      assert(joined.collect().toSet === plain.collect().toSet)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
