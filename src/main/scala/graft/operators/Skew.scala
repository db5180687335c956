package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for joins whose key distribution is known-pathological.
 *
 * First lines of defense at 100 TB are free and should be exhausted before
 * salting: broadcast the small side, and AQE's skewed-join splitting
 * (`spark.sql.adaptive.skewJoin`, on by default) which splits oversized
 * sort-merge partitions at runtime. Explicit salting remains the tool when
 * BOTH sides are large AND a handful of keys dominate so heavily that even
 * split partitions pin single executors.
 */
object Skew {

  /**
   * Salted inner equi-join: the (smaller) `build` side is replicated
   * `saltBuckets` times, the skewed `probe` side computes a DETERMINISTIC
   * salt from `probeSalt` (e.g. a hash of a high-cardinality column —
   * never `rand()`, which breaks retry/replay determinism), and the join
   * runs on (key, salt) so one hot key spreads over `saltBuckets`
   * partitions. Build-side cost: x`saltBuckets` rows through the shuffle.
   */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      probeSalt: Column,
      saltBuckets: Int): DataFrame = {
    require(saltBuckets > 1, "saltBuckets must be > 1")
    // A null salt would silently drop the row from the inner join; route
    // null salt expressions deterministically to bucket 0 instead.
    val salted = probe.withColumn(
      "__salt", coalesce(pmod(probeSalt, lit(saltBuckets)).cast("int"), lit(0)))
    val replicated = build.withColumn(
      "__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
