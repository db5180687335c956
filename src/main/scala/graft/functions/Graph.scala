package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Bulk-iterative graph primitives in the PageRank family, as single-step
 * operators: each call is ONE push round (score mass flows src -> dst along
 * edges), so an N-iteration computation is N chained calls — each round a
 * self-contained, restartable Spark job, the shape that survives 100 TB
 * graphs (drivers checkpoint between rounds; nothing iterates inside a
 * task).
 *
 * Arithmetic is integer fixed-point (parts-per-million), NOT double:
 * score = 0.15 + 0.85 * Σ contrib becomes
 * `150000 + (850000 * Σ (1000000 div outdeg)) div 1000000` — every
 * operation is exact 64-bit integer math, so results are bit-identical
 * across engines, partitionings, and summation orders (a double PageRank
 * differs in the last ulps per run — unverifiable).
 *
 * 100 TB shape: outdegree is a map-side-combining count per src; the
 * contribution join is src-keyed (both sides partition on src — one
 * exchange each, AQE-splittable on skewed hubs); the gather is a dst-keyed
 * partial aggregation. No driver-side state, no collect, no iteration
 * inside the plan.
 */
object Graph {

  /** One degree-normalized push round with uniform initial mass.
    * Output: (dst-keyed) `node`, `in_edges`, `score_ppm` where
    * score_ppm = 150000 + (850000 * Σ_{(s,node)∈E} (1000000 div outdeg(s)))
    * div 1000000 — i.e. fixed-point 0.15 + 0.85·Σ 1/outdeg(src), the first
    * PageRank iteration from a uniform unit distribution. Edges must be
    * distinct (dedupe upstream if the source multigraph means repeated
    * edges to carry multiplicity — for citation/link dedup you usually
    * want them collapsed). */
  def pushRound(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).cast(LongType).as("src"),
      col(dstCol).cast(LongType).as("dst"))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    e.join(outdeg, "src")
      .withColumn("contrib", call_function("div", lit(1000000L), col("outdeg")))
      .groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("in_edges"), sum(col("contrib")).as("mass"))
      .select(
        col("node"),
        col("in_edges"),
        (lit(150000L) +
          call_function("div", lit(850000L) * col("mass"), lit(1000000L)))
          .as("score_ppm"))
  }
}
