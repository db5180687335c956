package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Referential-integrity audit — the pre-ingestion join-key health check:
 * how many child rows reference a missing parent (orphans, which silently
 * vanish from inner joins downstream), and how many parents have no
 * children (which silently vanish from the child-side rollups).
 *
 * Scale shape: two un-hinted anti semi-joins on the key columns — plain
 * AQE-planned shuffle/broadcast equi joins at any size — and bounded
 * 1-row aggregates combined metadata-side. No full-width rows move: both
 * inputs are projected to their single key column before anything joins,
 * so the shuffles carry 8-byte keys.
 */
object Audit {

  /** One-row audit of the child.childKey -> parent.parentKey reference.
    * Output columns: n_child, n_child_keys (distinct non-null),
    * n_child_null (rows with a NULL key — counted separately, never as
    * orphans, the SQL join convention), n_orphan (child rows whose
    * non-null key has no parent), n_orphan_keys, n_parent,
    * n_childless_parents. */
  def fkAudit(child: DataFrame, childKey: String, parent: DataFrame, parentKey: String): DataFrame = {
    val c = child.select(col(childKey).as("__ck"))
    val p = parent.select(col(parentKey).as("__pk"))
    val childStats = c.agg(
      count(lit(1)).as("n_child"),
      count_distinct(col("__ck")).as("n_child_keys"),
      sum(col("__ck").isNull.cast("long")).as("n_child_null"))
    val orphanStats = c.filter(col("__ck").isNotNull)
      .join(p, col("__ck") === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("n_orphan"), count_distinct(col("__ck")).as("n_orphan_keys"))
    val parentStats = p.agg(count(lit(1)).as("n_parent"))
    val childless = p
      .join(c.filter(col("__ck").isNotNull), col("__pk") === col("__ck"), "left_anti")
      .agg(count(lit(1)).as("n_childless_parents"))
    childStats
      .crossJoin(broadcast(orphanStats))
      .crossJoin(broadcast(parentStats))
      .crossJoin(broadcast(childless))
  }
}
