package graft

import graft.transform.ExpandJson
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Driver contract — see /root/repo/SURVEY.md §7 + FIXTURES.md.
 *
 * Every query here is written for 100 TB scale even though it is verified at
 * sf0.01: filters/projections sit directly on the parquet scan (pushdown),
 * small dimension tables are broadcast explicitly, aggregations are partial
 * (map-side combine comes free from groupBy/agg), and nothing collects to
 * the driver.
 *
 * Determinism contract with the DuckDB oracle: double-typed aggregates are
 * computed as CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) in BOTH engines
 * — decimal sums are exact and order-independent, so hashes match regardless
 * of row/partition order (a plain double SUM differs in the last ulps
 * between engines and can flip a rounding boundary).
 */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    // The testdata's events.ts is parquet TIMESTAMP(NANOS), which Spark only
    // reads via this legacy conf (as a long of epoch-nanos). Runtime-settable,
    // so set it here — works with any session the driver passes in.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/$name.parquet")
  }

  /** Exact, order-independent sum of a double column (see class doc). */
  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * SURVEY.md §7.2: expand events.props (JSON text) -> typed struct with
    * the reference's int32 inference, then aggregate on the parsed field. */
  def entry(spark: SparkSession): DataFrame =
    queries("ej_field_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ------------------------------------------------------------------
    // ExpandJson core (the reference's own capability, SURVEY.md §2.1)
    // ------------------------------------------------------------------

    // Whole-value expansion (schemaless path): props JSON -> struct<k:int>
    "ej_whole" -> ((s, dir) => {
      t(s, dir, "events")
        .transform(ExpandJson.whole("props"))
        .select(col("event_id"), col("props.k").as("k"))
    }),

    // Per-field expansion (with-schema path) + aggregation on parsed field.
    // The flagship: inference must produce int32 k (ExpandJson.java:203-206).
    "ej_field_agg" -> ((s, dir) => {
      t(s, dir, "events")
        .transform(ExpandJson.onFields(Seq("props")))
        .groupBy(col("event_type"))
        .agg(
          dsum(col("props.k")).as("sum_k"),
          count(lit(1)).as("n"))
    }),

    // ------------------------------------------------------------------
    // Relational operator coverage (engine capability, SURVEY.md §2.2)
    // ------------------------------------------------------------------

    // Aggregation with multiple measures (TPC-H Q1 shape). Partial aggs +
    // single shuffle on the two low-cardinality group keys.
    "q1_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast(DecimalType(18, 4)) *
            (lit(1).cast(DecimalType(18, 4)) - col("l_discount").cast(DecimalType(18, 4))))
            .cast(DoubleType).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // Filter + projection — both must reach the parquet scan (PushedFilters
    // / pruned ReadSchema in explain).
    "q2_filter" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-06-01").cast(TimestampType) &&
          col("l_discount") > 0.05 && col("l_quantity") < 25)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"))
    }),

    // Multi-way join + agg. nation is tiny -> broadcast (no shuffle of the
    // fact side for that join); orders<->customer shuffles on the key.
    "q3_join_agg" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
    }),

    // Global top-k: Spark plans TakeOrderedAndProject — no full sort, each
    // partition keeps k rows. Tie-broken for determinism.
    "q4_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .limit(10)
    }),

    // Window function: per-customer top-3 orders by price (deterministic
    // tie-break on key). One shuffle on the partition key.
    "q5_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rnk"))
    }),

    // Anti join: customers with no orders (NOT EXISTS).
    "q6_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // Semi join: customers with at least one order above threshold (EXISTS).
    "q7_semi" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 1000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"))
    }),

    // Distinct aggregation: exact + count(*) per group.
    "q8_distinct" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("users"), count(lit(1)).as("n"))
    }),

    // Set operation: EXCEPT (hash-based, shuffles on full row).
    "q9_except" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      c.except(sup)
    }),

    // Grouping sets / rollup over a dimension hierarchy.
    "q10_rollup" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"))
        .select(coalesce(col("r_name"), lit("ALL")).as("region_name"),
          coalesce(col("n_name"), lit("ALL")).as("nation_name"), col("n_cust"))
    }),

    // Time-bucketed aggregation (the batch shape of a tumbling window).
    // ts arrives as epoch-nanos long (see t()); hour bucket = integer
    // division — stays in whole-stage codegen, no timestamp conversion.
    "q11_hourly" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy((expr("ts div 3600000000000") * 3600).as("bucket_s"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .select(col("bucket_s"), col("event_type"), col("n"), col("total_value"))
    }),

    // ------------------------------------------------------------------
    // LLM-data-pipeline operators (north star, SURVEY.md §2.2)
    // ------------------------------------------------------------------

    // Exact dedup: hash-groupBy on content; keeps lowest doc_id per text.
    "dedup_exact" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
        .select(col("keep_id"), col("n_dups"))
    }),

    // Text analysis: token/char/uniq statistics, all-integer (exact).
    "text_stats" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      t(s, dir, "documents").select(
        col("doc_id"),
        length(col("text")).as("n_chars_actual"),
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_uniq"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "ej_whole" ->
      """SELECT event_id, CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS INTEGER) AS k
        |FROM events""".stripMargin,
    "ej_field_agg" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS INTEGER) AS DECIMAL(18,4))) AS DOUBLE) AS sum_k,
        |  count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter" ->
      """SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-06-01' AND l_discount > 0.05 AND l_quantity < 25""".stripMargin,
    "q3_join_agg" ->
      """SELECT n_name, count(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q4_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_window" ->
      """SELECT o_custkey, o_orderkey, rnk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) WHERE rnk <= 3""".stripMargin,
    "q6_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q7_semi" ->
      """SELECT c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 1000)""".stripMargin,
    "q8_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS users, count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,
    "q9_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,
    "q10_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region_name,
        |  coalesce(n_name, 'ALL') AS nation_name, count(*) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin,
    "q11_hourly" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket_s, event_type,
        |  count(*) AS n,
        |  CAST(SUM(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY text""".stripMargin,
    "text_stats" ->
      """SELECT doc_id, length(text) AS n_chars_actual,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_distinct(string_split(text, ' '))) AS n_uniq
        |FROM documents""".stripMargin
  )
}
