package graft

import graft.functions.{FastText, TextFunctions => TF}
import graft.sparkbridge.GraftSqlFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The kernel expressions exposed as SQL functions must behave exactly like
  * their Column API (FastText) counterparts. */
class SqlFunctionsSpec extends AnyFunSuite with SparkSpec {

  test("SQL surface matches the Column API on corpus data") {
    GraftSqlFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50).createOrReplaceTempView("docs_sql")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_jaccard(graft_shingles(text, 4), graft_shingles(text, 4)) AS self_jac,
        |  graft_simhash32(graft_xhash32_array(graft_shingles(text, 4))) AS sim,
        |  graft_minhash_sig(graft_hashed_shingles(text, 4), 16) AS sig
        |FROM docs_sql""".stripMargin)
    val viaCols = spark.table("docs_sql").select(
      col("doc_id"),
      FastText.jaccardSorted(FastText.sortedShingles(col("text"), 4),
        FastText.sortedShingles(col("text"), 4)).as("self_jac"),
      FastText.simhash32(FastText.xhash32Array(FastText.sortedShingles(col("text"), 4))).as("sim"),
      FastText.minhashSig(FastText.hashedShingles(col("text"), 4), 16).as("sig"))
    assert(viaSql.exceptAll(viaCols).count() === 0)
    assert(viaCols.exceptAll(viaSql).count() === 0)
    assert(viaSql.filter(col("self_jac") =!= 1.0).count() === 0)
  }

  test("graft_token_entropy matches the Column API kernel") {
    GraftSqlFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50).createOrReplaceTempView("docs_te_sql")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_token_entropy(text) AS te FROM docs_te_sql")
    val viaCols = spark.table("docs_te_sql").select(
      col("doc_id"), FastText.tokenEntropyBits(col("text")).as("te"))
    assert(viaSql.exceptAll(viaCols).count() === 0)
    assert(viaCols.exceptAll(viaSql).count() === 0)
  }

  test("cross-engine dot product callable from SQL") {
    GraftSqlFunctions.register(spark)
    import spark.implicits._
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs_sql")
    val r = spark.sql("SELECT graft_dot(a, b) AS d FROM vecs_sql").as[Double].head()
    assert(r === 11.0)
  }

  test("sorted-array membership callable from SQL") {
    GraftSqlFunctions.register(spark)
    import spark.implicits._
    Seq((Seq(1L, 5L, 9L), 5L), (Seq(1L, 5L, 9L), 4L)).toDF("arr", "v")
      .createOrReplaceTempView("sorted_sql")
    val r = spark.sql("SELECT graft_sorted_contains(arr, v) AS c FROM sorted_sql ORDER BY v")
      .as[Boolean].collect().toSeq
    assert(r === Seq(false, true))
  }

  test("coverage counts callable from SQL with a literal reference array") {
    GraftSqlFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(20).createOrReplaceTempView("docs_cov_sql")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_coverage(text, 3, array('the', 'he ', 'a b')) AS cc
        |FROM docs_cov_sql""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaCols = spark.table("docs_cov_sql")
      .select(col("doc_id"),
        FastText.coverageCounts(col("text"), 3, Seq("the", "he ", "a b")).as("cc"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql === viaCols)
    assert(viaSql.values.exists(v => v(1) > 0), "reference grams never hit — fixture mismatch")
  }

  test("non-literal k is rejected with a clear message") {
    GraftSqlFunctions.register(spark)
    val e = intercept[Exception](
      spark.sql("SELECT graft_shingles('abc', length('xx'))").collect())
    assert(e.getMessage.contains("literal integer"))
  }
}
