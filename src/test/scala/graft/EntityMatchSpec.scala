package graft

import graft.functions.EntityMatch
import org.apache.spark.sql.functions._

class EntityMatchSpec extends SparkSpec {

  import spark.implicits._

  private def pairs(rows: Seq[(Long, String)]): Map[(Long, Long), Long] =
    EntityMatch.hamming1Pairs(rows.toDF("id", "name"), "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("hamming1Pairs: one-char variants, exact dups, and nothing else") {
    val got = pairs(Seq(
      1L -> "Customer#000000001",
      2L -> "Customer#000000002", // dist 1 vs 1
      3L -> "Customer#000000011", // dist 1 vs 1, dist 2 vs 2
      4L -> "Customer#000000001", // exact dup of 1
      5L -> "Customer#00000001",  // one char SHORTER: insert, not substitution
      6L -> "Supplier#000000001"  // far away
    ))
    assert(got === Map(
      (1L, 2L) -> 1L, (1L, 3L) -> 1L, (1L, 4L) -> 0L,
      (2L, 4L) -> 1L, (3L, 4L) -> 1L))
  }

  test("hamming1Pairs matches brute force on real customer names") {
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_custkey").cast("long"), col("c_name"))
    val rows = cust.collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = (for {
      (i, a) <- rows; (j, b) <- rows
      if i < j && a.length == b.length
      d = a.zip(b).count { case (x, y) => x != y }
      if d <= 1
    } yield (i, j) -> d.toLong).toMap
    val got = pairs(rows.toSeq)
    assert(got === expected)
    assert(got.nonEmpty, "fixture must actually contain near-identical names")
  }

  test("hamming1Pairs: unicode and empty/null inputs are safe") {
    val got = pairs(Seq(1L -> "héllo", 2L -> "hállo", 3L -> "", 4L -> null, 5L -> "héllo!"))
    assert(got === Map((1L, 2L) -> 1L))
  }

  private def editPairs(rows: Seq[(Long, String)]): Map[(Long, Long), Long] =
    EntityMatch.edit1Pairs(rows.toDF("id", "name"), "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("edit1Pairs: substitutions, insertions, deletions, exact dups — nothing else") {
    val got = editPairs(Seq(
      1L -> "C1",
      2L -> "C10",  // insert vs 1
      3L -> "C2",   // substitute vs 1
      4L -> "C1",   // exact dup of 1
      5L -> "1",    // delete vs 1
      6L -> "C100", // insert vs 2, TWO inserts vs 1
      7L -> "",     // delete vs 5
      8L -> null
    ))
    assert(got === Map(
      (1L, 2L) -> 1L, (1L, 3L) -> 1L, (1L, 4L) -> 0L, (1L, 5L) -> 1L,
      (2L, 4L) -> 1L, (2L, 6L) -> 1L, (3L, 4L) -> 1L, (4L, 5L) -> 1L,
      (5L, 7L) -> 1L))
  }

  test("edit1Pairs matches brute force on variable-length derived ids") {
    val rows = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_custkey").cast("long"), concat(lit("C"), col("c_custkey").cast("string")))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = (for {
      (i, a) <- rows; (j, b) <- rows
      if i < j
      d = lev(a, b)
      if d <= 1
    } yield (i, j) -> d.toLong).toMap
    val got = editPairs(rows.toSeq)
    assert(got === expected)
    // The fixture must exercise the cross-length (indel) pairs that
    // distinguish this operator from hamming1Pairs.
    assert(got.keySet.exists { case (i, j) =>
      rows.toMap.apply(i).length != rows.toMap.apply(j).length })
  }
}
