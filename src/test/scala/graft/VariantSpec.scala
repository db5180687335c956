package graft

import graft.transform.ExpandJson
import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Per-record dynamic schema mode (VariantType): the faithful analogue of
 * the reference's cache-free schemaless path (ExpandJson.java:100-101) —
 * every record carries its own inferred type, so heterogeneous shapes
 * coexist where the plan-time-schema modes would coerce or fail.
 */
class VariantSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("heterogeneous rows each keep their own shape") {
    val df = Seq(
      """{"k": 1}""",
      """{"x": "y", "nested": {"a": true}}""",
      """[1, 2, 3]""",
      """42""",
      """"bare string"""").toDF("value")
    val out = df.transform(ExpandJson.wholeVariant("value"))
    assert(out.schema("value").dataType.typeName === "variant")
    val js = out.select(to_json(col("value"))).as[String].collect()
    assert(js.toSet === Set(
      """{"k":1}""",
      """{"nested":{"a":true},"x":"y"}""",
      """[1,2,3]""",
      "42",
      "\"bare string\""))
  }

  test("variant_get extracts typed fields; missing paths are null") {
    val df = Seq("""{"k": 7}""", """{"other": 1}""").toDF("value")
    val out = df.transform(ExpandJson.wholeVariant("value"))
      .select(variant_get(col("value"), "$.k", "int").as("k"))
    assert(out.as[Option[Int]].collect().toSet === Set(Some(7), None))
  }

  test("malformed JSON: default throws (FAILFAST analogue), permissive yields null") {
    val df = Seq("""{"k": 1}""", """{bad json""").toDF("value")
    val strict = df.transform(ExpandJson.wholeVariant("value"))
    assertThrows[SparkException](strict.collect())
    val perm = df.transform(ExpandJson.wholeVariant("value", permissive = true))
      .select(col("value").isNull.as("n")).as[Boolean].collect()
    assert(perm.count(identity) === 1)
  }

  test("variant mode rejects per-field config (schemaless-path guard)") {
    assertThrows[IllegalArgumentException](
      ExpandJson(fields = Seq("f"), variantMode = true))
  }

  test("dotted target crossing array<struct> parses each element (rewriteIn parity)") {
    val df = Seq(("u1", """{"k": 1}""", """{"k": 2}""")).toDF("id", "p1", "p2")
      .select(col("id"), array(
        struct(lit(11).as("eid"), col("p1").as("payload")),
        struct(lit(12).as("eid"), col("p2").as("payload"))).as("events"))
    val out = df.transform(ExpandJson.wholeVariant("events.payload"))
    assert(out.columns.toSeq === Seq("id", "events"), "rebuilt in place, no new column")
    val row = out.select(
      expr("transform(events, e -> e.eid)").as("eids"),
      expr("transform(events, e -> variant_get(e.payload, '$.k', 'int'))").as("ks"))
      .collect().head
    assert(row.getSeq[Int](0) === Seq(11, 12), "sibling fields kept per element")
    assert(row.getSeq[Int](1) === Seq(1, 2), "each element parsed to its own variant")
  }

  test("sibling columns and column order are preserved") {
    val df = Seq((1L, """{"k": 5}""", "keep")).toDF("id", "props", "tag")
    val out = df.transform(ExpandJson.wholeVariant("props"))
    assert(out.columns.toSeq === Seq("id", "props", "tag"))
    assert(out.select(col("id"), variant_get(col("props"), "$.k", "int"), col("tag"))
      .as[(Long, Int, String)].collect().toSeq === Seq((1L, 5, "keep")))
  }
}
