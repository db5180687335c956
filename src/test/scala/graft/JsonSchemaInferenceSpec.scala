package graft

import graft.schema.JsonSchemaInference
import graft.schema.JsonSchemaInference._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Inference-rule fidelity vs the reference (ExpandJson.java:191-258) and
  * the FIXTURES.md A-series fixtures. Pure driver-side — no SparkSession. */
class JsonSchemaInferenceSpec extends AnyFunSuite {

  private def infer(json: String): DataType = JsonSchemaInference.inferDataType(json)

  // A1. SIMPLE_JSON (ExpandJsonTest.java:25-31)
  test("simple object: string/int/boolean, int32 not int64, field order kept") {
    val dt = infer("""{"stringValue": "String value", "numberValue": 42, "booleanValue": true}""")
    assert(dt === StructType(Seq(
      StructField("stringValue", StringType),
      StructField("numberValue", IntegerType),
      StructField("booleanValue", BooleanType))))
  }

  // A3. bare scalars (ExpandJsonTest.java:105-155)
  test("bare JSON string -> StringType")  { assert(infer("\"key\"") === StringType) }
  test("bare int -> IntegerType")         { assert(infer("42") === IntegerType) }

  // number ladder (ExpandJson.java:199-217)
  test("long-ranged integral -> LongType")       { assert(infer("9999999999") === LongType) }
  test("int-boundary values stay int32")         {
    assert(infer(Int.MaxValue.toString) === IntegerType)
    assert(infer(Int.MinValue.toString) === IntegerType)
    assert(infer((Int.MaxValue.toLong + 1).toString) === LongType)
  }
  test("BigInteger -> StringType")               { assert(infer("9223372036854775808") === StringType) }
  test("non-integral -> DoubleType")             { assert(infer("1.5") === DoubleType) }
  test("JSON null -> StringType (ExpandJson.java:193-194)") { assert(infer("null") === StringType) }

  // arrays (ExpandJson.java:219-222)
  test("empty array -> array<string>") {
    assert(infer("[]") === ArrayType(StringType, containsNull = true))
  }
  test("array inference uses FIRST element only") {
    assert(infer("""[1, "a"]""") === ArrayType(IntegerType, containsNull = true))
    assert(infer("""["a", 1]""") === ArrayType(StringType, containsNull = true))
  }
  test("array of objects") {
    assert(infer("""[{"a": 1}]""") ===
      ArrayType(StructType(Seq(StructField("a", IntegerType))), containsNull = true))
  }

  // A4. NESTED_JSON (ExpandJsonTest.java:59; FIXTURES.md A4)
  private val nested =
    """{"numberValue": 42, "level1": {"level2": {"level3Number": 24, "level3String": "foo"}}}"""

  test("nested object structure") {
    val dt = infer(nested)
    assert(dt === StructType(Seq(
      StructField("numberValue", IntegerType),
      StructField("level1", StructType(Seq(
        StructField("level2", StructType(Seq(
          StructField("level3Number", IntegerType),
          StructField("level3String", StringType))))))))))
  }

  test("schema naming: bottom-up, no '1' suffix (ExpandJson.java:233-245)") {
    val (named, rootName) = assignSchemaNames(infer(nested), "my.prefix.MyRecord")
    // Root struct is the THIRD distinct struct named (post-order).
    assert(rootName === Some("my.prefix.MyRecord3"))
    val st = named.asInstanceOf[StructType]
    val level1 = st("level1")
    assert(level1.metadata.getString(SchemaNameKey) === "my.prefix.MyRecord2")
    val level2 = level1.dataType.asInstanceOf[StructType]("level2")
    // Innermost struct gets the bare prefix.
    assert(level2.metadata.getString(SchemaNameKey) === "my.prefix.MyRecord")
  }

  test("schema naming: structurally identical structs share one name") {
    val dt = infer("""{"a": {"x": 1}, "b": {"x": 2}, "c": {"y": 3}}""")
    val (named, rootName) = assignSchemaNames(dt, "p")
    val st = named.asInstanceOf[StructType]
    assert(st("a").metadata.getString(SchemaNameKey) === "p")
    assert(st("b").metadata.getString(SchemaNameKey) === "p")  // shared
    assert(st("c").metadata.getString(SchemaNameKey) === "p2")
    assert(rootName === Some("p3"))
  }

  test("naming state accumulates across inferences (per-instance semantics)") {
    val st = new NamingState("p")
    val (_, n1) = assignSchemaNames(infer("""{"x": 1}"""), st)
    val (_, n2) = assignSchemaNames(infer("""{"x": 2}"""), st)   // same shape
    val (_, n3) = assignSchemaNames(infer("""{"y": 1}"""), st)   // new shape
    assert(n1 === Some("p")); assert(n2 === Some("p")); assert(n3 === Some("p2"))
  }

  // merge (batch extension, SURVEY.md §1.4)
  test("merge: numeric widening") {
    assert(mergeTypes(IntegerType, LongType) === LongType)
    assert(mergeTypes(DoubleType, IntegerType) === DoubleType)
    assert(mergeTypes(LongType, DoubleType) === DoubleType)
  }
  test("merge: struct union preserves first-seen field order") {
    val a = infer("""{"a": 1, "b": "x"}""").asInstanceOf[StructType]
    val b = infer("""{"b": "y", "c": true, "a": 99999999999}""").asInstanceOf[StructType]
    val m = mergeTypes(a, b).asInstanceOf[StructType]
    assert(m.fieldNames.toSeq === Seq("a", "b", "c"))
    assert(m("a").dataType === LongType)
    assert(m("c").dataType === BooleanType)
  }
  test("merge: incompatible -> string fallback") {
    assert(mergeTypes(IntegerType, BooleanType) === StringType)
    assert(mergeTypes(ArrayType(IntegerType, true), IntegerType) === StringType)
  }
  test("inferFromSample FirstRow vs Merge") {
    val rows = Seq("""{"a": 1}""", """{"a": 1.5, "b": "x"}""")
    assert(inferFromSample(rows, FirstRow) ===
      Some(StructType(Seq(StructField("a", IntegerType)))))
    assert(inferFromSample(rows, Merge) ===
      Some(StructType(Seq(StructField("a", DoubleType), StructField("b", StringType)))))
    assert(inferFromSample(Nil) === None)
  }

  test("Avro reconstruction: named records from metadata, counter semantics, shared defs") {
    import com.fasterxml.jackson.databind.ObjectMapper
    val dt = infer(
      """{"a": {"x": 1}, "b": {"x": 2}, "c": {"y": "s"}, "arr": [{"x": 3}]}""")
    val (named, rootName) = JsonSchemaInference.assignSchemaNames(dt, "com.acme.Rec")
    // Counter: innermost-first (bottom-up), identical field lists share,
    // no "1" suffix: {x} -> Rec, {y} -> Rec2, root -> Rec3.
    assert(rootName === Some("com.acme.Rec3"))
    val field = StructField("value", named, nullable = true,
      new MetadataBuilder()
        .putString(JsonSchemaInference.SchemaNameKey, rootName.get).build())
    val json = graft.schema.AvroSchema.forField(field)
    val root = new ObjectMapper().readTree(json)
    // Nullable top level -> ["null", record]
    assert(root.isArray && root.get(0).asText() == "null")
    val rec = root.get(1)
    assert(rec.get("type").asText() == "record")
    assert(rec.get("name").asText() == "com.acme.Rec3")
    val fields = rec.get("fields")
    def fieldType(i: Int) = fields.get(i).get("type").get(1) // strip "null"
    // a: first occurrence -> full record definition named Rec
    assert(fieldType(0).get("type").asText() == "record")
    assert(fieldType(0).get("name").asText() == "com.acme.Rec")
    assert(fieldType(0).get("fields").get(0).get("name").asText() == "x")
    assert(fieldType(0).get("fields").get(0).get("type").get(1).asText() == "int")
    // b: structurally identical -> a NAME REFERENCE, not a second definition
    assert(fieldType(1).asText() == "com.acme.Rec")
    // c: distinct field list -> Rec2
    assert(fieldType(2).get("name").asText() == "com.acme.Rec2")
    // arr: array whose element struct shares Rec by reference
    assert(fieldType(3).get("type").asText() == "array")
    assert(fieldType(3).get("items").get(1).asText() == "com.acme.Rec")
  }

  test("Avro reconstruction: unnamed struct -> clear error") {
    val e = intercept[IllegalArgumentException] {
      graft.schema.AvroSchema.forField(
        StructField("v", StructType(Seq(StructField("x", IntegerType)))))
    }
    assert(e.getMessage.contains("schemaNamePrefix"))
  }
}
