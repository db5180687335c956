package graft

import graft.schema.JsonSchemaInference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property tests for the inference algorithm (SURVEY.md §5): generated JSON
 * documents must (a) parse under their own inferred schema in FAILFAST, and
 * (b) parse under the Merge-mode schema of any sample containing them —
 * i.e. inference accepts its own value and merging only widens.
 *
 * The generator produces documents the reference itself can process:
 * arrays are homogeneous per the first-element-only inference rule (the
 * reference deliberately mis-schematizes heterogeneous arrays and then
 * fails conversion — covered by a dedicated unit test instead).
 */
class InferencePropertySpec extends AnyFunSuite with SparkSpec {

  private val scalarGen: Gen[String] = Gen.oneOf(
    Gen.chooseNum(Int.MinValue, Int.MaxValue).map(_.toString),
    Gen.chooseNum(Long.MinValue, Long.MaxValue).suchThat(v => v > Int.MaxValue || v < Int.MinValue).map(_.toString),
    Gen.const("12345678901234567890123456789"), // BigInteger -> string schema
    Gen.chooseNum(-1e9, 1e9).map(d => f"$d%.4f"),
    Gen.oneOf("true", "false", "null"),
    Gen.alphaNumStr.map(s => "\"" + s + "\""))

  private def arrayGen(depth: Int): Gen[String] = for {
    elemGen <- Gen.oneOf(
      Gen.chooseNum(-1000, 1000).map(_.toString), // uniform int32 elements
      Gen.alphaNumStr.map(s => "\"" + s + "\""),
      if (depth > 0) objectGen(depth - 1) else Gen.alphaNumStr.map(s => "\"" + s + "\""))
    n <- Gen.chooseNum(0, 4)
    elems <- Gen.listOfN(n, elemGen)
  } yield elems.mkString("[", ", ", "]")

  private def valueGen(depth: Int): Gen[String] =
    if (depth <= 0) scalarGen
    else Gen.frequency(
      5 -> scalarGen,
      2 -> arrayGen(depth - 1),
      3 -> objectGen(depth - 1))

  private def objectGen(depth: Int): Gen[String] = for {
    n <- Gen.chooseNum(0, 4)
    keys <- Gen.listOfN(n, Gen.identifier.map(_.take(8))).map(_.distinct)
    vals <- Gen.listOfN(keys.size, valueGen(depth))
  } yield keys.zip(vals).map { case (k, v) => "\"" + k + "\": " + v }.mkString("{", ", ", "}")

  private def samples(n: Int): Seq[String] = {
    val g = objectGen(3)
    Iterator.from(0)
      .map(i => g.apply(Gen.Parameters.default, rng.Seed(42L + i)))
      .flatten.take(n).toSeq
  }

  private val docs = samples(40)

  test("every generated document parses under its own inferred schema (FAILFAST)") {
    import spark.implicits._
    docs.foreach { doc =>
      val dt = JsonSchemaInference.inferDataType(doc)
      dt match {
        case st: StructType =>
          val parsed = Seq(doc).toDF("j")
            .select(from_json(col("j"), st, Map("mode" -> "FAILFAST")).as("v"))
            .select(col("v.*"))
          parsed.collect() // FAILFAST: any mismatch throws
        case other => fail(s"object doc inferred as $other: $doc")
      }
    }
  }

  test("the Merge-mode schema of the whole sample parses every document") {
    import spark.implicits._
    val merged = JsonSchemaInference.inferFromSample(docs).get.asInstanceOf[StructType]
    val parsed = docs.toDF("j")
      .select(from_json(col("j"), merged, Map("mode" -> "FAILFAST")).as("v"))
    assert(parsed.filter(col("v").isNull).count() === 0)
  }

  test("merge is idempotent and never narrows on the generated sample") {
    val types = docs.map(JsonSchemaInference.inferDataType(_))
    types.foreach(t => assert(JsonSchemaInference.mergeTypes(t, t) === t))
    val merged = types.reduce(JsonSchemaInference.mergeTypes)
    // Merging the merged schema with any individual schema is a no-op.
    types.foreach(t => assert(JsonSchemaInference.mergeTypes(merged, t) === merged))
  }

  test("all inferred struct fields are nullable, recursively") {
    def check(dt: DataType): Unit = dt match {
      case st: StructType =>
        st.fields.foreach { f => assert(f.nullable, f.name); check(f.dataType) }
      case ArrayType(et, containsNull) =>
        assert(containsNull); check(et)
      case _ => ()
    }
    docs.foreach(d => check(JsonSchemaInference.inferDataType(d)))
  }
}
