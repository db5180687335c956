package graft

import graft.functions.Contamination
import org.scalatest.funsuite.AnyFunSuite

class ContaminationSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("contaminatedDocs flags docs quoting the eval set, ignores clean docs") {
    val evalSet = Seq(
      (1000L, "What is the capital of France? Paris is the capital of France.")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      // Verbatim quotation of an eval span — must be flagged.
      (1L, "trivia dump: What is the capital of France? Paris is the capital of France. end"),
      // Shares topic words but no 16-char window — must NOT be flagged.
      (2L, "Paris, France: a travel guide to the capital's museums"),
      // Wholly unrelated.
      (3L, "def main(): return 42  # unit test fixture")
    ).toDF("doc_id", "text")
    val out = Contamination
      .contaminatedDocs(corpus, evalSet, "doc_id", "text", k = 16, minOverlap = 10)
      .as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(1L), out.toString)
    // The quoted span is ~47 shingle positions long; well past the floor.
    assert(out(1L) >= 10L)
  }

  test("contaminatedDocs: empty eval set flags nothing; null texts are dropped") {
    val evalSet = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val corpus = Seq((1L, "some document"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(Contamination
      .contaminatedDocs(corpus, evalSet, "doc_id", "text", k = 16, minOverlap = 1)
      .count() == 0)
  }
}
