package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** The corpus tables carry no PII, so redaction semantics are pinned here
  * on synthetic fixtures; the `redact_pii` oracle query proves the
  * identical regex chain runs engine-side over the real corpus. */
class PiiSpec extends SparkSpec {

  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("text")
      .select(TextFunctions.redactPii(col("text")))
      .head().getString(0)

  test("emails are redacted, including dotted and plus-tagged locals") {
    assert(redact("mail bob.smith+tag@sub.example.org now") == "mail <EMAIL> now")
    assert(redact("a@b.co") == "<EMAIL>")
  }

  test("phone-like digit runs are redacted, short numbers survive") {
    assert(redact("call +1 (555) 123-4567 today") == "call <PHONE> today")
    assert(redact("room 42, floor 3") == "room 42, floor 3")
  }

  test("IPv4 addresses are redacted") {
    assert(redact("from 192.168.0.1 port 80") == "from <IP> port 80")
  }

  test("email digits are not half-eaten by the phone pattern (order matters)") {
    assert(redact("user12345678@example.com") == "<EMAIL>")
  }

  test("repetition ratio: distinct text scores 0, repeated text scores high") {
    val df = Seq("a b c d", "a a a a", "x x y y").toDF("text")
      .select(TextFunctions.wordRepetitionRatio(col("text")).as("r"))
    val rs = df.collect().map(_.getDouble(0)).toSeq
    assert(rs(0) == 0.0)
    assert(rs(1) == 0.75)
    assert(rs(2) == 0.5)
  }
}
