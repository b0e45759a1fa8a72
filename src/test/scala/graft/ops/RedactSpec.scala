package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Redaction semantics: each category, replace-all, ordering (emails
  * before IPs), counts, and identity on clean text.
  */
class RedactSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(Redact.redactPii(col("t"))).head().getString(0)

  test("emails are scrubbed, including multiple per row") {
    assert(redact("mail a.b+c@ex-1.example.org and d@e.io now") ==
      "mail <EMAIL> and <EMAIL> now")
  }

  test("ipv4 and phone forms are scrubbed") {
    assert(redact("host 192.168.0.1 call 555-123-4567 or +44 123-456-7890 x") ==
      "host <IP> call <PHONE> or +44 <PHONE> x")
  }

  test("email redaction runs before the IP pattern can chew a dotted domain") {
    // the local part + numeric-dotted domain would partially match the
    // IP pattern if order were reversed
    assert(redact("u@1.2.3.4m.com ok") == "<EMAIL> ok")
  }

  test("clean text is untouched; counts are per-category") {
    val row = Seq("plain text 42 with no pii at all").toDF("t")
      .select(Redact.redactPii(col("t")).as("c"),
        Redact.emailCount(col("t")).as("e"),
        Redact.ipCount(col("t")).as("i"),
        Redact.phoneCount(col("t")).as("p")).head()
    assert(row.getString(0) == "plain text 42 with no pii at all")
    assert((row.getLong(1), row.getLong(2), row.getLong(3)) == ((0L, 0L, 0L)))
  }

  test("counts see every occurrence") {
    val row = Seq("a@b.co c@d.co 1.2.3.4 555-000-1111 555-222-3333").toDF("t")
      .select(Redact.emailCount(col("t")), Redact.ipCount(col("t")),
        Redact.phoneCount(col("t"))).head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((2L, 1L, 2L)))
  }
}
