package graft

import graft.operators.TextAnalysis._
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class PiiRedactionSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(redactPii(col("t"))).as[String].head()

  test("emails, IPs, and phones are each replaced with their typed tag") {
    assert(redact("mail a.b+c@sub.example.org now") === "mail <EMAIL> now")
    assert(redact("from 192.168.0.1 and 10.0.255.7") === "from <IP> and <IP>")
    assert(redact("call +1 415 555 0123 today") === "call <PHONE> today")
  }

  test("replace-all: every occurrence goes, not just the first") {
    assert(redact("a@b.co x a@b.co y a@b.co") === "<EMAIL> x <EMAIL> y <EMAIL>")
  }

  test("ordering: dotted quads are never half-eaten as phone digits") {
    assert(redact("+1 415 555 0123 at 10.0.0.1") === "<PHONE> at <IP>")
  }

  test("plain prose and bare numbers survive untouched") {
    val s = "the 3 quick foxes jumped 12 times at noon"
    assert(redact(s) === s)
  }

  test("piiCount counts matches on the raw text") {
    val n = Seq("a@b.co and c@d.org").toDF("t")
      .select(piiCount(col("t"), EmailRe)).as[Long].head()
    assert(n === 2L)
  }
}
