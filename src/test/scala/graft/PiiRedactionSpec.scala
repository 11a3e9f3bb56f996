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

  test("native piiStats == piiCount x3 + redactPii on adversarial rows") {
    // rows mixing all three PII kinds, overlap bait (digit runs touching
    // dotted quads, emails with digit local parts), and clean prose
    val rows = Seq(
      "mail a.b+c@sub.example.org or 9.8.7.6 call +1 415 555 0123",
      "x1@y.co +44 20 7946 0958 10.0.0.1 x2@y.co 10.0.0.2",
      "+1 415 555 0123 at 10.0.0.1",
      "user1234@host99.example.com then 255.255.255.255",
      "digits 0123456789 dots 1.2.3.4.5.6.7.8 plus + nothing",
      "the 3 quick foxes jumped 12 times at noon",
      "", " ", "@", "+1 2", "1.2.3.4", "a@b.co")
    val df = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    val native = df.select(col("id"), piiStats(col("t")).as("p"))
      .select(col("id"), col("p.n_emails"), col("p.n_ips"),
        col("p.n_phones"), col("p.redacted"))
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val decl = df.select(col("id"),
        piiCount(col("t"), EmailRe).as("e"), piiCount(col("t"), Ipv4Re).as("i"),
        piiCount(col("t"), PhoneRe).as("p"), redactPii(col("t")).as("r"))
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(native === decl)
  }
}
