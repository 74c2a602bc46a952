package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Pii

class PiiSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val fixture = Seq(
    (1L, "mail alice@example.com and bob.smith+tag@sub.domain.org end"),
    (2L, "server 192.168.1.254 and 10.0.0.1 up"),
    (3L, "call 555-123-4567 maybe"),
    (4L, "mixed a@b.io at 127.0.0.1 dial 800-555-0199"),
    (5L, "clean text with no sensitive content at all"),
    // non-matches: word-adjacent digits break \b, bare domain has no @
    (6L, "order x555-123-45678 visit example.com v1.2.3.4.5"))
    .toDF("doc_id", "text")

  test("annotate counts each category; clean text counts zero") {
    val got = Pii.annotate(fixture, "text")
      .select("doc_id", "n_email", "n_ipv4", "n_phone")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((2L, 0L, 0L)))
    assert(got(2L) == ((0L, 2L, 0L)))
    assert(got(3L) == ((0L, 0L, 1L)))
    assert(got(4L) == ((1L, 1L, 1L)))
    assert(got(5L) == ((0L, 0L, 0L)))
    // "x555-..." has a word char before the boundary so no phone match;
    // bare "example.com" has no '@' so no email match; "v1.2.3.4.5" DOES
    // contain a boundary-valid 4-octet run ("2.3.4.5") — the IP pattern
    // flags it by design: over-redaction beats leaking
    assert(got(6L)._1 == 0L && got(6L)._3 == 0L)
    assert(got(6L)._2 == 1L)
  }

  test("redact replaces every match and is idempotent") {
    val red = Pii.redact(fixture, "text", "redacted")
    val byId = red.select("doc_id", "redacted").as[(Long, String)]
      .collect().toMap
    assert(byId(1L) == "mail <EMAIL> and <EMAIL> end")
    assert(byId(2L) == "server <IP> and <IP> up")
    assert(byId(3L) == "call <PHONE> maybe")
    assert(byId(4L) == "mixed <EMAIL> at <IP> dial <PHONE>")
    assert(byId(5L) == fixture.where($"doc_id" === 5L)
      .select("text").as[String].head())
    // idempotency: redacting redacted text changes nothing (tokens
    // contain no matchable content)
    val twice = Pii.redact(red.select($"doc_id", $"redacted".as("text")),
      "text", "redacted")
      .select("doc_id", "redacted").as[(Long, String)].collect().toMap
    assert(twice == byId)
    // and nothing sensitive survives
    val counts = Pii.annotate(red.select($"redacted".as("text")), "text")
      .agg(org.apache.spark.sql.functions.sum(
        $"n_email" + $"n_ipv4" + $"n_phone"))
      .as[Long].head()
    assert(counts == 0L)
  }

  test("annotate + redact stay narrow: no shuffle anywhere in the plan") {
    val p = Pii.redact(Pii.annotate(
        Tables.documents(spark, SparkTestSession.sfTiny), "text"),
        "text", "redacted")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"PII chain must be map-only:\n$p")
  }

  test("column-collision guards refuse to overwrite user data") {
    intercept[IllegalArgumentException] {
      Pii.annotate(fixture.withColumn("n_email",
        org.apache.spark.sql.functions.lit(7L)), "text")
    }
    intercept[IllegalArgumentException] {
      Pii.redact(fixture.withColumn("redacted",
        org.apache.spark.sql.functions.lit("x")), "text", "redacted")
    }
  }
}
