package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Expectation, Expectations}

/** Contract spec for the declarative quality gate: routing, null
  * semantics (retain-on-true — NULL predicate quarantines, unlike SQL
  * CHECK), sorted violation names, and the one-pass report. The oracle
  * gate (q97) proves the full quarantine row set against DuckDB.
  */
class ExpectationsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rules = Seq(
    Expectation("b_pos", col("v") > 0),
    Expectation("a_small", col("v") < 100))

  test("split routes rows; quarantine carries SORTED failed-rule names") {
    val df = Seq((1L, 50), (2L, -5), (3L, 500), (4L, 7)).toDF("id", "v")
    val (valid, quarantine) = Expectations.split(df, rules)
    assert(valid.select("id").as[Long].collect().sorted === Array(1L, 4L))
    assert(valid.columns.toSeq === Seq("id", "v"),
      "valid side keeps the original schema exactly")
    val q = quarantine.select(col("id"),
        array_join(col("violations"), ",").as("v"))
      .as[(Long, String)].collect().toMap
    assert(q === Map(2L -> "b_pos", 3L -> "a_small"))
  }

  test("NULL predicate is a violation (retain-on-true), and a row can fail every rule") {
    val df = Seq((1L, Some(50)), (2L, None)).toDF("id", "v")
    val (valid, quarantine) = Expectations.split(df, rules)
    assert(valid.select("id").as[Long].collect() === Array(1L))
    // null v makes BOTH predicates NULL → both quarantine, sorted a<b
    assert(quarantine.select(array_join(col("violations"), ","))
      .as[String].collect() === Array("a_small,b_pos"))
  }

  test("report counts per rule in one pass with the row total") {
    val df = Seq(50, -5, 500, -1, 7).toDF("v")
    val got = Expectations.report(df, rules)
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("a_small", 1L, 5L), ("b_pos", 2L, 5L)))
  }

  test("duplicate and comma-bearing rule names are rejected") {
    val df = Seq(1).toDF("v")
    intercept[IllegalArgumentException] {
      Expectations.annotate(df, Seq(
        Expectation("x", col("v") > 0), Expectation("x", col("v") < 9)))
    }
    intercept[IllegalArgumentException] {
      Expectations.annotate(df, Seq(Expectation("a,b", col("v") > 0)))
    }
    intercept[IllegalArgumentException] {
      Expectations.annotate(df, Seq.empty)
    }
  }

  test("annotate refuses inputs that already carry its output columns") {
    intercept[IllegalArgumentException] {
      Expectations.annotate(Seq((1, true)).toDF("v", "is_valid"), rules)
    }
  }
}
