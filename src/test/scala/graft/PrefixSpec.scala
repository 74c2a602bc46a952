package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Prefix

/** [[Prefix.groupedCumsum]] must be bit-identical to the window cumsum
  * it replaces, for ANY partition count — including partition counts
  * far above the row count (forcing empty partitions and single-row
  * partitions) and far below the group count (forcing many groups per
  * partition), plus whole-corpus single-group data where the offset
  * walk crosses every partition.
  */
class PrefixSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def windowed(df: org.apache.spark.sql.DataFrame, group: String,
      value: String, order: Seq[org.apache.spark.sql.Column]) = {
    val w = Window.partitionBy(col(group)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum", sum(col(value).cast("long")).over(w))
  }

  test("matches the window cumsum on a hand fixture at adversarial partition counts") {
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("b", 1L, 5L), ("b", 2L, 7L),
      ("c", 1L, 100L))
      .toDF("g", "id", "v")
    val want = windowed(df, "g", "v", Seq(col("id"))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    for (parts <- Seq(1, 2, 3, 7, 64)) {
      val got = Prefix.groupedCumsum(df, "g", "v", Seq(col("id")), "cum",
          numPartitions = parts)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
      assert(got === want, s"diverged at numPartitions=$parts")
    }
  }

  test("single giant group: offsets chain across every partition") {
    val df = (1L to 5000L).map(i => ("only", i, i % 7)).toDF("g", "id", "v")
    val got = Prefix.groupedCumsum(df, "g", "v", Seq(col("id")), "cum",
        numPartitions = 23)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    var run = 0L
    (1L to 5000L).foreach { i =>
      run += i % 7
      assert(got(i) === run, s"row $i")
    }
  }

  test("null group values form one group, like the window form") {
    val df = Seq((Some("a"), 1L, 1L), (None, 2L, 2L), (None, 3L, 3L),
      (Some("a"), 4L, 4L)).toDF("g", "id", "v")
    val want = windowed(df, "g", "v", Seq(col("id"))).collect()
      .map(r => (r.getLong(1), r.getLong(3))).toSet
    val got = Prefix.groupedCumsum(df, "g", "v", Seq(col("id")), "cum",
        numPartitions = 3)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
    assert(got === want)
  }

  test("property: equals window cumsum on random corpora and partition counts") {
    val rowGen = Gen.zip(Gen.oneOf("g1", "g2", "g3"), Gen.choose(0L, 50L))
    val gen = Gen.zip(Gen.nonEmptyListOf(rowGen), Gen.choose(1, 40))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withInitialSeed(3L),
      Prop.forAll(gen) { case (rows, parts) =>
        val df = rows.zipWithIndex
          .map { case ((g, v), i) => (g, i.toLong, v) }.toDF("g", "id", "v")
        val want = windowed(df, "g", "v", Seq(col("id"))).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
        val got = Prefix.groupedCumsum(df, "g", "v", Seq(col("id")), "cum",
            numPartitions = parts)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
        got == want
      })
    assert(res.passed, res.status.toString)
  }
}
