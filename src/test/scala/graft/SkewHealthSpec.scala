package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewHealthSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("saltedJoin equals the plain join, inner and left") {
    val big = Tables.lineitem(spark, SparkTestSession.sfTiny)
      .select("l_orderkey", "l_partkey", "l_quantity")
    val small = Tables.part(spark, SparkTestSession.sfTiny)
      .select(col("p_partkey").as("l_partkey"), col("p_name"))
      .filter(col("l_partkey") % 2 === 0)

    val plainInner = big.join(small, Seq("l_partkey"))
    val saltedInner = Skew.saltedJoin(big, small, Seq("l_partkey"), salt = 7)
    assert(saltedInner.count() == plainInner.count())
    assert(saltedInner.agg(sum("l_quantity")).first().getDouble(0) ==
      plainInner.agg(sum("l_quantity")).first().getDouble(0))

    val plainLeft = big.join(small, Seq("l_partkey"), "left")
    val saltedLeft = Skew.saltedJoin(big, small, Seq("l_partkey"), salt = 7, "left")
    assert(saltedLeft.count() == plainLeft.count())
    assert(saltedLeft.filter(col("p_name").isNull).count() ==
      plainLeft.filter(col("p_name").isNull).count())
  }

  test("saltedCount matches plain groupBy count") {
    val li = Tables.lineitem(spark, SparkTestSession.sfTiny)
    val plain = li.groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedCount(li, Seq("l_returnflag"), salt = 5)
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("health views report volume, integrity, coverage; validate flags violations") {
    import java.sql.Timestamp
    val ts = Timestamp.valueOf("2025-06-01 10:00:00")
    val silver = Seq(
      (1, 2024, "DOG", Option("M5V"), true, true, ts),
      (2, 2024, "CAT", None, false, true, ts),
      (3, 2025, "DOG", Option("M4C"), true, false, ts))
      .toDF("_id", "Year", "ANIMAL_TYPE", "FSA", "FSA_VALID", "breed_mapped", "processed_ts")

    val h = graft.pipeline.Health.silverHealth(silver).first()
    assert(h.getAs[Long]("total_rows") == 3)
    assert(h.getAs[Long]("mapped_rows") == 2)
    assert(h.getAs[Long]("null_fsa_rows") == 1)
    assert(math.abs(h.getAs[Double]("pct_mapped") - 200.0 / 3.0) < 1e-9)

    val checks = graft.pipeline.Health.validate(silver)
    assert(checks.values.forall(identity), s"expected all healthy: $checks")

    // a duplicated id and an out-of-whitelist type flip their checks
    val bad = silver.unionByName(
      Seq((1, 2024, "BIRD", Option("M5V"), true, true, ts))
        .toDF("_id", "Year", "ANIMAL_TYPE", "FSA", "FSA_VALID", "breed_mapped", "processed_ts"))
    val badChecks = graft.pipeline.Health.validate(bad)
    assert(!badChecks("ids_unique") && !badChecks("no_duplicate_ids"))
    assert(!badChecks("animal_type_whitelisted"))

    val bh = graft.pipeline.Health.bronzeHealth(
      silver.withColumn("ingestion_ts", col("processed_ts"))).first()
    assert(bh.getAs[Long]("invalid_fsa_rows") == 1)
    assert(bh.getAs[Long]("distinct_years") == 2)
  }

  test("keyHistogram surfaces the heaviest keys with shares") {
    val li = Tables.lineitem(spark, SparkTestSession.sfTiny)
    val hist = Skew.keyHistogram(li, Seq("l_returnflag"), topN = 3).collect()
    assert(hist.length == 3)
    assert(hist(0).getAs[Long]("cnt") >= hist(1).getAs[Long]("cnt"))
    val totalShare = hist.map(_.getAs[Double]("share_pct")).sum
    assert(totalShare > 99.0 && totalShare <= 100.0001) // 3 flags cover all
  }
}
