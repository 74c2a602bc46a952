package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BloomJoin

class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("semiJoinPruned equals the exact semi join (false positives removed)") {
    val fact = (1L to 1000L).map(i => (i, s"row$i")).toDF("k", "payload")
    val dim = Seq(3L, 7L, 500L, 999L, 7L).toDF("dk") // dup dim key too
    // deliberately undersized bloom (16 items claimed, 30% fpp) so false
    // positives are near-certain on 1000 probes — the exact join must
    // still produce precisely the 4 true matches
    val out = BloomJoin.semiJoinPruned(fact, dim, "k", "dk",
      expectedItems = 16, fpp = 0.3)
    assert(out.select("k").as[Long].collect().sorted === Array(3L, 7L, 500L, 999L))
  }

  test("semiJoinPruned on an empty dim returns empty (null bloom handled)") {
    val fact = (1L to 10L).toDF("k")
    val dim = Seq.empty[Long].toDF("dk")
    assert(BloomJoin.semiJoinPruned(fact, dim, "k", "dk", 16).count() === 0)
  }

  test("the bloom probe evaluates below the join and actually prunes") {
    // parquet-backed fact: a local Seq relation would let
    // ConvertToLocalRelation evaluate the probe at optimization time and
    // erase the Filter node this test exists to prove
    val fact = Tables.lineitem(spark, SparkTestSession.sfTiny)
    val dim = Tables.part(spark, SparkTestSession.sfTiny)
      .filter(col("p_size") < 3).select(col("p_partkey").as("dk"))
    val out = BloomJoin.semiJoinPruned(fact, dim, "l_partkey", "dk",
      expectedItems = 100)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"bloom probe missing from plan:\n$plan")
    // the probe must sit on the fact scan side, below the join operator
    val lines = plan.linesIterator.toSeq
    val joinIdx = lines.indexWhere(_.contains("Join"))
    val probeIdx = lines.indexWhere(_.contains("might_contain"))
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      s"probe must be BELOW the join (scan side):\n$plan")
    // exactness vs the plain semi join on the same inputs
    val expected = fact.join(dim, fact("l_partkey") === dim("dk"), "left_semi").count()
    assert(out.count() === expected)
    // and the prefilter alone keeps far fewer rows than the full fact
    val bloom = dim.agg(org.apache.spark.sql.graft.GraftBloom.bloomAgg(
        xxhash64(col("dk")), 100, BloomJoin.optimalNumBits(100, 0.01)).as("b"))
      .head.getAs[Array[Byte]](0)
    val kept = fact.filter(org.apache.spark.sql.graft.GraftBloom.mightContain(
      bloom, xxhash64(col("l_partkey")))).count()
    val total = fact.count()
    assert(kept >= expected, "bloom must never drop true matches")
    assert(kept < total / 2, s"bloom kept $kept of $total rows — not pruning")
  }

  test("mixed-width integral keys hash through a common type — zero false negatives") {
    import spark.implicits._
    // INT fact key vs BIGINT dim key: the equality join matches via
    // implicit cast, so the bloom must too — un-reconciled xxhash64
    // hashes INT and BIGINT differently and silently drops matches
    val fact = (1 to 1000).map(i => (i, s"r$i")).toDF("k", "payload") // k: INT
    val dim = Seq(10L, 500L, 999L).toDF("dk")                        // dk: BIGINT
    val out = BloomJoin.semiJoinPruned(fact, dim, "k", "dk", expectedItems = 10)
      .select("k").as[Int].collect().toSet
    assert(out === Set(10, 500, 999),
      s"every matching key must survive the bloom prefilter; got $out")
  }

  test("non-integral type mismatch fails fast instead of silently dropping rows") {
    import spark.implicits._
    val fact = Seq(("1", "a")).toDF("k", "payload") // STRING key
    val dim = Seq(1L).toDF("dk")                    // BIGINT key
    val e = intercept[IllegalArgumentException] {
      BloomJoin.semiJoinPruned(fact, dim, "k", "dk", expectedItems = 10)
    }
    assert(e.getMessage.contains("false NEGATIVES"))
  }
}
