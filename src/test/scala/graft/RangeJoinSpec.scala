package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2025-06-01 10:$min%02d:00")

  test("binned range join equals the naive inequality join, without a nested loop") {
    val points = Seq(
      (1L, 1L, ts(0)), (2L, 1L, ts(14)), (3L, 1L, ts(15)),
      (4L, 2L, ts(5)), (5L, 3L, ts(30)))
      .toDF("event_id", "user_id", "ts")
    // [10:00, 10:15) for user 1; [10:04, 10:06) for user 2
    val intervals = Seq(
      (1L, ts(0), ts(15), 100L), (2L, ts(4), ts(6), 200L))
      .toDF("user_id", "start_ts", "end_ts", "interval_id")

    val binned = RangeJoin.pointsInIntervals(points, intervals,
      Seq("user_id"), "ts", "start_ts", "end_ts", Seq("interval_id"),
      binSeconds = 300L)
    val got = binned.select("event_id", "interval_id")
      .as[(Long, Long)].collect().toSet

    val naive = points.join(intervals, Seq("user_id"))
      .filter(col("ts") >= col("start_ts") && col("ts") < col("end_ts"))
      .select("event_id", "interval_id").as[(Long, Long)].collect().toSet

    assert(got == naive)
    assert(got == Set((1L, 100L), (2L, 100L), (4L, 200L)))
    // each true match appears exactly once (a point lives in ONE bin)
    assert(binned.count() == got.size.toLong)

    // the whole point: an equi-join plan, not a broadcast nested loop
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"binned range join must not fall back to a nested loop:\n$plan")
  }

  test("inverted and empty intervals are dropped, not exploded") {
    val points = Seq((1L, 1L, ts(5))).toDF("event_id", "user_id", "ts")
    val intervals = Seq(
      (1L, ts(30), ts(0), 1L),  // inverted: sequence would count DOWN
      (1L, ts(5), ts(5), 2L),   // empty: s == e contains nothing
      (1L, ts(0), ts(10), 3L))
      .toDF("user_id", "start_ts", "end_ts", "interval_id")
    val out = RangeJoin.pointsInIntervals(points, intervals,
      Seq("user_id"), "ts", "start_ts", "end_ts", Seq("interval_id"),
      binSeconds = 300L)
      .select("interval_id").as[Long].collect().toSeq
    assert(out == Seq(3L))
  }

  test("intervals spanning many bins still match each point once") {
    val points = Seq((1L, 1L, ts(29))).toDF("event_id", "user_id", "ts")
    // 55-minute interval spans 12 five-minute bins
    val intervals = Seq((1L, ts(0), ts(55), 7L))
      .toDF("user_id", "start_ts", "end_ts", "interval_id")
    val out = RangeJoin.pointsInIntervals(points, intervals,
      Seq("user_id"), "ts", "start_ts", "end_ts", Seq("interval_id"),
      binSeconds = 300L)
    assert(out.count() == 1L)
  }

  test("interval-overlap join equals the naive inequality join, once per pair, no nested loop") {
    val a = Seq(
      (1L, ts(0), ts(30), 1L),   // overlaps b_id 10
      (1L, ts(40), ts(50), 2L),  // overlaps b_id 10; adjacent to b_id 11
      (2L, ts(0), ts(10), 3L))   // adjacent to b_id 12 (half-open: no match)
      .toDF("user_id", "a_start", "a_end", "a_id")
    val b = Seq(
      (1L, ts(25), ts(45), 10L),
      (1L, ts(50), ts(55), 11L),
      (2L, ts(10), ts(20), 12L))
      .toDF("user_id", "b_start", "b_end", "b_id")
    val out = RangeJoin.intervalsOverlap(a, b, Seq("user_id"),
      "a_start", "a_end", "b_start", "b_end", Seq("b_id"), binSeconds = 300L)
    val got = out.select("a_id", "b_id").as[(Long, Long)].collect().toSet

    val naive = a.join(b, Seq("user_id"))
      .filter(col("a_start") < col("b_end") && col("b_start") < col("a_end"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == naive)
    assert(got == Set((1L, 10L), (2L, 10L)))
    // first-shared-bin rule: each true pair emitted exactly once even
    // though overlapping intervals share several bins
    assert(out.count() == got.size.toLong)

    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"binned interval-overlap join must not fall back to a nested loop:\n$plan")
  }

  test("interval-overlap: pair sharing many bins still emits exactly once") {
    val a = Seq((1L, ts(0), ts(55), 1L)).toDF("user_id", "a_start", "a_end", "a_id")
    val b = Seq((1L, ts(5), ts(50), 2L)).toDF("user_id", "b_start", "b_end", "b_id")
    // 300 s bins: the two intervals share ~10 bins
    val out = RangeJoin.intervalsOverlap(a, b, Seq("user_id"),
      "a_start", "a_end", "b_start", "b_end", Seq("b_id"), binSeconds = 300L)
    assert(out.count() == 1L)
  }

  test("interval-overlap: inverted and empty intervals on either side are dropped") {
    val a = Seq(
      (1L, ts(30), ts(0), 1L),  // inverted
      (1L, ts(5), ts(5), 2L),   // empty
      (1L, ts(0), ts(10), 3L))
      .toDF("user_id", "a_start", "a_end", "a_id")
    val b = Seq(
      (1L, ts(9), ts(2), 20L),  // inverted
      (1L, ts(4), ts(8), 21L))
      .toDF("user_id", "b_start", "b_end", "b_id")
    val out = RangeJoin.intervalsOverlap(a, b, Seq("user_id"),
      "a_start", "a_end", "b_start", "b_end", Seq("b_id"), binSeconds = 300L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((3L, 21L)))
  }
}
