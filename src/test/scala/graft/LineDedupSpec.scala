package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.LineDedup

/** Contract spec for line-level boilerplate removal: frequency
  * threshold on DISTINCT docs, order-preserving reassembly, all-dropped
  * docs survive as empty, within-doc repetition never promotes a line.
  * The oracle gate (q101) proves the planted-corpus threshold boundary
  * against DuckDB.
  */
class LineDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], minDf: Long) =
    LineDedup.dropFrequentLines(rows.toDF("id", "text"), "id", "text", minDf)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("shared lines drop at the threshold; unique lines keep their order") {
    val got = run(Seq(
      (1L, "HEADER\nalpha\nbeta\nFOOTER"),
      (2L, "HEADER\ngamma\nFOOTER"),
      (3L, "HEADER\ndelta\nFOOTER")), minDf = 3L)
    assert(got(1L) === (("alpha\nbeta", 2L, 2L)))
    assert(got(2L) === (("gamma", 1L, 2L)))
    assert(got(3L) === (("delta", 1L, 2L)))
  }

  test("a line below the threshold survives; exactly-at-threshold drops") {
    val got = run(Seq(
      (1L, "twice\nu1"), (2L, "twice\nu2"), (3L, "only\nu3")), minDf = 2L)
    assert(got(1L)._1 === "u1" && got(2L)._1 === "u2",
      "df=2 meets minDocFreq=2 — dropped")
    assert(got(3L)._1 === "only\nu3", "df=1 stays")
  }

  test("all lines dropped leaves an empty row, never a missing one") {
    val got = run(Seq(
      (1L, "SAME"), (2L, "SAME"), (3L, "SAME\nextra")), minDf = 3L)
    assert(got(1L) === (("", 0L, 1L)))
    assert(got(3L) === (("extra", 1L, 1L)))
  }

  test("within-doc repetition counts ONE doc toward the frequency") {
    // "rep" appears 3 times but only in doc 1: df=1 < 2 — kept, with
    // every occurrence and the original order intact
    val got = run(Seq((1L, "rep\nx\nrep\nrep"), (2L, "y")), minDf = 2L)
    assert(got(1L) === (("rep\nx\nrep\nrep", 4L, 0L)))
  }

  test("broadcast gate: small frequent set broadcasts, forced fallback shuffles") {
    val rows = Seq(
      (1L, "SHARED\na"), (2L, "SHARED\nb"), (3L, "SHARED\nc")).toDF("id", "text")
    def antiJoinLine(maxBroadcastLines: Long): String =
      LineDedup.dropFrequentLines(rows, "id", "text",
        minDocFreq = 2L, maxBroadcastLines = maxBroadcastLines)
        .queryExecution.executedPlan.toString
        .linesIterator.find(_.contains("LeftAnti"))
        .getOrElse(fail("no anti join in plan"))
    // Spark's own size estimate would broadcast a tiny set either way;
    // disable it so the plan shows exactly what the GATE decided
    val threshold = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(threshold)
    try {
      spark.conf.set(threshold, "-1")
      val gated = antiJoinLine(maxBroadcastLines = 4L << 20)
      assert(gated.contains("Broadcast"),
        s"under-gate frequent set must carry the broadcast hint: $gated")
      val forced = antiJoinLine(maxBroadcastLines = 0L)
      assert(!forced.contains("Broadcast"),
        s"over-gate frequent set must fall back to a shuffled anti join: $forced")
      // the fallback path computes the same answer
      val viaFallback = LineDedup.dropFrequentLines(rows, "id", "text",
          minDocFreq = 2L, maxBroadcastLines = 0L)
        .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
      assert(viaFallback === Map(1L -> "a", 2L -> "b", 3L -> "c"))
    } finally spark.conf.set(threshold, saved)
  }

  test("incremental store: counts per batch, merges additively, rewrite ≡ full form") {
    val oldB = Seq((1L, "SHARED\nold1"), (2L, "SHARED\nold2")).toDF("id", "text")
    val newB = Seq((3L, "SHARED\nnew3"), (4L, "only\nnew4"),
      (5L, "only\nnew5")).toDF("id", "text")
    val s1 = LineDedup.lineFrequencyStore(oldB, "id", "text")
    val s2 = LineDedup.lineFrequencyStore(newB, "id", "text")
    // per-batch doc frequencies: SHARED in 2 old docs, 1 new; 'only' in 2 new
    def freqOf(st: org.apache.spark.sql.DataFrame, line: String): Long = {
      val h = Seq(line).toDF("l").select(xxhash64(col("l"))).as[Long].head()
      st.filter(col("line_hash") === h).select(col("doc_freq")).as[Long]
        .collect().headOption.getOrElse(0L)
    }
    assert(freqOf(s1, "SHARED") === 2L && freqOf(s2, "SHARED") === 1L)
    assert(freqOf(s1, "only") === 0L && freqOf(s2, "only") === 2L)
    val merged = LineDedup.mergeLineStores(Seq(s1, s2))
    assert(freqOf(merged, "SHARED") === 3L && freqOf(merged, "only") === 2L)
    // rewriting the new batch against the merged store ≡ the batch form
    // over the full corpus, restricted to the new batch's docs
    val incremental = LineDedup.dropFrequentLinesWithStore(
        newB, merged, "id", "text", minDocFreq = 2L)
      .as[(Long, String, Long, Long)].collect().toSet
    val full = LineDedup.dropFrequentLines(
        oldB.unionByName(newB), "id", "text", minDocFreq = 2L)
      .as[(Long, String, Long, Long)].collect().filter(_._1 >= 3L).toSet
    assert(incremental === full)
    // and the cross-batch knowledge is load-bearing: batch-only frequency
    // (SHARED df=1 within newB) would NOT have dropped SHARED from doc 3
    assert(incremental.find(_._1 == 3L).get._2 === "new3",
      "SHARED must drop from the batch because the STORE knows its corpus df")
  }

  test("custom separator is literal, not regex") {
    val got = LineDedup.dropFrequentLines(
      Seq((1L, "a.b|x"), (2L, "a.b|y")).toDF("id", "text"),
      "id", "text", minDocFreq = 2L, sep = "|")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(got === Map(1L -> "x", 2L -> "y"),
      "'a.b' must split only on '|' (and 'a.b' ≠ 'axb' under regex-dot)")
  }
}
