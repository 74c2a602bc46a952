package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams
import graft.streaming.Streams.{Event, Session}

/** Streaming twins must agree with their batch counterparts — each test
  * drives a MemoryStream (or file source) through the operator and
  * compares against the equivalent batch computation on the same rows.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2025-06-01 10:$minute%02d:00")

  private val sampleEvents = Seq(
    Event(1, ts(0), 100, "click", 1.0, "{}"),
    Event(2, ts(1), 100, "view", 2.0, "{}"),
    Event(3, ts(2), 200, "click", 3.0, "{}"),
    Event(4, ts(3), 100, "click", 4.0, "{}"),
    Event(5, ts(30), 200, "view", 5.0, "{}"),
    Event(6, ts(31), 100, "view", 6.0, "{}"))

  test("windowedCounts matches the batch window aggregation") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]

    val windowed = Streams.windowedCounts(
      input.toDF(), "ts", "10 minutes", "5 minutes", "event_type")
    val q = windowed.writeStream.outputMode("append").format("memory")
      .queryName("win_out").start()
    try {
      // append mode seals a window when a LATER DATA batch advances the
      // watermark past its end — drive three batches so every sample
      // window gets sealed deterministically
      input.addData(sampleEvents: _*)
      q.processAllAvailable()
      input.addData(Event(7, Timestamp.valueOf("2025-06-01 10:59:00"), 300, "late", 0.0, "{}"))
      q.processAllAvailable()
      input.addData(Event(8, Timestamp.valueOf("2025-06-01 11:30:00"), 300, "later", 0.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()

    val batch = sampleEvents.toDF()
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))
      .as[(Timestamp, String, Long, Double)].collect().toSet

    val streamed = spark.table("win_out")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(streamed.filter(r => r._2 != "late" && r._2 != "later") == batch)
  }

  test("sessionize streaming twin agrees with the batch gaps-and-islands operator") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val gapMs = 600000L // 10 minutes
    val flushTs = Timestamp.valueOf("2025-07-01 00:00:00")
    val sessions = Streams.sessionize(input.toDS(), gapMillis = gapMs)
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName("sess_twin_out").start()
    try {
      input.addData(sampleEvents: _*)
      q.processAllAvailable()
      // a far-future flush event per user closes every open session so
      // the streaming side emits them (its own sessions are filtered out)
      input.addData(sampleEvents.map(_.user_id).distinct.map(u =>
        Event(9000L + u, flushTs, u, "flush", 0.0, "{}")): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sess_twin_out")
      .filter(col("session_start") < lit(flushTs))
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet

    val batch = graft.operators.Sessionize.sessions(
      sampleEvents.toDF().select($"user_id", $"ts", $"value"),
      Seq("user_id"), "ts", gapSeconds = gapMs / 1000,
      extraAggs = Seq(sum("value").as("sum_value")))
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet

    assert(streamed == batch)
  }

  test("sessionizeNative (watermarked session_window) agrees with the batch operator") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val flushTs = Timestamp.valueOf("2025-07-01 00:00:00")
    val native = Streams.sessionizeNative(input.toDF(), Seq("user_id"), "ts",
      gap = "10 minutes", watermark = "10 minutes",
      extraAggs = Seq(sum(col("value")).as("sum_value")))
    val q = native.writeStream.outputMode("append").format("memory")
      .queryName("sessnat_out").start()
    try {
      input.addData(sampleEvents: _*)
      q.processAllAvailable()
      // two watermark-advancing batches: the first raises the watermark
      // past every sample session's end+gap, the second triggers their
      // emission (batch N uses the watermark computed through N-1)
      input.addData(Event(9001, flushTs, 300, "flush", 0.0, "{}"))
      q.processAllAvailable()
      input.addData(Event(9002, Timestamp.valueOf("2025-07-01 01:00:00"), 300, "flush", 0.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sessnat_out")
      .filter(col("session_start") < lit(flushTs))
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet

    val batch = graft.operators.Sessionize.sessions(
      sampleEvents.toDF().select($"user_id", $"ts", $"value"),
      Seq("user_id"), "ts", gapSeconds = 600L,
      extraAggs = Seq(sum("value").as("sum_value")))
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet

    assert(streamed == batch)
  }

  test("sessionizeNative merges in-watermark late events and drops beyond-watermark ones") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val native = Streams.sessionizeNative(input.toDF(), Seq("user_id"), "ts",
      gap = "10 minutes", watermark = "10 minutes")
    val q = native.writeStream.outputMode("append").format("memory")
      .queryName("sessnat_late").start()
    try {
      // batch 1: user 100 at 10:00 and 10:05
      input.addData(Event(1, ts(0), 100, "click", 1.0, "{}"),
        Event(2, ts(5), 100, "click", 1.0, "{}"))
      q.processAllAvailable()
      // batch 2: out-of-order 10:03 event — the watermark is only
      // 09:55 (10:05 - 10m), so it MUST merge into the open session
      // (the arrival-order flatMapGroupsWithState twin has no such
      // guarantee)
      input.addData(Event(3, ts(3), 100, "late-ok", 1.0, "{}"))
      q.processAllAvailable()
      // batch 3: 11:00 advances the watermark to 10:50, sealing the
      // 10:00-10:05 session (end+gap 10:15 < 10:50)
      input.addData(Event(4, Timestamp.valueOf("2025-06-01 11:00:00"), 100, "adv", 1.0, "{}"))
      q.processAllAvailable()
      // batch 4: 10:02 is older than the 10:50 watermark → dropped at
      // the operator; a second far-future event flushes remaining state
      input.addData(Event(5, ts(2), 100, "too-late", 1.0, "{}"),
        Event(6, Timestamp.valueOf("2025-06-01 12:00:00"), 100, "flush", 1.0, "{}"))
      q.processAllAvailable()
      input.addData(Event(7, Timestamp.valueOf("2025-06-01 13:00:00"), 100, "flush", 1.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()
    val sessions = spark.table("sessnat_late")
      .select("session_start", "session_end", "n_events")
      .as[(Timestamp, Timestamp, Long)].collect().toSet
    // the morning session holds exactly events 1-3 (the in-watermark
    // late event merged; the beyond-watermark one did not resurrect it)
    assert(sessions.contains((ts(0), ts(5), 3L)),
      s"expected merged 3-event session, got $sessions")
    assert(!sessions.exists(s => s._3 == 1L && s._1 == ts(2)),
      "the beyond-watermark event must be dropped, not become its own session")
  }

  test("streamIntervalJoin matches the batch range join on the same rows") {
    implicit val sc = spark.sqlContext
    val lIn = MemoryStream[Event]
    val rIn = MemoryStream[Event]
    val leftDf = lIn.toDF().select($"event_id", $"user_id", $"ts")
    val rightDf = rIn.toDF()
      .select($"user_id", $"ts".as("p_ts"), $"event_id".as("p_id"))
    val joined = Streams.streamIntervalJoin(leftDf, rightDf,
      Seq("user_id"), "ts", "p_ts", maxDelay = "20 minutes", watermark = "10 minutes")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("sij_out").start()
    try {
      lIn.addData(sampleEvents: _*)
      // right side: events 1 (10:00, user 100) and 5 (10:30, user 200)
      // act as "purchases" opening 20-minute windows
      rIn.addData(sampleEvents.filter(e => e.event_id == 1L || e.event_id == 5L): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sij_out")
      .select("event_id", "p_id").as[(Long, Long)].collect().toSet

    // batch twin: the SAME semantics via the bin-bucketed range join
    val intervals = sampleEvents.filter(e => e.event_id == 1L || e.event_id == 5L)
      .toDF().select($"user_id", $"ts".as("p_ts"),
        ($"ts" + expr("INTERVAL 20 MINUTES")).as("p_end"), $"event_id".as("p_id"))
    val batch = graft.operators.RangeJoin.pointsInIntervals(
      sampleEvents.toDF().select($"event_id", $"user_id", $"ts"), intervals,
      Seq("user_id"), "ts", "p_ts", "p_end", Seq("p_id"), binSeconds = 300L)
      .select("event_id", "p_id").as[(Long, Long)].collect().toSet

    assert(streamed == batch)
    assert(streamed == Set((1L, 1L), (2L, 1L), (4L, 1L), (5L, 5L)))
  }

  test("Enrich.fromDim applies unchanged to a stream (stream-static broadcast join)") {
    // the J2 dim-enrichment operator needs no streaming twin at all: a
    // stream-static left broadcast join is stateless, so the SAME batch
    // operator runs per micro-batch — the payoff of declaring operators
    // as DataFrame => DataFrame
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val dim = Seq((100L, "gold"), (300L, "new")).toDF("user_id", "tier")
    val enriched = graft.operators.Enrich.fromDim(
      input.toDF().withColumn("fallback", lit("UNKNOWN")),
      dim, "user_id", "tier", "resolved_tier", "fallback", "tier_mapped")
    val q = enriched.writeStream.outputMode("append").format("memory")
      .queryName("enrich_out").start()
    try {
      input.addData(sampleEvents: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("enrich_out")
      .select("event_id", "resolved_tier", "tier_mapped")
      .as[(Long, String, Boolean)].collect().toSet
    val expected = sampleEvents.map { e =>
      if (e.user_id == 100L) (e.event_id, "gold", true)
      else (e.event_id, "UNKNOWN", false)
    }.toSet
    assert(got == expected)
  }

  test("dedupedIngest drops re-delivered keys within the watermark") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(sampleEvents: _*)
    input.addData(sampleEvents.take(3): _*) // exact re-delivery

    val deduped = Streams.dedupedIngest(input.toDF(), "event_id", "ts", "1 hour")
    Streams.runToMemory(deduped, "dedup_out")
    assert(spark.table("dedup_out").count() == 6)
    assert(spark.table("dedup_out").select("event_id").distinct().count() == 6)
  }

  test("latestPerUser keeps the running newest event per user across batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(sampleEvents.take(4): _*)

    val latest = Streams.latestPerUser(input.toDS())
    val q = latest.writeStream.outputMode("update").format("memory")
      .queryName("latest_out").start()
    try {
      q.processAllAvailable()
      val after1 = spark.table("latest_out").as[Event].collect()
        .groupBy(_.user_id).map { case (u, rows) => u -> rows.last.event_id }
      assert(after1 == Map(100L -> 4L, 200L -> 3L))

      input.addData(sampleEvents.drop(4): _*)
      q.processAllAvailable()
      val after2 = spark.table("latest_out").as[Event].collect()
        .groupBy(_.user_id).map { case (u, rows) => u -> rows.last.event_id }
      assert(after2 == Map(100L -> 6L, 200L -> 5L))
    } finally q.stop()

    // agrees with the batch operator on the full data
    val batch = graft.operators.Dedup.latestPerKeyAgg(
      Seq("user_id"), Seq(col("ts"), col("event_id")))(sampleEvents.toDF())
      .as[Event].collect().map(e => e.user_id -> e.event_id).toMap
    assert(batch == Map(100L -> 6L, 200L -> 5L))
  }

  test("sessionize closes sessions on inactivity gaps") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(sampleEvents: _*)

    val sessions = Streams.sessionize(input.toDS(), gapMillis = 10 * 60 * 1000)
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName("sess_out").start()
    try {
      q.processAllAvailable()
      // user 100: events at 10:00-10:03 then 10:31 → first session closed
      val closed = spark.table("sess_out").as[Session].collect()
      val u100 = closed.filter(_.user_id == 100)
      assert(u100.length == 1)
      assert(u100.head.n_events == 3 && u100.head.sum_value == 7.0)
      assert(u100.head.session_start == ts(0) && u100.head.session_end == ts(3))
      // user 200: 10:02 then 10:30 → first session closed with 1 event
      val u200 = closed.filter(_.user_id == 200)
      assert(u200.length == 1 && u200.head.n_events == 1)
    } finally q.stop()
  }

  test("nearDedupIngest dedups each micro-batch against the persisted signature store") {
    val root = java.nio.file.Files.createTempDirectory("graft-neardedup")
    val (src, store, out, ckpt) = (s"$root/src", s"$root/store", s"$root/out", s"$root/ckpt")
    val s1 = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    val s2 = "one two three four five six seven eight nine ten"
    // batch 1: doc 3 near-dups doc 1 (smaller id wins within the batch)
    Seq((1L, s1), (2L, s2), (3L, s1 + " tail")).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    Streams.nearDedupIngest(Streams.fileIngest(spark, src, schema),
      "doc_id", "text", threshold = 0.5, store, out, ckpt)
    assert(spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
      == Set(1L, 2L))
    // batch 2 arrives: 10 near-dups store doc 2, 12 near-dups store doc 1
    // (store always wins), 11 is novel — the restarted query picks up
    // only the new file via the checkpoint
    Seq((10L, s2 + " extra"), (12L, s1 + " suffix"),
      (11L, "completely novel text nothing shared with anything else at all"))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    Streams.nearDedupIngest(Streams.fileIngest(spark, src, schema),
      "doc_id", "text", threshold = 0.5, store, out, ckpt)
    assert(spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
      == Set(1L, 2L, 11L))
    // the persisted store carries exactly the survivors' signatures
    assert(spark.read.parquet(store).select("doc_id").as[Long].collect().toSet
      == Set(1L, 2L, 11L))
  }

  test("clusterIngest maintains cross-batch duplicate clusters; replay is a no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft-clusteringest")
    val (src, store, labels, ckpt) =
      (s"$root/src", s"$root/store", s"$root/labels", s"$root/ckpt")
    val s1 = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    val s2 = "one two three four five six seven eight nine ten"
    def currentLabels: Map[Long, Long] =
      graft.operators.Dedup.latestPerKeyAgg(Seq("id"),
          Seq(org.apache.spark.sql.functions.col("batch_id")))(
        spark.read.parquet(labels))
        .select("id", "cluster_id").as[(Long, Long)].collect().toMap

    // batch 1: 1~2 near-dup, 3 unique
    Seq((1L, s1), (2L, s1 + " tail"), (3L, s2)).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    Streams.clusterIngest(Streams.fileIngest(spark, src, schema),
      "doc_id", "text", threshold = 0.5, store, labels, ckpt)
    assert(currentLabels == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
    // batch 2: 10 joins {3}'s cluster, 11 is novel
    Seq((10L, s2 + " extra"), (11L, "entirely novel words nothing shared whatsoever here"))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    Streams.clusterIngest(Streams.fileIngest(spark, src, schema),
      "doc_id", "text", threshold = 0.5, store, labels, ckpt)
    assert(currentLabels == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 10L -> 3L, 11L -> 11L))
    // the store carries EVERY doc's signatures (cluster mode drops nothing)
    assert(spark.read.parquet(store).select("doc_id").as[Long].collect().toSet
      == Set(1L, 2L, 3L, 10L, 11L))
    // replaying batch 1 against the final state is a strict no-op
    val b1 = Seq((1L, s1), (2L, s1 + " tail"), (3L, s2)).toDF("doc_id", "text")
    Streams.processClusterBatch(b1, 0L, "doc_id", "text", 0.5, store, labels)
    assert(currentLabels == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 10L -> 3L, 11L -> 11L))
    // crash BETWEEN the two appends (labels committed, sigs lost): replay
    // must repair the store without perturbing labels — the recomputed
    // delta is discarded (its sink is committed), only the sig append runs
    val sp = new java.io.File(s"$store/batch_id=1")
    sp.listFiles().foreach(_.delete()); sp.delete()
    val b2 = Seq((10L, s2 + " extra"),
      (11L, "entirely novel words nothing shared whatsoever here"))
      .toDF("doc_id", "text")
    Streams.processClusterBatch(b2, 1L, "doc_id", "text", 0.5, store, labels)
    assert(currentLabels == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 10L -> 3L, 11L -> 11L))
    assert(spark.read.parquet(store).select("doc_id").as[Long].collect().toSet
      == Set(1L, 2L, 3L, 10L, 11L), "crash replay did not repair the store")
  }

  test("lineDedupIngest removes corpus-frequent lines from each batch; replay-safe") {
    val root = java.nio.file.Files.createTempDirectory("graft-linededup")
    val (src, store, out, ckpt) = (s"$root/src", s"$root/store", s"$root/out", s"$root/ckpt")
    def cleanOf: Map[Long, String] =
      spark.read.parquet(out).select("doc_id", "clean_text")
        .as[(Long, String)].collect().toMap
    // batch 1: FOOTER in both docs (df=2 ≥ 2 → boilerplate already)
    Seq((1L, "unique one\nFOOTER"), (2L, "unique two\nFOOTER"))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    Streams.lineDedupIngest(Streams.fileIngest(spark, src, schema),
      "doc_id", "text", minDocFreq = 2L, store, out, ckpt)
    assert(cleanOf == Map(1L -> "unique one", 2L -> "unique two"))
    // batch 2: FOOTER drops via STORE knowledge alone (df=1 within the
    // batch); NAV appears twice within this batch and drops too
    Seq((3L, "unique three\nNAV\nFOOTER"), (4L, "unique four\nNAV"))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    Streams.lineDedupIngest(Streams.fileIngest(spark, src, schema),
      "doc_id", "text", minDocFreq = 2L, store, out, ckpt)
    assert(cleanOf == Map(1L -> "unique one", 2L -> "unique two",
      3L -> "unique three", 4L -> "unique four"))
    // the batch-1 output is NOT retroactively rewritten (streaming CCNet
    // contract): 'unique one' stays even though nothing new dropped
    // full replay of a committed batch is a strict no-op
    val b2 = Seq((3L, "unique three\nNAV\nFOOTER"), (4L, "unique four\nNAV"))
      .toDF("doc_id", "text")
    Streams.processLineDedupBatch(b2, 1L, "doc_id", "text", 2L, store, out)
    assert(cleanOf.size == 4, "replay duplicated output")
    // crash BETWEEN the two appends (output landed, store delta lost):
    // replay repairs the store; the excluded-own-batch read means the
    // recomputed output (discarded — its sink is committed) saw exactly
    // the pre-batch frequencies
    val sp = new java.io.File(s"$store/batch_id=1")
    sp.listFiles().foreach(_.delete()); sp.delete()
    Streams.processLineDedupBatch(b2, 1L, "doc_id", "text", 2L, store, out)
    assert(cleanOf.size == 4, "crash replay duplicated output")
    val storedFreqs = graft.dedup.LineDedup.mergeLineStores(
        Seq(spark.read.parquet(store).drop("batch_id")))
      .as[(Long, Long)].collect().toMap
    val footerHash = Seq("FOOTER").toDF("l")
      .select(org.apache.spark.sql.functions.xxhash64(
        org.apache.spark.sql.functions.col("l"))).as[Long].head()
    assert(storedFreqs(footerHash) == 3L,
      "crash replay did not repair the store (FOOTER df must be 3 corpus-wide)")
  }

  test("nearDedupIngest batch replay and mid-batch crash never duplicate output") {
    val root = java.nio.file.Files.createTempDirectory("graft-neardedup-replay")
    val (store, out) = (s"$root/store", s"$root/out")
    val batch = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel india juliett"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    def outIds = spark.read.parquet(out).select("doc_id").as[Long].collect().toList
    def storeIds = spark.read.parquet(store).select("doc_id").as[Long].collect().toList

    Streams.processNearDedupBatch(batch, 0L, "doc_id", "text", 0.5, store, out)
    assert(outIds.sorted == List(1L, 2L) && storeIds.sorted == List(1L, 2L))
    // full replay of a committed batch (restart before checkpoint commit):
    // both sinks already carry batch_id=0 — a strict no-op
    Streams.processNearDedupBatch(batch, 0L, "doc_id", "text", 0.5, store, out)
    assert(outIds.sorted == List(1L, 2L), "replay duplicated survivors")
    assert(storeIds.sorted == List(1L, 2L), "replay duplicated store sigs")
    // crash BETWEEN the two appends: survivors landed, store delta lost —
    // replay must repair the store without re-appending survivors
    val fs = new java.io.File(s"$store/batch_id=0")
    fs.listFiles().foreach(_.delete()); fs.delete()
    Streams.processNearDedupBatch(batch, 0L, "doc_id", "text", 0.5, store, out)
    assert(outIds.sorted == List(1L, 2L), "crash replay duplicated survivors")
    assert(storeIds.sorted == List(1L, 2L), "crash replay did not repair the store")
  }

  test("decontaminateIngest drops benchmark leaks from each micro-batch") {
    val root = java.nio.file.Files.createTempDirectory("graft-decontam")
    val (src, out, ckpt) = (s"$root/src", s"$root/out", s"$root/ckpt")
    val leak = "one two three four five six seven eight nine ten eleven twelve"
    val bench = Seq(leak).toDF("text")
    // batch 1: doc 1 is a verbatim leak, doc 2 is clean
    Seq((1L, leak),
      (2L, "clean first-batch document with entirely original content here okay"))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    Streams.decontaminateIngest(Streams.fileIngest(spark, src, schema),
      bench, "doc_id", "text", "text", out, ckpt)
    assert(spark.read.parquet(out).select("doc_id").as[Long].collect().toSet == Set(2L))
    // batch 2: another leak (prefixed — still shares 8-grams) + a clean doc;
    // the restarted query picks up only the new file
    Seq((10L, "prefix " + leak),
      (11L, "another clean document in the second batch with fresh words entirely"))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    Streams.decontaminateIngest(Streams.fileIngest(spark, src, schema),
      bench, "doc_id", "text", "text", out, ckpt)
    assert(spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
      == Set(2L, 11L))
  }

  test("checkpointed parquet sink resumes exactly-once across restarts") {
    val root = java.nio.file.Files.createTempDirectory("graft-stream")
    val (src, out, ckpt) = (s"$root/src", s"$root/out", s"$root/ckpt")
    sampleEvents.take(3).toDF().write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema

    Streams.runToParquet(Streams.fileIngest(spark, src, schema), out, ckpt)
    assert(spark.read.parquet(out).count() == 3)

    // new source files arrive; a RESTARTED query on the same checkpoint
    // must pick up only the new files — no reprocessing, no duplicates
    sampleEvents.drop(3).toDF().write.mode("append").parquet(src)
    Streams.runToParquet(Streams.fileIngest(spark, src, schema), out, ckpt)
    val rows = spark.read.parquet(out).as[Event].collect()
    assert(rows.length == 6)
    assert(rows.map(_.event_id).toSet == (1L to 6L).toSet)
  }

  test("scdIngest maintains a versioned dim across batches; replay and batch-twin agree") {
    val root = java.nio.file.Files.createTempDirectory("graft-scdingest")
    val (src, dim, ckpt) = (s"$root/src", s"$root/dim", s"$root/ckpt")
    // batch 1: two keys appear (1 has an in-batch older duplicate that
    // latestPerKey must discard)
    Seq((1L, "a0", "2024-01-01 00:00:00"), (1L, "a1", "2024-01-02 00:00:00"),
      (2L, "b1", "2024-01-02 00:00:00"))
      .toDF("k", "v", "ts").withColumn("ts", to_timestamp(col("ts")))
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    Streams.scdIngest(Streams.fileIngest(spark, src, schema),
      Seq("k"), Seq("v"), "ts", dim, ckpt)
    val snap1 = Streams.currentDim(spark, dim).get
      .select("k", "v", "is_current").as[(Long, String, Boolean)].collect().toSet
    assert(snap1 === Set((1L, "a1", true), (2L, "b1", true)))

    // batch 2: key 1 changes, key 2 redelivers unchanged, key 3 is new
    Seq((1L, "a2", "2024-02-01 00:00:00"), (2L, "b1", "2024-02-01 00:00:00"),
      (3L, "c1", "2024-02-01 00:00:00"))
      .toDF("k", "v", "ts").withColumn("ts", to_timestamp(col("ts")))
      .write.mode("append").parquet(src)
    Streams.scdIngest(Streams.fileIngest(spark, src, schema),
      Seq("k"), Seq("v"), "ts", dim, ckpt)
    val snap2 = Streams.currentDim(spark, dim).get
    val cur = snap2.filter(col("is_current"))
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(cur === Set((1L, "a2"), (2L, "b1"), (3L, "c1")))
    val closed = snap2.filter(!col("is_current"))
      .select("k", "v", "valid_to").collect()
    assert(closed.length == 1 && closed(0).getLong(0) == 1L
      && closed(0).getString(1) == "a1"
      && closed(0).getTimestamp(2).toString.startsWith("2024-02-01"),
      "exactly the superseded version closes at the batch's max ts")

    // replaying a committed batch is a no-op (snapshot partition exists)
    val batch2 = Seq((1L, "a9", "2024-03-01 00:00:00")).toDF("k", "v", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
    val before = snap2.count()
    Streams.processScdBatch(batch2, batchId = 1L, Seq("k"), Seq("v"), "ts", dim)
    assert(Streams.currentDim(spark, dim).get.count() === before,
      "replay of a committed batch_id must not write")

    // batch-twin agreement: applying both batches with the batch operator
    // yields the same final dim (modulo row order)
    val b1 = Seq((1L, "a1"), (2L, "b1")).toDF("k", "v")
    val b2 = Seq((1L, "a2"), (2L, "b1"), (3L, "c1")).toDF("k", "v")
    val seed = b1.limit(0)
      .withColumn("valid_from", lit(null).cast("timestamp"))
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))
    val twin = graft.operators.Scd.applyType2(
      graft.operators.Scd.applyType2(seed, b1, Seq("k"), Seq("v"),
        to_timestamp(lit("2024-01-02 00:00:00"))),
      b2, Seq("k"), Seq("v"), to_timestamp(lit("2024-02-01 00:00:00")))
    val twinSet = twin.collect().map(_.toString).toSet
    val streamSet = Streams.currentDim(spark, dim).get
      .select("k", "v", "valid_from", "valid_to", "is_current")
      .collect().map(_.toString).toSet
    assert(streamSet === twinSet, "streaming dim must equal the batch twin")

    // crashed-write debris: an empty batch_id dir (and one holding only a
    // _temporary marker) must NOT be promoted to "latest snapshot" — and a
    // replay of that batch id must recompute and repair it
    val debris = new java.io.File(s"$dim/batch_id=99"); debris.mkdirs()
    new java.io.File(debris, "_temporary").createNewFile()
    val latest = Streams.currentDim(spark, dim).get
      .filter(col("is_current")).select("k", "v").as[(Long, String)].collect().toSet
    assert(latest === cur, "debris partition must not become the current snapshot")
    val repair = Seq((1L, "a3", "2024-03-01 00:00:00")).toDF("k", "v", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
    Streams.processScdBatch(repair, batchId = 99L, Seq("k"), Seq("v"), "ts", dim)
    assert(Streams.currentDim(spark, dim).get
      .filter(col("is_current") && col("k") === 1L)
      .select("v").as[String].head() === "a3",
      "a replayed batch must repair its debris partition")
  }

  test("versionedIngest: each batch is one atomic tagged version; replay is a no-op") {
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft-vingest")
    val (src, table, ckpt) = (s"$root/src", s"$root/table", s"$root/ckpt")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    Streams.versionedIngest(Streams.fileIngest(spark, src, schema), table, ckpt,
      statsCols = Seq("id"))
    val v1 = VersionedTable.latest(spark, table).get
    assert(v1.operation.startsWith("append#"))
    assert(VersionedTable.read(spark, table).count() === 2)
    assert(v1.stats.nonEmpty && v1.stats.values.forall(_.cols.contains("id")),
      "streamed batches must carry skipping stats when asked")

    // second batch appends a NEW version; the first stays addressable
    Seq((3L, "c")).toDF("id", "v").write.mode("append").parquet(src)
    Streams.versionedIngest(Streams.fileIngest(spark, src, schema), table, ckpt,
      statsCols = Seq("id"))
    val snaps = VersionedTable.snapshots(spark, table)
    assert(snaps.size === 2 && snaps.map(_.operation).distinct.size === 2,
      s"each batch must commit its own tagged version: $snaps")
    assert(VersionedTable.read(spark, table)
      .select("id").as[Long].collect().toSet === Set(1L, 2L, 3L))
    assert(VersionedTable.snapshotAt(spark, table, v1.version)
      .select("id").as[Long].collect().toSet === Set(1L, 2L),
      "batch boundaries must stay time-travelable")

    // direct replay of a committed batch id: strict no-op
    val before = snaps.map(_.version).max
    Streams.processVersionedBatch(
      Seq((99L, "z")).toDF("id", "v"), batchId = 1L, table)
    assert(VersionedTable.snapshots(spark, table).map(_.version).max === before,
      "replaying a committed batch must not commit a new version")
  }

  test("upsertIngest merges each batch exactly once on the merge-on-read " +
      "path: matches update, new keys insert, files carry, replay no-ops") {
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft-upsingest")
    val (src, table, ckpt) = (s"$root/src", s"$root/table", s"$root/ckpt")
    (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    Streams.upsertIngest(Streams.fileIngest(spark, src, schema), table,
      Seq("id"), ckpt, statsCols = Seq("id"))
    val v1 = VersionedTable.latest(spark, table).get
    assert(v1.operation.startsWith("merge#"),
      "first batch lands as the tagged create-append")
    assert(VersionedTable.read(spark, table).count() === 10)

    // batch 2: one update (10% of the file → DV lane) + one insert
    Seq((1L, "UPD"), (23L, "new")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(src)
    Streams.upsertIngest(Streams.fileIngest(spark, src, schema), table,
      Seq("id"), ckpt, statsCols = Seq("id"))
    val v2 = VersionedTable.latest(spark, table).get
    assert(v2.operation.startsWith("merge#") &&
      v2.operation != v1.operation)
    assert(v1.files.forall(v2.files.contains),
      "the merge-on-read batch must carry the previous batch's files")
    assert(v2.dvn.values.sum === 1L, s"one soft-updated position: ${v2.dvn}")
    val got = VersionedTable.read(spark, table)
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(got === ((2L to 10L).map(i => i -> s"v$i").toMap ++
      Map(1L -> "UPD", 23L -> "new")))
    assert(VersionedTable.snapshotAt(spark, table, v1.version)
      .select("v").as[String].collect().toSet ===
      (1L to 10L).map(i => s"v$i").toSet,
      "batch boundaries stay time-travelable across the upsert")

    // direct replay of a committed batch id: strict no-op
    val before = VersionedTable.snapshots(spark, table).map(_.version).max
    Streams.processUpsertBatch(
      Seq((99L, "z")).toDF("id", "v"), batchId = 1L, table, Seq("id"))
    assert(VersionedTable.snapshots(spark, table)
      .map(_.version).max === before,
      "replaying a committed upsert batch must not commit a new version")
  }

  test("viewIngest maintains the aggregate view per batch; agrees with batch full recompute; replay is a no-op") {
    import graft.operators.IncrementalView
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft-viewingest")
    val (src, view, ckpt) = (s"$root/src", s"$root/view", s"$root/ckpt")
    def mk(rows: Seq[(Long, String, String)]) = rows.toDF("id", "g", "xs")
      .select(col("id"), col("g"), col("xs").cast("decimal(10,2)").as("x"))
    mk(Seq((1L, "a", "1.10"), (2L, "a", "2.20"), (3L, "b", "3.30")))
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    Streams.viewIngest(Streams.fileIngest(spark, src, schema), view, ckpt,
      Seq("g"), Seq("x"))
    val v1 = VersionedTable.latest(spark, view).get
    assert(v1.operation.startsWith("view#"))

    // second batch: new group d born, group a grows — the stored view
    // must equal full recompute over ALL rows ever ingested
    mk(Seq((4L, "a", "4.40"), (5L, "d", "5.50")))
      .write.mode("append").parquet(src)
    Streams.viewIngest(Streams.fileIngest(spark, src, schema), view, ckpt,
      Seq("g"), Seq("x"))
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.select(col("g"), col("n_rows"), col("sum_x").cast("string"))
        .as[(String, Long, String)].collect()
        .map(t => t._1 -> ((t._2, BigDecimal(t._3)))).toMap
    val got = asMap(VersionedTable.read(spark, view))
    val want = asMap(IncrementalView.full(
      spark.read.parquet(src), Seq("g"), Seq("x")))
    assert(got === want, "streamed view must equal batch full recompute")
    // batch boundaries stay time-travelable: v1 holds only batch-1 rows
    assert(asMap(VersionedTable.snapshotAt(spark, view, v1.version))("a")
      === ((2L, BigDecimal("3.30"))))

    // replaying a committed batch id must not commit a new version
    val before = VersionedTable.snapshots(spark, view).map(_.version).max
    Streams.processViewBatch(mk(Seq((99L, "z", "9.90"))), batchId = 0L,
      view, Seq("g"), Seq("x"))
    assert(VersionedTable.snapshots(spark, view).map(_.version).max === before)
  }

  test("viewIngest losing the version claim mid-batch fails TYPED; a " +
      "restart resumes exactly-once with no lost or duplicate view version") {
    import graft.operators.IncrementalView
    import graft.sources.{ConcurrentCommitException, VersionedTable}
    val root = java.nio.file.Files.createTempDirectory("graft-viewconflict")
    val (src, view, ckpt) = (s"$root/src", s"$root/view", s"$root/ckpt")
    def mk(rows: Seq[(Long, String, String)]) = rows.toDF("id", "g", "xs")
      .select(col("id"), col("g"), col("xs").cast("decimal(10,2)").as("x"))
    mk(Seq((1L, "a", "1.10"), (2L, "b", "2.20")))
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    Streams.viewIngest(Streams.fileIngest(spark, src, schema), view, ckpt,
      Seq("g"), Seq("x")) // batch 0 commits view#0
    // batch 1 arrives; a maintenance compaction wins the version claim
    // in the sink's commit window (the commitCrashPoint seam fires with
    // the manifest body staged, right before the publish — exactly
    // "compactor committed first"). The view sink is deliberately
    // single-attempt: overwrites do not commute, so it must FAIL with
    // the typed conflict rather than rebase a stale aggregate.
    mk(Seq((3L, "a", "3.30"))).write.mode("append").parquet(src)
    var fired = false
    VersionedTable.commitCrashPoint = () => if (!fired) {
      fired = true
      VersionedTable.compactTable(spark, view, targetFiles = 1)
    }
    val e = intercept[Throwable] {
      try Streams.viewIngest(Streams.fileIngest(spark, src, schema), view,
        ckpt, Seq("g"), Seq("x"))
      finally VersionedTable.commitCrashPoint = () => ()
    }
    assert(fired, "the conflict seam must have fired")
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .take(10).toSeq
    assert(chain.exists(_.isInstanceOf[ConcurrentCommitException]),
      s"the stream must die on the TYPED conflict, got: " +
        s"${chain.map(_.getClass.getSimpleName).mkString(" <- ")}")
    // the failed batch committed NOTHING: the compactor's version is
    // the latest, no view#1 tag exists, and the view still answers as
    // of batch 0 (fail-stop, never a torn refresh)
    val snaps1 = VersionedTable.snapshots(spark, view)
    assert(snaps1.last.operation === "compact" &&
      !snaps1.exists(_.operation == "view#1"),
      s"failed batch must leave no view version: ${snaps1.map(_.operation)}")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.select(col("g"), col("n_rows"), col("sum_x").cast("string"))
        .as[(String, Long, String)].collect()
        .map(t => t._1 -> ((t._2, BigDecimal(t._3)))).toMap
    assert(asMap(VersionedTable.read(spark, view)) ===
      Map("a" -> ((1L, BigDecimal("1.10"))), "b" -> ((1L, BigDecimal("2.20")))))
    // restart off the SAME checkpoint: batch 1 replays, finds no view#1
    // tag in the ledger, recomputes against the post-compaction latest,
    // and commits EXACTLY once — no duplicate fold, no lost batch
    Streams.viewIngest(Streams.fileIngest(spark, src, schema), view, ckpt,
      Seq("g"), Seq("x"))
    val snaps2 = VersionedTable.snapshots(spark, view)
    assert(snaps2.count(_.operation == "view#1") === 1,
      s"restart must commit the replayed batch exactly once: " +
        s"${snaps2.map(_.operation)}")
    assert(asMap(VersionedTable.read(spark, view)) ===
      asMap(IncrementalView.full(spark.read.parquet(src), Seq("g"), Seq("x"))),
      "the resumed view must equal the batch full recompute")
  }

  test("the versioned sink's ledger cursor makes per-batch manifest cost " +
      "O(new versions); replay, zombie tags, and recreation stay exact") {
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft-cursor")
    val table = s"$root/table"
    def b(i: Long) = Seq((100 * i, s"b$i")).toDF("id", "v")
    Streams.resetSinkCursors()
    (0L to 11L).foreach(i => Streams.processVersionedBatch(b(i), i, table))
    assert(VersionedTable.snapshots(spark, table).size === 12)
    // warm batch: manifest reads bounded by the scan window + latest()'s
    // checkpoint chain — NOT the 12-version history (the old code read
    // every manifest every batch, quadratic over a stream's lifetime)
    val before = VersionedTable.manifestReadCount.get()
    Streams.processVersionedBatch(b(12L), 12L, table)
    val warmReads = VersionedTable.manifestReadCount.get() - before
    assert(warmReads <= 8,
      s"a warm batch against a 12-version table must read O(new) " +
        s"manifests, got $warmReads")
    // replayed batch (tag far below the floor): no-op off the seen-set,
    // still O(new) reads
    val v0 = VersionedTable.snapshots(spark, table).size
    Streams.processVersionedBatch(Seq((999L, "dup")).toDF("id", "v"), 3L, table)
    assert(VersionedTable.snapshots(spark, table).size === v0,
      "a replayed batch must not re-commit")
    // ZOMBIE driver: a foreign process commits a future batch's tag
    // directly; the window scan must see it and no-op our delivery
    VersionedTable.appendTagged(Seq((777L, "zombie")).toDF("id", "v"),
      table, "append#13")
    Streams.processVersionedBatch(b(13L), 13L, table)
    assert(VersionedTable.snapshots(spark, table)
      .count(_.operation == "append#13") === 1,
      "a zombie-committed tag must suppress the local delivery")
    // COLD restart (new JVM simulated): full scan once, replay still no-ops
    Streams.resetSinkCursors()
    val v1 = VersionedTable.snapshots(spark, table).size
    Streams.processVersionedBatch(Seq((998L, "dup2")).toDF("id", "v"), 5L, table)
    assert(VersionedTable.snapshots(spark, table).size === v1,
      "after a cold restart the full scan must find the old tag")
    // RECREATION at the same path: the stale cursor must not serve the
    // dead incarnation's tags — batch 0 of the new table must commit
    val fs = new org.apache.hadoop.fs.Path(table).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(table), true)
    Streams.processVersionedBatch(Seq((1L, "fresh")).toDF("id", "v"), 0L, table)
    assert(VersionedTable.snapshots(spark, table).map(_.operation) ===
      Seq("append#0"),
      "a recreated table must accept batch 0 despite the stale cursor")
    assert(VersionedTable.read(spark, table).select("id")
      .as[Long].collect().toSet === Set(1L))
  }

  test("a recreated table that has GROWN PAST the old cursor floor is " +
      "still detected (identity, not version ordering)") {
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft-cursor2")
    val table = s"$root/table"
    def b(i: Long) = Seq((100 * i, s"b$i")).toDF("id", "v")
    Streams.resetSinkCursors()
    (0L to 5L).foreach(i => Streams.processVersionedBatch(b(i), i, table))
    // the sink idles; the table is deleted and recreated at the same
    // path by ANOTHER pipeline, and the new incarnation grows PAST the
    // old floor (6) before our sink wakes up — the version-ordering
    // heuristic alone would keep the dead incarnation's seen tags
    val fs = new org.apache.hadoop.fs.Path(table).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(table), true)
    VersionedTable.create(Seq((1L, "fresh")).toDF("id", "v"), table)
    (2L to 9L).foreach(i => VersionedTable.append(
      Seq((i, s"n$i")).toDF("id", "v"), table)) // latest = v9 > floor 6
    // redeliver batch 5: its append#5 tag collided in the DEAD
    // incarnation; the new one has never seen it — it must commit
    Streams.processVersionedBatch(b(5L), 5L, table)
    assert(VersionedTable.snapshots(spark, table)
      .count(_.operation == "append#5") === 1,
      "the new incarnation must accept a batch whose tag only the dead " +
        "incarnation had seen")
    assert(VersionedTable.read(spark, table).select("id")
      .as[Long].collect().toSet.contains(500L),
      "batch 5's rows must land in the recreated table")
  }

  test("file-source streaming reads the real events parquet") {
    // events.parquet carries TIMESTAMP(NANOS); read nanos as long
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"${SparkTestSession.sfTiny}/events.parquet").schema
    val stream = Streams.fileIngest(spark, SparkTestSession.sfTiny, schema,
      globFilter = Some("events.parquet"))
    assert(stream.isStreaming)
    val counted = stream.groupBy("event_type").agg(count(lit(1)).as("cnt"))
    Streams.runToMemory(counted, "file_out", OutputMode.Complete())
    val streamed = spark.table("file_out").as[(String, Long)].collect().toMap
    val batch = spark.read.parquet(s"${SparkTestSession.sfTiny}/events.parquet")
      .groupBy("event_type").count().as[(String, Long)].collect().toMap
    assert(streamed == batch)
  }

  // ----------------------------------------- change-feed source (round 16)

  test("changeFeedIngest tails a versioned table: batch-twin agreement, " +
      "checkpoint resume, replay no-op") {
    import graft.sources.{ChangeFeed, VersionedTable}
    val root = java.nio.file.Files.createTempDirectory("graft-cdfsrc")
    val (src, ckpt) = (s"$root/src", s"$root/ckpt")
    VersionedTable.create((0L until 100L).map(i => (i, s"v$i"))
      .toDF("id", "v").repartitionByRange(4, col("id")), src, Seq("id")) // v1
    VersionedTable.delete(spark, src, col("id") === 7L)                  // v2
    VersionedTable.update(spark, src, col("id") === 3L,
      Map("v" -> lit("UPD")))                                            // v3
    VersionedTable.append(Seq((500L, "new")).toDF("id", "v"), src,
      Seq("id"))                                                         // v4
    val emitted = scala.collection.mutable.Buffer[String]()
    val ranges = scala.collection.mutable.Buffer[(Long, Long)]()
    val n1 = Streams.changeFeedIngest(spark, src, Seq("id"), ckpt,
      maxVersionsPerBatch = 2) { (df, from, to) =>
        emitted ++= df.collect().map(_.toString); ranges += ((from, to))
      }
    assert(n1 === 3 && ranges.toSeq === Seq((0L, 1L), (1L, 3L), (3L, 4L)),
      s"initial snapshot batch then capped ranges; got $ranges")
    // twin: v1's rows as inserts + the batch reader over (1, 4]
    val twin = VersionedTable.snapshotAt(spark, src, 1L)
      .withColumn("_change_type", lit("insert"))
      .withColumn("_commit_version", lit(1L)).collect().map(_.toString) ++
      ChangeFeed.readChanges(spark, src, 1L, 4L, Seq("id"))
        .collect().map(_.toString)
    assert(emitted.sorted === twin.toSeq.sorted,
      "the streamed feed must equal the batch change feed row-for-row")
    // replay no-op: nothing new committed → zero batches, zero calls
    val n2 = Streams.changeFeedIngest(spark, src, Seq("id"), ckpt,
      maxVersionsPerBatch = 2) { (_, _, _) =>
        fail("a fully-committed range must never re-emit") }
    assert(n2 === 0)
    // resume: one new commit → exactly the new range, from the durable
    // cursor (no per-JVM state involved)
    VersionedTable.delete(spark, src, col("id") === 11L)                 // v5
    val tail = scala.collection.mutable.Buffer[(Long, Long, Set[String])]()
    val n3 = Streams.changeFeedIngest(spark, src, Seq("id"), ckpt,
      maxVersionsPerBatch = 2) { (df, from, to) =>
        tail += ((from, to, df.select("id", "_change_type")
          .collect().map(_.toString).toSet))
      }
    assert(n3 === 1 && tail.head._1 === 4L && tail.head._2 === 5L)
    assert(tail.head._3 === Set("[11,delete]"))
  }

  test("changeFeedIngest resets cold when the source table is a new " +
      "incarnation (UUID identity), not the old cursor's positions") {
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft-cdfsrc2")
    val (src, ckpt) = (s"$root/src", s"$root/ckpt")
    VersionedTable.create(Seq((1L, "a")).toDF("id", "v"), src, Seq("id"))
    VersionedTable.append(Seq((2L, "b")).toDF("id", "v"), src, Seq("id"))
    assert(Streams.changeFeedIngest(spark, src, Seq("id"), ckpt) {
      (_, _, _) => () } === 2)
    // recreate the table at the same path — new UUID, new history
    val p = new org.apache.hadoop.fs.Path(src)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    VersionedTable.create(Seq((9L, "z")).toDF("id", "v"), src, Seq("id"))
    val seen = scala.collection.mutable.Buffer[(Long, Long, Set[String])]()
    val n = Streams.changeFeedIngest(spark, src, Seq("id"), ckpt) {
      (df, from, to) =>
        seen += ((from, to, df.select("id").collect().map(_.toString).toSet))
    }
    assert(n === 1 && seen.head._1 === 0L && seen.head._2 === 1L,
      "a new incarnation must restart from the initial snapshot")
    assert(seen.head._3 === Set("[9]"),
      "the NEW incarnation's rows, not the dead one's positions")
  }

  test("CDC source -> SCD2 sink chain is exactly-once under a mid-chain " +
      "crash between the sink commit and the cursor advance") {
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft-cdfchain")
    val (src, dim, ckpt) = (s"$root/src", s"$root/dim", s"$root/ckpt")
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    VersionedTable.create(
      Seq((1L, "a1", t("2024-01-01 00:00:00")),
        (2L, "b1", t("2024-01-01 00:00:00"))).toDF("k", "v", "ts"),
      src, Seq("k"))                                                    // v1
    VersionedTable.merge(
      Seq((1L, "a2", t("2024-02-01 00:00:00"))).toDF("k", "v", "ts"),
      src, Seq("k"))                                                    // v2
    // the chain: current-state changes (inserts + post-images) fold into
    // the SCD2 dim, keyed by the range end — the sink's replay ledger
    def applyToDim(df: org.apache.spark.sql.DataFrame, to: Long): Unit = {
      val updates = df.filter(col("_change_type")
        .isin("insert", "update_postimage")).select("k", "v", "ts")
      Streams.processScdBatch(updates, batchId = to, Seq("k"), Seq("v"),
        "ts", dim)
    }
    // first pump CRASHES mid-chain: range (1,2]'s sink commit landed,
    // its cursor marker did not
    intercept[RuntimeException] {
      Streams.changeFeedIngest(spark, src, Seq("k"), ckpt,
        maxVersionsPerBatch = 2) { (df, _, to) =>
          applyToDim(df, to)
          if (to == 2L) sys.error("mid-chain crash after the sink commit")
        }
    }
    assert(graft.streaming.BatchLedger.committedIds(spark, dim)
      .contains(2L), "the crashed range's sink commit is durable")
    // recovery: the WAL intent replays (1,2] with the SAME range end, so
    // the sink finds batch 2 committed and skips — exactly-once
    val n = Streams.changeFeedIngest(spark, src, Seq("k"), ckpt,
      maxVersionsPerBatch = 2) { (df, _, to) => applyToDim(df, to) }
    assert(n === 1, "recovery replays exactly the crashed range")
    val cur = Streams.currentDim(spark, dim).get.filter(col("is_current"))
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(cur === Set((1L, "a2"), (2L, "b1")))
    val closed = Streams.currentDim(spark, dim).get
      .filter(!col("is_current")).select("k", "v")
      .as[(Long, String)].collect().toSet
    assert(closed === Set((1L, "a1")),
      "exactly one superseded version — a double-applied range would " +
        "close b1 or duplicate a1's closure")
    assert(graft.streaming.BatchLedger.committedIds(spark, dim).toSet ===
      Set(1L, 2L), "one dim snapshot per range, no extras")
  }
}
