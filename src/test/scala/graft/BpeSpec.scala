package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.HashExpressions
import graft.functions.Bpe

/** BPE merge induction vs a single-node reference implementation of the
  * Sennrich algorithm (count every adjacent position; merge greedy
  * left-to-right; ties lexicographic).
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- single-node reference ------------------------------------------
  private def refMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refLearn(words: Seq[(String, Long)],
      n: Int): Seq[(String, String, Long)] = {
    var dict = words.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val merges = Seq.newBuilder[(String, String, Long)]
    var k = 0
    var done = false
    while (k < n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((syms, f) <- dict; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((l, r, c))
        dict = dict.map { case (s, f) => (refMerge(s, l, r), f) }
        k += 1
      }
    }
    merges.result()
  }

  private def refPieces(w: String, merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(w.map(_.toString).toVector) { case (s, (l, r)) => refMerge(s, l, r) }

  // ---- pairMerge kernel ------------------------------------------------
  test("pairMerge: greedy left-to-right, overlap resumes AFTER the merge") {
    def m(syms: Seq[String], l: String, r: String): Seq[String] =
      Seq(Tuple1(syms)).toDF("s")
        .select(HashExpressions.pairMerge(col("s"), l, r).as("o"))
        .as[Seq[String]].head()
    assert(m(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(m(Seq("a", "a", "a", "a"), "a", "a") === Seq("aa", "aa"))
    assert(m(Seq("t", "h", "e"), "t", "h") === Seq("th", "e"))
    assert(m(Seq("t", "h", "e"), "h", "e") === Seq("t", "he"))
    assert(m(Seq("x", "y"), "a", "b") === Seq("x", "y"))
    assert(m(Seq("a"), "a", "a") === Seq("a"))
    assert(m(Seq.empty[String], "a", "b") === Seq.empty[String])
    // merged pair does not cascade within the same step
    assert(m(Seq("a", "b", "a", "b"), "a", "b") === Seq("ab", "ab"))
  }

  test("pairMerge matches refMerge on random symbol sequences") {
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("a", "b", "c")
    val cases = Seq.fill(60)(Vector.fill(rnd.nextInt(10) + 1)(
      alphabet(rnd.nextInt(3))))
    val df = cases.map(Tuple1(_)).toDF("s")
    for (l <- alphabet; r <- alphabet) {
      val got = df.select(HashExpressions.pairMerge(col("s"), l, r).as("o"))
        .as[Seq[String]].collect()
      val want = cases.map(refMerge(_, l, r))
      assert(got.map(_.toVector).toSeq === want, s"pair ($l,$r)")
    }
  }

  // ---- learnMerges vs reference ----------------------------------------
  test("learnMerges reproduces the reference merge table exactly (ties included)") {
    // 'lo' appears in low/lower/lowest; 'er'/'es' force count ties that
    // must break lexicographically
    val corpus = Seq(
      "low low low low low",
      "lower lower",
      "lowest lowest lowest",
      "new new new newer newer wider")
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val wordFreqs = corpus.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, ws) => (w, ws.size.toLong) }.toSeq
    val want = refLearn(wordFreqs, 8)
    // force the DISTRIBUTED rounds (threshold 0) — the driver path is
    // structurally the reference and is covered by the agreement test
    val got = Bpe.learnMerges(docs, "text", 8, driverMaxWords = 0)
      .orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === want)
  }

  test("distributed rounds shuffle O(affected words) per merge, not O(dictionary)") {
    // 2000 distinct digit words (the bulk of the dictionary) plus one
    // hot letter word driving the first merge: rounds after the initial
    // full aggregation must re-count ONLY words containing the merged
    // pair, so extra merges add shuffle records proportional to the
    // affected family — a fraction of the dictionary — per round. The
    // old implementation re-aggregated every word's pairs every round
    // (~6000 shuffle records per merge here), which this bound catches.
    val filler = (0 until 2000).map(i => f"$i%04d")
    val corpus = (Seq.fill(200)("zzzz") ++ filler).mkString(" ")
    val docs = Seq((1L, corpus)).toDF("doc_id", "text")
    def shuffleRecords(body: => Unit): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) acc.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        body
        org.apache.spark.graft.ListenerSync.waitUntilEmpty(spark.sparkContext)
      } finally spark.sparkContext.removeSparkListener(l)
      acc.get()
    }
    def run(n: Int): Long = shuffleRecords {
      Bpe.learnMerges(docs, "text", n, driverMaxWords = 0).collect()
    }
    val one = run(1)
    val five = run(5)
    // 4 extra merges: each may touch at most a few-hundred-word family
    // (one digit pair spans ~60 words; the z-family is 1 word) plus the
    // ~100-row pair store. The full dictionary re-count would add
    // ~6000 records per round; require the increment to stay well under
    // ONE such round per 4 merges.
    assert(five - one < 4000,
      s"per-merge shuffle grew like O(dictionary): $one -> $five records")
    // and the result is still exactly the reference sequence
    val got = Bpe.learnMerges(docs, "text", 5, driverMaxWords = 0)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val wordFreqs = corpus.split(" ").groupBy(identity)
      .map { case (w, ws) => (w, ws.size.toLong) }.toSeq
    assert(got === refLearn(wordFreqs, 5))
  }

  test("distributed rounds materialize O(affected) rows per merge, never the dictionary") {
    // same fixture as the shuffle bound: 2001 distinct words, the first
    // merges touch the 1-word z-family and ≤ ~150-word digit families.
    // The per-round row sets the loop checkpoints (affected + the
    // touched overlay) must stay a fraction of the dictionary — the old
    // implementation re-materialized all 2001 words EVERY round
    val filler = (0 until 2000).map(i => f"$i%04d")
    val corpus = (Seq.fill(200)("zzzz") ++ filler).mkString(" ")
    val docs = Seq((1L, corpus)).toDF("doc_id", "text")
    val sink = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    Bpe.learnMergesInstrumented(docs, "text", 5, driverMaxWords = 0,
      metricsSink = Some(sink)).collect()
    val m = sink.toSeq
    assert(m.size === 5)
    m.zipWithIndex.foreach { case ((aff, touched), i) =>
      assert(aff < 600, s"round $i affected=$aff looks like a dictionary pass")
      assert(touched < 1000, s"round $i overlay=$touched looks like a dictionary pass")
    }
  }

  test("driver and distributed paths agree merge-for-merge") {
    val docs = Seq(
      (1L, "banana bandana cabana"),
      (2L, "banana banana bans"),
      (3L, "nab ban nan aa aa aa")).toDF("doc_id", "text")
    def run(threshold: Long) =
      Bpe.learnMerges(docs, "text", 10, driverMaxWords = threshold)
        .orderBy("rank")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(run(0) === run(Long.MaxValue))
  }

  test("driver path breaks ties in UTF-8 binary order like Spark, not UTF-16") {
    // (U+E000, x) ties (U+1F600, x) on count. Code points: E000 < 1F600
    // (UTF-8 binary order, what Spark's orderBy compares), but in UTF-16
    // code units the emoji's lead surrogate D83D < E000 — a naive Scala
    // string minBy would pick the opposite winner on the driver path
    val pua = "\uE000"
    val emoji = new String(Character.toChars(0x1F600))
    val docs = Seq((1L, s"${pua}x ${emoji}x")).toDF("doc_id", "text")
    def first(threshold: Long) =
      Bpe.learnMerges(docs, "text", 1, driverMaxWords = threshold)
        .select("merge_left").as[String].head()
    assert(first(Long.MaxValue) === pua, "driver path must pick the UTF-8-smaller pair")
    assert(first(0) === first(Long.MaxValue), "paths must agree on the tie")
  }

  test("learnMerges stops early when no pairs remain") {
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    // single-char words: one merge of... none — no word has 2+ symbols
    val got = Bpe.learnMerges(docs, "text", 5).collect()
    assert(got.isEmpty)
  }

  // ---- application ------------------------------------------------------
  test("pieces replays the learned merges identically to the reference") {
    val words = Seq("low", "lower", "lowest", "newer", "wider", "unseen")
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er"))
    val got = words.map(Tuple1(_)).toDF("w")
      .select(Bpe.pieces(col("w"), merges).as("p"))
      .as[Seq[String]].collect().map(_.toVector)
    val want = words.map(refPieces(_, merges))
    assert(got.toSeq === want)
  }

  test("compressionStats: pieces never exceed chars, cover all tokens") {
    val docs = Seq((1L, "low lower"), (2L, "lowest low")).toDF("doc_id", "text")
    val merges = Seq(("l", "o"), ("lo", "w"))
    val rows = Bpe.compressionStats(docs, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // doc 1: low -> [low]=1 piece, lower -> [low,e,r]=3 pieces
    assert(rows(1L) === ((2L, 4L)))
    // doc 2: lowest -> [low,e,s,t]=4, low -> [low]=1
    assert(rows(2L) === ((2L, 5L)))
  }
}
