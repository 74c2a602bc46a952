package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Relevance

class RelevanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "join hash join scan filter row"),
    (2L, "hash hash hash batch window"),
    (3L, "scan scan merge sort column line"),
    (4L, "completely unrelated words only here"),
    (5L, "join"))
  private val terms = Seq("join", "hash", "scan")

  /** Scala-computed oracle mirroring the operator's documented formula. */
  private def brute(logIdf: Boolean): Map[Long, (Long, Double)] = {
    val toks = corpus.map { case (id, t) => id -> t.trim.split(" ", -1).toSeq }
    val nDocs = toks.size.toDouble
    val avgdl = toks.map(_._2.size).sum.toDouble / nDocs
    val dfm = terms.map(t => t -> toks.count(_._2.contains(t)).toDouble).toMap
    toks.flatMap { case (id, w) =>
      val tfs = terms.map(t => w.count(_ == t))
      if (tfs.forall(_ == 0)) None
      else {
        val score = terms.zip(tfs).map { case (t, tf) =>
          if (tf == 0) 0.0
          else {
            val rational = (nDocs - dfm(t) + 0.5) / (dfm(t) + 0.5)
            val idf = if (logIdf) math.log(1.0 + rational) else rational
            idf * ((tf.toDouble * 2.2) /
              (tf.toDouble + 1.2 * (0.25 + 0.75 * (w.size.toDouble / avgdl))))
          }
        }.reduceLeft(_ + _)
        Some(id -> ((tfs.count(_ > 0).toLong, score)))
      }
    }.toMap
  }

  private def run(logIdf: Boolean): Map[Long, (Long, Double)] =
    Relevance.bm25(corpus.toDF("doc_id", "text"), "doc_id", "text", terms,
        logIdf = logIdf)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("log-idf BM25 matches a Scala-computed oracle bit-exactly") {
    assert(run(logIdf = true) == brute(logIdf = true))
  }

  test("rational-idf BM25 matches its oracle; only matching docs are scored") {
    val got = run(logIdf = false)
    assert(got == brute(logIdf = false))
    assert(!got.contains(4L), "doc sharing no query term must not surface")
    assert(got(5L)._1 == 1L)
  }

  test("per-term ranking agrees between log and rational idf (ln is monotone)") {
    // single-term query: ordering by score must be identical across variants
    def ranking(logIdf: Boolean) =
      Relevance.bm25(corpus.toDF("doc_id", "text"), "doc_id", "text",
          Seq("hash"), logIdf = logIdf)
        .orderBy(col("score").desc, col("doc_id"))
        .select("doc_id").as[Long].collect().toSeq
    assert(ranking(logIdf = true) == ranking(logIdf = false))
  }

  test("the query-term filter runs before the postings shuffle") {
    val docs = Tables.documents(spark, SparkTestSession.sfTiny)
    // the postings stage (pre-checkpoint): exactly ONE shuffle, and the
    // isin filter sits BELOW it (deeper in the printed tree) — the
    // shuffle carries query-term postings, not the corpus token stream
    val pp = Relevance.postings(docs, "doc_id", "text", terms)
      .queryExecution.executedPlan.toString
    assert("(?<!Broadcast)Exchange".r.findAllIn(pp).size == 1,
      s"postings must shuffle exactly once:\n$pp")
    val exIdx = pp.indexOf("Exchange")
    val fIdx = pp.indexOf("Filter")
    assert(fIdx > exIdx && pp.substring(fIdx).contains("__term"),
      s"isin(queryTerms) filter must run below the shuffle:\n$pp")
    // the full operator after its checkpoint barrier: score pivot, df
    // row and stats only — no shuffle re-runs the explode
    val p = Relevance.bm25(docs, "doc_id", "text", terms, logIdf = false)
      .queryExecution.executedPlan.toString
    val shuffles = "(?<!Broadcast)Exchange".r.findAllIn(p).size
    assert(shuffles <= 2, s"unexpected extra shuffle ($shuffles):\n$p")
  }

  test("rrf: hand-computed fusion, missing ids contribute zero, ties pinned by id") {
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "rnk")
    val b = Seq((2L, 1L), (4L, 2L)).toDF("doc_id", "rnk")
    val out = Relevance.rrf(Seq(a, b), "doc_id", "rnk", k = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._4)
    // scores: id2 = 1/62 + 1/61 (in both lists), id1 = 1/61, id4 = 1/62, id3 = 1/63
    assert(out.map(_._1) === Array(2L, 1L, 4L, 3L))
    assert(out.map(_._2) === Array(2L, 1L, 1L, 1L))
    val eps = 1e-15
    assert(math.abs(out(0)._3 - (1.0 / 62 + 1.0 / 61)) < eps)
    assert(math.abs(out(1)._3 - 1.0 / 61) < eps)
    // exact same-score tie between two single-list ids at the same rank
    // breaks on the id
    val c = Seq((9L, 1L)).toDF("doc_id", "rnk")
    val d = Seq((5L, 1L)).toDF("doc_id", "rnk")
    val tied = Relevance.rrf(Seq(c, d), "doc_id", "rnk")
      .orderBy("fused_rank").select("doc_id").as[Long].collect()
    assert(tied === Array(5L, 9L))
  }
}
