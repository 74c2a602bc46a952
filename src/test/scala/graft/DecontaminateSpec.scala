package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Decontaminate
import graft.functions.TextFunctions
import graft.pipeline.CorpusPipeline

class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, SparkTestSession.sfTiny)

  private def gramSets(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), array_distinct(
        TextFunctions.shingles(TextFunctions.tokens(col("text")), 8)).as("gs"))

  test("overlapStats matches a brute-force n-gram intersection oracle") {
    val bench = docs.filter(col("doc_id") % 10 === 7)
    val train = docs.filter(col("doc_id") % 10 =!= 7)
    val benchSet = gramSets(bench).select(explode(col("gs")))
      .distinct().as[String].collect().toSet
    val brute = gramSets(train).as[(Long, Seq[String])].collect()
      .map { case (id, gs) => id -> (gs.size, gs.count(benchSet.contains)) }
      .toMap
    val got = Decontaminate.overlapStats(train, bench, "doc_id", "text", "text", n = 8)
      .select("doc_id", "n_grams", "n_hits").as[(Long, Int, Long)].collect()
    assert(got.length == brute.size, "one stats row per training doc")
    got.foreach { case (id, nGrams, nHits) =>
      assert((nGrams, nHits.toInt) == brute(id), s"doc $id diverges from brute force")
    }
  }

  test("a planted benchmark leak is flagged and dropped; clean docs survive") {
    val train = docs.limit(30)
    // benchmark contains one training doc verbatim (the leak) plus an
    // unrelated doc — only the leaked doc may be convicted
    val leaked = train.filter(col("doc_id") === train.select(min("doc_id"))
      .as[Long].head())
    val leakedId = leaked.select("doc_id").as[Long].head()
    val bench = leaked.select(col("text"))
      .union(Seq("totally unrelated benchmark question with no overlap at all here really")
        .toDF("text"))
    val stats = Decontaminate.overlapStats(train, bench, "doc_id", "text", "text", n = 8)
    val flagged = stats.filter(col("contaminated")).select("doc_id").as[Long].collect().toSet
    assert(flagged.contains(leakedId), "the verbatim leak must be flagged")
    val out = Decontaminate.decontaminate(train, bench, "doc_id", "text", "text", n = 8)
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(leakedId))
    assert(kept ++ flagged == train.select("doc_id").as[Long].collect().toSet,
      "exactly the flagged docs are dropped")
  }

  test("benchmarkReport counts contaminating train docs per eval item") {
    val long1 = "one two three four five six seven eight nine ten eleven twelve"
    val long2 = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo"
    val train = Seq((1L, long1), (2L, long1 + " extra tail"), (3L, long2))
      .toDF("doc_id", "text")
    // bench 100 leaks long1 (train docs 1 and 2 both share its grams);
    // bench 101 is clean
    val bench = Seq((100L, long1),
      (101L, "totally unrelated benchmark item with no shared grams at all here"))
      .toDF("doc_id", "text")
    val got = Decontaminate.benchmarkReport(train, bench,
      "doc_id", "text", "doc_id", "text", n = 8)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // long1 has 5 8-grams, all shared with train docs 1 and 2
    assert(got(100L) == ((2L, 5L)), s"got $got")
    assert(got(101L) == ((0L, 0L)))
  }

  test("docs shorter than the n-gram length are never contaminated") {
    val train = Seq((1L, "too short"), (2L, "a b c d e f g")).toDF("doc_id", "text")
    val bench = Seq("too short and also a b c d e f g padded out to eight tokens easily")
      .toDF("text")
    val stats = Decontaminate.overlapStats(train, bench, "doc_id", "text", "text", n = 8)
      .as[(Long, Int, Long, Boolean)].collect().toMap2
    assert(stats(1L) == ((0, 0L, false)))
    assert(stats(2L) == ((0, 0L, false)))
  }

  implicit class Tuple4Ops(rows: Array[(Long, Int, Long, Boolean)]) {
    def toMap2: Map[Long, (Int, Long, Boolean)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("property: overlapStats matches a Scala-computed oracle on random docs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val word = Gen.oneOf("alpha", "bravo", "charlie", "delta", "echo")
    val docGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(0L, 40L),
      Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withInitialSeed(11L),
      Prop.forAll(docGen, Gen.choose(0L, 40L)) { (rows, cut) =>
        val docs = rows.distinctBy(_._1)
        val (trainRows, benchRows) = docs.partition(_._1 < cut)
        def grams(t: String): Set[String] =
          t.split(" ").toSeq.sliding(4).filter(_.size == 4).map(_.mkString(" ")).toSet
        val benchSet = benchRows.flatMap(r => grams(r._2)).toSet
        val expected = trainRows.map { case (id, t) =>
          val g = grams(t); id -> ((g.size, g.count(benchSet.contains).toLong))
        }.toMap
        val train = trainRows.toDF("doc_id", "text")
        val bench = benchRows.toDF("doc_id", "text")
        val got = Decontaminate.overlapStats(train, bench, "doc_id", "text", "text", n = 4)
          .select("doc_id", "n_grams", "n_hits").as[(Long, Int, Long)]
          .collect().map(r => r._1 -> ((r._2, r._3))).toMap
        got == expected
      })
    assert(res.passed, s"overlapStats property: ${res.status}")
  }

  test("run with a benchmarks config decontaminates and reports the stage count") {
    val bench = docs.filter(col("doc_id") % 10 === 7).select(col("text"))
    val r = CorpusPipeline.run(docs.filter(col("doc_id") % 10 =!= 7),
      CorpusPipeline.Config(langs = Seq("en"), minQuality = 0.2, minTokens = 5,
        benchmarks = Some(bench)))
    assert(r.afterDecontam.isDefined)
    assert(r.afterDecontam.get <= r.afterNear)
    assert(r.output.count() == r.afterDecontam.get)
  }

  test("repetition signals match hand-computed values and gate in the chain") {
    val df = Seq(
      (1L, "spam spam spam spam"),              // one token repeated 4x
      (2L, "a b a b a b"),                      // 2-grams: "a b" x3, "b a" x2
      (3L, "all tokens here are fully distinct"))
      .toDF("doc_id", "text")
    val r = CorpusPipeline.annotateRepetition(df)
      .select("doc_id", "dup_2gram_frac", "top_2gram_frac", "top_token_frac")
      .as[(Long, Double, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // doc 1: 3 2-grams all "spam spam" → dup 2/3, top 3/3; top token 4/4
    assert(r(1L) == ((2.0 / 3.0, 1.0, 1.0)))
    // doc 2: 5 2-grams {ab,ba,ab,ba,ab} → dup 3/5, top 3/5; top token 3/6
    assert(r(2L) == ((3.0 / 5.0, 3.0 / 5.0, 0.5)))
    // doc 3: no repeats → dup 0, top 1/5; top token 1/6
    assert(r(3L) == ((0.0, 1.0 / 5.0, 1.0 / 6.0)))
    // the gate drops the boilerplate docs, keeps the clean one
    val gated = CorpusPipeline.repetitionFilter(df,
      CorpusPipeline.Config(maxDupNgramFrac = 0.5))
    assert(gated.select("doc_id").as[Long].collect().toSet == Set(3L))
    assert(gated.columns.toSeq == df.columns.toSeq, "gate must not leak its columns")
    // thresholds at 1.0 disable the gate entirely
    assert(CorpusPipeline.repetitionFilter(df, CorpusPipeline.Config()).count() == 3)
  }

  test("annotateRepetition rejects inputs already carrying its output columns") {
    import org.apache.spark.sql.functions.lit
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
      .withColumn("dup_2gram_frac", lit(0.25))
    // before the guard, withColumn silently overwrote the user's column
    // and repetitionFilter then dropped it — data loss without an error
    val ex = intercept[IllegalArgumentException] {
      CorpusPipeline.annotateRepetition(df)
    }
    assert(ex.getMessage.contains("dup_2gram_frac"))
  }
}
