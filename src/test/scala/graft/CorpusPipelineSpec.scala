package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.CorpusPipeline

class CorpusPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, SparkTestSession.sfTiny)

  test("annotate adds lang, token count, and quality without dropping rows") {
    val a = CorpusPipeline.annotate(docs)
    assert(a.count() == docs.count())
    assert(Seq("pred_lang", "n_tokens", "quality").forall(a.columns.contains))
    assert(a.filter(col("quality") < 0 || col("quality") > 1).isEmpty)
  }

  test("qualityFilter keeps only whitelisted predicted language above thresholds") {
    val a = CorpusPipeline.annotate(docs)
    val f = CorpusPipeline.qualityFilter(a,
      CorpusPipeline.Config(langs = Seq("en"), minQuality = 0.3, minTokens = 5))
    assert(f.count() > 0 && f.count() < docs.count())
    assert(f.filter(col("pred_lang") =!= "en").isEmpty)
    assert(f.filter(col("quality") < 0.3).isEmpty)
  }

  test("exactDedup keeps exactly one doc per identical text, smallest id") {
    val withClones = docs.limit(50).unionByName(
      docs.limit(10).withColumn("doc_id", col("doc_id") + 100000L))
    val out = CorpusPipeline.exactDedup(withClones)
    assert(out.count() == 50) // every clone dropped
    assert(out.filter(col("doc_id") >= 100000L).isEmpty) // smallest id wins
    // and distinct texts are all preserved
    assert(out.select("text").distinct().count() ==
      withClones.select("text").distinct().count())
  }

  test("nearDedup drops the larger id of each near-duplicate pair") {
    val pairs = graft.dedup.MinHashDedup
      .nearDuplicates(docs, "doc_id", "text", threshold = 0.8)
      .as[(Long, Long, Double)].collect()
    val out = CorpusPipeline.nearDedup(docs, threshold = 0.8)
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(out.count() < docs.count() || pairs.isEmpty)
    pairs.foreach { case (a, b, _) =>
      assert(!kept.contains(math.max(a, b)), s"loser of ($a,$b) still present")
      }
  }

  test("full chain with transitive near-dedup equals brute-Jaccard + union-find oracle") {
    // the q42 registration path: annotate → gate → exact dedup → MinHash
    // near-dedup with transitive clustering — checked against an
    // exhaustive O(n²) Jaccard pair scan + driver union-find
    val cfg = CorpusPipeline.Config(
      langs = Seq("en"), minQuality = 0.5, minTokens = 10, nearDupThreshold = 0.8)
    val exact = CorpusPipeline.exactDedup(
      CorpusPipeline.qualityFilter(CorpusPipeline.annotate(docs), cfg))
    val got = CorpusPipeline.nearDedup(exact, cfg.nearDupThreshold, transitive = true)
      .select("doc_id").as[Long].collect().toSet

    val pairs = graft.dedup.MinHashDedup
      .bruteForcePairs(exact, "doc_id", "text", cfg.nearDupThreshold)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElseUpdate(r, r) != r) r = parent(r)
      var c = x
      while (c != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val losers = parent.keys.filter(k => find(k) != k).toSet
    val expected = exact.select("doc_id").as[Long].collect().toSet -- losers
    assert(pairs.nonEmpty, "testdata must contain near-duplicate clusters")
    assert(got == expected,
      s"transitive survivors diverge: missing=${expected -- got}, extra=${got -- expected}")
  }

  test("tokenBudget keeps the maximal in-order prefix within budget, per group") {
    val df = Seq(
      ("en", 1L, 400), ("en", 2L, 400), ("en", 3L, 400), // cum 400/800/1200
      ("fr", 4L, 900), ("fr", 5L, 200))                  // cum 900/1100
      .toDF("lang", "doc_id", "n_tokens")
    val kept = CorpusPipeline.tokenBudget(df, "lang", "n_tokens", 1000L,
      Seq(col("doc_id").asc))
      .select("doc_id").as[Long].collect().toSet
    // en: 1,2 fit (800), 3 crosses; fr: 4 fits (900), 5 crosses
    assert(kept == Set(1L, 2L, 4L))
    // per-group totals never exceed the budget
    val sums = CorpusPipeline.tokenBudget(df, "lang", "n_tokens", 1000L,
      Seq(col("doc_id").asc))
      .groupBy("lang").agg(sum("n_tokens").as("s"))
      .as[(String, Long)].collect()
    assert(sums.forall(_._2 <= 1000L))
  }

  test("datasetSplit is deterministic, complete, and near the target fractions") {
    val split = CorpusPipeline.datasetSplit(docs, "doc_id", 0.1, 0.1)
    val counts = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts.values.sum == docs.count())
    val n = docs.count().toDouble
    // md5 is uniform; 500 ids at 10% → binomial sd ≈ 6.7, allow ±4 sd
    assert(math.abs(counts.getOrElse("val", 0L) - 0.1 * n) < 27,
      s"val fraction off: $counts")
    assert(math.abs(counts.getOrElse("test", 0L) - 0.1 * n) < 27,
      s"test fraction off: $counts")
    // re-run gives the identical assignment (no RNG anywhere)
    val again = CorpusPipeline.datasetSplit(docs, "doc_id", 0.1, 0.1)
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(again == split.select("doc_id", "split").as[(Long, String)].collect().toSet)
  }

  test("stratifiedSample is deterministic, rate-accurate, and nested across rates") {
    val base = docs.select(col("doc_id"), col("lang"))
    val half = CorpusPipeline.stratifiedSample(base, "lang", "doc_id",
      Map("en" -> 0.5))
      .select("doc_id").as[Long].collect().toSet
    val quarter = CorpusPipeline.stratifiedSample(base, "lang", "doc_id",
      Map("en" -> 0.25))
      .select("doc_id").as[Long].collect().toSet
    val nEn = docs.filter(col("lang") === "en").count().toDouble
    // md5 uniformity: binomial sd at 0.5 ≈ sqrt(n)/2; allow ±4 sd
    assert(math.abs(half.size - 0.5 * nEn) < 2 * math.sqrt(nEn) + 1)
    // thresholds nest: the 25% sample is a strict subset of the 50% one
    assert(quarter.subsetOf(half))
    assert(quarter.size < half.size)
    // keep-all stratum and absent strata
    val mixed = CorpusPipeline.stratifiedSample(base, "lang", "doc_id",
      Map("fr" -> 1.0))
    assert(mixed.count() == docs.filter(col("lang") === "fr").count())
    assert(mixed.filter(col("lang") =!= "fr").isEmpty)
    // determinism: identical set on re-run
    val again = CorpusPipeline.stratifiedSample(base, "lang", "doc_id",
      Map("en" -> 0.5)).select("doc_id").as[Long].collect().toSet
    assert(again == half)
  }

  test("packSequences assigns starting sequence and offset per doc, greedy in order") {
    val df = Seq(
      ("en", 1L, 1000), ("en", 2L, 1000), ("en", 3L, 500), ("en", 4L, 100),
      ("fr", 5L, 3000))
      .toDF("lang", "doc_id", "n_tokens")
    val out = CorpusPipeline.packSequences(df, "lang", "n_tokens", 2048L,
      Seq(col("doc_id").asc))
      .select("doc_id", "seq_id", "seq_offset")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // en start offsets: 0, 1000, 2000, 2500 → seqs 0,0,0,1
    assert(out(1L) == ((0L, 0L)))
    assert(out(2L) == ((0L, 1000L)))
    assert(out(3L) == ((0L, 2000L))) // straddles the 2048 boundary: starts in seq 0
    assert(out(4L) == ((1L, 452L)))  // 2500 - 2048
    // groups pack independently
    assert(out(5L) == ((0L, 0L)))
    // determinism: re-run identical
    val again = CorpusPipeline.packSequences(df, "lang", "n_tokens", 2048L,
      Seq(col("doc_id").asc)).select("doc_id", "seq_id", "seq_offset")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(again == out)
  }

  test("property: packSequences invariants hold on random corpora") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val rowGen = Gen.zip(Gen.choose(0L, 100L), Gen.oneOf("en", "fr"), Gen.choose(1, 500))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withInitialSeed(5L),
      Prop.forAll(Gen.nonEmptyListOf(rowGen), Gen.choose(64L, 1024L)) { (rows, seqLen) =>
        val docs = rows.distinctBy(_._1)
        val df = docs.toDF("doc_id", "lang", "n_tokens")
        val got = CorpusPipeline.packSequences(df, "lang", "n_tokens", seqLen,
          Seq(col("doc_id").asc))
          .select("doc_id", "lang", "n_tokens", "seq_id", "seq_offset")
          .as[(Long, String, Int, Long, Long)].collect()
        // per group in id order: each doc starts at the running token sum,
        // seq_id/seq_offset are exactly its div/mod by seqLen
        got.groupBy(_._2).forall { case (_, g) =>
          var start = 0L
          g.sortBy(_._1).forall { case (_, _, n, seqId, off) =>
            val ok = seqId == start / seqLen && off == start % seqLen &&
              off >= 0 && off < seqLen
            start += n
            ok
          }
        }
      })
    assert(res.passed, s"packSequences property: ${res.status}")
  }

  test("familiarityScore is the exact mean corpus frequency; topK caps the vocab") {
    val df = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    // freqs: a=3, b=1, c=1; total=5
    val full = CorpusPipeline.familiarityScore(df, "doc_id", "text")
      .select("doc_id", "sum_freq", "n_tokens", "familiarity")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(full(1L) == ((7L, 3L, 7.0 / 15.0)))
    assert(full(2L) == ((4L, 2L, 4.0 / 10.0)))
    // topK=1 keeps only 'a'; out-of-vocab tokens contribute 0 but the
    // total stays the full corpus count
    val capped = CorpusPipeline.familiarityScore(df, "doc_id", "text", topK = 1)
      .select("doc_id", "sum_freq", "familiarity")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(capped(1L) == ((6L, 6.0 / 15.0)))
    assert(capped(2L) == ((3L, 3.0 / 10.0)))
  }

  test("vocabulary ranks by frequency with lexicographic ties and exact coverage") {
    val df = Seq(
      (1L, "b b b a a c"),
      (2L, "a d b")).toDF("doc_id", "text")
    // freqs: b=4, a=3, d=1, c=1 (9 tokens); ties d/c break lexicographically
    val got = CorpusPipeline.vocabulary(df, "text", topK = 3)
      .as[(String, Long, Long, Double)].collect().toList
    assert(got == List(
      ("b", 1L, 4L, 4.0 / 9.0),
      ("a", 2L, 3L, 7.0 / 9.0),
      ("c", 3L, 1L, 8.0 / 9.0)))
  }

  test("oovStats computes exact out-of-vocab fractions vs the top-K vocab") {
    val df = Seq(
      (1L, "b b b a a c"),
      (2L, "a d b")).toDF("doc_id", "text")
    // top-2 vocab = {b, a}; doc 1: 6 tokens, 1 OOV (c); doc 2: 3 tokens, 1 OOV (d)
    val got = CorpusPipeline.oovStats(df, "doc_id", "text", topK = 2)
      .select("doc_id", "n_tokens", "n_oov", "oov_frac")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((6L, 1L, 1.0 / 6.0)))
    assert(got(2L) == ((3L, 1L, 1.0 / 3.0)))
  }

  test("temperatureSample upweights small sources, caps at 1, stays deterministic") {
    // source A: ids 0..199 (200 docs), source B: ids 1000..1009 (10 docs)
    val df = ((0L until 200L).map(i => (i, "A")) ++
      (1000L until 1010L).map(i => (i, "B"))).toDF("doc_id", "source")
    val s = CorpusPipeline.temperatureSample(df, "source", "doc_id",
      targetFrac = 0.2, alpha = 0.5)
    val bySource = s.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    // rate_A = 0.2*sqrt(200/200) = 0.2; rate_B = 0.2*sqrt(200/10) ≈ 0.894
    // -> B keeps far more than 20% of its docs
    assert(bySource.getOrElse("B", 0L) >= 6L,
      s"small source must be upweighted, got $bySource")
    assert(bySource("A") < 80L, "large source must be near targetFrac")
    // alpha=1 keeps natural proportions: every rate = targetFrac
    val nat = CorpusPipeline.temperatureSample(df, "source", "doc_id",
      targetFrac = 1.0, alpha = 1.0)
    assert(nat.count() == 210L, "targetFrac=1, alpha=1 must keep everything")
    // re-run = exact same rows (hash-threshold, no RNG)
    val again = CorpusPipeline.temperatureSample(df, "source", "doc_id",
      targetFrac = 0.2, alpha = 0.5)
    assert(s.select("doc_id").as[Long].collect().toSet ==
      again.select("doc_id").as[Long].collect().toSet)
  }

  test("run with mixTargetFrac applies the final mixing stage and reports it") {
    val r = CorpusPipeline.run(docs,
      CorpusPipeline.Config(mixTargetFrac = Some(0.5)))
    assert(r.afterMix.isDefined)
    assert(r.afterMix.get <= r.afterNear)
    assert(r.afterMix.get > 0, "mixing at 0.5 must keep a nonempty corpus")
    assert(r.output.count() == r.afterMix.get)
    r.output.unpersist()
  }

  test("run chains the stages and reports monotone retention") {
    val r = CorpusPipeline.run(docs,
      CorpusPipeline.Config(langs = Seq("en"), minQuality = 0.2, minTokens = 5))
    assert(r.input >= r.afterFilter)
    assert(r.afterFilter >= r.afterExact)
    assert(r.afterExact >= r.afterNear)
    assert(r.afterNear > 0)
    assert(r.output.count() == r.afterNear)
  }

  test("chunk: hand-computed overlapping windows, short tail, full token coverage") {
    val d = Seq((1L, "a b c d e"), (2L, "x")).toDF("doc_id", "text")
    val out = CorpusPipeline.chunk(d, "doc_id", "text", chunkTokens = 3, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(out === Set(
      (1L, 0L, 3L, "a b c"),
      (1L, 1L, 3L, "c d e"),
      (1L, 2L, 1L, "e"),
      (2L, 0L, 1L, "x")))
    // stride == chunkTokens partitions the doc exactly (no overlap, no loss)
    val exact = CorpusPipeline.chunk(d.filter($"doc_id" === 1), "doc_id", "text", 2, 2)
      .orderBy("chunk_idx").select("chunk_text").as[String].collect()
    assert(exact === Array("a b", "c d", "e"))
    assert(exact.mkString(" ") === "a b c d e", "concatenated chunks rebuild the doc")
  }

  test("chunk is a map-only plan (zero exchanges)") {
    val d = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val plan = CorpusPipeline.chunk(d, "doc_id", "text", 3, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunk must not shuffle:\n$plan")
  }
}
