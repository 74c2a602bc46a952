package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{Dedup, MinHashDedup}
import graft.expressions.HashExpressions
import graft.functions.TextFunctions

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val docs = Tables.documents(spark, SparkTestSession.sfTiny)

  test("MinHash LSH finds the same near-dup pairs as brute force at j >= 0.8") {
    // With 16 bands x 4 rows, P(candidate | j=0.8) ≈ 0.9998 — LSH should
    // recover every brute-force pair on 500 docs.
    val lsh = MinHashDedup.nearDuplicates(docs, "doc_id", "text", threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val brute = MinHashDedup.bruteForcePairs(docs, "doc_id", "text", threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "testdata should contain planted near-duplicates")
    assert(lsh === brute)
  }

  test("native minhash_sig bit-equals the declarative fold formulation") {
    // the codegen'd long[k] loop vs the aggregate+zip_with fold it
    // replaced — same coefficients, same P, bitwise-identical output
    // (including the empty-shingle all-P signature)
    val base = docs.limit(120)
      .union(Seq((999999L, "", "en", "s", 0L)).toDF(docs.columns: _*))
    val sigs = MinHashDedup.withSignatures(base, "doc_id", "text")
      .withColumn("fold_sig",
        MinHashDedup.foldSignature(col("shingles"), 64, 42L))
    assert(sigs.filter(col("sig") =!= col("fold_sig")).isEmpty,
      "native expression diverged from the fold oracle")
    assert(sigs.filter(size(col("sig")) =!= 64).isEmpty)
  }

  test("MinHash jaccard values are exact (match brute force per pair)") {
    val lsh = MinHashDedup.nearDuplicates(docs, "doc_id", "text", threshold = 0.8)
      .as[(Long, Long, Double)].collect().toMap2
    val brute = MinHashDedup.bruteForcePairs(docs, "doc_id", "text", threshold = 0.8)
      .as[(Long, Long, Double)].collect().toMap2
    assert(lsh === brute)
  }

  implicit class Tuple3Ops(rows: Array[(Long, Long, Double)]) {
    def toMap2: Map[(Long, Long), Double] = rows.map(r => (r._1, r._2) -> r._3).toMap
  }

  test("SimHash LSH blocks recover all pairs within Hamming distance 3") {
    val lsh = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val brute = Dedup.simHashPairsBrute(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "testdata should contain simhash-close pairs")
    assert(lsh === brute)
  }

  test("simhash64 of near-identical token arrays has small Hamming distance") {
    val df = Seq(
      ("a b c d e f g h i j k l m n o p", "a b c d e f g h i j k l m n o q"),
      ("a b c d e f g h i j k l m n o p", "z y x w v u t s r q p o n m l k")
    ).toDF("t1", "t2").select(
      HashExpressions.hammingDistance(
        HashExpressions.simHash64(TextFunctions.tokens($"t1")),
        HashExpressions.simHash64(TextFunctions.tokens($"t2"))).as("d"))
    val Array(near, far) = df.as[Int].collect()
    assert(near < far, s"near=$near should be < far=$far")
  }

  test("docFingerprint is shift-invariant for long shared regions") {
    val shared = "the quick brown fox jumps over the lazy dog repeatedly and often"
    val df = Seq(("PREFIX " + shared, shared + " SUFFIX")).toDF("a", "b")
      .select(
        HashExpressions.docFingerprint($"a", 32).as("fa"),
        HashExpressions.docFingerprint($"b", 32).as("fb"))
    val r = df.head()
    // min-over-windows of a 32-byte rolling window: both strings contain
    // every 32-byte window of `shared`, so if the global min lands inside
    // the shared region the fingerprints are equal. With a 65-char shared
    // region vs 7/- char affixes the min is overwhelmingly in the overlap.
    assert(r.getLong(0) === r.getLong(1))
  }

  test("exactByKey keeps lowest id and counts clusters") {
    val df = Seq((10L, "x"), (3L, "x"), (7L, "y")).toDF("id", "k")
    val out = Dedup.exactByKey(df, "id", col("k"))
      .as[(String, Long, Long)].collect().toSet
    assert(out === Set(("x", 3L, 2L), ("y", 7L, 1L)))
  }

  test("embedding LSH near-dup pairs are a subset of brute force; brute matches oracle threshold") {
    val embs = Tables.embeddings(spark, SparkTestSession.sfTiny)
    val brute = Dedup.embeddingPairsBrute(embs, "vec_id", "embedding", 0.4)
      .as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingPairsLsh(embs, "vec_id", "embedding", 0.4, dim = 64)
      .as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(brute), "LSH must not invent pairs (exact verify step)")
  }

  test("embedding LSH recall >= 0.9 vs brute force on planted near-dups at cosine 0.9") {
    val rnd = new scala.util.Random(123)
    val base = Array.fill(180)(Array.fill(64)(rnd.nextGaussian().toFloat))
    // random 64-dim gaussians pair at cosine ~0±0.12, far below 0.9, so
    // the only qualifying pairs are the 20 planted copies + tiny noise
    val rows = base.zipWithIndex.toSeq.map { case (v, i) => (i.toLong, v.toSeq) } ++
      (0 until 20).map { i =>
        (1000L + i, base(i).toSeq.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
      }
    val embs = rows.toDF("vec_id", "embedding")
    val brute = Dedup.embeddingPairsBrute(embs, "vec_id", "embedding", 0.9)
      .as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingPairsLsh(embs, "vec_id", "embedding", 0.9, dim = 64)
      .as[(Long, Long)].collect().toSet
    assert(brute.size >= 20, s"expected >=20 planted pairs, got ${brute.size}")
    assert(lsh.subsetOf(brute))
    assert(lsh.size.toDouble / brute.size >= 0.9,
      s"recall ${lsh.size.toDouble / brute.size} below 0.9 (${lsh.size}/${brute.size})")
  }

  test("q34 operating point: LSH at threshold 0.35 keeps precision 1.0 and its measured recall floor") {
    // Regression floor for the REGISTERED q34 regime (documented in
    // SparkEntry: threshold 0.35 sits far below the 16x5-bit S-curve knee,
    // where LSH recovers only the closest pairs — 5 of q23's 13 at the
    // gate data). Rows-only correctness would stay "green" on a silent
    // drop to 0/13; this pins the measured floor so the low-threshold
    // regime can't rot unnoticed.
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.01")
      .filter(col("vec_id") % 5 === 0 && col("vec_id") < 500)
    val brute = Dedup.embeddingPairsBrute(embs, "vec_id", "embedding", 0.35)
      .as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingPairsLsh(embs, "vec_id", "embedding", 0.35, dim = 64)
      .as[(Long, Long)].collect().toSet
    assert(brute.size == 13, s"gate subset should hold 13 brute pairs, got ${brute.size}")
    assert(lsh.subsetOf(brute), "exact-cosine verify must keep precision 1.0")
    assert(lsh.size >= 5,
      s"recovered pairs fell below the measured floor: ${lsh.size}/13 (was 5/13)")
  }

  // Hot-bucket fixture: 1000 docs sharing one exact boilerplate text — one
  // degenerate bucket in EVERY band. Uncapped, that single key would emit
  // ~500k candidate pairs onto one reducer; the cap must drop it while
  // leaving candidates among the normal docs untouched.
  private val boilerText =
    "common boilerplate header shared by every page of the crawl " * 3
  private def hotDocs = {
    val s1 = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
    val s3 = "one two three four five six seven eight nine ten eleven twelve thirteen"
    val normal = Seq(
      (1L, s1), (2L, s1 + " tail"),
      (3L, s3), (4L, s3 + " extra"),
      (5L, "completely different text with no relation to anything else here at all"))
    val boiler = (100L until 1100L).map(i => (i, boilerText))
    (normal ++ boiler).toDF("doc_id", "text")
  }

  test("MinHash hot-bucket cap bounds candidate volume, keeps normal-pair recall") {
    val docs = hotDocs
    val sigs = MinHashDedup.withSignatures(docs, "doc_id", "text")
    // the degenerate cluster is visible to the diagnostic in every band
    val hot = MinHashDedup.hotBuckets(sigs, "doc_id")
      .filter(col("bucket_n") > 50).count()
    assert(hot >= 16L, s"expected >=16 hot bands, got $hot")
    // capped candidate generation: bounded volume, no boiler-only blowup
    val nCands = MinHashDedup.candidatePairs(sigs, "doc_id", maxBucketSize = 50).count()
    assert(nCands < 100L, s"capped candidates should be tiny, got $nCands")
    // end-to-end: planted normal pairs survive, degenerate cluster is dropped
    val capped = MinHashDedup.nearDuplicates(docs, "doc_id", "text",
      threshold = 0.8, maxBucketSize = 50)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped.contains((1L, 2L)) && capped.contains((3L, 4L)))
    assert(capped.forall { case (a, b) => a < 100L && b < 100L },
      "no candidate pair may come from the capped degenerate bucket")
  }

  test("SimHash hot-bucket cap drops the degenerate block, keeps normal pairs") {
    val docs = hotDocs
    val cappedPairs = Dedup.simHashPairs(docs, "doc_id", "text",
      maxHamming = 3, maxBucketSize = 50)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cappedPairs.forall { case (a, b) => a < 100L && b < 100L },
      "identical-boilerplate pairs must be excluded by the cap")
    // normal docs are unaffected by the cap: same result as uncapped
    // run restricted to them
    val normalOnly = docs.filter(col("doc_id") < 100L)
    val uncappedNormal = Dedup.simHashPairs(normalOnly, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cappedPairs === uncappedNormal)
  }

  test("SimHash identical pair with PARTIAL block heat rides the banded lane (rescue gate)") {
    // the rescue lane is gated to all-4-blocks-hot fingerprints (r18):
    // an identical pair whose blocks are not all hot must still surface
    // — via the banded lane, since at least one shared block bucket
    // survives the cap. hotDocs' boilerplate heats ITS block values,
    // not the planted identical pair's, so the pair's blocks are cold.
    val docs = hotDocs.unionByName(Seq(
      (50L, "planted identical twin text for the partial-heat gate check"),
      (51L, "planted identical twin text for the partial-heat gate check"))
      .toDF("doc_id", "text"))
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text",
      maxHamming = 3, maxBucketSize = 50)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(pairs.contains((50L, 51L, 0)),
      s"cold-block identical pair must come from the banded lane: $pairs")
  }

  test("SimHash hamming-0 rescue lane survives all-blocks-hot; clique cap bounds it") {
    // the q25 sf100 finding: 16-bit block values go hot from corpus-wide
    // bit bias, and a fingerprint whose FOUR blocks are all hot loses
    // every banded route — including its exact twin. Model the extreme
    // with maxBucketSize=1 (every block bucket of any pair is "hot"):
    // the identical pair must still surface via the sig-equality lane.
    val docs = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel"),
      (1000001L, "alpha bravo charlie delta echo foxtrot golf hotel"),
      (5L, "completely different text with no relation to anything at all"))
      .toDF("doc_id", "text")
    val rescued = Dedup.simHashPairs(docs, "doc_id", "text",
      maxHamming = 3, maxBucketSize = 1, maxSigClique = 10)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(rescued.contains((1L, 1000001L, 0)),
      s"identical pair must survive all-hot blocks via the rescue lane: $rescued")

    // the lane keeps its own skew bound: an identical-sig clique above
    // maxSigClique is dropped (definitional exact-dup boilerplate), and
    // by default the clique cap follows maxBucketSize
    val clique = (0L until 6L).map(i => (i, "same same same text here ok"))
      .toDF("doc_id", "text")
    val bounded = Dedup.simHashPairs(clique, "doc_id", "text",
      maxHamming = 3, maxBucketSize = 1, maxSigClique = 5).count()
    assert(bounded === 0L, "an over-cap identical-sig clique must stay dropped")
    val defaulted = Dedup.simHashPairs(clique, "doc_id", "text",
      maxHamming = 3, maxBucketSize = 5).count()
    assert(defaulted === 0L, "clique cap must follow maxBucketSize by default")
    val under = Dedup.simHashPairs(clique, "doc_id", "text",
      maxHamming = 3, maxBucketSize = 1, maxSigClique = 6).count()
    assert(under === 15L, "6-clique within the cap yields all C(6,2) pairs")
  }

  test("selectKeepers: priority wins, id breaks ties, singletons keep themselves") {
    val docs = Seq(
      (1L, "c1", 100L), (2L, "c1", 300L), (3L, "c1", 300L), // 2 beats 3 on tie
      (9L, "c2", 5L))                                        // singleton
      .toDF("doc_id", "cluster", "quality")
    val got = Dedup.selectKeepers(docs, "doc_id", "cluster",
        struct(col("quality"), -col("doc_id")))
      .select(col("doc_id"), col("keeper_id"), col("is_kept"))
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      1L -> ((2L, false)), 2L -> ((2L, true)), 3L -> ((2L, false)),
      9L -> ((9L, true))))
  }
}
