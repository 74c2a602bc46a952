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
}
