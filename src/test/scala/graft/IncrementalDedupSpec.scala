package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.dedup.{IncrementalDedup, MinHashDedup}

class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, SparkTestSession.sfTiny)

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet

  test("incremental band-probe equals the full-corpus run restricted to batch pairs") {
    // snapshot split by id (ids are monotone over time in a real store)
    val mid = 25L
    val old = docs.filter(col("doc_id") < mid)
    val batch = docs.filter(col("doc_id") >= mid)
    val store = IncrementalDedup.signatureStore(old, "doc_id", "text")
    val inc = pairSet(IncrementalDedup.incrementalPairs(
      store, batch, "doc_id", "text", threshold = 0.8))
    val batchIds = batch.select("doc_id").as[Long].collect().toSet
    val full = pairSet(MinHashDedup.nearDuplicates(docs, "doc_id", "text", 0.8))
      .filter { case (a, b, _) => batchIds(a) || batchIds(b) }
    assert(full.nonEmpty, "split must cut across planted near-dup clusters")
    assert(inc == full,
      s"incremental diverges: missing=${full -- inc}, extra=${inc -- full}")
  }

  test("re-ingesting the same content under fresh ids leaves zero survivors") {
    val base = docs.filter(size(split(trim(col("text")), " ")) >= 3).limit(40)
    val store = IncrementalDedup.signatureStore(base, "doc_id", "text")
    val replay = base.withColumn("doc_id", col("doc_id") + 100000L)
    val r = IncrementalDedup.dedupBatch(store, replay, "doc_id", "text", 0.8)
    assert(r.survivors.isEmpty,
      "every replayed doc has a jaccard-1.0 twin in the store and must lose")
    assert(r.updatedStore.count() == store.count(), "the store must not grow")
  }

  test("same-id redelivery is dropped up front, never a surviving duplicate") {
    val base = docs.limit(20)
    val store = IncrementalDedup.signatureStore(base, "doc_id", "text")
    // redeliver the SAME ids (not fresh ids): before the guard these
    // passed the id_x =!= id_y self-pair filter and survived silently
    val r = IncrementalDedup.dedupBatch(store, base, "doc_id", "text", 0.8)
    assert(r.survivors.isEmpty, "redelivered ids must not survive")
    assert(r.updatedStore.count() == store.count(), "the store must not grow")
  }

  test("signature-param drift between store and batch is rejected, not silent") {
    val base = docs.limit(10)
    val store = IncrementalDedup.signatureStore(base, "doc_id", "text", numHashes = 32)
    val ex = intercept[IllegalArgumentException] {
      IncrementalDedup.incrementalPairs(store, base, "doc_id", "text", 0.8)
    }
    assert(ex.getMessage.contains("numHashes"))
    // and a store missing the signature columns is rejected up front
    val ex2 = intercept[IllegalArgumentException] {
      IncrementalDedup.incrementalPairs(
        base.select("doc_id", "text"), base, "doc_id", "text", 0.8)
    }
    assert(ex2.getMessage.contains("shingles"))
  }

  test("store docs always win; within the batch the smaller id wins") {
    val s1 = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    val s2 = "one two three four five six seven eight nine ten"
    val store = IncrementalDedup.signatureStore(
      Seq((10L, s1)).toDF("doc_id", "text"), "doc_id", "text")
    // batch: 5 dups the store doc (smaller id than store — store must STILL
    // win), 20+21 dup each other (smaller batch id wins), 30 is clean
    val batch = Seq(
      (5L, s1 + " tail"), (20L, s2), (21L, s2 + " tail"),
      (30L, "completely different text with no relation to anything else"))
      .toDF("doc_id", "text")
    val r = IncrementalDedup.dedupBatch(store, batch, "doc_id", "text", 0.5)
    val kept = r.survivors.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(20L, 30L), s"got $kept")
    // updated store carries the survivors' signatures for the next batch
    assert(r.updatedStore.select("doc_id").as[Long].collect().toSet ==
      Set(10L, 20L, 30L))
  }

  test("bucketed banded store: probe candidates match, store side never reshuffles") {
    val mid = 25L
    val old = docs.filter(col("doc_id") < mid)
    val batch = docs.filter(col("doc_id") >= mid)
    val storeSigs = IncrementalDedup.signatureStore(old, "doc_id", "text")
    val batchSigs = IncrementalDedup.signatureStore(batch, "doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-bandstore").toString
    spark.sql("DROP TABLE IF EXISTS graft_band_store")
    IncrementalDedup.writeBandedStore(storeSigs, "graft_band_store", "doc_id",
      nBuckets = 8, path = Some(s"$tmp/store"))
    val probed = IncrementalDedup.storeProbeCandidates(
      spark, "graft_band_store", batchSigs, "doc_id")
    // correctness: identical to recomputing the store bands in memory
    val expected = IncrementalDedup.bandedStoreRows(storeSigs, "doc_id")
      .withColumnRenamed("doc_id", "store_id")
      .join(IncrementalDedup.bandedStoreRows(batchSigs, "doc_id")
        .withColumnRenamed("doc_id", "batch_id"), Seq("band_key"))
      .select("store_id", "batch_id").distinct()
      .as[(Long, Long)].collect().toSet
    val got = probed.as[(Long, Long)].collect().toSet
    assert(got.nonEmpty && got == expected)
    // plan proof with broadcast disabled (a test-sized store would
    // otherwise broadcast — at real store scale the join is sort-merge):
    // the bucketed layout pre-partitions the store side, so the only
    // Exchange below the join is the batch side's
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = IncrementalDedup.storeProbeCandidates(
        spark, "graft_band_store", batchSigs, "doc_id")
        .queryExecution.executedPlan.toString
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected a sort-merge join against the bucketed store:\n$plan")
      val joinSubtree = plan.substring(joinIdx)
      assert("Exchange".r.findAllIn(joinSubtree).size <= 1,
        s"only the batch side may shuffle below the join:\n$plan")
      assert(joinSubtree.contains("Bucketed: true"),
        s"store scan must be bucket-aware:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE graft_band_store")
  }

  test("bucketed-store incremental pairs equal the in-memory path") {
    val mid = 25L
    val old = docs.filter(col("doc_id") < mid)
    val batch = docs.filter(col("doc_id") >= mid)
    val storeSigs = IncrementalDedup.signatureStore(old, "doc_id", "text")
      .localCheckpoint()
    val tmp = java.nio.file.Files.createTempDirectory("graft-bandfull").toString
    spark.sql("DROP TABLE IF EXISTS graft_band_full")
    IncrementalDedup.writeBandedStore(storeSigs, "graft_band_full", "doc_id",
      nBuckets = 8, path = Some(s"$tmp/store"))
    val bucketed = pairSet(IncrementalDedup.incrementalPairsBucketed(
      spark, "graft_band_full", storeSigs, batch, "doc_id", "text", 0.8))
    val mem = pairSet(IncrementalDedup.incrementalPairs(
      storeSigs, batch, "doc_id", "text", 0.8))
    assert(bucketed.nonEmpty && bucketed == mem,
      s"bucketed diverges: missing=${mem -- bucketed}, extra=${bucketed -- mem}")
    spark.sql("DROP TABLE graft_band_full")
  }

  test("property: incremental pairs match the full run under random docs and splits") {
    val word = Gen.oneOf("alpha", "bravo", "charlie", "delta", "echo", "foxtrot")
    val docGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 60L), Gen.listOfN(6, word).map(_.mkString(" "))))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withInitialSeed(7L),
      Prop.forAll(docGen, Gen.choose(0L, 60L)) { (rows, cut) =>
        val df = rows.distinctBy(_._1).toDF("doc_id", "text")
        val old = df.filter(col("doc_id") < cut)
        val batch = df.filter(col("doc_id") >= cut)
        val store = IncrementalDedup.signatureStore(old, "doc_id", "text")
        val inc = pairSet(IncrementalDedup.incrementalPairs(
          store, batch, "doc_id", "text", threshold = 0.5))
        val batchIds = batch.select("doc_id").as[Long].collect().toSet
        val full = pairSet(MinHashDedup.nearDuplicates(df, "doc_id", "text", 0.5))
          .filter { case (a, b, _) => batchIds(a) || batchIds(b) }
        inc == full
      })
    assert(res.passed, s"incremental≡full property: ${res.status}")
  }
}
