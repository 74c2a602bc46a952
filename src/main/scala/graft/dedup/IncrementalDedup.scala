package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (cross-snapshot) near-deduplication: dedup a NEW batch of
  * documents against a persisted MinHash signature store WITHOUT ever
  * re-shuffling or self-joining the store — the near-dup extension of the
  * reference's incremental ingestion posture (reference:
  * notebooks/bronze.py:111-112, which anti-joins each batch on exact keys).
  *
  * A daily 100 TB pipeline cannot re-run `MinHashDedup.nearDuplicates`
  * over the whole corpus per batch: signatures are computed once per doc
  * at ingest and persisted (`signatureStore` output written as a table,
  * in production partitioned/bucketed by band hash). Per batch:
  *   - the batch computes its own signatures (narrow pass over NEW docs);
  *   - banded candidates are (batch x store) + (batch x batch) bucket
  *     collisions only — the store side streams through the band join but
  *     never pairs with itself, so per-batch work scales with batch size
  *     x collision rate, not corpus size;
  *   - the hot-bucket cap is evaluated over the COMBINED (store + batch)
  *     bucket population, exactly like a full-corpus run — so incremental
  *     results match the full run (IncrementalDedupSpec proves it);
  *   - exact-Jaccard verify fetches shingle sets by id for candidates
  *     only, from either side.
  *
  * Winner rule: a batch doc near-dup of a STORE doc always loses (shipped
  * data is immutable); within the batch the smaller id wins. With ids
  * monotone over time (the normal snapshot layout) this is exactly the
  * full-corpus keep-smallest rule. Re-ingesting identical content under
  * fresh ids yields zero survivors (jaccard 1.0 against the store) — the
  * re-run idempotency property; same-id redelivery is exact-key territory
  * handled upstream by `Idempotency.newKeysOnly`.
  */
object IncrementalDedup {

  /** The persisted per-snapshot signature state: (idCol, shingles, sig).
    * Same signature parameters MUST be used for the store and every
    * batch probed against it (enforced by callers passing one config).
    */
  def signatureStore(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, seed: Long = 42L): DataFrame =
    MinHashDedup.withSignatures(docs, idCol, textCol, shingleSize, numHashes, seed)

  /** Near-duplicate pairs (id_a, id_b, jaccard) where at least one side
    * is a batch doc: batch x store and batch x batch bucket collisions,
    * never store x store. Batch rows whose id already exists in the
    * store are dropped up front (same-id redelivery is exact-key
    * territory — earliest write wins, like `Idempotency.newKeysOnly`),
    * so a redelivered doc can never slip past the id_x =!= id_y
    * self-pair filter and survive as a duplicate.
    */
  def incrementalPairs(storeSigs: DataFrame, batch: DataFrame, idCol: String,
      textCol: String, threshold: Double, shingleSize: Int = 3,
      numHashes: Int = 64, bands: Int = 16, rowsPerBand: Int = 4,
      seed: Long = 42L, maxBucketSize: Int = 2000): DataFrame =
    incrementalPairsAndSigs(storeSigs, batch, idCol, textCol, threshold,
      shingleSize, numHashes, bands, rowsPerBand, seed, maxBucketSize)._1

  /** Also hands back the batch's (materialized) signatures so callers
    * like [[dedupBatch]] derive survivor signatures by semi-join instead
    * of re-running the shingle + k-minhash pass.
    */
  private def incrementalPairsAndSigs(storeSigs: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, threshold: Double, shingleSize: Int,
      numHashes: Int, bands: Int, rowsPerBand: Int,
      seed: Long, maxBucketSize: Int): (DataFrame, DataFrame) = {
    require(bands * rowsPerBand <= numHashes, "bands*rowsPerBand must be <= numHashes")
    val fresh = guardedFreshBatch(storeSigs, batch, idCol, numHashes)
    // localCheckpoint (not persist/unpersist): the signatures outlive this
    // call — dedupBatch reuses them for the survivor delta
    val batchSigs = MinHashDedup.withSignatures(
        fresh, idCol, textCol, shingleSize, numHashes, seed)
      .localCheckpoint()
    // the store relation feeds BOTH the banding and the verify's shingle
    // lookup — without a persist a lazily-built store (signatureStore is
    // lazy) re-runs its shingle + k-minhash pass per consumer; callers
    // holding an already-materialized store pay one cheap extra copy.
    // Only unpersist what THIS call cached: a caller that persisted the
    // store for its own continued reuse must not lose its cache here.
    val storeWasCached =
      storeSigs.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val store =
      if (storeWasCached) storeSigs
      else storeSigs.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val storeBands = MinHashDedup.bandedRows(store, idCol, bands, rowsPerBand)
      .withColumn("__new", lit(false))
    val batchBands = MinHashDedup.bandedRows(batchSigs, idCol, bands, rowsPerBand)
      .withColumn("__new", lit(true))
    // cap over the combined bucket population — identical semantics to a
    // full-corpus run on (store ∪ batch), which is what makes
    // incremental ≡ full provable rather than approximate
    val bounded = LshGuards.dropHotKeys(
        storeBands.unionByName(batchBands),
        Seq("band_idx", "band_hash"), maxBucketSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val all = bounded.select(col("band_idx"), col("band_hash"), col(idCol).as("id_x"))
    val newOnly = bounded.filter(col("__new"))
      .select(col("band_idx"), col("band_hash"), col(idCol).as("id_y"))
    val candidates = all.join(newOnly, Seq("band_idx", "band_hash"))
      .filter(col("id_x") =!= col("id_y"))
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"))
      .dropDuplicates()
    val sets = store.select(col(idCol), col("shingles"))
      .unionByName(batchSigs.select(col(idCol), col("shingles")))
    val verified = verifyJaccard(candidates, sets, idCol, threshold)
    val out = verified.localCheckpoint() // eager; then release the caches
    bounded.unpersist()
    if (!storeWasCached) store.unpersist()
    (out, batchSigs)
  }

  /** Guard the documented store/batch compatibility preconditions
    * instead of trusting them — a store written with different signature
    * params would produce silently-wrong jaccard values downstream — and
    * drop same-id redeliveries BEFORE signatures are computed (only the
    * store's pruned id column joins). Returns the fresh batch.
    */
  private def guardedFreshBatch(storeSigs: DataFrame, batch: DataFrame,
      idCol: String, numHashes: Int): DataFrame = {
    val storeCols = storeSigs.schema.fieldNames
    require(storeCols.contains(idCol) && storeCols.contains("shingles") &&
      storeCols.contains("sig"),
      s"store signatures must carry ($idCol, shingles, sig); got " +
        storeCols.mkString(", "))
    // numHashes drift is detectable from data: one limit-1 probe job
    storeSigs.select(size(col("sig"))).limit(1).collect().headOption.foreach { r =>
      require(r.getInt(0) == numHashes,
        s"store signatures have length ${r.getInt(0)} but batch uses " +
          s"numHashes=$numHashes — store and batch must share signature params")
    }
    graft.operators.Idempotency.newKeysOnly(
      batch, storeSigs.select(col(idCol)), Seq(idCol))
  }

  /** Exact-Jaccard verification of candidate (id_a, id_b) pairs against
    * per-id shingle sets — the precision stage shared by every LSH path.
    */
  private def verifyJaccard(candidates: DataFrame, sets: DataFrame,
      idCol: String, threshold: Double): DataFrame =
    candidates
      .join(sets.select(col(idCol).as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
      .join(sets.select(col(idCol).as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")

  /** The store's banded representation with band identity collapsed into
    * ONE join column — `band_key = xxhash64(band_idx, band_hash)` — so
    * the table can be bucketed on it (a (band_idx, band_hash) collision
    * across different bands needs a 64-bit hash collision; the exact
    * verify downstream keeps precision regardless).
    */
  def bandedStoreRows(sigs: DataFrame, idCol: String,
      bands: Int = 16, rowsPerBand: Int = 4): DataFrame =
    MinHashDedup.bandedRows(sigs, idCol, bands, rowsPerBand)
      .select(xxhash64(col("band_idx"), col("band_hash")).as("band_key"), col(idCol))

  /** Persist the banded store BUCKETED (and sorted) by band_key: every
    * future batch probe then sort-merge-joins against it with NO
    * exchange and NO sort on the store side — the write-time shuffle is
    * paid once and amortized over every batch, making "the store never
    * reshuffles" literal in the physical plan (IncrementalDedupSpec
    * proves it). This is the production layout of the signature store at
    * 100 TB; hot-bucket policy is applied when BUILDING the store (cap
    * diagnostics via `MinHashDedup.hotBuckets`).
    */
  def writeBandedStore(sigs: DataFrame, table: String, idCol: String,
      nBuckets: Int = 32, path: Option[String] = None,
      bands: Int = 16, rowsPerBand: Int = 4): Unit =
    graft.operators.Bucketing.writeBucketed(
      bandedStoreRows(sigs, idCol, bands, rowsPerBand),
      table, nBuckets, Seq("band_key"), Seq("band_key"), path)

  /** Candidate (store_id, batch_id) pairs from probing the bucketed
    * banded store table — the store side reads pre-partitioned, only the
    * (small) batch side shuffles. Callers verify candidates with exact
    * Jaccard exactly like the in-memory path.
    */
  def storeProbeCandidates(spark: org.apache.spark.sql.SparkSession,
      storeTable: String, batchSigs: DataFrame, idCol: String,
      bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val batchBands = bandedStoreRows(batchSigs, idCol, bands, rowsPerBand)
      .withColumnRenamed(idCol, "batch_id")
    graft.operators.Bucketing.table(spark, storeTable)
      .withColumnRenamed(idCol, "store_id")
      .join(batchBands, Seq("band_key"))
      .select("store_id", "batch_id")
      .dropDuplicates()
  }

  /** Full incremental near-dup pairs probing the PERSISTED bucketed
    * banded store (see [[writeBandedStore]]): (batch x store) candidates
    * read the store table pre-partitioned on band_key — zero store-side
    * exchange — and (batch x batch) candidates band the batch in memory;
    * both verify with exact Jaccard over shingles from `storeSigs` (the
    * persisted [[signatureStore]] table) plus the batch's own.
    *
    * Same results as [[incrementalPairs]] (IncrementalDedupSpec proves
    * pair-set equality); the difference is WHERE the banding shuffle
    * happens: here it was paid once at store-write time, so a daily
    * batch probe against a 100 TB store shuffles only batch-sized data.
    * One honest semantic difference at the margins: [[incrementalPairs]]
    * evaluates `maxBucketSize` over the COMBINED store+batch bucket
    * population, while this layout makes hot-bucket policy a store-BUILD
    * decision (cap before [[writeBandedStore]]) and applies
    * `maxBucketSize` to the batch's internal bands only — a bucket that
    * crosses the cap only when store and batch rows are summed is kept
    * here. At production ratios (store >> batch) the store-side cap
    * dominates and the two policies agree.
    */
  def incrementalPairsBucketed(spark: org.apache.spark.sql.SparkSession,
      storeTable: String, storeSigs: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, threshold: Double,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      rowsPerBand: Int = 4, seed: Long = 42L,
      maxBucketSize: Int = 2000): DataFrame = {
    require(bands * rowsPerBand <= numHashes, "bands*rowsPerBand must be <= numHashes")
    val fresh = guardedFreshBatch(storeSigs, batch, idCol, numHashes)
    val batchSigs = MinHashDedup.withSignatures(
        fresh, idCol, textCol, shingleSize, numHashes, seed)
      .localCheckpoint()
    val batchBands = LshGuards.dropHotKeys(
      bandedStoreRows(batchSigs, idCol, bands, rowsPerBand),
      Seq("band_key"), maxBucketSize)
    val cross = graft.operators.Bucketing.table(spark, storeTable)
      .withColumnRenamed(idCol, "store_id")
      .join(batchBands.withColumnRenamed(idCol, "batch_id"), Seq("band_key"))
      .select(least(col("store_id"), col("batch_id")).as("id_a"),
        greatest(col("store_id"), col("batch_id")).as("id_b"))
    val within = batchBands.select(col("band_key"), col(idCol).as("id_x"))
      .join(batchBands.select(col("band_key"), col(idCol).as("id_y")), Seq("band_key"))
      .filter(col("id_x") < col("id_y"))
      .select(col("id_x").as("id_a"), col("id_y").as("id_b"))
    val candidates = cross.unionByName(within).dropDuplicates()
    val sets = storeSigs.select(col(idCol), col("shingles"))
      .unionByName(batchSigs.select(col(idCol), col("shingles")))
    verifyJaccard(candidates, sets, idCol, threshold)
  }

  /** Batch survivors and the updated store in one call.
    *
    * `survivors`: batch docs that near-dup neither a store doc nor a
    * smaller-id batch doc (batch rows whose id is already IN the store —
    * same-id redelivery — are dropped up front and never survive). `survivorSigs`: just their signatures (the
    * store DELTA — what an append-only store table writes per batch),
    * semi-joined out of the batch signatures already computed for the
    * band probe — the shingle + k-minhash pass runs ONCE per batch.
    * `batchSigs`: the full (materialized) batch signature set, for
    * callers that re-derive the delta from their own survivor handle.
    * `updatedStore`: storeSigs plus the delta — feed it to the next
    * batch when chaining in memory.
    */
  case class BatchResult(survivors: DataFrame, updatedStore: DataFrame,
      pairs: DataFrame, survivorSigs: DataFrame, batchSigs: DataFrame)

  def dedupBatch(storeSigs: DataFrame, batch: DataFrame, idCol: String,
      textCol: String, threshold: Double, shingleSize: Int = 3,
      numHashes: Int = 64, bands: Int = 16, rowsPerBand: Int = 4,
      seed: Long = 42L, maxBucketSize: Int = 2000): BatchResult = {
    val (pairs, batchSigs) = incrementalPairsAndSigs(storeSigs, batch, idCol,
      textCol, threshold, shingleSize, numHashes, bands, rowsPerBand, seed,
      maxBucketSize)
    // Per-pair loser: every pair has >= 1 batch side by construction, so
    // if id_b is a store doc then id_a is the batch doc and loses; else
    // id_b loses (to a store id_a — store wins — or to a smaller batch
    // id_a — keep-smallest). Store ids never lose.
    val bStore = storeSigs.select(col(idCol).as("id_b"))
      .withColumn("__b_store", lit(true))
    val losers = pairs.join(bStore, Seq("id_b"), "left")
      .select(when(col("__b_store").isNotNull, col("id_a"))
        .otherwise(col("id_b")).as(idCol))
      .distinct()
    // survivor base is the FRESH batch (same-id redeliveries were dropped
    // up front and must not resurface here); batchSigs carries exactly
    // the fresh ids and is already materialized
    val freshBatch = batch.join(batchSigs.select(col(idCol)), Seq(idCol), "left_semi")
    val survivors = freshBatch.join(losers, Seq(idCol), "left_anti")
    val survivorSigs = batchSigs
      .join(survivors.select(col(idCol)), Seq(idCol), "left_semi")
    BatchResult(survivors, storeSigs.unionByName(survivorSigs), pairs,
      survivorSigs, batchSigs)
  }
}
