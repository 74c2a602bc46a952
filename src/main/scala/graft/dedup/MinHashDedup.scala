package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** MinHash + LSH near-duplicate detection over a text column
  * (shingle → minhash signature → band → bucket join → exact verify).
  *
  * Scale design (the point of MinHash at 100 TB):
  *   - signatures are computed in one narrow pass (shingling, hashing and
  *     the k minhashes are all codegen'd array expressions — no UDFs);
  *   - candidate generation shuffles only (band_idx, band_hash, id) —
  *     never text — so the exchange is ~24 bytes/row/band;
  *   - exact Jaccard verification re-joins shingle sets by id for
  *     candidate pairs only (two hash joins on id), so the quadratic
  *     verify work is confined to bucket collisions;
  *   - hot buckets (one band hash shared by a huge boilerplate cluster)
  *     are capped: a bucket of b docs contributes O(b²) candidate pairs
  *     AND lands on a single reducer (same join key, so AQE's skew split
  *     cannot shard it) — `maxBucketSize` drops such buckets outright.
  *     Recall tradeoff, stated honestly: a pair is lost iff EVERY band it
  *     collides in is dropped. High-similarity pairs collide in many
  *     bands (j=0.8 ⇒ ~6-7 of 16 expected) so they survive unless the
  *     pair itself sits inside the boilerplate cluster (exact-duplicate
  *     territory that `Dedup.exactByKey` removes upstream); pairs just at
  *     the threshold colliding in 1-2 bands are the ones at risk. Run
  *     `hotBuckets` to measure what a cap would drop before tuning it.
  *
  * With k = bands*rowsPerBand minhashes, a pair with Jaccard j collides in
  * at least one band with prob 1-(1-j^rowsPerBand)^bands — the standard
  * S-curve; defaults (16 bands x 4 rows) put the knee near j ~ 0.5.
  */
object MinHashDedup {

  // Mersenne prime 2^31-1: the hash family (a*h + b) mod P stays within a
  // 63-bit product, so it cannot overflow a long under ANSI arithmetic.
  private val PRIME = 2147483647L

  /** Deterministic (a, b) coefficients for the k hash functions.
    * `& Long.MaxValue` not `math.abs` — abs(Long.MinValue) is negative.
    */
  private def coeffs(k: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k)((
      (rnd.nextLong() & Long.MaxValue) % (PRIME - 1) + 1,
      (rnd.nextLong() & Long.MaxValue) % PRIME))
  }

  /** id, shingles(array<long> of n-gram identity hashes), sig(array<long>
    * length k).
    *
    * Shingles live in HASH space (`TextFunctions.ngramHashes`): gram
    * strings are never built or compared, which measured ~2x on the
    * whole signature pass at sf0.1; Jaccard on the hash sets equals
    * string Jaccard up to a ~2^-64 in-pair collision (and the minhash
    * family just needs iid-ish 64-bit gram identities).
    *
    * The k mins run in a NATIVE codegen'd expression
    * (`HashExpressions.minHashSig`): one long[k] accumulator, one tight
    * k×|shingles| loop per row. The earlier declarative forms both lose:
    * k unrolled `array_min(transform(...))` expressions generate ~k
    * large codegen methods whose compile/JIT time dwarfed the arithmetic
    * (measured: 6.2 s cold vs 2.3 s warm on 5k docs), and the
    * `aggregate`+`zip_with` fold allocates a fresh k-element array per
    * shingle per row (immutable accumulator) — DedupSpec proves the
    * native loop bit-equals that fold. sig[i] = min over gram hashes h
    * of (a_i*h+b_i) mod P (empty shingle set ⇒ sig[i] = P, a constant —
    * empty docs become mutual band-collisions that the exact-Jaccard
    * verify then rejects).
    */
  def withSignatures(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, seed: Long = 42L): DataFrame = {
    require(shingleSize >= 2, "shingleSize must be >= 2")
    val sh = array_distinct(TextFunctions.ngramHashes(
      TextFunctions.tokenHashes(TextFunctions.tokens(col(textCol))), shingleSize))
    val cs = coeffs(numHashes, seed)
    docs.select(col(idCol), sh.as("shingles"))
      .withColumn("sig", graft.expressions.HashExpressions.minHashSig(
        col("shingles"), cs.map(_._1).toArray, cs.map(_._2).toArray))
  }

  /** The declarative `aggregate`+`zip_with` formulation of the same
    * signature — kept as the independently-derived oracle for
    * MinHashSpec's bit-equality proof of the native expression (and as
    * documentation of what the native loop computes).
    */
  private[graft] def foldSignature(shingles: Column, numHashes: Int,
      seed: Long): Column = {
    val coeffArr = typedLit(coeffs(numHashes, seed))
    aggregate(
      transform(shingles, s => pmod(s, lit(PRIME))),
      array_repeat(lit(PRIME), numHashes),
      (acc, h) => zip_with(acc, coeffArr, (m, c) =>
        least(m, pmod(h * c.getField("_1") + c.getField("_2"), lit(PRIME)))))
  }

  /** (id, band_idx, band_hash) — one row per band per doc. */
  private[dedup] def bandedRows(signatures: DataFrame, idCol: String,
      bands: Int, rowsPerBand: Int): DataFrame = {
    val bandCols = (0 until bands).map { j =>
      struct(lit(j).as("band_idx"),
        xxhash64(slice(col("sig"), j * rowsPerBand + 1, rowsPerBand)).as("band_hash"))
    }
    signatures
      .select(col(idCol), explode(array(bandCols: _*)).as("band"))
      .select(col(idCol), col("band.band_idx"), col("band.band_hash"))
  }

  /** Candidate pairs (id_a < id_b) from LSH banding, deduplicated.
    * `maxBucketSize > 0` drops buckets larger than the cap before the
    * self-join (hot-bucket guard; 0 = unbounded).
    */
  def candidatePairs(signatures: DataFrame, idCol: String,
      bands: Int = 16, rowsPerBand: Int = 4, maxBucketSize: Int = 0): DataFrame = {
    val exploded = bandedRows(signatures, idCol, bands, rowsPerBand)
    val bounded = LshGuards.dropHotKeys(exploded, Seq("band_idx", "band_hash"), maxBucketSize)
    val a = bounded.select(col("band_idx"), col("band_hash"), col(idCol).as("id_a"))
    val b = bounded.select(col("band_idx"), col("band_hash"), col(idCol).as("id_b"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates()
  }

  /** Diagnostic: buckets a given cap would drop, largest first —
    * (band_idx, band_hash, bucket_n). Run this (cheap: one aggregation,
    * no pair explosion) before tuning `maxBucketSize` so the recall
    * tradeoff is measured, not guessed.
    */
  def hotBuckets(signatures: DataFrame, idCol: String,
      bands: Int = 16, rowsPerBand: Int = 4, minSize: Int = 2): DataFrame =
    bandedRows(signatures, idCol, bands, rowsPerBand)
      .groupBy("band_idx", "band_hash")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") >= minSize)
      .orderBy(col("bucket_n").desc)

  /** Full pipeline: near-duplicate pairs with exact Jaccard >= threshold.
    * Output: id_a, id_b, jaccard (double).
    *
    * The returned pairs are materialized (localCheckpoint) so the
    * signature cache can be released before returning — no dangling
    * executor storage after the call, however long the session lives.
    */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleSize: Int = 3, numHashes: Int = 64,
      bands: Int = 16, rowsPerBand: Int = 4, seed: Long = 42L,
      maxBucketSize: Int = 2000): DataFrame = {
    require(bands * rowsPerBand <= numHashes, "bands*rowsPerBand must be <= numHashes")
    // The signature relation is referenced four times in the plan (both
    // sides of the band self-join + both sides of the verify join); without
    // materialization Spark recomputes the k minhash passes for each use.
    // At scale this is the classic "checkpoint the signatures" step of
    // every LSH pipeline.
    val sigs = withSignatures(docs, idCol, textCol, shingleSize, numHashes, seed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // eager inside (localCheckpoint), so the wide cached signatures can go
    try nearDuplicatesFromSignatures(sigs, idCol, threshold, bands,
      rowsPerBand, maxBucketSize)
    finally sigs.unpersist()
  }

  /** [[nearDuplicates]] over an ALREADY-COMPUTED signature relation
    * ((idCol, shingles, sig) — [[withSignatures]]' shape, which is also
    * `IncrementalDedup.signatureStore`'s): callers holding a
    * materialized store avoid re-running the shingle + k-minhash pass
    * the doc-level entry point would pay (q67 computes its old-snapshot
    * signatures ONCE for the full-graph labeling, the store, and the
    * incremental probe). Same banding, same exact-Jaccard verify, same
    * materialized output.
    */
  def nearDuplicatesFromSignatures(sigs: DataFrame, idCol: String,
      threshold: Double, bands: Int = 16, rowsPerBand: Int = 4,
      maxBucketSize: Int = 2000): DataFrame = {
    val candidates = candidatePairs(sigs, idCol, bands, rowsPerBand, maxBucketSize)
    val sets = sigs.select(col(idCol), col("shingles"))
    val verified = candidates
      .join(sets.select(col(idCol).as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
      .join(sets.select(col(idCol).as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
    // eager: materializes the (small) pair list
    verified.localCheckpoint()
  }

  /** Brute-force exact Jaccard over all pairs — the correctness oracle for
    * tests; O(n^2), never use at scale. Same hash-space shingles as
    * [[withSignatures]] so per-pair Jaccard values are computed over the
    * identical sets.
    */
  def bruteForcePairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleSize: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol),
      array_distinct(TextFunctions.ngramHashes(
        TextFunctions.tokenHashes(TextFunctions.tokens(col(textCol))), shingleSize)).as("sh"))
    val a = sh.select(col(idCol).as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col(idCol).as("id_b"), col("sh").as("sh_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
