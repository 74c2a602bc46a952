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
  *     verify work is confined to bucket collisions.
  *
  * With k = bands*rowsPerBand minhashes, a pair with Jaccard j collides in
  * at least one band with prob 1-(1-j^rowsPerBand)^bands — the standard
  * S-curve; defaults (16 bands x 4 rows) put the knee near j ~ 0.5.
  */
object MinHashDedup {

  // Mersenne prime 2^31-1: the hash family (a*h + b) mod P stays within a
  // 63-bit product, so it cannot overflow a long under ANSI arithmetic.
  private val PRIME = 2147483647L

  /** Deterministic (a, b) coefficients for the k hash functions. */
  private def coeffs(k: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k)((math.abs(rnd.nextLong()) % (PRIME - 1) + 1, math.abs(rnd.nextLong()) % PRIME))
  }

  /** id, shingles(array<string>), sig(array<long> length k). */
  def withSignatures(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, seed: Long = 42L): DataFrame = {
    val sh = array_distinct(TextFunctions.shingles(TextFunctions.tokens(col(textCol)), shingleSize))
    val base = transform(col("shingles"), s => pmod(xxhash64(s), lit(PRIME)))
    val sigCols: Seq[Column] = coeffs(numHashes, seed).map { case (a, b) =>
      array_min(transform(col("__h"), h => pmod(h * a + b, lit(PRIME))))
    }
    docs.select(col(idCol), sh.as("shingles"))
      .withColumn("__h", base)
      .withColumn("sig", array(sigCols: _*))
      .drop("__h")
  }

  /** Candidate pairs (id_a < id_b) from LSH banding, deduplicated. */
  def candidatePairs(signatures: DataFrame, idCol: String,
      bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val bandCols = (0 until bands).map { j =>
      struct(lit(j).as("band_idx"),
        xxhash64(slice(col("sig"), j * rowsPerBand + 1, rowsPerBand)).as("band_hash"))
    }
    val exploded = signatures
      .select(col(idCol), explode(array(bandCols: _*)).as("band"))
      .select(col(idCol), col("band.band_idx"), col("band.band_hash"))
    val a = exploded.select(col("band_idx"), col("band_hash"), col(idCol).as("id_a"))
    val b = exploded.select(col("band_idx"), col("band_hash"), col(idCol).as("id_b"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates()
  }

  /** Full pipeline: near-duplicate pairs with exact Jaccard >= threshold.
    * Output: id_a, id_b, jaccard (double).
    */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleSize: Int = 3, numHashes: Int = 64,
      bands: Int = 16, rowsPerBand: Int = 4, seed: Long = 42L): DataFrame = {
    require(bands * rowsPerBand <= numHashes, "bands*rowsPerBand must be <= numHashes")
    // The signature relation is referenced four times in the plan (both
    // sides of the band self-join + both sides of the verify join); without
    // materialization Spark recomputes the k minhash passes for each use.
    // At scale this is the classic "checkpoint the signatures" step of
    // every LSH pipeline.
    val sigs = withSignatures(docs, idCol, textCol, shingleSize, numHashes, seed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candidates = candidatePairs(sigs, idCol, bands, rowsPerBand)
    val sets = sigs.select(col(idCol), col("shingles"))
    candidates
      .join(sets.select(col(idCol).as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
      .join(sets.select(col(idCol).as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Brute-force exact Jaccard over all pairs — the correctness oracle for
    * tests; O(n^2), never use at scale.
    */
  def bruteForcePairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleSize: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol),
      array_distinct(TextFunctions.shingles(TextFunctions.tokens(col(textCol)), shingleSize)).as("sh"))
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
