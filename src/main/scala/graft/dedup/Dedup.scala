package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.HashExpressions
import graft.functions.{TextFunctions, VectorFunctions}

/** The dedup family beyond MinHash: exact, SimHash, n-gram Jaccard
  * probe, and embedding-cosine near-dup. Each returns a DataFrame so they
  * compose into pipelines.
  */
object Dedup {

  /** Exact dedup on a derived key (e.g. normalized text or md5): keeps the
    * lowest id per key, reports cluster size. One hash-aggregate shuffle of
    * (key, id) — at 100 TB pre-hash the key (fixed 16 bytes via md5)
    * instead of shuffling raw text.
    */
  def exactByKey(docs: DataFrame, idCol: String, key: Column): DataFrame =
    docs.select(col(idCol), key.as("dedup_key"))
      .groupBy(col("dedup_key"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("cluster_size"))

  /** The dedup DECISION step: from duplicate-cluster membership, keep
    * the highest-`priority` member per cluster and mark the rest for
    * removal (adds `keeper_id` and `is_kept`). `priority` compares
    * lexicographically when it is a struct — e.g.
    * `struct(length(col("text")), -col("doc_id"))` for
    * longest-version-wins with a deterministic lowest-id tiebreak; the
    * caller MUST include a per-row-unique tiebreaker (the id) or ties
    * make the keeper nondeterministic across runs.
    *
    * Scale: one `max_by` hash aggregate per cluster plus one join back
    * on the cluster key — the aggregate output is already partitioned
    * by that key, so only the membership side shuffles. Never a window
    * over raw documents.
    */
  def selectKeepers(docs: DataFrame, idCol: String, clusterCol: String,
      priority: Column): DataFrame =
    docs.join(
      docs.groupBy(col(clusterCol))
        .agg(max_by(col(idCol), priority).as("keeper_id")),
      Seq(clusterCol))
      .withColumn("is_kept", col(idCol) === col("keeper_id"))

  /** SimHash near-dup: 64-bit similarity-preserving fingerprints, banded
    * into 4 x 16-bit blocks for candidate generation (any pair within
    * Hamming distance 3 shares at least one identical block — pigeonhole),
    * then exact Hamming verify.
    *
    * Scale: fingerprint is one codegen'd pass per row; candidates shuffle
    * only (block_idx, block_value, id, sig). `maxBucketSize` drops hot
    * blocks (a boilerplate cluster sharing one 16-bit block value would
    * otherwise put O(b²) pairs on a single reducer — same key, so AQE
    * skew-split can't help). Recall tradeoff: a NON-identical pair is
    * lost iff every block it matches on is hot — a Hamming≤3 pair
    * matches ≥1 of 4 blocks, so pairs matching only one block are at
    * risk when that block value is boilerplate-hot.
    *
    * Hamming-0 rescue lane: 16-bit block values go hot from corpus-wide
    * BIT BIAS, not only from identical text — at 5.7M synthetic docs,
    * 147 block buckets crossed the default cap and 2,060 fingerprints
    * had ALL FOUR blocks hot, silently dropping their exact twins (the
    * q25 sf100 oracle caught exactly this). Identical-fingerprint pairs
    * therefore ALSO route through a direct equality self-join on the
    * full 64-bit `sig` — gated to the docs whose four blocks are ALL
    * hot (identical sigs share identical block values, so block heat is
    * uniform per group and only the all-hot groups can lose pairs;
    * with no hot blocks the lane is provably empty and costs nothing) —
    * a different key space whose skew comes only
    * from genuinely identical-ish documents, bounded by its own
    * `maxSigClique` cap (an identical-sig clique above the cap is
    * definitional exact-dup boilerplate: `exactByKey` territory, and
    * emitting its O(b²) pairs would be the same reducer blowup the
    * block cap exists to stop; 0 = follow `maxBucketSize`). Net recall
    * contract: Hamming-0 pairs are guaranteed whenever their
    * identical-sig group is within the clique cap, regardless of block
    * heat; Hamming 1-3 pairs keep the every-matching-block-hot caveat.
    */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 2000,
      maxSigClique: Int = 0): DataFrame = {
    require(maxHamming <= 3, "4-block banding only guarantees recall for Hamming <= 3")
    val sigs = docs.select(col(idCol),
      HashExpressions.simHash64(TextFunctions.tokens(col(textCol))).as("sig"))
    val blocks = (0 until 4).map { j =>
      struct(lit(j).as("block_idx"),
        shiftrightunsigned(col("sig"), j * 16).bitwiseAND(lit(0xFFFFL)).as("block_value"))
    }
    // persisted: the hot-key count + both self-join sides would otherwise
    // each re-fingerprint the whole corpus; released after the (small)
    // pair list is materialized
    val exploded = sigs.select(col(idCol), col("sig"),
      explode(array(blocks: _*)).as("b"))
      .select(col(idCol), col("sig"), col("b.block_idx"), col("b.block_value"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // hot blocks computed ONCE (the dropHotKeys shape, inlined) so the
    // same broadcast set serves the anti-join guard AND the rescue
    // lane's all-blocks-hot gate below
    val hotBlocks = exploded
      .groupBy(col("block_idx"), col("block_value"))
      .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucketSize)
      .select(col("block_idx"), col("block_value"))
    val bounded =
      if (maxBucketSize <= 0) exploded
      else exploded.join(broadcast(hotBlocks),
        Seq("block_idx", "block_value"), "left_anti")
    val a = bounded.select(col("block_idx"), col("block_value"),
      col(idCol).as("id_a"), col("sig").as("sig_a"))
    val b = bounded.select(col("block_idx"), col("block_value"),
      col(idCol).as("id_b"), col("sig").as("sig_b"))
    val banded = a.join(b, Seq("block_idx", "block_value"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        HashExpressions.hammingDistance(col("sig_a"), col("sig_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
    // Hamming-0 rescue lane (see scaladoc): identical-sig pairs, capped
    // on the full-sig key so an identical-doc flood stays bounded. An
    // identical pair is lost from the banded lane iff EVERY one of its
    // blocks is hot — and an identical-sig group shares all four block
    // VALUES, so heat is uniform across the group: the lane only needs
    // docs whose 4 blocks are all hot (countDistinct guards the
    // duplicate-id case), not a corpus-wide sig self-join. With no hot
    // blocks (the common case) the gate is empty and AQE collapses the
    // whole rescue subtree; the cap verdict is unchanged because the
    // filtered group is always the whole identical-sig group or none
    // of it. maxBucketSize <= 0 disables the guard, so nothing is ever
    // dropped and no rescue is needed.
    val sameSig =
      if (maxBucketSize <= 0)
        exploded.filter(lit(false)).select(col(idCol).as("id_a"),
          col(idCol).as("id_b"), lit(0).cast("int").as("hamming"))
      else {
        val allHot = exploded.join(broadcast(hotBlocks),
            Seq("block_idx", "block_value"), "left_semi")
          .groupBy(col(idCol), col("sig"))
          .agg(countDistinct(col("block_idx")).as("__nh"))
          .filter(col("__nh") === 4)
          .select(col(idCol), col("sig"))
        val sigCap = if (maxSigClique > 0) maxSigClique else maxBucketSize
        val sigBounded = LshGuards.dropHotKeys(allHot, Seq("sig"), sigCap)
        sigBounded.select(col("sig"), col(idCol).as("id_a"))
          .join(sigBounded.select(col("sig"), col(idCol).as("id_b")), Seq("sig"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            lit(0).cast("int").as("hamming"))
      }
    // min-hamming per id pair, not dropDuplicates: under duplicate ids
    // (two docs sharing one id) the same (id_a, id_b) can carry several
    // hamming values, and an arbitrary pick is nondeterministic — the
    // q25 sf100 gate caught exactly that via its planted-id collision
    val result = banded.unionByName(sameSig)
      .groupBy(col("id_a"), col("id_b")).agg(min(col("hamming")).as("hamming"))
    val out = result.localCheckpoint() // eager
    exploded.unpersist()
    out
  }

  /** Brute-force SimHash pairs (test oracle for simHashPairs recall). */
  def simHashPairsBrute(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col(idCol),
      HashExpressions.simHash64(TextFunctions.tokens(col(textCol))).as("sig"))
    val a = sigs.select(col(idCol).as("id_a"), col("sig").as("sig_a"))
    val b = sigs.select(col(idCol).as("id_b"), col("sig").as("sig_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        HashExpressions.hammingDistance(col("sig_a"), col("sig_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** n-gram Jaccard similarity of every doc against one probe doc —
    * a linear scan (no pair explosion), useful for "find docs like X".
    * Shingles live in hash space (`TextFunctions.ngramHashes`): identical
    * set sizes, no gram strings built or compared.
    */
  def jaccardToProbe(docs: DataFrame, idCol: String, textCol: String,
      probeId: Long, shingleSize: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol),
      array_distinct(TextFunctions.ngramHashes(
        TextFunctions.tokenHashes(TextFunctions.tokens(col(textCol))), shingleSize)).as("sh"))
    val probe = sh.filter(col(idCol) === probeId)
      .select(col("sh").as("probe_sh"))
    sh.filter(col(idCol) =!= probeId)
      .crossJoin(broadcast(probe))
      .select(col(idCol),
        (size(array_intersect(col("sh"), col("probe_sh"))).cast("double") /
          size(array_union(col("sh"), col("probe_sh"))).cast("double")).as("jaccard"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, brute-force
    * within the given DataFrame. Quadratic — callers bound the input (or
    * use the LSH-bucketed variant below) at scale.
    */
  def embeddingPairsBrute(embs: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = embs.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = embs.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", VectorFunctions.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") > threshold)
      .select("id_a", "id_b")
  }

  /** Embedding near-dup, LSH-bucketed (the 100 TB path): multi-table
    * random-hyperplane buckets bound the candidate set; exact cosine
    * verifies, so precision is 1.0 and only recall is probabilistic.
    *
    * A pair at angle θ lands in the same bucket of one table with prob
    * (1-θ/π)^nPlanes; across tables recall is 1-(1-p)^nTables. Defaults
    * (6 planes × 8 tables) give ≈0.98 recall at cosine 0.9 — tuned for
    * the near-duplicate regime; widen nTables for lower thresholds.
    *
    * Scale: candidate generation shuffles (table_idx, bucket, id, vec);
    * the exact-cosine verify is a narrow codegen'd pass per collision
    * BEFORE the pair dedup, so the final dropDuplicates exchanges only
    * surviving id pairs. Hot buckets (e.g. zero-vector clusters) are
    * capped like the text-LSH paths.
    */
  def embeddingPairsLsh(embs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, nPlanes: Int = 6, nTables: Int = 8,
      seed: Long = 42L, maxBucketSize: Int = 2000): DataFrame = {
    val tables = (0 until nTables).map { t =>
      struct(lit(t).as("table_idx"),
        VectorFunctions.hyperplaneSignature(col(vecCol), dim, nPlanes, seed + t)
          .as("bucket"))
    }
    // persisted: the hot-key count + both self-join sides would otherwise
    // each recompute nPlanes×nTables hyperplane signatures over the whole
    // corpus; released after the (small) pair list is materialized
    val exploded = embs
      .select(col(idCol), col(vecCol), explode(array(tables: _*)).as("tb"))
      .select(col(idCol), col(vecCol), col("tb.table_idx"), col("tb.bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bounded = LshGuards.dropHotKeys(exploded, Seq("table_idx", "bucket"), maxBucketSize)
    val a = bounded.select(col("table_idx"), col("bucket"),
      col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = bounded.select(col("table_idx"), col("bucket"),
      col(idCol).as("id_b"), col(vecCol).as("v_b"))
    val result = a.join(b, Seq("table_idx", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", VectorFunctions.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") > threshold)
      .select("id_a", "id_b")
      .dropDuplicates()
    val out = result.localCheckpoint() // eager
    exploded.unpersist()
    out
  }
}
