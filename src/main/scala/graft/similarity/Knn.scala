package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * `bruteForce` is the exact baseline: broadcast the (small) probe set,
  * score every corpus row, per-probe top-k via window. Linear in corpus
  * size, embarrassingly parallel — at 100 TB this is the right shape when
  * the probe set is small (the corpus never shuffles; only k rows per
  * probe per partition survive the partial rank).
  *
  * `lshBuckets` is the sub-linear scale path: random-hyperplane signatures
  * with multiple independent tables; probes only score candidates sharing
  * a bucket in at least one table. Probabilistic recall (tune tables up).
  */
object Knn {

  /** Exact top-k: one row per (query_id, rnk) with the neighbor id.
    * Ties pinned by neighbor id asc. Self-matches excluded.
    */
  def bruteForce(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val p = probes.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .crossJoin(broadcast(p))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", VectorFunctions.cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk")
  }

  /** IVF-Flat ANN: k-means coarse quantizer (deterministic hash-seeded
    * centroids + `lloydIters` distributed refinement passes), corpus
    * partitioned into `nlist` inverted lists, probes scored only against
    * their `nprobe` nearest lists.
    *
    * Scale notes: the quantizer is tiny (nlist × dim floats) and is
    * broadcast — assignment is a narrow codegen'd map over the corpus, and
    * at 100 TB the assigned corpus would be written partitioned/bucketed by
    * `cluster_id` so a probe touches nprobe/nlist of the data. The only
    * shuffles are the Lloyd mean re-computation (bounded: nlist × dim
    * rows) and the final per-probe top-k.
    */
  /** Centroid top-n as a codegen'd expression over the broadcast
    * quantizer — one transform loop over the centroid literal array (an
    * unrolled cosine per centroid bloats codegen nlist-fold). Returns
    * (neg-sim, idx) structs; `("idx")` extracts the list id.
    */
  private[graft] def centroidTop(vec: Column, cents: Array[Array[Float]],
      n: Int): Column = {
    val centsLit = typedLit(cents.map(_.toSeq).toSeq)
    val sims = transform(centsLit, c => VectorFunctions.cosine(vec, c))
    // (sim, idx) structs sorted desc by sim, idx asc on ties → top-n ids
    val ranked = sort_array(
      transform(sims, (s, i) => struct((-s).as("neg"), i.as("idx"))))
    slice(ranked, 1, n)
  }

  /** Deterministic hash-seeded k-means (the coarse quantizer shared by
    * [[ivf]], [[semanticDedup]] and [[embeddingOutliers]]): smallest
    * xxhash64(id) rows seed, `lloydIters` distributed refinement passes.
    * Driver state is nlist × dim floats — bounded and broadcast back.
    */
  /** Training-set cap for the k-means quantizers: codebook quality
    * saturates at a few thousand samples per centroid, so Lloyd passes
    * never need the full corpus — at 100 TB they would otherwise scan
    * billions of vectors per iteration (q65 measured 406 s at the sf100
    * rung, dominated by full-corpus assignment passes). The cap is a
    * deterministic uniform sample (smallest xxhash64(id) prefix), so
    * corpora at or under it train on everything — bit-identical to the
    * uncapped form at every spec/fixture scale — and the seed protocol
    * (the first `nlist`/`ksub` of the same ordering) is unchanged at
    * any scale.
    */
  val DefaultTrainMax: Int = 1 << 16

  private[graft] def trainQuantizer(corpus: DataFrame, idCol: String,
      vecCol: String, nlist: Int, lloydIters: Int,
      trainMax: Int = DefaultTrainMax): Array[Array[Float]] = {
    // bounded deterministic training set; see [[DefaultTrainMax]].
    // id tiebreaker: xxhash64 ties at the limit() cut boundary would
    // otherwise make the training set (hence centroids and ANN output)
    // run-dependent — same ordering contract as the PQ codebook path.
    //
    // ONE bounded collect, then Lloyd entirely driver-side: the
    // training problem is trainMax-capped by design (≤ 64Ki × dim
    // floats ≈ 16 MB — the same bounded-driver-state budget the
    // centroid broadcast already spends), so paying a localCheckpoint
    // materialization plus one distributed assign+posexplode+avg
    // shuffle round PER iteration priced cluster round-trips for a
    // fixed-size in-memory computation (guide §2.4: remove shuffles
    // outright; this is also how production ANN libraries train —
    // sample to the trainer, keep the cluster for encode/scan).
    // Assignment replays computeVecCosine's loop order bit-for-bit;
    // the per-cluster means sum in the deterministic (__h, id) train
    // order (the old avg() summed in partition order — both land on
    // the same float after the .toFloat rounding).
    val train: Array[Array[Float]] = corpus
      .select(col(idCol), col(vecCol))
      .withColumn("__h", xxhash64(col(idCol)))
      .orderBy(col("__h"), col(idCol)).limit(trainMax)
      .select(vecCol).collect()
      .map(_.getSeq[Float](0).toArray)
    // 1. deterministic seed centroids: smallest xxhash64(id) wins
    var centroids: Array[Array[Float]] = train.take(nlist)

    // 2. Lloyd refinement: assign → per-cluster elementwise mean
    for (_ <- 0 until lloydIters) {
      val dim = centroids.head.length
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Long](centroids.length)
      train.foreach { v =>
        // argmax cosine, ties on smallest index — centroidTop's
        // (-sim, idx) struct sort with java.lang.Double NaN ordering
        var best = 0; var bestSim = Double.NaN; var c = 0
        while (c < centroids.length) {
          val cent = centroids(c)
          var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < dim) {
            val x = v(i).toDouble; val y = cent(i).toDouble
            dot += x * y; na += x * x; nb += y * y; i += 1
          }
          val sim = dot / (math.sqrt(na) * math.sqrt(nb))
          if (c == 0 || java.lang.Double.compare(-sim, -bestSim) < 0) {
            best = c; bestSim = sim
          }
          c += 1
        }
        val s = sums(best); var i = 0
        while (i < dim) { s(i) += v(i).toDouble; i += 1 }
        counts(best) += 1L
      }
      centroids = centroids.indices.map { i =>
        if (counts(i) == 0L) centroids(i) // empty cluster keeps its seed
        else sums(i).map(x => (x / counts(i)).toFloat)
      }.toArray
    }
    centroids
  }

  def ivf(corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4, lloydIters: Int = 1): DataFrame = {
    val centroids = trainQuantizer(corpus, idCol, vecCol, nlist, lloydIters)

    // 3. inverted lists + probe routing to nprobe lists
    val indexed = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .withColumn("cluster_id", element_at(centroidTop(col("c_vec"), centroids, 1), 1)("idx"))
    val routed = probes
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("cluster_id",
        explode(transform(centroidTop(col("q_vec"), centroids, nprobe), s => s("idx"))))

    // 4. exact cosine within the probed lists, per-probe top-k
    val scored = indexed.join(broadcast(routed), Seq("cluster_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", VectorFunctions.cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk")
  }

  /** Product-quantization ANN (PQ with ADC scoring): vectors are
    * L2-normalized (cosine ≡ inner product on unit vectors), split into
    * `blocks` subvectors, and each block is vector-quantized against its
    * own `ksub`-centroid codebook (deterministic hash-seeded k-means,
    * same protocol as [[ivf]]'s coarse quantizer). A corpus vector then
    * compresses to `blocks` small codes — at 100 TB THIS is the point:
    * a dim-64 float corpus (256 B/vector) becomes 8 codes (8 B packed),
    * so the exhaustive compressed-domain scan reads ~32x less and stays
    * a narrow map over the codes table. Queries score by asymmetric
    * distance computation: the query stays exact, each code looks up its
    * block's centroid, and because dot products are linear over
    * concatenated blocks, `dot(q, decode(codes))` IS the ADC sum
    * Σ_b dot(q_b, C_b[code_b]) — computed below with the classic
    * lookup-table trick: each probe precomputes its blocks × ksub
    * query-centroid dot table once (a bounded column on the broadcast
    * probe side), so scoring a corpus row is `blocks` table lookups
    * instead of decoding a dim-length vector and re-dotting it.
    *
    * Driver-side state, bounded and deliberate (the [[ivf]] pattern):
    * one limit-1 dim probe, `ksub` seed vectors, and the
    * blocks × ksub × (dim/blocks) Lloyd means — the codebook an index
    * build would persist alongside the codes table.
    *
    * Compressed-domain scores are a SHORTLIST, not a ranking: `refine`
    * re-scores the top k*refine ADC candidates per probe with exact
    * cosine and takes the final top-k from those — the standard PQ
    * refinement stage. At 100 TB the re-rank fetches full vectors by id
    * for only k*refine rows per probe (a point-lookup join against the
    * uncompressed table); here the vector rides the frame. Quantization
    * error on structure-free data otherwise dominates (measured on the
    * fixture at 8x16: 0.32 shortlist-only vs 0.86 with refine = 8).
    *
    * KnnSpec proves the degenerate-exactness property (ksub >= corpus
    * size ⇒ every vector is its own centroid ⇒ PQ top-k = exact top-k)
    * and a recall floor at real compression.
    */
  def pq(corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
      k: Int, blocks: Int = 8, ksub: Int = 16, lloydIters: Int = 2,
      refine: Int = 8): DataFrame = {
    import graft.expressions.HashExpressions.vecDot

    // norm computed ONCE per row as its own column: referencing the
    // norm expression inside the transform lambda would re-evaluate it
    // per ELEMENT (O(dim^2) per row — measured as a real cost here)
    def normalized(df: DataFrame, outId: String, outVec: String): DataFrame =
      df.select(col(idCol).as(outId), col(vecCol).as("__v"))
        .withColumn("__n", sqrt(vecDot(col("__v"), col("__v"))))
        .select(col(outId),
          transform(col("__v"), x => x.cast("double") / col("__n")).as(outVec))
    val corp = normalized(corpus, "neighbor_id", "c_vec")

    // bounded deterministic training set ([[DefaultTrainMax]]): Lloyd
    // refinement never scans the full corpus, only the final encode
    // does. ONE bounded collect (≤ 64Ki × dim doubles ≈ 32 MB) brings
    // the whole training problem driver-side — the old shape paid a
    // localCheckpoint materialization, a separate ksub seed collect,
    // and one posexplode+avg shuffle round per Lloyd iteration, four
    // sequential cluster round-trips for a trainMax-capped in-memory
    // computation (guide §2.4; [[trainQuantizer]] has the same
    // restructure). Seeds are the prefix of the same (__h, id)
    // ordering, and the dimension comes off the seeds too — a separate
    // limit(1) probe job over the corpus priced one extra Spark job.
    val train: Array[Array[Double]] = corp
      .withColumn("__h", xxhash64(col("neighbor_id")))
      .orderBy(col("__h"), col("neighbor_id")).limit(DefaultTrainMax)
      .select("c_vec").collect().map(_.getSeq[Double](0).toArray)
    val seedVecs = train.take(ksub)
    require(seedVecs.nonEmpty, "pq needs a non-empty corpus")
    val dim = seedVecs.head.length
    require(dim % blocks == 0, s"dim $dim must divide into $blocks blocks")
    val sub = dim / blocks

    // nearest sub-centroid per block: argmin of ||x-c||^2, expanded to
    // (dot(c,c) - 2*dot(x,c)) so the constant-foldable dot(c,c) term
    // folds at optimize time; ties break on centroid index
    def argBest(subv: Column, cents: Array[Array[Double]]): Column = {
      val centsLit = typedLit(cents.map(_.toSeq).toSeq)
      val scored = transform(centsLit, (c, i) => struct(
        (vecDot(c, c) - vecDot(subv, c) * lit(2.0)).as("d2"), i.as("idx")))
      element_at(sort_array(scored), 1)("idx")
    }
    def codesExpr(cents: Array[Array[Array[Double]]]): Column =
      array((0 until blocks).map { b =>
        argBest(slice(col("c_vec"), b * sub + 1, sub), cents(b))
      }: _*)

    var cents: Array[Array[Array[Double]]] = Array.tabulate(blocks) { b =>
      seedVecs.map(v => v.slice(b * sub, (b + 1) * sub))
    }

    // Lloyd refinement, driver-side over the collected train set: per
    // block, assign each subvector to its nearest sub-centroid with
    // argBest's exact arithmetic (d2 = dot(c,c) - 2·dot(x,c), ties on
    // smallest index), then per-(block, code, pos) means summed in the
    // deterministic (__h, id) train order (the old avg() summed in
    // partition order — same values, order-insensitive downstream: the
    // recall contract tolerates ulp-level codebook drift by design)
    for (_ <- 0 until lloydIters) {
      val sums = Array.tabulate(blocks)(b =>
        Array.fill(cents(b).length)(new Array[Double](sub)))
      val counts = Array.tabulate(blocks)(b => new Array[Long](cents(b).length))
      train.foreach { v =>
        var b = 0
        while (b < blocks) {
          val cb = cents(b)
          var best = 0; var bestD2 = Double.NaN; var c = 0
          while (c < cb.length) {
            val cent = cb(c)
            var dcc = 0.0; var dxc = 0.0; var i = 0
            while (i < sub) {
              val y = cent(i)
              dcc += y * y; dxc += v(b * sub + i) * y; i += 1
            }
            val d2 = dcc - dxc * 2.0
            if (c == 0 || java.lang.Double.compare(d2, bestD2) < 0) {
              best = c; bestD2 = d2
            }
            c += 1
          }
          val s = sums(b)(best); var i = 0
          while (i < sub) { s(i) += v(b * sub + i); i += 1 }
          counts(b)(best) += 1L
          b += 1
        }
      }
      cents = Array.tabulate(blocks) { b =>
        Array.tabulate(cents(b).length) { c =>
          if (counts(b)(c) == 0L) cents(b)(c) // empty keeps seed
          else sums(b)(c).map(_ / counts(b)(c))
        }
      }
    }

    // encode once; score via classic ADC lookup tables: each probe
    // precomputes T[b][c] = dot(q_block_b, cent[b][c]) ONCE (blocks*ksub
    // doubles per probe, riding the broadcast), and a corpus row's score
    // is then `blocks` table lookups + adds — instead of materializing
    // the dim-length decoded vector and dotting it per (row x probe).
    // Same ADC sum, grouped per block: Σ_b dot(q_b, cent[b][codes[b]]).
    val encoded = corp.withColumn("codes", codesExpr(cents))
    val p = normalized(probes, "query_id", "q_vec")
      .withColumn("__qt", array((0 until blocks).map { b =>
        graft.expressions.HashExpressions.vecDotMany(
          slice(col("q_vec"), b * sub + 1, sub), cents(b))
      }: _*))
    val adcScore = (0 until blocks).map { b =>
      element_at(element_at(col("__qt"), b + 1),
        element_at(col("codes"), b + 1) + 1)
    }.reduceLeft[Column](_ + _)
    val scored = encoded.crossJoin(broadcast(p))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", adcScore)
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    val shortlist = scored.withColumn("rnk", row_number().over(wAdc))
      .filter(col("rnk") <= k * math.max(refine, 1))
      .drop("rnk", "score")
    // exact re-rank of the shortlist (both sides unit vectors: dot=cosine)
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(vecDot(col("q_vec"), col("c_vec")).desc, col("neighbor_id").asc)
    shortlist.withColumn("rnk", row_number().over(wExact))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk")
  }

  /** LSH-bucketed ANN: `tables` independent hyperplane signatures; union
    * of bucket collisions forms the candidate set, exact cosine ranks it.
    * Returns (query_id, neighbor_id, rnk) like bruteForce; rows may be
    * fewer than k when buckets are sparse.
    *
    * Multi-probe (the IVF-nprobe idea applied to LSH): each PROBE also
    * visits buckets at Hamming distance 1 from its signature — a true
    * neighbor that landed across one hyperplane is then still found.
    * At partial settings (`multiProbe < nPlanes`) the flipped planes are
    * MARGIN-DIRECTED by default: each query flips the planes where its
    * own |dot| margin is smallest — exactly the boundaries a true
    * neighbor most plausibly crossed — rather than a fixed plane prefix
    * (`marginDirected = false` keeps the fixed-prefix strategy; KnnSpec
    * proves the margin choice recalls at least as much on the fixture).
    * The default flips EVERY plane, where the two strategies coincide.
    * Probe-side only: the corpus index stays one bucket per table per
    * row, and the probe set is tiny and broadcast, so visiting
    * (1 + multiProbe) buckets per table costs nothing at corpus scale
    * but multiplies candidate recall. Default -1 = flip every plane
    * (multiProbe = nPlanes); 0 = exact buckets only.
    */
  def lshBuckets(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, nPlanes: Int = 5,
      tables: Int = 12, seed: Long = 42L, multiProbe: Int = -1,
      marginDirected: Boolean = true): DataFrame = {
    val flips = if (multiProbe < 0) nPlanes else math.min(multiProbe, nPlanes)
    def sig(t: Int) =
      VectorFunctions.hyperplaneSignature(col(vecCol), dim, nPlanes, seed + t)
    val c = {
      val tableCols = (0 until tables).map { t =>
        struct(lit(t).as("table_idx"), sig(t).as("bucket"))
      }
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
        explode(array(tableCols: _*)).as("s"))
        .select(col("neighbor_id"), col("c_vec"), col("s.table_idx"), col("s.bucket"))
    }
    val p = {
      // per-table XOR masks: 0 = the exact bucket; 1<<b = plane b flipped
      val maskByPlane = typedLit((0 until nPlanes).map(b => 1L << b))
      def masks(t: Int): Column =
        if (!marginDirected || flips == nPlanes || flips == 0)
          // static: full flip / no flip — plane order is irrelevant
          typedLit(0L +: (0 until flips).map(b => 1L << b))
        else {
          // query-adaptive: rank this table's planes by |margin| asc
          // (ties by index) and flip the `flips` closest boundaries
          val dots = VectorFunctions.hyperplaneDots(col(vecCol), dim, nPlanes, seed + t)
          val ranked = slice(sort_array(
            transform(dots, (d, i) => struct(abs(d).as("a"), i.as("idx")))), 1, flips)
          concat(array(lit(0L)),
            transform(ranked, s => element_at(maskByPlane, s.getField("idx") + 1)))
        }
      val tableCols = (0 until tables).map { t =>
        struct(lit(t).as("table_idx"), sig(t).as("sig"), masks(t).as("masks"))
      }
      probes.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        explode(array(tableCols: _*)).as("s"))
        .select(col("query_id"), col("q_vec"), col("s.table_idx"),
          col("s.sig"), explode(col("s.masks")).as("mask"))
        .select(col("query_id"), col("q_vec"), col("table_idx"),
          col("sig").bitwiseXOR(col("mask")).as("bucket"))
    }
    val candidates = c.join(broadcast(p), Seq("table_idx", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = candidates
      .withColumn("cosine", VectorFunctions.cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk")
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540 — the embedding-space dedup used for LAION/D4
    * corpus pruning): k-means partitions the corpus into `nlist`
    * semantic neighborhoods, and ONLY within-cluster pairs are cosine-
    * compared — near-dups live inside neighborhoods, so the all-pairs
    * blowup is bounded by the largest cluster instead of the corpus
    * (size nlist ~ sqrt(n) at scale and the per-cluster work stays
    * flat). Pairs at `cosine >= threshold` drop the LARGER id (the
    * pipeline-wide survivor convention); survivors return with their
    * cluster id.
    *
    * `nlist = 1` degenerates to exact brute-force dedup (every pair
    * compared) — KnnSpec uses exactly this as the oracle, and proves
    * clustered runs only ever MISS cross-cluster pairs (survivor
    * superset), never invent drops.
    */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nlist: Int = 16, lloydIters: Int = 1): DataFrame = {
    val centroids = trainQuantizer(corpus, idCol, vecCol, nlist, lloydIters)
    val assigned = corpus.withColumn("cluster_id",
      element_at(centroidTop(col(vecCol), centroids, 1), 1)("idx"))
    val l = assigned.select(col("cluster_id"), col(idCol).as("__id_a"),
      col(vecCol).as("__v_a"))
    val r = assigned.select(col("cluster_id"), col(idCol).as("__id_b"),
      col(vecCol).as("__v_b"))
    val losers = l.join(r, Seq("cluster_id"))
      .filter(col("__id_a") < col("__id_b"))
      .filter(VectorFunctions.cosine(col("__v_a"), col("__v_b")) >= threshold)
      .select(col("__id_b").as(idCol)).distinct()
    assigned.join(losers, Seq(idCol), "left_anti")
  }

  /** Centroid-distance outliers — the embedding-space quality gate
    * (off-manifold junk, mislabeled modalities, encoder failures sit far
    * from every semantic neighborhood): assign each vector to its
    * nearest k-means centroid and flag those whose cosine to their OWN
    * centroid falls below `minCentroidCosine`. One narrow codegen'd map
    * over the corpus after the bounded quantizer training — no shuffle
    * at all on the scoring pass.
    */
  def embeddingOutliers(corpus: DataFrame, idCol: String, vecCol: String,
      minCentroidCosine: Double, nlist: Int = 16,
      lloydIters: Int = 1): DataFrame = {
    val centroids = trainQuantizer(corpus, idCol, vecCol, nlist, lloydIters)
    val top = element_at(centroidTop(col(vecCol), centroids, 1), 1)
    corpus
      .withColumn("cluster_id", top("idx"))
      .withColumn("centroid_cosine", -top("neg"))
      .withColumn("is_outlier", col("centroid_cosine") < minCentroidCosine)
  }
}
