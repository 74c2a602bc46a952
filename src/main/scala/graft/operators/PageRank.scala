package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank — the link-graph quality prior corpus-curation
  * pipelines use as a document-level signal (harvest-rank a crawl
  * before quality filtering), the iterative-join sibling of
  * [[graft.dedup.Components.connectedComponents]].
  *
  * Spark-first shape: one shuffle per iteration. Ranks live keyed by
  * vertex; each round
  *   1. contributions = ranks ⋈ edges on src, each edge carrying
  *      `rank/out_degree` to its dst (broadcast nothing — both sides
  *      are keyed and co-shuffle on the join key);
  *   2. a grouped SUM per dst (map-side partial aggregation);
  *   3. `new = (1-d)/N + d * (sum + danglingMass/N)` where
  *      danglingMass is the rank mass sitting on vertices with no
  *      out-edges this round (one tiny driver-side aggregate — a
  *      scalar, not a collect), redistributed uniformly — the standard
  *      stochastic-matrix completion, so ranks keep summing to 1.
  *
  * Lineage is cut with `localCheckpoint` every round (the
  * Components.scala discipline): iterative joins otherwise stack an
  * exponentially deepening plan. Scale: each iteration is one
  * key-partitioned join + one aggregation over |E| and |V| rows — the
  * textbook distributed formulation that holds at any edge count;
  * vertex ranks never sit on the driver.
  *
  * Dedup/duplicate edges are NOT collapsed: parallel edges weight a
  * link twice, matching the adjacency-matrix definition over a
  * multigraph. Callers wanting simple-graph semantics distinct their
  * edges first.
  *
  * Returns (id, rank) with ranks summing to 1 over the vertex set
  * (sources ∪ destinations).
  */
object PageRank {

  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "iterations must be at least 1")
    require(damping > 0 && damping < 1, "damping must be in (0, 1)")
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint() // edges re-read every iteration: materialize once
    val vertices = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint()
    val n = vertices.count()
    require(n > 0, "pageRank needs at least one edge")
    // out-degree per source; vertices absent here are dangling
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    import org.apache.spark.storage.StorageLevel
    var ranks = vertices.withColumn("rank", lit(1.0 / n)).localCheckpoint()
    // persisted frames of the PREVIOUS round, released once the current
    // round's action has materialized everything derived from them (the
    // Components.scala discipline — unpersist() is a no-op on
    // localCheckpoint blocks, so per-round state is persist()-ed and
    // lineage is cut with a checkpoint every third round)
    var superseded: Seq[DataFrame] = Nil
    var i = 0
    while (i < iterations) {
      // persisted once per round: serves BOTH the dangling-mass scalar
      // and the contribution join (would otherwise re-run the
      // ranks⋈outDeg join twice per iteration)
      val withDeg = ranks.join(outDeg, ranks("id") === outDeg("src"), "left")
        .select(ranks("id"), col("rank"), col("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // rank mass on dangling vertices — a scalar aggregate; this
      // action materializes withDeg (and with it the previous round's
      // lazy persist), so the superseded blocks can be dropped
      val danglingMass = withDeg.filter(col("deg").isNull)
        .agg(coalesce(sum("rank"), lit(0.0))).head.getDouble(0)
      superseded.foreach(_.unpersist())
      val contribs = withDeg.filter(col("deg").isNotNull)
        .select(col("id"), (col("rank") / col("deg")).as("share"))
        .join(e, col("id") === e("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum("share").as("contrib"))
      val base = (1.0 - damping) / n + damping * danglingMass / n
      val nextRaw = vertices
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + lit(damping) * coalesce(col("contrib"), lit(0.0)))
            .as("rank"))
      val cut = i % 3 == 2 || i == iterations - 1
      val next =
        if (cut) nextRaw.localCheckpoint() // eager: lineage cut here
        else nextRaw.persist(StorageLevel.MEMORY_AND_DISK) // lazy
      superseded = withDeg +: (if (cut) Nil else Seq(next))
      ranks = next
      i += 1
    }
    superseded.filterNot(_ eq ranks).foreach(_.unpersist())
    ranks
  }
}
