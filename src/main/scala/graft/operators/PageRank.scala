package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank — the link-graph quality prior corpus-curation
  * pipelines use as a document-level signal (harvest-rank a crawl
  * before quality filtering), the iterative-join sibling of
  * [[graft.dedup.Components.connectedComponents]].
  *
  * Spark-first shape, one *fundamental* shuffle per iteration (the
  * contribution re-key from src to dst — the transpose multiply that
  * IS PageRank); everything else is arranged so it never re-shuffles:
  *   - the static per-vertex out-degree is carried INSIDE the rank
  *     state `(id, deg, rank)` — joining `ranks ⋈ outDeg` every round
  *     (the previous shape) paid a join per iteration for a value that
  *     never changes;
  *   - edges are hash-partitioned by `src` once and localCheckpointed —
  *     the per-round `ranks ⋈ edges` join re-shuffles only the rank
  *     side (|V| narrow rows), never the edge set (|E| rows);
  *   - the dangling-vertex rank mass (vertices with no out-edges) is a
  *     1-row aggregate cross-joined back in as a broadcast, NOT a
  *     per-iteration `.head` driver action — iterations chain lazily
  *     and materialize in one job per lineage cut instead of one
  *     blocking job per round.
  * `new = (1-d)/N + d*danglingMass/N + d*contrib` — the standard
  * stochastic-matrix completion, so ranks keep summing to 1 (the
  * expression replays the exact FP evaluation order of the scalar
  * formulation it replaces).
  *
  * Lineage is cut with `localCheckpoint` every third round (the
  * Components.scala discipline): iterative joins otherwise stack an
  * exponentially deepening plan. Intermediate rounds persist lazily and
  * are released at the next cut, so at most three rounds of rank state
  * are ever held. Scale: each iteration is one key-partitioned join +
  * one aggregation over |E| and |V| rows — the textbook distributed
  * formulation that holds at any edge count; vertex ranks never sit on
  * the driver.
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
    import org.apache.spark.storage.StorageLevel
    // edges re-read every iteration: partition by the join key ONCE and
    // materialize — localCheckpoint preserves the hash partitioning, so
    // the per-round contribution join never moves the edge set again
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .repartition(col("src"))
      .localCheckpoint()
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // static (id, deg): deg is NULL exactly on dangling vertices. Built
    // and checkpointed once, partitioned by id — both per-round
    // consumers (the rank update join and the dangling filter) read it
    // without a shuffle.
    val verticesDeg = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .join(outDeg, col("id") === col("src"), "left")
      .select(col("id"), col("deg"))
      .repartition(col("id"))
      .localCheckpoint()
    val n = verticesDeg.count()
    require(n > 0, "pageRank needs at least one edge")
    var ranks = verticesDeg.withColumn("rank", lit(1.0 / n))
    // lazy persists of the rounds since the last lineage cut — released
    // once the next cut's localCheckpoint has materialized past them
    var pending: Seq[DataFrame] = Nil
    var i = 0
    while (i < iterations) {
      // rank mass on dangling vertices — a 1-row aggregate kept IN the
      // plan (broadcast cross join) instead of a per-round driver action
      val dangling = ranks.filter(col("deg").isNull)
        .agg(coalesce(sum("rank"), lit(0.0)).as("__dm"))
      val contribs = ranks.filter(col("deg").isNotNull)
        .select(col("id"), (col("rank") / col("deg")).as("share"))
        .join(e, col("id") === e("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum("share").as("contrib"))
      // (1-d)/n + d*dm/n + d*contrib — identical FP evaluation order to
      // the scalar `base = (1-d)/n + d*dm/n; base + d*contrib` this
      // expression replaces, so ranks are bit-identical
      val nextRaw = verticesDeg
        .join(contribs, Seq("id"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"), col("deg"),
          (lit((1.0 - damping) / n) +
            lit(damping) * col("__dm") / lit(n.toDouble) +
            lit(damping) * coalesce(col("contrib"), lit(0.0))).as("rank"))
      val cut = i % 3 == 2 || i == iterations - 1
      if (cut) {
        ranks = nextRaw.localCheckpoint() // eager: lineage cut here
        pending.foreach(_.unpersist())
        pending = Nil
      } else {
        ranks = nextRaw.persist(StorageLevel.MEMORY_AND_DISK) // lazy
        pending :+= ranks
      }
      i += 1
    }
    ranks.select(col("id"), col("rank"))
  }
}
