package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over a pair list — turns pairwise
  * near-duplicate hits into transitive duplicate CLUSTERS (a~b, b~c ⇒
  * {a,b,c} share one cluster even if a,c never collided).
  *
  * Algorithm: iterative min-label propagation. Each node starts labeled
  * with its own id; every round each node takes the min of its label and
  * its neighbors' labels; converges in O(component diameter) rounds.
  * Near-dup graphs are overwhelmingly tiny star/clique components, so
  * 3-5 rounds settle real corpora.
  *
  * Scale notes: each round is one join edges⋈labels + one groupBy-min —
  * both shuffle only (id, label) longs. Labels persist per round and the
  * loop exits early via a cheap changed-count check; `localCheckpoint`
  * cuts the growing lineage so round N's plan doesn't replay rounds
  * 1..N-1.
  */
object Components {

  /** Pairs (id_a, id_b) → (id, cluster_id) for every id present, where
    * cluster_id = min id of the connected component.
    */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIter: Int = 20): DataFrame = {
    // symmetric edge list
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .union(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()

    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // each node pulls the min label over itself + its neighbors
      val fromNeighbors = edges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min("label").as("nbr_label"))
      val next = labels.join(fromNeighbors, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .localCheckpoint()
      converged = next.join(labels.withColumnRenamed("label", "old"), Seq("id"))
        .filter(col("label") < col("old")).isEmpty
      labels = next
      iter += 1
    }
    edges.unpersist()
    labels.withColumnRenamed("label", "cluster_id")
  }

  /** Transitive dedup: drop every member of each near-duplicate component
    * except its smallest id. Ids absent from `pairs` are untouched.
    */
  def dropDuplicateClusters(docs: DataFrame, pairs: DataFrame,
      idCol: String): DataFrame = {
    val comps = connectedComponents(pairs)
    val losers = comps.filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }
}
