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
  * Two execution paths, picked by pair-list size:
  *   - **Driver union-find** when ids are integral AND the pair list
  *     fits under `maxDriverEdges` (default 1M edges — a few hundred MB
  *     of collected Rows at the worst, bounded; size the flag to your
  *     driver heap). The pair list is the OUTPUT of an LSH verify —
  *     tiny relative to the corpus — so this is the overwhelmingly
  *     common case, and iterative Spark jobs on a small graph are pure
  *     scheduling overhead (measured: 7-13 s for a 753-node graph vs
  *     milliseconds on the driver). Bounded, like the IVF quantizer's
  *     collect.
  *   - **Distributed min-label propagation** beyond the bound: each
  *     round is one join edges⋈labels + one groupBy-min — both shuffle
  *     only (id, label) longs. The convergence signal is a `__changed`
  *     flag computed INSIDE the propagation select, so one count-job per
  *     round both materializes the round and decides the exit. Rounds
  *     persist in memory/disk and lineage is cut with an eager
  *     `localCheckpoint` every `checkpointInterval` rounds; superseded
  *     round caches are released as soon as the next round materializes.
  *
  * Integral ids come back as longs (driver path) or their input type
  * (distributed); non-integral ids (string/UUID keys) always take the
  * distributed path, whose min-label semantics work for any orderable
  * type.
  */
object Components {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Pairs (id_a, id_b) → (id, cluster_id) for every id present, where
    * cluster_id = min id of the connected component.
    *
    * Logs a warning if `maxIter` rounds pass without convergence — in
    * that state components wider than maxIter carry SPLIT labels and a
    * downstream dedup under-deduplicates; raise maxIter. (The driver
    * path always converges exactly.)
    */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIter: Int = 20,
      checkpointInterval: Int = 3, maxDriverEdges: Int = 1000000): DataFrame = {
    val spark = pairs.sparkSession
    val integralIds = Seq(idA, idB).forall { c =>
      pairs.schema(c).dataType match {
        case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => true
        case _ => false
      }
    }

    // un-cast: the distributed path's min-label propagation works for any
    // orderable id type (strings included); only the driver path needs longs
    val pairList = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    if (maxDriverEdges > 0 && integralIds) {
      // limit+collect: if we get fewer than the cap we already hold the
      // whole edge list — one job, no separate count
      val sample = pairList.select(col("src").cast("long"), col("dst").cast("long"))
        .limit(maxDriverEdges + 1).collect()
      if (sample.length <= maxDriverEdges) {
        pairList.unpersist()
        return driverUnionFind(spark,
          sample.map(r => (r.getLong(0), r.getLong(1))))
      }
    }

    // symmetric edge list; pairList stays cached so the (possibly
    // expensive) upstream pair computation runs once, not once per
    // union branch
    val edges = pairList
      .union(pairList.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint() // eager: also materializes the edges cache
    pairList.unpersist()
    var superseded: DataFrame = null // previous round's persist, to release

    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // each node pulls the min label over itself + its neighbors;
      // __changed rides along so convergence needs no second probe job
      val fromNeighbors = edges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min("label").as("nbr_label"))
      val nextRaw = labels.join(fromNeighbors, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"),
          coalesce(col("nbr_label") < col("label"), lit(false)).as("__changed"))
      val cutLineage = iter % checkpointInterval == checkpointInterval - 1
      val next =
        if (cutLineage) nextRaw.localCheckpoint() // eager: materializes too
        else nextRaw.persist(StorageLevel.MEMORY_AND_DISK)
      // the count materializes every partition of `next` (narrow filter
      // over the cached round) AND yields the convergence decision
      converged = next.filter(col("__changed")).count() == 0L
      if (superseded != null) superseded.unpersist()
      superseded = if (cutLineage) null else next
      labels = next.drop("__changed")
      iter += 1
    }
    if (!converged)
      log.warn(s"connectedComponents did not converge in $maxIter rounds; " +
        "components with diameter > maxIter keep split cluster labels — raise maxIter")
    // hand back a checkpointed result so every intermediate cache can go
    val result = labels.withColumnRenamed("label", "cluster_id")
    val out = if (superseded != null) {
      val r = result.localCheckpoint()
      superseded.unpersist()
      r
    } else result
    edges.unpersist()
    out
  }

  /** Exact union-find with path compression and min-root union (the
    * smaller root absorbs, so every final root is its component's min id
    * — identical semantics to the propagation path).
    */
  private def driverUnionFind(spark: org.apache.spark.sql.SparkSession,
      edges: Array[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    // iterative find + compression: a multi-million-edge chain must not
    // recurse the stack away
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElseUpdate(r, r) != r) r = parent(r)
      var c = x
      while (c != r) { val next = parent(c); parent(c) = r; c = next }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.toSeq.map(k => (k, find(k)))
      .toDF("id", "cluster_id")
  }

  /** Incrementally extend a persisted (id, cluster_id) labeling with a
    * NEW batch of ids and near-dup pairs — the cluster-maintenance twin
    * of [[graft.dedup.IncrementalDedup]]: a daily pipeline keeps its
    * transitive duplicate clusters current WITHOUT recomputing the pair
    * graph of the whole corpus.
    *
    * Mechanics: each new pair's endpoints resolve to their CURRENT
    * cluster labels (ids the store has never seen label themselves), so
    * the transitive-merge problem collapses to a LABEL-level edge list
    * bounded by the batch — at most one edge per new pair, regardless of
    * corpus size. That bounded list runs through exact driver union-find
    * (min-root, the same semantics and bounded-collect posture as
    * [[connectedComponents]]' common path; `maxBatchEdges` guards the
    * bound), and the resulting label→root remap applies back as a
    * BROADCAST join: only clusters actually bridged by the batch change
    * labels, every other store row passes through untouched
    * (ComponentsSpec proves the untouched-cluster property and
    * incremental ≡ full-recompute equality).
    *
    * `newIds` must carry every id of the new snapshot (paired or not);
    * unpaired new ids become singleton clusters. Store ids and new ids
    * must be disjoint, and the store labeling must be CANONICAL
    * (cluster_id = min member id — what [[connectedComponents]]
    * produces); the merge preserves canonicality, so chained batches
    * stay valid inputs. A new id smaller than an existing cluster's min
    * relabels that cluster (the min-id canonical convention, applied
    * honestly); with time-monotone ids this never happens.
    */
  def extendComponents(labels: DataFrame, newIds: DataFrame, idCol: String,
      newPairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
      maxBatchEdges: Int = 1000000): DataFrame =
    extendComponentsWithDelta(labels, newIds, idCol, newPairs, idA, idB,
      maxBatchEdges).labels

  /** [[extendComponents]]' full labeling plus the CHANGE DELTA — exactly
    * the rows an append-only (CDC-style) labels table writes per batch:
    * store rows whose cluster label was remapped by a merge, plus the
    * new ids' labels. The delta join touches only remapped labels
    * (broadcast inner join against the non-identity part of the remap),
    * never the whole store.
    */
  case class ExtendResult(labels: DataFrame, delta: DataFrame)

  def extendComponentsWithDelta(labels: DataFrame, newIds: DataFrame,
      idCol: String, newPairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxBatchEdges: Int = 1000000): ExtendResult = {
    val spark = labels.sparkSession
    import spark.implicits._
    // the union-find runs on longs; a string id would cast to null and
    // silently collapse into one bogus component — refuse instead
    (newPairs.schema(idA).dataType +: newPairs.schema(idB).dataType +:
      labels.schema.fields.map(_.dataType).toSeq).foreach {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => ()
      case other => throw new IllegalArgumentException(
        s"extendComponents needs integral ids/labels, got $other — " +
          "run the full connectedComponents (its distributed path handles any orderable id)")
    }
    val la = labels.select(col("id").as(idA), col("cluster_id").as("__la"))
    val lb = labels.select(col("id").as(idB), col("cluster_id").as("__lb"))
    val resolved = newPairs.select(col(idA), col(idB))
      .join(la, Seq(idA), "left").join(lb, Seq(idB), "left")
      .select(coalesce(col("__la"), col(idA)).cast("long").as("src"),
        coalesce(col("__lb"), col(idB)).cast("long").as("dst"))
      .limit(maxBatchEdges + 1).collect()
    require(resolved.length <= maxBatchEdges,
      s"extendComponents: batch resolves to more than $maxBatchEdges label " +
        "edges — run the full connectedComponents recompute instead")

    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElseUpdate(r, r) != r) r = parent(r)
      var c = x
      while (c != r) { val next = parent(c); parent(c) = r; c = next }
      r
    }
    resolved.foreach { r =>
      val (ra, rb) = (find(r.getLong(0)), find(r.getLong(1)))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val remap = parent.keys.toSeq.map(k => (k, find(k)))
      .toDF("__from", "__root")

    val updatedStore = labels
      .join(broadcast(remap.withColumnRenamed("__from", "cluster_id")),
        Seq("cluster_id"), "left")
      .select(col("id"),
        coalesce(col("__root"), col("cluster_id")).as("cluster_id"))
    // a new id's initial label is itself, so the same remap resolves it
    val newLabels = newIds.select(col(idCol).as("id"))
      .join(broadcast(remap.withColumnRenamed("__from", "id")), Seq("id"), "left")
      .select(col("id"), coalesce(col("__root"), col("id")).as("cluster_id"))
    // changed store rows only: inner join against the remap entries that
    // actually move a label
    val moved = remap.filter(col("__from") =!= col("__root"))
    val changedStore = labels
      .join(broadcast(moved.withColumnRenamed("__from", "cluster_id")),
        Seq("cluster_id"))
      .select(col("id"), col("__root").as("cluster_id"))
    ExtendResult(updatedStore.unionByName(newLabels),
      changedStore.unionByName(newLabels))
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
