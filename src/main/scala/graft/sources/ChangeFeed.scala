package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level change-data-feed reader for [[VersionedTable]]s — the
  * consumer-facing CDC surface (Delta's table_changes analog, built on
  * the same changed-files algebra as `IncrementalView.changedFilesFeed`):
  * every change between two versions, classified `insert` / `delete` /
  * `update_preimage` / `update_postimage` and attributed to the commit
  * that made it (`_commit_version`).
  *
  * I/O is O(changed files) per commit, never O(table): a commit's
  * changes are recovered from the files it added vs the files it
  * removed. Copy-on-write rewrites carry surviving rows into new files,
  * so carried rows appear on BOTH sides with equal values and emit
  * nothing; the classification join only shuffles changed-file rows on
  * the key.
  *
  * `keys` must uniquely identify rows within every version (the same
  * contract as MERGE); with duplicate keys the pre/post pairing is
  * ill-defined — use the key-free weighted feed
  * (`IncrementalView.changedFilesFeed`) for multiset-semantics
  * consumers instead.
  */
object ChangeFeed {

  /** All changes committed after `fromVersion` up to and including
    * `toVersion`, one classification per commit (a key changed by
    * several commits appears once per commit, each under its own
    * `_commit_version`). Output: key columns, value columns (pre-image
    * values on `delete`/`update_preimage`, post-image on
    * `insert`/`update_postimage`), `_change_type`, `_commit_version`.
    *
    * Plan depth is bounded: the naive form is one full-outer join per
    * commit unioned into a single tree, which for a range spanning
    * hundreds of commits melts the optimizer (analysis/optimization cost
    * grows superlinearly in tree size). Commits are therefore compiled in
    * chunks of `checkpointEvery`; each chunk is cut behind a lazy
    * `localCheckpoint` (its logical plan collapses to a scan of the
    * chunk's RDD — the optimizer never sees more than `checkpointEvery`
    * joins at once, and nothing materializes until the consumer's first
    * action). A range at or under `checkpointEvery` commits compiles
    * exactly as before, with no checkpoint in the plan.
    *
    * Reliability trade-off: `localCheckpoint` blocks live only on the
    * executors that computed them — once a chunk materializes, losing
    * one of those executors mid-consumption fails the read (there is no
    * lineage left to recompute from). That is the price of the bounded
    * plan; a long-lived consumer that must survive executor churn should
    * either re-issue `readChanges` on failure (commits are immutable, so
    * the re-read is deterministic) or persist the result to reliable
    * storage before consuming it.
    */
  def readChanges(spark: SparkSession, dir: String, fromVersion: Long,
      toVersion: Long, keys: Seq[String],
      checkpointEvery: Int = 16): DataFrame = {
    require(fromVersion < toVersion,
      s"fromVersion $fromVersion must precede toVersion $toVersion")
    require(checkpointEvery >= 1, "checkpointEvery must be positive")
    require(keys.nonEmpty, "keys required (see scaladoc for the key-free feed)")
    val snaps = VersionedTable.snapshots(spark, dir)
    val byVersion = snaps.map(s => s.version -> s).toMap
    def snap(v: Long) = byVersion.getOrElse(v,
      sys.error(s"table $dir has no version $v"))
    val perCommit = (fromVersion + 1 to toVersion).map { v =>
      commitChanges(spark, dir, snap(v - 1), snap(v), keys)
        .withColumn("_commit_version", lit(v))
    }
    val chunks = perCommit.grouped(checkpointEvery)
      .map(_.reduce(_.unionByName(_))).toSeq
    chunks match {
      case Seq(only) => only
      case many => many.map(_.localCheckpoint(eager = false))
        .reduce(_.unionByName(_))
    }
  }

  /** One commit's changes from its file delta: rows of added files vs
    * rows of removed files, full-outer on `keys`; equal-valued rows on
    * both sides are carries and emit nothing.
    *
    * Deletion-vector aware: each side reads under ITS OWN snapshot's
    * DVs (a removed file's previously soft-deleted rows must not
    * resurface as this commit's deletes; an added file reads its live
    * rows), and rows soft-deleted by THIS commit — recovered through a
    * positional semi-join of the commit's new DV rows against the
    * pre-image scan — join the REMOVED side of the pairing. Paired
    * with a same-key row in an added file they therefore classify as
    * `update_preimage`/`update_postimage` (the merge-on-read UPDATE
    * shape: DV'd old position + appended post-image); unpaired they
    * classify `delete` (the pure-DV DELETE shape). DV-new positions
    * are disjoint from earlier DVs by construction (DML evaluates over
    * live rows only), so the lane never double-reports.
    */
  private def commitChanges(spark: SparkSession, dir: String,
      prev: VersionedTable.Snapshot, cur: VersionedTable.Snapshot,
      keys: Seq[String]): DataFrame = {
    val schema = cur.schema.getOrElse(sys.error(
      s"table $dir v${cur.version} has no recorded schema — " +
        "change classification needs a stable column set"))
    keys.foreach(k => require(schema.fieldNames.contains(k),
      s"key $k not in table schema ${schema.fieldNames.mkString("[", ",", "]")}"))
    val added = cur.files.filterNot(prev.files.toSet)
    val removed = prev.files.filterNot(cur.files.toSet)
    // both sides read under cur's recorded column set (schema evolution
    // contract unchanged), each under its own snapshot's DVs
    val prevCtx = prev.copy(schemaJson = Some(schema.json))
    def readFiles(files: Seq[String],
        ctx: VersionedTable.Snapshot): DataFrame = files match {
      case Nil => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      case fs => VersionedTable.readFilesWithDv(spark, dir, ctx, fs)
    }
    val valueCols = schema.fieldNames.filterNot(keys.contains).toSeq
    def side(df: DataFrame, tag: String): DataFrame =
      df.select(keys.map(col) ++
        valueCols.map(c => col(c).as(s"__${tag}_$c")) :+
        lit(true).as(s"__${tag}_p"): _*)
    // rows this commit soft-deleted in carried files are pre-images on
    // the removed side: a same-key appended post-image pairs them into
    // an update; no pair means a pure positional delete
    val removedRows = dvDeletedRows(spark, dir, prev, cur, schema) match {
      case None => readFiles(removed, prevCtx)
      case Some(pre) => readFiles(removed, prevCtx).unionByName(pre)
    }
    val j = side(readFiles(added, cur), "a")
      .join(side(removedRows, "r"), keys, "full_outer")
    val aP = col("__a_p").isNotNull
    val rP = col("__r_p").isNotNull
    val unchanged = valueCols.map(c => col(s"__a_$c") <=> col(s"__r_$c"))
      .foldLeft(lit(true))(_ && _)
    def out(tag: String, change: String) = struct(
      lit(change).as("_change_type") +:
        valueCols.map(c => col(s"__${tag}_$c").as(c)): _*)
    val changes = filter(array(
      when(aP && !rP, out("a", "insert")),
      when(!aP && rP, out("r", "delete")),
      when(aP && rP && !unchanged, out("r", "update_preimage")),
      when(aP && rP && !unchanged, out("a", "update_postimage"))),
      _.isNotNull)
    j.select(keys.map(col) :+ explode(changes).as("__c"): _*)
      .select(keys.map(col) ++ valueCols.map(c => col(s"__c.$c")) :+
        col("__c._change_type").as("_change_type"): _*)
  }

  /** Pre-image rows soft-deleted between `prev` and `cur` in files
    * present in BOTH snapshots (files added or removed in the range are
    * fully accounted by their side reads). None when no new DV rows
    * touch a carried file. Shared by the CDC classifier above and
    * [[graft.operators.IncrementalView.changedFilesFeed]].
    */
  private[graft] def dvDeletedRows(spark: SparkSession, dir: String,
      prev: VersionedTable.Snapshot, cur: VersionedTable.Snapshot,
      schema: org.apache.spark.sql.types.StructType): Option[DataFrame] = {
    val carried = prev.files.toSet
    val affected = cur.files.filter(f => carried.contains(f) &&
      cur.dvn.getOrElse(f, 0L) != prev.dvn.getOrElse(f, 0L))
    val newDvFiles = cur.dvFiles.filterNot(prev.dvFiles.toSet)
    if (affected.isEmpty || newDvFiles.isEmpty) return None
    val prevCtx = prev.copy(schemaJson = Some(schema.json))
    val newDv = spark.read.schema(VersionedTable.DvSchema)
      .parquet(newDvFiles.map(f => VersionedTable.resolveRef(dir, f)): _*)
    Some(VersionedTable.scanWithPos(spark, dir, prevCtx, affected)
      .join(newDv, Seq("__vt_file", "__vt_pos"), "left_semi")
      .select(schema.fieldNames.map(col).toSeq: _*))
  }
}
