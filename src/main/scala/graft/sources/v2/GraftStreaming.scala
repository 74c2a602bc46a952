package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.VersionedTable

/** Offset into a versioned table's commit log: the last version this
  * stream has fully emitted. Version 0 is the pre-table sentinel — the
  * next batch from it is the INITIAL SNAPSHOT. The table's UUID
  * identity rides along so a checkpoint can never replay against a
  * recreated table that happens to reuse the path (same contract as
  * the batch sinks' ledger cursor).
  */
private[v2] case class GraftOffset(version: Long, tableId: String)
    extends Offset {
  override def json(): String =
    s"""{"version":$version,"tableId":"$tableId"}"""
}

private[v2] object GraftOffset {
  private val Pat =
    """\{"version":(-?\d+),"tableId":"([^"]*)"\}""".r
  def parse(json: String): GraftOffset = json match {
    case Pat(v, tid) => GraftOffset(v.toLong, tid)
    case other => sys.error(s"malformed graft stream offset: $other")
  }
}

/** `spark.readStream.format("graft").load(dir)` — the versioned table
  * AS a Structured Streaming source, tailing its commit log the way
  * Delta's streaming source tails the delta log:
  *
  *  - The first batch is the table's current SNAPSHOT (files of the
  *    stream-start version, deletion vectors applied) unless
  *    `startingVersion` says otherwise: a version number tails commits
  *    AFTER it; `latest` skips history entirely.
  *  - Every later batch is the files APPENDED by a range of commits —
  *    planned straight from the immutable manifests, one input
  *    partition per added file, so a batch's cost is O(new data) and
  *    replay of a (start, end] range is deterministic by construction
  *    (Structured Streaming's offset-log contract).
  *  - Commits that REMOVE files or add deletion-vector rows are not
  *    expressible as appends: the stream fails loudly by default and
  *    emits only the commit's added files under
  *    `option("ignoreChanges", "true")` (Delta's semantics, duplicates
  *    possible from copy-on-write rewrites — documented there too).
  *  - `maxVersionsPerTrigger` bounds how many commits one micro-batch
  *    drains (admission control), so a stream catching up on a long
  *    backlog does it in bounded plans instead of one giant batch.
  *
  * Exactly-once end-to-end follows from Spark's own checkpoint WAL:
  * offsets are versions, ranges replay identically, and the sink
  * dedups on batch id. The CHANGE-classified feed (CDC rows) stays
  * with [[graft.streaming.Streams.changeFeedIngest]] — classification
  * is a join over both sides of a commit, not a file scan, so it runs
  * through foreachBatch where a DataFrame engine is available.
  */
private[v2] class GraftMicroBatchStream(dir: String, full: StructType,
    required: StructType, options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl {

  private def spark = SparkSession.active

  private val ignoreChanges =
    Option(options.get("ignoreChanges")).exists(_.toBoolean)
  private val maxVersionsPerTrigger: Option[Long] =
    Option(options.get("maxVersionsPerTrigger")).map { v =>
      val n = v.toLong
      require(n >= 1, s"maxVersionsPerTrigger must be positive; got $n")
      n
    }

  private def snaps(): Seq[VersionedTable.Snapshot] = {
    val all = VersionedTable.snapshots(spark, dir)
    require(all.nonEmpty, s"no graft versioned table at $dir")
    all
  }
  private def tableIdOf(all: Seq[VersionedTable.Snapshot]): String =
    all.last.tableId.getOrElse("legacy")

  override def initialOffset(): Offset = {
    val all = snaps()
    val tid = tableIdOf(all)
    Option(options.get("startingVersion")) match {
      case None => GraftOffset(0L, tid) // snapshot first, then tail
      case Some("latest") => GraftOffset(all.last.version, tid)
      case Some(v) =>
        val n = v.toLong
        require(n >= 0 && n <= all.last.version,
          s"startingVersion $n out of range 0..${all.last.version} of $dir")
        GraftOffset(n, tid)
    }
  }

  override def deserializeOffset(json: String): Offset = {
    val off = GraftOffset.parse(json)
    val tid = tableIdOf(snaps())
    require(off.tableId == tid,
      s"stream checkpoint belongs to table ${off.tableId} but $dir is " +
        s"now table $tid (dropped and recreated?); a version cursor " +
        "from a dead incarnation cannot be resumed — start a fresh " +
        "checkpoint")
    off
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** The true head of the log regardless of admission caps — what
    * Trigger.AvailableNow drains to before declaring the run complete.
    */
  override def reportLatestOffset(): Offset = {
    val all = snaps()
    GraftOffset(all.last.version, tableIdOf(all))
  }

  override def latestOffset(): Offset =
    sys.error("latestOffset(start, limit) should be called instead")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GraftOffset]
    val all = snaps()
    val latest = all.last.version
    val capped = maxVersionsPerTrigger match {
      // the snapshot batch is one offset step (0 -> v) but delivers
      // the whole current table; the cap applies to tailing ranges
      case Some(n) if s.version > 0L => math.min(latest, s.version + n)
      case _ => latest
    }
    GraftOffset(math.max(capped, s.version), s.tableId)
  }

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftOffset]
    val e = end.asInstanceOf[GraftOffset]
    if (s.version >= e.version) return Array.empty
    val all = snaps()
    val byVersion = all.map(x => x.version -> x).toMap
    def snapAt(v: Long) = byVersion.getOrElse(v,
      sys.error(s"table $dir has no version $v (manifests vacuumed?)"))
    if (s.version == 0L) {
      // initial snapshot: the table's state at the end version, DVs
      // applied — identical rows to a batch read of that version
      val snap = snapAt(e.version)
      GraftFiles.partitionsFor(spark, dir, snap, snap.files)
    } else {
      // tail: added files per commit in (s, e]; a commit that removed
      // files or grew a DV changed or deleted rows — not an append
      (s.version + 1 to e.version).flatMap { v =>
        val prev = snapAt(v - 1)
        val cur = snapAt(v)
        val prevSet = prev.files.toSet
        val added = cur.files.filterNot(prevSet)
        val removed = prev.files.filterNot(cur.files.toSet)
        val dvGrew = cur.files.exists(f => prevSet.contains(f) &&
          cur.dvn.getOrElse(f, 0L) != prev.dvn.getOrElse(f, 0L))
        if ((removed.nonEmpty || dvGrew) && !ignoreChanges)
          sys.error(s"commit $v of $dir (${cur.operation}) " +
            "removed or soft-deleted rows; a row-appending stream cannot " +
            "represent it. Use option(\"ignoreChanges\", \"true\") to " +
            "emit only appended files (rewritten rows may re-emit), or " +
            "consume the classified change feed via " +
            "Streams.changeFeedIngest")
        // added files read RAW (no DV): a DV recorded against a file in
        // a LATER commit is that later commit's change, not this one's
        GraftFiles.partitionsFor(spark, dir, cur, added, withDv = false)
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftFiles.readerFactory(spark, full, required, Nil)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
