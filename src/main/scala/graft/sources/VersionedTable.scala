package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal versioned-table commit layer — the lakehouse ACID properties
  * the reference outsources to Delta (`MERGE INTO` staging in
  * sql/breed_mapping.py:596-618, `OPTIMIZE/VACUUM` in docs/runbook.md:
  * 55-58, atomic appends in notebooks/bronze.py:118), re-expressed with
  * nothing but parquet files and one filesystem invariant: rename is
  * atomic and fails when the destination exists.
  *
  * Layout:
  * {{{
  *   table/
  *     data/v3_ab12cd34/part-*.parquet   ← immutable; one subdir per commit
  *     _manifests/v00000003.manifest     ← file list + metadata, one per version
  * }}}
  *
  * CREATING THE NEXT MANIFEST IS THE COMMIT. A writer stages data files
  * in a fresh `data/v<N>_<rand>/` subdir (invisible: readers only look
  * at manifests), then EXCLUSIVE-CREATES `v<N>.manifest` and writes the
  * body through that handle. Exclusive create (O_EXCL via nio on
  * `file://`, the namenode's atomic create-no-overwrite on HDFS) either
  * claims version N or fails because a concurrent writer claimed it
  * first (optimistic concurrency: the loser's staged files become
  * debris, never visible, and the caller retries on the new snapshot).
  * Rename is deliberately NOT the commit primitive: POSIX rename
  * REPLACES an existing destination, so a rename-based commit would let
  * a racing writer silently overwrite the winner's manifest on local
  * filesystems. Because the body is written after the claim, a manifest
  * is only COMMITTED once its `end` terminator line is present — readers
  * treat a terminator-less manifest (a writer crashed mid-commit) as
  * absent, and the stranded claim is repaired by deleting that file.
  * There is no LATEST pointer to swap and therefore no pointer to
  * corrupt: `latest = max(version among complete manifests)`.
  *
  * This closes the reader-isolation gap of path-level tables: a reader
  * resolves a manifest ONCE into an explicit file list, so a concurrent
  * [[compact]] or [[overwrite]] (which writes NEW files and commits a
  * new manifest, touching no old file) can never show it mixed state —
  * it reads the complete old version or the complete new one. Old
  * versions stay readable ([[snapshotAt]], [[snapshotAsOf]]) until
  * [[vacuum]] reclaims their unreferenced files.
  *
  * Scale: a commit is one manifest write + one rename regardless of
  * table size; manifests list files (not rows), bounded by file count —
  * the same contract that lets Delta/Iceberg commit 100 TB tables in
  * milliseconds. Readers plan from the explicit list, so partition
  * pruning and pushdown work unchanged. Multi-writer safety is
  * conflict-DETECTION (first manifest wins), matching the reference
  * pipeline's effectively-serial orchestration; it is not a lock
  * manager.
  */
/** The commit lost the optimistic-concurrency race: another writer
  * claimed this version first. The ONLY commit failure that is safe to
  * rebase-and-retry — a plain I/O failure (disk full, HDFS hiccup)
  * deliberately does not get this type.
  */
final class ConcurrentCommitException(msg: String, cause: Throwable)
  extends java.io.IOException(msg, cause)

object VersionedTable {

  /** One committed version: `operation` ∈ create|append|overwrite|compact|
    * merge|cluster (streaming sinks use caller tags). `stats` carries
    * per-file data-skipping metadata ([[DataSkipping.FileStats]]) for
    * files staged by commits that requested it; files without stats are
    * simply never pruned.
    */
  final case class Snapshot(version: Long, timestampMs: Long,
      operation: String, files: Seq[String],
      stats: Map[String, DataSkipping.FileStats] = Map.empty,
      schemaJson: Option[String] = None) {
    /** The snapshot's recorded table schema (versions committed before
      * schema tracking have none and read footer-first as before).
      */
    def schema: Option[org.apache.spark.sql.types.StructType] =
      schemaJson.map(j => org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
  }

  private val ManifestDir = "_manifests"

  private def fsFor(spark: SparkSession, dir: String) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestName(v: Long) = f"v$v%08d.manifest"

  /** All committed snapshots, ascending by version. A manifest without
    * its `end` terminator (a writer crashed between claiming the version
    * and finishing the body) is in-flight/torn, not committed — skipped.
    */
  def snapshots(spark: SparkSession, dir: String): Seq[Snapshot] = {
    val (fs, _) = fsFor(spark, dir)
    val mdir = new Path(dir, ManifestDir)
    if (!fs.exists(mdir)) return Seq.empty
    fs.listStatus(mdir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".manifest")
        && !s.getPath.getName.startsWith("."))
      .flatMap { s =>
        val in = fs.open(s.getPath)
        val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        parseManifest(body)
      }
      .sortBy(_.version)
  }

  /** None for a torn (terminator-less or truncated) manifest. */
  private def parseManifest(body: String): Option[Snapshot] = {
    val lines = body.linesIterator.toSeq
    val files = lines.filter(_.startsWith("file=")).map(_.drop(5))
    def field(k: String) = lines.collectFirst {
      case l if l.startsWith(s"$k=") => l.drop(k.length + 1)
    }
    for {
      end <- field("end") if end.toLong == files.size // complete body
      v <- field("version")
      ts <- field("timestamp")
      op <- field("operation")
    } yield Snapshot(v.toLong, ts.toLong, op, files,
      DataSkipping.parseLines(lines),
      field("schema").map(s => new String(
        java.util.Base64.getDecoder.decode(s), "UTF-8")))
  }

  private def renderManifest(s: Snapshot): String =
    (Seq(s"version=${s.version}", s"timestamp=${s.timestampMs}",
      s"operation=${s.operation}")
      ++ s.schemaJson.map(j => s"schema=${java.util.Base64.getEncoder
        .encodeToString(j.getBytes("UTF-8"))}").toSeq
      ++ s.files.map(f => s"file=$f")
      ++ s.stats.toSeq.sortBy(_._1).flatMap { case (f, fs) =>
        DataSkipping.renderLines(f, fs) }
      :+ s"end=${s.files.size}")
      .mkString("", "\n", "\n")

  /** The latest snapshot, or None for a table with no commits. */
  def latest(spark: SparkSession, dir: String): Option[Snapshot] =
    snapshots(spark, dir).lastOption

  /** Stage `df`'s rows as immutable data files for version `v` and
    * return their table-relative paths. The subdir is random-suffixed so
    * a crashed or conflict-losing attempt leaves only invisible debris.
    */
  private def stageFiles(df: DataFrame, dir: String, v: Long): Seq[String] = {
    val sub = s"data/v${v}_${java.util.UUID.randomUUID.toString.take(8)}"
    df.write.mode("overwrite").parquet(s"$dir/$sub")
    val (fs, _) = fsFor(df.sparkSession, dir)
    fs.listStatus(new Path(s"$dir/$sub")).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s"$sub/${s.getPath.getName}")
  }

  /** [[stageFiles]] plus data-skipping stats over exactly the staged
    * files (empty `statsCols` = no stats job at all).
    */
  private def stageWithStats(df: DataFrame, dir: String, v: Long,
      statsCols: Seq[String]):
      (Seq[String], Map[String, DataSkipping.FileStats]) = {
    val files = stageFiles(df, dir, v)
    (files, DataSkipping.collectStats(df.sparkSession, dir, files, statsCols))
  }

  /** Atomically claim-and-commit `files` as manifest version `v`:
    * exclusive-create the manifest (the claim — exactly one writer can
    * win it), then write the body and the `end` terminator through the
    * claimed handle (the commit — readers ignore terminator-less
    * manifests). Throws on a concurrent-writer conflict. Rename is
    * deliberately not used: POSIX rename replaces an existing
    * destination, which would let a racing writer overwrite the winner.
    * Package-visible so the spec can drive the race window directly.
    */
  private[graft] def commit(spark: SparkSession, dir: String, v: Long,
      operation: String, files: Seq[String],
      stats: Map[String, DataSkipping.FileStats] = Map.empty,
      schemaJson: Option[String] = None): Snapshot = {
    val (fs, _) = fsFor(spark, dir)
    val snap = Snapshot(v, System.currentTimeMillis(), operation, files,
      stats, schemaJson)
    val mdir = new Path(dir, ManifestDir)
    fs.mkdirs(mdir)
    val dest = new Path(mdir, manifestName(v))
    val bytes = renderManifest(snap).getBytes("UTF-8")
    try {
      if (dest.toUri.getScheme == null || dest.toUri.getScheme == "file") {
        // local FS: true O_EXCL atomicity via nio (Hadoop's local
        // create(overwrite=false) is a non-atomic check-then-create)
        val p = java.nio.file.Paths.get(
          new Path(fs.makeQualified(dest).toUri.getPath).toString)
        java.nio.file.Files.write(p, bytes,
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
      } else {
        // HDFS-like: create-no-overwrite is atomic at the namenode
        val out = fs.create(dest, false)
        try out.write(bytes) finally out.close()
      }
    } catch {
      case e @ (_: java.nio.file.FileAlreadyExistsException |
                _: org.apache.hadoop.fs.FileAlreadyExistsException) =>
        throw new ConcurrentCommitException(
          s"VersionedTable: version $v of $dir was committed by a " +
            "concurrent writer; re-read the latest snapshot and retry", e)
    }
    snap
  }

  /** Create the table (version 1). Fails if commits already exist.
    * `statsCols` names columns to collect data-skipping stats for
    * (see [[DataSkipping]]); stats ride the manifest and power
    * [[readWhere]]'s file pruning.
    */
  def create(df: DataFrame, dir: String,
      statsCols: Seq[String] = Seq.empty): Snapshot = {
    require(latest(df.sparkSession, dir).isEmpty,
      s"table $dir already has commits — use append/overwrite")
    val (files, st) = stageWithStats(df, dir, 1L, statsCols)
    commit(df.sparkSession, dir, 1L, "create", files, st,
      Some(df.schema.json))
  }

  /** Union of two schemas for an evolving append: same-name fields
    * must agree on type (nullability relaxes to nullable — old files
    * simply lack new columns), new fields join at the end. Fails fast
    * on a type conflict, naming the column — the alternative is
    * footer-dependent silent column loss.
    */
  private def mergeSchemas(prev: org.apache.spark.sql.types.StructType,
      next: org.apache.spark.sql.types.StructType):
      org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types.StructField
    // case-INSENSITIVE matching, like Spark's default resolution — a
    // case-variant of an existing column is the same column (keeping
    // the table's spelling), never a duplicate field that would brick
    // every subsequent schema-read
    val byName = next.fields.map(f => f.name.toLowerCase -> f).toMap
    prev.fields.foreach { pf =>
      byName.get(pf.name.toLowerCase).foreach { nf =>
        require(nf.dataType == pf.dataType,
          s"schema evolution cannot change column ${pf.name} from " +
            s"${pf.dataType.simpleString} to ${nf.dataType.simpleString}; " +
            "use overwrite for type changes")
      }
    }
    val prevNames = prev.fieldNames.map(_.toLowerCase).toSet
    org.apache.spark.sql.types.StructType(
      prev.fields.map(f => StructField(f.name, f.dataType, nullable = true))
        ++ next.fields.collect {
          case f if !prevNames.contains(f.name.toLowerCase) =>
            StructField(f.name, f.dataType, nullable = true) })
  }

  /** Append `df` as a new version: previous files carry over (with
    * their stats), new files join them. Old versions remain readable.
    * With the default `mergeSchema = false` the incoming schema must
    * match the table's recorded schema exactly (by field name + type);
    * with `mergeSchema = true` new columns evolve the table schema and
    * pre-existing files read as null for them ([[mergeSchemas]]).
    */
  def append(df: DataFrame, dir: String,
      statsCols: Seq[String] = Seq.empty,
      mergeSchema: Boolean = false): Snapshot =
    appendRebase(df, dir, statsCols, mergeSchema, maxAttempts = 1)

  /** [[append]] with automatic conflict REBASE — the optimistic-
    * concurrency completion: appends commute, so when another writer
    * claims the version first, the loser's already-staged files are
    * simply re-committed against the NEW latest (re-running the schema
    * check and stats merge against it) instead of failing the caller.
    * Data is staged exactly once; each retry costs one manifest read +
    * one commit attempt. Non-append conflicts rebase too — "my rows
    * joined the table after your operation" is exactly append
    * semantics. Gives up after `maxAttempts` claims, rethrowing the
    * conflict.
    */
  def appendWithRetry(df: DataFrame, dir: String,
      statsCols: Seq[String] = Seq.empty,
      mergeSchema: Boolean = false,
      maxAttempts: Int = 5): Snapshot =
    appendRebase(df, dir, statsCols, mergeSchema, maxAttempts)

  /** Core append loop; `onStaged` is a test seam that runs after the
    * data files are staged and before the first commit attempt — the
    * race window a concurrent writer exploits.
    */
  private[graft] def appendRebase(df: DataFrame, dir: String,
      statsCols: Seq[String], mergeSchema: Boolean, maxAttempts: Int,
      onStaged: () => Unit = () => ()): Snapshot = {
    require(maxAttempts >= 1, "maxAttempts must be at least 1")
    val spark = df.sparkSession
    var prev = latest(spark, dir).getOrElse(
      sys.error(s"table $dir has no commits — use create"))
    val (files, st) = stageWithStats(df, dir, prev.version + 1, statsCols)
    onStaged()
    var attempt = 1
    while (true) {
      val evolved = prev.schema match {
        case None => Some(df.schema.json) // legacy table: start recording
        case Some(ps) if mergeSchema => Some(mergeSchemas(ps, df.schema).json)
        case Some(ps) =>
          val same = ps.fields.map(f => (f.name, f.dataType)).toSeq ==
            df.schema.fields.map(f => (f.name, f.dataType)).toSeq
          require(same,
            s"append schema ${df.schema.simpleString} does not match table " +
              s"schema ${ps.simpleString}; pass mergeSchema = true to evolve")
          Some(ps.json)
      }
      try return commit(spark, dir, prev.version + 1, "append",
        prev.files ++ files, prev.stats ++ st, evolved)
      catch {
        // ONLY the version-claim race is rebaseable; a genuine I/O
        // failure mid-commit must surface as itself, not be retried
        // into a misleading "concurrent writer" report
        case e: ConcurrentCommitException =>
          if (attempt >= maxAttempts) throw e
          attempt += 1
          prev = latest(spark, dir).getOrElse(
            sys.error(s"table $dir lost all commits mid-append"))
      }
    }
    sys.error("unreachable")
  }

  /** [[append]] with a caller-supplied operation tag, creating the table
    * on first use. The tag is the streaming exactly-once device: a
    * foreachBatch sink commits each micro-batch as `append#<batchId>`
    * and a replay that finds its tag already committed skips — and
    * because the manifest rename is the commit, the append is ATOMIC
    * (no partial batch can ever be visible), which the
    * partition-directory ledger can only approximate.
    */
  def appendTagged(df: DataFrame, dir: String, tag: String,
      statsCols: Seq[String] = Seq.empty): Snapshot =
    appendTagged(df, dir, tag, latest(df.sparkSession, dir), statsCols)

  /** [[appendTagged]] against an already-resolved latest snapshot, so a
    * caller that has just listed the manifests (the streaming sink does,
    * for its replay check) does not list them a second time.
    */
  private[graft] def appendTagged(df: DataFrame, dir: String, tag: String,
      prevOpt: Option[Snapshot],
      statsCols: Seq[String]): Snapshot = {
    // same fail-fast contract as append(): a drifted batch must not
    // silently lose (or null-fill) columns under the recorded schema —
    // streaming evolution is an explicit upstream decision, not a
    // side effect
    prevOpt.flatMap(_.schema).foreach { ps =>
      val same = ps.fields.map(f => (f.name.toLowerCase, f.dataType)).toSeq ==
        df.schema.fields.map(f => (f.name.toLowerCase, f.dataType)).toSeq
      require(same,
        s"streamed batch schema ${df.schema.simpleString} does not match " +
          s"table schema ${ps.simpleString}")
    }
    val v = prevOpt.map(_.version + 1).getOrElse(1L)
    val prevStats = prevOpt.map(_.stats).getOrElse(Map.empty)
    val (files, st) = stageWithStats(df, dir, v, statsCols)
    commit(df.sparkSession, dir, v, tag,
      prevOpt.map(_.files).getOrElse(Seq.empty) ++ files,
      prevStats ++ st,
      prevOpt.flatMap(_.schemaJson).orElse(Some(df.schema.json)))
  }

  /** True iff some committed version carries `tag` as its operation. */
  def hasOperation(spark: SparkSession, dir: String, tag: String): Boolean =
    snapshots(spark, dir).exists(_.operation == tag)

  /** Replace the table's contents as a new version. Old versions remain
    * readable until [[vacuum]].
    */
  def overwrite(df: DataFrame, dir: String,
      statsCols: Seq[String] = Seq.empty): Snapshot = {
    val prev = latest(df.sparkSession, dir).getOrElse(
      sys.error(s"table $dir has no commits — use create"))
    val v = prev.version + 1
    val (files, st) = stageWithStats(df, dir, v, statsCols)
    commit(df.sparkSession, dir, v, "overwrite", files, st,
      Some(df.schema.json))
  }

  /** MERGE (upsert) into the table as a new version: matched keys take
    * the update row's values (even NULLs — SQL MERGE semantics via
    * [[graft.operators.Merge.upsert]]), unmatched rows carry over,
    * unmatched updates insert. The merged state commits like
    * [[overwrite]] — one atomic manifest rename — so readers see the
    * pre-merge or post-merge table, never a mix, and the pre-merge
    * version stays time-travelable. This is the Delta `MERGE INTO` +
    * snapshot-isolation pair the reference leans on
    * (sql/breed_mapping.py:596-618), without Delta jars.
    *
    * Scale: the upsert is one full-outer shuffle of table × updates; at
    * 100 TB pair it with a partition-scoped read-modify-write (merge
    * only the touched partitions' rows, then commit) — the commit cost
    * itself stays one manifest either way.
    */
  def merge(updates: DataFrame, dir: String, keys: Seq[String],
      statsCols: Seq[String] = Seq.empty): Snapshot = {
    val spark = updates.sparkSession
    import org.apache.spark.sql.functions._
    val prev = latest(spark, dir).getOrElse(
      sys.error(s"table $dir has no commits — use create"))
    // SQL MERGE rule ("cannot update the same row twice"): duplicate
    // update keys would silently fan target rows out through upsert's
    // full-outer join and COMMIT the corruption — fail before staging.
    // merge already runs eager jobs (staging writes), so the bounded
    // dup probe adds no laziness cost here, unlike inside upsert itself.
    val dup = updates.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"merge requires one update row per key (SQL MERGE rule); " +
        s"duplicate key example: ${dup.headOption.getOrElse("")}")
    val merged = graft.operators.Merge.upsert(
      readSnapshot(spark, dir, prev), updates, keys)
    val v = prev.version + 1
    val (files, st) = stageWithStats(merged, dir, v, statsCols)
    commit(spark, dir, v, "merge", files, st, Some(merged.schema.json))
  }

  /** Copy-on-write core for DELETE/UPDATE: data skipping decides which
    * files MAY hold predicate-true rows — only those are rewritten by
    * `rewrite`; every other file (and its stats) carries into the new
    * version BY REFERENCE, unread and unwritten. At 100 TB this is the
    * difference between a DML statement that rewrites a few files and
    * one that rewrites the table; the skipping analyzer's soundness
    * contract (never prune a file that may match) is exactly the
    * carry-over-safety contract needed here. Rewritten files get fresh
    * stats on the union of previously tracked columns.
    */
  private def copyOnWrite(spark: SparkSession, dir: String,
      predicate: org.apache.spark.sql.Column, op: String,
      rewrite: (DataFrame, org.apache.spark.sql.Column) => DataFrame):
      Snapshot = {
    val prev = latest(spark, dir).getOrElse(
      sys.error(s"table $dir has no commits"))
    val (touched, untouched) = DataSkipping.prune(spark, dir, prev, predicate)
    val v = prev.version + 1
    if (touched.isEmpty)
      return commit(spark, dir, v, op, prev.files, prev.stats, prev.schemaJson)
    val touchedDf = prev.schema match {
      case Some(st) =>
        spark.read.schema(st).parquet(touched.map(f => s"$dir/$f"): _*)
      case None => spark.read.parquet(touched.map(f => s"$dir/$f"): _*)
    }
    val statsCols =
      prev.stats.values.flatMap(_.cols.keys).toSet.toSeq.sorted
    val (files, st) =
      stageWithStats(rewrite(touchedDf, predicate), dir, v, statsCols)
    commit(spark, dir, v, op, untouched ++ files,
      prev.stats.view.filterKeys(untouched.toSet).toMap ++ st,
      prev.schemaJson.orElse(Some(touchedDf.schema.json)))
  }

  /** SQL DELETE: remove rows where `predicate` is TRUE (FALSE and NULL
    * rows survive — three-valued SQL semantics), committed as one
    * atomic new version. Only may-match files are rewritten
    * ([[copyOnWrite]]); deleting every row leaves a readable empty
    * version. The pre-delete version stays time-travelable.
    */
  def delete(spark: SparkSession, dir: String,
      predicate: org.apache.spark.sql.Column): Snapshot = {
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    copyOnWrite(spark, dir, predicate, "delete",
      (df, p) => df.filter(coalesce(not(p), lit(true))))
  }

  /** SQL UPDATE ... SET: rows where `predicate` is TRUE take the `set`
    * expressions (all of them evaluated against the OLD row — one
    * select, not chained withColumns), everything else is untouched.
    * Set values cast to the column's existing type so the table schema
    * is stable. Copy-on-write: only may-match files rewrite.
    */
  def update(spark: SparkSession, dir: String,
      predicate: org.apache.spark.sql.Column,
      set: Map[String, org.apache.spark.sql.Column]): Snapshot = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, when}
    copyOnWrite(spark, dir, predicate, "update", (df, p) => {
      set.keys.foreach(c => require(
        df.columns.exists(_.equalsIgnoreCase(c)),
        s"update sets unknown column $c; table has " +
          df.columns.mkString("[", ",", "]")))
      val pTrue = coalesce(p, lit(false))
      df.select(df.schema.fields.map { f =>
        set.find(_._1.equalsIgnoreCase(f.name)) match {
          case Some((_, e)) =>
            when(pTrue, e.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
          case None => col(f.name)
        }
      }.toSeq: _*)
    })
  }

  /** Rewrite the current contents into `targetFiles` files as a new
    * version — answer-preserving OPTIMIZE. Readers of any version,
    * including one resolving mid-compact, are untouched: no pre-existing
    * file is modified or removed.
    */
  def compactTable(spark: SparkSession, dir: String,
      targetFiles: Int, statsCols: Seq[String] = Seq.empty): Snapshot = {
    require(targetFiles > 0, "targetFiles must be positive")
    val prev = latest(spark, dir).getOrElse(
      sys.error(s"table $dir has no commits"))
    val v = prev.version + 1
    val current = readSnapshot(spark, dir, prev)
    val (files, st) = stageWithStats(
      current.repartition(targetFiles), dir, v, statsCols)
    commit(spark, dir, v, "compact", files, st, Some(current.schema.json))
  }

  /** Answer-preserving z-order rewrite committed as a new version — the
    * OPTIMIZE ZORDER BY + stats-collection pair in one commit. Same
    * clustering recipe as [[Sources.zorderWrite]] (quantile range
    * buckets → Morton interleave → `repartitionByRange` on the z-value
    * with an in-partition z-sort), but the rewritten files land through
    * the manifest commit path with skipping stats, so a subsequent
    * [[readWhere]] box predicate on the two clustered dimensions prunes
    * most files BEFORE the scan starts — the mechanism that turns a
    * 100 TB needle query into a handful of tasks. Both z-columns must
    * be double-castable (numeric); `statsCols` defaults to exactly the
    * clustering pair.
    */
  def cluster(spark: SparkSession, dir: String, zCols: (String, String),
      targetFiles: Int, statsCols: Seq[String] = Seq.empty,
      buckets: Int = 256): Snapshot = {
    val prev = latest(spark, dir).getOrElse(
      sys.error(s"table $dir has no commits"))
    val v = prev.version + 1
    val current = readSnapshot(spark, dir, prev)
    val arranged = Sources.zArrange(current, zCols, targetFiles, buckets)
    // always keep previously tracked columns prunable: an OPTIMIZE must
    // never silently turn off skipping on a column it used to serve
    val effStats =
      ((if (statsCols.nonEmpty) statsCols else Seq(zCols._1, zCols._2))
        ++ prev.stats.values.flatMap(_.cols.keys)).distinct
    val (files, st) = stageWithStats(arranged, dir, v, effStats)
    commit(spark, dir, v, "cluster", files, st, Some(arranged.schema.json))
  }

  private def readSnapshot(spark: SparkSession, dir: String,
      s: Snapshot): DataFrame = {
    if (s.files.isEmpty) s.schema match {
      // a version CAN be legitimately empty (e.g. delete of every row);
      // with a recorded schema that's an empty frame, not an error
      case Some(st) => return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)
      case None => sys.error(s"version ${s.version} of $dir is empty")
    }
    // the recorded schema makes reads footer-order-independent: files
    // predating an evolved column read as null for it, instead of the
    // whole table silently losing the column when an old footer wins
    s.schema match {
      case Some(st) =>
        spark.read.schema(st).parquet(s.files.map(f => s"$dir/$f"): _*)
      case None => spark.read.parquet(s.files.map(f => s"$dir/$f"): _*)
    }
  }

  /** The latest version's contents. */
  def read(spark: SparkSession, dir: String): DataFrame =
    readSnapshot(spark, dir, latest(spark, dir).getOrElse(
      sys.error(s"table $dir has no commits")))

  /** The latest version's rows satisfying `predicate`, with data
    * skipping: files whose manifest stats prove no row can match are
    * never opened ([[DataSkipping]]), and the predicate still applies
    * row-level to the survivors — identical answers to
    * `read(...).filter(predicate)`, strictly fewer bytes scanned.
    */
  def readWhere(spark: SparkSession, dir: String,
      predicate: org.apache.spark.sql.Column): DataFrame = {
    val snap = latest(spark, dir).getOrElse(
      sys.error(s"table $dir has no commits"))
    DataSkipping.readPruned(spark, dir, snap, predicate)
  }

  /** Metadata-only (lower, upper) bounds on `COUNT(*) WHERE predicate`
    * against the latest version; answers the count exactly — no scan —
    * when they meet. None without complete per-file row counts.
    * See [[DataSkipping.countBounds]].
    */
  def countBounds(spark: SparkSession, dir: String,
      predicate: org.apache.spark.sql.Column): Option[(Long, Long)] = {
    val snap = latest(spark, dir).getOrElse(
      sys.error(s"table $dir has no commits"))
    DataSkipping.countBounds(spark, dir, snap, predicate)
  }

  /** (files kept, files pruned) for `predicate` against the latest
    * version — the observability hook for specs and scan planning.
    */
  def pruneInfo(spark: SparkSession, dir: String,
      predicate: org.apache.spark.sql.Column): (Int, Int) = {
    val snap = latest(spark, dir).getOrElse(
      sys.error(s"table $dir has no commits"))
    val (kept, pruned) = DataSkipping.prune(spark, dir, snap, predicate)
    (kept.size, pruned.size)
  }

  /** Time travel by version number. */
  def snapshotAt(spark: SparkSession, dir: String, version: Long): DataFrame = {
    val s = snapshots(spark, dir).find(_.version == version).getOrElse(
      sys.error(s"table $dir has no version $version"))
    readSnapshot(spark, dir, s)
  }

  /** Time travel by wall clock: the newest version committed at or
    * before `tsMs`.
    */
  def snapshotAsOf(spark: SparkSession, dir: String, tsMs: Long): DataFrame = {
    val eligible = snapshots(spark, dir).filter(_.timestampMs <= tsMs)
    require(eligible.nonEmpty,
      s"table $dir has no version committed at or before $tsMs")
    readSnapshot(spark, dir, eligible.last)
  }

  /** Backfill data-skipping stats for the CURRENT version without
    * touching a single data file: one stats aggregation over the files
    * that don't already carry stats for exactly `statsCols`, committed
    * as a new version referencing the same files. This is how a legacy
    * or streamed-in table gains [[readWhere]] pruning retroactively —
    * metadata-only, so at 100 TB it costs one scan, not one rewrite.
    */
  def analyze(spark: SparkSession, dir: String,
      statsCols: Seq[String]): Snapshot = {
    require(statsCols.nonEmpty, "analyze needs at least one stats column")
    val prev = latest(spark, dir).getOrElse(
      sys.error(s"table $dir has no commits"))
    val wanted = statsCols.toSet
    val missing = prev.files.filterNot(f =>
      prev.stats.get(f).exists(fs => wanted.subsetOf(fs.cols.keySet)))
    val fresh = DataSkipping.collectStats(spark, dir, missing, statsCols,
      prev.schema) // recorded schema: evolved columns stay visible
    // merge per file: keep any previously tracked columns, add the new
    val mergedStats = prev.stats ++ fresh.map { case (f, fs) =>
      f -> prev.stats.get(f).map(old =>
        DataSkipping.FileStats(fs.rowCount, old.cols ++ fs.cols))
        .getOrElse(fs)
    }
    commit(spark, dir, prev.version + 1, "analyze", prev.files,
      mergedStats, prev.schemaJson)
  }

  /** The table's commit history, newest first — DESCRIBE HISTORY as a
    * DataFrame: version, commit timestamp, operation, file count, and
    * which columns carry skipping stats.
    */
  def history(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    snapshots(spark, dir).reverse.map { s =>
      (s.version, new java.sql.Timestamp(s.timestampMs), s.operation,
        s.files.size,
        s.stats.values.flatMap(_.cols.keys).toSet.toSeq.sorted.mkString(","))
    }.toDF("version", "committed_at", "operation", "n_files", "stats_cols")
  }

  /** Drop data files referenced by NO retained version (the newest
    * `retainVersions` manifests survive; older manifests are removed).
    * The youngest retained boundary keeps time travel working for the
    * retained window while reclaiming everything older — Delta VACUUM's
    * contract. Returns the number of deleted data files.
    */
  def vacuum(spark: SparkSession, dir: String,
      retainVersions: Int = 2): Int = {
    require(retainVersions >= 1, "must retain at least the latest version")
    val (fs, _) = fsFor(spark, dir)
    val all = snapshots(spark, dir)
    if (all.isEmpty) return 0
    val (drop, keep) = all.splitAt(math.max(0, all.size - retainVersions))
    val live = keep.flatMap(_.files).toSet
    var deleted = 0
    drop.foreach { s =>
      s.files.filterNot(live).foreach { f =>
        if (fs.delete(new Path(s"$dir/$f"), false)) deleted += 1
      }
      fs.delete(new Path(new Path(dir, ManifestDir), manifestName(s.version)), false)
    }
    deleted
  }

  /** Delete ORPHANED data files: files under `data/` that no committed
    * manifest references and never will — the debris of crashed writers
    * and conflict losers (their staged subdirs are invisible to readers
    * but [[vacuum]] never touches them, because vacuum only walks
    * manifest file lists). `graceMs` protects in-flight commits: a
    * writer stages files BEFORE claiming a manifest, so only files
    * older than the grace window are eligible — the same
    * modification-time retention contract as Delta VACUUM. Returns the
    * number of deleted files.
    */
  def vacuumOrphans(spark: SparkSession, dir: String,
      graceMs: Long = 24L * 3600 * 1000): Int = {
    require(graceMs >= 0, "graceMs must be non-negative")
    val (fs, _) = fsFor(spark, dir)
    val dataDir = new Path(dir, "data")
    if (!fs.exists(dataDir)) return 0
    val referenced = snapshots(spark, dir).flatMap(_.files).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    var deleted = 0
    fs.listStatus(dataDir).filter(_.isDirectory).foreach { sub =>
      val statuses0 = fs.listStatus(sub.getPath)
      // only DATA files are orphan candidates (mirror stageFiles's
      // filter): writer markers like _SUCCESS in live subdirs are not
      // debris even though no manifest lists them
      var deletedHere = 0
      statuses0.filter(st =>
        st.isFile && st.getPath.getName.endsWith(".parquet") &&
          !st.getPath.getName.startsWith(".")).foreach { st =>
        val rel = s"data/${sub.getPath.getName}/${st.getPath.getName}"
        if (!referenced.contains(rel) && st.getModificationTime < cutoff) {
          if (fs.delete(st.getPath, false)) deletedHere += 1
        }
      }
      deleted += deletedHere
      // drop the subdir once no data file remains (all-debris staging
      // dirs, markers included) — but only when nothing under it, AT
      // ANY DEPTH, is newer than the grace window: a mid-write staging
      // dir holds no top-level parquet yet, only task files deep under
      // the committer's _temporary tree, and those mtimes are what a
      // still-running job keeps refreshing
      val statuses =
        if (deletedHere == 0) statuses0 else fs.listStatus(sub.getPath)
      val hasData = statuses.exists(st =>
        st.isFile && st.getPath.getName.endsWith(".parquet"))
      def nestedFresh: Boolean = {
        val it = fs.listFiles(sub.getPath, true)
        var fresh = false
        while (it.hasNext && !fresh)
          if (it.next().getModificationTime >= cutoff) fresh = true
        fresh
      }
      val allOld = sub.getModificationTime < cutoff &&
        statuses.forall(_.getModificationTime < cutoff) && !nestedFresh
      if (!hasData && allOld) fs.delete(sub.getPath, true)
    }
    deleted
  }

  /** Metadata-only ROLLBACK: commit version `version`'s exact file
    * list (with its stats and schema) as the NEW latest — no data file
    * is read, copied, or deleted, so restoring a 100 TB table costs a
    * handful of directory listings (one per staged subdir, not one RPC
    * per file) plus one manifest write. History is preserved: the bad
    * versions stay time-travelable until [[vacuum]], and the restore
    * itself is a version (operation `restore`). Fails if `version`
    * does not exist or its files have already been vacuumed away.
    *
    * Restoring a version that predates schema tracking records the
    * mergeSchema union of the restored files' footers, so the table
    * stays schema-tracked (footer-order-independent reads) instead of
    * regressing to untracked.
    *
    * Concurrency: like every maintenance operation here, restore is
    * conflict-DETECTED, not lock-coordinated — do not run it
    * concurrently with [[vacuum]]/[[vacuumOrphans]], whose live-file
    * computation cannot see a restore resurrecting vacuum-eligible
    * files mid-flight (the module contract: effectively-serial
    * orchestration, no lock manager).
    */
  def restore(spark: SparkSession, dir: String, version: Long): Snapshot = {
    val all = snapshots(spark, dir)
    val target = all.find(_.version == version).getOrElse(
      sys.error(s"table $dir has no version $version"))
    val (fs, _) = fsFor(spark, dir)
    target.files.groupBy(f => f.substring(0, f.lastIndexOf('/'))).foreach {
      case (sub, fsOfSub) =>
        val present =
          try fs.listStatus(new Path(s"$dir/$sub"))
            .filter(_.isFile).map(_.getPath.getName).toSet
          catch { case _: java.io.FileNotFoundException => Set.empty[String] }
        val missing = fsOfSub
          .map(f => f.substring(f.lastIndexOf('/') + 1))
          .filterNot(present)
        require(missing.isEmpty,
          s"cannot restore version $version: data file(s) " +
            s"${missing.take(3).mkString(", ")} under $sub were vacuumed")
    }
    val schema = target.schemaJson.orElse(Some(
      spark.read.option("mergeSchema", "true")
        .parquet(target.files.map(f => s"$dir/$f"): _*).schema.json))
    val latestV = all.last.version
    commit(spark, dir, latestV + 1, "restore",
      target.files, target.stats, schema)
  }
}
