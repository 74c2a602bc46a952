package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface beyond the pipeline's own parquet IO
  * (SURVEY.md §2.1).
  *
  * - `readCsv`/`readJson`: explicit-schema scans, never inferred
  *   (reference: notebooks/bronze.py:75-80 — schema inference on a 100 TB
  *   drop is a full extra pass).
  * - `exportCsv`: the gold-view CSV export contract (reference:
  *   README.md:81-82,117-123 — one headered CSV per view under an
  *   `export_date=` prefix).
  * - `compact`: plain-Spark analog of OPTIMIZE file compaction
  *   (reference: docs/runbook.md:55-58) — rewrite small files to
  *   target-sized ones.
  * - `registerParquetTable`: path-based external-table registration
  *   (reference: sql/register_bronze.sql:2-4).
  */
object Sources {

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).schema(schema).csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Export each view as a single headered CSV part under
    * `outDir/export_date=<date>/<name>/`. `coalesce(1)` matches the
    * reference's one-file-per-view contract; it only gates the final
    * write (upstream stages keep full parallelism), and gold views are
    * aggregates — small by construction. Export a non-aggregated table
    * with `singleFile = false` to keep the write parallel.
    */
  def exportCsv(views: Map[String, DataFrame], outDir: String,
      exportDate: String, singleFile: Boolean = true): Unit =
    views.foreach { case (name, df) =>
      val out = if (singleFile) df.coalesce(1) else df
      out.write.option("header", "true").mode("overwrite")
        .csv(s"$outDir/export_date=$exportDate/$name")
    }

  /** Rewrite a parquet dir into ~`targetFileMB`-sized files, preserving
    * the partition layout. Writes to `dir.compacting`, then swaps via
    * rename-aside (dir -> dir.old, tmp -> dir, drop dir.old) so a crash
    * at any point leaves a recoverable copy — single-writer assumption,
    * like the rest of the pipeline.
    */
  def compact(spark: SparkSession, dir: String, partitionCols: Seq[String],
      targetFileMB: Int = 128): Unit = {
    val df = spark.read.parquet(dir)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles = math.max(1, (bytes / (targetFileMB.toLong << 20)).toInt)
    val tmp = dir + ".compacting"
    val writer =
      if (partitionCols.nonEmpty)
        // one shuffle, clustered by partition key so each output dir gets
        // contiguous writers rather than nFiles tiny files per partition
        df.repartition(nFiles, partitionCols.map(org.apache.spark.sql.functions.col): _*)
          .write.partitionBy(partitionCols: _*)
      else df.repartition(nFiles).write
    writer.mode("overwrite").parquet(tmp)

    // Resolve the FS of `dir` itself (FileSystem.get(conf) would resolve
    // the default FS, wrong for non-default schemes like s3a://).
    val target = new org.apache.hadoop.fs.Path(dir)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val aside = new org.apache.hadoop.fs.Path(dir + ".old")
    fs.delete(aside, true) // clear any leftover from a prior crashed swap
    require(fs.rename(target, aside), s"compact: failed to move $dir aside")
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), target),
      s"compact: failed to promote $tmp (original preserved at $aside)")
    fs.delete(aside, true)
  }

  /** Register a parquet directory as a queryable table name. */
  def registerParquetTable(spark: SparkSession, name: String, dir: String): Unit =
    spark.read.parquet(dir).createOrReplaceTempView(name)

  /** Real SQL-catalog DDL registration (reference:
    * sql/register_bronze.sql:2-4 and notebooks/bronze.py:132-146 —
    * `CREATE TABLE ... PARTITIONED BY ... LOCATION ...`): an EXTERNAL
    * partitioned parquet table in Spark's built-in catalog, so a user
    * typing `INSERT INTO` / `SELECT` DDL-SQL exercises the same catalog
    * path a warehouse deployment does. Partition columns must be part of
    * `schema`; dropping the table never deletes `location`'s data
    * (external semantics).
    */
  /** Backquote each dot-part of a table name (`` ` `` doubled inside) and
    * backslash-escape a SQL string literal — interpolating raw user
    * strings into DDL otherwise breaks on names needing quoting or paths
    * containing a quote.
    */
  private[sources] def quoteIdent(name: String): String =
    name.split('.').map(p => "`" + p.replace("`", "``") + "`").mkString(".")
  private[sources] def sqlString(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  def createPartitionedTable(spark: SparkSession, name: String,
      schema: StructType, partitionCols: Seq[String], location: String,
      replace: Boolean = false): Unit = {
    require(partitionCols.forall(schema.fieldNames.contains),
      s"partition columns ${partitionCols.mkString(", ")} must be in the schema")
    // v1 datasource tables have no CREATE OR REPLACE; drop-first gives
    // replace semantics (safe: external — data at `location` survives)
    if (replace) spark.sql(s"DROP TABLE IF EXISTS ${quoteIdent(name)}")
    val partDdl =
      if (partitionCols.isEmpty) ""
      else s" PARTITIONED BY (${partitionCols.map(c => s"`$c`").mkString(", ")})"
    spark.sql(s"CREATE TABLE IF NOT EXISTS ${quoteIdent(name)} (${schema.toDDL}) " +
      s"USING PARQUET$partDdl LOCATION ${sqlString(location)}")
  }

  /** Sync catalog partition metadata with directories that appeared on
    * disk outside INSERT INTO (an external writer, a re-registered
    * location) — the OPTIMIZE-era `MSCK REPAIR TABLE`.
    */
  def recoverPartitions(spark: SparkSession, name: String): Unit =
    spark.sql(s"MSCK REPAIR TABLE ${quoteIdent(name)}")

  /** Append a DataFrame into a catalog table by POSITION (INSERT INTO
    * semantics: the catalog schema, not the DataFrame's column names,
    * decides the mapping). Takes a RAW (unquoted) name like every other
    * helper here — quoting is applied internally, so one name string
    * flows through createPartitionedTable / insertAppend /
    * recoverPartitions unchanged.
    */
  def insertAppend(df: DataFrame, name: String): Unit =
    df.write.mode("append").insertInto(quoteIdent(name))

  /** Register an EXISTING partitioned parquet directory (e.g. a pipeline
    * bronze/silver output) as a catalog table and sync its partitions —
    * the catalog-backed twin of `registerParquetTable`, mirroring the
    * reference's external-location registration
    * (sql/register_bronze.sql:2-4). Schema is taken from the files
    * (partition columns come back last, exactly the DDL layout).
    */
  def registerExternalPartitioned(spark: SparkSession, name: String,
      dir: String, partitionCols: Seq[String]): Unit = {
    val schema = spark.read.parquet(dir).schema
    // replace: registration means "this name points at THIS directory" —
    // like createOrReplaceTempView, never a stale no-op on a prior table
    createPartitionedTable(spark, name, schema, partitionCols, dir, replace = true)
    recoverPartitions(spark, name)
  }

  /** Partition-level restatement: overwrite ONLY the partitions present
    * in `df`, leaving every other partition of the target directory
    * untouched — the plain-Spark analog of the reference's partition
    * backfill (reference: sql/breed_mapping.py:609-618, which restates
    * one ingest_date at a time). Static overwrite mode would truncate
    * the whole table first; `partitionOverwriteMode=dynamic` scopes the
    * delete to partitions the incoming data actually names, which is the
    * only sane restatement mode at 100 TB. The conf is set per-write via
    * the DataFrameWriter option, so session state is never mutated.
    */
  def overwritePartitions(df: DataFrame, dir: String,
      partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty,
      "overwritePartitions needs at least one partition column")
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(dir)
  }

  /** Z-order clustering write — the plain-parquet analog of Delta's
    * OPTIMIZE ZORDER BY (reference: docs/runbook.md:55-58's maintenance
    * step is Delta-bound; the LAYOUT idea is engine-neutral): co-locate
    * rows that are close in BOTH clustering dimensions into the same
    * files, so parquet min/max file statistics bound every dimension and
    * a 2-D box predicate prunes most files. A linear sort bounds only
    * its leading column — the trailing column spans its full range in
    * every file (SourcesSpec measures exactly this difference).
    *
    * Mechanics (the Delta OSS recipe, Spark-first):
    *   1. per-column range bucketing by approx-quantile boundaries
    *      (driver holds `buckets-1` doubles per column — bounded; skew
    *      cannot starve buckets the way min/max scaling would);
    *   2. Morton interleave of the two bucket ids (codegen'd kernel);
    *   3. contiguous z-runs routed into `targetFiles` files by an EXACT
    *      z-bucket histogram (see [[zArrange]]) with an in-partition
    *      z-sort for row-group-level stats.
    *
    * The z-value is a write-time ordering device only — it is dropped
    * from the written schema, and layout never affects query answers.
    */
  def zorderWrite(df: DataFrame, dir: String, zCols: (String, String),
      targetFiles: Int, buckets: Int = 256): Unit =
    zArrange(df, zCols, targetFiles, buckets)
      .write.mode("overwrite").parquet(dir)

  /** The z-order arrangement itself, shared by [[zorderWrite]] and
    * `VersionedTable.cluster`: rows of `df` re-laid-out so each output
    * file covers a compact 2-D box of the clustering pair.
    *
    * Routing is an EXACT histogram split, not `repartitionByRange`.
    * RangePartitioner's reservoir-sampling pass evaluates the FULL child
    * plan — every payload column is read from parquet just to sketch the
    * key, so a z-order of a wide 100 TB table would scan all 100 TB
    * twice. Instead:
    *   1. `groupBy(__z).count()` — column pruning reaches the scan (only
    *      the two clustering columns are read), map-side partial
    *      aggregation collapses the stream to ≤ `buckets²` fixed-width
    *      rows before the (tiny) shuffle, and the driver folds the
    *      sorted histogram into contiguous row-balanced bucket→slot cuts
    *      (EXACT boundaries, where sampled ones drift under skew);
    *   2. each slot is addressed by a probe integer chosen so Spark's
    *      hash partitioning (`pmod(murmur3(pid), targetFiles)`) maps the
    *      `targetFiles` pids onto the `targetFiles` partitions
    *      bijectively — hash `repartition` then delivers RANGE semantics
    *      (contiguous z-runs stay together) without any sampling pass,
    *      and the explicit partition count keeps AQE from coalescing the
    *      file count away;
    *   3. the ≤ `buckets²`-row bucket→pid map broadcast-joins back onto
    *      the stream — the one full-payload pass is the shuffle+write
    *      itself.
    * A single over-full z bucket cannot be split (equal keys), the same
    * property RangePartitioner has; its slot just runs long.
    *
    * Below `minExactBytes` of (optimizer-estimated) input the exact
    * histogram pass costs more than it saves — RangePartitioner's
    * double evaluation of a sub-GB child is noise — so small inputs
    * take the sampled `repartitionByRange` route instead. Both routes
    * are layout-only and oracle-gated (q81/q90 exercise the sampled
    * route at bench SF; ZOrderSpec forces the exact route with
    * `minExactBytes = 0`).
    *
    * The gate trusts `optimizedPlan.stats.sizeInBytes`, which is an
    * ESTIMATE with two failure modes — both safe, neither silent at the
    * wrong end of the scale:
    *   - OVER-estimate (the common direction: a selective filter or
    *     aggregate above a big scan, or a child with no stats at all —
    *     leaf nodes without statistics report the
    *     `spark.sql.defaultSizeInBytes` sentinel, Long.MaxValue by
    *     default): a genuinely small input takes the exact-histogram
    *     route and pays ~0.5 s of histogram overhead. Unknown stats
    *     therefore deliberately route EXACT — the conservative choice,
    *     since the exact route's worst case is bounded overhead while
    *     the sampled route's is a second full evaluation of an
    *     arbitrarily large child (ZOrderSpec pins this routing for an
    *     RDD-backed child, which always reports the sentinel).
    *   - UNDER-estimate (rare: a join/generate whose output dwarfs its
    *     inputs): a large input takes the sampled route and pays
    *     RangePartitioner's double evaluation — the pre-round-11
    *     behavior for every input, slow but correct.
    * Callers arranging a post-join/generate child at scale should pass
    * `minExactBytes = 0` to force the exact route rather than rely on
    * the estimate.
    */
  private[graft] val DefaultZExactMinBytes: Long = 1L << 30

  private[graft] def zArrange(df: DataFrame, zCols: (String, String),
      targetFiles: Int, buckets: Int,
      minExactBytes: Long = DefaultZExactMinBytes): DataFrame = {
    require(targetFiles > 0, "targetFiles must be positive")
    require(buckets > 1 && (buckets & (buckets - 1)) == 0,
      "buckets must be a power of two")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.GraftExpressions
    val spark = df.sparkSession
    val bits = java.lang.Integer.numberOfTrailingZeros(buckets)
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    // BOTH columns' boundaries from one scan (driver-bounded result:
    // 2 × (buckets-1) doubles)
    val Array(bx, by) =
      df.stat.approxQuantile(Array(zCols._1, zCols._2), probes, 0.001)
    // nulls in either clustering column bucket to z = -1: they sort
    // first, exactly as repartitionByRange placed them (layout-only)
    val zExpr = coalesce(GraftExpressions.interleaveBits(
      GraftExpressions.rangeBucket(col(zCols._1).cast("double"), bx).cast("long"),
      GraftExpressions.rangeBucket(col(zCols._2).cast("double"), by).cast("long"),
      bits), lit(-1L))
    val withZ = df.withColumn("__z", zExpr)
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estBytes < BigInt(minExactBytes)) {
      // small input: the sampling pass is cheap here and cannot lose
      // rows by construction
      return withZ.repartitionByRange(targetFiles, col("__z"))
        .sortWithinPartitions(col("__z"))
        .drop("__z")
    }
    val hist = withZ.groupBy(col("__z")).agg(count(lit(1)).as("__n"))
      .orderBy(col("__z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    if (hist.isEmpty) return df // nothing to arrange
    val total = hist.map(_._2).sum
    // contiguous prefix-sum cuts: a bucket whose rows START in slot s
    // belongs wholly to s — monotonic in z, so every slot is one z-run.
    // Double-based cut: the Long product `before * targetFiles` would
    // overflow past ~1e12 rows × ~1e7 files; the double quotient stays
    // monotone in `before` and within one slot of the exact integer
    // floor (a 53-bit mantissa can land an exact-boundary cut one slot
    // early/late — layout-only, since the bucket→slot mapping stays
    // monotonic), and is clamped either side.
    var before = 0L
    val bucketSlot = hist.map { case (z, n) =>
      val slot = math.max(0L, math.min(targetFiles - 1L,
        (before.toDouble / total * targetFiles).toLong)).toInt
      before += n
      (z, slot)
    }
    val slotPid = bijectivePids(targetFiles)
    val route = spark.createDataFrame(
      bucketSlot.toIndexedSeq.map { case (z, s) => (z, slotPid(s)) })
      .toDF("__z", "__pid")
    // LEFT join with a pmod fallback: the input is re-evaluated between
    // the histogram collect and this shuffle+write pass, so a
    // nondeterministic column (rand/uuid) or a source mutated between
    // passes could mint __z values absent from the route map. An inner
    // join would silently DROP those rows from a write path; the
    // fallback merely misplaces them (layout-only, same worst case as
    // repartitionByRange's sampled boundaries).
    withZ
      .join(broadcast(route), Seq("__z"), "left")
      .withColumn("__pid",
        coalesce(col("__pid"), pmod(col("__z"), lit(targetFiles)).cast("int")))
      .repartition(targetFiles, col("__pid"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "__pid")
  }

  /** Probe integers whose Spark hash-partition slot
    * (`pmod(murmur3_int(v, seed=42), n)`) covers 0..n-1 exactly once —
    * index s holds a pid landing in partition s. Mirrors
    * `HashPartitioning.partitionIdExpression` for a single non-null
    * IntegerType column; ZOrderSpec pins the mirror against
    * `spark_partition_id()` so a Spark-side seed change cannot silently
    * skew the routing.
    */
  private[graft] def bijectivePids(n: Int): Array[Int] = {
    val out = new Array[Int](n)
    val seen = new Array[Boolean](n)
    var found = 0
    var v = 0
    while (found < n) {
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(v, 42)
      val s = ((h % n) + n) % n
      if (!seen(s)) { seen(s) = true; out(s) = v; found += 1 }
      v += 1
    }
    out
  }

  /** Object-store-safe "table exists and has files" probe — the one
    * definition behind the pipeline's existence checks.
    */
  def dirNonEmpty(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }
}
