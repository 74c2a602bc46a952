package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VersionedTable
import graft.sources.v2.GraftScan

/** The DSv2 read connector's contract: `spark.read.format("graft")`
  * and SQL text through [[graft.sources.v2.GraftCatalog]] must produce
  * byte-identical answers to the `VersionedTable.*` Scala API — with
  * data-skipping file pruning, bloom point-lookup pruning, deletion-
  * vector row filtering, column mapping, and time travel all working
  * THROUGH the connector.
  */
class DsV2Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft-dsv2").toString

  private def ids(df: DataFrame): Set[Long] =
    df.select("id").as[Long].collect().toSet

  private def dsv2(dir: String, opts: (String, String)*): DataFrame =
    opts.foldLeft(spark.read.format("graft"))((r, o) =>
      r.option(o._1, o._2)).load(dir)

  test("plain read equals VersionedTable.read; time travel by version and timestamp") {
    val dir = tmp()
    VersionedTable.create((1L to 100L).toDF("id"), dir)
    val t1 = VersionedTable.latest(spark, dir).get.timestampMs
    Thread.sleep(5)
    VersionedTable.append((101L to 200L).toDF("id"), dir)
    assert(ids(dsv2(dir)) === (1L to 200L).toSet)
    assert(ids(dsv2(dir, "versionAsOf" -> "1")) === (1L to 100L).toSet)
    assert(ids(dsv2(dir, "timestampAsOf" -> t1.toString)) ===
      (1L to 100L).toSet)
    // schema comes from the manifest, not footer merging
    assert(dsv2(dir).schema.fieldNames.toSeq === Seq("id"))
  }

  test("pushed filters prune files via manifest stats; answer matches the plain filter") {
    val dir = tmp()
    VersionedTable.create(
      (1L to 400L).map(i => (i, s"n$i")).toDF("id", "name")
        .repartitionByRange(8, col("id")),
      dir, statsCols = Seq("id"))
    GraftScan.lastPlanned = None
    val out = dsv2(dir).filter(col("id") === 123L)
    assert(out.select("name").as[String].collect().toSeq === Seq("n123"))
    assert(GraftScan.lastPlanned === Some((1, 8)),
      "point predicate must plan exactly the one file stats keep")
    // the physical plan advertises the prune and the pushed filter
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("files=1/8"), s"plan should show the prune:\n$plan")
    // a residual Filter node re-applies the predicate above the scan
    assert(plan.contains("Filter"), "predicate must remain post-scan")
    // range predicate keeps a contiguous span
    GraftScan.lastPlanned = None
    assert(dsv2(dir).filter(col("id") > 350L).count() === 50L)
    val (kept, total) = GraftScan.lastPlanned.get
    assert(total === 8 && kept <= 2, s"range scan kept $kept files")
  }

  test("bloom sidecars prune point lookups through the connector") {
    val dir = tmp()
    // ids NOT range-clustered: min/max alone cannot prune a needle
    VersionedTable.create(
      (1L to 4000L).map(i => (i * 2654435761L % 4096L, i)).toDF("k", "id")
        .repartition(8), dir)
    VersionedTable.analyzeBloom(spark, dir, Seq("k"))
    GraftScan.lastPlanned = None
    val expect = spark.read.format("graft").load(dir)
      .collect().count(_.getLong(0) == 7L)
    val got = dsv2(dir).filter(col("k") === 7L).count()
    assert(got === expect)
    val (kept, total) = GraftScan.lastPlanned.get
    assert(total === 8 && kept < 8, "bloom must exclude some files")
  }

  test("deletion vectors filter rows through the connector (per-file positions)") {
    val dir = tmp()
    VersionedTable.create(
      (1L to 400L).toDF("id").repartitionByRange(8, col("id")), dir,
      statsCols = Seq("id"))
    VersionedTable.deleteWithDv(spark, dir, col("id") % 7L === 0L,
      densityThreshold = 0.9)
    assert(ids(dsv2(dir)) === (1L to 400L).filterNot(_ % 7 == 0).toSet)
    // filters compose with DV filtering
    assert(dsv2(dir).filter(col("id") <= 50L).count() ===
      (1L to 50L).count(_ % 7 != 0).toLong)
    // count(*) — empty required schema still applies DVs
    assert(dsv2(dir).count() === (1L to 400L).count(_ % 7 != 0).toLong)
    // time travel back to v1 sees everything
    assert(ids(dsv2(dir, "versionAsOf" -> "1")) === (1L to 400L).toSet)
  }

  test("column mapping: renamed table reads by logical name through the connector") {
    val dir = tmp()
    VersionedTable.create(
      (1L to 200L).map(i => (i, i * 10L)).toDF("id", "v")
        .repartitionByRange(4, col("id")), dir, statsCols = Seq("id"))
    VersionedTable.renameColumn(spark, dir, "id", "doc_id")
    val df = dsv2(dir)
    assert(df.schema.fieldNames.toSeq === Seq("doc_id", "v"))
    assert(df.filter(col("doc_id") === 55L).select("v").as[Long].head() === 550L)
    GraftScan.lastPlanned = None
    assert(df.filter(col("doc_id") === 55L).count() === 1L)
    assert(GraftScan.lastPlanned === Some((1, 4)),
      "stats keyed by logical name must still prune")
  }

  test("SQL text through GraftCatalog: SELECT, VERSION AS OF, TIMESTAMP AS OF, DV tables") {
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.gvt_spec",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gvt_spec.warehouse", wh)
    VersionedTable.create(
      (1L to 300L).toDF("id").repartitionByRange(6, col("id")),
      s"$wh/orders", statsCols = Seq("id"))
    val t1 = VersionedTable.latest(spark, s"$wh/orders").get.timestampMs
    Thread.sleep(5)
    VersionedTable.deleteWithDv(spark, s"$wh/orders",
      col("id") % 10L === 0L, densityThreshold = 0.9)
    assert(spark.sql("SELECT count(*) AS c FROM gvt_spec.orders")
      .as[Long].head() === (1L to 300L).count(_ % 10 != 0).toLong)
    assert(spark.sql(
      "SELECT count(*) AS c FROM gvt_spec.orders VERSION AS OF 1")
      .as[Long].head() === 300L)
    assert(spark.sql("SELECT count(*) AS c FROM gvt_spec.orders " +
      s"TIMESTAMP AS OF '${new java.sql.Timestamp(t1)}'")
      .as[Long].head() === 300L)
    // predicate through SQL text prunes files (and excludes DV'd rows)
    GraftScan.lastPlanned = None
    assert(spark.sql(
      "SELECT id FROM gvt_spec.orders WHERE id = 123").as[Long]
      .collect().toSeq === Seq(123L))
    assert(GraftScan.lastPlanned === Some((1, 6)))
    assert(spark.sql(
      "SELECT id FROM gvt_spec.orders WHERE id = 120").count() === 0L,
      "soft-deleted row must not resurface through SQL")
    // catalog surface: exists/list/create/drop
    assert(spark.sql("SHOW TABLES IN gvt_spec").collect()
      .map(_.getString(1)).contains("orders"))
    spark.sql("CREATE TABLE gvt_spec.fresh (k BIGINT, s STRING) USING graft")
    assert(spark.sql("SELECT * FROM gvt_spec.fresh").count() === 0L)
    VersionedTable.append(Seq((1L, "a")).toDF("k", "s"), s"$wh/fresh")
    assert(spark.sql("SELECT s FROM gvt_spec.fresh WHERE k = 1")
      .as[String].head() === "a")
    spark.sql("DROP TABLE gvt_spec.fresh")
    assert(!spark.catalog.tableExists("gvt_spec.fresh"))
  }

  test("a fully-deleted version reads as empty with schema; joins/aggregates work over the connector") {
    val dir = tmp()
    VersionedTable.create((1L to 50L).toDF("id"), dir)
    VersionedTable.delete(spark, dir, lit(true))
    val df = dsv2(dir)
    assert(df.count() === 0L && df.schema.fieldNames.toSeq === Seq("id"))
    // and a join between two connector reads plans and answers
    val a = tmp(); val b = tmp()
    VersionedTable.create((1L to 100L).toDF("id"), a)
    VersionedTable.create((50L to 150L).toDF("id"), b)
    assert(dsv2(a).join(dsv2(b), "id").count() === 51L)
  }

  // ------------------------------------------------------------ writes

  test("INSERT INTO / INSERT OVERWRITE / CTAS through SQL text commit " +
      "through the table protocol and carry stats forward") {
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.gvw", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gvw.warehouse", wh)
    VersionedTable.create(
      (1L to 200L).toDF("id").repartitionByRange(4, col("id")),
      s"$wh/t", statsCols = Seq("id"))
    spark.sql("INSERT INTO gvw.t SELECT id FROM range(201, 301)")
    assert(spark.sql("SELECT count(*) AS c FROM gvw.t").as[Long].head()
      === 300L)
    val v2 = VersionedTable.latest(spark, s"$wh/t").get
    assert(v2.version === 2L && v2.operation === "append")
    // stats columns carried: the SQL-inserted files collect id min/max,
    // so a point predicate still prunes across old AND new files
    assert(v2.files.forall(f => v2.stats.get(f).exists(
      _.cols.contains("id"))), "SQL insert must carry stats columns")
    GraftScan.lastPlanned = None
    assert(spark.sql("SELECT id FROM gvw.t WHERE id = 250").as[Long]
      .collect().toSeq === Seq(250L))
    val (kept, total) = GraftScan.lastPlanned.get
    assert(kept < total, s"prune must hold after SQL insert ($kept/$total)")
    // INSERT OVERWRITE replaces the data, next version
    spark.sql("INSERT OVERWRITE gvw.t SELECT id FROM range(1, 11)")
    assert(spark.sql("SELECT count(*) AS c FROM gvw.t").as[Long].head()
      === 10L)
    assert(VersionedTable.latest(spark, s"$wh/t").get.operation
      === "overwrite")
    // history intact: time travel still sees the pre-overwrite rows
    assert(spark.sql("SELECT count(*) AS c FROM gvw.t VERSION AS OF 2")
      .as[Long].head() === 300L)
    // CTAS: create + populate in one statement
    spark.sql("CREATE TABLE gvw.ct AS SELECT id, id * 2 AS dbl " +
      "FROM range(1, 51)")
    assert(spark.sql("SELECT sum(dbl) AS s FROM gvw.ct").as[Long].head()
      === (1L to 50L).map(_ * 2).sum)
  }

  test("df.write.format(graft) append and overwrite modes") {
    val dir = tmp()
    VersionedTable.create((1L to 50L).toDF("id"), dir)
    (51L to 80L).toDF("id").write.format("graft").mode("append").save(dir)
    assert(ids(dsv2(dir)) === (1L to 80L).toSet)
    (1L to 5L).toDF("id").write.format("graft").mode("overwrite").save(dir)
    assert(ids(dsv2(dir)) === (1L to 5L).toSet)
    assert(ids(dsv2(dir, "versionAsOf" -> "2")) === (1L to 80L).toSet)
  }

  test("DELETE FROM runs as deletion-vector DML; TRUNCATE empties; " +
      "pinned loads reject writes") {
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.gvd", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gvd.warehouse", wh)
    VersionedTable.create(
      (1L to 400L).toDF("id").repartitionByRange(8, col("id")),
      s"$wh/t", statsCols = Seq("id"))
    spark.sql("DELETE FROM gvd.t WHERE id <= 40")
    assert(spark.sql("SELECT count(*) AS c FROM gvd.t").as[Long].head()
      === 360L)
    val snap = VersionedTable.latest(spark, s"$wh/t").get
    // one 50-row file fully dead (dropped or rewritten); the rest of
    // the table untouched — a point delete must not rewrite everything
    assert(snap.files.size >= 7, "delete must not rewrite the table")
    // soft-deleted rows invisible through every read path
    assert(spark.sql("SELECT count(*) AS c FROM gvd.t WHERE id <= 40")
      .as[Long].head() === 0L)
    assert(VersionedTable.read(spark, s"$wh/t").filter(col("id") <= 40)
      .count() === 0L)
    spark.sql("TRUNCATE TABLE gvd.t")
    assert(spark.sql("SELECT count(*) AS c FROM gvd.t").as[Long].head()
      === 0L)
    assert(spark.sql("SELECT count(*) AS c FROM gvd.t VERSION AS OF 2")
      .as[Long].head() === 360L, "truncate is a commit, not an erasure")
    // a time-travel-pinned relation has no write capability
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gvd.t VERSION AS OF 1 VALUES (9999)")
    }
    assert(e.getMessage != null)
  }

  test("SQL INSERT enforces CHECK constraints and generated columns") {
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.gvc", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gvc.warehouse", wh)
    VersionedTable.create(Seq((1L, 10L)).toDF("id", "v"), s"$wh/t")
    VersionedTable.addCheckConstraint(spark, s"$wh/t", "v_pos", "v > 0")
    spark.sql("INSERT INTO gvc.t VALUES (2, 20)")
    assert(spark.sql("SELECT count(*) AS c FROM gvc.t").as[Long].head()
      === 2L)
    val bad = intercept[Exception] {
      spark.sql("INSERT INTO gvc.t VALUES (3, -1)")
    }
    assert(bad.getMessage.contains("v_pos") ||
      (bad.getCause != null && bad.getCause.getMessage.contains("v_pos")),
      s"constraint name must surface: ${bad.getMessage}")
    assert(spark.sql("SELECT count(*) AS c FROM gvc.t").as[Long].head()
      === 2L, "failed insert must commit nothing")
    // generated column: supplying the matching value passes, a
    // contradicting one fails (GENERATED ALWAYS AS semantics)
    val g = tmp()
    VersionedTable.create(Seq((1L, 5L, 10L)).toDF("a", "b", "twice_b"),
      g, generatedCols = Map("twice_b" -> "b * 2"))
    spark.conf.set("spark.sql.catalog.gvg", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gvg.warehouse",
      g.substring(0, g.lastIndexOf('/')))
    val tn = g.substring(g.lastIndexOf('/') + 1)
    spark.sql(s"INSERT INTO gvg.`$tn` VALUES (2, 7, 14)")
    assert(spark.sql(s"SELECT count(*) AS c FROM gvg.`$tn`")
      .as[Long].head() === 2L)
    intercept[Exception] {
      spark.sql(s"INSERT INTO gvg.`$tn` VALUES (3, 7, 99)")
    }
  }

  // ------------------------------------------------- SQL UPDATE/MERGE

  test("SQL UPDATE routes through updateWithDv: expressions, predicate " +
      "pruning, constraints") {
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.gvu", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gvu.warehouse", wh)
    VersionedTable.create(
      (1L to 400L).map(i => (i, i * 10L, "x")).toDF("id", "v", "s")
        .repartitionByRange(8, col("id")), s"$wh/t",
      statsCols = Seq("id"))
    // arithmetic in SET and % in WHERE — far beyond v1-Filter shapes
    spark.sql("UPDATE gvu.t SET v = v * 2 + 1, s = concat(s, 'u') " +
      "WHERE id % 100 = 7")
    val snap = VersionedTable.latest(spark, s"$wh/t").get
    assert(snap.operation === "update")
    val got = spark.sql("SELECT v, s FROM gvu.t WHERE id = 107")
      .as[(Long, String)].head()
    assert(got === (1070L * 2 + 1, "xu"))
    assert(spark.sql("SELECT count(*) AS c FROM gvu.t").as[Long].head()
      === 400L, "update must not change cardinality")
    assert(spark.sql("SELECT sum(v) AS s FROM gvu.t").as[Long].head()
      === (1L to 400L).map(i => if (i % 100 == 7) i * 20 + 1 else i * 10).sum)
    // alias form resolves too
    spark.sql("UPDATE gvu.t AS z SET v = 0 WHERE z.id = 1")
    assert(spark.sql("SELECT v FROM gvu.t WHERE id = 1").as[Long].head()
      === 0L)
    // a CHECK constraint guards SQL UPDATE exactly as the API path
    VersionedTable.addCheckConstraint(spark, s"$wh/t", "v_nonneg", "v >= 0")
    intercept[Exception] {
      spark.sql("UPDATE gvu.t SET v = -5 WHERE id = 2")
    }
    assert(spark.sql("SELECT v FROM gvu.t WHERE id = 2").as[Long].head()
      === 20L, "failed update must commit nothing")
  }

  test("SQL MERGE INTO upserts through mergeWithDv; non-upsert shapes " +
      "and pinned targets rejected") {
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.gvm", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gvm.warehouse", wh)
    VersionedTable.create(
      (1L to 100L).map(i => (i, i * 10L)).toDF("id", "v"), s"$wh/t")
    Seq((50L, 999L), (200L, 2000L)).toDF("id", "v")
      .createOrReplaceTempView("mupd")
    spark.sql("MERGE INTO gvm.t USING mupd ON t.id = mupd.id " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    val snap = VersionedTable.latest(spark, s"$wh/t").get
    assert(snap.operation === "merge")
    assert(spark.sql("SELECT count(*) AS c FROM gvm.t").as[Long].head()
      === 101L)
    assert(spark.sql("SELECT v FROM gvm.t WHERE id = 50").as[Long].head()
      === 999L)
    assert(spark.sql("SELECT v FROM gvm.t WHERE id = 200").as[Long].head()
      === 2000L)
    assert(spark.sql("SELECT v FROM gvm.t WHERE id = 49").as[Long].head()
      === 490L, "unmatched target rows carry")
    // source can be any relation — a subquery works
    spark.sql("MERGE INTO gvm.t USING " +
      "(SELECT id + 300 AS id, v FROM mupd) AS m2 ON t.id = m2.id " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(spark.sql("SELECT count(*) AS c FROM gvm.t").as[Long].head()
      === 103L)
    // conditional / partial shapes are out of contract: loud failure
    val e = intercept[Exception] {
      spark.sql("MERGE INTO gvm.t USING mupd ON t.id = mupd.id " +
        "WHEN MATCHED THEN DELETE")
    }
    assert(e.getMessage.contains("upsert"),
      s"should explain the supported shape: ${e.getMessage}")
    // CDC classifies the SQL merge exactly like the API merge
    val changes = graft.sources.ChangeFeed.readChanges(spark, s"$wh/t",
      1L, 2L, Seq("id"))
    val byType = changes.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType === Map("update_preimage" -> 1L,
      "update_postimage" -> 1L, "insert" -> 1L))
  }

  // --------------------------------------------------------- streaming

  private def streamTo(dir: String, sinkName: String, ckpt: String,
      opts: (String, String)*) = {
    val r = opts.foldLeft(spark.readStream.format("graft"))(
      (r, o) => r.option(o._1, o._2)).load(dir)
    r.writeStream.format("memory").queryName(sinkName)
      .option("checkpointLocation", ckpt).start()
  }

  private def streamToParquet(dir: String, out: String, ckpt: String,
      opts: (String, String)*) = {
    val r = opts.foldLeft(spark.readStream.format("graft"))(
      (r, o) => r.option(o._1, o._2)).load(dir)
    r.writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
  }

  test("readStream.format(graft): snapshot first, then tails appends; " +
      "checkpoint restart re-emits nothing") {
    val dir = tmp(); val ckpt = tmp(); val out = tmp() + "/out"
    VersionedTable.create((1L to 100L).toDF("id"), dir)
    VersionedTable.deleteWithDv(spark, dir, col("id") > 90L,
      densityThreshold = 0.9)
    val q = streamToParquet(dir, out, ckpt)
    try {
      q.processAllAvailable()
      // initial snapshot = current table state, DVs applied
      assert(ids(spark.read.parquet(out)) === (1L to 90L).toSet)
      VersionedTable.append((101L to 120L).toDF("id"), dir)
      VersionedTable.append((121L to 130L).toDF("id"), dir)
      q.processAllAvailable()
      assert(ids(spark.read.parquet(out)) ===
        ((1L to 90L) ++ (101L to 130L)).toSet)
    } finally q.stop()
    // restart from the same checkpoint: nothing re-emits, only the new
    // commit arrives (exactly-once through the file sink's log)
    VersionedTable.append((131L to 140L).toDF("id"), dir)
    val q2 = streamToParquet(dir, out, ckpt)
    try {
      q2.processAllAvailable()
      val got = spark.read.parquet(out).select("id").as[Long].collect()
      assert(got.length === got.distinct.length,
        "a committed range must never re-emit after restart")
      assert(got.toSet === ((1L to 90L) ++ (101L to 140L)).toSet)
    } finally q2.stop()
  }

  test("readStream fails loudly on a delete commit; ignoreChanges emits " +
      "added files only; maxVersionsPerTrigger bounds batches") {
    val dir = tmp()
    VersionedTable.create((1L to 100L).toDF("id"), dir)
    val q = streamTo(dir, "gs2", tmp())
    try {
      q.processAllAvailable()
      VersionedTable.delete(spark, dir, col("id") <= 10L)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("ignoreChanges"),
        s"should advise the option: ${e.getMessage}")
    } finally q.stop()
    // ignoreChanges: the delete commit contributes only its added
    // files (CoW rewrites re-emit survivors; a pure drop adds none)
    val q3 = streamTo(dir, "gs3", tmp(), "ignoreChanges" -> "true",
      "startingVersion" -> "latest")
    try {
      q3.processAllAvailable()
      VersionedTable.append((201L to 210L).toDF("id"), dir)
      q3.processAllAvailable()
      assert(ids(spark.table("gs3")) === (201L to 210L).toSet)
    } finally q3.stop()
    // backlog of 3 commits with maxVersionsPerTrigger=1 drains in >= 3
    // batches (bounded plans), same total rows
    val d2 = tmp()
    VersionedTable.create((1L to 10L).toDF("id"), d2)
    VersionedTable.append((11L to 20L).toDF("id"), d2)
    VersionedTable.append((21L to 30L).toDF("id"), d2)
    VersionedTable.append((31L to 40L).toDF("id"), d2)
    val q4 = streamTo(d2, "gs4", tmp(), "startingVersion" -> "1",
      "maxVersionsPerTrigger" -> "1")
    try {
      q4.processAllAvailable()
      assert(ids(spark.table("gs4")) === (11L to 40L).toSet)
      assert(q4.recentProgress.count(_.numInputRows > 0) >= 3,
        "each commit should land as its own micro-batch")
    } finally q4.stop()
  }

  test("readStream checkpoint refuses a recreated table (UUID identity)") {
    val dir = tmp(); val ckpt = tmp(); val out = tmp() + "/out"
    VersionedTable.create((1L to 10L).toDF("id"), dir)
    val q = streamToParquet(dir, out, ckpt)
    try { q.processAllAvailable() } finally q.stop()
    // drop and recreate at the same path: new table identity
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    VersionedTable.create((1L to 10L).toDF("id"), dir)
    val q2 = streamToParquet(dir, out, ckpt)
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      assert(e.getMessage.contains("recreated") ||
        e.getMessage.contains("incarnation"),
        s"identity mismatch must fail loudly: ${e.getMessage}")
    } finally q2.stop()
  }

  // ------------------------------------------------------- ALTER TABLE

  test("ALTER TABLE ADD/RENAME/DROP COLUMN land as metadata-only commits") {
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.gva", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gva.warehouse", wh)
    VersionedTable.create(
      (1L to 100L).map(i => (i, i * 10L)).toDF("id", "v")
        .repartitionByRange(4, col("id")), s"$wh/t",
      statsCols = Seq("id", "v"))
    val filesBefore = VersionedTable.latest(spark, s"$wh/t").get.files

    // ADD: old rows read NULL, no file moved, later INSERT fills it
    spark.sql("ALTER TABLE gva.t ADD COLUMNS (bonus BIGINT)")
    val s1 = VersionedTable.latest(spark, s"$wh/t").get
    assert(s1.operation === "add_column" && s1.files === filesBefore,
      "ADD COLUMN must be metadata-only")
    assert(spark.sql("SELECT count(*) AS c FROM gva.t WHERE bonus IS NULL")
      .as[Long].head() === 100L)
    spark.sql("INSERT INTO gva.t SELECT 101, 1010, 7")
    assert(spark.sql("SELECT bonus FROM gva.t WHERE id = 101")
      .as[Long].head() === 7L)

    // RENAME: logical name moves, data and stats follow — pruning on
    // the NEW name still plans one file
    spark.sql("ALTER TABLE gva.t RENAME COLUMN v TO val")
    assert(spark.sql("SELECT sum(val) AS s FROM gva.t").as[Long].head()
      === (1L to 100L).map(_ * 10).sum + 1010L)
    GraftScan.lastPlanned = None
    assert(spark.sql("SELECT val FROM gva.t WHERE val = 230").as[Long]
      .head() === 230L)
    val (kept, total) = GraftScan.lastPlanned.get
    assert(total === 5 && kept === 1,
      s"renamed-column stats must keep pruning: $kept/$total")

    // DROP: column leaves the schema; re-adding its name fails fast
    spark.sql("ALTER TABLE gva.t DROP COLUMN bonus")
    assert(spark.table("gva.t").schema.fieldNames.toSeq ===
      Seq("id", "val"))
    val eAdd = intercept[Exception] {
      spark.sql("ALTER TABLE gva.t ADD COLUMNS (bonus BIGINT)")
    }
    assert(eAdd.getMessage.toLowerCase.contains("drop"),
      s"recycled dropped name must fail loudly: ${eAdd.getMessage}")

    // shapes the format cannot honor metadata-only: loud refusal
    val eTyp = intercept[Exception] {
      spark.sql("ALTER TABLE gva.t ALTER COLUMN val TYPE INT")
    }
    assert(eTyp.getMessage.contains("not support"),
      s"type change must be refused: ${eTyp.getMessage}")
    val ePos = intercept[Exception] {
      spark.sql("ALTER TABLE gva.t ADD COLUMNS (z BIGINT FIRST)")
    }
    assert(ePos.getMessage.contains("FIRST/AFTER"),
      s"positioning must be refused: ${ePos.getMessage}")

    // time travel reads history under the schema OF that version
    assert(spark.sql("SELECT * FROM gva.t VERSION AS OF 1")
      .schema.fieldNames.toSeq === Seq("id", "v"))
  }

  // ---------------------------------------------------- $history relation

  test("t$history lists the commit log with metadata-priced live rows") {
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.gvh", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gvh.warehouse", wh)
    VersionedTable.create(
      (1L to 200L).map(i => (i, i * 10L)).toDF("id", "v")
        .repartitionByRange(4, col("id")), s"$wh/t",
      statsCols = Seq("id"))
    spark.sql("DELETE FROM gvh.t WHERE id % 10 = 3")
    spark.sql("UPDATE gvh.t SET v = v + 1 WHERE id % 7 = 0")
    val h = spark.sql(
      "SELECT version, operation, n_files, n_dv_files, n_deleted_rows, " +
        "live_rows FROM gvh.`t$history` ORDER BY version")
      .as[(Long, String, Long, Long, Long, Long)].collect()
    assert(h.map(x => (x._1, x._2)).toSeq ===
      Seq((1L, "create"), (2L, "delete"), (3L, "update")))
    val d = (1L to 200L).count(_ % 10 == 3)
    val u = (1L to 200L).count(i => i % 7 == 0 && i % 10 != 3)
    assert(h(0)._6 === 200L && h(0)._5 === 0L)
    assert(h(1)._6 === 200L - d && h(1)._5 === d.toLong)
    assert(h(2)._6 === 200L - d, "update must not change live cardinality")
    // n_deleted_rows at v3 depends on the per-file DV-vs-CoW pricing:
    // these 50-row files price as rewrites, which FOLD the delete's
    // DVs away — accounting must follow whichever lane ran, agreeing
    // with the manifest (u is declared for documentation: a DV-lane
    // update would have shown d + u)
    val dvnV3 = VersionedTable.snapshots(spark, s"$wh/t")
      .find(_.version == 3L).get.dvn.values.sum
    assert(h(2)._5 === dvnV3,
      s"history must mirror the manifest's DV accounting (u=$u)")
    // the priced live_rows must equal the actual readable row count —
    // the same metadata-vs-scan agreement DvRace asserts cross-JVM
    assert(spark.table("gvh.t").count() === 200L - d)
    // a table without per-file stats prices as NULL, never a guess
    VersionedTable.create((1L to 10L).toDF("id"), s"$wh/nostats")
    val h2 = spark.sql(
      "SELECT live_rows FROM gvh.`nostats$history`").collect()
    assert(h2.length === 1 && h2(0).isNullAt(0))
    // time travel over $history is refused loudly
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gvh.`t$history` VERSION AS OF 1").collect()
    }
    assert(e.getMessage.contains("meaningless"), e.getMessage)
  }
}
