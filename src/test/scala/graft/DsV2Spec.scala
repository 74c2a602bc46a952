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
}
