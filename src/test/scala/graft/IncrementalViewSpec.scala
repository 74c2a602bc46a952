package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IncrementalView
import graft.sources.VersionedTable

/** Contract spec for incremental materialized-view maintenance: the
  * weighted-feed algebra must equal full recompute EXACTLY at every
  * version (decimal measures — no float tolerance), groups must be born
  * and die correctly, NULL measures count 0 consistently, and the
  * versioned changed-files feed must read only changed files. The
  * oracle gate (q99) proves the four-commit history against DuckDB.
  */
class IncrementalViewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft-iview").toString

  private def viewMap(df: DataFrame): Map[String, (Long, BigDecimal)] =
    df.select(col("g"), col("n_rows"), col("sum_x").cast("string"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), BigDecimal(r.getString(2)))).toMap

  private def mkRows(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("id", "g", "xs")
      .select(col("id"), col("g"), col("xs").cast("decimal(10,2)").as("x"))

  test("diffFeed maintenance equals full recompute through births, deaths, updates") {
    val v1 = mkRows(Seq((1L, "a", "1.10"), (2L, "a", "2.20"),
      (3L, "b", "3.30"), (4L, "c", "4.40")))
    // v2: delete 3 (b dies), update 1 (a changes), insert 5 (d born),
    // carry 2 and 4 untouched
    val v2 = mkRows(Seq((1L, "a", "9.90"), (2L, "a", "2.20"),
      (4L, "c", "4.40"), (5L, "d", "5.50")))
    val incr = IncrementalView.applyDelta(
      IncrementalView.full(v1, Seq("g"), Seq("x")),
      IncrementalView.diffFeed(v1, v2), Seq("g"), Seq("x"))
    assert(viewMap(incr) === viewMap(IncrementalView.full(v2, Seq("g"), Seq("x"))))
    assert(!viewMap(incr).contains("b"), "emptied group must die")
    assert(viewMap(incr)("d") === ((1L, BigDecimal("5.50"))), "new group must be born")
  }

  test("NULL measures count 0 consistently in full and incremental paths") {
    val v1 = Seq((1L, "a", Some("1.00")), (2L, "a", None))
      .toDF("id", "g", "xs")
      .select(col("id"), col("g"), col("xs").cast("decimal(10,2)").as("x"))
    val v2 = Seq((1L, "a", Some("1.00")), (2L, "a", Some("2.00")))
      .toDF("id", "g", "xs")
      .select(col("id"), col("g"), col("xs").cast("decimal(10,2)").as("x"))
    val fullV1 = IncrementalView.full(v1, Seq("g"), Seq("x"))
    assert(viewMap(fullV1)("a") === ((2L, BigDecimal("1.00"))),
      "NULL counts as 0, sum stays non-null")
    val incr = IncrementalView.applyDelta(fullV1,
      IncrementalView.diffFeed(v1, v2), Seq("g"), Seq("x"))
    assert(viewMap(incr) === viewMap(IncrementalView.full(v2, Seq("g"), Seq("x"))))
  }

  test("changedFilesFeed maintenance tracks a versioned table exactly, reading only changed files") {
    val dir = tmp()
    val o = (0L until 200L).map(i => (i, s"g${i % 3}", s"$i.50"))
    VersionedTable.create(mkRows(o).repartitionByRange(4, col("id")),
      dir, Seq("id"))
    VersionedTable.delete(spark, dir, col("id") % 5 === 0)
    VersionedTable.update(spark, dir, col("id") % 7 === 0,
      Map("x" -> (col("x") + lit(1).cast("decimal(10,2)"))
        .cast("decimal(10,2)")))
    VersionedTable.append(mkRows(Seq((1000L, "g9", "7.70"))), dir, Seq("id"))
    var view = IncrementalView.full(
      VersionedTable.snapshotAt(spark, dir, 1L), Seq("g"), Seq("x"))
    for (v <- 2L to 4L) {
      val feed = IncrementalView.changedFilesFeed(spark, dir, v - 1, v)
      // the feed plan must touch ONLY the files that changed between
      // the versions — the O(changed files) contract
      val snaps = VersionedTable.snapshots(spark, dir)
      val before = snaps.find(_.version == v - 1).get.files.toSet
      val after = snaps.find(_.version == v).get.files.toSet
      val changed = (after -- before) ++ (before -- after)
      val scanned = feed.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation.asInstanceOf[
              org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.inputFiles.toSeq
      }.flatten.map(_.split('/').takeRight(2).mkString("/")).toSet
      assert(scanned === changed.map(_.split('/').takeRight(2).mkString("/")),
        s"v${v - 1}->v$v feed must read exactly the changed files")
      view = IncrementalView.applyDelta(view, feed, Seq("g"), Seq("x"))
      assert(viewMap(view) === viewMap(IncrementalView.full(
        VersionedTable.snapshotAt(spark, dir, v), Seq("g"), Seq("x"))),
        s"incremental view must equal full recompute at v$v")
    }
    assert(viewMap(view)("g9") === ((1L, BigDecimal("7.70"))))
  }

  test("changedFilesFeed tracks deletion-vector commits exactly: in-range " +
      "soft deletes join at -1, pre-range dead rows never re-subtract") {
    val dir = tmp()
    val o = (0L until 200L).map(i => (i, s"g${i % 3}", s"$i.50"))
    VersionedTable.create(mkRows(o).repartitionByRange(4, col("id")),
      dir, Seq("id"))
    VersionedTable.deleteWithDv(spark, dir, col("id") % 20L === 0L)  // v2 DV
    VersionedTable.deleteWithDv(spark, dir, col("id") % 20L === 1L)  // v3 DV
    // v4: CoW fallback rewrites the files — removed side reads under
    // v3's DV, so v2/v3's dead rows must not be subtracted twice
    VersionedTable.deleteWithDv(spark, dir, col("id") % 20L === 2L,
      densityThreshold = 0.01)                                       // v4
    VersionedTable.append(mkRows(Seq((1000L, "g9", "7.70"))), dir,
      Seq("id"))                                                     // v5
    var view = IncrementalView.full(
      VersionedTable.snapshotAt(spark, dir, 1L), Seq("g"), Seq("x"))
    for (v <- 2L to 5L) {
      view = IncrementalView.applyDelta(view,
        IncrementalView.changedFilesFeed(spark, dir, v - 1, v),
        Seq("g"), Seq("x"))
      assert(viewMap(view) === viewMap(IncrementalView.full(
        VersionedTable.snapshotAt(spark, dir, v), Seq("g"), Seq("x"))),
        s"incremental view must equal full recompute at v$v")
    }
    // a MULTI-commit range spanning DV and rewrite commits folds once
    val spanned = IncrementalView.applyDelta(
      IncrementalView.full(VersionedTable.snapshotAt(spark, dir, 1L),
        Seq("g"), Seq("x")),
      IncrementalView.changedFilesFeed(spark, dir, 1L, 5L),
      Seq("g"), Seq("x"))
    assert(viewMap(spanned) === viewMap(view),
      "the spanning feed must equal the per-commit fold")
  }

  test("changedFilesFeed tracks a merge-on-read UPDATE: DV pre-images " +
      "subtract, appended post-images add, CoW lanes fold once") {
    val dir = tmp()
    val o = (0L until 200L).map(i => (i, s"g${i % 3}", s"$i.50"))
    VersionedTable.create(mkRows(o).repartitionByRange(2, col("id")),
      dir, Seq("id"))
    // sub-threshold per file → pure DV + post-image appends, measures
    // move between groups so the view must see both halves
    VersionedTable.updateWithDv(spark, dir, col("id") % 20L === 0L,
      Map("g" -> lit("g9"), "x" -> lit(java.math.BigDecimal.valueOf(1.25))
        .cast("decimal(18,2)")))                                     // v2
    // CoW fallback lane in the same API
    VersionedTable.updateWithDv(spark, dir, col("id") % 20L === 1L,
      Map("x" -> (col("x") + lit(1).cast("decimal(18,2)"))),
      densityThreshold = 0.01)                                       // v3
    var view = IncrementalView.full(
      VersionedTable.snapshotAt(spark, dir, 1L), Seq("g"), Seq("x"))
    for (v <- 2L to 3L) {
      view = IncrementalView.applyDelta(view,
        IncrementalView.changedFilesFeed(spark, dir, v - 1, v),
        Seq("g"), Seq("x"))
      assert(viewMap(view) === viewMap(IncrementalView.full(
        VersionedTable.snapshotAt(spark, dir, v), Seq("g"), Seq("x"))),
        s"incremental view must equal full recompute at v$v")
    }
  }

  test("applyDelta rejects a view missing the maintained shape") {
    val bad = Seq(("a", 1L)).toDF("g", "n_rows")
    val feed = mkRows(Seq((1L, "a", "1.00"))).withColumn("__weight", lit(1L))
    intercept[IllegalArgumentException] {
      IncrementalView.applyDelta(bad, feed, Seq("g"), Seq("x"))
    }
  }
}
