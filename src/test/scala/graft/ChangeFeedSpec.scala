package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ChangeFeed, VersionedTable}

/** Contract spec for the CDF reader: per-commit classification and
  * attribution, carried-row silence under copy-on-write, pre/post
  * pairing, and the O(changed files) posture (inherited from the same
  * file-delta read the IncrementalViewSpec plan-proves). The oracle
  * gate (q100) replays a four-commit history against DuckDB.
  */
class ChangeFeedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft-cdf").toString

  test("insert/delete/update classification with per-commit attribution") {
    val dir = tmp()
    val v1 = (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(4, col("id"))
    VersionedTable.create(v1, dir, Seq("id"))
    VersionedTable.delete(spark, dir, col("id") === 7L)            // v2
    VersionedTable.update(spark, dir, col("id") === 3L,            // v3
      Map("v" -> lit("UPD")))
    VersionedTable.append(Seq((500L, "new")).toDF("id", "v"), dir, // v4
      Seq("id"))
    val ch = ChangeFeed.readChanges(spark, dir, 1L, 4L, Seq("id"))
      .select(col("id"), col("v"), col("_change_type"),
        col("_commit_version"))
      .as[(Long, String, String, Long)].collect().toSet
    assert(ch === Set(
      (7L, "v7", "delete", 2L),
      (3L, "v3", "update_preimage", 3L),
      (3L, "UPD", "update_postimage", 3L),
      (500L, "new", "insert", 4L)),
      "exactly the semantic changes — carried rows from rewritten " +
        "files must emit nothing")
  }

  test("a key changed by several commits appears once per commit") {
    val dir = tmp()
    VersionedTable.create(Seq((1L, 10)).toDF("id", "n"), dir, Seq("id"))
    VersionedTable.update(spark, dir, col("id") === 1L, Map("n" -> lit(20)))
    VersionedTable.update(spark, dir, col("id") === 1L, Map("n" -> lit(30)))
    val ch = ChangeFeed.readChanges(spark, dir, 1L, 3L, Seq("id"))
      .select(col("n"), col("_change_type"), col("_commit_version"))
      .as[(Int, String, Long)].collect().toSet
    assert(ch === Set((10, "update_preimage", 2L),
      (20, "update_postimage", 2L), (20, "update_preimage", 3L),
      (30, "update_postimage", 3L)))
    // a narrower window sees only its commits
    val tail = ChangeFeed.readChanges(spark, dir, 2L, 3L, Seq("id"))
      .select(col("n"), col("_change_type")).as[(Int, String)]
      .collect().toSet
    assert(tail === Set((20, "update_preimage"), (30, "update_postimage")))
  }

  test("a 50-commit range compiles with bounded plan depth and full fidelity") {
    val dir = tmp()
    VersionedTable.create(Seq((0L, 0)).toDF("id", "n"), dir, Seq("id"))
    (1 to 50).foreach(i =>
      VersionedTable.append(Seq((i.toLong, i)).toDF("id", "n"), dir, Seq("id")))
    val feed = ChangeFeed.readChanges(spark, dir, 1L, 51L, Seq("id"),
      checkpointEvery = 8)
    // chunking cuts the tree: the TOP-LEVEL plan unions checkpointed RDD
    // scans, never 50 joins — ceil(50/8) = 7 chunks, each ≤ 8 joins,
    // compiled separately behind a lazy localCheckpoint
    val logical = feed.queryExecution.logical.toString
    assert(!logical.contains("Join"),
      s"top-level plan must contain only checkpoint scans + unions:\n$logical")
    val rows = feed.select(col("id"), col("_change_type"),
        col("_commit_version")).as[(Long, String, Long)].collect()
    assert(rows.length === 50)
    assert(rows.toSet === (1 to 50).map(i => (i.toLong, "insert", i.toLong + 1)).toSet,
      "every commit's insert attributed to its own version across chunk cuts")
  }

  test("no-op commits and overwrite classify correctly") {
    val dir = tmp()
    VersionedTable.create(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir,
      Seq("id"))
    // predicate matches nothing: stats prune everything, empty commit
    VersionedTable.delete(spark, dir, col("id") > 100L)            // v2
    VersionedTable.overwrite(Seq((2L, "b"), (3L, "c")).toDF("id", "v"), dir)
    val v2 = ChangeFeed.readChanges(spark, dir, 1L, 2L, Seq("id"))
    assert(v2.count() === 0L, "an empty commit emits no changes")
    val v3 = ChangeFeed.readChanges(spark, dir, 2L, 3L, Seq("id"))
      .select(col("id"), col("_change_type")).as[(Long, String)]
      .collect().toSet
    // overwrite rewrites every file: id 2 carries (equal values, silent),
    // id 1 deletes, id 3 inserts
    assert(v3 === Set((1L, "delete"), (3L, "insert")))
  }

  test("deletion-vector commits classify their soft deletes; earlier DV " +
      "rows never resurface") {
    val dir = tmp()
    val v1 = (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(4, col("id"))
    VersionedTable.create(v1, dir, Seq("id"))
    VersionedTable.deleteWithDv(spark, dir, col("id") % 25L === 3L)  // v2
    VersionedTable.deleteWithDv(spark, dir, col("id") % 25L === 4L)  // v3
    // v4: CoW fallback rewrites every file (threshold below cumulative
    // density) — removed files read under PREV's DV, so v2/v3's dead
    // rows must not reappear as v4 deletes
    VersionedTable.deleteWithDv(spark, dir, col("id") % 25L === 5L,
      densityThreshold = 0.01)                                       // v4
    val ch = ChangeFeed.readChanges(spark, dir, 1L, 4L, Seq("id"))
      .select(col("id"), col("_change_type"), col("_commit_version"))
      .as[(Long, String, Long)].collect().toSet
    assert(ch === (
      Set(3L, 28L, 53L, 78L).map(i => (i, "delete", 2L)) ++
      Set(4L, 29L, 54L, 79L).map(i => (i, "delete", 3L)) ++
      Set(5L, 30L, 55L, 80L).map(i => (i, "delete", 4L))),
      "each DV commit must report exactly its own soft deletes")
  }

  test("a commit mixing a DV and a CoW rewrite classifies both lanes " +
      "exactly once") {
    val dir = tmp()
    // file 1: ids 1..100, file 2: ids 101..200 (single-file commits)
    VersionedTable.create((1L to 100L).map(i => (i, s"v$i"))
      .toDF("id", "v").coalesce(1), dir, Seq("id"))
    VersionedTable.append((101L to 200L).map(i => (i, s"v$i"))
      .toDF("id", "v").coalesce(1), dir, Seq("id"))
    // 2 matches in file 1 (2% → DV), 30 in file 2 (30% → rewrite)
    VersionedTable.deleteWithDv(spark, dir,
      col("id").isin((Seq(7L, 13L) ++ (141L to 170L)).map(Long.box): _*),
      densityThreshold = 0.15)                                        // v3
    val ch = ChangeFeed.readChanges(spark, dir, 2L, 3L, Seq("id"))
      .select(col("id"), col("_change_type")).as[(Long, String)]
      .collect().toSeq
    assert(ch.size === 32 && ch.toSet ===
      (Seq(7L, 13L) ++ (141L to 170L)).map(i => (i, "delete")).toSet,
      "the DV lane and the rewrite lane must each fire exactly once " +
        "per deleted row")
  }

  test("a merge-on-read UPDATE classifies as update_preimage/postimage " +
      "pairs, never delete+insert, on both the DV and CoW lanes") {
    val dir = tmp()
    // file 1: ids 1..100, file 2: ids 101..200 (single-file commits)
    VersionedTable.create((1L to 100L).map(i => (i, s"v$i"))
      .toDF("id", "v").coalesce(1), dir, Seq("id"))
    VersionedTable.append((101L to 200L).map(i => (i, s"v$i"))
      .toDF("id", "v").coalesce(1), dir, Seq("id"))
    // 2 matches in file 1 (2% → DV + post-image append), 30 in file 2
    // (30% → CoW rewrite) — one commit, both lanes
    VersionedTable.updateWithDv(spark, dir,
      col("id").isin((Seq(7L, 13L) ++ (141L to 170L)).map(Long.box): _*),
      Map("v" -> concat(col("v"), lit("!"))),
      densityThreshold = 0.15)                                        // v3
    val ch = ChangeFeed.readChanges(spark, dir, 2L, 3L, Seq("id"))
      .select(col("id"), col("v"), col("_change_type"))
      .as[(Long, String, String)].collect().toSeq
    val touched = (Seq(7L, 13L) ++ (141L to 170L)).toSet
    assert(ch.size === 64, s"32 pre + 32 post images, got ${ch.size}")
    assert(ch.filter(_._3 == "update_preimage").map(c => c._1 -> c._2)
      .toSet === touched.map(i => i -> s"v$i"),
      "pre-images carry the OLD values")
    assert(ch.filter(_._3 == "update_postimage").map(c => c._1 -> c._2)
      .toSet === touched.map(i => i -> s"v$i!"),
      "post-images carry the NEW values")
    assert(!ch.exists(c => c._3 == "insert" || c._3 == "delete"),
      "a merge-on-read update must never leak delete+insert")
  }

  test("a merge-on-read MERGE classifies matches as update pairs and " +
      "unmatched batch rows as inserts") {
    val dir = tmp()
    VersionedTable.create((1L to 100L).map(i => (i, s"v$i"))
      .toDF("id", "v").coalesce(1), dir, Seq("id"))
    VersionedTable.mergeWithDv(
      Seq((7L, "upd7"), (13L, "upd13"), (500L, "new500"))
        .toDF("id", "v"), dir, Seq("id"))                             // v2
    val ch = ChangeFeed.readChanges(spark, dir, 1L, 2L, Seq("id"))
      .select(col("id"), col("v"), col("_change_type"))
      .as[(Long, String, String)].collect().toSet
    assert(ch === Set(
      (7L, "v7", "update_preimage"), (7L, "upd7", "update_postimage"),
      (13L, "v13", "update_preimage"), (13L, "upd13", "update_postimage"),
      (500L, "new500", "insert")))
  }
}
