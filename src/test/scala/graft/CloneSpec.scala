package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ConstraintViolationException, VersionedTable}

/** CLONE (Delta's CREATE TABLE ... CLONE) contract: shallow clones are
  * zero-copy (absolute borrowed refs, one manifest write), carry the
  * full metadata surface (schema, stats, blooms, DVs, constraints,
  * generation rules), are independent tables from birth (fresh
  * identity, divergent histories), fold borrowed refs local through
  * rewrites, and can never delete source bytes — while a vacuumed
  * SOURCE strands a still-shallow clone LOUDLY, never silently.
  * Deep clones copy everything and survive source vacuum.
  */
class CloneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft-clone").toString

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").as[Long].collect().toSet

  private def localParquetCount(dir: String): Int = {
    val d = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(d)) 0
    else {
      val s = java.nio.file.Files.walk(d)
      try s.filter(p => p.toString.endsWith(".parquet")).count().toInt
      finally s.close()
    }
  }

  test("shallow clone is zero-copy, reads equal the source, and histories diverge independently") {
    val src = tmp(); val dst = tmp()
    VersionedTable.create((1L to 100L).toDF("id"), src,
      statsCols = Seq("id"))
    VersionedTable.append((101L to 200L).toDF("id"), src)
    val snap = VersionedTable.cloneTable(spark, src, dst)
    assert(snap.operation === "clone" && snap.version === 1L)
    assert(localParquetCount(dst) === 0, "shallow: no data bytes copied")
    assert(snap.files.forall(_.startsWith("/")), "borrowed refs are absolute")
    assert(ids(VersionedTable.read(spark, dst)) === (1L to 200L).toSet)
    // fresh identity: a clone is a NEW table
    assert(snap.tableId.isDefined)
    assert(snap.tableId !=
      VersionedTable.latest(spark, src).get.tableId)
    // divergence: writes on either side are invisible to the other
    VersionedTable.append((201L to 210L).toDF("id"), src)
    VersionedTable.delete(spark, dst, col("id") > 150L)
    assert(ids(VersionedTable.read(spark, src)) === (1L to 210L).toSet)
    assert(ids(VersionedTable.read(spark, dst)) === (1L to 150L).toSet)
  }

  test("clone AS OF an old version") {
    val src = tmp(); val dst = tmp()
    VersionedTable.create((1L to 10L).toDF("id"), src)
    VersionedTable.append((11L to 20L).toDF("id"), src)
    VersionedTable.cloneTable(spark, src, dst, version = Some(1L))
    assert(ids(VersionedTable.read(spark, dst)) === (1L to 10L).toSet)
  }

  test("skipping stats travel: the clone prunes immediately; a clone of a DV table reads live rows only and can keep soft-deleting") {
    val src = tmp(); val dst = tmp()
    VersionedTable.create(
      (1L to 400L).toDF("id").repartitionByRange(8, col("id")), src,
      statsCols = Seq("id"))
    VersionedTable.deleteWithDv(spark, src, col("id") % 50L === 0L,
      densityThreshold = 0.5)
    VersionedTable.cloneTable(spark, src, dst)
    val (kept, pruned) = VersionedTable.pruneInfo(spark, dst,
      col("id") === 123L)
    assert(kept === 1 && pruned === 7, "carried stats prune borrowed files")
    // the carried DV sidecar names files by the SOURCE's relative refs;
    // the basename-keyed anti-join must still drop exactly those rows
    assert(ids(VersionedTable.read(spark, dst)) ===
      (1L to 400L).filterNot(_ % 50 == 0).toSet)
    // the clone's own DV delete composes with the borrowed one
    VersionedTable.deleteWithDv(spark, dst, col("id") % 7L === 0L,
      densityThreshold = 0.5)
    assert(ids(VersionedTable.read(spark, dst)) ===
      (1L to 400L).filterNot(i => i % 50 == 0 || i % 7 == 0).toSet)
    assert(ids(VersionedTable.read(spark, src)) ===
      (1L to 400L).filterNot(_ % 50 == 0).toSet, "source untouched")
  }

  test("constraints and generation rules travel with the clone") {
    val src = tmp(); val dst = tmp()
    VersionedTable.create(Seq((10L, 5.0)).toDF("id", "price"), src,
      generatedCols = Map("bucket" -> "id % 10"))
    VersionedTable.addCheckConstraint(spark, src, "pos", "price > 0")
    VersionedTable.cloneTable(spark, src, dst)
    intercept[ConstraintViolationException] {
      VersionedTable.append(Seq((2L, -1.0)).toDF("id", "price"), dst)
    }
    VersionedTable.append(Seq((23L, 1.0)).toDF("id", "price"), dst)
    assert(VersionedTable.read(spark, dst)
      .filter(col("id") === 23L).select("bucket").as[Long].head() === 3L)
  }

  test("rewrites fold borrowed refs local; after compaction the clone survives source vacuum") {
    val src = tmp(); val dst = tmp()
    VersionedTable.create((1L to 100L).toDF("id"), src,
      statsCols = Seq("id"))
    VersionedTable.cloneTable(spark, src, dst)
    VersionedTable.compactTable(spark, dst, targetFiles = 2)
    assert(VersionedTable.latest(spark, dst).get.files
      .forall(!_.startsWith("/")), "compaction folded everything local")
    // age the borrowed v1 out of the clone's retention, vacuum it:
    // absolute refs are structurally excluded from the delete set
    VersionedTable.vacuum(spark, dst, retainVersions = 1)
    // source is fully intact
    assert(ids(VersionedTable.read(spark, src)) === (1L to 100L).toSet)
    // now destroy the source entirely: the compacted clone is immune
    VersionedTable.overwrite(Seq(999L).toDF("id"), src)
    VersionedTable.vacuum(spark, src, retainVersions = 1)
    assert(ids(VersionedTable.read(spark, dst)) === (1L to 100L).toSet)
  }

  test("a vacuumed source strands a still-shallow clone LOUDLY, never silently") {
    val src = tmp(); val dst = tmp()
    VersionedTable.create((1L to 50L).toDF("id"), src)
    VersionedTable.cloneTable(spark, src, dst)
    VersionedTable.overwrite(Seq(999L).toDF("id"), src)
    VersionedTable.vacuum(spark, src, retainVersions = 1)
    val e = intercept[Throwable] {
      VersionedTable.read(spark, dst).count()
    }
    assert(e != null, "stranded clone must fail, not return wrong rows")
  }

  test("deep clone copies the bytes (DV sidecars included) and survives source vacuum from birth") {
    val src = tmp(); val dst = tmp()
    VersionedTable.create(
      (1L to 200L).toDF("id").repartitionByRange(4, col("id")), src,
      statsCols = Seq("id"))
    VersionedTable.deleteWithDv(spark, src, col("id") % 9L === 0L,
      densityThreshold = 0.5)
    VersionedTable.cloneTable(spark, src, dst, shallow = false)
    assert(localParquetCount(dst) > 0, "deep: bytes copied")
    assert(VersionedTable.latest(spark, dst).get.files
      .forall(!_.startsWith("/")))
    VersionedTable.overwrite(Seq(999L).toDF("id"), src)
    VersionedTable.vacuum(spark, src, retainVersions = 1)
    assert(ids(VersionedTable.read(spark, dst)) ===
      (1L to 200L).filterNot(_ % 9 == 0).toSet)
  }

  test("clone target must be empty; clone of a clone composes") {
    val src = tmp(); val dst = tmp(); val dst2 = tmp()
    VersionedTable.create((1L to 30L).toDF("id"), src)
    VersionedTable.cloneTable(spark, src, dst)
    intercept[IllegalArgumentException] {
      VersionedTable.cloneTable(spark, src, dst)
    }
    // clone of a (still-shallow) clone: absolute refs carry verbatim
    VersionedTable.append((31L to 40L).toDF("id"), dst)
    VersionedTable.cloneTable(spark, dst, dst2)
    assert(ids(VersionedTable.read(spark, dst2)) === (1L to 40L).toSet)
  }
}
