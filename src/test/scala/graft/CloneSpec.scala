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

  test("clone of an already-vacuumed old version fails loudly AT CLONE TIME, not at first read") {
    val src = tmp(); val dst = tmp()
    VersionedTable.create((1L to 20L).toDF("id"), src)
    VersionedTable.overwrite((21L to 40L).toDF("id"), src)
    VersionedTable.vacuum(spark, src, retainVersions = 1)
    // the vacuum dropped v1's manifest along with its files: the clone
    // fails on version resolution (manifest gone) — and if only the
    // FILES were gone, requireFilesPresent would fail it instead;
    // either way the failure lands at clone time with nothing committed
    val e = intercept[RuntimeException] {
      VersionedTable.cloneTable(spark, src, dst, version = Some(1L))
    }
    assert(e.getMessage.contains("no version") ||
      e.getMessage.contains("vacuumed"))
    assert(VersionedTable.latest(spark, dst).isEmpty,
      "a failed clone must commit nothing")
    // the files-swept-but-manifest-present lane, driven directly: a
    // shallow clone whose SOURCE is itself a stranded clone
    val mid = tmp(); val dst2 = tmp()
    VersionedTable.create((1L to 10L).toDF("id"), mid)
    VersionedTable.cloneTable(spark, mid, dst)
    VersionedTable.overwrite(Seq(99L).toDF("id"), mid)
    VersionedTable.vacuum(spark, mid, retainVersions = 1)
    val e2 = intercept[IllegalArgumentException] {
      VersionedTable.cloneTable(spark, dst, dst2) // dst's files are gone
    }
    assert(e2.getMessage.contains("vacuumed"))
  }

  test("clone serializes on the source's maintenance lock (no vacuum can sweep mid-clone)") {
    val src = tmp(); val dst = tmp()
    VersionedTable.create((1L to 20L).toDF("id"), src)
    // hold the source's maintenance lock the way a live vacuum would
    val lock = java.nio.file.Paths.get(src, "_manifests", ".maint.lock")
    java.nio.file.Files.createDirectories(lock.getParent)
    java.nio.file.Files.write(lock, "test-holder".getBytes("UTF-8"))
    java.nio.file.Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis()))
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val t = new Thread(() => {
      VersionedTable.cloneTable(spark, src, dst)
      done.set(true)
    })
    t.start()
    Thread.sleep(500)
    assert(!done.get(), "clone must WAIT while the source lock is held")
    java.nio.file.Files.delete(lock) // holder releases
    t.join(30000)
    assert(done.get(), "clone must proceed once the lock frees")
    assert(ids(VersionedTable.read(spark, dst)) === (1L to 20L).toSet)
  }

  test("stats and bloom backfill work ON a still-shallow clone (borrowed absolute refs resolve)") {
    val src = tmp(); val dst = tmp()
    // source tracks NO stats/blooms — the clone must backfill its own
    VersionedTable.create(
      (1L to 400L).toDF("id").repartitionByRange(8, col("id")), src)
    VersionedTable.cloneTable(spark, src, dst)
    assert(VersionedTable.latest(spark, dst).get.files
      .forall(_.startsWith("/")), "still shallow: all refs borrowed")
    // analyze reads the borrowed bytes where they live (resolveRef, not
    // <dst>//abs/...) and commits metadata-only stats on the clone
    val s1 = VersionedTable.analyze(spark, dst, Seq("id"))
    assert(s1.files.forall(_.startsWith("/")), "analyze moved no data")
    val (kept, pruned) = VersionedTable.pruneInfo(spark, dst,
      col("id") === 123L)
    assert(kept === 1 && pruned === 7, "backfilled stats prune")
    // bloom backfill over the same borrowed refs; sidecars land LOCAL
    val s2 = VersionedTable.analyzeBloom(spark, dst, Seq("id"))
    assert(s2.blooms.nonEmpty)
    assert(s2.blooms.values.flatMap(_.values)
      .forall(!_.startsWith("/")), "bloom sidecars are the clone's own")
    assert(ids(VersionedTable.readWhere(spark, dst, col("id") === 123L))
      === Set(123L))
    // source untouched by the clone's metadata commits
    assert(VersionedTable.latest(spark, src).get.version === 1L)
  }

  test("renamed-then-cloned table prunes and reads on the LOGICAL name end-to-end") {
    val src = tmp(); val dst = tmp()
    VersionedTable.create(
      (1L to 400L).toDF("id").repartitionByRange(8, col("id")), src,
      statsCols = Seq("id"))
    // rename engages column mapping: files keep the physical name, the
    // manifest speaks the logical one
    VersionedTable.renameColumn(spark, src, "id", "doc_id")
    VersionedTable.cloneTable(spark, src, dst)
    val (kept, pruned) = VersionedTable.pruneInfo(spark, dst,
      col("doc_id") === 77L)
    assert(kept === 1 && pruned === 7, "carried stats prune on the logical name")
    assert(VersionedTable.readWhere(spark, dst, col("doc_id") === 77L)
      .select("doc_id").as[Long].collect().toSet === Set(77L))
    // DV delete on the clone under the mapping, then the rename+clone+DV
    // triple still reads consistently
    VersionedTable.deleteWithDv(spark, dst, col("doc_id") % 100L === 0L,
      densityThreshold = 0.5)
    assert(VersionedTable.read(spark, dst)
      .select("doc_id").as[Long].collect().toSet ===
      (1L to 400L).filterNot(_ % 100 == 0).toSet)
    // a second rename ON the clone, then analyze backfill of a fresh
    // column name over borrowed refs (mapping + clone + analyze)
    VersionedTable.renameColumn(spark, dst, "doc_id", "k")
    assert(VersionedTable.readWhere(spark, dst, col("k") === 77L)
      .select("k").as[Long].collect().toSet === Set(77L))
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
