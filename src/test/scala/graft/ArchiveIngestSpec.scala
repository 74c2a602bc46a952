package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.col

import graft.sources.{VersionedTable, Warc, Zip}
import graft.streaming.Streams

/** Streaming container ingestion: shards dropped into a directory
  * stream through the container readers and land in a VersionedTable
  * under the append#batchId exactly-once contract. The claims under
  * test: extraction through the binaryFile stream agrees with direct
  * batch extraction, each drop commits one tagged time-travelable
  * version, replays are no-ops, corrupt shards surface as their loud
  * null row instead of vanishing, and lineage (archive_id =
  * xxhash64(path)) survives the flatMap.
  */
class ArchiveIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def write(dir: String, name: String, bytes: Array[Byte]): Unit = {
    val p = java.nio.file.Paths.get(dir, name)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, bytes)
  }

  test("zip shards stream into a versioned table: one tagged version " +
      "per drop, contents agree with direct extraction, replay no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft-arch")
    val (src, table, ckpt) = (s"$root/src", s"$root/table", s"$root/ckpt")
    write(src, "shard-0.zip", Zip.zipBytes(3L))
    write(src, "shard-1.zip", Zip.zipBytes(4L))

    Streams.archiveIngest(spark, src, "zip", table, ckpt)
    val v1 = VersionedTable.latest(spark, table).get
    assert(v1.operation.startsWith("append#"))
    val got1 = VersionedTable.read(spark, table)
    // agree with direct batch extraction over the same bytes
    val direct = Zip.zipEntries(spark.createDataset(Seq(
      (0L, Zip.zipBytes(3L)), (0L, Zip.zipBytes(4L)))))
      .select("name", "n_bytes", "byte_sum")
      .collect().map(_.toSeq).toSet
    assert(got1.select("name", "n_bytes", "byte_sum")
      .collect().map(_.toSeq).toSet === direct)
    // lineage: archive_id is xxhash64(path), two distinct shards
    assert(got1.select("archive_id").distinct().count() === 2)

    // second drop -> exactly one more tagged version; first stays
    // addressable
    write(src, "shard-2.zip", Zip.zipBytes(10L))
    Streams.archiveIngest(spark, src, "zip", table, ckpt)
    val snaps = VersionedTable.snapshots(spark, table)
    assert(snaps.size === 2 && snaps.map(_.operation).distinct.size === 2)
    val want2 = Zip.zipEntryRows(Zip.zipBytes(10L),
      new java.util.zip.Inflater(true)).get.length
    assert(VersionedTable.read(spark, table).count() ===
      direct.size + want2)
    assert(VersionedTable.snapshotAt(spark, table, v1.version).count() ===
      direct.size, "batch boundaries stay time-travelable")

    // no new input -> no new version
    Streams.archiveIngest(spark, src, "zip", table, ckpt)
    assert(VersionedTable.snapshots(spark, table).size === 2)
  }

  test("a corrupt shard lands as its loud null row, not silence") {
    val root = java.nio.file.Files.createTempDirectory("graft-archbad")
    val (src, table, ckpt) = (s"$root/src", s"$root/table", s"$root/ckpt")
    write(src, "good.warc", Warc.warcBytes(5L))
    write(src, "bad.warc", "WARC/0.18\r\nnope".getBytes("US-ASCII"))
    Streams.archiveIngest(spark, src, "warc", table, ckpt)
    val rows = VersionedTable.read(spark, table)
    val nulls = rows.filter(col("rec_idx").isNull).count()
    assert(nulls === 1, "the corrupt shard must surface as one null row")
    assert(rows.filter(col("rec_idx").isNotNull).count() ===
      (2 + 5L % 4), "the good shard's responses all land")
  }

  test("unknown format fails loudly before any stream starts") {
    val e = intercept[IllegalArgumentException] {
      Streams.extractArchives(
        Seq(("p", Array.empty[Byte])).toDF("path", "content"), "rar")
    }
    assert(e.getMessage.contains("rar"))
  }
}
