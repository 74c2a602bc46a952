package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VersionedTable

/** Shared JVM-local signal for [[TaskRetrySpec]]'s planted failures —
  * accumulators can't carry it (Spark discards failed-task accumulator
  * updates by design), but local-mode executors share this JVM.
  */
object TaskRetryProbe {
  val planted = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Commit idempotency under Spark TASK retries (round-15, verdict item
  * 7): the multi-JVM race harnesses kill whole processes, but a real
  * cluster's most common failure is a single task attempt dying and
  * being re-executed. Every write stage here carries a planted
  * first-attempt failure (`TaskContext.attemptNumber == 0` on partition
  * 0 throws; the retry passes) — the session's `local[4, 2]` master
  * grants exactly one retry — and each staged-write path must commit
  * exactly-once anyway: no duplicate rows, no missing rows, and no
  * committed-visible debris from the failed attempts (Spark's output
  * committer discards aborted task attempts; anything it leaves under
  * the staging dir is invisible to readers and reclaimed by
  * vacuumOrphans).
  */
class TaskRetrySpec extends AnyFunSuite {
  val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft-retry").toString + "/t"

  /** `n` rows whose partition-0 task FAILS on its first attempt in
    * whatever stage evaluates it, then succeeds on the retry. The
    * failure is keyed on attemptNumber (not a one-shot flag), so every
    * job over this frame replants it — each write path's own stage is
    * the one exercised.
    */
  private def flaky(n: Long): DataFrame =
    spark.range(0L, n, 1L, 4).as[Long].mapPartitions { it =>
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0) {
        TaskRetryProbe.planted.incrementAndGet()
        throw new RuntimeException("planted first-attempt task failure")
      }
      it
    }.map(i => (i, s"v$i")).toDF("id", "v")

  /** Every parquet file under the table's data/ staging area that is
    * NOT referenced by any retained manifest — committed-visible debris
    * must be zero; orphaned debris must be reclaimable.
    */
  private def unreferencedFiles(dir: String): Seq[String] = {
    val referenced = VersionedTable.snapshots(spark, dir)
      .flatMap(_.files).toSet
    val dataRoot = java.nio.file.Paths.get(dir, "data")
    if (!java.nio.file.Files.exists(dataRoot)) return Seq.empty
    val s = java.nio.file.Files.walk(dataRoot)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          p.toString.endsWith(".parquet"))
        .map(p => java.nio.file.Paths.get(dir).relativize(p).toString)
        .filterNot(referenced)
        .toSeq
    } finally s.close()
  }

  test("append commits exactly-once under a planted task retry") {
    val dir = tmp()
    VersionedTable.create(Seq((-1L, "base")).toDF("id", "v"), dir)
    val before = TaskRetryProbe.planted.get()
    VersionedTable.append(flaky(1000), dir)
    assert(TaskRetryProbe.planted.get() > before,
      "the planted failure must actually have fired")
    val got = VersionedTable.read(spark, dir)
      .select("id").as[Long].collect().sorted
    assert(got === ((-1L) +: (0L until 1000L)).sorted,
      "no duplicate and no missing rows under the task retry")
    val orphans = unreferencedFiles(dir)
    assert(orphans.isEmpty,
      s"aborted attempts must leave no staged parquet debris " +
        s"(${orphans.take(3).mkString(",")})")
  }

  test("overwrite commits exactly-once under a planted task retry") {
    val dir = tmp()
    VersionedTable.create(Seq((-1L, "base")).toDF("id", "v"), dir)
    VersionedTable.overwrite(flaky(500), dir)
    val got = VersionedTable.read(spark, dir)
      .select("id").as[Long].collect().sorted
    assert(got === (0L until 500L).toArray,
      "overwrite must land exactly the batch, once")
    // the replaced version's files stay referenced by v1 (time travel);
    // only NON-referenced debris counts
    assert(unreferencedFiles(dir).isEmpty)
  }

  test("CoW merge commits exactly-once under a planted task retry") {
    val dir = tmp()
    VersionedTable.create(
      (0L until 100L).map(i => (i, "old")).toDF("id", "v"), dir)
    // update half the keys, insert 50 new — through a flaky update side
    val upd = flaky(150).withColumn("v",
      org.apache.spark.sql.functions.lit("new"))
      .filter($"id" >= 50L)
    VersionedTable.merge(upd, dir, Seq("id"), Seq("id"))
    val rows = VersionedTable.read(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(rows.size === 150, "100 base + 50 inserts, no duplicates")
    assert((0L until 50L).forall(rows(_) == "old"))
    assert((50L until 150L).forall(rows(_) == "new"))
    assert(unreferencedFiles(dir).isEmpty)
  }

  test("the streaming versioned sink stays exactly-once under a planted " +
      "task retry") {
    val dir = tmp()
    graft.streaming.Streams.resetSinkCursors()
    graft.streaming.Streams.processVersionedBatch(flaky(300), 0L, dir)
    // redelivery of the SAME batch id must no-op even though the frame
    // is flaky (the replay check short-circuits before any job runs)
    graft.streaming.Streams.processVersionedBatch(flaky(300), 0L, dir)
    graft.streaming.Streams.processVersionedBatch(flaky(200), 1L, dir)
    val snaps = VersionedTable.snapshots(spark, dir)
    assert(snaps.map(_.operation) === Seq("append#0", "append#1"),
      "one commit per batch id, despite retries and redelivery")
    assert(VersionedTable.read(spark, dir).count() === 500L)
    assert(unreferencedFiles(dir).isEmpty)
  }

  test("a task that exhausts its retries fails the commit LOUDLY with " +
      "nothing visible") {
    val dir = tmp()
    VersionedTable.create(Seq((-1L, "base")).toDF("id", "v"), dir)
    val poisoned = spark.range(0L, 10L, 1L, 2).as[Long].mapPartitions { it =>
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null && tc.partitionId() == 0)
        throw new RuntimeException("planted failure on EVERY attempt")
      it
    }.map(i => (i, s"v$i")).toDF("id", "v")
    intercept[Exception] { VersionedTable.append(poisoned, dir) }
    assert(VersionedTable.latest(spark, dir).get.version === 1L,
      "a failed write must not commit")
    assert(VersionedTable.read(spark, dir).count() === 1L)
    // the crashed attempt's staging debris is invisible and reclaimable
    VersionedTable.vacuumOrphans(spark, dir, graceMs = 0L)
    assert(unreferencedFiles(dir).isEmpty,
      "vacuumOrphans must reclaim the failed write's staging debris")
  }

  test("TFRecord writeShards: a task failing MID-WRITE (half a shard " +
      "already on disk) retries into a clean exactly-once shard") {
    import graft.sources.Tfrecord
    val out = tmp()
    // the throw fires lazily from the iterator writeShards is
    // draining, so the first attempt has already streamed records
    // into its shard file when it dies — the retry must truncate,
    // not append
    val ds = spark.range(0L, 40L, 1L, 4).as[Long].mapPartitions { it =>
      val tc = org.apache.spark.TaskContext.get()
      val failing =
        tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0
      var n = 0
      it.map { i =>
        n += 1
        if (failing && n == 6) {
          TaskRetryProbe.planted.incrementAndGet()
          throw new RuntimeException("planted mid-write task failure")
        }
        (i, Array.tabulate(16)(j => ((i + j) % 256).toByte))
      }
    }
    val before = TaskRetryProbe.planted.get()
    val shards = Tfrecord.writeShards(ds, out)
    assert(TaskRetryProbe.planted.get() === before + 1,
      "the mid-write failure must actually have fired")
    assert(shards.map(_._2).sum === 40L)
    val got = Tfrecord.readShards(spark, out)
      .as[(Long, Option[Long])].collect()
    assert(got.length === 40, "no duplicate or missing records")
    assert(got.map(_._1).toSet === (0L until 40L).toSet)
    assert(got.forall(_._2.contains(16L)))
  }

  test("TFRecord writeShards: a zombie-like second attempt loses the " +
      "no-replace publish, cleans only its own temp, never interleaves") {
    import graft.sources.Tfrecord
    val out = tmp()
    val ds = spark.range(0L, 20L, 1L, 2).as[Long]
      .map(i => (i, Array.tabulate(16)(j => ((i + j) % 256).toByte)))
    val s1 = Tfrecord.writeShards(ds, out)
    val shard0 = new java.io.File(new java.net.URI(
      if (s1.head._1.startsWith("file:")) s1.head._1
      else s"file:${s1.head._1}"))
    val winnerBytes = java.nio.file.Files.readAllBytes(shard0.toPath)
    // a second run over the same deterministic partitions = the zombie
    // attempt racing an already-published winner: every rename loses
    val s2 = Tfrecord.writeShards(ds, out)
    assert(s2.map(_._2).sum === s1.map(_._2).sum)
    assert(java.util.Arrays.equals(winnerBytes,
      java.nio.file.Files.readAllBytes(shard0.toPath)),
      "the published shard's bytes must be untouched by the loser")
    val leftovers = shard0.getParentFile.listFiles()
      .filter(_.getName.endsWith(".tmp"))
    assert(leftovers.isEmpty, "the loser must delete its own temp")
    val got = Tfrecord.readShards(spark, out)
      .as[(Long, Option[Long])].collect()
    assert(got.map(_._1).toSet === (0L until 20L).toSet &&
      got.length === 20)
  }
}
