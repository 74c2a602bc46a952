package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.BatchLedger

/** Contract spec for the committed-batch ledger shared by all
  * foreachBatch sinks: atomic publication, skip-committed, replay
  * no-op, staging/debris repair.
  */
class BatchLedgerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft-ledger").toString

  test("publish makes the partition visible; second publish is a no-op") {
    val dir = tmp()
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(BatchLedger.publish(df, dir, 0L))
    assert(BatchLedger.isCommitted(spark, dir, 0L))
    assert(BatchLedger.committedIds(spark, dir) === Set(0L))
    // replay: returns false, writes nothing
    assert(!BatchLedger.publish(Seq((9L, "z")).toDF("id", "v"), dir, 0L))
    val rows = spark.read.parquet(s"$dir/batch_id=0")
      .select("id").as[Long].collect().toSet
    assert(rows === Set(1L, 2L), "replay must not touch a committed partition")
  }

  test("root read discovers batch_id from the directory name (partitionBy twin)") {
    val dir = tmp()
    BatchLedger.publish(Seq((1L, "a")).toDF("id", "v"), dir, 0L)
    BatchLedger.publish(Seq((2L, "b")).toDF("id", "v"), dir, 1L)
    val all = spark.read.parquet(dir)
      .select(col("id"), col("batch_id").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(all === Set((1L, 0L), (2L, 1L)))
  }

  test("crashed staging debris is overwritten, never published, never read") {
    val dir = tmp()
    // simulate a crash mid-write: partial staging dir with a stray file
    val staging = new java.io.File(s"$dir/.staging_batch_id=5")
    staging.mkdirs()
    new java.io.File(staging, "part-junk.parquet").createNewFile()
    assert(!BatchLedger.isCommitted(spark, dir, 5L),
      "staging debris must not count as committed")
    assert(BatchLedger.committedIds(spark, dir).isEmpty)
    val df = Seq((7L, "x")).toDF("id", "v")
    assert(BatchLedger.publish(df, dir, 5L))
    val rows = spark.read.parquet(s"$dir/batch_id=5")
      .select("id").as[Long].collect().toList
    assert(rows === List(7L), "publish must replace staging debris wholesale")
  }

  test("pre-ledger destination debris (no data files) is repaired by publish") {
    val dir = tmp()
    val debris = new java.io.File(s"$dir/batch_id=3")
    debris.mkdirs()
    new java.io.File(debris, "_temporary").createNewFile()
    assert(!BatchLedger.isCommitted(spark, dir, 3L))
    assert(BatchLedger.publish(Seq((4L, "d")).toDF("id", "v"), dir, 3L))
    assert(BatchLedger.isCommitted(spark, dir, 3L))
    val rows = spark.read.parquet(s"$dir/batch_id=3")
      .select("id").as[Long].collect().toList
    assert(rows === List(4L))
  }

  test("publish refuses a batch_id column — the directory carries it") {
    val dir = tmp()
    val e = intercept[IllegalArgumentException] {
      BatchLedger.publish(Seq((1L, 0L)).toDF("id", "batch_id"), dir, 0L)
    }
    assert(e.getMessage.contains("batch_id"))
  }

  test("hasCommits ignores debris-only sinks") {
    val dir = tmp()
    assert(!BatchLedger.hasCommits(spark, dir))
    new java.io.File(s"$dir/batch_id=0").mkdirs() // empty debris
    assert(!BatchLedger.hasCommits(spark, dir))
    BatchLedger.publish(Seq((1L, "a")).toDF("id", "v"), dir, 1L)
    assert(BatchLedger.hasCommits(spark, dir))
  }
}
