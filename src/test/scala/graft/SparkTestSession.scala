package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (suites run
  * sequentially in the forked test JVM).
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    // in-process specs commit and vacuum within milliseconds; the
    // production manifest-age grace (the slot-resurrection defense the
    // multi-JVM race harnesses run WITH) would make those vacuums
    // no-ops, so the seam zeroes it for this JVM only
    graft.sources.VersionedTable.vacuumManifestGraceMs = 0L
    val s = SparkSession.builder()
      // local[cores, maxTaskFailures]: allow ONE task retry, so the
      // task-retry idempotency specs (TaskRetrySpec) can plant
      // first-attempt failures inside write stages — a real cluster's
      // most common failure mode — and prove the staged-write paths
      // commit exactly-once anyway. (In local mode the conf key
      // spark.task.maxFailures is ignored; only the master string
      // carries it.)
      .master("local[4, 2]")
      .appName("graft-test")
      // SQL-text DML over versioned tables (UPDATE/MERGE INTO/rich
      // DELETE) — the same line a production session would carry
      .config("spark.sql.extensions", "graft.sources.v2.GraftSqlExtension")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet is TIMESTAMP(NANOS); session-level, never set
      // inside a query (see SparkEntry.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // INT96 (the legacy default) carries no usable footer statistics;
      // MICROS makes staged timestamp columns footer-stats-servable
      // (DataSkipping.footerStats) and is the modern parquet encoding
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // same AQE posture as Bench/Verify (asserted by PlansSpec)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val sfTiny = "/root/testdata/sf0.001"
}
