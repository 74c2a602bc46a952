package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (suites run
  * sequentially in the forked test JVM).
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet is TIMESTAMP(NANOS); session-level, never set
      // inside a query (see SparkEntry.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
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
