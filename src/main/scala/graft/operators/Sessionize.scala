package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Batch sessionization (gaps-and-islands): group each key's events into
  * sessions closed by more than `gapSeconds` of inactivity — the batch
  * twin of `streaming.Streams.sessionize` (StreamingSpec proves they
  * agree on the same rows).
  *
  * Formulation: LAG over (key, ts) marks rows that open a new session
  * (no predecessor, or a gap beyond the threshold); a running SUM of
  * those markers over the SAME window numbers the sessions; then one
  * hash aggregate per (key, session) computes the summary. Cost: ONE
  * shuffle on the key (both window passes share partitioning+ordering =
  * one sort) + the final aggregate's map-side combine.
  *
  * Tie semantics: both windows use the default RANGE frame, so
  * same-timestamp events are peers — they always land in the same
  * session regardless of their order within the tie, making the output
  * deterministic (and engine-reproducible) even with duplicate
  * timestamps.
  */
object Sessionize {

  /** Events + a `session_id` column (1-based per key, in time order).
    *
    * Null-timestamp events have no position on the time axis and are
    * DROPPED up front (same policy as `AsOf`): without the filter every
    * null row would mark session-opening, all nulls would be RANGE peers
    * sharing one inflated session, and Spark's NULLS FIRST sort would
    * diverge from ANSI engines' NULLS LAST. Timestamp gaps compare in
    * exact integer microseconds (a per-operand double cast rounds at
    * ~2.4e-7 s near current epochs, enough to misclassify an
    * exactly-gapSeconds gap); numeric ts columns keep the double path.
    */
  def withSessionIds(events: DataFrame, keys: Seq[String], tsCol: String,
      gapSeconds: Long): DataFrame = {
    require(gapSeconds >= 0, "gapSeconds must be >= 0")
    val reserved = Seq("__new", "session_id")
    require(!events.columns.exists(reserved.contains),
      s"withSessionIds reserves columns ${reserved.mkString(", ")}")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol).asc)
    val prev = lag(col(tsCol), 1).over(w)
    val tsType = events.schema(tsCol).dataType
    // NTZ->instant casting applies the session timezone; a DST jump would
    // warp wall-clock gaps (see AsOf) — require the unambiguous zone
    if (tsType == TimestampNTZType)
      require(events.sparkSession.conf.get("spark.sql.session.timeZone") == "UTC",
        "withSessionIds on TIMESTAMP_NTZ requires spark.sql.session.timeZone=UTC " +
          "(DST transitions would distort inactivity gaps)")
    val gapExceeded =
      if (tsType == TimestampType || tsType == TimestampNTZType)
        unix_micros(col(tsCol).cast(TimestampType)) -
          unix_micros(prev.cast(TimestampType)) > gapSeconds * 1000000L
      else col(tsCol).cast("double") - prev.cast("double") > gapSeconds
    val isNew = when(prev.isNull || gapExceeded, 1).otherwise(0)
    events.filter(col(tsCol).isNotNull)
      .withColumn("__new", isNew)
      .withColumn("session_id", sum(col("__new")).over(w))
      .drop("__new")
  }

  /** One row per (keys, session): session_start, session_end, n_events,
    * plus any extra aggregates (e.g. a decimal-cast value sum).
    */
  def sessions(events: DataFrame, keys: Seq[String], tsCol: String,
      gapSeconds: Long, extraAggs: Seq[Column] = Seq.empty): DataFrame = {
    val aggs = Seq(
      min(col(tsCol)).as("session_start"),
      max(col(tsCol)).as("session_end"),
      count(lit(1)).as("n_events")) ++ extraAggs
    withSessionIds(events, keys, tsCol, gapSeconds)
      .groupBy((keys :+ "session_id").map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
