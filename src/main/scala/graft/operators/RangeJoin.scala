package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: left points join right intervals
  * with `start <= t < end` on a shared key. Spark plans the inequality
  * condition as a broadcast-nested-loop join — quadratic work and a
  * broadcast of a whole side. The scale path buckets time into fixed
  * bins: every interval explodes to the bins it covers, every point maps
  * to exactly ONE bin, and the join becomes an equi-join on (keys, bin)
  * + an exact containment filter.
  *
  * Because a point lives in one bin and an interval covers that bin at
  * most once, the equi-join emits each true (point, interval) match
  * exactly once — no post-dedup. Shuffle volume is rows × small ints;
  * pick `binSeconds` near the typical interval length so intervals
  * explode to O(1) bins.
  */
object RangeJoin {

  /** All (point, interval) matches. Output: every column of `points`
    * plus `valueCols` from the matched interval row; a point matching k
    * intervals yields k rows.
    */
  def pointsInIntervals(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], pointTs: String, startCol: String, endCol: String,
      valueCols: Seq[String], binSeconds: Long = 3600L): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val reserved = Seq("__bin", "__s", "__e")
    require(!(points.columns ++ intervals.columns).exists(reserved.contains),
      s"pointsInIntervals reserves columns ${reserved.mkString(", ")}")
    val p = points.withColumn("__bin",
      floor(col(pointTs).cast("long") / binSeconds))
    val i = intervals.select(
      (keys.map(col) :+ col(startCol).as("__s") :+ col(endCol).as("__e")) ++
        valueCols.map(col): _*)
      // empty/inverted intervals match nothing — and an inverted one
      // would make sequence() count DOWN, exploding |s-e|/binSeconds
      // bin rows per bad row before the filter could discard them
      .filter(col("__s") < col("__e"))
      .withColumn("__bin", explode(sequence(
        floor(col("__s").cast("long") / binSeconds),
        floor(col("__e").cast("long") / binSeconds))))
    p.join(i, keys :+ "__bin")
      .filter(col(pointTs) >= col("__s") && col(pointTs) < col("__e"))
      .select(points.columns.map(col).toSeq ++ valueCols.map(col): _*)
  }

  /** Interval-overlap join: left intervals × right intervals on a shared
    * key, matching when the half-open ranges overlap —
    * `l.start < r.end AND r.start < l.end`. The third member of the
    * temporal family (as-of, point-in-interval, interval-overlap) that a
    * session/campaign-window pipeline hits.
    *
    * Same bin-bucket scale path as `pointsInIntervals`, except BOTH sides
    * explode to their covered bins, so a true pair can share several
    * bins. Each pair is emitted exactly once via the standard
    * first-shared-bin trick: emit only in bin
    * `max(firstBin(l), firstBin(r))` — every overlapping pair shares that
    * bin (each side's first bin is ≤ the other's last bin when they
    * overlap) and no other bin qualifies. No post-join dedup shuffle.
    *
    * Output: every column of `left` plus `valueCols` from the matched
    * right row; a left interval overlapping k right intervals yields k
    * rows. Inverted/empty intervals on either side match nothing and are
    * dropped before the explode (an inverted one would make sequence()
    * count DOWN).
    */
  def intervalsOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftStart: String, leftEnd: String, rightStart: String, rightEnd: String,
      valueCols: Seq[String], binSeconds: Long = 3600L): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val reserved = Seq("__bin", "__rs", "__re")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"intervalsOverlap reserves columns ${reserved.mkString(", ")}")
    def bins(s: String, e: String): Column = sequence(
      floor(col(s).cast("long") / binSeconds),
      floor(col(e).cast("long") / binSeconds))
    val l = left
      .filter(col(leftStart) < col(leftEnd))
      .withColumn("__bin", explode(bins(leftStart, leftEnd)))
    val r = right.select(
      (keys.map(col) :+ col(rightStart).as("__rs") :+ col(rightEnd).as("__re")) ++
        valueCols.map(col): _*)
      .filter(col("__rs") < col("__re"))
      .withColumn("__bin", explode(bins("__rs", "__re")))
    l.join(r, keys :+ "__bin")
      .filter(col(leftStart) < col("__re") && col("__rs") < col(leftEnd))
      .filter(col("__bin") === greatest(
        floor(col(leftStart).cast("long") / binSeconds),
        floor(col("__rs").cast("long") / binSeconds)))
      .select(left.columns.map(col).toSeq ++ valueCols.map(col): _*)
  }
}
