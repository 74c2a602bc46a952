package graft.operators

import org.apache.spark.sql.DataFrame
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
}
