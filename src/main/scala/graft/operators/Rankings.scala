package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-based ranking operators (reference SURVEY.md §2.5-§2.6).
  *
  * Scale notes: each window shuffles once on its partition keys, then
  * sorts within partitions. Top-N-per-group (rank-then-filter) cannot push
  * the limit below the sort in stock Spark, but the per-group sort is
  * distributed and spills; with AQE skewed groups split. All orderings
  * must pin ties (reference pins `cnt DESC, name ASC` everywhere:
  * notebooks/gold.py:58,105,182,252,372) or results are nondeterministic.
  */
object Rankings {

  /** ROW_NUMBER rank within groups, keep top n (reference W2+O3:
    * notebooks/gold.py:56-73).
    */
  def topNPerGroup(keys: Seq[String], orderBy: Seq[Column], n: Int, rankName: String = "rnk"): DataFrame => DataFrame = { df =>
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    df.withColumn(rankName, row_number().over(w)).filter(col(rankName) <= n)
  }

  /** RANK + share-of-partition-total (reference W3+W4: notebooks/gold.py:104-115).
    * Adds `rankName` and `shareName` (= 100*val/partition sum). Rounding is
    * left to the caller: Spark's round-on-double disagrees with other
    * engines near decimal ties (see SparkEntry determinism notes).
    */
  def rankAndShare(keys: Seq[String], value: String, orderBy: Seq[Column],
      rankName: String = "rnk", shareName: String = "share_pct"): DataFrame => DataFrame = { df =>
    val wOrdered = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    val wFull = Window.partitionBy(keys.map(col): _*)
    df.withColumn(rankName, rank().over(wOrdered))
      .withColumn(shareName, lit(100.0) * col(value) / sum(col(value)).over(wFull))
  }

  /** LAG-based deltas (reference W5: notebooks/gold.py:117-135). Adds
    * `prevName` = lag(value) over (partition keys order by orderCol) and
    * `diffName` = value - prev.
    */
  def lagDelta(keys: Seq[String], orderCol: String, value: String,
      prevName: String, diffName: String): DataFrame => DataFrame = { df =>
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    df.withColumn(prevName, lag(col(value), 1).over(w))
      .withColumn(diffName, col(value) - col(prevName))
  }

  /** Manual pivot of top-k ranks to columns: MAX(CASE WHEN rnk=k THEN x END)
    * (reference A8: notebooks/gold.py:196-201).
    */
  def pivotTopK(groupKeys: Seq[String], rankCol: String, valueCol: String, k: Int): DataFrame => DataFrame = { df =>
    val aggs = (1 to k).map(i =>
      max(when(col(rankCol) === i, col(valueCol))).as(s"${valueCol}_$i"))
    df.groupBy(groupKeys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
