package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation operators (reference SURVEY.md §2.4, A1-A10).
  *
  * All are plain `groupBy().agg()` — Spark plans these as partial
  * (map-side) + final hash aggregation, so at 100 TB only the
  * pre-aggregated per-group partials shuffle, never raw rows. Grouping
  * cardinality, not input size, bounds the exchange.
  */
object Aggregates {

  /** Grouped COUNT(*) (reference A1: notebooks/gold.py:33-39). */
  def groupCounts(keys: Seq[String], countName: String = "cnt"): DataFrame => DataFrame =
    _.groupBy(keys.map(col): _*).agg(count(lit(1)).as(countName))

  /** Conditional count SUM(CASE WHEN cond THEN 1 END)
    * (reference A3: notebooks/bronze.py:155).
    */
  def conditionalCount(cond: Column): Column =
    sum(when(cond, 1L).otherwise(0L))

  /** Ratio of aggregates as percent, null-guarded on zero denominator
    * (reference A10: notebooks/gold.py:306).
    */
  def pct(num: Column, denom: Column, scale: Int = 2): Column =
    when(denom === 0, lit(null).cast("double"))
      .otherwise(round(lit(100.0) * num.cast("double") / denom.cast("double"), scale))

  /** Second-level re-aggregation: SUM over previously counted groups
    * (reference A9: notebooks/gold.py:347-349).
    */
  def reAggregate(keys: Seq[String], src: String, out: String): DataFrame => DataFrame =
    _.groupBy(keys.map(col): _*).agg(sum(col(src)).as(out))
}
