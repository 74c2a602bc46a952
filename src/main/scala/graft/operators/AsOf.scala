package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: each left row picks up the value columns
  * of the LATEST right row with `right.ts <= left.ts` for the same key —
  * the temporal join behind feature lookups and snapshot enrichment that
  * Spark has no native operator for.
  *
  * Spark-first formulation (composition beats a custom SparkPlan here):
  * tag and union both sides, then a single `last(struct, ignoreNulls)`
  * window over (key) ordered by (ts, side) carries the most recent right
  * ROW forward into each left row — the struct is non-null exactly for
  * right rows, so a right row whose value column is null still matches
  * (its null is carried, not skipped). Cost: ONE shuffle on the key + a
  * per-partition sort — no range-condition join (which Spark plans as a
  * broadcast-nested-loop) and no pair explosion, regardless of how many
  * right rows precede a left row.
  *
  * Right rows should be unique per (keys, rightTs) — pre-dedup with
  * `Dedup.latestPerKey` otherwise; ties at identical ts make "the"
  * latest row ambiguous in ANY as-of semantics.
  */
object AsOf {

  /** Left rows + `valueCols` from the as-of-matched right row (null when
    * no right row precedes). `leftTs`/`rightTs` name each side's event
    * time; output keeps all left columns plus one `asof_<c>` per value
    * column.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val reserved = Seq("__ts", "__side", "__asof") ++ valueCols.map(c => s"__v_$c")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"asOfJoin reserves columns ${reserved.mkString(", ")}")
    val leftCols = left.columns.toSeq
    // right side: only keys + ts + values, tagged side=0 so it sorts
    // BEFORE left rows at an identical timestamp (<= semantics). Null
    // keys or timestamps never compare true in a join condition, so such
    // right rows are unmatchable — drop them up front (a null ts would
    // otherwise sort to the partition start and be carried into every
    // row, and null keys would pair with null-key left rows).
    val r = right
      .filter((keys :+ rightTs).map(col(_).isNotNull).reduce(_ && _))
      .select(
        (keys.map(col) :+ col(rightTs).as("__ts")) ++
          valueCols.map(c => col(c).as(s"__v_$c")): _*)
      .withColumn("__side", lit(0))
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rightRow = when(col("__side") === 0,
      struct(valueCols.map(c => col(s"__v_$c").as(c)): _*))
    unioned.withColumn("__asof", last(rightRow, ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
