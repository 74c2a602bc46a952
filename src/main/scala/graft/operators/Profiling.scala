package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style table profiling: one row per column with row count,
  * null count, exact distinct count, and lexicographic min/max (cast to
  * string so heterogeneous column types stack into one report) — the
  * data-quality health report a pipeline publishes next to every table
  * it writes.
  *
  * ONE aggregation job: all per-column aggregates evaluate in a single
  * `agg` (the multiple COUNT(DISTINCT)s plan as one pass with an Expand,
  * ~#cols row replicas map-side — fine for a profile over a handful of
  * columns; swap `countDistinct` for `approx_count_distinct` when
  * profiling very wide tables at 100 TB), then the wide single row
  * `stack`s into the long report. Deterministic: counts are exact,
  * min/max cast to string reproduce in any engine with binary UTF-8
  * collation.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(cols.forall(df.columns.contains),
      s"unknown columns: ${cols.filterNot(df.columns.contains).mkString(", ")}")
    // internal aliases are POSITIONAL (__nn_0, __nn_1, ...) so arbitrary
    // user column names never leak into generated identifiers; the one
    // place a name appears in SQL is the stack label literal, escaped
    val aggs = count(lit(1)).as("__rows") +: cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(col(c)).as(s"__nn_$i"), // non-null count
        countDistinct(col(c)).as(s"__nd_$i"),
        min(col(c)).cast("string").as(s"__min_$i"),
        max(col(c)).cast("string").as(s"__max_$i"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    def lab(c: String) = "'" + c.replace("\\", "\\\\").replace("'", "\\'") + "'"
    val stackArgs = cols.zipWithIndex.map { case (c, i) =>
      s"${lab(c)}, __rows - __nn_$i, __nd_$i, __min_$i, __max_$i"
    }.mkString(", ")
    wide.selectExpr(
      "__rows as n_rows",
      s"stack(${cols.size}, $stackArgs) as (col_name, n_nulls, n_distinct, min_value, max_value)")
      .select("col_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
  }
}
