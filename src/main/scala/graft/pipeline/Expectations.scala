package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One named data-quality expectation: the row passes iff `predicate`
  * evaluates to TRUE. SQL three-valued logic is resolved the pipeline
  * way, not the CHECK-constraint way: a NULL predicate is a VIOLATION
  * (retain-on-true), because "we could not prove this row is clean" must
  * quarantine in an ingest gate, never silently pass the way SQL CHECK's
  * accept-on-unknown would.
  */
final case class Expectation(name: String, predicate: Column)

/** Declarative constraint enforcement with a dead-letter side — the
  * ingest quality gate of the curation stack (reference analog: the
  * implicit domain guarantees of the dim load,
  * `sql/breed_mapping.py:19-578`, which trusts its VALUES; a 100-TB
  * crawl ingest cannot, so violations must be explicit and routed, not
  * assumed away).
  *
  * 100-TB design: all three entry points are SINGLE-PASS and map-only or
  * one narrow aggregate. [[annotate]] compiles every rule into one
  * codegen'd projection (an array of conditional literals + a filter
  * kernel — no UDFs, no shuffle); [[split]] is two filters over that
  * projection (Spark reuses the scan; at scale route both sides to
  * writers in one pass via `foreachBatch`/`persist`); [[report]] is one
  * conditional-count aggregate — a single global row, then a driver-side
  * explode of rule names, so no per-rule jobs and no shuffle beyond the
  * final 1-row reduce.
  */
object Expectations {

  private def checked(rules: Seq[Expectation]): Seq[Expectation] = {
    require(rules.nonEmpty, "at least one expectation required")
    val names = rules.map(_.name)
    require(names.distinct.size == names.size,
      "duplicate expectation names: " +
        names.diff(names.distinct).distinct.mkString(", "))
    require(!names.exists(_.contains(",")),
      "expectation names must not contain ',' (they join into reports)")
    rules.sortBy(_.name)
  }

  private def failed(r: Expectation): Column =
    !coalesce(r.predicate, lit(false))

  /** Adds `violations` (the ALPHABETICALLY-SORTED names of failed
    * rules — deterministic output, order-independent of rule
    * declaration) and `is_valid` (no rule failed). Map-only.
    */
  def annotate(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    val rs = checked(rules)
    require(!df.columns.exists(c => c == "violations" || c == "is_valid"),
      "input already has a violations/is_valid column")
    df.withColumn("violations",
        filter(array(rs.map(r => when(failed(r), lit(r.name))): _*),
          _.isNotNull))
      .withColumn("is_valid", size(col("violations")) === 0)
  }

  /** (valid rows — original schema, quarantine rows — original schema +
    * `violations`): the dead-letter routing. Two filters over one
    * annotated projection; at scale persist the annotated frame (or run
    * inside `foreachBatch`) so the source scans once.
    */
  def split(df: DataFrame, rules: Seq[Expectation]): (DataFrame, DataFrame) = {
    val a = annotate(df, rules)
    (a.filter(col("is_valid")).drop("violations", "is_valid"),
      a.filter(!col("is_valid")).drop("is_valid"))
  }

  /** Per-rule violation counts plus the row total: one conditional-count
    * aggregate pass (a single reduced row), exploded to (rule,
    * n_violations, n_rows) on the driver — never one job per rule.
    */
  def report(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    val rs = checked(rules)
    val aggs = count(lit(1)).as("__n") +:
      rs.map(r => count(when(failed(r), 1)).as(s"__v_${r.name}"))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rs.map(r => struct(
          lit(r.name).as("rule"),
          col(s"__v_${r.name}").as("n_violations"))): _*)).as("__r"),
        col("__n").as("n_rows"))
      .select(col("__r.rule"), col("__r.n_violations"), col("n_rows"))
  }
}
