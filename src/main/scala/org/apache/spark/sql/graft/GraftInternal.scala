package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Bridge to the one `private[sql]` constructor the
  * [[graft.operators.Prefix]] operator needs: build a DataFrame from an
  * RDD of InternalRow without a decode/re-encode round-trip through
  * external rows. Lives in the org.apache.spark.sql namespace for
  * access, like the sibling expression registrations.
  */
object GraftInternal {
  def ofRows(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)

  /** A DataFrame over an already-analyzed logical plan — the SQL DML
    * rule ([[graft.sources.v2.GraftSqlExtension]]) carries the MERGE
    * source plan into its eager command this way.
    */
  def ofPlan(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
      DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Wrap a resolved-then-name-rebound expression as a user-facing
    * Column (`private[sql]` in classic; needed to hand SQL DML
    * conditions to the `VersionedTable.*` Column API).
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression):
      org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
