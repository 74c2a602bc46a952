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
}
