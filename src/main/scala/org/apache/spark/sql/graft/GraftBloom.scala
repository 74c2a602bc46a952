// Lives under org.apache.spark.sql to reach the catalyst bloom
// expressions (BloomFilterAggregate / BloomFilterMightContain) that back
// Spark's own runtime row-level filtering but are not registered in the
// public FunctionRegistry. Column-level wrappers only; re-exported for
// users via graft.operators.BloomJoin.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

object GraftBloom {

  /** Aggregate a bloom filter over `keyHash` (must be an xxhash64-style
    * LONG — the same contract Spark's injected runtime filters use).
    * Returns the serialized filter as BINARY.
    */
  def bloomAgg(keyHash: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(new BloomFilterAggregate(
      ExpressionUtils.expression(keyHash),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against a driver-collected serialized bloom filter
    * (shipped to executors as a foldable BINARY literal, so the probe
    * evaluates at the SCAN, before any exchange).
    */
  def mightContain(bloom: Array[Byte], keyHash: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), ExpressionUtils.expression(keyHash)))
}
