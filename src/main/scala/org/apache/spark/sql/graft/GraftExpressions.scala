// This file lives under org.apache.spark.sql so it can use the
// Catalyst bridge APIs (ExpressionUtils, AbstractDataType) that Spark 4
// scopes private[sql] — the standard pattern for libraries that ship
// native Catalyst expressions. Only `GraftExpressions`' Column-level
// functions are meant for users (re-exported via graft.expressions).
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup/fingerprint family. Per-row
  * scalar computations with full `doGenCode` (static-call codegen) so they
  * stay inside WholeStageCodegen — one tight loop per row, no boxing, no
  * UDF serialization. The hot path at 100 TB.
  */
object GraftExpressions {
  private[graft] val SEED = 42L

  /** 64-bit SimHash of a token array (Charikar's similarity-preserving
    * fingerprint): per-token XXH64, each bit votes +1/-1, sign of the vote
    * becomes the output bit. Near-duplicate docs land at small Hamming
    * distance.
    */
  def simHash64(tokens: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(tokens)))

  /** Hamming distance between two 64-bit fingerprints. */
  def hammingDistance(a: Column, b: Column): Column =
    ExpressionUtils.column(
      HammingDistance(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Winnowing-style document fingerprint: minimum XXH64 over every
    * `window`-byte sliding window of the UTF-8 text. Shift-invariant: an
    * unchanged region >= `window` bytes yields the same candidate hashes
    * regardless of position in the doc.
    */
  def docFingerprint(text: Column, window: Int): Column =
    ExpressionUtils.column(DocFingerprint(ExpressionUtils.expression(text), window))

  // ----- static helpers invoked from both eval and generated code -----

  def computeSimHash(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, SEED)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def computeFingerprint(s: UTF8String, window: Int): Long = {
    val bytes = s.getBytes
    if (bytes.length <= window) {
      XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, SEED)
    } else {
      var min = Long.MaxValue
      var i = 0
      val last = bytes.length - window
      while (i <= last) {
        val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + i, window, SEED)
        if (h < min) min = h
        i += 1
      }
      min
    }
  }
}

case class SimHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    GraftExpressions.computeSimHash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.GraftExpressions.computeSimHash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_distance"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingDistance =
    copy(left = l, right = r)
}

case class DocFingerprint(child: Expression, window: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(window > 0, "window must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "doc_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    GraftExpressions.computeFingerprint(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.GraftExpressions.computeFingerprint($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): DocFingerprint =
    copy(child = newChild)
}
