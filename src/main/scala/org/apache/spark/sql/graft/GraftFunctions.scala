// Same package rationale as GraftExpressions.scala: sessionState /
// SparkSessionExtensions function-injection APIs are private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration of the custom Catalyst expressions, so
  * `spark.sql("SELECT simhash64(...)")` works alongside the Column API.
  *
  * Two paths:
  *   - `GraftFunctions.register(spark)`: imperative, for an existing
  *     session (tests, notebooks).
  *   - `GraftSparkExtensions` via
  *     `spark.sql.extensions=org.apache.spark.sql.graft.GraftSparkExtensions`:
  *     the deployment path — functions exist in every session of the
  *     cluster without code changes.
  */
object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[SimHash64].getName, null, name, usage, "")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a string array"),
      (children: Seq[Expression]) => SimHash64(children.head)),
    (FunctionIdentifier("hamming_distance"),
      info("hamming_distance", "hamming_distance(a, b) - bit distance of two longs"),
      (children: Seq[Expression]) => HammingDistance(children(0), children(1))),
    (FunctionIdentifier("doc_fingerprint"),
      info("doc_fingerprint", "doc_fingerprint(text, window) - winnowing min-hash fingerprint"),
      (children: Seq[Expression]) => children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(w: Int, _) =>
          DocFingerprint(children.head, w)
        case other => throw new IllegalArgumentException(
          s"doc_fingerprint window must be an integer literal, got $other")
      }))

  /** Register into an existing session's function registry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, inf, builder)
    }
}

/** Session-extensions entry point for `spark.sql.extensions`. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach { case (ident, inf, builder) =>
      ext.injectFunction((ident, inf, builder))
    }
}
