package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.GraftExpressions

/** Public face of the native Catalyst expressions (implementations live in
  * org.apache.spark.sql.graft to reach Spark's private[sql] bridge APIs).
  */
object HashExpressions {

  /** 64-bit SimHash of a token array. */
  def simHash64(tokens: Column): Column = GraftExpressions.simHash64(tokens)

  /** Hamming distance between two 64-bit fingerprints. */
  def hammingDistance(a: Column, b: Column): Column =
    GraftExpressions.hammingDistance(a, b)

  /** Winnowing-style min-hash document fingerprint over byte windows. */
  def docFingerprint(text: Column, window: Int): Column =
    GraftExpressions.docFingerprint(text, window)

  /** Full k-function MinHash signature of a shingle-hash array in one
    * tight codegen'd loop (see GraftExpressions.minHashSig).
    */
  def minHashSig(shingles: Column, coeffA: Array[Long], coeffB: Array[Long]): Column =
    GraftExpressions.minHashSig(shingles, coeffA, coeffB)

  /** Word n-gram identity hashes from per-token hashes (native kernel). */
  def ngramHashes(toksh: Column, n: Int): Column =
    GraftExpressions.ngramHashes(toksh, n)

  /** One greedy left-to-right BPE merge step over a symbol array. */
  def pairMerge(syms: Column, mergeLeft: String, mergeRight: String): Column =
    GraftExpressions.pairMerge(syms, mergeLeft, mergeRight)

  /** Dot product of two float/double arrays (native kernel). */
  def vecDot(a: Column, b: Column): Column = GraftExpressions.vecDot(a, b)

  /** One-pass cosine similarity of two float/double arrays. */
  def vecCosine(a: Column, b: Column): Column = GraftExpressions.vecCosine(a, b)

  /** Per-plane dots of a float vector against a literal plane matrix. */
  def vecDotMany(v: Column, planes: Array[Array[Double]]): Column =
    GraftExpressions.vecDotMany(v, planes)

  /** Packed sign-bit hyperplane LSH signature (plane i on bit i). */
  def hyperplaneSig(v: Column, planes: Array[Array[Double]]): Column =
    GraftExpressions.hyperplaneSig(v, planes)
}
