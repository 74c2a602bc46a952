package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns. The hot
  * scalar kernels (dot, cosine) are NATIVE Catalyst expressions
  * (`GraftExpressions.VecDot`/`VecCosine`): one tight double-accumulator
  * loop per row, bit-identical to the declarative `zip_with`/`aggregate`
  * folds they replaced (same index-order accumulation, same IEEE ops —
  * VectorsSpec proves equality). The declarative forms paid an
  * interpreted expression-tree walk PER ELEMENT wherever they sat inside
  * a higher-order function (the IVF quantizer argmax, the hyperplane
  * signature fold) — HOF lambda bodies never reach codegen. Accumulation
  * stays in double (left fold, deterministic order) so results reproduce
  * exactly across engines.
  */
object VectorFunctions {

  /** Dot product with double accumulation (native kernel). */
  def dot(a: Column, b: Column): Column =
    graft.expressions.HashExpressions.vecDot(a, b)

  /** The declarative fold formulation — kept as the independently-derived
    * oracle for VectorsSpec's bit-equality proof of the native kernel.
    */
  private[graft] def dotFold(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double, one pass (native kernel). */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.HashExpressions.vecCosine(a, b)

  /** Declarative cosine — the bit-equality oracle twin of [[cosine]]. */
  private[graft] def cosineFold(a: Column, b: Column): Column = {
    def normFold(v: Column): Column =
      sqrt(aggregate(transform(v, x => x.cast("double") * x.cast("double")),
        lit(0.0), (acc, w) => acc + w))
    dotFold(a, b) / (normFold(a) * normFold(b))
  }

  /** The deterministic plane matrix behind a (dim, nPlanes, seed) triple —
    * the single source of truth for signature and margin kernels, so the
    * same seed always means the same planes on every executor.
    */
  private[graft] def planesFor(dim: Int, nPlanes: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Random-hyperplane LSH signature: packs `nPlanes` sign bits of
    * dot(v, plane_i) into a long (bit i = plane i). Planes are generated
    * deterministically from `seed` (same signature every run / every
    * executor). This is the scale path for similarity search: bucket by
    * signature bands, then verify exact cosine only within candidate
    * buckets.
    *
    * Native kernel (`HyperplaneSig`): ONE loop over planes × elements per
    * row. The previous `aggregate` fold kept the plane walk itself
    * interpreted (HOF lambda bodies never reach codegen), so callers that
    * stack nPlanes × nTables of these paid tree-walk cost per plane;
    * VectorsSpec proves the kernel bit-equal to that fold
    * ([[hyperplaneSignatureFold]]).
    */
  def hyperplaneSignature(v: Column, dim: Int, nPlanes: Int, seed: Long): Column =
    graft.expressions.HashExpressions.hyperplaneSig(v, planesFor(dim, nPlanes, seed))

  /** The declarative fold formulation — kept as the independently-derived
    * oracle for VectorsSpec's bit-equality proof of the native kernel.
    * Planes are traversed reversed so acc*2+bit lands plane 0 on the LSB,
    * matching the kernel's `1L << i` packing bit-for-bit.
    */
  private[graft] def hyperplaneSignatureFold(v: Column, dim: Int, nPlanes: Int, seed: Long): Column = {
    val planesLit = typedLit(planesFor(dim, nPlanes, seed).reverse.map(_.toSeq).toSeq)
    aggregate(planesLit, lit(0L), (acc, p) =>
      acc * 2 + when(dot(v, p) > 0.0, lit(1L)).otherwise(lit(0L)))
  }

  /** Per-plane dot products of `v` against the SAME planes as
    * [[hyperplaneSignature]] for the same (dim, nPlanes, seed) —
    * element i is the margin to the plane behind signature bit i. A
    * small |dot| means the vector sits near that boundary, i.e. a true
    * neighbor most plausibly landed on the other side — the ranking a
    * margin-directed multi-probe flips first. Native kernel
    * (`VecDotMany`); bit-equal to the `transform` twin by VectorsSpec.
    */
  def hyperplaneDots(v: Column, dim: Int, nPlanes: Int, seed: Long): Column =
    graft.expressions.HashExpressions.vecDotMany(v, planesFor(dim, nPlanes, seed))

  /** Declarative twin of [[hyperplaneDots]] — the spec oracle. */
  private[graft] def hyperplaneDotsFold(v: Column, dim: Int, nPlanes: Int, seed: Long): Column =
    transform(typedLit(planesFor(dim, nPlanes, seed).map(_.toSeq).toSeq), p => dot(v, p))
}
