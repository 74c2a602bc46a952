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

  /** Random-hyperplane LSH signature: packs `nPlanes` sign bits of
    * dot(v, plane_i) into a long (bit i = plane i). Planes are generated
    * deterministically from `seed` (same signature every run / every
    * executor). This is the scale path for similarity search: bucket by
    * signature bands, then verify exact cosine only within candidate
    * buckets.
    *
    * One `aggregate` fold over the planes as a literal array — unrolling
    * a `when(dot(...))` per plane generated a large codegen method per
    * plane (compile/JIT dominated the arithmetic when callers stack
    * nPlanes × nTables of these). Planes are traversed reversed so
    * acc*2+bit lands plane 0 on the LSB, matching the unrolled values
    * bit-for-bit.
    */
  def hyperplaneSignature(v: Column, dim: Int, nPlanes: Int, seed: Long): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
    val planesLit = typedLit(planes.reverse.map(_.toSeq).toSeq)
    aggregate(planesLit, lit(0L), (acc, p) =>
      acc * 2 + when(dot(v, p) > 0.0, lit(1L)).otherwise(lit(0L)))
  }

  /** Per-plane dot products of `v` against the SAME planes as
    * [[hyperplaneSignature]] for the same (dim, nPlanes, seed) —
    * element i is the margin to the plane behind signature bit i. A
    * small |dot| means the vector sits near that boundary, i.e. a true
    * neighbor most plausibly landed on the other side — the ranking a
    * margin-directed multi-probe flips first.
    */
  def hyperplaneDots(v: Column, dim: Int, nPlanes: Int, seed: Long): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
    transform(typedLit(planes.map(_.toSeq).toSeq), p => dot(v, p))
  }
}
