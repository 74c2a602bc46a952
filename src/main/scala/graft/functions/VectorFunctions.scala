package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, built from
  * `zip_with`/`aggregate`/`transform` so Catalyst codegens the loops —
  * no UDF boxing. Accumulation is in double (left fold, deterministic
  * order) so results reproduce exactly across engines.
  */
object VectorFunctions {

  /** Dot product with double accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity in double. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

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
