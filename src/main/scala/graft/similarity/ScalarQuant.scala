package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-vector int8 scalar quantization for embedding columns — the
  * memory-bound scale path for similarity search: a 64-dim float32
  * embedding (256 B) becomes 64 uint8 codes + two doubles (~80 B), a
  * ~3.2× scan-bandwidth reduction with NO index structure and no
  * training state (unlike PQ's codebooks in [[Knn]]), so it composes
  * with any of the ANN strategies (brute / LSH / IVF) as a drop-in
  * compressed storage format.
  *
  * Affine min-max quantization, per vector: `scale = (max-min)/255`,
  * `code_i = floor((x_i - min)/scale + 0.5)` clamped to [0, 255]
  * (explicit floor(+0.5) rounding, NOT engine `round()` — half-even vs
  * half-up disagreement across engines would break oracle replay; this
  * form is pure IEEE arithmetic and reproduces bit-exactly anywhere).
  * Constant vectors (max == min) quantize to all-zero codes with
  * scale 0; dequantization reconstructs the constant exactly.
  *
  * Reconstruction error is bounded by scale/2 per element (the rounding
  * half-step), which the gate query asserts as a required-TRUE
  * invariant. Approximate dot products decompose over codes as
  *   dot(a,b) ≈ sa·sb·Σ(ca·cb) + sa·mb·Σca + sb·ma·Σcb + d·ma·mb
  * so the hot loop is integer multiply-add over uint8 codes — the
  * production SIMD story; here the decomposition is expressed with the
  * same HOF folds as the float kernels.
  *
  * Everything is a single codegen'd projection per call: no shuffle, no
  * UDFs, no driver state.
  */
object ScalarQuant {

  /** Quantization scale `(max-min)/255` of a float-array column. */
  def qscale(vec: Column): Column =
    (array_max(vec).cast("double") - array_min(vec).cast("double")) / 255.0

  /** Int codes in [0,255] under per-vector affine min-max quantization.
    * Scale-0 (constant) vectors code to all zeros.
    *
    * `vmin`/`scale` MUST be pre-bound columns (attribute references),
    * not inline `array_min(vec)`/[[qscale]] expressions: an expression
    * embedded in a `transform` lambda is re-evaluated PER ELEMENT
    * (interpreted HOF bodies get no common-subexpression elimination),
    * which turns an O(d) pass into O(d²) array scans per row. Use
    * [[quantize]] — it binds the params in a first projection — or
    * mirror its two-step select.
    */
  def codes(vec: Column, vmin: Column, scale: Column): Column =
    transform(vec, x =>
      when(scale === 0.0, lit(0))
        .otherwise(least(greatest(
          floor((x.cast("double") - vmin) / scale + 0.5), lit(0.0)), lit(255.0))
          .cast("int")))

  /** Dequantized (reconstructed) double array from codes + params. */
  def dequantize(codes: Column, vmin: Column, scale: Column): Column =
    transform(codes, c => vmin + c.cast("double") * scale)

  /** Per-row quantization of `vecCol`: `idCol`, `q_codes` (array<int>,
    * values 0-255), `q_min`, `q_scale`. Carries no other columns — join
    * back on `idCol` if the caller needs them (keeps the projection
    * narrow for the common write-compressed-copy path).
    */
  def quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol)
    df.select(col(idCol), v.as("__v"),
        array_min(v).cast("double").as("q_min"),
        qscale(v).as("q_scale"))
      .select(col(idCol),
        codes(col("__v"), col("q_min"), col("q_scale")).as("q_codes"),
        col("q_min"), col("q_scale"))
  }

  /** Approximate dot product from two quantized representations (codes
    * + per-vector min/scale), via the affine decomposition — integer
    * sums folded in double. Bit-reproducible across engines.
    */
  def approxDot(ca: Column, minA: Column, sA: Column,
      cb: Column, minB: Column, sB: Column): Column = {
    val sumAB = aggregate(zip_with(ca, cb,
        (x, y) => (x * y).cast("long")), lit(0L), (acc, v) => acc + v)
      .cast("double")
    val sumA = aggregate(ca, lit(0L), (acc, v) => acc + v.cast("long"))
      .cast("double")
    val sumB = aggregate(cb, lit(0L), (acc, v) => acc + v.cast("long"))
      .cast("double")
    val d = size(ca).cast("double")
    sA * sB * sumAB + sA * minB * sumA + sB * minA * sumB + d * minA * minB
  }

  /** Worst-case absolute reconstruction error of a vector against its
    * codes: max_i |x_i - (min + code_i·scale)|. The quantization
    * contract bounds this by scale/2 (+ float↔double noise), asserted
    * as a gate invariant.
    */
  def reconError(vec: Column, codes: Column, vmin: Column,
      scale: Column): Column =
    aggregate(zip_with(vec, codes,
        (x, c) => abs(x.cast("double") - (vmin + c.cast("double") * scale))),
      lit(0.0), (acc, e) => greatest(acc, e))
}
