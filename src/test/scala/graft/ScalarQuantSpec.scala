package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.ScalarQuant

/** Contract spec for int8 scalar quantization: code construction
  * (floor(+0.5) rounding, clamping, scale-0 constants), the half-step
  * reconstruction bound, and the integer-decomposed approximate dot.
  * The oracle gate (q107) replays the full arithmetic in DuckDB over
  * the real embeddings table.
  */
class ScalarQuantSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def quantRow(v: Seq[Float]) =
    ScalarQuant.quantize(Seq((1L, v)).toDF("id", "vec"), "id", "vec")
      .as[(Long, Seq[Int], Double, Double)].collect().head

  test("codes hit the endpoints and round to nearest") {
    val (_, codes, qmin, qscale) = quantRow(Seq(0f, 1f, 0.5f, 0.25f))
    assert(qmin === 0.0 && qscale === 1.0 / 255.0)
    assert(codes === Seq(0, 255, 128, 64),
      "0.5/(1/255)=127.5 floors(+0.5) to 128; 0.25 → 63.75+0.5 → 64")
  }

  test("constant vectors quantize to zero codes with zero scale") {
    val (_, codes, qmin, qscale) = quantRow(Seq(2.5f, 2.5f, 2.5f))
    assert(codes === Seq(0, 0, 0) && qscale === 0.0 && qmin === 2.5)
  }

  test("reconstruction error is bounded by half a quantization step") {
    val vecs = Seq(
      Seq(-1.0f, 0.37f, 0.92f, -0.11f, 0.5f),
      Seq(3f, 3f, 3f), // constant
      (1 to 64).map(i => (math.sin(i * 0.7) * 2).toFloat))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "vec")
    val v = col("vec")
    val checked = df
      .select(v, array_min(v).cast("double").as("mn"),
        ScalarQuant.qscale(v).as("s"))
      .select(
        ScalarQuant.reconError(v,
          ScalarQuant.codes(v, col("mn"), col("s")),
          col("mn"), col("s")).as("err"),
        col("s"))
      .as[(Double, Double)].collect()
    checked.foreach { case (err, s) =>
      assert(err <= s / 2 + 1e-9, s"recon err $err exceeds half-step ${s / 2}")
    }
  }

  test("approx dot tracks the exact dot within the decomposition bound") {
    val a = (1 to 64).map(i => (math.cos(i * 0.3)).toFloat)
    val b = (1 to 64).map(i => (math.sin(i * 0.5) * 0.8).toFloat)
    val df = Seq((a, b)).toDF("a", "b")
      .select(col("a"), col("b"),
        array_min(col("a")).cast("double").as("mna"),
        ScalarQuant.qscale(col("a")).as("sa"),
        array_min(col("b")).cast("double").as("mnb"),
        ScalarQuant.qscale(col("b")).as("sb"))
    val qa = ScalarQuant.codes(col("a"), col("mna"), col("sa"))
    val qb = ScalarQuant.codes(col("b"), col("mnb"), col("sb"))
    val (approx, exact, sa, sb) = df.select(
      ScalarQuant.approxDot(qa, col("mna"), col("sa"),
        qb, col("mnb"), col("sb")).as("ad"),
      graft.functions.VectorFunctions.dot(col("a"), col("b")).as("ed"),
      col("sa"), col("sb"))
      .as[(Double, Double, Double, Double)].collect().head
    // |a_i| ≤ 1, |b_i| ≤ 0.8, d=64: error ≤ d·(sa/2·max|b| + sb/2·max|a|
    // + sa·sb/4) — generous envelope, still ~1e-1 tight at int8 steps
    val bound = 64 * (sa / 2 * 0.8 + sb / 2 * 1.0 + sa * sb / 4) + 1e-9
    assert(math.abs(approx - exact) <= bound,
      s"approx $approx vs exact $exact exceeds bound $bound")
  }

  test("dequantize round-trips codes exactly and constants exactly") {
    val got = Seq((1L, Seq(4f, 8f, 6f)))
      .toDF("id", "vec")
      .select(col("vec"), array_min(col("vec")).cast("double").as("mn"),
        ScalarQuant.qscale(col("vec")).as("s"))
      .select(ScalarQuant.dequantize(
        ScalarQuant.codes(col("vec"), col("mn"), col("s")),
        col("mn"), col("s")).as("r"))
      .as[Seq[Double]].collect().head
    assert(math.abs(got(0) - 4.0) < 1e-9 && math.abs(got(1) - 8.0) < 1e-9)
    assert(math.abs(got(2) - 6.0) <= (4.0 / 255.0) / 2 + 1e-12)
  }
}
