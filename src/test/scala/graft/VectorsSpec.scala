package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

class VectorsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("native dot and cosine bit-equal the declarative folds on real embeddings") {
    val emb = Tables.embeddings(spark, SparkTestSession.sfTiny).limit(200)
    val pairs = emb.select(col("vec_id").as("id_a"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("id_b"), col("embedding").as("b")))
      .filter(col("id_a") < col("id_b")).limit(2000)
    val diff = pairs.select(
        VectorFunctions.dot(col("a"), col("b")).as("d_native"),
        VectorFunctions.dotFold(col("a"), col("b")).as("d_fold"),
        VectorFunctions.cosine(col("a"), col("b")).as("c_native"),
        VectorFunctions.cosineFold(col("a"), col("b")).as("c_fold"))
      .filter(col("d_native") =!= col("d_fold") ||
        col("c_native") =!= col("c_fold"))
    assert(diff.isEmpty, "native kernels diverged from the fold oracles")
  }

  test("native kernels handle the degenerate shapes the folds define") {
    val df = Seq((1L, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("id", "a", "b")
    // plain values
    val d = df.select(VectorFunctions.dot(col("a"), col("b"))).as[Double].head()
    assert(d == 11.0)
    // empty arrays fold to 0.0
    val e = df.select(VectorFunctions.dot(
      array().cast("array<float>"), array().cast("array<float>"))).as[Double].head()
    assert(e == 0.0)
    // length mismatch is null (zip_with pads with null -> null product)
    val m = df.select(VectorFunctions.dot(col("a"),
      array(lit(1.0f)))).as[Option[Double]].head()
    assert(m.isEmpty)
    // a null element poisons the fold -> null
    val n = df.select(VectorFunctions.dot(col("a"),
      array(lit(1.0f), lit(null).cast("float")))).as[Option[Double]].head()
    assert(n.isEmpty)
    // double arrays work too (hyperplane planes are double)
    val dd = df.select(VectorFunctions.dot(col("a"),
      array(lit(0.5), lit(0.25)))).as[Double].head()
    assert(dd == 1.0)
  }

  test("hyperplane signature and margin kernels bit-equal their fold twins") {
    val emb = Tables.embeddings(spark, SparkTestSession.sfTiny).limit(300)
    val dim = emb.select(size(col("embedding"))).as[Int].head()
    val diff = emb.select(
        VectorFunctions.hyperplaneSignature(col("embedding"), dim, 16, seed = 7L).as("s_native"),
        VectorFunctions.hyperplaneSignatureFold(col("embedding"), dim, 16, seed = 7L).as("s_fold"),
        VectorFunctions.hyperplaneDots(col("embedding"), dim, 16, seed = 7L).as("d_native"),
        VectorFunctions.hyperplaneDotsFold(col("embedding"), dim, 16, seed = 7L).as("d_fold"))
      .filter(col("s_native") =!= col("s_fold") || col("d_native") =!= col("d_fold"))
    assert(diff.isEmpty, "hyperplane kernels diverged from the fold oracles")
  }

  test("hyperplane kernels stay inside whole-stage codegen") {
    val emb = Tables.embeddings(spark, SparkTestSession.sfTiny).limit(10)
    val plan = emb.select(
        VectorFunctions.hyperplaneSignature(col("embedding"), 16, 12, seed = 3L).as("s"))
      .queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[hyperplane_sig""".r.findFirstIn(plan).isDefined,
      s"hyperplane_sig must not break codegen:\n$plan")
  }

  test("vec kernels run inside whole-stage codegen, not as fallback eval") {
    val emb = Tables.embeddings(spark, SparkTestSession.sfTiny).limit(10)
    val plan = emb.select(VectorFunctions.cosine(col("embedding"), col("embedding")).as("c"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert("""\*\(\d+\) Project \[vec_cosine""".r.findFirstIn(plan).isDefined,
      s"vec_cosine must not break codegen:\n$plan")
  }
}
