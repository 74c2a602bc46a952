package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-encoding adaptivity for `documents` / `embeddings` — the
  * same protection `EventsEncodingSpec` gives the events table. Driver
  * testdata drops control the parquet writer, and a pyarrow re-encode
  * (int32 ids, binary-not-utf8 strings, float64 embedding lists) must
  * not change a single answer: `Tables.documents`/`Tables.embeddings`
  * normalize drifted column types to the canonical Spark schema at the
  * scan, and these tests write the SAME logical tables in two physical
  * encodings and require identical q17 (text) and q22 (ANN) results.
  */
class DocsEncodingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 60 deterministic docs; enough token variety that q17's stats are
    * non-trivial (distinct counts differ from totals, empty doc at 0).
    */
  private lazy val docsBase: DataFrame = {
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    (0 until 60).map { i =>
      val text =
        if (i == 0) ""
        else (0 to i % 7).map(j => words((i + j * j) % words.length))
          .mkString(" ")
      (i.toLong, text, if (i % 3 == 0) "en" else "de",
        s"src${i % 4}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** 40 deterministic unit-ish vectors, dim 8 (q22 probes vec_id < 5,
    * k = 10 — well inside the corpus).
    */
  private lazy val embBase: DataFrame = {
    (0 until 40).map { i =>
      val v = (0 until 8).map(d => ((i * 31 + d * 17) % 13 - 6).toFloat / 6f)
      (i.toLong, v, i % 5)
    }.toDF("vec_id", "embedding", "label")
  }

  private def writeDir(table: String, df: DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-denc").toString
    df.write.mode("overwrite").parquet(s"$dir/$table.parquet")
    dir
  }

  // canonical encoding (what the driver ships today) vs a re-encode:
  // narrowed ids/counts, strings as un-annotated BYTE_ARRAY (binary),
  // embeddings as float64 lists with a widened label
  private lazy val docsCanonDir = writeDir("documents", docsBase)
  private lazy val docsDriftDir = writeDir("documents", docsBase.select(
    col("doc_id").cast(IntegerType).as("doc_id"),
    col("text").cast(BinaryType).as("text"),
    col("lang").cast(BinaryType).as("lang"),
    col("source").cast(BinaryType).as("source"),
    col("n_chars").cast(IntegerType).as("n_chars")))
  private lazy val embCanonDir = writeDir("embeddings", embBase)
  private lazy val embDriftDir = writeDir("embeddings", embBase.select(
    col("vec_id").cast(IntegerType).as("vec_id"),
    col("embedding").cast(ArrayType(DoubleType)).as("embedding"),
    col("label").cast(LongType).as("label")))

  test("drifted documents/embeddings normalize to the canonical schema") {
    for (dir <- Seq(docsCanonDir, docsDriftDir)) {
      val d = Tables.documents(spark, dir)
      assert(d.schema("doc_id").dataType === LongType, dir)
      assert(d.schema("text").dataType === StringType, dir)
      assert(d.schema("lang").dataType === StringType, dir)
      assert(d.schema("n_chars").dataType === LongType, dir)
    }
    for (dir <- Seq(embCanonDir, embDriftDir)) {
      val e = Tables.embeddings(spark, dir)
      assert(e.schema("vec_id").dataType === LongType, dir)
      assert(e.schema("embedding").dataType.asInstanceOf[ArrayType]
        .elementType === FloatType, dir)
      assert(e.schema("label").dataType === IntegerType, dir)
    }
    // canonical input is a no-op: no Project is layered over the scan,
    // so pushdown/pruning behavior is exactly the unwrapped scan's
    assert(Tables.documents(spark, docsCanonDir).queryExecution
      .logical.collect { case p: org.apache.spark.sql.catalyst.plans
        .logical.Project => p }.isEmpty,
      "canonical documents must not pay a normalization projection")
  }

  test("q17 token stats agree across document encodings") {
    val canon = SparkEntry.queries("q17_token_stats")(spark, docsCanonDir)
      .collect().map(_.toString).sorted.toSeq
    val drift = SparkEntry.queries("q17_token_stats")(spark, docsDriftDir)
      .collect().map(_.toString).sorted.toSeq
    assert(canon.nonEmpty)
    assert(drift === canon)
  }

  test("q22 brute-force ANN agrees across embedding encodings") {
    // float64→float32 narrowing reproduces the exact canonical floats
    // (the doubles were minted FROM floats), so cosines — computed in
    // the same float pipeline after normalization — are bit-identical
    val canon = SparkEntry.queries("q22_knn_brute")(spark, embCanonDir)
      .collect().map(_.toString).sorted.toSeq
    val drift = SparkEntry.queries("q22_knn_brute")(spark, embDriftDir)
      .collect().map(_.toString).sorted.toSeq
    assert(canon.nonEmpty)
    assert(drift === canon)
  }
}
