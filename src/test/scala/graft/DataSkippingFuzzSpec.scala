package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.sources.VersionedTable

/** Property fuzz for the data-skipping analyzer: random predicate
  * trees over an adversarial table layout (all-null file, NaN file,
  * ±Infinity, -0.0, duplicated range boundaries, empty and multi-byte
  * strings, cross-type literals). The invariant under test is the only
  * one that matters — for EVERY predicate, the pruned read equals the
  * unpruned read+filter row-for-row, and countBounds brackets the true
  * count. Raw ScalaCheck with a pinned seed (the scalatest bridge
  * isn't in the offline dependency cache).
  */
class DataSkippingFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-skipfuzz").toString
    def frame(rows: Seq[(Long, Double, String, Option[Long])]) =
      rows.toDF("k", "d", "s", "n").coalesce(1)
    val stats = Seq("k", "d", "s", "n")
    // file 1: low range, plain ascii
    VersionedTable.create(frame(
      (0L until 50L).map(i => (i, i / 10.0, s"s$i", Some(i)))), d, stats)
    // file 2: high range, multi-byte strings, shares boundary k=1000
    VersionedTable.append(frame(
      (1000L to 1049L).map(i =>
        (i, i * 1.5, if (i % 2 == 0) s"é$i" else s"😀$i", Some(i)))),
      d, stats)
    // file 3: the pathological one — NaN, ±Inf, -0.0, all-null n, ""
    VersionedTable.append(frame(Seq(
      (500L, Double.NaN, "", None),
      (501L, Double.PositiveInfinity, "zz", None),
      (502L, Double.NegativeInfinity, "é", None),
      (503L, -0.0, " x", None),
      (504L, 0.0, "s25", None))), d, stats)
    // file 4: duplicated boundaries of files 1 and 2
    VersionedTable.append(frame(Seq(
      (49L, 4.9, "s49", Some(49L)),
      (1000L, 1500.0, "é1000", None))), d, stats)
    // round 16: every random predicate now ALSO fuzzes the bloom
    // equality pruning (k long-domain, s string-domain incl. multi-byte
    // and empty strings) and the deletion-vector anti-filter (two rows
    // soft-deleted, one in the plain-ascii file, one in the multi-byte
    // file) — pruned ≡ unpruned and countBounds bracketing must hold
    // over the composed read path
    VersionedTable.analyzeBloom(spark, d, Seq("k", "s"))
    VersionedTable.deleteWithDv(spark, d,
      col("k").isin(25L, 1020L), densityThreshold = 0.99)
    d
  }

  private val longLit: Gen[Long] =
    Gen.oneOf(0L, 25L, 49L, 50L, 499L, 500L, 504L, 999L, 1000L, 1049L, -1L)
  private val dblLit: Gen[Double] =
    Gen.oneOf(0.0, -0.0, 1.5, 4.9, 100.0, 1500.0, -1e308, 1e308,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
  private val strLit: Gen[String] =
    Gen.oneOf("", "a", "s25", "s49", "zz", "é", "é1000", "😀", " ", "\uFFFF")

  private def cmp(c: Column, lit0: Column): Gen[Column] = Gen.oneOf(
    c === lit0, c =!= lit0, c < lit0, c <= lit0, c > lit0, c >= lit0,
    c <=> lit0)

  private val leaf: Gen[Column] = Gen.oneOf(
    longLit.flatMap(v => cmp(col("k"), lit(v))),
    dblLit.flatMap(v => cmp(col("d"), lit(v))),
    strLit.flatMap(v => cmp(col("s"), lit(v))),
    longLit.flatMap(v => cmp(col("n"), lit(v))),
    strLit.map(p => col("s").startsWith(p)),
    Gen.listOfN(3, longLit).map(vs => col("k").isin(vs.map(Long.box): _*)),
    Gen.oneOf(col("n").isNull, col("n").isNotNull,
      col("n") <=> lit(null),
      col("k") === lit(7.5),          // cross-type fractional: bail path
      col("d") === lit(0L),           // double col vs integral literal
      col("k") + 1L === lit(50L)))    // arithmetic: unknown shape

  private def tree(depth: Int): Gen[Column] =
    if (depth <= 0) leaf
    else Gen.frequency(
      3 -> leaf,
      2 -> Gen.zip(tree(depth - 1), tree(depth - 1)).map(t => t._1 && t._2),
      2 -> Gen.zip(tree(depth - 1), tree(depth - 1)).map(t => t._1 || t._2),
      1 -> tree(depth - 1).map(!_))

  test("property: pruned read ≡ unpruned filter and countBounds brackets, for random predicate trees") {
    val table = VersionedTable.read(spark, dir).cache()
    try {
      val p = Prop.forAll(tree(2)) { pred =>
        val pruned = VersionedTable.readWhere(spark, dir, pred)
          .collect().map(_.toString).sorted.toSeq
        val full = table.filter(pred).collect().map(_.toString).sorted.toSeq
        val n = full.size.toLong
        val bracket = VersionedTable.countBounds(spark, dir, pred) match {
          case Some((lo, hi)) => lo <= n && n <= hi
          case None => false // all files carry stats here: bounds must exist
        }
        if (pruned != full) println(s"MISMATCH for $pred:\n  pruned=$pruned\n  full=$full")
        if (!bracket) println(s"BOUNDS MISS for $pred: n=$n bounds=" +
          VersionedTable.countBounds(spark, dir, pred))
        pruned == full && bracket
      }
      val res = SCTest.check(
        SCTest.Parameters.default
          .withMinSuccessfulTests(60).withInitialSeed(42L), p)
      assert(res.passed, s"skipping soundness fuzz: ${res.status}")
    } finally table.unpersist()
  }
}
