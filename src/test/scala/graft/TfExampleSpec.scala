package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TfExample
import graft.sources.TfExample.{BytesL, FloatL, IntL}

/** The tf.Example decoder's load-bearing claims: wire-format
  * correctness (varints, packed vs unpacked lists, LE float32),
  * protobuf's unknown-field robustness rule (skip, never error), and
  * loud rejection of structural violations.
  */
class TfExampleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(b: Array[Byte]) = TfExample.tfExampleRows(b)

  test("planted corpus round trip recovers the q117 formula exactly " +
      "(packed+unpacked lists, unknown fields all in-corpus)") {
    val docs = Tables.documents(spark, SparkTestSession.sfTiny)
    val out = TfExample.tfExampleFeatures(
        TfExample.fromDocumentsTfExample(docs))
      .as[(Long, Option[String], Option[String], Option[Long],
        Option[Double])].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (id, rs) =>
      assert(rs.length === 3, s"doc $id feature count")
      val byKey = rs.map(r => r._2.get -> ((r._3.get, r._4.get,
        r._5.get))).toMap
      val ntok = TfExample.plantedNTokens(id)
      assert(byKey("tokens") === (("int64", ntok.toLong,
        (0 until ntok).map(j => TfExample.plantedInt(id, j)).sum
          .toDouble)), s"doc $id tokens")
      val nsc = TfExample.plantedNScores(id)
      assert(byKey("score") === (("float", nsc.toLong,
        (0 until nsc).map(j =>
          TfExample.plantedFloat(id, j).toDouble).sum)), s"doc $id score")
      val tl1 = TfExample.plantedTextLen(id)
      val tl2 = (5 + id % 7).toInt
      val bsum = (0 until tl1).map(j =>
        TfExample.plantedByteV(id, j).toLong).sum +
        (0 until tl2).map(j => TfExample.plantedByteV(id + 1, j).toLong).sum
      assert(byKey("text") === (("bytes", (tl1 + tl2).toLong,
        bsum.toDouble)), s"doc $id text")
    }
  }

  test("packed and unpacked encodings of the same list decode " +
      "identically") {
    val vals = Seq(0L, 1L, 127L, 128L, 300L, 999999L)
    for (packed <- Seq(true, false); unknown <- Seq(true, false)) {
      val b = TfExample.exampleBytes(
        Seq("v" -> IntL(vals, packed)), plantUnknown = unknown)
      assert(rows(b) === Some(Seq(("v", "int64", vals.length.toLong,
        vals.sum.toDouble))), s"packed=$packed unknown=$unknown")
    }
    for (packed <- Seq(true, false)) {
      val fs = Seq(1.5f, -2.25f, 100f)
      val b = TfExample.exampleBytes(
        Seq("f" -> FloatL(fs, packed)), plantUnknown = false)
      assert(rows(b) === Some(Seq(("f", "float", 3L,
        fs.map(_.toDouble).sum))), s"float packed=$packed")
    }
  }

  test("multi-byte varints and empty byte strings are exact") {
    val big = Seq((1L << 40) + 12345L, 0L)
    val b = TfExample.exampleBytes(Seq(
      "big" -> IntL(big, packed = true),
      "empty" -> BytesL(Seq(Array.empty[Byte], "x".getBytes("UTF-8")))),
      plantUnknown = false)
    assert(rows(b) === Some(Seq(
      ("big", "int64", 2L, big.sum.toDouble),
      ("empty", "bytes", 1L, 'x'.toLong.toDouble))))
  }

  test("rejection lane: structural violations reject; unknown fields " +
      "never do") {
    val ok = TfExample.exampleBytes(
      Seq("k" -> IntL(Seq(1L, 2L, 3L), packed = true)),
      plantUnknown = true)
    assert(rows(ok).exists(_.length == 1))

    // truncation mid-message
    assert(rows(ok.dropRight(3)) === None, "truncated")

    // a varint that never terminates (11 continuation bytes)
    val runaway = Array.fill[Byte](11)(0x80.toByte)
    assert(rows(runaway) === None, "runaway varint")

    // length past the buffer: flip the Features length up
    val badLen = ok.clone
    badLen(1) = (badLen(1) + 40).toByte // outer field-1 length varint
    assert(rows(badLen) === None, "length past buffer")

    // empty Feature (no oneof member set)
    val emptyFeature = {
      // Example{1: Features{1: entry{1: "k", 2: Feature{}}}}
      val entry = Array[Byte](0x0a, 0x01, 'k'.toByte, 0x12, 0x00)
      val features = Array[Byte](0x0a, entry.length.toByte) ++ entry
      Array[Byte](0x0a, features.length.toByte) ++ features
    }
    assert(rows(emptyFeature) === None, "empty feature oneof")

    // group wire types (3/4) are out of envelope
    val group = Array[Byte](0x0b) // field 1, wire type 3
    assert(rows(group) === None, "group wire type")

    // empty example is valid: zero features
    assert(rows(Array.empty[Byte]) === Some(Seq()))

    // rejection visible in the DataFrame op
    val df = TfExample.tfExampleFeatures(
      spark.createDataset(Seq((6L, runaway))))
    val r = df.collect()
    assert(r.length === 1 && r(0).getLong(0) === 6L && r(0).isNullAt(1))
  }
}
