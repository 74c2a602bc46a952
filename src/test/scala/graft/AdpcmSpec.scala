package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Adpcm

/** Contract spec for the IMA-ADPCM decoder: hand-computed state-machine
  * goldens, the clamp/saturation branches the planted corpus provably
  * cannot reach, the closed-form agreement the q120 oracle relies on,
  * and the whole-payload rejection lanes.
  */
class AdpcmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("state-machine goldens: hand-computed nibble steps") {
    // start (pred 0, idx 0, step 7)
    val (p1, i1) = Adpcm.step(0, 0, 7)   // diff = 0+7+3+1 = 11
    assert((p1, i1) === ((11, 8)))
    val (p2, i2) = Adpcm.step(p1, i1, 15) // step 16: diff = 2+16+8+4 = 30
    assert((p2, i2) === ((11 - 30, 16)))
    val (p3, i3) = Adpcm.step(p2, i2, 3)  // step 34: diff = 4+17+8 = 29
    assert((p3, i3) === ((10, 15)))
    val (p4, i4) = Adpcm.step(p3, i3, 0)  // step 31: diff = 3
    assert((p4, i4) === ((13, 14)))
  }

  test("clamps: repeated max-magnitude nibbles saturate the index at 88 " +
      "and the predictor at the int16 rails") {
    val up = Adpcm.imaWavFromBlocks(8000, 52,
      Seq((0, 0, Seq.fill(96)(7))))   // always +max
    val Some((_, n, _, _, mx)) = Adpcm.imaRows(up)
    assert(n === 97L && mx === 32767,
      "rising signal must hit and hold the +32767 clamp")
    val down = Adpcm.imaWavFromBlocks(8000, 52,
      Seq((0, 0, Seq.fill(96)(15))))  // always -max
    val Some((_, _, _, mn2, _)) = Adpcm.imaRows(down)
    assert(mn2 === -32768,
      "falling signal must hit and hold the -32768 clamp")
    // index saturation: after 11 sevens the index pins at 88 and step
    // stays 32767; the decode must not walk past the table
    val pinned = Adpcm.imaWavFromBlocks(8000, 52,
      Seq((0, 88, Seq.fill(96)(7))))
    assert(Adpcm.imaRows(pinned).isDefined)
  }

  test("planted corpus agrees with the q120 closed form, per doc") {
    def closed(id: Long): (Long, Long) = {
      val t = Array(7, 8, 9, 10, 11, 12, 13, 14, 16, 17)
      val i0 = (id % 8).toInt
      val p0 = (id % 1024) - 512
      val nb = 1 + id % 3
      val d1 = t(i0) + (t(i0) >> 3)
      val d2 = -(t(i0 + 2) >> 3)
      val d3 = -(t(i0 + 1) >> 3)
      val sum = 97L * nb * p0 + 97L * 17L * (nb * (nb - 1) / 2) +
        nb * (1520L * (d1 + d2 + d3) + 32L * (2 * d1 + d2))
      (97L * nb, sum)
    }
    (0L until 64L).foreach { id =>
      val Some((sr, n, s, _, _)) = Adpcm.imaRows(Adpcm.imaWavBytes(id))
      val (en, es) = closed(id)
      assert(sr === 8000 + (id % 4).toInt * 8000)
      assert((n, s) === ((en, es)), s"doc $id decode != closed form")
    }
  }

  test("rejection lanes: every envelope violation yields the null row, " +
      "never partial samples") {
    def mutate(f: Array[Byte] => Array[Byte]): Option[_] =
      Adpcm.imaRows(f(Adpcm.imaWavBytes(5L)))
    def patch16(b: Array[Byte], off: Int, v: Int): Array[Byte] = {
      val c = b.clone; c(off) = (v & 0xff).toByte
      c(off + 1) = ((v >> 8) & 0xff).toByte; c
    }
    val base = Adpcm.imaWavBytes(5L)
    assert(Adpcm.imaRows(base).isDefined, "baseline must parse")
    // fmt tag: PCM (0x0001) is not this tier
    assert(mutate(b => patch16(b, 20, 0x0001)).isEmpty, "wrong fmt tag")
    assert(mutate(b => patch16(b, 22, 2)).isEmpty, "stereo rejected")
    assert(mutate(b => patch16(b, 34, 8)).isEmpty, "bits != 4")
    assert(mutate(b => patch16(b, 38, 50)).isEmpty,
      "samplesPerBlock must equal (blockAlign-4)*2+1")
    assert(mutate(_.dropRight(10)).isEmpty,
      "truncated data (not whole blocks)")
    assert(mutate { b =>
      val c = b.clone
      // first block header: predictor(2) idx(1) reserved(1) at data+0
      val dataOff = c.length - 3 * 52 + 2 // doc 5: nb = 3 blocks
      c(dataOff) = 89.toByte; c
    }.isEmpty, "header index > 88")
    assert(mutate { b =>
      val c = b.clone
      c(c.length - 3 * 52 + 3) = 1.toByte; c
    }.isEmpty, "nonzero reserved byte")
    assert(Adpcm.imaRows("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    assert(Adpcm.imaRows(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("the DataFrame op keys rejects visibly and decodes the rest") {
    val ds = Seq(
      (1L, Adpcm.imaWavBytes(1L)),
      (2L, Array[Byte](0, 1, 2, 3)),
      (3L, Adpcm.imaWavBytes(3L))).toDS()
    val rows = Adpcm.adpcmSamples(ds)
      .select("media_id", "n_samples").as[(Long, Option[Long])]
      .collect().toMap
    assert(rows(1L).contains(97L * 2) && rows(3L).isEmpty === false)
    assert(rows(2L).isEmpty, "the corrupt payload is one visible null row")
  }
}
