package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Flac

/** Contract spec for the FLAC fixed-predictor decoder. The planted
  * corpus only ever emits affine signals under order-2 (residuals all
  * zero), so this spec builds streams with a general test-side encoder
  * to reach everything else: polynomial signals pin each predictor
  * order INDEPENDENTLY (a degree-k polynomial has zero (k+1)-th
  * differences, so its closed-form sum catches a wrong predictor
  * formula that a pure encode/decode round-trip would cancel),
  * non-zero rice residuals exercise real quotients/remainders, and the
  * rejection lanes cover both CRCs, LPC subframes, truncation, and
  * shape mismatches against STREAMINFO.
  */
class FlacSpec extends AnyFunSuite {

  // ------------------------------------------------- test-side encoder

  /** Encode `samples` as one mono FLAC stream of fixed-blocksize
    * frames, general where the corpus writer is specialized: any fixed
    * order 0-4, CONSTANT (order = -1) or VERBATIM (order = -2), rice
    * method 0 or 1, any partition order, real rice coding of whatever
    * residuals the signal produces, optional wasted bits.
    */
  private def encode(samples: Seq[Long], blockSize: Int, order: Int,
      method: Int = 0, pOrder: Int = 0, bps: Int = 16, wasted: Int = 0,
      srCode: Int = 4, sampleRate: Int = 8000,
      breakCrc8: Boolean = false, breakCrc16: Boolean = false,
      reservedType: Boolean = false, channels: Int = 1,
      totalOverride: Long = -1L,
      lpc: (Seq[Long], Int, Int) = null): Array[Byte] = {
    require(samples.length % blockSize == 0)
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    val si = new Flac.BitWriter
    si.bits(1, 1); si.bits(0, 7); si.bits(34, 24)
    si.bits(blockSize.toLong, 16); si.bits(blockSize.toLong, 16)
    si.bits(0, 24); si.bits(0, 24)
    si.bits(sampleRate.toLong, 20)
    si.bits((channels - 1).toLong, 3)
    si.bits((bps - 1).toLong, 5)
    si.bits(if (totalOverride >= 0) totalOverride else samples.length.toLong,
      36)
    (0 until 16).foreach(_ => si.bits(0, 8))
    out.write(si.toBytes)
    val bsCode = blockSize match {
      case 192 => 1
      case n if n <= 256 => 6 // 8-bit follow
      case _ => 7             // 16-bit follow
    }
    val ssCode = bps match {
      case 8 => 1; case 12 => 2; case 16 => 4; case 20 => 5; case 24 => 6
    }
    samples.grouped(blockSize).zipWithIndex.foreach { case (blk0, fi) =>
      // encoder-side wasted bits: signal must be divisible by 2^wasted
      val blk = blk0.map { s =>
        require(wasted == 0 || s % (1L << wasted) == 0); s >> wasted }
      val eff = bps - wasted
      val w = new Flac.BitWriter
      w.bits(0x3ffe, 14); w.bits(0, 1); w.bits(0, 1)
      w.bits(bsCode.toLong, 4); w.bits(srCode.toLong, 4)
      w.bits(0, 4); w.bits(ssCode.toLong, 3); w.bits(0, 1)
      if (fi < 128) w.bits(fi.toLong, 8)
      else { // 2-byte UTF-8
        w.bits(0xc0L | (fi >> 6), 8); w.bits(0x80L | (fi & 0x3f), 8)
      }
      if (bsCode == 6) w.bits((blockSize - 1).toLong, 8)
      if (bsCode == 7) w.bits((blockSize - 1).toLong, 16)
      w.alignToByte()
      val hdr = w.toBytes
      val w2 = new Flac.BitWriter
      hdr.foreach(x => w2.bits(x & 0xffL, 8))
      val c8 = Flac.crc8(hdr, 0, hdr.length) ^ (if (breakCrc8) 1 else 0)
      w2.bits(c8.toLong, 8)
      w2.bits(0, 1) // subframe pad
      if (reservedType) {
        w2.bits(2L, 6); w2.bits(0, 1) // type 000010: reserved
        w2.bits(0, eff)
      } else if (lpc != null) { // LPC: quantized coefficients + shift
        val (coefs, shift, prec) = lpc
        val ord = coefs.length
        w2.bits(32L + (ord - 1), 6)
        w2.bits(0, 1) // no wasted bits on the LPC lane
        (0 until ord).foreach(i => w2.bits(blk(i) & ((1L << eff) - 1), eff))
        w2.bits((prec - 1).toLong, 4)
        w2.bits(shift.toLong & 0x1fL, 5)
        coefs.foreach(c => w2.bits(c & ((1L << prec) - 1), prec))
        // residual = s(t) - (Σ c_j·s(t-1-j) >> shift), the decoder's
        // exact integer inverse — round-trips ANY signal bit-exactly
        val res = (ord until blockSize).map { t =>
          val acc = (0 until ord).map(j => coefs(j) * blk(t - 1 - j)).sum
          blk(t) - (acc >> math.max(shift, 0))
        }
        w2.bits(method.toLong, 2)
        w2.bits(pOrder.toLong, 4)
        val parts = 1 << pOrder
        val kBits = if (method == 0) 4 else 5
        var idx = 0
        (0 until parts).foreach { pi =>
          val cnt = blockSize / parts - (if (pi == 0) ord else 0)
          val chunk = res.slice(idx, idx + cnt); idx += cnt
          val k = (0 to 14).find(k0 =>
            chunk.forall(r => ((r << 1) ^ (r >> 63)) >> k0 < 48))
            .getOrElse(14)
          w2.bits(k.toLong, kBits)
          chunk.foreach { r =>
            val u = (r << 1) ^ (r >> 63)
            val q = (u >>> k).toInt
            (0 until q).foreach(_ => w2.bits(0, 1))
            w2.bits(1, 1)
            if (k > 0) w2.bits(u & ((1L << k) - 1), k)
          }
        }
      } else if (order == -1) { // CONSTANT
        w2.bits(0, 6); w2.bits(0, 1)
        w2.bits(blk.head & ((1L << eff) - 1), eff)
      } else if (order == -2) { // VERBATIM
        w2.bits(1, 6); w2.bits(0, 1)
        blk.foreach(s => w2.bits(s & ((1L << eff) - 1), eff))
      } else {
        w2.bits((8 + order).toLong, 6)
        if (wasted == 0) w2.bits(0, 1)
        else { // flag + unary(wasted - 1): zeros then a one
          w2.bits(1, 1)
          (0 until wasted - 1).foreach(_ => w2.bits(0, 1))
          w2.bits(1, 1)
        }
        (0 until order).foreach(i =>
          w2.bits(blk(i) & ((1L << eff) - 1), eff))
        val res = (order until blockSize).map { t =>
          blk(t) - (order match {
            case 0 => 0L
            case 1 => blk(t - 1)
            case 2 => 2 * blk(t - 1) - blk(t - 2)
            case 3 => 3 * blk(t - 1) - 3 * blk(t - 2) + blk(t - 3)
            case 4 => 4 * blk(t - 1) - 6 * blk(t - 2) +
              4 * blk(t - 3) - blk(t - 4)
          })
        }
        w2.bits(method.toLong, 2)
        w2.bits(pOrder.toLong, 4)
        val parts = 1 << pOrder
        val kBits = if (method == 0) 4 else 5
        var idx = 0
        (0 until parts).foreach { pi =>
          val cnt = blockSize / parts - (if (pi == 0) order else 0)
          val chunk = res.slice(idx, idx + cnt); idx += cnt
          // pick the smallest k whose quotients stay tiny
          val k = (0 to 14).find(k0 =>
            chunk.forall(r => ((r << 1) ^ (r >> 63)) >> k0 < 48))
            .getOrElse(14)
          w2.bits(k.toLong, kBits)
          chunk.foreach { r =>
            val u = (r << 1) ^ (r >> 63) // zigzag
            val q = (u >>> k).toInt
            (0 until q).foreach(_ => w2.bits(0, 1))
            w2.bits(1, 1)
            if (k > 0) w2.bits(u & ((1L << k) - 1), k)
          }
        }
      }
      w2.alignToByte()
      val body = w2.toBytes
      out.write(body)
      val c16 = Flac.crc16(body, 0, body.length) ^ (if (breakCrc16) 1 else 0)
      out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
    }
    out.toByteArray
  }

  private def decode(b: Array[Byte]) = Flac.flacRows(b)

  // -------------------------------------------------------- the tests

  test("corpus round trip matches the closed form the oracle replays") {
    // ids cover both predictor spellings: odd (id+frame) parities plant
    // LPC subframes ((8,-4)>>2, or (4,-2)>>1 when id%11=0) alongside
    // fixed-order-2 ones in the same stream — the closed form is
    // spelling-invariant by construction
    Seq(0L, 1L, 7L, 11L, 42L, 444L, 1023L).foreach { id =>
      val a = (id % 1024) - 512
      val d = (id % 7) - 3
      val n = 192L * (1 + id % 3)
      val Some((sr, got_n, sum, mn, mx)) = decode(Flac.flacBytes(id))
      assert(sr === Seq(8000, 16000, 22050, 24000)((id % 4).toInt))
      assert(got_n === n)
      assert(sum === n * a + d * n * (n - 1) / 2, s"id=$id")
      assert(mn === math.min(a, a + d * (n - 1)))
      assert(mx === math.max(a, a + d * (n - 1)))
    }
  }

  test("polynomial signals pin each fixed predictor order independently") {
    // degree-k polynomial → zero residuals at order k+1; the decoded
    // sum must equal the polynomial's closed-form sum, which a wrong
    // predictor formula cannot reproduce (encode/decode both use the
    // formula, but zero residuals mean reconstruction IS the formula)
    def check(sig: Int => Long, order: Int, n: Int): Unit = {
      val s = (0 until n).map(t => sig(t))
      val Some((_, cnt, sum, _, _)) = decode(encode(s, n, order))
      assert(cnt === n.toLong)
      assert(sum === s.sum, s"order $order")
    }
    check(_ => 37L, 0, 192)                          // constant
    check(t => 5L + 3 * t, 1, 192)                   // affine
    val q = (t: Int) => (t - 96L) * (t - 96L) - 5000L // |.| ≤ 9216
    check(q, 3, 192)                                 // quadratic, order 3
    val c = (t: Int) => (t - 16L) * (t - 16L) * (t - 16L) // |.| ≤ 4096
    check(c, 4, 32)                                  // cubic, order 4
    // order-2 with a quadratic: residuals CONSTANT (2), real rice work
    check(q, 2, 192)
  }

  test("non-zero residuals: noisy signal round-trips through real rice quotients, both methods, deep partitions") {
    val rnd = new scala.util.Random(7)
    val n = 192
    var acc = 100L
    val sig = (0 until n).map { _ => acc += rnd.nextInt(61) - 30; acc }
    Seq((0, 0), (0, 2), (1, 0), (1, 4)).foreach { case (m, p) =>
      val Some((_, cnt, sum, mn, mx)) =
        decode(encode(sig, n, order = 1, method = m, pOrder = p))
      assert(cnt === n.toLong && sum === sig.sum &&
        mn === sig.min && mx === sig.max, s"method=$m pOrder=$p")
    }
  }

  test("CONSTANT and VERBATIM subframes decode") {
    val n = 192
    val Some((_, _, cSum, cMn, cMx)) =
      decode(encode(Seq.fill(n)(-123L), n, order = -1))
    assert(cSum === -123L * n && cMn === -123L && cMx === -123L)
    val sig = (0 until n).map(t => (t * 7 % 256 - 128).toLong)
    val Some((_, _, vSum, _, _)) = decode(encode(sig, n, order = -2))
    assert(vSum === sig.sum)
  }

  test("wasted bits shift back in") {
    val n = 192
    val sig = (0 until n).map(t => (t * 8).toLong) // divisible by 8
    val Some((_, _, sum, _, mx)) =
      decode(encode(sig, n, order = 1, wasted = 3))
    assert(sum === sig.sum && mx === sig.max)
  }

  test("8- and 16-bit blocksize follow-ups and multi-frame streams with 2-byte UTF-8 frame numbers") {
    val bs = 8
    val frames = 130 // frame numbers cross the 1-byte UTF-8 boundary
    val sig = (0 until bs * frames).map(t => (t % 100).toLong)
    val Some((_, cnt, sum, _, _)) = decode(encode(sig, bs, order = 0))
    assert(cnt === sig.length.toLong && sum === sig.sum)
    val big = (0 until 600).map(t => (t % 50).toLong)
    val Some((_, cnt2, sum2, _, _))= decode(encode(big, 300, order = 1))
    assert(cnt2 === 600L && sum2 === big.sum)
  }

  test("other bit depths decode (8-bit shallow, 24-bit deep)") {
    val n = 192
    val s8 = (0 until n).map(t => (t % 100 - 50).toLong)
    assert(decode(encode(s8, n, order = 1, bps = 8)).get._3 === s8.sum)
    val s24 = (0 until n).map(t => t * 30000L - 2000000L)
    assert(decode(encode(s24, n, order = 2, bps = 24)).get._3 === s24.sum)
  }

  test("LPC subframes: arbitrary coefficients/orders/shifts round-trip any signal exactly (r17)") {
    val n = 192
    // pseudo-random but deterministic signal — the encoder's integer
    // residuals compensate whatever the predictor gets wrong, so a
    // round-trip pins the decoder's accumulate-shift arithmetic
    // (including the arithmetic >> on negative accumulators) against
    // the encoder's, coefficient for coefficient
    def sig(seed: Long): IndexedSeq[Long] =
      (0 until 2 * n).map { t =>
        val x = (seed + t) * 2654435761L
        ((x >> 7) % 2000L) - 1000L
      }
    val lanes = Seq(
      (Seq(1L), 0, 2),                      // order 1, identity-ish, shift 0
      (Seq(3L, -2L), 1, 4),                 // order 2, negative coef
      (Seq(5L, -4L, 2L), 2, 5),             // order 3
      (Seq(7L, -3L, 2L, -1L, 1L, 0L, -2L, 4L), 3, 6)) // order 8
    lanes.zipWithIndex.foreach { case (lane, i) =>
      val s = sig(100L + i)
      val got = decode(encode(s, n, order = 0, pOrder = if (i % 2 == 0) 0 else 2,
        method = i % 2, lpc = lane))
      assert(got === Some((8000, 2L * n, s.sum, s.min, s.max)),
        s"LPC lane $lane")
    }
    // LPC exactness claim the corpus rests on: (8,-4)>>2 ≡ fixed order 2
    val aff = (0 until n).map(t => -300L + 5L * t)
    assert(decode(encode(aff, n, order = 0, lpc = (Seq(8L, -4L), 2, 5))) ===
      decode(encode(aff, n, order = 2)))
  }

  test("rejection lanes: CRCs, LPC, truncation, trailing garbage, shape mismatches, bad magic") {
    val n = 192
    val sig = (0 until n).map(t => t.toLong)
    val good = encode(sig, n, order = 1)
    assert(decode(good).isDefined)
    assert(decode(encode(sig, n, order = 1, breakCrc8 = true)).isEmpty,
      "corrupt header CRC-8 must reject")
    assert(decode(encode(sig, n, order = 1, breakCrc16 = true)).isEmpty,
      "corrupt frame CRC-16 must reject")
    assert(decode(encode(sig, n, order = 1, reservedType = true)).isEmpty,
      "reserved subframe type must reject")
    assert(decode(encode(sig, n, order = 1,
      lpc = (Seq(1L), -1, 4))).isEmpty,
      "negative LPC quantization shift is outside the subset")
    assert(decode(good.take(good.length - 3)).isEmpty,
      "truncated stream must reject, not throw")
    assert(decode(good ++ Array[Byte](1, 2, 3)).isEmpty,
      "trailing garbage must reject")
    assert(decode(encode(sig, n, order = 1, channels = 2)).isEmpty,
      "non-mono STREAMINFO is outside the subset")
    assert(decode(encode(sig, n, order = 1, totalOverride = 1L)).isEmpty,
      "STREAMINFO total-samples mismatch must reject")
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(decode(badMagic).isEmpty)
    assert(decode(Array[Byte]()).isEmpty)
  }

  test("spark-side plumbing: one row per doc, null row for a rejected payload") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val rows = Flac.flacSamples(Flac.fromDocumentsFlac(docs))
      .orderBy("media_id").collect()
    assert(rows.length === 3)
    assert(rows.forall(!_.isNullAt(3)))
    val broken = Seq((9L, Array[Byte](1, 2, 3))).toDS()
    val nr = Flac.flacSamples(broken).collect()
    assert(nr.length === 1 && nr.head.isNullAt(1) && nr.head.isNullAt(3))
  }
}
