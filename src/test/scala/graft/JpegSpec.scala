package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Jpeg, Media}

class JpegSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Zigzag index -> natural (row*8+col) index, JPEG spec Figure A.6.
    * A transcription mistake here would break the ImageIO pixel
    * comparison below, so the table is cross-validated, not trusted.
    */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Reference double-precision IDCT of one block of DEQUANTIZED
    * coefficients in zigzag order -> 64 clamped pixel bytes.
    */
  private def idctBlock(deq: Array[Int]): Array[Int] = {
    val nat = new Array[Double](64)
    for (k <- 0 until 64) nat(Zigzag(k)) = deq(k).toDouble
    def c(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    Array.tabulate(64) { p =>
      val x = p % 8; val y = p / 8
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8)
        s += c(u) * c(v) * nat(v * 8 + u) *
          math.cos((2 * x + 1) * u * math.Pi / 16.0) *
          math.cos((2 * y + 1) * v * math.Pi / 16.0)
      val px = math.round(s / 4.0 + 128.0).toInt
      math.max(0, math.min(255, px))
    }
  }

  test("JPEG entropy decode: Huffman round trip recovers the planted " +
      "dequantized coefficients exactly") {
    val docs = Tables.documents(spark, SparkTestSession.sfTiny)
    val out = Jpeg.decodeJpegCoefficients(Jpeg.fromDocumentsJpegCoefs(docs))
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long],
        Option[Long], Option[Long])].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, w, h, n, mn, mx, sum) =>
      val wb = (2 + id % 5).toInt; val hb = (1 + id % 3).toInt
      val deq = for (b <- 0 until wb * hb; k <- 0 until 64)
        yield Jpeg.plantedCoef(id, b, k).toLong * Jpeg.plantedQuant(k)
      assert((w, h, n, mn, mx, sum) === ((Some(8L * wb), Some(8L * hb),
        Some(deq.length.toLong), Some(deq.min), Some(deq.max),
        Some(deq.sum))), s"jpeg $id")
    }
  }

  test("our bitstreams decode PIXEL-correct through the JDK's " +
      "independent ImageIO JPEG codec") {
    Seq(3L, 10L, 25L).foreach { id =>
      val wb = (2 + id % 5).toInt; val hb = (1 + id % 3).toInt
      val bytes = Jpeg.jpegCoefBytes(id, wb, hb)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth == 8 * wb && img.getHeight == 8 * hb,
        s"ImageIO must parse our JPEG (id=$id)")
      for (by <- 0 until hb; bx <- 0 until wb) {
        val b = by * wb + bx
        val deq = Array.tabulate(64)(k =>
          Jpeg.plantedCoef(id, b, k) * Jpeg.plantedQuant(k))
        val ref = idctBlock(deq)
        for (y <- 0 until 8; x <- 0 until 8) {
          val got = img.getRaster.getSample(bx * 8 + x, by * 8 + y, 0)
          assert(math.abs(got - ref(y * 8 + x)) <= 2,
            s"id=$id block=$b ($x,$y): ImageIO $got vs reference " +
              s"IDCT ${ref(y * 8 + x)} (libjpeg integer IDCT tolerance 2)")
        }
      }
    }
  }

  test("ImageIO-WRITTEN JPEGs entropy-decode through our kernel with " +
      "exact DC arithmetic at quality 1.0") {
    import java.awt.image.BufferedImage
    def write(img: BufferedImage): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream()
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val p = w.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(1.0f) // quant table all ones: DC exact
      val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
      w.setOutput(ios)
      w.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close(); w.dispose()
      buf.toByteArray
    }
    // constant 200-gray image: every block's DC = 8*(200-128), ACs 0
    val const = new BufferedImage(48, 16, BufferedImage.TYPE_BYTE_GRAY)
    val g = const.createGraphics()
    g.setColor(new java.awt.Color(200, 200, 200))
    g.fillRect(0, 0, 48, 16); g.dispose()
    val st = Jpeg.jpegCoefStats(write(const))
    assert(st.isDefined, "our kernel must decode an ImageIO JPEG")
    val (w1, h1, n1, mn1, mx1, sum1) = st.get
    assert((w1, h1, n1) === ((48L, 16L, 12L * 64L)))
    val nb = 12L
    // libjpeg's integer FDCT of a constant block is exact to +-1/block
    assert(math.abs(sum1 - nb * 8L * (200 - 128)) <= nb,
      s"DC sum $sum1 vs exact ${nb * 8L * (200 - 128)}")
    assert(mn1 == 0L && math.abs(mx1 - 8L * (200 - 128)) <= 1)
    // per-8x8-tile constant values: exercises the DIFFERENTIAL DC chain
    // across blocks through an encoder we didn't write
    val tiles = new BufferedImage(32, 24, BufferedImage.TYPE_BYTE_GRAY)
    val vals = Array(90, 130, 170, 210)
    for (ty <- 0 until 3; tx <- 0 until 4) {
      val v = vals((tx + ty) % 4)
      for (y <- 0 until 8; x <- 0 until 8)
        tiles.getRaster.setSample(tx * 8 + x, ty * 8 + y, 0, v)
    }
    val st2 = Jpeg.jpegCoefStats(write(tiles))
    assert(st2.isDefined)
    val expSum = (for (ty <- 0 until 3; tx <- 0 until 4)
      yield 8L * (vals((tx + ty) % 4) - 128)).sum
    assert(math.abs(st2.get._6 - expSum) <= 12,
      s"tiled DC sum ${st2.get._6} vs exact $expSum")
  }

  test("ZRL and long zero runs round-trip (the corpus formula cannot " +
      "produce consecutive zeros, so these paths need explicit blocks)") {
    def block(pairs: (Int, Int)*): Array[Int] = {
      val a = new Array[Int](64)
      pairs.foreach { case (k, v) => a(k) = v }
      a
    }
    // run=16 (one ZRL), run=20 (ZRL + run-4), run=35 (2x ZRL + run-3),
    // trailing-zero EOB after a late coefficient, and a block whose
    // last slot (k=63) is nonzero (no EOB at all)
    val blocks = Array(
      block(0 -> 3, 1 -> 2, 18 -> -5),            // 16 zeros: exactly ZRL
      block(0 -> -2, 2 -> 7, 23 -> 4),            // 20 zeros: ZRL + run 4
      block(0 -> 1, 5 -> -3, 41 -> 6),            // 35 zeros: ZRL,ZRL,run 3
      block(0 -> 0, 63 -> -7),                    // DC zero; k=63 nonzero
      block(0 -> 4, 10 -> 1)                      // long trailing EOB
    )
    val bytes = Jpeg.jpegBytesFromBlocks(blocks, 5, 1)
    val deq = for (b <- blocks.indices; k <- 0 until 64)
      yield blocks(b)(k).toLong * Jpeg.plantedQuant(k)
    assert(Jpeg.jpegCoefStats(bytes) === Some((40L, 8L, 320L,
      deq.min, deq.max, deq.sum)),
      "ZRL/multi-ZRL/run+size/no-EOB blocks must round-trip exactly")
    // and the same bitstream is spec-valid to ImageIO (positions, not
    // just stats: the reference IDCT pixel comparison would catch a
    // run mis-placement that happened to preserve sums)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth == 40 && img.getHeight == 8)
    for (b <- blocks.indices) {
      val ref = idctBlock(Array.tabulate(64)(k =>
        blocks(b)(k) * Jpeg.plantedQuant(k)))
      for (y <- 0 until 8; x <- 0 until 8)
        assert(math.abs(img.getRaster.getSample(b * 8 + x, y, 0) -
          ref(y * 8 + x)) <= 2,
          s"block $b pixel ($x,$y): ZRL positions must be exact")
    }
  }

  test("JPEG entropy decode: progressive, color, restart-interval, " +
      "truncated and hostile streams return null, never garbage") {
    val good = Jpeg.jpegCoefBytes(11L, 3, 2)
    assert(Jpeg.jpegCoefStats(good).isDefined)
    // progressive: flip SOF0 -> SOF2
    val prog = good.clone()
    val sofAt = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xFF && i + 1 < prog.length &&
        (prog(i + 1) & 0xff) == 0xC0).get
    prog(sofAt + 1) = 0xC2.toByte
    assert(Jpeg.jpegCoefStats(prog).isEmpty, "progressive must reject")
    // hostile dims: 65528x65528 => 67M blocks, past the 64M-unit cap
    val hostile = good.clone()
    hostile(sofAt + 5) = 0xFF.toByte; hostile(sofAt + 6) = 0xF8.toByte
    hostile(sofAt + 7) = 0xFF.toByte; hostile(sofAt + 8) = 0xF8.toByte
    assert(Jpeg.jpegCoefStats(hostile).isEmpty, "the unit cap must hold")
    // truncated entropy data: the bit reader runs out mid-block
    assert(Jpeg.jpegCoefStats(good.dropRight(8)).isEmpty)
    // multi-component (the header-tier 3-component jpegPayload)
    import org.apache.spark.sql.functions._
    val color = Tables.documents(spark, SparkTestSession.sfTiny).limit(1)
      .select(Media.jpegPayload(lit(64L), lit(32L), lit(false), lit(false),
        lit(Array[Byte](0xFF.toByte, 0xD9.toByte))).as("c"))
      .as[Array[Byte]].head()
    assert(Jpeg.jpegCoefStats(color).isEmpty, "3-component must reject")
    // restart interval: splice a DRI segment before SOS
    val withDri = {
      val sosAt = good.indices.find(i =>
        (good(i) & 0xff) == 0xFF && i + 1 < good.length &&
          (good(i + 1) & 0xff) == 0xDA).get
      good.take(sosAt) ++
        Array(0xFF, 0xDD, 0x00, 0x04, 0x00, 0x08).map(_.toByte) ++
        good.drop(sosAt)
    }
    assert(Jpeg.jpegCoefStats(withDri).isEmpty, "DRI must reject")
    assert(Jpeg.jpegCoefStats("not a jpeg".getBytes).isEmpty)
  }
}
