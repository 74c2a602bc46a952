package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Zip
import graft.sources.Zip.Entry

/** The ZIP reader's load-bearing claims: central-directory-driven
  * extraction (decoy fake local headers in member data are inert),
  * STORED + raw DEFLATE with CRC verification, the bounded EOCD
  * backward scan past comments — cross-checked in BOTH directions
  * against the JDK's independent java.util.zip implementation — and a
  * rejection lane where each fixture violates one invariant.
  */
class ZipSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(b: Array[Byte]) = {
    val inf = new java.util.zip.Inflater(true)
    try Zip.zipEntryRows(b, inf) finally inf.end()
  }

  /** (eocdOffset, cdOffset) of a well-formed archive with no comment
    * ambiguity — for byte-patching fixtures.
    */
  private def locate(b: Array[Byte]): (Int, Int) = {
    var p = b.length - 22
    while (!(b(p) == 0x50 && b(p + 1) == 0x4b && b(p + 2) == 0x05 &&
      b(p + 3) == 0x06)) p -= 1
    val cd = (b(p + 16) & 0xff) | ((b(p + 17) & 0xff) << 8) |
      ((b(p + 18) & 0xff) << 16) | ((b(p + 19) & 0xff) << 24)
    (p, cd)
  }

  test("planted corpus round trip recovers the q113 formula exactly " +
      "(stored+deflate, decoys, comments all in-corpus)") {
    val docs = Tables.documents(spark, SparkTestSession.sfTiny)
    val out = Zip.zipEntries(Zip.fromDocumentsZip(docs))
      .as[(Long, Option[Int], Option[String], Option[Int], Option[Long],
        Option[Long])].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (id, rs) =>
      val nent = (2 + id % 3).toInt
      val withDecoy = nent + (if (id % 4 == 0) 1 else 0)
      assert(rs.length === withDecoy, s"doc $id member count")
      rs.sortBy(_._2).zipWithIndex.foreach {
        case ((_, idx, name, method, nb, bs), e) =>
          if (e < nent) {
            val len = Zip.plantedLen(id, e)
            val sum = (0 until len).map(j =>
              Zip.plantedByte(id, e, j).toLong).sum
            assert((idx, name, method, nb, bs) === ((Some(e),
              Some(s"doc_$id/part_$e.txt"),
              Some(if ((id + e) % 2 == 1) 8 else 0),
              Some(len.toLong), Some(sum))), s"doc $id entry $e")
          } else
            assert((idx, name, method, nb, bs) === ((Some(nent),
              Some(s"doc_$id/decoy.bin"), Some(0),
              Some(Zip.decoyLen.toLong), Some(Zip.decoySum))),
              s"doc $id decoy")
      }
    }
  }

  test("cross-check: our archives parse identically through the JDK's " +
      "independent ZipFile implementation") {
    for (id <- Seq(0L, 3L, 4L, 7L, 12L, 23L)) {
      val b = Zip.zipBytes(id)
      val f = java.io.File.createTempFile("graftzip", ".zip")
      try {
        java.nio.file.Files.write(f.toPath, b)
        val zf = new java.util.zip.ZipFile(f)
        try {
          val jdk = {
            val es = zf.entries()
            val buf = Seq.newBuilder[(String, Long, Long)]
            while (es.hasMoreElements) {
              val e = es.nextElement()
              val in = zf.getInputStream(e)
              var sum = 0L; var n = 0L
              var c = in.read()
              while (c >= 0) { sum += c; n += 1; c = in.read() }
              in.close()
              buf += ((e.getName, n, sum))
            }
            buf.result()
          }
          val ours = rows(b).get.map(r => (r._2, r._4, r._5))
          assert(ours === jdk, s"id $id")
        } finally zf.close()
      } finally f.delete()
    }
  }

  test("cross-check: JDK-written archives parse through our kernel") {
    val bo = new java.io.ByteArrayOutputStream()
    val zo = new java.util.zip.ZipOutputStream(bo)
    val a = "alpha beta gamma".getBytes("US-ASCII")
    val b2 = Array.tabulate(5000)(i => (i % 251).toByte)
    zo.putNextEntry(new java.util.zip.ZipEntry("a.txt"))
    zo.write(a); zo.closeEntry()
    val stored = new java.util.zip.ZipEntry("b.bin")
    stored.setMethod(java.util.zip.ZipEntry.STORED)
    stored.setSize(b2.length)
    val crc = new java.util.zip.CRC32(); crc.update(b2)
    stored.setCrc(crc.getValue)
    zo.putNextEntry(stored); zo.write(b2); zo.closeEntry()
    zo.close()
    val got = rows(bo.toByteArray)
    // ZipOutputStream writes deflated entries with a data descriptor;
    // the central directory still carries the true sizes/CRC, which is
    // all our reader consults
    assert(got === Some(Seq(
      (0, "a.txt", 8, a.length.toLong, a.map(_.toLong & 0xff).sum),
      (1, "b.bin", 0, b2.length.toLong, b2.map(_.toLong & 0xff).sum))))
  }

  test("a legal EMPTY deflated member (uncompressed size 0, method 8) " +
      "parses instead of collapsing the archive") {
    import graft.sources.Zip
    // our own assembler: Deflater(finish) on empty input emits the
    // 2-byte raw stream `03 00`
    val z = Zip.zipBytesFromEntries(Seq(
      Zip.Entry("empty.txt", Array.empty[Byte], deflate = true),
      Zip.Entry("tail.txt", "x".getBytes("US-ASCII"), deflate = true)))
    assert(rows(z) === Some(Seq(
      (0, "empty.txt", 8, 0L, 0L),
      (1, "tail.txt", 8, 1L, 'x'.toLong))))
    // JDK cross-check: an empty DEFLATED entry through ZipOutputStream
    val bo = new java.io.ByteArrayOutputStream()
    val zo = new java.util.zip.ZipOutputStream(bo)
    zo.putNextEntry(new java.util.zip.ZipEntry("e"))
    zo.closeEntry()
    zo.close()
    assert(rows(bo.toByteArray) === Some(Seq((0, "e", 8, 0L, 0L))))
  }

  test("rejection lane: each violated invariant rejects the whole " +
      "archive") {
    val ok = Zip.zipBytesFromEntries(Seq(
      Entry("x/stored.txt", "hello world".getBytes("US-ASCII"), false),
      Entry("x/deflated.txt",
        Array.tabulate(300)(i => (97 + i % 26).toByte), true)))
    assert(rows(ok).exists(_.length == 2))
    val (eocd, cd) = locate(ok)

    // encrypted member (general-purpose bit 0 in the central entry)
    val enc = ok.clone; enc(cd + 8) = (enc(cd + 8) | 1).toByte
    assert(rows(enc) === None, "encrypted")

    // unsupported method (12 = bzip2)
    val m12 = ok.clone; m12(cd + 10) = 12
    assert(rows(m12) === None, "bad method")

    // zip64 marker sizes
    val z64 = ok.clone
    (20 until 24).foreach(i => z64(cd + i) = 0xFF.toByte)
    assert(rows(z64) === None, "zip64")

    // multi-disk EOCD (this-disk count != total count)
    val md = ok.clone; md(eocd + 8) = (md(eocd + 8) + 1).toByte
    assert(rows(md) === None, "multi-disk")

    // corrupt STORED data -> CRC mismatch
    val crc1 = ok.clone
    val dataOff = 30 + "x/stored.txt".length // first LFH's data
    crc1(dataOff) = (crc1(dataOff) ^ 0x40).toByte
    assert(rows(crc1) === None, "stored crc")

    // corrupt DEFLATE stream -> inflate error or CRC mismatch
    val crc2 = ok.clone
    val secondLfh = {
      // second LFH follows first data block
      30 + "x/stored.txt".length + "hello world".length
    }
    val dOff = secondLfh + 30 + "x/deflated.txt".length
    crc2(dOff + 3) = (crc2(dOff + 3) ^ 0x55).toByte
    assert(rows(crc2) === None, "deflate corrupt")

    // truncated: EOCD gone
    assert(rows(ok.dropRight(3)) === None, "truncated eocd")

    // EOCD comment-length inconsistency (claims more than remains)
    val badc = ok.clone; badc(eocd + 20) = 9
    assert(rows(badc) === None, "bad comment length")

    // comment beyond the 64 KiB scan bound
    val far = ok ++ Array.fill[Byte](70000)(0x20)
    assert(rows(far) === None, "comment over scan bound")

    // not a zip at all / empty
    assert(rows("PK but not really a zip file".getBytes("US-ASCII"))
      === None)
    assert(rows(Array.empty[Byte]) === None)

    // rejection visible in the DataFrame op: one all-null row
    val df = Zip.zipEntries(spark.createDataset(Seq((9L, enc))))
    val r = df.collect()
    assert(r.length === 1 && r(0).getLong(0) === 9L && r(0).isNullAt(1))
  }

  test("non-ASCII member names round-trip as UTF-8") {
    val name = "доки/résumé-文書.txt"
    val b = Zip.zipBytesFromEntries(Seq(
      Entry(name, "payload".getBytes("US-ASCII"), true)))
    assert(rows(b).get.map(_._2) === Seq(name))
  }

  test("EOCD backward scan honors a real trailing comment") {
    val withComment = Zip.zipBytesFromEntries(
      Seq(Entry("c.txt", "data".getBytes("US-ASCII"), false)),
      comment = "shard comment with PK bait inside")
    val got = rows(withComment)
    assert(got.exists(_.map(_._2) == Seq("c.txt")))
  }
}
