package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tar
import graft.sources.Tar.TarEntry

/** The tar reader's load-bearing claims: checksum-verified octal
  * framing, pax path overrides, directory interleave, gzip outer —
  * cross-checked against archives written by the JDK-independent
  * system `tar` where available is out of scope (no exec in specs),
  * so the independent check is the other direction: fixtures patch
  * single bytes and the checksum must catch them.
  */
class TarSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(b: Array[Byte]) = Tar.tarEntryRows(b)

  test("planted corpus round trip recovers the q115 formula exactly " +
      "(gzip, directories, pax overrides all in-corpus)") {
    val docs = Tables.documents(spark, SparkTestSession.sfTiny)
    val out = Tar.tarEntries(Tar.fromDocumentsTar(docs))
      .as[(Long, Option[Int], Option[String], Option[Long], Option[Long])]
      .collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (id, rs) =>
      val nent = (2 + id % 3).toInt
      assert(rs.length === nent, s"doc $id member count")
      rs.sortBy(_._2).zipWithIndex.foreach {
        case ((_, idx, name, nb, bs), e) =>
          val len = Tar.plantedLen(id, e)
          val sum = (0 until len).map(j =>
            Tar.plantedByte(id, e, j).toLong).sum
          val wantName =
            if (e == 0 && id % 5 == 0) Tar.paxLongPath(id)
            else s"doc_$id/part_$e.txt"
          assert((idx, name, nb, bs) === ((Some(e), Some(wantName),
            Some(len.toLong), Some(sum))), s"doc $id entry $e")
      }
    }
  }

  test("pax path override applies to exactly the next member") {
    val d1 = "first".getBytes("US-ASCII")
    val d2 = "second".getBytes("US-ASCII")
    val long = "a/" + ("y" * 140) + "/b.txt"
    val b = Tar.tarBytesFromEntries(Seq(
      TarEntry("short1.txt", Some(d1), Some(long)),
      TarEntry("short2.txt", Some(d2))))
    val got = rows(b).get
    assert(got.map(_._2) === Seq(long, "short2.txt"))
    assert(got.map(_._3) === Seq(5L, 6L))
  }

  test("member data spanning exact block multiples round-trips " +
      "(512-byte boundary edge)") {
    for (n <- Seq(511, 512, 513, 1024)) {
      val d = Array.tabulate(n)(i => (i % 251).toByte)
      val b = Tar.tarBytesFromEntries(Seq(TarEntry("b.bin", Some(d))))
      val got = rows(b).get
      assert(got === Seq((0, "b.bin", n.toLong,
        d.map(_.toLong & 0xff).sum)), s"n=$n")
    }
  }

  test("non-ASCII member names round-trip as UTF-8 (header and pax)") {
    val short = "доки/файл.txt" // fits the 100-BYTE field as UTF-8
    val long = "doc/" + ("文" * 40) + "/x.txt" // 128 bytes encoded
    val b = Tar.tarBytesFromEntries(Seq(
      TarEntry(short, Some("a".getBytes("US-ASCII"))),
      TarEntry("stand-in.txt", Some("b".getBytes("US-ASCII")),
        Some(long))))
    assert(rows(b).get.map(_._2) === Seq(short, long))
  }

  test("rejection lane: each violated invariant rejects the whole " +
      "archive") {
    val ok = Tar.tarBytesFromEntries(Seq(
      TarEntry("dir/", None),
      TarEntry("dir/a.txt", Some("hello tar".getBytes("US-ASCII"))),
      TarEntry("dir/b.txt", Some(Array.tabulate(700)(i =>
        (i % 97).toByte)))))
    assert(rows(ok).exists(_.length == 2))

    // checksum: flip one mode byte of the second header
    val cs = ok.clone
    cs(512 + 101) = (cs(512 + 101) ^ 1).toByte
    assert(rows(cs) === None, "checksum catches a header bit flip")

    // non-octal size field
    val sz = ok.clone; sz(512 + 124) = '9'
    assert(rows(sz) === None, "non-octal size")

    // unsupported typeflag (symlink)
    val sl = ok.clone
    // rebuild checksum for the patched header so ONLY the typeflag is
    // the violation
    sl(512 + 156) = '2'
    val hdr = java.util.Arrays.copyOfRange(sl, 512, 1024)
    java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
    val sum = hdr.map(_.toLong & 0xff).sum
    val o = java.lang.Long.toOctalString(sum)
    val pad = 6 - o.length
    (0 until pad).foreach(i => sl(512 + 148 + i) = '0')
    o.getBytes("US-ASCII").copyToArray(sl, 512 + 148 + pad)
    sl(512 + 154) = 0; sl(512 + 155) = ' '
    assert(rows(sl) === None, "symlink typeflag")

    // truncation: end-of-archive marker gone
    assert(rows(ok.dropRight(1024)) === None, "missing end blocks")

    // non-block-multiple length
    assert(rows(ok.dropRight(7)) === None, "ragged length")

    // data after the end-of-archive marker
    val trail = ok ++ new Array[Byte](512)
    assert(rows(trail).exists(_.length == 2),
      "extra zero blocks are fine")
    val garbage = ok ++ Array.fill[Byte](512)(1)
    assert(rows(garbage) === None, "non-zero after end marker")

    // corrupt gzip wrapper
    assert(rows(Array[Byte](0x1f, 0x8b.toByte, 7, 7)) === None)

    // rejection visible in the DataFrame op
    val df = Tar.tarEntries(spark.createDataset(Seq((3L, cs))))
    val r = df.collect()
    assert(r.length === 1 && r(0).getLong(0) === 3L && r(0).isNullAt(1))
  }
}
