package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc
import graft.sources.Warc.Rec

/** The WARC reader's load-bearing claims: Content-Length framing (not
  * separator scanning — the decoy lane proves it), per-member AND
  * whole-file gzip, case-insensitive any-order headers, the HTTP
  * envelope split, and a rejection lane where each fixture violates
  * one framing rule.
  */
class WarcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def respRec(uri: String, status: Int,
      body: Array[Byte]): Rec = {
    val http = new java.io.ByteArrayOutputStream()
    http.write((s"HTTP/1.1 $status OK\r\nContent-Type: text/html\r\n\r\n")
      .getBytes("US-ASCII"))
    http.write(body)
    Rec("response", Seq("WARC-Target-URI" -> uri,
      "Content-Type" -> "application/http;msgtype=response"),
      http.toByteArray)
  }

  test("planted corpus round trip recovers the q112 formula exactly " +
      "(gzip members, decoys, lowercase headers all in-corpus)") {
    val docs = Tables.documents(spark, SparkTestSession.sfTiny)
    val out = Warc.warcResponses(Warc.fromDocumentsWarc(docs))
      .as[(Long, Option[Int], Option[String], Option[Int], Option[Long],
        Option[Long])].collect()
    assert(out.nonEmpty)
    val byDoc = out.groupBy(_._1)
    byDoc.foreach { case (id, rows) =>
      val nrec = (2 + id % 4).toInt
      assert(rows.length === nrec, s"doc $id row count")
      rows.sortBy(_._2).zipWithIndex.foreach {
        case ((_, idx, uri, status, bl, bs), r) =>
          val len = Warc.plantedBodyLen(id, r)
          val sum = (0 until len).map(j =>
            Warc.plantedBodyByte(id, r, j).toLong).sum
          assert((idx, uri, status, bl, bs) === ((Some(r),
            Some(s"https://example.com/$id/$r"),
            Some(Warc.plantedStatus(id, r)), Some(len.toLong),
            Some(sum))), s"doc $id resp $r")
      }
    }
  }

  test("Content-Length framing walks past a decoy record whose body " +
      "embeds a fake WARC header") {
    val decoy = Rec("metadata", Seq("Content-Type" -> "text/plain"),
      ("seen on the web:\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n" +
        "Content-Length: 999999999\r\n\r\nHTTP/1.1 500 X\r\n\r\n")
        .getBytes("US-ASCII"))
    val b1 = respRec("https://a/1", 200, "hello".getBytes("US-ASCII"))
    val b2 = respRec("https://a/2", 404, "worlds".getBytes("US-ASCII"))
    for (gz <- Seq(false, true)) {
      val bytes = Warc.warcBytesFromRecords(Seq(b1, decoy, b2), gz,
        lowercaseNames = false)
      val rows = Warc.warcResponseRows(bytes).get
      assert(rows === Seq(
        (0, "https://a/1", 200, 5L, "hello".getBytes("US-ASCII")
          .map(_.toLong & 0xff).sum),
        (1, "https://a/2", 404, 6L, "worlds".getBytes("US-ASCII")
          .map(_.toLong & 0xff).sum)), s"gz=$gz")
    }
  }

  test("whole-file gzip (single member over all records) also parses") {
    val plain = Warc.warcBytesFromRecords(
      Seq(respRec("https://w/0", 200, "abc".getBytes("US-ASCII"))),
      gzipMembers = false, lowercaseNames = false)
    val gz = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(gz)
    g.write(plain); g.close()
    assert(Warc.warcResponseRows(gz.toByteArray) ===
      Warc.warcResponseRows(plain))
  }

  test("WARC/1.1 version line is accepted") {
    val plain = Warc.warcBytesFromRecords(
      Seq(respRec("https://v/0", 200, "xy".getBytes("US-ASCII"))),
      gzipMembers = false, lowercaseNames = false)
    val v11 = new String(plain, "ISO-8859-1")
      .replace("WARC/1.0", "WARC/1.1").getBytes("ISO-8859-1")
    assert(Warc.warcResponseRows(v11).exists(_.nonEmpty))
  }

  test("rejection lane: each framing violation rejects the whole " +
      "archive (None, never partial rows)") {
    val ok = Warc.warcBytesFromRecords(
      Seq(respRec("https://r/0", 200, "abcdef".getBytes("US-ASCII")),
        respRec("https://r/1", 301, "ghij".getBytes("US-ASCII"))),
      gzipMembers = false, lowercaseNames = false)
    assert(Warc.warcResponseRows(ok).exists(_.length == 2))
    val s = new String(ok, "ISO-8859-1")

    // unknown version
    assert(Warc.warcResponseRows(s.replace("WARC/1.0", "WARC/0.18")
      .getBytes("ISO-8859-1")) === None, "bad version")

    // missing Content-Length (drop the field from record 1)
    val noLen = s.replaceFirst("Content-Length: \\d+\r\n", "")
    assert(Warc.warcResponseRows(noLen.getBytes("ISO-8859-1")) === None,
      "missing content-length")

    // non-numeric Content-Length
    val badLen = s.replaceFirst("Content-Length: \\d+", "Content-Length: x")
    assert(Warc.warcResponseRows(badLen.getBytes("ISO-8859-1")) === None,
      "non-numeric content-length")

    // hostile Content-Length (over the 64 MiB cap)
    val hugeLen = s.replaceFirst("Content-Length: \\d+",
      "Content-Length: 999999999999")
    assert(Warc.warcResponseRows(hugeLen.getBytes("ISO-8859-1")) === None,
      "hostile content-length")

    // truncated mid-body
    assert(Warc.warcResponseRows(ok.dropRight(9)) === None, "truncated")

    // framing CRLFs after a block violated (flip the first byte of the
    // trailing CRLF CRLF of record 1's block)
    val firstBlockEnd = s.indexOf("abcdef") + 6
    val torn = ok.clone
    torn(firstBlockEnd) = 'X'.toByte
    assert(Warc.warcResponseRows(torn) === None, "framing violation")

    // response lacking a Target-URI
    val noUri = Warc.warcBytesFromRecords(Seq(Rec("response",
      Seq("Content-Type" -> "application/http;msgtype=response"),
      "HTTP/1.1 200 OK\r\n\r\nz".getBytes("US-ASCII"))),
      gzipMembers = false, lowercaseNames = false)
    assert(Warc.warcResponseRows(noUri) === None, "missing target-uri")

    // response whose block is not an HTTP message
    val notHttp = Warc.warcBytesFromRecords(Seq(Rec("response",
      Seq("WARC-Target-URI" -> "https://x/"),
      "plain text, no status line\r\n\r\n".getBytes("US-ASCII"))),
      gzipMembers = false, lowercaseNames = false)
    assert(Warc.warcResponseRows(notHttp) === None, "non-http response")

    // garbage gzip magic
    assert(Warc.warcResponseRows(Array[Byte](0x1f, 0x8b.toByte, 1, 2, 3))
      === None, "garbage gzip")

    // rejection is visible in the DataFrame op: one all-null row
    val df = Warc.warcResponses(spark.createDataset(
      Seq((7L, s.replace("WARC/1.0", "WARC/0.18").getBytes("ISO-8859-1")))))
    val rows = df.collect()
    assert(rows.length === 1 && rows(0).getLong(0) === 7L &&
      rows(0).isNullAt(1) && rows(0).isNullAt(3))
  }
}
