package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) reader — the container format web
  * corpora actually arrive in (Common Crawl ships `.warc.gz`). A WARC
  * file is a sequence of records, each a version line (`WARC/1.0`),
  * CRLF-terminated named header fields, a blank line, then a content
  * block of EXACTLY `Content-Length` bytes, then two CRLFs; `.warc.gz`
  * wraps EACH record in its own gzip member, concatenated. The two
  * properties that make a naive parser silently wrong at corpus scale:
  *
  *   - records are FRAMED by Content-Length, not by separators — a
  *     content block may legally contain `WARC/1.0` + plausible header
  *     bytes (a crawled page ABOUT warc files, a warc-in-warc), so
  *     scanning for the next version line misparses real data;
  *   - the useful payload (HTML) sits behind a second framing layer:
  *     response records carry a full HTTP/1.1 message whose own headers
  *     must be split off at the first blank line.
  *
  * [[warcResponses]] parses both layers: per-member gunzip (multi-member
  * streams, the `.warc.gz` shape), Content-Length framing with the
  * trailing CRLF CRLF check, case-insensitive header fields in any
  * order, and HTTP envelope extraction for `response` records —
  * emitting one row per HTTP response (the extraction a training
  * pipeline runs over Common Crawl). `warcinfo`/`metadata`/`request`
  * records are walked over by framing — including planted DECOY
  * metadata records whose bodies embed fake `WARC/1.0` headers with
  * absurd lengths, which break any separator-searching implementation.
  *
  * Envelope (whole archive rejected as one null row — never a partial
  * or garbage extraction): WARC/1.0 and /1.1 only, Content-Length
  * required and sane (≤ 64 MiB per record, ≤ 1M records), framing
  * CRLFs must be present, truncated or over-running blocks reject.
  *
  * Scale notes: the op is a flatMap (one archive → N response rows) in
  * a bounded mapPartitions — no shuffle; archives are independent, so
  * it parallelizes by file split exactly like a production WARC reader
  * over object storage.
  */
object Warc {

  // ----------------------------------------------------------- writer

  /** One synthesized record: type, extra named headers, content block. */
  private[graft] final case class Rec(recType: String,
      headers: Seq[(String, String)], body: Array[Byte])

  /** Assemble records into a WARC file; `gzipMembers` wraps each record
    * in its own gzip member (the `.warc.gz` layout).
    */
  private[graft] def warcBytesFromRecords(recs: Seq[Rec],
      gzipMembers: Boolean, lowercaseNames: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    recs.foreach { r =>
      val one = new java.io.ByteArrayOutputStream()
      def line(s: String): Unit =
        one.write((s + "\r\n").getBytes("UTF-8"))
      line("WARC/1.0")
      def name(n: String) = if (lowercaseNames) n.toLowerCase else n
      line(s"${name("WARC-Type")}: ${r.recType}")
      r.headers.foreach { case (k, v) => line(s"${name(k)}: $v") }
      line(s"${name("Content-Length")}: ${r.body.length}")
      line("")
      one.write(r.body)
      line(""); line("")
      if (gzipMembers) {
        val gz = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(gz)
        g.write(one.toByteArray); g.finish(); g.close()
        out.write(gz.toByteArray)
      } else out.write(one.toByteArray)
    }
    out.toByteArray
  }

  /** Planted body byte j of response r of doc `id`: lowercase letters,
    * replayable arithmetically (97 + (id + r*31 + j*7) % 26).
    */
  private[graft] def plantedBodyByte(id: Long, r: Int, j: Int): Int =
    (97 + (id + r * 31L + j * 7L) % 26).toInt

  private[graft] def plantedBodyLen(id: Long, r: Int): Int =
    (20 + (id + r) % 40).toInt

  private[graft] def plantedStatus(id: Long, r: Int): Int =
    (200 + 100 * ((id + r) % 3)).toInt

  /** Planted corpus archive for doc `id`: a warcinfo record, then
    * nrec = 2 + id%4 request/response pairs (responses carry a full
    * HTTP/1.1 message with the planted body), with a DECOY metadata
    * record after the first response for ids %3==0 — its body embeds a
    * fake `WARC/1.0` header claiming an absurd Content-Length, so a
    * separator-scanning parser derails while Content-Length framing
    * walks straight past it. Even ids are `.warc.gz` (one gzip member
    * per record); ids %11==0 write lowercase header names.
    */
  private[graft] def warcBytes(id: Long): Array[Byte] = {
    val nrec = (2 + id % 4).toInt
    val recs = Seq.newBuilder[Rec]
    recs += Rec("warcinfo",
      Seq("WARC-Record-ID" -> s"<urn:uuid:$id-info>",
        "WARC-Date" -> "2026-01-01T00:00:00Z",
        "Content-Type" -> "application/warc-fields"),
      s"software: graft/15\r\nhostname: synth\r\n".getBytes("US-ASCII"))
    (0 until nrec).foreach { r =>
      val uri = s"https://example.com/$id/$r"
      recs += Rec("request",
        Seq("WARC-Record-ID" -> s"<urn:uuid:$id-$r-req>",
          "WARC-Target-URI" -> uri,
          "Content-Type" -> "application/http;msgtype=request"),
        s"GET /$id/$r HTTP/1.1\r\nHost: example.com\r\n\r\n"
          .getBytes("US-ASCII"))
      val bodyLen = plantedBodyLen(id, r)
      val body = Array.tabulate(bodyLen)(j =>
        plantedBodyByte(id, r, j).toByte)
      val http = new java.io.ByteArrayOutputStream()
      http.write((s"HTTP/1.1 ${plantedStatus(id, r)} OK\r\n" +
        "Content-Type: text/html\r\n\r\n").getBytes("US-ASCII"))
      http.write(body)
      // header order varies so fixed-position "parsers" break
      val hdrs =
        if (id % 2 == 0)
          Seq("WARC-Record-ID" -> s"<urn:uuid:$id-$r-resp>",
            "WARC-Target-URI" -> uri,
            "WARC-Concurrent-To" -> s"<urn:uuid:$id-$r-req>",
            "Content-Type" -> "application/http;msgtype=response")
        else
          Seq("Content-Type" -> "application/http;msgtype=response",
            "WARC-Target-URI" -> uri,
            "WARC-Record-ID" -> s"<urn:uuid:$id-$r-resp>")
      recs += Rec("response", hdrs, http.toByteArray)
      if (r == 0 && id % 3 == 0)
        recs += Rec("metadata",
          Seq("WARC-Record-ID" -> s"<urn:uuid:$id-decoy>",
            "Content-Type" -> "text/plain"),
          ("this page documents warc:\r\n\r\nWARC/1.0\r\n" +
            "WARC-Type: response\r\nContent-Length: 999999999\r\n\r\n")
            .getBytes("US-ASCII"))
    }
    warcBytesFromRecords(recs.result(), gzipMembers = id % 2 == 0,
      lowercaseNames = id % 11 == 0)
  }

  /** Planted WARC archives over the documents table (even ids
    * `.warc.gz`, odd ids plain).
    */
  def fromDocumentsWarc(docs: DataFrame): Dataset[(Long, Array[Byte])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, warcBytes(id))))
  }

  // ----------------------------------------------------------- reader

  private object Reject extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private[graft] val MaxRecordLen = 64L << 20
  // real Common Crawl WARCs hold ~30-150k records per ~1 GB file and
  // parsing is linear in bytes - cap generously, not plausibly
  private[graft] val MaxRecords = 1 << 20

  /** Gunzip a (possibly multi-member) gzip stream fully, None on a
    * corrupt stream or past the size cap. The constructor itself
    * validates the first member header, so it sits inside the same
    * corrupt-stream catch as the reads. Shared by the container
    * readers ([[Warc]], [[Tfrecord]]).
    */
  private[sources] def gunzipAll(b: Array[Byte]): Option[Array[Byte]] = {
    var in: java.util.zip.GZIPInputStream = null
    try {
      in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        if (out.size() > (256L << 20)) return None
        n = in.read(buf)
      }
      Some(out.toByteArray)
    } catch {
      case _: java.io.IOException => None
    } finally if (in != null) in.close()
  }

  /** True when the stream leads with the gzip magic. */
  private[sources] def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** One parsed response row: (rec_idx among responses, target_uri,
    * http_status, body_len, body_sum).
    */
  private[graft] def warcResponseRows(
      raw: Array[Byte]): Option[Seq[(Int, String, Int, Long, Long)]] = {
    try {
      val b =
        if (isGzip(raw)) gunzipAll(raw).getOrElse(throw Reject)
        else raw
      val out = Seq.newBuilder[(Int, String, Int, Long, Long)]
      var p = 0
      var nRecs = 0
      var respIdx = 0
      def lineEnd(from: Int): Int = {
        var i = from
        while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n'))
          i += 1
        if (i + 1 >= b.length) throw Reject
        i
      }
      def ascii(from: Int, to: Int): String =
        new String(b, from, to - from, "UTF-8")
      while (p < b.length) {
        nRecs += 1
        if (nRecs > MaxRecords) throw Reject
        // version line
        val ve = lineEnd(p)
        val ver = ascii(p, ve)
        if (ver != "WARC/1.0" && ver != "WARC/1.1") throw Reject
        p = ve + 2
        // named fields until the blank line
        var recType: String = null
        var targetUri: String = null
        var contentLen = -1L
        var done = false
        while (!done) {
          val le = lineEnd(p)
          if (le == p) { done = true; p += 2 }
          else {
            val line = ascii(p, le)
            p = le + 2
            val c = line.indexOf(':')
            if (c <= 0) throw Reject
            val k = line.substring(0, c).trim.toLowerCase
            val v = line.substring(c + 1).trim
            k match {
              case "warc-type" => recType = v
              case "warc-target-uri" => targetUri = v
              case "content-length" =>
                contentLen =
                  try v.toLong catch { case _: NumberFormatException =>
                    throw Reject }
              case _ => // any other field: parsed and ignored
            }
          }
        }
        if (recType == null || contentLen < 0 || contentLen > MaxRecordLen)
          throw Reject
        // content block framed by Content-Length, then CRLF CRLF
        if (p + contentLen + 4 > b.length) throw Reject
        val blockStart = p
        val blockEnd = p + contentLen.toInt
        p = blockEnd
        if (!(b(p) == '\r' && b(p + 1) == '\n' &&
          b(p + 2) == '\r' && b(p + 3) == '\n')) throw Reject
        p += 4
        if (recType == "response") {
          if (targetUri == null) throw Reject
          // HTTP envelope: status line + headers, blank line, body
          val se = lineEnd(blockStart)
          if (se >= blockEnd) throw Reject
          val status = ascii(blockStart, se)
          if (!status.startsWith("HTTP/1.")) throw Reject
          val parts = status.split(" ")
          if (parts.length < 2) throw Reject
          val code =
            try parts(1).toInt catch { case _: NumberFormatException =>
              throw Reject }
          // find the blank line inside the block
          var q = se + 2
          var bodyStart = -1
          while (bodyStart < 0) {
            val le = lineEnd(q)
            if (le >= blockEnd) throw Reject
            if (le == q) bodyStart = q + 2 else q = le + 2
          }
          if (bodyStart > blockEnd) throw Reject
          var sum = 0L
          var j = bodyStart
          while (j < blockEnd) { sum += (b(j) & 0xff); j += 1 }
          out += ((respIdx, targetUri, code,
            (blockEnd - bodyStart).toLong, sum))
          respIdx += 1
        }
      }
      Some(out.result())
    } catch { case Reject => None }
  }

  /** WARC → one row per HTTP response, as a DataFrame op. An archive
    * outside the envelope yields ONE all-null row (keyed by media_id)
    * so rejection is visible, never silent or partial.
    */
  def warcResponses(archives: Dataset[(Long, Array[Byte])]): DataFrame = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives.mapPartitions { batch =>
      batch.flatMap { case (id, raw) =>
        warcResponseRows(raw) match {
          case Some(rows) => rows.iterator.map { case (i, uri, st, bl, bs) =>
            (id, Some(i), Option(uri), Some(st), Some(bl), Some(bs))
          }
          case None => Iterator.single(
            (id, Option.empty[Int], Option.empty[String],
              Option.empty[Int], Option.empty[Long], Option.empty[Long]))
        }
      }
    }.toDF("media_id", "rec_idx", "target_uri", "http_status",
      "body_len", "body_sum")
  }
}
