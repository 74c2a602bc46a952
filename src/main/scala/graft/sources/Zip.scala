package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ZIP archive extraction — the other container training corpora
  * arrive in (datasets shipped as zipped shards of text/JSON members).
  * The format detail that separates a correct reader from a plausible
  * one: a ZIP's AUTHORITATIVE index is the central directory at the
  * END of the file (located via the end-of-central-directory record,
  * itself found by a bounded backward scan past an optional comment);
  * the local file headers the data is interleaved with are advisory.
  * A reader that streams forward scanning for `PK\x03\x04` signatures
  * misparses any archive whose member DATA contains that byte string —
  * a zip-inside-a-zip, or the decoy members this corpus plants.
  *
  * [[zipEntryRows]] therefore walks EOCD → central directory → per
  * entry: seek to the local header it names, re-read THAT header's
  * name/extra lengths (they legally differ from the central copy),
  * slice the compressed stream, decompress (STORED or raw DEFLATE via
  * `java.util.zip.Inflater(true)`, one per partition), and verify BOTH
  * the uncompressed size and the CRC-32 before emitting — a corrupt
  * member rejects the archive rather than shipping garbage bytes into
  * a corpus.
  *
  * Envelope (whole archive → one null row, never partial): no zip64,
  * no encryption (general-purpose bit 0), methods STORED/DEFLATE only,
  * ≤ 65535 entries (the u16 field's own bound), ≤ 64 MiB uncompressed
  * per member (the shared cost-model cap, ReaderCapsSpec), EOCD comment
  * scan bounded at the comment field's own u16 width.
  *
  * Scale notes: flatMap in bounded mapPartitions, no shuffle; the
  * Inflater is pooled per partition like [[graft.multimodal.Media]]'s
  * PNG path and end()ed via a task completion listener.
  */
object Zip {

  // ----------------------------------------------------------- writer

  private def le16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  private def le32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
    o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
  }

  /** One member: path name, uncompressed data, deflate? */
  private[graft] final case class Entry(name: String, data: Array[Byte],
      deflate: Boolean)

  /** Assemble a complete ZIP: local headers + data, central directory,
    * EOCD (with optional comment — moves the EOCD signature off the
    * fixed tail offset, so the backward scan is real).
    */
  private[graft] def zipBytesFromEntries(entries: Seq[Entry],
      comment: String = ""): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val centrals = entries.map { e =>
      val nameB = e.name.getBytes("UTF-8")
      val crc = new java.util.zip.CRC32()
      crc.update(e.data)
      val comp =
        if (!e.deflate) e.data
        else {
          val d = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, true) // raw
          d.setInput(e.data); d.finish()
          val buf = new Array[Byte](e.data.length + 64)
          val bo = new java.io.ByteArrayOutputStream()
          while (!d.finished()) bo.write(buf, 0, d.deflate(buf))
          d.end()
          bo.toByteArray
        }
      val lfhOff = out.size().toLong
      le32(out, 0x04034b50L)              // local file header
      le16(out, 20); le16(out, 0)         // version, flags
      le16(out, if (e.deflate) 8 else 0)  // method
      le16(out, 0); le16(out, 0)          // time, date
      le32(out, crc.getValue)
      le32(out, comp.length.toLong); le32(out, e.data.length.toLong)
      le16(out, nameB.length); le16(out, 0) // name len, extra len
      out.write(nameB)
      out.write(comp)
      (e, nameB, crc.getValue, comp.length.toLong, lfhOff)
    }
    val cdOff = out.size().toLong
    centrals.foreach { case (e, nameB, crc, compLen, lfhOff) =>
      le32(out, 0x02014b50L)              // central directory header
      le16(out, 20); le16(out, 20); le16(out, 0)
      le16(out, if (e.deflate) 8 else 0)
      le16(out, 0); le16(out, 0)
      le32(out, crc)
      le32(out, compLen); le32(out, e.data.length.toLong)
      le16(out, nameB.length); le16(out, 0); le16(out, 0) // name/extra/comment
      le16(out, 0); le16(out, 0)          // disk, internal attrs
      le32(out, 0)                        // external attrs
      le32(out, lfhOff)
      out.write(nameB)
    }
    val cdLen = out.size().toLong - cdOff
    val commentB = comment.getBytes("US-ASCII")
    le32(out, 0x06054b50L)                // EOCD
    le16(out, 0); le16(out, 0)
    le16(out, entries.length); le16(out, entries.length)
    le32(out, cdLen); le32(out, cdOff)
    le16(out, commentB.length)
    out.write(commentB)
    out.toByteArray
  }

  /** Planted member byte j of entry e of doc `id` (lowercase letters,
    * arithmetically replayable).
    */
  private[graft] def plantedByte(id: Long, e: Int, j: Int): Int =
    (97 + (id + e * 17L + j * 5L) % 26).toInt

  private[graft] def plantedLen(id: Long, e: Int): Int =
    (30 + (id + e) % 50).toInt

  /** The decoy member's data: a byte-exact fake STORED local file
    * header + payload. A forward-scanning reader parses this as a real
    * member named "inner"; the central-directory walk extracts it as
    * the opaque blob it is. Constant across docs so the oracle carries
    * its stats as literals ([[decoyLen]]/[[decoySum]]).
    */
  private[graft] lazy val DecoyData: Array[Byte] = {
    val fake = new java.io.ByteArrayOutputStream()
    le32(fake, 0x04034b50L); le16(fake, 20); le16(fake, 0)
    le16(fake, 0); le16(fake, 0); le16(fake, 0)
    val fcrc = new java.util.zip.CRC32()
    fcrc.update("FAKE".getBytes("US-ASCII"))
    le32(fake, fcrc.getValue); le32(fake, 4); le32(fake, 4)
    le16(fake, 5); le16(fake, 0)
    fake.write("inner".getBytes("US-ASCII"))
    fake.write("FAKE".getBytes("US-ASCII"))
    fake.toByteArray
  }
  private[graft] lazy val decoyLen: Int = DecoyData.length
  private[graft] lazy val decoySum: Long =
    DecoyData.map(_.toLong & 0xff).sum

  /** Planted corpus archive for doc `id`: nent = 2 + id%3 members
    * (alternating STORED/DEFLATE by (id+e)%2) under `doc_<id>/`, a
    * trailing DECOY member for ids %4==0 whose DATA is [[DecoyData]]
    * (STORED, so the fake signature survives verbatim into the archive
    * bytes), and an EOCD comment for ids %6==0 (the backward scan must
    * skip it).
    */
  private[graft] def zipBytes(id: Long): Array[Byte] = {
    val nent = (2 + id % 3).toInt
    val entries = Seq.newBuilder[Entry]
    (0 until nent).foreach { e =>
      val data = Array.tabulate(plantedLen(id, e))(j =>
        plantedByte(id, e, j).toByte)
      entries += Entry(s"doc_$id/part_$e.txt", data,
        deflate = (id + e) % 2 == 1)
    }
    if (id % 4 == 0)
      entries += Entry(s"doc_$id/decoy.bin", DecoyData, deflate = false)
    zipBytesFromEntries(entries.result(),
      comment = if (id % 6 == 0) s"graft shard $id" else "")
  }

  /** Planted ZIP archives over the documents table. */
  def fromDocumentsZip(docs: DataFrame): Dataset[(Long, Array[Byte])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, zipBytes(id))))
  }

  // ----------------------------------------------------------- reader

  private object Reject extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  // the EOCD entry-count field is u16: 65535 is the format's own bound
  private[graft] val MaxEntries = 65535
  private[graft] val MaxMemberLen = 64L << 20
  // the EOCD comment length field is u16, so 65535 is the FORMAT's own
  // bound on how far past the fixed 22-byte EOCD tail the signature can
  // sit (the scan floor subtracts the 22 separately)
  private[graft] val MaxCommentScan = 65535

  private def u16(b: Array[Byte], o: Int): Int = {
    if (o < 0 || o + 2 > b.length) throw Reject
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  }
  private def u32(b: Array[Byte], o: Int): Long = {
    if (o < 0 || o + 4 > b.length) throw Reject
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  }

  /** One parsed member row: (entry_idx, name, method, n_bytes,
    * byte_sum) — sizes/sums over VERIFIED uncompressed bytes.
    */
  private[graft] def zipEntryRows(b: Array[Byte],
      inf: java.util.zip.Inflater)
      : Option[Seq[(Int, String, Int, Long, Long)]] = {
    try {
      // EOCD: backward scan for PK\x05\x06 within the comment bound
      if (b.length < 22) return None
      var eocd = -1
      var p = b.length - 22
      val floor = math.max(0, b.length - 22 - MaxCommentScan)
      while (eocd < 0 && p >= floor) {
        if (u32(b, p) == 0x06054b50L &&
          p + 22 + u16(b, p + 20) == b.length) eocd = p
        else p -= 1
      }
      if (eocd < 0) return None
      val nEntries = u16(b, eocd + 10)
      if (u16(b, eocd + 8) != nEntries) return None // multi-disk
      if (nEntries > MaxEntries) return None
      val cdOff = u32(b, eocd + 16)
      if (cdOff == 0xFFFFFFFFL) return None // zip64
      val out = Seq.newBuilder[(Int, String, Int, Long, Long)]
      var cd = cdOff.toInt
      var i = 0
      while (i < nEntries) {
        if (u32(b, cd) != 0x02014b50L) return None
        val flags = u16(b, cd + 8)
        if ((flags & 0x1) != 0) return None // encrypted
        val method = u16(b, cd + 10)
        if (method != 0 && method != 8) return None
        val crc = u32(b, cd + 16)
        val compLen = u32(b, cd + 20)
        val uncompLen = u32(b, cd + 24)
        if (compLen == 0xFFFFFFFFL || uncompLen == 0xFFFFFFFFL)
          return None // zip64
        if (uncompLen > MaxMemberLen || compLen > b.length) return None
        val nameLen = u16(b, cd + 28)
        val extraLen = u16(b, cd + 30)
        val cmtLen = u16(b, cd + 32)
        val lfhOff = u32(b, cd + 42)
        if (cd + 46 + nameLen > b.length) return None
        val name = new String(b, cd + 46, nameLen, "UTF-8")
        // seek to the named local header; ITS name/extra lengths govern
        // where the data starts (they legally differ from the central
        // copy — extra fields are often local-only)
        val lf = lfhOff.toInt
        if (u32(b, lf) != 0x04034b50L) return None
        val dataOff = lf + 30 + u16(b, lf + 26) + u16(b, lf + 28)
        if (dataOff + compLen > b.length) return None
        val data = new Array[Byte](uncompLen.toInt)
        if (method == 0) {
          if (compLen != uncompLen) return None
          System.arraycopy(b, dataOff, data, 0, uncompLen.toInt)
        } else {
          inf.reset()
          inf.setInput(b, dataOff, compLen.toInt)
          var got = 0
          while (got < data.length && !inf.finished()) {
            val n =
              try inf.inflate(data, got, data.length - got)
              catch { case _: java.util.zip.DataFormatException =>
                throw Reject }
            if (n == 0 && inf.needsInput()) throw Reject // truncated
            got += n
          }
          // a LEGAL zero-length member (uncompressed size 0, method 8 —
          // e.g. the 2-byte raw stream `03 00`) never enters the loop,
          // and a member whose last inflate exactly filled the buffer
          // may not have consumed the stream-end marker yet: drain one
          // terminal call. Any byte it produces means the stream holds
          // MORE than the declared length — reject, don't truncate.
          if (!inf.finished()) {
            val probe = new Array[Byte](1)
            val extra =
              try inf.inflate(probe, 0, 1)
              catch { case _: java.util.zip.DataFormatException =>
                throw Reject }
            if (extra > 0 || !inf.finished()) return None
          }
          if (got != data.length) return None
        }
        val c = new java.util.zip.CRC32()
        c.update(data)
        if (c.getValue != crc) return None // corrupt member
        var sum = 0L
        var j = 0
        while (j < data.length) { sum += (data(j) & 0xff); j += 1 }
        out += ((i, name, method, uncompLen, sum))
        cd += 46 + nameLen + extraLen + cmtLen
        i += 1
      }
      Some(out.result())
    } catch { case Reject => None }
  }

  /** ZIP → one row per member, as a DataFrame op; archives outside the
    * envelope yield one all-null row keyed by media_id.
    */
  def zipEntries(archives: Dataset[(Long, Array[Byte])]): DataFrame = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives.mapPartitions { batch =>
      val inf = new java.util.zip.Inflater(true) // raw deflate
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => inf.end()))
      batch.flatMap { case (id, raw) =>
        zipEntryRows(raw, inf) match {
          case Some(rows) => rows.iterator.map { case (i, nm, m, nb, bs) =>
            (id, Some(i), Option(nm), Some(m), Some(nb), Some(bs))
          }
          case None => Iterator.single(
            (id, Option.empty[Int], Option.empty[String],
              Option.empty[Int], Option.empty[Long], Option.empty[Long]))
        }
      }
    }.toDF("media_id", "entry_idx", "name", "method",
      "n_bytes", "byte_sum")
  }
}
