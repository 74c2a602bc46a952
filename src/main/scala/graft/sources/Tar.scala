package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Tar (POSIX ustar + pax) extraction — the remaining container shape
  * corpora ship in (`.tar.gz` shards). Tar has no index at all: the
  * format IS the framing — 512-byte headers whose octal size field
  * places the next header, a checksum over the header bytes (chksum
  * field read as spaces), data zero-padded to block boundaries, two
  * zero blocks at the end. The details that separate a correct reader
  * from a plausible one:
  *
  *   - the checksum must be VERIFIED (it is the only integrity bit the
  *     format has; skipping it ships bit-rot silently);
  *   - octal fields arrive space- or NUL-terminated with leading
  *     spaces/zeros in the wild;
  *   - long paths arrive as pax extended headers (typeflag `x`): a
  *     metadata record in `len key=value\n` syntax whose `path` key
  *     OVERRIDES the next file's name — a reader that ignores pax
  *     emits truncated 100-byte names;
  *   - directory entries (typeflag `5`) interleave with files and
  *     carry no data.
  *
  * Envelope (whole archive → one all-null row): ustar/pre-POSIX magic,
  * regular files + directories + pax-x only (GNU `L`/`K`, symlinks,
  * base-256 binary sizes rejected), checksum verified on every header,
  * ≤ 1M entries, ≤ 64 MiB per member, archive must terminate with
  * two zero blocks. `.tar.gz` handled via the shared [[Warc.gunzipAll]].
  */
object Tar {

  private val Block = 512

  // ----------------------------------------------------------- writer

  private def octal(v: Long, width: Int): Array[Byte] = {
    // POSIX: leading zeros, NUL terminator
    val s = java.lang.Long.toOctalString(v)
    val b = new Array[Byte](width)
    val pad = width - 1 - s.length
    var i = 0
    while (i < pad) { b(i) = '0'; i += 1 }
    s.getBytes("US-ASCII").copyToArray(b, pad)
    b(width - 1) = 0
    b
  }

  private def header(name: String, size: Long,
      typeflag: Char): Array[Byte] = {
    val h = new Array[Byte](Block)
    val nameB = name.getBytes("UTF-8")
    require(nameB.length <= 100, "long names go through pax")
    nameB.copyToArray(h, 0)
    octal(420, 8).copyToArray(h, 100)       // mode 0644
    octal(0, 8).copyToArray(h, 108)         // uid
    octal(0, 8).copyToArray(h, 116)         // gid
    octal(size, 12).copyToArray(h, 124)
    octal(0, 12).copyToArray(h, 136)        // mtime
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces
    h(156) = typeflag.toByte
    "ustar".getBytes("US-ASCII").copyToArray(h, 257)
    h(262) = 0
    h(263) = '0'; h(264) = '0'              // version "00"
    var sum = 0L
    var i = 0
    while (i < Block) { sum += (h(i) & 0xff); i += 1 }
    // checksum: 6 octal digits, NUL, space
    val cs = java.lang.Long.toOctalString(sum)
    val pad = 6 - cs.length
    var j = 0
    while (j < pad) { h(148 + j) = '0'; j += 1 }
    cs.getBytes("US-ASCII").copyToArray(h, 148 + pad)
    h(154) = 0
    h(155) = ' '
    h
  }

  private def padTo(o: java.io.ByteArrayOutputStream): Unit = {
    val rem = o.size() % Block
    if (rem != 0) o.write(new Array[Byte](Block - rem))
  }

  /** One member: (path, data or None for a directory, pax-path?). A
    * Some pax path emits an `x` extended header whose `path` record
    * overrides the member's (possibly truncated) header name.
    */
  private[graft] final case class TarEntry(name: String,
      data: Option[Array[Byte]], paxPath: Option[String] = None)

  private[graft] def tarBytesFromEntries(
      entries: Seq[TarEntry]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    entries.foreach { e =>
      e.paxPath.foreach { p =>
        // pax record: "<len> path=<value>\n" where len counts itself —
        // in BYTES (UTF-8), not characters
        val body = {
          val base = s" path=$p\n".getBytes("UTF-8")
          var len = base.length + 1 // at least one digit
          while (String.valueOf(len).length + base.length != len) len += 1
          String.valueOf(len).getBytes("US-ASCII") ++ base
        }
        out.write(header(s"./PaxHeaders.0/${e.name.take(80)}",
          body.length.toLong, 'x'))
        out.write(body)
        padTo(out)
      }
      e.data match {
        case Some(d) =>
          out.write(header(e.name, d.length.toLong, '0'))
          out.write(d)
          padTo(out)
        case None =>
          out.write(header(e.name, 0L, '5'))
      }
    }
    out.write(new Array[Byte](2 * Block)) // end-of-archive
    out.toByteArray
  }

  private[graft] def plantedByte(id: Long, e: Int, j: Int): Int =
    ((id + e * 19L + j * 11L) % 256).toInt

  private[graft] def plantedLen(id: Long, e: Int): Int =
    (300 + (id + e) % 600).toInt

  /** The pax-overridden long path for entry 0 of ids %5==0: 150 'x'
    * path segment — longer than the 100-byte header name field, so
    * only a real pax reader reports it.
    */
  private[graft] def paxLongPath(id: Long): String =
    s"doc_$id/" + ("x" * 150) + "/part_0.txt"

  /** Planted corpus archive for doc `id`: a directory entry for ids
    * %7==0, nent = 2 + id%3 regular files of planted bytes spanning
    * 1-2 data blocks; entry 0 of ids %5==0 arrives with a pax extended
    * header overriding its path to [[paxLongPath]] (the header name
    * carries a truncated stand-in). Even ids are `.tar.gz`.
    */
  private[graft] def tarBytes(id: Long): Array[Byte] = {
    val nent = (2 + id % 3).toInt
    val entries = Seq.newBuilder[TarEntry]
    if (id % 7 == 0) entries += TarEntry(s"doc_$id/", None)
    (0 until nent).foreach { e =>
      val data = Array.tabulate(plantedLen(id, e))(j =>
        plantedByte(id, e, j).toByte)
      val pax = if (e == 0 && id % 5 == 0) Some(paxLongPath(id)) else None
      entries += TarEntry(s"doc_$id/part_$e.txt", Some(data), pax)
    }
    val plain = tarBytesFromEntries(entries.result())
    if (id % 2 == 0) {
      val gz = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(gz)
      g.write(plain); g.close()
      gz.toByteArray
    } else plain
  }

  /** Planted tar archives over the documents table. */
  def fromDocumentsTar(docs: DataFrame): Dataset[(Long, Array[Byte])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, tarBytes(id))))
  }

  // ----------------------------------------------------------- reader

  private object Reject extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  // linear walk; cap only the minimum-size-header flood
  private[graft] val MaxEntries = 1 << 20
  private[graft] val MaxMemberLen = 64L << 20

  /** Octal field: leading spaces/zeros, space- or NUL-terminated;
    * base-256 (high bit) rejected.
    */
  private def octalField(b: Array[Byte], off: Int, len: Int): Long = {
    if ((b(off) & 0x80) != 0) throw Reject // base-256 binary size
    var i = off
    val end = off + len
    while (i < end && b(i) == ' ') i += 1
    var v = 0L
    var any = false
    while (i < end && b(i) != 0 && b(i) != ' ') {
      val c = b(i)
      if (c < '0' || c > '7') throw Reject
      v = v * 8 + (c - '0')
      if (v > (1L << 40)) throw Reject
      any = true
      i += 1
    }
    if (!any) throw Reject
    v
  }

  private def isZeroBlock(b: Array[Byte], off: Int): Boolean = {
    var i = off
    val end = off + Block
    while (i < end) { if (b(i) != 0) return false; i += 1 }
    true
  }

  /** One parsed member row: (entry_idx, name, n_bytes, byte_sum) over
    * checksum-verified headers; directories and pax headers consumed
    * but not emitted. None on any violation.
    */
  private[graft] def tarEntryRows(
      raw: Array[Byte]): Option[Seq[(Int, String, Long, Long)]] = {
    try {
      val b =
        if (Warc.isGzip(raw)) Warc.gunzipAll(raw).getOrElse(throw Reject)
        else raw
      if (b.length % Block != 0 || b.length < 2 * Block) return None
      val out = Seq.newBuilder[(Int, String, Long, Long)]
      var p = 0
      var idx = 0
      var n = 0
      var paxPath: String = null
      var ended = false
      while (!ended) {
        if (p + Block > b.length) return None // no end-of-archive marker
        if (isZeroBlock(b, p)) {
          // end: second zero block, then nothing but zeros
          if (p + 2 * Block > b.length || !isZeroBlock(b, p + Block))
            return None
          var q = p + 2 * Block
          while (q < b.length) { if (b(q) != 0) return None; q += 1 }
          ended = true
        } else {
          n += 1
          if (n > MaxEntries) return None
          // verify checksum: header bytes with chksum field as spaces
          val stored = octalField(b, p + 148, 8)
          var sum = 0L
          var i = 0
          while (i < Block) {
            sum += (if (i >= 148 && i < 156) ' '.toInt
              else b(p + i) & 0xff)
            i += 1
          }
          if (sum != stored) return None
          // magic: ustar\0 (POSIX), "ustar " (GNU), or pre-POSIX zeros
          val m = new String(b, p + 257, 5, "US-ASCII")
          if (m != "ustar" && !(0 until 5).forall(k => b(p + 257 + k) == 0))
            return None
          val size = octalField(b, p + 124, 12)
          if (size > MaxMemberLen) return None
          val dataOff = p + Block
          val dataBlocks = ((size + Block - 1) / Block).toInt
          if (dataOff + dataBlocks.toLong * Block > b.length) return None
          var nameEnd = p
          while (nameEnd < p + 100 && b(nameEnd) != 0) nameEnd += 1
          val rawName = new String(b, p, nameEnd - p, "UTF-8")
          b(p + 156).toChar match {
            case '0' | '\u0000' => // regular file
              val name = if (paxPath != null) paxPath else rawName
              paxPath = null
              var s = 0L
              var j = dataOff
              val end = dataOff + size.toInt
              while (j < end) { s += (b(j) & 0xff); j += 1 }
              out += ((idx, name, size, s))
              idx += 1
            case '5' => // directory: consumed, not emitted
              if (size != 0) return None
              paxPath = null
            case 'x' => // pax extended header for the NEXT entry
              var q = dataOff
              val end = dataOff + size.toInt
              while (q < end) {
                // "<len> key=value\n", len counts the whole record
                var le = q
                while (le < end && b(le) != ' ') le += 1
                if (le >= end) return None
                val recLen =
                  try new String(b, q, le - q, "US-ASCII").toInt
                  catch { case _: NumberFormatException => return None }
                if (recLen <= 0 || q + recLen > end ||
                  b(q + recLen - 1) != '\n') return None
                val rec = new String(b, le + 1, q + recLen - 1 - le - 1,
                  "UTF-8")
                val eq = rec.indexOf('=')
                if (eq <= 0) return None
                if (rec.substring(0, eq) == "path")
                  paxPath = rec.substring(eq + 1)
                q += recLen
              }
            case _ => return None // symlinks, GNU L/K, ...: out of envelope
          }
          p = dataOff + dataBlocks * Block
        }
      }
      Some(out.result())
    } catch { case Reject => None }
  }

  /** Tar → one row per regular-file member, as a DataFrame op;
    * archives outside the envelope yield one all-null row.
    */
  def tarEntries(archives: Dataset[(Long, Array[Byte])]): DataFrame = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives.mapPartitions { batch =>
      batch.flatMap { case (id, raw) =>
        tarEntryRows(raw) match {
          case Some(rows) => rows.iterator.map { case (i, nm, nb, bs) =>
            (id, Some(i), Option(nm), Some(nb), Some(bs))
          }
          case None => Iterator.single((id, Option.empty[Int],
            Option.empty[String], Option.empty[Long], Option.empty[Long]))
        }
      }
    }.toDF("media_id", "entry_idx", "name", "n_bytes", "byte_sum")
  }
}
