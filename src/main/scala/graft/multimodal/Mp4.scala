package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** REAL MP4 (ISO-BMFF) video-frame decode (round 15) — the LAST tier
  * [[Media.decodeStub]] covered. What makes video a genuinely distinct
  * decode problem from the single-image tiers is the SAMPLE TABLE: a
  * frame's bytes live at a file offset reachable only by joining four
  * tables inside `moov/trak/mdia/minf/stbl` — sample sizes (`stsz`),
  * sample-to-chunk runs (`stsc`), chunk offsets (`stco`/`co64`) and
  * timing (`stts`) — none of which a fixed-offset byte walk can read.
  * This module hand-rolls both directions of exactly that layer:
  *
  *   - [[mp4BytesFromFrames]] assembles COMPLETE spec-valid ISO-BMFF
  *     files (ftyp/free/moov/mdat with full
  *     mvhd/tkhd/mdhd/hdlr/vmhd/dinf/stbl trees) whose video track is
  *     Motion-JPEG: each sample is a baseline JPEG produced by
  *     [[Jpeg.jpegBytesFromBlocks]], chunked 2-then-3 so `stsc` carries
  *     real run-length entries;
  *   - [[mp4FrameStats]] walks the box tree generically (64-bit
  *     largesize, to-end-of-file boxes, unknown-box hops), selects the
  *     FIRST `vide`-handler track, cross-joins stsd/stts/stsc/stsz/stco
  *     into per-sample byte ranges, and entropy-decodes every frame
  *     through the independently-proven [[Jpeg.jpegCoefStats]] kernel.
  *
  * The corpus (see [[fromDocumentsMp4Frames]]) varies the CONTAINER
  * shape per id — `co64` vs `stco`, moov-before-mdat vs mdat-first, a
  * decoy non-video track ahead of the video one, variable `free`
  * padding — while the planted coefficient statistics stay a pure
  * arithmetic function of doc_id, so the DuckDB oracle replays them
  * without modeling the container at all: a mistake in ANY of the four
  * sample tables shifts a frame boundary into mid-bitstream garbage
  * and breaks the hash.
  *
  * Envelope (None outside it, never garbage): unfragmented (`moof`
  * rejected), first video track's stsd must declare exactly the
  * Motion-JPEG sample entry (`jpeg`), stsd dims must match the decoded
  * frames' SOF dims and all frames must agree, every sample range must
  * lie inside the file, stts total must equal the stsz sample count,
  * ≤ 100k samples and ≤ 64M total coefficient units.
  *
  * Reference behavior: the reference pipeline (PySpark pet-license
  * notebooks) has no media tier at all; this extends the
  * training-data-pipeline surface mandated by the build brief.
  */
object Mp4 {

  /** Frame salt: frame f of doc `id` plants JPEG coefficients with
    * [[Jpeg.plantedCoef]] at effective id `id + f * FrameSalt` — prime
    * and larger than any per-frame stride so frames differ everywhere.
    */
  private[graft] val FrameSalt = 101L

  // ------------------------------------------------------------ writer

  private def be16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >> 8) & 0xff); o.write(v & 0xff)
  }
  private def be32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    o.write(((v >> 24) & 0xff).toInt); o.write(((v >> 16) & 0xff).toInt)
    o.write(((v >> 8) & 0xff).toInt); o.write((v & 0xff).toInt)
  }
  private def be64(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    be32(o, v >>> 32); be32(o, v & 0xFFFFFFFFL)
  }

  /** Plain box: 32-bit size + fourcc + payload. */
  private def box(t: String, parts: Array[Byte]*): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    be32(o, 8L + parts.map(_.length.toLong).sum)
    o.write(t.getBytes("US-ASCII"))
    parts.foreach(o.write)
    o.toByteArray
  }

  /** Full box: version + 24-bit flags ahead of the payload. */
  private def full(t: String, ver: Int, flags: Int,
      parts: Array[Byte]*): Array[Byte] = {
    val hdr = Array[Byte](ver.toByte, ((flags >> 16) & 0xff).toByte,
      ((flags >> 8) & 0xff).toByte, (flags & 0xff).toByte)
    box(t, (hdr +: parts): _*)
  }

  private def bytes(f: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    f(o)
    o.toByteArray
  }

  // 16.16 fixed-point unity display matrix (tkhd/mvhd)
  private val UnityMatrix: Array[Byte] = bytes { o =>
    be32(o, 0x00010000L); be32(o, 0); be32(o, 0)
    be32(o, 0); be32(o, 0x00010000L); be32(o, 0)
    be32(o, 0); be32(o, 0); be32(o, 0x40000000L)
  }

  /** Chunk plan: first chunk 2 samples, then chunks of 3, a short last
    * chunk allowed — so multi-frame corpora carry BOTH 1-entry and
    * multi-entry `stsc` run-lengths and a partial final chunk.
    */
  private[graft] def chunkSizes(n: Int): Array[Int] =
    if (n <= 2) Array(n)
    else {
      val out = Array.newBuilder[Int]
      out += 2
      var left = n - 2
      while (left > 0) { val c = math.min(3, left); out += c; left -= c }
      out.result()
    }

  /** Run-length encode chunk sizes into stsc (first_chunk,
    * samples_per_chunk) entries, 1-based.
    */
  private[graft] def stscEntries(sizes: Array[Int]): Array[(Int, Int)] = {
    val out = Array.newBuilder[(Int, Int)]
    var i = 0
    while (i < sizes.length) {
      if (i == 0 || sizes(i) != sizes(i - 1)) out += ((i + 1, sizes(i)))
      i += 1
    }
    out.result()
  }

  /** Assemble a complete unfragmented ISO-BMFF file whose single video
    * track is Motion-JPEG over the given frame byte streams.
    *
    * @param frames     per-sample JPEG bytes (≥ 1)
    * @param dispW      stsd/tkhd display width (pixels)
    * @param dispH      stsd/tkhd display height
    * @param pad        `free`-box padding between ftyp and the rest —
    *                   moves every later offset, so hardcoded-offset
    *                   "parsers" break immediately
    * @param moovFirst  moov before mdat (progressive layout) vs after
    * @param useCo64    64-bit chunk offsets (`co64`) vs 32-bit `stco`
    * @param decoyTrak  emit a non-video (handler `soun`) track BEFORE
    *                   the video one, so track selection is real
    */
  private[graft] def mp4BytesFromFrames(frames: Array[Array[Byte]],
      dispW: Int, dispH: Int, pad: Int, moovFirst: Boolean,
      useCo64: Boolean, decoyTrak: Boolean): Array[Byte] = {
    val n = frames.length
    require(n >= 1)
    val timescale = 1000L
    val sampleDelta = 40L // 25 fps
    val duration = sampleDelta * n
    val sizes = chunkSizes(n)
    val constSize = frames.forall(_.length == frames(0).length)

    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII"),
      bytes(be32(_, 0)),
      "isom".getBytes("US-ASCII"))
    val free = box("free", new Array[Byte](pad))
    val mdatPayload = bytes(o => frames.foreach(o.write))
    val mdat = box("mdat", mdatPayload)

    // moov size does not depend on the offset VALUES (fixed-width
    // entries), so build once with zeros to measure, then rebuild with
    // the real chunk offsets.
    def moovOf(chunkOffsets: Array[Long]): Array[Byte] = {
      val mvhd = full("mvhd", 0, 0, bytes { o =>
        be32(o, 0); be32(o, 0)            // ctime, mtime
        be32(o, timescale); be32(o, duration)
        be32(o, 0x00010000L); be16(o, 0x0100) // rate 1.0, volume 1.0
        o.write(new Array[Byte](10))      // reserved
        o.write(UnityMatrix)
        o.write(new Array[Byte](24))      // pre_defined
        be32(o, if (decoyTrak) 3 else 2)  // next_track_ID
      })
      def tkhd(trackId: Long, w: Int, h: Int) = full("tkhd", 0, 7, bytes { o =>
        be32(o, 0); be32(o, 0)            // ctime, mtime
        be32(o, trackId); be32(o, 0)      // reserved
        be32(o, duration)
        o.write(new Array[Byte](8))       // reserved
        be16(o, 0); be16(o, 0); be16(o, 0); be16(o, 0) // layer/alt/vol/rsvd
        o.write(UnityMatrix)
        be32(o, w.toLong << 16); be32(o, h.toLong << 16) // 16.16
      })
      def mdhd = full("mdhd", 0, 0, bytes { o =>
        be32(o, 0); be32(o, 0)
        be32(o, timescale); be32(o, duration)
        be16(o, 0x55C4)                   // language 'und'
        be16(o, 0)                        // pre_defined
      })
      def hdlr(handler: String) = full("hdlr", 0, 0, bytes { o =>
        be32(o, 0)                        // pre_defined
        o.write(handler.getBytes("US-ASCII"))
        o.write(new Array[Byte](12))      // reserved
        o.write(0)                        // empty NUL-terminated name
      })
      // Motion-JPEG VisualSampleEntry: fourcc 'jpeg' (QuickTime/ISO)
      val sampleEntry = bytes { o =>
        be32(o, 86); o.write("jpeg".getBytes("US-ASCII"))
        o.write(new Array[Byte](6)); be16(o, 1) // reserved, data_ref_index
        be16(o, 0); be16(o, 0)            // pre_defined, reserved
        o.write(new Array[Byte](12))      // pre_defined[3]
        be16(o, dispW); be16(o, dispH)
        be32(o, 0x00480000L); be32(o, 0x00480000L) // 72 dpi
        be32(o, 0)                        // reserved
        be16(o, 1)                        // frame_count per sample
        o.write(new Array[Byte](32))      // compressorname (len 0)
        be16(o, 24); be16(o, 0xFFFF)      // depth, pre_defined -1
      }
      val stsd = full("stsd", 0, 0, bytes(be32(_, 1)), sampleEntry)
      val stts = full("stts", 0, 0, bytes { o =>
        be32(o, 1); be32(o, n.toLong); be32(o, sampleDelta)
      })
      val stsc = full("stsc", 0, 0, bytes { o =>
        val ents = stscEntries(sizes)
        be32(o, ents.length.toLong)
        ents.foreach { case (first, per) =>
          be32(o, first.toLong); be32(o, per.toLong); be32(o, 1)
        }
      })
      val stsz = full("stsz", 0, 0, bytes { o =>
        if (constSize) { be32(o, frames(0).length.toLong); be32(o, n.toLong) }
        else {
          be32(o, 0); be32(o, n.toLong)
          frames.foreach(f => be32(o, f.length.toLong))
        }
      })
      val stcoBox =
        if (useCo64) full("co64", 0, 0, bytes { o =>
          be32(o, chunkOffsets.length.toLong); chunkOffsets.foreach(be64(o, _))
        })
        else full("stco", 0, 0, bytes { o =>
          be32(o, chunkOffsets.length.toLong); chunkOffsets.foreach(be32(o, _))
        })
      val stbl = box("stbl", stsd, stts, stsc, stsz, stcoBox)
      val vmhd = full("vmhd", 0, 1, bytes { o =>
        be16(o, 0); be16(o, 0); be16(o, 0); be16(o, 0)
      })
      val dinf = box("dinf", full("dref", 0, 0,
        bytes(be32(_, 1)), full("url ", 0, 1)))
      val minf = box("minf", vmhd, dinf, stbl)
      val mdia = box("mdia", mdhd, hdlr("vide"), minf)
      val videoTrak = box("trak", tkhd(1, dispW, dispH), mdia)
      // metadata-only decoy: handler 'soun', no minf — the walker must
      // skip it on handler type, not on position
      val decoy =
        if (!decoyTrak) Array.empty[Byte]
        else box("trak", tkhd(2, 0, 0), box("mdia", mdhd, hdlr("soun")))
      box("moov", mvhd, decoy, videoTrak)
    }

    // chunk offsets depend on moov's length only when moov precedes
    // mdat — the measuring build (zeroed offsets; moov size is
    // offset-value-independent) runs only for that layout
    val moovLen =
      if (moovFirst) moovOf(sizes.map(_ => 0L)).length.toLong else 0L
    val mdatPayloadOff = ftyp.length.toLong + free.length + moovLen + 8L
    val chunkOffsets = {
      val out = new Array[Long](sizes.length)
      var off = mdatPayloadOff
      var s = 0
      var c = 0
      while (c < sizes.length) {
        out(c) = off
        var i = 0
        while (i < sizes(c)) { off += frames(s).length; s += 1; i += 1 }
        c += 1
      }
      out
    }
    val moov = moovOf(chunkOffsets)
    val o = new java.io.ByteArrayOutputStream()
    o.write(ftyp); o.write(free)
    if (moovFirst) { o.write(moov); o.write(mdat) }
    else { o.write(mdat); o.write(moov) }
    o.toByteArray
  }

  /** Planted corpus video for doc `id`: nf = 2 + id%4 Motion-JPEG
    * frames of wb = 1 + id%3 by hb = 1 + id%2 blocks, frame f planting
    * [[Jpeg.plantedCoef]] at id + f*[[FrameSalt]]. Container shape
    * varies independently of the planted stats: id%5==0 → co64,
    * id%2==0 → moov-first, id%7==0 → decoy non-video track first,
    * free-box pad id%32.
    */
  private[graft] def mp4VideoBytes(id: Long): Array[Byte] = {
    val nf = (2 + id % 4).toInt
    val wb = (1 + id % 3).toInt
    val hb = (1 + id % 2).toInt
    val frames = Array.tabulate(nf) { f =>
      val fid = id + f * FrameSalt
      Jpeg.jpegBytesFromBlocks(
        Array.tabulate(wb * hb, 64)((b, k) => Jpeg.plantedCoef(fid, b, k)),
        wb, hb)
    }
    mp4BytesFromFrames(frames, wb * 8, hb * 8, (id % 32).toInt,
      moovFirst = id % 2 == 0, useCo64 = id % 5 == 0,
      decoyTrak = id % 7 == 0)
  }

  /** Motion-JPEG-planted MP4 payloads over the documents table (kind
    * "video" — the tier [[Media.decodeStub]] used to fake).
    */
  def fromDocumentsMp4Frames(docs: DataFrame): Dataset[Media.MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, source) =>
          val b = mp4VideoBytes(id)
          Media.MediaRecord(id, "video", b, source, b.length.toLong)
        }
      }
  }

  // ------------------------------------------------------------ reader

  private object Reject extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private def beU32(b: Array[Byte], o: Int): Long = {
    if (o < 0 || o + 4 > b.length) throw Reject
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  }
  private def beU64(b: Array[Byte], o: Int): Long = {
    val hi = beU32(b, o)
    val lo = beU32(b, o + 4)
    if (hi > Int.MaxValue) throw Reject // > 2^31 * 4GiB: hostile
    (hi << 32) | lo
  }
  private def fourccIs(b: Array[Byte], o: Int, t: String): Boolean =
    o + 4 <= b.length &&
      b(o) == t.charAt(0).toByte && b(o + 1) == t.charAt(1).toByte &&
      b(o + 2) == t.charAt(2).toByte && b(o + 3) == t.charAt(3).toByte

  /** Walk the boxes in [start, end) invoking f(type-offset,
    * payload-start, payload-end); handles 64-bit largesize and
    * size==0 (to end of enclosing box). Malformed sizes reject.
    */
  private def walkBoxes(b: Array[Byte], start: Int, end: Int)(
      f: (Int, Int, Int) => Unit): Unit = {
    var p = start
    while (p < end) {
      if (p + 8 > end) throw Reject
      val sz32 = beU32(b, p)
      var payload = p + 8
      val boxEnd: Long =
        if (sz32 == 0L) end.toLong
        else if (sz32 == 1L) {
          val sz64 = beU64(b, p + 8)
          payload = p + 16
          if (sz64 < 16) throw Reject
          p + sz64
        } else {
          if (sz32 < 8) throw Reject
          p + sz32
        }
      if (boxEnd > end || boxEnd < payload) throw Reject
      f(p + 4, payload, boxEnd.toInt)
      p = boxEnd.toInt
    }
  }

  /** First child box of the given type, as (payloadStart, payloadEnd). */
  private def findChild(b: Array[Byte], start: Int, end: Int,
      t: String): Option[(Int, Int)] = {
    var found: Option[(Int, Int)] = None
    walkBoxes(b, start, end) { (to, ps, pe) =>
      if (found.isEmpty && fourccIs(b, to, t)) found = Some((ps, pe))
    }
    found
  }

  private[graft] val MaxSamples = 100000
  private[graft] val MaxUnits = 64L << 20

  /** Decode one MP4's Motion-JPEG frame statistics:
    * (n_frames, width, height, n_units, min, max, sum over the
    * dequantized coefficients of ALL frames). None outside the
    * envelope (see object doc), never garbage.
    */
  private[graft] def mp4FrameStats(
      b: Array[Byte]): Option[(Long, Long, Long, Long, Long, Long, Long)] = {
    try {
      if (b.length < 16 || !fourccIs(b, 4, "ftyp")) return None
      // top level: locate moov, reject fragmented files
      var moov: Option[(Int, Int)] = None
      walkBoxes(b, 0, b.length) { (to, ps, pe) =>
        if (fourccIs(b, to, "moof")) throw Reject
        if (moov.isEmpty && fourccIs(b, to, "moov")) moov = Some((ps, pe))
      }
      val (ms, me) = moov.getOrElse(return None)
      // first trak whose mdia/hdlr handler is 'vide'
      var stbl: Option[(Int, Int)] = None
      walkBoxes(b, ms, me) { (to, ps, pe) =>
        if (stbl.isEmpty && fourccIs(b, to, "trak")) {
          findChild(b, ps, pe, "mdia").foreach { case (mds, mde) =>
            val isVideo = findChild(b, mds, mde, "hdlr").exists {
              case (hs, he) => he >= hs + 12 && fourccIs(b, hs + 8, "vide")
            }
            if (isVideo)
              stbl = for {
                (mis, mie) <- findChild(b, mds, mde, "minf")
                st <- findChild(b, mis, mie, "stbl")
              } yield st
          }
        }
      }
      val (ss, se) = stbl.getOrElse(return None)

      // stsd: exactly the Motion-JPEG visual sample entry
      val (sdS, sdE) = findChild(b, ss, se, "stsd").getOrElse(return None)
      if (beU32(b, sdS + 4) < 1) return None // entry_count
      val entryOff = sdS + 8
      if (entryOff + 86 > sdE) return None
      if (!fourccIs(b, entryOff + 4, "jpeg")) return None
      val stsdW = ((b(entryOff + 32) & 0xff) << 8) | (b(entryOff + 33) & 0xff)
      val stsdH = ((b(entryOff + 34) & 0xff) << 8) | (b(entryOff + 35) & 0xff)

      // stsz: per-sample sizes (or one constant size)
      val (szS, szE) = findChild(b, ss, se, "stsz").getOrElse(return None)
      val constSize = beU32(b, szS + 4)
      val nSamples = beU32(b, szS + 8)
      if (nSamples < 1 || nSamples > MaxSamples) return None
      val n = nSamples.toInt
      val sampleSizes = new Array[Long](n)
      if (constSize != 0L) java.util.Arrays.fill(sampleSizes, constSize)
      else {
        if (szS + 12 + 4L * n > szE) return None
        var i = 0
        while (i < n) { sampleSizes(i) = beU32(b, szS + 12 + 4 * i); i += 1 }
      }
      if (sampleSizes.exists(s => s < 4 || s > b.length)) return None

      // stts: total sample count must agree with stsz
      val (ttS, ttE) = findChild(b, ss, se, "stts").getOrElse(return None)
      val nTts = beU32(b, ttS + 4)
      if (ttS + 8 + 8L * nTts > ttE) return None
      var ttsTotal = 0L
      var ti = 0
      while (ti < nTts) { ttsTotal += beU32(b, ttS + 8 + 8 * ti); ti += 1 }
      if (ttsTotal != nSamples) return None

      // stsc: 1-based first_chunk run-lengths, strictly increasing
      val (scS, scE) = findChild(b, ss, se, "stsc").getOrElse(return None)
      val nScs = beU32(b, scS + 4)
      if (nScs < 1 || scS + 8 + 12L * nScs > scE) return None
      val scFirst = new Array[Long](nScs.toInt)
      val scPer = new Array[Long](nScs.toInt)
      var si = 0
      while (si < nScs) {
        scFirst(si) = beU32(b, scS + 8 + 12 * si)
        scPer(si) = beU32(b, scS + 8 + 12 * si + 4)
        if (scPer(si) < 1) return None
        if (si == 0 && scFirst(si) != 1L) return None
        if (si > 0 && scFirst(si) <= scFirst(si - 1)) return None
        si += 1
      }

      // stco / co64: chunk offsets
      val co64 = findChild(b, ss, se, "co64")
      val (coS, coE, wide) = co64 match {
        case Some((s, e)) => (s, e, true)
        case None =>
          val (s, e) = findChild(b, ss, se, "stco").getOrElse(return None)
          (s, e, false)
      }
      val nChunks = beU32(b, coS + 4)
      if (nChunks < 1 || nChunks > MaxSamples) return None
      if (coS + 8 + (if (wide) 8L else 4L) * nChunks > coE) return None
      val chunkOff = new Array[Long](nChunks.toInt)
      var ci = 0
      while (ci < nChunks) {
        chunkOff(ci) =
          if (wide) beU64(b, coS + 8 + 8 * ci) else beU32(b, coS + 8 + 4 * ci)
        ci += 1
      }

      // join the tables into per-sample ranges and decode each frame
      var nf = 0L
      var w = -1L
      var h = -1L
      var units = 0L
      var mn = Long.MaxValue
      var mx = Long.MinValue
      var sum = 0L
      var sample = 0
      var chunk = 0
      var scIdx = 0
      while (sample < n) {
        if (chunk >= nChunks) return None // ran out of declared chunks
        // samples_per_chunk for this (1-based) chunk
        while (scIdx + 1 < scFirst.length && scFirst(scIdx + 1) <= chunk + 1)
          scIdx += 1
        var off = chunkOff(chunk)
        var inChunk = 0L
        while (inChunk < scPer(scIdx) && sample < n) {
          val sz = sampleSizes(sample)
          if (off < 0 || off + sz > b.length) return None
          val frame = java.util.Arrays.copyOfRange(b, off.toInt,
            (off + sz).toInt)
          val st = Jpeg.jpegCoefStats(frame).getOrElse(return None)
          if (w < 0) { w = st._1; h = st._2 }
          else if (w != st._1 || h != st._2) return None // mixed dims
          units += st._3
          if (units > MaxUnits) return None
          if (st._4 < mn) mn = st._4
          if (st._5 > mx) mx = st._5
          sum += st._6
          nf += 1
          off += sz
          inChunk += 1
          sample += 1
        }
        chunk += 1
      }
      if (w != stsdW || h != stsdH) return None // stsd must tell the truth
      Some((nf, w, h, units, mn, mx, sum))
    } catch { case Reject => None }
  }

  /** REAL MP4 frame decode as a DataFrame op — the video sibling of
    * [[Jpeg.decodeJpegCoefficients]], bounded mapPartitions (the sample
    * table and per-frame Huffman state are inherently stateful), columns
    * null outside the envelope.
    */
  def decodeMp4Frames(media: Dataset[Media.MediaRecord]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        val st = mp4FrameStats(m.content)
        (m.media_id, st.map(_._1), st.map(_._2), st.map(_._3),
          st.map(_._4), st.map(_._5), st.map(_._6), st.map(_._7))
      }
    }.toDF("media_id", "n_frames", "width", "height", "n_units",
      "unit_min", "unit_max", "unit_sum")
  }
}
