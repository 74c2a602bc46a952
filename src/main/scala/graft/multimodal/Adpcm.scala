package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** IMA (DVI) ADPCM decode — real compressed-audio samples from real WAV
  * containers (format tag 0x0011), closing the compressed-audio tier of
  * [[Media.decodeStub]]. The codec is pure integer arithmetic (public:
  * the 1992 IMA Digital Audio Focus Group recommendation; the WAV
  * mapping is Microsoft's RIFF registration): per 4-bit nibble
  *
  * {{{
  *   step = STEPS(index)
  *   diff = step>>3 (+ step if n&4) (+ step>>1 if n&2) (+ step>>2 if n&1)
  *   predictor ±= diff (sign bit n&8), clamped to int16
  *   index += INDEX_DELTA(n&7), clamped to [0, 88]
  * }}}
  *
  * with per-block state reset from a 4-byte header (int16 predictor —
  * which IS the block's first sample — plus the table index), so a
  * seek lands on any block boundary. This decoder implements the FULL
  * state machine (both clamps, index table, low-nibble-first packing);
  * the planted corpus deliberately stays inside the linear region so
  * the DuckDB oracle can replay decoded sums in closed form, and
  * AdpcmSpec exercises the clamp/saturation branches the corpus
  * cannot reach with hand-decoded golden vectors.
  *
  * Envelope (whole payload → null row, never partial): RIFF/WAVE with
  * a fmt tag 0x0011, mono, 4-bit, `samplesPerBlock == (blockAlign-4)*2
  * + 1` (the WAV IMA contract), data a whole number of blocks, header
  * index ≤ 88. Scale: bounded per-partition mapPartitions flatMap, no
  * shuffle — decode is linear in payload bytes, the same posture as
  * every codec kernel here.
  */
object Adpcm {

  private[graft] val Steps: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private[graft] val IndexDelta: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One nibble through the state machine: (sample, index'). */
  private[graft] def step(predictor: Int, index: Int, n: Int): (Int, Int) = {
    val s = Steps(index)
    var diff = s >> 3
    if ((n & 4) != 0) diff += s
    if ((n & 2) != 0) diff += s >> 1
    if ((n & 1) != 0) diff += s >> 2
    val p0 = if ((n & 8) != 0) predictor - diff else predictor + diff
    val p = math.max(-32768, math.min(32767, p0))
    val i = math.max(0, math.min(88, index + IndexDelta(n & 7)))
    (p, i)
  }

  // ----------------------------------------------------------- writer

  private def le16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  private def le32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
    o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
  }

  /** Assemble a complete WAV/IMA-ADPCM file: fmt (tag 0x0011, mono,
    * 4-bit, cbSize 2 carrying samplesPerBlock), fact (total samples),
    * data (whole blocks: 4-byte state header + packed nibbles,
    * low nibble first).
    */
  private[graft] def imaWavFromBlocks(sampleRate: Int, blockAlign: Int,
      blocks: Seq[(Int, Int, Seq[Int])]): Array[Byte] = {
    val spb = (blockAlign - 4) * 2 + 1
    val data = new java.io.ByteArrayOutputStream()
    blocks.foreach { case (pred, idx, nibbles) =>
      require(nibbles.length == (blockAlign - 4) * 2, "whole blocks only")
      le16(data, pred & 0xFFFF); data.write(idx & 0xFF); data.write(0)
      nibbles.grouped(2).foreach { pair =>
        data.write((pair.head & 0xF) | ((pair(1) & 0xF) << 4))
      }
    }
    val d = data.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    le32(out, 4 + 28 + 12 + 8 + d.length) // WAVE + fmt + fact + data hdr
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); le32(out, 20)
    le16(out, 0x0011); le16(out, 1); le32(out, sampleRate)
    le32(out, sampleRate.toLong * blockAlign / spb) // nominal byte rate
    le16(out, blockAlign); le16(out, 4)
    le16(out, 2); le16(out, spb) // cbSize, samplesPerBlock
    out.write("fact".getBytes("US-ASCII")); le32(out, 4)
    le32(out, blocks.length.toLong * spb)
    out.write("data".getBytes("US-ASCII")); le32(out, d.length)
    out.write(d)
    out.toByteArray
  }

  /** Planted corpus payload for doc `id`: nb = 1 + id%3 blocks of 48
    * data bytes (96 nibbles), nibble pattern `[4, 8, 8]` repeating —
    * index deltas (+2, -1, -1) cancel per period, so the decoded
    * signal is EXACTLY affine-per-period (no clamp is ever reachable:
    * |predictor| stays under ~1.2k) and the oracle replays sample sums
    * in closed form. Block b's header predictor is p0 + 17b at a fixed
    * planted index id%8.
    */
  private[graft] def imaWavBytes(id: Long): Array[Byte] = {
    val i0 = (id % 8).toInt
    val p0 = (id % 1024).toInt - 512
    val nb = (1 + id % 3).toInt
    val pattern = Seq(4, 8, 8)
    val nibbles = Seq.fill(32)(pattern).flatten // 96 nibbles
    imaWavFromBlocks(sampleRate = 8000 + (id % 4).toInt * 8000,
      blockAlign = 52,
      blocks = (0 until nb).map(b => (p0 + 17 * b, i0, nibbles)))
  }

  /** Planted WAV/IMA-ADPCM payloads over the documents table. */
  def fromDocumentsAdpcm(docs: DataFrame): Dataset[(Long, Array[Byte])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, imaWavBytes(id))))
  }

  // ----------------------------------------------------------- reader

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Decode one WAV/IMA-ADPCM payload:
    * (sample_rate, n_samples, sample_sum, sample_min, sample_max);
    * None on any envelope violation.
    */
  private[graft] def imaRows(b: Array[Byte]):
      Option[(Int, Long, Long, Int, Int)] = {
    if (b.length < 12 || u32(b, 0) != 0x46464952L /* RIFF */ ||
      u32(b, 8) != 0x45564157L /* WAVE */) return None
    // chunk walk: fmt before data, fact optional
    var p = 12
    var fmtOff = -1; var fmtLen = 0
    var dataOff = -1; var dataLen = 0
    while (p + 8 <= b.length && (fmtOff < 0 || dataOff < 0)) {
      val cid = u32(b, p); val clen = u32(b, p + 4)
      if (clen < 0 || p + 8 + clen > b.length) return None
      if (cid == 0x20746d66L) { fmtOff = p + 8; fmtLen = clen.toInt }
      else if (cid == 0x61746164L) { dataOff = p + 8; dataLen = clen.toInt }
      p += 8 + clen.toInt + (clen.toInt & 1) // chunks are word-aligned
    }
    if (fmtOff < 0 || dataOff < 0 || fmtLen < 20) return None
    if (u16(b, fmtOff) != 0x0011) return None  // IMA ADPCM only
    if (u16(b, fmtOff + 2) != 1) return None   // mono only (this tier)
    val sampleRate = u32(b, fmtOff + 4).toInt
    val blockAlign = u16(b, fmtOff + 12)
    if (u16(b, fmtOff + 14) != 4) return None  // 4-bit nibbles
    val spb = u16(b, fmtOff + 18)
    if (blockAlign < 8 || spb != (blockAlign - 4) * 2 + 1) return None
    if (dataLen % blockAlign != 0) return None // whole blocks
    var sum = 0L; var n = 0L
    var mn = Int.MaxValue; var mx = Int.MinValue
    var off = dataOff
    val end = dataOff + dataLen
    while (off < end) {
      var pred = u16(b, off).toShort.toInt
      var idx = b(off + 2) & 0xff
      if (b(off + 3) != 0) return None // reserved byte
      if (idx > 88) return None
      sum += pred; n += 1
      mn = math.min(mn, pred); mx = math.max(mx, pred)
      var q = off + 4
      while (q < off + blockAlign) {
        val byte = b(q) & 0xff
        var half = 0
        while (half < 2) {
          val nib = if (half == 0) byte & 0xF else byte >> 4
          val (p2, i2) = step(pred, idx, nib)
          pred = p2; idx = i2
          sum += pred; n += 1
          mn = math.min(mn, pred); mx = math.max(mx, pred)
          half += 1
        }
        q += 1
      }
      off += blockAlign
    }
    if (n == 0) return None
    Some((sampleRate, n, sum, mn, mx))
  }

  /** WAV/IMA-ADPCM → one row per payload, as a DataFrame op; payloads
    * outside the envelope yield one all-null row keyed by media_id.
    */
  def adpcmSamples(payloads: Dataset[(Long, Array[Byte])]): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.mapPartitions { batch =>
      batch.map { case (id, raw) =>
        imaRows(raw) match {
          case Some((sr, n, s, mn, mx)) =>
            (id, Some(sr), Some(n), Some(s), Some(mn), Some(mx))
          case None => (id, Option.empty[Int], Option.empty[Long],
            Option.empty[Long], Option.empty[Int], Option.empty[Int])
        }
      }
    }.toDF("media_id", "sample_rate", "n_samples", "sample_sum",
      "sample_min", "sample_max")
  }
}
