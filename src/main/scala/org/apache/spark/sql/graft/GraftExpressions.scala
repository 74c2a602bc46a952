// This file lives under org.apache.spark.sql so it can use the
// Catalyst bridge APIs (ExpressionUtils, AbstractDataType) that Spark 4
// scopes private[sql] — the standard pattern for libraries that ship
// native Catalyst expressions. Only `GraftExpressions`' Column-level
// functions are meant for users (re-exported via graft.expressions).
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup/fingerprint family. Per-row
  * scalar computations with full `doGenCode` (static-call codegen) so they
  * stay inside WholeStageCodegen — one tight loop per row, no boxing, no
  * UDF serialization. The hot path at 100 TB.
  */
object GraftExpressions {
  private[graft] val SEED = 42L

  /** 64-bit SimHash of a token array (Charikar's similarity-preserving
    * fingerprint): per-token XXH64, each bit votes +1/-1, sign of the vote
    * becomes the output bit. Near-duplicate docs land at small Hamming
    * distance.
    */
  def simHash64(tokens: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(tokens)))

  /** Hamming distance between two 64-bit fingerprints. */
  def hammingDistance(a: Column, b: Column): Column =
    ExpressionUtils.column(
      HammingDistance(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Winnowing-style document fingerprint: minimum XXH64 over every
    * `window`-byte sliding window of the UTF-8 text. Shift-invariant: an
    * unchanged region >= `window` bytes yields the same candidate hashes
    * regardless of position in the doc.
    */
  def docFingerprint(text: Column, window: Int): Column =
    ExpressionUtils.column(DocFingerprint(ExpressionUtils.expression(text), window))

  /** One greedy left-to-right BPE merge step over a symbol array. */
  def pairMerge(syms: Column, mergeLeft: String, mergeRight: String): Column =
    ExpressionUtils.column(
      PairMerge(ExpressionUtils.expression(syms), mergeLeft, mergeRight))

  /** Packed JPEG dimensions `(width << 16) | height` from a JFIF/EXIF
    * byte stream, or null when the bytes are not a JPEG or no
    * start-of-frame precedes the scan data. Unlike the fixed-offset
    * PNG/GIF/BMP/WAV headers, JPEG dimensions live in an SOF segment at
    * a VARIABLE offset behind arbitrary APPn/COM/DQT/DHT segments (EXIF
    * files lead with a large APP1), so this is a real marker-segment
    * walk: skip fill bytes, hop segments by their big-endian lengths,
    * stop at the first SOF0-SOF15 (excluding DHT/JPG/DAC, which share
    * the 0xCn space). One tight loop over header bytes per row, inside
    * WholeStageCodegen.
    */
  def jpegDims(bytes: Column): Column =
    ExpressionUtils.column(JpegDims(ExpressionUtils.expression(bytes)))

  /** The marker walk behind [[jpegDims]]; boxed so "no dims" is null. */
  def computeJpegDims(bytes: Array[Byte]): java.lang.Long = {
    val n = bytes.length
    if (n < 4 || (bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return null
    var i = 2
    while (i + 1 < n) {
      if ((bytes(i) & 0xFF) != 0xFF) return null // lost marker sync
      // any number of 0xFF fill bytes may precede the marker id
      var j = i + 1
      while (j < n && (bytes(j) & 0xFF) == 0xFF) j += 1
      if (j >= n) return null
      val marker = bytes(j) & 0xFF
      if (marker == 0x00) return null // stuffed byte — invalid before SOS
      else if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) {
        i = j + 1 // standalone marker, no length field
      } else if (marker == 0xD9 || marker == 0xDA) {
        return null // EOI / start-of-scan reached without any SOF
      } else {
        if (j + 2 >= n) return null
        val segLen = ((bytes(j + 1) & 0xFF) << 8) | (bytes(j + 2) & 0xFF)
        if (segLen < 2) return null
        val isSof = marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC
        if (isSof) {
          // payload: precision u8, height u16be, width u16be
          if (j + 7 >= n) return null
          val h = ((bytes(j + 4) & 0xFF) << 8) | (bytes(j + 5) & 0xFF)
          val w = ((bytes(j + 6) & 0xFF) << 8) | (bytes(j + 7) & 0xFF)
          if (w == 0 || h == 0) return null
          return java.lang.Long.valueOf((w.toLong << 16) | h.toLong)
        }
        i = j + 1 + segLen
      }
    }
    null
  }

  /** Packed `(width << 16) | height` of the first visual track in an
    * ISO-BMFF (MP4/MOV) byte stream, or null. Unlike JPEG's flat
    * marker list, ISO-BMFF is a NESTED box tree — `moov` ▸ `trak` ▸
    * `tkhd` — with three size encodings (u32, size==1 → u64
    * "largesize", size==0 → to end of enclosing box), so this is a
    * real recursive-descent walk: hop top-level boxes to `moov`, then
    * each `trak`, then read the track header's 16.16 fixed-point dims
    * (version 0 and 1 layouts both handled). Tracks with zero dims
    * (audio/hint) are skipped. Cost: linear in header bytes, one pass.
    */
  def mp4Dims(bytes: Column): Column =
    ExpressionUtils.column(Mp4Dims(ExpressionUtils.expression(bytes)))

  /** Presentation duration in milliseconds from the `mvhd` movie
    * header (duration units ÷ timescale), or null when absent/invalid.
    */
  def mp4DurationMs(bytes: Column): Column =
    ExpressionUtils.column(Mp4DurationMs(ExpressionUtils.expression(bytes)))

  /** REAL pixel decode for uncompressed 24-bit BMP bytes:
    * `[n_pixel_bytes, min, max, sum]` over the raw pixel data (row
    * padding excluded — BMP rows pad to 4-byte multiples), or null when
    * the bytes are not an uncompressed 24bpp BMP (wrong magic, bpp,
    * BI_RGB compression flag, or truncated pixel array). No codec is
    * involved because BI_RGB pixel data IS plain bytes — this is the
    * honest boundary between the header tier and true codec formats
    * (PNG/JPEG pixels), which remain behind [[graft.multimodal
    * .Media.decodeStub]]. Top-down bitmaps (negative height) decode
    * too; statistics are row-order-invariant anyway.
    */
  def bmpPixelStats(bytes: Column): Column =
    ExpressionUtils.column(BmpPixelStats(ExpressionUtils.expression(bytes)))

  /** REAL sample decode for PCM-16 WAV bytes: `[n_samples, min, max,
    * sum]` over the signed little-endian samples of the `data` chunk,
    * or null for anything that is not integer PCM-16 (float/ADPCM/etc
    * would need a decoder) or whose chunk walk is malformed/truncated.
    * A genuine RIFF chunk walk — `data` is found by hopping chunks by
    * their declared sizes (word-aligned), never by a fixed offset.
    */
  def wavSampleStats(bytes: Column): Column =
    ExpressionUtils.column(WavSampleStats(ExpressionUtils.expression(bytes)))

  private def le16u(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32u(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  def computeBmpPixelStats(b: Array[Byte]): ArrayData = {
    val n = b.length
    if (n < 54 || (b(0) & 0xFF) != 'B' || (b(1) & 0xFF) != 'M') return null
    val dataOffset = le32u(b, 10)
    val infoSize = le32u(b, 14)
    if (infoSize < 40) return null // BITMAPINFOHEADER or a later superset
    val w = le32u(b, 18).toInt // signed i32 fields
    val hRaw = le32u(b, 22).toInt
    val bpp = le16u(b, 28)
    val compression = le32u(b, 30)
    if (w <= 0 || hRaw == 0 || bpp != 24 || compression != 0L) return null
    val h = math.abs(hRaw) // negative height = top-down row order
    val rowBytes = w * 3
    val rowSize = ((rowBytes + 3) / 4) * 4
    val start = dataOffset
    if (start < 54L || start + rowSize.toLong * h > n) return null
    var mn = 255L; var mx = 0L; var sum = 0L
    var r = 0
    while (r < h) {
      val base = (start + r.toLong * rowSize).toInt
      var j = 0
      while (j < rowBytes) {
        val v = (b(base + j) & 0xFF).toLong
        if (v < mn) mn = v
        if (v > mx) mx = v
        sum += v
        j += 1
      }
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(rowBytes.toLong * h, mn, mx, sum))
  }

  def computeWavSampleStats(b: Array[Byte]): ArrayData = {
    val n = b.length
    if (n < 12 || !isType(b, 0, "RIFF") || !isType(b, 8, "WAVE")) return null
    var pos = 12
    var fmtOk = false
    while (pos + 8 <= n) {
      val size = le32u(b, pos + 4)
      val payload = pos + 8
      if (isType(b, pos, "fmt ")) {
        if (size < 16 || payload + 16 > n) return null
        val audioFormat = le16u(b, payload)
        val bits = le16u(b, payload + 14)
        if (audioFormat != 1 || bits != 16) return null // integer PCM-16 only
        fmtOk = true
      } else if (isType(b, pos, "data")) {
        if (!fmtOk) return null // data before fmt: malformed
        if (payload + size > n) return null // truncated data chunk
        val count = (size / 2).toInt
        if (count == 0) {
          return new org.apache.spark.sql.catalyst.util.GenericArrayData(
            Array(0L, 0L, 0L, 0L))
        }
        var mn = Long.MaxValue; var mx = Long.MinValue; var sum = 0L
        var k = 0
        while (k < count) {
          val u = le16u(b, payload + k * 2)
          val s = (if (u >= 32768) u - 65536 else u).toLong
          if (s < mn) mn = s
          if (s > mx) mx = s
          sum += s
          k += 1
        }
        return new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array(count.toLong, mn, mx, sum))
      }
      val hop = size + (size & 1L) // chunks are word-aligned
      if (hop > n) return null // declared size cannot advance past the end
      pos = payload + hop.toInt
    }
    null
  }

  private def be32u(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)

  private def isType(b: Array[Byte], i: Int, t: String): Boolean =
    (b(i) & 0xFF) == t.charAt(0) && (b(i + 1) & 0xFF) == t.charAt(1) &&
      (b(i + 2) & 0xFF) == t.charAt(2) && (b(i + 3) & 0xFF) == t.charAt(3)

  /** Bounds of the NEXT box at `pos` within [pos, end):
    * `(payloadStart, boxEnd)` packed as two ints in a long, or -1 on a
    * malformed/truncated box. Handles u32 size, largesize (size==1,
    * u64 follows the type), and size==0 (extends to `end`).
    */
  private def boxAt(b: Array[Byte], pos: Int, end: Int): Long = {
    if (pos + 8 > end) return -1L
    val size32 = be32u(b, pos)
    var header = 8
    var boxEnd = 0L
    if (size32 == 1L) {
      if (pos + 16 > end) return -1L
      val large = (be32u(b, pos + 8) << 32) | be32u(b, pos + 12)
      header = 16
      if (large < header) return -1L
      boxEnd = pos + large
    } else if (size32 == 0L) boxEnd = end.toLong
    else { if (size32 < 8L) return -1L; boxEnd = pos + size32 }
    if (boxEnd > end) return -1L // truncated or size overflow
    ((pos + header).toLong << 32) | boxEnd
  }

  /** Payload bounds of the first child box of `t` in [start, end), or
    * -1. A size==0 box is by definition the last child.
    */
  private def childBox(b: Array[Byte], start: Int, end: Int, t: String): Long = {
    var pos = start
    while (pos + 8 <= end) {
      val box = boxAt(b, pos, end)
      if (box == -1L) return -1L
      val boxEnd = (box & 0xFFFFFFFFL).toInt
      if (isType(b, pos + 4, t)) return box
      if (be32u(b, pos) == 0L) return -1L // last box, not the target
      pos = boxEnd
    }
    -1L
  }

  /** An ISO-BMFF stream must lead with `ftyp` (the format guard — the
    * analog of WAV's "fmt " check). Returns moov payload bounds or -1.
    */
  private def moovOf(b: Array[Byte]): Long = {
    if (b.length < 16) return -1L
    if (be32u(b, 0) < 8L || !isType(b, 4, "ftyp")) return -1L
    childBox(b, 0, b.length, "moov")
  }

  /** The box walk behind [[mp4Dims]]; boxed so "no visual track" is null. */
  def computeMp4Dims(bytes: Array[Byte]): java.lang.Long = {
    val moov = moovOf(bytes)
    if (moov == -1L) return null
    var pos = (moov >>> 32).toInt
    val moovEnd = (moov & 0xFFFFFFFFL).toInt
    while (pos + 8 <= moovEnd) {
      val box = boxAt(bytes, pos, moovEnd)
      if (box == -1L) return null
      val boxEnd = (box & 0xFFFFFFFFL).toInt
      if (isType(bytes, pos + 4, "trak")) {
        val tkhd = childBox(bytes, (box >>> 32).toInt, boxEnd, "tkhd")
        if (tkhd != -1L) {
          val p = (tkhd >>> 32).toInt
          val pEnd = (tkhd & 0xFFFFFFFFL).toInt
          if (p < pEnd) {
            // v0: ctime/mtime/duration u32 → dims at +76/+80;
            // v1: those three widen by 4 bytes each → +88/+92
            val off = if ((bytes(p) & 0xFF) == 1) 88 else 76
            if (p + off + 8 <= pEnd) {
              val w = be32u(bytes, p + off) >>> 16     // 16.16 fixed
              val h = be32u(bytes, p + off + 4) >>> 16
              if (w > 0 && h > 0)
                return java.lang.Long.valueOf((w << 16) | h)
            }
          }
        }
      }
      if (be32u(bytes, pos) == 0L) return null
      pos = boxEnd
    }
    null
  }

  /** The mvhd read behind [[mp4DurationMs]]. */
  def computeMp4DurationMs(bytes: Array[Byte]): java.lang.Long = {
    val moov = moovOf(bytes)
    if (moov == -1L) return null
    val mvhd = childBox(bytes, (moov >>> 32).toInt, (moov & 0xFFFFFFFFL).toInt, "mvhd")
    if (mvhd == -1L) return null
    val p = (mvhd >>> 32).toInt
    val pEnd = (mvhd & 0xFFFFFFFFL).toInt
    if (p >= pEnd) return null
    val (timescale, duration) =
      if ((bytes(p) & 0xFF) == 1) { // v1: u64 ctime/mtime, u64 duration
        if (p + 32 > pEnd) return null
        (be32u(bytes, p + 20),
          (be32u(bytes, p + 24) << 32) | be32u(bytes, p + 28))
      } else {
        if (p + 20 > pEnd) return null
        // all-ones is the spec's "duration unknown" sentinel (common in
        // fragmented MP4, where the real duration lives in mehd)
        val d32 = be32u(bytes, p + 16)
        if (d32 == 0xFFFFFFFFL) return null
        (be32u(bytes, p + 12), d32)
      }
    // v1's all-ones sentinel lands here as a negative signed long
    if (timescale <= 0L || duration < 0L || duration > Long.MaxValue / 1000L)
      return null
    java.lang.Long.valueOf(duration * 1000L / timescale)
  }

  /** Bucket index of a double under sorted range boundaries (binary
    * search; index of the first boundary > value, so values ≤ b(0) map
    * to 0 and values > b(last) map to boundaries.length).
    */
  def rangeBucket(value: Column, boundaries: Array[Double]): Column =
    ExpressionUtils.column(
      RangeBucket(ExpressionUtils.expression(value), boundaries))

  /** Morton/Z-value: interleave the low `bits` bits of two bucket ids
    * (x in the even positions, y in the odd).
    */
  def interleaveBits(x: Column, y: Column, bits: Int): Column =
    ExpressionUtils.column(InterleaveBits(
      ExpressionUtils.expression(x), ExpressionUtils.expression(y), bits))

  /** Full k-function MinHash signature of a shingle-hash array in ONE
    * tight loop: `sig[j] = min over shingles s of (pmod(s,P)*a[j]+b[j]) % P`.
    * Semantically identical to the declarative
    * `aggregate(..., zip_with(acc, coeffs, least(...)))` fold, but that
    * shape allocates a fresh k-element array per shingle per row (the
    * fold's accumulator is immutable); this expression keeps one long[k]
    * accumulator per row. Coefficients must satisfy a in [1, P),
    * b in [0, P) with P = 2^31-1 so products stay in 62 bits.
    */
  def minHashSig(shingles: Column, coeffA: Array[Long], coeffB: Array[Long]): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(shingles), coeffA, coeffB))

  /** Word n-gram identity hashes from per-token hashes in one tight
    * loop — bit-identical to the n-1 chained `zip_with(acc, shifted,
    * xxhash64)` formulation it replaces (each step re-seeds at 42 and
    * folds the accumulator as a value: `hashLong(b, hashLong(a, 42))`,
    * with Spark's null-skip rule replicated), but without n-1 interpreted
    * lambda walks and n-1 intermediate arrays per row. Empty array (not
    * null) below n tokens and for null input, matching the declarative
    * guard.
    */
  def ngramHashes(toksh: Column, n: Int): Column =
    ExpressionUtils.column(NgramHashes(ExpressionUtils.expression(toksh), n))

  /** Dot product of two float/double arrays, accumulated in double in
    * index order — bit-identical to the declarative
    * `aggregate(zip_with(a, b, x*y), 0.0, +)` fold it replaces, but one
    * tight loop instead of a per-element expression-tree walk (higher-
    * order-function lambda bodies are INTERPRETED, so the declarative
    * form paid tree-walk cost per element wherever a dot sat inside a
    * `transform`/`aggregate`, as the quantizer argmax and hyperplane
    * signatures do). Null when lengths differ or an element is null —
    * the same result the zip_with form produced.
    */
  def vecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(VecDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Per-plane dot products of a float vector against a literal plane
    * matrix in one loop — bit-identical to
    * `transform(planesLit, p => vecDot(v, p))`, which evaluated the
    * native dot through an interpreted lambda per plane.
    */
  def vecDotMany(v: Column, planes: Array[Array[Double]]): Column =
    ExpressionUtils.column(VecDotMany(ExpressionUtils.expression(v), planes))

  /** Packed sign-bit hyperplane signature: bit i = (dot(v, planes(i)) > 0).
    * Bit-identical to the reversed `aggregate(planes, 0L, acc*2+bit)`
    * fold (plane 0 on the LSB) with the same index-order dots.
    */
  def hyperplaneSig(v: Column, planes: Array[Array[Double]]): Column =
    ExpressionUtils.column(HyperplaneSig(ExpressionUtils.expression(v), planes))

  /** Cosine similarity `dot/(|a|*|b|)` in ONE pass (three index-order
    * double accumulators) — bit-identical to `dot(a,b)/(norm(a)*norm(b))`
    * composed from the declarative folds (independent accumulators, same
    * per-index operations, Math.sqrt is IEEE-correctly-rounded in both
    * shapes).
    */
  def vecCosine(a: Column, b: Column): Column =
    ExpressionUtils.column(VecCosine(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  // ----- static helpers invoked from both eval and generated code -----

  def computeSimHash(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, SEED)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  private val MinHashPrime = 2147483647L // 2^31-1, matches MinHashDedup.PRIME

  private val EmptyLongArray =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])

  // null input (or < n tokens) yields the EMPTY array, matching the
  // declarative when(size >= n, ...).otherwise(array()) guard
  def computeNgramHashes(arr: ArrayData, n: Int): ArrayData = {
    if (arr == null) return EmptyLongArray
    val len = arr.numElements()
    if (len < n) return EmptyLongArray
    val out = new Array[Long](len - n + 1)
    var i = 0
    while (i < out.length) {
      var accNull = arr.isNullAt(i)
      var acc = if (accNull) 0L else arr.getLong(i)
      var j = 1
      while (j < n) {
        // xxhash64(acc, b): seed 42, fold each NON-NULL input in order
        var h = SEED
        if (!accNull) h = XXH64.hashLong(acc, h)
        if (!arr.isNullAt(i + j)) h = XXH64.hashLong(arr.getLong(i + j), h)
        acc = h
        accNull = false
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  // boxed Double so codegen can branch on the null (length-mismatch /
  // null-element) case — matching zip_with's null propagation
  def computeVecDot(a: ArrayData, b: ArrayData,
      aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  // one float-vector x literal-double-plane dot, shared by the many-plane
  // kernels; returns null-signal via NaN never — inputs are non-null by
  // contract (planes are literals, v checked by the caller)
  private def dotPlane(v: ArrayData, plane: Array[Double],
      vFloat: Boolean): Double = {
    val n = math.min(v.numElements(), plane.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += (if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)) * plane(i)
      i += 1
    }
    acc
  }

  def computeVecDotMany(v: ArrayData, planes: Array[Array[Double]],
      vFloat: Boolean): ArrayData = {
    val out = new Array[Double](planes.length)
    var t = 0
    while (t < planes.length) {
      out(t) = dotPlane(v, planes(t), vFloat)
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def computeHyperplaneSig(v: ArrayData, planes: Array[Array[Double]],
      vFloat: Boolean): Long = {
    var sig = 0L
    var t = 0
    while (t < planes.length) {
      if (dotPlane(v, planes(t), vFloat) > 0.0) sig |= 1L << t
      t += 1
    }
    sig
  }

  def computeVecCosine(a: ArrayData, b: ArrayData,
      aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def computeMinHashSig(arr: ArrayData, coeffA: Array[Long],
      coeffB: Array[Long]): ArrayData = {
    val k = coeffA.length
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, MinHashPrime)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        // pmod(s, P): s may be any long (xxhash64 output)
        val m = arr.getLong(i) % MinHashPrime
        val h = if (m < 0) m + MinHashPrime else m
        var j = 0
        while (j < k) {
          // h < P, a < P: product < 2^62 — no overflow, plain % is pmod
          val v = (h * coeffA(j) + coeffB(j)) % MinHashPrime
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  /** Greedy left-to-right application of ONE BPE merge: every
    * non-overlapping (left,right) adjacency concatenates. "aaa" under
    * (a,a) → ["aa","a"]; "aaaa" → ["aa","aa"] (the scan resumes AFTER
    * the merged pair — the Sennrich convention). Null elements never
    * match and pass through.
    */
  def computePairMerge(arr: ArrayData, left: UTF8String,
      right: UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var len = 0
    var i = 0
    while (i < n) {
      if (i < n - 1 && !arr.isNullAt(i) && !arr.isNullAt(i + 1) &&
          arr.getUTF8String(i).equals(left) &&
          arr.getUTF8String(i + 1).equals(right)) {
        out(len) = UTF8String.concat(left, right)
        len += 1
        i += 2
      } else {
        out(len) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
        len += 1
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (len == n) out else out.take(len))
  }

  /** Binary search: index of the first boundary strictly greater than
    * `v` (boundaries sorted ascending). NaN sorts above everything →
    * last bucket.
    */
  def computeRangeBucket(v: Double, boundaries: Array[Double]): Int = {
    if (v.isNaN) return boundaries.length
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      // NaN boundary compares false → treated as +infinity
      if (boundaries(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }

  def computeInterleave(x: Long, y: Long, bits: Int): Long = {
    var out = 0L
    var i = 0
    while (i < bits) {
      out |= ((x >>> i) & 1L) << (2 * i)
      out |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    out
  }

  def computeFingerprint(s: UTF8String, window: Int): Long = {
    val bytes = s.getBytes
    if (bytes.length <= window) {
      XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, SEED)
    } else {
      var min = Long.MaxValue
      var i = 0
      val last = bytes.length - window
      while (i <= last) {
        val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + i, window, SEED)
        if (h < min) min = h
        i += 1
      }
      min
    }
  }
}

case class NgramHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 2, "ngramHashes needs n >= 2")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // null input maps to the EMPTY array, so the result itself is never null
  override def nullable: Boolean = false
  override def prettyName: String = "ngram_hashes"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    GraftExpressions.computeNgramHashes(
      if (v == null) null else v.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        org.apache.spark.sql.graft.GraftExpressions.computeNgramHashes(
          ${childGen.isNull} ? null : ${childGen.value}, $n);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

abstract class VecBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // force a mutable isNull slot in codegen: the result can be null (length
  // mismatch) even when both children are non-null
  override def nullable: Boolean = true

  protected lazy val aFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected lazy val bFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float|double> inputs")
    }

  /** Fully-qualified static method computing the boxed result. */
  protected def staticMethod: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("vecRes")
      s"""
      java.lang.Double $tmp = $staticMethod($a, $b, $aFloat, $bFloat);
      if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
      """
    })
}

case class VecDot(left: Expression, right: Expression) extends VecBinaryExpression {
  override def prettyName: String = "vec_dot"
  override protected def staticMethod: String =
    "org.apache.spark.sql.graft.GraftExpressions.computeVecDot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftExpressions.computeVecDot(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aFloat, bFloat)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

case class VecCosine(left: Expression, right: Expression) extends VecBinaryExpression {
  override def prettyName: String = "vec_cosine"
  override protected def staticMethod: String =
    "org.apache.spark.sql.graft.GraftExpressions.computeVecCosine"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftExpressions.computeVecCosine(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aFloat, bFloat)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosine =
    copy(left = l, right = r)
}

case class MinHashSig(child: Expression, coeffA: Array[Long], coeffB: Array[Long])
    extends UnaryExpression with ExpectsInputTypes {
  require(coeffA.length == coeffB.length && coeffA.nonEmpty,
    "coefficient arrays must be non-empty and equal-length")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    GraftExpressions.computeMinHashSig(input.asInstanceOf[ArrayData], coeffA, coeffB)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashCoeffA", coeffA, "long[]")
    val bRef = ctx.addReferenceObj("minhashCoeffB", coeffB, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.GraftExpressions.computeMinHashSig($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Shared shape of the literal-plane-matrix kernels: a float-vector child
  * against `planes` held as a codegen reference object. Inputs are
  * non-null-element `array<float>` by caller contract (embedding columns);
  * a null vector propagates to a null result via the null-safe paths.
  */
abstract class PlanesExpression extends UnaryExpression {
  // NO statements in this body: the abstract base is not itself
  // Serializable (scalac adds Serializable to the case classes only), so
  // Java deserialization on executors runs THIS no-arg constructor with
  // fields unset — any field-touching require here would NPE mid-task.
  def planes: Array[Array[Double]]

  // float or double element type, resolved per plan (def, not lazy val:
  // see the serialization note above)
  protected def vFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<float|double> input")
    }

  /** Fully-qualified static compute method `(ArrayData, double[][], boolean) => result`. */
  protected def staticMethod: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, c => s"$staticMethod($c, $planesRef, $vFloat)")
  }
}

case class VecDotMany(child: Expression, planes: Array[Array[Double]])
    extends PlanesExpression {
  require(planes.nonEmpty, "planes must be non-empty")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_dot_many"
  override protected def staticMethod: String =
    "org.apache.spark.sql.graft.GraftExpressions.computeVecDotMany"
  override protected def nullSafeEval(input: Any): Any =
    GraftExpressions.computeVecDotMany(input.asInstanceOf[ArrayData], planes, vFloat)
  override protected def withNewChildInternal(newChild: Expression): VecDotMany =
    copy(child = newChild)
}

case class HyperplaneSig(child: Expression, planes: Array[Array[Double]])
    extends PlanesExpression {
  require(planes.nonEmpty && planes.length <= 64,
    "need 1..64 planes to fit one long signature")
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"
  override protected def staticMethod: String =
    "org.apache.spark.sql.graft.GraftExpressions.computeHyperplaneSig"
  override protected def nullSafeEval(input: Any): Any =
    GraftExpressions.computeHyperplaneSig(input.asInstanceOf[ArrayData], planes, vFloat)
  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

case class SimHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    GraftExpressions.computeSimHash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.GraftExpressions.computeSimHash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_distance"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingDistance =
    copy(left = l, right = r)
}

case class DocFingerprint(child: Expression, window: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(window > 0, "window must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "doc_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    GraftExpressions.computeFingerprint(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.GraftExpressions.computeFingerprint($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): DocFingerprint =
    copy(child = newChild)
}

/** One BPE merge step over a symbol array (see
  * GraftExpressions.computePairMerge). The pair is held as plain Strings
  * for serialization and converted once per codegen/eval setup, not per
  * row.
  */
case class PairMerge(child: Expression, mergeLeft: String, mergeRight: String)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "pair_merge"

  @transient private lazy val leftU = UTF8String.fromString(mergeLeft)
  @transient private lazy val rightU = UTF8String.fromString(mergeRight)

  override protected def nullSafeEval(input: Any): Any =
    GraftExpressions.computePairMerge(input.asInstanceOf[ArrayData], leftU, rightU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("pmLeft", UTF8String.fromString(mergeLeft),
      "org.apache.spark.unsafe.types.UTF8String")
    val rRef = ctx.addReferenceObj("pmRight", UTF8String.fromString(mergeRight),
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.GraftExpressions.computePairMerge($c, $lRef, $rRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PairMerge =
    copy(child = newChild)
}

/** Bucket index under sorted range boundaries — the quantile-bucket step
  * of z-order clustering (see graft.sources.Sources.zorderWrite).
  */
case class RangeBucket(child: Expression, boundaries: Array[Double])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "range_bucket"

  override protected def nullSafeEval(input: Any): Any =
    GraftExpressions.computeRangeBucket(input.asInstanceOf[Double], boundaries)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("rangeBuckets", boundaries, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.GraftExpressions.computeRangeBucket($c, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): RangeBucket =
    copy(child = newChild)
}

/** JPEG marker-segment walk to the first SOF's packed dimensions. */
case class JpegDims(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  // force a mutable isNull slot: non-JPEG / SOF-less bytes yield null
  // even when the child is non-null
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_dims"

  override protected def nullSafeEval(input: Any): Any =
    GraftExpressions.computeJpegDims(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("jpegDims")
      s"""
      java.lang.Long $tmp = org.apache.spark.sql.graft.GraftExpressions.computeJpegDims($c);
      if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): JpegDims =
    copy(child = newChild)
}

/** ISO-BMFF visual-track dims via the nested box walk (see
  * [[GraftExpressions.computeMp4Dims]]).
  */
case class Mp4Dims(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "mp4_dims"

  override protected def nullSafeEval(input: Any): Any =
    GraftExpressions.computeMp4Dims(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("mp4Dims")
      s"""
      java.lang.Long $tmp = org.apache.spark.sql.graft.GraftExpressions.computeMp4Dims($c);
      if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Mp4Dims =
    copy(child = newChild)
}

/** ISO-BMFF presentation duration in ms from the movie header (see
  * [[GraftExpressions.computeMp4DurationMs]]).
  */
case class Mp4DurationMs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "mp4_duration_ms"

  override protected def nullSafeEval(input: Any): Any =
    GraftExpressions.computeMp4DurationMs(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("mp4Dur")
      s"""
      java.lang.Long $tmp = org.apache.spark.sql.graft.GraftExpressions.computeMp4DurationMs($c);
      if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Mp4DurationMs =
    copy(child = newChild)
}

/** Uncompressed-24bpp BMP pixel statistics (see
  * [[GraftExpressions.computeBmpPixelStats]]).
  */
case class BmpPixelStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bmp_pixel_stats"

  override protected def nullSafeEval(input: Any): Any =
    GraftExpressions.computeBmpPixelStats(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("bmpStats")
      s"""
      org.apache.spark.sql.catalyst.util.ArrayData $tmp =
        org.apache.spark.sql.graft.GraftExpressions.computeBmpPixelStats($c);
      if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): BmpPixelStats =
    copy(child = newChild)
}

/** PCM-16 WAV sample statistics via the RIFF chunk walk (see
  * [[GraftExpressions.computeWavSampleStats]]).
  */
case class WavSampleStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "wav_sample_stats"

  override protected def nullSafeEval(input: Any): Any =
    GraftExpressions.computeWavSampleStats(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("wavStats")
      s"""
      org.apache.spark.sql.catalyst.util.ArrayData $tmp =
        org.apache.spark.sql.graft.GraftExpressions.computeWavSampleStats($c);
      if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): WavSampleStats =
    copy(child = newChild)
}

/** Morton/Z-value bit interleave of two bucket ids. */
case class InterleaveBits(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftExpressions.computeInterleave(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.GraftExpressions.computeInterleave($a, $b, $bits)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): InterleaveBits =
    copy(left = l, right = r)
}
