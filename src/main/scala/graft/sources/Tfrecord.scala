package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** TFRecord reader — the length-framed shard format training examples
  * actually ship in (TensorFlow's `tf.data.TFRecordDataset`; the
  * format is public in the TensorFlow source, `io/record_writer.cc`).
  * Each record is:
  *
  * {{{
  *   uint64 length                 (little-endian)
  *   uint32 masked_crc32c(length)  (LE, over the 8 length bytes)
  *   byte   data[length]
  *   uint32 masked_crc32c(data)    (LE)
  * }}}
  *
  * where `masked_crc(c) = ((c >>> 15) | (c << 17)) + 0xa282ead8` over
  * CRC-32C (Castagnoli — `java.util.zip.CRC32C`, a DIFFERENT
  * polynomial from ZIP's CRC-32; using the wrong one fails every
  * record). The two CRCs are the format's whole integrity story — a
  * reader that skips them silently ships torn or bit-rotted examples
  * into a training run, so this reader verifies BOTH on every record
  * and rejects the archive on the first mismatch, truncation, or
  * trailing garbage. `.tfrecord.gz` shards (whole-file gzip) are
  * handled via the shared [[Warc.gunzipAll]].
  *
  * Envelope: ≤ 100k records per shard, ≤ 64 MiB per record, archives
  * outside it → one all-null row, never partial rows.
  *
  * Scale notes: flatMap in bounded mapPartitions, no shuffle; one
  * CRC32C instance per partition.
  */
object Tfrecord {

  /** masked_crc32c per the TFRecord spec (uint32 arithmetic). */
  private[graft] def maskCrc(crc: Long): Long =
    ((((crc >>> 15) | (crc << 17)) & 0xFFFFFFFFL) + 0xa282ead8L) &
      0xFFFFFFFFL

  private def crc32c(c: java.util.zip.CRC32C, b: Array[Byte], off: Int,
      len: Int): Long = {
    c.reset(); c.update(b, off, len); c.getValue
  }

  // ----------------------------------------------------------- writer

  private def le32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
    o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
  }
  private def le64(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    le32(o, v & 0xFFFFFFFFL); le32(o, v >>> 32)
  }

  /** Assemble records into a TFRecord shard (spec framing + CRCs). */
  private[graft] def tfrecordBytesFromRecords(
      recs: Seq[Array[Byte]]): Array[Byte] = {
    val c = new java.util.zip.CRC32C()
    val out = new java.io.ByteArrayOutputStream()
    recs.foreach { r =>
      val lenB = new java.io.ByteArrayOutputStream()
      le64(lenB, r.length.toLong)
      val lb = lenB.toByteArray
      out.write(lb)
      le32(out, maskCrc(crc32c(c, lb, 0, 8)))
      out.write(r)
      le32(out, maskCrc(crc32c(c, r, 0, r.length)))
    }
    out.toByteArray
  }

  private[graft] def plantedByte(id: Long, r: Int, j: Int): Int =
    ((id + r * 13L + j * 3L) % 256).toInt

  private[graft] def plantedLen(id: Long, r: Int): Int =
    (16 + (id + r) % 64).toInt

  /** Planted corpus shard for doc `id`: nrec = 3 + id%5 records of
    * planted bytes; even ids are `.tfrecord.gz` (whole-file gzip).
    */
  private[graft] def tfrecordBytes(id: Long): Array[Byte] = {
    val nrec = (3 + id % 5).toInt
    val plain = tfrecordBytesFromRecords((0 until nrec).map { r =>
      Array.tabulate(plantedLen(id, r))(j => plantedByte(id, r, j).toByte)
    })
    if (id % 2 == 0) {
      val gz = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(gz)
      g.write(plain); g.close()
      gz.toByteArray
    } else plain
  }

  /** Planted TFRecord shards over the documents table. */
  def fromDocumentsTfrecord(docs: DataFrame): Dataset[(Long, Array[Byte])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, tfrecordBytes(id))))
  }

  // ----------------------------------------------------------- reader

  private val MaxRecords = 100000
  private val MaxRecordLen = 64L << 20

  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** One parsed record row: (rec_idx, n_bytes, byte_sum) over
    * double-CRC-verified bytes; None on any integrity violation.
    */
  private[graft] def tfrecordRows(raw: Array[Byte],
      c: java.util.zip.CRC32C): Option[Seq[(Int, Long, Long)]] = {
    val b =
      if (Warc.isGzip(raw)) Warc.gunzipAll(raw).getOrElse(return None)
      else raw
    val out = Seq.newBuilder[(Int, Long, Long)]
    var p = 0
    var i = 0
    while (p < b.length) {
      if (i >= MaxRecords) return None
      if (p + 12 > b.length) return None // torn length header
      val len = u32le(b, p) | (u32le(b, p + 4) << 32)
      if (len < 0 || len > MaxRecordLen) return None
      if (maskCrc(crc32c(c, b, p, 8)) != u32le(b, p + 8))
        return None // length CRC mismatch
      val dataOff = p + 12
      if (dataOff + len + 4 > b.length) return None // torn data
      if (maskCrc(crc32c(c, b, dataOff, len.toInt)) !=
        u32le(b, dataOff + len.toInt)) return None // data CRC mismatch
      var sum = 0L
      var j = dataOff
      val end = dataOff + len.toInt
      while (j < end) { sum += (b(j) & 0xff); j += 1 }
      out += ((i, len, sum))
      p = end + 4
      i += 1
    }
    Some(out.result())
  }

  /** TFRecord shard → one row per record, as a DataFrame op; shards
    * outside the envelope yield one all-null row keyed by media_id.
    */
  def tfrecordRecords(shards: Dataset[(Long, Array[Byte])]): DataFrame = {
    val spark = shards.sparkSession
    import spark.implicits._
    shards.mapPartitions { batch =>
      val c = new java.util.zip.CRC32C()
      batch.flatMap { case (id, raw) =>
        tfrecordRows(raw, c) match {
          case Some(rows) => rows.iterator.map { case (i, nb, bs) =>
            (id, Some(i), Some(nb), Some(bs))
          }
          case None => Iterator.single((id, Option.empty[Int],
            Option.empty[Long], Option.empty[Long]))
        }
      }
    }.toDF("media_id", "rec_idx", "n_bytes", "byte_sum")
  }
}
