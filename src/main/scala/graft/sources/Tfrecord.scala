package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
  * Envelope: ≤ 16M records per shard, ≤ 64 MiB per record, archives
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

  // parsing is LINEAR in bytes, so the record cap guards only the
  // degenerate minimum-size-record flood; a production shard of tiny
  // examples legitimately holds millions of records (the sf100 rung
  // caught a 100k cap rejecting our own 166k-record shards)
  private[graft] val MaxRecords = 16 << 20
  private[graft] val MaxRecordLen = 64L << 20

  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** One parsed record row: (rec_idx, n_bytes, byte_sum) over
    * double-CRC-verified bytes; None on any integrity violation.
    */
  private[graft] def tfrecordRows(raw: Array[Byte],
      c: java.util.zip.CRC32C): Option[Seq[(Int, Long, Long)]] =
    tfrecordRowsAndBytes(raw, c).map(_._1)

  /** [[tfrecordRows]] plus the DECOMPRESSED shard bytes, so a caller
    * that re-walks record offsets (readShards' id-prefix pass) reuses
    * the one gunzip this parse already paid instead of inflating the
    * shard a second time.
    */
  private[graft] def tfrecordRowsAndBytes(raw: Array[Byte],
      c: java.util.zip.CRC32C):
      Option[(Seq[(Int, Long, Long)], Array[Byte])] = {
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
    Some((out.result(), b))
  }

  // ------------------------------------------------------ export path

  /** Write (id, payload) rows as TFRecord shards — the training
    * pipeline's LAST mile (a curated corpus leaves the engine as the
    * shards a trainer consumes). One `.tfrecord` file per non-empty
    * partition, streamed record-by-record through the Hadoop FS API
    * executor-side (HDFS/object stores work exactly like parquet
    * writes; nothing is buffered beyond one record). Each record's
    * payload is an 8-byte LE `id` prefix + the given bytes, so
    * read-back re-keys rows without a join. Commit follows Spark's own
    * per-task staging contract: each ATTEMPT streams into its own
    * hidden temp (`.part-<pid>.tfrecord.<taskAttemptId>.tmp` — dot
    * names are invisible to Spark's file listings) and renames to the
    * deterministic final name only once COMPLETE. A retried task never
    * truncates a live file; a speculative or zombie attempt racing the
    * winner loses the rename (no-replace destination) and deletes only
    * its own temp — interleaved writes into the final shard cannot
    * happen. Requires deterministic upstream partitions, like any
    * deterministic-name committer. EAGER (runs a job); returns
    * (path, n_records) per shard written.
    */
  def writeShards(rows: Dataset[(Long, Array[Byte])],
      outDir: String): Array[(String, Long)] = {
    val spark = rows.sparkSession
    import spark.implicits._
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    rows.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val tc = org.apache.spark.TaskContext.get()
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val path = new org.apache.hadoop.fs.Path(outDir,
          f"part-$pid%05d.tfrecord")
        val tmp = new org.apache.hadoop.fs.Path(outDir,
          f".part-$pid%05d.tfrecord.${tc.taskAttemptId()}.tmp")
        val fs = path.getFileSystem(hconf.value)
        val os = fs.create(tmp, true)
        val c = new java.util.zip.CRC32C()
        var n = 0L
        try {
          while (it.hasNext) {
            val (id, payload) = it.next()
            val rec = new java.io.ByteArrayOutputStream(
              payload.length + 8)
            le32(rec, id & 0xFFFFFFFFL); le32(rec, id >>> 32)
            rec.write(payload)
            val r = rec.toByteArray
            val lenB = new java.io.ByteArrayOutputStream(8)
            le64(lenB, r.length.toLong)
            val lb = lenB.toByteArray
            os.write(lb)
            val crcB = new java.io.ByteArrayOutputStream(4)
            le32(crcB, maskCrc(crc32c(c, lb, 0, 8)))
            os.write(crcB.toByteArray)
            os.write(r)
            val crcD = new java.io.ByteArrayOutputStream(4)
            le32(crcD, maskCrc(crc32c(c, r, 0, r.length)))
            os.write(crcD.toByteArray)
            n += 1
          }
        } finally os.close()
        // publish: rename refuses an existing destination, so exactly
        // one attempt's COMPLETE temp becomes the shard. A retried
        // attempt whose predecessor already published (job marked the
        // task failed anyway) or a speculative loser just cleans up —
        // n is identical either way (deterministic partition).
        if (!fs.rename(tmp, path)) {
          fs.delete(tmp, false)
          if (!fs.exists(path)) sys.error(
            s"writeShards: failed to publish $path and no winner exists")
        }
        Iterator.single((path.toString, n))
      }
    }.collect() // one small row per shard — driver-bounded by design
  }

  /** Read back a directory of id-prefixed shards written by
    * [[writeShards]]: one row (media_id, n_bytes) per record, both
    * CRCs verified, n_bytes = payload length WITHOUT the 8-byte
    * prefix. A corrupt shard yields one (-1, null) row keyed to the
    * rejection contract (file identity lives in the path, which the
    * caller can re-derive; the in-table sentinel keeps rejection
    * visible).
    */
  def readShards(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select(col("content")).as[Array[Byte]]
      .mapPartitions { batch =>
        val c = new java.util.zip.CRC32C()
        batch.flatMap { raw =>
          tfrecordRowsAndBytes(raw, c) match {
            case Some((rows, b)) if rows.forall(_._2 >= 8) =>
              // re-walk each record's 8-byte LE prefix over the SAME
              // decompressed buffer the framing+CRC parse validated —
              // no second gunzip
              var p = 0
              rows.iterator.map { case (_, len, _) =>
                val dataOff = p + 12
                val id = u32le(b, dataOff) | (u32le(b, dataOff + 4) << 32)
                p = dataOff + len.toInt + 4
                (id, Some(len - 8))
              }
            case _ => // corrupt, or a record too short to carry the id
              Iterator.single((-1L, Option.empty[Long]))
          }
        }
      }.toDF("media_id", "n_bytes")
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
