package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tfrecord

/** The TFRecord reader's load-bearing claims: spec framing with
  * masked-CRC32C verification on BOTH the length header and the data
  * (Castagnoli polynomial — plain CRC-32 must fail), whole-file gzip,
  * and a rejection lane flipping one bit per integrity surface.
  */
class TfrecordSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(b: Array[Byte]) =
    Tfrecord.tfrecordRows(b, new java.util.zip.CRC32C())

  test("masked CRC32C matches the TFRecord spec's published test " +
      "vector shape (mask is invertible, distinct from the input)") {
    // spec mask: ((c >> 15) | (c << 17)) + 0xa282ead8 over uint32
    assert(Tfrecord.maskCrc(0L) === 0xa282ead8L)
    val c = 0x12345678L
    val m = Tfrecord.maskCrc(c)
    assert(m !== c)
    // unmask: rotate right 17 after subtracting the constant
    val un = (m - 0xa282ead8L) & 0xFFFFFFFFL
    assert((((un >>> 17) | (un << 15)) & 0xFFFFFFFFL) === c)
  }

  test("planted corpus round trip recovers the q114 formula exactly " +
      "(plain and gzip shards)") {
    val docs = Tables.documents(spark, SparkTestSession.sfTiny)
    val out = Tfrecord.tfrecordRecords(Tfrecord.fromDocumentsTfrecord(docs))
      .as[(Long, Option[Int], Option[Long], Option[Long])].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (id, rs) =>
      val nrec = (3 + id % 5).toInt
      assert(rs.length === nrec, s"doc $id record count")
      rs.sortBy(_._2).zipWithIndex.foreach { case ((_, idx, nb, bs), r) =>
        val len = Tfrecord.plantedLen(id, r)
        val sum = (0 until len).map(j =>
          Tfrecord.plantedByte(id, r, j).toLong).sum
        assert((idx, nb, bs) === ((Some(r), Some(len.toLong), Some(sum))),
          s"doc $id rec $r")
      }
    }
  }

  test("the polynomial matters: framing computed with ZIP's CRC-32 " +
      "instead of CRC-32C is rejected") {
    // reframe one record using java.util.zip.CRC32 (wrong polynomial)
    val data = "training example bytes".getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Unit = { out.write((v & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 24) & 0xff).toInt) }
    val lenB = new Array[Byte](8)
    lenB(0) = data.length.toByte // LE, fits in one byte here
    out.write(lenB)
    val c32 = new java.util.zip.CRC32()
    c32.update(lenB); le32(Tfrecord.maskCrc(c32.getValue))
    out.write(data)
    c32.reset(); c32.update(data); le32(Tfrecord.maskCrc(c32.getValue))
    assert(rows(out.toByteArray) === None)
  }

  test("export round trip: writeShards emits verifiable id-prefixed " +
      "shards that readShards recovers exactly") {
    val root = java.nio.file.Files.createTempDirectory("graft-tfw")
    val out = s"$root/shards"
    val data = (0L until 37L).map(i =>
      (i * 31 + 5, Array.tabulate((10 + i % 50).toInt)(j =>
        ((i + j * 3) % 256).toByte)))
    val ds = spark.createDataset(data).repartition(4)
    val shards = Tfrecord.writeShards(ds, out)
    assert(shards.length === 4) // one file per non-empty partition
    assert(shards.map(_._2).sum === 37L)
    // every shard passes the verifying reader's framing+CRC walk
    shards.foreach { case (p, n) =>
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(new java.net.URI(
          if (p.startsWith("file:")) p else s"file:$p")))
      assert(rows(bytes).exists(_.length.toLong == n), p)
    }
    val got = Tfrecord.readShards(spark, out)
      .as[(Long, Option[Long])].collect().toSet
    assert(got === data.map { case (id, b) =>
      (id, Some(b.length.toLong)) }.toSet)

    // empty partitions write no file
    val sparse = spark.createDataset(Seq((1L, Array[Byte](9))))
      .repartition(8)
    val out2 = s"$root/sparse"
    assert(Tfrecord.writeShards(sparse, out2).length === 1)

    // one flipped byte in one shard -> that shard's loud (-1, null) row
    val victim = new java.io.File(new java.net.URI(
      if (shards.head._1.startsWith("file:")) shards.head._1
      else s"file:${shards.head._1}"))
    val vb = java.nio.file.Files.readAllBytes(victim.toPath)
    vb(vb.length / 2) = (vb(vb.length / 2) ^ 1).toByte
    java.nio.file.Files.write(victim.toPath, vb)
    // drop Hadoop's local-FS .crc sidecar so the mutation reaches OUR
    // record-level CRCs instead of tripping the filesystem layer
    val sidecar = new java.io.File(victim.getParentFile,
      s".${victim.getName}.crc")
    if (sidecar.exists()) assert(sidecar.delete())
    val reread = Tfrecord.readShards(spark, out)
      .as[(Long, Option[Long])].collect()
    assert(reread.count(_._1 == -1L) === 1, "corrupt shard visible")
    assert(reread.count(_._1 != -1L) === (37 - shards.head._2).toInt)
  }

  test("rejection lane: every integrity surface rejects the whole " +
      "shard (None, never partial rows)") {
    val recs = Seq("first record".getBytes("US-ASCII"),
      Array.tabulate(500)(i => (i * 7 % 256).toByte),
      "third".getBytes("US-ASCII"))
    val ok = Tfrecord.tfrecordBytesFromRecords(recs)
    assert(rows(ok).exists(_.length == 3))

    // flip one data byte of record 2 -> data CRC mismatch
    val d = ok.clone; d(12 + 12 + 4 + 12 + 40) =
      (d(12 + 12 + 4 + 12 + 40) ^ 1).toByte
    assert(rows(d) === None, "data bit flip")

    // flip one length byte -> length CRC mismatch
    val l = ok.clone; l(1) = (l(1) ^ 1).toByte
    assert(rows(l) === None, "length bit flip")

    // flip a CRC byte itself
    val c = ok.clone; c(8) = (c(8) ^ 1).toByte
    assert(rows(c) === None, "crc bit flip")

    // truncation: mid-data and mid-header
    assert(rows(ok.dropRight(3)) === None, "torn trailing crc")
    assert(rows(ok.dropRight(ok.length - 5)) === None, "torn header")

    // trailing garbage after the last record
    assert(rows(ok ++ Array[Byte](1, 2, 3)) === None, "trailing garbage")

    // hostile declared length
    val h = ok.clone
    h(4) = 0x7f.toByte // length high bytes -> huge
    assert(rows(h) === None, "hostile length")

    // corrupt gzip wrapper
    assert(rows(Array[Byte](0x1f, 0x8b.toByte, 9, 9, 9)) === None)

    // empty shard is a valid zero-record shard
    assert(rows(Array.empty[Byte]) === Some(Seq()))

    // rejection visible in the DataFrame op
    val df = Tfrecord.tfrecordRecords(spark.createDataset(Seq((4L, d))))
    val r = df.collect()
    assert(r.length === 1 && r(0).getLong(0) === 4L && r(0).isNullAt(1))
  }
}
