package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** tf.Example decode — what TFRecord payloads actually ARE in a
  * training pipeline: a protobuf message (`tensorflow/core/example/
  * example.proto`, public) whose `Features` carry a map from feature
  * name to a `BytesList`, `FloatList` (packed 32-bit IEEE), or
  * `Int64List` (varint). This module hand-rolls the protobuf WIRE
  * FORMAT for exactly that message tree:
  *
  *   - base-128 varints (≤ 10 bytes, canonical-length not required),
  *     field tags `(field_no << 3) | wire_type`, length-delimited
  *     submessages, little-endian 32-bit floats;
  *   - packed AND unpacked repeated scalars (both are legal on the
  *     wire for the same field — the corpus plants both shapes);
  *   - the protobuf robustness rule real decoders live by: UNKNOWN
  *     fields are SKIPPED by wire type, never an error (the corpus
  *     plants an unknown field inside every message so a decoder that
  *     chokes on them cannot pass), while structural violations —
  *     truncated varints, lengths past the buffer, a wire type that
  *     contradicts the schema — reject the whole example loudly.
  *
  * Emits one row per (example, feature): kind, value count, and an
  * exact value sum (the planted floats are small integers, exactly
  * representable in float32, so the DuckDB oracle replays the sum
  * arithmetically with no tolerance games).
  *
  * Envelope: ≤ 4096 features per example, ≤ 64 MiB per feature list;
  * an example outside it → one all-null row keyed by media_id.
  *
  * Scale notes: flatMap in bounded mapPartitions, no shuffle — the
  * same shape as the [[Tfrecord]] framing layer it sits under.
  */
object TfExample {

  // ----------------------------------------------------------- writer

  private def varint(o: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) { o.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    o.write(v.toInt)
  }
  private def tag(o: java.io.ByteArrayOutputStream, field: Int,
      wire: Int): Unit = varint(o, (field.toLong << 3) | wire)
  private def lenDelim(o: java.io.ByteArrayOutputStream, field: Int,
      body: Array[Byte]): Unit = {
    tag(o, field, 2); varint(o, body.length.toLong); o.write(body)
  }
  private def f32le(o: java.io.ByteArrayOutputStream, f: Float): Unit = {
    val bits = java.lang.Float.floatToIntBits(f)
    o.write(bits & 0xff); o.write((bits >> 8) & 0xff)
    o.write((bits >> 16) & 0xff); o.write((bits >> 24) & 0xff)
  }
  private def bytes(f: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream(); f(o); o.toByteArray
  }

  /** One feature value list for the writer. */
  private[graft] sealed trait FList
  private[graft] final case class BytesL(vs: Seq[Array[Byte]]) extends FList
  private[graft] final case class FloatL(vs: Seq[Float],
      packed: Boolean) extends FList
  private[graft] final case class IntL(vs: Seq[Long],
      packed: Boolean) extends FList

  /** Serialize a tf.Example: Example{1: Features{1: repeated
    * map-entry{1: key, 2: Feature{1|2|3: list}}}}; `plantUnknown`
    * injects an unknown field (number 99) at every message level.
    */
  private[graft] def exampleBytes(features: Seq[(String, FList)],
      plantUnknown: Boolean): Array[Byte] = {
    def featureMsg(fl: FList): Array[Byte] = bytes { o =>
      if (plantUnknown) { tag(o, 99, 0); varint(o, 12345L) }
      fl match {
        case BytesL(vs) =>
          lenDelim(o, 1, bytes { b =>
            vs.foreach(v => lenDelim(b, 1, v))
          })
        case FloatL(vs, packed) =>
          lenDelim(o, 2, bytes { b =>
            if (packed) lenDelim(b, 1, bytes(p => vs.foreach(f32le(p, _))))
            else vs.foreach { v => tag(b, 1, 5); f32le(b, v) }
          })
        case IntL(vs, packed) =>
          lenDelim(o, 3, bytes { b =>
            if (packed) lenDelim(b, 1, bytes(p => vs.foreach(varint(p, _))))
            else vs.foreach { v => tag(b, 1, 0); varint(b, v) }
          })
      }
    }
    val featuresMsg = bytes { o =>
      if (plantUnknown) lenDelim(o, 99, "ignore me".getBytes("UTF-8"))
      features.foreach { case (k, fl) =>
        lenDelim(o, 1, bytes { e => // map entry
          lenDelim(e, 1, k.getBytes("UTF-8"))
          lenDelim(e, 2, featureMsg(fl))
        })
      }
    }
    bytes { o =>
      lenDelim(o, 1, featuresMsg)
      if (plantUnknown) { tag(o, 99, 1) // unknown 64-bit field
        (0 until 8).foreach(_ => o.write(0x5a)) }
    }
  }

  private[graft] def plantedInt(id: Long, j: Int): Long =
    (id + j * 7L) % 1000L
  private[graft] def plantedFloat(id: Long, j: Int): Float =
    ((id + j * 3L) % 512L).toFloat // small ints: exact in float32
  private[graft] def plantedByteV(id: Long, j: Int): Int =
    (97 + (id + j * 5L) % 26).toInt

  private[graft] def plantedNTokens(id: Long): Int = (8 + id % 24).toInt
  private[graft] def plantedNScores(id: Long): Int = (2 + id % 6).toInt
  private[graft] def plantedTextLen(id: Long): Int = (10 + id % 30).toInt

  /** Planted corpus example for doc `id`: features `tokens`
    * (Int64List, packed for even ids), `score` (FloatList, packed for
    * ids %3!=0), `text` (BytesList of two byte strings), with unknown
    * fields planted at EVERY message level for ids %2==0.
    */
  private[graft] def tfExampleBytes(id: Long): Array[Byte] = {
    val toks = (0 until plantedNTokens(id)).map(j => plantedInt(id, j))
    val scores = (0 until plantedNScores(id)).map(j => plantedFloat(id, j))
    val t1 = Array.tabulate(plantedTextLen(id))(j =>
      plantedByteV(id, j).toByte)
    val t2 = Array.tabulate((5 + id % 7).toInt)(j =>
      plantedByteV(id + 1, j).toByte)
    exampleBytes(Seq(
      "tokens" -> IntL(toks, packed = id % 2 == 0),
      "score" -> FloatL(scores, packed = id % 3 != 0),
      "text" -> BytesL(Seq(t1, t2))),
      plantUnknown = id % 2 == 0)
  }

  /** Planted tf.Example payloads over the documents table. */
  def fromDocumentsTfExample(docs: DataFrame): Dataset[(Long, Array[Byte])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, tfExampleBytes(id))))
  }

  // ----------------------------------------------------------- reader

  private object Reject extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private[graft] val MaxFeatures = 4096
  private[graft] val MaxListLen = 64L << 20

  private final class Reader(b: Array[Byte], var p: Int, val end: Int) {
    def hasMore: Boolean = p < end
    def varint(): Long = {
      var v = 0L
      var shift = 0
      var n = 0
      while (true) {
        if (p >= end || n >= 10) throw Reject
        val x = b(p) & 0xff
        p += 1; n += 1
        v |= (x & 0x7FL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
      }
      v // unreachable
    }
    def f32(): Float = {
      if (p + 4 > end) throw Reject
      val bits = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
        ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
      p += 4
      java.lang.Float.intBitsToFloat(bits)
    }
    def sub(): Reader = {
      val len = varint()
      if (len < 0 || len > MaxListLen || p + len > end) throw Reject
      val r = new Reader(b, p, p + len.toInt)
      p += len.toInt
      r
    }
    /** Skip one field of the given wire type (protobuf's unknown-field
      * robustness rule — never an error).
      */
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => if (p + 8 > end) throw Reject else p += 8
      case 2 => sub()
      case 5 => if (p + 4 > end) throw Reject else p += 4
      case _ => throw Reject // wire types 3/4 (groups): out of envelope
    }
  }

  /** One parsed feature row: (key, kind, n_values, value_sum) —
    * byte features sum byte VALUES (and count total bytes across the
    * list's strings); float sums are exact by corpus construction.
    */
  private[graft] def tfExampleRows(
      raw: Array[Byte]): Option[Seq[(String, String, Long, Double)]] = {
    try {
      val out = Seq.newBuilder[(String, String, Long, Double)]
      var nFeatures = 0
      val top = new Reader(raw, 0, raw.length)
      while (top.hasMore) {
        val t = top.varint()
        val field = (t >>> 3).toInt
        val wire = (t & 7).toInt
        if (field == 1 && wire == 2) {
          val features = top.sub()
          while (features.hasMore) {
            val ft = features.varint()
            if ((ft >>> 3).toInt == 1 && (ft & 7).toInt == 2) {
              val entry = features.sub()
              var key: String = null
              var feature: Reader = null
              while (entry.hasMore) {
                val et = entry.varint()
                ((et >>> 3).toInt, (et & 7).toInt) match {
                  case (1, 2) =>
                    val k = entry.sub()
                    key = new String(raw, k.p, k.end - k.p, "UTF-8")
                  case (2, 2) => feature = entry.sub()
                  case (_, w) => entry.skip(w)
                }
              }
              if (key == null || feature == null) throw Reject
              nFeatures += 1
              if (nFeatures > MaxFeatures) throw Reject
              var kind: String = null
              var n = 0L
              var sum = 0.0
              while (feature.hasMore) {
                val lt = feature.varint()
                ((lt >>> 3).toInt, (lt & 7).toInt) match {
                  case (1, 2) => // BytesList
                    if (kind != null) throw Reject // oneof violated
                    kind = "bytes"
                    val bl = feature.sub()
                    while (bl.hasMore) {
                      val bt = bl.varint()
                      if ((bt >>> 3).toInt == 1 && (bt & 7).toInt == 2) {
                        val s = bl.sub()
                        var q = s.p
                        while (q < s.end) {
                          sum += (raw(q) & 0xff); n += 1; q += 1
                        }
                      } else bl.skip((bt & 7).toInt)
                    }
                  case (2, 2) => // FloatList
                    if (kind != null) throw Reject
                    kind = "float"
                    val fl = feature.sub()
                    while (fl.hasMore) {
                      val ftag = fl.varint()
                      ((ftag >>> 3).toInt, (ftag & 7).toInt) match {
                        case (1, 2) => // packed
                          val pk = fl.sub()
                          while (pk.hasMore) { sum += pk.f32(); n += 1 }
                        case (1, 5) => sum += fl.f32(); n += 1
                        case (_, w) => fl.skip(w)
                      }
                    }
                  case (3, 2) => // Int64List
                    if (kind != null) throw Reject
                    kind = "int64"
                    val il = feature.sub()
                    while (il.hasMore) {
                      val itag = il.varint()
                      ((itag >>> 3).toInt, (itag & 7).toInt) match {
                        case (1, 2) => // packed
                          val pk = il.sub()
                          while (pk.hasMore) {
                            sum += pk.varint().toDouble; n += 1
                          }
                        case (1, 0) =>
                          sum += il.varint().toDouble; n += 1
                        case (_, w) => il.skip(w)
                      }
                    }
                  case (_, w) => feature.skip(w)
                }
              }
              if (kind == null) throw Reject // empty Feature oneof
              out += ((key, kind, n, sum))
            } else features.skip((ft & 7).toInt)
          }
        } else top.skip(wire)
      }
      Some(out.result())
    } catch { case Reject => None }
  }

  /** tf.Example → one row per feature, as a DataFrame op; examples
    * outside the envelope yield one all-null row keyed by media_id.
    */
  def tfExampleFeatures(
      examples: Dataset[(Long, Array[Byte])]): DataFrame = {
    val spark = examples.sparkSession
    import spark.implicits._
    examples.mapPartitions { batch =>
      batch.flatMap { case (id, raw) =>
        tfExampleRows(raw) match {
          case Some(rows) => rows.iterator.map { case (k, kd, n, s) =>
            (id, Option(k), Option(kd), Some(n), Some(s))
          }
          case None => Iterator.single((id, Option.empty[String],
            Option.empty[String], Option.empty[Long],
            Option.empty[Double]))
        }
      }
    }.toDF("media_id", "key", "kind", "n_values", "value_sum")
  }
}
