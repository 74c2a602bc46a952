package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise with mapPartitions.
  *
  * The DECODE STEP IS A STUB — this container ships no image/audio codecs,
  * so `decodeStub` derives deterministic fake features from the bytes.
  * Everything around it is the real Spark shape a production pipeline
  * needs: binary column + metadata struct schema, per-partition batch
  * iteration (amortizes codec init, the expensive part of real decoders),
  * and a bounded-width feature output schema.
  *
  * Scale notes: binary payloads dominate I/O at 100 TB — the media table
  * should be partitioned by kind and bucketed by media_id so feature
  * extraction is a scan + narrow map (no shuffle), and feature outputs
  * (small) join back to metadata by id.
  */
object Media {

  case class MediaRecord(
      media_id: Long,
      kind: String,            // image | audio | video
      content: Array[Byte],    // opaque payload
      source: String,
      n_bytes: Long)

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      width: Int,              // fake-decoded dimensions
      height: Int,
      n_frames: Int,           // 1 for image; >1 for video (frame sampling)
      features: Array[Float])  // fixed-width feature vector

  val FeatureDim = 8

  /** Synthesize a media table from the documents table (text bytes as the
    * opaque payload) — stands in for a real binary source so the plumbing
    * is testable in this container.
    */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("content"),
      col("source"),
      length(col("text")).cast("long").as("n_bytes"))
      .as[MediaRecord]
  }

  /** STUB decoder: deterministic fake decode/resize/frame-sample deriving
    * dims and features from a rolling byte hash. Replace the marked block
    * with a real codec (e.g. javax.imageio / ffmpeg bindings) in a real
    * deployment — the batch shape stays identical.
    */
  def decodeStub(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { batch =>
      // Real decoders init a codec context here, once per partition.
      batch.map { m =>
        // ---- STUB: deterministic fake decode (no codecs in container) ----
        var h = 1125899906842597L
        var i = 0
        while (i < m.content.length) { h = 31 * h + m.content(i); i += 1 }
        val width = 64 + math.floorMod(h, 512).toInt
        val height = 64 + math.floorMod(h >> 16, 512).toInt
        val nFrames = m.kind match {
          case "video" => 1 + math.floorMod(h >> 24, 30).toInt
          case _ => 1
        }
        val feats = Array.tabulate(FeatureDim) { d =>
          (math.floorMod(h >> (d * 7), 1000) / 1000.0f)
        }
        // ---- end STUB ----
        MediaFeatures(m.media_id, m.kind, width, height, nFrames, feats)
      }
    }
  }

  /** End-to-end plumbing: synthesize → decode (stub) → per-kind feature
    * aggregate, as a DataFrame for SparkEntry.
    */
  def featureSummary(docs: DataFrame): DataFrame = {
    val feats = decodeStub(fromDocuments(docs))
    feats.toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("width").cast("long")).as("sum_width"),
        sum(col("n_frames").cast("long")).as("sum_frames"),
        min(col("media_id")).as("min_id"))
  }
}
