package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Media

class MediaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("media plumbing: binary column synthesis, batch decode shape, deterministic features") {
    val docs = Tables.documents(spark, SparkTestSession.sfTiny)
    val media = Media.fromDocuments(docs)
    assert(media.schema("content").dataType.typeName === "binary")
    assert(media.select("kind").distinct().as[String].collect().toSet ===
      Set("image", "audio", "video"))

    val feats = Media.decodeStub(media)
    val rows = feats.collect()
    assert(rows.length === docs.count())
    assert(rows.forall(_.features.length == Media.FeatureDim))
    assert(rows.filter(_.kind == "video").forall(_.n_frames >= 1))
    assert(rows.filter(_.kind != "video").forall(_.n_frames == 1))

    // determinism: second run produces identical features
    val again = Media.decodeStub(media).collect()
    assert(rows.map(r => r.media_id -> r.features.toSeq).toMap ===
      again.map(r => r.media_id -> r.features.toSeq).toMap)
  }

  test("featureSummary aggregates per kind") {
    val out = Media.featureSummary(Tables.documents(spark, SparkTestSession.sfTiny))
    assert(out.count() === 3)
    assert(out.columns.toSet === Set("kind", "n_media", "sum_width", "sum_frames", "min_id"))
  }
}
