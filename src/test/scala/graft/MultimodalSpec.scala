package graft

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.syntheticMedia(Tables.documents(spark, sfDir)).cache()

  test("media schema contract: binary payload + typed metadata") {
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "payload", "meta"))
    assert(media.schema("payload").dataType.typeName == "binary")
    val kinds = media.select("kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("decodeFeatures: deterministic, full coverage, 8-dim features") {
    val a = Multimodal.decodeFeatures(media).collect().sortBy(_.media_id)
    val b = Multimodal.decodeFeatures(media).collect().sortBy(_.media_id)
    assert(a.length == media.count())
    assert(a.map(_.media_id).toSeq == b.map(_.media_id).toSeq)
    assert(a.zip(b).forall { case (x, y) =>
      x.width == y.width && x.features.toSeq == y.features.toSeq })
    assert(a.forall(d => d.width >= 64 && d.width < 128 && d.features.length == 8))
    assert(a.forall(d => d.kind != "video" || d.n_frames >= 1))
  }

  test("decodeFeatures is a narrow pass — no shuffle in the plan") {
    val plan = Multimodal.decodeFeatures(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode must not shuffle:\n$plan")
  }

  test("decode stub: empty payload → zero dims, no crash") {
    val (w, h, f, feats) = Multimodal.decodeStub("image", Array.emptyByteArray)
    assert(w == 0 && h == 0 && f == 0 && feats.isEmpty)
  }

  test("sampleFrames: videos expand by stride, stills emit frame 0") {
    val dec = Multimodal.decodeFeatures(media)
    val frames = Multimodal.sampleFrames(dec, every = 4)
    val perKind = frames.groupBy("kind").count().as[(String, Long)].collect().toMap
    val stills = media.filter($"kind" =!= "video").count()
    assert(perKind.filterKeys(_ != "video").values.sum == stills)
    assert(perKind("video") >= media.filter($"kind" === "video").count())
    val maxIdx = frames.filter($"kind" === "video")
      .agg(org.apache.spark.sql.functions.max("frame_idx")).head.getInt(0)
    assert(maxIdx >= 4, "some video should have a sampled non-zero frame")
  }

  test("resizePlan clamps to max edge preserving aspect") {
    val out = Multimodal.resizePlan(Multimodal.decodeFeatures(media), maxEdge = 32)
    val rows = out.collect()
    assert(rows.forall(r => r.getInt(3) <= 32 && r.getInt(4) <= 32))
    assert(rows.forall(r => r.getInt(3) > 0 && r.getInt(4) > 0))
  }
}
