package graft

import org.apache.spark.sql.functions.{col, sum}

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
    assert(perKind.view.filterKeys(_ != "video").values.sum == stills)
    assert(perKind("video") >= media.filter($"kind" === "video").count())
    val maxIdx = frames.filter($"kind" === "video")
      .agg(org.apache.spark.sql.functions.max("frame_idx")).head().getInt(0)
    assert(maxIdx >= 4, "some video should have a sampled non-zero frame")
  }

  test("resizePlan clamps to max edge preserving aspect") {
    val out = Multimodal.resizePlan(Multimodal.decodeFeatures(media), maxEdge = 32)
    val rows = out.collect()
    assert(rows.forall(r => r.getInt(3) <= 32 && r.getInt(4) <= 32))
    assert(rows.forall(r => r.getInt(3) > 0 && r.getInt(4) > 0))
  }

  test("perceptualHashGroups: aHash bit construction and keep-min groups") {
    // hand-built media frame: two identical payloads (must share phash,
    // group under the min id) and one whose hash is hand-computable —
    // bytes (0,0,0,0,255,255,255,255): sum 1020, bit j set iff
    // 8*b_j > 1020 → bits 4..7 → phash 0xF0 = 240
    val fixed = Array[Byte](0, 0, 0, 0, -1, -1, -1, -1) ++ Array.fill(8)(0.toByte)
    // mirrored pattern → bits 0..3 → phash 0x0F: must NOT group with fixed
    val dup = Array[Byte](-1, -1, -1, -1, 0, 0, 0, 0) ++ Array.fill(8)(0.toByte)
    val df = Seq(
      (1L, "image", fixed), (2L, "image", dup), (3L, "image", dup))
      .toDF("media_id", "kind", "payload")
    val got = Multimodal.perceptualHashGroups(df)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L)._1 == 240L, s"hand-computed aHash mismatch: ${got(1L)}")
    assert(got(2L) == got(3L), "identical payloads must share (phash, rep, n)")
    assert(got(2L)._2 == 2L && got(2L)._3 == 2L) // keep-min rep, group of 2
    assert(got(1L)._3 == 1L)
  }

  test("audioChunks: framing invariants, chunk-count formula, narrow plan") {
    val out = Multimodal.audioChunks(media)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sr = r.getInt(1); val n = r.getLong(2); val idx = r.getInt(3)
      val start = r.getLong(4); val end = r.getLong(5)
      assert(Set(8000, 16000, 24000, 32000).contains(sr), s"sample_rate $sr")
      assert(start == idx.toLong * (sr / 2))        // 50% hop stride
      assert(end == math.min(start + sr, n))        // 1 s window, clamped
      assert(start < end && end <= n)
    }
    // per-media chunk count matches the center=False framing formula
    rows.groupBy(_.getLong(0)).foreach { case (id, rs) =>
      val sr = rs.head.getInt(1); val n = rs.head.getLong(2)
      val expect = if (n <= sr) 1L else 1L + (n - sr) / (sr / 2)
      assert(rs.length.toLong == expect, s"media $id: ${rs.length} != $expect")
      assert(rs.map(_.getInt(3)).sorted.toSeq == (0 until rs.length))
    }
    // audio rows only, every audio row covered
    val audioIds = media.filter(col("kind") === "audio")
      .select("media_id").as[Long].collect().toSet
    assert(rows.map(_.getLong(0)).toSet == audioIds)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected narrow plan, got:\n$plan")
  }

  test("multimodalPack cost model equals the generators' actual row counts") {
    import graft.queries.GraftQuery
    // the registered m07 frame (cost model in closed form)
    val m07 = GraftQuery.all.find(_.name == "m07_multimodal_pack").get
      .run(spark, sfDir).cache()
    try {
      val dec = Multimodal.decodeFeatures(media)
      // image: n_media must equal patchGrid's n_patches
      val imgBad = m07.filter(col("kind") === "image")
        .join(Multimodal.patchGrid(dec, 16), Seq("media_id"))
        .filter(col("n_media") =!= col("n_patches")).count()
      assert(imgBad == 0, "image cost != patch count")
      // audio: n_media must equal audioChunks' emitted rows per media
      val audioBad = m07.filter(col("kind") === "audio")
        .join(Multimodal.audioChunks(media).groupBy("media_id")
          .agg(org.apache.spark.sql.functions.count(col("chunk_idx"))
            .as("n_rows")), Seq("media_id"))
        .filter(col("n_media") =!= col("n_rows")).count()
      assert(audioBad == 0, "audio cost != chunk row count")
      // video: n_media must equal sampled frames × patches per frame
      val vidFrames = Multimodal.sampleFrames(dec, every = 4)
        .filter(col("kind") === "video")
        .groupBy("media_id")
        .agg(org.apache.spark.sql.functions.count(col("frame_idx"))
          .as("n_f"))
      val vidPatches = dec.toDF().filter(col("kind") === "video")
        .selectExpr("media_id",
          "((width + 15) div 16) * ((height + 15) div 16) as n_pp")
      val vidBad = m07.filter(col("kind") === "video")
        .join(vidFrames, Seq("media_id")).join(vidPatches, Seq("media_id"))
        .filter(col("n_media") =!= col("n_f") * col("n_pp")).count()
      assert(vidBad == 0, "video cost != frames × patches")
      // the pack invariant: within (source, pack), cumulative tokens
      // before the last member stay under budget (greedy floor-div pack)
      assert(m07.filter(col("pack_id") < 0).count() == 0)
    } finally m07.unpersist(blocking = true)
  }

  test("perceptualHashGroups over the corpus: exact-dup media cluster " +
      "together, groups partition the set") {
    // cache handle must be dropped: CacheManager would otherwise
    // substitute this exact plan into PlanShapeSpec's m04 audit
    val out = Multimodal.perceptualHashGroups(media).cache()
    try {
      // every row's rep is a member of its own (kind, phash) group
      assert(out.filter(col("rep_id") > col("media_id")).count() == 0)
      // group_n is consistent: summing one row per group returns the total
      val total = out.select(col("kind"), col("phash"), col("group_n"))
        .distinct().agg(sum("group_n")).head().getLong(0)
      assert(total == media.count())
    } finally out.unpersist(blocking = true)
  }
}
