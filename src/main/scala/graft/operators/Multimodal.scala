package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus the decode / feature-extract / frame-sample
  * operators a training-data pipeline runs over them.
  *
  * Engine-relevant parts (all real and tested): the schema contract, the
  * iterator/batch shape of the decode pass (`mapPartitions` — the Scala
  * analog of an Arrow-batched Pandas UDF: one JVM-side pass per
  * partition, no per-row UDF dispatch, no shuffle), partition
  * preservation, and null/short-payload handling.
  *
  * The codec itself is STUBBED — this container ships no image/audio
  * libraries, so `decodeStub` derives deterministic fake dimensions and
  * features from the payload bytes. The seam to replace is exactly one
  * function marked STUB below; its signature (bytes → decoded struct) is
  * what a JNI/libvips/ffmpeg binding would implement.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType),                // opaque encoded bytes
    StructField("meta", MapType(StringType, StringType)),
  ))

  /** Deterministic synthetic media table derived from a documents frame —
    * payload bytes are the md5 of the text (stable across runs/engines),
    * kind round-robins by id. Test/bench input only. */
  def syntheticMedia(docs: DataFrame): DataFrame =
    // Null text means no payload: dropped at the source seam (a real media
    // table would enforce payload NOT NULL at ingest). Keeps the stub and
    // the m01/m02 DuckDB oracles total over the same row set — the stub's
    // (0,0,0) null branch vs SQL NULL propagation would otherwise diverge.
    docs.filter(col("text").isNotNull).select(
      col("doc_id").as("media_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      to_binary(md5(col("text")), lit("hex")).as("payload"),
      map(lit("lang"), col("lang"), lit("source"), col("source")).as("meta"))

  final case class Decoded(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      n_frames: Int,
      features: Array[Float])

  /** STUB — the codec boundary. A real deployment swaps this single
    * function for an actual decoder (libvips/ffmpeg via JNI, or a
    * vectorized Arrow UDF); everything around it — batching, schema,
    * partitioning — is the production shape. The fake is deterministic in
    * the payload bytes so tests and oracle row counts are stable. */
  private[graft] def decodeStub(kind: String, payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    if (payload == null || payload.isEmpty) (0, 0, 0, Array.emptyFloatArray)
    else {
      val w = 64 + (payload(0) & 0x3f)
      val h = 64 + (payload(payload.length - 1) & 0x3f)
      val frames = kind match {
        case "video" => 1 + (payload(payload.length / 2) & 0x0f)
        case _ => 1
      }
      val features = payload.take(8).map(b => (b & 0xff) / 255.0f)
      (w, h, frames, features)
    }
  }

  /** Decode + feature-extract over a media frame. One `mapPartitions`
    * pass: rows stream through an iterator (constant memory), partitioning
    * is preserved (narrow dependency — verify no Exchange in the plan). */
  def decodeFeatures(media: DataFrame): Dataset[Decoded] = {
    val enc = Encoders.product[Decoded]
    media.select("media_id", "kind", "payload").mapPartitions { rows =>
      rows.map { r =>
        val (w, h, f, feats) = decodeStub(r.getString(1), r.getAs[Array[Byte]](2))
        Decoded(r.getLong(0), r.getString(1), w, h, f, feats)
      }
    }(enc)
  }

  /** Frame sampling for video rows: emit ≤ `every`-spaced frame indices
    * per video (posexplode of a generated sequence — the narrow,
    * vectorizable formulation; image/audio rows pass through with frame 0). */
  def sampleFrames(decoded: Dataset[Decoded], every: Int): DataFrame =
    decoded.toDF()
      .withColumn("frame_idx",
        explode(when(col("kind") === "video",
          sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(every)))
          .otherwise(array(lit(0)))))
      .select(col("media_id"), col("kind"), col("frame_idx"),
        col("width"), col("height"))

  /** Perceptual-hash dedup groups — image/media near-dup, the visual
    * analog of the text fingerprint dedup (d04/d05): an 8-bit
    * mean-threshold hash (aHash) over the stub's feature bytes — bit j
    * set iff byte_j > mean(bytes), the classic average-hash construction
    * at the stub's 8-sample resolution (a real deployment hashes a
    * downscaled grayscale plane behind the same codec seam) — then a
    * linear keep-min grouping per (kind, phash): rep_id + group size,
    * never pairwise expansion.
    *
    * Cross-engine exactness: the threshold compares in the INTEGER byte
    * domain (`8*b_j > Σb` ⟺ `b_j > mean`), derived from the payload's
    * hex — float feature arithmetic would tie-break differently between
    * engines. All columns are unrolled (no interpreted HOF lambdas), so
    * the hash stays inside whole-stage codegen.
    *
    * Group-attach shape: NOT a window. An 8-bit hash has ≤ 256 values
    * per kind, so (kind, phash) partitions are unbounded hot keys —
    * a window would buffer N/768 rows per partition (the exact shape
    * SCALING.md bans). Instead the group table (min id + size per
    * (kind, phash) — ≤ 768 rows by construction, map-side-combinable
    * partial agg) is broadcast and joined back: the big side never
    * shuffles. The join-back recomputes the hash projection (a second
    * column-pruned pass); with real megabyte payloads a production
    * pipeline materializes the hash table once behind this same API and
    * pays the decode exactly once. */
  def perceptualHashGroups(media: DataFrame): DataFrame = {
    val hashed = perceptualHash(media)
    val groups = hashed.groupBy(col("kind"), col("phash"))
      .agg(min(col("media_id")).as("rep_id"), count(lit(1)).as("group_n"))
    hashed.join(broadcast(groups), Seq("kind", "phash"))
      .select(col("media_id"), col("kind"), col("phash"),
        col("rep_id"), col("group_n"))
  }

  /** The aHash projection alone — every input column except the consumed
    * payload/meta, plus `phash`. Exposed so composites (m09's
    * caption-reuse detector) can ride extra per-media columns through the
    * SAME narrow scan instead of re-deriving the hash behind a self-join. */
  def perceptualHash(media: DataFrame): DataFrame = {
    val bytes = (0 until 8).map(j =>
      conv(substring(lower(hex(col("payload"))), 2 * j + 1, 2), 16, 10)
        .cast("int"))
    val tot = bytes.reduce(_ + _)
    val phash = bytes.zipWithIndex
      .map { case (b, j) => when(b * 8 > tot, lit(1L << j)).otherwise(lit(0L)) }
      .reduce(_ + _)
    media.withColumn("phash", phash).drop("payload", "meta")
  }

  /** Audio chunking over the decode seam — the audio analog of
    * [[sampleFrames]]: audio rows decode to (sample_rate, n_samples)
    * stream metadata, then explode into fixed-duration strided windows
    * (window = 1 s of samples, hop = window/2 — 50% overlap, the standard
    * feature-extraction framing; trailing samples that don't fill a full
    * hop are dropped, the `center=False` convention). Downstream
    * per-window feature extraction (fbank/MFCC/codec re-encode) would
    * consume (start_sample, end_sample) slices behind the same stubbed
    * codec boundary as [[decodeStub]].
    *
    * The decode fake is deterministic integer arithmetic on payload
    * bytes (sample_rate ∈ {8,16,24,32} kHz from byte 1, duration from
    * bytes 2-3), so the query gets a real DuckDB oracle. All window math
    * stays in the non-negative integer domain — both engines bit-agree.
    *
    * Scale shape: narrow per-row explode, no shuffle; output rows are
    * bounded by total audio duration / hop, never by a hot key. */
  def audioChunks(media: DataFrame): DataFrame = {
    def byteAt(i: Int) =
      conv(substring(lower(hex(col("payload"))), 2 * i + 1, 2), 16, 10)
        .cast("int")
    media.filter(col("kind") === "audio")
      .select(col("media_id"),
        (lit(8000) * (lit(1) + byteAt(1) % 4)).as("sample_rate"),
        (lit(1) + byteAt(2) % 8).as("dur_s"),
        byteAt(3).as("b3"))
      .select(col("media_id"), col("sample_rate"),
        (col("sample_rate") * col("dur_s") + col("b3") * 100)
          .cast("bigint").as("n_samples"))
      .withColumn("win", col("sample_rate").cast("bigint"))
      // sample_rate is a multiple of 8000, so the /2 is exact; every
      // quantity below is a non-negative integer, where truncating `div`
      // IS floor division (no negative-domain caveat — cf.
      // GraftQuery.floorDiv for the signed case).
      .withColumn("hop", call_function("div", col("win"), lit(2L)))
      .withColumn("chunk_idx",
        explode(sequence(lit(0L),
          when(col("n_samples") <= col("win"), lit(0L))
            .otherwise(call_function("div",
              col("n_samples") - col("win"), col("hop"))))))
      .select(col("media_id"), col("sample_rate"), col("n_samples"),
        col("chunk_idx").cast("int").as("chunk_idx"),
        (col("chunk_idx") * col("hop")).cast("bigint").as("start_sample"),
        least(col("chunk_idx") * col("hop") + col("win"), col("n_samples"))
          .cast("bigint").as("end_sample"))
  }

  /** Resize metadata transform: clamps decoded dims to a max edge,
    * preserving aspect ratio — pure column arithmetic (a real resize would
    * live behind the same decode seam). */
  def resizePlan(decoded: Dataset[Decoded], maxEdge: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxEdge.toDouble) / greatest(col("width"), col("height"), lit(1)))
    decoded.toDF().select(
      col("media_id"),
      col("width"), col("height"),
      round(col("width") * scale).cast("int").as("out_width"),
      round(col("height") * scale).cast("int").as("out_height"))
  }

  /** ViT-style patch-grid plan for image rows: how a `patch`×`patch`
    * tiling covers each image — grid dims (ceil division), total patch
    * count (= the image's transformer sequence length), and the
    * right/bottom padding a patchifier must add. All-integer math
    * (`(w + p - 1) div p` is exact ceil on non-negative ints), one
    * narrow codegen'd projection — the actual pixel tiling lives behind
    * the decode seam like resize does. */
  def patchGrid(decoded: Dataset[Decoded], patch: Int): DataFrame = {
    def ceilDiv(c: Column): Column =
      call_function("div", c + lit(patch - 1), lit(patch))
    decoded.toDF().filter(col("kind") === "image")
      .select(
        col("media_id"), col("width"), col("height"),
        ceilDiv(col("width")).as("n_x"),
        ceilDiv(col("height")).as("n_y"),
        (ceilDiv(col("width")) * ceilDiv(col("height"))).as("n_patches"),
        (ceilDiv(col("width")) * patch - col("width")).cast("bigint")
          .as("pad_w"),
        (ceilDiv(col("height")) * patch - col("height")).cast("bigint")
          .as("pad_h"))
  }

  /** Multimodal sequence packing — the d28 greedy text pack generalized
    * to text+media training samples: per-sample token cost = text tokens
    * + media tokens (image: ViT patch count, [[patchGrid]]'s ceil-div
    * geometry; video: strided sampled-frame count, [[sampleFrames]]'s
    * stride, × patches per frame; audio: 1 s / 50%-hop chunk count,
    * [[audioChunks]]' framing), then per-source id-ordered cumulative
    * packing into fixed token budgets.
    *
    * Input must carry (media_id, kind, payload, source, n_text). The
    * cost model is pure column arithmetic over the decode metadata — a
    * COUNT derived in closed form, never m02/m05's generators run just
    * to be re-counted (an explode + groupBy would add a shuffle and
    * materialize every frame/chunk row for a scalar). One narrow
    * projection + ONE exchange: the per-source pack window — the same
    * key/skew analysis as d28 (every source ships its own contiguous
    * cumsum; a hot source bounds a task at its row count, which the
    * corpus layout already buckets on).
    *
    * All framing math is non-negative integer arithmetic (`div` is exact
    * floor there), so both engines bit-agree; the byte taps mirror
    * [[decodeStub]]'s masks exactly (0x3f ≡ %64, 0x0f ≡ %16). */
  def multimodalPack(media: DataFrame, patch: Int = 16,
      frameStride: Int = 4, budget: Int = 2048): DataFrame = {
    val nMedia = mediaTokenCost(patch, frameStride)
    val wSrc = Window.partitionBy(col("source")).orderBy(col("media_id"))
    media.select(col("media_id"), col("source"), col("kind"),
        col("n_text"), nMedia.as("n_media"))
      .withColumn("n_tokens", col("n_text") + col("n_media"))
      .withColumn("cum", sum(col("n_tokens")).over(wSrc))
      .select(col("media_id"), col("source"), col("kind"), col("n_text"),
        col("n_media"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / lit(budget.toDouble))
          .cast("bigint").as("pack_id"))
  }

  /** Per-row media token cost over (kind, payload) — the ONE cost model
    * shared by [[multimodalPack]] (m07) and the m14 modality budget
    * report, so the two can never disagree on what a sample costs:
    * image = ViT patch count ([[patchGrid]]'s ceil-div geometry),
    * video = strided sampled frames ([[sampleFrames]]'s stride) × patches
    * per frame, audio = 1 s / 50%-hop chunk count ([[audioChunks]]'
    * framing). All non-negative integer arithmetic (`div` is exact floor
    * there); byte taps mirror [[decodeStub]]'s masks (0x3f ≡ %64,
    * 0x0f ≡ %16). */
  def mediaTokenCost(patch: Int = 16, frameStride: Int = 4): Column = {
    def byteAt(i: Int) =
      conv(substring(lower(hex(col("payload"))), 2 * i + 1, 2), 16, 10)
        .cast("int")
    def ceilDiv(c: Column): Column =
      call_function("div", c + lit(patch - 1), lit(patch))
    val w = lit(64) + byteAt(0) % 64
    val h = lit(64) + byteAt(15) % 64
    val nFrames = lit(1) + byteAt(8) % 16
    val patches = ceilDiv(w) * ceilDiv(h)
    val sampledFrames =
      call_function("div", nFrames - 1, lit(frameStride)) + 1
    val sr = (lit(8000) * (lit(1) + byteAt(1) % 4)).cast("long")
    val nSamples =
      sr * (lit(1) + byteAt(2) % 8).cast("long") + byteAt(3).cast("long") * 100L
    val hop = call_function("div", sr, lit(2L))
    val chunks = when(nSamples <= sr, lit(1L))
      .otherwise(call_function("div", nSamples - sr, hop) + 1L)
    when(col("kind") === "image", patches.cast("long"))
      .when(col("kind") === "video", (sampledFrames * patches).cast("long"))
      .otherwise(chunks)
  }
}
