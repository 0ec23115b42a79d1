package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Similarity-search queries over embeddings.parquet (ArrayType(FloatType),
  * 64-dim).
  *
  * Two tiers, per the brief:
  *   - brute-force cosine top-k vs one query vector (the correctness
  *     baseline; query side is a broadcast single row, candidate side is a
  *     narrow scan — fine at any scale for a single probe);
  *   - sign-bit LSH (random-hyperplane family, axis-aligned instance):
  *     bucket on the sign pattern of the leading dimensions, then join
  *     WITHIN buckets only — candidate pairs instead of all-pairs, the
  *     100 TB shape (shuffle key = bucket id, small groups).
  *
  * Determinism: all arithmetic is widened to double first; dot products and
  * norms are strict left-to-right folds (`aggregate`), mirrored in the
  * DuckDB oracle with list_sum over the same element order, so doubles are
  * bit-identical across engines.
  */
object SimQueries {
  import graft.functions.VectorFunctions._

  /** Sign-bit LSH bucket over the first `bits` dimensions (1-based
    * element_at in Spark matches DuckDB's 1-based subscripts). */
  private def signBucket(emb: Column, bits: Int): Column =
    (0 until bits).map { i =>
      when(element_at(emb, i + 1) > lit(0.0f), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  private def sqlSignBucket(emb: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(CASE WHEN $emb[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("CAST(", " + ", " AS BIGINT)")

  private val Bits = 4

  private def bucketed(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(
      col("vec_id"),
      asDouble(col("embedding")).as("emb"),
      signBucket(col("embedding"), Bits).as("bucket"))

  val all: Seq[GraftQuery] = Seq(

    // ---- brute-force cosine top-k vs the vec_id=0 probe ------------------
    GraftQuery(
      "e01_cosine_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val probe = emb.filter(col("vec_id") === 0)
          .select(asDouble(col("embedding")).as("q_emb"))
        emb.filter(col("vec_id") =!= 0)
          .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
          .crossJoin(broadcast(probe))
          .select(col("vec_id"), cosine(col("emb"), col("q_emb")).as("cos_sim"))
          .orderBy(col("cos_sim").desc, col("vec_id").asc)
          .limit(10)
      },
      Some(s"""WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
          FROM embeddings WHERE vec_id = 0),
        c AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings WHERE vec_id <> 0)
        SELECT vec_id, ${sqlCos("e", "qe")} AS cos_sim
        FROM c, q
        ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""")),

    // ---- LSH bucket assignment -------------------------------------------
    GraftQuery(
      "e02_lsh_buckets",
      (s, d) => bucketed(s, d).select(col("vec_id"), col("bucket")),
      Some(s"""SELECT vec_id, ${sqlSignBucket("embedding", Bits)} AS bucket
        FROM embeddings""")),

    // ---- bucketed ANN: top-3 neighbors within each vector's bucket -------
    // Join key is the bucket (16 groups at 4 bits) — the LSH candidate
    // join. row_number ≤ 3 gets map-side WindowGroupLimit before the
    // shuffle on a_id.
    GraftQuery(
      "e03_bucket_ann",
      (s, d) => {
        val base = bucketed(s, d)
        val a = base.select(col("vec_id").as("a_id"), col("emb").as("a_emb"),
          col("bucket"))
        val b = base.select(col("vec_id").as("b_id"), col("emb").as("b_emb"),
          col("bucket").as("bucket_b"))
        val w = Window.partitionBy(col("a_id"))
          .orderBy(col("cos_sim").desc, col("b_id").asc)
        a.join(b, col("bucket") === col("bucket_b") && col("a_id") =!= col("b_id"))
          .withColumn("cos_sim", cosine(col("a_emb"), col("b_emb")))
          .withColumn("rn", row_number().over(w).cast("bigint"))
          .filter(col("rn") <= 3)
          .select(col("a_id"), col("rn"), col("b_id"), col("cos_sim"))
      },
      Some(s"""WITH b AS (SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
          ${sqlSignBucket("embedding", Bits)} AS bucket
        FROM embeddings),
        p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
            ${sqlCos("a.e", "b.e")} AS cos_sim
          FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
        r AS (SELECT a_id, b_id, cos_sim,
            row_number() OVER (PARTITION BY a_id
              ORDER BY cos_sim DESC, b_id ASC) AS rn
          FROM p)
        SELECT a_id, rn, b_id, cos_sim FROM r WHERE rn <= 3""")),

    // ---- embedding-cosine near-dup pairs (LSH-bucketed, thresholded) -----
    GraftQuery(
      "e04_embedding_neardup",
      (s, d) => {
        val base = bucketed(s, d)
        val a = base.select(col("vec_id").as("a_id"), col("emb").as("a_emb"),
          col("bucket"))
        val b = base.select(col("vec_id").as("b_id"), col("emb").as("b_emb"),
          col("bucket").as("bucket_b"))
        a.join(b, col("bucket") === col("bucket_b") && col("a_id") < col("b_id"))
          .withColumn("cos_sim", cosine(col("a_emb"), col("b_emb")))
          .filter(col("cos_sim") >= 0.4)
          .select(col("a_id"), col("b_id"), col("cos_sim"))
      },
      Some(s"""WITH b AS (SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
          ${sqlSignBucket("embedding", Bits)} AS bucket
        FROM embeddings)
        SELECT a.vec_id AS a_id, b.vec_id AS b_id, ${sqlCos("a.e", "b.e")} AS cos_sim
        FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE ${sqlCos("a.e", "b.e")} >= 0.4""")),

    // ---- embedding near-dup clustering (linear output; oracle = the
    // same window-min in SQL) ---------------------------------------------
    GraftQuery(
      "e06_embedding_clusters",
      (s, d) => graft.operators.VectorSearch
        .signLshRepresentatives(Tables.embeddings(s, d), "vec_id", "embedding", Bits),
      Some(s"""SELECT vec_id,
          MIN(vec_id) OVER (PARTITION BY ${sqlSignBucket("embedding", Bits)})
            AS rep_id
        FROM embeddings""")),

    // ---- IVF ANN top-k (coarse quantizer + nprobe cells) -----------------
    // No SQL oracle (k-means-lite centroids from a custom Aggregator);
    // driver records the rows-only check — always k rows.
    GraftQuery(
      "e05_ivf_topk",
      (s, d) => {
        import graft.operators.VectorSearch
        val emb = Tables.embeddings(s, d)
        val (centroids, assigned) =
          VectorSearch.ivfIndex(emb, "vec_id", "embedding", k = 8, iters = 1)
        VectorSearch.ivfTopK(assigned, centroids, "vec_id",
          probeId = 0L, k = 10, nprobe = 2)
      },
      None),
  )
}
