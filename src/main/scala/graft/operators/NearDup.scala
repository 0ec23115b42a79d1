package graft.operators

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Near-duplicate detection at scale — the three standard families, each
  * bucketed so candidate generation is a join on a small key, never an
  * all-pairs product:
  *
  *   1. md5-minhash on word-3-grams (TextQueries.d08/d09 — oracle-checked)
  *   2. banded MinHash+LSH via MLlib (`minhashLshPairs`) — n hash tables,
  *      candidates = vectors sharing any band bucket, verified by exact
  *      Jaccard on the candidate set only
  *   3. SimHash-64 (`simhash`) — one 64-bit signature per doc; near-dups
  *      share a 16-bit band; verification = Hamming distance on candidates
  *
  * At 100 TB: signatures are narrow per-row expressions (one pass,
  * codegen'd); the candidate joins shuffle on band keys whose group sizes
  * are bounded by design (band width chooses the precision/recall point),
  * so no skewed all-null or hot-key partitions.
  */
object NearDup {

  /** doc_id + distinct word-3-gram shingle set. */
  def shingled(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("toks", TextFunctions.tokens(col(textCol)))
      .withColumn("shingle_set",
        when(size(col("toks")) >= 3,
          array_distinct(expr(
            "transform(sequence(0, size(toks)-3), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))")))
          .otherwise(expr("cast(array() as array<string>)")))
      .drop("toks")

  /** MinHash+LSH banded near-dup pairs (MLlib): shingles → binary
    * HashingTF vectors → `numTables` minhash signatures → candidate pairs
    * from LSH OR-amplification → exact Jaccard distance filter.
    * Deterministic for a fixed seed. Returns (a_id, b_id, jaccard_dist)
    * with a_id < b_id and jaccard_dist <= maxDistance. */
  def minhashLshPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxDistance: Double = 0.5,
      numTables: Int = 5, seed: Long = 42L): DataFrame = {
    val sh = shingled(docs, textCol)
      .filter(size(col("shingle_set")) > 0) // MinHash requires ≥1 set bit
      .select(col(idCol), col("shingle_set"))
    val tf = new HashingTF()
      .setInputCol("shingle_set").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feats = tf.transform(sh)
    val lsh = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numTables).setSeed(seed)
    val model = lsh.fit(feats)
    model.approxSimilarityJoin(feats, feats, maxDistance, "jaccard_dist")
      .select(
        col(s"datasetA.$idCol").as("a_id"),
        col(s"datasetB.$idCol").as("b_id"),
        col("jaccard_dist"))
      .filter(col("a_id") < col("b_id"))
  }

  /** SimHash-64 of a whitespace-tokenized string column as one SQL
    * expression: per token, xxhash64 contributes +1/-1 to each of 64 bit
    * counters; the signature takes bit j where counter j ends positive.
    * A single `aggregate` fold — no explode, no shuffle, stays inside
    * whole-stage codegen. */
  def simhashOf(colName: String): Column = {
    val toksSql = s"filter(split(trim($colName), '\\\\s+'), t -> length(t) > 0)"
    expr(
      s"""aggregate(
         |  $toksSql,
         |  array_repeat(0L, 64),
         |  (acc, t) -> zip_with(acc,
         |      transform(sequence(0, 63),
         |        j -> IF((shiftright(xxhash64(t), j) % 2) != 0, 1L, -1L)),
         |      (a, b) -> a + b),
         |  acc -> aggregate(
         |      transform(sequence(0, 63),
         |        j -> IF(acc[j] > 0, shiftleft(1L, j), 0L)),
         |      0L, (s, x) -> s + x))""".stripMargin)
  }

  /** SimHash near-dup pairs: band each 64-bit signature into four 16-bit
    * keys, join on (band index, band value), verify candidates by Hamming
    * distance. Returns (a_id, b_id, hamming) with a_id < b_id. */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxHamming: Int = 8): DataFrame = {
    val sig = docs.select(col(idCol), simhashOf(textCol).as("simhash"))
    val banded = sig.select(col(idCol), col("simhash"),
      explode(expr(
        "transform(sequence(0, 3), b -> struct(b AS band, (shiftright(simhash, b*16) % 65536) AS v))"))
        .as("bk"))
      .select(col(idCol), col("simhash"), col("bk.band"), col("bk.v"))
    val a = banded.select(col(idCol).as("a_id"), col("simhash").as("a_sig"),
      col("band"), col("v"))
    val b = banded.select(col(idCol).as("b_id"), col("simhash").as("b_sig"),
      col("band").as("band_b"), col("v").as("v_b"))
    a.join(b, col("band") === col("band_b") && col("v") === col("v_b") &&
        col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sig").bitwiseXOR(col("b_sig"))).cast("bigint").as("hamming"))
      .distinct() // a pair can collide in several bands
      .filter(col("hamming") <= maxHamming)
  }
}
