package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's transform_tweets pipeline (/root/reference/main.R:74-109)
  * as one declarative Spark plan:
  *
  *   filter(!is_retweet AND lang = 'es')        F1  main.R:82
  *   → project/rename to the 7 sink columns     P1  main.R:83-92
  *   → cleanText(content, quoted_content)       P2×(T1..T5) main.R:93-104
  *   → keep-first dedup on content              D1  main.R:105
  *
  * Catalyst fuses F1/P1/P2 into a single whole-stage-codegen pass over the
  * scan; the only shuffle is the dedup exchange on `content`. At 100 TB the
  * dedup is the scaling risk — Spark's partial aggregation handles it
  * (per-partition dedup before the exchange), so shuffle volume is bounded
  * by the number of *distinct* contents, not rows.
  */
object TweetPipeline {

  /** F1 + P1: filter and project/rename. NULL predicates drop rows (SQL
    * three-valued logic), matching dplyr::filter. `created_at` arrives as a
    * Twitter-format string ("Wed Oct 23 03:15:02 +0000 2019"); Spark's
    * java.time parser forbids day-of-week ('E') when parsing, so we drop the
    * leading weekday token and parse the remainder. try_to_timestamp, not
    * to_timestamp: under Spark 4's default ANSI mode the plain form THROWS
    * on a malformed string — one garbage created_at would kill the whole
    * micro-batch — while the reference's lubridate parse yields NA
    * (main.R:96). NULL-on-failure is the parity behavior. */
  private val createdAtTs =
    try_to_timestamp(substring(col("created_at"), 5, 26),
      lit("MMM dd HH:mm:ss Z yyyy"))

  def filterProject(raw: DataFrame): DataFrame =
    raw
      .filter(!col("is_retweet") && col("lang") === "es")
      .select(
        createdAtTs.as("date_created"),
        col("screen_name").as("user"),
        col("text").as("content"),
        col("source").as("source"),
        col("location").as("location"),
        col("quoted_screen_name").as("quoted_user"),
        col("quoted_text").as("quoted_content"),
      )

  /** P2: apply the T1-T5 cleaning expression to content + quoted_content
    * in place (mutate_at equivalent, main.R:93-104). */
  def clean(df: DataFrame): DataFrame =
    Seq("content", "quoted_content").foldLeft(df)((d, c) => d.withColumn(c, cleanText(col(c))))

  /** D1, deterministic form: keep the first row per distinct `key` under a
    * data-derived total order (default: every non-key column, ascending,
    * nulls last). R's duplicated() keeps "first in encounter order", but
    * encounter order is not reproducible across multi-file input (file →
    * partition assignment varies run to run — round-3 verdict #4), so the
    * engine's contract is "first by timestamp/user order" — stable no
    * matter how the input is split.
    *
    * Null-key skew guard (round-3 verdict #5): a plain
    * Window.partitionBy(key) sends EVERY null-key row to one task — a
    * straggler at 100 TB where null content is common. Stage 1 salts the
    * null group across partitions (per-salt winners, map-side
    * WindowGroupLimit keeps shuffle volume ≈ distinct keys); stage 2 ranks
    * only the surviving candidates (≤ one per (key, salt), so the null
    * group holds at most #salts rows — no straggler). Output is
    * deterministic: the global ord-min always survives both stages. */
  def dedupKeepFirst(df: DataFrame, key: String = "content",
      ordering: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    val keyCol = col(key)
    val ord =
      if (ordering.nonEmpty) ordering
      else df.columns.filterNot(_ == key).map(c => col(c).asc_nulls_last).toSeq
    val salted = df.withColumn("_salt",
      when(keyCol.isNull, pmod(spark_partition_id(), lit(32))).otherwise(lit(0)))
    val w1 = Window.partitionBy(keyCol, col("_salt")).orderBy(ord: _*)
    val candidates = salted
      .withColumn("_rn", row_number().over(w1)).filter(col("_rn") === 1)
    val w2 = Window.partitionBy(keyCol).orderBy(ord: _*)
    candidates
      .withColumn("_rn2", row_number().over(w2)).filter(col("_rn2") === 1)
      .drop("_salt", "_rn", "_rn2")
  }

  /** D1, scale form: order-arbitrary dedup (one hash exchange, partial agg
    * upstream). Use when downstream is order-insensitive. */
  def dedup(df: DataFrame, key: String = "content"): DataFrame =
    df.dropDuplicates(key)

  /** Full batch pipeline: raw NDJSON frame → deduped 7-column tweet frame. */
  def transform(raw: DataFrame, keepFirst: Boolean = true): DataFrame = {
    val cleaned = clean(filterProject(raw))
    if (keepFirst) dedupKeepFirst(cleaned) else dedup(cleaned)
  }

  /** Typed pipeline output — same plan, Encoder-checked schema boundary
    * (see [[Tweet]]). */
  def transformTyped(raw: DataFrame, keepFirst: Boolean = true): org.apache.spark.sql.Dataset[Tweet] =
    Tweet.typed(transform(raw, keepFirst))
}
