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
    * leading weekday token and parse the remainder. */
  private val createdAtTs =
    to_timestamp(substring(col("created_at"), 5, 26), "MMM dd HH:mm:ss Z yyyy")

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

  /** D1, parity form: keep the FIRST row in encounter order per distinct
    * content (R duplicated() semantics, incl. null==null). The window
    * formulation is deterministic where dropDuplicates is arbitrary.
    * `monotonically_increasing_id` preserves encounter order within and
    * across input partitions without a global sort. */
  def dedupKeepFirst(df: DataFrame, key: String = "content"): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col("_rid"))
    df.withColumn("_rid", monotonically_increasing_id())
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rid", "_rn")
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
}
