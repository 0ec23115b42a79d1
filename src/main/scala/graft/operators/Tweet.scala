package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

/** The typed core record of the pipeline — the 7-column transform output
  * (SURVEY.md §1.3: `Dataset[Tweet]` with a case-class Encoder). Field
  * names match the sink schema (/root/reference/main.R:29-38) minus the
  * sink-assigned `tweet_id`.
  *
  * The typed view costs nothing at runtime until a typed lambda is used —
  * `TweetPipeline.transformTyped` is the same Catalyst plan as `transform`
  * with an `Encoder`-checked schema boundary: a column rename or type
  * drift in the pipeline becomes an AnalysisException at the `.as[Tweet]`
  * line instead of a silent sink-schema mismatch.
  */
final case class Tweet(
    date_created: Timestamp,
    user: String,
    content: String,
    source: String,
    location: String,
    quoted_user: String,
    quoted_content: String)

object Tweet {
  implicit val encoder: Encoder[Tweet] = Encoders.product[Tweet]

  /** Typed boundary: schema-checked conversion of a transform output. */
  def typed(df: DataFrame): Dataset[Tweet] = df.as[Tweet]
}
