package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Write-side layout operators — where 100 TB parallelism actually comes
  * from. The fixture tables are single-file/single-row-group (so every
  * local scan is one task, see SCALING.md "Known local-vs-cluster
  * deltas"); on a cluster the scan parallelism and the shuffle-avoidance
  * story are decided when data is WRITTEN:
  *
  *   - Hive-style partitioning (`partitionBy`): directory-per-value →
  *     partition PRUNING at the scan (a filter on the partition column
  *     reads 1/N of the files, shown as `PartitionFilters` in the plan).
  *     Right for low-cardinality routing columns (source, date, lang).
  *   - Bucketing (`bucketBy` + `sortBy`, table-managed): rows
  *     hash-routed to a fixed bucket count per partition → equi-joins and
  *     aggregations on the bucket key need NO exchange (co-located join),
  *     and bucket pruning serves point lookups. Right for the
  *     high-cardinality keys you repeatedly join/group on (doc_id,
  *     fingerprint).
  *
  * Both are the standing alternative to reader-side `repartition`, which
  * was measured slower (full-row shuffle) and fixes nothing durable.
  */
object CorpusLayout {

  /** Writes `df` Hive-partitioned by `cols` under `dir`. Readers filter
    * on `cols` to prune whole directories at planning time. */
  def writePartitioned(df: DataFrame, dir: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(dir)

  /** Reads a partitioned corpus dir (partition columns are recovered from
    * the directory layout). */
  def readPartitioned(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Saves `df` as a bucketed+sorted managed table (`name` may be
    * database-qualified). Joins/aggs between tables bucketed the same way
    * on `key` plan with zero exchanges — eliminating the exchange is THE
    * win (verified by plan in CorpusLayoutSpec); the merge join's
    * in-partition Sort remains by default in Spark 4 (bucketed-scan
    * output ordering is opt-in legacy behavior) but is local and
    * spill-bounded, not a shuffle. The pre-write `repartition` on the
    * bucket expression routes each bucket's rows to one task → one file
    * per bucket, keeping the file count fixed as writer parallelism
    * grows (no small-files explosion). */
  def writeBucketed(df: DataFrame, name: String, buckets: Int,
      key: String): Unit =
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(name)

  // ---- interchange formats -------------------------------------------
  // Parquet is the native layout; these exist for corpora that arrive in
  // (or must be handed to) other stacks. Capability ladder, verified by
  // CorpusLayoutSpec's plan assertions:
  //   parquet/orc — columnar: predicate pushdown + column pruning skip
  //     I/O (stats-pruned row groups/stripes, unread columns);
  //   csv — row-text: filters push only to the PARSER (unmatched rows
  //     never materialize) and pruning drops fields post-parse, but
  //     every byte of every line is still read and split. Hand-off
  //     format, not a processing format.

  /** ORC mirror of the parquet layout — same pushdown/pruning class. */
  def writeOrc(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(dir)

  def readOrc(spark: SparkSession, dir: String): DataFrame =
    spark.read.orc(dir)

  /** CSV hand-off: header + quote-all + backslash-free `"`-escaping so
    * embedded newlines/quotes/commas round-trip losslessly. */
  def writeCsv(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true").option("quoteAll", "true")
      .option("escape", "\"").csv(dir)

  /** CSV read with a DECLARED schema (inference would re-scan the data
    * and guess types the writer knew). `multiLine` honors quoted embedded
    * newlines — which makes a file non-splittable (no record boundary is
    * knowable mid-file), so a CSV corpus parallelizes by FILE COUNT, not
    * by split: another reason it's a hand-off format. */
  def readCsv(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true").option("multiLine", "true")
      .option("escape", "\"").csv(dir)
}
