package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the benchmark star schema (see TESTDATA.md).
  *
  * Every reader goes through `spark.read.parquet`, so Catalyst gets scan-level
  * column pruning and predicate pushdown for free. At cluster scale these
  * tables would be partitioned/bucketed; the loaders are the single seam where
  * that layout knowledge would live.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** The corpus's declared embedding dimensionality (TESTDATA.md). A real
    * deployment would read this from dataset metadata; it is the contract
    * every vector operator assumes. */
  val EmbeddingDim = 64

  /** Embeddings restricted to rows honoring the dimension contract. At
    * 100 TB null/empty/ragged vectors are a statistical certainty, and
    * under Spark 4's default ANSI mode they turn into task-killing
    * element_at/NPE failures inside vector ops (DegenerateCorpusSpec
    * pins this). Dropping them at the loader seam is the one policy every
    * vector query and every DuckDB oracle (len(embedding) = dim) shares;
    * size() is null-safe (null vector → null → filtered). */
  def validEmbeddings(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .filter(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col("embedding")) === EmbeddingDim)

  /** Register all tables as temp views so `spark.sql` works against them. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
