package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.GraftQuery
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star-schema join-agg: revenue per market segment (customer ⋈ orders ⋈
    * lineitem with broadcast-able dimensions and exact-decimal sums). */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Tables.customer(spark, d)
      .join(Tables.orders(spark, d), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        GraftQuery.dsum(col("l_extendedprice")).as("revenue"),
        count(lit(1)).as("n_lineitems"))
  }

  /** One entry per implemented operator from SURVEY.md §2 — derived from
    * the single registry in GraftQuery.all. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    GraftQuery.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (e.g. HLL sketches) → driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    GraftQuery.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
