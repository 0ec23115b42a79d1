package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.{CorpusLayout, Tables}

/** The write-side layout seam, proven by plan shape: partition pruning
  * and shuffle-free co-located joins are what make the 100 TB story work,
  * and both are decided at write time — these tests pin that the layouts
  * this engine writes actually produce those plans.
  */
class CorpusLayoutSpec extends SparkSpec {

  test("partitionBy(source): filters prune to one directory at plan time") {
    val dir = Files.createTempDirectory("graft-part").toString + "/docs"
    CorpusLayout.writePartitioned(
      Tables.documents(spark, sfDir), dir, "source")
    val sources = Tables.documents(spark, sfDir)
      .select("source").distinct().count()
    assert(sources > 1, "fixture must have several sources for this test")
    // directory-per-value layout on disk
    assert(Files.list(Paths.get(dir)).iterator().hasNext)
    val q = CorpusLayout.readPartitioned(spark, dir)
      .filter(col("source") === "src3")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(source"),
      s"partition filter not pushed:\n$scan")
    // pruned read sees only src3's rows, and the data files actually read
    // are the one partition's (numFiles in the scan metadata)
    val all = Tables.documents(spark, sfDir)
      .filter(col("source") === "src3").count()
    assert(q.count() == all)
  }

  test("bucketBy on the join key: co-located join plans ZERO exchanges") {
    spark.sql(
      s"CREATE DATABASE IF NOT EXISTS layoutdemo LOCATION " +
        s"'${Files.createTempDirectory("graft-bucket")}'")
    try {
      val docs = Tables.documents(spark, sfDir)
      CorpusLayout.writeBucketed(
        docs.select(col("doc_id"), col("source")),
        "layoutdemo.docs_a", buckets = 8, key = "doc_id")
      CorpusLayout.writeBucketed(
        docs.select(col("doc_id"), col("n_chars")),
        "layoutdemo.docs_b", buckets = 8, key = "doc_id")
      val joined = spark.table("layoutdemo.docs_a")
        .join(spark.table("layoutdemo.docs_b"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!"[+:]- Exchange ".r.findAllIn(plan).hasNext,
        s"bucketed equi-join still shuffles:\n$plan")
      assert(joined.count() == docs.count())
      // and a bucket-keyed aggregation is exchange-free too
      val agg = spark.table("layoutdemo.docs_a").groupBy("doc_id").count()
      assert(!"[+:]- Exchange ".r
        .findAllIn(agg.queryExecution.executedPlan.toString).hasNext,
        "bucket-keyed aggregation still shuffles")
    } finally {
      spark.sql("DROP TABLE IF EXISTS layoutdemo.docs_a")
      spark.sql("DROP TABLE IF EXISTS layoutdemo.docs_b")
      spark.sql("DROP DATABASE IF EXISTS layoutdemo")
    }
  }
}
