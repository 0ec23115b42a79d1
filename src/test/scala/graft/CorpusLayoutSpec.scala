package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

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
    // Hive directory-per-value layout on disk ('source=src3/' children)
    val children = {
      val s = Files.list(Paths.get(dir))
      try s.iterator().asScala.map(_.getFileName.toString).toList
      finally s.close()
    }
    assert(children.count(_.startsWith("source=")) == sources,
      s"expected $sources 'source=' partition dirs, found: $children")
    val q = CorpusLayout.readPartitioned(spark, dir)
      .filter(col("source") === "src3")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(source"),
      s"partition filter not pushed:\n$scan")
    val all = Tables.documents(spark, sfDir)
      .filter(col("source") === "src3").count()
    assert(q.count() == all)
  }

  test("bucketBy on the join key: co-located merge join, ZERO exchanges, " +
      "bucketed scan engaged") {
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
      // Force the merge join: at fixture size the 64 MB broadcast
      // threshold would otherwise plan a BroadcastHashJoin, which has no
      // shuffle REGARDLESS of bucketing — the zero-exchange assertion
      // would be vacuously green. The hint pins the join strategy a big
      // fact-fact join takes at scale; bucketing must then remove both
      // exchanges.
      val joined = spark.table("layoutdemo.docs_a").hint("merge")
        .join(spark.table("layoutdemo.docs_b"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"merge join not planned:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"bucketed scan not engaged:\n$plan")
      assert(shuffles(plan) == 0, s"bucketed merge join still shuffles:\n$plan")
      assert(joined.count() == docs.count())
      // and a bucket-keyed aggregation is exchange-free too
      val agg = spark.table("layoutdemo.docs_a").groupBy("doc_id").count()
      assert(shuffles(agg.queryExecution.executedPlan.toString) == 0,
        "bucket-keyed aggregation still shuffles")
    } finally {
      spark.sql("DROP TABLE IF EXISTS layoutdemo.docs_a")
      spark.sql("DROP TABLE IF EXISTS layoutdemo.docs_b")
      spark.sql("DROP DATABASE IF EXISTS layoutdemo")
    }
  }

  test("ORC interchange: lossless round-trip, pushdown + pruning reach " +
      "the scan") {
    val docs = Tables.documents(spark, sfDir)
    val dir = Files.createTempDirectory("graft-orc").toString + "/docs"
    CorpusLayout.writeOrc(docs, dir)
    val back = CorpusLayout.readOrc(spark, dir)
    assert(back.schema == docs.schema)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    val q = back.filter(col("doc_id") > 10).select("doc_id", "lang")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,10)]"),
      s"ORC predicate not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"ORC column pruning missing:\n$plan")
  }

  test("CSV hand-off: embedded newlines/quotes/commas round-trip; " +
      "parse-level pushdown + pruning (but no I/O skipping)") {
    import spark.implicits._
    val nasty = Seq(
      (9001L, "line one\nline two", "en", "srcX", 17L),
      (9002L, "a \"quoted\" word", "en", "srcX", 15L),
      (9003L, "commas, everywhere, always", "es", "srcX", 26L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val docs = Tables.documents(spark, sfDir).unionByName(nasty)
    val dir = Files.createTempDirectory("graft-csv").toString + "/docs"
    CorpusLayout.writeCsv(docs, dir)
    val back = CorpusLayout.readCsv(spark, dir, docs.schema)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty,
      "CSV round-trip lost rows")
    val q = back.filter(col("doc_id") > 10).select("doc_id", "lang")
    val plan = q.queryExecution.executedPlan.toString
    // column pruning works, and CSV "pushdown" reaches the PARSER (rows
    // failing the filter are never materialized) — but unlike
    // parquet/orc there are no stats or splits to skip, so every byte is
    // still read; Batched: false marks the row-text scan
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"CSV column pruning missing:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,10)]"),
      s"CSV parse-level pushdown missing:\n$plan")
    assert(plan.contains("Batched: false"),
      s"CSV scan should be the row-text (non-vectorized) reader:\n$plan")
  }
}
