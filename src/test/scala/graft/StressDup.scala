package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dup-heavy stress harness for the pair-emitting dedup queries (the
  * SCALING.md "dup-heavy corpus stress" table) — measures d09/d27 (and any
  * other query named in args) on three adversarial corpora derived from
  * `SPARK_GRAFT_SF_DIR`'s documents table:
  *
  *   - `1x`:   the corpus as-is (baseline)
  *   - `8x`:   every doc replicated 8× with distinct doc_ids — EVERY doc
  *             is in an 8-member exact-dup group, the worst realistic
  *             shape for bucketed pair expansion (8×7/2 pairs per group)
  *   - `hot`:  the corpus plus ONE 200-member identical-text cluster —
  *             200 > lshMaxBucket(64), so the cap must drop the bucket
  *             (d09: no pairs from it; d27: its docs stay singletons) and
  *             runtime must stay flat instead of paying 200²/2 pairs in
  *             one generator row
  *   - `mega`: the corpus plus ONE `SPARK_GRAFT_STRESS_MEGA`-member
  *             (default 100 000) identical-text cluster — the boilerplate
  *             regime (empty pages, licence headers) a web crawl is
  *             statistically certain to contain. The cap drops the bucket
  *             here too, but the POINT of this case is the memory
  *             envelope while dropping it: NearDup.cappedBuckets slices
  *             every bucket at cap+1 members BEFORE the collect, so no
  *             task ever buffers the 10⁵ signature structs (the old
  *             collect-then-filter form built the full non-spilling
  *             collect_list buffer first). The per-run peak task
  *             execution memory is printed precisely to pin that: it must
  *             stay in the same band as `1x`, not scale with the cluster.
  *
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
  *       sbt "Test/runMain graft.StressDup [query ...]"`.
  * Lives in test sources — a measurement tool, never shipped.
  */
object StressDup {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Write `docs` as documents.parquet under a fresh temp dir usable as a
    * GraftQuery sfDir (the dedup queries read only the documents table). */
  private def asSfDir(docs: DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("stress-dup").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      sys.error("set SPARK_GRAFT_SF_DIR to a testdata scale dir"))
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("d09_near_dup_pairs", "d27_cc_clusters")
    val spark = GraftSession.getOrCreate("graft-stress-dup")
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.sources.Tables.documents(spark, sfDir)
    val n = base.count()
    // distinct ids per replica: shift by replica * next power of ten
    val shift = math.pow(10, math.ceil(math.log10(n.toDouble + 1))).toLong
    val rep8 = base.crossJoin(
        spark.range(8).select(col("id").as("_rep")).hint("broadcast"))
      .select((col("doc_id") + col("_rep") * shift).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    // one 200-member identical cluster appended to the corpus: same text,
    // fresh ids — every member lands in the same minhash bucket
    val hotText = base.orderBy(col("doc_id")).select(col("text"))
      .filter(length(col("text")) > 100).head().getString(0)
    val hot = base.unionByName(
      spark.range(200).select((col("id") + shift).as("doc_id"),
        lit(hotText).as("text"), lit("en").as("lang"),
        lit("srcX").as("source"), lit(hotText.length.toLong).as("n_chars")))
    val megaN = sys.env.get("SPARK_GRAFT_STRESS_MEGA")
      .flatMap(_.toLongOption).getOrElse(100000L)
    val mega = base.unionByName(
      spark.range(megaN).select((col("id") + shift).as("doc_id"),
        lit(hotText).as("text"), lit("en").as("lang"),
        lit("srcX").as("source"), lit(hotText.length.toLong).as("n_chars")))

    val corpora = Seq(
      "1x" -> sfDir, "8x" -> asSfDir(rep8), "hot" -> asSfDir(hot),
      "mega" -> asSfDir(mega))

    // Peak task execution memory per run (max over tasks of the memory
    // charged to aggs/sorts/joins): the observable that separates "the cap
    // dropped the bucket" from "the cap dropped the bucket AFTER buffering
    // all of it". Collected via listener; runs are sequential so a simple
    // reset-read cycle per query is race-free.
    val peak = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null)
            peak.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
        }
      })
    // warm codegen/parquet paths once so first-measured isn't charged JIT
    names.foreach { q =>
      graft.queries.GraftQuery.all.find(_.name == q).get.run(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    for ((label, dir) <- corpora; name <- names) {
      val q = graft.queries.GraftQuery.all.find(_.name == name)
        .getOrElse(sys.error(s"unknown query $name"))
      peak.set(0)
      val (_, sec) = timed {
        q.run(spark, dir).write.format("noop").mode("overwrite").save()
      }
      val peakMb = peak.get() / (1024.0 * 1024.0)
      val rows = q.run(spark, dir).count()
      println(f"[stress] $name%-22s $label%-4s ${sec}%8.2f s  rows=$rows%-8d peakTaskMem=${peakMb}%8.1f MB")
    }
    spark.stop()
  }
}
