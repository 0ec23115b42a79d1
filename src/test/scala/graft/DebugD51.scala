package graft

import org.apache.spark.sql.functions._

/** Dev harness: stage timings for the d51 md5-SimHash pair query. */
object DebugD51 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-debug-d51")
    spark.sparkContext.setLogLevel("WARN")
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[d51] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val d50 = graft.queries.GraftQuery.all.find(_.name == "d50_simhash_md5").get
    val d51 = graft.queries.GraftQuery.all.find(_.name == "d51_simhash_md5_pairs").get
    graft.sources.Tables.documents(spark, sfDir).write.format("noop").mode("overwrite").save()
    timed("d50 signatures")(d50.run(spark, sfDir).count())
    timed("d50 signatures 2nd")(d50.run(spark, sfDir).count())
    timed("d51 pairs")(d51.run(spark, sfDir).count())
    timed("d51 pairs 2nd")(d51.run(spark, sfDir).count())
    // distinct band-bucket sizes: is the pair expansion hot?
    val sig = d50.run(spark, sfDir).withColumnRenamed("sim_bits", "bits")
    val buckets = sig.select(col("doc_id"), explode(expr(
      """transform(sequence(0, 3), b ->
           struct(b AS band, substr(bits, b*16 + 1, 16) AS v))""")).as("bk"))
      .groupBy(col("bk.band"), col("bk.v")).count()
    timed("bucket histogram") {
      buckets.groupBy(col("count").as("sz")).count()
        .orderBy(col("sz").desc).collect()
        .take(8).foreach(r => println(s"[d51]   bucket size ${r.get(0)} x ${r.get(1)}"))
      buckets.count()
    }
    spark.stop()
  }
}
