package graft

import org.apache.spark.sql.functions._

/** Profiling harness for a single registered query (default d27) — the
  * bisection tool for perf regressions: run it, then comment out pipeline
  * stages in a scratch copy to isolate the expensive one. Lives in test
  * sources so it never ships in the artifact; run with
  * `sbt "Test/runMain graft.DebugCC [queryName]"` and
  * `SPARK_GRAFT_SF_DIR` pointing at a testdata scale dir. */
object DebugCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      sys.error("set SPARK_GRAFT_SF_DIR to a testdata scale dir"))
    val name = args.headOption.getOrElse("d27_cc_clusters")
    val spark = GraftSession.getOrCreate("graft-debug-cc")
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cc] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm the text expr + parquet path
    graft.sources.Tables.documents(spark, sfDir).limit(64)
      .select(graft.functions.TextFunctions.cleanTextAscii(col("text")))
      .write.format("noop").mode("overwrite").save()

    val q = graft.queries.GraftQuery.all.find(_.name == name)
      .getOrElse(sys.error(s"unknown query $name"))
    time(s"$name full (1st)") {
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    time(s"$name full (2nd)") {
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
