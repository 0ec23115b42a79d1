package graft

import org.apache.spark.sql.functions._

/** Throwaway profiling main for d27 (not registered anywhere). */
object DebugCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    val q = graft.queries.GraftQuery.all.find(_.name == "d27_cc_clusters").get
    time("d27 full (1st)") {
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    time("d27 full (2nd)") {
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
