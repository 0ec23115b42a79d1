package graft

import org.apache.spark.sql.functions._

/** Dev harness: stage-by-stage wall times of the d52 capstone at an sf dir
  * (SPARK_GRAFT_SF_DIR). Not shipped; mirrors DebugD39's role. */
object DebugD52 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-debug-d52")
    spark.sparkContext.setLogLevel("WARN")
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[d52] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val q = graft.queries.GraftQuery.all.find(_.name == "d52_neardup_capstone").get
    // warm
    graft.sources.Tables.documents(spark, sfDir).write.format("noop").mode("overwrite").save()
    timed("full query")(q.run(spark, sfDir).count())
    timed("full query (2nd)")(q.run(spark, sfDir).count())
    spark.stop()
  }
}
