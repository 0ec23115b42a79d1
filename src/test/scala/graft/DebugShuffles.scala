package graft

/** Diagnostic: print the shuffle-exchange count of each named registered
  * query (all queries with no args) — the measurement feeding
  * PlanShapeSpec's exchange-budget table. Dev harness, never shipped
  * (the Debug* convention, cited from SCALING.md).
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.DebugShuffles [q ...]"
  */
object DebugShuffles {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val spark = GraftSession.getOrCreate("graft-debug-shuffles")
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else graft.queries.GraftQuery.all.map(_.name)
    names.foreach { n =>
      val q = graft.queries.GraftQuery.all.find(_.name == n)
        .getOrElse(sys.error(s"unknown query $n"))
      val p = q.run(spark, sfDir).queryExecution.executedPlan.toString
      val c = "[+:]- Exchange ".r.findAllIn(p).length
      println(s"[shuffles] $n $c")
    }
    spark.stop()
  }
}
