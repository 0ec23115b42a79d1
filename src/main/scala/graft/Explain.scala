package graft

/** Plan-inspection main: prints the formatted physical plan of one or more
  * registered queries (all of them with no args). Usage:
  *
  *   sbt "runMain graft.Explain [sfDir] [queryName ...]"
  *
  * This is the `.explain("formatted")` feedback loop the build runs after
  * every operator change — check for: PushedFilters reaching the scan, the
  * expected ReadSchema (column pruning), broadcast vs shuffle joins,
  * WholeStageCodegen span width, and absence of duplicate subplans. */
object Explain {
  def main(args: Array[String]): Unit = {
    // The first arg is the data dir only when it actually IS one —
    // `Explain d09_near_dup_pairs` with SPARK_GRAFT_SF_DIR set must treat
    // the query name as a query name, not silently scan
    // `d09.../lineitem.parquet` (query names are never directories). The
    // converse trap: a MISTYPED data dir must not be silently reclassified
    // as a query name (falling through to SPARK_GRAFT_SF_DIR and dying
    // later with a confusing unknown-query error) — anything that looks
    // like a path (has a separator) or matches no registered query fails
    // fast as a missing data dir.
    args.headOption
      .filter(a => !new java.io.File(a).isDirectory)
      .filter(a => a.contains(java.io.File.separator) ||
        !SparkEntry.queries.contains(a))
      .foreach(a => sys.error(s"data dir not found: $a (pass an existing " +
        "directory as the first arg, or a registered query name)"))
    val dirFromArgs = args.headOption
      .filter(a => new java.io.File(a).isDirectory)
    val sfDir = dirFromArgs
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse(sys.error(
        "pass an existing data dir as the first arg or set SPARK_GRAFT_SF_DIR"))
    val nameArgs = if (dirFromArgs.isDefined) args.drop(1).toSeq else args.toSeq
    val names = if (nameArgs.nonEmpty) nameArgs
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.getOrCreate("graft-explain")
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          println(s"\n========== $n ==========")
          fn(spark, sfDir).explain("formatted")
        case None => System.err.println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
