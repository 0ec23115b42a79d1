package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard tuning.
  *
  * Local mode is a stand-in for a multi-executor cluster: the knobs here
  * (AQE, shuffle-partition sizing, broadcast threshold) are the ones that
  * matter at 100 TB, sized down for local[32].
  */
object GraftSession {
  def builder(appName: String = "graft", cpus: Int = cpusFromEnv): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // The events table stores TIMESTAMP(NANOS) which Spark's parquet reader
      // rejects by default; read it as int64 nanos-since-epoch instead. Exact
      // integer nanos also sidesteps cross-engine truncation in the oracle
      // compare (DuckDB keeps ns, Spark TimestampType would truncate to us).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def cpusFromEnv: Int =
    sys.env.get("SPARK_GRAFT_CPUS").flatMap(_.toIntOption).getOrElse(4)

  def getOrCreate(appName: String = "graft"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
