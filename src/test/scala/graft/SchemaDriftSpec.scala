package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.GraftQuery
import graft.sources.Tables

/** Tripwires for driver-side testdata regeneration.
  *
  * Round 14 lost six queries for a whole round because the regenerated
  * events.parquet changed `ts` from timestamp[ns] to timestamp[us] and the
  * breakage only surfaced as analysis errors deep in the suite. Two pins:
  *
  *  1. Every registered query must ANALYZE against the real fixture
  *     schemas — catches the next physical-type drift in seconds, naming
  *     the query and the mismatch, without materializing anything.
  *  2. `Tables.events` must normalize every plausible `ts` flavor (int64
  *     nanos, timestamp, timestamp_ntz) to the same int64-nanos contract,
  *     so both fixture generations — and the next one — load identically.
  */
class SchemaDriftSpec extends SparkSpec {

  test("every registered query analyzes against the real fixture schemas") {
    val failures = GraftQuery.all.flatMap { q =>
      try {
        q.run(spark, sfDir).queryExecution.assertAnalyzed()
        None
      } catch {
        case e: Throwable =>
          Some(s"${q.name}: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    assert(failures.isEmpty,
      s"fixture schema drift broke analysis:\n${failures.mkString("\n")}")
  }

  test("Tables.events normalizes long, timestamp, and timestamp_ntz ts " +
      "flavors to the same int64 nanos") {
    import spark.implicits._
    // 2023-11-14T22:13:20Z and one microsecond later — µs precision is
    // the shared exact domain of all three physical flavors.
    val nanos = Seq(1700000000000000000L, 1700000000000001000L)

    def load(dir: String): Seq[Long] =
      Tables.events(spark, dir).select(col("ts"))
        .as[Long].collect().toSeq.sorted

    def write(flavor: String): String = {
      val dir = Files.createTempDirectory(s"graft-ts-$flavor").toString
      val base = nanos.toDF("ns").select(
        monotonically_increasing_id().as("event_id"),
        col("ns"), lit(7L).as("user_id"), lit("click").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      val df = flavor match {
        case "long" => base.withColumnRenamed("ns", "ts")
        case "timestamp" =>
          base.withColumn("ts", timestamp_micros(expr("ns div 1000")))
            .drop("ns")
        case "ntz" =>
          base.withColumn("ts",
            timestamp_micros(expr("ns div 1000")).cast("timestamp_ntz"))
            .drop("ns")
      }
      df.write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }

    for (flavor <- Seq("long", "timestamp", "ntz")) {
      assert(load(write(flavor)) == nanos,
        s"$flavor-flavored events.ts must load as the same int64 nanos")
    }
  }
}
