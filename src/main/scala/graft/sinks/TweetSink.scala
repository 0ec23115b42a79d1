package graft.sinks

import java.nio.file.{Files, Paths}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.slf4j.LoggerFactory

/** The `tweet_data` sink contract (SURVEY.md §2.1 S5-S8):
  * declared 8-column schema, sink-assigned surrogate `tweet_id`,
  * append-only loads, existence-rename guard, connection-per-operation
  * lifecycle.
  *
  * Reference: CREATE TABLE /root/reference/main.R:26-39; rename guard
  * main.R:20-24; append main.R:117-119; empty-input no-op main.R:114.
  */
trait TweetSink {
  /** S5 + S6: create the table, renaming to a timestamped name if the
    * target already exists. Returns the resolved table location. */
  def ensureTable(): String
  /** S7: append one batch; assigns tweet_id sink-side. */
  def append(df: DataFrame): Unit
}

object TweetSink {
  /** The declared sink schema (main.R:29-38). date_created is kept as a
    * TimestampType end-to-end (SQLite would degrade it to epoch INTEGER;
    * parquet keeps the type). */
  val schema: StructType = StructType(Seq(
    StructField("tweet_id", LongType),
    StructField("date_created", TimestampType),
    StructField("user", StringType),
    StructField("content", StringType),
    StructField("source", StringType),
    StructField("location", StringType),
    StructField("quoted_user", StringType),
    StructField("quoted_content", StringType),
  ))

  /** S6: reference renames the NEW database to `YYYYMMDD_HHMMSS_<name>`
    * when the target exists (main.R:20-24). */
  def collisionSafeName(path: String, exists: String => Boolean,
      now: () => LocalDateTime = () => LocalDateTime.now()): String = {
    if (!exists(path)) path
    else {
      val p = Paths.get(path)
      val stamped = now().format(DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")) +
        "_" + p.getFileName.toString
      Option(p.getParent).map(_.resolve(stamped).toString).getOrElse(stamped)
    }
  }
}

/** Parquet-table implementation. No SQLite JDBC driver ships in the
  * offline environment, so the same contract runs against a parquet
  * directory table — append-only, schema-checked, surrogate ids. (The
  * JDBC formulation is [[JdbcTweetSink]]; swap via the CLI `--database`
  * URL scheme.)
  *
  * tweet_id parity note: SQLite's INTEGER PRIMARY KEY assigns contiguous
  * rowids in insertion order. `contiguousIds = true` reproduces that with
  * max(id) + row_number over the batch's data order — correct, but the
  * global row_number serializes the batch through one task, so it is the
  * opt-in parity mode for modest batches (pinned by StreamingEtlSpec's S7
  * parity test). The DEFAULT is the scale path: ids from
  * monotonically_increasing_id + a base offset — unique and ascending per
  * batch, not dense, fully parallel (the reference never promises density
  * either; SQLite rowids skip after deletes). */
final class ParquetTweetSink(spark: SparkSession, path: String,
    contiguousIds: Boolean = false) extends TweetSink {
  private val log = LoggerFactory.getLogger(getClass)
  private var resolved: Option[String] = None

  def tablePath: String = resolved.getOrElse(path)

  override def ensureTable(): String = {
    val target = TweetSink.collisionSafeName(path,
      p => Files.exists(Paths.get(p)))
    if (target != path)
      log.info(s"database $path exists; using $target instead")
    resolved = Some(target)
    // S5: materialize the declared schema as an empty parquet table.
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      TweetSink.schema).write.mode(SaveMode.ErrorIfExists).parquet(target)
    log.info(s"created table tweet_data at $target")
    target
  }

  override def append(df: DataFrame): Unit = {
    val target = tablePath
    // S8: "connection" per operation — each append re-reads current state,
    // no session-held handles (mirrors dbConnect/dbDisconnect per load,
    // main.R:117-119).
    val base: Long =
      if (Files.exists(Paths.get(target)))
        spark.read.parquet(target).agg(coalesce(max(col("tweet_id")), lit(0L)))
          .head().getLong(0)
      else 0L
    val ordered = df.columns.map(c => col(c).asc_nulls_last)
    val withId =
      if (contiguousIds) {
        val w = Window.orderBy(ordered.toIndexedSeq: _*)
        df.withColumn("tweet_id", lit(base) + row_number().over(w).cast("long"))
      } else {
        df.withColumn("tweet_id",
          lit(base) + monotonically_increasing_id() + lit(1L))
      }
    withId.select(TweetSink.schema.fieldNames.map(col).toIndexedSeq: _*)
      .write.mode(SaveMode.Append).parquet(target)
    log.info(s"appended batch to tweet_data at $target")
  }
}

/** JDBC formulation of the same contract (S5-S8) for environments that do
  * ship a driver (e.g. sqlite-jdbc, postgres). Not exercisable offline —
  * no JDBC driver jar is present — but the code path is the documented
  * production shape: DDL pass-through + df.write.jdbc append per batch. */
final class JdbcTweetSink(spark: SparkSession, url: String,
    table: String = "tweet_data") extends TweetSink {
  private val log = LoggerFactory.getLogger(getClass)

  val createTableSql: String =
    s"""CREATE TABLE IF NOT EXISTS $table(
       |  tweet_id INTEGER PRIMARY KEY,
       |  date_created INTEGER,
       |  "user" TEXT,
       |  content TEXT,
       |  source TEXT,
       |  location TEXT,
       |  quoted_user TEXT,
       |  quoted_content TEXT)""".stripMargin

  override def ensureTable(): String = {
    val conn = java.sql.DriverManager.getConnection(url)
    try { conn.createStatement().execute(createTableSql); url }
    finally conn.close()
  }

  override def append(df: DataFrame): Unit = {
    // Sink assigns tweet_id (rowid) — write only the 7 transform columns,
    // exactly like dbWriteTable(append=TRUE) (main.R:117-119).
    df.write.mode(SaveMode.Append)
      .jdbc(url, table, new java.util.Properties())
    log.info(s"appended batch to $table via $url")
  }
}
