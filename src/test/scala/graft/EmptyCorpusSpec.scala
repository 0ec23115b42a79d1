package graft

import java.nio.file.Files

import graft.sources.Tables

/** Every registered query must run (to zero or guard rows, never a crash)
  * against completely EMPTY tables — the query-level generalization of
  * the reference's empty-input guard (S4, main.R). Empty partitions are
  * routine at 100 TB (a fresh date partition, an all-filtered source);
  * a query that analyzes or executes differently on zero rows is a
  * latent pipeline-breaker. This caught e05 at round 6: an empty
  * quantizer made `cellOf` build a VOID-typed array() (analysis crash)
  * and `ivfTopK`'s probe lookup a driver-side head() crash. */
class EmptyCorpusSpec extends SparkSpec {

  test("every registered query survives fully empty tables") {
    val dir = Files.createTempDirectory("graft-empty").toString
    Tables.names.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val failures = sweepFailures(dir, _ => true)
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
