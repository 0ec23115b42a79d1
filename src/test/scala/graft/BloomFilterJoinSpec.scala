package graft

import org.apache.spark.sql.functions._

/** Pins the runtime-filter seam of the 100 TB scan story: when a fact
  * table shuffle-joins a dimension carrying a selective predicate, Spark's
  * `InjectRuntimeFilter` should plant a bloom filter built from the
  * filtered dimension keys on the fact side, so fact rows that cannot
  * match are dropped BEFORE the join exchange — at 100 TB that is the
  * difference between shuffling the whole fact table and shuffling the
  * ~1/k of it a selective dimension admits. Broadcast joins don't need it
  * (the hash table itself filters); the seam matters exactly where the
  * fact side is too big to avoid a shuffle — which is why the test forces
  * the shuffle path.
  *
  * Like SkewJoinSpec, this proves the machinery ENGAGES under the
  * engine's session wiring (thresholds lowered to fixture scale: the
  * 10 GB application-side default is sized for real clusters); a static
  * plan assertion cannot show a runtime-injected subquery filter.
  *
  * Mutates session confs; restores them in `finally` — safe because
  * ScalaTest runs this suite's tests sequentially on the shared session.
  */
class BloomFilterJoinSpec extends SparkSpec {

  test("a selective dim predicate injects a bloom filter on the fact side " +
      "of a shuffle join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    val dir = java.nio.file.Files.createTempDirectory("graft-bloomjoin")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter" +
        ".applicationSideScanSizeThreshold", "1KB")
      // File sources on purpose: the injection rule sizes both sides from
      // scan statistics, which in-memory LocalRelations don't carry the
      // same way.
      spark.range(100000)
        .select(col("id").as("f_key"), (col("id") * 2).as("v"))
        .write.parquet(s"$dir/fact")
      spark.range(2000)
        .select(col("id").as("d_key"), (col("id") % 7).as("cat"))
        .write.parquet(s"$dir/dim")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("cat") === 3)
      val joined = fact.join(dim, col("f_key") === col("d_key"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no bloom filter (might_contain) was injected on the fact side:\n$optimized")
      // and the filter is transparent: same rows as the unfiltered logic
      val expected = dim.count()
      assert(joined.count() === expected,
        "bloom-filtered join changed the result row count")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None)    => conf.unset(k)
      }
      val walk = java.nio.file.Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally walk.close()
    }
  }
}
