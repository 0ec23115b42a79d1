package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Throwaway stage bisection for d39 — delete after use. */
object DebugD39 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      sys.error("set SPARK_GRAFT_SF_DIR"))
    val spark = GraftSession.getOrCreate("graft-debug-d39")
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.MinHashExprs
    import graft.functions.TextFunctions._
    import graft.operators.NearDup
    import graft.sources.Tables
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[d39] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm
    Tables.documents(spark, sfDir).limit(64)
      .select(cleanTextAscii(col("text"))).write.format("noop")
      .mode("overwrite").save()

    val sparkGrams =
      """CASE WHEN size(toks) >= 3 THEN
           transform(sequence(0, size(toks)-3), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))
         ELSE cast(array() as array<string>) END"""
    def sets = Tables.documents(spark, sfDir)
      .withColumn("toks", tokens(col("text")))
      .withColumn("gs", array_distinct(expr(sparkGrams)))
      .select(col("doc_id"), col("gs"), size(col("gs")).as("sz"),
        MinHashExprs.shingleHashes(col("toks")).as("hs"))
    def ex = sets.select(col("doc_id"), col("sz"), explode(col("gs")).as("g"))
    def dfreq = ex.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))
    def pref = ex.join(dfreq.hint("shuffle_hash"), "g")
      .withColumn("rn", row_number().over(wDoc))
      .filter(col("rn") <= expr("sz div 2 + 1"))
      .select(col("doc_id"), col("g"))
    def buckets = pref.groupBy(col("g"))
      .agg(sort_array(collect_list(struct(col("doc_id")))).as("docs"))
      .filter(size(col("docs")) <= 64)
    def cand = NearDup.pairsWithinBuckets(buckets)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()

    def verifyOld = {
      val aSide = sets.select(col("doc_id").as("a_id"), col("hs").as("a_hs"))
        .join(broadcast(cand), "a_id")
      sets.select(col("doc_id").as("b_id"), col("hs").as("b_hs"))
        .join(broadcast(aSide), "b_id")
        .withColumn("jaccard", MinHashExprs.jaccardSorted(col("a_hs"), col("b_hs")))
        .filter(col("jaccard") >= 0.5)
        .select(col("a_id"), col("b_id"), col("jaccard"))
    }
    def verifyNew = {
      val roles = cand.select(explode(array(
          struct(col("a_id"), col("b_id"), lit("a").as("role"), col("a_id").as("id")),
          struct(col("a_id"), col("b_id"), lit("b").as("role"), col("b_id").as("id")))).as("r"))
        .select(col("r.a_id"), col("r.b_id"), col("r.role"), col("r.id"))
      sets.select(col("doc_id").as("id"), col("hs"))
        .join(broadcast(roles), "id")
        .groupBy(col("a_id"), col("b_id"))
        .agg(first(when(col("role") === "a", col("hs")), ignoreNulls = true).as("a_hs"),
          first(when(col("role") === "b", col("hs")), ignoreNulls = true).as("b_hs"))
        .withColumn("jaccard", MinHashExprs.jaccardSorted(col("a_hs"), col("b_hs")))
        .filter(col("jaccard") >= 0.5)
        .select(col("a_id"), col("b_id"), col("jaccard"))
    }
    time("verifyOld a")(verifyOld.write.format("noop").mode("overwrite").save())
    time("verifyNew a")(verifyNew.write.format("noop").mode("overwrite").save())
    time("verifyOld b")(verifyOld.write.format("noop").mode("overwrite").save())
    time("verifyNew b")(verifyNew.write.format("noop").mode("overwrite").save())
    time("sets")(sets.write.format("noop").mode("overwrite").save())
    time("ex")(ex.write.format("noop").mode("overwrite").save())
    time("dfreq")(dfreq.write.format("noop").mode("overwrite").save())
    time("pref")(pref.write.format("noop").mode("overwrite").save())
    time("buckets")(buckets.write.format("noop").mode("overwrite").save())
    time("cand")(cand.write.format("noop").mode("overwrite").save())
    val q = graft.queries.GraftQuery.all.find(_.name == "d39_prefix_jaccard_join").get
    time("full (1st)")(q.run(spark, sfDir).write.format("noop").mode("overwrite").save())
    time("full (2nd)")(q.run(spark, sfDir).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
