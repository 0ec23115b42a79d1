package graft

import org.apache.spark.sql.{DataFrame, Row}

/** Canonical result hashing for the GOLDEN.json regression pins.
  *
  * Eight registered queries are rows-only by design (d10/d11/d12/d15,
  * e05/e13, q17/q33 — native hash functions, sketch estimators, or
  * iterative quantizers DuckDB cannot replay), so the driver's oracle
  * gate checks only that they RUN. Each is semantically pinned by a
  * hash-passing md5 analog (d50/d51, d47, d53, e14, e15, q34/q35/q41,
  * q30), but the native executables themselves had no regression pin: a
  * silent output drift (a hash-function change, a seed change, an
  * accidental reorder of an iterative loop) would pass every gate.
  *
  * GOLDEN.json (repo root) freezes each one's sf0.01 result hash; the
  * canonicalization mirrors the driver's DuckDB compare so the pin means
  * the same thing as the oracle gate: columns sorted by NAME, every value
  * rendered to a stable string, rows sorted lexicographically, md5 over
  * the joined lines. All eight queries are deterministic on fixed input
  * (fixed hash families, fixed k-means seeds, order-free aggregations),
  * which is itself part of what the pin asserts.
  *
  * Regenerate (only after a DELIBERATE semantic change, stated in the
  * commit): `sbt "Test/runMain graft.GoldenGen"`.
  */
object GoldenHash {

  /** The queries pinned by GOLDEN.json: every rows-only entry in
    * SparkEntry (no oracleSql), kept as an explicit list so a NEW
    * rows-only query fails GoldenHashSpec until it is pinned here. */
  val pinned: Seq[String] = Seq(
    "d10_simhash", "d11_simhash_pairs", "d12_minhash_lsh_pairs",
    "d15_neardup_clusters", "e05_ivf_topk", "e13_pq_adc_recall",
    "e19_ivfpq_topk", "q17_events_approx_users", "q33_percentiles_sketch",
    // round 18: the BPE merge loop (iterative driver loop, no
    // single-statement SQL analog; d68 hash-pins its step 0)
    "d80_bpe_train",
    // round 19: the native single-pass bigram-entropy expression (a
    // per-row hash-map fold has no single-statement SQL analog);
    // Round19OpsSpec pins frame EQUALITY with the oracle-gated d86
    "d89_bigram_entropy_native",
    // round 20: the BPE encoder + fertility sweep ride d80's iterative
    // trained merges (the same no-SQL-analog class); apply semantics
    // are oracle-pinned by d94's replace-chain geometry and the
    // Round20OpsSpec encode∘train laws
    "d92_bpe_encode", "d93_bpe_fertility_sweep")

  val sfDir = "/root/testdata/sf0.01"
  val file = "GOLDEN.json"

  private def fmt(v: Any): String = v match {
    case null => "␀"
    case d: java.lang.Double =>
      if (d.isNaN) "NaN" else d.toString
    case f: java.lang.Float =>
      if (f.isNaN) "NaN" else f.toString
    case a: Array[Byte] => a.map(b => f"$b%02x").mkString
    case a: Array[_] => a.map(fmt).mkString("[", ",", "]")
    case s: scala.collection.Seq[_] => s.map(fmt).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => fmt(k) + ":" + fmt(x) }
        .sorted.mkString("{", ",", "}")
    case r: Row => r.toSeq.map(fmt).mkString("(", ",", ")")
    case x => x.toString
  }

  /** (rowCount, md5) of the canonicalized result. Collects — the pinned
    * results are all ≤500 rows at sf0.01 by construction. */
  def resultHash(df: DataFrame): (Long, String) = {
    val cols = df.columns.sorted
    val rows = df.select(cols.head, cols.tail: _*).collect()
      .map(r => r.toSeq.map(fmt).mkString("|")).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach(r => md.update((r + "\n").getBytes("UTF-8")))
    (rows.length.toLong, md.digest().map(b => f"$b%02x").mkString)
  }

  def entryLine(name: String, rows: Long, hash: String): String =
    s"""  "$name": {"rows": $rows, "hash": "$hash"}"""

  private val entryRe =
    """"([^"]+)":\s*\{"rows":\s*(\d+),\s*"hash":\s*"([0-9a-f]+)"\}""".r

  /** name → (rows, hash) parsed from GOLDEN.json. */
  def load(path: String = file): Map[String, (Long, String)] = {
    val txt = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      "UTF-8")
    entryRe.findAllMatchIn(txt)
      .map(m => m.group(1) -> (m.group(2).toLong, m.group(3))).toMap
  }
}

/** Writes GOLDEN.json from the current implementations — run ONLY when a
  * pinned query's semantics change deliberately. */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("graft-golden-gen")
    spark.sparkContext.setLogLevel("ERROR")
    val entries = GoldenHash.pinned.map { name =>
      val fn = SparkEntry.queries(name)
      val (rows, hash) = GoldenHash.resultHash(fn(spark, GoldenHash.sfDir))
      println(s"[golden] $name rows=$rows hash=$hash")
      GoldenHash.entryLine(name, rows, hash)
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(GoldenHash.file),
      entries.mkString("{\n", ",\n", "\n}\n"))
    spark.stop()
  }
}
