package graft

import java.nio.file.Files

import graft.queries.GraftQuery

/** Every documents/embeddings query must run — to zero, guard, or partial
  * rows, never a crash — on a DEGENERATE corpus: null/empty/whitespace
  * text, null source/lang, unicode, a pathological single 10k-char token,
  * plus null/empty/short embedding vectors. At 100 TB dirty rows are not
  * an edge case, they are a statistical certainty, and Spark 4's default
  * ANSI mode turns sloppy expressions into task failures (throwing CAST,
  * out-of-range element_at, …) where DuckDB-style semantics yield NULL.
  * Complements EmptyCorpusSpec (zero rows) with the dirty-rows axis. */
class DegenerateCorpusSpec extends SparkSpec {
  import spark.implicits._

  test("d/e/m queries survive null, empty, unicode, and ragged rows") {
    val dir = Files.createTempDirectory("graft-degen").toString
    val longTok = "x" * 10000
    Seq[(Long, String, String, String, java.lang.Long)](
      (1L, null, null, null, null),
      (2L, "", "es", "", 0L),
      (3L, "   \t  \n ", "es", "ab", 8L),
      (4L, "a", "en", "wiki", 1L),
      (5L, "☃ 🙂 héllo wörld", "de", "src2", 14L),
      (6L, longTok, "en", "src3", 10000L),
      (7L, "hello world foo bar baz qux", "en", "src4", 27L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq[(Long, Array[Float], java.lang.Integer)](
      (1L, null, null),
      (2L, Array.empty[Float], 0),
      (3L, Array(0.5f), 1),
      (4L, Array.tabulate(64)(i => (i % 7 - 3).toFloat / 4f), 2),
      (5L, Array.fill(64)(0f), 3), // zero vector: cosine 0/0 guard
      (6L, Array.tabulate(64)(i => (i % 5 - 2).toFloat / 3f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val failures = GraftQuery.all
      .filter(q => q.name.head == 'd' || q.name.head == 'e' || q.name.head == 'm')
      .flatMap { q =>
        try {
          q.run(spark, dir).write.format("noop").mode("overwrite").save()
          None
        } catch {
          case e: Throwable =>
            val root = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
              .toSeq.last
            Some(s"${q.name}: ${root.getClass.getSimpleName}: " +
              s"${Option(root.getMessage).getOrElse("").linesIterator.take(2).mkString(" | ")}")
        }
      }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
