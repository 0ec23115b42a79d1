package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (with `doGenCode`) for the two text operators
  * whose `functions._` formulations dominate the bench profile:
  *
  *   - [[ScrubWords]] — whole-word stopword removal. The regex form
  *     (`regexp_replace(c, "\\b(?:w1|…|w308)\\b", "")`) retries a 308-way
  *     alternation at every character position; this expression does one
  *     linear pass with an O(1) hash-set probe per word.
  *   - [[SimHash64]] — 64-bit SimHash over whitespace tokens. The SQL
  *     `aggregate`/`zip_with` form allocates a 64-element array per token and
  *     re-evaluates `xxhash64(token)` once per bit; this expression hashes
  *     each token once and keeps 64 scalar counters.
  *
  * Both are null-safe unary string expressions that stay inside whole-stage
  * codegen (the generated code calls the static helpers in [[TextOps]]), so
  * they fuse with the surrounding scan/project stage — no UDF boundary, no
  * serialization. Semantics notes live on each class.
  */
object TextExprs {

  /** Remove every maximal ASCII-word run (`[A-Za-z0-9_]+`) of `c` that is in
    * `words`, keeping all other characters. Equivalent to
    * `regexp_replace(c, "\\b(?:" + words.mkString("|") + ")\\b", "")` (ASCII
    * `\b`/`\w` dialect) for stopword lists whose entries are pure ASCII word
    * characters — verified by TextFunctionsSpec against the regex form. */
  def scrubWords(c: Column, words: Seq[String]): Column =
    GraftSqlBridge.column(ScrubWords(GraftSqlBridge.expression(c), words))

  /** One-pass SimHash-64 of the whitespace tokens of `c` (xxhash64, seed 42,
    * same hash family as `functions.xxhash64`). */
  def simhash64(c: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(c)))

  /** Count of maximal ASCII-word runs of `c` contained in `words` —
    * equivalent to `size(regexp_extract_all(c, "\\b(?:w1|…)\\b", 0))` for
    * pure-word-char entries (same equivalence argument as [[ScrubWords]]),
    * in one linear pass. */
  def countWordsIn(c: Column, words: Seq[String]): Column =
    GraftSqlBridge.column(CountWordsIn(GraftSqlBridge.expression(c), words))

  /** Greedy BPE ENCODE of a word column under an ORDERED merge list —
    * the corpus-scale APPLY of the tokenizer [[graft.operators.Bpe]]
    * trains: code-point symbols, each merge applied left-to-right
    * non-overlapping in training order (Bpe.mergePair's fold semantics),
    * as ONE codegen'd per-row pass over the whole merge table. The
    * aggregate-lambda form would nest k folds (k=256 blows past JIT
    * limits and re-materializes the symbol array per step); here the
    * merge table is a plan-literal reference object and the row cost is
    * O(len × k) with zero per-step allocation churn. */
  def bpeEncode(c: Column, merges: Seq[(String, String)]): Column =
    GraftSqlBridge.column(BpeEncode(GraftSqlBridge.expression(c), merges))

  /** One-pass char-bigram statistics of `c` (d86's measurement computed
    * without the bigram explode/shuffle): struct(n_bigrams, n_distinct,
    * entropy, eff_alphabet), bit-identical to d86's oracle-pinned values
    * — the per-bigram ln rounds through the SAME shortest-repr
    * BigDecimal HALF_UP as Spark's round(), weights sum as exact
    * decimals, and the final divide/exp run in the same op order. NULL
    * for inputs with fewer than 2 chars (d86 leaves those rows'
    * entropy NULL). */
  def charBigramStats(c: Column): Column =
    GraftSqlBridge.column(CharBigramStats(GraftSqlBridge.expression(c)))
}

/** Whole-word stopword scrub: removes maximal `[A-Za-z0-9_]+` runs contained
  * in the word set.
  *
  * Equivalence with the ASCII regex form `\b(?:w1|…)\b` for pure-word-char
  * entries: `\b` bounds a match by non-word characters (or string edges) on
  * both sides, and the alternation entries are all word characters, so a
  * match is exactly a maximal word run equal to some entry. Entries that
  * contain non-word characters (e.g. accented Spanish stopwords under the
  * ASCII dialect) can never equal a maximal run and must be handled by a
  * separate (much smaller) regex pass — see TextFunctions.cleanTextAscii.
  */
case class ScrubWords(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "scrub_words"

  @transient private lazy val wordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](words.size * 2)
    words.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    TextOps.scrub(input.asInstanceOf[UTF8String], wordSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", wordSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextOps.scrub($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): ScrubWords =
    copy(child = newChild)
}

/** SimHash-64 over whitespace tokens: each token's xxhash64 (seed 42) votes
  * +1/−1 per bit position; the signature takes the sign of each counter.
  * Tokens are maximal runs of non-`\s` bytes (`\s` = ASCII
  * space/tab/LF/VT/FF/CR, the Java regex default) — identical token
  * boundaries to `filter(split(trim(c), "\\s+"), t -> length(t) > 0)`.
  * Empty/whitespace-only input hashes to signature 0. */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    TextOps.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextOps.simhash64($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Whole-word hit counter: counts maximal `[A-Za-z0-9_]+` runs contained in
  * the word set (see [[ScrubWords]] for the regex-equivalence argument). */
case class CountWordsIn(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_words_in"

  @transient private lazy val wordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](words.size * 2)
    words.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    TextOps.countWordsIn(input.asInstanceOf[UTF8String], wordSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", wordSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextOps.countWordsIn($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): CountWordsIn =
    copy(child = newChild)
}

/** Greedy ordered-merge BPE encoder (see [[TextExprs.bpeEncode]]).
  * Segmentation is Unicode code points (an astral char is one symbol) —
  * identical to Bpe.train's `substring` split and Bpe.codePointSyms.
  * Each merge (l, r) rewrites the symbol sequence left-to-right
  * non-overlapping, exactly [[graft.operators.Bpe.mergePair]]'s
  * append-or-replace-last fold — so encode(train(k)) reproduces the
  * training table's final symbols word for word (spec-pinned), and for
  * single-char merge chains the token count equals the placeholder
  * replace-chain form (d94's oracle-checkable geometry). Output
  * array<string> is never null for non-null input ("" → empty array). */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  import org.apache.spark.sql.types.ArrayType

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val mergeArr: Array[Array[String]] =
    merges.map { case (l, r) => Array(l, r) }.toArray

  override protected def nullSafeEval(input: Any): Any =
    TextOps.bpeEncode(input.asInstanceOf[UTF8String], mergeArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeMerges", mergeArr, "java.lang.String[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextOps.bpeEncode($c, $mRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

/** One-pass char-bigram stats: struct(n_bigrams L, n_distinct L,
  * entropy D, eff_alphabet D) over consecutive Unicode CODE POINTS —
  * the same segmentation as `split(text, '')` (Java's split("") never
  * splits a surrogate pair, so an astral char is one element), so
  * counts agree with d86's explode form on any input, astral chars
  * included, and bit-for-bit on the ASCII corpus. Entropy replicates d86's exact
  * arithmetic: H = −(Σ_b c_b · round6(ln(c_b/n)) as DECIMAL(…,6))/n
  * with round6 = Spark's shortest-repr BigDecimal HALF_UP — so the
  * native path and the oracle-pinned d86 emit IDENTICAL doubles
  * (spec-asserted frame equality). Returns null when n_bigrams = 0. */
case class CharBigramStats(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = CharBigramStats.schema
  override def nullable: Boolean = true
  override def prettyName: String = "char_bigram_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextOps.charBigramStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      InternalRow r = graft.functions.TextOps.charBigramStats($c);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r; }""")

  override protected def withNewChildInternal(newChild: Expression): CharBigramStats =
    copy(child = newChild)
}

object CharBigramStats {
  import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
  val schema: StructType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false),
    StructField("eff_alphabet", DoubleType, nullable = false)))
}

/** Static helpers called from both interpreted eval and generated code. */
object TextOps {

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** Count maximal ASCII-word runs of `input` found in `words`. */
  def countWordsIn(input: UTF8String, words: java.util.HashSet[String]): Int = {
    val s = input.toString
    val n = s.length
    var count = 0
    var i = 0
    while (i < n) {
      if (isWordChar(s.charAt(i))) {
        var j = i + 1
        while (j < n && isWordChar(s.charAt(j))) j += 1
        if (words.contains(s.substring(i, j))) count += 1
        i = j
      } else i += 1
    }
    count
  }

  /** Single pass over the string: copy through everything except maximal
    * ASCII-word runs found in `stop`. */
  def scrub(input: UTF8String, stop: java.util.HashSet[String]): UTF8String = {
    val s = input.toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (isWordChar(c)) {
        var j = i + 1
        while (j < n && isWordChar(s.charAt(j))) j += 1
        if (!stop.contains(s.substring(i, j))) sb.append(s, i, j)
        i = j
      } else {
        sb.append(c)
        i += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }

  // ASCII whitespace bytes of Java regex \s; multi-byte UTF-8 chars all have
  // the high bit set, so byte-level scanning is UTF-8 safe.
  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** One-pass SimHash-64 over the UTF-8 bytes (no tokens array, one
    * xxhash64 per token). */
  def simhash64(input: UTF8String): Long = {
    val base = input.getBaseObject
    val off = input.getBaseOffset
    val n = input.numBytes
    val counters = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (isWs(Platform.getByte(base, off + i))) i += 1
      else {
        var j = i + 1
        while (j < n && !isWs(Platform.getByte(base, off + j))) j += 1
        val h = XXH64.hashUnsafeBytes(base, off + i, j - i, 42L)
        var k = 0
        while (k < 64) {
          if (((h >>> k) & 1L) == 1L) counters(k) += 1 else counters(k) -= 1
          k += 1
        }
        i = j
      }
    }
    var sig = 0L
    var k = 0
    while (k < 64) {
      if (counters(k) > 0) sig |= 1L << k
      k += 1
    }
    sig
  }

  /** Greedy ordered-merge BPE encode (see [[BpeEncode]]): code-point
    * split, then each merge applied left-to-right non-overlapping with
    * an in-place two-pointer rewrite (the write head never passes the
    * read head, so no per-merge array copy). */
  def bpeEncode(input: UTF8String,
      merges: Array[Array[String]]): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val s = input.toString
    var n = s.codePointCount(0, s.length)
    val syms = new Array[String](n)
    var i = 0
    var j = 0
    while (i < s.length) {
      val e = s.offsetByCodePoints(i, 1)
      syms(j) = s.substring(i, e)
      j += 1
      i = e
    }
    var m = 0
    while (m < merges.length && n > 1) {
      val l = merges(m)(0)
      val r = merges(m)(1)
      var w = 0
      var k = 0
      while (k < n) {
        val x = syms(k)
        if (w > 0 && x == r && syms(w - 1) == l) syms(w - 1) = l + r
        else {
          syms(w) = x
          w += 1
        }
        k += 1
      }
      n = w
      m += 1
    }
    val out = new Array[Any](n)
    var t = 0
    while (t < n) {
      out(t) = UTF8String.fromString(syms(t))
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** One-pass char-bigram stats (see [[CharBigramStats]]): a single
    * per-row hash map replaces d86's explode → shuffle → two-level
    * aggregation. Entropy arithmetic replicates Spark's exact pipeline
    * verbatim: BigDecimal.valueOf (shortest-repr) HALF_UP rounding for
    * round(·, 6), exact decimal weight sums, doubleValue casts — so the
    * result is bit-identical to the oracle-pinned d86 frame. */
  def charBigramStats(input: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = input.toString
    // CODE POINTS, not UTF-16 units: Java's split("") (d86's
    // segmentation) never splits a surrogate pair, so an astral char is
    // ONE element — iterating chars here would cut pairs in half and
    // silently diverge from the oracle-pinned frame on non-BMP text.
    val cps = s.codePointCount(0, s.length)
    val n = cps - 1
    if (n < 1) return null
    val counts = new java.util.HashMap[String, Array[Long]](64)
    var i = 0
    var mid = if (s.isEmpty) 0 else s.offsetByCodePoints(0, 1)
    var k = 0
    while (k < n) {
      val end = s.offsetByCodePoints(mid, 1)
      val bg = s.substring(i, end)
      val slot = counts.get(bg)
      if (slot == null) counts.put(bg, Array(1L)) else slot(0) += 1L
      i = mid; mid = end; k += 1
    }
    val nD = n.toDouble
    var sum = java.math.BigDecimal.ZERO
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      val r6 = java.math.BigDecimal.valueOf(math.log(c.toDouble / nD))
        .setScale(6, java.math.RoundingMode.HALF_UP)
      sum = sum.add(r6.multiply(java.math.BigDecimal.valueOf(c)))
    }
    val h = -sum.doubleValue() / nD
    val entropy = java.math.BigDecimal.valueOf(h)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val eff = java.math.BigDecimal.valueOf(math.exp(h))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, counts.size.toLong, entropy, eff))
  }
}
