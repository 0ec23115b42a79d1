package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression for winnowing (MOSS) document fingerprints —
  * the whole pipeline of [[graft.operators.Winnowing]] (tokenize → per-token
  * char-fold hash → rolling k-gram hash → sliding-window min → distinct) as
  * ONE O(chars + tokens) pass per row.
  *
  * Why native and not `functions._`: the SQL-expression formulation
  * (chained Project aliases th → kh → fps, each a `transform`/`aggregate`
  * HOF) was correct but fell into an optimizer trap at scale:
  * `InferFiltersFromGenerate` derives `size(fps) > 0` from the downstream
  * explode, and predicate pushdown substitutes the FULL alias chain into
  * that filter condition — the per-token char fold ends up ~16× nested
  * inside `transform`/`slice` lambda bodies, re-evaluated per lambda
  * iteration: O(windows × k-grams × chars) interpreted HOF steps per row,
  * non-terminating at sf0.1 (round-5 verdict, What's wrong #1). A single
  * opaque expression gives the optimizer nothing to inline: the inferred
  * `size(...) > 0` filter costs exactly one extra evaluation of this
  * linear-time expression, and everything stays in whole-stage codegen.
  *
  * Hash definition (bit-identical to the DuckDB oracle CTE in
  * TextQueries.sqlWinnowCte — constants must not drift):
  *   - token hash:   fold over code points, h = (h*131 + cp) mod 2^31, h0=0
  *   - k-gram hash:  fold over k token hashes, g = (g*1009 + h_i) mod 2^31
  *     (taking mod at each step is congruent to the oracle's single final
  *     mod, and keeps every intermediate < 2^52)
  *   - fingerprints: distinct minima of each w-wide sliding window over the
  *     k-gram sequence; fewer than w k-grams → the single global min;
  *     fewer than k tokens → empty.
  * Tokens are maximal runs of non-`\s` chars (ASCII space/tab/LF/VT/FF/CR),
  * identical boundaries to `filter(split(trim(c), "\\s+"), length(_) > 0)`
  * and to the byte-level tokenizer in [[TextOps.simhash64]].
  */
object WinnowExprs {

  /** Distinct winnowed fingerprints of a raw text column (sorted
    * array<long>); null in → null out, < k tokens → empty array. */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    GraftSqlBridge.column(WinnowFingerprints(GraftSqlBridge.expression(text), k, w))
}

case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"k and w must be positive (got k=$k, w=$w)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(input: Any): Any =
    WinnowOps.fingerprints(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowOps.fingerprints($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** Static helper called from both interpreted eval and generated code. */
object WinnowOps {

  private val Mod = 2147483648L // 2^31
  private val CharBase = 131L
  private val GramBase = 1009L

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || (c >= '\t' && c <= '\r')

  def fingerprints(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    // String domain so code-point folding matches the oracle's
    // split(t,'') + ascii(c) on any input (byte == code point on the
    // verified-ASCII corpus; non-ASCII still agrees because both sides
    // fold code points).
    val s = text.toString
    val n = s.length

    // 1. per-token char-fold hashes
    var th = new Array[Long](16)
    var m = 0
    var i = 0
    while (i < n) {
      if (isWs(s.charAt(i))) i += 1
      else {
        var h = 0L
        while (i < n && !isWs(s.charAt(i))) {
          val cp = s.codePointAt(i)
          h = (h * CharBase + cp) % Mod
          i += Character.charCount(cp)
        }
        if (m == th.length) th = java.util.Arrays.copyOf(th, m * 2)
        th(m) = h
        m += 1
      }
    }
    if (m < k) return new GenericArrayData(Array.emptyLongArray)

    // 2. k-gram rolling hashes (one per window of k consecutive tokens)
    val kn = m - k + 1
    val kh = new Array[Long](kn)
    var j = 0
    while (j < kn) {
      var g = 0L
      var t = 0
      while (t < k) { g = (g * GramBase + th(j + t)) % Mod; t += 1 }
      kh(j) = g
      j += 1
    }

    // 3. w-wide sliding-window minima via a monotone deque — O(kn) total.
    //    Window starts run 0..max(kn-w, 0); kn < w degenerates to the
    //    single global min (same as the oracle's truncated slice).
    val wins = math.max(kn - w, 0) + 1
    val mins = new Array[Long](wins)
    val dq = new Array[Int](kn) // indices into kh, values increasing
    var head = 0
    var tail = 0
    var p = 0
    while (p < kn) {
      while (tail > head && kh(dq(tail - 1)) >= kh(p)) tail -= 1
      dq(tail) = p
      tail += 1
      while (dq(head) <= p - w) head += 1
      if (p >= w - 1) mins(p - w + 1) = kh(dq(head))
      p += 1
    }
    if (kn < w) mins(0) = kh(dq(head))

    // 4. sorted distinct (the fingerprint SET is what dedup joins on)
    java.util.Arrays.sort(mins)
    var out = 0
    var r = 0
    while (r < mins.length) {
      if (out == 0 || mins(r) != mins(out - 1)) { mins(out) = mins(r); out += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, out))
  }
}
