package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JIT'd kernels behind the [[TextFunctions]] surface (r21 optimization —
  * guide §1.2 "per-task work" / the brief's "eliminate non-codegen
  * Expressions in the hot path").
  *
  * The original [[TextFunctions]] bodies are higher-order-function
  * expression trees (`transform`/`filter`/`aggregate`); those are
  * CodegenFallback in Spark — every ELEMENT evaluation walks an interpreted
  * expression tree (~µs per element, boxing + InternalRow per lambda call).
  * A corpus pass that builds n-grams paid that per gram per document; the
  * profile of the r21 baseline showed the gram/token stages of
  * q_text_ppl*, q_dedup_spans/strip and the pipeline flagships burning
  * 5-8 s of task time on ~500 k interpreted element evaluations.
  *
  * The fix is the same one [[graft.vector.Distances]] applies to the
  * distance loops: a custom Catalyst `Expression` whose `doGenCode` stays
  * inside whole-stage codegen and calls ONE static JIT'd method per row —
  * no per-element interpretation, no UDF/serialization boundary, and the
  * plan shape is unchanged (still an expression over the string column, so
  * pushdown/pruning behave identically).
  *
  * Every kernel reproduces its expression twin BIT-FOR-BIT (same token
  * split, same IEEE double operation order, same floor/cast points —
  * TextKernelsSpec pins kernel == tree on the corpus plus adversarial
  * edges). The twins live on as `*Tree` methods in [[TextFunctions]].
  */
object TextKernels {

  // `\s+` of the expression form (java.util.regex on the decoded string —
  // the same engine Spark's StringSplit uses). The expression's trim(' ')
  // is provably redundant under split+filter: ' ' is \s, so edge spaces
  // only ever produce empty fragments the nonEmpty filter drops.
  private val WS = java.util.regex.Pattern.compile("\\s+")

  /** Whitespace tokens — the [[TextFunctions.tokens]] contract. */
  def tokens(s: String): Array[String] = {
    if (s.isEmpty) return Array.empty
    val parts = WS.split(s, -1)
    var keep = 0
    var i = 0
    while (i < parts.length) { if (parts(i).nonEmpty) keep += 1; i += 1 }
    if (keep == parts.length) parts
    else {
      val out = new Array[String](keep)
      var j = 0; i = 0
      while (i < parts.length) {
        if (parts(i).nonEmpty) { out(j) = parts(i); j += 1 }
        i += 1
      }
      out
    }
  }

  /** ALL word n-grams with repeats (space-joined windows); < n tokens →
    * empty. */
  def allNgrams(s: String, n: Int): Array[String] = {
    val w = tokens(s)
    if (w.length < n) return Array.empty
    val out = new Array[String](w.length - n + 1)
    var i = 0
    while (i < out.length) {
      val sb = new java.lang.StringBuilder(w(i))
      var k = 1
      while (k < n) { sb.append(' ').append(w(i + k)); k += 1 }
      out(i) = sb.toString
      i += 1
    }
    out
  }

  /** Distinct n-grams in first-occurrence order ([[TextFunctions.shingles]]
    * == array_distinct(allNgrams)). */
  def shingles(s: String, n: Int): Array[String] = {
    val g = allNgrams(s, n)
    if (g.length <= 1) return g
    val seen = new java.util.LinkedHashSet[String](g.length * 2)
    var i = 0
    while (i < g.length) { seen.add(g(i)); i += 1 }
    seen.toArray(new Array[String](seen.size))
  }

  // number of code points (Spark's length() semantics)
  private def numChars(s: String): Int = s.codePointCount(0, s.length)

  /** langId over NON-NULL text (the Column wrapper supplies the null →
    * 'und' arm): argmax of distinct-token marker hits, tie order
    * en > de > fr > es, 'und' when all zero. */
  def langId(s: String): String = {
    val w = tokens(s)
    val distinct = new java.util.HashSet[String](w.length * 2)
    var i = 0
    while (i < w.length) { distinct.add(w(i)); i += 1 }
    def hits(markers: Seq[String]): Int = {
      var c = 0
      markers.foreach(m => if (distinct.contains(m)) c += 1)
      c
    }
    val en = hits(TextFunctions.langMarkers(0)._2)
    val de = hits(TextFunctions.langMarkers(1)._2)
    val fr = hits(TextFunctions.langMarkers(2)._2)
    val es = hits(TextFunctions.langMarkers(3)._2)
    if (en == 0 && de == 0 && fr == 0 && es == 0) "und"
    else if (en >= de && en >= fr && en >= es) "en"
    else if (de >= fr && de >= es) "de"
    else if (fr >= es) "fr"
    else "es"
  }

  /** qualityMicros — identical IEEE operation order to the tree:
    * floor(((0.4*stopRatio + 0.4*alphaRatio) + 0.2*lenNorm) * 1e6). */
  def qualityMicros(s: String): Long = {
    val total = numChars(s)
    val w = tokens(s)
    if (total == 0 || w.length == 0) return 0L
    var stop = 0
    var i = 0
    while (i < w.length) {
      if (TextFunctions.stopwordSet.contains(w(i))) stop += 1
      i += 1
    }
    var alpha = 0
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) alpha += 1
      ci += Character.charCount(cp)
    }
    val n = w.length
    val stopRatio = stop.toDouble / n.toDouble
    val alphaRatio = alpha.toDouble / total.toDouble
    val lenNorm = math.min(n.toDouble / 100.0, 1.0)
    math.floor((0.4 * stopRatio + 0.4 * alphaRatio + 0.2 * lenNorm)
      * 1000000.0).toLong
  }

  /** Duplicate-n-gram fraction: floor((1.0 - distinct/total) * 1e6);
    * no grams → 0. */
  def dupNgramRatioMicros(s: String, n: Int): Long = {
    val g = allNgrams(s, n)
    if (g.length == 0) return 0L
    val set = new java.util.HashSet[String](g.length * 2)
    var i = 0
    while (i < g.length) { set.add(g(i)); i += 1 }
    math.floor((1.0 - set.size.toDouble / g.length.toDouble) * 1000000.0)
      .toLong
  }

  /** (dup_micros, top_micros) from one n-gram build — the
    * [[TextFunctions.repetitionMicros]] struct. */
  def repetitionMicros(s: String, n: Int): InternalRow = {
    val g = allNgrams(s, n)
    if (g.length == 0) return InternalRow(0L, 0L)
    val counts = new java.util.HashMap[String, Int](g.length * 2)
    var i = 0
    while (i < g.length) { counts.merge(g(i), 1, Integer.sum); i += 1 }
    var maxC = 0
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next(); if (c > maxC) maxC = c }
    val total = g.length
    val dup = math.floor(
      (1.0 - counts.size.toDouble / total.toDouble) * 1000000.0).toLong
    val top = math.floor(
      maxC.toDouble / total.toDouble * 1000000.0).toLong
    InternalRow(dup, top)
  }

  /** topNgramRatioMicros alone (spec twin of the struct's second field). */
  def topNgramRatioMicros(s: String, n: Int): Long =
    repetitionMicros(s, n).getLong(1)

  /** gopherStats — the five exact-integer MassiveText filter inputs. */
  def gopherStats(s: String): InternalRow = {
    val w = tokens(s)
    val n = w.length
    var totalLen = 0L
    var alphaWords = 0L
    var symbolWords = 0L
    val distinct = new java.util.HashSet[String](n * 2)
    var i = 0
    while (i < n) {
      val t = w(i)
      totalLen += numChars(t)
      var hasAlpha = false
      var hashes = 0L
      var ci = 0
      while (ci < t.length) {
        val cp = t.codePointAt(ci)
        if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z'))
          hasAlpha = true
        if (cp == '#') hashes += 1
        ci += Character.charCount(cp)
      }
      if (hasAlpha) alphaWords += 1
      // non-overlapping '...' occurrences, left-to-right (replace()
      // semantics: each removed match is exactly 3 chars)
      var from = 0
      var dots = 0L
      while ({ from = t.indexOf("...", from); from >= 0 }) {
        dots += 1; from += 3
      }
      symbolWords += hashes + dots
      distinct.add(t)
      i += 1
    }
    var stopHits = 0L
    TextFunctions.gopherStopwords.foreach(sw =>
      if (distinct.contains(sw)) stopHits += 1)
    if (n == 0) InternalRow(0L, 0L, 0L, 0L, stopHits)
    else InternalRow(
      n.toLong,
      math.floor(1000.0 * totalLen.toDouble / n.toDouble).toLong,
      math.floor(1000000.0 * symbolWords.toDouble / n.toDouble).toLong,
      math.floor(1000000.0 * alphaWords.toDouble / n.toDouble).toLong,
      stopHits)
  }

  /** xxhash64 (seed 42) of each n-gram's UTF-8 bytes — bit-equal to
    * `transform(allNgrams(c, n), g => xxhash64(g))` (Spark's XxHash64 over
    * a string column is XXH64.hashUnsafeBytes of its UTF-8 bytes, seed 42;
    * [[Dedup.shingleHash]] makes the same bet and DedupSpec pins it). */
  def allNgramHashes(s: String, n: Int): Array[Long] = {
    val g = allNgrams(s, n)
    val out = new Array[Long](g.length)
    var i = 0
    while (i < g.length) {
      val b = g(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
      i += 1
    }
    out
  }

  /** (xxhash64(gram), xxhash64(ctx)) per n-gram window, where ctx is the
    * gram's first n-1 tokens space-joined — the [[NgramLM]] probe keys,
    * computed in one pass without exploding gram STRINGS (bit-equal to
    * xxhash64 over the string forms; the ctx re-hashes the same prefix
    * bytes the gram shares). */
  def ngramCtxHashes(s: String, n: Int): Array[InternalRow] = {
    val w = tokens(s)
    if (w.length < n) return Array.empty
    val out = new Array[InternalRow](w.length - n + 1)
    var i = 0
    while (i < out.length) {
      val sb = new java.lang.StringBuilder(w(i))
      var k = 1
      while (k < n - 1) { sb.append(' ').append(w(i + k)); k += 1 }
      val ctx = sb.toString
      val cb = ctx.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val ctxHash = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(cb, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          cb.length, 42L)
      sb.append(' ').append(w(i + n - 1))
      val gb = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val gramHash = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(gb, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          gb.length, 42L)
      out(i) = InternalRow(gramHash, ctxHash)
      i += 1
    }
    out
  }

  /** Rebuild a document's text from the tokens NOT at any covered 0-based
    * position (`cov` sorted ascending, distinct) — the strip-rebuild
    * kernel: returns (clean_text, kept_tokens). Replaces the
    * posexplode → anti-join → sorted-collect rebuild of the span-strip
    * operators (every surviving token used to cross two shuffles; here
    * only the compact covered set moves, and the rebuild is one JIT'd
    * walk per row). */
  def stripTokens(s: String, cov: ArrayData): InternalRow = {
    val w = tokens(s)
    if (w.length == 0) return InternalRow(UTF8String.EMPTY_UTF8, 0L)
    val nCov = cov.numElements()
    val sb = new java.lang.StringBuilder
    var kept = 0L
    var ci = 0
    var i = 0
    while (i < w.length) {
      while (ci < nCov && cov.getInt(ci) < i) ci += 1
      val covered = ci < nCov && cov.getInt(ci) == i
      if (!covered) {
        if (kept > 0) sb.append(' ')
        sb.append(w(i))
        kept += 1
      }
      i += 1
    }
    InternalRow(UTF8String.fromString(sb.toString), kept)
  }

  /** Union length of the token intervals [s, s+n) over SORTED ascending
    * distinct window starts — the covered-token count of the span
    * operators, computed from the flagged window STARTS instead of the
    * exploded position set (r22: the positions were only ever exploded to
    * be deduplicated and counted/walked; starts are unique per (doc, pos)
    * by construction, so shuffling them and expanding row-locally removes
    * the distinct's exchanges and ~n× of the shuffle rows). */
  def coveredLen(starts: ArrayData, n: Int): Long = {
    val m = starts.numElements()
    var covered = 0L
    var end = Int.MinValue
    var i = 0
    while (i < m) {
      val s = starts.getInt(i)
      covered += (if (s >= end) n else s + n - end)
      end = s + n
      i += 1
    }
    covered
  }

  /** [[stripTokens]] from SORTED ascending window starts: a token at
    * position i is covered iff some start s has s <= i < s + n. Same
    * output contract — (clean_text, kept_tokens). */
  def stripTokensStarts(s: String, starts: ArrayData, n: Int): InternalRow = {
    val w = tokens(s)
    if (w.length == 0) return InternalRow(UTF8String.EMPTY_UTF8, 0L)
    val m = starts.numElements()
    val sb = new java.lang.StringBuilder
    var kept = 0L
    var si = 0
    var coveredUntil = -1 // inclusive last covered position so far
    var i = 0
    while (i < w.length) {
      while (si < m && starts.getInt(si) <= i) {
        coveredUntil = starts.getInt(si) + n - 1 // starts ascending → max
        si += 1
      }
      if (i > coveredUntil) {
        if (kept > 0) sb.append(' ')
        sb.append(w(i))
        kept += 1
      }
      i += 1
    }
    InternalRow(UTF8String.fromString(sb.toString), kept)
  }

  private def toArrayData(a: Array[String]): ArrayData = {
    val out = new Array[AnyRef](a.length)
    var i = 0
    while (i < a.length) { out(i) = UTF8String.fromString(a(i)); i += 1 }
    new GenericArrayData(out)
  }

  // Java-side entry points for generated code (UTF8String in, catalyst out)
  def tokensU(s: UTF8String): ArrayData = toArrayData(tokens(s.toString))
  def allNgramHashesU(s: UTF8String, n: Int): ArrayData =
    new GenericArrayData(allNgramHashes(s.toString, n))
  def ngramCtxHashesU(s: UTF8String, n: Int): ArrayData =
    new GenericArrayData(
      ngramCtxHashes(s.toString, n).asInstanceOf[Array[Any]])
  def stripTokensU(s: UTF8String, cov: ArrayData): InternalRow =
    stripTokens(s.toString, cov)
  def stripTokensStartsU(s: UTF8String, starts: ArrayData,
                         n: Int): InternalRow =
    stripTokensStarts(s.toString, starts, n)
  def allNgramsU(s: UTF8String, n: Int): ArrayData =
    toArrayData(allNgrams(s.toString, n))
  def shinglesU(s: UTF8String, n: Int): ArrayData =
    toArrayData(shingles(s.toString, n))
  def langIdU(s: UTF8String): UTF8String =
    UTF8String.fromString(langId(s.toString))
  def qualityMicrosU(s: UTF8String): Long = qualityMicros(s.toString)
  def fingerprintU(s: UTF8String): Long =
    TextFunctions.fingerprintScala(s.toString)
  def dupNgramRatioMicrosU(s: UTF8String, n: Int): Long =
    dupNgramRatioMicros(s.toString, n)
  def repetitionMicrosU(s: UTF8String, n: Int): InternalRow =
    repetitionMicros(s.toString, n)
  def topNgramRatioMicrosU(s: UTF8String, n: Int): Long =
    topNgramRatioMicros(s.toString, n)
  def gopherStatsU(s: UTF8String): InternalRow = gopherStats(s.toString)
}

/** Null-safe unary string-kernel expression: one static JIT'd call per row,
  * inside whole-stage codegen (the [[graft.vector.FloatVecBinary]] pattern;
  * no generated locals, so no shadowing surface at all). */
abstract class TextKernelExpr extends UnaryExpression {
  /** Fully-qualified static call over the generated child value var. */
  protected def staticCall(c: String): String
  protected def kernel(s: UTF8String): Any
  override def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => staticCall(c))
}

private object TK { val O = "graft.pipeline.TextKernels" }

case class TokensKernel(child: Expression) extends TextKernelExpr {
  override def prettyName: String = "tokens_k"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  protected def staticCall(c: String): String = s"${TK.O}.tokensU($c)"
  protected def kernel(s: UTF8String): Any = TextKernels.tokensU(s)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class AllNgramsKernel(child: Expression, n: Int) extends TextKernelExpr {
  override def prettyName: String = "all_ngrams_k"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  protected def staticCall(c: String): String = s"${TK.O}.allNgramsU($c, $n)"
  protected def kernel(s: UTF8String): Any = TextKernels.allNgramsU(s, n)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class ShinglesKernel(child: Expression, n: Int) extends TextKernelExpr {
  override def prettyName: String = "shingles_k"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  protected def staticCall(c: String): String = s"${TK.O}.shinglesU($c, $n)"
  protected def kernel(s: UTF8String): Any = TextKernels.shinglesU(s, n)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class LangIdKernel(child: Expression) extends TextKernelExpr {
  override def prettyName: String = "lang_id_k"
  override def dataType: DataType = StringType
  protected def staticCall(c: String): String = s"${TK.O}.langIdU($c)"
  protected def kernel(s: UTF8String): Any = TextKernels.langIdU(s)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class QualityMicrosKernel(child: Expression) extends TextKernelExpr {
  override def prettyName: String = "quality_micros_k"
  override def dataType: DataType = LongType
  protected def staticCall(c: String): String = s"${TK.O}.qualityMicrosU($c)"
  protected def kernel(s: UTF8String): Any = TextKernels.qualityMicrosU(s)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class FingerprintKernel(child: Expression) extends TextKernelExpr {
  override def prettyName: String = "fingerprint_k"
  override def dataType: DataType = LongType
  protected def staticCall(c: String): String = s"${TK.O}.fingerprintU($c)"
  protected def kernel(s: UTF8String): Any = TextKernels.fingerprintU(s)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class DupNgramRatioKernel(child: Expression, n: Int)
  extends TextKernelExpr {
  override def prettyName: String = "dup_ngram_ratio_k"
  override def dataType: DataType = LongType
  protected def staticCall(c: String): String =
    s"${TK.O}.dupNgramRatioMicrosU($c, $n)"
  protected def kernel(s: UTF8String): Any =
    TextKernels.dupNgramRatioMicrosU(s, n)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class TopNgramRatioKernel(child: Expression, n: Int)
  extends TextKernelExpr {
  override def prettyName: String = "top_ngram_ratio_k"
  override def dataType: DataType = LongType
  protected def staticCall(c: String): String =
    s"${TK.O}.topNgramRatioMicrosU($c, $n)"
  protected def kernel(s: UTF8String): Any =
    TextKernels.topNgramRatioMicrosU(s, n)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class RepetitionMicrosKernel(child: Expression, n: Int)
  extends TextKernelExpr {
  override def prettyName: String = "repetition_micros_k"
  override def dataType: DataType = StructType(Seq(
    StructField("dup_micros", LongType, nullable = false),
    StructField("top_micros", LongType, nullable = false)))
  protected def staticCall(c: String): String =
    s"${TK.O}.repetitionMicrosU($c, $n)"
  protected def kernel(s: UTF8String): Any =
    TextKernels.repetitionMicrosU(s, n)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class AllNgramHashesKernel(child: Expression, n: Int)
  extends TextKernelExpr {
  override def prettyName: String = "all_ngram_hashes_k"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  protected def staticCall(c: String): String =
    s"${TK.O}.allNgramHashesU($c, $n)"
  protected def kernel(s: UTF8String): Any = TextKernels.allNgramHashesU(s, n)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class NgramCtxHashesKernel(child: Expression, n: Int)
  extends TextKernelExpr {
  override def prettyName: String = "ngram_ctx_hashes_k"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("gram_hash", LongType, nullable = false),
    StructField("ctx_hash", LongType, nullable = false))),
    containsNull = false)
  protected def staticCall(c: String): String =
    s"${TK.O}.ngramCtxHashesU($c, $n)"
  protected def kernel(s: UTF8String): Any = TextKernels.ngramCtxHashesU(s, n)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Strip-rebuild kernel: (text, sorted covered positions) →
  * struct(clean_text, kept_tokens). Children are made non-null at the
  * Column level (coalesce), so the null-safe codegen path never skips. */
case class StripTokensKernel(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "strip_tokens_k"
  override def dataType: DataType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("kept_tokens", LongType, nullable = false)))
  override def nullSafeEval(t: Any, c: Any): Any =
    TextKernels.stripTokensU(t.asInstanceOf[UTF8String],
      c.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, c) => s"${TK.O}.stripTokensU($t, $c)")
  override protected def withNewChildrenInternal(l: Expression,
                                                 r: Expression) =
    copy(left = l, right = r)
}

/** Covered-token count from sorted window starts: array<int> → long.
  * The child is made non-null at the Column level (coalesce). */
case class CoveredLenKernel(child: Expression, n: Int)
  extends UnaryExpression {
  override def prettyName: String = "covered_len_k"
  override def dataType: DataType = LongType
  override def nullSafeEval(st: Any): Any =
    TextKernels.coveredLen(st.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, st => s"${TK.O}.coveredLen($st, $n)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Strip-rebuild from sorted window starts: (text, starts) →
  * struct(clean_text, kept_tokens). Children made non-null at the Column
  * level, as [[StripTokensKernel]]. */
case class StripTokensStartsKernel(left: Expression, right: Expression,
                                   n: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "strip_tokens_starts_k"
  override def dataType: DataType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("kept_tokens", LongType, nullable = false)))
  override def nullSafeEval(t: Any, st: Any): Any =
    TextKernels.stripTokensStartsU(t.asInstanceOf[UTF8String],
      st.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, st) => s"${TK.O}.stripTokensStartsU($t, $st, $n)")
  override protected def withNewChildrenInternal(l: Expression,
                                                 r: Expression) =
    copy(left = l, right = r)
}

case class GopherStatsKernel(child: Expression) extends TextKernelExpr {
  override def prettyName: String = "gopher_stats_k"
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("mean_word_len_milli", LongType, nullable = false),
    StructField("symbol_ratio_micros", LongType, nullable = false),
    StructField("alpha_frac_micros", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false)))
  protected def staticCall(c: String): String = s"${TK.O}.gopherStatsU($c)"
  protected def kernel(s: UTF8String): Any = TextKernels.gopherStatsU(s)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column builders for the kernels (null semantics matched to the original
  * trees at this level — see each [[TextFunctions]] method). */
object textKernels {
  def tokens(c: Column): Column = Bridge.column(TokensKernel(Bridge.expression(c)))
  def allNgrams(c: Column, n: Int): Column =
    Bridge.column(AllNgramsKernel(Bridge.expression(c), n))
  def shingles(c: Column, n: Int): Column =
    Bridge.column(ShinglesKernel(Bridge.expression(c), n))
  def langId(c: Column): Column = Bridge.column(LangIdKernel(Bridge.expression(c)))
  def qualityMicros(c: Column): Column =
    Bridge.column(QualityMicrosKernel(Bridge.expression(c)))
  def fingerprint(c: Column): Column =
    Bridge.column(FingerprintKernel(Bridge.expression(c)))
  def dupNgramRatioMicros(c: Column, n: Int): Column =
    Bridge.column(DupNgramRatioKernel(Bridge.expression(c), n))
  def topNgramRatioMicros(c: Column, n: Int): Column =
    Bridge.column(TopNgramRatioKernel(Bridge.expression(c), n))
  def repetitionMicros(c: Column, n: Int): Column =
    Bridge.column(RepetitionMicrosKernel(Bridge.expression(c), n))
  def gopherStats(c: Column): Column =
    Bridge.column(GopherStatsKernel(Bridge.expression(c)))
  def allNgramHashes(c: Column, n: Int): Column =
    Bridge.column(AllNgramHashesKernel(Bridge.expression(c), n))
  def ngramCtxHashes(c: Column, n: Int): Column =
    Bridge.column(NgramCtxHashesKernel(Bridge.expression(c), n))
  def stripTokens(text: Column, cov: Column): Column =
    Bridge.column(StripTokensKernel(Bridge.expression(text),
      Bridge.expression(cov)))
  def coveredLen(starts: Column, n: Int): Column =
    Bridge.column(CoveredLenKernel(Bridge.expression(starts), n))
  def stripTokensStarts(text: Column, starts: Column, n: Int): Column =
    Bridge.column(StripTokensStartsKernel(Bridge.expression(text),
      Bridge.expression(starts), n))
}
