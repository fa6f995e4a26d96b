package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled text-profile kernels — the quality-signal counts behind
  * `TextAnalysis` (token counts, punctuation, Gopher symbols, alpha
  * words, stopword hits) as one character scan per row instead of 6-8
  * `regexp_extract_all` passes plus a CodegenFallback `aggregate` HOF
  * (the mean-token-length fold was the dominant cost of the
  * gopher/quality projections: every HOF lambda frame is interpreted,
  * per token, per row).
  *
  * EQUIVALENCE CONTRACT (same discipline as [[PiiScrubber]]): every
  * count must equal its `java.util.regex` specification — the DuckDB
  * oracle replays those regexes, so the scanners must reproduce them
  * exactly. `TextProfileSpec` pins each count against the regex on
  * randomized and adversarial strings; the corpus-level test pins the
  * rewired `TextAnalysis` columns against the retained regex spellings
  * on real documents.
  *
  *  - ws tokens: runs of `\S` (Java `\s` is ASCII ` \t\n\x0B\f\r`);
  *  - punct: `[\p{Punct}]` = the 32 ASCII punctuation chars;
  *  - symbols: `#|\.\.\.|…` scanned left-to-right non-overlapping
  *    (so `....` counts one `...` plus one punct dot, never two
  *    symbols);
  *  - alpha words: `\S*[a-z]\S*` over LOWERED text = ws tokens
  *    containing at least one ASCII `a-z`;
  *  - stopword hits: `\b(w1|…)\b` over LOWERED text = maximal
  *    word-char runs equal to a listed word, where word chars follow
  *    Java's Unicode-aware `\b` (`_` or `Character.isLetterOrDigit`,
  *    code-point wise — see the quirk note on [[PiiScrubber]]); a run
  *    containing any non-`a-z` char can never equal a stopword.
  */
object TextProfiler {
  @inline private def isJavaWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'
  @inline private def isPunct(c: Char): Boolean =
    (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
      (c >= '[' && c <= '`') || (c >= '{' && c <= '~')
  @inline private def isWordCp(cp: Int): Boolean =
    cp == '_' || Character.isLetterOrDigit(cp)

  /** Raw-text counts: `[n_tokens, n_punct, n_symbols]`. */
  def counts(u: UTF8String): Array[Long] = {
    val s = u.toString
    val n = s.length
    var nTok = 0L; var nPunct = 0L; var nSym = 0L
    var inTok = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (isJavaWs(c)) { inTok = false; i += 1 }
      else {
        if (!inTok) { nTok += 1; inTok = true }
        if (c == '#') { nSym += 1; nPunct += 1; i += 1 } // '#' is punct too
        else if (c == '.' && i + 2 < n && s.charAt(i + 1) == '.' &&
                 s.charAt(i + 2) == '.') {
          // the '...' alternative consumes three chars in the SYMBOL
          // scan; the punct scan is independent and still counts the dots
          nSym += 1; nPunct += 3; i += 3
        }
        else if (c == '…') { nSym += 1; i += 1 } // non-ASCII: not punct
        else { if (isPunct(c)) nPunct += 1; i += 1 }
      }
    }
    Array(nTok, nPunct, nSym)
  }

  /** Prebuilt stopword lookup: word → indices of every list containing
    * it (a word can sit in several languages' lists — each one's regex
    * counts it independently). Built once per expression instance and
    * shipped as a codegen reference object, never per row. */
  final class StopwordLookup(wordLists: Seq[Seq[String]]) extends Serializable {
    val nLists: Int = wordLists.length
    val map: java.util.HashMap[String, Array[Int]] = {
      val m = new java.util.HashMap[String, Array[Int]]()
      wordLists.zipWithIndex.foreach { case (ws, l) =>
        ws.foreach { w =>
          val prev = m.get(w)
          m.put(w, if (prev == null) Array(l) else prev :+ l)
        }
      }
      m
    }
    val maxLen: Int =
      if (map.isEmpty) 0
      else {
        var mx = 0
        val it = map.keySet().iterator()
        while (it.hasNext) mx = math.max(mx, it.next().length)
        mx
      }
  }

  /** Lowered-text profile: `[n_tokens, n_nonws_cps, n_alpha_tokens,
    * hits(list0), hits(list1), …]`. `n_nonws_cps` counts CODE POINTS
    * (Spark's `length()` = `UTF8String.numChars`, code-point based). */
  def profileLower(u: UTF8String, lookup: StopwordLookup): Array[Long] = {
    val out = new Array[Long](3 + lookup.nLists)
    val s = u.toString
    val n = s.length
    val maxLen = lookup.maxLen
    var inTok = false; var tokHasAlpha = false
    // word-run state for the \b segmentation (independent of ws tokens)
    val runBuf = new java.lang.StringBuilder(math.max(maxLen, 1))
    var runValid = false; var inRun = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      val cp = if (Character.isHighSurrogate(c) && i + 1 < n &&
                   Character.isLowSurrogate(s.charAt(i + 1)))
                 s.codePointAt(i) else c.toInt
      val cpLen = Character.charCount(cp)
      // ws-token accounting
      if (isJavaWs(c)) {
        if (inTok && tokHasAlpha) out(2) += 1
        inTok = false; tokHasAlpha = false
      } else {
        if (!inTok) { out(0) += 1; inTok = true }
        out(1) += 1 // one non-ws CODE POINT
        if (c >= 'a' && c <= 'z') tokHasAlpha = true
      }
      // word-run accounting (\b semantics)
      if (isWordCp(cp)) {
        if (!inRun) { inRun = true; runValid = true; runBuf.setLength(0) }
        if (runValid) {
          if (cp >= 'a' && cp <= 'z' && runBuf.length < maxLen)
            runBuf.append(cp.toChar)
          else runValid = false // non-a-z word char, or longer than any word
        }
      } else if (inRun) {
        if (runValid) {
          val ls = lookup.map.get(runBuf.toString)
          if (ls != null) {
            var j = 0
            while (j < ls.length) { out(3 + ls(j)) += 1; j += 1 }
          }
        }
        inRun = false
      }
      i += cpLen
    }
    if (inTok && tokHasAlpha) out(2) += 1
    if (inRun && runValid) {
      val ls = lookup.map.get(runBuf.toString)
      if (ls != null) {
        var j = 0
        while (j < ls.length) { out(3 + ls(j)) += 1; j += 1 }
      }
    }
    out
  }

  private def boxed(a: Array[Long]): Array[Any] = {
    val out = new Array[Any](a.length)
    var i = 0
    while (i < a.length) { out(i) = a(i); i += 1 }
    out
  }
  def countsRow(u: UTF8String): InternalRow =
    new GenericInternalRow(boxed(counts(u)))
  def profileLowerRow(u: UTF8String, lookup: StopwordLookup): InternalRow =
    new GenericInternalRow(boxed(profileLower(u, lookup)))
}

/** Raw-text counts struct `(n_tokens, n_punct, n_symbols)` — compiled
  * replacement for three `regexp_extract_all` passes. */
case class TextCounts(child: Expression)
  extends UnaryExpression with Serializable {

  override def prettyName: String = "graft_text_counts"
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_symbols", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    TextProfiler.countsRow(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextProfiler.countsRow($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Lowered-text profile struct `(n_tokens, n_nonws, n_alpha, sw_0…)` —
  * compiled replacement for the token-size/mean-length/alpha-word/
  * stopword-hit regex passes. Callers pass the ALREADY-LOWERED text
  * (Spark's own `lower()` keeps the lowercasing semantics exact). */
case class TextProfileLower(child: Expression, wordLists: Seq[Seq[String]])
  extends UnaryExpression with Serializable {

  override def prettyName: String = "graft_text_profile"
  override def dataType: DataType = StructType(
    Seq(
      StructField("n_tokens", LongType, nullable = false),
      StructField("n_nonws", LongType, nullable = false),
      StructField("n_alpha", LongType, nullable = false)) ++
      wordLists.indices.map(i =>
        StructField(s"sw_$i", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  @transient private lazy val lookup: TextProfiler.StopwordLookup =
    new TextProfiler.StopwordLookup(wordLists)

  override def nullSafeEval(v: Any): Any =
    TextProfiler.profileLowerRow(v.asInstanceOf[UTF8String], lookup)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("swLookup", lookup,
      classOf[TextProfiler.StopwordLookup].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextProfiler.profileLowerRow($c, $ref);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
