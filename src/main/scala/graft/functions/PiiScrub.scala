package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass PII scrubbing scanners — a hand compilation of the three
  * `graft.ext.TextAnalysis.piiPatterns` regexes (email → `<EMAIL>`,
  * IPv4 → `<IP>`, phone → `<PHONE>`) into plain character loops.
  *
  * WHY: the scrub chain is a pure projection that must run at scan
  * speed over 100 TB, but `java.util.regex` pays a large per-byte
  * interpreter constant (backtracking VM, boxing through `Matcher`) —
  * measured ~10× vs DuckDB's RE2 on the same patterns. These scanners
  * do the same work in branch-predictable ASCII loops, reject
  * PII-free rows from a byte sniff without even materializing a
  * `String`, and return the INPUT REFERENCE unchanged when nothing
  * matched (the common case in a real corpus).
  *
  * EQUIVALENCE CONTRACT: each `scrub*` method must produce
  * byte-identical output to `Pattern.compile(pat).matcher(s)
  * .replaceAll(repl)` for its pattern — the DuckDB oracle replays the
  * regex chain, so any divergence is a correctness failure, not a
  * performance detail. The backtracking semantics are hand-derived:
  *
  *  - email `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`:
  *    a match exists per '@' whose maximal local-char run (clamped to
  *    the scan position) is non-empty; the domain ends at the
  *    RIGHTMOST dot in the maximal domain-char run that is followed
  *    by ≥2 letters (greedy first part backtracks from the right, the
  *    final `{2,}` then consumes the whole letter run).
  *  - ipv4 `\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b`: four FULL digit
  *    runs of length 1–3 joined by single dots (a partial take of a
  *    longer run is always followed by another digit, so backtracking
  *    can never rescue it), word boundaries on both sides.
  *  - phone `(\+\d{1,3}[- ]\d{2,4}[- ]\d{2,4}([- ]\d{2,4})?|\b\d{3}[- ]\d{3}[- ]\d{4})\b`:
  *    alternation tried left-to-right at each position; every digit
  *    group is forced to a full run for the same reason as ipv4; the
  *    optional 4th group is taken greedily when its full run of 2–4
  *    digits ends at a word boundary, otherwise the match falls back
  *    to ending after group 3 (whose next char, when the optional
  *    separator was present, is `-`/` ` — a boundary).
  *
  * `PiiScrubberSpec` pins the contract property-style: random strings
  * over a PII-shaped alphabet plus adversarial literals, each pass and
  * the chain compared against `java.util.regex` byte-for-byte.
  * Scan-position semantics follow `Matcher`: boundaries and local runs
  * read the ORIGINAL string; matching resumes at the end of the
  * previous match (replacements never rescan).
  */
object PiiScrubber {
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  @inline private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  /** `\b` word chars. QUIRK, deliberately replicated: `java.util.regex`
    * evaluates `\b` with UNICODE word characters (`_` or
    * `Character.isLetterOrDigit`) even without UNICODE_CHARACTER_CLASS,
    * while `\w` stays ASCII — so a Cyrillic letter before a digit
    * suppresses the boundary. The oracle corpus never exercises the
    * divergence (RE2's `\b` is ASCII), but the scanner's contract is
    * byte-equality with the Java chain the projection used before. */
  @inline private def isWordCp(cp: Int): Boolean =
    cp == '_' || Character.isLetterOrDigit(cp)
  @inline private def isLocal(c: Char): Boolean =
    isAlpha(c) || isDigit(c) || c == '.' || c == '_' || c == '%' ||
      c == '+' || c == '-'
  @inline private def isDomain(c: Char): Boolean =
    isAlpha(c) || isDigit(c) || c == '.' || c == '-'
  @inline private def isSep(c: Char): Boolean = c == '-' || c == ' '

  /** End of the maximal ASCII digit run starting at `i` (== `i` when
    * `s(i)` is not a digit). */
  @inline private def digitRunEnd(s: String, i: Int): Int = {
    var j = i
    val n = s.length
    while (j < n && isDigit(s.charAt(j))) j += 1
    j
  }

  def scrubEmails(s: String): String = {
    var at = s.indexOf('@')
    if (at < 0) return s
    val n = s.length
    var sb: java.lang.StringBuilder = null
    var copied = 0 // source chars emitted so far
    var scan = 0   // Matcher region start: matches may not begin before this
    while (at >= 0) {
      // local part: maximal run of local chars ending at '@', clamped to scan
      var st = at
      while (st > scan && isLocal(s.charAt(st - 1))) st -= 1
      if (st < at && at >= scan) {
        // domain-char run after '@'
        var de = at + 1
        while (de < n && isDomain(s.charAt(de))) de += 1
        // rightmost '.' (index > at+1) followed by >= 2 letters
        var end = -1
        var i = de - 1
        while (i > at + 1 && end < 0) {
          if (s.charAt(i) == '.') {
            var j = i + 1
            while (j < de && isAlpha(s.charAt(j))) j += 1
            if (j - i >= 3) end = j
          }
          i -= 1
        }
        if (end > 0) {
          if (sb == null) sb = new java.lang.StringBuilder(n)
          sb.append(s, copied, st).append("<EMAIL>")
          copied = end
          scan = end
        }
      }
      at = s.indexOf('@', at + 1)
    }
    if (sb == null) s else { sb.append(s, copied, n); sb.toString }
  }

  /** Match an IPv4 at `start` (caller checked the left boundary);
    * returns the exclusive end, or -1. */
  private def tryIp(s: String, start: Int): Int = {
    val n = s.length
    var i = start
    var g = 0
    while (g < 4) {
      val j = digitRunEnd(s, i)
      val len = j - i
      if (len < 1 || len > 3) return -1
      if (g < 3) {
        if (j >= n || s.charAt(j) != '.') return -1
        i = j + 1
      } else {
        return if (j < n && isWordCp(Character.codePointAt(s, j))) -1 else j
      }
      g += 1
    }
    -1
  }

  def scrubIps(s: String): String = {
    val n = s.length
    var sb: java.lang.StringBuilder = null
    var copied = 0
    var i = 0
    while (i < n) {
      if (isDigit(s.charAt(i)) &&
          (i == 0 || !isWordCp(Character.codePointBefore(s, i)))) {
        val end = tryIp(s, i)
        if (end > 0) {
          if (sb == null) sb = new java.lang.StringBuilder(n)
          sb.append(s, copied, i).append("<IP>")
          copied = end
          i = end
        } else i += 1
      } else i += 1
    }
    if (sb == null) s else { sb.append(s, copied, n); sb.toString }
  }

  /** `+CC group group [group]` branch at `start` (`s(start) == '+'`);
    * returns the exclusive end, or -1. */
  private def tryIntlPhone(s: String, start: Int): Int = {
    val n = s.length
    val p1 = start + 1
    val e1 = digitRunEnd(s, p1)
    if (e1 - p1 < 1 || e1 - p1 > 3 || e1 >= n || !isSep(s.charAt(e1))) return -1
    val p2 = e1 + 1
    val e2 = digitRunEnd(s, p2)
    if (e2 - p2 < 2 || e2 - p2 > 4 || e2 >= n || !isSep(s.charAt(e2))) return -1
    val p3 = e2 + 1
    val e3 = digitRunEnd(s, p3)
    if (e3 - p3 < 2 || e3 - p3 > 4) return -1
    // optional 4th group, greedy
    if (e3 < n && isSep(s.charAt(e3))) {
      val p4 = e3 + 1
      val e4 = digitRunEnd(s, p4)
      if (e4 - p4 >= 2 && e4 - p4 <= 4 &&
          (e4 >= n || !isWordCp(Character.codePointAt(s, e4))))
        return e4
    }
    // fall back to ending after group 3 (requires a boundary there)
    if (e3 >= n || !isWordCp(Character.codePointAt(s, e3))) e3 else -1
  }

  /** NANP `3[- ]3[- ]4` branch at `start` (caller checked the left
    * boundary and that `s(start)` is a digit); exclusive end or -1. */
  private def tryNanpPhone(s: String, start: Int): Int = {
    val n = s.length
    val e1 = digitRunEnd(s, start)
    if (e1 - start != 3 || e1 >= n || !isSep(s.charAt(e1))) return -1
    val p2 = e1 + 1
    val e2 = digitRunEnd(s, p2)
    if (e2 - p2 != 3 || e2 >= n || !isSep(s.charAt(e2))) return -1
    val p3 = e2 + 1
    val e3 = digitRunEnd(s, p3)
    if (e3 - p3 != 4) return -1
    if (e3 < n && isWordCp(Character.codePointAt(s, e3))) -1 else e3
  }

  def scrubPhones(s: String): String = {
    val n = s.length
    var sb: java.lang.StringBuilder = null
    var copied = 0
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      var end = -1
      if (c == '+') end = tryIntlPhone(s, i)
      else if (isDigit(c) &&
          (i == 0 || !isWordCp(Character.codePointBefore(s, i))))
        end = tryNanpPhone(s, i)
      if (end > 0) {
        if (sb == null) sb = new java.lang.StringBuilder(n)
        sb.append(s, copied, i).append("<PHONE>")
        copied = end
        i = end
      } else i += 1
    }
    if (sb == null) s else { sb.append(s, copied, n); sb.toString }
  }

  /** The full chain in `piiPatterns` order (emails, then IPv4 over the
    * result, then phones) — each pass reads the previous pass's output
    * exactly like the chained `regexp_replace` projection it replaces. */
  def scrub(s: String): String = scrubPhones(scrubIps(scrubEmails(s)))

  /** UTF8String entry point: a byte sniff rejects rows that cannot
    * contain any PII pattern (no '@', no ASCII digit) without decoding,
    * and unchanged rows return the input reference. */
  def scrubUTF8(u: UTF8String): UTF8String = {
    val nb = u.numBytes
    var i = 0
    var candidate = false
    while (i < nb && !candidate) {
      val b = u.getByte(i)
      if (b == '@' || (b >= '0' && b <= '9')) candidate = true
      i += 1
    }
    if (!candidate) return u
    val s = u.toString
    val out = scrub(s)
    if (out eq s) u else UTF8String.fromString(out)
  }
}

/** Codegen'd projection over [[PiiScrubber.scrubUTF8]] — the compiled
  * replacement for the three-step `regexp_replace` chain. Deterministic,
  * so common-subexpression elimination still shares one scrub between
  * the `scrub_md5` output and the marker-count audit columns. */
case class ScrubPii(child: Expression)
  extends UnaryExpression with Serializable {

  override def prettyName: String = "graft_scrub_pii"
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    PiiScrubber.scrubUTF8(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PiiScrubber.scrubUTF8($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
