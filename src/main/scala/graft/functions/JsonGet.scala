package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass top-level JSON scalar extraction —
  * `get_json_object(json, "$.key")` for a simple (non-nested,
  * non-array) key, compiled into one character scan.
  *
  * The builtin runs a Jackson streaming parser per row (token objects,
  * parser/generator allocation, full-document tokenization even after
  * the key is found is avoided but setup cost dominates) — measured
  * ~3 µs/row on flat metadata objects, the per-row constant behind
  * `json_scalar_extract`'s 24× oracle gap at sf1. This scanner walks
  * the char array once and stops at the first match, ~10× less.
  *
  * Semantics are pinned BYTE-EQUAL to the builtin (JsonGetSpec
  * property tests, the PiiScrubber equivalence discipline):
  *  - root must be an object; anything else → null
  *  - the first occurrence of the key whose value PRODUCES output wins
  *    (a JSON-null match writes nothing, so scanning continues)
  *  - the ENTIRE root object is parsed strictly (Jackson rules: no
  *    leading zeros, quoted keys, colon required — but single-quoted
  *    strings and raw control chars in strings are ALLOWED, matching
  *    the builtin's reader features); only bytes after the root's
  *    closing brace are ignored
  *  - string values decode escapes (`\uXXXX` incl. surrogate pairs)
  *  - `null` value → null result; `true`/`false` verbatim
  *  - integral numbers render as Long/BigInteger text (`-0` → `0`);
  *    float numbers re-render via `Double.toString` (`1.5e3` → `1500.0`)
  *    — the builtin's Jackson `copyCurrentEvent` behavior
  *  - object/array values re-render compactly with the same number and
  *    string-escape treatment (the builtin's `copyCurrentStructure`)
  *
  * Paths beyond `$.key` (nesting, arrays, wildcards) stay on the
  * builtin — [[GraftFunctions.jsonGetTop]] is the single-key fast path
  * a metadata-extraction pipeline actually runs at 100 TB.
  */
case class JsonGetTop(child: Expression, key: String)
  extends UnaryExpression with Serializable {

  override def prettyName: String = "graft_json_get_top"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string json column, got ${other.simpleString}")
  }

  @transient private lazy val keyU = UTF8String.fromString(key)

  override def nullSafeEval(json: Any): Any =
    JsonGetTop.compute(json.asInstanceOf[UTF8String], keyU)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keyRef = ctx.addReferenceObj("jsonKey", keyU, classOf[UTF8String].getName)
    val resTerm = ctx.freshName("jsonRes")
    nullSafeCodeGen(ctx, ev, c => s"""
      UTF8String $resTerm = graft.functions.JsonGetTop.compute($c, $keyRef);
      if ($resTerm == null) { ${ev.isNull} = true; } else { ${ev.value} = $resTerm; }
      """)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object JsonGetTop {
  /** Scanner state: `s` holds chars, `i` the cursor. Throws
    * [[BadJson]] on strict-parse violations — caught at the top and
    * mapped to null, like the builtin's catch-all. */
  private final class BadJson extends Exception { override def fillInStackTrace(): Throwable = this }
  private val BAD = new BadJson

  def compute(json: UTF8String, key: UTF8String): UTF8String = {
    val s = json.toString
    val k = key.toString
    try {
      val sc = new Scanner(s)
      sc.ws()
      if (sc.peek() != '{') return null
      sc.i += 1
      sc.ws()
      if (sc.peek() == '}') return null
      // The builtin parses the ENTIRE root object strictly (an error in
      // any later member nulls the result even after a match) and keeps
      // the first match that PRODUCES output — a `null` value writes
      // nothing, so scanning continues past it. Trailing bytes after
      // the root's closing brace are ignored.
      var captured: UTF8String = null
      while (true) {
        val name = sc.string()   // field name (escapes decoded)
        sc.ws()
        if (sc.next() != ':') throw BAD
        sc.ws()
        if (captured == null && name == k) captured = sc.value()
        else sc.skipValue()
        sc.ws()
        sc.next() match {
          case ',' => sc.ws()
          case '}' => return captured
          case _   => throw BAD
        }
      }
      captured
    } catch { case _: BadJson | _: StringIndexOutOfBoundsException => null }
  }

  private final class Scanner(val s: String) {
    var i = 0
    def peek(): Char = if (i < s.length) s.charAt(i) else throw BAD
    def next(): Char = { val c = peek(); i += 1; c }
    def ws(): Unit =
      while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
        s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1

    /** Parse a JSON string at the cursor, returning the DECODED text.
      * Jackson here runs with ALLOW_SINGLE_QUOTES: a string may be
      * apostrophe-quoted (the other quote char is then a literal), and
      * the `\'` escape is legal in BOTH styles. */
    def string(): String = {
      val q = next()
      if (q != '"' && q != '\'') throw BAD
      val sb = new java.lang.StringBuilder()
      while (true) {
        val c = next()
        if (c == q) return sb.toString
        if (c == '\\') sb.append(escape())
        else sb.append(c) // raw control chars pass (ALLOW_UNESCAPED_CONTROL_CHARS)
      }
      sb.toString
    }

    private def escape(): Char = next() match {
      case '"' => '"'
      case '\'' => '\''
      case '\\' => '\\'
      case '/' => '/'
      case 'b' => '\b'
      case 'f' => '\f'
      case 'n' => '\n'
      case 'r' => '\r'
      case 't' => '\t'
      case 'u' =>
        var v = 0
        var j = 0
        while (j < 4) {
          val h = Character.digit(next(), 16)
          if (h < 0) throw BAD
          v = (v << 4) | h
          j += 1
        }
        v.toChar
      case _ => throw BAD
    }

    /** Skip a JSON string without building the decoded text. */
    def skipString(): Unit = {
      val q = next()
      if (q != '"' && q != '\'') throw BAD
      while (true) {
        val c = next()
        if (c == q) return
        if (c == '\\') escape()
      }
    }

    /** Number grammar: `-? (0 | [1-9][0-9]*) (\.[0-9]+)? ([eE][+-]?[0-9]+)?`.
      * Returns (spanStart, spanEnd, isFloat). */
    private def isD(c: Char): Boolean = c >= '0' && c <= '9' // ASCII only

    def number(): (Int, Int, Boolean) = {
      val start = i
      if (peek() == '-') i += 1
      if (peek() == '0') {
        i += 1
        // Jackson rejects a digit after a leading zero ("012")
        if (i < s.length && isD(s.charAt(i))) throw BAD
      } else if (peek() >= '1' && peek() <= '9') {
        while (i < s.length && isD(s.charAt(i))) i += 1
      } else throw BAD
      var isFloat = false
      if (i < s.length && s.charAt(i) == '.') {
        isFloat = true; i += 1
        if (!(i < s.length && isD(s.charAt(i)))) throw BAD
        while (i < s.length && isD(s.charAt(i))) i += 1
      }
      if (i < s.length && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        isFloat = true; i += 1
        if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
        if (!(i < s.length && isD(s.charAt(i)))) throw BAD
        while (i < s.length && isD(s.charAt(i))) i += 1
      }
      (start, i, isFloat)
    }

    private def renderNumber(start: Int, end: Int, isFloat: Boolean,
                             sb: java.lang.StringBuilder): Unit = {
      val span = s.substring(start, end)
      if (isFloat) sb.append(java.lang.Double.toString(java.lang.Double.parseDouble(span)))
      else if (end - start <= 18) sb.append(java.lang.Long.toString(java.lang.Long.parseLong(span)))
      else {
        // beyond-long integral: Long when it fits, BigInteger text otherwise
        try sb.append(java.lang.Long.toString(java.lang.Long.parseLong(span)))
        catch { case _: NumberFormatException =>
          sb.append(new java.math.BigInteger(span).toString) }
      }
    }

    private def literal(lit: String): Unit = {
      var j = 0
      while (j < lit.length) { if (next() != lit.charAt(j)) throw BAD; j += 1 }
    }

    /** Parse the value at the cursor and return the builtin's rendering
      * (null for JSON null). */
    def value(): UTF8String = peek() match {
      case '"' | '\'' => UTF8String.fromString(string())
      case 'n' => literal("null"); null
      case 't' => literal("true"); UTF8String.fromString("true")
      case 'f' => literal("false"); UTF8String.fromString("false")
      case '{' | '[' =>
        val sb = new java.lang.StringBuilder()
        render(sb)
        UTF8String.fromString(sb.toString)
      case c if c == '-' || (c >= '0' && c <= '9') =>
        val (a, b, f) = number()
        val sb = new java.lang.StringBuilder()
        renderNumber(a, b, f, sb)
        UTF8String.fromString(sb.toString)
      case _ => throw BAD
    }

    /** Validate-and-skip the value at the cursor. */
    def skipValue(): Unit = peek() match {
      case '"' | '\'' => skipString()
      case 'n' => literal("null")
      case 't' => literal("true")
      case 'f' => literal("false")
      case '{' =>
        i += 1; ws()
        if (peek() == '}') { i += 1; return }
        while (true) {
          skipString(); ws()
          if (next() != ':') throw BAD
          ws(); skipValue(); ws()
          next() match {
            case ',' => ws()
            case '}' => return
            case _   => throw BAD
          }
        }
      case '[' =>
        i += 1; ws()
        if (peek() == ']') { i += 1; return }
        while (true) {
          skipValue(); ws()
          next() match {
            case ',' => ws()
            case ']' => return
            case _   => throw BAD
          }
        }
      case c if c == '-' || (c >= '0' && c <= '9') => number()
      case _ => throw BAD
    }

    /** Compact re-render of the structure at the cursor — the builtin's
      * `copyCurrentStructure`: whitespace dropped, strings re-escaped
      * minimally, numbers re-rendered like scalar leaves. */
    def render(sb: java.lang.StringBuilder): Unit = peek() match {
      case '"' | '\'' => renderString(sb)
      case 'n' => literal("null"); sb.append("null")
      case 't' => literal("true"); sb.append("true")
      case 'f' => literal("false"); sb.append("false")
      case '{' =>
        i += 1; sb.append('{'); ws()
        if (peek() == '}') { i += 1; sb.append('}'); return }
        var first = true
        while (true) {
          if (!first) sb.append(',')
          first = false
          renderString(sb); ws()
          if (next() != ':') throw BAD
          sb.append(':'); ws(); render(sb); ws()
          next() match {
            case ',' => ws()
            case '}' => sb.append('}'); return
            case _   => throw BAD
          }
        }
      case '[' =>
        i += 1; sb.append('['); ws()
        if (peek() == ']') { i += 1; sb.append(']'); return }
        var first = true
        while (true) {
          if (!first) sb.append(',')
          first = false
          render(sb); ws()
          next() match {
            case ',' => ws()
            case ']' => sb.append(']'); return
            case _   => throw BAD
          }
        }
      case c if c == '-' || (c >= '0' && c <= '9') =>
        val (a, b, f) = number()
        renderNumber(a, b, f, sb)
      case _ => throw BAD
    }

    /** Decode-then-re-escape a string — Jackson's generator escaping:
      * `"` `\` and control chars escaped (short forms for the common
      * five, `\u00XX` otherwise); non-ASCII passes through raw. */
    private def renderString(sb: java.lang.StringBuilder): Unit = {
      val decoded = string()
      sb.append('"')
      var j = 0
      while (j < decoded.length) {
        decoded.charAt(j) match {
          case '"' => sb.append("\\\"")
          case '\\' => sb.append("\\\\")
          case '\b' => sb.append("\\b")
          case '\f' => sb.append("\\f")
          case '\n' => sb.append("\\n")
          case '\r' => sb.append("\\r")
          case '\t' => sb.append("\\t")
          case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
          case c => sb.append(c)
        }
        j += 1
      }
      sb.append('"')
    }
  }
}
