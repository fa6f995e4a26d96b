package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled BPE encoder — the constant-plan-depth replacement for the
  * `numMerges`-deep `replace` chain [[graft.ext.Bpe.applyMerges]]
  * compiles into. A production tokenizer carries 30k–50k merges; a
  * 30k-deep expression tree dies on codegen's 64 KB method limit long
  * before it reaches real vocab sizes, while this kernel holds the
  * merge table as ONE plan object (`ctx.addReferenceObj`) and encodes
  * each word in an imperative scan, so plan depth is flat no matter how
  * many merges the tokenizer learned.
  *
  * ==Equivalence contract==
  * [[BpeCodec.encode]] must produce EXACTLY the symbol sequence of the
  * chained-replace spelling: each merge, in rank order, rewrites the
  * word once left-to-right non-overlapping (resuming after each fused
  * pair — `java.lang.String.replace` semantics on the double-space
  * symbol string). The DuckDB oracle replays that spelling verbatim,
  * so any divergence is a correctness failure; `ExtQualitySpec` pins
  * the contract property-style against [[graft.ext.Bpe.bpeCount]] on
  * random words and real merge tables.
  *
  * ==Kernel shape==
  * Rank-order application is scheduled sparsely instead of scanned
  * exhaustively: a min-heap seeds the ranks of every merge that
  * mentions a symbol PRESENT in the word (`bySym` index), pops ranks
  * in increasing order (pushes during processing are always greater
  * than the current rank, so the pop sequence is nondecreasing — the
  * rank-order guarantee), and only a successful fuse of pair `(a,b)`
  * into `m` pushes the later ranks that mention `m`. A word therefore
  * pays for the merges that COULD touch it (typically tens), not the
  * full 30k table, and a presence multiset skips the symbol-list scan
  * whenever either side of the popped pair is absent. */
final class BpeTable(val a: Array[String], val b: Array[String],
                     val m: Array[String]) extends Serializable {
  val size: Int = a.length

  /** symbol → ascending ranks of merges whose a or b side IS that
    * symbol (the candidate index; built once per plan, lazily per
    * executor after deserialization). */
  @transient lazy val bySym: java.util.HashMap[String, Array[Int]] = {
    val acc = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Int]]
    var i = 0
    while (i < size) {
      acc.computeIfAbsent(a(i), _ => scala.collection.mutable.ArrayBuffer.empty) += i
      if (b(i) != a(i))
        acc.computeIfAbsent(b(i), _ => scala.collection.mutable.ArrayBuffer.empty) += i
      i += 1
    }
    val out = new java.util.HashMap[String, Array[Int]](acc.size * 2)
    acc.forEach((k, v) => out.put(k, v.toArray)) // buffers filled in rank order
    out
  }
}

object BpeTable {
  /** Wire format: one merge per line (`\n`), sides split by U+0001 —
    * neither occurs in a symbol (symbols come from tokenized text with
    * whitespace collapsed). */
  def parse(spec: String): BpeTable = {
    if (spec.isEmpty) return new BpeTable(Array.empty, Array.empty, Array.empty)
    val lines = spec.split("\n", -1)
    val a = new Array[String](lines.length)
    val b = new Array[String](lines.length)
    val m = new Array[String](lines.length)
    var i = 0
    while (i < lines.length) {
      val sep = lines(i).indexOf('\u0001')
      require(sep > 0, s"malformed BPE merge line ${i}: '${lines(i)}'")
      a(i) = lines(i).substring(0, sep)
      b(i) = lines(i).substring(sep + 1)
      m(i) = a(i) + b(i)
      i += 1
    }
    new BpeTable(a, b, m)
  }

  def spec(merges: Seq[(String, String)]): String =
    merges.iterator.map { case (a, b) => s"$a\u0001$b" }.mkString("\n")
}

object BpeCodec {
  /** Grow-on-demand primitive min-heap of ranks (no boxing in the
    * per-word hot loop). */
  private final class IntHeap(initial: Int) {
    private var arr = new Array[Int](initial)
    private var n = 0
    def isEmpty: Boolean = n == 0
    def push(v: Int): Unit = {
      if (n == arr.length) arr = java.util.Arrays.copyOf(arr, n * 2)
      arr(n) = v; n += 1
      var i = n - 1
      while (i > 0 && arr((i - 1) / 2) > arr(i)) {
        val p = (i - 1) / 2
        val t = arr(p); arr(p) = arr(i); arr(i) = t
        i = p
      }
    }
    def pop(): Int = {
      val top = arr(0)
      n -= 1; arr(0) = arr(n)
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var s = i
        if (l < n && arr(l) < arr(s)) s = l
        if (r < n && arr(r) < arr(s)) s = r
        if (s == i) done = true
        else { val t = arr(s); arr(s) = arr(i); arr(i) = t; i = s }
      }
      top
    }
  }

  /** Encode one word under `t`; returns the symbol array (in order).
    * Matches the chained-replace spelling exactly — see the class doc's
    * equivalence contract. */
  def encode(t: BpeTable, word: String): Array[String] = {
    // initial symbols: one per code point (the `regexp_replace(word,
    // '(.)', ' $1 ')` split both engines train from)
    val cpCount = word.codePointCount(0, word.length)
    if (cpCount == 0) return Array.empty
    val syms = new Array[String](cpCount)
    var ci = 0
    var off = 0
    while (off < word.length) {
      val cp = word.codePointAt(off)
      val w = Character.charCount(cp)
      syms(ci) = word.substring(off, off + w)
      ci += 1; off += w
    }
    if (cpCount == 1 || t.size == 0) return syms
    // singly linked list over syms (index -1 = end); head fixed at 0
    val next = new Array[Int](cpCount)
    var i = 0
    while (i < cpCount) { next(i) = i + 1; i += 1 }
    next(cpCount - 1) = -1
    var live = cpCount
    // presence multiset + candidate-rank seeding
    val present = new java.util.HashMap[String, Int](cpCount * 2)
    val heap = new IntHeap(16)
    i = 0
    while (i < cpCount) {
      val prev = present.merge(syms(i), 1, (x, y) => x + y)
      if (prev == 1) { // first occurrence: seed this symbol's ranks
        val ranks = t.bySym.get(syms(i))
        if (ranks != null) { var j = 0; while (j < ranks.length) { heap.push(ranks(j)); j += 1 } }
      }
      i += 1
    }
    var lastRank = -1
    while (!heap.isEmpty && live > 1) {
      val r = heap.pop()
      if (r != lastRank) { // same rank can seed from both sides
        lastRank = r
        val a = t.a(r); val b = t.b(r)
        val ca = present.getOrDefault(a, 0)
        if (ca > 0 && (if (b == a) ca > 1 else present.getOrDefault(b, 0) > 0)) {
          val m = t.m(r)
          var fusedAny = false
          var cur = 0
          while (cur != -1) {
            val nx = next(cur)
            if (nx != -1 && syms(cur) == a && syms(nx) == b) {
              // fuse: cur absorbs nx; resume AFTER the fused symbol
              syms(cur) = m
              next(cur) = next(nx)
              live -= 1
              present.merge(a, -1, (x, y) => x + y)
              present.merge(b, -1, (x, y) => x + y)
              present.merge(m, 1, (x, y) => x + y)
              fusedAny = true
              cur = next(cur)
            } else cur = nx
          }
          if (fusedAny) {
            val ranks = t.bySym.get(m)
            if (ranks != null) {
              var j = ranks.length - 1
              while (j >= 0 && ranks(j) > r) { heap.push(ranks(j)); j -= 1 }
            }
          }
        }
      }
    }
    val out = new Array[String](live)
    var o = 0
    var cur = 0
    while (cur != -1) { out(o) = syms(cur); o += 1; cur = next(cur) }
    out
  }

  /** Symbol count of `word` — [[encode]] without materializing the
    * output array (the token-count hot path). */
  def countTokens(t: BpeTable, word: UTF8String): Int =
    if (word.numBytes == 0) 0 else encode(t, word.toString).length

  /** [[encode]] boxed for the array-returning expression. */
  def encodeUTF8(t: BpeTable, word: UTF8String): GenericArrayData = {
    val syms = encode(t, word.toString)
    val out = new Array[Any](syms.length)
    var i = 0
    while (i < syms.length) { out(i) = UTF8String.fromString(syms(i)); i += 1 }
    new GenericArrayData(out)
  }
}

/** Base for the two BPE expressions: a string child plus the parsed
  * merge table injected into generated code as a plan reference. */
abstract class BpeExpression extends UnaryExpression {
  def spec: String
  @transient protected lazy val table: BpeTable = BpeTable.parse(spec)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  protected def genCall(ctx: CodegenContext, ev: ExprCode,
                        method: String): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val t = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
      s"${ev.value} = graft.functions.BpeCodec.$method($t, $c);"
    })
}

/** BPE token COUNT of a word under a trained merge list. */
case class BpeCount(child: Expression, spec: String) extends BpeExpression {
  override def prettyName: String = "graft_bpe_count"
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    BpeCodec.countTokens(table, v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genCall(ctx, ev, "countTokens")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** BPE SYMBOL SEQUENCE of a word — the serving-side encode
  * ([[graft.api]] TokenizeResource). */
case class BpeEncode(child: Expression, spec: String) extends BpeExpression {
  override def prettyName: String = "graft_bpe_encode"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    BpeCodec.encodeUTF8(table, v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genCall(ctx, ev, "encodeUTF8")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
