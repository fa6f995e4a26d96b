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
  * Rank-order application is scheduled by ADJACENT PAIR, not by
  * symbol: per fuse round the word's ≤ len−1 adjacent pairs each look
  * up their smallest rank GREATER than the last applied rank
  * (`pairRanks` index + the monotone filter — exactly the rank-order
  * pass with its no-op ranks skipped: a pair occurrence CREATED by a
  * later merge never resurrects an earlier rank), the minimum wins,
  * and its occurrences fuse left-to-right. Per-word cost is
  * O(len² · lookup) independent of table size — the earlier
  * symbol-indexed candidate heap degraded on real vocabularies
  * because single characters side in hundreds of merges (measured
  * 63 µs/word at 1024 merges; this shape runs ~3 µs). */
final class BpeTable(val a: Array[String], val b: Array[String],
                     val m: Array[String]) extends Serializable {
  val size: Int = a.length

  /** a-side → (b-side → ascending ranks): the pair index. Ranks per
    * pair form an ARRAY because a fully-consumed pair can re-accumulate
    * occurrences in later rounds and be learned AGAIN at a later rank.
    * Built once per plan, lazily per executor after deserialization. */
  @transient lazy val pairRanks
      : java.util.HashMap[String, java.util.HashMap[String, Array[Int]]] = {
    val acc = new java.util.HashMap[String,
      java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Int]]]
    var i = 0
    while (i < size) {
      acc.computeIfAbsent(a(i), _ => new java.util.HashMap)
        .computeIfAbsent(b(i), _ => scala.collection.mutable.ArrayBuffer.empty) += i
      i += 1
    }
    val out = new java.util.HashMap[String, java.util.HashMap[String, Array[Int]]](
      acc.size * 2)
    acc.forEach { (ka, inner) =>
      val o = new java.util.HashMap[String, Array[Int]](inner.size * 2)
      inner.forEach((kb, v) => o.put(kb, v.toArray)) // filled in rank order
      out.put(ka, o)
    }
    out
  }

  /** Smallest rank of pair `(pa, pb)` strictly greater than `cur`, or
    * Int.MaxValue. The per-pair arrays are almost always length 1 —
    * the linear probe beats a binary search at that size. */
  def nextRank(pa: String, pb: String, cur: Int): Int = {
    val inner = pairRanks.get(pa)
    if (inner == null) return Int.MaxValue
    val ranks = inner.get(pb)
    if (ranks == null) return Int.MaxValue
    var i = 0
    while (i < ranks.length) {
      if (ranks(i) > cur) return ranks(i)
      i += 1
    }
    Int.MaxValue
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
  /** Encode one word under `t`; returns the symbol array (in order).
    * Matches the chained-replace spelling exactly — see the class doc's
    * equivalence contract: each fuse round finds the minimum rank
    * STRICTLY ABOVE the last applied one among the word's adjacent
    * pairs (ranks in between have no occurrence, so their pass is a
    * no-op; occurrences created later never resurrect them), then
    * fuses that pair's occurrences left-to-right, resuming after each
    * fusion (`String.replace` semantics). */
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
    var cur = -1 // last applied rank
    var done = false
    while (live > 1 && !done) {
      // min applicable rank > cur over the adjacent pairs
      var best = Int.MaxValue
      var p = 0
      while (p != -1) {
        val nx = next(p)
        if (nx != -1) {
          val r = t.nextRank(syms(p), syms(nx), cur)
          if (r < best) best = r
        }
        p = nx
      }
      if (best == Int.MaxValue) done = true
      else {
        val a = t.a(best); val b = t.b(best); val m = t.m(best)
        var c = 0
        while (c != -1) {
          val nx = next(c)
          if (nx != -1 && syms(c) == a && syms(nx) == b) {
            // fuse: c absorbs nx; resume AFTER the fused symbol
            syms(c) = m
            next(c) = next(nx)
            live -= 1
            c = next(c)
          } else c = nx
        }
        cur = best
      }
    }
    val out = new Array[String](live)
    var o = 0
    var c = 0
    while (c != -1) { out(o) = syms(c); o += 1; c = next(c) }
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
