package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed word n-gram shingles as one compiled loop.
  *
  * The composable spelling —
  * `transform(sequence(...), i -> xxhash64(concat_ws(' ', slice(tk, i, n))))`
  * — is three levels of higher-order functions, all CodegenFallback:
  * every gram allocates a lambda frame, an array slice and an interpreted
  * concat, and the explode operator's inferred `size(...) > 0` filter
  * re-inlines the whole pipeline for a second interpreted evaluation per
  * row (measured 4-5× on the ngram dedup path). This expression does the
  * same work in a single `eval`/static-call loop that stays inside
  * whole-stage codegen.
  *
  * Semantics (must mirror [[graft.ext.Dedup.shingleDF]] and the DuckDB
  * oracle SQL): tokens are joined with a single space into grams of `n`
  * consecutive tokens; fewer than `n` tokens yield ONE gram of all tokens
  * (including the empty gram for an empty token array); each gram is
  * hashed with Spark's `xxhash64` (seed 42), so values are identical to
  * `xxhash64(concat_ws(' ', ...))`. With `distinct = true` the output is
  * the sorted set of gram hashes — per-doc set-dedup happens map-side in
  * this loop, so no (id, shingle) distinct shuffle is needed downstream.
  */
case class NgramHashes(child: Expression, n: Int, distinct: Boolean)
  extends UnaryExpression with Serializable {

  override def prettyName: String = "graft_ngram_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires n >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${other.simpleString}")
  }

  override def nullSafeEval(tokens: Any): Any =
    NgramHashes.compute(tokens.asInstanceOf[ArrayData], n, distinct)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramHashes.compute($c, $n, $distinct);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** 64-bit SimHash of a token array in one compiled loop — replaces the
  * explode + 64-conditional-sum aggregate shape with a PURE PROJECTION:
  * signatures need no shuffle at all. Token multiplicity is the weight
  * (each occurrence contributes ±1 per bit). Hash values equal the
  * composable `xxhash64(lit(0), tok)` spelling: the literal-0 seed link
  * is reproduced exactly, so kernel and aggregate signatures are
  * bit-identical for the engine (xxh64) family. */
case class SimHash64(child: Expression)
  extends UnaryExpression with Serializable {

  override def prettyName: String = "graft_simhash64"
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${other.simpleString}")
  }

  override def nullSafeEval(tokens: Any): Any =
    SimHash64.compute(tokens.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.compute($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SimHash64 {
  /** Seed after hashing the literal 0 (IntegerType) under Spark's default
    * 42 — matches `xxhash64(lit(0), tok)`'s chained-seed evaluation. */
  private val SEED0: Long =
    XxHash64Function.hash(0, org.apache.spark.sql.types.IntegerType, 42L)

  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val m = tokens.numElements()
    var i = 0
    while (i < m) {
      if (!tokens.isNullAt(i)) {
        val h = XxHash64Function.hash(tokens.getUTF8String(i), StringType, SEED0)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

object NgramHashes {
  private val SPACE = UTF8String.fromString(" ")

  /** Static kernel shared by eval and generated code. */
  def compute(tokens: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val m = tokens.numElements()
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      // split() never yields nulls; mirror concat_ws and skip just in case
      toks(i) = if (tokens.isNullAt(i)) UTF8String.EMPTY_UTF8 else tokens.getUTF8String(i)
      i += 1
    }
    val count = if (m >= n) m - n + 1 else 1
    val out = new Array[Long](count)
    if (m < n) {
      out(0) = hash(UTF8String.concatWs(SPACE, toks: _*))
    } else {
      val win = new Array[UTF8String](n)
      var g = 0
      while (g < count) {
        var j = 0
        while (j < n) { win(j) = toks(g + j); j += 1 }
        out(g) = hash(UTF8String.concatWs(SPACE, win: _*))
        g += 1
      }
    }
    if (!distinct || count <= 1) new GenericArrayData(out)
    else {
      // sort + dedup: deterministic set order, no boxing hash set
      java.util.Arrays.sort(out)
      var w = 1; var r = 1
      while (r < count) {
        if (out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
        r += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(out, w))
    }
  }

  /** Spark's xxhash64 with its default seed — values match `xxhash64(gram)`. */
  private def hash(s: UTF8String): Long = XxHash64Function.hash(s, StringType, 42L)
}
