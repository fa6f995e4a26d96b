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
