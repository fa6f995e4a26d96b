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

/** Single-pass alnum-run tokenizer over an ALREADY-LOWERCASED string —
  * the compiled twin of the regex spelling
  * `split(trim(regexp_replace(lowered, "[^a-z0-9]+", " ")), " ")`
  * ([[graft.ext.TextAnalysis.normTokens]]). Callers pass Spark's own
  * `lower(text)` as the child so case mapping stays byte-identical to
  * the built-in; this kernel only scans for runs of `[a-z0-9]` BYTES,
  * which equals the char-level regex because those code points are
  * single-byte in UTF-8 and UTF-8 continuation/lead bytes never fall in
  * that range. Zero runs (empty or punct-only text) yield `[""]`,
  * exactly like splitting the trimmed-empty string.
  * Byte-equality vs the regex spelling is property-pinned in
  * TextShinglesSpec (the PiiScrubber pattern). */
case class TokenizeRuns(child: Expression)
  extends UnaryExpression with Serializable {

  override def prettyName: String = "graft_tokenize_runs"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, got ${other.simpleString}")
  }

  override def nullSafeEval(text: Any): Any =
    TokenizeRuns.compute(text.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenizeRuns.compute($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TokenizeRuns {
  private val EMPTY_TOKEN = new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))

  private def isRun(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes // copies only when the string straddles memory
    val len = bytes.length
    // first pass: count runs (exact-size output array, no growth copies)
    var runs = 0
    var i = 0
    var in = false
    while (i < len) {
      val r = isRun(bytes(i))
      if (r && !in) runs += 1
      in = r
      i += 1
    }
    if (runs == 0) return EMPTY_TOKEN
    val out = new Array[Any](runs)
    var w = 0
    i = 0
    while (i < len) {
      if (isRun(bytes(i))) {
        val start = i
        while (i < len && isRun(bytes(i))) i += 1
        out(w) = UTF8String.fromBytes(bytes, start, i - start)
        w += 1
      } else i += 1
    }
    new GenericArrayData(out)
  }
}

/** Contiguous word n-grams as space-joined STRINGS in one compiled loop —
  * the corpus-statistics sibling of [[NgramHashes]] (counts need the
  * gram text and every occurrence, so: non-distinct, unhashed). Replaces
  * the composable HOF spelling
  * `transform(sequence(...), i -> concat_ws(" ", element_at(tk, i+j)...))`,
  * which is CodegenFallback with NO subexpression elimination: when `tk`
  * is itself the tokenization expression, every `element_at` re-runs the
  * full regex tokenization — O(tokens²) work per document (round-7
  * verdict's scale-killer: 30-35× vs oracle on text_ngram_counts /
  * text_pmi_bigrams). Here tokens are materialized once and grammed in a
  * single codegen'd loop.
  *
  * Semantics mirror the HOF spelling exactly: fewer than `n` tokens
  * yield an EMPTY array (unlike [[NgramHashes]], which emits one short
  * gram — dedup wants a signature even for short docs; counts must not
  * fabricate grams). */
case class NgramStrings(child: Expression, n: Int)
  extends UnaryExpression with Serializable {
  require(n >= 2, s"graft_ngram_strings is for n >= 2, got $n")

  override def prettyName: String = "graft_ngram_strings"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${other.simpleString}")
  }

  override def nullSafeEval(tokens: Any): Any =
    NgramStrings.compute(tokens.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramStrings.compute($c, $n);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NgramStrings {
  private val SPACE = UTF8String.fromString(" ")
  private val EMPTY = new GenericArrayData(Array.empty[Any])

  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return EMPTY
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      toks(i) = if (tokens.isNullAt(i)) UTF8String.EMPTY_UTF8 else tokens.getUTF8String(i)
      i += 1
    }
    val count = m - n + 1
    val out = new Array[Any](count)
    val win = new Array[UTF8String](n)
    var g = 0
    while (g < count) {
      var j = 0
      while (j < n) { win(j) = toks(g + j); j += 1 }
      out(g) = UTF8String.concatWs(SPACE, win: _*)
      g += 1
    }
    new GenericArrayData(out)
  }
}

/** Tagged unigram + bigram stream for one-scan collocation statistics:
  * emits `"u <token>"` for every NON-EMPTY token and `"b <w1> <w2>"` for
  * every contiguous bigram, so a single explode + single hash aggregation
  * yields both count tables (the `pmiBigrams` plan then reads that one
  * shuffle three ways via exchange reuse instead of re-scanning the
  * corpus per table). The prefixes cannot collide with payload: tokens
  * contain only `[a-z0-9]`, so no raw unigram/bigram ever starts with
  * `"u "` vs `"b "` ambiguity across kinds, and within a kind the prefix
  * map is injective. */
case class UniBigramTagged(child: Expression)
  extends UnaryExpression with Serializable {

  override def prettyName: String = "graft_uni_bigram_tagged"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${other.simpleString}")
  }

  override def nullSafeEval(tokens: Any): Any =
    UniBigramTagged.compute(tokens.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UniBigramTagged.compute($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object UniBigramTagged {
  private val U = UTF8String.fromString("u ")
  private val B = UTF8String.fromString("b ")
  private val SPACE = UTF8String.fromString(" ")

  def compute(tokens: ArrayData): ArrayData = {
    val m = tokens.numElements()
    val toks = new Array[UTF8String](m)
    var nonEmpty = 0
    var i = 0
    while (i < m) {
      val t = if (tokens.isNullAt(i)) UTF8String.EMPTY_UTF8 else tokens.getUTF8String(i)
      toks(i) = t
      if (t.numBytes() > 0) nonEmpty += 1
      i += 1
    }
    val grams = if (m >= 2) m - 1 else 0
    val out = new Array[Any](nonEmpty + grams)
    var w = 0
    i = 0
    while (i < m) {
      if (toks(i).numBytes() > 0) { out(w) = UTF8String.concat(U, toks(i)); w += 1 }
      i += 1
    }
    var g = 0
    while (g < grams) {
      out(w) = UTF8String.concat(B, toks(g), SPACE, toks(g + 1))
      w += 1; g += 1
    }
    new GenericArrayData(out)
  }

}

/** Count of common elements between two SORTED-ASCENDING distinct long
  * arrays in one merge walk — the exact-verification kernel of the
  * prefix-filtered n-gram Jaccard join ([[graft.ext.Dedup
  * .ngramJaccardPairsFromSigs]]). Both inputs come pre-sorted: the
  * [[NgramHashes]] signatures sort+dedup in the kernel, and the capped
  * signatures rebuild through `sort_array`. The composable
  * `size(array_intersect(a, b))` spelling allocates a hash set per ROW;
  * this walk allocates nothing. */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with Serializable {

  override def prettyName: String = "graft_sorted_intersect"
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint>, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectCount.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SortedIntersectCount {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** Per-document term-frequency pairs `(term, cnt)` in one compiled loop —
  * the map-side half of TF-IDF. The composable spelling
  * (`explode` the token array, then `groupBy(id, term).count`) shuffles
  * every post-partial `(id, term)` pair — an exchange proportional to the
  * corpus's distinct-terms-per-doc mass whose only purpose is counting
  * WITHIN one row's array. Counting in the projection keeps that work
  * map-side: the only exchanges left in TF-IDF are the vocabulary-sized
  * document-frequency aggregate and the k-rows-per-doc top-k partials.
  *
  * Semantics mirror the explode+groupBy spelling exactly: null and empty
  * tokens are skipped (the old plan filtered `term != ''`), and counts
  * are exact. Output order is first-occurrence (deterministic for a given
  * input; consumers aggregate, so order never reaches results). */
case class TermCounts(child: Expression)
  extends UnaryExpression with Serializable {

  override def prettyName: String = "graft_term_counts"
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("term", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("cnt", org.apache.spark.sql.types.IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${other.simpleString}")
  }

  override def nullSafeEval(tokens: Any): Any =
    TermCounts.compute(tokens.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TermCounts.compute($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Sum of the `cnt` field of a [[TermCounts]] array in one compiled
  * loop — the document token LENGTH (BM25's dl). The HOF spelling
  * (`aggregate(tc, 0L, (a, x) => a + x.cnt)`) is CodegenFallback with
  * no subexpression elimination, so it re-evaluated the whole
  * tokenize+count child per row interpreted — measured 0.66 → 3.87 s
  * on the sf1 corpus scan from that one column. */
case class CntTotal(child: Expression)
  extends UnaryExpression with Serializable {

  override def prettyName: String = "graft_cnt_total"
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: org.apache.spark.sql.types.StructType, _)
      if s.length == 2 && s(1).dataType == org.apache.spark.sql.types.IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<_, int>>, got ${other.simpleString}")
  }

  override def nullSafeEval(tc: Any): Any =
    CntTotal.compute(tc.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CntTotal.compute($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object CntTotal {
  def compute(tc: ArrayData): Long = {
    val m = tc.numElements()
    var s = 0L
    var i = 0
    while (i < m) { s += tc.getStruct(i, 2).getInt(1); i += 1 }
    s
  }
}

object TermCounts {
  def compute(tokens: ArrayData): ArrayData = {
    val m = tokens.numElements()
    // LinkedHashMap: first-occurrence output order, O(1) upsert. Keys are
    // CLONED — input UTF8Strings may view a buffer the scan reuses.
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Int]]()
    var i = 0
    while (i < m) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        if (t.numBytes() > 0) {
          val c = counts.get(t)
          if (c != null) c(0) += 1
          else counts.put(t.clone(), Array(1))
        }
      }
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var w = 0
    while (it.hasNext) {
      val e = it.next()
      out(w) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey, e.getValue()(0)))
      w += 1
    }
    new GenericArrayData(out)
  }
}

/** Unordered pairs of a bounded posting list in one compiled loop —
  * `array<struct<id, aux>>` → `array<struct<a, b, sza, szb>>` where
  * `(a, sza)` is the EARLIER list element and `(b, szb)` the later
  * (positional, NOT id-ordered: the incremental tier decodes old/new
  * tags from aux, so consumers apply their own id ordering). Replaces
  * the two-level `posexplode` + `slice` + `explode` pair expansion,
  * whose per-position `slice` allocates and copies the list tail —
  * measured ~0.7 µs per generated pair; this loop emits pairs directly
  * (~3× less). Memory per input row is bounded by the posting cap:
  * C(maxPostings, 2) structs — the cap is the library contract that
  * makes this safe. */
case class ListPairs(child: Expression)
  extends UnaryExpression with Serializable {

  override def prettyName: String = "graft_list_pairs"
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("b", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("sza", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("szb", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: org.apache.spark.sql.types.StructType, _)
      if s.length == 2 && s.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<bigint, bigint>>, got ${other.simpleString}")
  }

  override def nullSafeEval(lst: Any): Any =
    ListPairs.compute(lst.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ListPairs.compute($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ListPairs {
  def compute(lst: ArrayData): ArrayData = {
    val m = lst.numElements()
    val ids = new Array[Long](m)
    val auxs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val r = lst.getStruct(i, 2)
      ids(i) = r.getLong(0); auxs(i) = r.getLong(1)
      i += 1
    }
    val out = new Array[Any]((m.toLong * (m - 1) / 2).toInt)
    var w = 0
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m) {
        out(w) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](ids(i), ids(j), auxs(i), auxs(j)))
        w += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
