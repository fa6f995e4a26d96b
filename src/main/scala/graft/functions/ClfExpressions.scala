package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-(family, seed, buckets) hashed-feature bucketizer shared by the
  * two classifier kernels below — the compiled twin of the composable
  * spelling in [[graft.ext.QualityClassifier]]:
  *
  *   `pmod(seededHash(family, seed, tag), buckets)` over the
  *   [[UniBigramTagged]] stream `"u <tok>"` / `"b <w1> <w2>"`.
  *
  * ==Equivalence contract (oracle-critical)==
  *  - `md5` family: `conv(substring(md5(concat(seed, ':', tag) CAST
  *    BINARY), 1, 15), 16, 10)` = the top 60 bits of the digest's first
  *    8 bytes (15 hex nibbles), a non-negative long, then `% buckets`.
  *    The digest is fed the EXACT bytes of the concat spelling —
  *    `"<seed>:u <tok>"` / `"<seed>:b <w1> <w2>"` — without
  *    materializing the tag string (incremental updates).
  *  - `xxh64` family: `xxhash64(lit(seed), tag)` = Spark's fold
  *    `hash(tag, hash(seed:int, 42))`; the tag string IS materialized
  *    (xxh64 needs contiguous bytes) and `pmod` handles the signed
  *    hash.
  * Byte-equality against the composable spelling is property-pinned in
  * ExtQualitySpec (the TokenizeRuns discipline). */
private[functions] final class ClfTagHasher(
    val family: String, val seed: Int, val buckets: Long) extends Serializable {
  require(family == "md5" || family == "xxh64", s"unknown hash family: $family")
  private val isMd5 = family == "md5"
  private val seedPrefix: Array[Byte] = (seed.toString + ":").getBytes("UTF-8")
  private val xxSeed: Long =
    if (isMd5) 0L else XxHash64Function.hash(seed, IntegerType, 42L)

  // MD5 instances are stateful; expression instances are shared across
  // the executor's concurrent tasks (plan references), so the digest is
  // per-thread
  @transient private lazy val md5TL: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private val U = UTF8String.fromString("u ")
  private val B = UTF8String.fromString("b ")
  private val SPACE = UTF8String.fromString(" ")

  /** Top 60 bits of md5("<seed>:<kind> t1[ t2]") — the conv/substring
    * spelling's value, always ≥ 0. */
  private def md5Top60(kind: Byte, t1: UTF8String, t2: UTF8String): Long = {
    val md = md5TL.get()
    md.reset()
    md.update(seedPrefix)
    md.update(kind)
    md.update(' '.toByte)
    md.update(t1.getBytes)
    if (t2 != null) { md.update(' '.toByte); md.update(t2.getBytes) }
    val d = md.digest()
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  private def pmod(h: Long): Long = { val m = h % buckets; if (m < 0) m + buckets else m }

  def bucketU(t: UTF8String): Long =
    if (isMd5) md5Top60('u', t, null) % buckets
    else pmod(XxHash64Function.hash(UTF8String.concat(U, t), StringType, xxSeed))

  def bucketB(t1: UTF8String, t2: UTF8String): Long =
    if (isMd5) md5Top60('b', t1, t2) % buckets
    else pmod(XxHash64Function.hash(
      UTF8String.concat(B, t1, SPACE, t2), StringType, xxSeed))
}

/** Per-document hashed feature counts `(bucket, tf)` in ONE compiled
  * loop — tagged unigrams + adjacent bigrams of an (already-normalized)
  * token array, bucket-hashed, run-length counted, plus the per-doc
  * marker `(−1, 1)` (the [[graft.ext.QualityClassifier]] DocMarker).
  *
  * Replaces `explode(concat(uniBigramTagged(tk), array('d '))) →
  * pmod(md5-chain) → groupBy(id, bucket).count()`: per tag that
  * spelling allocates a concat'd tag string, a 32-char hex digest
  * string and a conv parse, then ships one ROW per tag occurrence into
  * a (id, bucket) hash aggregate — two orders of magnitude more rows
  * and a full exchange, for counts this loop produces in-place. The
  * output array is bucket-ascending (sort + RLE), ≤ min(tags,
  * buckets)+1 entries. */
case class ClfBucketTf(child: Expression, buckets: Int, seed: Int,
                       family: String)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with Serializable {

  override def prettyName: String = "graft_clf_bucket_tf"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("bucket", LongType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${other.simpleString}")
  }

  @transient private lazy val hasher = new ClfTagHasher(family, seed, buckets.toLong)

  override def nullSafeEval(tokens: Any): Any =
    ClfBucketTf.compute(tokens.asInstanceOf[ArrayData], hasher)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("clfHasher", hasher, classOf[ClfTagHasher].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ClfBucketTf.compute($c, $h);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ClfBucketTf {
  def compute(tokens: ArrayData, hasher: ClfTagHasher): ArrayData = {
    // mirror UniBigramTagged.compute: unigrams for NON-EMPTY tokens,
    // bigrams for every adjacent pair, null elements read as empty
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
    val n = nonEmpty + grams
    val bs = new Array[Long](n + 1)
    bs(0) = -1L // the doc marker (sorts first; can never collide: buckets ≥ 0)
    var w = 1
    i = 0
    while (i < m) {
      if (toks(i).numBytes() > 0) { bs(w) = hasher.bucketU(toks(i)); w += 1 }
      i += 1
    }
    var g = 0
    while (g < grams) {
      bs(w) = hasher.bucketB(toks(g), toks(g + 1)); w += 1; g += 1
    }
    java.util.Arrays.sort(bs)
    var runs = 1
    i = 1
    while (i <= n) { if (bs(i) != bs(i - 1)) runs += 1; i += 1 }
    val out = new Array[Any](runs)
    var o = 0
    i = 0
    while (i <= n) {
      var j = i + 1
      while (j <= n && bs(j) == bs(i)) j += 1
      out(o) = new GenericInternalRow(Array[Any](bs(i), (j - i).toLong))
      o += 1
      i = j
    }
    new GenericArrayData(out)
  }
}

/** Micro-fixed classifier feature-weight SUM of a token array — the
  * whole score-side subplan of [[graft.ext.QualityClassifier.score]] as
  * ONE compiled projection: per tag (unigram/bigram, marker excluded),
  * `weights[bucket(tag)]` accumulates in a long. Because the score is
  * LINEAR in tf, summing per tag equals the old
  * `groupBy(id, bucket).count → join(broadcast weights) → Σ tf·w`
  * plan — with its two exchanges, broadcast build and per-tag md5
  * expression chain deleted. Long addition is exact under any order,
  * so the value is bit-identical to the join spelling.
  *
  * `weights` must be DENSE over `[0, buckets)` with absent model
  * buckets pre-filled at the smoothed zero-count weight (the left-join
  * coalesce of the old plan) — [[graft.ext.QualityClassifier
  * .modelConsts]] builds it that way. */
case class ClfScoreMicro(left: Expression, right: Expression, seed: Int,
                         family: String)
  extends BinaryExpression with Serializable {

  override def prettyName: String = "graft_clf_score_micro"
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(StringType, _) => right.dataType match {
      case ArrayType(LongType, _) if right.foldable => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable array<bigint> weight table")
    }
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${other.simpleString}")
  }

  @transient private lazy val weights: Array[Long] =
    right.eval().asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val hasher =
    new ClfTagHasher(family, seed, weights.length.toLong)

  override def nullSafeEval(tokens: Any, unused: Any): Any =
    ClfScoreMicro.compute(tokens.asInstanceOf[ArrayData], weights, hasher)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("clfWeights", weights, "long[]")
    val h = ctx.addReferenceObj("clfHasher", hasher, classOf[ClfTagHasher].getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.ClfScoreMicro.compute($t, $w, $h);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ClfScoreMicro {
  def compute(tokens: ArrayData, weights: Array[Long],
              hasher: ClfTagHasher): Long = {
    val m = tokens.numElements()
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      toks(i) = if (tokens.isNullAt(i)) UTF8String.EMPTY_UTF8 else tokens.getUTF8String(i)
      i += 1
    }
    var s = 0L
    i = 0
    while (i < m) {
      if (toks(i).numBytes() > 0) s += weights(hasher.bucketU(toks(i)).toInt)
      i += 1
    }
    var g = 0
    val grams = if (m >= 2) m - 1 else 0
    while (g < grams) {
      s += weights(hasher.bucketB(toks(g), toks(g + 1)).toInt)
      g += 1
    }
    s
  }
}
