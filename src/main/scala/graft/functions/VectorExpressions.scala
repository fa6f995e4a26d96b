package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}

/** Native vector kernels for the similarity/dedup extensions.
  *
  * The composable route (`zip_with` + `aggregate` higher-order functions)
  * allocates a lambda frame per element and is interpreted — fine for a
  * demo, wrong for scanning 10⁹ embeddings. These expressions generate a
  * fused primitive loop inside whole-stage codegen: one pass, three
  * accumulators, no allocation (the preference order of the build spec:
  * custom `Expression` with `doGenCode` before anything UDF-shaped).
  *
  * Float/double arrays are read through type-specific accessors (a
  * float widens exactly to double, so no cast node is needed and the
  * fold matches the oracle's double arithmetic bit-for-bit).
  */
abstract class VectorFold extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")

  /** Scala-side element read, widened to double. */
  protected def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }
  protected def leftElem: DataType = elemType(left).get
  protected def rightElem: DataType = elemType(right).get
  /** Janino-side accessor for codegen. */
  protected def getter(arr: String, i: String, t: DataType): String = t match {
    case FloatType => s"((double) $arr.getFloat($i))"
    case _ => s"$arr.getDouble($i)"
  }
}

/** dot(a, b) — Σ aᵢ·bᵢ over the common prefix; null elements count 0. */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) acc += get(x, i, leftElem) * get(y, i, rightElem)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    $acc += ${getter(x, i, leftElem)} * ${getter(y, i, rightElem)};
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) — single fused pass computing dot, ‖a‖², ‖b‖²;
  * null when either norm is zero. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xv = get(x, i, leftElem); val yv = get(y, i, rightElem)
        dot += xv * yv; nx += xv * xv; ny += yv * yv
      }
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    double $xv = ${getter(x, i, leftElem)}; double $yv = ${getter(y, i, rightElem)};
         |    $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |  }
         |}
         |if ($nx == 0.0 || $ny == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (Math.sqrt($nx) * Math.sqrt($ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Packed sign-bit signature of a vector against `h` fixed hyperplanes
  * (random-hyperplane LSH). The composable spelling — one
  * `aggregate(zip_with(vec, lit(plane), …))` fold PER PLANE — allocates
  * h interpreted lambda frames per row; this kernel is one fused loop
  * over h×dim inside whole-stage codegen.
  *
  * Bit-for-bit equivalent to the HOF fold the oracle replays: doubles
  * accumulate in index order, and a null element (or a vector shorter
  * than the plane) poisons that plane's projection to null → bit 0,
  * exactly like null-propagation through `zip_with`/`aggregate`. */
case class HyperplaneSig(left: Expression, right: Expression)
  extends BinaryExpression with Serializable {
  override def prettyName: String = "graft_hyperplane_sig"
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = left.nullable

  private def vecElem: Option[DataType] = left.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult = {
    if (vecElem.isEmpty)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double> vector, got ${left.dataType.simpleString}")
    right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable array<array<double>> plane matrix")
    }
  }

  @transient private lazy val planes: Array[Array[Double]] = {
    val ad = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements()) { i =>
      val inner = ad.getArray(i)
      Array.tabulate(inner.numElements())(inner.getDouble)
    }
  }
  private def isFloat: Boolean = vecElem.contains(FloatType)

  override def nullSafeEval(v: Any, unused: Any): Any =
    HyperplaneSig.compute(v.asInstanceOf[ArrayData], planes, isFloat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, (x, _) =>
      s"${ev.value} = graft.functions.HyperplaneSig.compute($x, $ref, $isFloat);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object HyperplaneSig {
  def compute(vec: ArrayData, planes: Array[Array[Double]],
              isFloat: Boolean): Long = {
    val m = vec.numElements()
    var sig = 0L
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      if (m == p.length) { // any length mismatch → null-padded fold → bit 0
        var acc = 0.0
        var ok = true
        var j = 0
        while (ok && j < p.length) {
          if (vec.isNullAt(j)) ok = false // null poisons the projection
          else acc += (if (isFloat) vec.getFloat(j).toDouble
                       else vec.getDouble(j)) * p(j)
          j += 1
        }
        if (ok && acc >= 0) sig |= (1L << i)
      }
      i += 1
    }
    sig
  }
}

/** Registration: per-session (`GraftFunctions.register(spark)`) or via
  * `spark.sql.extensions=graft.functions.GraftSparkExtensions`. */
object GraftFunctions {
  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (es => DotProduct(es(0), es(1))),
    "graft_cosine" -> (es => CosineSimilarity(es(0), es(1))),
    "zlib_deflate" -> (es => ZlibDeflate(es(0))),
    "zlib_inflate" -> (es => ZlibInflate(es(0))),
    "gzip_compress" -> (es => GzipCompress(es(0))),
    "gzip_decompress" -> (es => GzipDecompress(es(0))),
    "graft_minhash" -> (es => MinHashAgg.build(es)),
    "graft_topk" -> (es => TopKAgg.build(es)),
    "graft_bounded_collect" -> (es => BoundedCollectAgg.build(es)),
    "graft_ngram_hashes" -> (es => NgramHashes(es(0),
      es(1).eval().asInstanceOf[Number].intValue(),
      es(2).eval().asInstanceOf[Boolean])),
    "graft_hyperplane_sig" -> (es => HyperplaneSig(es(0), es(1))),
    "graft_simhash64" -> (es => SimHash64(es(0))),
    "graft_scrub_pii" -> (es => ScrubPii(es(0))),
    "graft_tokenize_runs" -> (es => TokenizeRuns(es(0))),
    "graft_ngram_strings" -> (es => NgramStrings(es(0),
      es(1).eval().asInstanceOf[Number].intValue())),
    "graft_uni_bigram_tagged" -> (es => UniBigramTagged(es(0))),
    "graft_text_counts" -> (es => TextCounts(es(0))),
    "graft_text_profile" -> (es =>
      TextProfileLower(es(0), graft.ext.TextAnalysis.stopwordLists)))

  def register(spark: SparkSession): Unit = fns.foreach { case (name, b) =>
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, b, "built-in")
  }

  /** Column API over the registered functions. */
  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_dot", a, b)
  }
  def cosine(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_cosine", a, b)
  }
  /** Fused random-hyperplane LSH signature — [[HyperplaneSig]]. */
  def hyperplaneSig(spark: SparkSession, vec: Column,
                    planes: Array[Array[Double]]): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_hyperplane_sig",
      vec, org.apache.spark.sql.functions.typedlit(planes.map(_.toSeq).toSeq))
  }
  /** Per-row 64-bit SimHash of a token array — [[SimHash64]]. */
  def simhash64(spark: SparkSession, tokens: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_simhash64", tokens)
  }
  /** Compiled PII scrub chain — [[ScrubPii]]. */
  def scrubPii(spark: SparkSession, text: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_scrub_pii", text)
  }
  /** Compiled raw-text counts — [[TextCounts]]. */
  def textCounts(spark: SparkSession, text: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_text_counts", text)
  }
  /** Compiled lowered-text profile over the canonical stopword lists —
    * [[TextProfileLower]]. Callers pass `lower(text)`. */
  def textProfile(spark: SparkSession, loweredText: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_text_profile", loweredText)
  }
  /** Hashed (optionally distinct) word n-gram shingles — [[NgramHashes]]. */
  def ngramHashes(spark: SparkSession, tokens: Column, n: Int,
                  distinct: Boolean = true): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_ngram_hashes",
      tokens, org.apache.spark.sql.functions.lit(n),
      org.apache.spark.sql.functions.lit(distinct))
  }
  /** Single-pass alnum-run tokenizer over a LOWERED string —
    * [[TokenizeRuns]]. Callers pass `lower(text)`. */
  def tokenizeRuns(spark: SparkSession, loweredText: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_tokenize_runs", loweredText)
  }
  /** Non-distinct string n-grams of a token array — [[NgramStrings]]. */
  def ngramStrings(spark: SparkSession, tokens: Column, n: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_ngram_strings",
      tokens, org.apache.spark.sql.functions.lit(n))
  }
  /** Tagged unigram+bigram stream for one-scan collocation counts —
    * [[UniBigramTagged]]. */
  def uniBigramTagged(spark: SparkSession, tokens: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_uni_bigram_tagged", tokens)
  }
}

/** `SparkSessionExtensions` hook (cluster deployments set
  * `spark.sql.extensions=graft.functions.GraftSparkExtensions`). */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))))
  }
}
