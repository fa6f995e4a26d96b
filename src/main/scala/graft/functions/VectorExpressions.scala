package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}
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

/** Nearest-centroid argmax over a FOLDABLE centroid matrix in one
  * compiled loop — the coarse-quantizer assignment kernel behind
  * `Similarity.assignToCells` (keep = 1).
  *
  * The composable spelling — `greatest(struct(cosine(v, lit_i), -id_i)
  * × k)` — generates k inlined cosine loops inside one expression tree;
  * past a few dozen centroids the generated method blows the JVM size
  * limits and the whole tower drops to interpreted evaluation with
  * per-row literal boxing (measured: 0.77 s at k=16 → 10.8 s at k=78 on
  * 20k×64 vectors). This expression does the identical argmax in a
  * single static-call loop that stays inside whole-stage codegen at any
  * k the matrix literal can carry (the caller caps it; the broadcast
  * cross-join path covers larger quantizers).
  *
  * Semantics are bit-identical to the struct-greatest spelling:
  * per-centroid cosine folds in ascending index order, skips null
  * vector elements pairwise, yields no sim on zero norms; the winner is
  * max by (sim, then SMALLER centroid id); zero-norm/null sims lose to
  * any real sim; if every sim is null — including a NULL corpus vector,
  * which nulls every cosine but still wins a cell through the id
  * tie-break — the smallest centroid id is returned. */
case class NearestCell(vec: Expression, cVecs: Expression, cIds: Expression)
  extends TernaryExpression with Serializable {
  override def prettyName: String = "graft_nearest_cell"
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = false
  override def first: Expression = vec
  override def second: Expression = cVecs
  override def third: Expression = cIds

  private def vecElem: Option[DataType] = vec.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult = {
    if (vecElem.isEmpty)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double> vector, got ${vec.dataType.simpleString}")
    (cVecs.dataType, cIds.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(LongType, _))
        if cVecs.foldable && cIds.foldable && ids.nonEmpty =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires non-empty foldable array<array<double>> centroids " +
          "and array<bigint> ids")
    }
  }

  @transient private lazy val mat: Array[Array[Double]] = {
    val ad = cVecs.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements()) { i =>
      val inner = ad.getArray(i)
      Array.tabulate(inner.numElements())(inner.getDouble)
    }
  }
  @transient private lazy val ids: Array[Long] =
    cIds.eval().asInstanceOf[ArrayData].toLongArray()
  private def isFloat: Boolean = vecElem.contains(FloatType)

  // custom eval/codegen (not nullSafe): a null vector still wins a cell
  override def eval(input: InternalRow): Any =
    NearestCell.compute(vec.eval(input).asInstanceOf[ArrayData], mat, ids, isFloat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refM = ctx.addReferenceObj("cents", mat, "double[][]")
    val refI = ctx.addReferenceObj("cids", ids, "long[]")
    val v = vec.genCode(ctx)
    val compute = s"graft.functions.NearestCell.compute(" +
      s"${v.isNull} ? null : ${v.value}, $refM, $refI, $isFloat)"
    ev.copy(
      code = code"""
        ${v.code}
        long ${ev.value} = ${org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
          .expression(compute, dataType)};
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(vec = f, cVecs = s, cIds = t)
}

object NearestCell {
  /** Static kernel shared by eval and generated code. `v` may be null. */
  def compute(v: ArrayData, cv: Array[Array[Double]], ids: Array[Long],
              isFloat: Boolean): Long = {
    val k = cv.length
    var bestHas = false
    var bestSim = 0.0
    var bestId = Long.MaxValue
    var nullId = Long.MaxValue // best (= smallest) id among null-sim cells
    var i = 0
    while (i < k) {
      if (v == null) {
        if (ids(i) < nullId) nullId = ids(i)
      } else {
        val c = cv(i)
        val n = math.min(v.numElements(), c.length)
        var dot = 0.0; var nx = 0.0; var ny = 0.0
        var j = 0
        while (j < n) {
          if (!v.isNullAt(j)) {
            val xv = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
            val yv = c(j)
            dot += xv * yv; nx += xv * xv; ny += yv * yv
          }
          j += 1
        }
        if (nx == 0.0 || ny == 0.0) {
          if (ids(i) < nullId) nullId = ids(i)
        } else {
          val s = dot / (math.sqrt(nx) * math.sqrt(ny))
          // java.lang.Double.compare = Spark's double ordering (NaN largest)
          val cmp = java.lang.Double.compare(s, bestSim)
          if (!bestHas || cmp > 0 || (cmp == 0 && ids(i) < bestId)) {
            bestHas = true; bestSim = s; bestId = ids(i)
          }
        }
      }
      i += 1
    }
    if (bestHas) bestId else nullId
  }
}

/** Product-quantization encode (Jégou/Douze/Schmid, "Product
  * quantization for nearest neighbor search", TPAMI 2011): the vector
  * splits into `m` contiguous subspaces of `dsub` dims; each subvector
  * maps to its nearest (L2) codebook centroid; output is the `m`-byte
  * code (`asInts = true` → `array<int>`, the training-path spelling that
  * composes with `element_at`). At 100 TB this is the representation
  * that makes ANN feasible: the corpus scan carries m bytes per vector
  * instead of 4·dim, and scoring is O(m) table adds (see [[PqAdc]]).
  * Codebooks ride the expression as a foldable literal
  * (`array<array<array<double>>>`, m × ksub × dsub) — driver-small by
  * contract (≤ 256 KB at m=8, ksub=256, dsub=16). */
case class PqEncode(vec: Expression, books: Expression, asInts: Boolean)
  extends BinaryExpression with Serializable {
  override def prettyName: String = "graft_pq_encode"
  override def left: Expression = vec
  override def right: Expression = books
  override def dataType: DataType =
    if (asInts) ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
    else org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = true

  private def vecElem: Option[DataType] = vec.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult = {
    if (vecElem.isEmpty)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double> vector, got ${vec.dataType.simpleString}")
    books.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)
        if books.foldable && mat.nonEmpty && mat.forall(_.nonEmpty) =>
        if (mat.forall(_.length <= 256) || asInts) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName byte codes require ksub <= 256 per subspace")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires non-empty foldable array<array<array<double>>> codebooks")
    }
  }

  @transient private[functions] lazy val mat: Array[Array[Array[Double]]] = {
    val outer = books.eval().asInstanceOf[ArrayData]
    Array.tabulate(outer.numElements()) { j =>
      val mid = outer.getArray(j)
      Array.tabulate(mid.numElements()) { c =>
        val inner = mid.getArray(c)
        Array.tabulate(inner.numElements())(inner.getDouble)
      }
    }
  }
  private def isFloat: Boolean = vecElem.contains(FloatType)

  override def nullSafeEval(v: Any, b: Any): Any = {
    val codes = PqEncode.compute(v.asInstanceOf[ArrayData], mat, isFloat)
    if (asInts) new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
    else codes.map(_.toByte)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refB = ctx.addReferenceObj("pqbooks", mat, "double[][][]")
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val codes = ctx.freshName("codes")
      val conv =
        if (asInts)
          s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
            s"graft.functions.PqEncode.toInts($codes));"
        else
          s"${ev.value} = graft.functions.PqEncode.toBytes($codes);"
      s"""
        int[] $codes = graft.functions.PqEncode.compute($v, $refB, $isFloat);
        $conv
      """
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(vec = l, books = r)
}

object PqEncode {
  /** Per-subspace nearest-centroid (L2) codes. Subspace j covers dims
    * `[j*dsub, (j+1)*dsub)` of the input; a vector shorter than the
    * codebook's span reads missing/null dims as 0 (consistent with the
    * other kernels' null-element convention). */
  def compute(v: ArrayData, books: Array[Array[Array[Double]]],
              isFloat: Boolean): Array[Int] = {
    val m = books.length
    val out = new Array[Int](m)
    val n = v.numElements()
    var off = 0
    var j = 0
    while (j < m) {
      val book = books(j)
      val dsub = book(0).length
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val i = off + t
          val xv =
            if (i >= n || v.isNullAt(i)) 0.0
            else if (isFloat) v.getFloat(i).toDouble
            else v.getDouble(i)
          val diff = xv - cent(t)
          d += diff * diff
          t += 1
        }
        // strict <: ties keep the SMALLEST code (deterministic)
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best
      off += dsub
      j += 1
    }
    out
  }
  def toBytes(codes: Array[Int]): Array[Byte] = codes.map(_.toByte)
  def toInts(codes: Array[Int]): Array[Int] = codes

  /** Σ_j min_c ||x_j − books[j][c]||² — the squared quantization error
    * the [[compute]] argmin minimizes, returned instead of the codes.
    * Same traversal, same zero-fill convention. */
  def error(v: ArrayData, books: Array[Array[Array[Double]]],
            isFloat: Boolean): Double = {
    val m = books.length
    val n = v.numElements()
    var total = 0.0
    var off = 0
    var j = 0
    while (j < m) {
      val book = books(j)
      val dsub = book(0).length
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val i = off + t
          val xv =
            if (i >= n || v.isNullAt(i)) 0.0
            else if (isFloat) v.getFloat(i).toDouble
            else v.getDouble(i)
          val diff = xv - cent(t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) bestD = d
        c += 1
      }
      total += bestD
      off += dsub
      j += 1
    }
    total
  }
}

/** Per-row PQ quantization error (Σ per-subspace min squared L2 to the
  * codebooks) — the encode argmin's objective value. Aggregated to a
  * mean, this is the codebook-staleness drift statistic
  * [[graft.builder.AnnIndexBuilder]] logs per run: a batch whose
  * distribution drifted from the training batch quantizes measurably
  * worse under the frozen codebooks. */
case class PqError(vec: Expression, books: Expression)
  extends BinaryExpression with Serializable {
  override def prettyName: String = "graft_pq_error"
  override def left: Expression = vec
  override def right: Expression = books
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def vecElem: Option[DataType] = vec.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult = {
    if (vecElem.isEmpty)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double> vector, got ${vec.dataType.simpleString}")
    books.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)
        if books.foldable && mat.nonEmpty && mat.forall(_.nonEmpty) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires non-empty foldable array<array<array<double>>> codebooks")
    }
  }

  @transient private lazy val mat: Array[Array[Array[Double]]] = {
    val outer = books.eval().asInstanceOf[ArrayData]
    Array.tabulate(outer.numElements()) { j =>
      val mid = outer.getArray(j)
      Array.tabulate(mid.numElements()) { c =>
        val inner = mid.getArray(c)
        Array.tabulate(inner.numElements())(inner.getDouble)
      }
    }
  }
  private def isFloat: Boolean = vecElem.contains(FloatType)

  override def nullSafeEval(v: Any, b: Any): Any =
    PqEncode.error(v.asInstanceOf[ArrayData], mat, isFloat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refB = ctx.addReferenceObj("pqbooks", mat, "double[][][]")
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = graft.functions.PqEncode.error($v, $refB, $isFloat);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(vec = l, books = r)
}

/** Per-query ADC lookup table for [[PqAdc]]: entry `j*ksub + c` holds
  * `dot(q_j, books[j][c]) / |q|` — the query-side half of the cosine,
  * pre-divided by the query norm so scoring needs no per-pair division
  * by it. O(ksub·dim) ONCE per query row, amortized over the whole
  * corpus scan. Null when the query norm is 0 (no meaningful cosine).
  * All subspaces share one ksub (= max book size; smaller trailing
  * books would be a training bug, enforced at train time). */
case class PqLut(vec: Expression, books: Expression)
  extends BinaryExpression with Serializable {
  override def prettyName: String = "graft_pq_lut"
  override def left: Expression = vec
  override def right: Expression = books
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  private def vecElem: Option[DataType] = vec.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult = {
    if (vecElem.isEmpty)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double> vector, got ${vec.dataType.simpleString}")
    books.dataType match {
      // same inner-nonEmpty guard as PqEncode: an empty codebook would
      // pass analysis and then index book(0) at runtime
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)
        if books.foldable && mat.nonEmpty && mat.forall(_.nonEmpty) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires non-empty foldable array<array<array<double>>> codebooks")
    }
  }

  @transient private lazy val mat: Array[Array[Array[Double]]] = {
    val outer = books.eval().asInstanceOf[ArrayData]
    Array.tabulate(outer.numElements()) { j =>
      val mid = outer.getArray(j)
      Array.tabulate(mid.numElements()) { c =>
        val inner = mid.getArray(c)
        Array.tabulate(inner.numElements())(inner.getDouble)
      }
    }
  }
  private def isFloat: Boolean = vecElem.contains(FloatType)

  override def nullSafeEval(v: Any, b: Any): Any = {
    val lut = PqLut.compute(v.asInstanceOf[ArrayData], mat, isFloat)
    if (lut == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(lut)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refB = ctx.addReferenceObj("pqbooks", mat, "double[][][]")
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val lut = ctx.freshName("lut")
      s"""
        double[] $lut = graft.functions.PqLut.compute($v, $refB, $isFloat);
        if ($lut == null) { ${ev.isNull} = true; }
        else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($lut); }
      """
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(vec = l, books = r)
}

object PqLut {
  def compute(v: ArrayData, books: Array[Array[Array[Double]]],
              isFloat: Boolean): Array[Double] = {
    val n = v.numElements()
    var q2 = 0.0
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val xv = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        q2 += xv * xv
      }
      i += 1
    }
    if (q2 == 0.0) return null
    val qn = math.sqrt(q2)
    val m = books.length
    val ksub = books.map(_.length).max
    val out = new Array[Double](m * ksub)
    var off = 0
    var j = 0
    while (j < m) {
      val book = books(j)
      val dsub = book(0).length
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var dot = 0.0
        var t = 0
        while (t < dsub) {
          val idx = off + t
          val xv =
            if (idx >= n || v.isNullAt(idx)) 0.0
            else if (isFloat) v.getFloat(idx).toDouble
            else v.getDouble(idx)
          dot += xv * cent(t)
          t += 1
        }
        out(j * ksub + c) = dot / qn
        c += 1
      }
      off += dsub
      j += 1
    }
    out
  }
}

/** ADC cosine score: `Σⱼ lut[j·ksub + code_j] / sqrt(Σⱼ |c_{j,code_j}|²)`
  * — O(m) adds per (query, corpus-code) pair against the [[PqLut]]
  * query table and a GLOBAL per-centroid norm² literal (`normLut`,
  * corpus-side half of the cosine; same for every query, hence
  * foldable). Null when the reconstructed corpus norm is 0. */
case class PqAdc(lut: Expression, code: Expression, normLut: Expression)
  extends TernaryExpression with Serializable {
  override def prettyName: String = "graft_pq_adc"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def first: Expression = lut
  override def second: Expression = code
  override def third: Expression = normLut

  override def checkInputDataTypes(): TypeCheckResult =
    (lut.dataType, code.dataType, normLut.dataType) match {
      case (ArrayType(DoubleType, _), org.apache.spark.sql.types.BinaryType,
            ArrayType(DoubleType, _)) if normLut.foldable && norms.nonEmpty =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double> lut, binary code, foldable array<double> normLut)")
    }

  @transient private lazy val norms: Array[Double] =
    normLut.eval().asInstanceOf[ArrayData].toDoubleArray()

  override def nullSafeEval(l: Any, c: Any, n: Any): Any = {
    val r = PqAdc.compute(l.asInstanceOf[ArrayData].toDoubleArray(),
      c.asInstanceOf[Array[Byte]], norms)
    if (r.isNaN) null else r
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refN = ctx.addReferenceObj("pqnorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, (l, c, _) => {
      val r = ctx.freshName("sim")
      s"""
        double $r = graft.functions.PqAdc.compute($l.toDoubleArray(), $c, $refN);
        if (Double.isNaN($r)) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
      """
    })
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(lut = f, code = s, normLut = t)
}

object PqAdc {
  /** NaN encodes "no cosine" (zero reconstructed norm) across the
    * eval/codegen boundary; callers map it to SQL null. */
  def compute(lut: Array[Double], code: Array[Byte], norms: Array[Double]): Double = {
    val m = code.length
    val ksub = if (m == 0) 0 else norms.length / m
    var dot = 0.0
    var n2 = 0.0
    var j = 0
    while (j < m) {
      val idx = j * ksub + (code(j) & 0xFF)
      dot += lut(idx)
      n2 += norms(idx)
      j += 1
    }
    if (n2 == 0.0) Double.NaN else dot / math.sqrt(n2)
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
    "graft_topk_str" -> (es => TopKStrAgg.build(es)),
    "graft_bounded_collect" -> (es => BoundedCollectAgg.build(es)),
    "graft_ngram_hashes" -> (es => NgramHashes(es(0),
      es(1).eval().asInstanceOf[Number].intValue(),
      es(2).eval().asInstanceOf[Boolean])),
    "graft_hyperplane_sig" -> (es => HyperplaneSig(es(0), es(1))),
    "graft_nearest_cell" -> (es => NearestCell(es(0), es(1), es(2))),
    "graft_simhash64" -> (es => SimHash64(es(0))),
    "graft_scrub_pii" -> (es => ScrubPii(es(0))),
    "graft_tokenize_runs" -> (es => TokenizeRuns(es(0))),
    "graft_ngram_strings" -> (es => NgramStrings(es(0),
      es(1).eval().asInstanceOf[Number].intValue())),
    "graft_uni_bigram_tagged" -> (es => UniBigramTagged(es(0))),
    "graft_term_counts" -> (es => TermCounts(es(0))),
    "graft_cnt_total" -> (es => CntTotal(es(0))),
    "graft_list_pairs" -> (es => ListPairs(es(0))),
    "graft_json_get_top" -> (es => JsonGetTop(es(0),
      es(1).eval().toString)),
    "graft_sorted_intersect" -> (es => SortedIntersectCount(es(0), es(1))),
    "graft_text_counts" -> (es => TextCounts(es(0))),
    "graft_text_profile" -> (es =>
      TextProfileLower(es(0), graft.ext.TextAnalysis.stopwordLists)),
    "graft_pq_encode" -> (es => PqEncode(es(0), es(1),
      es(2).eval().asInstanceOf[Boolean])),
    "graft_pq_error" -> (es => PqError(es(0), es(1))),
    "graft_pq_lut" -> (es => PqLut(es(0), es(1))),
    "graft_pq_adc" -> (es => PqAdc(es(0), es(1), es(2))),
    "graft_bpe_count" -> (es => BpeCount(es(0), es(1).eval().toString)),
    "graft_bpe_encode" -> (es => BpeEncode(es(0), es(1).eval().toString)),
    "graft_clf_bucket_tf" -> (es => ClfBucketTf(es(0),
      es(1).eval().asInstanceOf[Number].intValue(),
      es(2).eval().asInstanceOf[Number].intValue(),
      es(3).eval().toString)),
    "graft_clf_score_micro" -> (es => ClfScoreMicro(es(0), es(1),
      es(2).eval().asInstanceOf[Number].intValue(),
      es(3).eval().toString)))

  // once-per-session guard: the builder set is immutable, so re-running
  // the create-or-replace loop on every Column-helper call only churns
  // the synchronized registry and floods the log with "replaced a
  // previously registered function" warnings. Weak keys: the guard must
  // not pin short-lived cloned sessions (foreachBatch clones one per
  // streaming query).
  private val registeredSessions = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Test hook: forget which sessions were registered — a spec that
    * drops a function from a registry needs the next register() to
    * actually re-run (the guard would otherwise mask the drop). */
  private[graft] def invalidateRegistrationCacheForTest(): Unit =
    registeredSessions.clear()

  def register(spark: SparkSession): Unit = {
    // Guard ordering: mark the session registered only AFTER the loop
    // completes. A concurrent caller that races the window re-runs the
    // (idempotent) create-or-replace loop — harmless — whereas the
    // reverse order lets it proceed against a half-populated registry
    // and analyze a plan into UNRESOLVED_ROUTINE.
    def into(s: SparkSession): Unit =
      if (!registeredSessions.contains(s)) {
        fns.foreach { case (name, b) =>
          s.sessionState.functionRegistry.createOrReplaceTempFunction(name, b, "built-in")
        }
        registeredSessions.add(s)
      }
    into(spark)
    // foreachBatch hazard: Structured Streaming runs micro-batches in a
    // CLONED session, so a plan that joins a batch-derived frame (clone)
    // against a store frame (outer session) analyzes under whichever
    // session owns the LEFT-most base relation — not necessarily the
    // one the Column helper was handed. Register into the active and
    // default sessions too, so the function resolves no matter which
    // registry the analyzer consults (all registrations are idempotent
    // create-or-replace of the same builders).
    (SparkSession.getActiveSession.toSeq ++ SparkSession.getDefaultSession.toSeq)
      .filter(_ ne spark).distinct.foreach(into)
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
  /** Fused nearest-centroid argmax over a centroid-matrix literal —
    * [[NearestCell]]. */
  def nearestCell(spark: SparkSession, vec: Column,
                  cVecs: Array[Array[Double]], cIds: Array[Long]): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_nearest_cell",
      vec, org.apache.spark.sql.functions.typedlit(cVecs.map(_.toSeq).toSeq),
      org.apache.spark.sql.functions.typedlit(cIds.toSeq))
  }
  /** PQ code of a vector against a codebook literal — [[PqEncode]]. */
  def pqEncode(spark: SparkSession, vec: Column,
               books: Array[Array[Array[Double]]], asInts: Boolean = false): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_pq_encode",
      vec, org.apache.spark.sql.functions.typedlit(
        books.map(_.map(_.toSeq).toSeq).toSeq),
      org.apache.spark.sql.functions.lit(asInts))
  }
  /** Per-row PQ quantization error against a codebook literal —
    * [[PqError]]. */
  def pqError(spark: SparkSession, vec: Column,
              books: Array[Array[Array[Double]]]): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_pq_error",
      vec, org.apache.spark.sql.functions.typedlit(
        books.map(_.map(_.toSeq).toSeq).toSeq))
  }
  /** Per-query ADC lookup table — [[PqLut]]. */
  def pqLut(spark: SparkSession, vec: Column,
            books: Array[Array[Array[Double]]]): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_pq_lut",
      vec, org.apache.spark.sql.functions.typedlit(
        books.map(_.map(_.toSeq).toSeq).toSeq))
  }
  /** O(m) ADC cosine against a per-centroid norm² literal — [[PqAdc]]. */
  def pqAdc(spark: SparkSession, lut: Column, code: Column,
            normLut: Array[Double]): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_pq_adc",
      lut, code, org.apache.spark.sql.functions.typedlit(normLut.toSeq))
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
  /** Compiled BPE token count under a merge-table wire string —
    * [[BpeCount]] (the spec literal folds into ONE plan object, so the
    * plan stays flat at any vocab size). */
  def bpeCount(spark: SparkSession, word: Column, spec: String): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_bpe_count",
      word, org.apache.spark.sql.functions.lit(spec))
  }
  /** Compiled BPE encode (symbol sequence) — [[BpeEncode]]. */
  def bpeEncode(spark: SparkSession, word: Column, spec: String): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_bpe_encode",
      word, org.apache.spark.sql.functions.lit(spec))
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
  /** Exact continuous quantile of an ASCENDING-sorted double array —
    * linear interpolation at position `q·(n−1)`, reproducing Spark's
    * `Percentile.getPercentile` bit-for-bit:
    * `(hi−pos)·v[lo] + (pos−lo)·v[hi]` (NOT the algebraically-equal
    * `v[lo] + frac·Δ`, which rounds differently in binary64 and
    * breaks hash-level oracle agreement). Pure Column composition —
    * pair with `sort_array(collect_list(x))`, whose flat unsafe-array
    * buffer beats the builtin `percentile` aggregate's per-row boxed
    * OpenHashMap updates ~4× (measured at sf0.1; property-pinned
    * against the builtin in PropertySpec). */
  def quantileCont(sortedArr: Column, q: Double): Column = {
    import org.apache.spark.sql.functions._
    val n = size(sortedArr).cast("double")
    val pos = lit(q) * (n - 1d)
    val lo = floor(pos)
    val hi = ceil(pos)
    when(hi === lo, element_at(sortedArr, lo.cast("int") + 1))
      .otherwise(
        (hi - pos) * element_at(sortedArr, lo.cast("int") + 1) +
          (pos - lo) * element_at(sortedArr, hi.cast("int") + 1))
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
  /** Merge-walk common-element count of two sorted long arrays —
    * [[SortedIntersectCount]]. */
  def sortedIntersect(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_sorted_intersect", a, b)
  }
  /** Top-level JSON scalar extraction (`$.key` fast path) —
    * [[JsonGetTop]]. */
  def jsonGetTop(spark: SparkSession, json: Column, key: String): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_json_get_top",
      json, org.apache.spark.sql.functions.lit(key))
  }
  /** Unordered `(a, b, sza, szb)` pairs of a bounded posting list —
    * [[ListPairs]]. */
  def listPairs(spark: SparkSession, lst: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_list_pairs", lst)
  }
  /** Per-doc `(term, cnt)` pairs in one compiled loop — [[TermCounts]]. */
  def termCounts(spark: SparkSession, tokens: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_term_counts", tokens)
  }
  /** Σ cnt of a [[TermCounts]] array — the doc token length
    * ([[CntTotal]]). */
  def cntTotal(spark: SparkSession, tc: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_cnt_total", tc)
  }
  /** Tagged unigram+bigram stream for one-scan collocation counts —
    * [[UniBigramTagged]]. */
  def uniBigramTagged(spark: SparkSession, tokens: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_uni_bigram_tagged", tokens)
  }
  /** Per-doc hashed classifier feature counts `(bucket, tf)` + the doc
    * marker in one compiled loop — [[ClfBucketTf]]. */
  def clfBucketTf(spark: SparkSession, tokens: Column, buckets: Int,
                  family: String, seed: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_clf_bucket_tf",
      tokens, org.apache.spark.sql.functions.lit(buckets),
      org.apache.spark.sql.functions.lit(seed),
      org.apache.spark.sql.functions.lit(family))
  }
  /** Micro-fixed feature-weight sum against a dense weight-table
    * literal — [[ClfScoreMicro]] (the whole classifier score subplan as
    * one projection). */
  def clfScoreMicro(spark: SparkSession, tokens: Column,
                    weights: Array[Long], family: String, seed: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_clf_score_micro",
      tokens, org.apache.spark.sql.functions.typedlit(weights.toSeq),
      org.apache.spark.sql.functions.lit(seed),
      org.apache.spark.sql.functions.lit(family))
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
