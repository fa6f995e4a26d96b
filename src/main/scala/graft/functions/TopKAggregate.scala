package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap top-k as a native aggregate: per group, keep only the
  * `k` best `(score, id)` pairs — "best" = highest score, ties broken
  * toward the smallest id (the determinism rule every similarity query
  * uses).
  *
  * This replaces the `row_number() OVER (PARTITION BY q_id ORDER BY
  * sim DESC)` pattern, whose window shuffles and SORTS every scored
  * row (|corpus|×|queries| rows for brute-force ANN). The aggregate is
  * commutative + associative, so map-side partial aggregation bounds
  * the shuffle at k·|groups| rows regardless of input size — the
  * 100 TB shape for top-k.
  *
  * Buffer = binary min-heap on "worst first" (O(log k) per update, two
  * parallel primitive arrays, zero allocation on the hot path).
  */
case class TopKAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Heap] {

  override def prettyName: String = "graft_topk"
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType), StructField("score", DoubleType))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreExpr.dataType == DoubleType && idExpr.dataType == LongType && k > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double score, long id, k > 0), got " +
        s"(${scoreExpr.dataType.simpleString}, ${idExpr.dataType.simpleString}, k=$k)")

  override def createAggregationBuffer(): TopKAgg.Heap = new TopKAgg.Heap(k)

  override def update(buf: TopKAgg.Heap, input: InternalRow): TopKAgg.Heap = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKAgg.Heap, b: TopKAgg.Heap): TopKAgg.Heap = {
    var j = 0
    while (j < b.size) { a.offer(b.scores(j), b.ids(j)); j += 1 }
    a
  }

  /** Best-first array of struct(id, score). */
  override def eval(buf: TopKAgg.Heap): Any = {
    val sorted = buf.sortedBestFirst()
    new GenericArrayData(sorted.map { case (id, sc) =>
      InternalRow(id, sc)
    })
  }

  override def serialize(buf: TopKAgg.Heap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var j = 0
    while (j < buf.size) { bb.putDouble(buf.scores(j)); bb.putLong(buf.ids(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Heap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val h = new TopKAgg.Heap(k)
    var j = 0
    while (j < n) { h.offer(bb.getDouble(), bb.getLong()); j += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = cs(0), idExpr = cs(1))
}

object TopKAgg {

  /** Fixed-capacity binary min-heap, worst element at the root so each
    * new candidate either replaces the current worst in O(log k) or is
    * rejected in O(1). "a worse than b" ⇔ lower score, or equal score
    * and larger id. */
  final class Heap(capacity: Int) {
    val scores = new Array[Double](capacity)
    val ids = new Array[Long](capacity)
    var size = 0

    // true iff (s1,i1) is worse than (s2,i2)
    private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      s1 < s2 || (s1 == s2 && i1 > i2)

    def offer(s: Double, id: Long): Unit = {
      if (size < capacity) {
        var i = size
        scores(i) = s; ids(i) = id; size += 1
        // sift up: parent must be worse than (or equal to) child
        while (i > 0 && worse(s, id, scores((i - 1) / 2), ids((i - 1) / 2))) {
          val p = (i - 1) / 2
          scores(i) = scores(p); ids(i) = ids(p)
          scores(p) = s; ids(p) = id
          i = p
        }
      } else if (capacity > 0 && worse(scores(0), ids(0), s, id)) {
        // beats the current worst: replace root, sift down
        scores(0) = s; ids(0) = id
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1; val r = l + 1
          var m = i
          if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
          if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
          if (m == i) done = true
          else {
            val ts = scores(i); val ti = ids(i)
            scores(i) = scores(m); ids(i) = ids(m)
            scores(m) = ts; ids(m) = ti
            i = m
          }
        }
      }
    }

    def sortedBestFirst(): Array[(Long, Double)] = {
      val out = (0 until size).map(j => (ids(j), scores(j))).toArray
      out.sortWith { case ((i1, s1), (i2, s2)) => s1 > s2 || (s1 == s2 && i1 < i2) }
    }
  }

  /** Registry builder: `graft_topk(score, id, k)` with foldable k. */
  private[functions] def build(es: Seq[Expression]): Expression = {
    require(es.length == 3, "graft_topk(score, id, k) takes three arguments")
    val k = es(2).eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(s"k must be a literal int, got $other")
    }
    TopKAgg(es(0), es(1), k)
  }

  /** Column API: bounded top-k aggregate → array<struct<id, score>>, best first. */
  def topk(spark: org.apache.spark.sql.SparkSession,
           score: org.apache.spark.sql.Column, id: org.apache.spark.sql.Column,
           k: Int): org.apache.spark.sql.Column = {
    GraftFunctions.register(spark)
    org.apache.spark.sql.functions.call_function("graft_topk",
      score, id, org.apache.spark.sql.functions.lit(k))
  }
}

/** [[TopKAgg]] with a STRING payload: per group keep the `k` best
  * `(score, term)` pairs — highest score first, ties toward the
  * lexicographically-smallest term (binary UTF-8 order, = SQL string
  * ordering). Replaces the `row_number() OVER (PARTITION BY doc ORDER
  * BY score DESC, term ASC) <= k` pattern, which re-shuffles and fully
  * SORTS every scored row; the aggregate's map-side partials bound the
  * exchange at k·|groups| rows — the per-document top-k-keywords shape
  * at corpus scale. */
case class TopKStrAgg(
    scoreExpr: Expression,
    strExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStrAgg.Heap] {

  override def prettyName: String = "graft_topk_str"
  override def children: Seq[Expression] = Seq(scoreExpr, strExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType), StructField("score", DoubleType))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreExpr.dataType == DoubleType && strExpr.dataType == StringType && k > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double score, string term, k > 0), got " +
        s"(${scoreExpr.dataType.simpleString}, ${strExpr.dataType.simpleString}, k=$k)")

  override def createAggregationBuffer(): TopKStrAgg.Heap = new TopKStrAgg.Heap(k)

  override def update(buf: TopKStrAgg.Heap, input: InternalRow): TopKStrAgg.Heap = {
    val s = scoreExpr.eval(input)
    val t = strExpr.eval(input)
    if (s != null && t != null)
      // clone: eval hands back a UTF8String view into a reused row buffer
      buf.offer(s.asInstanceOf[Double],
        t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].clone())
    buf
  }

  override def merge(a: TopKStrAgg.Heap, b: TopKStrAgg.Heap): TopKStrAgg.Heap = {
    var j = 0
    while (j < b.size) { a.offer(b.scores(j), b.terms(j)); j += 1 }
    a
  }

  /** Best-first array of struct(term, score). */
  override def eval(buf: TopKStrAgg.Heap): Any = {
    val sorted = buf.sortedBestFirst()
    new GenericArrayData(sorted.map { case (t, sc) => InternalRow(t, sc) })
  }

  override def serialize(buf: TopKStrAgg.Heap): Array[Byte] = {
    var bytes = 4
    var j = 0
    while (j < buf.size) { bytes += 12 + buf.terms(j).numBytes(); j += 1 }
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    j = 0
    while (j < buf.size) {
      bb.putDouble(buf.scores(j))
      val tb = buf.terms(j).getBytes
      bb.putInt(tb.length); bb.put(tb)
      j += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKStrAgg.Heap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val h = new TopKStrAgg.Heap(k)
    var j = 0
    while (j < n) {
      val s = bb.getDouble()
      val len = bb.getInt()
      val tb = new Array[Byte](len); bb.get(tb)
      h.offer(s, org.apache.spark.unsafe.types.UTF8String.fromBytes(tb))
      j += 1
    }
    h
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKStrAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKStrAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = cs(0), strExpr = cs(1))
}

object TopKStrAgg {
  import org.apache.spark.unsafe.types.UTF8String

  /** Min-heap on "worst first" — worse ⇔ lower score, or equal score
    * and lexicographically LARGER term (see [[TopKAgg.Heap]]). */
  final class Heap(capacity: Int) {
    val scores = new Array[Double](capacity)
    val terms = new Array[UTF8String](capacity)
    var size = 0

    private def worse(s1: Double, t1: UTF8String, s2: Double, t2: UTF8String): Boolean =
      s1 < s2 || (s1 == s2 && t1.compareTo(t2) > 0)

    def offer(s: Double, t: UTF8String): Unit = {
      if (size < capacity) {
        var i = size
        scores(i) = s; terms(i) = t; size += 1
        while (i > 0 && worse(s, t, scores((i - 1) / 2), terms((i - 1) / 2))) {
          val p = (i - 1) / 2
          scores(i) = scores(p); terms(i) = terms(p)
          scores(p) = s; terms(p) = t
          i = p
        }
      } else if (capacity > 0 && worse(scores(0), terms(0), s, t)) {
        scores(0) = s; terms(0) = t
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1; val r = l + 1
          var m = i
          if (l < size && worse(scores(l), terms(l), scores(m), terms(m))) m = l
          if (r < size && worse(scores(r), terms(r), scores(m), terms(m))) m = r
          if (m == i) done = true
          else {
            val ts = scores(i); val tt = terms(i)
            scores(i) = scores(m); terms(i) = terms(m)
            scores(m) = ts; terms(m) = tt
            i = m
          }
        }
      }
    }

    def sortedBestFirst(): Array[(UTF8String, Double)] = {
      val out = (0 until size).map(j => (terms(j), scores(j))).toArray
      out.sortWith { case ((t1, s1), (t2, s2)) =>
        s1 > s2 || (s1 == s2 && t1.compareTo(t2) < 0) }
    }
  }

  /** Registry builder: `graft_topk_str(score, term, k)` with foldable k. */
  private[functions] def build(es: Seq[Expression]): Expression = {
    require(es.length == 3, "graft_topk_str(score, term, k) takes three arguments")
    val k = es(2).eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(s"k must be a literal int, got $other")
    }
    TopKStrAgg(es(0), es(1), k)
  }

  /** Column API: bounded top-k aggregate → array<struct<term, score>>, best first. */
  def topk(spark: org.apache.spark.sql.SparkSession,
           score: org.apache.spark.sql.Column, term: org.apache.spark.sql.Column,
           k: Int): org.apache.spark.sql.Column = {
    GraftFunctions.register(spark)
    org.apache.spark.sql.functions.call_function("graft_topk_str",
      score, term, org.apache.spark.sql.functions.lit(k))
  }
}
