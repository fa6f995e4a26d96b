package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash sketch as a native Catalyst aggregate (the
  * `TypedImperativeAggregate` SURVEY §4 reserves for sketches): one
  * aggregation buffer of `k` longs per group, updated in place per input
  * row — replacing k parallel `min(xxhash64(j, col))` aggregate slots
  * with a single sketch whose update loop never allocates.
  *
  * Hash family: XxHash64 over the shingle's UTF-8 bytes with seed = j
  * for component j — k independent 64-bit functions from one base hash
  * routine (standard seeded-family construction).
  *
  * Merge is elementwise min, so the aggregate is commutative +
  * associative → map-side partial aggregation applies; the shuffle
  * carries one k-long sketch per group, not the shingle stream. This is
  * the 100 TB shape for signature building.
  */
case class MinHashAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def prettyName: String = "graft_minhash"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column and k > 0, got ${child.dataType.simpleString}, k=$k")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var j = 0
      while (j < k) {
        val h = XxHash64Function.hash(s, StringType, j.toLong)
        if (h < buf(j)) buf(j) = h
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < k) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(n: Int): MinHashAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MinHashAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

object MinHashAgg {
  /** Registry builder: `graft_minhash(col, k)` with foldable k. */
  private[functions] def build(es: Seq[Expression]): Expression = {
    require(es.length == 2, "graft_minhash(col, k) takes two arguments")
    val k = es(1).eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(s"k must be a literal int, got $other")
    }
    MinHashAgg(es.head, k)
  }

  /** Column API: `MinHashAgg.sketch(spark, shingleCol, k)` aggregate. */
  def sketch(spark: org.apache.spark.sql.SparkSession,
             col: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    GraftFunctions.register(spark)
    org.apache.spark.sql.functions.call_function("graft_minhash",
      col, org.apache.spark.sql.functions.lit(k))
  }
}
