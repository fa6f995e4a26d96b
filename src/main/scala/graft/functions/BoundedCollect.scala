package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Size-capped `collect_list(struct(id, aux))` with NULL-on-overflow: per
  * group, gather `(long, long)` pairs while the group's TOTAL count stays
  * ≤ `cap`; one element past the cap and the group evaluates to NULL
  * (entries stop being stored, only the counter advances).
  *
  * This is the inverted-index primitive: "give me each key's posting
  * list, unless the key is hot, in which case drop it" — expressed as
  * ONE aggregation with O(cap) state per group. It replaces the
  * three-pass shape (count-aggregate → broadcast anti-join of the hot
  * list → collect/join of survivors), which shuffles the full posting
  * table twice more. Map-side partial aggregation applies: a partial
  * buffer never exceeds cap entries + one counter, and merging two
  * overflowed buffers is O(1).
  */
case class BoundedCollectAgg(
    idExpr: Expression,
    auxExpr: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedCollectAgg.Buf] {

  override def prettyName: String = "graft_bounded_collect"
  override def children: Seq[Expression] = Seq(idExpr, auxExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType), StructField("aux", LongType))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (idExpr.dataType == LongType && auxExpr.dataType == LongType && cap > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (long id, long aux, cap > 0), got " +
        s"(${idExpr.dataType.simpleString}, ${auxExpr.dataType.simpleString}, cap=$cap)")

  override def createAggregationBuffer(): BoundedCollectAgg.Buf =
    new BoundedCollectAgg.Buf(cap)

  override def update(buf: BoundedCollectAgg.Buf, input: InternalRow): BoundedCollectAgg.Buf = {
    val i = idExpr.eval(input)
    val a = auxExpr.eval(input)
    if (i != null && a != null)
      buf.add(i.asInstanceOf[Long], a.asInstanceOf[Long])
    buf
  }

  override def merge(a: BoundedCollectAgg.Buf, b: BoundedCollectAgg.Buf): BoundedCollectAgg.Buf = {
    a.total += b.total
    if (a.total <= cap) { // both sides under cap → all entries are stored
      a.ensure(a.size + b.size)
      var j = 0
      while (j < b.size) { a.ids(a.size) = b.ids(j); a.auxs(a.size) = b.auxs(j); a.size += 1; j += 1 }
    }
    a
  }

  /** Array of struct(id, aux), or NULL when the group exceeded the cap. */
  override def eval(buf: BoundedCollectAgg.Buf): Any =
    if (buf.total > cap) null
    else {
      val out = new Array[Any](buf.size)
      var j = 0
      while (j < buf.size) { out(j) = InternalRow(buf.ids(j), buf.auxs(j)); j += 1 }
      new GenericArrayData(out)
    }

  override def serialize(buf: BoundedCollectAgg.Buf): Array[Byte] = {
    // an overflowed buffer ships only its counter — hot groups cost 12
    // bytes on the wire no matter how hot
    val n = if (buf.total > cap) 0 else buf.size
    val bb = java.nio.ByteBuffer.allocate(12 + 16 * n)
    bb.putLong(buf.total); bb.putInt(n)
    var j = 0
    while (j < n) { bb.putLong(buf.ids(j)); bb.putLong(buf.auxs(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedCollectAgg.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new BoundedCollectAgg.Buf(cap)
    buf.total = bb.getLong()
    val n = bb.getInt()
    buf.ensure(n)
    var j = 0
    while (j < n) { buf.ids(j) = bb.getLong(); buf.auxs(j) = bb.getLong(); j += 1 }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): BoundedCollectAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BoundedCollectAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(idExpr = cs(0), auxExpr = cs(1))
}

object BoundedCollectAgg {

  /** `total` counts every offer; entries are stored only while
    * `total ≤ cap`, so state is O(cap) regardless of group size.
    *
    * Storage grows geometrically from 8 slots instead of pre-allocating
    * `cap`: with ~10⁵-10⁶ concurrent groups per partition (one per
    * distinct gram) and typical posting lists of 2-10 entries, eager
    * `cap`-sized arrays were ~16 KB of allocation churn PER GROUP
    * (~0.5 s of the jaccard pipeline at sf0.1 was this allocator
    * traffic; at 100 TB it's partial-aggregate heap pressure). */
  final class Buf(capacity: Int) {
    var ids = new Array[Long](math.min(capacity, 8))
    var auxs = new Array[Long](math.min(capacity, 8))
    var size = 0
    var total = 0L

    def ensure(n: Int): Unit = if (n > ids.length) {
      val next = math.min(capacity, math.max(n, ids.length * 2))
      ids = java.util.Arrays.copyOf(ids, next)
      auxs = java.util.Arrays.copyOf(auxs, next)
    }

    def add(id: Long, aux: Long): Unit = {
      total += 1
      if (total <= capacity) {
        ensure(size + 1)
        ids(size) = id; auxs(size) = aux; size += 1
      }
    }
  }

  /** Registry builder: `graft_bounded_collect(id, aux, cap)`, foldable cap. */
  private[functions] def build(es: Seq[Expression]): Expression = {
    require(es.length == 3, "graft_bounded_collect(id, aux, cap) takes three arguments")
    val cap = es(2).eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(s"cap must be a literal int, got $other")
    }
    BoundedCollectAgg(es(0), es(1), cap)
  }

  /** Column API: capped posting list → array<struct<id, aux>> (NULL when
    * the group's total count exceeds `cap`). */
  def boundedCollect(spark: org.apache.spark.sql.SparkSession,
                     id: org.apache.spark.sql.Column, aux: org.apache.spark.sql.Column,
                     cap: Int): org.apache.spark.sql.Column = {
    GraftFunctions.register(spark)
    org.apache.spark.sql.functions.call_function("graft_bounded_collect",
      id, aux, org.apache.spark.sql.functions.lit(cap))
  }
}
