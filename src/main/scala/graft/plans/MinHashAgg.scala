package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native aggregate: element-wise minimum of MinHash signature arrays.
  *
  * Aggregating per-document signatures with element-wise min yields
  * the signature of the UNION of the groups' shingle sets — so two
  * group signatures estimate cross-group Jaccard similarity by
  * component agreement, without ever shuffling shingle sets. Buffer
  * is a fixed k-long array: constant memory per group, merge is
  * associative+commutative → full map-side partial aggregation.
  */
case class MinHashAggExpr(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_agg"

  // Buffer layout: k minima + 1 seen-flag slot. A group whose inputs
  // were all NULL/absent must yield NULL (SQL MIN-of-empty semantics),
  // not an all-MaxValue signature that spuriously "agrees" with other
  // degenerate groups at Jaccard 1.0.
  override def createAggregationBuffer(): Array[Long] = {
    val b = Array.fill(k + 1)(Long.MaxValue)
    b(k) = 0L
    b
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(k, arr.numElements())
      var i = 0
      while (i < n) {
        val x = arr.getLong(i)
        if (x < buf(i)) buf(i) = x
        i += 1
      }
      buf(k) = 1L
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    if (b(k) == 1L) a(k) = 1L
    a
  }

  override def eval(buf: Array[Long]): Any =
    if (buf(k) == 0L) null else new GenericArrayData(java.util.Arrays.copyOf(buf, k))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * (k + 1))
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(k + 1)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAggExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAggExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): MinHashAggExpr =
    copy(child = cs.head)
}
