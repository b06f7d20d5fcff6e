package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k minimum values) distinct-bottom-k aggregate:
  * `kmv_sketch(hash, k)` returns the k smallest DISTINCT hash values seen,
  * ascending. This is the buildable half of the KMV cardinality /
  * set-overlap sketch: the k-th smallest of n uniform hashes sits near
  * k/n of the hash range, so the sketch supports |A|, |A∪B| (bottom-k of
  * the merged sketches) and |A∩B| (overlap of the union sketch with both
  * sides) estimates — and sketches of PARTS max-merge into the sketch of
  * the WHOLE.
  *
  * The aggregate is duplicate-aware (a TreeSet buffer), which is the
  * whole scale point: a plain `distinct` + global bottom-k would shuffle
  * the full key domain, while this keeps ≤ k values per map partition and
  * dedups again at merge — the sketch never sees more than k·partitions
  * rows after the map side, regardless of input row count or key
  * cardinality. Null hashes are skipped like every SQL aggregate skips
  * null inputs.
  */
case class KmvSketch(
    hash: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  // k must be a literal: it shapes the buffer, not the data
  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def add(buf: mutable.TreeSet[Long], v: Long): Unit = {
    buf.add(v)
    if (buf.size > k) buf.remove(buf.last)
  }

  override def update(
      buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val h = hash.eval(input)
    if (h != null) add(buf, h.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: mutable.TreeSet[Long],
      other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray[Any])

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add(bb.getLong))
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType == LongType && kExpr.dataType == IntegerType &&
      kExpr.foldable) {
      // k = 0 (or negative) would silently return empty sketches from
      // every group; reject at analysis time with a clear message.
      val kVal = kExpr.eval()
      if (kVal != null && kVal.asInstanceOf[Number].intValue() >= 1)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires k >= 1, got $kVal")
    } else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, literal int), got " +
        s"(${hash.dataType.sql}, ${kExpr.dataType.sql})")

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(hash, kExpr)
  override def prettyName: String = "kmv_sketch"

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0), kExpr = newChildren(1))
}
