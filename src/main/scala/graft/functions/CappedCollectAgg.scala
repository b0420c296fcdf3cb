package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Size-capped id-list aggregate for LSH bucket materialization.
  *
  * `collect_list` followed by a size filter is correct but not skew-proof:
  * a degenerate bucket (every near-empty document hashing to the same LSH
  * key) materializes its *entire* id list in one reducer before the filter
  * can drop it — at corpus scale that is an O(n) allocation on one task.
  * This aggregate keeps at most `cap + 1` ids per group *as its invariant
  * buffer bound* (update and merge both truncate), so per-group state is
  * O(cap) regardless of how hot the bucket is.
  *
  * Output: the id array when the group has between `minSize` and `cap`
  * members, NULL otherwise. The default `minSize = 2` is the candidate-pair
  * use (singleton buckets produce no pairs); `minSize = 1` keeps singleton
  * buckets — what a persisted LSH *index* needs, since a future ingest
  * batch can still collide with a so-far-lonely bucket. Over-full buckets
  * are non-discriminative hash collisions that standard LSH hygiene drops.
  */
case class CappedCollectAgg(
    id: Expression,
    cap: Int,
    minSize: Int = 2,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Long]] {

  require(minSize >= 1, "capped_collect needs minSize >= 1")
  require(cap >= minSize, "capped_collect needs cap >= minSize")

  // cap + 1 entries is enough to distinguish "exactly cap" from "over cap";
  // beyond that the bucket is dropped, so extra ids carry no information
  private val bound = cap + 1

  override def createAggregationBuffer(): mutable.ArrayBuffer[Long] =
    mutable.ArrayBuffer.empty[Long]

  override def update(buf: mutable.ArrayBuffer[Long], input: InternalRow): mutable.ArrayBuffer[Long] = {
    if (buf.size < bound) {
      val v = id.eval(input)
      if (v != null) buf += v.asInstanceOf[Long]
    }
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[Long],
                     other: mutable.ArrayBuffer[Long]): mutable.ArrayBuffer[Long] = {
    var i = 0
    while (buf.size < bound && i < other.size) { buf += other(i); i += 1 }
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[Long]): Any =
    if (buf.size < minSize || buf.size > cap) null
    else new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf += in.readLong())
    buf
  }

  override def dataType: DataType = ArrayType(LongType)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(id)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CappedCollectAgg =
    copy(id = newChildren(0))
  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "capped_collect"
}
