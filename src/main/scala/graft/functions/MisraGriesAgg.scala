package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary: at most k (item, count) counters per
  * aggregation state, mergeable (Agarwal et al. 2013, "Mergeable summaries"),
  * with the classic deterministic guarantees over a stream of n items:
  *
  *  - NO FALSE NEGATIVES above the threshold: every item with true
  *    frequency > n/(k+1) is present in the final summary;
  *  - BOUNDED UNDERCOUNT: every reported estimate e satisfies
  *    `true - n/(k+1) <= e <= true` (never an overcount).
  *
  * This is the 100 TB shape for "top tokens of the corpus": the exact
  * formulation shuffles every distinct token to count it; this aggregate
  * crosses the shuffle as at most k counters PER PARTITION and holds O(k)
  * state regardless of corpus or vocabulary size.
  *
  * The summary CONTENT (which sub-threshold items survive, and the exact
  * estimates) depends on partitioning and merge order — only the two
  * guarantees above are deterministic, so graded checks compare guarantees,
  * not raw summaries (see QueryCatalog's q_heavy_hitters).
  *
  * Update rule: hit → +1; miss with spare capacity → insert at 1; miss at
  * capacity → decrement ALL counters by 1, dropping zeros (one decrement
  * event "spends" k+1 stream items, hence the n/(k+1) bound).
  * Merge rule: sum counters pairwise, then if over capacity subtract the
  * (k+1)-th largest count from every counter and drop the non-positive.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, "misra-gries needs k > 0")

  override def checkInputDataTypes() = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"mg_summary needs a string item column, got ${other.catalogString}")
    }
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString // copy out of reused buffers
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k => buf.update(item, 1L)
        case None =>
          // decrement-all: amortized O(1) per stream item (each decrement
          // event pays for k+1 items), O(k) worst case on this call
          val dead = mutable.ArrayBuffer.empty[String]
          buf.foreach { case (key, c) =>
            if (c == 1L) dead += key else buf.update(key, c - 1)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (key, c) =>
      buf.update(key, buf.getOrElse(key, 0L) + c)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count; keeps <= k strictly-positive
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      buf.foreach { case (key, c) =>
        if (c - cut <= 0L) dead += key else buf.update(key, c - cut)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // deterministic presentation order (content itself is order-dependent)
    val sorted = buf.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), c))
    }.asInstanceOf[Array[Any]])
  }

  // length-prefixed raw UTF-8, not writeUTF: a single unbroken >64 KB
  // token (base64 blob, minified JS) would make writeUTF throw
  // UTFDataFormatException mid-shuffle
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    // bounds-check every length prefix against the buffer before
    // allocating: a corrupt shuffle frame would otherwise turn into an
    // arbitrary-sized Array[Byte] allocation (OOM) instead of a clean error
    require(n >= 0 && n <= k + 1,
      s"mg_summary: corrupt buffer — entry count $n outside [0, ${k + 1}]")
    var remaining = bytes.length - 4
    (0 until n).foreach { _ =>
      val len = in.readInt()
      remaining -= 4
      // Long compare: len + 8 as Int wraps negative for len near
      // Int.MaxValue and would pass the bound it exists to enforce
      require(len >= 0 && len.toLong + 8 <= remaining,
        s"mg_summary: corrupt buffer — token length $len exceeds remaining $remaining bytes")
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      remaining -= len + 8
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType), StructField("est", LongType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "mg_summary"
}
