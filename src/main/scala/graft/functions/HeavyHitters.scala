package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/**
 * Misra-Gries heavy-hitters sketch as a Catalyst
 * `TypedImperativeAggregate`: at most `k` counters; every item with true
 * frequency > n/(k+1) is guaranteed to survive, and each reported count
 * undercounts by at most n/(k+1).
 *
 * Mergeable (Agarwal et al., "Mergeable Summaries"): partial sketches
 * combine by counter addition followed by the (k+1)-th-largest decrement —
 * so Catalyst's partial/final aggregation applies and the shuffle carries
 * at most k counters per partition regardless of input size. This is the
 * sketch path for "frequent items at 100 TB": one pass, fixed memory,
 * no exact groupBy over the full item domain.
 *
 * Output: `array<struct<item string, min_count long>>`, descending count
 * (ties by item), where `min_count` is the surviving (lower-bound) counter.
 */
case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("min_count", LongType, nullable = false))))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters requires a string argument, got ${child.dataType}")
    }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  /** Decrement all counters by the amount that empties the smallest ones
    * beyond capacity k (batch form of the decrement, for merges). */
  private def shrinkBatch(buf: mutable.HashMap[String, Long]): Unit = {
    if (buf.size > k) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val dec = counts(counts.length - k - 1) // (k+1)-th largest
      buf.filterInPlace((_, c) => c > dec)
      buf.mapValuesInPlace((_, c) => c - dec)
    }
  }

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.update(item, buf.getOrElse(item, 0L) + 1L)
      if (buf.size > k) {
        // classic per-row step: the just-inserted counter is 1, so the
        // (k+1)-th-largest is 1 — decrement all by 1, drop the zeros.
        // O(k), no sort/allocations on the scan hot path.
        buf.filterInPlace((_, c) => c > 1L)
        buf.mapValuesInPlace((_, c) => c - 1L)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (i, c) => buf.update(i, buf.getOrElse(i, 0L) + c) }
    shrinkBatch(buf)
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray
      .sortBy { case (i, c) => (-c, i) }
      .map { case (i, c) =>
        InternalRow(UTF8String.fromString(i), c)
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (i, c) =>
      val b = i.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "heavy_hitters"
}

object HeavyHitters {
  /** `heavy_hitters(c, k)` aggregate column. */
  def heavy_hitters(c: Column, k: Int): Column =
    GraftShims.toColumn(
      HeavyHittersAgg(GraftShims.toExpression(c), k).toAggregateExpression())
}
