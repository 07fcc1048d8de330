package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

/**
 * KMV (k-minimum-values) distinct sketch (Bar-Yossef et al. 2002;
 * Beyer et al., "On Synopses for Distinct-Value Estimation Under
 * Multiset Operations", SIGMOD 2007) as a Catalyst
 * `TypedImperativeAggregate`: the k smallest DISTINCT hash values of
 * the input, in unsigned 64-bit order.
 *
 * This is the sketch-family member HLL cannot replace: because the
 * synopsis is an order-preserving SAMPLE of the hashed universe (not a
 * lossy register array), two sketches support SET OPERATIONS — the
 * k-min of the union is computable from the two synopses alone, and the
 * fraction of those union k-mins present in both sketches estimates the
 * Jaccard similarity, hence intersection cardinality (Beyer et al. §4).
 * HLL registers only max-merge (union); intersection via
 * inclusion-exclusion on HLL estimates compounds the error badly at low
 * overlap.
 *
 * Mergeable: union the two k-min sets, keep the k smallest — associative
 * and commutative, so Catalyst's partial aggregation applies and the
 * shuffle carries at most k longs per group regardless of input size
 * (the 100 TB shape: no distinct-shuffle of the raw universe).
 *
 * Determinism: the synopsis is a pure function of the input VALUE SET —
 * no RNG, no order sensitivity (TreeSet dedups and orders) — so the
 * result is bit-identical at any parallelism and replays exactly in a
 * SQL oracle that ranks the same hash values.
 *
 * Output: `array<bigint>` of at most k distinct signed-64 hash values,
 * ascending in UNSIGNED order (the hash domain is [0, 2^64)).
 */
case class KmvAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmv_minhash requires a bigint (hash) argument, got ${child.dataType}")
    }

  private def newBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](new java.util.Comparator[java.lang.Long] {
      override def compare(a: java.lang.Long, b: java.lang.Long): Int =
        java.lang.Long.compareUnsigned(a, b)
    })

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    newBuffer()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (java.lang.Long.compareUnsigned(v, buf.last()) < 0) {
      // strictly below the current k-th min: displace it (TreeSet add
      // dedups, so equal values never grow the set)
      if (buf.add(v)) buf.pollLast()
      ()
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = newBuffer()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "kmv_minhash"
}

object Kmv {
  /** `kmv_minhash(hashCol, k)` aggregate column. */
  def kmv_minhash(c: Column, k: Int): Column =
    GraftShims.toColumn(
      KmvAgg(GraftShims.toExpression(c), k).toAggregateExpression())
}
