package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/**
 * Fixed-size Bloom filter over 64-bit keys as a Catalyst
 * `TypedImperativeAggregate`.
 *
 * The 100 TB join-pruning pattern: build the filter over the SMALL side's
 * keys (one pass, fixed `numBits/8` bytes of state per partial, merged by
 * bitwise OR — so the shuffle carries one filter per partition, never the
 * keys), broadcast the finished filter, and prefilter the BIG side with
 * [[Bloom.mightContain]] BEFORE its shuffle. No false negatives, so an
 * exact verify join on the survivors reproduces the exact join result
 * while the big side ships only `true-matches + fp-rate * n` rows.
 * (Spark's own runtime row-level filtering makes the same move
 * automatically for equi-joins; doing it explicitly keeps the filter
 * reusable across queries and composable with non-equi verify logic.
 * Spark also ships `df.stat.bloomFilter` — not reused here because it
 * builds via a driver-side `treeAggregate` outside Catalyst: no SQL
 * surface, no partial/final aggregation inside a plan, and no use as a
 * grouped aggregate. This expression is registrable (`bloom_agg` in
 * [[GraftFunctions]]), plans like any other aggregate, and its probe is
 * a zero-copy word-array test against the broadcast.)
 *
 * Bit positions follow the standard double-hashing scheme
 * (Kirsch & Mitzenmacher, "Less Hashing, Same Performance"):
 * `bit_i = (h1 + i*h2) mod numBits` with h1/h2 two independent mixes of
 * the key. `numBits` must be a power of two so the modulo is a mask.
 *
 * Output: the filter's bit array as `binary` (big-endian longs).
 */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    s"numBits must be a power of two >= 64, got $numBits")
  require(numHashes > 0, "numHashes must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_agg requires a bigint argument (hash keys first), got ${child.dataType}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Bloom.set(buf, numHashes, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = Bloom.toBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = Bloom.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    Bloom.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "bloom_agg"
}

object Bloom {

  /** `bloom_agg(keys, numBits, numHashes)` aggregate column over bigint
    * keys; returns the filter as `binary`. */
  def bloom_agg(c: Column, numBits: Int, numHashes: Int): Column =
    GraftShims.toColumn(
      BloomFilterAgg(GraftShims.toExpression(c), numBits, numHashes)
        .toAggregateExpression())

  // Two independent 64->64 mixes of the key (murmur3 fmix64 with distinct
  // pre-xor seeds). h2 is forced odd so the double-hash probe sequence
  // walks all of a power-of-two bit space.
  private def fmix64(v0: Long): Long = {
    var v = v0
    v ^= v >>> 33; v *= 0xff51afd7ed558ccdL
    v ^= v >>> 33; v *= 0xc4ceb9fe1a85ec53L
    v ^= v >>> 33
    v
  }

  private[functions] def set(words: Array[Long], numHashes: Int, key: Long): Unit = {
    val mask = (words.length.toLong << 6) - 1
    val h1 = fmix64(key ^ 0x9e3779b97f4a7c15L)
    val h2 = fmix64(key ^ 0x6a09e667f3bcc909L) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = (h1 + i * h2) & mask
      words((bit >>> 6).toInt) |= 1L << (bit & 63)
      i += 1
    }
  }

  /** Probe — shares the exact hashing with the build side, so an inserted
    * key can never read false. */
  def mightContain(words: Array[Long], numHashes: Int, key: Long): Boolean = {
    val mask = (words.length.toLong << 6) - 1
    val h1 = fmix64(key ^ 0x9e3779b97f4a7c15L)
    val h2 = fmix64(key ^ 0x6a09e667f3bcc909L) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = (h1 + i * h2) & mask
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  private[functions] def toBytes(words: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
    bb.asLongBuffer().put(words)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val words = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(words)
    words
  }
}
