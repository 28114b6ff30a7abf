package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** KMV ("k minimum values") theta sketch for distinct-count estimation —
  * the classic bottom-k construction (Bar-Yossef et al., "Counting
  * distinct elements in a data stream"; the same estimator family as
  * Apache DataSketches theta). The sketch keeps the k smallest DISTINCT
  * 64-bit hash values seen; with fewer than k distinct hashes it is an
  * exact distinct set, otherwise ndv ≈ (k-1)/x₍ₖ₎ where x₍ₖ₎ is the kth
  * smallest hash as a fraction of 2⁶⁴. Union = merge the sets, keep the
  * k smallest — associative, commutative, order-independent, so the
  * distributed partial/final aggregation is deterministic.
  *
  * Inputs are PRE-HASHED longs: callers feed `xxhash64(col)` so hashing
  * stays inside whole-stage codegen and one sketch implementation covers
  * every input type. Standard error at k=2048 is ~1/√k ≈ 2.2%.
  *
  * Serialized layout ("graft-theta-v1", the blob payload recorded in
  * statistics puffin files): magic GTH1, version u8, k i32, n i32, then
  * n sorted longs (sign-flipped so signed order == unsigned hash order).
  */
final class KmvSketch(val k: Int) extends Serializable {
  require(k >= 16, s"KmvSketch: k must be >= 16, got $k")
  // Sorted-ascending distinct values u = hash ^ Long.MinValue: natural
  // signed order of u equals unsigned order of the hash, so vals(n-1) is
  // the kth smallest hash at capacity. A primitive sorted array replaces
  // the round-18 TreeSet[java.lang.Long] (round 19, guide §"per-task
  // work"): at capacity the overwhelmingly common case is REJECT, which
  // is now one primitive compare against the last slot instead of a
  // boxed TreeSet.last() tree walk — and accepted inserts (only
  // ~k·ln(n/k) over a whole stream) pay one binarySearch + arraycopy.
  // The k-smallest-distinct SET is identical, so estimates, serialized
  // bytes and merges are byte-for-byte unchanged.
  private[functions] var vals = new Array[Long](math.min(k, 64))
  private[functions] var n = 0

  private def insert(u: Long): Unit = {
    var idx = java.util.Arrays.binarySearch(vals, 0, n, u)
    if (idx >= 0) return // already present — KMV keeps DISTINCT values
    idx = -idx - 1
    if (n < k) {
      if (n == vals.length)
        vals = java.util.Arrays.copyOf(vals, math.min(k, vals.length * 2))
      System.arraycopy(vals, idx, vals, idx + 1, n - idx)
      vals(idx) = u
      n += 1
    } else {
      // caller guarantees u < vals(n-1): the largest value falls off
      System.arraycopy(vals, idx, vals, idx + 1, n - idx - 1)
      vals(idx) = u
    }
  }

  def update(hash: Long): Unit = {
    val u = hash ^ Long.MinValue
    if (n < k || u < vals(n - 1)) insert(u)
  }

  def merge(other: KmvSketch): KmvSketch = {
    // self-merge guard (ADVICE r19): iterating other.vals while insert()
    // arraycopies this.vals would corrupt the sketch if other aliases
    // this. Spark never aliases merge buffers, but KmvSketch is also
    // used directly (IcebergWriter stats).
    if (other eq this) return this
    var i = 0
    while (i < other.n) {
      val u = other.vals(i)
      if (n < k) insert(u)
      else if (u < vals(n - 1)) insert(u)
      else return this // other's values are sorted ascending: rest can't qualify
      i += 1
    }
    this
  }

  /** Distinct-count estimate: exact below k, (k-1)/x₍ₖ₎ at capacity. */
  def estimate: Long =
    if (n < k) n.toLong
    else {
      // kth smallest hash as a fraction of the full 64-bit space
      val u = vals(n - 1)
      val frac = (u.toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)
      math.max(k.toLong, math.rint((k - 1).toDouble / frac).toLong)
    }

  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 1 + 4 + 4 + 8 * n)
    buf.put(KmvSketch.Magic)
    buf.put(1.toByte)
    buf.putInt(k)
    buf.putInt(n)
    var i = 0
    while (i < n) { buf.putLong(vals(i)); i += 1 }
    buf.array()
  }
}

object KmvSketch {
  // 32 KB per sketch; standard error 1/√k ≈ 1.6% — comfortably inside
  // the 5% accuracy gate at any scale while staying broadcast-trivial
  val DefaultK = 4096
  private[functions] val Magic = Array[Byte]('G', 'T', 'H', '1')

  def deserialize(bytes: Array[Byte]): KmvSketch = {
    val buf = ByteBuffer.wrap(bytes)
    val magic = new Array[Byte](4)
    buf.get(magic)
    require(magic.sameElements(Magic), "not a graft-theta-v1 sketch (bad magic)")
    require(buf.get() == 1, "unsupported graft-theta version")
    val sk = new KmvSketch(buf.getInt)
    val n = buf.getInt
    // the v1 layout stores sorted distinct values, but insert() tolerates
    // any order/duplicates from a foreign writer
    var i = 0
    while (i < n) { sk.update(buf.getLong ^ Long.MinValue); i += 1 }
    sk
  }

  /** Estimate straight from serialized bytes (metadata consumers). */
  def estimateFrom(bytes: Array[Byte]): Long = deserialize(bytes).estimate
}

/** Aggregate function `graft_theta(hash)` → serialized KMV sketch
  * (BinaryType). The child must be a LongType hash (`xxhash64(col)`);
  * nulls are skipped, so `when(col.isNotNull, xxhash64(col))` yields
  * null-excluding NDV semantics. Partial aggregation is map-side (each
  * task builds a bounded k-entry sketch; only sketches shuffle), so a
  * full-table analyze moves O(partitions × k) longs, not rows. */
case class ThetaSketchAgg(
    child: Expression,
    k: Int = KmvSketch.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketch] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_theta expects a LongType hash (use xxhash64), got ${child.dataType.sql}")

  override def createAggregationBuffer(): KmvSketch = new KmvSketch(k)

  override def update(buffer: KmvSketch, input: InternalRow): KmvSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvSketch, other: KmvSketch): KmvSketch =
    buffer.merge(other)

  override def eval(buffer: KmvSketch): Any = buffer.serialize()

  override def serialize(buffer: KmvSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): KmvSketch =
    KmvSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_theta"
}
