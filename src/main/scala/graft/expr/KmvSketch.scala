package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct sketch as a bounded aggregate: keeps
  * the `k` smallest DISTINCT non-null hash values of a group — the
  * classic theta-sketch substrate (Bar-Yossef et al. 2002; the
  * DataSketches theta family). O(k) state per group at EVERY phase
  * including the map-side partial; merge is a trimmed set union, so
  * the sketch is fully mergeable across partitions/sources without
  * ever re-touching the data.
  *
  * Why not HyperLogLog (`approx_count_distinct`): HLL estimates a
  * single distinct count; KMV additionally supports SET ALGEBRA
  * between sketches (union = merge; intersection / A-not-B by
  * inclusion-exclusion over the kth-minimum threshold), which is what
  * a corpus-overlap audit between sources needs. And unlike HLL's
  * engine-specific register layout, a KMV sketch over a PORTABLE hash
  * ([[graft.ext.Dedup.pmd5]], 60-bit md5) is exactly replayable in any
  * SQL engine as `ORDER BY h LIMIT k` over distinct hashes — so the
  * estimate itself can be hash-oracled, not just spot-checked.
  *
  * Estimator contract (engine-portable, IEEE-double): with
  * `n_kept = k` values kept and `kth` the largest kept value over the
  * hash domain `[0, 2^60)`, the distinct estimate is
  * `floor((k−1) · 2^60 / kth)` evaluated in IEEE doubles — the
  * `(k−1)·2^60` product is exact (≤ 8 significand bits on a power of
  * two), `kth` rounds to double nearest-even identically on every
  * IEEE engine, and the division rounds identically, so the floored
  * quotient is bit-portable (this is [[graft.ext.Kmv.estimate]]'s and
  * the d35/d36 DuckDB oracles' shared definition; NOTE it can differ
  * by 1 from exact integer division `(k-1)·2^60 div kth` once `kth`
  * exceeds 2^53 — the double contract is the normative one). With
  * `n_kept < k` the sketch holds EVERY distinct value and the
  * estimate is exact (= n_kept). Estimation happens in the caller
  * over the k-row array this aggregate returns — the aggregate itself
  * only maintains the bounded distinct set.
  *
  * Values outside `[0, 2^60)` are rejected at update time (the 60-bit
  * pmd5 contract is what makes the estimator's domain constant
  * portable); nulls are ignored.
  *
  * Result: array<long> of the kept values, ascending; empty array for
  * a group with no non-null input.
  */
case class KmvSketch(
    hash: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvSketch.Buffer] {

  // k >= 2 at the EXPRESSION level too (not just the Kmv.sketch / SQL
  // builder surfaces): the bottom-k estimator divides by k-1, so a
  // directly-constructed k=1 aggregate would silently estimate 0.
  require(k >= 2, "kmv_sketch needs k >= 2 (estimator divides by k-1)")

  override def children: Seq[Expression] = Seq(hash)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (hash.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch expects a bigint hash, got ${hash.dataType}")

  override def createAggregationBuffer(): KmvSketch.Buffer =
    new KmvSketch.Buffer(k)

  override def update(
      buffer: KmvSketch.Buffer, input: InternalRow): KmvSketch.Buffer = {
    val v = hash.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      require(h >= 0L && h < KmvSketch.HashDomain,
        s"kmv_sketch: hash $h outside the 60-bit pmd5 domain")
      buffer.offer(h)
    }
    buffer
  }

  override def merge(
      buffer: KmvSketch.Buffer, other: KmvSketch.Buffer): KmvSketch.Buffer = {
    buffer.absorb(other)
    buffer
  }

  override def eval(buffer: KmvSketch.Buffer): Any =
    new GenericArrayData(buffer.sortedAscending())

  override def serialize(buffer: KmvSketch.Buffer): Array[Byte] = {
    val vs = buffer.sortedAscending()
    val bb = ByteBuffer.allocate(4 + 8 * vs.length)
    bb.putInt(vs.length)
    vs.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvSketch.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvSketch.Buffer(k)
    var j = 0
    while (j < n) { buf.offer(bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(hash = newChildren(0))

  override def prettyName: String = "kmv_sketch"
}

object KmvSketch {

  /** Exclusive upper bound of the [[graft.ext.Dedup.pmd5]] hash domain
    * (60 bits). The estimator's scale constant — shared with the
    * DuckDB replay oracles so both engines divide by the same domain. */
  val HashDomain: Long = 1L << 60

  /** Bounded distinct set of the k smallest values. TreeSet keeps
    * membership + max in O(log k); k is a few hundred in practice so
    * the boxing cost is irrelevant next to the hash evaluation. */
  final class Buffer(k: Int) {
    private val set = new java.util.TreeSet[java.lang.Long]()

    def size: Int = set.size()

    def offer(v: Long): Unit = {
      if (set.size() < k) { set.add(v); () }
      else if (v < set.last() && !set.contains(v)) {
        set.pollLast()
        set.add(v)
        ()
      }
    }

    def absorb(other: Buffer): Unit = {
      val it = other.set.iterator()
      while (it.hasNext) offer(it.next())
    }

    def sortedAscending(): Array[Long] = {
      val out = new Array[Long](set.size())
      val it = set.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      out
    }
  }
}
