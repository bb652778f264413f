package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Size-bounded per-group top-k aggregate: keeps the `k` best
  * (score DESC, id ASC) pairs of a group in a bounded binary heap —
  * O(k) memory per group at EVERY phase, including the map-side
  * partial.
  *
  * Why it exists: the previous two-phase top-k
  * (`collect_list` → `sort_array` → `slice` per (group, partition),
  * then a window rank) materializes EVERY scored row of a
  * group-partition in the partial aggregation buffer before slicing.
  * Correct, but memory-unbounded: the s17 exact label-noise screen at
  * a 20k-vector corpus puts ~400M scored rows through those partial
  * lists at once and OOMs the default 8 GiB fork (BASELINE.md, s17
  * scale probe). This aggregate's partial state never exceeds k
  * entries per group, so the same query runs in bounded memory and
  * the shuffled partial frame is ≤ k·|partitions| rows per group —
  * the groupBy analog of what TakeOrderedAndProject does for a global
  * limit, now with the bound enforced in the buffer itself.
  *
  * Semantics contract (the s1 family ordering): rank by score
  * descending, ties by id ascending. Scores are BIGINT (the family's
  * e6-rounded cosine contract) — integer comparison sidesteps the
  * ±0.0 / NaN total-order divergence between engines entirely. Rows
  * with a NULL score or NULL id are ignored (a null cosine carries no
  * rank; callers gate zero-norm vectors upstream). Result: array of
  * (score, id) structs sorted best-first; empty array for a group
  * with no rankable rows (the caller's explode drops it).
  */
case class BoundedTopK(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedTopK.Buffer] {

  require(k >= 1, "bounded_top_k needs k >= 1")

  override def children: Seq[Expression] = Seq(score, id)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType == LongType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bounded_top_k expects (bigint score, bigint id), got " +
          s"${score.dataType} / ${id.dataType}")

  override def createAggregationBuffer(): BoundedTopK.Buffer =
    new BoundedTopK.Buffer(k)

  override def update(
      buffer: BoundedTopK.Buffer, input: InternalRow): BoundedTopK.Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.offer(s.asInstanceOf[Long], i.asInstanceOf[Long])
    buffer
  }

  override def merge(
      buffer: BoundedTopK.Buffer,
      other: BoundedTopK.Buffer): BoundedTopK.Buffer = {
    buffer.absorb(other)
    buffer
  }

  override def eval(buffer: BoundedTopK.Buffer): Any = {
    val sorted = buffer.sortedBestFirst()
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i): Any
    })
  }

  override def serialize(buffer: BoundedTopK.Buffer): Array[Byte] = {
    val n = buffer.size
    val bb = ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    buffer.foreach { (s, i) => bb.putLong(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopK.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new BoundedTopK.Buffer(k)
    var j = 0
    while (j < n) {
      buf.offer(bb.getLong, bb.getLong)
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "bounded_top_k"
}

object BoundedTopK {

  /** Bounded binary max-heap on "badness": the root is the WORST kept
    * entry under (score DESC, id ASC), so a full heap admits a new
    * entry only by evicting the root. Flat paired-long storage — no
    * per-entry boxing in the aggregation hot loop. */
  final class Buffer(k: Int) {
    // entry j lives at scores(j) / ids(j); heap-ordered, root at 0
    private val scores = new Array[Long](k)
    private val ids = new Array[Long](k)
    private var n = 0

    def size: Int = n

    // a is WORSE than b under (score DESC, id ASC)
    @inline private def worse(
        sa: Long, ia: Long, sb: Long, ib: Long): Boolean =
      sa < sb || (sa == sb && ia > ib)

    def offer(s: Long, i: Long): Unit = {
      if (n < k) {
        scores(n) = s; ids(n) = i
        n += 1
        siftUp(n - 1)
      } else if (worse(scores(0), ids(0), s, i)) {
        scores(0) = s; ids(0) = i
        siftDown(0)
      }
    }

    def absorb(other: Buffer): Unit = other.foreach(offer)

    def foreach(f: (Long, Long) => Unit): Unit = {
      var j = 0
      while (j < n) { f(scores(j), ids(j)); j += 1 }
    }

    def sortedBestFirst(): Array[(Long, Long)] = {
      val out = new Array[(Long, Long)](n)
      var j = 0
      while (j < n) { out(j) = (scores(j), ids(j)); j += 1 }
      scala.util.Sorting.stableSort(out,
        (a: (Long, Long), b: (Long, Long)) =>
          a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
      out
    }

    private def siftUp(start: Int): Unit = {
      var j = start
      while (j > 0) {
        val p = (j - 1) / 2
        if (worse(scores(j), ids(j), scores(p), ids(p))) {
          swap(j, p); j = p
        } else return
      }
    }

    private def siftDown(start: Int): Unit = {
      var j = start
      while (true) {
        val l = 2 * j + 1
        val r = l + 1
        var worst = j
        if (l < n && worse(scores(l), ids(l), scores(worst), ids(worst)))
          worst = l
        if (r < n && worse(scores(r), ids(r), scores(worst), ids(worst)))
          worst = r
        if (worst == j) return
        swap(j, worst); j = worst
      }
    }

    @inline private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }
  }
}
