package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Native top-k-per-group aggregate: keeps the k best (key, payload) pairs
  * under the total order "key descending, then payload ascending" and
  * returns them best-first as `array<struct<key: double, payload: bigint>>`.
  *
  * This is the AGGREGATE form of grouped top-k. The declarative form —
  * `row_number() OVER (PARTITION BY g ORDER BY key DESC, payload)` then
  * `rank <= k` — must shuffle EVERY row to its group's partition and sort
  * the whole group before discarding all but k rows. As a
  * TypedImperativeAggregate this runs inside ObjectHashAggregate with a
  * partial/final split: each map task reduces its rows to at most k pairs
  * per group locally, and only those k-row buffers cross the wire. At
  * 100 TB with, say, 10^6 groups and k=3, the exchange carries ~48 MB of
  * buffers instead of the full fact table — the same reduction the engine's
  * [[graft.ml.TopKMinAggregator]] achieves for the ungrouped threshold
  * (T1/M5), generalized to per-group rows and exposed to SQL callers as
  * `graft_topk(key, payload, k)` via [[graft.GraftExtensions]].
  *
  * Determinism: the kept SET is unique for any merge order because the
  * order is total (payload breaks key ties; duplicate (key, payload) pairs
  * are interchangeable). NULL keys and NULL payloads are skipped, matching
  * SQL aggregate null semantics; a group with no non-null input yields an
  * empty array, so an explode downstream drops it — exactly the rows the
  * window form's `WHERE rank <= k` keeps.
  *
  * Buffer is a worst-at-head binary heap of primitive pairs: update is
  * O(log k) with an O(1) reject of rows worse than the current k-th,
  * merge drains the smaller heap into the larger, serialization is
  * 4 + 16·|kept| bytes.
  */
case class TopKRows(left: Expression, right: Expression, k: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKRows.Buffer] with BinaryLike[Expression] {

  require(k >= 1 && k <= TopKRows.maxK, s"k must be in [1, ${TopKRows.maxK}], got $k")

  def key: Expression = left
  def payload: Expression = right

  override def prettyName: String = "graft_topk"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", DoubleType, nullable = false),
      StructField("payload", LongType, nullable = false))),
    containsNull = false)

  /** SQL callers reach this unchecked via GraftExtensions (the builder
    * casts, but a non-castable argument still lands here): gate to the
    * exact primitive types the buffer stores. */
  override def checkInputDataTypes(): TypeCheckResult =
    (key.dataType, payload.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (kt, pt) => TypeCheckResult.TypeCheckFailure(
        s"graft_topk requires (double, bigint) arguments, got (${kt.sql}, ${pt.sql})")
    }

  override def createAggregationBuffer(): TopKRows.Buffer = new TopKRows.Buffer(k)

  override def update(buf: TopKRows.Buffer, input: InternalRow): TopKRows.Buffer = {
    val kv = key.eval(input)
    if (kv != null) {
      val pv = payload.eval(input)
      if (pv != null) buf.offer(kv.asInstanceOf[Double], pv.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: TopKRows.Buffer, b: TopKRows.Buffer): TopKRows.Buffer =
    a.absorb(b)

  override def eval(buf: TopKRows.Buffer): Any = {
    val bestFirst = buf.sortedBestFirst
    new GenericArrayData(bestFirst.map { case (kv, pv) =>
      InternalRow(kv, pv)
    })
  }

  override def serialize(buf: TopKRows.Buffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKRows.Buffer =
    TopKRows.Buffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKRows =
    copy(left = newLeft, right = newRight)
}

object TopKRows {
  import org.apache.spark.sql.GraftBridge

  /** Buffers live per group in the hash map — cap k so a typo'd literal
    * cannot ask for gigabyte buffers. */
  val maxK: Int = 1 << 20

  /** `a` strictly worse than `b` under "key desc, payload asc"? */
  private def worse(ka: Double, pa: Long, kb: Double, pb: Long): Boolean = {
    val c = java.lang.Double.compare(ka, kb)
    if (c != 0) c < 0 else pa > pb
  }

  /** Bounded worst-at-head binary heap over parallel primitive arrays. */
  final class Buffer(k: Int) {
    private var keys = new Array[Double](math.min(k, 16))
    private var pays = new Array[Long](math.min(k, 16))
    private var n = 0

    def size: Int = n

    def offer(kv: Double, pv: Long): Unit = {
      if (n < k) {
        if (n == keys.length) grow()
        keys(n) = kv; pays(n) = pv; n += 1
        siftUp(n - 1)
      } else if (worse(keys(0), pays(0), kv, pv)) {
        // strictly better than the current k-th: replace the head.
        // Equal pairs are interchangeable, so >= keeps the existing one.
        keys(0) = kv; pays(0) = pv
        siftDown(0)
      }
    }

    def absorb(other: Buffer): Buffer = {
      var i = 0
      while (i < other.n) { offer(other.keys(i), other.pays(i)); i += 1 }
      this
    }

    /** Best-first snapshot; does not disturb the heap (eval may not
      * destroy the buffer it is handed). */
    def sortedBestFirst: Array[(Double, Long)] = {
      val out = new Array[(Double, Long)](n)
      var i = 0
      while (i < n) { out(i) = (keys(i), pays(i)); i += 1 }
      scala.util.Sorting.stableSort(out,
        (a: (Double, Long), b: (Double, Long)) => worse(b._1, b._2, a._1, a._2))
      out
    }

    def toBytes: Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 16 * n)
      bb.putInt(n)
      var i = 0
      while (i < n) { bb.putDouble(keys(i)); bb.putLong(pays(i)); i += 1 }
      bb.array()
    }

    private def grow(): Unit = {
      val cap = math.min(k, math.max(16, keys.length * 2))
      keys = java.util.Arrays.copyOf(keys, cap)
      pays = java.util.Arrays.copyOf(pays, cap)
    }

    private def swap(i: Int, j: Int): Unit = {
      val tk = keys(i); keys(i) = keys(j); keys(j) = tk
      val tp = pays(i); pays(i) = pays(j); pays(j) = tp
    }

    // worst-at-head heap: parent is worse-or-equal than children
    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0) {
        val p = (i - 1) >>> 1
        if (worse(keys(i), pays(i), keys(p), pays(p))) { swap(i, p); i = p }
        else return
      }
    }

    private def siftDown(i0: Int): Unit = {
      var i = i0
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var w = i
        if (l < n && worse(keys(l), pays(l), keys(w), pays(w))) w = l
        if (r < n && worse(keys(r), pays(r), keys(w), pays(w))) w = r
        if (w == i) return
        swap(i, w); i = w
      }
    }
  }

  object Buffer {
    def fromBytes(k: Int, bytes: Array[Byte]): Buffer = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = new Buffer(k)
      var i = 0
      // heap-ordered on write, so re-offering rebuilds an equivalent heap
      while (i < n) { buf.offer(bb.getDouble, bb.getLong); i += 1 }
      buf
    }
  }

  /** Column-API form: `df.groupBy(g).agg(TopKRows.topK(key, id, 3))`. */
  def topK(key: Column, payload: Column, k: Int): Column =
    GraftBridge.column(TopKRows(
      GraftBridge.expression(key), GraftBridge.expression(payload), k)
      .toAggregateExpression())
}
