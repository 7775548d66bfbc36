package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** String-payload sibling of [[TopKRows]]: keeps the k best
  * (key: double, payload: string) pairs per group under the total order
  * "key descending, then payload ascending (binary)" and returns them
  * best-first as `array<struct<key: double, payload: string>>`. SQL:
  * `graft_topk_str(key, payload, k)`.
  *
  * Same partial/final ObjectHashAggregate economics as [[TopKRows]] —
  * each map task forwards ≤ k pairs per group, the exchange carries
  * k-row buffers — for the window shapes whose ranked entity is a
  * string (top term per doc, dominant domain per user, …).
  *
  * Payload ties compare on [[UTF8String]]'s byte-wise unsigned order,
  * which for UTF-8 equals codepoint order and DuckDB's binary string
  * collation — the tie the oracle's `ORDER BY key DESC, payload` states,
  * cross-engine exact. NULL keys/payloads are skipped as in SQL
  * aggregates. Buffers copy their [[UTF8String]]s on admission (the
  * eval row's backing bytes are reused by the scanner) and serialize
  * length-prefixed.
  */
case class TopKStrRows(left: Expression, right: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKStrRows.Buffer] with BinaryLike[Expression] {

  require(k >= 1 && k <= TopKRows.maxK, s"k must be in [1, ${TopKRows.maxK}], got $k")

  def key: Expression = left
  def payload: Expression = right

  override def prettyName: String = "graft_topk_str"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", DoubleType, nullable = false),
      StructField("payload", StringType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (key.dataType, payload.dataType) match {
      case (DoubleType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (kt, pt) => TypeCheckResult.TypeCheckFailure(
        s"graft_topk_str requires (double, string) arguments, got (${kt.sql}, ${pt.sql})")
    }

  override def createAggregationBuffer(): TopKStrRows.Buffer = new TopKStrRows.Buffer(k)

  override def update(buf: TopKStrRows.Buffer, input: InternalRow): TopKStrRows.Buffer = {
    val kv = key.eval(input)
    if (kv != null) {
      val pv = payload.eval(input)
      if (pv != null)
        buf.offer(kv.asInstanceOf[Double], pv.asInstanceOf[UTF8String])
    }
    buf
  }

  override def merge(a: TopKStrRows.Buffer, b: TopKStrRows.Buffer): TopKStrRows.Buffer =
    a.absorb(b)

  override def eval(buf: TopKStrRows.Buffer): Any = {
    val bestFirst = buf.sortedBestFirst
    new GenericArrayData(bestFirst.map { case (kv, pv) => InternalRow(kv, pv) })
  }

  override def serialize(buf: TopKStrRows.Buffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKStrRows.Buffer =
    TopKStrRows.Buffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStrRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStrRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKStrRows =
    copy(left = newLeft, right = newRight)
}

object TopKStrRows {
  import org.apache.spark.sql.GraftBridge

  /** `a` strictly worse than `b` under "key desc, payload asc (binary)"? */
  private def worse(ka: Double, pa: UTF8String, kb: Double, pb: UTF8String): Boolean = {
    val c = java.lang.Double.compare(ka, kb)
    if (c != 0) c < 0 else pa.compareTo(pb) > 0
  }

  /** Bounded worst-at-head binary heap (same layout as [[TopKRows.Buffer]]
    * with a reference array for the payloads). */
  final class Buffer(k: Int) {
    private var keys = new Array[Double](math.min(k, 16))
    private var pays = new Array[UTF8String](math.min(k, 16))
    private var n = 0

    def size: Int = n

    def offer(kv: Double, pv0: UTF8String): Unit = {
      if (n < k) {
        if (n == keys.length) grow()
        keys(n) = kv; pays(n) = pv0.clone(); n += 1
        siftUp(n - 1)
      } else if (worse(keys(0), pays(0), kv, pv0)) {
        keys(0) = kv; pays(0) = pv0.clone()
        siftDown(0)
      }
    }

    /** Merge-side admission: `other`'s strings are already owned copies,
      * no re-clone needed. */
    private def offerOwned(kv: Double, pv: UTF8String): Unit = {
      if (n < k) {
        if (n == keys.length) grow()
        keys(n) = kv; pays(n) = pv; n += 1
        siftUp(n - 1)
      } else if (worse(keys(0), pays(0), kv, pv)) {
        keys(0) = kv; pays(0) = pv
        siftDown(0)
      }
    }

    def absorb(other: Buffer): Buffer = {
      var i = 0
      while (i < other.n) { offerOwned(other.keys(i), other.pays(i)); i += 1 }
      this
    }

    def sortedBestFirst: Array[(Double, UTF8String)] = {
      val out = new Array[(Double, UTF8String)](n)
      var i = 0
      while (i < n) { out(i) = (keys(i), pays(i)); i += 1 }
      scala.util.Sorting.stableSort(out,
        (a: (Double, UTF8String), b: (Double, UTF8String)) =>
          worse(b._1, b._2, a._1, a._2))
      out
    }

    def toBytes: Array[Byte] = {
      var bytes = 0
      var i = 0
      while (i < n) { bytes += pays(i).numBytes(); i += 1 }
      val bb = ByteBuffer.allocate(4 + n * 12 + bytes)
      bb.putInt(n)
      i = 0
      while (i < n) {
        bb.putDouble(keys(i))
        val pb = pays(i).getBytes
        bb.putInt(pb.length); bb.put(pb)
        i += 1
      }
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
      while (i < n) {
        val kv = bb.getDouble
        val len = bb.getInt
        val pb = new Array[Byte](len)
        bb.get(pb)
        buf.offerOwned(kv, UTF8String.fromBytes(pb))
        i += 1
      }
      buf
    }
  }

  /** Column-API form: `df.groupBy(g).agg(TopKStrRows.topK(score, term, 3))`. */
  def topK(key: Column, payload: Column, k: Int): Column =
    GraftBridge.column(TopKStrRows(
      GraftBridge.expression(key), GraftBridge.expression(payload), k)
      .toAggregateExpression())
}
