package graft.ml

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator computing the k-th largest value of a Double column —
  * the single-pass alternative to `orderBy(desc).limit(k)` + min for the
  * anomaly threshold (T1/M5).
  *
  * Buffer = the current top-k kept as a min-heap-ish sorted array
  * (ascending; element 0 is the k-th largest so far). reduce is O(log k)
  * per row (binary search + memmove), merge is a linear merge of two
  * sorted arrays truncated to k. Memory is k doubles per partition — at
  * 100 TB this aggregates in one pass with map-side combine instead of a
  * TakeOrdered of every partition's candidates on the driver, and it can
  * sit inside any groupBy (per-group thresholds, which orderBy/limit
  * cannot express).
  */
class TopKMinAggregator(k: Int) extends Aggregator[Double, Array[Double], Double] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: Array[Double] = Array.emptyDoubleArray

  override def reduce(buf: Array[Double], v: Double): Array[Double] = {
    if (buf.length < k) {
      insertAt(buf, insertionPoint(buf, v), v)
    } else if (v > buf(0)) {
      // evict the current smallest of the top-k, insert v in order
      val withoutMin = java.util.Arrays.copyOfRange(buf, 1, buf.length)
      insertAt(withoutMin, insertionPoint(withoutMin, v), v)
    } else buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val merged = new Array[Double](a.length + b.length)
    var i = 0; var j = 0; var m = 0
    while (i < a.length && j < b.length) {
      if (a(i) <= b(j)) { merged(m) = a(i); i += 1 } else { merged(m) = b(j); j += 1 }
      m += 1
    }
    while (i < a.length) { merged(m) = a(i); i += 1; m += 1 }
    while (j < b.length) { merged(m) = b(j); j += 1; m += 1 }
    if (merged.length <= k) merged
    else java.util.Arrays.copyOfRange(merged, merged.length - k, merged.length)
  }

  /** k-th largest = smallest retained value; NaN when fewer than 1 row. */
  override def finish(buf: Array[Double]): Double =
    if (buf.isEmpty) Double.NaN else buf(0)

  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  private def insertionPoint(buf: Array[Double], v: Double): Int = {
    var lo = 0; var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }

  private def insertAt(buf: Array[Double], i: Int, v: Double): Array[Double] = {
    val out = new Array[Double](buf.length + 1)
    System.arraycopy(buf, 0, out, 0, i)
    out(i) = v
    System.arraycopy(buf, i, out, i + 1, buf.length - i)
    out
  }
}
