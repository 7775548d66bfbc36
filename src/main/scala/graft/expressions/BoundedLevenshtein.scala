package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Banded (Ukkonen) edit distance with an early-exit threshold: returns
  * the exact levenshtein distance when it is ≤ τ, and the sentinel τ+1
  * otherwise — the verify primitive of the edit-distance join family
  * (q105/q111/q113), as a native codegen expression.
  *
  * Spark's built-in `levenshtein` fills the full O(|a|·|b|) DP table per
  * pair; every EditJoin caller immediately filters `dist ≤ τ` with τ of
  * 1–2, so all the work outside the ±τ diagonal band is discarded. This
  * computes only the band — O((2τ+1)·n) — and abandons a row the moment
  * the whole band exceeds τ, which for near-miss candidate pairs (the
  * bulk of what segment blocking emits) is after a handful of cells. At
  * 100 TB the verify stage's cost is candidate-count × per-pair cost;
  * this cuts the second factor from quadratic to linear-in-τ.
  *
  * Distance is computed over Unicode CODE POINTS, matching the built-in
  * (`UTF8String.levenshteinDistance`) — BoundedLevenshteinSpec pins
  * equality against the built-in on random strings, astral-plane
  * characters included, and the sentinel contract above τ. (Spark ≥ 3.5
  * also has a 3-arg bounded `levenshtein(a, b, k)`, but its over-τ result
  * is -1, which breaks the `dist ≤ τ` filter idiom and is not available
  * as a stable Column overload; the sentinel form composes directly.)
  *
  * Reference scope note: the reference has no string matching at all —
  * extension surface (closest anchor: invoice keying,
  * InvoicePipeline.scala:96).
  */
case class BoundedLevenshtein(left: Expression, right: Expression, tau: Int)
    extends BinaryExpression {

  require(tau >= 0, s"tau must be non-negative, got $tau")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_edit_bounded"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_edit_bounded requires two string arguments, got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    BoundedLevenshtein.compute(
      l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString, tau)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = BoundedLevenshtein.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.compute($a.toString(), $b.toString(), $tau);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BoundedLevenshtein {

  /** Shared by interpreted and generated paths. Exact distance if ≤ tau,
    * else tau+1. Code-point arrays so supplementary characters count as
    * one edit, same as the built-in. */
  def compute(a: String, b: String, tau: Int): Int = {
    val x = a.codePoints().toArray
    val y = b.codePoints().toArray
    val n = x.length
    val m = y.length
    val inf = tau + 1
    if (math.abs(n - m) > tau) return inf
    if (n == 0) return m // ≤ tau by the length check
    if (m == 0) return n

    // two rolling rows; only the ±tau band is ever written, and because
    // the band shifts by at most one cell per row, every cell the next
    // row reads was written this row (both band edges are set each row) —
    // a reference swap carries the state, no copying
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= tau) j else inf; j += 1 }

    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - tau)
      val hi = math.min(m, i + tau)
      cur(0) = if (i <= tau) i else inf
      if (lo > 1) cur(lo - 1) = inf
      var rowMin = if (lo > 1) inf else cur(0)
      j = lo
      while (j <= hi) {
        val cost = if (x(i - 1) == y(j - 1)) 0 else 1
        var d = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < d) d = del
        val ins = cur(j - 1) + 1
        if (ins < d) d = ins
        if (d > inf) d = inf
        cur(j) = d
        if (d < rowMin) rowMin = d
        j += 1
      }
      if (hi < m) cur(hi + 1) = inf
      if (rowMin >= inf) return inf // the whole band is over budget
      val t = prev; prev = cur; cur = t
      i += 1
    }
    math.min(prev(m), inf)
  }

  import org.apache.spark.sql.GraftBridge

  def editBounded(a: Column, b: Column, tau: Int): Column =
    GraftBridge.column(BoundedLevenshtein(
      GraftBridge.expression(a), GraftBridge.expression(b), tau))
}
