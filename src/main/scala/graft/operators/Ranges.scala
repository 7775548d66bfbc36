package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-containment (range) join without a nested-loop: point ∈
  * [start, end) pairs via bin blocking.
  *
  * A naive `points JOIN intervals ON p >= start AND p < end` has no
  * equi-key, so Spark plans a BroadcastNestedLoopJoin — O(|P|·|I|) work
  * that melts at scale. Binning restores an equi-key: each interval is
  * exploded to the fixed-width bins it overlaps, each point maps to
  * exactly ONE bin, and the join runs on `bin` with the exact interval
  * predicate as a post-filter. A (point, interval) match surfaces exactly
  * once — in the point's unique bin — so no dedup pass is needed.
  *
  * 100 TB shape: the shuffle keys on `bin` (time-ordered data spreads
  * uniformly across bins; pick `width` near the typical interval length
  * so each interval explodes to ~2 bins and each bin's population stays
  * task-sized). Work is candidates-only — points meet only the intervals
  * within one bin width, never the cross product. Skewed hot bins are
  * ordinary aggregate skew, handled by AQE or [[Skew.saltedJoin]].
  */
object Ranges {

  /** Inner join of `points` (long column `ptCol`) against `intervals`
    * (long columns `startCol`, `endCol`, half-open [start, end)): every
    * (interval row ++ point row) combination whose point falls inside.
    * `width` is the bin size in the columns' units. Empty intervals
    * (end ≤ start) contain no point and are dropped before the explode —
    * they would otherwise generate a descending bin `sequence`. */
  /** Floor-division bin in pure LONG arithmetic: `floor(c / w)` via a
    * double would silently misbin values beyond 2^53 (a generic long
    * domain — row ids, nanos — exceeds double precision); subtracting the
    * non-negative remainder first makes the operand an exact multiple of
    * `w`, so the integral SQL `div` is the exact floor for negatives too.
    * Staged through a named temp column because the public Column API has
    * no integral divide. */
  private def withBin(df: DataFrame, c: Column, w: Long, mult: String,
                      out: String): DataFrame =
    df.withColumn(mult, c - pmod(c, lit(w)))
      .withColumn(out, expr(s"`$mult` div $w"))
      .drop(mult)

  /** Per-call unique temp-column namespace: fixed names like `__bin`
    * would collide with (or capture) a caller column of the same name and
    * produce ambiguous or silently wrong output. A process-wide counter
    * keeps every invocation's scratch names distinct. */
  private val callSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  def binnedPointJoin(intervals: DataFrame, points: DataFrame,
                      startCol: String, endCol: String, ptCol: String,
                      width: Long): DataFrame = {
    require(width > 0, s"bin width must be positive, got $width")
    val shared = intervals.columns.toSet.intersect(points.columns.toSet)
    require(shared.isEmpty,
      s"interval and point frames must have disjoint column names; " +
        s"shared: ${shared.toSeq.sorted.mkString(", ")} — alias one side first")
    val ns = s"__graft_rj${callSeq.incrementAndGet()}"
    val (mult, bin, lo, hi) = (s"${ns}_mult", s"${ns}_bin", s"${ns}_lo", s"${ns}_hi")
    val binned = withBin(withBin(
        intervals.filter(col(endCol) > col(startCol)),
        col(startCol), width, mult, lo), col(endCol) - 1, width, mult, hi)
      .withColumn(bin, explode(sequence(col(lo), col(hi))))
      .drop(lo, hi)
    val pts = withBin(points, col(ptCol), width, mult, bin)
    binned.join(pts, Seq(bin))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop(bin)
  }
}
