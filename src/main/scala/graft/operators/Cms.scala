package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Oracle-exact Count-Min sketch: mergeable frequency estimates over an
  * unbounded key stream in depth × width integers of state. The exact
  * heavy-hitter pass (q86's Misra-Gries) answers "which keys are big";
  * CMS answers "how big is ANY key" — including keys nobody nominated —
  * from the same bounded state, with the classic one-sided guarantee
  * est ≥ true and est ≤ true + εN (ε = e/width) w.h.p.
  *
  * Where HLL ([[Hll]]) needs one IEEE division for its estimate, CMS is
  * integers end to end: counts in, min of counts out. So the sketch STATE
  * and the ESTIMATES are both oracle-checkable bit-for-bit — the rows are
  * [[Hll.poly]] degree-4 field polynomials under row-specific
  * coefficients, and everything after is count/min.
  *
  * Scale shape: building is ONE shuffle on the (row, bucket) cell key —
  * depth·width cells total regardless of input size (map-side combine does
  * the heavy counting). Lookup joins probes against the ≤ 8 K-cell sketch,
  * which broadcasts. Sketches over disjoint streams merge by cell-wise
  * SUM — a `groupBy(row, bucket).sum` over their union — so shards and
  * micro-batches combine losslessly (CmsSpec pins merge ≡ rebuild).
  */
object Cms {
  val depth = 4
  val width = 2048 // ε = e/2048 ≈ 0.13% of stream length per estimate

  private val P = 2147483647L
  private[operators] val rowCoeffs: Seq[Seq[Long]] = Seq(
    Seq(1103515245L, 12345L, 1013904223L, 1664525L),
    Seq(1588635695L, 54321L, 22695477L, 65793L),
    Seq(214013L, 2531011L, 17405L, 10395331L),
    Seq(69069L, 362437L, 999999937L, 999999893L))

  private def bucketCol(key: Column, i: Int): Column =
    Hll.poly(key, P, rowCoeffs(i)) % width
  def bucketSql(key: String, i: Int): String =
    s"(${Hll.polySql(key, P, rowCoeffs(i))}) % $width"

  /** JVM-side mirror of `bucketCol` — the same exact integer arithmetic,
    * used by the native aggregate ([[graft.expressions.CmsCells]]). */
  def bucketOfLong(u: Long, i: Int): Int =
    (Hll.polyLong(u, P, rowCoeffs(i)) % width).toInt

  /** Builds the sketch from a BIGINT key column: one (row, bucket, cnt)
    * tuple per touched cell. */
  def sketch(items: DataFrame, key: Column): DataFrame =
    items.filter(key.isNotNull)
      .select(posexplode(array((0 until depth).map(bucketCol(key, _)): _*))
        .as(Seq("row", "bucket")))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("cnt"))

  /** Point-queries the sketch: min over the key's depth cells (absent cell
    * = 0). `probes` must carry distinct keys in `key`; the sketch side is
    * ≤ depth·width rows, so the join broadcasts. */
  def lookup(sk: DataFrame, probes: DataFrame, key: Column): DataFrame =
    probes.select(key.as("probe_key"))
      .select(col("probe_key"),
        posexplode(array((0 until depth).map(i => bucketCol(col("probe_key"), i)): _*))
          .as(Seq("row", "bucket")))
      .join(broadcast(sk), Seq("row", "bucket"), "left_outer")
      .groupBy("probe_key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}
