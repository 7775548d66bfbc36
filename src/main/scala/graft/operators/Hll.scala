package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Oracle-exact HyperLogLog: an approximate-distinct sketch whose STATE is
  * bit-identical across engines and partitionings, unlike built-in
  * `approx_count_distinct` (HLL++ registers depend on an engine-private
  * hash, so its answer can only ever be rows-only checked — q33).
  *
  * Every ingredient is deterministic integer/string arithmetic available in
  * both Spark and ANSI-ish SQL:
  *  - hash: two independent degree-4 polynomials over 31-bit prime fields
  *    (Horner form; the input is reduced mod the prime FIRST, so no
  *    intermediate exceeds 2^62 — engines that error on BIGINT overflow,
  *    like DuckDB, compute it exactly), concatenated to a ~62-bit value.
  *    Degree 4 matters: an AFFINE round is too linear for HLL's geometric
  *    rank statistic (sequential ids mis-estimated by up to 58% in
  *    testing); the degree-4 field polynomial is 4-wise independent and
  *    lands sequential AND random ids within the sketch's error bound;
  *  - bucket = low [[Hll.p]] bits; rank = leading-zero count of the
  *    remaining 50-bit window + 1, read off a zero-padded binary STRING
  *    (`instr(lpad(bin(w)))`) — no log2/clz needed;
  *  - registers: `max(rank)` per (group, bucket) — the classic mergeable
  *    state: max is commutative/associative/idempotent, so ANY partitioning,
  *    replay order, or duplicate delivery converges to the same registers
  *    (HllSpec asserts this, and the streaming variant relies on it);
  *  - the harmonic-sum denominator as an EXACT integer: sum of
  *    2^(51 − M_j) over all m buckets (absent buckets contribute 2^51);
  *    bounded by m·2^51 < 2^63, so it never overflows and never rounds.
  *
  * The raw estimate alpha·m²·2^51 / S is then ONE IEEE division of
  * identical operands. The small-range (linear-counting) correction needs
  * `ln`, which is not correctly-rounded-guaranteed across libms — so the
  * ENGINE emits (active, s_scaled, raw_est) and the correction is applied
  * client-side where presentation happens (HllSpec does, and lands within
  * HLL's error bound of the true count).
  *
  * Scale shape: one shuffle on the high-cardinality (group, bucket) key,
  * then a bounded m-row-per-group aggregate. State per group is m bytes —
  * 100 TB of events folds into 4 KB per group, streaming or batch.
  */
object Hll {
  /** Bucket bits / bucket count. */
  val p = 12
  val m: Int = 1 << p // 4096

  private val P1 = 2147483647L
  private val P2 = 2147483629L
  private val C1 = Seq(1103515245L, 12345L, 1013904223L, 1664525L)
  private val C2 = Seq(1588635695L, 54321L, 22695477L, 1103515245L)

  /** h < P1·P2 < 2^62 ⇒ w = h >> p has 50 significant bits ⇒ rank ≤ 51. */
  val maxRank = 51
  private val windowPad = 64 - (62 - p) // leading '0's of w in a 64-char pad

  /** Horner evaluation of a degree-(cs.size−1) polynomial over the prime
    * field: the input reduces mod `prime` first, so every intermediate is
    * < 2^62. The double-mod `((u % p) + p) % p` maps NEGATIVE keys into
    * [0, p) — both Spark's and DuckDB's `%` keep the dividend's sign, so
    * without it a negative BIGINT id would produce negative hashes,
    * negative buckets, and engine-divergent rank arithmetic; for u ≥ 0 it
    * is the identity, so existing sketches are unchanged. Shared with the
    * Count-Min sketch ([[Cms]]), whose rows are the same construction
    * under different coefficients. */
  def poly(u: Column, prime: Long, cs: Seq[Long]): Column = {
    val x = (u % prime + prime) % prime
    cs.tail.foldLeft(lit(cs.head): Column)((acc, c) => (acc * x + c) % prime)
  }
  def polySql(u: String, prime: Long, cs: Seq[Long]): String = {
    val x = s"((($u % $prime) + $prime) % $prime)"
    cs.tail.foldLeft(cs.head.toString)((acc, c) => s"(($acc) * $x + $c) % $prime")
  }

  /** The ~62-bit cross-engine hash of a BIGINT id. */
  def hash(u: Column): Column =
    poly(u, P1, C1) * P2 + poly(u, P2, C2)

  def hashSql(u: String): String =
    s"(${polySql(u, P1, C1)}) * $P2 + (${polySql(u, P2, C2)})"

  /** (bucket, rank) of one hashed value. */
  def bucketOf(h: Column): Column = h % m
  def rankOf(h: Column): Column = {
    val w = shiftright(h, p)
    when(w === 0L, lit(maxRank))
      .otherwise(instr(lpad(bin(w), 64, "0"), "1") - windowPad)
  }
  def bucketSql(h: String): String = s"($h) % $m"
  def rankSql(h: String): String =
    s"""CASE WHEN ($h) // $m = 0 THEN $maxRank
        ELSE instr(lpad(bin(($h) // $m), 64, '0'), '1') - $windowPad END"""

  /** Mergeable sketch state: max rank per (group, bucket). Works unchanged
    * on a streaming frame (update-mode aggregation) — max-merge makes the
    * final registers independent of micro-batch boundaries. */
  def registers(df: DataFrame, groupCols: Seq[String], id: Column): DataFrame = {
    val h = hash(id)
    df.filter(id.isNotNull)
      .select((groupCols.map(col) ++
        Seq(bucketOf(h).as("bucket"), rankOf(h).as("rank"))): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("rank").as("r"))
  }

  /** Finalize registers into (active, s_scaled, raw_est) per group. */
  def sketch(regs: DataFrame, groupCols: Seq[String]): DataFrame =
    regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("active"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${maxRank} - r AS INT))"))
          .as("s_present"))
      .select((groupCols.map(col) ++ Seq(
        col("active"),
        (col("s_present") +
          (lit(m.toLong) - col("active")) * (1L << maxRank)).as("s_scaled"))): _*)
      .withColumn("raw_est",
        lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble)) *
          lit(m.toDouble) * lit(m.toDouble) * lit(math.pow(2.0, maxRank)) /
          col("s_scaled").cast("double"))

  /** Client-side corrected estimate (linear counting below 2.5m) — the one
    * step that needs `ln`, applied where results are CONSUMED, mirroring
    * how the reference loads model artifacts outside the query plan. */
  def correctedEstimate(active: Long, rawEst: Double): Double = {
    val zeros = m - active
    if (rawEst <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else rawEst
  }

  // --- JVM-side mirrors of the Column arithmetic ----------------------------
  // Used by the native aggregate ([[graft.expressions.HllRegisters]]): every
  // step is the same exact integer arithmetic as the Column/SQL forms above
  // (Scala's % keeps the dividend's sign exactly like Spark's and DuckDB's),
  // so registers built in an ObjectHashAggregate buffer are bit-identical to
  // registers built by the groupBy composition — HllSpec asserts it.

  private[graft] def polyLong(u: Long, prime: Long, cs: Seq[Long]): Long = {
    val x = (u % prime + prime) % prime
    cs.tail.foldLeft(cs.head)((acc, c) => (acc * x + c) % prime)
  }

  /** The ~62-bit cross-engine hash of a BIGINT id — JVM form of [[hash]]. */
  def hashLong(u: Long): Long = polyLong(u, P1, C1) * P2 + polyLong(u, P2, C2)

  /** Bucket of a hashed value — JVM form of [[bucketOf]]. */
  def bucketOfLong(h: Long): Int = (h % m).toInt

  /** Rank of a hashed value — JVM form of [[rankOf]]: the Column form reads
    * the leading-zero count of the 50-bit window off a padded binary string
    * (`instr(lpad(bin(w), 64, '0'), '1') - windowPad` = nlz(w) + 1 - 14);
    * here it is one `numberOfLeadingZeros`. */
  def rankOfLong(h: Long): Int = {
    val w = h >> p
    if (w == 0L) maxRank
    else java.lang.Long.numberOfLeadingZeros(w) + 1 - windowPad
  }
}
