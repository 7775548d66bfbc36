package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Automatic join-strategy selection: the decision a 100 TB user makes by
  * hand before every big join — broadcast the dim? salt the fact? how many
  * salts? — made from the engine's own cheap diagnostics instead.
  *
  * The planner composes the three measurements this repo already gates
  * individually and turns them into one [[JoinDecision]]:
  *
  *  - the q110 degree diagnosis (one map-side-combinable aggregate over
  *    the fact side's key): total rows, distinct keys, hottest degree —
  *    the skew evidence;
  *  - a dim-side row count (parquet metadata at rest, never a wide scan)
  *    — the broadcast evidence;
  *  - the q117 CMS inner-product estimate of the join's OUTPUT size from
  *    two bounded-state sketches — the one number neither input reveals
  *    alone, with CMS's one-sided est ≥ true guarantee, reported so a
  *    caller can size downstream shuffle partitions before running the
  *    join (or refuse an explosive one).
  *
  * Policy, in order:
  *  1. dim fits the broadcast budget → broadcast join: no shuffle at all,
  *     and a hot fact key is harmless because no partitioning happens.
  *  2. hottest degree > `skewFactor` × average degree → salted join
  *     ([[Skew.saltedJoin]]), salts sized so the hottest key's rows split
  *     into roughly task-sized shares: ceil(maxDeg / (factRows /
  *     shufflePartitions)), clamped to [2, maxSalts].
  *  3. otherwise → plain shuffle hash join; Catalyst/AQE need no help.
  *
  * Total diagnosis cost: one aggregate pass over the fact keys, one over
  * each side for the sketches, one metadata count — strictly cheaper than
  * the join being planned, so it can run ahead of every big join. The
  * chosen strategy must be INVISIBLE in the result (the q106 law): the
  * q125/q126 gate rows pin each fixture's output against the plain-join
  * oracle while the decision itself is require()d in the query body and
  * asserted per fixture in AutoJoinSpec.
  */
object AutoJoin {

  /** The evidence and the verdict, all of it reportable: strategy is one
    * of "broadcast" | "salted" | "plain"; `salts` is 1 unless salted;
    * `estOutRows` carries the CMS inner-product output estimate
    * (est ≥ true join size, within εN² w.h.p.). */
  final case class JoinDecision(
      strategy: String,
      salts: Int,
      factRows: Long,
      dimRows: Long,
      distinctKeys: Long,
      maxDeg: Long,
      estOutRows: Long) {
    def avgDeg: Double = factRows.toDouble / math.max(distinctKeys, 1L)
  }

  /** Measures both sides and picks the strategy. `key` must exist on both
    * frames (the [[Skew.saltedJoin]] contract); null keys never join and
    * are excluded from the diagnosis. */
  def plan(fact: DataFrame, dim: DataFrame, key: String,
           broadcastMaxRows: Long = 1L << 20,
           skewFactor: Double = 8.0,
           maxSalts: Int = 32): JoinDecision = {
    require(skewFactor > 1.0, s"skewFactor must exceed 1: $skewFactor")
    require(maxSalts >= 2, s"maxSalts must be at least 2: $maxSalts")
    val dimRows = dim.count()
    val prof = fact.filter(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("deg"))
      .agg(coalesce(sum("deg"), lit(0L)).as("n"),
        count(lit(1)).as("k"),
        coalesce(max("deg"), lit(0L)).as("mx"))
      .head()
    val (factRows, distinctKeys, maxDeg) =
      (prof.getLong(0), prof.getLong(1), prof.getLong(2))
    val est = Cms.sketch(fact, col(key)).withColumnRenamed("cnt", "cnt_a")
      .join(Cms.sketch(dim, col(key)).withColumnRenamed("cnt", "cnt_b"),
        Seq("row", "bucket"))
      .groupBy("row").agg(sum(col("cnt_a") * col("cnt_b")).as("dot"))
      .agg(min("dot").as("est")).head()
    val estOutRows = if (est.isNullAt(0)) 0L else est.getLong(0)

    val avgDeg = factRows.toDouble / math.max(distinctKeys, 1L)
    if (dimRows <= broadcastMaxRows)
      JoinDecision("broadcast", 1, factRows, dimRows, distinctKeys, maxDeg, estOutRows)
    else if (maxDeg > skewFactor * avgDeg) {
      val shufflePartitions =
        fact.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
      val targetShare = math.max(1L, factRows / math.max(shufflePartitions, 1))
      val salts = math.min(maxSalts,
        math.max(2, math.ceil(maxDeg.toDouble / targetShare).toInt))
      JoinDecision("salted", salts, factRows, dimRows, distinctKeys, maxDeg, estOutRows)
    } else
      JoinDecision("plain", 1, factRows, dimRows, distinctKeys, maxDeg, estOutRows)
  }

  /** Plans, then executes the chosen strategy. Inner join on `key`; the
    * returned decision says which physical path the result came from. */
  def autoJoin(fact: DataFrame, dim: DataFrame, key: String,
               broadcastMaxRows: Long = 1L << 20,
               skewFactor: Double = 8.0,
               maxSalts: Int = 32): (DataFrame, JoinDecision) = {
    val d = plan(fact, dim, key, broadcastMaxRows, skewFactor, maxSalts)
    val joined = d.strategy match {
      case "broadcast" => fact.join(broadcast(dim), key)
      case "salted"    => Skew.saltedJoin(fact, dim, key, d.salts)
      case _           => fact.join(dim, key)
    }
    (joined, d)
  }
}
