package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AutoJoin

/** The auto-strategy join planner: each fixture must elicit its intended
  * strategy, the salt count must be sized from the measured skew, the CMS
  * output estimate must keep its one-sided bound, and — the q106 law —
  * every chosen strategy must be invisible in the result. */
class AutoJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 10k-row fact: key 1 holds 70% of the rows, keys 2..200 share the
    * rest round-robin — the deliberate hot-key shape. */
  private def skewedFact = (1L to 10000L)
    .map(i => (if (i % 10 < 7) 1L else 2L + i % 199, i))
    .toDF("k", "payload")

  private def uniformFact = (1L to 10000L).map(i => (1L + i % 200, i))
    .toDF("k", "payload")

  private def dim(n: Long) = (1L to n).map(i => (i, s"attr$i")).toDF("k", "attr")

  test("small dim → broadcast, and the executed plan really broadcasts") {
    val (joined, dec) = AutoJoin.autoJoin(skewedFact, dim(200), "k",
      broadcastMaxRows = 1000)
    assert(dec.strategy === "broadcast" && dec.salts === 1, dec.toString)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast in plan:\n$plan")
  }

  test("hot key over the broadcast budget → salted, salts sized from the skew") {
    val (joined, dec) = AutoJoin.autoJoin(skewedFact, dim(200), "k",
      broadcastMaxRows = 50)
    assert(dec.strategy === "salted", dec.toString)
    // 7000 of 10000 rows on one key; avg degree 50 — far past factor 8
    assert(dec.maxDeg === 7000L && dec.factRows === 10000L, dec.toString)
    // sizing law: ceil(maxDeg / (factRows / shufflePartitions)), in [2, 32]
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val expected = math.min(32,
      math.max(2, math.ceil(7000.0 / math.max(1L, 10000L / parts)).toInt))
    assert(dec.salts === expected, s"salts ${dec.salts} != sizing law $expected")
    assert(joined.count() === 10000L) // every fact row still joins exactly once
  }

  test("uniform keys over the broadcast budget → plain") {
    val (_, dec) = AutoJoin.autoJoin(uniformFact, dim(200), "k",
      broadcastMaxRows = 50)
    assert(dec.strategy === "plain" && dec.salts === 1, dec.toString)
  }

  test("every strategy is invisible in the result (q106 law)") {
    val plain = skewedFact.join(dim(200), "k")
      .select("k", "payload", "attr").as[(Long, Long, String)].collect().sorted.toSeq
    Seq(1000L, 50L).foreach { budget => // broadcast leg, then salted leg
      val (joined, _) = AutoJoin.autoJoin(skewedFact, dim(200), "k",
        broadcastMaxRows = budget)
      val got = joined.select("k", "payload", "attr")
        .as[(Long, Long, String)].collect().sorted.toSeq
      assert(got === plain, s"strategy at budget=$budget changed the result")
    }
  }

  test("CMS output estimate keeps its one-sided bound: est >= true join size") {
    val dec = AutoJoin.plan(skewedFact, dim(200), "k", broadcastMaxRows = 50)
    val truth = skewedFact.join(dim(200), "k").count()
    assert(dec.estOutRows >= truth,
      s"CMS estimate ${dec.estOutRows} below true join size $truth")
    // and it is an estimate of THIS join, not a degenerate constant:
    // within the classic eps*N^2 slack (eps = e/2048, N = 10k rows + 200)
    assert(dec.estOutRows <= truth + (math.E / 2048.0 * 10200 * 10200).toLong,
      s"CMS estimate ${dec.estOutRows} implausibly far above $truth")
  }

  test("diagnosis ignores null keys; degenerate empty fact plans plain/broadcast") {
    val withNulls = Seq((Some(1L), 1L), (None, 2L), (Some(1L), 3L))
      .toDF("k", "payload")
    val d = AutoJoin.plan(withNulls, dim(5), "k", broadcastMaxRows = 1)
    assert(d.factRows === 2L && d.maxDeg === 2L && d.distinctKeys === 1L, d.toString)
    val empty = AutoJoin.plan(skewedFact.filter(lit(false)), dim(5),
      "k", broadcastMaxRows = 1)
    assert(empty.strategy === "plain" && empty.estOutRows === 0L, empty.toString)
  }

  test("q125/q126 gate queries: decisions hold and plans have no nested loop") {
    val sf = "/root/testdata/sf0.001"
    // the require() inside each query IS the decision assertion; a drift
    // throws here rather than producing a silently different plan
    val q125 = graft.queries.ScaleJoins.autoSkewedRevenue(spark, sf)
    val q126 = graft.queries.ScaleJoins.autoBroadcastSegments(spark, sf)
    Seq(q125, q126).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), s"nested loop in auto-join plan:\n$plan")
    }
    assert(graft.queries.ScaleJoins.autoBroadcastSegments(spark, sf)
      .queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }
}
