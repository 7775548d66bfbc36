package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the q140 negative-candidate generator that the
  * hash-exact oracle can't articulate by itself (it would pass vacuously on
  * an empty fixture). */
class ScaleJoinsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("negative candidates are never purchased and ranked by popularity") {
    val out = graft.queries.ScaleJoins.negativeCandidates(spark, sf).cache()
    try {
      assert(out.count() > 0, "fixture must yield candidates")
      // no candidate was actually bought by its customer
      val li = Tables.lineitem(spark, sf)
      val bought = li.join(Tables.orders(spark, sf)
          .select(col("o_orderkey").as("l_orderkey"), col("o_custkey")),
          Seq("l_orderkey"))
        .select(col("o_custkey").as("c_custkey"),
          col("l_partkey").as("cand_partkey")).distinct()
      assert(out.join(bought, Seq("c_custkey", "cand_partkey"), "left_semi").isEmpty,
        "a purchased part leaked into the negatives")
      // at most k per customer, ranks consecutive from 1, ordered by pop_rank
      val k = graft.queries.ScaleJoins.negCandK
      val bad = out.groupBy("c_custkey")
        .agg(count(lit(1)).as("n"), max(col("cand_rank")).as("mx"),
          min(col("cand_rank")).as("mn"))
        .filter(col("n") > k || col("mx") =!= col("n") || col("mn") =!= 1)
      assert(bad.isEmpty, "cand_rank must be 1..n<=k per customer")
      // candidate order follows global popularity: within a customer,
      // higher cand_rank never has a lower pop_rank
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("c_custkey")).orderBy(col("cand_rank"))
      val inverted = out.withColumn("prev_pop", lag(col("pop_rank"), 1).over(w))
        .filter(col("prev_pop").isNotNull && col("pop_rank") < col("prev_pop"))
      assert(inverted.isEmpty, "candidates out of popularity order")
    } finally out.unpersist()
  }

  test("negative-candidate plan broadcasts the pool, never a customer-part shuffle product") {
    val plan = graft.queries.ScaleJoins.negativeCandidates(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"q140 pool must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"q140 must not build a shuffled cartesian product:\n$plan")
  }
}
