package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.RangeJoinRewrite

/** The injected optimizer rule (GraftExtensions → RangeJoinRewrite):
  * a declarative range-only join keeps its natural spelling but plans as
  * the binned equi-join, with identical results. */
class RangeJoinRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def intervals: DataFrame =
    (1L to 120L).map { i =>
      val s = (i * 37) % 1000
      (i, s, s + (i * 13) % 150)
    }.toDF("iid", "s", "e")

  private def points: DataFrame =
    (1L to 400L).map(i => (i, (i * 7) % 1100)).toDF("pid", "p")

  private def rangeJoin: DataFrame =
    points.join(intervals, col("p") >= col("s") && col("p") < col("e"))
      .select("iid", "pid")

  private def withRule[A](width: Long)(body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinRewrite
    spark.conf.set(RangeJoinRewrite.WidthConf, width.toString)
    try body
    finally {
      spark.conf.unset(RangeJoinRewrite.WidthConf)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq RangeJoinRewrite)
    }
  }

  test("range-only join rewrites to a bin equi-join with identical results") {
    val want = rangeJoin.as[(Long, Long)].collect().sorted.toSeq // BNLJ baseline
    assert(want.nonEmpty, "fixture must produce matches")
    withRule(100L) {
      val df = rangeJoin
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"rule did not rewrite the range join:\n$plan")
      assert(plan.contains("Generate") || plan.contains("explode"),
        s"expected the bin explode in the rewritten plan:\n$plan")
      assert(df.as[(Long, Long)].collect().sorted.toSeq === want)
    }
  }

  test("inclusive upper bound and swapped operand spellings also rewrite") {
    val q = points.join(intervals,
        col("s") <= col("p") && col("e") >= col("p")) // s <= p <= e
      .select("iid", "pid")
    val want = q.as[(Long, Long)].collect().sorted.toSeq
    withRule(64L) {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"no rewrite:\n$plan")
      assert(q.as[(Long, Long)].collect().sorted.toSeq === want)
    }
  }

  test("rule leaves equi-joins, non-long ranges, and unset-width sessions alone") {
    // width unset → no rewrite even with the rule registered
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinRewrite
    try {
      val plan = rangeJoin.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("CartesianProduct"),
        s"rewrite fired without a configured width:\n$plan")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq RangeJoinRewrite)
    }
    withRule(100L) {
      // an equality conjunct → Catalyst equi-joins it already; keep hands off
      val eq = points.withColumn("k", col("pid") % 5)
        .join(intervals.withColumn("k", col("iid") % 5),
          Seq("k"))
        .filter(col("p") >= col("s") && col("p") < col("e"))
      val plan = eq.queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_bin"), s"rewrote an equi-join:\n$plan")
    }
  }

  test("rewrite survives negative domains and empty intervals") {
    val ivs = Seq((1L, -500L, -300L), (2L, -100L, -100L), (3L, 50L, 20L))
      .toDF("iid", "s", "e")
    val pts = Seq((1L, -400L), (2L, -100L), (3L, 30L)).toDF("pid", "p")
    def q = pts.join(ivs, col("p") >= col("s") && col("p") < col("e"))
      .select("iid", "pid")
    val want = q.as[(Long, Long)].collect().toSet
    withRule(100L) {
      assert(q.as[(Long, Long)].collect().toSet === want)
      assert(want === Set((1L, 1L)))
    }
  }
}
