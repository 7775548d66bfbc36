package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ranges

/** Binned interval join (q107): equivalence to the naive non-equi join on
  * a randomized domain with negatives and boundary collisions, and the
  * plan guarantee that the production query never nested-loops. */
class RangesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("randomized ≡ naive containment join; half-open boundaries; negatives") {
    val rnd = new scala.util.Random(99)
    val intervals = (1L to 150L).map { id =>
      val s = rnd.nextInt(2001) - 1000L
      // lengths 0..250: empty, sub-bin, and multi-bin spans vs width=100
      (id, s, s + rnd.nextInt(251))
    }
    // points include every interval endpoint, so the == start (inside) and
    // == end (outside, half-open) boundary cases are all exercised
    val points = (1L to 300L).map(id => (id, rnd.nextInt(2201) - 1100L)) ++
      intervals.flatMap { case (iid, s, e) =>
        Seq((10000L + 2 * iid, s), (10001L + 2 * iid, e)) }
    val got = Ranges.binnedPointJoin(
        intervals.toDF("iid", "s", "e"), points.toDF("pid", "p"),
        "s", "e", "p", width = 100L)
      .select("iid", "pid").as[(Long, Long)].collect()
    val want = for {
      (iid, s, e) <- intervals; (pid, p) <- points
      if p >= s && p < e
    } yield (iid, pid)
    // multiset compare: a bin-overlap bug would duplicate pairs
    assert(got.sorted.toSeq === want.sorted.toSeq)
  }

  test("bins are exact for values beyond double precision (2^53)") {
    val big = 1L << 60
    val intervals = Seq((1L, big, big + 10L), (2L, -big - 10L, -big))
    val points = Seq((1L, big), (2L, big + 9L), (3L, big + 10L),
      (4L, -big - 10L), (5L, -big - 1L), (6L, -big))
    val got = Ranges.binnedPointJoin(
        intervals.toDF("iid", "s", "e"), points.toDF("pid", "p"),
        "s", "e", "p", width = 7L)
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 1L), (1L, 2L), (2L, 4L), (2L, 5L)))
  }

  test("shared column names between the two sides fail loudly, not ambiguously") {
    val ex = intercept[IllegalArgumentException] {
      Ranges.binnedPointJoin(
        Seq((1L, 0L, 10L)).toDF("id", "s", "e"),
        Seq((2L, 5L)).toDF("id", "p"),
        "s", "e", "p", width = 4L)
    }
    assert(ex.getMessage.contains("disjoint column names"), ex.getMessage)
  }

  test("caller columns named like the old fixed temp names are not captured") {
    // pre-namespacing, a caller column literally called __bin or __mult
    // would collide with the operator's scratch columns
    val got = Ranges.binnedPointJoin(
        Seq((1L, 0L, 10L, "keep")).toDF("iid", "s", "e", "__bin"),
        Seq((2L, 5L, "pt")).toDF("pid", "p", "__mult"),
        "s", "e", "p", width = 4L)
      .select("iid", "pid", "__bin", "__mult")
      .as[(Long, Long, String, String)].collect().toSeq
    assert(got === Seq((1L, 2L, "keep", "pt")))
  }

  test("q107 plan: bin equi-join, no nested loop anywhere") {
    val plan = graft.queries.ScaleJoins
      .errorWindowViews(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"interval join degenerated to a nested loop:\n$plan")
  }
}
