package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sq

/** Scalar quantization (q175/q176): code bounds, JVM recomputation of the
  * integer distances, recall vs brute L2, and the zero-shuffle encode
  * shape. */
class SqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("codes are within [0, 255] and cover every (vector, dim) cell") {
    val emb = Tables.embeddings(spark, sf)
    val codes = graft.queries.Extensions.sq8Codes(spark, sf)
    assert(codes.count() === emb.count() * 64)
    val mm = codes.agg(min("code"), max("code")).collect()(0)
    assert(mm.getInt(0) >= 0 && mm.getInt(1) <= Sq.levels)
    // the extremes are actually reached: some dim attains 0 and 255
    assert(mm.getInt(0) === 0 && mm.getInt(1) === Sq.levels)
  }

  test("integer distances recompute in the JVM from the emitted codes (q176)") {
    val codes = graft.queries.Extensions.sq8Codes(spark, sf)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getLong(1)).map(_.getInt(2))
      }
    val got = graft.queries.Extensions.sq8TopK(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (q, n, dist) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val want = codes(q).zip(codes(n))
        .map { case (a, b) => ((a - b).toLong * (a - b).toLong) }.sum
      assert(want === dist, s"dist($q, $n) diverges from the code arithmetic")
    }
  }

  test("recall@5 vs brute-force L2 holds the measured floor") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 10)
    val brute = graft.operators.Pq.bruteL2TopK(emb, queries, 5)
      .select("query_id", "neighbor_id")
    val sq = graft.queries.Extensions.sq8TopK(spark, sf)
      .select("query_id", "neighbor_id")
    val hits = brute.join(sq, Seq("query_id", "neighbor_id"), "left_semi").count()
    // measured 43/50 = 0.86 at pin time — the misses are near-tied
    // neighbors separated by less than the per-dim quantization step
    info(s"SQ8 recall@5 at sf0.01: $hits/50")
    assert(hits >= 40L, s"SQ8 recall floor: $hits/50, expected >= 40")
  }

  test("plan: stats is one aggregate; encode is otherwise row-local") {
    val emb = Tables.embeddings(spark, sf)
    val plan = Sq.encode(emb, Sq.dimStats(emb))
      .queryExecution.executedPlan.toString
    // the only exchanges belong to the 64-row stats aggregate (dim
    // hash + single-partition collect); the corpus side never shuffles
    assert(plan.split("Exchange hashpartitioning").length - 1 <= 1,
      s"corpus must not shuffle for encoding:\n$plan")
    assert(plan.contains("BroadcastExchange") ||
           plan.contains("BroadcastNestedLoopJoin"),
      s"stats must broadcast:\n$plan")
  }
}
