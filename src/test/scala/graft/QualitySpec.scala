package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Quality

/** Data-quality constraint suite (q98): planted violations are counted
  * exactly, NULL semantics match SQL, and the report stays distributed. */
class QualitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def reportMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("predicateCheck counts violations; NULL predicate is a violation") {
    val df = Seq(Some(5.0), Some(-1.0), None, Some(0.0)).toDF("v")
    val got = reportMap(Quality.predicateCheck(df, "v_positive", col("v") > 0))
    assert(got === Map("v_positive" -> (3L, 4L))) // -1, NULL, 0
  }

  test("uniqueCheck counts duplicate occurrences beyond the first") {
    val df = Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("k")
    val got = reportMap(Quality.uniqueCheck(df, "k_unique", Seq("k")))
    assert(got === Map("k_unique" -> (3L, 6L))) // one extra 2, two extra 3s
  }

  test("uniqueCheck: NULL key components are violations (PK semantics)") {
    // matches ANSI count(*) - count(DISTINCT key), where DISTINCT ignores
    // NULLs: [1, 1, 2, NULL, NULL] has 2 distinct complete keys, so the
    // duplicate 1 AND both NULL-key rows violate — 3 of 5
    val df = Seq(Some(1L), Some(1L), Some(2L), None, None).toDF("k")
    val got = reportMap(Quality.uniqueCheck(df, "k_unique", Seq("k")))
    assert(got === Map("k_unique" -> (3L, 5L)))
    // multi-column keys: ANY null component disqualifies the key
    val df2 = Seq((Some(1L), Some("a")), (Some(1L), None), (None, Some("a")))
      .toDF("k1", "k2")
    val got2 = reportMap(Quality.uniqueCheck(df2, "kk", Seq("k1", "k2")))
    assert(got2 === Map("kk" -> (2L, 3L)))
  }

  test("empty tables report (0, 0), never NULL") {
    val empty = Seq.empty[(Long, Double)].toDF("k", "v")
    val rep = Quality.report(Seq(
      Quality.predicateCheck(empty, "p", col("v") > 0),
      Quality.uniqueCheck(empty, "u", Seq("k")),
      Quality.referentialCheck(empty, "k", Seq(1L).toDF("pk"), "pk", "r")))
      .collect()
    rep.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2), s"NULL in report row $r")
      assert(r.getLong(1) === 0L && r.getLong(2) === 0L, s"non-zero on empty: $r")
    }
  }

  test("referentialCheck counts orphans, skips NULL foreign keys") {
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = reportMap(Quality.referentialCheck(child, "fk", parent, "pk", "fk_ok"))
    assert(got === Map("fk_ok" -> (1L, 3L))) // 99 orphaned; NULL not checked
  }

  test("q98: the gate schema audits clean (zero violations on every constraint)") {
    val rep = reportMap(graft.queries.MaintenanceQueries
      .dataQualityReport(spark, "/root/testdata/sf0.001"))
    assert(rep.size === 5)
    // the generator emits a clean schema (even events.value carries no
    // NULLs at the gate SFs) — all five constraints must report zero;
    // planted-violation behavior is covered by the fixture tests above
    rep.foreach { case (c, (v, n)) =>
      assert(v === 0L && n > 0L, s"$c: $v violations of $n")
    }
  }

  test("report plan: no cartesian; referential check is a broadcast anti join") {
    val plan = graft.queries.MaintenanceQueries
      .dataQualityReport(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("LeftAnti"), s"no anti join in plan:\n$plan")
  }
}
