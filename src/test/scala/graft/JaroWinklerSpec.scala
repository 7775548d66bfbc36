package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.JaroWinkler

/** Native Jaro-Winkler (q191): the pinned doubles below are DuckDB
  * `jaro_winkler_similarity` outputs captured verbatim — bit-equality
  * against them IS the cross-engine parity contract the q191 gate relies
  * on (the oracle emits raw similarity doubles). */
class JaroWinklerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (a, b, duckdb jaro_winkler_similarity(a, b)) — exact doubles
  private val pinned = Seq(
    ("martha", "marhta", 0.9611111111111111), // textbook: 1 transposition, boost l=3
    ("dixon", "dicksonx", 0.8133333333333332), // textbook: boost l=2
    ("jellyfish", "smellyfish", 0.8962962962962964), // no common prefix, no boost
    ("dwayne", "duane", 0.8400000000000001),
    ("crate", "trace", 0.7333333333333334), // jaro > 0.7 but prefix 0 → unchanged
    ("ab", "abcdefghij", 0.7866666666666667), // boost l=2 at the window edge
    ("abcdxxxxxx", "abcyyyyyyy", 0.5333333333333333), // prefix 3 but jaro ≤ 0.7 → NO boost
    ("abc", "abc", 1.0),
    ("aa", "aa", 1.0),
    ("a", "b", 0.0),
    ("", "abc", 0.0),
    ("abc", "", 0.0),
    ("", "", 0.0)) // DuckDB's convention: empty-empty is 0, not 1

  test("pinned DuckDB doubles reproduce bit-for-bit (interpreted path)") {
    pinned.foreach { case (a, b, want) =>
      val got = JaroWinkler.compute(a, b)
      assert(java.lang.Double.doubleToLongBits(got) ===
        java.lang.Double.doubleToLongBits(want),
        s"compute($a, $b) = $got, want $want")
    }
  }

  test("codegen path matches the interpreted path and is symmetric") {
    val rnd = new scala.util.Random(13)
    val pairs = pinned.map(p => (p._1, p._2)) ++ (1 to 300).map { _ =>
      def w() = (1 to rnd.nextInt(14)).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
      (w(), w())
    }
    val out = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw"),
        JaroWinkler.jaroWinkler(col("b"), col("a")).as("wj"))
      .collect()
    out.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(JaroWinkler.compute(a, b)),
        s"codegen vs interpreted on ($a, $b)")
      assert(r.getDouble(2) === r.getDouble(3), s"symmetry on ($a, $b)")
    }
  }

  test("SQL surface: graft_jaro_winkler callable, null-safe") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_jaro_winkler('martha', 'marhta') AS jw, " +
        "graft_jaro_winkler(NULL, 'x') AS n").collect()(0)
    assert(r.getDouble(0) === 0.9611111111111111)
    assert(r.isNullAt(1))
  }

  test("q191 returns a non-empty linkage with every score at or above the bar") {
    val out = graft.queries.ScaleJoins.jwLinkage(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(2) >= graft.queries.ScaleJoins.jwThreshold)
      assert(r.getString(0) < r.getString(1), "canonical pair order")
    }
  }
}
