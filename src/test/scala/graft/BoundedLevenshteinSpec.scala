package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.BoundedLevenshtein

/** The banded edit-distance verify primitive: exact ≡ the built-in
  * levenshtein wherever dist ≤ τ, sentinel τ+1 above, code-point
  * semantics, and codegen/interpreted/SQL agreement. */
class BoundedLevenshteinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("≡ built-in levenshtein below τ, sentinel above — random pairs, all τ in 0..3") {
    val rnd = new scala.util.Random(41)
    def randStr(n: Int, alpha: Int) =
      (1 to n).map(_ => ('a' + rnd.nextInt(alpha)).toChar).mkString
    // near pairs (small alphabet, similar lengths) + far pairs
    val pairs = Seq.tabulate(400) { i =>
      (randStr(rnd.nextInt(12), 3), randStr(rnd.nextInt(12), if (i % 2 == 0) 3 else 26))
    } ++ Seq(("", ""), ("", "ab"), ("abc", ""), ("same", "same"))
    val df = pairs.toDF("a", "b")
    for (tau <- 0 to 3) {
      val rows = df.select(col("a"), col("b"),
          BoundedLevenshtein.editBounded(col("a"), col("b"), tau).as("got"),
          levenshtein(col("a"), col("b")).as("want"))
        .collect()
      rows.foreach { r =>
        val (got, want) = (r.getInt(2), r.getInt(3))
        if (want <= tau) assert(got === want, s"τ=$tau ${r.getString(0)}/${r.getString(1)}")
        else assert(got === tau + 1, s"τ=$tau sentinel wrong for ${r.getString(0)}/${r.getString(1)}: $got (true $want)")
      }
    }
  }

  test("code-point semantics: astral-plane characters count as one edit") {
    val df = Seq(("a😀b", "ab"), ("a😀b", "a😁b"))
      .toDF("a", "b")
    val rows = df.select(
      BoundedLevenshtein.editBounded(col("a"), col("b"), 2).as("got"),
      levenshtein(col("a"), col("b")).as("want")).collect()
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("SQL function and interpreted eval agree with the column form") {
    GraftExtensions.register(spark)
    val sql = spark.sql(
      "SELECT graft_edit_bounded('kitten', 'sitten', 1)").collect().head.getInt(0)
    assert(sql === 1)
    assert(BoundedLevenshtein.compute("kitten", "sitting", 2) === 3) // over τ → sentinel
    assert(BoundedLevenshtein.compute("kitten", "sitting", 3) === 3) // exact at τ
  }

  test("EditJoin results unchanged under the banded verify (q105 contract)") {
    // the operator-level law: swapping the verify must not change the join
    val rnd = new scala.util.Random(17)
    def randStr() = (1 to 8).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val l = Seq.fill(120)(randStr()).toDF("k")
    val r = Seq.fill(120)(randStr()).toDF("k")
    val got = graft.operators.EditJoin.editDistanceJoin(l, "k", r, "k", tau = 1)
      .as[(String, String, Int)].collect().toSet
    val brute = l.select(col("k").as("a")).distinct()
      .crossJoin(r.select(col("k").as("b")).distinct())
      .withColumn("d", levenshtein(col("a"), col("b")))
      .filter(col("d") <= 1)
      .as[(String, String, Int)].collect().toSet
    assert(got === brute)
  }
}
