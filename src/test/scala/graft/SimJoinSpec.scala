package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SimJoin

/** Exact prefix-filtered similarity join (q97): equivalence to the
  * brute-force answer, planted-pair behavior, and candidate-bounded plan. */
class SimJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def toDocTok(docs: Seq[(Long, Seq[String])]) =
    docs.flatMap { case (id, ts) => ts.distinct.map(t => (id, t)) }
      .toDF("id", "token")

  /** Reference: brute-force all-pairs Jaccard in plain Scala. */
  private def bruteForce(docs: Seq[(Long, Seq[String])], num: Int, den: Int) = {
    val sets = docs.map { case (id, ts) => id -> ts.distinct.toSet }.toMap
    (for {
      a <- sets.keys; b <- sets.keys if a < b
      c = (sets(a) & sets(b)).size
      if (den + num) * c >= num * (sets(a).size + sets(b).size)
    } yield (a, b, c.toLong, sets(a).size.toLong, sets(b).size.toLong)).toSet
  }

  test("planted pairs: exact dup found, partial overlap excluded, at tau=0.9") {
    val docs = Seq(
      1L -> Seq("a", "b", "c", "d", "e"),
      2L -> Seq("a", "b", "c", "d", "e"), // J(1,2)=1
      3L -> Seq("a", "b", "c", "x", "y"), // J(1,3)=3/7
      4L -> Seq("q", "r", "s", "t", "u"))
    val got = SimJoin.exactJaccardJoin(toDocTok(docs), 9, 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
  }

  test("equivalence with brute force on the gate corpus (tau=0.9 and tau=0.7)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .as[(Long, Seq[String])].collect().toSeq
    val docTok = toDocTok(docs)
    for ((num, den) <- Seq((9, 10), (7, 10))) {
      val got = SimJoin.exactJaccardJoin(docTok, num, den)
        .select("doc_a", "doc_b", "c", "na", "nb")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val want = bruteForce(docs, num, den)
      assert(got === want, s"tau=$num/$den: ${got.size} vs ${want.size} pairs")
      assert(want.nonEmpty)
    }
  }

  test("integer ceiling in the prefix bound (a float 0.9*n would misprefix n=10)") {
    // 12 tokens, J exactly 0.9 is impossible for small n, so craft J = 11/12+1... use
    // two 11-token docs sharing 10: J = 10/12 = 0.833 -> kept at tau=5/6, dropped at 9/10
    val docs = Seq(
      1L -> (1 to 11).map(i => s"t$i"),
      2L -> ((1 to 10).map(i => s"t$i") :+ "zz"))
    val at56 = SimJoin.exactJaccardJoin(toDocTok(docs), 5, 6)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val at910 = SimJoin.exactJaccardJoin(toDocTok(docs), 9, 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(at56 === Set((1L, 2L)) && at910 === Set.empty)
  }

  test("plan: candidates come from a token equi-join — no cartesian of documents") {
    val plan = graft.queries.Extensions.simJoinExact(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in plan:\n$plan")
  }
}
