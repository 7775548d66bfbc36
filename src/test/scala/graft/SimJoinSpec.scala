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

  test("adversarial: rare-first prefixes keep candidates at ZERO where " +
    "common-first would blow up to ~all pairs") {
    // 200 docs, each = 8 tokens common to EVERY doc + 2 doc-unique rare
    // tokens. n=10, tau=9/10 -> prefix length 2. Correct (df asc, token)
    // ordering puts the two df=1 rare tokens in every prefix: no two
    // prefixes share a token, candidates = 0. Losing the rare-first sort
    // (df desc, or dropping df from the order) puts df=200 common tokens
    // there instead: C(200,2) = 19 900 candidates from one token alone.
    // This is the regression -> blow-up tripwire, not a timeout.
    val common = (1 to 8).map(i => s"common$i")
    val docs = (1L to 200L).map(i => i -> (common ++ Seq(f"rare${i}%03da", f"rare${i}%03db")))
    val docTok = toDocTok(docs)
    assert(SimJoin.candidatePairs(docTok, 9, 10).count() === 0L)
    // and the verified answer agrees with brute force (J = 8/12 < 0.9: none)
    assert(SimJoin.exactJaccardJoin(docTok, 9, 10).count() === 0L)
    assert(bruteForce(docs, 9, 10) === Set.empty)
  }

  test("adversarial: near-uniform frequencies — candidates stay within the " +
    "independently-computed prefix-collision bound") {
    // worst case for prefix filtering: every token has the SAME document
    // frequency, so rare-first has nothing rare to pick and prefixes stay
    // common. 150 docs of 10 consecutive tokens from a 100-token
    // round-robin vocabulary (df = 15 each). The theoretical candidate
    // bound is sum over tokens of C(pc(t), 2), pc(t) = docs with t in
    // their prefix — computed HERE in plain Scala from the operator's
    // documented ordering rule ((df, token) asc, prefix length
    // n - ceil(tau*n) + 1), so the operator's actual candidate count is
    // checked against an independent implementation, like bruteForce.
    val vocab = (0 until 100).map(i => f"v$i%02d")
    val docs = (0L until 150L).map { i =>
      i -> (0 until 10).map(j => vocab(((i * 7 + j) % 100).toInt))
    }
    val df = docs.flatMap(_._2.distinct).groupBy(identity).view.mapValues(_.size).toMap
    val prefixLen = 10 - (9 * 10 + 9) / 10 + 1 // n - ceil(0.9n) + 1 = 2
    val pc = docs.flatMap { case (_, ts) =>
      ts.distinct.sortBy(t => (df(t), t)).take(prefixLen)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = pc.values.map(c => c * (c - 1) / 2).sum
    val candidates = SimJoin.candidatePairs(toDocTok(docs), 9, 10).count()
    assert(candidates <= bound,
      s"candidates $candidates exceed the prefix-collision bound $bound")
    // the bound itself must certify real pruning: far below all-pairs
    assert(bound < 150L * 149L / 2 / 4,
      s"fixture degenerate: bound $bound is not far below all-pairs")
    // exactness unaffected by the adversarial shape
    val got = SimJoin.exactJaccardJoin(toDocTok(docs), 9, 10)
      .select("doc_a", "doc_b", "c", "na", "nb")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === bruteForce(docs, 9, 10))
  }

  test("plan: candidates come from a token equi-join — no cartesian of documents") {
    val plan = graft.queries.Extensions.simJoinExact(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in plan:\n$plan")
  }
}
