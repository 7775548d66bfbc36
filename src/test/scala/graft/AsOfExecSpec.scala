package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOf
import graft.plans.AsOfExec

/** The custom physical as-of join (AsOfJoinPlan → AsOfJoinStrategy →
  * AsOfJoinExec): the exec must be a drop-in for the composed
  * union+window form on every input the composed form defines — ties,
  * missing-match lefts, null keys, duplicate timestamps — and its plan
  * must be the merge shape (an AsOfJoinExec node, no window, no union),
  * with the left partitioning surviving for downstream reuse. */
class AsOfExecSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Row] = {
    val cols = df.columns.sorted.map(col).toSeq
    df.select(cols: _*).collect().toSeq.sortBy(_.toString)
  }

  private def purchasesClicks() = {
    val ev = Tables.events(spark, sf)
    (ev.filter(col("event_type") === "purchase")
       .select(col("event_id"), col("user_id"), col("ts")),
     ev.filter(col("event_type") === "click")
       .select(col("event_id"), col("user_id"), col("ts"), col("value")))
  }

  test("exec ≡ composed on the real events fixture (q47 shape, self-join)") {
    val (purchases, clicks) = purchasesClicks()
    def run(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        String, String, String, Seq[String], String, String) =>
        org.apache.spark.sql.DataFrame) =
      rows(f(purchases, clicks, "user_id", "ts", "ts",
        Seq("event_id", "value"), "event_id", "click_"))
    val composed = run(AsOf.asOfBackward)
    val exec = run(AsOfExec.asOfBackward)
    assert(composed.nonEmpty && exec === composed)
  }

  test("exec ≡ composed on adversarial data: ties, no-match lefts, null keys") {
    val left = Seq[(java.lang.Long, java.lang.Long, String)](
      (1L, 10L, "l1"),   // exact-tie time: inclusive, max tie-break wins
      (1L, 5L, "l2"),    // before any right row for the key → null carry
      (2L, 100L, "l3"),  // key with a single earlier right row
      (3L, 50L, "l4"),   // key absent on the right entirely
      (null, 10L, "l5"), // null key → passthrough with null carry
      (1L, null, "l6"),  // null time → passthrough
      (2L, 100L, "l7")   // duplicate left row: both must match identically
    ).toDF("k", "t", "tag")
    val right = Seq[(java.lang.Long, java.lang.Long, java.lang.Long, String)](
      (1L, 10L, 1L, "r-low"),   // same instant, lower tie
      (1L, 10L, 9L, "r-high"),  // same instant, higher tie → the winner at t=10
      (1L, 9L, 5L, "r-early"),
      (2L, 40L, 1L, "r-2"),
      (4L, 1L, 1L, "r-unused"),
      (null, 1L, 1L, "r-nullk"),   // dropped: null key
      (2L, null, 2L, "r-nullt"),   // dropped: null time
      (2L, 41L, null, "r-nulltie") // dropped: null tie
    ).toDF("k", "t", "tie", "payload")

    def run(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        String, String, String, Seq[String], String, String) =>
        org.apache.spark.sql.DataFrame) =
      rows(f(left, right, "k", "t", "t", Seq("payload", "tie"), "tie", "m_"))
    val composed = run(AsOf.asOfBackward)
    val exec = run(AsOfExec.asOfBackward)
    assert(exec === composed)
    // and pin the tie semantics directly, not just relatively
    val l1 = exec.find(_.toString.contains("l1")).get
    assert(l1.toString.contains("r-high"), s"tie winner wrong: $l1")
  }

  test("exec ≡ composed with STRING keys (held key must be copied off the sort buffer)") {
    // enough rows per partition that the sort iterator's row-buffer reuse
    // would corrupt a held-by-reference UTF8String key
    val rnd = new scala.util.Random(59)
    val left = Seq.tabulate(3000) { i =>
      (s"user_${rnd.nextInt(40)}", (rnd.nextInt(1000) * 2 + 1).toLong, i.toLong)
    }.toDF("k", "t", "lid")
    val right = Seq.tabulate(3000) { i =>
      (s"user_${rnd.nextInt(40)}", (rnd.nextInt(1000) * 2).toLong, i.toLong, rnd.nextDouble())
    }.toDF("k", "t", "rid", "payload")
    def run(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        String, String, String, Seq[String], String, String) =>
        org.apache.spark.sql.DataFrame) =
      rows(f(left, right, "k", "t", "t", Seq("rid", "payload"), "rid", "m_"))
    assert(run(AsOfExec.asOfBackward) === run(AsOf.asOfBackward))
  }

  test("exec ≡ composed under repartitioned, shuffled inputs") {
    val (purchases, clicks) = purchasesClicks()
    val a = rows(AsOfExec.asOfBackward(purchases, clicks, "user_id", "ts", "ts",
      Seq("event_id"), "event_id", "c_"))
    val b = rows(AsOfExec.asOfBackward(purchases.repartition(13).orderBy(desc("event_id")),
      clicks.repartition(7), "user_id", "ts", "ts",
      Seq("event_id"), "event_id", "c_"))
    assert(a === b)
  }

  test("plan shape: AsOfJoinExec merge, no window, no union, ≤2 exchanges") {
    val (purchases, clicks) = purchasesClicks()
    val df = AsOfExec.asOfBackward(purchases, clicks, "user_id", "ts", "ts",
      Seq("event_id", "value"), "event_id", "click_")
    val plan = df.queryExecution.executedPlan.toString
    // the exec node renders as "AsOfJoin" (Spark strips the Exec suffix);
    // this is the PHYSICAL plan string, so its presence IS the exec
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
    assert(!plan.contains("Window"), s"window machinery crept in:\n$plan")
    assert(!plan.contains("Union"), s"union widening crept in:\n$plan")
    assert("Exchange".r.findAllIn(plan).size <= 2, s"extra exchanges:\n$plan")
  }

  test("left partitioning survives: downstream per-key agg plans no new exchange") {
    val (purchases, clicks) = purchasesClicks()
    val agged = AsOfExec.asOfBackward(purchases, clicks, "user_id", "ts", "ts",
      Seq("value"), "event_id", "click_")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val plan = agged.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size <= 2,
      s"the aggregate after the as-of should reuse the key partitioning:\n$plan")
  }
}
