package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bloom

/** The oracle-exact Bloom filter (q114/q115): state determinism under
  * partitioning and sharded merge, the no-false-negative guarantee, the
  * false-positive rate against the textbook bound, and the semi-join
  * reduction law — prefilter + exact join ≡ plain join, with real pruning
  * and no shuffle in the prefilter stage. Deterministic hashes ⇒ exact
  * pins, not tolerances. */
class BloomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def wordMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("state is identical under repartitioning (mergeable bit_or)") {
    val cust = Tables.customer(spark, sf)
    val a = wordMap(Bloom.state(cust, col("c_custkey")))
    val b = wordMap(Bloom.state(cust.repartition(17), col("c_custkey")))
    val c = wordMap(Bloom.state(cust.union(cust), col("c_custkey")))
    assert(a.nonEmpty && a === b && a === c, "partitioning or duplicates changed the state")
  }

  test("sharded build ORs into the full build (merge ≡ rebuild)") {
    val cust = Tables.customer(spark, sf)
    val even = Bloom.state(cust.filter(col("c_custkey") % 2 === 0), col("c_custkey"))
    val odd = Bloom.state(cust.filter(col("c_custkey") % 2 === 1), col("c_custkey"))
    val merged = even.union(odd).groupBy("word")
      .agg(expr("bit_or(bits32)").as("bits32"))
    assert(wordMap(merged) === wordMap(Bloom.state(cust, col("c_custkey"))))
  }

  test("streaming build converges to the batch state (bit_or over micro-batches)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val keys = Tables.customer(spark, sf)
      .select(col("c_custkey")).as[Long].collect().toList
    val shuffled = new scala.util.Random(29).shuffle(keys)

    val in = MemoryStream[Long]
    val q = Bloom.state(in.toDF().withColumnRenamed("value", "k"), col("k"))
      .writeStream.format("memory").queryName("bloom_stream")
      .outputMode("complete")
      .start()
    try {
      shuffled.grouped(199).foreach { b => in.addData(b); q.processAllAvailable() }
      val got = wordMap(spark.table("bloom_stream"))
      val want = wordMap(Bloom.state(Tables.customer(spark, sf), col("c_custkey")))
      assert(got === want, "streamed words must equal the batch state")
    } finally q.stop()
  }

  test("native graft_bloom words equal the composed state word-for-word (q166 ≡ q114)") {
    graft.GraftExtensions.register(spark)
    val cust = Tables.customer(spark, sf)
    val composed = wordMap(Bloom.state(cust, col("c_custkey")))
    val words = cust.filter(col("c_custkey").isNotNull)
      .agg(graft.expressions.BloomWords.bloom(col("c_custkey")).as("ws"))
      .collect()(0).getSeq[Long](0)
    assert(words.length === Bloom.words)
    composed.foreach { case (w, bits) =>
      assert(words(w.toInt) === bits, s"word $w disagrees")
    }
    assert(words.count(_ != 0L) === composed.size,
      "native filter must not touch words the composed state leaves empty")
    // merge-order independence + SQL callability
    cust.createOrReplaceTempView("bloom_cust_v")
    val viaSql = spark.sql(
      "SELECT graft_bloom(c_custkey) AS ws FROM bloom_cust_v")
      .collect()(0).getSeq[Long](0)
    val viaRepart = cust.repartition(19)
      .agg(graft.expressions.BloomWords.bloom(col("c_custkey")).as("ws"))
      .collect()(0).getSeq[Long](0)
    assert(viaSql === words && viaRepart === words)
    // idempotence under duplicate delivery (bit_or, unlike CMS's sum)
    val viaDup = cust.union(cust)
      .agg(graft.expressions.BloomWords.bloom(col("c_custkey")).as("ws"))
      .collect()(0).getSeq[Long](0)
    assert(viaDup === words, "duplicate delivery must not change the filter")
  }

  test("native graft_bloom streaming complete-mode replay equals the batch words") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val keys = Tables.customer(spark, sf)
      .select(col("c_custkey")).as[Long].collect().toList
    val shuffled = new scala.util.Random(31).shuffle(keys)
    val in = MemoryStream[Long]
    val q = in.toDF().toDF("key")
      .agg(graft.expressions.BloomWords.bloom(col("key")).as("ws"))
      .writeStream.format("memory").queryName("bloom_native_stream")
      .outputMode("complete")
      .start()
    try {
      shuffled.grouped(137).foreach { b => in.addData(b); q.processAllAvailable() }
      val got = spark.table("bloom_native_stream").collect()(0).getSeq[Long](0)
      val want = keys.toDF("key")
        .agg(graft.expressions.BloomWords.bloom(col("key")).as("ws"))
        .collect()(0).getSeq[Long](0)
      assert(got === want, "streamed native words must equal batch")
    } finally q.stop()
  }

  test("plan: native bloom aggregate runs as ObjectHashAggregate, group-keyed exchange") {
    val df = graft.queries.Stats.bloomNativeState(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"graft_bloom must plan as ObjectHashAggregate:\n$plan")
    // the exchange is keyed on the group alone (16 KB word buffers move,
    // not k position rows per key — q114's composed form shuffles those)
    assert(plan.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning(c_mktsegment#") && !l.contains("word")),
      s"expected a group-keyed exchange carrying filter buffers:\n$plan")
  }

  test("no false negatives: every inserted key passes mightContain") {
    val cust = Tables.customer(spark, sf)
    val bf = Bloom.build(cust, col("c_custkey"))
    val missed = cust.filter(!Bloom.mightContain(col("c_custkey"), bf)).count()
    assert(missed === 0L, s"$missed inserted keys failed the membership test")
  }

  test("false-positive rate stays near the textbook bound") {
    val keys = (1L to 1000L).toDF("id")
    val bf = Bloom.build(keys, col("id"))
    // probe 20k keys guaranteed absent
    val absent = (1000001L to 1020000L).toDF("id")
    val fp = absent.filter(Bloom.mightContain(col("id"), bf)).count()
    val n = 1000.0 * Bloom.k
    val bound = math.pow(1.0 - math.exp(-n / Bloom.bits), Bloom.k)
    val rate = fp / 20000.0
    assert(rate <= 3 * bound + 0.001,
      f"fp rate $rate%.5f vs theoretical bound $bound%.5f")
  }

  test("semi-join reduction law: prefilter prunes but never loses a match (q115)") {
    val cust = Tables.customer(spark, sf).filter(col("c_mktsegment") === "BUILDING")
    val bf = Bloom.build(cust, col("c_custkey"))
    val orders = Tables.orders(spark, sf)
    val pre = orders.filter(Bloom.mightContain(col("o_custkey"), bf))

    // the prefilter is a row-local scan predicate: no shuffle, no join,
    // and the predicate compiles into whole-stage codegen (the starred
    // Filter), not an interpreted fallback
    val plan = pre.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"prefilter stage should be scan+filter only:\n$plan")
    assert(plan.contains("*(1) Filter"),
      s"mightContain should run inside WholeStageCodegen:\n$plan")

    val total = orders.count()
    val passed = pre.count()
    val matches = orders.join(cust.select("c_custkey"),
      col("o_custkey") === col("c_custkey")).count()
    assert(passed >= matches, "bloom dropped a true match")
    assert(passed <= (matches + (total * 0.02)).toLong,
      s"pruning too weak: $passed passed vs $matches matches of $total")

    // and the filtered join result equals the plain join result (integer
    // aggregates: a double sum would be order-dependent across the plans)
    val viaBloom = pre.join(cust.select("c_custkey"),
      col("o_custkey") === col("c_custkey"))
      .agg(count(lit(1)), sum("o_orderkey")).collect().head
    val plain = orders.join(cust.select("c_custkey"),
      col("o_custkey") === col("c_custkey"))
      .agg(count(lit(1)), sum("o_orderkey")).collect().head
    assert(viaBloom === plain, "bloom visible in the join result")
  }
}
