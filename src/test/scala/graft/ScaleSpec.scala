package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

/** Scale-path behaviors: partition pruning and salted joins. */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("date-partitioned write prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("part").toString
    Tables.events(spark, sf)
      .withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_date").parquet(dir)

    val read = spark.read.parquet(dir)
      .filter(col("event_date") === "2024-01-05")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_date"),
      s"no partition filter in plan:\n$plan")
    // pruned read touches a single partition directory
    val expected = Tables.events(spark, sf)
      .filter(to_date(col("ts")) === "2024-01-05").count()
    assert(read.count() === expected && expected > 0)
  }

  test("q202: funnel fold scans events once and shuffles user-keyed data once") {
    val q = graft.queries.Relational.funnelFold(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    // the whole funnel reads the fact table once, with the 4-type filter
    // pushed into the scan...
    assert(plan.split("Scan parquet").length - 1 === 1,
      s"expected exactly one events scan:\n$plan")
    assert(plan.contains("In(event_type"),
      s"the stage-type filter must reach the scan as PushedFilters:\n$plan")
    // ...and moves data-sized rows through exactly one exchange (the
    // user-keyed one); every other exchange carries <= 5 stage rows
    assert(plan.split("hashpartitioning\\(user_id").length - 1 === 1,
      s"expected exactly one user-keyed exchange:\n$plan")
    // same-oracle law: the fold output equals q201's join-chain output
    val chain = graft.queries.Relational.funnelBounded(spark, sf)
      .orderBy("stage").collect().toSeq
    val fold = q.orderBy("stage").collect().toSeq
    assert(fold === chain)
  }

  test("q190: the priority-layout read is directory-pruned, not row-filtered") {
    val q = graft.queries.Relational.priorityLayoutRevenue(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_orderpriority"),
      s"q190's priority predicate must ride PartitionFilters:\n$plan")
    // the partition column lives in the directory name, not the files:
    // the scan's read schema must not contain it
    assert(!plan.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,o_totalprice:double,o_orderdate:timestamp,o_orderpriority"),
      "partition column should not be read from file data")
    assert(q.count() > 0)
  }

  test("dynamic partition pruning: a selective dim filter prunes the partitioned fact scan") {
    // the runtime sibling of q190's static pruning: the fact side is
    // partitioned on priority, the filter lives on a DIM table, and the
    // fact scan must consume it as a DPP subquery instead of reading all
    // five directories
    val dir = java.nio.file.Files.createTempDirectory("dpp").toString
    Tables.orders(spark, sf).write.mode("overwrite")
      .partitionBy("o_orderpriority").parquet(dir)
    import spark.implicits._
    // the dim must be a FILE source: a LocalRelation's filter is folded
    // by ConvertToLocalRelation before the DPP rule looks for a
    // selective predicate, and no DPP subquery is inserted
    val dimDir = java.nio.file.Files.createTempDirectory("dppdim").toString
    Seq(("1-URGENT", "keep"), ("2-HIGH", "drop"), ("3-MEDIUM", "drop"),
      ("4-NOT SPECIFIED", "drop"), ("5-LOW", "drop"))
      .toDF("o_orderpriority", "verdict").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val fact = spark.read.parquet(dir)
    val q = fact.join(dim.filter(col("verdict") === "keep"), "o_orderpriority")
      .agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      s"expected a dynamic-pruning subquery on the fact scan:\n$plan")
    val expected = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").count()
    assert(q.collect()(0).getLong(0) === expected && expected > 0)
  }

  test("materialized IVF index: partition-pruned probes match in-memory IVF") {
    implicit val s = spark
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 10)
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString + "/index"
    val centers = graft.operators.Similarity.buildIvfIndex(emb, dir, cells = 8)
    val indexed = graft.operators.Similarity.ivfTopKIndexed(dir, centers, queries, 5, nProbe = 4)
    // the probed read must carry a partition filter on cell
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"probe not partition-pruned:\n$plan")
    val inMemory = graft.operators.Similarity
      .ivfTopK(emb, queries, 5, cells = 8, nProbe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fromIndex = indexed.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromIndex === inMemory)
  }

  test("IVF append: day-1 files untouched, probes equal a full rebuild (q99 law)") {
    implicit val s = spark
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sf)
    val centers = Similarity.fixedCenters(cells = 16, dim = 64)
    val base = java.nio.file.Files.createTempDirectory("ivfappend").toString
    val incrDir = s"$base/incr"; val fullDir = s"$base/full"

    // grow incrementally: day-1 build, day-2 append
    Similarity.writeIvfIndex(emb.filter(col("vec_id") % 2 === 0), incrDir, centers)
    def files(dir: String) = {
      val root = new java.io.File(dir)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else Seq(f)
      walk(root).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.length()).toMap
    }
    val day1Files = files(incrDir)
    Similarity.appendToIvfIndex(emb.filter(col("vec_id") % 2 === 1), incrDir, centers)
    val grownFiles = files(incrDir)
    // append is append: every day-1 data file survives byte-identical in
    // size, and the growth is strictly new files — no rewrite amplification
    day1Files.foreach { case (p, len) =>
      assert(grownFiles.get(p).contains(len), s"day-1 file rewritten: $p")
    }
    assert(grownFiles.size > day1Files.size, "append added no files")

    // probes against the grown index equal probes against a full rebuild
    Similarity.writeIvfIndex(emb, fullDir, centers)
    val queries = emb.filter(col("vec_id") >= 10 && col("vec_id") < 20)
    def probe(dir: String) = Similarity
      .ivfTopKIndexed(dir, centers, queries, 5, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(probe(incrDir) === probe(fullDir),
      "incrementally-grown index diverged from the full rebuild")
  }

  test("filtered ANN: predicate rides the pruned scan; pre-filter beats post-filter") {
    implicit val s = spark
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sf)
    val centers = Similarity.fixedCenters(cells = 16, dim = 64)
    val dir = java.nio.file.Files.createTempDirectory("ivffilt").toString + "/index"
    Similarity.writeIvfIndex(emb, dir, centers, metaCols = Seq("label"))

    val queries = emb.filter(col("vec_id") < 10)
    val evens = Seq(0, 2, 4, 6, 8).map(Integer.valueOf)
    val filtered = Similarity.ivfTopKIndexedFiltered(dir, centers, queries,
      k = 5, neighborFilter = col("label").isin(evens: _*), nProbe = 4)

    // the label predicate must reach the SAME partition-pruned scan —
    // a post-hoc join against a metadata table would show neither
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"probe lost its cell pruning:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("label"),
      s"label predicate not pushed into the scan:\n$plan")

    // semantics: top-5 among even-label neighbors only
    val rows = filtered.collect()
    assert(rows.length === 50, "every query should still fill k=5 from the filtered pool")
    val labels = emb.select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach(r => assert(labels(r.getLong(1)) % 2 === 0,
      s"odd-label neighbor leaked through: ${r.getLong(1)}"))

    // the recall trap the operator exists to avoid: post-filtering the
    // UNFILTERED top-5 must lose neighbors for at least one query
    val unfiltered = Similarity.ivfTopKIndexed(dir, centers, queries, 5, nProbe = 4)
    val postFiltered = unfiltered.collect()
      .filter(r => labels(r.getLong(1)) % 2 == 0)
      .groupBy(_.getLong(0)).map(_._2.length)
    assert(postFiltered.exists(_ < 5),
      "fixture too easy: post-filtering never starved a query, trap not exercised")
  }

  test("q160 hybrid-IVF: the quality verdict rides the pruned cell scan as a PushedFilter") {
    val df = graft.queries.Extensions.hybridSearchIvf(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"hybrid probe lost its cell pruning:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("verdict"),
      s"verdict predicate not pushed into the index scan:\n$plan")
    // semantics: every served neighbor really carries a keep verdict
    val keep = graft.queries.Curation
      .qualityRouteOn(Tables.documents(spark, sf))
      .filter(col("verdict") === "keep")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(keep.contains(r.getLong(1)),
      s"non-keep neighbor served: ${r.getLong(1)}"))
  }

  test("labeled IVF append: metaCols ride along; a meta-less append fails loudly") {
    implicit val s = spark
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sf)
    val centers = Similarity.fixedCenters(cells = 16, dim = 64)
    val base = java.nio.file.Files.createTempDirectory("ivflabelapp").toString
    val incrDir = s"$base/incr"; val fullDir = s"$base/full"
    val meta = Seq("label")
    Similarity.writeIvfIndex(emb.filter(col("vec_id") % 2 === 0), incrDir, centers,
      metaCols = meta)

    // forgetting the metaCols the index was built with must be an error,
    // not null labels that a filtered probe silently drops
    val ex = intercept[IllegalArgumentException] {
      Similarity.appendToIvfIndex(emb.filter(col("vec_id") % 2 === 1), incrDir, centers)
    }
    assert(ex.getMessage.contains("schema mismatch"), ex.getMessage)

    // same NAME but different TYPE must also fail — a name-only check
    // would append conflicting parquet schemas for `label`
    val retyped = emb.filter(col("vec_id") % 2 === 1)
      .withColumn("label", col("label").cast("string"))
    val ex2 = intercept[IllegalArgumentException] {
      Similarity.appendToIvfIndex(retyped, incrDir, centers, metaCols = meta)
    }
    assert(ex2.getMessage.contains("schema mismatch"), ex2.getMessage)

    // with metaCols the append ≡ rebuild law holds for FILTERED probes too
    Similarity.appendToIvfIndex(emb.filter(col("vec_id") % 2 === 1), incrDir, centers,
      metaCols = meta)
    Similarity.writeIvfIndex(emb, fullDir, centers, metaCols = meta)
    val queries = emb.filter(col("vec_id") >= 10 && col("vec_id") < 20)
    val evens = Seq(0, 2, 4, 6, 8).map(Integer.valueOf)
    def probe(dir: String) = Similarity
      .ivfTopKIndexedFiltered(dir, centers, queries, k = 5,
        neighborFilter = col("label").isin(evens: _*), nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probe(incrDir) === probe(fullDir),
      "labeled append diverged from the labeled full rebuild under a filtered probe")
  }

  test("AsOfJoinExec at sf0.1 under AQE: pre-partitioned left feeds the agg " +
    "with no new exchange") {
    // the AsOfExecSpec plan-shape claims, re-asserted at a realistic size
    // (~20k purchases / ~20k clicks from the 100k-row sf0.1 events table)
    // with AQE active and the left side pre-partitioned on the join key —
    // the deployment shape where the as-of's output partitioning must be
    // REUSED by the downstream per-key aggregate instead of re-shuffling
    val ev = Tables.events(spark, "/root/testdata/sf0.1")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .repartition(col("user_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val asof = graft.plans.AsOfExec.asOfBackward(purchases, clicks,
      "user_id", "ts", "ts", Seq("value"), "event_id", "click_")
    val agged = asof.groupBy("user_id")
      .agg(count(lit(1)).as("n"), count(col("click_value")).as("n_matched"))

    // run both to let AQE finalize, then compare FINAL plans: the
    // downstream aggregate must add zero exchanges over the bare as-of
    val nUsers = agged.count()
    asof.collect()
    def exchanges(df: org.apache.spark.sql.DataFrame) =
      "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size
    val (exAsof, exAgged) = (exchanges(asof), exchanges(agged))
    assert(exAgged <= exAsof,
      s"downstream agg added exchanges: asof=$exAsof agged=$exAgged\n" +
        agged.queryExecution.executedPlan.toString)
    // sanity at size: every purchasing user aggregates, matches are real
    val users = ev.filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(nUsers === users)
    assert(agged.agg(sum("n_matched")).head().getLong(0) > 0L)
  }

  test("q110 hot-key diagnosis: TakeOrdered top-20, broadcast 1-row total") {
    val df = graft.queries.ScaleJoins.hotJoinKeys(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-20 must be TakeOrdered, not a global sort:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    val got = df.collect()
    assert(got.length <= 20 && got.nonEmpty)
    // contributions are deg² and the total is the sum over ALL keys
    got.foreach(r => assert(r.getLong(2) === r.getLong(1) * r.getLong(1)))
    assert(got.map(_.getLong(3)).distinct.length === 1)
  }

  test("q105 fuzzy resolve and q106 salted revenue plan without nested loops") {
    for ((name, df) <- Seq(
        "q105" -> graft.queries.ScaleJoins.fuzzyResolve(spark, sf),
        "q106" -> graft.queries.ScaleJoins.saltedRevenue(spark, sf))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$name plans a nested loop:\n$plan")
    }
  }

  test("as-of join plans linear: one window over a union, no pair blow-up") {
    val df = graft.queries.Extensions.asofPurchaseClick(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the union + running-window form must never degenerate into a
    // time-range join (cartesian / broadcast-nested-loop = quadratic per key)
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in plan:\n$plan")
    assert(plan.contains("Window"), s"no window in plan:\n$plan")
    assert(plan.contains("Union"), s"no union in plan:\n$plan")
  }

  test("signature-index probe prunes to the 3 index columns, no cartesian") {
    implicit val s = spark
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("sigix").toString + "/index"
    graft.operators.Dedup.writeSignatureIndex(docs.filter(col("doc_id") % 2 === 0), dir)
    val probe = graft.operators.Dedup.nearDuplicatesAgainst(
      spark, dir, docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1))
    val plan = probe.queryExecution.executedPlan.toString
    // the historical side must stay a pruned columnar scan — re-reading
    // old text into candidate generation would defeat the incremental point
    val indexScans = plan.linesIterator.filter(l =>
      l.contains("Scan parquet") && l.contains("/index")).toList
    assert(indexScans.nonEmpty, s"no index scan found:\n$plan")
    assert(indexScans.forall(l => !l.contains("text")),
      s"index scan reads doc text:\n${indexScans.mkString("\n")}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"quadratic join in probe plan:\n$plan")
  }

  test("sign-LSH ANN: candidate union is id-only, no cartesian, queries broadcast") {
    val df = graft.queries.Extensions.annLshTopK(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"quadratic join in LSH plan:\n$plan")
    // the exact-cosine rank re-attaches the small query side by broadcast
    assert(plan.contains("BroadcastHashJoin"), s"query side not broadcast:\n$plan")
  }

  test("attribution interval join plans as an equi-join on user, no cartesian") {
    val plan = graft.queries.Extensions.attributionWindow(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"interval join must key on user_id, not pair-scan:\n$plan")
    // the time bounds ride the join as a range condition, not a post-filter
    // over a pair blow-up
    assert(plan.contains("Join") && plan.contains("user_id"),
      s"expected a keyed join on user_id:\n$plan")
  }

  test("tfidf: the only nested-loop is the broadcast 1-row corpus count") {
    val plan = graft.queries.Curation.tfidfTopTerms(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"no cartesian allowed:\n$plan")
    // the term-df attach must be a keyed join (shuffle or AQE-broadcast),
    // never a nested loop — only the single-row N frame may broadcast-loop
    val bnlj = plan.split("\n").count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 1, s"unexpected nested-loop joins:\n$plan")
  }

  test("rolling RANGE window shuffles once on user_id") {
    val plan = graft.queries.Extensions.rollingUserSpend(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = plan.split("\n").count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"expected exactly one hash exchange:\n$plan")
    assert(plan.contains("RangeFrame"), s"expected a RANGE frame:\n$plan")
  }

  test("runtime bloom-filter injection prunes the fact side of a selective dim join") {
    // the 100 TB knob: Spark injects a bloom filter built from the selective
    // (filtered) dim side into the fact-side scan, killing non-joining rows
    // BEFORE the shuffle. Off by default at toy scan sizes only because of
    // the application-side size threshold — zero it to prove the engine path
    // this library relies on for selective fact-dim joins at scale.
    val conf = spark.conf
    val old = Seq("spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // the injection rule targets probable SHUFFLE joins — it skips any
      // join whose build side is broadcastable by size, as a toy-scale dim
      // always is; at 100 TB the dim outgrows this threshold naturally
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey", "l_quantity")
      val p = Tables.part(spark, sf).filter(col("p_size") === 1)
        .select(col("p_partkey"), col("p_name"))
      // defeat the broadcast path so the runtime-filter rule (which targets
      // shuffle joins) applies, as it would when the dim outgrows the driver
      val joined = li.hint("merge")
        .join(p, col("l_partkey") === col("p_partkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") || optimized.contains("bloom_filter"),
        s"expected an injected bloom runtime filter in the optimized plan:\n$optimized")
      // and the filtered result is still exactly the join
      val expected = li.join(p, col("l_partkey") === col("p_partkey")).count()
      assert(joined.count() === expected && expected > 0)
    } finally old.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("salted join equals the plain join result") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, "l_orderkey")
    val salted = Skew.saltedJoin(li, o, "l_orderkey", salts = 4)
    assert(salted.count() === plain.count())
    assert(salted.agg(sum("l_quantity")).head.getDouble(0) ===
      plain.agg(sum("l_quantity")).head.getDouble(0))
  }
}
