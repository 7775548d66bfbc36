package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Stats

/** The exact-statistics module (q79 histogram, q80 moments, q81 p99).
  * Edge cases run through the REAL query path: each test writes a crafted
  * `events.parquet` / `lineitem.parquet` into a temp SF dir and calls the
  * registered query function on it, so the Tables readers, binning, and
  * selection plumbing are all exercised, not a lookalike. */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmpSf(): String =
    java.nio.file.Files.createTempDirectory("statsf").toString

  /** (event_id, ts, user_id, event_type, value, props) with nullable value. */
  private def writeEvents(dir: String,
      rows: Seq[(Long, Long, Long, String, Option[Double], String)]): Unit = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def writeLineitem(dir: String,
      rows: Seq[(String, Double, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  /** Reference order statistic: the element at rank ceil(0.99 n) in
    * (value, event_id) order — the oracle formula, computed in plain Scala. */
  private def refP99(rows: Seq[(String, Double, Long)]): Map[String, (Long, Double)] =
    rows.groupBy(_._1).map { case (t, rs) =>
      val sorted = rs.map(r => (r._2, r._3)).sorted
      val rank = math.ceil(sorted.size * 0.99).toInt
      t -> (sorted.size.toLong, sorted(rank - 1)._1)
    }

  private def p99Rows(dir: String): Map[String, (Long, Double)] =
    Stats.p99PerType(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

  // --- q81 semantics -------------------------------------------------------

  test("q81: empty events yields no rows") {
    val d = tmpSf()
    writeEvents(d, Seq.empty)
    assert(Stats.p99PerType(spark, d).count() === 0)
  }

  test("q81: all-null values yield no rows; mixed nulls are excluded from n and rank") {
    val d = tmpSf()
    writeEvents(d, (1L to 4L).map(i => (i, i, i, "a", None: Option[Double], "")))
    assert(Stats.p99PerType(spark, d).count() === 0)

    val d2 = tmpSf()
    val vals = Seq(5.0, 1.0, 9.0, 3.0, 7.0, 2.0, 8.0, 4.0)
    writeEvents(d2,
      vals.zipWithIndex.map { case (v, i) => (i.toLong, i.toLong, 0L, "a", Some(v), "") } ++
        Seq((100L, 100L, 0L, "a", None, ""), (101L, 101L, 0L, "a", None, "")))
    // n counts non-null rows only; rank = ceil(8 * .99) = 8 -> the max
    assert(p99Rows(d2) === Map("a" -> (8L, 9.0)))
  }

  test("q81: single row and constant-valued group (min==max degenerate bin)") {
    val d = tmpSf()
    writeEvents(d,
      Seq((1L, 1L, 0L, "solo", Some(42.5), "")) ++
        (1L to 10L).map(i => (10 + i, i, 0L, "const", Some(7.0), "")))
    assert(p99Rows(d) === Map("solo" -> (1L, 42.5), "const" -> (10L, 7.0)))
  }

  test("q81: ties at the rank boundary break on event_id, matching the oracle order") {
    val d = tmpSf()
    // 100 rows, all value 1.0 except three 9.0s; rank = 99 -> the SECOND 9.0
    // in (value, event_id) order. A picked element, so the tie-break is load-bearing.
    val rows = (1L to 97L).map(i => (i, i, 0L, "t", Some(1.0), "")) ++
      Seq((200L, 1L, 0L, "t", Some(9.0), ""), (201L, 1L, 0L, "t", Some(9.0), ""),
        (202L, 1L, 0L, "t", Some(9.0), ""))
    writeEvents(d, rows)
    assert(p99Rows(d) === Map("t" -> (100L, 9.0)))
  }

  test("q81: randomized groups match the window-formula reference (ties included)") {
    val d = tmpSf()
    val rnd = new scala.util.Random(20260812L)
    // coarse value grid plants plenty of duplicate values across bins
    val rows = (1L to 3000L).map { i =>
      val t = s"t${rnd.nextInt(3)}"
      (i, i, 0L, t, Some((rnd.nextInt(500) * 17).toDouble / 7.0), "")
    }
    writeEvents(d, rows)
    val expected = refP99(rows.map(r => (r._4, r._5.get, r._1)))
    assert(p99Rows(d) === expected)
  }

  test("q81: approx_percentile lands within its accuracy bound of the exact answer") {
    // the exact query pins the semantics the sketch approximates: with
    // accuracy B the sketch's rank error is <= n/B; at sf0.001 n/B < 1, so
    // the sketch must return an element within +-2 ranks of the exact pick
    val exact = p99Rows(sf)
    val approx = Tables.events(spark, sf).filter(col("value").isNotNull)
      .groupBy("event_type")
      .agg(percentile_approx(col("value"), lit(0.99), lit(10000)).as("ap"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val byType = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select("event_type", "value", "event_id").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .groupBy(_._1)
    for ((t, (n, p99)) <- exact) {
      val sorted = byType(t).map(x => (x._2, x._3)).sorted
      val rank = math.ceil(n * 0.99).toInt
      val window = (math.max(1, rank - 2) to math.min(n.toInt, rank + 2))
        .map(r => sorted(r - 1)._1).toSet
      assert(window.contains(approx(t)),
        s"$t: approx ${approx(t)} outside +-2 ranks of exact $p99 ($window)")
    }
  }

  // --- q81 plan: the scale contract ----------------------------------------

  test("q81 plan: data-sized window only over bin-filtered candidates, no full-table group sort") {
    val plan = Stats.p99PerType(spark, sf).queryExecution.executedPlan.toString
    // the full-table shuffle must be on the high-cardinality composite
    // (event_type, ..., bin), never on event_type alone feeding a sort
    assert(plan.linesIterator.exists(l => l.contains("Exchange hashpartitioning(event_type#")
        && l.contains(", bin#")),
      s"no composite (event_type, bin) exchange in plan:\n$plan")
    // the selection window's input arrives through the target-bin broadcast
    // join — that filter is what makes the final sort candidate-sized
    assert(plan.linesIterator.exists(l => l.contains("BroadcastHashJoin [event_type#")
        && l.contains(", bin#")),
      s"no (event_type, bin) candidate join in plan:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"quadratic join in plan:\n$plan")
    // exactly two windows: cumulative bins (aggregated, bounded input) and
    // the in-bin selection; a third would mean a data-sized window crept back
    assert(plan.linesIterator.count(_.trim.startsWith("+- Window")) +
      plan.linesIterator.count(_.trim.startsWith(":- Window")) === 2,
      s"unexpected window count in plan:\n$plan")
  }

  // --- q79 / q80 -----------------------------------------------------------

  test("q79/q80: empty lineitem yields no rows") {
    val d = tmpSf()
    writeLineitem(d, Seq.empty)
    assert(Stats.priceHistogram(spark, d).count() === 0)
    assert(Stats.momentStats(spark, d).count() === 0)
  }

  test("q79: single row lands in the right bin with exact min/max/mean") {
    val d = tmpSf()
    writeLineitem(d, Seq(("A", 5.0, 12345.67)))
    val r = Stats.priceHistogram(spark, d).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getLong(row.fieldIndex("bin")) === 2L) // floor(12345.67 / 5000)
    assert(row.getLong(row.fieldIndex("n")) === 1L)
    assert(row.getDouble(row.fieldIndex("lo")) === 12345.67)
    assert(row.getDouble(row.fieldIndex("hi")) === 12345.67)
  }

  test("q80: constant column makes corr NULL (zero variance, DuckDB-aligned), cov_pop zero") {
    val d = tmpSf()
    writeLineitem(d, (1 to 5).map(i => ("A", i.toDouble, 100.0)))
    val row = Stats.momentStats(spark, d).collect().head
    assert(row.getDouble(row.fieldIndex("cov_pop")) === 0.0)
    assert(row.isNullAt(row.fieldIndex("corr")))
  }

  test("q79/q80 plans: ONE aggregate exchange, scan pruned to the aggregated columns") {
    val h = Stats.priceHistogram(spark, sf).queryExecution.executedPlan.toString
    assert(h.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1,
      s"q79 should shuffle exactly once:\n$h")
    assert(h.contains("ReadSchema: struct<l_extendedprice:double>"),
      s"q79 scan reads more than l_extendedprice:\n$h")
    val m = Stats.momentStats(spark, sf).queryExecution.executedPlan.toString
    assert(m.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1,
      s"q80 should shuffle exactly once:\n$m")
    assert(m.contains("l_returnflag") && m.contains("l_quantity"),
      s"q80 scan misses expected columns:\n$m")
  }

  // --- q92: the approximate twin -------------------------------------------

  test("q92: every approx quantile is within err_bound BELOW the exact order statistic") {
    // the approx answer is the target bin's lower edge, so exact ∈
    // [approx, approx + err_bound] — the advertised one-sided guarantee
    val rows = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select("event_type", "value", "event_id").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val byType = rows.groupBy(_._1)
    val approx = Stats.approxQuantiles(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet.map(_._1) === byType.keySet)
    for (((t, p), (ap, err)) <- approx) {
      val sorted = byType(t).map(x => (x._2, x._3)).sorted
      val exact = sorted(math.ceil(sorted.size * p).toInt - 1)._1
      assert(ap <= exact && exact <= ap + err,
        s"$t p=$p: exact $exact outside [$ap, ${ap + err}]")
    }
  }

  test("q92: quantiles are monotone in p within each group") {
    val byGroup = Stats.approxQuantiles(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .groupBy(_._1)
    for ((t, rs) <- byGroup) {
      val ordered = rs.sortBy(_._2).map(_._3)
      assert(ordered.sameElements(ordered.sorted), s"$t: non-monotone $ordered")
    }
  }

  test("q92 plan: one data-sized shuffle on the composite key, window only over aggregated bins") {
    val plan = Stats.approxQuantiles(spark, sf).queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("Exchange hashpartitioning(event_type#")
        && l.contains(", bin#")),
      s"no composite (event_type, bin) exchange:\n$plan")
    // ONE window (cumulative over ≤ p99Bins aggregated rows per group); the
    // exact twin needs a second selection window — this path must not
    assert(plan.linesIterator.count(_.contains("Window")) === 1,
      s"expected exactly one window:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  // --- q103: exact global percentile rank ------------------------------------

  test("q103: pct_rank matches percent_rank semantics on a tie-heavy fixture") {
    // ties share the minimal rank; pct = strictly_smaller / (n - 1)
    import spark.implicits._
    val d = tmpSf()
    Seq((1L, "a b"), (2L, "a b"), (3L, "a"), (4L, "a b c d"), (5L, "a b c"))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val got = Stats.lengthPctRank(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got === Map(
      3L -> (1L, 0.0),            // smallest
      1L -> (2L, 1.0 / 4.0),      // tied pair shares rank_below = 1
      2L -> (2L, 1.0 / 4.0),
      5L -> (3L, 3.0 / 4.0),
      4L -> (4L, 1.0)))           // largest
  }

  test("q203: regression matches a driver-side BigDecimal least squares") {
    // oracle-independent law: the distributed q/r-split slope/intercept
    // equal an exact BigDecimal regression over the same daily frame
    import java.math.{BigDecimal => JBD, MathContext}
    val daily = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100.0))
          .cast("long").as("c"))
      .join(Tables.orders(spark, sf).select(col("o_orderkey"),
        col("o_orderpriority"),
        datediff(col("o_orderdate").cast("date"), to_date(lit("1992-01-01")))
          .cast("long").as("x")), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority", "x").agg(sum("c").as("y"))
      .collect().groupBy(_.getString(0))
    val got = Stats.revenueTrend(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    daily.foreach { case (pri, rows) =>
      val n = JBD.valueOf(rows.length.toLong)
      def s(f: org.apache.spark.sql.Row => Long) =
        rows.map(r => JBD.valueOf(f(r))).reduce(_ add _)
      val sx = s(_.getLong(1)); val sy = s(_.getLong(2))
      val sxx = rows.map(r => JBD.valueOf(r.getLong(1)).pow(2)).reduce(_ add _)
      val sxy = rows.map(r => JBD.valueOf(r.getLong(1))
        .multiply(JBD.valueOf(r.getLong(2)))).reduce(_ add _)
      val den = n.multiply(sxx).subtract(sx.multiply(sx))
      val mc = new MathContext(50)
      val slope = n.multiply(sxy).subtract(sx.multiply(sy))
        .divide(den, mc).doubleValue / 100.0
      val icept = sy.multiply(sxx).subtract(sx.multiply(sxy))
        .divide(den, mc).doubleValue / 100.0
      val (days, gs, gi) = got(pri)
      assert(days === rows.length.toLong)
      assert(math.abs(gs - slope) <= math.ulp(slope).max(1e-12), s"$pri slope")
      assert(math.abs(gi - icept) <= 2 * math.ulp(icept).max(1e-9), s"$pri icept")
    }
  }

  test("q209: trend append path equals the full rebuild exactly") {
    // the semigroup law: persisted old-day sums + delta sums, merged,
    // produce BIT-identical coefficients to the one-pass rebuild
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    assert(rows(Stats.trendIncremental(spark, sf)) ===
      rows(Stats.revenueTrend(spark, sf)))
  }

  test("q214: interval union merges overlaps, keeps gaps, handles touching ends") {
    val d = tmpSf()
    // user 1: overlap + disjoint; user 2: exactly touching intervals
    val sec = 1000000000L // fixture ts longs are nanos (TESTDATA layout)
    writeEvents(d, Seq(
      (1L, 0L, 1L, "a", None, ""), (2L, 900L * sec, 1L, "a", None, ""),
      (3L, 10000L * sec, 1L, "a", None, ""),
      (4L, 0L, 2L, "a", None, ""), (5L, 1800L * sec, 2L, "a", None, "")))
    val got = graft.queries.Relational.intervalUnion(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // oracle-independent: a plain Scala sweep over the loader's own
    // timestamps (no assumption about the fixture's epoch unit)
    val byUser = Tables.events(spark, d)
      .selectExpr("user_id", "unix_millis(ts) AS ms", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val want = byUser.map { case (u, rows) =>
      val iv = rows.sortBy(r => (r._2, r._3)).map(r => (r._2, r._2 + 1800000L))
      var maxEnd = Long.MinValue; var covered = 0L
      iv.foreach { case (st, en) =>
        val prev = if (maxEnd == Long.MinValue) st else maxEnd
        covered += math.max(0L, en - math.max(st, prev))
        maxEnd = math.max(maxEnd, en)
      }
      u -> (rows.length.toLong, covered)
    }
    assert(got === want)
    // closed form on the touching user: two 30-min intervals meeting at
    // the boundary cover exactly 60 min, not 30 and not 60-minus-overlap
    assert(got(2L)._2 === 3600000L)
  }

  test("q204: spine is complete and forward fill carries the last active day") {
    val rows = Stats.calendarFill(spark, sf)
      .orderBy("o_orderpriority", "x").collect()
    rows.groupBy(_.getString(0)).foreach { case (pri, rs) =>
      val xs = rs.map(_.getLong(1))
      assert(xs.length.toLong === xs.max - xs.min + 1, s"$pri spine has gaps")
      var lastActive = -1L
      rs.foreach { r =>
        val (c, f) = (r.getLong(2), r.getLong(3))
        if (c > 0) lastActive = c
        assert(f === lastActive, s"$pri x=${r.getLong(1)} ffill")
      }
      assert(rs.head.getLong(2) > 0, s"$pri spine must start on an active day")
    }
  }

  test("q205: the kept set is the MINIMAL prefix covering 80% of revenue") {
    val got = Stats.paretoConcentration(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.nonEmpty)
    got.values.foreach { case (k, share) =>
      assert(k > 0 && share >= 0.8 && share <= 1.0)
    }
    // minimality on one region, recomputed from the raw ranking
    val perCust = Tables.orders(spark, sf)
      .select(col("o_custkey"), floor(col("o_totalprice") * 100.0).cast("long").as("c"))
      .groupBy("o_custkey").agg(sum("c").as("c"))
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "o_custkey", "c").collect()
      .groupBy(_.getString(0))
    perCust.foreach { case (region, rs) =>
      val sorted = rs.map(r => (r.getLong(2), r.getLong(1))).sortBy(t => (-t._1, t._2))
      val total = sorted.map(_._1).sum
      val k = got(region)._1.toInt
      val kept = sorted.take(k).map(_._1).sum
      assert(5L * kept >= 4L * total, s"$region kept set under 80%")
      assert(5L * (kept - sorted(k - 1)._1) < 4L * total, s"$region not minimal")
    }
  }

  test("q103 plan: no global ORDER BY partition — data-sized windows partition by bin") {
    val plan = Stats.lengthPctRank(spark, sf).queryExecution.executedPlan.toString
    // the scale contract: every single-partition exchange feeds only the
    // aggregated ≤ 4096-bin table, never the row stream. The row-stream
    // windows hash-partition on bin.
    assert(plan.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning(bin#")),
      s"no bin-partitioned exchange in plan:\n$plan")
    assert(plan.contains("Exchange SinglePartition") ||
      plan.contains("Exchange rangepartitioning"),
      s"expected the bounded bin-table window exchange:\n$plan")
    // the only nested loops are broadcasts of the 1-row global stats
    assert(!plan.contains("CartesianProduct"))
    val bnlj = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    val crossScalar = plan.linesIterator.count(l =>
      l.contains("BroadcastNestedLoopJoin") && l.contains("Cross"))
    assert(bnlj === crossScalar,
      s"non-scalar nested loop in plan:\n$plan")
  }
}
