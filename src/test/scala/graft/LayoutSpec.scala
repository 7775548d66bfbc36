package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.ZOrderKey
import graft.operators.Layout
import graft.queries.LayoutQueries

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("interleave: known values, bit-exact") {
    // x=0b101 → even positions 0,2,4 = 1+0+16; y=0b011 → odd 1,3,5 = 2+8
    assert(ZOrderKey.interleave(5L, 3L, 3) === 27L)
    assert(ZOrderKey.interleave(0L, 0L, 21) === 0L)
    // single bits land at positions 2i (x) and 2i+1 (y)
    (0 until 21).foreach { i =>
      assert(ZOrderKey.interleave(1L << i, 0L, 21) === (1L << (2 * i)))
      assert(ZOrderKey.interleave(0L, 1L << i, 21) === (1L << (2 * i + 1)))
    }
    // bits above the width are ignored (caller owns range reduction)
    assert(ZOrderKey.interleave(1L << 21, 0L, 21) === 0L)
  }

  test("interleave is injective on the declared range (deinterleave roundtrip)") {
    def deinterleave(z: Long, bits: Int): (Long, Long) = {
      var x = 0L; var y = 0L
      (0 until bits).foreach { i =>
        x |= ((z >>> (2 * i)) & 1L) << i
        y |= ((z >>> (2 * i + 1)) & 1L) << i
      }
      (x, y)
    }
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val x = rnd.nextInt(1 << 21).toLong
      val y = rnd.nextInt(1 << 21).toLong
      assert(deinterleave(ZOrderKey.interleave(x, y, 21), 21) === ((x, y)))
    }
  }

  test("column API, SQL function, and oracle-mirror SQL all agree") {
    GraftExtensions.register(spark)
    val df = Tables.lineitem(spark, sf).limit(200)
      .select(col("l_partkey").as("x"), col("l_suppkey").as("y"))
    df.createOrReplaceTempView("zin")
    val viaColumn = df.select(ZOrderKey.zorder(col("x"), col("y"), 21).as("z"))
      .collect().map(_.getLong(0)).sorted
    val viaSqlFn = spark.sql("SELECT graft_zorder(x, y, 21) AS z FROM zin")
      .collect().map(_.getLong(0)).sorted
    val viaMirror = spark.sql(
      s"SELECT ${ZOrderKey.interleaveSql("x", "y", 21)} AS z FROM zin")
      .collect().map(_.getLong(0)).sorted
    assert(viaColumn === viaSqlFn)
    assert(viaColumn === viaMirror)
  }

  test("graft_zorder builder rejects wrong arity and out-of-range bits descriptively") {
    GraftExtensions.register(spark)
    Tables.lineitem(spark, sf).limit(5)
      .select(col("l_partkey").as("x"), col("l_suppkey").as("y"))
      .createOrReplaceTempView("zarity")
    val tooFew = intercept[Exception](
      spark.sql("SELECT graft_zorder(x) FROM zarity").collect())
    assert(tooFew.getMessage.contains("graft_zorder expects 2 to 3 arguments"),
      s"expected an arity message, got: ${tooFew.getMessage}")
    val badBits = intercept[Exception](
      spark.sql("SELECT graft_zorder(x, y, 40) FROM zarity").collect())
    assert(badBits.getMessage.contains("bits must be in [1, 31]"),
      s"expected a bits-range message, got: ${badBits.getMessage}")
  }

  test("zorderCluster plans one range exchange on the z-key and drops it from output") {
    val clustered = Layout.zorderCluster(Tables.lineitem(spark, sf),
      col("l_partkey"), col("l_suppkey"), 21, 16)
    val plan = clustered.queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 === 1,
      s"clustering must shuffle exactly once:\n$plan")
    assert(plan.contains("rangepartitioning(__graft_zval"),
      s"the one exchange must be a range partitioning on the z-key:\n$plan")
    // the clustering key is an internal artifact, not a published column
    assert(clustered.columns.toSeq === Tables.lineitem(spark, sf).columns.toSeq,
      s"zorderCluster must publish the caller's schema unchanged: ${clustered.columns.mkString(",")}")
    // a pre-existing user column named zval must survive clustering intact
    val withUserZval = Tables.lineitem(spark, sf).limit(50).withColumn("zval", lit(7))
    val out = Layout.zorderCluster(withUserZval, col("l_partkey"), col("l_suppkey"), 21, 4)
    assert(out.columns.contains("zval") && out.select("zval").distinct().collect()
      .map(_.getInt(0)).toSeq === Seq(7))
  }

  test("z-ordered partitions are tight on BOTH keys; a plain sort is not") {
    // a full 256×256 grid: both key domains equal, so the comparison
    // isolates the LAYOUT (the fixture's suppkey domain is 10 values —
    // too small for any 16-way split to slice further)
    val grid = spark.range(65536)
      .select((col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
      .cache()
    def meanSpans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val spans = df
        .withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
        .agg(avg("xs"), avg("ys")).collect()(0)
      (spans.getDouble(0), spans.getDouble(1))
    }
    val (zX, zY) = meanSpans(Layout.zorderCluster(grid, col("x"), col("y"), 21, 64))
    // z-clustered files: per-file span is a small slice of the domain on
    // BOTH dimensions — this is exactly what min/max skipping consumes
    assert(zX < 255.0 / 3, s"x span per z-file: $zX vs global 255")
    assert(zY < 255.0 / 3, s"y span per z-file: $zY vs global 255")
    // the lexicographic alternative: range-partition by x alone is tight
    // on x but leaves y spanning its whole domain
    val (lexX, lexY) = meanSpans(grid.repartitionByRange(64, col("x")))
    assert(lexX < 255.0 / 3)
    assert(lexY > 255.0 * 0.8,
      s"single-key layout should NOT cluster y: $lexY vs 255")
    grid.unpersist()
  }

  test("z-clustered layout prunes row groups on BOTH keys at read time; a single-key sort cannot") {
    // 64 one-row-group files over a 256x256 grid: the z-layout tiles the
    // plane ~32x32, so a point predicate on EITHER key touches ~8 files;
    // the x-sorted layout is perfect on x (1 file) but every file spans all
    // of y, so a y predicate reads the whole table
    val grid = spark.range(65536)
      .select((col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
    val base = java.nio.file.Files.createTempDirectory("zprune").toString
    val zdir = s"$base/z"; val xdir = s"$base/xsort"
    Layout.zorderCluster(grid, col("x"), col("y"), 21, 64).write.parquet(zdir)
    grid.repartitionByRange(64, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(xdir)

    // (a) stats-based: files whose [min, max] span contains the predicate —
    // exactly what footer min/max skipping consumes
    def filesContaining(dir: String, key: String, v: Int): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(key).as("lo"), max(key).as("hi"))
        .filter(col("lo") <= v && col("hi") >= v)
        .count()
    val zFiles = filesContaining(zdir, "x", 129) + filesContaining(zdir, "y", 129)
    val lexFiles = filesContaining(xdir, "x", 129) + filesContaining(xdir, "y", 129)
    assert(filesContaining(xdir, "y", 129) === 64, "x-sorted layout cannot skip any file on y")
    // ~8 files per key ideally; range-partition boundary SAMPLING can split
    // a tile across one extra file per key, so allow a little jitter — the
    // load-bearing claim is the 2x-vs-lexicographic comparison below
    assert(zFiles <= 26, s"z layout should touch ~8 files per key, touched $zFiles total")
    assert(zFiles * 2 < lexFiles, s"z files touched $zFiles vs single-key $lexFiles")

    // (b) the real read path: pushed filter -> parquet row-group skip; the
    // scan's numOutputRows counts rows surviving the skip
    def scanRows(dir: String, key: String): Long = {
      val df = spark.read.parquet(dir).filter(col(key) === 129)
      df.collect()
      val exec = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      exec.collectLeaves().head.metrics("numOutputRows").value
    }
    val zScanned = scanRows(zdir, "x") + scanRows(zdir, "y")
    val lexScanned = scanRows(xdir, "x") + scanRows(xdir, "y")
    assert(lexScanned > 65536, s"single-key layout must scan the full table for the y probe: $lexScanned")
    assert(zScanned * 2 < lexScanned,
      s"z layout scanned $zScanned rows for both probes vs $lexScanned single-key")
    info(s"rows scanned for an x-probe + y-probe: z-order $zScanned, single-key sort $lexScanned " +
      f"(${lexScanned.toDouble / zScanned}%.1fx)")
  }

  test("compact: many small files coalesce to the byte-targeted count, rows intact") {
    val base = java.nio.file.Files.createTempDirectory("compact").toString
    val smallDir = s"$base/small"; val outDir = s"$base/out"
    val src = Tables.events(spark, sf).select("event_id", "user_id", "value")
    src.repartition(64).write.parquet(smallDir)

    val fs = new org.apache.hadoop.fs.Path(smallDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(new org.apache.hadoop.fs.Path(smallDir))
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
      .map(_.getLen).sum
    val (before, after) = Layout.compact(spark, smallDir, outDir, totalBytes / 4)
    assert(before === 64)
    // ceil division target: 4 files (5 tolerated — parquet out ≈ in, not ==)
    assert(after >= 3 && after <= 5, s"expected ~4 files, got $after")
    val a = spark.read.parquet(outDir).collect().map(_.toString).sorted
    val b = src.collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("compact preserves clustering when given order keys: per-file ranges stay disjoint") {
    val base = java.nio.file.Files.createTempDirectory("compactz").toString
    val smallDir = s"$base/small"; val outDir = s"$base/out"
    Tables.events(spark, sf).select("event_id", "user_id")
      .repartition(32).write.parquet(smallDir)
    val totalBytes = new org.apache.hadoop.fs.Path(smallDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(new org.apache.hadoop.fs.Path(smallDir))
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
      .map(_.getLen).sum
    val (_, after) =
      Layout.compact(spark, smallDir, outDir, totalBytes / 4, Seq(col("event_id")))
    assert(after >= 2, s"need >=2 files to check disjointness, got $after")
    // range-partitioned + sorted output ⇒ per-file [min,max] don't overlap
    val spans = spark.read.parquet(outDir)
      .groupBy(input_file_name().as("f"))
      .agg(min("event_id").as("lo"), max("event_id").as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping file spans: $spans")
      case _ =>
    }
  }

  test("q76 buckets partition rows and nest inside the interleave geometry") {
    val rows = LayoutQueries.zorderStats(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total === Tables.lineitem(spark, sf).count())
    // each bucket's key ranges must fit the cell implied by its top bits:
    // bucket id >> drops zbucketShift low bits, i.e. keeps key bits above
    // shift/2 — so pk_min/pk_max (sk_min/sk_max) share those high bits
    val keyShift = LayoutQueries.zbucketShift / 2
    rows.foreach { r =>
      assert(r.getAs[Long]("pk_min") >> keyShift ===
        r.getAs[Long]("pk_max") >> keyShift,
        s"bucket ${r.getAs[Long]("zbucket")} partkey leaks its z-cell")
      assert(r.getAs[Long]("sk_min") >> keyShift ===
        r.getAs[Long]("sk_max") >> keyShift,
        s"bucket ${r.getAs[Long]("zbucket")} suppkey leaks its z-cell")
    }
  }

  test("q219 zone maps: data-skipping law — overlapping files alone serve a key-range query") {
    import org.apache.spark.sql.functions._
    val dir = graft.queries.LayoutQueries.zonedOrdersDir(spark, sf)
    val zones = graft.queries.LayoutQueries.zoneMapStats(spark, sf)
      .select("file_slice", "key_min", "key_max").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(zones.length === 8)
    // the layout is range-clustered: zones are pairwise disjoint
    val sorted = zones.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Array((_, _, aMax), (_, bMin, _)) =>
        assert(aMax < bMin, "zone spans overlap - the clustered write leaked")
      case _ =>
    }
    // pick a probe range spanning ~2 zones; serve it from ONLY the files
    // whose zone overlaps, and from the full scan - identical rows
    val lo = sorted(2)._2 + 1; val hi = sorted(3)._3 - 1
    val keep = zones.filter { case (_, mn, mx) => mx >= lo && mn <= hi }
      .map(_._1).sorted
    assert(keep.length < 8, "probe must prune at least one file")
    val prunedFiles = keep.map(i => f"$dir/slice$i%02d.parquet")
    val pruned = spark.read.parquet(prunedFiles: _*)
      .filter(col("o_orderkey").between(lo, hi))
      .orderBy("o_orderkey").collect().toSeq
    val full = spark.read.parquet(dir)
      .filter(col("o_orderkey").between(lo, hi))
      .orderBy("o_orderkey").collect().toSeq
    assert(pruned === full)
    assert(pruned.nonEmpty)
  }
}
