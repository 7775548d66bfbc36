package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.EmbedPca

/** The PCA embedding projection (q132/q133): component sanity, the
  * live-fit ↔ pinned link, projection exactness properties, and the
  * row-local plan shape. */
class EmbedPcaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfFit = "/root/testdata/sf0.01" // the SF the components were pinned at

  test("pinned components are orthonormal (eigensolver sanity)") {
    val c = EmbedPca.pinnedComponents
    assert(c.size === EmbedPca.k && c.forall(_.size === 64))
    for (i <- c.indices; j <- i until c.size) {
      val dot = c(i).zip(c(j)).map { case (a, b) => a * b }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-10,
        s"components $i . $j dot $dot, expected $expect")
    }
  }

  test("q133 live projection at the pin SF equals q132 pinned projection row-for-row") {
    val live = graft.queries.MlQueries.pcaProjectLiveFrame(spark, sfFit)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val pinned = graft.queries.MlQueries.pcaProjectPinned(spark, sfFit)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(live.nonEmpty && live === pinned)
  }

  test("projection is layout-independent (row-local, order-free)") {
    val emb = Tables.embeddings(spark, sfFit)
    val a = EmbedPca.projectPinned(emb)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val b = EmbedPca.projectPinned(emb.repartition(13).orderBy(desc("vec_id")))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(a === b)
  }

  test("projection preserves most variance (the point of the operator)") {
    // deterministic data + deterministic projection → exact pin-style
    // floor: the k=8 subspace must carry a nontrivial share of total
    // squared norm. (Components are orthonormal, so projected energy ≤
    // total energy always — Bessel; the floor catches a broken fit.)
    val emb = Tables.embeddings(spark, sfFit)
    val vecD = transform(col("embedding"), x => x.cast("double"))
    val total = EmbedPca.projectPinned(emb)
      .join(emb.select(col("vec_id"),
        graft.operators.Similarity.dot(vecD, vecD).as("e")), "vec_id")
      .agg(
        sum((1 to EmbedPca.k).map(j => col(s"p$j") * col(s"p$j")).reduce(_ + _)).as("proj"),
        sum(col("e")).as("tot")).head()
    val ratio = total.getDouble(0) / total.getDouble(1)
    assert(ratio > 0.15 && ratio <= 1.0 + 1e-12,
      s"k=8/64 projected energy ratio $ratio outside (0.15, 1]")
  }

  test("pinned projection runs unchanged on a stream and equals the batch result") {
    // stateless row-local projection → the same operator is the streaming
    // embedding-ingest path with no code changes
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Tables.embeddings(spark, sfFit).select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toList
    val in = MemoryStream[(Long, Array[Float])]
    val q = EmbedPca.projectPinned(in.toDF().toDF("vec_id", "embedding"))
      .writeStream.format("memory").queryName("pca_stream").outputMode("append")
      .start()
    try {
      new scala.util.Random(11).shuffle(rows).grouped(200).foreach { b =>
        in.addData(b); q.processAllAvailable()
      }
      val got = spark.table("pca_stream")
        .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      val want = graft.queries.MlQueries.pcaProjectPinned(spark, sfFit)
        .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      assert(got === want, "streamed projections must equal batch bit-for-bit")
    } finally q.stop()
  }

  test("q132 plan: row-local projection over the scan, zero shuffles, no UDFs") {
    val plan = graft.queries.MlQueries.pcaProjectPinned(spark, sfFit)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"q132 must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"q132 must stay UDF-free:\n$plan")
  }
}
