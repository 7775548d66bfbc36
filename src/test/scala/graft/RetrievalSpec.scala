package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lexical retrieval + RRF hybrid fusion (q173/q174): JVM recomputation
  * of the BM25-shaped score, fusion arithmetic recomputed from the
  * emitted ranks, the no-dropping law for single-modality candidates,
  * and self-exclusion. */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("lexical score recomputes from raw tf/df/len stats (q173)") {
    import graft.queries.Extensions.{lexK1, lexB}
    val docs = Tables.documents(spark, sf)
    val tf = docs.select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val dlen = tf.groupBy(_._1._1).map { case (d, m) => d -> m.values.sum }
    val dfreq = tf.groupBy(_._1._2).map { case (t, m) => t -> m.size.toLong }
    val nDocs = docs.count()
    val avg = dlen.values.sum.toDouble / nDocs.toDouble
    val got = graft.queries.Extensions.lexicalTopK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.nonEmpty)
    got.foreach { case ((q, d), score) =>
      assert(q !== d, "self must be excluded")
      val qTerms = tf.keys.filter(_._1 == q).map(_._2).toSet
      val shared = qTerms.filter(t => tf.contains((d, t)))
      // the engine's dsum quantization: floor each term to 1e-6, sum, /1e6
      val total = shared.toSeq.map { t =>
        val idf = ((nDocs - dfreq(t)).toDouble + 0.5) / (dfreq(t).toDouble + 0.5)
        val ts = idf * (tf((d, t)).toDouble * (lexK1 + 1.0)) /
          (tf((d, t)).toDouble + lexK1 * (1.0 - lexB + lexB * (dlen(d).toDouble / avg)))
        math.floor(ts * 1e6).toLong
      }.sum
      assert(total.toDouble / 1e6 === score, s"score($q, $d) diverges")
    }
  }

  test("plan: the persisted tf table serves all lexical consumers (one tokenize pass)") {
    val plan = graft.queries.Extensions.lexicalTopK(spark, sf)
      .queryExecution.executedPlan.toString
    // qterms, the candidate join side, dfreq, and dlen all read the
    // cached tf aggregate — without the persist each would re-tokenize
    // the corpus (the beyondThreshold lesson, round-10 verdict #3)
    val cacheScans = plan.split("InMemoryTableScan").length - 1
    assert(cacheScans >= 3, s"expected >= 3 cache scans of tf, got $cacheScans:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"stats must attach as a broadcast 1-row join, not a cartesian:\n$plan")
  }

  test("rrf recomputes from the emitted ranks; fusion keeps single-modality hits (q174)") {
    import graft.queries.Extensions.rrfK
    val rows = graft.queries.Extensions.rrfHybridTopK(spark, sf).collect()
    assert(rows.nonEmpty)
    var lexOnly = 0; var vecOnly = 0
    rows.foreach { r =>
      val rl = if (r.isNullAt(2)) None else Some(r.getInt(2))
      val rv = if (r.isNullAt(3)) None else Some(r.getInt(3))
      val want = rl.map(x => 1.0 / (rrfK + x)).getOrElse(0.0) +
        rv.map(x => 1.0 / (rrfK + x)).getOrElse(0.0)
      assert(want === r.getDouble(4), "rrf must equal its rank arithmetic")
      if (rl.isDefined && rv.isEmpty) lexOnly += 1
      if (rv.isDefined && rl.isEmpty) vecOnly += 1
      assert(rl.isDefined || rv.isDefined)
    }
    // the no-dropping law has teeth only if single-modality candidates
    // actually reach the fused top-k on this corpus — they do
    assert(lexOnly + vecOnly > 0,
      "expected at least one single-modality candidate in the fused top-k")
    // within a query, rank order follows (rrf desc, doc_id)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(5))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getDouble(4) > b.getDouble(4) ||
            (a.getDouble(4) == b.getDouble(4) && a.getLong(1) < b.getLong(1)))
        case _ =>
      }
    }
  }
}
