package graft

import org.scalatest.funsuite.AnyFunSuite

/** Randomized cross-checks of the round-10 operators against independent
  * in-memory reference implementations — the safety net under the (fixed
  * fixture) oracle rows: a bug the synthetic corpus happens not to
  * exercise fails here on generated data. Seeded Random (not ScalaCheck:
  * the offline cache has no scalatest bridge) — failures reproduce. */
class NewOpsPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("robust scaling: median/MAD match an in-memory order-statistic reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(20261L)
    (1 to 20).foreach { trial =>
      val n = 1 + rnd.nextInt(60)
      val rows = (0 until n).map { i =>
        ("t" + (i % 2), i.toLong, (rnd.nextInt(2001) - 1000).toDouble)
      }
      val got = graft.queries.Stats.robustScalingOn(
          rows.toDF("event_type", "event_id", "value"))
        .collect().map(r => r.getString(0) ->
          ((r.getAs[Long]("n"), r.getAs[Double]("median_value"),
            r.getAs[Double]("mad")))).toMap
      rows.groupBy(_._1).foreach { case (t, grp) =>
        // reference: rank-ceil(n/2) pick under (value, event_id); then the
        // same pick over (|v - med|, event_id)
        val sorted = grp.sortBy(r => (r._3, r._2))
        val med = sorted((sorted.size + 1) / 2 - 1)._3
        val devSorted = grp.map(r => (math.abs(r._3 - med), r._2)).sorted
        val mad = devSorted((devSorted.size + 1) / 2 - 1)._1
        assert(got(t) === ((grp.size.toLong, med, mad)),
          s"trial $trial group $t: got ${got(t)}, want (${grp.size}, $med, $mad)")
      }
    }
  }

  test("hard negatives: match an in-memory argmax reference on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242L)
    (1 to 10).foreach { trial =>
      val n = 3 + rnd.nextInt(20)
      // non-zero vectors only: a zero vector's cosine is NULL and the naive
      // reference below would need the same NULL ordering
      val rows = (0 until n).map { i =>
        val v = Array.fill(4)((rnd.nextInt(11) - 5).toFloat)
        if (v.forall(_ == 0f)) v(0) = 1f
        (i.toLong, v, rnd.nextInt(3))
      }
      val df = rows.toDF("vec_id", "embedding", "label")
      val got = graft.operators.Similarity.hardNegatives(df, df)
        .collect().map(r => r.getLong(0) -> ((r.get(1), r.get(3)))).toMap
      def cos(a: Array[Float], b: Array[Float]): Double = {
        val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
        d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
          math.sqrt(b.map(x => x.toDouble * x).sum))
      }
      rows.foreach { case (id, v, l) =>
        def best(pred: ((Long, Array[Float], Int)) => Boolean): Option[Long] =
          rows.filter(r => r._1 != id && pred(r))
            .sortBy(r => (-cos(v, r._2), r._1)).headOption.map(_._1)
        val (gp, gn) = got(id)
        assert(Option(gp).map(_.asInstanceOf[Long]) === best(_._3 == l),
          s"trial $trial anchor $id positive")
        assert(Option(gn).map(_.asInstanceOf[Long]) === best(_._3 != l),
          s"trial $trial anchor $id negative")
      }
    }
  }

  test("encoding audit counts match string-level reference counting") {
    import spark.implicits._
    val alphabet = "aZ .\u0001\u001F\uFFFD\u00E9\t5"
    val rnd = new scala.util.Random(777L)
    (1 to 20).foreach { trial =>
      val rows = (0 until (1 + rnd.nextInt(8))).map { i =>
        (i.toLong,
          (0 until rnd.nextInt(30)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      }
      val got = graft.queries.Extensions.encodingAuditOn(rows.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) ->
          ((r.getAs[Long]("n_replacement"), r.getAs[Long]("n_control")))).toMap
      rows.foreach { case (id, t) =>
        val repl = t.count(_ == '�').toLong
        val ctrl = t.count(c => c <= '\u001F' && c != '\t' && c != '\n' && c != '\r').toLong
        assert(got(id) === ((repl, ctrl)),
          s"trial $trial doc $id over ${t.map(_.toInt)}")
      }
    }
  }
}
