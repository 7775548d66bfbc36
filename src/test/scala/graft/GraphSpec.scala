package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

/** Fixed-iteration PageRank (q96): fixed points, mass conservation,
  * quantized determinism, and the per-iteration plan shape. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sym(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("uniform graphs sit at the uniform fixed point") {
    // 2-clique and 4-cycle: every node keeps pr = 1/N exactly (up to the
    // 1e-12 quantization floor) at every iteration
    val two = Graph.pageRank(sym((1L, 2L)), 3)
      .collect().map(_.getDouble(1))
    two.foreach(p => assert(math.abs(p - 0.5) < 1e-11, s"2-clique pr $p"))
    val cycle = Graph.pageRank(sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)), 3)
      .collect().map(_.getDouble(1))
    cycle.foreach(p => assert(math.abs(p - 0.25) < 1e-11, s"4-cycle pr $p"))
  }

  test("star graph: center outranks leaves; mass is conserved") {
    val star = sym((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val pr = Graph.pageRank(star, 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(0L) > pr(1L) * 2, s"center should dominate: $pr")
    assert((1L to 4L).map(pr).distinct.size === 1, "leaves are symmetric")
    val mass = pr.values.sum
    assert(math.abs(mass - 1.0) < 1e-9, s"mass $mass")
  }

  test("scores are bit-identical across partitionings (quantized sums)") {
    val edges = sym((1L to 40L).flatMap(i =>
      Seq((i, i % 40 + 1), (i, (i * 7) % 40 + 1))).filter(p => p._1 != p._2): _*)
    def run(df: org.apache.spark.sql.DataFrame) =
      Graph.pageRank(df, 3).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val a = run(edges)
    val b = run(edges.repartition(13))
    assert(a === b, "pagerank must not drift with partitioning")
  }

  test("q96 returns 50 ranked parts with positive scores, descending") {
    val rows = graft.queries.MaintenanceQueries
      .copurchaseRank(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.length === 50)
    assert(rows.forall(_._2 > 0))
    assert(rows.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("plan: per-iteration joins are key equi-joins; no cartesian product") {
    val plan = Graph.pageRankPlan(sym((1L, 2L), (2L, 3L)), 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    // the only nested-loop is the broadcast of the 1-row node count
    val bnlj = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    val crossCount = plan.linesIterator.count(l =>
      l.contains("BroadcastNestedLoopJoin") && l.contains("Cross"))
    assert(bnlj === crossCount && bnlj <= 3,
      s"unexpected non-broadcast-scalar nested loops:\n$plan")
  }

  test("pageRank leaves no cache entries behind (session hygiene)") {
    // a long-lived session running many rankings must not accumulate
    // persisted graph/degree frames — the round-6 leak. Other suites
    // legitimately keep session caches (the ML fit memo), so the check is
    // RELATIVE: of the RDDs pageRank adds, only the node-count-sized
    // localCheckpoint of the result may remain — never the two
    // edge-shaped persists.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Graph.pageRank(sym((1L, 2L), (2L, 3L), (3L, 1L)), 3).count()
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.size <= 1,
      s"pageRank left ${added.size} persisted RDDs behind (expected at most " +
        "the checkpointed result)")
  }

  test("personalized: teleport mass stays near the seeds; uniform seeds ≡ pageRank shape") {
    // path graph 1—2—3—4—5, seed {1}. Per-node order oscillates on a
    // bipartite graph (mass ping-pongs between odd/even distances each
    // power iteration), so the robust claim is REGIONAL: the seed half
    // holds the bulk of the mass, the far end almost none
    val path = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val pr = Graph.personalizedPageRank(path, Seq(1L).toDF("node"), 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(1L) + pr(2L) > 3 * (pr(4L) + pr(5L)),
      s"mass should concentrate near the seed: $pr")
    val mass = pr.values.sum
    assert(mass > 0.99 && mass <= 1.0 + 1e-9, s"mass $mass") // quantization floors only shave
    // seeding EVERY node uniformly reproduces the global ranking's ORDER
    val all = Graph.personalizedPageRank(path, path.select(col("src").as("node")), 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val global = Graph.pageRank(path, 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(all.toSeq.sortBy(-_._2).map(_._1) === global.toSeq.sortBy(-_._2).map(_._1))
  }

  test("personalized: seeds outside the graph fail loudly; no cache left behind") {
    val g = sym((1L, 2L), (2L, 3L))
    val ex = intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(g, Seq(99L).toDF("node"), 2)
    }
    assert(ex.getMessage.contains("seed"), ex.getMessage)
    // cleanup check is RELATIVE (the established pageRank-hygiene
    // pattern): suites run concurrently in one session, so a global
    // cacheManager.isEmpty can observe another suite's legitimate cache
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Graph.personalizedPageRank(g, Seq(1L).toDF("node"), 2).count()
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.size <= 1,
      s"personalizedPageRank left ${added.size} persisted RDDs behind " +
        "(expected at most the checkpointed result)")
  }

  test("personalized: an EMPTY seed set fails loudly, not with all-zero scores") {
    // both anti-join guards pass vacuously on zero seeds; without the
    // count guard the teleport weight is 0 everywhere and the "ranking"
    // is silently all zeros (the degenerate q119 brand-matches-nothing case)
    val g = sym((1L, 2L), (2L, 3L))
    val ex = intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(g, spark.emptyDataset[Long].toDF("node"), 2)
    }
    assert(ex.getMessage.contains("at least one seed"), ex.getMessage)
  }

  test("directed edge list with dangling nodes fails loudly, not wrongly") {
    // node 3 has in-edges only: its mass would silently vanish (deg is
    // built from src). The guard must reject instead of mis-ranking.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val directed = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      Graph.pageRank(directed, 2)
    }
    assert(e.getMessage.contains("dangling"), e.getMessage)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty,
      "failed validation must still unpersist the graph and degree caches")
    // the same edges fed both ways are accepted
    assert(Graph.pageRank(sym((1L, 2L), (2L, 3L)), 2).count() === 3L)
  }

  private def und(pairs: (Long, Long)*) =
    pairs.map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .distinct.toDF("s", "t")

  test("triangles: known shapes enumerate exactly once, sorted") {
    // K4 = 4 triangles; each listed once as its sorted triple
    val k4 = und((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val tri = Graph.triangles(k4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tri === Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
    // a 4-cycle has wedges but no triangle
    assert(Graph.triangles(
      und((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))).count() === 0L)
    // triangle + pendant edge: exactly the one triangle
    val pend = Graph.triangles(und((1L, 2L), (2L, 3L), (1L, 3L), (3L, 9L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pend.toSeq === Seq((1L, 2L, 3L)))
  }

  test("clustering coefficient: clique = 1, pendant = 0, mixed exact") {
    // K4: every node d=3, tri=3, coeff = 6/6 = 1
    val k4 = und((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val cc4 = Graph.clusteringCoefficient(k4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(cc4.keySet === Set(1L, 2L, 3L, 4L))
    cc4.values.foreach { case (d, tri, c) =>
      assert(d === 3L); assert(tri === 3L); assert(c === 1.0)
    }
    // triangle 1-2-3 + pendant 3-9: corners of the triangle with d=2 score
    // 1, the junction (d=3, tri=1) scores 2/6 = 1/3 EXACTLY (one IEEE
    // division), the pendant (d=1, no wedge possible) scores 0
    val cc = Graph.clusteringCoefficient(
      und((1L, 2L), (2L, 3L), (1L, 3L), (3L, 9L))).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(cc(1L) === ((2L, 1L, 1.0)))
    assert(cc(2L) === ((2L, 1L, 1.0)))
    assert(cc(3L) === ((3L, 1L, 1.0 / 3.0)))
    assert(cc(9L) === ((1L, 0L, 0.0)))
  }

  test("label propagation: bridged cliques split at the bridge (q187 semantics)") {
    // two 3-cliques joined by bridge 3-4; hand-unrolled synchronous LPA
    // with min-label tie-break stabilizes by round 4 at {1,2,3}→1, {4,5,6}→3
    val g = und((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val out = Graph.labelPropagation(g, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("label propagation: synchronous rounds are exact (path oscillation pinned)") {
    // path 1-2-3 oscillates under synchronous updates — the fixed round
    // count is what makes the operator deterministic, so pin both phases
    val path = und((1L, 2L), (2L, 3L))
    def run(k: Int) = Graph.labelPropagation(path, k).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) === Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
    assert(run(2) === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("label propagation: identical labels across partitionings and broadcast modes") {
    val edges = und((1L to 30L).map(i => (i, i % 30 + 1)) ++
      (1L to 10L).map(i => (i, i + 15L)): _*)
      .filter(col("s") < col("t")).distinct()
    def run(df: org.apache.spark.sql.DataFrame, bc: Boolean) =
      Graph.labelPropagation(df, 3, broadcastLabels = bc).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSet
    val base = run(edges, bc = false)
    assert(run(edges.repartition(13), bc = false) === base)
    assert(run(edges.repartition(1), bc = true) === base)
  }

  test("ancestor closure: forest closes exactly; log-round doubling (q198)") {
    // forest: 1←{2,3}, 2←{4,5}, 4←8; separate tree 6←7
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 2L), (5L, 2L), (8L, 4L), (7L, 6L))
      .toDF("node", "parent")
    val got = Graph.ancestorClosure(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val parent = edges.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def path(n: Long): Seq[Long] =
      n +: parent.get(n).map(path).getOrElse(Seq.empty)
    val want = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)
      .flatMap(n => path(n).map(a => (n, a))).toSet
    assert(got === want)
    // deep chain: 0←1←2←…←20 — 21 levels must close fully (5 rounds)
    val chain = (1L to 20L).map(i => (i, i - 1)).toDF("node", "parent")
    val cl = Graph.ancestorClosure(chain).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantChain = (0L to 20L).flatMap(n => (0L to n).map(a => (n, a))).toSet
    assert(cl === wantChain)
  }

  test("hop distance: K rounds reach exactly the K-hop ball (q208 semantics)") {
    // path 1-2-3-4-5-6-7 plus a shortcut 1-4, plus an unreachable pair
    // 10-11. source = min node = 1. with K=4: dist(7) = min(6, via
    // shortcut 1-4-5-6-7 = 4); node beyond the ball and the island are
    // ABSENT, not infinite.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (1L, 4L), (10L, 11L)).toDF("s", "t")
    for (bc <- Seq(true, false)) {
      val got = Graph.hopDistance(edges, 4, broadcastDist = bc).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L,
        5L -> 2L, 6L -> 3L, 7L -> 4L), s"broadcast=$bc")
    }
    // K=2 truncates the ball: 6, 7 absent; relaxation is monotone so
    // the prefix agrees with the K=4 run
    val k2 = Graph.hopDistance(edges, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k2 === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 2L))
  }

  test("triangles: orientation bounds the wedge set on a skew hub") {
    // star hub 0 + one rim edge: raw wedges at the hub are C(40,2) = 780,
    // but degree-ordering directs every spoke INTO the hub, so the only
    // wedge is on the rim — count survives, fan-out doesn't explode.
    val star = (1L to 40L).map(i => (0L, i)) :+ (1L, 2L)
    val out = Graph.triangles(und(star: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((0L, 1L, 2L)))
  }
}
