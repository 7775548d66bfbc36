package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EditJoin

/** PassJoin-style edit-distance join (q105): exact equivalence to brute
  * force, planted-edit recovery, short-string/empty edge cases, and the
  * candidate-volume bound that keeps the blocking honest at scale. */
class EditJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference Levenshtein (full DP, no banding — the spec's ground truth
    * must not share shortcuts with the operator under test). */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def run(left: Seq[String], right: Seq[String], tau: Int) =
    EditJoin.editDistanceJoin(left.toDF("k"), "k", right.toDF("k"), "k", tau)
      .as[(String, String, Int)].collect().toSet

  private def brute(left: Seq[String], right: Seq[String], tau: Int) =
    (for { a <- left.distinct; b <- right.distinct; d = lev(a, b) if d <= tau }
      yield (a, b, d)).toSet

  test("planted edits: substitution, insertion, deletion, exact — all at tau=1") {
    val left = Seq("spark engine", "catalyst rule", "tungsten core")
    val right = Seq(
      "spark enginX",  // substitution of the last char
      "sparkX engine", // insertion mid-string
      "sprk engine",   // deletion
      "catalyst rule", // exact
      "tungsten gore", // substitution mid-string
      "volcano model") // unrelated — must NOT match
    val got = run(left, right, tau = 1)
    assert(got === brute(left, right, tau = 1))
    assert(got.map(_._2).intersect(Set("volcano model")).isEmpty)
    assert(got.size === 5)
  }

  test("randomized ≡ brute force at tau=1 and tau=2, mixed lengths 4..11") {
    val rnd = new scala.util.Random(42)
    def randStr() = {
      val n = 4 + rnd.nextInt(8)
      (1 to n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    }
    val left = Seq.fill(120)(randStr())
    val right = Seq.fill(120)(randStr())
    for (tau <- Seq(1, 2))
      assert(run(left, right, tau) === brute(left, right, tau),
        s"diverged from brute force at tau=$tau")
  }

  test("short and empty strings: lengths 0..3 at tau=2 (segments go empty)") {
    val rnd = new scala.util.Random(7)
    def randStr() =
      (1 to rnd.nextInt(4)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    val left = Seq.fill(60)(randStr()) :+ ""
    val right = Seq.fill(60)(randStr()) :+ ""
    assert(run(left, right, tau = 2) === brute(left, right, tau = 2))
  }

  test("duplicate keys collapse before blocking: pairs are distinct-string level") {
    val left = Seq("alpha", "alpha", "alpha", "beta")
    val right = Seq("alphX", "alphX", "beta")
    val got = run(left, right, tau = 1)
    assert(got === Set(("alpha", "alphX", 1), ("beta", "beta", 0)))
  }

  test("typo chains cluster transitively (q111 shape): a—a'—a'' one component") {
    val docs = Seq(
      (1L, "abcdefgh"), (2L, "abXdefgh"), (3L, "abXdefgY"), // chain: 1-2-3
      (4L, "unrelated"), (5L, "unrelated"),                 // exact dup pair
      (6L, "loner___"))
      .toDF("doc_id", "title")
    val pairs = EditJoin.editDistanceJoin(docs, "title", docs, "title", tau = 1)
    val edges = pairs
      .join(docs.select(col("doc_id").as("id_a"), col("title").as("s_key")), "s_key")
      .join(docs.select(col("doc_id").as("id_b"), col("title").as("r_key")), "r_key")
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b")
    val comp = graft.operators.Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ed(1,3)=2 — beyond tau — yet the chain through 2 merges them
    assert(comp(1L) === 1L && comp(2L) === 1L && comp(3L) === 1L)
    assert(comp(4L) === 4L && comp(5L) === 4L)
    assert(!comp.contains(6L), "loner has no edges; query coalesces it to itself")
  }

  test("segment index: append ≡ full rebuild, day-1 files untouched (q113 law)") {
    implicit val s = spark
    val rnd = new scala.util.Random(23)
    def randStr() =
      (1 to 10).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
    val registry = Seq.fill(150)(randStr())
    val qSeq = Seq.fill(80)(randStr())
    val queries = qSeq.toDF("k")
    val base = java.nio.file.Files.createTempDirectory("segidx").toString
    val incrDir = s"$base/incr"; val fullDir = s"$base/full"

    val (day1, day2) = registry.splitAt(75)
    EditJoin.writeSegmentIndex(day1.toDF("k"), "k", incrDir, tau = 1)
    def files(dir: String) = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.length()).toMap
    }
    val day1Files = files(incrDir)
    EditJoin.appendToSegmentIndex(day2.toDF("k"), "k", incrDir, tau = 1)
    val grown = files(incrDir)
    day1Files.foreach { case (p, len) =>
      assert(grown.get(p).contains(len), s"day-1 file rewritten: $p") }
    assert(grown.size > day1Files.size, "append added no files")

    EditJoin.writeSegmentIndex(registry.toDF("k"), "k", fullDir, tau = 1)
    def probe(dir: String) = EditJoin.probeSegmentIndex(queries, "k", dir, tau = 1)
      .as[(String, String, Int)].collect().toSet
    val incr = probe(incrDir)
    assert(incr === probe(fullDir), "grown index diverged from full rebuild")
    assert(incr === run(qSeq, registry, 1), "indexed probe diverged from direct join")
  }

  test("candidate volume stays far below the cross product on diverse keys") {
    val rnd = new scala.util.Random(13)
    def randStr() =
      (1 to 12).map(_ => ('a' + rnd.nextInt(16)).toChar).mkString
    val left = Seq.fill(200)(randStr())
    val right = Seq.fill(200)(randStr())
    val cands = EditJoin.candidatePairs(
      left.toDF("k"), "k", right.toDF("k"), "k", tau = 1).count()
    // 200×200 = 40 000 cross pairs; diverse 12-char keys over a 16-letter
    // alphabet should collide on a (r_len, seg_i, seg) key only rarely.
    // A lost length- or position-discipline shows up here as a blow-up.
    assert(cands < 2000, s"blocking lost its pruning power: $cands candidates")
  }
}
