package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.operators.{Maintenance => M}

/** Table-maintenance query surface (see [[graft.operators.Maintenance]]).
  *
  * The two snapshots are derived DETERMINISTICALLY from the customer table
  * by key arithmetic — both engines build byte-identical inputs, so the
  * diff/merge semantics are what the oracle checks, not data generation:
  *  - old snapshot: every customer except keys ≡ 3 (mod 10) — those appear
  *    only in the new snapshot, i.e. they are the INSERTS;
  *  - new snapshot: every customer except keys ≡ 5 (mod 13) (the DELETES),
  *    with `c_acctbal` bumped by 100.0 for keys ≡ 2 (mod 7) (the UPDATES;
  *    one IEEE double addition, identical cross-engine).
  */
object MaintenanceQueries {

  private def oldSnap(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_custkey") % 10 =!= 3)

  private def newSnap(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_custkey") % 13 =!= 5)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 7 === 2, col("c_acctbal") + 100.0)
          .otherwise(col("c_acctbal")))

  private val oldSnapSql =
    "SELECT * FROM customer WHERE c_custkey % 10 != 3"
  private val newSnapSql = """
    SELECT c_custkey, c_name, c_nationkey,
           CASE WHEN c_custkey % 7 = 2 THEN c_acctbal + 100.0
                ELSE c_acctbal END AS c_acctbal,
           c_mktsegment
    FROM customer WHERE c_custkey % 13 != 5"""

  // --- q192: versioned table, time travel -----------------------------------

  private val versionBuildLock = new Object

  /** The deterministic 3-commit log over orders (all in exact cents, so
    * the merged state is pure integers):
    *  - v0 base: (key, prio, status, cents = floor(price·100));
    *  - v1: tombstones for keys ≡ 0 (mod 13); upserts for the remaining
    *    keys ≡ 0 (mod 7) — status 'R', cents + 1000;
    *  - v2: upserts for keys ≡ 0 (mod 5) — status 'V2', cents + 500 —
    *    including keys v1 deleted (re-insert after delete is the
    *    semantics worth exercising).
    * Both engines can state the final as-of-v2 row for every key in
    * closed form, which is exactly what the oracle does. */
  private def versionedOrdersDir(s: SparkSession, d: String): String = {
    val root = Extensions.indexCacheDir("graft-version-cache", d, "orders", "log3v1")
    versionBuildLock.synchronized {
      if (!new java.io.File(s"$root/_GRAFT_LOG_READY").exists()) {
        // a crashed partial build leaves commits without the READY marker;
        // errorifexists would then wedge every rebuild — clear it first
        val rootFile = new java.io.File(root)
        if (rootFile.exists()) {
          import scala.reflect.io.Directory
          new Directory(rootFile).deleteRecursively()
        }
        val base = Tables.orders(s, d).select(
          col("o_orderkey"),
          col("o_orderpriority").as("prio"),
          col("o_orderstatus").as("status"),
          floor(col("o_totalprice") * lit(1e2)).cast("long").as("cents"),
          lit("u").as("_op"))
        graft.operators.Versioned.commit(base, root, "o_orderkey", 0)
        val v1 = base.filter(col("o_orderkey") % 13 === 0)
          .withColumn("_op", lit("d"))
          .unionByName(base
            .filter(col("o_orderkey") % 13 =!= 0 && col("o_orderkey") % 7 === 0)
            .withColumn("status", lit("R"))
            .withColumn("cents", col("cents") + 1000L))
        graft.operators.Versioned.commit(v1, root, "o_orderkey", 1)
        val v2 = base.filter(col("o_orderkey") % 5 === 0)
          .withColumn("status", lit("V2"))
          .withColumn("cents", col("cents") + 500L)
        graft.operators.Versioned.commit(v2, root, "o_orderkey", 2)
        new java.io.File(s"$root/_GRAFT_LOG_READY").createNewFile()
      }
    }
    root
  }

  /** Public handle on the q192 log root — specs assert the q220 erasure
    * laws (all-D feed, legal-hold time travel, destruction-on-compact)
    * against the same cached log the gates read. */
  def versionedOrdersRoot(s: SparkSession, d: String): String =
    versionedOrdersDir(s, d)

  /** q192: time travel over the commit log — the as-of-v2 state summed
    * per (priority, status). [[graft.operators.Versioned.readAt]] is one
    * union of delta scans plus ONE key-grouped max-by-version aggregate
    * (no per-commit join chain, no window sort), so a K-commit log costs
    * the same single shuffle as a plain dedup; the oracle recomputes the
    * final state in closed form from the commit rules above. Pure
    * integer output. */
  def timeTravelSummary(s: SparkSession, d: String): DataFrame = {
    val root = versionedOrdersDir(s, d)
    graft.operators.Versioned.readAt(s, root, "o_orderkey", 2)
      .groupBy(col("prio"), col("status"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("revenue_cents"))
  }

  val timeTravelSummarySql: String = """
    WITH fs AS (
      SELECT o_orderpriority AS prio,
             CASE WHEN o_orderkey % 5 = 0 THEN 'V2'
                  WHEN o_orderkey % 7 = 0 AND o_orderkey % 13 <> 0 THEN 'R'
                  ELSE o_orderstatus END AS status,
             CAST(floor(o_totalprice * 1e2) AS BIGINT) +
             CASE WHEN o_orderkey % 5 = 0 THEN 500
                  WHEN o_orderkey % 7 = 0 AND o_orderkey % 13 <> 0 THEN 1000
                  ELSE 0 END AS cents
      FROM orders
      WHERE o_orderkey % 5 = 0 OR o_orderkey % 13 <> 0)
    SELECT prio, status, count(*) AS n,
           CAST(sum(cents) AS BIGINT) AS revenue_cents
    FROM fs GROUP BY 1, 2"""

  /** q89: CDC between the two snapshots — one 'I'/'D'/'U' row per changed
    * key with old/new values for every attribute. One full-outer key join;
    * see [[graft.operators.Maintenance.snapshotDiff]]. */
  def snapshotDiff(s: SparkSession, d: String): DataFrame =
    M.snapshotDiff(oldSnap(s, d), newSnap(s, d), Seq("c_custkey"))

  val snapshotDiffSql: String = s"""
    WITH o AS ($oldSnapSql), n AS ($newSnapSql)
    SELECT COALESCE(n.c_custkey, o.c_custkey) AS c_custkey,
           CASE WHEN n.c_custkey IS NULL THEN 'D'
                WHEN o.c_custkey IS NULL THEN 'I'
                ELSE 'U' END AS change,
           o.c_name AS old_c_name,             n.c_name AS new_c_name,
           o.c_nationkey AS old_c_nationkey,   n.c_nationkey AS new_c_nationkey,
           o.c_acctbal AS old_c_acctbal,       n.c_acctbal AS new_c_acctbal,
           o.c_mktsegment AS old_c_mktsegment, n.c_mktsegment AS new_c_mktsegment
    FROM o FULL OUTER JOIN n ON o.c_custkey = n.c_custkey
    WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
       OR o.c_name       IS DISTINCT FROM n.c_name
       OR o.c_nationkey  IS DISTINCT FROM n.c_nationkey
       OR o.c_acctbal    IS DISTINCT FROM n.c_acctbal
       OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment"""

  /** q90: MERGE round-trip — applying the q89 changefeed to the old
    * snapshot must reproduce the new snapshot EXACTLY, which is what the
    * oracle (the new-snapshot SQL itself) asserts. The changefeed is tiny
    * next to the target, so the join side broadcasts at any scale. */
  def mergeRoundTrip(s: SparkSession, d: String): DataFrame = {
    val old = oldSnap(s, d)
    M.applyChanges(old, M.snapshotDiff(old, newSnap(s, d), Seq("c_custkey")),
      Seq("c_custkey"))
  }

  val mergeRoundTripSql: String = newSnapSql

  /** q120: schema-evolving MERGE — the q89 changefeed arrives carrying a
    * column the target never had (`c_tier`, stamped per change type), and
    * [[graft.operators.Maintenance.applyChangesEvolving]] widens the
    * target before applying: updated rows read 'gold', inserted rows
    * 'new', and every row the feed didn't touch keeps NULL — history is
    * never fabricated. The oracle derives the same tier from the two
    * snapshot definitions directly: 'new' for keys absent from the old
    * snapshot, 'gold' for keys the generator actually changed (the
    * %7 = 2 acctbal bump), NULL otherwise. */
  def evolveMerge(s: SparkSession, d: String): DataFrame = {
    val feed = M.snapshotDiff(oldSnap(s, d), newSnap(s, d), Seq("c_custkey"))
      .withColumn("new_c_tier",
        when(col("change") === "U", lit("gold"))
          .when(col("change") === "I", lit("new")))
    M.applyChangesEvolving(oldSnap(s, d), feed, Seq("c_custkey"))
  }

  val evolveMergeSql: String = s"""
    WITH o AS ($oldSnapSql), n AS ($newSnapSql)
    SELECT n.*,
           CASE WHEN o.c_custkey IS NULL THEN 'new'
                WHEN n.c_custkey % 7 = 2 THEN 'gold'
                ELSE NULL END AS c_tier
    FROM n LEFT JOIN o ON n.c_custkey = o.c_custkey"""

  /** q91: SCD2 order-status history per customer — consecutive equal
    * statuses (by order date, ties by order key) collapse into versioned
    * validity intervals; the open row is current. Windows partition on
    * `o_custkey` only (cardinality grows with the data, never a 5-value
    * sort — the q81 lesson applied at design time). Timestamps render as
    * strings so both engines hash identical bytes. */
  def scd2OrderStatus(s: SparkSession, d: String): DataFrame =
    M.scd2History(Tables.orders(s, d), Seq("o_custkey"), "o_orderstatus",
        "o_orderdate", Seq("o_orderkey"))
      .select(col("o_custkey"), col("o_orderstatus"), col("version"),
        date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
        col("is_current"))

  val scd2OrderStatusSql: String = """
    WITH runs AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             lag(o_orderstatus) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
      FROM orders),
    starts AS (
      SELECT * FROM runs WHERE prev IS DISTINCT FROM o_orderstatus),
    hist AS (
      SELECT o_custkey, o_orderstatus,
             row_number() OVER w AS version,
             o_orderdate AS vf,
             lead(o_orderdate) OVER w AS vt
      FROM starts
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
    SELECT o_custkey, o_orderstatus, version,
           strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(vt, '%Y-%m-%d %H:%M:%S') AS valid_to,
           (vt IS NULL) AS is_current
    FROM hist"""

  // --- q100: point-in-time status lookup against the SCD2 history -----------

  /** Each customer's order status AS OF the midpoint of their own order
    * history — the temporal join a feature store runs to read attributes
    * at an example's timestamp instead of leaking the current value. The
    * probe instant is derived deterministically per entity (integer-div
    * midpoint of min/max order-date micros, identical cross-engine), the
    * history is q91's, and the lookup is one entity-key equi-join with a
    * row-local interval predicate ([[graft.operators.Maintenance
    * .pointInTime]]). Every probe lands inside its own history (midpoint
    * ≥ first order), so the result is exactly one row per customer —
    * which the oracle recomputes independently. */
  def statusAsOf(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    val hist = M.scd2History(ord, Seq("o_custkey"), "o_orderstatus",
      "o_orderdate", Seq("o_orderkey"))
    val probes = ord.groupBy(col("o_custkey"))
      .agg(timestamp_micros(((unix_micros(min(col("o_orderdate")).cast("timestamp")) +
        unix_micros(max(col("o_orderdate")).cast("timestamp"))) / 2).cast("long"))
        .cast("timestamp_ntz").as("probe_ts"))
    M.pointInTime(hist, probes, Seq("o_custkey"))
      .select(col("o_custkey"), col("o_orderstatus"), col("version"),
        date_format(col("probe_ts"), "yyyy-MM-dd HH:mm:ss").as("probe_ts"))
  }

  val statusAsOfSql: String = """
    WITH runs AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             lag(o_orderstatus) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
      FROM orders),
    starts AS (
      SELECT * FROM runs WHERE prev IS DISTINCT FROM o_orderstatus),
    hist AS (
      SELECT o_custkey, o_orderstatus,
             row_number() OVER w AS version,
             o_orderdate AS vf,
             lead(o_orderdate) OVER w AS vt
      FROM starts
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
    probes AS (
      SELECT o_custkey,
             make_timestamp((epoch_us(min(o_orderdate))
                             + epoch_us(max(o_orderdate))) // 2) AS probe_ts
      FROM orders GROUP BY 1)
    SELECT h.o_custkey, h.o_orderstatus, h.version,
           strftime(p.probe_ts, '%Y-%m-%d %H:%M:%S') AS probe_ts
    FROM hist h JOIN probes p USING (o_custkey)
    WHERE h.vf <= p.probe_ts AND (h.vt IS NULL OR h.vt > p.probe_ts)"""

  // --- q95: incremental materialized-view maintenance -----------------------

  /** The orders fact table gets the same deterministic two-snapshot
    * treatment as the customer dimension: keys ≡ 3 (mod 10) arrive, keys
    * ≡ 5 (mod 13) leave, keys ≡ 2 (mod 7) reprice by +50.0 — and a
    * (priority, count, exact revenue) rollup maintained INCREMENTALLY from
    * the changefeed must equal the rollup recomputed from the new
    * snapshot, which is precisely what the oracle computes. Exact decimal
    * arithmetic end to end, so "equal" is bit-equal, at any parallelism. */
  private def oldOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).filter(col("o_orderkey") % 10 =!= 3)

  private def newOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).filter(col("o_orderkey") % 13 =!= 5)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 2, col("o_totalprice") + 50.0)
          .otherwise(col("o_totalprice")))

  private def cents(c: org.apache.spark.sql.Column) =
    floor(c * 100.0).cast(org.apache.spark.sql.types.DecimalType(27, 0))

  def incrementalRollup(s: SparkSession, d: String): DataFrame = {
    val view = oldOrders(s, d).groupBy(col("o_orderpriority").as("g"))
      .agg(count(lit(1)).as("cnt"), sum(cents(col("o_totalprice"))).as("s"))
    val diff = M.snapshotDiff(oldOrders(s, d), newOrders(s, d), Seq("o_orderkey"))
      .select(col("change"),
        col("old_o_orderpriority").as("old_g"), col("new_o_orderpriority").as("new_g"),
        cents(col("old_o_totalprice")).as("old_q"), cents(col("new_o_totalprice")).as("new_q"))
    M.incrementalAgg(view, diff)
      .select(col("g").as("o_orderpriority"), col("cnt").as("n_orders"),
        (col("s").cast("double") / 100.0).as("sum_price"))
  }

  val incrementalRollupSql: String = """
    SELECT o_orderpriority, count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100.0) AS DECIMAL(27,0))) AS DOUBLE)
             / 100.0 AS sum_price
    FROM (SELECT o_orderkey, o_orderpriority,
                 CASE WHEN o_orderkey % 7 = 2 THEN o_totalprice + 50.0
                      ELSE o_totalprice END AS o_totalprice
          FROM orders WHERE o_orderkey % 13 != 5)
    GROUP BY 1"""

  // --- q96: PageRank authority over the co-purchase graph -------------------

  /** Parts ranked by 3-iteration PageRank on the undirected co-purchase
    * graph (parts sharing an order), top 50: the canonical "authority
    * score" curation primitive, proven oracle-exact DESPITE being an
    * iterative float computation — see [[graft.operators.Graph.pageRank]].
    *
    * The co-purchase edge list is INDEX-STYLE OFFLINE MAINTENANCE, exactly
    * like the q31 IVF and q52 signature indexes: the lineitem self-join on
    * the order key (bounded per-order fanout, never all-pairs) plus its
    * two `distinct`s is a corpus-preparation job that runs once per
    * dataset fingerprint and materializes to parquet; the RANKING — K
    * edge-join + quantized-aggregate iterations — is the query. At 100 TB
    * the graph is a maintained artifact (rebuilt when the fact table
    * changes) and rankings are re-run against it with fresh damping or
    * iteration counts far more often than it is rebuilt. */
  val prIterations = 3

  private def graphCacheDir(d: String): String =
    Extensions.indexCacheDir("graft-graph-cache", d, "lineitem", "copurchasev2")

  private val graphBuildLock = new Object

  /** The maintained co-purchase graph artifact: `edges` = (src, dst, sdeg)
    * with each edge's source out-degree FUSED ON and rows clustered by dst
    * (the key every ranking iteration aggregates on), `deg` = (node, deg).
    * The dangling-node invariant is proven HERE, once, on the written
    * artifact — rankings serve with `validateDangling = false` instead of
    * re-scanning the corpus-sized edge list per query to re-prove an
    * invariant of the build. */
  private[graft] def copurchaseGraph(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val dir = graphCacheDir(d)
    graphBuildLock.synchronized {
      if (!(new java.io.File(s"$dir/edges/_SUCCESS").exists() &&
            new java.io.File(s"$dir/deg/_SUCCESS").exists())) {
        val e = Tables.lineitem(s, d).select("l_orderkey", "l_partkey").distinct()
        val pairs = e.as("a").join(e.as("b"), "l_orderkey")
          .filter(col("a.l_partkey") =!= col("b.l_partkey"))
          .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          pairs.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
            .repartition(4)
            .write.mode("overwrite").parquet(s"$dir/deg")
          val deg = s.read.parquet(s"$dir/deg")
          pairs
            .join(broadcast(deg.select(col("node").as("src"), col("deg").as("sdeg"))), "src")
            .select(col("src"), col("dst"), col("sdeg"))
            .repartition(col("dst"))
            .write.mode("overwrite").parquet(s"$dir/edges")
          // build-time dangling proof on the WRITTEN artifact (undirected
          // pairs make it true by construction; prove it anyway)
          val dangling = s.read.parquet(s"$dir/edges")
            .select(col("dst").as("node")).distinct()
            .join(deg.select("node"), Seq("node"), "left_anti").count()
          require(dangling == 0L,
            s"co-purchase graph build produced $dangling dangling node(s)")
        } finally pairs.unpersist(false)
      }
    }
    (s.read.parquet(s"$dir/edges"), s.read.parquet(s"$dir/deg"))
  }

  def copurchaseRank(s: SparkSession, d: String): DataFrame = {
    val (edgesDeg, deg) = copurchaseGraph(s, d)
    graft.operators.Graph.pageRankPrepared(edgesDeg, deg, prIterations,
        broadcastScores = true, validateDangling = false)
      .orderBy(col("pr").desc, col("node"))
      .limit(50)
  }

  val copurchaseRankSql: String = {
    def iterCte(prev: String, k: Int): String = s"""it$k AS (
      SELECT d.node,
             CAST(0.15 AS DOUBLE) / nn + CAST(0.85 AS DOUBLE) *
               (CAST(COALESCE(m.sq, 0) AS DOUBLE) / 1e12) AS pr
      FROM deg d CROSS JOIN n
      LEFT JOIN (
        SELECT p.dst AS node,
               SUM(CAST(floor(pp.pr / pd.deg * 1e12) AS DECIMAL(27,0))) AS sq
        FROM pairs p JOIN $prev pp ON pp.node = p.src
                     JOIN deg pd ON pd.node = p.src
        GROUP BY 1) m ON m.node = d.node)"""
    val ctes = (1 to prIterations)
      .map(k => iterCte(if (k == 1) "pr0" else s"it${k - 1}", k)).mkString(",\n")
    s"""
    WITH e AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
              FROM e a JOIN e b USING (l_orderkey)
              WHERE a.l_partkey <> b.l_partkey),
    deg AS (SELECT src AS node, count(*) AS deg FROM pairs GROUP BY 1),
    n AS (SELECT count(*) AS nn FROM deg),
    pr0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn AS pr FROM deg CROSS JOIN n),
    $ctes
    SELECT node, pr FROM it$prIterations ORDER BY pr DESC, node LIMIT 50"""
  }

  // --- q182: triangles in the frequent co-purchase graph --------------------

  /** Minimum co-occurrence support for a pair to count as a real edge:
    * parts sharing ONE order co-occur by chance; parts sharing ≥ 2 orders
    * are a repeated basket pattern. The threshold is also what makes
    * triangle listing tractable — it prunes the 1.2 M-edge raw
    * co-occurrence graph (sf0.1) to ~3.6 K frequent edges BEFORE the
    * wedge join, the same noise-floor move every frequent-itemset miner
    * makes (support pruning precedes structure mining). */
  val triMinSupport = 2

  private def supportGraphDir(d: String): String =
    Extensions.indexCacheDir("graft-graph-cache", d, "lineitem",
      s"trisupport${triMinSupport}v1")

  private val supportBuildLock = new Object

  /** Maintained artifact: canonical undirected frequent-co-purchase edges
    * `(s < t, c ≥ triMinSupport)` — the weighted sibling of
    * [[copurchaseGraph]] (which drops counts), built by the same
    * offline-maintenance discipline: the lineitem self-join on the order
    * key (per-order fanout bounded by basket size, never all-pairs) runs
    * once per dataset fingerprint; structure queries reuse the parquet. */
  private[graft] def copurchaseSupportEdges(s: SparkSession, d: String): DataFrame = {
    val dir = supportGraphDir(d)
    supportBuildLock.synchronized {
      if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
        val e = Tables.lineitem(s, d).select("l_orderkey", "l_partkey").distinct()
        e.as("a").join(e.as("b"), "l_orderkey")
          .filter(col("a.l_partkey") < col("b.l_partkey"))
          .groupBy(col("a.l_partkey").as("s"), col("b.l_partkey").as("t"))
          .agg(count(lit(1)).as("c"))
          .filter(col("c") >= triMinSupport)
          .coalesce(1)
          .write.mode("overwrite").parquet(dir)
      }
    }
    s.read.parquet(dir)
  }

  /** q182: every triangle in the frequent co-purchase graph, as sorted
    * part-key triples — cohesive 3-cliques of repeatedly co-bought parts,
    * the bundle/community signal layered on the same graph q96 ranks.
    * Degree-ordered orientation ([[graft.operators.Graph.triangles]])
    * makes each triangle enumerate exactly once with √m-bounded wedge
    * fan-out; the oracle replays the identical orientation as row-value
    * comparisons. Pure integer output — hash-exact by construction. */
  def copurchaseTriangles(s: SparkSession, d: String): DataFrame =
    graft.operators.Graph.triangles(copurchaseSupportEdges(s, d))
      .orderBy(col("pa"), col("pb"), col("pc"))

  /** The q182 support-graph + orientation + triangle CTE prefix, shared
    * verbatim by the triangle and clustering-coefficient oracles so the
    * two can never desynchronize on the graph definition. Defined BEFORE
    * every val that interpolates it (strict-val init order — the q139/q150
    * hazard class). */
  private val orientedCtesSql: String = s"""
    WITH e AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (SELECT a.l_partkey AS s, b.l_partkey AS t
              FROM e a JOIN e b ON a.l_orderkey = b.l_orderkey
              WHERE a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING count(*) >= $triMinSupport),
    deg AS (SELECT n, count(*) AS d FROM
              (SELECT s AS n FROM edges UNION ALL SELECT t FROM edges)
            GROUP BY 1),
    o AS (SELECT CASE WHEN (ds.d, s) < (dt.d, t) THEN s ELSE t END AS a,
                 CASE WHEN (ds.d, s) < (dt.d, t) THEN t ELSE s END AS b
          FROM edges JOIN deg ds ON ds.n = s JOIN deg dt ON dt.n = t),
    w AS (SELECT w1.a AS x, w1.b AS y, w2.b AS z
          FROM o w1 JOIN o w2 ON w2.a = w1.b),
    tri AS (SELECT x, y, z FROM w
            WHERE EXISTS (SELECT 1 FROM o WHERE o.a = w.x AND o.b = w.z))"""

  val copurchaseTrianglesSql: String = s"""
    $orientedCtesSql
    SELECT least(x, y, z) AS pa,
           x + y + z - least(x, y, z) - greatest(x, y, z) AS pb,
           greatest(x, y, z) AS pc
    FROM tri ORDER BY 1, 2, 3"""

  /** q186: local clustering coefficient per part in the frequent
    * co-purchase graph ([[graft.operators.Graph.clusteringCoefficient]]) —
    * which parts sit inside near-clique bundles (coefficient → 1) vs
    * organically popular hubs (→ 0). One IEEE division of exact integers
    * per node, so the coefficient column is hash-exact cross-engine. */
  def copurchaseClustering(s: SparkSession, d: String): DataFrame =
    graft.operators.Graph.clusteringCoefficient(copurchaseSupportEdges(s, d))
      .orderBy(col("node"))

  val copurchaseClusteringSql: String = s"""
    $orientedCtesSql,
    tn AS (SELECT node, count(*) AS tri FROM
             (SELECT x AS node FROM tri UNION ALL
              SELECT y FROM tri UNION ALL
              SELECT z FROM tri)
           GROUP BY 1)
    SELECT deg.n AS node, deg.d AS d, COALESCE(tn.tri, 0) AS tri,
           CASE WHEN deg.d >= 2
                THEN CAST(2 * COALESCE(tn.tri, 0) AS DOUBLE)
                       / CAST(deg.d * (deg.d - 1) AS DOUBLE)
                ELSE CAST(0 AS DOUBLE) END AS coeff
    FROM deg LEFT JOIN tn ON tn.node = deg.n
    ORDER BY node"""

  /** LPA rounds for q187 — fixed so the operator is a deterministic
    * function and the oracle can unroll the identical round count. 4
    * rounds spreads a label across a diameter-8 neighborhood patch; on
    * the support graph (tight near-clique bundles, q186's finding) the
    * bulk of memberships stabilize by round 2-3. */
  val lpIterations = 4

  /** q187: label-propagation communities in the frequent co-purchase
    * graph ([[graft.operators.Graph.labelPropagation]]) — the bundle
    * structure q182's triangles witness locally, lifted to whole groups:
    * after 4 synchronous most-frequent-neighbor-label rounds
    * (deterministic smallest-label tie-break) each part carries the id of
    * its densely-co-bought community. Labels broadcast (nodes ≪ edges in
    * the part-graph regime); the oracle unrolls the SAME 4 rounds as
    * CTEs with a (count DESC, label ASC) row_number argmax — pure
    * integers end to end, hash-exact by construction. */
  def copurchaseCommunities(s: SparkSession, d: String): DataFrame =
    graft.operators.Graph.labelPropagation(
        copurchaseSupportEdges(s, d), lpIterations, broadcastLabels = true)
      .orderBy(col("node"))

  val copurchaseCommunitiesSql: String = {
    val rounds = (1 to lpIterations).map { i =>
      s"""v$i AS (SELECT sym.dst AS node, l${i - 1}.lab, count(*) AS c
           FROM sym JOIN l${i - 1} ON l${i - 1}.node = sym.src GROUP BY 1, 2),
    l$i AS (SELECT node, lab FROM (
              SELECT node, lab, row_number() OVER (
                PARTITION BY node ORDER BY c DESC, lab ASC) AS rn FROM v$i)
            WHERE rn = 1)"""
    }.mkString(",\n    ")
    s"""
    WITH e AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (SELECT a.l_partkey AS s, b.l_partkey AS t
              FROM e a JOIN e b ON a.l_orderkey = b.l_orderkey
              WHERE a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING count(*) >= $triMinSupport),
    sym AS (SELECT s AS src, t AS dst FROM edges
            UNION ALL SELECT t, s FROM edges),
    l0 AS (SELECT DISTINCT src AS node, src AS lab FROM sym),
    $rounds
    SELECT node, lab AS community FROM l$lpIterations ORDER BY node"""
  }

  /** q195: the change data feed over the q192 commit log — net I/U/D
    * changes per version span, summarized per (span, op, status
    * transition) with exact cents totals. Serves from
    * [[graft.operators.Versioned.changeFeed]]: the delta tail collapsed
    * latest-per-key plus ONE reconstruction of the from-state (the
    * checkpoint-servable half), one key join to classify — never a diff
    * of two full snapshots. The oracle states every change in closed
    * form from the commit rules; the spec-side law (feed ≡ full-outer
    * state diff, no-ops dropped) is proven on every version pair in
    * VersionedSpec. Spans 0→1 and 1→2 together exercise D, U, I and the
    * re-insert-after-delete class. */
  def changeFeedSummary(s: SparkSession, d: String): DataFrame = {
    val root = versionedOrdersDir(s, d)
    def span(a: Int, b: Int, tag: String) =
      graft.operators.Versioned.changeFeed(s, root, "o_orderkey", a, b)
        .withColumn("span", lit(tag))
    span(0, 1, "0-1").unionByName(span(1, 2, "1-2"))
      .groupBy(col("span"), col("op"), col("old_status"), col("new_status"))
      .agg(count(lit(1)).as("n"),
        sum(coalesce(col("old_cents"), lit(0L))).as("sum_old_cents"),
        sum(coalesce(col("new_cents"), lit(0L))).as("sum_new_cents"))
  }

  val changeFeedSummarySql: String = """
    WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                         CAST(floor(o_totalprice * 1e2) AS BIGINT) AS c
                  FROM orders),
    chg AS (
      SELECT '0-1' AS span, 'D' AS op, st AS old_status,
             CAST(NULL AS VARCHAR) AS new_status,
             c AS old_cents, CAST(NULL AS BIGINT) AS new_cents
      FROM base WHERE k % 13 = 0
      UNION ALL
      SELECT '0-1', 'U', st, 'R', c, c + 1000
      FROM base WHERE k % 7 = 0 AND k % 13 <> 0
      UNION ALL
      SELECT '1-2', 'I', NULL, 'V2', NULL, c + 500
      FROM base WHERE k % 5 = 0 AND k % 13 = 0
      UNION ALL
      SELECT '1-2', 'U', CASE WHEN k % 7 = 0 THEN 'R' ELSE st END, 'V2',
             CASE WHEN k % 7 = 0 THEN c + 1000 ELSE c END, c + 500
      FROM base WHERE k % 5 = 0 AND k % 13 <> 0)
    SELECT span, op, old_status, new_status, count(*) AS n,
           CAST(sum(coalesce(old_cents, 0)) AS BIGINT) AS sum_old_cents,
           CAST(sum(coalesce(new_cents, 0)) AS BIGINT) AS sum_new_cents
    FROM chg GROUP BY 1, 2, 3, 4"""

  /** q217: the change feed SERVED FROM A COMPACTED CHECKPOINT — the claim
    * q195's scaladoc makes ("at scale, serve the from-state from a
    * compacted checkpoint") executed and gated: the q192 log is compacted
    * at v=1 into a one-commit checkpoint log, changeFeed(1,2) is served
    * from that checkpoint plus the live delta tail, and the summary must
    * equal the closed-form oracle of the UNCOMPACTED feed (q195's 1-2
    * span). Cost shape gated: the feed reads ONE base scan + one delta,
    * never the fold of the full live log. */
  def changeFeedCheckpointSummary(s: SparkSession, d: String): DataFrame = {
    val root = versionedOrdersDir(s, d)
    val ck = Extensions.indexCacheDir("graft-version-ck", d, "orders", "ckv1")
    versionBuildLock.synchronized {
      if (!new java.io.File(s"$ck/_GRAFT_LOG_READY").exists()) {
        val ckFile = new java.io.File(ck)
        if (ckFile.exists()) {
          import scala.reflect.io.Directory
          new Directory(ckFile).deleteRecursively()
        }
        graft.operators.Versioned.compact(s, root, "o_orderkey", 1, ck)
        new java.io.File(s"$ck/_GRAFT_LOG_READY").createNewFile()
      }
    }
    graft.operators.Versioned
      .changeFeedFromCheckpoint(s, ck, root, "o_orderkey", 1, 2)
      .groupBy(col("op"), col("old_status"), col("new_status"))
      .agg(count(lit(1)).as("n"),
        sum(coalesce(col("old_cents"), lit(0L))).as("sum_old_cents"),
        sum(coalesce(col("new_cents"), lit(0L))).as("sum_new_cents"))
  }

  val changeFeedCheckpointSummarySql: String = """
    WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                         CAST(floor(o_totalprice * 1e2) AS BIGINT) AS c
                  FROM orders),
    chg AS (
      SELECT 'I' AS op, CAST(NULL AS VARCHAR) AS old_status,
             'V2' AS new_status, CAST(NULL AS BIGINT) AS old_cents,
             c + 500 AS new_cents
      FROM base WHERE k % 5 = 0 AND k % 13 = 0
      UNION ALL
      SELECT 'U', CASE WHEN k % 7 = 0 THEN 'R' ELSE st END, 'V2',
             CASE WHEN k % 7 = 0 THEN c + 1000 ELSE c END, c + 500
      FROM base WHERE k % 5 = 0 AND k % 13 <> 0)
    SELECT op, old_status, new_status, count(*) AS n,
           CAST(sum(coalesce(old_cents, 0)) AS BIGINT) AS sum_old_cents,
           CAST(sum(coalesce(new_cents, 0)) AS BIGINT) AS sum_new_cents
    FROM chg GROUP BY 1, 2, 3"""

  /** q220: RIGHT-TO-BE-FORGOTTEN ERASURE over the versioned log — the
    * GDPR/CCPA deletion flow a lakehouse actually runs: the subject's
    * keys (here: o_orderkey ≡ 3 mod 17, standing in for "one customer's
    * rows") are erased by COMMITTING TOMBSTONES as the next log version —
    * an append, not a rewrite: time travel to v2 still serves the
    * pre-erasure state (legal-hold reads), readAt(v3) serves none of the
    * erased keys, and changeFeed(2,3) hands downstream consumers exactly
    * the D-ops they must replay (VersionedSpec/MaintenanceSpec pin both
    * laws). Cost shape: the erasure delta is subject-sized, the commit is
    * one atomic rename, and readers pay the same single key-grouped
    * shuffle as before — at 100 TB you never rewrite the table to forget
    * one user (compaction later physically drops the tombstoned rows — the
    * actual-destruction step — via the proven-equal [[q217]] checkpoint
    * path). Oracle: q192's closed form minus the erased keys. */
  def gdprErasureSummary(s: SparkSession, d: String): DataFrame = {
    val root = versionedOrdersDir(s, d)
    versionBuildLock.synchronized {
      if (!new java.io.File(s"$root/v=3").exists()) {
        val doomed = graft.operators.Versioned
          .readAt(s, root, "o_orderkey", 2)
          .filter(col("o_orderkey") % 17 === 3)
          .withColumn("_op", lit("d"))
        graft.operators.Versioned.commit(doomed, root, "o_orderkey", 3)
      }
    }
    graft.operators.Versioned.readAt(s, root, "o_orderkey", 3)
      .groupBy(col("prio"), col("status"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("revenue_cents"))
  }

  val gdprErasureSummarySql: String = """
    WITH fs AS (
      SELECT o_orderkey AS k, o_orderpriority AS prio,
             CASE WHEN o_orderkey % 5 = 0 THEN 'V2'
                  WHEN o_orderkey % 7 = 0 AND o_orderkey % 13 <> 0 THEN 'R'
                  ELSE o_orderstatus END AS status,
             CAST(floor(o_totalprice * 1e2) AS BIGINT) +
             CASE WHEN o_orderkey % 5 = 0 THEN 500
                  WHEN o_orderkey % 7 = 0 AND o_orderkey % 13 <> 0 THEN 1000
                  ELSE 0 END AS cents
      FROM orders
      WHERE o_orderkey % 5 = 0 OR o_orderkey % 13 <> 0)
    SELECT prio, status, count(*) AS n,
           CAST(sum(cents) AS BIGINT) AS revenue_cents
    FROM fs WHERE k % 17 <> 3 GROUP BY 1, 2"""

  /** q193 keep bar: directed rules with confidence ≥ 0.1 — the standard
    * post-support screen (support pruning already happened at graph
    * build: c ≥ [[triMinSupport]]). 0.1 sits just under the fixture's
    * p99 at the gate SFs (98–477 rules survive; max conf 0.14 at sf0.1
    * — baskets are wide, so absolute confidences run low). */
  val ruleMinConf = 0.1

  /** q193: association rules from the same maintained support artifact —
    * every directed rule ant→cons with support count, confidence
    * c(A,B)/n(A) and lift conf/(n(B)/N): the market-basket reading of
    * the co-purchase graph (Agrawal et al. 1993's output surface, over
    * pre-mined level-2 itemsets). Plan: the edges artifact scanned once,
    * both per-part order counts joined BROADCAST (parts ≪ orders), the
    * order total a broadcast 1-row scalar — zero data-sized shuffles
    * beyond the artifact build it shares with q182/q186/q187. All
    * divisions are IEEE on exact-integer-valued doubles in a pinned
    * order, so conf and lift hash-exact cross-engine. */
  def associationRules(s: SparkSession, d: String): DataFrame = {
    val e = Tables.lineitem(s, d).select("l_orderkey", "l_partkey").distinct()
    val np = e.groupBy(col("l_partkey").as("p")).agg(count(lit(1)).as("n"))
    val tot = e.agg(countDistinct("l_orderkey").as("nn"))
    val edges = copurchaseSupportEdges(s, d)
    val dir = edges.select(col("s").as("ant"), col("t").as("cons"), col("c"))
      .unionAll(edges.select(col("t").as("ant"), col("s").as("cons"), col("c")))
    val conf = col("c").cast("double") / col("na").cast("double")
    dir
      .join(broadcast(np.select(col("p").as("ant"), col("n").as("na"))), "ant")
      .join(broadcast(np.select(col("p").as("cons"), col("n").as("nc"))), "cons")
      .crossJoin(broadcast(tot))
      .filter(conf >= ruleMinConf)
      .select(col("ant"), col("cons"), col("c").as("support_cnt"),
        conf.as("conf"),
        (conf / (col("nc").cast("double") / col("nn").cast("double")))
          .as("lift"))
  }

  val associationRulesSql: String = s"""
    WITH e AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (SELECT a.l_partkey AS s, b.l_partkey AS t, count(*) AS c
              FROM e a JOIN e b ON a.l_orderkey = b.l_orderkey
              WHERE a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING count(*) >= $triMinSupport),
    np AS (SELECT l_partkey AS p, count(*) AS n FROM e GROUP BY 1),
    tot AS (SELECT count(DISTINCT l_orderkey) AS nn FROM e),
    dir AS (SELECT s AS ant, t AS cons, c FROM edges
            UNION ALL SELECT t, s, c FROM edges)
    SELECT ant, cons, c AS support_cnt,
           CAST(c AS DOUBLE) / CAST(na.n AS DOUBLE) AS conf,
           (CAST(c AS DOUBLE) / CAST(na.n AS DOUBLE)) /
             (CAST(nc.n AS DOUBLE) / CAST(nn AS DOUBLE)) AS lift
    FROM dir
    JOIN np na ON na.p = ant
    JOIN np nc ON nc.p = cons
    CROSS JOIN tot
    WHERE CAST(c AS DOUBLE) / CAST(na.n AS DOUBLE) >= $ruleMinConf"""

  /** q198: hierarchy rollup — subtree size and exact-cents balance for
    * every node of the deterministic customer tree parent(k) = ⌊k/2⌋
    * (root 0): the recursive-CTE workload, answered WITHOUT recursion
    * depth = join count. [[graft.operators.Graph.ancestorClosure]]
    * closes the ~14-level tree in ⌈log2 D⌉ pointer-doubling rounds; the
    * oracle IS the recursive CTE (DuckDB walks the same halving chain),
    * so the gate proves the log-round decomposition exact against the
    * depth-recursive formulation. One key join stitches balances on, one
    * aggregate rolls up. Pure integers. */
  def hierarchyRollup(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).select(col("c_custkey"),
      floor(col("c_acctbal") * lit(1e2)).cast("long").as("cents"))
    val edges = cust.filter(col("c_custkey") > 0)
      .select(col("c_custkey").as("node"),
        expr("c_custkey DIV 2").as("parent"))
    graft.operators.Graph.ancestorClosure(edges)
      .join(cust.select(col("c_custkey").as("node"), col("cents")), "node")
      .groupBy(col("a").as("ancestor"))
      .agg(count(lit(1)).as("n_desc"), sum(col("cents")).as("sum_cents"))
  }

  val hierarchyRollupSql: String = """
    WITH RECURSIVE anc AS (
      SELECT c_custkey AS node, c_custkey AS a FROM customer
      UNION ALL
      SELECT node, a // 2 FROM anc WHERE a > 0)
    SELECT anc.a AS ancestor, count(*) AS n_desc,
           CAST(sum(CAST(floor(c.c_acctbal * 1e2) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM anc JOIN customer c ON c.c_custkey = anc.node
    GROUP BY 1"""

  // --- q119: brand-seeded personalized PageRank -----------------------------

  /** q119: topic-sensitive authority — the q96 ranking with teleport mass
    * restricted to one brand's parts ("parts most associated with
    * Brand#13 baskets"), the seed-propagation form a curation pipeline
    * uses to spread trust from a vetted set over a co-occurrence graph.
    * Same cached offline graph, same quantized-exact iteration discipline
    * ([[graft.operators.Graph.personalizedPageRank]]); the oracle unrolls
    * the same three iterations with the seed teleport vector as a CTE.
    * Seeds are intersected with the node set up front — the operator
    * REQUIRES seeds to be graph nodes (a seed without out-edges would
    * leak its teleport mass; never-co-purchased parts simply aren't
    * seeds), and the oracle applies the same intersection. */
  def brandSeededRank(s: SparkSession, d: String): DataFrame = {
    val (edgesDeg, deg) = copurchaseGraph(s, d)
    // node-set intersection against the 20 K-row degree table, not a
    // 2.4 M-row edge distinct — same set by the artifact's construction
    val seeds = Tables.part(s, d).filter(col("p_brand") === "Brand#13")
      .select(col("p_partkey").as("node"))
      .join(deg.select("node"), Seq("node"), "left_semi")
    graft.operators.Graph.personalizedPageRankPrepared(edgesDeg, deg, seeds,
        prIterations, broadcastScores = true, validateDangling = false)
      .orderBy(col("pr").desc, col("node"))
      .limit(50)
  }

  val brandSeededRankSql: String = {
    def iterCte(prev: String, k: Int): String = s"""it$k AS (
      SELECT t.node,
             CAST(0.15 AS DOUBLE) * t.tw + CAST(0.85 AS DOUBLE) *
               (CAST(COALESCE(m.sq, 0) AS DOUBLE) / 1e12) AS pr
      FROM tp t
      LEFT JOIN (
        SELECT p.dst AS node,
               SUM(CAST(floor(pp.pr / pd.deg * 1e12) AS DECIMAL(27,0))) AS sq
        FROM pairs p JOIN $prev pp ON pp.node = p.src
                     JOIN deg pd ON pd.node = p.src
        GROUP BY 1) m ON m.node = t.node)"""
    val ctes = (1 to prIterations)
      .map(k => iterCte(if (k == 1) "pr0" else s"it${k - 1}", k)).mkString(",\n")
    s"""
    WITH e AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
              FROM e a JOIN e b USING (l_orderkey)
              WHERE a.l_partkey <> b.l_partkey),
    deg AS (SELECT src AS node, count(*) AS deg FROM pairs GROUP BY 1),
    seeds AS (SELECT DISTINCT p.p_partkey AS node
              FROM part p JOIN deg d ON d.node = p.p_partkey
              WHERE p.p_brand = 'Brand#13'),
    ns AS (SELECT count(*) AS ns FROM seeds),
    tp AS (SELECT d.node,
             CASE WHEN s.node IS NOT NULL THEN CAST(1.0 AS DOUBLE) / ns
                  ELSE CAST(0.0 AS DOUBLE) END AS tw
           FROM deg d CROSS JOIN ns LEFT JOIN seeds s ON s.node = d.node),
    pr0 AS (SELECT node, tw AS pr FROM tp),
    $ctes
    SELECT node, pr FROM it$prIterations ORDER BY pr DESC, node LIMIT 50"""
  }

  // --- q98: data-quality constraint report ----------------------------------

  /** Pre-publication audit of the star schema: key uniqueness,
    * referential integrity, domain predicates, completeness — each row of
    * the report one constraint with (violations, checked). See
    * [[graft.operators.Quality]]; the testdata is clean by construction,
    * so the EXPECTED report is all-zeros except the events value-null
    * completeness count, and any future drift in the generator surfaces
    * here as a red gate row. */
  def dataQualityReport(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Quality
    val cust = Tables.customer(s, d)
    val ord = Tables.orders(s, d)
    Quality.report(Seq(
      Quality.uniqueCheck(cust, "customer_pk_unique", Seq("c_custkey")),
      Quality.referentialCheck(ord, "o_custkey", cust, "c_custkey",
        "orders_fk_customer"),
      Quality.predicateCheck(Tables.lineitem(s, d), "lineitem_qty_positive",
        col("l_quantity") > 0),
      Quality.predicateCheck(ord, "orders_price_positive",
        col("o_totalprice") > 0),
      Quality.predicateCheck(Tables.events(s, d), "events_value_notnull",
        col("value").isNotNull)))
  }

  val dataQualityReportSql: String = """
    SELECT 'customer_pk_unique' AS check_name,
           count(*) - count(DISTINCT c_custkey) AS violations,
           count(*) AS checked
    FROM customer
    UNION ALL
    SELECT 'orders_fk_customer',
           count(*) FILTER (WHERE NOT EXISTS
             (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
           count(*)
    FROM orders o WHERE o_custkey IS NOT NULL
    UNION ALL
    SELECT 'lineitem_qty_positive',
           count(*) FILTER (WHERE NOT COALESCE(l_quantity > 0, FALSE)),
           count(*)
    FROM lineitem
    UNION ALL
    SELECT 'orders_price_positive',
           count(*) FILTER (WHERE NOT COALESCE(o_totalprice > 0, FALSE)),
           count(*)
    FROM orders
    UNION ALL
    SELECT 'events_value_notnull',
           count(*) FILTER (WHERE NOT COALESCE(value IS NOT NULL, FALSE)),
           count(*)
    FROM events"""

  // --- q108: anti-entropy bucket fingerprints -------------------------------

  private val HashP = 1000000007L

  /** Deterministic, cross-engine-exact row hash over every customer
    * attribute: Horner-fold the field hashes mod 1e9+7 — key, 31-bit poly
    * fingerprint of the strings, nationkey, and the balance as EXACT
    * cents (round(×100) is integral in both engines, so the later
    * double→long cast truncates and rounds to the same value). Max
    * intermediate ≈ 31·1e9, far under BIGINT overflow in either engine. */
  private def custRowHash: Column = {
    import graft.functions.TextFunctions
    Seq[Column](
      pmod(col("c_custkey"), lit(HashP)),
      TextFunctions.fingerprint(col("c_name")),
      pmod(col("c_nationkey").cast("long"), lit(HashP)),
      pmod(round(col("c_acctbal") * 100).cast("long"), lit(HashP)),
      TextFunctions.fingerprint(col("c_mktsegment")))
      .reduceLeft((acc, t) => pmod(acc * 31L + t, lit(HashP)))
  }

  private def custRowHashSql: String =
    Seq(
      s"(c_custkey % $HashP)",
      Extensions.fingerprintExprSqlOn("c_name"),
      s"(c_nationkey % $HashP)",
      s"(((CAST(round(c_acctbal * 100) AS BIGINT) % $HashP) + $HashP) % $HashP)",
      Extensions.fingerprintExprSqlOn("c_mktsegment"))
      .reduceLeft((acc, t) => s"((($acc) * 31 + ($t)) % $HashP)")

  /** q108: WHICH key buckets differ between the two snapshots — the
    * Merkle/anti-entropy answer ([[graft.operators.Maintenance
    * .bucketFingerprints]]). Each snapshot reduces to ≤1024 (bucket,
    * count, xor-fingerprint) rows with one local aggregate; only those
    * summaries are joined. The repair set then scopes a real
    * [[snapshotDiff]] to the divergent buckets — at 100 TB the "did
    * anything change, and where?" check moves KILOBYTES. */
  def bucketRepairSet(s: SparkSession, d: String): DataFrame =
    M.fingerprintDiff(
      M.bucketFingerprints(oldSnap(s, d), col("c_custkey"), custRowHash, 1024),
      M.bucketFingerprints(newSnap(s, d), col("c_custkey"), custRowHash, 1024))

  val bucketRepairSetSql: String = s"""
    WITH o AS ($oldSnapSql), n AS ($newSnapSql),
    ofp AS (SELECT c_custkey % 1024 AS bucket, count(*) AS n_rows,
                   bit_xor($custRowHashSql) AS fp
            FROM o GROUP BY 1),
    nfp AS (SELECT c_custkey % 1024 AS bucket, count(*) AS n_rows,
                   bit_xor($custRowHashSql) AS fp
            FROM n GROUP BY 1)
    SELECT COALESCE(ofp.bucket, nfp.bucket) AS bucket,
           COALESCE(ofp.n_rows, 0) AS old_n,
           COALESCE(nfp.n_rows, 0) AS new_n,
           ofp.fp AS old_fp, nfp.fp AS new_fp
    FROM ofp FULL OUTER JOIN nfp ON ofp.bucket = nfp.bucket
    WHERE COALESCE(ofp.n_rows, 0) != COALESCE(nfp.n_rows, 0)
       OR ofp.fp IS DISTINCT FROM nfp.fp"""

  /** q109: the fingerprint-SCOPED diff — the composition q108 exists for.
    * Each snapshot is semi-joined down to the divergent buckets (the
    * repair set broadcasts: ≤1024 rows by construction) and only that
    * slice pays the full-outer diff join. Equals the GLOBAL q89 diff —
    * the oracle IS q89's SQL — because every changed key lives in a
    * bucket whose count or xor fingerprint moved (xor cancellation across
    * multiple changes in one bucket is the standard anti-entropy residual
    * risk: 2^-63-ish per bucket, and the gate pins this data exactly).
    * At 100 TB: kilobytes of summaries decide, then the diff shuffles
    * only the divergent slice instead of two full tables. */
  def scopedDiff(s: SparkSession, d: String): DataFrame = {
    val repair = broadcast(bucketRepairSet(s, d).select("bucket"))
    def scoped(snap: DataFrame) = snap
      .withColumn("bucket", pmod(col("c_custkey"), lit(1024L)))
      .join(repair, Seq("bucket"), "left_semi")
      .drop("bucket")
    M.snapshotDiff(scoped(oldSnap(s, d)), scoped(newSnap(s, d)), Seq("c_custkey"))
  }

  /** BFS rounds for q208 — fixed so the operator is a deterministic
    * function and the oracle can unroll the identical round count (the
    * q187 discipline). 4 relaxations reach the 4-hop neighborhood of
    * the source; on the support graph that covers the giant component's
    * core. */
  val bfsRounds = 4

  /** q208: single-source HOP DISTANCES in the frequent co-purchase
    * graph ([[graft.operators.Graph.hopDistance]]) — the shortest-path
    * semiring completing the graph family (rank q96, components q49,
    * triangles q182, communities q187, closure q198). Source = smallest
    * part key in the edge set (deterministic cross-engine); exactly
    * [[bfsRounds]] synchronous min-plus rounds, distance vector
    * broadcast in the nodes ≪ edges regime. The oracle unrolls the
    * SAME rounds as min-union CTEs — pure integers, hash-exact by
    * construction. */
  def copurchaseHops(s: SparkSession, d: String): DataFrame =
    graft.operators.Graph.hopDistance(
        copurchaseSupportEdges(s, d), bfsRounds, broadcastDist = true)
      .orderBy(col("node"))

  val copurchaseHopsSql: String = {
    val rounds = (1 to bfsRounds).map { i =>
      s"""d$i AS (SELECT node, min(dist) AS dist FROM (
             SELECT node, dist FROM d${i - 1}
             UNION ALL
             SELECT sym.dst, d${i - 1}.dist + 1
             FROM sym JOIN d${i - 1} ON d${i - 1}.node = sym.src)
           GROUP BY 1)"""
    }.mkString(",\n    ")
    s"""
    WITH e AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (SELECT a.l_partkey AS s, b.l_partkey AS t
              FROM e a JOIN e b ON a.l_orderkey = b.l_orderkey
              WHERE a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING count(*) >= $triMinSupport),
    sym AS (SELECT s AS src, t AS dst FROM edges
            UNION ALL SELECT t, s FROM edges),
    d0 AS (SELECT min(s) AS node, CAST(0 AS BIGINT) AS dist FROM edges),
    $rounds
    SELECT node, dist FROM d$bfsRounds ORDER BY node"""
  }

  val defs: Map[String, QueryDef] = Map(
    "q208_copurchase_hops" -> QueryDef(copurchaseHops _, copurchaseHopsSql),
    "q96_copurchase_rank" -> QueryDef(copurchaseRank _, copurchaseRankSql),
    "q182_copurchase_triangles" -> QueryDef(copurchaseTriangles _, copurchaseTrianglesSql),
    "q186_copurchase_clustering" -> QueryDef(copurchaseClustering _, copurchaseClusteringSql),
    "q187_copurchase_communities" -> QueryDef(copurchaseCommunities _, copurchaseCommunitiesSql),
    "q192_time_travel" -> QueryDef(timeTravelSummary _, timeTravelSummarySql),
    "q193_association_rules" -> QueryDef(associationRules _, associationRulesSql),
    "q195_change_feed" -> QueryDef(changeFeedSummary _, changeFeedSummarySql),
    "q217_change_feed_checkpoint" ->
      QueryDef(changeFeedCheckpointSummary _, changeFeedCheckpointSummarySql),
    "q220_gdpr_erasure" ->
      QueryDef(gdprErasureSummary _, gdprErasureSummarySql),
    "q198_hierarchy_rollup" -> QueryDef(hierarchyRollup _, hierarchyRollupSql),
    "q119_brand_seeded_rank" -> QueryDef(brandSeededRank _, brandSeededRankSql),
    "q120_evolve_merge" -> QueryDef(evolveMerge _, evolveMergeSql),
    "q108_bucket_repair"  -> QueryDef(bucketRepairSet _, bucketRepairSetSql),
    "q109_scoped_diff"    -> QueryDef(scopedDiff _, snapshotDiffSql),
    "q98_data_quality"    -> QueryDef(dataQualityReport _, dataQualityReportSql),
    "q89_snapshot_diff"   -> QueryDef(snapshotDiff _, snapshotDiffSql),
    "q90_merge_upsert"    -> QueryDef(mergeRoundTrip _, mergeRoundTripSql),
    "q91_scd2_history"    -> QueryDef(scd2OrderStatus _, scd2OrderStatusSql),
    "q100_status_asof"    -> QueryDef(statusAsOf _, statusAsOfSql),
    "q95_incremental_view" -> QueryDef(incrementalRollup _, incrementalRollupSql))
}
