package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions
import graft.operators.{Dedup, Multimodal, Similarity}

/** Training-data pipeline extension inventory: dedup, similarity search,
  * text analysis, multimodal plumbing — over the documents/embeddings
  * fixtures. DuckDB oracles wherever the semantics are SQL-expressible;
  * hash-bearing ops (minhash/simhash/IVF) are rows-only here and verified
  * by recall properties in ExtensionsSpec.
  */
object Extensions {

  /** Shared DuckDB snippets (must mirror TextFunctions exactly). */
  private[queries] val toksSql =
    "list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')"
  private def foldSumSql(listExpr: String, cast: String = "DOUBLE"): String =
    s"list_reduce(list_concat([CAST(0 AS $cast)], $listExpr), (a, b) -> a + b)"

  // --- dedup ---------------------------------------------------------------

  def dedupExact(s: SparkSession, d: String): DataFrame =
    Dedup.exactKeepFirst(Tables.documents(s, d), "text", "doc_id")
      .select(col("doc_id"), col("lang"), col("source"))

  val dedupExactSql: String = """
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      FROM documents) WHERE rn = 1"""

  def nearDupMinhash(s: SparkSession, d: String): DataFrame =
    Dedup.nearDuplicates(Tables.documentsSpread(s, d), "doc_id", "text",
      minJaccard = 0.2, numHashes = 32, bands = 8, shingleN = 3)

  /** One-sided-turned-full oracle: the fixture's near-dup pairs all have
    * jaccard ≥ 0.9 (planted dups) while the background is < 0.15, so every
    * qualifying pair has an identical-or-near-identical shingle set whose
    * MinHash signatures deterministically share bands — the LSH output
    * EQUALS the exhaustive answer at this threshold. The oracle computes
    * that answer via an INVERTED-INDEX join (intersection = shared-shingle
    * count per pair, union = n_a + n_b − intersection over the distinct
    * sets): identical doubles to the per-pair list formulation, but no
    * quadratic list ops — the oracle itself scales past the fixture. */
  /** Shared CTE chain ending in `jp(id_a, id_b, jaccard)` — used by the
    * q25 pair oracle and the q49 clustering oracle. */
  private val nearDupPairsSqlCtes: String = s"""
    t AS (SELECT doc_id, $toksSql AS toks FROM documents),
    s AS (SELECT doc_id,
            list_distinct(list_transform(range(len(toks) - 2),
              i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS sh
          FROM t WHERE len(toks) >= 3),
    inv AS (SELECT doc_id, unnest(sh) AS g FROM s),
    cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
             FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
    n AS (SELECT doc_id, len(sh) AS n FROM s),
    jp AS (SELECT c.id_a, c.id_b,
             CAST(c.inter AS DOUBLE)
               / CAST(na.n + nb.n - c.inter AS DOUBLE) AS jaccard
           FROM cand c JOIN n na ON na.doc_id = c.id_a
                       JOIN n nb ON nb.doc_id = c.id_b)"""

  val nearDupMinhashSql: String = s"""
    WITH $nearDupPairsSqlCtes
    SELECT id_a, id_b, jaccard FROM jp WHERE jaccard >= 0.2"""

  def simhashAdjacent(s: SparkSession, d: String): DataFrame = {
    val sigs = Tables.documents(s, d)
      .select(col("doc_id"), TextFunctions.simhashPoly(col("text")).as("sig"))
    val nxt = sigs.select((col("doc_id") - 1).as("doc_id"), col("sig").as("sig_next"))
    sigs.join(nxt, "doc_id")
      .select(col("doc_id"), TextFunctions.hamming64(col("sig"), col("sig_next")).as("hamming"))
  }

  /** Mirrors TextFunctions.simhashPoly: 31-bit polynomial token hashes,
    * per-bit majority vote, little-endian packing, then Hamming distance of
    * adjacent docs — all exact integer arithmetic in both engines. */
  val simhashAdjacentSql: String = {
    val tokenHash =
      "list_reduce(list_concat([CAST(17 AS BIGINT)], " +
        "list_transform(list_filter(regexp_split_to_array(tk, ''), ch -> ch <> ''), " +
        "ch -> CAST(unicode(ch) AS BIGINT))), (a, b) -> (a * 31 + b) % 2147483647)"
    val sigTerms = (0 until 31).map { j =>
      s"(CASE WHEN len(hs) > 0 AND 2 * len(list_filter(hs, x -> (x >> $j) & 1 = 1)) >= len(hs) THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)"
    }.mkString(" + ")
    s"""
    WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
    h AS (SELECT doc_id, list_transform(toks, tk -> $tokenHash) AS hs FROM t),
    g AS (SELECT doc_id, $sigTerms AS sig FROM h)
    SELECT a.doc_id, CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
    FROM g a JOIN g b ON b.doc_id = a.doc_id + 1"""
  }

  /** Exact word-3-gram Jaccard between each doc and its successor. */
  /** q97: exact Jaccard ≥ 0.9 similarity SELF-JOIN via prefix filtering
    * ([[graft.operators.SimJoin]]) — the zero-false-anything counterpart
    * of the q25/q27 probabilistic near-dup paths. Scoped to the first 500
    * doc ids so the ORACLE's brute-force verify stays tractable at every
    * SF (the operator itself has no such bound; its pruning is the prefix
    * theorem, not the scope). */
  def simJoinExact(s: SparkSession, d: String): DataFrame = {
    val docTok = Tables.documents(s, d)
      .filter(col("doc_id") < 500)
      .select(col("doc_id").as("id"),
        explode(TextFunctions.tokens(col("text"))).as("token"))
      .distinct()
    graft.operators.SimJoin.exactJaccardJoin(docTok, num = 9, den = 10)
  }

  val simJoinExactSql: String = s"""
    WITH dt AS (
      SELECT DISTINCT doc_id AS id, unnest($toksSql) AS token
      FROM documents WHERE doc_id < 500),
    sz AS (SELECT id, count(*) AS n FROM dt GROUP BY 1),
    inter AS (
      SELECT a.id AS doc_a, b.id AS doc_b, count(*) AS c
      FROM dt a JOIN dt b ON a.token = b.token AND a.id < b.id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b, c, sa.n AS na, sb.n AS nb,
           CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
    FROM inter
    JOIN sz sa ON sa.id = doc_a
    JOIN sz sb ON sb.id = doc_b
    WHERE 19 * c >= 9 * (sa.n + sb.n)"""

  def jaccardAdjacent(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val a = docs.select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks_a"))
    val b = docs.select((col("doc_id") - 1).as("doc_id"), TextFunctions.tokens(col("text")).as("toks_b"))
    a.join(b, "doc_id")
      .select(col("doc_id"),
        TextFunctions.ngramJaccard(col("toks_a"), col("toks_b"), 3).as("jaccard"))
  }

  val jaccardAdjacentSql: String = s"""
    WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
    s AS (SELECT doc_id,
            list_distinct(list_transform(range(len(toks) - 2),
              i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS sh
          FROM t)
    SELECT a.doc_id,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / NULLIF(CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 0.0)
             AS jaccard
    FROM s a JOIN s b ON b.doc_id = a.doc_id + 1"""

  // --- text analysis -------------------------------------------------------

  def tokenStats(s: SparkSession, d: String): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    Tables.documents(s, d).select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      TextFunctions.avgTokenLen(toks).as("avg_token_len"))
  }

  val tokenStatsSql: String = s"""
    SELECT doc_id, len(toks) AS n_tokens,
           CAST(${foldSumSql("list_transform(toks, t -> CAST(length(t) AS BIGINT))", "BIGINT")} AS DOUBLE)
             / len(toks) AS avg_token_len
    FROM (SELECT doc_id, $toksSql AS toks FROM documents)"""

  def textQuality(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextFunctions.charClassRatio(col("text"), "[.,!?;:]").as("punct_ratio"),
      TextFunctions.charClassRatio(col("text"), "[0-9]").as("digit_ratio"),
      TextFunctions.qualityScore(col("text")).as("quality"))

  private[queries] val enStops = TextFunctions.stopwords("en").map(w => s"'$w'").mkString(", ")
  val textQualitySql: String = s"""
    SELECT doc_id,
      CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
        / NULLIF(CAST(length(text) AS DOUBLE), 0.0) AS punct_ratio,
      CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
        / NULLIF(CAST(length(text) AS DOUBLE), 0.0) AS digit_ratio,
      CAST(len(list_filter(toks, t -> t IN ($enStops))) AS DOUBLE)
          / NULLIF(CAST(len(toks) AS DOUBLE), 0.0)
        - CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
          / NULLIF(CAST(length(text) AS DOUBLE), 0.0)
        - CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
          / NULLIF(CAST(length(text) AS DOUBLE), 0.0) AS quality
    FROM (SELECT doc_id, text, $toksSql AS toks FROM documents)"""

  def langIdHeuristic(s: SparkSession, d: String): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    Tables.documents(s, d).select(
      col("doc_id"), col("lang"),
      TextFunctions.langId(toks).as("lang_pred"))
  }

  val langIdHeuristicSql: String = {
    val order = Seq("en", "es", "fr", "de", "zh")
    val hitExpr = order.map { l =>
      val words = TextFunctions.stopwords(l).map(w => s"'$w'").mkString(", ")
      s"len(list_filter(toks, t -> t IN ($words))) AS h_$l"
    }.mkString(", ")
    val cases = order.zipWithIndex.map { case (l, i) =>
      val laterGe = order.drop(i + 1).map(o => s"h_$l >= h_$o")
      val conds = (s"h_$l > 0" +: laterGe).mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString(" ")
    s"""
    SELECT doc_id, lang, CASE $cases ELSE 'und' END AS lang_pred
    FROM (SELECT doc_id, lang, $hitExpr
          FROM (SELECT doc_id, lang, $toksSql AS toks FROM documents))"""
  }

  def fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextFunctions.fingerprint(col("text"), 64).as("fp"))

  /** The 31-bit polynomial fingerprint fold — ONE snippet shared by every
    * oracle that mirrors `TextFunctions.fingerprint` (q28, q59), so a
    * change to the fold (prefix, modulus, init) can't desynchronize them. */
  private[queries] def fingerprintExprSqlOn(e: String): String = s"""list_reduce(
        list_concat([CAST(0 AS BIGINT)],
          list_transform(
            list_filter(regexp_split_to_array(substr($e, 1, 64), ''), c -> c <> ''),
            c -> CAST(unicode(c) AS BIGINT))),
        (a, b) -> (a * 31 + b) % 1000000007)"""

  private[queries] val fingerprintExprSql: String = fingerprintExprSqlOn("text")

  val fingerprintSql: String = s"""
    SELECT doc_id, $fingerprintExprSql AS fp
    FROM documents"""

  // --- similarity search ---------------------------------------------------

  def annBruteTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
  }

  private def dotSql(a: String, b: String): String =
    foldSumSql(s"list_transform(range(len($a)), i -> $a[i+1] * $b[i+1])")
  val annBruteTopKSql: String = s"""
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS qid, v AS qv FROM c WHERE vec_id < 10),
    pairs AS (
      SELECT q.qid AS query_id, c.vec_id AS neighbor_id,
        CASE WHEN sqrt(${dotSql("qv", "qv")}) * sqrt(${dotSql("v", "v")}) = 0.0
             THEN NULL
             ELSE ${dotSql("qv", "v")}
                  / (sqrt(${dotSql("qv", "qv")}) * sqrt(${dotSql("v", "v")}))
        END AS sim
      FROM c CROSS JOIN q
      WHERE c.vec_id <> q.qid)
    SELECT query_id, neighbor_id, sim, rn FROM (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rn
      FROM pairs)
    WHERE rn <= 5"""

  /** q135: contrastive pair mining (anchor → nearest same-label positive +
    * nearest cross-label hard negative) — the training-pair generator an
    * embedding-model pipeline runs over its labeled corpus. Exact
    * variant under oracle; the operator doc describes the IVF-probed
    * candidate route at scale. */
  def hardNegatives(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 20))
  }

  val hardNegativesSql: String = s"""
    WITH c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    a AS (SELECT vec_id AS anchor_id, label AS a_label, v AS av FROM c
          WHERE vec_id < 20),
    best AS (
      SELECT anchor_id, cand_id, same, sim,
             row_number() OVER (PARTITION BY anchor_id, same
                                ORDER BY sim DESC, cand_id) AS rn
      FROM (SELECT a.anchor_id, c.vec_id AS cand_id,
              (c.label = a.a_label) AS same,
              ${cosineSql("av", "v")} AS sim
            FROM c CROSS JOIN a WHERE c.vec_id <> a.anchor_id))
    SELECT anchor_id,
           max(CASE WHEN same THEN cand_id END) AS pos_id,
           max(CASE WHEN same THEN sim END) AS pos_sim,
           max(CASE WHEN NOT same THEN cand_id END) AS neg_id,
           max(CASE WHEN NOT same THEN sim END) AS neg_sim,
           max(CASE WHEN same THEN sim END)
             - max(CASE WHEN NOT same THEN sim END) AS margin
    FROM best WHERE rn = 1 GROUP BY anchor_id"""

  /** q144: encoding audit — the mojibake/binary-leak detector a text
    * pipeline runs before tokenization: per document, the U+FFFD
    * replacement-character count (the scar UTF-8 decoding leaves on
    * mis-encoded bytes), the C0 control-character count (excluding
    * \t \n \r — real text never contains the rest; PDFs-gone-wrong and
    * binary leaks do), and the printable-ASCII ratio. All explicit
    * character classes — the Java/RE2 spelling both engines agree on —
    * and one IEEE division for the ratio. Row-local, codegen'd, zero
    * shuffles; clean-fixture outputs are exact zeros/ones and the
    * DETECTION behavior is spec-pinned on planted mojibake. */
  private val replChar = "�"
  private val controlClass = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"
  private val asciiPrintable = "[\\x20-\\x7E]"

  def encodingAudit(s: SparkSession, d: String): DataFrame =
    encodingAuditOn(Tables.documents(s, d))

  def encodingAuditOn(docs: DataFrame): DataFrame = {
    def cnt(cls: String) =
      (length(col("text")) - length(regexp_replace(col("text"), cls, ""))).cast("long")
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      cnt(s"[$replChar]").as("n_replacement"),
      cnt(controlClass).as("n_control"),
      (cnt(asciiPrintable).cast("double") /
        nullif(length(col("text")).cast("double"), lit(0.0))).as("ascii_ratio"))
  }

  val encodingAuditSql: String = s"""
    SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
           CAST(length(text) - length(regexp_replace(text, '[$replChar]', '', 'g'))
                AS BIGINT) AS n_replacement,
           CAST(length(text) - length(regexp_replace(text, '$controlClass', '', 'g'))
                AS BIGINT) AS n_control,
           CAST(length(text) - length(regexp_replace(text, '$asciiPrintable', '', 'g'))
                AS DOUBLE)
             / NULLIF(CAST(length(text) AS DOUBLE), 0.0) AS ascii_ratio
    FROM documents"""

  /** q147: Structured Streaming EXECUTION under the batch oracle — the
    * q43 pattern applied to streaming aggregation: the embeddings table
    * replays through `readStream` (one file per trigger — a real
    * micro-batch sequence, not a single-batch degenerate), the SAME
    * `embeddingAuditOn` plan runs in complete mode through the streaming
    * engine (partial aggregation + state store merge per batch), and the
    * final in-memory table must hash-match q137's batch oracle. Every
    * audit value is order/batching-independent by construction (counts,
    * element-pick extrema), so micro-batch boundaries cannot show — which
    * is exactly the property this row gates. q43 covers
    * flatMapGroupsWithState; this covers the streaming-aggregation state
    * path. */
  private val auditGateRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  private val auditReplayLock = new Object

  def streamingAuditGate(s: SparkSession, d: String): DataFrame = {
    val name = s"graft_audit_gate_${auditGateRuns.incrementAndGet()}"
    // the testdata table is a single file and a file stream source needs a
    // directory — materialize a 4-file copy once per fixture fingerprint
    // (hash-partitioned on vec_id, so each micro-batch is a nontrivial slice)
    val dir = indexCacheDir("graft-audit-replay", d, "embeddings", s"files4$auditCacheVersion")
    auditReplayLock.synchronized {
      if (!new java.io.File(s"$dir/_SUCCESS").exists())
        Tables.embeddings(s, d).repartition(4, col("vec_id"))
          .write.mode("overwrite").parquet(dir)
    }
    val schema = Tables.embeddings(s, d).schema
    withStatePartitions(s) {
      val src = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(dir)
      val q = embeddingAuditOn(src)
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      awaitBounded(q, name)
    }
    detachMemorySink(s, name)
  }

  /** Copy a memory-sink table into a plain local DataFrame and DROP the
    * named temp view, so repeated gate runs in one session don't
    * accumulate unbounded in-memory result tables (each run registers a
    * fresh counter-suffixed sink). Sink tables here are report-sized
    * (audit rows, count matrices), so the copy is a metadata-scale
    * collect. */
  /** Bounded replacement for bare `awaitTermination()`: a non-terminating
    * gate must fail ITS OWN row loudly, never hold the whole artifact
    * chain (correctness run, bench, sbt test) hostage to one bad plan.
    * AvailableNow gates at gate SF finish in seconds; the default ceiling
    * is a ~20× safety margin over the heaviest gate (q234 medians ~20 s at
    * sf0.1) AND survives the documented 1.2–2× host-window swing plus a
    * larger SF — a healthy slow run must never read as "did not
    * terminate" (round-13 ADVICE). Overridable per environment via
    * `SPARK_GRAFT_GATE_TIMEOUT_MS` for deployments running gates at
    * production SF. `awaitTermination(ms)` rethrows a failed query's
    * exception and returns false on timeout; `stop()` in finally tears
    * down the spinning execution either way. */
  private[graft] val defaultGateTimeoutMs: Long =
    sys.env.get("SPARK_GRAFT_GATE_TIMEOUT_MS").map(_.toLong).getOrElse(420000L)

  private[graft] def awaitBounded(
      q: org.apache.spark.sql.streaming.StreamingQuery,
      name: String, timeoutMs: Long = defaultGateTimeoutMs): Unit =
    try require(q.awaitTermination(timeoutMs),
      s"streaming gate '$name' did not terminate within $timeoutMs ms")
    finally q.stop()

  /** Serializes every session-global SQL-conf override the streaming-gate
    * wrappers perform (round-13 ADVICE, medium): without it a query running
    * concurrently in the same SparkSession silently picks up the reduced
    * partition count or the RocksDB provider, and two overlapping wrappers
    * restore each other's stale values, leaking the override permanently.
    * The lock covers set → body → restore, so the conf mutation is scoped
    * to exactly one gate at a time. Lock ordering: gates that also take
    * `streamReplayLock`/`transReplayLock` always do so BEFORE entering a
    * wrapper (or around the whole wrapper), never the reverse — no cycle. */
  private val stateConfLock = new Object

  /** Run `body` with the RocksDB state-store provider (transformWithState
    * rejects the default HDFS provider) and a REDUCED shuffle-partition
    * count for the stateful stage: each micro-batch opens one RocksDB
    * instance per state partition, so at gate SF the session default of 32
    * instances is pure fixed overhead (native store open/commit/close ×32
    * per batch dominates the gate's whole cost), while results are
    * partition-count-invariant. Production sizes state partitions to the
    * keyspace; the gates size them to the fixture (see
    * [[defaultStatePartitions]]). Both confs are restored after; the
    * set/restore pair runs under [[stateConfLock]]. */
  private[graft] def withRocksDbTws[T](s: SparkSession,
                                       partitions: Int = defaultStatePartitions)
                                      (body: => T): T =
    stateConfLock.synchronized {
      val providerKey = "spark.sql.streaming.stateStore.providerClass"
      // changelog checkpointing: commit the per-batch CHANGELOG instead of
      // uploading a full RocksDB snapshot every micro-batch (snapshots
      // still happen, asynchronously, every N batches) — the recommended
      // production setting for RocksDB state, and measured here to trim
      // the per-batch commit share of the TWS gate floors
      val changelogKey =
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
      val priorP = s.conf.getOption(providerKey)
      val priorC = s.conf.getOption(changelogKey)
      s.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      s.conf.set(changelogKey, "true")
      try withStatePartitions(s, partitions)(body)
      finally {
        priorP match {
          case Some(v) => s.conf.set(providerKey, v)
          case None    => s.conf.unset(providerKey)
        }
        priorC match {
          case Some(v) => s.conf.set(changelogKey, v)
          case None    => s.conf.unset(changelogKey)
        }
      }
    }

  /** Stateful-stage partition sizing for the gates. 8 fits the gate-SF
    * fixtures (measured: at gate SF the per-partition store open/commit
    * cost dominates, results are partition-count-invariant — round-13
    * calibration). Production jobs must NOT inherit this number: size
    * state partitions to the keyspace (rule of thumb: live keys ×
    * per-key state ÷ target store size per partition, rounded to the
    * executor-core multiple), and set it via
    * `spark.graft.statePartitions` — the gates read the override so a
    * deployment can re-run them at its own sizing without a rebuild. */
  private[graft] def defaultStatePartitions: Int =
    sys.props.get("spark.graft.statePartitions")
      .orElse(sys.env.get("SPARK_GRAFT_STATE_PARTITIONS"))
      .map(_.toInt).getOrElse(8)

  /** Run `body` (a streaming-gate execution) with a reduced
    * shuffle-partition count: a stateful micro-batch commits one state
    * store (delta files, snapshot maintenance — or a whole RocksDB
    * instance) PER partition, so at gate SF the session default of 32 is
    * fixed overhead with no data underneath; results are
    * partition-count-invariant. Production sizes state partitions to the
    * keyspace ([[defaultStatePartitions]]). Restored after; set/restore
    * runs under [[stateConfLock]] so concurrent queries never observe or
    * clobber the override. */
  private[graft] def withStatePartitions[T](s: SparkSession,
                                            partitions: Int = defaultStatePartitions)
                                           (body: => T): T =
    stateConfLock.synchronized {
      val partKey = "spark.sql.shuffle.partitions"
      val priorN = s.conf.getOption(partKey)
      s.conf.set(partKey, partitions.toString)
      try body
      finally priorN match {
        case Some(v) => s.conf.set(partKey, v)
        case None    => s.conf.unset(partKey)
      }
    }

  private[queries] def detachMemorySink(s: SparkSession, name: String): DataFrame = {
    val t = s.table(name)
    val out = s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(t.collect(): _*)), t.schema)
    s.catalog.dropTempView(name)
    out
  }

  /** q210: keyed-state TRANSITION EXTRACTION under streaming execution —
    * the q147 discipline applied to flatMapGroupsWithState: the events
    * table replays as four TIME-SLICED files (cut along the exact
    * (ts, event_id) total order the batch window uses, mtimes forcing
    * the file-source order), [[graft.streaming.Transitions]] carries
    * each user's last event across micro-batches and emits consecutive
    * pairs in append mode, and the pair counts + row-normalized
    * probabilities must hash-match q200's batch-lag oracle. What's
    * gated: cross-batch state carry ≡ the batch window — per-user state
    * is ONE event, so the store tracks live users, never history. The
    * replay slicing is fixture prep (cached per events fingerprint);
    * the global ntile sort happens there, never in the gated query. */
  private val transGateRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  private val transReplayLock = new Object

  private def transitionsReplayDir(d: String): String =
    indexCacheDir("graft-transitions-replay", d, "events", "tslices4v1")

  /** Build (once per events fingerprint) the 4-file time-sliced events
    * replay — shared by q210 and q223. */
  private def ensureTransitionsReplay(s: SparkSession, d: String): Unit = {
    import java.nio.file.{Files, Paths}
    val dir = transitionsReplayDir(d)
    transReplayLock.synchronized {
      if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        // persisted: the global ntile sort runs ONCE, not once per slice
        val sliced = ev.withColumn("slice",
          ntile(4).over(Window.orderBy(col("ts"), col("event_id"))))
          .persist()
        try {
          val base = System.currentTimeMillis() - 60000L
          (1 to 4).foreach { i =>
            // distinct ascending mtimes pin the micro-batch order
            writeSingleParquet(sliced.filter(col("slice") === i).drop("slice"),
              dir, f"slice$i%02d.parquet", mtime = Some(base + i * 1000L))
          }
          Files.writeString(Paths.get(dir, "_SUCCESS"), "")
        } finally sliced.unpersist()
      }
    }
  }

  def transitionsStreamingGate(s: SparkSession, d: String): DataFrame = {
    ensureTransitionsReplay(s, d)
    val dir = transitionsReplayDir(d)
    val name = s"graft_trans_gate_${transGateRuns.incrementAndGet()}"
    import s.implicits._
    val src = s.readStream
      .schema(Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .schema)
      // two slices per trigger: the carry law needs ≥ 2 micro-batches
      // (TransitionsSpec pins the boundary sharply at 1-file batches);
      // each extra batch costs a full state-store commit cycle across
      // BOTH stateful operators, so the gate runs the minimum that
      // still crosses a batch boundary
      .option("maxFilesPerTrigger", 2).parquet(dir)
    val pairs = graft.streaming.Transitions.transitionPairs(
      src.as[graft.streaming.Transitions.Ev],
      idleHorizon = None) // bounded replay: see Transitions scaladoc
    // a streaming AGGREGATION chained after the append-mode state
    // operator: the pair stream never leaves the executors — the sink
    // holds the 25-cell count matrix, not events-sized rows (and the
    // gate covers stateful-operator chaining, fMGWS → agg, for free)
    val counts = pairs.groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    withStatePartitions(s) {
      val q = counts.writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      awaitBounded(q, name)
    }
    detachMemorySink(s, name)
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("prev_type"))).cast("double"))
  }

  /** q225: the q210 transition semantics rebuilt on TRANSFORM-WITH-STATE —
    * Spark 4's arbitrary-state API (typed state variables, native TTL,
    * RocksDB-backed) — and hash-matched against the SAME batch-lag oracle
    * q210's flatMapGroupsWithState version matches: two independent state
    * APIs and state-store providers (HDFS-backed vs RocksDB), one truth.
    * The RocksDB provider requirement is set per-query-start and restored
    * (transformWithState rejects the default provider); the chained
    * streaming aggregation + row-normalized probabilities are identical
    * to q210's. */
  private val twsGateRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  def transitionsTwsGate(s: SparkSession, d: String): DataFrame = {
    ensureTransitionsReplay(s, d)
    val name = s"graft_tws_gate_${twsGateRuns.incrementAndGet()}"
    import s.implicits._
    withRocksDbTws(s) {
      val src = s.readStream
        .schema(Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .schema)
        .option("maxFilesPerTrigger", 2).parquet(transitionsReplayDir(d))
      val pairs = graft.streaming.TransitionsTws.transitionPairs(
        src.as[graft.streaming.Transitions.Ev])
      val counts = pairs.groupBy(col("prev_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
      val q = counts.writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      awaitBounded(q, name)
    }
    detachMemorySink(s, name)
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("prev_type"))).cast("double"))
  }

  /** q230: streaming FIRST-OCCURRENCE extraction on transformWithState's
    * MAP STATE ([[graft.streaming.DistinctTws]]) — the third state-variable
    * shape (q225 ValueState, q228 ListState+timers), completing the
    * Spark-4 arbitrary-state surface. The replay feeds each (user, type)
    * pair many times, batches apart; the chained count per type must
    * equal the batch COUNT(DISTINCT user_id) — correct IFF cross-batch
    * MapState suppressed every later duplicate and no first occurrence
    * double-emitted. Scale shape: point containsKey/put per event (never
    * a Set-blob rewrite), state = one entry per distinct (user, type). */
  private val distinctTwsRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  def distinctTwsGate(s: SparkSession, d: String): DataFrame = {
    ensureTransitionsReplay(s, d)
    val name = s"graft_distinct_tws_${distinctTwsRuns.incrementAndGet()}"
    import s.implicits._
    withRocksDbTws(s) {
      val src = s.readStream
        .schema(Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .schema)
        .option("maxFilesPerTrigger", 2).parquet(transitionsReplayDir(d))
      val first = graft.streaming.DistinctTws.firstOccurrences(
        src.as[graft.streaming.Transitions.Ev])
      val counts = first.groupBy(col("event_type"))
        .agg(count(lit(1)).as("distinct_users"))
      val q = counts.writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      awaitBounded(q, name)
    }
    detachMemorySink(s, name)
  }

  /** Oracle: the batch distinct count — every later duplicate suppressed,
    * every first occurrence emitted exactly once. */
  val distinctTwsSql: String = """
    SELECT event_type, count(DISTINCT user_id) AS distinct_users
    FROM events GROUP BY 1"""

  /** The q230 pipeline re-run with a RETAINED checkpoint (file sink) —
    * fixture prep for the MapState reader gate, cached per sfDir like
    * the q229/q232 ingests. */
  private val distinctCkCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ensureDistinctTwsCheckpoint(s: SparkSession, d: String): String =
    distinctCkCache.computeIfAbsent(d, { _ =>
      ensureTransitionsReplay(s, d)
      import s.implicits._
      val work = java.nio.file.Files
        .createTempDirectory("graft-mapstate").toString
      val ck = s"$work/ck"; val out = s"$work/out"
      withRocksDbTws(s) {
        val src = s.readStream
          .schema(Tables.events(s, d)
            .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
            .schema)
          .option("maxFilesPerTrigger", 2).parquet(transitionsReplayDir(d))
        val first = graft.streaming.DistinctTws.firstOccurrences(
          src.as[graft.streaming.Transitions.Ev])
        val q = first.toDF().writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ck)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        awaitBounded(q, "distinct_tws_ingest")
      }
      ck
    })

  /** q236: MAPSTATE INTROSPECTION — the q232 named-variable read against
    * the third state-variable shape, completing the per-variable reader
    * matrix (q229 fMGWS blob, q232 ValueState + flattened ListState,
    * this MapState). The q230 first-occurrence job's checkpoint is read
    * back per map ENTRY: the `statestore` source flattens MapState as
    * one row per (grouping key, user map key) — proving the store holds
    * the seen-set as individually addressable entries (the point-probe
    * layout the 100 TB claim rests on), not a serialized Set blob. The
    * oracle is closed-form: exactly the DISTINCT (user, event_type)
    * pairs of the events table, each present exactly once with value
    * true. */
  def twsMapIntrospectGate(s: SparkSession, d: String): DataFrame = {
    val ck = ensureDistinctTwsCheckpoint(s, d)
    s.read.format("statestore")
      .option("path", ck).option("stateVarName", "seen").load()
      .select(
        col("key.value").as("user_id"),
        col("user_map_key.value").as("event_type"),
        col("user_map_value.value").as("seen"))
  }

  val twsMapIntrospectSql: String = """
    SELECT DISTINCT user_id, event_type, TRUE AS seen FROM events"""

  /** q226: NATIVE STREAMING DEDUPLICATION under streaming execution —
    * `dropDuplicatesWithinWatermark`, the engine-native exact-dedup state
    * operator (the API sibling of the custom `exactDedupStream`): the
    * replay stages every slice file TWICE (duplicates arrive in LATER
    * micro-batches than their originals — two files per trigger, slices
    * then their copies), so the second copy survives only if the state
    * store failed to remember the first. The watermark delay is set past
    * the replay's event-time span, so no duplicate is ever
    * late-beyond-horizon and the oracle is the plain single-copy
    * aggregate; production sets the delay to its real duplicate horizon
    * and the store evicts keys older than it — that eviction contract is
    * exactly why this API scales where unbounded dropDuplicates does
    * not. */
  private val dedupGateRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  private val dupReplayLock = new Object

  def streamingDedupNative(s: SparkSession, d: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    ensureTransitionsReplay(s, d)
    val src0 = transitionsReplayDir(d)
    val dir = indexCacheDir("graft-dup-replay", d, "events", "dup8v1")
    dupReplayLock.synchronized {
      if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
        Files.createDirectories(Paths.get(dir))
        val base = System.currentTimeMillis() - 60000L
        // originals first (mtimes 1-4), then the duplicate copies (5-8):
        // with 2 files/trigger the copy of slice i lands 2 batches after i
        (1 to 4).foreach { i =>
          val from = Paths.get(src0, f"slice$i%02d.parquet")
          val orig = Paths.get(dir, f"orig$i%02d.parquet")
          val dup = Paths.get(dir, f"dupl$i%02d.parquet")
          Files.copy(from, orig, StandardCopyOption.REPLACE_EXISTING)
          Files.copy(from, dup, StandardCopyOption.REPLACE_EXISTING)
          orig.toFile.setLastModified(base + i * 1000L)
          dup.toFile.setLastModified(base + (4 + i) * 1000L)
        }
        Files.writeString(Paths.get(dir, "_SUCCESS"), "")
      }
    }
    val name = s"graft_dedup_gate_${dedupGateRuns.incrementAndGet()}"
    val src = s.readStream
      .schema(Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .schema)
      .option("maxFilesPerTrigger", 2).parquet(dir)
    val deduped = src
      .withWatermark("ts", "3650 days") // past the replay span: exact dedup
      .dropDuplicatesWithinWatermark("event_id")
    val counts = deduped.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_event_id"))
    withStatePartitions(s) {
      val q = counts.writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      awaitBounded(q, name)
    }
    detachMemorySink(s, name)
  }

  /** Oracle: the single-copy aggregate — correct IFF the stream dropped
    * every duplicated row across batches. */
  val streamingDedupNativeSql: String = """
    SELECT event_type, count(*) AS n, CAST(sum(event_id) AS BIGINT) AS sum_event_id
    FROM events GROUP BY 1"""

  /** q227: STREAMING UPSERT SINK INTO THE VERSIONED LOG — the CDC-ingest
    * composition every lakehouse runs: `foreachBatch` reduces each
    * micro-batch to one latest-event row per user (max-by (ts, event_id)
    * struct) and COMMITS it as log version = batchId through
    * [[graft.operators.Versioned.commit]]'s fenced atomic-rename path —
    * exactly-once: a REPLAYED batch id (restart between commit and
    * checkpoint offset write) finds its version slot occupied and skips
    * idempotently; the fence's ConcurrentModificationException is
    * reserved for true concurrent writers racing a fresh slot. The gate reads the
    * final log state (latest-per-key across commits) and must match the
    * batch argmax oracle: streaming-upserts-then-merge ≡ one global
    * window. Last-commit-wins equals the global argmax BECAUSE the replay
    * respects the (ts, event_id) total order across batches (the q210
    * fixture property) — the same in-order-ingest assumption every CDC
    * upsert pipeline rests on. Fresh log per invocation — the commit path
    * is what's being exercised. */
  private val upsertGateRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  /** One micro-batch of the q227 upsert sink: reduce to the latest event
    * per user and commit as log version = batchId. IDEMPOTENT REPLAY (the
    * standard foreachBatch contract): a batch replayed after a failure
    * between Versioned.commit and the checkpoint offset write finds its
    * version slot already occupied — WITH THIS WRITER'S OWNER MARKER
    * (committed atomically with the data) — and SKIPS. A slot occupied by
    * a FOREIGN writer (different owner tag, or no tag) raises the fence's
    * ConcurrentModificationException instead of being silently swallowed
    * (round-13 ADVICE: an unmarked skip hides real divergence). `owner`
    * must be stable across the writer's restarts — derive it from the
    * checkpoint location / streaming query id, never the runId. Returns
    * true if the batch committed, false on a replay skip (spec-pinned). */
  private[graft] def upsertBatch(batch: DataFrame, id: Long,
                                 root: String, owner: String): Boolean = {
    val slot = java.nio.file.Paths.get(root, s"v=$id")
    if (java.nio.file.Files.exists(slot)) {
      if (java.nio.file.Files.exists(
          graft.operators.Versioned.ownerMarker(root, id.toInt, owner)))
        return false
      throw new java.util.ConcurrentModificationException(
        s"version slot v=$id at $root is occupied by a FOREIGN writer " +
          s"(no owner marker for '$owner'): refusing to treat it as a replay")
    }
    val delta = batch.groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type")))
        .as("_m"))
      .select(col("user_id"),
        col("_m.event_id").as("last_event_id"),
        col("_m.event_type").as("last_type"),
        lit("u").as("_op"))
    // groupBy(user_id) upstream proves one-row-per-key: skip the
    // duplicate-check action (it would double each batch's work)
    graft.operators.Versioned.commit(delta, root, "user_id", id.toInt,
      checkDuplicates = false, ownerTag = Some(owner))
    true
  }

  def streamingUpsertSink(s: SparkSession, d: String): DataFrame = {
    ensureTransitionsReplay(s, d)
    val root = java.nio.file.Files
      .createTempDirectory("graft-upsert-log").toString + "/log"
    val src = s.readStream
      .schema(Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .schema)
      .option("maxFilesPerTrigger", 2).parquet(transitionsReplayDir(d))
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    // restart-stable owner token: in a real deployment this derives from
    // the checkpoint location / query id; the gate's log root plays that
    // role (fresh per invocation, shared across the query's own replays)
    val owner = "upsert_" + Integer.toHexString(root.hashCode)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        upsertBatch(batch, id, root, owner)
        seen.incrementAndGet(): Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    awaitBounded(q, "streaming_upsert_sink")
    graft.operators.Versioned.readAt(s, root, "user_id", seen.get() - 1)
  }

  val streamingUpsertSinkSql: String = """
    SELECT user_id, event_id AS last_event_id, event_type AS last_type
    FROM (SELECT user_id, event_id, event_type,
            row_number() OVER (PARTITION BY user_id
              ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1"""

  /** q242: CRASH-INJECTED EXACTLY-ONCE — the evidence class q222/q227
    * could not give (round-14 verdict #2). q222 proves graceful
    * stop/restart; q227's fence proves idempotent replay of a batch the
    * TEST re-submits. This gate injects the real failure: the foreachBatch
    * body COMMITS version slot 1 to the versioned log, then throws before
    * returning — a hard failure in the exact window between sink commit
    * and checkpoint offset-commit that exactly-once folklore hand-waves
    * over. The StreamExecution dies (first run's awaitTermination
    * rethrows the injected error); the gate restarts the query from the
    * SAME checkpoint; Spark replays batch 1 with identical offsets; the
    * owner-fenced upsert ([[upsertBatch]]) finds its own marker in the
    * occupied slot and skips idempotently; the stream finishes. In-gate
    * `require` fences prove the failure actually fired (once), the replay
    * skip actually happened (once), and every other batch committed
    * exactly once — then the final log state must hash-match the SAME
    * crash-free batch oracle as q227. At 100 TB this is the property that
    * makes a sink trustworthy: a mid-commit executor loss costs a batch
    * replay, never a duplicate or a hole. */
  private val crashGateRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  def crashInjectedUpsert(s: SparkSession, d: String): DataFrame = {
    ensureTransitionsReplay(s, d)
    val work = java.nio.file.Files
      .createTempDirectory("graft-crash-upsert").toString
    val root = s"$work/log"
    val ck = s"$work/ck"
    val owner = "crash_" + Integer.toHexString(root.hashCode)
    val injected = new java.util.concurrent.atomic.AtomicInteger(0)
    val commits = new java.util.concurrent.atomic.AtomicInteger(0)
    val skips = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxId = new java.util.concurrent.atomic.AtomicLong(-1L)
    val name = s"graft_crash_upsert_${crashGateRuns.incrementAndGet()}"
    def run(): Unit = {
      val src = s.readStream
        .schema(Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .schema)
        .option("maxFilesPerTrigger", 2).parquet(transitionsReplayDir(d))
      val q = src.writeStream
        .option("checkpointLocation", ck)
        .foreachBatch { (batch: DataFrame, id: Long) =>
          if (upsertBatch(batch, id, root, owner)) commits.incrementAndGet()
          else skips.incrementAndGet()
          maxId.updateAndGet(m => math.max(m, id))
          // the injection: batch 1's data is COMMITTED (slot v=1 exists,
          // owner-marked) but the batch fails before Spark records it —
          // the restart MUST replay batch 1 and the fence MUST absorb it
          if (id == 1L && injected.compareAndSet(0, 1))
            throw new RuntimeException(
              "graft-injected crash after sink commit, before offset commit")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      awaitBounded(q, name)
    }
    def injectedError(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("graft-injected"))
        || injectedError(t.getCause))
    var firstRunDied = false
    // only the INJECTED failure is absorbed — any other first-run error
    // (a real bug) propagates and fails the gate loudly
    try run()
    catch { case e: Throwable if injectedError(e) => firstRunDied = true }
    require(firstRunDied,
      "first run was expected to die on the injected crash, but survived")
    run() // restart from the same checkpoint: batch 1 replays, fence skips
    require(injected.get() == 1,
      s"injection fired ${injected.get()} times, expected exactly 1")
    require(skips.get() == 1,
      s"replay skips = ${skips.get()}, expected exactly 1 (batch 1's replay)")
    require(commits.get() == maxId.get() + 1,
      s"commits = ${commits.get()}, expected ${maxId.get() + 1} " +
        "(every batch exactly once)")
    graft.operators.Versioned.readAt(s, root, "user_id", maxId.get().toInt)
  }

  /** Crash-free twin oracle: identical to q227's — the crash and replay
    * must be INVISIBLE in the final state. */
  val crashInjectedUpsertSql: String = streamingUpsertSinkSql

  /** q243: LATE-DATA ACCOUNTING — the last unobserved axis of the
    * streaming ledger (round-14 verdict #5): the watermark surface emits
    * `numRowsDroppedByWatermark`, but no gate observed it, and an
    * operator debugging a 100 TB stream needs lateness LOSS as a
    * first-class queryable quantity, not a log line.
    *
    * Engine fact this gate pinned (probe-verified on the executed plan):
    * a streaming aggregation carries TWO watermarks per batch —
    * `StateStoreSave [...] Append, <lateEventsWm>, <evictionWm>` — and
    * the LATE-ROW FILTER runs one batch BEHIND eviction (lateWm of batch
    * N = the operative watermark of batch N−1, i.e. computed from data
    * through batch N−2). A row arriving in the first batch after the
    * watermark passes it is therefore still ACCEPTED (merged into
    * not-yet-evicted window state); only a row arriving two batches
    * late is dropped and counted. The fixture places the rewound rows
    * accordingly.
    *
    * Fixture (derived deterministically from `events.event_id`,
    * synthetic 60-aligned clock, one file per micro-batch): slice 1 =
    * ids < 1000 at ts = base+id s (establishes wm base+899 s); slice 2 =
    * ids 1000..1999 on time (makes base+899 the OPERATIVE watermark);
    * slice 3 = ids 2000..2999, every 5th id rewound to ts =
    * base+(id mod 100) s — far below slice 3's late-filter watermark
    * (base+899), so the 60 s-window aggregation MUST drop exactly those
    * rows; slice 4 = one far-future sentinel whose watermark advance
    * flushes every real window out of append mode (its own window never
    * closes). The gate emits the surviving windowed aggregate AND the
    * engine's dropped-row count (summed over progress events) as one
    * frame, and the DuckDB oracle recomputes BOTH in closed form from
    * `events` — emitted results and lateness loss, one hash. */
  private val lateGateRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  /** 60-aligned epoch base: `window(ts, "60 seconds")` buckets align to
    * the UNIX epoch, so the base must sit on a window boundary or every
    * emitted window start lands at base−20 and the closed-form oracle's
    * (id div 60)·60 arithmetic is off by a phase. */
  private val LateBaseSec = 1699999980L

  private[graft] def probeLateReplay(s: SparkSession, d: String): String = {
    ensureLateReplay(s, d); lateReplayDir(d)
  }

  private def lateReplayDir(d: String): String =
    indexCacheDir("graft-late-replay", d, "events", "late3k_v3")

  private val lateReplayLock = new Object

  private def ensureLateReplay(s: SparkSession, d: String): Unit = {
    import java.nio.file.{Files, Paths}
    val dir = lateReplayDir(d)
    lateReplayLock.synchronized {
      if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
        val ids = Tables.events(s, d).select(col("event_id"))
          .filter(col("event_id") < 3000L)
        val base = System.currentTimeMillis() - 60000L
        def ts(expr: org.apache.spark.sql.Column) =
          timestamp_seconds(lit(LateBaseSec) + expr)
        writeSingleParquet(
          ids.filter(col("event_id") < 1000L)
            .select(col("event_id"), ts(col("event_id")).as("ts")),
          dir, "slice01.parquet", mtime = Some(base + 1000L))
        writeSingleParquet(
          ids.filter(col("event_id") >= 1000L && col("event_id") < 2000L)
            .select(col("event_id"), ts(col("event_id")).as("ts")),
          dir, "slice02.parquet", mtime = Some(base + 2000L))
        // the late batch: arrives with slice 1's watermark OPERATIVE
        // (two batches behind its own data — the lag the gate's doc
        // comment pins), so the rewound rows are genuinely filtered
        writeSingleParquet(
          ids.filter(col("event_id") >= 2000L)
            .select(col("event_id"),
              ts(when(col("event_id") % 5 === 0, col("event_id") % 100)
                .otherwise(col("event_id"))).as("ts")),
          dir, "slice03.parquet", mtime = Some(base + 3000L))
        writeSingleParquet(
          s.range(1).select(lit(1000000L).as("event_id"),
            ts(lit(1000000L)).as("ts")),
          dir, "slice04.parquet", mtime = Some(base + 4000L))
        Files.writeString(Paths.get(dir, "_SUCCESS"), "")
      }
    }
  }

  def lateDataAccounting(s: SparkSession, d: String): DataFrame = {
    ensureLateReplay(s, d)
    val name = s"graft_late_${lateGateRuns.incrementAndGet()}"
    val src = s.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType))))
      .option("maxFilesPerTrigger", 1).parquet(lateReplayDir(d))
    val agg = src
      .withWatermark("ts", "100 seconds")
      .groupBy(window(col("ts"), "60 seconds"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_id"))
      .select(lit("window").as("kind"),
        (unix_timestamp(col("window.start")) - LateBaseSec).as("k"),
        col("n"), col("sum_id"))
    withStatePartitions(s) {
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      awaitBounded(q, name)
      // the engine's own metric — which, for an aggregation, counts the
      // rows REACHING the stateful operator, i.e. post-shuffle PARTIAL
      // AGGREGATES: one dropped row per (late window × batch), not per
      // input row (probe-verified: 200 rewound input rows in 2 windows
      // → numRowsDroppedByWatermark = 2)
      val droppedGroups = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      val inputRows = q.recentProgress.map(_.numInputRows).sum
      val wins = detachMemorySink(s, name)
      // raw-row lateness loss: everything the source delivered that no
      // emitted window accounts for, minus the by-construction-unclosed
      // sentinel — the quantity a 100 TB operator actually reconciles
      val emittedN = wins.agg(coalesce(sum(col("n")), lit(0L)))
        .head().getLong(0)
      val droppedRows = inputRows - 1L - emittedN
      val extra = wins.sparkSession.range(1).select(
        lit("dropped_groups").as("kind"), lit(-1L).as("k"),
        lit(droppedGroups).as("n"), lit(0L).as("sum_id"))
        .unionByName(wins.sparkSession.range(1).select(
          lit("dropped_rows").as("kind"), lit(-2L).as("k"),
          lit(droppedRows).as("n"), lit(0L).as("sum_id")))
      wins.unionByName(extra)
    }
  }

  /** q244: SESSION-OPERATOR LATE-DATA ACCOUNTING — q243's ledger on the
    * OTHER stateful operator class: the transformWithState sessionizer.
    * Same two-batch-late construction (the late-row filter lags eviction
    * by one batch on every stateful operator), but here the dropped rows
    * are session LINES: ids group 5-per-session (inv = id div 5), and in
    * the late batch every 5th id — each session's FIRST line — is
    * rewound below the operative watermark. The TWS input filter must
    * drop exactly those lines (for TWS the metric counts RAW input rows,
    * not partial aggregates — there is no pre-shuffle combine in front
    * of a keyed stateful processor), so sessions 400..599 emit with 4
    * lines and arithmetic that provably excludes the rewound line, while
    * sessions 0..399 emit whole. All per-session values are order-free
    * by construction (shared hour/customer; integer-valued prices sum
    * exactly in any IEEE order), so the fixture is immune to the
    * iterator-order caveat the q241 sort exists for. One frame carries
    * the emitted sessions AND the engine's dropped-line count; one
    * closed-form oracle checks both. */
  private val sessLateGateRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  private def sessLateReplayDir(d: String): String =
    indexCacheDir("graft-sess-late-replay", d, "events", "sesslate3k_v1")

  private val sessLateReplayLock = new Object

  private def ensureSessLateReplay(s: SparkSession, d: String): Unit = {
    import java.nio.file.{Files, Paths}
    val dir = sessLateReplayDir(d)
    sessLateReplayLock.synchronized {
      if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
        val ids = Tables.events(s, d).select(col("event_id").as("id"))
          .filter(col("id") < 3000L)
        val base = System.currentTimeMillis() - 60000L
        def ts(expr: org.apache.spark.sql.Column) =
          timestamp_seconds(lit(LateBaseSec) + expr)
        def slice(df: DataFrame, tsCol: org.apache.spark.sql.Column,
                  name: String, mt: Long): Unit =
          writeSingleParquet(df.select(col("id"), tsCol.as("ts")),
            dir, name, mtime = Some(base + mt))
        slice(ids.filter(col("id") < 1000L), ts(col("id")),
          "slice01.parquet", 1000L)
        slice(ids.filter(col("id") >= 1000L && col("id") < 2000L),
          ts(col("id")), "slice02.parquet", 2000L)
        slice(ids.filter(col("id") >= 2000L),
          ts(when(col("id") % 5 === 0, col("id") % 100).otherwise(col("id"))),
          "slice03.parquet", 3000L)
        writeSingleParquet(
          s.range(1).select(lit(1000000L).as("id"),
            ts(lit(1000000L)).as("ts")),
          dir, "slice04.parquet", mtime = Some(base + 4000L))
        Files.writeString(Paths.get(dir, "_SUCCESS"), "")
      }
    }
  }

  def sessionLateDrops(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    import spark.implicits._
    ensureSessLateReplay(s, d)
    val name = s"graft_sess_late_${sessLateGateRuns.incrementAndGet()}"
    withRocksDbTws(s) {
      val src = s.readStream
        .schema("id LONG, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1).parquet(sessLateReplayDir(d))
      val events = src.as[(Long, java.sql.Timestamp)].map { case (id, t) =>
        val inv = (id / 5L).toString
        graft.streaming.TimedLineEvent(inv, t,
          Some(graft.streaming.Purchase(inv, 1, "1/2/2024 7:15",
            id.toDouble, "c" + inv, "ES")), None)
      }
      val sessions = graft.streaming.SessionizerTws.sessionizeEventTime(
        events, gapMs = 10000L, watermarkDelay = "100 seconds")
      val q = sessions.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      awaitBounded(q, name)
      val dropped = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      val out = detachMemorySink(s, name)
        .select(col("invoiceNo").as("invoice_no"), col("status"),
          col("avgUnitPrice").as("avg_price"),
          col("minUnitPrice").as("min_price"),
          col("maxUnitPrice").as("max_price"),
          col("numberItems").as("number_items"),
          col("lineCount").cast("long").as("line_count"))
      out.unionByName(out.sparkSession.range(1).select(
        lit("__dropped").as("invoice_no"), lit("meta").as("status"),
        lit(0.0d).as("avg_price"), lit(0.0d).as("min_price"),
        lit(0.0d).as("max_price"),
        lit(dropped.toDouble).as("number_items"),
        lit(0L).as("line_count")))
    }
  }

  /** Closed-form twin of the session emissions plus the dropped-LINE
    * count (raw rows for TWS — no partial aggregation in front of the
    * processor). The sentinel's session timer never fires, so it appears
    * on neither side. */
  val sessionLateDropsSql: String = """
    WITH src AS (SELECT event_id AS id FROM events WHERE event_id < 3000),
    ontime AS (SELECT id FROM src WHERE id < 2000 OR id % 5 <> 0),
    sess AS (SELECT id // 5 AS inv, count(*) AS n,
                    sum(id) AS s, min(id) AS mn, max(id) AS mx
             FROM ontime GROUP BY 1)
    SELECT CAST(inv AS VARCHAR) AS invoice_no, 'valid' AS status,
           CAST(s AS DOUBLE) / n AS avg_price,
           CAST(mn AS DOUBLE) AS min_price, CAST(mx AS DOUBLE) AS max_price,
           CAST(n AS DOUBLE) AS number_items, CAST(n AS BIGINT) AS line_count
    FROM sess
    UNION ALL
    SELECT '__dropped', 'meta', 0.0, 0.0, 0.0,
           CAST(count(*) AS DOUBLE), 0
    FROM src WHERE id >= 2000 AND id % 5 = 0"""

  /** Closed-form twin: the surviving 60 s windows over the on-time rows
    * (every id < 2000, plus ids 2000..2999 not divisible by 5) and the
    * dropped-row count (ids 2000..2999 divisible by 5 — rewound two
    * batches below the operative watermark). The sentinel's window never
    * closes, so it appears on neither side. */
  val lateDataAccountingSql: String = """
    WITH src AS (SELECT event_id AS id FROM events WHERE event_id < 3000),
    ontime AS (SELECT id FROM src WHERE id < 2000 OR id % 5 <> 0)
    SELECT 'window' AS kind, CAST((id // 60) * 60 AS BIGINT) AS k,
           count(*) AS n, CAST(sum(id) AS BIGINT) AS sum_id
    FROM ontime GROUP BY 2
    UNION ALL
    SELECT 'dropped_groups', -1,
           count(DISTINCT ((id % 100) // 60) * 60), 0
    FROM src WHERE id >= 2000 AND id % 5 = 0
    UNION ALL
    SELECT 'dropped_rows', -2, count(*), 0
    FROM src WHERE id >= 2000 AND id % 5 = 0"""

  /** q223: STREAM-STATIC ENRICHMENT JOIN under streaming execution — the
    * ingest shape every production stream runs (events joined to a
    * dimension table at arrival: the reference's ST9 broadcast-model
    * access, generalized to a relational dim): the q210 replay files
    * stream through a join against the STATIC customer table
    * (c_custkey = user_id + 1) and a chained streaming aggregation per
    * (market segment, event type); the final table must hash-match the
    * plain batch join's oracle. What's gated: per-micro-batch dim joins
    * compose to exactly the batch join (no dropped or doubled rows at
    * batch boundaries — the join is stateless, the AGGREGATION carries
    * the cross-batch state). Scale shape: the dim side is
    * broadcast-sized, the stream side never shuffles for the join, and
    * the sink holds the segments×types matrix. */
  private val enrichGateRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  def streamStaticEnrichGate(s: SparkSession, d: String): DataFrame = {
    ensureTransitionsReplay(s, d)
    val name = s"graft_enrich_gate_${enrichGateRuns.incrementAndGet()}"
    val src = s.readStream
      .schema(Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .schema)
      .option("maxFilesPerTrigger", 2).parquet(transitionsReplayDir(d))
    val dim = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"))
    val enriched = src.join(broadcast(dim),
      src("user_id") + lit(1L) === dim("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_event_id"))
    withStatePartitions(s) {
      val q = enriched.writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      awaitBounded(q, name)
    }
    detachMemorySink(s, name)
  }

  val streamStaticEnrichSql: String = """
    SELECT c_mktsegment, event_type, count(*) AS n,
           CAST(sum(event_id) AS BIGINT) AS sum_event_id
    FROM events JOIN customer ON c_custkey = user_id + 1
    GROUP BY 1, 2"""

  /** q150: the round-10 curation composition — the document intake a
    * training pipeline actually runs, chaining this round's screens with
    * the established ones IN THE SAFE ORDER (cheap row-local screens
    * before the dedup shuffle): encoding screen (q144: no replacement
    * chars, no control leaks, ascii_ratio ≥ 0.8) → quality route keep
    * (q65) → exact dedup keep-first (q20) → per-source kept counts +
    * token totals. One window shuffle (the dedup) over the pre-screened
    * survivors, one small aggregate — the oracle recomputes the whole
    * chain independently, so the COMPOSITION (filter order included, via
    * the keep-first tie on the screened subset) is what's gated, not just
    * the parts. */
  def curateV2(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val screened = docs
      .join(encodingAuditOn(docs)
        .filter(col("n_replacement") === 0 && col("n_control") === 0 &&
          col("ascii_ratio") >= 0.8)
        .select("doc_id"), Seq("doc_id"), "left_semi")
      .join(graft.queries.Curation.qualityRouteOn(docs)
        .filter(col("verdict") === "keep").select("doc_id"),
        Seq("doc_id"), "left_semi")
    Dedup.exactKeepFirst(screened, "text", "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs_kept"),
        sum(TextFunctions.tokenCount(col("text")).cast("long")).as("total_tokens"))
  }

  // lazy: interpolates Curation.qualityRouteSql — a strict val here can read a
  // partially-initialized Curation (init-order cycle; same hazard as
  // Curation.sourceScorecardSql) and bake the string "null" into the oracle.
  lazy val curateV2Sql: String = s"""
    WITH screened AS (
      SELECT d.doc_id, d.text, d.source FROM documents d
      WHERE (length(text) - length(regexp_replace(text, '[$replChar]', '', 'g'))) = 0
        AND (length(text) - length(regexp_replace(text, '$controlClass', '', 'g'))) = 0
        AND CAST(length(text) - length(regexp_replace(text, '$asciiPrintable', '', 'g'))
                 AS DOUBLE) / NULLIF(CAST(length(text) AS DOUBLE), 0.0) >= 0.8
        AND d.doc_id IN (
          SELECT doc_id FROM (${graft.queries.Curation.qualityRouteSql})
          WHERE verdict = 'keep')),
    deduped AS (
      SELECT doc_id, text, source FROM (
        SELECT doc_id, text, source,
               row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM screened) WHERE rn = 1)
    SELECT source, count(*) AS n_docs_kept,
           CAST(sum(len($toksSql)) AS BIGINT) AS total_tokens
    FROM deduped GROUP BY source"""

  /** q148: the audit's APPEND path — day-1 audit table persisted, day-2
    * delta audited alone, the two MERGED per band (counts/sums add,
    * extrema pick — every column of q137 is a semigroup), and the result
    * must hash-match the FULL-corpus oracle. The sketch-family discipline
    * (HLL max-merge, CMS sum-merge, Bloom or-merge: append ≡ rebuild
    * proven under oracle, daily cost = delta) applied to the monitoring
    * table: at 100 TB you audit the day's ingest and fold it into
    * yesterday's table; you never re-scan the corpus. */
  private def auditStateDir(d: String): String =
    indexCacheDir("graft-audit-state", d, "embeddings", s"evenhalf$auditCacheVersion")

  private val auditStateLock = new Object

  def auditIncremental(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val dir = auditStateDir(d)
    auditStateLock.synchronized {
      if (!new java.io.File(s"$dir/_SUCCESS").exists())
        embeddingAuditOn(emb.filter(col("vec_id") % 2 === 0))
          .write.mode("overwrite").parquet(dir)
    }
    val day1 = s.read.parquet(dir)
    val day2 = embeddingAuditOn(emb.filter(col("vec_id") % 2 === 1))
    day1.unionByName(day2)
      .groupBy("norm_band")
      .agg(
        sum(col("n_vectors")).as("n_vectors"),
        min(col("min_norm")).as("min_norm"),
        max(col("max_norm")).as("max_norm"),
        sum(col("n_zero_vectors")).as("n_zero_vectors"),
        sum(col("n_nonfinite_components")).as("n_nonfinite_components"))
  }

  /** q146: the native grouped top-k AGGREGATE under the gate — q127
    * answers the same question (top-3 customers by balance per nation)
    * with a window; this row answers it with the engine's
    * TypedImperativeAggregate (`TopKRows`, registered as SQL `graft_topk`)
    * so the custom-aggregate machinery — buffer update/merge/serialize,
    * the analyzer's aggregate wrapping, posexplode of the struct-array
    * result — is driver-gated end to end, not just spec'd. The aggregate's
    * total order (key desc, payload asc) makes the kept set unique under
    * ANY merge order, which is exactly what lets a DuckDB window
    * formulation reproduce it. At scale the aggregate form beats the
    * window form: per-group state is k pairs (no sort of the full
    * partition), shuffles bytes ∝ groups·k. */
  def topkNativeAgg(s: SparkSession, d: String): DataFrame = {
    graft.GraftExtensions.register(s)
    Tables.customer(s, d).createOrReplaceTempView("graft_cust_v")
    s.sql("""
      SELECT c_nationkey, CAST(pos + 1 AS BIGINT) AS rnk,
             t.key AS acctbal, t.payload AS top_custkey
      FROM (SELECT c_nationkey,
              graft_topk(c_acctbal, c_custkey, 3) AS top
            FROM graft_cust_v GROUP BY c_nationkey)
      LATERAL VIEW posexplode(top) x AS pos, t""")
  }

  val topkNativeAggSql: String = """
    SELECT c_nationkey, CAST(rn AS BIGINT) AS rnk,
           c_acctbal AS acctbal, c_custkey AS top_custkey
    FROM (SELECT c_nationkey, c_acctbal, c_custkey,
            row_number() OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal DESC, c_custkey) AS rn
          FROM customer)
    WHERE rn <= 3"""

  /** q143: cross-source duplication matrix — for every source pair, how
    * many distinct document fingerprints they SHARE. The data-governance
    * view of dedup: a hot cell means source B re-hosts source A's content
    * (scrape-of-a-scrape, mirror feeds), which both wastes tokens and
    * breaks "dedup within source" assumptions. Shape: distinct
    * (source, fp) — one aggregate — then a self-equi-join ON fp whose
    * per-key fan-out is bounded by sources-per-fingerprint (≤ #sources),
    * never corpus-sized; a count aggregate on the (tiny) pair key ends it.
    * Non-vacuous on the fixture (planted duplicate texts straddle
    * sources). */
  def sourceDupMatrix(s: SparkSession, d: String): DataFrame = {
    val f = Tables.documents(s, d)
      .select(col("source"), TextFunctions.fingerprint(col("text"), 64).as("fp"))
      .distinct()
    f.select(col("source").as("source_a"), col("fp"))
      .join(f.select(col("source").as("source_b"), col("fp")), Seq("fp"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_shared_fps"))
  }

  val sourceDupMatrixSql: String = s"""
    WITH f AS (SELECT DISTINCT source, $fingerprintExprSql AS fp FROM documents)
    SELECT a.source AS source_a, b.source AS source_b,
           count(*) AS n_shared_fps
    FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
    GROUP BY 1, 2"""

  /** q142: the SQL surface end-to-end — a `spark.sql` query over temp
    * views calling the engine's REGISTERED Catalyst expressions
    * (`GraftExtensions.register`: graft_fingerprint, graft_dot), under the
    * same DuckDB oracle as the DataFrame paths. This gates the extension
    * mechanism itself: if function registration, the codegen expressions'
    * SQL bindings, or the analyzer plumbing regress, this row goes red —
    * not just a unit spec. The arithmetic is the proven exact family
    * (31-bit polynomial fingerprint fold, left-fold dot), so hash-exact
    * cross-engine. */
  def sqlSurface(s: SparkSession, d: String): DataFrame = {
    graft.GraftExtensions.register(s) // createOrReplaceTempFunction: idempotent
    Tables.documents(s, d).createOrReplaceTempView("graft_docs_v")
    Tables.embeddings(s, d).createOrReplaceTempView("graft_emb_v")
    s.sql("""
      SELECT d.doc_id, graft_fingerprint(d.text, 64) AS fp,
             graft_dot(CAST(e.embedding AS ARRAY<DOUBLE>),
                       CAST(e.embedding AS ARRAY<DOUBLE>)) AS sq_norm
      FROM graft_docs_v d JOIN graft_emb_v e ON d.doc_id = e.vec_id""")
  }

  val sqlSurfaceSql: String = s"""
    SELECT d.doc_id, ${fingerprintExprSqlOn("d.text")} AS fp,
           ${dotSql("v", "v")} AS sq_norm
    FROM documents d
    JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) e
      ON d.doc_id = e.vec_id"""

  /** q139: hybrid retrieval — ANN over only the vectors whose DOCUMENT
    * passes the q65 quality route (doc_id ≡ vec_id in the fixture corpus,
    * the usual contract of a text+vector store). The filter is applied
    * INSIDE candidate generation (left-semi before scoring), not to the
    * top-k output — the q104 lesson: post-filtering an unfiltered top-k
    * under-returns for queries whose same-filter neighbors rank below k.
    * Non-vacuous at the gate SFs (the route drops ~21% of docs), and exact:
    * both engines compose their already-proven q65 and q24 pipelines.
    *
    * At 100 TB the verdict is computed once at ingest and stored as index
    * metadata (`writeIvfIndex(metaCols = …)`, the q104 serving path), so
    * the probe pushes `verdict = 'keep'` into the pruned cell scan instead
    * of re-deriving it; this gate row pins the SEMANTICS with the exact
    * route. */
  def hybridSearch(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val keep = graft.queries.Curation.qualityRouteOn(Tables.documents(s, d))
      .filter(col("verdict") === "keep")
      .select(col("doc_id").as("vec_id"))
    val corpus = emb.join(keep, Seq("vec_id"), "left_semi")
    Similarity.bruteForceTopK(corpus, emb.filter(col("vec_id") < 10), k = 5)
  }

  // lazy: same Curation init-cycle guard as curateV2Sql.
  lazy val hybridSearchSql: String = s"""
    WITH keep AS (SELECT doc_id FROM (${graft.queries.Curation.qualityRouteSql})
                  WHERE verdict = 'keep'),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings JOIN keep ON embeddings.vec_id = keep.doc_id),
    q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
          FROM embeddings WHERE vec_id < 10),
    pairs AS (
      SELECT q.qid AS query_id, c.vec_id AS neighbor_id,
        CASE WHEN sqrt(${dotSql("qv", "qv")}) * sqrt(${dotSql("v", "v")}) = 0.0
             THEN NULL
             ELSE ${dotSql("qv", "v")}
                  / (sqrt(${dotSql("qv", "qv")}) * sqrt(${dotSql("v", "v")}))
        END AS sim
      FROM c CROSS JOIN q
      WHERE c.vec_id <> q.qid)
    SELECT query_id, neighbor_id, sim, rn FROM (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rn
      FROM pairs)
    WHERE rn <= 5"""

  /** q160: q139's hybrid retrieval SERVED FROM THE INDEX — the quality
    * verdict written as IVF index metadata (`writeIvfIndex(metaCols =
    * verdict)`, the q104 mechanism) instead of a per-query semi-join of
    * the full embedding table against a re-derived keep set. The
    * `verdict = 'keep'` predicate rides the pruned cell scan as a
    * PushedFilter next to the cell PartitionFilters (ScaleSpec asserts
    * both), so at 100 TB a hybrid query touches cells/nProbe of the
    * corpus and the quality screen makes the probe CHEAPER — q139's own
    * scaladoc names this as the scale path; this row pins it under
    * oracle with the pinned-quantizer bucketing mirrored exactly (the
    * q138 discipline). Corpus rows are embeddings joined to their
    * document's verdict at INDEX BUILD time — re-curation is an index
    * rebuild (offline maintenance), not a query-time recomputation. */
  private def ivfVerdictIndexDir(d: String): String =
    indexCacheDir("graft-ivf-cache", d, "embeddings", "c16t99verd")

  def hybridSearchIvf(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    val emb = Tables.embeddings(s, d)
    val dir = ivfVerdictIndexDir(d)
    ivfBuildLock.synchronized {
      if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
        val labeled = emb.join(
          graft.queries.Curation.qualityRouteOn(Tables.documents(s, d))
            .select(col("doc_id").as("vec_id"), col("verdict")),
          Seq("vec_id"))
        Similarity.writeIvfIndex(labeled, dir, ivfCenters, metaCols = Seq("verdict"))
      }
    }
    Similarity.ivfTopKIndexedFiltered(dir, ivfCenters,
      emb.filter(col("vec_id") < 10), k = 5,
      neighborFilter = col("verdict") === "keep", nProbe = 4)
  }

  /** The oracle mirrors the APPROXIMATE route exactly (q31/q138
    * discipline): corpus = embeddings with a verdict, bucketed by the
    * pinned quantizer; queries = the FULL embedding table's probe cells
    * (a query needs no verdict to search); candidates = keep-verdict index
    * rows in the probed cells. */
  lazy val hybridSearchIvfSql: String = s"""
    WITH kq AS (SELECT doc_id, verdict
                FROM (${graft.queries.Curation.qualityRouteSql})),
    ctr AS (SELECT * FROM (VALUES ${centersValuesSql(graft.ml.PinnedIvfCenters.values)}) t(cell, cc)),
    c AS (SELECT e.vec_id, kq.verdict, CAST(e.embedding AS DOUBLE[]) AS v
          FROM embeddings e JOIN kq ON e.vec_id = kq.doc_id),
    assign AS (SELECT vec_id, verdict, v, cell FROM (
                 SELECT c.vec_id, c.verdict, c.v, ctr.cell,
                        row_number() OVER (PARTITION BY c.vec_id
                          ORDER BY ${sqdistFoldSql("c.v", "ctr.cc")}, ctr.cell) AS rn
                 FROM c CROSS JOIN ctr) WHERE rn = 1),
    qv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id < 10),
    q AS (SELECT vec_id AS query_id, v AS qvec, cell FROM (
            SELECT qv.vec_id, qv.v, ctr.cell,
                   row_number() OVER (PARTITION BY qv.vec_id
                     ORDER BY ${sqdistFoldSql("qv.v", "ctr.cc")}, ctr.cell) AS rn
            FROM qv CROSS JOIN ctr) WHERE rn <= 4),
    cand AS (SELECT q.query_id, q.qvec, a.vec_id AS neighbor_id, a.v
             FROM q JOIN assign a USING (cell)
             WHERE a.vec_id <> q.query_id AND a.verdict = 'keep'),
    scored AS (SELECT query_id, neighbor_id, ${cosineSql("qvec", "v")} AS sim
               FROM cand)
    SELECT query_id, neighbor_id, sim, rn FROM (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rn
      FROM scored)
    WHERE rn <= 5"""

  /** q138: the IVF-probed hard-negative route — q135's candidate
    * generation bounded to each anchor's 4 nearest cells of the
    * label-carrying index (q104's), the way a 100 TB corpus would mine
    * training pairs. Deterministic end to end with the pinned quantizer,
    * so the APPROXIMATE pipeline is under full oracle (the q31
    * discipline); its agreement with the exact q135 answer is pinned in
    * ExtensionsSpec (the q112 discipline: approximation quality is a
    * measured gate quantity, not a claim). */
  def hardNegativesIvfGate(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    val emb = Tables.embeddings(s, d)
    val dir = ivfLabIndexDir(d)
    ivfBuildLock.synchronized {
      if (!new java.io.File(s"$dir/_SUCCESS").exists())
        Similarity.writeIvfIndex(emb, dir, ivfCenters, metaCols = Seq("label"))
    }
    Similarity.hardNegativesIvf(dir, ivfCenters, emb.filter(col("vec_id") < 20))
  }

  val hardNegativesIvfSql: String = s"""
    WITH c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    ctr AS (SELECT * FROM (VALUES ${centersValuesSql(graft.ml.PinnedIvfCenters.values)}) t(cell, cc)),
    rk AS (SELECT vec_id, label, v, cell,
             row_number() OVER (PARTITION BY vec_id ORDER BY dd, cell) AS rn
           FROM (SELECT c.vec_id, c.label, c.v, ctr.cell,
                   ${sqdistFoldSql("c.v", "ctr.cc")} AS dd
                 FROM c CROSS JOIN ctr)),
    assign AS (SELECT vec_id, label, v, cell FROM rk WHERE rn = 1),
    q AS (SELECT vec_id AS anchor_id, label AS a_label, v AS av, cell FROM rk
          WHERE rn <= 4 AND vec_id < 20),
    cand AS (SELECT q.anchor_id, q.a_label, q.av, a.vec_id AS cand_id,
               a.label AS c_label, a.v
             FROM q JOIN assign a USING (cell)
             WHERE a.vec_id <> q.anchor_id),
    best AS (SELECT anchor_id, cand_id, same, sim,
               row_number() OVER (PARTITION BY anchor_id, same
                                  ORDER BY sim DESC, cand_id) AS rn
             FROM (SELECT anchor_id, cand_id, (c_label = a_label) AS same,
                     ${cosineSql("av", "v")} AS sim
                   FROM cand))
    SELECT anchor_id,
           max(CASE WHEN same THEN cand_id END) AS pos_id,
           max(CASE WHEN same THEN sim END) AS pos_sim,
           max(CASE WHEN NOT same THEN cand_id END) AS neg_id,
           max(CASE WHEN NOT same THEN sim END) AS neg_sim,
           max(CASE WHEN same THEN sim END)
             - max(CASE WHEN NOT same THEN sim END) AS margin
    FROM best WHERE rn = 1 GROUP BY anchor_id"""

  /** q137: embedding-corpus audit — the data-QA gate a vector pipeline
    * runs before indexing/training: per norm band (floor(4·‖v‖)), the
    * vector count and exact norm extrema, plus corpus-wide counts of
    * zero vectors and non-finite components. A norm collapse (all-zero
    * batch), an exploding-scale regression, or a NaN leak each lands in
    * its own row instead of vanishing into a mean.
    *
    * Float discipline: the norm is the engine's exact fold
    * ([[Similarity.norm]]); floor(4·nrm) has no tie-rounding; min/max are
    * element picks — every output value is bit-reproducible at any
    * parallelism. Scale shape: one row-local projection + one
    * map-side-combined aggregate on ≤ a few dozen band keys; NULL-safe
    * (a NULL embedding lands in the NULL band, counted, never dropped). */
  def embeddingAudit(s: SparkSession, d: String): DataFrame =
    embeddingAuditOn(Tables.embeddings(s, d))

  /** Version tag for on-disk caches derived from [[embeddingAuditOn]]'s
    * OUTPUT (q147's replay table, q148's persisted day-1 state). Bump it
    * whenever the audit's schema or semantics change — otherwise a stale
    * cache silently survives the code change and q147/q148 diverge from
    * (or spuriously match) the oracle. The IVF caches already carry this
    * discipline in their params tag (c16 → c16t99 when the quantizer was
    * retrained); this makes the audit caches match it. */
  private[queries] val auditCacheVersion = "a1"

  def embeddingAuditOn(emb: DataFrame): DataFrame = {
    val v = col("embedding").cast("array<double>")
    val nrm = Similarity.norm(v)
    val nonfinite = size(filter(v, x => x.isNaN || x === Double.PositiveInfinity ||
      x === Double.NegativeInfinity))
    // non-finite norms are QUARANTINED into the NULL band rather than cast:
    // Spark's non-ANSI long cast sends NaN to 0 (silently polluting the
    // zero band) and +Inf to Long.MaxValue, and DuckDB's cast errors — the
    // explicit CASE is the one spelling with identical semantics in both
    val band = when(isnan(nrm) || nrm === Double.PositiveInfinity, lit(null))
      .otherwise(floor(nrm * lit(4.0)).cast("long"))
    emb.select(
        band.as("norm_band"),
        nrm.as("nrm"),
        when(nrm === 0.0, 1L).otherwise(0L).as("is_zero"),
        nonfinite.cast("long").as("n_nonfinite"))
      .groupBy("norm_band")
      .agg(count(lit(1)).as("n_vectors"),
        min(col("nrm")).as("min_norm"),
        max(col("nrm")).as("max_norm"),
        sum(col("is_zero")).as("n_zero_vectors"),
        sum(col("n_nonfinite")).as("n_nonfinite_components"))
  }

  val embeddingAuditSql: String = s"""
    SELECT CASE WHEN isnan(nrm) OR isinf(nrm) THEN NULL
                ELSE CAST(floor(nrm * 4.0) AS BIGINT) END AS norm_band,
           count(*) AS n_vectors,
           min(nrm) AS min_norm,
           max(nrm) AS max_norm,
           CAST(sum(CASE WHEN nrm = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero_vectors,
           CAST(sum(CAST(len(list_filter(v, x -> isnan(x) OR isinf(x))) AS BIGINT))
             AS BIGINT) AS n_nonfinite_components
    FROM (SELECT v, sqrt(${dotSql("v", "v")}) AS nrm
          FROM (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings))
    GROUP BY 1"""

  /** Shared SQL fragments for the fixed-quantizer oracles. */
  private val embSql = "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings"
  private def sqdistFoldSql(v: String, cc: String): String =
    s"list_reduce(list_concat([CAST(0.0 AS DOUBLE)], list_transform(range(len($v)), " +
      s"i -> ($v[i+1] - $cc[i+1]) * ($v[i+1] - $cc[i+1]))), (a, b) -> a + b)"
  /** A DOUBLE[] literal whose elements carry an exponent, so DuckDB parses
    * each one DIRECTLY as DOUBLE. A bare-decimal list ([0.078..., ...])
    * first unifies its elements to one common DECIMAL type, which can
    * round the last significant digit BEFORE the ::DOUBLE[] cast — an
    * off-by-one-ulp oracle (caught by the q169 ADC gate; depends on the
    * element magnitude mix, so it can lurk silently). */
  private[queries] def doubleListSql(xs: Seq[Double]): String =
    "[" + xs.map { x =>
      val s = x.toString
      if (s.contains("E") || s.contains("e")) s else s + "e0"
    }.mkString(", ") + "]::DOUBLE[]"

  private def centersValuesSql(centers: Seq[Seq[Double]]): String =
    centers.zipWithIndex
      .map { case (c, i) => s"(${i + 1}, ${doubleListSql(c)})" }
      .mkString(", ")
  private def cosineSql(a: String, b: String): String =
    s"CASE WHEN sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}) = 0.0 THEN NULL " +
      s"ELSE ${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})) END"

  /** q31 quantizer: 16 TRAINED centers — a seed-pinned k-means fit on the
    * sf0.01 embeddings (graft.ml.PinIvfMain; GateHygieneSpec asserts
    * refit ≡ pinned), committed as plan literals exactly like the q51
    * cluster centers, so the DuckDB oracle still reproduces the whole
    * approximate pipeline. Data-adapted Voronoi cells replaced the ±1
    * hypercube quantizer in round 10: mean recall@5 at nProbe=4 rose
    * 0.44→0.70 (sf0.01) and 0.50→0.66 (sf0.1) with an identical plan
    * shape. The index is materialized ONCE per sf dir into a
    * cell-partitioned parquet layout and probes are partition-pruned
    * scans — the 100 TB serving path, not per-query index training. */
  private val ivfCenters: Seq[Seq[Double]] = graft.ml.PinnedIvfCenters.values

  /** Fingerprinted cache directory for a materialized index: the key binds
    * the source parquet's identity (mtime ^ size — a regenerated fixture
    * can never serve a stale index) AND the build parameters (`params` —
    * a parameter change can never probe an incompatible index; band hashes
    * built under different numHashes would simply never collide, silently
    * emitting zero candidates). */
  /** Write `df` as exactly ONE named parquet file inside `dir` — the
    * fixture-prep move every file-ordered replay and multi-generation
    * layout needs. Crash-safe: REPLACE_EXISTING makes a re-run after an
    * interrupted build converge on the same file instead of failing on
    * the half-moved one (the `_SUCCESS` marker is still what gates
    * "built"; this just makes the rebuild idempotent). The temp dir is
    * `_`-prefixed INSIDE `dir`, which Spark's file listing hides. */
  private[graft] def writeSingleParquet(df: DataFrame, dir: String,
      fileName: String, mtime: Option[Long] = None): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    Files.createDirectories(Paths.get(dir))
    val tmp = s"$dir/_build_$fileName"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val target = Paths.get(dir, fileName)
    Files.move(part.toPath, target, StandardCopyOption.REPLACE_EXISTING)
    mtime.foreach { t => target.toFile.setLastModified(t): Unit }
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(tmp))
  }

  private[queries] def indexCacheDir(cache: String, d: String, srcTable: String,
                                     params: String): String = {
    val src = new java.io.File(s"$d/$srcTable.parquet")
    val fp = java.lang.Long.toHexString(src.lastModified() ^ (src.length() * 1000003L))
    s"/root/repo/target/$cache/" +
      d.replaceAll("[^A-Za-z0-9.]", "_") + s"_${params}_${fp}_v2"
  }

  private def ivfIndexDir(d: String): String =
    indexCacheDir("graft-ivf-cache", d, "embeddings", "c16t99")

  private val ivfBuildLock = new Object

  def annIvfTopK(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    val emb = Tables.embeddings(s, d)
    val dir = ivfIndexDir(d)
    // serialize the existence check + build so concurrent callers in one
    // JVM never race overlapping overwrite-writes into the same directory
    ivfBuildLock.synchronized {
      if (!new java.io.File(s"$dir/_SUCCESS").exists())
        Similarity.writeIvfIndex(emb, dir, ivfCenters)
    }
    Similarity.ivfTopKIndexed(dir, ivfCenters, emb.filter(col("vec_id") < 10),
      k = 5, nProbe = 4)
  }

  /** The quantizer is deterministic, so DuckDB reproduces the ENTIRE IVF
    * pipeline — cell assignment, probe selection, candidate set, cosine
    * ranking — making the approximate index exactly checkable. Shared by
    * q31 (build-once probe) and q99 (append-then-probe): cell assignment
    * is per-vector, so the incrementally-grown index holds exactly the
    * full-rebuild rows and ONE oracle form covers both. */
  private def ivfProbeSql(queryPred: String, neighborPred: String = "TRUE"): String = s"""
    WITH c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    ctr AS (SELECT * FROM (VALUES ${centersValuesSql(ivfCenters)}) t(cell, cc)),
    rk AS (SELECT vec_id, label, v, cell,
             row_number() OVER (PARTITION BY vec_id ORDER BY dd, cell) AS rn
           FROM (SELECT c.vec_id, c.label, c.v, ctr.cell,
                   ${sqdistFoldSql("c.v", "ctr.cc")} AS dd
                 FROM c CROSS JOIN ctr)),
    assign AS (SELECT vec_id, label, v, cell FROM rk WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, v AS qv, cell FROM rk
          WHERE rn <= 4 AND ($queryPred)),
    cand AS (SELECT q.query_id, q.qv, a.vec_id AS neighbor_id, a.v
             FROM q JOIN assign a USING (cell)
             WHERE a.vec_id <> q.query_id AND ($neighborPred)),
    scored AS (SELECT query_id, neighbor_id, ${cosineSql("qv", "v")} AS sim
               FROM cand)
    SELECT query_id, neighbor_id, sim, rn FROM (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rn
      FROM scored)
    WHERE rn <= 5"""

  val annIvfTopKSql: String = ivfProbeSql("vec_id < 10")

  /** q112: the IVF index's RECALL@5 as an oracle-checked quantity — per
    * query, how many of the exact brute-force top-5 the approximate probe
    * returned (integer 0..5, no float ratio — exact cross-engine). An
    * approximate index without a measured recall is an unquantified
    * liability; here the measurement itself is part of the verified
    * surface, so a quantizer or probe regression shows up as a recall
    * drop in the GATE, not in production. Both sides reuse the exact
    * operators already under oracle (q24 brute, q31 probe); the overlap
    * is a left-semi count — ids only, no vectors move. */
  def annRecallAt5(s: SparkSession, d: String): DataFrame = {
    val brute = annBruteTopK(s, d).select("query_id", "neighbor_id")
    val ivf = annIvfTopK(s, d).select("query_id", "neighbor_id")
      .withColumn("__hit", lit(1))
    // left join + count(non-null): a query the probe fully missed still
    // reports hits_at_5 = 0 instead of silently vanishing from the gate
    brute.join(ivf, Seq("query_id", "neighbor_id"), "left_outer")
      .groupBy("query_id").agg(count(col("__hit")).as("hits_at_5"))
  }

  /** DuckDB permits WITH inside a parenthesized subquery, so the two
    * existing oracle texts compose verbatim — one definition of each
    * pipeline, shared by its own gate row AND the recall row. */
  val annRecallAt5Sql: String = s"""
    SELECT b.query_id, count(i.neighbor_id) AS hits_at_5
    FROM ($annBruteTopKSql) b
    LEFT JOIN ($annIvfTopKSql) i
      ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
    GROUP BY b.query_id"""

  /** q134: the PCA projection's retrieval FIDELITY as an oracle-checked
    * quantity — recall@5 of brute-force cosine in the 8-dim projected
    * space (q132's components) against brute-force cosine in the full
    * 64-dim space (q24's truth), per query. The q112 discipline applied
    * to q132: the dimensionality reduction's quality is a GATE ROW, not a
    * claim. Every arithmetic step is bit-exact cross-engine (projection =
    * q132's proven left-fold dots; 8-dim cosine = the q24 machinery on
    * the projected arrays), so the rankings — and therefore the recall
    * counts — match exactly. Left join keeps fully-missed queries at 0.
    *
    * On THIS testdata the measured recall is low (0-1 of 5 per query at
    * sf0.01): the synthetic embeddings are near-isotropic, so the top-8
    * eigenvalues carry only ~the 8/64 isotropic share (EmbedPcaSpec's
    * energy floor sits just above 12.5%) and neighborhoods scramble under
    * projection. That is a true property of isotropic data, not an
    * operator defect — on real embeddings (which are strongly low-rank)
    * the same row reports the fidelity a pipeline would actually get, and
    * the gate's job is exactly to MEASURE it rather than assume it.
    *
    * Scale shape: the projected corpus is 8 doubles per row — the
    * broadcast-queries brute pass costs 8× less per pair than full-dim,
    * which is the point of projecting before searching. */
  /** q156: per-label embedding tightness — each label's mean member
    * cosine to its own EXACT centroid (q78's quantized-exact per-dim
    * means, assembled into a vector), the label-noise detector an
    * embedding-training pipeline runs over labeled corpora: a label whose
    * members barely point at their centroid is mislabeled or
    * incoherent. Exact end to end: centroid components are
    * order-independent quantized means, the member·centroid product is
    * the proven fold dot, and the per-label mean cosine goes through the
    * quantized sum. Scale shape: ONE aggregate builds all centroids
    * (labels × dims rows), they broadcast back as 10 label vectors, and
    * the scoring pass is row-local — no member-member pairs anywhere
    * (contrast q30's pairwise path). */
  def labelTightness(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val vd = col("embedding").cast("array<double>")
    val byDim = emb.select(col("label"), posexplode(vd).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(graft.functions.Exact.davg(col("v"), 6).as("c"))
    val centroids = byDim
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("dim"), col("c")))).as("pairs"))
      .select(col("label"),
        transform(col("pairs"), p => p.getField("c")).as("centroid"))
    emb.select(col("label"), vd.as("v"))
      .join(broadcast(centroids), "label")
      .withColumn("cos", Similarity.cosine(col("v"), col("centroid")))
      .groupBy("label")
      .agg(count(lit(1)).as("n_members"),
        try_divide(graft.functions.Exact.dsum(col("cos"), 6), count(col("cos")))
          .as("mean_cos_to_centroid"),
        min(col("cos")).as("min_cos_to_centroid"))
  }

  val labelTightnessSql: String = s"""
    WITH byd AS (
      SELECT label, p.dim AS dim,
             ${graft.functions.Exact.davgSql("p.v", 6)} AS c
      FROM (SELECT label,
              unnest(list_transform(range(len(embedding)),
                i -> struct_pack(dim := i, v := CAST(embedding[i+1] AS DOUBLE)))) AS p
            FROM embeddings)
      GROUP BY 1, 2),
    ctr AS (
      SELECT label, list(c ORDER BY dim) AS centroid
      FROM byd GROUP BY label),
    scored AS (
      SELECT e.label, ${cosineSql("v", "centroid")} AS cos
      FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) e
      JOIN ctr USING (label))
    SELECT label, count(*) AS n_members,
           ${graft.functions.Exact.dsumSql("cos", 6)} / count(cos)
             AS mean_cos_to_centroid,
           min(cos) AS min_cos_to_centroid
    FROM scored GROUP BY label"""

  /** q153: matryoshka-prefix retrieval fidelity — recall@5 of cosine over
    * the FIRST [[matryoshkaDims]] embedding dimensions against the
    * full-space truth (q24). The practice MRL-style embedding models
    * enable: serve the cheap prefix, keep the tail for re-ranking; this
    * row MEASURES what prefix truncation costs on this corpus, the q134
    * discipline with slicing instead of projection. On the synthetic
    * near-isotropic embeddings the prefix carries ~16/64 of the energy,
    * so measured recall is honestly low — the row's value is that the
    * number is gated, not assumed (real MRL embeddings put most energy in
    * the prefix by training). `slice` + the proven fold-dot machinery:
    * exact cross-engine, and the prefix pass folds 4× fewer terms per
    * pair than full-dim — the point of truncating. */
  val matryoshkaDims = 16

  def matryoshkaRecallAt5(s: SparkSession, d: String): DataFrame = {
    val pre = Tables.embeddings(s, d)
      .select(col("vec_id"),
        slice(col("embedding").cast("array<double>"), 1, matryoshkaDims).as("pvec"))
    val preTop = Similarity.bruteForceTopK(
        pre, pre.filter(col("vec_id") < 10), k = 5, vecCol = "pvec")
      .select(col("query_id"), col("neighbor_id")).withColumn("__hit", lit(1))
    annBruteTopK(s, d).select("query_id", "neighbor_id")
      .join(preTop, Seq("query_id", "neighbor_id"), "left_outer")
      .groupBy("query_id").agg(count(col("__hit")).as("hits_at_5"))
  }

  val matryoshkaRecallAt5Sql: String = s"""
    SELECT b.query_id, count(i.neighbor_id) AS hits_at_5
    FROM ($annBruteTopKSql) b
    LEFT JOIN (
      WITH c AS (SELECT vec_id,
                   list_slice(CAST(embedding AS DOUBLE[]), 1, $matryoshkaDims) AS v
                 FROM embeddings),
      q AS (SELECT vec_id AS qid, v AS qv FROM c WHERE vec_id < 10),
      pairs AS (
        SELECT q.qid AS query_id, c.vec_id AS neighbor_id,
          CASE WHEN sqrt(${dotSql("qv", "qv")}) * sqrt(${dotSql("v", "v")}) = 0.0
               THEN NULL
               ELSE ${dotSql("qv", "v")}
                    / (sqrt(${dotSql("qv", "qv")}) * sqrt(${dotSql("v", "v")}))
          END AS sim
        FROM c CROSS JOIN q WHERE c.vec_id <> q.qid)
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rn
        FROM pairs)
      WHERE rn <= 5) i
      ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
    GROUP BY b.query_id"""

  def pcaAnnRecallAt5(s: SparkSession, d: String): DataFrame = {
    val k = graft.ml.EmbedPca.k
    val proj = graft.ml.EmbedPca.projectPinned(Tables.embeddings(s, d))
      .select(col("vec_id"), array((1 to k).map(j => col(s"p$j")): _*).as("pvec"))
    val pcaTop = Similarity.bruteForceTopK(
        proj, proj.filter(col("vec_id") < 10), k = 5, vecCol = "pvec")
      .select(col("query_id"), col("neighbor_id")).withColumn("__hit", lit(1))
    annBruteTopK(s, d).select("query_id", "neighbor_id")
      .join(pcaTop, Seq("query_id", "neighbor_id"), "left_outer")
      .groupBy("query_id").agg(count(col("__hit")).as("hits_at_5"))
  }

  /** Builds the projected-space SQL locally from the pinned components
    * (NOT by referencing MlQueries' SQL val — a cross-object init cycle
    * would silently interpolate "null", the Verify NPE class). */
  val pcaAnnRecallAt5Sql: String = {
    def litList(c: Seq[Double]): String =
      c.map(v => s"CAST('$v' AS DOUBLE)").mkString("[", ", ", "]")
    val projCols = graft.ml.EmbedPca.pinnedComponents.zipWithIndex.map { case (c, j) =>
      s"""list_reduce(list_concat([CAST(0 AS DOUBLE)],
           list_transform(range(len(ev)), i -> ev[i+1] * ${litList(c)}[i+1])),
           (a, b) -> a + b) AS p${j + 1}"""
    }.mkString(",\n           ")
    val pArr = (1 to graft.ml.EmbedPca.k).map(j => s"p$j").mkString("[", ", ", "]")
    s"""
    SELECT b.query_id, count(i.neighbor_id) AS hits_at_5
    FROM ($annBruteTopKSql) b
    LEFT JOIN (
      WITH proj AS (
        SELECT vec_id, $projCols
        FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings)),
      p AS (SELECT vec_id, $pArr AS v FROM proj),
      q AS (SELECT vec_id AS qid, v AS qv FROM p WHERE vec_id < 10),
      pairs AS (
        SELECT q.qid AS query_id, p.vec_id AS neighbor_id,
          CASE WHEN sqrt(${dotSql("qv", "qv")}) * sqrt(${dotSql("v", "v")}) = 0.0
               THEN NULL
               ELSE ${dotSql("qv", "v")}
                    / (sqrt(${dotSql("qv", "qv")}) * sqrt(${dotSql("v", "v")}))
          END AS sim
        FROM p CROSS JOIN q
        WHERE p.vec_id <> q.qid)
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rn
        FROM pairs)
      WHERE rn <= 5) i
      ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
    GROUP BY b.query_id"""
  }

  /** q104: metadata-FILTERED ANN — top-5 among only the neighbors whose
    * label is even, the "vector search with an attribute filter" serving
    * shape (RAG corpus scoping, per-tenant retrieval). Built on a labeled
    * index (`writeIvfIndex(metaCols = label)`) so the predicate rides the
    * SAME cell-pruned scan as the probe — a pre-filter, not a recall-losing
    * top-k post-filter; SimilarityIndexSpec asserts both the cell
    * PartitionFilters and the label PushedFilters, and pins a query where
    * post-filtering would return fewer than k rows. */
  private val filteredLabels: Seq[Int] = Seq(0, 2, 4, 6, 8)

  private def ivfLabIndexDir(d: String): String =
    indexCacheDir("graft-ivf-cache", d, "embeddings", "c16t99lab")

  def annIvfFilteredTopK(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    val emb = Tables.embeddings(s, d)
    val dir = ivfLabIndexDir(d)
    ivfBuildLock.synchronized {
      if (!new java.io.File(s"$dir/_SUCCESS").exists())
        Similarity.writeIvfIndex(emb, dir, ivfCenters, metaCols = Seq("label"))
    }
    Similarity.ivfTopKIndexedFiltered(dir, ivfCenters,
      emb.filter(col("vec_id") < 10), k = 5,
      neighborFilter = col("label").isin(filteredLabels.map(Integer.valueOf): _*),
      nProbe = 4)
  }

  val annIvfFilteredTopKSql: String =
    ivfProbeSql("vec_id < 10", s"a.label IN (${filteredLabels.mkString(", ")})")

  /** q53: sign-LSH ANN — 4 tables × 6 sign bits from 24 fixed ±1
    * hyperplanes (same deterministic mixer as the IVF centers, so the
    * bucketing is oracle-reproducible). The oracle mirrors the APPROXIMATE
    * pipeline — bucket codes, multi-table candidate union, cosine rank —
    * not the exhaustive answer, exactly like q31. */
  private val lshHyperplanes = Similarity.fixedCenters(cells = 24, dim = 64)
  private val lshTables = 4
  private val lshBits = lshHyperplanes.length / lshTables

  def annLshTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10),
      lshHyperplanes, tables = lshTables, k = 5)
  }

  val annLshTopKSql: String = s"""
    WITH c AS ($embSql),
    hp AS (SELECT * FROM (VALUES ${lshHyperplanes.zipWithIndex
      .map { case (h, i) => s"($i, ${doubleListSql(h)})" }
      .mkString(", ")}) t(i, h)),
    bk AS (SELECT vec_id, CAST(i // $lshBits AS INTEGER) AS tbl,
             sum(CASE WHEN ${dotSql("v", "h")} > 0.0
                      THEN CAST(1 AS BIGINT) << (i % $lshBits)
                      ELSE CAST(0 AS BIGINT) END) AS bucket
           FROM c CROSS JOIN hp GROUP BY 1, 2),
    cand AS (SELECT DISTINCT qb.vec_id AS query_id, nb.vec_id AS neighbor_id
             FROM bk qb JOIN bk nb USING (tbl, bucket)
             WHERE qb.vec_id < 10 AND nb.vec_id <> qb.vec_id),
    scored AS (SELECT cand.query_id, cand.neighbor_id,
                 ${cosineSql("a.v", "b.v")} AS sim
               FROM cand
               JOIN c a ON a.vec_id = cand.query_id
               JOIN c b ON b.vec_id = cand.neighbor_id)
    SELECT query_id, neighbor_id, sim, rn FROM (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rn
      FROM scored)
    WHERE rn <= 5"""

  /** q30 quantizer: more, smaller cells + multi-probe for pair blocking —
    * TRAINED (round 10, same pinned-fit discipline as the q31 probe
    * quantizer): data-adapted 32-cell Voronoi blocking finds 13/14 of the
    * sf0.01 ground-truth cos ≥ 0.45 pairs vs 10/14 for the fixed ±1
    * grid, at the same probes=3 candidate budget. */
  private val dupCenters: Seq[Seq[Double]] = graft.ml.PinnedDupCenters.values

  def embeddingNearDups(s: SparkSession, d: String): DataFrame =
    Similarity.embeddingNearDupsFixed(Tables.embeddings(s, d), dupCenters,
      minCosine = 0.45, probes = 3)

  /** Same fixed-quantizer trick as q31: blocking + cosine threshold are both
    * deterministic, so the oracle recomputes the exact emitted pair set
    * (~10 pairs at sf0.01 — non-vacuous, unlike a 0.95 threshold the fixture
    * can never reach: its max pairwise cosine is ~0.51). */
  val embeddingNearDupsSql: String = s"""
    WITH c AS ($embSql),
    ctr AS (SELECT * FROM (VALUES ${centersValuesSql(dupCenters)}) t(cell, cc)),
    rk AS (SELECT vec_id, cell,
             row_number() OVER (PARTITION BY vec_id ORDER BY dd, cell) AS rn
           FROM (SELECT c.vec_id, ctr.cell,
                   ${sqdistFoldSql("c.v", "ctr.cc")} AS dd
                 FROM c CROSS JOIN ctr)),
    a AS (SELECT vec_id, cell FROM rk WHERE rn <= 3),
    p AS (SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
          FROM a l JOIN a r ON l.cell = r.cell AND l.vec_id < r.vec_id),
    s AS (SELECT id_a, id_b, ${cosineSql("x.v", "y.v")} AS cos
          FROM p JOIN c x ON x.vec_id = p.id_a
                 JOIN c y ON y.vec_id = p.id_b)
    SELECT id_a, id_b, cos FROM s WHERE cos >= 0.45"""

  // --- multimodal ----------------------------------------------------------

  def multimodalMeta(s: SparkSession, d: String): DataFrame =
    Multimodal.asMediaTable(Tables.documents(s, d))
      .select(col("doc_id"), col("format"), col("byte_len"))

  val multimodalMetaSql: String = """
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
                ELSE 'webp' END AS format,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
    FROM documents"""

  def multimodalFeatures(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    import sp.implicits._
    val media = Multimodal.asMediaTable(Tables.documents(s, d)).as[graft.operators.MediaRecord]
    Multimodal.decodeFeatures(media).toDF()
      .select(col("doc_id"), col("format"), col("width"), col("height"), col("n_frames"))
  }

  /** Shared decode-stub CTE: format rotation + the mod-1e9+7 codepoint
    * checksum (same fold family as the fingerprint) — the deterministic
    * core both q32 and q46 mirror. */
  private val decodeStubCte: String = """m AS (SELECT doc_id,
      CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
           ELSE 'webp' END AS format,
      list_reduce(list_concat([CAST(17 AS BIGINT)],
        list_transform(list_filter(regexp_split_to_array(text, ''), ch -> ch <> ''),
          ch -> CAST(unicode(ch) AS BIGINT))),
        (a, b) -> (a * 31 + b) % 1000000007) AS cs
      FROM documents)"""

  /** The checksum→dimension mapping of the stub decoder, ONE snippet for
    * every oracle that mirrors `Multimodal.decodeOne` (q32, q58) — the
    * formula cannot desynchronize between them. */
  private val stubWidthSql = "CAST(64 + cs % 1024 AS INTEGER)"
  private val stubHeightSql = "CAST(64 + (cs // 1024) % 1024 AS INTEGER)"

  /** The stub decoder's checksum is exactly recomputable — the typed
    * mapPartitions path gets a full oracle despite being a stub. */
  val multimodalFeaturesSql: String = s"""
    WITH $decodeStubCte
    SELECT doc_id, format,
           $stubWidthSql AS width,
           $stubHeightSql AS height,
           CAST(CASE WHEN format = 'webp' THEN 1 + cs % 30 ELSE 1 END AS INTEGER) AS n_frames
    FROM m"""

  // --- q161: the REAL ImageIO decode path under the gate ---------------------

  /** q161: the REAL decoder gated — `decodeFeaturesImageIO` decoding
    * actual PNG/BMP/GIF containers (`Multimodal.syntheticImageTable`:
    * payloads encoded on executors, rasters exact-roundtrip by
    * construction, GIFs with 1–3 real animation frames). Until this row
    * the real decode path was spec-only and the oracle rode the stub
    * (q32); here the gate output is the decoded (width, height,
    * n_frames) plus the luminance grid quantized at 2^20 — pure integers
    * derived from decoded pixels, so a VALUES oracle pins them exactly.
    * If the decoder (or an ImageIO behavior change) perturbs one pixel,
    * the hash breaks. Payload bytes are deliberately NOT pinned:
    * container layout may vary across encoder versions; the raster
    * cannot. Pins regenerate by running this query and reading the rows
    * (ExtensionsSpec re-derives them every test run). */
  def imageioDecode(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    val media = Multimodal.syntheticImageTable(12)
    Multimodal.decodeFeaturesImageIO(media).toDF()
      .select(col("doc_id"), col("format"), col("width"), col("height"),
        col("n_frames"),
        posexplode(expr(
          "transform(feature, f -> CAST(round(CAST(f AS DOUBLE) * 1048576.0) AS BIGINT))")))
      .withColumnRenamed("pos", "dim")
      .withColumnRenamed("col", "qlum")
  }

  /** Decoded-raster pins for q161: (doc_id, format, width, height,
    * n_frames, dim, qlum = round(lumGrid[dim]·2^20)). */
  private[graft] val imageDecodePins: Seq[(Long, String, Int, Int, Int, Int, Long)] = Seq(
    (0L, "png", 4, 3, 1, 0, 123362L), (0L, "png", 4, 3, 1, 1, 263172L),
    (0L, "png", 4, 3, 1, 2, 407094L), (0L, "png", 4, 3, 1, 3, 546904L),
    (0L, "png", 4, 3, 1, 4, 61681L), (0L, "png", 4, 3, 1, 5, 131586L),
    (0L, "png", 4, 3, 1, 6, 201491L), (0L, "png", 4, 3, 1, 7, 275508L),
    (1L, "bmp", 7, 5, 1, 0, 1513239L), (1L, "bmp", 7, 5, 1, 1, 1866877L),
    (1L, "bmp", 7, 5, 1, 2, 2220514L), (1L, "bmp", 7, 5, 1, 3, 1792860L),
    (1L, "bmp", 7, 5, 1, 4, 1644825L), (1L, "bmp", 7, 5, 1, 5, 1492679L),
    (1L, "bmp", 7, 5, 1, 6, 1344645L), (1L, "bmp", 7, 5, 1, 7, 1196610L),
    (2L, "gif", 10, 7, 1, 0, 6291456L), (2L, "gif", 10, 7, 1, 1, 3145728L),
    (2L, "gif", 10, 7, 1, 2, 4194304L), (2L, "gif", 10, 7, 1, 3, 5242880L),
    (2L, "gif", 10, 7, 1, 4, 6291456L), (2L, "gif", 10, 7, 1, 5, 3145728L),
    (2L, "gif", 10, 7, 1, 6, 4194304L), (2L, "gif", 10, 7, 1, 7, 4194304L),
    (3L, "png", 13, 3, 1, 0, 2142385L), (3L, "png", 13, 3, 1, 1, 2183505L),
    (3L, "png", 13, 3, 1, 2, 1998463L), (3L, "png", 13, 3, 1, 3, 2347988L),
    (3L, "png", 13, 3, 1, 4, 2389109L), (3L, "png", 13, 3, 1, 5, 2199954L),
    (3L, "png", 13, 3, 1, 6, 2553591L), (3L, "png", 13, 3, 1, 7, 2068368L),
    (4L, "bmp", 4, 5, 1, 0, 810076L), (4L, "bmp", 4, 5, 1, 1, 1023904L),
    (4L, "bmp", 4, 5, 1, 2, 1233619L), (4L, "bmp", 4, 5, 1, 3, 1447446L),
    (4L, "bmp", 4, 5, 1, 4, 538680L), (4L, "bmp", 4, 5, 1, 5, 682602L),
    (4L, "bmp", 4, 5, 1, 6, 826525L), (4L, "bmp", 4, 5, 1, 7, 966335L),
    (5L, "gif", 7, 7, 2, 0, 0L), (5L, "gif", 7, 7, 2, 1, 6291456L),
    (5L, "gif", 7, 7, 2, 2, 0L), (5L, "gif", 7, 7, 2, 3, 6291456L),
    (5L, "gif", 7, 7, 2, 4, 0L), (5L, "gif", 7, 7, 2, 5, 6291456L),
    (5L, "gif", 7, 7, 2, 6, 0L), (5L, "gif", 7, 7, 2, 7, 6291456L),
    (6L, "png", 10, 3, 1, 0, 1702394L), (6L, "png", 10, 3, 1, 1, 1986126L),
    (6L, "png", 10, 3, 1, 2, 1620153L), (6L, "png", 10, 3, 1, 3, 1903885L),
    (6L, "png", 10, 3, 1, 4, 1858652L), (6L, "png", 10, 3, 1, 5, 2146497L),
    (6L, "png", 10, 3, 1, 6, 1690058L), (6L, "png", 10, 3, 1, 7, 1587256L),
    (7L, "bmp", 13, 5, 1, 0, 4691864L), (7L, "bmp", 13, 5, 1, 1, 4634295L),
    (7L, "bmp", 13, 5, 1, 2, 4539718L), (7L, "bmp", 13, 5, 1, 3, 4794665L),
    (7L, "bmp", 13, 5, 1, 4, 4819338L), (7L, "bmp", 13, 5, 1, 5, 4523269L),
    (7L, "bmp", 13, 5, 1, 6, 4778217L), (7L, "bmp", 13, 5, 1, 7, 4802890L),
    (8L, "gif", 4, 7, 3, 0, 4194304L), (8L, "gif", 4, 7, 3, 1, 0L),
    (8L, "gif", 4, 7, 3, 2, 4194304L), (8L, "gif", 4, 7, 3, 3, 0L),
    (8L, "gif", 4, 7, 3, 4, 0L), (8L, "gif", 4, 7, 3, 5, 3145728L),
    (8L, "gif", 4, 7, 3, 6, 0L), (8L, "gif", 4, 7, 3, 7, 3145728L),
    (9L, "png", 7, 3, 1, 0, 1258291L), (9L, "png", 7, 3, 1, 1, 1468007L),
    (9L, "png", 7, 3, 1, 2, 1685946L), (9L, "png", 7, 3, 1, 3, 1579032L),
    (9L, "png", 7, 3, 1, 4, 1480343L), (9L, "png", 7, 3, 1, 5, 1176050L),
    (9L, "png", 7, 3, 1, 6, 768956L), (9L, "png", 7, 3, 1, 7, 789516L),
    (10L, "bmp", 10, 5, 1, 0, 3857115L), (10L, "bmp", 10, 5, 1, 1, 3918796L),
    (10L, "bmp", 10, 5, 1, 2, 3195073L), (10L, "bmp", 10, 5, 1, 3, 3310211L),
    (10L, "bmp", 10, 5, 1, 4, 3092271L), (10L, "bmp", 10, 5, 1, 5, 3199185L),
    (10L, "bmp", 10, 5, 1, 6, 3289650L), (10L, "bmp", 10, 5, 1, 7, 3400676L),
    (11L, "gif", 13, 7, 1, 0, 0L), (11L, "gif", 13, 7, 1, 1, 12582912L),
    (11L, "gif", 13, 7, 1, 2, 0L), (11L, "gif", 13, 7, 1, 3, 11534336L),
    (11L, "gif", 13, 7, 1, 4, 0L), (11L, "gif", 13, 7, 1, 5, 11534336L),
    (11L, "gif", 13, 7, 1, 6, 0L), (11L, "gif", 13, 7, 1, 7, 11534336L))

  val imageioDecodeSql: String = {
    val rows = imageDecodePins.map { case (id, fmt, w, h, nf, dim, q) =>
      s"(CAST($id AS BIGINT), '$fmt', CAST($w AS INTEGER), CAST($h AS INTEGER), " +
        s"CAST($nf AS INTEGER), CAST($dim AS INTEGER), CAST($q AS BIGINT))"
    }.mkString(",\n      ")
    s"""SELECT * FROM (VALUES
      $rows) t(doc_id, format, width, height, n_frames, dim, qlum)"""
  }

  // --- q218: the REAL JPEG (DCT) decode path under the gate -------------------

  /** q218: q161's discipline extended to JPEG — the dominant real-corpus
    * image format, and the codec family the lossless trio never
    * exercises: `decodeFeaturesImageIO` runs the JDK's full DCT decode
    * (dequantize → IDCT → chroma upsample) over REAL JPEG containers
    * encoded on executors ([[Multimodal.syntheticJpegTable]]: smooth
    * gradient rasters, the payload class DCT holds compactly). The codec
    * is LOSSY but a fixed function of the JDK — decoded pixels are
    * deterministic in-sandbox — so the quantized luminance grid pins as a
    * VALUES oracle exactly like q161; the companion spec regenerates the
    * pins every run, so a JDK codec change breaks loudly. */
  def jpegDecode(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    val media = Multimodal.syntheticJpegTable(6)
    Multimodal.decodeFeaturesImageIO(media).toDF()
      .select(col("doc_id"), col("format"), col("width"), col("height"),
        col("n_frames"),
        posexplode(expr(
          "transform(feature, f -> CAST(round(CAST(f AS DOUBLE) * 1048576.0) AS BIGINT))")))
      .withColumnRenamed("pos", "dim")
      .withColumnRenamed("col", "qlum")
  }

  /** Decoded-raster pins for q218 (same layout as [[imageDecodePins]]).
    * Regenerated and asserted bit-equal by ExtensionsSpec. */
  private[graft] val jpegDecodePins: Seq[(Long, String, Int, Int, Int, Int, Long)] =
    JpegDecodePins.pins

  val jpegDecodeSql: String = {
    val rows = jpegDecodePins.map { case (id, fmt, w, h, nf, dim, q) =>
      s"(CAST($id AS BIGINT), '$fmt', CAST($w AS INTEGER), CAST($h AS INTEGER), " +
        s"CAST($nf AS INTEGER), CAST($dim AS INTEGER), CAST($q AS BIGINT))"
    }.mkString(",\n      ")
    s"""SELECT * FROM (VALUES
      $rows) t(doc_id, format, width, height, n_frames, dim, qlum)"""
  }

  // --- q212: the REAL WAV decode path under the gate --------------------------

  /** q212: the audio sibling of q161 — `decodeFeaturesWav` parsing REAL
    * RIFF/WAVE containers (`Multimodal.syntheticWavTable`: 16-bit PCM
    * mono sawtooths encoded on executors, zero fixture bytes in git) and
    * reducing each to header metadata plus an 8-bucket |PCM| energy grid.
    * Every gated value is an exact integer (sample counts, rates, summed
    * amplitudes), so a VALUES oracle pins them; if the chunk walker or
    * the bucket arithmetic perturbs one sample, the hash breaks.
    * MultimodalSpec re-derives the grid straight from the waveform
    * formula — generator→encoder→parser→features must equal the direct
    * computation. */
  def wavDecode(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    val media = Multimodal.syntheticWavTable(12)
    Multimodal.decodeFeaturesWav(media).toDF()
      .select(col("doc_id"), col("sample_rate"), col("n_samples"),
        posexplode(col("energy")))
      .withColumnRenamed("pos", "win")
      .withColumnRenamed("col", "qenergy")
  }

  /** Decoded-audio pins for q212: (doc_id, sample_rate, n_samples, win,
    * qenergy = Σ|pcm| over the win-th eighth of the sample stream). */
  private[graft] val wavDecodePins: Seq[(Long, Int, Long, Int, Long)] = Seq(
    (0L, 8000, 320L, 0, 611680L),
    (0L, 8000, 320L, 1, 522080L),
    (0L, 8000, 320L, 2, 432480L),
    (0L, 8000, 320L, 3, 342880L),
    (0L, 8000, 320L, 4, 253280L),
    (0L, 8000, 320L, 5, 163680L),
    (0L, 8000, 320L, 6, 74080L),
    (0L, 8000, 320L, 7, 25088L),
    (1L, 16000, 480L, 0, 869760L),
    (1L, 16000, 480L, 1, 639360L),
    (1L, 16000, 480L, 2, 408960L),
    (1L, 16000, 480L, 3, 178560L),
    (1L, 16000, 480L, 4, 69248L),
    (1L, 16000, 480L, 5, 282240L),
    (1L, 16000, 480L, 6, 512640L),
    (1L, 16000, 480L, 7, 743040L),
    (2L, 22050, 640L, 0, 1083200L),
    (2L, 22050, 640L, 1, 622400L),
    (2L, 22050, 640L, 2, 171872L),
    (2L, 22050, 640L, 3, 299200L),
    (2L, 22050, 640L, 4, 760000L),
    (2L, 22050, 640L, 5, 1177984L),
    (2L, 22050, 640L, 6, 939840L),
    (2L, 22050, 640L, 7, 479040L),
    (3L, 8000, 800L, 0, 1242400L),
    (3L, 8000, 800L, 1, 442400L),
    (3L, 8000, 800L, 2, 359840L),
    (3L, 8000, 800L, 3, 1157600L),
    (3L, 8000, 800L, 4, 1311040L),
    (3L, 8000, 800L, 5, 519200L),
    (3L, 8000, 800L, 6, 298560L),
    (3L, 8000, 800L, 7, 1080800L),
    (4L, 16000, 960L, 0, 1337760L),
    (4L, 16000, 960L, 1, 320720L),
    (4L, 16000, 960L, 2, 1196640L),
    (4L, 16000, 960L, 3, 1453760L),
    (4L, 16000, 960L, 4, 348720L),
    (4L, 16000, 960L, 5, 1066080L),
    (4L, 16000, 960L, 6, 1542880L),
    (4L, 16000, 960L, 7, 403600L),
    (5L, 22050, 320L, 0, 580480L),
    (5L, 22050, 320L, 1, 426880L),
    (5L, 22050, 320L, 2, 273280L),
    (5L, 22050, 320L, 3, 119680L),
    (5L, 22050, 320L, 4, 45888L),
    (5L, 22050, 320L, 5, 187520L),
    (5L, 22050, 320L, 6, 341120L),
    (5L, 22050, 320L, 7, 494720L),
    (6L, 8000, 480L, 0, 798960L),
    (6L, 8000, 480L, 1, 424560L),
    (6L, 8000, 480L, 2, 100320L),
    (6L, 8000, 480L, 3, 324240L),
    (6L, 8000, 480L, 4, 698640L),
    (6L, 8000, 480L, 5, 867824L),
    (6L, 8000, 480L, 6, 518640L),
    (6L, 8000, 480L, 7, 149168L),
    (7L, 16000, 640L, 0, 956800L),
    (7L, 16000, 640L, 1, 259552L),
    (7L, 16000, 640L, 2, 476800L),
    (7L, 16000, 640L, 3, 1112384L),
    (7L, 16000, 640L, 4, 711040L),
    (7L, 16000, 640L, 5, 179232L),
    (7L, 16000, 640L, 6, 722560L),
    (7L, 16000, 640L, 7, 1108448L),
    (8L, 22050, 800L, 0, 1044400L),
    (8L, 22050, 800L, 1, 320176L),
    (8L, 22050, 800L, 2, 1271776L),
    (8L, 22050, 800L, 3, 721200L),
    (8L, 22050, 800L, 4, 491040L),
    (8L, 22050, 800L, 5, 1337056L),
    (8L, 22050, 800L, 6, 432000L),
    (8L, 22050, 800L, 7, 802000L),
    (9L, 8000, 960L, 0, 1052160L),
    (9L, 8000, 960L, 1, 800256L),
    (9L, 8000, 960L, 2, 1263104L),
    (9L, 8000, 960L, 3, 622080L),
    (9L, 8000, 960L, 4, 1408512L),
    (9L, 8000, 960L, 5, 509440L),
    (9L, 8000, 960L, 6, 1488384L),
    (9L, 8000, 960L, 7, 462336L),
    (10L, 16000, 320L, 0, 549280L),
    (10L, 16000, 320L, 1, 331680L),
    (10L, 16000, 320L, 2, 114080L),
    (10L, 16000, 320L, 3, 103648L),
    (10L, 16000, 320L, 4, 321120L),
    (10L, 16000, 320L, 5, 538720L),
    (10L, 16000, 320L, 6, 554144L),
    (10L, 16000, 320L, 7, 336800L),
    (11L, 22050, 480L, 0, 728160L),
    (11L, 22050, 480L, 1, 214464L),
    (11L, 22050, 480L, 2, 308640L),
    (11L, 22050, 480L, 3, 806496L),
    (11L, 22050, 480L, 4, 620640L),
    (11L, 22050, 480L, 5, 149760L),
    (11L, 22050, 480L, 6, 416160L),
    (11L, 22050, 480L, 7, 848928L))

  val wavDecodeSql: String = {
    val rows = wavDecodePins.map { case (id, rate, n, win, q) =>
      s"(CAST($id AS BIGINT), CAST($rate AS INTEGER), CAST($n AS BIGINT), " +
        s"CAST($win AS INTEGER), CAST($q AS BIGINT))"
    }.mkString(",\n      ")
    s"""SELECT * FROM (VALUES
      $rows) t(doc_id, sample_rate, n_samples, win, qenergy)"""
  }

  /** Frame-sampling plumbing as a first-class gate entry: every 5th frame
    * index of each (deterministically decoded) media record. */
  def multimodalFrameSample(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    import sp.implicits._
    val media = Multimodal.asMediaTable(Tables.documents(s, d)).as[graft.operators.MediaRecord]
    Multimodal.frameSample(Multimodal.decodeFeatures(media).toDF(), everyN = 5)
  }

  /** Spark's sequence(0, n-1, 5) is bound-inclusive; DuckDB's range(0, n, 5)
    * is stop-exclusive — same index set for n ≥ 1, and n = 0 yields no rows
    * on both sides (frameSample filters zero-frame assets). */
  val multimodalFrameSampleSql: String = s"""
    WITH $decodeStubCte,
    f AS (SELECT doc_id, format,
            CASE WHEN format = 'webp' THEN CAST(1 + cs % 30 AS INTEGER)
                 ELSE 1 END AS n_frames
          FROM m)
    SELECT doc_id, format, CAST(unnest(range(0, n_frames, 5)) AS INTEGER) AS frame_idx
    FROM f"""

  /** Resize plan over the decoded media table: aspect-preserving fit into a
    * 512×384 box, pure BIGINT floor-division arithmetic — exact in both
    * engines. The pixel resample is the codec's job (stubbed); the PLAN of
    * which assets shrink to what is the engine's job, and is what gets
    * gate-checked. */
  def multimodalResize(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    import sp.implicits._
    val media = Multimodal.asMediaTable(Tables.documents(s, d)).as[graft.operators.MediaRecord]
    Multimodal.resizeFit(Multimodal.decodeFeatures(media).toDF(), boxW = 512, boxH = 384)
  }

  val multimodalResizeSql: String = s"""
    WITH $decodeStubCte,
    dims AS (SELECT doc_id,
               $stubWidthSql AS width,
               $stubHeightSql AS height
             FROM m)
    SELECT doc_id, width, height,
      CAST(CASE WHEN width <= 512 AND height <= 384 THEN width
                WHEN width * 384 <= height * 512 THEN (width * 384) // height
                ELSE 512 END AS BIGINT) AS fit_width,
      CAST(CASE WHEN width <= 512 AND height <= 384 THEN height
                WHEN width * 384 <= height * 512 THEN 384
                ELSE (height * 512) // width END AS BIGINT) AS fit_height
    FROM dims"""

  /** Int8 embedding compression: symmetric scalar quantization (floor, not
    * round — tie rules differ across engines) + exact reconstruction error.
    * The gate projection serializes `codes` to a comma-joined string: the
    * driver's comparator sorts rows by every column and pandas cannot sort
    * array cells (round-2 q50 red row). Codes are integers, so the string
    * round-trip is lossless and engine-identical; the typed array API stays
    * on `Similarity.quantizeInt8` (unit-tested in ExtensionsSpec). */
  def embeddingQuantize(s: SparkSession, d: String): DataFrame =
    Similarity.quantizeInt8(Tables.embeddings(s, d))
      .withColumn("codes_csv",
        concat_ws(",", transform(col("codes"), _.cast("string"))))
      .select(col("vec_id"), col("scale"), col("codes_csv"), col("sq_err"))

  val embeddingQuantizeSql: String = s"""
    WITH c AS ($embSql),
    q AS (SELECT vec_id, v,
            list_max(list_transform(v, x -> abs(x))) AS scale FROM c),
    k AS (SELECT vec_id, v, scale,
            CASE WHEN scale = 0.0
                 THEN list_transform(v, x -> CAST(0 AS BIGINT))
                 ELSE list_transform(v, x -> CAST(floor(x * 127.0 / scale) AS BIGINT))
            END AS codes
          FROM q)
    SELECT vec_id, scale,
      array_to_string(codes, ',') AS codes_csv,
      list_reduce(list_concat([CAST(0.0 AS DOUBLE)],
        list_transform(range(len(v)),
          i -> (v[i+1] - CAST(codes[i+1] AS DOUBLE) * scale / 127.0)
             * (v[i+1] - CAST(codes[i+1] AS DOUBLE) * scale / 127.0))),
        (a, b) -> a + b) AS sq_err
    FROM k"""

  /** Dedup clustering: near-dup pairs → connected components → canonical
    * minimum doc id per cluster (the "keep one copy" step). Runs through
    * the exact-content pre-collapse (`Dedup.nearDupClusters`): LSH,
    * Jaccard, and component propagation see one representative per
    * byte-identical text, so cost scales with DISTINCT content + emitted
    * clusters instead of quadratically with the duplication factor. */
  def dedupClusters(s: SparkSession, d: String): DataFrame =
    Dedup.nearDupClusters(Tables.documents(s, d), "doc_id", "text",
      minJaccard = 0.2, numHashes = 32, bands = 8, shingleN = 3)
      .select(col("id").as("doc_id"), col("cluster_id"))

  /** Transitive closure by recursive CTE over the exact pair set — min
    * reachable id = the label min-propagation converges to. */
  val dedupClustersSql: String = s"""
    WITH RECURSIVE $nearDupPairsSqlCtes,
    p AS (SELECT id_a, id_b FROM jp WHERE jaccard >= 0.2),
    e AS (SELECT id_a AS s, id_b AS d FROM p
          UNION SELECT id_b, id_a FROM p),
    reach AS (SELECT s AS id, d AS r FROM e
              UNION
              SELECT reach.id, e.d FROM reach JOIN e ON reach.r = e.s)
    SELECT id AS doc_id, least(id, min(r)) AS cluster_id FROM reach GROUP BY id"""

  /** Fuzzy-dedup ACTION: clusters (q49's pairs → connected components) with
    * the survivor chosen per cluster — the longest copy wins (keep the most
    * complete duplicate, the usual curation policy), doc id ascending as
    * the tie-break. Emits every clustered doc with its verdict so the drop
    * set is auditable, not just the keep set. All ordering keys are exact
    * integers, so the winner is deterministic on both engines.
    *
    * Scale shape: the cluster table is a strict subset of the corpus (only
    * docs with a near-dup appear); the token-length join shuffles on
    * doc_id. The winner is an argmax AGGREGATE per cluster — min of
    * struct(-n_tokens, doc_id), a map-side-combinable hash agg — NOT a
    * row_number window: only the keep flag (winner == me) is needed, so
    * sorting whole clusters is pure waste, and on a dup-heavy corpus
    * (10×-deeper duplicate groups at sf1) the per-group sort was the
    * measured scale-killer (11.97× on 10× data; the agg is linear). A
    * pathological giant cluster costs one combine pass, not a sort. */
  def dedupKeepBest(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val clusters = Dedup.nearDupClusters(docs, "doc_id", "text",
      minJaccard = 0.2, numHashes = 32, bands = 8, shingleN = 3)
      .select(col("id").as("doc_id"), col("cluster_id"))
    val lens = docs.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    val joined = clusters.join(lens, "doc_id")
    // argmax by (n_tokens desc, doc_id asc): lexicographic struct min over
    // exact integers — the same winner row_number()==1 would pick
    val winners = joined.groupBy(col("cluster_id"))
      .agg(min(struct((-col("n_tokens")).as("neg_tokens"),
        col("doc_id").as("doc_id"))).as("w"))
      .select(col("cluster_id"), col("w.doc_id").as("win_id"))
    joined.join(winners, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("n_tokens"),
        (col("doc_id") === col("win_id")).as("keep"))
  }

  val dedupKeepBestSql: String = s"""
    WITH RECURSIVE $nearDupPairsSqlCtes,
    p AS (SELECT id_a, id_b FROM jp WHERE jaccard >= 0.2),
    e AS (SELECT id_a AS s, id_b AS d FROM p
          UNION SELECT id_b, id_a FROM p),
    reach AS (SELECT s AS id, d AS r FROM e
              UNION
              SELECT reach.id, e.d FROM reach JOIN e ON reach.r = e.s),
    clusters AS (SELECT id AS doc_id, least(id, min(r)) AS cluster_id
                 FROM reach GROUP BY id),
    lens AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens
             FROM documents)
    SELECT c.doc_id, c.cluster_id, lens.n_tokens,
           row_number() OVER (PARTITION BY c.cluster_id
                              ORDER BY lens.n_tokens DESC, c.doc_id) = 1 AS keep
    FROM clusters c JOIN lens USING (doc_id)"""

  /** BPE-ish token accounting: subword pre-tokens (letter runs / digit runs
    * / marks) alongside the whitespace token count — the "how many units
    * will the tokenizer see" column every corpus pipeline carries. */
  def subtokenStats(s: SparkSession, d: String): DataFrame = {
    val st = TextFunctions.subtokens(col("text"))
    Tables.documents(s, d).select(
      col("doc_id"),
      size(st).as("n_subtokens"),
      size(array_distinct(st)).as("n_distinct_subtokens"),
      TextFunctions.tokenCount(col("text")).as("n_ws_tokens"))
  }

  val subtokenStatsSql: String = s"""
    SELECT doc_id,
           len(st) AS n_subtokens,
           len(list_distinct(st)) AS n_distinct_subtokens,
           len($toksSql) AS n_ws_tokens
    FROM (SELECT doc_id, text,
            regexp_extract_all(text, '${TextFunctions.subtokenPattern}') AS st
          FROM documents)"""

  /** Term frequency: each document's most frequent token with its count
    * (ties → lexicographically smallest token). The explode → count →
    * rank-1 shape is the per-doc half of TF-IDF and the usual "dominant
    * token / boilerplate detector" pass; shuffles key on (doc_id, token)
    * then doc_id — linear, skew bounded by doc length. The rank-1 step is
    * planned through [[graft.expressions.TopKStrRows]] (k=1) instead of
    * the `row_number` window the oracle states: partial/final
    * ObjectHashAggregate forwards one (count, token) pair per document,
    * no per-partition sort. UTF8String's byte-wise tie order equals
    * DuckDB's binary `ORDER BY token`, and counts are exact in a double
    * far beyond any document length, so the cast round-trips. */
  def topTermPerDoc(s: SparkSession, d: String): DataFrame = {
    import graft.expressions.TopKStrRows
    Tables.documents(s, d)
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(TopKStrRows.topK(col("n").cast("double"), col("token"), 1).as("top"))
      .select(col("doc_id"),
        col("top").getItem(0).getField("payload").as("top_token"),
        col("top").getItem(0).getField("key").cast("long").as("n_occurrences"))
  }

  val topTermPerDocSql: String = s"""
    SELECT doc_id, token AS top_token, n AS n_occurrences
    FROM (SELECT doc_id, token, n,
            row_number() OVER (PARTITION BY doc_id
                               ORDER BY n DESC, token) AS rn
          FROM (SELECT doc_id, token, count(*) AS n
                FROM (SELECT doc_id, unnest($toksSql) AS token FROM documents)
                GROUP BY doc_id, token))
    WHERE rn = 1"""

  /** Deterministic train/val/test split keyed on document CONTENT, not
    * position: bucket = fingerprint mod 100, split by fixed cut points
    * (80/10/10). Content-hash splits are the reproducibility staple of
    * training pipelines — assignment survives re-sharding, re-ordering,
    * and incremental ingest, and a re-ingested duplicate always lands in
    * the same split (no train/test leakage through copies). Pure column
    * arithmetic over the 31-bit polynomial fingerprint, which both
    * engines compute bit-identically. */
  def trainValSplit(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      (TextFunctions.fingerprint(col("text")) % 100).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 80, lit("train"))
          .when(col("bucket") < 90, lit("val"))
          .otherwise(lit("test")))

  val trainValSplitSql: String = s"""
    SELECT doc_id, bucket,
      CASE WHEN bucket < 80 THEN 'train'
           WHEN bucket < 90 THEN 'val'
           ELSE 'test' END AS split
    FROM (SELECT doc_id, $fingerprintExprSql % 100 AS bucket
          FROM documents)"""

  /** q128: LEAKAGE-SAFE train/val/test split. q59 assigns each document
    * independently by its own content hash, so two NEAR-duplicates
    * (different bytes, same content) can straddle train and val — the
    * classic eval-leakage bug in training pipelines. This variant keys
    * the assignment on the near-dup CLUSTER representative (q49's
    * connected components over the q25 pair set): every member of a
    * cluster adopts the bucket of the cluster's minimum-id document, and
    * singletons fall back to their own fingerprint (≡ q59 for them). By
    * construction no near-dup pair straddles splits — same rep, same
    * bucket (ExtensionsSpec pins that, and pins that q59 DOES leak on
    * the same fixture).
    *
    * Scale shape: the cluster table is a strict subset of the corpus
    * (only docs with a near-dup appear), so the left join is
    * fact ⋈ small-side; every doc's bucket is computed once row-locally
    * and the rep adoption is one equi-join on the high-cardinality
    * rep_id. No window, no global sort — the same shuffle bound as q49
    * plus two hash joins. */
  def leakageSafeSplit(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.nearDuplicates(docs, "doc_id", "text",
      minJaccard = 0.2, numHashes = 32, bands = 8, shingleN = 3)
    val clusters = Dedup.connectedComponents(pairs)
      .select(col("id").as("doc_id"), col("cluster_id"))
    val rep = docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("rep_id"))
    val buckets = docs.select(col("doc_id").as("rep_id"),
      (TextFunctions.fingerprint(col("text")) % 100).as("bucket"))
    rep.join(buckets, "rep_id")
      .withColumn("split",
        when(col("bucket") < 80, lit("train"))
          .when(col("bucket") < 90, lit("val"))
          .otherwise(lit("test")))
      .select(col("doc_id"), col("rep_id"), col("bucket"), col("split"))
  }

  /** Oracle: q49's recursive-closure clusters + q59's bucket arithmetic,
    * composed exactly as the operator states them. */
  val leakageSafeSplitSql: String = s"""
    WITH RECURSIVE $nearDupPairsSqlCtes,
    p AS (SELECT id_a, id_b FROM jp WHERE jaccard >= 0.2),
    e AS (SELECT id_a AS s, id_b AS d FROM p
          UNION SELECT id_b, id_a FROM p),
    reach AS (SELECT s AS id, d AS r FROM e
              UNION
              SELECT reach.id, e.d FROM reach JOIN e ON reach.r = e.s),
    clusters AS (SELECT id AS doc_id, least(id, min(r)) AS cluster_id
                 FROM reach GROUP BY id),
    rep AS (SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS rep_id
            FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id),
    b AS (SELECT doc_id AS rep_id, $fingerprintExprSql % 100 AS bucket
          FROM documents)
    SELECT r.doc_id, r.rep_id, b.bucket,
      CASE WHEN b.bucket < 80 THEN 'train'
           WHEN b.bucket < 90 THEN 'val'
           ELSE 'test' END AS split
    FROM rep r JOIN b ON r.rep_id = b.rep_id"""

  /** As-of join over the events stream: each purchase picks up the latest
    * click (inclusive) by the same user — the "attach the freshest snapshot
    * at or before each event" primitive. */
  def asofPurchaseClick(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    graft.operators.AsOf.asOfBackward(
      purchases, clicks, keyCol = "user_id",
      leftTimeCol = "ts", rightTimeCol = "ts",
      carry = Seq("event_id", "value"), tieBreak = "event_id",
      prefix = "click_")
  }

  /** q116: the SAME as-of join planned through the custom physical
    * operator (`graft.plans.AsOfJoinExec` — logical node + injected
    * strategy + partition-local sorted merge, the build plan's tier (c)).
    * Shares q47's oracle verbatim: the exec must be a drop-in for the
    * composed union+window form, adjudicated by DuckDB, not just by the
    * engine's own spec. */
  def asofPurchaseClickExec(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    graft.plans.AsOfExec.asOfBackward(
      purchases, clicks, keyCol = "user_id",
      leftTimeCol = "ts", rightTimeCol = "ts",
      carry = Seq("event_id", "value"), tieBreak = "event_id",
      prefix = "click_")
  }

  /** Mirrors the union+running-window formulation exactly — ONE carry
    * struct per right row (never per-column stitching), same ordering key
    * incl. the -1 left sentinel; cross-checked against DuckDB's native
    * ASOF JOIN during development. */
  val asofPurchaseClickSql: String = """
    WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    r AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
    u AS (
      SELECT user_id AS k, ts AS t, 1 AS side, CAST(-1 AS BIGINT) AS tie,
             event_id AS l_event_id,
             CAST(NULL AS STRUCT(eid BIGINT, v DOUBLE)) AS carry
      FROM l
      UNION ALL
      SELECT user_id, ts, 0, event_id, NULL, {'eid': event_id, 'v': value} FROM r),
    m AS (SELECT k, t, side, l_event_id,
            last_value(carry IGNORE NULLS) OVER w AS mc
          FROM u WINDOW w AS (PARTITION BY k ORDER BY t, side, tie
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT l_event_id AS event_id, k AS user_id, t AS ts,
           mc.eid AS click_event_id, mc.v AS click_value
    FROM m WHERE side = 1"""

  /** Incremental (cross-run) dedup, gate-shaped: the corpus is split into
    * two "ingest days" by doc-id parity, day 1's LSH signature index is
    * materialized ONCE per sf dir (same offline-maintenance caching pattern
    * as the q31 IVF index), and day 2 probes it — only day-2 docs are
    * shingled; day-1 text is joined back solely to jaccard-verify the few
    * candidates. The oracle recomputes the exhaustive cross-parity
    * jaccard ≥ 0.2 answer with the inverted-index formulation; equality
    * holds by the same planted-margin precondition as q25/q49 (asserted in
    * GateHygieneSpec). */
  private val sigHashes = 32
  private val sigBands = 8
  private val sigShingleN = 3

  private def sigIndexDir(d: String): String =
    indexCacheDir("graft-sig-cache", d, "documents",
      s"h${sigHashes}b${sigBands}n$sigShingleN")

  private val sigBuildLock = new Object

  def incrementalDedup(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val day1 = docs.filter(col("doc_id") % 2 === 0)
    val day2 = docs.filter(col("doc_id") % 2 === 1)
    val dir = sigIndexDir(d)
    sigBuildLock.synchronized {
      if (!new java.io.File(s"$dir/_SUCCESS").exists())
        Dedup.writeSignatureIndex(day1, dir,
          numHashes = sigHashes, bands = sigBands, shingleN = sigShingleN)
    }
    Dedup.nearDuplicatesAgainst(s, dir, day1, day2, minJaccard = 0.2,
      numHashes = sigHashes, bands = sigBands, shingleN = sigShingleN)
  }

  val incrementalDedupSql: String = s"""
    WITH $nearDupPairsSqlCtes
    SELECT CASE WHEN id_a % 2 = 0 THEN id_a ELSE id_b END AS id_old,
           CASE WHEN id_a % 2 = 0 THEN id_b ELSE id_a END AS id_new,
           jaccard
    FROM jp
    WHERE jaccard >= 0.2 AND (id_a % 2) <> (id_b % 2)"""

  /** q99: incremental ANN index maintenance — the vector twin of q52's
    * signature-index roll-forward. The corpus is split into two "ingest
    * days" by vec_id parity: day 1 builds the cell-partitioned IVF index,
    * day 2 is APPENDED via [[Similarity.appendToIvfIndex]] (only the new
    * batch is assigned; no day-1 file is rewritten —
    * SimilarityIndexSpec asserts that at the file level). Both steps are
    * offline index maintenance, cached per sf fingerprint like q31/q52;
    * the QUERY probes the grown index. Because cell assignment is
    * per-vector deterministic, the grown index holds exactly the
    * full-rebuild rows, so the oracle — the same full-corpus IVF pipeline
    * as q31 under a different query set — checks append ≡ rebuild
    * end-to-end, hash-exact. */
  private def ivfIncrDir(d: String): String =
    indexCacheDir("graft-ivf-incr-cache", d, "embeddings", "c16t99incr")

  private val ivfIncrLock = new Object

  def annIvfAppendProbe(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    val emb = Tables.embeddings(s, d)
    val dir = ivfIncrDir(d)
    ivfIncrLock.synchronized {
      // two-step build under one marker: day-1 overwrite, day-2 append.
      // The marker is written LAST, so a half-built index (crash between
      // the steps) is rebuilt from scratch, never probed.
      if (!new java.io.File(s"$dir/_GRAFT_INDEX_READY").exists()) {
        Similarity.writeIvfIndex(emb.filter(col("vec_id") % 2 === 0), dir, ivfCenters)
        Similarity.appendToIvfIndex(emb.filter(col("vec_id") % 2 === 1), dir, ivfCenters)
        new java.io.File(s"$dir/_GRAFT_INDEX_READY").createNewFile()
      }
    }
    Similarity.ivfTopKIndexed(dir, ivfCenters,
      emb.filter(col("vec_id") >= 10 && col("vec_id") < 20), k = 5, nProbe = 4)
  }

  val annIvfAppendProbeSql: String = ivfProbeSql("vec_id >= 10 AND vec_id < 20")

  /** q66: last-touch attribution — for each purchase, every click by the
    * same user in the 24 h before it (via [[graft.streaming.StreamJoin]],
    * the SAME operator that runs the watermarked stream-stream join),
    * reduced to the latest click + the window click count. Both windows
    * share one shuffle on purchase_id (high-cardinality); the pair join is
    * an equi-join on user_id with a range filter — at 100 TB both sides
    * shuffle once on user and the per-user pair space is bounded by the
    * lookback window. */
  def attributionWindow(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val pairs = graft.streaming.StreamJoin.attributionPairs(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "click"))
    val byP = org.apache.spark.sql.expressions.Window.partitionBy(col("purchase_id"))
    val w = byP.orderBy(col("click_ts").desc, col("click_id").desc)
    pairs
      .withColumn("rn", row_number().over(w))
      .withColumn("n_clicks", count(lit(1)).over(byP))
      .filter(col("rn") === 1)
      .select(col("purchase_id"), col("user_id"), col("n_clicks"),
        col("click_id").as("last_click_id"), col("click_ts").as("last_click_ts"))
  }

  val attributionWindowSql: String = """
    WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
          FROM events WHERE event_type = 'click'),
    pairs AS (SELECT p.purchase_id, p.user_id, c.click_id, c.click_ts
              FROM p JOIN c ON p.user_id = c.user_id
              AND c.click_ts <= p.purchase_ts
              AND c.click_ts > p.purchase_ts - INTERVAL 24 HOUR)
    SELECT purchase_id, user_id, n_clicks, last_click_id, last_click_ts FROM (
      SELECT purchase_id, user_id, click_id AS last_click_id,
             click_ts AS last_click_ts,
             row_number() OVER (PARTITION BY purchase_id
                                ORDER BY click_ts DESC, click_id DESC) AS rn,
             count(*) OVER (PARTITION BY purchase_id) AS n_clicks
      FROM pairs)
    WHERE rn = 1"""

  /** q194: attribution COVERAGE — the left-outer twin of q66: every
    * purchase keeps a row, unattributed ones count 0 clicks, and the
    * result is the coverage histogram (n_clicks → how many purchases).
    * Drives [[graft.streaming.StreamJoin.attributionPairsOuter]], the
    * SAME operator that runs as a watermarked left-outer stream-stream
    * join — the join type where streaming semantics bite (an unmatched
    * purchase emits its null row only when the click watermark passes
    * its interval; StreamJoinSpec replays exactly that and asserts
    * batch ≡ matured stream). Batch plan: one user-keyed equi-join with
    * the range predicate as a join residual, then two count aggregates
    * (per-purchase, then the histogram — the second is cells-sized).
    * Pure integers, hash-exact. */
  def attributionCoverage(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val pairs = graft.streaming.StreamJoin.attributionPairsOuter(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "click"))
    pairs
      .groupBy(col("purchase_id"))
      .agg(count(col("click_id")).as("n_clicks"))
      .groupBy(col("n_clicks"))
      .agg(count(lit(1)).as("n_purchases"))
  }

  val attributionCoverageSql: String = """
    WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
          FROM events WHERE event_type = 'click'),
    pairs AS (SELECT p.purchase_id, c.click_id
              FROM p LEFT JOIN c ON p.user_id = c.user_id
              AND c.click_ts <= p.purchase_ts
              AND c.click_ts > p.purchase_ts - INTERVAL 24 HOUR),
    per AS (SELECT purchase_id, count(click_id) AS n_clicks
            FROM pairs GROUP BY 1)
    SELECT n_clicks, count(*) AS n_purchases FROM per GROUP BY 1"""

  /** The q66/q194 interval join run as a REAL watermarked stream-stream
    * join with a retained checkpoint — fixture prep for the join-state
    * reader gate (q239), cached per sfDir like the sessionizer ingests.
    * The watermark delay (30 days) exceeds the event-time span, so NO
    * buffered row is evicted: both join sides end the run holding every
    * fed row — the deterministic state the reader gate oracles. */
  private val joinCkCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ensureJoinStateCheckpoint(s: SparkSession, d: String): String =
    joinCkCache.computeIfAbsent(d, { _ =>
      val work = java.nio.file.Files
        .createTempDirectory("graft-joinstate").toString
      val pDir = s"$work/p"; val cDir = s"$work/c"
      val ck = s"$work/ck"; val out = s"$work/out"
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("value"), col("event_type"))
      writeSingleParquet(ev.filter(col("event_type") === "purchase")
        .drop("event_type"), pDir, "purchases.parquet")
      writeSingleParquet(ev.filter(col("event_type") === "click")
        .drop("event_type"), cDir, "clicks.parquet")
      val schema = ev.drop("event_type").schema
      withStatePartitions(s) {
        val p = s.readStream.schema(schema).parquet(pDir)
        val c = s.readStream.schema(schema).parquet(cDir)
        val joined = graft.streaming.StreamJoin.attributionPairs(
          p, c, lookback = "24 hours", delay = "30 days")
        val q = joined.writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ck)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        awaitBounded(q, "join_state_ingest")
      }
      ck
    })

  /** q239: STREAM-STREAM JOIN STATE introspection — the `statestore`
    * source's `joinSide` option over the q66/q194 interval join's live
    * checkpoint: each side's buffered rows read back as a table (row
    * payload + event-time column; the engine's internal matched bit is
    * not surfaced by the reader). The closed-form oracle restates the
    * buffer contract: it holds EXACTLY the fed rows — nothing evicted
    * below the 30-day watermark delay, nothing dropped on match (inner
    * joins retain matched rows until watermark eviction, because a
    * later partner may still arrive) — so the join-operator class joins
    * the sessionizer/TWS classes in the reader matrix. At 100 TB this
    * is how an operator answers "what is the join buffering and why has
    * this row not matured" without replaying either stream. */
  def joinStateIntrospectGate(s: SparkSession, d: String): DataFrame = {
    val ck = ensureJoinStateCheckpoint(s, d)
    def side(name: String, idCol: String, userCol: String, tsCol: String) =
      s.read.format("statestore")
        .option("path", ck).option("joinSide", name).load()
        .select(lit(name).as("side"),
          col(s"value.$idCol").as("event_id"),
          col(s"value.$userCol").as("user_id"),
          col(s"value.$tsCol").as("buffered_ts"))
    side("left", "purchase_id", "user_id", "purchase_ts")
      .unionByName(side("right", "click_id", "click_user", "click_ts"))
  }

  val joinStateIntrospectSql: String = """
    SELECT 'left' AS side, event_id, user_id, ts AS buffered_ts
    FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT 'right' AS side, event_id, user_id, ts AS buffered_ts
    FROM events WHERE event_type = 'click'"""

  /** q70: event-time RANGE-frame rolling aggregate — each click's trailing
    * 24 h spend by the same user. The frame is defined on TIME (epoch µs),
    * not row count, so duplicate-timestamp peers enter together in both
    * engines. Values quantize to cents (floor(value·100) — the
    * graft.functions.Exact convention) so the windowed sum is integer and
    * bit-identical no matter the engines' aggregation trees. Partitions on
    * user_id (high-cardinality), one shuffle; per-user frames advance as a
    * sliding accumulator, never rescanning the partition. */
  def rollingUserSpend(s: SparkSession, d: String): DataFrame =
    rollingUserSpendOn(
      Tables.events(s, d).filter(col("event_type") === "click"))

  def rollingUserSpendOn(clicks: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-86400000000L, 0L)
    clicks
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        floor(col("value") * lit(100)).cast("long").as("cents"))
      .withColumn("rolling_cents_24h", sum(col("cents")).over(w))
  }

  /** q87: gap-based sessionization of the raw event log — the batch
    * analytics twin of the streaming invoice sessionizer (ST4): a new
    * session starts when a user's inter-event gap exceeds
    * [[sessionGapUs]]. The classic lag → boundary-flag → running-sum
    * session numbering, then one session-level rollup.
    *
    * Exactness: gaps compare `unix_micros` longs (epoch_us in DuckDB) —
    * integer microseconds, no timestamp arithmetic ambiguity; span is an
    * integer difference.
    *
    * Scale shape: the lag/running-sum windows partition on user_id —
    * HIGH-cardinality (the q66/q70 class, not the q81 scale-killer
    * class) — so the table shuffles once on user and each partition
    * sorts only its own users' events. The rollup then aggregates on
    * (user_id, session_seq), map-side combined. */
  val sessionGapUs: Long = 1800L * 1000000L // 30 min

  def eventSessions(s: SparkSession, d: String): DataFrame =
    eventSessionsOn(Tables.events(s, d))

  def eventSessionsOn(events: DataFrame): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    events
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > sessionGapUs, lit(1L)).otherwise(lit(0L)))
      .withColumn("session_seq", sum(col("new_sess")).over(byUser))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        (max(col("ts_us")) - min(col("ts_us"))).as("span_us"))
  }

  val eventSessionsSql: String = s"""
    SELECT user_id, session_seq, count(*) AS n_events,
           min(ts_us) AS start_us,
           max(ts_us) - min(ts_us) AS span_us
    FROM (
      SELECT user_id, event_id, ts_us,
             CAST(sum(new_sess) OVER (PARTITION BY user_id
                   ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_seq
      FROM (
        SELECT user_id, event_id, ts_us,
               CASE WHEN lag(ts_us) OVER (PARTITION BY user_id
                      ORDER BY ts_us, event_id) IS NULL
                      OR ts_us - lag(ts_us) OVER (PARTITION BY user_id
                           ORDER BY ts_us, event_id) > $sessionGapUs
                    THEN 1 ELSE 0 END AS new_sess
        FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events)))
    GROUP BY user_id, session_seq"""

  /** DuckDB window sums of integers are HUGEINT (→ float64 in the driver's
    * pandas compare — the q60 failure class), hence the explicit BIGINT
    * cast on the windowed sum. */
  val rollingUserSpendSql: String = """
    SELECT event_id, user_id, ts_us, cents,
           CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS rolling_cents_24h
    FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                 CAST(floor(value * 100) AS BIGINT) AS cents
          FROM events WHERE event_type = 'click')"""

  /** Column profiling over orders: engine-stable columns only (integer,
    * string, date — double min/max formats differently across engines).
    * The Spark side is one scan (multi-distinct aggregate + stack); the
    * oracle says the same thing as per-column branches. */
  def profileOrders(s: SparkSession, d: String): DataFrame =
    // spread the one-file scan: the 6-way Expand + per-column distinct
    // partial aggregation (SortAggregate — string min/max buffers) is the
    // whole cost of this query and otherwise runs inside a single scan
    // task; all profiled statistics are order-independent
    graft.operators.Profile.profile(
      graft.Tuning.spreadNarrowScan(Tables.orders(s, d),
        s"$d/orders.parquet", col("o_orderkey")),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"))

  val profileOrdersSql: String =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate")
      .map { c =>
        s"""SELECT '$c' AS column_name, count(*) AS n_rows,
            CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
            count(DISTINCT $c) AS n_distinct,
            CAST(min($c) AS VARCHAR) AS min_value,
            CAST(max($c) AS VARCHAR) AS max_value
          FROM orders"""
      }.mkString("\n UNION ALL \n")

  // --- q78: per-label embedding centroids -----------------------------------

  /** Centroid recompute — the maintenance step of every vector-index and
    * clustering structure in this engine (one k-means Lloyd iteration, the
    * IVF coarse-quantizer refresh, per-class mean embeddings for probing).
    * Emits (label, dim, centroid, n) rows: dimension-exploded rather than
    * an array column (the driver gate cannot sort array cells — the round-2
    * q50 lesson), and reassembling the vector is a collect_list away.
    *
    * Float discipline: element values widen float→double exactly, then go
    * through [[graft.functions.Exact.davg]] (floor-quantized decimal sums)
    * so the per-(label,dim) mean is bit-identical at ANY parallelism and
    * to the DuckDB oracle — the property a 1000-executor recompute needs.
    *
    * Scale shape: posexplode is row-local; ONE map-side-combined aggregate
    * shuffles on (label, dim) — labels×dims cells, each a pair of decimal
    * counters, never the vectors themselves. */
  def embeddingCentroids(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim").cast("long").as("dim"))
      .agg(
        graft.functions.Exact.davg(col("v").cast("double"), 6).as("centroid"),
        count(lit(1)).as("n"))

  val embeddingCentroidsSql: String = s"""
    SELECT label, p.dim AS dim,
           ${graft.functions.Exact.davgSql("p.v", 6)} AS centroid,
           count(*) AS n
    FROM (SELECT label,
            unnest(list_transform(range(len(embedding)),
              i -> struct_pack(dim := i, v := CAST(embedding[i+1] AS DOUBLE)))) AS p
          FROM embeddings)
    GROUP BY 1, 2"""

  // --- q168/q169/q170: product quantization (codes, ADC scan, rerank) -------

  /** The committed PQ codebooks ([[graft.ml.PinnedPqCodebooks]], trained
    * once by PinPqMain — the pinned-quantizer discipline) as plan
    * literals, so DuckDB reproduces codes, ADC distances, and both
    * ranking stages exactly. */
  private lazy val pqBooks: Seq[Seq[Seq[Double]]] = graft.ml.PinnedPqCodebooks.values

  private lazy val pqBooksValuesSql: String =
    pqBooks.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (c, j) =>
        s"($s, ${j + 1}, ${doubleListSql(c)})"
      }
    }.mkString(", ")

  private def pqSubSliceSql(v: String, s: String): String =
    s"$v[($s * ${graft.operators.Pq.subDim} + 1):(($s + 1) * ${graft.operators.Pq.subDim})]"

  /** Shared CTE text: per-vector per-subspace code assignment (rank-1 by
    * (distance, centroid id) — the engine's `array_position` of the min). */
  private def pqCodesCteSql: String = s"""
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    ctr AS (SELECT * FROM (VALUES $pqBooksValuesSql) t(s, cell, cc)),
    rk AS (SELECT vec_id, s, cell,
             row_number() OVER (PARTITION BY vec_id, s ORDER BY dd, cell) AS rn
           FROM (SELECT c.vec_id, ctr.s, ctr.cell,
                   ${sqdistFoldSql(pqSubSliceSql("c.v", "ctr.s"), "ctr.cc")} AS dd
                 FROM c CROSS JOIN ctr)),
    codes AS (SELECT vec_id, s, cell FROM rk WHERE rn = 1)"""

  /** q168: the corpus as PQ CODES — 8 centroid ids per vector, the 32×
    * compression that makes a 100 TB embedding corpus memory-feasible
    * ([[graft.operators.Pq]]). Encoding is row-local zero-shuffle
    * codegen; the oracle recomputes every sub-assignment from the pinned
    * codebooks, so the compressed representation itself is hash-exact. */
  def pqCodes(s: SparkSession, d: String): DataFrame =
    graft.operators.Pq.encode(Tables.embeddings(s, d), pqBooks)

  lazy val pqCodesSql: String = s"""
    WITH ${pqCodesCteSql}
    SELECT vec_id,
           ${(0 until graft.operators.Pq.subspaces).map(s =>
             s"CAST(max(CASE WHEN s = $s THEN cell END) AS INT) AS c${s + 1}")
             .mkString(",\n           ")}
    FROM codes GROUP BY vec_id"""

  /** q169: the ADC top-k scan — per-query subspace lookup tables against
    * the CODES table only; raw corpus vectors are never read. The ADC
    * total is a fixed left-associated 8-term chain in both engines, so
    * approximate DISTANCES (not just ids) hash-match. */
  def pqAdcTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    graft.operators.Pq.adcTopK(emb, emb.filter(col("vec_id") < 10), pqBooks, k = 5)
  }

  private def pqAdcRankedSql: String = s"""
    q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 10),
    persub AS (SELECT q.query_id, codes.vec_id AS neighbor_id, codes.s,
                 ${sqdistFoldSql(pqSubSliceSql("q.qv", "codes.s"), "ctr.cc")} AS d
               FROM codes JOIN ctr USING (s, cell) CROSS JOIN q
               WHERE codes.vec_id <> q.query_id),
    adc AS (SELECT query_id, neighbor_id,
              ${(0 until graft.operators.Pq.subspaces).map(s =>
                s"max(CASE WHEN s = $s THEN d END)").mkString(" + ")} AS adc
            FROM persub GROUP BY 1, 2),
    ranked AS (SELECT query_id, neighbor_id, adc,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY adc, neighbor_id) AS rn
               FROM adc)"""

  lazy val pqAdcTopKSql: String = s"""
    WITH ${pqCodesCteSql},
    ${pqAdcRankedSql}
    SELECT query_id, neighbor_id, adc, rn FROM ranked WHERE rn <= 5"""

  /** q170: recall@5 of the two-stage serving path (ADC shortlist of
    * ${graft.operators.Pq.rerankShortlist}, exact L2 re-rank — Jégou et
    * al. §V) against brute-force L2 truth, per query — the q112
    * discipline applied to the compressed index: the quality of serving
    * from codes is a GATE ROW, not a claim. Pin-time measurement
    * (PinPqMain's committed sweep): 0.98 at sf0.01, 0.80 at sf0.1 with
    * books trained at sf0.01 — vs 0.18/0.12 ranking by raw ADC alone,
    * which is why the rerank stage exists. Left join keeps fully-missed
    * queries at 0. */
  def pqRerankRecallAt5(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Pq
    val emb = Tables.embeddings(s, d)
    val queries = emb.filter(col("vec_id") < 10)
    val brute = Pq.bruteL2TopK(emb, queries, k = 5)
      .select("query_id", "neighbor_id")
    val rr = Pq.adcRerankTopK(emb, queries, pqBooks, k = 5,
        shortlist = Pq.rerankShortlist)
      .select("query_id", "neighbor_id").withColumn("__hit", lit(1))
    brute.join(rr, Seq("query_id", "neighbor_id"), "left_outer")
      .groupBy("query_id").agg(count(col("__hit")).as("hits_at_5"))
  }

  lazy val pqRerankRecallAt5Sql: String = s"""
    WITH ${pqCodesCteSql},
    ${pqAdcRankedSql},
    shortlist AS (SELECT query_id, neighbor_id FROM ranked
                  WHERE rn <= ${graft.operators.Pq.rerankShortlist}),
    rr AS (SELECT query_id, neighbor_id FROM (
             SELECT sl.query_id, sl.neighbor_id,
                    row_number() OVER (PARTITION BY sl.query_id
                                       ORDER BY ${sqdistFoldSql("q.qv", "cv.v")},
                                                sl.neighbor_id) AS rrn
             FROM shortlist sl
             JOIN c cv ON sl.neighbor_id = cv.vec_id
             JOIN q ON sl.query_id = q.query_id)
           WHERE rrn <= 5),
    brute AS (SELECT query_id, neighbor_id FROM (
                SELECT q.query_id, c.vec_id AS neighbor_id,
                       row_number() OVER (PARTITION BY q.query_id
                                          ORDER BY ${sqdistFoldSql("q.qv", "c.v")},
                                                   c.vec_id) AS bn
                FROM c CROSS JOIN q WHERE c.vec_id <> q.query_id)
              WHERE bn <= 5)
    SELECT b.query_id, count(r.neighbor_id) AS hits_at_5
    FROM brute b
    LEFT JOIN rr r
      ON b.query_id = r.query_id AND b.neighbor_id = r.neighbor_id
    GROUP BY b.query_id"""

  /** q171: the composed IVF-PQ serving path ("IVFADC", Jégou et al. §VI —
    * the FAISS-standard architecture): coarse cells prune WHICH rows a
    * probe scans (cells/nProbe of the corpus, PartitionFilters on the
    * cell-partitioned codes index), PQ codes shrink WHAT each scanned row
    * costs (8 ints, no raw vectors in the index), and the exact re-rank
    * against the source-of-truth table restores precision on the
    * shortlist. Both quantizers are the engine's committed pins (IVF
    * c16t99, PQ 8×64), so DuckDB reproduces cell assignment, probe
    * selection, code assignment, ADC ranking, and the re-rank — the
    * entire two-level approximate index is hash-exact. */
  def ivfPqTopKQ(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    import graft.operators.Pq
    val emb = Tables.embeddings(s, d)
    val dir = indexCacheDir("graft-ivfpq-cache", d, "embeddings", "c16t99pq64x8")
    ivfBuildLock.synchronized {
      if (!new java.io.File(s"$dir/_SUCCESS").exists())
        Pq.writeIvfPqIndex(emb, dir, ivfCenters, pqBooks)
    }
    Pq.ivfPqTopK(dir, emb, emb.filter(col("vec_id") < 10),
      ivfCenters, pqBooks, k = 5, nProbe = 4, shortlist = Pq.rerankShortlist)
  }

  private def ivfPqProbeSql(queryPred: String): String = s"""
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    ictr AS (SELECT * FROM (VALUES ${centersValuesSql(ivfCenters)}) t(cell, cc)),
    irk AS (SELECT vec_id, cell,
              row_number() OVER (PARTITION BY vec_id ORDER BY dd, cell) AS rn
            FROM (SELECT c.vec_id, ictr.cell,
                    ${sqdistFoldSql("c.v", "ictr.cc")} AS dd
                  FROM c CROSS JOIN ictr)),
    assign AS (SELECT vec_id, cell FROM irk WHERE rn = 1),
    qprobe AS (SELECT vec_id AS query_id, cell FROM irk
               WHERE rn <= 4 AND ($queryPred)),
    qq AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE ($queryPred)),
    pctr AS (SELECT * FROM (VALUES $pqBooksValuesSql) t(s, pcell, cc)),
    prk AS (SELECT vec_id, s, pcell,
              row_number() OVER (PARTITION BY vec_id, s ORDER BY dd, pcell) AS rn
            FROM (SELECT c.vec_id, pctr.s, pctr.pcell,
                    ${sqdistFoldSql(pqSubSliceSql("c.v", "pctr.s"), "pctr.cc")} AS dd
                  FROM c CROSS JOIN pctr)),
    pcodes AS (SELECT vec_id, s, pcell FROM prk WHERE rn = 1),
    cand AS (SELECT qprobe.query_id, assign.vec_id AS neighbor_id
             FROM qprobe JOIN assign USING (cell)
             WHERE assign.vec_id <> qprobe.query_id),
    persub AS (SELECT cand.query_id, cand.neighbor_id, pcodes.s,
                 ${sqdistFoldSql(pqSubSliceSql("qq.qv", "pcodes.s"), "pctr.cc")} AS d
               FROM cand
               JOIN pcodes ON cand.neighbor_id = pcodes.vec_id
               JOIN pctr ON pctr.s = pcodes.s AND pctr.pcell = pcodes.pcell
               JOIN qq ON qq.query_id = cand.query_id),
    adc AS (SELECT query_id, neighbor_id,
              ${(0 until graft.operators.Pq.subspaces).map(s =>
                s"max(CASE WHEN s = $s THEN d END)").mkString(" + ")} AS adc
            FROM persub GROUP BY 1, 2),
    sl AS (SELECT query_id, neighbor_id FROM (
             SELECT query_id, neighbor_id,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY adc, neighbor_id) AS srn
             FROM adc)
           WHERE srn <= ${graft.operators.Pq.rerankShortlist}),
    rr0 AS (SELECT sl.query_id, sl.neighbor_id,
              ${sqdistFoldSql("qq.qv", "cv.v")} AS dd
            FROM sl
            JOIN c cv ON sl.neighbor_id = cv.vec_id
            JOIN qq ON qq.query_id = sl.query_id)
    SELECT query_id, neighbor_id, dd, rn FROM (
      SELECT query_id, neighbor_id, dd,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY dd, neighbor_id) AS rn
      FROM rr0)
    WHERE rn <= 5"""

  lazy val ivfPqTopKSql: String = ivfPqProbeSql("vec_id < 10")

  /** q172: the IVF-PQ index's APPEND path — build from the even half,
    * [[graft.operators.Pq.appendToIvfPqIndex]] the odd half, probe a
    * DIFFERENT query set (vec_id 10..20, the q99 discipline). Cell and
    * code assignment are per-vector deterministic against the pinned
    * quantizers, so the incrementally-grown index holds exactly the
    * full-rebuild rows and ONE oracle form covers both — a daily corpus
    * drop costs a batch-sized encode+assign job, never an index rebuild. */
  def ivfPqAppendProbe(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    import graft.operators.Pq
    val emb = Tables.embeddings(s, d)
    val dir = indexCacheDir("graft-ivfpq-incr", d, "embeddings", "c16t99pq64x8")
    ivfBuildLock.synchronized {
      // marker LAST: a half-built index (crash between the steps) is
      // rebuilt from scratch, never probed — the q99 pattern
      if (!new java.io.File(s"$dir/_GRAFT_INDEX_READY").exists()) {
        Pq.writeIvfPqIndex(emb.filter(col("vec_id") % 2 === 0), dir,
          ivfCenters, pqBooks)
        Pq.appendToIvfPqIndex(emb.filter(col("vec_id") % 2 === 1), dir,
          ivfCenters, pqBooks)
        new java.io.File(s"$dir/_GRAFT_INDEX_READY").createNewFile()
      }
    }
    Pq.ivfPqTopK(dir, emb, emb.filter(col("vec_id") >= 10 && col("vec_id") < 20),
      ivfCenters, pqBooks, k = 5, nProbe = 4, shortlist = Pq.rerankShortlist)
  }

  lazy val ivfPqAppendProbeSql: String =
    ivfPqProbeSql("vec_id >= 10 AND vec_id < 20")

  // --- q173/q174: lexical retrieval and reciprocal-rank hybrid fusion -------

  /** q173: BM25-shaped lexical document retrieval, doc-as-query (each of
    * the 5 query documents' term sets ranks the rest of the corpus). The
    * score keeps BM25's tf saturation and length normalization
    * (k1 = 1.2, b = 0.75) but weights rarity by the RAW odds
    * (N − df + ½)/(df + ½) instead of its log — the q62 rationale: libm
    * log is not contractually identical across engines, and the odds
    * keep every step one IEEE op over exact integers. Per-document
    * scores fold through [[graft.functions.Exact.dsum]] (quantized exact
    * decimal sums), so the total is independent of partitioning AND
    * bit-equal to the oracle.
    *
    * Scale shape: tf/df/dlen are the q62 shuffles; the query-term join
    * broadcasts 5 term bags; corpus stats attach as a broadcast 1-row
    * cross join; one (query, candidate) aggregate, then the rank window. */
  val lexK1 = 1.2
  val lexB = 0.75
  val lexTopK = 10

  private def lexScored(docs: DataFrame): DataFrame = {
    // lazily persisted: dlen/dfreq/qterms and the candidate join are FOUR
    // consumers of the same tokenize+aggregate subtree, and ReuseExchange
    // does not unify them — without the persist the corpus tokenization
    // runs 4× per execution (the beyondThreshold lesson, round-10 verdict
    // #3; CacheManager dedupes re-invocations by canonicalized plan)
    val tf = docs
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dlen = tf.groupBy("doc_id").agg(sum("tf").as("len"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(dlen.agg(sum("len").as("total_len")))
    val qterms = tf.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"), col("term"))
    val norm = lit(1.0) - lit(lexB) +
      lit(lexB) * (col("len").cast("double") /
        (col("total_len").cast("double") / col("n_docs").cast("double")))
    val idfOdds = ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val termScore = idfOdds * (col("tf").cast("double") * lit(lexK1 + 1.0)) /
      (col("tf").cast("double") + lit(lexK1) * norm)
    qterms
      .join(tf.withColumnRenamed("doc_id", "cand_id"), "term")
      .filter(col("query_id") =!= col("cand_id"))
      .join(dfreq, "term")
      .join(dlen.withColumnRenamed("doc_id", "cand_id"), "cand_id")
      .crossJoin(broadcast(stats))
      .withColumn("term_score", termScore)
      .groupBy(col("query_id"), col("cand_id"))
      .agg(graft.functions.Exact.dsum(col("term_score"), 6).as("score"))
  }

  def lexicalTopK(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("cand_id"))
    lexScored(Tables.documents(s, d))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= lexTopK)
      .select(col("query_id"), col("cand_id").as("doc_id"), col("score"),
        col("rank"))
  }

  /** Shared lexical-score CTE text (mirrors [[lexScored]] exactly). */
  private def lexScoredCteSql: String = s"""
    tf AS (SELECT doc_id, token AS term, count(*) AS tf
           FROM (SELECT doc_id, unnest($toksSql) AS token FROM documents)
           GROUP BY doc_id, token),
    dlen AS (SELECT doc_id, sum(tf) AS len FROM tf GROUP BY doc_id),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                     (SELECT sum(len) FROM dlen) AS total_len),
    lexsc AS (
      SELECT q.query_id, t.doc_id AS cand_id,
             ${graft.functions.Exact.dsumSql(
               s"""((CAST(s.n_docs - f.df AS DOUBLE) + 0.5)
                    / (CAST(f.df AS DOUBLE) + 0.5))
                  * (CAST(t.tf AS DOUBLE) * ${lexK1 + 1.0})
                  / (CAST(t.tf AS DOUBLE) + $lexK1 *
                     (1.0 - $lexB + $lexB * (CAST(l.len AS DOUBLE)
                        / (CAST(s.total_len AS DOUBLE)
                           / CAST(s.n_docs AS DOUBLE)))))""", 6)} AS score
      FROM (SELECT doc_id AS query_id, term FROM tf WHERE doc_id < 5) q
      JOIN tf t ON q.term = t.term AND t.doc_id <> q.query_id
      JOIN dfreq f ON f.term = q.term
      JOIN dlen l ON l.doc_id = t.doc_id
      CROSS JOIN stats s
      GROUP BY 1, 2)"""

  lazy val lexicalTopKSql: String = s"""
    WITH ${lexScoredCteSql}
    SELECT query_id, doc_id, score, rank FROM (
      SELECT query_id, cand_id AS doc_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, cand_id) AS rank
      FROM lexsc)
    WHERE rank <= $lexTopK"""

  /** q174: hybrid retrieval by reciprocal-rank fusion (Cormack, Clarke &
    * Buettcher, SIGIR 2009 — the fusion Elastic/Vespa/Weaviate all ship):
    * rrf = Σ 1/(60 + rank) over the lexical list (q173's scorer, top 50)
    * and the dense list (exact cosine over the embedding column, top 50;
    * ids are shared across the two tables). Rank arithmetic only — the
    * two 1/(60+r) terms are IEEE divisions of identical small integers
    * summed in a fixed order — so the fused ranking is hash-exact. A
    * candidate found by only one modality contributes its one term (the
    * full-outer join + coalesce; dropping those is the classic hybrid
    * bug this gate locks out).
    *
    * Scale shape: each modality's top-50 is its own established pipeline
    * (windowed rank); fusion joins two 250-row lists — negligible
    * against either candidate scan at any corpus size. */
  val rrfK = 60
  val rrfDepth = 50

  def rrfHybridTopK(s: SparkSession, d: String): DataFrame = {
    val wLex = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("cand_id"))
    val lex = lexScored(Tables.documents(s, d))
      .withColumn("r_lex", row_number().over(wLex))
      .filter(col("r_lex") <= rrfDepth)
      .select(col("query_id"), col("cand_id").as("doc_id"), col("r_lex"))
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qv"))
    val c = emb.select(col("vec_id").as("doc_id"),
      col("embedding").cast("array<double>").as("v"))
    val wVec = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("doc_id"))
    val vec = c.join(broadcast(q), col("doc_id") =!= col("query_id"))
      .withColumn("sim", graft.operators.Similarity.cosine(col("qv"), col("v")))
      .withColumn("r_vec", row_number().over(wVec))
      .filter(col("r_vec") <= rrfDepth)
      .select(col("query_id"), col("doc_id"), col("r_vec"))
    val rrf =
      when(col("r_lex").isNotNull, lit(1.0) / (lit(rrfK) + col("r_lex")))
        .otherwise(lit(0.0)) +
      when(col("r_vec").isNotNull, lit(1.0) / (lit(rrfK) + col("r_vec")))
        .otherwise(lit(0.0))
    val wF = Window.partitionBy("query_id").orderBy(col("rrf").desc, col("doc_id"))
    lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf", rrf)
      .withColumn("rank", row_number().over(wF))
      .filter(col("rank") <= lexTopK)
      .select("query_id", "doc_id", "r_lex", "r_vec", "rrf", "rank")
  }

  lazy val rrfHybridTopKSql: String = s"""
    WITH ${lexScoredCteSql},
    lex AS (SELECT query_id, cand_id AS doc_id, r_lex FROM (
              SELECT query_id, cand_id, score,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, cand_id) AS r_lex
              FROM lexsc)
            WHERE r_lex <= $rrfDepth),
    ce AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    vq AS (SELECT vec_id AS query_id, v AS qv FROM ce WHERE vec_id < 5),
    vec AS (SELECT query_id, doc_id, r_vec FROM (
              SELECT vq.query_id, ce.vec_id AS doc_id,
                     row_number() OVER (PARTITION BY vq.query_id
                                        ORDER BY ${cosineSql("vq.qv", "ce.v")} DESC,
                                                 ce.vec_id) AS r_vec
              FROM ce CROSS JOIN vq
              WHERE ce.vec_id <> vq.query_id)
            WHERE r_vec <= $rrfDepth),
    fused AS (SELECT COALESCE(lex.query_id, vec.query_id) AS query_id,
                     COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
                     lex.r_lex, vec.r_vec,
                     (CASE WHEN lex.r_lex IS NOT NULL
                           THEN CAST(1 AS DOUBLE) / ($rrfK + lex.r_lex)
                           ELSE CAST(0 AS DOUBLE) END)
                     + (CASE WHEN vec.r_vec IS NOT NULL
                             THEN CAST(1 AS DOUBLE) / ($rrfK + vec.r_vec)
                             ELSE CAST(0 AS DOUBLE) END) AS rrf
              FROM lex FULL OUTER JOIN vec
                ON lex.query_id = vec.query_id AND lex.doc_id = vec.doc_id)
    SELECT query_id, doc_id, r_lex, r_vec, rrf, rank FROM (
      SELECT query_id, doc_id, r_lex, r_vec, rrf,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY rrf DESC, doc_id) AS rank
      FROM fused)
    WHERE rank <= $lexTopK"""

  // --- q177: exact-substring duplicated spans --------------------------------

  /** q177: per-document duplicated-SPAN statistics — the Lee et al. (ACL
    * 2022) exact-substring view the document-level dedup family (q20/q25/
    * q27/q83) misses: char-identical runs ≥ 50 chars shared across ≥ 2
    * documents, merged into maximal islands, with the char fraction a
    * removal pass would reclaim. Duplication is defined over the q28
    * polynomial fingerprint (the suffix-array stand-in that distributes);
    * see [[graft.operators.Dedup.duplicatedSpanStats]] for the full
    * scale-shape notes. The oracle recomputes windows, fingerprints,
    * distinct-doc counts, and the gaps-and-islands merge — both engines
    * compute the spans, not just compare counts. */
  val dupSpanGram = 50

  def dupSpans(s: SparkSession, d: String): DataFrame =
    graft.operators.Dedup.duplicatedSpanStats(
      Tables.documents(s, d), gram = dupSpanGram)

  /** q178: the INCREMENTAL q177 — the postings table (doc, p, fp) is the
    * persisted state, and postings are per-document deterministic, so a
    * new document batch appends its own postings and every downstream
    * stat is a function of the stored table: append ≡ rebuild (the
    * q99/q148/q164/q172 discipline, applied to substring dedup). The
    * gate builds postings from the even docs, appends the odd docs,
    * recomputes the stats from STORAGE, and hash-matches q177's oracle
    * verbatim. Daily cost: tokenize the new batch + one stats pass over
    * the postings — never re-fingerprint the corpus. */
  def dupSpansIncremental(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Dedup
    val docs = Tables.documents(s, d)
    val dir = indexCacheDir("graft-grams-cache", d, "documents", s"g$dupSpanGram")
    ivfBuildLock.synchronized {
      if (!new java.io.File(s"$dir/_GRAFT_INDEX_READY").exists()) {
        Dedup.gramPostings(docs.filter(col("doc_id") % 2 === 0), dupSpanGram)
          .write.mode("overwrite").parquet(dir)
        Dedup.gramPostings(docs.filter(col("doc_id") % 2 === 1), dupSpanGram)
          .write.mode("append").parquet(dir)
        new java.io.File(s"$dir/_GRAFT_INDEX_READY").createNewFile()
      }
    }
    Dedup.duplicatedSpanStatsFromPostings(
      s.read.parquet(dir), docs, gram = dupSpanGram)
  }

  lazy val dupSpansSql: String = s"""
    WITH g AS (
      SELECT doc_id, p,
             ${fingerprintExprSqlOn(s"substr(text, CAST(p AS INT), $dupSpanGram)")} AS fp
      FROM (SELECT doc_id, text,
              unnest(range(1, length(text) - $dupSpanGram + 2)) AS p
            FROM documents WHERE length(text) >= $dupSpanGram)),
    dupfp AS (SELECT fp FROM g GROUP BY fp
              HAVING count(DISTINCT doc_id) >= 2),
    di AS (SELECT g.doc_id, g.p, g.p + ${dupSpanGram - 1} AS e
           FROM g JOIN dupfp ON g.fp = dupfp.fp),
    isl AS (SELECT doc_id, p, e,
              CASE WHEN maxEndBefore IS NULL OR p > maxEndBefore + 1
                   THEN 1 ELSE 0 END AS newIsland
            FROM (SELECT doc_id, p, e,
                    max(e) OVER (PARTITION BY doc_id ORDER BY p
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING) AS maxEndBefore
                  FROM di)),
    spans AS (SELECT doc_id, island, min(p) AS s, max(e) AS t
              FROM (SELECT doc_id, p, e,
                      sum(newIsland) OVER (PARTITION BY doc_id ORDER BY p
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                                    AND CURRENT ROW) AS island
                    FROM isl)
              GROUP BY 1, 2),
    perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
                 CAST(sum(t - s + 1) AS BIGINT) AS dup_chars
               FROM spans GROUP BY 1)
    SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS len,
           COALESCE(p.n_spans, 0) AS n_spans,
           COALESCE(p.dup_chars, 0) AS dup_chars,
           CAST(COALESCE(p.dup_chars, 0) AS DOUBLE)
             / CAST(length(d.text) AS BIGINT) AS dup_frac
    FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id"""

  // --- q175/q176: scalar quantization (SQ8) ----------------------------------

  /** q175: the corpus as SQ8 codes, dimension-exploded (the q78 output
    * discipline — the driver comparator cannot sort array cells). The
    * per-dim [min, max] stats ARE the whole model — computed in-query by
    * one map-side-combined aggregate (64 pairs, broadcast back), so the
    * oracle reproduces training and encoding with no pinned state at
    * all. See [[graft.operators.Sq]]. */
  def sq8Codes(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Sq
    val emb = Tables.embeddings(s, d)
    Sq.encode(emb, Sq.dimStats(emb))
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("dim", "code")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"), col("code"))
  }

  private val sq8CodesCteSql: String = s"""
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    ex AS (SELECT vec_id, p.dim AS dim, p.x AS x
           FROM (SELECT vec_id,
                   unnest(list_transform(range(len(v)),
                     i -> struct_pack(dim := i, x := v[i+1]))) AS p
                 FROM c)),
    st AS (SELECT dim, min(x) AS vmin, max(x) AS vmax FROM ex GROUP BY dim),
    codes AS (SELECT vec_id, dim,
                CASE WHEN vmax = vmin THEN 0
                     ELSE CAST(round((x - vmin) * CAST(${graft.operators.Sq.levels}
                            AS DOUBLE) / (vmax - vmin)) AS INT) END AS code
              FROM ex JOIN st USING (dim))"""

  lazy val sq8CodesSql: String = s"""
    WITH ${sq8CodesCteSql}
    SELECT vec_id, dim, code FROM codes"""

  /** q176: symmetric SQ8 top-k — both sides quantized, candidates ranked
    * by Σ (qcode − ccode)², which is EXACT BIGINT ARITHMETIC end to end:
    * the one approximate-index gate whose distances carry no floating
    * point anywhere (no fold-order discipline needed — integers have no
    * association order). Recall@5 vs brute L2 measured 43/50 = 0.86 at
    * sf0.01 (SqSpec) at 4× memory reduction — the fidelity point between
    * raw floats and PQ's 32×; the misses are near-tied neighbors whose
    * separation is below the per-dim quantization step. */
  def sq8TopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    graft.operators.Sq.topK(emb, emb.filter(col("vec_id") < 10), k = 5)
  }

  lazy val sq8TopKSql: String = s"""
    WITH ${sq8CodesCteSql},
    q AS (SELECT vec_id AS query_id, dim, code AS qcode FROM codes
          WHERE vec_id < 10),
    d AS (SELECT q.query_id, c2.vec_id AS neighbor_id,
            CAST(sum(CAST((q.qcode - c2.code) * (q.qcode - c2.code)
                          AS BIGINT)) AS BIGINT) AS dist
          FROM q JOIN codes c2 USING (dim)
          WHERE c2.vec_id <> q.query_id
          GROUP BY 1, 2)
    SELECT query_id, neighbor_id, dist, rn FROM (
      SELECT query_id, neighbor_id, dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY dist, neighbor_id) AS rn
      FROM d)
    WHERE rn <= 5"""

  val defs: Map[String, QueryDef] = Map(
    "q78_embedding_centroids" -> QueryDef(embeddingCentroids _, embeddingCentroidsSql),
    "q168_pq_codes"          -> QueryDef(pqCodes _, pqCodesSql),
    "q171_ivfpq_topk"        -> QueryDef(ivfPqTopKQ _, ivfPqTopKSql),
    "q172_ivfpq_append"      -> QueryDef(ivfPqAppendProbe _, ivfPqAppendProbeSql),
    "q173_lexical_topk"      -> QueryDef(lexicalTopK _, lexicalTopKSql),
    "q174_rrf_hybrid"        -> QueryDef(rrfHybridTopK _, rrfHybridTopKSql),
    "q175_sq8_codes"         -> QueryDef(sq8Codes _, sq8CodesSql),
    "q176_sq8_topk"          -> QueryDef(sq8TopK _, sq8TopKSql),
    "q177_dup_spans"         -> QueryDef(dupSpans _, dupSpansSql),
    "q178_dup_spans_incremental" -> QueryDef(dupSpansIncremental _, dupSpansSql),
    "q169_pq_adc_topk"       -> QueryDef(pqAdcTopK _, pqAdcTopKSql),
    "q170_pq_rerank_recall"  -> QueryDef(pqRerankRecallAt5 _, pqRerankRecallAt5Sql),
    "q20_dedup_exact"        -> QueryDef(dedupExact _, dedupExactSql),
    "q21_token_stats"        -> QueryDef(tokenStats _, tokenStatsSql),
    "q22_text_quality"       -> QueryDef(textQuality _, textQualitySql),
    "q23_lang_id"            -> QueryDef(langIdHeuristic _, langIdHeuristicSql),
    "q24_ann_brute_topk"     -> QueryDef(annBruteTopK _, annBruteTopKSql),
    "q25_near_dup_minhash"   -> QueryDef(nearDupMinhash _, nearDupMinhashSql),
    "q26_jaccard_adjacent"   -> QueryDef(jaccardAdjacent _, jaccardAdjacentSql),
    "q97_simjoin_exact"      -> QueryDef(simJoinExact _, simJoinExactSql),
    "q27_simhash_adjacent"   -> QueryDef(simhashAdjacent _, simhashAdjacentSql),
    "q28_fingerprint"        -> QueryDef(fingerprint _, fingerprintSql),
    "q29_multimodal_meta"    -> QueryDef(multimodalMeta _, multimodalMetaSql),
    "q30_embedding_near_dups" -> QueryDef(embeddingNearDups _, embeddingNearDupsSql),
    "q31_ann_ivf_topk"       -> QueryDef(annIvfTopK _, annIvfTopKSql),
    "q104_ann_filtered"      -> QueryDef(annIvfFilteredTopK _, annIvfFilteredTopKSql),
    "q112_ann_recall"        -> QueryDef(annRecallAt5 _, annRecallAt5Sql),
    "q134_pca_ann_recall"    -> QueryDef(pcaAnnRecallAt5 _, pcaAnnRecallAt5Sql),
    "q153_matryoshka_recall" -> QueryDef(matryoshkaRecallAt5 _, matryoshkaRecallAt5Sql),
    "q156_label_tightness"   -> QueryDef(labelTightness _, labelTightnessSql),
    "q32_multimodal_features" -> QueryDef(multimodalFeatures _, multimodalFeaturesSql),
    "q161_imageio_decode"    -> QueryDef(imageioDecode _, imageioDecodeSql),
    "q218_jpeg_decode"       -> QueryDef(jpegDecode _, jpegDecodeSql),
    "q212_wav_decode"        -> QueryDef(wavDecode _, wavDecodeSql),
    "q46_multimodal_frame_sample" -> QueryDef(multimodalFrameSample _, multimodalFrameSampleSql),
    "q47_asof_purchase_click" -> QueryDef(asofPurchaseClick _, asofPurchaseClickSql),
    "q116_asof_exec"         -> QueryDef(asofPurchaseClickExec _, asofPurchaseClickSql),
    "q48_subtoken_stats" -> QueryDef(subtokenStats _, subtokenStatsSql),
    "q49_dedup_clusters" -> QueryDef(dedupClusters _, dedupClustersSql),
    "q71_dedup_keep_best" -> QueryDef(dedupKeepBest _, dedupKeepBestSql),
    "q50_embedding_quantize" -> QueryDef(embeddingQuantize _, embeddingQuantizeSql),
    "q52_incremental_dedup"  -> QueryDef(incrementalDedup _, incrementalDedupSql),
    "q53_ann_lsh_topk"       -> QueryDef(annLshTopK _, annLshTopKSql),
    "q99_ann_ivf_append"     -> QueryDef(annIvfAppendProbe _, annIvfAppendProbeSql),
    "q57_top_term_per_doc"   -> QueryDef(topTermPerDoc _, topTermPerDocSql),
    "q58_multimodal_resize"  -> QueryDef(multimodalResize _, multimodalResizeSql),
    "q59_train_val_split"    -> QueryDef(trainValSplit _, trainValSplitSql),
    "q128_leakage_safe_split" -> QueryDef(leakageSafeSplit _, leakageSafeSplitSql),
    "q60_profile_orders"     -> QueryDef(profileOrders _, profileOrdersSql),
    "q66_attribution_window" -> QueryDef(attributionWindow _, attributionWindowSql),
    "q194_attribution_coverage" -> QueryDef(attributionCoverage _, attributionCoverageSql),
    "q70_rolling_user_spend" -> QueryDef(rollingUserSpend _, rollingUserSpendSql),
    "q87_event_sessions"     -> QueryDef(eventSessions _, eventSessionsSql),
    "q129_session_window_native" -> QueryDef(SessionWindowGate.sessionWindowNative _,
      SessionWindowGate.sessionWindowNativeSql),
    "q135_hard_negatives"    -> QueryDef(hardNegatives _, hardNegativesSql),
    "q137_embedding_audit"   -> QueryDef(embeddingAudit _, embeddingAuditSql),
    "q138_hard_negatives_ivf" -> QueryDef(hardNegativesIvfGate _, hardNegativesIvfSql),
    "q139_hybrid_search"     -> QueryDef(hybridSearch _, hybridSearchSql),
    "q160_hybrid_ivf"        -> QueryDef(hybridSearchIvf _, hybridSearchIvfSql),
    "q142_sql_surface"       -> QueryDef(sqlSurface _, sqlSurfaceSql),
    "q143_source_dup_matrix" -> QueryDef(sourceDupMatrix _, sourceDupMatrixSql),
    "q144_encoding_audit"    -> QueryDef(encodingAudit _, encodingAuditSql),
    "q146_topk_native_agg"   -> QueryDef(topkNativeAgg _, topkNativeAggSql),
    "q147_streaming_audit_gate" -> QueryDef(streamingAuditGate _, embeddingAuditSql),
    "q210_transitions_streaming" -> QueryDef(transitionsStreamingGate _,
      graft.queries.Relational.eventTransitionsSql),
    "q148_audit_incremental" -> QueryDef(auditIncremental _, embeddingAuditSql),
    "q150_curate_v2"         -> QueryDef(curateV2 _, curateV2Sql),
    "q223_stream_static_join" ->
      QueryDef(streamStaticEnrichGate _, streamStaticEnrichSql),
    "q225_transitions_tws" -> QueryDef(transitionsTwsGate _,
      graft.queries.Relational.eventTransitionsSql),
    "q226_streaming_dedup_native" ->
      QueryDef(streamingDedupNative _, streamingDedupNativeSql),
    "q242_crash_recovery_upsert" ->
      QueryDef(crashInjectedUpsert _, crashInjectedUpsertSql),
    "q243_late_data_accounting" ->
      QueryDef(lateDataAccounting _, lateDataAccountingSql),
    "q244_session_late_drops" ->
      QueryDef(sessionLateDrops _, sessionLateDropsSql),
    "q227_streaming_upsert_sink" ->
      QueryDef(streamingUpsertSink _, streamingUpsertSinkSql),
    "q230_distinct_tws" ->
      QueryDef(distinctTwsGate _, distinctTwsSql),
    "q236_tws_map_introspect" ->
      QueryDef(twsMapIntrospectGate _, twsMapIntrospectSql),
    "q239_join_state_introspect" ->
      QueryDef(joinStateIntrospectGate _, joinStateIntrospectSql))
}

/** q129's definitions live in their own object so the SQL val is fully
  * initialized before [[Extensions.defs]] (declared textually earlier in
  * `Extensions`) captures it — referencing a later-declared val from an
  * earlier one yields null at object init (the Verify NPE class). */
private[graft] object SessionWindowGate {

  /** q129: the NATIVE `session_window` gap sessionization over the event
    * log — the batch-twin gate for the event-time streaming sessionizer
    * (ST11, [[graft.streaming.Sessionizer.sessionizeEventTime]]): expiry
    * on EVENT-TIME silence, exactly the watermark-folded semantics the
    * streaming operator implements (EventTimeSessionSpec pins the state
    * machine; SessionWindowSpec pins the ≤-gap boundary alignment this
    * query relies on).
    *
    * Deliberately a different PLAN from q87's hand-rolled lag → flag →
    * running-sum form: Spark's built-in session-window merging aggregate
    * (one shuffle on user_id, sessions merged inside the aggregate — no
    * sort-window pass), checked against the independent lag+cumsum
    * formulation in DuckDB. 12 h gap → ~3.3 k sessions at sf0.01, a real
    * merge distribution rather than one-session-per-event.
    *
    * Scale shape: single hash shuffle on high-cardinality user_id; state
    * during merge is bounded by LIVE sessions per user, so a 1000-executor
    * run partitions users and never materializes a per-user event list. */
  val sessionWindowGapUs: Long = 43200L * 1000000L // 12 h

  def sessionWindowNative(s: SparkSession, d: String): DataFrame =
    graft.streaming.SessionWindows.userSessions(Tables.events(s, d), sessionWindowGapUs)

  val sessionWindowNativeSql: String = s"""
    SELECT user_id, count(*) AS n_events,
           min(ts_us) AS start_us,
           max(ts_us) - min(ts_us) AS span_us
    FROM (
      SELECT user_id, ts_us,
             CAST(sum(new_sess) OVER (PARTITION BY user_id
                   ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_seq
      FROM (
        SELECT user_id, event_id, ts_us,
               CASE WHEN lag(ts_us) OVER (PARTITION BY user_id
                      ORDER BY ts_us, event_id) IS NULL
                      OR ts_us - lag(ts_us) OVER (PARTITION BY user_id
                           ORDER BY ts_us, event_id) > $sessionWindowGapUs
                    THEN 1 ELSE 0 END AS new_sess
        FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events)))
    GROUP BY user_id, session_seq"""
}
