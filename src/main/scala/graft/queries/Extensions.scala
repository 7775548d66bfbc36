package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  private val toksSql =
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
    Dedup.nearDuplicates(Tables.documents(s, d), "doc_id", "text",
      minJaccard = 0.2, numHashes = 32, bands = 8, shingleN = 3)

  def simhashAdjacent(s: SparkSession, d: String): DataFrame = {
    val sigs = Tables.documents(s, d)
      .select(col("doc_id"), TextFunctions.simhash64(col("text")).as("sig"))
    val nxt = sigs.select((col("doc_id") - 1).as("doc_id"), col("sig").as("sig_next"))
    sigs.join(nxt, "doc_id")
      .select(col("doc_id"), TextFunctions.hamming64(col("sig"), col("sig_next")).as("hamming"))
  }

  /** Exact word-3-gram Jaccard between each doc and its successor. */
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

  private val enStops = TextFunctions.stopwords("en").map(w => s"'$w'").mkString(", ")
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

  val fingerprintSql: String = """
    SELECT doc_id,
      list_reduce(
        list_concat([CAST(0 AS BIGINT)],
          list_transform(
            list_filter(regexp_split_to_array(substr(text, 1, 64), ''), c -> c <> ''),
            c -> CAST(unicode(c) AS BIGINT))),
        (a, b) -> (a * 31 + b) % 1000000007) AS fp
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

  def annIvfTopK(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    val emb = Tables.embeddings(s, d)
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), k = 5, cells = 16, nProbe = 4)
  }

  def embeddingNearDups(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    Similarity.embeddingNearDups(Tables.embeddings(s, d), minCosine = 0.95)
  }

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

  val defs: Map[String, QueryDef] = Map(
    "q20_dedup_exact"        -> QueryDef(dedupExact _, dedupExactSql),
    "q21_token_stats"        -> QueryDef(tokenStats _, tokenStatsSql),
    "q22_text_quality"       -> QueryDef(textQuality _, textQualitySql),
    "q23_lang_id"            -> QueryDef(langIdHeuristic _, langIdHeuristicSql),
    "q24_ann_brute_topk"     -> QueryDef(annBruteTopK _, annBruteTopKSql),
    "q25_near_dup_minhash"   -> QueryDef(nearDupMinhash _, None),
    "q26_jaccard_adjacent"   -> QueryDef(jaccardAdjacent _, jaccardAdjacentSql),
    "q27_simhash_adjacent"   -> QueryDef(simhashAdjacent _, None),
    "q28_fingerprint"        -> QueryDef(fingerprint _, fingerprintSql),
    "q29_multimodal_meta"    -> QueryDef(multimodalMeta _, multimodalMetaSql),
    "q30_embedding_near_dups" -> QueryDef(embeddingNearDups _, None),
    "q31_ann_ivf_topk"       -> QueryDef(annIvfTopK _, None),
    "q32_multimodal_features" -> QueryDef(multimodalFeatures _, None))
}
