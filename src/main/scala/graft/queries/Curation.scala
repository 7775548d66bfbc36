package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.{Exact, TextFunctions}
import graft.operators.Sampling

/** Corpus-curation query inventory: the selection / weighting / scrubbing
  * passes a training-data pipeline runs between raw ingest and
  * tokenization — stratified sampling, TF-IDF term weighting, vocabulary
  * building, pattern redaction, and quality routing. All five are exact
  * cross-engine (integer or single-IEEE-division arithmetic only), so each
  * carries a full DuckDB oracle.
  */
object Curation {

  // --- q61: stratified content-hash sampling -------------------------------

  /** Language-rebalancing sample over documents: keep 10% of English (the
    * over-represented stratum), 30% of Chinese, 50% of everything else —
    * decided by content-hash bucket, so the sample is reproducible and
    * duplicate-stable (see [[Sampling]]). */
  val strataRates: Map[String, Int] = Map("en" -> 10, "zh" -> 30)
  val strataDefault: Int = 50

  def stratifiedSample(s: SparkSession, d: String): DataFrame =
    Sampling.stratifiedSample(Tables.documents(s, d),
        strataCol = "lang", contentCol = "text",
        rates = strataRates, defaultPct = strataDefault)
      .select(col("doc_id"), col("lang"), col("bucket"))

  val stratifiedSampleSql: String = s"""
    SELECT doc_id, lang, bucket FROM (
      SELECT doc_id, lang, ${Extensions.fingerprintExprSql} % 100 AS bucket
      FROM documents)
    WHERE bucket < CASE lang WHEN 'en' THEN ${strataRates("en")}
                             WHEN 'zh' THEN ${strataRates("zh")}
                             ELSE $strataDefault END"""

  // --- q183: temperature-rebalanced language sampling -----------------------

  /** √n temperature scale: at sf0.01 English (n=218) keeps ≈ 5/√218 ≈ 34%
    * while French (n=64) keeps ≈ 62% — the rebalance is visible at every
    * gate SF without any stratum capping to 100% above sf0.001. */
  val tempK: Double = 5.0

  /** q183: temperature-rebalanced sample (α = 0.5) over languages — keep
    * rate k/√n per language, decided by content hash
    * ([[Sampling.temperatureSample]]). The multilingual-mix upweighting
    * pass: dominant languages are thinned ∝ 1/√n, rare ones kept nearly
    * whole, and every keep decision is reproducible cross-engine because
    * √ is the one libm-free power (IEEE-exact in both engines). */
  def temperatureSample(s: SparkSession, d: String): DataFrame =
    Sampling.temperatureSample(Tables.documents(s, d),
        strataCol = "lang", contentCol = "text", k = tempK)
      .select(col("doc_id"), col("lang"))

  val temperatureSampleSql: String = s"""
    WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang)
    SELECT doc_id, lang
    FROM documents JOIN counts USING (lang)
    WHERE (${Extensions.fingerprintExprSql} * ${Sampling.mixC}) % 1000000 <
      CAST(floor(CAST(1000000 AS DOUBLE) *
        least(CAST(1 AS DOUBLE),
              CAST(${tempK.toInt} AS DOUBLE) / sqrt(CAST(n AS DOUBLE))))
        AS BIGINT)"""

  // --- q184: priority (weight-proportional) sampling ------------------------

  /** Sample size for the priority sample — small enough that the τ window
    * is trivially driver-scale, large enough to exercise the estimator. */
  val prioK: Int = 50

  /** q184: Duffield–Lund–Thorup priority sample of documents weighted by
    * length — the budget-capped corpus subset where long documents are
    * overrepresented ∝ weight yet totals stay unbiased via the
    * max(w, τ) estimate ([[Sampling.prioritySample]]). One
    * TakeOrderedAndProject pass; the oracle replays priorities exactly
    * (hash-derived uniforms, two IEEE ops per row). */
  def prioritySample(s: SparkSession, d: String): DataFrame =
    Sampling.prioritySample(Tables.documents(s, d),
      keyCol = "doc_id", weightCol = "n_chars", k = prioK)

  val prioritySampleSql: String = s"""
    WITH pr AS (
      SELECT doc_id, n_chars,
             CAST(n_chars AS DOUBLE) * CAST(1048576 AS DOUBLE)
               / CAST((${Extensions.fingerprintExprSqlOn("CAST(doc_id AS VARCHAR)")}
                        * ${Sampling.mixC}) % 1048576 + 1 AS DOUBLE) AS graft_pr
      FROM documents),
    top AS (SELECT * FROM pr ORDER BY graft_pr DESC, doc_id LIMIT ${prioK + 1}),
    tau AS (SELECT min(graft_pr) AS t FROM top)
    SELECT doc_id, n_chars AS w,
           greatest(CAST(n_chars AS DOUBLE), t) AS est_w
    FROM top, tau
    WHERE graft_pr > t"""

  // --- q185: per-language weighted sample ------------------------------------

  /** Per-stratum sample size: small enough that every language keeps only
    * a fraction of its docs at both gate SFs (the window actually cuts). */
  val gwsK: Int = 15

  /** q185: weighted top-k WITHIN each language — the per-stratum companion
    * of q184 ([[Sampling.groupPrioritySample]]): every language gets its
    * own k-row budget, filled weight-proportionally (long docs favored) by
    * the same hash-derived priorities. The plan is the 100 TB shape for
    * grouped selection: a PARTIAL WindowGroupLimit below the exchange, so
    * each scan partition forwards ≤ k rows per language, never the corpus. */
  def groupWeightedSample(s: SparkSession, d: String): DataFrame =
    Sampling.groupPrioritySample(Tables.documents(s, d),
      strataCol = "lang", keyCol = "doc_id", weightCol = "n_chars", k = gwsK)

  val groupWeightedSampleSql: String = s"""
    WITH pr AS (
      SELECT lang, doc_id, n_chars,
             CAST(n_chars AS DOUBLE) * CAST(1048576 AS DOUBLE)
               / CAST((${Extensions.fingerprintExprSqlOn("CAST(doc_id AS VARCHAR)")}
                        * ${Sampling.mixC}) % 1048576 + 1 AS DOUBLE) AS graft_pr
      FROM documents),
    r AS (SELECT lang, doc_id, n_chars,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY graft_pr DESC, doc_id) AS rn
          FROM pr)
    SELECT lang, doc_id, n_chars FROM r WHERE rn <= $gwsK"""

  // --- q62: TF-IDF top terms per document ----------------------------------

  /** Top-3 terms per document by a RATIONAL tf-idf: score = tf · N / df,
    * computed as one IEEE double division of exact integers (tf·N < 2^53),
    * so both engines produce bit-identical scores — the reason this uses a
    * linear rarity weight instead of the textbook log idf (libm log is not
    * contractually identical across engines; the RANKING this produces is
    * identical to 1/df-weighted tf either way). Ties break on term asc.
    *
    * Scale shape: tf is one shuffle on (doc_id, term); df is one shuffle on
    * term; the df join shuffles on term (AQE broadcasts it when the
    * vocabulary is small — it is NOT hinted broadcast, a 100 TB corpus
    * vocabulary outgrows the driver); N attaches as a broadcast 1-row
    * cross join; the final rank windows on doc_id (high-cardinality). */
  def tfidfTopTerms(s: SparkSession, d: String): DataFrame =
    tfidfTopTermsOn(Tables.documents(s, d))

  def tfidfTopTermsOn(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", (col("tf") * col("n_docs")).cast("double") / col("df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"), col("rank"))
  }

  val tfidfTopTermsSql: String = s"""
    WITH tf AS (SELECT doc_id, token AS term, count(*) AS tf
                FROM (SELECT doc_id, unnest(${Extensions.toksSql}) AS token
                      FROM documents)
                GROUP BY doc_id, token),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, term, tf, df, tfidf, rank FROM (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
             CAST(tf.tf * n.n_docs AS DOUBLE) / dfreq.df AS tfidf,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY CAST(tf.tf * n.n_docs AS DOUBLE) / dfreq.df DESC,
                                         tf.term) AS rank
      FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n)
    WHERE rank <= 3"""

  // --- q63: vocabulary build -----------------------------------------------

  /** Top-100 vocabulary by corpus term frequency (ties → term asc), with
    * document frequency — the vocabulary-building pass of a tokenizer
    * trainer. The top-k is TakeOrderedAndProject (per-partition heaps, no
    * global sort); only then does a row_number window run, over the ≤ 100
    * survivors in one tiny partition. */
  def vocabTopN(s: SparkSession, d: String): DataFrame = {
    val agg = Tables.documents(s, d)
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("tf_total"), count_distinct(col("doc_id")).as("df"))
      .orderBy(col("tf_total").desc, col("term"))
      .limit(100)
    agg.withColumn("rank",
      row_number().over(Window.orderBy(col("tf_total").desc, col("term"))))
  }

  val vocabTopNSql: String = s"""
    SELECT term, tf_total, df, rank FROM (
      SELECT term, tf_total, df,
             row_number() OVER (ORDER BY tf_total DESC, term) AS rank
      FROM (SELECT token AS term, count(*) AS tf_total,
                   count(DISTINCT doc_id) AS df
            FROM (SELECT doc_id, unnest(${Extensions.toksSql}) AS token
                  FROM documents)
            GROUP BY token))
    WHERE rank <= 100"""

  // --- q64: pattern redaction ----------------------------------------------

  /** PII-shaped scrubbing plumbing: mask every digit run in a column and
    * count the masked runs (the audit trail). The testdata carries no real
    * PII, so the demonstration target is the customer name's numeric id —
    * the OPERATOR (pattern → mask + count, row-local, codegen'd
    * regexp_replace) is what a real pipeline points at emails/phones.
    * Character class is spelled [0-9] (not \\d): Java \\d is ASCII-only but
    * RE2/DuckDB \\d matches Unicode digits — the explicit class is the
    * spelling both engines agree on for every input. */
  def redactDigits(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey"),
      TextFunctions.maskAll(col("c_name"), "[0-9]+", "#").as("masked_name"),
      TextFunctions.maskCount(col("c_name"), "[0-9]+").as("n_masked_runs"))

  val redactDigitsSql: String = """
    SELECT c_custkey,
           regexp_replace(c_name, '[0-9]+', '#', 'g') AS masked_name,
           CAST(len(regexp_extract_all(c_name, '[0-9]+')) AS BIGINT) AS n_masked_runs
    FROM customer"""

  // --- q136: k-anonymity suppression ---------------------------------------

  /** k-anonymity enforcement over a quasi-identifier tuple — the
    * data-governance pass that follows q64's redaction in a release
    * pipeline: any (nation, segment, balance-band) combination carried by
    * fewer than [[kAnonK]] rows is SUPPRESSED (quasi-identifiers nulled),
    * because a rare combination re-identifies its members even with direct
    * identifiers masked. Rows keep flowing either way — suppression is a
    * column scrub, not a filter — with an explicit audit flag.
    *
    * The balance band is floor(acctbal / 2000): one IEEE division and a
    * no-tie floor, exact cross-engine (and floor's toward-negative-infinity
    * rounding keeps negative balances in their own bands in both engines).
    * Scale shape: ONE window count over the QI tuple (equivalently a
    * groupBy + broadcast-back join of the small group table); no row-level
    * data leaves its partition twice. Group sizes at the gate SFs make both
    * branches non-vacuous: sf0.01 keeps 9 rows / suppresses 1,491; sf0.1
    * keeps 14,857 / suppresses 143. */
  val kAnonK = 8

  def kAnonymize(s: SparkSession, d: String): DataFrame = {
    val band = floor(col("c_acctbal") / 2000.0).cast("long")
    val grp = Window.partitionBy(col("c_nationkey"), col("c_mktsegment"), band)
    Tables.customer(s, d)
      .withColumn("grp_n", count(lit(1)).over(grp))
      .select(
        col("c_custkey"),
        when(col("grp_n") >= kAnonK, col("c_nationkey")).as("nation_out"),
        when(col("grp_n") >= kAnonK, col("c_mktsegment")).as("segment_out"),
        when(col("grp_n") >= kAnonK, band).as("bal_band_out"),
        (col("grp_n") < kAnonK).as("suppressed"))
  }

  val kAnonymizeSql: String = s"""
    SELECT c_custkey,
           CASE WHEN grp_n >= $kAnonK THEN c_nationkey END AS nation_out,
           CASE WHEN grp_n >= $kAnonK THEN c_mktsegment END AS segment_out,
           CASE WHEN grp_n >= $kAnonK THEN bal_band END AS bal_band_out,
           (grp_n < $kAnonK) AS suppressed
    FROM (SELECT c_custkey, c_nationkey, c_mktsegment, bal_band,
            count(*) OVER (PARTITION BY c_nationkey, c_mktsegment, bal_band)
              AS grp_n
          FROM (SELECT c_custkey, c_nationkey, c_mktsegment,
                  CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS bal_band
                FROM customer))"""

  // --- q154: collocation mining by lift -------------------------------------

  /** Token-pair collocations by LIFT — the no-logarithm PMI alternative
    * (PMI = log lift; ranking by lift ranks identically and keeps the
    * arithmetic exact): lift(a,b) = N · df(a,b) / (df(a) · df(b)) over
    * document-level co-occurrence, computed for pairs of the
    * [[collocVocabN]] most-frequent tokens with support ≥
    * [[collocMinSupport]] docs, top-[[collocTopK]] by (lift, support,
    * pair). The standard blow-up control is structural: tokens are
    * restricted to the top-N vocabulary BEFORE the per-doc pair join, so
    * candidates are ≤ N²/2 per doc regardless of corpus size, and only
    * (doc, token) pairs — not text — reach the join.
    *
    * Exactness: df counts are integers; lift is one integer-product
    * ratio as an IEEE division — identical cross-engine. Vocabulary
    * selection is total-ordered (count desc, token) like q63. */
  val collocVocabN = 40
  val collocMinSupport = 3
  val collocTopK = 20

  def tokenLift(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val docTok = docs.select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("tok"))
      .distinct()
    val vocab = docTok.groupBy("tok").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok")).limit(collocVocabN)
    val vt = docTok.join(broadcast(vocab), "tok")
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val pairs = vt.select(col("doc_id"), col("tok").as("tok_a"), col("df").as("df_a"))
      .join(vt.select(col("doc_id"), col("tok").as("tok_b"), col("df").as("df_b")),
        Seq("doc_id"))
      .filter(col("tok_a") < col("tok_b"))
      .groupBy("tok_a", "tok_b")
      .agg(count(lit(1)).as("df_ab"),
        first(col("df_a")).as("df_a"), first(col("df_b")).as("df_b"))
      .filter(col("df_ab") >= collocMinSupport)
    val w = Window.orderBy(col("lift").desc, col("df_ab").desc,
      col("tok_a"), col("tok_b"))
    pairs.crossJoin(broadcast(nDocs))
      .withColumn("lift",
        (col("n_docs") * col("df_ab")).cast("double") /
          (col("df_a") * col("df_b")).cast("double"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= collocTopK)
      .select(col("rnk"), col("tok_a"), col("tok_b"), col("df_ab"),
        col("df_a"), col("df_b"), col("lift"))
  }

  val tokenLiftSql: String = s"""
    WITH dt AS (
      SELECT DISTINCT doc_id, unnest(${Extensions.toksSql}) AS tok FROM documents),
    vocab AS (
      SELECT tok, count(*) AS df FROM dt GROUP BY 1
      ORDER BY df DESC, tok LIMIT $collocVocabN),
    vt AS (SELECT dt.doc_id, dt.tok, vocab.df FROM dt JOIN vocab USING (tok)),
    pairs AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS df_ab,
             first(a.df) AS df_a, first(b.df) AS df_b
      FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY 1, 2
      HAVING count(*) >= $collocMinSupport),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT rnk, tok_a, tok_b, df_ab, df_a, df_b, lift FROM (
      SELECT CAST(row_number() OVER (ORDER BY lift DESC, df_ab DESC,
                                     tok_a, tok_b) AS BIGINT) AS rnk,
             tok_a, tok_b, df_ab, df_a, df_b, lift
      FROM (SELECT tok_a, tok_b, df_ab, df_a, df_b,
              CAST(n_docs * df_ab AS DOUBLE)
                / CAST(df_a * df_b AS DOUBLE) AS lift
            FROM pairs CROSS JOIN n))
    WHERE rnk <= $collocTopK"""

  // --- q158: per-source quality scorecard -----------------------------------

  /** The per-vendor scorecard a data-acquisition team reviews: for each
    * source, document count, q65 keep-rate, mean quality score
    * (quantized-exact), and the count of q144-style encoding-damaged docs
    * (replacement chars or control leaks). One row-local projection
    * computes all verdicts, one map-side-combined aggregate on the
    * low-cardinality source key — scan-once, shuffle-once at any corpus
    * size. Rates are single IEEE divisions of exact counts. */
  def sourceScorecard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val routed = qualityRouteOn(docs)
      .select(col("doc_id"), col("quality"), (col("verdict") === "keep").as("keep"))
    val damaged = graft.queries.Extensions.encodingAuditOn(docs)
      .select(col("doc_id"),
        (col("n_replacement") > 0 || col("n_control") > 0).as("damaged"))
    docs.select(col("doc_id"), col("source"))
      .join(routed, "doc_id").join(damaged, "doc_id")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("keep"), lit(1))).as("n_keep"),
        (count(when(col("keep"), lit(1))).cast("double") /
          count(lit(1)).cast("double")).as("keep_rate"),
        try_divide(Exact.dsum(col("quality"), 6), count(col("quality")))
          .as("mean_quality"),
        count(when(col("damaged"), lit(1))).as("n_encoding_damaged"))
  }

  /** lazy: this val sits ABOVE qualityRouteSql in declaration order, and
    * a strict init would interpolate "null" (the q134-documented
    * cross-val init-cycle class, caught by the oracle parser). */
  lazy val sourceScorecardSql: String = s"""
    WITH routed AS (SELECT doc_id, quality, (verdict = 'keep') AS keep
                    FROM ($qualityRouteSql)),
    dmg AS (SELECT doc_id,
              ((length(text) - length(regexp_replace(text, '[�]', '', 'g'))) > 0
               OR (length(text) - length(regexp_replace(text,
                     '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', '', 'g'))) > 0) AS damaged
            FROM documents)
    SELECT source, count(*) AS n_docs,
           count(CASE WHEN keep THEN 1 END) AS n_keep,
           CAST(count(CASE WHEN keep THEN 1 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS keep_rate,
           ${Exact.dsumSql("quality", 6)} / count(quality) AS mean_quality,
           count(CASE WHEN damaged THEN 1 END) AS n_encoding_damaged
    FROM documents
    JOIN routed USING (doc_id) JOIN dmg USING (doc_id)
    GROUP BY source"""

  // --- q65: quality routing ------------------------------------------------

  /** First-failing-rule quality router — the corpus-level twin of the
    * reference's error-classification cascade
    * (/root/reference/src/main/scala/es/dmr/uimp/realtime/InvoicePipeline.scala:175-186
    * routes each invoice to the FIRST matching error class): each document
    * gets exactly one verdict, rules checked in fixed priority order
    * (too_short → too_long → low_quality → keep). Cut points chosen to
    * exercise every branch on the fixture (n_tokens spans 10..99, quality
    * spans 0..~0.2). All comparisons are on exact cross-engine values. */
  val minTokens = 15
  val maxTokens = 90
  val minQuality = 0.02

  def qualityRoute(s: SparkSession, d: String): DataFrame =
    qualityRouteOn(Tables.documents(s, d))

  def qualityRouteOn(docs: DataFrame): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    docs
      .select(col("doc_id"), size(toks).cast("long").as("n_tokens"),
        TextFunctions.qualityScore(col("text")).as("quality"))
      .withColumn("verdict",
        when(col("n_tokens") < minTokens, lit("too_short"))
          .when(col("n_tokens") > maxTokens, lit("too_long"))
          .when(col("quality") < minQuality, lit("low_quality"))
          .otherwise(lit("keep")))
  }

  val qualityRouteSql: String = s"""
    SELECT doc_id, n_tokens, quality,
           CASE WHEN n_tokens < $minTokens THEN 'too_short'
                WHEN n_tokens > $maxTokens THEN 'too_long'
                WHEN quality < $minQuality THEN 'low_quality'
                ELSE 'keep' END AS verdict
    FROM (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(toks, t -> t IN (${Extensions.enStops}))) AS DOUBLE)
            / NULLIF(CAST(len(toks) AS DOUBLE), 0.0)
          - CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
            / NULLIF(CAST(length(text) AS DOUBLE), 0.0)
          - CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
            / NULLIF(CAST(length(text) AS DOUBLE), 0.0) AS quality
      FROM (SELECT doc_id, text, ${Extensions.toksSql} AS toks FROM documents))"""

  // --- q67: per-source cap -------------------------------------------------

  /** Training-mix source capping: keep at most `sourceCapK` documents per
    * source, chosen by content-hash priority (bucket asc, doc_id as the
    * tie-break) — so WHICH docs survive the cap is reproducible and
    * duplicate-stable, not ingest-order-dependent.
    *
    * Runs on [[graft.operators.Selection.capPerGroup]] — distributed
    * two-pass selection, NOT a `row_number` window partitioned on the
    * low-cardinality source (which would full-sort the corpus at
    * parallelism |sources|; until round 6 this query carried exactly that
    * documented scale caveat). The output is row-identical to the window
    * form (CurationSpec asserts it on a skewed fixture); the oracle is
    * unchanged. */
  val sourceCapK = 10

  def sourceCap(s: SparkSession, d: String): DataFrame =
    graft.operators.Selection.capPerGroup(
      Tables.documents(s, d)
        .withColumn("bucket", Sampling.pctBucket(col("text")))
        .select(col("doc_id"), col("source"), col("bucket")),
      groupCol = "source", bucketCol = "bucket", idCol = "doc_id",
      k = sourceCapK)
      .select(col("doc_id"), col("source"), col("bucket"), col("keep_rank"))

  val sourceCapSql: String = s"""
    SELECT doc_id, source, bucket, keep_rank FROM (
      SELECT doc_id, source, bucket,
             row_number() OVER (PARTITION BY source
                                ORDER BY bucket, doc_id) AS keep_rank
      FROM (SELECT doc_id, source,
                   ${Extensions.fingerprintExprSql} % 100 AS bucket
            FROM documents))
    WHERE keep_rank <= $sourceCapK"""

  // --- q68: repetition / boilerplate stats ---------------------------------

  /** Within-document repetition: total vs distinct word-3-grams and the
    * repetition ratio 1 − distinct/total — the boilerplate signal corpus
    * filters cut on (a high ratio means the document repeats itself).
    * Row-local array arithmetic, no shuffle; ratio is one IEEE division +
    * subtraction of exact ints, so both engines agree bitwise. Docs with
    * fewer than 3 tokens have no 3-grams → NULL ratio (explicit on both
    * sides). */
  def repetitionStats(s: SparkSession, d: String): DataFrame =
    repetitionStatsOn(Tables.documents(s, d))

  def repetitionStatsOn(docs: DataFrame): DataFrame = {
    val ngrams = TextFunctions.wordNgrams(TextFunctions.tokens(col("text")), 3)
    docs.select(
      col("doc_id"),
      TextFunctions.bindOnce(ngrams) { ng =>
        struct(
          size(ng).cast("long").as("n_ngrams"),
          size(array_distinct(ng)).cast("long").as("n_distinct_ngrams"))
      }.as("s"))
      .select(col("doc_id"), col("s.n_ngrams").as("n_ngrams"),
        col("s.n_distinct_ngrams").as("n_distinct_ngrams"))
      .withColumn("rep_ratio",
        lit(1.0) - col("n_distinct_ngrams").cast("double") /
          nullif(col("n_ngrams").cast("double"), lit(0.0)))
  }

  val repetitionStatsSql: String = s"""
    SELECT doc_id, n_ngrams, n_distinct_ngrams,
           1.0 - CAST(n_distinct_ngrams AS DOUBLE)
                 / NULLIF(CAST(n_ngrams AS DOUBLE), 0.0) AS rep_ratio
    FROM (
      SELECT doc_id,
             CAST(len(ng) AS BIGINT) AS n_ngrams,
             CAST(len(list_distinct(ng)) AS BIGINT) AS n_distinct_ngrams
      FROM (SELECT doc_id,
              CASE WHEN len(toks) < 3 THEN []
                   ELSE list_transform(range(len(toks) - 2),
                          i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
              END AS ng
            FROM (SELECT doc_id, ${Extensions.toksSql} AS toks FROM documents)))"""

  // --- q69: benchmark decontamination --------------------------------------

  /** Test-set decontamination: flag corpus documents sharing ≥ `decontMinShared`
    * distinct word-3-grams with any probe (benchmark) document. The probe
    * set here is the deterministic doc_id % 97 == 0 slice standing in for
    * an external benchmark suite. Inverted-index shape — explode distinct
    * grams, equi-join on the gram, count per (doc, probe) — the same
    * candidate-bounding pattern as the LSH dedup: nothing is all-pairs.
    * At 100 TB the real parameter is 13-grams (collisions become
    * near-impossible and the gram join carries no hot keys); 3-grams fit
    * this fixture's ~50-token documents. */
  val decontMinShared = 2

  def decontaminate(s: SparkSession, d: String): DataFrame =
    decontaminateOn(Tables.documentsSpread(s, d))

  def decontaminateOn(docs: DataFrame): DataFrame = {
    val grams = docs
      .select(col("doc_id"),
        explode(array_distinct(
          TextFunctions.wordNgrams(TextFunctions.tokens(col("text")), 3))).as("g"))
    val probes = grams.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("probe_id"), col("g"))
    val corpus = grams.filter(col("doc_id") % 97 =!= 0)
    corpus.join(probes, "g")
      .groupBy(col("doc_id"), col("probe_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= decontMinShared)
  }

  val decontaminateSql: String = s"""
    WITH t AS (SELECT doc_id, ${Extensions.toksSql} AS toks FROM documents),
    sh AS (SELECT doc_id,
             list_distinct(list_transform(range(len(toks) - 2),
               i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS sh
           FROM t WHERE len(toks) >= 3),
    inv AS (SELECT doc_id, unnest(sh) AS g FROM sh),
    probes AS (SELECT doc_id AS probe_id, g FROM inv WHERE doc_id % 97 = 0),
    corpus AS (SELECT doc_id, g FROM inv WHERE doc_id % 97 <> 0)
    SELECT c.doc_id, p.probe_id, count(*) AS n_shared
    FROM corpus c JOIN probes p ON c.g = p.g
    GROUP BY c.doc_id, p.probe_id
    HAVING count(*) >= $decontMinShared"""

  // --- q123: bloom-accelerated decontamination ------------------------------

  /** q123: q69's decontamination with a Bloom prefilter on the gram
    * stream — the production shape of the benchmark-membership check. The
    * probe (benchmark) gram set is tiny and fixed; its fingerprints build
    * an 8 KB filter, and every corpus gram is screened ROW-LOCALLY
    * (codegen predicate on the exploded stream) before the inverted-index
    * join, so at 100 TB the join's shuffle carries only grams that might
    * be benchmark grams instead of the whole corpus. False positives die
    * in the exact gram join, so the sketch is invisible: the oracle is
    * q69's, verbatim (the q115 reduction law applied to decontamination).
    * Honest scale note: at the gate SFs the screen's per-gram hashing
    * costs more than the tiny join it saves (q123 benches ~3 s vs q69's
    * ~0.7 s at sf0.1) — the trade only pays when the corpus-side shuffle
    * dominates, which is exactly the 100 TB regime it exists for. */
  def decontaminateBloom(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Bloom
    val grams = Tables.documentsSpread(s, d)
      .select(col("doc_id"),
        explode(array_distinct(
          TextFunctions.wordNgrams(TextFunctions.tokens(col("text")), 3))).as("g"))
    val probes = grams.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("probe_id"), col("g"))
    val bf = Bloom.build(probes, TextFunctions.fingerprint(col("g")))
    grams.filter(col("doc_id") % 97 =!= 0)
      // fingerprint lands in its own projection so the per-gram string
      // walk runs ONCE; the k positions then hash the resulting BIGINT
      .withColumn("__fp", TextFunctions.fingerprint(col("g")))
      .filter(Bloom.mightContain(col("__fp"), bf))
      .drop("__fp")
      .join(probes, "g")
      .groupBy(col("doc_id"), col("probe_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= decontMinShared)
  }

  // --- q72: context-window sequence packing --------------------------------

  /** Concat-and-chunk sequence packing — the layout pass a pretraining
    * pipeline runs before tokenized shards are written: documents are
    * concatenated in a reproducible order and split into fixed
    * `packSeqLen`-token context windows. Emits, per document, its token
    * offset in the packed stream and which sequences it lands in
    * (first/last/how many it straddles).
    *
    * Packing is PER SOURCE SHARD (window partitioned by source), which is
    * how it runs at 100 TB: each shard's prefix sum is an independent
    * window over a high-cardinality partition key, so shards pack in
    * parallel and no global single-partition window exists. A globally
    * contiguous stream needs one extra two-pass offset join (per-shard
    * totals → exclusive shard base offsets, broadcast back) — the shape is
    * documented here and deliberately not folded into the gate query.
    *
    * All arithmetic is exact: offsets are bigint prefix sums; the
    * sequence-index floor divides are IEEE doubles of integers < 2^53.
    *
    * Zero-token documents are dropped BEFORE packing (identically in both
    * engines): they contribute nothing to the packed stream and would
    * otherwise emit last_seq < first_seq / n_seqs = 0 rows, breaking the
    * n_seqs >= 1 invariant downstream consumers rely on. Dropping them
    * does not move any offset — they add 0 to every prefix sum. */
  val packSeqLen = 256

  def packSequences(s: SparkSession, d: String): DataFrame =
    packSequencesOn(Tables.documents(s, d))

  def packSequencesOn(docs: DataFrame): DataFrame = {
    val prior = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"), col("source"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= 1L)
      .withColumn("start_off",
        coalesce(sum(col("n_tokens")).over(prior), lit(0L)))
      .withColumn("first_seq", floor(col("start_off") / lit(packSeqLen.toDouble)))
      .withColumn("last_seq",
        floor((col("start_off") + col("n_tokens") - 1) / lit(packSeqLen.toDouble)))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + lit(1L))
  }

  val packSequencesSql: String = s"""
    SELECT doc_id, source, n_tokens, start_off, first_seq, last_seq,
           last_seq - first_seq + 1 AS n_seqs
    FROM (
      SELECT doc_id, source, n_tokens, start_off,
             CAST(floor(start_off / $packSeqLen.0) AS BIGINT) AS first_seq,
             CAST(floor((start_off + n_tokens - 1) / $packSeqLen.0) AS BIGINT) AS last_seq
      FROM (
        SELECT doc_id, source, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
        FROM (SELECT doc_id, source,
                     CAST(len(${Extensions.toksSql}) AS BIGINT) AS n_tokens
              FROM documents)
        WHERE n_tokens >= 1))"""

  // --- q73: overlapping token-window chunking ------------------------------

  /** Sliding-window chunking (RAG / long-context splitting): each document
    * becomes ceil((n − size) / stride) + 1 chunks of up to `chunkSize`
    * tokens starting every `chunkStride` tokens, so consecutive chunks
    * overlap by size − stride tokens and every token is covered. Documents
    * at or under the chunk size stay whole (exactly one chunk).
    *
    * Row-local explode of a bounded integer sequence — no shuffle at all;
    * output size is input tokens × (size/stride) amortized. Integer
    * arithmetic only, exact on both engines.
    *
    * Zero-token documents are dropped (identically in both engines): a
    * 0-token doc would otherwise emit one chunk_len = 0 row, breaking the
    * chunk_len >= 1 invariant a retrieval indexer relies on. */
  val chunkSize = 64
  val chunkStride = 48

  def chunkWindows(s: SparkSession, d: String): DataFrame =
    chunkWindowsOn(Tables.documents(s, d))

  def chunkWindowsOn(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= 1L)
      .withColumn("n_chunks",
        when(col("n_tokens") <= chunkSize, lit(1L))
          .otherwise(floor((col("n_tokens") - chunkSize + (chunkStride - 1))
            / lit(chunkStride.toDouble)) + lit(1L)))
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .withColumn("start_tok", col("chunk_idx") * chunkStride)
      .withColumn("chunk_len",
        least(lit(chunkSize.toLong), col("n_tokens") - col("start_tok")))

  val chunkWindowsSql: String = s"""
    SELECT doc_id, n_tokens, chunk_idx,
           chunk_idx * $chunkStride AS start_tok,
           least($chunkSize, n_tokens - chunk_idx * $chunkStride) AS chunk_len
    FROM (
      SELECT doc_id, n_tokens,
             unnest(range(CASE WHEN n_tokens <= $chunkSize THEN 1
               ELSE CAST(floor((n_tokens - $chunkSize + ${chunkStride - 1})
                               / $chunkStride.0) AS BIGINT) + 1 END)) AS chunk_idx
      FROM (SELECT doc_id, CAST(len(${Extensions.toksSql}) AS BIGINT) AS n_tokens
            FROM documents)
      WHERE n_tokens >= 1)"""

  // --- q74: mean-token-rarity document scoring -----------------------------

  /** Unigram-LM-flavored quality signal: each document scored by the MEAN
    * CORPUS FREQUENCY of its tokens — the float-safe stand-in for mean
    * token log-probability (same ranking as an add-nothing unigram LM;
    * libm log is not contractually identical across engines, so the score
    * stays a single IEEE division of exact integer sums, the q62 rule).
    * Low mean frequency = rare-token-heavy document, the tail a frequency
    * filter inspects.
    *
    * Scale shape: per-doc tf is one shuffle on (doc_id, term); corpus tf
    * re-aggregates tf on term (map-side combined); the term join is
    * AQE-broadcastable when the vocabulary is small and shuffles on term
    * when it is not; the final per-doc rollup shuffles on doc_id. Nothing
    * is all-pairs, no driver-side state. */
  def tokenRarity(s: SparkSession, d: String): DataFrame =
    tokenRarityOn(Tables.documents(s, d))

  def tokenRarityOn(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val ctf = tf.groupBy(col("term")).agg(sum(col("tf")).as("corpus_tf"))
    tf.join(ctf, "term")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("corpus_tf")).as("sum_corpus_tf"))
      .withColumn("mean_corpus_tf",
        col("sum_corpus_tf").cast("double") / col("n_tokens"))
  }

  val tokenRaritySql: String = s"""
    WITH tf AS (SELECT doc_id, token AS term, count(*) AS tf
                FROM (SELECT doc_id, unnest(${Extensions.toksSql}) AS token
                      FROM documents)
                GROUP BY doc_id, token),
    ctf AS (SELECT term, sum(tf) AS corpus_tf FROM tf GROUP BY term)
    SELECT doc_id, n_tokens, sum_corpus_tf,
           CAST(sum_corpus_tf AS DOUBLE) / n_tokens AS mean_corpus_tf
    FROM (SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
                 CAST(sum(tf.tf * ctf.corpus_tf) AS BIGINT) AS sum_corpus_tf
          FROM tf JOIN ctf ON tf.term = ctf.term
          GROUP BY tf.doc_id)"""

  // --- q75: BPE round-1 pair statistics ------------------------------------

  /** The first BPE training round's statistics, corpus-wide: adjacent
    * CHARACTER pair counts inside subword pre-tokens (letter/digit runs —
    * single-mark subtokens have no pairs), top 50 with deterministic ties
    * (count desc, pair asc). This is the SQL-expressible face of
    * [[graft.operators.Bpe]] — the full iterative trainer is verified in
    * BpeSpec (DuckDB cannot run the merge loop).
    *
    * Scale shape: explode to (pair) then one map-side-combined count
    * shuffle on pair (alphabet², tiny); top-50 is TakeOrderedAndProject;
    * the rank window runs over ≤ 50 survivors in one partition — the q63
    * vocabulary pattern. */
  val bpeTopK = 50

  def bpeTopPairs(s: SparkSession, d: String): DataFrame = {
    val agg = Tables.documents(s, d)
      .select(explode(TextFunctions.subtokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(bpeTopK)
    agg.withColumn("rank",
      row_number().over(Window.orderBy(col("cnt").desc, col("pair"))))
  }

  val bpeTopPairsSql: String = s"""
    SELECT pair, cnt, rank FROM (
      SELECT pair, cnt,
             row_number() OVER (ORDER BY cnt DESC, pair) AS rank
      FROM (SELECT pair, count(*) AS cnt
            FROM (SELECT unnest(list_transform(range(1, length(w)),
                                               i -> substr(w, i, 2))) AS pair
                  FROM (SELECT unnest(regexp_extract_all(text,
                          '${TextFunctions.subtokenPattern}')) AS w
                        FROM documents)
                  WHERE length(w) >= 2)
            GROUP BY pair))
    WHERE rank <= $bpeTopK"""

  // --- q167: apply the trained BPE tokenizer corpus-wide ---------------------

  /** q167: ENCODE the corpus with the committed BPE merge table
    * ([[graft.ml.PinnedBpeMerges]], trained once by PinBpeMain — the
    * pinned-quantizer discipline applied to the tokenizer) and report the
    * encoded-token vocabulary: top 100 subword tokens by exact corpus
    * count, deterministic ties. q75 gates the TRAINER's statistics; this
    * gates the other half — what a training-data pipeline actually runs at
    * 100 TB, tokenizing every document with a fixed vocabulary.
    *
    * Scale shape: the encoder ([[graft.operators.Bpe.encodeTokens]]) is a
    * row-local wrap → 24 literal replaces → split chain, whole-stage
    * codegen, zero shuffle; the only exchange is the vocab groupBy
    * (map-side combined, key space = the learned vocabulary); top-100 is
    * TakeOrderedAndProject and the rank window runs over 100 survivors.
    * The oracle replays the identical replace chain in DuckDB — engine and
    * oracle compute the segmentation, not just compare counts. */
  val bpeEncodeTopK = 100

  /** The encode + vocabulary-count stage on ANY document frame — shared
    * by the batch gate (q167) and the streaming replay (q179): encoding
    * is stateless row-local work and the count is a streamable
    * aggregate, so the same plan runs under both engines' execution. */
  def bpeTokenCountsOn(docs: DataFrame): DataFrame = {
    val merges = graft.ml.PinnedBpeMerges.values
    docs
      .select(explode(
        regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+"), lit(0))).as("w"))
      .select(explode(graft.operators.Bpe.encodeTokens(col("w"), merges)).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Top-k + rank presentation over a token-count table (batch-side). */
  private[queries] def bpeVocabRank(counts: DataFrame): DataFrame =
    counts
      .orderBy(col("cnt").desc, col("token"))
      .limit(bpeEncodeTopK)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("token"))))

  def bpeEncodeVocab(s: SparkSession, d: String): DataFrame =
    bpeVocabRank(bpeTokenCountsOn(Tables.documentsSpread(s, d)))

  /** q179: the BPE encoder under STREAMING execution — the q147
    * discipline applied to the tokenizer: the documents table replays
    * through `readStream` one file per trigger (4 real micro-batches),
    * the SAME [[bpeTokenCountsOn]] plan runs in complete mode (row-local
    * encode + partial aggregation + state-store merge per batch), and
    * the final vocabulary must hash-match q167's batch oracle VERBATIM —
    * token counts are batching-independent by construction, which is
    * exactly what this row gates. The top-100 rank is computed
    * batch-side from the streamed count table (rank windows don't run
    * inside streaming queries; the heavy corpus path — tokenize, encode,
    * count — all executed under the streaming engine). */
  private val bpeGateRuns = new java.util.concurrent.atomic.AtomicInteger(0)
  private val bpeReplayLock = new Object

  def bpeStreamingGate(s: SparkSession, d: String): DataFrame = {
    val name = s"graft_bpe_gate_${bpeGateRuns.incrementAndGet()}"
    val dir = graft.queries.Extensions.indexCacheDir(
      "graft-docs-replay", d, "documents", "files4b1")
    bpeReplayLock.synchronized {
      if (!new java.io.File(s"$dir/_SUCCESS").exists())
        Tables.documents(s, d).repartition(4, col("doc_id"))
          .write.mode("overwrite").parquet(dir)
    }
    val schema = Tables.documents(s, d).schema
    Extensions.withStatePartitions(s) {
      val src = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(dir)
      val q = bpeTokenCountsOn(src)
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      Extensions.awaitBounded(q, name)
    }
    bpeVocabRank(s.table(name))
  }

  lazy val bpeEncodeVocabSql: String = s"""
    SELECT token, cnt, rank FROM (
      SELECT token, cnt,
             row_number() OVER (ORDER BY cnt DESC, token) AS rank
      FROM (SELECT token, count(*) AS cnt
            FROM (SELECT unnest(${graft.operators.Bpe.encodeTokensSql(
                    "w", graft.ml.PinnedBpeMerges.values)}) AS token
                  FROM (SELECT unnest(regexp_extract_all(text,
                          '[A-Za-z]+|[0-9]+')) AS w
                        FROM documents))
            GROUP BY token))
    WHERE rank <= $bpeEncodeTopK"""

  // --- q77: bigram language-model counts ------------------------------------

  /** Bigram LM count table — the statistics pass under perplexity-based
    * quality filtering (a data pipeline scores documents with an n-gram LM
    * before the expensive model ever sees them; this builds that LM's
    * numerator/denominator). Emits the top `bigramTopK` bigrams with exact
    * corpus counts, the head count (denominator: occurrences of w1 as a
    * bigram head), and the MLE conditional probability as ONE IEEE division
    * of the two exact integers (the q62 float rule — no libm log in the
    * gate; a consumer takes log at read time).
    *
    * Scale shape: token explode → one map-side-combined count shuffle on
    * (w1, w2); the head-count window runs over the AGGREGATED bigram table
    * (vocabulary-bounded, not corpus-bounded) partitioned on w1 — high
    * cardinality, no single-partition window; top-k is
    * TakeOrderedAndProject with a total-order tie-break. */
  val bigramTopK = 200

  def bigramLm(s: SparkSession, d: String): DataFrame =
    bigramLmOn(Tables.documents(s, d))

  /** Bigram-per-row array of a token column: struct(w1, w2) for each
    * adjacent pair; empty for docs under two tokens. */
  private def bigramArray(text: org.apache.spark.sql.Column) =
    TextFunctions.bindOnce(TextFunctions.tokens(text)) { toks =>
      when(size(toks) < 2, array().cast("array<struct<w1:string,w2:string>>"))
        .otherwise(transform(sequence(lit(0), size(toks) - 2), i =>
          struct(element_at(toks, i + 1).as("w1"),
            element_at(toks, i + 2).as("w2"))))
    }

  /** Full LM count table over a corpus: exact (w1, w2) counts + head counts.
    * The head-count window runs over the AGGREGATED, vocabulary-bounded
    * bigram table partitioned on w1 — never over corpus-sized data. */
  private def bigramLmTable(docs: DataFrame): DataFrame =
    docs.select(explode(bigramArray(col("text"))).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("w1_cnt", sum(col("cnt")).over(Window.partitionBy("w1")))

  def bigramLmOn(docs: DataFrame): DataFrame =
    bigramLmTable(docs)
      .withColumn("p_mle",
        col("cnt").cast("double") / col("w1_cnt").cast("double"))
      .orderBy(desc("cnt"), asc("w1"), asc("w2"))
      .limit(bigramTopK)

  val bigramLmSql: String = s"""
    SELECT w1, w2, cnt, w1_cnt, CAST(cnt AS DOUBLE) / CAST(w1_cnt AS DOUBLE) AS p_mle
    FROM (
      SELECT w1, w2, cnt, CAST(sum(cnt) OVER (PARTITION BY w1) AS BIGINT) AS w1_cnt
      FROM (
        SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS cnt
        FROM (SELECT unnest(list_transform(range(len(toks) - 1),
                i -> struct_pack(w1 := toks[i+1], w2 := toks[i+2]))) AS p
              FROM (SELECT ${Extensions.toksSql} AS toks FROM documents)
              WHERE len(toks) >= 2)
        GROUP BY 1, 2))
    ORDER BY cnt DESC, w1, w2 LIMIT $bigramTopK"""

  // --- q82: LM quality filter (the consumer of q77's statistics) -----------

  /** Docs with doc_id % [[lmHoldoutMod]] == 0 are held out of LM training,
    * so scoring them produces genuine out-of-vocabulary bigrams. */
  val lmHoldoutMod = 10

  /** Perplexity-style quality score of EVERY document against the bigram LM
    * trained on the non-held-out corpus — the filter q77's count table
    * exists for. Per doc: bigram count, OOV-bigram count and rate, and the
    * min / mean MLE conditional probability over in-vocabulary bigrams.
    *
    * Gate-safe float discipline: each p is ONE IEEE division of two exact
    * integers (cnt / w1_cnt); min is an element pick; the mean is a
    * floor-quantized exact sum divided once (order-independent at any
    * parallelism — no libm log; a consumer takes -log of mean_p at read
    * time to get cross-entropy). try_divide NULLs the ratios for
    * zero-bigram / all-OOV docs, matching DuckDB's NULL-on-zero division.
    *
    * Scale shape: token explode, one map-side-combined count shuffle on
    * (w1, w2) for the LM, a (w1, w2)-keyed equi-join of doc-bigrams against
    * the LM (both sides shuffle on the bigram key; candidates are bounded
    * by the join key, nothing quadratic), and one per-doc aggregate.
    * explode_outer keeps zero-bigram docs in the output without a second
    * documents join. */
  def lmQualityScore(s: SparkSession, d: String): DataFrame =
    lmQualityScoreOn(Tables.documents(s, d))

  def lmQualityScoreOn(docs: DataFrame): DataFrame = {
    val lm = bigramLmTable(docs.filter(col("doc_id") % lmHoldoutMod =!= 0))
    docs.select(col("doc_id"), explode_outer(bigramArray(col("text"))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .join(lm, Seq("w1", "w2"), "left")
      .withColumn("p", col("cnt").cast("double") / col("w1_cnt").cast("double"))
      .groupBy("doc_id")
      .agg(
        count(col("w1")).as("n_bigrams"),
        count(when(col("w1").isNotNull && col("cnt").isNull, lit(1))).as("n_oov"),
        min(col("p")).as("min_p"),
        try_divide(Exact.dsum(col("p"), 6), count(col("p"))).as("mean_p"))
      .withColumn("oov_rate",
        try_divide(col("n_oov").cast("double"), col("n_bigrams").cast("double")))
      .select("doc_id", "n_bigrams", "n_oov", "oov_rate", "min_p", "mean_p")
  }

  val lmQualitySql: String = s"""
    WITH pairs AS (
      SELECT doc_id, p.w1 AS w1, p.w2 AS w2
      FROM (SELECT doc_id, unnest(list_transform(range(len(toks) - 1),
              i -> struct_pack(w1 := toks[i+1], w2 := toks[i+2]))) AS p
            FROM (SELECT doc_id, ${Extensions.toksSql} AS toks FROM documents)
            WHERE len(toks) >= 2)),
    lm AS (
      SELECT w1, w2, cnt, CAST(sum(cnt) OVER (PARTITION BY w1) AS BIGINT) AS w1_cnt
      FROM (SELECT w1, w2, count(*) AS cnt
            FROM pairs WHERE doc_id % $lmHoldoutMod != 0 GROUP BY 1, 2)),
    scored AS (
      SELECT pairs.doc_id, lm.cnt,
             CAST(lm.cnt AS DOUBLE) / CAST(lm.w1_cnt AS DOUBLE) AS p
      FROM pairs LEFT JOIN lm ON pairs.w1 = lm.w1 AND pairs.w2 = lm.w2),
    agg AS (
      SELECT doc_id,
             count(*) AS n_bigrams,
             count(CASE WHEN cnt IS NULL THEN 1 END) AS n_oov,
             min(p) AS min_p,
             ${Exact.dsumSql("p", 6)} / count(p) AS mean_p
      FROM scored GROUP BY 1)
    SELECT d.doc_id,
           COALESCE(a.n_bigrams, 0) AS n_bigrams,
           COALESCE(a.n_oov, 0) AS n_oov,
           CAST(a.n_oov AS DOUBLE) / CAST(a.n_bigrams AS DOUBLE) AS oov_rate,
           a.min_p AS min_p,
           a.mean_p AS mean_p
    FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id"""

  // --- q83: cross-doc duplicated n-gram fraction ----------------------------

  /** Exact-substring duplication diagnostic (the signal behind
    * substring-level train-set dedup): for every document, the fraction of
    * its DISTINCT word-[[dupGramN]]-grams that also occur in at least one
    * OTHER document. q68 measures repetition WITHIN a document; this
    * measures overlap ACROSS the corpus — boilerplate headers, mirrored
    * pages, and template text light up here even when no whole-document
    * near-dup exists.
    *
    * Per-doc distinct grams make df a document frequency, so "df ≥ 2" is
    * exactly "appears in another document". The fraction is one IEEE
    * division of two exact integers (the q62 rule).
    *
    * Scale shape: the inverted-index pattern (q69) — explode per-doc
    * DISTINCT grams, ONE map-side-combined count shuffle on the gram for
    * df, an equi-join back on the gram (the df side is pre-aggregated to
    * one row per gram), and one per-doc aggregate. Nothing is all-pairs;
    * per-doc distinctness caps any document's contribution to a hot gram
    * at 1. At 100 TB the gram would be a 13-gram hash instead of a 5-gram
    * string to keep the shuffle payload narrow. */
  val dupGramN = 5

  def dupNgramFraction(s: SparkSession, d: String): DataFrame =
    dupNgramFractionOn(Tables.documentsSpread(s, d))

  def dupNgramFractionOn(docs: DataFrame): DataFrame = {
    val grams = docs.select(col("doc_id"),
      explode(array_distinct(
        TextFunctions.wordNgrams(TextFunctions.tokens(col("text")), dupGramN))).as("g"))
    val df = grams.groupBy("g").agg(count(lit(1)).as("df"))
    grams.join(df, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("df") >= 2, lit(1))).as("n_dup"))
      .withColumn("dup_frac",
        col("n_dup").cast("double") / col("n_grams").cast("double"))
  }

  val dupNgramFractionSql: String = s"""
    WITH t AS (SELECT doc_id, ${Extensions.toksSql} AS toks FROM documents),
    g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks) - ${dupGramN - 1}),
            i -> ${(0 until dupGramN).map(j => s"toks[i+${j + 1}]").mkString(" || ' ' || ")}))) AS g
          FROM t WHERE len(toks) >= $dupGramN),
    df AS (SELECT g, count(*) AS df FROM g GROUP BY 1)
    SELECT doc_id, count(*) AS n_grams,
           count(CASE WHEN df.df >= 2 THEN 1 END) AS n_dup,
           CAST(count(CASE WHEN df.df >= 2 THEN 1 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS dup_frac
    FROM g JOIN df USING (g)
    GROUP BY doc_id"""

  // --- q84: mixture resampling to a target domain distribution --------------

  /** Domain-mix rebalancing: downsample each source toward a UNIFORM target
    * share (1/S of the corpus each) — the "fix the web-crawl/books/code
    * ratio" pass of training-data assembly. A document survives iff
    *
    *   bucket/10000  <  (N/S) / n_s      (acceptance ratio of its source)
    *
    * evaluated as the all-integer cross-multiplication
    * `bucket·S·n_s < 10000·N`, so both engines decide every row with exact
    * integer arithmetic — no float ratio anywhere. Under-represented
    * sources (n_s ≤ N/S) pass whole (ratio ≥ 1); over-represented sources
    * are cut to ≈ N/S docs. The bucket is the content fingerprint mod
    * 10⁴ (q59/q61's primitive), so the sample is reproducible,
    * re-shard-stable, and duplicate-stable.
    *
    * Scale shape: one map-side-combined count per source (S rows),
    * broadcast back; the total attaches as a broadcast 1-row cross join
    * (the q62 N pattern). The data pass itself is row-local — no shuffle
    * of the corpus, ever. Overflow: bucket < 10⁴, S·n_s ≤ S·N; at 10¹²
    * docs and 100 sources the product is ~10¹⁸ < 2⁶³. */
  def domainMixSample(s: SparkSession, d: String): DataFrame =
    domainMixSampleOn(Tables.documents(s, d))

  def domainMixSampleOn(docs: DataFrame): DataFrame = {
    val b = docs.select(col("doc_id"), col("source"),
      (TextFunctions.fingerprint(col("text")) % 10000).as("bucket"))
    val counts = b.groupBy("source").agg(count(lit(1)).as("n_s"))
    val tot = counts.agg(sum("n_s").as("n_total"), count(lit(1)).as("n_sources"))
    b.join(broadcast(counts), "source")
      .crossJoin(broadcast(tot))
      .filter(col("bucket") * col("n_sources") * col("n_s") <
        lit(10000L) * col("n_total"))
      .select(col("doc_id"), col("source"), col("bucket"))
  }

  val domainMixSampleSql: String = s"""
    WITH b AS (SELECT doc_id, source,
                      ${Extensions.fingerprintExprSql} % 10000 AS bucket
               FROM documents),
    c AS (SELECT source, count(*) AS n_s FROM b GROUP BY 1),
    t AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_total,
                 count(*) AS n_sources FROM c)
    SELECT doc_id, b.source AS source, bucket
    FROM b JOIN c ON b.source = c.source CROSS JOIN t
    WHERE bucket * n_sources * n_s < 10000 * n_total"""

  // --- q85: incremental vocabulary maintenance ------------------------------

  /** Cross-run token-count maintenance, gate-shaped like q52: the corpus is
    * split into two "ingest days" by doc-id parity, day 1's token counts
    * are materialized ONCE per sf dir (the q31/q52 offline-index caching
    * pattern), and the query merges day 2's delta counts into the
    * persisted base — counts(base) ⊎ counts(delta) with a summing merge.
    * The oracle recomputes the whole-corpus counts from scratch; equality
    * is the algebraic identity that count is a commutative monoid — the
    * merged refresh IS the full answer.
    *
    * Scale shape: the refresh tokenizes ONLY the delta (cost ∝ new data,
    * not corpus size), then one summing shuffle bounded by |vocab| + |delta
    * vocab| — the incremental-materialized-aggregate pattern every corpus
    * statistics job at 100 TB needs (full retokenization of a 100 TB corpus
    * per ingest batch is the alternative). */
  private def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(explode(TextFunctions.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  private[graft] def vocabIndexDir(d: String): String =
    Extensions.indexCacheDir("graft-vocab-cache", d, "documents", "tok")

  private val vocabBuildLock = new Object

  def incrementalVocab(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val dir = vocabIndexDir(d)
    vocabBuildLock.synchronized {
      if (!new java.io.File(s"$dir/_SUCCESS").exists())
        tokenCounts(docs.filter(col("doc_id") % 2 === 0))
          .write.mode("overwrite").parquet(dir)
    }
    val base = s.read.parquet(dir)
    val delta = tokenCounts(docs.filter(col("doc_id") % 2 === 1))
    base.unionByName(delta).groupBy("token").agg(sum("cnt").as("cnt"))
  }

  val incrementalVocabSql: String = s"""
    SELECT token, count(*) AS cnt
    FROM (SELECT unnest(${Extensions.toksSql}) AS token FROM documents)
    GROUP BY 1"""

  // --- q86: heavy-hitter tokens (bounded sketch + exact verify) -------------

  /** Every token holding at least 1/[[hhFraction]] of all token
    * occurrences, with its EXACT count — the "which boilerplate tokens
    * dominate my corpus" diagnostic. Two passes:
    *
    *   1. candidates from a [[graft.operators.Selection.MisraGries]]
    *      summary (≤ [[hhSketchK]] counters per task and per merge — a
    *      100 TB token stream never materializes a vocabulary for this
    *      query, unlike the q63 full vocab build). MG guarantees any token
    *      with frequency > n/[[hhSketchK]] survives; the threshold
    *      n/[[hhFraction]] is coarser, so there are NO false negatives.
    *      The ≤ [[hhSketchK]] candidates collect to the driver — bounded
    *      metadata, the q52-index/BPE-winner precedent.
    *   2. exact counts of candidate tokens only (the isin filter prunes
    *      the second scan before its map-side combine), and the exact
    *      all-integer threshold `cnt · hhFraction ≥ n` kills false
    *      positives.
    *
    * The output is exact and sketch-independent — the sketch only decides
    * how little memory pass 1 needs — so the oracle is the plain
    * count-and-filter recompute. */
  val hhFraction = 200L
  val hhSketchK = 400

  def heavyHitters(s: SparkSession, d: String): DataFrame =
    heavyHittersOn(Tables.documents(s, d))

  def heavyHittersOn(docs: DataFrame): DataFrame = {
    val toks = docs.select(explode(TextFunctions.tokens(col("text"))).as("token"))
    val mg = udaf(new graft.operators.Selection.MisraGries(hhSketchK),
      org.apache.spark.sql.Encoders.STRING)
    val candidates = toks.agg(mg(col("token")).as("cand"))
      .head.getSeq[String](0)
    val total = toks.agg(count(lit(1)).as("n_total"))
    toks.filter(col("token").isin(candidates: _*))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * lit(hhFraction) >= col("n_total"))
      .select(col("token"), col("cnt"))
  }

  val heavyHittersSql: String = s"""
    WITH tok AS (SELECT unnest(${Extensions.toksSql}) AS token FROM documents),
    c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
    t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM c)
    SELECT token, cnt FROM c CROSS JOIN t
    WHERE cnt * $hhFraction >= n_total"""

  // --- q94: Count-Min frequency estimates, sketch vs exact ------------------

  /** Token-frequency estimates from the bounded Count-Min sketch
    * ([[graft.operators.Cms]]) for the 100 highest-frequency tokens (ties
    * → token asc), next to their exact counts: (token, cnt, est) with the
    * CMS guarantee est ≥ cnt visible in the result set and pinned by the
    * oracle, which rebuilds the SAME sketch cell-for-cell in SQL.
    *
    * Tokens hash through the shared 31-bit fingerprint fold (the q28/q59
    * cross-engine hash) before the four field-polynomial rows; fingerprint
    * collisions merge their tokens' cells, which only pushes estimates UP
    * — the one-sided bound survives, cross-engine determinism is total.
    *
    * Scale: the sketch is depth×width cells no matter the corpus; the
    * probe set here is the q63-style bounded top-k. At 100 TB the probe
    * list is whatever candidate set needs auditing — the sketch answers
    * any of them from 8 K integers. */
  def cmsTokenFreq(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Cms
    val keyed = Tables.documents(s, d)
      .select(explode(TextFunctions.tokens(col("text"))).as("token"))
      .select(col("token"), TextFunctions.fingerprint(col("token"), 64).as("fp"))
    val sk = Cms.sketch(keyed, col("fp"))
    val top = keyed.groupBy("token", "fp").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(100)
    val est = Cms.lookup(sk, top.select(col("fp")).distinct(), col("fp"))
    top.join(est, top("fp") === est("probe_key"))
      .select(col("token"), col("cnt"), col("est"))
  }

  val cmsTokenFreqSql: String = {
    import graft.operators.Cms
    val fpTok = Extensions.fingerprintExprSqlOn("token")
    // "row" is reserved in DuckDB (ROW constructor) — alias the depth index rw
    val cellRows = (0 until Cms.depth).map(i =>
      s"SELECT $i AS rw, ${Cms.bucketSql("fp", i)} AS bucket FROM keyed")
      .mkString(" UNION ALL ")
    val probeRows = (0 until Cms.depth).map(i =>
      s"SELECT token, cnt, $i AS rw, ${Cms.bucketSql("fp", i)} AS bucket FROM top")
      .mkString(" UNION ALL ")
    s"""
    WITH keyed AS (
      SELECT token, $fpTok AS fp
      FROM (SELECT unnest(${Extensions.toksSql}) AS token FROM documents)),
    cells AS (
      SELECT rw, bucket, count(*) AS cnt_cell
      FROM ($cellRows) GROUP BY 1, 2),
    top AS (
      SELECT token, fp, cnt FROM (
        SELECT token, fp, count(*) AS cnt,
               row_number() OVER (ORDER BY count(*) DESC, token) AS rk
        FROM keyed GROUP BY token, fp)
      WHERE rk <= 100),
    probes AS ($probeRows)
    SELECT p.token, p.cnt, min(COALESCE(c.cnt_cell, 0)) AS est
    FROM probes p LEFT JOIN cells c USING (rw, bucket)
    GROUP BY p.token, p.cnt"""
  }

  // --- q162: CMS frequencies via the NATIVE aggregate -----------------------

  /** q162: q94's token-frequency estimates with the sketch built by the
    * engine's [[graft.expressions.CmsCells]] TypedImperativeAggregate
    * (SQL: `graft_cms(key)`) instead of the explode-then-groupBy
    * composition — the q159/q93 discipline applied to the frequency
    * sketch. The composition shuffles depth (row, bucket) tuples per
    * token occurrence; the native aggregate folds cells map-side and
    * ships one 64 KB buffer per task. Exploding the non-zero slots of
    * the returned cell array reproduces q94's sparse cell table exactly,
    * so the downstream probe is IDENTICAL code ([[Cms.lookup]]) and the
    * oracle is q94's verbatim. */
  def cmsNativeTokenFreq(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Cms
    graft.GraftExtensions.register(s)
    val keyed = Tables.documents(s, d)
      .select(explode(TextFunctions.tokens(col("text"))).as("token"))
      .select(col("token"), TextFunctions.fingerprint(col("token"), 64).as("fp"))
    val sk = keyed
      .agg(graft.expressions.CmsCells.cms(col("fp")).as("cells"))
      .select(posexplode(col("cells")).as(Seq("idx", "cnt")))
      .filter(col("cnt") > 0L)
      .select((col("idx") / Cms.width).cast("int").as("row"),
        (col("idx") % Cms.width).cast("long").as("bucket"),
        col("cnt"))
    val top = keyed.groupBy("token", "fp").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(100)
    val est = Cms.lookup(sk, top.select(col("fp")).distinct(), col("fp"))
    top.join(est, top("fp") === est("probe_key"))
      .select(col("token"), col("cnt"), col("est"))
  }

  // --- q163: token-budget sequence packing ----------------------------------

  /** q163: SEQUENCE PACKING — the step between a curated corpus and a
    * training run: documents are packed into fixed-token-budget training
    * sequences ("bins" of [[packCapacity]] tokens) so the trainer reads
    * dense, uniformly-sized samples instead of one ragged document per
    * row. The discipline here is START-FIT packing: within each source
    * shard, documents in stable (doc_id) order are assigned to the bin
    * their cumulative START offset falls in — `bin = (cum − tok) div C`.
    * A document straddling a boundary stays in the bin it starts in, so a
    * bin overflows by strictly less than one document (CurationSpec pins
    * the bound) and NO document is split or dropped (coverage pinned
    * too). This is the deterministic, window-expressible cousin of
    * greedy first-fit (whose "place here if it fits, else open a bin"
    * recurrence needs sequential state — the Sessionizer pattern — and
    * buys back only the sub-one-document overflow this accepts).
    * Complements q72 ([[packSequences]]), the CONCAT-AND-CHUNK form that
    * splits the concatenated stream at exact token boundaries (documents
    * straddle windows — the pretraining layout); this form never splits a
    * document (the SFT/document-integrity layout).
    *
    * Scale: one shuffle on the source shard key; the per-shard running
    * sum is the classic range-partitioned prefix sum, and at 100 TB you
    * pack WITHIN shards by construction (a global packing order would
    * serialize the corpus through one sort for zero training benefit —
    * samples are shuffled again at load time anyway). */
  val packCapacity = 2048

  def sequencePack(s: SparkSession, d: String): DataFrame =
    packOn(Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("tok")))

  /** The packing body over (source, doc_id, tok) rows. `carry` offsets
    * each source's prefix sum by previously-packed token mass — 0 for a
    * from-scratch pack; the persisted per-source total for the append
    * path (q164), which is the ONLY state start-fit packing needs. */
  private def packOn(docs: DataFrame, carry: Option[DataFrame] = None): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
    val withCarry = carry match {
      case None => docs.withColumn("carry", lit(0L))
      case Some(c) => docs.join(broadcast(c), Seq("source"), "left_outer")
        .withColumn("carry", coalesce(col("carry"), lit(0L)))
    }
    withCarry.withColumn("cum", sum("tok").over(w))
      .withColumn("bin", expr(s"(carry + cum - tok) div $packCapacity"))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum("tok").as("total_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
  }

  val sequencePackSql: String = s"""
    WITH t AS (SELECT source, doc_id,
                 CAST(len(${Extensions.toksSql}) AS BIGINT) AS tok
               FROM documents),
    packed AS (SELECT source, doc_id, tok,
                 -- DuckDB widens sum(BIGINT) to HUGEINT (→ float64 in the
                 -- driver's pandas compare); narrow it back for dtype parity
                 (CAST(sum(tok) OVER (PARTITION BY source ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) - tok)
                   // $packCapacity AS bin
               FROM t)
    SELECT source, bin, count(*) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS total_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM packed GROUP BY 1, 2"""

  // --- q165: globally contiguous packed-stream offsets ------------------------

  /** q165: the globally contiguous form of q72's packed stream — each
    * document's token offset in ONE corpus-wide stream (ordered by
    * (source, doc_id)), computed WITHOUT a global sort: per-shard prefix
    * sums (the q72 window, one shuffle on the shard key) plus the classic
    * two-pass base-offset fold — per-shard token totals (a handful of
    * rows) are exclusive-prefix-summed on the tiny aggregate and
    * broadcast back, so `global_off = shard_base + local prefix`. q72's
    * scaladoc documents this exact shape as the scale path and
    * deliberately left it ungated; this row gates it. The oracle computes
    * the same offsets the brute way — one global window over
    * (source, doc_id) — which is precisely the single-partition sort the
    * engine plan avoids; their hash-equality IS the claim that the
    * decomposition is exact. Zero-token documents are dropped before
    * packing, exactly as in q72. */
  def packGlobalOffsets(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= 1L)
    val prior = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = docs.withColumn("local_off",
      coalesce(sum(col("n_tokens")).over(prior), lit(0L)))
    // per-shard totals: rows = number of sources (a handful) — the
    // single-partition window below runs over THAT aggregate, never the data
    val baseW = Window.orderBy(col("source"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = docs.groupBy("source").agg(sum("n_tokens").as("shard_total"))
      .withColumn("shard_base", coalesce(sum(col("shard_total")).over(baseW), lit(0L)))
      .select(col("source"), col("shard_base"))
    local.join(broadcast(bases), Seq("source"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        (col("shard_base") + col("local_off")).as("global_off"))
  }

  val packGlobalOffsetsSql: String = s"""
    SELECT doc_id, source, n_tokens,
           CAST(coalesce(sum(n_tokens) OVER (
             ORDER BY source, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS global_off
    FROM (SELECT doc_id, source,
                 CAST(len(${Extensions.toksSql}) AS BIGINT) AS n_tokens
          FROM documents)
    WHERE n_tokens >= 1"""

  // --- q164: the packing APPEND path -----------------------------------------

  /** q164: q163's append path — the sketch-family discipline (q118 HLL
    * max-merge, q122 CMS sum-merge, q148 audit semigroup: append ≡
    * rebuild proven under oracle, daily cost = delta) applied to
    * sequence packing. Start-fit packing is a pure per-source prefix sum,
    * so its ENTIRE resumable state is one number per source: the total
    * token mass already packed. Day-1's packed table and that carry
    * vector persist to parquet; day-2 packs ALONE with the carried
    * offsets; the straddling bin (day-1's last, which day-2's first doc
    * may continue filling) merges by plain semigroup (counts/sums add,
    * doc-range min/max) — and the result must hash-match the FULL-corpus
    * rebuild oracle (q163's SQL verbatim). At 100 TB you pack the day's
    * ingest and fold it in; you never re-window the corpus. */
  private val packStateVersion = "p1"

  private def packStateDir(d: String): String =
    Extensions.indexCacheDir("graft-pack-state", d, "documents",
      s"half$packStateVersion")

  private val packStateLock = new Object

  def sequencePackIncremental(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("source"), col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("tok"))
    // the fixture's "day boundary": docs at or below the median doc_id are
    // day 1 — deterministic from the data, and (critically for append
    // semantics) every day-2 doc_id sorts AFTER every day-1 doc_id
    val cut = Tables.documents(s, d)
      .agg(max(col("doc_id"))).head.getLong(0) / 2
    val dir = packStateDir(d)
    packStateLock.synchronized {
      if (!(new java.io.File(s"$dir/packed/_SUCCESS").exists() &&
            new java.io.File(s"$dir/carry/_SUCCESS").exists())) {
        val day1 = docs.filter(col("doc_id") <= cut)
        packOn(day1).write.mode("overwrite").parquet(s"$dir/packed")
        day1.groupBy("source").agg(sum("tok").as("carry"))
          .write.mode("overwrite").parquet(s"$dir/carry")
      }
    }
    val day1Packed = s.read.parquet(s"$dir/packed")
    val carry = s.read.parquet(s"$dir/carry")
    val day2Packed = packOn(docs.filter(col("doc_id") > cut), Some(carry))
    day1Packed.unionByName(day2Packed)
      .groupBy("source", "bin")
      .agg(sum("n_docs").as("n_docs"),
        sum("total_tokens").as("total_tokens"),
        min("first_doc").as("first_doc"),
        max("last_doc").as("last_doc"))
  }

  // --- q88: the composed curation pipeline, oracled end-to-end --------------

  /** The FULL [[graft.streaming.CurationPipeline]] cascade — quality route
    * → keep → stratified sample → exact keep-first dedup → content-hash
    * train/val/test split — as one registry query with a DuckDB oracle
    * over the whole composition. The per-stage queries (q65, q61, q20,
    * q59) each pin one operator; this pins their COMPOSITION, so a
    * stage-ordering regression (e.g. sampling before routing, or splitting
    * before dedup) fails the gate even when every stage is individually
    * correct. The streaming replay-equivalence test
    * (CurationPipelineSpec) ties the same composition to the live-stream
    * form — together: stream ≡ batch ≡ independent SQL engine. */
  def curationPipeline(s: SparkSession, d: String): DataFrame =
    graft.streaming.CurationPipeline.curate(
      Tables.documents(s, d).withColumn("ts",
        timestamp_seconds(lit(1704067200L) + col("doc_id") % 300)), "ts")
      .select(col("doc_id"), col("lang"), col("source"), col("split"))

  val curationPipelineSql: String = s"""
    WITH scored AS (
      SELECT doc_id, text, lang, source,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(toks, t -> t IN (${Extensions.enStops}))) AS DOUBLE)
                 / NULLIF(CAST(len(toks) AS DOUBLE), 0.0)
               - CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
                 / NULLIF(CAST(length(text) AS DOUBLE), 0.0)
               - CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
                 / NULLIF(CAST(length(text) AS DOUBLE), 0.0) AS quality
      FROM (SELECT doc_id, text, lang, source, ${Extensions.toksSql} AS toks
            FROM documents)),
    kept AS (
      SELECT * FROM scored
      WHERE CASE WHEN n_tokens < $minTokens THEN 'too_short'
                 WHEN n_tokens > $maxTokens THEN 'too_long'
                 WHEN quality < $minQuality THEN 'low_quality'
                 ELSE 'keep' END = 'keep'),
    samp AS (
      SELECT * FROM (
        SELECT *, ${Extensions.fingerprintExprSql} % 100 AS bucket FROM kept)
      WHERE bucket < CASE lang WHEN 'en' THEN ${strataRates("en")}
                               WHEN 'zh' THEN ${strataRates("zh")}
                               ELSE $strataDefault END),
    deduped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM samp)
      WHERE rn = 1)
    SELECT doc_id, lang, source,
           CASE WHEN sb < 80 THEN 'train'
                WHEN sb < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT *, ${Extensions.fingerprintExprSqlOn("reverse(text)")} % 100 AS sb
          FROM deduped)"""

  // --- q101: corpus drift report between two snapshot days -------------------

  /** Token-distribution drift between two corpus snapshots (doc_id parity
    * as the deterministic day split) — the monitoring pass a production
    * corpus runs before training: did yesterday's crawl shift the
    * distribution, and WHICH tokens moved? Per token, both days' counts
    * and the EXACT cross-multiplied divergence |ca·tb − cb·ta| (the
    * integer-scaled |relfreq_a − relfreq_b|; ta/tb are the day totals) —
    * ranking on the integer avoids float rounding entirely, and the
    * reported `drift_score` = diff / (ta·tb) is one IEEE division of
    * identical operands, bit-equal cross-engine. Top 30 by (diff, token).
    *
    * Scale shape: one (token, day-flag) aggregate shuffle, a broadcast
    * 1-row totals join, TakeOrderedAndProject for the top-k — no window,
    * no global sort. BIGINT cross-products hold to ~3·10^9 tokens per
    * day; beyond that, lift the multiplication to DECIMAL(38,0) on both
    * engines (the [[graft.functions.Exact]] discipline). */
  def corpusDrift(s: SparkSession, d: String): DataFrame =
    corpusDriftOn(Tables.documents(s, d))

  def corpusDriftOn(docs: DataFrame): DataFrame = {
    val counts = docs
      .select((col("doc_id") % 2 === 0).as("day1"),
        explode(TextFunctions.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(sum(when(col("day1"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("day1"), 1L).otherwise(0L)).as("cb"))
    val totals = counts.agg(sum("ca").as("ta"), sum("cb").as("tb"))
    counts.crossJoin(broadcast(totals))
      .withColumn("diff", abs(col("ca") * col("tb") - col("cb") * col("ta")))
      .orderBy(col("diff").desc, col("token"))
      .limit(30)
      .select(col("token"), col("ca"), col("cb"), col("diff"),
        (col("diff").cast("double") /
          (col("ta") * col("tb")).cast("double")).as("drift_score"))
  }

  val corpusDriftSql: String = s"""
    WITH tok AS (SELECT doc_id % 2 = 0 AS day1,
                        unnest(${Extensions.toksSql}) AS token
                 FROM documents),
    counts AS (SELECT token,
                      count(*) FILTER (WHERE day1) AS ca,
                      count(*) FILTER (WHERE NOT day1) AS cb
               FROM tok GROUP BY token),
    -- DuckDB sum(BIGINT) widens to HUGEINT; narrow back for dtype parity
    tot AS (SELECT CAST(sum(ca) AS BIGINT) AS ta,
                   CAST(sum(cb) AS BIGINT) AS tb FROM counts)
    SELECT token, ca, cb, abs(ca * tb - cb * ta) AS diff,
           CAST(abs(ca * tb - cb * ta) AS DOUBLE)
             / CAST(ta * tb AS DOUBLE) AS drift_score
    FROM counts, tot
    ORDER BY diff DESC, token
    LIMIT 30"""

  val defs: Map[String, QueryDef] = Map(
    "q61_stratified_sample" -> QueryDef(stratifiedSample _, stratifiedSampleSql),
    "q62_tfidf_top_terms"   -> QueryDef(tfidfTopTerms _, tfidfTopTermsSql),
    "q63_vocab_topn"        -> QueryDef(vocabTopN _, vocabTopNSql),
    "q64_redact_digits"     -> QueryDef(redactDigits _, redactDigitsSql),
    "q65_quality_route"     -> QueryDef(qualityRoute _, qualityRouteSql),
    "q67_source_cap"        -> QueryDef(sourceCap _, sourceCapSql),
    "q68_repetition_stats"  -> QueryDef(repetitionStats _, repetitionStatsSql),
    "q69_decontaminate"     -> QueryDef(decontaminate _, decontaminateSql),
    "q123_decontaminate_bloom" -> QueryDef(decontaminateBloom _, decontaminateSql),
    "q101_corpus_drift"     -> QueryDef(corpusDrift _, corpusDriftSql),
    "q72_pack_sequences"    -> QueryDef(packSequences _, packSequencesSql),
    "q73_chunk_windows"     -> QueryDef(chunkWindows _, chunkWindowsSql),
    "q74_token_rarity"      -> QueryDef(tokenRarity _, tokenRaritySql),
    "q75_bpe_top_pairs"     -> QueryDef(bpeTopPairs _, bpeTopPairsSql),
    "q167_bpe_encode"       -> QueryDef(bpeEncodeVocab _, bpeEncodeVocabSql),
    "q179_bpe_streaming"    -> QueryDef(bpeStreamingGate _, bpeEncodeVocabSql),
    "q77_bigram_lm"         -> QueryDef(bigramLm _, bigramLmSql),
    "q82_lm_quality"        -> QueryDef(lmQualityScore _, lmQualitySql),
    "q83_dup_ngram_frac"    -> QueryDef(dupNgramFraction _, dupNgramFractionSql),
    "q84_domain_mix_sample" -> QueryDef(domainMixSample _, domainMixSampleSql),
    "q85_incremental_vocab" -> QueryDef(incrementalVocab _, incrementalVocabSql),
    "q86_heavy_hitters"     -> QueryDef(heavyHitters _, heavyHittersSql),
    "q88_curation_pipeline" -> QueryDef(curationPipeline _, curationPipelineSql),
    "q94_cms_token_freq"    -> QueryDef(cmsTokenFreq _, cmsTokenFreqSql),
    "q162_cms_native_agg"   -> QueryDef(cmsNativeTokenFreq _, cmsTokenFreqSql),
    "q163_sequence_pack"    -> QueryDef(sequencePack _, sequencePackSql),
    "q164_pack_incremental" -> QueryDef(sequencePackIncremental _, sequencePackSql),
    "q165_pack_global_offsets" -> QueryDef(packGlobalOffsets _, packGlobalOffsetsSql),
    "q136_k_anonymity"      -> QueryDef(kAnonymize _, kAnonymizeSql),
    "q154_token_lift"       -> QueryDef(tokenLift _, tokenLiftSql),
    "q158_source_scorecard" -> QueryDef(sourceScorecard _, sourceScorecardSql),
    "q183_temperature_sample" -> QueryDef(temperatureSample _, temperatureSampleSql),
    "q184_priority_sample"  -> QueryDef(prioritySample _, prioritySampleSql),
    "q185_group_weighted_sample" -> QueryDef(groupWeightedSample _, groupWeightedSampleSql))
}
