package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join via prefix filtering (the AllPairs /
  * PPJoin family): every pair of documents whose token-set Jaccard is
  * ≥ τ, with no approximation — the exact counterpart of the MinHash-LSH
  * (q25) and SimHash (q27) probabilistic near-dup paths.
  *
  * Prefix-filter theorem: order each document's tokens by a GLOBAL total
  * order (ascending document frequency, ties by token — rare tokens
  * first, maximizing pruning); if J(a,b) ≥ τ = num/den, then a and b must
  * share a token inside their first |x| − ⌈τ·|x|⌉ + 1 tokens. Candidates
  * therefore come from an equi-join on PREFIX tokens only, never a
  * cartesian of documents; a size filter (num·max ≤ den·min) prunes
  * further, and an exact intersection count verifies.
  *
  * Exactness discipline: ⌈τ·n⌉ is computed as (num·n + den − 1) div den —
  * INTEGER ceiling. (A float 0.9·n would round 9.000000000000002 up at
  * n = 10, silently shortening the prefix and breaking the theorem's
  * completeness guarantee — in both engines, identically, which is the
  * worst kind of wrong.) The verification inequality is integer too:
  * J ≥ num/den ⇔ (den+num)·c ≥ num·(n_a+n_b).
  *
  * Scale shape: token ordering is one window per document (entity-keyed,
  * bounded by document length); candidates join on token with fanout
  * bounded by per-token prefix frequency (rare-first ordering keeps this
  * small on natural vocabularies); verification joins are candidate-
  * bounded. No stage is all-pairs.
  */
object SimJoin {

  /** The candidate stage alone — (doc_a, doc_b, na, nb) pairs sharing a
    * PREFIX token and passing the size filter, before exact verification.
    * Exposed so SimJoinSpec can pin the candidate VOLUME on adversarial
    * fixtures: the operator's pruning power lives entirely here, and a
    * regression in the rare-first ordering shows up as a candidate
    * blow-up long before it shows up as a timeout. */
  private[graft] def candidatePairs(docTok: DataFrame, num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0 && num <= den, s"bad threshold $num/$den")
    val sz = docTok.groupBy("id").agg(count(lit(1)).as("n"))
    val freq = docTok.groupBy("token").agg(count(lit(1)).as("tf"))
    val prefix = docTok.join(freq, "token").join(sz, "id")
      .withColumn("pos", row_number().over(
        Window.partitionBy("id").orderBy(col("tf"), col("token"))))
      .filter(col("pos") <= col("n") - expr(s"($num * n + ${den - 1}) div $den") + 1)
      .select(col("id"), col("token"), col("n"))

    prefix.select(col("id").as("doc_a"), col("token"), col("n").as("na"))
      .join(prefix.select(col("id").as("doc_b"), col("token"), col("n").as("nb")),
        "token")
      .filter(col("doc_a") < col("doc_b"))
      .filter(lit(num) * greatest(col("na"), col("nb")) <=
        lit(den) * least(col("na"), col("nb")))
      .select("doc_a", "doc_b", "na", "nb").distinct()
  }

  /** `docTok`: DISTINCT (id, token). Returns (doc_a, doc_b, c, na, nb,
    * jaccard) for every pair with J ≥ num/den, doc_a < doc_b. */
  def exactJaccardJoin(docTok: DataFrame, num: Int, den: Int): DataFrame = {
    val cand = candidatePairs(docTok, num, den)

    cand
      .join(docTok.select(col("id").as("doc_a"), col("token")), "doc_a")
      .join(docTok.select(col("id").as("doc_b"), col("token")), Seq("doc_b", "token"))
      .groupBy("doc_a", "doc_b", "na", "nb")
      .agg(count(lit(1)).as("c"))
      .filter(lit(den + num) * col("c") >= lit(num) * (col("na") + col("nb")))
      .select(col("doc_a"), col("doc_b"), col("c"), col("na"), col("nb"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c"))).as("jaccard"))
  }
}
