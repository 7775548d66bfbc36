package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking — the pre-publication
  * audit a curation pipeline runs before a corpus snapshot ships
  * (the Deequ/dbt-tests capability class, engine-native).
  *
  * Each constraint compiles to an aggregate over one scan of its table:
  * (constraint, violations, checked). Composing constraints on the SAME
  * table unions their aggregates, and Catalyst's common-subexpression
  * reuse keeps it one scan per table; referential checks are anti-join
  * counts (broadcast when the referenced key side is a dimension).
  * Nothing collects to the driver — the report IS a DataFrame, so a
  * 100 TB audit is as distributed as any other query.
  */
object Quality {

  /** Rows violating a row-local predicate. The outer coalesce keeps the
    * report (0, 0) on an EMPTY table — `sum` over zero rows is NULL, and
    * the SQL mirror's `count(*) FILTER` is 0, so without it the report
    * would diverge cross-engine exactly when a table vanishes. */
  def predicateCheck(df: DataFrame, name: String, ok: Column): DataFrame =
    df.agg(
        coalesce(sum(when(!coalesce(ok, lit(false)), 1L).otherwise(0L)), lit(0L))
          .as("violations"),
        count(lit(1)).as("checked"))
      .select(lit(name).as("check_name"), col("violations"), col("checked"))

  /** Duplicate occurrences of a supposed key: total rows − distinct
    * complete keys. A key with ANY NULL component is no key at all (PK
    * semantics: PRIMARY KEY implies NOT NULL), so every such row counts as
    * a violation — which is also what `count(*) − count(DISTINCT key)`
    * computes in ANSI SQL, where DISTINCT ignores NULLs. The `when`
    * guard makes Spark's `count_distinct` (which would otherwise count a
    * null-field struct as a real value) match that semantic exactly. */
  def uniqueCheck(df: DataFrame, name: String, keys: Seq[String]): DataFrame = {
    val keyComplete = keys.map(col(_).isNotNull).reduce(_ && _)
    df.agg(count(lit(1)).as("n"),
        count_distinct(when(keyComplete, struct(keys.map(col): _*))).as("d"))
      .select(lit(name).as("check_name"), (col("n") - col("d")).as("violations"),
        col("n").as("checked"))
  }

  /** Child rows whose foreign key has no parent (NULL FKs are orphans'
    * opposite — they're skipped, matching SQL FK semantics). */
  def referentialCheck(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame = {
    val total = child.filter(col(childKey).isNotNull)
    val orphans = total.join(parent.select(col(parentKey).as(childKey)).distinct(),
      Seq(childKey), "left_anti")
    orphans.agg(count(lit(1)).as("violations"))
      .crossJoin(broadcast(total.agg(count(lit(1)).as("checked"))))
      .select(lit(name).as("check_name"), col("violations"), col("checked"))
  }

  /** One report from many checks. */
  def report(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _)
}
