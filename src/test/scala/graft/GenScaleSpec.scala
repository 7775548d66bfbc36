package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.tools.GenScale

/** The sf1 scale study (round-14 verdict #1) rests on GenScale's output
  * being a FAITHFUL scale-up: row counts ×F, dense keys, intact foreign
  * keys, replica 0 byte-identical to the source, and replicas r > 0
  * EXACT content copies (documents/embeddings) — byte-identical text and
  * vectors under fresh ids — so MinHash banding and quantizer-cell
  * decisions are inherited deterministically and the replica laws in
  * ScaleLaws stay exact. (An earlier perturbed-replica draft broke q128
  * at sf1: ~j≈0.2 pairs that a true-Jaccard oracle finds but 8-band LSH
  * catches only ~3% of — see GenScale.scala. Do NOT reintroduce it.)
  * Pin those invariants at factor 2 over sf0.001 so a generator
  * regression can't silently invalidate a whole scale run. */
class GenScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val src = "/root/testdata/sf0.001"

  private lazy val out: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-genscale").toString
    GenScale.generate(spark, src, dir, factor = 2)
    dir
  }

  private def t(base: String, name: String) =
    spark.read.parquet(s"$base/$name.parquet")

  test("row counts scale by the factor; dimensions stay fixed") {
    for (n <- Seq("customer", "supplier", "part", "orders", "lineitem",
      "events", "documents", "embeddings"))
      assert(t(out, n).count() === 2 * t(src, n).count(), n)
    for (n <- Seq("region", "nation"))
      assert(t(out, n).count() === t(src, n).count(), n)
  }

  test("keys stay dense 0..N-1 and foreign keys stay intact") {
    def dense(df: org.apache.spark.sql.DataFrame, k: String): Unit = {
      val r = df.agg(min(col(k)), max(col(k)),
        countDistinct(col(k)), count(lit(1))).head()
      assert(r.getLong(0) === 0L, s"$k min")
      assert(r.getLong(1) === r.getLong(2) - 1, s"$k dense")
      assert(r.getLong(2) === r.getLong(3), s"$k unique")
    }
    dense(t(out, "customer"), "c_custkey")
    dense(t(out, "orders"), "o_orderkey")
    dense(t(out, "part"), "p_partkey")
    dense(t(out, "documents"), "doc_id")
    dense(t(out, "embeddings"), "vec_id")
    def fkComplete(fact: org.apache.spark.sql.DataFrame, fk: String,
                   dim: org.apache.spark.sql.DataFrame, pk: String): Unit =
      assert(fact.join(dim, fact(fk) === dim(pk), "left_anti").count() === 0L,
        s"$fk -> $pk")
    fkComplete(t(out, "lineitem"), "l_orderkey", t(out, "orders"), "o_orderkey")
    fkComplete(t(out, "lineitem"), "l_partkey", t(out, "part"), "p_partkey")
    fkComplete(t(out, "lineitem"), "l_suppkey", t(out, "supplier"), "s_suppkey")
    fkComplete(t(out, "orders"), "o_custkey", t(out, "customer"), "c_custkey")
  }

  test("replica 0 is identical to the source; key-embedding names track " +
    "the new key") {
    // replica 0 = rows with source-range keys; multiset-identical to the
    // source (the 4-part key is NOT unique in the source, so a join-count
    // check would fan out — exceptAll is the honest comparison)
    val nOrd = t(src, "orders").count()
    val rep0 = t(out, "lineitem").filter(col("l_orderkey") < nOrd)
    assert(rep0.exceptAll(t(src, "lineitem")).count() === 0L)
    assert(t(src, "lineitem").exceptAll(rep0).count() === 0L)
    val names = t(out, "customer")
      .filter(col("c_name") =!= format_string("Customer#%09d", col("c_custkey")))
      .count()
    assert(names === 0L, "every c_name must embed its own c_custkey")
  }

  test("replica content is copied EXACTLY (deterministic MinHash banding " +
    "inheritance — the oracle-exactness precondition, see GenScale docs)") {
    val n = t(src, "documents").count()
    val a = t(out, "documents").filter(col("doc_id") < n)
      .select(col("doc_id").as("id0"), col("text").as("t0"))
    val b = t(out, "documents").filter(col("doc_id") >= n)
      .select((col("doc_id") - n).as("id0"), col("text").as("t1"))
    assert(a.join(b, "id0").filter(col("t0") =!= col("t1")).count() === 0L,
      "replica text must be byte-identical to its source doc")
    val nVec = t(src, "embeddings").count()
    val e0 = t(out, "embeddings").filter(col("vec_id") < nVec)
      .select(col("vec_id").as("id0"), col("embedding").as("e0"))
    val e1 = t(out, "embeddings").filter(col("vec_id") >= nVec)
      .select((col("vec_id") - nVec).as("id0"), col("embedding").as("e1"))
    assert(e0.join(e1, "id0")
      .filter(col("e0") =!= col("e1")).count() === 0L,
      "replica vectors must be identical to their source vector")
  }
}
