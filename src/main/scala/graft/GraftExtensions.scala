package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType, StringType}
import graft.expressions.{BloomWords, BoundedLevenshtein, CmsCells, DotProduct, HllRegisters, JaroWinkler, MinHashSignature, PolyFingerprint, TopKRows, TopKStrRows, ZOrderKey}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so `spark.sql` users can call
  * them directly:
  *
  *   spark.sql("SELECT graft_dot(a, b) FROM t")
  *   spark.sql("SELECT graft_minhash(shingles, 32) FROM t")
  *
  * Wire up with
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  * or `--conf spark.sql.extensions=graft.GraftExtensions`, or call
  * `GraftExtensions.register(spark)` on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // opt-in logical rewrite: range-only inner joins → binned equi-joins
    // (fires only when spark.graft.rangeJoin.binWidth is set positive)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    // whole-operator extension: plans graft.plans.AsOfJoinPlan into the
    // partition-local merge exec (no-op on every other node)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {
  /** Any foldable integer expression (literal, 16+16, …) evaluated at
    * analysis time; rejects non-constant or non-positive values with a
    * builder-level error instead of a runtime array-size exception. */
  private def posIntConst(e: Expression, what: String,
      max: Int = Int.MaxValue): Int = {
    val v = e match {
      case c if c.foldable && c.dataType == IntegerType =>
        c.eval() match {
          case i: java.lang.Integer => i.intValue()
          case other => throw new IllegalArgumentException(
            s"$what must be a constant integer, evaluated to: $other")
        }
      case other => throw new IllegalArgumentException(
        s"$what must be a constant integer expression, got: ${other.sql}")
    }
    if (v <= 0 || v > max) throw new IllegalArgumentException(
      s"$what must be in [1, $max], got: $v")
    v
  }

  /** Builder-level arity check: a descriptive error beats the raw
    * IndexOutOfBoundsException `es(n)` would throw during analysis. */
  private def checkArity(name: String, es: Seq[Expression],
      atLeast: Int, atMost: Int): Unit =
    if (es.size < atLeast || es.size > atMost) {
      val expected = if (atLeast == atMost) s"$atLeast"
        else s"$atLeast to $atMost"
      throw new IllegalArgumentException(
        s"$name expects $expected arguments, got ${es.size}")
    }

  /** Builders cast array arguments to the expression's expected element
    * type: SQL callers passing array<float> (the embeddings fixture's native
    * type) get a correct widening cast instead of doubles read off 4-byte
    * storage; non-castable inputs fail analysis. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (es: Seq[Expression]) => {
        checkArity("graft_dot", es, 2, 2)
        DotProduct(
          Cast(es(0), ArrayType(DoubleType)), Cast(es(1), ArrayType(DoubleType)))
      }),
    ("graft_minhash",
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (es: Seq[Expression]) => {
        checkArity("graft_minhash", es, 2, 2)
        MinHashSignature(
          Cast(es(0), ArrayType(StringType)), posIntConst(es(1), "numHashes"))
      }),
    ("graft_fingerprint",
      new ExpressionInfo(classOf[PolyFingerprint].getName, "graft_fingerprint"),
      (es: Seq[Expression]) => {
        checkArity("graft_fingerprint", es, 1, 2)
        PolyFingerprint(
          Cast(es(0), StringType),
          if (es.size > 1) posIntConst(es(1), "prefixLen") else 64)
      }),
    ("graft_edit_bounded",
      new ExpressionInfo(classOf[BoundedLevenshtein].getName, "graft_edit_bounded"),
      (es: Seq[Expression]) => {
        checkArity("graft_edit_bounded", es, 3, 3)
        BoundedLevenshtein(
          Cast(es(0), StringType), Cast(es(1), StringType),
          posIntConst(es(2), "tau"))
      }),
    ("graft_jaro_winkler",
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (es: Seq[Expression]) => {
        checkArity("graft_jaro_winkler", es, 2, 2)
        JaroWinkler(Cast(es(0), StringType), Cast(es(1), StringType))
      }),
    ("graft_zorder",
      new ExpressionInfo(classOf[ZOrderKey].getName, "graft_zorder"),
      (es: Seq[Expression]) => {
        checkArity("graft_zorder", es, 2, 3)
        ZOrderKey(
          Cast(es(0), LongType), Cast(es(1), LongType),
          if (es.size > 2) posIntConst(es(2), "bits", max = 31) else 21)
      }),
    // aggregate: the analyzer wraps a bare AggregateFunction returned by a
    // registry builder in its AggregateExpression, same as the built-ins
    ("graft_topk",
      new ExpressionInfo(classOf[TopKRows].getName, "graft_topk"),
      (es: Seq[Expression]) => {
        checkArity("graft_topk", es, 3, 3)
        TopKRows(
          Cast(es(0), DoubleType), Cast(es(1), LongType),
          posIntConst(es(2), "k", max = TopKRows.maxK))
      }),
    ("graft_topk_str",
      new ExpressionInfo(classOf[TopKStrRows].getName, "graft_topk_str"),
      (es: Seq[Expression]) => {
        checkArity("graft_topk_str", es, 3, 3)
        TopKStrRows(
          Cast(es(0), DoubleType), Cast(es(1), StringType),
          posIntConst(es(2), "k", max = TopKRows.maxK))
      }),
    ("graft_hll",
      new ExpressionInfo(classOf[HllRegisters].getName, "graft_hll"),
      (es: Seq[Expression]) => {
        checkArity("graft_hll", es, 1, 1)
        HllRegisters(Cast(es(0), LongType))
      }),
    ("graft_cms",
      new ExpressionInfo(classOf[CmsCells].getName, "graft_cms"),
      (es: Seq[Expression]) => {
        checkArity("graft_cms", es, 1, 1)
        CmsCells(Cast(es(0), LongType))
      }),
    ("graft_bloom",
      new ExpressionInfo(classOf[BloomWords].getName, "graft_bloom"),
      (es: Seq[Expression]) => {
        checkArity("graft_bloom", es, 1, 1)
        BloomWords(Cast(es(0), LongType))
      }))

  /** Register on an already-built session (temp functions). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
