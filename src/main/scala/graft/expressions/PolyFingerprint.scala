package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The 31-bit rolling polynomial fingerprint — fold
  * `acc = (acc·31 + codePoint) mod 1e9+7` over the first `prefixLen`
  * Unicode code points — as a native codegen expression.
  *
  * Bit-identical to the composable form
  * `aggregate(filter(split(substring(c,1,n),""), ch -> ch <> ''), 0L,
  * (acc,ch) -> (acc*31 + ascii(ch)) % 1000000007)` (PropertySpec asserts
  * equivalence on random Unicode strings), and to the DuckDB
  * `list_reduce(... unicode(c) ...)` oracle mirror. The composable form
  * allocates a per-row array of single-char strings and interprets a boxed
  * lambda fold per character; this is one primitive loop inside
  * whole-stage codegen. The fingerprint sits under every content-keyed
  * decision (q28, q59 split, q61 sampling, q67 cap, the streaming
  * curation pipeline), so it is on the per-document hot path of a corpus
  * run.
  *
  * Reference scope note: the reference has no content hashing at all —
  * this belongs to the training-data extension surface
  * (/root/reference has no analogue; closest is invoice keying by
  * invoiceNo in InvoicePipeline.scala:96).
  */
case class PolyFingerprint(child: Expression, prefixLen: Int)
    extends UnaryExpression {

  require(prefixLen > 0, s"prefixLen must be positive, got $prefixLen")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_fingerprint requires a string argument, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    PolyFingerprint.fold(v.asInstanceOf[UTF8String].toString, prefixLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = PolyFingerprint.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.fold($s.toString(), $prefixLen);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyFingerprint {

  /** Shared by interpreted and generated paths; code-point iteration (not
    * chars) so astral-plane characters fold as ONE step with their full
    * code point — matching split("")+ascii() and DuckDB's unicode(). */
  def fold(s: String, prefixLen: Int): Long = {
    var acc = 0L
    var i = 0
    var seen = 0
    val len = s.length
    while (i < len && seen < prefixLen) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
      seen += 1
    }
    acc
  }

  import org.apache.spark.sql.GraftBridge

  def fingerprint(c: Column, prefixLen: Int): Column =
    GraftBridge.column(PolyFingerprint(GraftBridge.expression(c), prefixLen))
}
