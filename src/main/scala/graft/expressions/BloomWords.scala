package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.operators.Bloom

/** Native Bloom filter aggregate: folds BIGINT keys into the engine's
  * oracle-exact Bloom words ([[graft.operators.Bloom]] — the same
  * Kirsch–Mitzenmacher double-hashed positions as the Column/SQL forms)
  * inside one ObjectHashAggregate partial/final pass. Completes the
  * native-aggregate trio with [[HllRegisters]] (distinct counts) and
  * [[CmsCells]] (frequencies).
  *
  * Same 100 TB rationale: the DataFrame composition (q114) explodes k
  * (group, pos) rows PER INPUT KEY into the word groupBy — correct, but
  * the exchange carries k× the key stream. Here each task ORs its keys
  * into one 16 KB word buffer per group and only those buffers cross the
  * wire. Merge is word-wise bit-or — commutative, associative, IDEMPOTENT
  * — so any partitioning, replay batching, or duplicate delivery gives
  * identical words, and streaming complete-mode replay ≡ batch
  * (BloomSpec pins all of it).
  *
  * Output: `array<bigint>` of length [[Bloom.words]], word w's packed
  * 32-bit mask at index w; zero = untouched. Exploding the non-zero slots
  * reproduces q114's sparse (word, bits32) table exactly, which is how
  * the q166 gate row hash-matches q114's DuckDB oracle verbatim. NULL
  * keys are skipped (SQL aggregate semantics); a group with no non-null
  * input yields the all-zero array (an empty filter), never NULL.
  *
  * SQL: `graft_bloom(key)` via [[graft.GraftExtensions]].
  */
case class BloomWords(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def prettyName: String = "graft_bloom"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom requires a bigint argument, got ${t.sql}")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](Bloom.words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      var i = 0
      while (i < Bloom.k) {
        val pos = Bloom.posOfLong(key, i)
        buf(pos >>> 5) |= (1L << (pos & 31))
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomWords =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomWords =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomWords =
    copy(child = newChild)
}

object BloomWords {
  import org.apache.spark.sql.GraftBridge

  /** Column-API form: `df.groupBy(g).agg(BloomWords.bloom(col("key")))`. */
  def bloom(key: Column): Column =
    GraftBridge.column(BloomWords(GraftBridge.expression(key))
      .toAggregateExpression())
}
