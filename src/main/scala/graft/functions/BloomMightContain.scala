package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Executor-side cache of deserialized Bloom filters.
  *
  * Keyed by the serialized byte-array OBJECT (reference identity — a
  * WeakHashMap on arrays compares with eq, since Array.equals is identity):
  * the filter bytes arrive as one plan literal, so every row of a task sees
  * the same array instance and deserialization happens once per (thread,
  * plan), never per row. Identity keying side-steps the fingerprint-collision
  * footgun ADVICE r4 flagged on LmBigramFold's boundary-entry cache — two
  * different filters can never alias because two distinct arrays are two
  * distinct keys, and dropping the task's array unpins the entry (weak key).
  */
object GraftBloom {
  private val cache =
    new ThreadLocal[java.util.WeakHashMap[Array[Byte], BloomFilter]] {
      override def initialValue() =
        new java.util.WeakHashMap[Array[Byte], BloomFilter]()
    }

  def filterFor(bytes: Array[Byte]): BloomFilter = {
    val m = cache.get()
    var f = m.get(bytes)
    if (f == null) {
      f = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
      m.put(bytes, f)
    }
    f
  }

  def contains(bytes: Array[Byte], v: Long): Boolean =
    filterFor(bytes).mightContainLong(v)
}

/** `graft_bloom_contains(filter_bytes, key)` — membership probe of a
  * serialized `org.apache.spark.util.sketch.BloomFilter` (the exact bits
  * `DataFrameStatFunctions.bloomFilter` builds via tree aggregation), as a
  * native codegen'd expression.
  *
  * This is the scan-side half of the bloom-prefilter dedup pattern (d16):
  * the driver builds a filter over the bounded batch's keys, the filter
  * rides into the plan as ONE binary literal (kilobytes, not the key set),
  * and the corpus scan drops non-candidate rows before any shuffle. False
  * positives only — downstream exact joins stay correct, they just see a
  * few extra rows; false negatives are impossible, so gated results are
  * exact.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains requires (binary, bigint), got ${left.dataType} / ${right.dataType}")
    }

  override protected def nullSafeEval(f: Any, v: Any): Any =
    GraftBloom.contains(f.asInstanceOf[Array[Byte]], v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, v) =>
      s"${ev.value} = graft.functions.GraftBloom.contains($f, $v);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
