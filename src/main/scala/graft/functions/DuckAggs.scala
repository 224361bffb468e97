package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{DeclarativeAggregate, PercentileDisc, TypedImperativeAggregate}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Wave-5 of the DuckDB AGGREGATE name surface: product, entropy, mad,
  * quantile_cont / quantile_disc / quantile.
  *
  * Oracle-pinned semantics (DuckDB 1.0.0; q139 runs identical text
  * through both engines):
  *  - product: DOUBLE, NULLs skipped, empty/all-NULL group => NULL.
  *  - entropy: Shannon entropy BASE 2 of the value-frequency
  *    distribution, NULLs skipped, EMPTY group => 0.0 (not NULL).
  *  - mad: median(|x - median(x)|) with the CONTINUOUS (interpolated)
  *    median on both passes (pinned: mad over {1,2,4,100} = 1.5).
  *  - quantile_cont(x, q): linear interpolation at position q*(n-1) of
  *    the sorted values — exactly Spark's `percentile`, so it lowers to
  *    that (array-of-quantiles form included).
  *  - quantile_disc(x, q) (alias `quantile`): the smallest value whose
  *    cumulative distribution reaches q — SQL-standard percentile_disc,
  *    lowered to Spark's PercentileDisc (pinned: q=0.26 over
  *    {1,2,3,10} = 2, strings work: median string of {a,b,c} = 'b').
  *
  * Scale notes: product is a DeclarativeAggregate (codegen'd map-side
  * partial, one double of state). entropy/mad carry a value->count map
  * per group — the same O(distinct) state DuckDB's implementations
  * carry, map-side partial merged by key, never a per-row collect.
  * entropy hashes the STRING rendering of the value (equality classes
  * match for every atomic type; documented micro-divergence: -0.0 and
  * 0.0 count as distinct here).
  *
  * Ref behavior: kwack delegates these names to the DuckDB binary
  * (KwackEngine.java:232).
  */
case class ProductAgg(child: Expression)
    extends DeclarativeAggregate
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  override def checkInputDataTypes() = child.dataType match {
    case DoubleType => org.apache.spark.sql.catalyst.analysis
      .TypeCheckResult.TypeCheckSuccess
    case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"product requires DOUBLE (builder casts), got $t")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "product"

  private lazy val product = AttributeReference("product", DoubleType)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(product)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(null, DoubleType))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), product,
      If(IsNull(product), child, Multiply(product, child))))
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    If(IsNull(product.right), product.left,
      If(IsNull(product.left), product.right,
        Multiply(product.left, product.right))))
  override lazy val evaluateExpression: Expression = product
  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}

/** Base for the two counts-map aggregates: a key->count open map,
  * map-side partials merged by key. */
abstract class CountsMapAgg[K] extends TypedImperativeAggregate[
    java.util.HashMap[K, java.lang.Long]] {
  type Buf = java.util.HashMap[K, java.lang.Long]
  def child: Expression
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def createAggregationBuffer(): Buf = new Buf()

  protected def extract(input: InternalRow): K

  override def update(buffer: Buf, input: InternalRow): Buf = {
    val k = extract(input)
    if (k != null) buffer.merge(k, 1L, (a, b) => a + b)
    buffer
  }
  override def merge(buffer: Buf, other: Buf): Buf = {
    other.forEach((k, v) => buffer.merge(k, v, (a, b) => a + b))
    buffer
  }

  protected def writeKey(out: DataOutputStream, k: K): Unit
  protected def readKey(in: DataInputStream): K

  override def serialize(buffer: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.forEach { (k, v) => writeKey(out, k); out.writeLong(v) }
    out.flush()
    bos.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new Buf(math.max(16, n * 2))
    var i = 0
    while (i < n) { val k = readKey(in); m.put(k, in.readLong()); i += 1 }
    m
  }
}

case class EntropyAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends CountsMapAgg[String] {
  override def checkInputDataTypes() = child.dataType match {
    case StringType => org.apache.spark.sql.catalyst.analysis
      .TypeCheckResult.TypeCheckSuccess
    case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"entropy requires STRING (builder casts), got $t")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "entropy"

  override protected def extract(input: InternalRow): String = {
    val v = child.eval(input)
    if (v == null) null else v.asInstanceOf[UTF8String].toString
  }
  override protected def writeKey(out: DataOutputStream, k: String): Unit =
    out.writeUTF(k)
  override protected def readKey(in: DataInputStream): String = in.readUTF()

  override def eval(buffer: Buf): Any = {
    var n = 0L
    val it0 = buffer.values().iterator()
    while (it0.hasNext) n += it0.next()
    if (n == 0) return 0.0 // pinned: DuckDB entropy of an empty group
    val ln2 = math.log(2.0)
    var acc = 0.0
    val it = buffer.values().iterator()
    while (it.hasNext) { val c = it.next().toDouble
      acc += c * (math.log(c) / ln2) }
    math.log(n.toDouble) / ln2 - acc / n
  }
  override def withNewMutableAggBufferOffset(o: Int) =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int) =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]) = copy(child = c.head)
}

case class MadAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends CountsMapAgg[java.lang.Double] {
  override def checkInputDataTypes() = child.dataType match {
    case DoubleType => org.apache.spark.sql.catalyst.analysis
      .TypeCheckResult.TypeCheckSuccess
    case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"mad requires DOUBLE (builder casts), got $t")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "mad"

  override protected def extract(input: InternalRow): java.lang.Double = {
    val v = child.eval(input)
    if (v == null) null else java.lang.Double.valueOf(v.asInstanceOf[Double])
  }
  override protected def writeKey(out: DataOutputStream,
      k: java.lang.Double): Unit = out.writeDouble(k)
  override protected def readKey(in: DataInputStream): java.lang.Double =
    in.readDouble()

  /** Continuous (interpolated) median of a weighted value set. */
  private def medianCont(pairs: Array[(Double, Long)]): Double = {
    val n = pairs.map(_._2).sum
    val pos = (n - 1) * 0.5
    val i0 = math.floor(pos).toLong
    val frac = pos - i0
    // value at expanded index i (0-based) via cumulative counts
    def at(idx: Long): Double = {
      var cum = 0L; var j = 0
      while (j < pairs.length) {
        cum += pairs(j)._2
        if (idx < cum) return pairs(j)._1
        j += 1
      }
      pairs.last._1
    }
    val lo = at(i0)
    if (frac == 0.0) lo else lo + frac * (at(i0 + 1) - lo)
  }

  override def eval(buffer: Buf): Any = {
    if (buffer.isEmpty) return null
    val sorted = {
      val arr = new Array[(Double, Long)](buffer.size)
      var i = 0
      val it = buffer.entrySet().iterator()
      while (it.hasNext) { val e = it.next()
        arr(i) = (e.getKey.doubleValue(), e.getValue.longValue()); i += 1 }
      arr.sortBy(_._1)
    }
    val m = medianCont(sorted)
    val dev = new java.util.TreeMap[Double, Long]()
    sorted.foreach { case (v, c) =>
      dev.merge(math.abs(v - m), c, (a, b) => a + b) }
    val devArr = new Array[(Double, Long)](dev.size)
    var i = 0
    val it = dev.entrySet().iterator()
    while (it.hasNext) { val e = it.next()
      devArr(i) = (e.getKey, e.getValue); i += 1 }
    medianCont(devArr)
  }
  override def withNewMutableAggBufferOffset(o: Int) =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int) =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]) = copy(child = c.head)
}

/** quantile_disc over ANY orderable atomic type (Spark's PercentileDisc
  * is numeric-only; DuckDB's median string works). Counts-map state,
  * pick at expanded index ceil(q*n)-1 (clamped) over the type-ordered
  * distinct values — the smallest value whose cumulative distribution
  * reaches q, with multiplicity. */
case class QuantileDiscAgg(child: Expression, percentage: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends CountsMapAgg[Any] {
  override def children: Seq[Expression] = Seq(child, percentage)
  override def dataType: DataType = child.dataType

  private lazy val q: Double = percentage.eval(InternalRow.empty) match {
    case null => throw new IllegalArgumentException(
      "quantile_disc: quantile must be a non-NULL literal")
    case d: Double => d
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case f: Float => f.toDouble
    case n: Number => n.doubleValue()
    case other => throw new IllegalArgumentException(
      s"quantile_disc: unsupported quantile literal $other")
  }

  override def checkInputDataTypes() = {
    val ok = child.dataType match {
      case StringType | BooleanType | ByteType | ShortType | IntegerType |
          LongType | FloatType | DoubleType | DateType | TimestampType |
          TimestampNTZType => percentage.foldable
      case _: DecimalType => percentage.foldable
      case _ => false
    }
    if (ok && q >= 0.0 && q <= 1.0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("quantile_disc requires an orderable atomic " +
        "column and a foldable quantile in [0, 1]")
  }

  /** Canonical transport types so a key hashes identically before and
    * after partial-buffer serialization: Byte/Short widen to Int, Float
    * to Double (narrowed back in eval), strings copied off the reused
    * unsafe buffer. */
  override protected def extract(input: InternalRow): Any =
    child.eval(input) match {
      case null => null
      case s: UTF8String => s.clone()
      case b: java.lang.Byte => java.lang.Integer.valueOf(b.intValue())
      case s: java.lang.Short => java.lang.Integer.valueOf(s.intValue())
      case f: java.lang.Float => java.lang.Double.valueOf(f.doubleValue())
      case other => other
    }

  private val T_NULL = 0; private val T_LONG = 1; private val T_DOUBLE = 2
  private val T_STR = 3; private val T_INT = 4; private val T_BOOL = 5
  private val T_DECIMAL = 6

  override protected def writeKey(out: DataOutputStream, k: Any): Unit =
    k match {
      case l: java.lang.Long => out.writeByte(T_LONG); out.writeLong(l)
      case i: java.lang.Integer => out.writeByte(T_INT); out.writeInt(i)
      case d: java.lang.Double => out.writeByte(T_DOUBLE); out.writeDouble(d)
      case s: UTF8String =>
        val b = s.getBytes
        out.writeByte(T_STR); out.writeInt(b.length); out.write(b)
      case b: java.lang.Boolean => out.writeByte(T_BOOL); out.writeBoolean(b)
      case d: org.apache.spark.sql.types.Decimal =>
        val str = d.toJavaBigDecimal.toString.getBytes("UTF-8")
        out.writeByte(T_DECIMAL); out.writeInt(str.length); out.write(str)
      case s: java.lang.Short => out.writeByte(T_INT); out.writeInt(s.toInt)
      case b: java.lang.Byte => out.writeByte(T_INT); out.writeInt(b.toInt)
      case f: java.lang.Float =>
        out.writeByte(T_DOUBLE); out.writeDouble(f.toDouble)
      case other => throw new UnsupportedOperationException(
        s"quantile_disc: unsupported value type ${other.getClass}")
    }

  override protected def readKey(in: DataInputStream): Any =
    in.readByte() match {
      case T_LONG => java.lang.Long.valueOf(in.readLong())
      case T_INT => java.lang.Integer.valueOf(in.readInt())
      case T_DOUBLE => java.lang.Double.valueOf(in.readDouble())
      case T_STR =>
        val b = new Array[Byte](in.readInt()); in.readFully(b)
        UTF8String.fromBytes(b)
      case T_BOOL => java.lang.Boolean.valueOf(in.readBoolean())
      case T_DECIMAL =>
        val b = new Array[Byte](in.readInt()); in.readFully(b)
        org.apache.spark.sql.types.Decimal(
          new java.math.BigDecimal(new String(b, "UTF-8")))
      case t => throw new UnsupportedOperationException(
        s"quantile_disc: bad serialized tag $t")
    }

  override def eval(buffer: Buf): Any = {
    if (buffer.isEmpty) return null
    val orderingType = child.dataType match {
      case ByteType | ShortType => IntegerType // canonical widening
      case FloatType => DoubleType
      case t => t
    }
    val ordering = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(orderingType)
    val keys = new java.util.ArrayList[Any](buffer.keySet())
    keys.sort(ordering.asInstanceOf[java.util.Comparator[Any]])
    var n = 0L
    val itc = buffer.values().iterator()
    while (itc.hasNext) n += itc.next()
    val idx = math.max(0L, math.ceil(q * n).toLong - 1)
    var cum = 0L
    var j = 0
    while (j < keys.size()) {
      cum += buffer.get(keys.get(j))
      if (idx < cum) {
        // narrow the canonical transport value back to the output type
        return (child.dataType, keys.get(j)) match {
          case (ShortType, i: java.lang.Integer) =>
            java.lang.Short.valueOf(i.shortValue())
          case (ByteType, i: java.lang.Integer) =>
            java.lang.Byte.valueOf(i.byteValue())
          case (FloatType, d: java.lang.Double) =>
            java.lang.Float.valueOf(d.floatValue())
          case (_, v) => v
        }
      }
      j += 1
    }
    keys.get(keys.size() - 1)
  }
  override def prettyName: String = "quantile_disc"
  override def withNewMutableAggBufferOffset(o: Int) =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int) =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]) = copy(child = c(0), percentage = c(1))
}

object DuckAggs {
  private def fn(name: String, args: Expression*): Expression =
    UnresolvedFunction(name, args.toIndexedSeq, isDistinct = false)

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "product" -> (a => ProductAgg(Cast(a(0), DoubleType))),
    "entropy" -> (a => EntropyAgg(Cast(a(0), StringType))),
    "mad" -> (a => MadAgg(Cast(a(0), DoubleType))),
    "quantile_cont" -> (a => fn("percentile", a(0), a(1))),
    "quantile_disc" -> (a => QuantileDiscAgg(a(0), a(1))),
    "quantile" -> (a => QuantileDiscAgg(a(0), a(1))))
}
