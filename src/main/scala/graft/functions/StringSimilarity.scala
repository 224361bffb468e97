package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's string-similarity scalar surface (jaccard, hamming/mismatches,
  * damerau_levenshtein, jaro_similarity, jaro_winkler_similarity) as
  * codegen'd Catalyst expressions over raw UTF-8 BYTES.
  *
  * Byte (not code-point) semantics are pinned against the oracle DuckDB:
  * `damerau_levenshtein('日本','本日') = 4` (two 3-byte chars transposed
  * costs 4 byte edits, not 1 char transposition), so every metric here
  * walks `UTF8String.getBytes` directly — which also makes the loops
  * allocation-light and branch-predictable at scale.
  *
  * Error contracts follow DuckDB loudly rather than returning sentinel
  * values: jaccard rejects empty inputs ("argument too short"), hamming
  * rejects empty or unequal-length inputs.
  *
  * Ref behavior: kwack delegates these names to the DuckDB binary
  * (KwackEngine.java:232); this file re-expresses them Spark-native so the
  * same query text runs inside whole-stage codegen (each doGenCode emits a
  * single static call on [[StringSim]] — no boxing, no virtual dispatch).
  */
object StringSim {

  /** Jaccard similarity of the byte SETS of the two strings (DuckDB:
    * case-sensitive, order-free; `jaccard('aaa','a') = 1.0`). */
  def jaccard(a: UTF8String, b: UTF8String): Double = {
    val x = a.getBytes; val y = b.getBytes
    if (x.length == 0 || y.length == 0) throw new IllegalArgumentException(
      "jaccard: arguments must be non-empty strings")
    val inA = new Array[Boolean](256)
    val inB = new Array[Boolean](256)
    var i = 0
    while (i < x.length) { inA(x(i) & 0xff) = true; i += 1 }
    i = 0
    while (i < y.length) { inB(y(i) & 0xff) = true; i += 1 }
    var inter = 0; var union = 0
    i = 0
    while (i < 256) {
      if (inA(i) && inB(i)) inter += 1
      if (inA(i) || inB(i)) union += 1
      i += 1
    }
    inter.toDouble / union.toDouble
  }

  /** Positions at which the byte sequences differ; DuckDB (alias
    * `mismatches`) requires equal, non-zero lengths. */
  def hamming(a: UTF8String, b: UTF8String): Long = {
    val x = a.getBytes; val y = b.getBytes
    if (x.length == 0 || y.length == 0) throw new IllegalArgumentException(
      "hamming: strings must be of length > 0")
    if (x.length != y.length) throw new IllegalArgumentException(
      "hamming: strings must be of equal length")
    var d = 0L; var i = 0
    while (i < x.length) { if (x(i) != y(i)) d += 1; i += 1 }
    d
  }

  /** FULL Damerau-Levenshtein (unrestricted, with the last-occurrence
    * dictionary — `damerau_levenshtein('CA','ABC') = 2`, where the
    * restricted OSA variant would say 3), matching the oracle. */
  def damerau(a: UTF8String, b: UTF8String): Long = {
    val x = a.getBytes; val y = b.getBytes
    val la = x.length; val lb = y.length
    if (la == 0) return lb.toLong
    if (lb == 0) return la.toLong
    val maxd = la + lb
    // d is (la+2) x (lb+2), flattened; row stride lb+2
    val stride = lb + 2
    val d = new Array[Int]((la + 2) * stride)
    d(0) = maxd
    var i = 0
    while (i <= la) { d((i + 1) * stride) = maxd; d((i + 1) * stride + 1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(j + 1) = maxd; d(stride + j + 1) = j; j += 1 }
    val da = new Array[Int](256)
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k = da(y(j - 1) & 0xff)
        val l = db
        val cost = if (x(i - 1) == y(j - 1)) { db = j; 0 } else 1
        val subst = d(i * stride + j) + cost
        val ins = d((i + 1) * stride + j) + 1
        val del = d(i * stride + j + 1) + 1
        val trans = d(k * stride + l) + (i - k - 1) + 1 + (j - l - 1)
        var m = subst
        if (ins < m) m = ins
        if (del < m) m = del
        if (trans < m) m = trans
        d((i + 1) * stride + j + 1) = m
        j += 1
      }
      da(x(i - 1) & 0xff) = i
      i += 1
    }
    d((la + 1) * stride + lb + 1).toLong
  }

  /** Jaro similarity over bytes. DuckDB edge: ANY empty input (including
    * both empty) yields 0.0 — classic definitions say 1.0 for two empty
    * strings, the oracle says 0.0, we match the oracle. */
  def jaro(a: UTF8String, b: UTF8String): Double = {
    val x = a.getBytes; val y = b.getBytes
    val la = x.length; val lb = y.length
    if (la == 0 || lb == 0) return 0.0
    if (java.util.Arrays.equals(x, y)) return 1.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val xm = new Array[Boolean](la)
    val ym = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!ym(j) && x(i) == y(j)) {
          xm(i) = true; ym(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var jj = 0
    i = 0
    while (i < la) {
      if (xm(i)) {
        while (!ym(jj)) jj += 1
        if (x(i) != y(jj)) t += 1
        jj += 1
      }
      i += 1
    }
    val md = m.toDouble
    (md / la + md / lb + (md - t / 2.0) / md) / 3.0
  }

  /** Jaro-Winkler: the common-prefix boost (cap 4, scale 0.1) applies only
    * above the classic 0.7 threshold — pinned against the oracle
    * (`jaro_winkler_similarity('abqqqqqqqq','abzzzzzzzz')` returns the
    * plain Jaro 0.4667, unboosted). */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    val x = a.getBytes; val y = b.getBytes
    val n = math.min(4, math.min(x.length, y.length))
    var l = 0
    while (l < n && x(l) == y(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }
}

/** Base for the two-string metrics: strict StringType inputs, a single
  * static [[StringSim]] call in codegen. */
abstract class StringSimExpr extends BinaryExpression {
  protected def method: String
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"${left.dataType} / ${right.dataType}")
    }
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.StringSim.$method($a, $b)")
}

case class JaccardSim(left: Expression, right: Expression)
    extends StringSimExpr {
  override def dataType: DataType = DoubleType
  override protected def method: String = "jaccard"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaccard(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

case class HammingDist(left: Expression, right: Expression)
    extends StringSimExpr {
  override def dataType: DataType = LongType
  override protected def method: String = "hamming"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSim.hamming(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

case class DamerauLevenshtein(left: Expression, right: Expression)
    extends StringSimExpr {
  override def dataType: DataType = LongType
  override protected def method: String = "damerau"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSim.damerau(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

case class JaroSim(left: Expression, right: Expression)
    extends StringSimExpr {
  override def dataType: DataType = DoubleType
  override protected def method: String = "jaro"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaro(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

case class JaroWinklerSim(left: Expression, right: Expression)
    extends StringSimExpr {
  override def dataType: DataType = DoubleType
  override protected def method: String = "jaroWinkler"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaroWinkler(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}
