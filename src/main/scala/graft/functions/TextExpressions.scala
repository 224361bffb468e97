package graft.functions

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd expressions for the text/dedup hot paths.
  *
  * Rationale: Spark's higher-order functions (`transform`, `aggregate`,
  * `filter`) evaluate their lambda per element in interpreted mode, outside
  * whole-stage codegen — on a corpus-scale tokenize/hash pipeline that is
  * the dominant cost. Each expression here fuses one such loop into compiled
  * code while producing BIT-IDENTICAL values to the composable form it
  * replaces (asserted in NativeTextExprSpec), so the DuckDB oracle contract
  * is unchanged.
  *
  * Codegen strategy: the loop body lives in a static-reachable helper
  * (companion object), and doGenCode emits a single call — the expression
  * stays inside the WSCG stage (no virtual function call per ELEMENT, one
  * per row), which is the same shape Spark uses for its own complex string
  * expressions.
  */
object NativeHelpers {
  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 8 hex chars of md5 as unsigned 32-bit value in a long —
    * bit-identical to conv(substr(md5(x),1,8),16,10). */
  def md5i(s: UTF8String): Long = {
    val d = md5Local.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    java.lang.Integer.toUnsignedLong(
      ((digest(0) & 0xff) << 24) | ((digest(1) & 0xff) << 16) |
        ((digest(2) & 0xff) << 8) | (digest(3) & 0xff))
  }

  def md5iArray(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = md5i(arr.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken): md5-derived hash
    * per code-point k-gram (mod p), window-of-w minima, distinct values in
    * first-occurrence order. Bit-identical to the composable
    *   array_distinct(transform(sequence(1, size(hv)-w+1), t ->
    *     array_min(slice(hv, t, w))))
    * over hv = transform(sequence(1, length(text)-k+1), i ->
    *     md5i(substr(text, i, k)) % p)
    * but one fused linear scan: the composition is O(L²) (interpreted
    * substring-from-position rescans the string per position) and
    * re-evaluates under pushed-down filters; this is O(L·k) with a
    * monotonic-deque window min. md5 per gram is the cross-engine
    * determinism contract — a production deployment free of the oracle
    * could swap in a rolling polynomial hash here without changing shape. */
  def winnow(text: UTF8String, k: Int, w: Int, p: Long): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    if (n < k + w - 1) return new GenericArrayData(Array.empty[Any])
    val nh = n - k + 1
    val hv = new Array[Long](nh)
    val d = md5Local.get()
    val sb = new java.lang.StringBuilder(k * 2)
    var i = 0
    while (i < nh) {
      sb.setLength(0)
      var j = 0
      while (j < k) { sb.appendCodePoint(cps(i + j)); j += 1 }
      d.reset()
      val digest = d.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      hv(i) = java.lang.Integer.toUnsignedLong(
        ((digest(0) & 0xff) << 24) | ((digest(1) & 0xff) << 16) |
          ((digest(2) & 0xff) << 8) | (digest(3) & 0xff)) % p
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val dq = new java.util.ArrayDeque[Int]()
    var t = 0
    while (t < nh) {
      while (!dq.isEmpty && hv(dq.peekLast()) >= hv(t)) dq.pollLast()
      dq.addLast(t)
      if (dq.peekFirst() <= t - w) dq.pollFirst()
      if (t >= w - 1) seen.add(hv(dq.peekFirst()))
      t += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }

  /** Count of DISTINCT elements of `a` that also appear in `b` —
    * value-identical to size(array_intersect(a, b)) for string arrays
    * (incl. the null-element rule: null counts once iff both sides carry
    * one) WITHOUT materializing the intersection array. The dedup verify
    * legs only consume the SIZE of the intersection; ArrayIntersect
    * builds the full distinct-element array (per-element string copies
    * into an UnsafeArrayData) just for size() to discard it — per
    * candidate pair, at corpus scale. */
  def icountStr(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return 0
    val bs = new java.util.HashSet[UTF8String](Math.max(8, nb * 2))
    var bNull = false
    var i = 0
    while (i < nb) {
      if (b.isNullAt(i)) bNull = true else bs.add(b.getUTF8String(i))
      i += 1
    }
    val seen = new java.util.HashSet[UTF8String](Math.max(8, na))
    var c = 0
    var aNullCounted = false
    var j = 0
    while (j < na) {
      if (a.isNullAt(j)) {
        if (bNull && !aNullCounted) { c += 1; aNullCounted = true }
      } else {
        val v = a.getUTF8String(j)
        if (bs.contains(v) && seen.add(v)) c += 1
      }
      j += 1
    }
    c
  }

  private val singleSpace = Pattern.compile(" ")

  /** Distinct word 3-grams, identical to
    * array_distinct(transform(sequence(1, size(w)-2), i ->
    *   concat(w[i],' ',w[i+1],' ',w[i+2]))) over w = split(text, ' '). */
  def shingles3(text: UTF8String): ArrayData = {
    val words = singleSpace.split(text.toString, -1)
    if (words.length < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + 2 < words.length) {
      seen.add(words(i) + " " + words(i + 1) + " " + words(i + 2))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** All character trigrams in order (duplicates kept — frequency counting
    * downstream). One fused loop; replaces the interpreted
    * transform(sequence(1, len-2), i -> substring(text, i, 3)) pipeline.
    * Iterates CODE POINTS, not UTF-16 units, to match Spark's substring and
    * DuckDB's SUBSTR on supplementary-plane characters. */
  def charNgrams3(text: UTF8String): ArrayData = charNgramsN(text, 3)

  /** All consecutive code-point n-grams in ONE scan. The composable
    * `transform(sequence(1, len-n+1), i -> substring(text, i, n))` form is
    * O(len^2): Spark's substring re-walks the UTF8 bytes from position 0 on
    * every call. This is the linear replacement (bit-identical output). */
  def charNgramsN(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val cp = s.codePointCount(0, s.length)
    if (cp < n) return new GenericArrayData(Array.empty[Any])
    // char offset of each code-point boundary
    val offs = new Array[Int](cp + 1)
    var ci = 0
    var k = 0
    while (k < cp) {
      offs(k) = ci
      ci += Character.charCount(s.codePointAt(ci))
      k += 1
    }
    offs(cp) = s.length
    val out = new Array[Any](cp - n + 1)
    var i = 0
    while (i < cp - n + 1) {
      out(i) = UTF8String.fromString(s.substring(offs(i), offs(i + n)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 32-bit SimHash over the hashed-token array: bit j set when the
    * majority of tokens have bit j set. One pass; identical to the 32
    * per-bit aggregate folds it replaces. */
  def simhash32(hv: ArrayData): Long = {
    val counts = new Array[Int](32)
    val n = hv.numElements()
    var i = 0
    while (i < n) {
      val h = hv.getLong(i)
      var j = 0
      while (j < 32) {
        if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) > 0) sim |= (1L << j)
      j += 1
    }
    sim
  }

  // Per-thread hash-indexed copy of the LM model. Cache validation is
  // CONTENT-COMPLETE: for UnsafeMapData (what a broadcast-joined model
  // column arrives as) the incoming map's raw backing bytes are memcmp'd
  // against a copy taken when the index was built — a changed model can
  // never silently reuse a stale index (the earlier boundary-fingerprint
  // scheme could). Any other MapData implementation rebuilds per row,
  // trading speed for unconditional correctness on row-variant models.
  private val lmCache =
    new ThreadLocal[(Array[Byte], java.util.HashMap[String, java.lang.Long])]()

  private def lmBuild(model: org.apache.spark.sql.catalyst.util.MapData)
      : java.util.HashMap[String, java.lang.Long] = {
    val n = model.numElements()
    val keys = model.keyArray()
    val vals = model.valueArray()
    val hm = new java.util.HashMap[String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      hm.put(keys.getUTF8String(i).toString, vals.getLong(i))
      i += 1
    }
    hm
  }

  private def lmModelOf(model: org.apache.spark.sql.catalyst.util.MapData)
      : java.util.HashMap[String, java.lang.Long] = model match {
    case u: org.apache.spark.sql.catalyst.expressions.UnsafeMapData =>
      val sz = u.getSizeInBytes
      val cached = lmCache.get()
      if (cached != null && cached._1.length == sz &&
          org.apache.spark.unsafe.array.ByteArrayMethods.arrayEquals(
            u.getBaseObject, u.getBaseOffset,
            cached._1, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
            sz.toLong)) {
        cached._2
      } else {
        val bytes = new Array[Byte](sz)
        org.apache.spark.unsafe.Platform.copyMemory(
          u.getBaseObject, u.getBaseOffset,
          bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, sz.toLong)
        val hm = lmBuild(u)
        lmCache.set((bytes, hm))
        hm
      }
    case other => lmBuild(other)
  }

  private val cdcC = Array(31L, 37L, 41L, 43L, 47L, 53L, 59L, 61L)

  /** Content-defined chunking in one scan: boundary after code point i
    * (1-based, i >= 8) when Σ_{k=0..7} cp(i-k)*C(k) ≡ 0 (mod 64); chunks
    * are the code-point substrings between consecutive cuts (0 and n are
    * always cuts). Simplified CDC — fixed 8-point window, no min/max chunk
    * bound — chosen to be exactly replayable as a DuckDB list
    * comprehension over UNICODE(char) values. */
  def cdcChunks(text: UTF8String): ArrayData = {
    val s = text.toString
    val n = s.codePointCount(0, s.length)
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](n + 1) // char offset of each code-point boundary
    val cps = new Array[Int](n + 1) // 1-based code points
    var ci = 0
    var k = 0
    while (k < n) {
      offs(k) = ci
      val cp = s.codePointAt(ci)
      cps(k + 1) = cp
      ci += Character.charCount(cp)
      k += 1
    }
    offs(n) = s.length
    val cuts = scala.collection.mutable.ArrayBuffer(0)
    var i = 8
    while (i <= n) {
      var h = 0L
      var j = 0
      while (j < 8) { h += cps(i - j) * cdcC(j); j += 1 }
      if (h % 64 == 0) cuts += i
      i += 1
    }
    if (cuts.last != n) cuts += n
    val out = new Array[Any](cuts.length - 1)
    var c = 0
    while (c < out.length) {
      out(c) = UTF8String.fromString(s.substring(offs(cuts(c)), offs(cuts(c + 1))))
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Boxed fold: Σ model[bigram] over the text's code-point bigrams, null
    * when a bigram is missing (null-poisoning, like the composable form).
    * Code-point iteration matches substring/SUBSTR semantics. */
  def lmFoldBoxed(text: UTF8String,
                  model: org.apache.spark.sql.catalyst.util.MapData)
      : java.lang.Long = {
    val hm = lmModelOf(model)
    val s = text.toString
    val cp = s.codePointCount(0, s.length)
    if (cp < 2) return 0L
    var sum = 0L
    var ci = 0
    var prev = 0
    var k = 0
    while (k < cp) {
      val next = ci + Character.charCount(s.codePointAt(ci))
      if (k >= 1) {
        val v = hm.get(s.substring(prev, next))
        if (v == null) return null
        sum += v.longValue()
      }
      prev = ci
      ci = next
      k += 1
    }
    sum
  }

  /** min over hv of (a * (h % p) + b) % p — identical to the array_min /
    * transform composition (all operands positive, Java % == SQL %). */
  def minhash(hv: ArrayData, a: Long, b: Long, p: Long): Long = {
    val n = hv.numElements()
    var m = Long.MaxValue
    var i = 0
    while (i < n) {
      val v = (a * (hv.getLong(i) % p) + b) % p
      if (v < m) m = v
      i += 1
    }
    m
  }
}

/** graft_md5i_array(array<string>) -> array<bigint>. */
case class Md5IntArray(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"requires array<string>, got $t")
  }
  override protected def nullSafeEval(v: Any): Any =
    NativeHelpers.md5iArray(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NativeHelpers$$.MODULE$$.md5iArray($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_shingles(text) -> array<string> of distinct word 3-grams. */
case class WordShingles(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"requires string, got $t")
  }
  override protected def nullSafeEval(v: Any): Any =
    NativeHelpers.shingles3(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NativeHelpers$$.MODULE$$.shingles3($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_char_ngrams(text) -> array<string> of ALL character trigrams. */
case class CharNgrams(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"requires string, got $t")
  }
  override protected def nullSafeEval(v: Any): Any =
    NativeHelpers.charNgrams3(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NativeHelpers$$.MODULE$$.charNgrams3($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_cdc_chunks(text) -> array<string>: content-defined chunks (see
  * NativeHelpers.cdcChunks). */
case class CdcChunks(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"requires string, got $t")
  }
  override protected def nullSafeEval(v: Any): Any =
    NativeHelpers.cdcChunks(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NativeHelpers$$.MODULE$$.cdcChunks($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_char_grams(text, n) -> array<string> of ALL code-point n-grams in
  * one linear scan (the transform/sequence/substring composition is
  * quadratic — see NativeHelpers.charNgramsN). n is a literal. */
case class CharNgramsK(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"n must be >= 1, got $n")
    case t => TypeCheckResult.TypeCheckFailure(s"requires string, got $t")
  }
  override protected def nullSafeEval(v: Any): Any =
    NativeHelpers.charNgramsN(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NativeHelpers$$.MODULE$$.charNgramsN($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_winnow(text, k, w, p) -> array<bigint>: winnowing fingerprints
  * (window-of-w minima over md5-derived k-gram hashes mod p) in one fused
  * linear scan — see NativeHelpers.winnow. k/w/p are literals. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int, p: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 && w >= 1 && p >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case StringType =>
      TypeCheckResult.TypeCheckFailure(s"k/w/p must be >= 1, got $k/$w/$p")
    case t => TypeCheckResult.TypeCheckFailure(s"requires string, got $t")
  }
  override protected def nullSafeEval(v: Any): Any =
    NativeHelpers.winnow(v.asInstanceOf[UTF8String], k, w, p)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NativeHelpers$$.MODULE$$.winnow($c, $k, $w, ${p}L)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_simhash(hv) -> bigint: 32-bit majority SimHash signature. */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"requires array<bigint>, got $t")
  }
  override protected def nullSafeEval(v: Any): Any =
    NativeHelpers.simhash32(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NativeHelpers$$.MODULE$$.simhash32($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_minhash(hv, a, b, p) -> bigint. a/b/p are literal parameters. */
case class MinHashAffine(child: Expression, a: Long, b: Long, p: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"requires array<bigint>, got $t")
  }
  override protected def nullSafeEval(v: Any): Any =
    NativeHelpers.minhash(v.asInstanceOf[ArrayData], a, b, p)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NativeHelpers$$.MODULE$$.minhash($c, ${a}L, ${b}L, ${p}L)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_pairs(ds) -> array<struct<d1,d2>>: ordered pairs (i<j) from a
  * sorted postings list — the inverted-index candidate-generation step of
  * the dedup pipeline, fused into one loop (replaces a nested
  * transform/slice lambda). Element type follows the input (long ids). */
case class PostingPairs(child: Expression) extends UnaryExpression {
  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d1", elemType, nullable = true),
    StructField("d2", elemType, nullable = true))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType | IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"requires array<integral>, got $t")
  }

  def compute(arr: ArrayData): ArrayData = {
    val isLong = elemType == LongType
    val n = arr.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) =
          if (isLong) InternalRow(arr.getLong(i), arr.getLong(j))
          else InternalRow(arr.getInt(i), arr.getInt(j))
        k += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("postingPairs", this, classOf[PostingPairs].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_icount(a, b) -> int: size(array_intersect(a, b)) for string
  * arrays without materializing the intersection array (the verify legs
  * need only the count) — value-identical, asserted in
  * NativeTextExprSpec. */
case class IntersectCountStr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(StringType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"requires string arrays, got ${left.dataType} / ${right.dataType}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeHelpers.icountStr(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.NativeHelpers$$.MODULE$$.icountStr($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** graft_dot(a, b) -> double: in-index-order dot product (no normalization);
  * same fold order as the interpreted aggregate/zip_with composition. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"requires numeric arrays, got ${left.dataType} / ${right.dataType}")

  private def getter(t: DataType): String = t match {
    case ArrayType(FloatType, _) => "getFloat"
    case ArrayType(DoubleType, _) => "getDouble"
    case ArrayType(IntegerType, _) => "getInt"
    case ArrayType(LongType, _) => "getLong"
    case other => throw new IllegalStateException(other.toString)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    def get(arr: ArrayData, t: DataType, i: Int): Double = t match {
      case ArrayType(FloatType, _) => arr.getFloat(i).toDouble
      case ArrayType(DoubleType, _) => arr.getDouble(i)
      case ArrayType(IntegerType, _) => arr.getInt(i).toDouble
      case _ => arr.getLong(i).toDouble
    }
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += get(x, left.dataType, i) * get(y, right.dataType, i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xGet = getter(left.dataType)
    val yGet = getter(right.dataType)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.$xGet($i) * (double) $b.$yGet($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** graft_l2(a, b) -> double: SQUARED L2 distance over two numeric array
  * columns, folded in index order over min(|a|,|b|) elements — the same
  * loop the ANN ground-truth UDFs ran, now codegen'd (companion to
  * graft_dot/graft_cosine so the whole similarity family stays inside
  * whole-stage codegen). Squared on purpose: rank-equivalent to L2 and
  * exactly replayable by the oracle's (a-b)*(a-b) sums without a sqrt
  * rounding step. */
case class L2Distance(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"requires numeric arrays, got ${left.dataType} / ${right.dataType}")

  private def getter(t: DataType): String = t match {
    case ArrayType(FloatType, _) => "getFloat"
    case ArrayType(DoubleType, _) => "getDouble"
    case ArrayType(IntegerType, _) => "getInt"
    case ArrayType(LongType, _) => "getLong"
    case other => throw new IllegalStateException(other.toString)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    def get(arr: ArrayData, t: DataType, i: Int): Double = t match {
      case ArrayType(FloatType, _) => arr.getFloat(i).toDouble
      case ArrayType(DoubleType, _) => arr.getDouble(i)
      case ArrayType(IntegerType, _) => arr.getInt(i).toDouble
      case _ => arr.getLong(i).toDouble
    }
    var d2 = 0.0
    var i = 0
    while (i < n) {
      val diff = get(x, left.dataType, i) - get(y, right.dataType, i)
      d2 += diff * diff
      i += 1
    }
    d2
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xGet = getter(left.dataType)
    val yGet = getter(right.dataType)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d2 = ctx.freshName("d2")
      val diff = ctx.freshName("diff")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $d2 = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $diff = (double) $a.$xGet($i) - (double) $b.$yGet($i);
         |  $d2 += $diff * $diff;
         |}
         |${ev.value} = $d2;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** graft_pq_adc(query, codes, books) -> double: product-quantization
  * asymmetric distance — Σ over subspace j of the squared L2 between the
  * query's j-th slice and codebook centroid books[j][codes[j]].
  *
  * `books` is a constant nested array (array<array<array<double>>>,
  * m subspaces × k centroids × subdim) — constant-folded to one Literal
  * reference in generated code, so per row the work is m direct ArrayData
  * index hops + the fused diff² loop. Fold order (elements in index order,
  * subspaces in ascending j) is identical to the Scala UDF it replaces and
  * to the oracle's unrolled per-subspace sums, keeping results
  * bit-identical. */
case class PqAdc(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(IntegerType | LongType, _),
            ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"requires (array<float|double>, array<int|long>, " +
          s"array<array<array<double>>>), got ($a, $b, $c)")
    }

  // lazy: dataType on an unresolved child throws UnresolvedException, and
  // analysis may construct copies of this node before resolution completes
  private lazy val qIsFloat = first.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val codeIsLong = second.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  def compute(q: ArrayData, codes: ArrayData, books: ArrayData): Double = {
    val m = books.numElements()
    var total = 0.0
    var j = 0
    var qOff = 0
    while (j < m) {
      val code = if (codeIsLong) codes.getLong(j).toInt else codes.getInt(j)
      val book = books.getArray(j)
      if (code < 0 || code >= book.numElements()) throw new IllegalArgumentException(
        s"graft_pq_adc: code $code out of range [0, ${book.numElements()}) in subspace $j")
      val cent = book.getArray(code)
      val sub = cent.numElements()
      var d = 0.0
      var i = 0
      while (i < sub) {
        val qv = if (qIsFloat) q.getFloat(qOff + i).toDouble else q.getDouble(qOff + i)
        val diff = qv - cent.getDouble(i)
        d += diff * diff
        i += 1
      }
      total += d
      qOff += sub
      j += 1
    }
    total
  }

  override protected def nullSafeEval(q: Any, codes: Any, books: Any): Any =
    compute(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      books.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdc].getName)
    defineCodeGen(ctx, ev, (a, b, c) => s"$ref.compute($a, $b, $c)")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** graft_token_stats(text, stopwords...) ->
  * struct<n_tokens:int, n_stop:int, sum_len:int> over regex-' +' tokens —
  * the three interpreted-lambda aggregates of the quality-score pipeline
  * fused into one split pass. Lengths are codepoint counts (Spark length()
  * and DuckDB LENGTH() semantics). */
case class TokenStats(child: Expression, stopwords: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("sum_len", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"requires string, got $t")
  }

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }

  def compute(text: UTF8String): InternalRow = {
    val words = TokenStats.spacesRe.split(text.toString, -1)
    var nStop = 0
    var sumLen = 0
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (stopSet.contains(w)) nStop += 1
      sumLen += w.codePointCount(0, w.length)
      i += 1
    }
    InternalRow(words.length, nStop, sumLen)
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenStats", this, classOf[TokenStats].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenStats {
  val spacesRe: Pattern = Pattern.compile(" +")
}

/** graft_lm_fold(text, model) -> bigint: Σ over the text's consecutive
  * character bigrams g of model[g] (model: map<string,bigint>). Returns
  * null if any bigram is absent from the model — the same null-poisoning
  * the composable `aggregate(..., acc + element_at(m, g))` form produces.
  *
  * Why native: Spark's `element_at` on MapData is a LINEAR scan (maps have
  * no hash index inside a row), so the composable fold costs
  * O(|doc| · |model|) string comparisons per document. This expression
  * hash-indexes the model ONCE per thread and folds each document in one
  * compiled call. The per-thread index is revalidated per row by memcmp of
  * the map's raw UnsafeMapData bytes (content-complete — a different model
  * can never hit a stale index); non-Unsafe MapData inputs rebuild the
  * index per row, so row-variant models are slow but always correct.
  */
case class LmBigramFold(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, MapType(StringType, LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"requires (string, map<string,bigint>), got ($l, $r)")
    }
  override protected def nullSafeEval(t: Any, m: Any): Any =
    NativeHelpers.lmFoldBoxed(t.asInstanceOf[UTF8String],
      m.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("lmFold")
      s"""
         |java.lang.Long $tmp = graft.functions.NativeHelpers$$.MODULE$$.lmFoldBoxed($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** graft_word_entropy(text) -> struct(n_tokens, n_types, entropy_micro):
  * Shannon entropy of the document's whitespace-token distribution in
  * integer micro-nats, one linear pass per row.
  *
  * Determinism (the x13 fixed-point convention): each distinct count's
  * ln(c) is quantized ONCE to integer micro-nats (`Math.round`, which on
  * positive values matches DuckDB's ROUND half-away-from-zero), then
  * H_micro = lnT_micro - (Σ c·lnc_micro) // T is pure integer arithmetic —
  * partition-order independent and bit-replayable on both engines.
  *
  * Why native: the composable spelling is explode + two corpus-keyed
  * shuffles (per-(doc,word) counts, then per-doc re-aggregation); this
  * expression is map-only — the shape a 100 TB quality gate needs. The
  * DuckDB oracle pays the two-shuffle spelling.
  */
case class WordEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_types", LongType, nullable = false),
    StructField("entropy_micro", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"requires string, got $t")
  }

  def compute(text: UTF8String): InternalRow = {
    val words = TokenStats.spacesRe.split(text.toString, -1)
    val counts = new java.util.HashMap[String, Long]()
    var total = 0L
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) {
        counts.merge(w, 1L, (a, b) => a + b)
        total += 1L
      }
      i += 1
    }
    if (total == 0L) InternalRow(0L, 0L, 0L)
    else {
      var s = 0L
      val it = counts.values().iterator()
      while (it.hasNext) {
        val c = it.next()
        s += c * Math.round(Math.log(c.toDouble) * 1000000.0)
      }
      val lnT = Math.round(Math.log(total.toDouble) * 1000000.0)
      InternalRow(total, counts.size.toLong, lnT - s / total)
    }
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordEntropy", this, classOf[WordEntropy].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
