package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity over two float/double array columns as a native
  * codegen'd Catalyst expression.
  *
  * The composable form (`aggregate(zip_with(...))`) is an interpreted
  * higher-order function — it allocates a zipped array per row and evaluates
  * a lambda per element outside whole-stage codegen. This expression is the
  * hot-path replacement: one fused loop, no allocation, inside codegen
  * (the preference order from the build brief: native Expression with
  * doGenCode > Scala UDF > interpreted lambdas).
  *
  * Determinism contract: the three accumulators (dot, |a|^2, |b|^2) are
  * summed in index order with each element cast to double first — the exact
  * fold order of the composable form and of the DuckDB oracle rendering
  * (QueryHelpers.cosineSql), so results are bit-identical.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_similarity requires float/double arrays, got ${left.dataType} / ${right.dataType}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val xIsFloat = elemType(left) == FloatType
    val yIsFloat = elemType(right) == FloatType
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (xIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val yGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.$xGet($i);
         |  double $yi = (double) $b.$yGet($i);
         |  $dot += $xi * $yi;
         |  $na += $xi * $xi;
         |  $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  private def lit(e: Expression): Any =
    e.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal].value

  /** Name -> expression builder for every native function; consumed both by
    * the imperative [[register]] path and by graft.GraftExtensions. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> (exprs => CosineSimilarity(exprs(0), exprs(1))),
    "graft_dot" -> (exprs => DotProduct(exprs(0), exprs(1))),
    "graft_l2" -> (exprs => L2Distance(exprs(0), exprs(1))),
    "graft_pq_adc" -> (exprs => PqAdc(exprs(0), exprs(1), exprs(2))),
    "graft_shingles" -> (exprs => WordShingles(exprs(0))),
    "graft_char_ngrams" -> (exprs => CharNgrams(exprs(0))),
    "graft_char_grams" -> (exprs => CharNgramsK(exprs(0),
      lit(exprs(1)).asInstanceOf[Number].intValue())),
    "graft_cdc_chunks" -> (exprs => CdcChunks(exprs(0))),
    "graft_winnow" -> (exprs => WinnowFingerprints(exprs(0),
      lit(exprs(1)).asInstanceOf[Number].intValue(),
      lit(exprs(2)).asInstanceOf[Number].intValue(),
      lit(exprs(3)).asInstanceOf[Number].longValue())),
    "graft_md5i_array" -> (exprs => Md5IntArray(exprs(0))),
    "graft_pairs" -> (exprs => PostingPairs(exprs(0))),
    "graft_icount" -> (exprs => IntersectCountStr(exprs(0), exprs(1))),
    "graft_simhash" -> (exprs => SimHash32(exprs(0))),
    "graft_minhash" -> (exprs => MinHashAffine(exprs(0),
      lit(exprs(1)).asInstanceOf[Number].longValue(),
      lit(exprs(2)).asInstanceOf[Number].longValue(),
      lit(exprs(3)).asInstanceOf[Number].longValue())),
    "graft_lm_fold" -> (exprs => LmBigramFold(exprs(0), exprs(1))),
    "graft_bloom_contains" -> (exprs => BloomMightContain(exprs(0), exprs(1))),
    "graft_token_stats" -> (exprs => TokenStats(exprs.head,
      exprs.tail.map(e => lit(e).toString))),
    "graft_word_entropy" -> (exprs => WordEntropy(exprs(0))),
    // union-type accessors over the engine's tagged-struct convention
    // (SURVEY §7.3; DuckDB surface: union_tag / union_extract)
    "union_tag" -> (exprs => org.apache.spark.sql.catalyst.analysis
      .UnresolvedExtractValue(exprs(0),
        org.apache.spark.sql.catalyst.expressions.Literal("tag"))),
    "union_extract" -> (exprs => org.apache.spark.sql.catalyst.analysis
      .UnresolvedExtractValue(exprs(0), exprs(1))))

  // once-per-session guard: Engine's constructor registers on every
  // construction (hundreds per suite run) and each replace logs a WARN —
  // weak keys so a stopped session never pins
  private val registeredSessions =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotent registration of the engine's native functions on a
    * session, plus the DuckDB-name alias surface (DuckAliases). */
  def register(spark: SparkSession): Unit = {
    if (registeredSessions.putIfAbsent(spark,
        java.lang.Boolean.TRUE) != null) return
    val r = spark.sessionState.functionRegistry
    (builders ++ DuckAliases.builders ++ DuckScalars.builders ++
        DuckListFns.builders ++ DuckAggs.builders).foreach { case (name, b) =>
      r.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}
