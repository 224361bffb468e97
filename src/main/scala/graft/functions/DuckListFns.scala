package graft.functions

import org.apache.spark.sql.catalyst.analysis.{UnresolvedExtractValue, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Wave-5 of the DuckDB LIST name surface, built entirely from Spark's
  * codegen'd higher-order machinery (ZipWith / ArrayTransform /
  * ArrayFilter / ArraySort compose into exactly the per-row loops a
  * hand-rolled expression would emit — no UDFs, no shuffles implied).
  *
  * Oracle-pinned semantics (DuckDB 1.0.0 probes, q138 runs identical
  * text through both engines):
  *  - list_has_any / list_has_all IGNORE NULL elements on both sides
  *    (`list_has_all([1], [1, NULL])` = true, `list_has_any([1,NULL],
  *    [NULL])` = false); empty needle => true for has_all, false for
  *    has_any.
  *  - list_intersect: distinct, NULLs dropped; DuckDB's ORDER is its
  *    hash-set iteration order where Spark's array_intersect keeps
  *    first-argument order — a documented divergence, so ordered
  *    comparisons wrap it in list_sort (q138 does).
  *  - list_select: 1-based indices; out-of-range (including 0) yields a
  *    NULL slot. DuckDB ERRORS on a NULL index; this engine is lenient
  *    (NULL slot) — documented divergence, gates use valid indices.
  *  - list_where: boolean mask selection; DuckDB errors on NULL mask
  *    elements, here they drop (lenient, same note).
  *  - list_grade_up: 1-based indices that would sort the list ascending,
  *    NULLS LAST, ties stable (pinned: [3,1,3,NULL,2] -> [2,5,1,3,4]).
  *  - list_resize(l, n[, pad]): truncate or pad (default NULL slots).
  *  - range / generate_series scalar forms: range is end-EXCLUSIVE,
  *    generate_series end-INCLUSIVE; empty when the step direction
  *    contradicts the bounds; range(a, b, 0) = [] (DuckDB 1.0's
  *    behavior); NULL bound/step => NULL. Spark's sequence() is always
  *    end-inclusive and errors on contradictory bounds, hence the
  *    CaseWhen guards.
  *
  * Ref behavior: kwack delegates these names to the DuckDB binary
  * (KwackEngine.java:232).
  */
object DuckListFns {

  private def fn(name: String, args: Expression*): Expression =
    UnresolvedFunction(name, args.toIndexedSeq, isDistinct = false)

  private def lv(name: String): UnresolvedNamedLambdaVariable =
    UnresolvedNamedLambdaVariable(Seq(name))

  private def size(e: Expression): Expression =
    Size(e, legacySizeOfNull = false)

  /** arrays_overlap over NULL-compacted inputs: DuckDB ignores NULL
    * elements where Spark's overlap returns NULL for them. */
  private def listHasAny(a: Seq[Expression]): Expression =
    ArraysOverlap(ArrayCompact(a(0)), ArrayCompact(a(1)))

  /** every non-NULL needle element present in l — spelled as
    * array_except(compact(needle), l) being empty, which (unlike a
    * lambda over the needle) type-coerces an EMPTY [] needle cleanly. */
  private def listHasAll(a: Seq[Expression]): Expression =
    If(Or(IsNull(a(0)), IsNull(a(1))), Literal(null, BooleanType),
      EqualTo(size(ArrayExcept(ArrayCompact(a(1)), a(0))), Literal(0)))

  private def listIntersect(a: Seq[Expression]): Expression =
    ArrayIntersect(ArrayCompact(a(0)), ArrayCompact(a(1)))

  /** slice(zip_with(l, sequence(1, n), (x, i) -> pick), 1, n): zip_with
    * pads to max(len, n) with NULL lambda inputs, the slice truncates —
    * one pass, no length branch. */
  private def listResize(a: Seq[Expression]): Expression = {
    val l = a(0)
    val n = Cast(a(1), IntegerType)
    val x = lv("graft_rx"); val i = lv("graft_ri")
    val pick: Expression =
      if (a.length > 2) If(LessThanOrEqual(i, size(l)), x, a(2)) else x
    Slice(
      ZipWith(l, fn("sequence", Literal(1), fn("greatest", Literal(1), n)),
        LambdaFunction(pick, Seq(x, i))),
      Literal(1), fn("greatest", Literal(0), n))
  }

  /** transform(idxs, i -> valid(i) ? l[i] : NULL), 1-based. */
  private def listSelect(a: Seq[Expression]): Expression = {
    val i = lv("graft_si")
    ArrayTransform(a(1), LambdaFunction(
      If(And(GreaterThanOrEqual(Coalesce(Seq(i, Literal(0))), Literal(1)),
          LessThanOrEqual(i, size(a(0)))),
        ElementAt(a(0), Cast(i, IntegerType)),
        Literal(null, NullType)), Seq(i)))
  }

  /** filter(zip_with(l, mask, struct), s -> s.m) |> transform(_.x). */
  private def listWhere(a: Seq[Expression]): Expression = {
    val x = lv("graft_wx"); val m = lv("graft_wm"); val s = lv("graft_ws")
    val zipped = ZipWith(a(0), a(1),
      LambdaFunction(CreateNamedStruct(Seq(Literal("x"), x,
        Literal("m"), m)), Seq(x, m)))
    val kept = ArrayFilter(zipped, LambdaFunction(
      EqualTo(UnresolvedExtractValue(s, Literal("m")), Literal(true)), Seq(s)))
    val s2 = lv("graft_ws2")
    ArrayTransform(kept, LambdaFunction(
      UnresolvedExtractValue(s2, Literal("x")), Seq(s2)))
  }

  /** sort struct(is_null, value, idx) — natural struct ordering gives
    * NULLS LAST (flag first) and stable ties (idx last) — then project
    * the 1-based idx. */
  private def listGradeUp(a: Seq[Expression]): Expression = {
    val x = lv("graft_gx"); val i = lv("graft_gi")
    val tagged = ArrayTransform(a(0), LambdaFunction(
      CreateNamedStruct(Seq(
        Literal("n"), If(IsNull(x), Literal(1), Literal(0)),
        Literal("v"), x,
        Literal("i"), Add(i, Literal(1)))), Seq(x, i)))
    val s = lv("graft_gs")
    ArrayTransform(fn("array_sort", tagged), LambdaFunction(
      UnresolvedExtractValue(s, Literal("i")), Seq(s)))
  }

  /** Shared guard for the scalar series forms; stopAdjust is 0 for the
    * inclusive generate_series, ±1 off the stop for the exclusive range. */
  private def series(a: Seq[Expression], exclusive: Boolean): Expression = {
    val (start, stop, step) = a.length match {
      case 1 => (Literal(0L): Expression, Cast(a(0), LongType),
        Literal(1L): Expression)
      case 2 => (Cast(a(0), LongType), Cast(a(1), LongType),
        Literal(1L): Expression)
      case _ => (Cast(a(0), LongType), Cast(a(1), LongType),
        Cast(a(2), LongType))
    }
    val emptyArr = Slice(fn("sequence", Literal(0L), Literal(0L)),
      Literal(1), Literal(0))
    val adjStop =
      if (exclusive)
        Subtract(stop, If(GreaterThan(step, Literal(0L)),
          Literal(1L), Literal(-1L)))
      else stop
    val contradictory =
      if (exclusive)
        Or(And(GreaterThan(step, Literal(0L)),
            GreaterThanOrEqual(start, stop)),
          And(LessThan(step, Literal(0L)), LessThanOrEqual(start, stop)))
      else
        Or(And(GreaterThan(step, Literal(0L)), GreaterThan(start, stop)),
          And(LessThan(step, Literal(0L)), LessThan(start, stop)))
    CaseWhen(Seq(
      (Or(Or(IsNull(start), IsNull(stop)), IsNull(step)),
        Literal(null, ArrayType(LongType))),
      (EqualTo(step, Literal(0L)), emptyArr),
      (contradictory, emptyArr)),
      fn("sequence", start, adjStop, step))
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "list_has_any" -> listHasAny,
    "array_has_any" -> listHasAny,
    "list_has_all" -> listHasAll,
    "array_has_all" -> listHasAll,
    "list_intersect" -> listIntersect,
    "list_resize" -> listResize,
    "array_resize" -> listResize,
    "list_select" -> listSelect,
    "array_select" -> listSelect,
    "list_where" -> listWhere,
    "array_where" -> listWhere,
    "list_grade_up" -> listGradeUp,
    "array_grade_up" -> listGradeUp,
    "list_apply" -> (a => ArrayTransform(a(0), a(1))),
    "array_apply" -> (a => ArrayTransform(a(0), a(1))),
    "apply" -> (a => ArrayTransform(a(0), a(1))),
    "range" -> (a => series(a, exclusive = true)),
    "generate_series" -> (a => series(a, exclusive = false)))
}
