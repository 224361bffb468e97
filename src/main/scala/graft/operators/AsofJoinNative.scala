package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Cast, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native AS-OF join — the full custom-operator stack (logical node +
  * planner strategy + physical operator), for the one relational operator in
  * the reference's delegated surface with no Spark built-in (DuckDB
  * `ASOF JOIN`, SURVEY.md §2.2 "Joins"; the reference itself implements no
  * joins — reference: KwackEngine.java:232 delegates SQL verbatim).
  *
  * Physical algorithm: both sides are hash-clustered on the join keys and
  * sorted by (keys..., ts) — declared via requiredChildDistribution /
  * requiredChildOrdering, so EnsureRequirements plans the exchanges and
  * per-partition sorts (and AQE can still re-plan them). Each co-partitioned
  * pair is then merged in one streaming pass: for every left row, the right
  * cursor advances while right.key < left.key, or keys match and
  * right.ts <= left.ts; the last right row consumed with a matching key is
  * the as-of match. O(|L|+|R|) per partition, zero buffering beyond one row.
  *
  * Scale: identical cost shape to a sort-merge join — one shuffle per side,
  * sort, merge — which is the plan a 1000-executor cluster wants. Unlike the
  * window composition (AsofJoin.asofLeft) there is no union row-widening and
  * no window-frame buffer; unlike a range join there is no O(|L|·|R|)
  * candidate explosion per key.
  */
object AsofJoinNative {

  /** Logical placeholder: constructed from already-analyzed child plans, so
    * it is resolved as soon as its children are. */
  case class AsofJoinNode(left: LogicalPlan, right: LogicalPlan,
      leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
      leftTs: Attribute, rightTs: Expression,
      payload: Seq[Attribute]) extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ payload.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
      copy(left = newLeft, right = newRight)
  }

  object AsofJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsofJoinNode(l, r, lk, rk, lts, rts, payload) =>
        AsofJoinExec(lk, rk, lts, rts, payload, planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  case class AsofJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
      leftTs: Expression, rightTs: Expression, payload: Seq[Attribute],
      left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ payload.map(_.withNullability(true))

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
      // payload columns join the right ordering as a tiebreak: Spark's sort
      // is not stable, so without one, duplicate (key, ts) rows would make
      // "last consumed wins" depend on partitioning. With it, the winner is
      // deterministically the lexicographically-greatest orderable payload.
      rightKeys.map(SortOrder(_, Ascending)) ++ (SortOrder(rightTs, Ascending) +:
        payload.filter(a => RowOrdering.isOrderable(a.dataType))
          .map(SortOrder(_, Ascending))))

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val leftOut = left.output
      val rightOut = right.output
      val outAttrs = output
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(leftKeys, leftOut)
        val rKeyProj = UnsafeProjection.create(rightKeys, rightOut)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(leftKeys.map(_.dataType))
        val lTsProj = UnsafeProjection.create(Seq(leftTs), leftOut)
        val rTsProj = UnsafeProjection.create(Seq(rightTs), rightOut)
        val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(leftTs.dataType))
        val payloadProj = UnsafeProjection.create(payload, rightOut)
        val nullPayload = new GenericInternalRow(payload.length)
        val joined = new JoinedRow
        // bind against NULLABLE payload attrs: the no-match row carries nulls
        val outProj = UnsafeProjection.create(outAttrs,
          leftOut ++ payload.map(_.withNullability(true)))

        val rBuf = rIter.buffered
        // last right row consumed, as (its key copy, its payload copy)
        var curKey: UnsafeRow = null
        var curPayload: UnsafeRow = null

        lIter.map { lRow =>
          val lKey = lKeyProj(lRow)
          val lTsRow = lTsProj(lRow)
          var advance = true
          while (advance && rBuf.hasNext) {
            val head = rBuf.head
            val c = keyOrd.compare(rKeyProj(head), lKey)
            if (c < 0 || (c == 0 && tsOrd.compare(rTsProj(head), lTsRow) <= 0)) {
              val r = rBuf.next()
              // SQL ASOF semantics: r.ts <= l.ts is never true for a NULL
              // r.ts — consume the row (nulls sort first) but don't let it
              // become the match
              if (!rTsProj(r).isNullAt(0)) {
                curKey = rKeyProj(r).copy()
                curPayload = payloadProj(r).copy()
              }
            } else advance = false
          }
          // SQL equality semantics: a NULL key never matches (the natural
          // ordering would otherwise compare null == null); likewise a NULL
          // left ts satisfies no r.ts <= l.ts predicate
          val matched = curKey != null && !lKey.anyNull && !curKey.anyNull &&
            !lTsRow.isNullAt(0) && keyOrd.compare(curKey, lKey) == 0
          outProj(joined(lRow, if (matched) curPayload else nullPayload))
        }
      }
    }
  }

  /** Left as-of join via the native operator. Registers the planner strategy
    * on the session (idempotent). The right timestamp is cast to the left
    * timestamp's type when they differ (e.g. DATE vs TIMESTAMP), matching
    * SQL union coercion. */
  /** FORWARD as-of (the match is the SMALLEST right.ts >= left.ts — or
    * strictly > with `strict`): reduced to the backward merge by negating
    * both time axes into epoch-micros longs — the largest -r.ts <= -l.ts is
    * exactly the next-following match, and strictness is the exact integer
    * identity r.ts > l.ts ⇔ -r.ts <= -l.ts - 1 (no epsilon, micros are
    * integers). The negations ride as two helper columns dropped on return;
    * the physical plan is the SAME one-shuffle-per-side sort-merge exec as
    * the backward direction. */
  def asofLeftForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String,
                      strict: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.expr
    val ln = "__graft_neg_lts"
    val rn = "__graft_neg_rts"
    val adj = if (strict) " - 1" else ""
    val l2 = left.withColumn(ln,
      expr(s"-unix_micros(cast(`$leftTs` as timestamp))$adj"))
    val r2 = right.withColumn(rn,
      expr(s"-unix_micros(cast(`$rightTs` as timestamp))"))
    asofLeft(l2, r2, keys, ln, rn).drop(ln)
  }

  def asofLeft(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String): DataFrame = {
    val spark = left.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val registered =
      spark.sessionState.planner.strategies.contains(AsofJoinStrategy) ||
        spark.experimental.extraStrategies.contains(AsofJoinStrategy)
    if (!registered) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    }
    val lPlan = left.queryExecution.analyzed
    // self-join lineage: the analyzer's DeduplicateRelations does not know
    // this node, so re-alias the right side ourselves whenever its exprIds
    // overlap the left's — Alias always mints fresh ids
    val rPlan0 = right.queryExecution.analyzed
    val leftIds = lPlan.output.map(_.exprId).toSet
    val rPlan: LogicalPlan =
      if (rPlan0.output.exists(a => leftIds.contains(a.exprId)))
        org.apache.spark.sql.catalyst.plans.logical.Project(
          rPlan0.output.map(a =>
            org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()),
          rPlan0)
      else rPlan0
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    val lk = keys.map(attr(lPlan, _))
    val rk = keys.map(attr(rPlan, _))
    lk.zip(rk).foreach { case (l, r) =>
      require(l.dataType == r.dataType,
        s"as-of join key type mismatch: ${l.name} ${l.dataType} vs ${r.dataType} — " +
          "hash partitioning would diverge and equal keys would never meet; " +
          "cast the inputs to a common type first")
    }
    val lts = attr(lPlan, leftTs)
    val rts0 = attr(rPlan, rightTs)
    val tz = Some(spark.sessionState.conf.sessionLocalTimeZone)
    val rts: Expression =
      if (rts0.dataType == lts.dataType) rts0 else Cast(rts0, lts.dataType, tz)
    val payload = rPlan.output.filterNot(a => rk.exists(_.exprId == a.exprId) || a.exprId == rts0.exprId)
    org.apache.spark.sql.GraftPlanBridge.ofRows(spark,
      AsofJoinNode(lPlan, rPlan, lk, rk, lts, rts, payload))
  }
}
