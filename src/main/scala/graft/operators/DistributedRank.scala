package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global row ranks (and exact SQL `NTILE` buckets) WITHOUT a
  * single-partition window.
  *
  * `ROW_NUMBER() OVER (ORDER BY ...)` — the textbook spelling for global
  * ranks, quantile tiers, and curriculum orderings — plans a Window over ONE
  * partition: every row funnels through a single task, the exact shape that
  * dies at 100 TB. This helper computes the identical ranks with a
  * three-step distributed plan:
  *
  *   1. one `approxQuantile` pass over a numeric order surrogate yields
  *      ≤ `parts` cut points (bounded driver state, like the IVF centroids);
  *   2. each row maps to a bucket by comparing the surrogate against the
  *      broadcast cuts (deterministic, map-only — NOT repartitionByRange,
  *      whose sampled boundaries differ between the count and rank jobs);
  *      one tiny aggregation counts rows per bucket (≤ `parts` scalars on
  *      the driver) and prefix-sums them into bucket rank offsets;
  *   3. rank = bucket offset + `ROW_NUMBER` over a window PARTITIONED by
  *      bucket — every window partition is ~1/parts of the data and they
  *      all sort in parallel.
  *
  * Because the sort key must be a strict total order (callers include a
  * unique tiebreak column) the resulting rank is exactly the rank the global
  * window would produce, regardless of where the approximate cuts landed —
  * cut skew only unbalances partition sizes, never changes an answer.
  *
  * The cut/count passes re-execute the upstream plan (twice more than the
  * single-window form). At gate scale that is noise; at 100 TB the upstream
  * frame would be persisted first (the d02/d13 shared-pass lifecycle), which
  * callers with non-trivial parents already do.
  */
object DistributedRank {

  /** Append an exact 1-based global rank column `out` (LongType).
    *
    * @param surrogate numeric expression that coarsens a PREFIX of
    *                  `sortCols`: surrogate(a) < surrogate(b) must imply a
    *                  sorts before b (ties on the surrogate are broken inside
    *                  a bucket by the full `sortCols` sort). Must be
    *                  non-null and exactly representable as a double
    *                  (|v| < 2^53).
    * @param sortCols  the full strict-total-order sort key.
    * @return (frame with `out` appended, total row count)
    */
  def withGlobalRank(df: DataFrame, surrogate: Column, sortCols: Seq[Column],
      out: String, parts: Int = 32): (DataFrame, Long) = {
    val b = "__dr_bucket"
    val sCol = "__dr_surrogate"
    val withS = df.withColumn(sCol, surrogate.cast("double"))
    val probs = (1 until parts).map(_.toDouble / parts).toArray
    val cuts =
      if (parts <= 1) Array.empty[Double]
      else withS.stat.approxQuantile(sCol, probs, 1.0 / (4 * parts)).distinct.sorted
    // bucket = number of cuts <= surrogate: all rows sharing a surrogate land
    // in one bucket, and buckets are contiguous value ranges, so
    // (bucket, sortCols) ordering == global sortCols ordering
    val bucketCol = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(col(sCol) >= c, 1).otherwise(0)
    }
    val bucketed = withS.withColumn(b, bucketCol)
    val counts = bucketed.groupBy(col(b)).count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = counts.map(_._2).sum
    val offsets = counts.map(_._1).zip(
      counts.map(_._2).scanLeft(0L)(_ + _).init)
    val offCol = offsets.foldLeft(lit(0L)) { case (acc, (id, off)) =>
      when(col(b) === id, off).otherwise(acc)
    }
    val w = Window.partitionBy(col(b)).orderBy(sortCols: _*)
    val ranked = bucketed
      .withColumn(out, row_number().over(w).cast("long") + offCol)
      .drop(b, sCol)
    (ranked, total)
  }

  /** Two independent exact global ranks in SHARED passes: one multi-column
    * `approxQuantile` job and ONE pairwise bucket-count job (≤ parts²
    * bounded rows on the driver, marginals derived there) replace the two
    * per-dimension cut/count pass pairs, and both bucket-partitioned rank
    * windows ride a single downstream plan — half the upstream
    * re-executions for layout jobs that rank several dimensions (q91's
    * z-order cells). Ranks are exactly [[withGlobalRank]]'s (cut placement
    * only balances partitions, never changes an answer). */
  def withGlobalRanks2(df: DataFrame,
      s1: Column, sort1: Seq[Column], out1: String,
      s2: Column, sort2: Seq[Column], out2: String,
      parts: Int = 32): (DataFrame, Long) = {
    val c1 = "__dr_s1"; val c2 = "__dr_s2"
    val b1 = "__dr_b1"; val b2 = "__dr_b2"
    val withS = df.withColumn(c1, s1.cast("double"))
      .withColumn(c2, s2.cast("double"))
    val probs = (1 until parts).map(_.toDouble / parts).toArray
    val cuts = withS.stat.approxQuantile(Array(c1, c2), probs, 1.0 / (4 * parts))
    def bCol(sc: String, cs: Array[Double]): Column =
      cs.foldLeft(lit(0)) { (acc, c) => acc + when(col(sc) >= c, 1).otherwise(0) }
    val bucketed = withS
      .withColumn(b1, bCol(c1, cuts(0).distinct.sorted))
      .withColumn(b2, bCol(c2, cuts(1).distinct.sorted))
    val pairs = bucketed.groupBy(col(b1), col(b2)).count().collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val total = pairs.map(_._3).sum
    def offCol(bc: String, marginal: Seq[(Int, Long)]): Column = {
      val sorted = marginal.sortBy(_._1)
      val offs = sorted.map(_._1).zip(sorted.map(_._2).scanLeft(0L)(_ + _).init)
      offs.foldLeft(lit(0L)) { case (acc, (id, off)) =>
        when(col(bc) === id, off).otherwise(acc)
      }
    }
    val m1 = pairs.groupBy(_._1).view.mapValues(_.map(_._3).sum).toSeq
    val m2 = pairs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq
    val w1 = Window.partitionBy(col(b1)).orderBy(sort1: _*)
    val w2 = Window.partitionBy(col(b2)).orderBy(sort2: _*)
    val ranked = bucketed
      .withColumn(out1, row_number().over(w1).cast("long") + offCol(b1, m1))
      .withColumn(out2, row_number().over(w2).cast("long") + offCol(b2, m2))
      .drop(b1, b2, c1, c2)
    (ranked, total)
  }

  /** Exact SQL `NTILE(n)` bucket (1-based) from a 1-based global rank: the
    * first `total % n` buckets carry `total/n + 1` rows, the rest `total/n`
    * — bit-identical to the window function, but computed map-only from the
    * distributed rank. */
  def ntileFromRank(rank: Column, n: Long, total: Long): Column = {
    val base = total / n
    val rem = total % n
    val cutoff = (base + 1) * rem
    // Column./ is DOUBLE division; (a - a % b) / b is the exact integral
    // quotient (the numerator is an exact multiple of b, so the correctly-
    // rounded double division is exact — no floor-at-a-ulp hazard)
    def intDiv(a: Column, b: Long): Column = ((a - a % b) / b).cast("long")
    // base == 0 (fewer rows than tiles) keeps every row in the first branch
    when(rank <= cutoff, intDiv(rank - 1, base + 1) + 1)
      .otherwise(intDiv(rank - 1 - cutoff, math.max(base, 1L)) + 1 + rem)
  }
}
