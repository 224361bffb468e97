package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Positional join — DuckDB's `POSITIONAL JOIN` (row-by-row pairing, the
  * shorter side padded with NULLs), part of the reference's delegated SQL
  * surface (SURVEY §2.2; the reference passes SQL through verbatim,
  * reference: KwackEngine.java:232).
  *
  * DuckDB pairs rows by physical scan order. A distributed engine has no
  * stable "physical order", so this operator requires an EXPLICIT per-side
  * ordering and pairs by rank under it — the only semantics that survive
  * partitioned execution deterministically.
  *
  * Scale: each side is range-partition sorted (`orderBy`) and then numbered
  * with `zipWithIndex`, which computes per-partition offsets with one small
  * count job — positions are assigned in parallel, NOT by collapsing into a
  * single-partition global window (the naive `row_number() OVER (ORDER BY
  * ...)` plan, which serializes the whole table through one task at 100 TB).
  * The final pairing is an ordinary equi-join on the position column.
  */
object PositionalJoin {

  /** Number rows by rank under `order` without a global single partition.
    * The sorted RDD is persisted before zipWithIndex: zipWithIndex runs an
    * eager job to compute per-partition offsets, and without the persist
    * the full range-partition sort would execute a second time when the
    * join consumes the numbered rows. The cached partitions are released
    * by the ContextCleaner once the result frame is no longer referenced. */
  private def withPos(df: DataFrame, order: Seq[Column]): DataFrame = {
    val sorted = df.orderBy(order: _*).rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val schema = df.schema.add("pos", LongType, nullable = false)
    val rdd = sorted.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Pair the i-th row of `left` (under `leftOrder`) with the i-th row of
    * `right` (under `rightOrder`); unmatched positions keep the longer
    * side's row with NULLs for the other (DuckDB's padding semantics).
    * Column sets must be disjoint and neither side may already have a
    * `pos` column (it carries the assigned position in the output). */
  def byOrder(left: DataFrame, leftOrder: Seq[Column],
              right: DataFrame, rightOrder: Seq[Column]): DataFrame = {
    require(!left.columns.contains("pos") && !right.columns.contains("pos"),
      "positional join reserves the column name 'pos'; rename it upstream")
    withPos(left, leftOrder)
      .join(withPos(right, rightOrder), Seq("pos"), "full_outer")
  }
}
