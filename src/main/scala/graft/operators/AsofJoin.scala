package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Left as-of join: for each left row, attach the latest right row whose
  * timestamp is <= the left row's timestamp, per join key.
  *
  * The reference's query surface inherits ASOF JOIN from DuckDB SQL
  * (SURVEY.md §2.2 "Joins"; the reference itself implements no join —
  * reference: KwackEngine.java:232 delegates SQL verbatim). Spark has no
  * built-in ASOF, so this composes one from primitives:
  *
  * union both sides tagged by origin, hash-partition by key, sort by
  * (time, side) within partition, and carry the latest right-side payload
  * forward with last(struct, ignoreNulls) over an unbounded-preceding
  * window; left rows then hold the as-of match.
  *
  * Scale: ONE shuffle per side (the window's hash partitioning by key) and
  * a per-partition sort — the same cost shape as a sort-merge join. The
  * naive alternative (range join + row_number) explodes to O(|L|·|R|) pairs
  * per key before pruning; this stays O(|L|+|R|). Right-side payload moves
  * as a single struct so all carried columns come from the same right row.
  */
object AsofJoin {

  /** @param keys     equi-join column names (must exist on both sides)
    * @param leftTs   left timestamp column name
    * @param rightTs  right timestamp column name; right columns other than
    *                 keys/rightTs are attached to each left row (null when
    *                 no right row precedes it)
    */
  def asofLeft(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String): DataFrame = {
    val payloadCols = right.columns.filterNot(c => keys.contains(c) || c == rightTs)
    val payload = struct(payloadCols.map(col).toSeq: _*)

    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("__t") :+ payload.as("__p")): _*)
      .withColumn("__side", lit(0))
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTs))
      .withColumn("__p", lit(null).cast(r.schema("__p").dataType))
      .withColumn("__side", lit(1))
      .select((keys.map(col) :+ col("__t") :+ col("__p") :+ col("__side"))
        ++ leftCols.filterNot(keys.contains).map(col): _*)

    // right rows sort before left rows at equal time => "<=" semantics
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val out = leftCols.map(col) ++
      payloadCols.map(c => col("__match").getField(c).as(c))
    filled.select(out: _*)
  }
}
