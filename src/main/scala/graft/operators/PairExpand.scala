package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-robust unordered-pair expansion over per-group member SETS — the
  * "mirror matrix" stage of the cross-source overlap operators (d38/x40):
  * given one row per group key carrying `sort_array(collect_set(member))`,
  * emit every member pair (s1 < s2) of each set as rows.
  *
  * The r13 spelling materialized the full pair list INSIDE one row first —
  * `flatten(transform(ss, a -> transform(filter(ss, b -> b > a), ...)))`
  * builds |ss|^2/2 structs in a single array before exploding. Fine while
  * every per-group member set is small, but a hot group (one gram shared
  * by thousands of sources in a 100 TB corpus) puts |ss|^2 structs in ONE
  * row — the §2.5 skew class the round-13 verdict flagged.
  *
  * This shape never materializes the quadratic pair list anywhere:
  *
  *   posexplode(ss)            -- one row per (i, ss[i]), carrying ss
  *   explode(slice(ss, i+2, n-i-1))  -- partners AFTER position i
  *
  * Each intermediate row is O(|ss|) (the set array plus one member); the
  * |ss|^2 pairs stream out of the second generator row by row, pipelined
  * inside the same stage — no extra exchange, no self-join, and the input
  * is executed exactly ONCE (a hot/cold split by set size would re-run
  * the upstream aggregation per branch). Because `ss` is sorted distinct,
  * position order IS value order, so the emitted pair set is identical to
  * the `b > a` filter form.
  */
object PairExpand {

  /** Expand a set column to unordered pair rows (`s1` < `s2`).
    *
    * @param sets   one row per group; other columns are dropped
    * @param setCol sorted-distinct array column (sort_array(collect_set))
    * @return frame with columns (s1, s2), one row per pair per group
    */
  def pairs(sets: DataFrame, setCol: String): DataFrame =
    sets
      .filter(size(col(setCol)) >= 2)
      .select(col(setCol).as("__pe_ss"),
        posexplode(col(setCol)).as(Seq("__pe_i", "s1")))
      .select(col("s1"),
        explode(expr(
          "slice(__pe_ss, __pe_i + 2, size(__pe_ss) - __pe_i - 1)"))
          .as("s2"))

  /** [[pairs]] aggregated to per-pair group counts — the intersection
    * matrix both call sites build: c(s1, s2) = number of groups whose set
    * contains both members. */
  def pairCounts(sets: DataFrame, setCol: String, out: String): DataFrame =
    pairs(sets, setCol)
      .groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).as(out))
}
