package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-splitting equi-join (the "salting" pattern for hot keys at scale).
  *
  * AQE's skew-join handling covers sort-merge joins after the fact; salting
  * is the a-priori tool when a known-skewed key (null keys, celebrity users,
  * default values) would overwhelm single reducers. The left (skewed) side
  * gets a deterministic salt in [0, buckets); the right side is replicated
  * once per bucket; the join key becomes (key..., salt), spreading each hot
  * key over `buckets` reducers.
  *
  * Cost model: right side is duplicated `buckets` times — use for
  * moderate-size right sides (or pair with broadcast for small ones, where
  * salting is unnecessary anyway). The salt is a hash of the whole left row,
  * so retries/speculative tasks salt identically (no rand()).
  */
object SaltedJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // right/full outer would emit each unmatched RIGHT row once per salt
    // replica — reject join types with right-preserving semantics
    val normalized = joinType.toLowerCase.replace("_", "")
    require(!Set("right", "rightouter", "full", "fullouter", "outer")
        .contains(normalized),
      s"saltedJoin replicates the right side; '$joinType' would duplicate unmatched right rows")
    val saltCol = "__graft_salt"
    val salted = left.withColumn(saltCol,
      pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(buckets.toLong)))
    val replicated = right.withColumn(saltCol,
      explode(array((0 until buckets).map(b => lit(b.toLong)): _*)))
    salted.join(replicated, keys :+ saltCol, joinType).drop(saltCol)
  }
}
