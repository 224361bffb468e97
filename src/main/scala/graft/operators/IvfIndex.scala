package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor index: a k-means coarse
  * quantizer partitions the corpus into cells; search probes only the
  * `nprobe` cells nearest to the query and re-ranks exactly within them.
  *
  * This is the honest scale path for ANN on Spark (s02's label-blocking
  * stands in for it in the oracle suite): at 100 TB the corpus is
  * hash-partitioned by cell, a query touches nprobe/k of the data, and the
  * index build is the standard distributed Lloyd's loop — broadcast the k
  * centroids (tiny), assign map-only, re-average with one shuffle per
  * iteration.
  *
  * Determinism: centroid seeds are the k vectors with the smallest md5-hash
  * of their id (a deterministic "random" sample); no rand() anywhere. The
  * Lloyd mean is accumulated in FIXED-POINT (each component is scaled by
  * 2^20 — an exact power-of-two shift on the float input — floored to a
  * long, and summed as integers): integer addition is associative, so the
  * trained centroids are bit-identical regardless of partitioning or
  * parallelism, on a laptop or a 1000-executor cluster. That makes the
  * whole index build reproducible AND lets a SQL oracle (s04) replay the
  * exact same training — the final division (sum/n/2^20) is one correctly
  * rounded double division followed by an exact exponent shift.
  */
object IvfIndex {

  final case class Centroid(cell: Int, vec: Array[Double])

  private def toDouble(v: Seq[Float]): Array[Double] = v.map(_.toDouble).toArray

  /** Build the quantizer: k centroids after `iters` Lloyd iterations.
    * Centroids live on the driver (k × dim doubles — tiny) and are
    * broadcast into every assignment pass. */
  def train(e: DataFrame, idCol: String, vecCol: String, k: Int,
            iters: Int): Array[Centroid] = {
    val spark = e.sparkSession
    import spark.implicits._
    val seeds = e
      .select(col(idCol).cast("string").as("id"), col(vecCol).as("v"))
      .withColumn("h", conv(substring(md5(col("id")), 1, 8), 16, 10).cast("long"))
      .orderBy(col("h"), col("id"))
      .limit(k)
      .select(col("v")).as[Seq[Float]].collect()
    var centroids = seeds.zipWithIndex.map { case (v, i) => Centroid(i, toDouble(v)) }

    (0 until iters).foreach { _ =>
      val upd = assign(e, idCol, vecCol, centroids)
        .groupBy(col("cell"))
        .agg(FixedPointVectorSum.agg(col(vecCol)).as("acc"),
          count(lit(1)).as("n"))
        .collect()
      centroids = centroids.map { c =>
        upd.find(_.getInt(0) == c.cell).map { r =>
          val acc = r.getSeq[Long](1)
          val n = r.getLong(2)
          Centroid(c.cell, acc.map(_.toDouble / n / FixedPointVectorSum.S).toArray)
        }.getOrElse(c)
      }
    }
    centroids
  }

  /** Typed Aggregator: element-wise fixed-point sum of float vectors.
    * Each component is scaled by 2^20 (exact for floats — a pure exponent
    * shift), floored to a long, and summed as integers, so the reduction is
    * associative/commutative and the result is identical under any
    * partitioning or merge order — the property that makes the distributed
    * Lloyd iteration bit-reproducible. One pass, no row expansion (vs
    * posexplode to dim× rows and a (cell, i) shuffle). */
  object FixedPointVectorSum extends Aggregator[Seq[Float], Array[Long], Seq[Long]] {
    val S = 1048576.0
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b: Array[Long], v: Seq[Float]): Array[Long] = {
      val acc = if (b.length >= v.length) b else java.util.Arrays.copyOf(b, v.length)
      var i = 0
      while (i < v.length) { acc(i) += math.floor(v(i).toDouble * S).toLong; i += 1 }
      acc
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
      var i = 0
      while (i < small.length) { big(i) += small(i); i += 1 }
      big
    }
    override def finish(r: Array[Long]): Seq[Long] = r.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    def agg(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      udaf(this,
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
        .apply(c)
  }

  /** Per-centroid (distance, cell) structs against the vector column; the
    * centroids ride as constant-folded array<double> literals (k × dim
    * doubles — tiny), so the whole scoring stays native codegen — no Scala
    * UDF boxing on the corpus-scale assignment pass. Struct comparison is
    * lexicographic, and cells ascend in array order, so min/sort reproduce
    * nearest()'s first-wins tie-break exactly. */
  private def scoredCells(vecCol: String, centroids: Array[Centroid])
      : org.apache.spark.sql.Column =
    array(centroids.map { c =>
      struct(
        call_function("graft_l2", col(vecCol), typedlit(c.vec.toSeq)).as("d"),
        lit(c.cell).as("cell"))
    }: _*)

  /** Assign every corpus vector to its cell (map-only; centroids inlined
    * as literals). The result is the "index": repartition/bucket by cell
    * for locality at scale. */
  def assign(e: DataFrame, idCol: String, vecCol: String,
             centroids: Array[Centroid]): DataFrame = {
    graft.functions.GraftFunctions.register(e.sparkSession)
    e.withColumn("cell",
      array_min(scoredCells(vecCol, centroids)).getField("cell"))
  }

  /** Every query paired with its `maxProbe` nearest cells, with the cell's
    * closeness rank (1 = nearest). One broadcast of the (tiny) centroid
    * table; the sweep/search layers filter on `cell_rank`. */
  def probeRanked(queries: DataFrame, idCol: String, vecCol: String,
                  centroids: Array[Centroid], maxProbe: Int): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    // array_sort on (d, cell) structs == stable sort by distance with the
    // array-order (ascending-cell) tie-break of the driver-side sortBy
    val probes = transform(
      slice(array_sort(scoredCells("qe", centroids)), 1, maxProbe),
      x => x.getField("cell"))
    queries
      .select(col(idCol).as("qid"), col(vecCol).as("qe"))
      .select(col("qid"), col("qe"),
        posexplode(probes).as(Seq("p", "cell")))
      .select(col("qid"), col("qe"), col("cell"), (col("p") + 1).as("cell_rank"))
  }

  /** Probe: for each query, the `nprobe` nearest cells; candidates come
    * from an equi-join on cell; exact cosine re-rank keeps `topk`. */
  def search(assigned: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, centroids: Array[Centroid], nprobe: Int,
             topk: Int): DataFrame = {
    val q = probeRanked(queries, idCol, vecCol, centroids, nprobe)
      .select(col("qid"), col("qe"), col("cell"))
    val c = assigned.select(col(idCol).as("cid"), col(vecCol).as("ce"), col("cell"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    q.join(c, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        expr("graft_cosine(qe, ce)").as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topk)
      .select(col("qid"), col("rank"), col("cid"), round(col("cos"), 6).as("cosine"))
  }
}
