package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import QueryHelpers._

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * Three tiers, as a production pipeline would stage them:
  *  - s01: brute-force exact top-k — the correctness baseline. Queries are
  *    broadcast (tiny side), candidates stream; at 100 TB this is the
  *    "score a handful of queries against the corpus" shape: one pass,
  *    no shuffle on the corpus side until the per-query top-k aggregation.
  *  - s02: IVF-style probing — a coarse quantizer partitions the corpus
  *    (here the pre-assigned label plays the centroid-assignment role, the
  *    same join shape a kmeans-trained quantizer produces); search touches
  *    one cell instead of the corpus.
  *  - s03: random-hyperplane LSH (SimHash for cosine) — signature is a
  *    map-only fold per row with a FIXED ±1 hyperplane matrix (inlined as
  *    literals so the DuckDB oracle computes the identical signature);
  *    candidates come from signature-bucket equi-joins.
  */
object Similarity {

  /** Exact brute-force top-5 cosine neighbors for query vectors (vec_id<5). */
  private val s01: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val scored = q.hint("broadcast").crossJoin(c)
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), expr(cosineExpr("qe", "ce")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("rank"), col("cid"), round(col("cos"), 6).as("cosine"))
      .orderBy(col("qid"), col("rank"))
  }

  private val s01Sql =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
       |scored AS (
       |  SELECT qid, c.vec_id AS cid, ${cosineSql("qe", "c.embedding")} AS cos
       |  FROM q CROSS JOIN embeddings c WHERE qid <> c.vec_id),
       |ranked AS (
       |  SELECT qid, cid, cos,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
       |  FROM scored)
       |SELECT qid, rank, cid, ROUND(cos, 6) AS cosine
       |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  /** IVF-style probe: coarse cell = label; top-3 within the query's cell. */
  private val s02: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("label"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cid"), col("label"), col("embedding").as("ce"))
    val scored = q.join(c, Seq("label"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("label"), col("cid"), expr(cosineExpr("qe", "ce")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("label"), col("rank"), col("cid"), round(col("cos"), 6).as("cosine"))
      .orderBy(col("qid"), col("rank"))
  }

  private val s02Sql =
    s"""WITH q AS (SELECT vec_id AS qid, label, embedding AS qe FROM embeddings WHERE vec_id < 20),
       |scored AS (
       |  SELECT qid, q.label AS label, c.vec_id AS cid, ${cosineSql("qe", "c.embedding")} AS cos
       |  FROM q JOIN embeddings c ON q.label = c.label AND qid <> c.vec_id),
       |ranked AS (
       |  SELECT qid, label, cid, cos,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
       |  FROM scored)
       |SELECT qid, label, rank, cid, ROUND(cos, 6) AS cosine
       |FROM ranked WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  // ---- s03: random-hyperplane LSH -------------------------------------
  private val nPlanes = 8
  private val dims = 64

  /** Fixed ±1 hyperplane matrix from a deterministic LCG (seed 42), inlined
    * into both dialects as literals. */
  private val planes: Seq[Seq[Int]] = {
    var state = 42L
    def next(): Long = { state = state * 6364136223846793005L + 1442695040888963407L; state }
    Seq.fill(nPlanes)(Seq.fill(dims)(if (((next() >>> 32) & 1L) == 1L) 1 else -1))
  }

  private def sigExprSpark(e: String): String = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val arr = p.mkString("array(", ", ", ")")
      // graft_dot: native in-order fold, bit-identical to the interpreted
      // aggregate/zip_with composition (the literal array constant-folds)
      s"(CASE WHEN graft_dot($e, $arr) > 0 THEN ${1 << i} ELSE 0 END)"
    }
    bits.mkString("(", " + ", ")")
  }

  private def sigExprSql(e: String): String = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val arr = p.mkString("[", ", ", "]")
      s"(CASE WHEN LIST_REDUCE(LIST_PREPEND(0.0::DOUBLE, [z[1]::DOUBLE * z[2]::DOUBLE FOR z IN LIST_ZIP($e, $arr)]), (a, v) -> a + v) > 0 THEN ${1 << i} ELSE 0 END)"
    }
    bits.mkString("(", " + ", ")")
  }

  /** LSH-bucketed ANN: 8-bit hyperplane signature, bucket equi-join, exact
    * cosine re-rank within bucket, top-3 per query (vec_id < 20). */
  private val s03: Q = (s, dir) => {
    // signatures are computed once and persisted; both the query side and the
    // candidate side read the materialized frame (at 100 TB: the signature
    // index a pipeline writes once and probes many times)
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), expr(sigExprSpark("embedding")).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("sig"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"), col("sig"))
    val scored = q.join(c, Seq("sig"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("sig"), col("cid"), expr(cosineExpr("qe", "ce")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("sig"), col("rank"), col("cid"), round(col("cos"), 6).as("cosine"))
      .orderBy(col("qid"), col("rank"))
  }

  private val s03Sql =
    s"""WITH e AS (
       |  SELECT vec_id, embedding, ${sigExprSql("embedding")} AS sig FROM embeddings),
       |q AS (SELECT vec_id AS qid, embedding AS qe, sig FROM e WHERE vec_id < 20),
       |scored AS (
       |  SELECT qid, q.sig AS sig, c.vec_id AS cid, ${cosineSql("qe", "c.embedding")} AS cos
       |  FROM q JOIN e c ON q.sig = c.sig AND qid <> c.vec_id),
       |ranked AS (
       |  SELECT qid, sig, cid, cos,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
       |  FROM scored)
       |SELECT qid, sig, rank, cid, ROUND(cos, 6) AS cosine
       |FROM ranked WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  /** Trained IVF: deterministic k-means quantizer (operators/IvfIndex),
    * cell-probe search, exact re-rank. No SQL oracle (k-means is not
    * SQL-expressible) — correctness is pinned by IvfIndexSpec's recall
    * check against brute force; the driver records a rows-only check. */
  private val s04: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val centroids = graft.operators.IvfIndex.train(e, "vec_id", "embedding",
      k = 8, iters = 3)
    val assigned = graft.operators.IvfIndex.assign(e, "vec_id", "embedding", centroids)
    graft.operators.IvfIndex.search(assigned, e.filter(col("vec_id") < 20),
        "vec_id", "embedding", centroids, nprobe = 3, topk = 3)
      .orderBy(col("qid"), col("rank"))
  }

  val queries: Map[String, Q] = Map(
    "s01_knn_brute" -> s01,
    "s02_knn_ivf" -> s02,
    "s03_knn_lsh" -> s03,
    "s04_knn_ivf_trained" -> s04)

  val oracleSql: Map[String, String] = Map(
    "s01_knn_brute" -> s01Sql,
    "s02_knn_ivf" -> s02Sql,
    "s03_knn_lsh" -> s03Sql)
}
