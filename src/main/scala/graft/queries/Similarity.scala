package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
      .psort(col("qid"), col("rank"))
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
      .psort(col("qid"), col("rank"))
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
    val e = memoized(s"s03sig:$dir") {
      t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"), expr(sigExprSpark("embedding")).as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
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
      .psort(col("qid"), col("rank"))
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
    * cell-probe search, exact re-rank. The trainer accumulates Lloyd means
    * in fixed-point (order-independent integer sums), so the centroids are
    * bit-reproducible and the ENTIRE pipeline — seeding, three Lloyd
    * iterations, cell assignment, nprobe=3 probing, cosine re-rank — is
    * replayed exactly by the SQL oracle below (unrolled CTE per iteration).
    * Recall vs brute force is additionally pinned by IvfIndexSpec. */
  /** Trained model memoized per sf dir (train once, serve s04 + s06 + both
    * bench iterations — the build-once lifecycle of a real index). The
    * assignment frame is persisted; centroids live with it. */
  private val ivfModel = scala.collection.concurrent.TrieMap[
    String, (Array[graft.operators.IvfIndex.Centroid], org.apache.spark.sql.DataFrame)]()
  /** Shared train/persist/memoize lifecycle: one definition guards the
    * TrieMap for every quantizer variant (full corpus, per-shard) so
    * stale-session and persist handling can never diverge between them. */
  private def trainedOn(key: String, e: => org.apache.spark.sql.DataFrame) = {
    val cached = ivfModel.get(key)
      .filter(!_._2.sparkSession.sparkContext.isStopped)
    cached.getOrElse {
      val frame = e
      val centroids = graft.operators.IvfIndex.train(frame, "vec_id",
        "embedding", k = ivfK, iters = ivfIters)
      val assigned = graft.operators.IvfIndex
        .assign(frame, "vec_id", "embedding", centroids)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ivfModel.put(key, (centroids, assigned))
      (centroids, assigned)
    }
  }

  private[queries] def trainedIvf(s: SparkSession, dir: String) =
    trainedOn(dir, t(s, dir, "embeddings"))

  private val s04: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val (centroids, assigned) = trainedIvf(s, dir)
    graft.operators.IvfIndex.search(assigned, e.filter(col("vec_id") < 20),
        "vec_id", "embedding", centroids, nprobe = 3, topk = 3)
      .psort(col("qid"), col("rank"))
  }

  private[queries] val ivfK = 8
  private val ivfIters = 3
  private val ivfDim = 64

  /** Name of the final-centroids CTE inside [[ivfCtePrefix]] (tracks
    * ivfIters so downstream oracles never hardcode the iteration count). */
  private[queries] val ivfFinalCentsCte = s"cents$ivfIters"

  /** Squared L2 distance as a sequential index-order fold (bit-identical to
    * the engine's native graft_l2 accumulation loop). */
  private def dist2Sql(a: String, b: String): String =
    s"LIST_REDUCE(LIST_PREPEND(0.0::DOUBLE, [(z[1]::DOUBLE - z[2]::DOUBLE) * (z[1]::DOUBLE - z[2]::DOUBLE) FOR z IN LIST_ZIP($a, $b)]), (acc, x) -> acc + x)"

  /** Shared oracle machinery: the WITH-clause body replaying seeding, the
    * unrolled Lloyd iterations, final assignment, and nprobe=3 probing —
    * used by both s04 (search results) and s06 (recall sweep). */
  private[queries] val ivfCtePrefix: String = {
    // One Lloyd iteration: argmin assignment against cents{n-1} (ties ->
    // lowest cell, matching IvfIndex.assign's struct-min tie-break), then the
    // fixed-point mean: sum over floor(x * 2^20) as BIGINT, divided back out
    // in the same operation order as the trainer (sum -> /n -> /2^20).
    def iter(n: Int): String = {
      val prev = s"cents${n - 1}"
      s"""assign$n AS (
         |  SELECT vec_id, v, cell FROM (
         |    SELECT e.vec_id, e.v, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dist2Sql("e.v", "c.vec")}, c.cell) AS rn
         |    FROM e CROSS JOIN $prev c) WHERE rn = 1),
         |upd$n AS (
         |  SELECT cell, i,
         |    CAST(SUM(CAST(FLOOR(v[i]::DOUBLE * 1048576.0) AS BIGINT)) AS DOUBLE)
         |      / COUNT(*) / 1048576.0 AS comp
         |  FROM assign$n, range(1, ${ivfDim + 1}) r(i) GROUP BY cell, i),
         |cents$n AS (
         |  SELECT p.cell, COALESCE(u.vec, p.vec) AS vec
         |  FROM $prev p LEFT JOIN
         |    (SELECT cell, LIST(comp ORDER BY i) AS vec FROM upd$n GROUP BY cell) u
         |    ON p.cell = u.cell)""".stripMargin
    }
    val fin = s"cents$ivfIters"
    s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
       |cents0 AS (
       |  SELECT cell, vec FROM (
       |    SELECT CAST(ROW_NUMBER() OVER (
       |        ORDER BY ${md5iSql("CAST(vec_id AS VARCHAR)")}, CAST(vec_id AS VARCHAR)
       |      ) AS INTEGER) - 1 AS cell,
       |      [x::DOUBLE FOR x IN embedding] AS vec
       |    FROM embeddings) WHERE cell < $ivfK),
       |${(1 to ivfIters).map(iter).mkString(",\n")},
       |probe AS (
       |  SELECT qid, qe, cell, cell_rank FROM (
       |    SELECT e.vec_id AS qid, e.v AS qe, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${dist2Sql("e.v", "c.vec")}, c.cell) AS cell_rank
       |    FROM e CROSS JOIN $fin c WHERE e.vec_id < 20) WHERE cell_rank <= 3),
       |assignF AS (
       |  SELECT vec_id AS cid, v AS ce, cell FROM (
       |    SELECT e.vec_id, e.v, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${dist2Sql("e.v", "c.vec")}, c.cell) AS rn
       |    FROM e CROSS JOIN $fin c) WHERE rn = 1),
       |scored AS (
       |  SELECT p.qid, a.cid, ${cosineSql("p.qe", "a.ce")} AS cos, p.cell_rank
       |  FROM probe p JOIN assignF a ON p.cell = a.cell AND p.qid <> a.cid)""".stripMargin
  }

  private val s04Sql: String =
    s"""$ivfCtePrefix,
       |ranked AS (
       |  SELECT qid, cid, cos,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
       |  FROM scored)
       |SELECT qid, rank, cid, ROUND(cos, 6) AS cosine
       |FROM ranked WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  /** ANN quality evaluation: recall@3 of the LSH index (s03) against exact
    * brute force — the acceptance metric a production ANN deployment gates
    * on. Both the index probe and the ground truth are computed in-engine;
    * at 100 TB the brute-force side runs over a held-out query sample. */
  private val s05: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val brute = q.hint("broadcast").crossJoin(c)
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), expr(cosineExpr("qe", "ce")).as("cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .select(col("qid"), col("cid"))
    // the same persisted signature index s03 serves from
    val sig = memoized(s"s03sig:$dir") {
      e.select(col("vec_id"), col("embedding"), expr(sigExprSpark("embedding")).as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val lsh = sig.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid2"), col("embedding").as("qe"), col("sig"))
      .join(sig.select(col("vec_id").as("hcid"), col("embedding").as("ce"), col("sig")),
        Seq("sig"))
      .filter(col("qid2") =!= col("hcid"))
      .select(col("qid2").as("lqid"), col("hcid").as("cid2"),
        expr(cosineExpr("qe", "ce")).as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("lqid")).orderBy(col("cos").desc, col("cid2"))))
      .filter(col("rank") <= 3)
      .select(col("lqid"), col("cid2"))
    brute
      .join(lsh, col("qid") === col("lqid") && col("cid") === col("cid2"), "left")
      .groupBy(col("qid"))
      .agg(count(col("cid2")).as("hits"),
        (count(col("cid2")) / lit(3.0)).as("recall"))
      .psort(col("qid"))
  }

  /** Shared oracle CTEs: exact top-3 ground truth for the vec_id<20 query
    * sample — one definition serves s05 and s06 so they can never drift. */
  private val bruteTruthCtes =
    s"""bruted AS (
       |  SELECT qid, c.vec_id AS cid, ${cosineSql("qe", "c.embedding")} AS bcos
       |  FROM (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 20) q
       |  CROSS JOIN embeddings c WHERE qid <> c.vec_id),
       |brute AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY bcos DESC, cid) AS rnk
       |    FROM bruted) WHERE rnk <= 3)""".stripMargin

  private val s05Sql =
    s"""WITH $bruteTruthCtes,
       |sg AS (SELECT vec_id, embedding, ${sigExprSql("embedding")} AS sig FROM embeddings),
       |lshd AS (
       |  SELECT a.vec_id AS qid, b.vec_id AS cid,
       |    ${cosineSql("a.embedding", "b.embedding")} AS cos
       |  FROM sg a JOIN sg b ON a.sig = b.sig AND a.vec_id <> b.vec_id
       |  WHERE a.vec_id < 20),
       |lsh AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
       |    FROM lshd) WHERE rank <= 3)
       |SELECT b.qid, COUNT(h.cid) AS hits, COUNT(h.cid) / 3.0 AS recall
       |FROM brute b LEFT JOIN lsh h ON b.qid = h.qid AND b.cid = h.cid
       |GROUP BY b.qid ORDER BY b.qid""".stripMargin

  /** Index-tuning sweep: recall@3 of the trained IVF index as a function of
    * nprobe (1..3) — the accuracy/cost curve an ANN deployment picks its
    * operating point from. Probing, re-rank, brute-force truth, and the
    * recall aggregation are all oracle-replayed. */
  private val s06: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val (centroids, assigned) = trainedIvf(s, dir)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    val truth = q.hint("broadcast").crossJoin(c)
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), expr(cosineExpr("qe", "ce")).as("cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .select(col("qid"), col("cid"))
    // single pass: score the nprobe=3 candidate pool ONCE with each cell's
    // closeness rank, then slice the sweep points out of it (mirrors the
    // SQL oracle's cell_rank <= np filter)
    val pairs = graft.operators.IvfIndex
      .probeRanked(e.filter(col("vec_id") < 20), "vec_id", "embedding", centroids, 3)
      .join(assigned.select(col("vec_id").as("cid"), col("embedding").as("ce"), col("cell")),
        Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), expr(cosineExpr("qe", "ce")).as("cos"),
        col("cell_rank"))
    val nps = s.range(1, 4).select(col("id").cast("int").as("nprobe"))
    val sel = pairs.crossJoin(broadcast(nps))
      .filter(col("cell_rank") <= col("nprobe"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("nprobe"), col("qid"))
          .orderBy(col("cos").desc, col("cid"))))
      .filter(col("rnk") <= 3)
      .select(col("nprobe"), col("qid"), col("cid"), lit(1).as("hit"))
    // the expensive brute-truth subtree appears exactly ONCE: replicate the
    // 60 truth rows per sweep point, left-join the selected candidates, and
    // read hits and the denominator out of the same aggregation (count(hit)
    // vs count(*)) — no second truth scan, no separate denominator subtree
    truth.crossJoin(broadcast(nps))
      .join(sel, Seq("nprobe", "qid", "cid"), "left")
      .groupBy(col("nprobe"))
      .agg(count(col("hit")).as("hits"),
        round(count(col("hit")) / count(lit(1)).cast("double"), 6).as("recall"))
      .psort(col("nprobe"))
  }

  private val s06Sql =
    s"""$ivfCtePrefix,
       |$bruteTruthCtes,
       |sel AS (
       |  SELECT np, qid, cid FROM (
       |    SELECT nps.np, s.qid, s.cid,
       |      ROW_NUMBER() OVER (PARTITION BY nps.np, s.qid
       |        ORDER BY s.cos DESC, s.cid) AS rnk
       |    FROM scored s CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS np) nps
       |    WHERE s.cell_rank <= nps.np) WHERE rnk <= 3),
       |hitrows AS (
       |  SELECT s.np, s.qid, s.cid
       |  FROM sel s JOIN brute b ON s.qid = b.qid AND s.cid = b.cid)
       |SELECT nps.np AS nprobe, COUNT(h.qid) AS hits,
       | ROUND(COUNT(h.qid) / (SELECT COUNT(*) FROM brute)::DOUBLE, 6) AS recall
       |FROM (SELECT UNNEST([1, 2, 3]) AS np) nps
       |LEFT JOIN hitrows h ON nps.np = h.np
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Scalar-quantized (int8-style) ANN: embeddings are symmetrically
    * quantized to [-127, 127] against the corpus max-|x| and searched by
    * integer dot product — the memory-bandwidth play of a production vector
    * index (4x smaller vectors, SIMD-friendly int math; recall loss is the
    * trade). Integer dots are EXACT, so the whole search — quantization,
    * scoring, top-3 — is replayed bit-for-bit by the SQL oracle. The
    * quantized index is built once and persisted (same lifecycle as s03's
    * signature index). */
  private val s07: Q = (s, dir) => {
    val qz = memoized(s"s07q:$dir") {
      val e = t(s, dir, "embeddings")
      val mx = e.agg(
        max(expr("array_max(transform(embedding, x -> abs(cast(x as double))))")).as("m"))
      e.crossJoin(broadcast(mx))
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(round(cast(x as double) / m * 127.0) as bigint))")
            .as("qv"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val q = qz.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("qv").as("qa"))
    val c = qz.select(col("vec_id").as("cid"), col("qv").as("qb"))
    // native codegen'd dot (interpreted zip_with/aggregate lambdas are the
    // slow path): int8 products summed in double are exact below 2^53, and
    // the final bigint cast restores the integer the oracle computes
    val scored = q.hint("broadcast").crossJoin(c)
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        expr("cast(graft_dot(qa, qb) as bigint)").as("qdot"))
    val w = Window.partitionBy(col("qid")).orderBy(col("qdot").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("rank"), col("cid"), col("qdot"))
      .psort(col("qid"), col("rank"))
  }

  private val s07Sql =
    """WITH mx AS (
      |  SELECT MAX(LIST_MAX([ABS(x::DOUBLE) FOR x IN embedding])) AS m FROM embeddings),
      |qz AS (
      |  SELECT vec_id,
      |    [CAST(ROUND(x::DOUBLE / m * 127.0) AS BIGINT) FOR x IN embedding] AS qv
      |  FROM embeddings, mx),
      |scored AS (
      |  SELECT q.vec_id AS qid, c.vec_id AS cid,
      |    CAST(LIST_SUM([z[1] * z[2] FOR z IN LIST_ZIP(q.qv, c.qv)]) AS BIGINT) AS qdot
      |  FROM qz q JOIN qz c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
      |ranked AS (
      |  SELECT qid, cid, qdot,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY qdot DESC, cid) AS rank
      |  FROM scored)
      |SELECT qid, rank, cid, qdot
      |FROM ranked WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  /** Filtered ANN: top-k under a metadata predicate (label % 3 = 1 — the
    * lang/license/split filter of a RAG or curation query), served from the
    * SAME trained IVF index as s04. The predicate is applied to the
    * candidate stream BEFORE the cosine computation — at 100 TB the filter
    * prunes the probed cells' rows ahead of the expensive distance math and
    * rides the cell-partitioned index layout (filter + equi-join on cell,
    * no extra shuffle; see PLANS.md s08). Over-fetching is the textbook
    * filtered-search failure mode this avoids: post-filtering a top-k
    * computed on the UNfiltered corpus can return < k (or worse, nothing)
    * for selective predicates. */
  private val s08: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val (centroids, assigned) = trainedIvf(s, dir)
    val q = graft.operators.IvfIndex
      .probeRanked(e.filter(col("vec_id") < 20), "vec_id", "embedding", centroids, 3)
      .select(col("qid"), col("qe"), col("cell"))
    val c = assigned
      .filter(pmod(col("label"), lit(3)) === 1)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"),
        col("label"), col("cell"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    q.join(c, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), col("label"),
        expr(cosineExpr("qe", "ce")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("rank"), col("cid"), col("label"),
        round(col("cos"), 6).as("cosine"))
      .psort(col("qid"), col("rank"))
  }

  private val s08Sql =
    s"""$ivfCtePrefix,
       |fscored AS (
       |  SELECT p.qid, a.cid, emb.label, ${cosineSql("p.qe", "a.ce")} AS cos
       |  FROM probe p JOIN assignF a ON p.cell = a.cell AND p.qid <> a.cid
       |  JOIN embeddings emb ON emb.vec_id = a.cid
       |  WHERE ((emb.label % 3) + 3) % 3 = 1),
       |ranked AS (
       |  SELECT qid, cid, label, cos,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
       |  FROM fscored)
       |SELECT qid, rank, cid, label, ROUND(cos, 6) AS cosine
       |FROM ranked WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  /** Shared corpus kNN: every vector's top-3 cosine neighbors within its
    * trained IVF cell, as (qid, rank, cid, cos). The within-cell pair join
    * is DUPLICATE-COLLAPSED (round 8): identical embeddings — the dominant
    * shape of a crawl corpus, and exactly what the sf10 replication
    * stresses — group to one representative each, the pair join runs over
    * DISTINCT content only, and per-query candidates fan back out from
    * the group member lists. Correctness is exact: within a group the
    * cosine to any member is one constant and ties break by cid, so any
    * global top-3 candidate is among the 4 lowest-cid members of its own
    * group (its better-ranked groupmates precede it); a 4-member slice
    * per group therefore reconstructs the naive join's answer
    * bit-for-bit. Cost: pairs scale with Σ|distinct-cell|², NOT corpus² —
    * at 100x duplication the naive join pays 10,000x more pairs, this
    * plan pays 1x pairs + a linear fan-out. */
  private def knnTop3(s: SparkSession, dir: String): DataFrame = {
    val (_, assigned) = trainedIvf(s, dir)
    val groups = assigned.groupBy(col("cell"), col("embedding"))
      .agg(sort_array(collect_list(col("vec_id"))).as("members"))
    val ga = groups.select(col("cell"), col("embedding").as("qe"),
      element_at(col("members"), 1).as("qgid"),
      col("members").as("qmembers"))
    val gb = groups.select(col("cell"), col("embedding").as("ce"),
      slice(col("members"), 1, 4).as("cands"))
    // rank ONCE per query group (every member of a group sees the same
    // candidate list, minus itself): group-level top-4 is a superset of
    // any member's top-3 because a given cid can be excluded by at most
    // one member. The heavy window thus runs over groups, and the
    // member fan-out only carries the <=4 survivors.
    val wg = Window.partitionBy(col("qgid")).orderBy(col("cos").desc, col("cid"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    ga.join(gb, Seq("cell"))
      .select(col("qgid"), col("qmembers"),
        expr(cosineExpr("qe", "ce")).as("cos"), col("cands"))
      .select(col("qgid"), col("qmembers"), col("cos"),
        explode(col("cands")).as("cid"))
      .withColumn("grank", row_number().over(wg))
      .filter(col("grank") <= 4)
      .select(explode(col("qmembers")).as("qid"), col("cos"), col("cid"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
  }

  /** s09 kNN-graph construction: every corpus vector's top-3 cosine
    * neighbors WITHIN its trained IVF cell — the corpus-vs-corpus shape
    * (vs s04's bounded query set) that feeds SemDeDup-style clustering,
    * diversity analysis, and graph-based label propagation over training
    * corpora.
    *
    * Scale: [[knnTop3]] — equi-keyed on cell AND duplicate-collapsed, so
    * the pair count is Σ|distinct-per-cell|² ≪ N² even on a
    * duplicate-heavy corpus (sf10 measured: the naive join froze the
    * driver; this plan runs in seconds). The top-k ranking prunes below
    * the shuffle via WindowGroupLimit. No all-pairs cartesian anywhere. */
  private val s09: Q = (s, dir) => {
    knnTop3(s, dir)
      .select(col("qid"), col("rank"), col("cid"), round(col("cos"), 6).as("cosine"))
      .psortScaled(col("qid"), col("rank"))
  }

  private val s09Sql =
    s"""$ivfCtePrefix,
       |gscored AS (
       |  SELECT a.cid AS qid, b.cid, ${cosineSql("a.ce", "b.ce")} AS cos
       |  FROM assignF a JOIN assignF b ON a.cell = b.cell AND a.cid <> b.cid),
       |ranked AS (
       |  SELECT qid, cid, cos,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
       |  FROM gscored)
       |SELECT qid, rank, cid, ROUND(cos, 6) AS cosine
       |FROM ranked WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  // ---- s10: product-quantized ANN (PQ + asymmetric distance) --------------
  private val pqM = 8      // subspaces
  private val pqSubDim = 8 // dims per subspace (8 x 8 = 64)
  private val pqK = 16     // codes per subspace
  private val pqIters = 2

  /** Per-dir memoized PQ model: m codebooks (trained with the SAME
    * bit-reproducible fixed-point Lloyd as the IVF quantizer, on each
    * 8-dim slice) and the encoded corpus (8 int codes per vector = 8
    * bytes in place of 256 — the memory story that makes billion-vector
    * ANN fit a cluster's RAM). */
  private val pqModel = scala.collection.concurrent.TrieMap[
    String, (Seq[Array[graft.operators.IvfIndex.Centroid]], DataFrame)]()
  private def trainedPq(s: SparkSession, dir: String) = {
    val cached = pqModel.get(dir)
      .filter(!_._2.sparkSession.sparkContext.isStopped)
    cached.getOrElse {
      val e = t(s, dir, "embeddings")
      val books = (0 until pqM).map { j =>
        val sub = e.select(col("vec_id"),
          expr(s"slice(embedding, ${j * pqSubDim + 1}, $pqSubDim)").as("sub"))
        graft.operators.IvfIndex.train(sub, "vec_id", "sub", k = pqK,
          iters = pqIters)
      }
      val codes = books.zipWithIndex.foldLeft(
          e.select(col("vec_id"), col("embedding"))) { case (df, (cb, j)) =>
          graft.operators.IvfIndex.assign(
              df.withColumn("subv",
                expr(s"slice(embedding, ${j * pqSubDim + 1}, $pqSubDim)")),
              "vec_id", "subv", cb)
            .withColumnRenamed("cell", s"c$j").drop("subv")
        }
        .select(col("vec_id") +: (0 until pqM).map(j => col(s"c$j")): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pqModel.put(dir, (books, codes))
      (books, codes)
    }
  }

  /** PQ search: queries scan only the 8-byte codes plus a per-query
    * m x k distance table against the broadcast codebooks (asymmetric
    * distance computation) — never the raw corpus vectors. The per-pair
    * cost is m table lookups; the scan is the compressed-index shape that
    * serves billion-vector corpora from memory. Distance accumulation is
    * the same sequential (a-b)^2 fold per subspace, subspaces summed in
    * order, so the unrolled per-subspace SQL training + scoring replays
    * it exactly. */
  /** ADC as the native codegen'd graft_pq_adc expression — the codebooks
    * (m×k×subdim doubles, ~8 KB) ride along as one constant-folded nested
    * array literal instead of a broadcast + per-row Scala UDF. */
  private def adcCol(books: Seq[Array[graft.operators.IvfIndex.Centroid]],
                     qe: Column, cs: Column): Column = {
    val booksLit = typedlit(books.map(_.map(_.vec.toSeq).toSeq).toSeq)
    call_function("graft_pq_adc", qe, cs, booksLit)
  }

  private val s10: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val (books, codes) = trainedPq(s, dir)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val cands = codes.select(col("vec_id").as("cid"),
      array((0 until pqM).map(j => col(s"c$j")): _*).as("cs"))
    val w = Window.partitionBy(col("qid")).orderBy(col("adc").asc, col("cid"))
    q.hint("broadcast").crossJoin(cands)
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        adcCol(books, col("qe"), col("cs")).as("adc"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("rank"), col("cid"),
        round(col("adc"), 6).as("adc_dist"))
      .psort(col("qid"), col("rank"))
  }

  /** Oracle: per-subspace replay of the fixed-point Lloyd training (the
    * s04 pattern at dim=8/k=8/iters=2), final code assignment, and the
    * summed per-subspace distances. */
  private lazy val s10Sql: String =
    s"""$pqCtes,
       |ranked AS (
       |  SELECT qid, cid, adc,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc ASC, cid) AS rank
       |  FROM pqscored)
       |SELECT qid, rank, cid, ROUND(adc, 6) AS adc_dist
       |FROM ranked WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  /** Shared PQ oracle machinery: per-subspace training/coding CTEs plus
    * `pqscored(qid, cid, adc)` — serves s10 (search) and s11 (recall). */
  private lazy val pqCtes: String = {
    def sub(j: Int): String = {
      val off = j * pqSubDim + 1
      def iter(n: Int): String = {
        val prev = s"cents${j}_${n - 1}"
        s"""assign${j}_$n AS MATERIALIZED (
           |  SELECT vec_id, v, cell FROM (
           |    SELECT e.vec_id, e.v, c.cell,
           |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${dist2Sql("e.v", "c.vec")}, c.cell) AS rn
           |    FROM e$j e CROSS JOIN $prev c) WHERE rn = 1),
           |upd${j}_$n AS (
           |  SELECT cell, i,
           |    CAST(SUM(CAST(FLOOR(v[i]::DOUBLE * 1048576.0) AS BIGINT)) AS DOUBLE)
           |      / COUNT(*) / 1048576.0 AS comp
           |  FROM assign${j}_$n, range(1, ${pqSubDim + 1}) r(i) GROUP BY cell, i),
           |cents${j}_$n AS MATERIALIZED (
           |  SELECT p.cell, COALESCE(u.vec, p.vec) AS vec
           |  FROM $prev p LEFT JOIN
           |    (SELECT cell, LIST(comp ORDER BY i) AS vec FROM upd${j}_$n GROUP BY cell) u
           |    ON p.cell = u.cell)""".stripMargin
      }
      s"""e$j AS MATERIALIZED (
         |  SELECT vec_id, [x::DOUBLE FOR x IN embedding[$off:${off + pqSubDim - 1}]] AS v
         |  FROM embeddings),
         |cents${j}_0 AS (
         |  SELECT cell, vec FROM (
         |    SELECT CAST(ROW_NUMBER() OVER (
         |        ORDER BY ${md5iSql("CAST(vec_id AS VARCHAR)")}, CAST(vec_id AS VARCHAR)
         |      ) AS INTEGER) - 1 AS cell,
         |      [x::DOUBLE FOR x IN embedding[$off:${off + pqSubDim - 1}]] AS vec
         |    FROM embeddings) WHERE cell < $pqK),
         |${(1 to pqIters).map(iter).mkString(",\n")},
         |code$j AS MATERIALIZED (
         |  SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dist2Sql("e.v", "c.vec")}, c.cell) AS rn
         |    FROM e$j e CROSS JOIN cents${j}_$pqIters c) WHERE rn = 1),
         |sc$j AS MATERIALIZED (
         |  SELECT q.vec_id AS qid, a.vec_id AS cid,
         |    ${dist2Sql("q.v", "c.vec")} AS d$j
         |  FROM e$j q, code$j a JOIN cents${j}_$pqIters c ON a.cell = c.cell
         |  WHERE q.vec_id < 20 AND q.vec_id <> a.vec_id)""".stripMargin
    }
    val joins = (1 until pqM)
      .map(j => s"JOIN sc$j USING (qid, cid)").mkString("\n  ")
    val adcSum = (0 until pqM).map(j => s"d$j").mkString(" + ")
    s"""WITH ${(0 until pqM).map(sub).mkString(",\n")},
       |pqscored AS MATERIALIZED (
       |  SELECT qid, cid, $adcSum AS adc FROM sc0
       |  $joins)""".stripMargin
  }

  /** s11: PQ recall evaluation — recall@3 of the s10 PQ index against the
    * exact L2 ground truth (the acceptance metric for the compression
    * tier: how much accuracy do 8 bytes/vector give up). Both sides run
    * in-engine; same bounded query sample as s05's LSH recall. */
  private val s11: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val (books, codes) = trainedPq(s, dir)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val exact = q.hint("broadcast")
      .crossJoin(e.select(col("vec_id").as("cid"), col("embedding").as("ce")))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        expr("graft_l2(qe, ce)").as("d"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("d").asc, col("cid"))))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("cid"))
    val pq = q.hint("broadcast")
      .crossJoin(codes.select(col("vec_id").as("pcid"),
        array((0 until pqM).map(j => col(s"c$j")): _*).as("cs")))
      .filter(col("qid") =!= col("pcid"))
      .select(col("qid"), col("pcid"),
        adcCol(books, col("qe"), col("cs")).as("adc"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("adc").asc, col("pcid"))))
      .filter(col("rank") <= 3)
      .select(col("qid").as("pqid"), col("pcid"))
    exact
      .join(pq, col("qid") === col("pqid") && col("cid") === col("pcid"), "left")
      .groupBy(col("qid"))
      .agg(count(col("pcid")).as("hits"),
        (count(col("pcid")) / lit(3.0)).as("recall"))
      .psort(col("qid"))
  }

  private lazy val s11Sql =
    s"""$pqCtes,
       |exact AS (
       |  SELECT qid, cid FROM (
       |    SELECT q.vec_id AS qid, c.vec_id AS cid,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${dist2Sql("q.v64", "c.v64")}, c.vec_id) AS rank
       |    FROM (SELECT vec_id, [x::DOUBLE FOR x IN embedding] AS v64
       |          FROM embeddings WHERE vec_id < 20) q
       |    CROSS JOIN (SELECT vec_id, [x::DOUBLE FOR x IN embedding] AS v64
       |                FROM embeddings) c
       |    WHERE q.vec_id <> c.vec_id) WHERE rank <= 3),
       |pqtop AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc ASC, cid) AS rank
       |    FROM pqscored) WHERE rank <= 3)
       |SELECT e.qid, COUNT(p.cid) AS hits,
       | COUNT(p.cid) / 3.0 AS recall
       |FROM exact e LEFT JOIN pqtop p ON e.qid = p.qid AND e.cid = p.cid
       |GROUP BY e.qid ORDER BY e.qid""".stripMargin

  /** s12: two-stage retrieval — PQ/ADC candidate generation (the s10
    * compressed-index scan) followed by EXACT L2 re-ranking of only the
    * top-10 candidates per query against the raw vectors. This is the
    * production ANN serving shape: the cheap 8-byte-code scan bounds how
    * many full vectors are ever touched, the exact stage repairs the
    * quantization error ordering, and the re-rank join fetches raw
    * vectors by id (hash equi-join, candidate-sized — 10 rows/query, not
    * corpus-sized) no matter how big the corpus is. Output ranks by exact
    * distance; adc_rank is kept to show the reordering the re-rank did. */
  private val s12: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val (books, codes) = trainedPq(s, dir)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val cands = codes.select(col("vec_id").as("cid"),
      array((0 until pqM).map(j => col(s"c$j")): _*).as("cs"))
    val wAdc = Window.partitionBy(col("qid")).orderBy(col("adc").asc, col("cid"))
    val shortlist = q.hint("broadcast").crossJoin(cands)
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("qe"), col("cid"),
        adcCol(books, col("qe"), col("cs")).as("adc"))
      .withColumn("adc_rank", row_number().over(wAdc))
      .filter(col("adc_rank") <= 10)
    val wExact = Window.partitionBy(col("qid")).orderBy(col("d").asc, col("cid"))
    shortlist
      .join(e.select(col("vec_id").as("cid"), col("embedding").as("ce")), Seq("cid"))
      .select(col("qid"), col("cid"), col("adc_rank"),
        expr("graft_l2(qe, ce)").as("d"))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("rank"), col("cid"), col("adc_rank"),
        round(col("d"), 6).as("l2_dist"))
      .psort(col("qid"), col("rank"))
  }

  private lazy val s12Sql =
    s"""$pqCtes,
       |shortlist AS (
       |  SELECT qid, cid, adc_rank FROM (
       |    SELECT qid, cid,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc ASC, cid) AS adc_rank
       |    FROM pqscored) WHERE adc_rank <= 10),
       |reranked AS (
       |  SELECT s.qid, s.cid, s.adc_rank,
       |    ${dist2Sql("q.v64", "c.v64")} AS d
       |  FROM shortlist s
       |  JOIN (SELECT vec_id, [x::DOUBLE FOR x IN embedding] AS v64
       |        FROM embeddings) q ON s.qid = q.vec_id
       |  JOIN (SELECT vec_id, [x::DOUBLE FOR x IN embedding] AS v64
       |        FROM embeddings) c ON s.cid = c.vec_id)
       |SELECT qid, rank, cid, adc_rank, ROUND(d, 6) AS l2_dist FROM (
       |  SELECT qid, cid, adc_rank, d,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d ASC, cid) AS rank
       |  FROM reranked) WHERE rank <= 3
       |ORDER BY qid, rank""".stripMargin

  /** s13: incremental ANN ingest — append a new vector batch to the SERVED
    * IVF index without retraining: the batch is assigned to the existing
    * trained centroids (one broadcast of the 8-centroid table, O(batch)
    * work — the corpus index is never touched, the d10 contract for
    * vectors), and queries immediately see old + new vectors through the
    * same cell-probe search. The batch is a deterministic 1.01-scaled clone
    * of the vec_id % 37 slice (ids +1,000,000): cosine is scale-invariant,
    * so each clone should surface at the top of its source's neighborhood —
    * the observable proof the appended vectors are actually being served.
    * Output marks which hits are newly ingested. */
  private val s13: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val (centroids, assigned) = trainedIvf(s, dir)
    val toDouble = (c: String) => expr(s"transform($c, x -> cast(x as double))")
    val batch = e.filter(col("vec_id") % 37 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        expr("transform(embedding, x -> cast(x as double) * 1.01d)")
          .as("embedding"))
    val batchAssigned = graft.operators.IvfIndex
      .assign(batch, "vec_id", "embedding", centroids)
      .select(col("vec_id"), col("embedding"), col("cell"))
    val augmented = assigned
      .select(col("vec_id"), toDouble("embedding").as("embedding"), col("cell"))
      .unionAll(batchAssigned)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id"), toDouble("embedding").as("embedding"))
    graft.operators.IvfIndex
      .search(augmented, queries, "vec_id", "embedding", centroids,
        nprobe = 3, topk = 3)
      .select(col("qid"), col("rank"), col("cid"),
        (col("cid") >= 1000000L).as("is_new"), col("cosine"))
      .psort(col("qid"), col("rank"))
  }

  private lazy val s13Sql =
    s"""$ivfCtePrefix,
       |batch AS (
       |  SELECT vec_id + 1000000 AS cid,
       |    [x::DOUBLE * 1.01 FOR x IN embedding] AS ce
       |  FROM embeddings WHERE vec_id % 37 = 0),
       |bassign AS (
       |  SELECT cid, ce, cell FROM (
       |    SELECT b.cid, b.ce, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY b.cid
       |        ORDER BY ${dist2Sql("b.ce", "c.vec")}, c.cell) AS rn
       |    FROM batch b CROSS JOIN cents$ivfIters c) WHERE rn = 1),
       |aug AS (
       |  SELECT cid, ce, cell FROM assignF
       |  UNION ALL SELECT cid, ce, cell FROM bassign),
       |augscored AS (
       |  SELECT p.qid, a.cid, ${cosineSql("p.qe", "a.ce")} AS cos
       |  FROM probe p JOIN aug a ON p.cell = a.cell AND p.qid <> a.cid),
       |ranked AS (
       |  SELECT qid, cid, cos,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
       |  FROM augscored)
       |SELECT qid, rank, cid, cid >= 1000000 AS is_new,
       | ROUND(cos, 6) AS cosine
       |FROM ranked WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  /** s14: RANGE (radius) search — the dual of top-k retrieval: ALL
    * same-label candidates within a cosine threshold of each query vector,
    * the primitive behind "find every near-duplicate of this example" and
    * similarity-threshold joins. Same label-blocked candidate generation as
    * s02 (block equi-join, never all-pairs); the threshold filter replaces
    * the top-k window, so beyond the block join the plan is shuffle-free —
    * at 100 TB results stream straight out of the join, and the per-query
    * result size is data-determined, not k-capped. Threshold applies to the
    * UNROUNDED cosine (bit-identical across engines — graft_cosine's
    * in-order fold), so the boundary cut is exact. */
  private val s14: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("label"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cid"), col("label"), col("embedding").as("ce"))
    q.join(c, Seq("label"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), expr(cosineExpr("qe", "ce")).as("cos"))
      .filter(col("cos") >= 0.25)
      .select(col("qid"), col("cid"), round(col("cos"), 6).as("cosine"))
      .psort(col("qid"), col("cid"))
  }

  private val s14Sql =
    s"""WITH q AS (SELECT vec_id AS qid, label, embedding AS qe
       |           FROM embeddings WHERE vec_id < 20),
       |scored AS (
       |  SELECT qid, c.vec_id AS cid, ${cosineSql("qe", "c.embedding")} AS cos
       |  FROM q JOIN embeddings c ON q.label = c.label AND qid <> c.vec_id)
       |SELECT qid, cid, ROUND(cos, 6) AS cosine
       |FROM scored WHERE cos >= 0.25 ORDER BY qid, cid""".stripMargin

  /** s15: MMR-diversified retrieval (maximal marginal relevance, λ=0.7) —
    * the re-rank RAG retrieval runs so the returned set isn't three copies
    * of the same near-duplicate: greedy picks maximize
    * λ·rel(q,c) − (1−λ)·max sim(c, picked). Three picks from an 8-candidate
    * block shortlist, unrolled as three deterministic argmax rounds
    * (score desc, cid asc) — the greedy loop runs over the BOUNDED
    * shortlist (8 rows/query after the block top-k), never the corpus, so
    * at 100 TB the added cost over plain top-k is the 8×8 pairwise-sim
    * join per query. All scores derive from the bit-identical native
    * cosine, so the oracle replays the greedy exactly. */
  private val s15: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("label"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cid"), col("label"), col("embedding").as("ce"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    val shortl = memoized(s"s15shortl:$dir")(
      q.join(c, Seq("label"))
        .filter(col("qid") =!= col("cid"))
        .select(col("qid"), col("cid"), col("ce"),
          expr(cosineExpr("qe", "ce")).as("cos"))
        .withColumn("rn", row_number().over(wTop)).filter(col("rn") <= 8)
        .select(col("qid"), col("cid"), col("ce"), col("cos").as("rel"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val pair = shortl.as("a").join(shortl.as("b"),
        col("a.qid") === col("b.qid") && col("a.cid") =!= col("b.cid"))
      .select(col("a.qid").as("qid"), col("a.cid").as("cid"),
        col("b.cid").as("oc"), expr(cosineExpr("a.ce", "b.ce")).as("sim"))
    def pairTo(pick: String) = pair
      .select(col("qid"), col("cid"), col("oc").as(pick),
        col("sim").as(s"sim_$pick"))
    def argmax(df: DataFrame, score: Column): DataFrame = {
      val w = Window.partitionBy(col("qid")).orderBy(score.desc, col("cid"))
      df.withColumn("mmr", score)
        .withColumn("arn", row_number().over(w)).filter(col("arn") === 1)
    }
    val p1 = argmax(shortl, col("rel"))
      .select(col("qid"), col("cid").as("c1"), col("mmr").as("score1"))
    val p2 = argmax(
      shortl.join(p1.select(col("qid"), col("c1")), Seq("qid"))
        .filter(col("cid") =!= col("c1"))
        .join(pairTo("c1"), Seq("qid", "cid", "c1")),
      lit(0.7) * col("rel") - lit(0.3) * col("sim_c1"))
      .select(col("qid"), col("cid").as("c2"), col("mmr").as("score2"))
    val p3 = argmax(
      shortl.join(p1.select(col("qid"), col("c1")), Seq("qid"))
        .join(p2.select(col("qid"), col("c2")), Seq("qid"))
        .filter(col("cid") =!= col("c1") && col("cid") =!= col("c2"))
        .join(pairTo("c1"), Seq("qid", "cid", "c1"))
        .join(pairTo("c2"), Seq("qid", "cid", "c2")),
      lit(0.7) * col("rel") - lit(0.3) * greatest(col("sim_c1"), col("sim_c2")))
      .select(col("qid"), col("cid").as("c3"), col("mmr").as("score3"))
    p1.select(col("qid"), lit(1L).as("pick"), col("c1").as("cid"),
        round(col("score1"), 6).as("score"))
      .unionAll(p2.select(col("qid"), lit(2L).as("pick"), col("c2").as("cid"),
        round(col("score2"), 6).as("score")))
      .unionAll(p3.select(col("qid"), lit(3L).as("pick"), col("c3").as("cid"),
        round(col("score3"), 6).as("score")))
      .psort(col("qid"), col("pick"))
  }

  private val s15Sql =
    s"""WITH q AS (SELECT vec_id AS qid, label, embedding AS qe
       |           FROM embeddings WHERE vec_id < 5),
       |sc AS (
       |  SELECT qid, c.vec_id AS cid, ${cosineSql("qe", "c.embedding")} AS cos
       |  FROM q JOIN embeddings c ON q.label = c.label AND qid <> c.vec_id),
       |shortl AS (
       |  SELECT qid, cid, cos AS rel FROM (
       |    SELECT qid, cid, cos,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
       |    FROM sc) WHERE rn <= 8),
       |pair AS (
       |  SELECT a.qid, a.cid, b.cid AS oc,
       |    ${cosineSql("ea.embedding", "eb.embedding")} AS sim
       |  FROM shortl a JOIN shortl b ON a.qid = b.qid AND a.cid <> b.cid
       |  JOIN embeddings ea ON ea.vec_id = a.cid
       |  JOIN embeddings eb ON eb.vec_id = b.cid),
       |p1 AS (
       |  SELECT qid, cid AS c1, rel AS score1 FROM (
       |    SELECT qid, cid, rel,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rel DESC, cid) AS rn
       |    FROM shortl) WHERE rn = 1),
       |s2 AS (
       |  SELECT r.qid, r.cid,
       |    0.7::DOUBLE * r.rel - 0.3::DOUBLE * p.sim AS score
       |  FROM shortl r JOIN p1 ON r.qid = p1.qid AND r.cid <> p1.c1
       |  JOIN pair p ON p.qid = r.qid AND p.cid = r.cid AND p.oc = p1.c1),
       |p2 AS (
       |  SELECT qid, cid AS c2, score AS score2 FROM (
       |    SELECT qid, cid, score,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rn
       |    FROM s2) WHERE rn = 1),
       |s3 AS (
       |  SELECT r.qid, r.cid,
       |    0.7::DOUBLE * r.rel
       |      - 0.3::DOUBLE * GREATEST(pa.sim, pb.sim) AS score
       |  FROM shortl r
       |  JOIN p1 ON r.qid = p1.qid
       |  JOIN p2 ON r.qid = p2.qid
       |  JOIN pair pa ON pa.qid = r.qid AND pa.cid = r.cid AND pa.oc = p1.c1
       |  JOIN pair pb ON pb.qid = r.qid AND pb.cid = r.cid AND pb.oc = p2.c2
       |  WHERE r.cid <> p1.c1 AND r.cid <> p2.c2),
       |p3 AS (
       |  SELECT qid, cid AS c3, score AS score3 FROM (
       |    SELECT qid, cid, score,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rn
       |    FROM s3) WHERE rn = 1)
       |SELECT qid, CAST(1 AS BIGINT) AS pick, c1 AS cid,
       |       ROUND(score1, 6) AS score FROM p1
       |UNION ALL SELECT qid, 2, c2, ROUND(score2, 6) FROM p2
       |UNION ALL SELECT qid, 3, c3, ROUND(score3, 6) FROM p3
       |ORDER BY qid, pick""".stripMargin

  /** s16: binary (sign-bit) quantization + Hamming-distance shortlist +
    * exact cosine re-rank — the 1-bit compression tier below s07's int8
    * and s10's PQ: 64 dims pack into EIGHT bytes (two 32-bit words), a
    * 32x shrink over float32, and candidate scoring is two XOR+popcount
    * instructions per pair — the binary-quantization tier production
    * vector stores serve as their cheapest filter.
    *
    * Two-stage search: Hamming over the packed codes prunes the corpus to
    * a top-8 shortlist per query; ONLY the shortlist joins back to full
    * float vectors for the exact cosine re-rank (8 full-vector touches
    * per query, same bounded-rerank discipline as s12).
    *
    * Scale: packing is map-only and the 8 B/vector code index is built
    * once and persisted; the Hamming pass broadcasts the tiny query side
    * and streams corpus codes (no shuffle of the corpus); the re-rank
    * join broadcasts the bounded shortlist onto the vector table.
    * Determinism: sign bits, integer Hamming, and the sequential-fold
    * cosine are all exact, so the oracle replays the search bit-for-bit.
    * Two 32-bit words (not one 64-bit) keep every packed value positive
    * in both engines — no sign-bit/overflow divergence at bit 63. */
  private val s16: Q = (s, dir) => {
    val codes = memoized(s"s16codes:$dir") {
      t(s, dir, "embeddings").select(col("vec_id"),
        expr("aggregate(sequence(0,31), 0L, (acc, i) -> " +
          "acc + IF(element_at(embedding, i+1) >= 0.0, shiftleft(1L, i), 0L))").as("w0"),
        expr("aggregate(sequence(32,63), 0L, (acc, i) -> " +
          "acc + IF(element_at(embedding, i+1) >= 0.0, shiftleft(1L, i-32), 0L))").as("w1"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val q = codes.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("w0").as("q0"), col("w1").as("q1"))
    val ham = q.hint("broadcast").crossJoin(
        codes.select(col("vec_id").as("cid"), col("w0"), col("w1")))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        expr("cast(bit_count(q0 ^ w0) + bit_count(q1 ^ w1) as bigint)").as("hamming"))
    val hw = Window.partitionBy(col("qid")).orderBy(col("hamming"), col("cid"))
    val shortlist = ham.withColumn("rn", row_number().over(hw))
      .filter(col("rn") <= 8).drop("rn")
    val e = t(s, dir, "embeddings")
    val qv = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val cv = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val rw = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    broadcast(shortlist.join(qv.hint("broadcast"), Seq("qid")))
      .join(cv, Seq("cid"))
      .select(col("qid"), col("cid"), col("hamming"),
        expr(cosineExpr("qe", "ce")).as("cos"))
      .withColumn("rank", row_number().over(rw)).filter(col("rank") <= 3)
      .select(col("qid"), col("rank"), col("cid"), col("hamming"),
        round(col("cos"), 6).as("cosine"))
      .psort(col("qid"), col("rank"))
  }

  private val s16Sql =
    s"""WITH codes AS (
       |  SELECT vec_id,
       |    CAST(LIST_SUM([CASE WHEN embedding[i+1] >= 0 THEN (1::BIGINT << i)
       |                   ELSE 0 END FOR i IN RANGE(0,32)]) AS BIGINT) AS w0,
       |    CAST(LIST_SUM([CASE WHEN embedding[i+33] >= 0 THEN (1::BIGINT << i)
       |                   ELSE 0 END FOR i IN RANGE(0,32)]) AS BIGINT) AS w1
       |  FROM embeddings),
       |ham AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    CAST(bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1)) AS BIGINT) AS hamming
       |  FROM codes q JOIN codes c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
       |short AS (
       |  SELECT qid, cid, hamming FROM (
       |    SELECT qid, cid, hamming,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY hamming, cid) AS rn
       |    FROM ham) WHERE rn <= 8),
       |rer AS (
       |  SELECT s.qid, s.cid, s.hamming,
       |    ${cosineSql("qe.embedding", "ce.embedding")} AS cos
       |  FROM short s JOIN embeddings qe ON s.qid = qe.vec_id
       |               JOIN embeddings ce ON s.cid = ce.vec_id)
       |SELECT qid, rank, cid, hamming, ROUND(cos, 6) AS cosine FROM (
       |  SELECT qid, cid, hamming, cos,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
       |  FROM rer) WHERE rank <= 3
       |ORDER BY qid, rank""".stripMargin

  /** s17: hybrid retrieval with reciprocal-rank fusion — the two-arm
    * retrieval stack a training-data pipeline runs for curation and eval-set
    * mining: a DENSE arm (exact cosine top-20, the s01 shape) and a LEXICAL
    * arm (word-3-gram Jaccard top-20 over the d02 shared shingle index),
    * fused per query with RRF: score = Σ_arms 1/(60 + rank) (Cormack et al.
    * 2009's k=60), top-10 kept.
    *
    * Determinism: each arm's contribution is quantized once to integer
    * nano-units (round(1e9/(60+r)) — integer-valued doubles, exact addition
    * in both engines), so fused ordering is exact integer comparison.
    *
    * Scale: both arms broadcast the bounded query set and STREAM the
    * corpus — the dense arm is one map-side scoring pass + per-query top-k,
    * the lexical arm joins query shingles (broadcast) against the corpus
    * posting explode with no corpus self-join; fusion touches only the
    * 2×20-per-query shortlist union. At 100 TB the arms' candidate
    * generation swaps to the IVF cells (s02) / df-capped postings (d02)
    * already in the repo — the fusion stage is unchanged. */
  private val s17: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val wD = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    val dense = q.hint("broadcast").crossJoin(c)
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), expr(cosineExpr("qe", "ce")).as("cos"))
      .withColumn("rd", row_number().over(wD))
      .filter(col("rd") <= 20).select(col("qid"), col("cid"), col("rd"))

    val sh = Dedup.docsWithShingles(s, dir)
    val qsh = sh.filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"), explode(col("sh")).as("g"))
    val csh = sh.select(col("doc_id").as("cid"), explode(col("sh")).as("g"))
    val sizes = sh.select(col("doc_id"), col("n"))
    val wL = Window.partitionBy(col("qid")).orderBy(col("jac").desc, col("cid"))
    val lex = csh.join(broadcast(qsh), Seq("g"))
      .filter(col("qid") =!= col("cid"))
      .groupBy(col("qid"), col("cid")).agg(count(lit(1)).as("common"))
      .join(sizes.as("sq"), col("qid") === col("sq.doc_id"))
      .join(sizes.as("sc"), col("cid") === col("sc.doc_id"))
      .select(col("qid"), col("cid"),
        (col("common").cast("double") /
          (col("sq.n") + col("sc.n") - col("common")).cast("double")).as("jac"))
      .withColumn("rl", row_number().over(wL))
      .filter(col("rl") <= 20).select(col("qid"), col("cid"), col("rl"))

    val fused = dense.join(lex, Seq("qid", "cid"), "full_outer")
      .select(col("qid"), col("cid"),
        (coalesce(round(lit(1000000000.0) / (col("rd") + 60), 0), lit(0.0)) +
          coalesce(round(lit(1000000000.0) / (col("rl") + 60), 0), lit(0.0)))
          .cast("long").as("rrf_nano"),
        coalesce(col("rd"), lit(0)).as("dense_rank"),
        coalesce(col("rl"), lit(0)).as("lex_rank"))
    val wF = Window.partitionBy(col("qid")).orderBy(col("rrf_nano").desc, col("cid"))
    fused.withColumn("rank", row_number().over(wF))
      .filter(col("rank") <= 10)
      .select(col("qid"), col("rank"), col("cid"), col("rrf_nano"),
        col("dense_rank"), col("lex_rank"))
      .psort(col("qid"), col("rank"))
  }

  private val s17Sql =
    s"""WITH docs AS (${Dedup.docsShSql}),
       |qv AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
       |dense AS (
       |  SELECT qid, cid, rd FROM (
       |    SELECT qid, c.vec_id AS cid,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
       |        ${cosineSql("qe", "c.embedding")} DESC, c.vec_id) AS rd
       |    FROM qv CROSS JOIN embeddings c WHERE qid <> c.vec_id)
       |  WHERE rd <= 20),
       |qsh AS (SELECT doc_id AS qid, UNNEST(sh) AS g FROM docs WHERE doc_id < 5),
       |csh AS (SELECT doc_id AS cid, UNNEST(sh) AS g FROM docs),
       |co AS (
       |  SELECT qid, cid, COUNT(*) AS common FROM csh JOIN qsh USING (g)
       |  WHERE qid <> cid GROUP BY qid, cid),
       |sizes AS (SELECT doc_id, LEN(sh) AS n FROM docs),
       |lex AS (SELECT qid, cid, rl FROM (
       |  SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
       |    common::DOUBLE / (sq.n + sc.n - common)::DOUBLE DESC, cid) AS rl
       |  FROM co JOIN sizes sq ON qid = sq.doc_id JOIN sizes sc ON cid = sc.doc_id)
       |  WHERE rl <= 20),
       |fused AS (
       |  SELECT COALESCE(d.qid, l.qid) AS qid, COALESCE(d.cid, l.cid) AS cid,
       |    CAST(COALESCE(ROUND(CAST(1000000000 AS DOUBLE)/(d.rd + 60), 0), 0) +
       |         COALESCE(ROUND(CAST(1000000000 AS DOUBLE)/(l.rl + 60), 0), 0) AS BIGINT) AS rrf_nano,
       |    CAST(COALESCE(d.rd, 0) AS INTEGER) AS dense_rank,
       |    CAST(COALESCE(l.rl, 0) AS INTEGER) AS lex_rank
       |  FROM dense d FULL OUTER JOIN lex l ON d.qid = l.qid AND d.cid = l.cid)
       |SELECT qid, rank, cid, rrf_nano, dense_rank, lex_rank FROM (
       |  SELECT qid, cid, rrf_nano, dense_rank, lex_rank,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rrf_nano DESC, cid) AS rank
       |  FROM fused) WHERE rank <= 10
       |ORDER BY qid, rank""".stripMargin

  /** s18: graph centrality over the kNN similarity graph — the coreset /
    * data-valuation signal (representativeness) the selection literature
    * computes on exactly this graph: 5 PageRank iterations (damping 0.85)
    * over s09's cell-blocked top-3 edges, in EXACT integer micro-units so
    * both engines agree bit-for-bit: pr0 = 1e6; pr'(v) = 150000 +
    * (850 · Σ_u pr(u) div outdeg(u)) div 1000 — every operand positive, so
    * Spark's `div` and DuckDB's `//` floor identically. Top-20 central
    * vectors reported.
    *
    * Scale: the edge list is 3N rows built ONCE from the persisted trained
    * assignment (no new corpus pass); each iteration is one hash shuffle
    * on dst — the standard distributed-PageRank cost, and at 100 TB each
    * iteration's frame would checkpoint to break lineage. Driver holds
    * nothing. */
  private val s18: Q = (s, dir) => {
    val (_, assigned) = trainedIvf(s, dir)
    // r13 (guide §2.4 — establish the partitioning once): the 5 chained
    // iterations each join the edge list on src and the node list on id;
    // persisting BOTH assets already hash-clustered on their join keys
    // (and folding the degree join into the build) means every iteration's
    // joins find co-partitioned inputs — the only per-iteration exchange
    // left is the contribution aggregation on dst, the irreducible
    // distributed-PageRank shuffle. (Formerly: edges persisted unkeyed +
    // per-iteration deg re-join = up to 3 exchanges per iteration.)
    val eDeg = memoized(s"s18edeg:$dir") {
      val edges = knnTop3(s, dir)
        .select(col("qid").as("src"), col("cid").as("dst"))
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
      edges.join(deg, Seq("src"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val nodes = memoized(s"s18nodes:$dir") {
      assigned.select(col("vec_id").as("id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    var pr = nodes.withColumn("pr", lit(1000000L))
    (1 to 5).foreach { _ =>
      val contrib = eDeg.join(pr, col("src") === col("id"))
        .select(col("dst"), expr("pr div d").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("cs"))
      // truncate the plan tower per iteration (the d22 Pregel discipline):
      // without it, iteration k's analyze/optimize pass re-walks k nested
      // join-aggregate layers plus the whole index lineage — by iteration
      // 5 the DRIVER planning time dominates the tiny per-iteration jobs.
      // At 100 TB the same checkpoint breaks lineage for fault tolerance.
      pr = nodes.join(contrib, col("id") === col("dst"), "left")
        .select(col("id"),
          expr("150000L + (850L * coalesce(cs, 0L)) div 1000L").as("pr"))
        .localCheckpoint(true)
    }
    pr.orderBy(col("pr").desc, col("id")).limit(20)
      .select(col("id").as("vec_id"), col("pr").as("pr_micro"))
      .psort(col("pr_micro").desc, col("vec_id"))
  }

  private val s18Sql = {
    def iter(k: Int): String =
      s"""pr$k AS (
         |  SELECT n.id, 150000 + (850 * COALESCE(SUM(c.contrib), 0)) // 1000 AS pr
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst, p.pr // d.d AS contrib
         |    FROM edges e JOIN pr${k - 1} p ON e.src = p.id
         |    JOIN deg d ON e.src = d.src) c
         |  ON n.id = c.dst GROUP BY n.id)""".stripMargin
    s"""$ivfCtePrefix,
       |gscored AS (
       |  SELECT a.cid AS qid, b.cid, ${cosineSql("a.ce", "b.ce")} AS cos
       |  FROM assignF a JOIN assignF b ON a.cell = b.cell AND a.cid <> b.cid),
       |rankedg AS (
       |  SELECT qid, cid, ROW_NUMBER() OVER (
       |    PARTITION BY qid ORDER BY cos DESC, cid) AS rank
       |  FROM gscored),
       |edges AS (SELECT qid AS src, cid AS dst FROM rankedg WHERE rank <= 3),
       |nodes AS (SELECT DISTINCT cid AS id FROM assignF),
       |deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
       |pr0 AS (SELECT id, CAST(1000000 AS BIGINT) AS pr FROM nodes),
       |${(1 to 5).map(iter).mkString(",\n")}
       |SELECT id AS vec_id, CAST(pr AS BIGINT) AS pr_micro FROM pr5
       |ORDER BY pr DESC, id LIMIT 20""".stripMargin
  }

  // ---- s19: IVFPQ (coarse cells + residual product quantization) ----------
  /** Residual of a float vector against its coarse cell's centroid, stored
    * float32 (what a real IVFPQ index keeps): double-exact subtraction of
    * the fixed-point-trained centroid, rounded once to float. The centroid
    * table rides as one constant-folded nested literal (k x dim doubles,
    * ~4 KB) so the residual is a map-only codegen expression — no join on
    * the corpus-scale pass. */
  private def residCol(cents: Array[graft.operators.IvfIndex.Centroid],
                       vec: Column, cell: Column): Column = {
    val centsLit = typedlit(cents.sortBy(_.cell).map(_.vec.toSeq).toSeq)
    val cvec = element_at(centsLit, cell + 1)
    transform(vec, (x, i) =>
      (x.cast("double") - element_at(cvec, i + 1)).cast("float"))
  }

  /** Per-dir memoized IVFPQ model: residual codebooks (the SAME
    * fixed-point Lloyd as s10's PQ, but trained on coarse-cell residuals —
    * residuals concentrate near zero, so the 4-bit-per-subspace budget
    * buys much finer quantization than raw-vector PQ) plus the coded
    * corpus keyed by its coarse cell: (ivf_cell, 8 codes) = the classic
    * billion-scale index layout (8 B/vector + cell id). */
  private val ivfpqModel = scala.collection.concurrent.TrieMap[
    String, (Seq[Array[graft.operators.IvfIndex.Centroid]], DataFrame)]()
  private def trainedIvfPq(s: SparkSession, dir: String) = {
    val cached = ivfpqModel.get(dir)
      .filter(!_._2.sparkSession.sparkContext.isStopped)
    cached.getOrElse {
      val (cents, assigned) = trainedIvf(s, dir)
      val resid = assigned
        .select(col("vec_id"), col("cell").as("ivf_cell"),
          residCol(cents, col("embedding"), col("cell")).as("rvec"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val books = (0 until pqM).map { j =>
        graft.operators.IvfIndex.train(
          resid.select(col("vec_id"),
            expr(s"slice(rvec, ${j * pqSubDim + 1}, $pqSubDim)").as("sub")),
          "vec_id", "sub", k = pqK, iters = pqIters)
      }
      val codes = books.zipWithIndex.foldLeft(resid) { case (df, (cb, j)) =>
          graft.operators.IvfIndex.assign(
              df.withColumn("subv",
                expr(s"slice(rvec, ${j * pqSubDim + 1}, $pqSubDim)")),
              "vec_id", "subv", cb)
            .withColumnRenamed("cell", s"c$j").drop("subv")
        }
        .select(col("vec_id") +: col("ivf_cell") +:
          (0 until pqM).map(j => col(s"c$j")): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ivfpqModel.put(dir, (books, codes))
      (books, codes)
    }
  }

  /** s19: IVFPQ search — the standard billion-scale ANN index (coarse IVF
    * cells prune the corpus to nprobe/k, residual PQ codes compress what
    * remains to 8 bytes/vector, ADC scores candidates without touching raw
    * vectors). The query's residual is taken against EACH probed cell's
    * centroid (the IVFPQ asymmetric-distance contract), then scored with
    * the native graft_pq_adc table lookups over that cell's codes.
    *
    * Scale: probing is a map-only expression over the broadcast centroid
    * literal; candidates come from an equi-join on the coarse cell (the
    * corpus lives bucketed by cell); per-candidate cost is m lookups into
    * the broadcast codebooks. Build cost rides the persisted IVF
    * assignment + one residual pass; all driver state is O(k·dim) scalars. */
  private val s19: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val (cents, _) = trainedIvf(s, dir)
    val (books, codes) = trainedIvfPq(s, dir)
    val probes = graft.operators.IvfIndex.probeRanked(
        e.filter(col("vec_id") < 20), "vec_id", "embedding", cents,
        maxProbe = 3)
      .select(col("qid"), col("cell"),
        residCol(cents, col("qe"), col("cell")).as("qr"))
    val cands = codes.select(col("vec_id").as("cid"),
      col("ivf_cell").as("cell"),
      array((0 until pqM).map(j => col(s"c$j")): _*).as("cs"))
    val w = Window.partitionBy(col("qid")).orderBy(col("adc").asc, col("cid"))
    probes.join(cands, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        adcCol(books, col("qr"), col("cs")).as("adc"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("rank"), col("cid"),
        round(col("adc"), 6).as("adc_dist"))
      .psort(col("qid"), col("rank"))
  }

  /** Oracle: full replay — the s04 IVF training/probing prefix, float32
    * residuals against the final centroids, per-subspace residual k-means
    * (the s10 pattern re-seeded on residual slices), coded assignment, and
    * the per-probed-cell ADC sum in subspace order. */
  private lazy val s19Sql: String = {
    def sub(j: Int): String = {
      val off = j * pqSubDim + 1
      def iter(n: Int): String = {
        val prev = s"rc${j}_${n - 1}"
        s"""ra${j}_$n AS MATERIALIZED (
           |  SELECT vec_id, v, cell FROM (
           |    SELECT e.vec_id, e.v, c.cell,
           |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${dist2Sql("e.v", "c.vec")}, c.cell) AS rn
           |    FROM r$j e CROSS JOIN $prev c) WHERE rn = 1),
           |ru${j}_$n AS (
           |  SELECT cell, i,
           |    CAST(SUM(CAST(FLOOR(v[i]::DOUBLE * 1048576.0) AS BIGINT)) AS DOUBLE)
           |      / COUNT(*) / 1048576.0 AS comp
           |  FROM ra${j}_$n, range(1, ${pqSubDim + 1}) rr(i) GROUP BY cell, i),
           |rc${j}_$n AS MATERIALIZED (
           |  SELECT p.cell, COALESCE(u.vec, p.vec) AS vec
           |  FROM $prev p LEFT JOIN
           |    (SELECT cell, LIST(comp ORDER BY i) AS vec FROM ru${j}_$n GROUP BY cell) u
           |    ON p.cell = u.cell)""".stripMargin
      }
      s"""r$j AS MATERIALIZED (
         |  SELECT vec_id, [x::DOUBLE FOR x IN rv[$off:${off + pqSubDim - 1}]] AS v
         |  FROM resid),
         |rc${j}_0 AS (
         |  SELECT cell, vec FROM (
         |    SELECT CAST(ROW_NUMBER() OVER (
         |        ORDER BY ${md5iSql("CAST(vec_id AS VARCHAR)")}, CAST(vec_id AS VARCHAR)
         |      ) AS INTEGER) - 1 AS cell,
         |      [x::DOUBLE FOR x IN rv[$off:${off + pqSubDim - 1}]] AS vec
         |    FROM resid) WHERE cell < $pqK),
         |${(1 to pqIters).map(iter).mkString(",\n")},
         |rcode$j AS MATERIALIZED (
         |  SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dist2Sql("e.v", "c.vec")}, c.cell) AS rn
         |    FROM r$j e CROSS JOIN rc${j}_$pqIters c) WHERE rn = 1),
         |rsc$j AS MATERIALIZED (
         |  SELECT q.qid, a.vec_id AS cid,
         |    ${dist2Sql(s"[x::DOUBLE FOR x IN q.qr[$off:${off + pqSubDim - 1}]]", "c.vec")} AS d$j
         |  FROM qres q JOIN rcell r ON q.cell = r.cell AND q.qid <> r.vec_id
         |    JOIN rcode$j a ON a.vec_id = r.vec_id
         |    JOIN rc${j}_$pqIters c ON a.cell = c.cell)""".stripMargin
    }
    val joins = (1 until pqM)
      .map(j => s"JOIN rsc$j USING (qid, cid)").mkString("\n  ")
    val adcSum = (0 until pqM).map(j => s"d$j").mkString(" + ")
    s"""$ivfCtePrefix,
       |resid AS MATERIALIZED (
       |  SELECT a.cid AS vec_id, a.cell,
       |    [CAST(CAST(z[1] AS DOUBLE) - z[2] AS REAL)
       |     FOR z IN LIST_ZIP(a.ce, c.vec)] AS rv
       |  FROM assignF a JOIN $ivfFinalCentsCte c ON a.cell = c.cell),
       |rcell AS (SELECT vec_id, cell FROM resid),
       |qres AS MATERIALIZED (
       |  SELECT p.qid, p.cell,
       |    [CAST(CAST(z[1] AS DOUBLE) - z[2] AS REAL)
       |     FOR z IN LIST_ZIP(p.qe, c.vec)] AS qr
       |  FROM probe p JOIN $ivfFinalCentsCte c ON p.cell = c.cell),
       |${(0 until pqM).map(sub).mkString(",\n")},
       |adcs AS (
       |  SELECT qid, cid, $adcSum AS adc FROM rsc0
       |  $joins),
       |rankedpq AS (
       |  SELECT qid, cid, adc,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc ASC, cid) AS rank
       |  FROM adcs)
       |SELECT qid, rank, cid, ROUND(adc, 6) AS adc_dist
       |FROM rankedpq WHERE rank <= 3 ORDER BY qid, rank""".stripMargin
  }

  /** s20: IVF index health report — per-cell population and integer-ppm
    * load factor (1e6 = perfectly balanced) off the SAME persisted trained
    * assignment s04/s06/s13/s18 serve from. The number an index operator
    * watches: a cell whose load_ppm drifts far above 1e6 is the hot
    * shard that turns nprobe into a full scan, and the rebalance trigger.
    *
    * Scale: ONE tiny aggregation over the persisted assignment (k cells
    * of output), a broadcast 1-row total — the engine never re-trains.
    * The DuckDB oracle must replay the entire seeding + 3-Lloyd-iteration
    * training CTE per execution: exactly the build-once/serve-many gap
    * that pays for an index at 100 TB. */
  private val s20: Q = (s, dir) => {
    val (_, assigned) = trainedIvf(s, dir)
    val sizes = assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"))
    sizes.crossJoin(broadcast(sizes.agg(sum(col("n_vecs")).as("total"))))
      .select(col("cell"), col("n_vecs"),
        expr(s"n_vecs * $ivfK * 1000000L div total").as("load_ppm"))
      .psort(col("cell"))
  }

  private val s20Sql: String =
    s"""$ivfCtePrefix,
       |sizes AS (
       |  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs
       |  FROM assignF GROUP BY cell),
       |tot AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS total FROM sizes)
       |SELECT cell, n_vecs,
       |  n_vecs * $ivfK * 1000000 // total AS load_ppm
       |FROM sizes, tot ORDER BY cell""".stripMargin

  /** s21: delete-aware ANN serving — s13's merged base+batch IVF index
    * with a TOMBSTONE set applied at query time (vec_id % 17 == 3 of the
    * base corpus is deleted). Production vector stores cannot rebuild the
    * index per delete; they carry a tombstone list and exclude at serve
    * time — here the exclusion is a broadcast LEFT ANTI join applied to
    * the assigned index BELOW the cell-probe equi-join, so deleted vectors
    * never enter a candidate list and the index itself is untouched.
    *
    * Scale: the tombstone side is a bounded id list (deletes << corpus),
    * broadcast onto the index scan — no extra shuffle, no rebuild; the
    * probe/search shape is exactly s13's (cell equi-join + per-query
    * top-k). Compaction (physically dropping tombstoned rows) is the
    * amortized background path, serving correctness never waits for it. */
  private val s21: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val (centroids, assigned) = trainedIvf(s, dir)
    val toDouble = (c: String) => expr(s"transform($c, x -> cast(x as double))")
    val batch = e.filter(col("vec_id") % 37 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        expr("transform(embedding, x -> cast(x as double) * 1.01d)")
          .as("embedding"))
    val batchAssigned = graft.operators.IvfIndex
      .assign(batch, "vec_id", "embedding", centroids)
      .select(col("vec_id"), col("embedding"), col("cell"))
    val tombstones = e.filter(col("vec_id") % 17 === 3)
      .select(col("vec_id").as("del_id"))
    val augmented = assigned
      .select(col("vec_id"), toDouble("embedding").as("embedding"), col("cell"))
      .unionAll(batchAssigned)
      .join(broadcast(tombstones), col("vec_id") === col("del_id"),
        "left_anti")
    val qs = e.filter(col("vec_id") < 20)
      .select(col("vec_id"), toDouble("embedding").as("embedding"))
    graft.operators.IvfIndex
      .search(augmented, qs, "vec_id", "embedding", centroids,
        nprobe = 3, topk = 3)
      .select(col("qid"), col("rank"), col("cid"),
        (col("cid") >= 1000000L).as("is_new"), col("cosine"))
      .psort(col("qid"), col("rank"))
  }

  private lazy val s21Sql =
    s"""$ivfCtePrefix,
       |batch AS (
       |  SELECT vec_id + 1000000 AS cid,
       |    [x::DOUBLE * 1.01 FOR x IN embedding] AS ce
       |  FROM embeddings WHERE vec_id % 37 = 0),
       |bassign AS (
       |  SELECT cid, ce, cell FROM (
       |    SELECT b.cid, b.ce, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY b.cid
       |        ORDER BY ${dist2Sql("b.ce", "c.vec")}, c.cell) AS rn
       |    FROM batch b CROSS JOIN cents$ivfIters c) WHERE rn = 1),
       |aug AS (
       |  SELECT cid, ce, cell FROM assignF
       |  UNION ALL SELECT cid, ce, cell FROM bassign),
       |live AS (
       |  SELECT * FROM aug
       |  WHERE cid NOT IN (SELECT vec_id FROM embeddings WHERE vec_id % 17 = 3)),
       |augscored AS (
       |  SELECT p.qid, a.cid, ${cosineSql("p.qe", "a.ce")} AS cos
       |  FROM probe p JOIN live a ON p.cell = a.cell AND p.qid <> a.cid),
       |ranked AS (
       |  SELECT qid, cid, cos,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
       |  FROM augscored)
       |SELECT qid, rank, cid, cid >= 1000000 AS is_new,
       | ROUND(cos, 6) AS cosine
       |FROM ranked WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  /** s22: hard-negative mining — for each query vector, the most similar
    * candidates with a DIFFERENT label: the contrastive-training staple
    * (high-similarity cross-label examples are the negatives that teach an
    * embedding model its decision boundary; random negatives are too easy
    * to carry gradient). Candidates come from the trained IVF cells with
    * the label-mismatch predicate applied BELOW the top-k window — the s08
    * filtered-ANN shape with an inequality predicate bound per query.
    *
    * Scale: cell equi-join (never all-pairs), per-query top-3 via a
    * qid-partitioned window; the label join rides the bounded query side.
    * Mining across a 100 TB corpus is exactly this plan per shard. */
  private val s22: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val (centroids, assigned) = trainedIvf(s, dir)
    val q = graft.operators.IvfIndex
      .probeRanked(e.filter(col("vec_id") < 20), "vec_id", "embedding",
        centroids, 3)
      .select(col("qid"), col("qe"), col("cell"))
      .join(e.select(col("vec_id").as("qid"), col("label").as("qlabel")),
        Seq("qid"))
    val c = assigned.select(col("vec_id").as("cid"),
      col("embedding").as("ce"), col("label").as("neg_label"), col("cell"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    q.join(c, Seq("cell"))
      .filter(col("qid") =!= col("cid") && col("neg_label") =!= col("qlabel"))
      .select(col("qid"), col("qlabel"), col("cid"), col("neg_label"),
        expr(cosineExpr("qe", "ce")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("rank"), col("qlabel"), col("cid"),
        col("neg_label"), round(col("cos"), 6).as("cosine"))
      .psort(col("qid"), col("rank"))
  }

  private lazy val s22Sql =
    s"""$ivfCtePrefix,
       |negscored AS (
       |  SELECT p.qid, qemb.label AS qlabel, a.cid, cemb.label AS neg_label,
       |    ${cosineSql("p.qe", "a.ce")} AS cos
       |  FROM probe p JOIN assignF a ON p.cell = a.cell AND p.qid <> a.cid
       |  JOIN embeddings qemb ON qemb.vec_id = p.qid
       |  JOIN embeddings cemb ON cemb.vec_id = a.cid
       |  WHERE cemb.label <> qemb.label),
       |ranked AS (
       |  SELECT qid, qlabel, cid, neg_label, cos,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
       |  FROM negscored)
       |SELECT qid, rank, qlabel, cid, neg_label, ROUND(cos, 6) AS cosine
       |FROM ranked WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  /** s23: quantization-ladder recall report — one table comparing every
    * compression tier the index stack offers (int8 scalar quantization,
    * 8-byte product quantization, 1-bit sign codes) against the EXACT
    * ranking under that tier's own target metric (float dot / L2 /
    * cosine), so each row isolates pure quantization loss: the
    * capacity-planning artifact that decides which tier a deployment can
    * afford at its recall floor. Macro recall@3 over the 20-query sample
    * in exact integer ppm.
    *
    * Scale: every arm reuses its production machinery (s07's memoized
    * int8 index, the trained PQ codes, s16's sign-bit codes); truths are
    * the bounded 20-query broadcast cross joins the recall evals already
    * pay. Output is O(methods). */
  private val s23: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val base = q.hint("broadcast").crossJoin(c)
      .filter(col("qid") =!= col("cid"))
    def top3(df: DataFrame, m: Column, asc: Boolean): DataFrame = {
      val w = Window.partitionBy(col("qid"))
        .orderBy(if (asc) m.asc else m.desc, col("cid"))
      df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3).select(col("qid"), col("cid"))
    }
    val dotTruth = top3(base.select(col("qid"), col("cid"),
      expr("cast(graft_dot(qe, ce) as double)").as("m")), col("m"), asc = false)
    val l2Truth = top3(base.select(col("qid"), col("cid"),
      expr("graft_l2(qe, ce)").as("m")), col("m"), asc = true)
    val cosTruth = top3(base.select(col("qid"), col("cid"),
      expr(cosineExpr("qe", "ce")).as("m")), col("m"), asc = false)
    def recallRow(method: String, truth: DataFrame,
                  arm: DataFrame): DataFrame =
      truth
        .join(arm.select(col("qid"), col("cid")).withColumn("hit", lit(1)),
          Seq("qid", "cid"), "left")
        .agg(count(col("hit")).as("hits"))
        .select(lit(method).as("method"), col("hits"),
          expr("hits * 1000000L div 60").as("recall_ppm"))
    recallRow("int8", dotTruth, s07(s, dir))
      .unionAll(recallRow("pq", l2Truth, s10(s, dir)))
      .unionAll(recallRow("binary", cosTruth, s16(s, dir)))
      .psort(col("method"))
  }

  private lazy val s23Sql =
    s"""$pqCtes,
       |$bruteTruthCtes,
       |pqtop AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc ASC, cid) AS rn
       |    FROM pqscored) WHERE rn <= 3),
       |l2d AS (
       |  SELECT qid, c.vec_id AS cid,
       |    ${dist2Sql("qe", "[x::DOUBLE FOR x IN c.embedding]")} AS d
       |  FROM (SELECT vec_id AS qid, [x::DOUBLE FOR x IN embedding] AS qe
       |        FROM embeddings WHERE vec_id < 20) q
       |  CROSS JOIN embeddings c WHERE qid <> c.vec_id),
       |l2truth AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d ASC, cid) AS rn
       |    FROM l2d) WHERE rn <= 3),
       |dotd AS (
       |  SELECT qid, c.vec_id AS cid,
       |    LIST_REDUCE(LIST_PREPEND(0.0::DOUBLE,
       |      [z[1]::DOUBLE * z[2]::DOUBLE FOR z IN LIST_ZIP(qe, c.embedding)]),
       |      (acc, v) -> acc + v) AS d
       |  FROM (SELECT vec_id AS qid, embedding AS qe
       |        FROM embeddings WHERE vec_id < 20) q
       |  CROSS JOIN embeddings c WHERE qid <> c.vec_id),
       |dottruth AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d DESC, cid) AS rn
       |    FROM dotd) WHERE rn <= 3),
       |mx AS (
       |  SELECT MAX(LIST_MAX([ABS(x::DOUBLE) FOR x IN embedding])) AS m FROM embeddings),
       |qz AS (
       |  SELECT vec_id,
       |    [CAST(ROUND(x::DOUBLE / m * 127.0) AS BIGINT) FOR x IN embedding] AS qv
       |  FROM embeddings, mx),
       |i8scored AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    CAST(LIST_SUM([z[1] * z[2] FOR z IN LIST_ZIP(q.qv, c.qv)]) AS BIGINT) AS qdot
       |  FROM qz q JOIN qz c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
       |i8top AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY qdot DESC, cid) AS rn
       |    FROM i8scored) WHERE rn <= 3),
       |bcodes AS (
       |  SELECT vec_id,
       |    CAST(LIST_SUM([CASE WHEN embedding[i+1] >= 0 THEN (1::BIGINT << i)
       |                   ELSE 0 END FOR i IN RANGE(0,32)]) AS BIGINT) AS w0,
       |    CAST(LIST_SUM([CASE WHEN embedding[i+33] >= 0 THEN (1::BIGINT << i)
       |                   ELSE 0 END FOR i IN RANGE(0,32)]) AS BIGINT) AS w1
       |  FROM embeddings),
       |bham AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    CAST(bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1)) AS BIGINT) AS hamming
       |  FROM bcodes q JOIN bcodes c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
       |bshort AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY hamming, cid) AS rn
       |    FROM bham) WHERE rn <= 8),
       |brer AS (
       |  SELECT s.qid, s.cid, ${cosineSql("qe.embedding", "ce.embedding")} AS cos
       |  FROM bshort s JOIN embeddings qe ON s.qid = qe.vec_id
       |                JOIN embeddings ce ON s.cid = ce.vec_id),
       |bintop AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
       |    FROM brer) WHERE rn <= 3)
       |SELECT 'binary' AS method, CAST(COUNT(h.cid) AS BIGINT) AS hits,
       |  CAST(COUNT(h.cid) AS BIGINT) * 1000000 // 60 AS recall_ppm
       |FROM brute b LEFT JOIN bintop h ON b.qid = h.qid AND b.cid = h.cid
       |UNION ALL
       |SELECT 'int8', CAST(COUNT(h.cid) AS BIGINT),
       |  CAST(COUNT(h.cid) AS BIGINT) * 1000000 // 60
       |FROM dottruth b LEFT JOIN i8top h ON b.qid = h.qid AND b.cid = h.cid
       |UNION ALL
       |SELECT 'pq', CAST(COUNT(h.cid) AS BIGINT),
       |  CAST(COUNT(h.cid) AS BIGINT) * 1000000 // 60
       |FROM l2truth b LEFT JOIN pqtop h ON b.qid = h.qid AND b.cid = h.cid
       |ORDER BY method""".stripMargin

  /** s24: semi-supervised label propagation over the kNN graph — the
    * label-scarce curation pattern: 20% of vectors keep their label
    * (vec_id % 5 == 0 seeds), everything else is labeled by two rounds of
    * majority vote along s09/s18's cell-blocked top-3 edges (ties ->
    * smallest label; seeds never overwritten). The report groups by TRUE
    * label and scores the propagated set against it — the accuracy audit
    * that decides whether graph labels are good enough to train on.
    *
    * Scale: rides the SAME persisted edge list s18 built (build-once);
    * each round is one hash shuffle keyed on the destination vector —
    * bounded by 3N edges; seeds/labels stay (id, lbl) pairs, no vectors
    * move after edge construction. */
  private val s24: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val edges = memoized(s"s18edges:$dir") {
      knnTop3(s, dir)
        .select(col("qid").as("src"), col("cid").as("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val truth = e.select(col("vec_id").as("id"), col("label").cast("long"))
    val seeds = truth.filter(col("id") % 5 === 0)
    var labels = seeds
    (1 to 2).foreach { _ =>
      val cur = labels
      val votes = edges.join(cur.select(col("id").as("src"),
          col("label").as("vlbl")), Seq("src"))
        .groupBy(col("dst"), col("vlbl")).agg(count(lit(1)).as("n"))
      val vw = Window.partitionBy(col("dst"))
        .orderBy(col("n").desc, col("vlbl"))
      val winners = votes.withColumn("rn", row_number().over(vw))
        .filter(col("rn") === 1)
        .select(col("dst").as("id"), col("vlbl").as("label"))
        .join(cur.select(col("id")), Seq("id"), "left_anti")
      labels = cur.unionAll(winners)
    }
    val propagated = labels.join(seeds.select(col("id")), Seq("id"),
        "left_anti")
      .select(col("id"), col("label").as("plbl"))
    truth
      .join(seeds.select(col("id"), lit(1L).as("is_seed")), Seq("id"), "left")
      .join(propagated.select(col("id"), col("plbl")), Seq("id"), "left")
      .groupBy(col("label"))
      .agg(sum(coalesce(col("is_seed"), lit(0L))).as("n_seeded"),
        count(col("plbl")).as("n_propagated"),
        sum(when(col("plbl") === col("label"), 1L).otherwise(0L))
          .as("n_correct"))
      .withColumn("correct_ppm",
        expr("case when n_propagated > 0 " +
          "then n_correct * 1000000L div n_propagated else 0L end"))
      .psort(col("label"))
  }

  private lazy val s24Sql =
    s"""$ivfCtePrefix,
       |gscored AS (
       |  SELECT a.cid AS qid, b.cid, ${cosineSql("a.ce", "b.ce")} AS cos
       |  FROM assignF a JOIN assignF b ON a.cell = b.cell AND a.cid <> b.cid),
       |rankedg AS (
       |  SELECT qid, cid, ROW_NUMBER() OVER (
       |    PARTITION BY qid ORDER BY cos DESC, cid) AS rank
       |  FROM gscored),
       |edges AS (SELECT qid AS src, cid AS dst FROM rankedg WHERE rank <= 3),
       |truth AS (SELECT vec_id AS id, CAST(label AS BIGINT) AS label
       |          FROM embeddings),
       |seeds AS (SELECT id, label FROM truth WHERE id % 5 = 0),
       |v1 AS (
       |  SELECT e.dst, l.label AS vlbl, COUNT(*) AS n
       |  FROM edges e JOIN seeds l ON e.src = l.id GROUP BY 1, 2),
       |w1 AS (
       |  SELECT dst AS id, vlbl AS label FROM (
       |    SELECT dst, vlbl,
       |      ROW_NUMBER() OVER (PARTITION BY dst ORDER BY n DESC, vlbl) AS rn
       |    FROM v1) WHERE rn = 1),
       |l1 AS (
       |  SELECT id, label FROM seeds
       |  UNION ALL
       |  SELECT id, label FROM w1 WHERE id NOT IN (SELECT id FROM seeds)),
       |v2 AS (
       |  SELECT e.dst, l.label AS vlbl, COUNT(*) AS n
       |  FROM edges e JOIN l1 l ON e.src = l.id GROUP BY 1, 2),
       |w2 AS (
       |  SELECT dst AS id, vlbl AS label FROM (
       |    SELECT dst, vlbl,
       |      ROW_NUMBER() OVER (PARTITION BY dst ORDER BY n DESC, vlbl) AS rn
       |    FROM v2) WHERE rn = 1),
       |l2 AS (
       |  SELECT id, label FROM l1
       |  UNION ALL
       |  SELECT id, label FROM w2 WHERE id NOT IN (SELECT id FROM l1)),
       |prop AS (
       |  SELECT id, label AS plbl FROM l2
       |  WHERE id NOT IN (SELECT id FROM seeds))
       |SELECT t.label,
       |  CAST(SUM(CASE WHEN s.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_seeded,
       |  CAST(COUNT(p.plbl) AS BIGINT) AS n_propagated,
       |  CAST(SUM(CASE WHEN p.plbl = t.label THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_correct,
       |  CASE WHEN COUNT(p.plbl) > 0
       |    THEN CAST(SUM(CASE WHEN p.plbl = t.label THEN 1 ELSE 0 END)
       |      AS BIGINT) * 1000000 // CAST(COUNT(p.plbl) AS BIGINT)
       |    ELSE 0 END AS correct_ppm
       |FROM truth t
       |LEFT JOIN seeds s ON t.id = s.id
       |LEFT JOIN prop p ON t.id = p.id
       |GROUP BY t.label ORDER BY t.label""".stripMargin

  /** s25: vector dedup-at-ingest gate — before a new embedding batch joins
    * the index, each incoming vector is checked against the EXISTING
    * corpus within its probed IVF cells (nprobe=3) and rejected when its
    * max cosine >= 0.98: the semantic-dup admission control a production
    * vector store runs on every write (d05/d11 find dups AFTER the fact;
    * this keeps them out). Batch = s13's ingest slice (vec_id % 37,
    * jittered x1.01 — near-dups of their sources by construction, so the
    * gate must reject them; a 0.5-shifted control subset (% 74) lands
    * far from everything and must pass).
    *
    * Scale: the batch probes the broadcast centroid table (O(batch)),
    * candidates come from the cell equi-join against the persisted
    * assignment, and the verdict is one max-aggregation per batch vector
    * — the corpus is never scanned, exactly the serve-path cost model. */
  private val s25: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val (centroids, assigned) = trainedIvf(s, dir)
    val toDouble = (c: String) => expr(s"transform($c, x -> cast(x as double))")
    val batch = e.filter(col("vec_id") % 37 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        when(col("vec_id") % 74 === 0,
          expr("transform(embedding, x -> cast(x as double) + 0.5d)"))
          .otherwise(
            expr("transform(embedding, x -> cast(x as double) * 1.01d)"))
          .as("embedding"))
    val probed = graft.operators.IvfIndex
      .probeRanked(batch, "vec_id", "embedding", centroids, 3)
      .select(col("qid"), col("qe"), col("cell"))
    val cand = assigned
      .select(col("cell"), col("vec_id").as("cid"),
        toDouble("embedding").as("ce"))
    probed.join(cand, Seq("cell"))
      .select(col("qid"), col("cid"), expr(cosineExpr("qe", "ce")).as("cos"))
      .groupBy(col("qid"))
      .agg(max(col("cos")).as("max_cos"),
        expr("max_by(cid, struct(cos, -cid))").as("nearest_id"))
      .select(col("qid"), col("nearest_id"),
        round(col("max_cos"), 6).as("max_cosine"),
        (col("max_cos") < 0.98).as("accepted"))
      .psort(col("qid"))
  }

  private lazy val s25Sql =
    s"""$ivfCtePrefix,
       |batch AS (
       |  SELECT vec_id + 1000000 AS bid,
       |    CASE WHEN vec_id % 74 = 0
       |      THEN [x::DOUBLE + 0.5 FOR x IN embedding]
       |      ELSE [x::DOUBLE * 1.01 FOR x IN embedding] END AS be
       |  FROM embeddings WHERE vec_id % 37 = 0),
       |bprobe AS (
       |  SELECT bid, be, cell FROM (
       |    SELECT b.bid, b.be, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY b.bid
       |        ORDER BY ${dist2Sql("b.be", "c.vec")}, c.cell) AS cell_rank
       |    FROM batch b CROSS JOIN cents$ivfIters c) WHERE cell_rank <= 3),
       |bscored AS (
       |  SELECT p.bid, a.cid, ${cosineSql("p.be", "a.ce")} AS cos
       |  FROM bprobe p JOIN assignF a ON p.cell = a.cell),
       |verdict AS (
       |  SELECT bid, max_cos, nearest_id FROM (
       |    SELECT bid, cid AS nearest_id, cos AS max_cos,
       |      ROW_NUMBER() OVER (PARTITION BY bid ORDER BY cos DESC, cid)
       |        AS rn
       |    FROM bscored) WHERE rn = 1)
       |SELECT bid AS qid, nearest_id, ROUND(max_cos, 6) AS max_cosine,
       |  max_cos < 0.98 AS accepted
       |FROM verdict ORDER BY qid""".stripMargin

  /** s26: centroid-drift / index-staleness monitor — per trained cell,
    * the fixed-point mean squared distance of CORPUS members to their
    * centroid vs the same statistic for an incoming BATCH (s25's jittered
    * ingest slice): when a cell's batch mean runs hot (drift_ppm >> 1e6),
    * new data no longer fits the trained quantizer and the index needs
    * re-training — the health metric that schedules IVF rebuilds.
    * Distances quantize to floor(d2 * 2^20) BIGINT before averaging, so
    * the means and the ppm ratio are exact integers in both engines.
    *
    * Scale: both sides are map-only distance-to-own-centroid passes
    * against the broadcast centroid literal, then O(k)-row aggregations;
    * the batch never touches the corpus. */
  private val s26: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val (centroids, assigned) = trainedIvf(s, dir)
    val centsLit = typedlit(centroids.sortBy(_.cell).map(_.vec.toSeq).toSeq)
    val corpus = assigned
      .select(col("cell"),
        call_function("graft_l2",
          expr("transform(embedding, x -> cast(x as double))"),
          element_at(centsLit, col("cell") + 1)).as("d2"))
      .select(col("cell"),
        floor(col("d2") * 1048576.0).cast("long").as("fp"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_corpus"), sum(col("fp")).as("sfp"))
      .select(col("cell"), col("n_corpus"),
        expr("sfp div n_corpus").as("corpus_mean_fp"))
    val batch = e.filter(col("vec_id") % 37 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        when(col("vec_id") % 74 === 0,
          expr("transform(embedding, x -> cast(x as double) + 0.5d)"))
          .otherwise(
            expr("transform(embedding, x -> cast(x as double) * 1.01d)"))
          .as("embedding"))
    val bAssigned = graft.operators.IvfIndex
      .assign(batch, "vec_id", "embedding", centroids)
      .select(col("cell"),
        call_function("graft_l2", col("embedding"),
          element_at(centsLit, col("cell") + 1)).as("d2"))
      .select(col("cell"),
        floor(col("d2") * 1048576.0).cast("long").as("fp"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_batch"), sum(col("fp")).as("bsfp"))
      .select(col("cell"), col("n_batch"),
        expr("bsfp div n_batch").as("batch_mean_fp"))
    corpus.join(bAssigned, Seq("cell"), "left")
      .select(col("cell"), col("n_corpus"), col("corpus_mean_fp"),
        coalesce(col("n_batch"), lit(0L)).as("n_batch"),
        coalesce(col("batch_mean_fp"), lit(0L)).as("batch_mean_fp"),
        expr("case when corpus_mean_fp > 0 then " +
          "coalesce(batch_mean_fp, 0L) * 1000000L div corpus_mean_fp " +
          "else 0L end").as("drift_ppm"))
      .psort(col("cell"))
  }

  private lazy val s26Sql =
    s"""$ivfCtePrefix,
       |cdist AS (
       |  SELECT a.cell,
       |    CAST(FLOOR(${dist2Sql("a.ce", s"c.vec")} * 1048576.0) AS BIGINT)
       |      AS fp
       |  FROM assignF a JOIN cents$ivfIters c ON a.cell = c.cell),
       |corpus AS (
       |  SELECT cell, COUNT(*) AS n_corpus,
       |    CAST(SUM(fp) AS BIGINT) // COUNT(*) AS corpus_mean_fp
       |  FROM cdist GROUP BY cell),
       |batch AS (
       |  SELECT vec_id + 1000000 AS bid,
       |    CASE WHEN vec_id % 74 = 0
       |      THEN [x::DOUBLE + 0.5 FOR x IN embedding]
       |      ELSE [x::DOUBLE * 1.01 FOR x IN embedding] END AS be
       |  FROM embeddings WHERE vec_id % 37 = 0),
       |bassign AS (
       |  SELECT bid, be, cell FROM (
       |    SELECT b.bid, b.be, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY b.bid
       |        ORDER BY ${dist2Sql("b.be", "c.vec")}, c.cell) AS rn
       |    FROM batch b CROSS JOIN cents$ivfIters c) WHERE rn = 1),
       |bdist AS (
       |  SELECT a.cell,
       |    CAST(FLOOR(${dist2Sql("a.be", "c.vec")} * 1048576.0) AS BIGINT)
       |      AS fp
       |  FROM bassign a JOIN cents$ivfIters c ON a.cell = c.cell),
       |bagg AS (
       |  SELECT cell, COUNT(*) AS n_batch,
       |    CAST(SUM(fp) AS BIGINT) // COUNT(*) AS batch_mean_fp
       |  FROM bdist GROUP BY cell)
       |SELECT corpus.cell, n_corpus, corpus_mean_fp,
       |  COALESCE(n_batch, 0) AS n_batch,
       |  COALESCE(batch_mean_fp, 0) AS batch_mean_fp,
       |  CASE WHEN corpus_mean_fp > 0
       |    THEN COALESCE(batch_mean_fp, 0) * 1000000 // corpus_mean_fp
       |    ELSE 0 END AS drift_ppm
       |FROM corpus LEFT JOIN bagg ON corpus.cell = bagg.cell
       |ORDER BY corpus.cell""".stripMargin

  // ---- s27: streaming ANN serving (stream-static join) --------------------
  private val s27Counter = new java.util.concurrent.atomic.AtomicInteger()

  /** s27: the ONLINE serving path of the trained IVF index — query vectors
    * arrive as a STREAM and probe the persisted assignment through a
    * stream-STATIC equi-join (the Structured Streaming topology the other
    * streaming gates don't cover: static side = the build-once index,
    * stream side = live traffic). Per micro-batch: centroid probe ranking
    * is the same broadcast-literal argmin expression the batch path uses
    * (map-only on the stream), candidates come from the cell equi-join
    * against the static assignment, exact cosine scores in-stream; the
    * final top-3 cut runs as a DISTRIBUTED window on the drained snapshot
    * table (streaming append mode cannot rank; the snapshot partitions
    * stay executor-side via localCheckpoint). Results must equal s04's
    * batch search bit-for-bit — one code path serves both latencies.
    *
    * Scale: the static side stays partitioned by cell; each micro-batch
    * joins only its probed cells' postings — per-batch cost is
    * O(batch x nprobe x cell size), corpus never rescanned. */
  private val s27: Q = (s, dir) => {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val e = t(s, dir, "embeddings")
    val (centroids, assigned) = trainedIvf(s, dir)
    val qRows = e.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val ms = MemoryStream[(Long, Seq[Float])]
    // two waves -> the stream-static join runs across micro-batches
    val (w1, w2) = qRows.splitAt(qRows.length / 2)
    ms.addData(w1)
    ms.addData(w2)
    val qs = ms.toDF().toDF("qid", "qe")
    val probed = graft.operators.IvfIndex
      .probeRanked(qs, "qid", "qe", centroids, maxProbe = 3)
      .select(col("qid"), col("qe"), col("cell"))
    val scored = probed
      .join(assigned.select(col("vec_id").as("cid"),
        col("embedding").as("ce"), col("cell")), Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), expr("graft_cosine(qe, ce)").as("cos"))
    val sink = "s27_sink_" + s27Counter.incrementAndGet()
    val snap = graft.streaming.StreamingOps
      .snapshotToTable(scored, sink, "append", statePartitions = 4)
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    // the rank runs DISTRIBUTED on the snapshot table (the production
    // serve shape); localCheckpoint pins the partitions executor-side so
    // the temp view can drop without collapsing the lineage to the driver
    val ranked = snap.localCheckpoint(true)
    s.catalog.dropTempView(sink)
    ranked.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("rank"), col("cid"),
        round(col("cos"), 6).as("cosine"))
      .psort(col("qid"), col("rank"))
  }

  /** Oracle: identical to s04's — the streaming serve path must reproduce
    * the batch search exactly. */
  private val s27Sql: String = s04Sql

  // ---- s28: index persistence (save -> load -> serve) ---------------------
  /** s28: the DURABILITY leg of the build-once/serve-many lifecycle — the
    * trained IVF index (centroid table + cell assignment) is EXPORTED to
    * parquet, loaded back through a fresh scan lineage (no reference to
    * the in-memory model), and served: results must equal s04's search on
    * the live index bit-for-bit (doubles round-trip parquet exactly).
    * This is what lets a 100 TB deployment train the quantizer in one job
    * and serve it from object storage in every later job — the index
    * outlives the session, not just the TrieMap memo.
    *
    * Scale: the export is O(corpus) parquet (distributed write) + O(k)
    * centroids; the serve path is the same cell equi-join as s04 reading
    * from the persisted files, centroids collected O(k) driver-side. */
  private val s28: Q = (s, dir) => {
    import s.implicits._
    val e = t(s, dir, "embeddings")
    val (centroids, assigned) = trainedIvf(s, dir)
    val base = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_ivf_export_" + Integer.toHexString(dir.hashCode)).getAbsolutePath
    centroids.toSeq.map(c => (c.cell, c.vec.toSeq)).toDF("cell", "vec")
      .write.mode("overwrite").parquet(s"$base/centroids.parquet")
    assigned.select(col("vec_id"), col("embedding"), col("cell"))
      .write.mode("overwrite").parquet(s"$base/assigned.parquet")
    val loadedCents = s.read.parquet(s"$base/centroids.parquet")
      .collect().map(r => graft.operators.IvfIndex.Centroid(
        r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_.cell)
    val loadedAssign = s.read.parquet(s"$base/assigned.parquet")
    graft.operators.IvfIndex.search(loadedAssign,
        e.filter(col("vec_id") < 20), "vec_id", "embedding",
        loadedCents, nprobe = 3, topk = 3)
      .psort(col("qid"), col("rank"))
  }

  /** Oracle: identical to s04's — persistence must be lossless. */
  private val s28Sql: String = s04Sql

  // ---- s29: farthest-point (k-center) coreset selection --------------------

  private val kcK = 6

  /** s29: farthest-point traversal (Gonzalez k-center 2-approx) — the
    * diversity-subset-selection primitive behind coreset construction,
    * active-learning seed picks, and "cover the embedding space with k
    * exemplars" curation: seed = max-norm vector, then each round admits
    * the candidate FARTHEST from everything selected so far (exact squared
    * L2, argmax with vec_id tiebreak — fully deterministic). Output is the
    * selection order plus the coverage-radius decay curve (radius after i
    * centers = the next pick's separation, by definition of argmax), the
    * diagnostic a curator reads to choose k.
    *
    * Determinism: distances are graft_l2 sequential folds over exact
    * float→double widenings against typedlit'd selected vectors, min via
    * LEAST (exact), selection by (d DESC, vec_id) — both engines agree
    * bit-for-bit, no tolerance.
    *
    * Scale: k bounded passes over the corpus, each map-only against a
    * broadcast O(k·dim) literal with a global top-1 (TakeOrderedAndProject
    * — per-partition partial max, O(partitions) rows to the driver). No
    * shuffle of the corpus, no pairwise blowup; the O(k) driver rows are
    * the selected centers themselves — the same bounded-collect class as
    * IvfIndex centroids. */
  private val s29: Q = (s, dir) => {
    val cands = memoized(s"s29base:$dir") {
      val df = t(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x as double))").as("e"))
      df.persist(); df.count(); df
    }
    case class Pick(vecId: Long, vec: Seq[Double], sep: Option[Double])
    val seedRow = cands
      .select(col("vec_id"), col("e"),
        call_function("graft_dot", col("e"), col("e")).as("n2"))
      .orderBy(col("n2").desc, col("vec_id")).limit(1).head()
    var selected = Vector(
      Pick(seedRow.getLong(0), seedRow.getSeq[Double](1), None))
    def minDist = selected
      .map(p => call_function("graft_l2", col("e"), typedlit(p.vec)))
      .reduce(least(_, _))
    for (_ <- 2 to kcK) {
      val r = cands.select(col("vec_id"), col("e"), minDist.as("d"))
        .orderBy(col("d").desc, col("vec_id")).limit(1).head()
      selected :+= Pick(r.getLong(0), r.getSeq[Double](1), Some(r.getDouble(2)))
    }
    val finalRadius = cands.select(max(minDist).as("r")).head().getDouble(0)
    // radius after i centers = max min-dist = the (i+1)-th pick's separation
    val rows = selected.zipWithIndex.map { case (p, i) =>
      val after = if (i + 1 < selected.size) selected(i + 1).sep.get
                  else finalRadius
      (i + 1L, p.vecId, p.sep, after)
    }
    import s.implicits._
    rows.toDF("step", "vec_id", "sep_dist", "radius_after")
      .select(col("step"), col("vec_id"),
        round(col("sep_dist"), 6).as("sep_dist"),
        round(col("radius_after"), 6).as("radius_after"))
      .psort(col("step"))
  }

  private lazy val s29Sql: String = {
    def dot(a: String, b: String) =
      s"LIST_REDUCE(LIST_PREPEND(0.0::DOUBLE, [z[1]::DOUBLE * z[2]::DOUBLE FOR z IN LIST_ZIP($a, $b)]), (acc, v) -> acc + v)"
    // d{i} = min squared L2 to the first i picks; s{i+1} = argmax of d{i}
    val steps = (2 to kcK).map { i =>
      val prev = if (i == 2)
        s"d1 AS (SELECT c.vec_id, c.e, ${dist2Sql("c.e", "s1.e")} AS d FROM c CROSS JOIN s1)"
      else
        s"d${i - 1} AS (SELECT p.vec_id, p.e, LEAST(p.d, ${dist2Sql("p.e", s"s${i - 1}.e")}) AS d FROM d${i - 2} p CROSS JOIN s${i - 1})"
      prev + s",\ns$i AS (SELECT vec_id, e, d FROM d${i - 1} ORDER BY d DESC, vec_id LIMIT 1)"
    }.mkString(",\n")
    val lastD =
      s"d$kcK AS (SELECT p.vec_id, LEAST(p.d, ${dist2Sql("p.e", s"s$kcK.e")}) AS d FROM d${kcK - 1} p CROSS JOIN s$kcK)"
    val rows = (1 to kcK).map { i =>
      val sep = if (i == 1) "NULL::DOUBLE"
                else s"(SELECT ROUND(d, 6) FROM s$i)"
      val after = if (i < kcK) s"(SELECT ROUND(d, 6) FROM s${i + 1})"
                  else s"(SELECT ROUND(MAX(d), 6) FROM d$kcK)"
      s"SELECT $i::BIGINT AS step, (SELECT vec_id FROM s$i) AS vec_id, $sep AS sep_dist, $after AS radius_after"
    }.mkString("\nUNION ALL ")
    s"""WITH c AS (SELECT vec_id, embedding AS e FROM embeddings),
       |s1 AS (SELECT vec_id, e FROM c ORDER BY ${dot("e", "e")} DESC, vec_id LIMIT 1),
       |$steps,
       |$lastD
       |$rows
       |ORDER BY step""".stripMargin
  }

  // ---- s30: greedy graph-descent serve over the kNN graph -----------------
  private val gwHops = 3
  private val gwEntry = 100L

  /** s30: greedy best-first descent over the s09 kNN graph — the serve-time
    * navigation pattern of graph ANN indexes (NSW/HNSW layer-0): start at a
    * fixed entry node, repeatedly move to the neighbor of the current node
    * closest to the query, stop after a hop budget. Reuses the SAME persisted
    * adjacency the s09/s18/s24 family builds once (build-once/serve-many).
    *
    * Scale shape: the frontier is query-sized (one row per in-flight walk)
    * and BROADCASTS at every hop against the corpus-resident adjacency and
    * vector tables — the corpus never shuffles, and a hop costs
    * O(|queries| x degree) probe work regardless of corpus size. Hops are
    * sequential (inherent to graph descent) but each is a tiny
    * broadcast-hash join, so the 100 TB cost is hop-count x a
    * map-side-pruned scan, not any corpus-wide exchange.
    *
    * Determinism: candidate set per hop = neighbors(cur) U {cur} minus the
    * query node itself; argmax cosine with ties by lowest candidate id —
    * both engines fold the cosine in index order (graft_cosine), so the
    * walk is bit-reproducible and the oracle unrolls the identical hops. */
  private val s30: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val corpus = e.select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val adj = memoized(s"s30adj:$dir") {
      knnTop3(s, dir).select(col("qid").as("src"), col("cid").as("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("dst"))
    var walk = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        lit(gwEntry).as("cur"))
    for (_ <- 1 to gwHops) {
      val cands = walk.hint("broadcast").join(adj, col("cur") === col("src"))
        .select(col("qid"), col("qe"), col("dst"))
        .unionByName(walk.select(col("qid"), col("qe"), col("cur").as("dst")))
      walk = cands.filter(col("dst") =!= col("qid")).hint("broadcast")
        .join(corpus, col("dst") === col("nid"))
        .withColumn("cos", expr(cosineExpr("qe", "ne")))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("qid"), col("qe"), col("dst").as("cur"), col("cos"))
    }
    walk.select(col("qid"), col("cur").as("cid"),
        round(col("cos"), 6).as("cosine"))
      .psort(col("qid"))
  }

  private lazy val s30Sql: String = {
    // edges = the s09 graph (top-3 in-cell neighbors), then gwHops unrolled
    // greedy steps: candidates = out-edges of cur plus cur itself, next =
    // argmax cosine (ties -> lowest id), query node excluded throughout.
    val hops = (1 to gwHops).map { n =>
      s"""cand$n AS (
         |  SELECT w.qid, w.qe, x.dst FROM walk${n - 1} w JOIN edges x ON w.cur = x.src
         |  UNION ALL SELECT qid, qe, cur AS dst FROM walk${n - 1}),
         |walk$n AS (
         |  SELECT qid, qe, cur, cos FROM (
         |    SELECT c.qid, c.qe, c.dst AS cur, ${cosineSql("c.qe", "k.ne")} AS cos,
         |      ROW_NUMBER() OVER (PARTITION BY c.qid
         |        ORDER BY ${cosineSql("c.qe", "k.ne")} DESC, c.dst) AS rn
         |    FROM cand$n c JOIN corpus k ON c.dst = k.nid
         |    WHERE c.dst <> c.qid) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""$ivfCtePrefix,
       |g2scored AS (
       |  SELECT a.cid AS qid, b.cid, ${cosineSql("a.ce", "b.ce")} AS cos
       |  FROM assignF a JOIN assignF b ON a.cell = b.cell AND a.cid <> b.cid),
       |edges AS (
       |  SELECT qid AS src, cid AS dst FROM (
       |    SELECT qid, cid,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
       |    FROM g2scored) WHERE rank <= 3),
       |corpus AS (SELECT vec_id AS nid, v AS ne FROM e),
       |walk0 AS (
       |  SELECT vec_id AS qid, v AS qe, $gwEntry AS cur FROM e WHERE vec_id < 10),
       |$hops
       |SELECT qid, cur AS cid, ROUND(cos, 6) AS cosine FROM walk$gwHops
       |ORDER BY qid""".stripMargin
  }

  // ---- s31: adaptive-nprobe IVF serve (coverage-bound early termination) --
  /** s31: query-adaptive probe depth — instead of s04's fixed nprobe=3,
    * each query probes its distance-ranked cells only until the cumulative
    * candidate population reaches 25% of the corpus, then re-ranks exactly.
    * This is the production ANN serving refinement (per-query early
    * termination): queries landing in dense cells stop after 1 probe,
    * queries in sparse regions widen automatically — recall stabilizes
    * per-query instead of per-index, and the COST is output-proportional
    * (the coverage bound caps candidates at corpus/4 regardless of skew).
    *
    * Scale shape: centroids ride the plan as a broadcast literal (O(k x
    * dim)); the coverage cut is a per-query running sum over k<=8 rows;
    * candidates come from the same cell equi-join as s04 against the
    * persisted assignment. The only new state vs s04 is the k-row cell
    * histogram. */
  /** Shared adaptive-serve machinery: the coverage-bound probe set (every
    * query keeps its distance-ranked cells until the cumulative candidate
    * population reaches 25% of the corpus). Serves s31 (the serve surface)
    * and s32 (its recall audit) from ONE definition so the audited path
    * can never drift from the served path. */
  private def adaptiveProbed(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val (centroids, assigned) = trainedIvf(s, dir)
    val sizes = assigned.groupBy(col("cell")).agg(count(lit(1)).as("cnt"))
    val total = assigned.agg(count(lit(1)).as("total"))
    val wCum = Window.partitionBy(col("qid")).orderBy(col("cell_rank"))
      .rowsBetween(Window.unboundedPreceding, -1)
    graft.operators.IvfIndex.probeRanked(
        e.filter(col("vec_id") < 20), "vec_id", "embedding", centroids, ivfK)
      .join(broadcast(sizes), Seq("cell"))
      .crossJoin(broadcast(total))
      .withColumn("cum_before",
        coalesce(sum(col("cnt")).over(wCum), lit(0L)))
      .filter(col("cum_before") * 4 < col("total")) // probe until 25% covered
  }

  /** Per-query probe depth, computed from the PROBE frame (not from the
    * candidate frame — a query whose taken cells hold no other vectors
    * still has a depth, matching the oracle's `anp` CTE). */
  private def adaptiveNp(probed: DataFrame): DataFrame =
    probed.groupBy(col("qid")).agg(count(lit(1)).as("nprobe_used"))

  /** Per query the top-3 candidates from the coverage-bound probe set,
    * with the probe depth used. */
  private def adaptiveTop3(s: SparkSession, dir: String): DataFrame = {
    val probed = adaptiveProbed(s, dir)
    val np = adaptiveNp(probed)
    val (_, assigned) = trainedIvf(s, dir)
    val c = assigned.select(col("vec_id").as("cid"),
      col("embedding").as("ce"), col("cell"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    probed.select(col("qid"), col("qe"), col("cell"))
      .join(c, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), expr(cosineExpr("qe", "ce")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .join(broadcast(np), Seq("qid"))
  }

  private val s31: Q = (s, dir) =>
    adaptiveTop3(s, dir)
      .select(col("qid"), col("nprobe_used"), col("rank"), col("cid"),
        round(col("cos"), 6).as("cosine"))
      .psort(col("qid"), col("rank"))

  /** Shared adaptive-probe CTE fragment (the oracle twin of
    * [[adaptiveTop3]]) — one definition serves s31Sql and s32Sql. */
  private lazy val adaptiveCtes: String =
    s"""aprobe AS (
       |  SELECT qid, qe, cell, cell_rank FROM (
       |    SELECT e.vec_id AS qid, e.v AS qe, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${dist2Sql("e.v", "c.vec")}, c.cell) AS cell_rank
       |    FROM e CROSS JOIN $ivfFinalCentsCte c WHERE e.vec_id < 20)),
       |asizes AS (SELECT cell, COUNT(*) AS cnt FROM assignF GROUP BY cell),
       |atot AS (SELECT COUNT(*) AS total FROM assignF),
       |ataken AS (
       |  SELECT qid, qe, cell FROM (
       |    SELECT p.qid, p.qe, p.cell,
       |      COALESCE(SUM(s.cnt) OVER (PARTITION BY p.qid ORDER BY p.cell_rank
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |    FROM aprobe p JOIN asizes s USING (cell)) t, atot
       |  WHERE t.cum_before * 4 < atot.total),
       |anp AS (SELECT qid, COUNT(*) AS nprobe_used FROM ataken GROUP BY qid),
       |acand AS (
       |  SELECT t.qid, a.cid, ${cosineSql("t.qe", "a.ce")} AS cos
       |  FROM ataken t JOIN assignF a ON t.cell = a.cell AND t.qid <> a.cid),
       |aranked AS (
       |  SELECT qid, cid, cos,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
       |  FROM acand)""".stripMargin

  private lazy val s31Sql: String =
    s"""$ivfCtePrefix,
       |$adaptiveCtes
       |SELECT r.qid, n.nprobe_used, r.rank, r.cid, ROUND(r.cos, 6) AS cosine
       |FROM aranked r JOIN anp n USING (qid) WHERE r.rank <= 3
       |ORDER BY qid, rank""".stripMargin

  // ---- s32: recall audit of the adaptive serve (vs exact truth) -----------
  /** s32: the accuracy certificate for s31 — per-query recall@3 of the
    * adaptive-nprobe serve against the exact brute-force truth, with the
    * probe depth each query chose. This closes the loop the fixed-nprobe
    * family already has (s05/s06 for LSH/IVF): the coverage-bound
    * early-termination policy is only shippable with a recall curve next
    * to it, and auditing the SAME [[adaptiveTop3]] frame the serve uses
    * means the audited path cannot drift from the served path.
    *
    * Scale shape: the truth pass broadcasts the bounded query set against
    * the corpus (the s05 shape); the serve side re-reads the shared
    * adaptive frame; the audit is a per-query join + count at O(queries)
    * rows. */
  private val s32: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val brute = q.hint("broadcast").crossJoin(c)
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), expr(cosineExpr("qe", "ce")).as("cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .select(col("qid"), col("cid"))
    val approx = adaptiveTop3(s, dir)
      .select(col("qid").as("aqid"), col("cid").as("acid"))
    // probe-frame depth (same derivation as the oracle's anp CTE): a query
    // whose taken cells yield zero candidates still reports its depth
    val np = adaptiveNp(adaptiveProbed(s, dir))
      .select(col("qid").as("aqid"), col("nprobe_used"))
    brute
      .join(approx, col("qid") === col("aqid") && col("cid") === col("acid"),
        "left")
      .groupBy(col("qid"))
      .agg(count(col("acid")).as("hits"),
        (count(col("acid")) / lit(3.0)).as("recall"))
      .join(broadcast(np), col("qid") === col("aqid"))
      .select(col("qid"), col("nprobe_used"), col("hits"), col("recall"))
      .psort(col("qid"))
  }

  private lazy val s32Sql: String =
    s"""$ivfCtePrefix,
       |$bruteTruthCtes,
       |$adaptiveCtes,
       |approx AS (SELECT qid, cid FROM aranked WHERE rank <= 3)
       |SELECT b.qid, MIN(n.nprobe_used) AS nprobe_used,
       |  COUNT(h.cid) AS hits, COUNT(h.cid) / 3.0 AS recall
       |FROM brute b
       |LEFT JOIN approx h ON b.qid = h.qid AND b.cid = h.cid
       |JOIN anp n ON b.qid = n.qid
       |GROUP BY b.qid ORDER BY b.qid""".stripMargin

  // ---- s33: embedding ingest-health audit (planted-corruption gate) -------
  /** s33: the validation stage every embedding pipeline runs BEFORE index
    * build — per-label vector-health taxonomy: wrong dimension, non-finite
    * elements (NaN), zero norm, out-of-range norm, and the clean
    * remainder with its norm envelope. The corpus is unit-norm by
    * construction, so the gate follows the m19 planted-corruption
    * precedent: four deterministic bad vectors per label (NaN-filled,
    * all-zero, 3-dim, all-2.0) are planted on the wire and the audit must
    * recover EXACTLY that taxonomy — the oracle replays the planting in
    * closed form, so a mis-classifying audit (or a norm pipeline that
    * silently propagates NaN) breaks the hash.
    *
    * Scale shape: planting is O(labels); the audit is one map-only
    * classify pass (native graft_dot norm) + one per-label aggregation —
    * the flattest possible corpus shape, same as the serving-side
    * ingest gate (s25) it complements. */
  private val s33: Q = (s, dir) => {
    graft.functions.GraftFunctions.register(s)
    val e = t(s, dir, "embeddings")
    val planted = e.select(col("label")).distinct()
      .select(col("label"), explode(expr(
        """array(
          | named_struct('off', 1L, 'emb', array_repeat(cast('NaN' as float), 64)),
          | named_struct('off', 2L, 'emb', array_repeat(cast(0.0 as float), 64)),
          | named_struct('off', 3L, 'emb', array_repeat(cast(0.5 as float), 3)),
          | named_struct('off', 4L, 'emb', array_repeat(cast(2.0 as float), 64)))""".stripMargin)).as("p"))
      .select((lit(900000L) + col("label") * 10 + col("p.off")).as("vec_id"),
        col("p.emb").as("embedding"), col("label"))
    val v = e.select(col("vec_id"), col("embedding"), col("label"))
      .unionAll(planted)
      .withColumn("bad_dim", size(col("embedding")) =!= 64)
      .withColumn("nonfinite",
        expr("exists(embedding, x -> isnan(cast(x as double)))"))
      .withColumn("norm", when(!col("bad_dim") && !col("nonfinite"),
        expr("sqrt(graft_dot(embedding, embedding))")))
      .withColumn("zero_norm", col("norm") === 0.0)
      .withColumn("high_norm", col("norm") > 2.0)
      .withColumn("clean", !col("bad_dim") && !col("nonfinite") &&
        !col("zero_norm") && !col("high_norm"))
    v.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("bad_dim"), 1L).otherwise(0L)).as("n_bad_dim"),
        sum(when(col("nonfinite"), 1L).otherwise(0L)).as("n_nonfinite"),
        sum(when(col("zero_norm"), 1L).otherwise(0L)).as("n_zero_norm"),
        sum(when(col("high_norm"), 1L).otherwise(0L)).as("n_high_norm"),
        sum(when(col("clean"), 1L).otherwise(0L)).as("n_clean"),
        round(min(when(col("clean"), col("norm"))), 6).as("min_norm"),
        round(max(when(col("clean"), col("norm"))), 6).as("max_norm"))
      .psort(col("label"))
  }

  private val s33Sql = {
    val norm = "SQRT(LIST_REDUCE(LIST_PREPEND(0.0::DOUBLE, " +
      "[x::DOUBLE * x::DOUBLE FOR x IN embedding]), (acc, v) -> acc + v))"
    s"""WITH planted AS (
       |  SELECT 900000 + label * 10 + p.off AS vec_id, p.emb AS embedding,
       |         label
       |  FROM (SELECT DISTINCT label FROM embeddings),
       |    (VALUES
       |      (1, ['NaN'::FLOAT FOR i IN RANGE(64)]),
       |      (2, [0.0::FLOAT FOR i IN RANGE(64)]),
       |      (3, [0.5::FLOAT FOR i IN RANGE(3)]),
       |      (4, [2.0::FLOAT FOR i IN RANGE(64)])) p(off, emb)),
       |u AS (
       |  SELECT vec_id, embedding, label FROM embeddings
       |  UNION ALL SELECT vec_id, embedding, label FROM planted),
       |cls AS (
       |  SELECT label,
       |    LEN(embedding) <> 64 AS bad_dim,
       |    LEN(LIST_FILTER(embedding, x -> ISNAN(x::DOUBLE))) > 0
       |      AS nonfinite,
       |    CASE WHEN LEN(embedding) = 64 AND
       |        LEN(LIST_FILTER(embedding, x -> ISNAN(x::DOUBLE))) = 0
       |      THEN $norm END AS norm
       |  FROM u),
       |f AS (
       |  SELECT label, bad_dim, nonfinite,
       |    COALESCE(norm = 0.0, FALSE) AS zero_norm,
       |    COALESCE(norm > 2.0, FALSE) AS high_norm,
       |    norm,
       |    (NOT bad_dim AND NOT nonfinite AND NOT COALESCE(norm = 0.0, FALSE)
       |      AND NOT COALESCE(norm > 2.0, FALSE)) AS clean
       |  FROM cls)
       |SELECT label, COUNT(*) AS n_vecs,
       |  CAST(SUM(CASE WHEN bad_dim THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_bad_dim,
       |  CAST(SUM(CASE WHEN nonfinite THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_nonfinite,
       |  CAST(SUM(CASE WHEN zero_norm THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_zero_norm,
       |  CAST(SUM(CASE WHEN high_norm THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_high_norm,
       |  CAST(SUM(CASE WHEN clean THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
       |  ROUND(MIN(CASE WHEN clean THEN norm END), 6) AS min_norm,
       |  ROUND(MAX(CASE WHEN clean THEN norm END), 6) AS max_norm
       |FROM f GROUP BY label ORDER BY label""".stripMargin
  }

  // ---- s34: sharded index + scatter-gather serve --------------------------
  /** Per-shard trained IVF (memoized per (dir, parity) like [[trainedIvf]]):
    * the index a 1000-executor deployment actually runs is MANY shard-local
    * indexes, each trained on its own slice. */
  private def trainedIvfShard(s: SparkSession, dir: String, parity: Int) =
    trainedOn(s"$dir#shard$parity",
      t(s, dir, "embeddings").filter(col("vec_id") % 2 === parity))

  /** s34: the distributed ANN serving ARCHITECTURE, not just an index —
    * the corpus is split into two shards (vec_id parity), each shard
    * trains its OWN IVF quantizer on its own slice and serves shard-local
    * top-3 (nprobe=2), and the router merges the shard answers into the
    * global top-3 (scatter-gather). This is how every production vector
    * store scales past one machine: indexes are shard-local (trainable,
    * rebuildable, and servable independently), only O(queries x shards x
    * k) candidate rows cross the network for the gather. The output keeps
    * the serving shard per hit — the routing table a deployment debugs
    * with.
    *
    * Scale shape: each shard's serve is the s04 cell equi-join against
    * its own persisted assignment (probes against a broadcast O(k x dim)
    * centroid literal); the gather is a union of two 3-rows-per-query
    * frames + one query-partitioned window. Nothing global ever shuffles;
    * shards never see each other's vectors. The oracle replays BOTH
    * shard trainers (suffixed CTE replicas of the shared fixed-point
    * spelling) and the merge. */
  private val s34: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val queries = e.filter(col("vec_id") < 20)
    val perShard = Seq(0, 1).map { p =>
      val (cents, assigned) = trainedIvfShard(s, dir, p)
      val probes = graft.operators.IvfIndex
        .probeRanked(queries, "vec_id", "embedding", cents, 2)
        .select(col("qid"), col("qe"), col("cell"))
      val c = assigned.select(col("vec_id").as("cid"),
        col("embedding").as("ce"), col("cell"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("cid"))
      probes.join(c, Seq("cell"))
        .filter(col("qid") =!= col("cid"))
        .select(col("qid"), col("cid"), expr(cosineExpr("qe", "ce")).as("cos"))
        .withColumn("srank", row_number().over(w))
        .filter(col("srank") <= 3)
        .select(col("qid"), col("cid"), col("cos"), lit(p.toLong).as("shard"))
    }
    val wg = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    perShard.reduce(_ unionAll _)
      .withColumn("rank", row_number().over(wg))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("rank"), col("cid"), col("shard"),
        round(col("cos"), 6).as("cosine"))
      .psort(col("qid"), col("rank"))
  }

  /** Suffixed replica of the shared fixed-point trainer CTEs, filtered to
    * one shard — same seeding, same Lloyd spelling, same tie-breaks as
    * [[ivfCtePrefix]] (built from the same dist2Sql/md5iSql blocks and the
    * same ivfK/ivfIters/ivfDim constants). Ends with `top3$tag`: the
    * shard-local top-3 per query at nprobe=2. */
  private def shardCtes(tag: String, parity: Int): String = {
    def iter(n: Int): String = {
      val prev = s"cents${n - 1}$tag"
      s"""assign$n$tag AS (
         |  SELECT vec_id, v, cell FROM (
         |    SELECT e.vec_id, e.v, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dist2Sql("e.v", "c.vec")}, c.cell) AS rn
         |    FROM e$tag e CROSS JOIN $prev c) WHERE rn = 1),
         |upd$n$tag AS (
         |  SELECT cell, i,
         |    CAST(SUM(CAST(FLOOR(v[i]::DOUBLE * 1048576.0) AS BIGINT)) AS DOUBLE)
         |      / COUNT(*) / 1048576.0 AS comp
         |  FROM assign$n$tag, range(1, ${ivfDim + 1}) r(i) GROUP BY cell, i),
         |cents$n$tag AS (
         |  SELECT p.cell, COALESCE(u.vec, p.vec) AS vec
         |  FROM $prev p LEFT JOIN
         |    (SELECT cell, LIST(comp ORDER BY i) AS vec FROM upd$n$tag GROUP BY cell) u
         |    ON p.cell = u.cell)""".stripMargin
    }
    val fin = s"cents$ivfIters$tag"
    s"""e$tag AS (SELECT vec_id, embedding AS v FROM embeddings
       |  WHERE vec_id % 2 = $parity),
       |cents0$tag AS (
       |  SELECT cell, vec FROM (
       |    SELECT CAST(ROW_NUMBER() OVER (
       |        ORDER BY ${md5iSql("CAST(vec_id AS VARCHAR)")}, CAST(vec_id AS VARCHAR)
       |      ) AS INTEGER) - 1 AS cell,
       |      [x::DOUBLE FOR x IN embedding] AS vec
       |    FROM embeddings WHERE vec_id % 2 = $parity) WHERE cell < $ivfK),
       |${(1 to ivfIters).map(iter).mkString(",\n")},
       |probe$tag AS (
       |  SELECT qid, qe, cell FROM (
       |    SELECT q.qid, q.qe, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY q.qid
       |        ORDER BY ${dist2Sql("q.qe", "c.vec")}, c.cell) AS cell_rank
       |    FROM qv q CROSS JOIN $fin c) WHERE cell_rank <= 2),
       |assignF$tag AS (
       |  SELECT vec_id AS cid, v AS ce, cell FROM (
       |    SELECT e.vec_id, e.v, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${dist2Sql("e.v", "c.vec")}, c.cell) AS rn
       |    FROM e$tag e CROSS JOIN $fin c) WHERE rn = 1),
       |top3$tag AS (
       |  SELECT qid, cid, cos, CAST($parity AS BIGINT) AS shard FROM (
       |    SELECT s.qid, s.cid, s.cos,
       |      ROW_NUMBER() OVER (PARTITION BY s.qid
       |        ORDER BY s.cos DESC, s.cid) AS srank
       |    FROM (
       |      SELECT p.qid, a.cid, ${cosineSql("p.qe", "a.ce")} AS cos
       |      FROM probe$tag p JOIN assignF$tag a
       |        ON p.cell = a.cell AND p.qid <> a.cid) s) WHERE srank <= 3)""".stripMargin
  }

  private lazy val s34Sql: String =
    s"""WITH qv AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
       |  WHERE vec_id < 20),
       |${shardCtes("a", 0)},
       |${shardCtes("b", 1)},
       |merged AS (
       |  SELECT * FROM top3a UNION ALL SELECT * FROM top3b),
       |g AS (
       |  SELECT qid, cid, shard, cos,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
       |  FROM merged)
       |SELECT qid, rank, cid, shard, ROUND(cos, 6) AS cosine
       |FROM g WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  // ---- s35: index compaction + retrain-trigger audit ----------------------
  /** s35: the amortized background path s21's scaladoc promises — serving
    * carries tombstones, COMPACTION physically drops them. The job rewrites
    * the persisted assignment without the tombstoned rows (vec_id % 9 == 4;
    * cell assignment preserved — compaction never retrains) and emits the
    * maintenance report an operator pages on: per cell the before/after
    * population, the deleted count/permille, and the retrain trigger (a
    * cell still holding more than 2x the post-compaction mean load —
    * deletes concentrate, residual skew means the quantizer has drifted
    * from the live distribution).
    *
    * Scale shape: the tombstone list broadcasts onto the persisted
    * assignment (left anti, no shuffle); both population frames are
    * group-by-cell aggs emitting k rows; the total is a 1-row broadcast.
    * Compaction cost is one linear rewrite regardless of delete count. */
  private val s35: Q = (s, dir) => {
    val (_, assigned) = trainedIvf(s, dir)
    val tomb = t(s, dir, "embeddings").filter(col("vec_id") % 9 === 4)
      .select(col("vec_id").as("del_id"))
    val compacted = assigned
      .join(broadcast(tomb), col("vec_id") === col("del_id"), "left_anti")
    val before = assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_before"))
    val after = compacted.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_after"))
    before.join(after, Seq("cell"), "left")
      .select(col("cell"), col("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"))
      .crossJoin(broadcast(
        compacted.agg(count(lit(1)).as("total_after"))))
      .select(col("cell"), col("n_before"), col("n_after"),
        (col("n_before") - col("n_after")).as("n_deleted"),
        expr("(n_before - n_after) * 1000 div n_before").as("del_permille"),
        (col("n_after") * ivfK > col("total_after") * 2L).as("retrain"))
      .psort(col("cell"))
  }

  private[queries] lazy val s35Sql: String =
    s"""$ivfCtePrefix,
       |before AS (
       |  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_before
       |  FROM assignF GROUP BY cell),
       |after AS (
       |  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_after FROM assignF
       |  WHERE cid NOT IN (SELECT vec_id FROM embeddings WHERE vec_id % 9 = 4)
       |  GROUP BY cell),
       |tot AS (SELECT CAST(SUM(n_after) AS BIGINT) AS total FROM after)
       |SELECT b.cell, b.n_before,
       |  CAST(COALESCE(a.n_after, 0) AS BIGINT) AS n_after,
       |  b.n_before - CAST(COALESCE(a.n_after, 0) AS BIGINT) AS n_deleted,
       |  (b.n_before - CAST(COALESCE(a.n_after, 0) AS BIGINT)) * 1000
       |    // b.n_before AS del_permille,
       |  CAST(COALESCE(a.n_after, 0) AS BIGINT) * $ivfK > t.total * 2
       |    AS retrain
       |FROM before b LEFT JOIN after a ON b.cell = a.cell, tot t
       |ORDER BY b.cell""".stripMargin

  // ---- s36: quantizer retrain migration audit ------------------------------
  /** s36: the step AFTER s35's retrain trigger fires — retrain the coarse
    * quantizer on the post-compaction corpus (same deterministic seeding,
    * same fixed-point Lloyd loop, same k/iters) and audit the MIGRATION a
    * serving rollover would execute: per old cell, how many survivors stay
    * under the same cell id vs move, and the dominant destination cell.
    * Routing tables, cell-local caches, and shard placement are keyed by
    * cell id, so the stay/move split IS the rollover's invalidation cost;
    * a migration heavily concentrated into one destination also confirms
    * the drift s35 flagged. Both trainings are bit-reproducible
    * (fixed-point integer Lloyd sums), so the full two-model audit is
    * replayed exactly by the SQL oracle — a second unrolled training over
    * the survivor corpus.
    *
    * Scale shape: tombstones broadcast-anti onto the persisted old
    * assignment; the new training is the standard broadcast-assign /
    * one-shuffle-mean Lloyd loop; old-vs-new is ONE vec_id equi-join
    * (co-partitionable at 100 TB); everything after is k^2-bounded. */
  private val s36: Q = (s, dir) => {
    val (_, assignedOld) = trainedIvf(s, dir)
    val survivors = t(s, dir, "embeddings").filter(col("vec_id") % 9 =!= 4)
    val (_, assignedNew) = trainedOn(dir + "#s36retrain", survivors)
    val mig = assignedOld.filter(col("vec_id") % 9 =!= 4)
      .select(col("vec_id"), col("cell").as("old_cell"))
      .join(assignedNew.select(col("vec_id"), col("cell").as("new_cell")),
        Seq("vec_id"))
    val per = mig.groupBy(col("old_cell"), col("new_cell"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("old_cell"))
      .orderBy(col("n").desc, col("new_cell"))
    val dest = per.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("old_cell"), col("new_cell").as("top_dest_cell"),
        col("n").as("top_dest_n"))
    mig.groupBy(col("old_cell")).agg(
        count(lit(1)).as("n_surv"),
        sum(when(col("old_cell") === col("new_cell"), 1L).otherwise(0L))
          .as("n_stay"))
      .join(dest, Seq("old_cell"))
      .select(col("old_cell"), col("n_surv"), col("n_stay"),
        (col("n_surv") - col("n_stay")).as("n_moved"),
        expr("n_stay * 1000 div n_surv").as("stay_permille"),
        col("top_dest_cell"), col("top_dest_n"))
      .psort(col("old_cell"))
  }

  /** Suffixed replica of the trainer CTEs over an arbitrary survivor
    * predicate (same seeding/Lloyd/tie-break blocks as [[ivfCtePrefix]] and
    * [[shardCtes]]); ends with `assignF$tag` (cid, cell). */
  private def retrainCtes(tag: String, pred: String): String = {
    def iter(n: Int): String = {
      val prev = s"cents${n - 1}$tag"
      s"""assign$n$tag AS (
         |  SELECT vec_id, v, cell FROM (
         |    SELECT e.vec_id, e.v, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dist2Sql("e.v", "c.vec")}, c.cell) AS rn
         |    FROM e$tag e CROSS JOIN $prev c) WHERE rn = 1),
         |upd$n$tag AS (
         |  SELECT cell, i,
         |    CAST(SUM(CAST(FLOOR(v[i]::DOUBLE * 1048576.0) AS BIGINT)) AS DOUBLE)
         |      / COUNT(*) / 1048576.0 AS comp
         |  FROM assign$n$tag, range(1, ${ivfDim + 1}) r(i) GROUP BY cell, i),
         |cents$n$tag AS (
         |  SELECT p.cell, COALESCE(u.vec, p.vec) AS vec
         |  FROM $prev p LEFT JOIN
         |    (SELECT cell, LIST(comp ORDER BY i) AS vec FROM upd$n$tag GROUP BY cell) u
         |    ON p.cell = u.cell)""".stripMargin
    }
    val fin = s"cents$ivfIters$tag"
    s"""e$tag AS (SELECT vec_id, embedding AS v FROM embeddings
       |  WHERE $pred),
       |cents0$tag AS (
       |  SELECT cell, vec FROM (
       |    SELECT CAST(ROW_NUMBER() OVER (
       |        ORDER BY ${md5iSql("CAST(vec_id AS VARCHAR)")}, CAST(vec_id AS VARCHAR)
       |      ) AS INTEGER) - 1 AS cell,
       |      [x::DOUBLE FOR x IN embedding] AS vec
       |    FROM embeddings WHERE $pred) WHERE cell < $ivfK),
       |${(1 to ivfIters).map(iter).mkString(",\n")},
       |assignF$tag AS (
       |  SELECT vec_id AS cid, cell FROM (
       |    SELECT e.vec_id, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${dist2Sql("e.v", "c.vec")}, c.cell) AS rn
       |    FROM e$tag e CROSS JOIN $fin c) WHERE rn = 1)""".stripMargin
  }

  private[queries] lazy val s36Sql: String =
    s"""$ivfCtePrefix,
       |${retrainCtes("n", "vec_id % 9 <> 4")},
       |mig AS (
       |  SELECT o.cell AS old_cell, n.cell AS new_cell
       |  FROM assignF o JOIN assignFn n ON o.cid = n.cid),
       |per AS (
       |  SELECT old_cell, new_cell, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM mig GROUP BY 1, 2),
       |dest AS (
       |  SELECT old_cell, new_cell AS top_dest_cell, n AS top_dest_n FROM (
       |    SELECT old_cell, new_cell, n,
       |      ROW_NUMBER() OVER (PARTITION BY old_cell
       |        ORDER BY n DESC, new_cell) AS rn
       |    FROM per) WHERE rn = 1),
       |st AS (
       |  SELECT old_cell, CAST(COUNT(*) AS BIGINT) AS n_surv,
       |    CAST(SUM(CASE WHEN old_cell = new_cell THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_stay
       |  FROM mig GROUP BY old_cell)
       |SELECT s.old_cell, s.n_surv, s.n_stay,
       |  s.n_surv - s.n_stay AS n_moved,
       |  CAST(s.n_stay * 1000 // s.n_surv AS BIGINT) AS stay_permille,
       |  d.top_dest_cell, d.top_dest_n
       |FROM st s JOIN dest d USING (old_cell) ORDER BY s.old_cell""".stripMargin

  // ---- s37: serving hot-cell load audit (workload-side skew) ---------------
  /** s37: the SERVING-side twin of s20's index-side cell stats — given the
    * live query workload, which cells does nprobe routing actually hit,
    * and what scan cost does each cell absorb? Per cell: the probe count
    * over the workload (vec_id < 50 at nprobe=3), the cell population,
    * the estimated scan cost (probes x population — the rows a cell's
    * serving shard reads for this workload), its permille share of total
    * scan, and the hot flag (probe share > 2x uniform). A hot populous
    * cell is the shard you replicate first; this audit is the input to
    * that placement decision.
    *
    * Scale shape: probes are a tiny-centroid broadcast + posexplode over
    * the workload (map-only); both aggregations emit k rows; the total is
    * a 1-row broadcast. Nothing here grows faster than the workload. */
  private val s37: Q = (s, dir) => {
    val (centroids, assigned) = trainedIvf(s, dir)
    val qs = t(s, dir, "embeddings").filter(col("vec_id") < 50)
    val probes = graft.operators.IvfIndex
      .probeRanked(qs, "vec_id", "embedding", centroids, maxProbe = 3)
    val perCell = probes.groupBy(col("cell")).agg(count(lit(1)).as("n_probes"))
    val pop = assigned.groupBy(col("cell")).agg(count(lit(1)).as("population"))
    val j = pop.join(perCell, Seq("cell"), "left")
      .select(col("cell"), col("population"),
        coalesce(col("n_probes"), lit(0L)).as("n_probes"))
      .withColumn("est_scan", col("n_probes") * col("population"))
    j.crossJoin(broadcast(j.agg(
        sum(col("est_scan")).as("total_scan"),
        sum(col("n_probes")).as("total_probes"))))
      .select(col("cell"), col("population"), col("n_probes"),
        col("est_scan"),
        expr("est_scan * 1000 div total_scan").as("load_permille"),
        (col("n_probes") * ivfK > col("total_probes") * 2L).as("hot"))
      .psort(col("cell"))
  }

  private lazy val s37Sql: String =
    s"""$ivfCtePrefix,
       |probe50 AS (
       |  SELECT qid, cell FROM (
       |    SELECT e.vec_id AS qid, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${dist2Sql("e.v", "c.vec")}, c.cell) AS cell_rank
       |    FROM e CROSS JOIN $ivfFinalCentsCte c
       |    WHERE e.vec_id < 50) WHERE cell_rank <= 3),
       |pc AS (
       |  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_probes
       |  FROM probe50 GROUP BY cell),
       |pop AS (
       |  SELECT cell, CAST(COUNT(*) AS BIGINT) AS population
       |  FROM assignF GROUP BY cell),
       |j AS (
       |  SELECT p.cell, p.population,
       |    CAST(COALESCE(c.n_probes, 0) AS BIGINT) AS n_probes,
       |    CAST(COALESCE(c.n_probes, 0) * p.population AS BIGINT) AS est_scan
       |  FROM pop p LEFT JOIN pc c USING (cell)),
       |tot AS (
       |  SELECT CAST(SUM(est_scan) AS BIGINT) AS total_scan,
       |    CAST(SUM(n_probes) AS BIGINT) AS total_probes FROM j)
       |SELECT j.cell, j.population, j.n_probes, j.est_scan,
       |  CAST(j.est_scan * 1000 // t.total_scan AS BIGINT) AS load_permille,
       |  j.n_probes * $ivfK > t.total_probes * 2 AS hot
       |FROM j, tot t ORDER BY j.cell""".stripMargin

  // ---- s38: per-cell quantization distortion audit --------------------------
  /** s38: the k-means quality metric that actually drives k selection and
    * retraining — per cell the quantization distortion (squared L2 to the
    * centroid): population, the worst resident (max d2, order-independent),
    * the mean distortion, and each cell's permille share of total inertia
    * with a concentration flag (share > 2x uniform = the cell whose radius
    * makes nprobe recall collapse). The distortion SUM uses the trainer's
    * own fixed-point discipline (floor(d2 * 2^20) summed as integers —
    * associative, partition-invariant), so the aggregate is bit-identical
    * on any cluster layout and the oracle replays it exactly; mean is one
    * double division at the end.
    *
    * Scale shape: per-row d2 against a broadcast k-row centroid frame
    * (map-only native graft_l2), one group-by-cell agg emitting k rows,
    * 1-row total broadcast. */
  private val s38: Q = (s, dir) => {
    import s.implicits._
    val (centroids, assigned) = trainedIvf(s, dir)
    val cents = centroids.toSeq.map(c => (c.cell, c.vec.toSeq))
      .toDF("cell", "cvec")
    val d2 = assigned.join(broadcast(cents), Seq("cell"))
      .withColumn("d2", call_function("graft_l2", col("embedding"),
        col("cvec")))
    val per = d2.groupBy(col("cell")).agg(
      count(lit(1)).as("n_vectors"),
      max(col("d2")).as("maxd"),
      sum(floor(col("d2") * lit(1048576.0)).cast("long")).as("sum_fp"))
    per.crossJoin(broadcast(per.agg(sum(col("sum_fp")).as("total_fp"))))
      .select(col("cell"), col("n_vectors"),
        round(col("maxd"), 6).as("max_d2"),
        round(col("sum_fp").cast("double") / col("n_vectors") /
          lit(1048576.0), 6).as("mean_d2"),
        expr("sum_fp * 1000 div total_fp").as("distortion_permille"),
        (col("sum_fp") * ivfK > col("total_fp") * 2L).as("hot"))
      .psort(col("cell"))
  }

  private lazy val s38Sql: String =
    s"""$ivfCtePrefix,
       |d2 AS (
       |  SELECT a.cell, ${dist2Sql("a.ce", "c.vec")} AS d2
       |  FROM assignF a JOIN $ivfFinalCentsCte c ON a.cell = c.cell),
       |per AS (
       |  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vectors,
       |    MAX(d2) AS maxd,
       |    CAST(SUM(CAST(FLOOR(d2 * 1048576.0) AS BIGINT)) AS BIGINT)
       |      AS sum_fp
       |  FROM d2 GROUP BY cell),
       |tot AS (SELECT CAST(SUM(sum_fp) AS BIGINT) AS total_fp FROM per)
       |SELECT p.cell, p.n_vectors,
       |  ROUND(p.maxd, 6) AS max_d2,
       |  ROUND(CAST(p.sum_fp AS DOUBLE) / p.n_vectors / 1048576.0, 6)
       |    AS mean_d2,
       |  CAST(p.sum_fp * 1000 // t.total_fp AS BIGINT)
       |    AS distortion_permille,
       |  p.sum_fp * $ivfK > t.total_fp * 2 AS hot
       |FROM per p, tot t ORDER BY p.cell""".stripMargin

  // ---- s39: embedding-coverage integrity audit ------------------------------
  /** s39: the referential-integrity audit a text+embedding corpus needs
    * before any retrieval index builds — which documents lack a vector
    * (failed embedding jobs: vec_id % 41 == 13 modeled as lost), and
    * which vectors are orphans (their document was culled: doc_id % 37 ==
    * 2 modeled as removed)? Per source: doc count, embedded count,
    * coverage permille, and orphan count. An index built over orphans
    * serves deleted content; a corpus trained below full coverage
    * under-weights whatever the embedding job dropped — both are numbers
    * an operator gates on.
    *
    * Scale shape: ONE doc_id/vec_id full-outer equi-join
    * (co-partitionable), one per-source agg; orphans without a source
    * roll into the dedicated '(orphan)' row. */
  private val s39: Q = (s, dir) => {
    val docs = t(s, dir, "documents").filter(col("doc_id") % 37 =!= 2)
      .select(col("doc_id"), col("source"))
    val vecs = t(s, dir, "embeddings").filter(col("vec_id") % 41 =!= 13)
      .select(col("vec_id").as("doc_id"), lit(1).as("has_vec"))
    docs.join(vecs, Seq("doc_id"), "full_outer")
      .select(coalesce(col("source"), lit("(orphan)")).as("source"),
        when(col("source").isNotNull, 1L).otherwise(0L).as("is_doc"),
        coalesce(col("has_vec").cast("long"), lit(0L)).as("is_vec"))
      .groupBy(col("source")).agg(
        sum(col("is_doc")).as("n_docs"),
        sum(when(col("is_doc") === 1L && col("is_vec") === 1L, 1L)
          .otherwise(0L)).as("n_embedded"),
        sum(when(col("is_doc") === 0L, 1L).otherwise(0L)).as("n_orphans"))
      .select(col("source"), col("n_docs"), col("n_embedded"),
        when(col("n_docs") > 0L, expr("n_embedded * 1000 div n_docs"))
          .otherwise(lit(0L)).as("coverage_permille"),
        col("n_orphans"))
      .psort(col("source"))
  }

  private val s39Sql =
    """WITH d AS (
      |  SELECT doc_id, source FROM documents WHERE doc_id % 37 <> 2),
      |v AS (
      |  SELECT vec_id AS doc_id, 1 AS has_vec FROM embeddings
      |  WHERE vec_id % 41 <> 13),
      |j AS (
      |  SELECT COALESCE(d.source, '(orphan)') AS source,
      |    CASE WHEN d.source IS NOT NULL THEN 1 ELSE 0 END AS is_doc,
      |    COALESCE(v.has_vec, 0) AS is_vec
      |  FROM d FULL OUTER JOIN v USING (doc_id))
      |SELECT source, CAST(SUM(is_doc) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN is_doc = 1 AND is_vec = 1 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_embedded,
      |  CAST(CASE WHEN SUM(is_doc) > 0
      |    THEN SUM(CASE WHEN is_doc = 1 AND is_vec = 1 THEN 1 ELSE 0 END)
      |      * 1000 // SUM(is_doc) ELSE 0 END AS BIGINT)
      |    AS coverage_permille,
      |  CAST(SUM(CASE WHEN is_doc = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_orphans
      |FROM j GROUP BY source ORDER BY source""".stripMargin

  // ---- s40: assignment-margin stability audit --------------------------------
  /** s40: the churn predictor for s36's retrain migration — per vector the
    * MARGIN between its best and second-best cell (floor((d2-d1)*1000/d2),
    * one double expression evaluated identically in both engines before
    * the floor); a low-margin vector sits on a cell boundary and flips
    * assignment under any centroid drift. Per cell: population, the
    * low-margin count (< 100 permille), its permille, and the tightest
    * margin — the cells to watch before scheduling a retrain.
    *
    * Scale shape: the k-row centroid frame broadcasts; scoring is one
    * k-multiplied map-side expansion (8 rows per vector, no shuffle until
    * the per-vector rank), one vec_id window, one k-row agg. */
  private val s40: Q = (s, dir) => {
    import s.implicits._
    val (centroids, _) = trainedIvf(s, dir)
    val cents = centroids.toSeq.map(c => (c.cell, c.vec.toSeq))
      .toDF("ccell", "cvec")
    val scored = t(s, dir, "embeddings")
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("ccell"),
        call_function("graft_l2", col("embedding"), col("cvec")).as("d"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("d"), col("ccell"))
    val top2 = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .groupBy(col("vec_id")).agg(
        max(when(col("rn") === 1, col("ccell"))).as("cell"),
        max(when(col("rn") === 1, col("d"))).as("d1"),
        max(when(col("rn") === 2, col("d"))).as("d2"))
      .withColumn("margin_permille",
        floor((col("d2") - col("d1")) * 1000.0 / col("d2")).cast("long"))
    top2.groupBy(col("cell")).agg(
        count(lit(1)).as("n_vectors"),
        sum(when(col("margin_permille") < 100L, 1L).otherwise(0L))
          .as("n_unstable"),
        min(col("margin_permille")).as("min_margin_permille"))
      .select(col("cell"), col("n_vectors"), col("n_unstable"),
        expr("n_unstable * 1000 div n_vectors").as("unstable_permille"),
        col("min_margin_permille"))
      .psort(col("cell"))
  }

  private lazy val s40Sql: String =
    s"""$ivfCtePrefix,
       |sc AS (
       |  SELECT e.vec_id, c.cell, ${dist2Sql("e.v", "c.vec")} AS d,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${dist2Sql("e.v", "c.vec")}, c.cell) AS rn
       |  FROM e CROSS JOIN $ivfFinalCentsCte c),
       |top2 AS (
       |  SELECT vec_id,
       |    MAX(CASE WHEN rn = 1 THEN cell END) AS cell,
       |    MAX(CASE WHEN rn = 1 THEN d END) AS d1,
       |    MAX(CASE WHEN rn = 2 THEN d END) AS d2
       |  FROM sc WHERE rn <= 2 GROUP BY vec_id),
       |m AS (
       |  SELECT cell,
       |    CAST(FLOOR((d2 - d1) * 1000.0 / d2) AS BIGINT) AS margin_permille
       |  FROM top2)
       |SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vectors,
       |  CAST(SUM(CASE WHEN margin_permille < 100 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_unstable,
       |  CAST(SUM(CASE WHEN margin_permille < 100 THEN 1 ELSE 0 END) * 1000
       |    // COUNT(*) AS BIGINT) AS unstable_permille,
       |  CAST(MIN(margin_permille) AS BIGINT) AS min_margin_permille
       |FROM m GROUP BY cell ORDER BY cell""".stripMargin

  // ---- s41: PQ codebook-utilization audit ------------------------------------
  /** s41: the codebook-health metric for the PQ index (s10/s12/s19) — per
    * sub-quantizer, how many of the k codes the corpus actually uses,
    * how many are DEAD (trained capacity serving nothing — the quantizer
    * wants retraining on the live distribution), and the hottest code's
    * permille share (a code absorbing most of a subspace collapses ADC
    * resolution there). Rides the SAME persisted code table the PQ
    * serving queries scan; the oracle replays all m sub-trainings through
    * the shared unrolled CTEs.
    *
    * Scale shape: one explode of the 8-byte code row into (subspace,
    * code) pairs (map-only, x8), one (m x k)-bounded agg, m-row output. */
  private val s41: Q = (s, dir) => {
    val (_, codes) = trainedPq(s, dir)
    val pairs = codes.select(explode(array((0 until pqM).map(j =>
        struct(lit(j).as("sub"), col(s"c$j").as("code"))): _*)).as("sc"))
      .select(col("sc.sub").as("sub"), col("sc.code").as("code"))
    pairs.groupBy(col("sub"), col("code")).agg(count(lit(1)).as("n"))
      .groupBy(col("sub")).agg(
        count(lit(1)).as("used_codes"),
        (lit(pqK) - count(lit(1))).as("dead_codes"),
        max(col("n")).as("max_code_n"),
        expr("max(n) * 1000 div sum(n)").as("max_share_permille"))
      .psort(col("sub"))
  }

  private lazy val s41Sql: String = {
    val union = (0 until pqM)
      .map(j => s"SELECT $j AS sub, cell AS code FROM code$j")
      .mkString("\n  UNION ALL ")
    s"""$pqCtes,
       |allc AS (
       |  $union),
       |per AS (
       |  SELECT sub, code, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM allc GROUP BY 1, 2)
       |SELECT sub, CAST(COUNT(*) AS BIGINT) AS used_codes,
       |  CAST($pqK - COUNT(*) AS BIGINT) AS dead_codes,
       |  CAST(MAX(n) AS BIGINT) AS max_code_n,
       |  CAST(MAX(n) * 1000 // SUM(n) AS BIGINT) AS max_share_permille
       |FROM per GROUP BY sub ORDER BY sub""".stripMargin
  }

  // ---- s42: index staleness audit ------------------------------------------
  /** s42: INDEX STALENESS — the serve-path decay audit run before deciding
    * a reindex cadence: the LSH index was built at T0 (only "old" vectors,
    * vec_id % 10 <> 9 — 90% of the corpus); arrivals since then are
    * queryable as probes but unreachable as neighbors. For the standard
    * probe set (vec_id < 20, same as s05), compare the stale serve's top-3
    * (sig-bucket candidates restricted to old vectors, exact cosine
    * rerank) against the brute-force ground truth over the FULL corpus:
    * per query the hit count, how many true neighbors are new arrivals
    * (structurally unreachable), and recall permille. The gap between
    * `3 - n_new_in_truth` and `hits` is the index's own (LSH) loss;
    * `n_new_in_truth` is pure staleness — the two causes separate, which
    * is exactly what the reindex decision needs.
    *
    * Scale shape: reuses the persisted s03 signature index (build-once);
    * probes broadcast; candidates stream through the sig equi-join; the
    * brute truth leg is the family's 20-query broadcast cross join. */
  private val s42: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val truth = {
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
      q.hint("broadcast")
        .crossJoin(e.select(col("vec_id").as("cid"), col("embedding").as("ce")))
        .filter(col("qid") =!= col("cid"))
        .select(col("qid"), col("cid"), expr(cosineExpr("qe", "ce")).as("cos"))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
        .select(col("qid"), col("cid"))
    }
    val sig = memoized(s"s03sig:$dir") {
      e.select(col("vec_id"), col("embedding"), expr(sigExprSpark("embedding")).as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val stale = sig.filter(col("vec_id") < 20)
      .select(col("vec_id").as("sqid"), col("embedding").as("qe"), col("sig"))
      .join(sig.filter(col("vec_id") % 10 =!= 9) // index frozen at T0
        .select(col("vec_id").as("scid"), col("embedding").as("ce"), col("sig")),
        Seq("sig"))
      .filter(col("sqid") =!= col("scid"))
      .select(col("sqid"), col("scid"),
        expr(cosineExpr("qe", "ce")).as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("sqid")).orderBy(col("cos").desc, col("scid"))))
      .filter(col("rank") <= 3)
      .select(col("sqid"), col("scid"))
    truth
      .join(stale, col("qid") === col("sqid") && col("cid") === col("scid"),
        "left")
      .groupBy(col("qid"))
      .agg(count(col("scid")).as("hits"),
        sum(when(col("cid") % 10 === 9, 1L).otherwise(0L)).as("n_new_in_truth"),
        expr("count(scid) * 1000 div 3").as("recall_pm"))
      .psort(col("qid"))
  }

  private val s42Sql =
    s"""WITH $bruteTruthCtes,
       |sg AS (SELECT vec_id, embedding, ${sigExprSql("embedding")} AS sig
       |  FROM embeddings),
       |lshd AS (
       |  SELECT a.vec_id AS qid, b.vec_id AS cid,
       |    ${cosineSql("a.embedding", "b.embedding")} AS cos
       |  FROM sg a JOIN sg b ON a.sig = b.sig AND a.vec_id <> b.vec_id
       |  WHERE a.vec_id < 20 AND b.vec_id % 10 <> 9),
       |stale AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
       |    FROM lshd) WHERE rnk <= 3)
       |SELECT t.qid,
       |  CAST(COUNT(s.cid) AS BIGINT) AS hits,
       |  CAST(SUM(CASE WHEN t.cid % 10 = 9 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_new_in_truth,
       |  CAST(COUNT(s.cid) * 1000 // 3 AS BIGINT) AS recall_pm
       |FROM brute t LEFT JOIN stale s ON t.qid = s.qid AND t.cid = s.cid
       |GROUP BY t.qid ORDER BY t.qid""".stripMargin

  // ---- s43: multi-vector late-interaction (MaxSim) retrieval ----------------
  /** s43: MAXSIM — ColBERT-style late-interaction retrieval: each stored
    * vector is viewed as 8 contiguous 8-dim sub-vectors (the token/patch
    * embeddings of a multi-vector document — m25's patch grid is the image
    * twin), and a candidate's score against a query is
    * `sum_i max_j cos(q_i, d_j)`: every query sub-vector finds its best
    * match anywhere in the document, so a long document can't dilute a
    * strong local match the way single-vector pooling does.
    *
    * Determinism: each per-sub best cosine is rounded to 1e-6 and scaled to
    * an exact integer BEFORE the sum, so the 8-term sum is associative
    * (long addition) and partition-order-proof; `max` over identical
    * doubles is order-free on both engines. (Tie-at-exactly-.5e-6 after
    * the 1e6 scaling would need the cosine double to be representable as
    * k+0.5 — not reachable from these inputs; both engines round ties
    * away from zero regardless.)
    *
    * Scale shape: stage 1 is the IVF serve — queries broadcast, candidates
    * probed by coarse-cell equi-join (label), so the x8 sub-vector explode
    * pays only on the SHORTLIST, never the corpus; stage 2 is one shuffle
    * keyed (qid, cid, qsub) with map-side partial max, then an exact long
    * sum. At 100 TB the corpus-side explode streams and nothing global
    * materializes. */
  private val s43: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    def subVecs(c: String) =
      posexplode(expr(s"transform(sequence(0, 7), i -> slice($c, i*8+1, 8))"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("label"), subVecs("embedding"))
      .withColumnRenamed("pos", "qsub").withColumnRenamed("col", "qe")
    val c = e
      .select(col("vec_id").as("cid"), col("label"), subVecs("embedding"))
      .withColumnRenamed("pos", "dsub").withColumnRenamed("col", "ce")
    val best = q.hint("broadcast").join(c, Seq("label"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), col("qsub"),
        expr(cosineExpr("qe", "ce")).as("cos"))
      .groupBy(col("qid"), col("cid"), col("qsub"))
      .agg(max(col("cos")).as("bestcos"))
    val scored = best.groupBy(col("qid"), col("cid"))
      .agg(sum(round(col("bestcos") * lit(1000000L), 0).cast("long"))
        .as("maxsim_e6"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("maxsim_e6").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("rank"), col("cid"), col("maxsim_e6"))
      .psort(col("qid"), col("rank"))
  }

  private val s43Sql =
    s"""WITH q AS (
       |  SELECT vec_id AS qid, label, i AS qsub,
       |    LIST_SLICE(embedding, i*8+1, i*8+8) AS qe
       |  FROM embeddings, RANGE(8) t(i) WHERE vec_id < 5),
       |c AS (
       |  SELECT vec_id AS cid, label, j AS dsub,
       |    LIST_SLICE(embedding, j*8+1, j*8+8) AS ce
       |  FROM embeddings, RANGE(8) t(j)),
       |best AS (
       |  SELECT qid, cid, qsub, MAX(${cosineSql("qe", "ce")}) AS bestcos
       |  FROM q JOIN c USING (label) WHERE qid <> cid
       |  GROUP BY 1, 2, 3),
       |sc AS (
       |  SELECT qid, cid,
       |    CAST(SUM(CAST(ROUND(bestcos * 1000000) AS BIGINT)) AS BIGINT)
       |      AS maxsim_e6
       |  FROM best GROUP BY 1, 2),
       |r AS (
       |  SELECT qid, cid, maxsim_e6,
       |    ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY maxsim_e6 DESC, cid) AS rank
       |  FROM sc)
       |SELECT qid, rank, cid, maxsim_e6
       |FROM r WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  // ---- s44: multi-probe LSH (Lv et al., VLDB 2007) ---------------------
  /** s44: multi-probe LSH retrieval — instead of adding hash tables to
    * recover near-misses, each query probes its own hyperplane bucket
    * PLUS the 8 buckets at Hamming distance 1 (one signature bit
    * flipped): a neighbor whose cosine puts it just across one
    * hyperplane lands in exactly such a bucket. Same 8-bit signature
    * contract (and the same persisted signature frame) as s03;
    * candidates come from the 9-probe equi-join, exact cosine re-ranks,
    * top-3 per query; `probe_ham` records whether the hit needed a
    * flipped bucket — the recall s03's single probe would have missed.
    *
    * Scale shape: the probe fan-out lands on the QUERY side only (9 rows
    * per query — it broadcasts); the corpus side stays one row per
    * vector and the candidate join is an equi-join on the probe
    * signature. No extra hash tables, no corpus blow-up — the paper's
    * whole point. */
  private val s44: Q = (s, dir) => {
    val e = memoized(s"s03sig:$dir") {
      t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          expr(sigExprSpark("embedding")).as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val probes = (0 until nPlanes).map(i => expr(s"sig ^ ${1 << i}")) :+
      col("sig")
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("sig").as("qsig"), explode(array(probes: _*)).as("psig"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"),
      col("sig").as("psig"))
    val scored = q.join(c, Seq("psig"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"),
        when(col("psig") === col("qsig"), 0).otherwise(1).as("probe_ham"),
        col("cid"), expr(cosineExpr("qe", "ce")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("rank"), col("cid"), col("probe_ham"),
        round(col("cos"), 6).as("cosine"))
      .psort(col("qid"), col("rank"))
  }

  private val s44Sql = {
    val probeList = (0 until nPlanes).map(i => s"xor(sig, ${1 << i})")
      .mkString("[", ", ", ", sig]")
    s"""WITH e AS (
       |  SELECT vec_id, embedding, ${sigExprSql("embedding")} AS sig
       |  FROM embeddings),
       |q AS (
       |  SELECT vec_id AS qid, embedding AS qe, sig AS qsig,
       |    UNNEST($probeList) AS psig
       |  FROM e WHERE vec_id < 20),
       |scored AS (
       |  SELECT qid, CASE WHEN psig = qsig THEN 0 ELSE 1 END AS probe_ham,
       |    c.vec_id AS cid, ${cosineSql("qe", "c.embedding")} AS cos
       |  FROM q JOIN e c ON q.psig = c.sig AND qid <> c.vec_id),
       |ranked AS (
       |  SELECT qid, probe_ham, cid, cos,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid)
       |      AS rank
       |  FROM scored)
       |SELECT qid, rank, cid, probe_ham, ROUND(cos, 6) AS cosine
       |FROM ranked WHERE rank <= 3 ORDER BY qid, rank""".stripMargin
  }

  // ---- s45: serving funnel with per-stage recall attribution ------------
  /** s45: the three-stage production serving chain — coarse cell routing
    * (the s02 partitioner), int8 ADC shortlist within the cell (the s07
    * quantizer, top-10), exact re-rank to the final top-3 — with recall
    * LOSS ATTRIBUTED PER STAGE against the brute-force truth: per query,
    * how many of the 3 true neighbors were even in the routed cell
    * (routing ceiling), survived the quantized shortlist, and made the
    * final answer. This is the audit a serving team runs to decide WHICH
    * stage to spend on (more probes vs finer codes vs deeper re-rank) —
    * aggregate recall alone cannot say.
    *
    * Scale shape: truth leg is the 20-query broadcast brute pass (audit
    * cost, not serving cost); the serving legs are the s02 cell equi-join
    * and the persisted int8 index; every accounting join is a per-(qid,
    * cid) equi-join against 3-row/10-row-per-query frames. */
  private val s45: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val qz = memoized(s"s07q:$dir") {
      val mx = e.agg(
        max(expr("array_max(transform(embedding, x -> abs(cast(x as double))))")).as("m"))
      e.crossJoin(broadcast(mx))
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(round(cast(x as double) / m * 127.0) as bigint))")
            .as("qv"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val lab = e.select(col("vec_id"), col("label"))
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("label").as("qlab"),
        col("embedding").as("qe"))
    val all = e.select(col("vec_id").as("cid"), col("label").as("clab"),
      col("embedding").as("ce"))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid"))
    // truth: brute top-3 over the WHOLE corpus, no routing
    val truth = q.hint("broadcast").join(all, col("qid") =!= col("cid"))
      .select(col("qid"), col("qlab"), col("cid"), col("clab"),
        expr(cosineExpr("qe", "ce")).as("cos"))
      .withColumn("trank", row_number().over(wq)).filter(col("trank") <= 3)
      .select(col("qid"), col("qlab"), col("cid"), col("clab"))
    // stage 2: int8 ADC shortlist top-10 WITHIN the routed cell
    val qq = qz.join(lab, Seq("vec_id")).filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("label").as("qlab"),
        col("qv").as("qa"))
    val cz = qz.join(lab, Seq("vec_id"))
      .select(col("vec_id").as("cid"), col("label").as("clab"),
        col("qv").as("qb"))
    val short = qq.hint("broadcast").join(cz,
        col("qlab") === col("clab") && col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        expr("cast(graft_dot(qa, qb) as bigint)").as("qdot"))
      .withColumn("srank", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("qdot").desc, col("cid"))))
      .filter(col("srank") <= 10)
      .select(col("qid"), col("cid"))
    // stage 3: exact re-rank of the 10-candidate shortlist
    val fin = short
      .join(e.select(col("vec_id").as("cid"), col("embedding").as("ce")),
        Seq("cid"))
      .join(q.select(col("qid"), col("qe")), Seq("qid"))
      .select(col("qid"), col("cid"), expr(cosineExpr("qe", "ce")).as("cos"))
      .withColumn("frank", row_number().over(wq)).filter(col("frank") <= 3)
      .select(col("qid"), col("cid"))
    // per-stage attribution: of the 3 true neighbors, how many survive
    val inCell = truth.groupBy(col("qid")).agg(
      sum(when(col("clab") === col("qlab"), 1L).otherwise(0L)).as("t_in_cell"))
    val inShort = truth.select(col("qid"), col("cid"))
      .join(short, Seq("qid", "cid"), "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as("t_in_shortlist"))
    val inFinal = truth.select(col("qid"), col("cid"))
      .join(fin, Seq("qid", "cid"), "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as("t_in_final"))
    truth.groupBy(col("qid")).agg(count(lit(1)).as("n_truth"))
      .join(inCell, Seq("qid"), "left")
      .join(inShort, Seq("qid"), "left")
      .join(inFinal, Seq("qid"), "left")
      .select(col("qid"), col("n_truth"),
        coalesce(col("t_in_cell"), lit(0L)).as("t_in_cell"),
        coalesce(col("t_in_shortlist"), lit(0L)).as("t_in_shortlist"),
        coalesce(col("t_in_final"), lit(0L)).as("t_in_final"))
      .psort(col("qid"))
  }

  private val s45Sql =
    s"""WITH mx AS (
       |  SELECT MAX(LIST_MAX([ABS(x::DOUBLE) FOR x IN embedding])) AS m
       |  FROM embeddings),
       |qz AS (
       |  SELECT vec_id, label,
       |    [CAST(ROUND(x::DOUBLE / m * 127.0) AS BIGINT) FOR x IN embedding]
       |      AS qv
       |  FROM embeddings, mx),
       |q AS (SELECT vec_id AS qid, label AS qlab, embedding AS qe
       |      FROM embeddings WHERE vec_id < 20),
       |truth AS (
       |  SELECT qid, qlab, cid, clab FROM (
       |    SELECT qid, qlab, c.vec_id AS cid, c.label AS clab,
       |      ROW_NUMBER() OVER (PARTITION BY qid
       |        ORDER BY ${cosineSql("qe", "c.embedding")} DESC, c.vec_id)
       |        AS trank
       |    FROM q JOIN embeddings c ON qid <> c.vec_id)
       |  WHERE trank <= 3),
       |short AS (
       |  SELECT qid, cid FROM (
       |    SELECT a.vec_id AS qid, b.vec_id AS cid,
       |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |        ORDER BY LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT),
       |          [z[1] * z[2] FOR z IN LIST_ZIP(a.qv, b.qv)]),
       |          (acc, v) -> acc + v) DESC, b.vec_id) AS srank
       |    FROM qz a JOIN qz b
       |      ON a.label = b.label AND a.vec_id < 20 AND a.vec_id <> b.vec_id)
       |  WHERE srank <= 10),
       |fin AS (
       |  SELECT qid, cid FROM (
       |    SELECT s.qid, s.cid,
       |      ROW_NUMBER() OVER (PARTITION BY s.qid
       |        ORDER BY ${cosineSql("q.qe", "c.embedding")} DESC, s.cid)
       |        AS frank
       |    FROM short s
       |    JOIN embeddings c ON s.cid = c.vec_id
       |    JOIN q ON s.qid = q.qid)
       |  WHERE frank <= 3)
       |SELECT t.qid, COUNT(*) AS n_truth,
       |  CAST(SUM(CASE WHEN t.clab = t.qlab THEN 1 ELSE 0 END) AS BIGINT)
       |    AS t_in_cell,
       |  CAST(SUM(CASE WHEN sh.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS t_in_shortlist,
       |  CAST(SUM(CASE WHEN f.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS t_in_final
       |FROM truth t
       |LEFT JOIN short sh ON t.qid = sh.qid AND t.cid = sh.cid
       |LEFT JOIN fin f ON t.qid = f.qid AND t.cid = f.cid
       |GROUP BY t.qid ORDER BY t.qid""".stripMargin

  val queries: Map[String, Q] = Map(
    "s43_maxsim_multivector" -> s43,
    "s44_multiprobe_lsh" -> s44,
    "s45_serving_funnel" -> s45,
    "s42_staleness_audit" -> s42,
    "s41_pq_utilization" -> s41,
    "s40_margin_audit" -> s40,
    "s39_embedding_coverage" -> s39,
    "s38_cell_distortion" -> s38,
    "s37_serving_load" -> s37,
    "s36_retrain_migration" -> s36,
    "s35_index_compaction" -> s35,
    "s34_sharded_serve" -> s34,
    "s33_embedding_audit" -> s33,
    "s32_adaptive_recall" -> s32,
    "s31_adaptive_nprobe" -> s31,
    "s30_graph_walk" -> s30,
    "s29_kcenter_coreset" -> s29,
    "s28_index_persist" -> s28,
    "s27_streaming_ann" -> s27,
    "s26_centroid_drift" -> s26,
    "s25_ingest_gate" -> s25,
    "s24_label_prop" -> s24,
    "s23_quant_ladder" -> s23,
    "s22_hard_negatives" -> s22,
    "s21_tombstone_search" -> s21,
    "s20_ivf_cell_stats" -> s20,
    "s19_knn_ivfpq" -> s19,
    "s18_graph_centrality" -> s18,
    "s17_hybrid_rrf" -> s17,
    "s16_binary_quant" -> s16,
    "s15_mmr_diversify" -> s15,
    "s14_range_search" -> s14,
    "s13_ivf_incremental" -> s13,
    "s12_pq_rerank" -> s12,
    "s11_pq_recall" -> s11,
    "s10_knn_pq" -> s10,
    "s09_knn_graph" -> s09,
    "s08_knn_filtered" -> s08,
    "s07_knn_quantized" -> s07,
    "s01_knn_brute" -> s01,
    "s02_knn_ivf" -> s02,
    "s03_knn_lsh" -> s03,
    "s04_knn_ivf_trained" -> s04,
    "s05_ann_recall" -> s05,
    "s06_ivf_recall_sweep" -> s06)

  val oracleSql: Map[String, String] = Map(
    "s43_maxsim_multivector" -> s43Sql,
    "s44_multiprobe_lsh" -> s44Sql,
    "s45_serving_funnel" -> s45Sql,
    "s42_staleness_audit" -> s42Sql,
    "s41_pq_utilization" -> s41Sql,
    "s40_margin_audit" -> s40Sql,
    "s39_embedding_coverage" -> s39Sql,
    "s38_cell_distortion" -> s38Sql,
    "s37_serving_load" -> s37Sql,
    "s36_retrain_migration" -> s36Sql,
    "s35_index_compaction" -> s35Sql,
    "s34_sharded_serve" -> s34Sql,
    "s33_embedding_audit" -> s33Sql,
    "s32_adaptive_recall" -> s32Sql,
    "s31_adaptive_nprobe" -> s31Sql,
    "s30_graph_walk" -> s30Sql,
    "s29_kcenter_coreset" -> s29Sql,
    "s28_index_persist" -> s28Sql,
    "s27_streaming_ann" -> s27Sql,
    "s26_centroid_drift" -> s26Sql,
    "s25_ingest_gate" -> s25Sql,
    "s24_label_prop" -> s24Sql,
    "s23_quant_ladder" -> s23Sql,
    "s22_hard_negatives" -> s22Sql,
    "s21_tombstone_search" -> s21Sql,
    "s20_ivf_cell_stats" -> s20Sql,
    "s19_knn_ivfpq" -> s19Sql,
    "s18_graph_centrality" -> s18Sql,
    "s17_hybrid_rrf" -> s17Sql,
    "s16_binary_quant" -> s16Sql,
    "s15_mmr_diversify" -> s15Sql,
    "s14_range_search" -> s14Sql,
    "s13_ivf_incremental" -> s13Sql,
    "s12_pq_rerank" -> s12Sql,
    "s11_pq_recall" -> s11Sql,
    "s10_knn_pq" -> s10Sql,
    "s09_knn_graph" -> s09Sql,
    "s08_knn_filtered" -> s08Sql,
    "s07_knn_quantized" -> s07Sql,
    "s01_knn_brute" -> s01Sql,
    "s02_knn_ivf" -> s02Sql,
    "s03_knn_lsh" -> s03Sql,
    "s04_knn_ivf_trained" -> s04Sql,
    "s05_ann_recall" -> s05Sql,
    "s06_ivf_recall_sweep" -> s06Sql)
}
