package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine
import graft.queries.QueryHelpers._

/** End-to-end COMPOSITION of the engine's own surfaces — the reference's
  * ingest-then-query lifecycle (README.md:112-123: consume a topic, run
  * SQL over it, export the result) scaled into a training-data pipeline:
  *
  *   Kafka ingest (Confluent-framed JSON through Engine.init's registry +
  *   wire-format decode) -> canonical dedup (d09's normalization,
  *   first-doc-wins) -> quality gate (x23's five rules) -> sequence
  *   packing (x10's per-(source, shard) running-sum bins) -> partitioned
  *   COPY export -> read the exported shards back and summarize.
  *
  * Everything between ingest and export is ONE chain of engine.sql
  * statements — the exact statements a user would type at the CLI — so
  * the gate proves the operators compose outside the per-query harness.
  * The oracle recomputes the same pipeline from the raw documents table
  * (the kafka layer is an identity transport), so the hash gate covers
  * the ingest decode, every transform, AND the export round-trip.
  *
  * Scale: ingest decode is the shuffle-free mapPartitions path; dedup is
  * one hash shuffle on the canonical hash; the gate is map-only; packing
  * windows are per-(source, shard) — never global; the COPY is a
  * hive-partitioned distributed write. No driver-side data moves: the
  * record frames are built with Spark SQL (concat of a constant wire
  * prefix), not collected.
  */
object Pipeline {

  private val budget = 256

  private val stopArr = TextOps.stopwords.map(w => s"'$w'").mkString(", ")

  private val p01: Q = (s, dir) => {
    val engine = new Engine(s)
    try {
      val topic = "pipe-docs"
      val schemaText =
        """{"type":"object","properties":{
          |"doc_id":{"type":"integer"},
          |"source":{"type":"string"},
          |"text":{"type":"string"}},
          |"required":["doc_id","source","text"]}""".stripMargin
      val id = engine.registry.register(s"$topic-value", "JSON", schemaText)
      // Confluent wire frame (magic byte + schema id) prepended IN SPARK —
      // the produce side of the reference harness, distributed
      val prefix = graft.serde.WireFormat.frame(id, Array.emptyByteArray)
      val records = t(s, dir, "documents").select(
        lit(null).cast("binary").as("key"),
        concat(lit(prefix),
          encode(to_json(struct(col("doc_id"), col("source"), col("text"))),
            "UTF-8")).as("value"),
        lit(topic).as("topic"),
        pmod(col("doc_id"), lit(8)).cast("int").as("partition"),
        col("doc_id").as("offset"),
        timestamp_millis(lit(1700000000000L) + col("doc_id")).as("timestamp"),
        lit(0).as("timestampType"),
        lit(null).cast(
          "array<struct<key:string,value:binary>>").as("headers"))
      engine.init(Seq(Engine.TopicSpec(topic, rowAttrs = Set.empty)),
        _ => records)

      // ---- the CLI statement chain ----
      engine.sql(
        s"""CREATE OR REPLACE TABLE p_dedup AS
           |SELECT doc_id, source, text FROM (
           |  SELECT doc_id, source, text, row_number() OVER (
           |    PARTITION BY md5(array_join(array_sort(split(
           |      regexp_replace(lower(trim(text)), ' +', ' '), ' ')), ' '))
           |    ORDER BY doc_id) AS rn
           |  FROM pipe_docs) WHERE rn = 1""".stripMargin).collect()
      engine.sql(
        s"""CREATE OR REPLACE TABLE p_kept AS
           |SELECT doc_id, source, doc_id % 4 AS shard,
           |  cast(size(split(text, ' +')) AS bigint) AS tok
           |FROM p_dedup
           |WHERE NOT (length(text) < 50)
           |  AND NOT (size(split(text, ' +')) < 10)
           |  AND NOT (cast(size(filter(split(text, ' +'),
           |        w -> array_contains(array($stopArr), w))) AS double)
           |      / cast(size(split(text, ' +')) AS double) < 0.01)
           |  AND NOT (cast(length(text) -
           |        length(regexp_replace(text, '[^A-Za-z0-9 ]', '')) AS double)
           |      / cast(length(text) AS double) > 0.3)
           |  AND NOT (aggregate(transform(split(text, ' +'),
           |          w -> length(w)), 0L, (a, x) -> a + x) / cast(size(
           |          split(text, ' +')) AS double) > 12.0
           |    OR aggregate(transform(split(text, ' +'),
           |          w -> length(w)), 0L, (a, x) -> a + x) / cast(size(
           |          split(text, ' +')) AS double) < 2.0)""".stripMargin)
        .collect()
      engine.sql(
        s"""CREATE OR REPLACE TABLE p_packed AS
           |SELECT source, shard, doc_id, tok,
           |  (sum(tok) OVER (PARTITION BY source, shard ORDER BY doc_id
           |     ROWS UNBOUNDED PRECEDING) - tok) div $budget AS bin
           |FROM p_kept""".stripMargin).collect()
      // keyed by sf dir so repeated runs (bench warmup + iterations)
      // overwrite one location instead of accumulating temp dirs
      val out = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_p01_export_" + Integer.toHexString(dir.hashCode))
        .getAbsolutePath + "/packed.parquet"
      engine.sql(s"COPY p_packed TO '$out' " +
        "(FORMAT parquet, PARTITION_BY (source))").collect()

      // ---- read the EXPORTED shards back; summarize per bin ----
      engine.sql(
        s"""SELECT source, shard, bin, count(*) AS n_docs,
           |  cast(sum(tok) AS bigint) AS bin_tokens,
           |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
           |FROM '$out' GROUP BY source, shard, bin""".stripMargin)
        .psort(col("source"), col("shard"), col("bin"))
    } finally engine.close()
  }

  private val p01Sql = {
    val toks = "REGEXP_SPLIT_TO_ARRAY(text, ' +')"
    val stopList = TextOps.stopwords.map(w => s"'$w'")
      .mkString("[", ",", "]")
    val meanLen =
      s"(LIST_SUM(LIST_TRANSFORM($toks, w -> LENGTH(w)))::DOUBLE / LEN($toks)::DOUBLE)"
    s"""WITH dedup AS (
       |  SELECT doc_id, source, text FROM (
       |    SELECT doc_id, source, text, ROW_NUMBER() OVER (
       |      PARTITION BY MD5(ARRAY_TO_STRING(LIST_SORT(STRING_SPLIT(
       |        REGEXP_REPLACE(LOWER(TRIM(text)), ' +', ' ', 'g'), ' ')), ' '))
       |      ORDER BY doc_id) AS rn
       |    FROM documents) WHERE rn = 1),
       |kept AS (
       |  SELECT doc_id, source, doc_id % 4 AS shard,
       |    CAST(LEN($toks) AS BIGINT) AS tok
       |  FROM dedup
       |  WHERE NOT (LENGTH(text) < 50)
       |    AND NOT (LEN($toks) < 10)
       |    AND NOT (LEN(LIST_FILTER($toks,
       |          w -> LIST_CONTAINS($stopList, w)))::DOUBLE
       |        / LEN($toks)::DOUBLE < 0.01)
       |    AND NOT ((LENGTH(text) -
       |          LENGTH(REGEXP_REPLACE(text, '[^A-Za-z0-9 ]', '', 'g')))::DOUBLE
       |        / LENGTH(text)::DOUBLE > 0.3)
       |    AND NOT ($meanLen > 12.0 OR $meanLen < 2.0)),
       |binned AS (
       |  SELECT source, shard, doc_id, tok,
       |    CAST((SUM(tok) OVER (PARTITION BY source, shard ORDER BY doc_id
       |       ROWS UNBOUNDED PRECEDING) - tok) // $budget AS BIGINT) AS bin
       |  FROM kept)
       |SELECT source, shard, bin, COUNT(*) AS n_docs,
       | CAST(SUM(tok) AS BIGINT) AS bin_tokens,
       | MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM binned GROUP BY source, shard, bin
       |ORDER BY source, shard, bin""".stripMargin
  }

  /** Row shape flowing through p02's streaming dedup state. */
  final case class PDoc(ch: String, doc_id: Long, source: String,
                        text: String)

  /** p02's keep-lowest-doc_id ingest gate: first sight of a canonical
    * hash admits the winner; later sightings are duplicates.
    * Trigger.AvailableNow with maxFilesPerTrigger unset drains all staged
    * files in ONE micro-batch, so the batch min IS the global min — and
    * if that assumption is ever broken (a future caller sets
    * maxFilesPerTrigger, staging semantics change), a lower doc_id
    * arriving AFTER the winner emitted is the exact violation: fail loud
    * instead of silently keeping the wrong doc. Unit-tested directly via
    * TestGroupState (AdviceR8FixSpec). */
  private[graft] def keepLowestGate(key: String, it: Iterator[PDoc],
      state: org.apache.spark.sql.streaming.GroupState[PDoc]): Iterator[PDoc] = {
    val batchBest = it.minBy(_.doc_id)
    state.getOption match {
      case Some(w) =>
        if (batchBest.doc_id < w.doc_id) throw new IllegalStateException(
          s"p02 keep-lowest gate: doc ${batchBest.doc_id} arrived after " +
            s"winner ${w.doc_id} was emitted — staged drain was not " +
            "single-batch (maxFilesPerTrigger set?)")
        Iterator.empty
      case None =>
        state.update(batchBest); Iterator.single(batchBest)
    }
  }

  /** p02: the STREAMING arrival of p01's curation pipeline — dedup-at-
    * ingest through the real Structured Streaming runtime:
    *
    *   parquet-staged readStream of (original ∪ planted canonical twins) ->
    *   flatMapGroupsWithState keyed on the d09 canonical hash keeping the
    *   LOWEST doc_id per group (winner by construction, not by arrival
    *   order — a keep-earliest-crawl policy that is deterministic at any
    *   scale factor even when organic bag collisions exist) -> the x23
    *   quality gate as a map-only filter -> a REAL parquet file sink
    *   (append mode) -> read the sink files back and summarize per
    *   source.
    *
    * Scale: the dedup state is one small row per distinct canonical hash
    * (exactly the state a 100 TB ingest gate carries, sharded by the
    * group key); the gate filter is stateless; the file sink is the
    * production landing path. The INGEST leg is executor-side end to
    * end: the corpus is staged as parquet by a distributed write and
    * re-opened through `readStream` (Spark's file source — the exact
    * shape a deployment points at its landing bucket), so no
    * corpus-sized rows ever pass through the driver. The oracle replays
    * min-doc_id-per-hash + gate + summary in batch SQL — streaming
    * runtime result == batch semantics, pinned by hash. */
  private val p02: Q = (s, dir) => {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import s.implicits._
    val d = t(s, dir, "documents")
    val twins = d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
        concat(upper(array_join(reverse(split(col("text"), " ")), "  ")),
          lit("  ")).as("text"))
    val corpus = d.select(col("doc_id"), col("source"), col("text"))
      .unionAll(twins)
      .withColumn("ch", md5(array_join(array_sort(split(
        regexp_replace(lower(trim(col("text"))), " +", " "), " ")), " ")))
      .select(col("ch"), col("doc_id"), col("source"), col("text"))
    val deduped = graft.streaming.StreamingOps.stageAndStream(corpus)
      .as[PDoc]
      .groupByKey(_.ch)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        keepLowestGate _)
      .toDF()
    val kept = deduped.filter(expr(
      s"""NOT (length(text) < 50)
         |AND NOT (size(split(text, ' +')) < 10)
         |AND NOT (cast(size(filter(split(text, ' +'),
         |      w -> array_contains(array($stopArr), w))) AS double)
         |    / cast(size(split(text, ' +')) AS double) < 0.01)
         |AND NOT (cast(length(text) -
         |      length(regexp_replace(text, '[^A-Za-z0-9 ]', '')) AS double)
         |    / cast(length(text) AS double) > 0.3)
         |AND NOT (aggregate(transform(split(text, ' +'),
         |        w -> length(w)), 0L, (a, x) -> a + x) / cast(size(
         |        split(text, ' +')) AS double) > 12.0
         |  OR aggregate(transform(split(text, ' +'),
         |        w -> length(w)), 0L, (a, x) -> a + x) / cast(size(
         |        split(text, ' +')) AS double) < 2.0)""".stripMargin))
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " +")).cast("long").as("tok"))
    // r14 (guide §2.4/§5, VERDICT r13 item 5): the dedup state is one small
    // row per distinct canonical hash, but the stream ran at the session
    // default 32 shuffle partitions — 32 state-store opens/commits AND 32
    // sink files per micro-batch for a bounded gate slice. Cap to 8 via the
    // session-clone isolation (the q85/q95 statePartitions discipline);
    // production ingest keeps the default, where partition count should
    // match key cardinality and throughput.
    graft.streaming.StreamingOps.snapshotToFiles(kept, statePartitions = 8)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("tok")).as("kept_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .psort(col("source"))
  }

  private val p02Sql = {
    val toks = "REGEXP_SPLIT_TO_ARRAY(text, ' +')"
    val stopList = TextOps.stopwords.map(w => s"'$w'")
      .mkString("[", ",", "]")
    val meanLen =
      s"(LIST_SUM(LIST_TRANSFORM($toks, w -> LENGTH(w)))::DOUBLE / LEN($toks)::DOUBLE)"
    s"""WITH corpus AS (
       |  SELECT doc_id, source, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, source,
       |    UPPER(ARRAY_TO_STRING(LIST_REVERSE(STRING_SPLIT(text, ' ')), '  ')) || '  '
       |  FROM documents WHERE doc_id % 5 = 0),
       |dedup AS (
       |  SELECT doc_id, source, text FROM (
       |    SELECT doc_id, source, text, ROW_NUMBER() OVER (
       |      PARTITION BY MD5(ARRAY_TO_STRING(LIST_SORT(STRING_SPLIT(
       |        REGEXP_REPLACE(LOWER(TRIM(text)), ' +', ' ', 'g'), ' ')), ' '))
       |      ORDER BY doc_id) AS rn
       |    FROM corpus) WHERE rn = 1),
       |kept AS (
       |  SELECT doc_id, source, CAST(LEN($toks) AS BIGINT) AS tok
       |  FROM dedup
       |  WHERE NOT (LENGTH(text) < 50)
       |    AND NOT (LEN($toks) < 10)
       |    AND NOT (LEN(LIST_FILTER($toks,
       |          w -> LIST_CONTAINS($stopList, w)))::DOUBLE
       |        / LEN($toks)::DOUBLE < 0.01)
       |    AND NOT ((LENGTH(text) -
       |          LENGTH(REGEXP_REPLACE(text, '[^A-Za-z0-9 ]', '', 'g')))::DOUBLE
       |        / LENGTH(text)::DOUBLE > 0.3)
       |    AND NOT ($meanLen > 12.0 OR $meanLen < 2.0))
       |SELECT source, COUNT(*) AS n_kept,
       | CAST(SUM(tok) AS BIGINT) AS kept_tokens,
       | MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM kept GROUP BY source ORDER BY source""".stripMargin
  }

  /** p04: streaming CDC apply — the change-data-capture lake-apply
    * pattern end to end: a CDC event stream (upserts + deletes, each
    * carrying a monotone sequence number) lands through the REAL
    * Structured Streaming file source in MULTIPLE micro-batches
    * (maxFilesPerTrigger=1 forces real batch boundaries), and each batch
    * applies transactionally to an engine table via foreachBatch + MERGE
    * INTO: collapse the batch to its max-seq event per key (in-batch
    * last-wins), then a seq-guarded MERGE (`b.seq > tgt.seq`) makes the
    * apply idempotent and ORDER-INDEPENDENT across batches — the final
    * state is the max-seq record per key no matter how the files split,
    * the exact out-of-order tolerance a production CDC consumer needs.
    * Deletes are retained as tombstones (the s21 serve pattern) so a
    * stale update arriving after a newer delete can never resurrect the
    * row; the serve-time filter drops them.
    *
    * Scale: each batch is O(batch) — one window collapse + one MERGE
    * (left join + anti join against the snapshot); the corpus-sized
    * target never rescans per event, and no rows pass through the driver
    * (the batch pins executor-side and re-binds to the engine session).
    * The oracle replays the whole stream as one max-seq-per-key batch
    * query — streaming apply == batch semantics, pinned by hash. */
  private val p04: Q = (s, dir) => {
    val eng = new graft.Engine(s)
    try {
      eng.sql(s"CREATE OR REPLACE TABLE cdc_tgt AS " +
        s"SELECT c_custkey AS id, CAST(0 AS BIGINT) AS seq, " +
        s"CAST(c_acctbal AS DECIMAL(12,2)) AS bal, FALSE AS del " +
        s"FROM '$dir/customer.parquet' WHERE c_custkey <= 500")
      val ev = t(s, dir, "orders").filter(col("o_orderkey") <= 5000)
        .select((col("o_custkey") % 500).as("id"),
          col("o_orderkey").as("seq"),
          col("o_totalprice").cast("decimal(12,2)").as("bal"),
          (col("o_orderkey") % 11 === 0).as("del"))
      val stream = graft.streaming.StreamingOps
        .stageAndStream(ev, numFiles = 4, maxFilesPerTrigger = Some(1))
      graft.streaming.StreamingOps.applyBatches(stream) { (batch, _) =>
        // pin the batch executor-side and re-bind it to the engine session
        // (foreachBatch frames arrive on the micro-batch session clone)
        val pinned = batch.localCheckpoint(true)
        val bound = org.apache.spark.sql.GraftPlanBridge
          .ofRows(s, pinned.queryExecution.analyzed)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("id")).orderBy(col("seq").desc)
        bound.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
          .createOrReplaceTempView("cdc_batch")
        eng.sql("MERGE INTO cdc_tgt USING cdc_batch b ON cdc_tgt.id = b.id " +
          "WHEN MATCHED AND b.seq > cdc_tgt.seq THEN " +
          "UPDATE SET bal = b.bal, seq = b.seq, del = b.del " +
          "WHEN NOT MATCHED THEN INSERT (id, seq, bal, del) " +
          "VALUES (b.id, b.seq, b.bal, b.del)")
        s.catalog.dropTempView("cdc_batch")
        pinned.unpersist()
        ()
      }
      eng.sql("SELECT id, seq, CAST(bal AS DOUBLE) AS bal FROM cdc_tgt " +
        "WHERE NOT del").psort(col("id"))
    } finally eng.close()
  }

  private val p04Sql =
    """WITH init AS (
      |  SELECT c_custkey AS id, CAST(0 AS BIGINT) AS seq,
      |         CAST(c_acctbal AS DECIMAL(12,2)) AS bal, FALSE AS del
      |  FROM customer WHERE c_custkey <= 500),
      |ev AS (
      |  SELECT o_custkey % 500 AS id, o_orderkey AS seq,
      |         CAST(o_totalprice AS DECIMAL(12,2)) AS bal,
      |         o_orderkey % 11 = 0 AS del
      |  FROM orders WHERE o_orderkey <= 5000),
      |allr AS (SELECT * FROM init UNION ALL SELECT * FROM ev),
      |r AS (SELECT id, seq, bal, del,
      |        ROW_NUMBER() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
      |      FROM allr)
      |SELECT id, seq, CAST(bal AS DOUBLE) AS bal
      |FROM r WHERE rn = 1 AND NOT del ORDER BY id""".stripMargin

  // ---- p05: eval-set builder (split -> dedup-vs-train -> decontaminate) ---
  /** p05: the held-out EVAL split construction every training corpus needs,
    * as one composed pipeline: (1) a deterministic hash split carves ~10%
    * of documents out as eval candidates (md5 of doc_id — reproducible on
    * any cluster, any partition count, unlike random()); (2) candidates
    * that are exact duplicates of any remaining TRAIN document are dropped
    * (split-safe dedup — a leaked verbatim copy makes the eval score a
    * memorization test); (3) survivors sharing >=50% of their word
    * 3-grams with the train side are dropped as near-duplicate
    * contamination (the x11 decontamination direction, INVERTED: here the
    * eval set is cleaned against train, the final gate before an eval set
    * ships). The manifest reports the funnel per source.
    *
    * Scale shape: the split tag is map-only; the exact-dup check is one
    * hash semi-join on the canonical digest; the contamination check
    * re-serves the ONE persisted shingle index (Dedup.docsWithShingles —
    * build-once/serve-many) through a shingle-keyed equi-join. The eval
    * side is ~10% of the corpus — PROPORTIONAL, not constant — so no
    * broadcast is forced: AQE broadcasts it while it fits and falls back
    * to a shuffled join beyond that (both sides hash-partition on the
    * shingle — the shape that survives 100 TB). The manifest is a
    * per-source aggregation. */
  private val p05: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    val norm = regexp_replace(lower(col("text")), " +", " ")
    val tagged = d.select(col("doc_id"), col("source"), md5(norm).as("h"),
      (md5i(col("doc_id").cast("string")) % 10 === 0).as("is_eval"))
    val trainH = tagged.filter(!col("is_eval")).select(col("h")).distinct()
    val dupf = tagged.filter(col("is_eval"))
      .join(trainH.withColumn("dup", lit(true)), Seq("h"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("dup"), lit(false)).as("is_dup"))
    val sh = Dedup.docsWithShingles(s, dir).select(col("doc_id"), col("sh"))
    val trainSh = sh
      .join(tagged.filter(!col("is_eval")).select(col("doc_id")), Seq("doc_id"))
      .select(explode(col("sh")).as("s")).distinct()
    val contam = sh
      .join(dupf.filter(!col("is_dup")).select(col("doc_id")), Seq("doc_id"))
      .select(col("doc_id"), size(col("sh")).as("n_grams"),
        explode(col("sh")).as("s"))
      .join(trainSh, Seq("s"))
      .groupBy(col("doc_id"), col("n_grams"))
      .agg(count(lit(1)).as("n_ov"))
      .filter(col("n_ov").cast("double") >= col("n_grams").cast("double") * 0.5)
      .select(col("doc_id"), lit(true).as("contam"))
    dupf.join(contam, Seq("doc_id"), "left")
      .select(col("source"), col("is_dup"),
        coalesce(col("contam"), lit(false)).as("is_contam"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("is_dup"), 1).otherwise(0)).as("n_dup_dropped"),
        sum(when(!col("is_dup") && col("is_contam"), 1).otherwise(0))
          .as("n_contam_dropped"),
        sum(when(!col("is_dup") && !col("is_contam"), 1).otherwise(0))
          .as("n_final"))
      .psort(col("source"))
  }

  private val p05Sql =
    s"""WITH base AS (
       |  SELECT doc_id, source,
       |    MD5(REGEXP_REPLACE(LOWER(text), ' +', ' ', 'g')) AS h,
       |    ${md5iSql("CAST(doc_id AS VARCHAR)")} % 10 = 0 AS is_eval
       |  FROM documents),
       |trainH AS (SELECT DISTINCT h FROM base WHERE NOT is_eval),
       |dupf AS (
       |  SELECT e.doc_id, e.source, (t.h IS NOT NULL) AS is_dup
       |  FROM (SELECT doc_id, source, h FROM base WHERE is_eval) e
       |  LEFT JOIN trainH t ON e.h = t.h),
       |docsh AS (
       |  SELECT doc_id,
       |    LIST_DISTINCT([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |      FOR i IN RANGE(1, LEN(w) - 1)]) AS sh
       |  FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents)
       |  WHERE LEN(w) >= 3),
       |trainSh AS (
       |  SELECT DISTINCT UNNEST(sh) AS s
       |  FROM docsh JOIN base USING (doc_id) WHERE NOT is_eval),
       |evalSh AS (
       |  SELECT d.doc_id, LEN(d.sh) AS n_grams, UNNEST(d.sh) AS s
       |  FROM docsh d JOIN dupf USING (doc_id) WHERE NOT is_dup),
       |contam AS (
       |  SELECT doc_id FROM (
       |    SELECT e.doc_id, e.n_grams, COUNT(*) AS n_ov
       |    FROM evalSh e JOIN trainSh USING (s) GROUP BY 1, 2)
       |  WHERE CAST(n_ov AS DOUBLE) >= CAST(n_grams AS DOUBLE) * 0.5)
       |SELECT d.source, COUNT(*) AS n_candidates,
       |  CAST(SUM(CASE WHEN d.is_dup THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dup_dropped,
       |  CAST(SUM(CASE WHEN NOT d.is_dup AND c.doc_id IS NOT NULL
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_contam_dropped,
       |  CAST(SUM(CASE WHEN NOT d.is_dup AND c.doc_id IS NULL
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_final
       |FROM dupf d LEFT JOIN contam c ON d.doc_id = c.doc_id
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  // ---- p06: training-mix builder (allocate -> select -> shard) ------------
  /** p06: the final "build the actual pretraining mix" composition — the
    * step that turns curation DECISIONS into a concrete training set:
    * (1) exact-dedup canonical collapse (d01's digest; the canonical keeps
    * the lowest doc_id and its source); (2) a token budget of HALF the
    * canonical mass is allocated across sources by x41's 2-round
    * water-filling (sqrt-smoothed weights, capped at each source's
    * available mass, surplus redistributed to uncapped sources — exact
    * integer arithmetic end to end); (3) each source fills its allocation
    * greedily in deterministic md5(doc_id) order (reproducible on any
    * cluster/partitioning, unlike random()), taking documents while the
    * running token sum fits; (4) the selected set is laid out into 4
    * token-balanced serpentine shards (d28's boustrophedon over the global
    * token-desc rank, via DistributedRank — no single-partition sort).
    * The manifest reports the funnel per source: candidates -> allocation
    * -> selection -> shard spread, with integer-percent utilization.
    *
    * Scale shape: canonical collapse is one digest shuffle; the allocation
    * is O(sources) arithmetic against broadcast scalar totals; selection is
    * one source-PARTITIONED running-sum window (never global) against the
    * broadcast O(sources) allocation table; sharding is one DistributedRank
    * pass + map-only placement; the manifest is a per-source aggregation. */
  private val p06: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val d = t(s, dir, "documents")
    val norm = regexp_replace(lower(col("text")), " +", " ")
    val canon = d.select(col("doc_id"), col("source"), md5(norm).as("h"),
        size(filter(split(norm, " "), w => w =!= "")).cast("long")
          .as("n_tokens"))
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("doc_id"),
        expr("min_by(source, doc_id)").as("source"),
        min(col("n_tokens")).as("n_tokens"))
    val bySrc = canon.groupBy(col("source"))
      .agg(count(lit(1)).as("n_cand"), sum(col("n_tokens")).as("cand_tokens"))
      .withColumn("w",
        expr("cast(floor(sqrt(cast(cand_tokens as double))) as bigint)"))
    val tot = bySrc.agg(sum(col("cand_tokens")).as("tt"), sum(col("w")).as("tw"))
    val r1 = bySrc.crossJoin(broadcast(tot))
      .withColumn("budget", expr("tt div 2"))
      .withColumn("a1", expr("budget * w div tw"))
      .withColumn("c1", least(col("a1"), col("cand_tokens")))
    val spill = r1.agg(sum(col("c1")).as("allocated"),
      sum(when(col("a1") < col("cand_tokens"), col("w")).otherwise(0L))
        .as("wu"))
    val alloc = r1.crossJoin(broadcast(spill))
      .withColumn("alloc_tokens", least(expr(
        "c1 + (case when a1 < cand_tokens and wu > 0 " +
          "then (budget - allocated) * w div wu else 0L end)"),
        col("cand_tokens")))
      .select(col("source"), col("n_cand"), col("cand_tokens"),
        col("alloc_tokens"))
    val wOrd = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // DistributedRank's cut/count passes re-execute their parent plan, so
    // the selected frame persists first (the helper's documented caller
    // convention) — at 100 TB this is the materialized "selected set"
    // artifact between pipeline stages anyway. Memoized like the other
    // shared index frames: a bare persist here would leak one cached copy
    // per invocation under the bench's 3-iteration loop.
    val sel = memoized(s"p06sel:$dir") {
      canon
        .join(broadcast(alloc.select(col("source"), col("alloc_tokens"))),
          Seq("source"))
        .withColumn("cum", sum(col("n_tokens")).over(wOrd))
        .filter(col("cum") <= col("alloc_tokens"))
        .select(col("source"), col("doc_id"), col("n_tokens"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val (ranked, _) = graft.operators.DistributedRank.withGlobalRank(
      sel, -col("n_tokens"), Seq(col("n_tokens").desc, col("doc_id")), "rank")
    val pass = expr("(rank - 1) div 4")
    val pos = (col("rank") - 1) % 4
    val selAgg = ranked
      .withColumn("shard", when(pass % 2 === 0, pos).otherwise(lit(3) - pos))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_selected"), sum(col("n_tokens")).as("sel_tokens"),
        countDistinct(col("shard")).as("n_shards"))
    alloc.join(selAgg, Seq("source"), "left")
      .select(col("source"), col("n_cand"), col("cand_tokens"),
        col("alloc_tokens"),
        coalesce(col("n_selected"), lit(0L)).as("n_selected"),
        coalesce(col("sel_tokens"), lit(0L)).as("sel_tokens"),
        coalesce(col("n_shards"), lit(0L)).as("n_shards"))
      .withColumn("util_pct",
        expr("sel_tokens * 100 div greatest(alloc_tokens, 1L)"))
      .psort(col("source"))
  }

  private val p06Sql =
    """WITH canon AS (
      |  SELECT MIN(doc_id) AS doc_id, ARG_MIN(source, doc_id) AS source,
      |         MIN(n_tokens) AS n_tokens
      |  FROM (
      |    SELECT doc_id, source,
      |      MD5(REGEXP_REPLACE(LOWER(text), ' +', ' ', 'g')) AS h,
      |      LEN([w FOR w IN
      |        STRING_SPLIT(REGEXP_REPLACE(LOWER(text), ' +', ' ', 'g'), ' ')
      |        IF w <> '']) AS n_tokens
      |    FROM documents) GROUP BY h),
      |bysrc AS (
      |  SELECT source, COUNT(*) AS n_cand,
      |    CAST(SUM(n_tokens) AS BIGINT) AS cand_tokens,
      |    CAST(FLOOR(SQRT(CAST(SUM(n_tokens) AS DOUBLE))) AS BIGINT) AS w
      |  FROM canon GROUP BY source),
      |tot AS (SELECT CAST(SUM(cand_tokens) AS BIGINT) AS tt,
      |               CAST(SUM(w) AS BIGINT) AS tw FROM bysrc),
      |r1 AS (
      |  SELECT b.*, tt // 2 AS budget, (tt // 2) * w // tw AS a1,
      |    LEAST((tt // 2) * w // tw, cand_tokens) AS c1
      |  FROM bysrc b, tot),
      |spill AS (
      |  SELECT CAST(SUM(c1) AS BIGINT) AS allocated,
      |    CAST(SUM(CASE WHEN a1 < cand_tokens THEN w ELSE 0 END) AS BIGINT)
      |      AS wu
      |  FROM r1),
      |alloc AS (
      |  SELECT r.source, r.n_cand, r.cand_tokens,
      |    LEAST(r.c1 + CASE WHEN r.a1 < r.cand_tokens AND s.wu > 0
      |      THEN (r.budget - s.allocated) * r.w // s.wu ELSE 0 END,
      |      r.cand_tokens) AS alloc_tokens
      |  FROM r1 r, spill s),
      |sel AS (
      |  SELECT source, doc_id, n_tokens FROM (
      |    SELECT c.source, c.doc_id, c.n_tokens, a.alloc_tokens,
      |      SUM(c.n_tokens) OVER (PARTITION BY c.source
      |        ORDER BY MD5(CAST(c.doc_id AS VARCHAR)), c.doc_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |    FROM canon c JOIN alloc a USING (source)) t
      |  WHERE cum <= alloc_tokens),
      |sharded AS (
      |  SELECT source, n_tokens,
      |    CASE WHEN ((rank - 1) // 4) % 2 = 0 THEN (rank - 1) % 4
      |         ELSE 3 - (rank - 1) % 4 END AS shard
      |  FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id)
      |          AS rank FROM sel)),
      |selagg AS (
      |  SELECT source, COUNT(*) AS n_selected,
      |    CAST(SUM(n_tokens) AS BIGINT) AS sel_tokens,
      |    COUNT(DISTINCT shard) AS n_shards
      |  FROM sharded GROUP BY source)
      |SELECT a.source, a.n_cand, a.cand_tokens, a.alloc_tokens,
      |  COALESCE(s.n_selected, 0) AS n_selected,
      |  COALESCE(s.sel_tokens, 0) AS sel_tokens,
      |  COALESCE(s.n_shards, 0) AS n_shards,
      |  COALESCE(s.sel_tokens, 0) * 100 // GREATEST(a.alloc_tokens, 1)
      |    AS util_pct
      |FROM alloc a LEFT JOIN selagg s USING (source)
      |ORDER BY source""".stripMargin

  // ---- p07: streaming quality gate with dual sinks (dead-letter) ----------
  /** p07: the dead-letter-queue arrival pattern — the streaming quality
    * gate every production ingest runs with TWO landing paths: each
    * micro-batch is verdicted against x23's five rules IN ORDER (first
    * failing rule names the verdict) and split inside `foreachBatch` into
    * an ACCEPT parquet sink and a QUARANTINE sink that carries the reject
    * reason — the quarantine side is what a data-quality on-call actually
    * reads, and replaying it is how rejected docs re-enter after a rule
    * fix. The manifest summarizes both sinks per source (accept +
    * per-reason counts, with n_docs = accept + quarantine pinned by spec).
    *
    * Scale shape: the verdict is one stateless map-only expression per
    * batch; each batch writes O(batch) rows to each sink (distributed
    * parquet appends — no driver rows); the manifest is a per-source
    * aggregation over the landed files. The stream arrives through the
    * real file source in multiple micro-batches (maxFilesPerTrigger=2
    * over 4 staged files), and the result is batch-identical because the
    * gate is stateless — pinned by the oracle hash. */
  private val p07: Q = (s, dir) => {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    // ingredients computed in ONE unconditional projection — the CASE
    // branches then compare scalars. Codegen subexpression elimination
    // covers the repeated split() subtrees WITHIN this projection (all
    // four evaluate unconditionally) but does not reliably cover them
    // across conditional CASE branches, which is where the text-heavy
    // expression dominated the sf10 decade run before the hoist.
    val ingredients = Seq(
      "size(split(text, ' +'))" -> "nw",
      s"size(filter(split(text, ' +'), " +
        s"w -> array_contains(array($stopArr), w)))" -> "nstop",
      "length(regexp_replace(text, '[^A-Za-z0-9 ]', ''))" -> "nalnum",
      "aggregate(transform(split(text, ' +'), w -> length(w)), 0L, " +
        "(a, x) -> a + x)" -> "sumlen")
    val verdictExpr =
      s"""CASE
         | WHEN length(text) < 50 THEN 'too_short'
         | WHEN nw < 10 THEN 'few_words'
         | WHEN cast(nstop AS double) / cast(nw AS double) < 0.01
         |   THEN 'low_stopword'
         | WHEN cast(length(text) - nalnum AS double)
         |     / cast(length(text) AS double) > 0.3 THEN 'high_punct'
         | WHEN sumlen / cast(nw AS double) > 12.0
         |   OR sumlen / cast(nw AS double) < 2.0 THEN 'word_len'
         | ELSE 'accept' END""".stripMargin
    val stream = graft.streaming.StreamingOps
      .stageAndStream(d, numFiles = 4, maxFilesPerTrigger = Some(2))
    val acceptDir = java.nio.file.Files.createTempDirectory("graft_p07_acc_")
    val quarDir = java.nio.file.Files.createTempDirectory("graft_p07_dlq_")
    graft.streaming.StreamingOps.trackTempDir(acceptDir, eager = true)
    graft.streaming.StreamingOps.trackTempDir(quarDir, eager = true)
    graft.streaming.StreamingOps.applyBatches(stream) { (batch, _) =>
      // the two sink writes would each re-execute the batch plan (source
      // re-read + verdict recompute); caching the verdicted batch first is
      // the canonical multi-sink foreachBatch pattern — one evaluation,
      // two O(batch) writes
      val withIng = ingredients.foldLeft(batch) { case (b, (e, n)) =>
        b.withColumn(n, expr(e))
      }
      val v = withIng.withColumn("verdict", expr(verdictExpr))
        .select(col("doc_id"), col("source"), col("verdict")).persist()
      try {
        v.filter(col("verdict") === "accept")
          .select(col("doc_id"), col("source"))
          .write.mode("append").parquet(acceptDir.toString)
        v.filter(col("verdict") =!= "accept")
          .select(col("doc_id"), col("source"), col("verdict"))
          .write.mode("append").parquet(quarDir.toString)
      } finally v.unpersist()
    }
    // explicit sink schemas: a sink that received only empty-batch appends
    // has no data files to infer from (a clean corpus would legitimately
    // leave the quarantine empty)
    val accSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, source STRING")
    val quarSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, source STRING, verdict STRING")
    val acc = s.read.schema(accSchema).parquet(acceptDir.toString)
      .groupBy(col("source")).agg(count(lit(1)).as("n_accept"))
    val quar = s.read.schema(quarSchema).parquet(quarDir.toString)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_quarantine"),
        sum(when(col("verdict") === "too_short", 1L).otherwise(0L))
          .as("n_short"),
        sum(when(col("verdict") === "few_words", 1L).otherwise(0L))
          .as("n_few"),
        sum(when(col("verdict") === "low_stopword", 1L).otherwise(0L))
          .as("n_stop"),
        sum(when(col("verdict") === "high_punct", 1L).otherwise(0L))
          .as("n_punct"),
        sum(when(col("verdict") === "word_len", 1L).otherwise(0L))
          .as("n_wlen"))
    acc.join(quar, Seq("source"), "full")
      .select(col("source"),
        (coalesce(col("n_accept"), lit(0L)) +
          coalesce(col("n_quarantine"), lit(0L))).as("n_docs"),
        coalesce(col("n_accept"), lit(0L)).as("n_accept"),
        coalesce(col("n_short"), lit(0L)).as("n_short"),
        coalesce(col("n_few"), lit(0L)).as("n_few"),
        coalesce(col("n_stop"), lit(0L)).as("n_stop"),
        coalesce(col("n_punct"), lit(0L)).as("n_punct"),
        coalesce(col("n_wlen"), lit(0L)).as("n_wlen"))
      .psort(col("source"))
  }

  private val p07Sql = {
    val toks = "REGEXP_SPLIT_TO_ARRAY(text, ' +')"
    val stopList = TextOps.stopwords.map(w => s"'$w'")
      .mkString("[", ",", "]")
    val meanLen =
      s"(LIST_SUM(LIST_TRANSFORM($toks, w -> LENGTH(w)))::DOUBLE / LEN($toks)::DOUBLE)"
    s"""WITH v AS (
       |  SELECT doc_id, source,
       |    CASE
       |     WHEN LENGTH(text) < 50 THEN 'too_short'
       |     WHEN LEN($toks) < 10 THEN 'few_words'
       |     WHEN LEN(LIST_FILTER($toks,
       |           w -> LIST_CONTAINS($stopList, w)))::DOUBLE
       |         / LEN($toks)::DOUBLE < 0.01 THEN 'low_stopword'
       |     WHEN (LENGTH(text) -
       |           LENGTH(REGEXP_REPLACE(text, '[^A-Za-z0-9 ]', '', 'g')))::DOUBLE
       |         / LENGTH(text)::DOUBLE > 0.3 THEN 'high_punct'
       |     WHEN $meanLen > 12.0 OR $meanLen < 2.0 THEN 'word_len'
       |     ELSE 'accept' END AS verdict
       |  FROM documents)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN verdict = 'accept' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_accept,
       |  CAST(SUM(CASE WHEN verdict = 'too_short' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_short,
       |  CAST(SUM(CASE WHEN verdict = 'few_words' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_few,
       |  CAST(SUM(CASE WHEN verdict = 'low_stopword' THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_stop,
       |  CAST(SUM(CASE WHEN verdict = 'high_punct' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_punct,
       |  CAST(SUM(CASE WHEN verdict = 'word_len' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_wlen
       |FROM v GROUP BY source ORDER BY source""".stripMargin
  }

  // ---- p08: incremental refresh admission (quality -> exact -> near) -----
  /** p08: the DAILY INGEST composition a continuously-crawled corpus runs
    * for every arriving shard — the three admission gates chained in
    * policy order against the standing corpus: (1) x23's five quality
    * rules reject junk before any dedup work is spent on it; (2) d26's
    * normalized-hash exact-dup check against the store; (3) minhash
    * band near-dup (d03's sketch: 8 hashes, 4 bands x 2 rows, exact
    * jaccard >= 0.8 verify) against the store for whatever survives.
    * Output is the per-source admission manifest (batch / per-gate drops /
    * admitted + admitted token mass) — the number a crawl operator
    * watches daily.
    *
    * Scale shape: quality is map-only; the exact gate is one distinct-hash
    * join; the near gate runs at CONTENT-REP level on both sides (the
    * round-9 duplicate-collapse discipline — a 100x-replicated corpus
    * adds zero candidate pairs), candidates from a band equi-join, verify
    * candidate-proportional; one per-source agg closes the funnel. */
  private val p08: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    val isBatch = md5i(col("doc_id").cast("string")) % 10 === 7
    val norm = md5(regexp_replace(lower(col("text")), " +", " "))
    val ts = expr(s"graft_token_stats(text, $stopArr)")
    val nTok = ts.getField("n_tokens")
    val nStop = ts.getField("n_stop")
    val meanTokLen = ts.getField("sum_len").cast("double") / nTok.cast("double")
    val nPunct = length(col("text")) -
      length(regexp_replace(col("text"), "[^A-Za-z0-9 ]", ""))
    val qfail = (length(col("text")) < 50) || (nTok < 10) ||
      (nStop.cast("double") / nTok.cast("double") < 0.01) ||
      (nPunct.cast("double") / length(col("text")).cast("double") > 0.3) ||
      (meanTokLen > 12.0) || (meanTokLen < 2.0)
    val batch = d.filter(isBatch).select(col("doc_id"), col("source"),
      norm.as("h"), qfail.as("qfail"), nTok.as("n_tok"))
    val storeH = d.filter(!isBatch).select(norm.as("h")).distinct()
    val flagged = batch
      .join(storeH.withColumn("in_store", lit(true)), Seq("h"), "left")
      .select(col("doc_id"), col("source"), col("h"), col("qfail"),
        col("n_tok"), col("in_store").isNotNull.as("is_exact"))
    // near-dup gate at content-rep level: one representative per distinct
    // normalized text on BOTH sides, so candidate pairs track content
    // diversity, never corpus size
    val brep = flagged.filter(!col("qfail") && !col("is_exact"))
      .groupBy(col("h")).agg(min(col("doc_id")).as("rid"))
    val srep = d.filter(!isBatch).select(col("doc_id"), norm.as("h"))
      .groupBy(col("h")).agg(min(col("doc_id")).as("rid"))
    val sh = Dedup.docsWithShingles(s, dir)
      .select(col("doc_id"), col("sh"), col("hv"))
    def sig(rep: DataFrame) = Dedup.minhashSigOf(
      sh.join(rep.select(col("rid")), col("doc_id") === col("rid"))
        .select(col("doc_id"), col("sh"), col("hv")))
    def bands(sg: DataFrame, out: String) = {
      val keys = (0 until 4).map(b => struct(lit(b).as("band"),
        concat_ws("_", col(s"m${2 * b}"), col(s"m${2 * b + 1}")).as("key")))
      sg.select(col("doc_id").as(out), explode(array(keys: _*)).as("bk"))
        .select(col(out), col("bk.band").as("band"), col("bk.key").as("key"))
    }
    val cand = bands(sig(brep), "bd").join(bands(sig(srep), "sd"),
        Seq("band", "key"))
      .select(col("bd"), col("sd")).distinct()
    val inter = expr("graft_icount(sh1, sh2)") // count-only intersect (r14)
    val ver = cand
      .join(sh.select(col("doc_id").as("bd"), col("sh").as("sh1")), Seq("bd"))
      .join(sh.select(col("doc_id").as("sd"), col("sh").as("sh2")), Seq("sd"))
      .filter(inter.cast("double") /
        (size(col("sh1")) + size(col("sh2")) - inter).cast("double") >= 0.8)
      .select(col("bd")).distinct()
    val nearH = brep.join(ver, col("rid") === col("bd"), "left_semi")
      .select(col("h"), lit(true).as("is_near"))
    val admitted = !col("qfail") && !col("is_exact") && col("is_near").isNull
    flagged.join(nearH, Seq("h"), "left")
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_batch"),
        sum(when(col("qfail"), 1L).otherwise(0L)).as("n_quality_rejected"),
        sum(when(!col("qfail") && col("is_exact"), 1L).otherwise(0L))
          .as("n_exact_dup"),
        sum(when(!col("qfail") && !col("is_exact") &&
          col("is_near").isNotNull, 1L).otherwise(0L)).as("n_near_dup"),
        sum(when(admitted, 1L).otherwise(0L)).as("n_admitted"),
        sum(when(admitted, col("n_tok")).otherwise(0L)).as("admitted_tokens"))
      .psort(col("source"))
  }

  private val p08Sql: String = {
    val stopList = TextOps.stopwords.map(w => s"'$w'").mkString("[", ",", "]")
    val toks = "REGEXP_SPLIT_TO_ARRAY(text, ' +')"
    val nTok = s"LEN($toks)"
    val nStop = s"LEN(LIST_FILTER($toks, w -> LIST_CONTAINS($stopList, w)))"
    val nPunct =
      "(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[^A-Za-z0-9 ]', '', 'g')))"
    val meanTokLen =
      s"(LIST_SUM(LIST_TRANSFORM($toks, w -> LENGTH(w)))::DOUBLE / $nTok::DOUBLE)"
    val qfail = s"(LENGTH(text) < 50 OR $nTok < 10" +
      s" OR $nStop::DOUBLE / $nTok::DOUBLE < 0.01" +
      s" OR $nPunct::DOUBLE / LENGTH(text)::DOUBLE > 0.3" +
      s" OR $meanTokLen > 12.0 OR $meanTokLen < 2.0)"
    val normH = "MD5(REGEXP_REPLACE(LOWER(text), ' +', ' ', 'g'))"
    val sigCols = (0 until 8)
      .map(i => s"${Dedup.minhashSql(i)} AS m$i").mkString(",\n   ")
    def bandRows(src: String) = (0 until 4).map { b =>
      s"SELECT doc_id, $b AS band, m${2 * b} || '_' || m${2 * b + 1} AS key FROM $src"
    }.mkString("\n  UNION ALL ")
    s"""WITH docs AS (${Dedup.docsShSql}),
       |b0 AS (
       |  SELECT doc_id, source, $normH AS h, $qfail AS qfail, $nTok AS n_tok
       |  FROM documents WHERE (('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT) % 10 = 7),
       |storeh AS (
       |  SELECT DISTINCT $normH AS h FROM documents WHERE (('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT) % 10 <> 7),
       |b1 AS (
       |  SELECT b0.*, (h IN (SELECT h FROM storeh)) AS is_exact FROM b0),
       |brep AS (
       |  SELECT h, MIN(doc_id) AS rid FROM b1
       |  WHERE NOT qfail AND NOT is_exact GROUP BY h),
       |srep AS (
       |  SELECT $normH AS h, MIN(doc_id) AS rid
       |  FROM documents WHERE (('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT) % 10 <> 7 GROUP BY 1),
       |bsig AS (
       |  SELECT d.doc_id, d.sh,
       |   $sigCols
       |  FROM docs d JOIN brep r ON d.doc_id = r.rid),
       |ssig AS (
       |  SELECT d.doc_id, d.sh,
       |   $sigCols
       |  FROM docs d JOIN srep r ON d.doc_id = r.rid),
       |bbands AS (
       |  ${bandRows("bsig")}),
       |sbands AS (
       |  ${bandRows("ssig")}),
       |cand AS (
       |  SELECT DISTINCT b.doc_id AS bd, s.doc_id AS sd
       |  FROM bbands b JOIN sbands s ON b.band = s.band AND b.key = s.key),
       |ver AS (
       |  SELECT DISTINCT c.bd FROM cand c
       |  JOIN docs s1 ON c.bd = s1.doc_id
       |  JOIN docs s2 ON c.sd = s2.doc_id
       |  WHERE ${Dedup.jaccardSql} >= 0.8),
       |nearh AS (SELECT r.h FROM brep r JOIN ver v ON r.rid = v.bd),
       |cls AS (
       |  SELECT b1.*, (h IN (SELECT h FROM nearh)) AS is_near FROM b1)
       |SELECT source, COUNT(*) AS n_batch,
       |  CAST(SUM(CASE WHEN qfail THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_quality_rejected,
       |  CAST(SUM(CASE WHEN NOT qfail AND is_exact THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_exact_dup,
       |  CAST(SUM(CASE WHEN NOT qfail AND NOT is_exact AND is_near
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup,
       |  CAST(SUM(CASE WHEN NOT qfail AND NOT is_exact AND NOT is_near
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
       |  CAST(SUM(CASE WHEN NOT qfail AND NOT is_exact AND NOT is_near
       |    THEN n_tok ELSE 0 END) AS BIGINT) AS admitted_tokens
       |FROM cls GROUP BY source ORDER BY source""".stripMargin
  }

  // ---- p09: streaming near-dup admission against the persisted store -----
  /** p09: d27's admission gate moved to the ARRIVAL path — the shape a
    * crawl ingests with when shards land continuously instead of daily:
    * documents arrive through a real file-source stream in multiple
    * micro-batches (maxFilesPerTrigger=2 over 4 staged files); each batch
    * pins executor-side, re-binds to the engine session (p04's pattern),
    * computes its minhash bands O(batch), probes the SAME persisted
    * bucketed band store d27 serves (build-once, serve-many — zero
    * store-side exchange), verifies candidates by exact jaccard >= 0.8,
    * and appends its verdicts to the landing sink. Verdicts depend only on
    * (content, store), so the output is micro-batch-partition independent
    * and must equal the batch path's bit-for-bit — the oracle is d27's
    * replay with the source column carried.
    *
    * Scale shape: per batch everything is O(batch) except the store probe
    * (sort-merge against the bucketed table, exchange-free on the store
    * side) and the candidate-proportional verify; no state store needed —
    * the persisted index IS the state. */
  private val p09: Q = (s, dir) => {
    val store = Dedup.d27Store(s, dir)
    val corpusSh = Dedup.docsWithShingles(s, dir)
      .select(col("doc_id").as("oid"), col("sh").as("sh2"))
    val arriving = t(s, dir, "documents")
      .filter(col("doc_id") % 10 === 3)
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), col("source"), col("text"))
    val stream = graft.streaming.StreamingOps
      .stageAndStream(arriving, numFiles = 4, maxFilesPerTrigger = Some(2))
    val landDir = java.nio.file.Files.createTempDirectory("graft_p09_land_")
    graft.streaming.StreamingOps.trackTempDir(landDir, eager = true)
    graft.streaming.StreamingOps.applyBatches(stream) { (batch, _) =>
      val pinned = batch.localCheckpoint(true)
      val bound = org.apache.spark.sql.GraftPlanBridge
        .ofRows(s, pinned.queryExecution.analyzed)
      val bd = bound.select(col("doc_id"), col("source"),
          expr("graft_shingles(text)").as("sh"))
        .select(col("doc_id"), col("source"), col("sh"),
          expr("graft_md5i_array(sh)").as("hv"))
        .persist()
      try {
        val sig = Dedup.minhashSigOf(
          bd.select(col("doc_id"), col("sh"), col("hv")))
        val bands = Dedup.bandKeyCol("doc_id", "nid")(sig)
        val cand = store.hint("merge").join(bands, Seq("bkey"))
          .select(col("nid"), col("oid")).distinct()
        val matches = cand
          .join(bd.select(col("doc_id").as("nid"), col("sh").as("sh1")),
            Seq("nid"))
          .join(corpusSh, Seq("oid"))
          .filter(Dedup.jaccardCol >= 0.8)
          .groupBy(col("nid"))
          .agg(min(col("oid")).as("dup_of"), count(lit(1)).as("n_matches"))
        bd.select(col("doc_id"), col("source"))
          .join(matches.withColumnRenamed("nid", "doc_id"),
            Seq("doc_id"), "left")
          .select(col("doc_id"), col("source"),
            when(col("dup_of").isNotNull, "near_dup").otherwise("unique")
              .as("verdict"),
            col("dup_of"),
            coalesce(col("n_matches"), lit(0L)).as("n_matches"))
          .write.mode("append").parquet(landDir.toString)
      } finally { bd.unpersist(); pinned.unpersist() }
      ()
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, source STRING, verdict STRING, " +
        "dup_of BIGINT, n_matches BIGINT")
    s.read.schema(schema).parquet(landDir.toString)
      .psort(col("doc_id"))
  }

  private val p09Sql: String = {
    val sigCols = (0 until 8).map(i => s"${Dedup.minhashSql(i)} AS m$i")
      .mkString(",\n   ")
    val bandRows = (0 until 4).map { b =>
      s"SELECT doc_id, $b || '_' || m${2 * b} || '_' || m${2 * b + 1} AS bkey FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH docs AS (${Dedup.docsShSql}),
       |sig AS (SELECT doc_id, sh,
       |   $sigCols
       |  FROM docs),
       |bands AS (
       |  $bandRows),
       |store AS (SELECT doc_id AS oid, bkey FROM bands WHERE doc_id % 10 <> 3),
       |batch AS (SELECT doc_id AS nid, bkey FROM bands WHERE doc_id % 10 = 3),
       |cand AS (SELECT DISTINCT b.nid, s.oid
       |         FROM batch b JOIN store s USING (bkey)),
       |j AS (
       |  SELECT nid, oid,
       |    ${Dedup.jaccardSql} AS jaccard
       |  FROM cand
       |  JOIN docs s1 ON nid = s1.doc_id
       |  JOIN docs s2 ON oid = s2.doc_id),
       |m AS (SELECT nid, MIN(oid) AS dup_of,
       |        CAST(COUNT(*) AS BIGINT) AS n_matches
       |      FROM j WHERE jaccard >= 0.8 GROUP BY nid)
       |SELECT d.doc_id, d.source,
       |  CASE WHEN m.nid IS NOT NULL THEN 'near_dup' ELSE 'unique' END
       |    AS verdict,
       |  m.dup_of,
       |  COALESCE(m.n_matches, 0) AS n_matches
       |FROM (SELECT doc_id, source FROM documents
       |      WHERE doc_id % 10 = 3
       |        AND LEN(STRING_SPLIT(text, ' ')) >= 3) d
       |LEFT JOIN m ON d.doc_id = m.nid
       |ORDER BY doc_id""".stripMargin
  }

  // ---- p10: corpus snapshot diff (dataset-versioning manifest) ------------
  /** p10: the version-to-version diff every dataset release ships with —
    * given snapshot v1 and snapshot v2 of the corpus, classify every doc
    * by CONTENT DIGEST comparison (added / removed / changed / unchanged;
    * the engine never reads the planted version predicates) and emit the
    * per-source release manifest with the net token delta. This is the
    * "what changed between corpus v3 and v4" answer a training run's data
    * card records; d12's CDC is row-level merge, this is the release-level
    * rollup.
    *
    * Scale shape: two map-only digest scans, ONE doc_id full-outer
    * equi-join (co-partitionable at 100 TB), one per-source agg — no
    * windows, no pairs. */
  private val p10: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    val v1 = d.filter(col("doc_id") % 10 =!= 6)
      .select(col("doc_id"), col("source").as("source1"),
        md5(col("text")).as("dg1"),
        size(split(col("text"), " ")).cast("long").as("tok1"))
    val t2 = when(col("doc_id") % 17 === 3,
      concat(col("text"), lit(" v2 edited"))).otherwise(col("text"))
    val v2 = d.filter(col("doc_id") % 13 =!= 5)
      .select(col("doc_id"), col("source").as("source2"),
        md5(t2).as("dg2"),
        size(split(t2, " ")).cast("long").as("tok2"))
    v1.join(v2, Seq("doc_id"), "full_outer")
      .select(coalesce(col("source1"), col("source2")).as("source"),
        when(col("dg1").isNull, "added")
          .when(col("dg2").isNull, "removed")
          .when(col("dg1") =!= col("dg2"), "changed")
          .otherwise("unchanged").as("status"),
        coalesce(col("tok1"), lit(0L)).as("tok1"),
        coalesce(col("tok2"), lit(0L)).as("tok2"))
      .groupBy(col("source")).agg(
        sum(when(col("status") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("status") === "removed", 1L).otherwise(0L))
          .as("n_removed"),
        sum(when(col("status") === "changed", 1L).otherwise(0L))
          .as("n_changed"),
        sum(when(col("status") === "unchanged", 1L).otherwise(0L))
          .as("n_unchanged"),
        sum(col("tok2") - col("tok1")).as("net_token_delta"))
      .psort(col("source"))
  }

  private val p10Sql =
    """WITH v1 AS (
      |  SELECT doc_id, source AS source1, MD5(text) AS dg1,
      |    CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS tok1
      |  FROM documents WHERE doc_id % 10 <> 6),
      |v2 AS (
      |  SELECT doc_id, source AS source2, MD5(t2) AS dg2,
      |    CAST(LEN(STRING_SPLIT(t2, ' ')) AS BIGINT) AS tok2
      |  FROM (SELECT doc_id, source,
      |          CASE WHEN doc_id % 17 = 3 THEN text || ' v2 edited'
      |               ELSE text END AS t2
      |        FROM documents WHERE doc_id % 13 <> 5)),
      |j AS (
      |  SELECT COALESCE(source1, source2) AS source,
      |    CASE WHEN dg1 IS NULL THEN 'added'
      |         WHEN dg2 IS NULL THEN 'removed'
      |         WHEN dg1 <> dg2 THEN 'changed'
      |         ELSE 'unchanged' END AS status,
      |    COALESCE(tok1, 0) AS tok1, COALESCE(tok2, 0) AS tok2
      |  FROM v1 FULL OUTER JOIN v2 USING (doc_id))
      |SELECT source,
      |  CAST(SUM(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_added,
      |  CAST(SUM(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_removed,
      |  CAST(SUM(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_changed,
      |  CAST(SUM(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_unchanged,
      |  CAST(SUM(tok2 - tok1) AS BIGINT) AS net_token_delta
      |FROM j GROUP BY source ORDER BY source""".stripMargin

  // ---- p11: nightly maintenance run (composed manifest) --------------------
  /** p11: the nightly maintenance job an index operator actually schedules,
    * composed from the three standing maintenance paths: ANN index
    * compaction (s35 — tombstones physically dropped, retrain triggers),
    * quantizer retrain migration (s36 — the rollover's stay/move split),
    * and dedup band-store compaction (d32 — takedown keys dropped, hot
    * bands). The output is the one-page pager manifest: per job the entity
    * count, removed rows, migrated rows, and fired flags. Each leg reuses
    * the SAME gated query (and its persisted indexes), so the composition
    * adds three k-row aggregations on top of build-once state.
    *
    * Scale shape: three bounded (k-row / 4-row) report aggregations over
    * already-persisted frames; the union is 3 rows. */
  private val p11: Q = (s, dir) => {
    val idx = Similarity.queries("s35_index_compaction")(s, dir)
      .agg(count(lit(1)).as("n_entities"),
        sum(col("n_deleted")).as("n_removed"),
        sum(when(col("retrain"), 1L).otherwise(0L)).as("n_flagged"))
      .select(lit("index_compaction").as("job"), col("n_entities"),
        col("n_removed"), lit(0L).as("n_moved"), col("n_flagged"))
    val mig = Similarity.queries("s36_retrain_migration")(s, dir)
      .agg(count(lit(1)).as("n_entities"),
        sum(col("n_moved")).as("n_moved"),
        sum(when(col("stay_permille") < 500, 1L).otherwise(0L))
          .as("n_flagged"))
      .select(lit("quantizer_retrain").as("job"), col("n_entities"),
        lit(0L).as("n_removed"), col("n_moved"), col("n_flagged"))
    val store = Dedup.queries("d32_store_compaction")(s, dir)
      .agg(count(lit(1)).as("n_entities"),
        sum(col("n_deleted")).as("n_removed"),
        sum(when(col("hot"), 1L).otherwise(0L)).as("n_flagged"))
      .select(lit("band_store_compaction").as("job"), col("n_entities"),
        col("n_removed"), lit(0L).as("n_moved"), col("n_flagged"))
    store.unionAll(idx).unionAll(mig).psort(col("job"))
  }

  private lazy val p11Sql: String =
    s"""SELECT 'band_store_compaction' AS job,
       |  CAST(COUNT(*) AS BIGINT) AS n_entities,
       |  CAST(SUM(n_deleted) AS BIGINT) AS n_removed,
       |  CAST(0 AS BIGINT) AS n_moved,
       |  CAST(SUM(CASE WHEN hot THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
       |FROM (${Dedup.d32Sql}) t1
       |UNION ALL
       |SELECT 'index_compaction' AS job,
       |  CAST(COUNT(*) AS BIGINT) AS n_entities,
       |  CAST(SUM(n_deleted) AS BIGINT) AS n_removed,
       |  CAST(0 AS BIGINT) AS n_moved,
       |  CAST(SUM(CASE WHEN retrain THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_flagged
       |FROM (${Similarity.s35Sql}) t2
       |UNION ALL
       |SELECT 'quantizer_retrain' AS job,
       |  CAST(COUNT(*) AS BIGINT) AS n_entities,
       |  CAST(0 AS BIGINT) AS n_removed,
       |  CAST(SUM(n_moved) AS BIGINT) AS n_moved,
       |  CAST(SUM(CASE WHEN stay_permille < 500 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_flagged
       |FROM (${Similarity.s36Sql}) t3
       |ORDER BY job""".stripMargin

  // ---- p12: user-erasure pipeline + certificate ----------------------------
  /** p12: the GDPR/user-deletion job every data platform must run — given
    * the takedown list (user_id % 19 == 7; document ownership modeled as
    * owner = doc_id % 50), physically LAND the erased copies of both
    * tables (parquet write + read-back, the p01 discipline: certify the
    * output that shipped, not the plan that produced it) and emit the
    * erasure certificate: per table the rows before, removed, after, and
    * the residual count of takedown-matching rows in the LANDED output —
    * the number an auditor requires to be zero.
    *
    * Scale shape: two anti-filter scans + parquet rewrites (map-only,
    * linear), four 1-row aggregations; the certificate is 2 rows. */
  private val p12: Q = (s, dir) => {
    val isTakU = (c: org.apache.spark.sql.Column) => c % 19 === 7
    val ev = t(s, dir, "events")
    val docs = t(s, dir, "documents")
    val land = java.nio.file.Files.createTempDirectory("graft_p12_land_")
    graft.streaming.StreamingOps.trackTempDir(land, eager = true)
    ev.filter(!isTakU(col("user_id")))
      .write.mode("overwrite").parquet(s"$land/events")
    docs.filter(!isTakU(col("doc_id") % 50))
      .write.mode("overwrite").parquet(s"$land/documents")
    val evLanded = s.read.parquet(s"$land/events")
    val docLanded = s.read.parquet(s"$land/documents")
    val evRow = ev.agg(count(lit(1)).as("rows_before"),
        sum(when(isTakU(col("user_id")), 1L).otherwise(0L))
          .as("rows_removed"))
      .crossJoin(broadcast(evLanded.agg(count(lit(1)).as("rows_after"),
        sum(when(isTakU(col("user_id")), 1L).otherwise(0L)).as("residual"))))
      .select(lit("events").as("tbl"), col("rows_before"),
        col("rows_removed"), col("rows_after"),
        coalesce(col("residual"), lit(0L)).as("residual"))
    val docRow = docs.agg(count(lit(1)).as("rows_before"),
        sum(when(isTakU(col("doc_id") % 50), 1L).otherwise(0L))
          .as("rows_removed"))
      .crossJoin(broadcast(docLanded.agg(count(lit(1)).as("rows_after"),
        sum(when(isTakU(col("doc_id") % 50), 1L).otherwise(0L))
          .as("residual"))))
      .select(lit("documents").as("tbl"), col("rows_before"),
        col("rows_removed"), col("rows_after"),
        coalesce(col("residual"), lit(0L)).as("residual"))
    docRow.unionAll(evRow).psort(col("tbl"))
  }

  private val p12Sql =
    """SELECT 'documents' AS tbl,
      |  CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS rows_before,
      |  CAST((SELECT COUNT(*) FROM documents WHERE doc_id % 50 % 19 = 7)
      |    AS BIGINT) AS rows_removed,
      |  CAST((SELECT COUNT(*) FROM documents WHERE doc_id % 50 % 19 <> 7)
      |    AS BIGINT) AS rows_after,
      |  CAST(0 AS BIGINT) AS residual
      |UNION ALL
      |SELECT 'events' AS tbl,
      |  CAST((SELECT COUNT(*) FROM events) AS BIGINT),
      |  CAST((SELECT COUNT(*) FROM events WHERE user_id % 19 = 7)
      |    AS BIGINT),
      |  CAST((SELECT COUNT(*) FROM events WHERE user_id % 19 <> 7)
      |    AS BIGINT),
      |  CAST(0 AS BIGINT)
      |ORDER BY tbl""".stripMargin

  // ---- p13: data-order reproducibility certificate --------------------------
  /** p13: the order certificate a reproducible training run ships — x43's
    * seeded deterministic shuffle fixes WHAT order the docs stream in;
    * this certifies per shard that two independently-built runs stream
    * the IDENTICAL order, via an ORDER-DEPENDENT digest (d33's checksum
    * is deliberately order-independent; this is its complement):
    * sum over rank r of ((r mod M) * (digest(doc) mod M)) mod M, M the
    * prime 1000003 — each term is bounded by M so the BIGINT running sum
    * provably never wraps on either engine, and swapping ANY two docs'
    * positions flips the digest (spec-proven). first/last doc ids anchor
    * human debugging when digests diverge.
    *
    * Scale shape: map-only order keys, one per-shard rank window
    * (partition-parallel across shards), one per-shard agg. */
  private val p13: Q = (s, dir) => {
    val M = 1000003L
    val ok = md5i(concat(lit("p13:"), col("doc_id").cast("string")))
    val dgm = md5i(concat(col("doc_id").cast("string"), lit("|"),
      col("text"))) % M
    val keyed = t(s, dir, "documents")
      .select(col("doc_id"), ok.as("ok"), dgm.as("dgm"))
      .withColumn("shard", col("ok") % 4)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("ok"), col("doc_id"))
    keyed.withColumn("r", row_number().over(w).cast("long"))
      .groupBy(col("shard")).agg(
        count(lit(1)).as("n_docs"),
        sum(expr(s"(r % $M) * dgm % $M")).as("raw"),
        expr("min_by(doc_id, r)").as("first_doc"),
        expr("max_by(doc_id, r)").as("last_doc"))
      .select(col("shard"), col("n_docs"),
        (col("raw") % M).as("order_digest"),
        col("first_doc"), col("last_doc"))
      .psort(col("shard"))
  }

  private val p13Sql = {
    val M = 1000003L
    s"""WITH keyed AS (
       |  SELECT doc_id,
       |    ${graft.queries.QueryHelpers.md5iSql(
             "'p13:' || CAST(doc_id AS VARCHAR)")} AS ok,
       |    ${graft.queries.QueryHelpers.md5iSql(
             "CAST(doc_id AS VARCHAR) || '|' || text")} % $M AS dgm
       |  FROM documents),
       |ranked AS (
       |  SELECT ok % 4 AS shard, doc_id, dgm,
       |    ROW_NUMBER() OVER (PARTITION BY ok % 4
       |      ORDER BY ok, doc_id) AS r
       |  FROM keyed)
       |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM((r % $M) * dgm % $M) % $M AS BIGINT) AS order_digest,
       |  CAST(ARG_MIN(doc_id, r) AS BIGINT) AS first_doc,
       |  CAST(ARG_MAX(doc_id, r) AS BIGINT) AS last_doc
       |FROM ranked GROUP BY shard ORDER BY shard""".stripMargin
  }

  // ---- p14: partition backfill with versioned atomic swap ----------------
  /** p14: the partition-backfill pipeline a lake runs when late data lands
    * for ONE partition: v1 of the dataset is written hive-partitioned by
    * month missing the late slice (o_orderkey % 10 = 0); the backfill
    * recomputes ONLY the stale month — the earliest month carrying late
    * rows — writes it under a v2 root, and the swap is a manifest pointer
    * flip (here: per-partition version routing in the read path). Every
    * other partition's v1 files are untouched: O(1 partition) recompute +
    * O(partitions) manifest, never a full rewrite — the only backfill
    * shape that survives 100 TB. The certificate reads back THROUGH the
    * routing and reports per-month row counts, exact decimal revenue, and
    * which version served it; the oracle replays the expected final state
    * from the raw table, so a routing bug (stale month served from v1, or
    * a fresh month clobbered by v2) diverges. */
  private val p14: Q = (s, dir) => {
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"))
    val late = col("o_orderkey") % 10 === 0
    val target = o.filter(late).agg(min(col("month")).as("m"))
      .collect()(0).getString(0)
    val base = java.nio.file.Files.createTempDirectory("graft_p14_")
    graft.streaming.StreamingOps.trackTempDir(base, eager = true)
    val v1 = base.resolve("v1").toString
    val v2 = base.resolve("v2").toString
    // r13: cluster by the partition column BEFORE the hive-partitioned
    // write (guide §6 — the Iceberg hash distribution-mode shape): the
    // orders scan is one input split, so the unclustered dynamic-partition
    // write ran as ONE task sorting and emitting all ~82 month files
    // sequentially (measured 2.1 s of the query's 3.2 s); hash-clustering
    // on month across defaultParallelism tasks writes the months in
    // parallel and still lands O(months) files. The partition count is
    // EXPLICIT (cores-adaptive, not hard-coded) because a keyed
    // repartition with no count is AQE-coalescible — at this input size
    // AQE folds it back to one task and the win vanishes (measured).
    o.filter(!late)
      .repartition(s.sparkContext.defaultParallelism, col("month"))
      .write.mode("overwrite").partitionBy("month").parquet(v1)
    // the backfill job: recompute ONLY the stale partition (one month —
    // nothing to parallelize by key), late rows in
    o.filter(col("month") === target)
      .write.mode("overwrite").partitionBy("month").parquet(v2)
    // manifest-routed read: partition pruning plays the pointer table —
    // the target month serves from v2, everything else from v1
    val served = s.read.parquet(v1)
      .filter(col("month") =!= target)
      .withColumn("served_by", lit("v1"))
      .unionByName(s.read.parquet(v2).withColumn("served_by", lit("v2")))
    served.groupBy(col("month"), col("served_by"))
      .agg(count(lit(1)).as("n_rows"),
        dsumr(dec2(col("o_totalprice"))).as("revenue"))
      .psort(col("month"))
  }

  private val p14Sql =
    """WITH o AS (
      |  SELECT o_orderkey, o_totalprice,
      |    STRFTIME(o_orderdate, '%Y-%m') AS month
      |  FROM orders),
      |tgt AS (SELECT MIN(month) AS m FROM o WHERE o_orderkey % 10 = 0)
      |SELECT month,
      |  CASE WHEN month = (SELECT m FROM tgt) THEN 'v2' ELSE 'v1' END
      |    AS served_by,
      |  COUNT(*) AS n_rows,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
      |    AS revenue
      |FROM o
      |WHERE o_orderkey % 10 <> 0 OR month = (SELECT m FROM tgt)
      |GROUP BY 1, 2 ORDER BY month""".stripMargin

  val queries: Map[String, Q] = Map(
    "p13_order_certificate" -> p13,
    "p14_partition_backfill" -> p14,
    "p12_user_erasure" -> p12,
    "p11_maintenance_run" -> p11,
    "p10_snapshot_diff" -> p10,
    "p09_stream_admission" -> p09,
    "p08_refresh_admission" -> p08,
    "p07_dlq_gate" -> p07,
    "p06_mix_builder" -> p06,
    "p05_eval_builder" -> p05,
    "p04_cdc_merge" -> p04,
    "p01_pipeline_e2e" -> p01,
    "p02_pipeline_streaming" -> p02)

  val oracleSql: Map[String, String] = Map(
    "p13_order_certificate" -> p13Sql,
    "p14_partition_backfill" -> p14Sql,
    "p12_user_erasure" -> p12Sql,
    "p11_maintenance_run" -> p11Sql,
    "p10_snapshot_diff" -> p10Sql,
    "p09_stream_admission" -> p09Sql,
    "p08_refresh_admission" -> p08Sql,
    "p07_dlq_gate" -> p07Sql,
    "p06_mix_builder" -> p06Sql,
    "p05_eval_builder" -> p05Sql,
    "p04_cdc_merge" -> p04Sql,
    "p01_pipeline_e2e" -> p01Sql,
    "p02_pipeline_streaming" -> p02Sql)
}
