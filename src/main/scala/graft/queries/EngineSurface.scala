package graft.queries

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.{Engine, Tables}
import graft.serde.WireFormat
import graft.sources.KafkaRecords
import graft.sources.KafkaRecords.SyntheticRecord
import QueryHelpers.{PresentationSort, Q}

/** Oracle-gated queries that exercise the ENGINE surface itself (ingest,
  * COPY sink, union accessors) rather than the delegated relational layer —
  * the two categories VERDICT r3 flagged as spec-only.
  *
  * q75: COPY round-trip — the engine's `COPY (SELECT …) TO … (FORMAT
  * parquet, PARTITION_BY …)` writes a hive layout, the query re-reads it,
  * and the oracle runs the equivalent SELECT directly in DuckDB: any loss
  * or corruption introduced by the sink (types, partition-column encoding,
  * nulls) breaks the hash match. (reference sink: README.md:119-123)
  *
  * q76: Avro multi-branch union e2e — deterministic records with a
  * `["null","string","int"]` union field are Avro-encoded, wire-framed,
  * ingested through the engine (registry + decode + tagged-struct
  * convention, SURVEY §7.3), then read back via `union_tag` /
  * `union_extract`; the oracle builds the same unions with DuckDB's native
  * UNION type and its own union_tag/union_extract.
  * (reference: KwackEngine.java union handling + DuckDB union functions)
  */
object EngineSurface {

  private def q75(s: SparkSession, dir: String): DataFrame = {
    val out = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_copy_rt_" + Integer.toHexString(dir.hashCode)).getAbsolutePath
    val engine = new Engine(s)
    engine.sql(
      s"""COPY (SELECT o_orderkey, o_orderpriority, o_totalprice, o_orderdate
         |      FROM '$dir/orders.parquet' WHERE o_orderkey <= 1000)
         |TO '$out' (FORMAT parquet, PARTITION_BY (o_orderpriority))""".stripMargin)
    engine.close()
    // re-read the hive layout; partition column comes back from dir names
    s.read.parquet(out)
      .select("o_orderkey", "o_orderpriority", "o_totalprice", "o_orderdate")
  }

  private val unionSchemaText =
    """{"type":"record","name":"U","fields":[
      |{"name":"id","type":"int"},
      |{"name":"u","type":["null","string","int"]}]}""".stripMargin

  private def avroEncode(schema: Schema, id: Int, u: Any): Array[Byte] = {
    val rec = new GenericData.Record(schema)
    rec.put("id", id)
    rec.put("u", u)
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericData.Record](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  private def q76(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val engine = new Engine(s)
    val topic = "union-fixture"
    val schema = new Schema.Parser().parse(unionSchemaText)
    val sid = engine.registry.register(s"$topic-value", "AVRO", schema.toString)
    val fixture: Seq[(Int, Any)] = Seq(
      (1, "alpha"), (2, Int.box(7)), (3, null),
      (4, "beta"), (5, Int.box(-42)), (6, ""))
    val records = fixture.zipWithIndex.map { case ((id, u), i) =>
      SyntheticRecord(null, WireFormat.frame(sid, avroEncode(schema, id, u)),
        topic, 0, i.toLong, 1700000000000L + i)
    }
    val tables = engine.init(
      Seq(Engine.TopicSpec(topic, rowAttrs = Set.empty)),
      _ => KafkaRecords.synthetic(s, records))
    val df = tables(topic).selectExpr(
      "id",
      "union_tag(u) AS tag",
      "union_extract(u, 'u1') AS sval",
      "union_extract(u, 'u2') AS ival")
    engine.close()
    df
  }

  /** q77: DuckDB FROM-first syntax through the engine's rewrite
    * (Engine.rewriteFromFirst); the oracle runs the IDENTICAL query text —
    * DuckDB parses FROM-first natively, so any rewrite drift (clause
    * reordering, lost WHERE) breaks the hash. */
  private def q77(s: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(s)
    try engine.sql(
      s"""FROM '$dir/lineitem.parquet'
         |SELECT l_returnflag, count(*) AS n,
         |       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty
         |WHERE l_orderkey <= 1000
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    finally engine.close()
  }

  private val q77Sql =
    """FROM lineitem
      |SELECT l_returnflag, count(*) AS n,
      |       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty
      |WHERE l_orderkey <= 1000
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q78: DuckDB COLUMNS('regex') projection expansion
    * (Engine.expandColumnsRegex) — again the oracle runs the same text via
    * DuckDB's native COLUMNS, pinning the search-semantics regex match and
    * the expansion order (schema order, both engines). */
  private def q78(s: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(s)
    try engine.sql(
      s"""SELECT l_orderkey, l_linenumber, COLUMNS('^l_(quantity|extendedprice|discount)$$')
         |FROM '$dir/lineitem.parquet' WHERE l_orderkey <= 100
         |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    finally engine.close()
  }

  private val q78Sql =
    """SELECT l_orderkey, l_linenumber, COLUMNS('^l_(quantity|extendedprice|discount)$')
      |FROM lineitem WHERE l_orderkey <= 100
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** q81: DuckDB `ASOF JOIN` SQL syntax through the engine's rewrite
    * (Engine.rewriteAsofJoin → the native sort-merge AsofJoinExec);
    * the oracle runs a native DuckDB ASOF JOIN of the same shape. Inner
    * form on purpose — q34/q51 already gate the LEFT semantics through the
    * Scala API, so this pins both the SQL spelling and the
    * unmatched-row-dropping inner variant. Right side deduped per
    * (key, ts) for determinism (the q34 convention). */
  private def q81(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    Tables.load(s, dir, "events")
      .filter(col("event_id") <= 300)
      .select("event_id", "user_id", "ts")
      .createOrReplaceTempView("q81_events")
    val w = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    // r13: cluster on the asof key once — window + asof share the exchange
    Tables.load(s, dir, "orders").repartition(col("o_custkey"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("o_custkey").as("user_id"), col("o_orderdate"),
        col("o_orderkey"), round(col("o_totalprice"), 2).as("o_price"))
      .createOrReplaceTempView("q81_orders")
    val engine = new Engine(s)
    try engine.sql(
      """SELECT e.event_id, e.user_id, e.ts, d.o_orderkey, d.o_price
        |FROM q81_events e ASOF JOIN q81_orders d
        |ON e.user_id = d.user_id AND e.ts >= d.o_orderdate
        |ORDER BY e.event_id""".stripMargin)
    finally engine.close()
  }

  private val q81Sql =
    """WITH dedup AS (
      |  SELECT o_custkey AS user_id, o_orderdate, o_orderkey,
      |         ROUND(o_totalprice, 2) AS o_price
      |  FROM orders QUALIFY ROW_NUMBER() OVER (
      |    PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) = 1)
      |SELECT e.event_id, e.user_id, e.ts, d.o_orderkey, d.o_price
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_id <= 300) e
      |ASOF JOIN dedup d ON e.user_id = d.user_id AND e.ts >= d.o_orderdate
      |ORDER BY e.event_id""".stripMargin

  /** q99: FORWARD (strict) ASOF through the engine's SQL spelling —
    * `ON e.ts < d.next_ts` picks the user's strictly-next event, LEFT form
    * keeps unmatched rows. Exercises the direction dispatch
    * Engine.rewriteAsofJoin lowers onto the native exec via negated-micros
    * reduction; q98 gates the same semantics through the Scala API, so this
    * pins the SQL surface. Right side deduped per (user, ts), q34
    * convention. */
  private def q99(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    Tables.load(s, dir, "events")
      .filter(col("event_id") <= 300)
      .select("event_id", "user_id", "ts")
      .createOrReplaceTempView("q99_events")
    val w = Window.partitionBy(col("user_id"), col("next_ts"))
      .orderBy(col("next_event").desc)
    // r13: cluster on the asof key once — window + asof share the exchange
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("ts").as("next_ts"),
        col("event_id").as("next_event"), col("event_type").as("next_type"))
      .repartition(col("user_id"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .drop("rn")
      .createOrReplaceTempView("q99_next")
    val engine = new Engine(s)
    try engine.sql(
      """SELECT e.event_id, e.user_id, e.ts, d.next_event, d.next_type
        |FROM q99_events e ASOF LEFT JOIN q99_next d
        |ON e.user_id = d.user_id AND e.ts < d.next_ts
        |ORDER BY e.event_id""".stripMargin)
    finally engine.close()
  }

  private val q99Sql =
    """WITH dedup AS (
      |  SELECT user_id, ts AS next_ts, event_id AS next_event,
      |         event_type AS next_type
      |  FROM events QUALIFY ROW_NUMBER() OVER (
      |    PARTITION BY user_id, ts ORDER BY event_id DESC) = 1)
      |SELECT e.event_id, e.user_id, e.ts, d.next_event, d.next_type
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_id <= 300) e
      |ASOF LEFT JOIN dedup d ON e.user_id = d.user_id AND e.ts < d.next_ts
      |ORDER BY e.event_id""".stripMargin

  /** q82: DuckDB `USING SAMPLE N ROWS` through the engine's rewrite
    * (Engine.rewriteUsingSample -> Spark TABLESAMPLE; the seeded
    * REPEATABLE form -> deterministic-random top-N by rand(seed)). The
    * sampled rows differ per engine by construction, so the gate pins the
    * cross-engine invariant of row-count sampling: the exact sample size,
    * for both the unseeded and the seeded draw. The oracle runs DuckDB's
    * native USING SAMPLE of the same shapes. */
  private def q82(s: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(s)
    try {
      val a = engine.sql(
        s"SELECT count(*) AS n FROM '$dir/orders.parquet' USING SAMPLE 200 ROWS")
      val b = engine.sql(
        s"SELECT count(*) AS n_rep FROM '$dir/orders.parquet' " +
          "USING SAMPLE 200 ROWS REPEATABLE (42)")
      a.crossJoin(b)
    } finally engine.close()
  }

  private val q82Sql =
    """SELECT * FROM
      |(SELECT count(*) AS n FROM (SELECT * FROM orders USING SAMPLE 200 ROWS)),
      |(SELECT count(*) AS n_rep FROM
      |  (SELECT * FROM orders USING SAMPLE reservoir(200 ROWS) REPEATABLE (42)))""".stripMargin

  /** q83: DuckDB statement-form `PIVOT ... ON ... USING ... GROUP BY`
    * through Engine.pivot (DataFrame two-pass pivot); the oracle runs
    * DuckDB's native PIVOT statement — discovered ON values, implicit
    * column naming, and cell values must all line up. */
  private def q83(s: SparkSession, dir: String): DataFrame = {
    Tables.register(s, dir)
    val engine = new Engine(s)
    try engine.sql(
        "PIVOT orders ON o_orderpriority USING count(*) GROUP BY o_orderstatus")
      .orderBy(col("o_orderstatus"))
    finally engine.close()
  }

  private val q83Sql =
    """PIVOT orders ON o_orderpriority USING count(*) GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** q84: DuckDB statement-form `UNPIVOT ... ON ... INTO NAME ... VALUE`
    * through the engine's lowering to Spark's UNPIVOT clause; the oracle
    * runs DuckDB's native UNPIVOT statement (both drop NULL measures). */
  private def q84(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.round
    Tables.load(s, dir, "orders").filter(col("o_orderkey") <= 500)
      .select(col("o_orderkey"),
        round(col("o_totalprice"), 2).cast("double").as("total"),
        (col("o_orderkey") * 2).cast("double").as("dblkey"))
      .createOrReplaceTempView("q84_orders")
    val engine = new Engine(s)
    try engine.sql(
        "UNPIVOT q84_orders ON total, dblkey INTO NAME metric VALUE v")
      .orderBy(col("o_orderkey"), col("metric"))
    finally engine.close()
  }

  private val q84Sql =
    """WITH q84_orders AS (
      |  SELECT o_orderkey,
      |         CAST(ROUND(o_totalprice, 2) AS DOUBLE) AS total,
      |         CAST(o_orderkey * 2 AS DOUBLE) AS dblkey
      |  FROM orders WHERE o_orderkey <= 500)
      |UNPIVOT q84_orders ON total, dblkey INTO NAME metric VALUE v
      |ORDER BY o_orderkey, metric""".stripMargin

  /** q86: CSV sink round-trip — q75's contract for the engine's
    * `COPY … TO … (FORMAT csv)` path (Engine.writeTo): values survive the
    * text serialization (header row, decimal rendering, ISO dates) and cast
    * back to their exact originals. Read-back casts are explicit — CSV
    * carries no types, so the round-trip pins the TEXT form each type
    * writes. The oracle runs the inner SELECT directly. */
  private def q86(s: SparkSession, dir: String): DataFrame = {
    val out = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_copy_csv_" + Integer.toHexString(dir.hashCode)).getAbsolutePath
    val engine = new Engine(s)
    engine.sql(
      s"""COPY (SELECT o_orderkey, o_orderpriority,
         |      CAST(ROUND(o_totalprice, 2) AS DECIMAL(12,2)) AS price,
         |      o_orderdate
         |      FROM '$dir/orders.parquet' WHERE o_orderkey <= 1000)
         |TO '$out' (FORMAT csv)""".stripMargin)
    engine.close()
    s.read.option("header", "true").csv(out)
      .select(col("o_orderkey").cast("long"),
        col("o_orderpriority"),
        col("price").cast("decimal(12,2)").cast("double").as("price"),
        col("o_orderdate").cast("timestamp"))
  }

  private val q86Sql =
    """SELECT o_orderkey, o_orderpriority,
      |       CAST(ROUND(o_totalprice, 2) AS DOUBLE) AS price, o_orderdate
      |FROM orders WHERE o_orderkey <= 1000""".stripMargin

  /** q87: JSON sink round-trip — the same contract for `FORMAT json`
    * (line-delimited JSON, the reference's primary output format:
    * README.md:119-123). Schema is pinned on read (no inference pass), so
    * the gate covers the writer's field naming, number rendering, and date
    * encoding. */
  private def q87(s: SparkSession, dir: String): DataFrame = {
    val out = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_copy_json_" + Integer.toHexString(dir.hashCode)).getAbsolutePath
    val engine = new Engine(s)
    engine.sql(
      s"""COPY (SELECT o_orderkey, o_orderpriority,
         |      CAST(ROUND(o_totalprice, 2) AS DECIMAL(12,2)) AS price,
         |      o_orderdate
         |      FROM '$dir/orders.parquet' WHERE o_orderkey <= 1000)
         |TO '$out' (FORMAT json)""".stripMargin)
    engine.close()
    s.read.schema("o_orderkey BIGINT, o_orderpriority STRING, " +
        "price DECIMAL(12,2), o_orderdate TIMESTAMP").json(out)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("price").cast("double").as("price"), col("o_orderdate"))
  }

  private val q87Sql = q86Sql

  /** q107: named `WINDOW` clause — one window definition shared by several
    * window functions (the dialect form DuckDB and Spark both parse
    * natively; the engine passes it through with the file-scan sugar).
    * Running total in exact DECIMAL; per-customer partitions, never
    * global. */
  private def q107(s: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(s)
    try engine.sql(
        s"""SELECT o_custkey, o_orderkey,
           |  ROW_NUMBER() OVER w AS rn,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w
           |    AS DOUBLE) AS run_total
           |FROM '$dir/orders.parquet' WHERE o_orderkey <= 2000
           |WINDOW w AS (PARTITION BY o_custkey
           |             ORDER BY o_orderdate, o_orderkey)
           |ORDER BY o_custkey, rn""".stripMargin)
    finally engine.close()
  }

  private val q107Sql =
    """SELECT o_custkey, o_orderkey,
      |  ROW_NUMBER() OVER w AS rn,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w
      |    AS DOUBLE) AS run_total
      |FROM orders WHERE o_orderkey <= 2000
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, rn""".stripMargin

  /** q110: `UPDATE ... SET ... FROM ... WHERE` (the joined update, round
    * 7): per-nation supplier counts join INTO a nation summary table —
    * matches take the joined expression, unmatched rows pass through.
    * Matches are unique by construction (source aggregated on the join
    * key), so the winner choice is moot and the gate is deterministic.
    * The oracle replays the join-update as a LEFT JOIN projection. */
  private def q110(s: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(s)
    try {
      engine.sql(s"CREATE OR REPLACE TABLE upd_nation AS " +
        s"SELECT n_nationkey, n_name, 0L AS n_suppliers " +
        s"FROM '$dir/nation.parquet'")
      engine.sql(s"CREATE OR REPLACE TABLE upd_counts AS " +
        s"SELECT s_nationkey, count(*) AS c FROM '$dir/supplier.parquet' " +
        s"WHERE s_suppkey % 2 = 0 GROUP BY s_nationkey")
      engine.sql("UPDATE upd_nation SET n_suppliers = c.c FROM upd_counts c " +
        "WHERE upd_nation.n_nationkey = c.s_nationkey")
      engine.sql("SELECT n_nationkey, n_name, n_suppliers FROM upd_nation")
        .psort(col("n_nationkey"))
    } finally engine.close()
  }

  private val q110Sql =
    """SELECT n_nationkey, n_name,
      |  COALESCE(c.c, 0) AS n_suppliers
      |FROM nation LEFT JOIN (
      |  SELECT s_nationkey, count(*) AS c FROM supplier
      |  WHERE s_suppkey % 2 = 0 GROUP BY s_nationkey) c
      |ON n_nationkey = c.s_nationkey
      |ORDER BY n_nationkey""".stripMargin

  /** q111: `INSERT ... ON CONFLICT (key) DO UPDATE SET ... excluded...`
    * (round 7): a delta batch upserts into a customer balance table —
    * conflicting keys accumulate the incoming balance, fresh keys land as
    * new rows. The oracle replays the upsert as FULL-join arithmetic. */
  private def q111(s: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(s)
    try {
      engine.sql(s"CREATE OR REPLACE TABLE ups_cust AS " +
        s"SELECT c_custkey, c_name, CAST(c_acctbal AS DECIMAL(12,2)) " +
        s"AS bal FROM '$dir/customer.parquet' WHERE c_custkey <= 400")
      engine.sql(s"INSERT INTO ups_cust " +
        s"SELECT c_custkey, c_name, CAST(c_acctbal AS DECIMAL(12,2)) " +
        s"FROM '$dir/customer.parquet' " +
        s"WHERE c_custkey BETWEEN 301 AND 500 " +
        s"ON CONFLICT (c_custkey) DO UPDATE SET " +
        s"bal = ups_cust.bal + excluded.bal")
      engine.sql("SELECT c_custkey, c_name, CAST(bal AS DOUBLE) AS bal " +
        "FROM ups_cust").psort(col("c_custkey"))
    } finally engine.close()
  }

  private val q111Sql =
    """WITH base AS (
      |  SELECT c_custkey, c_name, CAST(c_acctbal AS DECIMAL(12,2)) AS bal
      |  FROM customer WHERE c_custkey <= 400),
      |delta AS (
      |  SELECT c_custkey, c_name, CAST(c_acctbal AS DECIMAL(12,2)) AS bal
      |  FROM customer WHERE c_custkey BETWEEN 301 AND 500)
      |SELECT c_custkey,
      |  COALESCE(b.c_name, d.c_name) AS c_name,
      |  CAST(CASE WHEN b.c_custkey IS NOT NULL AND d.c_custkey IS NOT NULL
      |    THEN b.bal + d.bal
      |    ELSE COALESCE(b.bal, d.bal) END AS DOUBLE) AS bal
      |FROM base b FULL JOIN delta d USING (c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** q112: `DELETE ... USING ... WHERE` (the joined delete, round 7):
    * orders whose customer sits in a churned slice are removed in ONE
    * left-anti theta join; the gate hashes the surviving snapshot. The
    * oracle replays the delete as an anti-join SELECT. */
  private def q112(s: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(s)
    try {
      engine.sql(s"CREATE OR REPLACE TABLE del_orders AS " +
        s"SELECT o_orderkey, o_custkey, " +
        s"CAST(o_totalprice AS DECIMAL(12,2)) AS price " +
        s"FROM '$dir/orders.parquet' WHERE o_orderkey <= 2000")
      engine.sql(s"CREATE OR REPLACE TABLE churned AS " +
        s"SELECT c_custkey FROM '$dir/customer.parquet' " +
        s"WHERE c_custkey % 5 = 2")
      engine.sql("DELETE FROM del_orders USING churned c " +
        "WHERE del_orders.o_custkey = c.c_custkey")
      engine.sql("SELECT o_orderkey, o_custkey, " +
        "CAST(price AS DOUBLE) AS price FROM del_orders")
        .psort(col("o_orderkey"))
    } finally engine.close()
  }

  private val q112Sql =
    """SELECT o_orderkey, o_custkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price
      |FROM orders
      |WHERE o_orderkey <= 2000
      |  AND o_custkey NOT IN (SELECT c_custkey FROM customer
      |                        WHERE c_custkey % 5 = 2)
      |ORDER BY o_orderkey""".stripMargin

  /** q113: `MERGE INTO ... WHEN MATCHED AND ... THEN DELETE / UPDATE /
    * WHEN NOT MATCHED THEN INSERT` (DuckDB 1.4 grammar, round 9) — the
    * three-way incremental-batch reconcile every lake table runs: churn
    * heavy spenders out, fold spend into surviving balances, admit new
    * accounts, all in ONE statement lowered to one left join + one anti
    * join (copy-on-write). Money flows through DECIMAL end to end; the
    * gate hashes the merged snapshot. The oracle replays the merge as the
    * equivalent join/union SELECT (the driver's DuckDB 1.0 predates
    * MERGE). */
  private def q113(s: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(s)
    try {
      engine.sql(s"CREATE OR REPLACE TABLE acct AS " +
        s"SELECT c_custkey AS id, CAST(c_acctbal AS DECIMAL(18,2)) AS bal, " +
        s"c_mktsegment AS seg FROM '$dir/customer.parquet' " +
        s"WHERE c_custkey <= 600")
      engine.sql(s"CREATE OR REPLACE TABLE delta AS " +
        s"SELECT o_custkey AS id, " +
        s"CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) " +
        s"AS spend FROM '$dir/orders.parquet' WHERE o_orderkey <= 3000 " +
        s"GROUP BY o_custkey")
      engine.sql("MERGE INTO acct USING delta d ON acct.id = d.id " +
        "WHEN MATCHED AND d.spend > 200000 THEN DELETE " +
        "WHEN MATCHED THEN UPDATE SET bal = acct.bal + d.spend " +
        "WHEN NOT MATCHED THEN INSERT (id, bal) VALUES (d.id, d.spend)")
      engine.sql("SELECT id, CAST(bal AS DOUBLE) AS bal, seg FROM acct")
        .psort(col("id"))
    } finally engine.close()
  }

  private val q113Sql =
    """WITH acct AS (
      |  SELECT c_custkey AS id, CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
      |         c_mktsegment AS seg
      |  FROM customer WHERE c_custkey <= 600),
      |delta AS (
      |  SELECT o_custkey AS id,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS spend
      |  FROM orders WHERE o_orderkey <= 3000 GROUP BY o_custkey),
      |merged AS (
      |  SELECT a.id,
      |    CASE WHEN d.id IS NOT NULL THEN CAST(a.bal + d.spend AS DECIMAL(18,2))
      |         ELSE a.bal END AS bal,
      |    a.seg
      |  FROM acct a LEFT JOIN delta d ON a.id = d.id
      |  WHERE NOT (d.id IS NOT NULL AND d.spend > 200000)
      |  UNION ALL
      |  SELECT d.id, d.spend AS bal, NULL AS seg
      |  FROM delta d WHERE NOT EXISTS (SELECT 1 FROM acct a WHERE a.id = d.id))
      |SELECT id, CAST(bal AS DOUBLE) AS bal, seg FROM merged ORDER BY id""".stripMargin

  /** q114: `MERGE ... RETURNING merge_action, ...` (DuckDB DML RETURNING,
    * round 9) — the audit-trail form of the q113 reconcile: the statement
    * itself returns every affected row tagged with its action (post-image
    * for UPDATE/INSERT, pre-image for DELETE), so the pipeline's change
    * log needs no second scan. The oracle replays the affected-row union
    * as a SELECT. */
  private def q114(s: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(s)
    try {
      engine.sql(s"CREATE OR REPLACE TABLE acct2 AS " +
        s"SELECT c_custkey AS id, CAST(c_acctbal AS DECIMAL(18,2)) AS bal, " +
        s"c_mktsegment AS seg FROM '$dir/customer.parquet' " +
        s"WHERE c_custkey BETWEEN 200 AND 900")
      engine.sql(s"CREATE OR REPLACE TABLE delta2 AS " +
        s"SELECT o_custkey AS id, " +
        s"CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) " +
        s"AS spend FROM '$dir/orders.parquet' " +
        s"WHERE o_orderkey BETWEEN 3000 AND 6000 GROUP BY o_custkey")
      engine.sql("MERGE INTO acct2 USING delta2 d ON acct2.id = d.id " +
        "WHEN MATCHED AND d.spend > 300000 THEN DELETE " +
        "WHEN MATCHED THEN UPDATE SET bal = acct2.bal + d.spend " +
        "WHEN NOT MATCHED THEN INSERT (id, bal) VALUES (d.id, d.spend) " +
        "RETURNING merge_action, id, CAST(bal AS DOUBLE) AS bal")
        .psort(col("id"))
    } finally engine.close()
  }

  private val q114Sql =
    """WITH acct AS (
      |  SELECT c_custkey AS id, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      |  FROM customer WHERE c_custkey BETWEEN 200 AND 900),
      |delta AS (
      |  SELECT o_custkey AS id,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS spend
      |  FROM orders WHERE o_orderkey BETWEEN 3000 AND 6000 GROUP BY o_custkey),
      |m AS (SELECT a.id, a.bal, d.id AS did, d.spend
      |      FROM acct a LEFT JOIN delta d ON a.id = d.id)
      |SELECT 'DELETE' AS merge_action, id, CAST(bal AS DOUBLE) AS bal
      |FROM m WHERE did IS NOT NULL AND spend > 300000
      |UNION ALL
      |SELECT 'UPDATE', id, CAST(CAST(bal + spend AS DECIMAL(18,2)) AS DOUBLE)
      |FROM m WHERE did IS NOT NULL AND NOT (spend > 300000)
      |UNION ALL
      |SELECT 'INSERT', d.id, CAST(d.spend AS DOUBLE)
      |FROM delta d WHERE NOT EXISTS (SELECT 1 FROM acct a WHERE a.id = d.id)
      |ORDER BY id""".stripMargin

  /** q115: session transactions (round 9) — BEGIN / ROLLBACK / COMMIT over
    * the copy-on-write snapshots: a rolled-back batch (zero-out + delete)
    * must leave NO trace, a committed batch exactly its effect. The oracle
    * replays only the committed leg; any rollback leakage (a lost row, a
    * zeroed balance) breaks the hash. */
  private def q115(s: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(s)
    try {
      engine.sql(s"CREATE OR REPLACE TABLE txn_acct AS " +
        s"SELECT c_custkey AS id, CAST(c_acctbal AS DECIMAL(18,2)) AS bal " +
        s"FROM '$dir/customer.parquet' WHERE c_custkey <= 300")
      engine.sql("BEGIN TRANSACTION")
      engine.sql("UPDATE txn_acct SET bal = 0")
      engine.sql("DELETE FROM txn_acct WHERE id % 2 = 0")
      engine.sql("ROLLBACK")
      engine.sql("BEGIN")
      engine.sql("UPDATE txn_acct SET bal = bal + 100 WHERE id % 10 = 1")
      engine.sql("DELETE FROM txn_acct WHERE id % 10 = 7")
      engine.sql("COMMIT")
      engine.sql("SELECT id, CAST(bal AS DOUBLE) AS bal FROM txn_acct")
        .psort(col("id"))
    } finally engine.close()
  }

  private val q115Sql =
    """SELECT c_custkey AS id,
      |  CAST(CASE WHEN c_custkey % 10 = 1
      |    THEN CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 100 AS DECIMAL(18,2))
      |    ELSE CAST(c_acctbal AS DECIMAL(18,2)) END AS DOUBLE) AS bal
      |FROM customer
      |WHERE c_custkey <= 300 AND c_custkey % 10 <> 7
      |ORDER BY id""".stripMargin

  /** q123: CREATE SEQUENCE / nextval / currval — DuckDB's sequence
    * surface (SURVEY §2.2 session DDL) with the engine's pinned assignment
    * order: nextval values follow the source SELECT's ORDER BY (Engine's
    * documented DELTA — DuckDB leaves parallel assignment unspecified; a
    * distributed engine pins it to output order via a partition-ordered
    * zipWithIndex, no single-task funnel). Two ordered draws (CTAS then
    * INSERT SELECT, INCREMENT 2) plus a currval read stamped on every row;
    * the oracle replays the draws as ROW_NUMBER arithmetic. */
  private def q123(s: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(s)
    try {
      engine.sql("CREATE OR REPLACE SEQUENCE ord_ids START 1000 INCREMENT 2")
      engine.sql(s"CREATE OR REPLACE TABLE seq_t AS " +
        s"SELECT nextval('ord_ids') AS id, o_orderkey, o_orderstatus " +
        s"FROM '$dir/orders.parquet' WHERE o_orderkey <= 200 " +
        s"ORDER BY o_orderkey")
      engine.sql(s"INSERT INTO seq_t " +
        s"SELECT nextval('ord_ids'), o_orderkey, o_orderstatus " +
        s"FROM '$dir/orders.parquet' " +
        s"WHERE o_orderkey BETWEEN 201 AND 400 ORDER BY o_orderkey")
      val cur = engine.sql("SELECT currval('ord_ids') AS cv")
        .head().getLong(0)
      engine.sql("SELECT id, o_orderkey, o_orderstatus FROM seq_t")
        .withColumn("last_id", org.apache.spark.sql.functions.lit(cur))
        .psort(col("id"))
    } finally engine.close()
  }

  private val q123Sql =
    """WITH a AS (
      |  SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey <= 200),
      |b AS (
      |  SELECT o_orderkey, o_orderstatus FROM orders
      |  WHERE o_orderkey BETWEEN 201 AND 400),
      |ai AS (
      |  SELECT CAST(1000 + (ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) * 2
      |    AS BIGINT) AS id, o_orderkey, o_orderstatus FROM a),
      |bi AS (
      |  SELECT CAST(1000 + 2 * (SELECT COUNT(*) FROM a)
      |    + (ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) * 2
      |    AS BIGINT) AS id, o_orderkey, o_orderstatus FROM b),
      |u AS (SELECT * FROM ai UNION ALL SELECT * FROM bi)
      |SELECT id, o_orderkey, o_orderstatus,
      |  (SELECT MAX(id) FROM u) AS last_id
      |FROM u ORDER BY id""".stripMargin

  /** q124: CHECK constraints — DuckDB's column- and table-level CHECK
    * grammar, ENFORCED (round 10; previously parse-and-drop): a violating
    * INSERT or UPDATE fails loudly and atomically (the snapshot is
    * untouched), NULL predicates pass per SQL semantics. The gate lands a
    * clean batch, proves a negative-balance batch and a balance-breaking
    * UPDATE both reject, and hashes the surviving state plus the reject
    * count. Oracle replays the accepted rows. */
  private def q124(s: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(s)
    try {
      engine.sql("CREATE OR REPLACE TABLE chk_t (k BIGINT PRIMARY KEY, " +
        "bal DOUBLE CHECK (bal >= 0), status VARCHAR, CHECK (k < 1000000))")
      engine.sql(s"INSERT INTO chk_t SELECT c_custkey, c_acctbal, 'ok' " +
        s"FROM '$dir/customer.parquet' " +
        s"WHERE c_custkey <= 300 AND c_acctbal >= 0")
      def rejects(stmt: String): Long =
        try { engine.sql(stmt); 0L }
        catch { case e: Exception
            if e.getMessage != null && e.getMessage.contains("CHECK") => 1L }
      val r1 = rejects(s"INSERT INTO chk_t SELECT c_custkey + 1000, " +
        s"c_acctbal, 'neg' FROM '$dir/customer.parquet' " +
        s"WHERE c_custkey <= 300 AND c_acctbal < 0")
      val r2 = rejects("UPDATE chk_t SET bal = bal - 100000 WHERE k <= 10")
      engine.sql("SELECT k, CAST(bal AS DOUBLE) AS bal, status FROM chk_t")
        .withColumn("rejected_batches",
          org.apache.spark.sql.functions.lit(r1 + r2))
        .psort(col("k"))
    } finally engine.close()
  }

  private val q124Sql =
    """SELECT c_custkey AS k, CAST(c_acctbal AS DOUBLE) AS bal,
      |  'ok' AS status, CAST(2 AS BIGINT) AS rejected_batches
      |FROM customer WHERE c_custkey <= 300 AND c_acctbal >= 0
      |ORDER BY k""".stripMargin

  /** q125: FOREIGN KEY constraints — DuckDB's table- and column-level
    * REFERENCES grammar, ENFORCED (round 10; previously parse-and-drop):
    * an orphan INSERT rejects atomically, the parent side is RESTRICT
    * (DELETE of a referenced row and UPDATE of a referenced key both
    * fail loudly), NULL child keys pass (MATCH SIMPLE). The gate builds
    * a parent from nation and a child from customer, lands a NULL-key
    * row, proves three violating statements reject, deletes an
    * unreferenced parent row, and hashes the surviving child⟕parent join
    * plus the reject count. Enforcement cost is one distributed anti-join
    * count per constraint at the existing alignment choke points — the
    * parent key projection broadcasts at any realistic dimension size.
    * Oracle replays the accepted state. Reference analog: kwack delegates
    * this to DuckDB's constraint checker (kwack exposes DuckDB DDL
    * verbatim); the engine enforces it on its own snapshots. */
  private def q125(s: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(s)
    try {
      engine.sql("CREATE OR REPLACE TABLE fk_nation (" +
        "nk BIGINT PRIMARY KEY, nname VARCHAR)")
      engine.sql(s"INSERT INTO fk_nation SELECT n_nationkey, n_name " +
        s"FROM '$dir/nation.parquet' WHERE n_nationkey < 20")
      engine.sql("CREATE OR REPLACE TABLE fk_cust (ck BIGINT PRIMARY KEY, " +
        "nk BIGINT REFERENCES fk_nation, bal DOUBLE)")
      engine.sql(s"INSERT INTO fk_cust SELECT c_custkey, c_nationkey, " +
        s"c_acctbal FROM '$dir/customer.parquet' " +
        s"WHERE c_custkey <= 200 AND c_nationkey < 20")
      // MATCH SIMPLE: a NULL key component passes
      engine.sql("INSERT INTO fk_cust VALUES (999001, NULL, 0.0)")
      def rejects(stmt: String): Long =
        try { engine.sql(stmt); 0L }
        catch { case e: Exception if e.getMessage != null &&
            e.getMessage.contains("FOREIGN KEY") => 1L }
      // orphan batch rejects atomically (keys shifted past the parent)
      val r1 = rejects(s"INSERT INTO fk_cust SELECT c_custkey + 500000, " +
        s"c_nationkey + 100, c_acctbal FROM '$dir/customer.parquet' " +
        s"WHERE c_custkey <= 50")
      // a certainly-referenced parent key for the RESTRICT probes
      // (COALESCE guards the degenerate corpus with no valid child rows —
      // the probe then targets key 0, present whenever nation is)
      val refNk = engine.sql(
        "SELECT CAST(COALESCE(MIN(nk), 0) AS BIGINT) AS m FROM fk_cust")
        .collect()(0).getLong(0)
      val r2 = rejects(s"DELETE FROM fk_nation WHERE nk = $refNk")
      val r3 = rejects(s"UPDATE fk_nation SET nk = nk + 1000 " +
        s"WHERE nk = $refNk")
      // unreferenced parent rows delete fine
      engine.sql("INSERT INTO fk_nation VALUES (99, 'SCRATCH')")
      engine.sql("DELETE FROM fk_nation WHERE nk = 99")
      engine.sql("SELECT c.ck, c.nk, n.nname " +
        "FROM fk_cust c LEFT JOIN fk_nation n ON c.nk = n.nk")
        .withColumn("rejected_batches",
          org.apache.spark.sql.functions.lit(r1 + r2 + r3))
        .psort(col("ck"))
    } finally engine.close()
  }

  /** q126: `INSERT INTO t BY NAME` (DuckDB grammar): the source's own
    * column names bind to the target in ANY order (case-insensitive);
    * unmentioned target columns fill NULL; composes with OR REPLACE on
    * the declared key. The gate creates a 4-column keyed table, loads a
    * reordered 3-column SELECT BY NAME (note fills NULL), then upserts a
    * differently-ordered BY NAME batch via OR REPLACE flipping 50
    * balances, and hashes the final state. Oracle replays the aligned
    * equivalent. Reference analog: kwack pastes DuckDB INSERT grammar
    * verbatim to the engine (KwackEngine delegates all SQL). */
  private def q126(s: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(s)
    try {
      engine.sql("CREATE OR REPLACE TABLE bn_t (k BIGINT PRIMARY KEY, " +
        "nm VARCHAR, bal DOUBLE, note VARCHAR)")
      engine.sql(s"INSERT INTO bn_t BY NAME SELECT c_acctbal AS bal, " +
        s"c_custkey AS k, c_name AS nm FROM '$dir/customer.parquet' " +
        s"WHERE c_custkey <= 150")
      engine.sql(s"INSERT OR REPLACE INTO bn_t BY NAME " +
        s"SELECT c_custkey AS k, 'flipped' AS note, -c_acctbal AS bal, " +
        s"c_name AS nm FROM '$dir/customer.parquet' WHERE c_custkey <= 50")
      engine.sql("SELECT k, nm, CAST(bal AS DOUBLE) AS bal, note FROM bn_t")
        .psort(col("k"))
    } finally engine.close()
  }

  private val q126Sql =
    """SELECT c_custkey AS k, c_name AS nm,
      |  CAST(CASE WHEN c_custkey <= 50 THEN -c_acctbal ELSE c_acctbal END
      |    AS DOUBLE) AS bal,
      |  CASE WHEN c_custkey <= 50 THEN 'flipped' ELSE NULL END AS note
      |FROM customer WHERE c_custkey <= 150 ORDER BY k""".stripMargin

  /** q127: `ALTER TABLE t ALTER [COLUMN] c [SET DATA] TYPE tpe [USING
    * expr]` (DuckDB grammar, both spellings): a copy-on-write projection
    * cast with optional USING re-derivation; FK members refuse the
    * retype, CHECKs re-verify. The gate retypes a DOUBLE balance to
    * BIGINT through FLOOR (no rounding-tie hazard) and lowercases a
    * VARCHAR segment via USING, then hashes the final state. */
  private def q127(s: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(s)
    try {
      engine.sql(s"CREATE OR REPLACE TABLE at_t AS SELECT c_custkey, " +
        s"c_acctbal, c_mktsegment FROM '$dir/customer.parquet' " +
        s"WHERE c_custkey <= 200")
      engine.sql("ALTER TABLE at_t ALTER COLUMN c_acctbal TYPE BIGINT " +
        "USING CAST(FLOOR(c_acctbal) AS BIGINT)")
      engine.sql("ALTER TABLE at_t ALTER c_mktsegment SET DATA TYPE " +
        "VARCHAR USING lower(c_mktsegment)")
      engine.sql("SELECT c_custkey, c_acctbal AS bal_floor, " +
        "c_mktsegment AS seg FROM at_t")
        .psort(col("c_custkey"))
    } finally engine.close()
  }

  private val q127Sql =
    """SELECT c_custkey, CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_floor,
      |  LOWER(c_mktsegment) AS seg
      |FROM customer WHERE c_custkey <= 200
      |ORDER BY c_custkey""".stripMargin

  /** q128: SET VARIABLE / getvariable (DuckDB 1.1): variables evaluate
    * eagerly (scalar subqueries allowed), getvariable references splice
    * as typed literals in ANY statement (opaque-masked, so string
    * literals never rewrite), RESET unsets, and an unset variable reads
    * NULL (the probe count must come back 0 — NULL comparison selects
    * nothing). Cutoff uses MAX/2 (exact) rather than AVG to avoid
    * cross-engine double-summation ULP drift at the filter boundary. */
  private def q128(s: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(s)
    try {
      engine.sql("SET VARIABLE seg = 'BUILDING'")
      engine.sql(s"SET VARIABLE cutoff = (SELECT CAST(MAX(c_acctbal) " +
        s"AS DOUBLE) / 2 FROM '$dir/customer.parquet')")
      engine.sql(s"CREATE OR REPLACE TABLE sv_t AS SELECT c_custkey, " +
        s"c_acctbal FROM '$dir/customer.parquet' " +
        s"WHERE c_mktsegment = getvariable('seg') " +
        s"AND c_acctbal > getvariable('cutoff')")
      engine.sql("SET VARIABLE bonus = 100")
      engine.sql("UPDATE sv_t SET c_acctbal = c_acctbal + " +
        "getvariable('bonus') WHERE c_custkey % 2 = 0")
      engine.sql("RESET VARIABLE bonus")
      val nNull = engine.sql("SELECT COUNT(*) AS n FROM sv_t " +
        "WHERE c_acctbal < getvariable('bonus')").collect()(0).getLong(0)
      engine.sql("SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal " +
        "FROM sv_t")
        .withColumn("null_probe",
          org.apache.spark.sql.functions.lit(nNull))
        .psort(col("c_custkey"))
    } finally engine.close()
  }

  private val q128Sql =
    """WITH cutoff AS (SELECT MAX(c_acctbal) / 2 AS c FROM customer)
      |SELECT c_custkey,
      |  CAST(c_acctbal + CASE WHEN c_custkey % 2 = 0 THEN 100 ELSE 0 END
      |    AS DOUBLE) AS bal,
      |  CAST(0 AS BIGINT) AS null_probe
      |FROM customer, cutoff
      |WHERE c_mktsegment = 'BUILDING' AND c_acctbal > c
      |ORDER BY c_custkey""".stripMargin

  private val q125Sql =
    """WITH par AS (SELECT n_nationkey AS nk, n_name AS nname
      |  FROM nation WHERE n_nationkey < 20),
      |ch AS (
      |  SELECT c_custkey AS ck, c_nationkey AS nk
      |  FROM customer WHERE c_custkey <= 200 AND c_nationkey < 20
      |  UNION ALL SELECT 999001, NULL)
      |SELECT c.ck, c.nk, p.nname, CAST(3 AS BIGINT) AS rejected_batches
      |FROM ch c LEFT JOIN par p ON c.nk = p.nk
      |ORDER BY ck""".stripMargin

  /** q129: DuckDB's read_parquet TABLE-FUNCTION scans
    * (docs.duckdb.org/data/multiple_files/overview) through the engine
    * dialect — single-path, glob-pattern, and bracketed-list forms, each
    * aggregated so the oracle (the same relations via their table views)
    * pins that the function scan reads exactly the table's rows. Glob
    * expansion happens in Spark's distributed file index, not on the
    * driver; the registered view is fingerprint-cached and re-registers
    * when a part file lands under the glob (Engine.tableFnView). */
  private def q129(s: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(s)
    try engine.sql(
      s"""SELECT * FROM (
         |  SELECT 'li' AS src, count(*) AS n,
         |    CAST(sum(l_orderkey) AS BIGINT) AS keysum
         |  FROM read_parquet('$dir/lineitem.parquet')
         |  UNION ALL
         |  SELECT 'nat', count(*), CAST(sum(n_nationkey) AS BIGINT)
         |  FROM read_parquet('$dir/nati*.parquet')
         |  UNION ALL
         |  SELECT 'ord', count(*), CAST(sum(o_custkey) AS BIGINT)
         |  FROM read_parquet(['$dir/orders.parquet'])
         |) ORDER BY src""".stripMargin)
    finally engine.close()
  }

  private val q129Sql =
    """SELECT * FROM (
      |  SELECT 'li' AS src, count(*) AS n,
      |    CAST(sum(l_orderkey) AS BIGINT) AS keysum FROM lineitem
      |  UNION ALL
      |  SELECT 'nat', count(*), CAST(sum(n_nationkey) AS BIGINT) FROM nation
      |  UNION ALL
      |  SELECT 'ord', count(*), CAST(sum(o_custkey) AS BIGINT) FROM orders
      |) ORDER BY src""".stripMargin

  /** q130: DuckDB list comprehensions and list literals
    * (docs.duckdb.org/sql/data_types/list): `[expr FOR v IN list IF pred]`
    * lowers to `transform(filter(list, v -> pred), v -> expr)` and
    * `[a, b]` to `array(a, b)` at the dialect front door
    * (SqlScan.rewriteBrackets — quote-aware, inside-out for nesting,
    * subscripts preserved by the lexer rule). The oracle runs the SAME
    * comprehension natively in DuckDB, pinning element order (both are
    * order-preserving maps over a filtered list) and empty-match shape.
    * Gated outputs are SCALAR by repo convention (the driver's pandas
    * comparator cannot sort nested columns — CORRECTNESS_r11 q130 err):
    * the lists are built by the rewrites, then flattened with a '|' join
    * so every element and its order still lands in the hash. The nested-
    * output originals stay covered by NewOpsR11Spec. */
  private def q130(s: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(s)
    try engine.sql(
      s"""SELECT doc_id,
         |  array_join(
         |    [upper(w) FOR w IN split(text, ' ') IF length(w) >= 7], '|')
         |    AS big_words,
         |  CAST(size([w FOR w IN split(text, ' ') IF length(w) >= 7])
         |    AS BIGINT) AS n_big,
         |  array_join(['one', source], '|') AS lit_pair
         |FROM '$dir/documents.parquet'
         |ORDER BY doc_id""".stripMargin)
    finally engine.close()
  }

  private val q130Sql =
    """SELECT doc_id,
      |  COALESCE(ARRAY_TO_STRING(
      |    [UPPER(w) FOR w IN STRING_SPLIT(text, ' ') IF LENGTH(w) >= 7], '|'),
      |    '') AS big_words,
      |  CAST(LEN([w FOR w IN STRING_SPLIT(text, ' ') IF LENGTH(w) >= 7])
      |    AS BIGINT) AS n_big,
      |  ARRAY_TO_STRING(['one', source], '|') AS lit_pair
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q131: DuckDB struct literals (docs.duckdb.org/sql/data_types/struct)
    * — `{'k': v, ...}` lowers to `named_struct('k', v, ...)`, `MAP {...}`
    * to `map(...)` (SqlScan.rewriteBraces). The oracle runs the same
    * literal natively. Gated outputs are SCALAR by repo convention (the
    * driver's pandas comparator cannot sort nested columns —
    * CORRECTNESS_r11 q131 err): the nested struct is built by the brace
    * rewrite inside a subquery, then every field — including the doubly-
    * nested one — is projected out, so key resolution and nesting are
    * still pinned cross-engine. The nested-output originals stay covered
    * by NewOpsR11Spec. */
  private def q131(s: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(s)
    try engine.sql(
      s"""SELECT doc_id, meta.src AS meta_src,
         |  CAST(meta.len AS BIGINT) AS meta_len,
         |  CAST(meta.sub.half AS BIGINT) AS meta_half,
         |  {'s': source, 'l': CAST(length(text) AS BIGINT)}.l AS lit_len
         |FROM (
         |  SELECT doc_id, source, text,
         |    {'src': source, 'len': CAST(length(text) AS BIGINT),
         |     'sub': {'half': CAST(length(text) / 2 AS BIGINT)}} AS meta
         |  FROM '$dir/documents.parquet') t
         |ORDER BY doc_id""".stripMargin)
    finally engine.close()
  }

  private val q131Sql =
    """SELECT doc_id, meta.src AS meta_src,
      |  CAST(meta.len AS BIGINT) AS meta_len,
      |  CAST(meta.sub.half AS BIGINT) AS meta_half,
      |  CAST({'s': source, 'l': LENGTH(text)}.l AS BIGINT) AS lit_len
      |FROM (
      |  SELECT doc_id, source, text,
      |    {'src': source, 'len': CAST(LENGTH(text) AS BIGINT),
      |     'sub': {'half': CAST(LENGTH(text) // 2 AS BIGINT)}} AS meta
      |  FROM documents) t
      |ORDER BY doc_id""".stripMargin

  /** q132: the DuckDB scalar-function NAME surface (VERDICT r11 task 3) —
    * the reference's contract is "DuckDB SQL, unrestricted"
    * (KwackEngine.java:232), so DuckDB-spelled text must run VERBATIM:
    * the engine and the oracle execute the IDENTICAL string. Exercises
    * the alias table (functions/DuckAliases: len, string_split,
    * list_contains/transform/filter/unique/position, array_to_string,
    * strftime %-token translation, epoch_ms), the struct_pack `:=`
    * rewrite, and the `->>` json arrow (SqlScan.rewriteStructPack /
    * rewriteArrows + functions/JsonPathExtract). */
  private val q132Text =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(text) AS BIGINT) AS n_chars2,
      |  list_contains(string_split(text, ' '), 'table') AS has_table,
      |  COALESCE(array_to_string(
      |    list_transform(list_filter(string_split(text, ' '), w -> length(w) >= 7),
      |      w -> upper(w)), '|'), '') AS big,
      |  strftime(TIMESTAMP '2024-03-05 07:09:11', '%Y-%m-%d %H:%M:%S') AS fmt,
      |  CAST(epoch_ms(TIMESTAMP '2024-03-05 07:09:11') AS BIGINT) AS ems,
      |  json_extract_string(to_json(struct_pack(s := source, n := doc_id)),
      |    '$.s') AS js,
      |  '{"a": {"b": [10, 20]}}' ->> '$.a.b[1]' AS jb,
      |  CAST(list_unique([1, 2, 2, NULL]) AS BIGINT) AS uniq,
      |  CAST(list_position(string_split(text, ' '), 'scan') AS BIGINT)
      |    AS pos_scan
      |FROM documents ORDER BY doc_id""".stripMargin

  private def q132(s: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(s)
    try engine.sql(q132Text.replace("FROM documents",
      s"FROM '$dir/documents.parquet'"))
    finally engine.close()
  }

  /** q133: the DuckDB temporal + json function-name surface, second
    * alias wave (round 12) — again the IDENTICAL text runs through both
    * engines. Exercises date_diff/datediff boundary semantics (year/
    * month/week/day/hour parts over real event timestamps), dayname/
    * monthname, time_bucket floor alignment, printf, the `->>`
    * arrow + CAST, json_type (bare and pathed), json_valid,
    * json_object, and starts_with — all mapped onto codegen'd Spark
    * natives or the Jackson-exact Json* expressions
    * (functions/DuckAliases, functions/JsonPathExtract). */
  private val q133Text =
    """SELECT user_id,
      |  CAST(date_diff('day', min(ts), max(ts)) AS BIGINT) AS span_days,
      |  CAST(date_diff('hour', min(ts), max(ts)) AS BIGINT) AS span_hours,
      |  CAST(date_diff('month', min(ts), max(ts)) AS BIGINT) AS span_months,
      |  CAST(datediff('week', min(ts), max(ts)) AS BIGINT) AS span_weeks,
      |  dayname(min(ts)) AS first_day,
      |  monthname(max(ts)) AS last_month,
      |  CAST(count(DISTINCT time_bucket(INTERVAL '15 minutes', ts))
      |    AS BIGINT) AS buckets_15m,
      |  printf('%s:%d', 'u', user_id) AS tag,
      |  CAST(max(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS max_k,
      |  json_type(max(props)) AS ptype,
      |  json_type(max(props), 'k') AS ktype,
      |  CAST(sum(CASE WHEN json_valid(props) THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_valid,
      |  max(json_object('u', user_id)) AS jobj,
      |  CAST(sum(CASE WHEN starts_with(event_type, 'cl') THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_cl
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  private def q133(s: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(s)
    try engine.sql(q133Text.replace("FROM events",
      s"FROM '$dir/events.parquet'"))
    finally engine.close()
  }

  /** q134: third DuckDB-name wave — regexp_replace FIRST-match default +
    * 'g'/'i' options (\N backrefs via functions/RegexpReplaceDuck),
    * list_sort's NULLS-LAST default, list_reduce seeded folds, unnest in
    * a select list, array_agg — identical text through both engines. */
  private val q134Text =
    """SELECT lang,
      |  CAST(count(*) AS BIGINT) AS n,
      |  array_to_string(list_sort(list_distinct(array_agg(source))), '|')
      |    AS sources,
      |  min(regexp_replace(text, '[aeiou]', '*')) AS first_star,
      |  min(regexp_replace(text, '[aeiou]', '*', 'g')) AS all_star,
      |  min(regexp_replace(source, 'SRC', '#', 'i')) AS ci_star,
      |  min(regexp_replace(source, '\d+', '#')) AS digit_star,
      |  min(regexp_replace(source, '([a-z])(\d)', '\2\1')) AS backref,
      |  min(list_reduce(string_split(substr(text, 1, 40), ' '),
      |    (a, b) -> a || '>' || b)) AS folded,
      |  (SELECT CAST(sum(u) AS BIGINT)
      |   FROM (SELECT unnest([1, 2, 3, 4]) AS u) t) AS unnest_sum
      |FROM documents
      |GROUP BY lang ORDER BY lang""".stripMargin

  private def q134(s: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(s)
    try engine.sql(q134Text.replace("FROM documents",
      s"FROM '$dir/documents.parquet'"))
    finally engine.close()
  }

  /** q135: fourth DuckDB-name wave — the string-similarity surface
    * (jaccard / hamming / mismatches / damerau_levenshtein / editdist3 /
    * jaro[_winkler]_similarity, byte semantics pinned in
    * functions/StringSimilarity), list_zip pad + truncate forms,
    * map_from_entries + cardinality, and the LIST/ARRAY vector-distance
    * names riding the s-suite's codegen'd expressions — identical text
    * through both engines. Doubles round(4): the metric FORMULAS are
    * pinned but ULP-level association inside sqrt/divide may differ. */
  private val q135Text =
    """SELECT lang,
      |  CAST(count(*) AS BIGINT) AS n,
      |  round(min(jaccard(rpad(substr(text, 1, 12), 12, 'x'), source)), 4)
      |    AS jac_min,
      |  round(max(jaccard(source, lang)), 4) AS jac_max,
      |  CAST(min(hamming(rpad(source, 6, '_'), rpad(lang, 6, '_')))
      |    AS BIGINT) AS ham_min,
      |  CAST(max(mismatches(rpad(source, 8, '.'), rpad(lang, 8, '.')))
      |    AS BIGINT) AS mis_max,
      |  CAST(max(damerau_levenshtein(substr(text, 1, 10), source))
      |    AS BIGINT) AS dl_max,
      |  CAST(min(editdist3(source, lang)) AS BIGINT) AS ed_min,
      |  round(max(jaro_similarity(substr(text, 1, 10), source)), 4)
      |    AS jaro_max,
      |  round(max(jaro_winkler_similarity(substr(text, 1, 10), source)), 4)
      |    AS jw_max,
      |  CAST(sum(len(list_zip(string_split(substr(text, 1, 30), ' '),
      |    [lang, source]))) AS BIGINT) AS zip_len,
      |  CAST(min(len(list_zip(string_split(substr(text, 1, 30), ' '),
      |    string_split(substr(text, 1, 18), ' '), true))) AS BIGINT)
      |    AS zip_trunc,
      |  CAST(max(cardinality(map_from_entries(
      |    list_zip([lang, source], [1, 2])))) AS BIGINT) AS map_card,
      |  round(min(list_cosine_similarity([CAST(n_chars AS DOUBLE), 1.0],
      |    [1.0, CAST(n_chars AS DOUBLE)])), 4) AS cos_min,
      |  round(max(list_inner_product([CAST(n_chars AS DOUBLE), 2.0],
      |    [0.5, CAST(n_chars AS DOUBLE)])), 4) AS dot_max,
      |  round(max(list_distance([CAST(n_chars AS DOUBLE), 0.0],
      |    [0.0, 3.0])), 4) AS dist_max
      |FROM documents
      |GROUP BY lang ORDER BY lang""".stripMargin

  private def q135(s: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(s)
    try engine.sql(q135Text.replace("FROM documents",
      s"FROM '$dir/documents.parquet'"))
    finally engine.close()
  }

  /** q136: the ATTACH/DETACH/USE multi-database statement surface — the
    * reference's `-d` persisted-db + `cache=shared` second-connection
    * story (KwackMain.java:127-129, KwackConfig.java:448-454) as DuckDB
    * statements. ATTACH registers the sf directory (the persisted-db
    * layout: one parquet per table) read-only, the query mixes a
    * QUALIFIED `ext.nation` ref with an UNQUALIFIED `customer` resolved
    * through `USE ext`, and the round trip detaches cleanly. The oracle
    * runs the equivalent plain join — DuckDB's own ATTACH wants a native
    * .duckdb file, so the statement spellings differ by design here
    * (like q75's COPY). */
  private def q136(s: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(s)
    try {
      engine.sql(s"ATTACH '$dir' AS ext (READ_ONLY)")
      engine.sql("USE ext")
      val out = engine.sql(
        """SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_cust,
          |  CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))), 2)
          |    AS DOUBLE) AS bal
          |FROM customer c JOIN ext.nation n
          |  ON c.c_nationkey = n.n_nationkey
          |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin)
      engine.sql("USE memory")
      engine.sql("DETACH ext")
      out
    } finally engine.close()
  }

  private val q136Sql =
    """SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_cust,
      |  CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))), 2)
      |    AS DOUBLE) AS bal
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin


  /** q137: fifth DuckDB-name wave, scalar tier — encoding (to_hex /
    * to_base / format_bytes / bar byte-padded blocks), unicode (ord /
    * strip_accents), path parsing (parse_dirname / dirpath / filename),
    * the numeric long tail (even / signbit / gamma / lgamma / gcd / lcm /
    * xor / fdiv / fmod floored, nextafter, isfinite / isinf), the
    * temporal long tail (isodow, DuckDB's 0-based dayofweek via
    * SqlScan.rewriteBuiltinRenames, julian, make_timestamp micros
    * overload, to_days / to_milliseconds interval constructors), and
    * regexp_full_match / regexp_escape — IDENTICAL text through both
    * engines, every semantic pinned by oracle probes first
    * (functions/DuckScalars). */
  private val q137Text =
    """SELECT lang,
      |  CAST(count(*) AS BIGINT) AS n,
      |  min(to_hex(n_chars)) AS hex_min,
      |  max(to_base(n_chars, 7, 8)) AS base7,
      |  min(format_bytes(n_chars * 1024)) AS fb,
      |  max(bar(n_chars % 50, 0, 50, 10)) AS bar10,
      |  CAST(max(ord(substr(text, 3))) AS BIGINT) AS ord_max,
      |  min(strip_accents(source || 'é')) AS sa,
      |  min(parse_dirname(source || '/' || lang || '/x.txt')) AS dn,
      |  max(parse_dirpath(source || '/' || lang || '/x.txt')) AS dp,
      |  max(parse_filename(source || '/f.' || lang, true)) AS pf,
      |  round(sum(even(n_chars / 7.0)), 1) AS ev,
      |  CAST(sum(CASE WHEN signbit(n_chars - 300.0) THEN 1 ELSE 0 END)
      |    AS BIGINT) AS sb,
      |  round(sum(lgamma(1.0 + n_chars % 13)), 6) AS lg,
      |  round(max(gamma((n_chars % 5) + 0.5)), 6) AS gm,
      |  CAST(sum(gcd(n_chars, 36)) AS BIGINT) AS g36,
      |  CAST(max(lcm((n_chars % 7) + 1, 6)) AS BIGINT) AS l6,
      |  CAST(sum(xor(n_chars, 255)) AS BIGINT) AS xr,
      |  round(sum(fdiv(n_chars, 7.0)) + sum(fmod(n_chars, 7.0)), 1) AS fdm,
      |  round(min(nextafter(n_chars + 0.0, 0.0)), 6) AS na,
      |  CAST(sum(CASE WHEN isfinite(log(n_chars)) AND NOT isinf(log(n_chars))
      |    THEN 1 ELSE 0 END) AS BIGINT) AS fin,
      |  CAST(max(isodow(make_timestamp(n_chars * 86400000000))) AS BIGINT)
      |    AS idw,
      |  CAST(max(dayofweek(make_timestamp(n_chars * 86400000000))) AS BIGINT)
      |    AS dow,
      |  round(max(julian(make_timestamp(n_chars * 43200000000))), 6) AS jul,
      |  CAST(max(epoch_ms(make_timestamp(n_chars * 86400000000)
      |    + to_days(CAST(n_chars % 3 AS INTEGER)))) AS BIGINT) AS ed,
      |  CAST(min(epoch_ms(make_timestamp(n_chars * 3600000000)
      |    + to_milliseconds(CAST(n_chars AS INTEGER)))) AS BIGINT) AS em,
      |  CAST(sum(CASE WHEN regexp_full_match(lang, '[a-z]+') THEN 1 ELSE 0 END)
      |    AS BIGINT) AS rfm,
      |  min(regexp_escape(source || '.x')) AS resc
      |FROM documents
      |GROUP BY lang ORDER BY lang""".stripMargin

  private def q137(s: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(s)
    try engine.sql(q137Text.replace("FROM documents",
      s"FROM '$dir/documents.parquet'"))
    finally engine.close()
  }

  /** q138: fifth wave, list + regexp-default tier — the DuckDB GROUP-0
    * defaults of regexp_extract / regexp_extract_all (Spark's builtins
    * default to group 1: a silently wrong answer on verbatim DuckDB SQL,
    * renamed at the front door), the options and capture-name-list
    * forms, and the list long tail (list_has_any / has_all NULL
    * handling, list_intersect, list_resize, list_select, list_where,
    * list_grade_up, list_apply, scalar range / generate_series with
    * DuckDB's exclusive/inclusive end and direction guards) — identical
    * text through both engines (functions/DuckListFns). The pad form of
    * list_resize is spec-pinned with constants only: the ORACLE DuckDB
    * 1.0.0 crashes (std::bad_array_new_length) on a column-input
    * 3-argument list_resize, so the gate carries the 2-arg form. */
  private val q138Text =
    """SELECT lang,
      |  CAST(count(*) AS BIGINT) AS n,
      |  min(regexp_extract(text, '[a-z]+ [a-z]+')) AS rx0,
      |  max(regexp_extract(text, '([a-z]+) ([a-z]+)', 2)) AS rx2,
      |  min(regexp_extract(source, 'src(\d+)', 1)) AS rxg,
      |  max(struct_extract(regexp_extract(source, '(src)(\d+)', ['w', 'd']),
      |    'd')) AS rxn,
      |  max(regexp_extract(upper(source), 'SRC(\d)', 1, 'i')) AS rxi,
      |  CAST(sum(len(regexp_extract_all(text, '[aeiou]+'))) AS BIGINT) AS rall,
      |  CAST(sum(len(regexp_extract_all(text, '([a-z])([a-z])', 2)))
      |    AS BIGINT) AS rall2,
      |  CAST(sum(len(range(n_chars % 10))) AS BIGINT) AS rng,
      |  CAST(sum(len(range(2, n_chars % 13, 3))) AS BIGINT) AS rng3,
      |  CAST(sum(len(generate_series(0, n_chars % 10, 3))) AS BIGINT) AS gs,
      |  CAST(sum(CASE WHEN list_has_any(string_split(substr(text, 1, 40), ' '),
      |    ['the', 'la', 'el', 'le', 'der']) THEN 1 ELSE 0 END) AS BIGINT)
      |    AS hay,
      |  CAST(sum(CASE WHEN list_has_all(string_split(substr(text, 1, 60), ' '),
      |    ['the', 'a']) THEN 1 ELSE 0 END) AS BIGINT) AS hall,
      |  array_to_string(list_sort(list_intersect(list_distinct(array_agg(source)),
      |    ['src1', 'src2', 'src777'])), '|') AS isec,
      |  min(array_to_string(list_resize(string_split(substr(text, 1, 20), ' '),
      |    4), '|')) AS rsz,
      |  min(array_to_string(list_select(string_split(substr(text, 1, 30), ' '),
      |    [2, 1, 9]), '|')) AS sel,
      |  min(array_to_string(list_where(string_split(substr(text, 1, 30), ' '),
      |    [true, false, true, true]), '|')) AS whr,
      |  min(array_to_string(list_grade_up(string_split(substr(text, 1, 25),
      |    ' ')), '|')) AS gup,
      |  CAST(sum(len(list_apply(string_split(substr(text, 1, 30), ' '),
      |    x -> upper(x)))) AS BIGINT) AS app
      |FROM documents
      |GROUP BY lang ORDER BY lang""".stripMargin

  private def q138(s: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(s)
    try engine.sql(q138Text.replace("FROM documents",
      s"FROM '$dir/documents.parquet'"))
    finally engine.close()
  }

  /** q139: fifth wave, aggregate tier — product (DeclarativeAggregate,
    * DISTINCT + FILTER forms), entropy (base-2, counts-map state, empty
    * group = 0.0), mad (continuous median both passes), quantile_cont
    * (lowers to Spark percentile — same (n-1)*q interpolation) and
    * quantile_disc / quantile (generic orderable counts-map aggregate;
    * Spark's PercentileDisc is numeric-only but DuckDB medians strings)
    * — identical text through both engines (functions/DuckAggs).
    * DOUBLE casts are explicit on both sides: bare `x + 0.0` is
    * DECIMAL(·,1) arithmetic in DuckDB and double in Spark, which
    * diverges at quantile interpolation (found drafting this gate). */
  private val q139Text =
    """SELECT lang,
      |  CAST(count(*) AS BIGINT) AS n,
      |  round(product(DISTINCT (n_chars % 5) + 1.0), 6) AS prod_d,
      |  round(product(CASE WHEN doc_id % 50 = 3 THEN 1.5 ELSE 1.0 END), 6)
      |    AS prod_f,
      |  round(entropy(source), 6) AS ent_src,
      |  round(entropy(n_chars % 10), 6) AS ent_mod,
      |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 6) AS qc,
      |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.9), 6) AS qc9,
      |  CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS qd25,
      |  CAST(quantile(n_chars, 0.75) AS BIGINT) AS q75,
      |  quantile_disc(source, 0.5) AS qsrc,
      |  round(mad(CAST(n_chars AS DOUBLE)), 6) AS md,
      |  round(mad(CAST(n_chars AS DOUBLE)) + quantile_cont(CAST(n_chars AS DOUBLE), 0.25),
      |    6) AS md_qc
      |FROM documents
      |GROUP BY lang ORDER BY lang""".stripMargin

  private def q139(s: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(s)
    try engine.sql(q139Text.replace("FROM documents",
      s"FROM '$dir/documents.parquet'"))
    finally engine.close()
  }

  val queries: Map[String, Q] = Map(
    "q139_duckdb_aggs" -> (q139 _),
    "q138_duckdb_lists" -> (q138 _),
    "q137_duckdb_scalars" -> (q137 _),
    "q136_attach_use" -> (q136 _),
    "q135_duckdb_similarity" -> (q135 _),
    "q134_duckdb_regex" -> (q134 _),
    "q133_duckdb_temporal" -> (q133 _),
    "q132_duckdb_names" -> (q132 _),
    "q131_struct_literal" -> (q131 _),
    "q130_list_comprehension" -> (q130 _),
    "q129_read_functions" -> (q129 _),
    "q115_transactions" -> (q115 _),
    "q114_merge_returning" -> (q114 _),
    "q113_merge_into" -> (q113 _),
    "q112_delete_using" -> (q112 _),
    "q124_check_constraints" -> (q124 _),
    "q125_foreign_keys" -> (q125 _),
    "q126_insert_by_name" -> (q126 _),
    "q127_alter_column_type" -> (q127 _),
    "q128_set_variable" -> (q128 _),
    "q123_sequences" -> (q123 _),
    "q110_update_from" -> (q110 _),
    "q111_upsert" -> (q111 _),
    "q107_named_window" -> (q107 _),
    "q86_copy_csv" -> (q86 _),
    "q87_copy_json" -> (q87 _),
    "q75_copy_roundtrip" -> (q75 _),
    "q76_union_avro" -> (q76 _),
    "q77_from_first" -> (q77 _),
    "q78_columns_regex" -> (q78 _),
    "q81_asof_sql" -> (q81 _),
    "q99_asof_sql_forward" -> (q99 _),
    "q82_using_sample" -> (q82 _),
    "q83_pivot_stmt" -> (q83 _),
    "q84_unpivot_stmt" -> (q84 _))

  val oracleSql: Map[String, String] = Map(
    "q139_duckdb_aggs" -> q139Text,
    "q138_duckdb_lists" -> q138Text,
    "q137_duckdb_scalars" -> q137Text,
    "q136_attach_use" -> q136Sql,
    "q135_duckdb_similarity" -> q135Text,
    "q134_duckdb_regex" -> q134Text,
    "q133_duckdb_temporal" -> q133Text,
    "q132_duckdb_names" -> q132Text,
    "q131_struct_literal" -> q131Sql,
    "q130_list_comprehension" -> q130Sql,
    "q129_read_functions" -> q129Sql,
    "q115_transactions" -> q115Sql,
    "q114_merge_returning" -> q114Sql,
    "q113_merge_into" -> q113Sql,
    "q112_delete_using" -> q112Sql,
    "q124_check_constraints" -> q124Sql,
    "q125_foreign_keys" -> q125Sql,
    "q126_insert_by_name" -> q126Sql,
    "q127_alter_column_type" -> q127Sql,
    "q128_set_variable" -> q128Sql,
    "q123_sequences" -> q123Sql,
    "q110_update_from" -> q110Sql,
    "q111_upsert" -> q111Sql,
    "q107_named_window" -> q107Sql,
    "q86_copy_csv" -> q86Sql,
    "q87_copy_json" -> q87Sql,
    "q77_from_first" -> q77Sql,
    "q78_columns_regex" -> q78Sql,
    "q81_asof_sql" -> q81Sql,
    "q99_asof_sql_forward" -> q99Sql,
    "q82_using_sample" -> q82Sql,
    "q83_pivot_stmt" -> q83Sql,
    "q84_unpivot_stmt" -> q84Sql,
    "q75_copy_roundtrip" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice, o_orderdate
        |FROM orders WHERE o_orderkey <= 1000""".stripMargin,
    "q76_union_avro" ->
      """WITH t(id, u) AS (
        |  SELECT 1, union_value(u1 := 'alpha')::UNION(u1 VARCHAR, u2 INTEGER)
        |  UNION ALL SELECT 2, union_value(u2 := 7)::UNION(u1 VARCHAR, u2 INTEGER)
        |  UNION ALL SELECT 3, NULL::UNION(u1 VARCHAR, u2 INTEGER)
        |  UNION ALL SELECT 4, union_value(u1 := 'beta')::UNION(u1 VARCHAR, u2 INTEGER)
        |  UNION ALL SELECT 5, union_value(u2 := -42)::UNION(u1 VARCHAR, u2 INTEGER)
        |  UNION ALL SELECT 6, union_value(u1 := '')::UNION(u1 VARCHAR, u2 INTEGER)
        |)
        |SELECT id, union_tag(u)::STRING AS tag,
        |       union_extract(u, 'u1') AS sval,
        |       union_extract(u, 'u2') AS ival
        |FROM t""".stripMargin)
}
