package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import QueryHelpers._

/** Statistical aggregates, higher-order collection functions, and interval
  * arithmetic — the analytics long tail of the reference's delegated DuckDB
  * surface (SURVEY §2.2 "Aggregation" / "nested: list" / "date/time"; the
  * reference passes SQL through verbatim, KwackEngine.java:232).
  *
  * Determinism: every floating-point statistic is derived from EXACT decimal
  * moments (n, Σx, Σy, Σx², Σy², Σxy) with the final double-precision
  * formula written as the IDENTICAL expression text in both dialects — the
  * same IEEE operations over bit-identical inputs produce bit-identical
  * doubles, so corr/covar/stddev hash-match with no tolerance. (The builtin
  * corr/stddev aggregates use merge-order-dependent streaming updates that
  * can never hash-match across engines; the moment form is also the
  * map-side-combinable shape a 100 TB aggregation wants.)
  */
object RelationalStats {

  private def sql(q: String): Q = (s, dir) => {
    graft.Tables.register(s, dir)
    s.sql(q)
  }

  /** Correlation / covariance / variance / linear regression per group from
    * exact decimal moments; identical text in both dialects. */
  private val q65Text =
    """WITH m AS (
      |  SELECT l_returnflag,
      |    CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(l_discount AS DECIMAL(8,4)) * CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) AS syy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n_rows,
      |  sx / n AS mean_qty,
      |  sy / n AS mean_disc,
      |  (sxx - sx * sx / n) / (n - 1) AS var_qty,
      |  SQRT((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
      |  (sxy - sx * sy / n) / (n - 1) AS covar_qd,
      |  (n * sxy - sx * sy) / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)) AS corr_qd,
      |  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS regr_slope,
      |  (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS regr_intercept
      |FROM m ORDER BY l_returnflag""".stripMargin
  private val q65 = sql(q65Text)

  /** Higher-order collection functions: transform/filter/aggregate (fold) /
    * exists/forall/zip_with over row-derived arrays, all reduced to scalar
    * outputs. Spark's lambdas run inside whole-stage codegen — no UDFs. */
  private val q66: Q = (s, dir) => {
    import org.apache.spark.sql.functions.{col, expr}
    t(s, dir, "part").filter(col("p_partkey") <= 200)
      .select(col("p_partkey"),
        expr("cast(aggregate(transform(sequence(1, 1 + cast(p_partkey % 5 as int)), i -> i * i), " +
          "cast(0 as bigint), (acc, x) -> acc + x) as bigint)").as("ssq"),
        expr("size(filter(sequence(1, 6), x -> x % 2 = 0))").as("n_even"),
        expr("exists(array(p_size, p_size * 2), x -> x > 10)").as("has_big"),
        expr("forall(array(p_size - 5, p_size), x -> x > 0)").as("all_pos"),
        expr("cast(aggregate(zip_with(array(p_size, p_size + 1, p_size + 2), array(3, 2, 1), " +
          "(x, y) -> x * y), 0, (acc, v) -> acc + v) as bigint)").as("dot3"),
        expr("array_join(array_sort(array(p_size % 7, p_size % 3, p_size % 5)), ',')").as("sorted_csv"))
      .psort(col("p_partkey"))
  }

  private val q66Sql =
    """SELECT p_partkey,
      | CAST(LIST_SUM(LIST_TRANSFORM(RANGE(1, 2 + CAST(p_partkey % 5 AS INTEGER)), i -> i * i)) AS BIGINT) AS ssq,
      | CAST(LEN(LIST_FILTER(RANGE(1, 7), x -> x % 2 = 0)) AS INTEGER) AS n_even,
      | LEN(LIST_FILTER([p_size, p_size * 2], x -> x > 10)) > 0 AS has_big,
      | LEN(LIST_FILTER([p_size - 5, p_size], x -> NOT (x > 0))) = 0 AS all_pos,
      | CAST(LIST_SUM([z[1] * z[2] FOR z IN LIST_ZIP([p_size, p_size + 1, p_size + 2], [3, 2, 1])]) AS BIGINT) AS dot3,
      | ARRAY_TO_STRING(LIST_SORT([p_size % 7, p_size % 3, p_size % 5]), ',') AS sorted_csv
      |FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""".stripMargin

  /** Interval arithmetic: timestamp/date ± HOUR/MINUTE/DAY/MONTH intervals
    * (month addition clamps at month end in both engines), plus an interval
    * comparison in the predicate; identical text in both dialects (UTC
    * sessions, so no DST divergence). */
  private val q67Text =
    """SELECT o_orderkey,
      | o_orderdate + INTERVAL 3 HOUR AS plus3h,
      | o_orderdate + INTERVAL 90 MINUTE AS plus90m,
      | CAST(CAST(o_orderdate AS DATE) + INTERVAL 7 DAY AS DATE) AS plus7d,
      | CAST(CAST(o_orderdate AS DATE) - INTERVAL 1 MONTH AS DATE) AS minus1m,
      | CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m
      |FROM orders
      |WHERE o_orderkey <= 300 AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00' - INTERVAL 30 DAY
      |ORDER BY o_orderkey""".stripMargin
  private val q67 = sql(q67Text)

  /** Window frame EXCLUDE GROUP / EXCLUDE TIES (the rest of the frame
    * exclusion clause; q52 covers EXCLUDE CURRENT ROW): algebraically
    * lowered onto Spark as range-frame sum minus the peer-group sum (GROUP)
    * and plus the current row back (TIES), in exact decimals. An empty
    * excluded frame must be NULL, not 0 — guarded by the matching counts. */
  private val q68: Q = (s, dir) => {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val e = t(s, dir, "events").filter(col("user_id") < 50)
      .select(col("user_id"), col("event_id"),
        col("value").cast("decimal(12,2)").as("v"),
        date_trunc("day", col("ts")).cast("date").as("d"))
    val wRange = Window.partitionBy(col("user_id")).orderBy(col("d"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wPeers = Window.partitionBy(col("user_id"), col("d"))
    val sAll: Column = sum(col("v")).over(wRange)
    val cAll: Column = count(lit(1)).over(wRange)
    val sPeer: Column = sum(col("v")).over(wPeers)
    val cPeer: Column = count(lit(1)).over(wPeers)
    e.select(col("user_id"), col("event_id"),
        when(cAll > cPeer, (sAll - sPeer).cast("double")).as("excl_group"),
        ((sAll - sPeer) + col("v")).cast("double").as("excl_ties"))
      .psort(col("user_id"), col("event_id"))
  }

  private val q68Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(value AS DECIMAL(12,2)) AS v,
      |    CAST(DATE_TRUNC('day', ts) AS DATE) AS d
      |  FROM events WHERE user_id < 50)
      |SELECT user_id, event_id,
      | CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY d
      |   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE GROUP)
      |  AS DOUBLE) AS excl_group,
      | CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY d
      |   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE TIES)
      |  AS DOUBLE) AS excl_ties
      |FROM e ORDER BY user_id, event_id""".stripMargin

  /** Positional join (operators/PositionalJoin): rank-paired rows with NULL
    * padding for the shorter side. The oracle replays the rank pairing with
    * ROW_NUMBER + FULL JOIN — the semantics DuckDB's POSITIONAL JOIN gives
    * when each side is explicitly ordered. */
  private val q69: Q = (s, dir) => {
    import org.apache.spark.sql.functions._
    val l = t(s, dir, "customer").filter(col("c_custkey") <= 120)
      .select(col("c_custkey"))
    val r = t(s, dir, "orders").filter(col("o_orderkey") <= 100)
      .select(col("o_orderkey"),
        col("o_totalprice").cast("decimal(12,2)").cast("double").as("price"))
    graft.operators.PositionalJoin
      .byOrder(l, Seq(col("c_custkey")), r, Seq(col("o_orderkey")))
      .psort(col("pos"))
  }

  private val q69Sql =
    """WITH l AS (
      |  SELECT c_custkey, ROW_NUMBER() OVER (ORDER BY c_custkey) - 1 AS pos
      |  FROM customer WHERE c_custkey <= 120),
      |r AS (
      |  SELECT o_orderkey,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price,
      |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS pos
      |  FROM orders WHERE o_orderkey <= 100)
      |SELECT COALESCE(l.pos, r.pos) AS pos, c_custkey, o_orderkey, price
      |FROM l FULL JOIN r ON l.pos = r.pos ORDER BY pos""".stripMargin

  /** Table profiling (DuckDB `SUMMARIZE` shape): per-column min/max/null/
    * distinct statistics as one row per column — exact aggregates only
    * (approx_unique sketches differ across engines), values stringified
    * through types both dialects render identically (bigint, decimal(12,2),
    * date, varchar). */
  private val q70Text =
    """SELECT 'l_orderkey' AS col_name,
      |  CAST(MIN(l_orderkey) AS STRING) AS min_v,
      |  CAST(MAX(l_orderkey) AS STRING) AS max_v,
      |  COUNT(l_orderkey) AS n_nonnull,
      |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_distinct
      |FROM lineitem
      |UNION ALL
      |SELECT 'l_returnflag',
      |  CAST(MIN(l_returnflag) AS STRING), CAST(MAX(l_returnflag) AS STRING),
      |  COUNT(l_returnflag), CAST(COUNT(DISTINCT l_returnflag) AS BIGINT)
      |FROM lineitem
      |UNION ALL
      |SELECT 'l_quantity',
      |  CAST(MIN(CAST(l_quantity AS DECIMAL(12,2))) AS STRING),
      |  CAST(MAX(CAST(l_quantity AS DECIMAL(12,2))) AS STRING),
      |  COUNT(l_quantity), CAST(COUNT(DISTINCT CAST(l_quantity AS DECIMAL(12,2))) AS BIGINT)
      |FROM lineitem
      |UNION ALL
      |SELECT 'l_shipdate',
      |  CAST(MIN(CAST(l_shipdate AS DATE)) AS STRING),
      |  CAST(MAX(CAST(l_shipdate AS DATE)) AS STRING),
      |  COUNT(l_shipdate), CAST(COUNT(DISTINCT CAST(l_shipdate AS DATE)) AS BIGINT)
      |FROM lineitem
      |ORDER BY col_name""".stripMargin
  private val q70 = sql(q70Text)

  /** GROUPS-mode window frames (DuckDB `GROUPS BETWEEN n PRECEDING AND
    * CURRENT ROW`; Spark has only ROWS/RANGE): lowered as a ROWS frame over
    * the distinct-peer-groups relation — aggregate per (partition, order
    * value), run the rows-frame window THERE (one row per group, so rows ==
    * groups), then join the group-level result back onto the detail rows.
    * Exact decimals; an empty group frame stays NULL through the join. */
  private val q72: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val e = t(s, dir, "events").filter(col("user_id") < 40)
      .select(col("user_id"), col("event_id"),
        col("value").cast("decimal(12,2)").as("v"),
        date_trunc("day", col("ts")).cast("date").as("d"))
    val g = e.groupBy(col("user_id"), col("d")).agg(sum(col("v")).as("gs"))
    val wg = Window.partitionBy(col("user_id")).orderBy(col("d"))
    val gwin = g.select(col("user_id"), col("d"),
      sum(col("gs")).over(wg.rowsBetween(-1, 0)).as("g10"),
      sum(col("gs")).over(wg.rowsBetween(-2, -1)).as("g21"))
    e.join(gwin, Seq("user_id", "d"))
      .select(col("user_id"), col("event_id"),
        col("g10").cast("double").as("groups_1p_cur"),
        col("g21").cast("double").as("groups_2p_1p"))
      .psort(col("user_id"), col("event_id"))
  }

  // DuckDB 1.x does not implement GROUPS mode either ("not implemented
  // yet") — this operator EXCEEDS the embedded baseline. The oracle
  // therefore replays the semantics through an independent formulation:
  // LAG over the per-group sums (not a rows-frame window), with explicit
  // NULL handling for short frames.
  private val q72Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(value AS DECIMAL(12,2)) AS v,
      |    CAST(DATE_TRUNC('day', ts) AS DATE) AS d
      |  FROM events WHERE user_id < 40),
      |g AS (
      |  SELECT user_id, d, SUM(v) AS gs FROM e GROUP BY user_id, d),
      |gw AS (
      |  SELECT user_id, d,
      |    gs + COALESCE(LAG(gs, 1) OVER w, 0) AS g10,
      |    CASE WHEN LAG(gs, 1) OVER w IS NULL THEN NULL
      |         ELSE LAG(gs, 1) OVER w + COALESCE(LAG(gs, 2) OVER w, 0) END AS g21
      |  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY d))
      |SELECT e.user_id, e.event_id,
      | CAST(gw.g10 AS DOUBLE) AS groups_1p_cur,
      | CAST(gw.g21 AS DOUBLE) AS groups_2p_1p
      |FROM e JOIN gw ON e.user_id = gw.user_id AND e.d = gw.d
      |ORDER BY e.user_id, e.event_id""".stripMargin

  /** ORDER BY ALL (DuckDB sugar adopted by Spark 4): identical text. */
  private val q73Text =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
      |FROM lineitem GROUP BY ALL ORDER BY ALL""".stripMargin
  private val q73 = sql(q73Text)

  /** q89: time-series gap filling + last-observation-carried-forward — the
    * densification every monitoring/feature pipeline runs before a model
    * sees the series: per user, the hourly grid from first to last event is
    * generated (`sequence`/`GENERATE_SERIES`), present hours aggregate
    * exactly (decimal sums), missing hours fill with n=0 and the value
    * carried forward by an IGNORE NULLS running last. One shuffle on
    * (user, hour) for the aggregate, one partition-local window for the
    * fill — the grid explode is map-only from the per-user bounds, so at
    * scale the plan stays linear in (users × grid length). */
  private val q89: Q = (s, dir) => {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val e = t(s, dir, "events").filter(col("user_id") < 5)
      .withColumn("h", date_trunc("hour", col("ts")))
    val agg = e.groupBy(col("user_id"), col("h"))
      .agg(count(lit(1)).as("n"),
        asDouble(round(sum(dec2(col("value"))), 2)).as("v"))
    val bounds = e.groupBy(col("user_id"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val series = bounds.select(col("user_id"),
      explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    series.join(agg, Seq("user_id", "h"), "left")
      .select(col("user_id"), col("h"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        last(col("v"), ignoreNulls = true).over(w).as("v_locf"))
      .psort(col("user_id"), col("h"))
  }

  private val q89Sql =
    """WITH e AS (
      |  SELECT user_id, DATE_TRUNC('hour', ts) AS h, value
      |  FROM events WHERE user_id < 5),
      |agg AS (
      |  SELECT user_id, h, COUNT(*) AS n,
      |    CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS v
      |  FROM e GROUP BY 1, 2),
      |b AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM e GROUP BY user_id),
      |series AS (
      |  SELECT user_id, UNNEST(GENERATE_SERIES(h0, h1, INTERVAL 1 HOUR)) AS h
      |  FROM b)
      |SELECT s.user_id, s.h,
      |  COALESCE(a.n, 0) AS n_events,
      |  LAST_VALUE(a.v IGNORE NULLS) OVER (PARTITION BY s.user_id ORDER BY s.h
      |    ROWS UNBOUNDED PRECEDING) AS v_locf
      |FROM series s LEFT JOIN agg a ON s.user_id = a.user_id AND s.h = a.h
      |ORDER BY s.user_id, s.h""".stripMargin

  /** q90: SCD type-2 dimension build — consecutive-duplicate collapse plus
    * validity intervals, the warehouse pattern for "what was this entity's
    * state at time t": per user, runs of the same event_type collapse to
    * one versioned row with valid_from/valid_to = [first ts, next change)
    * and an is_current flag on the open interval. Two windows over the
    * same (user) partitioning — one shuffle total; ties broken by event_id
    * so the versioning is deterministic under duplicate timestamps. */
  private val q90: Q = (s, dir) => {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val e = t(s, dir, "events").filter(col("user_id") < 50)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val wo = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val changes = e.withColumn("prev", lag(col("event_type"), 1).over(wo))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
    changes.select(col("user_id"), col("event_type"),
        col("ts").as("valid_from"),
        lead(col("ts"), 1).over(wo).as("valid_to"),
        row_number().over(wo).cast("long").as("version"))
      .withColumn("is_current", col("valid_to").isNull)
      .psort(col("user_id"), col("version"))
  }

  private val q90Sql =
    """WITH e AS (
      |  SELECT user_id, ts, event_id, event_type
      |  FROM events WHERE user_id < 50),
      |c AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM e),
      |ch AS (
      |  SELECT user_id, ts, event_id, event_type FROM c
      |  WHERE prev IS NULL OR prev <> event_type)
      |SELECT user_id, event_type, ts AS valid_from,
      |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version,
      |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
      |FROM ch ORDER BY user_id, version""".stripMargin

  /** q91: Z-order layout clustering — the data-layout op a 100 TB lakehouse
    * runs so multi-dimensional range predicates prune files: the low 16
    * bits of (customer, order-day) are bit-interleaved into a Morton key,
    * rows are range-bucketed by that key, and the report shows each
    * bucket's span in BOTH dimensions — the evidence that co-sorting by
    * zkey keeps both dimensions locally narrow (a single-column sort makes
    * one span tiny and leaves the other full-width; NewOpsR5dSpec asserts
    * the span-product win). Each dimension is quantile-normalized to an
    * 8-bit cell rank BEFORE interleaving — production z-ordering does the
    * same, because interleaving raw values degenerates toward a
    * single-column sort when ranges differ. The interleave is a
    * constant-folded bit expression (shiftleft/&, inside codegen); at scale
    * the rank comes from approx-quantile cutpoints, the bucket assignment
    * is `repartitionByRange(zkey)`, and this query is its audit. */
  private def zTermsSpark(c: String, d: String): String =
    (0 until 8).map(i =>
      s"shiftleft(shiftright($c, $i) & 1, ${2 * i}) + " +
        s"shiftleft(shiftright($d, $i) & 1, ${2 * i + 1})").mkString(" + ")

  private def zTermsSql(c: String, d: String): String =
    (0 until 8).map(i =>
      s"((($c >> $i) & 1) << ${2 * i}) + ((($d >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")

  private val q91: Q = (s, dir) => {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // persisted via the shared-pass lifecycle: DistributedRank's cut/count
    // passes (x3 dimensions) re-execute their input, so the slice is
    // materialized once instead of re-scanning parquet per pass — exactly
    // what the 100 TB pipeline does before a multi-pass layout job
    val o = memoized(s"q91slice:$dir") {
      t(s, dir, "orders").filter(col("o_orderkey") <= 2000)
        .select(col("o_orderkey"), col("o_custkey").as("cust"),
          expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') AS BIGINT)")
            .as("day"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    // quantile-normalize each dimension to an 8-bit cell rank first (what
    // production z-ordering does): interleaving RAW values loses when the
    // dimensions span different ranges — the wider dimension owns all the
    // significant bits and the key degenerates toward a single-column sort.
    // All three NTILEs run through DistributedRank (bucket-partitioned
    // exact ranks; no single-partition window), so the same plan shape
    // z-orders a 100 TB table — exactly how table formats compute z-cells
    // at scale. At that scale the `o` frame would be persisted between the
    // helper's passes; the gate slice makes that unnecessary here.
    import graft.operators.DistributedRank.{ntileFromRank, withGlobalRank, withGlobalRanks2}
    // both dimension ranks in SHARED cut/count passes (one multi-column
    // quantile job + one pairwise count job instead of two of each)
    val (rd, nRows) = withGlobalRanks2(o,
      col("cust"), Seq(col("cust"), col("o_orderkey")), "__rc",
      col("day"), Seq(col("day"), col("o_orderkey")), "__rd")
    val ranked = rd
      .withColumn("c8", (ntileFromRank(col("__rc"), 256, nRows) - 1).cast("long"))
      .withColumn("d8", (ntileFromRank(col("__rd"), 256, nRows) - 1).cast("long"))
      .drop("__rc", "__rd")
    // the z-keyed frame feeds the third rank's quantile/count/rank passes:
    // persist it (shared-pass lifecycle) so the two rank windows and the
    // bit-interleave expression execute once, not three times
    val keyed = memoized(s"q91keyed:$dir")(
      ranked.withColumn("zkey", expr(zTermsSpark("c8", "d8")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val (rz, _) = withGlobalRank(keyed, col("zkey"),
      Seq(col("zkey"), col("o_orderkey")), "__rz")
    rz.withColumn("bucket", ntileFromRank(col("__rz"), 16, nRows).cast("long"))
      .drop("__rz")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        (max(col("cust")) - min(col("cust"))).as("cust_span"),
        (max(col("day")) - min(col("day"))).as("day_span"),
        min(col("zkey")).as("zkey_lo"), max(col("zkey")).as("zkey_hi"))
      .psort(col("bucket"))
  }

  private val q91Sql = {
    s"""WITH o AS (
       |  SELECT o_orderkey, o_custkey AS cust,
       |    CAST(DATEDIFF('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
       |      AS BIGINT) AS day
       |  FROM orders WHERE o_orderkey <= 2000),
       |ranked AS (
       |  SELECT o_orderkey, cust, day,
       |    CAST(NTILE(256) OVER (ORDER BY cust, o_orderkey) - 1 AS BIGINT) AS c8,
       |    CAST(NTILE(256) OVER (ORDER BY day, o_orderkey) - 1 AS BIGINT) AS d8
       |  FROM o),
       |keyed AS (
       |  SELECT o_orderkey, cust, day, ${zTermsSql("c8", "d8")} AS zkey
       |  FROM ranked),
       |b AS (
       |  SELECT cust, day, zkey,
       |    CAST(NTILE(16) OVER (ORDER BY zkey, o_orderkey) AS BIGINT) AS bucket
       |  FROM keyed)
       |SELECT bucket, COUNT(*) AS n_rows,
       | MAX(cust) - MIN(cust) AS cust_span,
       | MAX(day) - MIN(day) AS day_span,
       | MIN(zkey) AS zkey_lo, MAX(zkey) AS zkey_hi
       |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  /** q92: ordered-sequence funnel (view → click → purchase within 7 days of
    * the first view) — the product-analytics query event warehouses live
    * on: each stage is the per-user MIN timestamp that respects the
    * previous stage's ordering, built as three (user)-keyed aggregations
    * chained by joins. Every join is keyed on user_id, so at scale the
    * three stages co-partition on one key (a single shuffle ancestry, AQE
    * broadcasts the shrinking stage frames); no window over the full event
    * stream is needed. Conversion ratios are exact-integer divisions. */
  private val q92: Q = (s, dir) => {
    import org.apache.spark.sql.functions._
    val e = t(s, dir, "events")
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
    val c = e.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts") > col("v_ts") &&
        col("ts") <= col("v_ts") + expr("interval 7 days"))
      .groupBy(col("user_id"), col("v_ts")).agg(min(col("ts")).as("c_ts"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") > col("c_ts") &&
        col("ts") <= col("v_ts") + expr("interval 7 days"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
    val nv = v.agg(count(lit(1)).as("n_view"))
    val nc = c.agg(count(lit(1)).as("n_click"))
    val np = p.agg(count(lit(1)).as("n_purchase"))
    nv.crossJoin(nc).crossJoin(np)
      .select(col("n_view"), col("n_click"), col("n_purchase"),
        (col("n_click").cast("double") / col("n_view").cast("double"))
          .as("view_to_click"),
        (col("n_purchase").cast("double") / col("n_click").cast("double"))
          .as("click_to_purchase"))
  }

  private val q92Sql =
    """WITH v AS (
      |  SELECT user_id, MIN(ts) AS v_ts FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, v.v_ts, MIN(e.ts) AS c_ts
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.v_ts
      |    AND e.ts <= v.v_ts + INTERVAL 7 DAY
      |  GROUP BY e.user_id, v.v_ts),
      |p AS (
      |  SELECT e.user_id, MIN(e.ts) AS p_ts
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
      |    AND e.ts <= c.v_ts + INTERVAL 7 DAY
      |  GROUP BY e.user_id)
      |SELECT
      |  (SELECT COUNT(*) FROM v) AS n_view,
      |  (SELECT COUNT(*) FROM c) AS n_click,
      |  (SELECT COUNT(*) FROM p) AS n_purchase,
      |  (SELECT COUNT(*) FROM c)::DOUBLE / (SELECT COUNT(*) FROM v)::DOUBLE
      |    AS view_to_click,
      |  (SELECT COUNT(*) FROM p)::DOUBLE / (SELECT COUNT(*) FROM c)::DOUBLE
      |    AS click_to_purchase""".stripMargin

  /** Materialize a source table bucketed + sorted on its join key (Spark-
    * native bucketing: `DataFrameWriter.bucketBy(...).sortBy(...)` into an
    * external parquet table). The pre-shuffle that makes repeated joins on
    * the key shuffle-free: each side reports the bucket HashPartitioning,
    * so the sort-merge join needs NO Exchange on either side — at 100 TB
    * this replaces a per-query corpus shuffle with a one-time layout cost
    * shared by every subsequent join on that key (SURVEY §9's bucketed-
    * table claim, exercised; reference anchor: the multi-topic join of
    * README.md:112-117). The `repartition(buckets, key)` before the write
    * aligns task partitioning with bucket ids so each bucket is ONE file
    * and the per-bucket sortBy order is usable as-is. Recreated only when
    * absent from the session catalog (the build-once lifecycle). */
  private def bucketedView(s: SparkSession, dir: String, src: String,
      key: String, cols: Seq[String], buckets: Int): DataFrame = {
    val tbl = s"graft_bkt_${src}_" + dir.replaceAll("[^A-Za-z0-9]", "_")
    if (!s.catalog.tableExists(tbl)) {
      // the external path is per-JVM: the catalog entry (and its cached
      // file listing) is session-local, so a SHARED path raced when a
      // concurrent JVM's overwrite deleted files this session had listed
      // (observed as a FILE_NOT_EXIST flake under parallel verify + test
      // runs)
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_bucketed_${ProcessHandle.current().pid()}/$tbl")
      // dataset-sized layout copy: register exit-time recursive deletion
      // (the per-PID dir would otherwise leak one orders+customer copy
      // per JVM run)
      graft.streaming.StreamingOps.trackTempDir(path.toPath)
      t(s, dir, src).select(cols.map(col): _*)
        .repartition(buckets, col(key))
        .write.mode("overwrite")
        .bucketBy(buckets, key).sortBy(key)
        .option("path", path.getAbsolutePath)
        .saveAsTable(tbl)
    }
    s.table(tbl)
  }

  /** q93: co-located join over bucketed layouts — both orders and customer
    * are materialized bucketed+sorted on the customer key, and the revenue
    * join runs with zero Exchange under the join (PlanSpec-asserted): the
    * one aggregate shuffle left is over |mktsegment| = 5 groups. The
    * `merge` hint pins the sort-merge strategy so the plan shape under
    * test is deterministic (a broadcast would also be shuffle-free, but
    * only while one side stays small — bucketing is the shape that holds
    * when BOTH sides are 100 TB). */
  private val q93: Q = (s, dir) => {
    val o = bucketedView(s, dir, "orders", "o_custkey",
      Seq("o_custkey", "o_totalprice"), 16)
    val c = bucketedView(s, dir, "customer", "c_custkey",
      Seq("c_custkey", "c_mktsegment"), 16)
    o.hint("merge").join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      .psort(col("c_mktsegment"))
  }

  private val q93Sql =
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q101: retention cohort matrix — the product-analytics staple over the
    * events stream: users are grouped into cohorts by their FIRST-activity
    * day, and each (cohort, day-offset) cell counts how many of that
    * cohort's users were active again offset days later (offsets 0..7).
    *
    * Scale: one per-user MIN aggregation (map-side partials) + one
    * (user, day) distinct — both hash shuffles keyed on user, so AQE
    * coalesces them onto one exchange; the cohort join is co-partitioned
    * on user_id and the final matrix is O(days x 8) rows. No windows, no
    * distinct-count expansion (the (user, day) pairs are already distinct,
    * so the cell count is a plain COUNT). */
  private val q101: Q = (s, dir) => {
    val e = t(s, dir, "events")
    val first = e.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort"))
    val active = e.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    active.join(first, Seq("user_id"))
      .withColumn("day_offset", datediff(col("d"), col("cohort")))
      .filter(col("day_offset") <= 7)
      .groupBy(col("cohort"), col("day_offset"))
      .agg(count(lit(1)).cast("long").as("n_users"))
      .psort(col("cohort"), col("day_offset"))
  }

  private val q101Sql =
    """WITH f AS (
      |  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort
      |  FROM events GROUP BY user_id),
      |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
      |SELECT f.cohort, DATEDIFF('day', f.cohort, a.d) AS day_offset,
      |  COUNT(*) AS n_users
      |FROM a JOIN f USING (user_id)
      |WHERE DATEDIFF('day', f.cohort, a.d) <= 7
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q102: event sessionization — the gap-rule session builder (a new
    * session starts after >30 min of inactivity) every product-analytics
    * and training-data-curation pipeline runs over its event stream.
    *
    * Determinism: gaps are measured on floor-second epochs (timestamp cast
    * to BIGINT seconds truncates identically in both engines), ties broken
    * by event_id, and the money sum is exact DECIMAL.
    *
    * Scale: both windows (the lag and the running session counter) are
    * PARTITIONED BY user_id — per-user frames, never a global window —
    * and the closing aggregation shuffles on the same (user) key, so AQE
    * plans one exchange. At 100 TB this is the canonical sessionize shape:
    * key by user, sort within key, no driver state. */
  private val q102: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val e = t(s, dir, "events").filter(col("user_id") <= 300)
      .withColumn("sec", col("ts").cast("long"))
      .withColumn("prev", lag(col("sec"), 1).over(w))
      .withColumn("ns",
        when(col("prev").isNull || col("sec") - col("prev") > 1800L, 1L)
          .otherwise(0L))
      .withColumn("session_no",
        sum(col("ns")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    e.groupBy(col("user_id"), col("session_no"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"),
        (max(col("sec")) - min(col("sec"))).as("duration_sec"))
      .psort(col("user_id"), col("session_no"))
  }

  private val q102Sql =
    """WITH x AS (
      |  SELECT user_id, ts, event_id, value,
      |    CAST(EPOCH_US(ts) // 1000000 AS BIGINT) AS sec
      |  FROM events WHERE user_id <= 300),
      |y AS (
      |  SELECT *, CASE WHEN LAG(sec) OVER w IS NULL
      |      OR sec - LAG(sec) OVER w > 1800 THEN 1 ELSE 0 END AS ns
      |  FROM x WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |z AS (
      |  SELECT *, CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      |  FROM y)
      |SELECT user_id, session_no,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
      |  MAX(sec) - MIN(sec) AS duration_sec
      |FROM z GROUP BY user_id, session_no
      |ORDER BY user_id, session_no""".stripMargin

  /** q103: MERGE-style SCD1 upsert — apply a change batch to a dimension
    * snapshot: matched keys take the source row, unmatched targets are
    * kept, unmatched sources are inserted (the MERGE WHEN MATCHED /
    * NOT MATCHED triad spelled as one full-outer join).
    *
    * Scale: a single shuffle full-outer join on the merge key — exactly
    * how a 100 TB MERGE executes (Delta/Iceberg plan the same join); if
    * the change batch is small it broadcasts instead (Spark picks that up
    * from AQE statistics automatically). Price arithmetic is exact
    * DECIMAL until the final double cast. */
  private val q103: Q = (s, dir) => {
    val o = t(s, dir, "orders").filter(col("o_orderkey") <= 500)
    val target = o.filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey"), col("o_orderstatus").as("t_status"),
        col("o_totalprice").cast("decimal(14,2)").as("t_price"))
    // the 10% bump stays an EXACT scale-4 decimal — a re-round to cents
    // would hit midpoint cells where Spark (HALF_UP) and DuckDB
    // (HALF_EVEN) disagree; exact decimals convert to the same double
    val source = o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), lit("U").as("s_status"),
        (col("o_totalprice").cast("decimal(14,2)")
          * lit(1.1).cast("decimal(3,2)")).cast("decimal(18,4)").as("s_price"))
    target.join(source, Seq("o_orderkey"), "full_outer")
      .select(col("o_orderkey"),
        coalesce(col("s_status"), col("t_status")).as("status"),
        coalesce(col("s_price"), col("t_price")).cast("double").as("price"),
        when(col("s_status").isNotNull && col("t_status").isNotNull,
          lit("updated"))
          .when(col("s_status").isNotNull, lit("inserted"))
          .otherwise(lit("kept")).as("action"))
      .psort(col("o_orderkey"))
  }

  private val q103Sql =
    """WITH o AS (SELECT * FROM orders WHERE o_orderkey <= 500),
      |t AS (
      |  SELECT o_orderkey, o_orderstatus AS t_status,
      |    CAST(o_totalprice AS DECIMAL(14,2)) AS t_price
      |  FROM o WHERE o_orderkey % 3 <> 0),
      |s AS (
      |  SELECT o_orderkey, 'U' AS s_status,
      |    CAST(CAST(o_totalprice AS DECIMAL(14,2))
      |      * CAST(1.1 AS DECIMAL(3,2)) AS DECIMAL(18,4)) AS s_price
      |  FROM o WHERE o_orderkey % 2 = 0)
      |SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
      |  COALESCE(s_status, t_status) AS status,
      |  CAST(COALESCE(s_price, t_price) AS DOUBLE) AS price,
      |  CASE WHEN s_status IS NOT NULL AND t_status IS NOT NULL THEN 'updated'
      |       WHEN s_status IS NOT NULL THEN 'inserted'
      |       ELSE 'kept' END AS action
      |FROM t FULL JOIN s ON t.o_orderkey = s.o_orderkey
      |ORDER BY o_orderkey""".stripMargin

  /** q104: cumulative DISTINCT count over a window — DuckDB accepts
    * `COUNT(DISTINCT x) OVER (...)` directly; Spark's window aggregates
    * reject DISTINCT. Business shape: per nation, how many DISTINCT
    * customers have ordered up through each month.
    *
    * Round 7: computed by the FIRST-APPEARANCE identity — the distinct
    * count up to month M equals the count of customers whose FIRST month
    * is <= M — so the plan is three hash aggregations (distinct base,
    * first month per customer, new-customer count per month) plus one
    * running sum over the O(nations x months) grid. NO window ever holds
    * per-entity state: the earlier size(collect_set OVER w) rewrite kept
    * every distinct customer of a nation inside one task's window state,
    * the exact memory shape that breaks at 100 TB entity cardinality
    * (measured at sf1: 6.2 s -> 0.6 s, answer identical). */
  private val q104: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val base = o.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), trunc(col("o_orderdate"), "MM").as("mon"),
        col("c_custkey"))
      .distinct()
    // Round 7: the cumulative DISTINCT count is computed by the
    // FIRST-APPEARANCE identity — count(distinct c) up to month M ==
    // count of customers whose first month <= M — instead of a
    // collect_set window. collect_set carried EVERY distinct customer of
    // the nation in window state (the one memory shape that breaks at
    // 100 TB: state grows with entity cardinality); this is three hash
    // aggregations plus a running sum over the O(nations x months) grid.
    // Measured at sf1: 6.2 s -> sub-second, and the answer is identical.
    val first = base.groupBy(col("n_name"), col("c_custkey"))
      .agg(min(col("mon")).as("fmon"))
    val adds = first.groupBy(col("n_name"), col("fmon").as("mon"))
      .agg(count(lit(1)).as("n_new"))
    val months = base.select(col("n_name"), col("mon")).distinct()
    val w = Window.partitionBy(col("n_name")).orderBy(col("mon"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    months.join(adds, Seq("n_name", "mon"), "left")
      .withColumn("cum_custs",
        sum(coalesce(col("n_new"), lit(0L))).over(w).cast("long"))
      .select(col("n_name"), col("mon"), col("cum_custs"))
      .psort(col("n_name"), col("mon"))
  }

  private val q104Sql =
    """WITH base AS (
      |  SELECT DISTINCT n_name, DATE_TRUNC('month', o_orderdate) AS mon,
      |    c_custkey
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey)
      |SELECT DISTINCT n_name, mon,
      |  COUNT(DISTINCT c_custkey) OVER
      |    (PARTITION BY n_name ORDER BY mon) AS cum_custs
      |FROM base ORDER BY n_name, mon""".stripMargin

  /** q105: TPC-H Q7 "volume shipping" shape — revenue between two chosen
    * nations by (supplier nation, customer nation, year), the canonical
    * multi-join star query: lineitem x orders x supplier x customer with
    * two nation dims filtered to a 2-nation pair set.
    *
    * Scale: the fact-to-fact joins (lineitem-orders on orderkey) shuffle
    * on their keys; supplier/customer joins hash on the fact side; both
    * nation dims are broadcast (tiny) with the nation-pair predicate
    * BELOW the join so non-qualifying rows die before the big joins.
    * Revenue is exact DECIMAL until the final double cast — Q7's
    * float-drift trap avoided by construction. */
  private val q105: Q = (s, dir) => {
    val l = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val su = t(s, dir, "supplier")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val n1 = broadcast(n.filter(col("n_name").isin("NATION_1", "NATION_2"))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val n2 = broadcast(n.filter(col("n_name").isin("NATION_1", "NATION_2"))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(su, col("l_suppkey") === col("s_suppkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n1, col("s_nationkey") === col("s_nk"))
      .join(n2, col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .select(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"),
        (dec2(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(6, 4)) - dec4(col("l_discount"))))
          .as("vol"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(asDouble(sum(col("vol"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .psort(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  private val q105Sql =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |    (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4))))
      |    AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE n1.n_name IN ('NATION_1', 'NATION_2')
      |  AND n2.n_name IN ('NATION_1', 'NATION_2')
      |  AND n1.n_name <> n2.n_name
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** q106: time-weighted average — the TWAP/financial-metrics staple: each
    * event's value is weighted by how long it remained current (until the
    * user's next event), so bursts of rapid events don't dominate a
    * sparse-but-stable signal. The numerator is EXACT — DECIMAL(12,2)
    * value x integer seconds, summed in decimal, cast to double once —
    * and the final division is the same IEEE double op in both engines.
    *
    * Scale: one user-partitioned lead window (per-user frames, never
    * global) and one user-keyed aggregation — AQE plans one exchange for
    * both. The canonical interval-weighting shape at any scale. */
  private val q106: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("sec", col("ts").cast("long"))
      .withColumn("next_sec", lead(col("sec"), 1).over(w))
      .filter(col("next_sec").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum((col("next_sec") - col("sec"))).as("duration_sec"),
        asDouble(sum(dec2(col("value")) * (col("next_sec") - col("sec"))))
          .as("weighted_sum"))
      .filter(col("duration_sec") > 0)
      .withColumn("twa",
        col("weighted_sum") / col("duration_sec").cast("double"))
      .psort(col("user_id"))
  }

  private val q106Sql =
    """WITH x AS (
      |  SELECT user_id, event_id, value,
      |    CAST(EPOCH_US(ts) // 1000000 AS BIGINT) AS sec,
      |    LEAD(CAST(EPOCH_US(ts) // 1000000 AS BIGINT)) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id) AS next_sec
      |  FROM events),
      |agg AS (
      |  SELECT user_id, COUNT(*) AS n_intervals,
      |    CAST(SUM(next_sec - sec) AS BIGINT) AS duration_sec,
      |    CAST(SUM(CAST(value AS DECIMAL(12,2)) * (next_sec - sec))
      |      AS DOUBLE) AS weighted_sum
      |  FROM x WHERE next_sec IS NOT NULL GROUP BY user_id)
      |SELECT user_id, n_intervals, duration_sec, weighted_sum,
      |  weighted_sum / CAST(duration_sec AS DOUBLE) AS twa
      |FROM agg WHERE duration_sec > 0 ORDER BY user_id""".stripMargin

  /** q109: ordered string aggregation — DuckDB's `STRING_AGG(x, ','
    * ORDER BY y)` and Spark 4's `listagg(x, ',') WITHIN GROUP (ORDER BY
    * y)` are the same aggregate; the ORDER BY inside the aggregate is
    * what makes the concatenation deterministic (an unordered string_agg
    * is nondeterministic under parallelism — never ship one).
    *
    * Scale: one hash aggregation; per-group state is the concatenated
    * payload, so production callers bound group size first (the <= 300
    * slice here stands in for that gate). */
  private val q109: Q = (s, dir) => {
    t(s, dir, "orders")
      .filter(col("o_orderkey") <= 300)
      .groupBy(col("o_custkey"))
      .agg(
        expr("listagg(cast(o_orderkey as string), ',') " +
          "within group (order by o_orderkey)").as("order_keys"),
        count(lit(1)).as("n_orders"),
        expr("listagg(distinct o_orderstatus, '|') " +
          "within group (order by o_orderstatus)").as("statuses"))
      .psort(col("o_custkey"))
  }

  private val q109Sql =
    """SELECT o_custkey,
      |  STRING_AGG(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey)
      |    AS order_keys,
      |  COUNT(*) AS n_orders,
      |  STRING_AGG(DISTINCT o_orderstatus, '|' ORDER BY o_orderstatus)
      |    AS statuses
      |FROM orders WHERE o_orderkey <= 300
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // ---- q122: skyline (Pareto frontier) --------------------------------------
  /** q122: SKYLINE — the Pareto frontier minimizing (price, size) over
    * `part`: a row is in the answer iff no other row is <= in both
    * dimensions and strictly < in one. The multi-objective shortlist query
    * every curation/serving stack runs ("no config dominated on both cost
    * and quality"), and an operator DuckDB users spell with NOT EXISTS.
    *
    * Scale shape (the naive spelling is an O(n²) self-join): collapse to
    * per-price group minima (one shuffle with map-side partials), then an
    * exact DISTRIBUTED prefix-scan of the running minimum in price order —
    * range-bucket the price domain, per-bucket windows (partitionBy bucket,
    * so no global single-task window; PlanSpec ban), and a <=65-row
    * per-bucket-minimum broadcast carrying the scan across buckets (the
    * DistributedRank marginals pattern). A final equi-join back on price
    * keeps ties: every undominated row appears, including duplicates of a
    * frontier point (neither strictly beats the other). */
  private val q122: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val pts = t(s, dir, "part").select(col("p_partkey"),
      round(col("p_retailprice") * 100).cast("long").as("cents"),
      col("p_size").cast("int").as("p_size"))
    val mm = pts.agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
      .head() // 1-row scalar agg: bounded by construction
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val width = math.max(1L, (hi - lo) / 64 + 1)
    val gmins = pts
      .withColumn("b", expr(s"(cents - ${lo}L) div ${width}L"))
      .groupBy(col("b"), col("cents")).agg(min(col("p_size")).as("gmin"))
    // cross-bucket leg of the prefix-scan: <=65 bucket minima to the
    // driver, prefix-min'd, broadcast back (O(buckets) rows)
    val bmins = gmins.groupBy(col("b")).agg(min(col("gmin")).as("bm"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    val prefix: Seq[(Long, Integer)] = {
      var run: Integer = null
      bmins.toSeq.map { case (b, bm) =>
        val out = (b, run)
        run = if (run == null) Int.box(bm) else Int.box(math.min(run, bm))
        out
      }
    }
    val prefDf = {
      import s.implicits._
      prefix.map { case (b, p) =>
        (b, Option(p).map(_.intValue)) }.toDF("b", "bprev")
        .select(col("b"), col("bprev").cast("int").as("bprev"))
    }
    val wb = Window.partitionBy(col("b")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val fr = gmins.withColumn("inprev", min(col("gmin")).over(wb))
      .join(broadcast(prefDf), Seq("b"))
      // least() skips NULLs in Spark: the running strict-prefix minimum
      .withColumn("prev", least(col("inprev"), col("bprev")))
      .select(col("cents"), col("gmin"), col("prev"))
    pts.join(fr, Seq("cents"))
      .filter(col("p_size") === col("gmin") &&
        (col("prev").isNull || col("prev") > col("p_size")))
      .select(col("p_partkey"), col("cents"), col("p_size"))
      .psort(col("cents"), col("p_partkey"))
  }

  private val q122Sql =
    """WITH pts AS (
      |  SELECT p_partkey, CAST(ROUND(p_retailprice * 100) AS BIGINT) AS cents,
      |    p_size
      |  FROM part),
      |g AS (SELECT cents, MIN(p_size) AS gmin FROM pts GROUP BY cents),
      |f AS (
      |  SELECT cents, gmin,
      |    MIN(gmin) OVER (ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
      |  FROM g)
      |SELECT p.p_partkey, p.cents, p.p_size
      |FROM pts p JOIN f USING (cents)
      |WHERE p.p_size = f.gmin AND (f.prev IS NULL OR f.prev > p.p_size)
      |ORDER BY cents, p_partkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "q122_skyline" -> q122,
    "q109_string_agg" -> q109,
    "q106_time_weighted" -> q106,
    "q104_window_distinct" -> q104,
    "q105_volume_shipping" -> q105,
    "q102_sessionize" -> q102,
    "q103_merge_upsert" -> q103,
    "q101_retention_cohorts" -> q101,
    "q93_bucketed_join" -> q93,
    "q92_funnel" -> q92,
    "q91_zorder_layout" -> q91,
    "q89_gap_fill" -> q89,
    "q90_scd2" -> q90,
    "q65_stats_moments" -> q65,
    "q66_higher_order" -> q66,
    "q67_interval_arith" -> q67,
    "q68_frame_exclude_more" -> q68,
    "q69_positional_join" -> q69,
    "q70_summarize" -> q70,
    "q72_groups_frame" -> q72,
    "q73_order_by_all" -> q73)

  val oracleSql: Map[String, String] = Map(
    "q122_skyline" -> q122Sql,
    "q109_string_agg" -> q109Sql,
    "q106_time_weighted" -> q106Sql,
    "q104_window_distinct" -> q104Sql,
    "q105_volume_shipping" -> q105Sql,
    "q102_sessionize" -> q102Sql,
    "q103_merge_upsert" -> q103Sql,
    "q101_retention_cohorts" -> q101Sql,
    "q93_bucketed_join" -> q93Sql,
    "q92_funnel" -> q92Sql,
    "q91_zorder_layout" -> q91Sql,
    "q89_gap_fill" -> q89Sql,
    "q90_scd2" -> q90Sql,
    "q65_stats_moments" -> q65Text,
    "q66_higher_order" -> q66Sql,
    "q67_interval_arith" -> q67Text,
    "q68_frame_exclude_more" -> q68Sql,
    "q69_positional_join" -> q69Sql,
    "q70_summarize" -> q70Text,
    "q72_groups_frame" -> q72Sql,
    "q73_order_by_all" -> q73Text)
}
