package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import QueryHelpers._

/** Extended relational surface: set ops, subqueries, CTEs, grouping sets,
  * aggregate variants, scalar function batteries, pivot/unpivot,
  * deterministic sampling, as-of + range joins (SURVEY.md §2.2).
  *
  * Subquery/CTE queries intentionally go through spark.sql over registered
  * temp views — SQL passthrough IS the reference's user surface
  * (reference: KwackEngine.java:226-257).
  */
object RelationalExt {

  private def sql(q: String): Q = (s, dir) => {
    graft.Tables.register(s, dir)
    s.sql(q)
  }

  /** UNION ALL / INTERSECT / EXCEPT over nation keys of customers vs suppliers. */
  private val q13: Q = (s, dir) => {
    val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
    val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
    val all = c.union(sup).groupBy(col("nationkey")).count()
      .select(col("nationkey"), lit("union_all").as("op"), col("count").as("n"))
    val inter = c.intersect(sup)
      .select(col("nationkey"), lit("intersect").as("op"), lit(1L).as("n"))
    val exc = c.except(sup)
      .select(col("nationkey"), lit("except").as("op"), lit(1L).as("n"))
    all.union(inter).union(exc).psort(col("op"), col("nationkey"))
  }

  private val q13Sql =
    """WITH c AS (SELECT c_nationkey AS nationkey FROM customer),
      |     s AS (SELECT s_nationkey AS nationkey FROM supplier),
      |     u AS (SELECT nationkey, 'union_all' AS op, COUNT(*) AS n
      |           FROM (SELECT * FROM c UNION ALL SELECT * FROM s) GROUP BY 1),
      |     i AS (SELECT nationkey, 'intersect' AS op, 1::BIGINT AS n
      |           FROM (SELECT * FROM c INTERSECT SELECT * FROM s)),
      |     e AS (SELECT nationkey, 'except' AS op, 1::BIGINT AS n
      |           FROM (SELECT * FROM c EXCEPT SELECT * FROM s))
      |SELECT * FROM u UNION ALL SELECT * FROM i UNION ALL SELECT * FROM e
      |ORDER BY op, nationkey""".stripMargin

  /** DISTINCT ON semantics: latest event per user (window dedupe). */
  private val q14: Q = (s, dir) => {
    val e = t(s, dir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    e.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .psort(col("user_id"))
  }

  private val q14Sql =
    """SELECT user_id, event_id, event_type FROM (
      |  SELECT user_id, event_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** Scalar subquery: parts above the average retail price. */
  private val q15 = sql(
    """SELECT p_partkey, p_name
      |FROM part
      |WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
      |ORDER BY p_partkey""".stripMargin)

  private val q15Sql =
    """SELECT p_partkey, p_name
      |FROM part
      |WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
      |ORDER BY p_partkey""".stripMargin

  /** IN subquery. */
  private val q16 = sql(
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin)

  private val q16Sql = q16AsString

  private def q16AsString: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** Correlated EXISTS subquery (Catalyst decorrelates to a semi join). */
  private val q17text =
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_suppkey = s_suppkey AND l_quantity >= 49
      |    AND l_shipdate >= TIMESTAMP '2001-01-01 00:00:00')
      |ORDER BY s_suppkey""".stripMargin
  private val q17 = sql(q17text)

  /** CTE (TPC-H Q15 shape): supplier(s) with maximal revenue. */
  private val q18text =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin
  /** Spark inlines deterministic CTEs, so the twice-referenced `revenue`
    * would be computed twice; the DataFrame form materializes it once
    * (what DuckDB's CTE materialization does for the oracle). */
  private val q18: Q = (s, dir) => {
    val rev = memoized(s"q18rev:$dir") {
      t(s, dir, "lineitem")
        .filter(expr("l_shipdate >= TIMESTAMP '1998-01-01 00:00:00' AND " +
          "l_shipdate < TIMESTAMP '1999-01-01 00:00:00'"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(expr("CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
          "(1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE)").as("total_revenue"))
        .persist()
    }
    val mx = rev.agg(max(col("total_revenue")).as("mx"))
    t(s, dir, "supplier")
      .join(rev, col("s_suppkey") === col("supplier_no"))
      .join(broadcast(mx))
      .filter(col("total_revenue") === col("mx"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .psort(col("s_suppkey"))
  }

  /** ROLLUP with GROUPING() tags. */
  private val q19: Q = (s, dir) => {
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"),
        grouping(col("l_returnflag")).as("g_rf"),
        grouping(col("l_linestatus")).as("g_ls"))
      .psort(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus"))
  }

  private val q19Sql =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      | CAST(GROUPING(l_returnflag) AS TINYINT) AS g_rf,
      | CAST(GROUPING(l_linestatus) AS TINYINT) AS g_ls
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin

  /** CUBE. */
  private val q20: Q = (s, dir) => {
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        grouping(col("o_orderstatus")).as("g_st"),
        grouping(col("o_orderpriority")).as("g_pr"))
      .psort(col("g_st"), col("g_pr"), col("o_orderstatus"), col("o_orderpriority"))
  }

  private val q20Sql =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      | CAST(GROUPING(o_orderstatus) AS TINYINT) AS g_st,
      | CAST(GROUPING(o_orderpriority) AS TINYINT) AS g_pr
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY g_st, g_pr, o_orderstatus, o_orderpriority""".stripMargin

  /** Aggregate variants: FILTER clause, arg_min/arg_max (tie-safe composite
    * key), DISTINCT aggregate. */
  private val q21: Q = (s, dir) => {
    val o = t(s, dir, "orders")
    // tie-safe sort key: cents * 1e7 + orderkey (both unique & exact)
    val sortKey = round(col("o_totalprice") * 100).cast("long") * 10000000L + col("o_orderkey")
    o.groupBy(col("o_orderstatus"))
      .agg(
        count(when(col("o_orderpriority") === "1-URGENT", 1)).as("n_urgent"),
        max_by(col("o_orderkey"), sortKey).as("top_order"),
        min_by(col("o_orderkey"), sortKey).as("bottom_order"),
        countDistinct(col("o_custkey")).as("n_custs"))
      .psort(col("o_orderstatus"))
  }

  private val q21Sql =
    """SELECT o_orderstatus,
      | COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
      | ARG_MAX(o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey) AS top_order,
      | ARG_MIN(o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey) AS bottom_order,
      | COUNT(DISTINCT o_custkey) AS n_custs
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Ordered list/string aggregation. */
  private val q22: Q = (s, dir) => {
    val n = t(s, dir, "nation")
    n.groupBy(col("n_regionkey"))
      .agg(
        concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"),
        count(lit(1)).as("n"))
      .psort(col("n_regionkey"))
  }

  private val q22Sql =
    """SELECT n_regionkey, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations, COUNT(*) AS n
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  /** approx_count_distinct (HLL): engines' sketches differ, so the oracle
    * contract is "within 15% of exact" (deterministic boolean both sides)
    * plus the exact count. */
  private val q23: Q = (s, dir) => {
    val l = t(s, dir, "lineitem")
    l.agg(
        countDistinct(col("l_orderkey")).as("exact_orders"),
        (abs(approx_count_distinct(col("l_orderkey")) - countDistinct(col("l_orderkey")))
          < countDistinct(col("l_orderkey")) * 0.15).as("approx_within_15pct"))
  }

  private val q23Sql =
    """SELECT COUNT(DISTINCT l_orderkey) AS exact_orders,
      | ABS(approx_count_distinct(l_orderkey) - COUNT(DISTINCT l_orderkey))
      |   < COUNT(DISTINCT l_orderkey) * 0.15 AS approx_within_15pct
      |FROM lineitem""".stripMargin

  /** String function battery. */
  private val q24: Q = (s, dir) => {
    val p = t(s, dir, "part").filter(col("p_partkey") <= 50)
    p.select(
        col("p_partkey"),
        upper(col("p_name")).as("u"),
        lower(col("p_brand")).as("l"),
        substring(col("p_type"), 1, 5).as("sub"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("cat"),
        length(col("p_name")).as("len"),
        trim(lit("  x  ")).as("trimmed"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("rx"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("padded"),
        col("p_name").like("%le%").as("has_le"),
        levenshtein(col("p_brand"), lit("Brand#1")).as("lev"))
      .psort(col("p_partkey"))
  }

  private val q24Sql =
    """SELECT p_partkey, UPPER(p_name) AS u, LOWER(p_brand) AS l,
      | SUBSTR(p_type, 1, 5) AS sub,
      | p_brand || '#' || p_type AS cat,
      | LENGTH(p_name) AS len,
      | TRIM('  x  ') AS trimmed,
      | REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS rx,
      | LPAD(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
      | p_name LIKE '%le%' AS has_le,
      | LEVENSHTEIN(p_brand, 'Brand#1') AS lev
      |FROM part WHERE p_partkey <= 50 ORDER BY p_partkey""".stripMargin

  /** Date/time function battery (dow aligned to Spark's 1=Sunday). */
  private val q25: Q = (s, dir) => {
    val o = t(s, dir, "orders").filter(col("o_orderkey") <= 100)
    o.select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        dayofweek(col("o_orderdate")).as("dow"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        last_day(col("o_orderdate")).cast("timestamp").as("month_end"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_2002"),
        (col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("plus90"))
      .psort(col("o_orderkey"))
  }

  private val q25Sql =
    """SELECT o_orderkey,
      | CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS y,
      | CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS m,
      | CAST(EXTRACT(day FROM o_orderdate) AS INTEGER) AS d,
      | CAST(EXTRACT(dow FROM o_orderdate) + 1 AS INTEGER) AS dow,
      | CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
      | CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
      | CAST(EPOCH(o_orderdate) AS BIGINT) AS epoch_s,
      | CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_2002,
      | o_orderdate + INTERVAL 90 DAY AS plus90
      |FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey""".stripMargin

  /** Math battery (transcendentals rounded to dodge libm ULP drift). */
  private val q26: Q = (s, dir) => {
    val l = t(s, dir, "lineitem").filter(col("l_orderkey") <= 20)
    l.select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 1).as("r1"),
        floor(col("l_extendedprice")).as("fl"),
        ceil(col("l_extendedprice")).as("ce"),
        abs(col("l_extendedprice") * -1).as("ab"),
        round(sqrt(col("l_quantity")), 6).as("sq"),
        round(log(col("l_extendedprice")), 6).as("lg"),
        round(pow(col("l_quantity"), 2), 6).as("p2"),
        pmod(col("l_orderkey"), lit(7)).as("md"),
        (col("l_orderkey").bitwiseAND(5)).as("band"),
        (col("l_orderkey").bitwiseOR(8)).as("bor"),
        shiftleft(col("l_linenumber"), 2).as("shl"),
        signum(col("l_discount") - 0.05).as("sgn"))
      .psort(col("l_orderkey"), col("l_linenumber"))
  }

  private val q26Sql =
    """SELECT l_orderkey, l_linenumber,
      | ROUND(l_extendedprice, 1) AS r1,
      | CAST(FLOOR(l_extendedprice) AS BIGINT) AS fl,
      | CAST(CEIL(l_extendedprice) AS BIGINT) AS ce,
      | ABS(l_extendedprice * -1) AS ab,
      | ROUND(SQRT(l_quantity), 6) AS sq,
      | ROUND(LN(l_extendedprice), 6) AS lg,
      | ROUND(POW(l_quantity, 2), 6) AS p2,
      | l_orderkey % 7 AS md,
      | (l_orderkey & 5) AS band,
      | (l_orderkey | 8) AS bor,
      | l_linenumber << 2 AS shl,
      | CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS sgn
      |FROM lineitem WHERE l_orderkey <= 20 ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Conditional expressions: CASE, COALESCE, NULLIF, GREATEST/LEAST. */
  private val q27: Q = (s, dir) => {
    val o = t(s, dir, "orders").filter(col("o_orderkey") <= 200)
    o.select(
        col("o_orderkey"),
        when(col("o_totalprice") > 200000, "big")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("small").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_alias"),
        greatest(col("o_custkey"), col("o_orderkey") % 100).as("g"),
        least(col("o_custkey"), col("o_orderkey") % 100).as("lst"))
      .psort(col("o_orderkey"))
  }

  private val q27Sql =
    """SELECT o_orderkey,
      | CASE WHEN o_totalprice > 200000 THEN 'big'
      |      WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket,
      | COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_alias,
      | GREATEST(o_custkey, o_orderkey % 100) AS g,
      | LEAST(o_custkey, o_orderkey % 100) AS lst
      |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin

  /** Array / higher-order functions over tokenized text (scalar outputs). */
  private val q28: Q = (s, dir) => {
    val d = t(s, dir, "documents").filter(col("doc_id") <= 50)
    val words = split(col("text"), " ")
    d.select(
        col("doc_id"),
        size(words).as("n_words"),
        size(array_distinct(words)).as("n_distinct"),
        array_contains(words, "spark").as("has_spark"),
        concat_ws("|", slice(sort_array(array_distinct(words)), 1, 3)).as("first3"),
        aggregate(transform(words, w => length(w)), lit(0), (a, x) => a + x).as("sum_len"),
        size(filter(words, w => length(w) > 4)).as("n_long"))
      .psort(col("doc_id"))
  }

  private val q28Sql =
    """SELECT doc_id,
      | LEN(STRING_SPLIT(text, ' ')) AS n_words,
      | LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS n_distinct,
      | LIST_CONTAINS(STRING_SPLIT(text, ' '), 'spark') AS has_spark,
      | ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(STRING_SPLIT(text, ' ')))[1:3], '|') AS first3,
      | LIST_REDUCE(LIST_PREPEND(0, LIST_TRANSFORM(STRING_SPLIT(text, ' '), w -> LENGTH(w))), (a, x) -> a + x) AS sum_len,
      | LEN(LIST_FILTER(STRING_SPLIT(text, ' '), w -> LENGTH(w) > 4)) AS n_long
      |FROM documents WHERE doc_id <= 50 ORDER BY doc_id""".stripMargin

  /** Struct/map construction + field access (scalar outputs). */
  private val q29: Q = (s, dir) => {
    val e = t(s, dir, "events").filter(col("event_id") <= 100)
    val st = struct(col("event_type").as("et"), col("value").as("v"))
    val m = map(col("event_type"), col("value"))
    e.select(
        col("event_id"),
        st.getField("et").as("type_via_struct"),
        round(st.getField("v").cast("double"), 2).as("value_via_struct"),
        map_keys(m).getItem(0).as("mkey"),
        element_at(m, col("event_type")).as("mval"))
      .psort(col("event_id"))
  }

  private val q29Sql =
    """SELECT event_id,
      | struct_extract({'et': event_type, 'v': value}, 'et') AS type_via_struct,
      | ROUND(struct_extract({'et': event_type, 'v': value}, 'v'), 2) AS value_via_struct,
      | map_keys(MAP([event_type],[value]))[1] AS mkey,
      | (MAP([event_type],[value])[event_type])[1] AS mval
      |FROM events WHERE event_id <= 100 ORDER BY event_id""".stripMargin

  /** JSON extraction from the raw props column (reference's JSON column
    * surface: SURVEY.md §1.2 JSON type + §2.2 JSON functions). */
  private val q30: Q = (s, dir) => {
    val e = t(s, dir, "events").filter(col("event_id") <= 200)
    e.select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"),
        get_json_object(col("props"), "$.missing").isNull.as("missing_is_null"))
      .psort(col("event_id"))
  }

  private val q30Sql =
    """SELECT event_id,
      | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
      | json_extract_string(props, '$.missing') IS NULL AS missing_is_null
      |FROM events WHERE event_id <= 200 ORDER BY event_id""".stripMargin

  /** PIVOT: event counts per user bucket across event types. */
  private val q31: Q = (s, dir) => {
    val e = t(s, dir, "events")
    e.withColumn("bucket", col("user_id") % 10)
      .groupBy(col("bucket"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0L)
      .psort(col("bucket"))
  }

  private val q31Sql =
    """SELECT user_id % 10 AS bucket,
      | COUNT(*) FILTER (WHERE event_type = 'click') AS click,
      | COUNT(*) FILTER (WHERE event_type = 'error') AS error,
      | COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      | COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
      | COUNT(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin

  /** UNPIVOT / melt. */
  private val q32: Q = (s, dir) => {
    val p = t(s, dir, "part").filter(col("p_partkey") <= 30)
      .select(col("p_partkey"),
        col("p_size").cast("double").as("size"),
        round(col("p_retailprice"), 2).as("retailprice"))
    p.unpivot(Array(col("p_partkey")), Array(col("size"), col("retailprice")),
        "measure", "val")
      .psort(col("p_partkey"), col("measure"))
  }

  private val q32Sql =
    """SELECT p_partkey, measure, val FROM (
      |  SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS val FROM part WHERE p_partkey <= 30
      |  UNION ALL
      |  SELECT p_partkey, 'retailprice' AS measure, ROUND(p_retailprice, 2) AS val FROM part WHERE p_partkey <= 30)
      |ORDER BY p_partkey, measure""".stripMargin

  /** Deterministic hash-based sampling (md5-derived; production would use
    * df.sample, but a seeded sample can't hash-match across engines). */
  private val q33: Q = (s, dir) => {
    val o = t(s, dir, "orders")
    o.filter(pmod(md5i(col("o_orderkey").cast("string")), lit(10)) === 0)
      .select(col("o_orderkey"), col("o_orderstatus"))
      .psort(col("o_orderkey"))
  }

  private val q33Sql =
    s"""SELECT o_orderkey, o_orderstatus FROM orders
       |WHERE ${md5iSql("CAST(o_orderkey AS VARCHAR)")} % 10 = 0
       |ORDER BY o_orderkey""".stripMargin

  /** AS-OF join: each event matched to the user's latest prior order.
    * Right side deduped per (key, time) for determinism. Oracle uses
    * DuckDB's native ASOF LEFT JOIN. */
  private val q34: Q = (s, dir) => {
    val e = t(s, dir, "events").filter(col("event_id") <= 300)
      .select(col("event_id"), col("user_id"), col("ts"))
    val o = t(s, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    val dedup = o.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("o_custkey").as("user_id"), col("o_orderdate"),
        col("o_orderkey"), round(col("o_totalprice"), 2).as("o_price"))
    graft.operators.AsofJoin.asofLeft(e, dedup, Seq("user_id"), "ts", "o_orderdate")
      .psort(col("event_id"))
  }

  private val q34Sql =
    """WITH dedup AS (
      |  SELECT o_custkey AS user_id, o_orderdate, o_orderkey, ROUND(o_totalprice, 2) AS o_price
      |  FROM orders QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) = 1)
      |SELECT e.event_id, e.user_id, e.ts, d.o_orderkey, d.o_price
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_id <= 300) e
      |ASOF LEFT JOIN dedup d ON e.user_id = d.user_id AND d.o_orderdate <= e.ts
      |ORDER BY e.event_id""".stripMargin

  /** AS-OF via the native custom operator (logical node + strategy +
    * sort-merge AsofJoinExec, operators/AsofJoinNative.scala) — same
    * semantics as q34's window composition, independently oracle-gated. */
  private val q51: Q = (s, dir) => {
    val e = t(s, dir, "events").filter(col("event_id") <= 300)
      .select(col("event_id"), col("user_id"), col("ts"))
    // r13 (guide §2.4 — share one exchange): hash-cluster orders on the
    // JOIN key before the dedup window. HashPartitioning(o_custkey)
    // satisfies both the window's ClusteredDistribution(o_custkey,
    // o_orderdate) and the asof exec's ClusteredDistribution(user_id), and
    // the window's (custkey, orderdate, orderkey desc) sort is a prefix-
    // satisfier of the asof's (user_id, o_orderdate) requirement — so the
    // right side pays ONE exchange + ONE sort instead of two of each.
    val o = t(s, dir, "orders").repartition(col("o_custkey"))
    val w = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    val dedup = o.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("o_custkey").as("user_id"), col("o_orderdate"),
        col("o_orderkey"), round(col("o_totalprice"), 2).as("o_price"))
    graft.operators.AsofJoinNative.asofLeft(e, dedup, Seq("user_id"), "ts", "o_orderdate")
      .select(col("event_id"), col("user_id"), col("ts"), col("o_orderkey"), col("o_price"))
      .psort(col("event_id"))
  }

  /** q98: FORWARD as-of through the native operator — each event matched to
    * the SAME user's next event STRICTLY later (the "next action" join
    * sessionization and funnel attribution run on). Exercises the forward
    * direction `operators/AsofJoinNative.asofLeftForward` adds by negating
    * the time axes (strictness via exact -1 µs integer arithmetic); DuckDB's
    * oracle spells the same thing natively as `ASOF LEFT JOIN ... ON
    * e.ts < d.next_ts`. Right side deduped per (user, ts) keeping the
    * largest event_id (the q34 determinism convention).
    *
    * Scale: identical cost shape to the backward native asof — one shuffle
    * + sort per side, streaming merge, zero buffering. */
  private val q98: Q = (s, dir) => {
    val e = t(s, dir, "events").filter(col("event_id") <= 300)
      .select(col("event_id"), col("user_id"), col("ts"))
    val w = Window.partitionBy(col("user_id"), col("next_ts"))
      .orderBy(col("next_event").desc)
    // r13: same one-exchange discipline as q51 — cluster on user_id once,
    // the dedup window and the forward asof both ride it
    val r = t(s, dir, "events")
      .select(col("user_id"), col("ts").as("next_ts"),
        col("event_id").as("next_event"), col("event_type").as("next_type"))
      .repartition(col("user_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    graft.operators.AsofJoinNative
      .asofLeftForward(e, r, Seq("user_id"), "ts", "next_ts", strict = true)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("next_event"), col("next_ts"), col("next_type"))
      .psort(col("event_id"))
  }

  private val q98Sql =
    """WITH dedup AS (
      |  SELECT user_id, ts AS next_ts, event_id AS next_event, event_type AS next_type
      |  FROM events
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1)
      |SELECT e.event_id, e.user_id, e.ts, d.next_event, d.next_ts, d.next_type
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_id <= 300) e
      |ASOF LEFT JOIN dedup d ON e.user_id = d.user_id AND e.ts < d.next_ts
      |ORDER BY e.event_id""".stripMargin

  /** Range (inequality) join: lineitems shipped within 30 days of order. */
  private val q35: Q = (s, dir) => {
    val l = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    l.join(o, col("l_orderkey") === col("o_orderkey")
        && col("l_shipdate") >= col("o_orderdate")
        && col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_fast_ship"),
        dsum(col("l_extendedprice")).as("fast_revenue"))
      .psort(col("o_orderstatus"))
  }

  private val q35Sql =
    """SELECT o_orderstatus, COUNT(*) AS n_fast_ship,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS fast_revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  AND l_shipdate >= o_orderdate
      |  AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** LATERAL correlated subquery: top-2 orders per customer by price.
    * Catalyst decorrelates the per-row limit into a ranked window join.
    * Same text runs in both dialects. */
  private val q40Sql =
    """SELECT c_custkey, o.o_orderkey, o.o_price
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_price FROM orders
      |  WHERE o_custkey = c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
      |WHERE c_custkey <= 100
      |ORDER BY c_custkey, o_price DESC, o_orderkey""".stripMargin
  private val q40 = sql(q40Sql)

  /** Explicit GROUPING SETS (beyond ROLLUP/CUBE sugar). */
  private val q41Text =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      | CAST(GROUPING(l_returnflag) AS TINYINT) AS g_rf,
      | CAST(GROUPING(l_linestatus) AS TINYINT) AS g_ls
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin
  private val q41 = sql(q41Text)

  val queries: Map[String, Q] = Map(
    "q40_lateral" -> q40,
    "q41_grouping_sets" -> q41,
    "q13_setops" -> q13,
    "q14_distinct_on" -> q14,
    "q15_subquery_scalar" -> q15,
    "q16_subquery_in" -> q16,
    "q17_subquery_exists" -> q17,
    "q18_cte" -> q18,
    "q19_rollup" -> q19,
    "q20_cube" -> q20,
    "q21_agg_variants" -> q21,
    "q22_ordered_agg" -> q22,
    "q23_approx_distinct" -> q23,
    "q24_string_fns" -> q24,
    "q25_date_fns" -> q25,
    "q26_math_fns" -> q26,
    "q27_conditional" -> q27,
    "q28_array_fns" -> q28,
    "q29_struct_map" -> q29,
    "q30_json_fns" -> q30,
    "q31_pivot" -> q31,
    "q32_unpivot" -> q32,
    "q33_sample_hash" -> q33,
    "q34_asof_join" -> q34,
    "q35_range_join" -> q35,
    "q51_asof_native" -> q51,
    "q98_asof_forward" -> q98)

  val oracleSql: Map[String, String] = Map(
    "q51_asof_native" -> q34Sql,
    "q98_asof_forward" -> q98Sql,
    "q40_lateral" -> q40Sql,
    "q41_grouping_sets" -> q41Text,
    "q13_setops" -> q13Sql,
    "q14_distinct_on" -> q14Sql,
    "q15_subquery_scalar" -> q15Sql,
    "q16_subquery_in" -> q16Sql,
    "q17_subquery_exists" -> q17text,
    "q18_cte" -> q18text,
    "q19_rollup" -> q19Sql,
    "q20_cube" -> q20Sql,
    "q21_agg_variants" -> q21Sql,
    "q22_ordered_agg" -> q22Sql,
    "q23_approx_distinct" -> q23Sql,
    "q24_string_fns" -> q24Sql,
    "q25_date_fns" -> q25Sql,
    "q26_math_fns" -> q26Sql,
    "q27_conditional" -> q27Sql,
    "q28_array_fns" -> q28Sql,
    "q29_struct_map" -> q29Sql,
    "q30_json_fns" -> q30Sql,
    "q31_pivot" -> q31Sql,
    "q32_unpivot" -> q32Sql,
    "q33_sample_hash" -> q33Sql,
    "q34_asof_join" -> q34Sql,
    "q35_range_join" -> q35Sql)
}
