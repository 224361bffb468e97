package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import QueryHelpers._

/** Second batch of dialect-surface coverage (SURVEY.md §2.2): QUALIFY,
  * GROUP BY ALL, star EXCLUDE/REPLACE, series generation, the long tail of
  * window functions, regexp extraction, edit distance, and bit ops.
  *
  * Spark-side implementations use the DataFrame API where the SQL sugar is
  * DuckDB-specific (QUALIFY, EXCLUDE/REPLACE — reference delegates these to
  * DuckDB's dialect, KwackEngine.java:226-257); where the text is valid in
  * both dialects the same string runs on both engines.
  */
object RelationalMore {

  private def sql(q: String): Q = (s, dir) => {
    graft.Tables.register(s, dir)
    s.sql(q)
  }

  /** QUALIFY semantics: top-3 orders per order status by price. Spark has no
    * QUALIFY clause — the idiomatic plan is the identical window + filter
    * (which is also what DuckDB's binder lowers QUALIFY to). */
  private val q42: Q = (s, dir) => {
    val o = t(s, dir, "orders")
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_orderstatus"), col("rn"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"))
      .psort(col("o_orderstatus"), col("rn"))
  }

  private val q42Sql =
    """SELECT o_orderstatus, rn, o_orderkey, price FROM (
      |  SELECT o_orderstatus, o_orderkey, ROUND(o_totalprice, 2) AS price,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders QUALIFY rn <= 3)
      |ORDER BY o_orderstatus, rn""".stripMargin

  /** GROUP BY ALL — the same text parses in both dialects (Spark ≥3.4). */
  private val q43Text =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ALL ORDER BY 1, 2""".stripMargin
  private val q43 = sql(q43Text)

  /** SELECT * EXCLUDE (...) REPLACE (...) — DuckDB star sugar; the Spark
    * DataFrame equivalent is drop + withColumn (position-preserving). */
  private val q44: Q = (s, dir) => {
    t(s, dir, "part")
      .filter(col("p_partkey") <= 50)
      .drop("p_retailprice", "p_size")
      .withColumn("p_brand", upper(col("p_brand")))
      .psort(col("p_partkey"))
  }

  private val q44Sql =
    """SELECT * EXCLUDE (p_retailprice, p_size) REPLACE (UPPER(p_brand) AS p_brand)
      |FROM part WHERE p_partkey <= 50 ORDER BY p_partkey""".stripMargin

  /** Series generation: sequence/explode vs generate_series/unnest. */
  private val q45: Q = (s, dir) => {
    t(s, dir, "region")
      .select(col("r_regionkey"),
        explode(sequence(lit(1L), col("r_regionkey") + 2)).as("i"))
      .select(col("r_regionkey"), col("i"),
        (col("r_regionkey") * lit(10) + col("i")).as("v"))
      .psort(col("r_regionkey"), col("i"))
  }

  private val q45Sql =
    """SELECT r_regionkey, i, r_regionkey * 10 + i AS v
      |FROM (SELECT r_regionkey,
      |        UNNEST(GENERATE_SERIES(1, r_regionkey + 2)) AS i
      |      FROM region)
      |ORDER BY r_regionkey, i""".stripMargin

  /** Window-function long tail: ntile, percent_rank, cume_dist, nth_value,
    * lead/lag with defaults — one frame, every ranking family. */
  private val q46: Q = (s, dir) => {
    val e = t(s, dir, "events").filter(col("user_id") < 20)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    e.select(col("user_id"), col("event_id"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cdist"),
        nth_value(col("event_id"), 2).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          .as("second_event"),
        lag(col("value"), 1, -1.0).over(w).as("prev_value"),
        lead(col("event_type"), 1, "none").over(w).as("next_type"))
      .psort(col("user_id"), col("event_id"))
  }

  private val q46Sql =
    """SELECT user_id, event_id,
      | NTILE(4) OVER w AS quartile,
      | ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
      | ROUND(CUME_DIST() OVER w, 6) AS cdist,
      | NTH_VALUE(event_id, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_event,
      | LAG(value, 1, -1.0) OVER w AS prev_value,
      | LEAD(event_type, 1, 'none') OVER w AS next_type
      |FROM events WHERE user_id < 20
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin

  /** regexp_extract_all over document text (explicit capture group — the
    * two engines default the group index differently). */
  private val q47: Q = (s, dir) => {
    val d = t(s, dir, "documents").filter(col("doc_id") <= 200)
    val caps = regexp_extract_all(col("text"), lit("\\b([a-z]{7,})\\b"), lit(1))
    d.select(col("doc_id"), size(caps).as("n_long"),
        when(size(caps) > 0, element_at(caps, 1)).otherwise("").as("first_long"),
        when(size(caps) > 0, element_at(caps, -1)).otherwise("").as("last_long"))
      .psort(col("doc_id"))
  }

  private val q47Sql =
    """SELECT doc_id,
      | LEN(l) AS n_long,
      | CASE WHEN LEN(l) > 0 THEN l[1] ELSE '' END AS first_long,
      | CASE WHEN LEN(l) > 0 THEN l[-1] ELSE '' END AS last_long
      |FROM (SELECT doc_id, REGEXP_EXTRACT_ALL(text, '\b([a-z]{7,})\b', 1) AS l
      |      FROM documents WHERE doc_id <= 200)
      |ORDER BY doc_id""".stripMargin

  /** Edit distance (fuzzy join shape): near-matching part names among the
    * first 30 parts. Quadratic on a bounded slice — the 100 TB shape blocks
    * on a cheap key (brand) before the quadratic verify, as d02/d05 do. */
  private val q48: Q = (s, dir) => {
    val p = t(s, dir, "part").filter(col("p_partkey") <= 30)
      .select(col("p_partkey").as("k"), col("p_name").as("nm"))
    p.as("a").join(p.as("b"), col("a.k") < col("b.k"))
      .select(col("a.k").as("k1"), col("b.k").as("k2"),
        levenshtein(col("a.nm"), col("b.nm")).as("dist"))
      .filter(col("dist") <= 15)
      .psort(col("k1"), col("k2"))
  }

  private val q48Sql =
    """SELECT a.p_partkey AS k1, b.p_partkey AS k2,
      | LEVENSHTEIN(a.p_name, b.p_name) AS dist
      |FROM part a JOIN part b ON a.p_partkey < b.p_partkey
      |WHERE a.p_partkey <= 30 AND b.p_partkey <= 30
      |  AND LEVENSHTEIN(a.p_name, b.p_name) <= 15
      |ORDER BY k1, k2""".stripMargin

  /** Bitwise ops: and/or/xor/shifts (dialects differ: Spark `^` is xor,
    * DuckDB `^` is power — DataFrame API on one side, native ops on the
    * other). */
  private val q49: Q = (s, dir) => {
    val o = t(s, dir, "orders").filter(col("o_orderkey") <= 200)
    o.select(col("o_orderkey"),
        col("o_orderkey").bitwiseAND(lit(255L)).as("b_and"),
        col("o_orderkey").bitwiseOR(lit(4096L)).as("b_or"),
        col("o_orderkey").bitwiseXOR(lit(170L)).as("b_xor"),
        shiftleft(col("o_orderkey"), 3).as("b_shl"),
        shiftright(col("o_orderkey"), 2).as("b_shr"),
        bitwise_not(col("o_orderkey")).as("b_not"))
      .psort(col("o_orderkey"))
  }

  private val q49Sql =
    """SELECT o_orderkey,
      | o_orderkey & 255 AS b_and,
      | o_orderkey | 4096 AS b_or,
      | XOR(o_orderkey, 170) AS b_xor,
      | o_orderkey << 3 AS b_shl,
      | o_orderkey >> 2 AS b_shr,
      | ~o_orderkey AS b_not
      |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin

  /** Window frame EXCLUDE CURRENT ROW (DuckDB frame clause Spark lacks):
    * algebraic lowering — a centered rows-frame sum minus the current row,
    * in exact decimals so both engines agree bit-for-bit. */
  private val q52: Q = (s, dir) => {
    val e = t(s, dir, "events").filter(col("user_id") < 50)
    val v = col("value").cast("decimal(12,2)")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-3, 3)
    // SQL's SUM over an empty (all-excluded) frame is NULL, not 0: guard on
    // the frame holding more than just the current row
    e.select(col("user_id"), col("event_id"),
        when(count(lit(1)).over(w) > 1, (sum(v).over(w) - v).cast("double"))
          .as("neighbor_sum"))
      .psort(col("user_id"), col("event_id"))
  }

  private val q52Sql =
    """SELECT user_id, event_id,
      | CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
      |   PARTITION BY user_id ORDER BY ts, event_id
      |   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE CURRENT ROW)
      |  AS DOUBLE) AS neighbor_sum
      |FROM events WHERE user_id < 50
      |ORDER BY user_id, event_id""".stripMargin

  /** Ordered-set aggregates: interpolated percentiles + median per group
    * (Spark `percentile` and DuckDB `quantile_cont` share the linear-
    * interpolation definition). */
  private val q53: Q = (s, dir) => {
    val e = t(s, dir, "events")
    e.groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.25)").as("p25"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        expr("percentile(value, 0.5)").as("med"))
      .psort(col("event_type"))
  }

  private val q53Sql =
    """SELECT event_type,
      | QUANTILE_CONT(value, 0.25) AS p25,
      | QUANTILE_CONT(value, 0.5) AS p50,
      | QUANTILE_CONT(value, 0.9) AS p90,
      | MEDIAN(value) AS med
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Error-safe casts and conditional scalars: TRY_CAST, GREATEST/LEAST,
    * NULLIF, COALESCE — identical text parses in both dialects. */
  private val q54Text =
    """SELECT o_orderkey,
      | TRY_CAST(o_orderstatus AS INTEGER) AS status_int,
      | ROUND(GREATEST(o_totalprice, 150000.0), 2) AS g,
      | ROUND(LEAST(o_totalprice, 150000.0), 2) AS l,
      | NULLIF(o_orderstatus, 'O') AS status_nz,
      | COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_lbl
      |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin
  private val q54 = sql(q54Text)

  /** Date-function long tail: day arithmetic, month ends, day names,
    * day-of-week numbering (normalized to DuckDB's Sunday=0). */
  private val q55: Q = (s, dir) => {
    val o = t(s, dir, "orders").filter(col("o_orderkey") <= 200)
    val d = to_date(col("o_orderdate"))
    o.select(col("o_orderkey"),
        datediff(d, to_date(lit("1995-01-01"))).as("days_since"),
        last_day(d).as("eom"),
        date_format(d, "EEEE").as("dname"),
        (dayofweek(d) - 1).as("dow"),
        quarter(d).as("qtr"))
      .psort(col("o_orderkey"))
  }

  private val q55Sql =
    """SELECT o_orderkey,
      | CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
      | LAST_DAY(CAST(o_orderdate AS DATE)) AS eom,
      | DAYNAME(CAST(o_orderdate AS DATE)) AS dname,
      | CAST(DATE_PART('dow', CAST(o_orderdate AS DATE)) AS INTEGER) AS dow,
      | CAST(QUARTER(CAST(o_orderdate AS DATE)) AS INTEGER) AS qtr
      |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin

  /** Skew-salted join (operators/SaltedJoin): the hot 5-value event_type key
    * is spread over 8 salt buckets; the oracle runs the UNSALTED join —
    * salting must be semantics-neutral. */
  private val q56: Q = (s, dir) => {
    val e = t(s, dir, "events")
    val dim = e.groupBy(col("event_type"))
      .agg(expr("CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 2) AS DECIMAL(12,2))").as("avg_v"))
    graft.operators.SaltedJoin.saltedJoin(e, dim, Seq("event_type"), buckets = 8)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value").cast("decimal(12,2)") > col("avg_v"), 1L)
          .otherwise(0L)).as("n_above"))
      .psort(col("event_type"))
  }

  private val q56Sql =
    """WITH dim AS (
      |  SELECT event_type,
      |    CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 2) AS DECIMAL(12,2)) AS avg_v
      |  FROM events GROUP BY 1)
      |SELECT e.event_type, COUNT(*) AS n,
      | CAST(SUM(CASE WHEN CAST(e.value AS DECIMAL(12,2)) > d.avg_v THEN 1 ELSE 0 END) AS BIGINT) AS n_above
      |FROM events e JOIN dim d USING (event_type)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** String-function long tail — every name parses identically in both
    * dialects, so one text serves both engines. */
  private val q57Text =
    """SELECT p_partkey,
      | SPLIT_PART(p_name, ' ', 2) AS second_word,
      | REPEAT(p_brand, 2) AS brand2,
      | REVERSE(p_type) AS type_rev,
      | TRANSLATE(p_name, 'aeiou', 'AEIOU') AS vowels_up,
      | LEFT(p_name, 4) AS l4,
      | RIGHT(p_name, 4) AS r4,
      | CONTAINS(p_name, 'al') AS has_al,
      | ASCII(p_brand) AS first_code,
      | CHR(65 + CAST(p_partkey % 26 AS INTEGER)) AS cyc
      |FROM part WHERE p_partkey <= 150 ORDER BY p_partkey""".stripMargin
  private val q57 = sql(q57Text)

  /** Array/map long tail: flatten, array_position, map construction,
    * map_concat, keys/values, cardinality. */
  private val q58: Q = (s, dir) => {
    val p = t(s, dir, "part").filter(col("p_partkey") <= 100)
    val arr = array(col("p_brand"), col("p_type"), col("p_name"))
    val m1 = map_from_arrays(array(lit("brand"), lit("type")),
      array(col("p_brand"), col("p_type")))
    val m2 = map_from_arrays(array(lit("name")), array(col("p_name")))
    val mc = map_concat(m1, m2)
    // collection results leave the query as scalar delimited strings:
    // verification harnesses row-sort/hash cells, and collection cells
    // are unhashable there (same contract as m05)
    p.select(col("p_partkey"),
        array_join(flatten(array(arr, arr)), "|").as("doubled"),
        array_position(arr, col("p_type")).as("pos_type"),
        array_join(map_keys(mc), "|").as("ks"),
        array_join(map_values(mc), "|").as("vs"),
        size(mc).as("card"))
      .psort(col("p_partkey"))
  }

  private val q58Sql =
    """SELECT p_partkey,
      | ARRAY_TO_STRING(FLATTEN([[p_brand, p_type, p_name], [p_brand, p_type, p_name]]), '|') AS doubled,
      | CAST(ARRAY_POSITION([p_brand, p_type, p_name], p_type) AS BIGINT) AS pos_type,
      | ARRAY_TO_STRING(MAP_KEYS(MAP_CONCAT(MAP(['brand','type'], [p_brand, p_type]), MAP(['name'], [p_name]))), '|') AS ks,
      | ARRAY_TO_STRING(MAP_VALUES(MAP_CONCAT(MAP(['brand','type'], [p_brand, p_type]), MAP(['name'], [p_name]))), '|') AS vs,
      | CAST(CARDINALITY(MAP_CONCAT(MAP(['brand','type'], [p_brand, p_type]), MAP(['name'], [p_name]))) AS INTEGER) AS card
      |FROM part WHERE p_partkey <= 100 ORDER BY p_partkey""".stripMargin

  /** IGNORE NULLS window navigation: last/first non-null and null-skipping
    * lag — the gap-filling idiom for sparse measures. */
  private val q59: Q = (s, dir) => {
    val e = t(s, dir, "events").filter(col("user_id") < 30)
    val v = when(col("event_type") === "error", lit(null)).otherwise(col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    e.select(col("user_id"), col("event_id"),
        lag(v, 1, null, ignoreNulls = true).over(w).as("prev_v"),
        last(v, ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("fill_v"),
        first(v, ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          .as("first_v"))
      .psort(col("user_id"), col("event_id"))
  }

  private val q59Sql =
    """SELECT user_id, event_id,
      | LAG(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_v,
      | LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fill_v,
      | FIRST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_v
      |FROM (SELECT user_id, event_id, ts,
      |        CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      |      FROM events WHERE user_id < 30)
      |ORDER BY user_id, event_id""".stripMargin

  /** Inline constant tables (VALUES) joined against real data — the same
    * text parses in both dialects. */
  private val q60Text =
    """SELECT r.r_name, v.bonus
      |FROM region r JOIN (VALUES (0, 10), (1, 20), (2, 30), (3, 40), (4, 50))
      |  AS v(rk, bonus) ON r.r_regionkey = v.rk
      |ORDER BY r.r_name""".stripMargin
  private val q60 = sql(q60Text)

  /** Epoch conversions: timestamp -> millis/seconds and the round trip. */
  private val q61: Q = (s, dir) => {
    val e = t(s, dir, "events").filter(col("event_id") <= 200)
    e.select(col("event_id"),
        unix_millis(col("ts")).as("ms"),
        unix_seconds(col("ts")).as("sec"),
        timestamp_seconds(unix_seconds(col("ts"))).as("rt"))
      .psort(col("event_id"))
  }

  private val q61Sql =
    """SELECT event_id,
      | EPOCH_MS(ts) AS ms,
      | CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec,
      | MAKE_TIMESTAMP(CAST(FLOOR(EPOCH(ts)) AS BIGINT) * 1000000) AS rt
      |FROM events WHERE event_id <= 200 ORDER BY event_id""".stripMargin

  /** Column-name-aligned union: DataFrame unionByName against DuckDB's
    * UNION ALL BY NAME (columns deliberately in different orders). */
  private val q62: Q = (s, dir) => {
    val a = t(s, dir, "customer")
      .select(col("c_custkey").as("k"), lit("customer").as("src"))
    val b = t(s, dir, "supplier")
      .select(lit("supplier").as("src"), col("s_suppkey").as("k"))
    a.unionByName(b)
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("mn"), max(col("k")).as("mx"))
      .psort(col("src"))
  }

  private val q62Sql =
    """SELECT src, COUNT(*) AS n, MIN(k) AS mn, MAX(k) AS mx FROM (
      |  SELECT c_custkey AS k, 'customer' AS src FROM customer
      |  UNION ALL BY NAME
      |  SELECT 'supplier' AS src, s_suppkey AS k FROM supplier)
      |GROUP BY src ORDER BY src""".stripMargin

  /** NATURAL JOIN — same text in both dialects (shared column name made
    * explicit via aliased subqueries). */
  private val q63Text =
    """SELECT regionkey, n_name, r_name
      |FROM (SELECT n_regionkey AS regionkey, n_name FROM nation) n
      |NATURAL JOIN (SELECT r_regionkey AS regionkey, r_name FROM region) r
      |ORDER BY n_name""".stripMargin
  private val q63 = sql(q63Text)

  /** Time-based RANGE frame (trailing one hour per user): Spark expresses
    * interval frames as rangeBetween over epoch micros — identical
    * semantics to DuckDB's RANGE INTERVAL frame when the order key is the
    * timestamp. */
  private val q64: Q = (s, dir) => {
    val e = t(s, dir, "events").filter(col("user_id") < 40)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600L * 1000000L, 0L)
    e.select(col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("n_trailing_hour"),
        sum(col("value").cast("decimal(12,2)")).over(w)
          .cast("double").as("v_trailing_hour"))
      .psort(col("user_id"), col("event_id"))
  }

  private val q64Sql =
    """SELECT user_id, event_id,
      | COUNT(*) OVER w AS n_trailing_hour,
      | CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS v_trailing_hour
      |FROM events WHERE user_id < 40
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts
      |  RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  /** q96: aggregate FILTER clause + arg_max/arg_min. The FILTER text is
    * dialect-shared (Spark >= 3.0 and DuckDB parse the same clause); the
    * argmax pair differs only in name (Spark max_by/min_by, DuckDB
    * arg_max/arg_min — both in the SQL standard's wake). Ties are made
    * deterministic by ranking on an exact encoded BIGINT
    * (round(price*100)*1e7 + orderkey — cents fit 2^53, orderkey < 1e7),
    * not on the raw double, so both engines pick the identical row even if
    * the max price repeats.
    *
    * Scale: single hash aggregation with map-side partials; FILTER folds
    * into the aggregate buffer update (no pre-split scans), argmax carries
    * one (key, value) pair per group — no sort, no window. */
  private val q96: Q = (s, dir) => {
    graft.Tables.register(s, dir)
    s.sql("""SELECT l_returnflag,
      |  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
      |    FILTER (WHERE l_discount > 0.05), 2) AS DOUBLE) AS sum_hi,
      |  MAX_BY(l_orderkey, CAST(ROUND(l_extendedprice*100, 0) AS BIGINT)*10000000 + l_orderkey) AS key_max_price,
      |  MIN_BY(l_orderkey, CAST(ROUND(l_extendedprice*100, 0) AS BIGINT)*10000000 + l_orderkey) AS key_min_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  private val q96Sql =
    """SELECT l_returnflag,
      |  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
      |    FILTER (WHERE l_discount > 0.05), 2) AS DOUBLE) AS sum_hi,
      |  ARG_MAX(l_orderkey, CAST(ROUND(l_extendedprice*100, 0) AS BIGINT)*10000000 + l_orderkey) AS key_max_price,
      |  ARG_MIN(l_orderkey, CAST(ROUND(l_extendedprice*100, 0) AS BIGINT)*10000000 + l_orderkey) AS key_min_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q100: bag-semantics set operations — INTERSECT ALL (multiplicity =
    * min of the two sides' counts) and EXCEPT ALL (left count minus right
    * count, floored at zero) over the customer/supplier nationkey
    * multisets, where the distinct-set q13 forms would erase the
    * multiplicities. Spark spells them `intersectAll`/`exceptAll`; DuckDB
    * parses the standard INTERSECT ALL / EXCEPT ALL.
    *
    * Scale: both plan as ONE hash aggregation per side keyed on the value
    * (map-side partial counts), then a co-partitioned count-arithmetic
    * join — no sort, no row-by-row bag subtraction; the post-op
    * groupBy(count) fuses onto the same key partitioning, so the whole
    * query is a single shuffle of per-key counters. */
  private val q100: Q = (s, dir) => {
    val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
    val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
    val ia = c.intersectAll(sup).groupBy(col("nationkey"))
      .agg(count(lit(1)).as("n"))
      .select(lit("intersect_all").as("op"), col("nationkey"), col("n"))
    val ea = c.exceptAll(sup).groupBy(col("nationkey"))
      .agg(count(lit(1)).as("n"))
      .select(lit("except_all").as("op"), col("nationkey"), col("n"))
    ia.union(ea).psort(col("op"), col("nationkey"))
  }

  private val q100Sql =
    """WITH c AS (SELECT c_nationkey AS nationkey FROM customer),
      |     s AS (SELECT s_nationkey AS nationkey FROM supplier),
      |     ia AS (SELECT 'intersect_all' AS op, nationkey, COUNT(*) AS n
      |            FROM (SELECT * FROM c INTERSECT ALL SELECT * FROM s)
      |            GROUP BY 2),
      |     ea AS (SELECT 'except_all' AS op, nationkey, COUNT(*) AS n
      |            FROM (SELECT * FROM c EXCEPT ALL SELECT * FROM s)
      |            GROUP BY 2)
      |SELECT * FROM ia UNION ALL SELECT * FROM ea
      |ORDER BY op, nationkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "q100_setops_all" -> q100,
    "q96_filter_argmax" -> q96,
    "q64_time_range_frame" -> q64,
    "q62_union_by_name" -> q62,
    "q63_natural_join" -> q63,
    "q59_ignore_nulls" -> q59,
    "q60_values_inline" -> q60,
    "q61_epoch_fns" -> q61,
    "q57_string_extras" -> q57,
    "q58_collection_extras" -> q58,
    "q54_safe_cast" -> q54,
    "q55_date_extras" -> q55,
    "q56_salted_join" -> q56,
    "q52_frame_exclude" -> q52,
    "q53_percentiles" -> q53,
    "q42_qualify" -> q42,
    "q43_group_by_all" -> q43,
    "q44_exclude_replace" -> q44,
    "q45_generate_series" -> q45,
    "q46_window_extras" -> q46,
    "q47_regexp_extract_all" -> q47,
    "q48_edit_distance" -> q48,
    "q49_bit_ops" -> q49)

  val oracleSql: Map[String, String] = Map(
    "q100_setops_all" -> q100Sql,
    "q96_filter_argmax" -> q96Sql,
    "q64_time_range_frame" -> q64Sql,
    "q62_union_by_name" -> q62Sql,
    "q63_natural_join" -> q63Text,
    "q59_ignore_nulls" -> q59Sql,
    "q60_values_inline" -> q60Text,
    "q61_epoch_fns" -> q61Sql,
    "q57_string_extras" -> q57Text,
    "q58_collection_extras" -> q58Sql,
    "q54_safe_cast" -> q54Text,
    "q55_date_extras" -> q55Sql,
    "q56_salted_join" -> q56Sql,
    "q52_frame_exclude" -> q52Sql,
    "q53_percentiles" -> q53Sql,
    "q42_qualify" -> q42Sql,
    "q43_group_by_all" -> q43Text,
    "q44_exclude_replace" -> q44Sql,
    "q45_generate_series" -> q45Sql,
    "q46_window_extras" -> q46Sql,
    "q47_regexp_extract_all" -> q47Sql,
    "q48_edit_distance" -> q48Sql,
    "q49_bit_ops" -> q49Sql)
}
