package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import QueryHelpers._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, document fingerprinting.
  *
  * All are embarrassingly parallel column expressions (no shuffle except the
  * final presentation sort) — at 100 TB they run map-only over the document
  * scan with full whole-stage codegen.
  *
  * Determinism contract with the DuckDB oracle: integer arithmetic, md5
  * (identical in both engines), and double ratios of exact integers.
  */
object TextOps {

  /** Token counting: whitespace tokens + a BPE-ish regex tokenization
    * (letter runs / digit runs / single punctuation marks). */
  private val x01: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    d.select(
        col("doc_id"),
        size(split(col("text"), " +")).as("ws_tokens"),
        size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)")).as("bpe_ish_tokens"),
        length(col("text")).as("n_chars_measured"),
        (length(col("text")) === col("n_chars")).as("n_chars_consistent"))
      .psort(col("doc_id"))
  }

  private val x01Sql =
    """SELECT doc_id,
      | LEN(REGEXP_SPLIT_TO_ARRAY(text, ' +')) AS ws_tokens,
      | LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS bpe_ish_tokens,
      | LENGTH(text) AS n_chars_measured,
      | LENGTH(text) = n_chars AS n_chars_consistent
      |FROM documents ORDER BY doc_id""".stripMargin

  private[queries] val stopwords =
    Seq("the", "a", "of", "to", "in", "and", "is", "it")

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean token
    * length, and a quality bucket — the standard pre-training heuristics.
    * The three token aggregates run as ONE native codegen'd split pass
    * (graft_token_stats); whole-stage codegen's subexpression elimination
    * shares the struct across the derived columns. */
  private val x02: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    val stopArgs = stopwords.map(w => s"'$w'").mkString(", ")
    val ts = expr(s"graft_token_stats(text, $stopArgs)")
    val nTok = ts.getField("n_tokens")
    val nStop = ts.getField("n_stop")
    val sumLen = ts.getField("sum_len")
    val nPunct = length(col("text")) - length(regexp_replace(col("text"), "[^A-Za-z0-9 ]", ""))
    val stopRatio = nStop.cast("double") / nTok.cast("double")
    d.select(
        col("doc_id"),
        length(col("text")).as("len"),
        nTok.as("n_tokens"),
        (nPunct.cast("double") / length(col("text")).cast("double")).as("punct_ratio"),
        stopRatio.as("stopword_ratio"),
        (sumLen.cast("double") / nTok.cast("double")).as("mean_token_len"),
        when(nTok < 10, "too_short")
          .when(stopRatio < 0.01, "low_stopword")
          .otherwise("ok").as("quality"))
      .psort(col("doc_id"))
  }

  private val stopListSql = stopwords.map(w => s"'$w'").mkString("[", ",", "]")

  private val x02Sql =
    s"""SELECT doc_id,
       | LENGTH(text) AS len,
       | LEN(REGEXP_SPLIT_TO_ARRAY(text, ' +')) AS n_tokens,
       | (LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[^A-Za-z0-9 ]', '', 'g')))::DOUBLE / LENGTH(text)::DOUBLE AS punct_ratio,
       | LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, ' +'), w -> LIST_CONTAINS($stopListSql, w)))::DOUBLE
       |   / LEN(REGEXP_SPLIT_TO_ARRAY(text, ' +'))::DOUBLE AS stopword_ratio,
       | LIST_SUM(LIST_TRANSFORM(REGEXP_SPLIT_TO_ARRAY(text, ' +'), w -> LENGTH(w)))::DOUBLE
       |   / LEN(REGEXP_SPLIT_TO_ARRAY(text, ' +'))::DOUBLE AS mean_token_len,
       | CASE WHEN LEN(REGEXP_SPLIT_TO_ARRAY(text, ' +')) < 10 THEN 'too_short'
       |      WHEN LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, ' +'), w -> LIST_CONTAINS($stopListSql, w)))::DOUBLE
       |           / LEN(REGEXP_SPLIT_TO_ARRAY(text, ' +'))::DOUBLE < 0.01 THEN 'low_stopword'
       |      ELSE 'ok' END AS quality
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Language ID by stopword-hit heuristic: score the token set against
    * per-language function-word lists, argmax with name tiebreak. (N-gram
    * profiles are the classic method; function words are the 1-gram case.) */
  private val langStop: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein"),
    "en" -> Seq("the", "and", "of", "to", "is", "it", "a"),
    "es" -> Seq("el", "los", "y", "que", "una", "por", "con"),
    "fr" -> Seq("le", "les", "et", "que", "une", "pour", "dans"),
    "zh" -> Seq("de", "shi", "le", "zai", "you", "wo", "ta"))

  private val x03: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    val words = array_distinct(split(col("text"), " +"))
    val scores = langStop.map { case (lang, sw) =>
      struct(size(filter(words, w => w.isin(sw.map(lit(_)): _*))).as("score"),
        lit(lang).as("lang"))
    }
    // argmax: sort (score, lang) structs; ties resolve to the LAST lang name
    // in ascending struct order, i.e. max score then max lang.
    val best = array_max(array(scores: _*))
    d.select(
        col("doc_id"),
        best.getField("lang").as("guessed"),
        best.getField("score").as("hits"),
        col("lang").as("labelled"))
      .psort(col("doc_id"))
  }

  private val x03Sql = {
    val structs = langStop.map { case (lang, sw) =>
      val lst = sw.map(w => s"'$w'").mkString("[", ",", "]")
      s"{'score': LEN(LIST_FILTER(LIST_DISTINCT(REGEXP_SPLIT_TO_ARRAY(text, ' +')), w -> LIST_CONTAINS($lst, w))), 'lang': '$lang'}"
    }.mkString(",\n   ")
    s"""SELECT doc_id,
       | LIST_MAX([$structs])['lang'] AS guessed,
       | LIST_MAX([$structs])['score'] AS hits,
       | lang AS labelled
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Document fingerprinting: md5 over the sorted unique token set (bag
    * fingerprint, order-insensitive) + a polynomial rolling hash over the
    * token sequence (order-sensitive), both mod-1e9+7 arithmetic. */
  private val x04: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    val words = split(col("text"), " +")
    val bagFp = md5(concat_ws(" ", array_sort(array_distinct(words))))
    val P = 1000000007L
    val rollFp = aggregate(
      transform(words, w => pmod(md5i(w), lit(P))),
      lit(0L),
      (acc, x) => pmod(acc * 31 + x, lit(P)))
    d.select(col("doc_id"), bagFp.as("bag_fp"), rollFp.as("roll_fp"))
      .psort(col("doc_id"))
  }

  private val x04Sql =
    s"""SELECT doc_id,
       | MD5(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(REGEXP_SPLIT_TO_ARRAY(text, ' +'))), ' ')) AS bag_fp,
       | LIST_REDUCE(
       |   LIST_PREPEND(0::BIGINT,
       |     LIST_TRANSFORM(REGEXP_SPLIT_TO_ARRAY(text, ' +'),
       |       w -> ${md5iSql("w")} % 1000000007)),
       |   (acc, x) -> (acc * 31 + x) % 1000000007) AS roll_fp
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Character n-gram frequency profile: top-3 trigrams per language — the
    * statistic a real language-ID model trains on (x03's heuristic is its
    * inference-time counterpart). Heavy explode (≈ one row per character)
    * followed by a two-level aggregation; partial aggregation absorbs the
    * blow-up map-side before the (lang, gram) shuffle. */
  private val x05: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val d = t(s, dir, "documents").filter(length(col("text")) >= 3)
    val grams = d.select(col("lang"),
      explode(expr("graft_char_ngrams(text)")).as("g"))
    val counts = grams.groupBy(col("lang"), col("g")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("g"))
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("lang"), col("rn"), col("g"), col("n"))
      .psort(col("lang"), col("rn"))
  }

  private val x05Sql =
    """WITH grams AS (
      |  SELECT lang, UNNEST([SUBSTR(text, i, 3) FOR i IN RANGE(1, LEN(text) - 1)]) AS g
      |  FROM documents WHERE LEN(text) >= 3),
      |counts AS (SELECT lang, g, COUNT(*) AS n FROM grams GROUP BY 1, 2),
      |ranked AS (
      |  SELECT lang, g, n,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, g) AS rn
      |  FROM counts)
      |SELECT lang, rn, g, n FROM ranked WHERE rn <= 3 ORDER BY lang, rn""".stripMargin

  /** Vocabulary building: corpus-wide term frequencies, top-100 by count
    * (term asc as the deterministic tiebreak) — the tokenizer-training /
    * vocab-pruning primitive of an LLM data pipeline. Map-side partial
    * aggregation combines per-partition counts before the single shuffle on
    * term; the top-k limit prunes through the sort. */
  private val x06: Q = (s, dir) => {
    t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(100)
  }

  private val x06Sql =
    """SELECT w AS term, COUNT(*) AS n
      |FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents)
      |WHERE w <> '' GROUP BY 1 ORDER BY n DESC, term LIMIT 100""".stripMargin

  /** TF-IDF top terms per document (doc_id <= 50): the classic sparse
    * feature-extraction pipeline — per-doc term frequencies, corpus document
    * frequencies, tf * ln(N/df) scoring, per-doc top-3. Scale shape: one
    * shuffle for tf (doc_id, term), one for df (term), a broadcast of the
    * tiny df/N side back onto tf, and a windowed top-k. The score is a
    * double product of exact integers through ln — bit-identical in both
    * engines (same IEEE ops, same order). */
  private val x07: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val terms = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = terms.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.filter(col("doc_id") <= 50)
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        (col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double"))).as("tfidf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    // ln is not correctly rounded in either engine (Math.log vs libm differ
    // by 1 ulp on some inputs): ranking on the raw value is stable (1-ulp
    // noise only reorders scores closer than 2 ulp), but the OUTPUT must be
    // rounded so the hash comparison doesn't see the ulp
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("term"),
        round(col("tfidf"), 6).as("tfidf"))
      .psort(col("doc_id"), col("rnk"))
  }

  private val x07Sql =
    """WITH terms AS (
      |  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents),
      |tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf FROM terms WHERE term <> ''
      |  GROUP BY doc_id, term),
      |dfreq AS (
      |  SELECT term, COUNT(*) AS df FROM (
      |    SELECT DISTINCT doc_id, term FROM terms WHERE term <> '') GROUP BY term),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term,
      |    CAST(tf.tf AS DOUBLE) * LN(CAST(n.n_docs AS DOUBLE) / CAST(dfreq.df AS DOUBLE)) AS tfidf
      |  FROM tf JOIN dfreq USING (term) CROSS JOIN n WHERE tf.doc_id <= 50),
      |ranked AS (
      |  SELECT doc_id, term, tfidf,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
      |  FROM scored)
      |SELECT doc_id, rnk, term, ROUND(tfidf, 6) AS tfidf
      |FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin

  /** Data-mixture sampling: each source gets a target sampling rate and
    * rows are kept by a DETERMINISTIC content-hash threshold (md5 of
    * doc_id) — the reproducible mixture-weighting step of corpus
    * construction (same row set on every run, any cluster, any partition
    * count; a random() sample is neither reproducible nor oracle-checkable).
    * Map-only filter, then one aggregation shuffle for the per-source
    * audit. Rates derive from the source name so the query is self-
    * contained: 20/45/70% cycling by the source's trailing digits. */
  private val x08: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    val rate = (expr("cast(substr(source, 4) as int) % 3") * 25 + 20)
      .cast("long").as("rate_pct")
    val keep = md5i(col("doc_id").cast("string")) % 100 < col("rate_pct")
    d.select(col("doc_id"), col("source"), rate)
      .withColumn("kept", when(keep, 1L).otherwise(0L))
      .groupBy(col("source"), col("rate_pct"))
      .agg(count(lit(1)).as("n_total"), sum(col("kept")).as("n_kept"))
      .select(col("source"), col("rate_pct"), col("n_total"), col("n_kept"),
        (col("n_kept").cast("double") / col("n_total").cast("double"))
          .as("realized_rate"))
      .psort(col("source"))
  }

  private val x08Sql =
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |    CAST(CAST(SUBSTR(source, 4) AS INTEGER) % 3 * 25 + 20 AS BIGINT) AS rate_pct
       |  FROM documents),
       |k AS (
       |  SELECT source, rate_pct,
       |    CASE WHEN ${md5iSql("CAST(doc_id AS VARCHAR)")} % 100 < rate_pct
       |         THEN 1 ELSE 0 END AS kept
       |  FROM d)
       |SELECT source, rate_pct, COUNT(*) AS n_total,
       | CAST(SUM(kept) AS BIGINT) AS n_kept,
       | CAST(SUM(kept) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS realized_rate
       |FROM k GROUP BY source, rate_pct ORDER BY source""".stripMargin

  // ---- x09: PII scrubbing ------------------------------------------------
  // The synthetic corpus contains no PII, so the query PLANTS deterministic
  // emails / phone numbers / IPv4 addresses (keyed on doc_id) on BOTH the
  // Spark and oracle sides, then scrubs them — the redaction regexes and the
  // per-type hit counts are what is actually under test. Patterns stay in
  // the Java-regex ∩ RE2 common dialect so both engines match identically.
  // Map-only (no shuffle except the presentation sort) — at 100 TB this is
  // a pure scan-transform pass with full whole-stage codegen.
  private val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phonePat = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  private val ipPat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  private val x09: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    val planted = concat(
      col("text"),
      when(col("doc_id") % 7 === 0,
        concat(lit(" contact user"), col("doc_id"), lit("@example.com"))).otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        concat(lit(" call 555-"), lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
          lit("-"), lpad(((col("doc_id") * 7) % 10000).cast("string"), 4, "0"))).otherwise(lit("")),
      when(col("doc_id") % 13 === 0,
        concat(lit(" ip 10."), (col("doc_id") % 256).cast("string"),
          lit(".0."), ((col("doc_id") * 3) % 256).cast("string"))).otherwise(lit("")))
    val p = d.select(col("doc_id"), planted.as("text"))
    // scrub emails first: their dotted domains would otherwise feed the IP
    // pattern's digit-dot runs on adversarial inputs
    val red = regexp_replace(
      regexp_replace(
        regexp_replace(col("text"), lit(emailPat), lit("<EMAIL>")),
        lit(phonePat), lit("<PHONE>")),
      lit(ipPat), lit("<IP>"))
    p.select(
        col("doc_id"),
        regexp_count(col("text"), lit(emailPat)).as("n_emails"),
        regexp_count(col("text"), lit(phonePat)).as("n_phones"),
        regexp_count(col("text"), lit(ipPat)).as("n_ips"),
        md5(red).as("redacted_md5"),
        (length(red) - length(col("text"))).as("len_delta"))
      .psort(col("doc_id"))
  }

  private val x09Sql =
    """WITH p AS (
      |  SELECT doc_id,
      |    text
      |    || CASE WHEN doc_id % 7 = 0
      |         THEN ' contact user' || doc_id || '@example.com' ELSE '' END
      |    || CASE WHEN doc_id % 11 = 0
      |         THEN ' call 555-' || LPAD(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
      |              || '-' || LPAD(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0') ELSE '' END
      |    || CASE WHEN doc_id % 13 = 0
      |         THEN ' ip 10.' || CAST(doc_id % 256 AS VARCHAR)
      |              || '.0.' || CAST((doc_id * 3) % 256 AS VARCHAR) ELSE '' END AS text
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, text,
      |    REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(text,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |      '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
      |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS red
      |  FROM p)
      |SELECT doc_id,
      | CAST(LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
      | CAST(LEN(REGEXP_EXTRACT_ALL(text, '\b\d{3}-\d{3}-\d{4}\b')) AS INTEGER) AS n_phones,
      | CAST(LEN(REGEXP_EXTRACT_ALL(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ips,
      | MD5(red) AS redacted_md5,
      | CAST(LENGTH(red) - LENGTH(text) AS INTEGER) AS len_delta
      |FROM r ORDER BY doc_id""".stripMargin

  // ---- x10: sequence packing ---------------------------------------------
  // GPT-style concat-and-chunk packing: within each (source, shard) stream,
  // documents are laid end-to-end in doc_id order and a document is assigned
  // to the context-window bin its first token lands in (budget = 256
  // tokens). The shard key is how this distributes: at 100 TB you pack per
  // shard in parallel — each shard's running sum is an independent window
  // over its own partition, so the only shuffle is the hash partition on
  // (source, shard) and no global ordering is ever needed.
  private val packBudget = 256

  private val x10: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    val toks = d.select(col("doc_id"), col("source"),
      pmod(col("doc_id"), lit(4)).as("shard"),
      size(split(col("text"), " +")).cast("long").as("tok"))
    val w = Window.partitionBy(col("source"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val binned = toks
      .withColumn("cum", sum(col("tok")).over(w))
      .withColumn("bin", floor((col("cum") - col("tok")) / lit(packBudget.toDouble)).cast("long"))
    binned.groupBy(col("source"), col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .psortScaled(col("source"), col("shard"), col("bin"))
  }

  private val x10Sql =
    s"""WITH toks AS (
       |  SELECT doc_id, source, doc_id % 4 AS shard,
       |    CAST(LEN(REGEXP_SPLIT_TO_ARRAY(text, ' +')) AS BIGINT) AS tok
       |  FROM documents),
       |binned AS (
       |  SELECT source, shard, doc_id, tok,
       |    -- DuckDB widens window SUM(BIGINT) to HUGEINT and // keeps it;
       |    -- cast back so the result column is BIGINT like Spark's (the
       |    -- r4 hash mismatch was exactly this: HUGEINT renders as float64
       |    -- through pandas-style fetches, "265.0" vs "265")
       |    CAST((SUM(tok) OVER (PARTITION BY source, shard ORDER BY doc_id
       |       ROWS UNBOUNDED PRECEDING) - tok) // $packBudget AS BIGINT) AS bin
       |  FROM toks)
       |SELECT source, shard, bin,
       | COUNT(*) AS n_docs,
       | CAST(SUM(tok) AS BIGINT) AS bin_tokens,
       | MIN(doc_id) AS first_doc,
       | MAX(doc_id) AS last_doc
       |FROM binned GROUP BY source, shard, bin
       |ORDER BY source, shard, bin""".stripMargin

  // ---- x11: benchmark decontamination -------------------------------------
  // Eval-set contamination check — the step a training pipeline runs before
  // any data ships: does a training document share word n-grams with the
  // benchmark suite? Benchmark = the doc_id % 97 == 0 slice (standing in for
  // MMLU/GSM8K/...); grams are the same distinct word 3-grams the dedup
  // family shingles with (one tokenization convention across the pipeline).
  // Scale shape: the benchmark gram set is BOUNDED (eval suites are a few
  // thousand docs no matter how big the corpus is) -> distinct + broadcast;
  // the training side is a map-only explode semi-joined against the
  // broadcast, then ONE shuffle on doc_id for the overlap count. No
  // corpus-vs-corpus join anywhere — cost is linear in corpus size at 100 TB.
  private val x11: Q = (s, dir) => {
    // served from the SAME persisted shingle index the dedup family builds
    // once (Dedup.docsWithShingles) — the first cut re-shingled the corpus
    // on both the benchmark and candidate branches (two extra scans)
    val d = Dedup.docsWithShingles(s, dir).select(col("doc_id"), col("sh"))
    val bench = d.filter(col("doc_id") % 97 === 0)
      .select(explode(col("sh")).as("s")).distinct()
    val ratio = col("n_overlap").cast("double") / col("n_grams").cast("double")
    d.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), size(col("sh")).as("n_grams"), explode(col("sh")).as("s"))
      .join(broadcast(bench), Seq("s"))
      .groupBy(col("doc_id"), col("n_grams"))
      .agg(count(lit(1)).as("n_overlap"))
      .select(col("doc_id"), col("n_grams"), col("n_overlap"),
        round(ratio, 6).as("overlap_ratio"),
        (ratio >= 0.08).as("contaminated"))
      .psort(col("doc_id"))
  }

  private val x11Sql =
    """WITH docs AS (
      |  SELECT doc_id,
      |    LIST_DISTINCT([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |      FOR i IN RANGE(1, LEN(w) - 1)]) AS sh
      |  FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents)
      |  WHERE LEN(w) >= 3),
      |bench AS (SELECT DISTINCT UNNEST(sh) AS s FROM docs WHERE doc_id % 97 = 0),
      |train AS (
      |  SELECT doc_id, LEN(sh) AS n_grams, UNNEST(sh) AS s
      |  FROM docs WHERE doc_id % 97 <> 0),
      |ov AS (
      |  SELECT doc_id, n_grams, COUNT(*) AS n_overlap
      |  FROM train JOIN bench USING (s) GROUP BY 1, 2)
      |SELECT doc_id, n_grams, n_overlap,
      | ROUND(n_overlap::DOUBLE / n_grams::DOUBLE, 6) AS overlap_ratio,
      | n_overlap::DOUBLE / n_grams::DOUBLE >= 0.08 AS contaminated
      |FROM ov ORDER BY doc_id""".stripMargin

  // ---- x12: repetition metrics (Gopher-style quality rules) ---------------
  // Rae et al.'s Gopher filters flag documents dominated by repetition: the
  // fraction of all word bigrams taken by the single most frequent bigram,
  // and the fraction of 5-gram occurrences that are repeats. Scale shape:
  // the 5-gram dup fraction is computed INSIDE the row (array ops, map-only);
  // only the bigram mode needs a (doc_id, bigram) shuffle, and its partial
  // aggregation combines map-side. At 100 TB: one shuffle keyed by document,
  // no corpus-wide state.
  private val x12: Q = (s, dir) => {
    val base = t(s, dir, "documents")
      .filter(size(split(col("text"), " ")) >= 5)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val grams5 = expr(
      "transform(sequence(1, size(w) - 4), i -> concat_ws(' ', slice(w, i, 5)))")
    val stats = base.select(col("doc_id"), size(col("w")).as("n_words"),
      size(grams5).as("n5"), size(array_distinct(grams5)).as("n5d"))
    val bi = base.select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 1), i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"))
        .as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("n"))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("n").desc, col("bg"))
    val top = bi.withColumn("rn", row_number().over(wd))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_bigrams"),
        max(when(col("rn") === 1, col("bg"))).as("top_bigram"),
        max(when(col("rn") === 1, col("n"))).as("top_n"))
    val topFrac = col("top_n").cast("double") / col("n_bigrams").cast("double")
    val dupFrac = lit(1.0) - col("n5d").cast("double") / col("n5").cast("double")
    stats.join(top, Seq("doc_id"))
      .select(col("doc_id"), col("n_words"), col("top_bigram"),
        col("top_n").as("top_bigram_n"),
        round(topFrac, 6).as("top_bigram_frac"),
        round(dupFrac, 6).as("dup_5gram_frac"),
        (topFrac > 0.18 || dupFrac > 0.30).as("flagged"))
      .psort(col("doc_id"))
  }

  private val x12Sql =
    """WITH base AS (
      |  SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents
      |  WHERE LEN(STRING_SPLIT(text, ' ')) >= 5),
      |stats AS (
      |  SELECT doc_id, LEN(w) AS n_words,
      |    LEN([ARRAY_TO_STRING(w[i:i+4], ' ') FOR i IN RANGE(1, LEN(w) - 3)]) AS n5,
      |    LEN(LIST_DISTINCT([ARRAY_TO_STRING(w[i:i+4], ' ') FOR i IN RANGE(1, LEN(w) - 3)])) AS n5d
      |  FROM base),
      |bi AS (
      |  SELECT doc_id, UNNEST([w[i] || ' ' || w[i+1] FOR i IN RANGE(1, LEN(w))]) AS bg
      |  FROM base),
      |bc AS (SELECT doc_id, bg, COUNT(*) AS n FROM bi GROUP BY 1, 2),
      |ranked AS (
      |  SELECT doc_id, bg, n,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, bg) AS rn
      |  FROM bc),
      |top AS (
      |  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
      |    MAX(CASE WHEN rn = 1 THEN bg END) AS top_bigram,
      |    MAX(CASE WHEN rn = 1 THEN n END) AS top_n
      |  FROM ranked GROUP BY doc_id)
      |SELECT s.doc_id, s.n_words, t.top_bigram, t.top_n AS top_bigram_n,
      | ROUND(t.top_n::DOUBLE / t.n_bigrams::DOUBLE, 6) AS top_bigram_frac,
      | ROUND(1.0 - s.n5d::DOUBLE / s.n5::DOUBLE, 6) AS dup_5gram_frac,
      | (t.top_n::DOUBLE / t.n_bigrams::DOUBLE > 0.18
      |   OR 1.0 - s.n5d::DOUBLE / s.n5::DOUBLE > 0.30) AS flagged
      |FROM stats s JOIN top t ON s.doc_id = t.doc_id
      |ORDER BY s.doc_id""".stripMargin

  // ---- x13: n-gram LM scoring (perplexity-style quality signal) -----------
  // A corpus-level character-bigram model scores every document by mean
  // negative log-likelihood — the cheap statistical stand-in for the
  // model-based quality filters of a production pipeline. Two passes:
  // (1) corpus bigram counts (bounded table: |charset|^2 rows) with the
  // grand total — broadcast; (2) per-doc (doc_id, bigram) counts joined
  // against the broadcast model, ONE shuffle keyed by document.
  // Determinism: each bigram's -ln(p) is quantized ONCE to integer
  // micro-nats (round to 0 digits is midpoint-free on doubles, so both
  // engines agree; contrast round(x, 6), whose multiply-based DuckDB
  // implementation disagrees with Spark's exact-BigDecimal rounding at 6-dp
  // boundaries); all per-doc arithmetic after that is exact integer
  // sums/divisions — partition-order independent and bit-replayable, the
  // same fixed-point pattern as the IVF trainer (operators/IvfIndex).
  // Plan shape: the model pass explodes one row per character
  // (graft_char_grams — ONE linear scan per doc; the substring/transform
  // composition is quadratic per doc) but the (bg) aggregation combines
  // map-side down to |charset|^2 rows per partition, so its shuffle is
  // tiny; the grand total is a 1-row aggregate of that bounded counts
  // frame broadcast back onto it (the counts shuffle is planned once and
  // reused across both sides — NOT a second corpus scan, and NOT a
  // single-partition window); the model then collapses to ONE row
  // holding a bg -> micronats MAP, which broadcasts, and the scoring pass
  // is a pure in-row native fold over each document's bigrams —
  // map-only, no per-doc shuffle, no second explode. (The first cut scored
  // via explode + join + re-aggregate: 2.4 s at sf0.1 vs ~0.3 s for this.)
  /** Shared LM-scoring pass (x13 emits it verbatim; x24 buckets and samples
    * on it) — one model build + one scoring scan per sf dir, persisted:
    * the d02/d13 shared-candidate-pass lifecycle applied to quality
    * scoring. */
  private def lmScored(s: SparkSession, dir: String): DataFrame =
    memoized(s"lmscore:$dir") {
      val d = t(s, dir, "documents").filter(length(col("text")) >= 2)
      val counts = d.select(explode(expr("graft_char_grams(text, 2)")).as("bg"))
        .groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
      val model = counts
        .crossJoin(broadcast(counts.agg(sum(col("cnt")).as("total"))))
        .select(col("bg"),
          round(-log(col("cnt").cast("double") / col("total").cast("double"))
            * 1000000.0).cast("long").as("nll_micro"))
        .agg(map_from_entries(collect_list(struct(col("bg"), col("nll_micro"))))
          .as("m"))
      // graft_lm_fold = the aggregate/element_at composition fused into one
      // native call with a hash-indexed model (element_at on a map is a
      // linear scan per lookup — O(|doc|·|model|) interpreted, the hot cost)
      d.crossJoin(broadcast(model))
        .select(col("doc_id"),
          (length(col("text")) - 1).cast("long").as("n_bigrams"),
          expr("graft_lm_fold(text, m)").as("total_nll_micronats"))
        .select(col("doc_id"), col("n_bigrams"), col("total_nll_micronats"),
          expr("total_nll_micronats div n_bigrams").as("avg_nll_micronats"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

  private val x13: Q = (s, dir) =>
    lmScored(s, dir).psort(col("doc_id"))

  private val x13Sql =
    """WITH ex AS (
      |  SELECT doc_id, UNNEST([SUBSTR(text, i, 2) FOR i IN RANGE(1, LEN(text))]) AS bg
      |  FROM documents WHERE LEN(text) >= 2),
      |model AS (
      |  SELECT bg,
      |    CAST(ROUND(-LN(COUNT(*)::DOUBLE / (SELECT COUNT(*) FROM ex)::DOUBLE)
      |      * 1000000.0) AS BIGINT) AS nll_micro
      |  FROM ex GROUP BY bg),
      |docbg AS (SELECT doc_id, bg, COUNT(*) AS k FROM ex GROUP BY 1, 2),
      |agg AS (
      |  SELECT d.doc_id, CAST(SUM(d.k) AS BIGINT) AS n_bigrams,
      |    CAST(SUM(d.k * m.nll_micro) AS BIGINT) AS tot
      |  FROM docbg d JOIN model m ON d.bg = m.bg GROUP BY d.doc_id)
      |SELECT doc_id, n_bigrams, tot AS total_nll_micronats,
      | tot // n_bigrams AS avg_nll_micronats
      |FROM agg ORDER BY doc_id""".stripMargin

  // ---- x14: exact-quota stratified sampling --------------------------------
  // Complements x08's rate-based (Bernoulli-by-hash) mixture sampling with
  // the other sampler every curation pipeline needs: an EXACT quota per
  // stratum — "3 documents from every (lang, source)" — selected by
  // deterministic hash rank, so the sample is reproducible across runs,
  // partitionings, and engines.
  //
  // Scale: one shuffle on the stratum key; the rank-3 cut is pushed BELOW
  // the shuffle by Spark's WindowGroupLimit (each map task pre-prunes to
  // its local top-3 per stratum), so the shuffle carries
  // O(strata × quota × tasks) rows, not the corpus — the same plan shape
  // PLANS.md documents for q09/x07.
  private val x14: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    val h = md5i(concat(lit("strat:"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("lang"), col("source"))
      .orderBy(col("h"), col("doc_id"))
    d.select(col("doc_id"), col("lang"), col("source"), h.as("h"))
      .withColumn("pick", row_number().over(w))
      .filter(col("pick") <= 3)
      .select(col("lang"), col("source"), col("pick"), col("doc_id"), col("h"))
      .psort(col("lang"), col("source"), col("pick"))
  }

  private val x14Sql =
    s"""SELECT lang, source, pick, doc_id, h FROM (
       |  SELECT lang, source, doc_id,
       |    ${md5iSql("'strat:' || CAST(doc_id AS VARCHAR)")} AS h,
       |    ROW_NUMBER() OVER (PARTITION BY lang, source
       |      ORDER BY ${md5iSql("'strat:' || CAST(doc_id AS VARCHAR)")}, doc_id) AS pick
       |  FROM documents)
       |WHERE pick <= 3 ORDER BY lang, source, pick""".stripMargin

  // ---- x15: trained quality classifier (in-engine learned filter) ---------
  // A linear quality classifier TRAINED INSIDE THE ENGINE — the FineWeb /
  // CCNet-style model-based filter, reduced to its distributed-training
  // essentials: batch perceptron over exact heuristic features (token
  // count, punctuation ratio, stopword ratio, mean token length + bias),
  // labels from a stopword-density rule, three full-batch iterations.
  //
  // Bit-reproducibility (the IvfIndex trick, applied to SGD): each row's
  // per-feature gradient contribution err*f_j is FLOORed to fixed-point
  // (x 2^20) and summed as INTEGERS — associative, so the learned weights
  // are identical under any partitioning/parallelism, and the DuckDB
  // oracle replays the whole training as three unrolled CTE iterations.
  // The driver only ever sees 5 weight scalars per iteration (the k x dim
  // centroid pattern); features stay distributed.
  //
  // Scale: each iteration is one map-only feature pass + one scalar
  // aggregation (map-side partials) over the persisted feature frame —
  // no shuffle wider than 5 longs per partition. 100 TB cost = 3 corpus
  // scans (or 1, checkpointing features), which is what production
  // quality-classifier training pays.
  private val pIters = 8 // full-batch passes; plateau by ~6 on this corpus

  private val x15: Q = (s, dir) => {
    val S = 1048576.0
    val stopArgs = stopwords.map(w => s"'$w'").mkString(", ")
    val ts = expr(s"graft_token_stats(text, $stopArgs)")
    val nTok = ts.getField("n_tokens").cast("long")
    val nStop = ts.getField("n_stop").cast("long")
    val sumLen = ts.getField("sum_len").cast("long")
    val nPunct = length(col("text")) -
      length(regexp_replace(col("text"), "[^A-Za-z0-9 ]", ""))
    val sr = nStop.cast("double") / nTok.cast("double")
    val feats = t(s, dir, "documents").select(
        (nTok.cast("double") / lit(100.0)).as("f1"),
        (nPunct.cast("double") / length(col("text")).cast("double")).as("f2"),
        (sr * lit(10.0)).as("f3"), // x10: comparable scale to f1/f4, else
        // the weak features dominate every update and training stalls
        (sumLen.cast("double") / nTok.cast("double") / lit(10.0)).as("f4"),
        when(sr >= 0.06, 1L).otherwise(0L).as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var w = Array(0.0, 0.0, 0.0, 0.0, 0.0)
      val hist = scala.collection.mutable.ArrayBuffer
        .empty[(Int, Double, Double, Double, Double, Double, Long)]
      (0 to pIters).foreach { it =>
        val score = lit(w(0)) + lit(w(1)) * col("f1") + lit(w(2)) * col("f2") +
          lit(w(3)) * col("f3") + lit(w(4)) * col("f4")
        val r = feats
          .select(col("f1"), col("f2"), col("f3"), col("f4"),
            (col("y") - when(score > 0.0, 1L).otherwise(0L)).as("err"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("err") =!= 0, 1L).otherwise(0L)).as("nerr"),
            sum(floor(col("err").cast("double") * lit(S))).as("gb"),
            sum(floor(col("err").cast("double") * col("f1") * lit(S))).as("g1"),
            sum(floor(col("err").cast("double") * col("f2") * lit(S))).as("g2"),
            sum(floor(col("err").cast("double") * col("f3") * lit(S))).as("g3"),
            sum(floor(col("err").cast("double") * col("f4") * lit(S))).as("g4"))
          .collect()(0)
        hist += ((it, w(0), w(1), w(2), w(3), w(4), r.getLong(1)))
        if (it < pIters) {
          val n = r.getLong(0)
          val gs = Array(r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5), r.getLong(6))
          // decaying step (0.5/(t+1)) — plain lr=0.5 oscillates on this
          // non-separable corpus (259 -> 241 -> 259 misclassified)
          w = w.zip(gs).map { case (wj, g) =>
            wj + (0.5 / (it + 1)) * (g.toDouble / n / S)
          }
        }
      }
      import s.implicits._
      hist.toSeq.toDF("iter", "w_bias", "w_tokens", "w_punct",
          "w_stopword", "w_meanlen", "n_misclassified")
        .psort(col("iter"))
    } finally feats.unpersist(false)
  }

  private val x15Sql = {
    val S = "1048576.0"
    def iter(t: Int): String =
      s"""e$t AS MATERIALIZED (
         |  SELECT f.*, f.y - (CASE WHEN w$t.wb + w$t.w1 * f.f1 + w$t.w2 * f.f2
         |      + w$t.w3 * f.f3 + w$t.w4 * f.f4 > 0.0 THEN 1 ELSE 0 END) AS err
         |  FROM f, w$t),
         |g$t AS MATERIALIZED (
         |  SELECT COUNT(*)::BIGINT AS n,
         |    CAST(SUM(CASE WHEN err <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS nerr,
         |    CAST(SUM(CAST(FLOOR(err::DOUBLE * $S) AS BIGINT)) AS BIGINT) AS gb,
         |    CAST(SUM(CAST(FLOOR(err::DOUBLE * f1 * $S) AS BIGINT)) AS BIGINT) AS g1,
         |    CAST(SUM(CAST(FLOOR(err::DOUBLE * f2 * $S) AS BIGINT)) AS BIGINT) AS g2,
         |    CAST(SUM(CAST(FLOOR(err::DOUBLE * f3 * $S) AS BIGINT)) AS BIGINT) AS g3,
         |    CAST(SUM(CAST(FLOOR(err::DOUBLE * f4 * $S) AS BIGINT)) AS BIGINT) AS g4
         |  FROM e$t),
         |w${t + 1} AS MATERIALIZED (
         |  SELECT wb + (0.5 / ${t + 1}.0) * (CAST(gb AS DOUBLE) / n / $S) AS wb,
         |    w1 + (0.5 / ${t + 1}.0) * (CAST(g1 AS DOUBLE) / n / $S) AS w1,
         |    w2 + (0.5 / ${t + 1}.0) * (CAST(g2 AS DOUBLE) / n / $S) AS w2,
         |    w3 + (0.5 / ${t + 1}.0) * (CAST(g3 AS DOUBLE) / n / $S) AS w3,
         |    w4 + (0.5 / ${t + 1}.0) * (CAST(g4 AS DOUBLE) / n / $S) AS w4
         |  FROM w$t, g$t)""".stripMargin
    def outRow(t: Int): String =
      s"""SELECT $t AS iter, w$t.wb AS w_bias, w$t.w1 AS w_tokens,
         | w$t.w2 AS w_punct, w$t.w3 AS w_stopword, w$t.w4 AS w_meanlen,
         | g$t.nerr AS n_misclassified FROM w$t, g$t""".stripMargin
    s"""WITH base AS MATERIALIZED (
       |  SELECT LENGTH(text) AS len,
       |    LEN(REGEXP_SPLIT_TO_ARRAY(text, ' +')) AS nt,
       |    LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, ' +'),
       |      w -> LIST_CONTAINS($stopListSql, w))) AS ns,
       |    LIST_SUM(LIST_TRANSFORM(REGEXP_SPLIT_TO_ARRAY(text, ' +'),
       |      w -> LENGTH(w))) AS sl,
       |    LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[^A-Za-z0-9 ]', '', 'g')) AS np
       |  FROM documents),
       |f AS MATERIALIZED (
       |  SELECT nt::DOUBLE / 100.0 AS f1, np::DOUBLE / len::DOUBLE AS f2,
       |    ns::DOUBLE / nt::DOUBLE * 10.0 AS f3, sl::DOUBLE / nt::DOUBLE / 10.0 AS f4,
       |    CASE WHEN ns::DOUBLE / nt::DOUBLE >= 0.06 THEN 1 ELSE 0 END AS y
       |  FROM base),
       |w0 AS (SELECT 0.0::DOUBLE AS wb, 0.0::DOUBLE AS w1, 0.0::DOUBLE AS w2,
       |  0.0::DOUBLE AS w3, 0.0::DOUBLE AS w4),
       |${(0 to pIters).map(iter).mkString(",\n")}
       |${(0 to pIters).map(outRow).mkString("\nUNION ALL\n")}
       |ORDER BY iter""".stripMargin
  }

  // ---- x16: BPE tokenizer training (in-engine merge loop) ------------------
  // The tokenizer-training primitive itself: byte-pair-encoding merges
  // learned FROM the corpus, inside the engine. Word counting is the only
  // corpus-scale stage (one shuffle); each merge round then runs on the
  // bounded (word, count) vocabulary — count adjacent symbol pairs
  // weighted by word frequency, pick the argmax (count desc, pair asc —
  // deterministic), apply the merge map-only. The driver holds ONE pair
  // string per round (the k-scalars pattern); at a real scale the vocab
  // table is millions of rows, still vocabulary- not corpus-sized.
  //
  // Greedy-merge encoding: symbols are joined with DOUBLE separators
  // ("••a••b••" for [a,b]) and a merge of (a,b) replaces "•a••b•" with
  // "•ab•". Each match consumes ONE separator from each boundary, so
  // back-to-back occurrences ("a b a b") all merge in one left-to-right
  // REPLACE pass — the exact greedy semantics of BPE — and no pattern can
  // match inside a multi-char symbol. REPLACE scans left-to-right and
  // resumes AFTER each replacement in both engines, so the oracle replays
  // the merge bit-for-bit as unrolled CTE rounds.
  private val bpeRounds = 5

  // Trained merge tables are bounded driver data (one (pair, count) row per
  // round); memoized per sf dir so x16 (the training gate) and x22 (the
  // encode gate) train ONCE -- the build-once tokenizer lifecycle.
  private val bpeMerges = scala.collection.concurrent.TrieMap[
    String, Seq[(Int, String, String, String, Long)]]()

  private def bpeTrain(s: org.apache.spark.sql.SparkSession,
      dir: String): Seq[(Int, String, String, String, Long)] =
    bpeMerges.getOrElseUpdate(dir, {
      val SEP = "\u0001"
      val symsE = s"filter(split(enc, '$SEP'), x -> x <> '')"
      val pairsE = s"transform(sequence(1, size($symsE) - 1), " +
        s"i -> concat(element_at($symsE, i), '$SEP', element_at($symsE, i + 1)))"
      val base = t(s, dir, "documents")
        .select(explode(split(col("text"), " +")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .select(concat(lit(SEP + SEP),
            concat_ws(SEP + SEP, expr("graft_char_grams(w, 1)")),
            lit(SEP + SEP)).as("enc"),
          col("cnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        var words = base
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Int, String, String, String, Long)]
        (1 to bpeRounds).foreach { r =>
          val best = words
            .filter(expr(s"size($symsE) >= 2"))
            .select(col("cnt"), explode(expr(pairsE)).as("p"))
            .groupBy(col("p")).agg(sum(col("cnt")).as("n"))
            .orderBy(col("n").desc, col("p").asc)
            .limit(1).collect()
          if (best.nonEmpty) {
            val p = best(0).getString(0)
            val n = best(0).getLong(1)
            val Array(a, b) = p.split(SEP, 2)
            out += ((r, a, b, a + b, n))
            words = words.select(
              regexp_replace(col("enc"),
                lit(java.util.regex.Pattern.quote(SEP + a + SEP + SEP + b + SEP)),
                lit(java.util.regex.Matcher.quoteReplacement(SEP + a + b + SEP)))
                .as("enc"),
              col("cnt"))
          }
        }
        out.toSeq
      } finally base.unpersist(false)
    })

  private val x16: Q = (s, dir) => {
    import s.implicits._
    bpeTrain(s, dir)
      .toDF("round", "left_sym", "right_sym", "merged", "n_occurrences")
      .psort(col("round"))
  }

  /** Shared oracle machinery for the BPE family: w0 (separator-encoded
    * distinct-word counts) and per-round pair-count/argmax/merge CTEs —
    * b1..bN hold the learned merges; w1..wN the re-encoded vocab. */
  private def bpeCtePrefix: String = {
    def round(r: Int): String =
      s"""p$r AS MATERIALIZED (
         |  SELECT p, CAST(SUM(cnt) AS BIGINT) AS n FROM (
         |    SELECT cnt, UNNEST([s[i] || CHR(1) || s[i+1] FOR i IN RANGE(1, LEN(s))]) AS p
         |    FROM (SELECT LIST_FILTER(STRING_SPLIT(enc, CHR(1)), x -> x <> '') AS s, cnt
         |          FROM w${r - 1})
         |    WHERE LEN(s) >= 2) GROUP BY p),
         |b$r AS (SELECT p, n FROM p$r ORDER BY n DESC, p ASC LIMIT 1),
         |w$r AS MATERIALIZED (
         |  SELECT REPLACE(enc,
         |      CHR(1) || REPLACE(b$r.p, CHR(1), CHR(1) || CHR(1)) || CHR(1),
         |      CHR(1) || REPLACE(b$r.p, CHR(1), '') || CHR(1)) AS enc, cnt
         |  FROM w${r - 1}, b$r)""".stripMargin
    s"""w0 AS MATERIALIZED (
       |  SELECT CHR(1) || CHR(1) ||
       |      ARRAY_TO_STRING(REGEXP_EXTRACT_ALL(w, '(?s).'), CHR(1) || CHR(1)) ||
       |      CHR(1) || CHR(1) AS enc,
       |    cnt
       |  FROM (SELECT w, COUNT(*) AS cnt FROM (
       |    SELECT UNNEST(REGEXP_SPLIT_TO_ARRAY(text, ' +')) AS w FROM documents)
       |    GROUP BY w)),
       |${(1 to bpeRounds).map(round).mkString(",\n")}""".stripMargin
  }

  private val x16Sql = {
    def outRow(r: Int): String =
      s"""SELECT $r AS round, SPLIT_PART(p, CHR(1), 1) AS left_sym,
         | SPLIT_PART(p, CHR(1), 2) AS right_sym,
         | REPLACE(p, CHR(1), '') AS merged, n AS n_occurrences FROM b$r""".stripMargin
    s"""WITH $bpeCtePrefix
       |${(1 to bpeRounds).map(outRow).mkString("\nUNION ALL\n")}
       |ORDER BY round""".stripMargin
  }

  // ---- x22: BPE encode (apply the trained merges) -------------------------
  // The inference half of the tokenizer lifecycle: x16 learns the merge
  // table, x22 encodes the corpus with it and reports per-document token
  // counts and compression (chars/token) -- the number a data pipeline
  // budgets context windows and training cost with.
  //
  // Scale: merges apply to the DISTINCT-word dictionary (bounded, like the
  // vocab x16 trains on), never to corpus occurrences; the corpus pass is
  // one explode + a broadcast join of the (word -> n_tokens) dictionary +
  // one doc_id shuffle. Same round-order REPLACE semantics as training
  // (leftmost non-overlapping, resuming after each replacement -- identical
  // in both engines), so the oracle replays training AND encoding exactly.
  /** Encoded dictionary (word -> n_sym tokens) from the trained BPE merges.
    * Bounded by DISTINCT-word cardinality (the vocabulary x16 trains on),
    * built once per sf dir and shared by the encode (x22) and
    * tokenizer-fertility (x31) gates -- the "train once, apply everywhere"
    * tokenizer lifecycle. */
  private def bpeDictF(s: SparkSession, dir: String): DataFrame =
    memoized(s"bpedict:$dir") {
      val SEP = "\u0001"
      val merges = bpeTrain(s, dir)
      val enc0 = concat(lit(SEP + SEP),
        concat_ws(SEP + SEP, expr("graft_char_grams(w, 1)")), lit(SEP + SEP))
      val dict0 = t(s, dir, "documents")
        .select(explode(split(col("text"), " +")).as("w"))
        .filter(col("w") =!= "").distinct()
        .select(col("w"), enc0.as("enc"))
      val dictN = merges.foldLeft(dict0) { case (df, (_, a, b, _, _)) =>
        df.select(col("w"), regexp_replace(col("enc"),
          lit(java.util.regex.Pattern.quote(SEP + a + SEP + SEP + b + SEP)),
          lit(java.util.regex.Matcher.quoteReplacement(SEP + a + b + SEP)))
          .as("enc"))
      }
      dictN.select(col("w"),
        size(expr(s"filter(split(enc, '$SEP'), x -> x <> '')"))
          .cast("long").as("n_sym"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

  private val x22: Q = (s, dir) => {
    val dictF = bpeDictF(s, dir)
    t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " +")).as("w"))
      .filter(col("w") =!= "")
      .join(broadcast(dictF), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w")).cast("long")).as("n_chars"),
        sum(col("n_sym")).as("n_tokens"))
      .select(col("doc_id"), col("n_words"), col("n_chars"), col("n_tokens"),
        (col("n_chars").cast("double") / col("n_tokens").cast("double"))
          .as("chars_per_token"))
      .psort(col("doc_id"))
  }

  /** DuckDB CTE chain replaying bpeDictF (training rounds + dictionary
    * encode through dictF) — shared by the x22 and x31 oracles. */
  private def bpeDictSqlCtes: String = {
    def dictRound(r: Int): String =
      s"""dict$r AS MATERIALIZED (
         |  SELECT w, REPLACE(enc,
         |      CHR(1) || REPLACE(b$r.p, CHR(1), CHR(1) || CHR(1)) || CHR(1),
         |      CHR(1) || REPLACE(b$r.p, CHR(1), '') || CHR(1)) AS enc
         |  FROM dict${r - 1}, b$r)""".stripMargin
    s"""$bpeCtePrefix,
       |dict0 AS MATERIALIZED (
       |  SELECT w, CHR(1) || CHR(1) ||
       |      ARRAY_TO_STRING(REGEXP_EXTRACT_ALL(w, '(?s).'), CHR(1) || CHR(1)) ||
       |      CHR(1) || CHR(1) AS enc
       |  FROM (SELECT DISTINCT w FROM (
       |    SELECT UNNEST(REGEXP_SPLIT_TO_ARRAY(text, ' +')) AS w FROM documents))
       |  WHERE w <> ''),
       |${(1 to bpeRounds).map(dictRound).mkString(",\n")},
       |dictF AS (
       |  SELECT w, CAST(LEN(LIST_FILTER(STRING_SPLIT(enc, CHR(1)),
       |    x -> x <> '')) AS BIGINT) AS n_sym
       |  FROM dict$bpeRounds)""".stripMargin
  }

  private val x22Sql =
    s"""WITH $bpeDictSqlCtes,
       |docw AS (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id, UNNEST(REGEXP_SPLIT_TO_ARRAY(text, ' +')) AS w
       |    FROM documents) WHERE w <> '')
       |SELECT doc_id, COUNT(*) AS n_words,
       | CAST(SUM(LEN(w)) AS BIGINT) AS n_chars,
       | CAST(SUM(n_sym) AS BIGINT) AS n_tokens,
       | CAST(SUM(LEN(w)) AS DOUBLE) / CAST(SUM(n_sym) AS DOUBLE) AS chars_per_token
       |FROM docw JOIN dictF USING (w)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- x17: train/eval split with contamination (leakage) detection --------
  // Deterministic hash split (80/20 on a salted doc hash) plus the check
  // every eval set needs: no document may have a CANONICAL duplicate on
  // the other side of the boundary. The corpus has no organic exact dups,
  // so the query plants d09's case/space/word-order twins (same planting
  // convention, identical on both engines) and the detector must surface
  // exactly the twin pairs the hash split separated.
  //
  // Scale: split assignment is a map-only hash; leakage detection is ONE
  // shuffle on the canonical hash (d01/d09 shape) with the two split
  // counters folded in the same aggregation — no join, no second pass.
  private val x17: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    val variants = d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(upper(array_join(reverse(split(col("text"), " ")), "  ")), lit("  ")).as("text"))
    val corpus = d.select(col("doc_id"), col("text")).unionAll(variants)
    val isTrain = md5i(concat(lit("split:"), col("doc_id").cast("string"))) % 10 < 8
    val canon = corpus.select(col("doc_id"),
      when(isTrain, "train").otherwise("eval").as("part"),
      md5(array_join(array_sort(split(regexp_replace(lower(trim(col("text"))), " +", " "), " ")), " ")).as("ch"))
    canon.groupBy(col("ch"))
      .agg(sum(when(col("part") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("part") === "eval", 1L).otherwise(0L)).as("n_eval"),
        min(when(col("part") === "train", col("doc_id"))).as("train_doc"),
        min(when(col("part") === "eval", col("doc_id"))).as("eval_doc"))
      .filter(col("n_train") > 0 && col("n_eval") > 0)
      .psortScaled(col("ch"))
  }

  private val x17Sql =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000,
       |    UPPER(ARRAY_TO_STRING(LIST_REVERSE(STRING_SPLIT(text, ' ')), '  ')) || '  '
       |  FROM documents WHERE doc_id % 5 = 0),
       |canon AS (
       |  SELECT doc_id,
       |    CASE WHEN ${md5iSql("'split:' || CAST(doc_id AS VARCHAR)")} % 10 < 8
       |         THEN 'train' ELSE 'eval' END AS part,
       |    MD5(ARRAY_TO_STRING(LIST_SORT(STRING_SPLIT(
       |      REGEXP_REPLACE(LOWER(TRIM(text)), ' +', ' ', 'g'), ' ')), ' ')) AS ch
       |  FROM corpus)
       |SELECT ch,
       | CAST(SUM(CASE WHEN part = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
       | CAST(SUM(CASE WHEN part = 'eval' THEN 1 ELSE 0 END) AS BIGINT) AS n_eval,
       | MIN(CASE WHEN part = 'train' THEN doc_id END) AS train_doc,
       | MIN(CASE WHEN part = 'eval' THEN doc_id END) AS eval_doc
       |FROM canon GROUP BY ch
       |HAVING SUM(CASE WHEN part = 'train' THEN 1 ELSE 0 END) > 0
       |   AND SUM(CASE WHEN part = 'eval' THEN 1 ELSE 0 END) > 0
       |ORDER BY ch""".stripMargin

  // ---- x18: dataset card (per-stratum corpus profile) ----------------------
  // The summary artifact a curation pipeline publishes with a dataset:
  // per (lang, source) document/char/token totals, quality-flag rate, and
  // mean document length. One aggregation pass with map-side partials —
  // at 100 TB this is a single shuffle of O(strata) partial rows per task.
  // Determinism: integer sums and single divisions of exact integers.
  private val x18: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    val stopArgs = stopwords.map(w => s"'$w'").mkString(", ")
    val ts = expr(s"graft_token_stats(text, $stopArgs)")
    val nTok = ts.getField("n_tokens").cast("long")
    val nStop = ts.getField("n_stop").cast("long")
    val flagged = nTok < 10 ||
      nStop.cast("double") / nTok.cast("double") < 0.01
    d.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(nTok).as("total_tokens"),
        sum(when(flagged, 1L).otherwise(0L)).as("n_flagged"))
      .select(col("lang"), col("source"), col("n_docs"), col("total_chars"),
        col("total_tokens"),
        (col("total_chars").cast("double") / col("n_docs").cast("double"))
          .as("mean_doc_chars"),
        (col("n_flagged").cast("double") / col("n_docs").cast("double"))
          .as("flagged_rate"))
      .psort(col("lang"), col("source"))
  }

  private val x18Sql =
    s"""SELECT lang, source, COUNT(*) AS n_docs,
       | CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       | CAST(SUM(LEN(REGEXP_SPLIT_TO_ARRAY(text, ' +'))) AS BIGINT) AS total_tokens,
       | CAST(SUM(n_chars) AS BIGINT)::DOUBLE / COUNT(*)::DOUBLE AS mean_doc_chars,
       | CAST(SUM(CASE WHEN LEN(REGEXP_SPLIT_TO_ARRAY(text, ' +')) < 10
       |     OR LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, ' +'),
       |          w -> LIST_CONTAINS($stopListSql, w)))::DOUBLE
       |        / LEN(REGEXP_SPLIT_TO_ARRAY(text, ' +'))::DOUBLE < 0.01
       |   THEN 1 ELSE 0 END) AS BIGINT)::DOUBLE / COUNT(*)::DOUBLE AS flagged_rate
       |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin

  // ---- x19: weighted reservoir (priority) sampling -------------------------
  // Weighted sampling without replacement as a PRIORITY sample: item i with
  // integer weight w_i draws w_i independent uniforms and its priority is
  // the MINIMUM draw; the k smallest priorities per group are the sample.
  // P(min of w uniforms <= t) = 1-(1-t)^w, so selection probability rises
  // with weight exactly like the A-Res u^(1/w) key (Efraimidis/Spirakis) —
  // but the draws here are md5-derived INTEGERS, so both engines order
  // identically with zero float-comparison risk, and the whole sample is
  // reproducible from the data alone (re-runs and backfills pick the same
  // rows — what a training-data pipeline needs from its samplers).
  //
  // Scale: map-only priority computation (bounded <=8 hashes/doc), then a
  // per-group top-k window — the rank<=k predicate pushes into the sort as
  // a WindowGroupLimit, so each map task keeps only k rows per group before
  // the shuffle. No global sort, no collect.
  private val x19: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    val wgt = (lit(1L) + least((col("n_chars") / lit(100)).cast("long"), lit(7L)))
      .as("weight")
    val pri = array_min(transform(
      sequence(lit(1L), col("weight")),
      j => md5i(concat(col("doc_id").cast("string"), lit(":"), j.cast("string")))))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("priority").asc, col("doc_id").asc)
    d.select(col("doc_id"), col("source"), wgt)
      .withColumn("priority", pri)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("source"), col("rank"), col("doc_id"), col("weight"),
        col("priority"))
      .psort(col("source"), col("rank"))
  }

  private val x19Sql =
    s"""WITH w AS (
       |  SELECT doc_id, source,
       |    1 + LEAST(n_chars // 100, 7) AS weight
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, source, weight,
       |    LIST_MIN([${md5iSql("doc_id || ':' || j")}
       |      FOR j IN RANGE(1, weight + 1)]) AS priority
       |  FROM w),
       |r AS (
       |  SELECT source, doc_id, weight, priority,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY priority, doc_id) AS rank
       |  FROM p)
       |SELECT source, rank, doc_id, weight, priority
       |FROM r WHERE rank <= 5 ORDER BY source, rank""".stripMargin

  // ---- x20: RAG chunking (sliding window with overlap) ---------------------
  // Retrieval-corpus preparation: fixed 200-char windows at stride 150
  // (50-char overlap so no boundary-spanning passage is lost), each chunk
  // addressed by (doc_id, chunk_id, pos) and content-hashed for the
  // downstream embedding/dedup stages. Map-only explode — at 100 TB this is
  // a scan-transform pass whose output feeds the ANN index build; the
  // overlap factor (4/3 here) is the only data inflation.
  private val chunkLen = 200
  private val chunkStride = 150

  private val x20: Q = (s, dir) => {
    val d = t(s, dir, "documents").filter(col("n_chars") >= 1)
    d.select(col("doc_id"),
        explode(expr(s"sequence(1, length(text), $chunkStride)")).as("pos"),
        col("text"))
      .select(col("doc_id"),
        (((col("pos") - 1) / lit(chunkStride)).cast("long") + 1).as("chunk_id"),
        col("pos").cast("long").as("pos"),
        expr(s"substr(text, pos, $chunkLen)").as("c"))
      .select(col("doc_id"), col("chunk_id"), col("pos"),
        length(col("c")).cast("long").as("chunk_chars"), md5(col("c")).as("chunk_md5"))
      .psortScaled(col("doc_id"), col("chunk_id"))
  }

  private val x20Sql =
    s"""SELECT doc_id, (pos - 1) // $chunkStride + 1 AS chunk_id, pos,
       | CAST(LENGTH(SUBSTR(text, CAST(pos AS INTEGER), $chunkLen)) AS BIGINT) AS chunk_chars,
       | MD5(SUBSTR(text, CAST(pos AS INTEGER), $chunkLen)) AS chunk_md5
       |FROM (SELECT doc_id, text, UNNEST(RANGE(1, LEN(text) + 1, $chunkStride)) AS pos
       |      FROM documents WHERE n_chars >= 1)
       |ORDER BY doc_id, chunk_id""".stripMargin

  // ---- x21: count-min sketch heavy hitters + error eval --------------------
  // Frequency estimation under sublinear memory: a 4x512 count-min sketch
  // (fixed md5-derived row hashes, so both engines build the identical
  // sketch) estimates term counts as the min over its 4 cells; the gate
  // compares the estimate against exact counts for the top-20 terms —
  // the overestimate column IS the sketch-quality metric (CMS never
  // underestimates; collisions only inflate).
  //
  // Scale: the sketch build is ONE shuffle of at most d*width = 2048
  // partial rows per map task (map-side partial aggregation absorbs the
  // corpus-sized explode), and the sketch itself is broadcast-sized by
  // construction — the mergeable-summary pattern that replaces exact
  // counting when the vocabulary outgrows memory at 100 TB.
  private val cmsDepth = 4
  private val cmsWidth = 512

  // The d=4 row hashes are the 4 disjoint 8-hex-char slices of ONE md5 per
  // DISTINCT term (md5's avalanche makes the slices independent row hashes)
  // — 1 md5/term instead of d md5s per word OCCURRENCE, and the sketch is
  // built from the pre-aggregated (term, n) dictionary, which is
  // count-identical to streaming occurrences but shuffles dictionary-sized
  // rows. First cut paid 1.7 s at sf0.1 for the 4x corpus explode; this
  // shape is 0.4 s and the one the same pipeline would run at 100 TB.
  private def cmsBucketExpr(j: String, termMd5: String): String =
    s"(CAST(conv(substr($termMd5, CAST($j * 8 + 1 AS INT), 8), 16, 10) AS BIGINT) % $cmsWidth)"

  private val x21: Q = (s, dir) => {
    val counts = t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("true_n"))
      .withColumn("m", md5(col("term")))
    val cells = counts
      .select(col("true_n"), explode(sequence(lit(0L), lit(cmsDepth - 1L))).as("j"),
        expr(cmsBucketExpr("j", "m")).as("b"))
      .groupBy(col("j"), col("b")).agg(sum(col("true_n")).as("cnt"))
    val top = counts
      .orderBy(col("true_n").desc, col("term")).limit(20)
    top
      .select(col("term"), col("true_n"),
        explode(sequence(lit(0L), lit(cmsDepth - 1L))).as("j"),
        col("m"))
      .select(col("term"), col("true_n"), col("j"),
        expr(cmsBucketExpr("j", "m")).as("b"))
      .join(broadcast(cells), Seq("j", "b"))
      .groupBy(col("term"), col("true_n"))
      .agg(min(col("cnt")).as("est_n"))
      .select(col("term"), col("true_n"), col("est_n"),
        (col("est_n") - col("true_n")).as("overest"))
      .psort(col("true_n").desc, col("term"))
  }

  private val x21Sql = {
    val bucket = (j: String, m: String) =>
      s"(('0x' || substr($m, CAST($j * 8 + 1 AS INTEGER), 8))::BIGINT % $cmsWidth)"
    s"""WITH counts AS MATERIALIZED (
       |  SELECT w AS term, COUNT(*) AS true_n, MD5(w) AS m
       |  FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents)
       |  WHERE w <> '' GROUP BY w),
       |cells AS (
       |  SELECT j, ${bucket("j", "m")} AS b,
       |    CAST(SUM(true_n) AS BIGINT) AS cnt
       |  FROM counts, RANGE(0, $cmsDepth) r(j) GROUP BY 1, 2),
       |top AS (
       |  SELECT term, true_n, m FROM counts
       |  ORDER BY true_n DESC, term LIMIT 20),
       |est AS (
       |  SELECT t.term, t.true_n, MIN(c.cnt) AS est_n
       |  FROM top t, RANGE(0, $cmsDepth) r(j)
       |  JOIN cells c ON c.j = r.j AND c.b = ${bucket("r.j", "t.m")}
       |  GROUP BY t.term, t.true_n)
       |SELECT term, true_n, est_n, est_n - true_n AS overest
       |FROM est ORDER BY true_n DESC, term""".stripMargin
  }

  // ---- x23: composed quality FILTER (per-source funnel report) -------------
  // x02 scores documents; this runs the actual GATE a C4/Gopher-style
  // pipeline applies — every rule evaluated per doc (a doc can fail several),
  // keep = no rule fired — and emits the per-source filter funnel: how many
  // docs each rule rejected and the kept rate. The report a curation run
  // publishes alongside its output shards. Map-only rule evaluation with one
  // O(sources) aggregation; all counters exact integers.
  private val x23: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    val stopArgs = stopwords.map(w => s"'$w'").mkString(", ")
    val ts = expr(s"graft_token_stats(text, $stopArgs)")
    val nTok = ts.getField("n_tokens")
    val nStop = ts.getField("n_stop")
    val sumLen = ts.getField("sum_len")
    val nPunct = length(col("text")) -
      length(regexp_replace(col("text"), "[^A-Za-z0-9 ]", ""))
    val meanTokLen = sumLen.cast("double") / nTok.cast("double")
    val fShort = length(col("text")) < 50
    val fTokens = nTok < 10
    val fStop = nStop.cast("double") / nTok.cast("double") < 0.01
    val fPunct = nPunct.cast("double") / length(col("text")).cast("double") > 0.3
    val fTokLen = meanTokLen > 12.0 || meanTokLen < 2.0
    def b(c: org.apache.spark.sql.Column) = when(c, 1L).otherwise(0L)
    d.select(col("source"), b(fShort).as("r1"), b(fTokens).as("r2"),
        b(fStop).as("r3"), b(fPunct).as("r4"), b(fTokLen).as("r5"))
      .withColumn("kept",
        when(col("r1") + col("r2") + col("r3") + col("r4") + col("r5") === 0, 1L)
          .otherwise(0L))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("kept")).as("n_kept"),
        sum(col("r1")).as("n_too_short"), sum(col("r2")).as("n_few_tokens"),
        sum(col("r3")).as("n_low_stopword"), sum(col("r4")).as("n_high_punct"),
        sum(col("r5")).as("n_bad_token_len"))
      .select(col("source"), col("n_docs"), col("n_kept"),
        (col("n_kept").cast("double") / col("n_docs").cast("double"))
          .as("kept_rate"),
        col("n_too_short"), col("n_few_tokens"), col("n_low_stopword"),
        col("n_high_punct"), col("n_bad_token_len"))
      .psort(col("source"))
  }

  private val x23Sql = {
    val toks = "REGEXP_SPLIT_TO_ARRAY(text, ' +')"
    val nTok = s"LEN($toks)"
    val nStop = s"LEN(LIST_FILTER($toks, w -> LIST_CONTAINS($stopListSql, w)))"
    val nPunct =
      "(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[^A-Za-z0-9 ]', '', 'g')))"
    val meanTokLen =
      s"(LIST_SUM(LIST_TRANSFORM($toks, w -> LENGTH(w)))::DOUBLE / $nTok::DOUBLE)"
    val r1 = "CASE WHEN LENGTH(text) < 50 THEN 1 ELSE 0 END"
    val r2 = s"CASE WHEN $nTok < 10 THEN 1 ELSE 0 END"
    val r3 = s"CASE WHEN $nStop::DOUBLE / $nTok::DOUBLE < 0.01 THEN 1 ELSE 0 END"
    val r4 = s"CASE WHEN $nPunct::DOUBLE / LENGTH(text)::DOUBLE > 0.3 THEN 1 ELSE 0 END"
    val r5 = s"CASE WHEN $meanTokLen > 12.0 OR $meanTokLen < 2.0 THEN 1 ELSE 0 END"
    s"""WITH r AS (
       |  SELECT source, $r1 AS r1, $r2 AS r2, $r3 AS r3, $r4 AS r4, $r5 AS r5
       |  FROM documents),
       |k AS (
       |  SELECT source, r1, r2, r3, r4, r5,
       |    CASE WHEN r1 + r2 + r3 + r4 + r5 = 0 THEN 1 ELSE 0 END AS kept
       |  FROM r)
       |SELECT source, COUNT(*) AS n_docs,
       | CAST(SUM(kept) AS BIGINT) AS n_kept,
       | CAST(SUM(kept) AS BIGINT)::DOUBLE / COUNT(*)::DOUBLE AS kept_rate,
       | CAST(SUM(r1) AS BIGINT) AS n_too_short,
       | CAST(SUM(r2) AS BIGINT) AS n_few_tokens,
       | CAST(SUM(r3) AS BIGINT) AS n_low_stopword,
       | CAST(SUM(r4) AS BIGINT) AS n_high_punct,
       | CAST(SUM(r5) AS BIGINT) AS n_bad_token_len
       |FROM k GROUP BY source ORDER BY source""".stripMargin
  }

  // ---- x24: perplexity-bucketed sampling ----------------------------------
  /** x24: perplexity-bucketed quality sampling — the curation step that sits
    * on top of x13's LM scores: documents are quartile-bucketed by mean NLL
    * (bucket 1 = most natural text) and down-sampled with per-bucket keep
    * rates (1000/500/250/125 permille) by deterministic md5 hash, so the
    * output mixture keeps proportionally more of the high-quality tail.
    * Reuses the persisted x13 scoring pass (shared-pass lifecycle).
    *
    * The quartile bucket comes from [[graft.operators.DistributedRank]]
    * (approx-quantile cuts -> bucket-partitioned ranks -> exact NTILE
    * arithmetic), NOT a global NTILE window: the committed plan has no
    * single-partition window, sorts ~1/32 of the scores per task, and is
    * bit-identical to the oracle's NTILE — the 100 TB spelling IS the gated
    * spelling. The persisted lmScored frame absorbs the helper's extra
    * cut/count passes. */
  private val x24: Q = (s, dir) => {
    val rate = expr(
      "CASE bucket WHEN 1 THEN 1000 WHEN 2 THEN 500 WHEN 3 THEN 250 ELSE 125 END")
    val (ranked, total) = graft.operators.DistributedRank.withGlobalRank(
      lmScored(s, dir), col("avg_nll_micronats"),
      Seq(col("avg_nll_micronats"), col("doc_id")), "__rk")
    ranked
      .withColumn("bucket",
        graft.operators.DistributedRank.ntileFromRank(col("__rk"), 4, total)
          .cast("long"))
      .withColumn("keep",
        (md5i(concat(lit("ppl:"), col("doc_id"))) % 1000 < rate)
          .cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("keep")).as("n_kept"),
        min(col("avg_nll_micronats")).as("nll_lo"),
        max(col("avg_nll_micronats")).as("nll_hi"))
      .psort(col("bucket"))
  }

  private val x24Sql =
    s"""WITH ex AS (
       |  SELECT doc_id, UNNEST([SUBSTR(text, i, 2) FOR i IN RANGE(1, LEN(text))]) AS bg
       |  FROM documents WHERE LEN(text) >= 2),
       |model AS (
       |  SELECT bg,
       |    CAST(ROUND(-LN(COUNT(*)::DOUBLE / (SELECT COUNT(*) FROM ex)::DOUBLE)
       |      * 1000000.0) AS BIGINT) AS nll_micro
       |  FROM ex GROUP BY bg),
       |docbg AS (SELECT doc_id, bg, COUNT(*) AS k FROM ex GROUP BY 1, 2),
       |scored AS (
       |  SELECT d.doc_id,
       |    CAST(SUM(d.k * m.nll_micro) AS BIGINT) // CAST(SUM(d.k) AS BIGINT)
       |      AS avg_nll
       |  FROM docbg d JOIN model m ON d.bg = m.bg GROUP BY d.doc_id),
       |b AS (
       |  SELECT doc_id, avg_nll,
       |    CAST(NTILE(4) OVER (ORDER BY avg_nll, doc_id) AS BIGINT) AS bucket
       |  FROM scored),
       |k AS (
       |  SELECT bucket, avg_nll,
       |    CASE WHEN ${md5iSql("'ppl:' || doc_id")} % 1000 <
       |      CASE bucket WHEN 1 THEN 1000 WHEN 2 THEN 500
       |                  WHEN 3 THEN 250 ELSE 125 END
       |    THEN 1 ELSE 0 END AS keep
       |  FROM b)
       |SELECT bucket, COUNT(*) AS n_docs, CAST(SUM(keep) AS BIGINT) AS n_kept,
       | MIN(avg_nll) AS nll_lo, MAX(avg_nll) AS nll_hi
       |FROM k GROUP BY bucket ORDER BY bucket""".stripMargin

  // ---- x25: context-length packing-efficiency curve ------------------------
  /** x25: the sizing study run before committing to a context length — x10's
    * greedy start-offset packing evaluated at 128/256/512-token contexts in
    * ONE pass: per (context, source, shard) the bin count is max(bin)+1, the
    * curve reports total bins, capacity (bins × context) and utilization
    * (docs straddling a boundary stay in their start bin, so per-bin tokens
    * may exceed the context and utilization may top 1 — the same convention
    * the oracle replays). The cumulative-sum window runs ONCE over the
    * corpus (shard-partitioned, no global order) and the three context
    * sizes fan out map-only from it. */
  private val x25: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    val toks = d.select(col("doc_id"), col("source"),
      pmod(col("doc_id"), lit(4)).as("shard"),
      size(split(col("text"), " +")).cast("long").as("tok"))
    val w = Window.partitionBy(col("source"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = toks.withColumn("cum", sum(col("tok")).over(w))
    cum.withColumn("ctx", explode(array(lit(128L), lit(256L), lit(512L))))
      .withColumn("bin",
        floor((col("cum") - col("tok")) / col("ctx").cast("double")).cast("long"))
      .groupBy(col("ctx"), col("source"), col("shard"))
      .agg((max(col("bin")) + 1L).as("n_bins"), sum(col("tok")).as("toks"),
        count(lit(1)).as("nd"))
      .groupBy(col("ctx"))
      .agg(sum(col("n_bins")).as("total_bins"), sum(col("toks")).as("total_tokens"),
        sum(col("nd")).as("n_docs"))
      .select(col("ctx"), col("total_bins"), col("total_tokens"), col("n_docs"),
        (col("total_bins") * col("ctx")).as("capacity"),
        (col("total_tokens").cast("double") /
          (col("total_bins") * col("ctx")).cast("double")).as("utilization"))
      .psort(col("ctx"))
  }

  private val x25Sql =
    """WITH toks AS (
      |  SELECT doc_id, source, doc_id % 4 AS shard,
      |    LEN(REGEXP_SPLIT_TO_ARRAY(text, ' +')) AS tok
      |  FROM documents),
      |cum AS (
      |  SELECT doc_id, source, shard, tok,
      |    SUM(tok) OVER (PARTITION BY source, shard ORDER BY doc_id
      |                   ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM toks),
      |binned AS (
      |  SELECT ctx, source, shard, tok,
      |    CAST(FLOOR((cum - tok) / ctx::DOUBLE) AS BIGINT) AS bin
      |  FROM cum, UNNEST([128, 256, 512]) t(ctx)),
      |per AS (
      |  SELECT ctx, source, shard, MAX(bin) + 1 AS n_bins,
      |    CAST(SUM(tok) AS BIGINT) AS toks, COUNT(*) AS nd
      |  FROM binned GROUP BY 1, 2, 3)
      |SELECT CAST(ctx AS BIGINT) AS ctx,
      | CAST(SUM(n_bins) AS BIGINT) AS total_bins,
      | CAST(SUM(toks) AS BIGINT) AS total_tokens,
      | CAST(SUM(nd) AS BIGINT) AS n_docs,
      | CAST(SUM(n_bins) * ctx AS BIGINT) AS capacity,
      | CAST(SUM(toks) AS BIGINT)::DOUBLE
      |   / CAST(SUM(n_bins) * ctx AS BIGINT)::DOUBLE AS utilization
      |FROM per GROUP BY ctx ORDER BY ctx""".stripMargin

  // ---- x26: curriculum ordering (length tiers, source-interleaved) --------
  /** x26: deterministic curriculum ordering — the data-ORDER op of a
    * training pipeline: documents are terciled by length (short-to-long
    * curriculum), and within each tier the sources are round-robin
    * interleaved (pos-major) so no contiguous run comes from one source.
    * The full ordering is reproducible from the data alone; the gate emits
    * the first 200 positions. Both corpus-cardinality orderings (the length
    * tercile and the final interleave rank) run through
    * [[graft.operators.DistributedRank]] — bucket-partitioned exact ranks,
    * no single-partition window anywhere in the committed plan. The
    * interleave rank's order surrogate packs (tier, pos) into one long
    * (tier*2^44 + pos — pos is bounded by the corpus row count, far under
    * 2^44), a prefix-coarsening of the full (tier, pos, source, doc_id)
    * sort key as the helper requires. */
  private val x26: Q = (s, dir) => {
    import graft.operators.DistributedRank.{ntileFromRank, withGlobalRank}
    // persisted input slice (shared-pass lifecycle): DistributedRank's
    // cut/count passes re-execute their input, so the 3-column projection
    // materializes once instead of re-scanning parquet per pass
    val base = memoized(s"x26base:$dir") {
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    val (lenRanked, nDocs) = withGlobalRank(
      base, col("n_chars"), Seq(col("n_chars"), col("doc_id")), "__lr")
    val tiered = lenRanked
      .withColumn("tier", ntileFromRank(col("__lr"), 3, nDocs).cast("long"))
      .drop("__lr")
    val wrr = Window.partitionBy(col("tier"), col("source")).orderBy(col("doc_id"))
    // the positioned frame feeds the interleave rank's cut/count passes:
    // persist it (the q91 lifecycle) so the tier rank + position window
    // execute once, not three times
    val ranked = memoized(s"x26ranked:$dir")(
      tiered.withColumn("pos", row_number().over(wrr).cast("long"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    // r13: only ranks <= 200 survive, so the former third DistributedRank
    // (quantile pass + count pass + bucket windows over the whole frame)
    // is overkill — a global top-k on the SAME total order is one
    // TakeOrderedAndProject (per-partition partial top-k, no full sort at
    // any scale), and the exact global rank of those 200 rows is their
    // position in the ordered bounded result: a partition-ordered
    // zipWithIndex (the q123 sequence discipline — no Window node, so the
    // suite-wide global-window lint keeps holding with no allowlist).
    // Identical output.
    val top = ranked
      .orderBy(col("tier"), col("pos"), col("source"), col("doc_id"))
      .limit(200)
      // ADVICE r13: the zipWithIndex rank relied on TakeOrderedAndProject
      // emitting one sorted partition — true today but an implicit
      // physical-plan contract. Make it explicit on the BOUNDED 200-row
      // result: one partition, re-sorted in place (no Window node, lint
      // holds; cost is a single 200-row task).
      .coalesce(1)
      .sortWithinPartitions(
        col("tier"), col("pos"), col("source"), col("doc_id"))
    val outSchema = org.apache.spark.sql.types.StructType(
      top.schema.fields :+ org.apache.spark.sql.types.StructField(
        "rank", org.apache.spark.sql.types.LongType, nullable = false))
    val rankedTop = top.sparkSession.createDataFrame(
      top.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L)) }, outSchema)
    rankedTop
      .select(col("rank"), col("doc_id"), col("tier"), col("source"), col("pos"))
      .psort(col("rank"))
  }

  private val x26Sql =
    """WITH tiered AS (
      |  SELECT doc_id, source, n_chars,
      |    CAST(NTILE(3) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS tier
      |  FROM documents),
      |ranked AS (
      |  SELECT doc_id, source, tier,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY tier, source ORDER BY doc_id)
      |      AS BIGINT) AS pos
      |  FROM tiered),
      |ordered AS (
      |  SELECT rank, doc_id, tier, source, pos FROM (
      |    SELECT doc_id, source, tier, pos,
      |      CAST(ROW_NUMBER() OVER (ORDER BY tier, pos, source, doc_id)
      |        AS BIGINT) AS rank
      |    FROM ranked))
      |SELECT rank, doc_id, tier, source, pos FROM ordered
      |WHERE rank <= 200 ORDER BY rank""".stripMargin

  // ---- x27: held-out perplexity (train/eval split LM evaluation) ----------
  /** x27: the EVAL half of LM-based quality scoring — x13 scores every doc
    * with a model trained on the whole corpus (fine for filtering, useless
    * as a generalization metric); x27 trains the bigram model ONLY on the
    * 80% hash split (x17's split convention) and scores the held-out 20%,
    * reporting per-source held-out cross-entropy plus the OOV count.
    * Held-out bigrams unseen in training get the standard "count-1" penalty
    * −ln(1/total) quantized to micro-nats, so the score is total and exact.
    * Scoring goes through the explode + broadcast-model join (not
    * graft_lm_fold, which by contract rejects OOV): the model side is
    * |charset|² rows broadcast, the eval side aggregates (doc, bigram)
    * with map-side partials — one shuffle keyed by document. */
  private val x27: Q = (s, dir) => {
    val d = t(s, dir, "documents").filter(length(col("text")) >= 2)
      .withColumn("part",
        when(md5i(concat(lit("split:"), col("doc_id").cast("string"))) % 10 < 8,
          "train").otherwise("eval"))
    val ex = d.select(col("doc_id"), col("source"), col("part"),
      explode(expr("graft_char_grams(text, 2)")).as("bg"))
    val trainCounts = ex.filter(col("part") === "train")
      .groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
    // grand total via a broadcast 1-row aggregate (shuffle reuse), not a
    // single-partition window over the bounded counts frame
    val model = trainCounts
      .crossJoin(broadcast(trainCounts.agg(sum(col("cnt")).as("total"))))
      .select(col("bg"),
        round(-log(col("cnt").cast("double") / col("total").cast("double"))
          * 1000000.0).cast("long").as("nll_micro"),
        round(log(col("total").cast("double")) * 1000000.0).cast("long")
          .as("oov_micro"))
    val scored = ex.filter(col("part") === "eval")
      .groupBy(col("doc_id"), col("source"), col("bg"))
      .agg(count(lit(1)).as("k"))
      .join(broadcast(model.drop("oov_micro")), Seq("bg"), "left")
    val oov = model.agg(max(col("oov_micro")).as("oov_micro"))
    scored.crossJoin(broadcast(oov))
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        sum(col("k")).as("n_bigrams"),
        sum(when(col("nll_micro").isNull, col("k")).otherwise(0L)).as("n_oov"),
        sum(col("k") * coalesce(col("nll_micro"), col("oov_micro")))
          .as("total_nll"))
      .select(col("source"), col("n_docs"), col("n_bigrams"), col("n_oov"),
        expr("total_nll div n_bigrams").as("avg_nll_micronats"))
      .psort(col("source"))
  }

  private val x27Sql =
    s"""WITH d AS (
       |  SELECT doc_id, source, text,
       |    CASE WHEN ${md5iSql("'split:' || doc_id")} % 10 < 8
       |         THEN 'train' ELSE 'eval' END AS part
       |  FROM documents WHERE LEN(text) >= 2),
       |ex AS (
       |  SELECT doc_id, source, part,
       |    UNNEST([SUBSTR(text, i, 2) FOR i IN RANGE(1, LEN(text))]) AS bg
       |  FROM d),
       |model AS (
       |  SELECT bg,
       |    CAST(ROUND(-LN(COUNT(*)::DOUBLE /
       |      (SELECT COUNT(*) FROM ex WHERE part = 'train')::DOUBLE)
       |      * 1000000.0) AS BIGINT) AS nll_micro
       |  FROM ex WHERE part = 'train' GROUP BY bg),
       |oov AS (
       |  SELECT CAST(ROUND(LN(
       |    (SELECT COUNT(*) FROM ex WHERE part = 'train')::DOUBLE)
       |    * 1000000.0) AS BIGINT) AS oov_micro),
       |docbg AS (
       |  SELECT doc_id, source, bg, COUNT(*) AS k
       |  FROM ex WHERE part = 'eval' GROUP BY 1, 2, 3),
       |scored AS (
       |  SELECT d.doc_id, d.source, d.k, m.nll_micro, o.oov_micro
       |  FROM docbg d LEFT JOIN model m ON d.bg = m.bg CROSS JOIN oov o)
       |SELECT source,
       | CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       | CAST(SUM(k) AS BIGINT) AS n_bigrams,
       | CAST(SUM(CASE WHEN nll_micro IS NULL THEN k ELSE 0 END) AS BIGINT)
       |   AS n_oov,
       | CAST(SUM(k * COALESCE(nll_micro, oov_micro)) AS BIGINT)
       |   // CAST(SUM(k) AS BIGINT) AS avg_nll_micronats
       |FROM scored GROUP BY source ORDER BY source""".stripMargin

  // ---- x28: URL/domain curation (canonicalized dedup + per-domain caps) ---
  /** x28: the CommonCrawl-pipeline curation staple — collapse URL variants
    * to a canonical form and cap documents per domain so no single host
    * dominates the mixture. Canonicalization (all MAP-ONLY regex steps, in
    * both dialects the identical patterns): strip `#fragment`, strip
    * `?utm_*` tracking query, lowercase scheme+host ONLY (paths stay
    * case-sensitive), strip one trailing slash. The per-domain cap keeps
    * the first 100 docs by deterministic md5 priority via a window
    * PARTITIONED by domain — one shuffle keyed on domain, bounded per-
    * partition state, no global ordering anywhere; at 100 TB domain skew
    * is the only hazard and the cap itself bounds it (a hot domain's
    * window partition still scans its rows but emits 100).
    *
    * The corpus has no URL column, so the query SYNTHESIZES five
    * deterministic variants per canonical page (scheme case, host case,
    * trailing slash, utm params, http-vs-https + fragment) from doc_id —
    * the planted-twin convention (d09/d16/d17) applied to URLs. The host
    * derives from the page GROUP (doc_id div 5, spread over 20 domains),
    * so every complete group's four https variants MUST collapse to one
    * canonical URL while the http one stays distinct — guaranteed at
    * every scale factor. */
  private val x28: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val d = t(s, dir, "documents")
    val h = "concat('www.d', CAST((doc_id div 5) % 20 AS STRING), '.com')"
    val g = "CAST(doc_id div 5 AS STRING)"
    val urlCase =
      s"""CASE CAST(doc_id % 5 AS INT)
         | WHEN 0 THEN concat('https://', $h, '/page/', $g)
         | WHEN 1 THEN concat('HTTPS://', upper($h), '/page/', $g)
         | WHEN 2 THEN concat('https://', $h, '/page/', $g, '/')
         | WHEN 3 THEN concat('https://', $h, '/page/', $g, '?utm_source=feed&utm_campaign=x')
         | ELSE concat('http://', $h, '/page/', $g, '#frag')
         |END""".stripMargin
    val noFrag = regexp_replace(expr(urlCase), "#.*$", "")
    val noUtm = regexp_replace(noFrag, "\\?utm_.*$", "")
    val lowerHost = concat(
      lower(regexp_extract(noUtm, "^([^/]*//[^/]+)", 1)),
      regexp_replace(noUtm, "^[^/]*//[^/]+", ""))
    val canon = regexp_replace(lowerHost, "/$", "")
    val keyed = d.select(col("doc_id"), canon.as("canon"))
      .withColumn("domain", regexp_extract(col("canon"), "^[a-z]+://([^/]+)", 1))
      .withColumn("pri",
        md5i(concat(lit("urlcap:"), col("doc_id").cast("string"))))
    val capped = keyed.withColumn("rn",
      row_number().over(Window.partitionBy(col("domain"))
        .orderBy(col("pri"), col("doc_id"))))
    capped.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("canon")).as("n_canon"),
        (count(lit(1)) - countDistinct(col("canon"))).as("n_dup_docs"),
        sum(when(col("rn") <= 100, 1L).otherwise(0L)).as("n_kept"))
      .psort(col("domain"))
  }

  private val x28Sql =
    s"""WITH u AS (
       |  SELECT doc_id,
       |    CASE CAST(doc_id % 5 AS INT)
       |     WHEN 0 THEN 'https://www.d' || ((doc_id // 5) % 20) || '.com/page/' || (doc_id // 5)
       |     WHEN 1 THEN 'HTTPS://WWW.D' || ((doc_id // 5) % 20) || '.COM/page/' || (doc_id // 5)
       |     WHEN 2 THEN 'https://www.d' || ((doc_id // 5) % 20) || '.com/page/' || (doc_id // 5) || '/'
       |     WHEN 3 THEN 'https://www.d' || ((doc_id // 5) % 20) || '.com/page/' || (doc_id // 5) || '?utm_source=feed&utm_campaign=x'
       |     ELSE 'http://www.d' || ((doc_id // 5) % 20) || '.com/page/' || (doc_id // 5) || '#frag'
       |    END AS url
       |  FROM documents),
       |c0 AS (SELECT doc_id, REGEXP_REPLACE(url, '#.*$$', '') AS a FROM u),
       |c1 AS (SELECT doc_id, REGEXP_REPLACE(a, '\\?utm_.*$$', '') AS a FROM c0),
       |c2 AS (SELECT doc_id,
       |  LOWER(REGEXP_EXTRACT(a, '^([^/]*//[^/]+)', 1)) ||
       |    REGEXP_REPLACE(a, '^[^/]*//[^/]+', '') AS a FROM c1),
       |c AS (SELECT doc_id, REGEXP_REPLACE(a, '/$$', '') AS canon FROM c2),
       |k AS (
       |  SELECT doc_id, canon,
       |    REGEXP_EXTRACT(canon, '^[a-z]+://([^/]+)', 1) AS domain,
       |    ${md5iSql("'urlcap:' || doc_id")} AS pri
       |  FROM c),
       |r AS (
       |  SELECT domain, canon,
       |    ROW_NUMBER() OVER (PARTITION BY domain ORDER BY pri, doc_id) AS rn
       |  FROM k)
       |SELECT domain, COUNT(*) AS n_docs,
       | COUNT(DISTINCT canon) AS n_canon,
       | COUNT(*) - COUNT(DISTINCT canon) AS n_dup_docs,
       | CAST(SUM(CASE WHEN rn <= 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       |FROM r GROUP BY domain ORDER BY domain""".stripMargin

  /** x29: DSIR-style importance resampling (data selection via importance
    * reweighting over hashed n-gram features, Xie et al. 2023 granularity):
    * pick raw-corpus documents whose hashed-unigram distribution looks most
    * like a TARGET distribution (here: the English subset, standing in for
    * the curated target domain of the published recipe).
    *
    * Model: tokens hash into B=64 buckets (md5-based so both engines agree
    * bit-for-bit); bucket unigram models for target and raw are Laplace
    * smoothed (p(b) = (c_b + 1) / (total + B)); a document's importance
    * weight is sum over its tokens of log p_target(bucket) − log p_raw
    * (bucket). Each bucket's log-likelihood ratio is quantized ONCE to
    * integer micronats (the x13 determinism pattern — ln differs by ulps
    * between engines, but round-to-1e-6 collapses that), so every per-doc
    * score is an exact integer sum and the top-100 selection is
    * hash-stable.
    *
    * Scale: the corpus is tokenized exactly ONCE into a persisted
    * per-(doc, bucket) histogram (≤ B rows/doc — the only corpus-scale
    * pass); both bucket distributions (raw + target in one aggregation)
    * and the per-doc scores aggregate off that bounded frame, with the
    * 64-row LLR table broadcast; top-100 is TakeOrderedAndProject
    * (per-partition heads, no global sort). At 100 TB the feature space
    * grows to 10k buckets and the target counts come from a small curated
    * corpus — the shapes are unchanged. */
  private val x29: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    // ONE token explode -> per-(doc, bucket) histogram (<= 64 rows/doc; at
    // 100 TB this is the pass that touches the corpus — everything below
    // runs on the bounded histogram). The raw/target bucket distributions
    // and the per-doc scores both aggregate off this frame, so the corpus
    // is tokenized exactly once (the previous spelling exploded it twice).
    val hist = memoized(s"x29hist:$dir")(
      d.select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("tok"))
        .withColumn("b", pmod(md5i(col("tok")), lit(64L)))
        .groupBy(col("doc_id"), col("lang"), col("b"))
        .agg(count(lit(1)).as("c"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val counts = hist.groupBy(col("b")).agg(
      sum(col("c")).as("cr"),
      sum(when(col("lang") === "en", col("c")).otherwise(0L)).as("ct"))
    val full = s.range(0, 64).select(col("id").as("b"))
      .join(counts, Seq("b"), "left")
      .select(col("b"), coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("ct"), lit(0L)).as("ct"))
    val tot = full.agg(sum(col("cr")).as("rr"), sum(col("ct")).as("tt"))
    val llr = full.crossJoin(broadcast(tot)).select(col("b"),
      round((log((col("ct") + 1).cast("double") / (col("tt") + 64).cast("double")) -
             log((col("cr") + 1).cast("double") / (col("rr") + 64).cast("double"))) * 1000000.0)
        .cast("long").as("w"))
    val scored = hist.join(broadcast(llr), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        sum(col("c") * col("w")).as("dsir_score_micronats"))
    scored
      .join(d.select(col("doc_id"), col("lang"), col("source")), Seq("doc_id"))
      .orderBy(col("dsir_score_micronats").desc, col("doc_id"))
      .limit(100)
      .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"),
        col("dsir_score_micronats"))
      .psort(col("dsir_score_micronats").desc, col("doc_id"))
  }

  private val x29Sql =
    s"""WITH tb AS (
       |  SELECT doc_id, lang, ${md5iSql("t.tok")} % 64 AS b
       |  FROM documents, UNNEST(STRING_SPLIT(text, ' ')) t(tok)),
       |bc AS (
       |  SELECT b, COUNT(*) AS cr,
       |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct
       |  FROM tb GROUP BY b),
       |full_b AS (
       |  SELECT r.range AS b, COALESCE(bc.cr, 0) AS cr, COALESCE(bc.ct, 0) AS ct
       |  FROM RANGE(0, 64) r LEFT JOIN bc ON r.range = bc.b),
       |tot AS (
       |  SELECT CAST(SUM(cr) AS BIGINT) AS rr, CAST(SUM(ct) AS BIGINT) AS tt
       |  FROM full_b),
       |llr AS (
       |  SELECT b, CAST(ROUND((LN((ct + 1)::DOUBLE / (tt + 64)::DOUBLE)
       |                      - LN((cr + 1)::DOUBLE / (rr + 64)::DOUBLE))
       |                 * 1000000.0) AS BIGINT) AS w
       |  FROM full_b, tot),
       |scored AS (
       |  SELECT tb.doc_id, COUNT(*) AS n_tokens,
       |    CAST(SUM(llr.w) AS BIGINT) AS dsir_score_micronats
       |  FROM tb JOIN llr ON tb.b = llr.b GROUP BY tb.doc_id)
       |SELECT s.doc_id, d.lang, d.source, s.n_tokens, s.dsir_score_micronats
       |FROM scored s JOIN documents d ON s.doc_id = d.doc_id
       |ORDER BY s.dsir_score_micronats DESC, s.doc_id LIMIT 100""".stripMargin

  // ---- x30: line-level boilerplate removal (CCNet/RefinedWeb staple) -------
  /** x30: remove LINES (not documents) that repeat across the corpus —
    * navigation chrome, cookie banners, share buttons. CCNet dedupes at the
    * paragraph-hash level and RefinedWeb at the line level for exactly this
    * reason: the document is fine, its furniture is not. Lines here are
    * 10-token chunks (the d08 segmentation — the corpus has no newlines); a
    * line is boilerplate when its hash occurs in >= 3 DISTINCT documents.
    * The corpus has no organic mass-repeated chrome, so every 7th document
    * is planted with a fixed 10-word header (the x17/d09 planting
    * convention, identical in both engines) which must come back flagged,
    * along with any organic cross-doc repeats. Output: the per-document
    * retention report (kept_ppm exact integer arithmetic).
    *
    * Scale: ONE shuffle on the line hash builds the boilerplate set; the
    * set is bounded by cross-doc redundancy (only hashes with nd >= 3
    * survive the HAVING), so it broadcasts back into a map-side flag join —
    * the corpus is never shuffled a second time. At 100 TB the broadcast
    * swaps to the d16 bloom-prefilter or a co-partitioned hash join on h;
    * the two-pass shape is unchanged. */
  private val x30: Q = (s, dir) => {
    val header = "subscribe to our newsletter and follow us on social media"
    val d = t(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 7 === 0, concat(lit(header + " "), col("text")))
        .otherwise(col("text")).as("text"))
    val lines = d
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        explode(expr("sequence(0, ((size(ws) + 9) div 10) - 1)")).as("i"),
        col("ws"))
      .select(col("doc_id"),
        md5(array_join(expr("slice(ws, i * 10 + 1, 10)"), " ")).as("h"))
    val boiler = lines.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 3)
      .select(col("h"), lit(1L).as("is_boiler"))
    lines.join(broadcast(boiler), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(coalesce(col("is_boiler"), lit(0L))).as("n_boiler"))
      .select(col("doc_id"), col("n_lines"), col("n_boiler"),
        expr("(n_lines - n_boiler) * 1000000 div n_lines").as("kept_ppm"))
      .psort(col("doc_id"))
  }

  private val x30Sql =
    """WITH d AS (
      |  SELECT doc_id, CASE WHEN doc_id % 7 = 0
      |    THEN 'subscribe to our newsletter and follow us on social media' || ' ' || text
      |    ELSE text END AS text FROM documents),
      |w AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM d),
      |lines AS (
      |  SELECT doc_id, MD5(ARRAY_TO_STRING(ws[(i*10+1):(i*10+10)], ' ')) AS h
      |  FROM w, UNNEST(RANGE(0, (LEN(ws) + 9) // 10)) t(i)),
      |boiler AS (SELECT h FROM lines GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 3)
      |SELECT l.doc_id, COUNT(*) AS n_lines,
      |  CAST(SUM(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
      |  CAST((COUNT(*) - SUM(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END)) * 1000000
      |    // COUNT(*) AS BIGINT) AS kept_ppm
      |FROM lines l LEFT JOIN boiler b USING (h)
      |GROUP BY l.doc_id ORDER BY l.doc_id""".stripMargin

  // ---- x31: tokenizer fertility by language --------------------------------
  /** x31: per-language tokenizer fertility — chars/token (compression) and
    * tokens/word (fertility) of the TRAINED BPE (x16's merge table) broken
    * down by language. The tokenizer-fairness number multilingual pipelines
    * publish: a tokenizer trained on skewed data spends more tokens per
    * word on underrepresented languages, inflating their training cost and
    * shrinking their effective context window.
    *
    * Scale: rides the SAME bounded (word -> n_sym) dictionary x22 encodes
    * with (built once, broadcast); the corpus pass is one explode + map-side
    * dictionary join + one 5-row language aggregation. All counters exact
    * integers; the two ratios are single double divisions of exact longs. */
  private val x31: Q = (s, dir) => {
    val dictF = bpeDictF(s, dir)
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " +")).as("w"))
      .filter(col("w") =!= "")
      .join(broadcast(dictF), Seq("w"))
      .groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_words"),
        sum(length(col("w")).cast("long")).as("n_chars"),
        sum(col("n_sym")).as("n_tokens"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_chars"),
        col("n_tokens"),
        (col("n_chars").cast("double") / col("n_tokens").cast("double"))
          .as("chars_per_token"),
        (col("n_tokens").cast("double") / col("n_words").cast("double"))
          .as("tokens_per_word"))
      .psort(col("lang"))
  }

  private val x31Sql =
    s"""WITH $bpeDictSqlCtes,
       |docw AS (
       |  SELECT doc_id, lang, w FROM (
       |    SELECT doc_id, lang, UNNEST(REGEXP_SPLIT_TO_ARRAY(text, ' +')) AS w
       |    FROM documents) WHERE w <> '')
       |SELECT lang, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_words,
       | CAST(SUM(LEN(w)) AS BIGINT) AS n_chars,
       | CAST(SUM(n_sym) AS BIGINT) AS n_tokens,
       | CAST(SUM(LEN(w)) AS DOUBLE) / CAST(SUM(n_sym) AS DOUBLE) AS chars_per_token,
       | CAST(SUM(n_sym) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS tokens_per_word
       |FROM docw JOIN dictF USING (w)
       |GROUP BY lang ORDER BY lang""".stripMargin

  // ---- x32: cross-slice n-gram novelty (new-crawl information rate) -------
  /** x32: how much NEW text a fresh batch adds over the existing corpus —
    * the freshness number a continuously-crawled pipeline tracks per
    * ingest (a batch whose n-grams are 95% already-seen buys little): for
    * every batch document (doc_id >= 250, standing in for "today's
    * crawl"), the fraction of its distinct word-3-grams unseen in the base
    * slice (doc_id < 250), in exact ppm. Rides the SAME persisted shingle
    * index as the dedup family.
    *
    * Scale: the base gram set is corpus-scale, so this is deliberately a
    * SHUFFLE anti-join on the gram (both sides hash-partitioned — the x11
    * broadcast shape does not apply when the reference set is the corpus
    * itself) plus one doc_id aggregation. At 100 TB: the base grams live
    * as a bucketed table keyed on gram, so each daily batch anti-joins
    * co-partitioned without reshuffling the corpus. */
  private val x32: Q = (s, dir) => {
    val sh = Dedup.docsWithShingles(s, dir)
    val base = sh.filter(col("doc_id") < 250)
      .select(explode(col("sh")).as("g")).distinct()
    val batch = sh.filter(col("doc_id") >= 250)
      .select(col("doc_id"), explode(col("sh")).as("g"))
    val novel = batch.join(base, Seq("g"), "left_anti")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_novel"))
    sh.filter(col("doc_id") >= 250)
      .select(col("doc_id"), col("n").cast("long").as("n_grams"))
      .join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_ppm", expr("n_novel * 1000000 div n_grams"))
      .psort(col("doc_id"))
  }

  private val x32Sql =
    s"""WITH docs AS (${Dedup.docsShSql}),
       |base AS (SELECT DISTINCT UNNEST(sh) AS g FROM docs WHERE doc_id < 250),
       |batch AS (SELECT doc_id, UNNEST(sh) AS g FROM docs WHERE doc_id >= 250),
       |novel AS (
       |  SELECT doc_id, COUNT(*) AS n_novel FROM batch b
       |  WHERE NOT EXISTS (SELECT 1 FROM base WHERE base.g = b.g)
       |  GROUP BY doc_id),
       |sizes AS (SELECT doc_id, CAST(LEN(sh) AS BIGINT) AS n_grams
       |          FROM docs WHERE doc_id >= 250)
       |SELECT s.doc_id, s.n_grams,
       | CAST(COALESCE(n.n_novel, 0) AS BIGINT) AS n_novel,
       | CAST(COALESCE(n.n_novel, 0) * 1000000 // s.n_grams AS BIGINT) AS novelty_ppm
       |FROM sizes s LEFT JOIN novel n ON s.doc_id = n.doc_id
       |ORDER BY s.doc_id""".stripMargin

  // ---- x33: domain mixture weights (temperature-scaled sampling) ----------
  /** x33: per-domain sampling weights for the training mixture — the
    * DoReMi/UniMax-style knob every multi-source pretraining run publishes.
    * Baseline share = each source's token fraction; the sampling weight is
    * the temperature-scaled share p^0.5 renormalized, which up-weights
    * small domains (boost_x > 1) and down-weights the dominant one without
    * ever inverting the order. All shares are computed in exact integer
    * ppm; the only floating step is one IEEE sqrt of a single division,
    * identical in both engines, immediately floored back to integer
    * micro-units so the renormalization is again exact long arithmetic.
    *
    * Scale: one map-only token count fused into the scan, one tiny
    * groupBy(source) aggregation (map-side partials; #domains rows), and
    * two 1-row broadcast total joins — the grand-total shape the suite
    * uses instead of a global window. The weights table is O(#domains)
    * and would be broadcast back to drive the actual sampler (x08's
    * mixture sampler consumes exactly this shape). */
  private val x33: Q = (s, dir) => {
    val per = t(s, dir, "documents")
      .select(col("source"), size(split(col("text"), " +")).as("tk"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tk")).cast("long").as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).cast("long").as("tot_tokens"))
    val scaled = per.crossJoin(broadcast(tot))
      .withColumn("base_ppm", expr("n_tokens * 1000000 div tot_tokens"))
      .withColumn("q", floor(
        sqrt(col("n_tokens").cast("double") / col("tot_tokens").cast("double"))
          * lit(1000000.0)).cast("long"))
    val sumq = scaled.agg(sum(col("q")).cast("long").as("sumq"))
    scaled.crossJoin(broadcast(sumq))
      .withColumn("w_ppm", expr("q * 1000000 div sumq"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("base_ppm"),
        col("w_ppm"),
        (col("w_ppm").cast("double") / col("base_ppm").cast("double"))
          .as("boost_x"))
      .psort(col("source"))
  }

  private val x33Sql =
    """WITH per AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(LEN(REGEXP_SPLIT_TO_ARRAY(text, ' +'))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source),
      |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens FROM per),
      |scaled AS (
      |  SELECT source, n_docs, n_tokens,
      |    n_tokens * 1000000 // tot_tokens AS base_ppm,
      |    CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE))
      |      * 1000000.0) AS BIGINT) AS q
      |  FROM per, tot),
      |sq AS (SELECT CAST(SUM(q) AS BIGINT) AS sumq FROM scaled)
      |SELECT source, n_docs, n_tokens,
      |  CAST(base_ppm AS BIGINT) AS base_ppm,
      |  CAST(q * 1000000 // sumq AS BIGINT) AS w_ppm,
      |  CAST(q * 1000000 // sumq AS DOUBLE) / CAST(base_ppm AS DOUBLE) AS boost_x
      |FROM scaled, sq ORDER BY source""".stripMargin

  // ---- x34: unigram distribution drift (slice-vs-slice KL) -----------------
  /** x34: dataset drift monitoring — symmetric KL divergence between the
    * base slice's (doc_id < 250) and the fresh batch's (doc_id >= 250)
    * add-1-smoothed unigram distributions, with the top-15 words driving
    * the drift. The number a continuously-ingesting pipeline alarms on:
    * a crawl whose token distribution lurches (new spam pattern, encoding
    * regression, topic shift) shows up here before any model does.
    *
    * Determinism: each word's KL contribution p·ln(p/q) is quantized ONCE
    * to integer nano-nats (the x13 micronat discipline) and every total is
    * an integer sum — associative, partition-order free, and bit-identical
    * in DuckDB (same IEEE divisions/ln over identical doubles, same
    * half-away-from-zero ROUND).
    *
    * Scale: one corpus token-count shuffle keyed on the word (map-side
    * partials absorb the explode), a 1-row broadcast totals join, then a
    * TakeOrderedAndProject top-15 — never a global window. At 100 TB the
    * base counts persist as the standing reference table and each batch
    * joins its counts against it co-partitioned on the word. */
  private val x34: Q = (s, dir) => {
    val counts = t(s, dir, "documents")
      .select((col("doc_id") >= 250).as("isnew"),
        explode(split(col("text"), " +")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w"))
      .agg(sum(when(!col("isnew"), 1L).otherwise(0L)).as("cb"),
        sum(when(col("isnew"), 1L).otherwise(0L)).as("cn"))
    val tot = counts.agg(sum(col("cb")).cast("long").as("nb"),
      sum(col("cn")).cast("long").as("nn"), count(lit(1)).as("v"))
    val terms = counts.crossJoin(broadcast(tot))
      .withColumn("pb",
        (col("cb") + 1).cast("double") / (col("nb") + col("v")).cast("double"))
      .withColumn("pn",
        (col("cn") + 1).cast("double") / (col("nn") + col("v")).cast("double"))
      .withColumn("m_nano", round(col("pb") * log(col("pb") / col("pn"))
        * lit(1000000000.0), 0).cast("long"))
      .withColumn("n_nano", round(col("pn") * log(col("pn") / col("pb"))
        * lit(1000000000.0), 0).cast("long"))
      .withColumn("drift_nano", col("m_nano") + col("n_nano"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val top = terms
      .orderBy(col("drift_nano").desc, col("w")).limit(15)
      .select(col("w").as("word"), col("cb"), col("cn"), col("drift_nano"))
    val total = terms.agg(sum(col("drift_nano")).cast("long").as("t"))
      .crossJoin(broadcast(tot))
      .select(lit("__total_sym_kl__").as("word"), col("nb").as("cb"),
        col("nn").as("cn"), col("t").as("drift_nano"))
    top.unionByName(total).psort(col("word"))
  }

  private val x34Sql =
    """WITH ww AS (
      |  SELECT isnew, w FROM (
      |    SELECT doc_id >= 250 AS isnew,
      |      UNNEST(REGEXP_SPLIT_TO_ARRAY(text, ' +')) AS w
      |    FROM documents) WHERE w <> ''),
      |counts AS (
      |  SELECT w,
      |    CAST(SUM(CASE WHEN NOT isnew THEN 1 ELSE 0 END) AS BIGINT) AS cb,
      |    CAST(SUM(CASE WHEN isnew THEN 1 ELSE 0 END) AS BIGINT) AS cn
      |  FROM ww GROUP BY w),
      |tot AS (SELECT CAST(SUM(cb) AS BIGINT) AS nb,
      |               CAST(SUM(cn) AS BIGINT) AS nn, COUNT(*) AS v FROM counts),
      |probs AS (
      |  SELECT w, cb, cn,
      |    (cb + 1)::DOUBLE / (nb + v)::DOUBLE AS pb,
      |    (cn + 1)::DOUBLE / (nn + v)::DOUBLE AS pn
      |  FROM counts, tot),
      |terms AS (
      |  SELECT w, cb, cn,
      |    CAST(ROUND(pb * LN(pb / pn) * 1000000000.0, 0) AS BIGINT) AS m_nano,
      |    CAST(ROUND(pn * LN(pn / pb) * 1000000000.0, 0) AS BIGINT) AS n_nano
      |  FROM probs),
      |top AS (
      |  SELECT w AS word, cb, cn, m_nano + n_nano AS drift_nano
      |  FROM terms ORDER BY m_nano + n_nano DESC, w LIMIT 15),
      |totr AS (
      |  SELECT '__total_sym_kl__' AS word, nb AS cb, nn AS cn,
      |    CAST(SUM(m_nano + n_nano) AS BIGINT) AS drift_nano
      |  FROM terms, tot GROUP BY nb, nn)
      |SELECT * FROM top UNION ALL SELECT * FROM totr ORDER BY word""".stripMargin

  /** x35: per-document lexical-entropy gate — Shannon entropy of the
    * token distribution plus a type-token ratio, the low-cost signal that
    * separates natural prose from keyword-stuffed / template / generated
    * spam (low entropy) in a crawl-curation pipeline.
    *
    * Determinism: the x13 fixed-point discipline — each distinct count's
    * ln is quantized once to integer micro-nats inside graft_word_entropy,
    * all downstream arithmetic integer (see WordEntropy scaladoc).
    *
    * Scale: the engine side is ONE map-only native scan per document —
    * no explode, no shuffle (the DuckDB oracle pays the two-shuffle
    * explode + re-aggregate spelling). The flag threshold broadcasts as a
    * literal; at 100 TB this runs at scan speed alongside the other
    * map-only gates (x01/x02/x03). */
  private val x35: Q = (s, dir) => {
    t(s, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("lang"),
        expr("graft_word_entropy(text)").as("e"))
      .select(col("doc_id"), col("lang"),
        col("e.n_tokens").as("n_tokens"),
        col("e.n_types").as("n_types"),
        col("e.entropy_micro").as("entropy_micro"),
        expr("e.n_types * 1000000L div e.n_tokens").as("ttr_micro"),
        (col("e.entropy_micro") < lit(1500000L)).as("low_entropy"))
      .psort(col("doc_id"))
  }

  private val x35Sql =
    """WITH w AS (
      |  SELECT doc_id, w FROM (
      |    SELECT doc_id, UNNEST(REGEXP_SPLIT_TO_ARRAY(text, ' +')) AS w
      |    FROM documents) WHERE w <> ''),
      |c AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
      |      FROM w GROUP BY doc_id, w),
      |a AS (
      |  SELECT doc_id,
      |    CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    CAST(COUNT(*) AS BIGINT) AS n_types,
      |    CAST(SUM(c * CAST(ROUND(LN(c) * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS s
      |  FROM c GROUP BY doc_id)
      |SELECT d.doc_id, d.lang, a.n_tokens, a.n_types,
      |  CAST(ROUND(LN(a.n_tokens) * 1000000.0, 0) AS BIGINT) - a.s // a.n_tokens
      |    AS entropy_micro,
      |  a.n_types * 1000000 // a.n_tokens AS ttr_micro,
      |  (CAST(ROUND(LN(a.n_tokens) * 1000000.0, 0) AS BIGINT) - a.s // a.n_tokens)
      |    < 1500000 AS low_entropy
      |FROM documents d JOIN a USING (doc_id)
      |WHERE LENGTH(TRIM(d.text)) > 0
      |ORDER BY d.doc_id""".stripMargin

  /** x36: document-length histogram on power-of-two buckets — the
    * dataset-card length distribution (truncation budgeting, packing
    * efficiency forecasts, and outlier-length screens all read it).
    *
    * Determinism: the bucket is floor(log2(n_chars)) computed EXACTLY as
    * LENGTH(BIN(n)) - 1 — integer string length, no floating log that
    * could land on either side of a power of two; shares are integer ppm.
    *
    * Scale: one aggregation onto <= 64 bucket rows (map-side partials
    * absorb the corpus), then the cumulative share via a bounded
    * bucket<=bucket self-join over those rows — NOT a global window, so
    * the plan passes the suite-wide single-partition-window ban and is
    * corpus-size independent after the first aggregation. */
  private val x36: Q = (s, dir) => {
    val b = t(s, dir, "documents")
      .select((length(bin(col("n_chars"))) - 1).as("bucket"),
        col("n_chars"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
    val tot = b.agg(sum(col("n_docs")).as("td"))
    val cum = b.as("a").join(b.as("b2"),
        col("b2.bucket") <= col("a.bucket"))
      .groupBy(col("a.bucket").as("bucket"))
      .agg(sum(col("b2.n_docs")).as("cum_docs"))
    b.join(cum, Seq("bucket")).crossJoin(broadcast(tot))
      .select(col("bucket"),
        expr("cast(shiftleft(1L, bucket) as bigint)").as("lo_chars"),
        col("n_docs"), col("total_chars"),
        expr("n_docs * 1000000L div td").as("share_ppm"),
        col("cum_docs"),
        expr("cum_docs * 1000000L div td").as("cum_ppm"))
      .psort(col("bucket"))
  }

  private val x36Sql =
    """WITH b AS (
      |  SELECT LENGTH(BIN(n_chars)) - 1 AS bucket,
      |    CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |  FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS td FROM b),
      |cum AS (
      |  SELECT a.bucket, CAST(SUM(b2.n_docs) AS BIGINT) AS cum_docs
      |  FROM b a JOIN b b2 ON b2.bucket <= a.bucket
      |  GROUP BY a.bucket)
      |SELECT b.bucket,
      |  CAST(1::BIGINT << b.bucket AS BIGINT) AS lo_chars,
      |  b.n_docs, b.total_chars,
      |  b.n_docs * 1000000 // td AS share_ppm,
      |  cum.cum_docs,
      |  cum.cum_docs * 1000000 // td AS cum_ppm
      |FROM b JOIN cum ON b.bucket = cum.bucket, tot
      |ORDER BY b.bucket""".stripMargin

  // ---- x37: PMI collocations (phrase mining / tokenizer-merge evidence) ----
  /** x37: pointwise-mutual-information bigram collocations — the phrase
    * mining pass a tokenizer/vocab pipeline runs to find word pairs that
    * co-occur far above chance (PMI = p(ab) / (p(a)p(b)) over adjacent
    * token pairs). Ranking is by an EXACT staged-integer ratio in ppm:
    * ((n_ab*1e6 // n_a) * NU // n_b) * NU // NB — i.e. 1e6 * p(b|a)/p(b)
    * with floor at each stage, spelled IDENTICALLY in both engines so no
    * floating log can land a pair on either side of a rank boundary (ln
    * is monotone, so PMI order == ratio order); the staging keeps every
    * intermediate <= 1e6 * NU, BIGINT-safe past 1e12 corpus tokens
    * (n_ab <= n_a bounds stage one at 1e6).
    *
    * Scale: two corpus-keyed aggregations (bigram counts, unigram counts
    * — both map-side-partial hash shuffles), two equi-joins of the bigram
    * table against the unigram table (vocab-sized, standard shuffle
    * joins), two scalar totals broadcast, and a top-k TakeOrdered. No
    * windows, no N² — the exact shape a 100 TB collocation pass wants. */
  private val x37: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val toks = docs.select(
      expr("filter(split(text, ' '), w -> w <> '')").as("ws"))
    val uni = memoized(s"x37uni:$dir")(
      toks.select(explode(col("ws")).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("n"))
        .persist())
    // Guarded for 0/1-token docs: sequence(1, 0) is DESCENDING in Spark
    // and would index element_at(ws, 0) → error, where DuckDB's
    // RANGE(1, LEN(ws)) is simply empty.
    val bi = toks
      .select(explode(expr(
        "case when size(ws) >= 2 then " +
          "transform(sequence(1, size(ws) - 1), i -> " +
          "struct(element_at(ws, i) as a, element_at(ws, i + 1) as b)) " +
          "else array() end"))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 5)
    val nu = uni.agg(sum(col("n")).as("nu"))
    val nb = toks.select((size(col("ws")) - 1).as("k"))
      .agg(sum(col("k")).as("nb"))
    bi.join(uni.withColumnRenamed("term", "a").withColumnRenamed("n", "n_a"),
        Seq("a"))
      .join(uni.select(col("term").as("b"), col("n").as("n_b")), Seq("b"))
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        expr("((n_ab * 1000000L div n_a) * nu div n_b) * nu div nb")
          .as("pmi_ratio_ppm"))
      .orderBy(col("pmi_ratio_ppm").desc, col("a"), col("b"))
      .limit(20)
  }

  private val x37Sql =
    """WITH toks AS (
      |  SELECT LIST_FILTER(STRING_SPLIT(text, ' '), w -> w <> '') AS ws
      |  FROM documents),
      |uni AS (
      |  SELECT term, COUNT(*) AS n
      |  FROM (SELECT UNNEST(ws) AS term FROM toks) GROUP BY 1),
      |bi AS (
      |  SELECT p[1] AS a, p[2] AS b, COUNT(*) AS n_ab
      |  FROM (SELECT UNNEST([[ws[i], ws[i+1]] FOR i IN RANGE(1, LEN(ws))]) AS p
      |        FROM toks)
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 5),
      |nu AS (SELECT CAST(SUM(n) AS BIGINT) AS nu FROM uni),
      |nb AS (SELECT CAST(SUM(LEN(ws) - 1) AS BIGINT) AS nb FROM toks)
      |SELECT a, b, n_ab, ua.n AS n_a, ub.n AS n_b,
      |  CAST(((n_ab * 1000000 // ua.n) * nu // ub.n) * nu // nb
      |    AS BIGINT) AS pmi_ratio_ppm
      |FROM bi JOIN uni ua ON bi.a = ua.term
      |JOIN uni ub ON bi.b = ub.term, nu, nb
      |ORDER BY pmi_ratio_ppm DESC, a, b LIMIT 20""".stripMargin

  // ---- x38: vocabulary growth / hapax profile per slice --------------------
  /** x38: per-source vocabulary profile — token mass, distinct vocabulary,
    * type-token ratio, and hapax (frequency-1) share: the Heaps'-law
    * diagnostics a dataset card reports per slice (a slice whose hapax
    * share collapses is template/boilerplate; one whose TTR explodes is
    * OCR noise or code). All shares exact integer ppm.
    *
    * Scale: one (source, term) aggregation (map-side partials absorb
    * duplicate tokens), then one O(slices x vocab) -> O(slices)
    * aggregation. No windows, no joins back to the corpus. */
  private val x38: Q = (s, dir) => {
    t(s, dir, "documents")
      .select(col("source"),
        explode(expr("filter(split(text, ' '), w -> w <> '')")).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("n"))
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("hapax"))
      .select(col("source"), col("n_tokens"), col("vocab"), col("hapax"),
        expr("vocab * 1000000L div n_tokens").as("ttr_ppm"),
        expr("hapax * 1000000L div vocab").as("hapax_ppm"))
      .psort(col("source"))
  }

  private val x38Sql =
    """WITH st AS (
      |  SELECT source, term, COUNT(*) AS n
      |  FROM (SELECT source, UNNEST(LIST_FILTER(STRING_SPLIT(text, ' '),
      |          w -> w <> '')) AS term
      |        FROM documents)
      |  GROUP BY 1, 2)
      |SELECT source,
      |  CAST(SUM(n) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS vocab,
      |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
      |  CAST(COUNT(*) AS BIGINT) * 1000000 // CAST(SUM(n) AS BIGINT) AS ttr_ppm,
      |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000
      |    // CAST(COUNT(*) AS BIGINT) AS hapax_ppm
      |FROM st GROUP BY source ORDER BY source""".stripMargin

  // ---- x39: temperature-smoothed source mixture (multilingual sampling) ----
  /** x39: temperature-scaled mixture weights — the multilingual/multi-
    * source sampling staple (alpha = 0.5): raw token shares are smoothed
    * by w_i = tokens_i^alpha so low-resource slices are upsampled and
    * head slices damped. Determinism: alpha = 0.5 is spelled as
    * floor(sqrt(tokens)) — IEEE sqrt is correctly rounded, so the floor
    * is identical in both engines and everything downstream stays exact
    * integer ppm (no order-dependent double summation anywhere).
    *
    * Scale: one corpus aggregation to O(sources) rows, then O(sources)
    * arithmetic against two broadcast scalar totals. */
  private val x39: Q = (s, dir) => {
    val bySrc = t(s, dir, "documents")
      .select(col("source"),
        expr("size(filter(split(text, ' '), w -> w <> ''))").as("k"))
      .groupBy(col("source")).agg(sum(col("k")).as("tokens"))
      .withColumn("w", expr("cast(sqrt(cast(tokens as double)) as bigint)"))
    val tot = bySrc.agg(sum(col("tokens")).as("tt"), sum(col("w")).as("tw"))
    bySrc.crossJoin(broadcast(tot))
      .select(col("source"), col("tokens"), col("w"),
        expr("tokens * 1000000L div tt").as("raw_ppm"),
        expr("w * 1000000L div tw").as("smoothed_ppm"),
        expr("w * 1000000L div tw - tokens * 1000000L div tt")
          .as("boost_ppm"))
      .psort(col("source"))
  }

  private val x39Sql =
    """WITH b AS (
      |  SELECT source,
      |    CAST(SUM(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), w -> w <> '')))
      |      AS BIGINT) AS tokens
      |  FROM documents GROUP BY source),
      |w AS (SELECT source, tokens,
      |        CAST(FLOOR(SQRT(CAST(tokens AS DOUBLE))) AS BIGINT) AS w
      |      FROM b),
      |tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS tt,
      |               CAST(SUM(w) AS BIGINT) AS tw FROM w)
      |SELECT source, tokens, w,
      |  tokens * 1000000 // tt AS raw_ppm,
      |  w * 1000000 // tw AS smoothed_ppm,
      |  w * 1000000 // tw - tokens * 1000000 // tt AS boost_ppm
      |FROM w, tot ORDER BY source""".stripMargin

  // ---- x40: cross-source overlap matrix (dump-lineage monitor) -------------
  /** x40: pairwise source-overlap matrix — how much of each slice's
    * 3-gram inventory appears in every other slice: the dump-lineage
    * check a CommonCrawl-style pipeline runs before mixing snapshots
    * (consecutive dumps overlap heavily; double-counting silently skews
    * the mixture). Emits, per ordered source pair, the exact intersection
    * size and both containment directions in integer ppm.
    *
    * Scale: the corpus collapses to DISTINCT (source, gram) in one
    * map-side-partial shuffle; each gram then carries at most #sources
    * rows, so the per-gram pair expansion is bounded by sources^2 — never
    * corpus^2 — and the matrix aggregation is O(sources^2) rows. */
  private val x40: Q = (s, dir) => {
    // rides the SAME persisted (source, gram) inventory as d38's exact
    // overlap leg (Dedup.sourceGrams, r14 — formerly a private x40 memo):
    // tokenize once, serve many
    val sg = Dedup.sourceGrams(s, dir)
    val sizes = sg.groupBy(col("source")).agg(count(lit(1)).as("n"))
    // r13 (the d38/d29 mirror-matrix rewrite, guide §2.3): the former gram
    // self-join shuffled the persisted (source, gram) frame TWICE and
    // materialized |shared grams| x pairs of join output; one gram-keyed
    // collect_set (fan-out <= #sources per gram, map-side partials) plus
    // an in-row sources^2-bounded pair expansion computes the identical
    // intersection counts with ONE shuffle.
    // r14 (§2.5, VERDICT item 4): PairExpand streams the per-gram pair
    // fan-out across rows instead of materializing |sources|^2 structs in
    // one row — hot-gram skew safety, same single shuffle, same counts.
    val inter = graft.operators.PairExpand.pairCounts(
      sg.groupBy(col("g"))
        .agg(sort_array(collect_set(col("source"))).as("ss")),
      "ss", "common")
    inter
      .join(broadcast(sizes.select(col("source").as("s1"), col("n").as("n1"))),
        Seq("s1"))
      .join(broadcast(sizes.select(col("source").as("s2"), col("n").as("n2"))),
        Seq("s2"))
      .select(col("s1"), col("s2"), col("common"), col("n1"), col("n2"),
        expr("common * 1000000L div n1").as("in_s1_ppm"),
        expr("common * 1000000L div n2").as("in_s2_ppm"))
      .psort(col("s1"), col("s2"))
  }

  private val x40Sql =
    """WITH sg AS (
      |  SELECT DISTINCT source, g
      |  FROM (SELECT source,
      |          UNNEST(LIST_DISTINCT([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |            FOR i IN RANGE(1, LEN(w) - 1)])) AS g
      |        FROM (SELECT source, STRING_SPLIT(text, ' ') AS w
      |              FROM documents)
      |        WHERE LEN(w) >= 3)),
      |sizes AS (SELECT source, COUNT(*) AS n FROM sg GROUP BY source),
      |inter AS (
      |  SELECT a.source AS s1, b.source AS s2, COUNT(*) AS common
      |  FROM sg a JOIN sg b ON a.g = b.g AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT s1, s2, common, z1.n AS n1, z2.n AS n2,
      |  common * 1000000 // z1.n AS in_s1_ppm,
      |  common * 1000000 // z2.n AS in_s2_ppm
      |FROM inter
      |JOIN sizes z1 ON z1.source = s1
      |JOIN sizes z2 ON z2.source = s2
      |ORDER BY s1, s2""".stripMargin

  // ---- x41: token-budget epoch allocation (water-filling, 2 rounds) --------
  /** x41: epoch/budget planner — turn per-source token masses into a
    * training allocation: budget B = 2x corpus tokens, desired share
    * proportional to the x39 sqrt-smoothed weight, HARD CAP of 4 epochs
    * per source (the Muennighoff et al. repetition ceiling), and one
    * redistribution round pushing capped surplus onto uncapped sources
    * (fixed 2-round water-filling — deterministic, spelled identically in
    * both engines, exact integer arithmetic end to end).
    *
    * Scale: one corpus aggregation to O(sources) rows; the allocation is
    * O(sources) arithmetic against broadcast scalar totals — the planner
    * output every mixture-weighted dataloader consumes. */
  private val x41: Q = (s, dir) => {
    val bySrc = t(s, dir, "documents")
      .select(col("source"),
        expr("size(filter(split(text, ' '), w -> w <> ''))").as("k"))
      .groupBy(col("source")).agg(sum(col("k")).as("tokens"))
      .withColumn("w", expr("cast(sqrt(cast(tokens as double)) as bigint)"))
    val tot = bySrc.agg(sum(col("tokens")).as("tt"), sum(col("w")).as("tw"))
    val r1 = bySrc.crossJoin(broadcast(tot))
      .withColumn("budget", expr("2L * tt"))
      .withColumn("cap", expr("4L * tokens"))
      .withColumn("a1", expr("budget * w div tw"))
      .withColumn("c1", least(col("a1"), col("cap")))
    val spill = r1.agg(sum(col("c1")).as("allocated"),
      sum(when(col("a1") < col("cap"), col("w")).otherwise(0L)).as("wu"))
    r1.crossJoin(broadcast(spill))
      .withColumn("leftover", expr("budget - allocated"))
      .withColumn("a2", expr(
        "c1 + (case when a1 < cap and wu > 0 then leftover * w div wu " +
          "else 0L end)"))
      .withColumn("alloc_tokens", least(col("a2"), col("cap")))
      .select(col("source"), col("tokens"), col("w"), col("cap"),
        col("a1"), col("alloc_tokens"),
        expr("alloc_tokens * 1000000L div tokens").as("epochs_micro"),
        (col("a1") >= col("cap")).as("was_capped"))
      .psort(col("source"))
  }

  private val x41Sql =
    """WITH b AS (
      |  SELECT source,
      |    CAST(SUM(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), w -> w <> '')))
      |      AS BIGINT) AS tokens
      |  FROM documents GROUP BY source),
      |w AS (SELECT source, tokens,
      |        CAST(FLOOR(SQRT(CAST(tokens AS DOUBLE))) AS BIGINT) AS w
      |      FROM b),
      |tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS tt,
      |               CAST(SUM(w) AS BIGINT) AS tw FROM w),
      |r1 AS (
      |  SELECT source, tokens, w,
      |    2 * tt AS budget, 4 * tokens AS cap,
      |    (2 * tt) * w // tw AS a1,
      |    LEAST((2 * tt) * w // tw, 4 * tokens) AS c1
      |  FROM w, tot),
      |spill AS (
      |  SELECT CAST(SUM(c1) AS BIGINT) AS allocated,
      |    CAST(SUM(CASE WHEN a1 < cap THEN w ELSE 0 END) AS BIGINT) AS wu
      |  FROM r1),
      |r2 AS (
      |  SELECT r1.*, budget - allocated AS leftover,
      |    c1 + (CASE WHEN a1 < cap AND wu > 0
      |      THEN (budget - allocated) * w // wu ELSE 0 END) AS a2
      |  FROM r1, spill)
      |SELECT source, tokens, w, cap, a1,
      |  LEAST(a2, cap) AS alloc_tokens,
      |  LEAST(a2, cap) * 1000000 // tokens AS epochs_micro,
      |  a1 >= cap AS was_capped
      |FROM r2 ORDER BY source""".stripMargin

  // ---- x42: pairwise source-similarity matrix (symmetric KL) ---------------
  /** x42: distributional source-similarity matrix — symmetric KL
    * divergence between every source pair's unigram distributions over
    * the TOP-500 global vocabulary (add-1 smoothed): x40 answers "how
    * much content is shared verbatim"; this answers "how similar do the
    * sources SOUND" — the two signals mixture planners cross (high KL +
    * high overlap = templated spam; low KL + low overlap = redundant
    * shards to merge). Same nano-nat quantization as x34, so the doubles
    * are bit-identical in both engines.
    *
    * Scale: the vocabulary is CAPPED at 500 (top by corpus count,
    * word-tiebroken) — the pair grid is O(sources^2 x 500) regardless of
    * corpus size, and per-source counts aggregate map-side before any
    * pair expansion. The full-vocab variant is the documented relaxation
    * when sources^2 x V fits. */
  private val x42: Q = (s, dir) => {
    val wc = t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " +")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
    val vocab = wc.groupBy(col("w")).agg(sum(col("c")).as("tc"))
      .orderBy(col("tc").desc, col("w")).limit(500).select(col("w"))
    val inVocab = wc.join(broadcast(vocab), Seq("w"))
    val totals = inVocab.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val vsize = vocab.agg(count(lit(1)).as("v"))
    val pairs = totals.select(col("source").as("s1"), col("n").as("n1"))
      .join(totals.select(col("source").as("s2"), col("n").as("n2")),
        col("s1") < col("s2"))
    pairs.crossJoin(broadcast(vocab)).crossJoin(broadcast(vsize))
      .join(inVocab.select(col("source").as("s1"), col("w"),
        col("c").as("c1")), Seq("s1", "w"), "left")
      .join(inVocab.select(col("source").as("s2"), col("w"),
        col("c").as("c2")), Seq("s2", "w"), "left")
      .withColumn("p1", (coalesce(col("c1"), lit(0L)) + 1).cast("double") /
        (col("n1") + col("v")).cast("double"))
      .withColumn("p2", (coalesce(col("c2"), lit(0L)) + 1).cast("double") /
        (col("n2") + col("v")).cast("double"))
      .withColumn("t_nano",
        round(col("p1") * log(col("p1") / col("p2")) * 1000000000.0, 0)
          .cast("long") +
        round(col("p2") * log(col("p2") / col("p1")) * 1000000000.0, 0)
          .cast("long"))
      .groupBy(col("s1"), col("s2"))
      .agg(sum(col("t_nano")).as("sym_kl_nano"))
      .psort(col("s1"), col("s2"))
  }

  private val x42Sql =
    """WITH ww AS (
      |  SELECT source, w FROM (
      |    SELECT source, UNNEST(REGEXP_SPLIT_TO_ARRAY(text, ' +')) AS w
      |    FROM documents) WHERE w <> ''),
      |wc AS (SELECT source, w, COUNT(*) AS c FROM ww GROUP BY 1, 2),
      |vocab AS (
      |  SELECT w FROM (SELECT w, SUM(c) AS tc FROM wc GROUP BY w)
      |  ORDER BY tc DESC, w LIMIT 500),
      |iv AS (SELECT wc.source, wc.w, wc.c FROM wc JOIN vocab USING (w)),
      |totals AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n
      |           FROM iv GROUP BY source),
      |vsize AS (SELECT COUNT(*) AS v FROM vocab),
      |pairs AS (
      |  SELECT a.source AS s1, a.n AS n1, b.source AS s2, b.n AS n2
      |  FROM totals a JOIN totals b ON a.source < b.source),
      |grid AS (
      |  SELECT p.s1, p.s2, p.n1, p.n2, vb.w, v
      |  FROM pairs p CROSS JOIN vocab vb, vsize),
      |probs AS (
      |  SELECT g.s1, g.s2, g.w,
      |    (COALESCE(a.c, 0) + 1)::DOUBLE / (g.n1 + g.v)::DOUBLE AS p1,
      |    (COALESCE(b.c, 0) + 1)::DOUBLE / (g.n2 + g.v)::DOUBLE AS p2
      |  FROM grid g
      |  LEFT JOIN iv a ON a.source = g.s1 AND a.w = g.w
      |  LEFT JOIN iv b ON b.source = g.s2 AND b.w = g.w)
      |SELECT s1, s2,
      |  CAST(SUM(CAST(ROUND(p1 * LN(p1 / p2) * 1000000000.0, 0) AS BIGINT)
      |         + CAST(ROUND(p2 * LN(p2 / p1) * 1000000000.0, 0) AS BIGINT))
      |    AS BIGINT) AS sym_kl_nano
      |FROM probs GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- x43: seeded deterministic dataset shuffle (epoch reshuffle) ---------
  /** x43: the epoch-shuffle every training run needs, made DETERMINISTIC
    * and cluster-stable: each document's order key is md5(seed || doc_id)
    * — reproducible across reruns and engines (no rand()), changing the
    * seed reshuffles, and assignment is per-row so adding a shard never
    * moves existing rows relative to each other. Gated on the 16-bucket
    * balance ledger (row/char mass per bucket must be near-uniform —
    * the skew check a dataloader runs) plus each bucket's exact key
    * range endpoints.
    *
    * Scale: map-only key assignment; at run time the shuffle itself is
    * `repartitionByRange(order_key)` over these same keys (the q91
    * layout machinery); the ledger here is one 16-row aggregation. */
  private val x43: Q = (s, dir) => {
    val seed = 42
    t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        expr(s"CAST(conv(substr(md5(concat('epoch$seed:', " +
          "CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT)")
          .as("order_key"))
      .withColumn("bucket", col("order_key") % 16)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("chars"),
        min(col("order_key")).as("min_key"),
        max(col("order_key")).as("max_key"))
      .psort(col("bucket"))
  }

  private val x43Sql =
    """SELECT bucket, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS chars,
      |  MIN(order_key) AS min_key, MAX(order_key) AS max_key
      |FROM (
      |  SELECT doc_id, n_chars,
      |    (('0x' || substr(md5('epoch42:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)
      |      AS order_key,
      |    (('0x' || substr(md5('epoch42:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)
      |      % 16 AS bucket
      |  FROM documents)
      |GROUP BY bucket ORDER BY bucket""".stripMargin

  // ---- x44: intra-document self-repetition removal ------------------------
  /** x44: WITHIN-document repeated-passage removal (the RefinedWeb-style
    * self-repetition cleanup — distinct from d08's cross-doc passage dedup
    * and x30's cross-doc boilerplate): each doc chunks into consecutive
    * 10-word windows (d08's convention) and duplicate chunks AFTER the
    * first occurrence are counted for removal. The corpus has no organic
    * intra-doc chunk repeats, so repeats are PLANTED on both sides (every
    * doc_id % 7 == 0 doc gets its own first 20 words prepended — two
    * chunks that duplicate by construction, alignment guaranteed because
    * the prefix length is a chunk multiple).
    *
    * Scale: intra-doc dedup is embarrassingly parallel — chunking and the
    * first-occurrence count (size minus array_distinct size) are PURE
    * map-side expressions; the ONLY shuffle in the whole query is the
    * presentation sort. The 100 TB cost is one codegen'd scan. */
  private val x44: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    val ws2 = expr(
      """CASE WHEN doc_id % 7 = 0
        | THEN concat(slice(split(text, ' '), 1, 20), split(text, ' '))
        | ELSE split(text, ' ') END""".stripMargin)
    val chunks = expr(
      """CASE WHEN size(ws2) >= 10
        | THEN transform(sequence(1, size(ws2) div 10),
        |   i -> array_join(slice(ws2, (i - 1) * 10 + 1, 10), ' '))
        | ELSE CAST(array() AS array<string>) END""".stripMargin)
    d.select(col("doc_id"), ws2.as("ws2"))
      .select(col("doc_id"), chunks.as("chunks"))
      .select(col("doc_id"), size(col("chunks")).cast("long").as("n_chunks"),
        (size(col("chunks")) - size(array_distinct(col("chunks"))))
          .cast("long").as("n_dup_chunks"))
      .filter(col("n_dup_chunks") > 0)
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        (col("n_dup_chunks") * 10L).as("dup_tokens"))
      .psort(col("doc_id"))
  }

  private val x44Sql =
    """WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents),
      |p AS (SELECT doc_id,
      |  CASE WHEN doc_id % 7 = 0 THEN LIST_CONCAT(ws[1:20], ws) ELSE ws END
      |    AS ws2 FROM t),
      |c AS (SELECT doc_id,
      |  CASE WHEN LEN(ws2) >= 10
      |    THEN [ARRAY_TO_STRING(ws2[(i - 1) * 10 + 1:(i - 1) * 10 + 10], ' ')
      |          FOR i IN RANGE(1, LEN(ws2) // 10 + 1)]
      |    ELSE [] END AS chunks FROM p)
      |SELECT doc_id, LEN(chunks) AS n_chunks,
      |  LEN(chunks) - LEN(LIST_DISTINCT(chunks)) AS n_dup_chunks,
      |  CAST((LEN(chunks) - LEN(LIST_DISTINCT(chunks))) * 10 AS BIGINT)
      |    AS dup_tokens
      |FROM c WHERE LEN(chunks) > LEN(LIST_DISTINCT(chunks))
      |ORDER BY doc_id""".stripMargin

  // ---- x45: semantic topic clusters with TF-IDF labels --------------------
  /** x45: topic-cluster report over the corpus — every document is assigned
    * to its trained IVF cell (the SAME bit-reproducible quantizer the ANN
    * family serves from, build-once/serve-many), and each cluster is
    * labelled with its top-3 TF-IDF terms (cluster-level term frequency x
    * ln(k/cluster-df)) plus size and mean length. This is the corpus
    * topic-map step of data curation: "what IS in this 100 TB crawl, and
    * how big is each slice" — the input to mixture decisions (x33/x39).
    *
    * Scale shape: the assignment is the persisted IVF frame (no new pass),
    * one (cell, term) shuffle for cluster tf, a cells-count-sized df frame
    * broadcast back, and a top-3 window over k<=8 partitions. No
    * corpus-wide state beyond the one tf aggregation. Determinism: tf/df
    * are exact integers; ln is 1-ulp noisy so the score is ROUNDed for the
    * hash and ties rank by term (the x07 discipline). */
  private val x45: Q = (s, dir) => {
    val (_, assigned) = Similarity.trainedIvf(s, dir)
    val docs = t(s, dir, "documents")
      .join(assigned.select(col("vec_id").as("doc_id"), col("cell")), Seq("doc_id"))
    val terms = docs
      .select(col("cell"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val tf = terms.groupBy(col("cell"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val sizes = docs.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
    val w = Window.partitionBy(col("cell"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(broadcast(dfreq), Seq("term"))
      .select(col("cell"), col("term"),
        // the IDF numerator is the CLUSTER COUNT — track Similarity.ivfK
        // rather than hard-coding it, so a quantizer change can't silently
        // skew the labels while both engines still agree
        (col("tf").cast("double") *
          log(lit(Similarity.ivfK.toDouble) / col("df").cast("double")))
          .as("tfidf"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .join(broadcast(sizes), Seq("cell"))
      .select(col("cell"), col("n_docs"),
        round(col("total_chars").cast("double") / col("n_docs").cast("double"), 4)
          .as("avg_chars"),
        col("rnk"), col("term"), round(col("tfidf"), 6).as("tfidf"))
      .psort(col("cell"), col("rnk"))
  }

  private lazy val x45Sql: String =
    s"""${Similarity.ivfCtePrefix},
       |docs2 AS (
       |  SELECT d.doc_id, d.text, d.n_chars, a.cell
       |  FROM documents d JOIN assignF a ON d.doc_id = a.cid),
       |terms AS (
       |  SELECT cell, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM docs2),
       |tf AS (
       |  SELECT cell, term, COUNT(*) AS tf FROM terms WHERE term <> ''
       |  GROUP BY cell, term),
       |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
       |sizes AS (
       |  SELECT cell, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars
       |  FROM docs2 GROUP BY cell),
       |tscored AS (
       |  SELECT tf.cell, tf.term,
       |    CAST(tf.tf AS DOUBLE) * LN(${Similarity.ivfK}.0 / CAST(dfreq.df AS DOUBLE)) AS tfidf
       |  FROM tf JOIN dfreq USING (term)),
       |tranked AS (
       |  SELECT cell, term, tfidf,
       |    ROW_NUMBER() OVER (PARTITION BY cell ORDER BY tfidf DESC, term) AS rnk
       |  FROM tscored)
       |SELECT r.cell, s.n_docs,
       |  ROUND(CAST(s.total_chars AS DOUBLE) / CAST(s.n_docs AS DOUBLE), 4) AS avg_chars,
       |  r.rnk, r.term, ROUND(r.tfidf, 6) AS tfidf
       |FROM tranked r JOIN sizes s USING (cell) WHERE r.rnk <= 3
       |ORDER BY cell, rnk""".stripMargin

  // ---- x46: robust perplexity outlier detection (median/MAD) --------------
  /** x46: per-source LM-score outlier audit — the "what poisoned this
    * slice" check run after x13's scoring pass: within each source, flag
    * documents whose bigram-LM average NLL deviates from the source median
    * by more than 3x the median absolute deviation. Median/MAD (not
    * mean/stddev) on purpose: outliers cannot inflate their own threshold,
    * and the lower-median of INTEGER micronat scores keeps every number in
    * the query exact integer arithmetic — hash-stable across engines with
    * no float-order or overflow hazard (sum-of-squares of micronat scores
    * overflows int64 at sf10; a median never does).
    *
    * Scale shape: re-serves the ONE persisted x13 scoring frame
    * (build-once/serve-many); both medians are windows PARTITIONED by
    * source (never global), and the audit is a per-source aggregation. */
  private val x46: Q = (s, dir) => {
    val scored = lmScored(s, dir)
      .join(t(s, dir, "documents").select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .select(col("doc_id"), col("source"),
        col("avg_nll_micronats").as("v"))
    val bySrc = Window.partitionBy(col("source"))
    val medOf = (value: Column, frame: DataFrame) => {
      val w = bySrc.orderBy(value, col("doc_id"))
      frame.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(bySrc))
        .filter(col("rn") === expr("(n + 1) div 2")) // lower median, int div
    }
    val med = medOf(col("v"), scored)
      .select(col("source"), col("v").as("med"))
    val dev = scored.join(broadcast(med), Seq("source"))
      .withColumn("dev", abs(col("v") - col("med")))
    val mad = medOf(col("dev"), dev)
      .select(col("source"), col("dev").as("mad"))
    val wWorst = bySrc.orderBy(col("dev").desc, col("doc_id"))
    dev.join(broadcast(mad), Seq("source"))
      .withColumn("is_out", col("dev") > col("mad") * 3)
      .withColumn("wr", row_number().over(wWorst))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("med")).as("median_nll"),
        min(col("mad")).as("mad_nll"),
        sum(when(col("is_out"), 1L).otherwise(0L)).as("n_outliers"),
        min(when(col("wr") === 1, col("doc_id"))).as("worst_doc"),
        min(when(col("wr") === 1, col("dev"))).as("worst_dev"))
      .psort(col("source"))
  }

  private val x46Sql =
    """WITH ex AS (
      |  SELECT doc_id, UNNEST([SUBSTR(text, i, 2) FOR i IN RANGE(1, LEN(text))]) AS bg
      |  FROM documents WHERE LEN(text) >= 2),
      |model AS (
      |  SELECT bg,
      |    CAST(ROUND(-LN(COUNT(*)::DOUBLE / (SELECT COUNT(*) FROM ex)::DOUBLE)
      |      * 1000000.0) AS BIGINT) AS nll_micro
      |  FROM ex GROUP BY bg),
      |docbg AS (SELECT doc_id, bg, COUNT(*) AS k FROM ex GROUP BY 1, 2),
      |scored AS (
      |  SELECT d.doc_id, doc.source,
      |    CAST(SUM(d.k * m.nll_micro) AS BIGINT) // CAST(SUM(d.k) AS BIGINT) AS v
      |  FROM docbg d JOIN model m ON d.bg = m.bg
      |  JOIN documents doc ON d.doc_id = doc.doc_id
      |  GROUP BY d.doc_id, doc.source),
      |med AS (
      |  SELECT source, v AS med FROM (
      |    SELECT source, v,
      |      ROW_NUMBER() OVER (PARTITION BY source ORDER BY v, doc_id) AS rn,
      |      COUNT(*) OVER (PARTITION BY source) AS n
      |    FROM scored) WHERE rn = (n + 1) // 2),
      |dev AS (
      |  SELECT s.doc_id, s.source, ABS(s.v - m.med) AS dev, m.med
      |  FROM scored s JOIN med m USING (source)),
      |mad AS (
      |  SELECT source, dev AS mad FROM (
      |    SELECT source, dev,
      |      ROW_NUMBER() OVER (PARTITION BY source ORDER BY dev, doc_id) AS rn,
      |      COUNT(*) OVER (PARTITION BY source) AS n
      |    FROM dev) WHERE rn = (n + 1) // 2),
      |j AS (
      |  SELECT d.source, d.doc_id, d.dev, d.med, m.mad,
      |    d.dev > m.mad * 3 AS is_out,
      |    ROW_NUMBER() OVER (PARTITION BY d.source
      |      ORDER BY d.dev DESC, d.doc_id) AS wr
      |  FROM dev d JOIN mad m USING (source))
      |SELECT source, COUNT(*) AS n_docs,
      |  MIN(med) AS median_nll, MIN(mad) AS mad_nll,
      |  CAST(SUM(CASE WHEN is_out THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  MIN(CASE WHEN wr = 1 THEN doc_id END) AS worst_doc,
      |  MIN(CASE WHEN wr = 1 THEN dev END) AS worst_dev
      |FROM j GROUP BY source ORDER BY source""".stripMargin

  // ---- x47: readability audit (Flesch / FKGL, integer-staged) -------------
  /** x47: per-source readability profile — the curation filter class the
    * quality score (x02) doesn't cover: reading-ease level. Counts are the
    * standard deterministic heuristics (words = non-empty whitespace
    * tokens over the normalized text; sentences = terminator runs
    * `[.!?]+`, min 1; syllables = vowel-group runs `[aeiouy]+` per word,
    * min 1 — the classic approximation), aggregated per source, with
    * Flesch reading-ease and Flesch-Kincaid grade level computed from the
    * per-source INTEGER sums (one exactly-specified double expression at
    * O(sources) rows — no float aggregation order hazard), plus the share
    * of documents in the "easy" band (per-doc Flesch >= 60).
    *
    * Scale shape: one map-only pass computes the three integer counts per
    * document (codegen'd regexp + higher-order lambda, no UDF); the audit
    * is a single per-source aggregation; the formulas run on O(sources)
    * rows. */
  private val x47: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    val counted = d
      .withColumn("ws", expr(
        "filter(split(regexp_replace(lower(text), ' +', ' '), ' '), " +
          "w -> w <> '')"))
      .filter(size(col("ws")) >= 1)
      .select(col("source"),
        size(col("ws")).cast("long").as("n_words"),
        greatest(lit(1L),
          size(expr("regexp_extract_all(text, '[.!?]+', 0)")).cast("long"))
          .as("n_sent"),
        expr("aggregate(ws, 0L, (acc, w) -> acc + greatest(1L, " +
          "cast(size(regexp_extract_all(w, '[aeiouy]+', 0)) as long)))")
          .as("n_syll"))
      .withColumn("doc_flesch", expr(
        "206.835 - 1.015 * (cast(n_words as double) / cast(n_sent as double))" +
          " - 84.6 * (cast(n_syll as double) / cast(n_words as double))"))
    counted.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("words"),
        sum(col("n_sent")).as("sentences"),
        sum(col("n_syll")).as("syllables"),
        sum(when(col("doc_flesch") >= 60.0, 1L).otherwise(0L)).as("n_easy"))
      .withColumn("wps", expr(
        "round(cast(words as double) / cast(sentences as double), 2)"))
      .withColumn("spw", expr(
        "round(cast(syllables as double) / cast(words as double), 2)"))
      .withColumn("flesch", expr(
        "round(206.835 - 1.015 * (cast(words as double) / " +
          "cast(sentences as double)) - 84.6 * (cast(syllables as double) " +
          "/ cast(words as double)), 2)"))
      .withColumn("fkgl", expr(
        "round(0.39 * (cast(words as double) / cast(sentences as double)) " +
          "+ 11.8 * (cast(syllables as double) / cast(words as double)) " +
          "- 15.59, 2)"))
      .psort(col("source"))
  }

  private val x47Sql =
    """WITH counted AS (
      |  SELECT source,
      |    CAST(LEN(ws) AS BIGINT) AS n_words,
      |    GREATEST(1, CAST(LEN(REGEXP_EXTRACT_ALL(text, '[.!?]+'))
      |      AS BIGINT)) AS n_sent,
      |    CAST(LIST_SUM([GREATEST(1, LEN(REGEXP_EXTRACT_ALL(w, '[aeiouy]+')))
      |      FOR w IN ws]) AS BIGINT) AS n_syll
      |  FROM (
      |    SELECT source, text,
      |      [w FOR w IN
      |        STRING_SPLIT(REGEXP_REPLACE(LOWER(text), ' +', ' ', 'g'), ' ')
      |        IF w <> ''] AS ws
      |    FROM documents) WHERE LEN(ws) >= 1),
      |flagged AS (
      |  SELECT *,
      |    206.835 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sent AS DOUBLE))
      |      - 84.6 * (CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE))
      |      AS doc_flesch
      |  FROM counted),
      |agg AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(n_words) AS BIGINT) AS words,
      |    CAST(SUM(n_sent) AS BIGINT) AS sentences,
      |    CAST(SUM(n_syll) AS BIGINT) AS syllables,
      |    CAST(SUM(CASE WHEN doc_flesch >= 60.0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_easy
      |  FROM flagged GROUP BY source)
      |SELECT source, n_docs, words, sentences, syllables, n_easy,
      |  ROUND(CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE), 2) AS wps,
      |  ROUND(CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE), 2) AS spw,
      |  ROUND(206.835 - 1.015 * (CAST(words AS DOUBLE) /
      |    CAST(sentences AS DOUBLE)) - 84.6 * (CAST(syllables AS DOUBLE) /
      |    CAST(words AS DOUBLE)), 2) AS flesch,
      |  ROUND(0.39 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE)) +
      |    11.8 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE)) -
      |    15.59, 2) AS fkgl
      |FROM agg ORDER BY source""".stripMargin

  // ---- x48: quasi-identifier k-anonymity audit ----------------------------
  /** x48: the metadata-privacy audit release pipelines run before shipping
    * a corpus with per-document attributes: treating (source,
    * char-length bucket, token-count bucket) as the quasi-identifier
    * tuple, how identifiable is each document? Per source: the number of
    * distinct quasi-identifier groups, the smallest group (the source's
    * k-anonymity — k=1 means some document is uniquely fingerprintable
    * from its metadata alone), and the count/permille of documents in
    * groups below k=5 (the conventional re-identification threshold).
    * Exact integer arithmetic end to end.
    *
    * Scale shape: one shuffle groups the quasi-identifier tuples
    * (map-side partials), the per-source rollup aggregates the GROUP
    * frame (group-diversity-sized, not corpus-sized) plus one doc-level
    * count join — no windows, no pairs. */
  private val x48: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    val q = d.select(col("source"),
      (length(col("text")).cast("long") / 500L).cast("long").as("len_b"),
      (expr("size(filter(split(text, ' '), w -> w <> ''))").cast("long")
        / 100L).cast("long").as("tok_b"))
    val groups = q.groupBy(col("source"), col("len_b"), col("tok_b"))
      .agg(count(lit(1)).as("gsize"))
    groups.groupBy(col("source"))
      .agg(sum(col("gsize")).as("n_docs"),
        count(lit(1)).as("n_groups"),
        min(col("gsize")).as("k_anonymity"),
        sum(when(col("gsize") < 5, col("gsize")).otherwise(0L))
          .as("n_below_k"))
      .withColumn("permille_below",
        expr("n_below_k * 1000 div n_docs"))
      .psort(col("source"))
  }

  private val x48Sql =
    """WITH q AS (
      |  SELECT source,
      |    LENGTH(text) // 500 AS len_b,
      |    LEN([w FOR w IN STRING_SPLIT(text, ' ') IF w <> '']) // 100 AS tok_b
      |  FROM documents),
      |g AS (
      |  SELECT source, len_b, tok_b, COUNT(*) AS gsize
      |  FROM q GROUP BY 1, 2, 3)
      |SELECT source,
      |  CAST(SUM(gsize) AS BIGINT) AS n_docs,
      |  COUNT(*) AS n_groups,
      |  MIN(gsize) AS k_anonymity,
      |  CAST(SUM(CASE WHEN gsize < 5 THEN gsize ELSE 0 END) AS BIGINT)
      |    AS n_below_k,
      |  CAST(SUM(CASE WHEN gsize < 5 THEN gsize ELSE 0 END) AS BIGINT)
      |    * 1000 // CAST(SUM(gsize) AS BIGINT) AS permille_below
      |FROM g GROUP BY source ORDER BY source""".stripMargin

  // ---- x49: Zipf power-law fit over the per-source token spectrum --------
  /** x49: the distributional-health check after tokenization — natural
    * language follows Zipf's law (frequency ~ rank^-s with s near 1);
    * machine-generated or template-heavy sources deviate. Per source: the
    * least-squares slope and r-squared of ln(freq) on ln(rank) over the
    * top-20 tokens, plus the head token itself. A slope far from -1 or a
    * poor fit flags a source for curation review. Counts and ranks are
    * exact integers; ln enters only the final fitted coefficients, which
    * are rounded for the hash per the x07 ulp discipline.
    *
    * Scale shape: one (source, term) count shuffle with map-side partials;
    * the top-20 cut is a rank window that Catalyst executes as
    * WindowGroupLimit (per-partition partial top-k BELOW the shuffle), so
    * no source's full vocabulary ever sorts in one task; the fit
    * aggregates 20 rows per source. */
  private val x49: Q = (s, dir) => {
    val terms = t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val cnt = terms.groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("cnt").desc, col("term"))
    val top = cnt.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 20)
    val lx = log(col("rnk").cast("double"))
    val ly = log(col("cnt").cast("double"))
    val sums = top.groupBy(col("source")).agg(
      count(lit(1)).as("n_top"),
      max(when(col("rnk") === 1, col("term"))).as("top_term"),
      max(when(col("rnk") === 1, col("cnt"))).as("top_count"),
      min(col("cnt")).as("cmin"), max(col("cnt")).as("cmax"),
      sum(lx).as("sx"), sum(ly).as("sy"), sum(lx * ly).as("sxy"),
      sum(lx * lx).as("sxx"), sum(ly * ly).as("syy"))
    val n = col("n_top").cast("double")
    val cov = n * col("sxy") - col("sx") * col("sy")
    val varx = n * col("sxx") - col("sx") * col("sx")
    val vary = n * col("syy") - col("sy") * col("sy")
    // degenerate-source guards, decided on exact INTEGERS so both engines
    // agree bit-for-bit: a 1-term vocabulary has varx = 0 (no slope), and
    // an all-equal-counts top list has vary = 0 (no r2) — emit NULL rather
    // than a NaN/Inf whose hash rendering is engine-specific
    val fit = col("n_top") >= 2
    val spread = fit && col("cmin") =!= col("cmax")
    sums.select(col("source"), col("n_top"), col("top_term"),
        col("top_count"),
        when(fit, round(cov / varx, 6)).as("zipf_slope"),
        when(spread, round(cov * cov / (varx * vary), 6)).as("fit_r2"))
      .psort(col("source"))
  }

  private val x49Sql =
    """WITH terms AS (
      |  SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS term
      |  FROM documents),
      |cnt AS (
      |  SELECT source, term, COUNT(*) AS cnt FROM terms WHERE term <> ''
      |  GROUP BY 1, 2),
      |top AS (
      |  SELECT source, term, cnt,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY cnt DESC, term) AS rnk
      |  FROM cnt QUALIFY rnk <= 20),
      |sums AS (
      |  SELECT source, COUNT(*) AS n_top,
      |    MAX(CASE WHEN rnk = 1 THEN term END) AS top_term,
      |    MAX(CASE WHEN rnk = 1 THEN cnt END) AS top_count,
      |    MIN(cnt) AS cmin, MAX(cnt) AS cmax,
      |    SUM(LN(CAST(rnk AS DOUBLE))) AS sx,
      |    SUM(LN(CAST(cnt AS DOUBLE))) AS sy,
      |    SUM(LN(CAST(rnk AS DOUBLE)) * LN(CAST(cnt AS DOUBLE))) AS sxy,
      |    SUM(LN(CAST(rnk AS DOUBLE)) * LN(CAST(rnk AS DOUBLE))) AS sxx,
      |    SUM(LN(CAST(cnt AS DOUBLE)) * LN(CAST(cnt AS DOUBLE))) AS syy
      |  FROM top GROUP BY source)
      |SELECT source, n_top, top_term, top_count,
      |  CASE WHEN n_top >= 2 THEN
      |    ROUND((n_top*sxy - sx*sy) / (n_top*sxx - sx*sx), 6) END AS zipf_slope,
      |  CASE WHEN n_top >= 2 AND cmin <> cmax THEN
      |    ROUND((n_top*sxy - sx*sy) * (n_top*sxy - sx*sy)
      |      / ((n_top*sxx - sx*sx) * (n_top*syy - sy*sy)), 6) END AS fit_r2
      |FROM sums ORDER BY source""".stripMargin

  // ---- x50: code-vs-prose detection (curation routing) --------------------
  /** x50: the code-detection routing step a mixed crawl runs before
    * tokenization — code and prose want different tokenizers, dedup
    * granularity, and mixing weights (the StarCoder/RedPajama pipelines
    * route on exactly this signal). The detector is the standard cheap
    * heuristic pair: code-symbol density (`; = ( )` per 1000 chars) plus
    * code-keyword token hits (`def`/`return`), combined conjunctively so
    * neither a symbol-heavy table dump nor a prose sentence quoting
    * "return" alone flips the verdict. The synthetic corpus is symbol-free
    * word salad, so code docs are PLANTED (doc_id % 23 == 7) through a
    * deterministic engine-identical rewrite — both engines compute the
    * same features on the same rewritten text, and the spec pins that the
    * verdict recovers the plant exactly. All counters exact integers;
    * permille by integer division.
    *
    * Scale shape: one map-only feature pass per document (char/token
    * counting, no regex backtracking), one per-source aggregation with
    * map-side partials — the flattest curation shape. */
  private val x50: Q = (s, dir) => {
    val base = t(s, dir, "documents")
    val text2 = when(col("doc_id") % 23 === 7,
      concat(lit("def f"), col("doc_id").cast("string"), lit("(x): "),
        regexp_replace(col("text"), lit(" "), lit("; x = ")),
        lit(" return x"))).otherwise(col("text"))
    val stripped = regexp_replace(col("t2"), "[;=()]", "")
    val feats = base.select(col("doc_id"), col("source"), text2.as("t2"))
      .select(col("doc_id"), col("source"),
        length(col("t2")).as("n_chars2"),
        (length(col("t2")) - length(stripped)).as("n_sym"),
        size(filter(split(col("t2"), " "), x => x =!= "")).as("n_tok"),
        size(filter(split(col("t2"), " "),
          x => x === "def" || x === "return")).as("kw_hits"))
      .select(col("source"), col("n_sym"), col("n_tok"),
        expr("n_sym * 1000 div n_chars2").as("sym_permille"),
        col("kw_hits"))
      .withColumn("is_code",
        col("sym_permille") >= 30 && col("kw_hits") >= 1)
    feats.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("is_code"), 1L).otherwise(0L)).as("n_code"),
        sum(col("n_sym").cast("long")).as("total_sym"),
        sum(when(col("is_code"), col("n_tok").cast("long")).otherwise(0L))
          .as("code_tokens"),
        sum(when(!col("is_code"), col("n_tok").cast("long")).otherwise(0L))
          .as("prose_tokens"))
      .select(col("source"), col("n_docs"), col("n_code"),
        expr("n_code * 1000 div n_docs").as("code_permille"),
        col("total_sym"), col("code_tokens"), col("prose_tokens"))
      .psort(col("source"))
  }

  private val x50Sql =
    """WITH t2 AS (
      |  SELECT doc_id, source,
      |    CASE WHEN doc_id % 23 = 7
      |      THEN 'def f' || CAST(doc_id AS VARCHAR) || '(x): '
      |        || REPLACE(text, ' ', '; x = ') || ' return x'
      |      ELSE text END AS t2
      |  FROM documents),
      |feat AS (
      |  SELECT source,
      |    LENGTH(t2) - LENGTH(REPLACE(REPLACE(REPLACE(REPLACE(t2,
      |      ';', ''), '=', ''), '(', ''), ')', '')) AS n_sym,
      |    LENGTH(t2) AS n_chars2,
      |    LEN(LIST_FILTER(STRING_SPLIT(t2, ' '), x -> x <> '')) AS n_tok,
      |    LEN(LIST_FILTER(STRING_SPLIT(t2, ' '),
      |      x -> x = 'def' OR x = 'return')) AS kw_hits
      |  FROM t2),
      |cls AS (
      |  SELECT source, n_sym, n_tok,
      |    (n_sym * 1000 // n_chars2 >= 30 AND kw_hits >= 1) AS is_code
      |  FROM feat)
      |SELECT source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN is_code THEN 1 ELSE 0 END) AS BIGINT) AS n_code,
      |  CAST(SUM(CASE WHEN is_code THEN 1 ELSE 0 END) * 1000 // COUNT(*)
      |    AS BIGINT) AS code_permille,
      |  CAST(SUM(n_sym) AS BIGINT) AS total_sym,
      |  CAST(SUM(CASE WHEN is_code THEN n_tok ELSE 0 END) AS BIGINT)
      |    AS code_tokens,
      |  CAST(SUM(CASE WHEN NOT is_code THEN n_tok ELSE 0 END) AS BIGINT)
      |    AS prose_tokens
      |FROM cls GROUP BY source ORDER BY source""".stripMargin

  // ---- x51: canary-string tracking (contamination propagation audit) ------
  /** x51: the canary audit published eval suites rely on (BIG-bench-style
    * canary GUIDs): unique marker strings planted in guarded documents let
    * a later sweep prove whether guarded text leaked into the training
    * corpus — and HOW FAR it propagated (the same canary in multiple docs
    * or multiple sources = the text was copied around before ingestion).
    * Canaries are planted deterministically (doc_id % 29 == 11, value
    * keyed by doc_id % 5 so propagation genuinely occurs); the sweep is
    * generic: tokenize, match the canary prefix, report per canary the
    * doc count, source spread, first sighting, and the cross-source flag.
    *
    * Scale shape: one map-only tokenize+filter pass (the filter prunes to
    * a vanishing row count before the shuffle), one tiny per-canary agg. */
  private val x51: Q = (s, dir) => {
    val planted = when(col("doc_id") % 29 === 11,
      concat(col("text"), lit(" canary-"),
        substring(md5((col("doc_id") % 5).cast("string")), 1, 8)))
      .otherwise(col("text"))
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"), planted.as("t2"))
      // prune BEFORE the explode: a substring scan is one pass over the
      // chars, the explode materializes every token — at 100x corpus the
      // unpruned explode measured 27x super-linear (6.3 s at sf10), the
      // pruned one is flat
      .filter(col("t2").contains("canary-"))
      .select(col("doc_id"), col("source"),
        explode(split(col("t2"), " ")).as("tok"))
      .filter(col("tok").startsWith("canary-"))
      .groupBy(col("tok")).agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        min(col("doc_id")).as("first_doc"))
      .select(col("tok").as("canary"), col("n_docs"), col("n_sources"),
        col("first_doc"), (col("n_sources") > 1).as("cross_source"))
      .psort(col("canary"))
  }

  private val x51Sql =
    """WITH t2 AS (
      |  SELECT doc_id, source,
      |    CASE WHEN doc_id % 29 = 11
      |      THEN text || ' canary-'
      |        || SUBSTR(MD5(CAST(doc_id % 5 AS VARCHAR)), 1, 8)
      |      ELSE text END AS t2
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, source, UNNEST(STRING_SPLIT(t2, ' ')) AS tok
      |  FROM t2)
      |SELECT tok AS canary, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
      |  CAST(MIN(doc_id) AS BIGINT) AS first_doc,
      |  COUNT(DISTINCT source) > 1 AS cross_source
      |FROM tok WHERE tok LIKE 'canary-%'
      |GROUP BY tok ORDER BY tok""".stripMargin

  // ---- x52: frequency-spectrum + Good-Turing unseen-mass estimate ----------
  /** x52: the count-of-counts spectrum smoothing is built on — per source
    * the vocabulary size, token mass, N1/N2 (types seen once/twice), and
    * the Good-Turing estimate of unseen probability mass (N1/N, reported
    * as exact integer permille). A source whose unseen mass is high is
    * under-sampled relative to its vocabulary — more crawl budget moves
    * the needle there; near zero means the source is exhausted. x38's
    * hapax trend is the time-series cousin; this is the per-source
    * smoothing input. All counters exact integers.
    *
    * Scale shape: one (source, term) count shuffle with map-side partials,
    * one spectrum re-agg over type counts — vocabulary-bounded, never
    * token-bounded after the first shuffle. */
  private val x52: Q = (s, dir) => {
    val cnt = t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("c"))
    cnt.groupBy(col("source")).agg(
        count(lit(1)).as("vocab"),
        sum(col("c")).as("tokens"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when(col("c") === 2L, 1L).otherwise(0L)).as("n2"))
      .select(col("source"), col("vocab"), col("tokens"), col("n1"),
        col("n2"),
        expr("n1 * 1000 div tokens").as("unseen_mass_permille"))
      .psort(col("source"))
  }

  private val x52Sql =
    """WITH cnt AS (
      |  SELECT source, term, COUNT(*) AS c FROM (
      |    SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS term
      |    FROM documents)
      |  WHERE term <> '' GROUP BY 1, 2)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab,
      |  CAST(SUM(c) AS BIGINT) AS tokens,
      |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |  CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000 // SUM(c)
      |    AS BIGINT) AS unseen_mass_permille
      |FROM cnt GROUP BY source ORDER BY source""".stripMargin

  // ---- x53: language-ID confusion matrix ------------------------------------
  /** x53: the evaluation rollup every classifier-gated pipeline publishes —
    * x03's stopword language detector scored against the corpus labels as
    * a confusion matrix: per (labelled, guessed) cell the count and its
    * permille within the labelled row, plus the diagonal flag. The
    * off-diagonal heavy cells tell curation WHICH language pairs the
    * detector confuses (and therefore which routed buckets need a second
    * pass); row permilles are per-class recall.
    *
    * Scale shape: one map-only scoring pass (the same argmax expression
    * x03 gates), one |langs|^2-bounded agg, a |langs|-row broadcast for
    * row totals. */
  private val x53: Q = (s, dir) => {
    val words = array_distinct(split(col("text"), " +"))
    val scores = langStop.map { case (lang, sw) =>
      struct(size(filter(words, w => w.isin(sw.map(lit(_)): _*))).as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*))
    val cells = t(s, dir, "documents")
      .select(col("lang").as("labelled"),
        best.getField("lang").as("guessed"))
      .groupBy(col("labelled"), col("guessed"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(col("labelled"))
      .agg(sum(col("n")).as("row_total"))
    cells.join(broadcast(totals), Seq("labelled"))
      .select(col("labelled"), col("guessed"), col("n"),
        expr("n * 1000 div row_total").as("row_permille"),
        (col("labelled") === col("guessed")).as("correct"))
      .psort(col("labelled"), col("guessed"))
  }

  private val x53Sql = {
    val structs = langStop.map { case (lang, sw) =>
      val lst = sw.map(w => s"'$w'").mkString("[", ",", "]")
      s"{'score': LEN(LIST_FILTER(LIST_DISTINCT(REGEXP_SPLIT_TO_ARRAY(text, ' +')), w -> LIST_CONTAINS($lst, w))), 'lang': '$lang'}"
    }.mkString(",\n   ")
    s"""WITH g AS (
       |  SELECT lang AS labelled, LIST_MAX([$structs])['lang'] AS guessed
       |  FROM documents),
       |cells AS (
       |  SELECT labelled, guessed, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM g GROUP BY 1, 2),
       |tot AS (
       |  SELECT labelled, CAST(SUM(n) AS BIGINT) AS row_total
       |  FROM cells GROUP BY 1)
       |SELECT c.labelled, c.guessed, c.n,
       |  CAST(c.n * 1000 // t.row_total AS BIGINT) AS row_permille,
       |  c.labelled = c.guessed AS correct
       |FROM cells c JOIN tot t USING (labelled)
       |ORDER BY c.labelled, c.guessed""".stripMargin
  }

  // ---- x54: encoding-health (mojibake) audit ---------------------------------
  /** x54: ENCODING HEALTH — the ingest audit every web-scale text pipeline
    * runs before tokenization: per source, how many documents carry (a) the
    * U+FFFD replacement character (a decoder already gave up upstream),
    * (b) stray C0 control characters other than tab/newline/CR (binary
    * bleed-through), (c) CP-1252 mojibake markers ("Ã©", "â€" — UTF-8
    * bytes re-decoded as Latin-1), plus the corpus-wide non-ASCII permille
    * per source. Because the synthetic corpus is clean ASCII, the
    * corruption is PLANTED deterministically (the m19/s33 pattern): docs
    * with doc_id%7=0 get mojibake + a replacement char, doc_id%11=0 a BEL
    * control — so every detector branch actually fires and the oracle
    * verifies the detection, not just zeros.
    *
    * Scale shape: map-only scan (regex + contains per row) into one
    * per-source aggregation with map-side partials — the cheapest audit
    * shape there is; at 100 TB it is bounded by the read. */
  private val x54: Q = (s, dir) => {
    val mojib = "Ã©" // "Ã©" — UTF-8 'é' re-read as Latin-1
    val corrupted = t(s, dir, "documents")
      .withColumn("ctext",
        when(col("doc_id") % 7 === 0,
          concat(regexp_replace(col("text"), "e", mojib), lit("�")))
          .when(col("doc_id") % 11 === 0, concat(col("text"), lit("\u0007")))
          .otherwise(col("text")))
    corrupted.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("ctext").contains("�"), 1L).otherwise(0L))
          .as("n_replacement"),
        sum(when(col("ctext").rlike("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"), 1L)
          .otherwise(0L)).as("n_control"),
        sum(when(col("ctext").contains(mojib) ||
          col("ctext").contains("â€"), 1L).otherwise(0L))
          .as("n_mojibake"),
        sum(length(col("ctext"))).as("n_chars"),
        sum(length(col("ctext")) -
          length(regexp_replace(col("ctext"), "[^\\x00-\\x7F]", "")))
          .as("n_nonascii"))
      .withColumn("nonascii_permille",
        expr("n_nonascii * 1000 div n_chars"))
      .select(col("source"), col("n_docs"), col("n_replacement"),
        col("n_control"), col("n_mojibake"), col("nonascii_permille"))
      .psort(col("source"))
  }

  private val x54Sql =
    """WITH c AS (
      |  SELECT source,
      |    CASE WHEN doc_id % 7 = 0
      |           THEN replace(text, 'e', chr(195) || chr(169)) || chr(65533)
      |         WHEN doc_id % 11 = 0 THEN text || chr(7)
      |         ELSE text END AS ctext
      |  FROM documents),
      |agg AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(CASE WHEN contains(ctext, chr(65533)) THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_replacement,
      |    CAST(SUM(CASE WHEN regexp_matches(ctext,
      |      '[\x00-\x08\x0B\x0C\x0E-\x1F]') THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_control,
      |    CAST(SUM(CASE WHEN contains(ctext, chr(195) || chr(169))
      |      OR contains(ctext, chr(226) || chr(8364)) THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_mojibake,
      |    CAST(SUM(length(ctext)) AS BIGINT) AS n_chars,
      |    CAST(SUM(length(ctext) -
      |      length(regexp_replace(ctext, '[^\x00-\x7F]', '', 'g')))
      |      AS BIGINT) AS n_nonascii
      |  FROM c GROUP BY source)
      |SELECT source, n_docs, n_replacement, n_control, n_mojibake,
      |  CAST(n_nonascii * 1000 // n_chars AS BIGINT) AS nonascii_permille
      |FROM agg ORDER BY source""".stripMargin

  // ---- x55: C4-style line rule filter (Raffel et al., 2020) -------------
  /** x55: the C4 line-level rule battery — keep a line only if it ends in
    * terminal punctuation, has >= 5 words, contains no '{' (code page
    * signal), and does not contain the word 'javascript' (cookie/JS
    * banner signal); a document survives only with >= 3 retained lines.
    * Lines are the 10-token chunks of the d08/x30 segmentation (the
    * corpus has no newlines); the corpus also has no punctuation, so the
    * rule triggers are PLANTED with the x17/x30 deterministic-arithmetic
    * convention, identical in both engines: a terminal '.' on every line
    * with (doc_id + i) % 3 = 0, the token 'javascript' on every
    * (doc_id + 31*i) % 11 = 0, a '{' on every (doc_id + 2*i) % 13 = 0.
    * Output: the per-document drop taxonomy (each line lands in exactly
    * one bucket, first matching rule wins — C4's published order) and
    * the document verdict.
    *
    * Scale shape: map-only rule evaluation per line, ONE aggregation
    * shuffle on doc_id; no joins, no corpus-size state. At 100 TB the
    * explode is bounded by tokens/10 and the aggregate is map-side
    * partial — the same per-line filter shape C4 ran over Common
    * Crawl. */
  private val x55: Q = (s, dir) => {
    val lines = t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("ws"),
        explode(expr("sequence(0, ((size(ws) + 9) div 10) - 1)")).as("i"))
      .select(col("doc_id"),
        expr("concat(array_join(slice(ws, i * 10 + 1, 10), ' '), " +
          "CASE WHEN (doc_id + 31*i) % 11 = 0 THEN ' javascript' ELSE '' END, " +
          "CASE WHEN (doc_id + 2*i) % 13 = 0 THEN ' {' ELSE '' END, " +
          "CASE WHEN (doc_id + i) % 3 = 0 THEN '.' ELSE '' END)").as("line"))
    lines
      .select(col("doc_id"),
        expr("CASE WHEN contains(line, 'javascript') THEN 'js' " +
          "WHEN contains(line, '{') THEN 'brace' " +
          "WHEN size(split(line, ' ')) < 5 THEN 'short' " +
          "WHEN NOT endswith(line, '.') THEN 'nopunct' " +
          "ELSE 'kept' END").as("verdict"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("verdict") === "kept", 1L).otherwise(0L)).as("kept_lines"),
        sum(when(col("verdict") === "js", 1L).otherwise(0L)).as("drop_js"),
        sum(when(col("verdict") === "brace", 1L).otherwise(0L)).as("drop_brace"),
        sum(when(col("verdict") === "short", 1L).otherwise(0L)).as("drop_short"),
        sum(when(col("verdict") === "nopunct", 1L).otherwise(0L))
          .as("drop_nopunct"))
      .withColumn("doc_kept", (col("kept_lines") >= 3).cast("int"))
      .psort(col("doc_id"))
  }

  private val x55Sql =
    """WITH lines AS (
      |  SELECT doc_id,
      |    ARRAY_TO_STRING(ws[i*10+1:i*10+10], ' ')
      |      || CASE WHEN (doc_id + 31*i) % 11 = 0 THEN ' javascript' ELSE '' END
      |      || CASE WHEN (doc_id + 2*i) % 13 = 0 THEN ' {' ELSE '' END
      |      || CASE WHEN (doc_id + i) % 3 = 0 THEN '.' ELSE '' END AS line
      |  FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents),
      |    UNNEST(RANGE((LEN(ws) + 9) // 10)) AS t(i)),
      |v AS (
      |  SELECT doc_id,
      |    CASE WHEN CONTAINS(line, 'javascript') THEN 'js'
      |      WHEN CONTAINS(line, '{') THEN 'brace'
      |      WHEN LEN(STRING_SPLIT(line, ' ')) < 5 THEN 'short'
      |      WHEN NOT ENDS_WITH(line, '.') THEN 'nopunct'
      |      ELSE 'kept' END AS verdict
      |  FROM lines)
      |SELECT doc_id, COUNT(*) AS n_lines,
      |  CAST(SUM(CASE WHEN verdict = 'kept' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS kept_lines,
      |  CAST(SUM(CASE WHEN verdict = 'js' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS drop_js,
      |  CAST(SUM(CASE WHEN verdict = 'brace' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS drop_brace,
      |  CAST(SUM(CASE WHEN verdict = 'short' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS drop_short,
      |  CAST(SUM(CASE WHEN verdict = 'nopunct' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS drop_nopunct,
      |  CAST(CASE WHEN SUM(CASE WHEN verdict = 'kept' THEN 1 ELSE 0 END) >= 3
      |    THEN 1 ELSE 0 END AS INTEGER) AS doc_kept
      |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- x56: code-switching (intra-document language segmentation) -------
  /** Per-language marker phrases, each word UNIQUE to its language's x03
    * stopword list — a planted chunk scores >= 3 for its language, above
    * any organic hit count the tech-word corpus can produce. */
  private val switchMarkers: Seq[(String, String)] = Seq(
    "de" -> "und der nicht", "en" -> "the and of", "es" -> "el los una",
    "fr" -> "les pour dans", "zh" -> "shi wo ta")

  /** x56: code-switching detection — mixed-language documents are a real
    * curation hazard (they poison monolingual buckets and skew language
    * quotas), and the standard cheap detector is chunk-level language ID
    * plus transition counting. Chunks are the 10-token d08/x30 windows;
    * each chunk is scored by the x03 stopword detector; the corpus is
    * monolingual-ish, so switching is PLANTED with the deterministic
    * convention: every (doc_id*7 + i) % 4 = 0 chunk gets the marker
    * phrase of language (doc_id + i) % 5 (three words each unique to
    * that language's list — decisive over organic hits). Output per doc:
    * chunk count, transition count (lang(i) != lang(i-1)), dominant
    * language (max (count, lang) struct — tie to the later name, the x03
    * argmax convention), and its permille share.
    *
    * Scale shape: map-only chunk scoring; ONE doc_id shuffle shared by
    * the lag window and the dominant-language aggregation; no joins. */
  private val x56: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val markers = switchMarkers.map(_._2)
    val markerArr = s"array(${markers.map(m => s"'$m'").mkString(", ")})"
    val chunks = t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("ws"),
        explode(expr("sequence(0, ((size(ws) + 9) div 10) - 1)")).as("i"))
      .select(col("doc_id"), col("i"),
        expr("concat(array_join(slice(ws, i * 10 + 1, 10), ' '), " +
          s"CASE WHEN (doc_id * 7 + i) % 4 = 0 THEN " +
          s"concat(' ', element_at($markerArr, " +
          "cast((doc_id + i) % 5 + 1 as int))) ELSE '' END)").as("chunk"))
    val words = array_distinct(split(col("chunk"), " +"))
    val scores = langStop.map { case (lang, sw) =>
      struct(size(filter(words, w => w.isin(sw.map(lit(_)): _*))).as("score"),
        lit(lang).as("lang"))
    }
    val scored = chunks.select(col("doc_id"), col("i"),
      array_max(array(scores: _*)).getField("lang").as("clang"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val trans = scored
      .withColumn("switch",
        when(lag(col("clang"), 1).over(w).isNotNull &&
          lag(col("clang"), 1).over(w) =!= col("clang"), 1L).otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"), sum(col("switch")).as("n_switches"))
    val dom = scored.groupBy(col("doc_id"), col("clang"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(max(struct(col("cnt"), col("clang"))).as("d"))
      .select(col("doc_id"), col("d.clang").as("dominant_lang"),
        col("d.cnt").as("dcnt"))
    trans.join(dom, Seq("doc_id"))
      .select(col("doc_id"), col("n_chunks"), col("n_switches"),
        col("dominant_lang"),
        expr("dcnt * 1000 div n_chunks").as("dom_permille"))
      .psort(col("doc_id"))
  }

  private val x56Sql = {
    val markerList = switchMarkers.map(m => s"'${m._2}'")
      .mkString("[", ", ", "]")
    val structs = langStop.map { case (lang, sw) =>
      val lst = sw.map(w => s"'$w'").mkString("[", ",", "]")
      s"{'score': LEN(LIST_FILTER(LIST_DISTINCT(REGEXP_SPLIT_TO_ARRAY(chunk, ' +')), w -> LIST_CONTAINS($lst, w))), 'lang': '$lang'}"
    }.mkString(",\n   ")
    s"""WITH chunks AS (
       |  SELECT doc_id, i,
       |    ARRAY_TO_STRING(ws[i*10+1:i*10+10], ' ')
       |      || CASE WHEN (doc_id * 7 + i) % 4 = 0
       |         THEN ' ' || $markerList[CAST((doc_id + i) % 5 AS INTEGER) + 1]
       |         ELSE '' END AS chunk
       |  FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents),
       |    UNNEST(RANGE((LEN(ws) + 9) // 10)) AS t(i)),
       |scored AS (
       |  SELECT doc_id, i, LIST_MAX([$structs])['lang'] AS clang
       |  FROM chunks),
       |trans AS (
       |  SELECT doc_id, COUNT(*) AS n_chunks,
       |    CAST(SUM(CASE WHEN prev IS NOT NULL AND prev <> clang
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_switches
       |  FROM (SELECT doc_id, clang,
       |          LAG(clang) OVER (PARTITION BY doc_id ORDER BY i) AS prev
       |        FROM scored)
       |  GROUP BY doc_id),
       |dom AS (
       |  SELECT doc_id,
       |    MAX({'cnt': cnt, 'clang': clang}) AS d
       |  FROM (SELECT doc_id, clang, COUNT(*) AS cnt
       |        FROM scored GROUP BY 1, 2)
       |  GROUP BY doc_id)
       |SELECT t.doc_id, t.n_chunks, t.n_switches,
       |  d.d['clang'] AS dominant_lang,
       |  CAST(d.d['cnt'] * 1000 // t.n_chunks AS BIGINT) AS dom_permille
       |FROM trans t JOIN dom d ON t.doc_id = d.doc_id
       |ORDER BY t.doc_id""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "x54_encoding_audit" -> x54,
    "x55_c4_line_rules" -> x55,
    "x56_code_switching" -> x56,
    "x53_lang_confusion" -> x53,
    "x52_freq_spectrum" -> x52,
    "x51_canary_tracking" -> x51,
    "x50_code_detect" -> x50,
    "x49_zipf_fit" -> x49,
    "x48_k_anonymity" -> x48,
    "x47_readability" -> x47,
    "x46_ppl_outliers" -> x46,
    "x45_topic_clusters" -> x45,
    "x44_selfrep_dedup" -> x44,
    "x43_epoch_shuffle" -> x43,
    "x42_source_similarity" -> x42,
    "x41_epoch_alloc" -> x41,
    "x40_source_overlap" -> x40,
    "x39_temperature_mix" -> x39,
    "x38_vocab_growth" -> x38,
    "x37_pmi_collocations" -> x37,
    "x36_length_hist" -> x36,
    "x35_word_entropy" -> x35,
    "x34_distribution_drift" -> x34,
    "x33_domain_mixture" -> x33,
    "x32_ngram_novelty" -> x32,
    "x31_tokenizer_fertility" -> x31,
    "x30_boilerplate_lines" -> x30,
    "x29_dsir_resample" -> x29,
    "x28_url_curation" -> x28,
    "x27_heldout_ppl" -> x27,
    "x26_curriculum_order" -> x26,
    "x25_packing_curve" -> x25,
    "x24_ppl_bucket_sample" -> x24,
    "x23_quality_filter" -> x23,
    "x22_bpe_encode" -> x22,
    "x21_cms_heavy_hitters" -> x21,
    "x20_chunk_overlap" -> x20,
    "x19_reservoir_sample" -> x19,
    "x18_dataset_card" -> x18,
    "x17_split_leakage" -> x17,
    "x16_bpe_train" -> x16,
    "x15_quality_classifier" -> x15,
    "x14_stratified_sample" -> x14,
    "x12_repetition" -> x12,
    "x13_lm_score" -> x13,
    "x11_decontaminate" -> x11,
    "x09_pii_scrub" -> x09,
    "x10_seq_packing" -> x10,
    "x01_token_count" -> x01,
    "x02_quality_score" -> x02,
    "x03_lang_id" -> x03,
    "x04_fingerprint" -> x04,
    "x05_ngram_profile" -> x05,
    "x06_vocab_topk" -> x06,
    "x07_tfidf" -> x07,
    "x08_mixture_sample" -> x08)

  val oracleSql: Map[String, String] = Map(
    "x54_encoding_audit" -> x54Sql,
    "x55_c4_line_rules" -> x55Sql,
    "x56_code_switching" -> x56Sql,
    "x53_lang_confusion" -> x53Sql,
    "x52_freq_spectrum" -> x52Sql,
    "x51_canary_tracking" -> x51Sql,
    "x50_code_detect" -> x50Sql,
    "x49_zipf_fit" -> x49Sql,
    "x48_k_anonymity" -> x48Sql,
    "x47_readability" -> x47Sql,
    "x46_ppl_outliers" -> x46Sql,
    "x45_topic_clusters" -> x45Sql,
    "x44_selfrep_dedup" -> x44Sql,
    "x43_epoch_shuffle" -> x43Sql,
    "x42_source_similarity" -> x42Sql,
    "x41_epoch_alloc" -> x41Sql,
    "x40_source_overlap" -> x40Sql,
    "x39_temperature_mix" -> x39Sql,
    "x38_vocab_growth" -> x38Sql,
    "x37_pmi_collocations" -> x37Sql,
    "x36_length_hist" -> x36Sql,
    "x35_word_entropy" -> x35Sql,
    "x34_distribution_drift" -> x34Sql,
    "x33_domain_mixture" -> x33Sql,
    "x32_ngram_novelty" -> x32Sql,
    "x31_tokenizer_fertility" -> x31Sql,
    "x30_boilerplate_lines" -> x30Sql,
    "x29_dsir_resample" -> x29Sql,
    "x28_url_curation" -> x28Sql,
    "x27_heldout_ppl" -> x27Sql,
    "x26_curriculum_order" -> x26Sql,
    "x25_packing_curve" -> x25Sql,
    "x24_ppl_bucket_sample" -> x24Sql,
    "x23_quality_filter" -> x23Sql,
    "x22_bpe_encode" -> x22Sql,
    "x21_cms_heavy_hitters" -> x21Sql,
    "x20_chunk_overlap" -> x20Sql,
    "x19_reservoir_sample" -> x19Sql,
    "x18_dataset_card" -> x18Sql,
    "x17_split_leakage" -> x17Sql,
    "x16_bpe_train" -> x16Sql,
    "x15_quality_classifier" -> x15Sql,
    "x14_stratified_sample" -> x14Sql,
    "x12_repetition" -> x12Sql,
    "x13_lm_score" -> x13Sql,
    "x11_decontaminate" -> x11Sql,
    "x09_pii_scrub" -> x09Sql,
    "x10_seq_packing" -> x10Sql,
    "x01_token_count" -> x01Sql,
    "x02_quality_score" -> x02Sql,
    "x03_lang_id" -> x03Sql,
    "x04_fingerprint" -> x04Sql,
    "x05_ngram_profile" -> x05Sql,
    "x06_vocab_topk" -> x06Sql,
    "x07_tfidf" -> x07Sql,
    "x08_mixture_sample" -> x08Sql)
}
