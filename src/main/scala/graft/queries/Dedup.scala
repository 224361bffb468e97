package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import QueryHelpers._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard all-pairs, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design (100 TB):
  *  - the shingled corpus (incl. per-shingle hashes) is materialized ONCE
  *    and persisted; every downstream branch (signatures, inverted index,
  *    verification) reads the persisted frame instead of recomputing the
  *    tokenize+md5 pipeline per plan branch — at 100 TB this is the
  *    checkpoint a production near-dup pipeline writes between stages;
  *  - each token/shingle is hashed ONCE (`hv`); the k minhash functions are
  *    cheap affine folds over those longs, not k md5 passes;
  *  - candidate generation never does an O(n^2) cross join: pairs are
  *    enumerated from inverted-index postings lists (df-capped), so the
  *    shuffle is keyed on the shingle/band value and skew is bounded by
  *    the posting cap;
  *  - only the candidate pairs (tiny vs corpus) are verified exactly.
  *
  * Oracle determinism: md5-derived integer hashes are identical in both
  * engines; jaccard/cosine are double divisions of exactly-determined values.
  */
object Dedup {

  /** Base64-encode a serialized Bloom filter destined to ride a query plan
    * as ONE string literal (the d16 incremental-dedup direction). Only sane
    * while it stays kilobytes: a caller feeding a huge batch through this
    * path would otherwise silently build a multi-MB plan string, so fail
    * BEFORE planning and name the limit (the fix is raising fpp, shrinking
    * the batch, or switching to the d10 broadcast hash-set direction). */
  private[graft] def bloomPlanLiteral(bytes: Array[Byte],
      capBytes: Int = 4 << 20): String = {
    require(bytes.length <= capBytes,
      s"bloom filter serializes to ${bytes.length} bytes (> $capBytes-byte " +
        "plan-literal cap): shrink the batch, raise fpp, or use the d10 " +
        "broadcast hash-set direction instead")
    java.util.Base64.getEncoder.encodeToString(bytes)
  }

  // ---- shared shingling (word 3-grams), identical in both dialects ----
  private val W = "split(text, ' ')"
  private val shinglesExpr =
    s"array_distinct(transform(sequence(1, size($W) - 2), i -> " +
      s"concat(element_at($W, i), ' ', element_at($W, i+1), ' ', element_at($W, i+2))))"
  private val shinglesSql =
    "LIST_DISTINCT([w[i] || ' ' || w[i+1] || ' ' || w[i+2] " +
      "FOR i IN RANGE(1, LEN(w) - 1)])"
  private[queries] val docsShSql =
    s"""SELECT doc_id, $shinglesSql AS sh
       |  FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents)
       |  WHERE LEN(w) >= 3""".stripMargin

  private def md5iExpr(x: String) = s"CAST(conv(substr(md5($x), 1, 8), 16, 10) AS BIGINT)"

  /** Shingled corpus: doc_id, sh (distinct 3-gram strings), n = |sh|,
    * hv = md5-derived long per shingle (hashed once). Shingling and hashing
    * run through the native codegen'd expressions (graft.functions) —
    * bit-identical to the composable transform/md5 pipeline but fused loops.
    * Persisted and shared across the dedup queries — the "materialize the
    * tokenized corpus once" stage of a production pipeline. */
  private[queries] def docsWithShingles(s: SparkSession, dir: String): DataFrame =
    memoized(s"shingles:$dir")(
      t(s, dir, "documents")
        // documents.parquet is one small file -> a 1-partition scan; spread
        // the persisted index so every consumer stage starts parallel
        .repartition(s.sparkContext.defaultParallelism)
        .filter(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"), expr("graft_shingles(text)").as("sh"))
        .select(col("doc_id"), col("sh"), size(col("sh")).as("n"),
          expr("graft_md5i_array(sh)").as("hv"))
        .persist(StorageLevel.MEMORY_AND_DISK))

  /** Enumerate ordered pairs from a sorted postings list `ds` (native
    * codegen'd loop — graft.functions.PostingPairs). */
  private val pairsFromPostings = "graft_pairs(ds)"

  /** Exact dedup on normalized text (lower + squeezed whitespace): canonical
    * representative = min doc_id per content hash. Hash-groupBy — the 100 TB
    * shape is a single shuffle on the digest. */
  private val d01: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    val norm = regexp_replace(lower(col("text")), " +", " ")
    d.select(col("doc_id"), md5(norm).as("h"))
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .groupBy()
      .agg(count(lit(1)).as("n_unique"),
        sum(col("n_copies")).as("n_docs"),
        sum(when(col("n_copies") > 1, 1).otherwise(0)).as("n_dup_groups"),
        min(col("canonical_id")).as("first_canonical"))
  }

  private val d01Sql =
    """WITH g AS (
      |  SELECT MD5(REGEXP_REPLACE(LOWER(text), ' +', ' ', 'g')) AS h,
      |         MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
      |  FROM documents GROUP BY 1)
      |SELECT COUNT(*) AS n_unique, CAST(SUM(n_copies) AS BIGINT) AS n_docs,
      |       CAST(SUM(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
      |       MIN(canonical_id) AS first_canonical
      |FROM g""".stripMargin

  /** N-gram Jaccard all-pairs near-dup: inverted index on shingles
    * (doc-frequency capped at 100), candidate pairs enumerated from the
    * postings lists (one shuffle on the shingle, one on the pair — no
    * self-join recompute), exact jaccard >= 0.5. */
  /** Shared candidate pairs with common-shingle counts — the single
    * candidate-generation pass both shingle-space policies (d02 jaccard,
    * d13 containment) score from. Persisted like the shingle index: at
    * 100 TB this is the expensive stage (two shuffles over the exploded
    * corpus), and sharing it means adding a policy costs one cheap
    * pair-scoring pass, not a re-run of candidate generation.
    *
    * The postings rows are BYTE-small but each carries up to C(100,2)
    * pair fan-out and a sort_array(collect_list) — AQE's size-based
    * coalescing would funnel both the reduce and the pair-explode into one
    * task. Pinning the shuffle with an explicit user partition count (AQE
    * leaves user-numbered repartitions alone) keeps the CPU-bound reduce
    * AND the downstream explode at cluster parallelism; the same reasoning
    * holds at 100 TB where per-row cost, not byte size, is the bottleneck. */
  private def shinglePairCounts(s: SparkSession, dir: String): DataFrame =
    memoized(s"shinglepairs:$dir") {
      val docs = docsWithShingles(s, dir)
      docs.select(col("doc_id"), explode(col("sh")).as("s"))
        .repartition(s.sparkContext.defaultParallelism, col("s"))
        .groupBy(col("s")).agg(sort_array(collect_list(col("doc_id"))).as("ds"))
        .filter(size(col("ds")).between(2, 100))
        .select(explode(expr(pairsFromPostings)).as("p"))
        .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
        .agg(count(lit(1)).as("common"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

  private val d02: Q = (s, dir) => {
    val docs = docsWithShingles(s, dir)
    val cand = shinglePairCounts(s, dir)
    val sizes = docs.select(col("doc_id"), col("n"))
    cand
      .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
      .select(col("d1"), col("d2"),
        (col("common").cast("double") /
          (col("s1.n") + col("s2.n") - col("common")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .psortScaled(col("d1"), col("d2"))
  }

  private val d02Sql =
    s"""WITH docs AS ($docsShSql),
       |ex AS (SELECT doc_id, UNNEST(sh) AS s FROM docs),
       |rare AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) <= 100),
       |exr AS (SELECT ex.doc_id, ex.s FROM ex JOIN rare USING (s)),
       |cand AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
       |  FROM exr a JOIN exr b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, LEN(sh) AS n FROM docs)
       |SELECT d1, d2,
       |       common::DOUBLE / (s1.n + s2.n - common)::DOUBLE AS jaccard
       |FROM cand
       |JOIN sizes s1 ON d1 = s1.doc_id
       |JOIN sizes s2 ON d2 = s2.doc_id
       |WHERE common::DOUBLE / (s1.n + s2.n - common)::DOUBLE >= 0.5
       |ORDER BY d1, d2""".stripMargin

  // ---- MinHash: k=8 universal hashes over shingle md5-hashes, 4 bands of 2
  private val P = 1000000007L
  private val hashAB: Seq[(Long, Long)] = Seq(
    (101L, 17L), (211L, 89L), (307L, 251L), (419L, 563L),
    (523L, 1009L), (617L, 2003L), (727L, 4001L), (839L, 8009L))

  /** Minhash i as a native affine-min fold over the precomputed hashes. */
  private def minhashCol(i: Int): String = {
    val (a, b) = hashAB(i)
    s"graft_minhash(hv, $a, $b, $P)"
  }

  private[queries] def minhashSql(i: Int): String = {
    val (a, b) = hashAB(i)
    s"LIST_MIN([($a * (${md5iSql("s")} % $P) + $b) % $P FOR s IN sh])"
  }

  /** MinHash signature frame (doc_id, m0..m7) over the shingled corpus —
    * ONE definition of the sketch parameters (8 hashes, 4 bands x 2 rows)
    * shared by the dedup pass (d03) and the quality evaluation (d06). */
  private def minhashSig(s: SparkSession, dir: String): DataFrame =
    minhashSigOf(docsWithShingles(s, dir))

  private[queries] def minhashSigOf(docs: DataFrame): DataFrame =
    docs.select(
      (col("doc_id") +: col("sh") +:
        (0 until 8).map(i => expr(minhashCol(i)).as(s"m$i"))): _*)

  /** Content-group map (doc_id -> rep): docs whose shingle ARRAYS are
    * identical collapse to one representative (the min doc_id), keyed by
    * an md5 digest of the array (the d01 exact-dedup precedent). On a
    * duplicate-heavy corpus — sf1 is 10x, sf10 is 100x replicated, yet
    * both hold the SAME 4992 distinct contents — any stage that
    * enumerates doc-level pairs degenerates as dup^2 per group (measured
    * at sf10: the doc-level minhash verify and d07's Pregel edge set
    * froze the suite). This map lets the whole minhash chain run at
    * CONTENT diversity and expand winners back to doc pairs as
    * output-proportional, partition-pinned work — the same collapse the
    * round-8 s09 knnTop3 and round-6 d20 fixes applied. */
  private def docGroups(s: SparkSession, dir: String): DataFrame =
    memoized(s"docgroups:$dir") {
      val keyed = docsWithShingles(s, dir)
        // NUL separator: shingles contain spaces, so a space-joined digest
        // could alias two different arrays onto one key
        .select(col("doc_id"), md5(concat_ws("\u0000", col("sh"))).as("ck"))
      val reps = keyed.groupBy(col("ck")).agg(min(col("doc_id")).as("rep"))
      keyed.join(reps, Seq("ck"))
        .select(col("doc_id"), col("rep"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

  /** Verified near-dup pairs at the REPRESENTATIVE level (r1 < r2,
    * jaccard >= 0.8): the d03 candidate+verify chain over one doc per
    * distinct content. Copies share their rep's signature bit-for-bit, so
    * (a, b) shares a band iff (rep(a), rep(b)) does, and jaccard(a, b) ==
    * jaccard(rep(a), rep(b)) — the doc-level pair set reconstructs
    * exactly from these winners plus the always-candidate same-content
    * pairs (identical sigs share every band; jaccard exactly 1.0). */
  /** Rep-level LSH candidate pairs — ONE candidate-generation pass for the
    * whole content-collapsed minhash chain. The verified-edge asset
    * ([[nearDupRepPairs]]) and the two sketch audits (d37 b-bit, d39 OPH)
    * all enumerate exactly the same band-keyed postings over the same rep
    * signatures; r14 memoizes the shared pass (the d02 shinglePairCounts
    * precedent — candidate generation is the expensive stage, policies
    * score from it). */
  private def repCandidates(s: SparkSession, dir: String): DataFrame =
    memoized(s"repcands:$dir") {
      val g = docGroups(s, dir)
      val reps = docsWithShingles(s, dir).as("d")
        .join(g.filter(col("doc_id") === col("rep"))
          .select(col("rep").as("rid")), col("d.doc_id") === col("rid"))
        .select(col("d.doc_id"), col("d.sh"), col("d.n"), col("d.hv"))
      minhashCandidates(minhashSigOf(reps))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

  private def nearDupRepPairs(s: SparkSession, dir: String): DataFrame =
    memoized(s"ndreppairs:$dir") {
      val g = docGroups(s, dir)
      val reps = docsWithShingles(s, dir).as("d")
        .join(g.filter(col("doc_id") === col("rep"))
          .select(col("rep").as("rid")), col("d.doc_id") === col("rid"))
        .select(col("d.doc_id"), col("d.sh"), col("d.n"), col("d.hv"))
      val cand = repCandidates(s, dir)
      cand
        .join(reps.select(col("doc_id").as("d1"), col("sh").as("sh1")), Seq("d1"))
        .join(reps.select(col("doc_id").as("d2"), col("sh").as("sh2")), Seq("d2"))
        .select(col("d1").as("r1"), col("d2").as("r2"), jaccardCol.as("jaccard"))
        .filter(col("jaccard") >= 0.8)
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

  /** LSH band-bucket candidate pairs (d1 < d2, distinct) from the signature
    * frame — the shared candidate generator for d03/d06. */
  private def minhashCandidates(sig: DataFrame): DataFrame = {
    val bands = sig.select(col("doc_id"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          concat_ws("_", col(s"m${2 * b}"), col(s"m${2 * b + 1}")).as("key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    bands
      .groupBy(col("band"), col("key"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(expr(pairsFromPostings)).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .distinct()
  }

  /** Exact jaccard between the pair's shingle sets (both dialects divide
    * |intersection| by |union| in doubles). r14: the intersection SIZE
    * comes from the count-only native (graft_icount) — value-identical to
    * size(array_intersect(...)) but never materializes the intersection
    * array per candidate pair (guide §1.2 step 2: per-task work). */
  private[queries] def jaccardCol = {
    val inter = expr("graft_icount(sh1, sh2)")
    inter.cast("double") /
      (size(col("sh1")) + size(col("sh2")) - inter).cast("double")
  }

  /** MinHash + LSH near-dup: 8-hash signature as folds over the once-hashed
    * shingles, band keys (4 bands x 2 rows) -> postings-list candidate
    * enumeration -> exact jaccard >= 0.8 verification on candidates only. */
  /** Verified near-duplicate pairs (jaccard >= 0.8 on LSH candidates) —
    * d03's result frame, also the edge set for d07's clustering. */
  // Memoized: the verified pair list is the shared EDGE asset of the
  // dedup family (d03 emits it; d07's components, d19's weights, d21's
  // representatives, and d22's split audit all consume it) — build the
  // verify join once, serve every consumer from the persisted frame.
  private def nearDupPairs(s: SparkSession, dir: String): DataFrame =
    memoized(s"ndpairs:$dir") {
      val par = s.sparkContext.defaultParallelism
      val g = docGroups(s, dir)
      // same-content pairs: identical shingle arrays mean identical
      // signatures (every band shared — always candidates) and jaccard
      // n/(n+n-n) = exactly 1.0; no verify work needed. The self-join is
      // pinned to cluster parallelism — each rep key's fan-out is C(k,2)
      // in its copy count, and AQE would coalesce the byte-small map
      // into one task
      val gp = g.repartition(par, col("rep"))
      val same = gp.as("a").join(gp.as("b"),
          col("a.rep") === col("b.rep") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
          lit(1.0).as("jaccard"))
      // cross-content winners verified once per representative pair, then
      // expanded to member pairs (copies share the rep's exact jaccard
      // value bit-for-bit — same arrays, same expression)
      val rp = nearDupRepPairs(s, dir).repartition(par, col("r1"), col("r2"))
      val cross = rp
        .join(broadcast(g.select(col("rep").as("r1"), col("doc_id").as("m1"))), Seq("r1"))
        .join(broadcast(g.select(col("rep").as("r2"), col("doc_id").as("m2"))), Seq("r2"))
        .select(least(col("m1"), col("m2")).as("d1"),
          greatest(col("m1"), col("m2")).as("d2"), col("jaccard"))
      same.unionAll(cross)
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

  private val d03: Q = (s, dir) =>
    nearDupPairs(s, dir).orderBy(col("d1"), col("d2"))

  /** Shared oracle CTEs: shingled docs -> signatures -> bands -> distinct
    * candidate pairs. One definition of the sketch for d03Sql and d06Sql. */
  private val minhashCandCtes: String = {
    val sigCols = (0 until 8).map(i => s"${minhashSql(i)} AS m$i").mkString(",\n   ")
    val bandRows = (0 until 4).map { b =>
      s"SELECT doc_id, $b AS band, m${2 * b} || '_' || m${2 * b + 1} AS key FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""docs AS ($docsShSql),
       |sig AS (SELECT doc_id, sh,
       |   $sigCols
       |  FROM docs),
       |bands AS (
       |  $bandRows),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)""".stripMargin
  }

  private[queries] val jaccardSql =
    """LEN(LIST_INTERSECT(s1.sh, s2.sh))::DOUBLE /
      |      (LEN(s1.sh) + LEN(s2.sh) - LEN(LIST_INTERSECT(s1.sh, s2.sh)))::DOUBLE""".stripMargin

  /** Verified-pair CTEs shared by d03Sql and d07Sql: exact jaccard over the
    * candidates, threshold 0.8 — one definition, like the Spark-side
    * nearDupPairs. */
  private val verifiedPairCtes =
    s"""j AS (
       |  SELECT d1, d2,
       |    $jaccardSql AS jaccard
       |  FROM cand
       |  JOIN docs s1 ON d1 = s1.doc_id
       |  JOIN docs s2 ON d2 = s2.doc_id),
       |edges AS (SELECT d1, d2 FROM j WHERE jaccard >= 0.8)""".stripMargin

  private val d03Sql =
    s"""WITH $minhashCandCtes,
       |$verifiedPairCtes
       |SELECT d1, d2, jaccard FROM j WHERE jaccard >= 0.8 ORDER BY d1, d2""".stripMargin

  // ---- SimHash: 32-bit signature over distinct tokens, byte-band LSH ----
  private def simhashSql: String = {
    val uw = "LIST_DISTINCT(STRING_SPLIT(text, ' '))"
    val bits = (0 until 32).map { j =>
      s"(CASE WHEN LIST_SUM([CASE WHEN (${md5iSql("w")} >> $j) & 1 = 1 THEN 1 ELSE -1 END FOR w IN $uw]) > 0 THEN ${1L << j} ELSE 0 END)"
    }
    bits.mkString("(", " + ", ")")
  }

  /** SimHash near-dup: 32-bit signatures; pigeonhole byte-banding (hamming
    * <= 1 over 4 bytes guarantees one identical byte) generates candidates
    * via equi-join; verify with popcount(xor) <= 1.
    *
    * hash-once + one-pass majority fold run as a single fused native
    * expression chain (graft_simhash . graft_md5i_array); the signature
    * frame is persisted because both sides of the band join read it. */
  private val d04: Q = (s, dir) => {
    val d = memoized(s"d04sig:$dir") {
      t(s, dir, "documents")
        .select(col("doc_id"),
          expr(s"graft_simhash(graft_md5i_array(array_distinct($W)))").as("sim"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    // Candidate generation runs at the UNIQUE-SIGNATURE level, not the doc
    // level. A duplicate-heavy corpus (the realistic shape — sf1 is 10x
    // replicated) puts every copy of a document into the same band bucket,
    // so doc-level within-bucket enumeration goes quadratic in the copy
    // count (measured at sf1: 168M candidate pairs, 12-14 s). Collapsing
    // to distinct signatures first makes bucket occupancy track CONTENT
    // diversity instead of corpus size:
    //   - same-signature doc pairs are hamming 0 and always share both
    //     bands, so they expand directly from a self-join on sim — no
    //     bucket enumeration, output-proportional work only;
    //   - cross-signature candidates come from the 2 x 16-bit band join
    //     (hamming<=1 flips at most one band, so the other still matches —
    //     pigeonhole) over ~|distinct sims| rows, filtered to hamming = 1
    //     BEFORE expanding back to doc pairs via two equi-joins.
    // The union is provably the original pair set; sf1 wall-clock 14 -> ~3 s.
    // (the distinct's exchange is reused across the self-join sides)
    val sigs = d.select(col("sim")).distinct()
    val sbands = sigs.select(col("sim"),
      explode(array((0 until 2).map { k =>
        struct(lit(k).as("k"), shiftright(col("sim"), 16 * k).bitwiseAND(65535).as("byte"))
      }: _*)).as("bk"))
      .select(col("sim"), col("bk.k").as("k"), col("bk.byte").as("byte"))
    // The expansions below fan out dup^2 doc pairs from byte-small
    // inputs: AQE's size-based coalescing would funnel each into 1-2
    // tasks (measured at sf10: one 485 s task carried the whole cross
    // expansion). User-numbered repartitions pin them at cluster
    // parallelism — the d02 postings lesson applied to the expansion.
    val par = s.sparkContext.defaultParallelism
    // distribute by the FULL pair key: each sig pair's member fan-out is
    // dup1 x dup2, and a hot s1 (one signature with many hamming-1
    // partners) would still straggle under s1-only partitioning — AQE
    // cannot see output-explosion skew because the pair rows are
    // byte-small. Broadcasting the doc->sim map keeps the pinned
    // partitioning through both expansion joins.
    val sigPairs = sbands.as("a").join(sbands.as("b"),
        col("a.k") === col("b.k") && col("a.byte") === col("b.byte")
          && col("a.sim") < col("b.sim"))
      .select(col("a.sim").as("s1"), col("b.sim").as("s2"))
      .distinct()
      .filter(bit_count(col("s1").bitwiseXOR(col("s2"))) === 1)
      .repartition(par, col("s1"), col("s2"))
    val dp = d.repartition(par, col("sim"))
    val same = dp.as("a").join(dp.as("b"),
        col("a.sim") === col("b.sim") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        lit(0).as("hamming"))
    val cross = sigPairs
      .join(broadcast(d.as("x")), col("x.sim") === col("s1"))
      .join(broadcast(d.as("y")), col("y.sim") === col("s2"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("d1"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("d2"),
        lit(1).as("hamming"))
    // corpus-proportional output (31M pairs at the duplicate-heavy sf1):
    // production mode swaps the gate's single ordered merge for a
    // range-partitioned parallel sort, like d02/s09
    same.unionAll(cross).psortScaled(col("d1"), col("d2"))
  }

  private val d04Sql =
    s"""WITH d AS (SELECT doc_id, $simhashSql AS sim FROM documents),
       |bands AS (
       |  SELECT doc_id, sim, k, (sim >> (16 * k)) & 65535 AS byte
       |  FROM d, RANGE(0, 2) r(k)),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
       |    CAST(BIT_COUNT(XOR(a.sim, b.sim)) AS INTEGER) AS hamming
       |  FROM bands a JOIN bands b
       |    ON a.k = b.k AND a.byte = b.byte AND a.doc_id < b.doc_id)
       |SELECT * FROM pairs WHERE hamming <= 1 ORDER BY d1, d2""".stripMargin

  /** Embedding-cosine near-dup: block by label (coarse quantizer), exact
    * cosine on within-block pairs, threshold 0.4. */
  private val d05: Q = (s, dir) => {
    // Distinct-vector collapse (the d04/s09 duplicate lesson applied to
    // the embedding space): copies of the same (label, vector) pay ONE
    // cosine — at sf10 the 21,800-vector label blocks are 218 distinct
    // vectors, so the exact scoring runs at content diversity and the
    // doc-level pairs expand back as partition-pinned fan-out. Copies
    // share their rep's cosine bit-for-bit (same arrays, same
    // expression; the kernel is index-ordered and commutative in its
    // two arguments, so orientation never changes the value).
    val par = s.sparkContext.defaultParallelism
    val e = t(s, dir, "embeddings")
    val reps = e.groupBy(col("label"), col("embedding"))
      .agg(min(col("vec_id")).as("rep"))
    val gmap = e.join(reps, Seq("label", "embedding"))
      .select(col("vec_id"), col("label"), col("rep"))
    // one self-cosine per distinct vector ((sqrt x)^2 rounds, so cos(e,e)
    // is NOT axiomatically 1.0 — it must be computed, once)
    val selfc = reps
      .select(col("rep"), col("embedding").as("e1"), col("embedding").as("e2"))
      .select(col("rep"), expr(cosineExpr("e1", "e2")).as("cos"))
    val mem = gmap.repartition(par, col("rep"))
    val same = mem.as("a").join(mem.as("b"),
        col("a.rep") === col("b.rep") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
        col("a.label").as("label"), col("a.rep").as("rep"))
      .join(broadcast(selfc), Seq("rep"))
    val ra = reps.select(col("label"), col("rep").as("ra"), col("embedding").as("e1"))
    val rb = reps.select(col("label"), col("rep").as("rb"), col("embedding").as("e2"))
    val repPairs = ra.join(rb, Seq("label")).filter(col("ra") < col("rb"))
      .select(col("label"), col("ra"), col("rb"),
        expr(cosineExpr("e1", "e2")).as("cos"))
      .filter(col("cos") >= 0.4)
      .repartition(par, col("ra"), col("rb"))
    val cross = repPairs
      .join(broadcast(gmap.select(col("rep").as("ra"), col("vec_id").as("m1"))), Seq("ra"))
      .join(broadcast(gmap.select(col("rep").as("rb"), col("vec_id").as("m2"))), Seq("rb"))
      .select(least(col("m1"), col("m2")).as("v1"),
        greatest(col("m1"), col("m2")).as("v2"), col("label"), col("cos"))
    same.select(col("v1"), col("v2"), col("label"), col("cos"))
      .unionAll(cross)
      .filter(col("cos") >= 0.4)
      .select(col("v1"), col("v2"), col("label"), round(col("cos"), 6).as("cosine"))
      .psort(col("v1"), col("v2"))
  }

  private val d05Sql =
    s"""SELECT a.vec_id AS v1, b.vec_id AS v2, a.label AS label,
       |  ROUND(${cosineSql("a.embedding", "b.embedding")}, 6) AS cosine
       |FROM embeddings a JOIN embeddings b
       |  ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE ${cosineSql("a.embedding", "b.embedding")} >= 0.4
       |ORDER BY v1, v2""".stripMargin

  /** Sketch-quality evaluation: for every LSH candidate pair, the MinHash
    * ESTIMATE (fraction of equal signature components) against the exact
    * jaccard, with per-pair absolute error — the acceptance metric a
    * pipeline gates its sketch parameters (k, bands) on. Both the estimate
    * and the truth are computed in-engine and oracle-replayed. */
  private val d06: Q = (s, dir) => {
    // r13: pinning sig here (the d37 fix) was TRIED and measured WORSE
    // (0.6-0.9 -> 0.9-1.2 s: checkpoint-serializing the shingle arrays
    // costs more than re-running the map-only fold over the cached docs
    // for d06's two estimate sides) — left unpinned deliberately.
    val sig = minhashSig(s, dir)
    val cand = minhashCandidates(sig)
    val a = sig.select((col("doc_id").as("d1") +: col("sh").as("sh1") +:
      (0 until 8).map(i => col(s"m$i").as(s"a$i"))): _*)
    val b = sig.select((col("doc_id").as("d2") +: col("sh").as("sh2") +:
      (0 until 8).map(i => col(s"m$i").as(s"b$i"))): _*)
    val matches = (0 until 8).map(i =>
      when(col(s"a$i") === col(s"b$i"), 1).otherwise(0)).reduce(_ + _)
    cand.join(a, Seq("d1")).join(b, Seq("d2"))
      .select(col("d1"), col("d2"),
        round(matches.cast("double") / 8.0, 6).as("est"),
        round(jaccardCol, 6).as("exact"))
      .withColumn("abs_err", round(abs(col("est") - col("exact")), 6))
      .psort(col("d1"), col("d2"))
  }

  private val d06Sql = {
    val eqSum = (0 until 8).map(i =>
      s"(CASE WHEN s1.m$i = s2.m$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH $minhashCandCtes,
       |scored AS (
       |  SELECT d1, d2,
       |    ROUND(($eqSum)::DOUBLE / 8.0, 6) AS est,
       |    ROUND($jaccardSql, 6) AS exact
       |  FROM cand
       |  JOIN sig s1 ON d1 = s1.doc_id
       |  JOIN sig s2 ON d2 = s2.doc_id)
       |SELECT d1, d2, est, exact, ROUND(ABS(est - exact), 6) AS abs_err
       |FROM scored ORDER BY d1, d2""".stripMargin
  }

  /** Near-dup CLUSTER assignment: connected components over the verified
    * duplicate pairs, cluster id = min doc_id in the component — the step
    * that turns pairwise matches into dedup groups (keep one representative
    * per cluster). Spark side: Pregel-style min-label propagation, a driver
    * loop of joins that converges in <= diameter iterations; each round is
    * one shuffle on the vertex id. At 100 TB this is the standard
    * alternating small-star/large-star shape; the driver only ever collects
    * a single convergence scalar per round. Oracle: recursive CTE
    * propagating reachable labels to a fixpoint. */
  /** Converged min-label components over the verified near-dup edges — the
    * per-dir "cluster index" (memoized; the loop runs once). Min-label
    * propagation converges to the smallest doc_id per component, so the
    * label IS the survivor a keep-first policy selects. */
  private def d07Labels(s: SparkSession, dir: String): DataFrame =
    memoized(s"d07labels:$dir") {
      // Connectivity-reduced edge set: a STAR per content group (every
      // copy -> its representative) plus the rep-level verified pairs.
      // Component membership is identical to the full clique pair list —
      // same-content pairs connect exactly the star's vertices, and a
      // cross pair (a, b) connects groups A, B iff the (rep A, rep B)
      // edge exists — so min-label propagation converges to the same
      // labels, while the edge count drops from sum(k^2) to sum(k)
      // (measured: the full pair list's Pregel froze the sf10 suite).
      val g = docGroups(s, dir)
      val star = g.filter(col("doc_id") =!= col("rep"))
        .select(col("rep").as("d1"), col("doc_id").as("d2"))
      val edges = nearDupRepPairs(s, dir)
        .select(col("r1").as("d1"), col("r2").as("d2"))
        .unionAll(star)
      val bidir = edges.union(edges.select(col("d2").as("d1"), col("d1").as("d2")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      var cur = bidir.select(col("d1").as("id")).distinct()
        .withColumn("lbl", col("id"))
      var prevPersisted: Option[DataFrame] = None
      var converged = false
      while (!converged) {
        val msgs = bidir.join(cur, bidir("d1") === cur("id"))
          .select(col("d2").as("id"), col("lbl"))
        val next = cur.union(msgs)
          .groupBy(col("id")).agg(min(col("lbl")).as("lbl"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val changed = next.as("n")
          .join(cur.as("p"), col("n.id") === col("p.id"))
          .filter(col("n.lbl") =!= col("p.lbl")).count()
        prevPersisted.foreach(_.unpersist())
        prevPersisted = Some(next)
        cur = next
        converged = changed == 0
      }
      // localCheckpoint TRUNCATES the unrolled-iteration lineage: without
      // it every consumer's logical plan embeds the whole Pregel union
      // tower once per reference (d22's three references carried ~900
      // plan nodes and paid ~3 s of OPTIMIZER time per execution — the
      // data itself is tiny). Eager: materializes before the edge cache
      // drops, replacing the cur.count() materialization.
      val snapped = cur.localCheckpoint(true)
      prevPersisted.foreach(_.unpersist())
      bidir.unpersist()
      snapped
    }

  private val d07: Q = (s, dir) =>
    d07Labels(s, dir)
      .select(col("id").as("doc_id"), col("lbl").as("cluster"))
      .psort(col("doc_id"))

  private val d07Sql =
    s"""WITH RECURSIVE $minhashCandCtes,
       |$verifiedPairCtes,
       |bidir AS (SELECT d1 AS id, d2 AS nb FROM edges
       |          UNION ALL SELECT d2, d1 FROM edges),
       |walk(id, lbl) AS (
       |  SELECT DISTINCT id, id FROM bidir
       |  UNION
       |  SELECT b.nb, w.lbl FROM walk w JOIN bidir b ON b.id = w.id)
       |SELECT id AS doc_id, MIN(lbl) AS cluster
       |FROM walk GROUP BY id ORDER BY doc_id""".stripMargin

  /** d15: end-to-end dedup pass REPORT — the closing artifact of the
    * detect → verify → cluster → keep-first pipeline: d03's band candidates
    * verified at jaccard ≥ 0.8 feed d07's connected components, the
    * min-label survivor keeps each cluster's earliest doc, and this query
    * publishes the per-source reduction accounting (docs/chars dropped,
    * dedup ratios) a curation run ships with its output shards.
    *
    * Scale: everything upstream is the already-persisted cluster index
    * (built once, shared with d07); the report itself is one broadcast-
    * joinable label lookup (cluster membership ≪ corpus) onto the corpus
    * scan plus an O(sources) aggregation. */
  private val d15: Q = (s, dir) => {
    val labels = d07Labels(s, dir)
      .select(col("id").as("doc_id"), col("lbl"))
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val dropped = col("lbl").isNotNull && col("lbl") =!= col("doc_id")
    d.join(broadcast(labels), Seq("doc_id"), "left")
      .select(col("source"), col("n_chars"),
        when(dropped, 1L).otherwise(0L).as("drop"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("drop")).as("n_dropped"),
        sum(col("n_chars")).as("chars_total"),
        sum(col("n_chars") * col("drop")).as("chars_dropped"))
      .select(col("source"), col("n_docs"), col("n_dropped"),
        (col("n_docs") - col("n_dropped")).as("n_kept"),
        col("chars_total"), col("chars_dropped"),
        (col("chars_dropped").cast("double") / col("chars_total").cast("double"))
          .as("char_dedup_ratio"))
      .psort(col("source"))
  }

  private val d15Sql =
    s"""WITH RECURSIVE $minhashCandCtes,
       |$verifiedPairCtes,
       |bidir AS (SELECT d1 AS id, d2 AS nb FROM edges
       |          UNION ALL SELECT d2, d1 FROM edges),
       |walk(id, lbl) AS (
       |  SELECT DISTINCT id, id FROM bidir
       |  UNION
       |  SELECT b.nb, w.lbl FROM walk w JOIN bidir b ON b.id = w.id),
       |labels AS (SELECT id, MIN(lbl) AS lbl FROM walk GROUP BY id),
       |marked AS (
       |  SELECT d.source, d.n_chars,
       |    CASE WHEN l.lbl IS NOT NULL AND l.lbl <> d.doc_id
       |         THEN 1 ELSE 0 END AS drop
       |  FROM documents d LEFT JOIN labels l ON d.doc_id = l.id)
       |SELECT source, COUNT(*) AS n_docs,
       | CAST(SUM(drop) AS BIGINT) AS n_dropped,
       | CAST(COUNT(*) - SUM(drop) AS BIGINT) AS n_kept,
       | CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       | CAST(SUM(n_chars * drop) AS BIGINT) AS chars_dropped,
       | CAST(SUM(n_chars * drop) AS BIGINT)::DOUBLE
       |   / CAST(SUM(n_chars) AS BIGINT)::DOUBLE AS char_dedup_ratio
       |FROM marked GROUP BY source ORDER BY source""".stripMargin

  /** Passage-level exact dedup (the Common-Crawl paragraph/line dedup
    * shape): documents are chunked into non-overlapping 10-word passages,
    * each passage is content-hashed, and passages appearing in more than one
    * document are reported with occurrence counts. Map-only chunking, one
    * shuffle on the passage hash; at 100 TB the HAVING clause prunes the
    * (huge) unique tail during the aggregation, so only cross-doc repeats
    * survive to the sort. */
  private val d08: Q = (s, dir) => {
    val chunks = t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        explode(expr("sequence(0, ((size(ws) + 9) div 10) - 1)")).as("i"),
        col("ws"))
      .select(col("doc_id"),
        md5(array_join(expr("slice(ws, i * 10 + 1, 10)"), " ")).as("h"))
    chunks.groupBy(col("h"))
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1)
      .psort(col("n").desc, col("h"))
  }

  private val d08Sql =
    """WITH w AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents),
      |chunks AS (
      |  SELECT doc_id, MD5(ARRAY_TO_STRING(ws[(i*10+1):(i*10+10)], ' ')) AS h
      |  FROM w, UNNEST(RANGE(0, (LEN(ws) + 9) // 10)) t(i))
      |SELECT h, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS nd
      |FROM chunks GROUP BY h HAVING COUNT(DISTINCT doc_id) > 1
      |ORDER BY n DESC, h""".stripMargin

  /** d09: canonicalization (fuzzy-exact) dedup. The corpus has no
    * case/whitespace/word-order variants, so the query PLANTS them on both
    * sides (every doc_id % 5 == 0 gets an uppercased, double-spaced,
    * word-reversed twin at doc_id + 1,000,000) and the canonical form —
    * md5 of the sorted word bag after lower/trim/space-collapse — must
    * collapse exactly those twin pairs (plus any organic bag collisions,
    * identically on both engines).
    *
    * Scale: map-only canonicalization, ONE shuffle on the canonical hash
    * (the same single-shuffle shape as d01 exact dedup); the variant union
    * is a second scan branch, not a join. */
  private val d09: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    val variants = d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(upper(array_join(reverse(split(col("text"), " ")), "  ")), lit("  ")).as("text"))
    val corpus = d.select(col("doc_id"), col("text")).unionAll(variants)
    val canon = corpus.select(col("doc_id"),
      md5(array_join(array_sort(split(regexp_replace(lower(trim(col("text"))), " +", " "), " ")), " ")).as("ch"))
    canon.groupBy(col("ch"))
      .agg(countDistinct(col("doc_id")).as("n_members"),
        min(col("doc_id")).as("canonical_id"), max(col("doc_id")).as("dup_id"))
      .filter(col("n_members") > 1)
      .psort(col("canonical_id"))
  }

  private val d09Sql =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000,
      |    UPPER(ARRAY_TO_STRING(LIST_REVERSE(STRING_SPLIT(text, ' ')), '  ')) || '  '
      |  FROM documents WHERE doc_id % 5 = 0),
      |canon AS (
      |  SELECT doc_id,
      |    MD5(ARRAY_TO_STRING(LIST_SORT(STRING_SPLIT(
      |      REGEXP_REPLACE(LOWER(TRIM(text)), ' +', ' ', 'g'), ' ')), ' ')) AS ch
      |  FROM corpus)
      |SELECT ch, COUNT(DISTINCT doc_id) AS n_members,
      | MIN(doc_id) AS canonical_id, MAX(doc_id) AS dup_id
      |FROM canon GROUP BY ch HAVING COUNT(DISTINCT doc_id) > 1
      |ORDER BY canonical_id""".stripMargin

  /** d10: incremental dedup — the production shape at 100 TB: a NEW crawl
    * shard (doc_id % 10 == 7 stands in for "today's batch") is deduplicated
    * AGAINST the already-ingested corpus without ever re-deduplicating the
    * corpus itself. Two tiers, both keyed off persisted build-once indexes:
    *   - exact: canonical content hash (d01's normalization) — the corpus
    *     hash index is the big side, the incoming batch BROADCASTS onto it;
    *   - near: minhash band keys from the SAME persisted signature index
    *     d03 serves from; incoming band keys broadcast, candidates verified
    *     by exact jaccard >= 0.8, best match per new doc (highest jaccard,
    *     lowest old id).
    * No corpus-vs-corpus join anywhere: every join is bounded-batch vs
    * corpus, so the incremental cost is O(batch + touched postings), not
    * O(corpus). */
  private val d10: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val d = t(s, dir, "documents")
    val isNew = col("doc_id") % 10 === 7
    val norm = md5(regexp_replace(lower(col("text")), " +", " "))
    val newH = d.filter(isNew).select(col("doc_id").as("nid"), norm.as("h"))
    val oldH = d.filter(!isNew).select(col("doc_id").as("oid"), norm.as("h"))
    val exact = oldH.join(broadcast(newH), Seq("h"))
      .groupBy(col("nid")).agg(min(col("oid")).as("exact_match"))
    val sig = minhashSig(s, dir)
    def bands(df: DataFrame, idAs: String) = df
      .select(col("doc_id").as(idAs),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("band"),
            concat_ws("_", col(s"m${2 * b}"), col(s"m${2 * b + 1}")).as("key"))
        }: _*)).as("bk"))
      .select(col(idAs), col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = bands(sig.filter(!isNew), "oid")
      .join(broadcast(bands(sig.filter(isNew), "nid")), Seq("band", "key"))
      .select(col("nid"), col("oid")).distinct()
    val sh = docsWithShingles(s, dir)
    val near = cand
      .join(sh.select(col("doc_id").as("nid"), col("sh").as("sh1")), Seq("nid"))
      .join(sh.select(col("doc_id").as("oid"), col("sh").as("sh2")), Seq("oid"))
      .select(col("nid"), col("oid"), jaccardCol.as("jaccard"))
      .filter(col("jaccard") >= 0.8)
    val wN = Window.partitionBy(col("nid")).orderBy(col("jaccard").desc, col("oid"))
    val nearBest = near.withColumn("rn", row_number().over(wN))
      .filter(col("rn") === 1)
      .select(col("nid"), col("oid").as("near_match"), col("jaccard"))
    d.filter(isNew).select(col("doc_id").as("nid"))
      .join(exact, Seq("nid"), "left")
      .join(nearBest, Seq("nid"), "left")
      .select(col("nid").as("doc_id"),
        when(col("exact_match").isNotNull, "exact_dup")
          .when(col("near_match").isNotNull, "near_dup")
          .otherwise("unique").as("verdict"),
        coalesce(col("exact_match"), col("near_match")).as("matched_id"),
        when(col("exact_match").isNull && col("near_match").isNotNull,
          round(col("jaccard"), 6)).as("jaccard"))
      .psort(col("doc_id"))
  }

  private val d10Sql = {
    val sigCols = (0 until 8).map(i => s"${minhashSql(i)} AS m$i").mkString(",\n   ")
    val bandRows = (0 until 4).map { b =>
      s"SELECT doc_id, $b AS band, m${2 * b} || '_' || m${2 * b + 1} AS key FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH docs AS ($docsShSql),
       |sig AS (SELECT doc_id, sh,
       |   $sigCols
       |  FROM docs),
       |bands AS (
       |  $bandRows),
       |cand AS (
       |  SELECT DISTINCT n.doc_id AS nid, o.doc_id AS oid
       |  FROM bands o JOIN bands n ON o.band = n.band AND o.key = n.key
       |  WHERE n.doc_id % 10 = 7 AND o.doc_id % 10 <> 7),
       |near AS (
       |  SELECT nid, oid,
       |    $jaccardSql AS jaccard
       |  FROM cand
       |  JOIN docs s1 ON nid = s1.doc_id
       |  JOIN docs s2 ON oid = s2.doc_id),
       |nearbest AS (
       |  SELECT nid, oid AS near_match, jaccard FROM (
       |    SELECT nid, oid, jaccard,
       |      ROW_NUMBER() OVER (PARTITION BY nid ORDER BY jaccard DESC, oid) AS rn
       |    FROM near WHERE jaccard >= 0.8) WHERE rn = 1),
       |newh AS (
       |  SELECT doc_id AS nid, MD5(REGEXP_REPLACE(LOWER(text), ' +', ' ', 'g')) AS h
       |  FROM documents WHERE doc_id % 10 = 7),
       |oldh AS (
       |  SELECT doc_id AS oid, MD5(REGEXP_REPLACE(LOWER(text), ' +', ' ', 'g')) AS h
       |  FROM documents WHERE doc_id % 10 <> 7),
       |exact AS (
       |  SELECT nid, MIN(oid) AS exact_match FROM newh JOIN oldh USING (h)
       |  GROUP BY nid)
       |SELECT n.doc_id,
       | CASE WHEN e.exact_match IS NOT NULL THEN 'exact_dup'
       |      WHEN b.near_match IS NOT NULL THEN 'near_dup'
       |      ELSE 'unique' END AS verdict,
       | COALESCE(e.exact_match, b.near_match) AS matched_id,
       | CASE WHEN e.exact_match IS NULL AND b.near_match IS NOT NULL
       |      THEN ROUND(b.jaccard, 6) END AS jaccard
       |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 7) n
       |LEFT JOIN exact e ON n.doc_id = e.nid
       |LEFT JOIN nearbest b ON n.doc_id = b.nid
       |ORDER BY n.doc_id""".stripMargin
  }

  /** d11: SemDeDup — semantic (embedding-space) near-duplicate removal:
    * k-means-cluster the corpus embeddings, then compare pairs ONLY within
    * a cluster and drop every vector whose cosine to an earlier (lower-id)
    * cluster-mate exceeds the threshold, keeping that earliest vector as
    * the representative.
    *
    * Reuses the SAME trained IVF quantizer s04/s08 serve from (build-once
    * index lifecycle; bit-reproducible fixed-point Lloyd, so the DuckDB
    * oracle replays the identical clustering). Scale: cluster count grows
    * ∝ N keeping cell size bounded, so the within-cell pair count is
    * Σ|cell|² ≪ N² and the plan is a cell equi-join (no cartesian) — the
    * published SemDeDup recipe, which this mirrors independently in Spark
    * terms. Output: one row per DROPPED vector with its kept anchor. */
  private val d11: Q = (s, dir) => {
    val (_, assigned) = graft.queries.Similarity.trainedIvf(s, dir)
    // Round-10 duplicate collapse (the d34/x51 discipline, caught by the
    // first full-suite sf10 run: the doc-level spelling was 111 s —
    // quadratic in the copy count because a 100x-replicated corpus has
    // 10000x within-cell pairs). Cosine is a CONTENT function, so the
    // quadratic stage runs once per distinct (cell, embedding) pair and
    // the per-vec answer reconstructs exactly from copy-id order
    // statistics: for target copy v of content b and anchor content a,
    // the anchors below v are `filter(ids(a), x -> x < v)` — count,
    // min, and the pair's cosine are all content-level facts. Copy-id
    // arrays are bounded by the max duplication of one content (the
    // same boundedness d34's collapse rides).
    val grp = assigned.groupBy(col("cell"), col("embedding"))
      .agg(sort_array(collect_list(col("vec_id"))).as("ids"))
    val a = grp.select(col("cell"), col("embedding").as("ae"),
      col("ids").as("aids"))
    val b = grp.select(col("cell"), col("embedding").as("be"),
      col("ids").as("bids"))
    // no ordering constraint: anchors flow BOTH directions between
    // content pairs, and the diagonal row (a == b) carries co-copy
    // anchors; the identical-array cosine is the identical IEEE fold in
    // both engines, so no special-casing
    a.join(b, Seq("cell"))
      .select(col("cell"), col("aids"), col("bids"),
        expr(cosineExpr("ae", "be")).as("cos"))
      .filter(col("cos") >= 0.35)
      .select(col("cell"), col("cos"), col("aids"),
        explode(col("bids")).as("vec_id"))
      .withColumn("below", filter(col("aids"), x => x < col("vec_id")))
      .filter(size(col("below")) > 0)
      .groupBy(col("cell"), col("vec_id"))
      .agg(min(array_min(col("below"))).as("kept_anchor"),
        sum(size(col("below")).cast("long")).as("n_anchors"),
        round(max(col("cos")), 6).as("max_cos"))
      .psort(col("vec_id"))
  }

  private val d11Sql =
    s"""${graft.queries.Similarity.ivfCtePrefix},
       |pairs AS (
       |  SELECT a.cell, a.cid AS anchor, b.cid AS vec_id,
       |    ${cosineSql("a.ce", "b.ce")} AS cos
       |  FROM assignF a JOIN assignF b ON a.cell = b.cell AND a.cid < b.cid)
       |SELECT cell, vec_id, MIN(anchor) AS kept_anchor,
       | COUNT(*) AS n_anchors, ROUND(MAX(cos), 6) AS max_cos
       |FROM pairs WHERE cos >= 0.35
       |GROUP BY cell, vec_id ORDER BY vec_id""".stripMargin

  /** d12: content-defined chunking (CDC) dedup — the rsync/CAS-store shape:
    * chunk boundaries come from a rolling hash over the CONTENT (8-point
    * window, cut when hash % 64 == 0), so an insertion near the start of a
    * document shifts only the chunks it touches and the chunker
    * re-synchronizes — unlike d08's fixed 10-word chunks, where one
    * inserted word shifts every downstream chunk. Per doc: total chunks
    * and how many are shared with at least one other document.
    *
    * Scale: chunking is map-only (one native scan per doc); chunk
    * doc-frequency is one shuffle on the chunk hash; the join back is
    * hash-partitioned on the same key. The 100 TB deployment stores
    * (chunk_hash -> refcount) as the content-addressed index and this
    * query is its build. */
  private val d12: Q = (s, dir) => {
    val ch = t(s, dir, "documents")
      .select(col("doc_id"), explode(expr("graft_cdc_chunks(text)")).as("c"))
      .select(col("doc_id"), md5(col("c")).as("h"))
    val byHash = ch.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("ndocs"))
    ch.join(byHash, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        (col("n_dup_chunks").cast("double") / col("n_chunks").cast("double"))
          .as("dup_frac"))
      .psort(col("doc_id"))
  }

  private val d12Sql = {
    val win = "cps[i]*31 + cps[i-1]*37 + cps[i-2]*41 + cps[i-3]*43 " +
      "+ cps[i-4]*47 + cps[i-5]*53 + cps[i-6]*59 + cps[i-7]*61"
    s"""WITH cp AS MATERIALIZED (
       |  SELECT doc_id, text,
       |    -- (?s): RE2 '.' stops at newlines; the Scala side scans raw code
       |    -- points, so an unguarded '.' drops newline-containing docs
       |    [UNICODE(x) FOR x IN REGEXP_EXTRACT_ALL(text, '(?s).')] AS cps
       |  FROM documents),
       |b AS (
       |  SELECT doc_id, text, LEN(cps) AS n,
       |    [i FOR i IN RANGE(8, LEN(cps) + 1) IF ($win) % 64 = 0] AS bounds
       |  FROM cp),
       |cut AS (
       |  SELECT doc_id, text, LIST_PREPEND(0,
       |    CASE WHEN LEN(bounds) = 0 OR bounds[-1] <> n
       |         THEN LIST_APPEND(bounds, n) ELSE bounds END) AS cuts
       |  FROM b),
       |chunks AS MATERIALIZED (
       |  SELECT doc_id, MD5(c) AS h FROM (
       |    SELECT doc_id,
       |      -- guard zero-length cuts: an empty document yields cuts=[0,0]
       |      -- and would emit one empty chunk where Spark emits none
       |      UNNEST([SUBSTR(text, cuts[j] + 1, cuts[j + 1] - cuts[j])
       |        FOR j IN RANGE(1, LEN(cuts)) IF cuts[j + 1] > cuts[j]]) AS c
       |    FROM cut)),
       |byh AS (SELECT h, COUNT(DISTINCT doc_id) AS ndocs FROM chunks GROUP BY h),
       |agg AS (
       |  SELECT c.doc_id, COUNT(*) AS n_chunks,
       |    CAST(SUM(CASE WHEN byh.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_dup_chunks
       |  FROM chunks c JOIN byh USING (h) GROUP BY c.doc_id)
       |SELECT doc_id, n_chunks, n_dup_chunks,
       | n_dup_chunks::DOUBLE / n_chunks::DOUBLE AS dup_frac
       |FROM agg ORDER BY doc_id""".stripMargin
  }

  /** d13: containment (asymmetric Jaccard) dedup — catches doc-in-doc
    * duplication that symmetric Jaccard misses: a short document fully
    * embedded in a long one has jaccard |A∩B|/|A∪B| ≈ |A|/|B| (small) but
    * containment |A∩B|/min(|A|,|B|) = 1. The quote-inclusion / boilerplate
    * -wrapper case in a training corpus. Reference semantics: the same
    * shingle space as d02; reported per ordered pair (d1 < d2) with BOTH
    * directed containments so the policy layer can pick which side to drop.
    *
    * Scale: identical shape to d02 — the SAME persisted shingle index and
    * df-capped inverted postings feed candidate pairs (no self-join), one
    * shuffle on the shingle, one on the pair. Containment needs no new
    * per-pair state beyond the common count d02 already aggregates, so at
    * 100 TB this rides the d02 pipeline for free (one pipeline, two
    * policies). */
  private val d13: Q = (s, dir) => {
    val docs = docsWithShingles(s, dir)
    val cand = shinglePairCounts(s, dir)
    val sizes = docs.select(col("doc_id"), col("n"))
    cand
      .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
      .select(col("d1"), col("d2"), col("common"),
        (col("common").cast("double") / col("s1.n").cast("double")).as("c1"),
        (col("common").cast("double") / col("s2.n").cast("double")).as("c2"))
      .filter(greatest(col("c1"), col("c2")) >= 0.9)
      .select(col("d1"), col("d2"), col("common"),
        round(col("c1"), 6).as("contain_1in2"),
        round(col("c2"), 6).as("contain_2in1"))
      .psortScaled(col("d1"), col("d2"))
  }

  private val d13Sql =
    s"""WITH docs AS ($docsShSql),
       |ex AS (SELECT doc_id, UNNEST(sh) AS s FROM docs),
       |rare AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) <= 100),
       |exr AS (SELECT ex.doc_id, ex.s FROM ex JOIN rare USING (s)),
       |cand AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
       |  FROM exr a JOIN exr b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, LEN(sh) AS n FROM docs),
       |scored AS (
       |  SELECT d1, d2, common,
       |         common::DOUBLE / s1.n::DOUBLE AS c1,
       |         common::DOUBLE / s2.n::DOUBLE AS c2
       |  FROM cand
       |  JOIN sizes s1 ON d1 = s1.doc_id
       |  JOIN sizes s2 ON d2 = s2.doc_id)
       |SELECT d1, d2, common,
       |       ROUND(c1, 6) AS contain_1in2, ROUND(c2, 6) AS contain_2in1
       |FROM scored WHERE GREATEST(c1, c2) >= 0.9
       |ORDER BY d1, d2""".stripMargin

  // ---- d14: winnowing substring fingerprints (k=8 char grams, window w=4)
  // Guarantee (Schleimer/Wilkerson/Aiken local fingerprinting): any shared
  // substring of length >= w + k - 1 = 11 chars produces at least one shared
  // selected fingerprint, and no substring shorter than k can collide —
  // substring-level dup detection with a bounded fingerprint density of
  // ~2/(w+1) per character, independent of document length.
  private val winK = 8
  private val winW = 4

  /** d14: winnowing substring-fingerprint dedup — MOSS-style local
    * fingerprinting for partial-overlap detection (shared paragraphs,
    * quoted spans) below d02's whole-document shingle granularity. Each
    * doc's char-8-gram hashes are reduced to window-minima fingerprints;
    * docs sharing fingerprints are candidates, scored by the shared
    * fraction of the smaller fingerprint set.
    *
    * Scale: fingerprinting is map-only (fused per-doc scan); the selected
    * set is ~2/(w+1) of positions, so the exploded index is ~0.4x corpus
    * characters; candidates come from the df-capped inverted postings
    * exactly like d02/d13 — one shuffle on the fingerprint, one on the
    * pair, never an O(n²) self-join. */
  /** Winnowed corpus: doc_id, fps (distinct window-min fingerprints), nf.
    * Same lifecycle as [[docsWithShingles]]: spread the 1-file scan to full
    * parallelism BEFORE the per-character fingerprint scan, compute the
    * fingerprints ONCE through the fused native expression, persist. (The
    * composable transform/slice spelling of the same contract is quadratic
    * in doc length under interpreted eval and gets re-evaluated beneath
    * pushed-down filters — first cut cost ~10 CPU-minutes/pass at sf0.1,
    * the native fused scan costs milliseconds.) */
  private def docsWithWinnow(s: SparkSession, dir: String): DataFrame =
    memoized(s"winnow:$dir")(
      t(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(length(col("text")) >= winK + winW - 1)
        .select(col("doc_id"),
          expr(s"graft_winnow(text, $winK, $winW, $P)").as("fps"))
        .select(col("doc_id"), col("fps"), size(col("fps")).as("nf"))
        .persist(StorageLevel.MEMORY_AND_DISK))

  private val d14: Q = (s, dir) => {
    val docs = docsWithWinnow(s, dir)
    val postings = docs.select(col("doc_id"), explode(col("fps")).as("f"))
      .repartition(s.sparkContext.defaultParallelism, col("f"))
      .groupBy(col("f")).agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")).between(2, 100))
    val cand = postings
      .select(explode(expr(pairsFromPostings)).as("p"))
      .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .agg(count(lit(1)).as("shared"))
    val sizes = docs.select(col("doc_id"), col("nf"))
    cand
      .join(sizes.as("f1"), col("d1") === col("f1.doc_id"))
      .join(sizes.as("f2"), col("d2") === col("f2.doc_id"))
      .select(col("d1"), col("d2"), col("shared"),
        round(col("shared").cast("double") /
          least(col("f1.nf"), col("f2.nf")).cast("double"), 6).as("overlap"))
      .filter(col("overlap") >= 0.5)
      .psortScaled(col("d1"), col("d2"))
  }

  private val d14Sql = {
    val hvSql =
      s"[${md5iSql(s"SUBSTR(text, i, $winK)")} % $P FOR i IN RANGE(1, LEN(text) - ${winK - 2})]"
    s"""WITH hv AS MATERIALIZED (
       |  SELECT doc_id, $hvSql AS hv
       |  FROM documents WHERE LEN(text) >= ${winK + winW - 1}),
       |fps AS MATERIALIZED (
       |  SELECT doc_id,
       |    LIST_DISTINCT([LIST_MIN(hv[t:t + ${winW - 1}])
       |      FOR t IN RANGE(1, LEN(hv) - ${winW - 2})]) AS fps
       |  FROM hv),
       |ex AS (SELECT doc_id, UNNEST(fps) AS f FROM fps),
       |rare AS (SELECT f FROM ex GROUP BY f HAVING COUNT(*) <= 100),
       |exr AS (SELECT ex.doc_id, ex.f FROM ex JOIN rare USING (f)),
       |cand AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS shared
       |  FROM exr a JOIN exr b ON a.f = b.f AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, LEN(fps) AS nf FROM fps),
       |scored AS (
       |  SELECT d1, d2, shared,
       |    ROUND(shared::DOUBLE / LEAST(s1.nf, s2.nf)::DOUBLE, 6) AS overlap
       |  FROM cand
       |  JOIN sizes s1 ON d1 = s1.doc_id
       |  JOIN sizes s2 ON d2 = s2.doc_id)
       |SELECT d1, d2, shared, overlap FROM scored
       |WHERE overlap >= 0.5 ORDER BY d1, d2""".stripMargin
  }

  /** d16: bloom-prefilter incremental dedup — d10's batch-vs-corpus shape
    * with the other broadcast direction: instead of broadcasting the batch's
    * HASH SET into a join against every corpus row, the driver builds a
    * Bloom filter over the batch's canonical-hash keys (kilobytes,
    * independent of corpus size; `df.stat.bloomFilter` tree-aggregates it
    * without collecting keys) and the corpus scan probes it through the
    * native `graft_bloom_contains` expression BEFORE any join. Surviving
    * rows (true matches + ~fpp false positives) feed the exact
    * broadcast-join confirm, so the output is exact — the bloom can only
    * admit extra candidates, never drop one.
    *
    * Scale: at 100 TB the corpus side never shuffles — the filter is a
    * plan literal riding the broadcast of the tiny batch, the scan drops
    * ~99% of rows at the source, and the confirm join touches only
    * candidates. This is the standard "yesterday's index too big to join,
    * bloom it" crawl-ingest pattern.
    *
    * The raw corpus has no exact cross-partition twins, so the query PLANTS
    * them (d09's convention): every batch doc with doc_id % 20 == 3 gets a
    * corpus twin at doc_id + 2,000,000 that differs only by case/whitespace
    * — the canonicalization must collapse exactly those pairs. */
  private val d16: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    val isNew = col("doc_id") % 10 === 3
    def canon(c: Column) =
      md5(regexp_replace(lower(trim(c)), " +", " "))
    val batch = d.filter(isNew)
      .select(col("doc_id").as("nid"), canon(col("text")).as("h"))
      .withColumn("hl", conv(substring(col("h"), 1, 8), 16, 10).cast("long"))
    val planted = d.filter(col("doc_id") % 20 === 3)
      .select((col("doc_id") + 2000000L).as("oid"),
        concat(upper(col("text")), lit("  ")).as("text"))
    val corpus = d.filter(!isNew).select(col("doc_id").as("oid"), col("text"))
      .unionAll(planted)
      .select(col("oid"), canon(col("text")).as("h"))
      .withColumn("hl", conv(substring(col("h"), 1, 8), 16, 10).cast("long"))
    // driver-held filter over the bounded batch; ~1.2 KB per 1k keys at 1% fpp
    val bf = batch.stat.bloomFilter("hl", math.max(batch.count(), 1L), 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val b64 = Dedup.bloomPlanLiteral(bos.toByteArray)
    val candidates = corpus
      .filter(expr(s"graft_bloom_contains(unbase64('$b64'), hl)"))
    // candidates ~ true matches + fpp·corpus — small, so the confirm join
    // broadcasts THEM back onto the batch (the left side of a left-outer
    // join cannot be the broadcast side)
    batch.select(col("nid"), col("h"))
      .join(broadcast(candidates.select(col("oid"), col("h"))), Seq("h"), "left")
      .groupBy(col("nid"))
      .agg(min(col("oid")).as("first_dup_of"), count(col("oid")).as("n_dups"))
      .psort(col("nid"))
  }

  private val d16Sql =
    """WITH batch AS (
      |  SELECT doc_id AS nid,
      |    MD5(REGEXP_REPLACE(LOWER(TRIM(text)), ' +', ' ', 'g')) AS h
      |  FROM documents WHERE doc_id % 10 = 3),
      |corpus AS (
      |  SELECT doc_id AS oid, text FROM documents WHERE doc_id % 10 <> 3
      |  UNION ALL
      |  SELECT doc_id + 2000000, UPPER(text) || '  '
      |  FROM documents WHERE doc_id % 20 = 3),
      |ch AS (
      |  SELECT oid,
      |    MD5(REGEXP_REPLACE(LOWER(TRIM(text)), ' +', ' ', 'g')) AS h
      |  FROM corpus)
      |SELECT nid, MIN(oid) AS first_dup_of,
      |  COUNT(oid) AS n_dups
      |FROM batch LEFT JOIN ch USING (h)
      |GROUP BY nid ORDER BY nid""".stripMargin

  // ---- d17: exact repeated-span dedup (suffix-span removal) ---------------
  // Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
  // Better") removes exact substrings >= k tokens repeated across documents.
  // The suffix-array construction is single-machine; the distributed
  // spelling here goes candidate-pairs -> seed k-grams -> diagonal runs:
  private val spanK = 40 // chars: minimum exact span worth removing
  private val spanMinShared = 8 // winnow fps a pair must share to qualify

  /** d17: exact repeated-span detection + removal accounting. Pipeline:
    *
    *  1. CANDIDATE PAIRS ride d14's persisted winnowing pass
    *     ([[docsWithWinnow]] — no new corpus-scale pass): a span of S chars
    *     shares >= floor((S-k_w+1)/w) window-min fingerprints, so pairs
    *     sharing >= 8 distinct fps cover every span >= ~40 chars (modulo
    *     repeated-text min collisions, identically in both engines); the
    *     planted twins (below) winnow only their own bounded frame.
    *  2. SEEDS: exact 40-char grams (graft_char_grams, one linear scan) at
    *     every position of CANDIDATE docs only — the explode is bounded by
    *     the candidate set, never the corpus. Seeds join on the literal
    *     gram text, so spans are EXACT (no hash false positives).
    *  3. SPANS: seeds merge along diagonals (p1 - p2): consecutive
    *     positions on one diagonal are one maximal span of run + k - 1
    *     chars — the standard seed-and-extend, as GROUP BY arithmetic.
    *     The run window partitions by (pair, diagonal) — bounded, never
    *     global.
    *
    * The corpus has no natural 40-char cross-doc spans, so the query PLANTS
    * them (d09/d16's convention): every doc with doc_id % 25 == 7 and
    * >= 130 chars gets a twin at doc_id + 3,000,000 embedding chars
    * [5, 124] of the original between twin-only guard text — the reported
    * spans must recover exactly those 120-char slices. Accounting per pair:
    * span count, longest span, removable chars (sum of maximal span
    * lengths, the chars Lee et al. would cut). */
  /** Planted-twin corpus for d17 (bounded: corpus/25 extra docs). */
  private def spanCorpus(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val d = t(s, dir, "documents")
    val planted = d.filter(col("doc_id") % 25 === 7 && length(col("text")) >= 130)
      .select((col("doc_id") + 3000000L).as("doc_id"),
        concat(lit("planted span guard <<"), substring(col("text"), 5, 120),
          lit(">> end guard")).as("text"))
    (d.select(col("doc_id"), col("text")).unionAll(planted), planted)
  }

  /** d17's candidate-pair index (pairs sharing >= spanMinShared winnow fps)
    * — built ONCE per corpus snapshot and persisted, the d02/d13 shared-
    * pass lifecycle: the postings aggregation is the corpus-scale step, and
    * a production pipeline materializes this index once, then serves every
    * span query from it. Base-corpus fingerprints come from d14's persisted
    * winnow pass; only the bounded planted frame winnows fresh. */
  private def spanPairs(s: SparkSession, dir: String): DataFrame =
    memoized(s"spanpairs:$dir") {
      val (_, planted) = spanCorpus(s, dir)
      val fps = docsWithWinnow(s, dir).select(col("doc_id"), col("fps"))
        .unionAll(planted
          .filter(length(col("text")) >= winK + winW - 1)
          .select(col("doc_id"),
            expr(s"graft_winnow(text, $winK, $winW, $P)").as("fps")))
      fps.select(col("doc_id"), explode(col("fps")).as("f"))
        .repartition(s.sparkContext.defaultParallelism, col("f"))
        .groupBy(col("f")).agg(sort_array(collect_list(col("doc_id"))).as("ds"))
        .filter(size(col("ds")).between(2, 100))
        .select(explode(expr(pairsFromPostings)).as("p"))
        .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= spanMinShared)
        .select(col("d1"), col("d2"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

  /** Positioned exact 40-char grams for d17's CANDIDATE docs only (the
    * explode is bounded by the candidate set, never the corpus); persisted
    * with the pair index it derives from. */
  private def spanGrams(s: SparkSession, dir: String): DataFrame =
    memoized(s"spangrams:$dir") {
      val (corpus, _) = spanCorpus(s, dir)
      val pairs = spanPairs(s, dir)
      val candDocs = pairs.select(col("d1").as("doc_id"))
        .unionAll(pairs.select(col("d2").as("doc_id"))).distinct()
      corpus.join(candDocs, Seq("doc_id"), "left_semi")
        .filter(length(col("text")) >= spanK)
        .select(col("doc_id"),
          posexplode(expr(s"graft_char_grams(text, $spanK)")).as(Seq("p", "g")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

  private val d17: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val pairs = spanPairs(s, dir)
    val grams = spanGrams(s, dir)
    val seeds = pairs
      .join(grams.select(col("doc_id").as("d1"), col("p").as("p1"), col("g")),
        Seq("d1"))
      .join(grams.select(col("doc_id").as("d2"), col("p").as("p2"), col("g")),
        Seq("d2", "g"))
    // 3. diagonal runs -> maximal spans -> per-pair accounting
    val wRun = Window.partitionBy(col("d1"), col("d2"), col("diag"))
      .orderBy(col("p1"))
    seeds
      .withColumn("diag", col("p1") - col("p2"))
      .withColumn("rid", col("p1") - row_number().over(wRun))
      .groupBy(col("d1"), col("d2"), col("diag"), col("rid"))
      .agg((count(lit(1)) + spanK - 1).as("span_len"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("n_spans"),
        max(col("span_len")).as("max_span"),
        sum(col("span_len")).as("removed_chars"))
      .psortScaled(col("d1"), col("d2"))
  }

  private val d17Sql = {
    val hvSql =
      s"[${md5iSql(s"SUBSTR(text, i, $winK)")} % $P FOR i IN RANGE(1, LEN(text) - ${winK - 2})]"
    s"""WITH corpus AS MATERIALIZED (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 3000000,
       |    'planted span guard <<' || SUBSTR(text, 5, 120) || '>> end guard'
       |  FROM documents WHERE doc_id % 25 = 7 AND LEN(text) >= 130),
       |hv AS MATERIALIZED (
       |  SELECT doc_id, $hvSql AS hv
       |  FROM corpus WHERE LEN(text) >= ${winK + winW - 1}),
       |fps AS MATERIALIZED (
       |  SELECT doc_id,
       |    LIST_DISTINCT([LIST_MIN(hv[t:t + ${winW - 1}])
       |      FOR t IN RANGE(1, LEN(hv) - ${winW - 2})]) AS fps
       |  FROM hv),
       |ex AS (SELECT doc_id, UNNEST(fps) AS f FROM fps),
       |rare AS (SELECT f FROM ex GROUP BY f HAVING COUNT(*) BETWEEN 2 AND 100),
       |exr AS (SELECT ex.doc_id, ex.f FROM ex JOIN rare USING (f)),
       |pairs AS MATERIALIZED (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2
       |  FROM exr a JOIN exr b ON a.f = b.f AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $spanMinShared),
       |cd AS (SELECT d1 AS doc_id FROM pairs
       |       UNION SELECT d2 FROM pairs),
       |grams AS MATERIALIZED (
       |  SELECT c.doc_id, UNNEST(RANGE(1, LEN(text) - $spanK + 2)) AS p,
       |    UNNEST([SUBSTR(text, i, $spanK)
       |      FOR i IN RANGE(1, LEN(text) - $spanK + 2)]) AS g
       |  FROM corpus c JOIN cd USING (doc_id) WHERE LEN(text) >= $spanK),
       |seeds AS (
       |  SELECT pr.d1, pr.d2, g1.p AS p1, g2.p AS p2
       |  FROM pairs pr
       |  JOIN grams g1 ON g1.doc_id = pr.d1
       |  JOIN grams g2 ON g2.doc_id = pr.d2 AND g2.g = g1.g),
       |runs AS (
       |  SELECT d1, d2, p1 - p2 AS diag,
       |    p1 - ROW_NUMBER() OVER (PARTITION BY d1, d2, p1 - p2 ORDER BY p1)
       |      AS rid
       |  FROM seeds),
       |spans AS (
       |  SELECT d1, d2, COUNT(*) + $spanK - 1 AS span_len
       |  FROM runs GROUP BY d1, d2, diag, rid)
       |SELECT d1, d2, COUNT(*) AS n_spans, MAX(span_len) AS max_span,
       |  CAST(SUM(span_len) AS BIGINT) AS removed_chars
       |FROM spans GROUP BY d1, d2 ORDER BY d1, d2""".stripMargin
  }

  /** d18: prototypicality pruning — the "D4" curation step (Tirumala et
    * al. 2023 granularity: SemDeDup first, then prune cluster prototypes):
    * after near-duplicate removal (d11), the remaining redundancy is the
    * dense CORE of each semantic cluster — vectors closest to their
    * centroid carry the least marginal information — so the most
    * prototypical 30% of every k-means cell is dropped. Reuses the SAME
    * trained fixed-point IVF quantizer d11/s04/s08 serve from (build-once
    * index lifecycle; bit-reproducible Lloyd, so the DuckDB oracle replays
    * the identical clustering).
    *
    * Scale: cosine-to-centroid is map-only (the k centroids broadcast);
    * ranking runs in CELL-partitioned windows (k grows ∝ corpus so cell
    * size stays bounded — the d11 argument; never a global window); the
    * drop count is exact integer arithmetic ((n*3) div 10 — no float
    * threshold to diverge on). Output: one row per DROPPED vector with its
    * rank and cell occupancy. */
  private val d18: Q = (s, dir) => {
    val (centroids, assigned) = Similarity.trainedIvf(s, dir)
    import s.implicits._
    val cdf = broadcast(centroids.toSeq.map(c => (c.cell, c.vec.toSeq))
      .toDF("cell", "cvec"))
    val scored = assigned.join(cdf, Seq("cell"))
      .select(col("cell"), col("vec_id"),
        expr(cosineExpr("embedding", "cvec")).as("pc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cell")).orderBy(col("pc").desc, col("vec_id"))
    val cw = org.apache.spark.sql.expressions.Window.partitionBy(col("cell"))
    scored.withColumn("proto_rank", row_number().over(w))
      .withColumn("n_members", count(lit(1)).over(cw))
      .filter(col("proto_rank") <= expr("(n_members * 3) div 10"))
      .select(col("cell"), col("vec_id"), col("proto_rank"),
        round(col("pc"), 6).as("cos_centroid"), col("n_members"),
        expr("(n_members * 3) div 10").as("n_drop"))
      .psort(col("vec_id"))
  }

  private val d18Sql =
    s"""${Similarity.ivfCtePrefix},
       |pc AS (
       |  SELECT a.cell, a.cid AS vec_id, ${cosineSql("a.ce", "c.vec")} AS pc
       |  FROM assignF a JOIN ${Similarity.ivfFinalCentsCte} c ON a.cell = c.cell),
       |ranked AS (
       |  SELECT cell, vec_id, pc,
       |    ROW_NUMBER() OVER (PARTITION BY cell ORDER BY pc DESC, vec_id) AS proto_rank,
       |    COUNT(*) OVER (PARTITION BY cell) AS n_members
       |  FROM pc)
       |SELECT cell, vec_id, proto_rank, ROUND(pc, 6) AS cos_centroid,
       | n_members, (n_members * 3) // 10 AS n_drop
       |FROM ranked WHERE proto_rank <= (n_members * 3) // 10
       |ORDER BY vec_id""".stripMargin

  /** d19: soft dedup — downweight, don't delete (the Muennighoff et al.
    * 2023 finding operationalized: moderate repetition is better spent than
    * discarded, so production mixers keep every near-dup cluster member and
    * sample it at weight 1/cluster_size instead of dropping to one copy).
    * Cluster sizes come from the SAME persisted d07 component labels
    * (min-label connected components over verified jaccard>=0.8 edges);
    * singletons weigh 1.0. Output: the per-source mixture ledger — docs,
    * clustered docs, exact char mass before/after weighting (integer ppm),
    * and the effective weight the downweighting leaves on the source.
    *
    * Scale: the label table is bounded (cluster membership << corpus) and
    * broadcasts onto the corpus scan; cluster sizes are one aggregation of
    * the label table itself; the report is O(sources). The corpus is
    * touched once, map-only. */
  private val d19: Q = (s, dir) => {
    val labels = d07Labels(s, dir).select(col("id").as("doc_id"), col("lbl"))
    val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("csize"))
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .join(broadcast(labels), Seq("doc_id"), "left")
      .join(broadcast(sizes), Seq("lbl"), "left")
      .select(col("source"), col("n_chars"),
        coalesce(col("csize"), lit(1L)).as("csize"))
      .withColumn("weight_ppm", expr("1000000 div csize"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("csize") > 1, 1L).otherwise(0L)).as("n_clustered"),
        sum(col("n_chars")).as("chars_total"),
        sum(col("n_chars") * col("weight_ppm")).as("chars_weighted_ppm"))
      .select(col("source"), col("n_docs"), col("n_clustered"),
        col("chars_total"), col("chars_weighted_ppm"),
        (col("chars_weighted_ppm").cast("double") /
          (col("chars_total").cast("double") * 1000000.0)).as("eff_weight"))
      .psort(col("source"))
  }

  private val d19Sql =
    s"""WITH RECURSIVE $minhashCandCtes,
       |$verifiedPairCtes,
       |bidir AS (SELECT d1 AS id, d2 AS nb FROM edges
       |          UNION ALL SELECT d2, d1 FROM edges),
       |walk(id, lbl) AS (
       |  SELECT DISTINCT id, id FROM bidir
       |  UNION
       |  SELECT b.nb, w.lbl FROM walk w JOIN bidir b ON b.id = w.id),
       |labels AS (SELECT id AS doc_id, MIN(lbl) AS lbl FROM walk GROUP BY id),
       |sizes AS (SELECT lbl, COUNT(*) AS csize FROM labels GROUP BY lbl),
       |wtd AS (
       |  SELECT d.source, d.n_chars, COALESCE(sz.csize, 1) AS csize
       |  FROM documents d
       |  LEFT JOIN labels l ON d.doc_id = l.doc_id
       |  LEFT JOIN sizes sz ON l.lbl = sz.lbl)
       |SELECT source, COUNT(*) AS n_docs,
       | CAST(SUM(CASE WHEN csize > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_clustered,
       | CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       | CAST(SUM(n_chars * (1000000 // csize)) AS BIGINT) AS chars_weighted_ppm,
       | CAST(SUM(n_chars * (1000000 // csize)) AS DOUBLE) /
       |   (CAST(SUM(n_chars) AS DOUBLE) * 1000000.0) AS eff_weight
       |FROM wtd GROUP BY source ORDER BY source""".stripMargin

  /** d20: edit-distance-verified fuzzy dedup — the verify stage of a
    * candidate→verify near-dup pipeline run on EXACT edit distance instead
    * of set similarity. Shingle overlap (d02) can score two documents as
    * similar when they merely share vocabulary; character-level Levenshtein
    * is the ground-truth near-dup check CCNet/RefinedWeb-style pipelines
    * apply to the bounded candidate set. Candidates come from the SAME
    * persisted shinglePairCounts pass (no new corpus-scale scan), gated at
    * common >= 3 shared 3-grams so the quadratic-per-pair Levenshtein only
    * runs on pairs with real overlap. Output: verified pairs with the exact
    * distance and the integer edit-ratio (ppm of the longer text) under the
    * 600000-ppm near-dup threshold.
    *
    * Scale: candidate pairs are bounded by the df-capped postings (the d02
    * argument); per-pair cost is O(len1*len2) on ~hundreds of chars — CPU
    * spent only on the shortlist, never N². The two text joins are key
    * equi-joins against the corpus; at 100 TB the candidate side is tiny
    * relative to the corpus so AQE broadcasts it onto the scans. */
  private val d20: Q = (s, dir) => {
    val cand = shinglePairCounts(s, dir).filter(col("common") >= 3)
    val texts = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val wt = cand
      .join(texts.as("t1"), col("d1") === col("t1.doc_id"))
      .join(texts.as("t2"), col("d2") === col("t2.doc_id"))
      .select(col("d1"), col("d2"), col("common"),
        col("t1.text").as("text1"), col("t2.text").as("text2"))
      .withColumn("h1", md5(col("text1")))
      .withColumn("h2", md5(col("text2")))
    // the quadratic DP runs once per DISTINCT text pair, not per doc pair
    // — a 10x-duplicated corpus (the crawl shape) yields 45 identical
    // pairs per dup group, and paying O(len^2) on each inflated sf1 from
    // ~1 s to 18 s; keyed on content hashes, the cost tracks content
    // diversity (the d04 unique-signature lesson applied to the verify
    // stage). first() is deterministic here: equal hash => equal text.
    // Memoized + persisted: the distance table is part of the built
    // dedup index (serve-many), and the persist barrier also stops the
    // downstream edit_ppm filter from being pushed into this branch and
    // re-running every DP inside a Filter condition.
    val uniq = memoized(s"d20lev:$dir")(
      wt.groupBy(col("h1"), col("h2"))
        .agg(first(col("text1")).as("u1"), first(col("text2")).as("u2"))
        .select(col("h1"), col("h2"),
          levenshtein(col("u1"), col("u2")).as("lev"),
          greatest(length(col("u1")), length(col("u2"))).as("max_len"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    wt.join(uniq, Seq("h1", "h2"))
      .select(col("d1"), col("d2"), col("common"), col("lev"), col("max_len"))
      .withColumn("edit_ppm", expr("lev * 1000000L div max_len"))
      .filter(col("edit_ppm") <= 600000)
      .psortScaled(col("d1"), col("d2"))
  }

  private val d20Sql =
    s"""WITH docs AS ($docsShSql),
       |ex AS (SELECT doc_id, UNNEST(sh) AS s FROM docs),
       |rare AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) <= 100),
       |exr AS (SELECT ex.doc_id, ex.s FROM ex JOIN rare USING (s)),
       |cand AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
       |  FROM exr a JOIN exr b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
       |v AS (
       |  SELECT d1, d2, CAST(common AS BIGINT) AS common,
       |    CAST(LEVENSHTEIN(t1.text, t2.text) AS INTEGER) AS lev,
       |    CAST(GREATEST(LENGTH(t1.text), LENGTH(t2.text)) AS INTEGER) AS max_len
       |  FROM cand
       |  JOIN documents t1 ON d1 = t1.doc_id
       |  JOIN documents t2 ON d2 = t2.doc_id)
       |SELECT d1, d2, common, lev, max_len,
       |  CAST(lev AS BIGINT) * 1000000 // max_len AS edit_ppm
       |FROM v WHERE CAST(lev AS BIGINT) * 1000000 // max_len <= 600000
       |ORDER BY d1, d2""".stripMargin

  /** d21: canonical-representative selection — which member of each
    * near-dup cluster survives? Production dedup keeps the LONGEST copy
    * (the most complete capture; truncated mirrors and partial scrapes
    * lose), tie-broken by min doc_id for determinism — NOT min-id-wins
    * (d09's canonicalization), which throws away content whenever the
    * lowest id happens to be the truncated copy. Reuses the persisted d07
    * component labels (no new candidate pass). Output: per-cluster ledger
    * — representative, member count, exact char mass kept vs total.
    *
    * Scale: the label table is bounded (cluster members << corpus); the
    * n_chars join broadcasts the labels onto the corpus scan; the argmax
    * is max_by over a (n_chars, -doc_id) struct — one aggregation, no
    * window, O(clusters) output. */
  private val d21: Q = (s, dir) => {
    val labels = d07Labels(s, dir).select(col("id").as("doc_id"), col("lbl"))
    val docs = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
    labels.join(docs, Seq("doc_id"))
      .groupBy(col("lbl"))
      .agg(
        expr("max_by(doc_id, struct(n_chars, -doc_id))").as("rep_doc"),
        count(lit(1)).as("n_members"),
        max(col("n_chars")).cast("long").as("chars_kept"),
        sum(col("n_chars")).as("chars_total"))
      .filter(col("n_members") >= 2)
      .psort(col("lbl"))
  }

  private val d21Sql =
    s"""WITH RECURSIVE $minhashCandCtes,
       |$verifiedPairCtes,
       |bidir AS (SELECT d1 AS id, d2 AS nb FROM edges
       |          UNION ALL SELECT d2, d1 FROM edges),
       |walk(id, lbl) AS (
       |  SELECT DISTINCT id, id FROM bidir
       |  UNION
       |  SELECT b.nb, w.lbl FROM walk w JOIN bidir b ON b.id = w.id),
       |labels AS (SELECT id AS doc_id, MIN(lbl) AS lbl FROM walk GROUP BY id),
       |ranked AS (
       |  SELECT l.lbl, l.doc_id, d.n_chars,
       |    ROW_NUMBER() OVER (PARTITION BY l.lbl
       |      ORDER BY d.n_chars DESC, l.doc_id) AS rn
       |  FROM labels l JOIN documents d USING (doc_id))
       |SELECT lbl,
       |  MAX(CASE WHEN rn = 1 THEN doc_id END) AS rep_doc,
       |  COUNT(*) AS n_members,
       |  CAST(MAX(n_chars) AS BIGINT) AS chars_kept,
       |  CAST(SUM(n_chars) AS BIGINT) AS chars_total
       |FROM ranked GROUP BY lbl HAVING COUNT(*) >= 2
       |ORDER BY lbl""".stripMargin

  /** d22: dedup-aware train/val/test split — x17 DETECTS near-dup leakage
    * across splits; this op PREVENTS it by construction: every document
    * is assigned to its split by the content hash of its CLUSTER key
    * (the d07 component label; singletons key on their own doc_id), so a
    * near-dup cluster can never straddle a split boundary. 80/10/10 via
    * md5 % 10 — deterministic, engine-identical, rebalance-stable (a new
    * corpus shard changes no existing assignment). Output: the per-split
    * ledger plus the cross-split near-dup edge count, which must be 0.
    *
    * Scale: the label table is bounded and broadcasts onto one map-only
    * corpus pass (the d19 shape); the ledger is O(3); the violation
    * audit joins the bounded edge list against the assignment by key. */
  private val d22: Q = (s, dir) => {
    val labels = d07Labels(s, dir).select(col("id").as("doc_id"), col("lbl"))
    val asg = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .join(broadcast(labels), Seq("doc_id"), "left")
      .withColumn("gk", coalesce(col("lbl"), col("doc_id")))
      .withColumn("s10", expr(s"${md5iExpr("CAST(gk AS STRING)")} % 10"))
      .withColumn("split_name",
        when(col("s10") <= 7, "train")
          .when(col("s10") === 8, "val").otherwise("test"))
    val edges = nearDupPairs(s, dir).select(col("d1"), col("d2"))
    val keyed = asg.select(col("doc_id"), col("s10"))
    val vio = edges
      .join(keyed.select(col("doc_id").as("d1"), col("s10").as("sp1")), Seq("d1"))
      .join(keyed.select(col("doc_id").as("d2"), col("s10").as("sp2")), Seq("d2"))
      .agg(sum(when(col("sp1") =!= col("sp2"), 1L).otherwise(0L))
        .as("violations"))
    asg.groupBy(col("split_name"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("gk")).as("n_groups"),
        sum(col("n_chars")).as("chars"))
      .crossJoin(broadcast(vio))
      .psort(col("split_name"))
  }

  private val d22Sql =
    s"""WITH RECURSIVE $minhashCandCtes,
       |$verifiedPairCtes,
       |bidir AS (SELECT d1 AS id, d2 AS nb FROM edges
       |          UNION ALL SELECT d2, d1 FROM edges),
       |walk(id, lbl) AS (
       |  SELECT DISTINCT id, id FROM bidir
       |  UNION
       |  SELECT b.nb, w.lbl FROM walk w JOIN bidir b ON b.id = w.id),
       |labels AS (SELECT id AS doc_id, MIN(lbl) AS lbl FROM walk GROUP BY id),
       |asg AS (
       |  SELECT d.doc_id, d.n_chars, COALESCE(l.lbl, d.doc_id) AS gk
       |  FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id),
       |sp AS (
       |  SELECT doc_id, n_chars, gk,
       |    ${md5iSql("CAST(gk AS VARCHAR)")} % 10 AS s10
       |  FROM asg),
       |named AS (
       |  SELECT *, CASE WHEN s10 <= 7 THEN 'train'
       |                 WHEN s10 = 8 THEN 'val' ELSE 'test' END AS split_name
       |  FROM sp),
       |vio AS (
       |  SELECT CAST(SUM(CASE WHEN a.s10 <> b.s10 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS violations
       |  FROM edges e JOIN sp a ON e.d1 = a.doc_id
       |  JOIN sp b ON e.d2 = b.doc_id)
       |SELECT split_name, COUNT(*) AS n_docs,
       |  CAST(COUNT(DISTINCT gk) AS BIGINT) AS n_groups,
       |  CAST(SUM(n_chars) AS BIGINT) AS chars, violations
       |FROM named, vio GROUP BY split_name, violations
       |ORDER BY split_name""".stripMargin

  /** d23: dedup-rate tuning curve — for every candidate threshold 0.5..1.0
    * (tenths), how many verified pairs and how many distinct documents a
    * jaccard->=threshold dedup policy would touch: the operating-curve a
    * pipeline reads before committing to a cutoff (too low deletes
    * paraphrases, too high leaves mirrors). The bucket is the EXACT
    * integer floor((common * 10) / union) — no floating jaccard can land
    * a pair on either side of a tenth boundary.
    *
    * Scale: rides the SAME persisted candidate-pair pass; the curve is a
    * 6-threshold expansion of a bounded pair list + one distinct-doc
    * aggregation per threshold — O(thresholds) output. */
  private val d23: Q = (s, dir) => {
    val docs = docsWithShingles(s, dir)
    val sizes = docs.select(col("doc_id"), col("n"))
    val bucketed = shinglePairCounts(s, dir)
      .join(sizes.as("z1"), col("d1") === col("z1.doc_id"))
      .join(sizes.as("z2"), col("d2") === col("z2.doc_id"))
      .select(col("d1"), col("d2"),
        expr("common * 10L div (z1.n + z2.n - common)").as("bucket"))
    val thresholds = (5 to 10).map(k => (k, k / 10.0))
    import s.implicits._
    val tdf = thresholds.toDF("k", "threshold")
    val joined = broadcast(tdf).join(bucketed, col("bucket") >= col("k"))
    val pa = joined.groupBy(col("k"), col("threshold"))
      .agg(count(lit(1)).as("n_pairs"))
    val da = joined
      .select(col("k"), explode(array(col("d1"), col("d2"))).as("d"))
      .distinct()
      .groupBy(col("k")).agg(count(lit(1)).as("n_docs_affected"))
    pa.join(da, Seq("k")).psort(col("k"))
  }

  private val d23Sql =
    s"""WITH docs AS ($docsShSql),
       |ex AS (SELECT doc_id, UNNEST(sh) AS s FROM docs),
       |rare AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) <= 100),
       |exr AS (SELECT ex.doc_id, ex.s FROM ex JOIN rare USING (s)),
       |cand AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
       |  FROM exr a JOIN exr b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, LEN(sh) AS n FROM docs),
       |bucketed AS (
       |  SELECT d1, d2, common * 10 // (z1.n + z2.n - common) AS bucket
       |  FROM cand
       |  JOIN sizes z1 ON d1 = z1.doc_id
       |  JOIN sizes z2 ON d2 = z2.doc_id),
       |ks AS (SELECT k, k / 10.0 AS threshold FROM RANGE(5, 11) t(k)),
       |pa AS (
       |  SELECT ks.k, ks.threshold, COUNT(*) AS n_pairs
       |  FROM ks JOIN bucketed b ON b.bucket >= ks.k GROUP BY 1, 2),
       |da AS (
       |  SELECT k, CAST(COUNT(DISTINCT d) AS BIGINT) AS n_docs_affected
       |  FROM (SELECT ks.k, UNNEST([b.d1, b.d2]) AS d
       |        FROM ks JOIN bucketed b ON b.bucket >= ks.k)
       |  GROUP BY k)
       |SELECT CAST(pa.k AS INTEGER) AS k, threshold, n_pairs,
       |  n_docs_affected
       |FROM pa JOIN da USING (k) ORDER BY k""".stripMargin

  // ---- d24: LSH (b, r) S-curve planner ------------------------------------
  /** d24: the parameter-selection artifact behind d03's 4x2 band choice —
    * for every (bands, rows) split of the k=8 signature budget, the
    * analytic candidate probability P(s) = 1 - (1 - s^r)^b on a
    * twentieth-grid of jaccard s, overlaid with the OBSERVED pair count
    * in that jaccard bucket from the SAME persisted df-capped shingle-pair
    * pass every dedup op shares (no new corpus scan). This is the table a
    * pipeline reads to pick its operating point: where the S-curve's knee
    * sits vs where the corpus's actual near-dup mass sits.
    *
    * Determinism: the powers are spelled as explicit left-associated
    * multiplication chains (IEEE *, exactly rounded, bit-identical in
    * both engines) — never libm pow, whose last ulp is
    * implementation-defined. Buckets are exact integer arithmetic.
    *
    * Scale: the analytic grid is O(configs x 20) driver-side literals;
    * the observed overlay is one bucket aggregation of the persisted
    * candidate pairs + a broadcast join. Nothing here touches the corpus
    * again. */
  private val d24: Q = (s, dir) => {
    import s.implicits._
    // (bands, rows) splits of the k = 8 minhash budget (d03 ships 4x2)
    val configs = Seq((1, 8), (2, 4), (4, 2), (8, 1))
    val grid = (for ((b, r) <- configs; i <- 1 to 20) yield (b, r, i))
      .toDF("b", "r", "s20")
    def chain(base: String, n: Int): String =
      Seq.fill(n)(base).mkString("(", " * ", ")")
    val sExpr = "cast(s20 as double) / 20.0"
    // per-config frames so the multiply chains are plan-time strings
    val analytic = configs.map { case (b, r) =>
      grid.filter(col("b") === b && col("r") === r)
        .withColumn("s", expr(sExpr))
        .withColumn("p_candidate",
          round(expr(s"1.0 - ${chain(s"(1.0 - ${chain(s"($sExpr)", r)})", b)}"), 6))
    }.reduce(_ unionAll _)
    val sizes = docsWithShingles(s, dir).select(col("doc_id"), col("n"))
    val observed = shinglePairCounts(s, dir)
      .join(sizes.as("z1"), col("d1") === col("z1.doc_id"))
      .join(sizes.as("z2"), col("d2") === col("z2.doc_id"))
      .select(expr("common * 20L div (z1.n + z2.n - common)").as("s20"))
      .groupBy(col("s20")).agg(count(lit(1)).as("n_observed_pairs"))
    analytic.join(broadcast(observed), Seq("s20"), "left")
      .select(col("b"), col("r"), col("s20"), col("s"), col("p_candidate"),
        coalesce(col("n_observed_pairs"), lit(0L)).as("n_observed_pairs"))
      .psort(col("b"), col("r"), col("s20"))
  }

  private val d24Sql = {
    def chain(base: String, n: Int): String =
      Seq.fill(n)(base).mkString("(", " * ", ")")
    val sExpr = "CAST(s20 AS DOUBLE) / 20.0"
    val pCases = Seq((1, 8), (2, 4), (4, 2), (8, 1)).map { case (b, r) =>
      s"WHEN b = $b AND r = $r THEN ROUND(1.0 - " +
        chain(s"(1.0 - ${chain(s"($sExpr)", r)})", b) + ", 6)"
    }.mkString(" ")
    s"""WITH docs AS ($docsShSql),
       |ex AS (SELECT doc_id, UNNEST(sh) AS s FROM docs),
       |rare AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) <= 100),
       |exr AS (SELECT ex.doc_id, ex.s FROM ex JOIN rare USING (s)),
       |cand AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
       |  FROM exr a JOIN exr b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, LEN(sh) AS n FROM docs),
       |observed AS (
       |  SELECT common * 20 // (z1.n + z2.n - common) AS s20,
       |    COUNT(*) AS n_observed_pairs
       |  FROM cand
       |  JOIN sizes z1 ON d1 = z1.doc_id
       |  JOIN sizes z2 ON d2 = z2.doc_id
       |  GROUP BY 1),
       |grid AS (
       |  SELECT b, r, s20 FROM (VALUES (1, 8), (2, 4), (4, 2), (8, 1)) c(b, r),
       |    RANGE(1, 21) t(s20))
       |SELECT b, r, CAST(s20 AS INTEGER) AS s20, $sExpr AS s,
       |  CASE $pCases END AS p_candidate,
       |  COALESCE(o.n_observed_pairs, 0) AS n_observed_pairs
       |FROM grid LEFT JOIN observed o USING (s20)
       |ORDER BY b, r, s20""".stripMargin
  }

  // ---- d25: cluster-cohesion audit ---------------------------------------
  /** d25: QUALITY metrics for the near-dup clusters the pipeline acts on —
    * per cluster: member count and the exact-jaccard distribution
    * (mean/min/max, integer ppm) over the observed candidate pairs whose
    * BOTH endpoints carry the cluster's label. A cluster whose intra
    * jaccard floor is far below the 0.8 edge threshold was stitched by
    * transitive chaining — the signal a curation run uses to split or
    * re-verify before deleting survivors. Pairs come from the SAME
    * persisted df-capped shingle-pair pass every dedup op shares, labels
    * from the SAME persisted d07 cluster index — no new corpus scan, two
    * broadcast-sized joins and one O(clusters) aggregation.
    *
    * All arithmetic is exact integers (ppm = common*1e6 div union; mean =
    * sum div count), so both engines agree bit-for-bit. */
  private val d25: Q = (s, dir) => {
    val labels = d07Labels(s, dir)
    val sizes = docsWithShingles(s, dir).select(col("doc_id"), col("n"))
    val ppm = shinglePairCounts(s, dir)
      .join(sizes.as("z1"), col("d1") === col("z1.doc_id"))
      .join(sizes.as("z2"), col("d2") === col("z2.doc_id"))
      .select(col("d1"), col("d2"),
        expr("common * 1000000L div (z1.n + z2.n - common)").as("ppm"))
    val intra = ppm
      .join(labels.select(col("id").as("d1"), col("lbl").as("l1")), Seq("d1"))
      .join(labels.select(col("id").as("d2"), col("lbl").as("l2")), Seq("d2"))
      .filter(col("l1") === col("l2"))
    val members = labels.groupBy(col("lbl").as("cluster"))
      .agg(count(lit(1)).as("n_members"))
    intra.groupBy(col("l1").as("cluster"))
      .agg(count(lit(1)).as("n_intra_pairs"),
        expr("sum(ppm) div count(1)").as("mean_jaccard_ppm"),
        min(col("ppm")).as("min_jaccard_ppm"),
        max(col("ppm")).as("max_jaccard_ppm"))
      .join(members, Seq("cluster"))
      .select(col("cluster"), col("n_members"), col("n_intra_pairs"),
        col("mean_jaccard_ppm"), col("min_jaccard_ppm"),
        col("max_jaccard_ppm"))
      .psort(col("cluster"))
  }

  private val d25Sql =
    s"""WITH RECURSIVE $minhashCandCtes,
       |$verifiedPairCtes,
       |bidir AS (SELECT d1 AS id, d2 AS nb FROM edges
       |          UNION ALL SELECT d2, d1 FROM edges),
       |walk(id, lbl) AS (
       |  SELECT DISTINCT id, id FROM bidir
       |  UNION
       |  SELECT b.nb, w.lbl FROM walk w JOIN bidir b ON b.id = w.id),
       |labels AS (SELECT id, MIN(lbl) AS lbl FROM walk GROUP BY id),
       |ex AS (SELECT doc_id, UNNEST(sh) AS s FROM docs),
       |rare AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) <= 100),
       |exr AS (SELECT ex.doc_id, ex.s FROM ex JOIN rare USING (s)),
       |cand2 AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
       |  FROM exr a JOIN exr b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, LEN(sh) AS n FROM docs),
       |ppm AS (
       |  SELECT d1, d2,
       |    common * 1000000 // (z1.n + z2.n - common) AS ppm
       |  FROM cand2
       |  JOIN sizes z1 ON d1 = z1.doc_id
       |  JOIN sizes z2 ON d2 = z2.doc_id),
       |intra AS (
       |  SELECT l1.lbl AS cluster, p.ppm
       |  FROM ppm p
       |  JOIN labels l1 ON p.d1 = l1.id
       |  JOIN labels l2 ON p.d2 = l2.id
       |  WHERE l1.lbl = l2.lbl),
       |members AS (SELECT lbl AS cluster, COUNT(*) AS n_members
       |            FROM labels GROUP BY 1)
       |SELECT i.cluster, CAST(n_members AS BIGINT) AS n_members,
       |  COUNT(*) AS n_intra_pairs,
       |  CAST(CAST(SUM(ppm) AS BIGINT) // COUNT(*) AS BIGINT)
       |    AS mean_jaccard_ppm,
       |  CAST(MIN(ppm) AS BIGINT) AS min_jaccard_ppm,
       |  CAST(MAX(ppm) AS BIGINT) AS max_jaccard_ppm
       |FROM intra i JOIN members m ON i.cluster = m.cluster
       |GROUP BY i.cluster, n_members
       |ORDER BY i.cluster""".stripMargin

  /** d26: exact dedup against a BUCKETED canonical store — the
    * repeated-ingest layout at 100 TB (the reference re-attaches the same
    * persisted database across runs, kwack `KwackEngine.java` `-d`
    * lifecycle; at lake scale the store side must never re-shuffle). The
    * corpus-side content-hash index is persisted ONCE as a bucketed,
    * per-bucket-sorted parquet table — the one-time shuffle paid at build
    * — and every subsequent batch joins against it with ZERO corpus-side
    * exchange: the sort-merge join reads the store's buckets in place and
    * only the (small) incoming batch is shuffled to the store's
    * bucketing. Per-ingest cost is O(batch), never O(store reshuffle);
    * PlanSpec pins the bucketed scan + exchange-free store side. The
    * merge hint keeps the plan the one a 100 TB store requires (a
    * broadcast of "the batch" only works while the batch is broadcast-
    * sized; bucketed SMJ works at any batch size). */
  private val d26: Q = (s, dir) => {
    val norm = md5(regexp_replace(lower(col("text")), " +", " "))
    val store = memoized(s"d26store:$dir") {
      val name = "d26_store_" + java.lang.Integer.toHexString(dir.hashCode)
      // external table at a fresh temp path: the default managed location
      // under the warehouse dir survives JVM restarts while the in-memory
      // catalog does not, so a managed CTAS would hit LOCATION_ALREADY_EXISTS
      // on the next run
      s.sql(s"DROP TABLE IF EXISTS $name")
      val loc = java.nio.file.Files.createTempDirectory("graft_d26_store")
      t(s, dir, "documents").filter(col("doc_id") % 10 =!= 7)
        .select(col("doc_id").as("oid"), norm.as("h"))
        .write.bucketBy(16, "h").sortBy("h").format("parquet")
        .option("path", loc.toString).mode("overwrite").saveAsTable(name)
      s.table(name)
    }
    val batch = t(s, dir, "documents").filter(col("doc_id") % 10 === 7)
      .select(col("doc_id").as("nid"), norm.as("h"))
    val hits = store.hint("merge").join(batch, Seq("h"))
      .groupBy(col("nid"))
      .agg(min(col("oid")).as("dup_of"), count(lit(1)).as("n_store_copies"))
    batch.select(col("nid"))
      .join(hits, Seq("nid"), "left")
      .select(col("nid").as("doc_id"),
        when(col("dup_of").isNotNull, "exact_dup").otherwise("unique")
          .as("verdict"),
        col("dup_of"),
        coalesce(col("n_store_copies"), lit(0L)).as("n_store_copies"))
      .psort(col("doc_id"))
  }

  private val d26Sql =
    """WITH store AS (
      |  SELECT doc_id AS oid, MD5(REGEXP_REPLACE(LOWER(text), ' +', ' ', 'g')) AS h
      |  FROM documents WHERE doc_id % 10 <> 7),
      |batch AS (
      |  SELECT doc_id AS nid, MD5(REGEXP_REPLACE(LOWER(text), ' +', ' ', 'g')) AS h
      |  FROM documents WHERE doc_id % 10 = 7),
      |hits AS (
      |  SELECT b.nid, MIN(s.oid) AS dup_of, COUNT(*) AS n_store_copies
      |  FROM batch b JOIN store s USING (h) GROUP BY b.nid)
      |SELECT b.nid AS doc_id,
      |  CASE WHEN h.dup_of IS NOT NULL THEN 'exact_dup' ELSE 'unique' END AS verdict,
      |  h.dup_of,
      |  COALESCE(h.n_store_copies, 0) AS n_store_copies
      |FROM batch b LEFT JOIN hits h ON b.nid = h.nid
      |ORDER BY doc_id""".stripMargin

  /** Band-key column (band index fused into the key string) for the d27
    * bucketed store: one string column so the store can bucket on it. */
  private[queries] def bandKeyCol(idCol: String, outId: String) = {
    val keys = (0 until 4).map { b =>
      concat_ws("_", lit(b), col(s"m${2 * b}"), col(s"m${2 * b + 1}"))
    }
    (sig: DataFrame) => sig.select(col(idCol).as(outId),
      explode(array(keys: _*)).as("bkey"))
  }

  /** d27: NEAR-dup dedup against a BUCKETED LSH band store — d26's twin
    * for near duplicates, the ingest-time admission gate a 100 TB corpus
    * runs on every batch: the store's minhash band keys are persisted
    * ONCE as a bucketed, per-bucket-sorted parquet table (the one-time
    * shuffle paid at build), and every incoming batch probes it by
    * sort-merge join with ZERO store-side exchange — only the O(batch)
    * band rows shuffle to the store's bucketing. Candidates (shared band)
    * verify by exact jaccard >= 0.8 against the shingled corpus, so the
    * verify cost is candidate-proportional, never corpus². Per batch doc:
    * near_dup verdict, canonical (lowest-id) store match, match count.
    * PlanSpec pins the bucketed scan + exchange-free store side. */
  /** The d27 near-dup band store, shared with p09's streaming admission:
    * built ONCE per sf dir (bucketed + per-bucket-sorted on the band key)
    * and probed exchange-free by every consumer. */
  private[queries] def d27Store(s: SparkSession, dir: String): DataFrame =
    memoized(s"d27store:$dir") {
      val sig = minhashSigOf(
        docsWithShingles(s, dir).filter(col("doc_id") % 10 =!= 3))
      val name = "d27_bands_" + java.lang.Integer.toHexString(dir.hashCode)
      s.sql(s"DROP TABLE IF EXISTS $name")
      val loc = java.nio.file.Files.createTempDirectory("graft_d27_store")
      bandKeyCol("doc_id", "oid")(sig)
        .write.bucketBy(16, "bkey").sortBy("bkey").format("parquet")
        .option("path", loc.toString).mode("overwrite").saveAsTable(name)
      s.table(name)
    }

  private val d27: Q = (s, dir) => {
    val isBatch = col("doc_id") % 10 === 3
    val store = d27Store(s, dir)
    val batchDocs = docsWithShingles(s, dir).filter(isBatch)
    val bbands = bandKeyCol("doc_id", "nid")(minhashSigOf(batchDocs))
    val cand = store.hint("merge").join(bbands, Seq("bkey"))
      .select(col("nid"), col("oid")).distinct()
    val matches = cand
      .join(batchDocs.select(col("doc_id").as("nid"), col("sh").as("sh1")),
        Seq("nid"))
      .join(docsWithShingles(s, dir)
        .select(col("doc_id").as("oid"), col("sh").as("sh2")), Seq("oid"))
      .filter(jaccardCol >= 0.8)
      .groupBy(col("nid"))
      .agg(min(col("oid")).as("dup_of"), count(lit(1)).as("n_matches"))
    batchDocs.select(col("doc_id"))
      .join(matches.withColumnRenamed("nid", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("dup_of").isNotNull, "near_dup").otherwise("unique")
          .as("verdict"),
        col("dup_of"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"))
      .psort(col("doc_id"))
  }

  private val d27Sql = {
    val sigCols = (0 until 8).map(i => s"${minhashSql(i)} AS m$i")
      .mkString(",\n   ")
    val bandRows = (0 until 4).map { b =>
      s"SELECT doc_id, $b || '_' || m${2 * b} || '_' || m${2 * b + 1} AS bkey FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH docs AS ($docsShSql),
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
       |    $jaccardSql AS jaccard
       |  FROM cand
       |  JOIN docs s1 ON nid = s1.doc_id
       |  JOIN docs s2 ON oid = s2.doc_id),
       |m AS (SELECT nid, MIN(oid) AS dup_of,
       |        CAST(COUNT(*) AS BIGINT) AS n_matches
       |      FROM j WHERE jaccard >= 0.8 GROUP BY nid)
       |SELECT d.doc_id,
       |  CASE WHEN m.nid IS NOT NULL THEN 'near_dup' ELSE 'unique' END AS verdict,
       |  m.dup_of,
       |  COALESCE(m.n_matches, 0) AS n_matches
       |FROM (SELECT doc_id FROM docs WHERE doc_id % 10 = 3) d
       |LEFT JOIN m ON d.doc_id = m.nid
       |ORDER BY doc_id""".stripMargin
  }

  // ---- d28: dedup-then-shard — serpentine token-balanced shards -----------
  /** d28: the step AFTER dedup in a corpus build — assign the canonical
    * (exact-dedup survivor) documents to a fixed number of training shards
    * balanced by TOKEN budget, not document count. Serpentine (boustrophedon)
    * assignment over the token-desc rank: rank r goes to shard r%8 on even
    * passes and 7-(r%8) on odd passes, which bounds the shard-total spread
    * by one max-document per shard — the cheap deterministic 7/8-competitive
    * alternative to greedy bin packing that needs no per-shard running
    * state.
    *
    * Scale shape: the global token-desc rank comes from
    * [[graft.operators.DistributedRank]] (approx-quantile cuts ->
    * bucket-partitioned windows — no single-partition sort), the serpentine
    * arithmetic is map-only on the rank, and the audit is one 8-group
    * aggregation. At 100 TB the canonical frame is the persisted dedup
    * output and sharding costs one rank pass + a map. */
  /** Per-document serpentine shard assignment of the exact-dedup
    * survivors — d28's interior, shared with d35's cross-shard audit:
    * (doc_id, n_tokens, shard) for each canonical doc. */
  // r13: memoized+persisted — this IS the build-once shard-map asset the
  // d35 docs already describe ("reuses two build-once assets"), but it was
  // rebuilt per consumer: the canon md5/tokenize aggregation plus
  // DistributedRank's eager quantile/count jobs ran once per d28
  // invocation and TWICE per d35 invocation (both shard joins re-execute
  // their input). Build once, serve every consumer from the cache.
  private def d28Shards(s: SparkSession, dir: String): DataFrame =
    memoized(s"d28shards:$dir") {
      val d = t(s, dir, "documents")
      val norm = regexp_replace(lower(col("text")), " +", " ")
      val canon = d
        .select(col("doc_id"), md5(norm).as("h"),
          size(filter(split(norm, " "), w => w =!= "")).cast("long").as("n_tokens"))
        .groupBy(col("h"))
        .agg(min(col("doc_id")).as("doc_id"), min(col("n_tokens")).as("n_tokens"))
      val (ranked, _) = graft.operators.DistributedRank.withGlobalRank(
        canon, -col("n_tokens"), Seq(col("n_tokens").desc, col("doc_id")), "rank")
      val pass = expr("(rank - 1) div 8")
      val pos = (col("rank") - 1) % 8
      ranked
        .withColumn("shard", when(pass % 2 === 0, pos).otherwise(lit(7) - pos))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

  private val d28: Q = (s, dir) => {
    d28Shards(s, dir)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        max(col("n_tokens")).as("max_tokens"),
        min(col("n_tokens")).as("min_tokens"))
      .psort(col("shard"))
  }

  private val d28Sql =
    """WITH canon AS (
      |  SELECT MIN(doc_id) AS doc_id, MIN(n_tokens) AS n_tokens FROM (
      |    SELECT doc_id,
      |      MD5(REGEXP_REPLACE(LOWER(text), ' +', ' ', 'g')) AS h,
      |      LEN([w FOR w IN
      |        STRING_SPLIT(REGEXP_REPLACE(LOWER(text), ' +', ' ', 'g'), ' ')
      |        IF w <> '']) AS n_tokens
      |    FROM documents) GROUP BY h),
      |r AS (
      |  SELECT doc_id, n_tokens,
      |    ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id) AS rank
      |  FROM canon),
      |sh AS (
      |  SELECT n_tokens,
      |    CASE WHEN ((rank - 1) // 8) % 2 = 0 THEN (rank - 1) % 8
      |         ELSE 7 - (rank - 1) % 8 END AS shard
      |  FROM r)
      |SELECT shard, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      |  MAX(n_tokens) AS max_tokens, MIN(n_tokens) AS min_tokens
      |FROM sh GROUP BY shard ORDER BY shard""".stripMargin

  // ---- d35: cross-shard near-dup residual (dedup/sharding interaction) ----
  /** d35: the residual a SHARD-LOCAL near-dedup pass would miss — after
    * exact-dedup survivors are assigned to training shards (d28's
    * serpentine token-balanced assignment), which verified near-dup pairs
    * (d03's jaccard >= 0.8 edge set) CROSS a shard boundary? A pipeline
    * that dedups within shards (the cheap parallel plan) silently keeps
    * exactly the off-diagonal mass of this matrix; the diagonal is what
    * shard-local dedup catches. This is the audit that justifies (or
    * vetoes) shard-local dedup before a training run.
    *
    * Scale shape: reuses two build-once assets (the verified pair list,
    * output-proportional; the shard map, one rank pass) and joins them on
    * doc_id — two equi-joins, one 8x8-bounded aggregate. No new pairwise
    * work. */
  private val d35: Q = (s, dir) => {
    val pairs = nearDupPairs(s, dir).select(col("d1"), col("d2"))
    val sh = d28Shards(s, dir).select(col("doc_id"), col("shard"))
    pairs
      .join(sh.select(col("doc_id").as("d1"), col("shard").as("sa")), Seq("d1"))
      .join(sh.select(col("doc_id").as("d2"), col("shard").as("sb")), Seq("d2"))
      .select(least(col("sa"), col("sb")).as("shard_a"),
        greatest(col("sa"), col("sb")).as("shard_b"))
      .groupBy(col("shard_a"), col("shard_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .psort(col("shard_a"), col("shard_b"))
  }

  private val d35Sql =
    s"""WITH $minhashCandCtes,
       |$verifiedPairCtes,
       |canon AS (
       |  SELECT MIN(doc_id) AS doc_id, MIN(n_tokens) AS n_tokens FROM (
       |    SELECT doc_id,
       |      MD5(REGEXP_REPLACE(LOWER(text), ' +', ' ', 'g')) AS h,
       |      LEN([w FOR w IN
       |        STRING_SPLIT(REGEXP_REPLACE(LOWER(text), ' +', ' ', 'g'), ' ')
       |        IF w <> '']) AS n_tokens
       |    FROM documents) GROUP BY h),
       |r AS (
       |  SELECT doc_id,
       |    ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id) AS rank
       |  FROM canon),
       |shmap AS (
       |  SELECT doc_id,
       |    CASE WHEN ((rank - 1) // 8) % 2 = 0 THEN (rank - 1) % 8
       |         ELSE 7 - (rank - 1) % 8 END AS shard
       |  FROM r)
       |SELECT LEAST(s1.shard, s2.shard) AS shard_a,
       |  GREATEST(s1.shard, s2.shard) AS shard_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs
       |FROM edges e
       |JOIN shmap s1 ON e.d1 = s1.doc_id
       |JOIN shmap s2 ON e.d2 = s2.doc_id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- d29: cross-source duplication matrix (mirror detection) ------------
  /** d29: which sources copy from which — for every pair of sources that
    * share at least one duplicated content-fingerprint group, the number of
    * shared groups and how many documents each side contributes to them.
    * The fingerprint is the normalized 64-char lead (same normalization as
    * d01; prefix rather than full text so re-hosted copies with altered
    * tails still collide). This is the crawl-forensics view of dedup
    * (mirror sites, syndicated feeds, re-hosted dumps): the input to
    * source-level dedup policy (drop the mirror, keep the origin),
    * complementary to x40's SHINGLE-level source overlap (which sees
    * near-dup text; this sees copy lineage with exact doc counts).
    *
    * Scale shape: one shuffle groups (digest, source) with per-cell doc
    * counts — CONTENT-diversity-sized, duplicates collapse before any
    * join; the self-join on the digest fans out at most |sources|^2 per
    * group (sources is a small dimension); output is at most a
    * |sources|^2 matrix. No doc-level pair ever materializes. */
  private val d29: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    val norm = regexp_replace(lower(col("text")), " +", " ")
    val hs = d.select(md5(substring(norm, 1, 64)).as("h"), col("source"))
      .groupBy(col("h"), col("source")).agg(count(lit(1)).as("cnt"))
    hs.as("a")
      .join(hs.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src1"), col("b.source").as("src2"))
      .agg(count(lit(1)).as("n_shared_groups"),
        sum(col("a.cnt")).as("n_docs_src1"),
        sum(col("b.cnt")).as("n_docs_src2"))
      .psort(col("src1"), col("src2"))
  }

  private val d29Sql =
    """WITH hs AS (
      |  SELECT MD5(SUBSTR(REGEXP_REPLACE(LOWER(text), ' +', ' ', 'g'), 1, 64)) AS h,
      |         source, COUNT(*) AS cnt
      |  FROM documents GROUP BY 1, 2)
      |SELECT a.source AS src1, b.source AS src2,
      |  COUNT(*) AS n_shared_groups,
      |  CAST(SUM(a.cnt) AS BIGINT) AS n_docs_src1,
      |  CAST(SUM(b.cnt) AS BIGINT) AS n_docs_src2
      |FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
      |GROUP BY 1, 2 ORDER BY src1, src2""".stripMargin

  // ---- d31: duplication spectrum (copy-count histogram) -------------------
  /** d31: the "how duplicated IS this corpus" planning view run before any
    * dedup budget decision — the copy-count histogram over d29's lead
    * fingerprint (normalized 64-char prefix: catches verbatim copies AND
    * re-hosted variants with altered tails): for each copy-count bucket
    * (1, 2, ..., capped at 10+) the number of content groups, the number
    * of documents they hold, and their integer-permille share of the
    * corpus. This is the Zipf spectrum that decides whether exact dedup
    * alone recovers most of the budget or near-dup machinery pays for
    * itself — and its shape under the 10x/100x replicated decade corpora
    * is the cleanest duplication-scaling evidence in the suite.
    *
    * Scale shape: one digest shuffle to content diversity, one O(buckets)
    * aggregation, a 1-row total broadcast — nothing downstream of the
    * first shuffle ever sees doc-level rows. */
  private val d31: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    val norm = regexp_replace(lower(col("text")), " +", " ")
    val g = d.select(md5(substring(norm, 1, 64)).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("n_copies"))
    val tot = g.agg(sum(col("n_copies")).as("total_docs"))
    g.withColumn("copies_bucket",
        when(col("n_copies") >= 10, lit(10L)).otherwise(col("n_copies")))
      .groupBy(col("copies_bucket"))
      .agg(count(lit(1)).as("n_groups"), sum(col("n_copies")).as("n_docs"))
      .crossJoin(broadcast(tot))
      .withColumn("permille_docs", expr("n_docs * 1000 div total_docs"))
      .select(col("copies_bucket"), col("n_groups"), col("n_docs"),
        col("permille_docs"))
      .psort(col("copies_bucket"))
  }

  private val d31Sql =
    """WITH g AS (
      |  SELECT MD5(SUBSTR(REGEXP_REPLACE(LOWER(text), ' +', ' ', 'g'), 1, 64))
      |      AS h, COUNT(*) AS n_copies
      |  FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_copies) AS BIGINT) AS total_docs FROM g),
      |b AS (
      |  SELECT CASE WHEN n_copies >= 10 THEN 10 ELSE n_copies END
      |      AS copies_bucket,
      |    COUNT(*) AS n_groups, CAST(SUM(n_copies) AS BIGINT) AS n_docs
      |  FROM g GROUP BY 1)
      |SELECT CAST(copies_bucket AS BIGINT) AS copies_bucket, n_groups, n_docs,
      |  n_docs * 1000 // total_docs AS permille_docs
      |FROM b, tot ORDER BY copies_bucket""".stripMargin

  // ---- d32: band-store compaction report (takedown maintenance) -----------
  /** d32: the maintenance path the d27 band store needs once takedowns
    * arrive (DMCA/user-deletion: doc_id % 11 == 6): physically drop the
    * tombstoned docs' band keys from the persisted store and emit the
    * per-band maintenance report an operator pages on — keys before/after,
    * deleted count, post-compaction distinct-bucket count, the hottest
    * bucket, and the hot flag (max bucket > 4x the post-compaction mean —
    * a band whose hash pair stopped discriminating). s35 is this exact job
    * for the ANN index; the dedup store ages the same way.
    *
    * Scale shape: the takedown list joins the store as an oid equi
    * anti-join (corpus-proportional list — NOT broadcast; co-partitionable
    * on the store's bucket layout at 100 TB); both reports are per-band
    * aggs over (band, bkey) partials — 4 output rows; no pairs anywhere. */
  private val d32: Q = (s, dir) => {
    val store = d27Store(s, dir)
      .withColumn("band", split(col("bkey"), "_").getItem(0).cast("int"))
    val tomb = t(s, dir, "documents").filter(col("doc_id") % 11 === 6)
      .select(col("doc_id").as("del_id"))
    val after = store.join(tomb, col("oid") === col("del_id"), "left_anti")
    val before = store.groupBy(col("band"))
      .agg(count(lit(1)).as("keys_before"))
    val afterAgg = after.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("band"))
      .agg(sum(col("n")).as("keys_after"),
        count(lit(1)).as("buckets_after"),
        max(col("n")).as("max_bucket_after"))
    before.join(afterAgg, Seq("band"), "left")
      .select(col("band"), col("keys_before"),
        coalesce(col("keys_after"), lit(0L)).as("keys_after"),
        (col("keys_before") - coalesce(col("keys_after"), lit(0L)))
          .as("n_deleted"),
        coalesce(col("buckets_after"), lit(0L)).as("buckets_after"),
        coalesce(col("max_bucket_after"), lit(0L)).as("max_bucket_after"))
      .withColumn("hot",
        col("max_bucket_after") * col("buckets_after") >
          col("keys_after") * 4L)
      .psort(col("band"))
  }

  private[queries] val d32Sql: String = {
    val sigCols = (0 until 8).map(i => s"${minhashSql(i)} AS m$i")
      .mkString(",\n   ")
    val bandRows = (0 until 4).map { b =>
      s"SELECT doc_id, $b || '_' || m${2 * b} || '_' || m${2 * b + 1} AS bkey FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH docs AS ($docsShSql),
       |sig AS (SELECT doc_id, sh,
       |   $sigCols
       |  FROM docs),
       |bands AS (
       |  $bandRows),
       |store AS (SELECT doc_id AS oid,
       |    CAST(SPLIT_PART(bkey, '_', 1) AS INTEGER) AS band, bkey
       |  FROM bands WHERE doc_id % 10 <> 3),
       |aft AS (SELECT * FROM store WHERE oid % 11 <> 6),
       |bef AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS keys_before
       |        FROM store GROUP BY band),
       |pk AS (SELECT band, bkey, COUNT(*) AS n FROM aft GROUP BY band, bkey),
       |ag AS (SELECT band, CAST(SUM(n) AS BIGINT) AS keys_after,
       |         CAST(COUNT(*) AS BIGINT) AS buckets_after,
       |         CAST(MAX(n) AS BIGINT) AS max_bucket_after
       |       FROM pk GROUP BY band)
       |SELECT b.band, b.keys_before,
       |  CAST(COALESCE(a.keys_after, 0) AS BIGINT) AS keys_after,
       |  b.keys_before - CAST(COALESCE(a.keys_after, 0) AS BIGINT)
       |    AS n_deleted,
       |  CAST(COALESCE(a.buckets_after, 0) AS BIGINT) AS buckets_after,
       |  CAST(COALESCE(a.max_bucket_after, 0) AS BIGINT) AS max_bucket_after,
       |  CAST(COALESCE(a.max_bucket_after, 0) AS BIGINT)
       |    * CAST(COALESCE(a.buckets_after, 0) AS BIGINT)
       |    > CAST(COALESCE(a.keys_after, 0) AS BIGINT) * 4 AS hot
       |FROM bef b LEFT JOIN ag a ON b.band = a.band
       |ORDER BY b.band""".stripMargin
  }

  // ---- d33: order-independent corpus checksum (replica verification) ------
  /** d33: the replica-verification primitive dataset versioning needs —
    * an ORDER-INDEPENDENT per-source checksum (bit-XOR and modular sum of
    * per-doc content-digest integers, plus count and byte mass) that two
    * replicas compute independently and compare without sorting, shipping,
    * or row-aligning anything. XOR and wrapping sum are commutative and
    * associative, so any partitioning/arrival order yields the same
    * checksum — the property that makes this check O(k) to compare at
    * 100 TB. The digest covers (doc_id, content), so a swapped text
    * between two docs changes the checksum even though the multiset of
    * texts is identical.
    *
    * Scale shape: one map-only digest pass, one per-source agg with
    * map-side partials — the flattest shape; output is one row per
    * source. */
  private val d33: Q = (s, dir) => {
    val dg = md5i(concat(col("doc_id").cast("string"), lit("|"), col("text")))
    t(s, dir, "documents")
      .select(col("source"), dg.as("dg"),
        length(col("text")).cast("long").as("n_chars"))
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        expr("bit_xor(dg)").as("xor_digest"),
        // second independent accumulator: a modular sum catches the
        // multiset changes XOR cancels (a doc duplicated twice). Terms
        // reduce mod 2^20 BEFORE summing so the BIGINT running sum stays
        // exact (never wraps) up to 2^43 docs per source — Spark's long
        // sum wraps silently at 2^63 while DuckDB promotes to HUGEINT, so
        // the sum must provably never overflow on either engine
        sum(col("dg") % 1048576L).as("sum_digest_raw"))
      .select(col("source"), col("n_docs"), col("total_chars"),
        col("xor_digest"),
        (col("sum_digest_raw") % 1048576L).as("sum_digest"))
      .psort(col("source"))
  }

  private val d33Sql =
    s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
       |  CAST(BIT_XOR(dg) AS BIGINT) AS xor_digest,
       |  CAST(SUM(dg % 1048576) % 1048576 AS BIGINT)
       |    AS sum_digest
       |FROM (SELECT source, text,
       |    ${md5iSql("CAST(doc_id AS VARCHAR) || '|' || text")} AS dg
       |  FROM documents)
       |GROUP BY source ORDER BY source""".stripMargin

  // ---- d34: shingle-width ablation (verdict-stability audit) ---------------
  /** d34: the parameter-sensitivity audit before committing a dedup
    * config — does the w=3 word-shingle the whole pipeline standardizes
    * on agree with w=5 on THIS corpus? Over the shared df-capped 3-gram
    * candidate pairs, both jaccards are compared at the 0.5 threshold in
    * EXACT integer form (2*common >= union — no float compare anywhere)
    * and the agreement matrix reported per class with mean floor-permille
    * jaccards. A large only_w3 class means w=3 over-fires on short
    * templates; only_w5 means it under-merges long near-dups — either
    * reads as "re-tune before the full run".
    *
    * Scale shape: rides the ONE persisted candidate-pair frame (postings
    * with df cap — never all-pairs); the w=5 shingle arrays join in by
    * doc_id; output is <= 4 rows. */
  private val d34: Q = (s, dir) => {
    val cand = shinglePairCounts(s, dir)
    // round-9 duplicate-collapse discipline: every jaccard here is a
    // function of CONTENT alone, so the expensive w5 intersect runs once
    // per distinct content PAIR, weighted by doc-pair multiplicity — on a
    // duplicated corpus candidates shrink by the duplication factor
    // squared (the uncollapsed spelling measured 28.9 s at sf1 vs 2.3 s)
    // the content collapse is itself a build-once index (one linear pass
    // over the doc-level candidates, persisted like shinglePairCounts):
    // the ablation — and any future parameter sweep — then works at
    // content diversity, which replication leaves constant
    val byContent = memoized(s"d34bycontent:$dir") {
      val meta = t(s, dir, "documents")
        .select(col("doc_id").as("mid"), md5(col("text")).as("dg"))
        .join(docsWithShingles(s, dir)
          .select(col("doc_id").as("mid"), col("n")), Seq("mid"))
      cand
        .join(meta.as("g1"), col("d1") === col("g1.mid"))
        .join(meta.as("g2"), col("d2") === col("g2.mid"))
        .select(col("g1.dg").as("dg1"), col("g2.dg").as("dg2"),
          col("common"),
          (col("g1.n") + col("g2.n") - col("common")).as("u3"))
        .groupBy(col("dg1"), col("dg2"), col("common"), col("u3"))
        .agg(count(lit(1)).as("mult"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    val w5 = memoized(s"d34w5:$dir") {
      t(s, dir, "documents")
        .filter(size(split(col("text"), " ")) >= 5)
        .select(md5(col("text")).as("dg"),
          array_distinct(expr(
            "transform(sequence(0, size(split(text, ' ')) - 5)," +
              " i -> concat_ws(' ', slice(split(text, ' '), i + 1, 5)))"))
            .as("sh5"))
        .groupBy(col("dg")).agg(first(col("sh5")).as("sh5"))
        .select(col("dg"), col("sh5"), size(col("sh5")).as("n5"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    val j = byContent
      .join(w5.as("a5"), col("dg1") === col("a5.dg"))
      .join(w5.as("b5"), col("dg2") === col("b5.dg"))
      .select(col("mult"), col("common"), col("u3"),
        expr("graft_icount(a5.sh5, b5.sh5)").as("c5"), // count-only intersect (r14)
        col("a5.n5").as("n5a"), col("b5.n5").as("n5b"))
      .select(col("mult"),
        expr("common * 1000 div u3").as("j3p"),
        expr("c5 * 1000 div (n5a + n5b - c5)").as("j5p"),
        (col("common") * 2 >= col("u3")).as("v3"),
        (col("c5") * 2 >= col("n5a") + col("n5b") - col("c5")).as("v5"))
    j.select(
        when(col("v3") && col("v5"), "both")
          .when(col("v3"), "only_w3")
          .when(col("v5"), "only_w5")
          .otherwise("neither").as("verdict_class"),
        col("mult"), col("j3p"), col("j5p"))
      .groupBy(col("verdict_class")).agg(
        sum(col("mult")).as("n_pairs"),
        expr("sum(j3p * mult) div sum(mult)").as("mean_j3_permille"),
        expr("sum(j5p * mult) div sum(mult)").as("mean_j5_permille"))
      .psort(col("verdict_class"))
  }

  private val d34Sql =
    s"""WITH docs AS ($docsShSql),
       |ex AS (SELECT doc_id, UNNEST(sh) AS s FROM docs),
       |rare AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) <= 100),
       |exr AS (SELECT ex.doc_id, ex.s FROM ex JOIN rare USING (s)),
       |cand AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
       |  FROM exr a JOIN exr b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, LEN(sh) AS n FROM docs),
       |w5 AS (
       |  SELECT doc_id,
       |    LIST_DISTINCT([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
       |      || w[i+3] || ' ' || w[i+4] FOR i IN RANGE(1, LEN(w) - 3)])
       |      AS sh5
       |  FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents)
       |  WHERE LEN(w) >= 5),
       |j AS (
       |  SELECT c.common,
       |    a3.n + b3.n - c.common AS u3,
       |    LEN(LIST_INTERSECT(a5.sh5, b5.sh5)) AS c5,
       |    LEN(a5.sh5) AS n5a, LEN(b5.sh5) AS n5b
       |  FROM cand c
       |  JOIN sizes a3 ON c.d1 = a3.doc_id
       |  JOIN sizes b3 ON c.d2 = b3.doc_id
       |  JOIN w5 a5 ON c.d1 = a5.doc_id
       |  JOIN w5 b5 ON c.d2 = b5.doc_id),
       |cls AS (
       |  SELECT common * 1000 // u3 AS j3p,
       |    c5 * 1000 // (n5a + n5b - c5) AS j5p,
       |    CASE WHEN common * 2 >= u3 AND c5 * 2 >= n5a + n5b - c5
       |           THEN 'both'
       |         WHEN common * 2 >= u3 THEN 'only_w3'
       |         WHEN c5 * 2 >= n5a + n5b - c5 THEN 'only_w5'
       |         ELSE 'neither' END AS verdict_class
       |  FROM j)
       |SELECT verdict_class, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(SUM(j3p) // COUNT(*) AS BIGINT) AS mean_j3_permille,
       |  CAST(SUM(j5p) // COUNT(*) AS BIGINT) AS mean_j5_permille
       |FROM cls GROUP BY verdict_class ORDER BY verdict_class""".stripMargin

  // ---- d36: KMV distinct-cardinality sketch audit ----------------------------
  /** d36: K-MINIMUM-VALUES cardinality — the sketch every dedup planner
    * consults BEFORE paying for the dedup itself: how many distinct
    * documents does each source actually hold? KMV keeps the k smallest
    * 48-bit content fingerprints per source; the k-th smallest value h_k
    * estimates distinct-count as (k-1) * 2^48 / h_k (Bar-Yossef et al.
    * 2002). The audit reports the estimate against the exact distinct
    * count with an integer permille error — the number that decides
    * whether the sketch's k is adequate for the corpus.
    *
    * Everything is exact integers end-to-end: the fingerprint universe is
    * the first 12 hex chars of md5 (48 bits — identical in both engines;
    * collision odds at 500k docs are ~4e-4), the estimator is one integer
    * division, and a source with fewer than k distinct values reports its
    * sketch size (the sketch IS exact below k).
    *
    * Scale shape: one distinct shuffle on (source, fingerprint) with
    * map-side partials, then a per-source top-k window over k=32 rows —
    * per-partition rank pruning keeps the window input tiny. A KMV sketch
    * merges by union+truncate, so at 100 TB the per-shard sketches combine
    * associatively without re-scanning (this query also computes the exact
    * side only because it's the audit). */
  private val d36: Q = (s, dir) => {
    val k = 32
    val dh = t(s, dir, "documents")
      .select(col("source"),
        conv(substring(md5(col("text")), 1, 12), 16, 10).cast("long").as("h"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("h"))
    val sketch = dh.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .groupBy(col("source"))
      .agg(max(when(col("rnk") === k, col("h"))).as("hk"),
        count(lit(1)).as("n_in_sketch"))
    val exact = dh.groupBy(col("source"))
      .agg(count(lit(1)).as("exact_distinct"))
    sketch.join(exact, Seq("source"))
      .withColumn("kmv_estimate",
        when(col("n_in_sketch") < k, col("n_in_sketch"))
          .otherwise(expr(s"(${k - 1} * 281474976710656) div hk")))
      .withColumn("err_permille",
        expr("abs(kmv_estimate - exact_distinct) * 1000 div exact_distinct"))
      .select(col("source"), col("exact_distinct"), col("n_in_sketch"),
        col("hk"), col("kmv_estimate"), col("err_permille"))
      .psort(col("source"))
  }

  private val d36Sql =
    """WITH dh AS (
      |  SELECT DISTINCT source,
      |    ('0x' || substr(md5(text), 1, 12))::BIGINT AS h
      |  FROM documents),
      |r AS (
      |  SELECT source, h,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rnk
      |  FROM dh),
      |sk AS (
      |  SELECT source, MAX(CASE WHEN rnk = 32 THEN h END) AS hk,
      |    CAST(COUNT(*) AS BIGINT) AS n_in_sketch
      |  FROM r WHERE rnk <= 32 GROUP BY source),
      |ex AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS exact_distinct
      |  FROM dh GROUP BY source),
      |est AS (
      |  SELECT sk.source, exact_distinct, n_in_sketch, hk,
      |    CAST(CASE WHEN n_in_sketch < 32 THEN n_in_sketch
      |      ELSE 31 * 281474976710656 // hk END AS BIGINT) AS kmv_estimate
      |  FROM sk JOIN ex ON sk.source = ex.source)
      |SELECT source, exact_distinct, n_in_sketch, hk, kmv_estimate,
      |  CAST(ABS(kmv_estimate - exact_distinct) * 1000 // exact_distinct
      |    AS BIGINT) AS err_permille
      |FROM est ORDER BY source""".stripMargin

  // ---- d37: b-bit minhash (Li & Koenig, CACM 2011) ----------------------
  /** d37: 1-bit minhash — keep only the LOWEST BIT of each of the 8
    * minhashes (a 32-64x sketch compression at production k) and estimate
    * jaccard from the bit-agreement rate: for b=1, E[agree/k] = (1+J)/2,
    * so J_hat = 2*agree/k - 1 — the exact integer spelling at k=8 is
    * (agree-4)*250 permille, clamped at 0. Per LSH candidate pair at
    * CONTENT diversity (the d03 representative collapse), the gate
    * reports the agreement count, the 1-bit estimate, the EXACT jaccard
    * permille, and the absolute estimator error — the sketch-quality
    * audit a pipeline runs before swapping full signatures for packed
    * bits.
    *
    * Scale shape: signatures and candidates are the d03 chain (inverted
    * band postings, never O(n^2)); the 1-bit columns are a projection of
    * the already-built signature frame; one join against the shingle
    * frame for the exact-jaccard verify — all at content diversity
    * (expansion back to doc pairs stays output-proportional; not taken
    * here, d03's precedent). */
  private val d37: Q = (s, dir) => {
    val g = docGroups(s, dir)
    val reps = docsWithShingles(s, dir).as("d")
      .join(g.filter(col("doc_id") === col("rep"))
        .select(col("rep").as("rid")), col("d.doc_id") === col("rid"))
      .select(col("d.doc_id"), col("d.sh"), col("d.n"), col("d.hv"))
    // r13 (guide §1.2/§2.4 — compute the sketch once): the signature frame
    // feeds FOUR consumers (bit projection, band candidates, and both
    // exact-verify shingle sides); unpinned, each consumer re-ran the
    // rep join + the 8-hash minhash fold over every shingle array
    // (profiled: ~25 task-seconds of pure recompute). One eager
    // localCheckpoint materializes it once per invocation.
    val sig = minhashSigOf(reps).localCheckpoint(true)
    val bits = sig.select(
      (col("doc_id") +: (0 until 8).map(i =>
        (col(s"m$i") % 2).cast("int").as(s"b$i"))): _*)
    val cand = repCandidates(s, dir) // shared candidate pass (r14)
    val agreeExpr = (0 until 8)
      .map(i => s"(CASE WHEN a$i = x$i THEN 1 ELSE 0 END)").mkString(" + ")
    cand
      .join(sig.select(col("doc_id").as("d1"), col("sh").as("sh1")), Seq("d1"))
      .join(sig.select(col("doc_id").as("d2"), col("sh").as("sh2")), Seq("d2"))
      .join(bits.toDF(("d1" +: (0 until 8).map(i => s"a$i")): _*), Seq("d1"))
      .join(bits.toDF(("d2" +: (0 until 8).map(i => s"x$i")): _*), Seq("d2"))
      .selectExpr("d1", "d2",
        s"CAST($agreeExpr AS INT) AS agree_bits",
        s"CAST(GREATEST(($agreeExpr - 4) * 250, 0) AS BIGINT) AS est_permille",
        "CAST((1000 * graft_icount(sh1, sh2)) DIV " + // count-only intersect (r14)
          "(size(sh1) + size(sh2) - graft_icount(sh1, sh2)) " +
          "AS BIGINT) AS jacc_permille")
      .withColumn("err_permille",
        abs(col("est_permille") - col("jacc_permille")))
      .psort(col("d1"), col("d2"))
  }

  private val d37Sql = {
    val sigCols = (0 until 8).map(i => s"${minhashSql(i)} AS m$i")
      .mkString(",\n   ")
    val bandRows = (0 until 4).map { b =>
      s"SELECT doc_id, $b AS band, m${2 * b} || '_' || m${2 * b + 1} AS key FROM sig"
    }.mkString("\n  UNION ALL ")
    val agree = (0 until 8)
      .map(i => s"(CASE WHEN s1.m$i % 2 = s2.m$i % 2 THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH docs AS ($docsShSql),
       |reps AS (SELECT MIN(doc_id) AS doc_id, sh FROM docs GROUP BY sh),
       |sig AS (SELECT doc_id, sh,
       |   $sigCols
       |  FROM reps),
       |bands AS (
       |  $bandRows),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |pair AS (
       |  SELECT d1, d2, $agree AS agree,
       |    LEN(LIST_INTERSECT(s1.sh, s2.sh)) AS inter,
       |    LEN(s1.sh) + LEN(s2.sh) - LEN(LIST_INTERSECT(s1.sh, s2.sh)) AS uni
       |  FROM cand
       |  JOIN sig s1 ON d1 = s1.doc_id
       |  JOIN sig s2 ON d2 = s2.doc_id)
       |SELECT d1, d2, CAST(agree AS INTEGER) AS agree_bits,
       |  CAST(GREATEST((agree - 4) * 250, 0) AS BIGINT) AS est_permille,
       |  CAST((1000 * inter) // uni AS BIGINT) AS jacc_permille,
       |  CAST(ABS(GREATEST((agree - 4) * 250, 0) - (1000 * inter) // uni)
       |    AS BIGINT) AS err_permille
       |FROM pair ORDER BY d1, d2""".stripMargin
  }

  // ---- d38: source-level minhash (mergeable overlap sketch) -------------
  /** d38: SOURCE-level minhash — the signature of a source is the MIN of
    * its documents' per-hash minhashes, which makes it MERGEABLE: shards
    * compute partial mins map-side and the coordinator combines with
    * another min, no shingle ever leaves its partition. The estimator
    * agree/k over the 8-hash contract approximates the shingle-set
    * jaccard between sources (est = agree*125 permille at k=8); the gate
    * verifies it against the EXACT source-pair jaccard over distinct
    * shingles and reports the error — the cheap cross-corpus overlap
    * triage a pipeline runs before committing to a full d29-style matrix.
    *
    * Scale shape: the sketch side is ONE aggregation (min per source x 8
    * hashes, map-side partials) over the persisted signature frame — the
    * whole point at 100 TB. The exact side (verification only) is one
    * (source, shingle) distinct and one shingle equi-join grouped to the
    * sources^2-bounded pair matrix. */
  /** Distinct (source, 3-gram) inventory over the shingled corpus — the
    * shared index of the cross-source overlap family: d38's exact-verify
    * leg and x40's overlap matrix both reduce to aggregations over exactly
    * this frame (r14 — they used to build it independently; same
    * tokenize-once lifecycle as [[docsWithShingles]]). The map-side
    * partial distinct collapses replicated docs before the exchange. */
  private[queries] def sourceGrams(s: SparkSession, dir: String): DataFrame =
    memoized(s"srcgrams:$dir")(
      docsWithShingles(s, dir)
        .join(t(s, dir, "documents").select(col("doc_id"), col("source")),
          Seq("doc_id"))
        .select(col("source"), explode(col("sh")).as("g"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK))

  private val d38: Q = (s, dir) => {
    val src = t(s, dir, "documents").select(col("doc_id"), col("source"))
    val sig = minhashSig(s, dir).join(src, Seq("doc_id"))
    // r13: pin the sources-bounded sketch once — it feeds TWO broadcast
    // joins below (a-side + b-side), and an unpinned plan re-runs the
    // full corpus minhash fold per consumer (guide §2.4: don't compute
    // things twice). O(sources) rows, eager localCheckpoint.
    val ssig = sig.groupBy(col("source"))
      .agg(min(col("m0")).as("m0"), min(col("m1")).as("m1"),
        min(col("m2")).as("m2"), min(col("m3")).as("m3"),
        min(col("m4")).as("m4"), min(col("m5")).as("m5"),
        min(col("m6")).as("m6"), min(col("m7")).as("m7"))
      .localCheckpoint(true)
    // r14 exact-verify restructure (guide §1.2/§2.3, VERDICT r13 item 3):
    // the r13 shape rebuilt a private (source, sh-ARRAY) distinct — a full
    // shuffle of the shingle arrays — exploded it, re-aggregated it to
    // per-gram source sets, and checkpoint-pinned that frame for its two
    // consumers. The distinct (source, gram) inventory it derives is
    // byte-identical to the one x40 already maintains ([[sourceGrams]]):
    // read the shared persisted index instead. `sizes` becomes one
    // map-side-partial count over it, and the gram->source-set aggregation
    // feeds its now-SINGLE consumer directly, so the array-serializing
    // localCheckpoint pin goes away with it (the d39/d06 lesson).
    val sg = sourceGrams(s, dir)
    val sizes = sg.groupBy(col("source")).agg(count(lit(1)).as("n"))
    // r14 (§2.5, VERDICT item 4): pair expansion via PairExpand — streams
    // the |sources|^2 pairs out across |sources| rows instead of building
    // them all inside ONE row (hot-gram skew safety); identical pair set.
    val common = graft.operators.PairExpand.pairCounts(
      sg.groupBy(col("g"))
        .agg(sort_array(collect_set(col("source"))).as("ss")),
      "ss", "c")
    val agreeExpr = (0 until 8)
      .map(i => s"(CASE WHEN am$i = bm$i THEN 1 ELSE 0 END)").mkString(" + ")
    common
      // r14: |sources|-row frame — broadcast explicitly (x40 precedent);
      // size ESTIMATES over the memo scan otherwise plan these as SMJs
      .join(broadcast(sizes.select(col("source").as("s1"), col("n").as("n1"))),
        Seq("s1"))
      .join(broadcast(sizes.select(col("source").as("s2"), col("n").as("n2"))),
        Seq("s2"))
      .join(broadcast(ssig.toDF(("s1" +: (0 until 8).map(i => s"am$i")): _*)),
        Seq("s1"))
      .join(broadcast(ssig.toDF(("s2" +: (0 until 8).map(i => s"bm$i")): _*)),
        Seq("s2"))
      .selectExpr("s1", "s2",
        s"CAST($agreeExpr AS INT) AS agree_bits",
        s"CAST(($agreeExpr) * 125 AS BIGINT) AS est_permille",
        "CAST((1000 * c) DIV (n1 + n2 - c) AS BIGINT) AS jacc_permille")
      .withColumn("err_permille",
        abs(col("est_permille") - col("jacc_permille")))
      .psort(col("s1"), col("s2"))
  }

  private val d38Sql = {
    val sigCols = (0 until 8).map(i => s"${minhashSql(i)} AS m$i")
      .mkString(",\n   ")
    val minCols = (0 until 8).map(i => s"MIN(m$i) AS m$i").mkString(", ")
    val agree = (0 until 8)
      .map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH docs AS (
       |  SELECT doc_id, source, $shinglesSql AS sh
       |  FROM (SELECT doc_id, source, STRING_SPLIT(text, ' ') AS w
       |        FROM documents)
       |  WHERE LEN(w) >= 3),
       |sig AS (SELECT doc_id, source, sh,
       |   $sigCols
       |  FROM docs),
       |ssig AS (SELECT source, $minCols FROM sig GROUP BY source),
       |sh AS (SELECT DISTINCT source, UNNEST(sh) AS sg FROM docs),
       |sizes AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
       |common AS (
       |  SELECT a.source AS s1, b.source AS s2, COUNT(*) AS c
       |  FROM sh a JOIN sh b ON a.sg = b.sg AND a.source < b.source
       |  GROUP BY 1, 2),
       |pair AS (
       |  SELECT s1, s2, $agree AS agree, c, n1.n + n2.n - c AS uni
       |  FROM common
       |  JOIN sizes n1 ON s1 = n1.source
       |  JOIN sizes n2 ON s2 = n2.source
       |  JOIN ssig a ON s1 = a.source
       |  JOIN ssig b ON s2 = b.source)
       |SELECT s1, s2, CAST(agree AS INTEGER) AS agree_bits,
       |  CAST(agree * 125 AS BIGINT) AS est_permille,
       |  CAST((1000 * c) // uni AS BIGINT) AS jacc_permille,
       |  CAST(ABS(agree * 125 - (1000 * c) // uni) AS BIGINT)
       |    AS err_permille
       |FROM pair ORDER BY s1, s2""".stripMargin
  }

  // ---- d39: one-permutation hashing (Li, Owen & Zhang, 2012) ------------
  /** d39: OPH sketch — the whole k-slot signature from ONE hash pass:
    * each shingle hash h maps to bin h % k with value h / k, the sketch
    * is the per-bin MIN, and empty bins densify by rotation (borrow the
    * nearest non-empty bin to the right, + distance*C to break symmetry
    * — Shrivastava & Li 2014). At 100 TB this is THE production sketch:
    * d03's k affine minhashes cost k passes over every shingle, OPH
    * costs one — same estimator contract (bin collision rate ~ jaccard).
    * The gate computes, per LSH candidate pair at content diversity, the
    * densified-slot agreement, the OPH estimate (agree*125 permille at
    * k=8), the exact jaccard, and the error.
    *
    * Scale shape: one explode + ONE (doc, bin) MIN aggregation with
    * map-side partials builds every sketch; densification is a per-row
    * k-width coalesce (no shuffle); candidates ride the d03 chain. */
  private val OphC = 1000000007L
  private val d39: Q = (s, dir) => {
    val g = docGroups(s, dir)
    // r13 pinned this frame (localCheckpoint) for its four consumers; the
    // driver measured it 0.65x (1.3 -> 2.0 s): checkpoint-serializing the
    // full shingle+hash ARRAYS costs more than re-running the map-only
    // join over the two persisted memo frames — the exact d06 negative
    // result (Dedup.scala d06). r14: UNPINNED; only the fixed-width
    // `dense` sketch (8 longs/row) stays checkpointed below.
    val reps = docsWithShingles(s, dir).as("d")
      .join(g.filter(col("doc_id") === col("rep"))
        .select(col("rep").as("rid")), col("d.doc_id") === col("rid"))
      .select(col("d.doc_id"), col("d.sh"), col("d.hv"))
    val (a, b) = hashAB.head
    // one permutation: h = (a*(x % P) + b) % P; bin = h % 8, val = h / 8
    val bins = reps.select(col("doc_id"),
        explode(expr(s"transform(hv, x -> ($a * (x % $P) + $b) % $P)"))
          .as("h"))
      .groupBy(col("doc_id"))
      .agg(min(when(col("h") % 8 === 0, expr("h div 8"))).as("b0"),
        (1 until 8).map(j =>
          min(when(col("h") % 8 === j, expr("h div 8"))).as(s"b$j")): _*)
    // rotation densification: slot j = nearest non-empty bin rightward
    // (circular), + distance * C
    // r13: pinned — consumed twice (a-side + x-side of the pair join),
    // and its build is the expensive hv explode + 8-way min aggregation
    val dense = bins.select(
      (col("doc_id") +: (0 until 8).map { j =>
        coalesce((0 until 8).map(d =>
          col(s"b${(j + d) % 8}") + lit(d.toLong * OphC)): _*).as(s"s$j")
      }): _*)
      .localCheckpoint(true)
    // r14: shared candidate pass — the same rep-level band postings the
    // d03 chain and d37 enumerate; was a per-pass 8-hash fold + 2 shuffles
    val cand = repCandidates(s, dir)
    val agreeExpr = (0 until 8)
      .map(i => s"(CASE WHEN a$i = x$i THEN 1 ELSE 0 END)").mkString(" + ")
    cand
      .join(reps.select(col("doc_id").as("d1"), col("sh").as("sh1")), Seq("d1"))
      .join(reps.select(col("doc_id").as("d2"), col("sh").as("sh2")), Seq("d2"))
      .join(dense.toDF(("d1" +: (0 until 8).map(i => s"a$i")): _*), Seq("d1"))
      .join(dense.toDF(("d2" +: (0 until 8).map(i => s"x$i")): _*), Seq("d2"))
      .selectExpr("d1", "d2",
        s"CAST($agreeExpr AS INT) AS agree_slots",
        s"CAST(($agreeExpr) * 125 AS BIGINT) AS est_permille",
        "CAST((1000 * graft_icount(sh1, sh2)) DIV " + // count-only intersect (r14)
          "(size(sh1) + size(sh2) - graft_icount(sh1, sh2)) " +
          "AS BIGINT) AS jacc_permille")
      .withColumn("err_permille",
        abs(col("est_permille") - col("jacc_permille")))
      .psort(col("d1"), col("d2"))
  }

  private val d39Sql = {
    val (a, b) = hashAB.head
    val sigCols = (0 until 8).map(i => s"${minhashSql(i)} AS m$i")
      .mkString(",\n   ")
    val bandRows = (0 until 4).map { bq =>
      s"SELECT doc_id, $bq AS band, m${2 * bq} || '_' || m${2 * bq + 1} AS key FROM sig"
    }.mkString("\n  UNION ALL ")
    val binCols = (0 until 8).map(j =>
      s"MIN(CASE WHEN h % 8 = $j THEN h // 8 END) AS b$j").mkString(", ")
    val denseCols = (0 until 8).map { j =>
      val chain = (0 until 8)
        .map(d => s"b${(j + d) % 8} + ${d.toLong * OphC}")
        .mkString("COALESCE(", ", ", ")")
      s"$chain AS s$j"
    }.mkString(",\n   ")
    val agree = (0 until 8)
      .map(i => s"(CASE WHEN p1.s$i = p2.s$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH docs AS ($docsShSql),
       |reps AS (SELECT MIN(doc_id) AS doc_id, sh FROM docs GROUP BY sh),
       |sig AS (SELECT doc_id, sh,
       |   $sigCols
       |  FROM reps),
       |bands AS (
       |  $bandRows),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |hashes AS (
       |  SELECT doc_id,
       |    UNNEST([($a * (${md5iSql("s")} % $P) + $b) % $P FOR s IN sh])
       |      AS h
       |  FROM reps),
       |bins AS (SELECT doc_id, $binCols FROM hashes GROUP BY doc_id),
       |dense AS (SELECT doc_id,
       |   $denseCols
       |  FROM bins),
       |pair AS (
       |  SELECT d1, d2, $agree AS agree,
       |    LEN(LIST_INTERSECT(s1.sh, s2.sh)) AS inter,
       |    LEN(s1.sh) + LEN(s2.sh) - LEN(LIST_INTERSECT(s1.sh, s2.sh)) AS uni
       |  FROM cand
       |  JOIN sig s1 ON d1 = s1.doc_id
       |  JOIN sig s2 ON d2 = s2.doc_id
       |  JOIN dense p1 ON d1 = p1.doc_id
       |  JOIN dense p2 ON d2 = p2.doc_id)
       |SELECT d1, d2, CAST(agree AS INTEGER) AS agree_slots,
       |  CAST(agree * 125 AS BIGINT) AS est_permille,
       |  CAST((1000 * inter) // uni AS BIGINT) AS jacc_permille,
       |  CAST(ABS(agree * 125 - (1000 * inter) // uni) AS BIGINT)
       |    AS err_permille
       |FROM pair ORDER BY d1, d2""".stripMargin
  }

  // ---- d40: simhash pair-count certificate (d04's suite-mode twin) --------
  /** d40: the bounded certificate of d04's answer — per-hamming-distance
    * pair counts computed ENTIRELY at the signature level, never
    * enumerating a single doc pair. d04's full enumeration is output-bound
    * (3.11 B rows at the duplicate-heavy sf10 IS the answer — ~66% of a
    * full suite pass), so suite-scale runs gate this certificate instead
    * and keep the enumeration as an opt-in diagnostic
    * (SPARK_GRAFT_BENCH_SKIP, BASELINE.md round-11 notes).
    *
    * Equivalence: with cnt(s) = docs per signature, d04's pair set
    * partitions exactly into hamming-0 pairs (both docs share a signature:
    * sum over s of C(cnt(s), 2)) and hamming-1 pairs (signatures differ in
    * one bit; the 2 x 16-bit pigeonhole band join finds every such
    * signature pair, and each contributes cnt(s1) x cnt(s2) doc pairs).
    * The certificate row per distance carries n_pairs, the distinct docs
    * involved, and the content-group count — so a corrupted enumeration
    * cannot match it by accident.
    *
    * Scale shape: one shuffle to content diversity (the same memoized
    * signature frame d04 persists), then every operator runs over
    * |distinct signatures| rows. Output is 2 rows at any corpus size. */
  private val d40: Q = (s, dir) => {
    val d = memoized(s"d04sig:$dir") {
      t(s, dir, "documents")
        .select(col("doc_id"),
          expr(s"graft_simhash(graft_md5i_array(array_distinct($W)))").as("sim"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    val cnt = d.groupBy(col("sim")).agg(count(lit(1)).as("n"))
    val h0 = cnt.agg(
      coalesce(sum(expr("n * (n - 1) div 2")), lit(0L)).as("n_pairs"),
      coalesce(sum(when(col("n") >= 2, col("n"))), lit(0L)).as("n_docs"),
      count(when(col("n") >= 2, lit(1))).as("n_groups"))
      .select(lit(0L).as("hamming"), col("n_pairs").cast("long"),
        col("n_docs").cast("long"), col("n_groups").cast("long"))
    val sbands = cnt.select(col("sim"),
      explode(array((0 until 2).map { k =>
        struct(lit(k).as("k"),
          shiftright(col("sim"), 16 * k).bitwiseAND(65535).as("byte"))
      }: _*)).as("bk"))
      .select(col("sim"), col("bk.k").as("k"), col("bk.byte").as("byte"))
    val sigPairs = sbands.as("a").join(sbands.as("b"),
        col("a.k") === col("b.k") && col("a.byte") === col("b.byte")
          && col("a.sim") < col("b.sim"))
      .select(col("a.sim").as("s1"), col("b.sim").as("s2"))
      .distinct()
      .filter(bit_count(col("s1").bitwiseXOR(col("s2"))) === 1)
    val pairN = sigPairs
      .join(cnt.as("c1"), col("s1") === col("c1.sim"))
      .join(cnt.as("c2"), col("s2") === col("c2.sim"))
      .agg(coalesce(sum(col("c1.n") * col("c2.n")), lit(0L)).as("n_pairs"),
        count(lit(1)).as("n_groups"))
    val docN = sigPairs.select(col("s1").as("sim"))
      .union(sigPairs.select(col("s2").as("sim"))).distinct()
      .join(cnt, "sim")
      .agg(coalesce(sum(col("n")), lit(0L)).as("n_docs"))
    val h1 = pairN.crossJoin(docN)
      .select(lit(1L).as("hamming"), col("n_pairs").cast("long"),
        col("n_docs").cast("long"), col("n_groups").cast("long"))
    h0.unionAll(h1).psort(col("hamming"))
  }

  private val d40Sql =
    s"""WITH d AS (SELECT doc_id, $simhashSql AS sim FROM documents),
       |c AS (SELECT sim, COUNT(*) AS n FROM d GROUP BY 1),
       |bands AS (
       |  SELECT sim, k, (sim >> (16 * k)) & 65535 AS byte
       |  FROM c, RANGE(0, 2) r(k)),
       |sp AS (
       |  SELECT DISTINCT a.sim AS s1, b.sim AS s2
       |  FROM bands a JOIN bands b
       |    ON a.k = b.k AND a.byte = b.byte AND a.sim < b.sim
       |  WHERE BIT_COUNT(XOR(a.sim, b.sim)) = 1),
       |h0 AS (SELECT CAST(0 AS BIGINT) AS hamming,
       |  CAST(COALESCE(SUM(n * (n - 1) // 2), 0) AS BIGINT) AS n_pairs,
       |  CAST(COALESCE(SUM(CASE WHEN n >= 2 THEN n END), 0) AS BIGINT)
       |    AS n_docs,
       |  CAST(COUNT(CASE WHEN n >= 2 THEN 1 END) AS BIGINT) AS n_groups
       |  FROM c),
       |h1 AS (SELECT CAST(1 AS BIGINT) AS hamming,
       |  CAST(COALESCE((SELECT SUM(c1.n * c2.n) FROM sp
       |    JOIN c c1 ON sp.s1 = c1.sim
       |    JOIN c c2 ON sp.s2 = c2.sim), 0) AS BIGINT) AS n_pairs,
       |  CAST(COALESCE((SELECT SUM(n) FROM c WHERE sim IN
       |    (SELECT s1 FROM sp UNION SELECT s2 FROM sp)), 0) AS BIGINT)
       |    AS n_docs,
       |  CAST((SELECT COUNT(*) FROM sp) AS BIGINT) AS n_groups)
       |SELECT * FROM h0 UNION ALL SELECT * FROM h1 ORDER BY hamming""".stripMargin

  val queries: Map[String, Q] = Map(
    "d40_simhash_cert" -> d40,
    "d36_kmv_cardinality" -> d36,
    "d37_bbit_minhash" -> d37,
    "d38_source_minhash" -> d38,
    "d39_oph_sketch" -> d39,
    "d35_cross_shard_residual" -> d35,
    "d34_shingle_ablation" -> d34,
    "d33_corpus_checksum" -> d33,
    "d32_store_compaction" -> d32,
    "d31_dup_spectrum" -> d31,
    "d29_source_matrix" -> d29,
    "d28_token_shards" -> d28,
    "d27_lsh_store" -> d27,
    "d26_bucketed_store" -> d26,
    "d25_cluster_cohesion" -> d25,
    "d24_lsh_curve" -> d24,
    "d23_threshold_curve" -> d23,
    "d22_split_assign" -> d22,
    "d21_best_rep" -> d21,
    "d20_editdist_dedup" -> d20,
    "d19_soft_dedup" -> d19,
    "d18_proto_prune" -> d18,
    "d17_span_dedup" -> d17,
    "d16_bloom_prefilter" -> d16,
    "d15_dedup_report" -> d15,
    "d14_winnow_dedup" -> d14,
    "d13_containment_dedup" -> d13,
    "d12_cdc_dedup" -> d12,
    "d11_semdedup" -> d11,
    "d10_incremental_dedup" -> d10,
    "d09_canonical_dedup" -> d09,
    "d08_passage_dedup" -> d08,
    "d07_dedup_clusters" -> d07,
    "d01_dedup_exact" -> d01,
    "d02_dedup_jaccard" -> d02,
    "d03_dedup_minhash_lsh" -> d03,
    "d04_dedup_simhash" -> d04,
    "d05_dedup_embedding" -> d05,
    "d06_minhash_quality" -> d06)

  val oracleSql: Map[String, String] = Map(
    "d40_simhash_cert" -> d40Sql,
    "d36_kmv_cardinality" -> d36Sql,
    "d37_bbit_minhash" -> d37Sql,
    "d38_source_minhash" -> d38Sql,
    "d39_oph_sketch" -> d39Sql,
    "d35_cross_shard_residual" -> d35Sql,
    "d34_shingle_ablation" -> d34Sql,
    "d33_corpus_checksum" -> d33Sql,
    "d32_store_compaction" -> d32Sql,
    "d31_dup_spectrum" -> d31Sql,
    "d29_source_matrix" -> d29Sql,
    "d28_token_shards" -> d28Sql,
    "d27_lsh_store" -> d27Sql,
    "d26_bucketed_store" -> d26Sql,
    "d25_cluster_cohesion" -> d25Sql,
    "d24_lsh_curve" -> d24Sql,
    "d23_threshold_curve" -> d23Sql,
    "d22_split_assign" -> d22Sql,
    "d21_best_rep" -> d21Sql,
    "d20_editdist_dedup" -> d20Sql,
    "d19_soft_dedup" -> d19Sql,
    "d18_proto_prune" -> d18Sql,
    "d17_span_dedup" -> d17Sql,
    "d16_bloom_prefilter" -> d16Sql,
    "d15_dedup_report" -> d15Sql,
    "d14_winnow_dedup" -> d14Sql,
    "d13_containment_dedup" -> d13Sql,
    "d12_cdc_dedup" -> d12Sql,
    "d11_semdedup" -> d11Sql,
    "d10_incremental_dedup" -> d10Sql,
    "d09_canonical_dedup" -> d09Sql,
    "d08_passage_dedup" -> d08Sql,
    "d07_dedup_clusters" -> d07Sql,
    "d01_dedup_exact" -> d01Sql,
    "d02_dedup_jaccard" -> d02Sql,
    "d03_dedup_minhash_lsh" -> d03Sql,
    "d04_dedup_simhash" -> d04Sql,
    "d05_dedup_embedding" -> d05Sql,
    "d06_minhash_quality" -> d06Sql)
}
