package graft

import java.io.PrintWriter

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for headline queries into PLANS.md — the
  * physical-plan evidence behind SURVEY §9's scale claims (broadcast
  * placement, pushdown/pruning, shuffle counts, codegen coverage). PlanSpec
  * asserts the load-bearing properties; this artifact makes them readable.
  * Usage: runMain graft.PlanDump [sfDir] [outFile]
  */
object PlanDump {
  private val headline = Seq(
    "q02_scan_filter_agg" -> "filters + column pruning must reach the parquet scan (PushedFilters / ReadSchema)",
    "q03_join_multiway" -> "every dimension broadcasts; no sort-merge join in the multiway star join",
    "q09_window_topk" -> "WindowGroupLimit prunes top-k map-side, below the exchange",
    "q51_asof_native" -> "custom AsofJoin operator: one exchange + sort per side, streaming merge",
    "d03_dedup_minhash_lsh" -> "LSH candidates come from band-bucket equi-joins over the persisted signature index; no cartesian",
    "d08_passage_dedup" -> "map-only chunking, distinct-agg's two levels with map-side partials, presentation sort",
    "s07_knn_quantized" -> "query side broadcasts; native codegen int dot over the persisted quantized index",
    "x07_tfidf" -> "tiny df/N sides broadcast back onto tf; windowed top-k",
    "x11_decontaminate" -> "bounded benchmark gram set broadcasts; corpus side is one map-only explode + one doc_id shuffle",
    "s08_knn_filtered" -> "metadata predicate filters the candidate stream BELOW the cell join, before any cosine",
    "q65_stats_moments" -> "six decimal moments in one partial_sum aggregation",
    "d12_cdc_dedup" -> "map-only native chunking; one shuffle on the chunk hash for df, hash-partitioned join back",
    "s09_knn_graph" -> "corpus-vs-corpus top-k as a cell equi-join over the trained assignment; WindowGroupLimit below the exchange",
    "x14_stratified_sample" -> "WindowGroupLimit pre-prunes each map task to its local per-stratum top-k before the stratum shuffle",
    "x13_lm_score" -> "bounded bigram model collapses to one broadcast map row; scoring pass is map-only native fold, no per-doc shuffle",
    "q74_stream_e2e" -> "(streaming runtime — result frame is a local snapshot; plan is the final sort only)",
    "q81_asof_sql" -> "textual ASOF JOIN lowers to the same native AsofJoin exec as q51: one exchange + sort per side",
    "q83_pivot_stmt" -> "statement-form PIVOT plans the two-pass pivot: distinct-value discovery, then one pivoting aggregation",
    "m02_image_decode" -> "real BMP/PNG container decode as a typed map-only stage over the binary fixture scan",
    "m07_audio_decode" -> "real WAV/RIFF decode as a typed map-only stage; only the presentation sort shuffles",
    "d14_winnow_dedup" -> "map-only winnowing fingerprints; candidates from df-capped inverted postings (one shuffle on the fingerprint, one on the pair) — no self-join",
    "s12_pq_rerank" -> "ADC shortlist over 8-byte codes, exact re-rank joins raw vectors by id only for the 10-candidate shortlist",
    "x19_reservoir_sample" -> "map-only bounded-draw priorities; WindowGroupLimit prunes per-source top-k below the exchange",
    "x21_cms_heavy_hitters" -> "CMS build is one bounded shuffle (map-side partials absorb the explode); the 2048-cell sketch broadcasts",
    "x22_bpe_encode" -> "merges apply to the bounded distinct-word dictionary; the (word -> n_tokens) dictionary broadcasts back onto the corpus explode",
    "s13_ivf_incremental" -> "batch assigns against the broadcast centroid table (O(batch), corpus index untouched); augmented search stays a cell equi-join",
    "d13_containment_dedup" -> "scores the SAME persisted candidate-pair frame d02 builds (InMemoryTableScan) — one candidate pass, two policies",
    "d16_bloom_prefilter" -> "batch Bloom filter rides the plan as one binary literal and is pushed into the corpus scan's DataFilters — rows drop at the source; confirm join broadcasts the surviving candidates",
    "m09_audio_frames" -> "framewise features over the real PCM decode: typed map-only stage, only the presentation sort shuffles",
    "s14_range_search" -> "radius search is the s02 block equi-join with the threshold filter replacing the top-k window — shuffle-free past the join",
    "x24_ppl_bucket_sample" -> "reuses the persisted x13 scoring pass (InMemoryTableScan); quartiles via DistributedRank cut buckets — the Window partitions on the bucket id, never a single global partition",
    "s15_mmr_diversify" -> "greedy MMR unrolled over the bounded persisted shortlist: block top-k once, 8x8 pairwise-sim self-join, three argmax windows — corpus is touched exactly once",
    "x25_packing_curve" -> "one shard-partitioned cumulative-sum window over the corpus; the three context sizes fan out map-only from the persisted cum frame",
    "q89_gap_fill" -> "grid generated map-only from per-user bounds; one (user, hour) aggregation shuffle + one partition-local IGNORE-NULLS window for the fill",
    "q91_zorder_layout" -> "rank-normalize, constant-folded Morton bit-interleave in codegen, range buckets — the repartitionByRange layout audit",
    "q92_funnel" -> "three user-keyed stage aggregations chained by co-partitioned joins; the shrinking stage frames broadcast under AQE",
    "q93_bucketed_join" -> "both sides read bucketBy/sortBy layouts reporting bucket HashPartitioning — the sort-merge join has ZERO Exchange under it",
    "d17_span_dedup" -> "candidates off d14's persisted winnow postings; exact 40-char gram seeds exploded for candidate docs only; diagonal run-merge windows partition on (pair, diagonal)",
    "x28_url_curation" -> "map-only regex canonicalization; one domain shuffle shared by the cap window and the per-domain aggregation",
    "s17_hybrid_rrf" -> "both arms broadcast the bounded query set (dense crossJoin + lexical shingle join); fusion is a full-outer join of the two 20-per-query shortlists — corpus streams, never self-joins",
    "x30_boilerplate_lines" -> "one line-hash shuffle builds the nd>=3 boilerplate set, which broadcasts back into the map-side flag join — the corpus is never shuffled twice",
    "x31_tokenizer_fertility" -> "the bounded BPE dictionary broadcasts onto the corpus explode (shared bpeDictF build with x22); one 5-row language aggregation",
    "q96_filter_argmax" -> "FILTER folds into the aggregate buffers of ONE hash aggregation with map-side partials; argmax carries a single (key, value) pair per group — no sort, no window",
    "d18_proto_prune" -> "centroids broadcast onto the trained assignment (map-only cosine); prototype ranks in cell-partitioned windows, never global",
    "s16_binary_quant" -> "8-byte sign-bit codes stream against broadcast query codes (XOR+popcount in codegen); only the top-8 shortlist touches raw vectors",
    "m11_audio_resample" -> "2:1 decimation as a typed map-only stage over the real WAV decode; only the presentation sort shuffles",
    "q98_asof_forward" -> "forward direction rides the SAME native sort-merge AsofJoin exec (one exchange + sort per side) on negated epoch-micros axes — no extra shuffle for the direction flip",
    "x29_dsir_resample" -> "the corpus tokenizes ONCE into the persisted per-(doc,bucket) histogram (InMemoryTableScan on the second consumer); the 64-row LLR table broadcasts; top-100 is TakeOrderedAndProject",
    "d19_soft_dedup" -> "bounded cluster labels + sizes broadcast onto one map-only corpus pass; the ledger is one O(sources) aggregation",
    "x32_ngram_novelty" -> "deliberate SHUFFLE anti-join on the gram (reference set is corpus-scale, broadcast does not apply) + one doc aggregation off the shared persisted shingle index",
    "s18_graph_centrality" -> "five chained hash-shuffle iterations on the bounded 3N edge list (InMemoryTableScan, built once from the trained assignment); exact integer arithmetic end to end",
    "s19_knn_ivfpq" -> "probing + query residuals are map-only over the broadcast centroid literal; candidates from ONE coarse-cell equi-join over the persisted coded corpus; ADC is m codebook lookups per pair against the constant-folded books literal",
    "m12_audio_fingerprint" -> "fingerprint extraction is a typed map-only stage over both payload scans; landmark match is a gram equi-join (inverted-index shape) + one (qid,cid,delta) vote shuffle; both rankings are bounded per-query windows",
    "x33_domain_mixture" -> "map-only token count into a #domains-row aggregation; grand totals ride TWO broadcast 1-row joins — never a global window",
    "x34_distribution_drift" -> "one word-keyed count shuffle (map-side partials absorb the explode); broadcast totals; top-15 via TakeOrderedAndProject, not a window",
    "q101_retention_cohorts" -> "per-user MIN and (user,day) DISTINCT are user-keyed hash aggregations; the cohort join is co-partitioned on user_id; the matrix is O(days x 8) rows",
    "d20_editdist_dedup" -> "quadratic Levenshtein runs ONLY on the common>=3 shortlist off the shared persisted candidate pass; text joins are key equi-joins (AQE broadcasts the tiny candidate side)",
    "d21_best_rep" -> "bounded d07 labels join the corpus by key; longest-member argmax is ONE max_by aggregation (no window); O(clusters) output",
    "q104_window_distinct" -> "cumulative COUNT(DISTINCT) via the first-appearance identity: three hash aggregations + a running sum over the O(nations x months) grid — no entity-cardinality window state anywhere (the round-7 rewrite; sf1 6.2 s -> 0.6 s)",
    "q105_volume_shipping" -> "TPC-H Q7 shape: both nation dims broadcast with the pair predicate below the join; fact joins shuffle on their keys; revenue in exact DECIMAL",
    "x37_pmi_collocations" -> "bigram + unigram counts are two map-side-partial shuffles; vocab-sized joins; totals broadcast; top-20 is TakeOrderedAndProject on the exact staged-integer ratio",
    "m14_audio_segments" -> "decode + energy windows + island merge fused in ONE typed map-only stage per clip; only the presentation sort shuffles",
    "s21_tombstone_search" -> "tombstone ids broadcast as a LEFT ANTI join BELOW the cell-probe equi-join — deletes exclude at serve time with no index rebuild",
    "s22_hard_negatives" -> "label-mismatch predicate below the per-query top-k window over trained-cell candidates — contrastive negatives mined with the s08 filtered-ANN shape",
    "m15_image_neardup" -> "phash bands as the pigeonhole candidate equi-join; exact grid-SSD verify joins the bounded pair list back to per-image grids by id",
    "x40_source_overlap" -> "DISTINCT (source, gram) off the shared persisted shingle index; per-gram pair expansion bounded by sources^2, matrix aggregation O(sources^2)",
    "x41_epoch_alloc" -> "one corpus aggregation to O(sources) rows; 2-round water-filling arithmetic against broadcast scalar totals — exact integers end to end",
    "q108_stream_outer" -> "(streaming runtime — stream-stream LEFT OUTER interval join; state bounded by the 30-min interval, outer rows flushed by staged watermark waves)",
    "d22_split_assign" -> "bounded labels broadcast onto one map-only corpus pass (localCheckpoint-truncated lineage — no Pregel plan tower in consumers); violation audit joins the bounded edge frame by key",
    "s23_quant_ladder" -> "every arm reuses its production index machinery (memoized int8/PQ/sign-bit frames); truths are the bounded 20-query broadcast cross joins; output O(methods)",
    "s24_label_prop" -> "two majority-vote rounds, each ONE hash shuffle keyed on the destination over the persisted 3N edge list; seeds never overwritten",
    "s25_ingest_gate" -> "batch probes broadcast centroids (O(batch)); candidates via cell equi-join against the persisted assignment; verdict is one max-agg per batch vector — the corpus never scans",
    "x42_source_similarity" -> "vocabulary CAPPED at top-500 so the pair grid is O(sources^2 x 500) regardless of corpus size; per-source counts aggregate map-side before pair expansion",
    "x43_epoch_shuffle" -> "map-only seeded md5 order-key assignment; the ledger is one 16-row aggregation (the run-time shuffle is repartitionByRange over these keys)",
    "m16_video_keyframe" -> "container decode + pairwise SAD + argmax fused in ONE typed map-only stage per clip; only the presentation sort shuffles",
    "q109_string_agg" -> "ordered listagg/string_agg: one hash aggregation; the in-aggregate ORDER BY is what makes the concatenation deterministic under parallelism",
    "d23_threshold_curve" -> "6-threshold expansion of the bounded persisted pair list; exact integer buckets; two O(thresholds) aggregations",
    "s26_centroid_drift" -> "corpus and batch distance passes are map-only against the broadcast centroid literal; O(k)-row aggregations; batch never touches the corpus",
    "d24_lsh_curve" -> "analytic S-curve grid is O(configs x 20) literals; observed overlay is one bucket aggregation of the persisted candidate pairs + a broadcast join — the corpus is never rescanned",
    "s27_streaming_ann" -> "(streaming runtime — stream-STATIC cell equi-join against the persisted IVF assignment; probe ranking is the broadcast centroid argmin on the stream side; top-k cut runs batch-side on the snapshot)",
    "p01_pipeline_e2e" -> "(composed engine.sql chain — ingest decode mapPartitions, one canonical-hash shuffle, map-only gate, per-(source,shard) packing windows, hive-partitioned COPY; final plan shown is the read-back summary)",
    "p02_pipeline_streaming" -> "(streaming runtime — flatMapGroupsWithState dedup state keyed on canonical hash, stateless gate filter, parquet append sink; final plan is the per-source summary over the landed files)",
    "q110_update_from" -> "joined UPDATE: one LEFT join target-vs-source, per-target-row winner cut, projection swap — the copy-on-write join-update shape",
    "q111_upsert" -> "ON CONFLICT upsert: equi-join on the conflict key for DO UPDATE, anti-join append for fresh rows; exact DECIMAL arithmetic",
    "x44_selfrep_dedup" -> "intra-doc chunking and first-occurrence counting are pure map-side expressions (size minus array_distinct) — the ONLY shuffle is the presentation sort",
    "s28_index_persist" -> "the persisted-index serve path: same cell equi-join as s04 reading centroids + assignment from parquet; centroid collect is O(k) driver-side",
    "d26_bucketed_store" -> "repeated-ingest exact dedup: the canonical store reads its buckets in place (bucketed scan, ZERO store-side exchange); only the O(batch) side shuffles to the store's bucketing",
    "d27_lsh_store" -> "near-dup ingest gate: the persisted band table probes by sort-merge with zero store-side exchange; verify joins touch candidates only",
    "m19_media_quarantine" -> "quarantine verdicts from a real decode attempt with per-row recovery — one typed map-only stage, only the presentation sort shuffles",
    "s29_kcenter_coreset" -> "farthest-point traversal: k map-only passes against broadcast centers, each reduced by a TakeOrderedAndProject top-1 (per-partition partial max)",
    "p03_media_pipeline" -> "(composed: one fused decode pass emits verdict + bands + grid; band-bucket candidate join; SSD verify on candidates; O(formats) manifest aggregation)",
    "q113_merge_into" -> "(MERGE INTO lowers to one left join with an action-indexed projection + one anti join for inserts — the copy-on-write shape; plan shown is the merged snapshot read-back)",
    "p04_cdc_merge" -> "(streaming foreachBatch: each micro-batch collapses to max-seq-per-key and MERGEs with a seq guard; plan shown is the final serve-time tombstone filter)",
    "s30_graph_walk" -> "greedy graph descent: query-sized frontier BROADCASTS at every hop against the persisted s09 adjacency + vectors — the corpus never shuffles; 3 unrolled broadcast-hash-join hops",
    "x45_topic_clusters" -> "topic map from the persisted IVF assignment: one (cell, term) shuffle for cluster tf, cells-sized df broadcast back, top-3 window over k<=8 partitions",
    "d28_token_shards" -> "serpentine token-balanced shards: DistributedRank bucket-partitioned global rank (no single-partition sort), map-only boustrophedon placement, one 8-group audit agg",
    "p05_eval_builder" -> "(composed: md5 hash split map-only; exact-dup semi-join on the canonical digest; contamination re-serves the persisted shingle index with the eval side broadcast; per-source funnel agg)",
    "d29_source_matrix" -> "mirror matrix: one (digest, source) shuffle collapses to content diversity BEFORE the digest self-join (fan-out <= |sources|^2 per group) — no doc-level pairs",
    "s31_adaptive_nprobe" -> "adaptive probe depth: centroids + k-row cell histogram broadcast; coverage cut is a per-query running sum over <= k rows; candidates from the same cell equi-join as s04",
    "x46_ppl_outliers" -> "median/MAD outlier audit over the persisted x13 scoring frame: both medians are source-PARTITIONED windows (never global), mad/med frames broadcast back, one per-source agg",
    "p06_mix_builder" -> "(composed: digest-shuffle canonical collapse; O(sources) water-filling vs broadcast totals; source-partitioned running-sum selection; DistributedRank serpentine shards; per-source manifest agg)",
    "x47_readability" -> "three integer counts per doc in ONE map-only codegen'd pass (regexp + lambda, no UDF); per-source agg; Flesch/FKGL arithmetic on O(sources) rows",
    "p07_dlq_gate" -> "(streaming foreachBatch dual sink: stateless map-only verdict per batch, O(batch) parquet appends to accept + quarantine; plan shown is the per-source manifest over the landed files)",
    "m20_crossformat_dedup" -> "cross-format dedup: typed map-only decode+digest over both containers, ONE shuffle on the content digest, dups join canonicals by digest equality — no pairwise compare",
    "d31_dup_spectrum" -> "duplication spectrum: one digest shuffle to content diversity, O(buckets) agg, 1-row total broadcast — doc-level rows never pass the first shuffle",
    "s32_adaptive_recall" -> "recall audit: bounded 20-query broadcast truth cross join (s05 shape) + the shared adaptive serve frame; audit join at O(queries) rows",
    "s33_embedding_audit" -> "ingest-health audit: O(labels) planting, ONE map-only classify pass (native graft_dot norm), one per-label agg — the flattest corpus shape",
    "m21_audio_clipping" -> "clipping audit: bounded twin planting through the real WAV encoder; one typed map-only decode pass per clip; only the presentation sort shuffles",
    "s34_sharded_serve" -> "scatter-gather: each shard serves the s04 cell equi-join against its OWN persisted assignment (broadcast centroid literal); gather = union of 3-per-query frames + one query-partitioned window — shards never see each other's vectors",
    "m22_png_metadata" -> "metadata audit+strip: one typed map-only walk+strip+redecode pass per image (real chunk traversal); only the presentation sort shuffles",
    "x48_k_anonymity" -> "k-anonymity audit: one tuple-group shuffle with map-side partials; the per-source rollup aggregates group-diversity-sized frames — no windows, no pairs",
    "m23_thumbnail" -> "thumbnail resize: one typed map-only decode+pool+re-encode pass per image; only the presentation sort shuffles",
    "x49_zipf_fit" -> "Zipf fit: one (source, term) count shuffle; the top-20 cut is a WindowGroupLimit (map-side partial top-k below the exchange); the fit aggregates 20 rows per source",
    "s35_index_compaction" -> "index compaction: bounded tombstone list broadcast-anti onto the persisted assignment; two group-by-cell aggs emitting k rows; 1-row total broadcast",
    "p08_refresh_admission" -> "(composed admission funnel: map-only quality rules; distinct-hash exact join; rep-level band equi-join + candidate-proportional jaccard verify; one per-source agg)",
    "p09_stream_admission" -> "(streaming arrival gate: per micro-batch O(batch) band compute, sort-merge probe of the persisted bucketed band store, candidate-proportional jaccard verify, parquet append; plan shown is the landed-verdict read-back)",
    "x50_code_detect" -> "code-vs-prose routing: one map-only feature pass (char/token counting, no regex backtracking); one per-source agg with map-side partials",
    "m24_letterbox" -> "letterbox detection: one typed map-only decode+scan pass per image; only the presentation sort shuffles",
    "s36_retrain_migration" -> "retrain migration audit: broadcast-assign Lloyd retrain on survivors; ONE vec_id equi-join old-vs-new; k^2-bounded matrix aggs + per-old-cell WindowGroupLimit",
    "s37_serving_load" -> "serving load audit: tiny-centroid broadcast + posexplode over the workload; two k-row aggs; 1-row total broadcast",
    "d32_store_compaction" -> "band-store compaction: oid equi ANTI-join of the corpus-proportional takedown list (never broadcast); per-band aggs with map-side partials; 4 output rows",
    "m25_patchify" -> "patchify: one typed map-only decode+flatMap pass exploding each image into its 4x4 patch grid; only the presentation sort shuffles",
    "q116_watermark_audit" -> "watermark audit: per-event-type running-max window (per-partition watermark tracking; no global single-task sort) + one per-type agg",
    "p10_snapshot_diff" -> "snapshot diff: two map-only digest scans; ONE doc_id full-outer sort-merge join; one per-source agg",
    "m26_aspect_buckets" -> "aspect bucketing: typed map-only decode; 6-row broadcast ladder cross join; per-image WindowGroupLimit argmin; 6-row agg",
    "s38_cell_distortion" -> "cell distortion: map-only graft_l2 vs a broadcast k-row centroid frame; fixed-point integer inertia sum (partition-invariant); k-row agg + 1-row total broadcast",
    "x51_canary_tracking" -> "canary sweep: contains() scan prunes docs BEFORE the token explode (vanishing explode input); one tiny per-canary agg",
    "p11_maintenance_run" -> "maintenance run: three k-row rollups over the persisted-index maintenance legs; 3-row union",
    "q117_funnel" -> "ordered funnel: three per-user min aggs chained on ONE join key (user_id); four 1-row broadcast counts into the 4-row stage union",
    "q118_retention" -> "retention cohorts: per-user min + distinct (user, week) projection; ONE user_id equi-join; weeks^2-bounded matrix agg",
    "m27_fake_stereo" -> "fake-stereo audit: one typed map-only WAV decode pass per clip; only the presentation sort shuffles",
    "q119_transitions" -> "transition matrix: per-user lag window (partition-parallel); types^2-bounded agg; types-row broadcast totals",
    "p12_user_erasure" -> "user erasure: two anti-filter scans + linear parquet rewrites; certificate from four 1-row aggs over source and LANDED output",
    "m28_dominant_colors" -> "dominant colors: one typed map-only decode+in-task-histogram pass; only the presentation sort shuffles",
    "s39_embedding_coverage" -> "coverage audit: ONE doc_id/vec_id full-outer sort-merge join; one per-source agg with map-side partials",
    "x52_freq_spectrum" -> "frequency spectrum: one (source, term) count shuffle; vocabulary-bounded re-aggregation",
    "d33_corpus_checksum" -> "corpus checksum: map-only digests; commutative XOR/sum accumulators with map-side partials; k-row output",
    "m29_sharpness" -> "sharpness audit: one typed map-only decode+Laplacian pass per image; only the presentation sort shuffles",
    "q120_attribution" -> "attribution: ONE user_id interval join (state bounded by the 24h window); per-purchase rank window; channel-level agg",
    "s40_margin_audit" -> "margin audit: k-row centroid broadcast; k-multiplied map-side scoring; one vec_id rank window; k-row agg",
    "s41_pq_utilization" -> "PQ utilization: persisted code table; map-only explode to (subspace, code); (m x k)-bounded agg",
    "p13_order_certificate" -> "order certificate: map-only keys; per-shard rank windows (partition-parallel); per-shard agg with bounded modular terms",
    "q121_skew_diagnostics" -> "skew diagnostics: count-per-key shuffles with map-side partials; key-count-bounded re-agg; 2-row output",
    "d34_shingle_ablation" -> "shingle ablation: persisted content-collapsed candidates + per-digest w5 arrays; content-bounded intersect join; <=4-row agg",
    "x53_lang_confusion" -> "confusion matrix: map-only argmax scoring; langs^2-bounded agg; langs-row broadcast totals",
    "q122_skyline" -> "skyline: per-price group minima (map-side partials); distributed prefix-scan = bucket-partitioned windows + <=65-row bucket-min broadcast; one price equi-join back (ties kept); NO global window",
    "m30_palette_png" -> "palette PNG decode: one typed map-only PLTE walk + 1-byte-stride filter reconstruction + palette resolve per image; only the presentation sort shuffles",
    "d35_cross_shard_residual" -> "cross-shard residual: build-once pair list x build-once shard map; two doc_id equi-joins; 8x8-bounded agg",
    "s42_staleness_audit" -> "staleness audit: persisted sig index equi-join (old side filtered in-scan); 20-probe broadcast brute truth leg; per-qid rank windows; left-join + per-qid agg",
    "q123_sequences" -> "sequences: block reservation + partition-ordered zipWithIndex over the ORDER BY'd source (dense ids, no single-task funnel); ordinary append after",
    "d11_semdedup" -> "semdedup (collapsed): distinct (cell, embedding) pair join — content-bounded quadratic; per-vec reconstruction via copy-id order statistics (output-proportional explode); one (cell, vec) agg",
    "q124_check_constraints" -> "CHECK constraints: enforcement is one distributed filter-count per constraint at the alignment choke point (pushdown-bounded scans); plan shown is the surviving-state read",
    "s43_maxsim_multivector" -> "MaxSim late interaction: sub-vector explode on BOTH sides but the query side broadcasts (5 queries x 8 subs); per-(qid,cid,qsub) max + per-pair sum; per-qid rank window",
    "d36_kmv_cardinality" -> "KMV sketch: per-source bottom-k via rank window with map-side WindowGroupLimit; k-row-per-source estimate",
    "x54_encoding_audit" -> "encoding audit: map-only per-char classification folds; one source-level agg with map-side partials",
    "m31_spectral_peak" -> "spectral peak: one typed map-only decode+Goertzel pass per tone; only the presentation sort shuffles",
    "q125_foreign_keys" -> "FOREIGN KEY enforcement: one distributed anti-join count per constraint (parent key projection broadcasts); plan shown is the surviving child-parent join",
    "s44_multiprobe_lsh" -> "multi-probe LSH: 9x probe fan-out on the broadcastable query side only; ONE equi-join on the probe signature against the persisted index; exact re-rank window",
    "d37_bbit_minhash" -> "1-bit minhash: projection of the persisted signature frame; candidates from band postings (content diversity, no self-join); one shingle join for the exact verify",
    "x55_c4_line_rules" -> "C4 line rules: map-only 10-token chunk explode + rule CASE; ONE doc_id aggregation with map-side partials",
    "m32_caption_align" -> "caption alignment: typed map-only decode+histogram per image; ONE doc_id equi-join against the text side (broadcast — images are the curated small side)",
    "q126_insert_by_name" -> "INSERT BY NAME: name-bound alignment is a pure projection over the source plan; plan shown is the final-state read",
    "m33_interlaced_png" -> "Adam7 interlaced decode: one typed map-only 7-pass reconstruction + probe per image; only the presentation sort shuffles",
    "d38_source_minhash" -> "source minhash: mergeable MIN aggregation (map-side partials) over the persisted signature frame; sources^2-bounded pair matrix; exact verify via one shingle equi-join",
    "p14_partition_backfill" -> "partition backfill: v1/v2 roots with per-partition version routing (partition pruning = the manifest); only the stale month recomputes; decimal revenue agg",
    "s45_serving_funnel" -> "serving funnel: broadcast truth leg (audit only); cell equi-join + persisted int8 index shortlist; per-(qid,cid) equi-joins for stage attribution",
    "x56_code_switching" -> "code-switching: map-only chunk scoring; ONE doc_id shuffle shared by the lag window and the dominant-language agg; no joins until the bounded doc-level merge",
    "d39_oph_sketch" -> "OPH sketch: one explode + ONE (doc, bin) MIN agg with map-side partials builds every sketch; densification is a per-row coalesce (no shuffle); candidates ride the d03 postings",
    "q127_alter_column_type" -> "ALTER COLUMN TYPE: copy-on-write projection cast (+USING re-derivation); constraint re-verify is one filter-count; plan shown is the final-state read",
    "q128_set_variable" -> "SET VARIABLE: getvariable splices as typed literals BEFORE parse — the plan is literal-folded, zero runtime lookup; plan shown is the final-state read",
    "d40_simhash_cert" -> "d04's certificate twin: every operator past the signature count runs at |distinct sigs| rows — no join output carries doc_id, output is 2 rows at any sf",
    "q129_read_functions" -> "read_parquet table-function scans: glob expands in the distributed file index; aggregates keep map-side partials over the file scan",
    "q130_list_comprehension" -> "comprehensions lower to transform/filter lambdas inside whole-stage codegen — one map-only projection, only the presentation sort shuffles",
    "q131_struct_literal" -> "struct literals lower to named_struct, constant keys fold; map-only projection, only the presentation sort shuffles",
    "q132_duckdb_names" -> "DuckDB-spelled names resolve to the SAME codegen'd natives (zero UDFs, zero BatchEvalPython): one map-only projection inside WholeStageCodegen, only the presentation sort shuffles",
    "q133_duckdb_temporal" -> "date_diff boundary arithmetic + time_bucket fold to codegen'd date/epoch natives; strftime/epoch_ms over literals CONSTANT-FOLD at analysis; one hash aggregation with map-side partials over the events scan",
    "q134_duckdb_regex" -> "DuckDB-exact regexp_replace (CodegenFallback leaf) rides a plain projection under the lang aggregation; the constant unnest subquery collapses to a literal; only the 5-group aggregate shuffles",
    "q135_duckdb_similarity" -> "byte-level string metrics (jaccard/hamming/damerau/jaro) are codegen'd static calls inside the ONE hash aggregation over the documents scan; list_zip lowers to zip_with lambdas; vector names ride the s-suite codegen'd expressions — no UDF, one group-by shuffle",
    "q136_attach_use" -> "ATTACH resolves name.table to the same fingerprint-cached parquet views as FROM 'file' scans — the attached-dim join broadcasts nation under AQE; one customer aggregation shuffle",
    "q137_duckdb_scalars" -> "wave-5 scalar names (to_hex/format_bytes/bar/parse_*/gamma/gcd/fdiv/julian/make_timestamp/interval constructors) are codegen'd static calls or folded Catalyst composites inside the ONE hash aggregation over the documents scan — no UDF, map-side partials, one 5-group shuffle",
    "q138_duckdb_lists" -> "wave-5 list names lower to zip_with/transform/filter/array_sort lambda composites and the graft_regexp_extract defaults ride codegen'd RegExpExtract(All) — per-row loops inside WholeStageCodegen, one group-by shuffle",
    "q139_duckdb_aggs" -> "product is a 1-double DeclarativeAggregate; entropy/mad/quantile_disc carry value->count maps (O(distinct) state, map-side partial merge by key — the same state DuckDB holds); quantile_cont rides Spark percentile; one aggregation shuffle")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("PLANS.md")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val w = new PrintWriter(out, "UTF-8")
    w.println("# PLANS — formatted physical plans for headline queries")
    w.println()
    w.println(s"Generated by `runMain graft.PlanDump` at `$sfDir`. The properties")
    w.println("called out per query are asserted by `PlanSpec`; this file is the")
    w.println("readable evidence. (AQE is enabled; initial plans shown.)")
    headline.foreach { case (name, note) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      w.println()
      w.println(s"## $name")
      w.println()
      w.println(s"_${note}_")
      w.println()
      w.println("```")
      w.println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      w.println("```")
    }
    w.close()
    println(s"wrote $out")
    spark.stop()
  }
}
