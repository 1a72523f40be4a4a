package graft
import org.apache.spark.sql.SparkSession
/** Regenerates PLANS.md — formatted physical plans for flagship queries. */
object PlanDump {
  /** Nested-loop tripwire allowlist (round-9 verdict #7), shared by
    * the PLANS.md dump and the full-board PlanAuditSpec: a plan
    * containing CartesianProduct or BroadcastNestedLoopJoin FAILS both
    * unless its query is named here with the reason its nested loop is
    * bounded (1-row/domain-bounded broadcast sides, or a deliberately
    * guarded quadratic). An unlisted BNLJ is a scale bug by default.
    */
  val bnljAllowed: Map[String, String] = Map(
    "theilsen_trend" -> ("the pairwise join is inequality-only BY " +
    "NATURE and runs over the guarded ≤10k-day domain, never events"),
    "join_advisor" -> ("1-row global-aggregate crosses (scalars × " +
    "top) — both sides are single-row frames by construction"),
    "bootstrap_diff_ci" -> "1-row replicate-stat frames crossed",
    "bootstrap_ci" -> "1-row totals frame crossed into the CI readout",
    "psi_drift" -> "broadcast 1-row totals frame",
    "t_closeness" -> ("domain-bounded grid cross (guarded classes × " +
    "guarded values) + broadcast 1-row totals"),
    "mutual_information" -> "broadcast 1-row grand-total cross",
    "equidepth_histogram" -> "broadcast 1-row total cross",
    "bh_fdr" -> "broadcast 1-row m-total cross",
    "seasonality_strength" -> "broadcast 1-row overall-mean cross",
    "cusum_changepoint" -> "broadcast 1-row series-mean cross",
    "survival_churn" -> "broadcast 1-row subject-total cross",
    "forecast_eval" -> "broadcast 1-row scale-error cross",
    "collocations_pmi" -> "broadcast 1-row token-total cross",
    "source_divergence" -> "sources×vocab grid from two tiny aggregates",
    "source_weighted_containment" -> ("the pair DOMAIN is an " +
    "inequality-only self-join BY NATURE (a.g < b.g, no equi key — it " +
    "exists to emit explicit 0.0 rows for disjoint pairs) over the " +
    "totals frame, which requireBoundedDomain gates to ≤ maxGroups " +
    "rows in-plan on BOTH sides; the corpus-sized work (weight " +
    "aggregate, shared-mass equi-join) is all equi-keyed"),
    "quantile_estimate" -> "broadcast 1-row exact-comparison frame",
    "benford_digits" -> "broadcast 1-row total cross",
    "search_cosine_topk" -> "broadcast 1-row query-vector frame",
    "search_phi_topk" -> "broadcast 1-row query-vector frame",
    "search_filtered_topk" -> "broadcast 1-row query-vector frame",
    "ann_ivf_topk" -> ("broadcast 1-row query frame + nProbe-row " +
    "probe list"),
    "ann_batch_topk" -> ("broadcast bounded probe ranking (queries × " +
    "nProbe rows)"),
    "ann_recall_curve" -> ("rank-inequality join against the " +
    "broadcast 5-row probe list — row duplication for the sweep " +
    "arms, no re-scoring"),
    "bm25_search" -> "broadcast 1-row corpus stats (N, avgdl)",
    "bm25_persisted" -> "broadcast 1-row corpus stats (N, avgdl)",
    "bm25_ndcg" -> ("broadcast 1-row corpus stats + the ≤|q|+1-row " +
    "grade histogram"),
    "dsir_weights" -> "broadcast 1-row corpus/target totals",
    "hard_negatives" -> ("broadcast bounded (queries × k) neighbor " +
    "frame"),
    "dq_expectations" -> ("the report unions broadcast 1-row " +
    "per-table check frames"),
    "ab_cuped" -> "broadcast 1-row moment (θ) frame",
    "basket_lift" -> "broadcast 1-row basket-total frame",
    "dedup_idf_cosine" -> "broadcast 1-row n_docs frame into the idf projection",
    "dedup_idf_rank" -> "broadcast 1-row n_docs frame into the idf projection",
    // full-board audit triage (round-12, PlanAuditSpec): every entry
    // below was read off its executed plan — all are 1-row aggregate
    // crosses or bounded query-set × corpus scoring (the brute-force
    // definition of the operator), never corpus × corpus
    "ab_power" -> "broadcast 1-row (n, rate) frame crossed into the MDE arm grid",
    "ann_recall" -> ("bounded query set (5 rows) × broadcast centroid " +
      "frame for probe ranking — the IVF arm; ground truth is the same " +
      "bounded query cross"),
    "bm25_compacted" -> "broadcast 1-row corpus stats (N, avgdl)",
    "bm25_incremental" -> "broadcast 1-row corpus stats (N, avgdl)",
    "classifier_ks" -> "broadcast 1-row (n_pos, n_neg) totals cross",
    "doc_surprisal" -> "broadcast 1-row corpus token-total cross",
    "doclen_outliers" -> "broadcast 1-row median + 1-row MAD crosses",
    "drift_ks" -> "broadcast 1-row (n_pos, n_neg) totals cross",
    "events_chi2" -> ("broadcast 1-row grand-total / chi² / dof frames " +
      "crossed into the readout"),
    "events_decayed" -> "broadcast 1-row max-timestamp (decay anchor) cross",
    "hybrid_search_rrf" -> ("broadcast 1-row corpus stats (BM25 arm) + " +
      "1-row query vector (vector arm)"),
    "knn_join_top3" -> ("bounded query-set × corpus scoring — the " +
      "brute-force kNN-join definition, work = |queries| × corpus, " +
      "bounded by the query set like ann_batch_topk"),
    "mrl_truncation_recall" -> ("bounded query set crossed against the " +
      "full-dim and truncated scoring arms (recall evaluator)"),
    "phi_bands" -> "broadcast 1-row (min_norm, max_norm) span cross",
    "vfdb_pipeline" -> ("the same broadcast 1-row (min_norm, max_norm) " +
      "span cross as phi_bands, via autoClusterPhiBatch's withPhiBand — " +
      "visible since round 15 because the banded frame is an evictable " +
      "cache() instead of a lineage-severing localCheckpoint (the " +
      "non-evictable-block OOM fix)"),
    "quality_buckets" -> "broadcast 1-row quartile-thresholds cross",
    "quality_percentiles" -> "broadcast 1-row n_total cross",
    "search_centroids_topk" -> "broadcast 1-row query-vector frame",
    "search_dot_topk" -> "broadcast 1-row query-vector frame",
    "search_euclidean_topk" -> "broadcast 1-row query-vector frame",
    "tfidf_top_terms" -> "broadcast 1-row n_docs frame into the idf projection",
    "triplet_mining" -> ("bounded query-set × corpus scoring (hard " +
      "positive/negative mining over the anchor set, like hard_negatives)"),
    "vocab_coverage" -> "broadcast 1-row token-total cross onto the top-K frame")
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val picks = Seq(
      "search_cosine_topk" -> "Top-k search: no shuffle — per-partition heaps merged on the driver (TakeOrderedAndProject); the 1-row query vector is broadcast; scan reads only (vec_id, embedding).",
      "search_filtered_topk" -> "Filtered search: the ctx predicate evaluates at the scan (DataFilters); with the store partitioned by outer_context_id it becomes partition pruning.",
      "q3_shipping_priority" -> "Q3: both date filters pushed into the parquet scans (PushedFilters), dimension joins broadcast, decimal-accumulated revenue aggregated partially before the single shuffle.",
      "dedup_minhash_lsh" -> "MinHash-LSH: per-row signature UDF (no k-times row blowup); candidates from the tiny (doc, band, key) self-join; exact-Jaccard verification only on candidates.",
      "ann_ivf_topk" -> "IVF: centroid probe (broadcast) prunes the fine scan to the probed cells before brute-force scoring.",
      "events_sessions" -> "Session windows: one shuffle on user_id; the same plan runs under readStream with a watermark.",
      "search_phi_topk" -> "Phi-weighted search: the metric is the native VecPhiSim codegen expression — no UDF / SerializeFromObject node anywhere; same no-shuffle TakeOrderedAndProject shape as the other metrics.",
      "dedup_embedding_pairs" -> "Exact top-N pairs: grid-partitioned all-pairs — each side explodes to its upper-triangular block tasks and an EQUI-join on the task key forms bounded local products. Must show a shuffle/sort-merge join on (bi, bj), NOT a BroadcastNestedLoopJoin; TakeOrderedAndProject caps the final shuffle at topN rows per partition.",
      "dedup_ngram_jaccard" -> "Prefix-filtered exact Jaccard (AllPairs): each doc indexes only the first |A|-ceil(t*|A|)+1 shingles of its rarest-first (df asc) ordering — lossless for the threshold join — then a size-ratio prune and exact verification over full sets. Boilerplate shingles sort last and never enter a prefix, so no df-squared candidate blowup.",
      "ann_kmeans_ivf" -> "KMeans IVF: probe list (tiny, broadcast) prunes the fine scan; cell assignment is the codegen'd argmin-of-dot-distances expression, not an MLlib model broadcast.",
      "ann_ivf_persisted" -> "Persisted IVF layout: every union branch (base cells + committed append batches) must show STATIC pruning at the file index — PartitionFilters: [cell IN (...)] with the probed cells as literals — so a search reads nProbe/k of the layout's files; no join, no DPP dependence.",
      "doc_quality" -> "Quality flags: word and bigram counting are explode -> two-level aggregation with map-side partial combine on (doc_id, term); shuffle keys carry doc_id, so skew is bounded by document length, not corpus size.",
      "pipeline_clean_corpus" -> "Cleaning pipeline: each stage consumes the previous stage's (cached) survivors — quality gate, digest-canonical keep, banded MinHash candidates + exact verify; the four per-source counts aggregate partially before single exchanges on the tiny source key.",
      "ann_batch_topk" -> "Batched ANN: per-query probe ranking over broadcast centroids, ONE equi-join on cell for the whole batch, bounded TopKAgg partial aggregation per query — the shuffle carries at most k rows per partition per query, never a full scored candidate list.",
      "decontaminate" -> "Decontamination: the benchmark side reduces to a distinct shingle set; the check is one inverted-index equi-join on shingle + per-doc count with map-side partial aggregation — no doc-to-doc comparison anywhere.",
      "pack_windows" -> "Sequence packing: ONE exchange, hash-partitioned on shard, then a per-shard sorted running sum (Window WITH a partition key — a global orderBy would collapse the corpus into one task); narrow projections before and after, no explode.",
      "bm25_search" -> "BM25: the query-term filter applies INSIDE the projection before the explode, so the (doc, term) aggregate — and every downstream shuffle — carries O(docs x |query|) rows, never the token stream; df and corpus stats join as broadcasts; the final top-k is TakeOrderedAndProject, no global sort.",
      "span_dedup" -> "Span dedup: the canonical pick is partial_min(struct(doc_id, block_idx)) — map-side combined BEFORE the exchange on the block digest, so a boilerplate block repeated a billion times ships one row per map task (a window over the digest's occurrence list would shuffle them all); the rebuild groupBy keys on doc_id.",
      "token_budget" -> "Token budget: running sums window on (source, shard) — never a whole source in one task; per-shard totals aggregate map-side into a sources x shards frame whose prefix joins back as a BroadcastHashJoin.",
      "dedup_incremental" -> "Incremental dedup: history enters only as its distinct digest set (left-semi probe) and its (band, band_key) index — equi-joins sized by the BATCH; only verified candidates' shingle arrays are materialized. At scale both history frames persist once and load per batch.",
      "pii_scrub" -> "PII redaction: per-row codegen'd regexp_count/regexp_replace inside one WholeStageCodegen span over the scan — no exchange anywhere before the (contract-only) output sort; scales with input bytes.",
      "doc_repetition" -> "Repetition signal: trigram instances come from one codegen'd zip of the word array with its shifted selves (no self-join, no row blowup before the explode); then explode -> two-level aggregation with map-side partial combine on (doc_id, gram) — every shuffle keys on a doc_id-bearing tuple, so skew is bounded by document length.",
      "source_overlap" -> "Cross-source overlap: the self-join keys on shingle over DISTINCT (source, shingle) rows, so per-key multiplicity is bounded by the SOURCE count and the join output per shingle is at most sources squared; the cached distinct projection feeds both join sides and the per-source sizes; the pair aggregate and size joins are tiny.",
      "bm25_persisted" -> "Persisted BM25: the postings scan must show STATIC pruning at the file index — PartitionFilters: [bucket IN (...)] with the query terms' bucket ids as literals — so a q-term search reads at most q/16 of the postings; df comes from exactly the pruned read (a term's postings live wholly in its bucket); the ranking tail is the shared bounded top-k (TakeOrderedAndProject).",
      "embedding_pca" -> "PCA projection: after the fit, the applied transform is k codegen'd VecDot folds over literal component weights inside one narrow projection — no shuffle, no UDF, no model broadcast; the explode fans each row to its k (comp, value) pairs.",
      "pq_encode" -> "PQ encode: per-subspace argmin assignment, code packing and the quantization-error fold are ONE narrow whole-stage-codegen projection over the scan (the codebooks are expression literals — no model broadcast, no UDF, no shuffle); output is 8 bytes of packed code per vector, the 32x storage cut that makes a 100 TB embedding table ADC-scannable.",
      "pq_adc_topk" -> "PQ ADC search: the distance is 8 shift/mask unpacks + literal-array LUT lookups folded in exact decimals — scoring never touches a raw embedding (at scale the scan reads only (vec_id, pq_code)); the cut must be TakeOrderedAndProject on the exact decimal key, no shuffle, no global sort.",
      "boilerplate_removal" -> "Boilerplate removal: line document-frequency is countDistinct(doc_id) per line with partial aggregation below the exchange on line (a banner in a billion docs ships one row per map task); the flag join is a plain equi-join on line text — never a nested loop; the reassembly fold keys on doc_id and its collect_list is bounded by document length.",
      "dsir_weights" -> "DSIR weights: the bucket model is a fixed buckets-row frame — the point of hashed features: model size independent of vocabulary — joining back as a BroadcastHashJoin; (doc, bucket) tf partial-aggregates below its exchange; the per-doc fold is exact bounded-decimal arithmetic keyed on doc_id.",
      "semdedup" -> "SemDeDup: the within-cell pair matrix comes from an EQUI-join on cell (the paper's n^2 -> sum(cell^2) collapse) — per-task work bounded by the largest cell, no BroadcastNestedLoopJoin anywhere; cosine + threshold run inside codegen on the joined rows; component resolution is the pointer-jumping min-label propagation and the final labeling a left equi-join on vec_id.",
      "quality_classifier" -> "Learned quality filter: scoring is ONE narrow projection — feature extraction (array HOFs), the dot fold over literal weights, and the sigmoid all inside a single WholeStageCodegen span over the scan; no shuffle before the contract-only output sort, no UDF, no model broadcast (the weights are literals).",
      "bpe_tokenize" -> "BPE tokenizer application: the merge chain compiles to nested literal replace calls inside the per-word lambda — narrow per-row codegen over the scan, no shuffle, no join; the learned merge table exists only as expression literals (training is m vocabulary-bounded aggregation rounds, not part of this plan).",
      "dup_pagerank" -> "Dup-graph PageRank: each round is ONE equi-join of the edge list with the (checkpointed) rank table plus a map-side-combinable decimal sum — the Pregel round as two exchanges keyed on vertex id; degrees and the vertex count compute once; no driver materialization, rounds fixed rather than convergence-polled.",
      "event_funnel" -> "Ordered funnel: one filtered min-aggregation per stage (map-side partial min, one row per qualifying user) chained by equi-joins on user_id — no window over a user's full event history, no event-to-event self-join; the event_type filters push to the scan (PushedFilters), so each stage pass reads only its own events.",
      "user_retention" -> "Cohort retention: the first-event table is one map-side-combined partial_min per user; the cell aggregate is a two-level count-distinct whose partial side dedups (cohort, offset, user) BEFORE the exchange; the rate join must show BroadcastHashJoin on the tiny periods-squared triangle — no window, no self-join on the event stream.",
      "bigram_lm" -> "Bigram LM cross-entropy: bigrams come from one codegen'd tail-zip of the word array (no self-join); (doc, w1, w2) tf partial-aggregates below its exchange and feeds BOTH the global model and the per-doc fold from one cached frame; the model and context-count joins key on bigram/context tuples — skew bounded by natural bigram frequency, never corpus size.",
      "cluster_silhouette" -> "Simplified silhouette: per-row work is k codegen'd VecDot folds against centroid literals plus one k-element sort_array — no model broadcast, no UDF, no pairwise join anywhere; the ONLY exchange is the per-cell mean (map-side combined, k output rows).",
      "hard_negatives" -> "Hard-negative mining: the label-mismatch predicate applies BEFORE scoring inside the broadcast-join projection, so same-label rows never pay the dot product; the per-query cut is the bounded TopKAgg partial aggregation (at most k rows per partition per query cross the exchange); the neighbor-label join broadcasts the tiny (queries x k) result — the big table streams exactly once.",
      "normalized_dedup" -> "Normalized dedup: NFC + casefold + whitespace-collapse and both sha digests run in ONE narrow codegen projection over the scan; the group summary is the standard two-level count-distinct — partial dedup of (norm_sha, raw_sha) BEFORE the first exchange, then the per-group aggregate — no join anywhere.",
      "fuzzy_match" -> "Fuzzy entity resolution: candidates come from a BroadcastHashJoin on the blocking key (never a nested-loop cross join); the length lower bound prunes before any levenshtein; the winner is partial_min(struct(dist, name)) — map-side combined BEFORE the exchange on the id, no row_number window; the null lane is the final left BroadcastHashJoin of dirty against winners.",
      "active_users_7d" -> "Rolling actives: the stream dedups to (user, day) in a partial-aggregated distinct BEFORE the bounded 7-way explode; the re-dedup and the per-day count partial-aggregate below their exchanges; the reported-day gate is a broadcast left-semi — no per-day range self-join, no distinct-in-moving-frame window.",
      "events_anomaly" -> "Volume anomaly: the stream is touched ONCE — (type, hour) counts partial-aggregate below the exchange; the per-type moment table is rows-of-event-types tiny and joins back as a BroadcastHashJoin; the z arithmetic is pure codegen over exact decimal moments.",
      "session_paths" -> "Session paths: ONE exchange on user_id for the session aggregate (the same shuffle the sessions query pays); the per-session list is bounded by session length and sorted in place; path extraction is a narrow per-row transform + explode — no lead/lag window over a user's full history, no self-join; the cut is TakeOrderedAndProject on (n desc, path).",
      "table_profile" -> "Table profile: ONE scan — the multi-count-distinct aggregation plans the standard Expand with partial aggregation per column below the exchange; the unpivot is a narrow projection of the single result row; no per-column rescan (the oracle scans per column; the engine must not).",
      "attribution_last_touch" -> "Last-touch attribution: the as-of core is the union + ordered-window carry — one shuffle on user_id, never a purchase x click range product; the channel aggregate partial-combines below a tiny final exchange on the campaign-bucket key.",
      "corpus_diff" -> "Snapshot diff: both snapshots project to (doc_id, sha256) BEFORE the single full-outer equi-join on doc_id — document text never crosses an exchange; the four-way status classification partial-aggregates into four rows.",
      "bucketed_join" -> "Bucketed co-located join: both FileScans read bucketBy(8, doc_id) layouts (Bucketed: true, SelectedBucketsCount 8/8) and no Exchange hashpartitioning feeds the join. At this SF the planner broadcasts the small side; with broadcast off — both sides too big, the 100 TB situation — the same layout yields a SortMergeJoin directly over the bucketed reads with no exchange anywhere (pinned in BucketingSpec); only the tiny per-label aggregate exchanges.",
      "q4_order_priority" -> "Correlated EXISTS (SQL surface): Catalyst decorrelates the per-order subquery into a LeftSemi join of the date-filtered orders against the heavy lineitems — no per-row probing; both the date and quantity predicates push to their scans (PushedFilters).",
      "q17_small_qty_revenue" -> "Correlated scalar subquery (SQL surface): the per-partkey 0.2*avg threshold computes ONCE as a map-side-combined aggregate and joins back — no scalar-subquery node survives optimization; the brand/size filter pushes to the part scan and the outer sum accumulates in decimals.",
      "ann_recall_curve" -> "IVF operating-point sweep: every (query, cell-member) cosine is computed ONCE — probe cells rank per query over broadcast centroids, candidates score in a single equi-join on cell, and the nProbe arms attach AFTERWARD by the rank-inequality join against the broadcast 5-row probe list (row duplication, no re-scoring); per-arm top-k is the bounded TopKAgg, hits/cells aggregate map-side into a 5-row table.",
      "ann_ivfpq_topk" -> "IVF-PQ composed search: the probe list joins as a BroadcastHashJoin on cell (at scale, with the encoded table partitioned by cell, the same filter is static partition pruning), and ADC scoring runs on the joined rows from (vec_id, pq_code) alone — shift/mask unpacks + literal-LUT lookups in codegen, no raw embedding anywhere past the encode projection; the cut is TakeOrderedAndProject on the exact decimal key.",
      "search_hamming_rerank" -> "Binary quantization + rescore: stage 1 is a narrow codegen projection (sign-bit packing + popcount-XOR) over the scan cut by TakeOrderedAndProject — at scale it reads a persisted 8-byte-per-row signature table, 1/32nd the bytes of the float scan; stage 2 joins the bounded candidate list back as a BroadcastHashJoin and pays the exact cosine only 50 times.",
      "classifier_auc" -> "Distributed ROC AUC: the ONE corpus-sized operation is the per-score groupBy (partial-aggregated below its exchange); the strictly-below cumulative window is global BUT bounded — its input is the 6-dp-quantized score DOMAIN (<= 1e6+1 rows), not the corpus — and the rank numerator folds in DECIMAL(38,0), order-independent.",
      "curriculum_order" -> "Curriculum epoch order: stage + md5 shuffle key are one narrow codegen projection; the staged cut is TakeOrderedAndProject (per-task local top-limit, driver merge — no global sort); the position window runs AFTER the cut, over limit rows only.",
      "q21_returned_alone" -> "Double correlated subquery (SQL surface): the EXISTS arm decorrelates to a LeftSemi and the NOT EXISTS arm to a LeftAnti — both equi-joins on l_orderkey with the supplier inequality as a residual condition; the returnflag filters push to the scans; no per-row subquery probe anywhere.",
      "supplier_lateral_stats" -> "LATERAL correlated aggregate (SQL surface): DecorrelateInnerQuery rewrites the per-supplier subquery into ONE map-side-combined per-suppkey aggregate outer-joined back — lineitem streams once; the count-on-empty-group=0 lateral semantics surface as the coalesce on the join's null side.",
      "events_rolling" -> "Window frames: daily counts partial-aggregate below one exchange on (type, day); every window — RANGE 7-day sum, lag, ntile — is PARTITIONED by event_type over the bounded daily series, so frames parallelize per type and no single-task global window exists.",
      "scd2_history" -> "SCD2 from a change log: lag (run-length compaction) and lead (interval close) share ONE partitioning and ordering — a single exchange on the key and a single sort feed both window frames; no self-join of the log against itself.",
      "scd2_merge" -> "SCD2 merge: each side dedups to latest-per-key via a partial-filtered row_number under its own exchange; the three lanes fall out of ONE full-outer SortMergeJoin on the key — the union re-reads the JOINED frame, not the inputs.",
      "dq_expectations" -> "Expectation suite: each table's predicate checks fold into ONE aggregate pass (one scan per table, map-side combined; a check is a column, not a scan); referential integrity is a single shuffled left-anti join on the foreign key; the report unions eight 1-row frames.",
      "pareto_frontier" -> "Pareto skyline: the per-user aggregate partial-combines below its exchange; the dominance window runs over the DISTINCT n_events domain (bounded), never the raw user rows; frontier membership joins back as a left-semi on the (m, groupmax) pair.",
      "interval_overlap" -> "Interval overlap: both session frames come from one session_window exchange; the overlap join is a plain equi-join on (user, day-bucket) — no BroadcastNestedLoopJoin, no per-key inequality join — and the canonical-bucket predicate dedups pairs without a distinct.",
      "collocations_pmi" -> "PMI collocations: bigram and unigram counts partial-aggregate below vocab-bounded exchanges; the two unigram joins broadcast (vocab-sized build sides); the 1-row totals cross-join broadcasts; the cut is TakeOrderedAndProject on the PMI key.",
      "source_divergence" -> "JS divergence: the (source, word) count is the only corpus-sized aggregation; the dense grid is a sources x vocab cross join of two TINY aggregates; the per-term arithmetic is codegen over the grid and the per-source fold is an exact decimal sum.",
      "weighted_sample" -> "A-ES weighted sampling: the -ln(u)/w key is one narrow codegen projection over the scan (md5 + conv + log — no UDF); the cut is TakeOrderedAndProject — each task keeps k rows, no global sort, no sequential reservoir.",
      "survival_churn" -> "Kaplan-Meier: ONE subject-shaped aggregate (user -> duration/event), then the at-risk cumsum, log-term decimal fold and collapse flag all run as windows over the bounded DURATION domain — the curve costs one shuffle on user_id regardless of corpus size.",
      "bm25_ndcg" -> "nDCG: the ranking side is the shared BM25 tail; the IDCG side must show NO global sort of scored docs — the grade histogram (<= |q|+1 rows) aggregates map-side, and the ideal list materializes as a bounded explode of <= k rank positions.",
      "ivm_source_stats" -> "Incremental view maintenance: two batch-shaped partial-state folds (map-side combined) and ONE full-outer SortMergeJoin of key-sized state frames; corpus size appears only below the two folds — the merge never rescans rows.",
      "ab_cuped" -> "CUPED: the unit aggregate is the only corpus-shaped exchange; the moment frame is one row broadcast back; both variant and pooled readouts aggregate the adjusted frame map-side into 1-2 row results.",
      "basket_lift" -> "Market-basket lift: the distinct (basket, item) projection bounds the self-join multiplicity by the item domain; pair/item counts partial-aggregate below their exchanges; the 1-row basket total broadcasts; item-count joins are broadcast builds.",
      "session_transitions" -> "Markov transitions: the break rule and predecessor share ONE user-window exchange+sort (no (user, session) composite re-shuffle of the stream); the matrix aggregate and its row-total window run on the bounded types-squared frame.",
      "q10_returned_customers" -> "Q10 (SQL surface): the date filter pushes to the orders scan and returnflag to lineitem (PushedFilters); customer/nation join as broadcast dims; revenue decimal-accumulates partially below the one grouped exchange; the top-20 head is TakeOrderedAndProject — no global sort of the aggregate.",
      "scd2_lookup" -> "SCD2 dimension lookup: the as-of union + ordered-window carry — ONE exchange on the key shared by the interleave and the carry window, no per-fact range join, no interval explode; the dim build's two window frames ride their own single exchange; validity (half-open [from, to), gap -> NULL) is a codegen projection over the carried struct.",
      "char_entropy" -> "Character entropy: explode to (doc, char) then two-level aggregation with map-side partial combine — both shuffles key on doc-bearing tuples, so skew is bounded by document length; the -p*log2(p) terms fold as 9-dp decimals (order-free) and the totals join back on doc_id as a plain equi-join.",
      "l_diversity" -> "l-diversity release gate: level 1 dedups (class, sensitive) with partial aggregation below its exchange — the only corpus-sized pass; level 2 counts per class over the already-bounded class frame; the l histogram is a tiny final aggregate. No window anywhere, no distinct-in-window.",
      "heavy_hitters" -> "Exact heavy hitters, pass 1 (the corpus-sized pass; shown via HeavyHitters.sketchPass): the Misra-Gries UDAF plans as ObjectHashAggregate with a PARTIAL side below a single 1-row exchange — per-task aggregation state is the fixed capacity-entry summary, so state and shuffle are O(capacity), never one row per distinct word; pass 2 recounts only the bounded candidate set (isin filter pushed to the scan).",
      "cms_estimate" -> "Count-Min estimates: the corpus is touched ONCE — the depth-way posexplode feeds a (d, bucket) aggregate whose map-side partial combine collapses each task to at most depth*width counter rows before the exchange (state bounded by the sketch, never the vocabulary); the terms-by-depth probe side joins the bounded counter table as a BroadcastHashJoin and the min-over-depth fold runs on |terms| rows.",
      "join_size_estimate" -> "CMS inner-product join-size estimate: each input is touched exactly once to build its bounded (d, bucket) counter table (map-side combine caps task output at depth*width rows); the inner product is an equi-join of two <= depth*width frames — never of the inputs — and the per-d decimal fold plus min-over-d reduce to one row. The join whose size is being predicted appears NOWHERE in the plan; that is the point.",
      "bootstrap_ci" -> "Poisson bootstrap: ALL B replicates from ONE corpus pass — the per-row explode fans to B (rep, w*x, w) terms whose map-side partial combine collapses each task to <= B rows before the single exchange on rep; no resampling join or shuffle of the corpus exists anywhere; the percentile CI runs over the B-row replicate-means frame. The md5 draw + CDF when-chain is pure codegen inside the pre-aggregation projection.",
      "distinct_estimate" -> "KMV distinct sketch: the BottomK UDAF plans as ObjectHashAggregate with a PARTIAL side below a single 1-row exchange — per-task state is k sorted longs however large the key domain (an exact countDistinct's partial state IS the domain); the md5-12 hash is codegen in the pre-aggregation projection and the scan reads only the key column.",
      "quantile_estimate" -> "Hash-sample quantiles: the k-row sample cut is TakeOrderedAndProject on (md5 draw, value) — per-partition top-k partials merged once, never a global sort; percentile state on the sample side is k rows wherever exact percentile state is the whole column; the exact side is the evaluator's capped comparison pass (withExact=false drops it) and joins back as a broadcast 1-row frame.",
      "mutual_information" -> "Mutual information: ONE corpus-sized (a, b) count with map-side partial aggregation; the marginals and all three information folds run on the bounded |A|x|B| grid (broadcast 1-row grand total, vocabulary-bounded joins); the 9-dp decimal quantization keeps every fold order-free, so no sort appears anywhere.",
      "psi_drift" -> "PSI drift gate: after the one exact-percentile pass over the reference, bin assignment is a pure codegen fold over <= bins-1 edge LITERALS (no join with an edges table); each side contributes one map-side-combined bin count; the smoothed-share arithmetic and decimal fold run on the bins-row grid with a broadcast 1-row totals frame.",
      "fuzzy_match_jw" -> "Jaro-Winkler linkage: the JaroWinklerSim kernel appears EXACTLY ONCE (a codegen expression in the candidate projection — no UDF, no SerializeFromObject); blocking is an equi-join on the last token; the sound length-ratio prune (min/max >= 5t-4) filters before the kernel; the winner is a map-side-combinable max(struct), not a ranking window.",
      "dedup_sorted_neighborhood" -> "Sorted-neighborhood dedup: the rank is a Window WITH a partition key (block) — never a global sort; neighbor pairs form by offset-explode + EQUI-join on (block, rank) with no BroadcastNestedLoopJoin or CartesianProduct anywhere; only verified candidates' shingle arrays ship into the exact-Jaccard tail.",
      "value_winsorize" -> "Winsorization: one exact-percentile aggregation per group behind the bounded-domain guard, the edges frame joins back as a broadcast, and the clamp is a codegen least/greatest projection; the summary means decimal-accumulate with map-side partial aggregation.",
      "equidepth_histogram" -> "Equi-depth histogram: quantile edges are PLAN LITERALS (one percentile+min/max pass collected once), bin assignment is a pure codegen fold over them — no join with an edges table; the count pass map-side-combines to <= bins rows per task; grid arithmetic runs on bins rows with a broadcast 1-row total.",
      "bh_fdr" -> "Metric-sweep FDR: ONE map-side-combinable (metric, arm) moment aggregation over the stream; the Welch z / p arithmetic runs on the metric grid; the BH rank and reverse running-min windows are global but DOMAIN-bounded (one row per metric, guarded) — the corpus is never sorted.",
      "group_quantile_estimate" -> "Grouped quantile sketch: the per-group rank cut MUST show WindowGroupLimit (map-side per-partition top-k before the exchange) — the shuffle carries at most k rows per group per input partition, never the group's raw rows; the capped exact side joins back by group key.",
      "t_closeness" -> "t-closeness: ONE map-side-combinable (class, value) count over the corpus; the dense class-by-value grid builds from two domain-bounded aggregates (the class frame guarded), the cumulative-EMD window is PARTITIONED by class, and the decimal fold is order-free — nothing after the scan touches corpus-sized data.",
      "theilsen_trend" -> "Theil-Sen trend: the stream collapses to the guarded day domain BEFORE the pairwise join — the quadratic join (a BroadcastNestedLoopJoin by nature: inequality-only condition) pairs day rows, never events; both medians are single interpolated-percentile aggregates over bounded frames.",
      "calendar_gaps" -> "Calendar gaps: the observed side is a distinct (group, day) projection with partial aggregation below its exchange; the expected side explodes sequence(min, max) from a per-group 1-row aggregate; the report is one LEFT ANTI equi-join between two calendar-bounded frames — the corpus is scanned once.",
      "dedup_idf_cosine" -> "IDF-weighted cosine pairs: the pair space is the SAME inverted shingle equi-join as the Jaccard reports (multiplicity bounded by the df cap — the cap filter sits on the df aggregate BEFORE the weight join); df, norms and dots all partial-aggregate below their exchanges with doc-bearing keys; the cut is TakeOrderedAndProject on the 6-dp cosine — no global sort, no BNLJ.",
      "dedup_idf_rank" -> "LSH-proposed idf-cosine ranking: the banding chain proposes candidates (the dedup_minhash_lsh shape — tiny (doc, band, key) self-join, no nested loop); scoring joins each candidate through ONE (doc, shingle) equi-join chain against the weight table — work bounded by the candidate list, never the corpus co-occurrence mass; dot/norm folds are map-side-combined DECIMAL(28,9) partials.",
      "cross_corpus_pairs" -> "Cross-corpus contamination: banding runs per SIDE and the candidate join is cross-side band-bucket equality only (equi-join, no within-side pairs, no BNLJ); verification joins each side's own shingle arrays; at scale the benchmark band index is the broadcast side.",
      "profile_drift" -> "Profile drift: ONE multi-aggregate scan per side (the Expand multi-count-distinct plan — no per-column rescans), the per-column unpivot of each 1-row result, and a full-outer join of two |columns|-row frames; nothing after the two scans is corpus-sized.",
      "join_advisor" -> "Join-strategy advisor as ONE lazy program (round-9 verdict #4): left is scanned three times (MG sketch partial below a 1-row exchange, candidate recount behind a broadcast of the ≤capacity exploded candidate keys, CMS counters), right once; both side counts ride the counter tables (no separate count scans); the counter tables meet in a full-outer equi-join on (d, bucket); everything above is 1-row global-aggregate crosses — the advised join appears NOWHERE, and .head() is the only action.",
      "source_jaccard_kmv" -> "Per-group sketch Jaccard, corpus pass (shown via Kmv.groupSketches — the contract query's readout runs on the collected ≤ maxGroups × k longs): ONE groupBy(group) BottomK aggregation, ObjectHashAggregate with a PARTIAL side below the group exchange (per-task state k longs per group), and the driver transfer is plan-capped by CollectLimit/GlobalLimit at maxGroups + 1 rows — the round-10 guard-ordering fix made the cap bind BEFORE the collect.",
      "dow_adjusted_anomaly" -> "Day-of-week-adjusted anomaly: the event stream collapses to the bounded day domain FIRST (one map-side-combinable (day) count); the trailing-baseline windows are PARTITIONED by dow — seven bounded sub-series, never a global sort — and the moment folds are order-free decimals; nothing after the day collapse is corpus-sized.",
      "pipeline_decontaminate" -> "Composed decontamination release: the cross_corpus_pairs chain proposes + verifies pairs (cross-side band equi-join, no BNLJ); the quarantine set is a tiny distinct projection of the pair table consumed by ONE left-anti equi-join on doc_id; the snapshotDiff audit reduces both sides to digest rows before its single full-outer join — text crosses an exchange only inside the shingle pass.",
      "eval_contamination" -> "Eval-side contamination fraction: the eval vocabulary BROADCASTS into a left-semi join that prunes train shingles MAP-SIDE (BroadcastHashJoin LeftSemi — the corpus-sized pass has no exchange of its own); the distinct and both per-doc counts run on benchmark-bounded frames only.",
      "dedup_token_savings" -> "Token-denominated canonical keep: the same digest groupBy + keep equi-join as the doc-count report with the token column riding the hashed projection for free; the per-source rollup partial-aggregates map-side — two shuffles total, text never crosses an exchange (only 32-byte digests and longs).",
      "ngram_diversity" -> "Per-source bigram diversity: ONE (source, gram) count with partial aggregation below its exchange (duplicate grams collapse map-side), a source-domain rollup, and the entropy fold joins counts to the tiny per-source totals by BROADCAST — nothing after the first aggregate is corpus-sized.",
      "stream_contamination_gate" -> "Streaming contamination gate: the verdict is ONE stateless projection (per-row shingle UDF + broadcast set membership) — no aggregate, no join, no exchange anywhere in the incoming side's plan, which is exactly what makes it legal under readStream with no watermark or state store.",
      "embedding_dispersion" -> "All-pairs mean cosine with NO pair join: posexplode to (label, dim, v), ONE map-side-combinable decimal sum per (label, dim), a dim-bounded per-label fold, and the identity readout — the n² statistic's plan contains two small aggregates and a broadcast-sized join, nothing else.",
      "dedup_containment" -> "Asymmetric containment pairs: the smaller-side PREFIX (rarest-first global order) equi-joins the full inverted index — lossless for containment ≥ t, never all-pairs, no BNLJ; size-asymmetric pairs survive because the symmetric size-ratio prune is deliberately absent; exact verification over the candidates' cached sorted arrays.",
      "zipf_alpha" -> "Zipf exponent per source: the rank ≤ topK filter over the row_number window MUST plan as WindowGroupLimit — map-side per-partition top-K BEFORE the source exchange, so the shuffle never carries a source's vocabulary; regression terms are order-free 9-dp decimal folds over ≤ topK rows per source.",
      "contamination_drift" -> "Release-over-release contamination drift: TWO eval_contamination passes (each a broadcast left-semi prune of its corpus — the corpus-sized side has no exchange of its own) meeting in ONE inner equi-join on bench_doc over benchmark-sized frames; the delta and threshold flags are a narrow projection. Nothing corpus-sized crosses an exchange in either release's pass.",
      "lsh_recall" -> "LSH candidate-generation calibration: both sides are the production sub-quadratic plans (prefix-filtered exact pairs, banded LSH pairs) consumed as UNSORTED cores sharing ONE cached docShingles frame — no Sort/rangepartitioning may appear under the Union (the groupBy above would destroy it; round-13 verdict #1), and the corpus is shingled once, not per side; the comparison is a pair-keyed union + HashAggregate and one global fold.",
      "containment_incremental" -> "Incremental containment gate: BOTH prefix directions are equi-joins (batch prefix x history index, history prefix x batch index) under in-plan mass sentinels — no BNLJ, no all-pairs; the history-side artifacts (df table, sorted prefix index, inverted index) depend only on history, so a production ingest persists them once and the per-batch plan is batch-sized except for the one history-prefix scan; the verdict rollup is total (left joins onto the batch spine).",
      "dedup_savings_drift" -> "Release-over-release savings drift: two dedupTokenSavings cores (digest groupBy + keep equi-join each, text never crossing an exchange) meeting in ONE full-outer equi-join on the tiny source key; the delta is a narrow projection with the readout sort paid once at the composed exit.",
      "source_weighted_jaccard_icws" -> "ICWS weighted Jaccard: the corpus-sized pass is the (group, elem) weight aggregate (map-side combined); the k-sample expansion and its five md5 draws run over the AGGREGATED vocabulary domain, never raw rows; the sketch table is groups x k and pairs via an i-keyed equi-join under the in-plan group-domain gate; the exact side is one elem-keyed equi-join (per-key multiplicity = group count) plus the totals identity - no dense group x vocab grid, nothing collected to the driver.",
      "lsh_recall_curve" -> "LSH operating-point sweep: ONE shared docShingles frame, ONE exact ground-truth pass (unsorted core) and ONE 16-row signature pass feed all three band-layout arms - per-arm digests derive from the cached signature arrays, so the k x md5-per-shingle work is never repeated; each arm adds only its banded candidate equi-join + exact verify (pair-table-sized), folding into a 1-row aggregate; no Sort under any union, no nested loop.",
      "containment_incremental_batch" -> "The directions cost dial: the plan contains EXACTLY ONE prefix direction (batch prefix x history inverted index, one mass sentinel) - no history-prefix explode anywhere; the verify carries the na <= nb size guard that makes the single pass lossless for its restricted predicate.",
      "containment_incremental_bloom" -> "Bloomed incremental gate: both batch-side candidate inputs pass the broadcast Bloom's might-contain filter BEFORE any exchange, so history-novel shingles die map-side; otherwise the plan is containment_incremental's and the verdicts are bit-identical (spec-pinned).",
      "icws_persisted" -> "Persisted ICWS probe: every scan reads the bounded parquet layout (sketches = groups x k rows, totals, weights) - no documents scan, no tokenization anywhere in the probe; the pair work is the i-keyed sketch join and the elem-keyed exact join under the re-applied in-plan group-domain gate.",
      "containment_incremental_persisted" -> "Persisted containment probe over base + one COMMITTED append batch: the history side is parquet scans of the layout's committed view (base df + batch df re-aggregated per shingle - the exact additive fold - and the base+batch sorted arrays unioned) - no history text scan, no history shingle UDF anywhere; only the batch is shingled, and the candidate/verify joins are the from-text gate's (verdicts spec-pinned identical to the full-history gate, append lane included).",
      "source_weighted_containment" -> "Exact weighted directional containment: the corpus-sized work is ONE (group, elem) decimal weight aggregate (map-side combined) plus the elem-keyed shared-mass equi-join (per-key multiplicity = group count); the pair DOMAIN is the gated totals self-join - inequality-only BY NATURE (a.g < b.g exists to emit explicit 0.0 rows for disjoint pairs), <= maxGroups rows on BOTH sides via the in-plan requireBoundedDomain sentinels, hence the allowlisted BNLJ; every fold is DECIMAL(28,9), order-free under any task layout.")
    val bnljAllowed = PlanDump.bnljAllowed
    val nested = scala.collection.mutable.LinkedHashMap[String, String]()
    val sb = new StringBuilder
    sb.append("# Physical plans — flagship queries\n\n")
    sb.append("Generated by `graft.PlanDump` (sf0.01, local[8], AQE on). The\n")
    sb.append("commentary states what each plan must show for the 100 TB design\n")
    sb.append("to hold; regenerate after planner-affecting changes. The dump\n")
    sb.append("FAILS on any CartesianProduct/BroadcastNestedLoopJoin outside\n")
    sb.append("the named allowlist of bounded 1-row/domain crosses.\n")
    for ((name, note) <- picks) {
      sb.append(s"\n## $name\n\n$note\n\n```\n")
      // the persisted layout is a union — keep enough of the plan to show
      // BOTH branches' static PartitionFilters
      val cap = if (name == "ann_ivf_persisted") 5200 else 2600
      // the production incrementalFlags eagerly materializes its result
      // (bounded-cache discipline), which would dump as a checkpoint
      // scan; show the underlying distributed plan via eager = false
      val frame = if (name == "dedup_incremental") {
        val docs = sources.Tables.table(spark, dir, "documents")
        operators.Dedup.incrementalFlags(
          docs.filter(org.apache.spark.sql.functions.col("doc_id") % 3 === 0),
          docs.filter(org.apache.spark.sql.functions.col("doc_id") % 3 =!= 0),
          0.5, eager = false)
      } else if (name == "lsh_recall") {
        // same eager-materialization story as dedup_incremental: show
        // the distributed plan, not the checkpoint scan
        operators.Dedup.lshRecall(
          sources.Tables.table(spark, dir, "documents"), 0.5, eager = false)
      } else if (name == "lsh_recall_curve") {
        operators.Dedup.lshRecallCurve(
          sources.Tables.table(spark, dir, "documents"), 0.5, eager = false)
      } else if (name == "containment_incremental") {
        val docs = sources.Tables.table(spark, dir, "documents")
        operators.Dedup.containmentGateIncremental(
          docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0),
          docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 =!= 0),
          0.9, eager = false)
      } else if (name == "containment_incremental_batch") {
        val docs = sources.Tables.table(spark, dir, "documents")
        operators.Dedup.containmentGateIncremental(
          docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0),
          docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 =!= 0),
          0.9, directions = "batch", eager = false)
      } else if (name == "containment_incremental_bloom") {
        val docs = sources.Tables.table(spark, dir, "documents")
        val hist = docs.filter(
          org.apache.spark.sql.functions.col("doc_id") % 10 =!= 0)
        operators.Dedup.containmentGateIncrementalBloomed(
          docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0),
          hist, 0.9,
          operators.Dedup.containmentHistoryVocabBloom(hist,
            expectedItems = 2000000L),
          eager = false)
      } else if (name == "containment_incremental_persisted") {
        val docs = sources.Tables.table(spark, dir, "documents")
        val path = operators.Dedup.containmentIndexDumpPath
        val dten = org.apache.spark.sql.functions.col("doc_id") % 10
        operators.Dedup.persistContainmentIndex(
          docs.filter(dten =!= 0 && dten =!= 9), path)
        operators.Dedup.appendContainmentIndex(docs.filter(dten === 9), path)
        operators.Dedup.containmentGateIncrementalPersisted(
          docs.filter(dten === 0), path, 0.9, eager = false)
      } else if (name == "distinct_estimate") {
        // the contract query returns a bounded parallelized row; the
        // plan worth auditing is the corpus-sized sketch pass
        operators.Kmv.sketchPass(
          sources.Tables.events(spark, dir)
            .select(org.apache.spark.sql.functions.col("user_id")
              .cast("string").as("w")), 256)
      } else if (name == "heavy_hitters") {
        // the contract query RETURNS a bounded parallelized result; the
        // plan worth auditing is the corpus-sized sketch pass
        operators.HeavyHitters.sketchPass(
          sources.Tables.table(spark, dir, "documents"), 1024)
      } else if (name == "source_jaccard_kmv") {
        // same shape: the contract query collects the bounded sketch
        // table and parallelizes pair readouts; the corpus-sized plan
        // is the grouped BottomK pass with its CollectLimit cap
        operators.Kmv.groupSketches(
          sources.Tables.table(spark, dir, "documents")
            .select(org.apache.spark.sql.functions.col("source"),
              org.apache.spark.sql.functions.explode(
                operators.TextAnalysis.words(
                  org.apache.spark.sql.functions.col("text"))).as("w")),
          "source", "w", 256, 1024)
      } else SparkEntry.queries(name)(spark, dir)
      val plan = frame.queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin")) {
        if (!bnljAllowed.contains(name)) nested += name -> "NOT ALLOWLISTED"
        else sb.append(s"(nested-loop allowlisted: ${bnljAllowed(name)})\n\n")
      }
      sb.append(plan.take(cap)).append(if (plan.length > cap) "\n… (truncated)\n" else "\n")
      sb.append("```\n")
    }
    if (nested.nonEmpty) {
      nested.foreach { case (n, why) =>
        System.err.println(s"[plandump] FAIL $n: nested-loop join $why") }
      spark.stop()
      sys.exit(1)
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("PLANS.md"), sb.toString)
    println("wrote PLANS.md")
    spark.stop()
  }
}
