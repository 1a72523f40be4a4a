package graft
import org.apache.spark.sql.SparkSession
/** Regenerates PLANS.md — formatted physical plans for flagship queries. */
object PlanDump {
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
      "search_hamming_rerank" -> "Binary quantization + rescore: stage 1 is a narrow codegen projection (sign-bit packing + popcount-XOR) over the scan cut by TakeOrderedAndProject — at scale it reads a persisted 8-byte-per-row signature table, 1/32nd the bytes of the float scan; stage 2 joins the bounded candidate list back as a BroadcastHashJoin and pays the exact cosine only 50 times.")
    val sb = new StringBuilder
    sb.append("# Physical plans — flagship queries\n\n")
    sb.append("Generated by `graft.PlanDump` (sf0.01, local[8], AQE on). The\n")
    sb.append("commentary states what each plan must show for the 100 TB design\n")
    sb.append("to hold; regenerate after planner-affecting changes.\n")
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
      } else SparkEntry.queries(name)(spark, dir)
      val plan = frame.queryExecution.executedPlan.toString
      sb.append(plan.take(cap)).append(if (plan.length > cap) "\n… (truncated)\n" else "\n")
      sb.append("```\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("PLANS.md"), sb.toString)
    println("wrote PLANS.md")
    spark.stop()
  }
}
