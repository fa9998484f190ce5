// Dump formatted physical plans for headline queries into PLANS.md.
// Run: /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//        --conf spark.sql.legacy.parquet.nanosAsLong=true \
//        -I tools/dump_plans.scala  (after sbt compile)
// The nanosAsLong conf mirrors Tables.configure — events.parquet stores
// TIMESTAMP(NANOS), which stock Spark rejects at scan time without it.
import java.io.PrintWriter
import graft._

val dir = "/root/testdata/sf0.001"
val notes: Seq[(String, String)] = Seq(
  "o1_keyset_page" -> "Cursor filter pushed into the parquet scan; TakeOrderedAndProject keeps a size-n heap per task — a page costs O(scan+n), no global sort ever.",
  "w1_ordered_claim" -> "The claim queue's priority order is a global top-k (per-task heaps merged at the driver), not a sort shuffle.",
  "j2_revenue_by_region" -> "Three-hop dim chain: every dim broadcast, the lineitem fact is scanned once with a 3-column ReadSchema, aggregation combines map-side.",
  "j4_left_outer_counts" -> "Pre-aggregated before the outer join: the shuffle carries |customers| rows, not |orders|.",
  "j7_submit_anti" -> "Submit = entries x specs minus existing items as a left-anti join; the big existing side stays the probe side.",
  "a2_pricing_summary" -> "Single hash-agg shuffle; exact DECIMAL(18,2) sums so results are partition-order independent.",
  "a6_percentile_summary" -> "Exact percentile (sort-based) per group - matches the oracle; approx_percentile would not.",
  "dd_exact" -> "Dedup shuffles only the 128-bit content hash; document bytes never cross the wire.",
  "dd_minhash" -> "LSH banding: (band,id) pairs only in the candidate shuffle, exact-dup groups collapsed before banding, shingles joined back once per surviving pair. The banding subtree (one-pass codegen'd minhash_bands) materializes eagerly inside boundedBucketPairs, so this final plan reads the candidate checkpoint.",
  "skew_salted_join" -> "Hot-key spreading: big side salted to (key,salt), small side replicated via explode under a broadcast.",
  "skew_salted_collect" -> "Two-phase set-agg: phase 1 shuffles (key, salt-of-value), phase 2 merges partials - a hot key fans across reducers.",
  "s4_dataset_export" -> "Read-back filter on record_type prunes partition directories at file-listing time (PartitionFilters, not DataFilters).",
  "sim_knn_brute" -> "Query side broadcast (BroadcastNestedLoopJoin); the corpus streams through one scan and is never shuffled. Per-query top-k via window-rank prune over the broadcast product.",
  "x2_properties_df" -> "JSON property extraction is columnar (get_json_object) feeding a pivot with explicit values - no distinct() discovery job.",
  "a10_distinct_on" -> "DISTINCT ON as a min_by hash aggregate: map-side partial pick, no per-group window sort - a hot group ships one row per map task.",
  "sim_knn_ivf" -> "IVF ANN: quantizer trained on a one-pass bounded hash-sample, centroids and probes broadcast, per-query top-k via the bounded TopKByScore aggregate (partial heaps cap the shuffle at k rows per query per task).",
  "s2_typed_payload" -> "Per-type nested payload structs: the record_type filter prunes sibling partition directories at listing time AND nested-schema pruning drops the unselected subtype structs from ReadSchema.",
  "st1_lifecycle" -> "Integrated claim->payload->return->history->revert chain in one plan: the claim is a TakeOrderedAndProject top-k, payload dims broadcast, the event-sourced history union feeds the rank-2 revert pick.",
  "dd_embcos_lsh" -> "Embedding near-dup: all SRP band signatures from one codegen'd srp_bands pass, ids-only candidates through the bounded bucket-collect, vectors joined back once per surviving pair. The signature subtree materializes eagerly inside boundedBucketPairs; this final plan reads the candidate checkpoint.",
  "sim_knn_lsh" -> "LSH ANN probe over L independent tables: all signatures from one codegen'd srp_bands pass, multi-probe queries broadcast and joined bucket-local (corpus exploded but never shuffled), cross-table duplicate candidates collapsed on 3-scalar rows before the bounded TopKByScore heap.",
  "dd_minhash_md5" -> "Portable-hash LSH anchor: per-seed md5 minima and concatenated band keys are engine-reproducible, candidates go through the same bounded bucket-collect as the production pipeline, exact-Jaccard verify joins shingles once per surviving pair - the whole pair set hash-checks against the DuckDB oracle. Final plan reads the pair checkpoint.",
  "mm_decode" -> "Real image decode: deterministic PNGs encode and decode inside one mapPartitions batch (ImageIO, no UDF in the columnar path); only the fixed-width decoded stats leave the partition, and the oracle predicts them from the pixel formula.",
  "mm_audio_decode" -> "Real audio decode: WAV payloads through the JDK codec in the same partition-batch shape; integer signal stats out, oracle-predicted.",
  "mm_video_demux" -> "Video container demux: bounds-checked recursive ISO-BMFF box walk in a partition batch - the metadata pass that prunes payloads before any (external) frame decode; structure and movie-header fields out, oracle-predicted.",
  "samp_token_budget" -> "Token-budget selection without a global-order window: range partition by priority, counts-only shard totals decide whole shards at the driver, exactly one boundary shard runs a per-row running sum - the single-partition sort a naive SUM OVER (ORDER BY) would plan never appears.",
  "s7_external_read" -> "External byte store read path: Spark's binaryFile source scans the sharded content-addressed blobs (one task per file at scale), content re-hashed in the projection so storage corruption is oracle-visible.",
  "dd_survivors_md5" -> "Survivors through the portable-hash LSH pipeline: same banding/verify as dd_minhash_md5 at 0.9, then checkpointed min-label propagation; the DuckDB oracle replays it as a recursive-CTE reachability closure.",
  "j14_bucketed_join" -> "Bucketed co-located join: both sides pre-bucketed on the join key, sort-merge reads buckets directly (SelectedBucketsCount) with NO exchange on either input; only the final rollup shuffles.",
  "pipe_curate" -> "End-to-end curation: quality gate -> min_by exact dedup -> chunk -> per-shard 512-token bin packing composed in one plan; the only window is the per-shard running offset.",
  "dd_incremental" -> "Incremental dedup batch step: index read excludes the current batch partition, candidates from a band join bounded by the hot-band stop-list, one set-Jaccard verify, survivors overwrite their own batch=N partition (idempotent retry).",
  "dd_decontaminate" -> "Benchmark decontamination: the benchmark gram set aggregates small and broadcasts under a MEASURED-size gate (counted on the small side, explicit hint when under 8M grams - a static-estimate SMJ would make the corpus stream pay its shuffle write before AQE could convert); corpus grams travel as 64-bit hashes into the broadcast hash join, only the per-doc hit counts aggregate. Past the gate the operator switches to the Bloom-prefiltered plan below.",
  "dd_decontaminate_bloom" -> "The oversized-benchmark regime: the benchmark gram set becomes a Bloom filter (~7 bits/gram, sized from the measured count) probed by the native codegen'd might_contain predicate BEFORE any join, so corpus grams that cannot match never enter a shuffle even when the gram set is far past broadcast size; the exact join then removes the fpp sliver of false positives - output byte-identical to the broadcast path (same oracle).",
  "samp_hash" -> "Content-hash sampling: a narrow md5-threshold filter, no shuffle before the (ordered) output; the scan reads only the projected columns.",
  "tx_entropy" -> "Token entropy: explode feeds two stacked hash aggregations, both map-side combinable - only (doc, token) counts cross the first shuffle, per-doc partials the second; the log2 arithmetic runs post-aggregate on one row per doc.",
  "tx_boiler_grams" -> "Boilerplate profile: grams travel as xxhash64; the vocabulary-sized document-frequency aggregate joins back to the gram stream (AQE broadcasts it at this scale, shuffles+skew-splits beyond), DF as a hash aggregate - never a window over the gram stream.",
  "tx_lm_score" -> "Bigram-LM score: one corpus-wide (prefix,bigram) count aggregate; the prefix counts derive from it by a vocabulary-sized second aggregation (exchange reused), and both count tables broadcast back onto the bigram stream.",
  "dd_repeated_spans" -> "Repeated-span coverage: window hashes as xxhash64, the repeated-gram table joins back under AQE, and the union-of-intervals coverage is an aggregate HOF over each doc's bounded flagged-position list - no window sort over the corpus-wide span stream.",
  "tx_heavy_hitters" -> "Misra-Gries heavy hitters: bounded O(m) sketch state per task, partials merge by counter-sum + rebase, only m counters per task cross the shuffle - vs a groupBy(token) that would shuffle the whole token stream.",
  "pipe_fates" -> "Drop-reason audit: one scoring pass, winner pick as the min_by hash aggregate over quality passers, ids-only join back to tag fates - the documents are never shuffled twice.",
  "j15_asof_join" -> "Backward as-of join with NO join node: both sides tagged and unioned, ONE hash exchange on the key, a running last(ignoreNulls) window frame carries the most recent right payload onto each left row - the distributed merge form of ASOF, never a quadratic inequality BNLJ.",
  "j17_asof_forward" -> "Forward (earliest-at-or-after) as-of join - the mirror of j15 with the frame reversed: same single exchange and tagged union, a running first(ignoreNulls) over CurrentRow..UnboundedFollowing carries the NEXT right payload back onto each left row; null-ts left rows are routed around the window (they would otherwise see every right row in their following frame).",
  "j16_range_join" -> "Interval containment as an equi join: intervals explode into fixed-width bins (bounded fan-out), points map to exactly one bin, the join runs equi on (key,bin) and the exact predicate filters after - a plain SMJ/hash join AQE can size or broadcast, never a BNLJ.",
  "dd_bucketed_incremental" -> "Bucketed-index incremental dedup: candidate and verify joins read the accumulated index tables bucket-aligned (zero exchange on the index side - the side that grows without bound under daily ingest); only the arriving batch shuffles to the bucket layout. Final plan reads the survivor checkpoint; the zero-exchange index reads are pinned in BucketedIndexSpec.",
  "f7_spec_hash" -> "Reference hash_dict parity digest: scan -> project through the codegen'd py_canonical_json + sha2 pipeline -> ordered output; one narrow projection, no shuffle before the final ORDER BY.",
  "mol_qcel_canonical" -> "QCElemental get_hash pre-image: pure codegen'd projection (qcel_molecule_canonical over the synthesized molecule struct), no shuffle before the final ORDER BY.",
  "sk_quantile_bottomk" -> "Quantile sketch: the sample side is a k-bounded MinKPairs ObjectHashAggregate (partial map-side, <=256 pairs per task per group - never a per-group sort), broadcast onto the exact-reference side; the exact ranks come from the materialized distributed globalRank (range partition + shard offsets) minus literal per-group offsets - no window partitioned by the ~3-value group key (that shape funneled the fact table into 3 single-task sorts). Estimates are pure index selection, so even they hash-match the oracle.",
  "sk_bloom_grams" -> "Size-adaptive Bloom: the 1-row sizing frame (hex-width integer arithmetic from the corpus count) broadcasts into both the bit-table build and the probes; membership is a hashed (i,bucket) join - never a false negative, false positives measured in the output.",
  "sk_cms_joinsize" -> "Join sizing from sketches alone: two d x 4096 CMS counter tables inner-product per hash row, MIN over rows - the broadcast-vs-shuffle decision input computed without rescanning either join side, all integer, oracle-exact.",
  "sk_hll_incremental" -> "Persistent sketch index: per-batch registers in batch=<id> partitions (idempotent overwrite), the serving read MAX-merges all batches; register losslessness makes the served estimate bit-identical to the full-table sketch at bytes of index per batch.",
  "lay_compaction" -> "Small-files compaction plan: sequential bin packing by a DISTRIBUTED running byte sum (range partition + counts-only shard offsets + in-shard window) - the single-partition SUM OVER (ORDER BY) a naive planner would emit never appears; bins and boundaries are exact integer arithmetic the oracle replays.",
  "tx_cdc_chunks" -> "Content-defined chunking: md5-mod cut rule over trailing token windows as bounded per-doc HOFs (insertion re-synchronization is the point - fixed chunking loses every offset); only fingerprints shuffle for the cross-document shared-chunk aggregation.",
  "dd_cdc_incremental" -> "Chunk-level incremental dedup: the batch's CDC fingerprints left-anti join the persistent fingerprint index (bytes per unique passage, batch=<id> idempotent commits); copied passages score novel=0 even at shifted offsets, and the whole pipeline hash-checks against the oracle.",
  "sim_knn_sq8" -> "Scalar 8-bit quantization ANN: encode is a pure map (per-dim ranges inline as plan literals - plan-pinned exchange-free), scoring reconstructs from the codes column alone, the bounded shortlist heap caps the shuffle, and only shortlist rows touch raw vectors in the exact re-rank.",
  "dd_semdedup" -> "SemDeDup: assignment against literal anchor centroids is a pure map over the scan; the within-cell pairwise compare self-joins ON CELL ONLY (quadratic in the cell, linear overall via k ~ n/cellSize), dominated ids distinct-ed before the survivors anti-join - nothing all-pairs across cells.",
  "tx_bm25_topk" -> "BM25 retrieval: postings filtered to the query terms BEFORE the (doc,term) shuffle, and the document LENGTH rides that aggregate as a grouping column (functionally dependent on doc_id) — no corpus-sized (doc_id, dl) frame is ever exchanged to answer a top-k; df and (N,avgdl) broadcast back, per-doc weights decimal-summed map-side, top-k a TakeOrderedAndProject - never a global sort.",
  "tx_dsir" -> "DSIR importance weights: both hashed-bigram LMs from ONE bucket-grouped pass (target count rides the raw count's shuffle as a conditional sum); the buckets-row weight table broadcasts onto the gram stream; per-doc decimal log-ratio sums are the only data-sized aggregation.",
  "st14_stream_score" -> "Streaming DSIR scoring: the weight map is a plan LITERAL (index-artifact billing), so per-doc scoring is a stateless projection - no join, no shuffle, no streaming state; append mode on an unbounded stream at constant per-doc work, converged output sharing the batch scorer's oracle.",
  "dd_containment" -> "Asymmetric containment: distinct per-doc grams, stop-gram (df > maxDf) prune BEFORE the pair join caps per-gram fan-out at maxDf^2, denominators from the unpruned gram-set sizes - the quote/subset detector at linear cost.",
  "sim_mmr_rerank" -> "MMR diversified re-rank: the expensive stage is the oracle-checked brute-force shortlist; each greedy step is a TakeOrdered over the BOUNDED shortlist with the previous picks broadcast - constant work per step, fully plan-side.",
  "w4_rolling_stats" -> "Rolling window stats: user_id is the window partition key (hash exchange, parallel across users), the 7-row frame is constant work per row and the cumulative sum a running aggregate; decimal frame sums keep the oracle hash-exact.",
  "tx_bpe_fit" -> "BPE fit over the word-frequency table: the one corpus pass is the (word, freq) aggregate (checkpointed scan here); each merge round is a bounded pair-count hash-agg, a 1-row TakeOrdered winner, and a broadcast symbol-array merge fold — the corpus is never re-read.",
  "tx_bpe_tokens" -> "BPE apply side: the bounded (word -> n_sym) table from the fitted repr broadcasts onto per-(source, word) occurrence counts — the corpus text is tokenized exactly once (the occurrence hash-agg); no per-document re-segmentation, no vocab-sized shuffle.",
  "tx_phrase_search" -> "Query-literal phrase scan: codegen'd rlike prefilter (\\s+ between terms, so multi-whitespace hits survive) feeds slice/zip/posexplode adjacency verification; only matched positions reach the per-doc aggregate. No HOF lambdas (CodegenFallback) on the corpus path.",
  "mm_image_phash" -> "Perceptual image dedup: decode+hash are per-row map work inside partition batches (image bytes never shuffle); candidate (aHash) and verify (crop digest) clusterings are counts-only hash-aggs on fixed-width keys joined back.",
  "mm_audio_fingerprint" -> "Audio near-dup: per-row JDK decode to a fixed-width energy-contour fingerprint inside partition batches (audio bytes never shuffle); the contour key buckets candidates, exact digest verifies — sketch-then-verify on counts-only aggregates.",
  "samp_dsir_topk" -> "DSIR importance resampling: the scored weight frame is a session-cached checkpoint (scan), the log-space ES key is a pure projection, and the draw is a TakeOrdered top-k — no sort shuffle.",
  "dd_funnel" -> "Per-stage dedup report as ONE plan: each stage count is a 1-row aggregate chained by designed 1-row crossJoins (the BroadcastNestedLoopJoins below are those single-row stat joins); the containment stage's SortMergeJoin is the gram self-join whose fan-out the df<=64 stop-gram prune bounds.",
  "dd_snapshot_diff" -> "Snapshot diff: row-local content digests, then one full-outer SortMergeJoin on the snapshot key (both sides corpus-scale; full-outer cannot broadcast) — unchanged docs never leave the join.",
  "st15_stream_decontaminate" -> "Streaming decontamination: the benchmark gram set is a broadcast-joined static frame built once per stream start; each micro-batch's grams hash and probe it map-side — per-batch work linear in the batch, no stream-side state growth.",
  "st16_stream_phash" -> "Streaming image signer: decode + perceptual hash as stateless per-row map work inside each micro-batch (foreachBatch parquet sink, distributed write); no state store — the dedup join happens against the persistent index, not stream memory.",
  "tx_distinct_ngrams_approx" -> "The 100 TB diversity profile: grams hash to 64-bit BEFORE aggregation (8-byte shuffle rows) and distinct counts are approx_count_distinct (HLL++ rsd 1%) — fixed-size mergeable sketch per (source, n) partial, so map-side state is KB regardless of corpus size; the exact-DISTINCT sibling is the oracle anchor and Verify records the per-round measured error.",
  "dd_semdedup_incremental" -> "Incremental SemDeDup ingest: per batch, assignment against the frozen literal centroids is a pure map, the batch x index compare joins ON CELL ONLY (both sides cell-co-partitioned; work is batch x cellSize, never index-quadratic), and commits are idempotent batch=<id> overwrites. The final plan below reads the per-batch survivor checkpoints — the domination joins ran eagerly inside each addBatch.",
  "tx_bm25_incremental" -> "Indexed BM25: the query answers from the persistent term-bucketed postings index alone — the scan shows PartitionFilters on tb (only the query terms' buckets are even listed) plus PushedFilters on term within them, stats come from the rows-per-batch _stats sidecar, and the scoring tail is the same TakeOrdered pipeline as the scan row. The corpus itself is never re-read at query time; tokenization cost was paid once at addBatch.",
  "sim_hybrid_rrf" -> "Reciprocal rank fusion: both rankers end in LIMIT-bounded, eagerly-checkpointed 50-row shortlists, so the two rank windows run over 50 rows each (bounded by construction - the single-partition WindowExec is fused over a checkpoint scan, never data-sized) and the fusion is a 50x50 full-outer SMJ. The corpus-scale work is exactly the two shortlist builders: the BM25 term-filtered aggregate and one broadcast-query cosine pass.",
  "tx_ppl_buckets" -> "CCNet perplexity terciles: the LM is tx_lm_score's pass (16-byte hashed-bigram count shuffles), then ONE per-source range-sorted window computes NTILE(3) over (lm_score, doc_id) - integer math, no float cutoffs. At 100x the window swaps for sampled cutoff thresholds broadcast onto a stateless projection (the tx_distinct_ngrams_approx precedent); the exact form stays as the oracle anchor.",
  "st17_stream_index" -> "Streaming postings ingest: each micro-batch tokenizes once and commits term-bucketed postings + a 2-row stats sidecar to its own batch partition (foreachBatch retries overwrite themselves). The plan below is the post-convergence QUERY - identical pruned-scan shape to tx_bm25_incremental, because the index is a pure function of the ingested document set regardless of arrival order or batching."
)

val pw = new PrintWriter("PLANS.md", "UTF-8")
pw.println("# PLANS — physical plans of headline queries")
pw.println()
pw.println("Generated by `tools/dump_plans.scala` at sf0.001 (plan shape is scale-")
pw.println("independent; AQE may re-plan exchanges at runtime). Each section states")
pw.println("the property the plan is designed around; `PlanSpec` pins the load-")
pw.println("bearing ones in CI.")
for ((name, note) <- notes) {
  val df = SparkEntry.queries(name)(spark, dir)
  pw.println()
  pw.println(s"## $name")
  pw.println()
  pw.println(note)
  pw.println()
  pw.println("```")
  pw.println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode).trim)
  pw.println("```")
}
pw.close()
println("WROTE PLANS.md")
sys.exit(0)
