package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.operators.{Analytics, Dedup, FreqSketch, Indicators, KeyedOps, Layout, Multimodal, Pipeline, Relational, Sessionize, Similarity, Skew, StatefulQueries, TextOps, TopK, TwsQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query naming: q1..q4 are the reference's four keyed-state jobs
  * (SURVEY.md §2.1 A1..A4) re-targeted onto the `events` table with a
  * deterministic total order (ts, event_id); q5+ are the relational surface
  * (joins, top-k, pushdown, semi-join, distinct, rollup); the named queries
  * are the training-data-pipeline operators (text analysis, dedup,
  * similarity search).
  *
  * Oracle parity rules used throughout (and verified bit-exact locally):
  *  - money/value aggregates: exact DECIMAL(18,x) sums cast to DOUBLE at the
  *    end — partial-aggregation order can't perturb the result;
  *  - integer outputs: long on the Spark side (DuckDB emits BIGINT);
  *  - text hashing: polynomial ASCII hashes (integer arithmetic only);
  *  - cosine: sequential-fold dot products in double (bit-equal to DuckDB's
  *    list_dot_product on DOUBLE[]);
  *  - every query ends in the same deterministic ORDER BY on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The curation manifest composes the engine's own dedup, quality, and
    * split operators into one plan — one row per document, every gate's
    * verdict, the final selection. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.curationManifest(spark, "/root/testdata/sf0.001")

  private val P = graft.functions.TextFunctions.HashMod // 1000000007

  /** Source-priority list for dedup_decisions_pref — earlier = preferred;
    * shared by the Spark query and the oracle CASE so they cannot drift. */
  val DedupPrefer: Seq[String] = Seq("src7", "src3")

  /** Per-source sampling rates for mix_sample (absent sources use the
    * default) — shared by the Spark query and the oracle CASE. */
  val MixRates: Map[String, Double] = Map("src7" -> 1.0, "src3" -> 0.25)
  val MixDefaultRate: Double = 0.5

  /** Per-source mixture WEIGHTS for mix_rates (absent sources use the
    * default) — shared by the Spark query and the oracle CASE. */
  val MixWeights: Map[String, Double] = Map("src7" -> 3.0, "src3" -> 3.0)
  val MixDefaultWeight: Double = 1.0

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference parity: the four keyed-state jobs (batch window forms) ----
    "q1_running_max" -> ((s, dir) => {
      val ev = Tables.events(s, dir).withColumn("yr", year(col("ts")).cast("long"))
      KeyedOps.runningMax(ev, Seq(col("yr")), Seq(col("ts_ns"), col("event_id")),
          col("value"), "run_max")
        .select(col("event_id"), col("yr"), col("run_max"))
        .orderBy(col("event_id"))
    }),
    "q2_block_avg" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      KeyedOps.blockAverage(ev, Seq(col("event_type")), Seq(col("ts_ns"), col("event_id")),
          col("value"), "avg_value")
        .orderBy(col("event_type"), col("block"))
    }),
    "q3_running_max_month" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("yr", year(col("ts")).cast("long"))
        .withColumn("mon", month(col("ts")).cast("long"))
      KeyedOps.runningMax(ev, Seq(col("yr"), col("mon")), Seq(col("ts_ns"), col("event_id")),
          col("value"), "run_max")
        .select(col("event_id"), col("yr"), col("mon"), col("run_max"))
        .orderBy(col("event_id"))
    }),
    "q4_threshold_gaps" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      KeyedOps.thresholdGaps(ev, Seq(col("event_type")), Seq(col("ts_ns"), col("event_id")),
          col("value"), 100.0, "gap")
        .select(col("event_id"), col("event_type"), col("gap"))
        .orderBy(col("event_id"))
    }),
    // ---- reference parity: the same four jobs in their STATEFUL streaming
    //      form (flatMapGroupsWithState, batch-executed) — same oracles ----
    "q1s_running_max_stateful"  -> ((s, dir) => StatefulQueries.runningMaxStateful(s, dir)),
    // all four jobs through the REAL micro-batch engine (readStream → state
    // store → sink) — same oracles as the batch forms
    "q1r_running_max_streaming" -> ((s, dir) => StatefulQueries.runningMaxStreaming(s, dir)),
    // q1 on the RocksDB state store — the larger-than-heap state backend
    "q1rdb_running_max_rocksdb" -> ((s, dir) => StatefulQueries.runningMaxStreamingRocksDb(s, dir)),
    // q1 over the SOCKET source — push-based, non-replayable ingest
    "q1k_running_max_socket"    -> ((s, dir) => StatefulQueries.runningMaxSocketStream(s, dir)),
    "q2r_block_avg_streaming"   -> ((s, dir) => StatefulQueries.blockAvgStreaming(s, dir)),
    // q2 across TWO streaming runs sharing a checkpoint (state recovery)
    "q2c_block_avg_checkpoint"  -> ((s, dir) => StatefulQueries.blockAvgCheckpointed(s, dir)),
    "q3r_running_max_month_streaming" -> ((s, dir) => StatefulQueries.runningMaxMonthStreaming(s, dir)),
    "q4r_threshold_gaps_streaming" -> ((s, dir) => StatefulQueries.thresholdGapsStreaming(s, dir)),
    "q2s_block_avg_stateful"    -> ((s, dir) => StatefulQueries.blockAvgStateful(s, dir)),
    "q3s_running_max_month_stateful" -> ((s, dir) => StatefulQueries.runningMaxMonthStateful(s, dir)),
    "q4s_threshold_gaps_stateful" -> ((s, dir) => StatefulQueries.thresholdGapsStateful(s, dir)),
    // ---- the same jobs on Spark 4 transformWithState — LITERAL Flink
    //      state shapes (ValueState / MapState / ListState handles) through
    //      the real micro-batch engine on RocksDB, two-batch replay ----
    "q1t_running_max_tws"       -> ((s, dir) => TwsQueries.runningMaxTws(s, dir)),
    "q2t_block_avg_tws"         -> ((s, dir) => TwsQueries.blockAvgTws(s, dir)),
    // the TWS literal-state form across two checkpoint-sharing runs
    "q2ct_block_avg_tws_checkpoint" -> ((s, dir) => TwsQueries.blockAvgTwsCheckpointed(s, dir)),
    "q3t_running_max_month_tws" -> ((s, dir) => TwsQueries.runningMaxMonthTws(s, dir)),
    "q4t_threshold_gaps_tws"    -> ((s, dir) => TwsQueries.thresholdGapsTws(s, dir)),
    // session windows on TWS EVENT-TIME TIMERS (registerTimer /
    // handleExpiredTimer), disordered replay, RocksDB
    "q13t_sessionize_tws"       -> ((s, dir) => TwsQueries.sessionizeTws(s, dir)),
    // Holt-Winters on transformWithState: ValueState level/trend + the
    // seasonal ring in a literal ListState — the compound-state witness
    "holt_winters_by_type_tws"  -> ((s, dir) => TwsQueries.holtWintersTws(s, dir)),
    // ---- the same jobs as spill-safe SECONDARY-SORT passes (the 100 TB
    //      batch execution: memory independent of group size) — same oracles ----
    "q1p_running_max_secondary_sort" -> ((s, dir) => StatefulQueries.runningMaxSecondarySort(s, dir)),
    "q2p_block_avg_secondary_sort"   -> ((s, dir) => StatefulQueries.blockAvgSecondarySort(s, dir)),
    "q3p_running_max_month_secondary_sort" -> ((s, dir) => StatefulQueries.runningMaxMonthSecondarySort(s, dir)),
    "q4p_threshold_gaps_secondary_sort" -> ((s, dir) => StatefulQueries.thresholdGapsSecondarySort(s, dir)),
    // ---- relational surface ----
    "q5_pricing_summary"  -> ((s, dir) => Relational.pricingSummary(s, dir)),
    "q6_revenue_by_nation" -> ((s, dir) => Relational.revenueByNation(s, dir)),
    // q6 as a STREAM-STATIC join + COMPLETE-mode streaming aggregation
    "q6ss_revenue_join_stream_static" -> ((s, dir) => StatefulQueries.revenueJoinStreamStatic(s, dir)),
    "q7_top_parts"        -> ((s, dir) => Relational.topPartsByBrand(s, dir)),
    "q8_filtered_revenue" -> ((s, dir) => Relational.filteredRevenue(s, dir)),
    "q9_order_priority"   -> ((s, dir) => Relational.orderPriorityCounts(s, dir)),
    "q10_distinct_counts" -> ((s, dir) => Relational.distinctCounts(s, dir)),
    "q10a_approx_distinct" -> ((s, dir) => Relational.approxDistinctCounts(s, dir)),
    "q10b_approx_quantiles" -> ((s, dir) => Relational.approxQuantiles(s, dir)),
    "q11_orders_rollup"   -> ((s, dir) => Relational.ordersRollup(s, dir)),
    "q24_pivot"           -> ((s, dir) => Relational.revenuePivot(s, dir)),
    "q25_unpivot"         -> ((s, dir) => Relational.partMetricsUnpivot(s, dir)),
    // the five-way join: nation plays two roles, supplier joins the fact
    "q26_bi_nation_volume" -> ((s, dir) => Relational.biNationVolume(s, dir)),
    // pushdown through joins + global top-k on an aggregate (TakeOrdered)
    "q27_shipping_priority" -> ((s, dir) => Relational.shippingPriority(s, dir)),
    // the exact three-factor money product (price·(1−disc)·(1+tax))
    "q28_pricing_charge" -> ((s, dir) => Relational.pricingCharge(s, dir)),
    // ---- training-data pipeline: text analysis ----
    "text_stats"       -> ((s, dir) => TextOps.textStats(s, dir)),
    // source-format witnesses: the SAME computation over a json/orc copy of
    // the fixture, read with the explicit schema, under the parquet oracle —
    // format round-trip fidelity is hash-checked, not assumed
    "text_stats_json_source" -> ((s, dir) =>
      TextOps.textStatsOf(Tables.formatCopy(s, dir, "documents", "json")
        .select(col("doc_id"), col("text")))),
    "q5_orc_source" -> ((s, dir) =>
      Relational.pricingSummaryOf(Tables.formatCopy(s, dir, "lineitem", "orc"))),
    "lang_id"          -> ((s, dir) => TextOps.langId(s, dir)),
    // code-switch detection: runner-up marker score >= half the winner —
    // integer test over one sorted score array, single projection
    "lang_mixed_flag"  -> ((s, dir) => TextOps.langMixedFlag(s, dir)),
    // per-source length distribution (p50/p95/mean tokens) — the first
    // corpus-curation dashboard; percentile parity pinned by q33
    "doc_length_stats" -> ((s, dir) => TextOps.docLengthStats(s, dir)),
    "doc_fingerprints" -> ((s, dir) => TextOps.fingerprints(s, dir)),
    "quality_filter"   -> ((s, dir) => TextOps.qualityFilter(s, dir)),
    // the same gate through the real micro-batch engine (stateless streaming)
    "quality_filter_streaming" -> ((s, dir) => TextOps.qualityFilterStream(s, dir)),
    "rep_stats"        -> ((s, dir) => TextOps.repetitionStats(s, dir)),
    // corpus-statistics quality scoring: vocabulary-sized counts shuffle,
    // broadcast back, map-side per-doc rarity — integer-exact gate
    "token_rarity"     -> ((s, dir) => TextOps.tokenRarity(s, dir)),
    // the open-vocabulary form: Count-Min point estimates probe a frozen
    // constant-size matrix (codegen'd expression, no join) instead of
    // broadcasting vocabulary-sized exact counts; collision-free at test
    // width, so it registers under the same exact oracle
    "token_rarity_sketch" -> ((s, dir) => TextOps.tokenRaritySketch(s, dir)),
    // bigram LM scoring: two CM folds + join-free probe of both matrices;
    // integer ppm conditional frequencies, exact at the test vocabulary
    "lm_bigram_score_sketch" -> ((s, dir) => TextOps.lmBigramScoreSketch(s, dir)),
    // retrieval-based selection: BM25-shaped (rational, log-free) ranking
    // against a derived seed-query term set
    "bm25_topdocs"     -> ((s, dir) => TextOps.bm25TopDocs(s, dir)),
    // collocation mining: top-k PMI-ranked adjacent token pairs (log-free
    // rational score), min-count pruned before the unigram joins
    "pmi_bigrams"      -> ((s, dir) => TextOps.pmiBigrams(s, dir)),
    // sparse tf-idf cosine top-k document pairs over a df-capped inverted
    // index — the lexical complement to the dense ANN family
    "doc_sim_sparse_topk" -> ((s, dir) => TextOps.docSimSparseTopK(s, dir)),
    "doc_sim_df_stats" -> ((s, dir) => TextOps.docSimDfStats(s, dir)),
    // per-source lexical diversity: type-token ratio + Simpson index
    // (the log-free entropy surrogate — exact longs, two final double ops)
    "token_diversity_by_source" -> ((s, dir) => TextOps.tokenDiversityBySource(s, dir)),
    "winnow_fingerprints" -> ((s, dir) => TextOps.winnowFingerprints(s, dir)),
    "vocab_topk"       -> ((s, dir) => TextOps.vocabTopK(s, dir)),
    // the same top-k through a mergeable Misra-Gries heavy-hitters sketch
    // (capacity >> test vocabulary, so the summary is exact and shares the
    // exact oracle; at production vocabularies it stays O(capacity) state
    // instead of a vocabulary-wide shuffle)
    "vocab_topk_sketch" -> ((s, dir) => FreqSketch.vocabTopKSketch(s, dir)),
    // the sketch as a streaming complete-mode global aggregate: total
    // streaming state = ONE capacity-bounded summary
    "vocab_topk_sketch_streaming" -> ((s, dir) => FreqSketch.vocabTopKSketchStreaming(s, dir)),
    // keyed heavy hitters: one bounded summary per language — the shuffle
    // key is the group, never the vocabulary
    "vocab_topk_by_lang_sketch" -> ((s, dir) => FreqSketch.vocabTopKByLangSketch(s, dir)),
    // the keyed sketch through the real micro-batch engine: one literal
    // ValueState[MGSummary] per language on RocksDB (transformWithState),
    // cumulative emission, cross-batch witness — state stays
    // languages x capacity no matter the vocabulary
    "vocab_topk_by_lang_sketch_streaming" -> ((s, dir) => FreqSketch.vocabTopKByLangSketchTws(s, dir)),
    // event-time-windowed heavy hitters: one MG summary per tumbling day,
    // shuffle keyed on the window, never the user id
    "topk_users_daily_sketch" -> ((s, dir) => FreqSketch.topKUsersDailySketch(s, dir)),
    // mergeable HLL rollup: per-day sketches, running union for cumulative
    // distinct users — exact at fixture cardinality (sparse mode)
    "hll_daily_users" -> ((s, dir) => FreqSketch.hllDailyUsers(s, dir)),
    // Count-Min point-frequency estimates for a known query-token set:
    // corpus folds map-side into one constant-size counter matrix
    "token_df_countmin" -> ((s, dir) => FreqSketch.tokenDfCountMin(s, dir)),
    "split_stratified" -> ((s, dir) => TextOps.stratifiedSplit(s, dir)),
    // group-aware split: every event of a user lands in one split, with
    // the leakage audit computed from the assigned rows, never assumed
    "split_grouped_leakfree" -> ((s, dir) => TextOps.groupedSplitLeakfree(s, dir)),
    // temporal holdout with an embargo band: train <= cut day < embargo <
    // test, cut = the 8th-decile distinct day (purged-CV rule)
    "split_time_embargo" -> ((s, dir) => TextOps.splitTimeEmbargo(s, dir)),
    "contamination_check" -> ((s, dir) => TextOps.contamination(s, dir)),
    "contamination_external" -> ((s, dir) => TextOps.contaminationExternal(s, dir)),
    // the same decontamination with a bloom-filter prefilter on the train
    // fingerprint stream — exact result, map-side pruning before the shuffle
    "contamination_bloom" -> ((s, dir) => TextOps.contaminationBloom(s, dir)),
    // raw 5-gram overlap (the exhaustive GPT-3-style method; winnowing
    // above samples) — any shared n-gram flags the train/eval pair
    "contamination_ngram" -> ((s, dir) => TextOps.contaminationNgram(s, dir)),
    "curation_manifest" -> ((s, dir) => Pipeline.curationManifest(s, dir)),
    // pipeline COMPOSITION through the real micro-batch engine: stateless
    // quality projection chained into state-store exact-dedup ownership in
    // one streaming query over a two-batch doc_id-ordered replay
    "curation_manifest_streaming" -> ((s, dir) => Pipeline.curationManifestStream(s, dir)),
    "tfidf_top_terms"  -> ((s, dir) => TextOps.tfidfTopTerms(s, dir)),
    // the hashing trick: vocabulary-free fixed-width featurizer — token
    // hash mod 64 slots, per-doc counts, no fit pass at any scale
    "feature_hash_vectors" -> ((s, dir) => TextOps.featureHashVectors(s, dir)),
    "pack_assign"      -> ((s, dir) => TextOps.packAssign(s, dir)),
    // packing with document SPLITTING: per-(doc, pack) token spans
    "pack_segments"    -> ((s, dir) => TextOps.packSegments(s, dir)),
    "pii_scrub"        -> ((s, dir) => TextOps.piiScrub(s, dir)),
    "corpus_mix"       -> ((s, dir) => TextOps.corpusMix(s, dir)),
    "mix_sample"       -> ((s, dir) => TextOps.mixSample(s, dir, MixRates, MixDefaultRate)),
    "mix_rates"        -> ((s, dir) => TextOps.mixRates(s, dir, MixWeights, MixDefaultWeight)),
    // temperature sampling at α = 1/2 (the sqrt special case — the one
    // power IEEE correctly rounds, so the hash gate holds cross-engine)
    "corpus_mix_temperature" -> ((s, dir) => TextOps.corpusMixTemperature(s, dir)),
    // the composed pipeline: data-derived temperature rates broadcast back
    // as deterministic hash thresholds — the actually-sampled corpus
    "mix_sample_temperature" -> ((s, dir) => TextOps.mixSampleTemperature(s, dir)),
    // ---- training-data pipeline: dedup ----
    "dedup_exact"      -> ((s, dir) => Dedup.exact(s, dir)),
    // the same decision through the real micro-batch engine (state store
    // keyed by content hash, order-insensitive post-aggregation)
    "dedup_exact_streaming" -> ((s, dir) => Dedup.exactStreaming(s, dir)),
    // the engine's own streaming dropDuplicates over a two-batch replay:
    // deterministic fingerprint SET (survivor row stays with exactStreaming)
    "dedup_exact_native_streaming" -> ((s, dir) => Dedup.exactNativeStreaming(s, dir)),
    // the engine's native BOUNDED-state dedup API over the events replay:
    // dropDuplicatesWithinWatermark (delay > span => exact distinct set)
    "dedup_exact_wwm_streaming" -> ((s, dir) => Dedup.exactWwmStreaming(s, dir)),
    // increments dedup against a PERSISTED fingerprint store (read snapshot
    // → left-anti → append survivors' fps, versioned idempotent journal)
    "dedup_incremental_snapshot" -> ((s, dir) => Dedup.dedupIncrementalSnapshot(s, dir)),
    // the near-dup counterpart: increments probe a PERSISTED LSH band
    // index (signatures computed only for the increment; buckets FREEZE at
    // the cap — the arrival-rank rule the oracle states)
    "dedup_lsh_incremental" -> ((s, dir) => Dedup.dedupLshIncremental(s, dir)),
    // journal COMPACTION read-equivalence: fold all versions into one base
    // (a year of daily ingest should not read 365 dirs) — same oracle
    "dedup_incremental_compacted" -> ((s, dir) => Dedup.dedupIncrementalCompacted(s, dir)),
    // compaction gate on the SECOND journal shape: the LSH band index,
    // where the fold must preserve per-bucket membership exactly (the
    // freeze-at-cap admission counts stored members)
    "dedup_lsh_index_compacted" -> ((s, dir) => Dedup.dedupLshIndexCompacted(s, dir)),
    // the BOUNDED-state form: event-time TTL expires cold fingerprints
    // (dedup-within-horizon over the events stream, state O(warm fps))
    "dedup_exact_ttl_streaming" -> ((s, dir) => Dedup.exactTtlStreaming(s, dir)),
    // the TTL form hardened for OUT-OF-ORDER arrival, replayed over a
    // deliberately disordered split (late-but-within-watermark rows in a
    // LATER micro-batch) — buffer-until-watermark, same data-driven oracle
    "dedup_exact_ttl_ooo_streaming" -> ((s, dir) => Dedup.exactTtlOooStreaming(s, dir)),
    // the same op on the RocksDB state store — the provider swap on the
    // repo's largest state (pending buffers, not accumulators)
    "dedup_exact_ttl_rocksdb" -> ((s, dir) => Dedup.exactTtlOooRocksDb(s, dir)),
    // native state TTL: the generation accumulator is a ValueState with a
    // real TTLConfig (store-side expiry), same data-driven oracle
    "dedup_exact_ttl_tws" -> ((s, dir) => Dedup.exactTtlTws(s, dir)),
    "dedup_ngram_jaccard" -> ((s, dir) => Dedup.ngramJaccard(s, dir)),
    // standing shingle-freq headroom observable for the line above — the
    // doc_sim_df_stats mold over the shingle space (freq distribution vs
    // cap, Σ f·(f−1)/2 candidate pairs, what the cap drops)
    "dedup_ngram_shingle_stats" -> ((s, dir) => Dedup.ngramShingleStats(s, dir)),
    "dedup_minhash_sigs"  -> ((s, dir) => Dedup.minhashSignatures(s, dir)),
    "dedup_minhash_lsh"   -> ((s, dir) => Dedup.minhashLsh(s, dir)),
    // source-level corpus overlap: per-source sig = min-reduce of per-doc
    // sigs (MinHash set-union property), pairwise equal-component Jaccard
    "source_similarity_minhash" -> ((s, dir) => Dedup.sourceSimilarityMinhash(s, dir)),
    "dedup_simhash"       -> ((s, dir) => Dedup.simhash(s, dir)),
    "dedup_simhash_pairs" -> ((s, dir) => Dedup.simhashPairs(s, dir)),
    "dedup_lsh_dropped"   -> ((s, dir) => Dedup.lshBucketStats(s, dir)),
    "dedup_lsh_components" -> ((s, dir) => Dedup.lshComponents(s, dir)),
    "dedup_lsh_components_star" -> ((s, dir) => Dedup.lshComponentsStar(s, dir)),
    "dedup_paragraph"  -> ((s, dir) => Dedup.paragraphDedup(s, dir)),
    "dedup_containment" -> ((s, dir) => Dedup.containment(s, dir)),
    // the shift-invariant form: winnowing fingerprints replace the
    // fixed-offset chunk anchor (a 1-token-shifted copy still shares fps)
    "dedup_containment_winnow" -> ((s, dir) => Dedup.containmentWinnow(s, dir)),
    // the transform face of paragraph dedup: drop corpus-frequent chunks,
    // emit the kept sequence's position-ordered fold as the rewrite identity
    "boilerplate_strip" -> ((s, dir) => Dedup.boilerplateStrip(s, dir)),
    "dedup_cluster_sizes" -> ((s, dir) => Dedup.clusterSizes(s, dir)),
    "dedup_decisions"  -> ((s, dir) => Dedup.dedupDecisions(s, dir)),
    "dedup_decisions_pref" -> ((s, dir) => Dedup.dedupDecisionsPreferring(s, dir, DedupPrefer)),
    // ---- training-data pipeline: similarity search ----
    "ann_brute_topk"   -> ((s, dir) => Similarity.bruteForceTopK(s, dir)),
    "ann_ivf_topk"     -> ((s, dir) => Similarity.ivfTopK(s, dir)),
    "ann_lsh_topk"     -> ((s, dir) => Similarity.lshTopK(s, dir)),
    "ann_lsh_multiprobe_topk" -> ((s, dir) => Similarity.lshMultiProbeTopK(s, dir)),
    "kmeans_assign"        -> ((s, dir) => Similarity.kmeansAssignments(s, dir)),
    // micro-batch appends into the cell index against the FROZEN trained
    // coarse model (zero Lloyd trains on the append path, spec-pinned)
    "ann_ivf_append_streaming" -> ((s, dir) => Similarity.ivfAppendStreaming(s, dir)),
    "kmeans_assign_sampled" -> ((s, dir) => Similarity.kmeansAssignmentsSampled(s, dir)),
    "ann_ivf_trained_topk" -> ((s, dir) => Similarity.ivfTrainedTopK(s, dir)),
    // the same trained search with the centroid assignment as a BROADCAST
    // table (the nlist >> 64 path — plan literals stop scaling there)
    "ann_ivf_bcast_topk"   -> ((s, dir) => Similarity.ivfBcastTopK(s, dir)),
    "ann_ivf_trained_probe2" -> ((s, dir) => Similarity.ivfTrainedMultiProbeTopK(s, dir)),
    "ann_ivf_trained_probe4" -> ((s, dir) => Similarity.ivfTrainedMultiProbeTopK(s, dir, nProbe = 4)),
    "cosine_near_dup"  -> ((s, dir) => Similarity.cosineNearDup(s, dir, threshold = 0.4)),
    "semantic_near_dup" -> ((s, dir) => Similarity.semanticNearDup(s, dir)),
    // product quantization: M sub-quantizer codebooks; vectors compress to
    // M codeword ids (the IVF-PQ index memory layout), searched via ADC
    "pq_codes"         -> ((s, dir) => Similarity.pqCodes(s, dir)),
    // broadcast-table codeword assignment (production-k escape hatch)
    "pq_codes_bcast"   -> ((s, dir) => Similarity.pqCodesBcast(s, dir)),
    "ann_pq_adc_topk"  -> ((s, dir) => Similarity.pqAdcTopK(s, dir)),
    // the composed index: coarse cell prunes candidates, ADC scores codes
    "ann_ivfpq_topk"   -> ((s, dir) => Similarity.ivfPqTopK(s, dir)),
    // the residual refinement: books quantize v - centroid (FAISS IVF-PQ)
    "ann_ivfpq_residual_topk" -> ((s, dir) => Similarity.ivfPqResidualTopK(s, dir)),
    // the recall knob on the composed index: probe 2 cells, score codes
    "ann_ivfpq_probe2" -> ((s, dir) => Similarity.ivfPqMultiProbeTopK(s, dir)),
    "ann_ivfpq_probe4" -> ((s, dir) => Similarity.ivfPqMultiProbeTopK(s, dir, nProbe = 4)),
    // the refine step: ADC shortlist re-scored by TRUE cosine over raw
    // vectors (fetched for shortlist x Q rows only)
    "ann_ivfpq_rerank" -> ((s, dir) => Similarity.ivfPqRerankTopK(s, dir)),
    // recall@5 of EVERY pruned variant against ann_brute_topk — the number
    // the whole family's recall-for-pruning trade is tuned on
    "ann_recall"       -> ((s, dir) => Similarity.annRecall(s, dir)),
    // embedding-quality gate: cosine to own label's centroid, low = outlier
    "embedding_outliers" -> ((s, dir) => Similarity.embeddingOutliers(s, dir)),
    // StandardScaler FIT: per-dimension n/mean/std/min/max, exact integer
    // moments (round(x*2^20)), one map-side-combinable groupBy(dim)
    "embedding_dim_stats" -> ((s, dir) => Similarity.dimStats(s, dir)),
    // StandardScaler TRANSFORM: corpus stats broadcast back over a sample,
    // z = (x - mean)/std, zero corpus shuffle
    "embedding_standardize" -> ((s, dir) => Similarity.standardizeSample(s, dir)),
    // feature covariance/correlation matrix (upper triangle): exact
    // integer cross-moments, map-side-combined pair partials, 64-row
    // diagonal broadcast — the whitening/PCA-prep statistic
    "embedding_cov_matrix" -> ((s, dir) => Similarity.covMatrix(s, dir)),
    // no-training dimension reduction: deterministic ±1 sign projection
    // (Johnson-Lindenstrauss), exact integer sums on the quantized grid
    "embedding_jl_projection" -> ((s, dir) => Similarity.jlRandomProjection(s, dir)),
    // contrastive (anchor, positive, hard-negative) mining: positives from
    // the label cell, hard negatives from LSH bucket collisions
    "contrastive_triplets" -> ((s, dir) => Similarity.contrastiveTriplets(s, dir)),
    // ---- data layout: Z-order clustering key for two-dim scan pruning ----
    "zorder_zonemap"   -> ((s, dir) => Layout.zorderZonemap(s, dir)),
    // ---- time-based operators over events ----
    "q12_tumbling_hourly"  -> ((s, dir) => Sessionize.tumblingHourly(s, dir)),
    // incremental view maintenance: two partial aggregates merged by a
    // full-outer join — merge ≡ recompute, bit-for-bit (decimal partials)
    "q12i_tumbling_incremental" -> ((s, dir) => Sessionize.tumblingHourlyIncremental(s, dir)),
    "q12s_tumbling_streaming" -> ((s, dir) => Sessionize.tumblingHourlyStream(s, dir)),
    // update-mode foreachBatch into an idempotent batch-id parquet journal
    // (the exactly-once recipe for non-transactional sinks), compacted
    // newest-wins — the sink-side streaming witness
    "q12fb_tumbling_foreachbatch" -> ((s, dir) => Sessionize.tumblingHourlyForeachBatch(s, dir)),
    // per-type hourly volume anomaly: integer-exact |z|>2 spike flag
    "q12a_hourly_anomaly" -> ((s, dir) => Sessionize.hourlyVolumeAnomaly(s, dir)),
    // robust outlier days: median/MAD per type over exact daily totals —
    // the distribution-free twin of q12a's mean/stddev z-score
    "mad_anomaly_daily" -> ((s, dir) => Analytics.madAnomalyDaily(s, dir)),
    // engagement cadence: inter-session return gaps composed over the
    // sessionizer — the lag window runs on the session-sized table
    "session_return_gaps" -> ((s, dir) => Sessionize.sessionReturnGaps(s, dir)),
    // weekly seasonality baseline: per-(type, dow) mean daily total +
    // residuals — the seasonal-naive model the forecasting family lacked
    "seasonal_dow_residuals" -> ((s, dir) => Analytics.seasonalDowResiduals(s, dir)),
    // native sliding (hopping) windows: 1h window / 30min slide
    "q12w_sliding_halfhour" -> ((s, dir) => Sessionize.slidingHalfHour(s, dir)),
    "q12ws_sliding_streaming" -> ((s, dir) => Sessionize.slidingHalfHourStream(s, dir)),
    // resample + LOCF gap-fill: dense hourly spine over the aggregate
    "q29_gapfill_locf" -> ((s, dir) => Sessionize.gapfillLocf(s, dir)),
    // linear-interpolation resampling to the hourly grid: straight-line
    // values between bracketing ticks via one union+window pass
    "resample_linear_hourly" -> ((s, dir) => Sessionize.resampleLinearHourly(s, dir)),
    // the spine emitted incrementally from O(1) open-hour state; final
    // hours flushed by event-time timeout (the session-expiry contract)
    "q29s_gapfill_locf_streaming" -> ((s, dir) => Sessionize.gapfillLocfStreaming(s, dir)),
    // the disorder-hardened form: buffer-until-watermark over the
    // engineered-disorder replay, same batch oracle
    "q29o_gapfill_locf_ooo_streaming" -> ((s, dir) => Sessionize.gapfillLocfOooStreaming(s, dir)),
    // exact-decimal-moment regression/correlation (deterministic corr)
    "q30_regression_stats" -> ((s, dir) => Analytics.regressionStats(s, dir)),
    // multivariate face of q30: pairwise Pearson over hourly-count series,
    // exact decimal moments, closed-form IEEE finisher
    "corr_matrix_hourly" -> ((s, dir) => Analytics.corrMatrixHourly(s, dir)),
    // categorical hypothesis test: per-cell expected counts + the ordered-
    // fold chi-square statistic and its degrees of freedom
    "chi2_type_weekday" -> ((s, dir) => Analytics.chi2TypeWeekday(s, dir)),
    // retrospective single-changepoint CUSUM MLE per series: argmax of
    // the exact-integer max-deviation statistic, earliest-id tie-break
    "changepoint_by_type" -> ((s, dir) => Analytics.changepointByType(s, dir)),
    // experimentation readout: id-parity arms, heavy-purchaser success,
    // pooled two-proportion z in one fixed double tree
    "ab_test_ztest" -> ((s, dir) => Analytics.abTestZtest(s, dir)),
    // survival analysis: Nelson-Aalen cumulative hazard over customer
    // order lifetimes, ppm-quantized increments so the running sum is
    // an exact integer fold
    "survival_nelson_aalen" -> ((s, dir) => Analytics.survivalNelsonAalen(s, dir)),
    // revenue-inequality Gini via the banded two-level rank (no global
    // sort); exact decimal moments crossed once to double
    "revenue_gini" -> ((s, dir) => Analytics.revenueGini(s, dir)),
    // privacy admission gate: k-anonymity class sizes + l-diversity of
    // the sensitive attribute over the quasi-identifier tuple
    "k_anonymity_report" -> ((s, dir) => Analytics.kAnonymityReport(s, dir)),
    // ANALYZE-style one-scan numeric column profile (stack unpivot,
    // exact NDVs planned as a single expand)
    "column_stats_profile" -> ((s, dir) => Relational.columnStatsProfile(s, dir)),
    // the profile's 100 TB path: NDV via HLL++ (plain aggregate, no
    // expand), sketch gated in-plan against the exact NDV (q10a pattern)
    "column_stats_profile_sketch" ->
      ((s, dir) => Relational.columnStatsProfileSketch(s, dir)),
    // incremental profile maintenance: per-increment exact stats + stored
    // HLL blobs folded from a versioned journal — history never rescanned
    "column_stats_incremental" ->
      ((s, dir) => Relational.columnStatsIncremental(s, dir)),
    // compaction gate on the THIRD journal shape: the residue fold and the
    // binary HLL blobs must survive the read-all → write-all rewrite
    "column_stats_compacted" ->
      ((s, dir) => Relational.columnStatsCompacted(s, dir)),
    // mid-frequency-band inverted-index postings, df band + cap stated
    // in the oracle
    "inverted_index_postings" -> ((s, dir) => TextOps.invertedIndexPostings(s, dir)),
    // RAG hybrid retrieval: BM25 ⊕ dense-cosine rankings fused by
    // reciprocal rank (no score calibration across retrievers)
    "hybrid_rrf_topk" -> ((s, dir) => Similarity.hybridRrfTopK(s, dir)),
    // the fusion's registered dense-side scale path: IVF-pruned
    // candidates (query's coarse cell), ranks fused identically
    "hybrid_rrf_ivf_topk" -> ((s, dir) => Similarity.hybridRrfIvfTopK(s, dir)),
    // DeepWalk input: hash-deterministic walks over the user graph,
    // one frontier equi-join per step
    "random_walks_users" -> ((s, dir) => Analytics.randomWalksUsers(s, dir)),
    // deterministic synchronous LPA: majority neighbor label, 4 rounds
    // run identically by engine and oracle
    "label_prop_communities" -> ((s, dir) => Analytics.labelPropCommunities(s, dir)),
    // Newman modularity of LPA's labels vs the CC partition on the same
    // graph — exact-integer Q ratio, the detector's quality as data
    "community_modularity" -> ((s, dir) => Analytics.communityModularity(s, dir)),
    // grouped k-fold CV assignment summary (leak-free by construction)
    "cv_fold_assign" -> ((s, dir) => Analytics.cvFoldAssign(s, dir)),
    // funnel latency: first-view → first-subsequent-purchase delay
    // histogram in exact integer microseconds
    "funnel_time_to_convert" -> ((s, dir) => Analytics.funnelTimeToConvert(s, dir)),
    // outlier-immune trend: median pairwise slope over the bounded
    // (type × day) frame, quadratic only in days
    "theil_sen_daily" -> ((s, dir) => Analytics.theilSenDaily(s, dir)),
    // robust location: mean of exact cents inside the [p05, p95] band
    "trimmed_mean_by_type" -> ((s, dir) => Analytics.trimmedMeanByType(s, dir)),
    // monotone association on tie-averaged integer ranks (doubled units),
    // rho as one closed-form double tree over exact rank moments
    "spearman_daily" -> ((s, dir) => Analytics.spearmanDaily(s, dir)),
    // Mann-Kendall trend: exact concordant/discordant/tie pair counts
    // over the bounded (type × day) frame, tau-b as one double tree
    "kendall_tau_daily" -> ((s, dir) => Analytics.kendallTauDaily(s, dir)),
    // trend (centered 7-obs MA) + day-of-week seasonal of the DETRENDED
    // series + residual — every numerator an exact long
    "stl_decompose_daily" -> ((s, dir) => Analytics.stlDecomposeDaily(s, dir)),
    // landmark harmonic closeness: ONE multi-source BFS from the 3
    // smallest user ids, Σ 1000000 div d in exact micro-units
    "closeness_landmarks_users" -> ((s, dir) => Analytics.closenessLandmarksUsers(s, dir)),
    // Newman degree-mixing r over directed edges: exact DECIMAL moments,
    // one double tree (do hubs attach to hubs?)
    "graph_assortativity_users" -> ((s, dir) => Analytics.graphAssortativityUsers(s, dir)),
    // gaps-and-islands: longest consecutive-active-day run per user via
    // the day − row_number island constant — no self-join, no recursion
    "user_activity_streaks" -> ((s, dir) => Analytics.userActivityStreaks(s, dir)),
    // exact weighted median (half the QUANTITY at or below): smallest
    // price with 2·cumw ≥ totw over the bounded distinct-price table
    "weighted_median_lineitem" -> ((s, dir) => Relational.weightedMedianLineitem(s, dir)),
    // trailing-20 breakout bands over the PRIOR window (current row
    // excluded) + turtle-rule flags, exact cents
    "donchian_by_type" -> ((s, dir) => Indicators.donchianByType(s, dir)),
    // product-limit survival: the sequential multiplicative fold through
    // the cusum/ewma execution class, same life table as Nelson-Aalen
    "kaplan_meier_survival" -> ((s, dir) => StatefulQueries.kaplanMeierSurvival(s, dir)),
    // the trailing-20 ring as keyed streaming state crossing micro-batch
    // boundaries — value-bounded compound state, same oracle as batch
    "donchian_by_type_streaming" -> ((s, dir) => StatefulQueries.donchianByTypeStreaming(s, dir)),
    // the forecast baseline under the same metric definitions: same
    // weekday last week; errors exact longs, only sMAPE quantizes
    "forecast_backtest_seasonal_naive" -> ((s, dir) => Analytics.forecastBacktestSeasonalNaive(s, dir)),
    // HLL set algebra: intersection via inclusion-exclusion, gated
    // in-plan vs exact relative to the UNION size (the q10a pattern)
    "hll_intersection_users" -> ((s, dir) => Relational.hllIntersectionUsers(s, dir)),
    // three-stage ER: exact collapse -> deletion-banded fuzzy match over
    // DISTINCT names -> CC transitive closure; canonical = min name-id
    "entity_resolution_parts" -> ((s, dir) => Analytics.entityResolutionParts(s, dir)),
    // recency-weighted attribution: integer halving weights per 6h age
    // bucket (8/4/2/1), remainder to the most recent touch
    "attribution_time_decay" -> ((s, dir) => Sessionize.attributionTimeDecay(s, dir)),
    // transitivity: C = 3·triangles / wedges from the two audited
    // counting cores, exact integers, guarded ratio
    "clustering_coefficient_users" -> ((s, dir) => Analytics.clusteringCoefficientUsers(s, dir)),
    // growth curve: first-seen collapse + cumulative window over the
    // gapless day spine, exact integers
    "cumulative_users_daily" -> ((s, dir) => Analytics.cumulativeUsersDaily(s, dir)),
    // 7-day rolling view/click co-movement: exact window moments, one
    // guarded double tree per full window
    "rolling_corr_view_click" -> ((s, dir) => Analytics.rollingCorrPair(s, dir)),
    // the FIFTH stream-stream join type: padding flips to the b-side,
    // run-HEAD counts observable as data
    "q23ro_interval_join_right_outer" -> ((s, dir) => StatefulQueries.intervalJoinStreamingRightOuter(s, dir)),
    // stateful dedup FEEDING a stateful windowed count in one
    // append-mode plan — watermark-closed daily active users
    "dau_daily_closed_streaming" -> ((s, dir) => StatefulQueries.dauDailyClosedStreaming(s, dir)),
    // the third as-of direction (nearest either way, ties to prior);
    // one user exchange, both conditional extrema share it
    "q14n_asof_nearest" -> ((s, dir) => Sessionize.asofNearestSignup(s, dir)),
    // SCD2 maintenance: adjacent same-tier versions merge (gaps-and-
    // islands over intervals); compacted valid_to via lead(), no
    // NULL-poisoned max
    "scd2_compact_tiers" -> ((s, dir) => Relational.scd2CompactTiers(s, dir)),
    // pre-salting diagnostic: heaviest key + max/avg skew ratio in ppm
    "key_skew_report" -> ((s, dir) => Relational.keySkewReport(s, dir)),
    // equi-depth decile binning against broadcast exact-percentile edges
    "quantile_bins_value" -> ((s, dir) => Relational.quantileBinsValue(s, dir)),
    // audit diff between two as-of snapshots: added/removed/changed users
    "scd2_snapshot_diff" -> ((s, dir) => Relational.scd2SnapshotDiff(s, dir)),
    // SQ8 storage-shrink audit: per-dim reconstruction error as exact
    // integer pico-unit folds
    "embedding_sq8_stats" -> ((s, dir) => Similarity.sq8Stats(s, dir)),
    // hash-deterministic Poisson bootstrap: per-type median with a
    // [min,max]-of-resample-medians CI band
    "bootstrap_median_ci" -> ((s, dir) => Analytics.bootstrapMedianCi(s, dir)),
    // nonparametric arm comparison via banded tie-averaged ranks —
    // no row-level sort, exact integer rank algebra
    "mannwhitney_value_arms" -> ((s, dir) => Analytics.mannWhitneyArms(s, dir)),
    // per-user event-sequence transition matrix with row-normalized p
    "markov_transitions" -> ((s, dir) => Analytics.markovTransitions(s, dir)),
    // clickstream path mining: top-k length-3 type sequences, one user
    // exchange shared by both leads, TakeOrdered top-k
    "user_paths_top" -> ((s, dir) => Analytics.userPathsTop(s, dir)),
    // the same transitions through REAL keyed streaming state: one
    // last-event ValueState per user, sequences span the batch boundary
    "markov_transitions_streaming" -> ((s, dir) => StatefulQueries.markovTransitionsStreaming(s, dir)),
    // last-touch attribution with one last-view ValueState per user — the
    // batch window's streaming twin, view→purchase chains span batches
    "attribution_last_touch_streaming" -> ((s, dir) => StatefulQueries.attributionLastTouchStreaming(s, dir)),
    // CUSUM drift detection: non-associative reset recurrence — the
    // stateful-or-nothing class; batch = lazy ordered fold, O(1)/key
    "cusum_by_type" -> ((s, dir) => StatefulQueries.cusumByType(s, dir)),
    // the statistic (and reset boundaries) carried across micro-batches
    "cusum_by_type_streaming" -> ((s, dir) => StatefulQueries.cusumByTypeStreaming(s, dir)),
    // EWMA smoothing (binary-exact alpha=1/8): second sequential class
    "ewma_by_type" -> ((s, dir) => StatefulQueries.ewmaByType(s, dir)),
    "ewma_by_type_streaming" -> ((s, dir) => StatefulQueries.ewmaByTypeStreaming(s, dir)),
    // Holt's linear trend (alpha=1/4, beta=1/8): two COUPLED recurrences
    "holt_by_type" -> ((s, dir) => StatefulQueries.holtByType(s, dir)),
    "holt_by_type_streaming" -> ((s, dir) => StatefulQueries.holtByTypeStreaming(s, dir)),
    // rolling-origin one-step-ahead evaluation of the Holt fold: MAE +
    // sMAPE from floor-quantized error integers (order-free sums)
    "forecast_backtest_holt" -> ((s, dir) => StatefulQueries.forecastBacktestHolt(s, dir)),
    // triple smoothing: the seasonal ring buffer rides state as a
    // fixed-width array (the ListState-shaped stateful form)
    "holt_winters_by_type" -> ((s, dir) => StatefulQueries.holtWintersByType(s, dir)),
    "holt_winters_by_type_streaming" ->
      ((s, dir) => StatefulQueries.holtWintersByTypeStreaming(s, dir)),
    // running peak / max drawdown: window-expressible, so batch is the
    // declarative two-cummax form; the twin carries (peak, worst) state
    "drawdown_by_type" -> ((s, dir) => StatefulQueries.drawdownByType(s, dir)),
    "drawdown_by_type_streaming" -> ((s, dir) => StatefulQueries.drawdownByTypeStreaming(s, dir)),
    // THE ALERTING COMPOSITION: CUSUM drift over the seasonal dow
    // residuals (forecasting baseline -> sequential detector), relative
    // residuals quantized to integer micros — scale-free thresholds
    "cusum_seasonal_residuals" -> ((s, dir) => StatefulQueries.cusumSeasonalResiduals(s, dir)),
    // perplexity-filter calibration histogram over the LM-score table
    "ppl_bucket_stats" -> ((s, dir) => TextOps.pplBucketStats(s, dir)),
    // Wilder RSI (binary-exact alpha=1/16): the gain/loss split makes the
    // recurrence non-associative — stateful-or-nothing, like CUSUM
    "rsi_by_type" -> ((s, dir) => StatefulQueries.rsiByType(s, dir)),
    "rsi_by_type_streaming" -> ((s, dir) => StatefulQueries.rsiByTypeStreaming(s, dir)),
    // MACD: THREE coupled EMAs (1/4, 1/16, 1/8 — binary-exact 12/26/9)
    "macd_by_type" -> ((s, dir) => StatefulQueries.macdByType(s, dir)),
    "macd_by_type_streaming" -> ((s, dir) => StatefulQueries.macdByTypeStreaming(s, dir)),
    // OHLC candlestick bars: element selection only, zero float arithmetic
    "ohlc_hourly" -> ((s, dir) => Indicators.ohlcHourly(s, dir)),
    // the live candlestick builder: the same mergeable bar aggregate
    // accumulating across micro-batches in the state store
    "ohlc_hourly_streaming" -> ((s, dir) => Indicators.ohlcHourlyStream(s, dir)),
    // the PRODUCTION candlestick shape: watermark-closing append mode —
    // each bar emits exactly once when the watermark passes its hour end
    // and leaves the store; late ticks drop observably
    "ohlc_hourly_closed" -> ((s, dir) => Indicators.ohlcHourlyClosed(s, dir)),
    // the Flink sideOutputLateData contract: the ticks the closed-bar
    // query drops, EMITTED as a second output, routed per row by the
    // engine's own watermark (deterministic-lateness replay tape)
    "ohlc_late_sideoutput" -> ((s, dir) => Indicators.ohlcLateSideOutput(s, dir)),
    // signal generation downstream of the indicators: golden/death SMA
    // crosses, all-integer cross-multiplied comparison
    "signal_sma_cross" -> ((s, dir) => Indicators.smaCrossSignals(s, dir)),
    // weight-proportional systematic sampling: K deterministic draws by
    // integer quantile crossings over a banded exact prefix sum
    "sample_weighted_systematic" -> ((s, dir) => TextOps.sampleWeightedSystematic(s, dir)),
    // context-window chunking: overlapping token-index windows per doc —
    // all-integer spans, bounded explode, no shuffle
    "doc_chunks" -> ((s, dir) => TextOps.docChunks(s, dir)),
    // duplicate-3-gram repetition signal (the Gopher-filter family):
    // exact integer counts, cross-multiplied flag, one final divide
    "repetition_ngram_stats" -> ((s, dir) => TextOps.repetitionNgramStats(s, dir)),
    // VWAP on synthetic deterministic volume: exact decimal weighted sum
    "vwap_hourly" -> ((s, dir) => Indicators.vwapHourly(s, dir)),
    // Bollinger bands: exact integer-cents rolling moments, 20-tick frame
    "bollinger_by_type" -> ((s, dir) => Indicators.bollingerByType(s, dir)),
    // stochastic oscillator %K: frame extrema + a fixed 4-op double tree
    "stoch_osc_by_type" -> ((s, dir) => Indicators.stochOscByType(s, dir)),
    // realized variance: exact integer cents deltas, one final /1e4
    "realized_variance_daily" -> ((s, dir) => Indicators.realizedVarianceDaily(s, dir)),
    // average true range over hourly bars: integer-cents TR (Wilder),
    // trailing 14-bar mean, one final divide
    "atr_hourly_by_type" -> ((s, dir) => Indicators.atrHourlyByType(s, dir)),
    // on-balance volume: all-integer signed cumulative synthetic volume
    "obv_by_type" -> ((s, dir) => Indicators.obvByType(s, dir)),
    // the live ledger: (prev cents, obv) cross micro-batch boundaries
    "obv_by_type_streaming" -> ((s, dir) => StatefulQueries.obvByTypeStreaming(s, dir)),
    // time-travel point query over the SCD2 intervals: state of every
    // user at the data-derived midpoint cut — filter, no join
    "scd2_asof_snapshot" -> ((s, dir) => Relational.scd2AsofSnapshot(s, dir)),
    // the WRITE side: incremental MERGE maintenance of the interval table
    // through an idempotent versioned foreachBatch journal; its as-of
    // snapshot hash-matches the read-side form's oracle
    "scd2_upsert_snapshot" -> ((s, dir) => StatefulQueries.scd2UpsertSnapshot(s, dir)),
    // vocabulary drift: chi2 of token x corpus-half over dense cells of
    // the frequent vocabulary — the ingestion-generation drift monitor
    "vocab_drift_chi2" -> ((s, dir) => TextOps.vocabDriftChi2(s, dir)),
    // the THIRD stream-stream join type: left semi — emit-once existence,
    // state strictly smaller than inner's, same eviction witness
    "q23sj_interval_join_semi" -> ((s, dir) => StatefulQueries.intervalJoinStreamingSemi(s, dir)),
    // bucket-sequence autocorrelation at lags 1-3, exact integer moments
    "acf_by_type" -> ((s, dir) => Analytics.acfByType(s, dir)),
    // market-basket support/confidence/lift over co-ordered brand pairs
    "assoc_rules_brands" -> ((s, dir) => Analytics.assocRulesBrands(s, dir)),
    // Benford first-digit screen over order totals, literal probabilities
    "benford_first_digit" -> ((s, dir) => Analytics.benfordFirstDigit(s, dir)),
    // in-flight scan metrics via Dataset.observe (plan accumulators)
    "dq_observe" -> ((s, dir) => Relational.dqObserve(s, dir)),
    // deterministic bottom-k-by-hash sample via a bounded O(k) aggregator
    "sample_bottomk" -> ((s, dir) => Analytics.bottomKSample(s, dir)),
    // last-touch attribution: purchases -> most recent prior view <= 24h,
    // one conditional window max, never a purchases x views self-join
    "attribution_last_touch" -> ((s, dir) => Sessionize.attributionLastTouch(s, dir)),
    // U-shaped multi-touch: every purchase splits exactly 1e6 micro-
    // credits 40/20/40 over its lookback views; per-view rollup
    "attribution_position_ushape" -> ((s, dir) => Sessionize.attributionPositionUshape(s, dir)),
    // time-weighted average: exact decimal sum(value x holding-interval)
    "twap_by_type" -> ((s, dir) => Sessionize.twapByType(s, dir)),
    // TWAP's streaming twin: one (µs, value) ValueState per type closes
    // each holding interval; intervals span the micro-batch boundary
    "twap_by_type_streaming" -> ((s, dir) => StatefulQueries.twapByTypeStreaming(s, dir)),
    // funnel (view->click->purchase): 3 stacked conditional window minima,
    // ONE user shuffle — never a triple self-join
    "funnel_steps" -> ((s, dir) => Sessionize.funnelSteps(s, dir)),
    // cohort retention matrix: first-event week x active-week offset
    "cohort_retention" -> ((s, dir) => Sessionize.cohortRetention(s, dir)),
    // exact rolling 7-day distinct users via forward-contribution explode
    // (no range join — the oracle's BETWEEN formulation is the shape that
    // does NOT scale; hll_daily_users is the sketch path alongside)
    "dau_rolling_7d" -> ((s, dir) => Sessionize.dauRolling7d(s, dir)),
    // the sketch scale path: one HLL blob per day explodes into its 7
    // windows — shuffle is days × 7 blobs however many users a day saw;
    // sparse-mode exact at fixture cardinality → same oracle
    "dau_rolling_7d_sketch" -> ((s, dir) => FreqSketch.dauRolling7dSketch(s, dir)),
    "q13_sessionize"       -> ((s, dir) => Sessionize.sessionize(s, dir)),
    // the engine's own session_window aggregation (gap+1us = exact parity)
    "q13n_sessionize_native" -> ((s, dir) => Sessionize.sessionizeNative(s, dir)),
    // the same declarative aggregation through the micro-batch engine:
    // watermark-driven append emission over the split+sentinel replay
    "q13ns_sessionize_native_streaming" -> ((s, dir) => Sessionize.sessionizeNativeStreaming(s, dir)),
    // session windows through the real engine: event-time timeout closes
    // sessions when the watermark passes end+gap, flushed by a sentinel batch
    "q13s_sessionize_streaming" -> ((s, dir) => Sessionize.sessionizeStreaming(s, dir)),
    // the disorder-safe twin: buffer-until-watermark sessionization over a
    // deliberately disordered replay, same batch oracle
    "q13o_sessionize_ooo_streaming" -> ((s, dir) => Sessionize.sessionizeOooStreaming(s, dir)),
    "q14_asof_prior_signup" -> ((s, dir) => Sessionize.asofPriorSignup(s, dir)),
    // merge_asof-tolerance semantics: a prior match older than 7 days is
    // treated as absent (feature-store max-staleness), staleness emitted
    "q14t_asof_tolerance" -> ((s, dir) => Sessionize.asofPriorSignupTolerance(s, dir)),
    "q15_brand_set_ops"    -> ((s, dir) => Relational.brandSetOps(s, dir)),
    "q16_anti_join"    -> ((s, dir) => Relational.neverOrderedParts(s, dir)),
    "q17_cube"         -> ((s, dir) => Relational.lineitemCube(s, dir)),
    // explicit irregular grouping-set lattice + grouping_id disambiguator
    "q17g_grouping_sets" -> ((s, dir) => Relational.explicitGroupingSets(s, dir)),
    // fixed-bin histogram via the native width_bucket expression
    "q32_value_histogram" -> ((s, dir) => Relational.valueHistogram(s, dir)),
    // schema evolution: generations unioned BY NAME, missing col null-fills
    "union_schema_evolution" -> ((s, dir) => Relational.unionSchemaEvolution(s, dir)),
    // TPC-H Q15 shape: scalar-subquery-over-view decorrelation, exact-
    // decimal max equality, ties surface
    "q37_top_supplier" -> ((s, dir) => Relational.topSupplier(s, dir)),
    // TPC-H Q11 shape: HAVING vs broadcast global scalar, cross-multiplied
    "q38_important_brands" -> ((s, dir) => Relational.importantBrands(s, dir)),
    // TPC-H Q18 shape: IN (SELECT key FROM agg HAVING ...) — prune at the
    // aggregate before any dimension join
    "q39_large_volume_orders" -> ((s, dir) => Relational.largeVolumeOrders(s, dir)),
    // correlated EXISTS + NOT EXISTS pair -> key-level semi/anti joins
    "q40_exists_not_exists" -> ((s, dir) => Relational.existsNotExists(s, dir)),
    // exact sort-based percentiles — the exact twin of q10b's sketch
    "q33_percentile_exact" -> ((s, dir) => Relational.percentileExact(s, dir)),
    // edit-distance-1 similarity join via deletion-neighborhood banding
    "fuzzy_join_editdist1" -> ((s, dir) => Analytics.fuzzyJoinEditDist1(s, dir)),
    "fuzzy_bucket_stats" -> ((s, dir) => Analytics.fuzzyBucketStats(s, dir)),
    "fuzzy_bucket_stats_parts" -> ((s, dir) => Analytics.fuzzyBucketStatsParts(s, dir)),
    // fixed-point (integer-ppb) PageRank over the nation trade graph
    "pagerank_nations" -> ((s, dir) => Analytics.pagerankNations(s, dir)),
    // RFM quartile segmentation over the per-user aggregate
    "rfm_segments" -> ((s, dir) => Analytics.rfmSegments(s, dir)),
    // degree-ordered-orientation triangle count on the trade graph
    "triangle_count" -> ((s, dir) => Analytics.triangleCount(s, dir)),
    // BFS shortest hops from nation 0 (min-plus relaxation, 4 rounds)
    "bfs_hops" -> ((s, dir) => Analytics.bfsHops(s, dir)),
    // the graph family at falsifying cardinality (1.5k nodes / 110k edges
    // at sf0.1): triangles + PageRank over the user co-occurrence graph
    "triangle_count_users" -> ((s, dir) => Analytics.triangleCountUsers(s, dir)),
    "pagerank_users" -> ((s, dir) => Analytics.pagerankUsers(s, dir)),
    // the orientation bound, measured: naive vs oriented wedge counts as
    // closed forms over the degree tables
    "graph_wedge_stats" -> ((s, dir) => Analytics.wedgeStatsUsers(s, dir)),
    // BFS from the smallest user over the co-occurrence graph, 6 rounds
    "bfs_hops_users" -> ((s, dir) => Analytics.bfsHopsUsers(s, dir)),
    // connected components on the same graph — the dedup CC core's second
    // falsifiable witness; isolated users surface as singleton components
    "cc_users" -> ((s, dir) => Analytics.ccUsers(s, dir)),
    // RFM via broadcast approx-quantile cutpoints — ntile's scale path
    "rfm_segments_approx" -> ((s, dir) => Analytics.rfmSegmentsApprox(s, dir)),
    "q18_json_props"   -> ((s, dir) => Relational.jsonPropsAgg(s, dir)),
    "q19_analytic_suite" -> ((s, dir) => Relational.analyticSuite(s, dir)),
    // distribution functions + first_value + a VALUE-RANGE (5 min) frame
    "q19b_window_suite" -> ((s, dir) => Relational.windowSuite(s, dir)),
    "q20_salted_revenue" -> ((s, dir) => Skew.saltedRevenue(s, dir)),
    "q21_topk_aggregator" -> ((s, dir) => TopK.topPartsByBrandAgg(s, dir)),
    "q22_above_avg_orders" -> ((s, dir) => Relational.aboveAvgOrders(s, dir)),
    // one-pass Deequ-shape constraint report; failures are DATA, not logs
    "dq_report" -> ((s, dir) => Relational.dqReport(s, dir)),
    // CDC change log -> SCD2 validity intervals (lead over user history)
    "scd2_user_values" -> ((s, dir) => Relational.scd2UserValues(s, dir)),
    "q23_interval_join"    -> ((s, dir) => Sessionize.intervalPairCounts(s, dir)),
    // non-equi banding join: irregular [lo,hi) price bands ride a
    // broadcast nested loop — the rate-card/bracket dimension-lookup class
    "q34_band_join"        -> ((s, dir) => Relational.bandJoin(s, dir)),
    // TPC-H Q13 shape: order counts pre-aggregate BEFORE the outer join;
    // zero-order customers surface via coalesce
    "q35_custdist"         -> ((s, dir) => Relational.custDist(s, dir)),
    // fulfillment SLA: p50/p95/mean order-to-ship days per priority over
    // the fact-to-fact orderkey join; day-number differences keep
    // negative latencies cross-engine exact
    "q36_ship_latency"     -> ((s, dir) => Relational.shipLatency(s, dir)),
    // Pareto/ABC revenue concentration: exact decimal running shares with
    // cross-multiplied class boundaries over the part-dimension aggregate
    "pareto_parts_abc"     -> ((s, dir) => Relational.paretoPartsAbc(s, dir)),
    // the scale path: revenue-banded two-level prefix sum — no
    // single-partition window over the part table; same oracle (decimal
    // addition is exact, so the split cumulative is bit-identical)
    "pareto_parts_abc_scalable" -> ((s, dir) => Relational.paretoPartsAbcScalable(s, dir)),
    // daily conversion with Wilson bounds (z=2): uncertainty-aware metric,
    // bit-exact fixed double expression tree over exact longs
    "conversion_rate_wilson" -> ((s, dir) => Analytics.conversionRateWilson(s, dir)),
    // q23 as a watermarked STREAM-STREAM join through the micro-batch engine
    "q23ss_interval_join_streaming" -> ((s, dir) => StatefulQueries.intervalJoinStreaming(s, dir)),
    // its LEFT OUTER twin: zero-pair users null-padded at state eviction
    "q23lo_interval_join_outer"     -> ((s, dir) => StatefulQueries.intervalJoinStreamingOuter(s, dir)),
    // the FULL OUTER twin: null-padding from BOTH state stores; padding
    // counts obey the runs identity (tails = heads), spec-pinned
    "q23fo_interval_join_full_outer" -> ((s, dir) => StatefulQueries.intervalJoinStreamingFullOuter(s, dir)),
    // CEP followed-by: first following purchase within 1h, no error
    // between — one window pass, no self-join (Flink-CEP's query class)
    "cep_funnel_followedby" -> ((s, dir) => Sessionize.cepFunnelFollowedBy(s, dir)),
    // the same pattern over REAL keyed pending-view NFA state; matches
    // span the micro-batch boundary
    "cep_funnel_followedby_streaming" -> ((s, dir) => StatefulQueries.cepFunnelFollowedByStreaming(s, dir)),
    // the NEGATIVE pattern (notFollowedBy...within): views with NO
    // purchase inside the horizon — the absence-alert class
    "cep_absence_alert" -> ((s, dir) => Sessionize.cepAbsenceAlert(s, dir)),
    // absence through REAL event-time timers: tape-end verdicts fire off
    // the watermark, not off data
    "cep_absence_alert_streaming" -> ((s, dir) => StatefulQueries.cepAbsenceAlertStreaming(s, dir)),
    // CEP strict contiguity A.next(B).within(W): the IMMEDIATELY
    // following event must be the purchase — an intervening click breaks
    // the match where followed-by skips it
    "cep_next_match" -> ((s, dir) => Sessionize.cepNextMatch(s, dir)),
    // the adjacency held in keyed state (one previous event per user),
    // crossing the micro-batch boundary over the full-event replay
    "cep_next_match_streaming" -> ((s, dir) => StatefulQueries.cepNextMatchStreaming(s, dir)),
    // CEP times quantifier A.times(3).within(10min) followedBy purchase:
    // row-sequential burst completion (lag over views), one window pass
    "cep_times_burst" -> ((s, dir) => Sessionize.cepTimesBurst(s, dir)),
    // the quantifier over REAL NFA state: the (n−1)-view ring and open
    // bursts cross the micro-batch boundary
    "cep_times_burst_streaming" -> ((s, dir) => StatefulQueries.cepTimesBurstStreaming(s, dir)),
    // change-data-feed read over the SCD2 MERGE journal: per-version
    // insert/close deltas via an honest snapshot diff
    "scd2_cdc_feed" -> ((s, dir) => StatefulQueries.scd2CdcFeed(s, dir)),
    // BITEMPORAL: the values BELIEVED (journal v0, transaction time)
    // valid AT the cut (valid time) — training-run reproducibility
    "scd2_bitemporal_snapshot" -> ((s, dir) => StatefulQueries.scd2BitemporalSnapshot(s, dir)),
    // Flink-SQL temporal table join: streaming purchases against the
    // SCD2 version valid AT EACH ROW'S OWN event time
    "temporal_join_streaming" -> ((s, dir) => StatefulQueries.temporalJoinStreaming(s, dir)),
    // the LIVE-dimension temporal join: each probe batch re-reads the
    // SCD2 MERGE journal, so a mid-stream upsert flips later matches
    "temporal_join_updating_dim" -> ((s, dir) => StatefulQueries.temporalJoinUpdatingDim(s, dir)),
    // Flink broadcast-state pattern: per-type flag rules RELOADED
    // mid-stream — each batch applies the version in force when it runs
    "dynamic_rules_streaming" -> ((s, dir) => StatefulQueries.dynamicRulesStreaming(s, dir)),
    // 2-D Pareto frontier via banded strictly-before running max — no
    // all-pairs dominance join
    "skyline_price_size" -> ((s, dir) => Relational.skyline2d(s, dir)),
    // ---- training-data pipeline: multimodal columns (stub codecs) ----
    "mm_media_meta"     -> ((s, dir) => Multimodal.mediaMeta(s, dir)),
    "mm_media_features" -> ((s, dir) => Multimodal.mediaFeatures(s, dir)),
    "mm_video_frames"   -> ((s, dir) => Multimodal.videoFrames(s, dir)),
    "mm_resize"         -> ((s, dir) => Multimodal.mediaResized(s, dir)),
    // every-2nd-frame sampling at original indices; unsampled frames are
    // never PNG-decoded
    "mm_video_frames_strided" -> ((s, dir) => Multimodal.videoFramesStrided(s, dir)),
    // PCM resample 8000→6000 Hz by nearest-floor rational index mapping
    "mm_audio_resample" -> ((s, dir) => Multimodal.audioResampled(s, dir)),
    // windowed frame energy (Σv, Σv², peak per 32-sample frame) — the
    // VAD/silence-trim stand-in, integer-exact so the oracle hashes it
    "mm_audio_energy" -> ((s, dir) => Multimodal.audioEnergy(s, dir)),
    // shot-boundary detection: exact integer SAD per adjacent frame pair,
    // cut-flagged against a per-pixel threshold
    "mm_video_scene_change" -> ((s, dir) => Multimodal.videoSceneChanges(s, dir)),
    // VAD decision stage: lead/tail silence trim spans from the windowed
    // energy features — one conditional-extrema aggregate per clip
    "mm_audio_trim" -> ((s, dir) => Multimodal.audioTrimSpans(s, dir)),
  )

  private val decPrice = "CAST(l_extendedprice AS DECIMAL(18,4))"
  private val decDisc  = "CAST(l_discount AS DECIMAL(18,4))"
  private val one      = "CAST(1 AS DECIMAL(18,4))"

  /** DECIMAL → DOUBLE through a VARCHAR round-trip. DuckDB's direct decimal
    * cast computes int_value × 10^-scale in double arithmetic (two roundings
    * — off by an ulp on wide sums), while its string parse is correctly
    * rounded, exactly like Spark's Decimal.toDouble (BigDecimal.doubleValue).
    * Every decimal-sum cast in the oracle goes through this so parity is
    * guaranteed, not digit-count-dependent (first diverged at sf0.1 on the
    * scale-8 revenue sums). */
  private def dd(sumExpr: String): String =
    s"CAST(CAST($sumExpr AS VARCHAR) AS DOUBLE)"

  /** The bfs_hops_users oracle, GENERATED: the same unrolled min-plus
    * relaxation CTE pair as the handwritten bfs_hops oracle, once per
    * round, over the minute-bucket user co-occurrence graph from the
    * smallest user id. Generation is what keeps a 6-round unroll honest —
    * each round's SQL is mechanically identical, so a transcription slip
    * cannot hide in round 5. */
  private def bfsUsersOracle(rounds: Int): String = {
    val head =
      """WITH b AS MATERIALIZED (SELECT DISTINCT user_id AS uid,
        |    epoch_us(ts) // 60000000 AS w FROM events),
        |ce AS MATERIALIZED (SELECT DISTINCT l.uid AS u, r.uid AS v
        |  FROM b l JOIN b r USING (w) WHERE l.uid < r.uid),
        |e AS MATERIALIZED (SELECT u AS x, v AS y FROM ce
        |  UNION ALL SELECT v, u FROM ce),
        |nd AS MATERIALIZED (SELECT DISTINCT user_id AS node FROM events),
        |d0 AS MATERIALIZED (SELECT node,
        |  CASE WHEN node = (SELECT min(node) FROM nd) THEN 0 END AS h
        |  FROM nd)""".stripMargin
    val steps = (1 to rounds).map { i =>
      val p = i - 1
      s"""c$i AS MATERIALIZED (SELECT e.y AS node, min(d$p.h + 1) AS nh FROM e
         |       JOIN d$p ON e.x = d$p.node WHERE d$p.h IS NOT NULL GROUP BY 1),
         |d$i AS MATERIALIZED (SELECT nd.node, CASE WHEN d$p.h IS NULL THEN c$i.nh
         |         WHEN c$i.nh IS NULL THEN d$p.h
         |         WHEN c$i.nh < d$p.h THEN c$i.nh ELSE d$p.h END AS h
         |       FROM nd JOIN d$p USING (node) LEFT JOIN c$i USING (node))""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$steps
       |SELECT node AS user_id, CAST(coalesce(h, -1) AS BIGINT) AS hops
       |FROM d$rounds ORDER BY user_id""".stripMargin
  }

  /** The closeness_landmarks_users oracle: [[bfsUsersOracle]]'s unrolled
    * min-plus relaxations with the distance table keyed on (node, lm) —
    * the L landmarks relax simultaneously, exactly the multi-source
    * engine form; the finisher folds the exact integer-micro harmonic
    * sum per node. d0 already covers every (node, lm) cell, so each
    * round is one LEFT JOIN of the previous table against the round's
    * candidate minima. */
  private def closenessUsersOracle(landmarks: Int, rounds: Int): String = {
    val head =
      s"""WITH b AS MATERIALIZED (SELECT DISTINCT user_id AS uid,
        |    epoch_us(ts) // 60000000 AS w FROM events),
        |ce AS MATERIALIZED (SELECT DISTINCT l.uid AS u, r.uid AS v
        |  FROM b l JOIN b r USING (w) WHERE l.uid < r.uid),
        |e AS MATERIALIZED (SELECT u AS x, v AS y FROM ce
        |  UNION ALL SELECT v, u FROM ce),
        |nd AS MATERIALIZED (SELECT DISTINCT user_id AS node FROM events
        |  WHERE user_id IS NOT NULL),
        |lms AS MATERIALIZED (SELECT node AS lm FROM nd
        |  ORDER BY node LIMIT $landmarks),
        |d0 AS MATERIALIZED (SELECT node, lm,
        |  CASE WHEN node = lm THEN 0 END AS h FROM nd CROSS JOIN lms)""".stripMargin
    val steps = (1 to rounds).map { i =>
      val p = i - 1
      s"""c$i AS MATERIALIZED (SELECT e.y AS node, d$p.lm, min(d$p.h + 1) AS nh
         |       FROM e JOIN d$p ON e.x = d$p.node
         |       WHERE d$p.h IS NOT NULL GROUP BY 1, 2),
         |d$i AS MATERIALIZED (SELECT d$p.node, d$p.lm,
         |         CASE WHEN d$p.h IS NULL THEN c$i.nh
         |         WHEN c$i.nh IS NULL THEN d$p.h
         |         WHEN c$i.nh < d$p.h THEN c$i.nh ELSE d$p.h END AS h
         |       FROM d$p LEFT JOIN c$i USING (node, lm))""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$steps
       |SELECT node AS user_id, CAST(count(h) AS BIGINT) AS n_reached,
       |  CAST(sum(CASE WHEN h >= 1 THEN 1000000 // h ELSE 0 END) AS BIGINT)
       |    AS harmonic_micro,
       |  CAST(sum(CASE WHEN h >= 1 THEN 1000000 // h ELSE 0 END) AS DOUBLE)
       |    / 1000000.0 AS closeness
       |FROM d$rounds GROUP BY node ORDER BY user_id""".stripMargin
  }

  /** The entity_resolution_parts oracle: exact name collapse, the SAME
    * deletion-signature banding the engine runs (range is end-exclusive
    * like the engine's sequence(0, len−1)), and `rounds` unrolled plain
    * min-label propagation rounds over the banded match graph. The
    * engine converges fully (pointer jumping); only the oracle carries
    * the horizon — 8 rounds, the cc_users convention (fixpoint ≤ 2
    * probed at every shipped SF, so 8 is 4× headroom against longer
    * similarity chains in a denser name space; r16 review raised it
    * from 4). */
  private def erPartsOracle(rounds: Int): String = {
    val head =
      """WITH names AS MATERIALIZED (SELECT p_name AS nm,
        |    CAST(min(p_partkey) AS BIGINT) AS nid FROM part GROUP BY 1),
        |sigs AS MATERIALIZED (SELECT nid, nm, unnest(list_append(
        |    list_transform(range(0, length(nm)),
        |      i -> substr(nm, 1, i) || substr(nm, i + 2)), nm)) AS sig
        |  FROM names),
        |e AS MATERIALIZED (SELECT DISTINCT a.nid AS u, b.nid AS v
        |  FROM sigs a JOIN sigs b USING (sig)
        |  WHERE a.nid < b.nid AND levenshtein(a.nm, b.nm) <= 1),
        |ed AS MATERIALIZED (SELECT u AS a, v AS b FROM e
        |  UNION ALL SELECT v, u FROM e),
        |l0 AS MATERIALIZED (SELECT nid AS node, nid AS lab FROM names)""".stripMargin
    val steps = (1 to rounds).map { i =>
      val p = i - 1
      s"""l$i AS MATERIALIZED (SELECT l.node,
         |    CASE WHEN m.ml IS NULL OR l.lab <= m.ml THEN l.lab ELSE m.ml END
         |      AS lab
         |  FROM l$p l LEFT JOIN (SELECT ed.a AS node, min(x.lab) AS ml
         |    FROM ed JOIN l$p x ON x.node = ed.b GROUP BY 1) m USING (node))"""
        .stripMargin
    }.mkString(",\n")
    s"""$head,
       |$steps,
       |ent AS (SELECT n.nm, l$rounds.lab AS entity
       |  FROM names n JOIN l$rounds ON l$rounds.node = n.nid),
       |sz AS (SELECT ent.entity, CAST(count(*) AS BIGINT) AS entity_size
       |  FROM part p JOIN ent ON ent.nm = p.p_name GROUP BY 1)
       |SELECT p.p_partkey, p.p_name, ent.entity, sz.entity_size
       |FROM part p JOIN ent ON ent.nm = p.p_name JOIN sz USING (entity)
       |ORDER BY p_partkey""".stripMargin
  }

  /** The community_modularity oracle: the LPA (4 majority rounds) and CC
    * (8 min-label rounds) label tables unrolled over the SAME shared head
    * CTEs, each scored by the identical exact-integer modularity fold
    * Q = Σ_c (4m·e_c − d_c²) / 4m² — HUGEINT numerator crossed to double
    * through the canonical string round-trip (the gini recipe). Labels
    * only matter joined to edge endpoints, so one NULL-filtered node
    * table serves both labelings. */
  private def communityModularityOracle: String = {
    val head =
      """WITH b AS MATERIALIZED (SELECT DISTINCT user_id AS uid,
        |    epoch_us(ts) // 60000000 AS w FROM events),
        |ce AS MATERIALIZED (SELECT DISTINCT l.uid AS u, r.uid AS v
        |  FROM b l JOIN b r USING (w) WHERE l.uid < r.uid),
        |e AS MATERIALIZED (SELECT u AS src, v AS dst FROM ce
        |  UNION ALL SELECT v, u FROM ce),
        |nd AS MATERIALIZED (SELECT DISTINCT user_id AS node FROM events
        |  WHERE user_id IS NOT NULL),
        |deg AS MATERIALIZED (SELECT src AS n, CAST(count(*) AS BIGINT) AS d
        |  FROM e GROUP BY 1),
        |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ce),
        |p0 AS MATERIALIZED (SELECT node, node AS lab FROM nd),
        |c0 AS MATERIALIZED (SELECT node, node AS lab FROM nd)""".stripMargin
    val lpaSteps = (1 to 4).map { i =>
      val p = i - 1
      s"""pv$i AS MATERIALIZED (SELECT e.src AS node, p$p.lab AS lab,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM e JOIN p$p ON e.dst = p$p.node GROUP BY 1, 2),
         |pm$i AS MATERIALIZED (SELECT node, lab FROM (
         |    SELECT node, lab, row_number() OVER (PARTITION BY node
         |      ORDER BY c DESC, lab ASC) AS rn FROM pv$i) WHERE rn = 1),
         |p$i AS MATERIALIZED (SELECT nd.node,
         |    coalesce(pm$i.lab, p$p.lab) AS lab
         |  FROM nd JOIN p$p USING (node) LEFT JOIN pm$i USING (node))"""
        .stripMargin
    }.mkString(",\n")
    val ccSteps = (1 to 8).map { i =>
      val p = i - 1
      s"""cm$i AS MATERIALIZED (SELECT e.dst AS node, min(c$p.lab) AS ml
         |  FROM e JOIN c$p ON e.src = c$p.node GROUP BY 1),
         |c$i AS MATERIALIZED (SELECT c$p.node,
         |    CASE WHEN cm$i.ml IS NOT NULL AND cm$i.ml < c$p.lab
         |         THEN cm$i.ml ELSE c$p.lab END AS lab
         |  FROM c$p LEFT JOIN cm$i USING (node))""".stripMargin
    }.mkString(",\n")
    def qOf(tbl: String, nm: String): String =
      s"""${nm}ec AS (SELECT a.lab AS lab, CAST(count(*) AS BIGINT) AS ec
         |  FROM ce JOIN $tbl a ON ce.u = a.node
         |          JOIN $tbl b2 ON ce.v = b2.node
         |  WHERE a.lab = b2.lab GROUP BY 1),
         |${nm}q AS (SELECT CAST(count(*) AS BIGINT) AS n_communities,
         |    sum(CAST(4 AS HUGEINT) * CAST((SELECT m FROM mm) AS HUGEINT)
         |          * CAST(coalesce(ec, 0) AS HUGEINT)
         |        - CAST(dc AS HUGEINT) * CAST(dc AS HUGEINT)) AS num
         |  FROM (SELECT $tbl.lab AS lab, CAST(sum(deg.d) AS BIGINT) AS dc
         |        FROM deg JOIN $tbl ON deg.n = $tbl.node GROUP BY 1) dcs
         |  LEFT JOIN ${nm}ec USING (lab))""".stripMargin
    val den =
      """CAST(CAST(CAST(4 AS HUGEINT)
        |    * CAST((SELECT m FROM mm) AS HUGEINT)
        |    * CAST((SELECT m FROM mm) AS HUGEINT) AS VARCHAR) AS DOUBLE)"""
        .stripMargin
    s"""$head,
       |$lpaSteps,
       |$ccSteps,
       |${qOf("c8", "cc")},
       |${qOf("p4", "lp")}
       |SELECT 'cc' AS method, n_communities,
       |  (SELECT m FROM mm) AS n_edges,
       |  CAST(CAST(num AS VARCHAR) AS DOUBLE) / $den AS modularity
       |FROM ccq
       |UNION ALL
       |SELECT 'lpa', n_communities, (SELECT m FROM mm),
       |  CAST(CAST(num AS VARCHAR) AS DOUBLE) / $den
       |FROM lpq
       |ORDER BY method""".stripMargin
  }

  /** The cc_users oracle, GENERATED like [[bfsUsersOracle]]: `rounds`
    * mechanically-identical unrolled rounds of PLAIN min-label propagation
    * (lab₀ = id; labᵢ(v) = min(labᵢ₋₁(v), min over neighbors u of
    * labᵢ₋₁(u))) over the symmetrized user co-occurrence edges. Converges
    * to the Spark side's pointer-jumping fixpoint whenever every node is
    * within `rounds` hops of its component's minimum — 8 holds at both
    * shipped SFs (the BFS witness reaches everything reachable in 6). */
  private def ccUsersOracle(rounds: Int): String = {
    val head =
      """WITH b AS MATERIALIZED (SELECT DISTINCT user_id AS uid,
        |    epoch_us(ts) // 60000000 AS w FROM events),
        |ce AS MATERIALIZED (SELECT DISTINCT l.uid AS u, r.uid AS v
        |  FROM b l JOIN b r USING (w) WHERE l.uid < r.uid),
        |e AS MATERIALIZED (SELECT u AS x, v AS y FROM ce
        |  UNION ALL SELECT v, u FROM ce),
        |nd AS MATERIALIZED (SELECT DISTINCT user_id AS node FROM events),
        |l0 AS MATERIALIZED (SELECT node, node AS lab FROM nd)""".stripMargin
    val steps = (1 to rounds).map { i =>
      val p = i - 1
      s"""m$i AS MATERIALIZED (SELECT e.y AS node, min(l$p.lab) AS ml FROM e
         |       JOIN l$p ON e.x = l$p.node GROUP BY 1),
         |l$i AS MATERIALIZED (SELECT l$p.node,
         |         CASE WHEN m$i.ml IS NOT NULL AND m$i.ml < l$p.lab
         |              THEN m$i.ml ELSE l$p.lab END AS lab
         |       FROM l$p LEFT JOIN m$i USING (node))""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$steps
       |SELECT node AS user_id, lab AS component
       |FROM l$rounds ORDER BY user_id""".stripMargin
  }

  /** Shared CTE chain of the temperature-mix oracles (report + composed
    * sample): per-lang token sums, the ordered √-sum fold denominator, and
    * the boost/rate normalization — held once so the two cannot drift. */
  private val tempMixCtes: String =
    """t AS (SELECT lang, coalesce(len(string_split(text,' ')), 0) AS nt FROM documents),
      |s AS MATERIALIZED (SELECT lang, CAST(sum(nt) AS BIGINT) AS n_tokens FROM t GROUP BY lang),
      |tot AS (SELECT sum(n_tokens) AS n FROM s),
      |den AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |          list(sqrt(CAST(n_tokens AS DOUBLE)) ORDER BY lang)),
      |          (a, b) -> a + b) AS d FROM s),
      |base AS (SELECT lang, n_tokens,
      |    CAST(n_tokens AS DOUBLE) / CAST((SELECT n FROM tot) AS DOUBLE) AS share,
      |    CASE WHEN n_tokens > 0
      |         THEN sqrt(CAST(n_tokens AS DOUBLE)) / (SELECT d FROM den)
      |         ELSE 0.0 END AS temp_weight
      |  FROM s),
      |bb AS (SELECT lang, n_tokens, share, temp_weight,
      |         CASE WHEN n_tokens > 0 THEN temp_weight / share
      |              ELSE 0.0 END AS boost FROM base),
      |rr AS (SELECT lang, n_tokens, share, temp_weight, boost,
      |         CASE WHEN n_tokens > 0 THEN boost / (max(boost) OVER ())
      |              ELSE 0.0 END AS rate FROM bb)""".stripMargin

  private val revenueExpr =
    dd(s"sum($decPrice * ($one - $decDisc))")

  def oracleSql: Map[String, String] = {
    val base = Map(
    "q1_running_max" ->
      """SELECT event_id, CAST(year(ts) AS BIGINT) AS yr,
        | max(value) OVER (PARTITION BY year(ts) ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max
        |FROM events ORDER BY event_id""".stripMargin,
    "q2_block_avg" ->
      s"""WITH t AS (
        | SELECT event_type, value,
        |   row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn,
        |   count(*) OVER (PARTITION BY event_type) AS n
        | FROM events)
        |SELECT event_type, CAST(floor((rn-1)/51.0) AS BIGINT) AS block,
        |  ${dd("sum(CAST(value AS DECIMAL(18,2)))")}/50 AS avg_value
        |FROM t
        |WHERE (rn-1)%51 < 50 AND floor((rn-1)/51.0) < floor(n/51.0)
        |GROUP BY event_type, CAST(floor((rn-1)/51.0) AS BIGINT)
        |ORDER BY event_type, block""".stripMargin,
    "q3_running_max_month" ->
      """SELECT event_id, CAST(year(ts) AS BIGINT) AS yr, CAST(month(ts) AS BIGINT) AS mon,
        | max(value) OVER (PARTITION BY year(ts), month(ts) ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max
        |FROM events ORDER BY event_id""".stripMargin,
    "q4_threshold_gaps" ->
      """WITH t AS (
        | SELECT event_id, event_type, value, ts,
        |  sum(CASE WHEN value < 100.0 THEN 1 ELSE 0 END) OVER (
        |    PARTITION BY event_type ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        | FROM events),
        |b AS (SELECT event_id, event_type, ts, c FROM t WHERE value >= 100.0)
        |SELECT event_id, event_type,
        |  CAST(c - coalesce(lag(c) OVER (PARTITION BY event_type ORDER BY ts, event_id), 0) AS BIGINT) AS gap
        |FROM b ORDER BY event_id""".stripMargin,
    "q5_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         | ${dd("sum(CAST(l_quantity AS DECIMAL(18,4)))")} AS sum_qty,
         | ${dd(s"sum($decPrice)")} AS sum_base_price,
         | $revenueExpr AS sum_disc_price,
         | ${dd("sum(CAST(l_quantity AS DECIMAL(18,4)))")}/count(*) AS avg_qty,
         | ${dd(s"sum($decPrice)")}/count(*) AS avg_price,
         | ${dd(s"sum($decDisc)")}/count(*) AS avg_disc,
         | count(*) AS count_order
         |FROM lineitem
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q6_revenue_by_nation" ->
      s"""SELECT n_name, $revenueExpr AS revenue, count(*) AS n_lineitems
         |FROM lineitem
         | JOIN orders ON l_orderkey = o_orderkey
         | JOIN customer ON o_custkey = c_custkey
         | JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q7_top_parts" ->
      s"""WITH rev AS (
         | SELECT l_partkey, $revenueExpr AS revenue
         | FROM lineitem GROUP BY l_partkey),
         |rk AS (
         | SELECT p_brand, p_partkey, revenue,
         |  row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey ASC) AS rk
         | FROM rev JOIN part ON l_partkey = p_partkey)
         |SELECT p_brand, rk, p_partkey, revenue
         |FROM rk WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin,
    "q8_filtered_revenue" ->
      s"""SELECT ${dd(s"sum($decPrice * $decDisc)")} AS revenue, count(*) AS n_rows
         |FROM lineitem
         |WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q9_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q10_distinct_counts" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q10a_approx_distinct" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS n_parts,
        | TRUE AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q10b_approx_quantiles" ->
      """WITH t AS (
        | SELECT l_returnflag, l_extendedprice,
        |  row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
        |  count(*) OVER (PARTITION BY l_returnflag) AS n
        | FROM lineitem)
        |SELECT l_returnflag,
        | max(CASE WHEN rn = CAST(ceil(0.5*n) AS BIGINT) THEN l_extendedprice END) AS p50_disc,
        | max(CASE WHEN rn = CAST(ceil(0.95*n) AS BIGINT) THEN l_extendedprice END) AS p95_disc,
        | TRUE AS approx_ok
        |FROM t GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q24_pivot" ->
      s"""SELECT l_returnflag,
         | ${dd(s"sum($decPrice * ($one - $decDisc)) FILTER (WHERE l_linestatus = 'F')")} AS rev_f,
         | ${dd(s"sum($decPrice * ($one - $decDisc)) FILTER (WHERE l_linestatus = 'O')")} AS rev_o
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q25_unpivot" ->
      """SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
        |ORDER BY p_partkey, metric""".stripMargin,
    "q11_orders_rollup" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, o_orderstatus,
        | ${dd("sum(CAST(o_totalprice AS DECIMAL(18,4)))")} AS total_price,
        | count(*) AS n_orders
        |FROM orders
        |GROUP BY ROLLUP(CAST(year(o_orderdate) AS BIGINT), o_orderstatus)
        |ORDER BY o_year ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin,
    "text_stats" ->
      """WITH t AS (
        | SELECT doc_id,
        |  len(string_split(text,' ')) AS n_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens,
        |  length(text) AS n_chars,
        |  len(list_filter(string_split(text,' '), x -> x='the' OR x='a')) AS n_stop
        | FROM documents)
        |SELECT doc_id, n_tokens, n_bpe_tokens, n_chars, n_stop,
        | CAST(n_chars - (n_tokens-1) AS DOUBLE)/n_tokens AS avg_token_len,
        | CAST(n_stop AS DOUBLE)/n_tokens AS stop_ratio,
        | CAST(least(n_tokens,100) AS DOUBLE)/100.0*(1.0 - CAST(n_stop AS DOUBLE)/n_tokens) AS quality_score
        |FROM t ORDER BY doc_id""".stripMargin,
    "lang_id" ->
      """WITH t AS (
        | SELECT doc_id,
        |  len(list_filter(string_split(text,' '), x -> x='the' OR x='a')) AS score_en,
        |  len(list_filter(string_split(text,' '), x -> x='der' OR x='die' OR x='und')) AS score_de,
        |  len(list_filter(string_split(text,' '), x -> x='le' OR x='la' OR x='et')) AS score_fr,
        |  len(list_filter(string_split(text,' '), x -> x='el' OR x='los' OR x='y')) AS score_es
        | FROM documents)
        |SELECT doc_id, score_en, score_de, score_fr, score_es,
        | CASE WHEN greatest(score_en, score_de, score_fr, score_es) = 0 THEN 'und'
        |  WHEN score_en = greatest(score_en, score_de, score_fr, score_es) THEN 'en'
        |  WHEN score_de = greatest(score_en, score_de, score_fr, score_es) THEN 'de'
        |  WHEN score_fr = greatest(score_en, score_de, score_fr, score_es) THEN 'fr'
        |  ELSE 'es' END AS lang_guess
        |FROM t ORDER BY doc_id""".stripMargin,
    "lang_mixed_flag" ->
      """WITH t AS (
        | SELECT doc_id,
        |  len(list_filter(string_split(text,' '), x -> x='the' OR x='a')) AS score_en,
        |  len(list_filter(string_split(text,' '), x -> x='der' OR x='die' OR x='und')) AS score_de,
        |  len(list_filter(string_split(text,' '), x -> x='le' OR x='la' OR x='et')) AS score_fr,
        |  len(list_filter(string_split(text,' '), x -> x='el' OR x='los' OR x='y')) AS score_es
        | FROM documents),
        |s AS (SELECT doc_id,
        |  list_sort([score_en, score_de, score_fr, score_es], 'DESC') AS ss FROM t)
        |SELECT doc_id, ss[1] AS top1, ss[2] AS top2,
        | CAST(ss[2] * 2 >= ss[1] AND ss[2] > 0 AS BIGINT) AS is_mixed
        |FROM s ORDER BY doc_id""".stripMargin,
    "doc_length_stats" ->
      """WITH t AS (SELECT source, len(string_split(text,' ')) AS nt FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(nt) AS BIGINT) AS n_tokens_total,
        | quantile_cont(nt, 0.5) AS p50_tokens,
        | quantile_cont(nt, 0.95) AS p95_tokens,
        | CAST(sum(nt) AS DOUBLE)/count(*) AS mean_tokens
        |FROM t GROUP BY 1 ORDER BY source""".stripMargin,
    "doc_fingerprints" ->
      s"""SELECT doc_id,
         | md5(lower(trim(text))) AS fp_md5,
         | list_reduce(
         |   list_transform(string_split(text,' '),
         |     t -> list_reduce(list_transform(string_split(t,''), c -> CAST(ascii(c) AS BIGINT)),
         |                      (a,b) -> (a*31+b) % $P)),
         |   (a,b) -> (a*31+b) % $P) AS fp_poly
         |FROM documents ORDER BY doc_id""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(lower(trim(text))) AS fp_md5, min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY md5(lower(trim(text))) ORDER BY fp_md5""".stripMargin,
    // distinct-over-union ranked by (increment, doc_id): the winner of each
    // fingerprint is the min doc_id of its FIRST increment — exactly what
    // the versioned left-anti journal produces increment by increment
    "dedup_incremental_snapshot" ->
      s"""WITH f AS (SELECT doc_id, md5(lower(trim(text))) AS fp_md5,
         |  doc_id % ${graft.operators.Dedup.SnapshotIncrements} AS inc
         | FROM documents),
         |r AS (SELECT fp_md5, doc_id, inc,
         |  row_number() OVER (PARTITION BY fp_md5 ORDER BY inc, doc_id) AS rn
         | FROM f)
         |SELECT fp_md5, doc_id AS keep_id, CAST(inc AS BIGINT) AS increment
         |FROM r WHERE rn = 1 ORDER BY fp_md5""".stripMargin,
    // dedup-within-horizon: occurrences of a fingerprint <= horizon apart
    // form one generation (keyed by first-occurrence µs); a larger gap
    // starts a new one — the lag-window sessionization of the TTL'd
    // streaming dedup's data-driven break rule
    "dedup_exact_ttl_streaming" ->
      s"""WITH e AS (
         | SELECT md5(event_type || '|' || props) AS fp, event_id, epoch_us(ts) AS us
         | FROM events),
         |l AS (SELECT *, lag(us) OVER (PARTITION BY fp ORDER BY us, event_id) AS prev FROM e),
         |g AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > ${graft.operators.Dedup.TtlHorizonUs}
         |                     THEN 1 ELSE 0 END AS brk FROM l),
         |s AS (SELECT *, sum(brk) OVER (PARTITION BY fp ORDER BY us, event_id
         |                               ROWS UNBOUNDED PRECEDING) AS gen FROM g)
         |SELECT fp, min(us) AS start_us, min(event_id) AS keep_id, count(*) AS n_dups
         |FROM s GROUP BY fp, gen ORDER BY fp, start_us""".stripMargin,
    "q16_anti_join" ->
      """SELECT p_partkey, p_brand FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |ORDER BY p_partkey""".stripMargin,
    "q17_cube" ->
      s"""SELECT l_returnflag, l_linestatus,
        | ${dd("sum(CAST(l_quantity AS DECIMAL(18,4)))")} AS sum_qty,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    // gid bit order: Spark's grouping_id = (grouping(flag)<<1)|grouping(status);
    // DuckDB's grouping(a,b) packs the same way, so the two ids agree
    "q17g_grouping_sets" ->
      s"""SELECT CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        | l_returnflag, l_linestatus,
        | ${dd("sum(CAST(l_quantity AS DECIMAL(18,4)))")} AS sum_qty,
        | count(*) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    // the arithmetic definition of width_bucket(v, 0, 500, 25) INCLUDING
    // its boundary semantics (underflow -> 0, v >= hi -> n+1 = 26; sf0.1
    // has values past 500); in-range bucket bounds k*20 are exactly
    // representable, so the floor never straddles a rounding boundary
    "q32_value_histogram" ->
      """SELECT event_type,
        | CAST(CASE WHEN value < 0 THEN 0 WHEN value >= 500 THEN 26
        |   ELSE floor(value / 20.0) + 1 END AS BIGINT) AS bucket,
        | count(*) AS n, min(value) AS min_v, max(value) AS max_v
        |FROM events GROUP BY 1, 2 ORDER BY event_type, bucket""".stripMargin,
    "q18_json_props" ->
      """SELECT event_type, count(*) AS n_events,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        | max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q19_analytic_suite" ->
      s"""SELECT event_id, user_id,
        | CAST(rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS BIGINT) AS rk,
        | lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
        | lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
        | ${dd("sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)")} AS mov_sum3
        |FROM events ORDER BY event_id""".stripMargin,
    // percent_rank/cume_dist are single divisions of exact ranks — bit-safe
    "q19b_window_suite" ->
      s"""SELECT event_id, user_id,
        | CAST(dense_rank() OVER wv AS BIGINT) AS drk,
        | CAST(ntile(4) OVER wv AS BIGINT) AS quartile,
        | percent_rank() OVER wv AS prk,
        | cume_dist() OVER wv AS cd,
        | first_value(value) OVER wt AS first_v,
        | CAST(count(*) OVER wr AS BIGINT) AS n_5min
        |FROM events
        |WINDOW wv AS (PARTITION BY user_id ORDER BY value DESC, event_id ASC),
        | wt AS (PARTITION BY user_id ORDER BY epoch_us(ts)*1000, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        | wr AS (PARTITION BY user_id ORDER BY epoch_us(ts)*1000
        |        RANGE BETWEEN 300000000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
  ) ++ mmOracle ++ Map(
    "dedup_ngram_jaccard" ->
      s"""WITH d AS (SELECT doc_id, $shinglesSql AS shingles FROM documents),
         |ds AS (SELECT DISTINCT doc_id, unnest(shingles) AS sh FROM d),
         |sz AS (SELECT doc_id, count(*) AS sz FROM ds GROUP BY doc_id),
         |fr AS (SELECT sh, count(*) AS freq FROM ds GROUP BY sh),
         |pairs AS (
         | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         | FROM ds a JOIN ds b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  JOIN fr ON fr.sh = a.sh
         | WHERE fr.freq <= $maxShingleFreq
         | GROUP BY 1, 2)
         |SELECT doc_a, doc_b, inter, jaccard FROM (
         | SELECT doc_a, doc_b, inter,
         |  CAST(inter AS DOUBLE)/(x.sz + y.sz - inter) AS jaccard
         | FROM pairs JOIN sz x ON x.doc_id = doc_a JOIN sz y ON y.doc_id = doc_b)
         |WHERE jaccard >= 0.2 ORDER BY doc_a, doc_b""".stripMargin,
    // the shingle-freq headroom observable (doc_sim_df_stats mold): the
    // HUGEINT sum crosses back to BIGINT only after the exact halving
    "dedup_ngram_shingle_stats" ->
      s"""WITH d AS (SELECT doc_id, $shinglesSql AS shingles FROM documents),
         |ds AS (SELECT DISTINCT doc_id, unnest(shingles) AS sh FROM d),
         |fr AS (SELECT sh, CAST(count(*) AS BIGINT) AS freq FROM ds GROUP BY sh)
         |SELECT CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(coalesce(max(freq), 0) AS BIGINT) AS max_freq,
         |  CAST(coalesce(sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) AS n_shingles_freq1,
         |  CAST(coalesce(sum(CASE WHEN freq BETWEEN 2 AND $maxShingleFreq
         |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_shingles_indexed,
         |  CAST(coalesce(sum(CASE WHEN freq > $maxShingleFreq
         |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dropped_shingles,
         |  CAST(coalesce(sum(CASE WHEN freq BETWEEN 2 AND $maxShingleFreq
         |    THEN freq*(freq-1) ELSE 0 END), 0) // 2 AS BIGINT) AS candidate_pairs,
         |  CAST(coalesce(sum(CASE WHEN freq > $maxShingleFreq
         |    THEN freq*(freq-1) ELSE 0 END), 0) // 2 AS BIGINT) AS dropped_pairs
         |FROM fr""".stripMargin,
    "dedup_minhash_sigs" ->
      s"""WITH d AS (SELECT doc_id, $shinglesSql AS shingles FROM documents)
         |SELECT doc_id, $minhashColsSql
         |FROM d ORDER BY doc_id""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""$lshSqlBody
         |ORDER BY doc_a, doc_b""".stripMargin,
    // the incremental index's FREEZE-at-cap rule stated exactly: a band
    // row is admitted iff its global arrival rank (increment, then doc_id)
    // is <= cap; pairs require BOTH members admitted. Deliberately NOT the
    // batch form's drop-whole-bucket rule — the two contracts differ and
    // each oracle states its own.
    "dedup_lsh_incremental" ->
      s"""WITH $lshBandCtes,
         |$lshArrivalRankCte,
         |kept AS (SELECT * FROM rk
         |         WHERE arr <= ${graft.operators.Dedup.MaxLshBucketSize}),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  ${(0 until lshSigWidth).map(j => s"a.mh$j AS a$j, b.mh$j AS b$j").mkString(", ")}
         | FROM kept a JOIN kept b ON a.band_idx = b.band_idx
         |  AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, est_jaccard FROM (
         | SELECT doc_a, doc_b,
         |  CAST(${(0 until lshSigWidth).map(j => s"CASE WHEN a$j = b$j THEN 1 ELSE 0 END").mkString(" + ")} AS DOUBLE)/$lshSigWidth AS est_jaccard
         | FROM cand)
         |WHERE est_jaccard >= $minEstJaccard ORDER BY doc_a, doc_b""".stripMargin,
    // the compacted BAND INDEX read as its membership table — the same
    // arrival-rank admission statement as dedup_lsh_incremental's kept CTE
    "dedup_lsh_index_compacted" ->
      s"""WITH $lshBandCtes,
         |$lshArrivalRankCte
         |SELECT CAST(band_idx AS BIGINT) AS band_idx, band_hash, doc_id
         |FROM rk WHERE arr <= ${graft.operators.Dedup.MaxLshBucketSize}
         |ORDER BY band_idx, band_hash, doc_id""".stripMargin,
    // per-source signature = min-reduce of per-doc signatures (MinHash's
    // set-union property); estimated Jaccard = equal-component fraction.
    // HAVING excludes all-sentinel sources (every doc's shingle set empty)
    // — the engine's sentinel guard, same predicate as the LSH banding
    // exclusion (min(mh0) = HashMod iff no real shingle exists).
    "source_similarity_minhash" ->
      s"""WITH d AS (SELECT source, $shinglesSql AS shingles FROM documents),
         |sig AS (SELECT source, $minhashColsSql FROM d),
         |s AS (SELECT source,
         |  ${graft.operators.Dedup.MinHashA.indices
             .map(j => s"min(mh$j) AS mh$j").mkString(", ")}
         |  FROM sig GROUP BY source
         |  HAVING min(mh0) < ${graft.functions.TextFunctions.HashMod})
         |SELECT a.source AS src_a, b.source AS src_b,
         |  CAST(${graft.operators.Dedup.MinHashA.indices
             .map(j => s"(CASE WHEN a.mh$j = b.mh$j THEN 1 ELSE 0 END)")
             .mkString(" + ")} AS BIGINT) AS n_equal,
         |  CAST(${graft.operators.Dedup.MinHashA.indices
             .map(j => s"(CASE WHEN a.mh$j = b.mh$j THEN 1 ELSE 0 END)")
             .mkString(" + ")} AS DOUBLE) / $lshSigWidth.0 AS est_jaccard
         |FROM s a JOIN s b ON a.source < b.source
         |ORDER BY src_a, src_b""".stripMargin,
    "dedup_lsh_dropped" ->
      s"""WITH $lshBandCtes,
         |bs AS (SELECT band_idx, band_hash, count(*) AS sz FROM br
         |       GROUP BY band_idx, band_hash HAVING count(*) >= 2)
         |SELECT CAST(band_idx AS BIGINT) AS band_idx,
         | count(*) AS n_buckets,
         | CAST(sum(CASE WHEN sz > ${graft.operators.Dedup.MaxLshBucketSize} THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_buckets,
         | CAST(sum(CASE WHEN sz > ${graft.operators.Dedup.MaxLshBucketSize} THEN sz ELSE 0 END) AS BIGINT) AS n_dropped_docs,
         | max(sz) AS max_bucket
         |FROM bs GROUP BY band_idx ORDER BY band_idx""".stripMargin,
    "dedup_lsh_components" ->
      s"""WITH RECURSIVE pairs AS ($lshSqlBody),
         |edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |nodes AS (SELECT DISTINCT s AS id FROM edges),
         |reach(id, lab) AS (
         | SELECT id, id FROM nodes
         | UNION
         | SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.id)
         |SELECT id AS doc_id, min(lab) AS component
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    "quality_filter" ->
      s"""WITH $qualityScoredCtes
         |SELECT doc_id, n_tokens, quality_score, lang_guess FROM qs
         |WHERE lang_guess = 'en' AND quality_score >= 0.5 ORDER BY doc_id""".stripMargin,
    "curation_manifest" ->
      s"""WITH RECURSIVE pairs AS ($lshSqlBody),
         |edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |nodes AS (SELECT DISTINCT s AS id FROM edges),
         |reach(id, lab) AS (
         | SELECT id, id FROM nodes
         | UNION
         | SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.id),
         |comp AS (SELECT id, min(lab) AS component FROM reach GROUP BY id),
         |ex AS (SELECT doc_id,
         |  min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS ex_keep
         | FROM documents),
         |$qualityScoredCtes,
         |$splitCtes
         |SELECT d.doc_id,
         | CAST(d.doc_id = coalesce(c.component, d.doc_id)
         |      AND d.doc_id = ex.ex_keep AS BIGINT) AS keep,
         | qs.quality_score, qs.lang_guess, sp.split,
         | CAST(d.doc_id = coalesce(c.component, d.doc_id)
         |      AND d.doc_id = ex.ex_keep
         |      AND qs.lang_guess = 'en' AND qs.quality_score >= 0.5
         |      AND sp.split = 'train' AS BIGINT) AS selected
         |FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
         | JOIN ex USING (doc_id)
         | JOIN qs USING (doc_id) JOIN sp USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // the streaming manifest's scope: exact-dedup ownership (min doc_id
    // per content fingerprint) + the quality gate — the same qs CTE as the
    // batch manifest, so the two manifests share one quality formula
    "curation_manifest_streaming" ->
      s"""WITH ex AS (SELECT doc_id,
         |  min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS ex_keep
         | FROM documents),
         |$qualityScoredCtes
         |SELECT d.doc_id,
         | CAST(d.doc_id = ex.ex_keep AS BIGINT) AS keep,
         | qs.quality_score, qs.lang_guess,
         | CAST(d.doc_id = ex.ex_keep
         |      AND qs.lang_guess = 'en' AND qs.quality_score >= 0.5 AS BIGINT) AS selected
         |FROM documents d JOIN ex USING (doc_id) JOIN qs USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    // rational BM25 core (log-free, see TextOps.bm25TopDocsOf) with
    // DECIMAL-exact per-doc summation — identical IEEE op trees both sides
    "bm25_topdocs" ->
      s"""WITH t AS (SELECT doc_id, $tokenHashesSql AS ths FROM documents),
         |tk AS (SELECT doc_id, unnest(ths) AS th FROM t),
         |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tk GROUP BY doc_id),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |        CAST(sum(dl) AS BIGINT) AS total_tokens FROM dl),
         |dfq AS (SELECT th, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tk GROUP BY th),
         |q AS (SELECT DISTINCT unnest($tokenHashesSql) AS th FROM documents WHERE doc_id = 0),
         |s AS (SELECT tf.doc_id,
         |   (CAST(st.n_docs AS DOUBLE) - CAST(dfq.df AS DOUBLE) + 0.5)
         |     / (CAST(dfq.df AS DOUBLE) + 0.5) AS idf,
         |   (CAST(tf.tf AS DOUBLE) * 2.2)
         |     / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
         |        (CAST(dl.dl AS DOUBLE)
         |          / (CAST(st.total_tokens AS DOUBLE) / CAST(st.n_docs AS DOUBLE))))) AS tfn
         | FROM (SELECT doc_id, th, CAST(count(*) AS BIGINT) AS tf
         |        FROM tk JOIN q USING (th) GROUP BY doc_id, th) tf
         | JOIN dfq USING (th) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st)
         |SELECT doc_id, CAST(SUM(CAST(idf * tfn AS DECIMAL(28,12))) AS DOUBLE) AS score
         |FROM s GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    // log-free rational PMI: three correctly-rounded double ops over exact
    // longs, same parenthesization as the Spark side
    "pmi_bigrams" ->
      s"""WITH t AS (SELECT $tokenHashesSql AS ths FROM documents),
         |u AS (SELECT th, CAST(count(*) AS BIGINT) AS uc
         |      FROM (SELECT unnest(ths) AS th FROM t) GROUP BY th),
         |ntok AS (SELECT CAST(sum(uc) AS BIGINT) AS n_tok FROM u),
         |p0 AS (SELECT unnest(list_zip(ths[1:len(ths)-1], ths[2:len(ths)])) AS pr
         |       FROM t WHERE len(ths) >= 2),
         |b AS (SELECT struct_extract(pr, 1) AS t1, struct_extract(pr, 2) AS t2,
         |       CAST(count(*) AS BIGINT) AS bc
         |      FROM p0 GROUP BY 1, 2),
         |npair AS (SELECT CAST(sum(bc) AS BIGINT) AS n_pair FROM b),
         |s AS (SELECT b.t1, b.t2, b.bc, u1.uc AS uc1, u2.uc AS uc2,
         |       CAST(b.bc AS DOUBLE) * n_tok * n_tok
         |         / (CAST(n_pair AS DOUBLE) * u1.uc * u2.uc) AS score
         |      FROM b JOIN u u1 ON b.t1 = u1.th JOIN u u2 ON b.t2 = u2.th
         |           CROSS JOIN ntok CROSS JOIN npair
         |      WHERE b.bc >= 5)
         |SELECT t1, t2, bc, uc1, uc2, score FROM s
         |ORDER BY score DESC, t1, t2 LIMIT 50""".stripMargin,
    // capped-inverted-index cosine; decimal-exact dot/norm sums, doubles
    // only at the final sqrt/divide (same policy as bm25)
    "doc_sim_sparse_topk" ->
      s"""WITH t AS (SELECT doc_id, $tokenHashesSql AS ths FROM documents),
         |tk AS (SELECT doc_id, unnest(list_transform(range(1, len(ths)-1),
         |        i -> ((ths[i]*31 + ths[i+1]) % $P * 31 + ths[i+2]) % $P)) AS th
         |       FROM t),
         |tf AS (SELECT doc_id, th, CAST(count(*) AS BIGINT) AS tf
         |       FROM tk GROUP BY doc_id, th),
         |dfq AS (SELECT th, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY th),
         |dfc AS (SELECT th, df FROM dfq WHERE df >= 2 AND df <= $docSimDfCap),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |tfw AS (SELECT tf.doc_id, tf.th,
         |         tf.tf * ((n.n_docs * 1000) // dfc.df) AS w
         |        FROM tf JOIN dfc USING (th) CROSS JOIN n),
         |nrm AS (SELECT doc_id,
         |         sqrt(${dd("sum(CAST(w AS DECIMAL(19,0)) * CAST(w AS DECIMAL(19,0)))")}) AS norm
         |        FROM tfw GROUP BY doc_id),
         |dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |          ${dd("sum(CAST(a.w AS DECIMAL(19,0)) * CAST(b.w AS DECIMAL(19,0)))")} AS dot
         |         FROM tfw a JOIN tfw b
         |           ON a.th = b.th AND a.doc_id < b.doc_id
         |         GROUP BY 1, 2)
         |SELECT d.doc_a, d.doc_b, d.dot,
         |  d.dot / (na.norm * nb.norm) AS cosine
         |FROM dots d JOIN nrm na ON d.doc_a = na.doc_id
         |            JOIN nrm nb ON d.doc_b = nb.doc_id
         |ORDER BY cosine DESC, d.doc_a, d.doc_b LIMIT 20""".stripMargin,
    // df-headroom observable over the SAME term space the similarity join
    // indexes: df distribution vs the interpolated cap, candidate-pair
    // bound Σ df·(df−1)/2 (the self-join's exact output-row count), and
    // what the cap drops; integral halving is exact (df·(df−1) is even)
    "doc_sim_df_stats" ->
      s"""WITH t AS (SELECT doc_id, $tokenHashesSql AS ths FROM documents),
         |tk AS (SELECT doc_id, unnest(list_transform(range(1, len(ths)-1),
         |        i -> ((ths[i]*31 + ths[i+1]) % $P * 31 + ths[i+2]) % $P)) AS th
         |       FROM t),
         |tf AS (SELECT doc_id, th, CAST(count(*) AS BIGINT) AS tf
         |       FROM tk GROUP BY doc_id, th),
         |f AS (SELECT th, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY th)
         |SELECT CAST(count(*) AS BIGINT) AS n_terms,
         |  CAST(coalesce(max(df), 0) AS BIGINT) AS max_df,
         |  CAST(coalesce(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) AS n_terms_df1,
         |  CAST(coalesce(sum(CASE WHEN df BETWEEN 2 AND $docSimDfCap
         |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_terms_indexed,
         |  CAST(coalesce(sum(CASE WHEN df > $docSimDfCap THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) AS n_dropped_terms,
         |  CAST(coalesce(sum(CASE WHEN df BETWEEN 2 AND $docSimDfCap
         |    THEN df*(df-1) ELSE 0 END), 0) // 2 AS BIGINT) AS candidate_pairs,
         |  CAST(coalesce(sum(CASE WHEN df > $docSimDfCap
         |    THEN df*(df-1) ELSE 0 END), 0) // 2 AS BIGINT) AS dropped_pairs
         |FROM f""".stripMargin,
    // Simpson diversity: exact longs until the two final double ops, same
    // association as the Spark side
    "token_diversity_by_source" ->
      s"""WITH tk AS (SELECT source, unnest($tokenHashesSql) AS th FROM documents),
         |c AS (SELECT source, th, CAST(count(*) AS BIGINT) AS c
         |      FROM tk GROUP BY 1, 2),
         |a AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
         |       CAST(count(*) AS BIGINT) AS n_distinct,
         |       CAST(sum(c*c) AS BIGINT) AS sumsq
         |      FROM c GROUP BY 1)
         |SELECT source, n_tokens, n_distinct, sumsq,
         | CAST(n_distinct AS DOUBLE)/n_tokens AS ttr,
         | 1.0 - CAST(sumsq AS DOUBLE)/(CAST(n_tokens AS DOUBLE)*n_tokens) AS simpson
         |FROM a ORDER BY source""".stripMargin,
    // integer-exact until the two final divisions of exact longs — order-free
    "token_rarity" ->
      s"""WITH t AS (SELECT doc_id, $tokenHashesSql AS ths FROM documents),
         |tk AS (SELECT doc_id, unnest(ths) AS th FROM t),
         |c AS (SELECT th, count(*) AS cnt FROM tk GROUP BY th),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM tk),
         |j AS (SELECT tk.doc_id, c.cnt, tot.total FROM tk JOIN c USING (th) CROSS JOIN tot)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         | CAST(sum(cnt) AS BIGINT) AS sum_cnt,
         | CAST(sum(CASE WHEN cnt*1000 < total THEN 1 ELSE 0 END) AS BIGINT) AS rare_n,
         | CAST(sum(cnt) AS DOUBLE)/count(*) AS mean_cnt,
         | CAST(sum(CASE WHEN cnt*1000 < total THEN 1 ELSE 0 END) AS DOUBLE)/count(*) AS rare_frac
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // exact bigram/context counts; same integer ppm arithmetic as the
    // sketch (collision-free at the test vocabulary, the MG precedent)
    "lm_bigram_score_sketch" ->
      s"""WITH t AS (SELECT doc_id, $tokenHashesSql AS ths FROM documents),
         |tt AS (SELECT doc_id, ths FROM t WHERE len(ths) >= 2),
         |p0 AS (SELECT doc_id, unnest(list_zip(ths[1:len(ths)-1], ths[2:len(ths)])) AS pr FROM tt),
         |p AS (SELECT doc_id, struct_extract(pr, 1) AS t1, struct_extract(pr, 2) AS t2 FROM p0),
         |u AS (SELECT t1, count(*) AS uc FROM p GROUP BY 1),
         |b AS (SELECT t1, t2, count(*) AS bc FROM p GROUP BY 1, 2),
         |s AS (SELECT p.doc_id, (b.bc * 1000000) // u.uc AS ppm
         |      FROM p JOIN u USING (t1) JOIN b USING (t1, t2))
         |SELECT doc_id, count(*) AS n_pairs, CAST(sum(ppm) AS BIGINT) AS ppm_sum,
         |  CAST(sum(ppm) AS DOUBLE)/count(*) AS mean_cond_ppm
         |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the same exact-count chain, collapsed to the calibration histogram:
    // bucket id is two floor divisions of exact longs, extremes are
    // element selection over the identically-derived mean double
    "ppl_bucket_stats" ->
      s"""WITH t AS (SELECT doc_id, $tokenHashesSql AS ths FROM documents),
         |tt AS (SELECT doc_id, ths FROM t WHERE len(ths) >= 2),
         |p0 AS (SELECT doc_id, unnest(list_zip(ths[1:len(ths)-1], ths[2:len(ths)])) AS pr FROM tt),
         |p AS (SELECT doc_id, struct_extract(pr, 1) AS t1, struct_extract(pr, 2) AS t2 FROM p0),
         |u AS (SELECT t1, count(*) AS uc FROM p GROUP BY 1),
         |b AS (SELECT t1, t2, count(*) AS bc FROM p GROUP BY 1, 2),
         |s AS (SELECT p.doc_id, (b.bc * 1000000) // u.uc AS ppm
         |      FROM p JOIN u USING (t1) JOIN b USING (t1, t2)),
         |d AS (SELECT doc_id, count(*) AS n_pairs, CAST(sum(ppm) AS BIGINT) AS ppm_sum,
         |       CAST(sum(ppm) AS DOUBLE)/count(*) AS mean_cond_ppm
         |      FROM s GROUP BY doc_id)
         |SELECT CAST((ppm_sum // n_pairs) // ${graft.operators.TextOps.PplBucketPpm}
         |            AS BIGINT) AS bucket,
         | CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(n_pairs) AS BIGINT) AS sum_pairs,
         | min(mean_cond_ppm) AS min_mean_ppm,
         | max(mean_cond_ppm) AS max_mean_ppm
         |FROM d GROUP BY 1 ORDER BY bucket""".stripMargin,
    "rep_stats" ->
      s"""WITH t AS (SELECT doc_id, $tokenHashesSql AS ths FROM documents),
         |b AS (SELECT doc_id, ths,
         |  list_transform(range(1, len(ths)), i -> (ths[i]*31 + ths[i+1]) % $P) AS bgs FROM t),
         |m AS (SELECT doc_id,
         |  len(ths) AS n_tokens,
         |  len(list_distinct(ths)) AS n_distinct,
         |  list_max(list_transform(list_distinct(ths), u -> len(list_filter(ths, x -> x = u)))) AS top_cnt,
         |  len(bgs) AS n_bigrams,
         |  len(list_distinct(bgs)) AS n_distinct_bigrams
         | FROM b),
         |r AS (SELECT doc_id, n_tokens, n_distinct,
         |  CAST(n_distinct AS DOUBLE)/n_tokens AS distinct_ratio,
         |  CAST(top_cnt AS DOUBLE)/n_tokens AS top_token_frac,
         |  CASE WHEN n_bigrams = 0 THEN 0.0
         |   ELSE CAST(n_bigrams - n_distinct_bigrams AS DOUBLE)/n_bigrams END AS dup_bigram_frac
         | FROM m)
         |SELECT doc_id, n_tokens, n_distinct, distinct_ratio, top_token_frac, dup_bigram_frac,
         | CAST(distinct_ratio >= 0.35 AND top_token_frac <= 0.15
         |      AND dup_bigram_frac <= 0.10 AS BIGINT) AS gopher_ok
         |FROM r ORDER BY doc_id""".stripMargin,
    "vocab_topk" ->
      s"""WITH ds AS (SELECT DISTINCT doc_id, unnest($tokenHashesSql) AS th FROM documents)
         |SELECT th, count(*) AS df FROM ds GROUP BY th
         |ORDER BY df DESC, th ASC LIMIT 50""".stripMargin,
    // sketch variants are exact at this capacity — same oracle as vocab_topk
    "vocab_topk_sketch" ->
      s"""WITH ds AS (SELECT DISTINCT doc_id, unnest($tokenHashesSql) AS th FROM documents)
         |SELECT th, count(*) AS df FROM ds GROUP BY th
         |ORDER BY df DESC, th ASC LIMIT 50""".stripMargin,
    "vocab_topk_sketch_streaming" ->
      s"""WITH ds AS (SELECT DISTINCT doc_id, unnest($tokenHashesSql) AS th FROM documents)
         |SELECT th, count(*) AS df FROM ds GROUP BY th
         |ORDER BY df DESC, th ASC LIMIT 50""".stripMargin,
    "vocab_topk_by_lang_sketch" ->
      s"""WITH ds AS (SELECT DISTINCT lang, doc_id, unnest($tokenHashesSql) AS th FROM documents),
         |c AS (SELECT lang, th, count(*) AS df FROM ds GROUP BY lang, th),
         |r AS (SELECT lang, th, df,
         |      row_number() OVER (PARTITION BY lang ORDER BY df DESC, th ASC) AS rk FROM c)
         |SELECT lang, rk, th, df FROM r WHERE rk <= 10 ORDER BY lang, rk""".stripMargin,
    // exact oracle: at fixture cardinalities the HLL stays in its exact
    // sparse modes; cumulative distinct = running sum of first-seen days
    "hll_daily_users" ->
      s"""WITH e AS (SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_start,
         |  user_id FROM events),
         |d AS (SELECT day_start, count(DISTINCT user_id) AS daily_users FROM e GROUP BY 1),
         |f AS (SELECT user_id, min(day_start) AS first_day FROM e GROUP BY 1),
         |n AS (SELECT first_day AS day_start, count(*) AS new_u FROM f GROUP BY 1),
         |c AS (SELECT d.day_start, d.daily_users,
         |  sum(coalesce(n.new_u, 0)) OVER (ORDER BY d.day_start
         |    ROWS UNBOUNDED PRECEDING) AS cum_users
         | FROM d LEFT JOIN n USING (day_start))
         |SELECT day_start, daily_users, CAST(cum_users AS BIGINT) AS cum_users
         |FROM c ORDER BY day_start""".stripMargin,
    // capacity ≥ any day's distinct users → the summary is exact per window
    "topk_users_daily_sketch" ->
      s"""WITH h AS (SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_start,
         |  user_id, count(*) AS n_events FROM events GROUP BY 1, 2),
         |r AS (SELECT day_start, user_id, n_events,
         |  row_number() OVER (PARTITION BY day_start ORDER BY n_events DESC, user_id ASC) AS rk
         | FROM h)
         |SELECT day_start, rk, user_id, n_events FROM r WHERE rk <= 5
         |ORDER BY day_start, rk""".stripMargin,
    // collision-free at the test vocabulary → exact per-token df oracle
    "token_df_countmin" ->
      s"""WITH ds AS (SELECT DISTINCT doc_id, unnest($tokenHashesSql) AS th FROM documents),
         |q AS (SELECT DISTINCT unnest($tokenHashesSql) AS th FROM documents WHERE doc_id < 10),
         |c AS (SELECT th, count(*) AS df FROM ds GROUP BY th)
         |SELECT q.th, c.df FROM q JOIN c USING (th) ORDER BY th""".stripMargin,
    "split_stratified" ->
      s"""WITH $splitCtes
         |SELECT doc_id, lang, source, split FROM sp ORDER BY doc_id""".stripMargin,
    // the textbook ONE-WINDOW statement; the engine runs the banded
    // two-level prefix sum, bit-identical because integer addition is
    // associative; positive operands make // and `div` agree (q36's rule)
    // chunk arithmetic is positive-integer ceil-division (// and div
    // agree); the lateral chunk fan-out uses the range(CONST) + WHERE
    // idiom (range over a column is not lateral-safe in DuckDB 1.0);
    // 16 >> the 4-chunk max at 100-token docs with window 32
    "doc_chunks" ->
      s"""WITH d AS (SELECT doc_id, lang, source,
         |  CASE WHEN text IS NULL THEN 0
         |       ELSE len(string_split(text,' ')) END AS n_tok
         | FROM documents),
         |c AS (SELECT doc_id, lang, source, n_tok,
         |   CASE WHEN n_tok <= ${TextOps.ChunkWindowTokens} THEN 1
         |        ELSE (n_tok - ${TextOps.ChunkWindowTokens}
         |              + ${TextOps.ChunkStrideTokens} - 1)
         |             // ${TextOps.ChunkStrideTokens} + 1 END AS n_chunks
         |  FROM d),
         |u AS (SELECT doc_id, lang, source, n_tok,
         |        unnest(range(n_chunks)) AS ci FROM c)
         |SELECT doc_id, CAST(ci AS BIGINT) AS chunk_id, lang, source,
         | CAST(n_tok AS BIGINT) AS n_tok,
         | CAST(ci * ${TextOps.ChunkStrideTokens} AS BIGINT) AS start_tok,
         | CAST(least(ci * ${TextOps.ChunkStrideTokens}
         |            + ${TextOps.ChunkWindowTokens}, n_tok) AS BIGINT) AS end_tok,
         | CAST(least(ci * ${TextOps.ChunkStrideTokens}
         |            + ${TextOps.ChunkWindowTokens}, n_tok)
         |      - ci * ${TextOps.ChunkStrideTokens} AS BIGINT) AS chunk_tok
         |FROM u ORDER BY doc_id, chunk_id""".stripMargin,
    // exact integer 3-gram counts over the engine's rolling shingle
    // hashes; the flag is the cross-multiplied dup*50 >= n test (2%,
    // probed discriminating at all three SFs); fraction = one divide
    "repetition_ngram_stats" ->
      s"""WITH s AS (SELECT doc_id, lang, source,
         |   CASE WHEN text IS NULL THEN [] ELSE $shinglesSql END AS ng
         |  FROM documents),
         |m AS (SELECT doc_id, lang, source,
         |   CAST(len(ng) AS BIGINT) AS n_ngrams,
         |   CAST(len(list_distinct(ng)) AS BIGINT) AS n_distinct FROM s)
         |SELECT doc_id, lang, source, n_ngrams, n_distinct,
         | n_ngrams - n_distinct AS n_dup,
         | CASE WHEN n_ngrams = 0 THEN 0.0
         |      ELSE CAST(n_ngrams - n_distinct AS DOUBLE)
         |           / CAST(n_ngrams AS DOUBLE) END AS dup_frac,
         | CAST((n_ngrams > 0 AND
         |       (n_ngrams - n_distinct) * ${TextOps.RepetitionDupDenom}
         |        >= n_ngrams) AS BIGINT) AS is_repetitive
         |FROM m ORDER BY doc_id""".stripMargin,
    // mid-frequency posting lists: df band [5,40] and 32-posting cap are
    // part of the contract; exploded row form, doc_id-ascending positions
    "inverted_index_postings" ->
      s"""WITH t AS (SELECT doc_id, $tokenHashesSql AS ths FROM documents),
         |pr AS (SELECT DISTINCT doc_id, unnest(ths) AS th FROM t),
         |dfb AS (SELECT th, CAST(count(*) AS BIGINT) AS df FROM pr
         |        GROUP BY th HAVING count(*) BETWEEN 5 AND 40),
         |po AS (SELECT pr.th, dfb.df, CAST(row_number() OVER (
         |         PARTITION BY pr.th ORDER BY pr.doc_id) AS BIGINT) AS pos,
         |         pr.doc_id
         |       FROM pr JOIN dfb ON pr.th = dfb.th)
         |SELECT th, df, pos, doc_id FROM po WHERE pos <= 32
         |ORDER BY th, pos""".stripMargin,
    "sample_weighted_systematic" ->
      s"""WITH d AS (SELECT doc_id, lang, source,
         |  CASE WHEN text IS NULL THEN 0
         |       ELSE len(string_split(text,' ')) END AS w
         | FROM documents),
         |c AS (SELECT doc_id, lang, source, w,
         |       sum(w) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum,
         |       sum(w) OVER () AS t
         |      FROM d)
         |SELECT doc_id, lang, source, CAST(w AS BIGINT) AS w,
         | CAST((cum * ${TextOps.SampleWeightedK}) // t AS BIGINT) AS pick_idx
         |FROM c
         |WHERE w > 0 AND (cum * ${TextOps.SampleWeightedK}) // t
         |            > ((cum - w) * ${TextOps.SampleWeightedK}) // t
         |ORDER BY doc_id""".stripMargin,
    // group-aware split: assignment is a pure function of user_id (NULLs
    // form the P-1 sentinel pseudo-group), leaked_users computed from the
    // assigned rows, structurally zero
    "split_grouped_leakfree" ->
      """WITH a AS (SELECT user_id,
        |  CASE WHEN ((((coalesce(user_id, 1000000006) % 1000000007)
        |               * 2654435761) % 1000000007) % 10) < 8 THEN 'train'
        |       WHEN ((((coalesce(user_id, 1000000006) % 1000000007)
        |               * 2654435761) % 1000000007) % 10) < 9 THEN 'val'
        |       ELSE 'test' END AS split
        | FROM events),
        |pu AS (SELECT coalesce(user_id, 1000000006) AS u,
        |        count(DISTINCT split) AS n_splits
        |       FROM a GROUP BY 1),
        |lk AS (SELECT CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END)
        |               AS BIGINT) AS leaked_users FROM pu)
        |SELECT split, count(*) AS n_events,
        | CAST(count(DISTINCT coalesce(user_id, 1000000006)) AS BIGINT) AS n_users,
        | leaked_users
        |FROM a CROSS JOIN lk
        |GROUP BY split, leaked_users ORDER BY split""".stripMargin,
    // cut = 8th-decile distinct day via pure integer rank arithmetic;
    // embargo band (cut, cut+2] excluded from both sides
    "split_time_embargo" ->
      """WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS n_events FROM events GROUP BY 1),
        |r AS (SELECT day, row_number() OVER (ORDER BY day) - 1 AS i FROM d),
        |c AS (SELECT day AS cut_day FROM r, (SELECT count(*) AS n FROM d)
        |      WHERE i = (n - 1) * 8 // 10)
        |SELECT day, n_events,
        |  CASE WHEN day <= c.cut_day THEN 'train'
        |       WHEN day > c.cut_day + 2 THEN 'test'
        |       ELSE 'embargo' END AS split
        |FROM d, c ORDER BY day""".stripMargin,
    "tfidf_top_terms" ->
      s"""WITH tk AS (SELECT doc_id, unnest($tokenHashesSql) AS th FROM documents),
         |tf AS (SELECT doc_id, th, count(*) AS tf FROM tk GROUP BY doc_id, th),
         |dfq AS (SELECT th, count(DISTINCT doc_id) AS df FROM tk GROUP BY th),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |s AS (SELECT doc_id, th, tf, df,
         |       CAST(tf * n_docs AS DOUBLE)/df AS score
         |      FROM tf JOIN dfq USING (th), n),
         |r AS (SELECT doc_id, th, tf, df, score,
         |       row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, th ASC) AS rk
         |      FROM s)
         |SELECT doc_id, CAST(rk AS BIGINT) AS rk, th, tf, df, score
         |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "corpus_mix" ->
      """WITH t AS (SELECT lang, source, coalesce(len(string_split(text,' ')), 0) AS nt FROM documents),
        |a AS (SELECT lang, source, count(*) AS n_docs,
        |       CAST(sum(nt) AS BIGINT) AS n_tokens
        |      FROM t GROUP BY lang, source)
        |SELECT lang, source, CAST(n_docs AS BIGINT) AS n_docs, n_tokens,
        | CAST(n_tokens AS DOUBLE) /
        |  CAST((SELECT CAST(sum(nt) AS BIGINT) FROM t) AS DOUBLE) AS token_frac
        |FROM a ORDER BY lang, source""".stripMargin,
    "mix_sample" ->
      s"""SELECT doc_id, lang, source FROM (
         | SELECT doc_id, lang, source,
         |  ((doc_id % $P) * ${graft.operators.TextOps.MixMultiplier}) % $P AS h,
         |  CASE source ${MixRates.toSeq.sortBy(_._1).map { case (src, r) =>
              s"WHEN '$src' THEN ${(r * P).toLong}" }.mkString(" ")}
         |   ELSE ${(MixDefaultRate * P).toLong} END AS thr
         | FROM documents)
         |WHERE h < thr ORDER BY doc_id""".stripMargin,
    "mix_rates" ->
      s"""WITH t AS (SELECT source, coalesce(len(string_split(text,' ')), 0) AS nt FROM documents),
         |a AS (SELECT source, CAST(sum(nt) AS BIGINT) AS n_tokens FROM t GROUP BY source),
         |b AS (SELECT source, n_tokens,
         |  CASE source ${MixWeights.toSeq.sortBy(_._1).map { case (src, x) =>
              s"WHEN '$src' THEN $x" }.mkString(" ")}
         |   ELSE $MixDefaultWeight END AS weight
         | FROM a)
         |SELECT source, n_tokens, weight,
         | CASE WHEN n_tokens > 0 THEN
         |  (SELECT min(CASE WHEN n_tokens > 0 THEN CAST(n_tokens AS DOUBLE)/weight END) FROM b)
         |    * weight / CAST(n_tokens AS DOUBLE)
         | ELSE 0.0 END AS rate
         |FROM b ORDER BY source""".stripMargin,
    // the √-sum denominator is an ORDERED left-to-right list fold on both
    // sides (list_reduce here, `aggregate` over the lang-sorted array on
    // the Spark side) — float addition is non-associative, so the fold
    // order is part of the registered semantics
    "corpus_mix_temperature" ->
      s"""WITH $tempMixCtes
         |SELECT lang, n_tokens, share, temp_weight, boost, rate
         |FROM rr ORDER BY lang""".stripMargin,
    // the composed pipeline: the SAME rate chain broadcast back as
    // floor(rate·P) hash thresholds over the documents
    "mix_sample_temperature" ->
      s"""WITH $tempMixCtes,
         |th AS (SELECT lang, CAST(floor(rate * $P) AS BIGINT) AS thr FROM rr)
         |SELECT d.doc_id, d.lang, d.source
         |FROM documents d JOIN th USING (lang)
         |WHERE ((d.doc_id % $P) * ${graft.operators.TextOps.MixMultiplier}) % $P < th.thr
         |ORDER BY d.doc_id""".stripMargin,
    "pii_scrub" ->
      s"""SELECT doc_id,
         | CAST(len(regexp_extract_all(text, '${graft.operators.TextOps.EmailPattern}')) AS BIGINT) AS n_emails,
         | CAST(len(regexp_extract_all(text, '${graft.operators.TextOps.PhonePattern}')) AS BIGINT) AS n_phones,
         | md5(regexp_replace(regexp_replace(text, '${graft.operators.TextOps.EmailPattern}', '<EMAIL>', 'g'),
         |                    '${graft.operators.TextOps.PhonePattern}', '<PHONE>', 'g')) AS clean_md5
         |FROM documents ORDER BY doc_id""".stripMargin,
    "pack_assign" ->
      // coalesce pins NULL text to 0 tokens, mirroring TextOps.tokenCount0
      """WITH t AS (SELECT doc_id, coalesce(len(string_split(text,' ')), 0) AS n_tokens FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |  coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
        | FROM t)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        | CAST(pre // 2048 AS BIGINT) AS pack_id
        |FROM c ORDER BY doc_id""".stripMargin,
    "pack_segments" ->
      // same prefix sums as pack_assign, then each doc explodes over the
      // packs its token span [start, start+n-1] crosses; (tok_from, tok_to)
      // is the doc-relative inclusive slice that lands in that pack
      """WITH t AS (SELECT doc_id, coalesce(len(string_split(text,' ')), 0) AS n_tokens FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |  coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
        | FROM t),
        |s AS (SELECT doc_id, n_tokens, CAST(start AS BIGINT) AS start,
        |       CAST(start + n_tokens - 1 AS BIGINT) AS last
        |      FROM c WHERE n_tokens > 0),
        |seg AS (SELECT doc_id, start, last,
        |  unnest(range(start // 2048, last // 2048 + 1)) AS pack_id FROM s)
        |SELECT doc_id, CAST(pack_id AS BIGINT) AS pack_id,
        | CAST(greatest(pack_id * 2048, start) - start AS BIGINT) AS tok_from,
        | CAST(least((pack_id + 1) * 2048 - 1, last) - start AS BIGINT) AS tok_to
        |FROM seg ORDER BY doc_id, pack_id""".stripMargin,
    "winnow_fingerprints" ->
      s"""WITH t AS (SELECT doc_id, $shinglesSql AS sh FROM documents),
         |w AS (SELECT doc_id,
         |  list_distinct(list_transform(range(1, len(sh)-2), i -> list_min(sh[i:i+3]))) AS fps
         | FROM t)
         |SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fp FROM w
         |ORDER BY doc_id, fp""".stripMargin,
    "contamination_external" ->
      s"""WITH t AS (SELECT doc_id, $shinglesSql AS sh FROM documents),
         |w AS (SELECT doc_id,
         |  list_distinct(list_transform(range(1, len(sh)-2), i -> list_min(sh[i:i+3]))) AS fps
         | FROM t),
         |f AS (SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fp FROM w),
         |fr AS (SELECT fp, count(*) AS freq FROM f GROUP BY fp),
         |evd AS (SELECT doc_id + 1000000 AS doc_id,
         |  array_to_string(string_split(text,' ')[1:30], ' ') AS text
         | FROM documents WHERE doc_id % 37 = 0),
         |et AS (SELECT doc_id, $shinglesSql AS sh FROM evd),
         |ew AS (SELECT doc_id,
         |  list_distinct(list_transform(range(1, len(sh)-2), i -> list_min(sh[i:i+3]))) AS fps
         | FROM et),
         |ev AS (SELECT doc_id AS eval_id, CAST(unnest(fps) AS BIGINT) AS fp FROM ew),
         |evsz AS (SELECT eval_id, count(*) AS n_fp FROM ev GROUP BY eval_id),
         |hits AS (
         | SELECT f.doc_id AS train_id, ev.eval_id, count(*) AS n_shared
         | FROM f JOIN fr USING (fp) JOIN ev USING (fp)
         | WHERE fr.freq <= 100 AND f.doc_id <> ev.eval_id
         | GROUP BY 1, 2)
         |SELECT train_id, eval_id, n_shared,
         | CAST(n_shared AS DOUBLE)/n_fp AS overlap
         |FROM hits JOIN evsz USING (eval_id)
         |WHERE n_shared >= 2 ORDER BY train_id, eval_id""".stripMargin,
    "contamination_check" ->
      s"""WITH t AS (SELECT doc_id, $shinglesSql AS sh FROM documents),
         |w AS (SELECT doc_id,
         |  list_distinct(list_transform(range(1, len(sh)-2), i -> list_min(sh[i:i+3]))) AS fps
         | FROM t),
         |f AS (SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fp FROM w),
         |fr AS (SELECT fp, count(*) AS freq FROM f GROUP BY fp),
         |ev AS (SELECT doc_id AS eval_id, fp FROM f WHERE doc_id % 50 = 0),
         |evsz AS (SELECT eval_id, count(*) AS n_fp FROM ev GROUP BY eval_id),
         |hits AS (
         | SELECT f.doc_id AS train_id, ev.eval_id, count(*) AS n_shared
         | FROM f JOIN fr USING (fp) JOIN ev USING (fp)
         | WHERE fr.freq <= 100 AND f.doc_id <> ev.eval_id
         | GROUP BY 1, 2)
         |SELECT train_id, eval_id, n_shared,
         | CAST(n_shared AS DOUBLE)/n_fp AS overlap
         |FROM hits JOIN evsz USING (eval_id)
         |WHERE n_shared >= 2 ORDER BY train_id, eval_id""".stripMargin,
    // raw 5-gram decontamination: exhaustive shingles (no winnowing),
    // minShared = 1 — one shared 5-gram is the flag in the GPT-3 method
    "contamination_ngram" ->
      s"""WITH t AS (SELECT doc_id, $tokenHashesSql AS ths FROM documents),
         |s AS (SELECT doc_id, list_distinct($shingles5Sql) AS fps FROM t),
         |f AS (SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fp FROM s),
         |fr AS (SELECT fp, count(*) AS freq FROM f GROUP BY fp),
         |evd AS (SELECT doc_id + 1000000 AS doc_id,
         |  array_to_string(string_split(text,' ')[1:30], ' ') AS text
         | FROM documents WHERE doc_id % 37 = 0),
         |et AS (SELECT doc_id, $tokenHashesSql AS ths FROM evd),
         |es AS (SELECT doc_id, list_distinct($shingles5Sql) AS fps FROM et),
         |ev AS (SELECT doc_id AS eval_id, CAST(unnest(fps) AS BIGINT) AS fp FROM es),
         |evsz AS (SELECT eval_id, count(*) AS n_fp FROM ev GROUP BY eval_id),
         |hits AS (
         | SELECT f.doc_id AS train_id, ev.eval_id, count(*) AS n_shared
         | FROM f JOIN fr USING (fp) JOIN ev USING (fp)
         | WHERE fr.freq <= 100 AND f.doc_id <> ev.eval_id
         | GROUP BY 1, 2)
         |SELECT train_id, eval_id, n_shared,
         | CAST(n_shared AS DOUBLE)/n_fp AS overlap
         |FROM hits JOIN evsz USING (eval_id)
         |WHERE n_shared >= 1 ORDER BY train_id, eval_id""".stripMargin,
    "dedup_paragraph" ->
      s"""WITH t AS (SELECT doc_id, $tokenHashesSql AS ths FROM documents),
         |$chunkHashCte,
         |f AS (SELECT ph, count(*) AS freq FROM p GROUP BY ph)
         |SELECT doc_id, count(*) AS n_paras,
         | CAST(sum(CASE WHEN freq > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_paras,
         | CAST(sum(CASE WHEN freq > 1 THEN 1 ELSE 0 END) AS DOUBLE)/count(*) AS dup_para_frac
         |FROM p JOIN f USING (ph)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dedup_containment" ->
      s"""WITH t AS (SELECT doc_id, $tokenHashesSql AS ths FROM documents),
         |$chunkHashCte,
         |f AS (SELECT ph, min(doc_id) AS first_doc FROM p GROUP BY ph)
         |SELECT doc_id, count(*) AS n_paras,
         | CAST(sum(CASE WHEN first_doc < doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_contained,
         | CAST(sum(CASE WHEN first_doc < doc_id THEN 1 ELSE 0 END) AS DOUBLE)/count(*) AS contained_frac,
         | CAST(CAST(sum(CASE WHEN first_doc < doc_id THEN 1 ELSE 0 END) AS DOUBLE)/count(*) < 0.5 AS BIGINT) AS keep
         |FROM p JOIN f USING (ph)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the winnow-anchored containment: same first-occurrence decision over
    // the shift-robust fingerprint set; short docs (no fingerprints) are
    // reported with zeros and kept
    "dedup_containment_winnow" ->
      s"""WITH t AS (SELECT doc_id, $shinglesSql AS sh FROM documents),
         |w AS (SELECT doc_id,
         |  list_distinct(list_transform(range(1, len(sh)-2), i -> list_min(sh[i:i+3]))) AS fps
         | FROM t),
         |f AS (SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fp FROM w),
         |fr AS (SELECT fp, min(doc_id) AS first_doc FROM f GROUP BY fp),
         |a AS (SELECT f.doc_id, count(*) AS n_fps,
         |       sum(CASE WHEN fr.first_doc < f.doc_id THEN 1 ELSE 0 END) AS n_contained
         |      FROM f JOIN fr USING (fp) GROUP BY f.doc_id)
         |SELECT d.doc_id,
         | CAST(coalesce(a.n_fps, 0) AS BIGINT) AS n_fps,
         | CAST(coalesce(a.n_contained, 0) AS BIGINT) AS n_contained,
         | CASE WHEN a.n_fps IS NULL THEN 0.0
         |      ELSE CAST(a.n_contained AS DOUBLE)/a.n_fps END AS contained_frac,
         | CAST(CASE WHEN a.n_fps IS NULL THEN 1
         |      WHEN CAST(a.n_contained AS DOUBLE)/a.n_fps < 0.5 THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "boilerplate_strip" -> {
      // kept_hash: position-ordered fold (a*31 + ph) % P from 0 — the
      // list_prepend(0) makes DuckDB's init-less list_reduce compute the
      // exact fold Spark's aggregate(chs, 0L, ...) computes
      s"""WITH t AS (SELECT doc_id, $tokenHashesSql AS ths FROM documents),
         |cl AS (SELECT doc_id, $chunkListSql AS chs FROM t),
         |e0 AS (SELECT doc_id, unnest(list_transform(range(len(chs)),
         |        i -> {'pos': i, 'ph': chs[CAST(i AS INT)+1]})) AS u FROM cl),
         |e AS (SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.ph AS ph FROM e0),
         |f AS (SELECT ph, count(*) AS freq FROM e GROUP BY ph),
         |k AS (SELECT e.doc_id, e.pos, e.ph FROM e JOIN f USING (ph) WHERE f.freq <= 1),
         |a AS (SELECT doc_id, count(*) AS n_kept,
         |       list_reduce(list_prepend(CAST(0 AS BIGINT), list(ph ORDER BY pos)),
         |                   (a,b) -> (a*31+b) % $P) AS kept_hash
         |      FROM k GROUP BY doc_id)
         |SELECT cl.doc_id, CAST(coalesce(len(chs), 0) AS BIGINT) AS n_chunks,
         | coalesce(CAST(n_kept AS BIGINT), 0) AS n_kept,
         | CAST(coalesce(kept_hash, 0) AS BIGINT) AS kept_hash
         |FROM cl LEFT JOIN a USING (doc_id) ORDER BY doc_id""".stripMargin
    },
    "dedup_cluster_sizes" ->
      s"""WITH RECURSIVE pairs AS ($lshSqlBody),
         |edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |nodes AS (SELECT DISTINCT s AS id FROM edges),
         |reach(id, lab) AS (
         | SELECT id, id FROM nodes
         | UNION
         | SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.id),
         |comp AS (SELECT id, min(lab) AS component FROM reach GROUP BY id),
         |cs AS (SELECT component, count(*) AS cluster_size FROM comp GROUP BY component)
         |SELECT cluster_size, count(*) AS n_clusters FROM cs
         |GROUP BY cluster_size ORDER BY cluster_size""".stripMargin,
    "dedup_decisions" ->
      s"""WITH RECURSIVE pairs AS ($lshSqlBody),
         |edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |nodes AS (SELECT DISTINCT s AS id FROM edges),
         |reach(id, lab) AS (
         | SELECT id, id FROM nodes
         | UNION
         | SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.id),
         |comp AS (SELECT id, min(lab) AS component FROM reach GROUP BY id)
         |SELECT d.doc_id, coalesce(c.component, d.doc_id) AS keep_id,
         | CAST(d.doc_id = coalesce(c.component, d.doc_id) AS BIGINT) AS keep
         |FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
         |ORDER BY doc_id""".stripMargin,
    "dedup_decisions_pref" ->
      s"""WITH RECURSIVE pairs AS ($lshSqlBody),
         |edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |nodes AS (SELECT DISTINCT s AS id FROM edges),
         |reach(id, lab) AS (
         | SELECT id, id FROM nodes
         | UNION
         | SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.id),
         |comp AS (SELECT id, min(lab) AS component FROM reach GROUP BY id),
         |sel AS (SELECT d.doc_id, d.source,
         |  coalesce(c.component, d.doc_id) AS component,
         |  CASE d.source ${DedupPrefer.zipWithIndex
              .map { case (s, i) => s"WHEN '$s' THEN $i" }.mkString(" ")}
         |   ELSE ${DedupPrefer.size} END AS prio
         | FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
         |k AS (SELECT component, doc_id AS keep_id,
         |  row_number() OVER (PARTITION BY component ORDER BY prio, doc_id) AS rn
         | FROM sel)
         |SELECT s.doc_id, s.source, s.component, kk.keep_id,
         | CAST(s.doc_id = kk.keep_id AS BIGINT) AS keep
         |FROM sel s JOIN (SELECT component, keep_id FROM k WHERE rn = 1) kk
         | USING (component)
         |ORDER BY doc_id""".stripMargin,
    "dedup_simhash" ->
      s"""WITH t AS (SELECT doc_id, $tokenHashesSql AS ths FROM documents)
         |SELECT doc_id, CAST(${(0 until 32).map(simhashBitSql).mkString(" + ")} AS BIGINT) AS simhash
         |FROM t ORDER BY doc_id""".stripMargin,
    "dedup_simhash_pairs" ->
      s"""WITH t AS (SELECT doc_id, $tokenHashesSql AS ths FROM documents),
         |s AS (SELECT doc_id, CAST(${(0 until 32).map(simhashBitSql).mkString(" + ")} AS BIGINT) AS simhash FROM t),
         |br AS (SELECT doc_id, simhash, CAST(r.range AS INT) AS band_idx,
         |        (simhash >> CAST(8*r.range AS INT)) & 255 AS band_val
         |       FROM s, range(4) r),
         |bf AS (SELECT band_idx, band_val FROM br GROUP BY band_idx, band_val
         |       HAVING count(*) >= 2 AND count(*) <= ${graft.operators.Dedup.MaxLshBucketSize}),
         |cand AS (
         | SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  a.simhash AS sa, b.simhash AS sb
         | FROM br a
         |  JOIN bf ON bf.band_idx = a.band_idx AND bf.band_val = a.band_val
         |  JOIN br b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         |   AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, hamming FROM (
         | SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming FROM cand)
         |WHERE hamming <= 1 ORDER BY doc_a, doc_b""".stripMargin,
    "ann_brute_topk" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec
         |  FROM embeddings WHERE vec_id % 100 = 0),
         |c AS (
         | SELECT q.q_id, e.vec_id, ${cosineSql("q.q_vec", "e.embedding::DOUBLE[]")} AS cos
         | FROM embeddings e JOIN q ON e.vec_id <> q.q_id),
         |r AS (SELECT q_id, vec_id, cos,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk FROM c)
         |SELECT q_id, rk, vec_id, cos FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    "ann_lsh_topk" ->
      s"""WITH base AS (
         | SELECT vec_id, embedding::DOUBLE[] AS vec, (${bucketSql("embedding::DOUBLE[]")}) AS bucket
         | FROM embeddings),
         |q AS (SELECT vec_id AS q_id, vec AS q_vec, bucket AS q_bucket FROM base WHERE vec_id % 100 = 0),
         |c AS (
         | SELECT q.q_id, b.vec_id, ${cosineSql("q.q_vec", "b.vec")} AS cos
         | FROM base b JOIN q ON b.bucket = q.q_bucket AND b.vec_id <> q.q_id),
         |r AS (SELECT q_id, vec_id, cos,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk FROM c)
         |SELECT q_id, rk, vec_id, cos FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    "ann_lsh_multiprobe_topk" ->
      s"""WITH base AS (
         | SELECT vec_id, embedding::DOUBLE[] AS vec, (${bucketSql("embedding::DOUBLE[]")}) AS bucket
         | FROM embeddings),
         |q AS (SELECT vec_id AS q_id, vec AS q_vec, bucket AS q_bucket FROM base WHERE vec_id % 100 = 0),
         |p AS (SELECT q_id, q_vec, CAST(xor(q_bucket, f.flip) AS BIGINT) AS probe
         |      FROM q, (SELECT unnest([0, 1, 2, 4, 8, 16, 32]) AS flip) f),
         |c AS (
         | SELECT p.q_id, b.vec_id, ${cosineSql("p.q_vec", "b.vec")} AS cos
         | FROM base b JOIN p ON b.bucket = p.probe AND b.vec_id <> p.q_id),
         |r AS (SELECT q_id, vec_id, cos,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk FROM c)
         |SELECT q_id, rk, vec_id, cos FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    "kmeans_assign" ->
      s"""WITH $kmeansCtes
         |SELECT vec_id, CAST(cluster AS BIGINT) AS cluster
         |FROM $kmeansFinalAssign ORDER BY vec_id""".stripMargin,
    // batch assignment over the union IS the streaming append's contract:
    // frozen centroids make per-batch argmin ≡ global argmin; increment
    // restates the replay's vec_id % N split
    "ann_ivf_append_streaming" ->
      s"""WITH $kmeansCtes
         |SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
         |  CAST(vec_id % ${graft.operators.Similarity.AppendIncrements} AS BIGINT)
         |    AS increment
         |FROM $kmeansFinalAssign ORDER BY vec_id""".stripMargin,
    "kmeans_assign_sampled" ->
      s"""WITH $kmeansCtesSampled
         |SELECT vec_id, CAST(cluster AS BIGINT) AS cluster
         |FROM $kmeansFinalAssign ORDER BY vec_id""".stripMargin,
    "contrastive_triplets" ->
      s"""WITH b AS (SELECT vec_id, label, embedding::DOUBLE[] AS vec,
         |  (${bucketSql("embedding::DOUBLE[]")}) AS bucket FROM embeddings),
         |q AS (SELECT vec_id AS q_id, label AS q_label, vec AS q_vec, bucket AS q_bucket
         |      FROM b WHERE vec_id % 100 = 0),
         |pc AS (SELECT q.q_id, b.vec_id, ${cosineSql("q.q_vec", "b.vec")} AS cos
         |       FROM b JOIN q ON b.label = q.q_label AND b.vec_id <> q.q_id),
         |pr AS (SELECT q_id, vec_id, cos,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk FROM pc),
         |p AS (SELECT q_id, vec_id AS pos_id, cos AS pos_cos FROM pr WHERE rk = 1),
         |nc AS (SELECT q.q_id, b.vec_id, ${cosineSql("q.q_vec", "b.vec")} AS cos
         |       FROM b JOIN q ON b.bucket = q.q_bucket AND b.label <> q.q_label),
         |nr AS (SELECT q_id, vec_id, cos,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk FROM nc),
         |n AS (SELECT q_id, vec_id AS neg_id, cos AS neg_cos FROM nr WHERE rk = 1)
         |SELECT p.q_id, pos_id, pos_cos, neg_id, neg_cos
         |FROM p JOIN n USING (q_id) ORDER BY q_id""".stripMargin,
    // per-label centroid = the kmeans recompute's fixed-point mean, keyed
    // by label; score = cosineSql's exact association
    "embedding_outliers" ->
      s"""WITH $kvLabelCte,
         |cm AS (
         | SELECT label, list(mean ORDER BY dim) AS cvec FROM (
         |   SELECT label, CAST(r.range AS INT) AS dim,
         |     CAST(CAST(sum(CAST(floor(vec[CAST(r.range AS INT)+1] * ${graft.operators.Similarity.KMeansQuantum}) AS BIGINT)) AS BIGINT) AS DOUBLE)/count(*)/${graft.operators.Similarity.KMeansQuantum} AS mean
         |   FROM kvl, range($KMeansDim) r GROUP BY 1, 2) GROUP BY 1),
         |s AS (SELECT k.vec_id, CAST(k.label AS BIGINT) AS label,
         |   ${cosineSql("k.vec", "c.cvec")} AS cos_c
         |  FROM kvl k JOIN cm c USING (label))
         |SELECT vec_id, label, cos_c, CAST(cos_c < 0.0 AS BIGINT) AS is_outlier
         |FROM s ORDER BY vec_id""".stripMargin,
    // exact integer row moments (round(x*2^20) — the float->double cast is
    // exact, the scaling is an exponent shift so the product is exact and
    // half-away rounding agrees); the variance numerator n*ss - s*s is
    // EXACT (HUGEINT here, DECIMAL(38,0) on the Spark side) and therefore
    // provably >= 0 — the double-rounded (ss - s^2/n)/n tree can land a
    // constant dimension at -epsilon, where sqrt ERRORS here and NaNs in
    // Spark; doubles only in the stated final divide/sqrt
    "embedding_dim_stats" ->
      s"""WITH $kvCte,
         |e AS (SELECT CAST(r.range AS BIGINT) AS dim,
         |        vec[CAST(r.range AS INT)+1] AS x
         |      FROM kv, range($KMeansDim) r),
         |q AS (SELECT dim, x, CAST(round(x * 1048576.0) AS BIGINT) AS q FROM e),
         |g AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
         |       CAST(sum(q) AS BIGINT) AS s, CAST(sum(q*q) AS BIGINT) AS ss,
         |       min(x) AS min_x, max(x) AS max_x
         |      FROM q GROUP BY 1)
         |SELECT dim, n,
         | CAST(s AS DOUBLE) / CAST(n * 1048576 AS DOUBLE) AS mean,
         | sqrt(CAST(CAST(CAST(n AS HUGEINT)*ss - CAST(s AS HUGEINT)*s
         |                AS VARCHAR) AS DOUBLE)
         |      / CAST(n * n AS DOUBLE)) / 1048576.0 AS std,
         | min_x, max_x
         |FROM g ORDER BY dim""".stripMargin,
    // the dimStats discipline extended to pairs: exact integer
    // cross-moments, covariance numerator in HUGEINT, doubles only in
    // the stated final trees; constant dims emit NULL corr on both sides
    "embedding_cov_matrix" ->
      s"""WITH $kvCte,
         |q AS (SELECT list_transform(vec,
         |        x -> CAST(round(x * 1048576.0) AS BIGINT)) AS qv FROM kv),
         |p AS (SELECT CAST(r1.range AS BIGINT) AS dim_i,
         |        CAST(r2.range AS BIGINT) AS dim_j,
         |        qv[CAST(r1.range AS INT)+1] AS qi,
         |        qv[CAST(r2.range AS INT)+1] AS qj
         |      FROM q, range($KMeansDim) r1, range($KMeansDim) r2
         |      WHERE r2.range >= r1.range),
         |g AS (SELECT dim_i, dim_j, CAST(count(*) AS BIGINT) AS n,
         |       CAST(sum(qi) AS BIGINT) AS si, CAST(sum(qj) AS BIGINT) AS sj,
         |       CAST(sum(qi*qj) AS BIGINT) AS sij
         |      FROM p GROUP BY 1, 2),
         |m AS (SELECT dim_i, dim_j, n,
         |       CAST(n AS HUGEINT)*sij - CAST(si AS HUGEINT)*sj AS num
         |      FROM g),
         |d AS (SELECT dim_i AS dim, num AS dnum FROM m WHERE dim_i = dim_j)
         |SELECT m.dim_i, m.dim_j, m.n,
         | ${dd("m.num")}
         |   / (CAST(m.n * 1048576 AS DOUBLE) * CAST(m.n * 1048576 AS DOUBLE))
         |   AS cov,
         | CASE WHEN di.dnum > 0 AND dj.dnum > 0 THEN
         |   ${dd("m.num")} / sqrt(${dd("di.dnum")} * ${dd("dj.dnum")})
         | END AS corr
         |FROM m JOIN d di ON m.dim_i = di.dim JOIN d dj ON m.dim_j = dj.dim
         |ORDER BY dim_i, dim_j""".stripMargin,
    // the corpus-wide stats join the deterministic sample; z is a two-op
    // tree over already-pinned mean/std doubles
    "embedding_standardize" ->
      s"""WITH $kvCte,
         |e AS (SELECT kv.vec_id, CAST(r.range AS BIGINT) AS dim,
         |        vec[CAST(r.range AS INT)+1] AS x
         |      FROM kv, range($KMeansDim) r),
         |q AS (SELECT dim, CAST(round(x * 1048576.0) AS BIGINT) AS q FROM e),
         |g AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
         |       CAST(sum(q) AS BIGINT) AS s, CAST(sum(q*q) AS BIGINT) AS ss
         |      FROM q GROUP BY 1),
         |st AS (SELECT dim,
         | CAST(s AS DOUBLE) / CAST(n * 1048576 AS DOUBLE) AS mean,
         | sqrt(CAST(CAST(CAST(n AS HUGEINT)*ss - CAST(s AS HUGEINT)*s
         |                AS VARCHAR) AS DOUBLE)
         |      / CAST(n * n AS DOUBLE)) / 1048576.0 AS std
         |FROM g)
         |SELECT e.vec_id, e.dim,
         | CASE WHEN std = 0 THEN 0.0 ELSE (x - mean) / std END AS z
         |FROM e JOIN st USING (dim)
         |WHERE e.vec_id % 50 = 0
         |ORDER BY vec_id, dim""".stripMargin,
    "zorder_zonemap" ->
      s"""WITH ev AS (SELECT user_id,
         |  CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hr FROM events),
         |st AS (SELECT min(user_id) AS min_u, max(user_id) AS max_u,
         |              min(hr) AS min_h, max(hr) AS max_h FROM ev),
         |n AS (SELECT ((user_id - min_u) * 65535) // greatest(max_u - min_u, 1) AS uq,
         |             ((hr - min_h) * 65535) // greatest(max_h - min_h, 1) AS hq
         |      FROM ev, st),
         |z0 AS (SELECT uq, hq, uq & 65535 AS ux, hq & 65535 AS hx FROM n),
         |z1 AS (SELECT uq, hq, (ux | (ux << 8)) & 16711935 AS ux, (hx | (hx << 8)) & 16711935 AS hx FROM z0),
         |z2 AS (SELECT uq, hq, (ux | (ux << 4)) & 252645135 AS ux, (hx | (hx << 4)) & 252645135 AS hx FROM z1),
         |z3 AS (SELECT uq, hq, (ux | (ux << 2)) & 858993459 AS ux, (hx | (hx << 2)) & 858993459 AS hx FROM z2),
         |z4 AS (SELECT uq, hq, (ux | (ux << 1)) & 1431655765 AS ux, (hx | (hx << 1)) & 1431655765 AS hx FROM z3),
         |z AS (SELECT uq, hq, ux | (hx << 1) AS zval FROM z4)
         |SELECT (zval >> 24) AS bucket, count(*) AS n_rows,
         |  min(uq) AS min_uq, max(uq) AS max_uq,
         |  min(hq) AS min_hq, max(hq) AS max_hq
         |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin,
    "ann_ivf_trained_topk" ->
      s"""WITH $kmeansCtes,
         |base AS (SELECT v.vec_id, v.vec, a.cluster
         |         FROM kv v JOIN $kmeansFinalAssign a USING (vec_id)),
         |q AS (SELECT vec_id AS q_id, vec AS q_vec, cluster AS q_cluster
         |      FROM base WHERE vec_id % 100 = 0),
         |c AS (
         | SELECT q.q_id, b.vec_id, ${cosineSql("q.q_vec", "b.vec")} AS cos
         | FROM base b JOIN q ON b.cluster = q.q_cluster AND b.vec_id <> q.q_id),
         |r AS (SELECT q_id, vec_id, cos,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk FROM c)
         |SELECT q_id, rk, vec_id, cos FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    "ann_ivf_trained_probe2" -> ivfTrainedProbeOracle(2),
    "ann_ivf_trained_probe4" -> ivfTrainedProbeOracle(4),
    "ann_ivf_topk" ->
      s"""WITH q AS (SELECT vec_id AS q_id, label AS q_label, embedding::DOUBLE[] AS q_vec
         |  FROM embeddings WHERE vec_id % 100 = 0),
         |c AS (
         | SELECT q.q_id, e.vec_id, ${cosineSql("q.q_vec", "e.embedding::DOUBLE[]")} AS cos
         | FROM embeddings e JOIN q ON e.label = q.q_label AND e.vec_id <> q.q_id),
         |r AS (SELECT q_id, vec_id, cos,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk FROM c)
         |SELECT q_id, rk, vec_id, cos FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    "cosine_near_dup" ->
      s"""WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |br AS (
         | ${(0 until 4).map(b =>
              s"SELECT vec_id, label, v, $b AS band_idx, (${nearDupBandSql("v", b)}) AS bkt FROM base")
              .mkString("\n | UNION ALL ")}),
         |cand AS (
         | SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ${cosineSql("a.v", "b.v")} AS cos
         | FROM br a JOIN br b ON a.label = b.label AND a.band_idx = b.band_idx
         |  AND a.bkt = b.bkt AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b, cos FROM cand
         |WHERE cos >= 0.4 ORDER BY id_a, id_b""".stripMargin,
    "semantic_near_dup" ->
      s"""WITH $kmeansCtesSampled,
         |nbase AS (SELECT v.vec_id, a.cluster, v.vec AS v
         |          FROM kv v JOIN $kmeansFinalAssign a USING (vec_id)),
         |br AS (
         | ${(0 until 4).map(b =>
              s"SELECT vec_id, cluster, v, $b AS band_idx, (${nearDupBandSql("v", b)}) AS bkt FROM nbase")
              .mkString("\n | UNION ALL ")}),
         |cand AS (
         | SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ${cosineSql("a.v", "b.v")} AS cos
         | FROM br a JOIN br b ON a.cluster = b.cluster AND a.band_idx = b.band_idx
         |  AND a.bkt = b.bkt AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b, cos FROM cand
         |WHERE cos >= 0.4 ORDER BY id_a, id_b""".stripMargin,
    "pq_codes" ->
      s"""WITH $pqCtes,
         |${pqCodesCte}
         |SELECT vec_id, ${(0 until PqM).map(j => s"code$j").mkString(", ")} FROM codes
         |ORDER BY vec_id""".stripMargin,
    "ann_pq_adc_topk" ->
      s"""WITH $pqCtes,
         |${pqCodesCte},
         |q AS (SELECT vec_id AS q_id, vec AS q_vec FROM kv WHERE vec_id % 100 = 0),
         |s AS (SELECT q.q_id, b.vec_id, $adcScoreSql AS score
         | FROM codes b, q, $adcCwTables
         | WHERE b.vec_id <> q.q_id AND $adcCwMatch),
         |r AS (SELECT q_id, vec_id, score,
         |  row_number() OVER (PARTITION BY q_id ORDER BY score ASC, vec_id ASC) AS rk FROM s)
         |SELECT q_id, rk, vec_id, score FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    "ann_ivfpq_topk" ->
      s"""WITH $kvCte,
         |$kmeansChain,
         |${pqChains()},
         |${pqCodesCte},
         |q AS (SELECT v.vec_id AS q_id, v.vec AS q_vec, a.cluster AS q_cluster
         |      FROM kv v JOIN $kmeansFinalAssign a USING (vec_id)
         |      WHERE v.vec_id % 100 = 0),
         |s AS (SELECT q.q_id, b.vec_id, $adcScoreSql AS score
         | FROM codes b JOIN $kmeansFinalAssign ce USING (vec_id), q, $adcCwTables
         | WHERE b.vec_id <> q.q_id AND ce.cluster = q.q_cluster AND $adcCwMatch),
         |r AS (SELECT q_id, vec_id, score,
         |  row_number() OVER (PARTITION BY q_id ORDER BY score ASC, vec_id ASC) AS rk FROM s)
         |SELECT q_id, rk, vec_id, score FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    // the refine step: the same ADC chain shortlists top-20, raw vectors
    // re-score the shortlist by exact cosine, top-5 of the exact order
    "ann_ivfpq_rerank" ->
      s"""WITH $kvCte,
         |$kmeansChain,
         |${pqChains()},
         |${pqCodesCte},
         |q AS (SELECT v.vec_id AS q_id, v.vec AS q_vec, a.cluster AS q_cluster
         |      FROM kv v JOIN $kmeansFinalAssign a USING (vec_id)
         |      WHERE v.vec_id % 100 = 0),
         |s AS (SELECT q.q_id, b.vec_id, $adcScoreSql AS score
         | FROM codes b JOIN $kmeansFinalAssign ce USING (vec_id), q, $adcCwTables
         | WHERE b.vec_id <> q.q_id AND ce.cluster = q.q_cluster AND $adcCwMatch),
         |r AS (SELECT q_id, vec_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY score ASC, vec_id ASC) AS rk FROM s),
         |sh AS (SELECT q_id, vec_id FROM r WHERE rk <= ${graft.operators.Similarity.RerankShortlist}),
         |x AS (SELECT sh.q_id, sh.vec_id, ${cosineSql("qv.vec", "v.vec")} AS cos
         |  FROM sh JOIN kv v ON v.vec_id = sh.vec_id JOIN kv qv ON qv.vec_id = sh.q_id),
         |r2 AS (SELECT q_id, vec_id, cos,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk FROM x)
         |SELECT q_id, rk, vec_id, cos FROM r2 WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    "ann_ivfpq_probe2" -> ivfPqProbeOracle(2),
    "ann_ivfpq_probe4" -> ivfPqProbeOracle(4),
    "ann_ivfpq_residual_topk" ->
      // identical search to ann_ivfpq_topk, but the PQ chains train over
      // the RESIDUAL view and queries score their own residual
      s"""WITH $kvCte,
         |$kmeansChain,
         |$residualCte,
         |${pqChains("kvr")},
         |${pqCodesCte},
         |q AS (SELECT vec_id AS q_id, vec AS q_vec, cluster AS q_cluster
         |      FROM kvr WHERE vec_id % 100 = 0),
         |s AS (SELECT q.q_id, b.vec_id, $adcScoreSql AS score
         | FROM codes b JOIN $kmeansFinalAssign ce USING (vec_id), q, $adcCwTables
         | WHERE b.vec_id <> q.q_id AND ce.cluster = q.q_cluster AND $adcCwMatch),
         |r AS (SELECT q_id, vec_id, score,
         |  row_number() OVER (PARTITION BY q_id ORDER BY score ASC, vec_id ASC) AS rk FROM s)
         |SELECT q_id, rk, vec_id, score FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    "q26_bi_nation_volume" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         | CAST(year(l_shipdate) AS BIGINT) AS l_year,
         | $revenueExpr AS revenue, count(*) AS n_rows
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         | JOIN customer ON o_custkey = c_custkey
         | JOIN supplier ON l_suppkey = s_suppkey
         | JOIN nation n1 ON s_nationkey = n1.n_nationkey
         | JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE n1.n_name <> n2.n_name
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q28_pricing_charge" ->
      s"""SELECT l_returnflag, l_linestatus,
         | ${dd("sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
               "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * " +
               "(CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2))))")} AS sum_charge,
         | count(*) AS count_order
         |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q27_shipping_priority" ->
      s"""SELECT l_orderkey, epoch_us(o_orderdate) AS o_date_us,
         | $revenueExpr AS revenue, count(*) AS n_rows
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         | JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         | AND o_orderdate < TIMESTAMP '1998-06-30'
         | AND l_shipdate > TIMESTAMP '1998-06-30'
         |GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q12_tumbling_hourly" ->
      s"""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start, event_type,
        | count(*) AS n_events,
        | ${dd("sum(CAST(value AS DECIMAL(18,2)))")} AS sum_value,
        | max(value) AS max_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,
    // spike test cross-multiplied to integers: no floats, order-free
    "q12a_hourly_anomaly" ->
      s"""WITH h AS (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
         |       event_type, CAST(count(*) AS BIGINT) AS cnt
         |      FROM events GROUP BY 1, 2),
         |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
         |       CAST(sum(cnt) AS BIGINT) AS sum_cnt,
         |       CAST(sum(cnt*cnt) AS BIGINT) AS sumsq_cnt
         |      FROM h GROUP BY 1)
         |SELECT h.event_type, h.hour_start, h.cnt AS n_events,
         | CAST(s.sum_cnt AS DOUBLE)/s.n_hours AS mean_cnt,
         | CAST((h.cnt*s.n_hours - s.sum_cnt)*(h.cnt*s.n_hours - s.sum_cnt)
         |       > 4*(s.n_hours*s.sumsq_cnt - s.sum_cnt*s.sum_cnt) AS BIGINT) AS is_spike
         |FROM h JOIN s USING (event_type) ORDER BY event_type, hour_start""".stripMargin,
    // dd-crossed window sum / window count, then one double subtraction —
    // association identical to the Spark side
    "seasonal_dow_residuals" ->
      s"""WITH d AS (SELECT event_type, (epoch_us(ts) // 86400000000) AS day,
         |        sum(CAST(value AS DECIMAL(18,2))) AS td
         |       FROM events GROUP BY 1, 2),
         |w AS (SELECT event_type, day, day % 7 AS dow, td,
         |       ${dd("sum(td) OVER (PARTITION BY event_type, day % 7)")}
         |         / count(*) OVER (PARTITION BY event_type, day % 7) AS dow_mean
         |      FROM d)
         |SELECT event_type, day, CAST(dow AS BIGINT) AS dow,
         | ${dd("td")} AS total, dow_mean,
         | ${dd("td")} - dow_mean AS residual
         |FROM w ORDER BY event_type, day""".stripMargin,
    // median/MAD outlier days: exact decimal daily totals cross to double
    // once; quantile_cont's interpolation is pinned to Spark `percentile`
    // by q33's gate; strict > on identically-derived doubles
    "mad_anomaly_daily" ->
      s"""WITH d AS (SELECT event_type, (epoch_us(ts) // 86400000000) AS day,
         |       ${dd("sum(CAST(value AS DECIMAL(18,2)))")} AS total
         |      FROM events GROUP BY 1, 2),
         |m AS (SELECT event_type, quantile_cont(total, 0.5) AS med FROM d GROUP BY 1),
         |v AS (SELECT d.event_type, d.day, d.total, m.med,
         |       abs(d.total - m.med) AS dev
         |      FROM d JOIN m USING (event_type)),
         |md AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM v GROUP BY 1)
         |SELECT v.event_type, v.day, v.total, v.med, md.mad, v.dev
         |FROM v JOIN md USING (event_type)
         |WHERE v.dev > 3.0 * md.mad
         |ORDER BY v.event_type, v.day""".stripMargin,
    // each event belongs to exactly 2 hopping windows: starts at the two
    // slide-aligned (30 min) boundaries covering it
    "q12w_sliding_halfhour" ->
      s"""WITH e AS (SELECT event_type, value,
        |        (epoch_us(ts) // 1800000000) * 1800 AS w0 FROM events),
        |x AS (SELECT event_type, value,
        |        unnest([w0, w0 - 1800]) AS win_start FROM e)
        |SELECT win_start, event_type, count(*) AS n_events,
        | ${dd("sum(CAST(value AS DECIMAL(18,2)))")} AS sum_value,
        | max(value) AS max_value
        |FROM x GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "q29_gapfill_locf" ->
      """WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hs,
        |        count(*) AS n, max(value) AS mx FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, min(hs) AS lo, max(hs) AS hi FROM h GROUP BY 1),
        |s AS (SELECT event_type, unnest(generate_series(lo, hi)) AS hs FROM b),
        |j AS (SELECT s.event_type, s.hs, coalesce(h.n, 0) AS n_events, h.mx
        |      FROM s LEFT JOIN h ON s.event_type = h.event_type AND s.hs = h.hs)
        |SELECT event_type, hs * 3600 AS hour_start, n_events,
        | last_value(mx IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hs
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_max
        |FROM j ORDER BY event_type, hour_start""".stripMargin,
    // decimal moments (exact, order-free) cast to double via the canonical
    // string round-trip; the closed-form finishers are the same IEEE
    // expressions Spark evaluates on bit-identical inputs
    "q30_regression_stats" ->
      s"""WITH m AS (SELECT event_type,
        |   CAST(count(*) AS BIGINT) AS n_rows,
        |   ${dd("sum(CAST(epoch_us(ts) // 3600000000 - 470000 AS DECIMAL(18,0)))")} AS st,
        |   ${dd("sum(CAST(value AS DECIMAL(18,2)))")} AS sv,
        |   ${dd("sum(CAST(CAST(epoch_us(ts) // 3600000000 - 470000 AS DECIMAL(18,0)) * CAST(epoch_us(ts) // 3600000000 - 470000 AS DECIMAL(18,0)) AS DECIMAL(30,0)))")} AS stt,
        |   ${dd("sum(CAST(CAST(epoch_us(ts) // 3600000000 - 470000 AS DECIMAL(18,0)) * CAST(value AS DECIMAL(18,2)) AS DECIMAL(30,2)))")} AS stv,
        |   ${dd("sum(CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) AS DECIMAL(30,4)))")} AS svv
        |  FROM events GROUP BY 1)
        |SELECT event_type, n_rows,
        | (n*stv - st*sv) / (n*stt - st*st) AS slope,
        | (sv - ((n*stv - st*sv) / (n*stt - st*st)) * st) / n AS intercept,
        | (n*stv - st*sv) / sqrt((n*stt - st*st) * (n*svv - sv*sv)) AS corr_tv,
        | sqrt((n*svv - sv*sv) / (n * (n - 1.0))) AS stddev_v
        |FROM (SELECT *, CAST(n_rows AS DOUBLE) AS n FROM m)
        |ORDER BY event_type""".stripMargin,
    // aligned hourly series (absent hours count 0) → exact decimal pair
    // moments → the same Pearson finisher expression as q30's
    "corr_matrix_hourly" ->
      s"""WITH h AS MATERIALIZED (SELECT event_type, epoch_us(ts) // 3600000000 AS hs,
        |        count(*) AS c FROM events GROUP BY 1, 2),
        |sp AS (SELECT DISTINCT hs FROM h),
        |ty AS (SELECT DISTINCT event_type FROM h),
        |d AS MATERIALIZED (SELECT ty.event_type, sp.hs,
        |       CAST(coalesce(h.c, 0) AS DECIMAL(18,0)) AS c
        |     FROM sp CROSS JOIN ty
        |     LEFT JOIN h ON h.event_type = ty.event_type AND h.hs = sp.hs),
        |m AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |        CAST(count(*) AS BIGINT) AS n_hours,
        |        ${dd("sum(a.c)")} AS sa, ${dd("sum(b.c)")} AS sb,
        |        ${dd("sum(CAST(a.c * b.c AS DECIMAL(30,0)))")} AS sab,
        |        ${dd("sum(CAST(a.c * a.c AS DECIMAL(30,0)))")} AS saa,
        |        ${dd("sum(CAST(b.c * b.c AS DECIMAL(30,0)))")} AS sbb
        |      FROM d a JOIN d b ON a.hs = b.hs AND a.event_type < b.event_type
        |      GROUP BY 1, 2)
        |SELECT type_a, type_b, n_hours,
        | CASE WHEN (n*saa - sa*sa) > 0 AND (n*sbb - sb*sb) > 0
        |      THEN (n*sab - sa*sb) / sqrt((n*saa - sa*sa) * (n*sbb - sb*sb)) END AS corr
        |FROM (SELECT *, CAST(n_hours AS DOUBLE) AS n FROM m)
        |ORDER BY type_a, type_b""".stripMargin,
    // per-cell expected counts from exact marginals; the table statistic
    // is the ordered left-to-right fold over (type, weekday)-sorted cells
    "chi2_type_weekday" ->
      """WITH c AS MATERIALIZED (SELECT event_type,
        |    (epoch_us(ts) // 86400000000) % 7 AS wd, count(*) AS obs
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, sum(obs) AS rt FROM c GROUP BY 1),
        |k AS (SELECT wd, sum(obs) AS ct FROM c GROUP BY 1),
        |t AS (SELECT sum(obs) AS nt FROM c),
        |x AS (SELECT c.event_type, c.wd, c.obs,
        |        CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) /
        |          CAST((SELECT nt FROM t) AS DOUBLE) AS exp
        |      FROM c JOIN r USING (event_type) JOIN k USING (wd)),
        |y AS MATERIALIZED (SELECT event_type, wd, obs, exp,
        |        (CAST(obs AS DOUBLE) - exp) * (CAST(obs AS DOUBLE) - exp) / exp
        |          AS contrib FROM x),
        |s AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list(contrib ORDER BY event_type, wd)), (a, b) -> a + b) AS chi2,
        |      CAST(((SELECT count(*) FROM r) - 1) *
        |           ((SELECT count(*) FROM k) - 1) AS BIGINT) AS dof FROM y)
        |SELECT y.event_type, y.wd, CAST(y.obs AS BIGINT) AS obs, y.exp,
        |       y.contrib, s.chi2, s.dof
        |FROM y CROSS JOIN s ORDER BY event_type, wd""".stripMargin,
    // chi2_type_weekday's discipline over the frequent vocabulary: dense
    // (token, half) cells (absent cells materialize obs = 0 — the sparse
    // join would drop exactly the most drifted cells), exact long
    // marginals, dof = tokens - 1. The statistic is the ORDER-FREE
    // integer-micro sum (floor(contrib*1e6) per cell, summed as exact
    // decimal — floor of the identical double is exact selection), so
    // neither engine folds a vocab-sized ordered list
    "vocab_drift_chi2" ->
      s"""WITH tk AS (SELECT doc_id % 2 AS half, unnest($tokenHashesSql) AS th
         |            FROM documents),
         |c0 AS (SELECT th, half, count(*) AS obs0 FROM tk GROUP BY 1, 2),
         |kp AS (SELECT th, sum(obs0) AS row_tot FROM c0 GROUP BY 1
         |       HAVING sum(obs0) >= ${graft.operators.TextOps.VocabDriftMinCount}),
         |h AS (SELECT unnest([0, 1]) AS half),
         |c AS MATERIALIZED (SELECT kp.th, h.half, kp.row_tot,
         |        coalesce(c0.obs0, 0) AS obs
         |      FROM kp CROSS JOIN h
         |      LEFT JOIN c0 ON c0.th = kp.th AND c0.half = h.half),
         |k AS (SELECT half, sum(obs) AS ct FROM c GROUP BY 1),
         |t AS (SELECT sum(obs) AS nt FROM c),
         |x AS (SELECT c.th, c.half, c.obs,
         |        CAST(c.row_tot AS DOUBLE) * CAST(ct AS DOUBLE) /
         |          CAST((SELECT nt FROM t) AS DOUBLE) AS exp
         |      FROM c JOIN k USING (half)),
         |y AS MATERIALIZED (SELECT th, half, obs, exp,
         |        (CAST(obs AS DOUBLE) - exp) * (CAST(obs AS DOUBLE) - exp) / exp
         |          AS contrib FROM x),
         |s AS (SELECT ${dd("sum(CAST(least(floor(contrib * 1000000.0), 1000000000000000.0) AS DECIMAL(38,0)))")}
         |        / 1000000.0 AS chi2,
         |      CAST((SELECT count(*) FROM kp) - 1 AS BIGINT) AS dof FROM y)
         |SELECT y.th, CAST(y.half AS BIGINT) AS half, CAST(y.obs AS BIGINT) AS obs,
         |       y.exp, y.contrib, s.chi2, s.dof
         |FROM y CROSS JOIN s ORDER BY th, half""".stripMargin,
    // basket pairs within an order (brand-bounded), support/confidence as
    // single divisions of exact counts; lift clears denominators first —
    // two exact BIGINT products, ONE division
    "assoc_rules_brands" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM b),
        |m AS (SELECT brand, count(*) AS n_brand FROM b GROUP BY brand),
        |p AS (SELECT x.brand AS brand_a, y.brand AS brand_b,
        |        count(*) AS n_pairs
        |      FROM b x JOIN b y USING (ok)
        |      WHERE x.brand <> y.brand
        |      GROUP BY 1, 2 HAVING count(*) >= 10)
        |SELECT brand_a, brand_b, n_pairs,
        | ma.n_brand AS n_a, mb.n_brand AS n_b,
        | CAST(n_pairs AS DOUBLE) / CAST(n_orders AS DOUBLE) AS support,
        | CAST(n_pairs AS DOUBLE) / CAST(ma.n_brand AS DOUBLE) AS confidence,
        | CAST(n_pairs * n_orders AS DOUBLE) /
        |   CAST(ma.n_brand * mb.n_brand AS DOUBLE) AS lift
        |FROM p
        |JOIN m ma ON p.brand_a = ma.brand
        |JOIN m mb ON p.brand_b = mb.brand
        |CROSS JOIN n ORDER BY brand_a, brand_b""".stripMargin,
    // digits from the exact integer cents' decimal string; expected counts
    // and chi2 contributions are fixed double trees over exact inputs with
    // the Benford probabilities stated as shortest-round-trip literals
    "benford_first_digit" ->
      s"""WITH d AS (SELECT CAST(substr(CAST(CAST(round(
         |    CAST(o_totalprice AS DOUBLE) * 100.0) AS BIGINT) AS VARCHAR),
         |    1, 1) AS BIGINT) AS digit FROM orders),
         |g AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY digit),
         |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM g),
         |e AS (SELECT digit, n_obs,
         |        CAST(n_total AS DOUBLE) * (CASE digit
         |          ${graft.operators.Analytics.BenfordP.zipWithIndex.map {
              case (pd, i) => s"WHEN ${i + 1} THEN $pd" }.mkString(" ")}
         |        END) AS expected
         |      FROM g CROSS JOIN t)
         |SELECT digit, n_obs, expected,
         | (CAST(n_obs AS DOUBLE) - expected) * (CAST(n_obs AS DOUBLE) - expected)
         |   / expected AS contribution
         |FROM e ORDER BY digit""".stripMargin,
    // top-k with a deterministic path tiebreak — the LIMIT is stable
    "user_paths_top" ->
      """WITH s AS (SELECT event_type AS a,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b,
        |  lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS c
        | FROM events)
        |SELECT a || '>' || b || '>' || c AS path, count(*) AS n
        |FROM s WHERE b IS NOT NULL AND c IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "markov_transitions" ->
      """WITH p AS (SELECT user_id, event_type AS from_type,
        |        lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |          AS to_type
        |      FROM events),
        |c AS (SELECT from_type, to_type, count(*) AS n FROM p
        |      WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        | CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin,
    // the ranking definition of bottom-k-by-hash; the Spark side uses the
    // bounded O(k)-state aggregator, so the gate proves buffer ≡ full sort
    "sample_bottomk" ->
      """WITH h AS (SELECT event_type, md5(CAST(event_id AS VARCHAR)) AS h, event_id
        |      FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY h, event_id)
        |        AS rn FROM h)
        |SELECT event_type, CAST(rn AS BIGINT) AS rn, event_id, h
        |FROM r WHERE rn <= 5 ORDER BY event_type, rn""".stripMargin,
    // strictly-preceding frame (ROWS ... 1 PRECEDING): a view tied on ts
    // but later by event_id does not attribute
    "attribution_last_touch" ->
      """WITH w AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |   max(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) OVER (
        |     PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lv
        |  FROM events)
        |SELECT event_id, user_id, us AS purchase_us,
        | CASE WHEN us - lv <= 86400000000 THEN lv END AS attributed_view_us
        |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    // every conversion splits exactly 1e6 micro-credits 40/20/40 over its
    // lookback views; middle share = 200000 // (n−2), remainder to the
    // LAST middle — identical integer div/mod on both engines
    "attribution_position_ushape" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |    epoch_us(ts) AS us FROM events),
        |p AS (SELECT user_id, event_id AS p_id, us AS p_us FROM ev
        |  WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, event_id AS v_id, us AS v_us FROM ev
        |  WHERE event_type = 'view'),
        |t AS (SELECT p.p_id, v.v_id, v.v_us
        |  FROM p JOIN v ON p.user_id = v.user_id
        |  WHERE (v.v_us < p.p_us OR (v.v_us = p.p_us AND v.v_id < p.p_id))
        |    AND p.p_us - v.v_us <= 86400000000),
        |r AS (SELECT p_id, v_id,
        |    CAST(row_number() OVER (PARTITION BY p_id ORDER BY v_us, v_id)
        |      AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY p_id) AS BIGINT) AS n
        |  FROM t),
        |cr AS (SELECT v_id,
        |    CASE WHEN n = 1 THEN 1000000
        |         WHEN n = 2 THEN 500000
        |         WHEN rn = 1 OR rn = n THEN 400000
        |         ELSE 200000 // (n - 2)
        |           + CASE WHEN rn = n - 1 THEN 200000 % (n - 2) ELSE 0 END
        |    END AS credit
        |  FROM r)
        |SELECT v_id AS event_id, CAST(count(*) AS BIGINT) AS n_conversions,
        |  CAST(sum(credit) AS BIGINT) AS credit_micro
        |FROM cr GROUP BY 1 ORDER BY event_id""".stripMargin,
    // each value holds until the type's next event; the last event carries
    // zero weight (no successor) — identical statement on both sides
    "twap_by_type" ->
      s"""WITH d AS (SELECT event_type, value, epoch_us(ts) AS us,
        |   lead(epoch_us(ts)) OVER (PARTITION BY event_type ORDER BY ts, event_id)
        |     - epoch_us(ts) AS dt
        |  FROM events)
        |SELECT event_type, CAST(sum(dt) AS BIGINT) AS total_dt_us,
        | ${dd("sum(CAST(CAST(value AS DECIMAL(18,2)) * CAST(dt AS DECIMAL(20,0)) AS DECIMAL(38,2)))")} AS sum_vdt,
        | ${dd("sum(CAST(CAST(value AS DECIMAL(18,2)) * CAST(dt AS DECIMAL(20,0)) AS DECIMAL(38,2)))")}
        |   / CAST(CAST(sum(dt) AS BIGINT) AS DOUBLE) AS twap
        |FROM d WHERE dt IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "union_schema_evolution" ->
      s"""SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END AS o_orderstatus,
        | count(*) AS n_orders,
        | ${dd("sum(CAST(o_totalprice AS DECIMAL(18,4)))")} AS total_price
        |FROM orders GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,
    // both engines interpolate lo + (hi-lo)*frac at rank p*(n-1) on the
    // same exact doubles — bit-identical (probed before registering)
    "q33_percentile_exact" ->
      """SELECT event_type, count(*) AS n,
        | quantile_cont(value, 0.5) AS p50,
        | quantile_cont(value, 0.95) AS p95,
        | quantile_cont(value, 0.99) AS p99
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    // the RECURSIVE CTE states the same integer-exact recurrence the
    // ordered fold computes: s' = max(0, s + v - 50), alarm+reset past 500
    "cusum_by_type" ->
      """WITH RECURSIVE o AS MATERIALIZED (
        |  SELECT event_type, event_id, CAST(value AS DECIMAL(18,2)) AS v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS i
        |  FROM events),
        |c AS (
        |  SELECT event_type, event_id, i,
        |    CAST(CASE WHEN greatest(CAST(0 AS DECIMAL(18,2)), v - 50) > 500
        |      THEN 0 ELSE greatest(CAST(0 AS DECIMAL(18,2)), v - 50) END
        |      AS DECIMAL(18,2)) AS s,
        |    CAST(CASE WHEN greatest(CAST(0 AS DECIMAL(18,2)), v - 50) > 500
        |      THEN 1 ELSE 0 END AS BIGINT) AS alarm
        |  FROM o WHERE i = 1
        |  UNION ALL
        |  SELECT o.event_type, o.event_id, o.i,
        |    CAST(CASE WHEN greatest(CAST(0 AS DECIMAL(18,2)), c.s + o.v - 50) > 500
        |      THEN 0 ELSE greatest(CAST(0 AS DECIMAL(18,2)), c.s + o.v - 50) END
        |      AS DECIMAL(18,2)),
        |    CAST(CASE WHEN greatest(CAST(0 AS DECIMAL(18,2)), c.s + o.v - 50) > 500
        |      THEN 1 ELSE 0 END AS BIGINT)
        |  FROM c JOIN o ON o.event_type = c.event_type AND o.i = c.i + 1)
        |SELECT event_id, event_type, CAST(s AS DOUBLE) AS cusum, alarm
        |FROM c ORDER BY event_id""".stripMargin,
    // identical IEEE op sequence on both engines (alpha 1/8 binary-exact,
    // op-by-op vectorized kernels — no FMA contraction): bit-equal hashes
    "ewma_by_type" ->
      """WITH RECURSIVE o AS MATERIALIZED (
        |  SELECT event_type, event_id, value AS v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS i
        |  FROM events),
        |c AS (
        |  SELECT event_type, event_id, i, v AS s FROM o WHERE i = 1
        |  UNION ALL
        |  SELECT o.event_type, o.event_id, o.i, c.s + 0.125 * (o.v - c.s)
        |  FROM c JOIN o ON o.event_type = c.event_type AND o.i = c.i + 1)
        |SELECT event_id, event_type, s AS ewma FROM c ORDER BY event_id""".stripMargin,
    // the coupled (level, trend) pair rides the recursion; the new level's
    // expression is inlined into the trend's (deterministic re-evaluation),
    // and both smoothing factors are binary-exact — EWMA's parity argument
    "holt_by_type" ->
      """WITH RECURSIVE o AS MATERIALIZED (
        |  SELECT event_type, event_id, value AS v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS i
        |  FROM events),
        |c AS (
        |  SELECT event_type, event_id, i, v AS l, CAST(0 AS DOUBLE) AS t
        |  FROM o WHERE i = 1
        |  UNION ALL
        |  SELECT o.event_type, o.event_id, o.i,
        |    0.25 * o.v + 0.75 * (c.l + c.t),
        |    0.125 * ((0.25 * o.v + 0.75 * (c.l + c.t)) - c.l) + 0.875 * c.t
        |  FROM c JOIN o ON o.event_type = c.event_type AND o.i = c.i + 1)
        |SELECT event_id, event_type, l AS level, t AS trend, l + t AS forecast
        |FROM c ORDER BY event_id""".stripMargin,
    // the same holt recursion carrying v; the one-step-ahead error is
    // lag(l + t) vs the row's actual, floor-quantized (micro / ppb)
    // BEFORE the exact long sums — floor is the same IEEE op on both
    // engines where round() and CAST(double AS BIGINT) are not
    "forecast_backtest_holt" ->
      """WITH RECURSIVE o AS MATERIALIZED (
        |  SELECT event_type, event_id, value AS v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS i
        |  FROM events),
        |c AS (
        |  SELECT event_type, event_id, i, v, v AS l, CAST(0 AS DOUBLE) AS t
        |  FROM o WHERE i = 1
        |  UNION ALL
        |  SELECT o.event_type, o.event_id, o.i, o.v,
        |    0.25 * o.v + 0.75 * (c.l + c.t),
        |    0.125 * ((0.25 * o.v + 0.75 * (c.l + c.t)) - c.l) + 0.875 * c.t
        |  FROM c JOIN o ON o.event_type = c.event_type AND o.i = c.i + 1),
        |b AS (SELECT event_type, i, v,
        |    lag(l + t) OVER (PARTITION BY event_type ORDER BY i) AS f
        |  FROM c),
        |s AS (SELECT event_type,
        |    CAST(floor(abs(v - f) * 1000000.0) AS BIGINT) AS ae_micro,
        |    CAST(CASE WHEN abs(v) + abs(f) = 0 THEN 0
        |      ELSE floor(2.0 * abs(v - f) / (abs(v) + abs(f)) * 1000000000.0)
        |      END AS BIGINT) AS sm_ppb
        |  FROM b WHERE f IS NOT NULL)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(ae_micro) AS BIGINT) AS sum_ae_micro,
        |  CAST(sum(sm_ppb) AS BIGINT) AS sum_smape_ppb,
        |  CAST(sum(ae_micro) AS DOUBLE) / 1000000.0
        |    / CAST(count(*) AS DOUBLE) AS mae,
        |  CAST(sum(sm_ppb) AS DOUBLE) / 1000000000.0
        |    / CAST(count(*) AS DOUBLE) AS smape
        |FROM s GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the triple-smoothing recursion carries the seasonal LIST through
    // the CTE (oldest first); L re-stated inline for t and s (the holt
    // precedent) — identical IEEE trees both sides; cold start L=x, T=0,
    // all-zero seasonal buffer
    "holt_winters_by_type" ->
      """WITH RECURSIVE o AS MATERIALIZED (
        |  SELECT event_type, event_id, value AS v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS i
        |  FROM events),
        |c AS (
        |  SELECT event_type, event_id, i, CAST(v AS DOUBLE) AS l,
        |    CAST(0 AS DOUBLE) AS t,
        |    [0.0,0.0,0.0,0.0,0.0,0.0,0.0,0.0]::DOUBLE[] AS s
        |  FROM o WHERE i = 1
        |  UNION ALL
        |  SELECT o.event_type, o.event_id, o.i,
        |    0.25 * (o.v - c.s[1]) + 0.75 * (c.l + c.t),
        |    0.125 * ((0.25 * (o.v - c.s[1]) + 0.75 * (c.l + c.t)) - c.l)
        |      + 0.875 * c.t,
        |    list_append(c.s[2:8],
        |      0.25 * (o.v - (0.25 * (o.v - c.s[1]) + 0.75 * (c.l + c.t)))
        |        + 0.75 * c.s[1])
        |  FROM c JOIN o ON o.event_type = c.event_type AND o.i = c.i + 1)
        |SELECT event_id, event_type, l AS level, t AS trend,
        |  s[8] AS seasonal, l + t + s[1] AS forecast
        |FROM c ORDER BY event_id""".stripMargin,
    // two stacked cumulative maxes + one subtraction: max picks an existing
    // double, the subtraction is a single correctly-rounded op — the same
    // window statement the Spark batch form executes (and the state the
    // streaming twin carries across batches)
    "drawdown_by_type" ->
      """WITH p AS (
        |  SELECT event_id, event_type, value,
        |    max(value) OVER (PARTITION BY event_type ORDER BY event_id
        |                     ROWS UNBOUNDED PRECEDING) AS peak
        |  FROM events),
        |d AS (SELECT event_id, event_type, peak, peak - value AS drawdown FROM p)
        |SELECT event_id, event_type, peak, drawdown,
        |  max(drawdown) OVER (PARTITION BY event_type ORDER BY event_id
        |                      ROWS UNBOUNDED PRECEDING) AS max_drawdown
        |FROM d ORDER BY event_id""".stripMargin,
    // the composed detector: exact decimal daily totals, the relative
    // residual's three-op tree with dow_mean's expression re-stated inline
    // (deterministic re-evaluation), one ×1e6 round to integer micros,
    // then the pure-integer CUSUM recurrence through the recursion
    "cusum_seasonal_residuals" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         |    sum(CAST(value AS DECIMAL(18,2))) AS td
         |  FROM events GROUP BY 1, 2),
         |m AS (SELECT event_type, day, td,
         |    sum(td) OVER (PARTITION BY event_type, day % 7) AS sdow,
         |    count(*) OVER (PARTITION BY event_type, day % 7) AS ndow
         |   FROM d),
         |r AS (SELECT event_type, day,
         |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
         |    CAST(round(((${dd("td")} - ${dd("sdow")}/ndow)
         |                / (${dd("sdow")}/ndow)) * 1000000.0) AS BIGINT) AS ru
         |   FROM m),
         |c AS (
         |  SELECT event_type, day, i, ru,
         |    CASE WHEN greatest(0, ru - ${StatefulQueries.SeasonalCusumSlackU})
         |              > ${StatefulQueries.SeasonalCusumAlarmU} THEN 0
         |         ELSE greatest(0, ru - ${StatefulQueries.SeasonalCusumSlackU})
         |    END AS s,
         |    CASE WHEN greatest(0, ru - ${StatefulQueries.SeasonalCusumSlackU})
         |              > ${StatefulQueries.SeasonalCusumAlarmU} THEN 1
         |         ELSE 0 END AS alarm
         |  FROM r WHERE i = 1
         |  UNION ALL
         |  SELECT r.event_type, r.day, r.i, r.ru,
         |    CASE WHEN greatest(0, c.s + r.ru - ${StatefulQueries.SeasonalCusumSlackU})
         |              > ${StatefulQueries.SeasonalCusumAlarmU} THEN 0
         |         ELSE greatest(0, c.s + r.ru - ${StatefulQueries.SeasonalCusumSlackU})
         |    END,
         |    CASE WHEN greatest(0, c.s + r.ru - ${StatefulQueries.SeasonalCusumSlackU})
         |              > ${StatefulQueries.SeasonalCusumAlarmU} THEN 1
         |         ELSE 0 END
         |  FROM c JOIN r ON r.event_type = c.event_type AND r.i = c.i + 1)
         |SELECT event_type, day, ru, CAST(s AS BIGINT) AS cusum_u,
         | CAST(alarm AS BIGINT) AS alarm
         |FROM c ORDER BY event_type, day""".stripMargin,
    // Wilder RSI with the binary-exact 15/16-1/16 coefficients: the seed
    // step joins rows i=1,2 (first diff seeds the averages), the recursive
    // step re-evaluates the gain/loss CASE inline (the holt deterministic-
    // re-evaluation precedent); flat-tape RSI is pinned to 50
    "rsi_by_type" ->
      """WITH RECURSIVE o AS MATERIALIZED (
        |  SELECT event_type, event_id, value AS v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS i
        |  FROM events),
        |c AS (
        |  SELECT o2.event_type, o2.event_id, o2.i, o2.v,
        |    CASE WHEN o2.v - o1.v > 0 THEN o2.v - o1.v ELSE 0.0 END AS ag,
        |    CASE WHEN o2.v - o1.v < 0 THEN -(o2.v - o1.v) ELSE 0.0 END AS al
        |  FROM o o1 JOIN o o2
        |    ON o2.event_type = o1.event_type AND o1.i = 1 AND o2.i = 2
        |  UNION ALL
        |  SELECT o.event_type, o.event_id, o.i, o.v,
        |    0.9375 * c.ag + 0.0625 *
        |      (CASE WHEN o.v - c.v > 0 THEN o.v - c.v ELSE 0.0 END),
        |    0.9375 * c.al + 0.0625 *
        |      (CASE WHEN o.v - c.v < 0 THEN -(o.v - c.v) ELSE 0.0 END)
        |  FROM c JOIN o ON o.event_type = c.event_type AND o.i = c.i + 1)
        |SELECT event_id, event_type, ag AS avg_gain, al AS avg_loss,
        |  CASE WHEN ag + al = 0 THEN 50.0
        |       ELSE least(100.0, (100.0 * ag) / (ag + al)) END AS rsi
        |FROM c ORDER BY event_id""".stripMargin,
    // three coupled EMAs ride the recursion as (emaf, emas, sig); the
    // signal's update inlines the new fast/slow expressions (deterministic
    // re-evaluation); macd/histogram are re-derived in the final SELECT
    // exactly as the fold computes them
    "macd_by_type" ->
      """WITH RECURSIVE o AS MATERIALIZED (
        |  SELECT event_type, event_id, value AS v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS i
        |  FROM events),
        |c AS (
        |  SELECT event_type, event_id, i, v AS emaf, v AS emas,
        |    CAST(0 AS DOUBLE) AS sig
        |  FROM o WHERE i = 1
        |  UNION ALL
        |  SELECT o.event_type, o.event_id, o.i,
        |    0.75 * c.emaf + 0.25 * o.v,
        |    0.9375 * c.emas + 0.0625 * o.v,
        |    0.875 * c.sig + 0.125 *
        |      ((0.75 * c.emaf + 0.25 * o.v) - (0.9375 * c.emas + 0.0625 * o.v))
        |  FROM c JOIN o ON o.event_type = c.event_type AND o.i = c.i + 1)
        |SELECT event_id, event_type, emaf - emas AS macd, sig AS signal_line,
        |  (emaf - emas) - sig AS histogram
        |FROM c ORDER BY event_id""".stripMargin,
    // element selection only: arg_min/arg_max on the unique tape-ordered
    // event_id (the Spark side's min_by/max_by key), extrema, count
    "ohlc_hourly" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
        | event_type,
        | arg_min(value, event_id) AS open,
        | max(value) AS high,
        | min(value) AS low,
        | arg_max(value, event_id) AS close,
        | count(*) AS n_events
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,
    // deterministic synthetic volume (event_id % 97 + 1) stated on both
    // sides; the weighted sum is exact decimal, the one double op is the
    // final division (dd() varchar round-trip for the decimal crossing)
    "vwap_hourly" ->
      s"""WITH v AS (SELECT ts, event_type,
         |  CAST(event_id % 97 + 1 AS DECIMAL(3,0)) AS vol,
         |  CAST(value AS DECIMAL(18,2)) AS p FROM events)
         |SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
         | event_type, count(*) AS n_events,
         | CAST(sum(vol) AS BIGINT) AS sum_vol,
         | ${dd("sum(p * vol)")} / CAST(CAST(sum(vol) AS BIGINT) AS DOUBLE) AS vwap
         |FROM v GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,
    // exact integer-cents frame moments (benford's round(value*100)
    // parity); double finishers in the stated association: mean = s/(100n),
    // sd = sqrt(num/n^2)/100, band = mean +/- 2*sd
    "bollinger_by_type" ->
      """WITH b AS (
        |  SELECT event_id, event_type,
        |    CAST(round(CAST(value AS DOUBLE) * 100.0) AS BIGINT) AS vc
        |  FROM events),
        |w AS (
        |  SELECT event_id, event_type,
        |    count(*) OVER f AS n_win,
        |    CAST(sum(vc) OVER f AS BIGINT) AS s,
        |    CAST(sum(vc * vc) OVER f AS BIGINT) AS ss
        |  FROM b
        |  WINDOW f AS (PARTITION BY event_type ORDER BY event_id
        |               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
        |m AS (
        |  SELECT event_id, event_type, n_win,
        |    CAST(s AS DOUBLE) / CAST(n_win * 100 AS DOUBLE) AS mean,
        |    sqrt(CAST(n_win * ss - s * s AS DOUBLE)
        |         / CAST(n_win * n_win AS DOUBLE)) / 100.0 AS sd
        |  FROM w)
        |SELECT event_id, event_type, n_win, mean, sd,
        |  mean + 2.0 * sd AS upper, mean - 2.0 * sd AS lower
        |FROM m ORDER BY event_id""".stripMargin,
    // Wilder true range in exact integer cents (lag = selection, TR =
    // max/abs of exact longs); the trailing-14-bar mean is the ONE double
    // op, stated in the identical sum/(100*n) association on both sides
    "atr_hourly_by_type" ->
      """WITH b AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
        |    event_type,
        |    CAST(round(CAST(max(value) AS DOUBLE) * 100.0) AS BIGINT) AS hc,
        |    CAST(round(CAST(min(value) AS DOUBLE) * 100.0) AS BIGINT) AS lc,
        |    CAST(round(CAST(arg_max(value, event_id) AS DOUBLE) * 100.0) AS BIGINT) AS cc
        |  FROM events GROUP BY 1, 2),
        |l AS (
        |  SELECT hour_start, event_type, hc, lc,
        |    lag(cc) OVER (PARTITION BY event_type ORDER BY hour_start) AS pc
        |  FROM b),
        |t AS (
        |  SELECT hour_start, event_type,
        |    CASE WHEN pc IS NULL THEN hc - lc
        |         ELSE greatest(hc - lc, abs(hc - pc), abs(lc - pc)) END AS tr_cents
        |  FROM l)
        |SELECT hour_start, event_type, CAST(tr_cents AS BIGINT) AS tr_cents,
        |  CAST(count(*) OVER f AS BIGINT) AS n_win,
        |  CAST(sum(tr_cents) OVER f AS DOUBLE)
        |    / CAST(count(*) OVER f * 100 AS DOUBLE) AS atr
        |FROM t
        |WINDOW f AS (PARTITION BY event_type ORDER BY hour_start
        |             ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, hour_start""".stripMargin,
    // all-integer signed cumulative volume: exact cents comparison picks
    // the sign, the running sum is an exact BIGINT fold — no floats
    "obv_by_type" ->
      """WITH v AS (
        |  SELECT event_id, event_type,
        |    CAST(round(CAST(value AS DOUBLE) * 100.0) AS BIGINT) AS vc,
        |    CAST(event_id % 97 + 1 AS BIGINT) AS vol
        |  FROM events),
        |l AS (
        |  SELECT event_id, event_type, vc, vol,
        |    lag(vc) OVER (PARTITION BY event_type ORDER BY event_id) AS pvc
        |  FROM v),
        |s AS (
        |  SELECT event_id, event_type, vol,
        |    CASE WHEN pvc IS NULL THEN 0
        |         WHEN vc > pvc THEN 1
        |         WHEN vc < pvc THEN -1 ELSE 0 END AS sgn
        |  FROM l)
        |SELECT event_id, event_type, vol, CAST(sgn AS BIGINT) AS sgn,
        |  CAST(sum(sgn * vol) OVER (PARTITION BY event_type ORDER BY event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS obv
        |FROM s ORDER BY event_id""".stripMargin,
    // frame extrema are element selection; the %K score is the identical
    // fixed 4-op double tree both engines evaluate; flat frame pins 50
    "stoch_osc_by_type" ->
      """WITH w AS (
        |  SELECT event_id, event_type, value,
        |    min(value) OVER f AS low_n,
        |    max(value) OVER f AS high_n
        |  FROM events
        |  WINDOW f AS (PARTITION BY event_type ORDER BY event_id
        |               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT event_id, event_type, low_n, high_n,
        |  CASE WHEN high_n = low_n THEN 50.0
        |       ELSE least(100.0, (100.0 * (value - low_n)) / (high_n - low_n))
        |  END AS pct_k
        |FROM w ORDER BY event_id""".stripMargin,
    // exact long moments cast to double once, then the identical IEEE
    // finisher tree both sides (corr_matrix's discipline); lag alignment
    // via lead() over the type's hour-ordered bucket sequence
    "acf_by_type" ->
      """WITH h AS (SELECT event_type, (epoch_us(ts) // 3600000000) AS hs,
        |        count(*) AS c
        |       FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, c,
        |       lead(c, 1) OVER (PARTITION BY event_type ORDER BY hs) AS l1,
        |       lead(c, 2) OVER (PARTITION BY event_type ORDER BY hs) AS l2,
        |       lead(c, 3) OVER (PARTITION BY event_type ORDER BY hs) AS l3
        |      FROM h),
        |m AS (SELECT event_type, count(*) AS n_hours,
        |       CAST(sum(c) AS DOUBLE) AS s, CAST(sum(c*c) AS DOUBLE) AS q,
        |       CAST(sum(c*l1) AS DOUBLE) AS p1,
        |       CAST(sum(CASE WHEN l1 IS NOT NULL THEN c END) AS DOUBLE) AS a1,
        |       CAST(sum(l1) AS DOUBLE) AS b1,
        |       CAST(sum(c*l2) AS DOUBLE) AS p2,
        |       CAST(sum(CASE WHEN l2 IS NOT NULL THEN c END) AS DOUBLE) AS a2,
        |       CAST(sum(l2) AS DOUBLE) AS b2,
        |       CAST(sum(c*l3) AS DOUBLE) AS p3,
        |       CAST(sum(CASE WHEN l3 IS NOT NULL THEN c END) AS DOUBLE) AS a3,
        |       CAST(sum(l3) AS DOUBLE) AS b3
        |      FROM l GROUP BY 1),
        |n AS (SELECT event_type, n_hours, CAST(n_hours AS DOUBLE) AS nd,
        |       s, q, p1, a1, b1, p2, a2, b2, p3, a3, b3 FROM m)
        |SELECT event_type, n_hours,
        | CASE WHEN nd*nd*q - nd*s*s <> 0.0 THEN
        |   (nd*nd*p1 - nd*s*(a1+b1) + (nd-1.0)*s*s) / (nd*nd*q - nd*s*s) END AS acf_lag1,
        | CASE WHEN nd*nd*q - nd*s*s <> 0.0 THEN
        |   (nd*nd*p2 - nd*s*(a2+b2) + (nd-2.0)*s*s) / (nd*nd*q - nd*s*s) END AS acf_lag2,
        | CASE WHEN nd*nd*q - nd*s*s <> 0.0 THEN
        |   (nd*nd*p3 - nd*s*(a3+b3) + (nd-3.0)*s*s) / (nd*nd*q - nd*s*s) END AS acf_lag3
        |FROM n ORDER BY event_type""".stripMargin,
    // the observe accumulators must equal what a plain aggregate computes
    "dq_observe" ->
      """SELECT count(*) AS n_rows,
        | CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative,
        | count(user_id) AS n_user_nonnull,
        | min(value) AS min_value, max(value) AS max_value
        |FROM events""".stripMargin,
    // the same four min-plus relaxations, unrolled; explicit null-safe min
    // (engines differ on least() null handling)
    "bfs_hops" ->
      """WITH half AS MATERIALIZED (SELECT DISTINCT c.c_nationkey AS x, s.s_nationkey AS y
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey),
        |e AS MATERIALIZED (SELECT x, y FROM half UNION SELECT y, x FROM half),
        |nd AS MATERIALIZED (SELECT n_nationkey AS node FROM nation),
        |d0 AS MATERIALIZED (SELECT node, CASE WHEN node = 0 THEN 0 END AS h FROM nd),
        |c1 AS MATERIALIZED (SELECT e.y AS node, min(d0.h + 1) AS nh FROM e
        |       JOIN d0 ON e.x = d0.node WHERE d0.h IS NOT NULL GROUP BY 1),
        |d1 AS MATERIALIZED (SELECT nd.node, CASE WHEN d0.h IS NULL THEN c1.nh
        |         WHEN c1.nh IS NULL THEN d0.h
        |         WHEN c1.nh < d0.h THEN c1.nh ELSE d0.h END AS h
        |       FROM nd JOIN d0 USING (node) LEFT JOIN c1 USING (node)),
        |c2 AS MATERIALIZED (SELECT e.y AS node, min(d1.h + 1) AS nh FROM e
        |       JOIN d1 ON e.x = d1.node WHERE d1.h IS NOT NULL GROUP BY 1),
        |d2 AS MATERIALIZED (SELECT nd.node, CASE WHEN d1.h IS NULL THEN c2.nh
        |         WHEN c2.nh IS NULL THEN d1.h
        |         WHEN c2.nh < d1.h THEN c2.nh ELSE d1.h END AS h
        |       FROM nd JOIN d1 USING (node) LEFT JOIN c2 USING (node)),
        |c3 AS MATERIALIZED (SELECT e.y AS node, min(d2.h + 1) AS nh FROM e
        |       JOIN d2 ON e.x = d2.node WHERE d2.h IS NOT NULL GROUP BY 1),
        |d3 AS MATERIALIZED (SELECT nd.node, CASE WHEN d2.h IS NULL THEN c3.nh
        |         WHEN c3.nh IS NULL THEN d2.h
        |         WHEN c3.nh < d2.h THEN c3.nh ELSE d2.h END AS h
        |       FROM nd JOIN d2 USING (node) LEFT JOIN c3 USING (node)),
        |c4 AS MATERIALIZED (SELECT e.y AS node, min(d3.h + 1) AS nh FROM e
        |       JOIN d3 ON e.x = d3.node WHERE d3.h IS NOT NULL GROUP BY 1),
        |d4 AS MATERIALIZED (SELECT nd.node, CASE WHEN d3.h IS NULL THEN c4.nh
        |         WHEN c4.nh IS NULL THEN d3.h
        |         WHEN c4.nh < d3.h THEN c4.nh ELSE d3.h END AS h
        |       FROM nd JOIN d3 USING (node) LEFT JOIN c4 USING (node))
        |SELECT node AS nation_key, CAST(coalesce(h, -1) AS BIGINT) AS hops
        |FROM d4 ORDER BY nation_key""".stripMargin,
    // the oracle states the naive canonical-edge (u<v) 3-way join; the
    // Spark side reaches the same count through oriented wedges
    "triangle_count" ->
      """WITH t AS MATERIALIZED (SELECT DISTINCT least(c.c_nationkey, s.s_nationkey) AS u,
        |    greatest(c.c_nationkey, s.s_nationkey) AS v
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey)
        |SELECT (SELECT count(*) FROM t a
        |        JOIN t b ON a.v = b.u
        |        JOIN t c2 ON c2.u = a.u AND c2.v = b.v) AS n_triangles,
        |       (SELECT count(*) FROM t) AS n_edges""".stripMargin,
    // the oracle states the naive canonical 3-way join over the same
    // minute-bucket co-occurrence edges; the Spark side reaches the count
    // through degree-oriented wedges
    "triangle_count_users" ->
      """WITH b AS MATERIALIZED (SELECT DISTINCT user_id AS uid,
        |    epoch_us(ts) // 60000000 AS w FROM events),
        |t AS MATERIALIZED (SELECT DISTINCT l.uid AS u, r.uid AS v
        |  FROM b l JOIN b r USING (w) WHERE l.uid < r.uid)
        |SELECT (SELECT count(*) FROM t a
        |        JOIN t b2 ON a.v = b2.u
        |        JOIN t c2 ON c2.u = a.u AND c2.v = b2.v) AS n_triangles,
        |       (SELECT count(*) FROM t) AS n_edges""".stripMargin,
    // both wedge counts stated as closed forms over the degree tables:
    // naive = sum d(d-1)/2 (what a neighbor-pair enumeration joins),
    // oriented = sum indeg*outdeg over the (degree,id)-oriented edges
    // (the exact row count of the wedge join triangle_count executes)
    "graph_wedge_stats" ->
      """WITH b AS MATERIALIZED (SELECT DISTINCT user_id AS uid,
        |    epoch_us(ts) // 60000000 AS w FROM events),
        |e AS MATERIALIZED (SELECT DISTINCT l.uid AS u, r.uid AS v
        |  FROM b l JOIN b r USING (w) WHERE l.uid < r.uid),
        |deg AS MATERIALIZED (SELECT n, count(*) AS d FROM
        |  (SELECT u AS n FROM e UNION ALL SELECT v FROM e) un GROUP BY 1),
        |dir AS MATERIALIZED (SELECT
        |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
        |         THEN e.u ELSE e.v END AS a,
        |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
        |         THEN e.v ELSE e.u END AS bn
        |  FROM e JOIN deg du ON e.u = du.n JOIN deg dv ON e.v = dv.n),
        |od AS (SELECT a AS m, count(*) AS outd FROM dir GROUP BY 1),
        |idg AS (SELECT bn AS m, count(*) AS ind FROM dir GROUP BY 1)
        |SELECT (SELECT count(*) FROM deg) AS n_nodes,
        |       (SELECT count(*) FROM e) AS n_edges,
        |       (SELECT CAST(sum((d * (d - 1)) // 2) AS BIGINT) FROM deg)
        |         AS wedges_naive,
        |       (SELECT CAST(sum(ind * outd) AS BIGINT)
        |        FROM od JOIN idg USING (m)) AS wedges_oriented""".stripMargin,
    "bfs_hops_users" -> bfsUsersOracle(6),
    "closeness_landmarks_users" -> closenessUsersOracle(3, 6),
    "cc_users" -> ccUsersOracle(8),
    // same unrolled integer-ppb iterations as pagerank_nations, over the
    // symmetrized user co-occurrence edges
    "pagerank_users" ->
      """WITH b AS MATERIALIZED (SELECT DISTINCT user_id AS uid,
        |    epoch_us(ts) // 60000000 AS w FROM events),
        |ce AS MATERIALIZED (SELECT DISTINCT l.uid AS u, r.uid AS v
        |  FROM b l JOIN b r USING (w) WHERE l.uid < r.uid),
        |e AS MATERIALIZED (SELECT u AS src, v AS dst FROM ce
        |  UNION ALL SELECT v, u FROM ce),
        |d AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
        |nd AS (SELECT DISTINCT user_id AS node FROM events),
        |nn AS (SELECT count(*) AS n FROM nd),
        |r0 AS (SELECT node, 1000000000 // (SELECT n FROM nn) AS r FROM nd),
        |i1 AS (SELECT e.dst AS node, sum(r0.r // d.deg) AS inc
        |       FROM e JOIN r0 ON e.src = r0.node JOIN d ON e.src = d.src GROUP BY 1),
        |r1 AS (SELECT nd.node,
        |         (150000000 // (SELECT n FROM nn)) + coalesce(i1.inc, 0) * 85 // 100 AS r
        |       FROM nd LEFT JOIN i1 ON nd.node = i1.node),
        |i2 AS (SELECT e.dst AS node, sum(r1.r // d.deg) AS inc
        |       FROM e JOIN r1 ON e.src = r1.node JOIN d ON e.src = d.src GROUP BY 1),
        |r2 AS (SELECT nd.node,
        |         (150000000 // (SELECT n FROM nn)) + coalesce(i2.inc, 0) * 85 // 100 AS r
        |       FROM nd LEFT JOIN i2 ON nd.node = i2.node),
        |i3 AS (SELECT e.dst AS node, sum(r2.r // d.deg) AS inc
        |       FROM e JOIN r2 ON e.src = r2.node JOIN d ON e.src = d.src GROUP BY 1),
        |r3 AS (SELECT nd.node,
        |         (150000000 // (SELECT n FROM nn)) + coalesce(i3.inc, 0) * 85 // 100 AS r
        |       FROM nd LEFT JOIN i3 ON nd.node = i3.node)
        |SELECT node AS user_id, CAST(r AS BIGINT) AS rank_ppb
        |FROM r3 ORDER BY user_id""".stripMargin,
    // quartile scores tie-break on user_id so ntile is deterministic;
    // recency ranks DESC (most recent scores 4)
    "rfm_segments" ->
      s"""WITH a AS (SELECT user_id, max(epoch_us(ts)) AS last_us, count(*) AS f,
        |   sum(CAST(value AS DECIMAL(18,2))) AS m FROM events GROUP BY 1),
        |x AS (SELECT max(epoch_us(ts)) AS corpus_us FROM events),
        |b AS (SELECT user_id, (corpus_us - last_us) // 86400000000 AS r_days, f, m
        |      FROM a CROSS JOIN x)
        |SELECT user_id, r_days, f, ${dd("m")} AS m,
        | CAST(ntile(4) OVER (ORDER BY r_days DESC, user_id) AS BIGINT) AS r_score,
        | CAST(ntile(4) OVER (ORDER BY f, user_id) AS BIGINT) AS f_score,
        | CAST(ntile(4) OVER (ORDER BY m, user_id) AS BIGINT) AS m_score
        |FROM b ORDER BY user_id""".stripMargin,
    // boundary-semantics scores from quantile_disc cutpoints: at these user
    // counts Spark's percentile_approx GK sketch (accuracy 10000) is
    // lossless and equals quantile_disc element-for-element; recency in
    // hours (days collapse to 0 here) and scored DESC (most recent = 4)
    "rfm_segments_approx" ->
      s"""WITH a AS (SELECT user_id, max(epoch_us(ts)) AS last_us, count(*) AS f,
        |   sum(CAST(value AS DECIMAL(18,2))) AS m FROM events GROUP BY 1),
        |x AS (SELECT max(last_us) AS corpus_us FROM a),
        |base AS (SELECT user_id, (corpus_us - last_us) // 3600000000 AS r_hours,
        |         f, ${dd("m")} AS m FROM a CROSS JOIN x),
        |c AS (SELECT
        |  quantile_disc(r_hours, 0.25) AS r1, quantile_disc(r_hours, 0.5) AS r2,
        |  quantile_disc(r_hours, 0.75) AS r3,
        |  quantile_disc(f, 0.25) AS f1, quantile_disc(f, 0.5) AS f2,
        |  quantile_disc(f, 0.75) AS f3,
        |  quantile_disc(m, 0.25) AS m1, quantile_disc(m, 0.5) AS m2,
        |  quantile_disc(m, 0.75) AS m3 FROM base)
        |SELECT user_id, r_hours, f, m,
        | CAST(4 - (r_hours > r1)::INT - (r_hours > r2)::INT
        |        - (r_hours > r3)::INT AS BIGINT) AS r_score,
        | CAST(1 + (f > f1)::INT + (f > f2)::INT + (f > f3)::INT AS BIGINT)
        |   AS f_score,
        | CAST(1 + (m > m1)::INT + (m > m2)::INT + (m > m3)::INT AS BIGINT)
        |   AS m_score
        |FROM base CROSS JOIN c ORDER BY user_id""".stripMargin,
    // integer-ppb ranks make every iteration exact: `//` is floor division
    // == Spark's `div` on the non-negative ranks/degrees here
    "pagerank_nations" ->
      """WITH e AS (SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
        |      FROM lineitem l
        |      JOIN orders o ON l.l_orderkey = o.o_orderkey
        |      JOIN customer c ON o.o_custkey = c.c_custkey
        |      JOIN supplier s ON l.l_suppkey = s.s_suppkey),
        |d AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
        |nd AS (SELECT n_nationkey AS node FROM nation),
        |nn AS (SELECT count(*) AS n FROM nd),
        |r0 AS (SELECT node, 1000000000 // (SELECT n FROM nn) AS r FROM nd),
        |i1 AS (SELECT e.dst AS node, sum(r0.r // d.deg) AS inc
        |       FROM e JOIN r0 ON e.src = r0.node JOIN d ON e.src = d.src GROUP BY 1),
        |r1 AS (SELECT nd.node,
        |         (150000000 // (SELECT n FROM nn)) + coalesce(i1.inc, 0) * 85 // 100 AS r
        |       FROM nd LEFT JOIN i1 ON nd.node = i1.node),
        |i2 AS (SELECT e.dst AS node, sum(r1.r // d.deg) AS inc
        |       FROM e JOIN r1 ON e.src = r1.node JOIN d ON e.src = d.src GROUP BY 1),
        |r2 AS (SELECT nd.node,
        |         (150000000 // (SELECT n FROM nn)) + coalesce(i2.inc, 0) * 85 // 100 AS r
        |       FROM nd LEFT JOIN i2 ON nd.node = i2.node),
        |i3 AS (SELECT e.dst AS node, sum(r2.r // d.deg) AS inc
        |       FROM e JOIN r2 ON e.src = r2.node JOIN d ON e.src = d.src GROUP BY 1),
        |r3 AS (SELECT nd.node,
        |         (150000000 // (SELECT n FROM nn)) + coalesce(i3.inc, 0) * 85 // 100 AS r
        |       FROM nd LEFT JOIN i3 ON nd.node = i3.node)
        |SELECT node AS nation_key, CAST(r AS BIGINT) AS rank_ppb
        |FROM r3 ORDER BY nation_key""".stripMargin,
    // the oracle states the QUADRATIC definition; the Spark side must reach
    // the same pair set through signature-bucket candidates only
    "fuzzy_join_editdist1" ->
      """SELECT a.s_suppkey AS a_key, b.s_suppkey AS b_key,
        | CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS dist
        |FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
        |WHERE levenshtein(a.s_name, b.s_name) <= 1
        |ORDER BY a_key, b_key""".stripMargin,
    // observability for the fuzzy-join bucket cap: the oracle restates the
    // deletion-neighborhood signature explode and the same 2+/cap rollup;
    // the cap is interpolated from the ONE engine constant (r17 advice —
    // a literal here was an avoidable drift point across four CASEs)
    "fuzzy_bucket_stats" ->
      s"""WITH sigs AS (
        |  SELECT s_suppkey,
        |    unnest(list_distinct(list_append(
        |      list_transform(range(0, length(s_name)),
        |        i -> concat(substring(s_name, 1, i), substring(s_name, i + 2))),
        |      s_name))) AS sig
        |  FROM supplier),
        |b AS (SELECT sig, count(*) AS freq FROM sigs GROUP BY sig
        |      HAVING count(*) >= 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_candidate_buckets,
        |  CAST(coalesce(max(freq), 0) AS BIGINT) AS max_bucket,
        |  CAST(coalesce(sum(CASE WHEN freq > $fuzzyBucketCap THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS n_dropped_buckets,
        |  CAST(coalesce(sum(CASE WHEN freq > $fuzzyBucketCap THEN freq ELSE 0 END), 0)
        |    AS BIGINT) AS n_dropped_memberships
        |FROM b""".stripMargin,
    // the same rollup over the ER input (collapsed distinct part names) —
    // the cap's headroom observable for every gated fuzzyPairsOf consumer
    "fuzzy_bucket_stats_parts" ->
      s"""WITH names AS (SELECT p_name AS nm,
        |    CAST(min(p_partkey) AS BIGINT) AS nid FROM part GROUP BY 1),
        |sigs AS (
        |  SELECT nid,
        |    unnest(list_distinct(list_append(
        |      list_transform(range(0, length(nm)),
        |        i -> concat(substring(nm, 1, i), substring(nm, i + 2))),
        |      nm))) AS sig
        |  FROM names),
        |b AS (SELECT sig, count(*) AS freq FROM sigs GROUP BY sig
        |      HAVING count(*) >= 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_candidate_buckets,
        |  CAST(coalesce(max(freq), 0) AS BIGINT) AS max_bucket,
        |  CAST(coalesce(sum(CASE WHEN freq > $fuzzyBucketCap THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS n_dropped_buckets,
        |  CAST(coalesce(sum(CASE WHEN freq > $fuzzyBucketCap THEN freq ELSE 0 END), 0)
        |    AS BIGINT) AS n_dropped_memberships
        |FROM b""".stripMargin,
    "cohort_retention" ->
      """WITH e AS (SELECT user_id, (epoch_us(ts) // 604800000000) AS week FROM events),
        |f AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY 1),
        |d AS (SELECT DISTINCT f.cohort_week, e.week - f.cohort_week AS week_offset,
        |        e.user_id
        |      FROM e JOIN f USING (user_id))
        |SELECT cohort_week, week_offset, count(*) AS n_active_users
        |FROM d GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,
    // the oracle states the textbook day-interval join; the Spark plan
    // reaches the same counts by forward-contribution explode (linear)
    "dau_rolling_7d" ->
      """WITH p AS MATERIALIZED (SELECT DISTINCT user_id,
        |    (epoch_us(ts) // 86400000000) AS day FROM events),
        |d AS (SELECT DISTINCT day FROM p),
        |r1 AS (SELECT day, count(*) AS dau FROM p GROUP BY 1),
        |r7 AS (SELECT d.day, count(DISTINCT p.user_id) AS dau_7d
        |       FROM d JOIN p ON p.day BETWEEN d.day - 6 AND d.day
        |       GROUP BY 1)
        |SELECT r1.day, r1.dau, r7.dau_7d
        |FROM r1 JOIN r7 USING (day) ORDER BY day""".stripMargin,
    // greedy earliest chain; missing earlier step nulls every later one
    "funnel_steps" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |a AS (SELECT user_id, min(CASE WHEN event_type = 'view' THEN us END) AS t1
        |      FROM e GROUP BY 1),
        |b AS (SELECT e.user_id, min(e.us) AS t2
        |      FROM e JOIN a USING (user_id)
        |      WHERE e.event_type = 'click' AND e.us >= a.t1
        |        AND e.us <= a.t1 + 3600000000 GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.us) AS t3
        |      FROM e JOIN b USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.us >= b.t2
        |        AND e.us <= b.t2 + 86400000000 GROUP BY 1)
        |SELECT u.user_id, a.t1 AS view_us, b.t2 AS click_us, c.t3 AS purchase_us,
        | CASE WHEN a.t1 IS NULL THEN 0 WHEN b.t2 IS NULL THEN 1
        |      WHEN c.t3 IS NULL THEN 2 ELSE 3 END AS steps
        |FROM (SELECT DISTINCT user_id FROM e) u
        |LEFT JOIN a USING (user_id) LEFT JOIN b USING (user_id)
        |LEFT JOIN c USING (user_id) ORDER BY u.user_id""".stripMargin,
    "q13_sessionize" ->
      """WITH t AS (
        | SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    > 3600000000 THEN 1 ELSE 0 END AS new_sess
        | FROM events),
        |s AS (
        | SELECT user_id, ts_us,
        |  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        | FROM t)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
        | min(ts_us) AS start_us, max(ts_us) AS end_us
        |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
    // q13's session chain extended one level: per-user lag over the
    // session table; integer µs until the one mean division
    "session_return_gaps" ->
      """WITH t AS (
        | SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    > 3600000000 THEN 1 ELSE 0 END AS new_sess
        | FROM events),
        |s AS (
        | SELECT user_id, ts_us,
        |  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        | FROM t),
        |sess AS (SELECT user_id, session_id, min(ts_us) AS start_us, max(ts_us) AS end_us
        |         FROM s GROUP BY user_id, session_id),
        |g AS (SELECT user_id, start_us,
        |       lag(end_us) OVER (PARTITION BY user_id ORDER BY session_id) AS prev_end
        |      FROM sess)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
        | CAST(count(prev_end) AS BIGINT) AS n_gaps,
        | CAST(min(start_us - prev_end) AS BIGINT) AS min_gap_us,
        | CAST(max(start_us - prev_end) AS BIGINT) AS max_gap_us,
        | CAST(sum(start_us - prev_end) AS DOUBLE)/count(prev_end) AS mean_gap_us
        |FROM g GROUP BY 1 HAVING count(prev_end) > 0 ORDER BY user_id""".stripMargin,
    "q14_asof_prior_signup" ->
      """SELECT event_id, user_id,
        | max(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prior_signup_us
        |FROM events ORDER BY event_id""".stripMargin,
    "q14t_asof_tolerance" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS us,
        | max(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pr
        |FROM events)
        |SELECT event_id, user_id,
        | CASE WHEN us - pr <= 604800000000 THEN pr END AS prior_signup_us,
        | CASE WHEN us - pr <= 604800000000 THEN us - pr END AS staleness_us
        |FROM p ORDER BY event_id""".stripMargin,
    // nearest either direction in (ts, id) order; integer µs distances;
    // ties to the PRIOR — stated identically on both sides
    "q14n_asof_nearest" ->
      """WITH d AS (SELECT event_id, user_id, epoch_us(ts) AS us,
        | max(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pr,
        | min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nx
        |FROM events)
        |SELECT event_id, user_id,
        | CASE WHEN pr IS NULL AND nx IS NULL THEN NULL
        |   WHEN nx IS NULL OR (pr IS NOT NULL AND us - pr <= nx - us)
        |   THEN pr ELSE nx END AS nearest_signup_us,
        | CASE WHEN pr IS NULL AND nx IS NULL THEN NULL
        |   WHEN nx IS NULL OR (pr IS NOT NULL AND us - pr <= nx - us)
        |   THEN us - pr ELSE nx - us END AS dist_us,
        | CASE WHEN pr IS NULL AND nx IS NULL THEN NULL
        |   WHEN nx IS NULL OR (pr IS NOT NULL AND us - pr <= nx - us)
        |   THEN 'prior' ELSE 'next' END AS direction
        |FROM d ORDER BY event_id""".stripMargin,
    // islands over the SCD2 chain: tier-change marker -> running sum;
    // compacted valid_to = next island's valid_from via lead()
    "scd2_compact_tiers" ->
      """WITH iv AS (SELECT user_id, event_id, value, epoch_us(ts) AS us
        |  FROM events),
        |s AS (SELECT user_id, event_id, us AS valid_from_us,
        |    CAST(round(value * 100) AS BIGINT) // 10000 AS tier
        |  FROM iv),
        |m AS (SELECT user_id, event_id, valid_from_us, tier,
        |    CASE WHEN lag(tier) OVER w IS NULL
        |           OR tier <> lag(tier) OVER w THEN 1 ELSE 0 END AS chg
        |  FROM s
        |  WINDOW w AS (PARTITION BY user_id ORDER BY valid_from_us, event_id)),
        |g AS (SELECT user_id, valid_from_us, tier,
        |    CAST(sum(chg) OVER (PARTITION BY user_id
        |      ORDER BY valid_from_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS grp
        |  FROM m),
        |isl AS (SELECT user_id, grp, CAST(min(tier) AS BIGINT) AS tier,
        |    min(valid_from_us) AS valid_from_us,
        |    CAST(count(*) AS BIGINT) AS n_merged
        |  FROM g GROUP BY 1, 2)
        |SELECT user_id, tier, valid_from_us,
        |  lead(valid_from_us) OVER (PARTITION BY user_id
        |    ORDER BY valid_from_us) AS valid_to_us,
        |  n_merged
        |FROM isl ORDER BY user_id, valid_from_us""".stripMargin,
    "q15_brand_set_ops" ->
      """(SELECT DISTINCT p_brand FROM part WHERE p_size >= 40
        | INTERSECT
        | SELECT DISTINCT p_brand FROM part WHERE p_retailprice < 1200.0)
        |UNION
        |(SELECT DISTINCT p_brand FROM part WHERE p_retailprice >= 1800.0
        | EXCEPT
        | SELECT DISTINCT p_brand FROM part WHERE p_size >= 40)
        |ORDER BY p_brand""".stripMargin,
    "q20_salted_revenue" ->
      s"""SELECT l_returnflag, $revenueExpr AS revenue, count(*) AS n_rows
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q22_above_avg_orders" ->
      s"""WITH a AS (
        | SELECT o_custkey AS ac_custkey,
        |  ${dd("sum(CAST(o_totalprice AS DECIMAL(18,4)))")}/count(*) AS avg_price
        | FROM orders GROUP BY o_custkey)
        |SELECT o_orderkey, o_custkey, o_totalprice, avg_price
        |FROM orders JOIN a ON o_custkey = ac_custkey
        |WHERE o_totalprice > avg_price ORDER BY o_orderkey""".stripMargin,
    "dq_report" ->
      """WITH s AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_keys,
        |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS distinct_keys,
        |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price FROM orders)
        |SELECT * FROM (
        | SELECT 'row_count_positive' AS "check", CAST(n_rows AS DOUBLE) AS metric,
        |   0.0 AS threshold, CAST(n_rows > 0 AS BIGINT) AS pass FROM s
        | UNION ALL SELECT 'key_never_null', CAST(null_keys AS DOUBLE), 0.0,
        |   CAST(null_keys = 0 AS BIGINT) FROM s
        | UNION ALL SELECT 'key_unique', CAST(distinct_keys AS DOUBLE), 0.0,
        |   CAST(distinct_keys = n_rows AS BIGINT) FROM s
        | UNION ALL SELECT 'price_non_negative', min_price, 0.0,
        |   CAST(min_price >= 0.0 AS BIGINT) FROM s
        | UNION ALL SELECT 'price_below_cap', max_price, 1000000.0,
        |   CAST(max_price <= 1000000.0 AS BIGINT) FROM s
        |) ORDER BY "check"""".stripMargin,
    "scd2_user_values" ->
      """SELECT user_id, event_id, value, epoch_us(ts) AS valid_from_us,
        | lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |   AS valid_to_us
        |FROM events ORDER BY user_id, valid_from_us, event_id""".stripMargin,
    // interval membership at the data-derived midpoint: pure integer
    // comparisons, exactly one surviving interval per active user
    "scd2_asof_snapshot" ->
      """WITH s AS (SELECT user_id, event_id, value,
        |  epoch_us(ts) AS valid_from_us,
        |  lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id) AS valid_to_us
        | FROM events),
        |c AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS cut_us
        |      FROM events)
        |SELECT user_id, event_id, value, valid_from_us, cut_us
        |FROM s CROSS JOIN c
        |WHERE valid_from_us <= cut_us
        |  AND (valid_to_us IS NULL OR valid_to_us > cut_us)
        |ORDER BY user_id""".stripMargin,
    // exact decimal running shares; class bounds cross-multiplied (no
    // float thresholds); the share is the only float
    "pareto_parts_abc" ->
      s"""WITH r AS (SELECT l_partkey, sum($decPrice * ($one - $decDisc)) AS rev
         |           FROM lineitem GROUP BY 1),
         |c AS (SELECT l_partkey, rev,
         |       sum(rev) OVER (ORDER BY rev DESC, l_partkey
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |       sum(rev) OVER () AS tot
         |      FROM r)
         |SELECT l_partkey,
         | ${dd("rev")} AS revenue,
         | ${dd("cum")} / ${dd("tot")} AS cum_share,
         | CASE WHEN cum*5 <= tot*4 THEN 'A'
         |      WHEN cum*20 <= tot*19 THEN 'B' ELSE 'C' END AS abc
         |FROM c ORDER BY revenue DESC, l_partkey""".stripMargin,
    // day numbers are positive, so // (floor) here and `div` (truncate)
    // on the Spark side agree; the DIFFERENCE may be negative — dividing
    // the raw microsecond difference would diverge between the engines
    "q36_ship_latency" ->
      """WITH j AS (SELECT o.o_orderpriority,
        |        (epoch_us(date_trunc('day', l.l_shipdate)) // 86400000000)
        |      - (epoch_us(date_trunc('day', o.o_orderdate)) // 86400000000) AS lat_days
        |       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        | quantile_cont(lat_days, 0.5) AS p50_days,
        | quantile_cont(lat_days, 0.95) AS p95_days,
        | CAST(sum(lat_days) AS DOUBLE)/count(*) AS mean_days
        |FROM j GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    "q35_custdist" ->
      """WITH oc AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
        |            FROM orders GROUP BY 1),
        |cc AS (SELECT coalesce(oc.n_orders, 0) AS c_count
        |       FROM customer c LEFT JOIN oc ON c.c_custkey = oc.o_custkey)
        |SELECT CAST(c_count AS BIGINT) AS c_count,
        | CAST(count(*) AS BIGINT) AS custdist
        |FROM cc GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // max-equality on the EXACT decimal revenue (a double crossing could
    // merge revenues differing below double resolution); ties surface
    "q37_top_supplier" ->
      s"""WITH r AS (SELECT l_suppkey, sum($decPrice * ($one - $decDisc)) AS rev
         |           FROM lineitem GROUP BY 1),
         |m AS (SELECT max(rev) AS mx FROM r)
         |SELECT s_suppkey, s_name, ${dd("rev")} AS total_rev
         |FROM r JOIN m ON rev = mx
         |JOIN supplier ON l_suppkey = s_suppkey
         |ORDER BY s_suppkey""".stripMargin,
    // share membership decided by the CROSS-MULTIPLIED exact decimal test
    // (value*25 > total, the above-uniform-share cut over 25 brands — the
    // pareto boundary discipline); the reported share is display-only double
    "q38_important_brands" ->
      s"""WITH v AS (SELECT p_brand,
         |        sum($decPrice * CAST(l_quantity AS DECIMAL(18,4))) AS value
         |       FROM lineitem JOIN part ON l_partkey = p_partkey
         |       GROUP BY 1),
         |t AS (SELECT sum(value) AS total FROM v)
         |SELECT p_brand, ${dd("value")} AS value,
         | ${dd("value")} / ${dd("total")} AS share
         |FROM v CROSS JOIN t WHERE value * 25 > total
         |ORDER BY p_brand""".stripMargin,
    // the HAVING prunes at the orderkey aggregate before the joins
    "q39_large_volume_orders" ->
      """WITH q AS (SELECT l_orderkey,
        |        sum(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty
        |       FROM lineitem GROUP BY 1 HAVING sum_qty > 250)
        |SELECT o_orderkey, c_custkey, c_name, o_orderdate, o_totalprice,
        | CAST(CAST(sum_qty AS VARCHAR) AS DOUBLE) AS sum_qty
        |FROM q JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q40_exists_not_exists" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l JOIN part p
        |               ON l.l_partkey = p.p_partkey
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND p.p_brand = 'Brand#11')
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l JOIN part p
        |               ON l.l_partkey = p.p_partkey
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND p.p_brand = 'Brand#22')
        |ORDER BY o_orderkey""".stripMargin,
    // Wilson algebra stated with the identical association as the Spark
    // expression tree — every op a single correctly-rounded IEEE op
    "conversion_rate_wilson" ->
      """WITH d AS (SELECT (epoch_us(ts) // 86400000000) AS day,
        |        CAST(count(*) AS BIGINT) AS n_events,
        |        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |             AS BIGINT) AS n_purchases
        |       FROM events GROUP BY 1),
        |w AS (SELECT day, n_events, n_purchases,
        |       CAST(n_events AS DOUBLE) AS n,
        |       CAST(n_purchases AS DOUBLE) / CAST(n_events AS DOUBLE) AS p
        |      FROM d)
        |SELECT day, n_events, n_purchases, p,
        | ((p + 2.0 / n) / (1.0 + 4.0 / n))
        |   - (2.0 * sqrt(p * (1.0 - p) / n + 1.0 / (n * n)) / (1.0 + 4.0 / n)) AS lo,
        | ((p + 2.0 / n) / (1.0 + 4.0 / n))
        |   + (2.0 * sqrt(p * (1.0 - p) / n + 1.0 / (n * n)) / (1.0 + 4.0 / n)) AS hi
        |FROM w ORDER BY day""".stripMargin,
    // disjoint bands tiling [0, inf): n_rows sums to the lineitem count
    "q34_band_join" ->
      s"""WITH bands(band_id, band, lo, hi) AS (VALUES
         |  (0, 'micro', 0.0, 2000.0), (1, 'small', 2000.0, 15000.0),
         |  (2, 'mid', 15000.0, 40000.0), (3, 'large', 40000.0, 75000.0),
         |  (4, 'jumbo', 75000.0, 1.7976931348623157e308))
         |SELECT CAST(band_id AS BIGINT) AS band_id, band,
         | CAST(count(*) AS BIGINT) AS n_rows,
         | ${dd("sum(CAST(l_extendedprice AS DECIMAL(18,4)))")} AS sum_price
         |FROM lineitem JOIN bands
         |  ON l_extendedprice >= lo AND l_extendedprice < hi
         |GROUP BY 1, 2 ORDER BY band_id""".stripMargin,
    "q23_interval_join" ->
      """SELECT a.user_id, count(*) AS n_pairs
        |FROM events a JOIN events b ON a.user_id = b.user_id
        | AND b.event_id > a.event_id
        | AND epoch_us(b.ts) - epoch_us(a.ts) <= 300000000
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,
    // the textbook decorrelated EXISTS: distinct matched a-rows, then the
    // per-user count — q23's predicate set verbatim
    "q23sj_interval_join_semi" ->
      """WITH m AS (SELECT DISTINCT a.user_id, a.event_id
        |  FROM events a JOIN events b ON a.user_id = b.user_id
        |   AND b.event_id > a.event_id
        |   AND epoch_us(b.ts) - epoch_us(a.ts) <= 300000000)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_matched
        |FROM m GROUP BY 1 ORDER BY user_id""".stripMargin,
    // the id-identified firsts: per-user event_id order coincides with
    // (ts, id) order, so min(event_id) over the following frame IS the
    // first following purchase/error and the no-error test is tie-free
    "cep_funnel_followedby" ->
      """WITH seq AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
        |    min(CASE WHEN event_type='purchase' THEN event_id END) OVER w AS np_id,
        |    min(CASE WHEN event_type='purchase' THEN epoch_us(ts) END) OVER w AS np_us,
        |    min(CASE WHEN event_type='error' THEN event_id END) OVER w AS ne_id
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |SELECT user_id, event_id, us AS view_us, np_us AS purchase_us
        |FROM seq
        |WHERE event_type='view' AND np_id IS NOT NULL
        |  AND np_us - us <= 3600000000
        |  AND (ne_id IS NULL OR ne_id > np_id)
        |ORDER BY event_id""".stripMargin,
    // strict contiguity: the lead() pair over ALL events — the very next
    // row must be the purchase, any intervening event breaks the match
    "cep_next_match" ->
      """WITH seq AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
        |    lead(event_type) OVER w AS nx_typ,
        |    lead(epoch_us(ts)) OVER w AS nx_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
        |SELECT user_id, event_id, us AS view_us, nx_us AS purchase_us
        |FROM seq
        |WHERE event_type = 'view' AND nx_typ = 'purchase'
        |  AND nx_us - us <= 3600000000
        |ORDER BY event_id""".stripMargin,
    // the times quantifier: burst completion is the ROW-sequential
    // lag(n-1)-within-window rule over views (what a record-by-record NFA
    // evaluates); the first strictly-following purchase completes it
    "cep_times_burst" ->
      """WITH a AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |    min(CASE WHEN event_type='purchase' THEN epoch_us(ts) END)
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS np_us
        |  FROM events),
        |v AS (
        |  SELECT user_id, event_id, us, np_us,
        |    lag(us, 2) OVER (PARTITION BY user_id
        |                     ORDER BY us, event_id) AS bstart
        |  FROM a WHERE event_type = 'view')
        |SELECT user_id, event_id, bstart AS burst_start_us,
        |       us AS view_us, np_us AS purchase_us
        |FROM v
        |WHERE bstart IS NOT NULL AND us - bstart <= 86400000000
        |  AND np_us IS NOT NULL AND np_us - us <= 86400000000
        |ORDER BY event_id""".stripMargin,
    // the absence complement of the same window firsts: no purchase
    // inside the horizon (null or beyond); deadline = view + horizon
    "cep_absence_alert" ->
      """WITH seq AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
        |    min(CASE WHEN event_type='purchase' THEN epoch_us(ts) END) OVER w AS np_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |SELECT user_id, event_id, us AS view_us,
        |       us + 3600000000 AS deadline_us
        |FROM seq
        |WHERE event_type='view'
        |  AND (np_us IS NULL OR np_us - us > 3600000000)
        |ORDER BY event_id""".stripMargin,
    // integer-cents closes; SMA comparison cross-multiplied so the cross
    // predicate is exact bigint on both engines; rows before both frames
    // fill (rn <= 16) excluded on both sides
    "signal_sma_cross" ->
      """WITH bars AS (
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
        |    CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, hour_start,
        |    row_number() OVER wn AS rn,
        |    sum(c) OVER (wn ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) * 16
        |      - sum(c) OVER (wn ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) * 4
        |      AS d
        |  FROM bars
        |  WINDOW wn AS (PARTITION BY event_type ORDER BY hour_start)),
        |x AS (
        |  SELECT event_type, hour_start, rn, d,
        |    lag(d) OVER (PARTITION BY event_type ORDER BY hour_start) AS d_prev
        |  FROM s)
        |SELECT event_type, hour_start,
        |  CASE WHEN d > 0 THEN 'golden' ELSE 'death' END AS signal
        |FROM x
        |WHERE rn > 16 AND ((d > 0 AND d_prev <= 0) OR (d < 0 AND d_prev >= 0))
        |ORDER BY hour_start, event_type""".stripMargin,
    // full outer with q23's predicate set: pairs + both padding sides
    "q23fo_interval_join_full_outer" ->
      """SELECT coalesce(a.user_id, b.user_id) AS user_id,
        | count(CASE WHEN a.event_id IS NOT NULL AND b.event_id IS NOT NULL
        |            THEN 1 END) AS n_pairs,
        | count(CASE WHEN a.event_id IS NOT NULL AND b.event_id IS NULL
        |            THEN 1 END) AS n_run_tails,
        | count(CASE WHEN a.event_id IS NULL THEN 1 END) AS n_run_heads
        |FROM events a FULL JOIN events b ON a.user_id = b.user_id
        | AND b.event_id > a.event_id
        | AND epoch_us(b.ts) - epoch_us(a.ts) <= 300000000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the feed re-derived from raw events under the median-split batch
    // rule: batch-0 intervals all 'insert'; batch 1 contributes its own
    // lead() intervals as 'insert' plus a 'close' for each open batch-0
    // interval of a touched user (terminated at the user's first
    // in-batch change) — the engine computes the same rows as a journal
    // VERSION DIFF, so this gate proves diff ≡ derivation
    "scd2_cdc_feed" ->
      """WITH ev AS (SELECT user_id, event_id, value, epoch_us(ts) AS us
        |            FROM events),
        |mid AS (SELECT max(event_id)//2 AS m FROM ev),
        |b0 AS (SELECT * FROM ev WHERE event_id <= (SELECT m FROM mid)),
        |b1 AS (SELECT * FROM ev WHERE event_id > (SELECT m FROM mid)),
        |v0 AS (SELECT user_id, event_id, value, us AS valid_from_us,
        |        lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |          AS valid_to_us FROM b0),
        |first1 AS (SELECT user_id, min(us) AS b_first_us FROM b1 GROUP BY 1),
        |closes AS (SELECT 'close' AS op, v0.user_id, v0.event_id, v0.value,
        |            v0.valid_from_us, f.b_first_us AS valid_to_us
        |           FROM v0 JOIN first1 f ON v0.user_id = f.user_id
        |           WHERE v0.valid_to_us IS NULL),
        |ins0 AS (SELECT 'insert' AS op, user_id, event_id, value,
        |          valid_from_us, valid_to_us FROM v0),
        |ins1 AS (SELECT 'insert' AS op, user_id, event_id, value,
        |          us AS valid_from_us,
        |          lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |            AS valid_to_us FROM b1)
        |SELECT * FROM closes UNION ALL SELECT * FROM ins0
        |UNION ALL SELECT * FROM ins1
        |ORDER BY event_id, op""".stripMargin,
    // the identical Knuth-hash sign matrix and quantized integer sums;
    // DuckDB lists are 1-based where Spark arrays are 0-based, hence the
    // qv[i+1] shift on this side only
    "embedding_jl_projection" ->
      """WITH kv AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
        |q AS (SELECT vec_id,
        |        list_transform(vec, x -> CAST(round(x * 1048576) AS BIGINT)) AS qv
        |      FROM kv),
        |p AS (SELECT vec_id,
        |        list_transform(range(16), j ->
        |          list_reduce(list_transform(range(64), i ->
        |            (CASE WHEN ((i * 16 + j) * 2654435761) % 4294967296
        |                       // 65536 % 2 = 0
        |                  THEN 1 ELSE -1 END) * qv[i + 1]),
        |            (a, b) -> a + b)) AS y
        |      FROM q),
        |e AS (SELECT vec_id, CAST(r.range AS BIGINT) AS dim,
        |        y[CAST(r.range AS INT) + 1] AS yq
        |      FROM p, range(16) r)
        |SELECT vec_id, dim, CAST(yq AS BIGINT) AS yq,
        |       CAST(yq AS DOUBLE) / 1048576.0 AS y
        |FROM e ORDER BY vec_id, dim""".stripMargin,
    // arm counts off one user aggregate; the z tree is stated with the
    // identical association as the Spark side
    "ab_test_ztest" ->
      """WITH u AS (
        |  SELECT user_id % 2 AS arm,
        |    CASE WHEN count(CASE WHEN event_type = 'purchase' THEN 1 END) * 5
        |              > count(*) THEN 1 ELSE 0 END AS conv
        |  FROM events GROUP BY user_id),
        |a AS (SELECT
        |  CAST(count(CASE WHEN arm = 0 THEN 1 END) AS BIGINT) AS n0,
        |  CAST(sum(CASE WHEN arm = 0 THEN conv END) AS BIGINT) AS c0,
        |  CAST(count(CASE WHEN arm = 1 THEN 1 END) AS BIGINT) AS n1,
        |  CAST(sum(CASE WHEN arm = 1 THEN conv END) AS BIGINT) AS c1
        |  FROM u)
        |SELECT n0, c0, n1, c1,
        |  CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
        |  CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
        |  CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |    - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS lift,
        |  (CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)
        |    - CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |  / sqrt((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
        |         * (1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
        |         * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))) AS z
        |FROM a""".stripMargin,
    // right-censoring at horizon-90d; hazard increments ppb-quantized (r16,
    // was ppm) so the cumulative hazard is an exact integer running sum
    "survival_nelson_aalen" ->
      """WITH s AS (SELECT o_custkey,
        |    min(epoch_us(date_trunc('day', o_orderdate)) // 86400000000) AS fst,
        |    max(epoch_us(date_trunc('day', o_orderdate)) // 86400000000) AS lst
        |  FROM orders GROUP BY o_custkey),
        |h AS (SELECT max(lst) AS hz FROM s),
        |lt AS (SELECT lst - fst AS t,
        |         CASE WHEN lst < (SELECT hz FROM h) - 90 THEN 1 ELSE 0 END AS ev
        |       FROM s),
        |bt AS (SELECT t, CAST(count(*) AS BIGINT) AS leaving,
        |         CAST(sum(ev) AS BIGINT) AS d
        |       FROM lt GROUP BY t),
        |w AS (SELECT t, d, leaving - d AS c,
        |        CAST(sum(leaving) OVER (ORDER BY t
        |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
        |          AS n_risk
        |      FROM bt),
        |hp AS (SELECT t, n_risk, d, c,
        |         CAST(round(1000000000.0 * CAST(d AS DOUBLE)
        |              / CAST(n_risk AS DOUBLE)) AS BIGINT) AS hazard_ppb
        |       FROM w)
        |SELECT t, n_risk, d, c, hazard_ppb,
        |  CAST(sum(hazard_ppb) OVER (ORDER BY t) AS BIGINT) AS cum_hazard_ppb
        |FROM hp ORDER BY t""".stripMargin,
    // rank formula over ascending cents (custkey tie-break); exact HUGEINT
    // moments crossed to double through the canonical string round-trip
    "revenue_gini" ->
      """WITH x AS (SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey),
        |r AS (SELECT cents, CAST(row_number() OVER (ORDER BY cents, o_custkey)
        |        AS BIGINT) AS rnk FROM x),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        sum(CAST(cents AS HUGEINT)) AS sx,
        |        sum(CAST(rnk AS HUGEINT) * CAST(cents AS HUGEINT)) AS srx
        |      FROM r)
        |SELECT n, CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS total_cents,
        |  CAST(CAST(2*srx - (n+1)*sx AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(n*sx AS VARCHAR) AS DOUBLE) AS gini
        |FROM a""".stripMargin,
    // quasi-ids (nation, segment); sensitive attr = in-debt flag; k = 10
    "k_anonymity_report" ->
      """WITH cl AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(count(*) AS BIGINT) AS sz,
        |    CAST(count(DISTINCT CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS l_div
        |  FROM customer GROUP BY c_nationkey, c_mktsegment)
        |SELECT CAST(sum(sz) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(min(sz) AS BIGINT) AS min_class_size,
        |  CAST(sum(CASE WHEN sz < 10 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS classes_below_k,
        |  CAST(sum(CASE WHEN sz < 10 THEN sz ELSE 0 END) AS BIGINT)
        |    AS rows_below_k,
        |  CAST(round(1000000.0
        |      * CAST(sum(CASE WHEN sz < 10 THEN sz ELSE 0 END) AS DOUBLE)
        |      / CAST(sum(sz) AS DOUBLE)) AS BIGINT) AS risk_ppm,
        |  CAST(min(l_div) AS BIGINT) AS min_l_diversity
        |FROM cl""".stripMargin,
    // dates profile as epoch day numbers; every stat double-exact
    "column_stats_profile" ->
      """WITH li AS (SELECT
        |    CAST(l_orderkey AS DOUBLE) AS l_orderkey,
        |    CAST(l_partkey AS DOUBLE) AS l_partkey,
        |    CAST(l_suppkey AS DOUBLE) AS l_suppkey,
        |    CAST(l_quantity AS DOUBLE) AS l_quantity,
        |    CAST(l_extendedprice AS DOUBLE) AS l_extendedprice,
        |    CAST(l_discount AS DOUBLE) AS l_discount,
        |    CAST(epoch_us(date_trunc('day', l_shipdate)) // 86400000000
        |      AS DOUBLE) AS l_shipdate
        |  FROM lineitem),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(l_orderkey) AS BIGINT) AS c1, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS d1, min(l_orderkey) AS mn1, max(l_orderkey) AS mx1,
        |  CAST(count(l_partkey) AS BIGINT) AS c2, CAST(count(DISTINCT l_partkey) AS BIGINT) AS d2, min(l_partkey) AS mn2, max(l_partkey) AS mx2,
        |  CAST(count(l_suppkey) AS BIGINT) AS c3, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS d3, min(l_suppkey) AS mn3, max(l_suppkey) AS mx3,
        |  CAST(count(l_quantity) AS BIGINT) AS c4, CAST(count(DISTINCT l_quantity) AS BIGINT) AS d4, min(l_quantity) AS mn4, max(l_quantity) AS mx4,
        |  CAST(count(l_extendedprice) AS BIGINT) AS c5, CAST(count(DISTINCT l_extendedprice) AS BIGINT) AS d5, min(l_extendedprice) AS mn5, max(l_extendedprice) AS mx5,
        |  CAST(count(l_discount) AS BIGINT) AS c6, CAST(count(DISTINCT l_discount) AS BIGINT) AS d6, min(l_discount) AS mn6, max(l_discount) AS mx6,
        |  CAST(count(l_shipdate) AS BIGINT) AS c7, CAST(count(DISTINCT l_shipdate) AS BIGINT) AS d7, min(l_shipdate) AS mn7, max(l_shipdate) AS mx7
        |  FROM li)
        |SELECT 'l_orderkey' AS column_name, n AS n_rows, n - c1 AS n_nulls, d1 AS ndv, mn1 AS min_val, mx1 AS max_val FROM a
        |UNION ALL SELECT 'l_partkey', n, n - c2, d2, mn2, mx2 FROM a
        |UNION ALL SELECT 'l_suppkey', n, n - c3, d3, mn3, mx3 FROM a
        |UNION ALL SELECT 'l_quantity', n, n - c4, d4, mn4, mx4 FROM a
        |UNION ALL SELECT 'l_extendedprice', n, n - c5, d5, mn5, mx5 FROM a
        |UNION ALL SELECT 'l_discount', n, n - c6, d6, mn6, mx6 FROM a
        |UNION ALL SELECT 'l_shipdate', n, n - c7, d7, mn7, mx7 FROM a
        |ORDER BY column_name""".stripMargin,
    // same exact profile truth; the sketch estimate rides only through
    // the in-plan approx_ok gate (TRUE here — the q10a oracle pattern)
    "column_stats_profile_sketch" ->
      """WITH li AS (SELECT
        |    CAST(l_orderkey AS DOUBLE) AS l_orderkey,
        |    CAST(l_partkey AS DOUBLE) AS l_partkey,
        |    CAST(l_suppkey AS DOUBLE) AS l_suppkey,
        |    CAST(l_quantity AS DOUBLE) AS l_quantity,
        |    CAST(l_extendedprice AS DOUBLE) AS l_extendedprice,
        |    CAST(l_discount AS DOUBLE) AS l_discount,
        |    CAST(epoch_us(date_trunc('day', l_shipdate)) // 86400000000
        |      AS DOUBLE) AS l_shipdate
        |  FROM lineitem),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(l_orderkey) AS BIGINT) AS c1, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS d1, min(l_orderkey) AS mn1, max(l_orderkey) AS mx1,
        |  CAST(count(l_partkey) AS BIGINT) AS c2, CAST(count(DISTINCT l_partkey) AS BIGINT) AS d2, min(l_partkey) AS mn2, max(l_partkey) AS mx2,
        |  CAST(count(l_suppkey) AS BIGINT) AS c3, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS d3, min(l_suppkey) AS mn3, max(l_suppkey) AS mx3,
        |  CAST(count(l_quantity) AS BIGINT) AS c4, CAST(count(DISTINCT l_quantity) AS BIGINT) AS d4, min(l_quantity) AS mn4, max(l_quantity) AS mx4,
        |  CAST(count(l_extendedprice) AS BIGINT) AS c5, CAST(count(DISTINCT l_extendedprice) AS BIGINT) AS d5, min(l_extendedprice) AS mn5, max(l_extendedprice) AS mx5,
        |  CAST(count(l_discount) AS BIGINT) AS c6, CAST(count(DISTINCT l_discount) AS BIGINT) AS d6, min(l_discount) AS mn6, max(l_discount) AS mx6,
        |  CAST(count(l_shipdate) AS BIGINT) AS c7, CAST(count(DISTINCT l_shipdate) AS BIGINT) AS d7, min(l_shipdate) AS mn7, max(l_shipdate) AS mx7
        |  FROM li)
        |SELECT 'l_orderkey' AS column_name, n AS n_rows, n - c1 AS n_nulls, d1 AS ndv, mn1 AS min_val, mx1 AS max_val, TRUE AS approx_ok FROM a
        |UNION ALL SELECT 'l_partkey', n, n - c2, d2, mn2, mx2, TRUE FROM a
        |UNION ALL SELECT 'l_suppkey', n, n - c3, d3, mn3, mx3, TRUE FROM a
        |UNION ALL SELECT 'l_quantity', n, n - c4, d4, mn4, mx4, TRUE FROM a
        |UNION ALL SELECT 'l_extendedprice', n, n - c5, d5, mn5, mx5, TRUE FROM a
        |UNION ALL SELECT 'l_discount', n, n - c6, d6, mn6, mx6, TRUE FROM a
        |UNION ALL SELECT 'l_shipdate', n, n - c7, d7, mn7, mx7, TRUE FROM a
        |ORDER BY column_name""".stripMargin,
    // pseudo-Poisson multiplicities from the house hash, /16 pmf
    // {0:5,1:7,2:3,3:1}; medians via quantile_cont parity
    "bootstrap_median_ci" ->
      """WITH base AS (SELECT event_type, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS c FROM events),
        |pt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |        quantile_cont(c, 0.5) AS median FROM base GROUP BY 1),
        |m AS (SELECT event_type, c, CAST(r.range AS BIGINT) AS r,
        |        CASE WHEN ((event_id % 1000000007) * 2654435761
        |                   + CAST(r.range AS BIGINT)) % 1000000007 % 16 < 5 THEN 0
        |             WHEN ((event_id % 1000000007) * 2654435761
        |                   + CAST(r.range AS BIGINT)) % 1000000007 % 16 < 12 THEN 1
        |             WHEN ((event_id % 1000000007) * 2654435761
        |                   + CAST(r.range AS BIGINT)) % 1000000007 % 16 < 15 THEN 2
        |             ELSE 3 END AS mult
        |      FROM base, range(16) r),
        |x AS (SELECT event_type, r, c
        |      FROM m, range(1, 4) d WHERE CAST(d.range AS BIGINT) <= mult),
        |rm AS (SELECT event_type, r, quantile_cont(c, 0.5) AS med
        |       FROM x GROUP BY 1, 2),
        |ci AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_resamples,
        |        min(med) AS ci_lo, max(med) AS ci_hi FROM rm GROUP BY 1)
        |SELECT pt.event_type, pt.n, pt.median,
        |  ci.n_resamples, ci.ci_lo, ci.ci_hi
        |FROM pt JOIN ci USING (event_type) ORDER BY event_type""".stripMargin,
    // doubled tie-averaged ranks R2 = 2*below + tied + 1 keep the rank
    // algebra in exact integers; z tree stated over string-roundtrip
    // doubles with identical association
    "mannwhitney_value_arms" ->
      """WITH v AS (SELECT CAST(round(value * 100) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
        |  FROM events GROUP BY 1),
        |r AS (SELECT c, na, nb, na + nb AS t,
        |        coalesce(sum(na + nb) OVER (ORDER BY c
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        |      FROM v),
        |a AS (SELECT CAST(sum(na) AS BIGINT) AS n0,
        |        CAST(sum(nb) AS BIGINT) AS n1,
        |        sum(CAST(na AS HUGEINT) * (2 * below + t + 1)) AS ra2,
        |        sum(CAST(t AS HUGEINT) * t * t - t) AS ties
        |      FROM r)
        |SELECT n0, n1,
        |  CAST(CAST(ra2 - CAST(n0 AS HUGEINT) * (n0 + 1) AS VARCHAR) AS DOUBLE) AS u2,
        |  CAST(CAST(ties AS VARCHAR) AS DOUBLE) AS tie_term,
        |  (CAST(CAST(ra2 - CAST(n0 AS HUGEINT) * (n0 + 1) AS VARCHAR) AS DOUBLE) / 2.0
        |    - CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 2.0)
        |  / sqrt(CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 12.0 *
        |      ((CAST(n0 + n1 AS DOUBLE) + 1.0)
        |       - CAST(CAST(ties AS VARCHAR) AS DOUBLE)
        |         / (CAST(n0 + n1 AS DOUBLE) * (CAST(n0 + n1 AS DOUBLE) - 1.0)))) AS z
        |FROM a""".stripMargin,
    // two quartile-instant snapshots of the SCD2 intervals full-outer
    // joined; unchanged users dropped; -1 sentinel for absent values
    "scd2_snapshot_diff" ->
      """WITH c AS (SELECT min(epoch_us(ts)) + (max(epoch_us(ts)) - min(epoch_us(ts))) // 4 AS cut1,
        |    min(epoch_us(ts)) + ((max(epoch_us(ts)) - min(epoch_us(ts))) * 3) // 4 AS cut2
        |  FROM events),
        |iv AS (SELECT user_id, value, epoch_us(ts) AS f,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS t
        |  FROM events),
        |s1 AS (SELECT user_id, value AS v1 FROM iv, c
        |       WHERE f <= cut1 AND (t IS NULL OR t > cut1)),
        |s2 AS (SELECT user_id, value AS v2 FROM iv, c
        |       WHERE f <= cut2 AND (t IS NULL OR t > cut2)),
        |d AS (SELECT coalesce(s1.user_id, s2.user_id) AS user_id,
        |        CASE WHEN s1.v1 IS NULL THEN 'added'
        |             WHEN s2.v2 IS NULL THEN 'removed'
        |             ELSE 'changed' END AS status,
        |        coalesce(s1.v1, -1.0) AS value_t1,
        |        coalesce(s2.v2, -1.0) AS value_t2
        |      FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id)
        |SELECT user_id, status, value_t1, value_t2 FROM d
        |WHERE status <> 'changed' OR value_t1 <> value_t2
        |ORDER BY user_id""".stripMargin,
    // affine 255-level code per dim; squared errors quantized to integer
    // pico units so the MSE fold is order-free
    "embedding_sq8_stats" ->
      s"""WITH $kvCte,
         |e AS (SELECT CAST(r.range AS BIGINT) AS dim,
         |        vec[CAST(r.range AS INT)+1] AS x
         |      FROM kv, range(64) r),
         |mm AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM e GROUP BY 1),
         |co AS (SELECT e.dim, e.x, mm.mn, mm.mx,
         |        CASE WHEN mm.mx = mm.mn THEN 0
         |             ELSE CAST(round(255.0 * (e.x - mm.mn)
         |                              / (mm.mx - mm.mn)) AS BIGINT) END AS code
         |       FROM e JOIN mm USING (dim)),
         |r2 AS (SELECT dim, mn, mx,
         |        CAST(round((x - (mn + CAST(code AS DOUBLE) * (mx - mn) / 255.0))
         |                 * (x - (mn + CAST(code AS DOUBLE) * (mx - mn) / 255.0))
         |                 * 1.0e12) AS BIGINT) AS e2p
         |       FROM co)
         |SELECT dim, CAST(count(*) AS BIGINT) AS n, min(mn) AS mn, min(mx) AS mx,
         |  CAST(sum(e2p) AS BIGINT) AS sum_e2_pico,
         |  CAST(max(e2p) AS BIGINT) AS max_e2_pico
         |FROM r2 GROUP BY dim ORDER BY dim""".stripMargin,
    // median pairwise slope + median residual intercept; quantile_cont
    // parity with Spark's percentile is q33's pinned gate
    "theil_sen_daily" ->
      """WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type,
        |        (CAST(b.y AS DOUBLE) - CAST(a.y AS DOUBLE))
        |          / (CAST(b.day AS DOUBLE) - CAST(a.day AS DOUBLE)) AS s
        |      FROM d a JOIN d b ON a.event_type = b.event_type
        |                       AND a.day < b.day),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
        |        quantile_cont(s, 0.5) AS slope
        |      FROM p GROUP BY 1),
        |r AS (SELECT d.event_type, m.n_pairs, m.slope,
        |        CAST(d.y AS DOUBLE) - m.slope * CAST(d.day AS DOUBLE) AS ic
        |      FROM d JOIN m USING (event_type))
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(min(n_pairs) AS BIGINT) AS n_pairs, min(slope) AS slope,
        |  quantile_cont(ic, 0.5) AS intercept
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
    // values strictly outside [p05, p95] dropped; survivors are exact
    // cents so the mean is one division of exact longs
    "trimmed_mean_by_type" ->
      """WITH c AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS c FROM events),
        |q AS (SELECT event_type, quantile_cont(c, 0.05) AS lo,
        |        quantile_cont(c, 0.95) AS hi
        |      FROM c GROUP BY 1)
        |SELECT c.event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN CAST(c.c AS DOUBLE) >= q.lo
        |                 AND CAST(c.c AS DOUBLE) <= q.hi
        |            THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  min(q.lo) AS lo, min(q.hi) AS hi,
        |  CAST(sum(CASE WHEN CAST(c.c AS DOUBLE) >= q.lo
        |                 AND CAST(c.c AS DOUBLE) <= q.hi
        |            THEN c.c ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(CASE WHEN CAST(c.c AS DOUBLE) >= q.lo
        |                     AND CAST(c.c AS DOUBLE) <= q.hi
        |               THEN 1 ELSE 0 END) AS DOUBLE) / 100.0 AS trimmed_mean
        |FROM c JOIN q USING (event_type)
        |GROUP BY c.event_type ORDER BY c.event_type""".stripMargin,
    // tie-averaged ranks in DOUBLED integer units (2·rank_min + tied − 1,
    // the mannwhitney recipe); rho is one double tree over exact moments;
    // a zero-variance side yields NULL via the stated guard
    "spearman_daily" ->
      """WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type,
        |    2 * rank() OVER (PARTITION BY event_type ORDER BY y)
        |      + count(*) OVER (PARTITION BY event_type, y) - 1 AS rx,
        |    2 * rank() OVER (PARTITION BY event_type ORDER BY cnt)
        |      + count(*) OVER (PARTITION BY event_type, cnt) - 1 AS ry
        |  FROM d),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
        |    CAST(sum(rx * ry) AS BIGINT) AS sxy,
        |    CAST(sum(rx * rx) AS BIGINT) AS sxx,
        |    CAST(sum(ry * ry) AS BIGINT) AS syy
        |  FROM r GROUP BY 1)
        |SELECT event_type, n_days,
        |  CASE WHEN n_days * sxx - sx * sx = 0
        |         OR n_days * syy - sy * sy = 0 THEN NULL
        |    ELSE CAST(n_days * sxy - sx * sy AS DOUBLE)
        |      / (sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE))
        |         * sqrt(CAST(n_days * syy - sy * sy AS DOUBLE))) END AS rho
        |FROM m ORDER BY event_type""".stripMargin,
    // x = day index (never tied) so tau-b's denominator is
    // √(n0·(n0−ty)); every count an exact pair-join integer
    "kendall_tau_daily" ->
      """WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT a.event_type,
        |    CAST(sum(CASE WHEN b.y > a.y THEN 1 ELSE 0 END) AS BIGINT)
        |      AS concordant,
        |    CAST(sum(CASE WHEN b.y < a.y THEN 1 ELSE 0 END) AS BIGINT)
        |      AS discordant,
        |    CAST(sum(CASE WHEN b.y = a.y THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ties_y
        |  FROM d a JOIN d b ON a.event_type = b.event_type AND a.day < b.day
        |  GROUP BY 1),
        |nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
        |  FROM d GROUP BY 1)
        |SELECT nd.event_type, nd.n_days,
        |  concordant + discordant + ties_y AS n_pairs,
        |  concordant, discordant, ties_y,
        |  CASE WHEN concordant + discordant + ties_y = 0
        |         OR concordant + discordant + ties_y = ties_y THEN NULL
        |    ELSE CAST(concordant - discordant AS DOUBLE)
        |      / sqrt(CAST((concordant + discordant + ties_y)
        |                  * (concordant + discordant) AS DOUBLE)) END AS tau_b
        |FROM nd JOIN g USING (event_type) ORDER BY event_type""".stripMargin,
    // trend = centered 7-observation MA (full windows only); seasonal =
    // dow mean of 7·y − s7 (exact longs); residual one fixed double tree
    "stl_decompose_daily" ->
      """WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, day, y,
        |    CAST(sum(y) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS s7,
        |    CAST(count(*) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS c7
        |  FROM d),
        |f AS (SELECT event_type, day, day % 7 AS dow, y, s7, 7 * y - s7 AS d7
        |  FROM w WHERE c7 = 7),
        |s AS (SELECT event_type, dow, CAST(sum(d7) AS BIGINT) AS sd7,
        |    CAST(count(*) AS BIGINT) AS dn FROM f GROUP BY 1, 2)
        |SELECT f.event_type, f.day, f.dow, f.y AS y_cents,
        |  CAST(f.s7 AS DOUBLE) / 7.0 AS trend,
        |  CAST(s.sd7 AS DOUBLE) / (7.0 * CAST(s.dn AS DOUBLE)) AS seasonal,
        |  CAST(f.y AS DOUBLE) - CAST(f.s7 AS DOUBLE) / 7.0
        |    - CAST(s.sd7 AS DOUBLE) / (7.0 * CAST(s.dn AS DOUBLE)) AS residual
        |FROM f JOIN s USING (event_type, dow)
        |ORDER BY event_type, day""".stripMargin,
    // Newman r over directed edges (each undirected edge both ways, so
    // Σdx ≡ Σdy); HUGEINT moments crossed via the gini string round-trip
    "graph_assortativity_users" ->
      """WITH b AS MATERIALIZED (SELECT DISTINCT user_id AS uid,
        |    epoch_us(ts) // 60000000 AS w FROM events),
        |ce AS MATERIALIZED (SELECT DISTINCT l.uid AS u, r.uid AS v
        |  FROM b l JOIN b r USING (w) WHERE l.uid < r.uid),
        |e AS MATERIALIZED (SELECT u AS x, v AS y FROM ce
        |  UNION ALL SELECT v, u FROM ce),
        |deg AS (SELECT x AS n, CAST(count(*) AS BIGINT) AS d
        |  FROM e GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS mm,
        |    sum(CAST(dx.d AS HUGEINT)) AS sx,
        |    sum(CAST(dy.d AS HUGEINT)) AS sy,
        |    sum(CAST(dx.d AS HUGEINT) * CAST(dy.d AS HUGEINT)) AS sxy,
        |    sum(CAST(dx.d AS HUGEINT) * CAST(dx.d AS HUGEINT)) AS sxx,
        |    sum(CAST(dy.d AS HUGEINT) * CAST(dy.d AS HUGEINT)) AS syy
        |  FROM e JOIN deg dx ON e.x = dx.n JOIN deg dy ON e.y = dy.n)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
        |  mm // 2 AS n_edges,
        |  CASE WHEN CAST(CAST(CAST(mm AS HUGEINT) * sxx - sx * sx AS VARCHAR)
        |           AS DOUBLE) = 0
        |         OR CAST(CAST(CAST(mm AS HUGEINT) * syy - sy * sy AS VARCHAR)
        |           AS DOUBLE) = 0 THEN NULL
        |  ELSE
        |  CAST(CAST(CAST(mm AS HUGEINT) * sxy - sx * sy AS VARCHAR) AS DOUBLE)
        |    / (sqrt(CAST(CAST(CAST(mm AS HUGEINT) * sxx - sx * sx AS VARCHAR)
        |              AS DOUBLE))
        |       * sqrt(CAST(CAST(CAST(mm AS HUGEINT) * syy - sy * sy AS VARCHAR)
        |              AS DOUBLE))) END AS assortativity
        |FROM m""".stripMargin,
    // the island constant day − row_number() is shared by consecutive
    // days and broken by any gap — all exact integers
    "user_activity_streaks" ->
      """WITH ad AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day FROM events
        |  WHERE user_id IS NOT NULL),
        |isl AS (SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day)
        |      AS grp FROM ad),
        |st AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
        |  FROM isl GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        |  CAST(count(*) AS BIGINT) AS n_streaks,
        |  CAST(max(len) AS BIGINT) AS max_streak
        |FROM st GROUP BY 1 ORDER BY user_id""".stripMargin,
    // smallest price whose doubled cumulative quantity reaches the total
    // — the discrete weighted median, stated identically on both engines
    "weighted_median_lineitem" ->
      """WITH li AS (SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
        |    CAST(round(l_quantity) AS BIGINT) AS q FROM lineitem),
        |g AS (SELECT l_returnflag, pc, CAST(sum(q) AS BIGINT) AS w
        |  FROM li GROUP BY 1, 2),
        |c AS (SELECT l_returnflag, pc, w,
        |    CAST(sum(w) OVER (PARTITION BY l_returnflag ORDER BY pc)
        |      AS BIGINT) AS cw,
        |    CAST(sum(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tw
        |  FROM g)
        |SELECT l_returnflag, CAST(min(tw) AS BIGINT) AS total_qty,
        |  CAST(min(CASE WHEN 2 * cw >= tw THEN pc END) AS BIGINT)
        |    AS wmedian_cents
        |FROM c GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    // prior-window bands (current row excluded); flags only on a FULL
    // 20-row prior window; NULL bands on warmup rows on both engines
    "donchian_by_type" ->
      """WITH w AS (SELECT event_id, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS vc,
        |    CAST(count(*) OVER pw AS BIGINT) AS n_prior,
        |    CAST(max(CAST(round(value * 100) AS BIGINT)) OVER pw AS BIGINT)
        |      AS donch_hi,
        |    CAST(min(CAST(round(value * 100) AS BIGINT)) OVER pw AS BIGINT)
        |      AS donch_lo
        |  FROM events
        |  WINDOW pw AS (PARTITION BY event_type ORDER BY event_id
        |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, event_type, vc, n_prior, donch_hi, donch_lo,
        |  CAST(CASE WHEN n_prior = 20 AND vc > donch_hi THEN 1 ELSE 0 END
        |    AS BIGINT) AS breakout_up,
        |  CAST(CASE WHEN n_prior = 20 AND vc < donch_lo THEN 1 ELSE 0 END
        |    AS BIGINT) AS breakout_dn
        |FROM w ORDER BY event_id""".stripMargin,
    // the same life table as survival_nelson_aalen; the product-limit
    // recursion states the identical IEEE multiply sequence the ordered
    // fold executes (1.0·x ≡ x, so the base case is the first factor)
    "kaplan_meier_survival" ->
      """WITH RECURSIVE o AS MATERIALIZED (
        |  WITH s AS (SELECT o_custkey,
        |      min(epoch_us(date_trunc('day', o_orderdate)) // 86400000000)
        |        AS fst,
        |      max(epoch_us(date_trunc('day', o_orderdate)) // 86400000000)
        |        AS lst
        |    FROM orders GROUP BY o_custkey),
        |  h AS (SELECT max(lst) AS hz FROM s),
        |  lt AS (SELECT lst - fst AS t,
        |           CASE WHEN lst < (SELECT hz FROM h) - 90 THEN 1 ELSE 0 END
        |             AS ev
        |         FROM s),
        |  bt AS (SELECT t, CAST(count(*) AS BIGINT) AS leaving,
        |           CAST(sum(ev) AS BIGINT) AS d
        |         FROM lt GROUP BY t)
        |  SELECT t, d, leaving - d AS c,
        |    CAST(sum(leaving) OVER (ORDER BY t
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
        |      AS n_risk,
        |    row_number() OVER (ORDER BY t) AS i
        |  FROM bt),
        |k AS (
        |  SELECT t, n_risk, d, c, i,
        |    1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS s
        |  FROM o WHERE i = 1
        |  UNION ALL
        |  SELECT o.t, o.n_risk, o.d, o.c, o.i,
        |    k.s * (1.0 - CAST(o.d AS DOUBLE) / CAST(o.n_risk AS DOUBLE))
        |  FROM k JOIN o ON o.i = k.i + 1)
        |SELECT t, n_risk, d, c, s AS survival FROM k ORDER BY t""".stripMargin,
    // the forecast baseline: same weekday last week over the dense daily
    // spine; errors are exact longs, only the sMAPE ratio quantizes
    "forecast_backtest_seasonal_naive" ->
      """WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, y,
        |    lag(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS f
        |  FROM d),
        |s AS (SELECT event_type, abs(y - f) AS ae,
        |    CAST(CASE WHEN y = 0 AND f = 0 THEN 0
        |      ELSE floor(2.0 * CAST(abs(y - f) AS DOUBLE)
        |           / CAST(abs(y) + abs(f) AS DOUBLE) * 1000000000.0)
        |      END AS BIGINT) AS sm_ppb
        |  FROM b WHERE f IS NOT NULL)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(ae) AS BIGINT) AS sum_ae_cents,
        |  CAST(sum(sm_ppb) AS BIGINT) AS sum_smape_ppb,
        |  CAST(sum(ae) AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE) AS mae,
        |  CAST(sum(sm_ppb) AS DOUBLE) / 1000000000.0
        |    / CAST(count(*) AS DOUBLE) AS smape
        |FROM s GROUP BY event_type ORDER BY event_type""".stripMargin,
    // inclusion-exclusion intersection: exact counts + the in-plan HLL
    // gate (the q10a TRUE-literal pattern)
    "hll_intersection_users" ->
      """WITH x AS (SELECT
        |    CAST(count(DISTINCT CASE WHEN event_type = 'view'
        |      THEN user_id END) AS BIGINT) AS n_viewers,
        |    CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
        |      THEN user_id END) AS BIGINT) AS n_purchasers,
        |    CAST(count(DISTINCT CASE WHEN event_type IN ('view', 'purchase')
        |      THEN user_id END) AS BIGINT) AS n_union
        |  FROM events WHERE user_id IS NOT NULL)
        |SELECT n_viewers, n_purchasers, n_union,
        |  n_viewers + n_purchasers - n_union AS n_both, TRUE AS approx_ok
        |FROM x""".stripMargin,
    "entity_resolution_parts" -> erPartsOracle(8),
    // halving weight per 6h age bucket, clamped at the oldest bucket for
    // an exact-lookback age; base = 1e6·w // Σw, remainder to the most
    // recent touch — all integer div/mod, identical on both engines
    "attribution_time_decay" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |    epoch_us(ts) AS us FROM events),
        |p AS (SELECT user_id, event_id AS p_id, us AS p_us FROM ev
        |  WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, event_id AS v_id, us AS v_us FROM ev
        |  WHERE event_type = 'view'),
        |t AS (SELECT p.p_id, v.v_id, v.v_us,
        |    least((p.p_us - v.v_us) // 21600000000, 3) AS k
        |  FROM p JOIN v ON p.user_id = v.user_id
        |  WHERE (v.v_us < p.p_us OR (v.v_us = p.p_us AND v.v_id < p.p_id))
        |    AND p.p_us - v.v_us <= 86400000000),
        |r AS (SELECT p_id, v_id,
        |    CAST(1 << (3 - k) AS BIGINT) AS w,
        |    CAST(sum(1 << (3 - k)) OVER (PARTITION BY p_id) AS BIGINT) AS sw,
        |    row_number() OVER (PARTITION BY p_id
        |      ORDER BY v_us DESC, v_id DESC) AS rn_last
        |  FROM t),
        |cr AS (SELECT p_id, v_id, (1000000 * w) // sw AS base,
        |    CAST(sum((1000000 * w) // sw) OVER (PARTITION BY p_id)
        |      AS BIGINT) AS tot_base, rn_last
        |  FROM r)
        |SELECT v_id AS event_id, CAST(count(*) AS BIGINT) AS n_conversions,
        |  CAST(sum(base + CASE WHEN rn_last = 1
        |    THEN 1000000 - tot_base ELSE 0 END) AS BIGINT) AS credit_micro
        |FROM cr GROUP BY 1 ORDER BY event_id""".stripMargin,
    // the triangle closure and the Σ d(d−1)/2 wedge count as closed
    // forms over the same canonical edges; guarded exact-integer ratio
    "clustering_coefficient_users" ->
      """WITH b AS MATERIALIZED (SELECT DISTINCT user_id AS uid,
        |    epoch_us(ts) // 60000000 AS w FROM events),
        |t AS MATERIALIZED (SELECT DISTINCT l.uid AS u, r.uid AS v
        |  FROM b l JOIN b r USING (w) WHERE l.uid < r.uid),
        |deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d FROM
        |  (SELECT u AS n FROM t UNION ALL SELECT v FROM t) un GROUP BY 1),
        |tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM t a
        |        JOIN t b2 ON a.v = b2.u
        |        JOIN t c2 ON c2.u = a.u AND c2.v = b2.v),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
        |        CAST(sum((d * (d - 1)) // 2) AS BIGINT) AS wedges FROM deg)
        |SELECT agg.n_nodes, (SELECT CAST(count(*) AS BIGINT) FROM t)
        |    AS n_edges,
        |  tri.n_triangles, agg.wedges,
        |  CASE WHEN agg.wedges = 0 THEN NULL
        |    ELSE CAST(3 * tri.n_triangles AS DOUBLE)
        |      / CAST(agg.wedges AS DOUBLE) END AS clustering_coeff
        |FROM tri, agg""".stripMargin,
    // first-seen collapse; the distinct-day spine keeps zero-new-user
    // days on the curve
    "cumulative_users_daily" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day FROM events
        |  WHERE user_id IS NOT NULL),
        |fs AS (SELECT user_id, min(day) AS day FROM ud GROUP BY 1),
        |np AS (SELECT day, CAST(count(*) AS BIGINT) AS new_users
        |  FROM fs GROUP BY 1),
        |sp AS (SELECT DISTINCT day FROM ud)
        |SELECT sp.day, coalesce(np.new_users, 0) AS new_users,
        |  CAST(sum(coalesce(np.new_users, 0)) OVER (ORDER BY sp.day)
        |    AS BIGINT) AS cum_users
        |FROM sp LEFT JOIN np USING (day) ORDER BY sp.day""".stripMargin,
    // shared day spine (a day missing one type contributes 0); exact
    // window moments; zero-variance windows NULL on both engines
    "rolling_corr_view_click" ->
      """WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(coalesce(sum(CASE WHEN event_type = 'view'
        |      THEN CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT)
        |      AS xa,
        |    CAST(coalesce(sum(CASE WHEN event_type = 'click'
        |      THEN CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT)
        |      AS xb
        |  FROM events WHERE event_type IN ('view', 'click') GROUP BY 1),
        |m AS (SELECT day, xa, xb,
        |    CAST(count(*) OVER w AS BIGINT) AS c7,
        |    CAST(sum(xa) OVER w AS BIGINT) AS sx,
        |    CAST(sum(xb) OVER w AS BIGINT) AS sy,
        |    CAST(sum(xa * xb) OVER w AS BIGINT) AS sxy,
        |    CAST(sum(xa * xa) OVER w AS BIGINT) AS sxx,
        |    CAST(sum(xb * xb) OVER w AS BIGINT) AS syy
        |  FROM d
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT day, xa, xb,
        |  CASE WHEN 7 * sxx - sx * sx = 0 OR 7 * syy - sy * sy = 0 THEN NULL
        |    ELSE CAST(7 * sxy - sx * sy AS DOUBLE)
        |      / (sqrt(CAST(7 * sxx - sx * sx AS DOUBLE))
        |         * sqrt(CAST(7 * syy - sy * sy AS DOUBLE))) END
        |    AS rolling_corr
        |FROM m WHERE c7 = 7 ORDER BY day""".stripMargin,
    // heaviest-key diagnostic; argmax ties to the smallest key
    "key_skew_report" ->
      """WITH kc AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
        |        CAST(count(*) AS BIGINT) AS n_keys,
        |        CAST(max(cnt) AS BIGINT) AS max_key_rows FROM kc)
        |SELECT t.n_rows, t.n_keys, t.max_key_rows,
        |  CAST(min(kc.o_custkey) AS BIGINT) AS argmax_key,
        |  CAST(round(1000000.0 * CAST(t.max_key_rows AS DOUBLE)
        |       / (CAST(t.n_rows AS DOUBLE) / CAST(t.n_keys AS DOUBLE)))
        |    AS BIGINT) AS skew_ppm
        |FROM kc, t WHERE kc.cnt = t.max_key_rows
        |GROUP BY t.n_rows, t.n_keys, t.max_key_rows""".stripMargin,
    // decile edges via quantile_cont; bin = #(edges strictly below),
    // edge-equal values go low
    "quantile_bins_value" ->
      """WITH c AS (SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events),
        |e AS (SELECT quantile_cont(c, 0.1) AS e1, quantile_cont(c, 0.2) AS e2,
        |        quantile_cont(c, 0.3) AS e3, quantile_cont(c, 0.4) AS e4,
        |        quantile_cont(c, 0.5) AS e5, quantile_cont(c, 0.6) AS e6,
        |        quantile_cont(c, 0.7) AS e7, quantile_cont(c, 0.8) AS e8,
        |        quantile_cont(c, 0.9) AS e9 FROM c),
        |b AS (SELECT
        |    CAST(CASE WHEN CAST(c.c AS DOUBLE) > e.e1 THEN 1 ELSE 0 END
        |       + CASE WHEN CAST(c.c AS DOUBLE) > e.e2 THEN 1 ELSE 0 END
        |       + CASE WHEN CAST(c.c AS DOUBLE) > e.e3 THEN 1 ELSE 0 END
        |       + CASE WHEN CAST(c.c AS DOUBLE) > e.e4 THEN 1 ELSE 0 END
        |       + CASE WHEN CAST(c.c AS DOUBLE) > e.e5 THEN 1 ELSE 0 END
        |       + CASE WHEN CAST(c.c AS DOUBLE) > e.e6 THEN 1 ELSE 0 END
        |       + CASE WHEN CAST(c.c AS DOUBLE) > e.e7 THEN 1 ELSE 0 END
        |       + CASE WHEN CAST(c.c AS DOUBLE) > e.e8 THEN 1 ELSE 0 END
        |       + CASE WHEN CAST(c.c AS DOUBLE) > e.e9 THEN 1 ELSE 0 END
        |      AS BIGINT) AS bin, c.c
        |  FROM c, e)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(c) AS BIGINT) AS min_cents,
        |  CAST(max(c) AS BIGINT) AS max_cents
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
    // same hash→fold map as split_grouped_leakfree, k = 5
    "cv_fold_assign" ->
      """WITH pu AS (SELECT
        |    ((coalesce(user_id, 1000000006) % 1000000007) * 2654435761)
        |      % 1000000007 % 5 AS fold,
        |    user_id, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM pu)
        |SELECT CAST(fold AS BIGINT) AS fold,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(n) AS BIGINT) AS n_rows,
        |  CAST(round(1000000.0 * CAST(sum(n) AS DOUBLE)
        |       / CAST((SELECT n_total FROM t) AS DOUBLE)) AS BIGINT)
        |    AS row_share_ppm
        |FROM pu GROUP BY fold ORDER BY fold""".stripMargin,
    // first view → first at-or-after purchase; 10-minute integer bins
    "funnel_time_to_convert" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |fv AS (SELECT user_id, min(us) AS fv FROM ev
        |       WHERE event_type = 'view' GROUP BY 1),
        |fp AS (SELECT ev.user_id, fv.fv, min(ev.us) AS fp
        |       FROM ev JOIN fv USING (user_id)
        |       WHERE ev.event_type = 'purchase' AND ev.us >= fv.fv
        |       GROUP BY 1, 2),
        |d AS (SELECT (fp - fv) // 600000000 AS bin, fp - fv AS delay_us FROM fp)
        |SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(min(delay_us) AS BIGINT) AS min_delay_us,
        |  CAST(max(delay_us) AS BIGINT) AS max_delay_us
        |FROM d GROUP BY bin ORDER BY bin""".stripMargin,
    // deterministic synchronous LPA, 4 rounds generated mechanically
    // (the bfs/cc oracle discipline): majority neighbor label with the
    // (count desc, label asc) tie-break, isolated nodes keep their id
    "label_prop_communities" -> {
      val head =
        """WITH b AS MATERIALIZED (SELECT DISTINCT user_id AS uid,
          |    epoch_us(ts) // 60000000 AS w FROM events),
          |ce AS MATERIALIZED (SELECT DISTINCT l.uid AS u, r.uid AS v
          |  FROM b l JOIN b r USING (w) WHERE l.uid < r.uid),
          |e AS MATERIALIZED (SELECT u AS src, v AS dst FROM ce
          |  UNION ALL SELECT v, u FROM ce),
          |nd AS MATERIALIZED (SELECT DISTINCT user_id AS node FROM events),
          |l0 AS MATERIALIZED (SELECT node, node AS lab FROM nd)""".stripMargin
      val steps = (1 to 4).map { i =>
        val p = i - 1
        s"""v$i AS MATERIALIZED (SELECT e.src AS node, l$p.lab AS lab,
           |    CAST(count(*) AS BIGINT) AS c
           |  FROM e JOIN l$p ON e.dst = l$p.node GROUP BY 1, 2),
           |m$i AS MATERIALIZED (SELECT node, lab FROM (
           |    SELECT node, lab, row_number() OVER (PARTITION BY node
           |      ORDER BY c DESC, lab ASC) AS rn FROM v$i) WHERE rn = 1),
           |l$i AS MATERIALIZED (SELECT nd.node,
           |    coalesce(m$i.lab, l$p.lab) AS lab
           |  FROM nd JOIN l$p USING (node) LEFT JOIN m$i USING (node))"""
          .stripMargin
      }.mkString(",\n")
      s"""$head,
         |$steps
         |SELECT node AS user_id, CAST(lab AS BIGINT) AS community
         |FROM l4 ORDER BY user_id""".stripMargin
    },
    // hash-deterministic 3-step walks: next hop = adjacency rank
    // hash(node, step) mod degree + 1 over dst-ascending neighbors
    "random_walks_users" -> {
      val head =
        """WITH b AS MATERIALIZED (SELECT DISTINCT user_id AS uid,
          |    epoch_us(ts) // 60000000 AS w FROM events),
          |ce AS MATERIALIZED (SELECT DISTINCT l.uid AS u, r.uid AS v
          |  FROM b l JOIN b r USING (w) WHERE l.uid < r.uid),
          |e AS MATERIALIZED (SELECT u AS src, v AS dst FROM ce
          |  UNION ALL SELECT v, u FROM ce),
          |adj AS MATERIALIZED (SELECT src, dst,
          |  CAST(row_number() OVER (PARTITION BY src ORDER BY dst) AS BIGINT) AS rn,
          |  CAST(count(*) OVER (PARTITION BY src) AS BIGINT) AS deg FROM e),
          |f0 AS (SELECT DISTINCT user_id AS start, user_id AS node
          |       FROM events WHERE user_id IS NOT NULL)"""
          .stripMargin
      val steps = (1 to 3).map { i =>
        s"""f$i AS (SELECT f${i - 1}.start, adj.dst AS node
           |  FROM f${i - 1} JOIN adj ON adj.src = f${i - 1}.node
           |  AND adj.rn = ((((f${i - 1}.node % 1000000007) * 2654435761 + $i)
           |                 % 1000000007) % adj.deg) + 1)""".stripMargin
      }.mkString(",\n")
      val emits = (0 to 3).map(i =>
        s"SELECT start, CAST($i AS BIGINT) AS step, node FROM f$i")
        .mkString("\nUNION ALL ")
      s"$head,\n$steps\n$emits\nORDER BY start, step"
    },
    // RRF fusion: lexical = the bm25_topdocs pipeline at depth 101 minus
    // the query doc; dense = brute cosine vs vec 0 at depth 100; missing
    // ranks carry sentinel 0 and contribute nothing
    "hybrid_rrf_topk" -> hybridRrfOracle(ivfPruned = false),
    // same fusion statement; the dense candidate set adds the coarse-cell
    // prune (the ann_ivf shape) — the ONE line that differs
    "hybrid_rrf_ivf_topk" -> hybridRrfOracle(ivfPruned = true),
    // transaction time = batch 0 of the median-split journal (ids <= mid,
    // the same batch rule as scd2_cdc_feed); valid time = the asof cut
    "scd2_bitemporal_snapshot" ->
      """WITH m AS (SELECT max(event_id) // 2 AS mid FROM events),
        |cut AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS c
        |        FROM events),
        |v0 AS (SELECT user_id, event_id, value, epoch_us(ts) AS f,
        |         lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id) AS t
        |       FROM events WHERE event_id <= (SELECT mid FROM m))
        |SELECT user_id, event_id, value, f AS valid_from_us,
        |       (SELECT c FROM cut) AS cut_us
        |FROM v0
        |WHERE f <= (SELECT c FROM cut)
        |  AND (t IS NULL OR t > (SELECT c FROM cut))
        |ORDER BY user_id""".stripMargin,
    // the identical polynomial token hash and slot rule (hash mod P is
    // non-negative, so % agrees between engines)
    "feature_hash_vectors" ->
      s"""WITH t AS (SELECT doc_id, unnest($tokenHashesSql) AS th
        |           FROM documents)
        |SELECT doc_id, th % 64 AS slot, CAST(count(*) AS BIGINT) AS n
        |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the exact-integer max-CUSUM-deviation statistic in HUGEINT, the
    // same earliest-id tie-break, statistic crossed via dd()
    "changepoint_by_type" ->
      s"""WITH e AS (
        |  SELECT event_type, event_id,
        |    row_number() OVER w AS n,
        |    sum(CAST(round(value * 100) AS BIGINT)) OVER w AS s,
        |    count(*) OVER (PARTITION BY event_type) AS nn,
        |    sum(CAST(round(value * 100) AS BIGINT))
        |      OVER (PARTITION BY event_type) AS ss
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |st AS (SELECT event_type, event_id,
        |         abs(CAST(nn AS HUGEINT) * s - CAST(n AS HUGEINT) * ss)
        |           AS stat
        |       FROM e),
        |mx AS (SELECT event_type, max(stat) AS m FROM st GROUP BY 1)
        |SELECT st.event_type, min(st.event_id) AS cp_id,
        |  ${dd("max(st.stat)")} AS stat
        |FROM st JOIN mx ON st.event_type = mx.event_type AND st.stat = mx.m
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // identical union + ordered-window bracketing and the identical
    // three-op double tree; ticks sort before a same-instant grid row
    "resample_linear_hourly" ->
      """WITH tk AS (
        |  SELECT event_type, epoch_us(ts) AS us, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events),
        |b AS (SELECT event_type, min(us) AS lo, max(us) AS hi
        |      FROM tk GROUP BY 1),
        |g0 AS (SELECT event_type,
        |         unnest(generate_series((lo + 3599999999) // 3600000000,
        |                                hi // 3600000000)) AS hs
        |       FROM b),
        |g AS (SELECT event_type, hs * 3600000000 AS us FROM g0),
        |u AS (
        |  SELECT event_type, us, 0 AS isg, event_id, c FROM tk
        |  UNION ALL
        |  SELECT event_type, us, 1 AS isg, -1 AS event_id, NULL AS c FROM g),
        |w AS (
        |  SELECT event_type, us, isg,
        |    last_value(c IGNORE NULLS) OVER wb AS v0,
        |    last_value(CASE WHEN c IS NOT NULL THEN us END IGNORE NULLS)
        |      OVER wb AS t0,
        |    first_value(c IGNORE NULLS) OVER wf AS v1,
        |    first_value(CASE WHEN c IS NOT NULL THEN us END IGNORE NULLS)
        |      OVER wf AS t1
        |  FROM u
        |  WINDOW wb AS (PARTITION BY event_type ORDER BY us, isg, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wf AS (PARTITION BY event_type ORDER BY us, isg, event_id
        |                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |SELECT event_type, us AS grid_us,
        |  CAST(v0 AS DOUBLE) + CAST(v1 - v0 AS DOUBLE) *
        |    (CAST(us - t0 AS DOUBLE) / CAST(t1 - t0 AS DOUBLE))
        |    AS interp_cents
        |FROM w
        |WHERE isg = 1 AND t0 IS NOT NULL AND t1 IS NOT NULL
        |ORDER BY event_type, grid_us""".stripMargin,
    // the median-split batch rule decides which rule version flags each
    // row; thresholds are the same integer-cents literals the engine's
    // versioned config store carries
    "dynamic_rules_streaming" ->
      """WITH m AS (SELECT max(event_id) // 2 AS mid FROM events),
        |r(rule_version, event_type, thr_cents) AS (VALUES
        |  (0,'view',5000),(0,'click',5000),(0,'purchase',5000),
        |  (0,'signup',5000),(0,'error',5000),
        |  (1,'view',3000),(1,'purchase',3000),
        |  (1,'click',6000),(1,'signup',6000),(1,'error',6000)),
        |e AS (SELECT CASE WHEN event_id <= (SELECT mid FROM m)
        |               THEN 0 ELSE 1 END AS rule_version,
        |        event_type, CAST(round(value * 100) AS BIGINT) AS c
        |      FROM events)
        |SELECT CAST(e.rule_version AS BIGINT) AS rule_version, e.event_type,
        |  count(CASE WHEN c >= thr_cents THEN 1 END) AS n_flagged,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM e JOIN r USING (rule_version, event_type)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // each purchase joined to the user-value version valid strictly
    // before its own event time; per-user intervals partition time so
    // the match is unique; priorless purchases drop (inner join)
    "temporal_join_streaming" ->
      """WITH v AS (
        |  SELECT user_id, value, epoch_us(ts) AS f,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS t
        |  FROM events),
        |p AS (SELECT user_id, event_id, epoch_us(ts) AS us
        |      FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id, p.event_id, p.us, v.value AS as_of_value
        |FROM p JOIN v ON p.user_id = v.user_id
        |  AND v.f < p.us AND (v.t IS NULL OR v.t >= p.us)
        |ORDER BY p.event_id""".stripMargin,
    // LIVE dimension: batch 0 (purchase ids <= the purchases' median)
    // probes the v0 journal (events ids <= the events median, lead within
    // that prefix — its last version per user still OPEN); batch 1 probes
    // the fully-merged v1 ≡ the global lead table
    "temporal_join_updating_dim" ->
      """WITH em AS (SELECT max(event_id) // 2 AS mid FROM events),
        |pm AS (SELECT max(event_id) // 2 AS pmid FROM events
        |       WHERE event_type = 'purchase'),
        |v0 AS (SELECT user_id, value, epoch_us(ts) AS f,
        |         lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id) AS t
        |       FROM events WHERE event_id <= (SELECT mid FROM em)),
        |v1 AS (SELECT user_id, value, epoch_us(ts) AS f,
        |         lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id) AS t
        |       FROM events),
        |p AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |        CASE WHEN event_id <= (SELECT pmid FROM pm)
        |          THEN 0 ELSE 1 END AS b
        |      FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id, p.event_id, p.us,
        |       CAST(p.b AS BIGINT) AS dim_version, v.value AS as_of_value
        |FROM p JOIN v0 v ON p.b = 0 AND p.user_id = v.user_id
        |  AND v.f < p.us AND (v.t IS NULL OR v.t >= p.us)
        |UNION ALL
        |SELECT p.user_id, p.event_id, p.us,
        |       CAST(p.b AS BIGINT), v.value
        |FROM p JOIN v1 v ON p.b = 1 AND p.user_id = v.user_id
        |  AND v.f < p.us AND (v.t IS NULL OR v.t >= p.us)
        |ORDER BY event_id""".stripMargin,
    // LPA labels (4 unrolled majority rounds) and CC labels (8 unrolled
    // min-label rounds) scored by the same exact-integer modularity fold
    "community_modularity" -> communityModularityOracle,
    // the textbook all-pairs dominance statement the banded plan avoids
    "skyline_price_size" ->
      """SELECT p.p_partkey, p.p_retailprice, p.p_size FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
        |ORDER BY p.p_partkey""".stripMargin,
    // integer cents deltas inside the (type, day) partition; the square
    // sum is exact bigint; single-tick days pin rv = 0 on both engines
    "realized_variance_daily" ->
      """WITH b AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |        event_id,
        |        CAST(round(CAST(value AS DOUBLE) * 100.0) AS BIGINT) AS vc
        |       FROM events),
        |l AS (SELECT event_type, day,
        |       vc - lag(vc) OVER (PARTITION BY event_type, day
        |                          ORDER BY event_id) AS d
        |      FROM b),
        |g AS (SELECT event_type, day, CAST(count(d) AS BIGINT) AS n_deltas,
        |       CAST(coalesce(sum(d*d), 0) AS BIGINT) AS rv_num
        |      FROM l GROUP BY 1, 2)
        |SELECT event_type, day, n_deltas, rv_num,
        | CAST(rv_num AS DOUBLE) / 10000.0 AS rv
        |FROM g ORDER BY event_type, day""".stripMargin,
  )
    base ++ Map(
      "q1s_running_max_stateful"       -> base("q1_running_max"),
      "q1r_running_max_streaming"      -> base("q1_running_max"),
      "q1rdb_running_max_rocksdb"      -> base("q1_running_max"),
      "q1k_running_max_socket"         -> base("q1_running_max"),
      "q23ss_interval_join_streaming"  -> base("q23_interval_join"),
      // merged journal ≡ whole-corpus profile: exact halves algebraic,
      // same-lgK HLL union register-lossless (spec-pinned), gate boolean
      // identical — so the batch sketch oracle IS the incremental oracle
      "column_stats_incremental"       -> base("column_stats_profile_sketch"),
      "column_stats_compacted"         -> base("column_stats_profile_sketch"),
      // compaction is pure reorganization — the read must hash-match the
      // uncompacted journal's oracle exactly
      "dedup_incremental_compacted"    -> base("dedup_incremental_snapshot"),
      "cep_funnel_followedby_streaming" -> base("cep_funnel_followedby"),
      "cep_absence_alert_streaming"     -> base("cep_absence_alert"),
      "q6ss_revenue_join_stream_static" -> base("q6_revenue_by_nation"),
      // the outer form has its OWN oracle: zero-pair users appear with 0
      "q23lo_interval_join_outer" ->
        """SELECT a.user_id, count(b.event_id) AS n_pairs
          |FROM events a LEFT JOIN events b ON a.user_id = b.user_id
          | AND b.event_id > a.event_id
          | AND epoch_us(b.ts) - epoch_us(a.ts) <= 300000000
          |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,
      // the right-outer anchor: every b-row appears; n_heads counts the
      // padded run heads (no predecessor inside the window). The engine's
      // sentinel-exclusion filter (user_id >= 0) also excludes NULL and
      // negative REAL users on both sides — stated here so the convention
      // holds if a future fixture adds such rows (ADVICE r16 #2)
      "q23ro_interval_join_right_outer" ->
        """SELECT b.user_id, CAST(count(a.event_id) AS BIGINT) AS n_preds,
          | CAST(sum(CASE WHEN a.event_id IS NULL THEN 1 ELSE 0 END)
          |   AS BIGINT) AS n_heads
          |FROM events b LEFT JOIN events a ON a.user_id = b.user_id
          | AND b.event_id > a.event_id
          | AND epoch_us(b.ts) - epoch_us(a.ts) <= 300000000
          |WHERE b.user_id >= 0
          |GROUP BY b.user_id ORDER BY b.user_id""".stripMargin,
      // closed daily windows over deduplicated (user, day) arrivals ≡
      // the batch per-day distinct count
      "dau_daily_closed_streaming" ->
        """SELECT epoch_us(ts) // 86400000000 AS day,
          | CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
          |FROM events WHERE user_id IS NOT NULL
          |GROUP BY 1 ORDER BY 1""".stripMargin,
      "dedup_exact_streaming"          -> base("dedup_exact"),
      "dedup_exact_native_streaming" ->
        """SELECT DISTINCT md5(lower(trim(text))) AS fp_md5
          |FROM documents ORDER BY fp_md5""".stripMargin,
      // within-watermark dedup with delay > fixture span: the emitted key
      // set is exactly the distinct event-fingerprint set
      "dedup_exact_wwm_streaming" ->
        """SELECT DISTINCT md5(event_type || '|' || props) AS fp_md5
          |FROM events ORDER BY fp_md5""".stripMargin,
      "q2r_block_avg_streaming"        -> base("q2_block_avg"),
      "q2c_block_avg_checkpoint"       -> base("q2_block_avg"),
      "q3r_running_max_month_streaming" -> base("q3_running_max_month"),
      "q4r_threshold_gaps_streaming"   -> base("q4_threshold_gaps"),
      "q2s_block_avg_stateful"         -> base("q2_block_avg"),
      "q3s_running_max_month_stateful" -> base("q3_running_max_month"),
      "q4s_threshold_gaps_stateful"    -> base("q4_threshold_gaps"),
      "q21_topk_aggregator"            -> base("q7_top_parts"),
      "quality_filter_streaming"       -> base("quality_filter"),
      "q12s_tumbling_streaming"        -> base("q12_tumbling_hourly"),
      // the idempotent batch-id journal compacted newest-wins — same oracle
      "q12fb_tumbling_foreachbatch"    -> base("q12_tumbling_hourly"),
      // banded two-level prefix sum ≡ the single-window cumulative
      // (decimal addition is exact) — same oracle
      "pareto_parts_abc_scalable"      -> base("pareto_parts_abc"),
      // per-day HLL blobs unioned over the trailing window; sparse-mode
      // exact at fixture cardinality — same oracle
      "dau_rolling_7d_sketch"          -> base("dau_rolling_7d"),
      // overlapping windows stay open across micro-batches; the final
      // complete-mode emission must equal the batch hopping aggregate
      "q12ws_sliding_streaming"        -> base("q12w_sliding_halfhour"),
      // streaming last-event ValueState ≡ batch lead() window — same oracle
      "markov_transitions_streaming"   -> base("markov_transitions"),
      // last-view ValueState ≡ batch conditional window max — same oracle
      "attribution_last_touch_streaming" -> base("attribution_last_touch"),
      // (µs, value) ValueState intervals ≡ batch lead() window — same oracle
      "twap_by_type_streaming" -> base("twap_by_type"),
      // the reset recurrence carried across micro-batches — same oracle
      "cusum_by_type_streaming"        -> base("cusum_by_type"),
      // the smoothed value carried across micro-batches — same oracle
      "ewma_by_type_streaming"         -> base("ewma_by_type"),
      // peak and worst-drawdown-so-far cross the batch boundary together
      "drawdown_by_type_streaming"     -> base("drawdown_by_type"),
      // (level, trend) carried across micro-batches together — same oracle
      "holt_by_type_streaming"         -> base("holt_by_type"),
      // level, trend AND the seasonal ring buffer cross together
      "holt_winters_by_type_streaming" -> base("holt_winters_by_type"),
      // (prev, avg gain, avg loss) cross the batch boundary as one record
      "rsi_by_type_streaming"          -> base("rsi_by_type"),
      // all three coupled EMAs cross the batch boundary together
      "macd_by_type_streaming"         -> base("macd_by_type"),
      // the bar's open/high/low/close accumulate across micro-batches
      "ohlc_hourly_streaming"          -> base("ohlc_hourly"),
      // append mode: each bar emits once when the watermark closes its
      // hour; the sentinel flush closes every real bar, so the closed-bar
      // table IS the batch bar table
      "ohlc_hourly_closed"             -> base("ohlc_hourly"),
      // the replay (bulk, per-type watermark carriers, stragglers =
      // event_id % 97 == 0) makes late exactly the stragglers whose bar
      // the bulk watermark (ms-floored max bulk ts) had already closed —
      // stragglers in the bulk's final open hour merge, like the
      // aggregate. The engine routes per row off its own stored watermark
      "ohlc_late_sideoutput" ->
        """WITH mx AS (SELECT max(epoch_us(ts)) // 1000 * 1000 AS wm_us
          |            FROM events WHERE event_id % 97 <> 0)
          |SELECT event_id,
          |  epoch_us(ts) // 3600000000 * 3600 AS hour_start,
          |  event_type, value
          |FROM events, mx
          |WHERE event_id % 97 = 0
          |  AND (epoch_us(ts) // 3600000000 + 1) * 3600000000 <= mx.wm_us
          |ORDER BY event_id""".stripMargin,
      // incremental MERGE maintenance ≡ global lead(): the maintained
      // table's as-of snapshot answers the read-side form's oracle
      "scd2_upsert_snapshot"           -> base("scd2_asof_snapshot"),
      // the all-integer ledger crosses the batch boundary — same oracle
      "obv_by_type_streaming"          -> base("obv_by_type"),
      // the trailing-20 ring carried across micro-batches in keyed state
      "donchian_by_type_streaming"     -> base("donchian_by_type"),
      // merging delta aggregates must equal recomputing — same oracle
      "q12i_tumbling_incremental"      -> base("q12_tumbling_hourly"),
      "q13s_sessionize_streaming"      -> base("q13_sessionize"),
      // the spine is a pure function of the per-type hourly aggregate,
      // however incrementally the open-hour state emits it — same oracle
      "q29s_gapfill_locf_streaming"    -> base("q29_gapfill_locf"),
      // the spine is a pure function of the time-sorted event list — the
      // same batch oracle checks the ordered and disordered replays
      "q29o_gapfill_locf_ooo_streaming" -> base("q29_gapfill_locf"),
      // the native session_window form: gap+1us makes the split predicate
      // bit-identical to the lag/running-sum construction at micros
      "q13n_sessionize_native"         -> base("q13_sessionize"),
      "q13ns_sessionize_native_streaming" -> base("q13_sessionize"),
      // format round-trip: same computation, same oracle
      "text_stats_json_source"         -> base("text_stats"),
      "q5_orc_source"                  -> base("q5_pricing_summary"),
      // sessions are a pure function of the time-sorted event list — the
      // same batch oracle checks the ordered and disordered replays
      "q13o_sessionize_ooo_streaming"  -> base("q13_sessionize"),
      // the bloom prefilter is exact: no false negatives, false positives
      // die in the exact fingerprint join, freq cap unchanged per fp value
      "contamination_bloom"            -> base("contamination_external"),
      "q1p_running_max_secondary_sort" -> base("q1_running_max"),
      "q2p_block_avg_secondary_sort"   -> base("q2_block_avg"),
      "q3p_running_max_month_secondary_sort" -> base("q3_running_max_month"),
      "q4p_threshold_gaps_secondary_sort" -> base("q4_threshold_gaps"),
      // broadcast-table assignment ≡ literal assignment (same score, same
      // tie-break) — one oracle serves both
      "ann_ivf_bcast_topk"             -> base("ann_ivf_trained_topk"),
      // broadcast-table codeword assignment ≡ literal encoder (same score,
      // same tie-break, same slice geometry) — one oracle serves both
      "pq_codes_bcast"                 -> base("pq_codes"),
      // generations are a pure function of the time-sorted occurrence
      // list — the same lag-window oracle checks ordered, disordered, and
      // provider-swapped replays
      "dedup_exact_ttl_ooo_streaming"  -> base("dedup_exact_ttl_streaming"),
      "dedup_exact_ttl_rocksdb"        -> base("dedup_exact_ttl_streaming"),
      "dedup_exact_ttl_tws"            -> base("dedup_exact_ttl_streaming"),
      "q1t_running_max_tws"            -> base("q1_running_max"),
      "q2t_block_avg_tws"              -> base("q2_block_avg"),
      "q2ct_block_avg_tws_checkpoint"  -> base("q2_block_avg"),
      "q3t_running_max_month_tws"      -> base("q3_running_max_month"),
      "q4t_threshold_gaps_tws"         -> base("q4_threshold_gaps"),
      // the ListState ring ≡ the GroupState ring ≡ the batch fold — the
      // compound TWS state answers the same recursive oracle
      "holt_winters_by_type_tws"       -> base("holt_winters_by_type"),
      // the ring-NFA evaluates exactly the batch lag-window definition;
      // bursts and open matches span the micro-batch boundary
      "cep_times_burst_streaming"      -> base("cep_times_burst"),
      // one carried previous event per user ≡ the batch lead() pair;
      // the adjacency crosses the micro-batch boundary through state
      "cep_next_match_streaming"       -> base("cep_next_match"),
      // timer-driven closure ≡ batch-gap semantics — same oracle as q13
      "q13t_sessionize_tws"            -> base("q13_sessionize"),
      // star contraction computes the same labeling as min-label propagation
      "dedup_lsh_components_star"      -> base("dedup_lsh_components"),
      // Count-Min estimates are collision-free at the test vocabulary (31
      // tokens vs width 1024), so the open-vocabulary sketch form is exact
      // and shares token_rarity's oracle — the MG-family precedent
      "token_rarity_sketch"            -> base("token_rarity"),
      // per-language summaries are exact at test capacity in the streaming
      // form too — same oracle as the batch keyed sketch
      "vocab_topk_by_lang_sketch_streaming" -> base("vocab_topk_by_lang_sketch"),
      "ann_recall"                     -> annRecallOracle(base))
  }

  /** recall@k of every pruned ANN variant vs brute force: each side's FULL
    * registered oracle statement embeds as a parenthesized subquery (its own
    * CTE scope), so the report replays the exact per-variant chains the gate
    * already checks — the two sides cannot drift from their sources. */
  private def annRecallOracle(base: Map[String, String]): String = {
    val names = graft.operators.Similarity.RecallVariants
    val unions = names.map { n =>
      s"SELECT '$n' AS variant, q_id, vec_id FROM (\n${base(n)})"
    }.mkString("\nUNION ALL\n")
    s"""WITH brute AS (SELECT q_id, vec_id FROM (
       |${base("ann_brute_topk")})),
       |nrel AS (SELECT count(*) AS n_relevant FROM brute),
       |u AS (
       |$unions),
       |h AS (SELECT variant, count(*) AS hits FROM u JOIN brute USING (q_id, vec_id)
       |      GROUP BY variant),
       |names AS (SELECT unnest(${names.map(n => s"'$n'").mkString("[", ", ", "]")}) AS variant)
       |SELECT names.variant, coalesce(h.hits, 0) AS hits, nrel.n_relevant,
       | CAST(coalesce(h.hits, 0) AS DOUBLE)/nrel.n_relevant AS recall
       |FROM names LEFT JOIN h USING (variant), nrel
       |ORDER BY variant""".stripMargin
  }

  /** Synthesis-parameter CTE mirroring Multimodal's closed-form parameters
    * (imageW/imageH, audioSamples, videoW/videoH/videoFrames) — the oracle
    * recomputes what the REAL payload bytes were synthesized from, while
    * the Spark side parses the actual PNG/WAV/container bytes. */
  private val mmParamsCte: String =
    """mp AS (SELECT doc_id,
      |  doc_id % 3 AS kindn,
      |  16 + doc_id % 32 AS iw, 8 + doc_id % 16 AS ih,
      |  64 + doc_id % 512 AS asamp,
      |  8 + doc_id % 8 AS vw, 8 + doc_id % 4 AS vh, 2 + doc_id % 7 AS nf
      | FROM documents)""".stripMargin

  /** Polynomial hash over a range of synthesized sample values — mirrors
    * Multimodal.byteAt (value = ((id%1000003)*31 + f*97 + i) % 256) folded
    * with Multimodal.valueHash's (a*31+b) % P. `iExpr` is the flat sample
    * index in terms of the lambda variable `j`. */
  private def mmHashSql(nExpr: String, fExpr: String, iExpr: String): String =
    s"""list_reduce(list_transform(range($nExpr),
       | j -> CAST(((doc_id % 1000003)*31 + ($fExpr)*97 + ($iExpr)) % 256 AS BIGINT)),
       | (a,b) -> (a*31+b) % $P)""".stripMargin.replaceAll("\n", " ")

  private val mmOracle: Map[String, String] = Map(
    "mm_media_meta" ->
      // n_bytes closed forms: PNG with stored-block zlib = raw + 68 where
      // raw = h*(1+3w) (filter byte per row); WAV = 44-byte header + 2n;
      // GRFV = 8 + per-frame (4-byte length + PNG size)
      s"""WITH $mmParamsCte
         |SELECT doc_id AS media_id,
         | ['image','audio','video'][CAST(kindn AS INT) + 1] AS kind,
         | CAST(CASE kindn WHEN 0 THEN ih*(1+3*iw) + 68
         |                 WHEN 1 THEN 44 + 2*asamp
         |                 ELSE 8 + nf*(4 + vh*(1+3*vw) + 68) END AS BIGINT) AS n_bytes,
         | CAST(CASE kindn WHEN 0 THEN iw WHEN 1 THEN asamp ELSE vw END AS BIGINT) AS width,
         | CAST(CASE kindn WHEN 0 THEN ih WHEN 1 THEN 8000 ELSE vh END AS BIGINT) AS height,
         | CAST(CASE kindn WHEN 1 THEN 1 ELSE 3 END AS BIGINT) AS channels
         |FROM mp ORDER BY media_id""".stripMargin,
    "mm_media_features" ->
      s"""WITH $mmParamsCte,
         |pl AS (SELECT doc_id,
         |  CAST(CASE kindn WHEN 0 THEN iw*ih*3 WHEN 1 THEN asamp
         |       ELSE vw*vh*3 END AS BIGINT) AS plen FROM mp)
         |SELECT doc_id AS media_id, CAST(r.range AS BIGINT) AS feature_idx,
         | CASE WHEN plen // 8 = 0 THEN 0.0
         |  ELSE CAST(${mmHashSql("plen // 8", "0", "r.range*(plen // 8) + j")} % 1000 AS DOUBLE)/1000.0
         | END AS feature
         |FROM pl, range(8) r ORDER BY media_id, feature_idx""".stripMargin,
    "mm_video_frames" ->
      s"""WITH $mmParamsCte
         |SELECT doc_id AS media_id, CAST(r.range AS BIGINT) AS frame_idx,
         | ${mmHashSql("vw*vh*3", "r.range", "j")} AS frame_hash
         |FROM mp, range(8) r
         |WHERE kindn = 2 AND r.range < least(nf, 8)
         |ORDER BY media_id, frame_idx""".stripMargin,
    "mm_resize" ->
      // 2x decimation on the decoded sample grid: audio keeps every 2nd
      // sample (index 2j); image/video keep every 2nd RGB pixel, so output
      // byte j maps to input index (j div 3)*6 + j mod 3
      s"""WITH $mmParamsCte,
         |pl AS (SELECT doc_id, kindn,
         |  CAST(CASE kindn WHEN 0 THEN iw*ih*3 WHEN 1 THEN asamp
         |       ELSE vw*vh*3 END AS BIGINT) AS n_in,
         |  CAST(CASE kindn WHEN 0 THEN ((iw*ih+1)//2)*3 WHEN 1 THEN (asamp+1)//2
         |       ELSE ((vw*vh+1)//2)*3 END AS BIGINT) AS n_out
         | FROM mp)
         |SELECT doc_id AS media_id, n_in, n_out,
         | ${mmHashSql("n_out", "0", "CASE WHEN kindn = 1 THEN 2*j ELSE (j//3)*6 + j%3 END")} AS out_hash
         |FROM pl ORDER BY media_id""".stripMargin,
    "mm_video_frames_strided" ->
      // stride 2 over the original frame indices: sampled idx = 2r < nf
      s"""WITH $mmParamsCte
         |SELECT doc_id AS media_id, CAST(r.range * 2 AS BIGINT) AS frame_idx,
         | ${mmHashSql("vw*vh*3", "r.range * 2", "j")} AS frame_hash
         |FROM mp, range(8) r
         |WHERE kindn = 2 AND r.range * 2 < nf
         |ORDER BY media_id, frame_idx""".stripMargin,
    "mm_audio_resample" ->
      // nearest-floor 8000->6000 resample: n_out = 3n//4, out[j] = in[4j//3]
      s"""WITH $mmParamsCte,
         |pl AS (SELECT doc_id, asamp, (asamp * 3) // 4 AS nout
         |       FROM mp WHERE kindn = 1)
         |SELECT doc_id AS media_id, CAST(8000 AS BIGINT) AS rate_in,
         | CAST(6000 AS BIGINT) AS rate_out, CAST(asamp AS BIGINT) AS n_in,
         | CAST(nout AS BIGINT) AS n_out,
         | ${mmHashSql("nout", "0", "(j * 4) // 3")} AS out_hash
         |FROM pl ORDER BY media_id""".stripMargin,
    "mm_audio_energy" ->
      // per 32-sample frame: exact integer Σv, Σv², peak over the
      // synthesized sample values (integer aggregates are order-free, so
      // plain list_aggregate suffices — no fold discipline needed)
      s"""WITH $mmParamsCte,
         |au AS (SELECT doc_id, asamp FROM mp WHERE kindn = 1),
         |fr AS (SELECT doc_id, CAST(w.range AS BIGINT) AS win_idx,
         |   list_transform(range(32), j -> CAST(
         |     ((doc_id % 1000003)*31 + (w.range*32 + j)) % 256 AS BIGINT)) AS vs
         | FROM au, range(18) w WHERE w.range < asamp // 32)
         |SELECT doc_id AS media_id, win_idx,
         | CAST(list_aggregate(vs, 'sum') AS BIGINT) AS sum_v,
         | CAST(list_aggregate(list_transform(vs, v -> v*v), 'sum') AS BIGINT) AS energy,
         | CAST(list_aggregate(vs, 'max') AS BIGINT) AS peak
         |FROM fr ORDER BY media_id, win_idx""".stripMargin,
    "mm_audio_trim" ->
      // first/last window with energy >= 300000 over the same synthesized
      // 32-sample frames as mm_audio_energy; all-silent -> -1 sentinels
      s"""WITH $mmParamsCte,
         |au AS (SELECT doc_id, asamp FROM mp WHERE kindn = 1),
         |fr AS (SELECT doc_id, CAST(w.range AS BIGINT) AS win_idx,
         |   list_transform(range(32), j -> CAST(
         |     ((doc_id % 1000003)*31 + (w.range*32 + j)) % 256 AS BIGINT)) AS vs
         | FROM au, range(18) w WHERE w.range < asamp // 32),
         |en AS (SELECT doc_id, win_idx,
         |   CAST(list_aggregate(list_transform(vs, v -> v*v), 'sum') AS BIGINT) AS energy
         | FROM fr),
         |a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
         |   coalesce(min(CASE WHEN energy >= 300000 THEN win_idx END), -1) AS fv,
         |   coalesce(max(CASE WHEN energy >= 300000 THEN win_idx END), -1) AS lv
         | FROM en GROUP BY 1)
         |SELECT doc_id AS media_id, n_windows,
         | CAST(fv AS BIGINT) AS first_voiced, CAST(lv AS BIGINT) AS last_voiced,
         | CAST(CASE WHEN fv = -1 THEN n_windows ELSE fv END AS BIGINT) AS n_lead_trim,
         | CAST(CASE WHEN lv = -1 THEN 0 ELSE n_windows - 1 - lv END AS BIGINT) AS n_tail_trim
         |FROM a ORDER BY media_id""".stripMargin,
    "mm_video_scene_change" ->
      // adjacent-frame SAD: |byteAt(f,j) - byteAt(f-1,j)| summed over the
      // frame's pixels; frame_idx = the SECOND frame of the pair
      s"""WITH $mmParamsCte,
         |fr AS (SELECT doc_id, CAST(r.range AS BIGINT) AS f,
         |   CAST(vw*vh*3 AS BIGINT) AS npix,
         |   CAST(list_aggregate(list_transform(range(vw*vh*3),
         |     j -> abs(((doc_id % 1000003)*31 + r.range*97 + j) % 256
         |            - ((doc_id % 1000003)*31 + (r.range-1)*97 + j) % 256)),
         |     'sum') AS BIGINT) AS sad
         | FROM mp, range(8) r
         | WHERE kindn = 2 AND r.range >= 1 AND r.range < nf)
         |SELECT doc_id AS media_id, f AS frame_idx, npix AS n_pixels, sad,
         | CAST(sad > npix * 120 AS BIGINT) AS is_cut
         |FROM fr ORDER BY media_id, frame_idx""".stripMargin)

  // ---- DuckDB SQL macros mirroring graft.functions.TextFunctions exactly ----

  /** Per-token polynomial ASCII hashes (list<bigint>). */
  private val tokenHashesSql: String =
    s"""list_transform(string_split(text,' '),
       | t -> list_reduce(list_transform(string_split(t,''), c -> CAST(ascii(c) AS BIGINT)),
       |      (a,b) -> (a*31+b) % $P))""".stripMargin.replaceAll("\n", " ")

  /** The non-overlapping chunk-hash LIST over `ths` — the ONE DuckDB copy of
    * HashKernels.chunkHashes' formula (same width constant,
    * Dedup.DefaultChunkTokens); every chunk-consuming oracle builds on it so
    * the sides cannot drift. */
  private def chunkListSql: String = {
    val n = graft.operators.Dedup.DefaultChunkTokens
    s"""list_transform(range((len(ths)+${n - 1})//$n),
       | p -> list_reduce(ths[p*$n+1:p*$n+$n], (a,b) -> (a*31+b) % $P))"""
      .stripMargin.replaceAll("\n", " ")
  }

  /** Exploded chunk-hash CTE `p` over `t(doc_id, ths)`. */
  private def chunkHashCte: String =
    s"""p AS (SELECT doc_id, CAST(unnest($chunkListSql) AS BIGINT) AS ph
       | FROM t)""".stripMargin

  /** The fuzzy-join bucket cap, interpolated into the bucket-stats oracles
    * so the cap has exactly ONE definition (`Analytics.MaxFuzzyBucketSize`). */
  private val fuzzyBucketCap: Int = graft.operators.Analytics.MaxFuzzyBucketSize

  /** The doc-sim inverted-index df cap (`TextOps.DocSimDfCap`) — same
    * one-definition rule for the similarity join and its df-stats oracle. */
  private val docSimDfCap: Long = graft.operators.TextOps.DocSimDfCap

  /** MinHash signature width (`Dedup.MinHashA.size`) and estimated-Jaccard
    * floor (`Dedup.MinEstJaccard`) — interpolated into every LSH pair
    * oracle so retuning either cannot desynchronize engine and oracle
    * (the fuzzyBucketCap/docSimDfCap rule). */
  private val lshSigWidth: Int = graft.operators.Dedup.MinHashA.size
  private val minEstJaccard: Double = graft.operators.Dedup.MinEstJaccard

  /** The ngram-jaccard hot-shingle frequency cap (`Dedup.MaxShingleFreq`)
    * — shared by the pair oracle and the shingle-stats observable. */
  private val maxShingleFreq: Int = graft.operators.Dedup.MaxShingleFreq

  /** The incremental band index's arrival-rank admission rule — rank by
    * (increment residue, doc_id) within a bucket, admitted iff ≤ cap —
    * stated ONCE over the `br` band rows and shared by the pairs oracle
    * (`dedup_lsh_incremental`) and the membership oracle
    * (`dedup_lsh_index_compacted`), so the two oracles asserting the same
    * rule cannot drift (the lshBandCtes/lshSqlBody convention). */
  private def lshArrivalRankCte: String =
    s"""rk AS (SELECT *, row_number() OVER (PARTITION BY band_idx, band_hash
       |        ORDER BY doc_id % ${graft.operators.Dedup.SnapshotIncrements},
       |                 doc_id) AS arr
       |       FROM br)""".stripMargin

  /** Word-3-gram shingle hashes derived from token hashes. */
  private val shinglesSql: String =
    s"""(SELECT list_transform(range(1, len(ths)-1),
       |  i -> ((ths[i]*31 + ths[i+1]) % $P * 31 + ths[i+2]) % $P)
       | FROM (SELECT $tokenHashesSql AS ths))""".stripMargin.replaceAll("\n", " ")

  /** Word-5-gram shingle hashes over a `ths` column (the raw-n-gram
    * contamination width) — same rolling fold as HashExpressions
    * .shingleHashes(_, 5). */
  private val shingles5Sql: String =
    s"""list_transform(range(1, len(ths)-3),
       | i -> ((((ths[i]*31 + ths[i+1]) % $P * 31 + ths[i+2]) % $P * 31
       |         + ths[i+3]) % $P * 31 + ths[i+4]) % $P)"""
      .stripMargin.replaceAll("\n", " ")

  /** The 12 MinHash components (constants match Dedup.MinHashA/B). */
  private def minhashColsSql: String =
    graft.operators.Dedup.MinHashA.zip(graft.operators.Dedup.MinHashB).zipWithIndex.map {
      case ((a, b), j) =>
        s"coalesce(list_min(list_transform(shingles, s -> ($a*s + $b) % $P)), $P) AS mh$j"
    }.mkString(", ")

  /** The 4 LSH band hashes over 3-component ranges (matches Dedup.minhashLsh). */
  private def bandColsSql: String =
    (0 until 4).map { bIdx =>
      val base = bIdx * 3
      s"((mh$base*31 + mh${base + 1}) % $P * 31 + mh${base + 2}) % $P AS band$bIdx"
    }.mkString(", ")

  /** Unfiltered quality-scoring CTEs (qt, qs) — mirrors
    * TextOps.qualityScoredOf; shared by quality_filter and
    * curation_manifest. */
  private def qualityScoredCtes: String =
    """qt AS (
      | SELECT doc_id,
      |  len(string_split(text,' ')) AS n_tokens,
      |  len(list_filter(string_split(text,' '), x -> x='the' OR x='a')) AS score_en,
      |  len(list_filter(string_split(text,' '), x -> x='der' OR x='die' OR x='und')) AS score_de,
      |  len(list_filter(string_split(text,' '), x -> x='le' OR x='la' OR x='et')) AS score_fr,
      |  len(list_filter(string_split(text,' '), x -> x='el' OR x='los' OR x='y')) AS score_es
      | FROM documents),
      |qs AS (
      | SELECT doc_id, n_tokens,
      |  CAST(least(n_tokens,100) AS DOUBLE)/100.0*(1.0 - CAST(score_en AS DOUBLE)/n_tokens) AS quality_score,
      |  CASE WHEN greatest(score_en, score_de, score_fr, score_es) = 0 THEN 'und'
      |   WHEN score_en = greatest(score_en, score_de, score_fr, score_es) THEN 'en'
      |   WHEN score_de = greatest(score_en, score_de, score_fr, score_es) THEN 'de'
      |   WHEN score_fr = greatest(score_en, score_de, score_fr, score_es) THEN 'fr'
      |   ELSE 'es' END AS lang_guess
      | FROM qt)""".stripMargin

  /** Stratified-split CTEs (spt, spr, sp) — mirrors TextOps.splitAssignOf;
    * shared by split_stratified and curation_manifest. */
  private def splitCtes: String =
    """spt AS (
      | SELECT doc_id, lang, source,
      |  ((doc_id % 1000000007) * 2654435761) % 1000000007 AS h
      | FROM documents),
      |spr AS (
      | SELECT doc_id, lang, source,
      |  (row_number() OVER (PARTITION BY lang, source ORDER BY h, doc_id) - 1) % 10 AS slot
      | FROM spt),
      |sp AS (
      | SELECT doc_id, lang, source,
      |  CASE WHEN slot < 8 THEN 'train' WHEN slot < 9 THEN 'val' ELSE 'test' END AS split
      | FROM spr)""".stripMargin

  /** One SimHash bit term: sign of the ±1 vote sum, scaled by 2^j. */
  private def simhashBitSql(j: Int): String =
    s"CASE WHEN list_sum(list_transform(ths, h -> ((h >> $j) & 1)*2 - 1)) > 0 THEN ${1L << j} ELSE 0 END"

  /** The MinHash/LSH candidate-pair query WITHOUT the final ORDER BY, so it
    * can embed both standalone and as the edge list of the component query.
    * Band-row shape with the per-bucket membership cap, mirroring
    * Dedup.minhashLshPairsOf exactly (Dedup.MaxLshBucketSize). */
  /** The shared band-row CTEs (d, sig, banded, br) — the input of both the
    * candidate-pair query and the bucket-stats observability query. */
  private def lshBandCtes: String = {
    val mhList = (0 until lshSigWidth).map(j => s"mh$j").mkString(", ")
    s"""d AS (SELECT doc_id, $shinglesSql AS shingles FROM documents),
       |sig AS (SELECT doc_id, $minhashColsSql FROM d),
       |banded AS (SELECT *, $bandColsSql FROM sig WHERE mh0 <> $P),
       |br AS (
       | ${(0 until 4).map(b =>
            s"SELECT doc_id, $b AS band_idx, band$b AS band_hash, $mhList FROM banded")
            .mkString("\n | UNION ALL ")})""".stripMargin
  }

  private def lshSqlBody: String = {
    val cap = graft.operators.Dedup.MaxLshBucketSize
    s"""WITH $lshBandCtes,
       |bf AS (SELECT band_idx, band_hash FROM br GROUP BY band_idx, band_hash
       |       HAVING count(*) >= 2 AND count(*) <= $cap),
       |cand AS (
       | SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  ${(0 until lshSigWidth).map(j => s"a.mh$j AS a$j, b.mh$j AS b$j").mkString(", ")}
       | FROM br a
       |  JOIN bf ON bf.band_idx = a.band_idx AND bf.band_hash = a.band_hash
       |  JOIN br b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       |   AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, est_jaccard FROM (
       | SELECT doc_a, doc_b,
       |  CAST(${(0 until lshSigWidth).map(j => s"CASE WHEN a$j = b$j THEN 1 ELSE 0 END").mkString(" + ")} AS DOUBLE)/$lshSigWidth AS est_jaccard
       | FROM cand)
       |WHERE est_jaccard >= $minEstJaccard""".stripMargin
  }

  /** Sign-LSH bucket over literal hyperplanes — constants generated by the
    * same integer recurrence as Similarity.hyperplanes. */
  private def bucketSqlPlanes(vecExpr: String, planes: Seq[Array[Double]]): String =
    planes.zipWithIndex.map { case (p, j) =>
      // Locale.ROOT: the default-locale f"" interpolator emits "0,123" under
      // decimal-comma locales, which is invalid SQL
      val lst = p.map(v => String.format(java.util.Locale.ROOT, "%.3f", Double.box(v)))
        .mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product($vecExpr, $lst) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")

  private def bucketSql(vecExpr: String): String =
    bucketSqlPlanes(vecExpr, graft.operators.Similarity.hyperplanes(6, 64))

  /** Band `b` of cosineNearDup's 4x2 sign-LSH banding: planes (2b, 2b+1) of
    * the same 8-plane family Similarity.cosineNearDup slices. */
  private def nearDupBandSql(vecExpr: String, b: Int): String =
    bucketSqlPlanes(vecExpr,
      graft.operators.Similarity.hyperplanes(8, 64).slice(2 * b, 2 * b + 2))

  /** The hybrid-RRF oracle, GENERATED for both dense retrievers (brute /
    * IVF-pruned) so the fusion statement cannot drift between them — only
    * the dense candidate CTE's cell filter differs. */
  private def hybridRrfOracle(ivfPruned: Boolean): String = {
    // pruned arm: the dense candidates come from vec 0's 4 nearest TRAINED
    // coarse cells — the full Lloyd chain replayed, the probe list ranked
    // by (score, cid) exactly as the engine's array_sort slice
    val trainedCtes = if (ivfPruned)
      s"""$kmeansCtes,
         |ivfb AS (SELECT v.vec_id, v.vec, a3cl.cluster
         |         FROM kv v JOIN $kmeansFinalAssign a3cl USING (vec_id)),
         |ivfq AS (SELECT cid AS q_cluster FROM (
         |    SELECT s.cid, row_number() OVER (ORDER BY s.score, s.cid) AS prk
         |    FROM ${kmeansFinalAssign}_s s WHERE s.vec_id = 0) WHERE prk <= 4),
         |""".stripMargin
    else ""
    val denseCand = if (ivfPruned)
      s"""dc AS (SELECT b.vec_id AS doc_id,
         |        ${cosineSql("qv.q_vec", "b.vec")} AS cos
         |       FROM ivfb b JOIN ivfq ON b.cluster = ivfq.q_cluster, qv
         |       WHERE b.vec_id <> 0),""".stripMargin
    else
      s"""dc AS (SELECT e.vec_id AS doc_id,
         |        ${cosineSql("qv.q_vec", "e.embedding::DOUBLE[]")} AS cos
         |       FROM embeddings e, qv WHERE e.vec_id <> 0),""".stripMargin
    s"""WITH ${trainedCtes}t AS (SELECT doc_id, $tokenHashesSql AS ths FROM documents),
       |tk AS (SELECT doc_id, unnest(ths) AS th FROM t),
       |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tk GROUP BY doc_id),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |        CAST(sum(dl) AS BIGINT) AS total_tokens FROM dl),
       |dfq AS (SELECT th, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tk GROUP BY th),
       |q AS (SELECT DISTINCT unnest($tokenHashesSql) AS th FROM documents WHERE doc_id = 0),
       |s AS (SELECT tf.doc_id,
       |   (CAST(st.n_docs AS DOUBLE) - CAST(dfq.df AS DOUBLE) + 0.5)
       |     / (CAST(dfq.df AS DOUBLE) + 0.5) AS idf,
       |   (CAST(tf.tf AS DOUBLE) * 2.2)
       |     / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
       |        (CAST(dl.dl AS DOUBLE)
       |          / (CAST(st.total_tokens AS DOUBLE) / CAST(st.n_docs AS DOUBLE))))) AS tfn
       | FROM (SELECT doc_id, th, CAST(count(*) AS BIGINT) AS tf
       |        FROM tk JOIN q USING (th) GROUP BY doc_id, th) tf
       | JOIN dfq USING (th) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st),
       |sc AS (SELECT doc_id, CAST(SUM(CAST(idf * tfn AS DECIMAL(28,12))) AS DOUBLE) AS score
       |       FROM s GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 101),
       |lex AS (SELECT doc_id, lex_rank FROM (
       |    SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id)
       |      AS BIGINT) AS lex_rank FROM sc WHERE doc_id <> 0)
       |  WHERE lex_rank <= 100),
       |qv AS (SELECT embedding::DOUBLE[] AS q_vec
       |       FROM embeddings WHERE vec_id = 0),
       |$denseCand
       |dtop AS (SELECT doc_id, cos FROM dc ORDER BY cos DESC, doc_id LIMIT 100),
       |den AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY cos DESC, doc_id)
       |          AS BIGINT) AS dense_rank FROM dtop),
       |f AS (SELECT coalesce(lex.doc_id, den.doc_id) AS doc_id,
       |        coalesce(lex.lex_rank, 0) AS lex_rank,
       |        coalesce(den.dense_rank, 0) AS dense_rank,
       |        (CASE WHEN lex.lex_rank IS NULL THEN 0.0
       |              ELSE 1.0 / (60.0 + CAST(lex.lex_rank AS DOUBLE)) END
       |         + CASE WHEN den.dense_rank IS NULL THEN 0.0
       |                ELSE 1.0 / (60.0 + CAST(den.dense_rank AS DOUBLE)) END) AS rrf
       |      FROM lex FULL OUTER JOIN den ON lex.doc_id = den.doc_id)
       |SELECT doc_id, CAST(lex_rank AS BIGINT) AS lex_rank,
       |  CAST(dense_rank AS BIGINT) AS dense_rank, rrf
       |FROM f ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin
  }

  /** Cosine with the exact same association as Similarity.cosine. */
  private def cosineSql(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  // ---- k-means CTE chain mirroring Similarity.kmeansCentroids exactly ----

  private val KMeansK = 8
  private val KMeansRounds = 2
  private val KMeansDim = 64

  /** Assignment CTE: per (vector, centroid) score = cc - 2*dot (same
    * association as Similarity.withCluster), argmin tie-broken by centroid
    * id via row_number. `src` is the vector view being assigned — the full
    * table for final assignment, the train view inside sampled rounds. */
  private def kmeansAssignCte(cCte: String, name: String, src: String = "kv"): String =
    s"""${name}_s AS (
       | SELECT v.vec_id, c.cid,
       |   list_dot_product(c.cvec, c.cvec) - 2*list_dot_product(v.vec, c.cvec) AS score
       | FROM $src v, $cCte c),
       |$name AS (
       | SELECT vec_id, cid AS cluster FROM (
       |   SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rk
       |   FROM ${name}_s) WHERE rk = 1)""".stripMargin

  /** Mean-recompute CTE: per (cluster, dim) the fixed-point BIGINT sum
    * (floor(comp * 2^30)) — exact, order-independent — then
    * (CAST(sum AS DOUBLE)/count)/2^30 in that association
    * (Similarity.KMeansQuantum). */
  private def kmeansRecomputeCte(aCte: String, name: String, src: String = "kv",
                                 dim: Int = KMeansDim): String = {
    val q = graft.operators.Similarity.KMeansQuantum
    s"""$name AS (
       | SELECT cluster AS cid, list(mean ORDER BY dim) AS cvec FROM (
       |   SELECT cluster, CAST(r.range AS INT) AS dim,
       |     CAST(CAST(sum(CAST(floor(vec[CAST(r.range AS INT)+1] * $q) AS BIGINT)) AS BIGINT) AS DOUBLE)/count(*)/$q AS mean
       |   FROM $aCte JOIN $src USING (vec_id), range($dim) r GROUP BY 1, 2) GROUP BY 1)""".stripMargin
  }

  private val kvCte = "kv AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings)"

  /** [[kvCte]] with the label kept — the embedding_outliers base view. */
  private val kvLabelCte =
    "kvl AS (SELECT vec_id, label, embedding::DOUBLE[] AS vec FROM embeddings)"

  /** The Lloyd chain body (everything after `kv`): init from the first k
    * vec_ids, `KMeansRounds` assign+recompute rounds, one final assignment.
    * Split from [[kvCte]] so it composes with the PQ chains in one WITH. */
  private def kmeansChain: String = {
    val rounds = (1 to KMeansRounds).map { r =>
      kmeansAssignCte(if (r == 1) "c0" else s"c${r - 1}", s"a$r") + ",\n" +
        kmeansRecomputeCte(s"a$r", s"c$r")
    }.mkString(",\n")
    s"""c0 AS (SELECT vec_id AS cid, vec AS cvec FROM kv WHERE vec_id < $KMeansK),
       |$rounds,
       |${kmeansAssignCte(s"c$KMeansRounds", kmeansFinalAssign)}""".stripMargin
  }

  /** The full Lloyd chain including the `kv` base view. */
  private def kmeansCtes: String = s"$kvCte,\n$kmeansChain"

  private def kmeansFinalAssign: String = s"a${KMeansRounds + 1}"

  /** Trained-IVF multi-probe oracle, parameterized by nProbe — probe2 and
    * probe4 (the recall-vs-cost curve's points) must share one SQL body or
    * the curve's points could silently diverge in shape. */
  private def ivfTrainedProbeOracle(nProbe: Int): String =
    s"""WITH $kmeansCtes,
       |base AS (SELECT v.vec_id, v.vec, a.cluster
       |         FROM kv v JOIN $kmeansFinalAssign a USING (vec_id)),
       |qs AS (SELECT s.vec_id AS q_id, s.cid AS q_cluster,
       |        row_number() OVER (PARTITION BY s.vec_id ORDER BY s.score, s.cid) AS prk
       |       FROM ${kmeansFinalAssign}_s s WHERE s.vec_id % 100 = 0),
       |q AS (SELECT qs.q_id, v.vec AS q_vec, qs.q_cluster
       |      FROM qs JOIN kv v ON v.vec_id = qs.q_id WHERE prk <= $nProbe),
       |c AS (
       | SELECT q.q_id, b.vec_id, ${cosineSql("q.q_vec", "b.vec")} AS cos
       | FROM base b JOIN q ON b.cluster = q.q_cluster AND b.vec_id <> q.q_id),
       |r AS (SELECT q_id, vec_id, cos,
       |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk FROM c)
       |SELECT q_id, rk, vec_id, cos FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin

  /** IVF-PQ multi-probe oracle, parameterized by nProbe:
    * ann_ivfpq_topk's search with the trained probe list — each query's
    * nProbe nearest coarse cells, still scored by ADC over codes. */
  private def ivfPqProbeOracle(nProbe: Int): String =
    s"""WITH $kvCte,
       |$kmeansChain,
       |${pqChains()},
       |${pqCodesCte},
       |qs AS (SELECT s.vec_id AS q_id, s.cid AS q_cluster,
       |        row_number() OVER (PARTITION BY s.vec_id ORDER BY s.score, s.cid) AS prk
       |       FROM ${kmeansFinalAssign}_s s WHERE s.vec_id % 100 = 0),
       |q AS (SELECT qs.q_id, v.vec AS q_vec, qs.q_cluster
       |      FROM qs JOIN kv v ON v.vec_id = qs.q_id WHERE prk <= $nProbe),
       |s AS (SELECT q.q_id, b.vec_id, $adcScoreSql AS score
       | FROM codes b JOIN $kmeansFinalAssign ce USING (vec_id), q, $adcCwTables
       | WHERE b.vec_id <> q.q_id AND ce.cluster = q.q_cluster AND $adcCwMatch),
       |r AS (SELECT q_id, vec_id, score,
       |  row_number() OVER (PARTITION BY q_id ORDER BY score ASC, vec_id ASC) AS rk FROM s)
       |SELECT q_id, rk, vec_id, score FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin

  // ---- PQ CTE chains mirroring Similarity.pqCodebooks/pqCodesOf exactly ----

  private def PqM = graft.operators.Similarity.PqM
  private def PqSub = KMeansDim / PqM

  /** One Lloyd chain per subspace j over the sliced view `kv_pj`
    * (vec[j·sub+1 : (j+1)·sub]), seeded from the first k vec_ids' SUBvectors
    * and recomputed at the subspace dimensionality; `af_pj` is subspace j's
    * final codeword assignment. */
  /** The M per-subspace Lloyd chains over `base` (the raw `kv` view, or a
    * residual view for residual PQ). */
  private def pqChains(base: String = "kv"): String = {
    val k = graft.operators.Similarity.PqK
    val nRounds = graft.operators.Similarity.PqRounds
    (0 until PqM).map { j =>
      val rounds = (1 to nRounds).map { r =>
        kmeansAssignCte(if (r == 1) s"c0_p$j" else s"c${r - 1}_p$j", s"a${r}_p$j",
          s"kv_p$j") + ",\n" +
          kmeansRecomputeCte(s"a${r}_p$j", s"c${r}_p$j", s"kv_p$j", PqSub)
      }.mkString(",\n")
      s"""kv_p$j AS (SELECT vec_id, vec[${j * PqSub + 1}:${(j + 1) * PqSub}] AS vec FROM $base),
         |c0_p$j AS (SELECT vec_id AS cid, vec AS cvec FROM kv_p$j WHERE vec_id < $k),
         |$rounds,
         |${kmeansAssignCte(s"c${nRounds}_p$j", s"af_p$j", s"kv_p$j")}""".stripMargin
    }.mkString(",\n")
  }

  private def pqCtes: String = s"$kvCte,\n${pqChains()}"

  /** Residual view: vec := vec - centroid(assigned cell), components
    * subtracted index-wise against the trained coarse centroid table. */
  private def residualCte: String =
    s"""kvr AS (SELECT v.vec_id, a.cluster,
       | list_transform(range($KMeansDim),
       |  i -> v.vec[CAST(i AS INT)+1] - c.cvec[CAST(i AS INT)+1]) AS vec
       | FROM kv v JOIN $kmeansFinalAssign a USING (vec_id)
       | JOIN c$KMeansRounds c ON c.cid = a.cluster)""".stripMargin

  /** Per-pair ADC score: the M per-subspace terms added LEFT-TO-RIGHT,
    * mirroring Similarity.adcRankTopK's reduce — float addition isn't
    * associative, so the association is part of the contract. Expects the
    * codeword tables aliased `cw0..` ([[adcCwTables]]) matched to the pair's
    * codes ([[adcCwMatch]]), query vector as `q.q_vec`, codes row as `b`. */
  private def adcScoreSql: String = (0 until PqM).map { j =>
    s"(list_dot_product(cw$j.cvec, cw$j.cvec) - " +
      s"2*list_dot_product(q.q_vec[${j * PqSub + 1}:${(j + 1) * PqSub}], cw$j.cvec))"
  }.mkString(" + ")

  private def adcCwTables: String = (0 until PqM)
    .map(j => s"c${graft.operators.Similarity.PqRounds}_p$j cw$j").mkString(", ")

  private def adcCwMatch: String =
    (0 until PqM).map(j => s"cw$j.cid = b.code$j").mkString(" AND ")

  /** The per-vector code row (vec_id, code0..code{M-1}) joined from the M
    * final assignments. */
  private def pqCodesCte: String = {
    val cols = (0 until PqM).map(j => s"CAST(a$j.cluster AS BIGINT) AS code$j").mkString(", ")
    val joins = (1 until PqM).map(j => s"JOIN af_p$j a$j USING (vec_id)").mkString(" ")
    s"codes AS (SELECT a0.vec_id, $cols FROM af_p0 a0 $joins)"
  }

  private val KMeansSampleMod = 4

  /** The sampled Lloyd chain (Similarity.kmeansAssignmentsSampled): training
    * rounds run over `kt` (vec_id % sampleMod = 0), seeded from the first k
    * SAMPLED vectors; only the final assignment reads the full table. */
  private def kmeansCtesSampled: String = {
    val rounds = (1 to KMeansRounds).map { r =>
      kmeansAssignCte(if (r == 1) "c0" else s"c${r - 1}", s"a$r", "kt") + ",\n" +
        kmeansRecomputeCte(s"a$r", s"c$r", "kt")
    }.mkString(",\n")
    s"""kv AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
       |kt AS (SELECT vec_id, vec FROM kv WHERE vec_id % $KMeansSampleMod = 0),
       |c0 AS (SELECT vec_id AS cid, vec AS cvec FROM kt
       |       WHERE vec_id < ${KMeansK * KMeansSampleMod}),
       |$rounds,
       |${kmeansAssignCte(s"c$KMeansRounds", kmeansFinalAssign)}""".stripMargin
  }
}
