package graft

import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY §2 re-expressed over the
  * driver testdata) plus the training-data-pipeline operators (dedup,
  * similarity, text analysis, multimodal). `oracleSql` carries the DuckDB
  * equivalent for every SQL-expressible entry; the rest get the driver's
  * rows-only check and are additionally covered by ScalaTest suites.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The movies-denormalization shape (SURVEY J1/A2/A5) over the star schema.
    */
  def entry(spark: SparkSession): DataFrame =
    RelationalOps.denormDocs(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Relational core (SURVEY §2.2–§2.5)
    "q_pricing_summary"  -> (RelationalOps.pricingSummary(_, _)),
    "q_filter_project"   -> (RelationalOps.filterProject(_, _)),
    "q_denorm_docs"      -> (RelationalOps.denormDocs(_, _)),
    "q_denorm_nested"    -> (DocumentOps.denormNested(_, _)),
    "q_genre_docs"       -> (DocumentOps.genreDocs(_, _)),
    "q_person_docs"      -> (DocumentOps.personDocs(_, _)),
    "q_filtered_collect" -> (RelationalOps.filteredCollect(_, _)),
    "q_scalar_funcs"     -> (RelationalOps.scalarFuncs(_, _)),
    "q_topk_revenue"     -> (RelationalOps.topkRevenue(_, _)),
    "q_pagination"       -> (RelationalOps.pagination(_, _)),
    "q_page_seek"        -> ((s, d) => RelationalOps.pageSeek(s, d)),
    "q_contains_search"  -> (RelationalOps.containsSearch(_, _)),
    "q_prefix_search"    -> (RelationalOps.prefixSearch(_, _)),
    "q_validate"         -> (RelationalOps.validateConstraints(_, _)),
    "q_count_envelope"   -> (RelationalOps.countEnvelope(_, _)),
    "q_facet_filter"     -> (RelationalOps.facetFilter(_, _)),
    "q_facet_rollup"     -> (RelationalOps.facetRollup(_, _)),
    "q_histogram_agg"    -> ((s, d) => RelationalOps.histogramAgg(s, d)),
    "q_stats_agg"        -> (RelationalOps.extendedStats(_, _)),
    "q_percentile_ranks" -> ((s, d) => RelationalOps.percentileRanks(s, d)),
    "q_composite_agg"    -> ((s, d) => RelationalOps.compositeAgg(s, d)),
    "q_topk_per_group"   -> ((s, d) => RelationalOps.topkPerGroup(s, d)),
    "q_approx_distinct"  -> (RelationalOps.approxDistinct(_, _)),
    // Incremental/CDC batch faces + time series (SURVEY §2.7)
    "q_watermark_scan"   -> (EventsOps.watermarkScan(_, _)),
    "q_events_hourly"    -> (EventsOps.eventsHourly(_, _)),
    "q_date_histogram"   -> ((s, d) => EventsOps.dateHistogramFilled(s, d)),
    "q_window_lag"       -> (EventsOps.windowLag(_, _)),
    "q_json_extract"     -> (EventsOps.jsonExtract(_, _)),
    "q_sessionize"       -> (EventsOps.sessionize(_, _)),
    "q_funnel"           -> (EventsOps.funnel(_, _)),
    "q_retention"        -> (EventsOps.retention(_, _)),
    "q_volume_anomaly"   -> (EventsOps.volumeAnomaly(_, _)),
    "q_geo_distance"     -> ((s, d) => GeoOps.geoDistance(s, d)),
    "q_geo_distance_stored" -> ((s, d) => GeoOps.geoDistanceStored(s, d)),
    "q_geo_grid_stored"   -> ((s, d) => GeoOps.geoGridStored(s, d)),
    "q_geo_bounds_stored" -> ((s, d) => GeoOps.geoBoundsStored(s, d)),
    "q_geo_grid"         -> ((s, d) => GeoOps.geoGrid(s, d)),
    "q_geo_bounds"       -> ((s, d) => GeoOps.geoBounds(s, d)),
    "q_active_users"     -> (EventsOps.activeUsers(_, _)),
    "q_active_users_approx" -> (EventsOps.activeUsersApproxGraded(_, _)),
    "q_percentiles_agg"  -> (EventsOps.percentilesAgg(_, _)),
    "q_percentiles_approx" -> (EventsOps.percentilesApproxServed(_, _)),
    "q_pipeline_agg"     -> (EventsOps.pipelineAgg(_, _)),
    "q_asof_join"        -> (EventsOps.asofJoin(_, _)),
    "q_range_join"       -> ((s, d) => EventsOps.rangeJoin(s, d)),
    "q_composed_tick"    -> (graft.streaming.ComposedEtlQuery.composedTick(_, _)),
    // Full-text search (ES query surface, SURVEY §3.3 / F10-F14 / A9)
    "q_search_match"     -> ((s, d) => SearchOps.matchQuery(s, d)),
    "q_search_match_idx" -> ((s, d) => SearchOps.matchQueryIndexed(s, d)),
    "q_search_match_ru"  -> ((s, d) => SearchOps.matchQueryRu(s, d)),
    "q_search_fuzzy"     -> ((s, d) => SearchOps.fuzzyQuery(s, d)),
    "q_search_fuzzy_idx" -> ((s, d) => SearchOps.fuzzySearchIndexed(s, d)),
    "q_search_multifield" -> ((s, d) => SearchOps.multiFieldFuzzy(s, d)),
    "q_search_multifield_idx" -> ((s, d) => SearchOps.multiFieldFuzzyIndexed(s, d)),
    "q_search_nested"    -> (SearchOps.nestedQuery(_, _)),
    "q_term_lookup"      -> ((s, d) => SearchOps.termLookup(s, d)),
    "q_terms_agg"        -> ((s, d) => SearchOps.termsAgg(s, d)),
    "q_inverted_search"  -> ((s, d) => SearchOps.invertedSearch(s, d)),
    "q_search_ranked"    -> ((s, d) => SearchOps.rankedSearch(s, d)),
    "q_search_bm25"      -> ((s, d) => SearchOps.bm25Search(s, d)),
    "q_search_bm25_bucketed" -> ((s, d) => SearchOps.bm25BucketedSearch(s, d)),
    "q_search_rescore"   -> ((s, d) => SearchOps.rescore(s, d)),
    "q_search_collapse"  -> ((s, d) => SearchOps.collapseSearch(s, d)),
    "q_top_hits"         -> ((s, d) => SearchOps.topHits(s, d)),
    "q_incremental_dedup" -> ((s, d) => DedupOps.incrementalDedup(s, d)),
    "q_search_boosting"  -> ((s, d) => SearchOps.boostingQuery(s, d)),
    "q_search_boosting_idx" -> ((s, d) => SearchOps.boostingQueryIndexed(s, d)),
    "q_shard_manifest"   -> (PipelineOps.shardManifest(_, _)),
    "q_search_after"     -> ((s, d) => SearchOps.searchAfter(s, d)),
    "q_search_phrase"    -> ((s, d) => SearchOps.phraseSearch(s, d)),
    "q_search_phrase_idx" -> ((s, d) => SearchOps.phraseSearchIndexed(s, d)),
    "q_search_phrase_prefix" -> ((s, d) => SearchOps.phrasePrefixSearch(s, d)),
    "q_search_bool"      -> ((s, d) => SearchOps.boolQuery(s, d)),
    "q_search_query_string" -> ((s, d) => QueryStringOps.queryString(s, d)),
    "q_search_suggest"   -> ((s, d) => SearchOps.termSuggest(s, d)),
    "q_search_complete"  -> ((s, d) => SearchOps.completeSuggest(s, d)),
    "q_search_phrase_suggest" -> ((s, d) => SearchOps.phraseSuggest(s, d)),
    "q_search_dis_max"   -> ((s, d) => SearchOps.disMaxSearch(s, d)),
    "q_rank_feature"     -> ((s, d) => SearchOps.rankFeatureSearch(s, d)),
    "q_adjacency_matrix" -> ((s, d) => SearchOps.adjacencyMatrix(s, d)),
    "q_sampler_terms"    -> ((s, d) => SearchOps.samplerTerms(s, d)),
    "q_distance_feature" -> ((s, d) => SearchOps.distanceFeatureSearch(s, d)),
    "q_percolate"        -> ((s, d) => SearchOps.percolate(s, d)),
    "q_search_wildcard"  -> ((s, d) => SearchOps.wildcardSearch(s, d)),
    "q_function_score"   -> ((s, d) => SearchOps.functionScore(s, d)),
    "q_function_score_gauss" -> ((s, d) => SearchOps.functionScoreGauss(s, d)),
    "q_function_score_exp" -> ((s, d) => SearchOps.functionScoreExp(s, d)),
    "q_search_highlight" -> ((s, d) => SearchOps.highlight(s, d)),
    "q_search_regexp"    -> ((s, d) => SearchOps.regexQuery(s, d)),
    "q_pivot"            -> ((s, d) => RelationalOps.pivotStatus(s, d)),
    "q_hybrid_search"    -> ((s, d) => SearchOps.hybridSearch(s, d)),
    "q_more_like_this"   -> ((s, d) => SearchOps.moreLikeThis(s, d)),
    "q_sig_terms"        -> ((s, d) => SearchOps.significantTerms(s, d)),
    "q_keywords"         -> ((s, d) => SearchOps.keywords(s, d)),
    // Text analysis (training-data pipeline)
    "q_token_count"      -> (TextOps.tokenCount(_, _)),
    "q_token_count_bpe"  -> (TextOps.tokenCountBpe(_, _)),
    "q_lang_id"          -> (TextOps.langId(_, _)),
    "q_quality_score"    -> (TextOps.qualityScore(_, _)),
    "q_fingerprint"      -> (TextOps.fingerprint(_, _)),
    "q_length_stats"     -> (TextOps.lengthStats(_, _)),
    "q_length_approx"    -> (TextOps.lengthApprox(_, _)),
    "q_stratified_sample" -> (TextOps.stratifiedSample(_, _)),
    "q_repetition"       -> (TextOps.repetition(_, _)),
    "q_corpus_mix"       -> (TextOps.corpusMix(_, _)),
    "q_temperature_mix"  -> (TextOps.temperatureMix(_, _)),
    "q_budget_mix"       -> ((s, d) => TextOps.budgetMix(s, d)),
    "q_domain_cap"       -> ((s, d) => TextOps.domainCap(s, d)),
    "q_top_ngrams"       -> ((s, d) => TextOps.topNgrams(s, d)),
    "q_pack"             -> ((s, d) => TextOps.packChunks(s, d)),
    "q_shuffle_order"    -> ((s, d) => TextOps.shuffleOrder(s, d)),
    "q_icp_pack"         -> ((s, d) => TextOps.icpPack(s, d)),
    "q_curriculum_pack"  -> ((s, d) => TextOps.curriculumPack(s, d)),
    "q_chunk_docs"       -> (TextOps.chunkDocs(_, _)),
    "q_pack_bpe"         -> ((s, d) => TextOps.packChunksBpe(s, d)),
    "q_filter_chain"     -> (TextOps.filterChain(_, _)),
    "q_curate_kept"      -> (PipelineOps.curateKept(_, _)),
    "q_unigram_logprob"  -> (TextOps.unigramLogprob(_, _)),
    "q_bigram_logprob"   -> (TextOps.bigramLogprob(_, _)),
    "q_perplexity_buckets" -> (TextOps.perplexityBuckets(_, _)),
    "q_perplexity_buckets_approx" -> (TextOps.perplexityBucketsApproxGraded(_, _)),
    "q_compression_ratio" -> (TextOps.compressionRatio(_, _)),
    "q_vocab_coverage"   -> ((s, d) => TextOps.vocabCoverage(s, d)),
    "q_kl_divergence"    -> (TextOps.klDivergence(_, _)),
    "q_decontaminate"    -> ((s, d) => TextOps.decontaminate(s, d)),
    "q_dup_ngram_frac"   -> ((s, d) => TextOps.dupNgramFraction(s, d)),
    "q_pii_scrub"        -> (TextOps.piiScrub(_, _)),
    "q_normalize_text"   -> (TextOps.normalizeText(_, _)),
    // Deduplication
    "q_dedup_exact"      -> (DedupOps.dedupExact(_, _)),
    "q_minhash_sig"      -> (DedupOps.minhashSignature(_, _)),
    "q_minhash_pairs"    -> (DedupOps.minhashPairs(_, _)),
    "q_dup_clusters"     -> ((s, d) => DedupOps.servedDupClusters(s, d)),
    "q_dup_best"         -> ((s, d) => DedupOps.dupBest(s, d)),
    "q_dup_rate"         -> ((s, d) => DedupOps.dupRate(s, d)),
    "q_split_leakfree"   -> ((s, d) => DedupOps.splitLeakfree(s, d)),
    "q_simhash"          -> (DedupOps.simhash(_, _)),
    "q_ngram_jaccard"    -> (DedupOps.ngramJaccard(_, _)),
    "q_dedup_spans"      -> ((s, d) => DedupOps.dedupSpans(s, d)),
    "q_winnow"           -> ((s, d) => DedupOps.winnow(s, d)),
    "q_containment"      -> ((s, d) => DedupOps.containmentPairs(s, d)),
    // Similarity search
    "q_cosine_topk"      -> ((s, d) => SimilarityOps.cosineTopK(s, d)),
    "q_knn_join"         -> ((s, d) => SimilarityOps.knnJoin(s, d)),
    "q_knn_join_ivf"     -> ((s, d) => SimilarityOps.knnJoinIvf(s, d)),
    "q_hard_negatives"   -> ((s, d) => SimilarityOps.hardNegatives(s, d)),
    "q_retrieval_eval"   -> ((s, d) => SimilarityOps.retrievalEval(s, d)),
    "q_embed_sanity"     -> ((s, d) => SimilarityOps.embedSanity(s, d)),
    "q_proto_score"      -> ((s, d) => SimilarityOps.protoScore(s, d)),
    "q_index_stats"      -> ((s, d) => SimilarityOps.indexStats(s, d)),
    "q_cluster_topics"   -> ((s, d) => SimilarityOps.clusterTopics(s, d)),
    "q_ann_lsh"          -> ((s, d) => SimilarityOps.annLsh(s, d)),
    "q_ann_ivf"          -> ((s, d) => SimilarityOps.annIvf(s, d)),
    "q_ann_ivf_served"   -> ((s, d) => SimilarityOps.annIvfServed(s, d)),
    "q_ann_ivf_filtered" -> ((s, d) => SimilarityOps.annIvfFiltered(s, d)),
    "q_ann_ivf_trained"  -> ((s, d) => SimilarityOps.annIvfTrained(s, d)),
    "q_ann_pq"           -> ((s, d) => SimilarityOps.annPq(s, d)),
    "q_ann_sq8"          -> ((s, d) => SimilarityOps.annSq8(s, d)),
    "q_ann_mrl"          -> ((s, d) => SimilarityOps.annMrl(s, d)),
    "q_ann_ivfpq"        -> ((s, d) => SimilarityOps.annIvfPq(s, d)),
    "q_ivf_train"        -> ((s, d) => SimilarityOps.ivfTrain(s, d)),
    "q_embed_neardup"    -> ((s, d) => SimilarityOps.embeddingNearDupPairs(s, d)),
    "q_semdedup"         -> ((s, d) => SimilarityOps.semDedup(s, d)),
    // Multimodal plumbing
    "q_multimodal_meta"  -> (MultimodalOps.multimodalMeta(_, _)),
    "q_audio_features"   -> (MultimodalOps.audioFeatures(_, _)),
    "q_flac_features"    -> (MultimodalOps.flacAudioFeatures(_, _)),
    "q_gif_frames"       -> ((s, d) => MultimodalOps.gifFrameFeatures(s, d)),
    "q_webp_features"    -> (MultimodalOps.webpImageFeatures(_, _)),
    "q_dedup_eval"       -> ((s, d) => DedupOps.dedupEval(s, d)),
    "q_frame_sample"     -> ((s, d) => MultimodalOps.frameSampleAvi(s, d)),
    "q_h264_meta"        -> ((s, d) => MultimodalOps.h264Meta(s, d)),
    "q_h264_pixels"      -> ((s, d) => MultimodalOps.h264PcmFeatures(s, d)),
    "q_h264_cavlc"       -> ((s, d) => MultimodalOps.h264CavlcFeatures(s, d)),
    "q_h264_inter"       -> ((s, d) => MultimodalOps.h264InterFeatures(s, d)),
    "q_video_motion"     -> ((s, d) => MultimodalOps.videoMotion(s, d)),
    "q_image_features"   -> (MultimodalOps.imageFeatures(_, _)),
    "q_jpeg_features"    -> (MultimodalOps.jpegFeatures(_, _)),
    "q_mjpeg_frames"     -> ((s, d) => MultimodalOps.mjpegFrameFeatures(s, d)),
    "q_media_ann"        -> ((s, d) => MultimodalOps.mediaAnn(s, d)),
    "q_media_ann_decoded" -> ((s, d) => MultimodalOps.mediaAnnDecoded(s, d)),
    // Corpus curation (hashed-ngram models)
    "q_dsir_weight"      -> ((s, d) => CurationOps.dsirWeights(s, d)),
    "q_dsir_resample"    -> ((s, d) => CurationOps.dsirResample(s, d)),
    "q_quality_classifier" -> ((s, d) => CurationOps.qualityClassifier(s, d)),
    "q_source_overlap"   -> ((s, d) => CurationOps.sourceOverlap(s, d)),
    "q_source_overlap_guarded" -> ((s, d) => CurationOps.sourceOverlap(s, d, maxShare = 0.5)))

  /** DuckDB equivalents (driver's correctness gate) — one per query, no
    * rows-only entries. The LSH/simhash pipelines are oracled as exact
    * algorithm replays: portable hash families (md5-prefix + affine-mod-p)
    * and inlined hyperplane literals make DuckDB reproduce the Spark output
    * value-for-value, banding and census guards included.
    */
  def oracleSql: Map[String, String] =
    RelationalOps.oracle ++ EventsOps.oracle ++ TextOps.oracle ++
      DedupOps.oracle ++ SimilarityOps.oracle ++ MultimodalOps.oracle ++
      SearchOps.oracle ++ DocumentOps.oracle ++ CurationOps.oracle ++
      PipelineOps.oracle ++ GeoOps.oracle ++
      graft.streaming.ComposedEtlQuery.oracle
}
