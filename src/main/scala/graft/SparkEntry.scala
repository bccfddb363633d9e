package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 appears in at least one
  * `queries` entry; entries with a DuckDB-expressible equivalent also appear
  * in `oracleSql` (same column names, same total ORDER BY — the driver
  * hash-compares values after sorting columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    BatchQueries.q01SupplierStats(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_supplier_stats" -> (BatchQueries.q01SupplierStats _),
    "q02_nation_order_stats" -> (BatchQueries.q02NationOrderStats _),
    "q03_busiest_suppliers" -> (BatchQueries.q03BusiestSuppliers _),
    "q04_busiest_weeks" -> (BatchQueries.q04BusiestWeeks _),
    "q05_global_avg_unpivot" -> (BatchQueries.q05GlobalAvgUnpivot _),
    "q06_cancellations_dow" -> (BatchQueries.q06CancellationsDow _),
    "q07_price_buckets" -> (BatchQueries2.q07PriceBuckets _),
    "q08_problematic_routes" -> (BatchQueries2.q08ProblematicRoutes _),
    "q09_attr_unpivot" -> (BatchQueries2.q09AttrUnpivot _),
    "q10_mode_rank" -> (BatchQueries2.q10ModeRank _),
    "q11_delay_score" -> (BatchQueries2.q11DelayScore _),
    "q12_enrich_join" -> (BatchQueries2.q12EnrichJoin _),
    "q13_scalar_funcs" -> (BatchQueries2.q13ScalarFuncs _),
    "q14_geo_join" -> (BatchQueries2.q14GeoJoin _),
    "q15_distinct_years" -> (BatchQueries2.q15DistinctYears _),
    "q16_json_extract" -> (EventQueries.q16JsonExtract _),
    "q17_windowed_distinct" -> (EventQueries.q17WindowedDistinct _),
    "q18_windowed_approx_distinct" -> (EventQueries.q18WindowedApproxDistinct _),
    "q19_callsign_join_sink" -> (SinkQueries.q19CallsignJoinSink _),
    "q20_docs_exact_dedup" -> (DocQueries.q20DocsExactDedup _),
    "q21_docs_text_stats" -> (DocQueries.q21DocsTextStats _),
    "q22_docs_quality" -> (DocQueries.q22DocsQuality _),
    "q23_docs_lang_id" -> (DocQueries.q23DocsLangId _),
    "q24_docs_fingerprint" -> (DocQueries.q24DocsFingerprint _),
    "q25_docs_minhash_neardup" -> (DocQueries.q25DocsMinhashNeardup _),
    "q26_docs_simhash" -> (DocQueries.q26DocsSimhash _),
    "q27_embed_cosine_topk" -> (EmbedQueries.q27EmbedCosineTopk _),
    "q28_embed_ann_lsh" -> (EmbedQueries.q28EmbedAnnLsh _),
    "q29_multimodal_meta" -> (EmbedQueries.q29MultimodalMeta _),
    "q30_etl_year_partition" -> (EtlQueries.q30EtlYearPartition _),
    "q31_csv_etl" -> (EtlQueries.q31CsvEtl _),
    "q32_stream_windowed_distinct" -> (StreamQueries.q32StreamWindowedDistinct _),
    "q33_stream_enrich_join" -> (StreamQueries.q33StreamEnrichJoin _),
    "q34_stream_geo_window" -> (StreamQueries.q34StreamGeoWindow _),
    "q35_stream_upsert" -> (StreamQueries.q35StreamUpsert _),
    "q36_embed_cosine_neardup" -> (EmbedQueries.q36EmbedCosineNeardup _),
    "q37_stream_session_window" -> (StreamQueries.q37StreamSessionWindow _),
    "q38_semi_anti_join" -> (ParityPlusQueries.q38SemiAntiJoin _),
    "q39_rollup" -> (ParityPlusQueries.q39Rollup _),
    "q40_bucketed_join" -> (ParityPlusQueries.q40BucketedJoin _),
    "q41_docs_dedup_corpus" -> (DocQueries.q41DocsDedupCorpus _),
    "q42_set_ops" -> (ParityPlusQueries.q42SetOps _),
    "q43_percentiles" -> (ParityPlusQueries.q43Percentiles _),
    "q44_geo_auto_rewrite" -> (ParityPlusQueries.q44GeoAutoRewrite _),
    "q45_stream_stream_join" -> (StreamQueries.q45StreamStreamJoin _),
    "q46_embed_ivf_ann" -> (EmbedQueries.q46EmbedIvfAnn _),
    "q47_corpus_manifest" -> (DocQueries.q47CorpusManifest _),
    "q48_stream_stream_left_outer" -> (StreamQueries.q48StreamStreamLeftOuter _),
    "q49_stratified_sample" -> (DocQueries.q49StratifiedSample _),
    "q50_token_budget_pack" -> (DocQueries.q50TokenBudgetPack _),
    "q51_decontaminate" -> (DocQueries.q51Decontaminate _),
    "q52_curated_mix" -> (DocQueries.q52CuratedMix _),
    "q53_json_etl" -> (EtlQueries.q53JsonEtl _),
    "q54_multimodal_wav_decode" -> (EmbedQueries.q54MultimodalWavDecode _),
    "q55_multimodal_ppm_decode" -> (EmbedQueries.q55MultimodalPpmDecode _),
    "q56_orc_etl" -> (EtlQueries.q56OrcEtl _),
    "q57_boilerplate_ngrams" -> (DocQueries.q57BoilerplateNgrams _),
    "q58_asof_join" -> (EventQueries.q58AsofJoin _),
    "q59_docs_repetition" -> (DocQueries.q59DocsRepetition _),
    "q60_embed_int8_topk" -> (EmbedQueries.q60EmbedInt8Topk _),
    "q61_batch_sessionize" -> (EventQueries.q61BatchSessionize _),
    "q62_multimodal_resize" -> (EmbedQueries.q62MultimodalResize _),
    "q63_multimodal_frame_sample" -> (EmbedQueries.q63MultimodalFrameSample _),
    "q64_asof_join_salted" -> (EventQueries.q64AsofJoinSalted _),
    "q65_embed_ivf_sq8" -> (EmbedQueries.q65EmbedIvfSq8 _),
    "q66_docs_containment" -> (DocQueries.q66DocsContainment _),
    "q67_cube_grouping" -> (ParityPlusQueries.q67CubeGrouping _),
    "q68_pivot_priorities" -> (ParityPlusQueries.q68PivotPriorities _),
    "q69_rolling_window" -> (ParityPlusQueries.q69RollingWindow _),
    "q70_curriculum_deciles" -> (DocQueries.q70CurriculumDeciles _),
    "q71_stream_sliding_window" -> (StreamQueries.q71StreamSlidingWindow _),
    "q72_grouping_sets" -> (ParityPlusQueries.q72GroupingSets _),
    "q73_gap_fill" -> (ParityPlusQueries.q73GapFill _),
    "q74_incremental_dedup" -> (DocQueries.q74IncrementalDedup _),
    "q75_text_scrub" -> (DocQueries.q75TextScrub _),
    "q76_decile_cutpoints" -> (DocQueries.q76DecileCutpoints _),
    "q77_doc_chunks" -> (DocQueries.q77DocChunks _),
    "q78_vocab_coverage" -> (DocQueries.q78VocabCoverage _),
    "q79_dedup_clusters" -> (DocQueries.q79DedupClusters _),
    "q80_tfidf_keywords" -> (DocQueries.q80TfidfKeywords _),
    "q81_bm25_search" -> (DocQueries.q81Bm25Search _),
    "q82_interval_join" -> (EventQueries.q82IntervalJoin _),
    "q83_funnel" -> (EventQueries.q83Funnel _),
    "q84_hybrid_rrf" -> (EmbedQueries.q84HybridRrf _),
    "q85_zorder_layout" -> (EtlQueries.q85ZorderLayout _),
    "q86_stream_dedup_ingest" -> (StreamQueries.q86StreamDedupIngest _),
    "q87_docs_jaccard_join" -> (DocQueries.q87DocsJaccardJoin _),
    "q88_pmi_collocations" -> (DocQueries.q88PmiCollocations _),
    "q89_skew_probe" -> (EventQueries.q89SkewProbe _),
    "q90_source_tv_drift" -> (DocQueries.q90SourceTvDrift _),
    "q91_ivf_delta_assign" -> (EmbedQueries.q91IvfDeltaAssign _),
    "q92_table_stats" -> (ParityPlusQueries.q92TableStats _),
    "q93_exact_substr_spans" -> (DocQueries.q93ExactSubstrSpans _),
    "q94_source_capped_pack" -> (DocQueries.q94SourceCappedPack _),
    "q95_bigram_lm_score" -> (DocQueries.q95BigramLmScore _),
    "q96_substr_redact" -> (DocQueries.q96SubstrRedact _),
    "q97_substr_redact_keep_one" -> (DocQueries.q97SubstrRedactKeepOne _),
    "q98_embed_pq_adc" -> (EmbedQueries.q98EmbedPqAdc _),
    "q99_embed_ivf_pq" -> (EmbedQueries.q99EmbedIvfPq _),
    "q100_token_blocks" -> (DocQueries.q100TokenBlocks _),
    "q101_semdedup_clusters" -> (EmbedQueries.q101SemdedupClusters _),
    "q102_temperature_mix" -> (DocQueries.q102TemperatureMix _),
    "q103_filter_cascade" -> (DocQueries.q103FilterCascade _),
    "q104_bpe_train" -> (DocQueries.q104BpeTrain _),
    "q105_bpe_encode" -> (DocQueries.q105BpeEncode _),
    "q106_incr_sem_clusters" -> (EmbedQueries.q106IncrementalSemClusters _),
    "q107_wordpiece_train" -> (DocQueries.q107WordpieceTrain _),
    "q108_quality_calibration" -> (DocQueries.q108QualityCalibration _),
    "q109_exact_substr_prod_k" -> (DocQueries.q109ExactSubstrProdK _),
    "q110_image_phash_dedup" -> (EmbedQueries.q110ImagePhashDedup _),
    "q111_embed_binary_topk" -> (EmbedQueries.q111EmbedBinaryTopk _),
    "q112_bpe_train_batched" -> (DocQueries.q112BpeTrainBatched _),
    "q113_semantic_decontaminate" -> (EmbedQueries.q113SemanticDecontaminate _),
    "q114_hard_negatives" -> (EmbedQueries.q114HardNegatives _),
    "q115_paragraph_dedup" -> (DocQueries.q115ParagraphDedup _),
    "q116_weighted_sample" -> (DocQueries.q116WeightedSample _),
    "q117_mmr_topk" -> (EmbedQueries.q117MmrTopk _),
    "q118_trigram_lm_score" -> (DocQueries.q118TrigramLmScore _),
    "q119_unigram_train" -> (DocQueries.q119UnigramTrain _),
    "q120_importance_select" -> (DocQueries.q120ImportanceSelect _),
    "q121_kmv_distinct" -> (DocQueries.q121KmvDistinct _),
    "q122_unigram_encode" -> (DocQueries.q122UnigramEncode _),
    "q123_split_assign" -> (DocQueries.q123SplitAssign _),
    "q124_stream_quality_gate" -> (StreamQueries.q124StreamQualityGate _),
    "q125_quality_classifier" -> (DocQueries.q125QualityClassifier _),
    "q126_audio_fp_dedup" -> (EmbedQueries.q126AudioFpDedup _),
    "q127_wordpiece_encode" -> (DocQueries.q127WordpieceEncode _),
    "q128_embed_ivf_sqrt_n" -> (EmbedQueries.q128EmbedIvfSqrtN _),
    "q129_video_phash_dedup" -> (EmbedQueries.q129VideoPhashDedup _),
    "q130_stream_model_score" -> (StreamQueries.q130StreamModelScore _),
    "q131_ann_recall_eval" -> (EmbedQueries.q131AnnRecallEval _),
    "q132_cluster_sample" -> (EmbedQueries.q132ClusterSample _),
    "q133_source_overlap" -> (DocQueries.q133SourceOverlap _),
    "q134_pagerank_suppliers" -> (GraphQueries.q134PagerankSuppliers _),
    "q135_kmeans_train" -> (EmbedQueries.q135KmeansTrain _),
    "q136_cms_freq" -> (DocQueries.q136CmsFreq _),
    "q137_scd2_build" -> (EventQueries.q137Scd2Build _),
    "q138_edit_distance_join" -> (DocQueries.q138EditDistanceJoin _),
    "q139_trustrank_suppliers" -> (GraphQueries.q139TrustrankSuppliers _),
    "q140_entity_resolution" -> (DocQueries.q140EntityResolution _),
    "q141_cdc_chunk_dedup" -> (DocQueries.q141CdcChunkDedup _),
    "q142_stream_scd2_enrich" -> (StreamQueries.q142StreamScd2Enrich _),
    "q143_sequence_pack" -> (DocQueries.q143SequencePack _),
    "q144_host_curation_gate" -> (DocQueries.q144HostCurationGate _),
    "q145_scd2_incremental" -> (EventQueries.q145Scd2Incremental _),
    "q146_trustrank_converged" -> (GraphQueries.q146TrustrankConverged _),
    "q147_bitext_margin" -> (EmbedQueries.q147BitextMarginMine _),
    "q148_jl_projection" -> (EmbedQueries.q148JlProjectionRetention _),
    "q149_diversity_audit" -> (DocQueries.q149DiversityAudit _),
    "q150_shard_export" -> (DocQueries.q150ShardExport _),
    "q151_retention_cohorts" -> (EventQueries.q151RetentionCohorts _),
    "q152_mad_outlier_gate" -> (DocQueries.q152MadOutlierGate _),
    "q153_knn_graph" -> (EmbedQueries.q153KnnGraph _),
    "q154_stream_shard_route" -> (StreamQueries.q154StreamShardRoute _),
    "q155_ndcg_eval" -> (EmbedQueries.q155NdcgEval _),
    "q156_embedding_drift" -> (EmbedQueries.q156EmbeddingDrift _),
    "q157_knn_incremental" -> (EmbedQueries.q157KnnIncremental _),
    "q158_label_noise_audit" -> (EmbedQueries.q158LabelNoiseAudit _),
    "q159_corpus_diff" -> (DocQueries.q159CorpusDiff _),
    "q160_curation_funnel" -> (DocQueries.q160CurationFunnel _),
    "q161_split_leakage_audit" -> (DocQueries.q161SplitLeakageAudit _),
    "q162_stream_scd2_fold" -> (StreamQueries.q162StreamScd2Fold _),
    "q163_stream_knn_fold" -> (StreamQueries.q163StreamKnnFold _),
    "q164_quantile_sketch" -> (DocQueries.q164QuantileSketch _),
    "q165_incr_shard_publish" -> (DocQueries.q165IncrementalShardPublish _),
    "q166_knn_refine" -> (EmbedQueries.q166KnnRefine _),
    "q167_sketch_rollup" -> (DocQueries.q167SketchRollup _),
    "q168_stream_quantile_monitor" -> (StreamQueries.q168StreamQuantileMonitor _),
    "q169_kcenter_coreset" -> (EmbedQueries.q169KcenterCoreset _),
    "q170_bootstrap_ci" -> (DocQueries.q170BootstrapCi _),
    "q171_incr_curation_funnel" -> (DocQueries.q171IncrementalCurationFunnel _),
    "q172_knn_refine_converged" -> (EmbedQueries.q172KnnRefineConverged _),
    "q173_stream_shard_publish" -> (StreamQueries.q173StreamShardPublish _),
    "q174_bootstrap_delta_ci" -> (DocQueries.q174BootstrapDeltaCi _),
    "q175_kcenter_weights" -> (EmbedQueries.q175KcenterWeights _),
  )

  /** q58 and q64 answer the identical attribution question (q64 through
    * the skew-salted plan), so one oracle statement serves both — the
    * strongest form of the equality claim: both engines' plans AND both
    * of ours land on one hash. */
  private val asofOracle: String =
    """WITH clicks AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |views AS (
      |  SELECT user_id, ts AS view_ts, max(event_id) AS view_event_id
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
      |SELECT c.event_id, c.user_id, v.view_event_id,
      |       epoch_us(c.ts) - epoch_us(v.view_ts) AS gap_us
      |FROM clicks c ASOF LEFT JOIN views v
      |  ON c.user_id = v.user_id AND c.ts >= v.view_ts
      |ORDER BY c.event_id""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_supplier_stats" ->
      """SELECT t.l_suppkey, s.s_name, t.avg_err, t.flight_count,
        |       round((1.0 - CAST(t.delayed_count AS DOUBLE) / t.flight_count) * 100.0, 4) AS otp
        |FROM (
        |  SELECT l_suppkey,
        |         round(avg(abs(l_extendedprice - l_quantity * 1000.0)), 4) AS avg_err,
        |         count(*) AS flight_count,
        |         count(CASE WHEN l_discount > 0.05 THEN 1 END) AS delayed_count
        |  FROM lineitem GROUP BY l_suppkey HAVING count(*) > 10
        |) t LEFT JOIN supplier s ON t.l_suppkey = s.s_suppkey
        |ORDER BY otp DESC, t.l_suppkey""".stripMargin,
    "q02_nation_order_stats" ->
      """SELECT n.n_name,
        |       round(avg(o.o_totalprice), 4) AS avg_total_price,
        |       count(*) AS order_count
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name HAVING count(*) > 10
        |ORDER BY avg_total_price DESC, n.n_name""".stripMargin,
    "q03_busiest_suppliers" ->
      """SELECT l_suppkey, flight_count,
        |       round(CASE WHEN _max = _min THEN 100.0
        |             ELSE CAST(flight_count - _min AS DOUBLE) / (_max - _min) * 100.0 END, 4) AS busyness_pct,
        |       round(CASE WHEN _total > 0 THEN CAST(flight_count AS DOUBLE) / _total * 100.0 END, 4) AS share_pct
        |FROM (
        |  SELECT l_suppkey, count(*) AS flight_count,
        |         min(count(*)) OVER () AS _min,
        |         max(count(*)) OVER () AS _max,
        |         sum(count(*)) OVER () AS _total
        |  FROM lineitem GROUP BY l_suppkey
        |) ORDER BY flight_count DESC, l_suppkey LIMIT 10""".stripMargin,
    "q04_busiest_weeks" ->
      """SELECT CAST(month(l_shipdate) AS BIGINT) AS ship_month,
        |       CAST(weekofyear(l_shipdate) AS BIGINT) AS ship_week,
        |       count(*) AS flight_count,
        |       count(CASE WHEN l_discount > 0.05 THEN 1 END) AS delayed_count,
        |       round(CAST(count(CASE WHEN l_discount > 0.05 THEN 1 END) AS DOUBLE) / count(*) * 100.0, 4) AS delayed_pct
        |FROM lineitem
        |GROUP BY 1, 2 HAVING count(*) > 10
        |ORDER BY flight_count DESC, ship_month, ship_week""".stripMargin,
    "q05_global_avg_unpivot" ->
      """WITH g AS (
        |  SELECT round(avg(l_quantity), 4) AS avg_quantity,
        |         round(avg(l_extendedprice), 4) AS avg_price,
        |         round(avg(l_discount), 6) AS avg_discount,
        |         round(avg(l_tax), 6) AS avg_tax,
        |         round(avg(l_linenumber), 4) AS avg_linenumber
        |  FROM lineitem)
        |SELECT 'quantity' AS metric, avg_quantity AS avg_value FROM g
        |UNION ALL SELECT 'price', avg_price FROM g
        |UNION ALL SELECT 'discount', avg_discount FROM g
        |UNION ALL SELECT 'tax', avg_tax FROM g
        |UNION ALL SELECT 'linenumber', avg_linenumber FROM g
        |ORDER BY metric""".stripMargin,
    "q06_cancellations_dow" ->
      """SELECT CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
        |       count(*) AS order_count,
        |       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS cancelled_count,
        |       round(CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS DOUBLE) / count(*) * 100.0, 4) AS cancelled_pct
        |FROM orders
        |GROUP BY 1 HAVING count(*) > 10
        |ORDER BY cancelled_pct DESC, dow""".stripMargin,
    "q07_price_buckets" ->
      """WITH b AS (
        |  SELECT CASE WHEN l_extendedprice >= 0 AND l_extendedprice < 10000 THEN 0
        |              WHEN l_extendedprice >= 10000 AND l_extendedprice < 20000 THEN 1
        |              WHEN l_extendedprice >= 20000 AND l_extendedprice < 30000 THEN 2
        |              WHEN l_extendedprice >= 30000 AND l_extendedprice < 40000 THEN 3
        |              WHEN l_extendedprice >= 40000 AND l_extendedprice < 50000 THEN 4
        |              WHEN l_extendedprice >= 50000 THEN 5 END AS bucket_id,
        |         l_extendedprice, l_discount FROM lineitem)
        |SELECT CAST(bucket_id AS BIGINT) AS bucket_id,
        |       CASE bucket_id WHEN 0 THEN '0-10000' WHEN 1 THEN '10000-20000'
        |            WHEN 2 THEN '20000-30000' WHEN 3 THEN '30000-40000'
        |            WHEN 4 THEN '40000-50000' WHEN 5 THEN '50000+' END AS bucket_label,
        |       round(avg(l_extendedprice), 4) AS avg_price,
        |       count(*) AS flight_count,
        |       round(CAST(count(CASE WHEN l_discount > 0.05 THEN 1 END) AS DOUBLE) / count(*), 6) AS delay_probability
        |FROM b GROUP BY bucket_id HAVING count(*) > 10
        |ORDER BY bucket_id""".stripMargin,
    "q08_problematic_routes" ->
      """SELECT * FROM (
        |  SELECT g.origin_code || '-' || g.dest_code AS route,
        |         g.origin_code, g.dest_code, g.flight_count,
        |         round(CASE WHEN ov._overall_pct > 0
        |               THEN (CAST(g.delayed_count AS DOUBLE) / g.flight_count * 100.0) / ov._overall_pct
        |               ELSE 1.0 END, 6) AS problematic_score
        |  FROM (SELECT l_returnflag AS origin_code, l_linestatus AS dest_code,
        |               count(*) AS flight_count,
        |               count(CASE WHEN l_discount > 0.05 THEN 1 END) AS delayed_count
        |        FROM lineitem GROUP BY 1, 2 HAVING count(*) > 10) g
        |  CROSS JOIN (SELECT CAST(count(CASE WHEN l_discount > 0.05 THEN 1 END) AS DOUBLE) / count(*) * 100.0 AS _overall_pct
        |              FROM lineitem) ov)
        |WHERE problematic_score >= 0.5
        |ORDER BY problematic_score DESC, route""".stripMargin,
    "q09_attr_unpivot" ->
      """WITH u AS (
        |  SELECT 'brand' AS attr, p_brand AS attr_value FROM part
        |  UNION ALL SELECT 'type', p_type FROM part
        |  UNION ALL SELECT 'name', p_name FROM part)
        |SELECT attr, attr_value, count(*) AS value_count
        |FROM u WHERE attr_value IS NOT NULL AND trim(attr_value) <> ''
        |GROUP BY attr, attr_value HAVING count(*) > 5
        |ORDER BY value_count DESC, attr, attr_value""".stripMargin,
    "q10_mode_rank" ->
      """WITH pc AS (SELECT o_custkey, o_orderpriority AS v, count(*) AS cnt FROM orders GROUP BY 1, 2),
        |pm AS (SELECT o_custkey, v AS mode_priority FROM (
        |  SELECT o_custkey, v, row_number() OVER (PARTITION BY o_custkey ORDER BY cnt DESC, v ASC) AS rn FROM pc) WHERE rn = 1),
        |sc AS (SELECT o_custkey, o_orderstatus AS v, count(*) AS cnt FROM orders GROUP BY 1, 2),
        |sm AS (SELECT o_custkey, v AS mode_status FROM (
        |  SELECT o_custkey, v, row_number() OVER (PARTITION BY o_custkey ORDER BY cnt DESC, v ASC) AS rn FROM sc) WHERE rn = 1)
        |SELECT pm.o_custkey, pm.mode_priority, sm.mode_status
        |FROM pm JOIN sm ON pm.o_custkey = sm.o_custkey
        |ORDER BY pm.o_custkey""".stripMargin,
    "q11_delay_score" ->
      """WITH j AS (
        |  SELECT t.l_suppkey, s.s_name, t.avg_disc, t.flight_count FROM (
        |    SELECT l_suppkey, round(avg(l_discount), 6) AS avg_disc, count(*) AS flight_count
        |    FROM lineitem GROUP BY l_suppkey HAVING count(*) > 10) t
        |  JOIN (SELECT DISTINCT s_suppkey, s_name FROM supplier) s ON t.l_suppkey = s.s_suppkey),
        |b AS (SELECT min(avg_disc) AS _mn, max(avg_disc) AS _mx FROM j)
        |SELECT l_suppkey, s_name, avg_disc, flight_count,
        |       round(CASE WHEN _mx = _mn THEN 1.0
        |             ELSE (avg_disc - _mn) / (_mx - _mn) * 1.0 END, 6) AS delay_score01
        |FROM j CROSS JOIN b
        |ORDER BY delay_score01 DESC, l_suppkey""".stripMargin,
    "q12_enrich_join" ->
      """SELECT c_custkey, c_name, n_name AS nation_name, r_name AS region_name,
        |       round(c_acctbal, 2) AS acctbal
        |FROM customer
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |ORDER BY c_custkey""".stripMargin,
    "q13_scalar_funcs" ->
      """SELECT s_suppkey,
        |       printf('%02d:%02d', (s_suppkey * 137 % 2400) // 100, s_suppkey * 137 % 2400 % 100) AS sched_time,
        |       CASE WHEN length(cs) = 0 THEN 'UNKNOWN'
        |            WHEN substr(cs, 1, 1) = 'N' THEN 'PRIVATE'
        |            WHEN length(cs) < 3 THEN cs
        |            ELSE substr(cs, 1, 3) END AS airline_code,
        |       CAST(regexp_extract(s_name, '([0-9]+)', 1) AS BIGINT) AS name_num,
        |       CAST(length(trim(s_name)) AS BIGINT) AS name_len
        |FROM (SELECT *, upper(trim(upper(substr(trim(s_name), 1, 1)) || CAST(s_suppkey AS VARCHAR))) AS cs
        |      FROM supplier)
        |ORDER BY s_suppkey""".stripMargin,
    "q14_geo_join" ->
      """WITH ap AS (SELECT n_name, CAST(n_nationkey * 7 % 120 - 60 AS DOUBLE) AS ap_lat,
        |                   CAST(n_nationkey * 13 % 360 - 180 AS DOUBLE) AS ap_lon FROM nation),
        |ev AS (SELECT user_id, CAST(event_id * 17 % 120 - 60 AS DOUBLE) AS ev_lat,
        |              CAST(event_id * 29 % 360 - 180 AS DOUBLE) AS ev_lon FROM events),
        |m AS (SELECT n_name, user_id,
        |             pow(sin(radians(ap_lat - ev_lat) / 2), 2)
        |               + cos(radians(ev_lat)) * cos(radians(ap_lat)) * pow(sin(radians(ap_lon - ev_lon) / 2), 2) AS a
        |      FROM ev CROSS JOIN ap)
        |SELECT n_name AS airport, count(*) AS match_count,
        |       count(DISTINCT user_id) AS distinct_aircraft
        |FROM m WHERE 2 * 6371.0 * atan2(sqrt(a), sqrt(1.0 - a)) <= 800.0
        |GROUP BY n_name ORDER BY airport""".stripMargin,
    "q15_distinct_years" ->
      """SELECT DISTINCT CAST(year(o_orderdate) AS BIGINT) AS order_year
        |FROM orders ORDER BY order_year""".stripMargin,
    "q16_json_extract" ->
      """SELECT event_type, count(*) AS event_count,
        |       round(avg(CAST(json_extract(props, '$.k') AS BIGINT)), 4) AS avg_k,
        |       round(avg(value), 4) AS avg_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q17_windowed_distinct" ->
      """SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
        |       event_type, count(DISTINCT user_id) AS distinct_users
        |FROM events GROUP BY 1, 2 HAVING count(DISTINCT user_id) >= 2
        |ORDER BY win_start, event_type""".stripMargin,
    // q18_windowed_approx_distinct: HLL sketch is engine-specific -> no
    // oracle; the driver records a rows-only check.
    "q19_callsign_join_sink" ->
      """WITH e AS (
        |  SELECT concat(upper(substr(trim(s_name), 1, 1)),
        |                CAST(s_suppkey % 100 AS VARCHAR), '-',
        |                CAST(l_orderkey % 100 AS VARCHAR)) AS callsign,
        |         l_quantity
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE l_orderkey % 1000 < 50),
        |a AS (SELECT callsign, count(*) AS flight_count FROM e
        |      WHERE length(callsign) >= 3 GROUP BY 1),
        |d AS (SELECT callsign, CAST(round(avg(l_quantity), 2) AS VARCHAR) AS avg_qty
        |      FROM e WHERE length(callsign) >= 3 GROUP BY 1)
        |SELECT a.callsign AS key,
        |       to_json({'callsign': a.callsign,
        |                'flight_count': a.flight_count,
        |                'avg_qty': d.avg_qty}) AS value
        |FROM a JOIN d ON a.callsign = d.callsign
        |ORDER BY key""".stripMargin,
    "q20_docs_exact_dedup" ->
      """SELECT md5(lower(trim(text))) AS text_hash,
        |       min(doc_id) AS keep_doc_id, count(*) AS dup_count
        |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin,
    "q21_docs_text_stats" ->
      """WITH t AS (
        |  SELECT lang, length(text) AS chars,
        |         string_split_regex(lower(trim(text)), '\s+') AS toks,
        |         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe
        |  FROM documents),
        |r AS (
        |  SELECT lang, chars, len(toks) AS n, bpe,
        |         CAST(round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) * 1e9) AS BIGINT) AS ttr_e9,
        |         CAST(round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) * 1e9) AS BIGINT) AS tlen_e9
        |  FROM t)
        |SELECT lang, count(*) AS doc_count,
        |       round(avg(n), 4) AS avg_tokens,
        |       round(avg(bpe), 4) AS avg_bpe_tokens,
        |       round(CAST(sum(ttr_e9) AS DOUBLE) / 1e9 / count(*), 6) AS avg_ttr,
        |       round(CAST(sum(tlen_e9) AS DOUBLE) / 1e9 / count(*), 6) AS avg_token_len,
        |       round(avg(chars), 4) AS avg_chars
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin,
    "q22_docs_quality" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, len(toks) AS n_tokens,
        |         CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE) / len(toks) AS stop_ratio,
        |         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
        |  FROM t),
        |q AS (
        |  SELECT *, round(0.4 * ttr + 0.3 * (1.0 - stop_ratio)
        |                  + 0.3 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0), 6) AS quality
        |  FROM b)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |       round(stop_ratio, 6) AS stop_ratio, round(ttr, 6) AS ttr, quality,
        |       CASE WHEN quality >= 0.75 THEN 'high'
        |            WHEN quality >= 0.5 THEN 'medium' ELSE 'low' END AS quality_band
        |FROM q ORDER BY doc_id""".stripMargin,
    "q23_docs_lang_id" ->
      """WITH t AS (
        |  SELECT lang, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents)
        |SELECT lang,
        |       CASE WHEN CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE) / len(toks) >= 0.02
        |            THEN 'en' ELSE 'und' END AS predicted_lang,
        |       count(*) AS n
        |FROM t GROUP BY 1, 2 ORDER BY lang, predicted_lang""".stripMargin,
    "q24_docs_fingerprint" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |       list_reduce(
        |         list_prepend(CAST(0 AS BIGINT),
        |           list_transform(toks, x -> CAST(concat('0x', substr(md5(x), 1, 8)) AS BIGINT))),
        |         (h, v) -> (h * 31 + v) % 1000000007) AS fingerprint
        |FROM t ORDER BY doc_id""".stripMargin,
    "q25_docs_minhash_neardup" ->
      s"""WITH $minhashPairsCte
        |SELECT doc_a, doc_b, jaccard FROM vp ORDER BY doc_a, doc_b""".stripMargin,
    "q26_docs_simhash" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |         list_transform(toks, x -> CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)) AS th
        |  FROM t),
        |f AS (
        |  SELECT doc_id,
        |         CAST(list_sum(
        |           [CASE WHEN list_sum([CASE WHEN ((v >> b) & 1) = 1 THEN 1 ELSE -1 END for v in th]) > 0
        |                 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END
        |            for b in range(0, 60)]) AS BIGINT) AS simhash
        |  FROM h)
        |SELECT doc_id, simhash, simhash >> 44 AS band_bucket
        |FROM f ORDER BY doc_id""".stripMargin,
    "q27_embed_cosine_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |p AS (
        |  SELECT q.q_id, e.vec_id,
        |         round(
        |           list_sum([CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) for i in range(1, 65)]) /
        |           (sqrt(list_sum([CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE) for i in range(1, 65)])) *
        |            sqrt(list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) for i in range(1, 65)]))), 6) AS cosine
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.q_id)
        |SELECT q_id, vec_id, cosine, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
        |  FROM p)
        |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    "q28_embed_ann_lsh" ->
      """WITH wb AS (
        |  SELECT vec_id, embedding,
        |         CAST(list_sum(
        |           [CASE WHEN list_sum([(CAST(((p * 131071 + i * 524287) * 2654435761) % 1000003 AS DOUBLE) / 1000003.0 - 0.5)
        |                                * CAST(embedding[i] AS DOUBLE) for i in range(1, 65)]) > 0
        |                 THEN CAST(round(pow(2, p)) AS BIGINT) ELSE CAST(0 AS BIGINT) END
        |            for p in range(0, 8)]) AS BIGINT) AS bucket
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id AS q_id, embedding AS qv, bucket FROM wb WHERE vec_id < 5),
        |p2 AS (
        |  -- multi-probe: candidate bucket within Hamming distance 2 of the
        |  -- query bucket == the spark side's 37 exploded probe keys
        |  SELECT q.q_id, e.vec_id,
        |         round(
        |           list_sum([CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) for i in range(1, 65)]) /
        |           (sqrt(list_sum([CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE) for i in range(1, 65)])) *
        |            sqrt(list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) for i in range(1, 65)]))), 6) AS cosine
        |  FROM wb e JOIN q ON bit_count(xor(e.bucket, q.bucket)) <= 2 WHERE e.vec_id <> q.q_id)
        |SELECT q_id, vec_id, cosine, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
        |  FROM p2)
        |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,
    "q29_multimodal_meta" ->
      """SELECT doc_id, 'text/plain' AS mime,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       CAST((octet_length(encode(text)) + 255) // 256 AS BIGINT) AS n_frames,
        |       md5(text) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q30_etl_year_partition" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
        |       count(*) AS order_count,
        |       count(DISTINCT o_custkey) AS distinct_customers
        |FROM orders GROUP BY 1 ORDER BY order_year""".stripMargin,
    "q31_csv_etl" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS file_year,
        |       count(*) AS order_count,
        |       count(DISTINCT o_custkey) AS distinct_customers
        |FROM orders GROUP BY 1 ORDER BY file_year""".stripMargin,
    // Streaming replays: append mode emits exactly the windows whose end is
    // <= the final watermark (= max event time, 0s delay), so the oracle is
    // the batch aggregate restricted to closed windows.
    "q32_stream_windowed_distinct" ->
      """WITH ev0 AS (
        |  SELECT * FROM events
        |  WHERE event_type IS NOT NULL AND length(trim(event_type)) > 0
        |    AND ts IS NOT NULL AND user_id IS NOT NULL),
        |w AS (
        |  SELECT date_trunc('minute', ts) AS ws, lower(trim(event_type)) AS event_type,
        |         count(DISTINCT user_id) AS du
        |  FROM ev0 GROUP BY 1, 2),
        |m AS (SELECT max(ts) AS mx FROM ev0)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start, event_type,
        |       CAST(du AS BIGINT) AS distinct_users
        |FROM w, m WHERE ws + INTERVAL 1 MINUTE <= mx
        |ORDER BY win_start, event_type""".stripMargin,
    "q33_stream_enrich_join" ->
      """WITH ev0 AS (
        |  SELECT * FROM events
        |  WHERE event_type IS NOT NULL AND length(trim(event_type)) > 0
        |    AND ts IS NOT NULL AND user_id IS NOT NULL),
        |e AS (
        |  SELECT date_trunc('minute', ts) AS ws,
        |         CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |         n_name AS reg_name
        |  FROM ev0 LEFT JOIN nation ON user_id % 25 = n_nationkey),
        |m AS (SELECT max(ts) AS mx FROM ev0)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start, reg_name,
        |       count(*) AS event_count, CAST(sum(k) AS BIGINT) AS sum_k
        |FROM e, m WHERE ws + INTERVAL 1 MINUTE <= mx
        |GROUP BY 1, 2 ORDER BY win_start, reg_name""".stripMargin,
    "q34_stream_geo_window" ->
      """WITH ap AS (SELECT n_name, CAST(n_nationkey * 7 % 120 - 60 AS DOUBLE) AS ap_lat,
        |                   CAST(n_nationkey * 13 % 360 - 180 AS DOUBLE) AS ap_lon FROM nation),
        |ev0 AS (
        |  SELECT * FROM events
        |  WHERE event_type IS NOT NULL AND length(trim(event_type)) > 0
        |    AND ts IS NOT NULL AND user_id IS NOT NULL),
        |ev AS (SELECT ts, user_id, CAST(event_id * 17 % 120 - 60 AS DOUBLE) AS ev_lat,
        |              CAST(event_id * 29 % 360 - 180 AS DOUBLE) AS ev_lon FROM ev0),
        |m AS (SELECT max(ts) AS mx FROM ev0),
        |j AS (SELECT n_name, ts, user_id,
        |             pow(sin(radians(ap_lat - ev_lat) / 2), 2)
        |               + cos(radians(ev_lat)) * cos(radians(ap_lat)) * pow(sin(radians(ap_lon - ev_lon) / 2), 2) AS a
        |      FROM ev CROSS JOIN ap)
        |SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
        |       n_name AS airport,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_aircraft
        |FROM j, m
        |WHERE 2 * 6371.0 * atan2(sqrt(a), sqrt(1.0 - a)) <= 800.0
        |  AND date_trunc('minute', ts) + INTERVAL 1 MINUTE <= mx
        |GROUP BY 1, 2 ORDER BY win_start, airport""".stripMargin,
    "q36_embed_cosine_neardup" ->
      """WITH wb AS (
        |  SELECT vec_id, embedding,
        |         CAST(list_sum(
        |           [CASE WHEN list_sum([(CAST(((p * 131071 + i * 524287) * 2654435761) % 1000003 AS DOUBLE) / 1000003.0 - 0.5)
        |                                * CAST(embedding[i] AS DOUBLE) for i in range(1, 65)]) > 0
        |                 THEN CAST(round(pow(2, p)) AS BIGINT) ELSE CAST(0 AS BIGINT) END
        |            for p in range(0, 4)]) AS BIGINT) AS bucket
        |  FROM embeddings),
        |p2 AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |         round(
        |           list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) for i in range(1, 65)]) /
        |           (sqrt(list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE) for i in range(1, 65)])) *
        |            sqrt(list_sum([CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) for i in range(1, 65)]))), 6) AS cosine
        |  FROM wb a JOIN wb b ON bit_count(xor(a.bucket, b.bucket)) <= 1 AND a.vec_id < b.vec_id)
        |SELECT vec_a, vec_b, cosine FROM p2
        |WHERE cosine >= 0.4 ORDER BY vec_a, vec_b""".stripMargin,
    "q37_stream_session_window" ->
      """WITH e AS (
        |  SELECT user_id, ts,
        |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |                   OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 6 HOUR
        |              THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WHERE event_type IS NOT NULL AND length(trim(event_type)) > 0
        |    AND ts IS NOT NULL AND user_id IS NOT NULL),
        |g AS (
        |  SELECT user_id, ts,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM e),
        |s AS (
        |  SELECT user_id, min(ts) AS st, max(ts) + INTERVAL 6 HOUR AS en,
        |         count(*) AS n_events
        |  FROM g GROUP BY user_id, sid),
        |m AS (SELECT max(ts) AS mx FROM events
        |      WHERE event_type IS NOT NULL AND length(trim(event_type)) > 0
        |        AND ts IS NOT NULL AND user_id IS NOT NULL)
        |SELECT strftime(st, '%Y-%m-%d %H:%M:%S') AS session_start,
        |       strftime(en, '%Y-%m-%d %H:%M:%S') AS session_end,
        |       user_id, n_events
        |FROM s, m WHERE en <= mx
        |ORDER BY user_id, session_start""".stripMargin,
    "q38_semi_anti_join" ->
      """SELECT n_name AS nation,
        |       count(CASE WHEN EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) THEN 1 END) AS with_orders,
        |       count(CASE WHEN NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) THEN 1 END) AS without_orders
        |FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY nation""".stripMargin,
    "q39_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |       coalesce(l_linestatus, 'ALL') AS status,
        |       count(*) AS flight_count,
        |       round(sum(l_quantity), 2) AS total_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    "q40_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS order_count,
        |       count(DISTINCT o_custkey) AS distinct_customers
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,
    "q41_docs_dedup_corpus" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |         list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                        for i in range(1, len(toks) - 1)]) AS sh
        |  FROM t WHERE len(toks) >= 3),
        |hs AS (
        |  SELECT doc_id,
        |         list_transform(sh, x -> CAST(concat('0x', substr(md5(x), 1, 14)) AS BIGINT)) AS hv
        |  FROM s),
        |bd AS (
        |  SELECT doc_id,
        |         unnest([concat_ws('|', CAST(b AS VARCHAR),
        |                   CAST(list_min(list_transform(hv, h -> (h * (2 * (2 * b) + 1) + (2 * b) * 7919) % 1000000007)) AS VARCHAR),
        |                   CAST(list_min(list_transform(hv, h -> (h * (2 * (2 * b + 1) + 1) + (2 * b + 1) * 7919) % 1000000007)) AS VARCHAR))
        |                 for b in range(0, 4)]) AS band_key
        |  FROM hs),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bd a JOIN bd b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
        |nd AS (
        |  SELECT doc_b FROM (
        |    SELECT doc_a, doc_b,
        |           round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
        |                 len(list_distinct(sa.sh || sb.sh)), 4) AS jaccard
        |    FROM cand
        |    JOIN s sa ON cand.doc_a = sa.doc_id
        |    JOIN s sb ON cand.doc_b = sb.doc_id)
        |  WHERE jaccard >= 0.7),
        |ex AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id,
        |           min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS keep
        |    FROM documents)
        |  WHERE doc_id <> keep),
        |losers AS (SELECT doc_b AS doc_id FROM nd UNION SELECT doc_id FROM ex)
        |SELECT doc_id, lang, source FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM losers)
        |ORDER BY doc_id""".stripMargin,
    "q42_set_ops" ->
      """WITH a AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1994),
        |b AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
        |r AS (
        |  SELECT 'both_years' AS cohort,
        |         (SELECT count(*) FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)) AS n
        |  UNION ALL
        |  SELECT 'only_1994',
        |         (SELECT count(*) FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b))
        |  UNION ALL
        |  SELECT 'either_year',
        |         (SELECT count(*) FROM (SELECT o_custkey FROM a UNION SELECT o_custkey FROM b)))
        |SELECT cohort, n FROM r ORDER BY cohort""".stripMargin,
    "q43_percentiles" ->
      """SELECT l_returnflag,
        |       round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        |       round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
        |       count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "q44_geo_auto_rewrite" ->
      """WITH ap AS (SELECT n_name, CAST(n_nationkey * 7 % 120 - 60 AS DOUBLE) AS ap_lat,
        |                   CAST(n_nationkey * 13 % 360 - 180 AS DOUBLE) AS ap_lon FROM nation),
        |ev AS (SELECT user_id, CAST(event_id * 17 % 120 - 60 AS DOUBLE) AS ev_lat,
        |              CAST(event_id * 29 % 360 - 180 AS DOUBLE) AS ev_lon FROM events),
        |m AS (SELECT n_name, user_id,
        |             pow(sin(radians(ap_lat - ev_lat) / 2), 2)
        |               + cos(radians(ev_lat)) * cos(radians(ap_lat)) * pow(sin(radians(ap_lon - ev_lon) / 2), 2) AS a
        |      FROM ev CROSS JOIN ap)
        |SELECT n_name AS airport, count(*) AS match_count,
        |       count(DISTINCT user_id) AS distinct_aircraft
        |FROM m WHERE 2 * 6371.0 * atan2(sqrt(a), sqrt(1.0 - a)) <= 650.0
        |GROUP BY n_name ORDER BY airport""".stripMargin,
    // ts compared at microsecond precision on both sides: Spark rebuilds
    // the nano ts at micros; the oracle CASTs TIMESTAMP_NS -> TIMESTAMP.
    "q45_stream_stream_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |         lower(trim(event_type)) AS event_type
        |  FROM events
        |  WHERE event_type IS NOT NULL AND length(trim(event_type)) > 0
        |    AND ts IS NOT NULL AND user_id IS NOT NULL)
        |SELECT a.event_id AS view_id, b.event_id AS purchase_id, a.user_id
        |FROM ev a JOIN ev b ON a.user_id = b.user_id
        |WHERE a.event_type = 'view' AND b.event_type = 'purchase'
        |  AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 2 HOUR
        |ORDER BY view_id, purchase_id""".stripMargin,
    "q46_embed_ivf_ann" ->
      """WITH emb AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) for i in range(1, 65)])) AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cid, embedding AS cv, nrm AS cnrm FROM emb WHERE vec_id < 16),
        |scored AS (
        |  SELECT e.vec_id, e.embedding, e.nrm, c.cid,
        |         list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE) for i in range(1, 65)])
        |           / (e.nrm * c.cnrm) AS score
        |  FROM emb e CROSS JOIN c),
        |assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
        |    FROM scored) WHERE rn = 1),
        |qprobe AS (
        |  SELECT vec_id AS q_id, embedding AS qv, nrm AS qnrm, cid FROM (
        |    SELECT vec_id, embedding, nrm, cid,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
        |    FROM scored WHERE vec_id < 5) WHERE rn <= 2),
        |cand AS (
        |  SELECT q.q_id, e.vec_id,
        |         round(
        |           list_sum([CAST(q.qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) for i in range(1, 65)])
        |             / (q.qnrm * e.nrm), 6) AS cosine
        |  FROM emb e JOIN assign a ON e.vec_id = a.vec_id
        |             JOIN qprobe q ON a.cid = q.cid
        |  WHERE e.vec_id <> q.q_id)
        |SELECT q_id, vec_id, cosine, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
        |  FROM cand)
        |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,
    // q46 at the production √n-nlist dial: identical chain, centroid
    // count from a scalar subquery over the same corpus count Spark
    // reads (capped 4096, floored 2), so the certification tracks sf.
    "q128_embed_ivf_sqrt_n" ->
      """WITH nlc AS (
        |  SELECT least(4096, greatest(2, CAST(round(sqrt(count(*))) AS BIGINT))) AS nl
        |  FROM embeddings),
        |emb AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) for i in range(1, 65)])) AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cid, embedding AS cv, nrm AS cnrm FROM emb
        |      WHERE vec_id < (SELECT nl FROM nlc)),
        |scored AS (
        |  SELECT e.vec_id, e.embedding, e.nrm, c.cid,
        |         list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE) for i in range(1, 65)])
        |           / (e.nrm * c.cnrm) AS score
        |  FROM emb e CROSS JOIN c),
        |assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
        |    FROM scored) WHERE rn = 1),
        |qprobe AS (
        |  SELECT vec_id AS q_id, embedding AS qv, nrm AS qnrm, cid FROM (
        |    SELECT vec_id, embedding, nrm, cid,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
        |    FROM scored WHERE vec_id < 5) WHERE rn <= 2),
        |cand AS (
        |  SELECT q.q_id, e.vec_id,
        |         round(
        |           list_sum([CAST(q.qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) for i in range(1, 65)])
        |             / (q.qnrm * e.nrm), 6) AS cosine
        |  FROM emb e JOIN assign a ON e.vec_id = a.vec_id
        |             JOIN qprobe q ON a.cid = q.cid
        |  WHERE e.vec_id <> q.q_id)
        |SELECT q_id, vec_id, cosine, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
        |  FROM cand)
        |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,
    "q47_corpus_manifest" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |         list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                        for i in range(1, len(toks) - 1)]) AS sh
        |  FROM t WHERE len(toks) >= 3),
        |hs AS (
        |  SELECT doc_id,
        |         list_transform(sh, x -> CAST(concat('0x', substr(md5(x), 1, 14)) AS BIGINT)) AS hv
        |  FROM s),
        |bd AS (
        |  SELECT doc_id,
        |         unnest([concat_ws('|', CAST(b AS VARCHAR),
        |                   CAST(list_min(list_transform(hv, h -> (h * (2 * (2 * b) + 1) + (2 * b) * 7919) % 1000000007)) AS VARCHAR),
        |                   CAST(list_min(list_transform(hv, h -> (h * (2 * (2 * b + 1) + 1) + (2 * b + 1) * 7919) % 1000000007)) AS VARCHAR))
        |                 for b in range(0, 4)]) AS band_key
        |  FROM hs),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bd a JOIN bd b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
        |nd AS (
        |  SELECT doc_b FROM (
        |    SELECT doc_a, doc_b,
        |           round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
        |                 len(list_distinct(sa.sh || sb.sh)), 4) AS jaccard
        |    FROM cand
        |    JOIN s sa ON cand.doc_a = sa.doc_id
        |    JOIN s sb ON cand.doc_b = sb.doc_id)
        |  WHERE jaccard >= 0.7),
        |ex AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id,
        |           min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS keep
        |    FROM documents)
        |  WHERE doc_id <> keep),
        |losers AS (SELECT doc_b AS doc_id FROM nd UNION SELECT doc_id FROM ex),
        |ann AS (
        |  SELECT doc_id, lang,
        |         CAST(len(toks) AS BIGINT) AS n_tokens,
        |         CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE) / len(toks) AS stop_ratio,
        |         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
        |         list_reduce(
        |           list_prepend(CAST(0 AS BIGINT),
        |             list_transform(toks, x -> CAST(concat('0x', substr(md5(x), 1, 8)) AS BIGINT))),
        |           (h, v) -> (h * 31 + v) % 1000000007) AS fingerprint
        |  FROM t),
        |q AS (
        |  SELECT *, round(0.4 * ttr + 0.3 * (1.0 - stop_ratio)
        |                  + 0.3 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0), 6) AS quality
        |  FROM ann)
        |SELECT doc_id, lang,
        |       CASE WHEN stop_ratio >= 0.02 THEN 'en' ELSE 'und' END AS predicted_lang,
        |       n_tokens, quality,
        |       CASE WHEN quality >= 0.75 THEN 'high'
        |            WHEN quality >= 0.5 THEN 'medium' ELSE 'low' END AS quality_band,
        |       fingerprint
        |FROM q WHERE doc_id NOT IN (SELECT doc_id FROM losers)
        |ORDER BY doc_id""".stripMargin,
    "q35_stream_upsert" ->
      """WITH ev0 AS (
        |  SELECT * FROM events
        |  WHERE event_type IS NOT NULL AND length(trim(event_type)) > 0
        |    AND ts IS NOT NULL AND user_id IS NOT NULL),
        |w AS (
        |  SELECT date_trunc('minute', ts) AS ws, lower(trim(event_type)) AS event_type,
        |         count(DISTINCT user_id) AS du
        |  FROM ev0 GROUP BY 1, 2),
        |m AS (SELECT max(ts) AS mx FROM ev0),
        |c AS (SELECT * FROM w, m WHERE ws + INTERVAL 1 MINUTE <= mx),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY ws DESC) AS rn FROM c)
        |SELECT event_type, strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start,
        |       CAST(du AS BIGINT) AS distinct_users
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,
    // Left-outer stream-stream join: restricted to views whose 2h match
    // window closed >= 1 min under the final watermark (min of the two
    // sides' max event times); unmatched views carry purchase_id = -1.
    "q48_stream_stream_left_outer" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |         lower(trim(event_type)) AS event_type
        |  FROM events
        |  WHERE event_type IS NOT NULL AND length(trim(event_type)) > 0
        |    AND ts IS NOT NULL AND user_id IS NOT NULL),
        |v AS (SELECT event_id AS view_id, user_id, ts FROM ev WHERE event_type = 'view'),
        |p AS (SELECT event_id AS purchase_id, user_id AS p_user_id, ts AS p_ts
        |      FROM ev WHERE event_type = 'purchase'),
        |wm AS (SELECT least((SELECT max(ts) FROM v), (SELECT max(p_ts) FROM p)) AS w),
        |vr AS (SELECT v.view_id, v.user_id, v.ts FROM v, wm
        |       WHERE v.ts + INTERVAL 121 MINUTE < wm.w)
        |SELECT vr.view_id, coalesce(p.purchase_id, -1) AS purchase_id, vr.user_id
        |FROM vr LEFT JOIN p
        |  ON vr.user_id = p.p_user_id AND p.p_ts > vr.ts
        | AND p.p_ts <= vr.ts + INTERVAL 2 HOUR
        |ORDER BY view_id, purchase_id""".stripMargin,
    // Deterministic stratified sample: salted md5 of the doc id mod 100
    // under per-language keep-rates (en 25%, tail languages 75%).
    "q49_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE CAST(concat('0x', substr(md5(concat('graft-sample|',
        |        CAST(doc_id AS VARCHAR))), 1, 14)) AS BIGINT) % 100
        |      < CASE WHEN lang = 'en' THEN 25 ELSE 75 END
        |ORDER BY doc_id""".stripMargin,
    // Token-budget packing: per-language running token total in quality
    // order (6-rounded score, doc_id tie-break), kept while <= 2000.
    "q50_token_budget_pack" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens,
        |         CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE) / len(toks) AS stop_ratio,
        |         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
        |  FROM t),
        |q AS (
        |  SELECT doc_id, lang, n_tokens,
        |         round(0.4 * ttr + 0.3 * (1.0 - stop_ratio)
        |               + 0.3 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0), 6) AS quality
        |  FROM b),
        |c AS (
        |  SELECT *, sum(n_tokens) OVER (PARTITION BY lang
        |            ORDER BY quality DESC, doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        |  FROM q)
        |SELECT doc_id, lang, n_tokens, quality,
        |       CAST(cum_tokens AS BIGINT) AS cum_tokens
        |FROM c WHERE cum_tokens <= 2000
        |ORDER BY lang, cum_tokens, doc_id""".stripMargin,
    // Decontamination: held-out (src19) docs sharing >= 10 distinct
    // 3-gram shingle hashes with the training split.
    "q51_decontaminate" ->
      """WITH t AS (
        |  SELECT doc_id, source, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, source,
        |         list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                        for i in range(1, len(toks) - 1)]) AS sh
        |  FROM t WHERE len(toks) >= 3),
        |hs AS (
        |  SELECT doc_id, source,
        |         list_transform(sh, x -> CAST(concat('0x', substr(md5(x), 1, 14)) AS BIGINT)) AS hv
        |  FROM s),
        |tr AS (SELECT DISTINCT unnest(hv) AS h FROM hs WHERE source != 'src19'),
        |te AS (SELECT doc_id, unnest(hv) AS h FROM hs WHERE source = 'src19')
        |SELECT doc_id, count(*) AS n_shared
        |FROM te JOIN tr USING (h)
        |GROUP BY doc_id HAVING count(*) >= 10
        |ORDER BY doc_id""".stripMargin,
    // Curated training mix: dedup losers out (q47's CTEs), stratified
    // sample in (q49's salted-hash rates), then the q50 budget pack.
    "q52_curated_mix" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |         list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                        for i in range(1, len(toks) - 1)]) AS sh
        |  FROM t WHERE len(toks) >= 3),
        |hs AS (
        |  SELECT doc_id,
        |         list_transform(sh, x -> CAST(concat('0x', substr(md5(x), 1, 14)) AS BIGINT)) AS hv
        |  FROM s),
        |bd AS (
        |  SELECT doc_id,
        |         unnest([concat_ws('|', CAST(b AS VARCHAR),
        |                   CAST(list_min(list_transform(hv, h -> (h * (2 * (2 * b) + 1) + (2 * b) * 7919) % 1000000007)) AS VARCHAR),
        |                   CAST(list_min(list_transform(hv, h -> (h * (2 * (2 * b + 1) + 1) + (2 * b + 1) * 7919) % 1000000007)) AS VARCHAR))
        |                 for b in range(0, 4)]) AS band_key
        |  FROM hs),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bd a JOIN bd b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
        |nd AS (
        |  SELECT doc_b FROM (
        |    SELECT doc_a, doc_b,
        |           round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
        |                 len(list_distinct(sa.sh || sb.sh)), 4) AS jaccard
        |    FROM cand
        |    JOIN s sa ON cand.doc_a = sa.doc_id
        |    JOIN s sb ON cand.doc_b = sb.doc_id)
        |  WHERE jaccard >= 0.7),
        |ex AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id,
        |           min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS keep
        |    FROM documents)
        |  WHERE doc_id <> keep),
        |losers AS (SELECT doc_b AS doc_id FROM nd UNION SELECT doc_id FROM ex),
        |surv AS (
        |  SELECT doc_id, lang, toks FROM t
        |  WHERE doc_id NOT IN (SELECT doc_id FROM losers)
        |    AND CAST(concat('0x', substr(md5(concat('graft-sample|',
        |          CAST(doc_id AS VARCHAR))), 1, 14)) AS BIGINT) % 100
        |        < CASE WHEN lang = 'en' THEN 25 ELSE 75 END),
        |b AS (
        |  SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens,
        |         CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE) / len(toks) AS stop_ratio,
        |         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
        |  FROM surv),
        |q AS (
        |  SELECT doc_id, lang, n_tokens,
        |         round(0.4 * ttr + 0.3 * (1.0 - stop_ratio)
        |               + 0.3 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0), 6) AS quality
        |  FROM b),
        |c AS (
        |  SELECT *, sum(n_tokens) OVER (PARTITION BY lang
        |            ORDER BY quality DESC, doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        |  FROM q)
        |SELECT doc_id, lang, n_tokens, quality,
        |       CAST(cum_tokens AS BIGINT) AS cum_tokens
        |FROM c WHERE cum_tokens <= 2000
        |ORDER BY lang, cum_tokens, doc_id""".stripMargin,
    // JSON-lines round trip: the aggregate over what Spark re-reads from
    // its own JSON export must equal the aggregate over the source table
    // (ts compared at micro precision — the JSON carries epoch micros).
    "q53_json_etl" ->
      """SELECT event_type, count(*) AS event_count,
        |       count(DISTINCT user_id) AS distinct_users,
        |       strftime(max(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS last_seen
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // WAV decode round-trip: the engine synthesizes PCM16 from the text
    // bytes ((b-128)*256 at 8 kHz), decodes it with the real RIFF parser,
    // and the oracle restates each decoded feature from the bytes
    // directly: sample count = byte count, duration = integer-division
    // milliseconds, peak = most-negative sample's magnitude (every sample
    // is (b-128)*256 with b < 128 in this corpus, so |min| dominates).
    "q54_multimodal_wav_decode" ->
      """SELECT doc_id,
        |       CAST(8000 AS BIGINT) AS sample_rate,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_samples,
        |       CAST(octet_length(encode(text)) * 1000 // 8000 AS BIGINT) AS duration_ms,
        |       CAST((128 - list_min(list_transform(string_split(text, ''), x -> ord(x)))) * 256 AS BIGINT) AS peak_amplitude
        |FROM documents ORDER BY doc_id""".stripMargin,
    // PPM decode round-trip: pixel i of the 1-row image is (b, 255-b,
    // (7b) mod 256) over the text bytes; the oracle restates the decoded
    // header fields and per-channel maxima from the bytes directly.
    "q55_multimodal_ppm_decode" ->
      """WITH o AS (
        |  SELECT doc_id, list_transform(string_split(text, ''), x -> ord(x)) AS ords
        |  FROM documents)
        |SELECT doc_id,
        |       CAST(len(ords) AS BIGINT) AS width,
        |       CAST(1 AS BIGINT) AS height,
        |       CAST(255 AS BIGINT) AS maxval,
        |       CAST(list_max(ords) AS BIGINT) AS max_r,
        |       CAST(255 - list_min(ords) AS BIGINT) AS max_g,
        |       CAST(list_max(list_transform(ords, x -> (7 * x) % 256)) AS BIGINT) AS max_b
        |FROM o ORDER BY doc_id""".stripMargin,
    // ORC round trip: the aggregate over what Spark re-reads from its own
    // ORC export must equal the aggregate over the parquet source
    // (l_quantity is integer-valued, so the long cast is exact).
    "q56_orc_etl" ->
      """SELECT l_returnflag, count(*) AS line_count,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       count(DISTINCT l_suppkey) AS distinct_suppliers,
        |       strftime(max(l_shipdate), '%Y-%m-%d') AS last_ship
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // Heavy hitters: the oracle counts every bigram exactly (DuckDB's
    // full groupBy is fine at oracle scale); the engine's sketch-pruned
    // two-pass plan must land on the identical exact counts.
    "q57_boilerplate_ngrams" ->
      """WITH t AS (
        |  SELECT string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |bg AS (
        |  SELECT unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS tok
        |  FROM t WHERE len(toks) >= 2),
        |tot AS (SELECT count(*) AS n_total FROM bg)
        |SELECT tok, count(*) AS cnt, (SELECT n_total FROM tot) AS n_total
        |FROM bg GROUP BY tok
        |HAVING count(*) * 1000 >= (SELECT n_total FROM tot)
        |ORDER BY cnt DESC, tok""".stripMargin,
    // As-of join: DuckDB states the same semantics through its NATIVE
    // ASOF LEFT JOIN operator — an independent implementation of the
    // operator itself, not just of the arithmetic.
    "q58_asof_join" -> asofOracle,
    // The skew-salted plan must land on the same hash as q58.
    "q64_asof_join_salted" -> asofOracle,
    // Per-doc repetition: DuckDB counts each doc's bigrams through a
    // groupBy; the engine computes the same numbers with a per-row sorted
    // fold (no shuffle) — independent shapes, identical values.
    "q59_docs_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id,
        |         unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS tok
        |  FROM t WHERE len(toks) >= 2),
        |c AS (SELECT doc_id, tok, count(*) AS cnt FROM bg GROUP BY doc_id, tok)
        |SELECT doc_id,
        |       CAST(sum(cnt) AS BIGINT) AS total_bigrams,
        |       CAST(count(*) AS BIGINT) AS distinct_bigrams,
        |       CAST(max(cnt) AS BIGINT) AS top_bigram_cnt,
        |       round(CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 6) AS top_ratio
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Int8 quantization: rounding is stated explicitly (sign·floor(+0.5))
    // so both engines run identical arithmetic; quantized dots are exact
    // integer sums — only the final 6-decimal round touches floats.
    "q60_embed_int8_topk" ->
      """WITH s AS (
        |  SELECT vec_id,
        |         [CAST(x AS DOUBLE) for x in embedding] AS v,
        |         list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) AS mx
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id,
        |         [CASE WHEN x >= 0 THEN floor(x * (127.0 / mx) + 0.5)
        |               ELSE -floor(-x * (127.0 / mx) + 0.5) END
        |          for x in v] AS qv
        |  FROM s WHERE mx > 0),
        |n AS (SELECT vec_id, qv, sqrt(list_sum([x * x for x in qv])) AS nrm FROM q),
        |p AS (
        |  SELECT b.vec_id AS q_id, a.vec_id,
        |         round(list_sum([a.qv[i] * b.qv[i] for i in range(1, 65)]) /
        |               (b.nrm * a.nrm), 6) AS qcos
        |  FROM n a JOIN n b ON b.vec_id < 5 AND a.vec_id <> b.vec_id),
        |r AS (
        |  SELECT q_id, vec_id, qcos,
        |         row_number() OVER (PARTITION BY q_id ORDER BY qcos DESC, vec_id) AS rank
        |  FROM p)
        |SELECT q_id, vec_id, qcos, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    // Batch sessionization: same islands SQL shape as q37's oracle, but
    // over the full history (no watermark-closure restriction) and
    // reporting actual last-event time.
    "q61_batch_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, ts, "value",
        |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |                   OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 6 HOUR
        |              THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WHERE event_type IS NOT NULL AND length(trim(event_type)) > 0
        |    AND ts IS NOT NULL AND user_id IS NOT NULL),
        |g AS (
        |  SELECT user_id, ts, "value",
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM e)
        |SELECT user_id,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(round("value" * 100, 0) AS BIGINT)) AS DOUBLE)
        |           / (count(*) * 100.0) AS avg_value
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    // Resize: nearest-neighbor keeps ORIGINAL pixels (index floor(j*w/ow)),
    // so the resized plane's features are still pure functions of the text
    // bytes — the oracle samples the same indices by list arithmetic.
    "q62_multimodal_resize" ->
      """WITH o AS (
        |  SELECT doc_id, list_transform(string_split(text, ''), x -> ord(x)) AS ords
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |         CAST(len(ords) AS BIGINT) AS src_width,
        |         least(16, len(ords)) AS ow,
        |         [ords[(j * len(ords)) // least(16, len(ords)) + 1]
        |          for j in range(0, least(16, len(ords)))] AS sam
        |  FROM o)
        |SELECT doc_id, src_width,
        |       CAST(ow AS BIGINT) AS width,
        |       CAST(1 AS BIGINT) AS height,
        |       CAST(list_max(sam) AS BIGINT) AS max_r,
        |       CAST(255 - list_min(sam) AS BIGINT) AS max_g,
        |       CAST(list_max(list_transform(sam, x -> (7 * x) % 256)) AS BIGINT) AS max_b
        |FROM s ORDER BY doc_id""".stripMargin,
    // Frame-sample: frame f covers sample span [f*n//nf, (f+1)*n//nf);
    // DuckDB restates each frame's peak by slicing the same integer
    // boundaries out of the synthesized sample list.
    "q63_multimodal_frame_sample" ->
      """WITH o AS (
        |  SELECT doc_id,
        |         list_transform(string_split(text, ''),
        |                        x -> abs((ord(x) - 128) * 256)) AS sam
        |  FROM documents),
        |f AS (
        |  SELECT doc_id,
        |         unnest([{'frame': f,
        |                  'peak': list_max(sam[(f * len(sam)) // least(32, len(sam)) + 1 :
        |                                       ((f + 1) * len(sam)) // least(32, len(sam))])}
        |                 for f in range(0, least(32, len(sam)))], recursive := true)
        |  FROM o)
        |SELECT doc_id, CAST(frame AS BIGINT) AS frame, CAST(peak AS BIGINT) AS peak
        |FROM f ORDER BY doc_id, frame""".stripMargin,
    // IVF-SQ8 ladder: full-precision assignment/probe (q46's CTEs), int8
    // candidate scoring (q60's quantizer), full-precision rerank of the
    // top-8 shortlist only. Quantized dots are exact integer sums, so the
    // shortlist cut needs no rounding to be engine-deterministic.
    "q65_embed_ivf_sq8" ->
      """WITH emb AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) for i in range(1, 65)])) AS nrm,
        |         list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) AS mx
        |  FROM embeddings),
        |n8 AS (
        |  SELECT vec_id, embedding, nrm,
        |         [CASE WHEN x >= 0 THEN floor(x * (127.0 / mx) + 0.5)
        |               ELSE -floor(-x * (127.0 / mx) + 0.5) END
        |          for x in [CAST(y AS DOUBLE) for y in embedding]] AS qv
        |  FROM emb WHERE mx > 0),
        |n AS (SELECT vec_id, embedding, nrm, qv,
        |             sqrt(list_sum([x * x for x in qv])) AS qvnrm FROM n8),
        |c AS (SELECT vec_id AS cid, embedding AS cv, nrm AS cnrm FROM n WHERE vec_id < 16),
        |scored AS (
        |  SELECT e.vec_id, e.embedding, e.nrm, e.qv, e.qvnrm, c.cid,
        |         list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE) for i in range(1, 65)])
        |           / (e.nrm * c.cnrm) AS score
        |  FROM n e CROSS JOIN c),
        |assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
        |    FROM scored) WHERE rn = 1),
        |qprobe AS (
        |  SELECT vec_id AS q_id, qv AS q8v, qvnrm AS q8nrm,
        |         embedding AS qfv, nrm AS qfnrm, cid FROM (
        |    SELECT vec_id, embedding, nrm, qv, qvnrm, cid,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
        |    FROM scored WHERE vec_id < 5) WHERE rn <= 2),
        |cand AS (
        |  SELECT q.q_id, e.vec_id, e.embedding, e.nrm, q.qfv, q.qfnrm,
        |         list_sum([q.q8v[i] * e.qv[i] for i in range(1, 65)])
        |           / (q.q8nrm * e.qvnrm) AS s8
        |  FROM n e JOIN assign a ON e.vec_id = a.vec_id
        |           JOIN qprobe q ON a.cid = q.cid
        |  WHERE e.vec_id <> q.q_id),
        |short AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY s8 DESC, vec_id) AS rn8
        |    FROM cand) WHERE rn8 <= 8),
        |rer AS (
        |  SELECT q_id, vec_id,
        |         round(list_sum([CAST(qfv[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) for i in range(1, 65)])
        |               / (qfnrm * nrm), 6) AS cosine
        |  FROM short)
        |SELECT q_id, vec_id, cosine, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
        |  FROM rer)
        |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,
    // Containment: the oracle is the BRUTE-FORCE all-shared-shingle-pairs
    // restatement (no prefix filter), so a hash match certifies the prefix
    // filter's exact-recall claim, not just the verify arithmetic. Both
    // engines verify over the same md5-derived 56-bit shingle-hash lists
    // (the q25/q51 bit-compatible construction).
    "q66_docs_containment" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                 for i in range(1, len(toks) - 1)]) AS sh
        |  FROM t WHERE len(toks) >= 3),
        |hsl AS (
        |  SELECT doc_id,
        |         list_transform(sh, x -> CAST(concat('0x', substr(md5(x), 1, 14)) AS BIGINT)) AS hv
        |  FROM s),
        |e AS (SELECT doc_id, unnest(hv) AS g FROM hsl),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM e a JOIN e b ON a.g = b.g AND a.doc_id <> b.doc_id)
        |SELECT * FROM (
        |  SELECT doc_a, doc_b,
        |         round(CAST(len(list_intersect(ha.hv, hb.hv)) AS DOUBLE) /
        |               len(ha.hv), 4) AS containment
        |  FROM cand
        |  JOIN hsl ha ON cand.doc_a = ha.doc_id
        |  JOIN hsl hb ON cand.doc_b = hb.doc_id)
        |WHERE containment >= 0.8 ORDER BY doc_a, doc_b""".stripMargin,
    "q67_cube_grouping" ->
      """SELECT CASE WHEN grouping(yr) = 1 THEN 'ALL'
        |            ELSE CAST(yr AS VARCHAR) END AS order_year,
        |       CASE WHEN grouping(pri) = 1 THEN 'ALL' ELSE pri END AS priority,
        |       CAST(grouping(yr) + grouping(pri) AS INTEGER) AS level,
        |       count(*) AS order_count,
        |       CAST(sum(cents) AS BIGINT) AS revenue_cents
        |FROM (SELECT year(o_orderdate) AS yr, o_orderpriority AS pri,
        |             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |      FROM orders)
        |GROUP BY CUBE(yr, pri)
        |ORDER BY order_year, priority""".stripMargin,
    // Pivot restated as conditional aggregation — the exact expressions
    // Spark's explicit-values pivot plans to.
    "q68_pivot_priorities" ->
      """SELECT o_orderstatus AS status,
        |       count(*) FILTER (o_orderpriority = '1-URGENT') AS urgent,
        |       count(*) FILTER (o_orderpriority = '2-HIGH') AS high,
        |       count(*) FILTER (o_orderpriority = '3-MEDIUM') AS medium,
        |       count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS not_specified,
        |       count(*) FILTER (o_orderpriority = '5-LOW') AS low
        |FROM orders GROUP BY 1 ORDER BY status""".stripMargin,
    // Rolling RANGE frame over an epoch-day integer — stated identically in
    // both engines (interval frame literals vary across dialects).
    "q69_rolling_window" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS d,
        |         count(*) AS day_orders,
        |         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS day_cents
        |  FROM orders GROUP BY 1, 2)
        |SELECT priority, strftime(d, '%Y-%m-%d') AS day, day_orders, day_cents,
        |       CAST(sum(day_orders) OVER w AS BIGINT) AS rolling7_orders,
        |       CAST(sum(day_cents) OVER w AS BIGINT) AS rolling7_cents
        |FROM daily
        |WINDOW w AS (PARTITION BY priority
        |             ORDER BY datediff('day', DATE '1970-01-01', d)
        |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY priority, day""".stripMargin,
    "q70_curriculum_deciles" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens,
        |         CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE) / len(toks) AS stop_ratio,
        |         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
        |  FROM t),
        |q AS (
        |  SELECT doc_id, lang, n_tokens,
        |         round(0.4 * ttr + 0.3 * (1.0 - stop_ratio)
        |               + 0.3 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0), 6) AS quality
        |  FROM b),
        |d AS (
        |  SELECT lang, n_tokens, quality,
        |         CAST(ntile(10) OVER (PARTITION BY lang
        |                ORDER BY quality DESC, doc_id) AS BIGINT) AS decile
        |  FROM q)
        |SELECT lang, decile, count(*) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS tokens,
        |       min(quality) AS min_quality, max(quality) AS max_quality
        |FROM d GROUP BY 1, 2 ORDER BY lang, decile""".stripMargin,
    // Sliding windows: each event's two window starts are unnested
    // explicitly; append keeps windows whose END ≤ the final watermark
    // (max ts), same convention as the q32 tumbling oracle.
    "q71_stream_sliding_window" ->
      """WITH ev0 AS (
        |  SELECT * FROM events
        |  WHERE event_type IS NOT NULL AND length(trim(event_type)) > 0
        |    AND ts IS NOT NULL AND user_id IS NOT NULL),
        |x AS (
        |  SELECT lower(trim(event_type)) AS event_type, user_id,
        |         unnest([date_trunc('minute', ts),
        |                 date_trunc('minute', ts) - INTERVAL 1 MINUTE]) AS ws
        |  FROM ev0),
        |w AS (
        |  SELECT ws, event_type, count(*) AS event_count,
        |         count(DISTINCT user_id) AS du
        |  FROM x GROUP BY 1, 2),
        |m AS (SELECT max(ts) AS mx FROM ev0)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start, event_type,
        |       event_count, CAST(du AS BIGINT) AS distinct_users
        |FROM w, m WHERE ws + INTERVAL 2 MINUTE <= mx
        |ORDER BY win_start, event_type""".stripMargin,
    // Explicit grouping sets: two margins + grand total, never the
    // (year, priority) cross — the sets named here are the sets computed.
    "q72_grouping_sets" ->
      """SELECT CASE WHEN grouping(yr) = 1 THEN 'ALL'
        |            ELSE CAST(yr AS VARCHAR) END AS order_year,
        |       CASE WHEN grouping(pri) = 1 THEN 'ALL' ELSE pri END AS priority,
        |       count(*) AS order_count,
        |       CAST(sum(cents) AS BIGINT) AS revenue_cents
        |FROM (SELECT year(o_orderdate) AS yr, o_orderpriority AS pri,
        |             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |      FROM orders)
        |GROUP BY GROUPING SETS ((yr), (pri), ())
        |ORDER BY order_year, priority""".stripMargin,
    // Gap-fill: per-key calendar scaffold, left join, forward fill with
    // IGNORE NULLS — the first scaffold day is observed by construction.
    "q73_gap_fill" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS day_cents
        |  FROM orders GROUP BY 1, 2),
        |b AS (SELECT priority, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY 1),
        |scaffold AS (
        |  SELECT priority, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM b),
        |j AS (SELECT s.priority, s.d, daily.day_cents
        |      FROM scaffold s LEFT JOIN daily ON s.priority = daily.priority AND s.d = daily.d)
        |SELECT priority, strftime(d, '%Y-%m-%d') AS day,
        |       day_cents IS NOT NULL AS is_observed,
        |       CAST(last_value(day_cents IGNORE NULLS) OVER (
        |         PARTITION BY priority ORDER BY d
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS filled_cents
        |FROM j ORDER BY priority, day""".stripMargin,
    // Incremental dedup: the delta shard (doc_id % 10 = 7) audited against
    // the rest of the corpus only — exact dup by content hash, near-dup by
    // the q25 minhash-band + exact-Jaccard construction restricted to
    // delta-vs-corpus pairs, contamination by q51's shared-shingle count.
    "q74_incremental_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |         list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                        for i in range(1, len(toks) - 1)]) AS sh
        |  FROM t WHERE len(toks) >= 3),
        |hs AS (
        |  SELECT doc_id,
        |         list_transform(sh, x -> CAST(concat('0x', substr(md5(x), 1, 14)) AS BIGINT)) AS hv
        |  FROM s),
        |bd AS (
        |  SELECT doc_id,
        |         unnest([concat_ws('|', CAST(b AS VARCHAR),
        |                   CAST(list_min(list_transform(hv, h -> (h * (2 * (2 * b) + 1) + (2 * b) * 7919) % 1000000007)) AS VARCHAR),
        |                   CAST(list_min(list_transform(hv, h -> (h * (2 * (2 * b + 1) + 1) + (2 * b + 1) * 7919) % 1000000007)) AS VARCHAR))
        |                 for b in range(0, 4)]) AS band_key
        |  FROM hs),
        |exact AS (
        |  SELECT DISTINCT d.doc_id
        |  FROM documents d JOIN documents c
        |    ON md5(lower(trim(d.text))) = md5(lower(trim(c.text)))
        |  WHERE d.doc_id % 10 = 7 AND c.doc_id % 10 <> 7),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bd a JOIN bd b ON a.band_key = b.band_key
        |  WHERE a.doc_id % 10 = 7 AND b.doc_id % 10 <> 7),
        |nd AS (
        |  SELECT DISTINCT doc_a AS doc_id FROM (
        |    SELECT doc_a,
        |           CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
        |           len(list_distinct(sa.sh || sb.sh)) AS j
        |    FROM cand
        |    JOIN s sa ON cand.doc_a = sa.doc_id
        |    JOIN s sb ON cand.doc_b = sb.doc_id)
        |  WHERE j >= 0.7),
        |tr AS (SELECT DISTINCT unnest(hv) AS h FROM hs WHERE doc_id % 10 <> 7),
        |te AS (SELECT doc_id, unnest(hv) AS h FROM hs WHERE doc_id % 10 = 7),
        |cont AS (
        |  SELECT doc_id, count(*) AS n_shared
        |  FROM te JOIN tr USING (h) GROUP BY doc_id)
        |SELECT d.doc_id,
        |       (e.doc_id IS NOT NULL) AS exact_dup,
        |       (n.doc_id IS NOT NULL) AS near_dup,
        |       CAST(COALESCE(c.n_shared, 0) AS BIGINT) AS shared_shingles,
        |       (e.doc_id IS NULL AND n.doc_id IS NULL
        |        AND COALESCE(c.n_shared, 0) < 10) AS keep
        |FROM documents d
        |LEFT JOIN exact e ON d.doc_id = e.doc_id
        |LEFT JOIN nd n ON d.doc_id = n.doc_id
        |LEFT JOIN cont c ON d.doc_id = c.doc_id
        |WHERE d.doc_id % 10 = 7
        |ORDER BY d.doc_id""".stripMargin,
    // Normalize/scrub: identical deterministic dirt injected via chr()
    // (BEL control char, per-doc email/phone, decomposed accent chr(769)),
    // then NFC -> control strip -> redaction, value-checked by md5.
    "q75_text_scrub" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         text || chr(7) || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |         '@example.com or call +1 555-' ||
        |         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
        |         ' cafe' || chr(769) || ' today' AS dirty
        |  FROM documents),
        |n AS (SELECT doc_id, dirty, nfc_normalize(dirty) AS nfc FROM d),
        |s AS (SELECT doc_id, dirty, nfc,
        |             regexp_replace(nfc, '[\x00-\x1f\x7f]', '', 'g') AS stripped
        |      FROM n),
        |r AS (SELECT doc_id, dirty, nfc, stripped,
        |             regexp_replace(regexp_replace(stripped,
        |               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |               '\+[0-9]{1,2} [0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
        |      FROM s)
        |SELECT doc_id,
        |       CAST(length(dirty) AS BIGINT) AS len_raw,
        |       CAST(length(nfc) AS BIGINT) AS len_nfc,
        |       CAST(len(regexp_extract_all(stripped,
        |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |       CAST(len(regexp_extract_all(stripped,
        |         '\+[0-9]{1,2} [0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |       CAST(length(redacted) AS BIGINT) AS len_clean,
        |       md5(redacted) AS clean_hash
        |FROM r ORDER BY doc_id""".stripMargin,
    // Approx-cutpoint deciles: Spark's full-accuracy GK sketch returns the
    // element at rank ceil(p*n) (measured, partition-stable), restated
    // here with an explicit row_number rank formula; bins assigned by the
    // upper-bound rule (1 + #cuts strictly below quality).
    "q76_decile_cutpoints" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, lang, len(toks) AS n_tokens,
        |         CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE) / len(toks) AS stop_ratio,
        |         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
        |  FROM t),
        |q AS (
        |  SELECT doc_id, lang, n_tokens,
        |         round(0.4 * ttr + 0.3 * (1.0 - stop_ratio)
        |               + 0.3 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0), 6) AS quality
        |  FROM b),
        |o AS (
        |  SELECT lang, quality,
        |         row_number() OVER (PARTITION BY lang ORDER BY quality) AS rn,
        |         count(*) OVER (PARTITION BY lang) AS n
        |  FROM q),
        |ranks AS (
        |  SELECT o.lang, g.p,
        |         max(CASE WHEN rn = CAST(ceil(g.p * n / 10.0) AS BIGINT)
        |                  THEN quality END) AS cut
        |  FROM o CROSS JOIN (SELECT unnest(range(1, 10)) AS p) g
        |  GROUP BY o.lang, g.p),
        |cl AS (SELECT lang, list(cut ORDER BY p) AS cuts FROM ranks GROUP BY lang),
        |a AS (
        |  SELECT q.lang, q.n_tokens, q.quality,
        |         1 + len(list_filter(cl.cuts, c -> c < q.quality)) AS decile
        |  FROM q JOIN cl ON q.lang = cl.lang)
        |SELECT lang, CAST(decile AS BIGINT) AS decile, count(*) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS tokens,
        |       min(quality) AS min_quality, max(quality) AS max_quality
        |FROM a GROUP BY lang, decile ORDER BY lang, decile""".stripMargin,
    // Chunking: fixed 64-token windows at stride 48 (16-token overlap),
    // tail chunk short rather than dropped; chunk k = tokens
    // [k*48+1, k*48+64], k to floor((n-1)/48).
    "q77_doc_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |         unnest(range(0, CAST(floor((len(toks) - 1) / 48.0) AS BIGINT) + 1)) AS chunk_id,
        |         toks
        |  FROM t)
        |SELECT doc_id, chunk_id,
        |       CAST(len(toks[chunk_id * 48 + 1 : least(chunk_id * 48 + 64, len(toks))]) AS BIGINT) AS chunk_tokens,
        |       md5(array_to_string(toks[chunk_id * 48 + 1 : least(chunk_id * 48 + 64, len(toks))], ' ')) AS chunk_hash
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    // Vocabulary coverage: top-200 tokens by corpus frequency with
    // cumulative share; total order (cnt desc, tok) pins the limit edge.
    "q78_vocab_coverage" ->
      """WITH t AS (
        |  SELECT string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |c AS (SELECT unnest(toks) AS tok FROM t),
        |g AS (SELECT tok, count(*) AS cnt FROM c GROUP BY tok),
        |tot AS (SELECT sum(len(toks)) AS total FROM t),
        |top AS (SELECT tok, cnt FROM g ORDER BY cnt DESC, tok LIMIT 200),
        |r AS (SELECT tok, CAST(cnt AS BIGINT) AS cnt,
        |             row_number() OVER (ORDER BY cnt DESC, tok) AS rank,
        |             sum(cnt) OVER (ORDER BY cnt DESC, tok
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM top)
        |SELECT CAST(rank AS BIGINT) AS rank, tok, cnt,
        |       round(CAST(cum AS DOUBLE) / (SELECT total FROM tot), 6) AS cum_share
        |FROM r ORDER BY rank""".stripMargin,
    // Dedup clusters: q25's verified pairs → connected components via
    // recursive-CTE transitive closure (a structurally different
    // algorithm from the engine's label propagation — the hash match
    // certifies the assignment, not a shared implementation).
    "q79_dedup_clusters" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |         list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                        for i in range(1, len(toks) - 1)]) AS sh
        |  FROM t WHERE len(toks) >= 3),
        |hs AS (
        |  SELECT doc_id,
        |         list_transform(sh, x -> CAST(concat('0x', substr(md5(x), 1, 14)) AS BIGINT)) AS hv
        |  FROM s),
        |bd AS (
        |  SELECT doc_id,
        |         unnest([concat_ws('|', CAST(b AS VARCHAR),
        |                   CAST(list_min(list_transform(hv, h -> (h * (2 * (2 * b) + 1) + (2 * b) * 7919) % 1000000007)) AS VARCHAR),
        |                   CAST(list_min(list_transform(hv, h -> (h * (2 * (2 * b + 1) + 1) + (2 * b + 1) * 7919) % 1000000007)) AS VARCHAR))
        |                 for b in range(0, 4)]) AS band_key
        |  FROM hs),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bd a JOIN bd b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
        |pairs AS (
        |  SELECT doc_a, doc_b FROM (
        |    SELECT doc_a, doc_b,
        |           round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
        |                 len(list_distinct(sa.sh || sb.sh)), 4) AS jaccard
        |    FROM cand
        |    JOIN s sa ON cand.doc_a = sa.doc_id
        |    JOIN s sb ON cand.doc_b = sb.doc_id)
        |  WHERE jaccard >= 0.7),
        |e AS (SELECT doc_a AS id, doc_b AS nbr FROM pairs
        |      UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT id AS u, id AS v FROM (SELECT DISTINCT id FROM e)
        |  UNION
        |  SELECT reach.u, e.nbr FROM reach JOIN e ON reach.v = e.id),
        |lab AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u)
        |SELECT doc_id, cluster_id,
        |       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
        |       doc_id = cluster_id AS is_canonical
        |FROM lab ORDER BY cluster_id, doc_id""".stripMargin,
    // TF-IDF keywords: ln-free rational idf (n_docs/df) — integer-operand
    // IEEE division is exactly rounded in both engines, ln is not;
    // identical ranking at fixed tf (monotone transform of log tf-idf).
    "q80_tfidf_keywords" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(toks) AS term FROM t)
        |  GROUP BY doc_id, term),
        |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |sc AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfx.df,
        |         CAST(tf.tf * n.n_docs AS DOUBLE) / dfx.df AS score
        |  FROM tf JOIN dfx USING (term) CROSS JOIN n),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |            ORDER BY score DESC, term) AS rank
        |  FROM sc)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df, score
        |FROM rk WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin,
    // BM25: rational Robertson idf (ln-free, q80's argument); the per-doc
    // score folds per-term weights in sorted term order via list_reduce —
    // a strict left fold, bit-matching the engine's sorted aggregate fold.
    "q81_bm25_search" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |q(query_id, term) AS (VALUES
        |  (1, 'spark'), (1, 'join'), (1, 'fast'),
        |  (2, 'agg'), (2, 'stream'), (2, 'window'),
        |  (3, 'customer'), (3, 'query')),
        |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
        |st AS (SELECT CAST(sum(dl) AS BIGINT) AS sum_dl,
        |              CAST(count(*) AS BIGINT) AS n_docs FROM dl),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(toks) AS term FROM t)
        |  WHERE term IN (SELECT term FROM q)
        |  GROUP BY doc_id, term),
        |dfx AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS df
        |  FROM (SELECT doc_id, unnest(list_distinct(toks)) AS term FROM t)
        |  WHERE term IN (SELECT term FROM q)
        |  GROUP BY term),
        |sc AS (
        |  SELECT tf.doc_id, tf.term,
        |         ((CAST(st.n_docs AS DOUBLE) - dfx.df + 0.5) /
        |          (CAST(dfx.df AS DOUBLE) + 0.5)) *
        |         (CAST(tf.tf AS DOUBLE) * 2.2 /
        |          (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
        |           (CAST(dl.dl AS DOUBLE) /
        |            (CAST(st.sum_dl AS DOUBLE) / st.n_docs))))) AS w
        |  FROM tf JOIN dfx USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
        |agg AS (
        |  SELECT q.query_id, sc.doc_id,
        |         list_reduce(list(sc.w ORDER BY sc.term), (a, b) -> a + b)
        |           AS score,
        |         CAST(count(*) AS BIGINT) AS matched_terms
        |  FROM sc JOIN q ON sc.term = q.term
        |  GROUP BY q.query_id, sc.doc_id),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |            ORDER BY score DESC, doc_id) AS rank
        |  FROM agg)
        |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
        |       doc_id, matched_terms, score
        |FROM rk WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // Interval join: containment stated as the naive correlated EXISTS
    // over the merged incident spans — the nested-loop semantics the
    // engine's grid equi-join refuses to execute.
    "q82_interval_join" ->
      """WITH w0 AS (
        |  SELECT ts AS s, ts + INTERVAL 5 MINUTE AS e
        |  FROM events WHERE event_type = 'error'),
        |w1 AS (
        |  SELECT s, e, max(e) OVER (ORDER BY s, e
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM w0),
        |w2 AS (
        |  SELECT s, e, sum(CASE WHEN prev_max IS NULL OR s > prev_max
        |                        THEN 1 ELSE 0 END)
        |    OVER (ORDER BY s, e
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wid
        |  FROM w1),
        |m AS (SELECT wid, min(s) AS ws, max(e) AS we FROM w2 GROUP BY wid),
        |p AS (
        |  SELECT event_type, ts,
        |         CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS epoch_day
        |  FROM events WHERE event_type <> 'error'),
        |inc AS (
        |  SELECT event_type, epoch_day, CAST(count(*) AS BIGINT) AS n_in_incident
        |  FROM p
        |  WHERE EXISTS (SELECT 1 FROM m WHERE p.ts >= m.ws AND p.ts <= m.we)
        |  GROUP BY event_type, epoch_day),
        |tot AS (
        |  SELECT event_type, epoch_day, CAST(count(*) AS BIGINT) AS n_events
        |  FROM p GROUP BY event_type, epoch_day)
        |SELECT tot.event_type, tot.epoch_day, tot.n_events,
        |       CAST(coalesce(inc.n_in_incident, 0) AS BIGINT) AS n_in_incident,
        |       CAST(coalesce(inc.n_in_incident, 0) AS DOUBLE) / tot.n_events
        |         AS incident_share
        |FROM tot LEFT JOIN inc USING (event_type, epoch_day)
        |ORDER BY event_type, epoch_day""".stripMargin,
    // Funnel: the strict chain restated as three join-aggregate stages —
    // a structurally different plan from the engine's single-pass
    // range-frame windows.
    "q83_funnel" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events
        |           WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |v AS (SELECT user_id, min(ts) AS t_view FROM events
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t_view
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        |      GROUP BY e.user_id)
        |SELECT u.user_id,
        |       CAST(CASE WHEN p.t_purchase IS NOT NULL THEN 3
        |                 WHEN c.t_click IS NOT NULL THEN 2
        |                 WHEN v.t_view IS NOT NULL THEN 1
        |                 ELSE 0 END AS BIGINT) AS stage,
        |       strftime(v.t_view, '%Y-%m-%d %H:%M:%S') AS first_view,
        |       strftime(c.t_click, '%Y-%m-%d %H:%M:%S') AS first_click,
        |       strftime(p.t_purchase, '%Y-%m-%d %H:%M:%S') AS first_purchase
        |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
        |       LEFT JOIN p USING (user_id)
        |ORDER BY u.user_id""".stripMargin,
    // Hybrid RRF: keyword extraction (q80 scoring, query docs only) ->
    // BM25 more-like-this (q81 machinery, self excluded) + cosine top-10
    // (q27 verbatim) -> reciprocal rank fusion. The RRF sum is two
    // explicitly-ordered doubles — stated identically on both sides.
    "q84_hybrid_rrf" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |tfq AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(toks) AS term FROM t WHERE doc_id < 5)
        |  GROUP BY doc_id, term),
        |dfq AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS df
        |  FROM (SELECT doc_id, unnest(list_distinct(toks)) AS term FROM t)
        |  WHERE term IN (SELECT DISTINCT term FROM tfq)
        |  GROUP BY term),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |kw AS (
        |  SELECT doc_id AS query_id, term FROM (
        |    SELECT tfq.doc_id, tfq.term,
        |           row_number() OVER (PARTITION BY tfq.doc_id
        |             ORDER BY CAST(tfq.tf * nd.n_docs AS DOUBLE) / dfq.df DESC,
        |                      tfq.term) AS kw_rank
        |    FROM tfq JOIN dfq USING (term) CROSS JOIN nd)
        |  WHERE kw_rank <= 3),
        |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
        |st AS (SELECT CAST(sum(dl) AS BIGINT) AS sum_dl,
        |              CAST(count(*) AS BIGINT) AS n_docs FROM dl),
        |tfl AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(toks) AS term FROM t)
        |  WHERE term IN (SELECT DISTINCT term FROM kw)
        |  GROUP BY doc_id, term),
        |sc AS (
        |  SELECT tfl.doc_id, tfl.term,
        |         ((CAST(st.n_docs AS DOUBLE) - dfq.df + 0.5) /
        |          (CAST(dfq.df AS DOUBLE) + 0.5)) *
        |         (CAST(tfl.tf AS DOUBLE) * 2.2 /
        |          (CAST(tfl.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
        |           (CAST(dl.dl AS DOUBLE) /
        |            (CAST(st.sum_dl AS DOUBLE) / st.n_docs))))) AS w
        |  FROM tfl JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
        |lexagg AS (
        |  SELECT kw.query_id, sc.doc_id,
        |         list_reduce(list(sc.w ORDER BY sc.term), (a, b) -> a + b)
        |           AS score
        |  FROM sc JOIN kw ON sc.term = kw.term
        |  WHERE sc.doc_id <> kw.query_id
        |  GROUP BY kw.query_id, sc.doc_id),
        |lex AS (
        |  SELECT query_id AS q_id, doc_id, CAST(rank AS BIGINT) AS lex_rank
        |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |               ORDER BY score DESC, doc_id) AS rank FROM lexagg)
        |  WHERE rank <= 10),
        |vq AS (
        |  SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |vp AS (
        |  SELECT vq.q_id, e.vec_id AS doc_id,
        |         round(
        |           list_sum([CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) for i in range(1, 65)]) /
        |           (sqrt(list_sum([CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE) for i in range(1, 65)])) *
        |            sqrt(list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) for i in range(1, 65)]))), 6) AS cosine
        |  FROM embeddings e CROSS JOIN vq WHERE e.vec_id <> vq.q_id),
        |vec AS (
        |  SELECT q_id, doc_id, CAST(rank AS BIGINT) AS vec_rank
        |  FROM (SELECT *, row_number() OVER (PARTITION BY q_id
        |               ORDER BY cosine DESC, doc_id) AS rank FROM vp)
        |  WHERE rank <= 10),
        |fused AS (
        |  SELECT coalesce(lex.q_id, vec.q_id) AS q_id,
        |         coalesce(lex.doc_id, vec.doc_id) AS doc_id,
        |         lex.lex_rank, vec.vec_rank,
        |         coalesce(1.0 / (60.0 + lex.lex_rank), 0.0) +
        |         coalesce(1.0 / (60.0 + vec.vec_rank), 0.0) AS rrf
        |  FROM lex FULL OUTER JOIN vec
        |    ON lex.q_id = vec.q_id AND lex.doc_id = vec.doc_id)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, doc_id, lex_rank, vec_rank, rrf
        |FROM (SELECT *, row_number() OVER (PARTITION BY q_id
        |             ORDER BY rrf DESC, doc_id) AS rank FROM fused)
        |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    // Z-order layout audit: the same five spread-and-mask steps in
    // decimal-literal bit arithmetic (0x00FF00FF=16711935, 0x0F0F0F0F=
    // 252645135, 0x33333333=858993459, 0x55555555=1431655765).
    "q85_zorder_layout" ->
      """WITH mx AS (
        |  SELECT max(l_partkey) AS max_pk, max(l_suppkey) AS max_sk
        |  FROM lineitem),
        |s AS (
        |  SELECT l_partkey, l_suppkey,
        |         (l_partkey * 65536) // (max_pk + 1) AS pk16,
        |         (l_suppkey * 65536) // (max_sk + 1) AS sk16
        |  FROM lineitem CROSS JOIN mx),
        |a0 AS (SELECT l_partkey, l_suppkey,
        |              pk16 & 65535 AS ax, sk16 & 65535 AS bx FROM s),
        |a1 AS (SELECT l_partkey, l_suppkey,
        |              (ax | (ax << 8)) & 16711935 AS ax,
        |              (bx | (bx << 8)) & 16711935 AS bx FROM a0),
        |a2 AS (SELECT l_partkey, l_suppkey,
        |              (ax | (ax << 4)) & 252645135 AS ax,
        |              (bx | (bx << 4)) & 252645135 AS bx FROM a1),
        |a3 AS (SELECT l_partkey, l_suppkey,
        |              (ax | (ax << 2)) & 858993459 AS ax,
        |              (bx | (bx << 2)) & 858993459 AS bx FROM a2),
        |a4 AS (SELECT l_partkey, l_suppkey,
        |              (ax | (ax << 1)) & 1431655765 AS ax,
        |              (bx | (bx << 1)) & 1431655765 AS bx FROM a3),
        |m AS (SELECT l_partkey, l_suppkey,
        |             (ax | (bx << 1)) >> 26 AS bucket FROM a4),
        |g AS (
        |  SELECT CAST(bucket AS BIGINT) AS bucket,
        |         CAST(count(*) AS BIGINT) AS n_rows,
        |         min(l_partkey) AS pk_min, max(l_partkey) AS pk_max,
        |         min(l_suppkey) AS sk_min, max(l_suppkey) AS sk_max
        |  FROM m GROUP BY bucket)
        |SELECT bucket, n_rows, pk_min, pk_max, sk_min, sk_max,
        |       pk_max - pk_min AS pk_span, sk_max - sk_min AS sk_span
        |FROM g ORDER BY bucket""".stripMargin,
    // Exactly-once ingest: the oracle counts the ORIGINAL events over
    // closed 10-min windows — a hash match certifies the streaming dedup
    // removed every injected re-delivery and nothing else. Windows close
    // at end <= max(ts) - 1 hour: the final watermark under the query's
    // 1-hour re-delivery-horizon delay.
    "q86_stream_dedup_ingest" ->
      """WITH ev0 AS (
        |  SELECT * FROM events
        |  WHERE event_type IS NOT NULL AND length(trim(event_type)) > 0
        |    AND ts IS NOT NULL AND user_id IS NOT NULL),
        |w AS (
        |  SELECT to_timestamp((epoch_us(ts) // 600000000) * 600) AS ws,
        |         lower(trim(event_type)) AS event_type,
        |         count(*) AS n
        |  FROM ev0 GROUP BY 1, 2),
        |m AS (SELECT max(ts) AS mx FROM ev0)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start, event_type,
        |       CAST(n AS BIGINT) AS n_events
        |FROM w, m WHERE ws + INTERVAL 10 MINUTE <= mx - INTERVAL 1 HOUR
        |ORDER BY win_start, event_type""".stripMargin,
    // Exact Jaccard ground truth: candidates are ALL pairs sharing at
    // least one shingle (exact for any t > 0 — J >= t implies a nonempty
    // intersection), verified with the same unrounded-threshold cut. A
    // hash match therefore certifies the Spark side's prefix-filter
    // RECALL, not just its arithmetic.
    "q87_docs_jaccard_join" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                 for i in range(1, len(toks) - 1)]) AS sh
        |  FROM t WHERE len(toks) >= 3),
        |hsl AS (
        |  SELECT doc_id,
        |         list_transform(sh, x -> CAST(concat('0x', substr(md5(x), 1, 14)) AS BIGINT)) AS hv
        |  FROM s),
        |e AS (SELECT doc_id, unnest(hv) AS g FROM hsl),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id),
        |v AS (
        |  SELECT doc_a, doc_b,
        |         CAST(len(list_intersect(ha.hv, hb.hv)) AS BIGINT) AS shared_ngrams,
        |         CAST(len(ha.hv) + len(hb.hv) - len(list_intersect(ha.hv, hb.hv)) AS BIGINT) AS union_ngrams
        |  FROM cand
        |  JOIN hsl ha ON cand.doc_a = ha.doc_id
        |  JOIN hsl hb ON cand.doc_b = hb.doc_id)
        |SELECT doc_a, doc_b, shared_ngrams, union_ngrams,
        |       round(CAST(shared_ngrams AS DOUBLE) / union_ngrams, 4) AS jaccard
        |FROM v
        |WHERE CAST(shared_ngrams AS DOUBLE) / union_ngrams >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,
    // Rational lift (= 2^PMI), all-integer inputs — the same log-free
    // bit-safety trick as the q80/q81 rational idf.
    "q88_pmi_collocations" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |bg AS (
        |  SELECT b.w1, b.w2, count(*) AS pair_count
        |  FROM (SELECT unnest([{'w1': toks[i], 'w2': toks[i+1]}
        |                       for i in range(1, len(toks))]) AS b FROM t)
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
        |u AS (
        |  SELECT w, count(*) AS c
        |  FROM (SELECT unnest(toks) AS w FROM t) GROUP BY 1),
        |n AS (SELECT CAST(sum(len(toks)) AS BIGINT) AS n_tokens FROM t)
        |SELECT bg.w1, bg.w2, pair_count,
        |       round(CAST(pair_count AS DOUBLE) * n_tokens / (u1.c * u2.c), 4) AS lift
        |FROM bg JOIN u u1 ON bg.w1 = u1.w JOIN u u2 ON bg.w2 = u2.w, n
        |ORDER BY w1, w2""".stripMargin,
    "q89_skew_probe" ->
      """WITH k AS (
        |  SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_rows,
        |             CAST(count(*) AS BIGINT) AS n_keys FROM k)
        |SELECT user_id, cnt,
        |       round(CAST(cnt AS DOUBLE) * n_keys / total_rows, 4) AS skew_ratio,
        |       (cnt * n_keys + total_rows - 1) // total_rows AS salt_factor
        |FROM k, t
        |ORDER BY cnt DESC, user_id LIMIT 20""".stripMargin,
    // All-integer TV distance (DuckDB int128 sums ≡ Spark decimal(38,0));
    // the absent-token mass folds into the closed form N·n_s, so the
    // oracle joins only present (source, token) pairs like the engine.
    "q90_source_tv_drift" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |st AS (
        |  SELECT d.source, unnest(t.toks) AS w
        |  FROM t JOIN documents d USING (doc_id)),
        |sw AS (SELECT source, w, count(*) AS c_sw FROM st GROUP BY 1, 2),
        |cw AS (SELECT w, sum(c_sw) AS c_w FROM sw GROUP BY 1),
        |ns AS (SELECT source, sum(c_sw) AS n_src FROM sw GROUP BY 1),
        |n AS (SELECT sum(n_src) AS n_total FROM ns),
        |term AS (
        |  SELECT sw.source, ns.n_src, n.n_total,
        |         abs(c_sw * n_total - c_w * n_src) - c_w * n_src AS term
        |  FROM sw JOIN cw USING (w) JOIN ns USING (source), n),
        |a AS (
        |  SELECT source, n_src, n_total, sum(term) AS adj
        |  FROM term GROUP BY 1, 2, 3)
        |SELECT source, CAST(n_src AS BIGINT) AS n_tokens,
        |       round(CAST(n_total * n_src + adj AS DOUBLE) /
        |             (2.0 * n_total * n_src), 6) AS tv_dist
        |FROM a ORDER BY source""".stripMargin,
    // Incremental IVF assignment restated with the q46 scoring
    // construction (ordered list_sum fold ≡ graft_dot); the rebalance
    // flag is an integer compare, engine-independent by construction.
    "q91_ivf_delta_assign" ->
      """WITH emb AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) for i in range(1, 65)])) AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cid, embedding AS cv, nrm AS cnrm FROM emb WHERE vec_id < 16),
        |scored AS (
        |  SELECT e.vec_id, (e.vec_id >= 16 AND e.vec_id % 7 = 3) AS is_delta, c.cid,
        |         list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE) for i in range(1, 65)])
        |           / (e.nrm * c.cnrm) AS score
        |  FROM emb e CROSS JOIN c),
        |assign AS (
        |  SELECT vec_id, is_delta, cid FROM (
        |    SELECT vec_id, is_delta, cid,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
        |    FROM scored) WHERE rn = 1),
        |counts AS (
        |  SELECT cid,
        |         CAST(count(*) FILTER (NOT is_delta) AS BIGINT) AS standing_count,
        |         CAST(count(*) FILTER (is_delta) AS BIGINT) AS delta_count
        |  FROM assign GROUP BY cid),
        |tot AS (
        |  SELECT cid, standing_count, delta_count,
        |         standing_count + delta_count AS new_total,
        |         sum(standing_count + delta_count) OVER () AS grand,
        |         count(*) OVER () AS n_lists
        |  FROM counts)
        |SELECT cid, standing_count, delta_count,
        |       CAST(new_total AS BIGINT) AS new_total,
        |       new_total * n_lists > 2 * grand AS rebalance
        |FROM tot ORDER BY cid""".stripMargin,
    "q92_table_stats" ->
      """WITH s AS (
        |  SELECT count(*) AS n_rows,
        |         count(DISTINCT l_orderkey) AS d1, count(l_orderkey) AS c1,
        |         count(DISTINCT l_partkey) AS d2, count(l_partkey) AS c2,
        |         count(DISTINCT l_suppkey) AS d3, count(l_suppkey) AS c3,
        |         count(DISTINCT l_returnflag) AS d4, count(l_returnflag) AS c4,
        |         count(DISTINCT l_shipdate) AS d5, count(l_shipdate) AS c5
        |  FROM lineitem)
        |SELECT column_name, n_rows, ndv, null_count FROM (
        |  SELECT 'l_orderkey' AS column_name, n_rows, d1 AS ndv, n_rows - c1 AS null_count FROM s
        |  UNION ALL
        |  SELECT 'l_partkey', n_rows, d2, n_rows - c2 FROM s
        |  UNION ALL
        |  SELECT 'l_suppkey', n_rows, d3, n_rows - c3 FROM s
        |  UNION ALL
        |  SELECT 'l_returnflag', n_rows, d4, n_rows - c4 FROM s
        |  UNION ALL
        |  SELECT 'l_shipdate', n_rows, d5, n_rows - c5 FROM s)
        |ORDER BY column_name""".stripMargin,
    // ExactSubstr spans: the same position-carrying trigram-hash table,
    // duplicated-hash set, and gaps-and-islands merge restated in SQL.
    // Islands fuse when interval [pos, pos+2] overlaps or touches the
    // running-max previous end (pos <= prev_max_pos + 3).
    "q93_exact_substr_spans" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, unnest(range(1, len(toks) - 1)) AS pos, toks
        |  FROM t WHERE len(toks) >= 3),
        |g AS (
        |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
        |         CAST(concat('0x', substr(md5(
        |           toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2]
        |         ), 1, 14)) AS BIGINT) AS h
        |  FROM p),
        |dup AS (SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        |dp AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (h)),
        |m AS (
        |  SELECT doc_id, pos,
        |         CASE WHEN max(pos) OVER (PARTITION BY doc_id ORDER BY pos
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |              OR pos > max(pos) OVER (PARTITION BY doc_id ORDER BY pos
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 3
        |              THEN 1 ELSE 0 END AS st
        |  FROM dp),
        |s AS (
        |  SELECT doc_id, pos,
        |         sum(st) OVER (PARTITION BY doc_id ORDER BY pos
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM m),
        |sp AS (
        |  SELECT doc_id, min(pos) AS span_start, max(pos) + 2 AS span_end
        |  FROM s GROUP BY doc_id, sid)
        |SELECT doc_id, span_start, span_end,
        |       span_end - span_start + 1 AS span_tokens
        |FROM sp ORDER BY doc_id, span_start""".stripMargin,
    // Domain-cap pack: cap per (lang, source) at 150 tokens, then the
    // q50 greedy fill per lang at 2000 over the cap survivors — both as
    // running-total windows in the same (quality DESC, doc_id) order.
    "q94_source_capped_pack" ->
      """WITH t AS (
        |  SELECT doc_id, lang, source,
        |         string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, lang, source, CAST(len(toks) AS BIGINT) AS n_tokens,
        |         CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE) / len(toks) AS stop_ratio,
        |         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
        |  FROM t),
        |q AS (
        |  SELECT doc_id, lang, source, n_tokens,
        |         round(0.4 * ttr + 0.3 * (1.0 - stop_ratio)
        |               + 0.3 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0), 6) AS quality
        |  FROM b),
        |c1 AS (
        |  SELECT *, sum(n_tokens) OVER (PARTITION BY lang, source
        |            ORDER BY quality DESC, doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_src_tokens
        |  FROM q),
        |k AS (SELECT * FROM c1 WHERE cum_src_tokens <= 150),
        |c2 AS (
        |  SELECT *, sum(n_tokens) OVER (PARTITION BY lang
        |            ORDER BY quality DESC, doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        |  FROM k)
        |SELECT doc_id, lang, source, n_tokens, quality,
        |       CAST(cum_src_tokens AS BIGINT) AS cum_src_tokens,
        |       CAST(cum_tokens AS BIGINT) AS cum_tokens
        |FROM c2 WHERE cum_tokens <= 2000
        |ORDER BY lang, cum_tokens, doc_id""".stripMargin,
    // Bigram LM quality: integer-ppm conditional probabilities from the
    // corpus's own bigram model, integer mean per doc — log-free, so the
    // hash compare is exact (same recipe as the q80/q81 rational idf).
    "q95_bigram_lm_score" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, unnest(range(1, len(toks))) AS i, toks
        |  FROM t WHERE len(toks) >= 2),
        |g AS (
        |  SELECT doc_id,
        |         CAST(concat('0x', substr(md5(toks[i] || ' ' || toks[i+1]), 1, 14)) AS BIGINT) AS h12,
        |         CAST(concat('0x', substr(md5(toks[i]), 1, 14)) AS BIGINT) AS h1
        |  FROM p),
        |pair AS (SELECT h12, h1, count(*) AS c12 FROM g GROUP BY 1, 2),
        |ctx AS (SELECT h1, sum(c12) AS c1 FROM pair GROUP BY 1),
        |model AS (
        |  SELECT h12, (c12 * 1000000) // c1 AS p_ppm
        |  FROM pair JOIN ctx USING (h1))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |       CAST(sum(p_ppm) // count(*) AS BIGINT) AS score_ppm
        |FROM g JOIN model USING (h12)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Substring redaction: q93's duplicated start positions expanded to
    // covered positions, tokens at covered positions cut, text rebuilt
    // from the surviving token stream.
    "q96_substr_redact" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, unnest(range(1, len(toks) - 1)) AS pos, toks
        |  FROM t WHERE len(toks) >= 3),
        |g AS (
        |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
        |         CAST(concat('0x', substr(md5(
        |           toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2]
        |         ), 1, 14)) AS BIGINT) AS h
        |  FROM p),
        |dup AS (SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        |dp AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (h)),
        |cov AS (
        |  SELECT DISTINCT doc_id, pos + d AS cpos
        |  FROM dp CROSS JOIN unnest([0, 1, 2]) AS u(d)),
        |covl AS (SELECT doc_id, list(cpos) AS cps FROM cov GROUP BY doc_id)
        |SELECT t.doc_id AS doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |       CAST(len(toks) - coalesce(len(cps), 0) AS BIGINT) AS kept_tokens,
        |       coalesce(array_to_string(
        |         [toks[i] FOR i IN range(1, len(toks) + 1)
        |          IF NOT list_contains(coalesce(cps, []), i)], ' '), '') AS redacted_text
        |FROM t LEFT JOIN covl ON t.doc_id = covl.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    // Keep-one redaction: each duplicated gram elects its min-doc_id
    // owner; only non-owner occurrences are covered.
    "q97_substr_redact_keep_one" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, unnest(range(1, len(toks) - 1)) AS pos, toks
        |  FROM t WHERE len(toks) >= 3),
        |g AS (
        |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
        |         CAST(concat('0x', substr(md5(
        |           toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2]
        |         ), 1, 14)) AS BIGINT) AS h
        |  FROM p),
        |dup AS (
        |  SELECT h, min(doc_id) AS owner FROM g
        |  GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        |dp AS (
        |  SELECT g.doc_id, g.pos FROM g JOIN dup USING (h)
        |  WHERE g.doc_id <> dup.owner),
        |cov AS (
        |  SELECT DISTINCT doc_id, pos + d AS cpos
        |  FROM dp CROSS JOIN unnest([0, 1, 2]) AS u(d)),
        |covl AS (SELECT doc_id, list(cpos) AS cps FROM cov GROUP BY doc_id)
        |SELECT t.doc_id AS doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |       CAST(len(toks) - coalesce(len(cps), 0) AS BIGINT) AS kept_tokens,
        |       coalesce(array_to_string(
        |         [toks[i] FOR i IN range(1, len(toks) + 1)
        |          IF NOT list_contains(coalesce(cps, []), i)], ' '), '') AS redacted_text
        |FROM t LEFT JOIN covl ON t.doc_id = covl.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    // PQ + ADC: subspace micro-distances (ordered 16-element fold,
    // integer micro-units), argmin codes, 4-lookup integer ADC sum.
    "q98_embed_pq_adc" ->
      """WITH cb AS (
        |  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 16),
        |sub AS (
        |  SELECT e.vec_id, c.cid, t.s,
        |         CAST(round(list_sum([
        |           (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))
        |             * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))
        |           for i in range(t.s * 16 + 1, t.s * 16 + 17)]) * 1000000)
        |           AS BIGINT) AS d_um
        |  FROM embeddings e
        |  CROSS JOIN cb c
        |  CROSS JOIN unnest([0, 1, 2, 3]) AS t(s)),
        |codes AS (
        |  SELECT vec_id, s, cid AS code FROM (
        |    SELECT vec_id, s, cid,
        |           row_number() OVER (PARTITION BY vec_id, s ORDER BY d_um, cid) AS rn
        |    FROM sub) WHERE rn = 1),
        |lut AS (
        |  SELECT vec_id AS q_id, s, cid, d_um FROM sub WHERE vec_id < 5),
        |adc AS (
        |  SELECT l.q_id, c.vec_id, CAST(sum(l.d_um) AS BIGINT) AS adc_um
        |  FROM codes c JOIN lut l ON c.s = l.s AND c.code = l.cid
        |  WHERE c.vec_id <> l.q_id
        |  GROUP BY 1, 2),
        |short AS (
        |  SELECT q_id, vec_id, adc_um FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_id
        |           ORDER BY adc_um, vec_id) AS srank
        |    FROM adc) WHERE srank <= 32),
        |rer AS (
        |  SELECT s.q_id, s.vec_id, s.adc_um,
        |         round(list_sum([
        |           (CAST(x.embedding[i] AS DOUBLE) - CAST(q.embedding[i] AS DOUBLE))
        |             * (CAST(x.embedding[i] AS DOUBLE) - CAST(q.embedding[i] AS DOUBLE))
        |           for i in range(1, 65)]), 6) AS l2sq
        |  FROM short s
        |  JOIN embeddings q ON s.q_id = q.vec_id
        |  JOIN embeddings x ON s.vec_id = x.vec_id)
        |SELECT q_id, vec_id, adc_um, l2sq, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id
        |            ORDER BY l2sq, vec_id) AS BIGINT) AS rank
        |  FROM rer)
        |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,
    // Token blockization: the oracle states the NAIVE form — one global
    // running sum in doc_id order — which the two-level prefix sum must
    // equal exactly (all block math is non-negative integer division).
    "q100_token_blocks" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
        |  FROM t)
        |SELECT doc_id, n_tokens, "offset",
        |       "offset" // 256 AS block_first,
        |       ("offset" + n_tokens - 1) // 256 AS block_last,
        |       ("offset" + n_tokens - 1) // 256 - "offset" // 256 + 1 AS blocks_spanned
        |FROM c ORDER BY doc_id""".stripMargin,
    // IVF-PQ: q46's cosine-argmax lists + nProbe=2 probe bound the
    // candidates; q98's codes/LUT/shortlist/rerank ladder prices them.
    "q99_embed_ivf_pq" ->
      """WITH emb AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) for i in range(1, 65)])) AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cid, embedding AS cv, nrm AS cnrm FROM emb WHERE vec_id < 16),
        |scored AS (
        |  SELECT e.vec_id, c.cid,
        |         list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE) for i in range(1, 65)])
        |           / (e.nrm * c.cnrm) AS score
        |  FROM emb e CROSS JOIN c),
        |assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
        |    FROM scored) WHERE rn = 1),
        |qprobe AS (
        |  SELECT vec_id AS q_id, cid FROM (
        |    SELECT vec_id, cid,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
        |    FROM scored WHERE vec_id < 5) WHERE rn <= 2),
        |cand AS (
        |  SELECT q.q_id, a.vec_id FROM assign a JOIN qprobe q ON a.cid = q.cid
        |  WHERE a.vec_id <> q.q_id),
        |cb AS (
        |  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 16),
        |sub AS (
        |  SELECT e.vec_id, cc.cid, t.s,
        |         CAST(round(list_sum([
        |           (CAST(e.embedding[i] AS DOUBLE) - CAST(cc.cv[i] AS DOUBLE))
        |             * (CAST(e.embedding[i] AS DOUBLE) - CAST(cc.cv[i] AS DOUBLE))
        |           for i in range(t.s * 16 + 1, t.s * 16 + 17)]) * 1000000)
        |           AS BIGINT) AS d_um
        |  FROM embeddings e
        |  CROSS JOIN cb cc
        |  CROSS JOIN unnest([0, 1, 2, 3]) AS t(s)),
        |codes AS (
        |  SELECT vec_id, s, cid AS code FROM (
        |    SELECT vec_id, s, cid,
        |           row_number() OVER (PARTITION BY vec_id, s ORDER BY d_um, cid) AS rn
        |    FROM sub) WHERE rn = 1),
        |lut AS (
        |  SELECT vec_id AS q_id, s, cid, d_um FROM sub WHERE vec_id < 5),
        |adc AS (
        |  SELECT ca.q_id, ca.vec_id, CAST(sum(l.d_um) AS BIGINT) AS adc_um
        |  FROM cand ca
        |  JOIN codes co ON ca.vec_id = co.vec_id
        |  JOIN lut l ON l.q_id = ca.q_id AND l.s = co.s AND l.cid = co.code
        |  GROUP BY 1, 2),
        |short AS (
        |  SELECT q_id, vec_id, adc_um FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_id
        |           ORDER BY adc_um, vec_id) AS srank
        |    FROM adc) WHERE srank <= 32),
        |rer AS (
        |  SELECT s.q_id, s.vec_id, s.adc_um,
        |         round(list_sum([
        |           (CAST(x.embedding[i] AS DOUBLE) - CAST(q.embedding[i] AS DOUBLE))
        |             * (CAST(x.embedding[i] AS DOUBLE) - CAST(q.embedding[i] AS DOUBLE))
        |           for i in range(1, 65)]), 6) AS l2sq
        |  FROM short s
        |  JOIN embeddings q ON s.q_id = q.vec_id
        |  JOIN embeddings x ON s.vec_id = x.vec_id)
        |SELECT q_id, vec_id, adc_um, l2sq, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id
        |            ORDER BY l2sq, vec_id) AS BIGINT) AS rank
        |  FROM rer)
        |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,
    // Semantic dedup: q36's pair graph (same bucketed-LSH restatement)
    // closed transitively by DuckDB's recursive CTE — q79's oracle
    // pattern on the embedding side.
    "q101_semdedup_clusters" -> semdedupClosureOracle,
    // Incremental cluster maintenance reuses the SAME full-closure
    // oracle verbatim: the incremental plan (label stars + delta pairs)
    // must land on the batch recompute's hash — the strongest equality
    // claim the gate can express.
    "q106_incr_sem_clusters" -> semdedupClosureOracle,
  ) ++ mixCascadeOracles

  private val semdedupClosureOracle: String =
      """WITH RECURSIVE wb AS (
        |  SELECT vec_id, embedding,
        |         CAST(list_sum(
        |           [CASE WHEN list_sum([(CAST(((p * 131071 + i * 524287) * 2654435761) % 1000003 AS DOUBLE) / 1000003.0 - 0.5)
        |                                * CAST(embedding[i] AS DOUBLE) for i in range(1, 65)]) > 0
        |                 THEN CAST(round(pow(2, p)) AS BIGINT) ELSE CAST(0 AS BIGINT) END
        |            for p in range(0, 4)]) AS BIGINT) AS bucket
        |  FROM embeddings),
        |p2 AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |         round(
        |           list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) for i in range(1, 65)]) /
        |           (sqrt(list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE) for i in range(1, 65)])) *
        |            sqrt(list_sum([CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) for i in range(1, 65)]))), 6) AS cosine
        |  FROM wb a JOIN wb b ON bit_count(xor(a.bucket, b.bucket)) <= 1 AND a.vec_id < b.vec_id),
        |pairs AS (SELECT vec_a, vec_b FROM p2 WHERE cosine >= 0.4),
        |e AS (SELECT vec_a AS id, vec_b AS nbr FROM pairs
        |      UNION ALL SELECT vec_b, vec_a FROM pairs),
        |reach AS (
        |  SELECT id AS u, id AS v FROM (SELECT DISTINCT id FROM e)
        |  UNION
        |  SELECT reach.u, e.nbr FROM reach JOIN e ON reach.v = e.id),
        |lab AS (SELECT u AS vec_id, min(v) AS cluster_id FROM reach GROUP BY u)
        |SELECT vec_id, cluster_id,
        |       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
        |       vec_id = cluster_id AS is_canonical
        |FROM lab ORDER BY cluster_id, vec_id""".stripMargin

  private val mixCascadeOracles: Map[String, String] = Map(
    // Temperature mix (α = 1/2): all allocation arithmetic is integer —
    // w = floor(sqrt(mass)) is the one double op, and IEEE sqrt is
    // correctly rounded so both engines floor the identical value; the
    // allocation itself uses integer division (`div` / `//`), never a
    // double quotient.
    "q102_temperature_mix" ->
      """WITH t AS (
        |  SELECT doc_id, lang, source,
        |         string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, lang, source, CAST(len(toks) AS BIGINT) AS n_tokens,
        |         CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE) / len(toks) AS stop_ratio,
        |         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
        |  FROM t),
        |q AS (
        |  SELECT doc_id, lang, source, n_tokens,
        |         round(0.4 * ttr + 0.3 * (1.0 - stop_ratio)
        |               + 0.3 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0), 6) AS quality
        |  FROM b),
        |m AS (
        |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens,
        |         CAST(floor(sqrt(CAST(sum(n_tokens) AS DOUBLE))) AS BIGINT) AS w
        |  FROM q GROUP BY source),
        |d AS (SELECT CAST(sum(w) AS BIGINT) AS sw FROM m),
        |a AS (SELECT m.source, m.src_tokens,
        |             CAST((6000 * m.w) // d.sw AS BIGINT) AS alloc_tokens
        |      FROM m, d),
        |c AS (
        |  SELECT q.*, a.src_tokens, a.alloc_tokens,
        |         sum(n_tokens) OVER (PARTITION BY q.source
        |           ORDER BY quality DESC, doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        |  FROM q JOIN a ON q.source = a.source)
        |SELECT doc_id, lang, source, n_tokens, quality, src_tokens,
        |       alloc_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
        |FROM c WHERE cum_tokens <= alloc_tokens
        |ORDER BY source, cum_tokens, doc_id""".stripMargin,
    // Filter cascade: first-fail attribution via the same ordered CASE
    // chain; min/max are order-insensitive so no float-sum tolerance.
    "q103_filter_cascade" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |         string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens,
        |         CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE) / len(toks) AS stop_ratio,
        |         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
        |  FROM t),
        |q AS (
        |  SELECT *, round(0.4 * ttr + 0.3 * (1.0 - stop_ratio)
        |            + 0.3 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0), 6) AS quality
        |  FROM b),
        |v AS (
        |  SELECT *,
        |         CAST(CASE WHEN n_tokens < 16 THEN 1
        |              WHEN stop_ratio < 0.015 THEN 2
        |              WHEN ttr < 0.32 THEN 3
        |              WHEN quality < 0.62 THEN 4
        |              ELSE 5 END AS BIGINT) AS rule_idx,
        |         CASE WHEN n_tokens < 16 THEN 'too_short'
        |              WHEN stop_ratio < 0.015 THEN 'low_stopword'
        |              WHEN ttr < 0.32 THEN 'high_repetition'
        |              WHEN quality < 0.62 THEN 'low_quality'
        |              ELSE 'kept' END AS verdict
        |  FROM q)
        |SELECT lang, rule_idx, verdict,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS tokens,
        |       min(quality) AS min_quality, max(quality) AS max_quality
        |FROM v GROUP BY lang, rule_idx, verdict
        |ORDER BY lang, rule_idx""".stripMargin,
    // BPE trainer: all 10 merge iterations restated as an UNROLLED chain
    // of MATERIALIZED CTEs (materialization is semantically inert but
    // stops DuckDB re-evaluating each vocab level twice per stage — the
    // naive chain is 2^N). Every row certifies one full
    // argmax-over-evolving-vocabulary round; literal `replace` has the
    // same left-to-right non-overlapping semantics in both engines, which
    // IS the BPE greedy merge rule.
    "q104_bpe_train" -> bpeOracleSql(10),
    // Batched trainer at the production-shaped dial: the SAME unrolled
    // sequential chain, 50 stages — DuckDB certifies per-round argmaxes,
    // so any batched deviation from the sequential order hash-fails.
    "q112_bpe_train_batched" -> bpeOracleSql(50),
    // BPE encode: same unrolled chain, then a 10-deep literal-replace
    // fold applied to every corpus word -- the map-only projection the
    // Spark side plans, restated.
    "q105_bpe_encode" -> bpeEncodeOracleSql(10),
    // WordPiece: the same unrolled chain with a per-round unigram CTE and
    // the likelihood-ratio argmax (ORDER BY an IEEE-exact division of
    // exact integers -- identical doubles in both engines).
    "q107_wordpiece_train" -> wordpieceOracleSql(10),
    "q127_wordpiece_encode" -> wordpieceEncodeOracleSql(10, 16),
    // Quality calibration: percent_rank over the total (quality, doc_id)
    // order -- (rank-1)/(n-1) is an IEEE-exact division of exact ints.
    "q108_quality_calibration" ->
      """WITH t AS (
        |  SELECT doc_id, lang, source,
        |         string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, lang, source, CAST(len(toks) AS BIGINT) AS n_tokens,
        |         CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE) / len(toks) AS stop_ratio,
        |         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
        |  FROM t),
        |q AS (
        |  SELECT doc_id, lang, source, n_tokens,
        |         round(0.4 * ttr + 0.3 * (1.0 - stop_ratio)
        |               + 0.3 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0), 6) AS quality
        |  FROM b),
        |c AS (
        |  SELECT *, CAST(round(1e9 * percent_rank() OVER (PARTITION BY source
        |              ORDER BY quality, doc_id)) AS BIGINT) AS cal_e9
        |  FROM q)
        |SELECT doc_id, lang, source, n_tokens, quality, cal_e9,
        |       cal_e9 >= 500000000 AS keep_fair
        |FROM c ORDER BY doc_id""".stripMargin,
    // ExactSubstr at the production gram width: the q93 restatement
    // with k parameterized (list slice instead of the hand-unrolled
    // trigram concat) — certifies the dial real deployments run.
    "q109_exact_substr_prod_k" -> exactSubstrOracleSql(20),
    // Perceptual-hash image dedup: DuckDB rebuilds the whole image
    // corpus (canonical luma + re-export luma: R+8 lift, 1-pixel white
    // stamp) from the text bytes, restates the 60-bit dHash with exact
    // integer bit packing (1::BIGINT << s — a float 2**s would corrupt
    // high bits), the 4×15 banding, the Hamming≤3 verify, and the
    // connected components via the q79 recursive CTE.
    "q110_image_phash_dedup" ->
      """WITH RECURSIVE o AS (
        |  SELECT doc_id, list_transform(string_split(text, ''), x -> ord(x)) AS ords
        |  FROM documents),
        |v AS (
        |  SELECT doc_id,
        |         list_transform(ords, b -> 299*b + 587*(255-b) + 114*((7*b)%256)) AS lum
        |  FROM o
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |         [ CASE WHEN i = 1 THEN 255000
        |                ELSE 299*least(255, ords[i]+8) + 587*(255-ords[i]) + 114*((7*ords[i])%256) END
        |           for i in range(1, len(ords)+1) ]
        |  FROM o),
        |hx AS (
        |  SELECT doc_id, len(lum) AS n,
        |         [ {'s': s,
        |            'ss': list_sum(lum[(s*len(lum))//least(61,len(lum)) + 1 : ((s+1)*len(lum))//least(61,len(lum))]),
        |            'sl': ((s+1)*len(lum))//least(61,len(lum)) - (s*len(lum))//least(61,len(lum))}
        |           for s in range(0, least(61, len(lum))) ] AS sp
        |  FROM v),
        |ph AS (
        |  SELECT doc_id,
        |         list_sum([ CASE WHEN sp[s+1].ss * sp[s+2].sl > sp[s+2].ss * sp[s+1].sl
        |                         THEN (1::BIGINT << s) ELSE 0 END
        |                    for s in range(0, len(sp)-1) ])::BIGINT AS dhash
        |  FROM hx),
        |bd AS (
        |  SELECT doc_id, dhash,
        |         unnest([ concat_ws('|', CAST(b AS VARCHAR),
        |                    CAST((dhash >> (15*b)) & 32767 AS VARCHAR)) for b in range(0,4) ]) AS bk
        |  FROM ph),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         a.dhash AS ha, b.dhash AS hb
        |  FROM bd a JOIN bd b ON a.bk = b.bk AND a.doc_id < b.doc_id),
        |pairs AS (SELECT doc_a, doc_b FROM cand WHERE bit_count(xor(ha, hb)) <= 3),
        |e AS (SELECT doc_a AS id, doc_b AS nbr FROM pairs
        |      UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT id AS u, id AS v FROM (SELECT DISTINCT id FROM e)
        |  UNION
        |  SELECT reach.u, e.nbr FROM reach JOIN e ON reach.v = e.id),
        |lab AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u)
        |SELECT doc_id, cluster_id,
        |       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
        |       doc_id = cluster_id AS is_canonical
        |FROM lab ORDER BY cluster_id, doc_id""".stripMargin,
    // Semantic decontamination: q36's probed-bucket pair condition
    // (Hamming<=1 on the sign-LSH bucket) restricted to train×eval
    // pairs, aggregated per contaminated train vector.
    "q113_semantic_decontaminate" ->
      """WITH wb AS (
        |  SELECT vec_id, embedding,
        |         CAST(list_sum(
        |           [CASE WHEN list_sum([(CAST(((p * 131071 + i * 524287) * 2654435761) % 1000003 AS DOUBLE) / 1000003.0 - 0.5)
        |                                * CAST(embedding[i] AS DOUBLE) for i in range(1, 65)]) > 0
        |                 THEN CAST(round(pow(2, p)) AS BIGINT) ELSE CAST(0 AS BIGINT) END
        |            for p in range(0, 4)]) AS BIGINT) AS bucket
        |  FROM embeddings),
        |p2 AS (
        |  SELECT t.vec_id AS vec_id, h.vec_id AS eval_id,
        |         round(
        |           list_sum([CAST(t.embedding[i] AS DOUBLE) * CAST(h.embedding[i] AS DOUBLE) for i in range(1, 65)]) /
        |           (sqrt(list_sum([CAST(t.embedding[i] AS DOUBLE) * CAST(t.embedding[i] AS DOUBLE) for i in range(1, 65)])) *
        |            sqrt(list_sum([CAST(h.embedding[i] AS DOUBLE) * CAST(h.embedding[i] AS DOUBLE) for i in range(1, 65)]))), 6) AS cosine
        |  FROM wb t JOIN wb h
        |    ON bit_count(xor(t.bucket, h.bucket)) <= 1
        |   AND t.vec_id % 10 <> 7 AND h.vec_id % 10 = 7)
        |SELECT vec_id, count(*) AS n_eval_matches, max(cosine) AS max_cosine,
        |       min(eval_id) AS first_eval
        |FROM p2 WHERE cosine >= 0.4
        |GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    // Hard-negative mining: q46's IVF probe ladder with a label
    // anti-filter between candidate and query, top-5 per query.
    "q114_hard_negatives" ->
      """WITH emb AS (
        |  SELECT vec_id, label, embedding,
        |         sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) for i in range(1, 65)])) AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cid, embedding AS cv, nrm AS cnrm FROM emb WHERE vec_id < 16),
        |scored AS (
        |  SELECT e.vec_id, e.label, e.embedding, e.nrm, c.cid,
        |         list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE) for i in range(1, 65)])
        |           / (e.nrm * c.cnrm) AS score
        |  FROM emb e CROSS JOIN c),
        |assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
        |    FROM scored) WHERE rn = 1),
        |qprobe AS (
        |  SELECT vec_id AS q_id, label AS q_label, embedding AS qv, nrm AS qnrm, cid FROM (
        |    SELECT vec_id, label, embedding, nrm, cid,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
        |    FROM scored WHERE vec_id < 5) WHERE rn <= 2),
        |cand AS (
        |  SELECT q.q_id, q.q_label, e.vec_id, e.label AS n_label,
        |         round(
        |           list_sum([CAST(q.qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) for i in range(1, 65)])
        |             / (q.qnrm * e.nrm), 6) AS cosine
        |  FROM emb e JOIN assign a ON e.vec_id = a.vec_id
        |             JOIN qprobe q ON a.cid = q.cid
        |  WHERE e.vec_id <> q.q_id AND e.label <> q.q_label)
        |SELECT q_id, q_label, vec_id, n_label, cosine, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
        |  FROM cand)
        |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    // Binary-quantization ladder: sign codes packed as two 32-bit words,
    // Hamming shortlist (integer-only), exact-cosine rerank of the
    // shortlist — the full q111 ladder restated stage for stage.
    "q111_embed_binary_topk" ->
      """WITH cb AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) for i in range(1, 65)])) AS nrm,
        |         list_sum([CASE WHEN CAST(embedding[i] AS DOUBLE) > 0.0 THEN (1::BIGINT << (i-1)) ELSE 0 END for i in range(1, 33)]) AS c_lo,
        |         list_sum([CASE WHEN CAST(embedding[i] AS DOUBLE) > 0.0 THEN (1::BIGINT << (i-33)) ELSE 0 END for i in range(33, 65)]) AS c_hi
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, embedding AS qe, nrm AS qnrm,
        |             c_lo AS ql, c_hi AS qh
        |      FROM cb WHERE vec_id < 5),
        |ham AS (
        |  SELECT q.q_id, c.vec_id, c.embedding, c.nrm, q.qe, q.qnrm,
        |         CAST(bit_count(xor(c.c_lo, q.ql)) + bit_count(xor(c.c_hi, q.qh)) AS BIGINT) AS hamming
        |  FROM cb c CROSS JOIN q WHERE c.vec_id <> q.q_id),
        |sl AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY hamming, vec_id) AS hrank
        |    FROM ham) WHERE hrank <= 50),
        |rr AS (
        |  SELECT q_id, vec_id, hamming,
        |         round(list_sum([CAST(qe[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) for i in range(1, 65)])
        |               / (qnrm * nrm), 6) AS cosine
        |  FROM sl)
        |SELECT q_id, vec_id, hamming, cosine, CAST(rn AS BIGINT) AS rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn FROM rr)
        |WHERE rn <= 10 ORDER BY q_id, rank""".stripMargin,
    // Paragraph-level boilerplate removal: 32-token disjoint windows,
    // drop any paragraph text occurring in > 1 distinct doc, reassemble
    // surviving paragraphs in order; docs losing everything stay as
    // empty rows via the left join.
    "q115_paragraph_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |p AS (
        |  SELECT doc_id,
        |         unnest(range(0, CAST(floor((len(toks) - 1) / 32.0) AS BIGINT) + 1)) AS pid,
        |         toks
        |  FROM t),
        |s AS (
        |  SELECT doc_id, pid,
        |         array_to_string(toks[pid * 32 + 1 : least((pid + 1) * 32, len(toks))], ' ') AS para
        |  FROM p),
        |h AS (SELECT doc_id, pid, para, md5(para) AS ph FROM s),
        |b AS (SELECT ph FROM h GROUP BY ph HAVING count(DISTINCT doc_id) > 1),
        |kept AS (SELECT * FROM h WHERE ph NOT IN (SELECT ph FROM b)),
        |r AS (
        |  SELECT doc_id, count(*) AS kept_paras,
        |         string_agg(para, ' ' ORDER BY pid) AS clean_text
        |  FROM kept GROUP BY doc_id)
        |SELECT t.doc_id,
        |       CAST(floor((len(t.toks) - 1) / 32.0) + 1 AS BIGINT) AS n_paras,
        |       COALESCE(r.kept_paras, 0) AS kept_paras,
        |       COALESCE(r.clean_text, '') AS clean_text
        |FROM t LEFT JOIN r ON t.doc_id = r.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    // Priority sampling: u = (first 8 md5 nibbles of the doc_id string)
    // + 1, priority = w * 2^32 / u — one IEEE division of exact-integer
    // doubles, so selection and output agree bit-for-bit cross-engine.
    "q117_mmr_topk" -> mmrOracleSql(20, 10),
    "q119_unigram_train" -> unigramOracleSql(6, 120, 2, 40, 16),
    "q122_unigram_encode" -> unigramOracleSql(6, 120, 2, 40, 16, encode = true),
    "q120_importance_select" -> importanceOracleSql,
    // Streaming quality gate: the q103 cascade's first-fail verdict per
    // doc, censused per (source, verdict) — the replay is one
    // micro-batch and complete mode emits the final census, so the
    // batch restatement is exact.
    "q124_stream_quality_gate" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens,
        |         CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE) / len(toks) AS stop_ratio,
        |         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
        |  FROM t),
        |q AS (
        |  SELECT *, round(0.4 * ttr + 0.3 * (1.0 - stop_ratio)
        |            + 0.3 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0), 6) AS quality
        |  FROM b),
        |v AS (
        |  SELECT source,
        |         CASE WHEN n_tokens < 16 THEN 'too_short'
        |              WHEN stop_ratio < 0.015 THEN 'low_stopword'
        |              WHEN ttr < 0.32 THEN 'high_repetition'
        |              WHEN quality < 0.62 THEN 'low_quality'
        |              ELSE 'kept' END AS verdict,
        |         n_tokens
        |  FROM q)
        |SELECT source, verdict, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS tokens
        |FROM v GROUP BY source, verdict
        |ORDER BY source, verdict""".stripMargin,
    // Deterministic split assignment: salted hash bucket mod 100,
    // 90/5/5 train/val/test.
    "q123_split_assign" ->
      """WITH b AS (
        |  SELECT doc_id,
        |         CAST(concat('0x', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        |       CASE WHEN bucket < 90 THEN 'train'
        |            WHEN bucket < 95 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,
    // KMV distinct sketch vs exact: the relational restatement of the
    // mergeable k-min aggregate — distinct (source, hash), per-source
    // rank, k-th min, the (k-1)*2^56/h_k estimator (255*2^56 is an
    // 8-significant-bit double, exactly representable), exact when a
    // source holds < k distinct hashes.
    "q121_kmv_distinct" ->
      """WITH t AS (
        |  SELECT source, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT source,
        |         list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                        for i in range(1, len(toks) - 1)]) AS sh
        |  FROM t WHERE len(toks) >= 3),
        |dh AS (
        |  SELECT DISTINCT source,
        |         CAST(concat('0x', substr(md5(sh2), 1, 14)) AS BIGINT) AS h
        |  FROM (SELECT source, unnest(sh) AS sh2 FROM s)),
        |d AS (
        |  SELECT source, h,
        |         row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
        |         count(*) OVER (PARTITION BY source) AS nd
        |  FROM dh),
        |a AS (
        |  SELECT source,
        |         CAST(least(max(nd), 256) AS BIGINT) AS k_held,
        |         max(CASE WHEN rn <= 256 THEN h END) AS kth_min,
        |         CAST(max(nd) AS BIGINT) AS exact_distinct
        |  FROM d GROUP BY source),
        |e AS (
        |  SELECT source, k_held, kth_min,
        |         CASE WHEN k_held < 256 THEN k_held
        |              ELSE CAST(round(CAST(255 AS DOUBLE) * CAST(72057594037927936 AS DOUBLE) /
        |                              CAST(kth_min AS DOUBLE)) AS BIGINT) END
        |           AS est_distinct,
        |         exact_distinct
        |  FROM a)
        |SELECT source, k_held, kth_min, est_distinct, exact_distinct,
        |       abs((est_distinct - exact_distinct) * 1000000) // exact_distinct AS err_ppm
        |FROM e ORDER BY source""".stripMargin,
    // Trigram stupid-backoff under the lang='en'-trained model: each
    // position scores at the deepest order with evidence; tier constants
    // fold into the ppm scale (1e6 / 4e5 / 1.6e5), all integer
    // floor-division like q95.
    "q118_trigram_lm_score" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |tp AS (
        |  SELECT doc_id, lang, unnest(range(1, len(toks) - 1)) AS i, toks
        |  FROM t WHERE len(toks) >= 3),
        |g AS (
        |  SELECT doc_id, lang,
        |         CAST(concat('0x', substr(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 14)) AS BIGINT) AS h123,
        |         CAST(concat('0x', substr(md5(toks[i] || ' ' || toks[i+1]), 1, 14)) AS BIGINT) AS h12,
        |         CAST(concat('0x', substr(md5(toks[i+1] || ' ' || toks[i+2]), 1, 14)) AS BIGINT) AS h23,
        |         CAST(concat('0x', substr(md5(toks[i+1]), 1, 14)) AS BIGINT) AS h2,
        |         CAST(concat('0x', substr(md5(toks[i+2]), 1, 14)) AS BIGINT) AS h3
        |  FROM tp),
        |tcnt AS (SELECT h123, count(*) AS c123 FROM g WHERE lang = 'en' GROUP BY 1),
        |bp AS (
        |  SELECT unnest(range(1, len(toks))) AS i, toks
        |  FROM t WHERE lang = 'en' AND len(toks) >= 2),
        |bcnt AS (
        |  SELECT CAST(concat('0x', substr(md5(toks[i] || ' ' || toks[i+1]), 1, 14)) AS BIGINT) AS h12,
        |         count(*) AS cb
        |  FROM bp GROUP BY 1),
        |up AS (SELECT unnest(toks) AS w FROM t WHERE lang = 'en'),
        |ucnt AS (
        |  SELECT CAST(concat('0x', substr(md5(w), 1, 14)) AS BIGINT) AS h, count(*) AS cu
        |  FROM up GROUP BY 1),
        |nn AS (SELECT count(*) AS n_train FROM up),
        |sc AS (
        |  SELECT doc_id,
        |         CASE WHEN tc.c123 IS NOT NULL THEN 3
        |              WHEN b23.cb IS NOT NULL THEN 2 ELSE 1 END AS tier,
        |         CASE WHEN tc.c123 IS NOT NULL THEN (tc.c123 * 1000000) // b12.cb
        |              WHEN b23.cb IS NOT NULL THEN (b23.cb * 400000) // u2.cu
        |              ELSE (COALESCE(u3.cu, 0) * 160000) // (SELECT n_train FROM nn) END AS p_ppm
        |  FROM g
        |  LEFT JOIN tcnt tc USING (h123)
        |  LEFT JOIN bcnt b12 ON g.h12 = b12.h12
        |  LEFT JOIN bcnt b23 ON g.h23 = b23.h12
        |  LEFT JOIN ucnt u2 ON g.h2 = u2.h
        |  LEFT JOIN ucnt u3 ON g.h3 = u3.h)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
        |       CAST(sum(CASE WHEN tier = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit3,
        |       CAST(sum(CASE WHEN tier = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit2,
        |       CAST(sum(CASE WHEN tier = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit1,
        |       CAST(sum(p_ppm) // count(*) AS BIGINT) AS score_ppm
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q116_weighted_sample" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS weight
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, weight,
        |         CAST(weight AS DOUBLE) * 4294967296.0 /
        |           CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1 AS DOUBLE)
        |           AS pr
        |  FROM t),
        |s AS (SELECT * FROM p ORDER BY pr DESC, doc_id LIMIT 100)
        |SELECT doc_id, weight, round(pr, 6) AS priority
        |FROM s ORDER BY priority DESC, doc_id""".stripMargin,
    "q125_quality_classifier" -> perceptronOracleSql(256, 3),
    // Audio perceptual dedup: the q110 restatement with the codec math
    // swapped — WAV samples are (byte − 128)·256, the re-export scales
    // magnitudes by exactly 7/8 (·224, integral) and clicks sample 1,
    // span energies are exact integer sums, fingerprint bits compare
    // adjacent spans, then the identical band/verify/reach chain.
    "q126_audio_fp_dedup" ->
      """WITH RECURSIVE o AS (
        |  SELECT doc_id, list_transform(string_split(text, ''), x -> ord(x)) AS ords
        |  FROM documents),
        |v AS (
        |  SELECT doc_id, list_transform(ords, b -> abs(b - 128) * 256) AS mag
        |  FROM o
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |         [ CASE WHEN i = 1 THEN 32000
        |                ELSE abs(ords[i] - 128) * 224 END
        |           for i in range(1, len(ords)+1) ]
        |  FROM o),
        |hx AS (
        |  SELECT doc_id, len(mag) AS n,
        |         [ {'f': f,
        |            'e': list_sum(mag[(f*len(mag))//least(64,len(mag)) + 1 : ((f+1)*len(mag))//least(64,len(mag))])}
        |           for f in range(0, least(64, len(mag))) ] AS sp
        |  FROM v),
        |ph AS (
        |  SELECT doc_id,
        |         COALESCE(list_sum([ CASE WHEN sp[f+2].e > sp[f+1].e
        |                                  THEN (1::BIGINT << f) ELSE 0 END
        |                             for f in range(0, len(sp)-1) ]), 0)::BIGINT AS afp
        |  FROM hx),
        |bd AS (
        |  SELECT doc_id, afp,
        |         unnest([ concat_ws('|', CAST(b AS VARCHAR),
        |                    CAST((afp >> (16*b)) & 65535 AS VARCHAR)) for b in range(0,4) ]) AS bk
        |  FROM ph),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         a.afp AS ha, b.afp AS hb
        |  FROM bd a JOIN bd b ON a.bk = b.bk AND a.doc_id < b.doc_id),
        |pairs AS (SELECT doc_a, doc_b FROM cand WHERE bit_count(xor(ha, hb)) <= 3),
        |e AS (SELECT doc_a AS id, doc_b AS nbr FROM pairs
        |      UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT id AS u, id AS v FROM (SELECT DISTINCT id FROM e)
        |  UNION
        |  SELECT reach.u, e.nbr FROM reach JOIN e ON reach.v = e.id),
        |lab AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u)
        |SELECT doc_id, cluster_id,
        |       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
        |       doc_id = cluster_id AS is_canonical
        |FROM lab ORDER BY cluster_id, doc_id""".stripMargin,
    // Video keyframe dedup: the q110 dHash machinery applied per frame
    // (text bytes cut into ≤ 8 integer spans, each a 1×len P6 frame),
    // the transcode twin relights every frame (stamp + lift = the q110
    // reexport luma) and drops the trailing frame; videos match when
    // ≥ half the smaller one's frames find a Hamming ≤ 3 partner.
    "q129_video_phash_dedup" ->
      """WITH RECURSIVE o AS (
        |  SELECT doc_id, list_transform(string_split(text, ''), x -> ord(x)) AS ords
        |  FROM documents),
        |base AS (
        |  SELECT doc_id, ords, len(ords) AS n,
        |         greatest(1, least(8, len(ords) // 61)) AS nf FROM o),
        |fr AS (
        |  SELECT doc_id, nf, f,
        |         ords[(f*n)//nf + 1 : ((f+1)*n)//nf] AS chunk
        |  FROM (SELECT doc_id, ords, n, nf, unnest(range(0, nf)) AS f FROM base)),
        |vf AS (
        |  SELECT doc_id, f,
        |         list_transform(chunk, b -> 299*b + 587*(255-b) + 114*((7*b)%256)) AS lum
        |  FROM fr
        |  UNION ALL
        |  SELECT doc_id + 1000000, f,
        |         [ CASE WHEN i = 1 THEN 255000
        |                ELSE 299*least(255, chunk[i]+8) + 587*(255-chunk[i]) + 114*((7*chunk[i])%256) END
        |           for i in range(1, len(chunk)+1) ]
        |  FROM fr WHERE f < nf - 1 OR nf = 1),
        |hx AS (
        |  SELECT doc_id, f,
        |         [ {'s': s,
        |            'ss': list_sum(lum[(s*len(lum))//least(61,len(lum)) + 1 : ((s+1)*len(lum))//least(61,len(lum))]),
        |            'sl': ((s+1)*len(lum))//least(61,len(lum)) - (s*len(lum))//least(61,len(lum))}
        |           for s in range(0, least(61, len(lum))) ] AS sp
        |  FROM vf),
        |ph AS (
        |  SELECT doc_id, f,
        |         COALESCE(list_sum([ CASE WHEN sp[s+1].ss * sp[s+2].sl > sp[s+2].ss * sp[s+1].sl
        |                                  THEN (1::BIGINT << s) ELSE 0 END
        |                             for s in range(0, len(sp)-1) ]), 0)::BIGINT AS fhash
        |  FROM hx),
        |sz AS (SELECT doc_id, count(*) AS nfr FROM ph GROUP BY doc_id),
        |bd AS (
        |  SELECT doc_id, fhash,
        |         unnest([ concat_ws('|', CAST(b AS VARCHAR),
        |                    CAST((fhash >> (15*b)) & 32767 AS VARCHAR)) for b in range(0,4) ]) AS bk
        |  FROM ph),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bd a JOIN bd b ON a.bk = b.bk AND a.doc_id < b.doc_id),
        |mt AS (
        |  SELECT c.doc_a, c.doc_b, count(DISTINCT fa.f) AS matched
        |  FROM cand c
        |  JOIN ph fa ON fa.doc_id = c.doc_a
        |  JOIN ph fb ON fb.doc_id = c.doc_b
        |  WHERE bit_count(xor(fa.fhash, fb.fhash)) <= 3
        |  GROUP BY c.doc_a, c.doc_b),
        |pairs AS (
        |  SELECT m.doc_a, m.doc_b
        |  FROM mt m JOIN sz sa ON m.doc_a = sa.doc_id
        |            JOIN sz sb ON m.doc_b = sb.doc_id
        |  WHERE m.matched * 2 >= least(sa.nfr, sb.nfr)),
        |e AS (SELECT doc_a AS id, doc_b AS nbr FROM pairs
        |      UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT id AS u, id AS v FROM (SELECT DISTINCT id FROM e)
        |  UNION
        |  SELECT reach.u, e.nbr FROM reach JOIN e ON reach.v = e.id),
        |lab AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u)
        |SELECT doc_id, cluster_id,
        |       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
        |       doc_id = cluster_id AS is_canonical
        |FROM lab ORDER BY cluster_id, doc_id""".stripMargin,
    // The stream census restates the q125 weight chain grouped by
    // (source, pred): all-integer scoring makes the stream result
    // micro-batch-split invariant, so equality is exact.
    "q130_stream_model_score" -> perceptronCensusOracleSql(256, 3),
    // Both retrieval arms (q27 exact / q28 multi-probe LSH) at k = 10
    // over one shared bucketed corpus; recall@10 and the reciprocal
    // rank of the true nearest neighbor, in exact ppm integers.
    "q131_ann_recall_eval" ->
      """WITH wb AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) for i in range(1, 65)])) AS nrm,
        |         CAST(list_sum(
        |           [CASE WHEN list_sum([(CAST(((p * 131071 + i * 524287) * 2654435761) % 1000003 AS DOUBLE) / 1000003.0 - 0.5)
        |                                * CAST(embedding[i] AS DOUBLE) for i in range(1, 65)]) > 0
        |                 THEN CAST(round(pow(2, p)) AS BIGINT) ELSE CAST(0 AS BIGINT) END
        |            for p in range(0, 8)]) AS BIGINT) AS bucket
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id AS q_id, embedding AS qv, nrm AS qnrm, bucket AS qbucket
        |  FROM wb WHERE vec_id < 5),
        |ex AS (
        |  SELECT q_id, vec_id, ex_rank FROM (
        |    SELECT q.q_id, e.vec_id,
        |           row_number() OVER (PARTITION BY q.q_id ORDER BY
        |             round(list_sum([CAST(q.qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) for i in range(1, 65)])
        |               / (q.qnrm * e.nrm), 6) DESC, e.vec_id) AS ex_rank
        |    FROM wb e CROSS JOIN q WHERE e.vec_id <> q.q_id)
        |  WHERE ex_rank <= 10),
        |an AS (
        |  SELECT q_id, vec_id, an_rank FROM (
        |    SELECT q.q_id, e.vec_id,
        |           row_number() OVER (PARTITION BY q.q_id ORDER BY
        |             round(list_sum([CAST(q.qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) for i in range(1, 65)])
        |               / (q.qnrm * e.nrm), 6) DESC, e.vec_id) AS an_rank
        |    FROM wb e JOIN q ON bit_count(xor(e.bucket, q.qbucket)) <= 2
        |    WHERE e.vec_id <> q.q_id)
        |  WHERE an_rank <= 10),
        |j AS (
        |  SELECT ex.q_id,
        |         CAST(sum(CASE WHEN an.an_rank IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        |         min(CASE WHEN ex.ex_rank = 1 THEN an.an_rank END) AS t1
        |  FROM ex LEFT JOIN an ON ex.q_id = an.q_id AND ex.vec_id = an.vec_id
        |  GROUP BY ex.q_id)
        |SELECT q_id, n_hits, n_hits * 100000 AS recall_ppm,
        |       CAST(COALESCE(t1, 0) AS BIGINT) AS top1_rank,
        |       CAST(COALESCE(1000000 // t1, 0) AS BIGINT) AS rr_ppm
        |FROM j ORDER BY q_id""".stripMargin,
    // q46's seed-centroid assignment + a per-cluster quota rank.
    "q132_cluster_sample" ->
      """WITH emb AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) for i in range(1, 65)])) AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cid, embedding AS cv, nrm AS cnrm FROM emb WHERE vec_id < 16),
        |scored AS (
        |  SELECT e.vec_id, c.cid,
        |         list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE) for i in range(1, 65)])
        |           / (e.nrm * c.cnrm) AS score
        |  FROM emb e CROSS JOIN c),
        |assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
        |    FROM scored) WHERE rn = 1),
        |r AS (
        |  SELECT a.cid, d.doc_id, d.lang, d.n_chars,
        |         row_number() OVER (PARTITION BY a.cid ORDER BY d.n_chars DESC, d.doc_id) AS rank
        |  FROM documents d JOIN assign a ON d.doc_id = a.vec_id)
        |SELECT cid, doc_id, lang, n_chars, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 8 ORDER BY cid, rank""".stripMargin,
    // Pairwise shared distinct 3-shingles + Jaccard between sources.
    "q133_source_overlap" ->
      """WITH t AS (
        |  SELECT source, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT DISTINCT source, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS sh
        |  FROM (SELECT source, toks, unnest(range(1, len(toks) - 1)) AS i FROM t)),
        |n AS (SELECT source, CAST(count(*) AS BIGINT) AS nsh FROM g GROUP BY source),
        |p AS (
        |  SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS shared
        |  FROM g a JOIN g b USING (sh) WHERE a.source < b.source
        |  GROUP BY a.source, b.source)
        |SELECT p.src_a, p.src_b, p.shared, na.nsh AS nsh_a, nb.nsh AS nsh_b,
        |       CAST(p.shared * 1000000 // (na.nsh + nb.nsh - p.shared) AS BIGINT) AS jaccard_ppm
        |FROM p JOIN n na ON na.source = p.src_a JOIN n nb ON nb.source = p.src_b
        |ORDER BY p.src_a, p.src_b""".stripMargin,
    // Damped PageRank (d = 0.85, 3 unrolled rounds, ppb BIGINT) over the
    // supplier co-supply graph, dangling mass redistributed uniformly —
    // the q119/q125 unrolled-iteration recipe applied to link analysis.
    "q134_pagerank_suppliers" ->
      pagerankOracleSql(3, "SELECT node FROM nodes", "rank_ppb"),
    // TrustRank: same rounds, teleport/dangling mass to the 4-seed
    // whitelist only (Gyongyi et al., VLDB 2004).
    "q139_trustrank_suppliers" ->
      pagerankOracleSql(3, "SELECT node FROM nodes ORDER BY node LIMIT 4",
        "trust_ppb"),
    // Exact-integer Lloyd's k-means (ppm codes, squared-Euclidean argmin,
    // sign-split truncating integer means), 2 unrolled rounds — the
    // trainer behind the IVF ladder's centroids, oracle-certified.
    "q135_kmeans_train" -> kmeansOracleSql(8, 2),
    // Count-min sketch (d=4, w=256) point-frequency estimates for the
    // top-20 tokens, restated relationally: per-(row, bucket) cell
    // counts from the same md5 bucket arithmetic, min over rows.
    "q136_cms_freq" -> cmsOracleSql(4, 256),
    // SCD2 build: change-collapse (lag) then validity intervals
    // (lead/row_number) over the change set, (ts, event_id) total order.
    "q137_scd2_build" -> scd2RebuildOracle,
    // SymSpell deletion-neighborhood candidates + levenshtein<=1 verify
    // over the customer-name entity dimension.
    "q138_edit_distance_join" ->
      """WITH v AS MATERIALIZED (
        |  SELECT DISTINCT c_custkey AS k, c_name AS w,
        |         CASE WHEN i = 0 THEN c_name
        |              ELSE substr(c_name, 1, i - 1) || substr(c_name, i + 1)
        |         END AS v
        |  FROM (SELECT c_custkey, c_name,
        |               unnest(range(0, len(c_name) + 1)) AS i
        |        FROM customer)),
        |c AS (
        |  SELECT DISTINCT a.k AS cust_a, b.k AS cust_b,
        |         a.w AS name_a, b.w AS name_b
        |  FROM v a JOIN v b USING (v) WHERE a.k < b.k)
        |SELECT cust_a, cust_b, name_a, name_b FROM c
        |WHERE levenshtein(name_a, name_b) <= 1
        |ORDER BY cust_a, cust_b""".stripMargin,
    // Entity resolution: blocked (band-keyed) deletion-neighborhood
    // match + recursive-CTE transitive closure (q79's independent
    // algorithm against the engine's path halving).
    "q140_entity_resolution" ->
      """WITH RECURSIVE c0 AS (
        |  SELECT c_custkey AS k, c_name AS w,
        |         CAST(floor(c_acctbal / 100.0) AS BIGINT) AS band
        |  FROM customer),
        |v AS MATERIALIZED (
        |  SELECT DISTINCT k, w,
        |         CAST(band AS VARCHAR) || '|' ||
        |         CASE WHEN i = 0 THEN w
        |              ELSE substr(w, 1, i - 1) || substr(w, i + 1) END AS v
        |  FROM (SELECT k, w, band, unnest(range(0, len(w) + 1)) AS i
        |        FROM c0)),
        |p AS (
        |  SELECT DISTINCT a.k AS doc_a, b.k AS doc_b, a.w AS w_a, b.w AS w_b
        |  FROM v a JOIN v b USING (v) WHERE a.k < b.k),
        |pairs AS (SELECT doc_a, doc_b FROM p WHERE levenshtein(w_a, w_b) <= 1),
        |e AS (SELECT doc_a AS id, doc_b AS nbr FROM pairs
        |      UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT id AS u, id AS rv FROM (SELECT DISTINCT id FROM e)
        |  UNION
        |  SELECT reach.u, e.nbr FROM reach JOIN e ON reach.rv = e.id),
        |lab AS (SELECT u AS custkey, min(rv) AS cluster_id
        |        FROM reach GROUP BY u)
        |SELECT custkey, cluster_id,
        |       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
        |       custkey = cluster_id AS is_canonical
        |FROM lab ORDER BY cluster_id, custkey""".stripMargin,
    // Content-defined chunking: rolling 16-char window, boundary where
    // the window hash lands in bucket 0 of 32 (or at doc end), chunk
    // spans via lag over boundary positions, per-source dedup ratio.
    "q141_cdc_chunk_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, source, lower(trim(text)) AS txt,
        |         CAST(len(lower(trim(text))) AS BIGINT) AS n
        |  FROM documents
        |  WHERE len(lower(trim(text))) >= 1),
        |b AS MATERIALIZED (
        |  SELECT doc_id, source, txt, p FROM (
        |    SELECT doc_id, source, txt, n,
        |           unnest(range(least(16, n), n + 1)) AS p
        |    FROM d)
        |  WHERE CAST(concat('0x', substr(md5(substr(txt, CAST(p AS INTEGER) - 15, 16)), 1, 14)) AS BIGINT) % 32 = 0
        |     OR p = n),
        |ch AS (
        |  SELECT source,
        |         substr(txt,
        |                CAST(COALESCE(lag(p) OVER (PARTITION BY doc_id ORDER BY p), 0) + 1 AS INTEGER),
        |                CAST(p - COALESCE(lag(p) OVER (PARTITION BY doc_id ORDER BY p), 0) AS INTEGER)) AS chunk
        |  FROM b),
        |pc AS (
        |  SELECT source,
        |         CAST(concat('0x', substr(md5(chunk), 1, 14)) AS BIGINT) AS h,
        |         CAST(len(chunk) AS BIGINT) AS l
        |  FROM ch),
        |tot AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
        |         CAST(sum(l) AS BIGINT) AS total_bytes
        |  FROM pc GROUP BY source),
        |u AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS uniq_chunks,
        |         CAST(sum(l) AS BIGINT) AS uniq_bytes
        |  FROM (SELECT source, h, min(l) AS l FROM pc GROUP BY source, h)
        |  GROUP BY source)
        |SELECT t.source, t.n_chunks, t.total_bytes, u.uniq_chunks,
        |       u.uniq_bytes,
        |       CAST(u.uniq_bytes * 1000000 // t.total_bytes AS BIGINT) AS stored_ppm
        |FROM tot t JOIN u USING (source) ORDER BY t.source""".stripMargin,
    // Stream-static point-in-time enrichment: q137's SCD2 chain, then
    // every event joined to its containing validity interval, censused.
    "q142_stream_scd2_enrich" ->
      """WITH e0 AS (
        |  SELECT user_id, ts, event_id, event_type AS state,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev
        |  FROM events WHERE event_type IN ('signup', 'purchase')),
        |ch AS (
        |  SELECT user_id, ts, event_id, state FROM e0
        |  WHERE prev IS NULL OR prev <> state),
        |v AS (
        |  SELECT user_id, state, ts AS valid_from,
        |         COALESCE(lead(ts) OVER (PARTITION BY user_id
        |                                 ORDER BY ts, event_id),
        |                  TIMESTAMP '2200-01-01 00:00:00') AS valid_to
        |  FROM ch)
        |SELECT COALESCE(v.state, 'none') AS tier, e.event_type,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM events e LEFT JOIN v ON e.user_id = v.user_id
        |  AND e.ts >= v.valid_from AND e.ts < v.valid_to
        |GROUP BY COALESCE(v.state, 'none'), e.event_type
        |ORDER BY tier, e.event_type""".stripMargin,
    // Harmonic-class sequence packing census: over-cap docs shed full
    // windows (class 0) and re-enter with their remainder; class
    // k = cap div len packs k items per window, windows = ceil(n/k).
    "q143_sequence_pack" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n
        |  FROM documents),
        |items AS (
        |  SELECT doc_id, CASE WHEN n <= 256 THEN n ELSE n % 256 END AS len
        |  FROM t WHERE (CASE WHEN n <= 256 THEN n ELSE n % 256 END) >= 1),
        |packed AS (
        |  SELECT 256 // len AS k, CAST(count(*) AS BIGINT) AS n_items,
        |         CAST((count(*) + (256 // len) - 1) // (256 // len) AS BIGINT) AS n_windows,
        |         CAST(sum(len) AS BIGINT) AS item_tokens
        |  FROM items GROUP BY 256 // len),
        |fulls AS (
        |  SELECT CAST(0 AS BIGINT) AS k, CAST(sum(n // 256) AS BIGINT) AS n_items,
        |         CAST(sum(n // 256) AS BIGINT) AS n_windows,
        |         CAST(sum(n // 256) * 256 AS BIGINT) AS item_tokens
        |  FROM t WHERE n > 256 HAVING sum(n // 256) > 0),
        |u AS (SELECT * FROM packed UNION ALL SELECT * FROM fulls)
        |SELECT k, n_items, n_windows, item_tokens,
        |       CAST(n_windows * 256 AS BIGINT) AS capacity_tokens,
        |       CAST((n_windows * 256 - item_tokens) * 1000000 // (n_windows * 256) AS BIGINT) AS padding_ppm
        |FROM u ORDER BY k""".stripMargin,
    // Host gate: q125's perceptron chain aggregated per source + classic
    // PageRank over the q133 overlap graph; verdict = quality above the
    // corpus mean AND authority at most the uniform share.
    "q144_host_curation_gate" -> hostGateOracleSql,
    // Incremental SCD2 ≡ the full rebuild (the q106 equality trick):
    // the oracle is q137's rebuild SQL verbatim.
    "q145_scd2_incremental" -> scd2RebuildOracle,
    // TrustRank run to the L1 < 10^6 ppb fixed point (cap 10): all ten
    // rounds + per-round deltas, final ranks from the first round whose
    // delta clears epsilon — the identical integer stopping rule.
    "q146_trustrank_converged" -> trustrankConvergedOracleSql(
      epsPpb = 1000000L, cap = 10),
    // Margin-based bitext mining: q28's restated LSH buckets generate
    // the banded A(even)×B(odd) candidates (Hamming ≤ 1 probes); the
    // cosine rounds once to micro-unit BIGINTs and every neighborhood
    // sum / margin ratio after that is exact nonnegative integer
    // arithmetic — both engines rank, sum, and threshold identically.
    "q147_bitext_margin" ->
      """WITH wb AS (
        |  SELECT vec_id, embedding,
        |         CAST(list_sum(
        |           [CASE WHEN list_sum([(CAST(((p * 131071 + i * 524287) * 2654435761) % 1000003 AS DOUBLE) / 1000003.0 - 0.5)
        |                                * CAST(embedding[i] AS DOUBLE) for i in range(1, 65)]) > 0
        |                 THEN CAST(round(pow(2, p)) AS BIGINT) ELSE CAST(0 AS BIGINT) END
        |            for p in range(0, 8)]) AS BIGINT) AS bucket
        |  FROM embeddings),
        |cand AS (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |         CAST(round(
        |           list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) for i in range(1, 65)]) /
        |           (sqrt(list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE) for i in range(1, 65)])) *
        |            sqrt(list_sum([CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) for i in range(1, 65)]))) * 1000000) AS BIGINT) AS cos_u
        |  FROM wb a JOIN wb b ON bit_count(xor(a.bucket, b.bucket)) <= 1
        |  WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 1),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY a_id ORDER BY cos_u DESC, b_id) AS rank_a,
        |            row_number() OVER (PARTITION BY b_id ORDER BY cos_u DESC, a_id) AS rank_b
        |  FROM cand WHERE cos_u > 0),
        |s AS (
        |  SELECT *, sum(CASE WHEN rank_a <= 4 THEN cos_u ELSE 0 END) OVER (PARTITION BY a_id) AS sum_a,
        |            sum(CASE WHEN rank_b <= 4 THEN cos_u ELSE 0 END) OVER (PARTITION BY b_id) AS sum_b
        |  FROM r)
        |SELECT a_id, b_id, cos_u,
        |       CAST(cos_u * 8 * 1000000 // (sum_a + sum_b) AS BIGINT) AS margin_ppm
        |FROM s
        |WHERE rank_a = 1 AND rank_b = 1
        |  AND cos_u * 8 * 1000000 // (sum_a + sum_b) >= 1050000
        |ORDER BY a_id""".stripMargin,
    // JL sign projection: the deterministic ±1 matrix is the q28
    // hyperplane hash thresholded at its integer midpoint; projections
    // fold left in one written order, quantize once to micro-unit
    // BIGINTs, and both rankings (projected integer dots, exact q27
    // cosines) restate with the same window tie-breaks.
    "q148_jl_projection" ->
      """WITH pj AS (
        |  SELECT vec_id, embedding,
        |         [CAST(round(list_sum(
        |            [CASE WHEN ((p * 131071 + i * 524287) * 2654435761) % 1000003 * 2 > 1000003
        |                  THEN CAST(embedding[i] AS DOUBLE) ELSE -CAST(embedding[i] AS DOUBLE) END
        |             for i in range(1, 65)]) * 1000000) AS BIGINT)
        |          for p in range(0, 16)] AS pu
        |  FROM embeddings),
        |base AS (
        |  SELECT vec_id, embedding, pu,
        |         sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) for i in range(1, 65)])) AS nrm,
        |         list_sum([pu[j] * pu[j] for j in range(1, 17)]) AS pn2
        |  FROM pj),
        |q AS (
        |  SELECT vec_id AS q_id, embedding AS qv, pu AS qpu, nrm AS qnrm, pn2 AS qpn2
        |  FROM base WHERE vec_id < 5),
        |pairs AS (
        |  SELECT q.q_id, e.vec_id,
        |         round(CAST(list_sum([qpu[j] * e.pu[j] for j in range(1, 17)]) AS DOUBLE) /
        |               (sqrt(CAST(qpn2 AS DOUBLE)) * sqrt(CAST(e.pn2 AS DOUBLE))), 6) AS cos_p,
        |         round(list_sum([CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) for i in range(1, 65)]) /
        |               (qnrm * e.nrm), 6) AS cos_x
        |  FROM base e CROSS JOIN q WHERE e.vec_id <> q.q_id),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_p DESC, vec_id) AS rank_proj,
        |            row_number() OVER (PARTITION BY q_id ORDER BY cos_x DESC, vec_id) AS rank_exact
        |  FROM pairs)
        |SELECT q_id, vec_id, CAST(rank_proj AS BIGINT) AS rank_proj, cos_p,
        |       CAST(CASE WHEN rank_exact <= 10 THEN 1 ELSE 0 END AS BIGINT) AS in_exact
        |FROM rk WHERE rank_proj <= 10 ORDER BY q_id, rank_proj""".stripMargin,
    // Per-source n-gram diversity: exact unigram/bigram token and type
    // counts, integer-ppm ratios.
    "q149_diversity_audit" ->
      """WITH t AS (
        |  SELECT doc_id, source, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |uni AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS tokens,
        |         CAST(count(DISTINCT g) AS BIGINT) AS types
        |  FROM (SELECT source, unnest(toks) AS g FROM t) GROUP BY source),
        |bi AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS bigram_tokens,
        |         CAST(count(DISTINCT g) AS BIGINT) AS bigram_types
        |  FROM (SELECT source, unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS g
        |        FROM t) GROUP BY source),
        |d AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM t GROUP BY source)
        |SELECT d.source, n_docs, tokens, types, bigram_tokens, bigram_types,
        |       CAST(types * 1000000 // tokens AS BIGINT) AS ttr_ppm,
        |       CAST((bigram_tokens - bigram_types) * 1000000 // bigram_tokens AS BIGINT) AS rep2_ppm
        |FROM d JOIN uni ON d.source = uni.source JOIN bi ON d.source = bi.source
        |ORDER BY d.source""".stripMargin,
    // Seeded shard export census: the same 14-nibble md5 integer both
    // engines derive; min_by/max_by restate the Spark struct min/max
    // (hv is unique, so the tie-break never fires).
    "q150_shard_export" -> shardExportOracle,
    // Retention cohort triangle: distinct (user, ISO-week) first, then
    // user-keyed cohort min and the (cohort, week) counts — Monday
    // date_trunc('week') boundaries in both engines.
    "q151_retention_cohorts" ->
      """WITH w AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events),
        |c AS (SELECT user_id, min(week) AS cohort FROM w GROUP BY user_id),
        |s AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_users FROM c GROUP BY cohort),
        |t AS (
        |  SELECT c.cohort, w.week, CAST(count(*) AS BIGINT) AS active_users
        |  FROM w JOIN c ON w.user_id = c.user_id GROUP BY c.cohort, w.week)
        |SELECT strftime(t.cohort, '%Y-%m-%d') AS cohort_week,
        |       strftime(t.week, '%Y-%m-%d') AS activity_week,
        |       active_users, cohort_users,
        |       CAST(active_users * 1000000 // cohort_users AS BIGINT) AS retention_ppm
        |FROM t JOIN s ON t.cohort = s.cohort
        |ORDER BY cohort_week, activity_week""".stripMargin,
    // MAD outlier gate: both medians are the LOWER median — the row at
    // rank (n+1)//2 under the (value, doc_id) total order — so the
    // statistic is a concrete row both engines agree on.
    "q152_mad_outlier_gate" ->
      """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
        |c AS (SELECT source, CAST(count(*) AS BIGINT) AS cnt FROM d GROUP BY source),
        |r1 AS (
        |  SELECT d.*, c.cnt,
        |         row_number() OVER (PARTITION BY d.source ORDER BY n_chars, doc_id) AS rnk
        |  FROM d JOIN c ON d.source = c.source),
        |med AS (SELECT source, n_chars AS med_chars FROM r1 WHERE rnk = (cnt + 1) // 2),
        |dv AS (
        |  SELECT d.doc_id, d.source, d.n_chars, med.med_chars,
        |         abs(d.n_chars - med.med_chars) AS dev
        |  FROM d JOIN med ON d.source = med.source),
        |r2 AS (
        |  SELECT dv.*, c.cnt,
        |         row_number() OVER (PARTITION BY dv.source ORDER BY dev, doc_id) AS rnk
        |  FROM dv JOIN c ON dv.source = c.source),
        |mad AS (SELECT source, dev AS mad_chars FROM r2 WHERE rnk = (cnt + 1) // 2)
        |SELECT dv.source, CAST(count(*) AS BIGINT) AS n_docs,
        |       min(dv.med_chars) AS med_chars, min(mad.mad_chars) AS mad_chars,
        |       CAST(sum(CASE WHEN dv.dev > 3 * mad.mad_chars THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |       CAST(CAST(sum(CASE WHEN dv.dev > 3 * mad.mad_chars THEN 1 ELSE 0 END) AS BIGINT) * 1000000 // count(*) AS BIGINT) AS outlier_ppm
        |FROM dv JOIN mad ON dv.source = mad.source
        |GROUP BY dv.source ORDER BY dv.source""".stripMargin,
    // kNN graph: the q28 bucket arithmetic with every vector probing —
    // candidates restated as the Hamming<=1 bucket join, micro-unit
    // integer cosines, (cos_u desc, nbr_id) rank ties.
    "q153_knn_graph" -> knnGraphOracle,
    // Incremental kNN maintenance: untouched vectors keep their stored
    // edges and touched/delta vectors re-rank by the rebuild's own
    // rule, so the fold provably equals the rebuild — q153's oracle
    // VERBATIM (the q145/q154 registered-equality trick;
    // KnnIncrementalSpec pins the frame equality).
    "q157_knn_incremental" -> knnGraphOracle,
    // Label-noise audit: the kNN CTE + two label joins; flagged when
    // agreeing neighbors are a strict minority.
    "q158_label_noise_audit" ->
      s"""WITH $knnRankedCte,
        |knn AS (SELECT vec_id, nbr_id FROM rk WHERE rank <= 3),
        |v AS (
        |  SELECT k.vec_id, e1.label,
        |         CAST(count(*) AS BIGINT) AS degree,
        |         CAST(sum(CASE WHEN e2.label = e1.label THEN 1 ELSE 0 END) AS BIGINT) AS agree
        |  FROM knn k
        |  JOIN embeddings e1 ON k.vec_id = e1.vec_id
        |  JOIN embeddings e2 ON k.nbr_id = e2.vec_id
        |  GROUP BY k.vec_id, e1.label)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        |       CAST(sum(CASE WHEN agree * 2 < degree THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
        |       CAST(sum(CASE WHEN agree * 2 < degree THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS flag_ppm
        |FROM v GROUP BY label ORDER BY label""".stripMargin,
    // Corpus snapshot diff: both snapshots reduce to (doc_id, md5,
    // source) manifests, full-outer join on doc_id, verdict census.
    // NOTE the snapshot-B construction references the PRE-shift doc_id
    // for the edit predicate, exactly as the Spark side does (the %5
    // test runs on the original id, the %7 shift happens in the same
    // projection).
    "q159_corpus_diff" ->
      """WITH a AS (
        |  SELECT doc_id, source, md5(text) AS h FROM documents),
        |b AS (
        |  SELECT CASE WHEN doc_id % 10 = 7 THEN doc_id + 1000000000 ELSE doc_id END AS doc_id,
        |         source,
        |         md5(CASE WHEN doc_id % 10 = 5 THEN text || ' rev2' ELSE text END) AS h
        |  FROM documents WHERE doc_id % 10 <> 3),
        |j AS (
        |  SELECT COALESCE(a.source, b.source) AS source,
        |         CASE WHEN a.h IS NULL THEN 'added'
        |              WHEN b.h IS NULL THEN 'deleted'
        |              WHEN a.h = b.h THEN 'unchanged'
        |              ELSE 'changed' END AS verdict
        |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
        |SELECT source,
        |       CAST(sum(CASE WHEN verdict = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
        |       CAST(sum(CASE WHEN verdict = 'deleted' THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
        |       CAST(sum(CASE WHEN verdict = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        |       CAST(sum(CASE WHEN verdict = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
        |FROM j GROUP BY source ORDER BY source""".stripMargin,
    // End-to-end curation funnel: every stage restated — q20's keep-min
    // dedup, q152's lower-median/MAD gate at 3 MAD, q51's shingle
    // decontamination vs the src19 held-out split, q143's harmonic
    // window count, q150's shard count.
    "q160_curation_funnel" ->
      funnelOracleSql("SELECT doc_id, source, n_chars, text FROM documents"),
    // Incremental curation funnel: q160's CTE chain VERBATIM over
    // snapshot B (the q159/q165 delta derivation) — a hash match
    // certifies the delta-structured fold reproduces the full funnel.
    "q171_incr_curation_funnel" -> funnelOracleSql(
      """SELECT CASE WHEN doc_id % 10 = 7 THEN doc_id + 1000000000 ELSE doc_id END AS doc_id,
        |         source,
        |         CASE WHEN doc_id % 10 = 5 THEN n_chars + 5 ELSE n_chars END AS n_chars,
        |         CASE WHEN doc_id % 10 = 5 THEN text || ' rev2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 10 <> 3""".stripMargin),
    // Split-leakage audit: q25's verified pairs + q123's split rule,
    // censused per unordered split pair.
    "q161_split_leakage_audit" ->
      s"""WITH $minhashPairsCte,
        |sp AS (
        |  SELECT doc_id,
        |         CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split
        |  FROM (SELECT doc_id,
        |               CAST(concat('0x', substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 100 AS b
        |        FROM documents)),
        |j AS (
        |  SELECT least(a.split, b.split) AS split_a,
        |         greatest(a.split, b.split) AS split_b
        |  FROM vp JOIN sp a ON vp.doc_a = a.doc_id
        |          JOIN sp b ON vp.doc_b = b.doc_id)
        |SELECT split_a, split_b, CAST(count(*) AS BIGINT) AS n_pairs,
        |       CAST(CASE WHEN split_a <> split_b THEN 1 ELSE 0 END AS BIGINT) AS is_leak
        |FROM j GROUP BY split_a, split_b ORDER BY split_a, split_b""".stripMargin,
    // Bottom-k quantile sketch: the retained sample is a DETERMINISTIC
    // function of the data (k smallest distinct (hash, value) pairs), so
    // DuckDB restates it relationally — DISTINCT pairs, rank by (hv,
    // value), keep 64, rank-pick the value-sorted sample at ceil(m·q) —
    // next to the exact per-source quartiles, and the whole row
    // (estimates + exacts + err_ppm) hash-matches.
    "q164_quantile_sketch" ->
      """WITH h AS (
        |  SELECT source, n_chars, doc_id,
        |         CAST(concat('0x', substr(md5(concat('btk:', CAST(doc_id AS VARCHAR))), 1, 14)) AS BIGINT) AS hv
        |  FROM documents),
        |dp AS (SELECT DISTINCT source, hv, n_chars FROM h),
        |samp AS (
        |  SELECT source, n_chars,
        |         row_number() OVER (PARTITION BY source ORDER BY hv, n_chars) AS rh
        |  FROM dp),
        |sk AS (SELECT source, n_chars FROM samp WHERE rh <= 64),
        |m AS (SELECT source, CAST(count(*) AS BIGINT) AS m FROM sk GROUP BY source),
        |sv AS (
        |  SELECT source, n_chars,
        |         row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rv
        |  FROM sk),
        |est AS (
        |  SELECT sv.source,
        |         max(CASE WHEN rv = (m.m * 25 + 99) // 100 THEN n_chars END) AS p25_est,
        |         max(CASE WHEN rv = (m.m * 50 + 99) // 100 THEN n_chars END) AS p50_est,
        |         max(CASE WHEN rv = (m.m * 75 + 99) // 100 THEN n_chars END) AS p75_est
        |  FROM sv JOIN m ON sv.source = m.source GROUP BY sv.source),
        |ex0 AS (
        |  SELECT source, n_chars,
        |         row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS r,
        |         count(*) OVER (PARTITION BY source) AS cnt
        |  FROM documents),
        |ex AS (
        |  SELECT source,
        |         max(CASE WHEN r = (cnt * 25 + 99) // 100 THEN n_chars END) AS p25_exact,
        |         max(CASE WHEN r = (cnt * 50 + 99) // 100 THEN n_chars END) AS p50_exact,
        |         max(CASE WHEN r = (cnt * 75 + 99) // 100 THEN n_chars END) AS p75_exact
        |  FROM ex0 GROUP BY source),
        |nd AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source)
        |SELECT est.source, nd.n_docs, m.m,
        |       est.p25_est, est.p50_est, est.p75_est,
        |       ex.p25_exact, ex.p50_exact, ex.p75_exact,
        |       CAST(abs(est.p50_est - ex.p50_exact) * 1000000 // ex.p50_exact AS BIGINT) AS err_ppm
        |FROM est JOIN m ON est.source = m.source
        |JOIN ex ON est.source = ex.source JOIN nd ON est.source = nd.source
        |ORDER BY est.source""".stripMargin,
    // Sketch rollup: per-shard bottom-64 samples re-aggregated to the
    // global sketch. The oracle computes the DIRECT global bottom-64 —
    // a hash match is the cross-engine mergeability proof (the global
    // bottom-k is contained in the union of per-shard bottom-k's).
    "q167_sketch_rollup" ->
      """WITH h AS (
        |  SELECT n_chars,
        |         CAST(concat('0x', substr(md5(concat('btk:', CAST(doc_id AS VARCHAR))), 1, 14)) AS BIGINT) AS hv,
        |         CAST(concat('0x', substr(md5(concat('seed42:', CAST(doc_id AS VARCHAR))), 1, 14)) AS BIGINT) % 8 AS shard
        |  FROM documents),
        |dp AS (SELECT DISTINCT shard, hv, n_chars FROM h),
        |ranked AS (
        |  SELECT shard, hv, n_chars,
        |         row_number() OVER (PARTITION BY shard ORDER BY hv, n_chars) AS rh
        |  FROM dp),
        |shardsk AS (SELECT CAST(shard AS VARCHAR) AS scope, hv, n_chars FROM ranked WHERE rh <= 64),
        |globalsk AS (
        |  SELECT 'global' AS scope, hv, n_chars FROM (
        |    SELECT hv, n_chars,
        |           row_number() OVER (ORDER BY hv, n_chars) AS rh
        |    FROM (SELECT DISTINCT hv, n_chars FROM h)) WHERE rh <= 64),
        |sk AS (SELECT * FROM shardsk UNION ALL SELECT * FROM globalsk),
        |m AS (SELECT scope, CAST(count(*) AS BIGINT) AS m FROM sk GROUP BY scope),
        |sv AS (
        |  SELECT scope, n_chars,
        |         row_number() OVER (PARTITION BY scope ORDER BY n_chars) AS rv
        |  FROM sk)
        |SELECT sv.scope, m.m,
        |       max(CASE WHEN rv = (m.m * 25 + 99) // 100 THEN n_chars END) AS p25_est,
        |       max(CASE WHEN rv = (m.m * 50 + 99) // 100 THEN n_chars END) AS p50_est,
        |       max(CASE WHEN rv = (m.m * 75 + 99) // 100 THEN n_chars END) AS p75_est
        |FROM sv JOIN m ON sv.scope = m.scope
        |GROUP BY sv.scope, m.m ORDER BY sv.scope""".stripMargin,
    // Incremental shard publishing: q159's snapshot derivation (NOTE the
    // b0 inner query applies every CASE to the PRE-shift doc_id, exactly
    // as the Spark side's single projection does) + q150's seeded shard
    // hash + per-shard verdict census with the republish flag.
    "q165_incr_shard_publish" -> shardPublishOracle,
  ) ++ streamAndEvalOracles


  /** q160/q171's funnel-census SQL chain over an arbitrary snapshot
    * CTE `d` -- q171's oracle is this chain VERBATIM over snapshot B
    * (the registered fold = full-funnel equality). `def`, never a
    * forward `val` (round-16 lesson). */
  private def funnelOracleSql(dCte: String): String =
    raw"""WITH d AS ($dCte),
        |dd AS (
        |  SELECT d.* FROM d JOIN (
        |    SELECT min(doc_id) AS doc_id FROM d GROUP BY md5(lower(trim(text)))
        |  ) k ON d.doc_id = k.doc_id),
        |c AS (SELECT source, CAST(count(*) AS BIGINT) AS cnt FROM dd GROUP BY source),
        |r1 AS (
        |  SELECT dd.*, c.cnt,
        |         row_number() OVER (PARTITION BY dd.source ORDER BY n_chars, doc_id) AS rnk
        |  FROM dd JOIN c ON dd.source = c.source),
        |med AS (SELECT source, n_chars AS med FROM r1 WHERE rnk = (cnt + 1) // 2),
        |dv AS (
        |  SELECT dd.*, abs(dd.n_chars - med.med) AS dev
        |  FROM dd JOIN med ON dd.source = med.source),
        |r2 AS (
        |  SELECT dv.*, c.cnt,
        |         row_number() OVER (PARTITION BY dv.source ORDER BY dev, doc_id) AS rnk
        |  FROM dv JOIN c ON dv.source = c.source),
        |mad AS (SELECT source, dev AS mad FROM r2 WHERE rnk = (cnt + 1) // 2),
        |lg AS (
        |  SELECT dv.doc_id, dv.source, dv.n_chars, dv.text
        |  FROM dv JOIN mad ON dv.source = mad.source WHERE dv.dev <= 3 * mad.mad),
        |tok AS (
        |  SELECT doc_id, source, string_split_regex(lower(trim(text)), '\s+') AS toks FROM lg),
        |sh AS (
        |  SELECT doc_id, source,
        |         unnest(list_distinct([CAST(concat('0x', substr(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 14)) AS BIGINT)
        |                               for i in range(1, len(toks) - 1)])) AS h
        |  FROM tok WHERE len(toks) >= 3),
        |train AS (SELECT DISTINCT h FROM sh WHERE source <> 'src19'),
        |contaminated AS (
        |  SELECT s.doc_id FROM sh s JOIN train t ON s.h = t.h
        |  WHERE s.source = 'src19'
        |  GROUP BY s.doc_id HAVING count(*) >= 10),
        |clean AS (
        |  SELECT lg.* FROM lg WHERE lg.doc_id NOT IN (SELECT doc_id FROM contaminated)),
        |ct AS (
        |  SELECT doc_id,
        |         CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n
        |  FROM clean),
        |items AS (
        |  SELECT doc_id, CASE WHEN n <= 256 THEN n ELSE n % 256 END AS len
        |  FROM ct WHERE (CASE WHEN n <= 256 THEN n ELSE n % 256 END) >= 1),
        |packed AS (
        |  SELECT CAST(COALESCE(sum((cnt2 + k - 1) // k), 0) AS BIGINT) AS wp FROM (
        |    SELECT 256 // len AS k, count(*) AS cnt2 FROM items GROUP BY 256 // len)),
        |fulls AS (SELECT CAST(COALESCE(sum(n // 256), 0) AS BIGINT) AS wf FROM ct WHERE n > 256),
        |shards AS (
        |  SELECT CAST(count(DISTINCT CAST(concat('0x', substr(md5(concat('seed42:', CAST(doc_id AS VARCHAR))), 1, 14)) AS BIGINT) % 64) AS BIGINT) AS ns
        |  FROM clean)
        |SELECT stage, n FROM (
        |  SELECT '0_raw' AS stage, CAST(count(*) AS BIGINT) AS n FROM d
        |  UNION ALL SELECT '1_exact_dedup', CAST(count(*) AS BIGINT) FROM dd
        |  UNION ALL SELECT '2_length_gate', CAST(count(*) AS BIGINT) FROM lg
        |  UNION ALL SELECT '3_decontam', CAST(count(*) AS BIGINT) FROM clean
        |  UNION ALL SELECT '4_pack_windows', CAST(packed.wp + fulls.wf AS BIGINT) FROM packed, fulls
        |  UNION ALL SELECT '5_shards', ns FROM shards)
        |ORDER BY stage""".stripMargin

  /** q165's publish-census SQL — shared VERBATIM by q173 (the stream
    * fold provably drains to the same merged manifest). `def`, never a
    * forward `val` (round-16 lesson). */
  private def shardPublishOracle: String =
      """WITH a AS (
        |  SELECT doc_id, md5(text) AS h, n_chars,
        |         CAST(concat('0x', substr(md5(concat('seed42:', CAST(doc_id AS VARCHAR))), 1, 14)) AS BIGINT) % 64 AS shard
        |  FROM documents),
        |b0 AS (
        |  SELECT CASE WHEN doc_id % 10 = 7 THEN doc_id + 1000000000 ELSE doc_id END AS doc_id,
        |         md5(CASE WHEN doc_id % 10 = 5 THEN text || ' rev2' ELSE text END) AS h,
        |         CASE WHEN doc_id % 10 = 5 THEN n_chars + 5 ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id % 10 <> 3),
        |b AS (
        |  SELECT doc_id, h, n_chars,
        |         CAST(concat('0x', substr(md5(concat('seed42:', CAST(doc_id AS VARCHAR))), 1, 14)) AS BIGINT) % 64 AS shard
        |  FROM b0),
        |j AS (
        |  SELECT COALESCE(a.shard, b.shard) AS shard,
        |         CASE WHEN a.h IS NULL THEN 'added'
        |              WHEN b.h IS NULL THEN 'deleted'
        |              WHEN a.h = b.h THEN 'unchanged'
        |              ELSE 'changed' END AS verdict,
        |         b.n_chars AS nc_b
        |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
        |SELECT shard,
        |       CAST(sum(CASE WHEN verdict = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
        |       CAST(sum(CASE WHEN verdict = 'deleted' THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
        |       CAST(sum(CASE WHEN verdict = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        |       CAST(sum(CASE WHEN verdict <> 'deleted' THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
        |       CAST(COALESCE(sum(nc_b), 0) AS BIGINT) AS n_chars,
        |       CAST(CASE WHEN sum(CASE WHEN verdict <> 'unchanged' THEN 1 ELSE 0 END) > 0 THEN 1 ELSE 0 END AS BIGINT) AS republish
        |FROM j GROUP BY shard ORDER BY shard""".stripMargin

  /** q25's banded-MinHash verified-pair CTE chain (ends in
    * `vp(doc_a, doc_b, jaccard)` at threshold 0.7) — shared by the q25
    * oracle and q161's split-leakage audit. `def`, never a forward
    * `val` (round-16 lesson). */
  private def minhashPairsCte: String =
    """t AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      |  FROM documents),
      |s AS (
      |  SELECT doc_id,
      |         list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |                        for i in range(1, len(toks) - 1)]) AS sh
      |  FROM t WHERE len(toks) >= 3),
      |hs AS (
      |  SELECT doc_id,
      |         list_transform(sh, x -> CAST(concat('0x', substr(md5(x), 1, 14)) AS BIGINT)) AS hv
      |  FROM s),
      |bd AS (
      |  SELECT doc_id,
      |         unnest([concat_ws('|', CAST(b AS VARCHAR),
      |                   CAST(list_min(list_transform(hv, h -> (h * (2 * (2 * b) + 1) + (2 * b) * 7919) % 1000000007)) AS VARCHAR),
      |                   CAST(list_min(list_transform(hv, h -> (h * (2 * (2 * b + 1) + 1) + (2 * b + 1) * 7919) % 1000000007)) AS VARCHAR))
      |                 for b in range(0, 4)]) AS band_key
      |  FROM hs),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bd a JOIN bd b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
      |vp AS (
      |  SELECT * FROM (
      |    SELECT doc_a, doc_b,
      |           round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
      |                 len(list_distinct(sa.sh || sb.sh)), 4) AS jaccard
      |    FROM cand
      |    JOIN s sa ON cand.doc_a = sa.doc_id
      |    JOIN s sb ON cand.doc_b = sb.doc_id)
      |  WHERE jaccard >= 0.7)""".stripMargin

  /** The banded-kNN ranked-candidate CTE chain, shared by the q153/q157
    * oracle and q158's audit oracle. All `def`s here, never forward
    * `val`s — the round-16 lesson (OracleRegistrySpec sweeps). */
  private def knnRankedCte: String =
    """wb AS (
      |  SELECT vec_id, embedding,
      |         CAST(list_sum(
      |           [CASE WHEN list_sum([(CAST(((p * 131071 + i * 524287) * 2654435761) % 1000003 AS DOUBLE) / 1000003.0 - 0.5)
      |                                * CAST(embedding[i] AS DOUBLE) for i in range(1, 65)]) > 0
      |                 THEN CAST(round(pow(2, p)) AS BIGINT) ELSE CAST(0 AS BIGINT) END
      |            for p in range(0, 8)]) AS BIGINT) AS bucket
      |  FROM embeddings),
      |cand AS (
      |  SELECT q.vec_id AS vec_id, e.vec_id AS nbr_id,
      |         CAST(round(
      |           list_sum([CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) for i in range(1, 65)]) /
      |           (sqrt(list_sum([CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE) for i in range(1, 65)])) *
      |            sqrt(list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) for i in range(1, 65)]))) * 1000000) AS BIGINT) AS cos_u
      |  FROM wb q JOIN wb e ON bit_count(xor(q.bucket, e.bucket)) <= 1
      |  WHERE q.vec_id <> e.vec_id),
      |rk AS (
      |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_u DESC, nbr_id) AS rank
      |  FROM cand)""".stripMargin

  /** q153's kNN-graph SQL — shared verbatim by q157 (fold ≡ rebuild). */
  private def knnGraphOracle: String =
    s"""WITH $knnRankedCte
      |SELECT vec_id, nbr_id, CAST(rank AS BIGINT) AS rank, cos_u FROM rk
      |WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin

  /** q169's k-center greedy, unrolled as one MATERIALIZED CTE per round
    * (the q134 pagerank idiom): round 1 seeds at the smallest vec_id;
    * each later round picks the (d DESC, vec_id) argmax from the
    * previous min-distance table — chosen centers sit at d = 0 and can
    * never re-win — and folds the new center's distances in with
    * least(). Distances are the q153 micro-unit cosine expression, so
    * the whole trajectory (centers and radii) hash-matches. */
  private def kcenterOracle(k: Int): String = {
    def cos(c: String): String =
      s"CAST(round(list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST($c.embedding[i] AS DOUBLE) for i in range(1, 65)]) / (e.nrm * $c.nrm) * 1000000) AS BIGINT)"
    val head =
      """WITH e AS MATERIALIZED (
        |  SELECT vec_id, embedding,
        |         sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) for i in range(1, 65)])) AS nrm
        |  FROM embeddings),
        |c1 AS MATERIALIZED (SELECT * FROM e ORDER BY vec_id LIMIT 1),
        |d1 AS MATERIALIZED (
        |  SELECT e.vec_id, 1000000 - """.stripMargin + cos("c") +
        """ AS d
        |  FROM e, c1 c)""".stripMargin
    val rounds = (2 to k).map { r =>
      s"""c$r AS MATERIALIZED (
         |  SELECT e.* FROM e JOIN (
         |    SELECT vec_id FROM d${r - 1} ORDER BY d DESC, vec_id LIMIT 1
         |  ) p USING (vec_id)),
         |d$r AS MATERIALIZED (
         |  SELECT dd.vec_id, least(dd.d, 1000000 - ${cos("c")}) AS d
         |  FROM d${r - 1} dd JOIN e ON dd.vec_id = e.vec_id, c$r c)""".stripMargin
    }
    val finalRows = (1 to k).map { r =>
      s"SELECT CAST($r AS BIGINT) AS round, (SELECT vec_id FROM c$r) AS center_id, (SELECT max(d) FROM d$r) AS radius_u"
    }.mkString("\nUNION ALL ")
    (Seq(head) ++ rounds).mkString(",\n") +
      s"\nSELECT round, center_id, radius_u FROM (\n$finalRows\n) ORDER BY round"
  }

  /** q166's NN-Descent round: the q153 chain, then candidates = edges ∪
    * reverse ∪ 2-hop (UNION dedups, matching the Spark distinct), exact
    * re-score, re-rank. `def` (round-16 lesson). */
  /** q170/q174's shared replicate-mean CTE chain (ends in
    * `rm(source, b, mean_u)`): ×200 replicate fan-out, the integer
    * Poisson(1) inverse-CDF ladder, integer ppm replicate means. `def`,
    * never a forward `val` (round-16 lesson). */
  private def bootstrapRepMeansCte: String =
    """reps AS (
      |  SELECT d.source, d.doc_id, d.n_chars, t.b
      |  FROM documents d, range(0, 200) t(b)),
      |cnts AS (
      |  SELECT source, b, n_chars,
      |         CASE WHEN u < 26508507426831584 THEN 0
      |              WHEN u < 53017014853663168 THEN 1
      |              WHEN u < 66271268567078960 THEN 2
      |              WHEN u < 70689353138217560 THEN 3
      |              WHEN u < 71793874281002208 THEN 4
      |              WHEN u < 72014778509559136 THEN 5
      |              WHEN u < 72051595880985288 THEN 6
      |              WHEN u < 72056855505474736 THEN 7
      |              ELSE 8 END AS cnt
      |  FROM (SELECT *,
      |          CAST(concat('0x', substr(md5(concat('boot:', CAST(b AS VARCHAR), ':', CAST(doc_id AS VARCHAR))), 1, 14)) AS BIGINT) AS u
      |        FROM reps)),
      |rm AS (
      |  SELECT source, b, sum(cnt * n_chars) * 1000000 // sum(cnt) AS mean_u
      |  FROM cnts GROUP BY source, b HAVING sum(cnt) > 0)""".stripMargin

  /** q175's assignment census over the q169 trajectory: the kcenter
    * CTE chain (6 rounds), then the 6 chosen centers as one table,
    * every vector argmin-assigned (ties by center_id — the Spark
    * min(struct) order), a per-center census, and the 1-row corpus
    * total for the ppm weights. Centers that win no member survive the
    * LEFT JOIN as explicit (0, 0) rows, matching the Spark side. */
  private def kcenterWeightsOracle(k: Int): String = {
    val cosEC =
      "CAST(round(list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE) for i in range(1, 65)]) / (e.nrm * c.nrm) * 1000000) AS BIGINT)"
    val base = kcenterOracle(k)
    val ctes = base.substring(0, base.indexOf("\nSELECT round, center_id"))
    val ctrRows = (1 to k).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, vec_id AS center_id, embedding, nrm FROM c$r")
      .mkString("\n  UNION ALL ")
    s"""$ctes,
      |ctr AS MATERIALIZED (
      |  $ctrRows),
      |asg AS MATERIALIZED (
      |  SELECT e.vec_id, c.round, c.center_id,
      |         1000000 - $cosEC AS d
      |  FROM e, ctr c),
      |pick AS (
      |  SELECT round, center_id, d,
      |         row_number() OVER (PARTITION BY vec_id ORDER BY d, center_id) AS rn
      |  FROM asg),
      |cen AS (
      |  SELECT round, center_id, CAST(count(*) AS BIGINT) AS mem,
      |         CAST(max(d) AS BIGINT) AS rad
      |  FROM pick WHERE rn = 1 GROUP BY round, center_id),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM e)
      |SELECT c.round, c.center_id,
      |       CAST(COALESCE(cen.mem, 0) AS BIGINT) AS n_members,
      |       CAST(COALESCE(cen.mem, 0) * 1000000 // (SELECT n_total FROM tot) AS BIGINT) AS weight_ppm,
      |       CAST(COALESCE(cen.rad, 0) AS BIGINT) AS cover_radius_u
      |FROM ctr c LEFT JOIN cen ON c.round = cen.round AND c.center_id = cen.center_id
      |ORDER BY c.round""".stripMargin
  }

  /** q172's converged NN-Descent: the q153 chain as g0, `cap` unrolled
    * refinement rounds (candidates = edges ∪ reverse ∪ 2-hop, exact
    * re-score, re-rank), a per-round changed-edge count, and the q146
    * stopping rule — the final edges come from the FIRST round that
    * changed nothing (else round `cap`), so both engines stop at the
    * identical round and `rounds_taken` hash-matches. */
  private def knnRefineConvergedOracle(kNbrs: Int, cap: Int): String = {
    val cosQE =
      """CAST(round(
        |           list_sum([CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) for i in range(1, 65)]) /
        |           (sqrt(list_sum([CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE) for i in range(1, 65)])) *
        |            sqrt(list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) for i in range(1, 65)]))) * 1000000) AS BIGINT)""".stripMargin
    val head =
      s"""WITH $knnRankedCte,
        |g0 AS MATERIALIZED (
        |  SELECT vec_id, nbr_id, CAST(rank AS BIGINT) AS rank, cos_u
        |  FROM rk WHERE rank <= $kNbrs)""".stripMargin
    val rounds = (1 to cap).map { i =>
      s"""cu$i AS MATERIALIZED (
        |  SELECT vec_id, nbr_id FROM g${i - 1}
        |  UNION
        |  SELECT nbr_id AS vec_id, vec_id AS nbr_id FROM g${i - 1}
        |  UNION
        |  SELECT a.vec_id AS vec_id, b.nbr_id AS nbr_id
        |  FROM g${i - 1} a JOIN g${i - 1} b ON a.nbr_id = b.vec_id
        |  WHERE a.vec_id <> b.nbr_id),
        |sc$i AS MATERIALIZED (
        |  SELECT c.vec_id, c.nbr_id,
        |         $cosQE AS cos_u
        |  FROM cu$i c JOIN embeddings q ON c.vec_id = q.vec_id
        |              JOIN embeddings e ON c.nbr_id = e.vec_id),
        |g$i AS MATERIALIZED (
        |  SELECT vec_id, nbr_id, CAST(rank AS BIGINT) AS rank, cos_u FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_u DESC, nbr_id) AS rank
        |    FROM sc$i)
        |  WHERE rank <= $kNbrs),
        |ch$i AS MATERIALIZED (
        |  SELECT CAST(count(*) AS BIGINT) AS n FROM g$i nx
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM g${i - 1} p
        |    WHERE p.vec_id = nx.vec_id AND p.nbr_id = nx.nbr_id))""".stripMargin
    }
    val chs = (1 to cap)
      .map(i => s"SELECT $i AS i, (SELECT n FROM ch$i) AS n")
      .mkString("\n  UNION ALL ")
    val allg = (1 to cap)
      .map(i => s"SELECT $i AS i, vec_id, nbr_id, rank, cos_u FROM g$i")
      .mkString("\n  UNION ALL ")
    val tail =
      s"""chs AS ($chs),
        |stop AS (
        |  SELECT COALESCE(min(i), $cap) AS k FROM chs WHERE n = 0),
        |allg AS ($allg)
        |SELECT vec_id, nbr_id, rank, cos_u,
        |       CAST((SELECT k FROM stop) AS BIGINT) AS rounds_taken
        |FROM allg WHERE i = (SELECT k FROM stop)
        |ORDER BY vec_id, rank""".stripMargin
    (Seq(head) ++ rounds ++ Seq(tail)).mkString(",\n")
  }

  private def knnRefineOracle: String =
    s"""WITH $knnRankedCte,
      |g AS (SELECT vec_id, nbr_id FROM rk WHERE rank <= 3),
      |cu AS (
      |  SELECT vec_id, nbr_id FROM g
      |  UNION
      |  SELECT nbr_id AS vec_id, vec_id AS nbr_id FROM g
      |  UNION
      |  SELECT a.vec_id AS vec_id, b.nbr_id AS nbr_id
      |  FROM g a JOIN g b ON a.nbr_id = b.vec_id
      |  WHERE a.vec_id <> b.nbr_id),
      |sc AS (
      |  SELECT c.vec_id, c.nbr_id,
      |         CAST(round(
      |           list_sum([CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) for i in range(1, 65)]) /
      |           (sqrt(list_sum([CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE) for i in range(1, 65)])) *
      |            sqrt(list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) for i in range(1, 65)]))) * 1000000) AS BIGINT) AS cos_u
      |  FROM cu c JOIN embeddings q ON c.vec_id = q.vec_id
      |            JOIN embeddings e ON c.nbr_id = e.vec_id),
      |rk2 AS (
      |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_u DESC, nbr_id) AS rank
      |  FROM sc)
      |SELECT vec_id, nbr_id, CAST(rank AS BIGINT) AS rank, cos_u FROM rk2
      |WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin

  /** q154–q156 oracle block, split out so q153's SQL can be shared
    * with q157 above. `def`, not `val`: it is referenced from the
    * oracleSql initializer ABOVE its declaration — a forward *val*
    * reference would be null at init (the round-16 bug class). */
  private def streamAndEvalOracles: Map[String, String] = Map(
    // Streaming shard router: assignment is stateless per row and every
    // census aggregate is commutative-associative, so the stream result
    // provably equals the batch export — q150's oracle VERBATIM (the
    // q145/q106 registered-equality trick).
    "q154_stream_shard_route" -> shardExportOracle,
    // Streaming SCD2 fold: each micro-batch folds into the standing
    // dimension via scd2Incremental under the closed-batch restriction
    // (enforced in-plan by the load-boundary guard), so the stream-
    // maintained dimension provably equals the batch rebuild — q137/
    // q145's oracle VERBATIM (StreamingScd2FoldSpec pins multi-batch).
    "q162_stream_scd2_fold" -> scd2RebuildOracle,
    // Streaming kNN fold: banded candidate sets depend on bucket
    // membership, not arrival order, so the per-micro-batch fold equals
    // the rebuild under ANY batch slicing — q153's oracle VERBATIM
    // (StreamingKnnFoldSpec pins 2-batch ≡ 1-batch ≡ rebuild).
    "q163_stream_knn_fold" -> knnGraphOracle,
    // NN-Descent round: candidates = edges ∪ reverse ∪ 2-hop over the
    // q153 graph, exact re-score, re-rank (recall-monotone by
    // candidate-superset; KnnRefineSpec measures the gain).
    "q166_knn_refine" -> knnRefineOracle,
    // Streaming shard publisher: the keyed upsert drains to the same
    // merged manifest as the batch full-outer join under any slicing,
    // so q165's census SQL serves VERBATIM (registered equality).
    "q173_stream_shard_publish" -> shardPublishOracle,
    // k-center greedy coreset: the full trajectory unrolled (6 rounds).
    "q169_kcenter_coreset" -> kcenterOracle(6),
    // NN-Descent to convergence: rounds unrolled to the cap with a
    // per-round changed-edge count; both engines apply the identical
    // integer stopping rule, so rounds_taken hash-matches (q146 idiom).
    "q172_knn_refine_converged" -> knnRefineConvergedOracle(3, 4),
    // Coreset weights: nearest-center assignment census over the q169
    // trajectory (argmin ties by center_id — the min(struct) order).
    "q175_kcenter_weights" -> kcenterWeightsOracle(6),
    // Poisson bootstrap: the same integer inverse-CDF ladder (floor of
    // CDF·2^56 literals), integer ppm replicate means, rank-picked
    // percentile CI — fully deterministic, so the CI table hash-matches.
    "q170_bootstrap_ci" ->
      s"""WITH $bootstrapRepMeansCte,
        |rk AS (
        |  SELECT source, mean_u,
        |         row_number() OVER (PARTITION BY source ORDER BY mean_u, b) AS r,
        |         count(*) OVER (PARTITION BY source) AS nb
        |  FROM rm),
        |ci AS (
        |  SELECT source,
        |         CAST(max(CASE WHEN r = (nb * 25 + 999) // 1000 THEN mean_u END) AS BIGINT) AS ci_lo_u,
        |         CAST(max(CASE WHEN r = (nb * 975 + 999) // 1000 THEN mean_u END) AS BIGINT) AS ci_hi_u,
        |         CAST(max(nb) AS BIGINT) AS n_replicates
        |  FROM rk GROUP BY source),
        |pt AS (
        |  SELECT source, CAST(sum(n_chars) * 1000000 // count(*) AS BIGINT) AS point_mean_u
        |  FROM documents GROUP BY source)
        |SELECT pt.source, pt.point_mean_u, ci.ci_lo_u, ci.ci_hi_u,
        |       ci.n_replicates
        |FROM pt JOIN ci ON pt.source = ci.source ORDER BY pt.source""".stripMargin,
    // Bootstrap delta CIs: the identical replicate means (shared CTE),
    // paired per replicate index across every unordered source pair;
    // deltas are pure subtractions (no division ever sees a negative),
    // so the full significance matrix hash-matches.
    "q174_bootstrap_delta_ci" ->
      s"""WITH $bootstrapRepMeansCte,
        |pairs AS (
        |  SELECT x.source AS source_a, y.source AS source_b, x.b,
        |         x.mean_u - y.mean_u AS delta_u
        |  FROM rm x JOIN rm y ON x.b = y.b AND x.source < y.source),
        |rk AS (
        |  SELECT source_a, source_b, delta_u,
        |         row_number() OVER (PARTITION BY source_a, source_b ORDER BY delta_u, b) AS r,
        |         count(*) OVER (PARTITION BY source_a, source_b) AS nb
        |  FROM pairs),
        |ci AS (
        |  SELECT source_a, source_b,
        |         CAST(max(CASE WHEN r = (nb * 25 + 999) // 1000 THEN delta_u END) AS BIGINT) AS ci_lo_u,
        |         CAST(max(CASE WHEN r = (nb * 975 + 999) // 1000 THEN delta_u END) AS BIGINT) AS ci_hi_u,
        |         CAST(max(nb) AS BIGINT) AS n_replicates
        |  FROM rk GROUP BY source_a, source_b),
        |pt AS (
        |  SELECT source, sum(n_chars) * 1000000 // count(*) AS pm
        |  FROM documents GROUP BY source),
        |pd AS (
        |  SELECT x.source AS source_a, y.source AS source_b,
        |         CAST(x.pm - y.pm AS BIGINT) AS point_delta_u
        |  FROM pt x JOIN pt y ON x.source < y.source)
        |SELECT pd.source_a, pd.source_b, pd.point_delta_u,
        |       ci.ci_lo_u, ci.ci_hi_u, ci.n_replicates,
        |       CAST(CASE WHEN ci.ci_lo_u > 0 OR ci.ci_hi_u < 0 THEN 1 ELSE 0 END AS BIGINT) AS significant
        |FROM pd JOIN ci ON pd.source_a = ci.source_a AND pd.source_b = ci.source_b
        |ORDER BY pd.source_a, pd.source_b""".stripMargin,
    // Streaming quantile monitor: the bottom-k set is order-free, so
    // the stream census under ANY micro-batch slicing equals the batch
    // sketch — restated relationally (the q164 sampling CTE, sketch
    // arm only).
    "q168_stream_quantile_monitor" ->
      """WITH h AS (
        |  SELECT source, n_chars,
        |         CAST(concat('0x', substr(md5(concat('btk:', CAST(doc_id AS VARCHAR))), 1, 14)) AS BIGINT) AS hv
        |  FROM documents),
        |dp AS (SELECT DISTINCT source, hv, n_chars FROM h),
        |samp AS (
        |  SELECT source, n_chars,
        |         row_number() OVER (PARTITION BY source ORDER BY hv, n_chars) AS rh
        |  FROM dp),
        |sk AS (SELECT source, n_chars FROM samp WHERE rh <= 64),
        |m AS (SELECT source, CAST(count(*) AS BIGINT) AS m FROM sk GROUP BY source),
        |sv AS (
        |  SELECT source, n_chars,
        |         row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rv
        |  FROM sk)
        |SELECT sv.source, m.m,
        |       max(CASE WHEN rv = (m.m * 25 + 99) // 100 THEN n_chars END) AS p25_est,
        |       max(CASE WHEN rv = (m.m * 50 + 99) // 100 THEN n_chars END) AS p50_est,
        |       max(CASE WHEN rv = (m.m * 75 + 99) // 100 THEN n_chars END) AS p75_est
        |FROM sv JOIN m ON sv.source = m.source
        |GROUP BY sv.source, m.m ORDER BY sv.source""".stripMargin,
    // nDCG@10: q131's exact/probed arms with integer gains (11 − rank)
    // and ppb-literal discounts round(1e9/log2(r+1)) — no runtime log2,
    // so DCG/IDCG are exact BIGINT sums in both engines.
    "q155_ndcg_eval" ->
      """WITH wb AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) for i in range(1, 65)])) AS nrm,
        |         CAST(list_sum(
        |           [CASE WHEN list_sum([(CAST(((p * 131071 + i * 524287) * 2654435761) % 1000003 AS DOUBLE) / 1000003.0 - 0.5)
        |                                * CAST(embedding[i] AS DOUBLE) for i in range(1, 65)]) > 0
        |                 THEN CAST(round(pow(2, p)) AS BIGINT) ELSE CAST(0 AS BIGINT) END
        |            for p in range(0, 8)]) AS BIGINT) AS bucket
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id AS q_id, embedding AS qv, nrm AS qnrm, bucket AS qbucket
        |  FROM wb WHERE vec_id < 5),
        |ex AS (
        |  SELECT q_id, vec_id, 11 - ex_rank AS rel, ex_rank FROM (
        |    SELECT q.q_id, e.vec_id,
        |           row_number() OVER (PARTITION BY q.q_id ORDER BY
        |             round(list_sum([CAST(q.qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) for i in range(1, 65)])
        |               / (q.qnrm * e.nrm), 6) DESC, e.vec_id) AS ex_rank
        |    FROM wb e CROSS JOIN q WHERE e.vec_id <> q.q_id)
        |  WHERE ex_rank <= 10),
        |an AS (
        |  SELECT q_id, vec_id, an_rank FROM (
        |    SELECT q.q_id, e.vec_id,
        |           row_number() OVER (PARTITION BY q.q_id ORDER BY
        |             round(list_sum([CAST(q.qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) for i in range(1, 65)])
        |               / (q.qnrm * e.nrm), 6) DESC, e.vec_id) AS an_rank
        |    FROM wb e JOIN q ON bit_count(xor(e.bucket, q.qbucket)) <= 2
        |    WHERE e.vec_id <> q.q_id)
        |  WHERE an_rank <= 10),
        |disc(r, d) AS (VALUES (1, 1000000000), (2, 630929754), (3, 500000000),
        |  (4, 430676558), (5, 386852807), (6, 356207187), (7, 333333333),
        |  (8, 315464877), (9, 301029996), (10, 289064826)),
        |dcg AS (
        |  SELECT an.q_id,
        |         CAST(sum(COALESCE(ex.rel, 0) * disc.d) AS BIGINT) AS dcg_ppb
        |  FROM an JOIN disc ON an.an_rank = disc.r
        |  LEFT JOIN ex ON an.q_id = ex.q_id AND an.vec_id = ex.vec_id
        |  GROUP BY an.q_id),
        |idcg AS (
        |  SELECT ex.q_id, CAST(sum(ex.rel * disc.d) AS BIGINT) AS idcg_ppb
        |  FROM ex JOIN disc ON ex.ex_rank = disc.r GROUP BY ex.q_id)
        |SELECT idcg.q_id, CAST(COALESCE(dcg.dcg_ppb, 0) AS BIGINT) AS dcg_ppb,
        |       idcg.idcg_ppb,
        |       CAST(COALESCE(dcg.dcg_ppb, 0) * 1000000 // idcg.idcg_ppb AS BIGINT) AS ndcg_ppm
        |FROM idcg LEFT JOIN dcg ON idcg.q_id = dcg.q_id
        |ORDER BY idcg.q_id""".stripMargin,
    // Embedding drift: per-(label, parity, dim) micro-unit sums, sign-
    // split integer means, one integer dot per label.
    "q156_embedding_drift" ->
      """WITH comp AS (
        |  SELECT vec_id % 2 AS parity, label, j,
        |         CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS u
        |  FROM (SELECT vec_id, label, unnest(embedding) AS v,
        |               unnest(range(1, 65)) AS j FROM embeddings)),
        |sums AS (
        |  SELECT label, parity, j, CAST(sum(u) AS BIGINT) AS s,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM comp GROUP BY label, parity, j),
        |m AS (
        |  SELECT label, parity, j,
        |         CASE WHEN s >= 0 THEN s // n ELSE -((-s) // n) END AS m
        |  FROM sums),
        |means AS (
        |  SELECT label, j,
        |         sum(CASE WHEN parity = 0 THEN m END) AS ma,
        |         sum(CASE WHEN parity = 1 THEN m END) AS mb
        |  FROM m GROUP BY label, j),
        |stats AS (
        |  SELECT label, CAST(sum(ma * mb) AS BIGINT) AS dotab,
        |         CAST(sum(ma * ma) AS BIGINT) AS na2,
        |         CAST(sum(mb * mb) AS BIGINT) AS nb2
        |  FROM means GROUP BY label),
        |counts AS (
        |  SELECT label,
        |         CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
        |         CAST(sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_odd
        |  FROM embeddings GROUP BY label)
        |SELECT c.label, c.n_even, c.n_odd,
        |       round(CAST(s.dotab AS DOUBLE) /
        |             (sqrt(CAST(s.na2 AS DOUBLE)) * sqrt(CAST(s.nb2 AS DOUBLE))), 6) AS mean_cos
        |FROM counts c JOIN stats s ON c.label = s.label
        |ORDER BY c.label""".stripMargin,
  )

  /** q150's shard-export census SQL — shared verbatim by q154 (the
    * stream router provably equals the batch export: stateless
    * assignment + commutative census). Declared `def`, NOT `val` — the
    * round-16 forward-reference lesson (OracleRegistrySpec sweeps). */
  private def shardExportOracle: String =
    """WITH h AS (
      |  SELECT doc_id, n_chars,
      |         CAST(concat('0x', substr(md5(concat('seed42:', CAST(doc_id AS VARCHAR))), 1, 14)) AS BIGINT) AS hv
      |  FROM documents)
      |SELECT hv % 64 AS shard, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS n_chars,
      |       min_by(doc_id, hv) AS first_doc, max_by(doc_id, hv) AS last_doc
      |FROM h GROUP BY hv % 64 ORDER BY shard""".stripMargin

  /** q137's from-scratch SCD2 rebuild — shared verbatim by q145 (the
    * incremental fold provably equals the rebuild, so one oracle
    * serves both; the asof-oracle / q58-q64 move). Declared as `def`,
    * NOT `val`: it is referenced from `mixCascadeOracles` which is
    * declared earlier in this object, and a forward *val* reference
    * initializes to null (this exact bug zeroed round 16's
    * correctness artifact — see VERDICT r16 #1 and
    * OracleRegistrySpec's null sweep). */
  private def scd2RebuildOracle: String =
    """WITH e AS (
      |  SELECT user_id, ts, event_id, event_type AS state,
      |         lag(event_type) OVER (PARTITION BY user_id
      |                               ORDER BY ts, event_id) AS prev
      |  FROM events),
      |ch AS (
      |  SELECT user_id, ts, event_id, state FROM e
      |  WHERE prev IS NULL OR prev <> state),
      |v AS (
      |  SELECT user_id, state, ts AS valid_from,
      |         COALESCE(lead(ts) OVER (PARTITION BY user_id
      |                                 ORDER BY ts, event_id),
      |                  TIMESTAMP '2200-01-01 00:00:00') AS valid_to,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY ts, event_id) AS version
      |  FROM ch)
      |SELECT user_id, state,
      |       strftime(valid_from, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
      |       strftime(valid_to, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
      |       CAST(version AS BIGINT) AS version,
      |       valid_to = TIMESTAMP '2200-01-01 00:00:00' AS is_current
      |FROM v ORDER BY user_id, version""".stripMargin

  /** The q134/q139 rank oracle: the co-supply edge projection + degree
    * table once, a seed-flagged node table (q134 seeds every node —
    * classic PageRank; q139 seeds the 4 lowest ids — TrustRank), then
    * each damped round as three MATERIALIZED CTEs (dst-keyed
    * contribution sum → dangling-mass scalar → node-sized rank
    * rebuild, teleport and dangling mass to seeds only). Every
    * operation is BIGINT with integer division in the same association
    * order as the Spark side, so the final ranks hash-match bit for
    * bit. */
  private def pagerankOracleSql(iters: Int, seedSql: String,
                                rankCol: String): String = {
    val head =
      s"""WITH li AS (SELECT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
         |e AS MATERIALIZED (
         |  SELECT DISTINCT a.sk AS src, b.sk AS dst
         |  FROM li a JOIN li b USING (ok) WHERE a.sk <> b.sk),
         |nodes AS MATERIALIZED (SELECT DISTINCT sk AS node FROM li),
         |deg AS MATERIALIZED (
         |  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
         |seeds AS MATERIALIZED ($seedSql),
         |f AS MATERIALIZED (
         |  SELECT n.node,
         |         CASE WHEN s.node IS NULL THEN 0 ELSE 1 END AS is_seed
         |  FROM nodes n LEFT JOIN seeds s ON s.node = n.node),
         |nn AS MATERIALIZED (
         |  SELECT CAST(sum(is_seed) AS BIGINT) AS n FROM f),
         |r0 AS MATERIALIZED (
         |  SELECT node,
         |         CAST(is_seed * (1000000000 // (SELECT n FROM nn)) AS BIGINT) AS r
         |  FROM f)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""c$i AS MATERIALIZED (
         |  SELECT e.dst, CAST(sum(r.r // d.deg) AS BIGINT) AS contrib
         |  FROM e JOIN r${i - 1} r ON r.node = e.src JOIN deg d ON d.src = e.src
         |  GROUP BY e.dst),
         |d$i AS MATERIALIZED (
         |  SELECT CAST(COALESCE(sum(r.r), 0) AS BIGINT) AS dang
         |  FROM r${i - 1} r LEFT JOIN deg d ON d.src = r.node
         |  WHERE d.src IS NULL),
         |r$i AS MATERIALIZED (
         |  SELECT f.node,
         |         CAST((150 * f.is_seed * (1000000000 // (SELECT n FROM nn)) +
         |               850 * (COALESCE(c.contrib, 0) +
         |                      f.is_seed * ((SELECT dang FROM d$i) //
         |                                   (SELECT n FROM nn))))
         |              // 1000 AS BIGINT) AS r
         |  FROM f LEFT JOIN c$i c ON c.dst = f.node)""".stripMargin
    }
    val tail =
      s"""SELECT node AS suppkey, r AS $rankCol FROM r$iters
         |ORDER BY $rankCol DESC, suppkey""".stripMargin
    (Seq(head) ++ rounds).mkString(",\n") + "\n" + tail
  }

  /** The q146 converged-TrustRank oracle: the q139 chain extended to
    * `cap` rounds with a per-round L1 delta CTE; the final ranks come
    * from the FIRST round whose delta drops below `epsPpb` (else round
    * `cap`) — the identical integer stopping rule the Spark loop
    * applies, so both engines stop at the same round and the
    * rounds_taken column hash-matches. */
  private def trustrankConvergedOracleSql(epsPpb: Long, cap: Int): String = {
    val head =
      s"""WITH li AS (SELECT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
         |e AS MATERIALIZED (
         |  SELECT DISTINCT a.sk AS src, b.sk AS dst
         |  FROM li a JOIN li b USING (ok) WHERE a.sk <> b.sk),
         |nodes AS MATERIALIZED (SELECT DISTINCT sk AS node FROM li),
         |deg AS MATERIALIZED (
         |  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
         |seeds AS MATERIALIZED (SELECT node FROM nodes ORDER BY node LIMIT 4),
         |f AS MATERIALIZED (
         |  SELECT n.node,
         |         CASE WHEN s.node IS NULL THEN 0 ELSE 1 END AS is_seed
         |  FROM nodes n LEFT JOIN seeds s ON s.node = n.node),
         |nn AS MATERIALIZED (
         |  SELECT CAST(sum(is_seed) AS BIGINT) AS n FROM f),
         |r0 AS MATERIALIZED (
         |  SELECT node,
         |         CAST(is_seed * (1000000000 // (SELECT n FROM nn)) AS BIGINT) AS r
         |  FROM f)""".stripMargin
    val rounds = (1 to cap).map { i =>
      s"""c$i AS MATERIALIZED (
         |  SELECT e.dst, CAST(sum(r.r // d.deg) AS BIGINT) AS contrib
         |  FROM e JOIN r${i - 1} r ON r.node = e.src JOIN deg d ON d.src = e.src
         |  GROUP BY e.dst),
         |d$i AS MATERIALIZED (
         |  SELECT CAST(COALESCE(sum(r.r), 0) AS BIGINT) AS dang
         |  FROM r${i - 1} r LEFT JOIN deg d ON d.src = r.node
         |  WHERE d.src IS NULL),
         |r$i AS MATERIALIZED (
         |  SELECT f.node,
         |         CAST((150 * f.is_seed * (1000000000 // (SELECT n FROM nn)) +
         |               850 * (COALESCE(c.contrib, 0) +
         |                      f.is_seed * ((SELECT dang FROM d$i) //
         |                                   (SELECT n FROM nn))))
         |              // 1000 AS BIGINT) AS r
         |  FROM f LEFT JOIN c$i c ON c.dst = f.node),
         |dl$i AS MATERIALIZED (
         |  SELECT CAST(sum(abs(a.r - b.r)) AS BIGINT) AS delta
         |  FROM r$i a JOIN r${i - 1} b ON a.node = b.node)""".stripMargin
    }
    val dls = (1 to cap)
      .map(i => s"SELECT $i AS i, (SELECT delta FROM dl$i) AS delta")
      .mkString("\n  UNION ALL ")
    val allr = (1 to cap)
      .map(i => s"SELECT $i AS i, node, r FROM r$i")
      .mkString("\n  UNION ALL ")
    val tail =
      s"""dls AS ($dls),
         |stop AS (
         |  SELECT COALESCE(min(i), $cap) AS k FROM dls WHERE delta < $epsPpb),
         |allr AS ($allr)
         |SELECT node AS suppkey, r AS trust_ppb,
         |       CAST((SELECT k FROM stop) AS BIGINT) AS rounds_taken
         |FROM allr WHERE i = (SELECT k FROM stop)
         |ORDER BY trust_ppb DESC, suppkey""".stripMargin
    (Seq(head) ++ rounds ++ Seq(tail)).mkString(",\n")
  }

  /** The q144 host-gate oracle: the q125 perceptron chain (shared
    * builder) aggregated to source grain, the q133 shingle-overlap
    * graph thresholded at 25000 ppm Jaccard into symmetric edges,
    * classic 3-round PageRank over it (seeds = every node), then the
    * two relative verdicts and the kept census. */
  private def hostGateOracleSql: String = {
    val prRounds = (1 to 3).map { i =>
      s"""pc$i AS MATERIALIZED (
         |  SELECT e.dst, CAST(sum(r.r // d.deg) AS BIGINT) AS contrib
         |  FROM se e JOIN pr${i - 1} r ON r.node = e.src
         |            JOIN sdeg d ON d.src = e.src
         |  GROUP BY e.dst),
         |pd$i AS MATERIALIZED (
         |  SELECT CAST(COALESCE(sum(r.r), 0) AS BIGINT) AS dang
         |  FROM pr${i - 1} r LEFT JOIN sdeg d ON d.src = r.node
         |  WHERE d.src IS NULL),
         |pr$i AS MATERIALIZED (
         |  SELECT n.node,
         |         CAST((150 * (1000000000 // (SELECT n FROM snn)) +
         |               850 * (COALESCE(c.contrib, 0) +
         |                      (SELECT dang FROM pd$i) //
         |                      (SELECT n FROM snn)))
         |              // 1000 AS BIGINT) AS r
         |  FROM snodes n LEFT JOIN pc$i c ON c.dst = n.node)""".stripMargin
    }.mkString(",\n")
    val tail =
      s"""sf AS MATERIALIZED (
         |  SELECT f.doc_id, CAST(sum(f.cnt * COALESCE(w.wt, 0)) AS BIGINT) AS score
         |  FROM f LEFT JOIN wavg w ON f.fid = w.fid GROUP BY f.doc_id),
         |persrc AS MATERIALIZED (
         |  SELECT t.source, CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(s.score) AS BIGINT) AS sum_score
         |  FROM t JOIN sf s USING (doc_id) GROUP BY t.source),
         |tot AS MATERIALIZED (
         |  SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
         |         CAST(sum(sum_score) AS BIGINT) AS total_score FROM persrc),
         |sg AS MATERIALIZED (
         |  SELECT DISTINCT source, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS sh
         |  FROM (SELECT source, toks, unnest(range(1, len(toks) - 1)) AS i
         |        FROM t WHERE len(toks) >= 3)),
         |nsh AS (SELECT source, CAST(count(*) AS BIGINT) AS nsh
         |        FROM sg GROUP BY source),
         |pp AS (SELECT a.source AS sa, b.source AS sb,
         |              CAST(count(*) AS BIGINT) AS shared
         |       FROM sg a JOIN sg b USING (sh) WHERE a.source < b.source
         |       GROUP BY 1, 2),
         |jp AS (SELECT sa, sb FROM (
         |         SELECT pp.sa, pp.sb,
         |                shared * 1000000 // (na.nsh + nb.nsh - shared) AS j
         |         FROM pp JOIN nsh na ON na.source = pp.sa
         |                 JOIN nsh nb ON nb.source = pp.sb)
         |       WHERE j >= 25000),
         |se AS MATERIALIZED (SELECT sa AS src, sb AS dst FROM jp
         |                    UNION ALL SELECT sb AS src, sa AS dst FROM jp),
         |snodes AS MATERIALIZED (SELECT DISTINCT source AS node FROM t),
         |sdeg AS MATERIALIZED (
         |  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM se GROUP BY src),
         |snn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM snodes),
         |pr0 AS MATERIALIZED (
         |  SELECT node, CAST(1000000000 // (SELECT n FROM snn) AS BIGINT) AS r
         |  FROM snodes),
         |$prRounds,
         |v AS (
         |  SELECT p.source, p.n_docs, p.sum_score, r.r AS rank_ppb,
         |         CASE WHEN p.sum_score * (SELECT n_total FROM tot) >=
         |                   (SELECT total_score FROM tot) * p.n_docs
         |              THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS q_pass,
         |         CASE WHEN r.r <= 1000000000 // (SELECT n FROM snn)
         |              THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS a_pass
         |  FROM persrc p JOIN pr3 r ON r.node = p.source)
         |SELECT source, n_docs, sum_score, rank_ppb, q_pass, a_pass,
         |       q_pass * a_pass AS verdict,
         |       CASE WHEN q_pass * a_pass = 1 THEN n_docs
         |            ELSE CAST(0 AS BIGINT) END AS docs_kept
         |FROM v ORDER BY source""".stripMargin
    perceptronOracle(256, 3, tail)
  }

  /** The q136 count-min oracle: the sketch's d×w cell matrix restated
    * as per-(row, bucket) exact counts over the same md5 bucket
    * arithmetic ('j:' || token → 56-bit BIGINT % w), estimate = min
    * over the d rows — what the native aggregate computes cell-wise. */
  private def cmsOracleSql(d: Int, w: Int): String = {
    def bktExpr(j: Int): String =
      s"CAST(concat('0x', substr(md5('$j:' || w), 1, 14)) AS BIGINT) % $w"
    val cellArms = (0 until d)
      .map(j => s"SELECT $j AS j, ${bktExpr(j)} AS bkt FROM wd")
      .mkString("\n  UNION ALL ")
    val probeArms = (0 until d)
      .map(j => s"SELECT w, exact_cnt, $j AS j, ${bktExpr(j)} AS bkt FROM top")
      .mkString("\n  UNION ALL ")
    s"""WITH t AS (
       |  SELECT string_split_regex(lower(trim(text)), '\\s+') AS toks
       |  FROM documents),
       |wd AS MATERIALIZED (
       |  SELECT w FROM (SELECT unnest(toks) AS w FROM t) WHERE len(w) > 0),
       |cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS exact_cnt
       |        FROM wd GROUP BY w),
       |top AS (SELECT w, exact_cnt FROM cnt ORDER BY exact_cnt DESC, w LIMIT 20),
       |cells AS MATERIALIZED (
       |  SELECT j, bkt, CAST(count(*) AS BIGINT) AS c FROM (
       |  $cellArms) GROUP BY j, bkt),
       |tb AS (
       |  $probeArms),
       |est AS (
       |  SELECT tb.w, tb.exact_cnt, CAST(min(c.c) AS BIGINT) AS cms_est
       |  FROM tb JOIN cells c ON c.j = tb.j AND c.bkt = tb.bkt
       |  GROUP BY tb.w, tb.exact_cnt)
       |SELECT w AS token, exact_cnt, cms_est,
       |       cms_est - exact_cnt AS overcount
       |FROM est ORDER BY exact_cnt DESC, token""".stripMargin
  }

  /** The q135 k-means oracle: ppm quantization once, then each Lloyd
    * round as assignment (squared-Euclidean argmin via row_number, cid
    * tie-break) → per-(cid, dim) integer sums → sign-split truncating
    * mean rebuilt into a centroid list, empty clusters keeping the
    * previous centroid. Final stats aggregate the (iters+1)-th
    * assignment. All BIGINT, so hashes match Spark bit for bit. */
  private def kmeansOracleSql(k: Int, iters: Int): String = {
    val d2 = "list_sum([(q.qe[i] - c.cv[i]) * (q.qe[i] - c.cv[i]) " +
      "for i in range(1, 65)])"
    val head =
      s"""WITH q AS MATERIALIZED (
         |  SELECT vec_id,
         |         [CASE WHEN CAST(x AS DOUBLE) >= 0
         |               THEN CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
         |               ELSE -CAST(floor(-CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT) END
         |          for x in embedding] AS qe
         |  FROM embeddings),
         |c0 AS MATERIALIZED (
         |  SELECT vec_id AS cid, qe AS cv FROM q ORDER BY vec_id LIMIT $k)""".stripMargin
    def assignCte(i: Int): String =
      s"""a$i AS MATERIALIZED (
         |  SELECT vec_id, cid, dist FROM (
         |    SELECT q.vec_id, c.cid, CAST($d2 AS BIGINT) AS dist,
         |           row_number() OVER (PARTITION BY q.vec_id
         |                              ORDER BY $d2, c.cid) AS rn
         |    FROM q CROSS JOIN c${i - 1} c) WHERE rn = 1)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""${assignCte(i)},
         |s$i AS MATERIALIZED (
         |  SELECT cid, i, CAST(sum(qe[i]) AS BIGINT) AS sv,
         |         CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT a.cid, q.qe, unnest(range(1, 65)) AS i
         |        FROM a$i a JOIN q USING (vec_id))
         |  GROUP BY cid, i),
         |u$i AS (
         |  SELECT cid, list(CASE WHEN sv >= 0 THEN sv // cnt
         |                        ELSE -((-sv) // cnt) END ORDER BY i) AS cv
         |  FROM s$i GROUP BY cid),
         |c$i AS MATERIALIZED (
         |  SELECT c.cid, COALESCE(u.cv, c.cv) AS cv
         |  FROM c${i - 1} c LEFT JOIN u$i u USING (cid))""".stripMargin
    }
    val select =
      s"""SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
         |       CAST(sum(dist) AS BIGINT) AS inertia
         |FROM a${iters + 1} GROUP BY cid ORDER BY cid""".stripMargin
    (Seq(head) ++ rounds ++ Seq(assignCte(iters + 1))).mkString(",\n") +
      "\n" + select
  }

  /** The q125 averaged-perceptron oracle: hashed-token feature rows + a
    * per-doc bias row, then each unrolled epoch as two MATERIALIZED CTEs
    * (scores under the previous weights → gradient over the
    * misclassified set → next weight table; epoch 1's all-zero weights
    * collapse to "every doc misclassified", i.e. w1 = Σ y·x). Shipped
    * model = the integer SUM of the epoch snapshots; all arithmetic is
    * exact BIGINT, so the final per-doc scores hash-match the Spark
    * side bit for bit. */
  private def perceptronOracleSql(dims: Int, epochs: Int): String =
    perceptronOracle(dims, epochs,
      """sf AS (
        |  SELECT f.doc_id, f.y, CAST(sum(f.cnt * COALESCE(w.wt, 0)) AS BIGINT) AS score
        |  FROM f LEFT JOIN wavg w ON f.fid = w.fid GROUP BY f.doc_id, f.y)
        |SELECT doc_id, CAST(y AS BIGINT) AS y, score,
        |       CASE WHEN score > 0 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS pred,
        |       (CASE WHEN score > 0 THEN 1 ELSE -1 END) = y AS correct
        |FROM sf ORDER BY doc_id""".stripMargin)

  /** The q130 tail over the same weight chain: per-doc scores joined
    * back to their source, censused by (source, pred) — the stream
    * query's batch restatement (all-integer scoring makes the stream
    * census micro-batch-split invariant, so equality is exact). */
  private def perceptronCensusOracleSql(dims: Int, epochs: Int): String =
    perceptronOracle(dims, epochs,
      """sf AS (
        |  SELECT f.doc_id, f.y, CAST(sum(f.cnt * COALESCE(w.wt, 0)) AS BIGINT) AS score
        |  FROM f LEFT JOIN wavg w ON f.fid = w.fid GROUP BY f.doc_id, f.y),
        |sc AS (
        |  SELECT t.source, s.y, s.score,
        |         CASE WHEN s.score > 0 THEN 1 ELSE -1 END AS pred
        |  FROM sf s JOIN t USING (doc_id))
        |SELECT source, CAST(pred AS BIGINT) AS pred,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(score) AS BIGINT) AS score_sum,
        |       CAST(sum(CASE WHEN pred = y THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        |FROM sc GROUP BY source, pred ORDER BY source, pred""".stripMargin)

  private def perceptronOracle(dims: Int, epochs: Int, tail: String): String = {
    val head =
      s"""WITH t AS MATERIALIZED (
         |  SELECT doc_id, source, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
         |         string_split_regex(lower(trim(text)), '\\s+') AS toks
         |  FROM documents),
         |f AS MATERIALIZED (
         |  SELECT doc_id, y, fid, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT doc_id, y,
         |           CAST(concat('0x', substr(md5(w), 1, 8)) AS BIGINT) % $dims AS fid
         |    FROM (SELECT doc_id, y, unnest(toks) AS w FROM t) WHERE len(w) > 0)
         |  GROUP BY doc_id, y, fid
         |  UNION ALL
         |  SELECT doc_id, y, $dims AS fid, CAST(1 AS BIGINT) FROM t),
         |w1 AS MATERIALIZED (
         |  SELECT fid, CAST(sum(y * cnt) AS BIGINT) AS wt FROM f GROUP BY fid)""".stripMargin
    val rounds = (2 to epochs).map { e =>
      s"""s$e AS MATERIALIZED (
         |  SELECT f.doc_id, f.y, CAST(sum(f.cnt * COALESCE(w.wt, 0)) AS BIGINT) AS score
         |  FROM f LEFT JOIN w${e - 1} w ON f.fid = w.fid GROUP BY f.doc_id, f.y),
         |g$e AS MATERIALIZED (
         |  SELECT fid, CAST(sum(y * cnt) AS BIGINT) AS g FROM f
         |  WHERE doc_id IN (SELECT doc_id FROM s$e WHERE y * score <= 0)
         |  GROUP BY fid),
         |w$e AS MATERIALIZED (
         |  SELECT COALESCE(w.fid, g.fid) AS fid,
         |         CAST(COALESCE(w.wt, 0) + COALESCE(g.g, 0) AS BIGINT) AS wt
         |  FROM w${e - 1} w FULL JOIN g$e g ON w.fid = g.fid)""".stripMargin
    }
    val unionAll = (1 to epochs).map(e => s"SELECT * FROM w$e")
      .mkString(" UNION ALL ")
    val wavg =
      s"""wavg AS MATERIALIZED (
         |  SELECT fid, CAST(sum(wt) AS BIGINT) AS wt
         |  FROM ($unionAll) GROUP BY fid)""".stripMargin
    (Seq(head) ++ rounds ++ Seq(wavg, tail)).mkString(",\n")
  }

  /** Generates the k-parameterized ExactSubstr oracle (q93's SQL shape
    * with the gram width as a dial — q109 registers k = 20). The gram
    * string is the same "w1 w2 … wk" join the Spark side hashes; islands
    * fuse when [pos, pos+k-1] overlaps or touches the running-max
    * previous end (pos <= prev_max_pos + k). */
  /** The q120 importance-selection oracle: the q118 stupid-backoff chain
    * instantiated twice over one shared trigram stream — chain `a`
    * trained on the en slice (the target model), chain `b` on the full
    * corpus (the raw model, every trigram tier 3) — joined on doc_id,
    * importance = target − raw, deterministic top-100. */
  private def importanceOracleSql: String = {
    def chain(tag: String, where: String): String =
      s"""tcnt$tag AS (SELECT h123, count(*) AS c123 FROM g WHERE $where GROUP BY 1),
         |bp$tag AS (
         |  SELECT unnest(range(1, len(toks))) AS i, toks
         |  FROM t WHERE ($where) AND len(toks) >= 2),
         |bcnt$tag AS (
         |  SELECT CAST(concat('0x', substr(md5(toks[i] || ' ' || toks[i+1]), 1, 14)) AS BIGINT) AS h12,
         |         count(*) AS cb
         |  FROM bp$tag GROUP BY 1),
         |up$tag AS (SELECT unnest(toks) AS w FROM t WHERE $where),
         |ucnt$tag AS (
         |  SELECT CAST(concat('0x', substr(md5(w), 1, 14)) AS BIGINT) AS h, count(*) AS cu
         |  FROM up$tag GROUP BY 1),
         |nn$tag AS (SELECT count(*) AS n_train FROM up$tag),
         |sc$tag AS (
         |  SELECT doc_id,
         |         CASE WHEN tc.c123 IS NOT NULL THEN (tc.c123 * 1000000) // b12.cb
         |              WHEN b23.cb IS NOT NULL THEN (b23.cb * 400000) // u2.cu
         |              ELSE (COALESCE(u3.cu, 0) * 160000) // (SELECT n_train FROM nn$tag) END AS p_ppm
         |  FROM g
         |  LEFT JOIN tcnt$tag tc USING (h123)
         |  LEFT JOIN bcnt$tag b12 ON g.h12 = b12.h12
         |  LEFT JOIN bcnt$tag b23 ON g.h23 = b23.h12
         |  LEFT JOIN ucnt$tag u2 ON g.h2 = u2.h
         |  LEFT JOIN ucnt$tag u3 ON g.h3 = u3.h),
         |ds$tag AS (
         |  SELECT doc_id, CAST(sum(p_ppm) // count(*) AS BIGINT) AS score_ppm
         |  FROM sc$tag GROUP BY doc_id)""".stripMargin
    s"""WITH t AS (
       |  SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\\s+') AS toks
       |  FROM documents),
       |tp AS (
       |  SELECT doc_id, lang, unnest(range(1, len(toks) - 1)) AS i, toks
       |  FROM t WHERE len(toks) >= 3),
       |g AS MATERIALIZED (
       |  SELECT doc_id, lang,
       |         CAST(concat('0x', substr(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 14)) AS BIGINT) AS h123,
       |         CAST(concat('0x', substr(md5(toks[i] || ' ' || toks[i+1]), 1, 14)) AS BIGINT) AS h12,
       |         CAST(concat('0x', substr(md5(toks[i+1] || ' ' || toks[i+2]), 1, 14)) AS BIGINT) AS h23,
       |         CAST(concat('0x', substr(md5(toks[i+1]), 1, 14)) AS BIGINT) AS h2,
       |         CAST(concat('0x', substr(md5(toks[i+2]), 1, 14)) AS BIGINT) AS h3
       |  FROM tp),
       |${chain("a", "lang = 'en'")},
       |${chain("b", "TRUE")},
       |j AS (
       |  SELECT doc_id, a.score_ppm AS target_ppm, b.score_ppm AS raw_ppm,
       |         a.score_ppm - b.score_ppm AS importance_ppm
       |  FROM dsa a JOIN dsb b USING (doc_id)),
       |sel AS (SELECT * FROM j ORDER BY importance_ppm DESC, doc_id LIMIT 100)
       |SELECT CAST(row_number() OVER (ORDER BY importance_ppm DESC, doc_id) AS BIGINT) AS rank,
       |       doc_id, target_ppm, raw_ppm, importance_ppm
       |FROM sel ORDER BY rank""".stripMargin
  }

  /** The q119 unigram-trainer oracle: seed substring counts, then each
    * EM round restated stage for stage — piece probabilities cnt/T, the
    * Viterbi DP unrolled as one CTE per end position (argmax ties break
    * on start position ascending, matching the engine), the backtrace
    * unrolled as one CTE per segment, usage recount, char re-protection
    * — and the final char-protected prune. Counts are exact integer
    * sums; the DP products are same-order IEEE doubles in both engines.
    * MATERIALIZED throughout (every stage is referenced twice — the BPE
    * oracle's exponential-re-evaluation lesson). */
  private def unigramOracleSql(maxPieceLen: Int, seedTop: Int,
                               emRounds: Int, vocabSize: Int,
                               maxWordLen: Int,
                               encode: Boolean = false): String = {
    def emRound(r: Int): String = {
      val dpStages = (1 to maxWordLen).map { j =>
        val p = j - 1
        s"""d${r}_$j AS MATERIALIZED (
           |  SELECT * FROM d${r}_$p
           |  UNION ALL
           |  SELECT w, $j AS j, sc, back FROM (
           |    SELECT c.w AS w, d.sc * c.p AS sc, c.i AS back,
           |           row_number() OVER (PARTITION BY c.w
           |             ORDER BY d.sc * c.p DESC, c.i) AS rn
           |    FROM piw$r c JOIN d${r}_$p d ON d.w = c.w AND d.j = c.i
           |    WHERE c.j = $j) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      val btStages = (1 to maxWordLen).map { k =>
        val p = k - 1
        s"""bt${r}_$k AS MATERIALIZED (
           |  SELECT b.w AS w, b.freq AS freq,
           |         substr(b.w, d.back + 1, b.pos - d.back) AS piece,
           |         d.back AS pos
           |  FROM bt${r}_$p b JOIN d${r}_$maxWordLen d
           |    ON d.w = b.w AND d.j = b.pos
           |  WHERE b.pos > 0)""".stripMargin
      }.mkString(",\n")
      val usedUnion = (1 to maxWordLen)
        .map(k => s"SELECT piece, freq FROM bt${r}_$k").mkString(" UNION ALL ")
      s"""tt$r AS (SELECT CAST(sum(cnt) AS BIGINT) AS tt FROM v$r),
         |p$r AS MATERIALIZED (
         |  SELECT piece, cnt / (SELECT tt FROM tt$r) AS p FROM v$r),
         |piw$r AS MATERIALIZED (
         |  SELECT s.w, s.freq, s.i, s.j, p.p FROM wsub s JOIN p$r p USING (piece)),
         |d${r}_0 AS (SELECT w, 0 AS j, CAST(1.0 AS DOUBLE) AS sc, -1 AS back FROM words),
         |$dpStages,
         |bt${r}_0 AS (SELECT w, freq, len(w) AS pos FROM words),
         |$btStages,
         |usage$r AS MATERIALIZED (
         |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM ($usedUnion) GROUP BY piece),
         |v${r + 1} AS MATERIALIZED (
         |  SELECT piece, cnt FROM usage$r
         |  UNION ALL
         |  SELECT c.piece, CAST(0 AS BIGINT) AS cnt FROM chars c
         |  WHERE c.piece NOT IN (SELECT piece FROM usage$r))""".stripMargin
    }
    val rounds = (1 to emRounds).map(emRound).mkString(",\n")
    val vf = s"v${emRounds + 1}"
    // Encode tail (q122): one more Viterbi pass under the PRUNED vocab's
    // probabilities (`fin`), per-word piece counts from the backtrace,
    // then the corpus token stream joins the vocab-sized count table and
    // aggregates per doc.
    val encodeDp = (1 to maxWordLen).map { j =>
      val p = j - 1
      s"""de_$j AS MATERIALIZED (
         |  SELECT * FROM de_$p
         |  UNION ALL
         |  SELECT w, $j AS j, sc, back FROM (
         |    SELECT c.w AS w, d.sc * c.p AS sc, c.i AS back,
         |           row_number() OVER (PARTITION BY c.w
         |             ORDER BY d.sc * c.p DESC, c.i) AS rn
         |    FROM piwe c JOIN de_$p d ON d.w = c.w AND d.j = c.i
         |    WHERE c.j = $j) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val encodeBt = (1 to maxWordLen).map { k =>
      val p = k - 1
      s"""bte_$k AS MATERIALIZED (
         |  SELECT b.w AS w, d.back AS pos
         |  FROM bte_$p b JOIN de_$maxWordLen d ON d.w = b.w AND d.j = b.pos
         |  WHERE b.pos > 0)""".stripMargin
    }.mkString(",\n")
    val encodeUnion = (1 to maxWordLen)
      .map(k => s"SELECT w FROM bte_$k").mkString(" UNION ALL ")
    val encodeTail =
      s""",
         |tte AS (SELECT CAST(sum(cnt) AS BIGINT) AS tt FROM fin),
         |pe AS MATERIALIZED (
         |  SELECT piece, cnt / (SELECT tt FROM tte) AS p FROM fin),
         |piwe AS MATERIALIZED (
         |  SELECT s.w, s.i, s.j, p.p FROM wsub s JOIN pe p USING (piece)),
         |de_0 AS (SELECT w, 0 AS j, CAST(1.0 AS DOUBLE) AS sc, -1 AS back FROM words),
         |$encodeDp,
         |bte_0 AS (SELECT w, len(w) AS pos FROM words),
         |$encodeBt,
         |np AS MATERIALIZED (
         |  SELECT w, CAST(count(*) AS BIGINT) AS n_pieces
         |  FROM ($encodeUnion) GROUP BY w),
         |wd AS (SELECT doc_id, unnest(toks) AS w FROM t)
         |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |       CAST(sum(np.n_pieces) AS BIGINT) AS n_pieces,
         |       CAST(sum(len(d.w)) AS BIGINT) AS n_chars
         |FROM wd d JOIN np USING (w)
         |WHERE len(d.w) >= 1 AND len(d.w) <= $maxWordLen
         |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin
    val vocabTail =
      s"""
         |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, piece) AS BIGINT) AS rank,
         |       piece, cnt
         |FROM fin ORDER BY rank""".stripMargin
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents),
       |w0 AS (SELECT unnest(toks) AS w FROM t),
       |words AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM w0
       |  WHERE len(w) >= 1 AND len(w) <= $maxWordLen GROUP BY w),
       |wpos AS (SELECT w, freq, unnest(range(0, len(w))) AS i FROM words),
       |wsub AS MATERIALIZED (
       |  SELECT w, freq, i, i + l AS j, substr(w, i + 1, CAST(l AS INTEGER)) AS piece
       |  FROM (SELECT w, freq, i,
       |               unnest(range(1, 1 + least($maxPieceLen, len(w) - i))) AS l
       |        FROM wpos)),
       |seeds AS MATERIALIZED (
       |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM wsub GROUP BY piece),
       |chars AS MATERIALIZED (SELECT piece, cnt FROM seeds WHERE len(piece) = 1),
       |v1 AS MATERIALIZED (
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rn
       |    FROM seeds) WHERE rn <= $seedTop
       |  UNION
       |  SELECT piece, cnt FROM chars),
       |$rounds,
       |vrank AS MATERIALIZED (
       |  SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rn
       |  FROM $vf),
       |top AS MATERIALIZED (SELECT piece, cnt FROM vrank WHERE rn <= $vocabSize),
       |fin AS MATERIALIZED (
       |  SELECT piece, cnt FROM top
       |  UNION ALL
       |  SELECT v.piece, v.cnt FROM $vf v JOIN chars c ON v.piece = c.piece
       |  WHERE v.piece NOT IN (SELECT piece FROM top))${if (encode) encodeTail else vocabTail}""".stripMargin
  }

  /** The q117 MMR oracle: exact-cosine shortlist + pairwise sims (both
    * converted once to exact e6 integers), then the greedy unrolled as k
    * CTE stages (a1..ak accumulate the selected set; each stage computes
    * max-sim-to-selected for the remaining candidates and picks argmax of
    * the exact BIGINT 7·rel_e6 − 3·ms_e6 with a vec_id tie-break — the
    * rational-λ form that keeps the greedy float-free; a double λ-mix
    * landed on a round-6 half-point boundary where the engines' rounding
    * disagrees). MATERIALIZED on each accumulator stops the doubly-
    * referenced CTE chain from re-evaluating exponentially (the BPE
    * oracle lesson). */
  private def mmrOracleSql(shortlist: Int, k: Int): String = {
    val dotQ = "list_sum([CAST(q.qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) for i in range(1, 65)])"
    val dotP = "list_sum([CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE) for i in range(1, 65)])"
    val stages = (2 to k).map { r =>
      val p = r - 1
      s"""p$r AS (
         |  SELECT c.q_id, c.vec_id, c.rel, c.rel_e6, max(p.sim_e6) AS ms_e6
         |  FROM cand c
         |  JOIN pair p ON p.q_id = c.q_id AND p.a = c.vec_id
         |  JOIN a$p s ON s.q_id = p.q_id AND s.vec_id = p.b
         |  WHERE NOT EXISTS (SELECT 1 FROM a$p x
         |                    WHERE x.q_id = c.q_id AND x.vec_id = c.vec_id)
         |  GROUP BY c.q_id, c.vec_id, c.rel, c.rel_e6),
         |s$r AS (
         |  SELECT q_id, vec_id, rel, rel_e6, score_num,
         |         CAST($r AS BIGINT) AS mmr_rank
         |  FROM (SELECT *, row_number() OVER (PARTITION BY q_id
         |                    ORDER BY score_num DESC, vec_id) AS rn
         |        FROM (SELECT q_id, vec_id, rel, rel_e6,
         |                     7 * rel_e6 - 3 * ms_e6 AS score_num FROM p$r))
         |  WHERE rn = 1),
         |a$r AS MATERIALIZED (SELECT * FROM a$p UNION ALL SELECT * FROM s$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH emb AS (
       |  SELECT vec_id, embedding,
       |         sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) for i in range(1, 65)])) AS nrm
       |  FROM embeddings),
       |q AS (SELECT vec_id AS q_id, embedding AS qv, nrm AS qnrm FROM emb WHERE vec_id < 5),
       |scored AS (
       |  SELECT q.q_id, e.vec_id, e.embedding, e.nrm,
       |         round($dotQ / (q.qnrm * e.nrm), 6) AS rel
       |  FROM emb e CROSS JOIN q WHERE e.vec_id <> q.q_id),
       |sl AS MATERIALIZED (
       |  SELECT q_id, vec_id, embedding, nrm, rel
       |  FROM (SELECT *, row_number() OVER (PARTITION BY q_id
       |                    ORDER BY rel DESC, vec_id) AS rn FROM scored)
       |  WHERE rn <= $shortlist),
       |pair AS MATERIALIZED (
       |  SELECT x.q_id, x.vec_id AS a, y.vec_id AS b,
       |         CAST(round(round($dotP / (x.nrm * y.nrm), 6) * 1000000.0) AS BIGINT) AS sim_e6
       |  FROM sl x JOIN sl y ON x.q_id = y.q_id AND x.vec_id <> y.vec_id),
       |cand AS (SELECT q_id, vec_id, rel,
       |                CAST(round(rel * 1000000.0) AS BIGINT) AS rel_e6 FROM sl),
       |s1 AS (
       |  SELECT q_id, vec_id, rel, rel_e6, score_num,
       |         CAST(1 AS BIGINT) AS mmr_rank
       |  FROM (SELECT *, row_number() OVER (PARTITION BY q_id
       |                    ORDER BY score_num DESC, vec_id) AS rn
       |        FROM (SELECT q_id, vec_id, rel, rel_e6,
       |                     7 * rel_e6 AS score_num FROM cand))
       |  WHERE rn = 1),
       |a1 AS MATERIALIZED (SELECT * FROM s1),
       |$stages
       |SELECT q_id, vec_id, rel, score_num, mmr_rank
       |FROM a$k ORDER BY q_id, mmr_rank""".stripMargin
  }

  private def exactSubstrOracleSql(k: Int): String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, unnest(range(1, len(toks) - ${k - 2})) AS pos, toks
       |  FROM t WHERE len(toks) >= $k),
       |g AS (
       |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       |         CAST(concat('0x', substr(md5(
       |           array_to_string(toks[pos:pos+${k - 1}], ' ')
       |         ), 1, 14)) AS BIGINT) AS h
       |  FROM p),
       |dup AS (SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
       |dp AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (h)),
       |m AS (
       |  SELECT doc_id, pos,
       |         CASE WHEN max(pos) OVER (PARTITION BY doc_id ORDER BY pos
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |              OR pos > max(pos) OVER (PARTITION BY doc_id ORDER BY pos
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + $k
       |              THEN 1 ELSE 0 END AS st
       |  FROM dp),
       |s AS (
       |  SELECT doc_id, pos,
       |         sum(st) OVER (PARTITION BY doc_id ORDER BY pos
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM m),
       |sp AS (
       |  SELECT doc_id, min(pos) AS span_start, max(pos) + ${k - 1} AS span_end
       |  FROM s GROUP BY doc_id, sid)
       |SELECT doc_id, span_start, span_end,
       |       span_end - span_start + 1 AS span_tokens
       |FROM sp ORDER BY doc_id, span_start""".stripMargin

  /** Generates the unrolled n-iteration WordPiece oracle (q107). */
  private def wordpieceOracleSql(n: Int): String = {
    val finals = (1 to n).map { i =>
      s"SELECT CAST($i AS BIGINT) AS step, a AS lhs, b AS rhs, a||b AS merged, cnt AS pair_count, score_e9 FROM m$i"
    }.mkString("\nUNION ALL ")
    s"""${bpeStagesSql(n, wordpiece = true)}
       |$finals
       |ORDER BY step""".stripMargin
  }

  /** The shared WITH-clause prefix for the BPE oracles: word-frequency
    * table, wrapped initial vocab, and the n unrolled
    * (pair-count, argmax, rewrite) stages. MATERIALIZED stops DuckDB
    * re-evaluating each vocab level twice per stage (the naive chain is
    * 2^n). */
  private def bpeStagesSql(n: Int, wordpiece: Boolean = false): String = {
    val stages = (1 to n).map { i =>
      val p = i - 1
      val ranked =
        if (!wordpiece)
          s"m$i AS (SELECT a, b, cnt, CAST(0 AS BIGINT) AS score_e9 FROM p$i ORDER BY cnt DESC, a, b LIMIT 1)"
        else
          s"""u$i AS (SELECT sym, CAST(sum(freq) AS BIGINT) AS u
             |        FROM (SELECT freq, unnest(l) AS sym FROM sy$i) GROUP BY sym),
             |m$i AS (SELECT p.a, p.b, p.cnt,
             |               CAST(round(1e9 * (p.cnt / (ua.u * ub.u))) AS BIGINT) AS score_e9
             |        FROM p$i p JOIN u$i ua ON p.a = ua.sym JOIN u$i ub ON p.b = ub.sym
             |        ORDER BY p.cnt / (ua.u * ub.u) DESC, p.a, p.b LIMIT 1)""".stripMargin
      s"""sy$i AS MATERIALIZED (SELECT string_split(s[2:-2], chr(2)||chr(1)) AS l, freq FROM v$p),
         |p$i AS (
         |  SELECT pr[1] AS a, pr[2] AS b, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (SELECT freq, unnest([ [l[j], l[j+1]] for j in range(1, len(l)) ]) AS pr FROM sy$i)
         |  GROUP BY 1, 2),
         |$ranked,
         |v$i AS MATERIALIZED (SELECT replace(v.s, chr(1)||m.a||chr(2)||chr(1)||m.b||chr(2),
         |                        chr(1)||m.a||m.b||chr(2)) AS s, v.freq
         |         FROM v$p v, m$i m)""".stripMargin
    }.mkString(",\n")
    s"""WITH w AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word FROM documents)
       |  WHERE length(word) > 0 GROUP BY word),
       |v0 AS MATERIALIZED (SELECT list_aggregate(list_transform(string_split(word, ''),
       |         x -> chr(1) || x || chr(2)), 'string_agg', '') AS s, freq FROM w),
       |$stages""".stripMargin
  }

  /** Generates the q127 WordPiece-ENCODE oracle: the q107 unrolled
    * training chain supplies the n merged symbols, the vocabulary is
    * corpus chars ∪ merges, and the greedy longest-match-first walk
    * runs as a recursive CTE over the distinct-word lattice (one state
    * row per consumed piece; a position no piece covers flags the word
    * [UNK] = 1 piece). The piece list rides a single-row LIST so the
    * recursive term needs no aggregate over the recursive relation. */
  private def wordpieceEncodeOracleSql(n: Int, maxWordLen: Int): String = {
    val mergeUnion = (1 to n).map(i => s"SELECT a||b AS piece FROM m$i")
      .mkString(" UNION ")
    s"""${bpeStagesSql(n, wordpiece = true).replaceFirst("WITH ", "WITH RECURSIVE ")},
       |vocab AS (
       |  SELECT DISTINCT x AS piece FROM (SELECT unnest(string_split(word, '')) AS x FROM w)
       |  UNION $mergeUnion),
       |plist AS (SELECT list(piece) AS ps FROM vocab),
       |words AS (SELECT word AS wd FROM w WHERE length(word) <= $maxWordLen),
       |mt AS (
       |  SELECT wd, 0 AS pos, CAST(0 AS BIGINT) AS n, false AS unk FROM words
       |  UNION ALL
       |  SELECT wd,
       |         CASE WHEN l IS NULL THEN pos ELSE pos + l END AS pos,
       |         n + CASE WHEN l IS NULL THEN 0 ELSE 1 END AS n,
       |         l IS NULL AS unk
       |  FROM (
       |    SELECT m.wd, m.pos, m.n,
       |           list_max(list_transform(
       |             list_filter(pl.ps, p -> substr(m.wd, m.pos + 1, length(p)) = p),
       |             p -> length(p))) AS l
       |    FROM mt m, plist pl
       |    WHERE NOT m.unk AND m.pos < length(m.wd))),
       |wres AS (
       |  SELECT wd, max(n) AS np, bool_or(unk) AS unk FROM mt GROUP BY wd),
       |wenc AS (
       |  SELECT wd, CASE WHEN unk THEN 1 ELSE np END AS n_pieces,
       |         CASE WHEN unk THEN 1 ELSE 0 END AS isunk
       |  FROM wres),
       |d AS (SELECT doc_id,
       |             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
       |      FROM documents),
       |dw AS (SELECT doc_id, word FROM d
       |       WHERE length(word) > 0 AND length(word) <= $maxWordLen)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(e.n_pieces) AS BIGINT) AS n_pieces,
       |       CAST(sum(e.isunk) AS BIGINT) AS n_unk,
       |       CAST(sum(length(dw.word)) AS BIGINT) AS n_chars
       |FROM dw JOIN wenc e ON dw.word = e.wd
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Generates the unrolled n-iteration BPE training oracle (q104). */
  private def bpeOracleSql(n: Int): String = {
    val finals = (1 to n).map { i =>
      s"SELECT CAST($i AS BIGINT) AS step, a AS lhs, b AS rhs, a||b AS merged, cnt AS pair_count FROM m$i"
    }.mkString("\nUNION ALL ")
    s"""${bpeStagesSql(n)}
       |$finals
       |ORDER BY step""".stripMargin
  }

  /** Generates the n-merge BPE ENCODE oracle (q105): the same unrolled
    * training chain, then every corpus word folded through the n learned
    * replaces (each m-table is one row, cross-joined in so its pair is a
    * plain column reference) and symbol counts summed per document. */
  private def bpeEncodeOracleSql(n: Int): String = {
    val enc = (1 to n).foldLeft(
      "list_aggregate(list_transform(string_split(word, ''), x -> chr(1) || x || chr(2)), 'string_agg', '')") {
      (acc, i) =>
        s"replace($acc, chr(1)||mm$i.a||chr(2)||chr(1)||mm$i.b||chr(2), chr(1)||mm$i.a||mm$i.b||chr(2))"
    }
    val mrefs = (1 to n).map(i => s"m$i mm$i").mkString(", ")
    s"""${bpeStagesSql(n)},
       |d AS (SELECT doc_id, lang,
       |             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
       |      FROM documents),
       |dw AS (SELECT doc_id, lang, word FROM d WHERE length(word) > 0),
       |e AS (SELECT doc_id, lang, length(word) AS wlen, $enc AS s
       |      FROM dw, $mrefs)
       |SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(wlen) AS BIGINT) AS n_chars,
       |       CAST(sum(length(s) - length(replace(s, chr(1), ''))) AS BIGINT) AS n_bpe_tokens
       |FROM e GROUP BY doc_id, lang
       |ORDER BY doc_id""".stripMargin
  }
}
