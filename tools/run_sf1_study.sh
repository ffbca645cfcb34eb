#!/bin/bash
# sf1 scale study: lineitem-, events-, and documents/embeddings-family
# query subsets at
# sf1 (tools/make_sf1.py output) vs sf0.1, each in a fresh JVM.
# Results land in /tmp/sf1_study/*.json; compose with
# tools/compose_sf1_artifact.py.
set -e
mkdir -p /tmp/sf1_study

LI="spend_decile_profile,q1_pricing_summary,q3_shipping_priority,q5_local_supplier_volume,q6_forecast_revenue,q10_returned_items,q14_promo_revenue_share,q19_disjunctive_predicates,semi_join_customers_with_orders,anti_join_customers_without_orders,window_topk_orders_per_customer,window_running_revenue,rollup_lineitem_status,cube_lineitem_flag_status,pivot_returnflag_by_status,setop_active_1996_not_1997,distinct_parts_per_brand,approx_distinct_custkeys,q2_min_cost_supplier,q4_late_shipment_priority,q7_volume_shipping,q8_national_market_share,q9_product_type_profit,q11_important_stock,q12_priority_by_linestatus,q13_customer_order_distribution,q15_top_supplier,q16_parts_supplier_relationship,q17_small_quantity_revenue,q18_large_volume_orders,q20_potential_part_promotion,q21_suppliers_kept_waiting,q22_idle_high_balance_customers,window_range_frame_revenue,udaf_weighted_revenue_cents,corr_qty_price_exact_moments,percentile_order_values,mad_outlier_stats,hll_sketch_union_contract,unpivot_lineitem_measures,order_priority_mode_stats,returnflag_linestatus_chisq_cells,nation_order_gini,bitmap_distinct_suppliers_by_brand,basket_brand_pairs,brand_affinity_triangles,ols_price_on_quantity,nation_revenue_share,order_rank_distribution,priority_listagg_by_status,grouping_sets_flag_status"

EV="cdc_seq_inversion_stats,json_extract_events_props,variant_props_stats,asof_latest_order_at_event,asof_next_event_after_order,cdc_change_stats,cdc_change_stats_reconstructed,cdc_change_stats_typed,cdc_decimal_fidelity,cdc_snapshot_at,cdc_squash_net_changes,cdc_unmarshall_roundtrip,claim_check_pointer_stats,event_transition_matrix,gapfill_hourly_user_activity,pk_filter_prefix_counts,publish_route_counts,quarantine_stats,range_join_clicks_after_errors,rollup_daily_from_hourly,session_window_stats,sessionize_events,ttl_expiry_removes,tumbling_window_counts,udtf_changed_path_stats,weekly_retention_cohorts,user_daily_streaks,peak_concurrent_sessions,sliding_distinct_users_3h,event_type_pagerank,attribution_last_touch,session_path_trigrams,funnel_conversion_steps,funnel_time_to_convert,ewma_revenue_trend,value_histogram_events,time_weighted_avg_value,profile_event_columns,hopping_window_counts,approx_topk_event_types_contract,rolling_zscore_daily_revenue,cdc_snapshot_diff,cusum_revenue_changepoint,ab_test_conversion_zscore,user_activity_similarity_topk"

DOC="dedup_exact_groups,near_dup_minhash_pairs,near_dup_simhash_pairs,doc_signatures,text_quality_stats,lang_id_confusion,embedding_cosine_topk,embedding_ann_topk,embedding_ivf_topk,media_metadata,media_frame_sample,token_counts_bpeish,near_dup_embedding_pairs,chunk_documents,sql_surface_identical_text,dedup_clusters,decontam_eval_overlap,pack_training_sequences,stratified_sample_by_lang,pii_scrub_stats,vocab_top_terms_by_lang,weighted_sample_by_length,tfidf_top_terms,curate_corpus_dispositions,near_dup_ngram_jaccard,repetition_stats,boilerplate_ngram_stats,media_transform_stats,inverted_index_search,near_dup_containment_pairs,doc_commonness_score"

cd /root/repo
for fam in LI EV DOC; do
  case "$fam" in
    LI) Q="$LI";; EV) Q="$EV";; DOC) Q="$DOC";;
  esac
  for dir in /root/repo/sf1 /root/testdata/sf0.1; do
    tag=$(basename "$dir")
    out="/tmp/sf1_study/${fam}_${tag}.json"
    echo "=== $fam @ $tag"
    SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_QUERIES="$Q" \
      python bench.py > "$out" 2>"/tmp/sf1_study/${fam}_${tag}.err"
  done
done
echo DONE
