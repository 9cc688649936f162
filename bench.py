"""Benchmark harness — driver contract (BASELINE.md).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Each query is executed to completion (count() action — full plan runs,
nothing collected to the driver beyond the count). A warmup pass on
sf0.001 triggers JVM/codegen warmup so measured times reflect steady
state, not first-query startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark import (
    get_spark,
)

HEADLINE = [
    "fusion_minute_avg",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q18_large_orders",
    "correlated_subquery_q17",
    "multiway_join_revenue",
    "decode_json_props",
    "delimited_roundtrip",
    "date_histogram_daily",
    "topk_orders",
    "window_lag_delta",
    "latest_event_per_user",
    "sessionize_events",
    "asof_purchase_attribution",
    "funnel_conversion",
    "order_count_distribution",
    "doc_token_counts",
    "exact_dedup_docs",
    "embedding_topk_cosine",
    "kmeans_iteration",
    "minhash_dedup_pairs",
    "simhash_candidates",
    "multimodal_image_features",
    "stratified_split",
    "pack_token_budget",
    "price_band_join",
    "corpus_pipeline_end2end",
    "cdc_merge_snapshot",
    "event_cooccurrence",
    "range_frame_rolling",
    "vocab_top_terms",
    "salted_join_parity",
    "cohort_retention",
    "streaming_minute_counts",
    "streaming_session_rollup",
    "streaming_enriched_counts",
    "hypertable_rollup",
    "partition_pruned_scan",
    "lsh_bucket_verified",
    "pq_adc_verified",
    "tpch_q12_priority_shipmode",
    "tpch_q14_promo_share",
    "tpch_q19_disjunctive_join",
    "tpch_q7_volume_shipping",
    "tpch_q10_returned_items",
    "data_quality_report",
    "quality_gate_routing",
    "fk_integrity_report",
    "interpolate_hourly",
    "winnowing_fingerprints",
    "winnowing_fingerprints_fast",
    "multi_query_topk",
    "hashed_doc_vectors",
    "temperature_resample",
    "tpch_q5_local_supplier_volume",
    "tpch_q9_product_type_profit",
    "cms_heavy_hitters",
    "pagerank_user_graph",
    "tfidf_top_terms",
    "dsir_importance_weights",
    "bottomk_sample",
    "bm25_search",
    "kmv_distinct_rollup",
    "token_entropy_docs",
    "time_weighted_avg",
    "pareto_front_orders",
    "regression_stats_by_type",
    "ohlc_downsample",
    "asof_next_purchase",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    qs = entrymod.queries()

    # warmup: tiny sf, every headline query once (JVM + codegen caches)
    for name in HEADLINE:
        try:
            qs[name](spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass

    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
