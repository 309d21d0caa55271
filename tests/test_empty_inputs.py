"""Empty-input robustness: every operator family must return an empty
result (not crash) on zero-row tables with the production schema.

At 100 TB empty inputs are routine — a partition-pruned scan, a new
tenant, a filter that matches nothing feeding a downstream operator.
Window functions over empty frames, LSH self-joins with no rows, and
the iterative component loop must all degrade to zero rows.
"""

from __future__ import annotations

import pytest

from flink_start_spark.plans import QUERIES
from flink_start_spark.sources.catalog import load_tables

from tests.conftest import SF_SMOKE

#: One query per operator family (windows, sessions, TPC-H agg, as-of,
#: LSH dedup, winnowing, ANN, generator, iterative components).
_REPRESENTATIVE = [
    "tumbling_signup_count",
    "session_windows_per_user",
    "pricing_summary",
    "asof_latest_order_per_event",
    "dedup_minhash_lsh",
    "winnowing_shared_pairs",
    "ann_cosine_topk",
    "token_frequencies",
    "dedup_clusters",
    "train_val_split",
    # round 3 families: real decode, novelty, reservoir, layout, int8
    "multimodal_real_decode",
    "ngram_novelty",
    "weighted_reservoir_sample",
    "zorder_locality_stats",
    "embedding_quantization_audit",
    "curation_audit",
    "passage_dedup",
    "semdedup_flags",
    "kmeans_clusters",
    "vocab_oov_stats",
    "multimodal_frame_sample",
    "multimodal_resample",
    # round 7: real PPM image decode (replaced the sha256 placeholder)
    "multimodal_image_decode",
    "shard_manifest",
    # round 4 families: two-phase selection (single-rank, multi-rank,
    # global rank + ntile, un-keyed rank+sum, prefix sum) and the
    # overlapping-gram repeat scan
    "value_outliers_mad",
    "quality_quartiles",
    "curriculum_buckets",
    "count_trigger_cumulative",
    "sequence_packing",
    "repeated_ngram_flags",
    "quality_classifier_score",
    "source_mixture_weights",
    "cross_source_overlap",
    "cluster_cap_sample",
    "customer_order_distribution",
    "large_volume_orders",
    "fuzzy_customer_pairs",
    "daily_revenue_gapfill",
    "ppjoin_exact_pairs",
    "unigram_logprob_score",
    "incremental_dedup_delta",
    "curriculum_buckets",
    "sorted_neighborhood_pairs",
    "pmi_collocations",
    "revenue_grouping_sets",
    "monthly_revenue_trend",
    "last_touch_attribution",
    "three_step_funnel",
    # round 4 additions: TPC-H completion family (semi+anti chain,
    # 1-row-broadcast scalar shapes) + chunking / boilerplate /
    # purity-audit pipeline stages
    "nation_market_share",
    "top_supplier_revenue",
    "suppliers_kept_orders_waiting",
    "dormant_customer_balance",
    "doc_chunking",
    "boilerplate_removal",
    "knn_label_purity",
    # round 4 CDC/graph/tokenizer-apply families: change-interval
    # windows, full-outer snapshot diff, iterative pagerank rounds, and
    # the 6-fold encode chain must all degrade to zero rows
    "scd2_order_status_history",
    "scd2_snapshot_at",
    "snapshot_diff_changeset",
    "pagerank_copurchase",
    "bpe_token_stats",
    "contrastive_triplets",
    # monitoring family (ab_test_zscore and peak_concurrent_sessions are
    # excluded: a global no-groupBy aggregate emits one all-null row on
    # empty input by SQL semantics — identically on both engines)
    "feature_drift_psi",
    "revenue_anomaly_days",
    "similar_revenue_weeks",
    # round 5 families: per-document pack layout (un-keyed prefix sum
    # over zero rows), bigram LM, per-source KL
    "pack_layout",
    "bigram_logprob_score",
    "source_token_kl",
    # round 6: host census + blocklist filter (groupBy host over zero
    # docs must yield zero hosts, not a null-host row)
    "host_blocklist_audit",
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("sf_empty")
    for name, df in load_tables(spark, SF_SMOKE).items():
        df.limit(0).write.parquet(str(out / f"{name}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", _REPRESENTATIVE)
def test_query_on_empty_tables_returns_no_rows(spark, empty_sf_dir, name):
    df = QUERIES[name].spark(spark, empty_sf_dir)
    assert df.count() == 0, name
