"""Adversarial-corpus oracle gate: degenerate-but-in-contract rows
(empty / whitespace / unicode / control-char / pathological texts,
zero-norm and huge embeddings, NULL user_ids, malformed JSON props,
fractional-second timestamps) run through a representative catalog
subset with FULL Spark-vs-DuckDB parity — the cases the generated
corpus can never exercise. The full-catalog sweep is
`python scripts/crosscheck.py $(python scripts/make_adversarial.py)`
(135/135 as of round 6); this pytest keeps a fast cross-family
subset in the default gate so regressions surface immediately.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from make_adversarial import build  # noqa: E402
from crosscheck import TABLES, _normalize  # noqa: E402

from flink_start_spark.plans import QUERIES  # noqa: E402

#: One query per failure class the adversarial corpus caught in round 6,
#: plus one per major family.
_SUBSET = [
    "multimodal_binary_meta",      # bytes-vs-chars first_byte
    "multimodal_real_decode",      # byte-based PCM synth
    "multimodal_image_decode",     # byte-based PPM raster synth
    "multimodal_resample",         # byte count in resampled header
    "lang_centroid_outliers",      # quantization clamp (ANSI overflow)
    "kmeans_clusters",             # same clamp in Lloyd rounds
    "props_json_metrics",          # json_valid oracle guard
    "pandas_udaf_weighted_value",  # json guard + NULL-weight group
    "approx_metrics",              # small-n sketch band
    "repetition_stats",            # empty/whitespace text
    "dedup_minhash_lsh",           # exact/near dups + unicode shingles
    "bpe_merges",                  # control chars incl chr(1)/chr(2)
    "token_frequencies",           # space-run tokenization contract
    "pii_scan",                    # PII-bearing + metachar text
    "host_blocklist_audit",        # derived URLs from unicode langs
    "ann_cosine_topk",             # zero-norm cosine NULL parity
]


@pytest.fixture(scope="module")
def adv_dir(spark, tmp_path_factory):
    return build(str(tmp_path_factory.mktemp("sf_adv")), spark=spark)


@pytest.fixture(scope="module")
def adv_con(adv_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(adv_dir, t + '.parquet')}')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _SUBSET)
def test_adversarial_oracle_parity(spark, adv_dir, adv_con, name):
    import pandas as pd

    q = QUERIES[name]
    s = _normalize(q.spark(spark, adv_dir).toPandas())
    o = _normalize(adv_con.execute(q.oracle).df())
    assert list(s.columns) == list(o.columns), name
    pd.testing.assert_frame_equal(
        s, o, check_dtype=False, rtol=0, atol=1e-6
    )
