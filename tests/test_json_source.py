"""O1-O3: JSON ingest — array file, malformed-record drop (SURVEY §2)."""

from __future__ import annotations

import json

from flink_start_spark.sources.json_activity import read_user_activity_json

SAMPLE = [
    {"userId": "bob", "activity": "register", "timestamp": "2025-08-03T13:00:02Z"},
    {"userId": "sam", "activity": "online", "timestamp": "2025-08-03T13:00:03Z"},
    # missing userId → dropped (reference package.scala:29-31)
    {"activity": "register", "timestamp": "2025-08-03T13:00:04Z"},
    # unparseable timestamp → dropped
    {"userId": "eve", "activity": "register", "timestamp": "not-a-time"},
]


def test_json_array_ingest_drops_malformed(spark, tmp_path):
    p = tmp_path / "activity.json"
    p.write_text(json.dumps(SAMPLE))
    df = read_user_activity_json(spark, str(p))
    rows = df.collect()
    assert [r["user_id"] for r in rows] == ["bob", "sam"]
    assert [r["arrival"] for r in rows] == [1, 2]
    assert df.schema["ts"].dataType.typeName() == "timestamp"
