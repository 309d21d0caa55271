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


def test_json_lines_layout_reads_all_records(spark, tmp_path):
    """JSON-lines input must yield every record: with a blanket
    multiLine=true Spark would parse one top-level value per file and
    silently truncate the input to its first row."""
    import json as _json

    from flink_start_spark.sources.json_activity import read_user_activity_json

    rows = [
        {"userId": f"u{i}", "activity": "login",
         "timestamp": f"2025-08-03T13:00:{i:02d}Z"}
        for i in range(12)
    ]
    p = tmp_path / "lines.json"
    p.write_text("\n".join(_json.dumps(r) for r in rows))
    got = read_user_activity_json(spark, str(p))
    assert got.count() == 12
    assert [r["user_id"] for r in got.orderBy("arrival").collect()] == [
        f"u{i}" for i in range(12)
    ]
