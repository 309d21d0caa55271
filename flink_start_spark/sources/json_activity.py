"""User-activity JSON ingest (SURVEY O1-O4).

The reference reads a JSON-array file, splits it with a regex, extracts
three fields with another regex, drops records missing ``userId``, and
parses ISO-8601 event time per record
(/root/reference/src/main/scala/generators/useractivity/package.scala:19-48).

Spark-first replacement: one declarative pipeline —
``from_json`` with an explicit schema (O2), a null-filter for malformed /
incomplete records (O3), ``to_timestamp`` for event-time extraction (O4)
— all JVM-side, whole-stage-codegen'd, no Python in the loop. The
reference's 100 ms-per-event pacing (package.scala:57-59) is a tutorial
throughput limiter, not engine semantics; streaming tests reproduce pacing
with ``maxFilesPerTrigger`` instead (see flink_start_spark.streaming).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_start_spark.schemas import USER_ACTIVITY_RAW

#: The reference's 12-event sample, verbatim semantics
#: (/root/reference/src/main/resources/user_activity_sample.json:2-13;
#: tabulated in FIXTURES.md F1). Arrival = file order, 1-based.
_FIXTURE_ROWS = [
    (1, "bob", "register", "2025-08-03T13:00:02Z"),
    (2, "bob", "online", "2025-08-03T13:00:02Z"),
    (3, "sam", "register", "2025-08-03T13:00:03Z"),
    (4, "sam", "online", "2025-08-03T13:00:04Z"),
    (5, "rob", "register", "2025-08-03T13:00:04Z"),
    (6, "alice", "register", "2025-08-03T13:00:04Z"),
    (7, "mary", "register", "2025-08-03T13:00:06Z"),
    (8, "mary", "online", "2025-08-03T13:00:06Z"),
    (9, "carl", "register", "2025-08-03T13:00:08Z"),
    (10, "rob", "online", "2025-08-03T13:00:10Z"),
    (11, "alice", "online", "2025-08-03T13:00:10Z"),
    (12, "carl", "online", "2025-08-03T13:00:10Z"),
]


def user_activity_fixture(spark: SparkSession) -> DataFrame:
    """The canonical 12-event fixture as a typed DataFrame (FIXTURES F1)."""
    df = spark.createDataFrame(
        _FIXTURE_ROWS, schema="arrival long, user_id string, activity string, ts_raw string"
    )
    return df.select(
        "arrival", "user_id", "activity", F.to_timestamp("ts_raw").alias("ts")
    )


def _peek_is_json_array(path: str) -> bool:
    """True when the first non-whitespace byte of the first local file
    under ``path`` is '[' (the reference's single-JSON-array layout).
    Remote URIs (unreadable driver-side) default to False — JSON-lines
    is the layout Spark natively splits and streams at scale."""
    candidates = [path]
    if os.path.isdir(path):
        candidates = sorted(
            f
            for f in (os.path.join(path, x) for x in os.listdir(path))
            if os.path.isfile(f)
        )
    for f in candidates:
        try:
            with open(f, "rb") as fh:
                while True:
                    chunk = fh.read(4096)
                    if not chunk:
                        break
                    stripped = chunk.lstrip()
                    if stripped:
                        return stripped[:1] == b"["
        except OSError:
            return False
    return False


def read_user_activity_json(spark: SparkSession, path: str) -> DataFrame:
    """Read a user-activity JSON file into the typed schema.

    Handles both JSON-lines and the reference's single JSON-array layout
    (package.scala:45-48 splits the array by regex) by PEEKING at the
    first byte: ``multiLine`` is only set for the array form, because
    with it Spark parses ONE top-level value per file — applied to a
    JSON-lines input it would silently keep just the first record.
    Malformed objects and records missing any of the three fields are
    dropped, matching the reference's filter at package.scala:29-31 —
    but expressed as a null-filter the optimizer can reason about
    rather than imperative parsing.
    """
    reader = spark.read.schema(USER_ACTIVITY_RAW)
    if _peek_is_json_array(path):
        reader = reader.option("multiLine", "true")
    raw = reader.json(path)
    typed = raw.select(
        F.col("userId").alias("user_id"),
        F.col("activity"),
        # try_to_timestamp: malformed event times become NULL and are
        # dropped below (ANSI-safe form of the reference's parse-or-skip,
        # package.scala:60-61).
        F.try_to_timestamp(F.col("timestamp")).alias("ts"),
    ).filter(
        F.col("user_id").isNotNull()
        & F.col("activity").isNotNull()
        & F.col("ts").isNotNull()
    )
    # Arrival order (needed only by the count-trigger operator O13). A
    # global row_number is a deliberate single-partition operation — the
    # reference's GlobalWindows likewise forces parallelism 1; at scale the
    # arrival index would come from the source (e.g. kafka offset), never
    # be recomputed. monotonically_increasing_id is not contiguous, so
    # rank it.
    w = Window.orderBy(F.monotonically_increasing_id())
    return typed.withColumn("arrival", F.row_number().over(w).cast("long"))
