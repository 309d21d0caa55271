"""Monitoring & experimentation analytics: distribution-drift PSI,
A/B-test inference, rolling anomaly detection.

Reference parity note: the reference (mainul098/flink-start) counts
events in windows (FlinkWindowLearning.scala); monitoring what those
counts MEAN over time — has the feature distribution drifted? did the
experiment arm move the metric? is today an outlier against the
trailing week? — is the next layer every production event pipeline
adds. All three are oracle-paired and engine-exact:

- PSI terms are integer-quantized (``floor(x * 2^20)``, the
  unigram_logprob/k-means trick) so the per-type sum commutes;
- the A/B z-score is computed from exact integer counts with one
  IEEE-exact sqrt at the end;
- the rolling z-score is derived ENTIRELY from exact integer window
  sums (cents and cents², decimal-held) with one final
  double-convert + sqrt — this matters because double window SUMS are
  association-sensitive (Spark iterates sliding frames, DuckDB uses
  segment trees; same 7 values, different grouping, last-ulp drift
  that round() cannot always hide). Integer sums have one answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_start_spark import cache as C
from flink_start_spark.functions.texthash import md5_bucket
from flink_start_spark.plans.catalog import _register
from flink_start_spark.plans.pipeline import _bucket_sql
from flink_start_spark.sources.catalog import load_table

_QUANT = 1 << 20

#: drift windows: reference = first half of the event month, current =
#: second half (same cut as snapshot_diff_changeset)
_REF = ("2024-01-01 00:00:00", "2024-01-16 00:00:00")
_CUR = ("2024-01-16 00:00:00", "2024-02-01 00:00:00")

#: fixed value bins: 8 × width 75 clamped to [0, 600) — fixed-width
#: (not quantile) bins keep the binning a pure projection, deterministic
#: at any scale, and identical across engines
_N_BINS, _BIN_W = 8, 75.0


@_register(
    "feature_drift_psi",
    f"""
    WITH e AS (
      SELECT event_type,
             least({_N_BINS - 1}, greatest(0, floor(value / {_BIN_W})))::BIGINT AS bin,
             (ts >= TIMESTAMP '{_REF[0]}' AND ts < TIMESTAMP '{_REF[1]}') AS in_ref,
             (ts >= TIMESTAMP '{_CUR[0]}' AND ts < TIMESTAMP '{_CUR[1]}') AS in_cur
      FROM events WHERE value IS NOT NULL),
    c AS (
      SELECT event_type, bin,
             count_if(in_ref) AS n_ref, count_if(in_cur) AS n_cur
      FROM e GROUP BY 1, 2),
    t AS (
      SELECT event_type, sum(n_ref) AS tot_ref, sum(n_cur) AS tot_cur
      FROM c GROUP BY 1),
    spine AS (
      SELECT t.event_type, b.bin, t.tot_ref, t.tot_cur
      FROM t, (SELECT unnest(range({_N_BINS})) AS bin) b),
    j AS (
      SELECT s.event_type, s.tot_ref, s.tot_cur,
             COALESCE(c.n_ref, 0) AS n_ref, COALESCE(c.n_cur, 0) AS n_cur
      FROM spine s LEFT JOIN c ON c.event_type = s.event_type AND c.bin = s.bin),
    q AS (
      SELECT event_type, tot_ref, tot_cur,
             ((n_ref + 1)::DOUBLE / (tot_ref + {_N_BINS})) AS p,
             ((n_cur + 1)::DOUBLE / (tot_cur + {_N_BINS})) AS q
      FROM j),
    terms AS (
      SELECT event_type, tot_ref, tot_cur,
             floor((p - q) * {_QUANT})::BIGINT AS dp,
             floor((ln(p) - ln(q)) * {_QUANT})::BIGINT AS dl
      FROM q)
    SELECT event_type,
           round(sum(dp * dl)::DOUBLE / {_QUANT}::DOUBLE / {_QUANT}::DOUBLE, 6) AS psi,
           min(tot_ref)::BIGINT AS n_ref,
           min(tot_cur)::BIGINT AS n_cur
    FROM terms GROUP BY event_type
    """,
    description=(
        "Population-stability-index drift monitor: per event type, PSI "
        "of the value distribution between the first and second half of "
        "the month over 8 fixed-width bins with Laplace smoothing "
        "(+1/bin, so empty bins contribute finitely). The per-bin terms "
        "(Δp·Δln) are integer-quantized at 2^20 before summing — 8 "
        "doubles summed in engine-chosen order would drift in the last "
        "ulp; integer products have one sum. One scan, one (type,bin) "
        "groupBy with map-side collapse, a 40-row spine join."
    ),
    tags=("monitoring", "extension", "pipeline"),
)
def q_feature_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(F.col("value").isNotNull())
    in_w = lambda lo, hi: (  # noqa: E731
        (F.col("ts") >= F.lit(lo).cast("timestamp"))
        & (F.col("ts") < F.lit(hi).cast("timestamp"))
    )
    e = ev.select(
        "event_type",
        # clamp BOTH edges (out-of-range mass lands in the edge bins,
        # matching the streaming twin's np.clip — a one-sided clamp
        # would count negatives in the totals yet drop them from the
        # 0..N-1 spine, deflating every probability)
        F.least(
            F.lit(_N_BINS - 1),
            F.greatest(F.lit(0), F.floor(F.col("value") / _BIN_W)),
        ).cast("long").alias("bin"),
        in_w(*_REF).alias("in_ref"),
        in_w(*_CUR).alias("in_cur"),
    )
    # tracked: both the totals (t) and the spine join read this
    # aggregate — unpersisted, the events scan + histogram groupBy runs
    # twice per action (repo-wide shared-subtree rule)
    c = C.track(
        e.groupBy("event_type", "bin").agg(
            F.count_if("in_ref").alias("n_ref"), F.count_if("in_cur").alias("n_cur")
        )
    )
    t = c.groupBy("event_type").agg(
        F.sum("n_ref").alias("tot_ref"), F.sum("n_cur").alias("tot_cur")
    )
    spine = t.select(
        "event_type",
        "tot_ref",
        "tot_cur",
        F.explode(F.sequence(F.lit(0), F.lit(_N_BINS - 1))).alias("bin"),
    )
    j = spine.join(c, ["event_type", "bin"], "left").select(
        "event_type",
        "tot_ref",
        "tot_cur",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    p = (F.col("n_ref") + 1).cast("double") / (F.col("tot_ref") + _N_BINS)
    q = (F.col("n_cur") + 1).cast("double") / (F.col("tot_cur") + _N_BINS)
    terms = j.select(
        "event_type",
        "tot_ref",
        "tot_cur",
        F.floor((p - q) * _QUANT).cast("long").alias("dp"),
        F.floor((F.log(p) - F.log(q)) * _QUANT).cast("long").alias("dl"),
    )
    return terms.groupBy("event_type").agg(
        F.round(
            F.sum(F.col("dp") * F.col("dl")).cast("double") / _QUANT / _QUANT, 6
        ).alias("psi"),
        F.min("tot_ref").cast("long").alias("n_ref"),
        F.min("tot_cur").cast("long").alias("n_cur"),
    )


@_register(
    "ab_test_zscore",
    f"""
    WITH arms AS (
      SELECT user_id,
             {_bucket_sql("user_id::VARCHAR", 2)} AS arm,
             CASE WHEN count_if(event_type = 'purchase') >= 12 THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY 1),
    s AS (
      SELECT count_if(arm = 0)::BIGINT AS n_a,
             count_if(arm = 1)::BIGINT AS n_b,
             sum(CASE WHEN arm = 0 THEN converted ELSE 0 END)::BIGINT AS conv_a,
             sum(CASE WHEN arm = 1 THEN converted ELSE 0 END)::BIGINT AS conv_b
      FROM arms),
    r AS (
      SELECT *,
             CASE WHEN n_a > 0 THEN conv_a / n_a::DOUBLE END AS pa,
             CASE WHEN n_b > 0 THEN conv_b / n_b::DOUBLE END AS pb,
             CASE WHEN n_a > 0 AND n_b > 0
                  THEN ((conv_a + conv_b) / (n_a + n_b)::DOUBLE)
                       * (1 - (conv_a + conv_b) / (n_a + n_b)::DOUBLE)
                       * (1.0 / n_a + 1.0 / n_b) END AS var
      FROM s)
    SELECT n_a, n_b, conv_a, conv_b,
           round(pa, 6) AS p_a,
           round(pb, 6) AS p_b,
           CASE WHEN var > 0 THEN round((pa - pb) / sqrt(var), 6) END AS z_score
    FROM r
    """,
    description=(
        "Two-proportion z-test over a deterministic experiment split: "
        "users assigned to arms by md5(user_id) % 2 (the portable "
        "bucket idiom), per-user conversion = ≥12 purchase events (a "
        "mid-prevalence metric; 'any purchase' saturates at 100% on "
        "this corpus and degenerates the pooled variance), pooled-"
        "variance z-score for the rate difference, NULL when an arm is "
        "empty or the variance is 0 (both engines agree on the guard "
        "instead of one raising and one emitting inf). One user-keyed "
        "groupBy (unbounded key) collapses events to flags; the rest "
        "is a single global aggregate producing exact integer counts — "
        "every double op after that is a fixed expression over "
        "identical integers, so the score is engine-exact."
    ),
    tags=("monitoring", "extension", "sql"),
)
def q_ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    arm = md5_bucket(F.col("user_id"), 2)
    arms = ev.groupBy("user_id").agg(
        F.when(
            F.count_if(F.col("event_type") == "purchase") >= 12, 1
        ).otherwise(0).alias("converted")
    ).select(arm.alias("arm"), "converted")
    s = arms.agg(
        F.count_if(F.col("arm") == 0).alias("n_a"),
        F.count_if(F.col("arm") == 1).alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_b"),
    )
    pa = F.when(
        F.col("n_a") > 0, F.col("conv_a") / F.col("n_a").cast("double")
    )
    pb = F.when(
        F.col("n_b") > 0, F.col("conv_b") / F.col("n_b").cast("double")
    )
    pool = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    var = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        pool * (1 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")),
    )
    z = F.when(var > 0, F.round((pa - pb) / F.sqrt(var), 6))
    return s.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(pa, 6).alias("p_a"),
        F.round(pb, 6).alias("p_b"),
        z.alias("z_score"),
    )


#: daily revenue in exact integer cents — the shared rollup both
#: monitoring time-series queries build on. The cents quantization is a
#: correctness contract (integer window sums are the engine-exactness
#: mechanism), so it lives in ONE place, Spark and SQL alike.
_DAILY_CENTS_CTE = """daily AS (
      SELECT o_orderdate AS d,
             (round(sum(CAST(o_totalprice AS DECIMAL(20,6))), 2) * 100)::BIGINT AS cents
      FROM orders GROUP BY 1)"""


def _daily_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return o.groupBy(F.col("o_orderdate").alias("d")).agg(
        (F.round(F.sum(F.col("o_totalprice").cast("decimal(20,6)")), 2) * 100)
        .cast("long")
        .alias("cents")
    )


@_register(
    "revenue_anomaly_days",
    f"""
    WITH {_DAILY_CENTS_CTE},
    w AS (
      SELECT d, cents,
             count(*) OVER win AS n,
             sum(cents) OVER win AS sx,
             sum(CAST(cents AS DECIMAL(38,0)) * cents) OVER win AS sx2
      FROM daily
      WINDOW win AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
    SELECT floor(epoch(d))::BIGINT AS day_epoch,
           round(cents / 100.0, 2) AS revenue,
           CASE WHEN n = 7 AND (n * sx2 - CAST(sx AS DECIMAL(38,0)) * sx) > 0
                THEN round((n * cents - sx)::DOUBLE
                           / sqrt((n * sx2 - CAST(sx AS DECIMAL(38,0)) * sx)::DOUBLE), 6)
           END AS z_score,
           (n = 7 AND (n * sx2 - CAST(sx AS DECIMAL(38,0)) * sx) > 0
            AND abs((n * cents - sx)::DOUBLE
                    / sqrt((n * sx2 - CAST(sx AS DECIMAL(38,0)) * sx)::DOUBLE)) > 2.0)
             AS is_anomaly
    FROM w
    """,
    description=(
        "Rolling anomaly detection over the daily revenue series: "
        "z-score of each day against its trailing 7-day window "
        "(population form, derived as (n·x−Σx)/sqrt(n·Σx²−(Σx)²) so "
        "EVERY window aggregate is an exact integer in cents — double "
        "window sums are association-sensitive across engines (sliding-"
        "frame iteration vs segment trees), integer sums are not; the "
        "single double conversion + sqrt at the end is IEEE-exact. "
        "Warm-up days (n<7) and constant weeks emit null. The window "
        "rides the daily rollup spine — O(days-in-range) rows, bounded "
        "by the calendar, not the corpus."
    ),
    tags=("monitoring", "extension", "window-frame"),
)
def q_revenue_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_cents(spark, sf_dir)
    win = Window.orderBy("d").rowsBetween(-6, 0)
    w = daily.select(
        "d",
        "cents",
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum("cents").over(win).alias("sx"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .over(win)
        .alias("sx2"),
    )
    rad = F.col("n") * F.col("sx2") - F.col("sx").cast("decimal(38,0)") * F.col("sx")
    z = (F.col("n") * F.col("cents") - F.col("sx")).cast("double") / F.sqrt(
        rad.cast("double")
    )
    ok = (F.col("n") == 7) & (rad > 0)
    return w.select(
        F.col("d").cast("long").alias("day_epoch"),
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
        F.when(ok, F.round(z, 6)).alias("z_score"),
        (ok & (F.abs(z) > 2.0)).alias("is_anomaly"),
    )


@_register(
    "similar_revenue_weeks",
    f"""
    WITH {_DAILY_CENTS_CTE},
    w AS (
      SELECT d, list(cents) OVER win AS arr, count(*) OVER win AS n
      FROM daily
      WINDOW win AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
    z AS (
      SELECT d, row_number() OVER (ORDER BY d) AS idx, arr,
             list_sum(arr)::DOUBLE / 7 AS m,
             list_sum(list_transform(arr, x -> (x - list_sum(arr)::DOUBLE / 7)
                                             * (x - list_sum(arr)::DOUBLE / 7)))::DOUBLE / 7 AS var
      FROM w WHERE n = 7),
    zn AS (
      SELECT d, idx, list_transform(arr, x -> (x - m) / sqrt(var)) AS zv
      FROM z WHERE var > 0),
    pat AS (SELECT idx AS pidx, zv AS pzv FROM zn ORDER BY d DESC LIMIT 1),
    dist AS (
      SELECT zn.d,
             round(list_sum(list_transform(range(1, 8),
                     i -> (zn.zv[i] - pat.pzv[i]) * (zn.zv[i] - pat.pzv[i]))), 6) AS zdist
      FROM zn, pat
      WHERE zn.idx <= pat.pidx - 7)
    SELECT floor(epoch(d))::BIGINT AS window_end_epoch, zdist,
           row_number() OVER (ORDER BY zdist, d) AS rank
    FROM dist
    ORDER BY zdist, d
    LIMIT 10
    """,
    description=(
        "Time-series subsequence similarity search (the matrix-profile/"
        "MASS family; streaming time-series similarity is EDBT'19 in "
        "PAPERS.md): the 10 historical 7-day revenue windows whose "
        "Z-NORMALIZED shape best matches the latest full week — 'when "
        "did revenue look like this week?'. Windows ride the daily "
        "rollup spine (calendar-bounded); the query pattern is a 1-row "
        "broadcast; z-normalization and the squared distance are fixed "
        "formulas over exact integer cents, and the distance fold is "
        "fixed-order (zip_with + aggregate == list_sum), so ranking is "
        "engine-exact after rounded-before-rank. Trivial self-matches "
        "are excluded by a ROW-based overlap guard (the candidate must "
        "end at least 7 spine rows before the pattern — calendar gaps "
        "cannot smuggle row-overlapping windows past a day-based "
        "guard). Flat windows (zero variance) have no z-shape and are "
        "skipped."
    ),
    tags=("monitoring", "extension", "window-frame", "similarity"),
)
def q_similar_revenue_weeks(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_cents(spark, sf_dir)
    win = Window.orderBy("d").rowsBetween(-6, 0)
    w = daily.select(
        "d",
        F.collect_list("cents").over(win).alias("arr"),
        F.count(F.lit(1)).over(win).alias("n"),
    ).filter(F.col("n") == 7).withColumn(
        "idx", F.row_number().over(Window.orderBy("d"))
    )
    m = F.aggregate("arr", F.lit(0).cast("long"), lambda a, x: a + x).cast(
        "double"
    ) / 7
    z = w.select("d", "idx", "arr", m.alias("m")).select(
        "d",
        "idx",
        "arr",
        "m",
        (
            F.aggregate(
                F.transform(
                    "arr", lambda x: (x - F.col("m")) * (x - F.col("m"))
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / 7
        ).alias("var"),
    )
    # tracked: the pattern pick and the distance scan both read this
    # relation — unpersisted, the orders scan + daily rollup + window
    # chain runs twice per action (repo-wide shared-subtree rule)
    zn = C.track(
        z.filter(F.col("var") > 0).select(
            "d",
            "idx",
            F.transform(
                "arr", lambda x: (x - F.col("m")) / F.sqrt(F.col("var"))
            ).alias("zv"),
        )
    )
    pat = (
        zn.orderBy(F.col("d").desc())
        .limit(1)
        .select(F.col("idx").alias("pidx"), F.col("zv").alias("pzv"))
    )
    # overlap guard is ROW-based on the spine index, not calendar days:
    # with a sparse spine a 7-ROW window spans arbitrarily many calendar
    # days, and a calendar guard would admit windows sharing up to 6 of
    # 7 rows with the pattern (trivial self-matches); idx <= pidx - 7
    # guarantees zero shared rows on ANY spine, and avoids timestamp
    # arithmetic entirely (no date-truncation / timezone edge)
    dist = (
        zn.crossJoin(F.broadcast(pat))
        .filter(F.col("idx") <= F.col("pidx") - 7)
        .select(
            "d",
            F.round(
                F.aggregate(
                    F.zip_with(
                        "zv", "pzv", lambda a, b: (a - b) * (a - b)
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ),
                6,
            ).alias("zdist"),
        )
    )
    top = dist.orderBy("zdist", "d").limit(10)
    return top.select(
        F.col("d").cast("long").alias("window_end_epoch"),
        "zdist",
        F.row_number().over(Window.orderBy("zdist", "d")).alias("rank"),
    )
