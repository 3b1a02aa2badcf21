"""Temporal join operators Spark lacks natively: as-of join, range join.

The reference is batch-single-process and has neither (SURVEY §2.3: "No
sort-merge/range/as-of/interval joins exist") — these are the engine-
completing operators a transcript/event store needs (e.g. join each turn
to the latest config/model snapshot at its timestamp).

Spark-first strategy (task brief order):
(a) composition of existing DataFrame ops where semantics allow —
    the as-of join is the classic union + window trick: tag both sides,
    union, window per key ordered by (ts, side), carry the last right
    row forward with last(..., ignorenulls=True). ONE shuffle (the
    window), no pandas, no broadcast requirement on either side.
(b) pandas fallback (merge_asof per key group) exists conceptually but
    is never needed — (a) covers the semantics exactly.

Range join: bucketize the range key so the join is equi on
(key, bucket) and the residual BETWEEN predicate filters within bucket —
the shuffle is keyed, never a cross join (guide's recommended pattern).

Oracles: DuckDB has native ASOF JOIN; the range join oracle is a plain
BETWEEN join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str,
              right_cols: list[str]) -> DataFrame:
    """For each left row, attach the right row with the greatest
    right.on <= left.on within the same `by` key (backward as-of).
    All left columns are carried through.

    union + window: right rows sort before left rows at equal ts
    (side 0 < 1) so an exact-ts right row IS visible to that left row —
    matching merge_asof/DuckDB ASOF (<=) semantics. ONE shuffle (the
    per-key window); neither side needs to fit in memory.

    The right payload travels as ONE struct so the carried match is a
    whole row — carrying columns independently with last(ignorenulls)
    would mix columns from different right rows whenever a payload
    column is null. Right rows with a null key or null ts are dropped
    first: SQL equality/inequality never matches NULL (a null-ts right
    row would otherwise sort first and leak into early left rows)."""
    rt = (right
          .where(F.col(by).isNotNull() & F.col(on).isNotNull())
          .select(F.col(by), F.col(on), F.lit(0).alias("_side"),
                  F.struct(*[F.col(c) for c in right_cols]).alias("_r")))
    lt = left.withColumn("_side", F.lit(1))
    # allowMissingColumns: left payload columns are null on right rows
    # (filtered out at the end); _r is null on left rows until the
    # window carries the last right ROW forward
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    w = (Window.partitionBy(by).orderBy(on, "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = (unioned
           .withColumn("_asof", F.last("_r", ignorenulls=True).over(w))
           .where(F.col("_side") == 1))
    for c in right_cols:
        out = out.withColumn(f"asof_{c}", F.col(f"_asof.{c}"))
    return out.drop("_side", "_r", "_asof")


def qr_asof_join(spark, sf_dir):
    """Every 'error' event gets the user's latest 'view' event id/value
    at-or-before its ts. Oracle: DuckDB native ASOF LEFT JOIN."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp"))
    left = ev.where(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id")
    right = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id"),
        F.col("value").alias("view_value"))
    return (
        asof_join(left, right, on="ts", by="user_id",
                  right_cols=["view_id", "view_value"])
        .select("user_id", "ts", "event_id",
                F.col("asof_view_id").alias("view_id"),
                F.round("asof_view_value", 2).alias("view_value"))
        .orderBy("user_id", "ts", "event_id")
    )


QR_ASOF_SQL = """
SELECT e.user_id, e.ts, e.event_id,
       v.event_id AS view_id,
       ROUND(v.value, 2) AS view_value
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON e.user_id = v.user_id AND v.ts <= e.ts
ORDER BY e.user_id, e.ts, e.event_id
"""

BUCKET_WIDTH = 5.0


def qr_range_join(spark, sf_dir):
    """Range join via bucketization: events matched to value bands
    (band = [lo, hi) slices of width 5) — the band table is derived, the
    join key is the bucket id, the BETWEEN residual filters in-bucket.
    Equi-keyed shuffle only; broadcastable band side."""
    ev = _t(spark, sf_dir, "events")
    bands = (spark.range(0, 6).select(
        F.col("id").alias("band_id"),
        (F.col("id") * BUCKET_WIDTH).alias("lo"),
        ((F.col("id") + 1) * BUCKET_WIDTH).alias("hi")))
    # bucket id of each event's value IS the band id (width-aligned) —
    # the general pattern floor(value/width) joins to band bucket lists
    evb = ev.withColumn("band_id", F.floor(F.col("value") / BUCKET_WIDTH))
    return (
        evb.join(F.broadcast(bands), "band_id")
        .where((F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")))
        .groupBy("band_id")
        .agg(F.count("*").alias("n_events"),
             # integer-cents invariant (CLAUDE.md): summing doubles then
             # rounding is summation-order-dependent at edges
             (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))
                    .cast("long")) / 100.0).alias("sum_value"))
        .orderBy("band_id")
    )


QR_RANGE_SQL = f"""
WITH bands AS (
  SELECT band_id, band_id * {BUCKET_WIDTH} AS lo,
         (band_id + 1) * {BUCKET_WIDTH} AS hi
  FROM (SELECT unnest(range(0, 6)) AS band_id)
)
SELECT band_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         / 100.0 AS sum_value
FROM events JOIN bands
  ON value >= lo AND value < hi
GROUP BY band_id ORDER BY band_id
"""


# events within this many seconds of the previous event in the same
# (user, type) stream are one retry chain
RETRY_GAP_S = 60


def qr_retry_collapse(spark, sf_dir):
    """Retry-storm collapse — the event-stream hygiene pass an ingest
    pipeline runs before analytics: events of the same (user, type)
    landing within RETRY_GAP_S of their predecessor are one chain
    (client retries / double-clicks / at-least-once replays); keep the
    chain head, report how much collapsed. Gap-chain semantics — the
    same contract as W3 sessionization, applied as dedup.

    One shuffle (the per-key window); chain ids are a cumulative sum of
    integer-microsecond gap flags, so every number is exact on both
    engines (no timestamp truncation class — the w3 lesson). Ties on ts
    break by event_id on both sides."""
    ev = (_t(spark, sf_dir, "events")
          .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull()))
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap_us = RETRY_GAP_S * 1_000_000
    # lag, then cumsum: two projections over the SAME window spec — one
    # shuffle, the second window reuses the sort (a window expr can't
    # nest inside another window's aggregate). Gap math is tz-free
    # timestampdiff on the NTZ column (unix_micros requires an instant;
    # the cast would shift by the session-tz offset — the w3 lesson).
    flagged = (ev.select("user_id", "event_type", "ts", "event_id")
               .withColumn("prev_ts", F.lag("ts").over(w))
               .withColumn("new_chain",
                           (F.col("prev_ts").isNull()
                            | (F.expr("timestampdiff(MICROSECOND, prev_ts,"
                                      " ts)") > gap_us))
                           .cast("long")))
    chained = flagged.withColumn("chain_id", F.sum("new_chain").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    chains = (chained.groupBy("user_id", "event_type", "chain_id")
              .agg(F.count("*").cast("long").alias("chain_len")))
    return (chains.groupBy("user_id", "event_type")
            .agg(F.sum("chain_len").cast("long").alias("n_events"),
                 F.count("*").cast("long").alias("n_kept"),
                 (F.sum("chain_len") - F.count("*")).cast("long")
                 .alias("n_collapsed"),
                 F.max("chain_len").cast("long").alias("max_chain_len"))
            .orderBy("user_id", "event_type"))


QR_RETRY_SQL = f"""
WITH chained AS (
  SELECT user_id, event_type,
         SUM(CASE WHEN prev_ts IS NULL
                   OR datediff('microseconds', prev_ts, ts)
                      > {RETRY_GAP_S * 1_000_000}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id, event_type
                 ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS chain_id
  FROM (
    SELECT user_id, event_type, ts, event_id,
           lag(ts) OVER (PARTITION BY user_id, event_type
                         ORDER BY ts, event_id) AS prev_ts
    FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
  )
),
chains AS (
  SELECT user_id, event_type, chain_id,
         CAST(COUNT(*) AS BIGINT) AS chain_len
  FROM chained GROUP BY 1, 2, 3
)
SELECT user_id, event_type,
       CAST(SUM(chain_len) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(chain_len) - COUNT(*) AS BIGINT) AS n_collapsed,
       CAST(MAX(chain_len) AS BIGINT) AS max_chain_len
FROM chains GROUP BY 1, 2 ORDER BY user_id, event_type
"""


CONVERT_WINDOW_S = 7 * 86400  # purchase within a week of first signup


def qr_conversion_cohorts(spark, sf_dir):
    """Cohort conversion — the event-sequence funnel every product
    analytics stack runs: users grouped by the DATE of their first
    signup; a cohort member converts if any purchase lands within
    CONVERT_WINDOW_S of that first signup (inclusive both ends).

    Shape: one keyed aggregation for first signups, one keyed
    (user-co-partitioned) semi join against purchases with the window
    predicate, one tiny cohort-date aggregation. Window math is tz-free
    integer-MICROSECOND timestampdiff on the NTZ column (the w3 lesson;
    second-granularity diffs diverge between engines — Spark truncates
    elapsed seconds, DuckDB counts boundary crossings, so a sub-second
    gap straddling a boundary flips the edge-of-window predicate);
    conversion share is integer basis points — exact on both engines."""
    ev = (_t(spark, sf_dir, "events")
          .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull()))
    first = (ev.where(F.col("event_type") == "signup")
             .groupBy("user_id").agg(F.min("ts").alias("s_ts")))
    buys = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"))
    converted = (first.join(buys, "user_id")
                 .where(F.expr("timestampdiff(MICROSECOND, s_ts, p_ts)")
                        .between(0, CONVERT_WINDOW_S * 1_000_000))
                 .select("user_id").distinct()
                 .withColumn("converted", F.lit(1)))
    return (first.join(converted, "user_id", "left")
            .groupBy(F.to_date("s_ts").alias("cohort_date"))
            .agg(F.count("*").cast("long").alias("n_users"),
                 F.sum(F.coalesce("converted", F.lit(0))).cast("long")
                 .alias("n_converted"))
            .withColumn("conv_bp",
                        F.expr("n_converted * 10000 DIV n_users")
                        .cast("long"))
            .orderBy("cohort_date"))


QR_COHORT_SQL = f"""
WITH first AS (
  SELECT user_id, MIN(ts) AS s_ts FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type = 'signup'
  GROUP BY user_id
),
converted AS (
  SELECT DISTINCT f.user_id
  FROM first f
  JOIN events p ON p.user_id = f.user_id AND p.event_type = 'purchase'
   AND p.ts IS NOT NULL
   AND datediff('microseconds', f.s_ts, p.ts)
       BETWEEN 0 AND {CONVERT_WINDOW_S * 1_000_000}
)
SELECT CAST(f.s_ts AS DATE) AS cohort_date,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_converted,
       CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
            * 10000 // COUNT(*) AS BIGINT) AS conv_bp
FROM first f LEFT JOIN converted c ON c.user_id = f.user_id
GROUP BY 1 ORDER BY cohort_date
"""


RETENTION_EPOCH = "2024-01-01"  # week-0 anchor (testdata starts here)


def qr_retention_matrix(spark, sf_dir):
    """Weekly cohort retention triangle: users grouped by first-activity
    week (cohort), counted in every later week they return, with
    retention as integer basis points of the cohort's size — the
    standing health read of any event product, and the temporal-family
    completion next to funnels (qr_conversion_cohorts) and retries.

    Engine-exact: week index = FLOOR(days-since-anchor / 7) where the
    day count is a pure DATE difference (no timezone, no epoch-seconds —
    the tz-free lesson from w3/qr_retry_collapse) and the flooring is
    explicit pmod arithmetic on both engines; retention_bp is one
    integer division against the cohort's week-0 size (cohort size =
    distinct users whose FIRST week is that week, so age 0 always
    exists and the division is never by zero).

    Scale shape: events collapse to distinct (user, week) — ONE
    map-side-combinable shuffle keyed by user+week; the cohort frame is
    a groupBy(user) on the same rows; the cohort join is keyed on user;
    the final matrix is ~weeks^2 rows."""
    ev = _t(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    # FLOOR division, spelled as (d - pmod(d, 7)) DIV 7 on BOTH engines
    # (Spark DIV and DuckDB // each truncate toward zero): a bare
    # truncating division would file a day -2 event under week 0 —
    # merging pre-anchor activity into the anchor cohort — instead of
    # week -1; subtracting the non-negative pmod remainder makes the
    # dividend an exact multiple, so the division is exact and floored
    uw = (ev.select("user_id",
                    F.expr(f"CAST((datediff(to_date(ts), "
                           f"DATE '{RETENTION_EPOCH}') "
                           f"- pmod(datediff(to_date(ts), "
                           f"DATE '{RETENTION_EPOCH}'), 7)) DIV 7 "
                           f"AS BIGINT)")
                    .alias("week"))
          .distinct())
    cohort = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = (cohort.groupBy("cohort_week")
             .agg(F.count("*").cast("long").alias("cohort_users")))
    return (uw.join(cohort, "user_id")
            .select("cohort_week",
                    (F.col("week") - F.col("cohort_week")).alias("age_weeks"),
                    "user_id")
            .groupBy("cohort_week", "age_weeks")
            .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
            .join(F.broadcast(sizes), "cohort_week")
            .select("cohort_week", "age_weeks", "n_users",
                    F.expr("n_users * 10000 DIV cohort_users")
                    .cast("long").alias("retention_bp"))
            .orderBy("cohort_week", "age_weeks"))


QR_RETENTION_SQL = f"""
WITH days AS (
  SELECT user_id,
         datediff('day', DATE '{RETENTION_EPOCH}', CAST(ts AS DATE)) AS d
  FROM events WHERE user_id IS NOT NULL
),
uw AS (
  -- FLOOR division via the pmod identity: DuckDB's integer // truncates
  -- toward zero (like Spark's DIV), so bare d // 7 would put a
  -- day -2 event in week 0 instead of week -1
  SELECT DISTINCT user_id,
         CAST((d - ((d % 7) + 7) % 7) // 7 AS BIGINT) AS week
  FROM days
),
cohort AS (
  SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY 1
),
sizes AS (
  SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_users
  FROM cohort GROUP BY 1
),
matrix AS (
  SELECT c.cohort_week, u.week - c.cohort_week AS age_weeks,
         CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS n_users
  FROM uw u JOIN cohort c USING (user_id)
  GROUP BY 1, 2
)
SELECT m.cohort_week, m.age_weeks, m.n_users,
       CAST(m.n_users * 10000 // s.cohort_users AS BIGINT) AS retention_bp
FROM matrix m JOIN sizes s USING (cohort_week)
ORDER BY cohort_week, age_weeks
"""


def qr_stickiness(spark, sf_dir):
    """DAU/WAU stickiness per day: daily active users over the distinct
    users of the trailing 7-day window, in integer basis points — the
    standing engagement ratio next to the retention triangle. Day index
    is the same tz-free DATE difference as qr_retention_matrix.

    Scale shape: events collapse to distinct (user, day) — one
    map-side-combinable shuffle; the trailing window is the module's own
    bucketize doctrine, NOT a range join: each (user, day) row explodes
    into the 7 window anchors it contributes to (sequence(day, day+6) —
    map-only, fixed 7x fanout) and the WAU is one equi-groupBy. A
    broadcast nested-loop against the day dimension would evaluate
    |user-days| x |days| predicates — linear blowup with corpus history
    for an output that is only 7x the frame."""
    ev = _t(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    ud = (ev.select("user_id",
                    F.expr(f"CAST(datediff(to_date(ts), "
                           f"DATE '{RETENTION_EPOCH}') AS BIGINT)")
                    .alias("day"))
          .distinct())
    dau = ud.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("dau"))
    wau = (ud.select("user_id",
                     F.explode(F.expr("sequence(day, day + 6)")).alias("d"))
           .groupBy("d")
           .agg(F.countDistinct("user_id").cast("long").alias("wau")))
    return (dau.join(wau, dau.day == wau.d)
            .select("day", "dau", "wau",
                    F.expr("dau * 10000 DIV wau").cast("long")
                    .alias("stickiness_bp"))
            .orderBy("day"))


QR_STICKINESS_SQL = f"""
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(datediff('day', DATE '{RETENTION_EPOCH}', CAST(ts AS DATE))
              AS BIGINT) AS day
  FROM events WHERE user_id IS NOT NULL
),
dau AS (
  SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
  FROM ud GROUP BY 1
),
wau AS (
  SELECT d.day AS d, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
  FROM (SELECT DISTINCT day FROM ud) d
  JOIN ud u ON u.day <= d.day AND u.day >= d.day - 6
  GROUP BY 1
)
SELECT day, dau, wau,
       CAST(dau * 10000 // wau AS BIGINT) AS stickiness_bp
FROM dau JOIN wau ON dau.day = wau.d
ORDER BY day
"""


ANOM_DEV_PCT = 50   # flag days deviating more than 50% from the mean


def qr_daily_anomaly(spark, sf_dir):
    """Per-event-type daily volume anomalies — the ingestion-monitoring
    read a pipeline runs over its event firehose (a crawler that went
    dark or a runaway producer shows up as a day far off the type's mean
    volume). Deviation from the mean is decided with INTEGER
    cross-multiplies only (the engine-exact playbook): a day is
    anomalous iff 100·|cnt·n_days − S| > ANOM_DEV_PCT·S (the exact
    |cnt − S/n_days| > pct·mean test scaled through by n_days·100), and
    dev_bp = floor basis points of |cnt·n_days − S| / S. No doubles, no
    sqrt, no engine edge.

    Scale shape: one keyed (event_type, day) count with map-side
    combine, one tiny per-type stats agg joined back on event_type
    (broadcastable — types are few); the event stream is touched once.
    int64 headroom: cnt·n_days ≤ S·n_days needs S·n_days·10⁴ < 2⁶³ —
    ~10¹³ events over 10⁴ days; beyond that, quantize to per-1000
    counts. Day index = the module's tz-free DATE difference."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull())
    daily = (ev.groupBy(
                 "event_type",
                 F.expr(f"CAST(datediff(to_date(ts), "
                        f"DATE '{RETENTION_EPOCH}') AS BIGINT)").alias("day"))
             .agg(F.count("*").cast("long").alias("n_events")))
    stats = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("n_events").cast("long").alias("s"))
    return (daily.join(stats, "event_type")
            .selectExpr(
                "event_type", "day", "n_events",
                "CAST((abs(n_events * n_days - s) * 10000) DIV s AS BIGINT)"
                " AS dev_bp",
                f"100 * abs(n_events * n_days - s) > {ANOM_DEV_PCT} * s"
                " AS is_anomaly")
            .orderBy("event_type", "day"))


QR_ANOMALY_SQL = f"""
WITH daily AS (
  SELECT event_type,
         CAST(datediff('day', DATE '{RETENTION_EPOCH}', CAST(ts AS DATE))
              AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
),
stats AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(n_events) AS BIGINT) AS s
  FROM daily GROUP BY event_type
)
SELECT d.event_type, d.day, d.n_events,
       CAST((abs(d.n_events * t.n_days - t.s) * 10000) // t.s AS BIGINT)
           AS dev_bp,
       100 * abs(d.n_events * t.n_days - t.s) > {ANOM_DEV_PCT} * t.s
           AS is_anomaly
FROM daily d JOIN stats t USING (event_type)
ORDER BY d.event_type, d.day
"""


FUNNEL_STEPS = ["view", "click", "purchase"]


def qr_event_funnel(spark, sf_dir):
    """Ordered multi-step funnel (view → click → purchase): a user
    reaches step k only with a step-k event AT OR AFTER their earliest
    step-(k−1) arrival — the product-analytics read every event store
    ships, and the ordered-chain semantics a bare per-type count gets
    wrong (a purchase BEFORE the first view must not convert).
    Arrival at step k = min step-k ts ≥ arrival at step k−1; timestamps
    compare at native microsecond precision — no arithmetic, no engine
    edge. Conversion ratios are integer basis points.

    Scale shape: one keyed (user, step) min-ts aggregation with
    map-side combine per step, chained by keyed equi-joins on user_id —
    the event stream is scanned once per step with the type filter
    pushed to the scan, and nothing ever self-joins on time."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull())
    arrivals = []   # per-step frames: (user_id, t_k)
    prev = None
    for k, step in enumerate(FUNNEL_STEPS):
        cur = ev.where(F.col("event_type") == step)
        if prev is not None:
            cur = (cur.join(prev.select("user_id", F.col("t").alias("t_prev")),
                            "user_id")
                   .where(F.col("ts") >= F.col("t_prev")))
        cur = cur.groupBy("user_id").agg(F.min("ts").alias("t"))
        arrivals.append(cur)
        prev = cur
    counts = None
    for k, (step, fr) in enumerate(zip(FUNNEL_STEPS, arrivals)):
        c = fr.agg(F.count("*").cast("long").alias("n_users")).selectExpr(
            f"CAST({k + 1} AS INT) AS step_idx", f"'{step}' AS step",
            "n_users")
        counts = c if counts is None else counts.unionByName(c)
    first = F.first("n_users").over(
        Window.orderBy("step_idx").rowsBetween(
            Window.unboundedPreceding, Window.currentRow))
    prev_n = F.lag("n_users", 1).over(Window.orderBy("step_idx"))
    return (counts
            .withColumn("_first", first)
            .withColumn("_prev", F.coalesce(prev_n, F.col("n_users")))
            .selectExpr("step_idx", "step", "n_users",
                        "CAST((n_users * 10000) DIV _prev AS BIGINT)"
                        " AS conv_prev_bp",
                        "CAST((n_users * 10000) DIV _first AS BIGINT)"
                        " AS conv_first_bp")
            .orderBy("step_idx"))


def _qr_funnel_sql() -> str:
    ctes = ["s1 AS (SELECT user_id, MIN(ts) AS t FROM ev "
            f"WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id)"]
    for k in range(1, len(FUNNEL_STEPS)):
        ctes.append(
            f"s{k + 1} AS (SELECT e.user_id, MIN(e.ts) AS t FROM ev e "
            f"JOIN s{k} p ON p.user_id = e.user_id AND e.ts >= p.t "
            f"WHERE e.event_type = '{FUNNEL_STEPS[k]}' GROUP BY e.user_id)")
    selects = " UNION ALL ".join(
        f"SELECT CAST({k + 1} AS INTEGER) AS step_idx, '{s}' AS step, "
        f"CAST((SELECT COUNT(*) FROM s{k + 1}) AS BIGINT) AS n_users"
        for k, s in enumerate(FUNNEL_STEPS))
    return f"""
WITH ev AS (
  SELECT user_id, event_type, ts FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
{", ".join(ctes)},
counts AS ({selects})
SELECT step_idx, step, n_users,
       CAST((n_users * 10000) //
            COALESCE(LAG(n_users) OVER (ORDER BY step_idx), n_users)
            AS BIGINT) AS conv_prev_bp,
       CAST((n_users * 10000) //
            FIRST_VALUE(n_users) OVER (ORDER BY step_idx)
            AS BIGINT) AS conv_first_bp
FROM counts ORDER BY step_idx
"""


QR_FUNNEL_SQL = _qr_funnel_sql()


def qr_cohort_value(spark, sf_dir):
    """Value-weighted cohort triangle: per first-signup-week cohort, the
    purchase VALUE realized at each week-age — the revenue/LTV read
    beside qr_retention_matrix's activity counts (a cohort can retain
    users yet monetize nothing; this is the gauge that tells them
    apart). Money follows the repo invariant: per-event cents =
    floor(value·100 + 0.5) as BIGINT BEFORE any cross-row sum, so
    parallel partial aggregation is order-independent and both engines
    sum identical integers. Week index = the explicit pmod FLOOR
    division of the tz-free DATE difference (the qr_retention_matrix
    bridge); cohorts anchor on each user's FIRST signup week.

    Scale shape: one keyed signup groupBy(user) for cohorts, one keyed
    join of purchases on user, one (cohort, age) aggregation — all
    map-side combinable; the stream is scanned twice with the
    event_type filter pushed to both scans."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull())
    week = (f"CAST((datediff(to_date(ts), DATE '{RETENTION_EPOCH}') "
            f"- pmod(datediff(to_date(ts), DATE '{RETENTION_EPOCH}'), 7)) "
            f"DIV 7 AS BIGINT)")
    cohort = (ev.where(F.col("event_type") == "signup")
              .selectExpr("user_id", f"{week} AS week")
              .groupBy("user_id")
              .agg(F.min("week").alias("cohort_week")))
    purchases = (ev.where(F.col("event_type") == "purchase")
                 .selectExpr("user_id", f"{week} AS week",
                             "CAST(floor(value * 100 + 0.5) AS BIGINT)"
                             " AS cents"))
    return (purchases.join(cohort, "user_id")
            .where(F.col("week") >= F.col("cohort_week"))
            .select("cohort_week",
                    (F.col("week") - F.col("cohort_week")).alias("age_weeks"),
                    "cents")
            .groupBy("cohort_week", "age_weeks")
            .agg(F.count("*").cast("long").alias("n_purchases"),
                 F.sum("cents").cast("long").alias("value_cents"))
            .orderBy("cohort_week", "age_weeks"))


def _qr_cohort_value_sql() -> str:
    week = (f"CAST((datediff('day', DATE '{RETENTION_EPOCH}', "
            f"CAST(ts AS DATE)) - ((datediff('day', "
            f"DATE '{RETENTION_EPOCH}', CAST(ts AS DATE)) % 7) + 7) % 7) "
            f"// 7 AS BIGINT)")
    return f"""
WITH ev AS (
  SELECT user_id, event_type, ts, value FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
cohort AS (
  SELECT user_id, MIN({week}) AS cohort_week
  FROM ev WHERE event_type = 'signup' GROUP BY user_id
),
purchases AS (
  SELECT user_id, {week} AS week,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM ev WHERE event_type = 'purchase'
)
SELECT c.cohort_week,
       p.week - c.cohort_week AS age_weeks,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(p.cents) AS BIGINT) AS value_cents
FROM purchases p JOIN cohort c USING (user_id)
WHERE p.week >= c.cohort_week
GROUP BY c.cohort_week, p.week - c.cohort_week
ORDER BY cohort_week, age_weeks
"""


QR_COHORT_VALUE_SQL = _qr_cohort_value_sql()


BOT_EVENTS_PER_MIN = 3  # flag users averaging more than this per active minute


def qr_interarrival_hist(spark, sf_dir):
    """Per-type inter-arrival burstiness profile: floor-log2 histogram
    of microsecond gaps between consecutive same-type events within a
    day — the read that separates organic traffic from batch-loaded or
    bot-generated streams (organic gaps spread across buckets; machine
    traffic spikes in one). Gap arithmetic is the w3 discipline:
    integer-MICROSECOND timestampdiff on the NTZ column (tz-free,
    DST-safe), bucket = length(bin(gap_us)) exact floor-log2 (+1; gap 0
    → bucket 0), shares in integer basis points.

    Scale shape: the lag window is keyed by (event_type, day) — a
    BOUNDED partition key (one day of one type), never a global or
    per-type-only sort; day-boundary gaps are deliberately out of
    scope (documented day-local semantics). Total order inside the
    window = (ts, event_id), so ties cannot flip gaps between runs or
    engines."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull())
    day = F.expr(f"CAST(datediff(to_date(ts), DATE '{RETENTION_EPOCH}')"
                 f" AS BIGINT)")
    w = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    gaps = (ev.select("event_type", "ts", "event_id", day.alias("day"))
            .withColumn("prev_ts", F.lag("ts").over(w))
            .where(F.col("prev_ts").isNotNull())
            .selectExpr("event_type",
                        "CAST(timestampdiff(MICROSECOND, prev_ts, ts)"
                        " AS BIGINT) AS gap_us")
            .selectExpr("event_type",
                        "CAST(CASE WHEN gap_us > 0"
                        " THEN length(bin(gap_us)) ELSE 0 END AS INT)"
                        " AS gap_bucket"))
    counts = (gaps.groupBy("event_type", "gap_bucket")
              .agg(F.count("*").cast("long").alias("n_gaps")))
    totals = counts.groupBy("event_type").agg(
        F.sum("n_gaps").cast("long").alias("type_total"))
    return (counts.join(F.broadcast(totals), "event_type")
            .selectExpr("event_type", "gap_bucket", "n_gaps",
                        "CAST((n_gaps * 10000) DIV type_total AS BIGINT)"
                        " AS share_bp")
            .orderBy("event_type", "gap_bucket"))


QR_INTERARRIVAL_SQL = f"""
WITH ev AS (
  SELECT event_type, event_id, ts,
         CAST(datediff('day', DATE '{RETENTION_EPOCH}', CAST(ts AS DATE))
              AS BIGINT) AS day
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
),
gaps AS (
  SELECT event_type,
         CAST(CASE WHEN g > 0 THEN length(bin(g)) ELSE 0 END AS INTEGER)
             AS gap_bucket
  FROM (
    SELECT event_type,
           CAST(datediff('microseconds',
                LAG(ts) OVER (PARTITION BY event_type, day
                              ORDER BY ts, event_id), ts) AS BIGINT) AS g
    FROM ev
  ) WHERE g IS NOT NULL
),
counts AS (
  SELECT event_type, gap_bucket, CAST(COUNT(*) AS BIGINT) AS n_gaps
  FROM gaps GROUP BY event_type, gap_bucket
),
totals AS (
  SELECT event_type, CAST(SUM(n_gaps) AS BIGINT) AS type_total
  FROM counts GROUP BY event_type
)
SELECT c.event_type, c.gap_bucket, c.n_gaps,
       CAST((c.n_gaps * 10000) // t.type_total AS BIGINT) AS share_bp
FROM counts c JOIN totals t USING (event_type)
ORDER BY c.event_type, c.gap_bucket
"""


def qr_bot_detection(spark, sf_dir):
    """Bot-traffic screen over the event stream — the crawl-hygiene read
    a training-data team runs before trusting engagement signals: a user
    whose event rate per ACTIVE minute is superhuman is automation, and
    their events should not weight any mix or quality decision. Active
    minutes = distinct date_trunc('minute') buckets (identical NTZ
    truncation on both engines — no elapsed-time arithmetic, so the
    timestampdiff-vs-datediff boundary class never enters); the rate
    test is the integer cross-multiply n_events > RATE · n_minutes, and
    the reported rate is ×100 fixed-point integer division.

    Scale shape: one keyed (user, minute) distinct + one per-user
    aggregation, both map-side combinable; the stream is touched once."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull())
    per_user = (ev.groupBy("user_id")
                .agg(F.count("*").cast("long").alias("n_events"),
                     F.countDistinct(F.date_trunc("minute", F.col("ts")))
                     .cast("long").alias("n_active_minutes")))
    return (per_user
            .selectExpr(
                "user_id", "n_events", "n_active_minutes",
                "CAST((n_events * 100) DIV n_active_minutes AS BIGINT)"
                " AS events_per_min_x100",
                f"n_events > {BOT_EVENTS_PER_MIN} * n_active_minutes"
                " AS is_bot")
            .orderBy("user_id"))


QR_BOT_SQL = f"""
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT date_trunc('minute', ts)) AS BIGINT)
           AS n_active_minutes,
       CAST((CAST(COUNT(*) AS BIGINT) * 100)
            // COUNT(DISTINCT date_trunc('minute', ts)) AS BIGINT)
           AS events_per_min_x100,
       COUNT(*) > {BOT_EVENTS_PER_MIN}
           * COUNT(DISTINCT date_trunc('minute', ts)) AS is_bot
FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
GROUP BY user_id
ORDER BY user_id
"""


QUERIES = {
    "qr_asof_join": (qr_asof_join, QR_ASOF_SQL),
    "qr_range_join": (qr_range_join, QR_RANGE_SQL),
    "qr_retry_collapse": (qr_retry_collapse, QR_RETRY_SQL),
    "qr_conversion_cohorts": (qr_conversion_cohorts, QR_COHORT_SQL),
    "qr_retention_matrix": (qr_retention_matrix, QR_RETENTION_SQL),
    "qr_stickiness": (qr_stickiness, QR_STICKINESS_SQL),
    "qr_daily_anomaly": (qr_daily_anomaly, QR_ANOMALY_SQL),
    "qr_event_funnel": (qr_event_funnel, QR_FUNNEL_SQL),
    "qr_bot_detection": (qr_bot_detection, QR_BOT_SQL),
    "qr_cohort_value": (qr_cohort_value, QR_COHORT_VALUE_SQL),
    "qr_interarrival_hist": (qr_interarrival_hist, QR_INTERARRIVAL_SQL),
}
