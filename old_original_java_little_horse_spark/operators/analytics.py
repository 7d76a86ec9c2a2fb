"""Event-analytics operators over the `events` table: gap-based
sessionization, as-of joins, exact distribution quantiles, and a
conversion funnel.

These extend the reference's windowed analytics family (SURVEY §2.6 —
position numbering W1, latest-entry W2, timer scans W3) with the
event-sequence shapes every telemetry/behavioral pipeline needs and
the reference's key-value store cannot express.

Scale design: every operator is a single hash-exchange on its
partition key (user_id / source) followed by sort-based window
evaluation or partial aggregation — no self-joins on time ranges.
The as-of join in particular is the union+window formulation (one
shuffle, linear scan) rather than an O(n·m) range join.

Determinism: timestamps compare as exact epoch-microsecond integers
(`unix_micros` / `epoch_us`); DOUBLE event values are quantized to
cents before summing so addition order cannot drift the hash.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..registry import query
from ..sources.parquet import load_table, timed_events

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


# --------------------------------------------------------------------------
# W4 — gap-based sessionization
# --------------------------------------------------------------------------

@query(
    "w4_sessionize",
    oracle=f"""
WITH o AS (
  SELECT user_id, event_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events WHERE ts IS NOT NULL
), m AS (
  SELECT user_id, ts, value,
         SUM(CASE WHEN prev IS NULL
                    OR epoch_us(ts) - epoch_us(prev) > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM o
)
SELECT user_id,
       CAST(session_idx AS BIGINT)            AS session_idx,
       MIN(epoch_us(ts))                      AS start_us,
       MAX(epoch_us(ts))                      AS end_us,
       CAST(COUNT(*) AS BIGINT)               AS n_events,
       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents
FROM m GROUP BY user_id, session_idx
""",
)
def w4_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessions = maximal event runs per user with < 30 min between
    consecutive events.  lag + running sum of session breaks + one
    groupBy: the lag window, the running sum, and the session
    aggregation all partition on user_id, so Spark plans ONE exchange
    and reuses its sort — the linear-scan sessionizer that holds at
    any scale (no time-range self-join)."""
    e = timed_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("ts").over(w)
    is_new = (prev.isNull()
              | (F.unix_micros(F.col("ts")) - F.unix_micros(prev)
                 > SESSION_GAP_US)).cast("long")
    m = e.select(
        "user_id", "ts", "value",
        F.sum(is_new).over(run).alias("session_idx"),
    )
    return m.groupBy("user_id", "session_idx").agg(
        F.min(F.unix_micros("ts")).alias("start_us"),
        F.max(F.unix_micros("ts")).alias("end_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("value_cents"),
    )


# --------------------------------------------------------------------------
# J5 — as-of join (latest prior event of another type)
# --------------------------------------------------------------------------

@query(
    "j5_asof_join",
    oracle="""
WITH err AS (
  SELECT event_id, user_id, ts FROM events
  WHERE event_type = 'error' AND ts IS NOT NULL
), clk AS (
  -- tie rule: among clicks sharing one (user_id, ts) instant, the match
  -- is the max event_id — dedupe here so the ASOF pick is deterministic
  SELECT MAX(event_id) AS event_id, user_id, ts
  FROM events WHERE event_type = 'click' AND ts IS NOT NULL
  GROUP BY user_id, ts
)
SELECT e.event_id                       AS error_event_id,
       e.user_id,
       c.event_id                       AS click_event_id,
       epoch_us(e.ts) - epoch_us(c.ts)  AS gap_us
FROM err e ASOF LEFT JOIN clk c
  ON e.user_id = c.user_id AND e.ts >= c.ts
""",
)
def j5_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every error event, the latest click by the same user at or
    before it (DuckDB expresses this as a native ASOF LEFT JOIN).

    Spark-first formulation: union the two event sets tagged, one
    window partitioned by user ordered by (ts, tag) — clicks sort
    before a same-instant error, so "at or before" is the running
    `last(click, ignorenulls)` — then keep the error rows.  ONE
    shuffle on user_id and a linear scan: at 100 TB this beats any
    range join because the per-key cost is sort + scan, never
    candidate pairs.

    Tie rule (deterministic): clicks sort before a same-instant error
    (is_err), and among clicks sharing one (user_id, ts) instant the
    running `last` lands on the max event_id — the oracle dedupes its
    click side to the same rule.

    NULL-key rule: a window PARTITION groups NULL user_ids together,
    but the oracle's ASOF JOIN `ON e.user_id = c.user_id` never
    matches NULL — so clicks in the NULL partition are excluded from
    the running-last (a NULL-user error still emits its LEFT row with
    no match, exactly the join's semantics).
    """
    e = timed_events(spark, sf_dir)
    tagged = (
        e.where(F.col("event_type").isin("click", "error"))
        .select(
            "event_id", "user_id", "ts",
            (F.col("event_type") == "error").cast("int").alias("is_err"),
        )
    )
    w = (Window.partitionBy("user_id").orderBy("ts", "is_err", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    last_clk = F.last(
        F.when((F.col("is_err") == 0) & F.col("user_id").isNotNull(),
               F.struct("ts", "event_id")),
        ignorenulls=True,
    ).over(w)
    return (
        tagged.withColumn("clk", last_clk)
        .where(F.col("is_err") == 1)
        .select(
            F.col("event_id").alias("error_event_id"),
            "user_id",
            F.col("clk.event_id").alias("click_event_id"),
            (F.unix_micros("ts") - F.unix_micros("clk.ts")).alias("gap_us"),
        )
    )


# --------------------------------------------------------------------------
# W5 — exact distribution quantiles (value-at-rank, no interpolation)
# --------------------------------------------------------------------------

@query(
    "w5_length_quantiles",
    oracle="""
WITH r AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
         COUNT(*)    OVER (PARTITION BY source) AS n
  FROM documents
)
SELECT source,
       CAST(MAX(n) AS BIGINT) AS n_docs,
       MAX(CASE WHEN rn = CAST(ceil(n * 0.50) AS BIGINT) THEN n_chars END) AS p50,
       MAX(CASE WHEN rn = CAST(ceil(n * 0.90) AS BIGINT) THEN n_chars END) AS p90,
       MAX(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT) THEN n_chars END) AS p99
FROM r GROUP BY source
""",
)
def w5_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source p50/p90/p99 document length as exact value-at-rank
    (rank ⌈p·n⌉ of the sorted lengths) — discrete quantiles, not
    interpolated, so both engines agree bit-for-bit where float
    interpolation would not.  One exchange on source shared by both
    window frames and the final rollup.  (At extreme per-key width the
    same statistic comes from `approx_percentile` sketches; this is
    the exact-parity form.)"""
    d = load_table(spark, sf_dir, "documents")
    wr = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wc = Window.partitionBy("source")
    r = d.select(
        "source", "n_chars",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )

    def at(p: float):
        return F.max(F.when(
            F.col("rn") == F.ceil(F.col("n") * p).cast("long"), F.col("n_chars")))

    return r.groupBy("source").agg(
        F.max("n").alias("n_docs"),
        at(0.50).alias("p50"), at(0.90).alias("p90"), at(0.99).alias("p99"),
    )


# --------------------------------------------------------------------------
# A6 — ordered conversion funnel (view → click → purchase)
# --------------------------------------------------------------------------

@query(
    "a6_funnel",
    oracle="""
WITH fv AS (
  SELECT user_id, MIN(ts) AS v FROM events
  WHERE event_type = 'view' AND ts IS NOT NULL GROUP BY user_id
), fc AS (
  SELECT e.user_id, MIN(e.ts) AS c
  FROM events e JOIN fv ON e.user_id = fv.user_id
  WHERE e.event_type = 'click' AND e.ts IS NOT NULL AND e.ts >= fv.v
  GROUP BY e.user_id
), fp AS (
  SELECT e.user_id, MIN(e.ts) AS p
  FROM events e JOIN fc ON e.user_id = fc.user_id
  WHERE e.event_type = 'purchase' AND e.ts IS NOT NULL AND e.ts >= fc.c
  GROUP BY e.user_id
), staged AS (
  SELECT u.user_id,
         CASE WHEN fp.p IS NOT NULL THEN 'purchased'
              WHEN fc.c IS NOT NULL THEN 'clicked'
              WHEN fv.v IS NOT NULL THEN 'viewed'
              ELSE 'none' END AS stage
  FROM (SELECT DISTINCT user_id FROM events WHERE ts IS NOT NULL) u
  LEFT JOIN fv ON u.user_id = fv.user_id
  LEFT JOIN fc ON u.user_id = fc.user_id
  LEFT JOIN fp ON u.user_id = fp.user_id
)
SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_users
FROM staged GROUP BY stage
""",
)
def a6_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel rollup: users whose first view precedes a click
    precedes a purchase (each stage's clock starts at the previous
    stage's first event).  Three user-keyed partial aggs + three
    user-keyed joins — all the same key, so co-partitioned under one
    exchange family; the final stage rollup is a 4-row result."""
    e = timed_events(spark, sf_dir)
    users = e.select("user_id").distinct()
    fv = (e.where(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("ts").alias("v")))
    fc = (e.join(fv, "user_id")
          .where((F.col("event_type") == "click") & (F.col("ts") >= F.col("v")))
          .groupBy("user_id").agg(F.min("ts").alias("c")))
    fp = (e.join(fc, "user_id")
          .where((F.col("event_type") == "purchase") & (F.col("ts") >= F.col("c")))
          .groupBy("user_id").agg(F.min("ts").alias("p")))
    staged = (users
              .join(fv, "user_id", "left")
              .join(fc, "user_id", "left")
              .join(fp, "user_id", "left")
              .select(F.when(F.col("p").isNotNull(), "purchased")
                      .when(F.col("c").isNotNull(), "clicked")
                      .when(F.col("v").isNotNull(), "viewed")
                      .otherwise("none").alias("stage")))
    return staged.groupBy("stage").agg(F.count(F.lit(1)).alias("n_users"))


# --------------------------------------------------------------------------
# J6 — bucketized range join (events within a time window of each other)
# --------------------------------------------------------------------------

RANGE_WINDOW_US = 5 * 60 * 1_000_000  # +/- 5-minute association window


@query(
    "j6_range_count",
    oracle=f"""
WITH err AS (
  SELECT event_id, user_id, ts FROM events
  WHERE event_type = 'error' AND ts IS NOT NULL
), clk AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click' AND ts IS NOT NULL
)
SELECT e.event_id AS error_event_id,
       e.user_id,
       CAST(COUNT(c.ts) AS BIGINT) AS n_nearby_clicks
FROM err e LEFT JOIN clk c
  ON e.user_id = c.user_id
 AND abs(epoch_us(e.ts) - epoch_us(c.ts)) <= {RANGE_WINDOW_US}
GROUP BY 1, 2
""",
)
def j6_range_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every error event, how many clicks by the same user landed
    within +/- 5 minutes — the interval-association join (DuckDB
    expresses it as a plain inequality join).

    Spark-first formulation: a naive `|t1 - t2| <= W` join is a
    per-user cross product (quadratic for active users, and Catalyst
    can only nested-loop an inequality).  Instead, time is cut into
    W-sized buckets: each error replicates to its bucket and both
    neighbors, clicks keep their one bucket, and the join is EQUALITY
    on (user_id, bucket) — every true pair shares one of the three
    buckets, each pair matches exactly once (the click's bucket is
    unique), and the residual |dt| <= W filter runs on the
    bucket-pruned candidates.  3x replication buys a hash join whose
    candidate count tracks actual temporal density — the standard
    bucketized range-join rewrite, the same motion as the LSH band
    joins.  One exchange on the composite key, plus the final
    per-error rollup reusing the error keys.
    """
    e = timed_events(spark, sf_dir)
    err = (e.where(F.col("event_type") == "error")
           .select("event_id", "user_id", F.unix_micros("ts").alias("t")))
    clk = (e.where(F.col("event_type") == "click")
           .select(F.col("user_id").alias("c_user"),
                   F.unix_micros("ts").alias("c_t")))
    b = (F.col("t") / RANGE_WINDOW_US).cast("long")
    err_b = err.withColumn(
        "nb", F.explode(F.array(b - 1, b, b + 1)))
    clk_b = clk.withColumn("nb", (F.col("c_t") / RANGE_WINDOW_US).cast("long"))
    matched = (
        err_b.join(clk_b, (err_b.user_id == clk_b.c_user)
                   & (err_b.nb == clk_b.nb)
                   & (F.abs(F.col("t") - F.col("c_t")) <= RANGE_WINDOW_US))
        .groupBy("event_id", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        err.join(matched, ["event_id", "user_id"], "left")
        .select(F.col("event_id").alias("error_event_id"), "user_id",
                F.coalesce("n", F.lit(0)).cast("long")
                 .alias("n_nearby_clicks"))
    )


# --------------------------------------------------------------------------
# A6 — tumbling-window event rates (the streaming dashboard rollup)
# --------------------------------------------------------------------------

@query(
    "a7_event_rate_windows",
    oracle="""
SELECT epoch_us(date_trunc('hour', ts))   AS window_start_us,
       event_type,
       CAST(COUNT(*) AS BIGINT)           AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents
FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
""",
)
def a7_event_rate_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour, per-type event rates: counts, distinct users, and
    cent-quantized value totals over tumbling 1-hour windows — the
    rollup behind every rate dashboard and alerting threshold.

    Spark-first: `F.window(ts, '1 hour')` keyed with event_type is ONE
    exchange with map-side partial aggregation (count/sum combine;
    distinct users expand to (window, type, user) partials first — all
    Catalyst-planned, no UDFs).  The identical plan runs under
    `readStream` with a watermark for the continuous variant
    (`streaming/queries.py` sessionizer shows the same batch/stream
    twinning).  Tumbling windows align to the epoch, so the oracle's
    `date_trunc('hour')` is the same bucketing under the pinned-UTC
    session."""
    e = timed_events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
             .alias("value_cents"),
        )
        .select(
            F.unix_micros("w.start").alias("window_start_us"),
            "event_type", "n_events", "n_users", "value_cents",
        )
    )


# --------------------------------------------------------------------------
# J7 — interval-overlap attribution (errors → containing session)
# --------------------------------------------------------------------------

@query(
    "j7_interval_overlap",
    oracle=f"""
WITH o AS (
  SELECT user_id, event_id, ts, event_type,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events WHERE ts IS NOT NULL
), m AS (
  SELECT user_id, ts,
         SUM(CASE WHEN prev IS NULL
                    OR epoch_us(ts) - epoch_us(prev) > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM o
), s AS (
  SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
         MIN(epoch_us(ts)) AS start_us, MAX(epoch_us(ts)) AS end_us,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM m GROUP BY 1, 2
), err AS (
  SELECT user_id, epoch_us(ts) AS t FROM events
  WHERE event_type = 'error' AND ts IS NOT NULL
)
SELECT s.user_id, s.session_idx, s.start_us, s.end_us, s.n_events,
       CAST(COUNT(err.t) AS BIGINT) AS n_errors
FROM s LEFT JOIN err
  ON s.user_id = err.user_id AND err.t BETWEEN s.start_us AND s.end_us
GROUP BY 1, 2, 3, 4, 5
""",
)
def j7_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every session with the count of error events it contains — the
    point-in-interval overlap join (attribute each error to the
    session interval covering it).

    The oracle states it as the literal interval join: sessions LEFT
    JOIN errors ON user AND t BETWEEN start AND end — per-user
    sessions x errors candidate pairs, quadratic for active users.
    The Spark formulation exploits that the intervals are DERIVED from
    the same stream the probes live in: sessionize once with an
    is-error flag per event and aggregate — the session id IS the
    containing interval.  ONE exchange on user_id, linear scan, zero
    join; per-key cost never depends on how many errors a power user
    has.  (For intervals that are NOT derived from the probe stream,
    `j6_range_count` shows the bucketized equi-join rewrite.)"""
    e = timed_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("ts").over(w)
    is_new = (prev.isNull()
              | (F.unix_micros(F.col("ts")) - F.unix_micros(prev)
                 > SESSION_GAP_US)).cast("long")
    m = e.select(
        "user_id", "ts",
        # NULL-key rule: the oracle's LEFT JOIN `ON s.user_id =
        # err.user_id` never matches a NULL user, so a NULL-user
        # session reports 0 errors even when the error sits inside it.
        ((F.col("event_type") == "error") & F.col("user_id").isNotNull())
        .cast("long").alias("is_err"),
        F.sum(is_new).over(run).alias("session_idx"),
    )
    return m.groupBy("user_id", "session_idx").agg(
        F.min(F.unix_micros("ts")).alias("start_us"),
        F.max(F.unix_micros("ts")).alias("end_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("is_err").alias("n_errors"),
    )


# --------------------------------------------------------------------------
# W6 — cohort retention matrix
# --------------------------------------------------------------------------

US_PER_WEEK = 7 * 86_400 * 1_000_000


@query(
    "w6_cohort_retention",
    oracle=f"""
WITH a AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // {US_PER_WEEK} AS wk
  FROM events WHERE ts IS NOT NULL
), f AS (
  SELECT user_id, MIN(wk) AS cohort_wk FROM a GROUP BY user_id
)
SELECT CAST(f.cohort_wk AS BIGINT)      AS cohort_week,
       CAST(a.wk - f.cohort_wk AS BIGINT) AS week_offset,
       CAST(COUNT(*) AS BIGINT)         AS n_users
FROM a JOIN f ON a.user_id = f.user_id
GROUP BY 1, 2
""",
)
def w6_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retention triangle: users bucketed by first-seen week
    (cohort), counted in every later week they return — the
    product-analytics table behind every retention curve.

    Weeks are exact integer epoch-week indices (no date arithmetic to
    drift between engines).  Scale shape: the cohort week attaches as
    a per-user WINDOW MIN over the distinct activity set — not a
    self-join against a per-user aggregate, which re-scans the events
    and (being one row per user) is never broadcastable at real user
    counts.  ONE scan; exchanges: (user, week) distinct → user window
    → final (cohort, offset) rollup whose key cardinality is
    O(weeks²), tiny forever — each partial-aggregated map-side."""
    e = timed_events(spark, sf_dir)
    # NULL-key rule: the oracle's `a JOIN f ON a.user_id = f.user_id`
    # drops NULL users (a join never matches NULL); the window-min
    # formulation would happily give the NULL partition a cohort, so
    # filter it to the join's semantics.
    a = (e.where(F.col("user_id").isNotNull())
         .select("user_id",
                 F.expr(f"unix_micros(ts) div {US_PER_WEEK}").alias("wk"))
         .distinct())
    cohort = F.min("wk").over(Window.partitionBy("user_id"))
    return (a.withColumn("cohort_wk", cohort)
            .groupBy(F.col("cohort_wk").cast("long").alias("cohort_week"),
                     (F.col("wk") - F.col("cohort_wk")).cast("long")
                      .alias("week_offset"))
            .agg(F.count(F.lit(1)).alias("n_users")))


# --------------------------------------------------------------------------
# W7 — trailing time-range window (RANGE frame)
# --------------------------------------------------------------------------

US_PER_WEEK_RANGE = 7 * 86_400 * 1_000_000


@query(
    "w7_rolling_revenue",
    oracle=f"""
WITH o AS (
  SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS order_us,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
)
SELECT o_orderkey, o_custkey, order_us,
       CAST(SUM(cents) OVER w AS BIGINT) AS trailing_cents,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_in_window
FROM o
WINDOW w AS (PARTITION BY o_custkey ORDER BY order_us
             RANGE BETWEEN {US_PER_WEEK_RANGE} PRECEDING AND CURRENT ROW)
""",
)
def w7_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each order annotated with its customer's trailing-7-day spend
    — the RANGE-frame window, the one window flavor the inventory did
    not yet carry (W1/W2 are ROW-frame ranking, a7 is tumbling
    groupBy-window; a trailing moving aggregate is neither: its frame
    is VALUE-bounded, sliding per row, with tie rows entering the
    frame together as peers).

    Time is an exact epoch-microsecond long on both engines, so the
    frame bound (7 days = 604.8e9 us PRECEDING) is integer arithmetic
    and tie-peer grouping is identical — RANGE over floats or
    timestamps is where engines drift.  Physical plan: ONE exchange
    on o_custkey, in-partition sort by order time, single forward
    scan with a sliding frame accumulator (Spark's WindowExec keeps
    the frame incrementally — no per-row rescan, no self-join).  At
    100 TB this is the shape to prefer over the equivalent
    self-join `o1 JOIN o2 ON same cust AND t BETWEEN t-7d AND t`,
    which is quadratic per heavy customer."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.unix_micros("o_orderdate").alias("order_us"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"))
    w = (Window.partitionBy("o_custkey").orderBy("order_us")
         .rangeBetween(-US_PER_WEEK_RANGE, 0))
    return (o.select("o_orderkey", "o_custkey", "order_us",
                     F.sum("cents").over(w).alias("trailing_cents"),
                     F.count(F.lit(1)).over(w).alias("n_in_window")))


# --------------------------------------------------------------------------
# A8 — rolling z-score anomaly detection (exact-integer variance test)
# --------------------------------------------------------------------------

ZSCORE_W = 24   # trailing window: 24 one-hour buckets, current excluded
ZSCORE_K = 3    # flag when |n - mean| > K sigma


@query(
    "a8_anomaly_hours",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, epoch_us(date_trunc('hour', ts)) AS hour_us,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
), win AS (
  SELECT event_type, hour_us, n_events,
         COUNT(*)        OVER w AS w_n,
         SUM(n_events)   OVER w AS s,
         SUM(n_events * n_events) OVER w AS ss
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour_us
               ROWS BETWEEN {ZSCORE_W} PRECEDING AND 1 PRECEDING)
)
SELECT event_type, hour_us, n_events,
       CAST(CASE WHEN w_n = {ZSCORE_W}
                  AND (n_events * {ZSCORE_W} - s)
                      * (n_events * {ZSCORE_W} - s)
                      > {ZSCORE_K * ZSCORE_K} * ({ZSCORE_W} * ss - s * s)
                 THEN 1 ELSE 0 END AS INTEGER) AS is_anomaly
FROM win
""",
)
def a8_anomaly_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection over the hourly event-rate
    series: an hour is anomalous when its count deviates from the
    trailing 24-hour mean by more than {ZSCORE_K} standard deviations
    — the alerting rule behind every rate monitor, with the variance
    test kept in EXACT integers: z² > K² rewritten as
    (n·W − S)² > K²·(W·SS − S²) over the window's count/sum/
    sum-of-squares, so no float sqrt or division can flip a boundary
    hour between engines.  Hours whose trailing window is not yet
    full never flag (w_n = W guard) — deterministic cold-start.

    Scale shape: the hourly rollup is one map-side-combined exchange
    (`a7_event_rate_windows`'s plan); the three rolling aggregates
    share ONE window frame over the per-type hour series, so
    Catalyst plans one exchange on event_type + one in-partition
    sort — the series length is hours-per-type, bounded by wall
    time, not event volume.  At 100 TB the same two-stage shape
    holds: the raw stream never reaches the window, only the
    hourly rollup does."""
    e = timed_events(spark, sf_dir)
    hourly = (e.groupBy("event_type",
                        F.unix_micros(F.date_trunc("hour", "ts"))
                        .alias("hour_us"))
              .agg(F.count(F.lit(1)).alias("n_events")))
    w = (Window.partitionBy("event_type").orderBy("hour_us")
         .rowsBetween(-ZSCORE_W, -1))
    dev = F.col("n_events") * ZSCORE_W - F.col("s")
    thresh = (ZSCORE_K * ZSCORE_K) * (ZSCORE_W * F.col("ss")
                                      - F.col("s") * F.col("s"))
    return (hourly
            .withColumn("w_n", F.count(F.lit(1)).over(w))
            .withColumn("s", F.sum("n_events").over(w))
            .withColumn("ss", F.sum(F.col("n_events") * F.col("n_events"))
                        .over(w))
            .select("event_type", "hour_us", "n_events",
                    F.when((F.col("w_n") == ZSCORE_W)
                           & (dev * dev > thresh), 1)
                    .otherwise(0).cast("int").alias("is_anomaly")))


# --------------------------------------------------------------------------
# W8-shape: time-series gap fill (regularize + LOCF) — the resample
# step before any forecasting/feature pipeline
# --------------------------------------------------------------------------

@query(
    "w8_gap_fill",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(value * 1000000, 0) AS BIGINT)) AS BIGINT) AS sv
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
), span AS (
  SELECT user_id, MIN(day) AS mn, MAX(day) AS mx FROM daily GROUP BY 1
), grid AS (
  -- generate_series as a list function (the table-function form does
  -- not accept correlated arguments in DuckDB)
  SELECT user_id,
         CAST(unnest(generate_series(CAST(mn AS TIMESTAMP),
                                     CAST(mx AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM span
)
SELECT g.user_id,
       strftime(g.day, '%Y-%m-%d') AS day_s,
       COALESCE(d.n, 0) AS n_events,
       last_value(d.sv IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.day
         ROWS UNBOUNDED PRECEDING) AS filled_value_e6,
       CAST(CASE WHEN d.n IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_gap
FROM grid g LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
""",
)
def w8_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize each user's daily event series onto a dense calendar
    grid over [first_day, last_day], filling gaps with count 0 and
    carrying the last observed daily value-sum forward (LOCF) — the
    resample-and-fill step that precedes every forecasting or
    session-feature pipeline (time-series models need equally spaced
    observations; raw event logs never are).

    Spark-first shape: per-user span is one map-side-combined agg;
    the dense grid is `explode(sequence(min_day, max_day))` — grid
    generation is JVM-side and parallel, never a driver loop; the
    LOCF is one `last(ignorenulls)` running window per user.  The
    grid left-joins the daily rollup on (user_id, day): both sides
    are already partitioned by user_id, and the window reuses that
    same exchange.  Row count is Σ span-days per user — bounded by
    users × calendar days, independent of raw event volume, so the
    operator's output is SMALLER than its input at real scale.

    Determinism: the value channel is an exact e6 fixed-point BIGINT
    sum (integer addition commutes, so summation order cannot drift
    the hash, and BIGINT serializes identically on both engines —
    the repo-wide `*_cents`/`*_e6` output convention), and the first
    grid day per user is by construction observed, so LOCF never
    emits NULL.
    """
    e = timed_events(spark, sf_dir)
    daily = (e.select("user_id", F.to_date("ts").alias("day"),
                      F.round(F.col("value") * 1000000, 0)
                      .cast("long").alias("v"))
             .groupBy("user_id", "day")
             .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")))
    span = daily.groupBy("user_id").agg(F.min("day").alias("mn"),
                                        F.max("day").alias("mx"))
    grid = span.select(
        "user_id",
        F.explode(F.expr("sequence(mn, mx, interval 1 day)")).alias("day"))
    w = (Window.partitionBy("user_id").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (grid.join(daily, ["user_id", "day"], "left")
            .select("user_id",
                    F.date_format("day", "yyyy-MM-dd").alias("day_s"),
                    F.coalesce("n", F.lit(0)).alias("n_events"),
                    F.last("sv", ignorenulls=True).over(w)
                    .alias("filled_value_e6"),
                    F.when(F.col("n").isNull(), 1).otherwise(0)
                    .cast("int").alias("is_gap")))


# --------------------------------------------------------------------------
# J8-shape: point-in-time (temporal) join — facts against an SCD2
# dimension, resolved with a union-window instead of an interval join
# --------------------------------------------------------------------------

@query(
    "j8_temporal_join",
    oracle="""
WITH o AS (
  SELECT o_custkey, o_orderpriority AS attr,
         epoch_us(o_orderdate) AS t, o_orderkey,
         lag(o_orderpriority) OVER w AS prev
  FROM orders
  WHERE o_orderdate IS NOT NULL
  WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate), o_orderkey)
), chg AS (
  -- SCD2 version-open events (same dimension build as s4)
  SELECT o_custkey, attr, t, o_orderkey
  FROM o WHERE prev IS NULL OR attr <> prev
), facts AS (
  SELECT o2.o_custkey, epoch_us(l.l_shipdate) AS t,
         CAST(round(l.l_quantity * 100, 0) AS BIGINT) AS qty
  FROM lineitem l JOIN orders o2 ON l.l_orderkey = o2.o_orderkey
  WHERE l.l_shipdate IS NOT NULL
), tagged AS (
  SELECT o_custkey, t, o_orderkey AS seq, attr,
         NULL::BIGINT AS qty, 0 AS is_fact
  FROM chg
  UNION ALL
  SELECT o_custkey, t, NULL, NULL, qty, 1 FROM facts
), resolved AS (
  SELECT is_fact, qty,
         last_value(attr IGNORE NULLS) OVER (
           PARTITION BY o_custkey ORDER BY t, is_fact, seq
           ROWS UNBOUNDED PRECEDING) AS attr_at_ship
  FROM tagged
)
SELECT attr_at_ship,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(qty) AS BIGINT) AS sum_qty_cents
FROM resolved WHERE is_fact = 1 GROUP BY attr_at_ship
""",
)
def j8_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: every shipped lineitem is attributed to the
    customer's order-priority version VALID AT ITS SHIP DATE (the SCD2
    dimension `s4_scd2_dimension` builds), then rolled up per
    attributed priority — the canonical "fact ⋈ dimension AS OF fact
    time" every warehouse needs for non-leaking feature joins (using
    today's dimension row for last year's fact is label leakage).

    Spark-first: NO interval join.  Dimension change events and facts
    are unioned into one stream per customer, sorted by (t, is_fact,
    seq) — a version opening at t applies to facts at t, dims sort
    first, and same-instant dim changes resolve to the max orderkey,
    the same tie rule as the s4 build — and ONE running
    `last(attr, ignorenulls)` window resolves every fact.  That is a
    single shuffle on the business key and a linear scan per key; an
    interval join would enumerate (fact × candidate-version) pairs and
    re-filter, strictly worse at 100 TB.  Ship dates trail order dates
    by months, so versions genuinely interleave with facts.

    The quantity channel is exact cents fixed-point BIGINT (the
    repo-wide integer output convention — DECIMAL serializes
    differently across engines); output cardinality is the number of
    distinct priority values.
    """
    from .relational import scd2_change_rows

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    chg = (scd2_change_rows(o)
           .select("o_custkey", "t", F.col("o_orderkey").alias("seq"),
                   "attr",
                   F.lit(None).cast("long").alias("qty"),
                   F.lit(0).alias("is_fact")))
    facts = (li.where(F.col("l_shipdate").isNotNull())
             .join(o.select("o_orderkey", "o_custkey"),
                   F.col("l_orderkey") == F.col("o_orderkey"))
             .select("o_custkey", F.unix_micros("l_shipdate").alias("t"),
                     F.lit(None).cast("long").alias("seq"),
                     F.lit(None).cast("string").alias("attr"),
                     F.round(F.col("l_quantity") * 100, 0)
                     .cast("long").alias("qty"),
                     F.lit(1).alias("is_fact")))
    w = (Window.partitionBy("o_custkey").orderBy("t", "is_fact", "seq")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (chg.unionByName(facts)
            .withColumn("attr_at_ship",
                        F.last("attr", ignorenulls=True).over(w))
            .where(F.col("is_fact") == 1)
            .groupBy("attr_at_ship")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.sum("qty").alias("sum_qty_cents")))


# --------------------------------------------------------------------------
# A9 — Markov event-transition matrix (sequence mining)
# --------------------------------------------------------------------------

@query(
    "a9_markov_transitions",
    oracle="""
WITH seq AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst
  FROM events WHERE ts IS NOT NULL
), pair AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n_trans
  FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2
)
-- CAST pins the result to BIGINT: DuckDB's SUM(BIGINT) returns
-- HUGEINT, which would otherwise propagate through // and serialize
-- differently from Spark's long on the driver's hash path.
SELECT src, dst, n_trans,
       CAST(n_trans * 1000000
            // SUM(n_trans) OVER (PARTITION BY src) AS BIGINT) AS p_e6
FROM pair
""",
)
def a9_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for every ordered pair of event types, how often does
    `dst` immediately follow `src` in some user's timeline, and what
    fraction of `src`'s outgoing transitions is that (e6 fixed-point,
    floor division — exact on both engines).  This is the sequence-
    mining primitive behind next-event prediction, funnel discovery
    and session-model features.

    Spark-first: `lead()` over (user_id | ts, event_id) is one
    exchange on user_id + an in-partition sort — the same partitioning
    every per-user operator here reuses; the pair count is a second,
    tiny exchange on (src, dst) with map-side combine (output
    cardinality = |types|², independent of event volume); the row
    total for the probability is a window over that tiny table, not
    over events.  At 100 TB only the first exchange touches raw data,
    and it is the partitioning the source would already be bucketed
    by."""
    e = timed_events(spark, sf_dir)
    uw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pair = (e.select(F.col("event_type").alias("src"),
                     F.lead("event_type").over(uw).alias("dst"))
            .where(F.col("dst").isNotNull())
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("n_trans")))
    return pair.select(
        "src", "dst", "n_trans",
        F.expr("n_trans * 1000000 div sum(n_trans) over (partition by src)")
         .alias("p_e6"))


# --------------------------------------------------------------------------
# W9 — sliding (overlapping) windows: 1 h span, 15 min slide
# --------------------------------------------------------------------------

@query(
    "w9_sliding_windows",
    oracle="""
SELECT (epoch_us(ts) // 900000000) * 900000000 - i * 900000000
         AS window_start_us,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events CROSS JOIN (SELECT CAST(UNNEST([0, 1, 2, 3]) AS BIGINT) AS i)
WHERE ts IS NOT NULL
GROUP BY 1, 2
""",
)
def w9_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type rates over SLIDING 1-hour windows advancing every
    15 minutes — the smoothed-rate / rolling-SLA shape `
    a7_event_rate_windows`'s tumbling hours cannot express (a spike at
    :59 is invisible to the :00 bucket boundary).

    Spark-first: `F.window(ts, '1 hour', '15 minutes')` plans as a
    4-way Expand (each event replicated to the span/slide = 4 windows
    it belongs to) feeding ONE exchange on (window, type) with
    map-side partial aggregation — Catalyst's native sliding-window
    lowering, no self-join and no UDF.  The oracle replays the same
    replication arithmetically: window starts are the event's
    15-minute floor minus 0..3 slides (epoch-aligned exactly like
    Spark's windowing).  At 100 TB the fan-out factor is the fixed
    span/slide ratio, and the only exchange is on keys whose
    cardinality is wall-clock × |types|, not event volume.  The same
    expression runs under `readStream` + watermark for the continuous
    twin (`stream_event_rates`)."""
    e = timed_events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"),
                  "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.round(F.col("value") * 100, 0).cast("long"))
              .alias("value_cents"))
        .select(F.unix_micros("w.start").alias("window_start_us"),
                "event_type", "n_events", "value_cents")
    )


# --------------------------------------------------------------------------
# A10 — top event trigrams (second-order path mining)
# --------------------------------------------------------------------------

PATHS_TOP_K = 20


@query(
    "a10_top_paths",
    oracle=f"""
WITH seq AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), paths AS (
  SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n_paths
  FROM seq WHERE e3 IS NOT NULL GROUP BY 1, 2, 3
)
SELECT e1, e2, e3, n_paths FROM paths
ORDER BY n_paths DESC, e1, e2, e3 LIMIT {PATHS_TOP_K}
""",
)
def a10_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {k} most common 3-step event paths across all user
    timelines — second-order sequence mining on top of
    `a9_markov_transitions`' first-order matrix (a funnel DISCOVERY
    tool: `a6_funnel` measures a path you name, this surfaces the
    paths worth naming).

    Spark-first: two `lead()` offsets share ONE window spec, so
    Catalyst plans a single exchange on user_id + one in-partition
    sort for both; the trigram rollup is a second exchange bounded by
    |types|³ keys after map-side combine, and the global top-k is
    TakeOrderedAndProject (per-partition heads merged on the driver,
    never a full sort).  Ties break on the path labels so the cut is
    total and engine-independent."""
    e = timed_events(spark, sf_dir)
    uw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (e.select(F.col("event_type").alias("e1"),
                     F.lead("event_type", 1).over(uw).alias("e2"),
                     F.lead("event_type", 2).over(uw).alias("e3"))
            .where(F.col("e3").isNotNull())
            .groupBy("e1", "e2", "e3")
            .agg(F.count(F.lit(1)).alias("n_paths"))
            .orderBy(F.col("n_paths").desc(), "e1", "e2", "e3")
            .limit(PATHS_TOP_K))


a10_top_paths.__doc__ = a10_top_paths.__doc__.format(k=PATHS_TOP_K)


# Persisted-frame memo, scoped like clustering's _TRI_PINNED: each
# SCOPE (one call site / query build) evicts only ITS OWN previous
# build's frames when a new build starts, never another plan's — a
# count-based FIFO could unpersist a frame an already-built-but-not-
# yet-executed plan still depends on, re-exposing the boundary-
# resampling hazard the persist exists to prevent.  Building query X
# twice and then executing the FIRST build is the one unsupported
# pattern (same contract as _TRI_PINNED repo-wide).
_RANK_PINNED: dict[str, list] = {}


def _evict_scope(scope: str) -> None:
    for df in _RANK_PINNED.pop(scope, []):
        try:
            df.unpersist()
        except Exception:
            pass  # a dead session's blocks are already gone


def _pin(df: DataFrame, scope: str) -> DataFrame:
    df = df.persist()
    _RANK_PINNED.setdefault(scope, []).append(df)
    return df


def exact_global_rank(df: DataFrame, order_cols, rank_name: str = "_grank",
                      n_parts: int = 0,
                      scope: str = "exact_global_rank") -> DataFrame:
    """Exact 1-based global rank under a TOTAL order, computed the
    distributed way — no single-partition sort, no driver collect.
    Returns the input columns plus TWO helpers: `rank_name` and
    `_ntotal` (the frame's row count — callers computing quantile
    buckets need it; drop it otherwise).  Steps:

      1. range-partition on the order columns (each partition holds a
         contiguous rank interval),
      2. `row_number()` WITHIN each partition (Window partitioned by
         `spark_partition_id()` — an in-partition sort, no exchange),
      3. per-partition counts (≤ shuffle-partitions rows) turned into
         prefix offsets via a cumulative window over the count table —
         a single-partition window, but over a frame bounded by
         CLUSTER CONFIG (≤ P rows), never by data; the r13-era
         triangular self-join avoided the single-partition WindowExec
         at the cost of O(P²) intermediate rows, the wrong trade once
         P is thousands (VERDICT r13 item 5) — and
      4. a broadcast join adding offset + local row number.

    The range-partitioned frame feeds two branches (ranks + counts);
    it is persisted and pinned so both read the SAME materialization
    — `repartitionByRange` samples its boundaries per execution, so
    two independent evaluations could disagree on which partition a
    row lands in, corrupting the offsets.  At 100 TB this is the
    standard zipWithIndex-free global-rank shape: one range exchange
    over the data plus a bounded (≤ #partitions row) offset table."""
    spark = df.sparkSession
    if not n_parts:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    _evict_scope(scope)
    rp = _pin(df.repartitionByRange(n_parts, *order_cols)
              .withColumn("_pid", F.spark_partition_id()), scope)
    lw = Window.partitionBy("_pid").orderBy(*order_cols)
    counts = rp.groupBy("_pid").agg(F.count(F.lit(1)).alias("_pn"))
    # Prefix offsets + total via ONE cumulative window over the count
    # table (VERDICT r13 item 5, guide §2.2): the previous triangular
    # `_bpid < _pid` self-join emitted O(P²) rows — the one shape that
    # degraded with `spark.sql.shuffle.partitions`.  The window IS
    # single-partition (empty partitionBy), which is exactly why the
    # join form existed — but it runs over the ≤ #partitions-row COUNT
    # TABLE, bounded by cluster configuration, never by data: a few
    # thousand 16-byte rows through one task versus millions of
    # triangular join rows at the same P.  offset + total still fold
    # into ONE ≤#partitions-row broadcast frame for the ranked side.
    pw = Window.orderBy("_pid")
    meta = counts.select(
        "_pid",
        F.coalesce(
            F.sum("_pn").over(pw.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0)).alias("_off"),
        F.sum("_pn").over(pw.rowsBetween(Window.unboundedPreceding,
                                         Window.unboundedFollowing))
        .cast("long").alias("_ntotal"))
    return (rp.withColumn("_lrank", F.row_number().over(lw))
            .join(F.broadcast(meta), "_pid")
            .withColumn(rank_name,
                        (F.col("_off") + F.col("_lrank")).cast("long"))
            .drop("_pid", "_lrank", "_off"))


def _ntile_bucket(k: int, rank_col: str = "_grank",
                  total_col: str = "_ntotal"):
    """The NTILE(k) arithmetic as an integer column expression: with
    n rows, q = n div k and r = n mod k, the first r buckets hold
    q+1 rows.  Integer division throughout (expr's div, never /):
    when q = 0 the otherwise-branch would divide by zero, but rank
    <= t always holds there (t = n), and CaseWhen evaluates ONLY the
    matched branch per row — which is the load-bearing guard under
    Spark 4's default ANSI mode, where an *evaluated* div-by-zero
    THROWS (the q2 lesson, r12 dims corpus); the n < k cells in
    tests/test_exact_ntile.py pin it.  Do not rewrite this as
    arithmetic over both branches."""
    q = F.expr(f"{total_col} div {k}")
    r = F.expr(f"{total_col} % {k}")
    t = (q + 1) * r
    rk = F.col(rank_col)
    return 1 + (F.when(
        rk <= t,
        F.expr(f"({rank_col} - 1) div ({total_col} div {k} + 1)"))
        .otherwise(F.expr(
            f"{total_col} % {k} + ({rank_col} - ({total_col} div {k} + 1)"
            f" * ({total_col} % {k}) - 1) div ({total_col} div {k})")))


def exact_ntile_stacked(df: DataFrame, k: int, dims, key: str,
                        n_parts: int = 0,
                        scope: str = "exact_ntile_stacked",
                        carry=()) -> DataFrame:
    """NTILE(k)-exact scores for SEVERAL numeric dimensions over ONE
    shared range exchange — the amortized form of `exact_ntile` for
    multi-score rollups like RFM.

    `dims` is a list of (out_name, ascending-numeric Column); a
    descending dimension is passed negated.  Each input row explodes
    into |dims| (dim_id, value) rows; ONE `repartitionByRange` on
    (dim_id, value, key) makes every dimension's rows contiguous and
    totally ordered, so one in-partition `row_number` per (partition,
    dim) plus per-(partition, dim) prefix offsets (≤ #partitions ×
    |dims| rows, cumulative-window-scanned and broadcast) yields every
    dimension's exact global rank simultaneously.  Scores reassemble
    with one conditional-max rollup on `key` — no per-dimension join.

    `carry` (column names of `df`) rides each stacked row through the
    range exchange and re-emerges in the output via max() (the copies
    are identical per key) — callers needing the input columns next
    to the scores then skip a join back to `df` AND the persist that
    second consumer of `df` would force.  The trade: the range
    shuffle carries |dims|× the carry bytes, so carry slim columns
    (scores-next-to-measures), never wide payloads — at rollup scale
    (already 1000×-reduced at 100 TB) a few carried longs are noise
    next to the avoided shuffle join.

    Against the one-dimension-at-a-time form this is 1 boundary-
    sampling job, 1 shuffle, and 1 persisted frame instead of |dims|
    of each; the tie-broken total order makes it skew-proof the same
    way (equal values split across partitions by key, never pile
    up).  The boundary sampling is load-bearing for that skew-
    proofing: only a sampler over the composite (dim, v, key) key can
    split a heavily-repeated value across partitions at its key
    boundaries, so it cannot be replaced by precomputed per-dim value
    quantiles without re-creating the pile-up it exists to prevent
    (measured in round 7 — see COVERAGE.md)."""
    spark = df.sparkSession
    if not n_parts:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    reserved = {"dim", "v", "dv", "_pid", "_lrank", "_grank", "_off",
                "_pn", "_ntotal", key} | {out for out, _ in dims}
    carry = tuple(carry)
    clash = reserved.intersection(carry)
    if clash or len(set(carry)) != len(carry):
        dupes = sorted({c for c in carry if carry.count(c) > 1})
        raise ValueError(
            f"carry columns {sorted(clash) or dupes} collide with the "
            "stacked rank machinery's internal names, the key, a dims "
            f"out_name, or each other ({sorted(reserved)}); rename "
            "them before stacking")
    stacked = df.select(
        key, *carry,
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("dim"), c.cast("long").alias("v"))
            for i, (_, c) in enumerate(dims)])).alias("dv")
    ).select(key, *carry, "dv.dim", "dv.v")
    _evict_scope(scope)
    rp = _pin(stacked.repartitionByRange(n_parts, "dim", "v", key)
              .withColumn("_pid", F.spark_partition_id()), scope)
    lw = Window.partitionBy("_pid", "dim").orderBy("v", key)
    counts = rp.groupBy("_pid", "dim").agg(F.count(F.lit(1)).alias("_pn"))
    # Prefix offsets + per-dim totals as ONE cumulative window over the
    # ≤ #partitions×|dims|-row count table (VERDICT r13 item 5, guide
    # §2.2): the previous triangular `_bdim = dim AND _bpid < _pid`
    # self-join emitted O(P²·|dims|) intermediate rows — harmless at
    # P=32 but the one shape in the repo that got WORSE with cluster
    # size (P is thousands at the 100 TB target).  The window's
    # exchange moves only the count table itself (hash on `dim`,
    # |dims| keys), and both frames share one WindowExec: running sum
    # excluding the current row = the offset, whole-partition sum =
    # the dimension's total.  Values are identical to the join form.
    pw = Window.partitionBy("dim").orderBy("_pid")
    meta = counts.select(
        "_pid", "dim",
        F.coalesce(
            F.sum("_pn").over(pw.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0)).alias("_off"),
        F.sum("_pn").over(pw.rowsBetween(Window.unboundedPreceding,
                                         Window.unboundedFollowing))
        .cast("long").alias("_ntotal"))
    bucket = _ntile_bucket(k)
    # meta stays the one ≤#partitions×|dims|-row broadcast carrying
    # offset AND total: a single BroadcastHashJoin on the ranked side.
    ranked = (rp.withColumn("_lrank", F.row_number().over(lw))
              .join(F.broadcast(meta), ["_pid", "dim"])
              .withColumn("_grank",
                          (F.col("_off") + F.col("_lrank")).cast("long")))
    return ranked.groupBy(key).agg(
        *[F.max(F.when(F.col("dim") == i, bucket)).cast("long").alias(out)
          for i, (out, _) in enumerate(dims)],
        *[F.max(c).alias(c) for c in carry])


def exact_ntile(df: DataFrame, k: int, order_cols, out_name: str,
                keys=("c_custkey",), scope: str = "") -> DataFrame:
    """SQL-NTILE(k)-exact bucket assignment at any scale: global rank
    via `exact_global_rank`, then the NTILE arithmetic — with
    n rows, q = n div k and r = n mod k, the first r buckets hold
    q+1 rows — applied as integer expressions.  Bit-identical to
    `NTILE(k) OVER (ORDER BY ...)` when the order is total, without
    the single-partition sort NTILE itself plans.  Returns only
    (keys..., out_name) for joining back on the business key."""
    ranked = exact_global_rank(df, order_cols,
                               scope=scope or f"exact_ntile:{out_name}")
    return ranked.select(
        *keys, _ntile_bucket(k).cast("long").alias(out_name))


@query(
    "a11_rfm_segments",
    oracle="""
WITH ref AS (
  SELECT MAX(o_orderdate) AS max_date FROM orders
), rfm AS (
  SELECT o_custkey AS c_custkey,
         CAST(date_diff('day', MAX(o_orderdate), max_date) AS BIGINT)
           AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM orders CROSS JOIN ref
  GROUP BY o_custkey, max_date
), scored AS (
  SELECT c_custkey, recency_days, frequency, monetary_cents,
         CAST(NTILE(5) OVER (ORDER BY recency_days ASC, c_custkey)
              AS BIGINT) AS r_score,
         CAST(NTILE(5) OVER (ORDER BY frequency DESC, c_custkey)
              AS BIGINT) AS f_score,
         CAST(NTILE(5) OVER (ORDER BY monetary_cents DESC, c_custkey)
              AS BIGINT) AS m_score
  FROM rfm
)
SELECT c_custkey, recency_days, frequency, monetary_cents,
       r_score, f_score, m_score,
       r_score * 100 + f_score * 10 + m_score AS rfm_code
FROM scored
ORDER BY c_custkey
""",
)
def a11_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation —
    the standard behavioral-cohort rollup a marketing/analytics stack
    derives from the order history the reference's WFRun store records
    per customer workflow.

    Each active customer gets days-since-last-order, order count, and
    lifetime spend in exact cents (BIGINT — integer addition commutes
    and serializes identically on both engines), then a 1-5 quintile
    score per dimension packed into the classic 3-digit RFM code.

    The quintiles are NTILE(5)-exact with c_custkey tiebreaks (a
    total order, so both engines cut identical quintiles) but are NOT
    computed with a global-NTILE window: all three dimensions run
    through ONE `exact_ntile_stacked` pass — explode to (dim, value)
    rows, one shared range exchange, in-partition row_number, prefix
    offsets from a ≤ #partitions×3-row count table, conditional-max
    reassembly.  No operator in the plan moves all customers through
    one task, so the segmentation survives a 100× customer count
    where the textbook NTILE would funnel into a single-partition
    sort.

    Scale shape: the per-customer rollup is one map-side-combined
    exchange on o_custkey; the global reference date is a 1-row
    broadcast; then one range exchange over the 3×-stacked rollup,
    one rollup back to per-customer scores, and one join to the
    pinned rollup."""
    o = load_table(spark, sf_dir, "orders")
    ref = o.agg(F.max("o_orderdate").alias("max_date"))
    # The measures ride the stacked rank exchange as `carry` columns
    # (3 longs × 3 dims at rollup scale): no join back to the rollup,
    # one fewer shuffle.  The rollup STAYS pinned even with a single
    # consumer — repartitionByRange's boundary sampler is a separate
    # pass over the child lineage, so an unpinned rollup would execute
    # the orders scan + aggregate twice (measured: the pin + carry
    # combination is the fastest of the four arrangements).
    _evict_scope("a11:rfm")
    rfm = _pin(o.crossJoin(F.broadcast(ref))
               .groupBy(F.col("o_custkey").alias("c_custkey"))
               .agg(F.datediff(F.max("max_date"), F.max("o_orderdate"))
                    .cast("long").alias("recency_days"),
                    F.count(F.lit(1)).alias("frequency"),
                    F.sum(F.round(F.col("o_totalprice") * 100, 0)
                          .cast("long"))
                    .alias("monetary_cents")), "a11:rfm")
    scores = exact_ntile_stacked(rfm, 5, [
        ("r_score", F.col("recency_days")),       # asc
        ("f_score", -F.col("frequency")),         # desc via negation
        ("m_score", -F.col("monetary_cents")),    # desc via negation
    ], key="c_custkey", scope="a11:ntile",
        carry=("recency_days", "frequency", "monetary_cents"))
    return (scores
            .select("c_custkey", "recency_days", "frequency",
                    "monetary_cents", "r_score", "f_score", "m_score")
            .withColumn("rfm_code", F.expr("r_score * 100 + f_score * 10"
                                           " + m_score"))
            .orderBy("c_custkey"))
