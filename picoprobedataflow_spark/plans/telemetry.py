"""Flow-telemetry analytics — the reference's flagship batch workload
(``picoprobe/flow_analyzer.py`` + ``examples/xloop2023/performance.ipynb``)
re-expressed over the ``events`` table (event_id, ts:int64-ns, user_id,
event_type, value, props).

Mapping of reference entities → test schema: a *flow run* ≙ ``user_id``,
a *step* ≙ ``event_type``, the transitions log's epoch-ns ``state_time``
≙ ``ts``. Every query is lazy DataFrame composition — Catalyst fuses
filter→pivot→agg into two shuffle stages where the reference does an
eager per-run pandas loop with O(n²) concat (flow_analyzer.py:166-226).

Numeric discipline (oracle parity): all time arithmetic stays in exact
int64 microseconds (DuckDB truncates parquet TIMESTAMP_NS to us;
Spark mirrors it with ``ts div 1000``); seconds appear only via the
exact-integer half-up helpers below (``_us_to_sec4`` & twins) — the
ROUNDING decision itself happens on BIGINTs, never on a double
approximation, because ``round(us/1e6, 4)`` provably splits between
engines on true half-way values (round-7 sf0.1 audit). Only genuinely
order-sensitive floats (stddev, the overhead ratio median) rely on
rounding headroom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from picoprobedataflow_spark.plans.catalog import query
from picoprobedataflow_spark.plans.common import EVENT_TYPES, cents, events_us


# --------------------------------------------------------------------------
# Flagship — describe_runtimes + notebook cell 4 in one statement
# (SURVEY §2: A1, A2, A10, W1; reference flow_analyzer.py:115-135)
# --------------------------------------------------------------------------

def _mean_us_to_sec4(sum_col: str, n_col: str) -> F.Column:
    """Σµs / n → seconds rounded HALF-UP to 4 decimals with the
    half-up decision in EXACT BIGINT arithmetic:
    ((2·Σ + 100·n) div (200·n)) / 1e4 for nonnegative sums (spans
    and ordered gaps are nonnegative by construction). The naive
    round(Σ/(n·1e6), 4) rounds a double approximation and diverges
    between engines when the true mean lands exactly on a half-way
    boundary — the run_overhead failure class. `div` (not floor of a
    double quotient) because 2·Σ can exceed 2^53."""
    return (F.expr(f"(2 * {sum_col} + 100 * {n_col}) "
                   f"div (200 * {n_col})").cast("double") / F.lit(1e4))


#: Oracle twin of :func:`_mean_us_to_sec4`. Operands are CAST to
#: BIGINT inside the template (round 9): DuckDB types small integer
#: operands INT32 and the 2·s + 100·n addition then overflows at
#: |s| ≳ 2^30 — the catalog oracles all feed BIGINT columns, but the
#: template itself must be total for any integer operand (found by
#: the hypothesis half-up property test).
_MEAN_SEC4_SQL = ("CAST((2 * CAST({s} AS BIGINT) "
                  "+ 100 * CAST({n} AS BIGINT)) "
                  "// (200 * CAST({n} AS BIGINT)) "
                  "AS DOUBLE) / 1e4")


def _median_us_to_sec4(med_col: str) -> F.Column:
    """median(µs) → seconds rounded HALF-UP to 4 decimals, exactly.
    A BIGINT median is integer- or half-integer-valued, so 2·median
    is an exact BIGINT; half-up at 100 µs is then
    sign · ((|2·med| + 100) div 200) / 1e4 — engine-stable where
    round(median/1e6, 4) is not (same failure class as the mean)."""
    med2 = F.expr(f"CAST(round(2 * {med_col}) AS BIGINT)")
    sign = F.when(med2 < 0, F.lit(-1)).otherwise(F.lit(1)).cast("long")
    q = F.expr(f"(abs(CAST(round(2 * {med_col}) AS BIGINT)) + 100) "
               "div 200")
    return (sign * q).cast("double") / F.lit(1e4)


#: Oracle twin of :func:`_median_us_to_sec4` (`{m}` = the median
#: expression, evaluated once via a wrapping SELECT where needed).
_MEDIAN_SEC4_SQL = (
    "CAST(CASE WHEN {m} < 0 THEN -1 ELSE 1 END "
    "* ((abs(CAST(round(2 * ({m})) AS BIGINT)) + 100) // 200) "
    "AS DOUBLE) / 1e4")


def _us_to_sec4(col: F.Column) -> F.Column:
    """Integer µs → seconds rounded HALF-UP to 4 decimals via EXACT
    integer arithmetic: sign · ((|µs| + 50) div 100) / 1e4. Rounding
    a float division instead (round(us/1e6, 4)) is engine-unstable
    exactly at half-way values — observed at sf0.1: an overhead of
    …929750 µs rounded to …9298 on Spark and …9297 on DuckDB because
    each engine rounds its own double APPROXIMATION of the ratio.
    Here the half-up decision happens on exact BIGINTs (the catalog's
    exact-int-keys discipline) and the final /1e4 is the same
    correctly-rounded division of the same integer on both engines —
    bit-identical at any scale. floor(double-div by 100) is safe:
    quotients ≤ ~1e11 with fractional parts in hundredths, far above
    the 0.5-ulp division error."""
    sign = F.when(col < 0, F.lit(-1)).otherwise(F.lit(1)).cast("long")
    q = F.floor((F.abs(col) + F.lit(50)) / F.lit(100)).cast("long")
    return (sign * q).cast("double") / F.lit(1e4)


#: The oracle twin of :func:`_us_to_sec4` — same exact-integer
#: half-up, same final division. BIGINT cast for the same INT32
#: totality reason as `_MEAN_SEC4_SQL`.
_SEC4_SQL = ("CAST(CASE WHEN {us} < 0 THEN -1 ELSE 1 END "
             "* ((abs(CAST({us} AS BIGINT)) + 50) // 100) "
             "AS DOUBLE) / 1e4")



@query(
    "flow_step_runtime_summary",
    oracle=f"""
WITH span AS (
  SELECT user_id, event_type,
         epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us,
         count(*) AS n_events
  FROM events GROUP BY user_id, event_type
),
g AS (
  SELECT event_type,
         CAST(sum(span_us) AS BIGINT)   AS sum_us,
         count(*)                       AS n,
         median(span_us)                AS med_us,
         stddev_samp(span_us)           AS std_us,
         min(span_us)                   AS min_us,
         max(span_us)                   AS max_us,
         CAST(sum(n_events) AS BIGINT)  AS n_events
  FROM span GROUP BY event_type
)
SELECT event_type,
       {_MEAN_SEC4_SQL.format(s='sum_us', n='n')}   AS mean_span,
       {_MEDIAN_SEC4_SQL.format(m='med_us')}        AS median_span,
       round(std_us / 1e6, 2)                       AS std_span,
       {_SEC4_SQL.format(us='min_us')}              AS min_span,
       {_SEC4_SQL.format(us='max_us')}              AS max_span,
       n_events
FROM g
""",
    tags=("A1", "A2", "A10", "W1", "flagship"),
)
def flow_step_runtime_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-step runtime distribution: ``describe_runtimes``
    (flow_analyzer.py:115-135; sample-std per pandas default) over
    per-(run, step) spans. Two hash aggregations, no window —
    map-side partial agg on both; at 100 TB the first groupBy is the
    only real shuffle and it is on (user_id, event_type), a high-
    cardinality composite key with no skew. Mean/median/min/max
    seconds round through the exact-integer half-up helpers (the
    run_overhead half-way failure class, found by the round-7 sf0.1
    audit); only stddev — genuinely order-sensitive — keeps the
    float rounding with 2-dp headroom."""
    ev = events_us(spark, sf_dir)
    span = (
        ev.groupBy("user_id", "event_type")
          .agg((F.max("ts") - F.min("ts")).alias("span_us"),
               F.count("*").alias("n_events"))
    )
    g = (span.groupBy("event_type")
         .agg(F.sum("span_us").alias("sum_us"),
              F.count("*").alias("n"),
              F.median("span_us").alias("med_us"),
              F.stddev_samp("span_us").alias("std_us"),
              F.min("span_us").alias("min_us"),
              F.max("span_us").alias("max_us"),
              F.sum("n_events").alias("n_events")))
    return g.select(
        "event_type",
        _mean_us_to_sec4("sum_us", "n").alias("mean_span"),
        _median_us_to_sec4("med_us").alias("median_span"),
        F.round(F.col("std_us") / 1e6, 2).alias("std_span"),
        _us_to_sec4(F.col("min_us")).alias("min_span"),
        _us_to_sec4(F.col("max_us")).alias("max_span"),
        "n_events")


# --------------------------------------------------------------------------
# W1/W2 — event-log pivot into per-step first/last columns
# (flow_analyzer.py:321-346; performance.ipynb cell 8)
# --------------------------------------------------------------------------

def _pivot_oracle() -> str:
    cols = ",\n       ".join(
        f"min(CASE WHEN event_type = '{t}' THEN epoch_us(ts) END) AS {t}_first_us,\n"
        f"       max(CASE WHEN event_type = '{t}' THEN epoch_us(ts) END) AS {t}_last_us"
        for t in EVENT_TYPES
    )
    return f"SELECT user_id,\n       {cols}\nFROM events GROUP BY user_id"


@query("step_event_pivot", oracle=_pivot_oracle(), tags=("W1", "W2"))
def step_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot the event log into per-step start/end columns — the core
    move of ``_get_step_times`` (flow_analyzer.py:321-346). Expressed
    as conditional aggregation (not ``.pivot()``) so it stays a single
    hash aggregate with map-side combine; pivot values are pinned, no
    discovery job."""
    ev = events_us(spark, sf_dir)
    aggs = []
    for t in EVENT_TYPES:
        cond = F.when(F.col("event_type") == t, F.col("ts"))
        aggs.append(F.min(cond).alias(f"{t}_first_us"))
        aggs.append(F.max(cond).alias(f"{t}_last_us"))
    return ev.groupBy("user_id").agg(*aggs)


# --------------------------------------------------------------------------
# A7/A11 — active vs overhead decomposition (performance.ipynb cells 4-6)
# --------------------------------------------------------------------------

_OVERHEAD_SPAN_CTE = """
WITH span AS (
  SELECT user_id, event_type,
         epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us
  FROM events GROUP BY user_id, event_type
),
run AS (
  SELECT user_id, epoch_us(max(ts)) - epoch_us(min(ts)) AS total_us
  FROM events GROUP BY user_id
),
merged AS (
  SELECT r.user_id, r.total_us,
         CAST(sum(s.span_us) AS BIGINT) AS active_us
  FROM run r JOIN span s ON r.user_id = s.user_id
  GROUP BY r.user_id, r.total_us
)
"""








@query(
    "run_overhead",
    oracle=_OVERHEAD_SPAN_CTE + f"""
SELECT user_id,
       {_SEC4_SQL.format(us='total_us')}              AS total_sec,
       {_SEC4_SQL.format(us='active_us')}             AS active_sec,
       {_SEC4_SQL.format(us='(total_us - active_us)')} AS overhead_sec
FROM merged
""",
    tags=("A7", "J1"),
)
def run_overhead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-run active time (Σ per-step spans) vs total span vs
    overhead — notebook cell 4's ``task_time``/``Overhead`` columns.
    The run⋈step join (J1) reuses the (user_id) partitioning from the
    aggregations, so AQE plans it without an extra shuffle. Seconds
    columns round through :func:`_us_to_sec4` (exact-integer
    half-up): the float-rounding form diverged between engines on a
    half-way µs value at sf0.1."""
    ev = events_us(spark, sf_dir)
    span = (ev.groupBy("user_id", "event_type")
              .agg((F.max("ts") - F.min("ts")).alias("span_us")))
    run = (ev.groupBy("user_id")
             .agg((F.max("ts") - F.min("ts")).alias("total_us")))
    active = span.groupBy("user_id").agg(F.sum("span_us").alias("active_us"))
    return (
        run.join(active, "user_id")
           .select("user_id",
                   _us_to_sec4(F.col("total_us")).alias("total_sec"),
                   _us_to_sec4(F.col("active_us")).alias("active_sec"),
                   _us_to_sec4(F.col("total_us") - F.col("active_us"))
                   .alias("overhead_sec"))
    )


# --------------------------------------------------------------------------
# Window functions: lag inter-arrival, tail-N, rebase, sequential index
# --------------------------------------------------------------------------

@query(
    "interarrival_stats",
    oracle=f"""
WITH deltas AS (
  SELECT event_type,
         epoch_us(ts) - epoch_us(lag(ts) OVER
            (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events
),
g AS (
  SELECT event_type,
         CAST(sum(gap_us) AS BIGINT) AS sum_us,
         count(gap_us)               AS n,
         min(gap_us)                 AS min_us,
         max(gap_us)                 AS max_us
  FROM deltas GROUP BY event_type
)
SELECT event_type,
       {_MEAN_SEC4_SQL.format(s='sum_us', n='n')} AS mean_gap,
       round(min_us / 1e6, 6) AS min_gap,
       round(max_us / 1e6, 6) AS max_gap,
       n                      AS n_gaps
FROM g
""",
    tags=("W2", "lag"),
)
def interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival gaps via ``lag`` — the natural extension
    of the notebook's pairwise event deltas (SURVEY §2.5). One shuffle
    on user_id for the window, then a partial-agg rollup. The 4-dp
    mean rounds through the exact-integer half-up helper (run_overhead
    failure class); the 6-dp min/max are already grid-exact (a 6-dp
    rounding of integer µs has no half-way case)."""
    ev = events_us(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    deltas = ev.select(
        "event_type", (F.col("ts") - F.lag("ts").over(w)).alias("gap_us"))
    g = deltas.groupBy("event_type").agg(
        F.sum("gap_us").alias("sum_us"),
        F.count("gap_us").alias("n"),
        F.min("gap_us").alias("min_us"),
        F.max("gap_us").alias("max_us"))
    return g.select(
        "event_type",
        _mean_us_to_sec4("sum_us", "n").alias("mean_gap"),
        F.round(F.col("min_us") / 1e6, 6).alias("min_gap"),
        F.round(F.col("max_us") / 1e6, 6).alias("max_gap"),
        F.col("n").alias("n_gaps"))


# --------------------------------------------------------------------------
# Sessionization (ST6 extension) — gap > 30 min starts a new session
# --------------------------------------------------------------------------

def sessionize_lag_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-pinned standalone form of the lag+cumsum sessionization
    (one user_id shuffle shared by both windows); its oracle-gated
    catalog home is the ``lag_cumsum`` family of
    :func:`sessionize_events`."""
    ev = events_us(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.col("ts") - F.lag("ts").over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap_us.isNull() | (gap_us > F.lit(1_800_000_000)), 1)
         .otherwise(0))
    return (flagged.groupBy("user_id")
            .agg(F.sum("new_session").cast("long").alias("n_sessions"),
                 F.count("*").alias("n_events")))


@query(
    "sessionize_events",
    oracle="""
WITH deltas AS (
  SELECT user_id, ts, event_id,
         epoch_us(ts) - epoch_us(lag(ts) OVER
           (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events
),
lagf AS (
  SELECT user_id,
         CASE WHEN gap_us > 1800000000 OR gap_us IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM deltas
),
natf AS (
  SELECT user_id,
         CASE WHEN gap_us >= 1800000000 OR gap_us IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM deltas
),
sess AS (
  SELECT user_id, epoch_us(ts) AS us,
         sum(CASE WHEN gap_us >= 1800000000 OR gap_us IS NULL
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS sid
  FROM deltas
),
spans AS (
  SELECT user_id, sid, count(*) AS n,
         max(us) + 1800000000 AS end_us
  FROM sess GROUP BY 1, 2
),
-- Spark's EventTimeWatermarkExec tracks event-time stats at
-- MILLISECOND precision (us // 1000), so the replay truncates the
-- max timestamp to ms before subtracting the delay — without this
-- the two engines' watermarks differ by up to 999 us and a session
-- ending inside that gap would split emitted/withheld differently.
wm AS (SELECT (max(epoch_us(ts)) // 1000) * 1000 - 7200000000 AS w
       FROM events)
SELECT 'lag_cumsum' AS family, user_id,
       CAST(sum(new_session) AS BIGINT) AS n_sessions,
       CAST(count(*) AS BIGINT)         AS n_events
FROM lagf GROUP BY user_id
UNION ALL
SELECT 'session_window', user_id,
       CAST(sum(new_session) AS BIGINT),
       CAST(count(*) AS BIGINT)
FROM natf GROUP BY user_id
UNION ALL
SELECT 'session_window_append', user_id,
       CAST(count(*) AS BIGINT),
       CAST(sum(n) AS BIGINT)
FROM spans, wm WHERE end_us < w GROUP BY user_id
""",
    tags=("ST6", "sessionization", "session-window", "watermark",
          "append-mode"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization three ways that the hash gate pins
    independently (the third being the production append-mode
    emission semantics — see the family notes below):

    - ``lag_cumsum`` — lag + running sum of session-start flags
      (single shuffle on user_id shared by both windows); a new
      session starts when the gap EXCEEDS 30 min.
    - ``session_window`` (round 3; STREAM-EXECUTED since round 4) —
      Spark's native ``F.session_window``, computed by an actual
      Structured Streaming query: readStream over the events parquet,
      stateful session-window aggregation, availableNow drain into a
      memory sink (the ``streaming_hourly_rates`` pattern). SURVEY
      §2.9's stateful-session generalization thus runs under the
      driver's hash gate as a real stream, not a batch stand-in. The
      merge rule is half-open ([start, start+gap)), so a gap of
      EXACTLY 30 min starts a new session — the oracle replays that
      boundary with ``>=`` where the hand-rolled family uses ``>``,
      making the one-microsecond semantic difference explicit instead
      of papered over.

    Per-user session counts come out of one user_id shuffle either
    way; at scale session_window is the streaming-capable form (state
    keyed by user_id, sessions merged incrementally per microbatch)
    while lag_cumsum generalizes to arbitrary session predicates."""
    from picoprobedataflow_spark.plans.common import (
        drain_stream_to_local,
        stream_events,
        ts_to_us,
    )

    lag_fam = (sessionize_lag_cumsum(spark, sf_dir)
               .select(F.lit("lag_cumsum").alias("family"), "user_id",
                       "n_sessions", "n_events"))
    src = ts_to_us(stream_events(spark, sf_dir))
    evt = src.select("user_id", F.timestamp_micros("ts").alias("tst"))
    # Complete output mode: every session stays in state until the
    # drain finishes, so trailing sessions (whose close the watermark
    # never passes under availableNow) are emitted too.
    sw = (evt.groupBy("user_id", F.session_window("tst", "30 minutes"))
             .agg(F.count("*").alias("n")))
    sessions = drain_stream_to_local(spark, sw)
    native = (sessions.groupBy("user_id")
              .agg(F.count("*").cast("long").alias("n_sessions"),
                   F.sum("n").cast("long").alias("n_events"))
              .select(F.lit("session_window").alias("family"), "user_id",
                      "n_sessions", "n_events"))
    # session_window_append (round 5): the PRODUCTION shape — append
    # mode + watermark, each session emitted exactly once when the
    # watermark (max event time − 2 h) passes its end. The oracle
    # replays the eviction rule (session end < watermark) over the
    # same gap-≥-30-min session reconstruction, so the driver's hash
    # gate pins the append/withheld split, not just the pytest.
    sw_app = (evt.withWatermark("tst", "2 hours")
              .groupBy("user_id", F.session_window("tst", "30 minutes"))
              .agg(F.count("*").alias("n")))
    appended = drain_stream_to_local(spark, sw_app, output_mode="append")
    app_fam = (appended.groupBy("user_id")
               .agg(F.count("*").cast("long").alias("n_sessions"),
                    F.sum("n").cast("long").alias("n_events"))
               .select(F.lit("session_window_append").alias("family"),
                       "user_id", "n_sessions", "n_events"))
    return lag_fam.unionByName(native).unionByName(app_fam)


# --------------------------------------------------------------------------
# Histogram / describe / distinct / funnel
# --------------------------------------------------------------------------

@query(
    "asof_view_before_purchase",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_id, event_type, ts,
         max(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_us
  FROM events
)
SELECT event_id, user_id,
       epoch_us(ts) - last_view_us AS view_to_purchase_us
FROM ordered
WHERE event_type = 'purchase' AND last_view_us IS NOT NULL
""",
    tags=("asof-join",),
)
def asof_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (purchase ← most recent prior view per user) via the
    union-scan window formulation: because ts is the ordering key,
    ``max(ts) over (rows < current)`` equals *last* matching ts, so one
    sort per user replaces a per-row backward search. This is the
    scalable as-of strategy (single shuffle; no pandas)."""
    ev = events_us(spark, sf_dir)
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(W.unboundedPreceding, -1))
    last_view = F.max(
        F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    return (ev.withColumn("last_view_us", last_view)
              .filter((F.col("event_type") == "purchase")
                      & F.col("last_view_us").isNotNull())
              .select("event_id", "user_id",
                      (F.col("ts") - F.col("last_view_us"))
                      .alias("view_to_purchase_us")))


# --------------------------------------------------------------------------
# Merged suites — single-feature queries folded so every catalog entry
# fits the external checker's per-round window (mapping: COVERAGE.md)
# --------------------------------------------------------------------------

_NULLS = "CAST(NULL AS DOUBLE)"


@query(
    "event_stats_suite",
    oracle=_OVERHEAD_SPAN_CTE + """
SELECT 'describe' AS family, event_type AS k, count(*) AS n,
       round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
             / (100.0 * count(*)), 4)                                AS v1,
       round(stddev_samp(CAST(round(value * 100) AS BIGINT)) / 100.0, 4) AS v2,
       round(min(CAST(round(value * 100) AS BIGINT)) / 100.0, 4)     AS v3,
       round(max(CAST(round(value * 100) AS BIGINT)) / 100.0, 4)     AS v4,
       round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0 / 1024.0, 4) AS v5
FROM events GROUP BY event_type
UNION ALL
SELECT 'histogram', CAST(CAST(floor(value / 10.0) AS BIGINT) AS VARCHAR),
       count(*),
       round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2),
       NULL, NULL, NULL, NULL
FROM events GROUP BY 2
UNION ALL
SELECT 'overhead', NULL, count(*),
       CAST(CASE WHEN median(total_us - active_us) < 0
                 THEN -1 ELSE 1 END
            * ((abs(CAST(round(2 * (median(total_us - active_us)))
                         AS BIGINT)) + 100) // 200)
            AS DOUBLE) / 1e4,
       round(CAST(median((total_us - active_us) / (1.0 * total_us))
                  AS DOUBLE), 6),
       NULL, NULL, NULL
FROM merged
UNION ALL
SELECT DISTINCT 'event_types', event_type, NULL, NULL, NULL, NULL, NULL, NULL
FROM events
UNION ALL
SELECT 'salted', event_type, count(*),
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE),
       CAST(min(round(value * 100)) AS DOUBLE),
       CAST(max(round(value * 100)) AS DOUBLE), NULL, NULL
FROM events GROUP BY 2
UNION ALL
SELECT 'dq', k, n, v1, v2, NULL, NULL, NULL FROM (
  WITH a AS (
    SELECT count(*) AS n, count(props) AS np,
           count(DISTINCT event_id) AS ni,
           sum(CASE WHEN event_type IN
                 ('click', 'error', 'purchase', 'signup', 'view')
               THEN 1 ELSE 0 END) AS nd,
           sum(CASE WHEN value BETWEEN 0 AND 1000
               THEN 1 ELSE 0 END) AS nr
    FROM events)
  SELECT 'completeness_props' AS k, n, round(np * 1.0 / n, 6) AS v1,
         CASE WHEN np * 1.0 / n >= 0.99 THEN 1.0 ELSE 0.0 END AS v2
  FROM a
  UNION ALL
  SELECT 'uniqueness_event_id', n, round(ni * 1.0 / n, 6),
         CASE WHEN ni = n THEN 1.0 ELSE 0.0 END FROM a
  UNION ALL
  SELECT 'domain_event_type', n, round(nd * 1.0 / n, 6),
         CASE WHEN nd = n THEN 1.0 ELSE 0.0 END FROM a
  UNION ALL
  SELECT 'range_value', n, round(nr * 1.0 / n, 6),
         CASE WHEN nr = n THEN 1.0 ELSE 0.0 END FROM a
)
""",
    tags=("A3", "A8", "A9", "A11", "A15", "U2", "skew", "salting",
          "data-quality"),
)
def event_stats_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Descriptive statistics over the event log, six families in one
    union — each a distinct SURVEY aggregate with its own physical
    story: ``describe`` = per-type mean/std/min/max + bytes→KB unit
    conversion (A3/A8, flow_analyzer.py:143-147); ``histogram`` =
    fixed-width buckets (A15, plot.hist at :370); ``overhead`` =
    median orchestration overhead and fraction (A11, performance.ipynb
    cells 5-6); ``event_types`` = distinct values (A9/U2, np.unique);
    ``salted`` = the SAME per-type totals computed through the
    two-phase salted aggregation (operators.skew, 16 salts) — its
    oracle is the plain group-by, because salting must rewrite the
    physical plan without changing the answer; ``dq`` (round 5) =
    Deequ-style single-pass data-quality constraint metrics
    (completeness / uniqueness / domain / range, each a
    (check, n, metric, passed) row) — the declarative ingest gate."""
    from picoprobedataflow_spark.operators.skew import salted_agg

    ev = events_us(spark, sf_dir)
    c = cents()
    nul = lambda: F.lit(None).cast("double")  # noqa: E731

    desc_agg = ev.groupBy(F.col("event_type").alias("k")).agg(
        F.count("*").alias("n"),
        F.round(F.sum(c).cast("double")
                / (F.lit(100.0) * F.count("*")), 4).alias("v1"),
        F.round(F.stddev_samp(c) / 100.0, 4).alias("v2"),
        F.round(F.min(c) / 100.0, 4).alias("v3"),
        F.round(F.max(c) / 100.0, 4).alias("v4"),
        F.round(F.sum(c) / 100.0 / 1024.0, 4).alias("v5"),
    )
    describe = desc_agg.select(F.lit("describe").alias("family"), "k", "n",
                               "v1", "v2", "v3", "v4", "v5")

    hist = (ev.groupBy(F.floor(F.col("value") / 10.0).cast("string")
                       .alias("k"))
            .agg(F.count("*").alias("n"),
                 F.round(F.sum(c) / 100.0, 2).alias("v1"))
            .select(F.lit("histogram").alias("family"), "k", "n", "v1",
                    nul().alias("v2"), nul().alias("v3"),
                    nul().alias("v4"), nul().alias("v5")))

    span = (ev.groupBy("user_id", "event_type")
              .agg((F.max("ts") - F.min("ts")).alias("span_us")))
    run = (ev.groupBy("user_id")
             .agg((F.max("ts") - F.min("ts")).alias("total_us")))
    active = span.groupBy("user_id").agg(F.sum("span_us").alias("active_us"))
    merged = run.join(active, "user_id").withColumn(
        "overhead_us", F.col("total_us") - F.col("active_us"))
    overhead = merged.agg(
        F.count("*").alias("n"),
        # exact-integer half-up (run_overhead half-way failure class)
        _median_us_to_sec4("median(overhead_us)").alias("v1"),
        F.round(F.median(F.col("overhead_us")
                         / (F.lit(1.0) * F.col("total_us"))), 6).alias("v2"),
    ).select(F.lit("overhead").alias("family"),
             F.lit(None).cast("string").alias("k"), "n", "v1", "v2",
             nul().alias("v3"), nul().alias("v4"), nul().alias("v5"))

    # distinct event types == the describe aggregate's group keys —
    # derived from the same subtree so the plan reuses the exchange
    # instead of re-scanning events for a separate distinct.
    types = desc_agg.select(F.lit("event_types").alias("family"),
                            F.col("k"),
                            F.lit(None).cast("long").alias("n"),
                            nul().alias("v1"), nul().alias("v2"),
                            nul().alias("v3"), nul().alias("v4"),
                            nul().alias("v5"))

    salted = salted_agg(
        ev.select("event_type", c.alias("vc")),
        key_cols=["event_type"],
        partials=[
            (F.count("*"), "n", F.sum("n")),
            (F.sum("vc"), "sum_cents", F.sum("sum_cents")),
            (F.min("vc"), "min_cents", F.min("min_cents")),
            (F.max("vc"), "max_cents", F.max("max_cents")),
        ],
        n_salts=16,
    ).select(F.lit("salted").alias("family"),
             F.col("event_type").alias("k"), "n",
             F.col("sum_cents").cast("double").alias("v1"),
             F.col("min_cents").cast("double").alias("v2"),
             F.col("max_cents").cast("double").alias("v3"),
             nul().alias("v4"), nul().alias("v5"))

    dq = (dq_metrics(ev)
          .select(F.lit("dq").alias("family"), "k", "n", "v1", "v2",
                  nul().alias("v3"), nul().alias("v4"),
                  nul().alias("v5")))

    return (describe.unionByName(hist).unionByName(overhead)
            .unionByName(types).unionByName(salted).unionByName(dq))


#: Accepted event_type domain for the ``dq`` declarative checks.
DQ_EVENT_DOMAIN = ("click", "error", "purchase", "signup", "view")


def dq_metrics(ev: DataFrame,
               domain: tuple[str, ...] = DQ_EVENT_DOMAIN,
               value_lo: float = 0.0,
               value_hi: float = 1000.0,
               completeness_min: float = 0.99) -> DataFrame:
    """Deequ-style declarative data-quality constraint metrics over
    the event log — completeness(props) / uniqueness(event_id) /
    domain(event_type) / range(value) — ALL measured in ONE pass
    (one aggregate; the mixed distinct forces Spark's Expand, still
    a single scan), emitted long-form as (k = check, n, v1 = metric,
    v2 = passed 1.0/0.0). This is the ingest gate a pipeline runs
    before trusting a day's partition: thresholds are declared a
    priori, the 1-row metric aggregate is the entire driver-side
    footprint at any corpus size, and a failed check is a row with
    v2 = 0.0 — joinable, alertable, cheap enough for every batch."""
    checks = F.array(
        F.struct(F.lit("completeness_props").alias("k"),
                 (F.col("np") / F.col("n")).alias("m"),
                 ((F.col("np") / F.col("n")) >= completeness_min)
                 .alias("p")),
        F.struct(F.lit("uniqueness_event_id").alias("k"),
                 (F.col("ni") / F.col("n")).alias("m"),
                 (F.col("ni") == F.col("n")).alias("p")),
        F.struct(F.lit("domain_event_type").alias("k"),
                 (F.col("nd") / F.col("n")).alias("m"),
                 (F.col("nd") == F.col("n")).alias("p")),
        F.struct(F.lit("range_value").alias("k"),
                 (F.col("nr") / F.col("n")).alias("m"),
                 (F.col("nr") == F.col("n")).alias("p")),
    )
    in_range = ((F.col("value") >= value_lo)
                & (F.col("value") <= value_hi))
    return (ev.agg(F.count("*").alias("n"),
                   F.count("props").alias("np"),
                   F.countDistinct("event_id").alias("ni"),
                   F.sum(F.col("event_type").isin(*domain).cast("int"))
                    .alias("nd"),
                   F.sum(in_range.cast("int")).alias("nr"))
            .select(F.explode(checks).alias("c"), "n")
            .select(F.col("c.k").alias("k"), "n",
                    F.round("c.m", 6).alias("v1"),
                    F.col("c.p").cast("double").alias("v2")))


@query(
    "event_order_suite",
    oracle="""
(SELECT 'recent50' AS family, event_id, user_id, event_type AS s,
        CAST(epoch_us(ts) AS DOUBLE) AS num1, CAST(NULL AS DOUBLE) AS num2
 FROM events
 ORDER BY ts DESC, event_id DESC
 LIMIT 50)
UNION ALL
SELECT 'seq', event_id, user_id, NULL,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS DOUBLE), NULL
FROM events WHERE user_id < 10
UNION ALL
SELECT 'rebase', event_id, NULL, NULL,
       round((epoch_us(ts) - min(epoch_us(ts)) OVER ()) / 1e6, 6), NULL
FROM events WHERE user_id < 5
UNION ALL
SELECT 'gantt', NULL, user_id, event_type,
       CAST(s - (SELECT min(s) FROM (
          SELECT min(epoch_us(ts)) AS s FROM events WHERE user_id < 8
          GROUP BY user_id, event_type)) AS DOUBLE),
       CAST(e - (SELECT min(s) FROM (
          SELECT min(epoch_us(ts)) AS s FROM events WHERE user_id < 8
          GROUP BY user_id, event_type)) AS DOUBLE)
FROM (SELECT user_id, event_type,
             min(epoch_us(ts)) AS s, max(epoch_us(ts)) AS e
      FROM events WHERE user_id < 8 GROUP BY user_id, event_type)
""",
    tags=("W3", "W4", "W5", "O2", "O4", "gantt"),
)
def event_order_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-dependent views of the event log, four families:
    ``recent50`` = tail-N most recent (W4/O4, tasks.tail — planned as
    TakeOrderedAndProject, per-partition heap + driver merge, no full
    sort at any scale); ``seq`` = per-run sequential index (W5,
    reset_index as row_number); ``rebase`` = relative-time rebase to
    the global minimum (W3, the Gantt ``tasks[c] - start``,
    flow_analyzer.py:402-408 — broadcast 1-row scalar-agg min, exact
    integer µs delta); ``gantt`` = per-(run, step) spans rebased to
    the earliest start (plot_gantt, :379-444)."""
    ev = events_us(spark, sf_dir)
    nul = lambda t: F.lit(None).cast(t)  # noqa: E731

    recent = (ev.orderBy(F.desc("ts"), F.desc("event_id")).limit(50)
              .select(F.lit("recent50").alias("family"), "event_id",
                      "user_id", F.col("event_type").alias("s"),
                      F.col("ts").cast("double").alias("num1"),
                      nul("double").alias("num2")))

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (ev.filter(F.col("user_id") < 10)
           .select(F.lit("seq").alias("family"), "event_id", "user_id",
                   nul("string").alias("s"),
                   F.row_number().over(w).cast("double").alias("num1"),
                   nul("double").alias("num2")))

    # Global minima as broadcast 1-row scalar aggs (the SURVEY W3
    # "crossJoin of scalar agg" form q11/q15/run_overhead use) — a
    # whole-frame window min would funnel every row through one
    # WindowExec partition.
    ev5 = ev.filter(F.col("user_id") < 5)
    ev5_t0 = ev5.agg(F.min("ts").alias("_t0"))
    rebase = ev5.crossJoin(F.broadcast(ev5_t0)).select(
        F.lit("rebase").alias("family"), "event_id",
        nul("long").alias("user_id"), nul("string").alias("s"),
        F.round((F.col("ts") - F.col("_t0")) / 1e6, 6)
         .alias("num1"),
        nul("double").alias("num2"))

    ev8 = ev.filter(F.col("user_id") < 8)
    spans = (ev8.groupBy("user_id", "event_type")
             .agg(F.min("ts").alias("s_us"), F.max("ts").alias("e_us")))
    spans_t0 = spans.agg(F.min("s_us").alias("_t0"))
    gantt = spans.crossJoin(F.broadcast(spans_t0)).select(
        F.lit("gantt").alias("family"), nul("long").alias("event_id"),
        "user_id", F.col("event_type").alias("s"),
        (F.col("s_us") - F.col("_t0")).cast("double").alias("num1"),
        (F.col("e_us") - F.col("_t0")).cast("double").alias("num2"))

    return recent.unionByName(seq).unionByName(rebase).unionByName(gantt)


@query(
    "user_event_profile",
    oracle="""
SELECT user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_csv,
       list_sort(list(DISTINCT event_type))[1]  AS first_type,
       list_sort(list(DISTINCT event_type))[-1] AS last_type,
       CAST(len(list_sort(list(DISTINCT event_type))) AS BIGINT) AS n_types,
       max_by(event_type, ts) AS last_type_by_ts,
       max_by(event_id, ts)   AS last_event_id,
       epoch_us(max(ts))      AS last_ts_us,
       CASE WHEN min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
               - min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) > 0
            THEN min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
               - min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
       END AS signup_to_purchase_us
FROM events GROUP BY user_id
""",
    tags=("F16", "F17", "W6", "J4", "W2", "max_by", "collect-list"),
)
def user_event_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user profile in ONE hash aggregate — the way a real
    pipeline materializes user state: distinct-type set with
    first/[-1] indexing (F16/F17, fx_ids/entries[-1] accumulation);
    last-entry selection via ``max_by`` (W6 — no sort, no window);
    and the signup→purchase funnel delta in the pivot formulation
    (J4/W2, execution-end − execution-start, performance.ipynb
    cell 8), NULL when the user never converted."""
    ev = events_us(spark, sf_dir)
    arr = F.array_sort(F.collect_set("event_type"))
    delta = (F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
             - F.min(F.when(F.col("event_type") == "signup", F.col("ts"))))
    return ev.groupBy("user_id").agg(
        F.concat_ws(",", arr).alias("types_csv"),
        F.element_at(arr, 1).alias("first_type"),
        F.element_at(arr, -1).alias("last_type"),
        F.size(arr).cast("long").alias("n_types"),
        F.max_by("event_type", "ts").alias("last_type_by_ts"),
        F.max_by("event_id", "ts").alias("last_event_id"),
        F.max("ts").alias("last_ts_us"),
        F.when(delta > 0, delta).alias("signup_to_purchase_us"))


@query(
    "props_extract_suite",
    oracle="""
SELECT 'json' AS family,
       CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS VARCHAR) AS k,
       count(*) AS n,
       round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
             / (100.0 * count(*)), 4) AS v
FROM events GROUP BY 2
UNION ALL
SELECT 'variant',
       CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS VARCHAR),
       count(DISTINCT user_id),
       max(CAST(round(value * 100) AS BIGINT)) / 100.0
FROM events GROUP BY 2
UNION ALL
SELECT 'map_entries', key, count(*),
       CAST(sum(CAST(json_extract_string(props, '$.' || key) AS BIGINT))
            AS DOUBLE)
FROM (SELECT props, unnest(json_keys(props)) AS key FROM events)
GROUP BY 2
""",
    tags=("F13", "F14", "F15", "F20", "variant", "map-explode"),
)
def props_extract_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three semi-structured access paths over the same JSON
    column, one scan union each: ``json`` = ``get_json_object`` string
    probing with the flow-payload JSONPath dialect (F20,
    main.py:24); ``variant`` = Spark 4 ``parse_json``/``variant_get``
    — parses once into a binary encoding instead of re-parsing per
    path, the right trade at 100 TB when several keys are pulled;
    ``map_entries`` = schema-on-read MapType + ``explode`` for
    dynamic-key iteration (F15, ``for k, v in output.items()``,
    flow_analyzer.py:244)."""
    ev = events_us(spark, sf_dir)
    c = cents()
    json_fam = (ev.groupBy(F.get_json_object("props", "$.k").cast("long")
                           .cast("string").alias("k"))
                .agg(F.count("*").alias("n"),
                     F.round(F.sum(c).cast("double")
                             / (F.lit(100.0) * F.count("*")), 4).alias("v"))
                .select(F.lit("json").alias("family"), "k", "n", "v"))
    vk = F.variant_get(F.parse_json("props"), "$.k", "long")
    var_fam = (ev.groupBy(vk.cast("string").alias("k"))
               .agg(F.countDistinct("user_id").alias("n"),
                    (F.max(c) / 100.0).alias("v"))
               .select(F.lit("variant").alias("family"), "k", "n", "v"))
    entries = ev.select(F.explode(F.map_entries(
        F.from_json("props", "map<string,bigint>"))).alias("e"))
    map_fam = (entries.select(F.col("e.key").alias("k"),
                              F.col("e.value").alias("mv"))
               .groupBy("k")
               .agg(F.count("*").alias("n"),
                    F.sum("mv").cast("double").alias("v"))
               .select(F.lit("map_entries").alias("family"), "k", "n", "v"))
    return json_fam.unionByName(var_fam).unionByName(map_fam)
