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
Spark mirrors it with ``ts div 1000``); seconds appear only as
``exact_us / 1e6``, which both
engines compute from the same integer → bit-identical doubles; means
are exact-integer-sum / count. Only genuinely order-sensitive floats
(stddev) rely on rounding headroom.
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

@query(
    "flow_step_runtime_summary",
    oracle="""
WITH span AS (
  SELECT user_id, event_type,
         epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us,
         count(*) AS n_events
  FROM events GROUP BY user_id, event_type
)
SELECT event_type,
       round(CAST(sum(span_us) AS DOUBLE) / (count(*) * 1e6), 4) AS mean_span,
       round(CAST(median(span_us) AS DOUBLE) / 1e6, 4)           AS median_span,
       round(stddev_samp(span_us) / 1e6, 2)                      AS std_span,
       round(min(span_us) / 1e6, 4)                              AS min_span,
       round(max(span_us) / 1e6, 4)                              AS max_span,
       CAST(sum(n_events) AS BIGINT)                             AS n_events
FROM span GROUP BY event_type
""",
    tags=("A1", "A2", "A10", "W1", "flagship"),
)
def flow_step_runtime_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-step runtime distribution: ``describe_runtimes``
    (flow_analyzer.py:115-135; sample-std per pandas default) over
    per-(run, step) spans. Two hash aggregations, no window —
    map-side partial agg on both; at 100 TB the first groupBy is the
    only real shuffle and it is on (user_id, event_type), a high-
    cardinality composite key with no skew."""
    ev = events_us(spark, sf_dir)
    span = (
        ev.groupBy("user_id", "event_type")
          .agg((F.max("ts") - F.min("ts")).alias("span_us"),
               F.count("*").alias("n_events"))
    )
    return (
        span.groupBy("event_type")
            .agg(F.round(F.sum("span_us").cast("double")
                         / (F.count("*") * F.lit(1e6)), 4).alias("mean_span"),
                 F.round(F.median("span_us") / 1e6, 4).alias("median_span"),
                 F.round(F.stddev_samp("span_us") / 1e6, 2).alias("std_span"),
                 F.round(F.min("span_us") / 1e6, 4).alias("min_span"),
                 F.round(F.max("span_us") / 1e6, 4).alias("max_span"),
                 F.sum("n_events").alias("n_events"))
    )


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
    oracle=_OVERHEAD_SPAN_CTE + """
SELECT user_id,
       round(total_us / 1e6, 4)               AS total_sec,
       round(active_us / 1e6, 4)              AS active_sec,
       round((total_us - active_us) / 1e6, 4) AS overhead_sec
FROM merged
""",
    tags=("A7", "J1"),
)
def run_overhead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-run active time (Σ per-step spans) vs total span vs
    overhead — notebook cell 4's ``task_time``/``Overhead`` columns.
    The run⋈step join (J1) reuses the (user_id) partitioning from the
    aggregations, so AQE plans it without an extra shuffle."""
    ev = events_us(spark, sf_dir)
    span = (ev.groupBy("user_id", "event_type")
              .agg((F.max("ts") - F.min("ts")).alias("span_us")))
    run = (ev.groupBy("user_id")
             .agg((F.max("ts") - F.min("ts")).alias("total_us")))
    active = span.groupBy("user_id").agg(F.sum("span_us").alias("active_us"))
    return (
        run.join(active, "user_id")
           .select("user_id",
                   F.round(F.col("total_us") / 1e6, 4).alias("total_sec"),
                   F.round(F.col("active_us") / 1e6, 4).alias("active_sec"),
                   F.round((F.col("total_us") - F.col("active_us")) / 1e6, 4)
                    .alias("overhead_sec"))
    )


@query(
    "overhead_summary",
    oracle=_OVERHEAD_SPAN_CTE + """
SELECT round(CAST(median(total_us - active_us) AS DOUBLE) / 1e6, 4)  AS median_overhead_sec,
       round(CAST(median((total_us - active_us) / (1.0 * total_us)) AS DOUBLE), 6)
                                                                      AS median_overhead_frac,
       count(*)                                                       AS n_runs
FROM merged
""",
    tags=("A11", "A10"),
)
def overhead_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median overhead + median overhead fraction across runs
    (performance.ipynb cells 5-6: ``np.median(timing_df.Overhead)``)."""
    ev = events_us(spark, sf_dir)
    span = (ev.groupBy("user_id", "event_type")
              .agg((F.max("ts") - F.min("ts")).alias("span_us")))
    run = (ev.groupBy("user_id")
             .agg((F.max("ts") - F.min("ts")).alias("total_us")))
    active = span.groupBy("user_id").agg(F.sum("span_us").alias("active_us"))
    merged = run.join(active, "user_id").withColumn(
        "overhead_us", F.col("total_us") - F.col("active_us"))
    return merged.agg(
        F.round(F.median("overhead_us") / 1e6, 4).alias("median_overhead_sec"),
        F.round(F.median(F.col("overhead_us") / (F.lit(1.0) * F.col("total_us"))), 6)
         .alias("median_overhead_frac"),
        F.count("*").alias("n_runs"),
    )


# --------------------------------------------------------------------------
# Window functions: lag inter-arrival, tail-N, rebase, sequential index
# --------------------------------------------------------------------------

@query(
    "interarrival_stats",
    oracle="""
WITH deltas AS (
  SELECT event_type,
         epoch_us(ts) - epoch_us(lag(ts) OVER
            (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events
)
SELECT event_type,
       round(CAST(sum(gap_us) AS DOUBLE) / (count(gap_us) * 1e6), 4) AS mean_gap,
       round(min(gap_us) / 1e6, 6) AS min_gap,
       round(max(gap_us) / 1e6, 6) AS max_gap,
       count(gap_us)               AS n_gaps
FROM deltas GROUP BY event_type
""",
    tags=("W2", "lag"),
)
def interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival gaps via ``lag`` — the natural extension
    of the notebook's pairwise event deltas (SURVEY §2.5). One shuffle
    on user_id for the window, then a partial-agg rollup."""
    ev = events_us(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    deltas = ev.select(
        "event_type", (F.col("ts") - F.lag("ts").over(w)).alias("gap_us"))
    return deltas.groupBy("event_type").agg(
        F.round(F.sum("gap_us").cast("double")
                / (F.count("gap_us") * F.lit(1e6)), 4).alias("mean_gap"),
        F.round(F.min("gap_us") / 1e6, 6).alias("min_gap"),
        F.round(F.max("gap_us") / 1e6, 6).alias("max_gap"),
        F.count("gap_us").alias("n_gaps"),
    )


@query(
    "recent_events_topk",
    oracle="""
SELECT event_id, event_type, user_id, epoch_us(ts) AS ts_us_out
FROM events
ORDER BY ts DESC, event_id DESC
LIMIT 50
""",
    tags=("W4", "O4", "O2"),
)
def recent_events_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail-N most recent — ``tasks.tail(limit)``
    (flow_analyzer.py:396-399). Spark plans ordered-limit as
    TakeOrderedAndProject (per-partition top-k + driver merge), no
    full sort even at 100 TB."""
    ev = events_us(spark, sf_dir)
    return (ev.orderBy(F.desc("ts"), F.desc("event_id"))
              .limit(50)
              .select("event_id", "event_type", "user_id",
                      F.col("ts").alias("ts_us_out")))


@query(
    "relative_time_rebase",
    oracle="""
SELECT event_id,
       round((epoch_us(ts) - min(epoch_us(ts)) OVER ()) / 1e6, 6) AS rel_sec
FROM events WHERE user_id < 5
""",
    tags=("W3",),
)
def relative_time_rebase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebase to the global minimum start — the Gantt plot's
    ``tasks[c] - start`` (flow_analyzer.py:402-408). Global scalar agg
    via empty-frame window; the delta is exact integer ns on both
    engines, so /1e6 is bit-identical."""
    ev = events_us(spark, sf_dir).filter(F.col("user_id") < 5)
    w = W.partitionBy()
    return ev.select(
        "event_id",
        F.round((F.col("ts") - F.min("ts").over(w)) / 1e6, 6).alias("rel_sec"))


@query(
    "event_sequence_index",
    oracle="""
SELECT event_id, user_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS BIGINT) AS seq
FROM events WHERE user_id < 10
""",
    tags=("W5",),
)
def event_sequence_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential index per run — ``reset_index`` / cycle-enumerate
    (flow_analyzer.py:229, simulator.py:30) as ``row_number``."""
    ev = events_us(spark, sf_dir).filter(F.col("user_id") < 10)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select("event_id", "user_id",
                     F.row_number().over(w).cast("long").alias("seq"))


# --------------------------------------------------------------------------
# Sessionization (ST6 extension) — gap > 30 min starts a new session
# --------------------------------------------------------------------------

@query(
    "sessionize_events",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
                (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       CAST(count(DISTINCT session_id) AS BIGINT) AS n_sessions,
       CAST(count(*) AS BIGINT)                   AS n_events
FROM sess GROUP BY user_id
""",
    tags=("ST6", "sessionization"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + running sum of session-start flags —
    the batch twin of ``session_window`` (streaming module provides the
    streaming form). Single shuffle on user_id shared by both windows."""
    ev = events_us(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.col("ts") - F.lag("ts").over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap_us.isNull() | (gap_us > F.lit(1_800_000_000)), 1)
         .otherwise(0))
    wsum = (W.partitionBy("user_id").orderBy("ts", "event_id")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    sess = flagged.withColumn("session_id", F.sum("new_session").over(wsum))
    return sess.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count("*").alias("n_events"))


# --------------------------------------------------------------------------
# Histogram / describe / distinct / funnel
# --------------------------------------------------------------------------

@query(
    "value_histogram",
    oracle="""
SELECT CAST(floor(value / 10.0) AS BIGINT) AS bucket,
       count(*)                            AS n,
       round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS sum_value
FROM events GROUP BY 1
""",
    tags=("A15",),
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram — ``plot.hist(bins=20)``
    (flow_analyzer.py:370) with deterministic bucket edges."""
    ev = events_us(spark, sf_dir)
    return (ev.groupBy(F.floor(F.col("value") / 10.0).alias("bucket"))
              .agg(F.count("*").alias("n"),
                   F.round(F.sum(cents()) / 100.0, 2).alias("sum_value")))


@query(
    "describe_value_by_type",
    oracle="""
SELECT event_type,
       count(*) AS n,
       round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
             / (100.0 * count(*)), 4)                                AS mean_value,
       round(stddev_samp(CAST(round(value * 100) AS BIGINT)) / 100.0, 4) AS std_value,
       round(min(CAST(round(value * 100) AS BIGINT)) / 100.0, 4)     AS min_value,
       round(max(CAST(round(value * 100) AS BIGINT)) / 100.0, 4)     AS max_value,
       round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0 / 1024.0, 4) AS sum_kb
FROM events GROUP BY event_type
""",
    tags=("A3", "A8"),
)
def describe_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``df.describe()`` + bytes→GB-style unit conversion
    (flow_analyzer.py:143-147, performance.ipynb cells 5-6)."""
    ev = events_us(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum(cents()).cast("double")
                / (F.lit(100.0) * F.count("*")), 4).alias("mean_value"),
        F.round(F.stddev_samp(cents()) / 100.0, 4).alias("std_value"),
        F.round(F.min(cents()) / 100.0, 4).alias("min_value"),
        F.round(F.max(cents()) / 100.0, 4).alias("max_value"),
        F.round(F.sum(cents()) / 100.0 / 1024.0, 4).alias("sum_kb"),
    )


@query(
    "distinct_event_types",
    oracle="SELECT DISTINCT event_type FROM events",
    tags=("A9", "U2"),
)
def distinct_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``np.unique(df['message'])`` (performance.ipynb cell 8)."""
    return events_us(spark, sf_dir).select("event_type").distinct()


@query(
    "signup_to_purchase_funnel",
    oracle="""
SELECT * FROM (
  SELECT user_id,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
       - min(CASE WHEN event_type = 'signup'  THEN epoch_us(ts) END)
           AS signup_to_purchase_us
  FROM events GROUP BY user_id
) WHERE signup_to_purchase_us > 0
""",
    tags=("J4", "W2"),
)
def signup_to_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-pair delta (execution-end − execution-start analog,
    performance.ipynb cell 8) in the pivot formulation — SURVEY J4
    prefers this over the self-join; the self-join twin lives in
    ``operators.telemetry`` with an equivalence test."""
    ev = events_us(spark, sf_dir)
    delta = (F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
             - F.min(F.when(F.col("event_type") == "signup", F.col("ts"))))
    return (ev.groupBy("user_id")
              .agg(delta.alias("signup_to_purchase_us"))
              .filter(F.col("signup_to_purchase_us") > 0))


@query(
    "props_json_extract",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       count(*) AS n,
       round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
             / (100.0 * count(*)), 4) AS mean_value
FROM events GROUP BY 1
""",
    tags=("F13", "F14", "F20"),
)
def props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON — ``get_json_object`` with the same
    JSONPath dialect as the flow payload wiring
    (examples/hyperspectral_flow/main.py:24)."""
    ev = events_us(spark, sf_dir)
    return (ev.groupBy(F.get_json_object("props", "$.k").cast("long").alias("k"))
              .agg(F.count("*").alias("n"),
                   F.round(F.sum(cents()).cast("double")
                           / (F.lit(100.0) * F.count("*")), 4)
                    .alias("mean_value")))


@query(
    "props_variant_extract",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       count(DISTINCT user_id) AS n_users,
       max(CAST(round(value * 100) AS BIGINT)) / 100.0 AS max_value
FROM events GROUP BY 1
""",
    tags=("F13", "F14", "variant"),
)
def props_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured path #2 (SURVEY §1.1): ``parse_json`` into
    Spark 4's VariantType and ``variant_get`` extraction — the
    open-schema alternative to ``get_json_object`` string probing.
    Variant parses the JSON once into a binary encoding instead of
    re-parsing per path access, which is the right trade at 100 TB
    when several keys are pulled from one document."""
    ev = events_us(spark, sf_dir)
    k = F.variant_get(F.parse_json("props"), "$.k", "long")
    return (ev.groupBy(k.alias("k"))
              .agg(F.countDistinct("user_id").alias("n_users"),
                   (F.max(cents()) / 100.0).alias("max_value")))


@query(
    "last_event_per_user",
    oracle="""
SELECT user_id,
       max_by(event_type, ts) AS last_type,
       max_by(event_id, ts)   AS last_event_id,
       epoch_us(max(ts))      AS last_ts_us
FROM events GROUP BY user_id
""",
    tags=("W6", "max_by"),
)
def last_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 — last-entry selection from an ordered log
    (``flow_logs['entries'][-1]``, flow_analyzer.py:177) as ``max_by``:
    no sort, no window — a single hash aggregate carrying the argmax."""
    ev = events_us(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.max_by("event_type", "ts").alias("last_type"),
        F.max_by("event_id", "ts").alias("last_event_id"),
        F.max("ts").alias("last_ts_us"))


@query(
    "gantt_timeline",
    oracle="""
WITH spans AS (
  SELECT user_id, event_type,
         min(epoch_us(ts)) AS s, max(epoch_us(ts)) AS e
  FROM events WHERE user_id < 8 GROUP BY user_id, event_type
),
origin AS (SELECT min(s) AS t0 FROM spans)
SELECT user_id, event_type,
       s - (SELECT t0 FROM origin) AS rel_start_us,
       e - (SELECT t0 FROM origin) AS rel_end_us
FROM spans
""",
    tags=("W3", "gantt"),
)
def gantt_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gantt-chart data prep (``plot_gantt``,
    flow_analyzer.py:379-444): per-(run, step) spans rebased to the
    earliest start. The scalar origin comes from an empty-frame window
    min — Catalyst broadcasts the single row, no all-to-one shuffle."""
    ev = events_us(spark, sf_dir).filter(F.col("user_id") < 8)
    spans = (ev.groupBy("user_id", "event_type")
               .agg(F.min("ts").alias("s"), F.max("ts").alias("e")))
    w = W.partitionBy()
    t0 = F.min("s").over(w)
    return spans.select("user_id", "event_type",
                        (F.col("s") - t0).alias("rel_start_us"),
                        (F.col("e") - t0).alias("rel_end_us"))


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
