"""Flow analytics — the ``picoprobe.flow_analyzer`` CLI (reference
EP3) as a lazy DataFrame program over the telemetry tables
(FIXTURES.md: flow_runs / step_events / transfers).

The reference fetches runs page-by-page, loops per run, pivots in
pandas and concatenates eagerly (flow_analyzer.py:166-230 — O(n²)
growth). Here the same analysis is filter → pivot → duration math →
aggregate in one Catalyst plan; the per-run loop disappears.

API parity (method ↔ reference):

- ``extract_times``      ↔ ``FlowInfo._extract_times`` (:154-230)
- ``describe_runtimes``  ↔ ``describe_runtimes`` (:115-135)
- ``describe_usage``     ↔ ``describe_usage`` (:137-152)
- ``most_recent_tasks``  ↔ ``get_tasks``/tail (:379-399)
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class FlowAnalyzer:
    """Relational flow analytics over runs + step-event logs.

    ``runs``: run_id, status, start_time, completion_time (FIXTURES §1).
    ``step_events``: run_id, entry_index, code, state_name, time
    (FIXTURES §2; ``time`` may be timestamp or double seconds).
    ``transfers`` (optional): run_id, bytes_transferred, ... (§3).
    """

    def __init__(self, runs: DataFrame, step_events: DataFrame,
                 transfers: DataFrame | None = None,
                 steps: tuple[str, ...] | None = None,
                 compute_steps: tuple[str, ...] | None = None):
        self.runs = runs
        self.step_events = step_events
        self.transfers = transfers
        # Driver-side collect is bounded by |distinct step names| — the
        # flow DEFINITION's state count (single digits in the reference,
        # never data-scale). Callers with unbounded event vocabularies
        # must pass `steps` explicitly; the dynamic pivot needs the
        # column set on the driver by construction.
        self.steps = steps or tuple(
            r.state_name
            for r in step_events.select("state_name").distinct()
                                .orderBy("state_name").collect())
        #: steps classified as compute ("funcx" ActionUrl test, J3 —
        #: flow_analyzer.py:207-210)
        self.compute_steps = (compute_steps if compute_steps is not None
                              else tuple(s for s in self.steps
                                         if "Tool" in s or "Gather" in s))

    # -- core pivot (W1) ---------------------------------------------------

    def extract_times(self) -> DataFrame:
        """SUCCEEDED runs × per-step {start,end,runtime} columns +
        flow_runtime + total_compute_time — the reference's wide frame
        (flow_analyzer.py:166-230) in one pivot plan."""
        ev = self.step_events.withColumn(
            "t", _as_seconds(self.step_events, "time"))
        aggs = []
        for s in self.steps:
            started = F.when((F.col("state_name") == s)
                             & (F.col("code") == "ActionStarted"), F.col("t"))
            done = F.when((F.col("state_name") == s)
                          & (F.col("code") == "ActionCompleted"), F.col("t"))
            aggs.append(F.min(started).alias(f"{s}_start"))
            aggs.append(F.max(done).alias(f"{s}_end"))
        wide = ev.groupBy("run_id").agg(*aggs)
        for s in self.steps:
            wide = wide.withColumn(
                f"{s}_runtime", F.col(f"{s}_end") - F.col(f"{s}_start"))
        runs = self.runs.filter(F.col("status") == "SUCCEEDED")
        out = (runs.join(wide, "run_id")
                   .withColumn("flow_runtime",
                               _as_seconds(runs, "completion_time")
                               - _as_seconds(runs, "start_time")))
        if self.compute_steps:
            total = reduce(add, [F.col(f"{s}_runtime")
                                 for s in self.compute_steps])
            out = out.withColumn("total_compute_time", total)
        return out

    # -- aggregates (A1-A4) ------------------------------------------------

    def describe_runtimes(self) -> DataFrame:
        """Per-step + whole-flow runtime stats — one unpivot + one
        aggregation (reference loops per step, :127-135). Sample std
        matches the pandas default."""
        wide = self.extract_times()
        cols = [f"{s}_runtime" for s in self.steps] + ["flow_runtime"]
        stack = ", ".join(f"'{c}', {c}" for c in cols)
        long = wide.selectExpr(
            f"stack({len(cols)}, {stack}) AS (metric, seconds)")
        return (long.groupBy("metric")
                    .agg(F.round(F.avg("seconds"), 4).alias("mean"),
                         F.round(F.median("seconds"), 4).alias("median"),
                         F.round(F.stddev_samp("seconds"), 4).alias("std"),
                         F.round(F.min("seconds"), 4).alias("min"),
                         F.round(F.max("seconds"), 4).alias("max"),
                         F.count("seconds").alias("n")))

    def describe_usage(self) -> DataFrame:
        """Bytes-transferred + compute-time usage summary
        (flow_analyzer.py:137-152): totals and means, GB-converted."""
        if self.transfers is None:
            raise ValueError("no transfers table attached")
        gb = float(1024 ** 3)
        usage = self.transfers.agg(
            (F.sum("bytes_transferred") / gb).alias("total_gb"),
            (F.avg("bytes_transferred") / gb).alias("mean_gb"),
            F.count("*").alias("n_transfers"))
        if self.compute_steps:
            wide = self.extract_times()
            comp = wide.agg(
                F.sum("total_compute_time").alias("total_compute_sec"),
                F.avg("total_compute_time").alias("mean_compute_sec"))
            usage = usage.crossJoin(comp)
        return usage

    def most_recent_tasks(self, limit: int = 20) -> DataFrame:
        """Tail-N runs by start time (W4/O4), re-sorted ascending like
        ``tasks.tail(limit)`` (flow_analyzer.py:396-399)."""
        return (self.extract_times()
                .orderBy(F.desc("start_time"), F.desc("run_id"))
                .limit(limit)
                .orderBy("start_time", "run_id"))

    def overhead(self) -> DataFrame:
        """Per-run overhead = flow total − Σ step runtimes
        (performance.ipynb cell 4)."""
        wide = self.extract_times()
        active = reduce(add, [F.col(f"{s}_runtime") for s in self.steps])
        return (wide.withColumn("active_time", active)
                    .withColumn("overhead",
                                F.col("flow_runtime") - F.col("active_time"))
                    .select("run_id", "flow_runtime", "active_time",
                            "overhead"))


def _as_seconds(df: DataFrame, col: str) -> F.Column:
    """Epoch-second double from either a timestamp or a numeric column
    (F1/F2) — dispatch on the schema, not per row."""
    dt = dict(df.dtypes)[col]
    if dt.startswith("timestamp"):
        return F.col(col).cast("timestamp").cast("double")
    return F.col(col).cast("double")
