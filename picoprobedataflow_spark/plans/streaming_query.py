"""A catalog query that actually executes through Structured
Streaming: the events parquet replayed as a stream (availableNow),
aggregated with the windowed-rates pipeline, results landed in a
memory sink and returned as a DataFrame. Its oracle is the plain batch
SQL — proving stream≡batch for the windowed aggregate under the
driver's own hash gate (SURVEY ST1/ST6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from picoprobedataflow_spark.plans.catalog import query
from picoprobedataflow_spark.plans.common import prep


@query(
    "streaming_hourly_rates",
    oracle="""
SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
       event_type,
       count(*) AS n,
       round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS sum_value
FROM events
GROUP BY 1, 2
""",
    tags=("ST1", "ST6", "streaming-executed", "tumbling-window"),
)
def streaming_hourly_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event counts computed BY A STREAM: readStream over the
    events parquet, complete-mode aggregate, availableNow drain into a
    uniquely-named memory sink. The checkpoint is ephemeral (tempdir,
    removed after the drain) and the memory-sink view is dropped once
    its rows are materialized, so repeated driver invocations leak
    neither disk nor session state. The exact int64-µs bucketing keeps
    the streamed result hash-identical to the batch oracle."""
    from picoprobedataflow_spark.plans.common import (
        drain_stream_to_local,
        stream_events,
        ts_to_us,
    )

    prep(spark)
    src = stream_events(spark, sf_dir)
    # Identical semantics to the batch twin plans.scientific
    # .windowed_event_rates, value sum included: per-row exact integer
    # cents summed in stream state, divided once at emit — the same
    # int64 arithmetic the batch oracle runs, so stream≡batch holds
    # bit-for-bit under the hash gate.
    agg = (ts_to_us(src)
              .groupBy(F.expr("(ts div 3600000000) * 3600000000")
                        .alias("window_start_us"),
                       "event_type")
              .agg(F.count("*").alias("n"),
                   F.round(F.sum(F.round(F.col("value") * 100, 0)
                                  .cast("long")) / 100.0, 2)
                    .alias("sum_value")))
    return drain_stream_to_local(spark, agg)


@query(
    "click_purchase_attribution",
    oracle="""
WITH c AS (SELECT user_id, epoch_us(ts) AS click_us
           FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, epoch_us(ts) AS purchase_us,
             value AS purchase_value
      FROM events WHERE event_type = 'purchase'),
pairs AS (
  SELECT c.user_id, click_us, purchase_us, purchase_value
  FROM c JOIN p ON c.user_id = p.user_id
   AND purchase_us >= click_us
   AND purchase_us <= click_us + 3600000000
)
SELECT 'stream' AS family, * FROM pairs
UNION ALL
SELECT 'binned' AS family, * FROM pairs
""",
    tags=("ST", "stream-stream-join", "J1", "range-join"),
)
def click_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases attributed to a same-user click at most 1 hour
    earlier, computed TWO ways that must agree under the hash gate:

    - ``stream`` — the stream-stream interval join in its batch form
      (same code path; :func:`..streaming.watch
      .interval_attribution_join` skips watermarks on batch inputs);
    - ``binned`` (round 3) — :func:`..operators.rangejoin
      .bin_range_join`: the non-equi containment expressed as a time-
      bin hash equi-join + residual filter (the scale formulation; the
      same-user predicate joins the residual here, while a production
      deployment would fold user_id into the bin key).

    Timestamps round-trip through exact int64 µs (events_us →
    timestamp_micros → unix_micros) so the oracle's epoch_us
    arithmetic is bit-identical."""
    from picoprobedataflow_spark.operators.rangejoin import bin_range_join
    from picoprobedataflow_spark.plans.common import events_us
    from picoprobedataflow_spark.streaming.watch import (
        interval_attribution_join,
    )

    ev = events_us(spark, sf_dir)
    clicks = (ev.filter(F.col("event_type") == "click")
                .select("user_id", F.timestamp_micros("ts").alias("ts")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .select("user_id", F.timestamp_micros("ts").alias("ts"),
                           "value"))
    joined = interval_attribution_join(clicks, purchases, max_delay="1 hour")
    stream = joined.select(
        F.lit("stream").alias("family"),
        "user_id",
        F.unix_micros("click_ts").alias("click_us"),
        F.unix_micros("purchase_ts").alias("purchase_us"),
        "purchase_value")

    pts = (ev.filter(F.col("event_type") == "purchase")
             .select(F.col("user_id").alias("p_user"),
                     F.col("ts").alias("purchase_us"),
                     F.col("value").alias("purchase_value")))
    ivs = (ev.filter(F.col("event_type") == "click")
             .select(F.col("user_id").alias("user_id"),
                     F.col("ts").alias("click_us"),
                     F.col("ts").alias("win_start"),
                     (F.col("ts") + 3_600_000_000).alias("win_end")))
    binned = (bin_range_join(pts, ivs, ts_col="purchase_us",
                             start_col="win_start", end_col="win_end")
              .filter(F.col("p_user") == F.col("user_id"))
              .select(F.lit("binned").alias("family"), "user_id",
                      "click_us", "purchase_us", "purchase_value"))
    return stream.unionByName(binned)
