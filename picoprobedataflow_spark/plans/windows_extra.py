"""Extended window/aggregate surface — SURVEY §2.5's "no reference
instance, engine exposes natively" rows: ranking (rank/dense_rank/
ntile), lead/lag, RANGE frames, exact percentiles, GROUPING SETS (via
the SQL API), and the approximate sketches needed at 100 TB
(approx_count_distinct / percentile_approx — rows-only check: sketch
implementations differ across engines by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from picoprobedataflow_spark.plans.catalog import query
from picoprobedataflow_spark.plans.common import cents, events_us, tbl


@query(
    "rank_customers_by_balance",
    oracle="""
SELECT c_mktsegment, c_custkey,
       CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
       CAST(rank() OVER w AS BIGINT)        AS rnk,
       CAST(dense_rank() OVER w AS BIGINT)  AS drnk,
       CAST(ntile(4) OVER (PARTITION BY c_mktsegment
             ORDER BY floor(c_acctbal / 1000) DESC, c_custkey) AS BIGINT)
           AS quartile
FROM customer
WHERE c_custkey < 300
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY floor(c_acctbal / 1000) DESC)
""",
    tags=("rank", "ntile"),
)
def rank_customers_by_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank vs dense_rank over a coarse key (real ties → gap
    semantics differ) + ntile over a total order (ties would make
    tile assignment engine-dependent)."""
    cu = tbl(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    bucket = F.floor(F.col("c_acctbal") / 1000)
    w = W.partitionBy("c_mktsegment").orderBy(F.desc(bucket))
    wt = W.partitionBy("c_mktsegment").orderBy(F.desc(bucket), "c_custkey")
    return cu.select(
        "c_mktsegment", "c_custkey",
        bucket.cast("long").alias("bal_bucket"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(wt).cast("long").alias("quartile"))


@query(
    "trailing_30day_revenue",
    oracle=f"""
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) OVER
         (PARTITION BY l_suppkey
          ORDER BY datediff('day', TIMESTAMP '1995-01-01 00:00:00', l_shipdate)
          RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS trailing_cents
FROM lineitem WHERE l_suppkey < 5
""",
    tags=("range-frame",),
)
def trailing_30day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a day-number order column: 30-day trailing
    revenue per supplier — the value-based frame the reference's
    telemetry analysis would need for rolling rates."""
    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") < 5)
    day = F.datediff(F.col("l_shipdate"),
                     F.lit("1995-01-01 00:00:00").cast("timestamp"))
    w = (W.partitionBy("l_suppkey").orderBy(day.cast("long"))
          .rangeBetween(-30, 0))
    return li.select(
        "l_suppkey", "l_orderkey", "l_linenumber",
        F.sum(cents("l_extendedprice")).over(w).cast("long")
         .alias("trailing_cents"))


@query(
    "lead_lag_price_delta",
    oracle=f"""
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(round(l_extendedprice * 100) AS BIGINT)
         - lag(CAST(round(l_extendedprice * 100) AS BIGINT)) OVER w
           AS delta_prev_cents,
       lead(CAST(round(l_extendedprice * 100) AS BIGINT)) OVER w
         - CAST(round(l_extendedprice * 100) AS BIGINT)
           AS delta_next_cents
FROM lineitem WHERE l_suppkey < 5
WINDOW w AS (PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber)
""",
    tags=("lead", "lag"),
)
def lead_lag_price_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag deltas over a total order — inter-arrival-style math
    on a value column (exact cents: null-safe integer deltas)."""
    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") < 5)
    w = W.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey",
                                           "l_linenumber")
    c = cents("l_extendedprice")
    return li.select(
        "l_suppkey", "l_orderkey", "l_linenumber",
        (c - F.lag(c).over(w)).alias("delta_prev_cents"),
        (F.lead(c).over(w) - c).alias("delta_next_cents"))


@query(
    "value_percentiles_exact",
    oracle="""
SELECT event_type,
       CAST(quantile_cont(CAST(round(value * 100) AS BIGINT), 0.25) AS DOUBLE)
         / 100.0 AS p25,
       CAST(quantile_cont(CAST(round(value * 100) AS BIGINT), 0.5) AS DOUBLE)
         / 100.0 AS p50,
       CAST(quantile_cont(CAST(round(value * 100) AS BIGINT), 0.75) AS DOUBLE)
         / 100.0 AS p75,
       CAST(quantile_cont(CAST(round(value * 100) AS BIGINT), 0.9) AS DOUBLE)
         / 100.0 AS p90
FROM events GROUP BY event_type
""",
    tags=("percentile",),
)
def value_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles over integer cents — both
    engines interpolate the same two integers, so results are
    bit-identical (the approximate sketch variant is
    ``approx_sketches``, rows-only)."""
    ev = events_us(spark, sf_dir)
    c = cents()
    return ev.groupBy("event_type").agg(
        (F.percentile(c, F.lit(0.25)) / 100.0).alias("p25"),
        (F.percentile(c, F.lit(0.5)) / 100.0).alias("p50"),
        (F.percentile(c, F.lit(0.75)) / 100.0).alias("p75"),
        (F.percentile(c, F.lit(0.9)) / 100.0).alias("p90"))


@query(
    "sql_grouping_sets",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
    tags=("grouping-sets", "sql-api"),
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS through the SQL API (temp view + spark.sql) —
    same Catalyst plan as the DataFrame form; registered under a
    unique view name so the driver's session state stays clean."""
    import uuid

    li = tbl(spark, sf_dir, "lineitem")
    view = f"gs_lineitem_{uuid.uuid4().hex[:8]}"
    li.createOrReplaceTempView(view)
    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               sum(CAST(round(l_quantity) AS BIGINT)) AS sum_qty,
               count(*) AS n
        FROM {view}
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


@query(
    "salted_skew_agg",
    oracle="""
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(min(round(value * 100)) AS BIGINT) AS min_cents,
       CAST(max(round(value * 100)) AS BIGINT) AS max_cents
FROM events GROUP BY event_type
""",
    tags=("skew", "salting"),
)
def salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over the 5-hot-key event_type
    column — the manual skew fallback (operators.skew). The oracle is
    the PLAIN group-by: the whole point is that salting rewrites the
    physical plan without changing the answer."""
    from picoprobedataflow_spark.operators.skew import salted_agg

    ev = events_us(spark, sf_dir)
    c = cents()
    return salted_agg(
        ev.select("event_type", c.alias("vc")),
        key_cols=["event_type"],
        partials=[
            (F.count("*"), "n", F.sum("n")),
            (F.sum("vc"), "sum_cents", F.sum("sum_cents")),
            (F.min("vc"), "min_cents", F.min("min_cents")),
            (F.max("vc"), "max_cents", F.max("max_cents")),
        ],
        n_salts=16)


@query("approx_sketches", oracle=None, tags=("approx", "sketch"))
def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB monitoring aggregates: HyperLogLog distinct counts
    and quantile sketches. Rows-only check by design — sketch
    algorithms are engine-specific (Spark HLL++ vs DuckDB HLL), so a
    value-hash comparison would be wrong; the exact twins are
    ``distinct_event_types`` / ``value_percentiles_exact``."""
    ev = events_us(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.percentile_approx("value", 0.5).alias("approx_median"),
        F.count("*").alias("n"))
