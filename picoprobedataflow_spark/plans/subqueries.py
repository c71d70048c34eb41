"""Subquery surface — EXISTS / NOT EXISTS / IN / correlated scalar
subqueries, executed through the SQL API so **Catalyst's decorrelation
does the planning**: EXISTS becomes a left-semi join, NOT EXISTS a
left-anti join, the correlated scalar aggregate a grouped join
(RewriteCorrelatedScalarSubquery) — none of them a per-row re-execution
the way the reference's dict-lookup correlation works
(`picoprobe/flow_analyzer.py:174-196` fetches logs per run in a Python
loop; these queries are the relational generalization of that access
pattern).

Scale posture: each subquery decorrelates to one join whose build side
is an aggregate over the fact table (bounded by |keys|, not |rows|);
nothing here is a nested-loop at any SF. Money/quantity math follows
the exact-integer discipline from ``relational.py``.

Views are registered under per-call unique names so driver session
state never collides across queries.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from picoprobedataflow_spark.plans.catalog import query
from picoprobedataflow_spark.plans.common import tbl


def _views(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, str]:
    """Register per-call uniquely named temp views; returns name map."""
    out = {}
    for n in names:
        v = f"{n}_{uuid.uuid4().hex[:8]}"
        tbl(spark, sf_dir, n).createOrReplaceTempView(v)
        out[n] = v
    return out


@query(
    "semi_anti_membership",
    oracle="""
SELECT 'exists_urgent_by_segment' AS family, c_mktsegment AS k,
       count(*) AS n
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderstatus = 'O'
                AND o.o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
UNION ALL
SELECT 'not_exists_dormant_by_nation', CAST(c.c_nationkey AS VARCHAR),
       count(*)
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY c.c_nationkey
UNION ALL
SELECT 'inactive_customers', CAST(c_custkey AS VARCHAR), 1
FROM customer
ANTI JOIN (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
) recent ON c_custkey = recent.o_custkey
UNION ALL
SELECT 'open_segments', c_mktsegment, count(*)
FROM customer
SEMI JOIN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') f
  ON c_custkey = f.o_custkey
GROUP BY c_mktsegment
""",
    tags=("J5", "U2", "subquery", "exists", "not-exists", "semi-join",
          "anti-join"),
)
def semi_anti_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The seen-set membership pattern (SURVEY J5/P7,
    picoprobe/utils.py:126-131) through BOTH API surfaces in one
    union: correlated EXISTS / NOT EXISTS via the SQL API (Catalyst
    decorrelates to left-semi / left-anti hash joins — never per-row
    re-execution) and explicit ``left_semi`` / ``left_anti``
    DataFrame joins. Branches: customers with an open urgent order
    per segment; nations' customers with no order since 1999;
    row-level inactive-since-2000 customers (anti); segments with a
    finished order (semi). At scale every branch builds a hash set
    from the selective side — no row explosion."""
    v = _views(spark, sf_dir, "customer", "orders")
    sql_part = spark.sql(f"""
        SELECT 'exists_urgent_by_segment' AS family, c_mktsegment AS k,
               count(*) AS n
        FROM {v['customer']} c
        WHERE EXISTS (SELECT 1 FROM {v['orders']} o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'O'
                        AND o.o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment
        UNION ALL
        SELECT 'not_exists_dormant_by_nation',
               CAST(c.c_nationkey AS STRING), count(*)
        FROM {v['customer']} c
        WHERE NOT EXISTS (SELECT 1 FROM {v['orders']} o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate
                                >= TIMESTAMP '1999-01-01 00:00:00')
        GROUP BY c.c_nationkey
    """)
    cu = tbl(spark, sf_dir, "customer")
    od = tbl(spark, sf_dir, "orders")
    recent = (od.filter(F.col("o_orderdate")
                        >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
              .select("o_custkey"))
    inactive = (cu.join(recent, cu.c_custkey == recent.o_custkey,
                        "left_anti")
                .select(F.lit("inactive_customers").alias("family"),
                        F.col("c_custkey").cast("string").alias("k"),
                        F.lit(1).cast("long").alias("n")))
    f_orders = (od.filter(F.col("o_orderstatus") == "F")
                .select("o_custkey"))
    open_seg = (cu.join(f_orders, cu.c_custkey == f_orders.o_custkey,
                        "left_semi")
                .groupBy(F.col("c_mktsegment").alias("k"))
                .agg(F.count("*").alias("n"))
                .select(F.lit("open_segments").alias("family"), "k", "n"))
    return sql_part.unionByName(inactive).unionByName(open_seg)


def q17_small_quantity_revenue(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — correlated scalar aggregate subquery
    (avg quantity per part) driving a fact filter. Catalyst
    decorrelates it into a per-partkey aggregate joined back to the
    fact scan — one pass, no per-row re-aggregation. The threshold is
    written as sum/count over exact integer quantities so both engines
    compute the identical IEEE double before the single comparison
    (the round-boundary hazard lives in the aggregate, not here).
    Oracle-gated as the ``q17`` family of
    :func:`~picoprobedataflow_spark.plans.relational.tpch_extra_suite`
    since round 14 (standalone entry folded to free a catalog slot);
    the bench key keeps timing this plan directly."""
    v = _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(f"""
        SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
                   / 700.0 AS avg_yearly
        FROM {v['lineitem']}
        JOIN {v['part']} ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < (SELECT 0.2 * (CAST(sum(CAST(round(l2.l_quantity)
                                                        AS BIGINT))
                                               AS DOUBLE) / count(*))
                            FROM {v['lineitem']} l2
                            WHERE l2.l_partkey = p_partkey)
    """)


@query(
    "q18_large_volume_orders",
    oracle="""
SELECT c_name, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey
                     HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 300)
GROUP BY c_name, o_orderkey, strftime(o_orderdate, '%Y-%m-%d')
ORDER BY sum_qty DESC, o_orderkey
LIMIT 100
""",
    tags=("A1", "O2", "subquery", "tpch-q18"),
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — IN over a grouped-HAVING subquery. The
    subquery aggregates the fact table down to qualifying orderkeys
    (a left-semi join after decorrelation) before the 3-way join, so
    the join input is pre-reduced — the order that survives 1000×.
    The date is emitted as a yyyy-MM-dd STRING on both sides (catalog
    encoding rule: never raw DATE values through the hash gate)."""
    v = _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(f"""
        SELECT c_name, o_orderkey,
               date_format(o_orderdate, 'yyyy-MM-dd') AS o_orderdate,
               sum(CAST(round(l_quantity) AS BIGINT)) AS sum_qty
        FROM {v['customer']}
        JOIN {v['orders']}   ON c_custkey = o_custkey
        JOIN {v['lineitem']} ON l_orderkey = o_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM {v['lineitem']}
                             GROUP BY l_orderkey
                             HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 300)
        GROUP BY c_name, o_orderkey, date_format(o_orderdate, 'yyyy-MM-dd')
        ORDER BY sum_qty DESC, o_orderkey
        LIMIT 100
    """)


@query(
    "q21_last_shipper_per_order",
    oracle="""
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders    ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
""",
    tags=("subquery", "exists", "not-exists", "tpch-q21"),
)
def q21_last_shipper_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — two correlated subqueries on the SAME query
    (EXISTS + NOT EXISTS), each with an inequality predicate riding the
    orderkey equi-correlation: suppliers who shipped last on finished
    multi-supplier orders. Decorrelation keeps the orderkey as the join
    key, so both become hash semi/anti joins with a residual non-equi
    condition — never a nested loop (l_receiptdate/commitdate do not
    exist in this schema; shipdate carries the lateness semantics)."""
    v = _views(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(f"""
        SELECT s_name, count(*) AS numwait
        FROM {v['supplier']}
        JOIN {v['lineitem']} l1 ON s_suppkey = l1.l_suppkey
        JOIN {v['orders']}      ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND EXISTS (SELECT 1 FROM {v['lineitem']} l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM {v['lineitem']} l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 10
    """)


@query(
    "q22_rich_dormant_customers",
    oracle="""
SELECT c_nationkey, count(*) AS numcust,
       sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS totacctbal
FROM customer c
WHERE c_nationkey IN (1, 3, 5, 7, 9)
  AND CAST(round(c_acctbal * 100) AS BIGINT)
      > (SELECT CAST(sum(CAST(round(c2.c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                / count(*)
         FROM customer c2 WHERE c2.c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_nationkey
""",
    tags=("subquery", "scalar-subquery", "not-exists", "tpch-q22"),
)
def q22_rich_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — uncorrelated scalar aggregate subquery as a
    filter threshold plus NOT EXISTS anti-membership: above-average-
    balance customers in selected nations who never ordered. The
    threshold compares exact integer cents against a sum/count double
    that both engines compute identically (exact int64 sum, one
    division), sidestepping float-avg drift at the comparison
    boundary. (This schema has no phone column; nationkey stands in
    for the country-code prefix.)"""
    v = _views(spark, sf_dir, "customer", "orders")
    return spark.sql(f"""
        SELECT c_nationkey, count(*) AS numcust,
               sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0
                   AS totacctbal
        FROM {v['customer']} c
        WHERE c_nationkey IN (1, 3, 5, 7, 9)
          AND CAST(round(c_acctbal * 100) AS BIGINT)
              > (SELECT CAST(sum(CAST(round(c2.c_acctbal * 100) AS BIGINT))
                             AS DOUBLE) / count(*)
                 FROM {v['customer']} c2 WHERE c2.c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM {v['orders']} o
                          WHERE o.o_custkey = c.c_custkey)
        GROUP BY c_nationkey
    """)


@query(
    "q4_priority_with_late_ship",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
    tags=("subquery", "exists", "tpch-q4"),
)
def q4_priority_with_late_ship(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with a NON-equi correlated predicate
    (l_shipdate > o_orderdate, the commit/receipt-date analog on this
    schema) — decorrelates to a left-semi join whose condition mixes
    the equi key with the inequality, so the semi join still hashes on
    l_orderkey and evaluates the date comparison as a residual. One
    quarter of orders per priority bucket."""
    v = _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(f"""
        SELECT o_orderpriority, count(*) AS order_count
        FROM {v['orders']} o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM {v['lineitem']} l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
    """)


# --------------------------------------------------------------------------
# The last three TPC-H shapes (round 5): Q2 / Q12 / Q20, adapted to the
# star schema the testdata ships (no partsupp / l_shipmode /
# l_commitdate — lineitem is the part↔supplier bridge, the
# late-shipment predicate stands in for commit<receipt, and
# l_linestatus stands in for l_shipmode). With these the catalog
# carries all 22 TPC-H query shapes oracle-gated.
# --------------------------------------------------------------------------

_TPCH_GAP_ORACLE = """
WITH cost AS MATERIALIZED (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS supply_cost
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY 1, 2
)
SELECT 'q2' AS family, CAST(p_partkey AS VARCHAR) AS k1, s_name AS k2,
       c.supply_cost / 1e2 AS v1, s_acctbal AS v2
FROM part p
JOIN cost c ON p.p_partkey = c.partkey
JOIN supplier ON c.suppkey = s_suppkey
WHERE p_size IN (9, 19, 36) AND p_type IN ('STANDARD', 'ECONOMY')
  AND c.supply_cost = (SELECT min(c2.supply_cost) FROM cost c2
                       WHERE c2.partkey = p.p_partkey)
UNION ALL
SELECT 'q12', l_linestatus, NULL,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS DOUBLE),
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS DOUBLE)
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
  AND EXTRACT(year FROM l_shipdate) = 1997
GROUP BY 2
UNION ALL
SELECT 'q20', s_name, n_name, s_acctbal, CAST(NULL AS DOUBLE)
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AMERICA'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part
                        WHERE p_name LIKE '%bolt%')
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_partkey, l_suppkey
    HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 30
  )
"""


def tpch_gap_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three TPC-H shapes the catalog lacked, normalized to
    (family, k1, k2, v1, v2):

    - ``q2`` minimum-cost supplier: the supply cost of a
      (part, supplier) pair is the minimum exact-cents extended price
      over their lineitems (lineitem is this schema's partsupp
      bridge), restricted to EUROPE suppliers; the correlated scalar
      ``min`` picks each part's cheapest supplier. Catalyst
      decorrelates the scalar subquery into a per-partkey aggregate
      joined back on (partkey, supply_cost) — the CTE's grouped
      aggregate is computed once, not per part row, and ties emit all
      minimum-cost suppliers (deterministic, no arbitrary pick).
    - ``q12`` late-shipment priority split: conditional-sum pivot of
      high- vs low-priority order counts per l_linestatus (the
      schema's ship-mode stand-in) over lineitems shipped ≥60 days
      after the order date — one equi-join + one hash aggregate; the
      CASE sums are map-side partial.
    - ``q20`` excess-volume suppliers: nested IN subqueries (part
      name slice → grouped HAVING over shipped quantity → supplier
      membership) — both INs decorrelate to left-semi joins; the
      inner aggregate reduces lineitem to qualifying suppkeys before
      touching supplier, so the semi-join build side is bounded by
      |suppliers|, not |lineitems|.

    Exact-integer money/quantity discipline throughout
    (cents / rounded-quantity BIGINTs) so both engines compare
    identical integers; doubles appear only in final emitted values.
    Reference parity: the flow analyzer's per-run cheapest/excess
    lookups (picoprobe/flow_analyzer.py:174-196) are dict-probe
    loops; these are their decorrelated relational generalizations.
    """
    v = _views(spark, sf_dir, "region", "nation", "supplier", "part",
               "orders", "lineitem")
    return spark.sql(f"""
        WITH cost AS (
          SELECT l_partkey AS partkey, l_suppkey AS suppkey,
                 min(CAST(round(l_extendedprice * 100) AS BIGINT))
                     AS supply_cost
          FROM {v['lineitem']}
          JOIN {v['supplier']} ON l_suppkey = s_suppkey
          JOIN {v['nation']}   ON s_nationkey = n_nationkey
          JOIN {v['region']}   ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'
          GROUP BY 1, 2
        )
        SELECT 'q2' AS family, CAST(p_partkey AS STRING) AS k1,
               s_name AS k2, c.supply_cost / 1e2 AS v1, s_acctbal AS v2
        FROM {v['part']} p
        JOIN cost c ON p.p_partkey = c.partkey
        JOIN {v['supplier']} ON c.suppkey = s_suppkey
        WHERE p_size IN (9, 19, 36) AND p_type IN ('STANDARD', 'ECONOMY')
          AND c.supply_cost = (SELECT min(c2.supply_cost) FROM cost c2
                               WHERE c2.partkey = p.p_partkey)
        UNION ALL
        SELECT 'q12', l_linestatus, NULL,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS DOUBLE),
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT',
                                                          '2-HIGH')
                             THEN 1 ELSE 0 END) AS DOUBLE)
        FROM {v['lineitem']}
        JOIN {v['orders']} ON l_orderkey = o_orderkey
        WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
          AND EXTRACT(year FROM l_shipdate) = 1997
        GROUP BY 2
        UNION ALL
        SELECT 'q20', s_name, n_name, s_acctbal, CAST(NULL AS DOUBLE)
        FROM {v['supplier']}
        JOIN {v['nation']} ON s_nationkey = n_nationkey
        JOIN {v['region']} ON n_regionkey = r_regionkey
        WHERE r_name = 'AMERICA'
          AND s_suppkey IN (
            SELECT l_suppkey FROM {v['lineitem']}
            WHERE l_partkey IN (SELECT p_partkey FROM {v['part']}
                                WHERE p_name LIKE '%bolt%')
              AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY l_partkey, l_suppkey
            HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 30
          )
    """)
