"""Record-oriented side sources — SURVEY §2.1 S7/S8/S10.

These are the reference's non-file inputs: the paginated Flows-service
REST listing (``get_flow_runs``, flow_analyzer.py:81-113), the SQLite
``transitions`` task log (performance.ipynb cell 8), and pickled run
records (flow_analyzer.py:471-472). All three are driver-side,
bounded-size ingest paths (telemetry, not the 100 TB data plane):
fetch → normalize → ``spark.createDataFrame`` (Arrow) → from there
everything is relational. A JDBC path for SQLite is noted but the
sqlite JDBC jar is not on this classpath; the stdlib reader keeps the
source dependency-free.
"""

from __future__ import annotations

import pickle
import sqlite3
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

#: FIXTURES.md §4 — the transitions table (epoch-ns ints on purpose).
TRANSITIONS_SCHEMA = (
    "task_uuid string, message string, state_time long, user_id long, "
    "task_group_uuid string, actor string, endpoint_uuid string, "
    "function_uuid string, container_uuid string, asctime string")


def read_sqlite(spark: SparkSession, db_path: str, table: str,
                schema: str | None = None) -> DataFrame:
    """S8 — SQLite table → DataFrame via the stdlib driver.

    Equivalent JDBC form (needs the xerial sqlite-jdbc jar):
    ``spark.read.format("jdbc").option("url", f"jdbc:sqlite:{db_path}")
    .option("dbtable", table).load()``.
    """
    con = sqlite3.connect(db_path)
    try:
        cur = con.execute(f"SELECT * FROM {table}")  # noqa: S608 - table from caller
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
    finally:
        con.close()
    if schema is None:
        schema = ", ".join(f"{c} string" for c in cols)
    return spark.createDataFrame(rows, schema)


def paginated_rest_scan(spark: SparkSession,
                        fetch_page: Callable[[str | None], dict],
                        schema: str, limit: int = 100) -> DataFrame:
    """S7 — marker-paginated REST listing → DataFrame.

    ``fetch_page(marker) -> {"runs": [...], "has_next_page": bool,
    "marker": str | None}`` mirrors the Globus Flows pager consumed at
    flow_analyzer.py:81-113 (loop while has_next_page, cut at limit).
    The pager is injected so tests (and air-gapped runs) fake it.
    """
    records: list[dict] = []
    marker: str | None = None
    while len(records) < limit:
        page = fetch_page(marker)
        records.extend(page.get("runs", []))
        if not page.get("has_next_page"):
            break
        marker = page.get("marker")
    records = records[:limit]  # O2: head-N after pagination
    field_names = [f.split()[0] for f in schema.split(",")]
    rows = [tuple(r.get(k) for k in field_names) for r in records]
    return spark.createDataFrame(rows, schema)


def read_pickled_runs(spark: SparkSession, path: str,
                      schema: str,
                      extract: Callable[[object], Iterator[tuple]] | None = None
                      ) -> DataFrame:
    """S10 — pickled run records → DataFrame (one-time conversion; the
    reference ships its 72+18-run telemetry as .pkl snapshots).

    SECURITY: unpickling executes arbitrary code — only load artifacts
    you produced. ``extract`` adapts arbitrary pickle layouts to rows.
    """
    with open(path, "rb") as f:
        obj = pickle.load(f)  # noqa: S301 - trusted local artifact
    if extract is None:
        rows = list(obj)
    else:
        rows = list(extract(obj))
    return spark.createDataFrame(rows, schema)
