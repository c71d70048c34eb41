"""Named query catalog — the driver-facing surface.

Every operator row in ``SURVEY.md §2`` that is SQL-expressible is
registered here as a named query with a DuckDB oracle; non-relational
operators register rows-only queries (no oracle).
"""

from picoprobedataflow_spark.plans.catalog import (  # noqa: F401
    QuerySpec,
    all_queries,
    all_oracle_sql,
    get_query,
    query,
)

# Importing these modules populates the registry.
from picoprobedataflow_spark.plans import (  # noqa: F401,E402
    telemetry,
    relational,
    scalar_funcs,
    pipeline,
    scientific,
    windows_extra,
    streaming_query,
    subqueries,
)
