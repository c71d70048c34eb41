"""Query registry.

A query is a callable ``(spark, sf_dir) -> DataFrame`` plus, when the
semantics are ANSI-SQL-expressible, an oracle SQL string DuckDB can run
on the same parquet tables. The driver hash-compares the two at
sf=0.01 (order-insensitive, columns sorted by name), so:

- every computed column is aliased identically on both sides;
- floating aggregates are rounded on both sides (summation order
  differs between engines; see ``round`` calls in each query);
- timestamps are returned as epoch-second doubles or ISO strings,
  never raw timestamp values, to dodge engine-specific encodings.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None,
          tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a catalog query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle,
            doc=(fn.__doc__ or "").strip(), tags=tuple(tags),
        )
        return fn

    return deco


def get_query(name: str) -> QuerySpec:
    return _REGISTRY[name]


def all_queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in sorted(_REGISTRY.items())}


def all_oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in sorted(_REGISTRY.items())
            if s.oracle is not None}


def specs() -> dict[str, QuerySpec]:
    return dict(sorted(_REGISTRY.items()))
