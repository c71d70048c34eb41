"""Parquet table loaders for the test/bench star schema.

The driver materializes the tables listed in ``TESTDATA.md`` at
``/root/testdata/sf*/<name>.parquet``. Loading goes through
``spark.read.parquet`` so Catalyst owns predicate pushdown, column
pruning, and partition splitting — at 100 TB the same call reads a
partitioned directory tree and prunes partitions from the WHERE
clause for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

#: Tables small enough to broadcast in any realistic deployment
#: (dimension tables of the star schema). Used for join hints.
SMALL_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Schema comes from parquet footers (no inference)."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLE_NAMES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLE_NAMES) -> None:
    """Register every table as a temp view for the SQL API."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
