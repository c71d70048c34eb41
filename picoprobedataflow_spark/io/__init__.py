"""Sources and sinks."""

from picoprobedataflow_spark.io.tables import TABLE_NAMES, load_table, load_tables  # noqa: F401
