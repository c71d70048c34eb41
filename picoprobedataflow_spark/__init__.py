"""picoprobedataflow_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of ``ramanathanlab/PicoProbeDataFlow`` (the reference, a
file-triggered dataflow/ETL system for electron-microscope data plus a
pandas telemetry mini-warehouse) on top of Apache Spark:

- DataFrame/SQL for every relational operator (Catalyst picks the
  physical strategy; predicates/projections push down to Parquet).
- Structured Streaming for the file-watch ingest pipeline
  (reference: ``picoprobe/utils.py:80-131`` Watcher + CheckPoint).
- Arrow-batched ``pandas_udf`` / ``applyInPandas`` / ``mapInPandas``
  only for kernels the built-ins genuinely cannot express
  (HDF5 extraction, video encode, model inference).

Modules
-------
- :mod:`.session`    — SparkSession factory tuned for the target.
- :mod:`.io`         — sources/sinks (parquet tables, binary files, EMD).
- :mod:`.functions`  — scalar function layer (SURVEY.md §2.8 F1-F20).
- :mod:`.operators`  — relational + telemetry + data-pipeline operators.
- :mod:`.plans`      — the named query catalog exposed to the driver.
- :mod:`.streaming`  — structured-streaming ingest pipelines.
"""

__version__ = "0.1.0"

from picoprobedataflow_spark.session import get_spark  # noqa: F401
