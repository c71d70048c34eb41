"""JSONL corpus ingest/egress — the lingua franca of LLM training
corpora (C4, RedPajama, Dolma and most crawl releases ship as
``*.jsonl.gz`` shards, one document object per line).

100 TB discipline baked into the reader:

- **Schema is REQUIRED, never inferred.** Spark's JSON schema
  inference is a full extra pass over the data before the real read
  — at corpus scale that is the single most expensive default in
  the API. Callers pass the DDL they expect; drift shows up as
  corrupt-record rows instead of a silently widened schema.
- **Corrupt lines are data, not exceptions.** PERMISSIVE mode with
  an explicit ``_corrupt_record`` column: a truncated shard or a
  junk line lands as a row carrying its raw text, countable by the
  same data-quality gate as everything else (a crawl release
  ALWAYS has a few). ``mode="FAILFAST"`` is the opt-in for curated
  inputs.
- **Compression is transparent** on read by file extension; writes
  default to gzip (this runtime's text codecs: gzip/bzip2/deflate/
  lz4/snappy — zstd text shards need the hadoop zstd codec on the
  cluster classpath). Line-oriented gzip shards are splittable at
  the FILE level, so shard count (not codec) sets read parallelism:
  write many medium shards, never one giant one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Column that captures the raw text of unparseable lines.
CORRUPT_COL = "_corrupt_record"


def read_jsonl_corpus(spark: SparkSession, path: str, schema: str,
                      mode: str = "PERMISSIVE") -> DataFrame:
    """Read a JSONL corpus with a pinned schema. The returned frame
    carries ``_corrupt_record`` (NULL for clean rows); filter/count
    it as the ingest health metric. Note Spark's caveat: counting
    corrupt rows requires referencing at least one data column too
    (a bare ``_corrupt_record``-only projection is disallowed) —
    keep the id column in such queries."""
    full = schema.rstrip() + f", {CORRUPT_COL} string"
    return (spark.read
            .schema(full)
            .option("mode", mode)
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path))


def corrupt_line_stats(df: DataFrame,
                       id_col: str = "doc_id") -> DataFrame:
    """(n_rows, n_with_id, n_corrupt, corrupt_frac) of a jsonl read —
    one scalar aggregate, the shard-health row the dq gate alerts
    on. ``n_with_id`` (rows whose ``id_col`` parsed non-null) is
    both a real metric AND what keeps the query legal: Spark
    disallows queries over raw JSON whose referenced columns are
    ONLY the internal corrupt-record column, and column pruning
    would otherwise reduce this aggregate to exactly that."""
    bad = F.col(CORRUPT_COL).isNotNull().cast("int")
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(id_col).alias("n_with_id"),
        F.sum(bad).alias("n_corrupt"),
        F.round(F.sum(bad) / F.count(F.lit(1)), 6)
         .alias("corrupt_frac"))


def write_jsonl_corpus(df: DataFrame, path: str, n_shards: int,
                       compression: str = "gzip",
                       mode: str = "overwrite") -> None:
    """Write a corpus as ``n_shards`` compressed JSONL shards.
    ``repartition(n_shards)`` sets the shard count explicitly —
    downstream read parallelism equals shard count for gzip, so
    size shards at 100-500 MB compressed, never fewer shards than
    the cluster has cores."""
    drop = [CORRUPT_COL] if CORRUPT_COL in df.columns else []
    (df.drop(*drop)
       .repartition(n_shards)
       .write.mode(mode)
       .option("compression", compression)
       .json(path))
