"""Streaming count-min sketch — corpus-wide heavy-hitter counts
maintained across micro-batches (round 15).

The CMS is a MONOID: cells are sums, so the sketch of a union is the
cell-wise sum of the sketches — the property that makes it the
canonical streaming frequency summary (and what HLL is to distinct
counts, this is to counts). The loop keeps one (seed, bucket, cell)
delta table per epoch under the :mod:`.dedup_stream` state
conventions; querying merges the deltas with one d·w-bounded
aggregate. A drained stream's merged cells are BIT-IDENTICAL to the
one-shot batch sketch of the same corpus (pytest-pinned — exact, not
approximate, equality: the approximation lives in the estimate's
collision bias, never in the merge).

Scale shape: per-epoch work = the batch's token explode + term
aggregate + d bucket aggregates (map-side partial, ≤ d·w rows reach
the shuffle); state = d·w rows per epoch, a few KB, compacted by
ordinary parquet lifecycle. Estimates are a broadcast-sized join of
the query terms against the merged cells.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from picoprobedataflow_spark.streaming.dedup_stream import (
    _state, _write_epoch)

CELL_SCHEMA = "seed int, bucket long, cell long"

#: Sketch geometry — shared by the batch family
#: (:func:`..plans.pipeline.cms_heavy_hitters` uses its own gated
#: constants; the stream defaults mirror the production-leaning
#: wider shape) and every consumer of the same state dir.
CMS_W, CMS_D = 128, 4


def _bucket(tok, seed: str, w: int):
    """The engine's md5-bucket convention (cdc_chunk_dedup,
    content_fingerprints, the batch CMS family) — identical
    arithmetic on every engine that can md5."""
    return (F.conv(F.substring(F.md5(F.concat(F.lit(seed), tok)),
                               1, 8), 16, 10).cast("long") % w)


def _cells_of(docs: DataFrame, text_col: str,
              w: int, d: int) -> DataFrame:
    """(seed, bucket, cell) for one document frame — the batch
    sketch, reused verbatim by the streaming loop per micro-batch."""
    from picoprobedataflow_spark.functions.text import words

    toks = docs.select(F.explode(words(text_col)).alias("tok"))
    tf = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    melted = None
    for i in range(d):
        part = tf.select(F.lit(i).cast("int").alias("seed"),
                         _bucket(F.col("tok"), f"s{i}", w)
                         .alias("bucket"),
                         F.col("cnt"))
        melted = part if melted is None else melted.unionByName(part)
    return (melted.groupBy("seed", "bucket")
            .agg(F.sum("cnt").cast("long").alias("cell")))


def run_cms_stream(doc_stream: DataFrame, state_dir: str,
                   checkpoint_dir: str, *,
                   text_col: str = "text",
                   w: int = CMS_W, d: int = CMS_D,
                   available_now: bool = True) -> StreamingQuery:
    """Maintain the sketch over a streaming document frame. Writes
    per-epoch cell DELTAS under ``state_dir``/cells (dynamic
    partition overwrite — a replayed epoch overwrites its own
    partitions, so recovery never double-counts)."""
    spark = doc_stream.sparkSession
    cell_dir = os.path.join(state_dir, "cells")

    def _process(batch: DataFrame, epoch_id: int) -> None:
        if not batch.head(1):
            return
        _write_epoch(_cells_of(batch, text_col, w, d),
                     cell_dir, epoch_id)

    writer = (doc_stream.writeStream
              .foreachBatch(_process)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="1 second")
    return writer.start()


def merged_cells(spark: SparkSession, state_dir: str) -> DataFrame:
    """(seed, bucket, cell): the epoch deltas merged — the monoid
    sum, ≤ d·w rows."""
    cell_dir = os.path.join(state_dir, "cells")
    return (_state(spark, cell_dir, CELL_SCHEMA)
            .groupBy("seed", "bucket")
            .agg(F.sum("cell").cast("long").alias("cell")))


def cms_estimate(spark: SparkSession, state_dir: str,
                 terms: list[str], *,
                 w: int = CMS_W, d: int = CMS_D) -> DataFrame:
    """(term, est): count estimates for ``terms`` against the
    accumulated sketch — min over the d rows' cells, the CMS read
    path. A term whose buckets were never touched estimates 0 (it
    never occurred — the sketch has no false negatives)."""
    q = spark.createDataFrame([(t,) for t in terms], "term string")
    melted = None
    for i in range(d):
        part = q.select("term",
                        F.lit(i).cast("int").alias("seed"),
                        _bucket(F.col("term"), f"s{i}", w)
                        .alias("bucket"))
        melted = part if melted is None else melted.unionByName(part)
    cells = merged_cells(spark, state_dir)
    return (melted.join(cells, ["seed", "bucket"], "left")
            .groupBy("term")
            .agg(F.min(F.coalesce("cell", F.lit(0)))
                 .cast("long").alias("est")))
