"""Physical data layout for parquet output: file sizing (compaction)
and z-order clustering.

Why this is an engine feature, not an ops afterthought: at 100 TB the
two silent killers of downstream scans are (a) millions of small files
— every one is a task, a footer fetch, an open/close — and (b) files
whose min/max column ranges span the whole domain, so predicate-driven
row-group pruning never skips anything. Both are fixed at WRITE time;
no amount of read-side tuning recovers them.

- :func:`estimate_row_bytes` / :func:`write_sized` — pick the
  partition (= output file) count from measured bytes, not guesses, so
  files land near a target size (default 128 MB, the same unit
  ``spark.sql.files.maxPartitionBytes`` splits reads into).
- :func:`zorder_key` / :func:`write_zordered` — interleave the bits of
  bucketized sort dimensions (Morton order) and range-partition +
  sort by that key, so every output file covers a tight hyper-rectangle
  of the filter space and multi-dimension predicates prune files, not
  just row groups. The bucket bounds come from one scalar min/max
  aggregate (:func:`compute_bounds` — 2 values per dimension cross the
  driver, inlined as literals so the key is a pure row-local
  expression) or from caller-supplied table stats.

Reference analog: the publication flow batches files into
fixed-count transfer groups (picoprobe/utils.py:93-104 batch_files) —
the same "bound the unit of work at write time" discipline, applied
here to bytes and value locality instead of file counts.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def compute_bounds(df: DataFrame,
                   cols: tuple[str, ...]) -> dict[str, tuple[float, float]]:
    """Per-column (min, max) from ONE scalar aggregate — 2·len(cols)
    values cross the driver, nothing else. The default bounds source
    for :func:`write_zordered`; at 100 TB prefer table stats or a
    prior stage's metrics and pass ``bounds=`` directly. (A
    whole-frame window would compute the same scalars but funnel
    every row through a single WindowExec partition.)"""
    aggs = []
    for c in cols:
        v = F.col(c).cast("double")
        aggs += [F.min(v).alias(f"_lo_{c}"), F.max(v).alias(f"_hi_{c}")]
    row = df.agg(*aggs).head()
    return {c: (row[f"_lo_{c}"], row[f"_hi_{c}"]) for c in cols}

#: Fixed-width column byte estimates (parquet plain encoding, before
#: compression — deliberately conservative: compression helps but
#: varies, and oversized files hurt less than tiny ones).
_FIXED_WIDTH: dict[type, int] = {
    T.BooleanType: 1, T.ByteType: 1, T.ShortType: 2, T.IntegerType: 4,
    T.LongType: 8, T.FloatType: 4, T.DoubleType: 8, T.DateType: 4,
    T.TimestampType: 8, T.TimestampNTZType: 8,
}


def _col_bytes(field: T.StructField) -> Column:
    dt = field.dataType
    name = field.name
    if type(dt) in _FIXED_WIDTH:
        return F.lit(_FIXED_WIDTH[type(dt)])
    if isinstance(dt, (T.StringType, T.BinaryType)):
        return F.coalesce(F.length(F.col(name)), F.lit(0)) + 4
    if isinstance(dt, T.DecimalType):
        return F.lit(16)
    if isinstance(dt, T.ArrayType) and type(dt.elementType) in _FIXED_WIDTH:
        return (F.coalesce(F.size(F.col(name)), F.lit(0))
                * _FIXED_WIDTH[type(dt.elementType)] + 4)
    # nested/map/struct: serialize-to-json length as the estimate
    return F.coalesce(F.length(F.to_json(F.col(name))), F.lit(0)) + 4


def estimate_row_bytes(df: DataFrame, sample_rows: int = 10_000) -> float:
    """Mean uncompressed bytes/row, measured on a bounded head sample
    (one partial scan; never a full pass). Good enough to size files —
    being 2× off yields 64 or 256 MB files, both fine."""
    size_expr = None
    for field in df.schema.fields:
        c = _col_bytes(field)
        size_expr = c if size_expr is None else size_expr + c
    row = (df.limit(sample_rows)
           .select(F.avg(size_expr).alias("b"), F.count("*").alias("n"))
           .head())
    return float(row.b or 0.0)


def write_sized(df: DataFrame, path: str, target_mb: int = 128,
                row_count: int | None = None,
                partition_by: tuple[str, ...] = (),
                mode: str = "overwrite") -> int:
    """Write parquet with data-derived file sizing; returns the file
    count used. ``row_count`` skips the count job if the caller already
    knows it (e.g. from a previous stage's metrics).

    Two guards compose: the partition count targets ``target_mb`` per
    file, and ``maxRecordsPerFile`` caps stragglers if rows are wider
    than the sample suggested. With ``partition_by``, rows are
    pre-shuffled by the partition columns so each directory gets
    whole-file writes instead of one open file per task per key —
    the classic small-files explosion of partitioned writes."""
    bytes_per_row = max(estimate_row_bytes(df), 1.0)
    n = row_count if row_count is not None else df.count()
    target_bytes = target_mb * 1024 * 1024
    n_files = max(1, math.ceil(n * bytes_per_row / target_bytes))
    rows_per_file = max(1, int(target_bytes / bytes_per_row))

    if partition_by:
        out = df.repartition(n_files, *[F.col(c) for c in partition_by])
    else:
        out = df.repartition(n_files)
    (out.write.mode(mode)
        .option("maxRecordsPerFile", rows_per_file)
        .partitionBy(*partition_by)
        .parquet(path))
    return n_files


def zorder_key(cols: tuple[Column | str, ...],
               bits_per_dim: int = 8,
               bounds: dict[str, tuple[float, float]] | None = None
               ) -> Column:
    """Morton (z-order) key over up to 4 dimensions: each column is
    bucketized to ``bits_per_dim`` bits over its min/max range, then
    the bucket bits are interleaved so nearby keys are nearby in EVERY
    dimension. Pure JVM bit arithmetic, no UDF.

    ``bounds`` ({col: (lo, hi)}) makes the key a pure row-local
    expression; :func:`compute_bounds` derives it from the data with
    one scalar aggregate (what :func:`write_zordered` does when the
    caller has none), table stats or a prior stage's metrics are the
    100 TB sources. Requiring bounds keeps the key expression free of
    whole-frame windows — a no-partition WindowExec would funnel every
    row through one partition. Same bounds → bit-identical keys from
    either source (pytest-asserted)."""
    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder_key supports 1-4 dimensions")
    if bounds is None:
        raise ValueError(
            "zorder_key needs bounds; derive them with "
            "compute_bounds(df, cols) or pass table-stats values")
    n_buckets = 1 << bits_per_dim
    key = F.lit(0).cast("long")
    for d, c in enumerate(cols):
        name = c if isinstance(c, str) else None
        c = F.col(c) if isinstance(c, str) else c
        v = c.cast("double")
        if name is None or name not in bounds:
            raise ValueError("bounds requires named columns")
        lo_v, hi_v = bounds[name]
        if lo_v is None or hi_v is None:
            raise ValueError(
                f"zorder_key: bounds for {name!r} are null — empty "
                "input or all-null column; nothing to bucketize")
        lo = F.lit(float(lo_v))
        span = F.lit(float(hi_v - lo_v) or 1.0)
        bucket = F.least(
            F.floor((v - lo) / span * n_buckets).cast("long"),
            F.lit(n_buckets - 1))
        bucket = F.greatest(bucket, F.lit(0))
        for b in range(bits_per_dim):
            bit = F.shiftright(bucket, b).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit.cast("long"),
                                    b * len(cols) + d)
    return key


def write_zordered(df: DataFrame, path: str,
                   zorder_by: tuple[str, ...],
                   n_files: int = 8,
                   bits_per_dim: int = 8,
                   bounds: dict[str, tuple[float, float]] | None = None,
                   mode: str = "overwrite") -> None:
    """Cluster rows by Morton key and write parquet so multi-dimension
    range predicates prune whole files via parquet min/max stats.

    ``bounds`` ({col: (lo, hi)}) is the 100 TB path: bounds from table
    stats or a prior aggregate, making the key a pure row-local
    expression. Without it, :func:`compute_bounds` measures min/max
    with one scalar aggregate first — one extra bounded-output pass,
    never a whole-frame window.

    File boundaries are PREFIX-ALIGNED, not row-count-derived: the key
    space is cut into ``2^ceil(log2(n_files))`` top-bit cells and each
    file is assigned a contiguous run of whole cells. Range-partitioning
    the raw key draws boundaries wherever the row-count sampler lands —
    one file then straddles a cell and its bounding box doubles, which
    is exactly the file a range predicate fails to prune. Cell-aligned
    boundaries make the per-file hyper-rectangle guarantee real rather
    than statistical (pytest-measured from parquet footer stats)."""
    if bounds is None:
        bounds = compute_bounds(df, tuple(zorder_by))
    if any(lo is None or hi is None for lo, hi in bounds.values()):
        # Empty input (or an all-null key column): there is nothing to
        # cluster — write the data as-is instead of crashing inside
        # float(None). An incremental stage whose filter matched no
        # rows still produces its (empty) output dataset.
        df.write.mode(mode).parquet(path)
        return
    key = zorder_key(tuple(zorder_by), bits_per_dim, bounds)
    total_bits = bits_per_dim * len(zorder_by)
    k = max(0, math.ceil(math.log2(max(1, n_files))))
    shift = max(0, total_bits - k)
    # _zfile: floor(cell * n_files / 2^k) — contiguous whole cells per
    # file, exact when n_files is a power of two. Range-partition on the
    # file id alone so a sampling wobble can only merge ADJACENT cells
    # (still one tight box), never split a cell across files.
    out = (df.withColumn("_zkey", key)
             .withColumn(
                 "_zfile",
                 (F.shiftright(F.col("_zkey"), shift)
                  * n_files / F.lit(1 << k)).cast("long"))
             .repartitionByRange(n_files, "_zfile")
             .sortWithinPartitions("_zkey")
             .drop("_zkey", "_zfile"))
    out.write.mode(mode).parquet(path)


def write_bucketed(df: DataFrame, table: str,
                   bucket_cols: tuple[str, ...], n_buckets: int,
                   sort_cols: tuple[str, ...] = (),
                   path: str | None = None,
                   mode: str = "overwrite") -> None:
    """Write a BUCKETED table: rows are hash-partitioned into
    ``n_buckets`` files per partition on ``bucket_cols`` (and
    optionally sorted within each bucket) AT WRITE TIME, recorded in
    the session catalog so later reads know the layout.

    Why this is the biggest recurring-join lever at 100 TB: a fact
    table joined on the same key every day (lineitem ⋈ orders on
    orderkey, events ⋈ profile on user_id) pays a full shuffle of
    both sides per run — unless both sides were bucketed on the join
    key with the same bucket count, in which case Spark's planner
    proves the co-partitioning from the catalog and plans the
    sort-merge join with NO Exchange on either side (and with
    ``sort_cols`` = join key, no Sort either side at read when each
    bucket is a single file). The shuffle is paid ONCE at write,
    then amortized over every downstream join/aggregation on that
    key — the same trade the packing/epoch layouts make for
    sequential reads, applied to join locality.
    (:func:`~tests.test_layout` plan-asserts the no-Exchange join.)

    ``path`` makes it an external table (data under ``path``,
    catalog holds only the layout metadata) — at 100 TB the catalog
    entry is what carries the bucketing contract between pipeline
    stages. Bucket counts must match across join sides; pick
    n_buckets so one bucket ≈ one task's worth (128-512 MB)."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def epoch_shuffle(df: DataFrame, epoch: int, n_shards: int = 8,
                  id_col: str = "doc_id") -> DataFrame:
    """Deterministic training-epoch shuffle: every row gets a
    (shard, pos) coordinate that is a pure function of
    (epoch, id) — md5("ep{epoch}:{id}") orders the epoch, its
    TOP-32-bit prefix picks the shard (never `pmod` over low bits —
    only a prefix key keeps shards contiguous in the global order),
    and ``pos`` is the rank within the shard.
    Re-running any epoch reproduces the exact order (resumable
    training, no ``rand()`` anywhere); different epochs give
    decorrelated orders from the same corpus. A loader reads shards
    in shard order, rows in pos order: concatenated, that IS the
    epoch's global hash order, because the shard key is the hash
    PREFIX — shard boundaries are contiguous ranges of the global
    order (the same contiguity trick as the packing shards).

    Scale shape: one hash projection (map-side) + one window keyed by
    the shard (corpus/n_shards rows per partition, n_shards chosen so
    a shard fits an executor — at 100 TB you'd also write
    ``partitionBy(shard)`` so each shard lands as its own file set,
    making epoch reads sequential). No global window, no sort, no
    shuffle beyond the one the window needs."""
    from pyspark.sql.window import Window as W

    h = F.md5(F.concat(F.lit(f"ep{int(epoch)}:"),
                       F.col(id_col).cast("string")).cast("binary"))
    # Hash-PREFIX sharding keeps shard ⇒ contiguous global-order range:
    # first 32 hash bits scaled to n_shards. Exact int64 arithmetic
    # ((v·n) >> 32) — a float divide would round differently across
    # engines at bucket boundaries.
    v = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    shard = F.shiftright(v * n_shards, 32).cast("int")
    base = df.withColumn("_h", h).withColumn("shard", shard)
    w = W.partitionBy("shard").orderBy("_h", id_col)
    return (base
            .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
            .select(F.col(id_col), "shard", "pos"))
