"""Sequence packing — the concat-and-chop batch prep of LLM training:
documents are concatenated in a deterministic order (within each
split) into one token stream, which is chopped into fixed
``ctx_len``-token context windows. Each document lands at a global
token offset and spans one or more bins; the emitted map
(doc → bin_first/bin_last/offset) is what a loader needs to assemble
training batches without re-tokenizing.

The core is a *global ordered cumulative sum* — the textbook
single-reducer trap: ``SUM() OVER (ORDER BY ...)`` with no partition
key funnels the whole table through one task. This module computes it
in two phases instead (the classic scan-parallelization):

1. within-shard cumsum — a window partitioned by (split, shard),
   parallel across shards; a shard is a contiguous range of the
   ordering key (``doc_id div shard_span``), so shard order ≡ global
   order;
2. shard offsets — per-shard token totals (one tiny aggregate, |shards|
   rows) turned into exclusive prefix sums by a window over that tiny
   table, then broadcast back.

``global cumsum = shard offset + within-shard cumsum`` — exact integer
arithmetic, bit-identical to the single-window form (equivalence is
pytest-asserted). At 100 TB you'd repartitionByRange on the ordering
key first (sampled bounds) and use the partition id as the shard; the
contiguous-range requirement is the same.

Reference analog: the publication pipeline orders and batches files
deterministically before transfer (picoprobe/utils.py batching);
packing is the token-level version of that discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def pack_sequences(df: DataFrame, ctx_len: int = 512,
                   shard_span: int = 64, id_col: str = "doc_id",
                   tok_col: str = "n_tokens",
                   part_cols: tuple[str, ...] = ()) -> DataFrame:
    """Assign each row its packed position in the concatenated token
    stream of its partition (ordered by ``id_col``).

    Adds to ``df``:

    - ``cum_before``    — tokens before this doc in the stream;
    - ``bin_first``     — context window where the doc starts;
    - ``bin_last``      — context window where it ends;
    - ``n_bins``        — windows it spans;
    - ``offset_in_bin`` — token offset inside ``bin_first``.

    ``shard_span`` controls parallelism: ordering keys are grouped
    into contiguous ranges of that width, each range cumsum'd
    independently (window keyed by partition+shard), then stitched
    with broadcast per-shard offsets. Every value is exact int64."""
    parts = [F.col(c) for c in part_cols]
    shard = F.expr(f"CAST({id_col} AS BIGINT) div {int(shard_span)}")
    base = df.withColumn("_shard", shard)

    totals = (base.groupBy(*part_cols, "_shard")
              .agg(F.sum(tok_col).cast("long").alias("_shard_toks")))
    w_shards = (W.partitionBy(*part_cols).orderBy("_shard")
                .rowsBetween(W.unboundedPreceding, -1))
    offsets = (totals
               .withColumn("_shard_off",
                           F.coalesce(F.sum("_shard_toks").over(w_shards),
                                      F.lit(0)).cast("long"))
               .drop("_shard_toks"))

    w_in = (W.partitionBy(*part_cols, "_shard").orderBy(id_col)
            .rowsBetween(W.unboundedPreceding, -1))
    cum_in = F.coalesce(F.sum(tok_col).over(w_in), F.lit(0))

    packed = (base
              .withColumn("_cum_in", cum_in.cast("long"))
              .join(F.broadcast(offsets), [*part_cols, "_shard"])
              .withColumn("cum_before",
                          (F.col("_shard_off") + F.col("_cum_in"))
                          .cast("long"))
              .drop("_shard", "_cum_in", "_shard_off"))

    packed = packed.select(*df.columns, "cum_before")

    tok = F.greatest(F.col(tok_col).cast("long"), F.lit(1))
    return (packed
            .withColumn("bin_first",
                        F.expr(f"cum_before div {int(ctx_len)}"))
            .withColumn("bin_last",
                        (F.col("cum_before") + tok - 1)
                        .cast("long"))
            .withColumn("bin_last",
                        F.expr(f"bin_last div {int(ctx_len)}"))
            .withColumn("n_bins",
                        (F.col("bin_last") - F.col("bin_first") + 1)
                        .cast("long"))
            .withColumn("offset_in_bin",
                        F.col("cum_before") % F.lit(int(ctx_len))))


def pack_sequences_single_window(df: DataFrame, ctx_len: int = 512,
                                 id_col: str = "doc_id",
                                 tok_col: str = "n_tokens",
                                 part_cols: tuple[str, ...] = ()
                                 ) -> DataFrame:
    """Reference formulation: one global ordered window per partition
    (the single-reducer plan). Used only to assert the two-phase form
    is value-identical; never the deployed path."""
    w = (W.partitionBy(*[F.col(c) for c in part_cols]).orderBy(id_col)
         .rowsBetween(W.unboundedPreceding, -1))
    tok = F.greatest(F.col(tok_col).cast("long"), F.lit(1))
    out = df.withColumn("cum_before",
                        F.coalesce(F.sum(tok_col).over(w), F.lit(0))
                        .cast("long"))
    return (out
            .withColumn("bin_first",
                        F.expr(f"cum_before div {int(ctx_len)}"))
            .withColumn("bin_last",
                        (F.col("cum_before") + tok - 1).cast("long"))
            .withColumn("bin_last",
                        F.expr(f"bin_last div {int(ctx_len)}"))
            .withColumn("n_bins",
                        (F.col("bin_last") - F.col("bin_first") + 1)
                        .cast("long"))
            .withColumn("offset_in_bin",
                        F.col("cum_before") % F.lit(int(ctx_len))))
