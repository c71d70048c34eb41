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
    if ctx_len < 1 or shard_span < 1:
        raise ValueError(
            f"ctx_len and shard_span must be >= 1 (got ctx_len="
            f"{ctx_len}, shard_span={shard_span})")
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


def select_token_budget(df: DataFrame, budget: int,
                        order_col: str = "qb", id_col: str = "doc_id",
                        tok_col: str = "n_tokens",
                        shard_span: int = 64) -> DataFrame:
    """Curriculum selection under a token budget: walk the corpus in
    (``order_col`` DESC, ``id_col`` ASC) order — highest-quality
    first — and keep every document that starts before ``budget``
    cumulative tokens. The greedy prefix is what data-mixture recipes
    mean by "take the best N tokens"; ``order_col`` must be an exact
    integer key (e.g. a 1e6-scaled rounded quality score) so the
    ordering can never disagree across engines or partitionings.

    Adds ``cum_before`` (tokens ahead of this doc in curriculum
    order) and filters to ``cum_before < budget``.

    Scale shape: THREE-level scan parallelization, a strictly
    stronger form of :func:`pack_sequences`'s two-phase stitch whose
    sequential stage is bounded by the KEY DOMAIN, not the corpus:

    1. within-(bucket, id-range) cumsum — windows keyed by
       (``order_col``, shard), parallel across the whole corpus;
    2. shard offsets within each bucket — a window keyed by
       ``order_col`` over the |corpus|/``shard_span``-row shard
       totals, still parallel across buckets;
    3. bucket offsets — the ONLY partition-less window, over the
       per-bucket grand totals: ≤|``order_col`` domain| rows (a
       1e6-scaled score has ≤1.25M possible values) REGARDLESS of
       corpus size — the same boundedness argument as a k-row
       centroid table.

    ``cum = bucket_off + shard_off + within_cum`` — exact int64,
    value-identical to the single-window form (pytest-asserted).
    No corpus-proportional data ever crosses a single partition."""
    if shard_span < 1:
        raise ValueError(
            f"shard_span must be >= 1, got {shard_span}")
    # The shard key MUST be order-contiguous in id_col (shard order ≡
    # within-bucket order), so it is integer division of the id — a
    # hash would break contiguity. Validate instead of letting a
    # non-numeric id silently cast to NULL (the stitch join would
    # then drop every row under non-ANSI, or throw under ANSI).
    id_type = dict(df.dtypes)[id_col]
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"select_token_budget needs an integral {id_col!r} "
            f"(got {id_type}); for non-numeric ids, "
            "repartitionByRange on (order_col, id) first and use "
            "spark_partition_id() as the shard key")
    sh = F.expr(f"CAST({id_col} AS BIGINT) div {int(shard_span)}")
    base = df.withColumn("_sh", sh)

    sh_totals = (base.groupBy(order_col, "_sh")
                 .agg(F.sum(tok_col).cast("long").alias("_t")))
    w_sh = (W.partitionBy(order_col).orderBy("_sh")
            .rowsBetween(W.unboundedPreceding, -1))
    sh_off = (sh_totals
              .withColumn("_shoff",
                          F.coalesce(F.sum("_t").over(w_sh),
                                     F.lit(0)).cast("long")))

    qb_totals = sh_totals.groupBy(order_col).agg(
        F.sum("_t").cast("long").alias("_qt"))
    w_qb = (W.orderBy(F.desc(order_col))
            .rowsBetween(W.unboundedPreceding, -1))
    qb_off = (qb_totals
              .withColumn("_qboff",
                          F.coalesce(F.sum("_qt").over(w_qb),
                                     F.lit(0)).cast("long"))
              .drop("_qt"))

    offsets = (sh_off.join(F.broadcast(qb_off), order_col)
               .withColumn("_off", (F.col("_qboff") + F.col("_shoff"))
                           .cast("long"))
               .select(order_col, "_sh", "_off"))

    w_in = (W.partitionBy(order_col, "_sh").orderBy(id_col)
            .rowsBetween(W.unboundedPreceding, -1))
    out = (base
           .withColumn("_cin", F.coalesce(F.sum(tok_col).over(w_in),
                                          F.lit(0)).cast("long"))
           .join(F.broadcast(offsets), [order_col, "_sh"])
           .withColumn("cum_before", (F.col("_off") + F.col("_cin"))
                       .cast("long"))
           .drop("_sh", "_cin", "_off"))
    return (out.select(*df.columns, "cum_before")
            .filter(F.col("cum_before") < int(budget)))


def select_token_budget_single_window(df: DataFrame, budget: int,
                                      order_col: str = "qb",
                                      id_col: str = "doc_id",
                                      tok_col: str = "n_tokens"
                                      ) -> DataFrame:
    """Single global-window formulation — equivalence baseline only
    (the single-reducer plan), never the deployed path."""
    w = (W.orderBy(F.desc(order_col), F.asc(id_col))
         .rowsBetween(W.unboundedPreceding, -1))
    return (df.withColumn("cum_before",
                          F.coalesce(F.sum(tok_col).over(w), F.lit(0))
                          .cast("long"))
            .filter(F.col("cum_before") < int(budget)))


def chunk_documents(docs: DataFrame, window: int = 8,
                    stride: int = 4, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, chunk_idx, start_tok, n_tok, chunk_md5): the
    context-window splitter — each document's token stream cut into
    ``window``-token chunks every ``stride`` tokens (stride < window
    gives the overlapping chunks a RAG index or long-doc pretraining
    prep wants, so no passage straddles a boundary unseen; stride >
    window subsamples). The final chunk is short (``n_tok`` = tokens
    remaining); ``chunk_md5`` is the content fingerprint downstream
    chunk-level dedup or ANN indexing keys on, so identical passages
    chunk to identical ids regardless of source document.

    The inverse-direction complement of :func:`pack_sequences`:
    packing joins many short docs into one fixed budget, chunking
    splits long docs down to one. Scale shape: a single
    per-partition explode (ceil(len/stride) rows per doc), no
    shuffle at all — chunk rows inherit the corpus partitioning, and
    Catalyst prunes every column but the text before the generate."""
    from picoprobedataflow_spark.functions.text import words

    toks = docs.select(F.col(id_col), words(text_col).alias("_w"))
    n = F.size("_w")
    n_chunks = F.ceil(n / F.lit(int(stride))).cast("int")
    starts = F.sequence(F.lit(0),
                        F.greatest(n_chunks - 1, F.lit(0)))
    return (toks
            .filter(n > 0)
            .select(F.col(id_col),
                    F.posexplode(F.transform(
                        starts,
                        lambda i: F.concat_ws(
                            " ", F.slice("_w", i * stride + 1,
                                         window))))
                    .alias("chunk_idx", "_chunk"),
                    n.alias("_n"))
            .select(F.col(id_col),
                    F.col("chunk_idx").cast("long"),
                    (F.col("chunk_idx") * stride).cast("long")
                     .alias("start_tok"),
                    F.least(F.lit(window),
                            F.col("_n") - F.col("chunk_idx") * stride)
                     .cast("long").alias("n_tok"),
                    F.md5(F.col("_chunk").cast("binary"))
                     .alias("chunk_md5")))
