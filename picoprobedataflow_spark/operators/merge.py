"""MERGE / SCD2 emulation — upserts without a transactional table
format (no Delta/Iceberg jars in this environment; the operators are
the anti-join + union rewrite those formats execute underneath).

- :func:`merge_upsert` — MERGE INTO semantics on plain DataFrames:
  matched rows replaced, unmatched source rows inserted.
- :func:`scd2_apply` — slowly-changing-dimension type 2: close the
  current version of changed keys (set ``valid_to``) and append the
  new version as current.

At scale these write to a partitioned table and rewrite only the
partitions containing touched keys; the pure-DataFrame form here is
the per-partition kernel of that job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Open-ended validity sentinel (max timestamp-friendly epoch seconds).
SCD2_OPEN_END = 253402300799.0  # 9999-12-31T23:59:59Z


def merge_upsert(target: DataFrame, source: DataFrame,
                 key_cols: list[str]) -> DataFrame:
    """MERGE INTO target USING source: WHEN MATCHED THEN UPDATE (take
    the source row), WHEN NOT MATCHED THEN INSERT. Source must be
    unique per key. One anti join + one union — both shuffle on the
    key, no row explosion."""
    untouched = target.join(source.select(*key_cols), key_cols, "left_anti")
    return untouched.unionByName(source)


def scd2_apply(dim: DataFrame, changes: DataFrame, key_cols: list[str],
               ts_col: str = "effective_ts",
               valid_from: str = "valid_from", valid_to: str = "valid_to",
               current_flag: str = "is_current") -> DataFrame:
    """Type-2 history: ``dim`` carries (attrs, valid_from, valid_to,
    is_current); ``changes`` carries (key, attrs, effective_ts). The
    current row of a changed key closes at the change's effective_ts;
    the change becomes the new open row. History rows pass through."""
    chg_keys = changes.select(*key_cols).distinct()
    closing = (dim.filter(F.col(current_flag))
                  .join(chg_keys, key_cols, "left_semi")
                  .join(changes.select(*key_cols,
                                       F.col(ts_col).alias("_chg_ts")),
                        key_cols)
                  .withColumn(valid_to, F.col("_chg_ts"))
                  .withColumn(current_flag, F.lit(False))
                  .drop("_chg_ts"))
    unchanged = (dim.filter(F.col(current_flag))
                    .join(chg_keys, key_cols, "left_anti"))
    history = dim.filter(~F.col(current_flag))
    new_rows = (changes
                .withColumn(valid_from, F.col(ts_col))
                .withColumn(valid_to, F.lit(SCD2_OPEN_END))
                .withColumn(current_flag, F.lit(True))
                .drop(ts_col))
    return (history.unionByName(closing)
                   .unionByName(unchanged)
                   .unionByName(new_rows))


def corpus_diff(old: DataFrame, new: DataFrame,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, status) change detection between two corpus snapshots —
    the audit a daily-refresh pipeline runs before re-curating:
    ``added`` (id only in new), ``removed`` (id only in old),
    ``changed`` (both, content differs), ``unchanged`` (both,
    content identical). Content equality is md5-of-bytes (the exact
    dedup fingerprint), NULL-safe: NULL ≡ NULL is unchanged, NULL vs
    text is changed.

    Scale shape: each side reduces to (id, fingerprint) — column
    pruning reaches the scan, the text never shuffles — then ONE
    full-outer equi-join on the id. A count-by-status summary is
    ``.groupBy("status").count()`` away; incremental re-curation
    feeds ``status IN ('added', 'changed')`` back through the
    pipeline."""
    from picoprobedataflow_spark.functions.text import \
        fingerprint_md5

    def fp(df: DataFrame, alias: str) -> DataFrame:
        # THE canonical exact-dedup fingerprint (one definition —
        # if normalization is ever added there, diff verdicts follow)
        return df.select(F.col(id_col),
                         fingerprint_md5(text_col).alias(alias))

    o = fp(old, "_fo").withColumn("_in_old", F.lit(True))
    n = fp(new, "_fn").withColumn("_in_new", F.lit(True))
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.col("_fo").eqNullSafe(F.col("_fn")),
              F.lit("unchanged"))
        .otherwise(F.lit("changed")))
    return j.select(F.col(id_col), status.alias("status"))
