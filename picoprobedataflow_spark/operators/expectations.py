"""Batch data-quality expectations — the declarative validation gate
a pipeline runs before promoting a corpus snapshot (the batch twin of
``streaming/quality.py:dq_gate_stream``): every rule is a boolean
column expression, violations are counted in ONE aggregate pass, and
the result is a per-rule scoreboard a CI gate can assert on.

Null semantics are explicit and strict: a row where the rule
expression evaluates to NULL counts as a VIOLATION (the
Great-Expectations convention — an unevaluable expectation is a
failed expectation), via ``coalesce(rule, false)``.

Scale shape: a single hash-free global aggregate (map-side partial
sums, one 1-row exchange), then a ``stack`` unpivot of that one row —
no explode, no join, no per-rule scan. Uniqueness rules add a
count-distinct to the same aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_expectations(df: DataFrame,
                       rules: dict[str, Column],
                       unique_cols: tuple[str, ...] = ()) -> DataFrame:
    """(rule, n_checked, n_violations, viol_rate, passed): evaluate
    every rule over ``df`` in one aggregate pass. ``rules`` maps a
    rule name to a boolean Column that is True when the row PASSES;
    NULL evaluations count as violations. ``unique_cols`` adds a
    ``unique_<col>`` rule whose violation count is the number of
    surplus rows beyond the distinct values (0 = unique).

    Rule names must be plain identifiers (``[A-Za-z_][A-Za-z0-9_]*``,
    not ``_n``) and unique across ``rules`` AND the generated
    ``unique_<col>`` aliases: they pass through a ``stack()`` SQL
    string, so a dash or quote would fail the parse — or worse,
    inject — ``_n`` would collide with the internal row-count alias,
    and a rules key named ``unique_<col>`` would shadow that column's
    uniqueness alias in the aggregate row. Rejected eagerly with
    ValueError. Inside the stack expression each name is
    backtick-quoted, so names that are SQL RESERVED words
    (``select``, ``end``, ``cast``) are valid rule names. An EMPTY
    input frame reports every rule as 0 violations / rate 0.0 /
    passed=true (sums over zero rows coalesce to 0 — a CI gate
    reading ``passed`` must never see NULL)."""
    import re

    seen: set[str] = set()
    for nm in list(rules) + [f"unique_{c}" for c in unique_cols]:
        if nm == "_n" or not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*",
                                          nm):
            raise ValueError(
                f"rule name {nm!r} must be an identifier and not "
                "'_n' (it is interpolated into a stack() expression)")
        if nm in seen:
            raise ValueError(
                f"duplicate rule name {nm!r} (rules keys and the "
                "generated unique_<col> aliases share one namespace)")
        seen.add(nm)
    aggs = [F.count("*").alias("_n")]
    for name, cond in rules.items():
        aggs.append(F.coalesce(
            F.sum(F.when(F.coalesce(cond, F.lit(False)),
                         0).otherwise(1)), F.lit(0))
                    .cast("long").alias(name))
    for c in unique_cols:
        aggs.append((F.count(c) - F.count_distinct(F.col(c)))
                    .cast("long").alias(f"unique_{c}"))
    names = list(rules) + [f"unique_{c}" for c in unique_cols]
    row = df.agg(*aggs)
    stack = "stack({n}, {args}) AS (rule, n_violations)".format(
        n=len(names),
        args=", ".join(f"'{nm}', `{nm}`" for nm in names))
    long = row.select(F.col("_n"), F.expr(stack))
    return long.select(
        "rule",
        F.col("_n").cast("long").alias("n_checked"),
        F.col("n_violations").cast("long").alias("n_violations"),
        F.round(F.col("n_violations")
                / F.greatest(F.col("_n"), F.lit(1)), 6)
         .alias("viol_rate"),
        (F.col("n_violations") == 0).alias("passed"))
