"""MERGE/SCD2 emulation + the file-drop simulator feeding the
streaming ingest end-to-end (the reference's soak-test loop)."""

from __future__ import annotations

from pyspark.sql import functions as F

from picoprobedataflow_spark.operators.merge import (
    SCD2_OPEN_END,
    merge_upsert,
    scd2_apply,
)
from picoprobedataflow_spark.streaming.simulator import replay
from picoprobedataflow_spark.streaming.watch import (
    file_watch_stream,
    run_ingest_stream,
)


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k long, name string, v double")
    source = spark.createDataFrame(
        [(2, "b2", 25.0), (3, "c", 30.0)], "k long, name string, v double")
    out = {r.k: (r.name, r.v)
           for r in merge_upsert(target, source, ["k"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 25.0), 3: ("c", 30.0)}


def test_scd2_versions(spark):
    dim = spark.createDataFrame(
        [(1, "x", 0.0, SCD2_OPEN_END, True),
         (2, "y", 0.0, SCD2_OPEN_END, True),
         (2, "old-y", -10.0, 0.0, False)],
        "k long, attr string, valid_from double, valid_to double, "
        "is_current boolean")
    changes = spark.createDataFrame(
        [(2, "y2", 100.0), (3, "z", 50.0)],
        "k long, attr string, effective_ts double")
    out = scd2_apply(dim, changes, ["k"]).collect()
    rows = {(r.k, r.attr): r for r in out}
    assert len(out) == 5
    # unchanged current row passes through
    assert rows[(1, "x")].is_current
    # changed key: old current closed at effective_ts, new row open
    assert not rows[(2, "y")].is_current
    assert rows[(2, "y")].valid_to == 100.0
    assert rows[(2, "y2")].is_current
    assert rows[(2, "y2")].valid_from == 100.0
    # brand-new key inserted as current
    assert rows[(3, "z")].is_current
    # history untouched
    assert rows[(2, "old-y")].valid_to == 0.0
    # invariant: exactly one current row per live key
    cur = [r.k for r in out if r.is_current]
    assert sorted(cur) == [1, 2, 3]


def test_simulator_feeds_ingest_stream(spark, tmp_path):
    """simulator replay → watch dir → streaming ingest: N unique drops
    of the same source file all land (unique names), exactly once."""
    src = tmp_path / "library"
    src.mkdir()
    (src / "sample.emd").write_bytes(b"instrument-bytes")
    watch = tmp_path / "incoming"
    dropped = replay(str(src / "*.emd"), str(watch), count=3)
    assert [d.rsplit("/", 1)[1] for d in dropped] == [
        "simulator-0-sample.emd", "simulator-1-sample.emd",
        "simulator-2-sample.emd"]
    out = str(tmp_path / "manifest")
    q = run_ingest_stream(
        file_watch_stream(spark, str(watch), glob="*.emd"),
        str(tmp_path / "ckpt"), output_path=out)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 3
    # same content → same checksum, distinct paths (ST4 semantics are
    # path-keyed, like the reference's seen-set)
    assert got.select("sha256").distinct().count() == 1
    assert got.select(F.col("path")).distinct().count() == 3


def test_corpus_diff_statuses(spark):
    """corpus_diff: added/removed/changed/unchanged classified
    exactly, NULL-safe content compare (NULL vs NULL unchanged,
    NULL vs text changed), empty sides total."""
    from picoprobedataflow_spark.operators.merge import corpus_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "before"), (3, "gone"), (4, None),
         (5, None)],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "same"), (2, "after"), (6, "fresh"), (4, None),
         (5, "filled")],
        "doc_id long, text string")
    got = {r.doc_id: r.status
           for r in corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed",
                   4: "unchanged", 5: "changed", 6: "added"}
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert {r.status for r in corpus_diff(empty, new).collect()} \
        == {"added"}
    assert corpus_diff(empty, empty).collect() == []
