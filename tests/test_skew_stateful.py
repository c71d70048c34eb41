"""Skew rewrites (salted agg/join must equal their plain twins) and
the applyInPandasWithState stateful streaming operator (state must
persist across micro-batches via the checkpoint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from picoprobedataflow_spark.operators.skew import salted_agg, salted_join
from picoprobedataflow_spark.plans.common import events_us
from picoprobedataflow_spark.streaming.stateful import running_user_totals


def test_salted_agg_equals_plain(spark):
    ev = events_us(spark, "/root/testdata/sf0.001")
    plain = {tuple(r) for r in
             ev.groupBy("event_type")
               .agg(F.count("*").alias("n"),
                    F.sum("user_id").alias("s")).collect()}
    salted = {tuple(r) for r in salted_agg(
        ev.select("event_type", "user_id"),
        key_cols=["event_type"],
        partials=[(F.count("*"), "n", F.sum("n")),
                  (F.sum("user_id"), "s", F.sum("s"))],
        n_salts=8).collect()}
    assert salted == plain


def test_salted_join_equals_plain(spark):
    big = events_us(spark, "/root/testdata/sf0.001").select(
        "event_id", "event_type", "user_id")
    small = spark.createDataFrame(
        [("click", 1.0), ("error", 5.0), ("view", 0.5)],
        "event_type string, weight double")
    plain = {tuple(r) for r in
             big.join(small, "event_type").select(
                 "event_id", "weight").collect()}
    salted = {tuple(r) for r in
              salted_join(big, small, "event_type", n_salts=8)
              .select("event_id", "weight").collect()}
    assert salted == plain and len(plain) > 0


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """One live query, two micro-batches (files dropped between
    processAllAvailable calls): the second batch's output must carry
    the first batch's accumulated state. (Memory sink cannot recover a
    checkpoint across restarts, so the query stays up — restart-proof
    state is covered by the exactly-once ingest test's file-source
    checkpointing.)"""
    src = str(tmp_path / "src")
    schema = "user_id long, ts long, value double"
    spark.createDataFrame([(1, 100, 2.0), (1, 200, 3.0), (2, 150, 1.0)],
                          schema).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (running_user_totals(stream)
         .writeStream.outputMode("update")
         .format("memory").queryName("running_totals")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(processingTime="500 milliseconds").start())
    try:
        q.processAllAvailable()
        first = {r.user_id: (r.n, r.total, r.last_us)
                 for r in spark.sql("SELECT * FROM running_totals").collect()}
        assert first[1] == (2, 5.0, 200)
        assert first[2] == (1, 1.0, 150)

        spark.createDataFrame([(1, 300, 10.0)], schema) \
             .write.mode("append").parquet(src)
        q.processAllAvailable()
        latest = {}
        for r in spark.sql("SELECT * FROM running_totals").collect():
            latest[r.user_id] = (r.n, r.total, r.last_us)
        assert latest[1] == (3, 15.0, 300)  # state carried across batches
    finally:
        q.stop()


def test_stateful_event_time_expiry_finalizes_idle_keys(spark, tmp_path):
    """EventTimeTimeout state expiry: a key idle past the 60s gap is
    finalized with its accumulated totals and removed from state
    once the watermark passes its deadline; active keys keep
    accumulating. Deterministic in EVENT time — driven by file
    drops, not wall clock."""
    from datetime import datetime as dt

    from picoprobedataflow_spark.streaming.stateful import \
        expiring_user_totals

    src = str(tmp_path / "src")
    schema = "user_id long, ts timestamp, value double"

    def drop(rows):
        spark.createDataFrame(rows, schema).write.mode("append") \
             .parquet(src)

    t0 = dt(2026, 1, 1, 10, 0, 0)
    drop([(1, t0, 2.0), (2, t0, 7.0)])
    stream = spark.readStream.schema(schema).parquet(src)
    q = (expiring_user_totals(stream)
         .writeStream.outputMode("update")
         .format("memory").queryName("expiring_totals")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(processingTime="500 milliseconds").start())
    try:
        q.processAllAvailable()
        # advance event time: user 1 stays active at 10:05
        drop([(1, dt(2026, 1, 1, 10, 5, 0), 3.0)])
        q.processAllAvailable()
        # one more batch so the advanced watermark (10:04:50) is
        # applied to timeout evaluation: user 2's deadline (10:01:00)
        # has passed -> finalized
        drop([(1, dt(2026, 1, 1, 10, 6, 0), 1.0)])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM expiring_totals").collect()
        fin2 = [r for r in rows if r.user_id == 2 and r.finalized]
        assert len(fin2) == 1
        assert fin2[0].n == 1 and abs(fin2[0].total - 7.0) < 1e-9
        # user 1 never finalized; its running rows accumulate
        assert not any(r.finalized for r in rows if r.user_id == 1)
        u1 = max((r for r in rows if r.user_id == 1),
                 key=lambda r: r.n)
        assert u1.n == 3 and abs(u1.total - 6.0) < 1e-9
    finally:
        q.stop()
