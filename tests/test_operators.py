"""Behavioral tests for the dedup/similarity operators on crafted
fixtures with known ground truth (the testdata corpus has no exact
duplicates at small SF), plus equivalence checks between alternative
formulations (SURVEY J4: self-join vs pivot)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from picoprobedataflow_spark.operators import dedup as DD
from picoprobedataflow_spark.operators import similarity as SIM


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_exact_dup_mapping(spark):
    docs = _docs(spark, ["a b c", "d e f", "a b c", "a b c", "g h"])
    mapping = {r.doc_id: r.canonical_id
               for r in DD.exact_dup_mapping(docs).collect()}
    assert mapping == {2: 0, 3: 0}


def test_jaccard_identical_and_disjoint(spark):
    docs = _docs(spark, [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",   # identical
        "completely different words here entirely now",  # disjoint
    ])
    rows = DD.jaccard_pairs(docs, k=3, threshold=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b, r.jaccard) == (0, 1, 1.0)


def test_jaccard_partial_overlap_value(spark):
    # doc0: tokens a b c d -> shingles {abc, bcd}; doc1: a b c e -> {abc, bce}
    docs = _docs(spark, ["a b c d", "a b c e"])
    r = DD.jaccard_pairs(docs, k=3, threshold=0.1).collect()[0]
    assert r.n_common == 1 and r.n_a == 2 and r.n_b == 2
    assert abs(r.jaccard - 1 / 3) < 1e-12


def test_minhash_estimates_track_jaccard(spark):
    t0 = " ".join(f"w{i}" for i in range(60))
    t1 = " ".join(f"w{i}" for i in range(55)) + " x1 x2 x3 x4 x5"
    t2 = " ".join(f"z{i}" for i in range(60))
    docs = _docs(spark, [t0, t1, t2])
    sigs = DD.minhash_signatures(docs, num_hashes=16, k=3)
    assert sigs.count() == 3 * 16
    pairs = spark.createDataFrame([(0, 1), (0, 2)], "doc_a long, doc_b long")
    est = {(r.doc_a, r.doc_b): r.est_jaccard
           for r in DD.minhash_jaccard_estimate(sigs, pairs).collect()}
    assert est[(0, 1)] > 0.5          # heavy overlap
    assert est[(0, 2)] <= 0.2         # disjoint shingle sets


def test_simhash_identical_zero_hamming(spark):
    docs = _docs(spark, ["alpha beta gamma delta epsilon zeta",
                         "alpha beta gamma delta epsilon zeta",
                         "one two three four five six seven eight"])
    sigs = DD.simhash_signatures(docs, bits=32)
    vals = {r.doc_id: r.simhash for r in sigs.collect()}
    assert vals[0] == vals[1]
    pairs = DD.simhash_near_pairs(sigs, max_hamming=0).collect()
    assert [(p.doc_a, p.doc_b, p.hamming) for p in pairs] == [(0, 1, 0)]


def test_fast_hash_scale_path_same_semantics(spark):
    """The xxhash64 scale path must change only signature VALUES, not
    dedup semantics: identical docs still collide, minhash estimates
    still track overlap, and the LSH flow still surfaces the dup."""
    from picoprobedataflow_spark.functions.scalar import fast_hash64

    t0 = " ".join(f"w{i}" for i in range(60))
    docs = _docs(spark, [t0, t0, " ".join(f"z{i}" for i in range(60))])

    sigs = DD.simhash_signatures(docs, bits=32, hash_fn=fast_hash64)
    vals = {r.doc_id: r.simhash for r in sigs.collect()}
    assert vals[0] == vals[1] != vals[2]
    assert all(0 <= v < 2 ** 32 for v in vals.values())

    mh = DD.minhash_signatures(docs, num_hashes=16, k=3,
                               hash_fn=fast_hash64)
    assert mh.filter(
        (F.col("minhash") < 0)
        | (F.col("minhash") >= DD.MINHASH_PRIME)).count() == 0

    est = {(r.doc_a, r.doc_b): r.est_jaccard
           for r in DD.minhash_lsh_dedup(
               docs, num_hashes=16, k=3, band_size=4,
               hash_fn=fast_hash64).collect()}
    assert est[(0, 1)] == 1.0
    assert (0, 2) not in est and (1, 2) not in est


def test_topk_cosine_hand_vectors(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [-1.0, 0.0])],
        "vec_id long, embedding array<float>")
    top = SIM.topk_cosine(emb, [1.0, 0.0], k=2).collect()
    assert [r.vec_id for r in top] == [1, 2]
    assert top[0].cosine == 1.0
    expected = 0.9 / math.hypot(0.9, 0.1)
    assert abs(top[1].cosine - expected) < 1e-6


def test_blocked_near_pairs_respects_blocks(spark):
    emb = spark.createDataFrame(
        [(1, 0, [1.0, 0.0]), (2, 0, [1.0, 0.0]),
         (3, 1, [1.0, 0.0])],  # same direction but different block
        "vec_id long, label int, embedding array<float>")
    pairs = SIM.blocked_near_pairs(emb, threshold=0.99).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]


def test_srp_ann_search_finds_neighbor(spark):
    import random

    rng = random.Random(7)
    rows = []
    for i in range(1, 40):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(64)]))
    rows.append((99, [1.0] * 64))  # near-duplicate of the query below
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    res = SIM.srp_ann_search(emb, [0.99] * 64, k=3, n_planes=4, dim=64)
    got = res.collect()
    assert got, "query bucket unexpectedly empty"
    assert got[0].vec_id == 99 and got[0].cosine > 0.999


def test_srp_bucket_matrix_matches_fold(spark):
    """The pandas-UDF plane-matrix path (1024-dim scale variant) must
    assign the same buckets as the literal-array fold on the real
    embeddings table — same planes, same >0 contract; only the dot
    summation order differs, which real-valued data never notices."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    fold = emb.withColumn("bucket", SIM.srp_bucket(F.col("embedding"),
                                                   n_planes=8, dim=64))
    mat = SIM.srp_bucket_matrix(emb, n_planes=8, dim=64)
    joined = (fold.select("vec_id", F.col("bucket").alias("b_fold"))
                  .join(mat.select("vec_id", F.col("bucket").alias("b_mat")),
                        "vec_id"))
    n_total = joined.count()
    n_agree = joined.filter(F.col("b_fold") == F.col("b_mat")).count()
    assert n_total > 0
    assert n_agree == n_total


def test_ivf_ann_finds_in_cluster_neighbor(spark):
    """IVF with 2 cells: the query sits in cell 0; n_probe=1 must find
    the in-cell neighbor and never scan cell 1."""
    emb = spark.createDataFrame(
        [(1, 0, [1.0, 0.1]), (2, 0, [0.9, 0.0]),
         (3, 1, [-1.0, 0.0]), (4, 1, [-0.9, -0.1])],
        "vec_id long, label int, embedding array<float>")
    res = SIM.ivf_ann_search(emb, [1.0, 0.0], k=2, n_probe=1).collect()
    assert [r.vec_id for r in res] == [2, 1]
    assert all(r.cell == 0 for r in res)
    # centroids themselves: elementwise means per cell
    cents = {r.cell: r.centroid
             for r in SIM.ivf_centroids(emb).collect()}
    assert cents[0] == pytest.approx([0.95, 0.05])
    assert cents[1] == pytest.approx([-0.95, -0.05])


def test_funnel_pivot_equals_selfjoin(spark):
    """SURVEY J4: the event-pair delta computed via conditional-agg
    pivot must equal the self-join formulation."""
    from picoprobedataflow_spark.plans.common import events_us

    ev = events_us(spark, "/root/testdata/sf0.001")
    pivot = (ev.groupBy("user_id")
               .agg((F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
                     - F.min(F.when(F.col("event_type") == "signup", F.col("ts"))))
                    .alias("delta"))
               .filter(F.col("delta") > 0))
    s = (ev.filter(F.col("event_type") == "signup")
           .groupBy("user_id").agg(F.min("ts").alias("ts_s")))
    p = (ev.filter(F.col("event_type") == "purchase")
           .groupBy("user_id").agg(F.min("ts").alias("ts_p")))
    selfjoin = (s.join(p, "user_id")
                 .select("user_id", (F.col("ts_p") - F.col("ts_s")).alias("delta"))
                 .filter(F.col("delta") > 0))
    a = sorted((r.user_id, r.delta) for r in pivot.collect())
    b = sorted((r.user_id, r.delta) for r in selfjoin.collect())
    assert a == b and len(a) > 0
