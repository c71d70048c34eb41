"""Measure the time-vs-scale-factor slope of the heavy pipeline
operators — evidence for SCALE.md's "scales" claims instead of
assertion.

Runs the uncapped dedup/similarity bench queries at every
``/root/testdata/sf*`` directory given (default all three shipped
SFs), best-of-N reps each (clearCache between reps, same discipline
as bench.py rev 3), and prints one JSON line::

    {"keys": {name: {sf: best_sec, ...}}, "exponents": {name: e},
     "n_reps": N}

The exponent is fit on the largest SF decade (sf0.01 → sf0.1 with the
default data): e = log(t_hi/t_lo) / log(sf_hi/sf_lo). e ≈ 1 is
linear; the smallest SF's times are reported too because they expose
the per-job fixed overhead (~0.2 s scheduler/codegen floor) that
flattens small-SF ratios — read the decade exponent, not the tiny-SF
one.

Usage: python scripts/measure_scaling.py [sf_dir ...]
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from picoprobedataflow_spark.session import get_spark  # noqa: E402

#: The operators whose 100 TB posture SCALE.md claims: the dedup trio,
#: the shingle-join jaccard, and both ANN search paths.
KEYS = (
    "dedup_exact_full",
    "dedup_minhash_lsh_full",
    "dedup_simhash_full",
    "dedup_jaccard_full",
    "ann_cosine_topk_full",
    "ann_srp_topk_full",
)


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    n_reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    spark = get_spark(app_name="picoprobedataflow-scaling")
    _, uncapped = bench._uncapped_pipeline_queries()
    fns = {k: uncapped[k] for k in KEYS}
    # Round-5 families (plain pipeline functions after the window
    # fold; uncapped).
    from picoprobedataflow_spark.plans import pipeline as PL
    for key, fn in (("bm25_full", PL.bm25_retrieval),
                    ("semdedup_full", PL.semdedup_embedding_prune),
                    ("span_dedup_full", PL.span_dedup_stats),
                    ("pq_adc_full", PL.ann_pq_adc_topk),
                    ("ivfpq_full", PL.ann_ivfpq_topk),
                    ("winnow_full", PL.winnow_doc_fingerprints),
                    ("ppl_bucket_full", PL.ppl_bucket_assignments),
                    # Round 12: boilerplate removal (distinct-count
                    # aggregate), the chunker (zero-shuffle explode)
                    # and the NFC Arrow kernel.
                    ("boiler_clean_full", PL.boiler_clean_texts),
                    ("chunking_full", PL.chunk_manifest),
                    ("nfc_full", PL.nfc_normalized_texts),
                    ("source_overlap_full", PL.source_overlap_stats),
                    ("zipf_full", PL.zipf_source_stats),
                    ("dq_full", PL.dq_expectations),
                    ("key_skew_full", PL.key_skew_profile),
                    # Round 13: robots broadcast gate, PSI drift
                    # (two map-side bucket counts), 3-iteration
                    # PageRank, 5-iteration logreg training.
                    ("robots_full", PL.robots_flags),
                    ("psi_full", PL.psi_drift_stats),
                    ("pagerank_full", PL.pagerank_scores),
                    ("logreg_full", PL.logreg_quality_scores),
                    # Round 13 session 2: one-pass NB training +
                    # broadcast-join scoring; PMI pair-count
                    # shuffle; KS distinct-value ordered pass (the
                    # latter two defined ONCE in pipeline.py, shared
                    # with bench.py).
                    ("nb_full", PL.nb_quality_scores),
                    ("pmi_full", PL.pmi_collocations),
                    ("ks_full", PL.ks_length_drift),
                    # Round 14: the KMR substring-dedup pair (one
                    # doc-keyed sort + O(log L) windows + one
                    # sig-count shuffle) and the categorical drift
                    # scoreboard (two map-side category counts).
                    ("substr_dedup_full", PL.substr_dedup_stats),
                    ("substr_clean_full", PL.substr_clean_texts),
                    ("chi2_full", PL.chi2_drift_stats),
                    # Round 17 (VERDICT r16 #4): the round-16
                    # families' curves — CMS (direct d·w-capped cell
                    # build + distributed top-k), HITS (2 join+agg
                    # rounds/iter) and spam mass (one shared prebuilt
                    # graph + two rank loops).
                    ("cms_full", PL.cms_heavy_hitters),
                    ("hits_full", PL.hits_scores),
                    ("spam_full", PL.spam_mass_scores)):
        fns[key] = fn

    # containment: the UNGATED production path (hashed shingles +
    # stop-shingle cap), matching bench.py's containment_full. The
    # oracle FAMILY gates docs at _CONT_GATE for DuckDB memory, so
    # its input is constant across SFs — measuring it here would
    # produce a meaningless exponent (round-12 review find).
    from picoprobedataflow_spark.functions import scalar as SC
    from picoprobedataflow_spark.operators import dedup as DD
    from picoprobedataflow_spark.plans.common import tbl

    def _containment_prod(spark, sf_dir):
        return DD.containment_pairs(
            tbl(spark, sf_dir, "documents"), k=3, threshold=0.9,
            max_df=50, shingle_hash=SC.fast_hash64)

    fns["containment_full"] = _containment_prod

    # Streaming steady-state keys (round 17, VERDICT r16 #4): each
    # drains 3 epochs through bench.stream_epoch_times and the curve
    # point is the LAST epoch (the steady state the bench key
    # reports; the cold bootstrap rides in the printed spread).
    stream_keys: tuple[str, ...] = ("cms_stream_epoch_full",
                                    "pagerank_stream_epoch_full")

    # Optional key filter (round 17): a re-measure of one family's
    # curve should not pay the whole board.
    only = os.environ.get("SPARK_GRAFT_SCALING_KEYS")
    if only:
        keep = {k.strip() for k in only.split(",") if k.strip()}
        fns = {k: f for k, f in fns.items() if k in keep}
        stream_keys = tuple(k for k in stream_keys if k in keep)

    # warmup (codegen/JVM) at the smallest SF, untimed
    for fn in fns.values():
        try:
            bench.run_query(fn(spark, sf_dirs[0]))
        except Exception:  # noqa: BLE001
            pass
    spark.catalog.clearCache()

    results: dict[str, dict[str, float]] = {
        k: {} for k in (*fns, *stream_keys)}
    for sf_dir in sf_dirs:
        sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        for name, fn in fns.items():
            times = bench._time_reps(fn, spark, sf_dir, n_reps)
            results[name][sf] = min(times)
            print(f"  {name} @ sf{sf}: {times} -> {min(times)}",
                  file=sys.stderr)
        for name in stream_keys:
            try:
                times = bench.stream_epoch_times(spark, sf_dir, name)
            except Exception as exc:  # noqa: BLE001
                print(f"  {name} @ sf{sf}: FAILED ({exc!r})",
                      file=sys.stderr)
                continue
            results[name][sf] = times[-1]
            print(f"  {name} @ sf{sf}: {times} -> {times[-1]} "
                  f"(last epoch)", file=sys.stderr)

    exponents: dict[str, float] = {}
    for name, by_sf in results.items():
        sfs = sorted(by_sf, key=float)
        if len(sfs) >= 2:
            lo, hi = sfs[-2], sfs[-1]
            exponents[name] = round(
                math.log(by_sf[hi] / by_sf[lo])
                / math.log(float(hi) / float(lo)), 2)

    print(json.dumps({"keys": results, "exponents": exponents,
                      "n_reps": n_reps}))
    spark.stop()


if __name__ == "__main__":
    main()
