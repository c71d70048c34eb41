"""Capture .explain('formatted') for every bench key into plans/r17/.

Usage:
    python scripts/capture_plans.py before [key ...]
    python scripts/capture_plans.py after  [key ...]

With no keys, captures every headline + variant bench key. Output:
plans/r17/<key>_<tag>.txt. Also prints a one-line plan-shape summary
(#Exchange, #Sort, join strategies, Python eval nodes) per key so a
diff of the summaries shows the round's plan movement at a glance.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402
from picoprobedataflow_spark.plans import catalog  # noqa: E402
from picoprobedataflow_spark.session import get_spark  # noqa: E402

#: Counted on the DETAILS section (`(n) NodeName` lines), where each
#: physical node appears exactly once.
_SUMMARY_PATTERNS = {
    "Exchange": r"^\(\d+\) Exchange$",
    "BroadcastExchange": r"^\(\d+\) BroadcastExchange$",
    "Sort": r"^\(\d+\) Sort(?: \[codegen id : \d+\])?$",
    "SortMergeJoin": r"^\(\d+\) SortMergeJoin",
    "ShuffledHashJoin": r"^\(\d+\) ShuffledHashJoin",
    "BroadcastHashJoin": r"^\(\d+\) BroadcastHashJoin",
    "BroadcastNestedLoopJoin": r"^\(\d+\) BroadcastNestedLoopJoin",
    "CartesianProduct": r"^\(\d+\) CartesianProduct",
    "BatchEvalPython": r"^\(\d+\) BatchEvalPython",
    "ArrowEvalPython": r"^\(\d+\) ArrowEvalPython",
    "TakeOrderedAndProject": r"^\(\d+\) TakeOrderedAndProject",
    "Window": r"^\(\d+\) Window",
    "Generate": r"^\(\d+\) Generate",
    "HashAggregate": r"^\(\d+\) HashAggregate",
    "ObjectHashAggregate": r"^\(\d+\) ObjectHashAggregate",
    "SortAggregate": r"^\(\d+\) SortAggregate",
    "ScanParquet": r"^\(\d+\) Scan parquet",
    "InMemoryTableScan": r"^\(\d+\) InMemoryTableScan",
}


def summarize(plan: str) -> str:
    parts = []
    for name, pat in _SUMMARY_PATTERNS.items():
        n = len(re.findall(pat, plan, flags=re.M))
        if n:
            parts.append(f"{name}={n}")
    return " ".join(parts)


def all_bench_fns(spark):
    specs = catalog.specs()
    fns: dict = {}
    for name in B.CATALOG_BENCH:
        fns[name] = specs[name].fn
    from picoprobedataflow_spark.plans.relational import (
        lineitem_rollup,
        q14_promo_revenue_share,
    )
    from picoprobedataflow_spark.plans.scientific import windowed_event_rates
    from picoprobedataflow_spark.plans.subqueries import (
        q17_small_quantity_revenue,
    )
    from picoprobedataflow_spark.plans.telemetry import sessionize_lag_cumsum
    fns["lineitem_rollup"] = lineitem_rollup
    fns["windowed_event_rates"] = windowed_event_rates
    fns["q14_promo_revenue_share"] = q14_promo_revenue_share
    fns["q17_small_quantity_revenue"] = q17_small_quantity_revenue
    fns["sessionize_events"] = sessionize_lag_cumsum
    variants, uncapped = B._uncapped_pipeline_queries()
    fns.update(uncapped)
    # Reuse the full variant registry the bench's main() builds; it is
    # inline there, so rebuild the same dict here via the same imports.
    return fns, variants


def build_variant_registry():
    """Mirror bench.main()'s variant dict without running it."""
    from picoprobedataflow_spark.functions import scalar as SC
    from picoprobedataflow_spark.operators import dedup as DD
    from picoprobedataflow_spark.operators import graph as GR
    from picoprobedataflow_spark.plans import pipeline as PL
    from picoprobedataflow_spark.plans.common import tbl
    from picoprobedataflow_spark.plans.subqueries import tpch_gap_suite

    variants, _ = B._uncapped_pipeline_queries()
    for key, fn in (("bm25_full", PL.bm25_retrieval),
                    ("semdedup_full", PL.semdedup_embedding_prune),
                    ("span_dedup_full", PL.span_dedup_stats),
                    ("pq_adc_full", PL.ann_pq_adc_topk),
                    ("token_budget_full", PL.token_budget_curriculum),
                    ("tpch_gap_full", tpch_gap_suite),
                    ("ivfpq_full", PL.ann_ivfpq_topk),
                    ("epoch_shuffle_full", PL.epoch_shuffle_layout),
                    ("batch_ann_full", PL.batch_ann_topk),
                    ("unigram_lm_full", PL.unigram_lm_scores),
                    ("vocab_coverage_full", PL.vocab_coverage_stats),
                    ("ivfpq_residual_full", PL.ann_ivfpq_residual_topk),
                    ("cdc_dedup_full", PL.cdc_chunk_dedup_stats),
                    ("pack_manifest_full", PL.packing_window_manifest),
                    ("bpe_train_full", PL.bpe_train_merges),
                    ("bpe_encode_full", PL.bpe_encode_stats),
                    ("knn_graph_full", PL._embedding_knn_graph),
                    ("bigram_lm_full", PL.bigram_lm_scores),
                    ("winnow_full", PL.winnow_doc_fingerprints),
                    ("ppl_bucket_full", PL.ppl_bucket_assignments),
                    ("outliers_full", PL._embedding_centroid_outliers),
                    ("span_clean_full", PL.span_clean_texts),
                    ("dedup_simhash_served_full", PL.simhash_served_pairs),
                    ("dedup_jaccard_served_full", PL.jaccard_served_pairs),
                    ("decontam_spans_full", PL.decontam_span_texts),
                    ("domain_quota_full", PL.domain_quota_flags)):
        variants[key] = fn
    variants["dedup_simhash_rowlocal_full"] = (
        lambda spark, sf_dir: DD.simhash_dedup(
            tbl(spark, sf_dir, "documents", scan_repart=True),
            max_hamming=6,
            hash_fn=SC.fast_hash64, formulation="rowlocal"))
    variants["boiler_clean_full"] = PL.boiler_clean_texts
    variants["chunking_full"] = PL.chunk_manifest
    variants["nfc_full"] = PL.nfc_normalized_texts
    variants["source_overlap_full"] = PL.source_overlap_stats
    variants["rand_proj_full"] = PL.rand_proj_vectors
    variants["containment_full"] = (
        lambda spark, sf_dir: DD.containment_pairs(
            tbl(spark, sf_dir, "documents", scan_repart=True),
            k=3, threshold=0.9,
            max_df=50, shingle_hash=SC.fast_hash64))
    variants["zipf_full"] = PL.zipf_source_stats
    variants["dq_full"] = PL.dq_expectations
    variants["key_skew_full"] = PL.key_skew_profile
    variants["robots_full"] = PL.robots_flags
    variants["psi_full"] = PL.psi_drift_stats
    variants["chi2_full"] = PL.chi2_drift_stats
    variants["line_clean_full"] = PL.line_clean_texts
    variants["doremi_full"] = PL.doremi_mixture_weights
    variants["cms_full"] = PL.cms_heavy_hitters
    variants["pagerank_full"] = PL.pagerank_scores
    variants["hits_full"] = PL.hits_scores
    variants["spam_full"] = PL.spam_mass_scores
    variants["pagerank_warm_full"] = PL.pagerank_warm_scores
    variants["pagerank_cold10_full"] = (
        lambda spark, sf_dir: GR.pagerank(
            PL._pr_edges(spark, sf_dir), n_iter=10, damping=PL._PR_DAMP))
    variants["logreg_full"] = PL.logreg_quality_scores
    variants["nb_full"] = PL.nb_quality_scores
    variants["containment_served_full"] = PL.containment_served_pairs
    variants["semdedup_served_full"] = PL.semdedup_served_prune
    variants["pmi_full"] = PL.pmi_collocations
    variants["ks_full"] = PL.ks_length_drift
    variants["image_neardup_full"] = PL.image_neardup_bench
    variants["substr_dedup_full"] = PL.substr_dedup_stats
    variants["substr_clean_full"] = PL.substr_clean_texts
    variants["semdecon_full"] = PL.semantic_decontam_flags
    return variants


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"plan-capture-{tag}")
    fns, _ = all_bench_fns(spark)
    fns.update(build_variant_registry())
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLAN_DIR", "r18"))
    os.makedirs(out_dir, exist_ok=True)
    summary_lines = []
    for name in sorted(fns):
        if only and name not in only:
            continue
        try:
            df = fns[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001
            print(f"SKIP {name}: {exc!r}", file=sys.stderr)
            continue
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        line = f"{name}: {summarize(plan)}"
        summary_lines.append(line)
        print(line)
    with open(os.path.join(out_dir, f"_summary_{tag}.txt"), "w") as fh:
        fh.write("\n".join(summary_lines) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
