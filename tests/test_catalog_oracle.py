"""The correctness gate, locally: run every cataloged query on Spark
and its oracle on DuckDB at sf0.001 (fast) and compare exactly the way
the driver does. A second marker-gated pass runs sf0.01 (the driver's
actual correctness SF)."""

from __future__ import annotations

import os

import pytest

from picoprobedataflow_spark.plans import catalog

from .conftest import SF_DIR, SF_DIR_ORACLE, assert_matches_oracle, make_duck

SPECS = catalog.specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, duck, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_DIR)
    assert df is not None
    if spec.oracle is None:
        # rows-only check, like the driver's weaker gate
        assert df.count() >= 0
        return
    assert_matches_oracle(df, duck, spec.oracle)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle_sf001(spark, name):
    if os.environ.get("SPARK_GRAFT_SLOW") != "1":
        pytest.skip("set SPARK_GRAFT_SLOW=1 for the sf0.01 pass")
    spec = SPECS[name]
    df = spec.fn(spark, SF_DIR_ORACLE)
    if spec.oracle is None:
        assert df.count() >= 0
        return
    con = make_duck(SF_DIR_ORACLE)
    assert_matches_oracle(df, con, spec.oracle)


def test_approx_sketches_self_validates(spark):
    """The sketch ESTIMATES are engine-specific, so the hash-gated
    catalog entry (round 9) exports only the deterministic frame plus
    per-bound boolean flags; this test recomputes every bound from
    the full detail frame — flags true, estimates inside their
    published error bars."""
    from picoprobedataflow_spark.plans.windows_extra import \
        approx_sketches_detail
    rows = approx_sketches_detail(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.users_ok and r.median_ok and r.merged_ok, r
        assert abs(r.approx_users - r.exact_users) \
            <= max(0.2 * r.exact_users, 3.0), r
        eps = 1.0 / 100 + 1.0 / r.n
        assert r.frac_le >= 0.5 - eps - 1e-9, r
        assert r.frac_lt <= 0.5 + eps + 1e-9, r
        # mergeability: the union of per-type HLL sketches estimates
        # the GLOBAL distinct within 4 standard errors
        assert abs(r.merged_est - r.merged_exact) \
            <= max(0.064 * r.merged_exact, 3.0), r
    # the merged estimate is one number repeated on every row
    assert len({r.merged_est for r in rows}) == 1


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) == len(SPECS)


def test_doremi_mixture_invariants(spark):
    """DoReMi-style mixture reweighting: weights are a probability
    vector after every renormalization; the highest-loss source
    strictly gains weight vs uniform and the lowest-loss strictly
    loses; equal losses stay exactly uniform; a numpy replay of the
    multiplicative-weights recursion reproduces the Spark ladder."""
    import numpy as np

    from picoprobedataflow_spark.plans.pipeline import (
        _DOREMI_ETA, _DOREMI_T, doremi_mixture_weights)

    rows = doremi_mixture_weights(spark, SF_DIR).collect()
    k = len(rows)
    assert k >= 2
    ws = {r.source: r.w_final for r in rows}
    losses = {r.source: r.loss for r in rows}
    assert abs(sum(ws.values()) - 1.0) < 1e-6
    hi = max(losses, key=losses.get)
    lo = min(losses, key=losses.get)
    if losses[hi] > losses[lo]:
        assert ws[hi] > 1.0 / k > ws[lo]
    # numpy replay of the exact recursion (6-dp tolerance: the Spark
    # loss column is rounded for display, recompute from it is fine
    # at this corpus size)
    l = np.array([losses[r.source] for r in rows])
    w = np.full(k, 1.0 / k)
    for _ in range(_DOREMI_T):
        raw = w * (1 + _DOREMI_ETA * (l - float(np.dot(w, l))))
        w = raw / raw.sum()
    got = np.array([ws[r.source] for r in rows])
    assert np.max(np.abs(got - w)) < 1e-4


def test_cms_invariants(spark):
    """Count-min invariants on the gated family's output: estimates
    NEVER underestimate (the structural guarantee — min over d cells
    each summing a superset of the term's occurrences), n_total is
    the corpus token count, and the exact top term by true count
    appears in the estimate-ranked head (a heavy hitter cannot be
    displaced below terms whose cells it dominates)."""
    from picoprobedataflow_spark.plans.pipeline import \
        cms_heavy_hitters

    rows = cms_heavy_hitters(spark, SF_DIR).collect()
    assert len(rows) == 10
    assert all(r.never_under for r in rows)
    assert all(r.est >= r.true_cnt for r in rows)
    assert len({r.n_total for r in rows}) == 1
    # the estimate order is deterministic and descending
    ests = [r.est for r in rows]
    assert ests == sorted(ests, reverse=True)
