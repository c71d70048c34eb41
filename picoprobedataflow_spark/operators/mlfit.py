"""Distributed model fitting for trainable corpus filters.

The quality filters real pretraining pipelines deploy (CCNet's and
LLaMA's fastText classifiers, quality logistic regressions over
heuristic features) are TRAINED on the corpus they filter — so the
engine needs model fitting as a first-class distributed op, not just
inference. This module implements batch-gradient-descent logistic
regression as a pure aggregation plan:

- Each iteration is ONE global aggregate over the corpus: the
  gradient's j-th component is ``avg(f_j · (y − σ(w·f)))`` — a
  map-side partial sum per feature, one 1-row exchange, nothing else.
  No joins, no shuffle of the corpus, no per-row Python.
- The weight vector (k+1 doubles) lives driver-side between
  iterations, exactly like the k-means centroids and PQ codebooks —
  the k·n_iter-bounded driver state the catalog's other iterative
  builds already use. Each iteration's margin expression inlines the
  current weights as plan literals, so the whole pass stays in
  whole-stage codegen.
- Determinism: fixed ``n_iter``, fixed ``lr``, zero-initialized
  weights, no sampling — the DuckDB oracle replays the identical
  chain as MATERIALIZED 1-row CTE stages (the PageRank/k-means
  replay strategy). Cross-engine FP tolerance is the documented
  ``rand_proj`` class: unordered aggregate sums and libm ``exp``
  differ by ulps; outputs round at 6 dp.

Scale shape at 100 TB: n_iter passes over the corpus, each a single
narrow aggregate — the textbook full-batch GD layout (mini-batch /
L-BFGS variants change the driver loop, not the per-pass plan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sigmoid(m: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-m))


def _gradient_frame(d: DataFrame, feats: list[Column],
                    y: Column, w: list[float]) -> DataFrame:
    """ONE GD pass as a frame: the per-feature average-gradient
    aggregate at the current weights. Factored out of
    :func:`logreg_train` so the plan-shape pin
    (test_logreg_gradient_pass_plan_shape) asserts the OPERATOR's
    actual per-pass plan, not a hand-built replica."""
    margin = sum((F.lit(wj) * fj for wj, fj in zip(w, feats)),
                 F.lit(0.0))
    resid = y - _sigmoid(margin)
    return d.agg(*[F.avg(fj * resid).alias(f"g{j}")
                   for j, fj in enumerate(feats)])


def logreg_train(df: DataFrame, feature_cols: list[str],
                 label_col: str, n_iter: int = 3,
                 lr: float = 1.0, l2: float = 0.0) -> list[float]:
    """Batch-GD logistic regression weights ``[bias, w_1..w_k]``
    after exactly ``n_iter`` iterations from the zero vector:
    ``w ← w + lr · (avg(f · (y − σ(w·f))) − l2 · w)`` with an
    implicit leading 1-feature for the bias. Labels are boolean/0-1;
    rows where any feature or the label is NULL are excluded (total
    on degenerate corpora: an empty or all-NULL frame returns the
    zero vector — zero gradient steps, not a crash).

    ``l2`` (round 13) is standard ridge weight decay — the knob a
    trained corpus filter needs once features correlate (length and
    token count do) so no single weight runs away; the BIAS is
    regularized too (deliberate: with centered features the bias
    stays near the log-odds prior, and the symmetric form keeps the
    update one fused expression). Decay applies driver-side to the
    known current weights, so the per-pass plan is unchanged: still
    ONE aggregate, no extra job."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    if l2 < 0.0:
        raise ValueError("l2 must be >= 0")
    feats = [F.lit(1.0)] + [F.col(c).cast("double")
                            for c in feature_cols]
    y = F.col(label_col).cast("double")
    cond = y.isNotNull()
    for c in feature_cols:
        cond = cond & F.col(c).cast("double").isNotNull()
    d = df.filter(cond)
    w = [0.0] * len(feats)
    for _ in range(n_iter):
        row = _gradient_frame(d, feats, y, w).head()
        if row is None or row[0] is None:
            return w  # empty corpus: zero gradient steps
        w = [wj + lr * (row[j] - l2 * wj)
             for j, wj in enumerate(w)]
    return w


def logreg_predict(df: DataFrame, feature_cols: list[str],
                   weights: list[float],
                   round_digits: int | None = 6) -> Column:
    """σ(w·f) under trained ``weights`` (bias first) — the filter
    score column a curation pipeline thresholds on. Rounded at
    ``round_digits`` for reporting; pass ``None`` for the raw score
    (threshold decisions should gate on the UNROUNDED value — the
    catalog rule that rounding quantizes a decision boundary).
    ``weights`` must be ``len(feature_cols) + 1`` values (bias
    first) — rejected eagerly (round-13 review find: ``zip`` was
    silently truncating a bias-less vector into plausible-looking
    wrong scores)."""
    if len(weights) != len(feature_cols) + 1:
        raise ValueError(
            f"weights must have len(feature_cols)+1 = "
            f"{len(feature_cols) + 1} entries (bias first); "
            f"got {len(weights)}")
    feats = [F.lit(1.0)] + [F.col(c).cast("double")
                            for c in feature_cols]
    margin = sum((F.lit(wj) * fj for wj, fj in zip(weights, feats)),
                 F.lit(0.0))
    s = _sigmoid(margin)
    return s if round_digits is None else F.round(s, round_digits)
