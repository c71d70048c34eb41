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

Round 13 second half adds the TOKEN-based sibling: multinomial
Naive Bayes (:func:`nb_train` / :func:`nb_predict`) — the closest
closed-form analog of the fastText quality classifiers CCNet/LLaMA
actually deploy (linear bag-of-words scorer; NB is its one-pass,
exactly-reproducible instance). Training is non-iterative: ONE
explode → per-term class-count aggregate (the unigram-LM shape) plus
two 1-row scalar aggregates; the model is a vocab-bounded
(term, llr) table that broadcasts at scoring time plus two driver
floats (prior log-odds, OOV llr) — the same bounded driver state as
the GD weights.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


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
    # Persist the filtered frame across the n_iter gradient passes
    # (round 17, guide §5: cache what is reused AND expensive to
    # recompute): without it every pass re-scans the source and
    # re-evaluates the feature expressions (regex-heavy for the
    # corpus quality filters) — n_iter full extraction passes for
    # one extraction's worth of information. MEMORY_ONLY is
    # evictable (a dropped partition recomputes, degrading to the
    # old behavior, never spilling); the cached rows are the
    # projected feature columns, a narrow fraction of the corpus.
    # Values are unchanged: caching preserves rows, partitioning
    # and per-partition order, so each pass aggregates the same
    # multiset in the same layout.
    d = df.filter(cond)
    persisted = n_iter > 1
    if persisted:
        d = d.persist(StorageLevel.MEMORY_ONLY)
    try:
        w = [0.0] * len(feats)
        for _ in range(n_iter):
            row = _gradient_frame(d, feats, y, w).head()
            if row is None or row[0] is None:
                return w  # empty corpus: zero gradient steps
            w = [wj + lr * (row[j] - l2 * wj)
                 for j, wj in enumerate(w)]
        return w
    finally:
        if persisted:
            d.unpersist()


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


# --------------------------------------------------------------------------
# Multinomial Naive Bayes — the token-based trained filter
# --------------------------------------------------------------------------


class NBModel:
    """A fitted multinomial-NB corpus filter: the vocab-bounded
    ``(term, llr)`` log-likelihood-ratio table (a DataFrame — it
    stays distributed and broadcasts at scoring time, never
    collected) plus three bounded driver scalars: the class-prior
    log-odds, the OOV term's llr (every unseen term contributes the
    same smoothed constant, so it folds into one literal), and the
    smoothing ``alpha`` the fit used."""

    __slots__ = ("llr", "prior_logodds", "oov_llr", "alpha")

    def __init__(self, llr: DataFrame, prior_logodds: float,
                 oov_llr: float, alpha: float):
        self.llr = llr
        self.prior_logodds = prior_logodds
        self.oov_llr = oov_llr
        self.alpha = alpha


def nb_train(df: DataFrame, tokens_col: str, label_col: str,
             alpha: float = 1.0) -> NBModel:
    """Fit a multinomial Naive Bayes binary classifier on a tokenized
    corpus — the closed-form analog of the fastText quality filter:
    ``score(doc) = log(P(y=1)/P(y=0)) + Σ_t log(P(t|1)/P(t|0))`` with
    add-``alpha`` (Laplace) smoothing over the joint vocabulary.
    Labels are boolean/0-1; rows with a NULL label or NULL token
    array are excluded.

    Scale shape: ONE explode → per-term class-count hash aggregate
    (the ``unigram_logprob`` shape — the llr table is
    true-vocabulary-bounded by Heaps' law) plus two 1-row scalar
    aggregates (doc-level class priors; token-total/vocab-size), so
    fitting costs a single corpus pass regardless of corpus size.
    Unlike :func:`logreg_train` there is NO iteration — NB's MLE is
    the count ratio, which is why it is exactly replayable by a
    non-iterative SQL oracle.

    Total on degenerate corpora: an empty or all-NULL frame yields an
    empty llr table, prior ``ln(alpha/alpha) = 0`` and ``oov_llr = 0``
    (every doc then scores the prior). A single-class corpus stays
    finite through the smoothing. Cross-engine FP: counts are exact
    integers below 2^53; ``ln`` differs by ulps (the documented
    ``rand_proj`` tolerance class — scores round at 6 dp downstream).
    """
    if alpha <= 0.0:
        raise ValueError("alpha must be > 0")
    y = F.col(label_col).cast("double")
    d = df.filter(y.isNotNull() & F.col(tokens_col).isNotNull())
    # 1-row doc-level priors (bounded driver hop — the GD-weights /
    # k-means-centroid pattern).
    pr = d.agg(F.sum(y).alias("n1"),
               F.sum(F.lit(1.0) - y).alias("n0")).head()
    n1 = float(pr["n1"] or 0.0)
    n0 = float(pr["n0"] or 0.0)
    prior = math.log((n1 + alpha) / (n0 + alpha))
    # Per-term class counts: the corpus pass. c1/c0 are exact token
    # OCCURRENCE counts per class (the MULTINOMIAL event model —
    # ['good','clean','good'] contributes c1[good]=2, matching the
    # oracle's per-unnested-token sums; Bernoulli NB would count
    # presence once per doc), as doubles (integers — exact < 2^53).
    # NULL elements INSIDE a token array are excluded from the fit
    # (degenerate-battery find: explode emits them and groupBy keeps
    # a NULL key, so they entered the vocab/totals — but the scoring
    # join can never look a NULL term up, so train and predict
    # disagreed on what the corpus was). nb_predict's convention
    # matches: a NULL term contributes 0, as token absence.
    toks = (d.select(y.alias("_y"),
                     F.explode(F.col(tokens_col)).alias("term"))
            .filter(F.col("term").isNotNull()))
    cc = (toks.groupBy("term")
          .agg(F.sum("_y").alias("c1"),
               F.sum(F.lit(1.0) - F.col("_y")).alias("c0")))
    # 1-row totals (bounded). Collected driver-side so the llr
    # projection inlines them as plan literals and stays in
    # whole-stage codegen — exactly how logreg inlines its weights.
    tot = cc.agg(F.sum("c1").alias("t1"), F.sum("c0").alias("t0"),
                 F.count("*").alias("v")).head()
    t1 = float(tot["t1"] or 0.0)
    t0 = float(tot["t0"] or 0.0)
    v = float(tot["v"] or 0.0)
    if v == 0.0:
        oov = 0.0  # no vocabulary at all: unseen terms are neutral
    else:
        oov = math.log((t0 + alpha * v) / (t1 + alpha * v))
    den1, den0 = t1 + alpha * v, t0 + alpha * v
    llr = cc.select(
        "term",
        (F.log((F.col("c1") + alpha) / F.lit(den1))
         - F.log((F.col("c0") + alpha) / F.lit(den0))).alias("llr"))
    return NBModel(llr, prior, oov, alpha)


def nb_predict(docs: DataFrame, model: NBModel, tokens_col: str,
               id_col: str = "doc_id",
               round_digits: int | None = 6) -> DataFrame:
    """Score every document under a fitted :class:`NBModel` —
    returns ``(id, n_tok, score, pred)`` where ``score`` is the NB
    log-odds (prior + Σ per-token llr, OOV terms contributing the
    smoothed constant) and ``pred = score > 0`` gates on the
    UNROUNDED value (the catalog rule: rounding quantizes a decision
    boundary; ``round_digits`` only shapes the reported column).

    Scoring is keyed by ``id_col``: rows SHARING an id merge their
    token multisets into one verdict (the aggregate is per doc, not
    per row — unlike the robots gate, whose verdicts are row-level).
    Callers scoring a frame whose ids may repeat must pre-assign
    unique ids; this is the documented contract, not an accident.

    Scale shape: one explode → ONE broadcast hash join against the
    vocab-bounded llr table → one per-doc hash aggregate. Docs with
    an empty or NULL token array survive (``explode_outer``) and
    score exactly the prior — a NULL term row contributes 0, NOT the
    OOV constant (it is the absence of tokens, not an unseen token).
    At extreme vocabulary sizes drop the broadcast hint and let AQE
    pick the join side — the plan is otherwise unchanged."""
    t = docs.select(F.col(id_col),
                    F.explode_outer(F.col(tokens_col)).alias("term"))
    j = t.join(F.broadcast(model.llr), "term", "left")
    contrib = (F.when(F.col("term").isNull(), F.lit(0.0))
               .otherwise(F.coalesce(F.col("llr"),
                                     F.lit(model.oov_llr))))
    n_tok = F.sum(F.when(F.col("term").isNull(), 0)
                  .otherwise(1)).cast("long")
    per = (j.groupBy(id_col)
           .agg(n_tok.alias("n_tok"),
                (F.lit(model.prior_logodds)
                 + F.sum(contrib)).alias("_raw")))
    raw = F.col("_raw")
    score = raw if round_digits is None else F.round(raw, round_digits)
    return per.select(F.col(id_col), "n_tok", score.alias("score"),
                      (raw > 0.0).alias("pred"))
