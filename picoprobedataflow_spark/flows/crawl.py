"""The crawl-frontier prioritization flow: the ACQUISITION-side
composition (the curation flow in :mod:`.curation` is the
processing side) — given the link graph discovered so far and the
resolved robots rule sets, emit the next-fetch list: PageRank-scored,
robots-compliant, per-domain-capped, globally top-N.

Every stage is an existing gated operator (:func:`..operators.graph.
pagerank`, :func:`..functions.web.robots_gate`,
:func:`..functions.web.domain_quota_sample` with the round-13
``order_col`` score ranking); this module adds no new math.

Scale posture: the link graph materializes once inside pagerank
(per-iteration join + aggregate over node-keyed vectors); the robots
verdict is ONE broadcast join; the domain cap is the skew-safe
hierarchical window ranked by score; the final top-N is an
``orderBy().limit()`` — Catalyst's TakeOrderedAndProject, never a
global sort materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prioritize_frontier(links: DataFrame, rules: DataFrame, *,
                        src_col: str = "src_url",
                        dst_col: str = "dst_url",
                        quota: int = 2, top_n: int = 100,
                        n_iter: int = 10, damping: float = 0.85,
                        seeds: DataFrame | None = None,
                        fetched: DataFrame | None = None,
                        init_ranks: DataFrame | None = None
                        ) -> DataFrame:
    """(url, domain, pr, allowed_rank): the next-fetch list.

    Stages: normalize both link endpoints
    (:func:`..functions.web.url_normalize` — the graph must not
    split a page across trivially-different spellings of its URL),
    PageRank the normalized graph (``seeds`` turns it into the
    TrustRank-personalized form), drop robots-DISALLOWED URLs
    (:func:`..functions.web.robots_gate` against the resolved rule
    table), cap each registrable domain at ``quota`` by SCORE
    (highest PageRank first — the ``order_col`` ranking), and return
    the global top ``top_n`` by score. ``allowed_rank`` is the
    within-domain score rank (1 = the domain's best fetch).

    ``fetched`` (a 1-column frame of already-crawled URLs,
    normalized through the same canonicalizer here) anti-joins out
    of the candidate set AFTER scoring — fetched pages still donate
    their rank to the graph (they ARE the graph), they just stop
    being fetch candidates. ``seeds`` normalize through the same
    canonicalizer before entering the teleport set (review find: a
    raw-cased seed silently matched no node and dropped out of the
    TrustRank restart).

    ``init_ranks`` (round 14) is the per-epoch warm start: pass the
    PREVIOUS epoch's (url, pr) scoreboard and drop ``n_iter`` to
    1-3 — over a slowly-growing graph the previous vector is nearly
    the fixpoint, so a warm epoch converges in a couple of
    iterations where a cold one needs ~10 (pytest-pinned: a warm
    start from a converged vector reproduces the cold ranks at
    n_iter=1 within 1e-9; bench: the warm epoch-2 variant).
    The url column normalizes through the same canonicalizer as the
    graph, for the same reason the seeds do."""
    from picoprobedataflow_spark.functions.web import (
        domain_quota_sample, robots_gate, url_normalize)
    from picoprobedataflow_spark.operators.graph import pagerank

    e = links.select(
        url_normalize(F.col(src_col)).alias("src"),
        url_normalize(F.col(dst_col)).alias("dst"))
    if seeds is not None:
        if len(seeds.columns) != 1:
            # pagerank rejects multi-column seed frames itself;
            # narrowing to columns[0] here would silently bypass
            # that guard (the same silent-shape class).
            raise ValueError(
                f"seeds must be a 1-column frame of URLs; got "
                f"{seeds.columns}")
        seeds = seeds.select(
            url_normalize(F.col(seeds.columns[0])).alias("seed"))
    if init_ranks is not None:
        if len(init_ranks.columns) != 2:
            # pagerank re-checks the arity, but AFTER this flow has
            # renamed columns — reject on the caller's shape.
            raise ValueError(
                f"init_ranks must be a 2-column (url, pr) frame; "
                f"got {init_ranks.columns}")
        init_ranks = init_ranks.select(
            url_normalize(F.col(init_ranks.columns[0])).alias("node"),
            F.col(init_ranks.columns[1]).alias("pr"))
    pr = (pagerank(e, n_iter=n_iter, damping=damping, seeds=seeds,
                   init_ranks=init_ranks)
          .select(F.col("node").alias("url"), "pr"))
    if fetched is not None:
        if len(fetched.columns) != 1:
            raise ValueError(
                f"fetched must be a 1-column frame of URLs; got "
                f"{fetched.columns}")
        done = fetched.select(
            url_normalize(F.col(fetched.columns[0])).alias("url"))
        pr = pr.join(done, "url", "left_anti")
    verdicts = robots_gate(
        pr.select(F.col("url").alias("u_id"),
                  F.col("url").alias("u")),
        rules, url_col="u", id_col="u_id")
    allowed = (pr.join(verdicts.filter(F.col("allowed"))
                       .select(F.col("u_id").alias("url")), "url"))
    capped = domain_quota_sample(allowed, url_col="url",
                                 quota=quota, id_col="url",
                                 order_col="pr")
    kept = (allowed.join(capped.filter(F.col("kept"))
                         .select(F.col("url"), "domain",
                                 F.col("rank").alias("allowed_rank")),
                         "url"))
    return (kept.select("url", "domain", "pr", "allowed_rank")
            .orderBy(F.desc("pr"), "url")
            .limit(top_n))
