"""Distributed byte-pair-encoding merge training over a word-frequency
table — tokenizer induction, the step a training-data pipeline runs
after curation to fit the vocabulary to the corpus it just built.

The reference has no tokenizer trainer (its text surface stops at
metadata extraction, ``picoprobe/tools/utils.py``); this module is part
of the LLM-pipeline mandate. The algorithm is the classic
word-frequency BPE (Sennrich et al., 2016 — "Neural Machine
Translation of Rare Words with Subword Units"): because merges never
cross word boundaries, training needs only the DISTINCT-word table
weighted by occurrence counts, never the corpus itself.

100 TB posture: the corpus is scanned exactly ONCE (the upstream
word-frequency hash aggregate); every merge iteration then runs over
the vocabulary table — sublinear in corpus size by Heaps' law — as
one explode + hash agg for pair counts, a 1-row TakeOrderedAndProject
argmax broadcast back over the vocabulary, and a narrow map applying
the merge. No window anywhere, no driver-side loop over collected
rows: the ``n_merges`` Python loop builds ONE lazy plan whose
per-iteration stages are persisted (MEMORY_ONLY, evictable) so the
chain evaluates linearly, not 2^k.

Determinism / cross-engine parity: symbols are delimiter-wrapped
(``cat`` → ``<c><a><t>``) so a merge pattern like ``<a><b>`` can never
false-match inside a longer symbol (``<xa><b>`` does not contain
``<a><b>``), and the merge itself is plain left-to-right
non-overlapping string replace — the semantics ``replace`` shares
across Spark, DuckDB and Python, so the oracle replays training
exactly. Overlapping pair occurrences ("aaa" holds two "aa" pairs)
are counted positionally but merged non-overlapping, the same
convention both engines apply.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

#: one wrapped symbol — initially a single character; after merges, a
#: character run. Words are lowercased alpha, so ``<``/``>`` can never
#: occur inside a symbol.
SYM_RE = "<[a-z]+>"


def encode_words(wf: DataFrame, word_col: str = "word",
                 w_col: str = "w") -> DataFrame:
    """(word, w) → (word, sym, w): each character wrapped as a
    delimited symbol (``cat`` → ``<c><a><t>``); the raw word rides
    along so the trained table doubles as the word → segmentation
    map the encode side joins on."""
    return wf.select(
        F.col(word_col).alias("word"),
        F.regexp_replace(F.col(word_col), "(.)", "<$1>").alias("sym"),
        F.col(w_col).alias("w"))


def pair_counts(syms: DataFrame) -> DataFrame:
    """Weighted adjacent-symbol-pair counts over the vocabulary:
    explode each word's adjacent (symbol, next-symbol) positions,
    weight by the word's corpus count, one hash aggregate."""
    toks = syms.select(
        F.expr(f"regexp_extract_all(sym, '{SYM_RE}', 0)").alias("ss"),
        "w")
    pairs = toks.select(
        F.explode(F.expr(
            "transform(slice(ss, 1, size(ss) - 1),"
            " (x, j) -> concat(x, element_at(ss, j + 2)))")).alias("pair"),
        "w")
    return pairs.groupBy("pair").agg(F.sum("w").alias("cnt"))


def bpe_train(wf: DataFrame, n_merges: int) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merges over the (word, w) frequency
    table. Returns ``(merges, final_syms)``:

    - ``merges``: (step 1.., pair, cnt) — the learned merge at each
      step with its weighted pair count; argmax tie-breaks on
      (cnt DESC, pair ASC) so training is deterministic.
    - ``final_syms``: (word, sym, w) — the vocabulary after all
      merges, for downstream symbol-frequency / segmentation stats
      (``word`` is the join key for encoding a corpus).
    """
    syms = encode_words(wf).persist(StorageLevel.MEMORY_ONLY)
    merges: list[DataFrame] = []
    for i in range(n_merges):
        best = (pair_counts(syms)
                .orderBy(F.desc("cnt"), "pair")
                .limit(1)
                .select("pair", "cnt",
                        F.regexp_replace("pair", "><", "")
                         .alias("merged")))
        merges.append(best.select(
            F.lit(i + 1).cast("long").alias("step"), "pair", "cnt"))
        # LEFT cross join + coalesce, not an inner crossJoin against a
        # no-op sentinel merge (round 17): when the corpus admits
        # fewer merges than asked (no adjacent pairs left — every
        # word a single symbol) the argmax is empty, and an inner
        # cross join against it would WIPE the vocabulary; the left
        # join keeps every word with a NULL pair, and
        # replace(sym, NULL, NULL) → NULL → coalesce falls back to
        # the unmerged sym. Same rows as the sentinel form (a short
        # corpus yields fewer merge rows and an unchanged
        # vocabulary), but the per-iteration argmax no longer unions
        # a 1-partition sentinel branch into the pair-count
        # aggregate — that union blocked AQE from coalescing the
        # aggregate's shuffle read, so every merge's broadcast build
        # scheduled 33 tasks over ~3 KB.
        syms = (syms
                .join(F.broadcast(best.select("pair", "merged")),
                      F.lit(True), "left")
                .select("word",
                        F.coalesce(
                            F.replace(F.col("sym"), F.col("pair"),
                                      F.col("merged")),
                            F.col("sym")).alias("sym"), "w")
                .persist(StorageLevel.MEMORY_ONLY))
    return reduce(lambda a, b: a.unionByName(b), merges), syms


def subword_counts(final_syms: DataFrame) -> DataFrame:
    """(word, n_sym): how many subword symbols each vocabulary word
    segments into under the learned merges — the broadcast map the
    encode side joins against the corpus (the vocabulary is
    Heaps'-law-bounded, so the join is a broadcast at any corpus
    size)."""
    return final_syms.select(
        "word",
        F.size(F.expr(f"regexp_extract_all(sym, '{SYM_RE}', 0)"))
         .cast("long").alias("n_sym"))


def vocab_frequencies(syms: DataFrame) -> DataFrame:
    """(tok, freq): corpus-weighted frequency of every symbol in the
    (possibly merged) vocabulary — the subword frequency table a
    tokenizer ships with."""
    return (syms.select(
                F.explode(F.expr(
                    f"regexp_extract_all(sym, '{SYM_RE}', 0)"))
                 .alias("tok"), "w")
            .groupBy("tok").agg(F.sum("w").alias("freq")))
