"""Training-data pipeline operators as catalog queries — deduplication
(exact / n-gram Jaccard / MinHash+LSH / SimHash / embedding cosine),
similarity search (brute-force + SRP-LSH ANN), and text analysis
(quality scoring, language-ID heuristic, token stats, fingerprints)
over the ``documents`` and ``embeddings`` tables.

These are the 100 TB-facing operators: every one is a DataFrame
composition whose joins are *blocked* (shingle equality, LSH band,
byte chunk, label) rather than all-pairs, so the candidate set — not
the corpus square — drives cost. Oracle SQL reproduces the identical
md5-derived hashes, so even MinHash/SimHash signatures hash-match
across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from picoprobedataflow_spark.functions import text as TX
from picoprobedataflow_spark.operators import dedup as DD
from picoprobedataflow_spark.operators import similarity as SIM
from picoprobedataflow_spark.plans.catalog import query
from picoprobedataflow_spark.plans.common import tbl

# ---- shared oracle CTE fragments -----------------------------------------

#: words per doc (docs always have ≥10 tokens in the testdata).
_WORDS = ("string_split_regex(trim(text), '\\s+')")

_SHINGLES_CTE = f"""
toks AS (
  SELECT doc_id, {_WORDS} AS w FROM documents WHERE doc_id < {{limit}}
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(w) - 2),
                               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
           AS shingle
  FROM toks
)"""

_HASH64 = "CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------

@query(
    "dedup_exact_summary",
    oracle="""
SELECT count(*)                                    AS n_docs,
       count(DISTINCT md5(text))                   AS n_distinct,
       count(*) - count(DISTINCT md5(text))        AS n_dups
FROM documents
""",
    tags=("dedup-exact",),
)
def dedup_exact_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level exact-duplicate accounting (hash-groupBy dedup).
    approx_count_distinct is the 100 TB variant; exact here for the
    oracle."""
    docs = tbl(spark, sf_dir, "documents")
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(TX.fingerprint_md5("text")).alias("n_distinct"),
        (F.count("*") - F.countDistinct(TX.fingerprint_md5("text")))
        .alias("n_dups"))


@query(
    "dedup_exact_groups",
    oracle="""
SELECT md5(text) AS fingerprint,
       count(*)  AS n_docs,
       min(doc_id) AS canonical_id
FROM documents GROUP BY 1
""",
    tags=("dedup-exact",),
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint groups with keep-first canonical id — the dedup
    survivor map (reference analog: checkpoint seen-set keyed by
    content instead of path)."""
    return DD.exact_dedup_groups(tbl(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# n-gram Jaccard near-dup
# --------------------------------------------------------------------------

@query(
    "dedup_ngram_jaccard",
    oracle="WITH " + _SHINGLES_CTE.format(limit=150) + """,
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common,
       s1.n AS n_a, s2.n AS n_b,
       round(n_common * 1.0 / (s1.n + s2.n - n_common), 6) AS jaccard
FROM common
JOIN sizes s1 ON doc_a = s1.doc_id
JOIN sizes s2 ON doc_b = s2.doc_id
WHERE n_common * 1.0 / (s1.n + s2.n - n_common) >= 0.02
""",
    tags=("dedup-jaccard",),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-word-shingle Jaccard pairs via the shingle-equality join
    (never an all-pairs product). Low threshold so the synthetic
    corpus yields a meaningful candidate set; production threshold
    ~0.8 with ``max_df`` stop-shingle pruning."""
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    pairs = DD.jaccard_pairs(docs, k=3, threshold=0.02)
    return pairs.withColumn("jaccard", F.round("jaccard", 6))


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def _minhash_cte() -> str:
    from picoprobedataflow_spark.operators.dedup import (
        MINHASH_PRIME,
        minhash_params,
    )

    values = ", ".join(f"({i}, {a}, {b})" for i, a, b in minhash_params(16))
    base = _HASH64.format(expr="shingle")
    return ("WITH " + _SHINGLES_CTE.format(limit="{limit}") + f""",
sigs AS (
  SELECT doc_id, salt,
         min((a * ({base} % {MINHASH_PRIME}) + b) % {MINHASH_PRIME})
           AS minhash
  FROM sh CROSS JOIN (VALUES {values}) params(salt, a, b)
  GROUP BY doc_id, salt
)""")


_MINHASH_CTE = _minhash_cte()


@query(
    "dedup_minhash_signatures",
    oracle=_MINHASH_CTE.format(limit=50) + """
SELECT doc_id, salt, minhash FROM sigs
""",
    tags=("dedup-minhash",),
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-form MinHash signatures (16 salted md5-hashes, min over
    shingles) — bit-identical across engines by construction."""
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return DD.minhash_signatures(docs, num_hashes=16, k=3)


@query(
    "dedup_minhash_lsh_pairs",
    oracle=_MINHASH_CTE.format(limit=200) + """,
bands AS (
  SELECT doc_id, salt // 4 AS band,
         md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY salt))
           AS band_sig
  FROM sigs GROUP BY doc_id, salt // 4
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_sig = b.band_sig
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       sum(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) / 16.0
         AS est_jaccard
FROM cand
JOIN sigs sa ON sa.doc_id = doc_a
JOIN sigs sb ON sb.doc_id = doc_b AND sb.salt = sa.salt
GROUP BY doc_a, doc_b
""",
    tags=("dedup-minhash", "lsh"),
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs (4 bands × 4 rows) + estimated
    Jaccard — the scalable near-dup path: only band-colliding docs are
    ever compared."""
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    sigs = DD.minhash_signatures(docs, num_hashes=16, k=3)
    pairs = DD.lsh_candidate_pairs(sigs, band_size=4)
    return DD.minhash_jaccard_estimate(sigs, pairs, num_hashes=16)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def _simhash_oracle(limit: int) -> str:
    h = _HASH64.format(expr="tok")
    votes = ",\n         ".join(
        f"sum(CASE WHEN ({h} >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(32))
    sig = " + ".join(
        f"CASE WHEN v{b} > 0 THEN CAST(1 AS BIGINT) << {b} ELSE 0 END"
        for b in range(32))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_WORDS}) AS tok
  FROM documents WHERE doc_id < {limit}
),
votes AS (
  SELECT doc_id,
         {votes}
  FROM toks GROUP BY doc_id
)
SELECT doc_id, {sig} AS simhash FROM votes
"""


@query(
    "dedup_simhash_signatures",
    oracle=_simhash_oracle(100),
    tags=("dedup-simhash",),
)
def dedup_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per doc — per-bit ±1 votes over token hashes,
    one explode + one hash aggregate."""
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return DD.simhash_signatures(docs, bits=32)


@query(
    "dedup_simhash_pairs",
    oracle=f"""
WITH sigs AS ({_simhash_oracle(200)}),
chunks AS (
  SELECT doc_id, simhash, j, (simhash >> (8 * j)) & 255 AS chunk
  FROM sigs CROSS JOIN range(4) t(j)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sig_a, b.simhash AS sig_b
  FROM chunks a JOIN chunks b
    ON a.j = b.j AND a.chunk = b.chunk AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(sig_a, sig_b)) <= 6
""",
    tags=("dedup-simhash", "lsh"),
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: byte-chunk pigeonhole candidates, then
    hamming ≤ 6 verification (Manku-style)."""
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return DD.simhash_dedup(docs, max_hamming=6, n_chunks=4, bits=32)


# --------------------------------------------------------------------------
# Embedding similarity
# --------------------------------------------------------------------------

_COS = ("list_cosine_similarity(CAST({a} AS DOUBLE[]), "
        "CAST({b} AS DOUBLE[]))")


@query(
    "embedding_cosine_neardup",
    oracle=f"""
SELECT a.label AS block, a.vec_id AS id_a, b.vec_id AS id_b,
       round({_COS.format(a='a.embedding', b='b.embedding')}, 6) AS cosine
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_COS.format(a='a.embedding', b='b.embedding')} >= 0.4
""",
    tags=("embedding-neardup",),
)
def embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs, blocked on the cluster label —
    the blocking join keeps this sub-quadratic; at 100 TB the block key
    is an LSH bucket instead of a gold label."""
    emb = tbl(spark, sf_dir, "embeddings")
    pairs = SIM.blocked_near_pairs(emb, threshold=0.4, block_col="label")
    return pairs.withColumn("cosine", F.round("cosine", 6))


@query(
    "ann_cosine_topk",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round({_COS.format(a='embedding', b='(SELECT qv FROM q)')}, 6) AS cosine
FROM embeddings
WHERE vec_id > 0
ORDER BY round({_COS.format(a='embedding', b='(SELECT qv FROM q)')}, 6) DESC,
         vec_id
LIMIT 10
""",
    tags=("ann", "similarity"),
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 against the vec_id=0 query vector —
    the exact-ANN baseline; single scan, JVM fold dot product,
    TakeOrderedAndProject top-k."""
    emb = tbl(spark, sf_dir, "embeddings")
    qvec = (emb.filter(F.col("vec_id") == 0)
               .select("embedding").head()[0])
    return SIM.topk_cosine(emb.filter(F.col("vec_id") > 0),
                           [float(x) for x in qvec], k=10)


def _srp_dot_sql(v: str, p: int, dim: int) -> str:
    """Chained left-associative plane·v sum — term order and double
    arithmetic identical to :func:`..operators.similarity.srp_bucket`,
    so the sign decision is bit-reproducible across engines. Plane
    entries are md5-derived constants, precomputed here into literals."""
    import hashlib

    terms = []
    for d in range(dim):
        h = int(hashlib.md5(f"p:{p}:{d}".encode()).hexdigest()[:8], 16)
        terms.append(f"{v}[{d + 1}]*{'1.0' if h % 2 == 0 else '-1.0'}")
    return " + ".join(terms)


def _srp_bucket_sql(v: str, n_planes: int, dim: int) -> str:
    cases = [f"CASE WHEN ({_srp_dot_sql(v, p, dim)}) > 0"
             f" THEN {1 << p} ELSE 0 END" for p in range(n_planes)]
    return "(" + " + ".join(cases) + ")"


_SRP_PLANES, _SRP_DIM = 4, 64


@query(
    "ann_srp_bucket_topk",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       {_srp_bucket_sql('embedding', _SRP_PLANES, _SRP_DIM)} AS bucket,
       round({_COS.format(a='embedding', b='(SELECT qv FROM q)')}, 6) AS cosine
FROM embeddings
WHERE vec_id > 0
  AND {_srp_bucket_sql('embedding', _SRP_PLANES, _SRP_DIM)}
      = (SELECT {_srp_bucket_sql('qv', _SRP_PLANES, _SRP_DIM)} FROM q)
ORDER BY round({_COS.format(a='embedding', b='(SELECT qv FROM q)')}, 6) DESC,
         vec_id
LIMIT 10
""",
    tags=("ann", "similarity", "lsh"),
)
def ann_srp_bucket_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH ANN — the scale path: restrict the scan to the query's
    sign-random-projection bucket (1/2^planes of the data when the
    bucket is a partition key at write time), exact cosine top-k
    inside. The ±1 hyperplanes derive from md5 of (plane, dim), so the
    oracle replays them as literal chained sums — bucket assignment is
    bit-identical across engines, no float-boundary hazard. 4 planes
    here so small-SF buckets stay populated; production uses 8-16."""
    emb = tbl(spark, sf_dir, "embeddings")
    qvec = (emb.filter(F.col("vec_id") == 0)
               .select("embedding").head()[0])
    return SIM.srp_ann_search(emb.filter(F.col("vec_id") > 0),
                              [float(x) for x in qvec], k=10,
                              n_planes=_SRP_PLANES, dim=_SRP_DIM)


_IVF_ORACLE = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
longf AS (SELECT label AS cell, generate_subscripts(embedding, 1) AS dim,
                 unnest(CAST(embedding AS DOUBLE[])) AS val
          FROM embeddings WHERE vec_id > 0),
cents AS (SELECT cell, list(m ORDER BY dim) AS centroid
          FROM (SELECT cell, dim, avg(val) AS m FROM longf GROUP BY cell, dim)
          GROUP BY cell),
probe AS (SELECT cell FROM cents
          ORDER BY list_cosine_similarity(centroid,
                     CAST((SELECT qv FROM q) AS DOUBLE[])) DESC, cell
          LIMIT 2)
SELECT vec_id, label AS cell,
       round({_COS.format(a='embedding', b='(SELECT qv FROM q)')}, 6) AS cosine
FROM embeddings
WHERE vec_id > 0 AND label IN (SELECT cell FROM probe)
ORDER BY round({_COS.format(a='embedding', b='(SELECT qv FROM q)')}, 6) DESC,
         vec_id
LIMIT 5
"""


@query(
    "ann_ivf_probe_topk",
    oracle=_IVF_ORACLE,
    tags=("ann", "similarity", "ivf"),
)
def ann_ivf_probe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: rank cells by centroid cosine to the query
    (centroid table is |cells| rows — driver-side), scan only the 2
    nearest cells, exact top-5 inside them. With the cell as a
    partition key at write time the cell restriction is partition
    pruning — a query touches n_probe/|cells| of the data. Centroid
    ranking tolerates last-ulp float-average drift because cluster
    margins dwarf it; the emitted scores are exact cosines, rounded."""
    emb = tbl(spark, sf_dir, "embeddings")
    qvec = (emb.filter(F.col("vec_id") == 0)
               .select("embedding").head()[0])
    return SIM.ivf_ann_search(emb.filter(F.col("vec_id") > 0),
                              [float(x) for x in qvec], k=5, n_probe=2)


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------

@query(
    "text_quality_metrics",
    oracle=f"""
SELECT doc_id,
       CAST(len({_WORDS}) AS BIGINT) AS n_words,
       CAST(len(regexp_extract_all(text,
            '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_tokens,
       length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
         * 1.0 / greatest(length(text), 1) AS punct_ratio,
       length(regexp_replace(text, '\\s+', '', 'g'))
         * 1.0 / greatest(len({_WORDS}), 1) AS mean_word_len,
       len(list_filter({_WORDS}, t -> list_contains(
            ['the','a','of','and','to','is','in'], lower(t))))
         * 1.0 / greatest(len({_WORDS}), 1) AS stopword_ratio,
       round(0.5 * least(length(text) / 500.0, 1.0)
           + 0.5 * least(len(list_filter({_WORDS}, t -> list_contains(
                  ['the','a','of','and','to','is','in'], lower(t))))
                  * 1.0 / greatest(len({_WORDS}), 1) * 5.0, 1.0)
           - 0.25 * least(length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
                  * 1.0 / greatest(length(text), 1) * 4.0, 1.0), 6)
         AS quality
FROM documents WHERE doc_id < 200
""",
    tags=("text-quality",),
)
def text_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring: token counts (whitespace + BPE-ish
    regex), punctuation ratio, mean word length, stopword ratio, and
    the composite quality score — all JVM regex/array expressions."""
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    nw = TX.n_words("text")
    return docs.select(
        "doc_id",
        nw.cast("long").alias("n_words"),
        TX.n_tokens_bpe("text").cast("long").alias("n_tokens"),
        TX.punct_ratio("text").alias("punct_ratio"),
        TX.mean_word_len("text").alias("mean_word_len"),
        TX.stopword_ratio("text").alias("stopword_ratio"),
        TX.quality_score("text").alias("quality"),
    )


def _langid_oracle() -> str:
    hits = {
        lang: ("len(list_filter(" + _WORDS + ", t -> list_contains(["
               + ",".join(f"'{w}'" for w in TX.STOPWORDS[lang])
               + "], lower(t))))")
        for lang in TX.STOPWORDS
    }
    g = "greatest(" + ", ".join(f"s_{l}" for l in TX.STOPWORDS) + ")"
    pred = "CASE " + " ".join(
        f"WHEN s_{l} = {g} THEN '{l}'" for l in TX.STOPWORDS) + " END"
    scores = ",\n         ".join(f"{e} AS s_{l}" for l, e in hits.items())
    return f"""
WITH scored AS (
  SELECT lang,
         {scores}
  FROM documents
)
SELECT lang, {pred} AS predicted_lang, count(*) AS n
FROM scored GROUP BY 1, 2
"""


@query("langid_confusion", oracle=_langid_oracle(), tags=("lang-id",))
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language-ID heuristic: argmax over per-language
    stopword counts (deterministic fixed-priority tie-break), reported
    as a labeled-vs-predicted confusion matrix."""
    docs = tbl(spark, sf_dir, "documents")
    scores = TX.langid_scores("text")
    scored = docs.select("lang", *[s.alias(f"s_{l}")
                                   for l, s in scores.items()])
    g = F.greatest(*[F.col(f"s_{l}") for l in TX.STOPWORDS])
    expr = None
    for l in TX.STOPWORDS:
        cond = F.when(F.col(f"s_{l}") == g, F.lit(l))
        expr = cond if expr is None else expr.when(F.col(f"s_{l}") == g,
                                                   F.lit(l))
    return (scored.withColumn("predicted_lang", expr)
                  .groupBy("lang", "predicted_lang")
                  .agg(F.count("*").alias("n")))


@query(
    "token_stats_per_source",
    oracle=f"""
SELECT source,
       count(*) AS n_docs,
       CAST(sum(len({_WORDS})) AS BIGINT) AS total_words,
       CAST(sum(len({_WORDS})) AS DOUBLE) / count(*) AS mean_words,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY source
""",
    tags=("token-count",),
)
def token_stats_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting per source — the budget query of a
    training-data pipeline (exact-integer sums → exact means)."""
    docs = tbl(spark, sf_dir, "documents")
    nw = TX.n_words("text")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(nw).cast("long").alias("total_words"),
        (F.sum(nw).cast("double") / F.count("*")).alias("mean_words"),
        F.sum(F.length("text")).cast("long").alias("total_chars"))


@query(
    "dataset_split_assignment",
    oracle="""
SELECT CASE
         WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 100 < 80 THEN 'train'
         WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 100 < 90 THEN 'val'
         ELSE 'test' END AS split,
       count(*) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY 1
""",
    tags=("dataset-split", "sampling"),
)
def dataset_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test split (80/10/10) — the
    reproducible-sampling primitive of a training-data pipeline: the
    assignment depends only on doc_id, so it is stable across runs,
    engines, and re-partitioning (never ``rand()``)."""
    docs = tbl(spark, sf_dir, "documents")
    bucket = (F.conv(F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long") % 100)
    split = (F.when(bucket < 80, "train")
              .when(bucket < 90, "val")
              .otherwise("test"))
    return (docs.groupBy(split.alias("split"))
                .agg(F.count("*").alias("n_docs"),
                     F.sum(F.length("text")).cast("long")
                      .alias("total_chars")))


@query(
    "text_normalize_chunks",
    oracle="""
WITH norm AS (
  SELECT doc_id,
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
  FROM documents WHERE doc_id < 50
),
chunks AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(0, CAST(floor((length(t) - 1) / 80) AS INT)),
           i -> substr(t, CAST(i * 80 + 1 AS INT), 100))) AS chunk,
         generate_subscripts(
           list_transform(
             generate_series(0, CAST(floor((length(t) - 1) / 80) AS INT)),
             i -> substr(t, CAST(i * 80 + 1 AS INT), 100)), 1) - 1
           AS chunk_idx
  FROM norm
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, chunk,
       CAST(length(chunk) AS BIGINT) AS chunk_len
FROM chunks
""",
    tags=("chunking", "normalize"),
)
def text_normalize_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize (lowercase, whitespace-collapse) then chunk into
    100-char windows with stride 80 (20-char overlap) — the
    context-window prep stage of an LLM data pipeline, as pure array
    expressions + one explode."""
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    norm = docs.select(
        "doc_id",
        F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ").alias("t"))
    n_chunks = F.floor((F.length("t") - 1) / 80).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks),
        lambda i: F.substr(F.col("t"), i * 80 + 1, F.lit(100)))
    return (norm.select("doc_id", F.posexplode(chunks)
                        .alias("chunk_idx", "chunk"))
                .select("doc_id",
                        F.col("chunk_idx").cast("long").alias("chunk_idx"),
                        "chunk",
                        F.length("chunk").cast("long").alias("chunk_len")))


@query(
    "vocabulary_stats",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({_WORDS}) AS tok FROM documents
)
SELECT tok,
       count(*) AS tf,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS df
FROM toks
GROUP BY tok
HAVING count(DISTINCT doc_id) >= 5
""",
    tags=("vocabulary", "token-count"),
)
def vocabulary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary with term/document frequencies (df ≥ 5) —
    the word-count of training-data engineering; one explode + one
    aggregate with map-side combine."""
    docs = tbl(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(TX.words("text")).alias("tok"))
    return (toks.groupBy("tok")
                .agg(F.count("*").alias("tf"),
                     F.countDistinct("doc_id").alias("df"))
                .filter(F.col("df") >= 5))


@query(
    "doc_fingerprints",
    oracle="""
SELECT doc_id,
       md5(text) AS md5_full,
       md5(substr(text, 1, 64)) || ':' || md5(substr(reverse(text), 1, 64))
         || ':' || CAST(length(text) AS VARCHAR) AS rolling_fp,
       CAST(length(text) AS BIGINT) AS n_chars_actual
FROM documents WHERE doc_id < 100
""",
    tags=("fingerprint",),
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: full-content md5 + head/tail rolling
    fingerprint (sync_level=checksum analog — catches append edits
    without rehashing the body)."""
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id",
        TX.fingerprint_md5("text").alias("md5_full"),
        TX.fingerprint_rolling("text").alias("rolling_fp"),
        F.length("text").cast("long").alias("n_chars_actual"))
