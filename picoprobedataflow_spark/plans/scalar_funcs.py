"""Scalar-function coverage — SURVEY.md §2.8 F1-F20 exercised as
catalog queries through :mod:`picoprobedataflow_spark.functions.scalar`
(path manipulation, checksums, mime classification, timestamp/epoch
math, string ops). Everything stays in ``pyspark.sql.functions`` /
whole-stage codegen.

Single-feature queries are folded into multi-column suites so every
entry fits the external checker's per-round correctness window — the
operator → query mapping lives in COVERAGE.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from picoprobedataflow_spark.functions import scalar as S
from picoprobedataflow_spark.plans.catalog import query
from picoprobedataflow_spark.plans.common import events_us, tbl


@query(
    "path_checksum_functions",
    oracle="""
WITH docs AS (
  SELECT doc_id, source, text,
         '/data/' || source || '/doc_' || CAST(doc_id AS VARCHAR) || '.txt'
           AS path,
         'HTTPS://WWW.' || source || '.Example.COM:443/Docs/'
           || (CASE WHEN doc_id % 2 = 0 THEN 'Item_' ELSE 'item_' END)
           || CAST(doc_id AS VARCHAR)
           || (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END)
           || '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR)
           || (CASE WHEN doc_id % 5 = 0 THEN '&utm_campaign=x' ELSE '' END)
           || '#sec' AS url
  FROM documents WHERE doc_id < 100
),
urls AS (
  SELECT doc_id,
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    regexp_replace(regexp_replace(
      lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
      '^www\\.', ''), ':(443|80)$', '') AS host,
    regexp_replace(regexp_extract(url,
      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1), '/+$', '') AS path0,
    regexp_replace(regexp_replace(regexp_replace(
      regexp_extract(url, '\\?([^#]*)', 1),
      '(^|&)(utm_[A-Za-z]+|fbclid|gclid|ref)=[^&]*', '', 'g'),
      '&&+', '&', 'g'), '^&+|&+$', '', 'g') AS q
  FROM docs
)
SELECT d.doc_id, path,
       regexp_extract(path, '([^/]*)$', 1)           AS file_name,
       regexp_replace(path, '/[^/]*$', '')           AS parent_dir,
       regexp_replace(path, '\\.[^./]*$', '.json')   AS json_sidecar,
       lower(regexp_extract(path, '(\\.[^./]*)$', 1)) AS extension,
       CASE lower(regexp_extract(path, '(\\.[^./]*)$', 1))
            WHEN '.emd' THEN 'application/octet-stream'
            WHEN '.mp4' THEN 'video/mp4'
            WHEN '.json' THEN 'application/json'
            WHEN '.png' THEN 'image/png'
            WHEN '.txt' THEN 'text/plain'
            WHEN '.csv' THEN 'text/csv'
            ELSE 'application/octet-stream' END      AS mime_type,
       md5(text)    AS md5_hex,
       sha256(text) AS sha256_hex,
       CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) AS hash64,
       url,
       u.scheme || '://' || u.host ||
         (CASE WHEN u.path0 = '' THEN '/' ELSE u.path0 END) ||
         (CASE WHEN u.q = '' THEN '' ELSE '?' || u.q END) AS canon_url,
       u.host AS url_host,
       regexp_extract(u.host, '([^.]+\\.[^.]+)$', 1) AS url_domain
FROM docs d JOIN urls u ON d.doc_id = u.doc_id
""",
    tags=("F9", "F19", "F18", "S2", "url-canonicalization"),
)
def path_checksum_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The publish-doc per-file scalar block in one projection: path
    manipulation F9 — ``Path.name`` / ``.parent`` / ``with_suffix``
    (utils.py:60,77; tools/hyperspectral.py:127,139) — mime
    classification F19, and content digests F18 (the ``files[]``
    sha256; sha512 also implemented but DuckDB lacks it, covered by
    pytest against hashlib) plus the portable md5-based 64-bit hash
    the dedup operators build on.

    Round 5: URL canonicalization rides along — a deterministic
    messy URL is synthesized per doc (mixed-case scheme/host, www.,
    default port, tracking params, fragment, trailing slash — the
    same deterministic-synthesis trick as the PII family) and
    :func:`..functions.scalar.url_canonical` /:func:`url_host`
    /:func:`url_domain` reduce it to the fetch-dedup key of
    web-corpus ingestion. All backreference-free regexps, replayed
    verbatim by the oracle."""
    did = F.col("doc_id")
    messy = F.concat(
        F.lit("HTTPS://WWW."), F.col("source"),
        F.lit(".Example.COM:443/Docs/"),
        F.when(did % 2 == 0, "Item_").otherwise("item_"),
        did.cast("string"),
        F.when(did % 3 == 0, "/").otherwise(""),
        F.lit("?utm_source=feed&id="), did.cast("string"),
        F.when(did % 5 == 0, "&utm_campaign=x").otherwise(""),
        F.lit("#sec"))
    docs = (tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
            .withColumn("path", F.concat(F.lit("/data/"), F.col("source"),
                                         F.lit("/doc_"),
                                         F.col("doc_id").cast("string"),
                                         F.lit(".txt")))
            .withColumn("url", messy))
    return docs.select(
        "doc_id", "path",
        S.path_name("path").alias("file_name"),
        S.path_parent("path").alias("parent_dir"),
        S.with_suffix("path", ".json").alias("json_sidecar"),
        S.file_extension("path").alias("extension"),
        S.mime_type("path").alias("mime_type"),
        F.md5(F.col("text").cast("binary")).alias("md5_hex"),
        S.sha256_hex("text").alias("sha256_hex"),
        S.portable_hash64(F.col("text")).alias("hash64"),
        "url",
        S.url_canonical("url").alias("canon_url"),
        S.url_host("url").alias("url_host"),
        S.url_domain("url").alias("url_domain"),
    )


@query(
    "time_functions",
    oracle="""
SELECT 'orders_ts' AS family,
       CAST(o_orderkey AS VARCHAR)                      AS rec_id,
       strftime(o_orderdate, '%Y-%m-%d')                AS iso,
       epoch(o_orderdate)                               AS epoch_sec,
       CAST(year(o_orderdate) AS BIGINT)                AS yr,
       CAST(month(o_orderdate) AS BIGINT)               AS mth,
       CAST(quarter(o_orderdate) AS BIGINT)             AS qtr,
       CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
            AS BIGINT)                                  AS days_since,
       CAST(NULL AS BIGINT)                             AS n,
       CAST(NULL AS DOUBLE)                             AS sum_total
FROM orders WHERE o_orderkey < 1000
UNION ALL
SELECT 'events_ns',
       CAST(event_id AS VARCHAR),
       strftime(make_timestamp(epoch_us(ts)), '%Y-%m-%d'),
       epoch_us(ts) / 1e6,
       CAST(year(make_timestamp(epoch_us(ts))) AS BIGINT),
       CAST(month(make_timestamp(epoch_us(ts))) AS BIGINT),
       CAST(quarter(make_timestamp(epoch_us(ts))) AS BIGINT),
       NULL, NULL, NULL
FROM events WHERE user_id = 0
UNION ALL
SELECT 'month_rollup', NULL,
       strftime(o_orderdate, '%Y-%m'),
       NULL, NULL, NULL, NULL, NULL,
       count(*),
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0
FROM orders GROUP BY 3
""",
    tags=("F1", "F2", "F3", "F4", "F5"),
)
def time_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All the reference's time math in one three-family union:
    (a) timestamp→epoch seconds, calendar parts and ISO formatting
    over orders (F1-F3/F5 — flow_analyzer.py:199-204,249-260, the
    strftime dir-stamp at main.py:59); (b) the notebook's epoch-ns
    integer path over events at the µs precision both engines share
    (F4 — performance.ipynb cell 8; see plans.common.events_us),
    round-tripped through ``timestamp_micros`` for calendar parts;
    (c) the calendar-bucket rollup (orders per month, exact-cents
    totals). Session TZ is UTC on both engines so epoch seconds and
    calendar parts agree bit-for-bit."""
    nulls = lambda t: F.lit(None).cast(t)  # noqa: E731
    od = tbl(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    orders_ts = od.select(
        F.lit("orders_ts").alias("family"),
        F.col("o_orderkey").cast("string").alias("rec_id"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso"),
        S.epoch_seconds("o_orderdate").alias("epoch_sec"),
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mth"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.datediff(F.col("o_orderdate"),
                   F.lit("1995-01-01 00:00:00").cast("timestamp"))
         .cast("long").alias("days_since"),
        nulls("long").alias("n"),
        nulls("double").alias("sum_total"),
    )
    ev = events_us(spark, sf_dir).filter(F.col("user_id") == 0)
    ts = F.timestamp_micros(F.col("ts"))
    events_ns = ev.select(
        F.lit("events_ns").alias("family"),
        F.col("event_id").cast("string").alias("rec_id"),
        F.date_format(ts, "yyyy-MM-dd").alias("iso"),
        (F.col("ts") / F.lit(1e6)).alias("epoch_sec"),
        F.year(ts).cast("long").alias("yr"),
        F.month(ts).cast("long").alias("mth"),
        F.quarter(ts).cast("long").alias("qtr"),
        nulls("long").alias("days_since"),
        nulls("long").alias("n"),
        nulls("double").alias("sum_total"),
    )
    od_all = tbl(spark, sf_dir, "orders")
    month = (od_all.groupBy(F.date_format("o_orderdate", "yyyy-MM")
                            .alias("iso"))
             .agg(F.count("*").alias("n"),
                  (F.sum(F.round(F.col("o_totalprice") * 100, 0)
                         .cast("long")) / 100.0).alias("sum_total"))
             .select(F.lit("month_rollup").alias("family"),
                     nulls("string").alias("rec_id"), "iso",
                     nulls("double").alias("epoch_sec"),
                     nulls("long").alias("yr"), nulls("long").alias("mth"),
                     nulls("long").alias("qtr"),
                     nulls("long").alias("days_since"), "n", "sum_total"))
    return orders_ts.unionByName(events_ns).unionByName(month)


@query(
    "string_functions",
    oracle="""
SELECT p_brand || ':' || p_type                    AS label,
       contains(p_type, 'ECONOMY')                 AS is_economy,
       regexp_replace(p_brand, '^Brand#', 'B')     AS short_brand,
       upper(p_type)                               AS type_upper,
       substr(p_name, 1, 8)                        AS name_prefix,
       count(*)                                    AS n
FROM part
GROUP BY 1, 2, 3, 4, 5
""",
    tags=("F6", "F7", "F8"),
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String ops F6-F8 — f-string labels, substring-contains
    ("funcx" in action_url, flow_analyzer.py:209), prefix replace
    (``tgid.replace('tg_','')``, performance.ipynb cell 8)."""
    pt = tbl(spark, sf_dir, "part")
    return (pt.groupBy(
                F.concat_ws(":", "p_brand", "p_type").alias("label"),
                F.col("p_type").contains("ECONOMY").alias("is_economy"),
                F.regexp_replace("p_brand", "^Brand#", "B").alias("short_brand"),
                F.upper("p_type").alias("type_upper"),
                F.substring("p_name", 1, 8).alias("name_prefix"))
              .agg(F.count("*").alias("n")))
