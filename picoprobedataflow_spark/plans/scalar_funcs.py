"""Scalar-function coverage — SURVEY.md §2.8 F1-F20 exercised as
catalog queries through :mod:`picoprobedataflow_spark.functions.scalar`
(path manipulation, checksums, mime classification, timestamp/epoch
math, normalization, linear axes, string ops). Everything stays in
``pyspark.sql.functions`` / whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from picoprobedataflow_spark.functions import scalar as S
from picoprobedataflow_spark.plans.catalog import query
from picoprobedataflow_spark.plans.common import events_us, prep, tbl


@query(
    "path_functions",
    oracle="""
WITH docs AS (
  SELECT doc_id, source,
         '/data/' || source || '/doc_' || CAST(doc_id AS VARCHAR) || '.txt'
           AS path
  FROM documents WHERE doc_id < 100
)
SELECT doc_id, path,
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
            ELSE 'application/octet-stream' END      AS mime_type
FROM docs
""",
    tags=("F9", "F19", "S2"),
)
def path_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path manipulation F9 — ``Path.name`` / ``.parent`` /
    ``with_suffix`` (utils.py:60,77; tools/hyperspectral.py:127,139)
    plus mime classification F19, over synthetic dataset paths."""
    docs = (tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
            .withColumn("path", F.concat(F.lit("/data/"), F.col("source"),
                                         F.lit("/doc_"),
                                         F.col("doc_id").cast("string"),
                                         F.lit(".txt"))))
    return docs.select(
        "doc_id", "path",
        S.path_name("path").alias("file_name"),
        S.path_parent("path").alias("parent_dir"),
        S.with_suffix("path", ".json").alias("json_sidecar"),
        S.file_extension("path").alias("extension"),
        S.mime_type("path").alias("mime_type"),
    )


@query(
    "checksum_fingerprints",
    oracle="""
SELECT doc_id,
       md5(text)    AS md5_hex,
       sha256(text) AS sha256_hex,
       CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) AS hash64
FROM documents WHERE doc_id < 100
""",
    tags=("F18",),
)
def checksum_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content digests F18 — the publish doc's per-file sha256 (sha512
    also implemented but DuckDB lacks it; covered by pytest against
    hashlib) + the portable md5-based 64-bit hash the dedup operators
    build on."""
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("md5_hex"),
        S.sha256_hex("text").alias("sha256_hex"),
        S.portable_hash64(F.col("text")).alias("hash64"),
    )


@query(
    "timestamp_functions",
    oracle="""
SELECT o_orderkey,
       epoch(o_orderdate)                              AS epoch_sec,
       CAST(year(o_orderdate) AS BIGINT)               AS yr,
       CAST(month(o_orderdate) AS BIGINT)              AS mth,
       CAST(quarter(o_orderdate) AS BIGINT)            AS qtr,
       strftime(o_orderdate, '%Y-%m-%d')               AS date_str,
       CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
            AS BIGINT)                                 AS days_since_epoch_start
FROM orders WHERE o_orderkey < 1000
""",
    tags=("F1", "F2", "F3", "F5"),
)
def timestamp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp→epoch math F1-F3 (flow_analyzer.py:199-204,249-260)
    and calendar parts/formatting F5. Session TZ is UTC on both
    engines so epoch seconds agree bit-for-bit."""
    od = tbl(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return od.select(
        "o_orderkey",
        S.epoch_seconds("o_orderdate").alias("epoch_sec"),
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mth"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date_str"),
        F.datediff(F.col("o_orderdate"),
                   F.lit("1995-01-01 00:00:00").cast("timestamp"))
         .cast("long").alias("days_since_epoch_start"),
    )


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


@query(
    "normalize_uint8_by_type",
    oracle="""
WITH bounds AS (
  SELECT event_type, value,
         min(value) OVER (PARTITION BY event_type) AS lo,
         max(value) OVER (PARTITION BY event_type) AS hi
  FROM events
)
SELECT event_type,
       CAST(floor((value - lo) / (hi - lo) * 255.0 + 0.499999999) AS BIGINT)
           AS px,
       count(*) AS n
FROM bounds GROUP BY 1, 2
""",
    tags=("F10", "A14"),
)
def normalize_uint8_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame normalization F10/A14 — the reference's per-frame
    ``(x-min)/(max-min)*255 + 0.499999999`` uint8 encode
    (tools/temporal.py:30-34), with event_type standing in for the
    frame index; identical double expression on both engines."""
    prep(spark)
    ev = tbl(spark, sf_dir, "events")
    w = W.partitionBy("event_type")
    bounds = ev.select(
        "event_type", "value",
        F.min("value").over(w).alias("lo"),
        F.max("value").over(w).alias("hi"))
    px = F.floor((F.col("value") - F.col("lo"))
                 / (F.col("hi") - F.col("lo")) * 255.0 + 0.499999999)
    return (bounds.select("event_type", px.cast("long").alias("px"))
                  .groupBy("event_type", "px")
                  .agg(F.count("*").alias("n")))


@query(
    "energy_axis",
    oracle="""
SELECT CAST(i AS BIGINT) AS channel,
       (-479.0021 + 5.0 * i) / 1000.0 AS energy_kev
FROM range(64) t(i)
""",
    tags=("F11",),
)
def energy_axis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperspectral energy axis F11 — ``(x_offset + x_increment *
    arange(n))/1000`` keV (tools/hyperspectral.py:69-74) with the
    reference's observed Velox constants."""
    prep(spark)
    ch = spark.range(64).select(F.col("id").alias("channel"))
    return ch.select(
        "channel",
        S.energy_axis_kev(F.col("channel"), -479.0021, 5.0).alias("energy_kev"))


@query(
    "props_map_entries",
    oracle="""
WITH kv AS (
  SELECT props, unnest(json_keys(props)) AS key FROM events
)
SELECT key,
       count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.' || key) AS BIGINT))
            AS BIGINT) AS sum_v
FROM kv GROUP BY key
""",
    tags=("F15", "map-explode"),
)
def props_map_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15 — dynamic-key dict iteration (``for k, v in
    flow_log['details']['output'].items()``, flow_analyzer.py:244):
    schema-on-read JSON → MapType → ``explode(map_entries(...))``."""
    ev = events_us(spark, sf_dir)
    entries = ev.select(F.explode(F.map_entries(
        F.from_json("props", "map<string,bigint>"))).alias("e"))
    return (entries.select(F.col("e.key").alias("key"),
                           F.col("e.value").alias("v"))
                   .groupBy("key")
                   .agg(F.count("*").alias("n"),
                        F.sum("v").alias("sum_v")))


@query(
    "user_event_type_sets",
    oracle="""
SELECT user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_csv,
       list_sort(list(DISTINCT event_type))[1]  AS first_type,
       list_sort(list(DISTINCT event_type))[-1] AS last_type,
       CAST(len(list_sort(list(DISTINCT event_type))) AS BIGINT) AS n_types
FROM events WHERE user_id < 20
GROUP BY user_id
""",
    tags=("F16", "F17", "collect-list"),
)
def user_event_type_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16/F17 — list accumulation + ``[0]``/``[-1]`` indexing
    (flow_analyzer.py:311-319, entries[-1] at :177) as
    collect_set → sort_array → element_at."""
    ev = events_us(spark, sf_dir).filter(F.col("user_id") < 20)
    arr = F.array_sort(F.collect_set("event_type"))
    return (ev.groupBy("user_id")
              .agg(F.concat_ws(",", arr).alias("types_csv"),
                   F.element_at(arr, 1).alias("first_type"),
                   F.element_at(arr, -1).alias("last_type"),
                   F.size(arr).cast("long").alias("n_types")))


@query(
    "epoch_ns_seconds",
    oracle="""
SELECT event_id,
       epoch_us(ts) / 1e6 AS ts_sec,
       epoch_us(ts)       AS ts_us
FROM events WHERE user_id = 0
""",
    tags=("F4", "F2"),
)
def epoch_ns_seconds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-integer→seconds F4 — the notebook's ``/1e9`` on the
    transitions log (performance.ipynb cell 8), at the µs precision
    both engines share (see plans.common.events_us)."""
    ev = events_us(spark, sf_dir).filter(F.col("user_id") == 0)
    return ev.select(
        "event_id",
        (F.col("ts") / F.lit(1e6)).alias("ts_sec"),
        F.col("ts").alias("ts_us"),
    )
