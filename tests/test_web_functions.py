"""URL canonicalization / domain-quota lane
(functions/web.py): rule-by-rule pins on hand-crafted URLs, plus the
degenerate classes (null, scheme-less, bare host) the round-8/9
totality sweeps mandate for every new surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from picoprobedataflow_spark.functions import web as WB

URLS = [
    (1, "HTTPS://WWW.Example.COM:443/Path/Item1/"
        "?utm_source=feed&utm_campaign=x&id=3"),
    (2, "http://News.Example.COM:80/a?id=4&fbclid=zz#frag"),
    (3, "https://blog.example.co.uk/x/"),
    (4, "https://cdn.example.com:8080/asset"),
    (5, None),
    (6, "no-scheme/just/path/?gclid=1"),
    (7, "https://user@Sub.Deep.Example.ORG/P"),
    (8, "localhost"),
]


def _norm(spark):
    df = spark.createDataFrame(URLS, "doc_id long, url string")
    return {r.doc_id: r for r in df.select(
        "doc_id",
        WB.url_normalize("url").alias("n"),
        WB.url_host(WB.url_normalize("url")).alias("h"),
        WB.registrable_domain(WB.url_host("url")).alias("rd"))
        .collect()}


def test_url_normalize_rules(spark):
    got = _norm(spark)
    # case folds on scheme+host ONLY, :443 stripped, utm_* scrubbed,
    # ?& tidied, path case preserved
    assert got[1].n == "https://www.example.com/Path/Item1/?id=3"
    # :80 stripped for http, fbclid scrubbed, fragment dropped,
    # trailing & removed
    assert got[2].n == "http://news.example.com/a?id=4"
    # trailing slash stripped; non-default port kept
    assert got[3].n == "https://blog.example.co.uk/x"
    assert got[4].n == "https://cdn.example.com:8080/asset"
    # degenerate: null in null out; scheme-less string still gets the
    # query/fragment/slash rules with nothing lowercased
    assert got[5].n is None
    assert got[6].n == "no-scheme/just/path"
    # userinfo preserved in the url, host keeps case-folding
    assert got[7].n == "https://user@sub.deep.example.org/P"
    assert got[8].n == "localhost"


def test_url_host_and_registrable_domain(spark):
    got = _norm(spark)
    assert got[1].h == "www.example.com"
    assert got[4].h == "cdn.example.com"       # port stripped in host
    assert got[7].h == "sub.deep.example.org"  # userinfo stripped
    assert got[6].h == "" and got[8].h == ""   # no authority
    assert got[1].rd == "example.com"
    assert got[3].rd == "example.co.uk"        # multi-part suffix
    assert got[7].rd == "example.org"
    assert got[8].rd == ""                     # host of bare string


def test_domain_quota_sample_exact_and_stable(spark):
    df = spark.createDataFrame(
        [(i, f"https://d{i % 2}.example.com/p{i}") for i in range(10)],
        "doc_id long, url string")
    q1 = WB.domain_quota_sample(df, quota=3)
    rows = q1.collect()
    assert all(r.domain == "example.com" for r in rows)
    assert sorted(r.rank for r in rows) == list(range(1, 11))
    assert sum(r.kept for r in rows) == 3
    # determinism: identical output across runs and partitionings
    q2 = WB.domain_quota_sample(df.repartition(7), quota=3)
    assert sorted(map(tuple, q1.collect())) == \
        sorted(map(tuple, q2.collect()))
    # quota >= group size keeps everything
    assert WB.domain_quota_sample(df, quota=100) \
        .filter(~F.col("kept")).count() == 0
