"""URL canonicalization / domain-quota / public-suffix lane
(functions/web.py): rule-by-rule pins on hand-crafted URLs, the
boundary-safety of the round-10 tracking scrub, the skew-safe
two-phase domain quota (window ≡ hierarchical equality + the
phase-2 row bound), and the PSL broadcast-join eTLD+1."""

from __future__ import annotations

import pytest
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


def test_tracking_scrub_is_boundary_safe(spark):
    """Round-10 fix: the scrub matches whole parameter NAMES only.
    The old unanchored pattern matched fbclid/gclid/utm_ as suffixes
    of longer names (xfbclid=1 lost its value, leaving a stray x)."""
    cases = [
        (1, "https://h.com/p?xfbclid=1&a=2",
            "https://h.com/p?xfbclid=1&a=2"),
        (2, "https://h.com/p?a=1&myutm_x=2",
            "https://h.com/p?a=1&myutm_x=2"),
        (3, "https://h.com/p?fbclid=1&a=2", "https://h.com/p?a=2"),
        (4, "https://h.com/p?a=1&fbclid=2&b=3",
            "https://h.com/p?a=1&b=3"),
        (5, "https://h.com/p?utm_a=1&utm_b=2&gclid=3",
            "https://h.com/p"),
        (6, "https://h.com/p?utm_a=1&&b=2", "https://h.com/p?b=2"),
    ]
    df = spark.createDataFrame([(i, u) for i, u, _ in cases],
                               "doc_id long, url string")
    got = {r.doc_id: r.n for r in
           df.select("doc_id",
                     WB.url_normalize("url").alias("n")).collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)


def test_fqdn_trailing_dot_folds(spark):
    """Round 12: 'example.com.' is the fully-qualified spelling of
    'example.com' — url_normalize folds it in the authority (before
    a stripped default port, before a kept non-default port, and
    bare), url_host strips it, and the PSL/quota keys fuse the two
    spellings. Only a HOST-final dot folds: path dots are content."""
    cases = [
        (1, "https://Example.COM.:443/x", "https://example.com/x",
            "example.com"),
        (2, "https://example.com.:8080/x",
            "https://example.com:8080/x", "example.com"),
        (3, "http://a.b.co.uk./p", "http://a.b.co.uk/p", "a.b.co.uk"),
        (4, "https://example.com/ends.with.dot.",
            "https://example.com/ends.with.dot.", "example.com"),
        # invalid multi-dot run folds in ONE pass ('[.]+' — a
        # single-dot pattern needed two passes, breaking idempotence)
        (5, "https://example.com..:8080/x",
            "https://example.com:8080/x", "example.com"),
        (6, "https://example.com../x", "https://example.com/x",
            "example.com"),
        # round-12 review find: the port-dot fold must anchor on the
        # all-digit tail — a dotted USERINFO keeps its dot (it is an
        # identity, not an FQDN), while the host dot still folds
        (7, "https://john.:pw@example.com.:8080/a",
            "https://john.:pw@example.com:8080/a", "example.com"),
        (8, "https://john.:pw@example.com./a",
            "https://john.:pw@example.com/a", "example.com"),
        # round-12 second review find: a dot AFTER the default port
        # used to block the ':443'/':80' strip (folds now run first,
        # restoring normalize∘normalize = normalize on this shape)
        (9, "https://example.com:443./x", "https://example.com/x",
            "example.com"),
        (10, "http://example.com:80./x", "http://example.com/x",
             "example.com"),
        # ...and url_host on RAW urls with port-then-dot spellings
        (11, "https://example.com.:443./x",
             "https://example.com/x", "example.com"),
    ]
    df = spark.createDataFrame([(i, u) for i, u, _, _ in cases],
                               "doc_id long, url string")
    got = {r.doc_id: (r.n, r.h) for r in df.select(
        "doc_id", WB.url_normalize("url").alias("n"),
        WB.url_host(WB.url_normalize("url")).alias("h")).collect()}
    for i, _, wn, wh in cases:
        assert got[i] == (wn, wh), (i, got[i], wn, wh)


def test_percent_encoding_normalization(spark):
    """Round-12 RFC 3986 §6.2.2 pins: hex case uppercases, unreserved
    MARKS decode, reserved and alphanumeric escapes stay encoded
    (case-normalized), invalid escapes pass through verbatim, and an
    encoded tracking-param name decodes into the scrub's jaws."""
    cases = [
        (1, "https://h.com/p%2fq", "https://h.com/p%2Fq"),
        (2, "https://h.com/a%7eb?t=%7E", "https://h.com/a~b?t=~"),
        (3, "https://h.com/x%5f%2d%2e", "https://h.com/x_-."),
        # reserved %2F and alphanumeric %41 do NOT decode
        (4, "https://h.com/a%2Fb%41", "https://h.com/a%2Fb%41"),
        (5, "https://h.com/a%6ab", "https://h.com/a%6Ab"),
        # invalid escapes: verbatim
        (6, "https://h.com/%zz%4%", "https://h.com/%zz%4%"),
        # double-encoded stays double-encoded (%25 never decodes)
        (7, "https://h.com/a%252Fb", "https://h.com/a%252Fb"),
        # encoded tracking name decodes, then the scrub removes it
        (8, "https://h.com/p?utm%5Fsource=x&a=1",
            "https://h.com/p?a=1"),
        # invalid-escape adjacency: '%' + decoded mark, idempotent
        (9, "https://h.com/%%7e", "https://h.com/%~"),
    ]
    df = spark.createDataFrame([(i, u) for i, u, _ in cases],
                               "doc_id long, url string")
    got = {r.doc_id: (r.n, r.nn) for r in df.select(
        "doc_id", WB.url_normalize("url").alias("n"),
        WB.url_normalize(WB.url_normalize("url")).alias("nn"))
        .collect()}
    for i, _, want in cases:
        assert got[i][0] == want, (i, got[i][0], want)
        assert got[i][1] == want, ("not idempotent", i, got[i])


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


# --------------------------------------------------------- domain quota

def _quota_cols(rows):
    return sorted((r.doc_id, r.domain, r.rank, r.kept) for r in rows)


def test_domain_quota_sample_exact_and_stable(spark):
    df = spark.createDataFrame(
        [(i, f"https://d{i % 2}.example.com/p{i}") for i in range(10)],
        "doc_id long, url string")
    q1 = WB.domain_quota_sample(df, quota=3)
    rows = q1.collect()
    assert all(r.domain == "example.com" for r in rows)
    # round-10 contract: exact rank for kept docs, NULL beyond quota
    assert sorted(r.rank for r in rows if r.rank is not None) == [1, 2, 3]
    assert all((r.rank is None) == (not r.kept) for r in rows)
    assert sum(r.kept for r in rows) == 3
    # determinism: identical output across runs and partitionings
    q2 = WB.domain_quota_sample(df.repartition(7), quota=3)
    assert _quota_cols(q1.collect()) == _quota_cols(q2.collect())
    # quota >= group size keeps everything with full exact ranks
    big = WB.domain_quota_sample(df, quota=100).collect()
    assert all(r.kept for r in big)
    assert sorted(r.rank for r in big) == list(range(1, 11))


@pytest.fixture(scope="module")
def dominant_domain_docs(spark):
    """One mega-domain (180 docs), one small domain (12), plus
    malformed URLs that all collapse to the '' domain — the exact
    skew shape the hierarchical cap exists for."""
    rows = [(i, f"https://big.example.com/p{i}") for i in range(180)]
    rows += [(1000 + i, f"https://tiny.other.org/x{i}")
             for i in range(12)]
    rows += [(2000 + i, f"not-a-url-{i}") for i in range(8)]
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_domain_quota_window_equals_hierarchical(
        spark, dominant_domain_docs):
    """The two methods are output-identical on a dominant-domain
    corpus — kept set, exact kept ranks, and NULLs beyond quota —
    across several bucket counts (including n_buckets=1, the
    degenerate single-bucket case)."""
    w = WB.domain_quota_sample(dominant_domain_docs, quota=3,
                               method="window")
    wc = _quota_cols(w.collect())
    # Includes the round-12 invariance pin: n_buckets 4 ≡ 64 ≡ "auto"
    # (the knob is pure plan shape — output never depends on it).
    for nb in (1, 4, 16, 64, "auto"):
        h = WB.domain_quota_sample(dominant_domain_docs, quota=3,
                                   method="hierarchical",
                                   n_buckets=nb)
        assert _quota_cols(h.collect()) == wc, f"n_buckets={nb}"
    # per-domain kept counts respect the quota (incl. the '' domain)
    kept = {(r.domain, r.rank) for r in w.collect() if r.kept}
    doms = {d for d, _ in kept}
    assert doms == {"example.com", "other.org", ""}
    for d in doms:
        assert sorted(rk for dd, rk in kept if dd == d) == [1, 2, 3]


def test_domain_quota_phase2_row_bound(spark, dominant_domain_docs):
    """The scale assertion the verdict asked for: phase 2's exact
    re-rank partition for a mega-domain holds at most
    quota·n_buckets rows — no partition anywhere sorts the whole
    domain."""
    kept_ids = {r.doc_id for r in
                WB.domain_quota_sample(dominant_domain_docs,
                                       quota=3, method="window")
                .filter("kept").collect()}
    for quota, nb in ((3, 4), (3, 64)):  # round 12: larger nb too
        surv = WB.quota_phase1_survivors(dominant_domain_docs,
                                         quota=quota, n_buckets=nb)
        per_dom = {r.domain: r.c for r in
                   surv.groupBy("domain").agg(F.count("*").alias("c"))
                   .collect()}
        assert per_dom["example.com"] <= quota * nb
        assert max(per_dom.values()) <= quota * nb
        # and the survivor set still contains every globally-kept doc
        surv_ids = {r.doc_id for r in surv.collect()}
        assert kept_ids <= surv_ids, nb


def test_domain_quota_auto_n_buckets_sizing(spark, tmp_path):
    """n_buckets='auto' derives from the Catalyst size estimate:
    small parquet scans land on the floor (16), stat-less in-memory
    frames (huge sentinel) land on the ceiling (2^20), and the
    balanced sqrt rule sits between for mid-size estimates."""
    rows = [(i, f"https://a.example.com/p{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    p = str(tmp_path / "urls.parquet")
    df.write.mode("overwrite").parquet(p)
    small = spark.read.parquet(p)
    assert WB._auto_n_buckets(small, quota=2) == WB.QUOTA_MIN_BUCKETS
    statless = spark.createDataFrame(
        spark.sparkContext.parallelize(rows),
        "doc_id long, url string")
    assert WB._auto_n_buckets(statless, quota=2) == WB.QUOTA_MAX_BUCKETS
    # The sqrt balance point, checked against the formula directly:
    # 1 GiB estimate, quota 2 -> sqrt(2^30 / (2*128)) = 2048.
    import math
    n = math.ceil(math.sqrt((1 << 30) / (2 * WB.QUOTA_ROW_BYTES_EST)))
    assert 16 < n < WB.QUOTA_MAX_BUCKETS and n == 2048


def test_domain_quota_auto_picks_window_on_small_stats(spark, tmp_path):
    """auto = the simhash statistics rule: a small parquet scan takes
    the single window; an in-memory frame (no real stats → huge
    sentinel) takes the skew-safe hierarchical shape. Both outputs
    are identical anyway; this pins the SELECTOR via the plan (the
    hierarchical plan has two Window nodes)."""
    rows = [(i, f"https://a.example.com/p{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    p = str(tmp_path / "urls.parquet")
    df.write.mode("overwrite").parquet(p)
    small = spark.read.parquet(p)
    # LogicalRDD: no real stats -> huge sentinel -> scale-safe shape
    statless = spark.createDataFrame(
        spark.sparkContext.parallelize(rows),
        "doc_id long, url string")

    def n_windows(q):
        return q._jdf.queryExecution().optimizedPlan() \
            .toString().count("Window")

    assert n_windows(WB.domain_quota_sample(small, quota=2)) == 1
    assert n_windows(WB.domain_quota_sample(statless, quota=2)) >= 2


# ------------------------------------------------------------------ PSL

PSL_HOSTS = [
    (0, "shop1.mall.co.il", "mall.co.il"),       # regex would say co.il
    (1, "a.news.com.cn", "news.com.cn"),         # regex would say com.cn
    (2, "deep.sub.example.co.uk", "example.co.uk"),
    (3, "cdn.sample.org", "sample.org"),
    (4, "co.il", "co.il"),                       # host IS a suffix
    (5, "localhost", "localhost"),               # regex fallback
    (6, "x.unknowntld", "x.unknowntld"),         # fallback, 2 labels
    (7, "", ""),
    (8, None, None),
    # Round 12: mixed case — the op lowercases at entry (RFC 4343);
    # before the fix a raw 'Example.COM' missed every suffix.
    (9, "Shop1.MALL.co.IL", "mall.co.il"),
    # Round 12: wildcard rule *.ck (publicsuffix.org algorithm) —
    # any one label under ck is a public suffix.
    (10, "a1.x.wild.ck", "x.wild.ck"),
    (11, "foo.ck", "foo.ck"),          # host IS a wildcard suffix
    (12, "a.b.x.wild.ck", "x.wild.ck"),
    # Round 12: exception rule !www.ck — its labels ARE the domain.
    (13, "www.ck", "www.ck"),
    (14, "www.www.ck", "www.ck"),
    (15, "sub.www.ck", "www.ck"),
    # Round 12 degenerate-label battery: empty labels pass through
    # the label algebra verbatim (an empty label is not a real DNS
    # name; the op is TOTAL on it and both engines agree — these
    # pins document the contract, they do not bless the input).
    (16, "a..com", ".com"),
    (17, ".com", ".com"),
    # Trailing FQDN dot strips at entry (PSL algorithm step 1).
    (18, "com.", "com"),               # then host IS a suffix
    (19, "fqdn.example.com.", "example.com"),
]


def test_registrable_domain_psl(spark):
    hosts = spark.createDataFrame(
        [(i, h) for i, h, _ in PSL_HOSTS], "doc_id long, host string")
    got = {r.doc_id: r.domain for r in
           WB.registrable_domain_psl(hosts, WB.psl_table(spark))
           .collect()}
    for i, _, want in PSL_HOSTS:
        assert got[i] == want, (i, got[i], want)


def test_psl_beats_regex_subset(spark):
    """The exact mis-splits the PSL exists to fix: the regex subset
    does not know co.il / com.cn are public suffixes and returns the
    suffix itself as the 'registrable domain', fusing every site
    under them into one quota/dedup group."""
    hosts = spark.createDataFrame(
        [(0, "shop1.mall.co.il"), (1, "a.news.com.cn")],
        "doc_id long, host string")
    regex = {r.doc_id: r.rd for r in hosts.select(
        "doc_id", WB.registrable_domain("host").alias("rd")).collect()}
    assert regex[0] == "co.il" and regex[1] == "com.cn"  # the bug
    psl = {r.doc_id: r.domain for r in
           WB.registrable_domain_psl(hosts, WB.psl_table(spark))
           .collect()}
    assert psl[0] == "mall.co.il" and psl[1] == "news.com.cn"


def test_psl_table_from_raw_list_text(spark):
    """The production ingestion path: raw publicsuffix.org file
    content (comments, blank lines, trailing annotations, mixed
    case, wildcard + exception rules) parses into the same broadcast
    table shape, and the canonical PSL ck test vectors hold."""
    raw = """\
// ===BEGIN ICANN DOMAINS===
// ck : https://en.wikipedia.org/wiki/.ck
*.ck
!www.ck

COM
co.UK   // annotation after whitespace
"""
    tbl = WB.psl_table_from_text(spark, raw)
    got = {(r.suffix, r.is_exc) for r in tbl.collect()}
    assert got == {("*.ck", False), ("www.ck", True),
                   ("com", False), ("co.uk", False)}
    hosts = spark.createDataFrame(
        [(0, "www.www.ck"), (1, "a.b.test.ck"), (2, "x.example.com"),
         (3, "deep.sub.example.co.uk")],
        "doc_id long, host string")
    dom = {r.doc_id: r.domain for r in
           WB.registrable_domain_psl(hosts, tbl).collect()}
    assert dom == {0: "www.ck", 1: "b.test.ck", 2: "example.com",
                   3: "example.co.uk"}


def test_psl_join_is_broadcast(spark):
    hosts = spark.createDataFrame([(0, "a.example.com")],
                                  "doc_id long, host string")
    plan = (WB.registrable_domain_psl(hosts, WB.psl_table(spark))
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_punycode_hosts_through_psl_and_regex(spark):
    """Round-13 degenerate battery: punycode (xn--) labels are plain
    LDH strings — the '--' must ride the lowercase + candidate
    explode + broadcast join untouched, under both the PSL list and
    the regex fallback, at any casing."""
    hosts = spark.createDataFrame(
        [(0, "sub.xn--bcher-kva.de"),
         (1, "A.Sub.XN--BCHER-KVA.DE"),       # mixed case
         (2, "xn--bcher-kva.de"),             # already registrable
         (3, "www.example.xn--p1ai"),         # punycode TLD, no rule
         (4, "xn--bcher-kva.de.")],           # FQDN spelling
        "doc_id long, host string")
    dom = {r.doc_id: r.domain for r in
           WB.registrable_domain_psl(hosts,
                                     WB.psl_table(spark)).collect()}
    assert dom[0] == "xn--bcher-kva.de"
    assert dom[1] == "xn--bcher-kva.de"
    assert dom[2] == "xn--bcher-kva.de"
    # no 'xn--p1ai' rule in the fixture -> regex fallback, two labels
    assert dom[3] == "example.xn--p1ai"
    assert dom[4] == "xn--bcher-kva.de"
    # direct regex entry point agrees
    rd = spark.createDataFrame([("b.sub.xn--bcher-kva.de",)],
                               "host string") \
        .select(WB.registrable_domain("host").alias("d")).head().d
    assert rd == "xn--bcher-kva.de"


def test_ipv6_literal_hosts(spark):
    """Round-13 degenerate battery: bracketed IP literals through the
    whole lane. url_normalize lowercases the hex and strips only
    DEFAULT ports; url_host keeps the brackets (the :port strip needs
    an all-digit tail); registrable_domain maps ANY bracket host to
    itself — an IPv4-mapped literal CONTAINS dots, and before round
    13 the two-label extract sliced it to the nonsense key '0.1]'."""
    cases = spark.createDataFrame(
        [(0, "http://[::1]:8080/path"),
         (1, "HTTPS://[::1]:443/x"),
         (2, "HTTP://[2001:DB8::1]/y"),
         (3, "http://[::ffff:192.168.0.1]:8080/z"),
         (4, "https://u:p@[::FFFF:10.0.0.1]/q")],
        "doc_id long, url string")
    out = {r.doc_id: (r.n, r.h, r.d) for r in cases.select(
        "doc_id",
        WB.url_normalize("url").alias("n"),
        WB.url_host(WB.url_normalize("url")).alias("h"),
        WB.registrable_domain(
            WB.url_host(WB.url_normalize("url"))).alias("d"))
        .collect()}
    assert out[0] == ("http://[::1]:8080/path", "[::1]", "[::1]")
    assert out[1] == ("https://[::1]/x", "[::1]", "[::1]")
    assert out[2] == ("http://[2001:db8::1]/y",
                      "[2001:db8::1]", "[2001:db8::1]")
    assert out[3] == ("http://[::ffff:192.168.0.1]:8080/z",
                      "[::ffff:192.168.0.1]",
                      "[::ffff:192.168.0.1]")
    assert out[4] == ("https://u:p@[::ffff:10.0.0.1]/q",
                      "[::ffff:10.0.0.1]", "[::ffff:10.0.0.1]")
    # PSL path lands on the same bracket rule via its regex fallback.
    hosts = spark.createDataFrame([(0, "[::ffff:192.168.0.1]")],
                                  "doc_id long, host string")
    assert WB.registrable_domain_psl(
        hosts, WB.psl_table(spark)).head().domain \
        == "[::ffff:192.168.0.1]"


def test_userinfo_percent_escapes_and_dot_fold_scope(spark):
    """Round-13 degenerate battery: percent-escapes in the USERINFO.
    The authority is exempt from the rest-side percent pass, so a
    userinfo escape keeps its spelling except for the authority-wide
    case fold ('%2E' -> '%2e' — stable under re-normalization), it
    is never decoded into a real dot the FQDN fold could then eat,
    and the round-12 fold-scope fix holds with escapes adjacent to
    the userinfo dots: host-tail dots fold, userinfo dots survive."""
    cases = spark.createDataFrame(
        [(0, "https://User%2E.:pw@cdn.sample.org.:8080/p"),
         (1, "https://%2E%2e@example.com.:443/q"),
         (2, "http://a%7Eb@example.com:80/r?x=%7e")],
        "doc_id long, url string")
    got = {r.doc_id: r.n for r in cases.select(
        "doc_id", WB.url_normalize("url").alias("n")).collect()}
    assert got[0] == "https://user%2e.:pw@cdn.sample.org:8080/p"
    assert got[1] == "https://%2e%2e@example.com/q"
    # authority %7E keeps (case-folded); the path-side %7e decodes
    assert got[2] == "http://a%7eb@example.com/r?x=~"
    # idempotence on exactly these shapes
    renorm = {r.doc_id: r.n2 for r in cases.select(
        "doc_id",
        WB.url_normalize(WB.url_normalize("url")).alias("n2"))
        .collect()}
    assert renorm == got
    # url_host is userinfo-blind either way
    assert cases.filter("doc_id = 0").select(
        WB.url_host(WB.url_normalize("url")).alias("h")
    ).head().h == "cdn.sample.org"


def test_robots_gate_rfc9309_matching(spark):
    """RFC 9309 matching core: longest prefix prevails, specificity
    ties go to allow, no-match defaults to allow, the root rule
    matches the empty path as '/', and the host join keys on the
    canonical host (IP literals and punycode work like any other)."""
    rules = WB.robots_rules_table(spark, [
        ("example.com", "/private", False),
        ("example.com", "/private/ok", True),
        ("example.com", "/tie", True),
        ("example.com", "/tie", False),
        ("blocked.org", "/", False),
        ("[::1]", "/x", False),
    ])
    urls = spark.createDataFrame(
        [(0, "https://example.com/private/secret"),
         (1, "https://example.com/private/ok/page"),
         (2, "https://example.com/tie/page"),
         (3, "https://example.com/public"),
         (4, "https://blocked.org"),            # empty path -> '/'
         (5, "https://other.net/anything"),     # no rules at all
         (6, "http://[::1]:8080/x/y"),
         (7, "http://[::1]:8080/z")],
        "doc_id long, url string")
    got = {r.doc_id: (r.rule, r.allowed)
           for r in WB.robots_gate(urls, rules).collect()}
    assert got[0] == ("/private", False)
    assert got[1] == ("/private/ok", True)   # longer rule prevails
    assert got[2] == ("/tie", True)          # tie -> least restrictive
    assert got[3] == (None, True)            # host has rules, none match
    assert got[4] == ("/", False)            # root rule, empty path
    assert got[5] == (None, True)            # REP default
    assert got[6] == ("/x", False)
    assert got[7] == (None, True)
    # exactly one verdict row per URL
    assert WB.robots_gate(urls, rules).count() == 8
    # Round-13 review find: duplicate ids with DIFFERENT URLs must
    # each keep their own verdict (the winner window partitions by
    # the full (id, host, path) row identity, not the id alone).
    dup = spark.createDataFrame(
        [(1, "https://example.com/private/x"),
         (1, "https://example.com/public")],
        "doc_id long, url string")
    dv = sorted(((r.rule or "", r.allowed)
                 for r in WB.robots_gate(dup, rules).collect()))
    assert dv == [("", True), ("/private", False)]


def test_robots_gate_join_is_broadcast(spark):
    """The rules side is a broadcast hash join with the prefix test
    as residual condition — the corpus side never shuffles for the
    join; the only wide op is the doc-keyed winner window."""
    urls = spark.createDataFrame([(0, "https://a.com/x")],
                                 "doc_id long, url string")
    rules = WB.robots_rules_table(spark, [("a.com", "/", True)])
    plan = (WB.robots_gate(urls, rules)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan


def test_robots_txt_parse_group_resolution(spark):
    """RFC 9309 parsing + group resolution: comments and unknown
    fields ignored, consecutive User-agent lines share one group,
    the longest matching product token wins over '*', same-token
    groups merge, empty Disallow contributes no rule, and the output
    feeds robots_rules_table/robots_gate end to end."""
    raw = """\
# example robots.txt
Sitemap: https://example.com/sitemap.xml

User-agent: GoodBot
User-agent: OtherBot
Disallow: /private
Allow: /private/ok

User-agent: GoodBot-Deep
Disallow: /

User-agent: *
Disallow: /all-bots
Crawl-delay: 10

User-agent: GoodBot
Disallow: /extra

User-agent: EmptyBot
Disallow:
"""
    # exact product token: both GoodBot groups merge; '*' loses
    got = WB.robots_txt_parse(raw, "GoodBot", "example.com")
    assert sorted(got) == [
        ("example.com", "/extra", False),
        ("example.com", "/private", False),
        ("example.com", "/private/ok", True)]
    # longer token is more specific: GoodBot-Deep beats GoodBot
    deep = WB.robots_txt_parse(raw, "GoodBot-Deep", "example.com")
    assert deep == [("example.com", "/", False)]
    # unknown crawler: the '*' group
    other = WB.robots_txt_parse(raw, "Stranger", "example.com")
    assert other == [("example.com", "/all-bots", False)]
    # empty Disallow = allow everything = zero rules for EmptyBot...
    # but '*' is still the best match for it? No: 'EmptyBot' has an
    # exact group (specificity 8 > -1), whose only rule is void.
    assert WB.robots_txt_parse(raw, "EmptyBot", "example.com") == []
    # no groups at all -> no rules
    assert WB.robots_txt_parse("# nothing here", "GoodBot",
                               "example.com") == []
    # round-13 review find: a malformed EMPTY User-agent token must
    # be ignored, not prefix-match every crawler at specificity 0
    # (which silently beat the explicit '*' group).
    malformed = ("User-agent:\nDisallow: /secret\n\n"
                 "User-agent: *\nDisallow: /all\n")
    assert WB.robots_txt_parse(malformed, "AnyBot", "h.com") == [
        ("h.com", "/all", False)]
    # end to end: parsed rules drive the gate
    rules = WB.robots_rules_table(
        spark, WB.robots_txt_parse(raw, "GoodBot", "example.com"))
    urls = spark.createDataFrame(
        [(0, "https://example.com/private/ok/x"),
         (1, "https://example.com/private/no"),
         (2, "https://example.com/all-bots")],  # '*' rule NOT ours
        "doc_id long, url string")
    got2 = {r.doc_id: r.allowed
            for r in WB.robots_gate(urls, rules).collect()}
    assert got2 == {0: True, 1: False, 2: True}


def test_robots_txt_parse_total_on_arbitrary_text():
    """Property: the parser is TOTAL on arbitrary text — never
    raises, always returns (domain, path, bool) triples for the
    given domain, and is deterministic."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet=st.characters(
        blacklist_categories=("Cs",)), max_size=400))
    def prop(text):
        out = WB.robots_txt_parse(text, "AnyBot", "h.com")
        assert out == WB.robots_txt_parse(text, "AnyBot", "h.com")
        for dom, path, allow in out:
            assert dom == "h.com" and isinstance(path, str) and path
            assert isinstance(allow, bool)

    prop()


def test_domain_quota_order_col_ranking(spark):
    """order_col ranks the quota by SCORE descending through BOTH
    methods identically — NULL scores rank last, id breaks ties —
    and an astronomically-large Catalyst estimate no longer
    overflows the auto bucket sizing (found live via the crawl
    flow's join-derived input)."""
    from picoprobedataflow_spark.functions.web import (
        _auto_n_buckets, domain_quota_sample)

    rows = [(1, "https://a.com/1", 0.9), (2, "https://a.com/2", 0.5),
            (3, "https://a.com/3", 0.7), (4, "https://a.com/4", None),
            (5, "https://b.org/x", 0.1)]
    docs = spark.createDataFrame(rows,
                                 "doc_id long, url string, s double")
    outs = {}
    for m in ("window", "hierarchical"):
        out = domain_quota_sample(docs, quota=2, method=m,
                                  n_buckets=8, order_col="s")
        outs[m] = sorted((r.doc_id, r.rank, r.kept)
                         for r in out.collect())
    assert outs["window"] == outs["hierarchical"]
    kept = {d: (r, k) for d, r, k in outs["window"]}
    # a.com: scores 0.9 > 0.7 > 0.5 > NULL — top-2 kept, ranked
    assert kept[1] == (1, True) and kept[3] == (2, True)
    assert kept[2] == (None, False) and kept[4] == (None, False)
    assert kept[5] == (1, True)   # b.org under quota
    # overflow guard: a beyond-float-range estimate saturates to the
    # bucket cap instead of raising
    assert _auto_n_buckets(docs, 2, est=10 ** 320) == 1 << 20


def test_sitemap_urls_extraction(spark):
    """Sitemap <loc> extraction: urlset and sitemap-index files both
    yield their entries, whitespace trims, XML entities decode,
    URLs normalize, loc-less or NULL content contributes nothing."""
    from picoprobedataflow_spark.functions.web import sitemap_urls

    urlset = ("<?xml version='1.0'?><urlset>"
              "<url><loc> https://A.com/page?a=1&amp;b=2 </loc></url>"
              "<url><loc>\nhttps://a.com/two#frag\n</loc></url>"
              "</urlset>")
    index = ("<sitemapindex><sitemap>"
             "<loc>https://a.com/sitemap2.xml</loc>"
             "</sitemap></sitemapindex>")
    docs = spark.createDataFrame(
        [("a.com", urlset), ("a.com", index),
         ("b.org", "<urlset></urlset>"), ("c.net", None)],
        "host string, content string")
    got = {(r.host, r.url) for r in sitemap_urls(docs).collect()}
    assert got == {
        ("a.com", "https://a.com/page?a=1&b=2"),   # entity + case
        ("a.com", "https://a.com/two"),            # fragment dropped
        ("a.com", "https://a.com/sitemap2.xml"),   # index chains
    }
    # entity decode ORDER (review find, reproduced live): '&amp;lt;'
    # is the legal escaping of a literal '&lt;' in the URL — decoding
    # '&amp;' first would double-decode it to '<'
    tricky = spark.createDataFrame(
        [("t.com", "<urlset><url><loc>"
          "https://t.com/?q=x&amp;lt;y</loc></url></urlset>")],
        "host string, content string")
    assert [r.url for r in sitemap_urls(tricky).collect()] == \
        ["https://t.com/?q=x&lt;y"]


def test_robots_txt_parse_bom_and_crlf():
    """Round-14 degenerate battery: a UTF-8 BOM glued to the first
    line must not corrupt its field name (pre-fix the whole first
    group silently dropped), and CRLF / bare-CR files parse exactly
    like LF."""
    from picoprobedataflow_spark.functions.web import \
        robots_txt_parse

    body = ("User-agent: probe\r\n"
            "Disallow: /private\r\n"
            "Allow: /private/ok\r\n")
    want = [("h.example", "/private", False),
            ("h.example", "/private/ok", True)]
    assert robots_txt_parse("﻿" + body, "probe-1",
                            "h.example") == want
    assert robots_txt_parse(body, "probe-1", "h.example") == want
    assert robots_txt_parse(body.replace("\r\n", "\n"), "probe-1",
                            "h.example") == want
    # BOM on a LATER line is part of that line's field name and the
    # line is ignored as unknown — only the file-leading BOM strips
    noisy = "User-agent: *\nDisallow: /a\n﻿Disallow: /b\n"
    assert robots_txt_parse(noisy, "anybot", "h.example") == [
        ("h.example", "/a", False)]


def test_robots_rules_percent_equivalence(spark):
    """RFC 9309 §2.2.2 percent-decode-before-comparison, restricted
    to the engine's documented idempotent subset: a rule authored
    with a lowercase escape or an encoded unreserved mark matches
    the canonicalized URL it denotes — both sides normalize through
    the SAME projection. The Python rule-side twin is pinned equal
    to the Column version on an adversarial battery."""
    from pyspark.sql import functions as F

    from picoprobedataflow_spark.functions.web import (
        _pct_normalize_py, _percent_normalize, robots_gate,
        robots_rules_table, url_normalize)

    battery = ["/p%2dq", "/p%2Dq", "/a%2fb", "/a%2Fb", "/x%7e",
               "/x%7E", "/%zz", "/%4", "/trailing%", "/plain",
               "/%2e%2e/up", "/mix%5fand%2Fkeep", "%", "", "/%2541"]
    got = (spark.createDataFrame([(s,) for s in battery], "s string")
           .select(_percent_normalize(F.col("s")).alias("n"))
           .collect())
    for s, r in zip(battery, got):
        assert r.n == _pct_normalize_py(s), s

    rules = robots_rules_table(spark, [
        ("h.example", "/p%2dq", False),      # means /p-q
        ("h.example", "/a%2fb", False),      # hex case normalizes
        ("h.example", "/t%7euser", False),   # means /t~user
    ])
    urls = spark.createDataFrame(
        [(0, "http://h.example/p-q/page"),
         (1, "http://h.example/a%2Fb/x"),
         (2, "http://h.example/t%7Euser/site"),
         (3, "http://h.example/p-other")],
        "doc_id long, url string")
    u = urls.select("doc_id", url_normalize("url").alias("url"))
    got = {r.doc_id: r.allowed
           for r in robots_gate(u, rules).collect()}
    assert got == {0: False, 1: False, 2: False, 3: True}


def test_sitemap_self_reference_cycle(spark):
    """A sitemap index whose <loc> points at ITSELF (or at a sibling
    that points back) is inert: the extractor emits the URL once per
    containing document — it fetches nothing, so no loop — and the
    frontier composition drops already-fetched sitemap URLs through
    the fetched anti-join, so the cycle cannot re-enter the
    next-fetch list in any later epoch."""
    from pyspark.sql import functions as F

    from picoprobedataflow_spark.flows.crawl import \
        prioritize_frontier
    from picoprobedataflow_spark.functions.web import sitemap_urls

    self_ref = ("<sitemapindex><sitemap>"
                "<loc>https://h.example/sitemap.xml</loc>"
                "</sitemap></sitemapindex>")
    mutual_a = ("<sitemapindex><sitemap>"
                "<loc>https://h.example/sitemap-b.xml</loc>"
                "</sitemap></sitemapindex>")
    mutual_b = ("<sitemapindex><sitemap>"
                "<loc>https://h.example/sitemap-a.xml</loc>"
                "</sitemap><url>"
                "<loc>https://h.example/real-page</loc>"
                "</url></sitemapindex>")
    fetched_content = spark.createDataFrame(
        [("h.example", self_ref, "https://h.example/sitemap.xml"),
         ("h.example", mutual_a, "https://h.example/sitemap-a.xml"),
         ("h.example", mutual_b, "https://h.example/sitemap-b.xml")],
        "host string, content string, fetch_url string")
    inv = sitemap_urls(fetched_content)
    # one row per containing doc — the self-loc emits exactly once
    assert inv.count() == 4

    links = inv.select(F.col("url").alias("src_url"),
                       F.col("url").alias("dst_url")).limit(0) \
        .unionByName(spark.createDataFrame(
            [("https://h.example/", u.url) for u in inv.collect()],
            "src_url string, dst_url string"))
    rules = spark.createDataFrame(
        [], "domain string, rule_path string, allow boolean")
    fetched = fetched_content.select(
        F.col("fetch_url").alias("url")).unionByName(
        spark.createDataFrame([("https://h.example/",)],
                              "url string"))
    out = prioritize_frontier(links, rules, quota=10, top_n=10,
                              n_iter=2, fetched=fetched)
    urls = {r.url for r in out.collect()}
    # every already-fetched sitemap (incl. the self-reference) is
    # excluded; the real page is the only new fetch candidate
    assert urls == {"https://h.example/real-page"}


def test_robots_gate_rfc9309_wildcards(spark):
    """RFC 9309 §2.2.3 wildcard matching (round 14): '*' spans any
    character run, a trailing '$' anchors the end, inner '$' and
    every regex metachar are literal, and wildcard-free rules keep
    the exact prefix semantics (specificity still by rule length,
    ties to allow)."""
    from picoprobedataflow_spark.functions.web import (
        robots_gate, robots_rules_table)

    rules = robots_rules_table(spark, [
        ("h.example", "/fish*", False),
        ("h.example", "/*.php$", False),
        ("h.example", "/fish*.cgi", False),
        ("h.example", "/lit(x)", False),       # metachars literal
        ("h.example", "/a$b", False),          # inner $ literal
        ("h.example", "/$", False),            # matches root only
        ("w.example", "/p", False),
        ("w.example", "/p/ok*", True),         # wildcard allow wins
    ])
    urls = spark.createDataFrame(
        [(0, "http://h.example/fish"),
         (1, "http://h.example/fishheads/x"),
         (2, "http://h.example/filename.php"),
         (3, "http://h.example/filename.php5"),
         (4, "http://h.example/filename.php/"),
         (5, "http://h.example/fishheads/catfish.cgi"),
         (6, "http://h.example/lit(x)/page"),
         (7, "http://h.example/a$b/c"),
         (8, "http://h.example/"),
         (9, "http://h.example/other"),
         (10, "http://w.example/p/ok-page"),
         (11, "http://w.example/p/no")],
        "doc_id long, url string")
    got = {r.doc_id: (r.rule, r.allowed)
           for r in robots_gate(urls, rules).collect()}
    assert got[0] == ("/fish*", False)
    assert got[1] == ("/fish*", False)
    assert got[2] == ("/*.php$", False)
    assert got[3][1] is True       # .php5 not anchored-matched
    assert got[4][1] is True       # trailing slash defeats $
    assert got[5] == ("/fish*.cgi", False)
    assert got[6] == ("/lit(x)", False)
    assert got[7] == ("/a$b", False)
    assert got[8] == ("/$", False)
    assert got[9] == (None, True)
    assert got[10] == ("/p/ok*", True)   # longer rule beats /p
    assert got[11] == ("/p", False)


def test_robots_gate_raw_url_percent_paths(spark):
    """Round-15 ADVICE fix: robots_gate percent-normalizes the URL
    path itself, so a caller feeding RAW (non-url_normalize'd) URLs
    still gets two-sided comparison — a rule authored '/p%2dq'
    (stored normalized '/p-q') matches the raw path '/p%2dq'. Before
    the fix the disallow silently stopped applying (REP
    default-allow), the bad direction for a compliance gate."""
    from picoprobedataflow_spark.functions.web import (
        robots_gate, robots_rules_table)

    rules = robots_rules_table(spark, [
        ("h.example", "/p%2dq", False),
        ("h.example", "/t%7Euser", False),
    ])
    raw = spark.createDataFrame(
        [(0, "http://h.example/p%2dq/page"),   # raw escape, lower hex
         (1, "http://h.example/p-q/page"),     # decoded form
         (2, "http://h.example/t%7euser"),     # raw escape
         (3, "http://h.example/p%2Fq")],       # %2F does NOT decode
        "doc_id long, url string")
    got = {r.doc_id: r.allowed
           for r in robots_gate(raw, rules).collect()}
    assert got == {0: False, 1: False, 2: False, 3: True}


def test_robots_wildcard_rules_with_percent_escapes(spark):
    """RFC 9309 wildcards × percent-escapes (round-15 degenerate
    battery): '*' is matched BEFORE any escape decoding question
    arises — '%2A' is NOT in the idempotent decode subset, so a rule
    containing '%2a' normalizes its HEX CASE only and matches the
    literal three chars '%2A', never acting as a wildcard; a decoded
    mark inside a wild rule ('/p%2d*') normalizes to '/p-*' and
    matches raw or canonical paths alike."""
    from picoprobedataflow_spark.functions.web import (
        robots_gate, robots_rules_table)

    rules = robots_rules_table(spark, [
        ("h.example", "/d%2a*e$", False),   # literal %2A then wild *
        ("h.example", "/p%2d*", False),     # decodes to /p-*
    ])
    urls = spark.createDataFrame(
        [(0, "http://h.example/d%2Axxe"),   # matches literal %2A + *e$
         (1, "http://h.example/dxxe"),      # no literal %2A -> allowed
         (2, "http://h.example/p%2dq"),     # raw escape, wild suffix
         (3, "http://h.example/p-anything"),
         (4, "http://h.example/q-other")],
        "doc_id long, url string")
    got = {r.doc_id: r.allowed
           for r in robots_gate(urls, rules).collect()}
    assert got == {0: False, 1: True, 2: False, 3: False, 4: True}


def test_robots_gate_hand_built_rules_frame_normalizes(spark):
    """Round-15 review find: a caller that hand-builds the rules
    DataFrame (bypassing robots_rules_table — e.g. rules loaded from
    parquet) with RAW percent-escapes must still match: robots_gate
    normalizes rule paths itself, so both sides of the prefix
    compare are canonical regardless of which constructor produced
    the frame."""
    from picoprobedataflow_spark.functions.web import robots_gate

    raw_rules = spark.createDataFrame(
        [("h.example", "/p%2dq", False),     # raw escape in the rule
         ("h.example", "/w%2d*", False)],    # raw escape, wild rule
        "domain string, rule_path string, allow boolean")
    urls = spark.createDataFrame(
        [(0, "http://h.example/p%2dq/x"),    # raw URL
         (1, "http://h.example/p-q/x"),      # canonical URL
         (2, "http://h.example/w-anything"),
         (3, "http://h.example/other")],
        "doc_id long, url string")
    got = {r.doc_id: r.allowed
           for r in robots_gate(urls, raw_rules).collect()}
    assert got == {0: False, 1: False, 2: False, 3: True}


def test_robots_gate_rule_output_is_caller_verbatim(spark):
    """Round-16 ADVICE fix: the `rule` output column returns the
    winning rule's path EXACTLY as the caller spelled it — matching
    and specificity ranking happen on a private percent-normalized
    column, so a caller joining verdicts back to a hand-built rules
    frame by its original raw-escape path round-trips. Two raw
    spellings of one normalized rule tie-break deterministically on
    the raw string."""
    from picoprobedataflow_spark.functions.web import robots_gate

    raw_rules = spark.createDataFrame(
        [("h.example", "/p%2dq", False),      # means /p-q
         ("h.example", "/p%2Dq/deep", False)],  # means /p-q/deep
        "domain string, rule_path string, allow boolean")
    urls = spark.createDataFrame(
        [(0, "http://h.example/p-q/deep/x"),
         (1, "http://h.example/p-q/x"),
         (2, "http://h.example/other")],
        "doc_id long, url string")
    got = {r.doc_id: (r.rule, r.allowed)
           for r in robots_gate(urls, raw_rules).collect()}
    # the winner's path comes back in the caller's raw spelling,
    # never the normalized '/p-q…' form
    assert got[0] == ("/p%2Dq/deep", False)
    assert got[1] == ("/p%2dq", False)
    assert got[2] == (None, True)

    # two raw spellings of ONE normalized rule: ranking sees equal
    # specificity and equal allow; the raw string breaks the tie
    dup = spark.createDataFrame(
        [("h.example", "/p%2dq", False),
         ("h.example", "/p%2Dq", False)],
        "domain string, rule_path string, allow boolean")
    one = robots_gate(
        spark.createDataFrame([(0, "http://h.example/p-q/x")],
                              "doc_id long, url string"),
        dup).collect()
    assert len(one) == 1
    assert one[0].rule == "/p%2Dq"  # '%2D' < '%2d' lexicographically
    assert one[0].allowed is False
