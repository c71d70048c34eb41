"""URL canonicalization and domain-quota curation for web-crawl
corpora.

A crawl-derived training corpus keys almost everything on the URL:
exact-URL dedup needs a CANONICAL form (tracking params, fragments,
default ports and case noise otherwise split one page into dozens of
"distinct" URLs), and per-domain quotas stop a handful of boilerplate
mills from dominating the token budget (the C4/RefinedWeb-style
domain cap). Everything here is JVM-side column expressions —
``regexp_replace``/``regexp_extract`` chains, one window for the
quota rank — with two portability constraints so the DuckDB oracle
replays bit-for-bit:

- RE2-safe patterns only (DuckDB is RE2: no lookaheads, no
  backreferences; ``[.]`` instead of ``\\.`` so no escaping dialect
  is involved), and
- no group references in replacements (Spark spells them ``$1``,
  DuckDB ``\\1`` — a silent divergence), which is why the
  tracking-param scrub matches the bare ``key=value`` run and tidies
  separators afterwards instead of capturing the boundary. The
  scrub therefore assumes tracking keys appear as whole parameter
  names (true of real ``utm_*`` links; a hostile ``myutm_x=1`` would
  lose its tail — acceptable for curation, this is a cleaner, not a
  parser).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

#: scheme://authority prefix (authority = everything up to the first
#: /, ? or #). Group 0 of this against the raw URL is the part that
#: lowercases; the rest of the URL keeps its case.
_AUTH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"

#: Tracking parameters scrubbed by :func:`url_normalize`.
_TRACKING_RE = "(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*"

#: Multi-part public suffixes recognized by
#: :func:`registrable_domain` (a deliberately small, documented
#: subset of the public-suffix list — the full list is data, not
#: code, and would ship as a broadcast join table).
MULTIPART_SUFFIX_RE = ("([.](co|org|gov|ac)[.]uk|[.]com[.]au"
                       "|[.]co[.]jp|[.]com[.]br|[.]co[.]in)$")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_normalize(url: Column | str) -> Column:
    """Canonical URL: lowercase scheme+authority, fragment dropped,
    default ports (:80 http / :443 https) stripped, ``utm_*`` /
    ``fbclid`` / ``gclid`` tracking params scrubbed (separators
    tidied), trailing slashes removed. Path/query case is preserved —
    paths are case-sensitive on real servers; hosts are not
    (RFC 3986 §6.2.2.1). Null-safe: null in, null out; a string with
    no ``scheme://`` passes through the query/fragment/slash rules
    with nothing lowercased (no authority to find)."""
    u = _c(url)
    auth = F.regexp_extract(u, _AUTH_RE, 0)
    rest = u.substr(F.length(auth) + 1, F.length(u))
    low = F.lower(auth)
    low = F.when(low.startswith("https://"),
                 F.regexp_replace(low, ":443$", "")) \
           .when(low.startswith("http://"),
                 F.regexp_replace(low, ":80$", "")) \
           .otherwise(low)
    r = F.regexp_replace(rest, "#.*", "")
    r = F.regexp_replace(r, _TRACKING_RE, "")
    r = F.regexp_replace(r, "&&+", "&")
    r = F.regexp_replace(r, "[?]&", "?")
    r = F.regexp_replace(r, "[?&]+$", "")
    r = F.regexp_replace(r, "/+$", "")
    return F.concat(low, r)


def url_host(url: Column | str) -> Column:
    """Hostname of a (normalized or raw) URL — the authority minus
    any ``user@`` prefix and ``:port`` suffix; '' when the string has
    no ``scheme://`` authority."""
    u = _c(url)
    auth = F.regexp_extract(u, "://([^/?#]*)", 1)
    no_user = F.regexp_replace(auth, "^[^@]*@", "")
    return F.lower(F.regexp_replace(no_user, ":[0-9]+$", ""))


def registrable_domain(host: Column | str) -> Column:
    """eTLD+1 under a small documented multi-part-suffix subset
    (:data:`MULTIPART_SUFFIX_RE`): ``a.b.co.uk`` → ``b.co.uk``,
    ``x.y.example.com`` → ``example.com``; a bare single-label host
    (``localhost``) maps to itself. The real public-suffix list is
    a data file — at production scale it joins in as a broadcast
    suffix table, same shape, instead of growing this regex."""
    h = _c(host)
    three = F.regexp_extract(h, "[^.]+[.][^.]+[.][^.]+$", 0)
    two = F.regexp_extract(h, "[^.]+[.][^.]+$", 0)
    rd = F.when(h.rlike(MULTIPART_SUFFIX_RE), three).otherwise(two)
    return F.when(rd == "", h).otherwise(rd)


def domain_quota_sample(docs: DataFrame, url_col: str = "url",
                        quota: int = 2, id_col: str = "doc_id",
                        salt: str = "quota") -> DataFrame:
    """Per-domain cap: rank each doc inside its registrable domain by
    a salted md5 of its id (stable across runs/engines/partitionings
    — the same determinization as ``mixture_sample``) and keep the
    first ``quota``. Output adds ``norm_url``, ``domain``, ``rank``,
    ``kept`` to the input id.

    Scale shape: one window partitioned by the registrable domain.
    Domain cardinality is huge (no global window), but a single
    mega-domain IS a skewed partition — at 100 TB the standard cure
    applies before this op: pre-aggregate per (domain, salt-bucket)
    and cap hierarchically, or exact-rank only domains under a size
    threshold and hash-sample the giants (the rank inside a
    crawl-scale domain is curation noise anyway). The quota itself
    is exact and engine-replayable either way."""
    norm = url_normalize(F.col(url_col))
    dom = registrable_domain(url_host(norm))
    key = F.md5(F.concat(F.lit(salt + ":"),
                         F.col(id_col).cast("string")).cast("binary"))
    w = W.partitionBy("domain").orderBy("sort_key", id_col)
    return (docs.select(F.col(id_col), norm.alias("norm_url"),
                        dom.alias("domain"), key.alias("sort_key"))
            .withColumn("rank",
                        F.row_number().over(w).cast("long"))
            .withColumn("kept", F.col("rank") <= quota)
            .drop("sort_key"))
