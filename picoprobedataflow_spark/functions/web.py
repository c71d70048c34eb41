"""URL canonicalization and domain-quota curation for web-crawl
corpora.

A crawl-derived training corpus keys almost everything on the URL:
exact-URL dedup needs a CANONICAL form (tracking params, fragments,
default ports and case noise otherwise split one page into dozens of
"distinct" URLs), and per-domain quotas stop a handful of boilerplate
mills from dominating the token budget (the C4/RefinedWeb-style
domain cap). Everything here is JVM-side column expressions —
``regexp_replace``/``regexp_extract`` chains, windows for the quota
rank, one broadcast join for the public-suffix table — with two
portability constraints so the DuckDB oracle replays bit-for-bit:

- RE2-safe patterns only (DuckDB is RE2: no lookaheads, no
  backreferences; ``[.]`` instead of ``\\.`` so no escaping dialect
  is involved), and
- group references in replacements only where no group-free
  formulation exists (ONE site: the host-dot-before-kept-port fold,
  ``[.]+(:[0-9]+)$`` — RE2 has no lookbehind and an unanchored
  ``[.]+:`` also fired inside the userinfo). Spark spells the
  reference ``$1``, DuckDB ``\\1`` — a silent-divergence hazard, so
  every such site MUST be hash-gated by a planted family row (the
  dotted-port authority in ``_SYNTH_URL_SQL``), and everything else
  stays group-free — which is why the
  tracking-param scrub is three anchored passes (``&``-led params
  removed whole, ``?``-led params removed with their trailing ``&``
  folded back into ``?``, ``?``-led tail params removed) instead of
  one capture-and-rewrite. Each pass consumes its own separator, so
  the scrub is boundary-safe: ``xfbclid=1`` / ``myutm_x=1`` are NOT
  tracking params and pass through untouched (round-10 fix — the old
  unanchored pattern matched them as suffixes and ate their values).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

#: scheme://authority prefix (authority = everything up to the first
#: /, ? or #). Group 0 of this against the raw URL is the part that
#: lowercases; the rest of the URL keeps its case.
_AUTH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"

#: Tracking parameter NAMES scrubbed by :func:`url_normalize`. Always
#: used with an explicit ``[?&]`` separator anchor on the left and a
#: ``=`` on the right, so only whole parameter names match.
_TRACKING_NAMES = "(utm_[A-Za-z0-9_]*|fbclid|gclid)"

#: Multi-part public suffixes recognized by the regex fallback
#: :func:`registrable_domain` (a deliberately small, documented
#: subset of the public-suffix list — the full list is data, not
#: code, and joins in via :func:`registrable_domain_psl`).
MULTIPART_SUFFIX_RE = ("([.](co|org|gov|ac)[.]uk|[.]com[.]au"
                       "|[.]co[.]jp|[.]com[.]br|[.]co[.]in)$")

#: Public-suffix fixture for :func:`registrable_domain_psl` — a small
#: deterministic slice of the real PSL (publicsuffix.org), including
#: the multi-part suffixes the regex subset mis-splits (``co.il``,
#: ``com.cn``). The production deployment swaps in the full ~10k-row
#: list; the JOIN SHAPE (broadcast suffix table, longest match) is
#: identical at any list size.
DEFAULT_PSL_SUFFIXES = (
    "com", "org", "net", "io", "edu", "gov", "info",
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk",
    "jp", "co.jp", "ne.jp",
    "au", "com.au", "org.au",
    "br", "com.br",
    "in", "co.in",
    "il", "co.il", "org.il", "ac.il",
    "cn", "com.cn", "net.cn", "org.cn",
    "de", "fr",
    # Round 12: the rule kinds that make the real publicsuffix.org
    # list non-trivial — a WILDCARD rule (every label directly under
    # ck is a public suffix; this is the real list's `*.ck`) and its
    # EXCEPTION (`!www.ck`: www.ck is NOT a public suffix despite the
    # wildcard — it is itself a registrable domain).
    "*.ck", "!www.ck",
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


#: Percent-escapes DECODED by :func:`url_normalize`: the unreserved
#: MARKS (RFC 3986 §2.3) only — deliberately NOT the unreserved
#: alphanumerics. Decoding a hex-digit character ('%34' → '4') can
#: re-form a brand-new escape after a stray '%' from an invalid
#: sequence ('%%34%31' → '%41' → 'A' on a second pass), which breaks
#: the idempotence projection the property suite pins
#: (test_url_normalize_idempotent) and URL-keyed dedup relies on.
#: None of the four marks is a hex digit, so this decode set can
#: never create an escape and the pass stays a projection.
#: Alphanumeric escapes are case-normalized instead ('%6a' → '%6A'),
#: so equivalent encodings still share one dedup key.
_PCT_DECODE = (("%2D", "-"), ("%2E", "."), ("%5F", "_"), ("%7E", "~"))


def _pct_normalize_py(s: str) -> str:
    """Python twin of :func:`_percent_normalize` for driver-side
    inputs (robots rule paths at table-build time): valid escapes'
    hex uppercases, the four unreserved marks decode, invalid
    escapes pass through verbatim. Kept in lockstep with the Column
    version (equivalence pinned in tests/test_web_functions.py)."""
    if "%" not in s:
        return s
    pieces = s.split("%")
    out = [pieces[0]]
    for x in pieces[1:]:
        if len(x) >= 2 and all(c in "0123456789abcdefABCDEF"
                               for c in x[:2]):
            out.append("%" + x[:2].upper() + x[2:])
        else:
            out.append("%" + x)
    fixed = "".join(out)
    for hx, ch in _PCT_DECODE:
        fixed = fixed.replace(hx, ch)
    return fixed


def _percent_normalize(r: Column) -> Column:
    """RFC 3986 §6.2.2 percent-encoding normalization, RE2-safely and
    DuckDB-replayably: every valid escape's hex uppercases ('%2f' →
    '%2F' — hex case is semantically irrelevant, §2.1) and the
    unreserved-mark escapes decode (:data:`_PCT_DECODE`). Invalid
    escapes ('%zz', '%4', trailing '%') pass through verbatim. The
    split-on-'%' + indexed transform is the no-group-reference trick:
    each piece after the first starts with what followed a '%', so
    its first two chars are the escape's hex iff they ARE hex —
    DuckDB replays the identical ``string_split`` +
    ``list_transform((x, i) -> ...)``. Guarded by ``contains('%')``
    so the overwhelmingly common escape-free URL pays one substring
    scan and keeps null-in-null-out (``concat_ws`` would turn a null
    split into '')."""
    pieces = F.split(r, "%", -1)
    fixed = F.concat_ws("", F.transform(
        pieces,
        lambda x, i: F.when(i == 0, x).otherwise(
            F.when(x.substr(1, 2).rlike("^[0-9a-fA-F]{2}$"),
                   F.concat(F.lit("%"), F.upper(x.substr(1, 2)),
                            x.substr(F.lit(3), F.length(x))))
             .otherwise(F.concat(F.lit("%"), x)))))
    for hx, ch in _PCT_DECODE:
        fixed = F.replace(fixed, F.lit(hx), F.lit(ch))
    return F.when(r.contains("%"), fixed).otherwise(r)


def url_normalize(url: Column | str) -> Column:
    """Canonical URL: lowercase scheme+authority, fragment dropped,
    default ports (:80 http / :443 https) stripped, ``utm_*`` /
    ``fbclid`` / ``gclid`` tracking params scrubbed (separators
    tidied), trailing slashes removed. Path/query case is preserved —
    paths are case-sensitive on real servers; hosts are not
    (RFC 3986 §6.2.2.1). Null-safe: null in, null out; a string with
    no ``scheme://`` passes through the query/fragment/slash rules
    with nothing lowercased (no authority to find).

    Contract notes (pinned in tests/test_degenerate_inputs.py):
    userinfo case-folds WITH the authority (this is a curation key,
    not a credential store); bracketed IPv6 hosts keep their brackets
    and their default port strips like any other (``[::1]:443`` under
    https → ``[::1]``); a literal ``&fbclid=...`` inside the PATH is
    scrubbed too (the scrub is a cleaner, not a URL parser — it does
    not know where the query starts).

    Percent-encoding (round 12, RFC 3986 §6.2.2): valid escapes'
    hex uppercases ('%2f' → '%2F') and the unreserved MARKS decode
    ('%7E' → '~'; see :data:`_PCT_DECODE` for why alphanumeric
    escapes are case-normalized but not decoded); invalid escapes
    pass through verbatim.
    """
    u = _c(url)
    auth = F.regexp_extract(u, _AUTH_RE, 0)
    rest = u.substr(F.length(auth) + 1, F.length(u))
    # Trailing FQDN dot folds (round 12): 'example.com.' is the
    # fully-qualified spelling of 'example.com' — two passes because
    # the dot may sit before a kept non-default port. The port pass
    # anchors on an all-digit tail: a bare '[.]+:' fold also fired
    # inside the USERINFO ('john.:pw@host' lost its dot, conflating
    # two identities under one curation key — round-12 review find).
    # Folds run BEFORE the default-port strip: in the old order a
    # dot AFTER the port ('host:443.') blocked the ':443$' strip and
    # broke normalize∘normalize = normalize (second review find).
    low = F.lower(auth)
    low = F.regexp_replace(F.regexp_replace(low, "[.]+$", ""),
                           "[.]+(:[0-9]+)$", "$1")
    low = F.when(low.startswith("https://"),
                 F.regexp_replace(low, ":443$", "")) \
           .when(low.startswith("http://"),
                 F.regexp_replace(low, ":80$", "")) \
           .otherwise(low)
    r = F.regexp_replace(rest, "#.*", "")
    # Percent-encoding normalization (round 12) runs after the
    # fragment drop and BEFORE the tracking scrub, so an encoded
    # tracking-param mark ('%5Futm' is not, but 'utm%5Fsource' →
    # 'utm_source' is) is scrubbed under its canonical spelling.
    # The authority part is exempt: escapes are not legal in
    # hostnames (IDN is punycode), and lowercasing already
    # normalized its case.
    r = _percent_normalize(r)
    # Boundary-safe tracking scrub: each pass anchors the parameter
    # name to its own separator. (1) '&'-led params vanish with their
    # '&'; (2) a '?'-led param followed by more params donates its
    # '?' to the successor; (3) a '?'-led tail param vanishes with
    # its '?'. Spark regexp_replace is always global.
    r = F.regexp_replace(r, f"&{_TRACKING_NAMES}=[^&#]*", "")
    r = F.regexp_replace(r, f"[?]{_TRACKING_NAMES}=[^&#]*&", "?")
    r = F.regexp_replace(r, f"[?]{_TRACKING_NAMES}=[^&#]*$", "")
    r = F.regexp_replace(r, "&&+", "&")
    r = F.regexp_replace(r, "[?]&", "?")
    # ONE tail-cleanup class, not sequential '[?&]+$' then '/+$':
    # the sequential passes were order-dependent ('p?&/' stripped
    # the slash but left the '?', so normalize∘normalize ≠
    # normalize — hypothesis-found, round 12).
    r = F.regexp_replace(r, "[?&/]+$", "")
    return F.concat(low, r)


def url_host(url: Column | str) -> Column:
    """Hostname of a (normalized or raw) URL — the authority minus
    any ``user[:pass]@`` prefix and ``:port`` suffix; '' when the
    string has no ``scheme://`` authority. A bracketed IPv6 host
    stays bracketed (``http://[::1]:8080/`` → ``[::1]``): the
    ``:port`` strip only fires on an all-digit tail, which a
    bracket-terminated IP-literal never has. Un-bracketed IPv6 is
    not a legal URL authority and gets no special handling. A single
    trailing FQDN dot strips (round 12 — ``example.com.`` is the
    fully-qualified spelling of ``example.com``; leaving it split
    one origin into two quota/dedup keys and matched the PSL path's
    entry strip)."""
    u = _c(url)
    auth = F.regexp_extract(u, "://([^/?#]*)", 1)
    no_user = F.regexp_replace(auth, "^[^@]*@", "")
    # Dot strip runs BEFORE the port strip too: on a raw
    # 'example.com:443.' the ':[0-9]+$' pattern never fired (the
    # string ends with '.'), leaving the port inside the returned
    # host (round-12 review find) — and again AFTER, for the
    # 'example.com.:443' spelling.
    return F.lower(F.regexp_replace(F.regexp_replace(
        F.regexp_replace(no_user, "[.]+$", ""),
        ":[0-9]+$", ""), "[.]+$", ""))


def registrable_domain(host: Column | str) -> Column:
    """eTLD+1 under a small documented multi-part-suffix subset
    (:data:`MULTIPART_SUFFIX_RE`): ``a.b.co.uk`` → ``b.co.uk``,
    ``x.y.example.com`` → ``example.com``; a bare single-label host
    (``localhost``) maps to itself. The real public-suffix list is
    a data file — :func:`registrable_domain_psl` joins it in as a
    broadcast suffix table, same semantics, list-driven. A trailing
    FQDN dot strips at entry (round-12 review find: both label
    regexes require a non-dot final char, so 'example.com.' matched
    NEITHER and fell through verbatim — the PSL path and url_host
    already stripped it, leaving this direct entry point the one
    spelling-splitter in the lane). A bracketed IP-LITERAL host maps
    to itself (round-13 degenerate find: ``[::1]`` already fell
    through dot-less, but an IPv4-mapped ``[::ffff:192.168.0.1]``
    CONTAINS dots, and the two-label extract sliced it to the
    nonsense key ``0.1]`` — IP literals have no registrable domain,
    per the PSL algorithm they are their own origin; this is also
    the fallback :func:`registrable_domain_psl` lands on, so the
    bracket rule holds lane-wide from one site)."""
    h = F.regexp_replace(_c(host), "[.]+$", "")
    three = F.regexp_extract(h, "[^.]+[.][^.]+[.][^.]+$", 0)
    two = F.regexp_extract(h, "[^.]+[.][^.]+$", 0)
    rd = F.when(h.rlike(MULTIPART_SUFFIX_RE), three).otherwise(two)
    return F.when(h.startswith("["), h) \
            .when(rd == "", h).otherwise(rd)


def psl_table(spark, suffixes=DEFAULT_PSL_SUFFIXES) -> DataFrame:
    """The public-suffix list as a DataFrame ``(suffix, is_exc)`` —
    the broadcast side of :func:`registrable_domain_psl`. Rules use
    publicsuffix.org syntax: plain suffixes match exactly, ``*.ck``
    matches any one label in the ``*`` position (kept verbatim —
    the candidate side generates a matching ``*.``-shape), and
    ``!www.ck`` is an exception (stored with the ``!`` stripped,
    flagged ``is_exc``). Pass the full publicsuffix.org list here in
    production; the default is the documented fixture
    :data:`DEFAULT_PSL_SUFFIXES`."""
    rows = [(s[1:], True) if s.startswith("!") else (s, False)
            for s in suffixes]
    return spark.createDataFrame(rows, "suffix string, is_exc boolean")


def psl_table_from_text(spark, text: str) -> DataFrame:
    """:func:`psl_table` from RAW publicsuffix.org file content — the
    production path: fetch https://publicsuffix.org/list/ once,
    feed the bytes verbatim. Per the spec, rules are each line's
    first whitespace-delimited token; blank lines and ``//`` comments
    are ignored. Rules lowercase on the way in (the PSL algorithm is
    case-insensitive; :func:`registrable_domain_psl` lowercases hosts
    to match). Wildcards/exceptions parse exactly as in
    :func:`psl_table`."""
    rules = []
    for line in text.splitlines():
        parts = line.split()
        tok = parts[0] if parts else ""
        if not tok or tok.startswith("//"):
            continue
        rules.append(tok.lower())
    return psl_table(spark, tuple(rules))


def registrable_domain_psl(hosts: DataFrame, psl_df: DataFrame,
                           host_col: str = "host",
                           id_col: str = "doc_id",
                           out_col: str = "domain") -> DataFrame:
    """eTLD+1 via the real public-suffix LIST: every dot-suffix of
    the host joins against a broadcast ``(suffix)`` table, the
    LONGEST match wins (PSL rule), and the registrable domain is
    that suffix plus one more label. Hosts matching no suffix fall
    back to the :func:`registrable_domain` regex; a host that IS a
    public suffix maps to itself (mirroring the regex fallback's
    single-label behavior). Output: input columns + ``out_col``.

    Scale shape: |hosts|·2·n_labels candidate rows (n_labels ≈ 3-5 on
    real hosts) through one BROADCAST hash join against the ~10k-row
    suffix list — no shuffle on the candidate side — then a doc-keyed
    min-aggregate and one doc-keyed join back. This is the
    "PSL as data" design the regex subset documents: correctness for
    ``x.co.il`` / ``y.com.cn`` style suffixes comes from the list,
    not from growing a regex.

    Wildcard/exception rules (round 12, publicsuffix.org algorithm):
    each candidate start position emits TWO shapes — the exact suffix
    and its wildcard form (first label replaced by ``*``), so a
    ``*.ck`` rule matches ``anything.ck`` through the SAME broadcast
    join, one more candidate shape, not a new join. An exception rule
    (``!www.ck``, stored un-bang-ed with ``is_exc``) prevails over
    every other match per the PSL algorithm: its matched labels ARE
    the registrable domain (``www.www.ck`` → ``www.ck``); otherwise
    the longest (earliest-start) non-exception match is the public
    suffix and registrable = that suffix plus one label.

    The host is LOWERCASED at entry (round 12 — DNS names are
    case-insensitive, RFC 4343): a raw ``Example.COM`` host matches
    the all-lowercase rule list; the emitted domain is lowercase.
    A single trailing FQDN dot also strips at entry (the PSL
    algorithm's first step): ``example.com.`` → ``example.com``.
    """
    h = F.regexp_replace(F.lower(F.col(host_col)), "[.]+$", "")
    parts = F.split(h, "[.]")
    n = F.size(parts)
    # Candidate (start, shape) pairs, 1-based starts, TWO shapes per
    # start: the exact suffix and the wildcard form. greatest(n,1)
    # keeps sequence() total if a generate-filter pushdown evaluates
    # it on null/empty rows (the round-8 totality class); the bogus
    # rows a null host produces match no rule and fall through to the
    # regex fallback (null in, null out).
    shapes = F.flatten(F.transform(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda i: F.array(
            F.struct(
                i.alias("_start"),
                F.concat_ws(".", F.slice(parts, i, n - i + 1))
                 .alias("_sfx")),
            F.struct(
                i.alias("_start"),
                F.when(i < n, F.concat(
                    F.lit("*."),
                    F.concat_ws(".", F.slice(parts, i + 1, n - i))))
                 .otherwise(F.lit("*")).alias("_sfx")))))
    cand = (hosts.select(F.col(id_col),
                         F.explode_outer(shapes).alias("_c"))
            .select(F.col(id_col),
                    F.col("_c._start").cast("int").alias("_start"),
                    F.col("_c._sfx").alias("_sfx")))
    best = (cand.join(F.broadcast(psl_df.select(
                F.col("suffix").alias("_sfx"), "is_exc")), "_sfx")
            .groupBy(id_col)
            .agg(F.min(F.when(~F.col("is_exc"), F.col("_start")))
                  .alias("_s"),
                 F.min(F.when(F.col("is_exc"), F.col("_start")))
                  .alias("_se")))
    joined = hosts.join(best, id_col, "left")
    s, se = F.col("_s"), F.col("_se")
    dom = (F.when(se.isNotNull(),
                  F.concat_ws(".", F.slice(parts, se, n - se + 1)))
            .when(s.isNull(), registrable_domain(h))
            .when(s > 1, F.concat_ws(".", F.slice(parts, s - 1,
                                                  n - s + 2)))
            .otherwise(h))
    return joined.select(*hosts.columns, dom.alias(out_col))


#: ``method="auto"`` cutover for :func:`domain_quota_sample`: inputs
#: whose Catalyst-estimated scan size is at or under this take the
#: single-window formulation (one shuffle, cheapest when no domain
#: can be large); bigger (or stat-less) inputs take the two-phase
#: hierarchical cap, the only shape with no single-partition sort on
#: a crawl-scale mega-domain.
QUOTA_WINDOW_MAX_BYTES = 1 << 30

#: ``n_buckets="auto"`` sizing inputs for the hierarchical cap
#: (round 12 — the old fixed 16 left a true crawl mega-domain
#: sorting |domain|/16 rows per phase-1 partition). The two costs to
#: balance: phase 1 sorts ≈ input_bytes/n per (domain, bucket)
#: partition in the worst (single-domain) case; phase 2 re-ranks ≤
#: quota·n survivor rows in ONE partition. Minimizing the max gives
#: n ≈ sqrt(bytes / (quota · row_bytes)). Clamped to [16, 2^20]:
#: the floor keeps small inputs trivially spread, the ceiling bounds
#: the phase-2 survivor partition (quota·2^20 rows ≈ low hundreds of
#: MB) even for the stat-less huge-sentinel fallback.
QUOTA_ROW_BYTES_EST = 128
QUOTA_MIN_BUCKETS = 16
QUOTA_MAX_BUCKETS = 1 << 20


def _auto_n_buckets(docs: DataFrame, quota: int,
                    est: int | None = None) -> int:
    """Balanced bucket count from the input's Catalyst size estimate
    (free — no job; see ``dedup._plan_size_bytes``). Pass ``est``
    when the caller already paid the plan-stats roundtrip (the
    method="auto" cutover does — round-12 review find)."""
    import math

    from ..operators.dedup import _plan_size_bytes
    if est is None:
        est = _plan_size_bytes(docs)
    # Saturate est BEFORE the float math: Catalyst's estimate for a
    # join-heavy or stat-less input can be a product in the 1e300s,
    # and ``huge_int / int`` raises OverflowError at float
    # conversion (found live: the crawl-frontier flow feeds the
    # quota a pagerank⋈robots join). Any est at or past the cap
    # saturates n to QUOTA_MAX_BUCKETS anyway, so clamping first is
    # exact, not approximate.
    est_cap = (QUOTA_MAX_BUCKETS ** 2 * max(quota, 1)
               * QUOTA_ROW_BYTES_EST)
    n = math.ceil(math.sqrt(min(est, est_cap)
                            / (max(quota, 1) * QUOTA_ROW_BYTES_EST)))
    return int(max(QUOTA_MIN_BUCKETS, min(QUOTA_MAX_BUCKETS, n)))


def _phase1_marks(base: DataFrame, n_buckets: int, salt: str,
                  id_col: str) -> DataFrame:
    """Hierarchical phase 1, the ONE definition shared by
    :func:`domain_quota_sample` and :func:`quota_phase1_survivors`:
    salt-bucketed per-(domain, bucket) rank columns ``_b``/``_r1``.
    Factored so the bound-assertion tests exercise the production
    pipeline rather than a copy that could drift (round-12 review
    find: both sites duplicated the bucket hash incl. the
    '#bucket' salt suffix)."""
    bucket = F.pmod(F.xxhash64(F.lit(salt + "#bucket"),
                               F.col(id_col).cast("string")),
                    F.lit(n_buckets))
    w1 = W.partitionBy("domain", "_b").orderBy("sort_key", id_col)
    return (base.withColumn("_b", bucket)
            .withColumn("_r1", F.row_number().over(w1)))


def _quota_base(docs: DataFrame, url_col: str, id_col: str,
                salt: str, order_col: str | None = None) -> DataFrame:
    norm = url_normalize(F.col(url_col))
    dom = registrable_domain(url_host(norm))
    if order_col is None:
        key = F.md5(F.concat(F.lit(salt + ":"),
                             F.col(id_col).cast("string"))
                    .cast("binary"))
    else:
        # Rank by order_col DESCENDING: negate into the ascending
        # sort_key slot so BOTH quota methods inherit it unchanged.
        # NULL scores coalesce to -inf BEFORE negation (+inf after),
        # so they rank last — under Spark's NULLS FIRST an
        # unguarded NULL would win the quota.
        key = -F.coalesce(F.col(order_col).cast("double"),
                          F.lit(float("-inf")))
    return docs.select(F.col(id_col), norm.alias("norm_url"),
                       dom.alias("domain"), key.alias("sort_key"))


def domain_quota_sample(docs: DataFrame, url_col: str = "url",
                        quota: int = 2, id_col: str = "doc_id",
                        salt: str = "quota",
                        method: str = "auto",
                        n_buckets: int | str = "auto",
                        order_col: str | None = None) -> DataFrame:
    """Per-domain cap: rank each doc inside its registrable domain by
    a salted md5 of its id (stable across runs/engines/partitionings
    — the same determinization as ``mixture_sample``) and keep the
    first ``quota``. ``order_col`` (round 13) swaps the salted-hash
    ranking for an explicit score column, DESCENDING with NULLs last
    and the id as tiebreak — quota-by-quality for curation,
    quota-by-PageRank for a crawl frontier — through the SAME two
    skew-safe methods (the score negates into the ascending
    ``sort_key`` slot, so both phases inherit it unchanged).
    Output adds ``norm_url``, ``domain``, ``rank``,
    ``kept`` to the input id; ``rank`` is the EXACT within-domain
    rank for kept docs and NULL beyond the quota — the rank of the
    billionth doc inside a mega-domain is curation noise, and
    refusing to compute it is what makes the skew-safe formulation
    possible. Methods, identical output (equality-pinned):

    - ``"window"`` — one ``row_number`` window partitioned by the
      domain. Exact and cheapest when no domain is large, but a
      crawl-scale mega-domain (or the ``''`` domain every malformed
      URL collapses to) becomes ONE partition sorting its entire
      contents — the skewed-shuffle class the 100 TB posture forbids.
    - ``"hierarchical"`` — the two-phase cap (round 10): phase 1
      ranks per ``(domain, salt-bucket)`` — the bucket hash spreads
      any mega-domain over ``n_buckets`` partitions — and only the
      ≤ quota survivors per bucket enter phase 2, which re-ranks
      them exactly per domain over ≤ quota·n_buckets rows. Both
      phases are ONE chained window pipeline: phase 2's partition
      key sends survivors of a domain to one (bounded) partition and
      scatters non-survivors by an id hash, so no partition anywhere
      holds more than max(quota·n_buckets, ~|domain|/2^20) rows.
      ``n_buckets="auto"`` (the round-12 default) derives the bucket
      count from the input's Catalyst size estimate —
      n ≈ sqrt(bytes/(quota·row)) balances phase 1's per-bucket sort
      against phase 2's survivor partition (see
      :data:`QUOTA_MAX_BUCKETS`); output is n_buckets-invariant
      (pytest-pinned 4 ≡ 64 ≡ auto), so the knob is pure plan shape.
      Exactness: a doc in the domain's global top-quota is in its
      bucket's top-quota (a subset preserves relative order), so the
      survivor set contains the global top-quota; and every survivor
      ranked ≤ quota among survivors has exactly its global rank
      (all globally-smaller keys are survivors too).
    - ``"auto"`` — :data:`QUOTA_WINDOW_MAX_BYTES` statistics cutover,
      the same rule as ``simhash_signatures(formulation="auto")``:
      small scans take the single window, large or stat-less scans
      take the skew-safe shape."""
    if method not in ("auto", "window", "hierarchical"):
        raise ValueError(f"unknown method {method!r}")
    est = None
    if method == "auto":
        from ..operators.dedup import _plan_size_bytes
        est = _plan_size_bytes(docs)
        method = ("window" if est <= QUOTA_WINDOW_MAX_BYTES
                  else "hierarchical")
    # n_buckets resolves LAZILY: only the hierarchical branch reads
    # it, and the auto sizing reuses the estimate the method cutover
    # just paid for instead of a second plan-stats roundtrip
    # (round-12 review finds, both halves).
    if method == "hierarchical" and n_buckets == "auto":
        n_buckets = _auto_n_buckets(docs, quota, est=est)
    base = _quota_base(docs, url_col, id_col, salt, order_col)
    if method == "window":
        w = W.partitionBy("domain").orderBy("sort_key", id_col)
        r = F.row_number().over(w)
        ranked = base.withColumn("_r", r)
        rank = F.when(F.col("_r") <= quota, F.col("_r"))
    else:
        alive = F.col("_r1") <= quota
        # Phase-2 partition key: all survivors of a domain together
        # (≤ quota·n_buckets rows), non-survivors scattered by an id
        # hash so a mega-domain's dead rows never pile into one sort.
        scatter = F.pmod(F.xxhash64(F.lit(salt + "#scatter"),
                                    F.col(id_col).cast("string")),
                         F.lit(1 << 20))
        pkey = F.when(alive, F.lit(-1).cast("long")).otherwise(scatter)
        w2 = W.partitionBy("domain", "_p").orderBy("sort_key", id_col)
        ranked = (_phase1_marks(base, n_buckets, salt, id_col)
                  .withColumn("_p", pkey)
                  .withColumn("_r", F.row_number().over(w2)))
        rank = F.when(alive & (F.col("_r") <= quota), F.col("_r"))
    return (ranked.select(
        F.col(id_col), "norm_url", "domain",
        rank.cast("long").alias("rank"))
        .withColumn("kept", F.col("rank").isNotNull()))


def quota_phase1_survivors(docs: DataFrame, url_col: str = "url",
                           quota: int = 2, id_col: str = "doc_id",
                           salt: str = "quota",
                           n_buckets: int | str = "auto") -> DataFrame:
    """The hierarchical cap's phase-1 survivor set, exposed for the
    bound assertion tests: per (domain, salt-bucket) top-``quota``
    rows — so no domain contributes more than quota·n_buckets rows
    to phase 2's exact re-rank partition."""
    if n_buckets == "auto":
        n_buckets = _auto_n_buckets(docs, quota)
    base = _quota_base(docs, url_col, id_col, salt)
    return (_phase1_marks(base, n_buckets, salt, id_col)
            .filter(F.col("_r1") <= quota)
            .drop("sort_key"))


def url_path(url: Column | str) -> Column:
    """Path component of a URL — everything between the authority and
    the first ``?``/``#``; ``'/'`` when the URL has an authority but
    no path (REP matches the root rule against it). A string with no
    ``scheme://`` yields ``'/'`` too (no authority → nothing to gate
    on; the robots default-allow then applies)."""
    u = _c(url)
    p = F.regexp_extract(
        u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def robots_rules_table(spark, rules) -> DataFrame:
    """A crawler's robots.txt verdict set as a DataFrame
    ``(domain, rule_path, allow)`` — the broadcast side of
    :func:`robots_gate`. ``rules`` is an iterable of
    ``(domain, rule_path, allow)`` triples: the Allow/Disallow lines
    of each host's robots.txt for YOUR user-agent, after group
    resolution (RFC 9309 §2.2.1 — picking the most specific
    User-agent group happens at fetch/parse time, once per host;
    what the per-URL join needs is only the resolved rule set).
    Rule paths may use the full RFC 9309 §2.2.3 match syntax since
    round 14: ``*`` spans any character run, a trailing ``$``
    anchors the end, everything else is literal — a wildcard-free
    rule is exactly a literal prefix. :func:`robots_gate` compiles
    each rule to an anchored regex in one projection over this
    (tiny, broadcast) table; the JOIN SHAPE is identical either
    way.

    Percent-encoding (round-14 battery, RFC 9309 §2.2.2): rule paths
    normalize here through the SAME projection
    :func:`url_normalize` applies to URL paths — valid escapes' hex
    uppercases and the four unreserved MARKS decode
    (:data:`_PCT_DECODE`) — so a rule authored ``/p%2dq`` (or
    ``/p%2Fq`` vs a URL's ``%2f``) matches the canonicalized URL it
    denotes. This is the spec's "percent-decode before comparison"
    requirement restricted to the engine's documented idempotent
    subset; the gate's prefix test then compares like with like."""
    return spark.createDataFrame(
        [(d, _pct_normalize_py(p), a) for d, p, a in rules],
        "domain string, rule_path string, allow boolean")


def robots_gate(urls: DataFrame, rules: DataFrame,
                url_col: str = "url",
                id_col: str = "doc_id") -> DataFrame:
    """Per-URL robots.txt verdict (RFC 9309 matching core):
    (id, domain, rule, allowed) — ``rule`` is the winning rule's
    path EXACTLY AS THE CALLER SPELLED IT in the rules frame (the
    round-16 contract: percent-normalization happens in a private
    matching column, so verdicts join back to a hand-built rules
    frame by its original raw-escape path), NULL when no rule
    matched. A URL's candidate rules are its
    host's rows whose ``rule_path`` MATCHES the URL's path under the
    RFC 9309 §2.2.3 syntax (round 14): literal prefix by default,
    ``*`` spanning any character run, a trailing ``$`` anchoring
    the end. The MOST SPECIFIC (longest) rule wins — rule-string
    length, wildcards included, the reference-implementation
    convention — a specificity TIE goes to ``allow`` (RFC 9309
    §2.2.2: the least restrictive rule), and a URL matching no rule
    is allowed (the REP default). This is the
    compliance gate a crawl-derived corpus runs before training —
    retroactively honoring robots exclusions is a standard curation
    pass, and it needs exactly this join, not a re-crawl. One verdict
    row per distinct (id, host, path): duplicate ids with different
    URLs each keep their own verdict; exact duplicate rows collapse
    to one (identical verdict either way).

    Scale shape: robots rule sets are small (a few KB per host, and
    only hosts you crawled) — ONE broadcast hash join on the host
    key with the match test as the join's residual condition
    (startswith for wildcard-free rules, a pre-compiled anchored
    regex for wild ones), so the corpus side never shuffles; the
    winner is a doc-keyed ``row_number`` (corpus-cardinality key,
    never global), and unmatched URLs ride the same left join (no
    second pass). The DuckDB oracle replays the identical join +
    window (``length DESC NULLS LAST, allow DESC NULLS LAST``) for
    the gated family's wildcard-free fixture — wild rules are
    pytest-gated (the RFC example battery)."""
    # Percent-normalize the URL path through the SAME projection
    # robots_rules_table applies to rule paths (round-15 ADVICE fix):
    # rules are stored normalized ('/p%2dq' → '/p-q'), so a caller
    # feeding RAW (non-url_normalize'd) URLs would otherwise compare
    # normalized-to-raw and a disallow could silently stop applying —
    # the bad direction for a compliance gate. _percent_normalize is
    # idempotent, so canonicalized callers (the gated family) are
    # unaffected.
    u = urls.select(F.col(id_col),
                    url_host(F.col(url_col)).alias("domain"),
                    _percent_normalize(url_path(F.col(url_col)))
                    .alias("_path"))
    # RFC 9309 §2.2.3 wildcards (round 14): '*' in a rule matches
    # any character run, a TRAILING '$' anchors the end; everything
    # else is literal. Each rule compiles to an anchored regex
    # JVM-side (escape metachars, un-escape the stars, conditionally
    # anchor), so a wildcard-free rule degenerates to exactly the
    # old literal-prefix test and existing rule tables change
    # behavior ONLY where they contain '*' / trailing '$'.
    # Compilation is one projection over the (tiny, broadcast) rule
    # table; the per-candidate rlike runs on urls × matching-host
    # rules — the same pair set the prefix test walked.
    has_anchor = F.col("_rpn").endswith("$")
    has_wild = has_anchor | F.col("_rpn").contains("*")
    body = F.when(has_anchor,
                  F.expr("substring(_rpn, 1, "
                         "length(_rpn) - 1)")) \
            .otherwise(F.col("_rpn"))
    esc = F.regexp_replace(
        body, r"([\\^$.|?*+()\[\]{}])", r"\\$1")
    pattern = F.when(has_wild, F.concat(
        F.lit("^"),
        F.replace(esc, F.lit(r"\*"), F.lit(".*")),
        F.when(has_anchor, F.lit("$")).otherwise(F.lit(""))))
    # Rule paths normalize HERE too, not only in robots_rules_table
    # (round-15 review find): a caller hand-building the rules frame
    # (loaded from parquet, a foreign producer) with raw escapes
    # would otherwise compare un-normalized rules against the now-
    # normalized URL path — the same one-sided-compare regression in
    # mirror image. Idempotent for robots_rules_table output. The
    # wildcard compilation below runs on the NORMALIZED body, so
    # '%2d' inside a wild rule means '-' exactly as in a literal one.
    # The normalization lives in a PRIVATE column (round-15 ADVICE
    # fix): matching and specificity ranking use `_rpn`, but the
    # `rule` output returns the caller's rule_path VERBATIM, so a
    # caller joining verdicts back to a hand-built rules frame by
    # its original raw-escape path keeps working.
    rules = rules.withColumn("_rpn",
                             _percent_normalize(F.col("rule_path")))
    r = rules.select(F.col("domain"),
                     F.col("rule_path").alias("_rp_raw"),
                     F.col("_rpn").alias("_rp"),
                     has_wild.alias("_wild"),
                     pattern.alias("_re"),
                     F.col("allow").alias("_allow"))
    # Wildcard-free rules (the overwhelmingly common case) take the
    # allocation-free startswith fast path; only genuinely-wild
    # rules pay the rlike, whose non-foldable pattern column
    # recompiles per candidate pair (review find — the rule table
    # is broadcast-tiny, but the residual runs per URL×rule pair).
    match = F.when(F.col("_wild"), F.expr("rlike(_path, _re)")) \
             .otherwise(F.col("_path").startswith(F.col("_rp")))
    j = (u.join(F.broadcast(r),
                (u["domain"] == r["domain"]) & match,
                "left").drop(r["domain"]).drop("_re", "_wild"))
    # Partition by the full (id, domain, path) row identity, not the
    # id alone (round-13 review find): a caller feeding duplicate ids
    # with DIFFERENT URLs would otherwise have both URLs' candidate
    # rules ranked in one window and one URL's verdict silently
    # dropped. With the row identity in the key, each distinct
    # (id, URL) gets exactly one verdict; exact duplicate rows still
    # collapse to one (their verdicts are identical by construction).
    # Specificity ranks on the NORMALIZED path (what RFC 9309's
    # percent-decoded comparison sees); the raw path rides along as
    # a final tie-break so two raw spellings of one normalized rule
    # stay deterministic, and as the verbatim `rule` output.
    w = W.partitionBy(id_col, "domain", "_path").orderBy(
        F.length("_rp").desc_nulls_last(),
        F.col("_allow").desc_nulls_last(),
        F.col("_rp"),
        F.col("_rp_raw"))
    return (j.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(F.col(id_col), "domain",
                    F.col("_rp_raw").alias("rule"),
                    F.coalesce(F.col("_allow"), F.lit(True))
                     .alias("allowed")))


def robots_txt_parse(text: str, user_agent: str,
                     domain: str) -> list[tuple[str, str, bool]]:
    """Parse RAW robots.txt content into :func:`robots_rules_table`
    triples for ONE crawler — the fetch-time half of the robots lane
    (the per-URL join is :func:`robots_gate`), mirroring
    :func:`psl_table_from_text` for the PSL. Implements RFC 9309
    group resolution:

    - Lines are ``field: value`` with ``#`` comments stripped; field
      names are case-insensitive; unknown fields are ignored.
    - Consecutive ``User-agent`` lines open ONE group sharing the
      rules that follow (§2.2.1).
    - The crawler obeys the group(s) whose user-agent token is the
      LONGEST case-insensitive prefix of ``user_agent``; if none
      matches, the ``*`` group(s); if neither exists, no rules
      (everything allowed). All groups with the winning token merge.
    - ``Allow`` / ``Disallow`` values pass through verbatim —
      including RFC 9309 §2.2.3 ``*`` / trailing-``$`` wildcards,
      which :func:`robots_gate` compiles and matches since round
      14. An EMPTY Disallow value means "allow everything" per the
      spec and contributes no rule.

    Returns ``[(domain, rule_path, allow), ...]`` ready to feed
    :func:`robots_rules_table` (one call per fetched host).

    Degenerate handling (round-14 battery): a leading UTF-8 BOM
    strips before parsing (RFC 9309 files are UTF-8; a BOM glued to
    the first ``User-agent`` line otherwise makes its field name
    ``\\ufeffuser-agent`` and silently drops the whole first group),
    and CRLF/CR line endings parse identically to LF
    (``splitlines`` + per-line strip — pinned)."""
    if text.startswith("﻿"):
        text = text[1:]
    ua = user_agent.lower()
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    in_agents = False
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agents:
                if cur_agents:
                    groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_agents = True
            # An EMPTY product token is ignored (round-13 review
            # find: '' prefix-matches every crawler at specificity 0,
            # so a malformed 'User-agent:' line was beating the
            # explicit '*' group for everyone).
            if value:
                cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_agents = False
            if value:
                cur_rules.append((value, field == "allow"))
            # empty Disallow = allow all = no rule; empty Allow is
            # meaningless either way
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    # Longest user-agent token that prefixes ours wins; '*' is the
    # fallback with specificity -1 so ANY named match beats it.
    best = -2
    for agents, _rules in groups:
        for a in agents:
            if a == "*":
                best = max(best, -1)
            elif ua.startswith(a):
                best = max(best, len(a))
    rules: list[tuple[str, str, bool]] = []
    for agents, grp_rules in groups:
        spec = max((len(a) if a != "*" and ua.startswith(a) else
                    (-1 if a == "*" else -2)) for a in agents)
        if spec == best and best > -2:
            rules.extend((domain, p, allow) for p, allow in grp_rules)
    return rules


def sitemap_urls(docs: DataFrame, content_col: str = "content",
                 host_col: str = "host") -> DataFrame:
    """(host, url): URL inventory from fetched sitemap XML — the
    discovery half the robots lane's fetch side pairs with
    (:func:`robots_txt_parse` resolves what you MAY fetch; the
    sitemap says what the host WANTS fetched). Extracts every
    ``<loc>…</loc>`` entry (the shared element of urlset AND
    sitemap-index files, so nested indexes chain through the same
    op), trims surrounding whitespace, entity-decodes the five XML
    escapes (``&amp; &lt; &gt; &quot; &apos;`` — required output
    escaping per the sitemap protocol), and normalizes through
    :func:`url_normalize`. Row-local regexp work (one
    ``regexp_extract_all`` + explode per document, JVM-side, no
    Python); a malformed or loc-less document contributes zero rows,
    not an error."""
    # RE2-safe (module convention): no lazy quantifier — loc content
    # cannot contain '<', so [^<]* is exact; surrounding whitespace
    # trims afterwards. F.regexp_extract_all (not an f-string into
    # F.expr) so an exotic content_col name needs no quoting.
    locs = F.regexp_extract_all(
        F.col(content_col), F.lit("<loc>([^<]*)</loc>"), F.lit(1))
    # regexp trim, not F.trim: Spark's trim strips SPACES only, and
    # sitemap loc values routinely carry newlines/tabs (pinned).
    u = F.regexp_replace(
        F.regexp_replace(F.col("_loc"), "^\\s+", ""), "\\s+$", "")
    # '&amp;' decodes LAST (review find, reproduced live): decoding
    # it first turns '&amp;lt;' — the legal escaping of a literal
    # '&lt;' in the URL — into '&lt;' and then a second pass eats it
    # to '<', corrupting every URL whose text contains an
    # escaped-ampersand entity.
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&apos;", "'"),
                    ("&amp;", "&")):
        u = F.replace(u, F.lit(ent), F.lit(ch))
    return (docs
            .filter(F.col(content_col).isNotNull())
            .select(F.col(host_col).alias("host"),
                    F.explode(locs).alias("_loc"))
            .select("host", url_normalize(u).alias("url")))
