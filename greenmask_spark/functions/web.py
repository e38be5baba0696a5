"""Web-corpus hygiene operators: URL normalization, domain extraction,
blocklist filtering, per-domain caps — the CommonCrawl-style curation
stages that run before text-level dedup in a training-data pipeline.

All pure Column expressions except the per-domain cap (one keyed
window). No Python, no UDFs — these run inside whole-stage codegen at
scan bandwidth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: query parameters that are UNAMBIGUOUSLY tracking noise, never content
#: identity. "ref" is deliberately absent: on many sites it is
#: content-bearing (git refs, forum thread refs) and stripping it would
#: collapse genuinely different resources into one dedup key.
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid", "mc_cid", "mc_eid", "igshid",
)


def normalize_url(
    url: Column, tracking_params: tuple[str, ...] = TRACKING_PARAMS
) -> Column:
    """Canonical URL for dedup keys: lowercase scheme+host, default
    ports dropped, tracking params removed, fragment stripped, trailing
    slash normalized. Two URLs that normalize equal are the same fetch
    for dedup purposes. ``tracking_params`` overrides the stripped query
    parameter set (e.g. add site-specific noise params, or ``"ref"``
    when the corpus is known not to use it for content)."""
    # drop the fragment, then lowercase scheme://host[:port] while
    # leaving path/query case alone (reassembled from two slices of the
    # SAME column expression — never a hard-coded column name)
    u = F.regexp_replace(F.trim(url), r"#.*$", "")
    head = F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    rest = F.substr(u, F.length(head) + F.lit(1))
    u = F.concat(F.lower(head), rest)
    # default ports, paired with their scheme (https on :80 is a
    # DIFFERENT fetch than https on :443 — only the scheme's own
    # default port is redundant)
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80(/|\?|$)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443(/|\?|$)", r"$1$2")
    # tracking params (leading or mid-query), then dangling separators
    for p in tracking_params:
        u = F.regexp_replace(u, r"([?&])" + p + r"=[^&#]*", r"$1")
    u = F.regexp_replace(u, r"&&+", "&")        # mid-query && from removals
    u = F.regexp_replace(u, r"\?&+", "?")       # query-start ?&
    u = F.regexp_replace(u, r"[?&]$", "")        # trailing separator
    # trailing slash on a bare path
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://[^/?#]+)/$", r"$1")
    return u


def url_domain(url: Column, registered_only: bool = False) -> Column:
    """Hostname of a URL (port stripped, lowercased). With
    ``registered_only`` keep the last two labels — a pragmatic eTLD+1
    without a public-suffix table (co.uk-style suffixes need the real
    PSL; document the limitation rather than ship a wrong one)."""
    host = F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1))
    if registered_only:
        host = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return host


def extract_links(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    absolute_only: bool = True,
) -> DataFrame:
    """(id, href) pairs from HTML ``href`` attributes — ONE codegen'd
    ``regexp_extract_all`` + explode, no HTML parser, which is the
    point: at crawl scale link extraction must run at scan bandwidth,
    and quoted href values are regular enough for a regex (the same
    trade ``strip_html`` makes). Unquoted hrefs (legal pre-HTML5) are
    skipped by design. ``absolute_only`` keeps http(s) URLs only —
    resolving relative links needs the page's fetch URL (join the
    WARC ``target_uri`` upstream and resolve there).

    Scale shape: scan + explode, zero shuffle; pages with no links
    emit nothing (explode drops empty arrays)."""
    pat = "(?i)href\\s*=\\s*[\"']([^\"']*)[\"']"
    links = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.regexp_extract_all(text_col, F.lit(pat), F.lit(1))
        ).alias("href"),
    ).filter(F.col("href") != "")
    if absolute_only:
        links = links.filter(F.col("href").rlike("(?i)^https?://"))
    return links


def host_graph(
    df: DataFrame,
    src_url_col: str,
    dst_url_col: str = "href",
    registered_only: bool = False,
    drop_self: bool = True,
) -> DataFrame:
    """Host-level weighted edge list from (page URL, extracted href)
    rows → (src, dst, w) — the Common-Crawl-style web graph that
    feeds ``linkgraph.pagerank`` (map hosts to ids with a dimension
    join or keep strings through a string-keyed rank replay; the
    crawl ranking datasets themselves are host/domain-level for
    exactly this reason). ``registered_only`` aggregates at the
    pragmatic eTLD+1 of ``url_domain``; ``drop_self`` removes
    intra-host navigation edges (they dominate raw counts and carry
    no cross-site endorsement).

    Scale shape: one map-side-combined groupBy over (host, host)
    string pairs — page bodies and full URLs never reach the shuffle."""
    e = df.select(
        url_domain(F.col(src_url_col), registered_only).alias("src"),
        url_domain(F.col(dst_url_col), registered_only).alias("dst"),
    ).filter((F.col("src") != "") & (F.col("dst") != ""))
    if drop_self:
        e = e.filter(F.col("src") != F.col("dst"))
    return e.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("w"))


def filter_blocklist(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    domain_col: str | None = None,
) -> DataFrame:
    """Drop rows whose domain appears in a blocklist table (single
    ``domain`` column). Blocklists are small → broadcast anti-join; the
    corpus never shuffles."""
    dom = (
        F.col(domain_col) if domain_col else url_domain(F.col(url_col))
    )
    tagged = df.withColumn("__dom", dom)
    bl = blocklist.select(F.lower(F.col("domain")).alias("__dom")).distinct()
    return tagged.join(F.broadcast(bl), "__dom", "left_anti").drop("__dom")


def cap_per_domain(
    df: DataFrame,
    max_docs: int,
    domain_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Keep at most ``max_docs`` documents per domain (the Gopher/
    MassiveText per-domain quota), chosen by a deterministic
    salted-hash ranking (NOT first-k in file order, which biases
    toward crawl ordering) — a pure function of (key, seed), identical
    at any partitioning and replayable in plain SQL.

    Scale shape (two-phase since r8): a map-side-combined per-domain
    count — the scan prunes to the domain column, (domain, int) pairs
    on the wire — finds the over-quota domains, typically a handful of
    heavy ones; those broadcast back (NULL-safe equality, so a NULL
    domain is one quota bucket like before) and only THEIR rows enter
    the window-rank exchange. Rows in under-quota domains stream
    scan→filter-through with no sort. A mega-domain still serializes
    its rank into one task; for corpora where one domain is a
    double-digit percentage of rows, pre-filter it with
    ``hash_sample`` at rate ≈ max_docs/|domain| first (two-pass cap) —
    the window then ranks a bounded remnant.

    The two-phase plan reads the input three times (the count scan —
    pruned to the domain column — plus once per union branch), so the
    input must be DETERMINISTIC (a parquet/table scan, any pure
    projection of one); an upstream ``rand()``-style filter could
    disagree between the count pass and the branches, over-admitting
    or dropping rows. This is ENFORCED, not just documented: the
    analyzed plan is walked for non-deterministic expressions
    (plan/health.plan_has_nondeterministic) and such an input is
    pinned with an eager localCheckpoint before the three reads — the
    same rule Spark itself imposes on non-deterministic sources
    feeding self-joins, paid only by inputs that need it (a plain
    scan/projection pays one plan walk, no materialization)."""
    if int(max_docs) < 1:
        raise ValueError(f"max_docs={max_docs} must be >= 1")
    from greenmask_spark.plan.health import plan_has_nondeterministic

    if plan_has_nondeterministic(df):
        df = df.localCheckpoint(eager=True)
    n = int(max_docs)
    u = F.sha2(
        F.concat(F.col(key_col).cast("string"), F.lit(f":cap:{seed}")), 256
    )
    over = (
        df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > n)
        .select(F.col(domain_col).alias("__g"), F.lit(True).alias("__over"))
    )
    marked = df.join(
        F.broadcast(over),
        F.col(domain_col).eqNullSafe(F.col("__g")),
        "left",
    ).drop("__g")
    pass_through = marked.filter(F.col("__over").isNull()).drop("__over")
    heavy = marked.filter(F.col("__over")).drop("__over")
    w = Window.partitionBy(domain_col).orderBy(u, F.col(key_col))
    capped = (
        heavy.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk")
    )
    return pass_through.unionByName(capped).select(*df.columns)


def parse_robots(
    df: DataFrame,
    domain_col: str = "domain",
    text_col: str = "text",
) -> DataFrame:
    """robots.txt bodies → (domain, allow, prefix) rule rows for the
    ``User-agent: *`` groups — the RFC 9309 subset a bulk crawl
    pipeline enforces, with every simplification explicit:

    - a GROUP is a contiguous run of ``User-agent:`` lines followed by
      its directives; a group's rules are active here iff any of its
      agent lines is ``*`` (agent-specific groups are out of scope —
      a bulk pipeline is nobody's named agent);
    - ``Allow``/``Disallow`` values are path prefixes; an empty value
      is a no-op per the RFC (``Disallow:`` = allow everything);
    - wildcard handling is CONSERVATIVE toward blocking: a Disallow
      containing ``*`` or ``$`` truncates at the first metacharacter
      and matches as a plain prefix (a superset of the rule's true
      matches — over-blocking, never under-blocking), while an Allow
      containing either is DROPPED (widening an Allow could override
      a Disallow the site intended);
    - comments (``#`` to end of line) and unknown directives
      (Sitemap, Crawl-delay, …) are ignored.

    Scale shape: one posexplode over the bodies + two windows
    partitioned by domain — a robots.txt is capped in practice at a
    few thousand lines, so each window partition is one small file;
    the output rule set is tiny relative to any URL frame.
    """
    # every stage is a parsed-SQL projection (one py4j parse each):
    # the Column-API form of this parser cost ~900 driver round trips
    # per plan build (the _lit_vec precedent). Expressions are the
    # exact SQL twins of the previous Column calls — same regexes,
    # same window specs, same values.
    lines = df.selectExpr(
        f"{domain_col} AS domain",
        f"posexplode(split({text_col}, '\\n')) AS (pos, line)",
    ).selectExpr(
        "domain", "pos",
        "trim(regexp_replace(line, '#.*$', '')) AS line",
    ).filter("line != ''")
    kv = lines.selectExpr(
        "domain", "pos",
        "lower(trim(regexp_extract(line, '^([^:]+):', 1))) AS key",
        "trim(regexp_extract(line, '^[^:]+:(.*)$', 1)) AS val",
    ).filter("key IN ('user-agent', 'allow', 'disallow')")
    # a group starts at a user-agent line NOT preceded by another
    # user-agent line (contiguous agent runs share one group); the
    # lag window lands in its own projection — the analyzer would
    # split the nested window form into the same two Window operators
    grouped = kv.selectExpr(
        "*", "CAST(key = 'user-agent' AS INT) AS __ua",
    ).selectExpr(
        "*",
        "CASE WHEN __ua = 1 AND lag(__ua, 1, 0) OVER "
        "(PARTITION BY domain ORDER BY pos) = 0 "
        "THEN 1 ELSE 0 END AS __st",
    ).selectExpr(
        "*",
        "sum(__st) OVER (PARTITION BY domain ORDER BY pos) AS grp",
    )
    star = grouped.selectExpr(
        "*",
        "max(CASE WHEN __ua = 1 AND val = '*' THEN 1 ELSE 0 END) "
        "OVER (PARTITION BY domain, grp) AS star",
    )
    rules = star.filter(
        "star = 1 AND __ua = 0 AND val != ''"
    ).selectExpr(
        "domain",
        "key = 'allow' AS allow",
        "val AS prefix",
    )
    # conservative wildcard policy (see docstring). ``spec`` keeps the
    # ORIGINAL pattern length as the rule's specificity: a truncated
    # 'Disallow: /secret*' still outranks 'Allow: /secret' in the
    # longest-match contest (RFC 9309 ranks by pattern octets), so
    # truncation can widen what a Disallow matches but never DEMOTE it
    # below an Allow it used to beat — over-block, never under-block.
    return rules.filter(
        "NOT (allow AND prefix RLIKE '[*$]')"
    ).selectExpr(
        "domain", "allow",
        "CASE WHEN NOT allow AND prefix RLIKE '[*$]' "
        "THEN regexp_extract(prefix, '^([^*$]*)', 1) "
        "ELSE prefix END AS prefix",
        "length(prefix) AS spec",
    ).distinct()


def robots_filter(
    df: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Drop URLs a ``parse_robots`` rule set disallows — RFC 9309
    longest-match: among the rules of the URL's domain whose prefix
    matches its path, the most SPECIFIC rule decides (specificity =
    the original pattern length ``parse_robots`` records, so a
    truncated wildcard Disallow keeps its rank); an exact tie between
    Allow and Disallow resolves to Allow (the RFC's least-restrictive
    tie-break); a URL with no matching rule (or no rules for its
    domain at all) passes. The match target is path + query, with an
    empty path normalized to "/" so a blanket ``Disallow: /`` covers
    ``https://d.com?x=1`` too.

    Scale shape: one equi-join on domain. Rules are tiny next to any
    URL frame, so the rules side is broadcast EXPLICITLY — the static
    plan should never sort-merge on statistics grounds (AQE would
    usually convert it at runtime, but the pre-hint static plan showed
    one SMJ). A crawl spanning tens of millions of domains can outgrow
    a broadcast (rules ≈ domains × rules-per-file); pass
    ``broadcast_rules=False`` there to fall back to a shuffled hash
    join on domain. The prefix test is a codegen'd startswith, and the
    verdict is one max over (specificity, allow) structs — ties
    break to allow because the struct orders allow=true above
    allow=false at equal specificity. URL bodies never fan out: only
    (url-row, matching-rule) pairs exist between the join and the
    max-aggregation. The frame is read on both sides of the verdict
    join, so a non-deterministic input is pinned with an eager
    localCheckpoint first (the cap_per_domain rule — a plain scan or
    projection pays one plan walk, no materialization)."""
    from greenmask_spark.plan.health import plan_has_nondeterministic

    if plan_has_nondeterministic(df):
        df = df.localCheckpoint(eager=True)
    # one parsed-SQL projection (see parse_robots): same regexes and
    # CASE as the previous Column form; '' and '?q=1' both root at '/'
    raw_sql = (f"regexp_extract({url_col}, "
               "'^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$', 1)")
    tagged = df.selectExpr(
        "*",
        f"lower(regexp_extract({url_col}, "
        "'^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)) AS __dom",
        f"CASE WHEN startswith({raw_sql}, '/') THEN {raw_sql} "
        f"ELSE concat('/', {raw_sql}) END AS __path",
        "monotonically_increasing_id() AS __rid",
    )
    r = rules.select(
        F.col("domain").alias("__r_dom"),
        F.col("allow").alias("__r_allow"),
        F.col("prefix").alias("__r_prefix"),
        F.col("spec").alias("__r_spec"),
    )  # renamed so caller columns named domain/allow/prefix can't clash
    if broadcast_rules:
        r = F.broadcast(r)
    matched = (
        tagged.join(r, F.col("__dom") == F.col("__r_dom"))
        .filter("startswith(__path, __r_prefix)")
        .groupBy("__rid")
        .agg(F.expr("max(struct(__r_spec AS l, __r_allow AS a))")
             .alias("__m"))
        .selectExpr("__rid", "__m.a AS __allowed")
    )
    return (
        tagged.join(matched, "__rid", "left")
        .filter("coalesce(__allowed, true)")
        .select(*df.columns)
    )


def domain_profile(
    df: DataFrame,
    url_col: str = "url",
    signal_cols: tuple[str, ...] = (),
    registered_only: bool = False,
    gates: dict[str, tuple[float | None, float | None]] | None = None,
) -> DataFrame:
    """Per-domain corpus curation profile (the FineWeb/RefinedWeb
    domain-level quality pass): documents roll up to their URL's
    domain with exact counts and per-signal sums/means, plus an
    optional ``kept`` verdict from mean-range gates — the table a
    curation run turns into a domain allow/blocklist (feed the
    flagged domains to ``filter_blocklist``), and the complement of
    ``cap_per_domain`` (which bounds VOLUME per domain; this judges
    QUALITY per domain).

    ``signal_cols`` are numeric per-document signals (e.g. n_chars, a
    quality_score, pii_hits). Sums accumulate in DECIMAL(38,6) — an
    exact, summation-order-independent lattice, so the aggregate is
    bit-replayable in an ANSI oracle at any partitioning/cluster size
    (the repo's cross-engine float rule: float64 partial sums would
    drift with partition count). Each mean is ONE double division of
    two exact quantities. Rows with a NULL signal keep their other
    signals (per-signal n is counted separately, the SQL AVG
    convention); a NULL/unparseable URL pools under the NULL domain
    row rather than silently dropping.

    ``gates`` maps signal -> (min_mean, max_mean) (either bound None
    = unchecked); domains pass only if EVERY gated mean is inside its
    range — NULL means (no scored docs) fail closed, the
    curation-safe default.

    Output: (domain, n_docs, <s>_n, <s>_sum, <s>_mean per signal
    [, kept]).

    Scale shape: ONE map-side-combined shuffle whose payload is
    (domain, count, decimal sums) slivers — bodies never cross the
    exchange; output cardinality = |domains|, tiny next to the
    corpus. Gates are pure post-aggregation expressions."""
    dom = url_domain(F.col(url_col), registered_only=registered_only)
    dom = F.when(dom == "", F.lit(None)).otherwise(dom)

    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for s in signal_cols:
        v = F.col(s).cast("decimal(38,6)")
        aggs.append(F.count(v).alias(f"{s}_n"))
        aggs.append(F.sum(v).alias(f"{s}_sum"))
    out = df.groupBy(dom.alias("domain")).agg(*aggs)

    means = []
    for s in signal_cols:
        means.append(
            F.when(
                F.col(f"{s}_n") > 0,
                (F.col(f"{s}_sum").cast("double")
                 / F.col(f"{s}_n").cast("double")),
            ).alias(f"{s}_mean")
        )
    cols = (
        ["domain", "n_docs"]
        + [c for s in signal_cols for c in (f"{s}_n", f"{s}_sum")]
    )
    out = out.select(*cols, *means)

    if gates is not None:
        unknown = sorted(set(gates) - set(signal_cols))
        if unknown:
            raise ValueError(
                f"gates reference non-signal columns: {unknown}"
            )
        kept = F.lit(True)
        for s, (lo, hi) in gates.items():
            m = F.col(f"{s}_mean")
            cond = m.isNotNull()
            if lo is not None:
                cond = cond & (m >= F.lit(float(lo)))
            if hi is not None:
                cond = cond & (m <= F.lit(float(hi)))
            kept = kept & cond
        out = out.withColumn("kept", kept)
    return out
