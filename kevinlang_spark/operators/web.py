"""Web-corpus curation: URL normalization, registrable-domain
extraction, and per-domain frequency caps — the dedup-adjacent moves
every CommonCrawl-derived pipeline (C4, RefinedWeb, FineWeb) makes
before text-level filtering.

All three are pure Catalyst expressions / one keyed window: no UDFs, so
the hot path stays in whole-stage codegen at any corpus size.  The
reference engine (harry75369/KevinLang) has no web layer; this extends
the LLM-data-pipeline tier alongside text.py's quality filters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import MapType

#: tracking query parameters stripped by :func:`normalize_url` —
#: the conventional analytics/click-id set
TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|ref|igshid)="

#: second-level public suffixes for the PSL-lite heuristic of
#: :func:`registered_domain`.  The full Public Suffix List is a
#: periodically-updated data file; this literal subset covers the
#: high-traffic ccTLD patterns and is intentionally static so results
#: are reproducible — swap in the real PSL as a broadcast join when
#: exactness matters more than determinism.
SECOND_LEVEL_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "or.jp", "ne.jp",
    "ac.jp", "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "com.br", "org.br", "gov.br", "co.in", "org.in", "gov.in",
    "com.cn", "org.cn", "gov.cn", "co.kr", "or.kr", "com.mx",
    "com.ar", "com.tr", "co.za", "com.sg", "com.tw", "co.nz",
]


def normalize_url(url: Column) -> Column:
    """Canonical URL form: lowercase scheme and host, strip a leading
    ``www.``, strip default ports (``:80`` http / ``:443`` https), drop
    the fragment, drop tracking query parameters
    (:data:`TRACKING_PARAM_RE`), SORT the surviving parameters (query
    order is semantically irrelevant but breaks exact dedup), and trim
    trailing slashes from the path.  Everything is built-in string /
    array expressions, so two syntactic spellings of one resource hash
    identically in an exact-dedup pass."""
    u = F.regexp_replace(url, r"#.*$", "")  # fragment never reaches the server
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qnorm = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    # scheme-less inputs (bare hosts, protocol-relative //host/…) would
    # extract empty scheme+host and collapse to a malformed "://…" that
    # merges unrelated rows under one dedup key — pass them through
    # unchanged instead (ADVICE r8 item 2)
    has_scheme = url.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://")
    return (
        F.when(url.isNull(), F.lit(None))
        .when(~has_scheme, url)
        .otherwise(F.concat(scheme, F.lit("://"), host, path, qnorm))
    )


def registered_domain(url_or_host: Column) -> Column:
    """Registrable domain of a URL or bare host: the label directly
    below the public suffix — ``a.b.news.co.uk`` → ``news.co.uk``,
    ``cdn.example.com`` → ``example.com``.  PSL-lite: two-level
    suffixes from :data:`SECOND_LEVEL_SUFFIXES`, one-level otherwise.
    This is the grouping key for per-domain caps and domain-level
    contamination checks."""
    host = F.lower(
        F.when(
            url_or_host.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"),
            F.regexp_extract(url_or_host, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
        ).otherwise(url_or_host)
    )
    host = F.regexp_replace(F.regexp_replace(host, r"^www\.", ""), r":\d+$", "")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2), F.element_at(labels, -1)
    )
    is_2l = last2.isin(*SECOND_LEVEL_SUFFIXES)
    return (
        F.when(n <= 1, host)
        .when((n >= 3) & is_2l, last3)
        .when(is_2l, last2)  # the bare suffix itself; nothing below it
        .otherwise(last2)
    )


def domain_cap(
    df: DataFrame,
    domain_col: str,
    n_per_domain: int,
    order_col: str,
    salt_buckets: int | None = None,
    salt_cols: "list[str] | None" = None,
) -> DataFrame:
    """Keep at most ``n_per_domain`` rows per domain, preferring the
    smallest ``order_col`` (pass a quality-rank column; ties and
    determinism are the caller's ordering contract).  The FineWeb-style
    guard against one crawl-heavy domain dominating a training mix.

    Scale shape: a plain rank window shuffles EVERY row of a hot domain
    into one partition — at 100 TB a single news domain can be
    terabytes.  ``salt_buckets`` enables the two-phase form: phase one
    ranks within (domain, salt) groups and keeps ≤ n per group (a
    superset, ~n·buckets rows per domain), phase two ranks the
    survivors per domain — the same result with the heavy shuffle
    spread over ``salt_buckets`` keys.  Both phases are windows over
    rank-then-filter, so Catalyst pushes the limit into the sort."""
    out_cols = df.columns
    if salt_buckets is not None:
        if salt_buckets < 1:
            raise ValueError("domain_cap: salt_buckets must be >= 1")
        # salt over the row, not order_col alone: a hot domain whose
        # rows tie on a coarse quality rank (the common skew case)
        # would otherwise hash to ONE salt bucket and re-create the
        # single-partition shuffle the salting exists to spread.
        # ``salt_cols`` narrows the hash input — pass the cheap unique
        # id columns when the frame carries multi-KB payloads (hashing
        # the whole row costs per-byte on exactly the scale path this
        # targets); map-typed columns are excluded (xxhash64 cannot
        # hash maps).
        if salt_cols is None:
            salt_cols = [
                f.name
                for f in df.schema.fields
                if not isinstance(f.dataType, MapType)
            ]
        if not salt_cols:
            raise ValueError("domain_cap: no hashable salt columns")
        salted = df.withColumn(
            "__salt",
            F.pmod(
                F.xxhash64(*[F.col(c) for c in salt_cols]),
                F.lit(salt_buckets),
            ),
        )
        w1 = Window.partitionBy(domain_col, "__salt").orderBy(
            F.col(order_col).asc()
        )
        df = (
            salted.withColumn("__r1", F.row_number().over(w1))
            .where(F.col("__r1") <= n_per_domain)
            .drop("__salt", "__r1")
        )
    w = Window.partitionBy(domain_col).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= n_per_domain)
        .select(*out_cols)
    )


# ---------------------------------------------------------------------------
# HTML → text extraction


def html_text(col: Column) -> Column:
    """Visible text of an HTML page: drops comments, ``<script>`` and
    ``<style>`` blocks (their character data is code, not prose), then
    every remaining tag; decodes the core character entities; collapses
    whitespace runs to single spaces.

    This is the extraction step between WARC ingestion
    (``sources/warc.py``) and the text-quality tier (C4 strips tags the
    same way before its heuristics; trafilatura-class main-content DOM
    scoring is a model-weights upgrade behind the same column seam).
    Pure Catalyst ``regexp_replace`` chain — no UDF, whole-stage
    codegen, zero shuffle — and every pattern is RE2-compatible (no
    backreferences/lookaround), so a DuckDB oracle replays it verbatim.
    """
    c = F.regexp_replace(col, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),  # last, so &amp;lt; decodes to the literal &lt;
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, r"[ \t\r\n]+", " "))


def html_stats(col: Column, text: Column | None = None) -> dict[str, Column]:
    """Markup-shape features of a raw HTML page — the structural half
    of web-page quality filtering (text-to-markup ratio and link
    density are standard boilerplate-page signals; RefinedWeb §3.2
    filters on exactly these).  All Catalyst expressions, zero shuffle.

    Pass ``text`` when :func:`html_text` is already materialized as a
    projection attribute — the regex chain then runs once per row
    instead of once per stat that consumes it."""
    if text is None:
        text = html_text(col)
    html_chars = F.length(col)
    return {
        "n_tags": F.regexp_count(col, F.lit(r"<[A-Za-z!/]")),
        "n_links": F.regexp_count(col, F.lit(r"(?i)<a[ >]")),
        "title": F.regexp_extract(col, r"(?is)<title[^>]*>(.*?)</title>", 1),
        "text_chars": F.length(text),
        "html_chars": html_chars,
        "text_ratio": F.round(
            F.length(text) / F.greatest(html_chars, F.lit(1)), 6
        ),
    }


def html_links(col: Column) -> Column:
    """Outgoing hrefs of a page's anchor tags, as an array column — the
    edge-extraction step that turns a crawl into a link graph (PageRank
    / HITS / community detection feed from exactly this).  Accepts all
    three HTML attribute spellings — double-quoted, single-quoted, and
    unquoted — then strips the quote characters per element (real crawl
    markup mixes them; matching only one form silently loses edges).
    One RE2-compatible ``regexp_extract_all`` + an array transform,
    zero shuffle; resolution/normalization of the extracted URLs is
    :func:`normalize_url`'s job downstream."""
    raw = F.regexp_extract_all(
        col,
        F.lit("(?is)<a[^>]*href=(\"[^\"]*\"|'[^']*'|[^\\s>\"']+)"),
        F.lit(1),
    )
    return F.transform(
        raw, lambda h: F.regexp_replace(h, "^[\"']|[\"']$", "")
    )


# ---------------------------------------------------------------------------
# robots.txt compliance


def parse_robots_df(
    df: DataFrame,
    domain_col: str = "domain",
    text_col: str = "robots_txt",
) -> DataFrame:
    """Parse robots.txt bodies into a (domain, rule, prefix) table,
    keeping the rules of every group whose header names ``*`` — an RFC
    9309 §2.1 group is a maximal run of consecutive User-agent lines
    plus the rules that follow, so ``User-agent: *\\nUser-agent:
    Foobot\\nDisallow: /x`` applies to ``*`` even though ``*`` is not
    the last header line.  Distributes as a posexplode of lines + two
    windows PARTITIONED BY the document (group id = running count of
    group-starting UA lines, then any-star per group; no global order,
    no Python).  Handles
    comments, blank lines, case-insensitive directives, and CRLF.
    Wildcard patterns ('*' = any octet run, trailing '$' = end anchor —
    RFC 9309 §2.2.3) are KEPT verbatim in ``prefix``;
    :func:`robots_allowed` translates them to anchored regexes at match
    time (real Common Crawl robots bodies use wildcards heavily — a
    filter that drops those rules keeps pages a compliant crawler must
    not fetch)."""
    lines = df.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(F.split(F.col(text_col), "\r?\n")).alias("pos", "line"),
    ).select(
        "domain",
        "pos",
        # strip comments, then whitespace
        F.trim(F.regexp_replace("line", "#.*$", "")).alias("line"),
    )
    directive = F.lower(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1))
    value = F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:(.*)$", 1))
    tagged = lines.select(
        "domain",
        "pos",
        directive.alias("d"),
        value.alias("v"),
    ).where(F.col("d").isin("user-agent", "allow", "disallow"))
    # RFC 9309 §2.1 groups: a maximal run of consecutive User-agent
    # lines followed by rules.  A group STARTS at a UA line whose
    # preceding directive is not a UA line; a rule applies to '*' when
    # ANY of its group's UA lines is '*' (multi-agent group headers
    # like 'User-agent: *\nUser-agent: Googlebot\n...' are common).
    wseq = Window.partitionBy("domain").orderBy("pos")
    grouped = tagged.withColumn(
        "grp",
        F.sum(
            (
                (F.col("d") == "user-agent")
                & (
                    F.lag("d").over(wseq).isNull()
                    | (F.lag("d").over(wseq) != "user-agent")
                )
            ).cast("int")
        ).over(wseq.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    wgrp = Window.partitionBy("domain", "grp")
    starred = grouped.withColumn(
        "has_star",
        F.max(
            ((F.col("d") == "user-agent") & (F.lower(F.col("v")) == "*")).cast(
                "int"
            )
        ).over(wgrp),
    )
    return (
        starred.where(
            (F.col("d") != "user-agent")
            & (F.col("has_star") == 1)
            & (F.col("v") != "")  # 'Disallow:' (empty) = allow all: no rule
        )
        .select(
            "domain",
            F.col("d").alias("rule"),
            F.col("v").alias("prefix"),
        )
        .distinct()
    )


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    domain_col: str = "domain",
    path_col: str = "path",
) -> DataFrame:
    """RFC 9309 longest-match verdict per URL: among the domain's rules
    whose pattern matches the path, the LONGEST wins; a length tie goes
    to allow; no matching rule (or no robots.txt at all) = allowed.

    Wildcard patterns (RFC 9309 §2.2.3) are modeled in full: ``*``
    matches any octet run (including empty), a TRAILING ``$`` anchors
    the end of the path (a ``$`` anywhere else is a literal, matching
    the reference REP parser).  Each wildcard rule is translated once
    per domain-rule row into an anchored regex (metacharacters in the
    literal parts escaped); literal rules keep the ``startswith`` fast
    path.  Match LENGTH for the longest-match ranking is the FULL
    pattern octet count (only a trailing ``$`` uncounted), matching
    RFC 9309 / the reference REP parser's most-specific-match rule —
    ``*`` octets count like any other.  (ADVICE r10: ranking by
    literal-prefix length let a shorter literal Allow ``/ab`` outrank
    a wildcard Disallow ``/a*xyz`` and fail OPEN.)

    Scale shape: rules tables are small (one row per directive per
    domain), so they collapse to ONE array row per domain and
    broadcast-join against the url corpus — no fan-out by rule count,
    no re-aggregation shuffle, and the url frame's row multiplicity and
    column types are untouched (payload columns never enter a grouping
    key).  The verdict is a per-row ``F.aggregate`` fold over the
    domain's rule array in the projection — the match genuinely runs in
    the scan stage.  Rule scores encode lexicographic (length, allow)
    order as the integer ``2·match_len + is_allow`` so no
    struct-ordering is needed cross-engine.
    """
    pat = F.col("prefix")
    has_dollar = pat.endswith("$")
    core = F.when(
        has_dollar, F.expr("substring(prefix, 1, length(prefix) - 1)")
    ).otherwise(pat)
    wild = core.contains("*") | has_dollar
    # escape regex metachars in the literal parts (everything but '*'),
    # then '*' -> '.*'; '^' start-anchor always, '$' end-anchor only
    # when the raw pattern ends in '$'
    esc = F.regexp_replace(core, r"([.^$+?(){}\[\]|\\])", r"\\$1")
    rx = F.concat(
        F.lit("^"),
        F.replace(esc, F.lit("*"), F.lit(".*")),
        F.when(has_dollar, F.lit("$")).otherwise(F.lit("")),
    )
    match_len = F.length(core)
    per_domain = rules.groupBy(domain_col).agg(
        F.collect_list(
            F.struct(
                F.col("prefix").alias("p"),
                wild.alias("w"),
                rx.alias("rx"),
                (match_len * 2 + (F.col("rule") == "allow").cast("int"))
                .cast("long")
                .alias("s"),
            )
        ).alias("__rules")
    )
    joined = urls.join(F.broadcast(per_domain), on=domain_col, how="left")
    # fold: best score among rules whose pattern matches the path; -1 =
    # no matching rule; a domain absent from the rules table gives a
    # null array -> null fold result.  Both default to allowed.
    best = F.aggregate(
        F.col("__rules"),
        F.lit(-1).cast("long"),
        lambda acc, r: F.when(
            F.when(r["w"], F.rlike(F.col(path_col), r["rx"]))
            .otherwise(F.col(path_col).startswith(r["p"]))
            & (r["s"] > acc),
            r["s"],
        ).otherwise(acc),
    )
    return joined.select(
        *urls.columns,
        ((F.coalesce(best, F.lit(-1)) < 0) | (best % 2 == 1)).alias(
            "allowed"
        ),
    )
