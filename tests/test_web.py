"""Web-corpus curation operators (operators/web.py) and the Gopher
quality-rule battery (text.py gopher_rules)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kevinlang_spark.operators.text import gopher_rules
from kevinlang_spark.operators.web import (
    domain_cap,
    normalize_url,
    registered_domain,
)


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r[0] for r in df.select(normalize_url(F.col("url"))).collect()]


def _dom(spark, vals):
    df = spark.createDataFrame([(u,) for u in vals], "url string")
    return [r[0] for r in df.select(registered_domain(F.col("url"))).collect()]


def test_normalize_url_canonicalizes(spark):
    got = _norm(
        spark,
        [
            "HTTPS://WWW.Example.COM:443/Docs/3/?utm_source=x&z=9&a=1#frag",
            "http://example.com:80/path",
            "https://example.com/path/?b=2&a=1",
            "https://example.com/",
            "https://sub.example.co.uk/x?fbclid=abc&gclid=1",
        ],
    )
    assert got == [
        "https://example.com/Docs/3?a=1&z=9",
        "http://example.com/path",
        "https://example.com/path?a=1&b=2",
        "https://example.com",
        "https://sub.example.co.uk/x",
    ]


def test_normalize_url_equivalent_spellings_collide(spark):
    a, b = _norm(
        spark,
        [
            "HTTPS://WWW.News.Example.com/a/b/?z=1&a=2&utm_medium=m",
            "https://news.example.com/a/b?a=2&z=1",
        ],
    )
    assert a == b


def test_normalize_url_null_passthrough(spark):
    assert _norm(spark, [None]) == [None]


def test_registered_domain_psl_lite(spark):
    got = _dom(
        spark,
        [
            "https://a.b.news.co.uk/path",  # two-level suffix
            "https://cdn.example.com/x",
            "http://WWW.Example.COM.AU:8080/",
            "bare-host.org",  # not a URL
            "localhost",  # single label
            "https://example.com/",  # exactly registrable
        ],
    )
    assert got == [
        "news.co.uk",
        "example.com",
        "example.com.au",
        "bare-host.org",
        "localhost",
        "example.com",
    ]


@pytest.fixture()
def dom_df(spark):
    rows = [(i, f"d{i % 3}.com", i) for i in range(30)]
    return spark.createDataFrame(rows, "id bigint, domain string, rank bigint")


def test_domain_cap_keeps_lowest_n(dom_df):
    got = domain_cap(dom_df, "domain", 2, "rank")
    by_dom = {}
    for r in got.collect():
        by_dom.setdefault(r["domain"], []).append(r["id"])
    assert {d: sorted(v) for d, v in by_dom.items()} == {
        "d0.com": [0, 3],
        "d1.com": [1, 4],
        "d2.com": [2, 5],
    }
    assert got.columns == dom_df.columns  # helper columns dropped


def test_domain_cap_salted_equals_plain(dom_df):
    plain = sorted(tuple(r) for r in domain_cap(dom_df, "domain", 4, "rank").collect())
    for buckets in (1, 3, 16):
        salted = sorted(
            tuple(r)
            for r in domain_cap(
                dom_df, "domain", 4, "rank", salt_buckets=buckets
            ).collect()
        )
        assert salted == plain, buckets


def test_domain_cap_param_guard(dom_df):
    with pytest.raises(ValueError, match="salt_buckets"):
        domain_cap(dom_df, "domain", 2, "rank", salt_buckets=0)


def test_gopher_rules_rule_by_rule(spark):
    good = " ".join(
        ["the quick brown fox jumps over lazy dogs with energy and that"] * 6
    )
    rows = [
        (1, good),  # passes everything
        (2, "short text"),  # word count + stopwords fail
        (3, None),  # null text
        (4, "- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\n- j"),  # bullets
        (5, "#### " * 60),  # symbol ratio
        (6, "\n".join(["keep going..."] * 10)),  # ellipsis lines
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in gopher_rules(df, min_words=5).collect()}
    assert got[1]["passes"] and got[1]["n_stopwords"] >= 4
    assert not got[2]["r_word_count"] and not got[2]["r_stopwords"]
    assert not got[3]["passes"] and got[3]["n_words"] is None
    assert got[4]["bullet_line_ratio"] == 1.0 and not got[4]["r_bullets"]
    assert got[5]["symbol_ratio"] > 0.1 and not got[5]["r_symbols"]
    assert got[6]["ellipsis_line_ratio"] == 1.0 and not got[6]["r_ellipses"]


def test_domain_cap_salted_plan_pushes_partial_limits(spark):
    """The scale contract: Spark must push WindowGroupLimit PARTIAL
    below BOTH exchanges (map-side top-n per (domain, salt) group, then
    per domain), so a hot domain ships ~n·buckets rows, not its whole
    corpus."""
    rows = [(i, f"d{i % 3}.com", i) for i in range(30)]
    df = spark.createDataFrame(rows, "id bigint, domain string, rank bigint")
    capped = domain_cap(df, "domain", 3, "rank", salt_buckets=4)
    capped.collect()  # AQE: final plan exists only after execution
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert plan.count("WindowGroupLimit") >= 4, plan  # 2 phases × (Partial+Final)
    assert "Partial" in plan.split("Exchange")[-1], plan  # one below the 1st exchange


def test_gopher_rules_trim_is_unary(spark):
    """Spark 4 regression trap: F.trim grew an optional second
    parameter, so passing it BARE to F.transform receives (element,
    index) and trims each line's own index digits.  A line that starts
    and ends with its index digit must survive intact."""
    text = "zero line\n1 one ends 1\n- bullet"
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    r = gopher_rules(df, min_words=1).first()
    # 3 non-empty lines, exactly one bullet; the buggy trim would not
    # change the count here, but it WOULD have emptied a line '1' — so
    # pin the ratio AND a line consisting only of its index digit
    assert abs(r["bullet_line_ratio"] - 1 / 3) < 1e-12
    df2 = spark.createDataFrame([(2, "x\n1\n- b")], "doc_id bigint, text string")
    r2 = gopher_rules(df2, min_words=1).first()
    # line '1' at index 1: bare-F.trim trims it to '' (2 lines, ratio
    # 1/2); the unary trim keeps 3 lines, bullet ratio 1/3
    assert abs(r2["bullet_line_ratio"] - 1 / 3) < 1e-12


# ---------------------------------------------------------------------------
# HTML → text extraction


_PAGE = (
    "<html><head><title>T &amp; Co</title><style>p{color:red}</style></head>"
    "<body><NAV>Home</NAV><!-- hidden --><p>Hello &lt;world&gt;&nbsp;end</p>"
    "<script type='x'>var s = '<p>not text</p>';</script>"
    "<a href='/x'>link</a>\n\t<A HREF='y'>Link2</A></body></html>"
)


def test_html_text_strips_markup(spark):
    from kevinlang_spark.operators.web import html_text

    df = spark.createDataFrame(
        [
            (_PAGE,),
            ("plain no markup",),
            ("<p>multi\r\nline   spaces</p>",),
            ("<script>a</script><p>b</p><script>c</script>",),
            ("&amp;lt; decodes once",),
        ],
        "html string",
    )
    got = [r["t"] for r in df.select(html_text(F.col("html")).alias("t")).collect()]
    assert got == [
        "T & Co Home Hello <world> end link Link2",
        "plain no markup",
        "multi line spaces",
        "b",  # script char data is code, not prose — both blocks drop
        "&lt; decodes once",  # entity decode is single-pass
    ]


def test_html_stats_features(spark):
    from kevinlang_spark.operators.web import html_stats

    df = spark.createDataFrame([(_PAGE,)], "html string")
    stats = html_stats(F.col("html"))
    r = df.select(*[v.alias(k) for k, v in stats.items()]).first()
    assert r["title"] == "T &amp; Co"  # raw slice of the source bytes
    assert r["n_links"] == 2  # case-insensitive <a …>
    assert r["n_tags"] == len(_PAGE.split("<")) - 1
    assert r["html_chars"] == len(_PAGE)
    assert 0 < r["text_ratio"] < 1
    assert abs(r["text_ratio"] - round(r["text_chars"] / len(_PAGE), 6)) < 1e-12


def test_html_text_plan_is_scan_only(spark):
    from kevinlang_spark.operators.web import html_text

    df = spark.range(10).select(
        F.concat(F.lit("<p>"), F.col("id"), F.lit("</p>")).alias("html")
    )
    plan = (
        df.select(html_text(F.col("html")).alias("t"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_html_links_all_quote_forms(spark):
    from kevinlang_spark.operators.web import html_links

    html = (
        '<a href="/dq">a</a> <A HREF=\'/sq\'>b</A> '
        "<a class='x' href=/uq>c</a> <a>no href</a>"
    )
    df = spark.createDataFrame([(html,)], "html string")
    got = df.select(html_links(F.col("html")).alias("l")).first()["l"]
    assert got == ["/dq", "/sq", "/uq"]


# ---------------------------------------------------------------------------
# robots.txt compliance


_ROBOTS = """# corpus crawler policy
User-agent: SpecialBot
Disallow: /

User-Agent: *
Disallow: /private
Allow: /private/ok
Disallow: /tmp/   # trailing comment
Allow:
Disallow: /wild*card

User-agent: *
Disallow: /extra
"""


def _robots_rules(spark):
    from kevinlang_spark.operators.web import parse_robots_df

    df = spark.createDataFrame(
        [("example.com", _ROBOTS)], "domain string, robots_txt string"
    )
    return parse_robots_df(df)


def test_parse_robots_groups_and_comments(spark):
    rules = {(r["rule"], r["prefix"]) for r in _robots_rules(spark).collect()}
    assert rules == {
        ("disallow", "/private"),
        ("allow", "/private/ok"),
        ("disallow", "/tmp/"),  # comment stripped
        ("disallow", "/extra"),  # second * group still applies
        ("disallow", "/wild*card"),  # wildcard rules kept (RFC 9309 §2.2.3)
        # SpecialBot's 'Disallow: /' excluded; empty Disallow dropped
    }


def test_robots_longest_match_semantics(spark):
    from kevinlang_spark.operators.web import robots_allowed

    urls = spark.createDataFrame(
        [
            ("example.com", "/public/page"),  # no rule matches → allow
            ("example.com", "/private/doc"),  # disallow /private
            ("example.com", "/private/ok/doc"),  # longer allow wins
            ("example.com", "/tmp/x"),  # disallow
            ("example.com", "/extra/y"),  # second-group disallow
            ("other.org", "/private/doc"),  # no robots at all → allow
        ],
        "domain string, path string",
    )
    got = {
        (r["domain"], r["path"]): r["allowed"]
        for r in robots_allowed(urls, _robots_rules(spark)).collect()
    }
    assert got == {
        ("example.com", "/public/page"): True,
        ("example.com", "/private/doc"): False,
        ("example.com", "/private/ok/doc"): True,
        ("example.com", "/tmp/x"): False,
        ("example.com", "/extra/y"): False,
        ("other.org", "/private/doc"): True,
    }


def test_robots_tie_goes_to_allow(spark):
    from kevinlang_spark.operators.web import robots_allowed

    rules = spark.createDataFrame(
        [("d.com", "allow", "/p"), ("d.com", "disallow", "/p")],
        "domain string, rule string, prefix string",
    )
    urls = spark.createDataFrame(
        [("d.com", "/p/x")], "domain string, path string"
    )
    assert robots_allowed(urls, rules).first()["allowed"] is True


def test_parse_robots_multi_agent_group_header(spark):
    """RFC 9309 §2.1: a group header may list several User-agent lines;
    the rules apply to '*' when ANY of them is '*' — even when '*' is
    not the LAST header line (a very common real-world shape)."""
    from kevinlang_spark.operators.web import parse_robots_df

    body = (
        "User-agent: *\nUser-agent: Foobot\nDisallow: /private\n\n"
        "User-agent: Barbot\nDisallow: /bar-only\n"
    )
    df = spark.createDataFrame(
        [("m.com", body)], "domain string, robots_txt string"
    )
    rules = {(r["rule"], r["prefix"]) for r in parse_robots_df(df).collect()}
    assert rules == {("disallow", "/private")}


def test_robots_allowed_preserves_multiplicity_and_column_types(spark):
    """The verdict is computed per-row in the projection: identical
    duplicate rows stay duplicated (no groupBy collapse) and
    un-groupable column types (maps) pass through untouched."""
    from pyspark.sql import functions as F

    from kevinlang_spark.operators.web import robots_allowed

    rules = spark.createDataFrame(
        [("d.com", "disallow", "/p")],
        "domain string, rule string, prefix string",
    )
    urls = spark.createDataFrame(
        [("d.com", "/p/x"), ("d.com", "/p/x")],
        "domain string, path string",
    ).withColumn("meta", F.create_map(F.lit("k"), F.lit("v")))
    out = robots_allowed(urls, rules).collect()
    assert len(out) == 2
    assert all(r["allowed"] is False for r in out)
    assert all(r["meta"] == {"k": "v"} for r in out)


def test_robots_allowed_plan_is_broadcast_no_url_shuffle(spark):
    """Scale shape: the url corpus joins ONE broadcast row per domain
    and the verdict folds in the projection — the plan must show a
    BroadcastHashJoin and no Exchange on the streamed (url) side."""
    from kevinlang_spark.operators.web import robots_allowed

    rules = spark.createDataFrame(
        [("d.com", "disallow", "/p")],
        "domain string, rule string, prefix string",
    )
    urls = spark.createDataFrame(
        [("d.com", "/p/x")], "domain string, path string"
    )
    plan = (
        robots_allowed(urls, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    # exactly one hash exchange total — the (tiny) rules-side groupBy;
    # the url corpus itself is never shuffled
    assert plan.count("Exchange hashpartitioning") <= 1


def test_robots_wildcard_rfc_examples(spark):
    """RFC 9309 §2.2.3 / Google REP reference examples: '*' matches any
    octet run, trailing '$' anchors the path end, '$' elsewhere is a
    literal, and regex metachars in patterns stay literal."""
    from kevinlang_spark.operators.web import robots_allowed

    rules = spark.createDataFrame(
        [
            ("a.com", "disallow", "/*.php$"),
            ("b.com", "disallow", "/fish*"),
            ("c.com", "disallow", "/a$b"),     # embedded $ is literal
            ("d.com", "disallow", "/x(1)*y"),  # metachars stay literal
        ],
        "domain string, rule string, prefix string",
    )
    urls = spark.createDataFrame(
        [
            ("a.com", "/filename.php"),          # anchored match → blocked
            ("a.com", "/folder/filename.php"),   # * spans folders → blocked
            ("a.com", "/filename.php5"),         # $ anchor fails → allowed
            ("a.com", "/filenameXphp"),          # '.' literal → allowed
            ("b.com", "/fish"),                  # '*' matches empty → blocked
            ("b.com", "/fishheads/catfish"),     # blocked
            ("b.com", "/Fish.asp"),              # case-sensitive → allowed
            ("c.com", "/a$b/c"),                 # literal $ prefix → blocked
            ("c.com", "/ab/c"),                  # allowed
            ("d.com", "/x(1)zzy"),               # blocked
            ("d.com", "/x1zzy"),                 # allowed
        ],
        "domain string, path string",
    )
    got = {
        (r["domain"], r["path"]): r["allowed"]
        for r in robots_allowed(urls, rules).collect()
    }
    assert got == {
        ("a.com", "/filename.php"): False,
        ("a.com", "/folder/filename.php"): False,
        ("a.com", "/filename.php5"): True,
        ("a.com", "/filenameXphp"): True,
        ("b.com", "/fish"): False,
        ("b.com", "/fishheads/catfish"): False,
        ("b.com", "/Fish.asp"): True,
        ("c.com", "/a$b/c"): False,
        ("c.com", "/ab/c"): True,
        ("d.com", "/x(1)zzy"): False,
        ("d.com", "/x1zzy"): True,
    }


def test_robots_wildcard_precedence_full_pattern_ranking(spark):
    """Longest-match ranking counts a wildcard rule's FULL pattern
    octets (RFC 9309 most-specific-match; trailing '$' uncounted): a
    longer literal Allow carve-out beats 'Disallow: /private*', and a
    wildcard Allow with more pattern octets beats a shorter
    Disallow."""
    from kevinlang_spark.operators.web import robots_allowed

    rules = spark.createDataFrame(
        [
            ("e.com", "disallow", "/private*"),   # match_len 9
            ("e.com", "allow", "/private/ok"),    # match_len 11 → wins
            ("f.com", "disallow", "/*.tmp$"),     # match_len 6
            ("f.com", "allow", "/blog/keep*.tmp$"),  # match_len 15 → wins
        ],
        "domain string, rule string, prefix string",
    )
    urls = spark.createDataFrame(
        [
            ("e.com", "/private/doc"),
            ("e.com", "/private/ok/doc"),
            ("f.com", "/blog/draft1.tmp"),
            ("f.com", "/blog/keep2.tmp"),
        ],
        "domain string, path string",
    )
    got = {
        (r["domain"], r["path"]): r["allowed"]
        for r in robots_allowed(urls, rules).collect()
    }
    assert got == {
        ("e.com", "/private/doc"): False,
        ("e.com", "/private/ok/doc"): True,
        ("f.com", "/blog/draft1.tmp"): False,
        ("f.com", "/blog/keep2.tmp"): True,
    }


def test_robots_wildcard_outranks_shorter_literal_allow(spark):
    """ADVICE r10 regression: a wildcard Disallow '/a*xyz' (6 pattern
    octets) must OUTRANK a shorter literal Allow '/ab' (3 octets) on a
    path both match — under the old literal-prefix ranking ('/a*xyz'
    scored 2) the Allow won and the verdict failed open."""
    from kevinlang_spark.operators.web import robots_allowed

    rules = spark.createDataFrame(
        [
            ("g.com", "disallow", "/a*xyz"),  # full len 6 → wins
            ("g.com", "allow", "/ab"),        # len 3
        ],
        "domain string, rule string, prefix string",
    )
    urls = spark.createDataFrame(
        [
            ("g.com", "/abqxyz"),   # both match → disallow (6 > 3)
            ("g.com", "/abonly"),   # only the allow matches → allowed
        ],
        "domain string, path string",
    )
    got = {
        (r["domain"], r["path"]): r["allowed"]
        for r in robots_allowed(urls, rules).collect()
    }
    assert got == {
        ("g.com", "/abqxyz"): False,
        ("g.com", "/abonly"): True,
    }
