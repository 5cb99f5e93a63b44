"""Web curation operators (operators/web.py): host parsing edges,
registered-domain fold, blocklist, per-domain cap semantics, and the
WindowGroupLimit pushdown the cap's scale story rests on."""

from __future__ import annotations

from pyspark.sql import functions as F

from k8e_fetch_spark.operators.web import (
    domain_blocklist_filter,
    domain_cap,
    host_of,
    registered_domain,
)


def test_host_of_edges(spark):
    cases = [
        ("https://Example.COM/path?q=1", "example.com"),
        ("http://sub.a.co.uk:8080/x", "sub.a.co.uk"),  # port stripped
        ("ftp://files.example.net", "files.example.net"),
        ("https://host.io#frag", "host.io"),
        ("not a url at all", ""),
        ("//schemeless.example.com/x", ""),  # scheme required
    ]
    df = spark.createDataFrame(cases, "url string, want string")
    bad = df.select("want", host_of(F.col("url")).alias("got")).filter(
        F.col("want") != F.col("got")
    )
    assert bad.count() == 0, bad.collect()


def test_registered_domain_fold(spark):
    cases = [
        ("cdn.img.boilerplate.com", "boilerplate.com"),
        ("example.org", "example.org"),
        ("localhost", "localhost"),  # single label: kept as-is
        ("", ""),
    ]
    df = spark.createDataFrame(cases, "host string, want string")
    bad = df.select("want", registered_domain(F.col("host")).alias("got")).filter(
        F.col("want") != F.col("got")
    )
    assert bad.count() == 0, bad.collect()


def test_blocklist_and_cap(spark):
    rows = [(i, "hot.example" if i < 10 else ("bad.net" if i < 12 else f"t{i}.org")) for i in range(15)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    kept = domain_cap(
        domain_blocklist_filter(df, "domain", ["bad.net"]), "domain", "doc_id", 3
    )
    got = {(r["doc_id"], r["domain"]) for r in kept.collect()}
    # hot domain capped to its 3 lowest doc_ids; blocklisted rows gone
    assert {(0, "hot.example"), (1, "hot.example"), (2, "hot.example")} <= got
    assert not any(d == "hot.example" and i > 2 for i, d in got)
    assert not any(d == "bad.net" for _, d in got)
    assert len(got) == 3 + 3  # 3 hot survivors + 3 tail domains


def test_domain_cap_pushes_group_limit(spark):
    """The cap's 100 TB argument: the rank filter must appear as
    WindowGroupLimit below the exchange, so a mega domain ships only
    cap rows per map partition."""
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("domain")
    )
    plan = domain_cap(df, "domain", "doc_id", 5)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


def test_registered_domain_psl_fold(spark):
    """PSL longest-match: 2-label suffixes, 3-label suffixes, plain
    TLDs, and the under-length edges — cross-checked against the DuckDB
    rendering so the two engines cannot drift."""
    from k8e_fetch_spark.operators.web import (
        registered_domain_psl,
        sql_registered_domain_psl,
    )

    cases = [
        ("shop.acme.co.uk", "acme.co.uk"),
        ("blog.acme.co.uk", "acme.co.uk"),
        ("acme.co.uk", "acme.co.uk"),
        ("co.uk", "co.uk"),  # a bare public suffix has no registrable label
        ("cdn.img.boilerplate.com", "boilerplate.com"),
        ("example.org", "example.org"),
        ("deep.sub.school.city.nagoya.jp", "school.city.nagoya.jp"),  # 3-label suffix
        ("city.nagoya.jp", "city.nagoya.jp"),
        ("www.site.k12.ma.us", "site.k12.ma.us"),
        ("localhost", "localhost"),
        ("", ""),
    ]
    df = spark.createDataFrame(cases, "host string, want string")
    bad = df.select(
        "want", registered_domain_psl(F.col("host")).alias("got")
    ).filter(F.col("want") != F.col("got"))
    assert bad.count() == 0, bad.collect()

    import duckdb

    con = duckdb.connect()
    expr = sql_registered_domain_psl("host")
    for host, want in cases:
        got = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS host)", [host]
        ).fetchone()[0]
        assert got == want, (host, got, want)
    con.close()


CANON_CASES = [
    # (raw, canonical) — each axis the canonicalizer must fold
    ("HTTP://WWW.Example.COM:80/A/b/", "http://www.example.com/A/b"),
    ("http://www.example.com/A/b", "http://www.example.com/A/b"),
    ("https://h.io:443/x?b=2&a=1", "https://h.io/x?a=1&b=2"),
    ("https://h.io:8443/x?a=1&b=2", "https://h.io:8443/x?a=1&b=2"),
    ("http://h.io:8080/", "http://h.io:8080"),
    ("http://h.io/p?utm_source=f&utm_id=9&id=3#frag", "http://h.io/p?id=3"),
    ("http://h.io/p?fbclid=XYZ&gclid=1", "http://h.io/p"),
    ("http://h.io/?", "http://h.io"),
    ("http://h.io", "http://h.io"),
    # path case is NOT folded (case-significant per RFC 3986); only
    # scheme/host are
    ("hTtPs://MiXeD.Io/KeepCase", "https://mixed.io/KeepCase"),
    # utm_ prefix match must not eat a legit 'utmost' param
    ("http://h.io/p?utmost=1&z=2", "http://h.io/p?utmost=1&z=2"),
]


def test_canonical_url_pinned_cases(spark):
    from k8e_fetch_spark.operators.web import canonical_url

    df = spark.createDataFrame([(i, raw) for i, (raw, _) in enumerate(CANON_CASES)],
                               "i int, url string")
    got = {r["i"]: r["c"] for r in df.select("i", canonical_url(F.col("url")).alias("c")).collect()}
    for i, (raw, want) in enumerate(CANON_CASES):
        assert got[i] == want, (raw, got[i], want)


def test_sql_canonical_url_twin_matches_spark(spark):
    """The DuckDB rendering is generated from the same regexes; run it
    on the same fixtures and require bit equality with the Spark side
    (the drift guard every paired operator carries)."""
    import duckdb

    from k8e_fetch_spark.operators.web import sql_canonical_url

    con = duckdb.connect()
    expr = sql_canonical_url("url")
    for raw, want in CANON_CASES:
        got = con.execute(f"SELECT {expr} FROM (SELECT ? AS url)", [raw]).fetchone()[0]
        assert got == want, (raw, got, want)
