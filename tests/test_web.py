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
