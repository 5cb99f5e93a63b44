"""Web-corpus curation front door: host / registered-domain extraction,
domain blocklists, per-domain document caps.

The C4 / RefinedWeb-class pipelines gate on the URL before any text
processing: drop blocklisted domains, cap how many documents any one
registered domain may contribute (a handful of template-heavy hosts
otherwise dominate a crawl), and carry the domain as a grouping key for
later mixing. Everything here is a pure column expression except the
cap, which is ONE window shuffle on the registered domain.

Scale (100 TB): host/domain extraction is scan-local regex (pushed
into the projection, whole-stage codegen); the blocklist is a literal
``isin`` for small lists (broadcast anti-join is the drop-in upgrade
for a large one — same call shape); the per-domain cap is a
``row_number`` window partitioned by domain, and Spark's
WindowGroupLimit pushes the ``<= cap`` limit below the exchange, so a
10M-document boilerplate domain ships only its first ``cap`` survivors
per map partition instead of the whole cluster of rows.

Registered-domain note: the last-two-labels rule here is deliberately
naive (``co.uk``-style public suffixes fold wrong). The production
form broadcasts the public-suffix list as a map and takes the longest
matching suffix + 1 label — same plan shape, a lookup join instead of
a slice. The declared query pins the naive rule on planted hosts where
the two coincide.

Reference parity: the k8e-fetch reference has no web stage; this is
part of the LLM-pipeline extension surface (SURVEY.md §2.6).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# scheme://host[:port]/... -> host (no port, no path/query/fragment)
HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)"


def host_of(url: Column) -> Column:
    """Lowercased hostname of a URL ('' when the URL does not parse —
    RE2-compatible pattern so the DuckDB oracle runs it verbatim)."""
    return F.lower(F.regexp_extract(url, HOST_RE, 1))


def registered_domain(host: Column) -> Column:
    """Naive registered domain: the last two dot-labels of the host
    (the host itself when it has fewer). See module docstring for the
    public-suffix upgrade path."""
    parts = F.split(host, r"\.")
    return F.when(
        F.size(parts) >= 2, F.concat_ws(".", F.slice(parts, -2, 2))
    ).otherwise(host)


def domain_blocklist_filter(
    df: DataFrame, domain_col: str, blocked: Sequence[str]
) -> DataFrame:
    """Drop rows whose registered domain is blocklisted. Literal
    ``isin`` — for a large blocklist, swap in a broadcast left-anti
    join on the same column (identical semantics)."""
    return df.filter(~F.col(domain_col).isin(list(blocked)))


def domain_cap(
    df: DataFrame, domain_col: str, order_col: str, cap: int
) -> DataFrame:
    """Keep at most ``cap`` rows per registered domain, by ascending
    ``order_col`` (deterministic: first-crawled wins). One window
    shuffle; the rank filter is pushed below the exchange by
    WindowGroupLimit."""
    w = Window.partitionBy(domain_col).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )
