"""Header normalization + malformed-CSV repair (SURVEY.md §2.3).

Re-expresses the reference's two sed scripts, which are interposed in
the sqlite import pipe (/root/reference/bin/fetcher.bash:120):

- ``bin/header_fix:1-2`` / ``bin/quotequote:5-6``: header row only —
  spaces -> underscores, lowercase;
- ``bin/quotequote:3-4``: quote repair on data rows —
  (a) ``s/ \\("[^",]*\\)"/ "\\1""/g``  (nickname quotes: double the
      closing quote of a space-preceded quoted token, RFC-4180-ish),
  (b) ``s/\\([A-Z]\\)"\\([A-Z]\\)/\\1'\\2/g`` (a stray ``"`` between two
      capitals becomes ``'``: O"BRIEN -> O'BRIEN).

Spark-first: header normalization is a rename (pure metadata, zero
cost); quote repair is a ``regexp_replace`` chain — JVM-side, inside
whole-stage codegen, applied to the raw text line before CSV parsing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java-regex translations of bin/quotequote:3-4 (patterns are identical
# in RE2, so the DuckDB oracle uses the same pattern strings with \\1
# backreference syntax instead of $1).
NICKNAME_QUOTE_PATTERN = ' ("[^",]*)"'
# sed replacement is ` "\1""`: note the extra leading `"` BEFORE the
# captured group (which itself starts with `"`) — net effect doubles
# BOTH quotes:  JOHN "JACK" SMITH -> JOHN ""JACK"" SMITH.
NICKNAME_QUOTE_REPLACEMENT = ' "$1""'
CAPS_QUOTE_PATTERN = '([A-Z])"([A-Z])'
CAPS_QUOTE_REPLACEMENT = "$1'$2"


def normalize_header_name(name: str) -> str:
    """One header cell: strip, spaces->underscores, lowercase."""
    return name.strip().replace(" ", "_").lower()


def normalize_headers(df: DataFrame) -> DataFrame:
    """op-header-norm: normalize all column names (metadata-only)."""
    return df.toDF(*[normalize_header_name(c) for c in df.columns])


def quote_repair(col: Column | str) -> Column:
    """op-quote-repair: the two-pass sed repair as a regexp_replace
    chain (order matters: sed applies :3 then :4)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, NICKNAME_QUOTE_PATTERN, NICKNAME_QUOTE_REPLACEMENT)
    c = F.regexp_replace(c, CAPS_QUOTE_PATTERN, CAPS_QUOTE_REPLACEMENT)
    return c


def quote_repair_sql(expr: str) -> str:
    """The identical repair as DuckDB SQL (RE2 \\1 backrefs, 'g' flag)."""
    return (
        "regexp_replace(regexp_replace("
        + expr
        + ", ' (\"[^\",]*)\"', ' \"\\1\"\"', 'g'), '([A-Z])\"([A-Z])', '\\1''\\2', 'g')"
    )
