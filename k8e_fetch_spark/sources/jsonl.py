"""JSON-lines source/sink — the interchange format raw LLM corpora
actually ship in (one JSON document per line, optionally gzip'd).

The reference ingests only CSV-in-zip (/root/reference/bin/
fetcher.bash:96-120); this source extends the same ingest layer to the
jsonl corpora a training-data pipeline meets first. Design rules for
100 TB:

- **Explicit schema, never inference.** ``spark.read.json`` without a
  schema runs a FULL extra pass over the data just to guess types —
  at corpus scale that doubles the read before work starts, and two
  samples can infer different schemas (silent drift). Callers pass the
  schema; :data:`DOCUMENTS_SCHEMA` covers the documents-table shape.
- **Line-delimited only (``multiLine=False``).** Line-delimited JSON
  splits on newlines, so a 1 TB file fans out across tasks; a
  multi-line JSON array is ONE unsplittable task. The format choice is
  the scalability choice.
- **Malformed lines are data, not crashes.** Real crawls contain
  truncated/garbage lines. PERMISSIVE mode parses what it can and
  captures the raw text of bad lines in a corrupt-record column the
  caller can count, quarantine, or drop — same philosophy as the
  quote-repair stage (operators/repair.py): repair/record, don't
  abort a 10-hour job on row 9 billion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

#: documents-table shape (TESTDATA.md) for explicit-schema reads.
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Read line-delimited JSON with an explicit schema.

    ``keep_corrupt=True`` (default) appends :data:`CORRUPT_COL` holding
    the raw text of unparseable lines (null for good rows) so the
    pipeline can quarantine them; ``False`` uses DROPMALFORMED and bad
    lines silently disappear — only for sources already validated
    upstream.

    The corrupt-capturing path reads ``text`` + ``from_json`` rather
    than the JSON datasource's columnNameOfCorruptRecord: Spark
    disallows plans whose scan references ONLY the internal corrupt
    column (the quarantine count would throw), and the official
    workaround — cache the whole parse — is exactly what a 100 TB read
    must not do. A text scan stays newline-splittable and ``from_json``
    is the same JVM Jackson parse, so this costs nothing and the
    quarantine frame composes freely.
    """
    if keep_corrupt:
        full = T.StructType(
            schema.fields + [T.StructField(CORRUPT_COL, T.StringType())]
        )
        # skip truly-empty lines, exactly like the JSON datasource does
        # (a trailing newline or blank separator is formatting, not a
        # corrupt record — leaving them in would inflate quarantine
        # counts relative to the keep_corrupt=False path); whitespace-only
        # lines stay, and parse as corrupt, on both paths.
        raw = spark.read.text(path).filter(F.col("value") != "")
        parsed = raw.select(
            F.from_json(
                F.col("value"),
                full,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
            ).alias("_r"),
            F.col("value"),
        )
        # from_json yields a null struct for lines that are not JSON at
        # all and fills CORRUPT_COL for partially-parseable garbage —
        # coalesce the two failure shapes into one quarantine column.
        return parsed.select(
            *[F.col(f"_r.{f.name}").alias(f.name) for f in schema.fields],
            F.when(F.col("_r").isNull(), F.col("value"))
            .otherwise(F.col(f"_r.{CORRUPT_COL}"))
            .alias(CORRUPT_COL),
        )
    return spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)


def write_jsonl(df: DataFrame, path: str, compression: str | None = "gzip") -> None:
    """Write line-delimited JSON (default gzip per part file — the
    shape jsonl corpora are distributed in). One file per partition;
    upstream ``repartition`` controls part count/size."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good rows without the corrupt column, quarantined raw lines).

    The quarantine frame keeps only the raw line text — the record of
    what was skipped, ready for a repair pass or an error sink."""
    good = df.filter(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    bad = df.filter(df[CORRUPT_COL].isNotNull()).select(CORRUPT_COL)
    return good, bad
