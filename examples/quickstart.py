#!/usr/bin/env python
"""Quickstart: the three front doors of the engine.

    python examples/quickstart.py [sf_dir]

1. SQL      — register the tables, run plain spark.sql.
2. Queries  — call any declared operator from the registry by name.
3. Pipeline — run the cfg-driven fetch→load→compress flow on the
              checked-in raw-text fixtures (zip + LATIN1/UTF-16 +
              malformed quotes), landing dimension tables.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from k8e_fetch_spark.io import register_views  # noqa: E402
from k8e_fetch_spark.plans.pipeline import Pipeline  # noqa: E402
from k8e_fetch_spark.plans.spec import DEFAULT_SPEC  # noqa: E402
from k8e_fetch_spark.queries import queries  # noqa: E402
from k8e_fetch_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="quickstart", cpus=8, shuffle_partitions=8)

    # 1. SQL front door
    register_views(spark, sf_dir)
    print("== SQL: revenue by return flag ==")
    spark.sql(
        "SELECT l_returnflag, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
        "FROM lineitem GROUP BY 1 ORDER BY 1"
    ).show()

    # 2. Declared queries by name
    qs = queries()
    print("== query registry: dedup_exact_documents ==")
    qs["dedup_exact_documents"](spark, sf_dir).orderBy("keep_doc_id").show(5, truncate=40)

    # 3. The reference pipeline on the packaged byte-level fixtures
    from k8e_fetch_spark.resources import fixtures_root

    fixtures = fixtures_root()
    with tempfile.TemporaryDirectory(prefix="quickstart_wh_") as wh:
        pipe = Pipeline(spark, DEFAULT_SPEC, wh)
        components = pipe.run(str(fixtures / "manifest.json"), str(fixtures))
        print("== pipeline: c_name dimension (two sources, deduped) ==")
        components["c_name"].orderBy("ncid", "last_name").show(truncate=30)

    spark.stop()


if __name__ == "__main__":
    main()
