#!/usr/bin/env python
"""Repo-root bench entry point (the driver runs ``python bench.py``).

The harness itself is packaged as :mod:`k8e_fetch_spark.bench_runner`
so an installed wheel can bench itself; this shim only makes the repo
checkout importable when invoked from elsewhere.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from k8e_fetch_spark.bench_runner import main  # noqa: E402

if __name__ == "__main__":
    main()
