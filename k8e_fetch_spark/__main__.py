"""``python -m k8e_fetch_spark`` — see :mod:`k8e_fetch_spark.cli`."""

from k8e_fetch_spark.cli import main

raise SystemExit(main())
