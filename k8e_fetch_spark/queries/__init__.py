from k8e_fetch_spark.queries.registry import REGISTRY, Query, oracle_sql, queries, register  # noqa: F401
