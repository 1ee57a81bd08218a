"""Plan introspection utilities."""

from sparksql_server_spark.plans.analysis import scan_fingerprints  # noqa: F401
