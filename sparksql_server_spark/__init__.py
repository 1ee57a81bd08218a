"""sparksql_server_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the *capabilities* of
DistributedSystemsGroup/sparksql-server (a multi-query work-sharing
middleware on modified Spark 1.3.1 — see SURVEY.md) as an idiomatic
modern PySpark engine:

- ``session`` / ``catalog``  — shared SparkSession + table registry
  (replaces the reference's server bootstrap, SparkSQLServer.scala:30-81).
- ``operators``              — the full declared query corpus (relational
  Layer A + LLM-data-pipeline north-star operators).
- ``server``                 — the work-sharing layer: query queue,
  window batcher, shared-scan detector, cache manager, FAIR-pool
  concurrent scheduler (replaces Layer B of SURVEY.md §2).
- ``plans``                  — plan introspection (leaf-relation
  fingerprints for scan-sharing detection).
- ``sources`` / ``functions`` / ``streaming`` — IO, reusable column
  expressions, and time-window analytics over the events table.
"""

__version__ = "0.1.0"

from sparksql_server_spark.session import get_session  # noqa: F401
from sparksql_server_spark.catalog import register_tables, table  # noqa: F401
