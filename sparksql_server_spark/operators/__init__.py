"""Operator corpus: every declared query from SURVEY.md §2 / FIXTURES.md §2.

Importing this package populates the registry (``QUERIES`` / ``ORACLES``)
by importing each operator module for its registration side effects.
"""

from sparksql_server_spark.operators.registry import QUERIES, ORACLES, query  # noqa: F401

# Import for side effects: each module registers its queries.
from sparksql_server_spark.operators import (  # noqa: F401, E402
    relational,
    relational_ext,
    tpch,
    windows_ext,
    collections_hof,
    sampling,
    stats,
    grouped_pandas,
    asof_band,
    joins,
    aggregates,
    windows,
    setops,
    scalar_funcs,
    events_windows,
    dedup,
    similarity,
    events_behavior,
    quality_filters,
    text_analysis,
    multimodal,
    events_analytics,
    graph,
    curation,
    advanced_analytics,
    ml_features,
)
