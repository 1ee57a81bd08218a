"""A/B: emb_pca_power_iteration — one-statement CTE chain (exponential
re-inlining, 12 embedding scans) vs staged execution pinned at the two
64-row iterates (4 scans)."""

from sparksql_server_spark.catalog import register_tables
from sparksql_server_spark.operators.similarity import (
    _PCA_ELEMS_SPARK,
    _pca_spark_staged,
    _pca_sql,
)

NAME = "pca_staged"


def build_a(spark, sf_dir):
    register_tables(spark, sf_dir, ("embeddings",))
    return spark.sql(_pca_sql(_PCA_ELEMS_SPARK))


def build_b(spark, sf_dir):
    register_tables(spark, sf_dir, ("embeddings",))
    return _pca_spark_staged(spark, _PCA_ELEMS_SPARK)
