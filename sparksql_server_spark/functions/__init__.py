"""Reusable column-expression helpers (JVM-side, codegen-friendly)."""

from sparksql_server_spark.functions.portable import (  # noqa: F401
    MOD_P,
    spark_char_hash,
    duck_char_hash,
    spark_words,
    duck_words,
    spark_shingles,
    duck_shingles,
)
from sparksql_server_spark.functions.vector import (  # noqa: F401
    spark_dot,
    duck_dot,
    spark_norm,
    duck_norm,
)
