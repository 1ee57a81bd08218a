"""Server-side registered UDFs — the vetted function surface.

The reference's UDF story is "arbitrary client JVM code rides in the
jar" (`SRV/listener/JarListener.scala:31-88` + `ClassLoaderOIS` — an
RCE by design, SURVEY.md §2/§7). Our replacement: a fixed, reviewed
set of functions registered into the shared SparkSession at server
start; clients call them from SQL by name, and nothing executable
ever crosses the wire.

All are Arrow-batched pandas UDFs (vectorized transfer, no
row-at-a-time Python); anything expressible with built-ins should be
a built-in instead — this registry exists for the residue (custom
tokenizers, learned scorers, decoders), and keeping it small is the
point. Wrapping happens at registration time because ``pandas_udf``
parses its DDL return type against the active session.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import SparkSession

_WORD_RE = re.compile(r"[A-Za-z0-9]+")


def _slugify(s: pd.Series) -> pd.Series:
    """Lowercase, non-alphanumerics to single dashes."""
    return s.map(
        lambda v: "-".join(_WORD_RE.findall(v)).lower() if v is not None else None
    )


def _l2_norm(v: pd.Series) -> pd.Series:
    """L2 norm of an array<float>/array<double> column."""
    return v.map(
        lambda xs: float(sum(float(x) * float(x) for x in xs)) ** 0.5
        if xs is not None
        else None
    )


def _token_count_re(s: pd.Series) -> pd.Series:
    """Regex token count (the BPE-ish [A-Za-z0-9]+ family).

    Nullable ``Int32``, not ``int32``: a NULL input maps to None,
    which pandas holds as NaN in a numeric Series — the non-nullable
    astype raises IntCastingNaNError and kills the whole Arrow batch
    for one NULL row (reproduced); the pandas nullable dtype round-
    trips NULL through Arrow as SQL NULL, which is what the guard
    intended."""
    return s.map(lambda v: len(_WORD_RE.findall(v)) if v is not None else None).astype(
        "Int32"
    )


# name -> (vectorized fn, DDL return type)
REGISTRY = {
    "slugify": (_slugify, "string"),
    "l2_norm": (_l2_norm, "double"),
    "token_count_re": (_token_count_re, "int"),
}


def register_udfs(spark: SparkSession) -> None:
    """Install the vetted UDF set into the session (idempotent)."""
    from pyspark.sql.functions import pandas_udf

    for name, (fn, ret) in REGISTRY.items():
        spark.udf.register(name, pandas_udf(fn, ret))


class _ParseKV:
    """Python UDTF (Spark 3.5+ table-function surface): explode a
    flat JSON object string into (key, value) rows.

    One vetted TABLE function completes the extension-point story next
    to the scalar pandas UDFs: the reference let client jars ship
    whole custom operators (RCE by design); here a reviewed UDTF is
    the sanctioned way to emit rows from opaque payloads (sentence
    splitters, log parsers, frame samplers). Row-based Python — keep
    it off hot paths; built-ins first (get_json_object etc.), UDTF for
    the residue that genuinely needs 1-to-N row logic.
    """

    def eval(self, s: str):  # noqa: D102 - Spark's UDTF contract
        import json

        if s is None:
            return
        try:
            obj = json.loads(s)
        except (ValueError, TypeError):
            return
        if isinstance(obj, dict):
            for k in sorted(obj):
                v = obj[k]
                if v is None:
                    yield k, None  # JSON null -> SQL NULL
                elif isinstance(v, str):
                    yield k, v  # bare text, no added quotes
                else:
                    # numbers/bools/nested stay valid JSON text
                    # (str() would emit Python reprs: True/None/{'a': 1})
                    yield k, json.dumps(v)


def register_udtfs(spark: SparkSession) -> None:
    """Install the vetted table-function set (idempotent)."""
    from pyspark.sql.functions import udtf

    spark.udtf.register("parse_kv", udtf(_ParseKV, returnType="key string, value string"))
