"""Multimodal columns — binary payloads with typed metadata (north-star).

Images/audio/video are opaque ``BinaryType`` columns plus typed
metadata. The container has no decode libraries (PIL/ffmpeg), so the
decode step is a clearly-marked deterministic fake behind the REAL
Spark plumbing: binary column construction, Arrow batch transfer,
``mapInPandas`` signature, schema enforcement. Swapping the fake for a
real decoder changes only the inside of ``_decode_batch``.

Scale: mapInPandas streams Arrow batches partition-by-partition —
no collect, no driver involvement; binary payloads never shuffle
(map-only), and the output is narrow typed metadata.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparksql_server_spark.catalog import register_tables, table
from sparksql_server_spark.operators.registry import query

try:  # real decoders are not in this environment — gate behind import-try
    import PIL.Image  # noqa: F401

    HAVE_IMAGE_LIBS = True
except ImportError:
    HAVE_IMAGE_LIBS = False


def decode_image(payload: bytes) -> "PIL.Image.Image":
    """Real image decode — requires PIL, absent in this container."""
    if not HAVE_IMAGE_LIBS:
        raise NotImplementedError(
            "image decode requires PIL; this environment ships none — "
            "the pipeline uses the deterministic fake in _decode_batch"
        )
    import io

    return PIL.Image.open(io.BytesIO(payload))


_DECODE_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, n_frames int, checksum long"
)


def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """DETERMINISTIC FAKE decode: derives image-like metadata from the
    payload bytes. Real decoders slot in here (see decode_image)."""
    for pdf in batches:
        n = pdf["payload"].map(len)
        first = pdf["payload"].map(lambda b: b[0] if len(b) else 0)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n,
                "width": (n % 640 + 16).astype("int32"),
                "height": (n % 480 + 16).astype("int32"),
                "n_frames": (n % 30 + 1).astype("int32"),
                "checksum": (n * 31 + first).astype("int64"),
            }
        )


@query(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text)                                  AS content_md5,
           CAST(ascii(substr(text, 1, 1)) AS INT)     AS first_byte
    FROM documents
""",
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: utf-8 payload + typed metadata (byte
    length, content hash, first byte) — all JVM-side."""
    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        SELECT doc_id,
               CAST(length(cast(text AS BINARY)) AS BIGINT) AS n_bytes,
               md5(cast(text AS BINARY))                    AS content_md5,
               CAST(ascii(substring(text, 1, 1)) AS INT)    AS first_byte
        FROM documents
"""
    )


@query(
    "mm_decode_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT)           AS n_bytes,
           CAST(octet_length(encode(text)) % 640 + 16 AS INT)   AS width,
           CAST(octet_length(encode(text)) % 480 + 16 AS INT)   AS height,
           CAST(octet_length(encode(text)) % 30 + 1 AS INT)     AS n_frames,
           CAST(octet_length(encode(text)) * 31
                + ascii(substr(text, 1, 1)) AS BIGINT)          AS checksum
    FROM documents
""",
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode / feature-extract via mapInPandas (Arrow batches).

    The Spark side runs the real multimodal plumbing — binary column →
    Arrow batch → Pandas UDF → typed metadata; the oracle replicates
    the deterministic fake arithmetic in SQL.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return d.mapInPandas(_decode_batch, schema=_DECODE_SCHEMA)


_FRAME_SCHEMA = "doc_id long, frame_idx int, frame_off long, frame_px int"
_FRAME_STRIDE = 10  # sample every 10th frame


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """DETERMINISTIC FAKE frame sampler: emits one row per sampled
    frame (indices 0, 10, 20, … below the fake frame count), with a
    byte offset and a fake per-frame pixel stat derived from the
    payload — the 1→N row shape of real video frame extraction.
    A real decoder (ffmpeg) slots in here unchanged."""
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_off": [], "frame_px": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload)
            n_frames = n % 30 + 1
            for idx in range(0, n_frames, _FRAME_STRIDE):
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(idx)
                out["frame_off"].append(idx * n // max(n_frames, 1))
                out["frame_px"].append(payload[idx % n] if n else 0)
        yield pd.DataFrame(out)


@query(
    "mm_frame_sample",
    oracle=f"""
    SELECT doc_id,
           CAST((i - 1) * {_FRAME_STRIDE} AS INT)                     AS frame_idx,
           CAST(((i - 1) * {_FRAME_STRIDE} * n) // n_frames AS BIGINT) AS frame_off,
           CAST(ascii(substr(text, ((i - 1) * {_FRAME_STRIDE}) % n + 1, 1)) AS INT)
             AS frame_px
    FROM (SELECT doc_id, text, octet_length(encode(text)) AS n,
                 octet_length(encode(text)) % 30 + 1 AS n_frames
          FROM documents),
         range(1, 4) t(i)
    WHERE (i - 1) * {_FRAME_STRIDE} < n_frames
""",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: every 10th frame of each video-like payload,
    one output row per sampled frame — the 1→N mapInPandas shape
    (decode → sample → per-frame features). The oracle unrolls the
    same arithmetic with an index join (documents are ASCII, so byte
    offsets == char offsets; fake frame count ≤ 30 ⇒ ≤ 3 samples).

    Scale: map-only over the payload partition — frames never pass
    through the driver, and the output is narrow typed rows.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return d.mapInPandas(_sample_frames, schema=_FRAME_SCHEMA)
