"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode libraries (PIL/librosa/ffmpeg) are NOT in this container, so the
actual decode is STUBBED — ``decode_stub_features`` derives deterministic
fake features from the raw bytes.  Everything around the stub is the real
production shape: binary column + metadata struct schema, mapInPandas batch
iteration (Arrow record batches, bounded by
spark.sql.execution.arrow.maxRecordsPerBatch), explicit output schema, and
partition-parallel execution.  Swapping the stub body for a real
``PIL.Image.open(io.BytesIO(buf))`` is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
        T.StructField("checksum_mod", T.LongType()),
    ]
)


def to_media_table(docs: DataFrame) -> DataFrame:
    """Wrap documents as a media table: UTF-8 bytes as the opaque payload,
    typed metadata struct alongside (the ingest shape for real images)."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id"),
        F.lit("image/fake").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lit("fake-v1").alias("codec"),
        ).alias("meta"),
    )


def decode_stub_features(media: DataFrame) -> DataFrame:
    """mapInPandas 'decode': deterministic fake features from the bytes.

    A real implementation decodes with an image/audio lib here; this stub
    keeps the exact same batch shape so the Spark plan is production-true.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len).astype("int64")
            # deterministic fake dimensions/checksum; "first" is the CODE
            # POINT of the first character (not the first UTF-8 byte) so the
            # DuckDB oracle's ascii(substr(text,1,1)) matches beyond ASCII
            first = pdf["payload"].map(
                lambda b: ord(b[:4].decode("utf-8", errors="ignore")[0])
                if len(b)
                else 0
            ).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "fake_width": ((n_bytes % 640) + 1).astype("int32"),
                    "fake_height": ((first % 480) + 1).astype("int32"),
                    "checksum_mod": (n_bytes * 2654435761 % 1_000_003).astype("int64"),
                }
            )

    return media.mapInPandas(_decode, FEATURES_SCHEMA)


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video-style frame sampling, stubbed: split the payload into n equal
    byte-range 'frames' (explode — the real fan-out shape for video)."""
    return media.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_frames - 1)),
                lambda i: F.substring(
                    F.col("payload").cast("string"),
                    (i * (F.col("meta.n_bytes") / n_frames)).cast("int") + 1,
                    16,
                ),
            )
        ).alias("frame_idx", "frame_bytes"),
    )
