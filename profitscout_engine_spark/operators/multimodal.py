"""Multimodal (binary-column) plumbing: opaque payload bytes + typed
metadata, with feature extraction as an Arrow-batched ``mapInPandas``
(SURVEY §7.2 Phase 5 — the image/audio/video pattern at 100 TB).

The Spark-side plumbing is real: a ``binary`` payload column rides the
scan/shuffle like any other column, metadata is a typed struct, and the
decode step is a ``mapInPandas`` over Arrow batches (one Python hop per
batch, never per row). The *codec* itself is a STUB: real image/audio
libraries are not in this container, so ``decode_features`` computes
deterministic byte-level features (length, mean byte value, frame count)
instead of pixels. Swapping in a real decoder changes ONE function —
the schema, batching, and partitioning contract stay identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

FRAME_BYTES = 64  # fake "frame" stride for the frame-sample feature

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("n_frames", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct.

    Payload = UTF-8 bytes of ``text`` (deterministic stand-in for an
    image blob); metadata mirrors what an ingest service would attach.
    """
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("fake/raw-bytes").alias("format"),
            (F.col("n_chars") % 64 + 1).cast("long").alias("width"),
            (F.col("n_chars") % 48 + 1).cast("long").alias("height"),
        ).alias("meta"),
    )


def decode_features(payloads: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, meta).

    The decode fn is defined as a CLOSURE (not module-level) so
    cloudpickle ships it by value — executor Python workers don't share
    the driver's sys.path, and a by-reference pickle of a module
    function would make every worker re-import this package.
    """
    frame_bytes = FRAME_BYTES
    columns = [f.name for f in FEATURE_SCHEMA.fields]

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """STUB decode: byte-level stats in place of a real image/audio
        codec. Real version would do e.g.
        ``PIL.Image.open(io.BytesIO(payload))`` per row inside the same
        batch loop; everything else is unchanged."""
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                buf = np.frombuffer(payload, dtype=np.uint8)
                rows.append(
                    (
                        doc_id,
                        int(buf.size),
                        float(buf.mean()) if buf.size else 0.0,
                        int(buf.size // frame_bytes),
                        int(meta["width"]),
                        int(meta["height"]),
                    )
                )
            yield pd.DataFrame(rows, columns=columns)

    return payloads.mapInPandas(decode_batch, schema=FEATURE_SCHEMA)
