"""Multimodal asset framing (north-star extension; the reference is
tabular-only).

Media are carried as opaque ``binary`` payload columns with typed
metadata beside them — the columnar-storage posture for images/audio/
video at 100 TB: parquet stores the bytes (or at larger blob sizes, a
URI into object storage), Spark plans never interpret them except
inside explicitly-chosen Arrow-batched decode operators
(``multimodal.decode``).

The driver's corpus has no real media, so ``as_assets`` frames the
``documents`` table as a synthetic asset table: payload = UTF-8 bytes
of the text, media_type round-robined by doc_id. Everything
downstream (schemas, mapInPandas plumbing, partitioning) is exactly
what real media would use; only the payload provenance is synthetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_TYPES = ("image", "audio", "video")


def as_assets(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, …) → assets(asset_id, media_type,
    payload binary, n_bytes)."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(*[F.lit(m) for m in MEDIA_TYPES]),
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
    )
