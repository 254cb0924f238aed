"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample are ``mapInPandas``
stages over Arrow batches. The decode libraries (Pillow, ffmpeg, ...)
are NOT in this container, so the actual pixel/sample decode is STUBBED:

- ``decode_image_meta`` is a DETERMINISTIC FAKE decoder — it derives
  width/height/channels from the byte content so the Spark-side
  plumbing (schema, partition sizing, UDF signature, Arrow batch shape)
  is real and testable end-to-end.
- ``decode_image_real`` raises NotImplementedError with the dependency
  it needs; swap it in behind the same signature on a cluster that has
  the codec libraries.

Partitioning note (100 TB): binary payloads dominate row size; the
reader should set spark.sql.files.maxPartitionBytes so a task's batch
of blobs fits executor memory, and feature extraction should run
BEFORE any wide shuffle so only the (small) feature columns move.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "meta struct<source:string, declared_w:int, declared_h:int>"
)

IMAGE_META_OUT = "doc_id long, n_bytes long, width int, height int, channels int"


def attach_fake_payload(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Test fixture path: derive a binary payload column from text bytes
    (utf-8), standing in for real image/audio blobs."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("synthetic").alias("source"),
            F.lit(None).cast("int").alias("declared_w"),
            F.lit(None).cast("int").alias("declared_h"),
        ).alias("meta"),
    )


def decode_image_meta(media: DataFrame) -> DataFrame:
    """Deterministic fake decode: metadata derived from byte length.
    (width = n % 64 + 1, height = n/64 % 64 + 1, channels = 3) — the
    same arithmetic the oracle SQL states over octet_length."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n.astype("int64"),
                    "width": (n % 64 + 1).astype("int32"),
                    "height": (n // 64 % 64 + 1).astype("int32"),
                    "channels": 3,
                }
            )

    return media.mapInPandas(batches, schema=IMAGE_META_OUT)


def decode_image_real(media: DataFrame) -> DataFrame:
    """Real decoder slot — same signature as decode_image_meta."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real image decode needs Pillow (not in this container); "
            "use decode_image_meta for the plumbing path"
        ) from e
    raise NotImplementedError("wire PIL decode here when the dependency exists")


RESIZE_OUT = "doc_id long, width int, height int, thumb binary"


def resize_stub(media: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize stage stub: emits a truncated payload as the 'thumbnail'
    with scaled dimensions — exercises the binary-out UDF path and batch
    sizing without a codec."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = pdf["payload"].map(len)
            w = (n % 64 + 1).clip(upper=max_side).astype("int32")
            h = (n // 64 % 64 + 1).clip(upper=max_side).astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w,
                    "height": h,
                    "thumb": [p[: int(a) * int(b)] for p, a, b in zip(pdf["payload"], w, h)],
                }
            )

    return media.mapInPandas(batches, schema=RESIZE_OUT)


def frame_sample_stub(media: DataFrame, every_n_bytes: int = 97) -> DataFrame:
    """Frame-sampling stage stub (video analogue): one output row per
    sampled offset — demonstrates the 1->N mapInPandas fan-out shape."""
    out_schema = "doc_id long, frame_idx int, frame binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for k, off in enumerate(range(0, len(payload), every_n_bytes)):
                    rows.append((doc_id, k, payload[off : off + 16]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return media.mapInPandas(batches, schema=out_schema)
