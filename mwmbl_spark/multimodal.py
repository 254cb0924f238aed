"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample are ``mapInPandas``
stages over Arrow batches.

REAL pixel decode (round-5): ``decode_image_real`` tries Pillow at
runtime and, when it's absent (this container), falls back to the
repo's dependency-free PNG codec (mwmbl_spark/png.py — stdlib zlib
only). PNG payloads therefore decode to ACTUAL pixels end-to-end and
the mm_pixels contract value-gates the decoded statistics against a
closed-form SQL oracle; non-PNG formats without Pillow still raise the
honest dependency error. ``resize_image_real`` is a real
nearest-neighbor downsample over decoded pixels, re-encoded as PNG.

REAL audio + video decode (round-6): ``decode_audio_real`` (PCM WAV
via mwmbl_spark/riffav.py — exact integer sample statistics) and
``decode_video_frames_real`` (MJPEG-AVI: RIFF container walk + the
repo's own JPEG codec per frame, baseline AND progressive). With
png.py/jpeg.py this makes all four modalities real, value-gated
decode paths; foreign codecs still raise the honest dependency error.

The earlier plumbing stubs remain for schema/fan-out testing:
``decode_image_meta`` (byte-length-derived fake metadata),
``resize_stub``, ``frame_sample_stub``.

Partitioning note (100 TB): binary payloads dominate row size; the
reader should set spark.sql.files.maxPartitionBytes so a task's batch
of blobs fits executor memory, and feature extraction should run
BEFORE any wide shuffle so only the (small) feature columns move. The
stdlib PNG row loop is for fixtures/thumbnails — install Pillow on a
real cluster; the operator picks it up automatically.
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


IMAGE_PIXEL_OUT = (
    "doc_id long, width int, height int, channels int, "
    "n_values long, pixel_sum long, mean_pixel double"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _pixel_decoder():
    """Best available bytes->array decoder: Pillow when importable
    (all formats), else the stdlib PNG codec (PNG only, honest error
    otherwise). Resolved INSIDE the Arrow worker so clusters with
    Pillow use it without a code change."""
    try:
        import io

        from PIL import Image

        def dec(b: bytes):
            import numpy as np

            return np.asarray(Image.open(io.BytesIO(b)))

        return dec
    except ImportError:
        from mwmbl_spark.jpeg import decode_jpeg
        from mwmbl_spark.png import decode_png

        def dec(b: bytes):
            if b.startswith(_PNG_SIG):
                return decode_png(b)
            if b.startswith(b"\xff\xd8"):
                return decode_jpeg(b)  # round-6: baseline JPEG, stdlib
            raise NotImplementedError(
                "payload is neither PNG nor JPEG and Pillow is not "
                "installed — the stdlib fallbacks (mwmbl_spark/png.py, "
                "mwmbl_spark/jpeg.py) decode only those formats"
            )

        return dec


def decode_image_real(media: DataFrame) -> DataFrame:
    """REAL pixel decode -> per-image statistics
    (width/height/channels, value count, integer pixel sum, mean).
    The sum/mean are over ALL channel values — integer-exact, so the
    contract oracle can state them in closed form for synthetic
    payloads. Pillow if available, stdlib PNG codec otherwise."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = _pixel_decoder()
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = dec(bytes(payload))
                h, w = arr.shape[:2]
                ch = 1 if arr.ndim == 2 else arr.shape[2]
                s = int(arr.astype(np.int64).sum())
                n = int(arr.size)
                rows.append(
                    (int(doc_id), int(w), int(h), int(ch), n, s, round(s / n, 6))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "channels",
                    "n_values", "pixel_sum", "mean_pixel",
                ],
            )

    return media.mapInPandas(batches, schema=IMAGE_PIXEL_OUT)


def resize_image_real(media: DataFrame, max_side: int = 8) -> DataFrame:
    """REAL nearest-neighbor downsample: decode, sample rows/columns at
    out_idx * in_len // out_len (the standard floor mapping), re-encode
    as PNG. Aspect ratio preserved; images already within ``max_side``
    pass through re-encoded (pixel-identical)."""
    import numpy as np

    from mwmbl_spark.png import encode_png

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = _pixel_decoder()
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = dec(bytes(payload))
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                h, w = arr.shape[:2]
                scale = max(1.0, max(h, w) / max_side)
                oh, ow = max(1, int(h / scale)), max(1, int(w / scale))
                ys = (np.arange(oh) * h) // oh
                xs = (np.arange(ow) * w) // ow
                thumb = arr[ys][:, xs]
                rows.append((int(doc_id), int(ow), int(oh), encode_png(thumb)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "thumb"]
            )

    return media.mapInPandas(batches, schema=RESIZE_OUT)


def synth_png_payloads(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic PNG fixture: for each doc, an 8-bit
    grayscale image with width = doc_id % 16 + 4, height =
    (doc_id // 16) % 16 + 4 and row-major pixel i = (doc_id*31 + i) %
    256 — a closed form both engines can state exactly (the mm_pixels
    oracle restates pixel_sum/mean in SQL over generate_series)."""
    import numpy as np

    from mwmbl_spark.png import encode_png

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = d % 16 + 4
                h = (d // 16) % 16 + 4
                px = ((d * 31 + np.arange(w * h)) % 256).astype(np.uint8)
                payloads.append(encode_png(px.reshape(h, w)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        batches, schema="doc_id long, payload binary"
    ).select(
        "doc_id",
        F.lit("image/png").alias("media_type"),
        "payload",
        F.struct(
            F.lit("synthetic-png").alias("source"),
            F.lit(None).cast("int").alias("declared_w"),
            F.lit(None).cast("int").alias("declared_h"),
        ).alias("meta"),
    )


RESIZE_OUT = "doc_id long, width int, height int, thumb binary"


def synth_jpeg_payloads(
    docs: DataFrame, id_col: str = "doc_id", progressive: bool = False
) -> DataFrame:
    """Deterministic synthetic JPEG fixture (round-6): for each doc, a
    grayscale JPEG of FLAT 8x8 blocks — bw = doc_id % 3 + 1
    blocks wide, bh = (doc_id // 3) % 2 + 1 blocks tall, block i
    (row-major) filled with v = (doc_id*29 + i*17) % 256, encoded with
    the tie-free QUANT_ORACLE table. A flat block decodes to the
    closed-form quantization round-trip of v (jpeg.py docstring), so
    pixel_sum/mean have an exact SQL restatement (the mm_pixels_jpeg
    oracle) despite the codec being lossy. ``progressive=True`` emits
    SOF2 multi-scan files (DC first + refine, banded AC with shared
    EOB runs) — entropy coding is lossless, so the SAME oracle holds
    verbatim (the mm_pixels_jpeg_prog contract)."""
    import numpy as np

    from mwmbl_spark.jpeg import (
        QUANT_ORACLE,
        encode_jpeg_gray,
        encode_jpeg_gray_progressive,
    )

    enc = encode_jpeg_gray_progressive if progressive else encode_jpeg_gray

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                bw = d % 3 + 1
                bh = (d // 3) % 2 + 1
                vals = ((d * 29 + np.arange(bw * bh) * 17) % 256).reshape(bh, bw)
                img = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
                payloads.append(enc(img, quant=QUANT_ORACLE))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        batches, schema="doc_id long, payload binary"
    ).select(
        "doc_id",
        F.lit("image/jpeg").alias("media_type"),
        "payload",
        F.struct(
            F.lit("synthetic-jpeg").alias("source"),
            F.lit(None).cast("int").alias("declared_w"),
            F.lit(None).cast("int").alias("declared_h"),
        ).alias("meta"),
    )


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


# ---------------------------------------------------------------------------
# REAL audio + video decode (round-6: RIFF codecs, mwmbl_spark/riffav.py)
# ---------------------------------------------------------------------------

AUDIO_OUT = (
    "doc_id long, sample_rate int, channels int, n_samples long, "
    "sample_sum long, sample_sq_sum long, peak long"
)


def synth_wav_payloads(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PCM-WAV fixture: per doc, a mono 16-bit file with
    n = doc_id % 50 + 10 samples, sample i = (doc_id*37 + i*11) % 4096
    - 2048, rate 16000 + (doc_id % 4)*8000. Integer PCM decodes
    exactly, so sum / sum-of-squares / peak have exact SQL
    restatements (the mm_audio_stats oracle)."""
    import numpy as np

    from mwmbl_spark.riffav import encode_wav_pcm

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = d % 50 + 10
                samples = (d * 37 + np.arange(n) * 11) % 4096 - 2048
                payloads.append(
                    encode_wav_pcm(samples, 16_000 + (d % 4) * 8_000)
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        batches, schema="doc_id long, payload binary"
    ).select(
        "doc_id",
        F.lit("audio/wav").alias("media_type"),
        "payload",
        F.struct(
            F.lit("synthetic-wav").alias("source"),
            F.lit(None).cast("int").alias("declared_w"),
            F.lit(None).cast("int").alias("declared_h"),
        ).alias("meta"),
    )


def decode_audio_real(media: DataFrame) -> DataFrame:
    """REAL PCM decode (stdlib struct + NumPy, riffav.decode_wav):
    per-payload integer sample statistics. Exact by construction —
    16-bit PCM has no lossy layer — so every output column is
    oracle-checkable."""
    import numpy as np

    from mwmbl_spark.riffav import decode_wav

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                a, rate = decode_wav(bytes(payload))
                v = a.astype(np.int64)
                rows.append((
                    doc_id, rate, a.shape[1], a.shape[0],
                    int(v.sum()), int((v * v).sum()),
                    int(np.abs(v).max()) if a.size else 0,
                ))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "sample_rate", "channels", "n_samples",
                "sample_sum", "sample_sq_sum", "peak",
            ])

    return media.mapInPandas(batches, schema=AUDIO_OUT)


VIDEO_FRAMES_OUT = (
    "doc_id long, frame_idx int, width int, height int, pixel_sum long"
)


def synth_avi_payloads(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic MJPEG-AVI fixture: per doc, doc_id % 4 + 2 frames,
    frame f a FLAT 8x8 JPEG of value (doc_id*13 + f*29) % 256 with the
    tie-free QUANT_ORACLE table — even frames baseline-encoded, odd
    frames PROGRESSIVE (both entropy decoders run inside the video
    path). Flat blocks make per-frame pixel sums closed-form (the
    mm_video_frames oracle)."""
    import numpy as np

    from mwmbl_spark.jpeg import (
        QUANT_ORACLE,
        encode_jpeg_gray,
        encode_jpeg_gray_progressive,
    )
    from mwmbl_spark.riffav import encode_avi_mjpeg

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                frames = []
                for f in range(d % 4 + 2):
                    v = (d * 13 + f * 29) % 256
                    img = np.full((8, 8), v, dtype=np.uint8)
                    enc = (
                        encode_jpeg_gray_progressive if f % 2
                        else encode_jpeg_gray
                    )
                    frames.append(enc(img, quant=QUANT_ORACLE))
                payloads.append(encode_avi_mjpeg(frames, 8, 8))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        batches, schema="doc_id long, payload binary"
    ).select(
        "doc_id",
        F.lit("video/avi").alias("media_type"),
        "payload",
        F.struct(
            F.lit("synthetic-avi").alias("source"),
            F.lit(None).cast("int").alias("declared_w"),
            F.lit(None).cast("int").alias("declared_h"),
        ).alias("meta"),
    )


def decode_video_frames_real(media: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL frame-sample + decode (riffav.decode_avi_frames + the JPEG
    codec): one row per kept frame (frame_idx % every_n == 0) with its
    decoded pixel statistics — the 1->N fan-out of frame_sample_stub
    made real. Container walk and JPEG decode are both stdlib-only;
    non-MJPEG codecs raise by name (PyAV/ffmpeg at scale)."""
    import numpy as np

    from mwmbl_spark.jpeg import decode_jpeg
    from mwmbl_spark.riffav import decode_avi_frames

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for k, fb in enumerate(decode_avi_frames(bytes(payload))):
                    if k % every_n:
                        continue
                    px = decode_jpeg(fb)
                    rows.append((
                        doc_id, k, px.shape[1], px.shape[0],
                        int(px.astype(np.int64).sum()),
                    ))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "frame_idx", "width", "height", "pixel_sum",
            ])

    return media.mapInPandas(batches, schema=VIDEO_FRAMES_OUT)


AUDIO_WINDOWS_OUT = (
    "doc_id long, win_idx int, start int, n_samples int, "
    "energy_sum long, peak long"
)


def audio_energy_windows(
    media: DataFrame, window: int = 16, stride: int = 8
) -> DataFrame:
    """Strided energy windows over decoded PCM — the audio analogue of
    the passage shatter (a 1->N fan-out at sample grain): window k
    covers samples [k*stride, min(k*stride+window, n)), one window per
    stride while any sample remains. Per window: sum of squared
    samples over ALL channels (the energy a VAD / quality filter
    thresholds on) and peak |amplitude|. Integer PCM makes both exact,
    so the whole fan-out is oracle-checkable (mm_audio_windows)."""
    import numpy as np

    from mwmbl_spark.riffav import decode_wav

    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                a, _rate = decode_wav(bytes(payload))
                v = a.astype(np.int64)
                n = v.shape[0]
                k = 0
                while k * stride < n:
                    s = k * stride
                    w = v[s:s + window]
                    rows.append((
                        doc_id, k, s, w.shape[0],
                        int((w * w).sum()), int(np.abs(w).max()),
                    ))
                    k += 1
            yield pd.DataFrame(rows, columns=[
                "doc_id", "win_idx", "start", "n_samples",
                "energy_sum", "peak",
            ])

    return media.mapInPandas(batches, schema=AUDIO_WINDOWS_OUT)
