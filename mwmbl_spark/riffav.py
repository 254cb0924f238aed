"""Dependency-free RIFF A/V codecs: WAV (PCM) and AVI (MJPEG).

Round-6: the container has no soundfile/ffmpeg, but both formats'
useful subsets are pure public-spec struct work (RIFF chunking,
Microsoft WAVEFORMATEX / AVI RIFF form), which converts the last two
honestly-stubbed modalities — audio and video — into REAL decode
paths with closed-form oracles, the way png.py and jpeg.py did for
images:

- WAV: 16-bit (and 8-bit) PCM, mono/stereo. Integer samples decode
  exactly, so per-doc sample_sum / sum of squares have exact SQL
  restatements (the mm_audio_stats contract). Float/ADPCM/extensible
  formats raise NotImplementedError by name.
- AVI: MJPEG video streams — each '##dc' chunk in the movi LIST is a
  standalone JPEG, which mwmbl_spark.jpeg decodes (baseline or
  progressive). Flat-block frames therefore inherit the tie-free
  closed-form pixel oracle (the mm_video_frames contract). Other
  codecs raise by name; at 100-TB scale the same operators run with
  PyAV/ffmpeg — these are the honest, testable fallbacks.

Like the image codecs, the per-payload loops here run INSIDE
mapInPandas batches (multimodal.py) — Spark parallelizes across
payloads; nothing here touches the driver.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_wav_pcm",
    "decode_wav",
    "encode_avi_mjpeg",
    "decode_avi_frames",
]


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE, PCM)
# ---------------------------------------------------------------------------


def encode_wav_pcm(
    samples: np.ndarray, sample_rate: int = 16_000, bits: int = 16
) -> bytes:
    """(n,) mono or (n, ch) int array -> PCM WAV bytes. 16-bit signed
    or 8-bit unsigned (the two classic PCM widths)."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError("samples must be (n,) or (n, channels)")
    ch = a.shape[1]
    if bits == 16:
        if a.size and (a.min() < -32768 or a.max() > 32767):
            raise ValueError("sample out of int16 range")  # no silent wrap
        data = a.astype("<i2").tobytes()
    elif bits == 8:
        if a.size and (a.min() < 0 or a.max() > 255):
            raise ValueError("sample out of uint8 range")
        data = a.astype(np.uint8).tobytes()
    else:
        raise ValueError("bits must be 8 or 16")
    block = ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _riff_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size) walking a RIFF
    chunk sequence; chunks are word-aligned (odd sizes padded)."""
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes -> ((n, channels) int samples, sample_rate).
    16-bit -> int16 values, 8-bit -> the unsigned byte values.
    Non-PCM audio formats raise NotImplementedError by name."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    fmt = None
    for cid, p, size in _riff_chunks(data, 12, len(data)):
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", data[p:p + 16])
        elif cid == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt")
            tag, ch, rate, _brate, _block, bits = fmt
            if tag != 1:
                raise NotImplementedError(
                    f"non-PCM WAV format tag {tag} (float/ADPCM/extensible)"
                    " — decode with soundfile/ffmpeg at scale"
                )
            raw = data[p:p + size]
            if bits == 16:
                a = np.frombuffer(raw[: len(raw) // (2 * ch) * 2 * ch], "<i2")
            elif bits == 8:
                a = np.frombuffer(raw[: len(raw) // ch * ch], np.uint8)
            else:
                raise NotImplementedError(f"{bits}-bit PCM")
            return a.reshape(-1, ch).astype(np.int32), rate
    raise ValueError("no data chunk")


# ---------------------------------------------------------------------------
# AVI (RIFF 'AVI ', MJPEG stream)
# ---------------------------------------------------------------------------


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """JPEG frame payloads -> a minimal valid single-stream MJPEG AVI
    (hdrl with avih+strh+strf, movi with one '00dc' chunk per frame,
    idx1). Fixture generator for the video decode path."""
    n = len(frames)
    us_per_frame = 1_000_000 // max(fps, 1)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame, 0, 0, 0x10, n, 0, 1, 0, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1,
                                        fps, 0, n, 0, 0xFFFFFFFF, 0, 0)
    )
    # BITMAPINFOHEADER
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )

    def chunk(cid: bytes, payload: bytes) -> bytes:
        return cid + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) & 1 else b""
        )

    def lst(four: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", four + payload)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi_payload = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_payload)
    idx = b"".join(
        b"00dc" + struct.pack("<III", 0x10, 0, len(f)) for f in frames
    )
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_frames(data: bytes) -> list[bytes]:
    """AVI bytes -> the MJPEG stream's frame payloads (one JPEG each).
    Walks the RIFF tree to the movi LIST and collects video chunks
    ('##dc'/'##db'); verifies the stream handler is MJPEG and raises
    NotImplementedError naming any other codec."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    frames: list[bytes] = []
    codec = None

    def walk(pos: int, end: int) -> None:
        nonlocal codec
        for cid, p, size in _riff_chunks(data, pos, end):
            if cid == b"LIST":
                four = data[p:p + 4]
                if four in (b"hdrl", b"strl", b"movi", b"rec "):
                    walk(p + 4, p + size)
            elif cid == b"strh" and data[p:p + 4] == b"vids":
                codec = data[p + 4:p + 8]
            elif len(cid) == 4 and cid[2:4] in (b"dc", b"db"):
                frames.append(data[p:p + size])

    walk(12, len(data))
    if codec is not None and codec not in (b"MJPG", b"mjpg", b"dmb1"):
        raise NotImplementedError(
            f"AVI video codec {codec!r} — only MJPEG decodes here; use "
            "PyAV/ffmpeg at scale"
        )
    return frames
