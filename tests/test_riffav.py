"""Dependency-free RIFF A/V codecs (round-6): WAV PCM + AVI MJPEG."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from mwmbl_spark.jpeg import (
    QUANT_ORACLE,
    decode_jpeg,
    encode_jpeg_gray,
    encode_jpeg_gray_progressive,
    flat_block_roundtrip,
)
from mwmbl_spark.riffav import (
    decode_avi_frames,
    decode_wav,
    encode_avi_mjpeg,
    encode_wav_pcm,
)


def test_wav_roundtrip_and_stdlib_cross_check():
    s = (np.arange(100) * 37) % 4096 - 2048
    b = encode_wav_pcm(s, 16_000)
    a, rate = decode_wav(b)
    assert rate == 16_000 and a.shape == (100, 1)
    assert np.array_equal(a[:, 0], s)
    # the stdlib wave reader agrees our files are well-formed WAV
    w = wave.open(io.BytesIO(b))
    assert (w.getframerate(), w.getnchannels(), w.getnframes()) == (16_000, 1, 100)
    assert np.array_equal(np.frombuffer(w.readframes(100), "<i2"), s)
    # stereo and 8-bit
    st = np.stack([s, -s], 1)
    a2, _ = decode_wav(encode_wav_pcm(st, 8_000))
    assert np.array_equal(a2, st)
    a3, _ = decode_wav(encode_wav_pcm(np.arange(256) % 256, 16_000, bits=8))
    assert np.array_equal(a3[:, 0], np.arange(256) % 256)


def test_wav_non_pcm_raises_named():
    b = encode_wav_pcm(np.arange(10), 16_000)
    fl = b.replace(struct.pack("<HH", 1, 1), struct.pack("<HH", 3, 1), 1)
    with pytest.raises(NotImplementedError, match="non-PCM"):
        decode_wav(fl)
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        decode_wav(b"\x89PNG\r\n\x1a\n")


def test_avi_mjpeg_frames_roundtrip_mixed_entropy():
    """Frame payloads survive the container byte-exact; even frames
    baseline JPEG, odd frames progressive — both decode to the flat
    closed form through the video path."""
    vals = [10, 200, 37, 255]
    frames = []
    for f, v in enumerate(vals):
        img = np.full((8, 8), v, np.uint8)
        enc = encode_jpeg_gray_progressive if f % 2 else encode_jpeg_gray
        frames.append(enc(img, quant=QUANT_ORACLE))
    avi = encode_avi_mjpeg(frames, 8, 8)
    out = decode_avi_frames(avi)
    assert out == frames
    for f, v in enumerate(vals):
        assert np.all(decode_jpeg(out[f]) == flat_block_roundtrip(v))


def test_avi_foreign_codec_raises_named():
    avi = encode_avi_mjpeg([b"x"], 8, 8).replace(b"MJPG", b"H264")
    with pytest.raises(NotImplementedError, match="H264"):
        decode_avi_frames(avi)
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi_frames(b"RIFFxxxxWAVE")


def test_spark_audio_stats_match_formula(spark):
    from mwmbl_spark.multimodal import decode_audio_real, synth_wav_payloads
    from pyspark.sql import functions as F

    docs = spark.range(0, 30).select(F.col("id").alias("doc_id"))
    out = {r["doc_id"]: r for r in decode_audio_real(synth_wav_payloads(docs)).collect()}
    assert len(out) == 30
    for d in range(30):
        n = d % 50 + 10
        v = (d * 37 + np.arange(n) * 11) % 4096 - 2048
        r = out[d]
        assert r["sample_rate"] == 16_000 + (d % 4) * 8_000
        assert (r["channels"], r["n_samples"]) == (1, n)
        assert r["sample_sum"] == int(v.sum())
        assert r["sample_sq_sum"] == int((v * v).sum())
        assert r["peak"] == int(np.abs(v).max())


def test_spark_video_frames_match_formula(spark):
    from mwmbl_spark.multimodal import decode_video_frames_real, synth_avi_payloads
    from pyspark.sql import functions as F

    docs = spark.range(0, 20).select(F.col("id").alias("doc_id"))
    rows = decode_video_frames_real(synth_avi_payloads(docs), every_n=2).collect()
    got = {(r["doc_id"], r["frame_idx"]): r for r in rows}
    want_keys = {
        (d, f) for d in range(20) for f in range(d % 4 + 2) if f % 2 == 0
    }
    assert set(got) == want_keys
    for (d, f), r in got.items():
        v = (d * 13 + f * 29) % 256
        assert (r["width"], r["height"]) == (8, 8)
        assert r["pixel_sum"] == 64 * flat_block_roundtrip(v), (d, f)


def test_spark_audio_energy_windows_match_formula(spark):
    """Strided windows: boundaries, short tails, exact integer
    energy/peak per window."""
    from pyspark.sql import functions as F

    from mwmbl_spark.multimodal import audio_energy_windows, synth_wav_payloads

    docs = spark.range(0, 15).select(F.col("id").alias("doc_id"))
    rows = audio_energy_windows(
        synth_wav_payloads(docs), window=16, stride=8
    ).collect()
    got = {(r["doc_id"], r["win_idx"]): r for r in rows}
    for d in range(15):
        n = d % 50 + 10
        v = (d * 37 + np.arange(n) * 11) % 4096 - 2048
        n_win = -(-n // 8)
        assert {k[1] for k in got if k[0] == d} == set(range(n_win)), d
        for k in range(n_win):
            w = v[k * 8:k * 8 + 16]
            r = got[(d, k)]
            assert (r["start"], r["n_samples"]) == (k * 8, len(w))
            assert r["energy_sum"] == int((w.astype(np.int64) ** 2).sum())
            assert r["peak"] == int(np.abs(w).max())


def test_guards_fail_loud():
    import pytest as _pytest

    from mwmbl_spark.multimodal import audio_energy_windows

    with _pytest.raises(ValueError, match="int16 range"):
        encode_wav_pcm(np.array([40000]), 16_000)
    with _pytest.raises(ValueError, match="uint8 range"):
        encode_wav_pcm(np.array([-1]), 16_000, bits=8)
    with _pytest.raises(ValueError, match="stride"):
        audio_energy_windows(None, window=16, stride=0)
