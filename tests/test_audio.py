"""Real WAV audio path: stdlib codec round-trips, integer-exact
features, decimation resample, loud failures for non-WAV payloads, and
distributed == single-process equality."""

from __future__ import annotations

import io
import struct
import wave

import pytest

from grokspark.operators.audio import (
    fake_wav,
    resample_wav,
    wav_features,
)


def _make_wav(samples, rate=8000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def test_fake_wav_is_real_riff_and_decodes_with_stdlib():
    p = fake_wav("doc-1", "hello world")
    assert p[:4] == b"RIFF" and p[8:12] == b"WAVE"
    with wave.open(io.BytesIO(p), "rb") as w:
        assert w.getnchannels() == 1 and w.getsampwidth() == 2
        assert 256 <= w.getnframes() <= 2303
    # deterministic across calls
    assert p == fake_wav("doc-1", "hello world")
    assert p != fake_wav("doc-2", "hello world")


def test_wav_features_integer_exact():
    # hand-computable waveform: [100, -100, 100, -100, 0, 0]
    s = [100, -100, 100, -100, 0, 0]
    f = wav_features(_make_wav(s, rate=1000))
    assert f["n_samples"] == 6 and f["sample_rate"] == 1000
    assert f["duration_ms"] == 6 * 1000 // 1000
    # energy = 4*10000; rms_milli = isqrt(40000 * 1e6 // 6)
    import math

    assert f["rms_milli"] == math.isqrt(40000 * 1_000_000 // 6)
    # crossings: +,-,+,-,0,0 -> sign flips at 4 boundaries (0 is
    # non-negative, so -100 -> 0 flips, 0 -> 0 doesn't)
    assert f["zero_crossings"] == 4


def test_wav_features_empty():
    f = wav_features(_make_wav([]))
    assert f["n_samples"] == 0 and f["rms_milli"] == 0


def test_resample_wav_decimates():
    s = list(range(-50, 50))
    out = resample_wav(_make_wav(s, rate=8000), 4)
    rate, samples = None, None
    with wave.open(io.BytesIO(out), "rb") as w:
        rate = w.getframerate()
        samples = list(
            struct.unpack(f"<{w.getnframes()}h", w.readframes(w.getnframes()))
        )
    assert rate == 2000 and samples == s[::4]
    with pytest.raises(ValueError):
        resample_wav(_make_wav(s), 0)


def test_non_wav_payload_is_loud():
    with pytest.raises(NotImplementedError):
        wav_features(b"\xff\xfb\x90\x00 fake mp3 frame")
    # RIFF but stereo -> ValueError, not silent garbage
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<4h", 1, 2, 3, 4))
    with pytest.raises(ValueError):
        wav_features(buf.getvalue())


def test_distributed_audio_matches_twin(spark):
    from grokspark.operators.audio import (
        extract_audio_features,
        resample_audio,
        wav_payload_df,
    )

    docs = [(i, f"text number {i} with words") for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    feats = {
        r["item_id"]: (r["n_samples"], r["rms_milli"], r["zero_crossings"], r["sha1"])
        for r in extract_audio_features(wav_payload_df(df)).collect()
    }
    import hashlib

    for i, t in docs:
        p = fake_wav(str(i), t)
        f = wav_features(p)
        assert feats[str(i)] == (
            f["n_samples"], f["rms_milli"], f["zero_crossings"],
            hashlib.sha1(p).hexdigest(),
        )
    # resample chain: distributed == twin, and 4x fewer samples
    res = {
        r["item_id"]: r["n_samples"]
        for r in extract_audio_features(
            resample_audio(wav_payload_df(df), 4)
        ).collect()
    }
    for i, t in docs:
        n = wav_features(fake_wav(str(i), t))["n_samples"]
        assert res[str(i)] == (n + 3) // 4
