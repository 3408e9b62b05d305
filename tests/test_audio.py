"""WAV codec + audio featurization tests. The codec is validated two
ways: round-trip through our own encoder/decoder, and cross-checked
against CPython's stdlib ``wave`` module (an independent RIFF/PCM
implementation) in both directions."""

from __future__ import annotations

import io
import struct
import wave

import pytest

from automated_data_pipeline_spark.operators import audio


def test_wav_roundtrip_mono():
    samples = [0, 1, -1, 32767, -32768, 1000, -999]
    payload = audio.encode_wav(samples, 8000, 1)
    rate, ch, out = audio.decode_wav(payload)
    assert (rate, ch) == (8000, 1)
    assert out == samples


def test_wav_roundtrip_stereo():
    frames = [10, -10, 200, -200, 3000, -3000]  # 3 stereo frames
    payload = audio.encode_wav(frames, 44100, 2)
    rate, ch, out = audio.decode_wav(payload)
    assert (rate, ch) == (44100, 2)
    assert out == frames


def test_our_encoder_readable_by_stdlib_wave():
    samples = [0, 500, -500, 12345, -12345]
    payload = audio.encode_wav(samples, 16000, 1)
    with wave.open(io.BytesIO(payload)) as w:
        assert w.getframerate() == 16000
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        raw = w.readframes(w.getnframes())
    assert list(struct.unpack("<%dh" % len(samples), raw)) == samples


def test_stdlib_wave_readable_by_our_decoder():
    samples = [7, -7, 77, -77]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(22050)
        w.writeframes(struct.pack("<%dh" % len(samples), *samples))
    rate, ch, out = audio.decode_wav(buf.getvalue())
    assert (rate, ch) == (22050, 1)
    assert out == samples


def test_decoder_walks_extra_riff_chunks():
    # a LIST chunk (odd-length body -> pad byte) before fmt/data must
    # be skipped, as real-world encoders emit metadata chunks
    samples = [1, 2, 3]
    base = audio.encode_wav(samples, 8000, 1)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    payload = base[:12] + extra + base[12:]
    rate, ch, out = audio.decode_wav(payload)
    assert (rate, ch, out) == (8000, 1, samples)


def test_decoder_rejects_non_wav():
    with pytest.raises(ValueError):
        audio.decode_wav(b"\x89PNG\r\n\x1a\nnot audio")
    with pytest.raises(ValueError):
        audio.decode_wav(b"RIFF\x00\x00\x00\x00AVI ")


def test_decode_audio_features_spark(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "hello world!"), (2, ""), (3, "ab")], ["doc_id", "text"]
    )
    media = audio.attach_wav_payload(df, "doc_id", "text", sample_rate=8000)
    feats = {r["media_id"]: r for r in audio.decode_audio_features(media).collect()}
    # doc 1: 12 bytes -> 6 samples
    raw = "hello world!".encode()
    samples = list(struct.unpack("<6h", raw))
    assert feats[1]["n_samples"] == 6
    assert feats[1]["abs_sum"] == sum(abs(s) for s in samples)
    assert feats[1]["energy"] == sum(s * s for s in samples)
    signs = [s < 0 for s in samples]
    assert feats[1]["zero_crossings"] == sum(
        1 for a, b in zip(signs, signs[1:]) if a != b
    )
    assert feats[1]["duration_ms"] == 6 * 1000 // 8000
    assert feats[1]["decode_ok"] is True
    # empty text -> zero-sample clip, still a valid WAV
    assert feats[2]["n_samples"] == 0
    assert feats[2]["peak"] == 0
    assert feats[2]["decode_ok"] is True
    # odd trailing byte dropped: "ab" -> 1 sample
    assert feats[3]["n_samples"] == 1

    # corrupt payload flagged, not fatal
    bad = spark.createDataFrame(
        [(9, bytearray(b"not a wav"))], "media_id long, payload binary"
    )
    out = audio.decode_audio_features(bad).collect()[0]
    assert out["decode_ok"] is False and out["sample_rate"] is None


def test_resample_audio_spark(spark):
    df = spark.createDataFrame([(1, "abcdefgh")], ["doc_id", "text"])
    media = audio.attach_wav_payload(df, "doc_id", "text", sample_rate=8000)
    half = audio.resample_audio(media, 4000)
    payload = bytes(half.collect()[0]["payload"])
    rate, ch, out = audio.decode_wav(payload)
    orig = list(struct.unpack("<4h", "abcdefgh".encode()))
    assert rate == 4000 and ch == 1
    assert len(out) == 2  # 4 samples halved
    # nearest-neighbor picks source frames 0 and 2
    assert out == [orig[0], orig[2]]


def test_decoder_rejects_truncated_data_chunk():
    samples = [1, -2, 3, -4]
    payload = audio.encode_wav(samples, 8000, 1)
    with pytest.raises(ValueError):
        audio.decode_wav(payload[:-3])  # cut mid-data: declared > actual


def test_stereo_zero_crossings_are_per_channel(spark):
    # constant L=+1000, R=-1000: interleaved signs alternate every
    # sample but NEITHER channel ever crosses zero
    frames = [1000, -1000] * 4
    payload = audio.encode_wav(frames, 8000, 2)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    out = audio.decode_audio_features(df).collect()[0]
    assert out["n_channels"] == 2
    assert out["n_samples"] == 4
    assert out["zero_crossings"] == 0
    # and a channel that DOES cross is counted once per flip
    frames = [1000, 1000, -1000, 1000]  # L: +,- (one flip); R: +,+ (none)
    payload = audio.encode_wav(frames, 8000, 2)
    df = spark.createDataFrame(
        [(2, bytearray(payload))], "media_id long, payload binary"
    )
    out = audio.decode_audio_features(df).collect()[0]
    assert out["zero_crossings"] == 1


def test_audio_fingerprint_near_dup(spark):
    base = audio.encode_wav([100, -2000, 300, -4000, 5000, -600] * 40, 8000, 1)
    # mild loudness scaling preserves the envelope SHAPE exactly
    scaled = audio.encode_wav(
        [s * 9 // 10 for s in [100, -2000, 300, -4000, 5000, -600] * 40],
        8000, 1,
    )
    other = audio.encode_wav(
        [(-1) ** i * (37 * i * i % 5000) for i in range(240)], 8000, 1
    )
    df = spark.createDataFrame(
        [(1, bytearray(base)), (2, bytearray(scaled)), (3, bytearray(other)),
         (4, bytearray(b"junk"))],
        "media_id long, payload binary",
    )
    pairs = audio.audio_near_dup_pairs(df, max_hamming=6).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert got.get((1, 2)) == 0  # identical envelope shape
    assert all(3 not in k for k in got)
    fps = audio.audio_fingerprint(df).collect()
    bad = [r for r in fps if r["media_id"] == 4][0]
    assert bad["decode_ok"] is False and bad["fingerprint"] is None
