"""Audio columns: real in-container WAV (RIFF/PCM) codec + Arrow-batched
featurization, the audio sibling of the PNG path in ``multimodal.py``.

The container ships no audio libraries, but WAV needs none — the RIFF
container and 16-bit PCM frames are pure ``struct`` math (public format:
the RIFF/WAVE spec, as also implemented by CPython's stdlib ``wave``
module, which the tests use as an independent cross-check of this
codec). A production deployment swaps ``_decode_audio`` for
torchaudio/soundfile with broader format coverage; everything else —
the mapInPandas batching, the integer feature math, the schema — is the
real 100 TB shape.

Reference parity note: the reference (uowl/automated-data-pipeline) has
no media handling at all; this is a charter extension (multimodal
columns for training-data pipelines). Features are EXACT integer
accumulators (abs-sum, energy, zero-crossings) so the driver's
value-hash gate can verify the full encode->decode->featurize loop
against a DuckDB oracle that re-derives the same integers from the
source bytes.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

WAV_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, n_channels int, n_samples long, "
    "duration_ms long, abs_sum long, energy long, zero_crossings long, "
    "peak int, decode_ok boolean"
)


def encode_wav(samples: list[int], sample_rate: int = 8000,
               channels: int = 1) -> bytes:
    """Encode interleaved 16-bit PCM samples into a canonical 44-byte-
    header WAV file (RIFF little-endian, PCM format tag 1)."""
    n = len(samples)
    data = struct.pack("<%dh" % n, *samples)
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, sample_rate,
                      byte_rate, block_align, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode a PCM WAV file: returns (sample_rate, channels,
    interleaved int16 samples). Walks RIFF chunks (a real-world WAV may
    carry LIST/fact chunks before data), accepts only format tag 1
    (PCM) at 16 bits — the subset a featurize pipeline normalizes to.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = channels = bits = None
    data = None
    while pos + 8 <= len(payload):
        ctype = payload[pos:pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + length]
        if len(body) != length:
            # a declared length past the end of the payload is a
            # truncated/corrupt file — flag it, don't silently decode
            # the partial clip as if it were complete
            raise ValueError("truncated WAV chunk")
        # chunks are word-aligned: odd-length bodies carry a pad byte
        pos += 8 + length + (length & 1)
        if ctype == b"fmt ":
            fmt_tag, channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if fmt_tag != 1:
                raise ValueError(f"unsupported WAV format tag {fmt_tag}")
            if bits != 16:
                raise ValueError(f"unsupported WAV bit depth {bits}")
        elif ctype == b"data":
            data = body
    if sample_rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    n = len(data) // 2
    samples = list(struct.unpack("<%dh" % n, data[:2 * n]))
    return sample_rate, channels, samples


def _decode_audio(payload: bytes) -> tuple[int, int, list[int]]:
    """Real decode seam (mirrors multimodal._decode_image): a richer
    library plugs in here when present; the stdlib WAV path is the
    in-container default."""
    return decode_wav(payload)


def attach_wav_payload(df: DataFrame, id_col: str, text_col: str,
                       sample_rate: int = 8000) -> DataFrame:
    """Test/fixture harness: build REAL mono 16-bit PCM WAV payloads
    deterministically from a text column — consecutive UTF-8 byte pairs
    become one little-endian int16 sample (a trailing odd byte is
    dropped). The bytes->samples rule is simple enough to re-derive in
    SQL, which is what lets the oracle value-check the whole
    encode->decode round trip."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                raw = (text or "").encode("utf-8")
                n = len(raw) // 2
                samples = list(struct.unpack("<%dh" % n, raw[:2 * n]))
                payloads.append(encode_wav(samples, sample_rate, 1))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    src = df.selectExpr(f"{id_col} as media_id", f"{text_col} as text")
    return src.mapInPandas(build, schema="media_id long, payload binary")


def decode_audio_features(df: DataFrame) -> DataFrame:
    """mapInPandas featurization through the REAL RIFF parser: geometry
    (rate/channels/samples/duration) plus exact integer signal features
    — abs-sum, energy (sum of squares; int64-safe: 32768^2 * frames
    stays far below 2^63 for any realistic clip), zero-crossing count
    (sign flips between consecutive frames, sign = sample < 0), peak
    |amplitude|. Corrupt payloads are flagged per row, never fatal —
    same contract as the image path."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    rate, ch, samples = _decode_audio(bytes(payload or b""))
                    arr = np.asarray(samples, dtype=np.int64)
                    n = len(arr) // max(ch, 1)
                    # zero crossings are PER CHANNEL: de-interleave to
                    # (frames, channels) and count sign flips down each
                    # channel column — comparing consecutive interleaved
                    # samples would count L/R alternation as crossings
                    frames = arr[: n * ch].reshape(n, max(ch, 1))
                    signs = frames < 0
                    rows.append((
                        mid, rate, ch, n,
                        n * 1000 // rate,
                        int(np.abs(arr).sum()),
                        int((arr * arr).sum()),
                        int((signs[1:] != signs[:-1]).sum()),
                        int(np.abs(arr).max()) if len(arr) else 0,
                        True,
                    ))
                except Exception:
                    rows.append((mid, None, None, None, None, None, None,
                                 None, None, False))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_channels", "n_samples",
                    "duration_ms", "abs_sum", "energy", "zero_crossings",
                    "peak", "decode_ok",
                ],
            )

    return df.mapInPandas(featurize, schema=WAV_FEATURE_SCHEMA)


N_FP_BUCKETS = 65  # 65 energy buckets -> 64 difference bits


def fingerprint64(payload: bytes) -> int:
    """Acoustic difference fingerprint (64-bit): decode -> split the
    clip into 65 equal sample buckets -> per-bucket integer energy
    (sum of |sample|) -> one bit per adjacent bucket pair (later
    louder than earlier). The audio twin of the image dHash: loudness-
    envelope shape survives re-encoding and mild edits; unrelated
    clips differ in ~32 bits. Pure integer math, deterministic."""
    _, ch, samples = _decode_audio(payload)
    n = len(samples)
    sums = []
    for j in range(N_FP_BUCKETS):
        a, b = j * n // N_FP_BUCKETS, (j + 1) * n // N_FP_BUCKETS
        sums.append(sum(abs(s) for s in samples[a:b]))
    bits = 0
    for i in range(N_FP_BUCKETS - 1):
        if sums[i + 1] > sums[i]:
            bits |= 1 << i
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def audio_fingerprint(df: DataFrame, id_col: str = "media_id",
                      payload_col: str = "payload") -> DataFrame:
    """Arrow-batched fingerprint per audio payload: (media_id,
    fingerprint, decode_ok). Corrupt payloads flag their row."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rows.append(
                        (mid, fingerprint64(bytes(payload or b"")), True)
                    )
                except Exception:
                    rows.append((mid, None, False))
            yield pd.DataFrame(
                rows, columns=["media_id", "fingerprint", "decode_ok"]
            )

    src = df.select(id_col, payload_col)
    return src.mapInPandas(
        run, schema="media_id long, fingerprint long, decode_ok boolean"
    )


def audio_near_dup_pairs(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 6,
    n_blocks: int = 8,
) -> DataFrame:
    """Acoustic near-dup pairs: fingerprint the payloads, then the
    generic pigeonhole block join (``dedup.hamming_near_dup_pairs``) —
    the same machinery behind SimHash text dedup and dHash image
    dedup, applied to the third modality."""
    from . import dedup

    from pyspark.sql import functions as F

    # fingerprint == 0 means a structureless clip (empty, silent, or
    # monotonically decaying envelope) — excluded for the same
    # hot-bucket reason as simhash_pairs' token-less guard and the
    # image path's dHash-0 guard
    hashes = audio_fingerprint(df, id_col, payload_col).filter(
        F.col("decode_ok") & (F.col("fingerprint") != 0)
    )
    return dedup.hamming_near_dup_pairs(
        hashes, "media_id", "fingerprint",
        bits=64, max_hamming=max_hamming, n_blocks=n_blocks,
    )


def resample_audio(df: DataFrame, target_rate: int) -> DataFrame:
    """Real resample: decode -> nearest-neighbor frame resample ->
    re-encode WAV, the audio twin of ``multimodal.resize_image``.
    Mono-or-interleaved safe (resamples whole frames). Rows that don't
    decode pass through unchanged."""

    def do_resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            out = []
            for payload in pdf["payload"]:
                try:
                    rate, ch, samples = _decode_audio(bytes(payload or b""))
                    n = len(samples) // max(ch, 1)
                    m = max(n * target_rate // rate, 1) if n else 0
                    frames = []
                    for j in range(m):
                        src = min(j * n // m, n - 1)
                        frames.extend(samples[src * ch:(src + 1) * ch])
                    out.append(encode_wav(frames, target_rate, ch))
                except Exception:
                    out.append(payload)
            pdf["payload"] = out
            yield pdf

    return df.mapInPandas(do_resample, schema="media_id long, payload binary")
