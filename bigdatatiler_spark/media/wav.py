"""Minimal WAV (RIFF/PCM) codec on the standard library (struct + zlib-free).

Companion to ``png.py``: WAV's canonical form is uncompressed PCM in a
RIFF container — pure header parsing, no external audio library needed —
so the multimodal AUDIO decode slot can run on real bytes in this
environment. Scope: PCM (format tag 1), 16-bit signed little-endian
samples, any channel count / sample rate; other format tags or bit
depths raise ValueError (the honest boundary — compressed codecs need
ffmpeg). The sample path is numpy-vectorized (r8 verdict item 4: the
per-sample Python loops were the hot path of the audio bench lines);
integer-typed input takes the vectorized branch, anything numpy would
coerce lossily (floats, bigints → object dtype) falls back to the
original per-sample loop so the validation semantics are unchanged.

Format reference: the public RIFF/WAVE specification ("RIFF" +
"WAVE" + "fmt " + "data" chunks, little-endian).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(sample_rate: int, channels: int, samples: list[int]) -> bytes:
    """Encode interleaved 16-bit signed samples as a canonical PCM WAV.
    ``len(samples)`` must be a multiple of ``channels``."""
    if channels < 1:
        raise ValueError("channels must be >= 1")
    if len(samples) % channels:
        raise ValueError("sample count not a multiple of channel count")
    arr = np.asarray(samples)
    if arr.dtype.kind in "iu":
        bad = (arr < -32768) | (arr > 32767)
        if bad.any():
            s = int(arr[int(np.argmax(bad))])
            raise ValueError(f"sample {s} outside int16 range")
        data = arr.astype("<i2").tobytes()
    else:
        # non-integer dtype (floats / out-of-int64 values): keep the exact
        # per-sample validation + struct errors of the original path
        for s in samples:
            if not -32768 <= s <= 32767:
                raise ValueError(f"sample {s} outside int16 range")
        data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """Decode a PCM16 WAV into ``(sample_rate, channels, samples)`` with
    interleaved int16 samples. Raises ValueError outside the PCM16
    subset or on a malformed container."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = channels = bits = None
    fmt_tag = None
    samples: list[int] | None = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            if length < 16:
                raise ValueError("fmt chunk too short")
            fmt_tag, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
        elif tag == b"data":
            if fmt_tag is None:
                raise ValueError("data chunk before fmt chunk")
            if fmt_tag != 1:
                raise ValueError(f"unsupported format tag {fmt_tag} (PCM only)")
            if bits != 16:
                raise ValueError(f"unsupported bit depth {bits} (16 only)")
            if length % 2:
                raise ValueError("odd data-chunk length for 16-bit samples")
            samples = np.frombuffer(body, dtype="<i2").tolist()
        # chunks are word-aligned: odd-length bodies carry a pad byte
        pos += 8 + length + (length & 1)
    if samples is None:
        raise ValueError("missing data chunk")
    return rate, channels, samples


def audio_stats(samples: list[int]) -> tuple[int, int, int]:
    """(sum_abs, peak_abs, zero_crossings) over int16 samples — the
    integer-exact feature triple the decode-stats query reports. A zero
    crossing is a sign change between consecutive samples, with 0
    counted as non-negative (s < 0 flips)."""
    if not samples:
        return 0, 0, 0
    a = np.abs(np.asarray(samples, dtype=np.int64))
    neg = np.asarray(samples, dtype=np.int64) < 0
    return (
        int(a.sum()),
        int(a.max()),
        int((neg[:-1] != neg[1:]).sum()),
    )
