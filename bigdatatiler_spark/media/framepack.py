"""Minimal multi-frame container: length-prefixed concatenated frames.

The multimodal "video" column is treated the way the engine treats every
media payload — an opaque ``binary`` column plus typed metadata (see
SURVEY.md §2 / multimodal.py). Real video codecs aren't in this
container image, so the *container* is this trivial but real format:

    magic "FPK1" | u32 n_frames | (u32 frame_len | frame_bytes)*

(big-endian lengths). Frames are any self-contained byte blob — here
PNG-encoded images from media/png.py, so decode is real too. The format
supports the one access pattern frame sampling needs: skip-ahead by
length prefix without decoding unsampled frames — exactly how a frame
sampler over a keyframe-indexed real container behaves.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

_MAGIC = b"FPK1"


def pack_frames(frames: list[bytes]) -> bytes:
    """Serialize frames into one container blob."""
    out = [_MAGIC, struct.pack(">I", len(frames))]
    for f in frames:
        out.append(struct.pack(">I", len(f)))
        out.append(f)
    return b"".join(out)


def frame_count(blob: bytes) -> int:
    if blob[:4] != _MAGIC:
        raise ValueError("not an FPK1 container")
    if len(blob) < 8:
        raise ValueError("truncated FPK1 container (missing frame count)")
    return struct.unpack(">I", blob[4:8])[0]


def iter_frames(blob: bytes, stride: int = 1) -> Iterator[tuple[int, bytes]]:
    """Yield (frame_index, frame_bytes) for every stride-th frame.

    Unsampled frames are SKIPPED by their length prefix — never copied or
    decoded (the point of frame sampling: decode cost scales with frames
    kept, not frames stored).
    """
    if stride < 1:
        raise ValueError("stride must be >= 1")
    n = frame_count(blob)
    off = 8
    for i in range(n):
        # bounds-validate every prefix and payload against the actual blob
        # length: a truncated/length-corrupted container must fail loudly,
        # not yield silently short frame bytes via slice truncation
        if off + 4 > len(blob):
            raise ValueError(f"truncated FPK1 container (frame {i} prefix)")
        (ln,) = struct.unpack(">I", blob[off : off + 4])
        off += 4
        if off + ln > len(blob):
            raise ValueError(f"truncated FPK1 container (frame {i} payload)")
        if i % stride == 0:
            yield i, blob[off : off + ln]
        off += ln
    if off != len(blob):
        raise ValueError("trailing bytes after final FPK1 frame")
