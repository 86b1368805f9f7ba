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


def _frame_offsets(blob: bytes) -> list[tuple[int, int]]:
    """Validate the WHOLE container upfront and return [(offset, length)]
    per frame. Upfront (not lazily during iteration) so a consumer that
    stops early — e.g. breaks after the first frame — still sees
    trailing-byte/truncation corruption, and so the magic check runs
    before any length slicing (a 3-byte blob must report truncation, not
    'not an FPK1 container' from a short magic slice)."""
    if len(blob) < 8:
        if blob[: min(4, len(blob))] != _MAGIC[: min(4, len(blob))]:
            raise ValueError("not an FPK1 container")
        raise ValueError("truncated FPK1 container (missing frame count)")
    if blob[:4] != _MAGIC:
        raise ValueError("not an FPK1 container")
    n = struct.unpack(">I", blob[4:8])[0]
    offsets: list[tuple[int, int]] = []
    off = 8
    for i in range(n):
        if off + 4 > len(blob):
            raise ValueError(f"truncated FPK1 container (frame {i} prefix)")
        (ln,) = struct.unpack(">I", blob[off : off + 4])
        off += 4
        if off + ln > len(blob):
            raise ValueError(f"truncated FPK1 container (frame {i} payload)")
        offsets.append((off, ln))
        off += ln
    if off != len(blob):
        raise ValueError("trailing bytes after final FPK1 frame")
    return offsets


def frame_count(blob: bytes) -> int:
    return len(_frame_offsets(blob))


def iter_frames(blob: bytes, stride: int = 1) -> Iterator[tuple[int, bytes]]:
    """Yield (frame_index, frame_bytes) for every stride-th frame.

    Unsampled frames are SKIPPED by their length prefix — never copied or
    decoded (the point of frame sampling: decode cost scales with frames
    kept, not frames stored). The container is fully bounds-validated
    before the first yield.
    """
    if stride < 1:
        raise ValueError("stride must be >= 1")
    for i, (off, ln) in enumerate(_frame_offsets(blob)):
        if i % stride == 0:
            yield i, blob[off : off + ln]
