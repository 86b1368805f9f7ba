"""FPK1 multi-frame container: pack/parse/stride-sampling semantics."""

from __future__ import annotations

import pytest

from bigdatatiler_spark.media.framepack import frame_count, iter_frames, pack_frames


def test_roundtrip_all_frames():
    frames = [b"alpha", b"", b"\x00\x01\x02", b"z" * 1000]
    blob = pack_frames(frames)
    assert frame_count(blob) == 4
    assert [(i, f) for i, f in iter_frames(blob)] == list(enumerate(frames))


def test_stride_sampling_skips_by_length_prefix():
    frames = [bytes([i]) * (i + 1) for i in range(10)]
    blob = pack_frames(frames)
    sampled = list(iter_frames(blob, stride=3))
    assert [i for i, _ in sampled] == [0, 3, 6, 9]
    assert all(f == frames[i] for i, f in sampled)


def test_empty_container():
    blob = pack_frames([])
    assert frame_count(blob) == 0
    assert list(iter_frames(blob)) == []


def test_bad_magic_and_stride():
    with pytest.raises(ValueError, match="FPK1"):
        frame_count(b"nope" + b"\x00" * 8)
    with pytest.raises(ValueError, match="stride"):
        list(iter_frames(pack_frames([b"x"]), stride=0))
