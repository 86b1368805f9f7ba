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


def test_truncated_container_fails_loudly():
    """ADVICE r6: a truncated or length-corrupted container must raise a
    clear format error, never yield silently short frame bytes."""
    frames = [b"alpha", b"beta-beta", b"gamma"]
    blob = pack_frames(frames)
    # cut mid-payload of the last frame
    with pytest.raises(ValueError, match="truncated FPK1"):
        list(iter_frames(blob[:-2]))
    # cut mid-length-prefix
    with pytest.raises(ValueError, match="truncated FPK1"):
        list(iter_frames(blob[: 8 + 4 + 5 + 2]))
    # corrupt a length prefix upward (claims more bytes than exist)
    bad = bytearray(blob)
    bad[8:12] = (10**6).to_bytes(4, "big")
    with pytest.raises(ValueError, match="truncated FPK1"):
        list(iter_frames(bytes(bad)))
    # trailing garbage after the declared final frame
    with pytest.raises(ValueError, match="trailing bytes"):
        list(iter_frames(blob + b"x"))
    # container shorter than the 8-byte header
    with pytest.raises(ValueError, match="truncated FPK1"):
        frame_count(b"FPK1\x00")


def test_corruption_detected_even_on_early_break():
    """ADVICE r7: validation is upfront — a consumer that stops after the
    FIRST frame must still see trailing-bytes / truncation corruption
    (previously the end-of-blob check ran only after full iteration)."""
    blob = pack_frames([b"alpha", b"beta"])
    for bad in (blob + b"garbage", blob[:-1]):
        with pytest.raises(ValueError):
            next(iter(iter_frames(bad)))
    # and a truncated-but-valid-magic short blob reports truncation,
    # not 'not an FPK1 container'
    with pytest.raises(ValueError, match="truncated"):
        frame_count(b"FPK"[:3])
