"""Native C RLE codec tests: build, parity with the python decoder."""

import numpy as np
import pytest

from planerecnet_tpu.data.coco import (_decode_rle_counts, mask_to_rle,
                                       rle_to_mask)
from planerecnet_tpu.native import (native_available,
                                    rle_decode_counts_native,
                                    rle_fill_native)


def _encode_counts(counts):
    """Independent compressed-RLE counts encoder (COCO 6-bit varint with
    delta coding for runs past the first two)."""
    out = []
    for i, x in enumerate(counts):
        if i > 2:
            x = x - counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = not (x == 0 and not (c & 0x10)) and \
                   not (x == -1 and (c & 0x10))
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return "".join(out)


def test_native_builds():
    assert native_available(), "C compiler present but librle.so failed"


def test_native_decode_matches_python():
    rng = np.random.RandomState(0)
    counts = rng.randint(0, 2000, size=101).tolist()
    s = _encode_counts(counts)
    py = _decode_rle_counts(s)
    nat = rle_decode_counts_native(s)
    assert py == counts
    assert nat == counts


def test_native_fill_matches_python_roundtrip():
    rng = np.random.RandomState(1)
    mask = (rng.rand(37, 53) > 0.7).astype(np.uint8)
    rle = mask_to_rle(mask)
    nat = rle_fill_native(rle["counts"], 37, 53)
    np.testing.assert_array_equal(nat, mask)
    # full path through the reader
    np.testing.assert_array_equal(rle_to_mask(rle), mask)


def test_compressed_string_full_path():
    rng = np.random.RandomState(2)
    mask = (rng.rand(29, 31) > 0.5).astype(np.uint8)
    rle = mask_to_rle(mask)
    s = _encode_counts(rle["counts"])
    decoded = rle_to_mask({"size": [29, 31], "counts": s})
    np.testing.assert_array_equal(decoded, mask)


def test_framework_string_encoder_matches_independent():
    """The framework's compressed-counts encoder (used by the COCO
    detection dump) must emit the exact pycocotools string format — pinned
    against this file's independently-written encoder."""
    from planerecnet_tpu.data.coco import _encode_rle_counts

    rng = np.random.RandomState(3)
    for _ in range(20):
        counts = rng.randint(0, 5000, size=rng.randint(1, 60)).tolist()
        assert _encode_rle_counts(counts) == _encode_counts(counts)
    # delta coding goes negative when a later run is shorter
    counts = [0, 4000, 1, 2, 1, 3999]
    assert _encode_rle_counts(counts) == _encode_counts(counts)
    assert _decode_rle_counts(_encode_rle_counts(counts)) == counts


def test_mask_to_compressed_rle_roundtrip():
    from planerecnet_tpu.data.coco import mask_to_compressed_rle

    rng = np.random.RandomState(4)
    cases = [np.zeros((5, 7), np.uint8), np.ones((5, 7), np.uint8),
             np.eye(6, dtype=np.uint8)]
    cases += [(rng.rand(*rng.randint(1, 50, 2)) > rng.rand())
              for _ in range(20)]
    for m in cases:
        rle = mask_to_compressed_rle(m)
        assert isinstance(rle["counts"], str)
        np.testing.assert_array_equal(rle_to_mask(rle),
                                      m.astype(np.uint8))


def test_native_encode_matches_numpy_counts():
    from planerecnet_tpu.native import rle_encode_mask_native

    rng = np.random.RandomState(5)
    for mask in [(rng.rand(33, 17) > 0.5),
                 np.ones((4, 4), np.uint8),      # leading zero-length run
                 np.zeros((4, 4), np.uint8)]:
        nat = rle_encode_mask_native(mask)
        if nat is None:
            pytest.skip("native lib unavailable")
        flat = np.asfortranarray(mask.astype(np.uint8)).reshape(-1,
                                                                order="F")
        change = np.flatnonzero(np.diff(flat)) + 1
        bounds = np.concatenate([[0], change, [flat.size]])
        counts = np.diff(bounds).tolist()
        if flat[0] == 1:
            counts = [0] + counts
        assert nat == counts
