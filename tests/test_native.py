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
