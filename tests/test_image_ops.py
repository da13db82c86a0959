"""Image-op parity tests vs torch.nn.functional (the reference's numerics)."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from planerecnet_tpu.ops.image import (calc_size_preserve_ar,
                                       fast_base_transform, pad_to_multiple,
                                       resize_bilinear, resize_nearest,
                                       upsample2x_nearest)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((8, 12), (16, 24)),     # 2x up
    ((16, 24), (8, 12)),     # 2x down
    ((15, 20), (30, 40)),
    ((120, 160), (480, 640)),
    ((10, 10), (7, 13)),     # non-integer scale
])
def test_resize_bilinear_matches_torch(in_hw, out_hw):
    rng = np.random.RandomState(0)
    x = rng.rand(2, *in_hw, 3).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw))
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                         size=out_hw, mode="bilinear",
                         align_corners=False).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resize_half_matches_torch_scale_factor():
    """split_feats halves p2 with scale_factor=0.5
    (reference planerecnet.py:115)."""
    rng = np.random.RandomState(1)
    x = rng.rand(1, 16, 20, 4).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), (8, 10)))
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                         scale_factor=0.5, mode="bilinear",
                         align_corners=False,
                         recompute_scale_factor=False
                         ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upsample2x_nearest_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.rand(1, 5, 7, 3).astype(np.float32)
    got = np.asarray(upsample2x_nearest(jnp.asarray(x)))
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                         scale_factor=2, mode="nearest"
                         ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(got, want)


def test_resize_nearest_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.rand(1, 6, 9, 2).astype(np.float32)
    got = np.asarray(resize_nearest(jnp.asarray(x), (12, 18)))
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                         size=(12, 18), mode="nearest"
                         ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(got, want)


def test_pad_to_multiple():
    x = np.ones((30, 33, 3))
    y = pad_to_multiple(x, 32)
    assert y.shape == (32, 64, 3)
    assert y[:30, :33].sum() == 30 * 33 * 3
    assert y[30:].sum() == 0 and y[:, 33:].sum() == 0
    assert pad_to_multiple(np.ones((32, 64, 3))).shape == (32, 64, 3)


def test_calc_size_preserve_ar():
    assert calc_size_preserve_ar(640, 480, 640) == (640, 480)
    assert calc_size_preserve_ar(480, 640, 640) == (480, 640)
    assert calc_size_preserve_ar(1280, 720, 640) == (640, 360)


def test_fast_base_transform():
    from planerecnet_tpu.config import MEANS, STD
    x = np.zeros((1, 4, 4, 3), np.float32)
    x[..., 0] = MEANS[0]  # B channel equal to its mean -> 0 after normalise
    y = np.asarray(fast_base_transform(jnp.asarray(x)))
    # output is RGB: the B channel lands at index 2
    np.testing.assert_allclose(y[..., 2], 0.0, atol=1e-6)
    np.testing.assert_allclose(y[..., 0], -MEANS[2] / STD[2], rtol=1e-5)
