"""Fused dice/lava Pallas kernel vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from planerecnet_tpu.ops.pallas.dice_lava import (fused_dice_lava,
                                                  fused_dice_lava_xla)


def _inputs(b=2, p=16, k=32, n=4, hw=300, seed=0):
    rng = np.random.RandomState(seed)
    kernels = jnp.asarray(rng.randn(b, p, k).astype(np.float32) * 0.2)
    feat = jnp.asarray(rng.randn(b, hw, k).astype(np.float32) * 0.2)
    onehot = np.zeros((b, p, n), np.float32)
    for bi in range(b):
        for pi in range(p):
            if rng.rand() > 0.25:  # some slots invalid (all-zero row)
                onehot[bi, pi, rng.randint(n)] = 1.0
    targets = jnp.asarray((rng.rand(b, n, hw) > 0.5).astype(np.float32))
    grad = jnp.asarray(rng.rand(b, hw).astype(np.float32))
    return kernels, feat, jnp.asarray(onehot), targets, grad


def test_fused_forward_matches_xla():
    args = _inputs()
    with pltpu.force_tpu_interpret_mode():
        a, b, lava = fused_dice_lava(*args)
    a_x, b_x, lava_x = fused_dice_lava_xla(*args)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_x), rtol=1e-4,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(b), np.asarray(b_x), rtol=1e-4,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(lava), np.asarray(lava_x),
                               rtol=1e-4, atol=1e-3)


def test_fused_backward_matches_xla():
    args = _inputs(seed=1)

    def loss_fused(kernels, feat):
        a, b, lava = fused_dice_lava(kernels, feat, *args[2:])
        return jnp.sum(a * 0.7 - b * 0.3 + lava * 1.3)

    def loss_xla(kernels, feat):
        a, b, lava = fused_dice_lava_xla(kernels, feat, *args[2:])
        return jnp.sum(a * 0.7 - b * 0.3 + lava * 1.3)

    with pltpu.force_tpu_interpret_mode():
        gk, gm = jax.grad(loss_fused, argnums=(0, 1))(*args[:2])
    gk_x, gm_x = jax.grad(loss_xla, argnums=(0, 1))(*args[:2])
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_x), rtol=1e-4,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gm_x), rtol=1e-4,
                               atol=1e-3)


def test_fused_multichunk_padding():
    """HW not a multiple of the chunk exercises the pixel padding path."""
    args = _inputs(hw=2048 + 333, seed=2)
    with pltpu.force_tpu_interpret_mode():
        a, b, lava = fused_dice_lava(*args)
    a_x, b_x, lava_x = fused_dice_lava_xla(*args)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_x), rtol=1e-5,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(lava), np.asarray(lava_x),
                               rtol=1e-4, atol=1e-3)


def test_compute_losses_fused_matches_unfused():
    """Full loss dict parity between the fused Pallas path and the XLA
    composition (interpret mode)."""
    import sys
    sys.path.insert(0, "tests")
    from test_losses import _tiny_batch
    from planerecnet_tpu.config import PlaneRecNet_50_config
    from planerecnet_tpu.losses import compute_losses

    base = PlaneRecNet_50_config.copy(dict(
        max_instances=4, max_positives=16, vnl_samples=32))
    rng = np.random.RandomState(7)
    b, h, w = 2, 64, 64
    batch = _tiny_batch(base, rng, b=b, h=h, w=w, n=4)
    sv = base.solov2
    preds = {
        "cate_preds": [jnp.asarray(rng.randn(b, g, g, base.num_classes)
                                   .astype(np.float32))
                       for g in sv.num_grids[:4]],
        "kernel_preds": [jnp.asarray(rng.randn(b, g, g, sv.num_kernels)
                                     .astype(np.float32) * 0.1)
                         for g in sv.num_grids[:4]],
        "mask_pred": jnp.asarray(rng.randn(b, h // 4, w // 4, sv.num_kernels)
                                 .astype(np.float32) * 0.1),
        "depth_pred": jnp.asarray(rng.rand(b, h // 2, w // 2, 1)
                                  .astype(np.float32) + 0.5),
    }
    off = compute_losses(base.copy(dict(fused_loss_kernel="off")), preds,
                         batch, jax.random.PRNGKey(0))
    with pltpu.force_tpu_interpret_mode():
        on = compute_losses(base.copy(dict(fused_loss_kernel="on")), preds,
                            batch, jax.random.PRNGKey(0))
    for k in off:
        np.testing.assert_allclose(float(off[k]), float(on[k]), rtol=2e-4,
                                   atol=1e-5)
