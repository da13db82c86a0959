"""Loss-system tests against independent numpy oracles.

The oracles re-derive the published PlaneRecNet/SOLOv2 loss semantics
(dice, sigmoid focal, RMSElog, SOLOv2 grid assignment, lava gradient loss)
with plain python loops — no code shared with the implementation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from planerecnet_tpu.config import PlaneRecNet_50_config
from planerecnet_tpu.losses import (adjoint_resize, center_of_mass,
                                    compute_gradient_map, compute_losses,
                                    dice_loss, prepare_ground_truth,
                                    rmse_log_loss, sigmoid_focal_loss,
                                    vnl_loss_single)
from planerecnet_tpu.ops.image import resize_bilinear


def test_dice_loss_oracle():
    rng = np.random.RandomState(0)
    x = rng.rand(5, 40).astype(np.float32)
    t = (rng.rand(5, 40) > 0.5).astype(np.float32)
    got = np.asarray(dice_loss(jnp.asarray(x), jnp.asarray(t)))
    a = (x * t).sum(1)
    b = (x * x).sum(1) + 0.001
    c = (t * t).sum(1) + 0.001
    want = 1 - 2 * a / (b + c)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_focal_loss_oracle():
    rng = np.random.RandomState(1)
    logits = rng.randn(30, 2).astype(np.float32) * 3
    targets = (rng.rand(30, 2) > 0.8).astype(np.float32)
    got = np.asarray(sigmoid_focal_loss(
        jnp.asarray(logits), jnp.asarray(targets), alpha=0.25, gamma=2.0))
    p = 1 / (1 + np.exp(-logits))
    ce = -(targets * np.log(p) + (1 - targets) * np.log(1 - p))
    p_t = p * targets + (1 - p) * (1 - targets)
    want = ce * (1 - p_t) ** 2
    alpha_t = 0.25 * targets + 0.75 * (1 - targets)
    want = alpha_t * want
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_rmse_log_oracle():
    rng = np.random.RandomState(2)
    pred = rng.rand(2, 6, 8, 1).astype(np.float32) + 0.1
    gt = rng.rand(2, 6, 8, 1).astype(np.float32) + 0.1
    valid = gt > 0.3
    got = np.asarray(rmse_log_loss(jnp.asarray(pred), jnp.asarray(gt),
                                   jnp.asarray(valid)))
    want = []
    for b in range(2):
        l1 = np.abs(np.log(pred[b]) - np.log(gt[b])) * valid[b]
        want.append(np.sqrt((l1 ** 2).sum() / valid[b].sum()))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5)


def test_center_of_mass():
    m = np.zeros((1, 10, 12), np.float32)
    m[0, 2:5, 3:7] = 1  # rows 2..4, cols 3..6
    cx, cy = center_of_mass(jnp.asarray(m))
    np.testing.assert_allclose(np.asarray(cx), [4.5], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cy), [3.0], rtol=1e-5)


def test_adjoint_resize_identity():
    """sum(resize(m, big) * G) == sum(m * adjoint(G)) — the lava-loss
    memory optimisation must be exact."""
    rng = np.random.RandomState(3)
    m = jnp.asarray(rng.rand(12, 16).astype(np.float32))
    g = jnp.asarray(rng.rand(48, 64).astype(np.float32))
    up = resize_bilinear(m[None, :, :, None], (48, 64))[0, :, :, 0]
    lhs = float(jnp.sum(up * g))
    rhs = float(jnp.sum(m * adjoint_resize(g, (12, 16))))
    assert abs(lhs - rhs) < 1e-3 * abs(lhs)


def test_gradient_map_oracle():
    rng = np.random.RandomState(4)
    d = rng.rand(1, 8, 9, 1).astype(np.float32)
    got = np.asarray(compute_gradient_map(jnp.asarray(d)))[0, :, :, 0]
    dp = np.pad(d[0, :, :, 0], 1, mode="reflect")
    sx = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]]) / 8.0
    sy = np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]]) / 8.0
    want = np.zeros((8, 9))
    for i in range(8):
        for j in range(9):
            win = dp[i:i + 3, j:j + 3]
            want[i, j] = (win * sx).sum() ** 2 + (win * sy).sum() ** 2
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def _oracle_assignment(box, cx, cy, num_grid, h, w, sigma):
    """Published SOLOv2 center-region grid assignment, scalar re-derivation."""
    half_w = 0.5 * (box[2] - box[0]) * sigma
    half_h = 0.5 * (box[3] - box[1]) * sigma
    coord_w = int((cx / w) // (1. / num_grid))
    coord_h = int((cy / h) // (1. / num_grid))
    top_box = max(0, int(((cy - half_h) / h) // (1. / num_grid)))
    down_box = min(num_grid - 1, int(((cy + half_h) / h) // (1. / num_grid)))
    left_box = max(0, int(((cx - half_w) / w) // (1. / num_grid)))
    right_box = min(num_grid - 1, int(((cx + half_w) / w) // (1. / num_grid)))
    top = max(top_box, coord_h - 1)
    down = min(down_box, coord_h + 1)
    left = max(coord_w - 1, left_box)
    right = min(right_box, coord_w + 1)
    return {i * num_grid + j
            for i in range(top, down + 1) for j in range(left, right + 1)}


def test_prepare_ground_truth_assignment():
    cfg = PlaneRecNet_50_config
    h, w = 64, 64
    n = cfg.max_instances
    masks = np.zeros((1, n, h, w), np.float32)
    boxes = np.zeros((1, n, 4), np.float32)
    labels = np.ones((1, n), np.int32)
    valid = np.zeros((1, n), bool)

    # A mid-size square instance: sqrt area = 24 -> hits levels with
    # scale range containing 24 -> level 0 only ((1,128) light config).
    masks[0, 0, 10:34, 20:44] = 1
    boxes[0, 0] = [20, 10, 44, 34]
    valid[0, 0] = True

    out = prepare_ground_truth(
        cfg, jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(valid),
        jnp.asarray(masks), num_levels=4)

    for lvl, (lo, hi) in enumerate(cfg.solov2.fpn_scale_ranges[:4]):
        g = cfg.solov2.num_grids[lvl]
        cells = np.asarray(out["pos_cells"][lvl][0])
        pvalid = np.asarray(out["pos_valids"][lvl][0])
        got_cells = set(cells[pvalid].tolist())
        if lo <= 24 <= hi:
            want = _oracle_assignment([20, 10, 44, 34], 31.5, 21.5, g, h, w,
                                      cfg.solov2.sigma)
            assert got_cells == want, (lvl, got_cells, want)
            cate = np.asarray(out["cate_labels"][lvl][0])
            assert set(np.where(cate != cfg.num_classes)[0]) == want
            ins_ind = np.asarray(out["ins_inds"][lvl][0])
            assert set(np.where(ins_ind)[0]) == want
        else:
            assert got_cells == set()


def test_masks4_matches_reference_cv2_rescale():
    """The device-side x1/4 GT-mask rescale (prepare_ground_truth's
    ``masks4``) must reproduce the reference's host cv2 round-trip
    bit-exactly: uint8 masks -> cv2.resize(..., INTER_LINEAR) at scale 0.25
    (reference models/functions/losses.py:243-247 via funcs.py imrescale).
    This feeds the dice loss directly; a half-pixel-convention mismatch
    would silently move mAP."""
    cv2 = pytest.importorskip("cv2")

    h, w, n = 96, 128, 4
    rng = np.random.RandomState(7)
    # Realistic blob masks: threshold of smoothed noise (irregular
    # boundaries hit every bilinear fraction).
    masks = np.zeros((n, h, w), np.uint8)
    for i in range(n):
        noise = rng.rand(h // 8, w // 8).astype(np.float32)
        up = cv2.resize(noise, (w, h), interpolation=cv2.INTER_CUBIC)
        masks[i] = (up > 0.55).astype(np.uint8)
    masks[0, :3, :] = 1      # touch the borders
    masks[1, :, -2:] = 1

    # Reference path (losses.py:243-247): (N,H,W) -> (H,W,N) uint8 ->
    # imrescale(scale=1/4) == cv2.resize to (round(w/4), round(h/4)),
    # INTER_LINEAR -> uint8.
    hwn = np.transpose(masks, (1, 2, 0))
    new_size = (int(w * 0.25 + 0.5), int(h * 0.25 + 0.5))
    want = cv2.resize(hwn, new_size, interpolation=cv2.INTER_LINEAR)
    want = np.transpose(want.astype(np.uint8), (2, 0, 1))   # (N, h/4, w/4)

    cfg = PlaneRecNet_50_config.copy(dict(max_instances=n, max_positives=16))
    out = prepare_ground_truth(
        cfg,
        jnp.zeros((1, n, 4), jnp.float32),
        jnp.ones((1, n), jnp.int32),
        jnp.ones((1, n), bool),
        jnp.asarray(masks[None], jnp.float32),
        num_levels=4)
    got = np.asarray(out["masks4"][0]).astype(np.uint8)

    assert got.shape == want.shape
    mismatch = int((got != want).sum())
    assert mismatch == 0, f"{mismatch}/{want.size} pixels differ from cv2"


def _tiny_batch(cfg, rng, b=2, h=64, w=64, n=4):
    imgs = rng.randn(b, h, w, 3).astype(np.float32)
    depth = (rng.rand(b, h, w, 1) * 3 + 0.5).astype(np.float32)
    masks = np.zeros((b, n, h, w), np.float32)
    boxes = np.zeros((b, n, 4), np.float32)
    classes = np.ones((b, n), np.int32)
    gt_valid = np.zeros((b, n), bool)
    planes = np.zeros((b, n, 4), np.float32)
    planes[..., 2] = 1.0
    for bi in range(b):
        masks[bi, 0, 8:40, 8:40] = 1
        boxes[bi, 0] = [8, 8, 40, 40]
        gt_valid[bi, 0] = True
    k = np.tile(np.array([[50., 0, w / 2], [0, 50., h / 2], [0, 0, 1]],
                         np.float32), (b, 1, 1))
    return {
        "image": jnp.asarray(imgs), "depth": jnp.asarray(depth),
        "masks": jnp.asarray(masks), "boxes": jnp.asarray(boxes),
        "classes": jnp.asarray(classes), "gt_valid": jnp.asarray(gt_valid),
        "plane_paras": jnp.asarray(planes), "k_matrix": jnp.asarray(k),
    }


def test_compute_losses_end_to_end():
    """Full loss dict on a tiny synthetic model output: finite, positive,
    differentiable."""
    cfg = PlaneRecNet_50_config.copy(dict(
        max_instances=4, max_positives=32, vnl_samples=64))
    rng = np.random.RandomState(5)
    b, h, w = 2, 64, 64
    batch = _tiny_batch(cfg, rng, b=b, h=h, w=w, n=4)

    sv = cfg.solov2
    n_k = sv.num_kernels
    preds = {
        "cate_preds": [jnp.asarray(rng.randn(b, g, g, cfg.num_classes)
                                   .astype(np.float32))
                       for g in sv.num_grids[:4]],
        "kernel_preds": [jnp.asarray(rng.randn(b, g, g, n_k)
                                     .astype(np.float32) * 0.1)
                         for g in sv.num_grids[:4]],
        "mask_pred": jnp.asarray(rng.randn(b, h // 4, w // 4, n_k)
                                 .astype(np.float32) * 0.1),
        "depth_pred": jnp.asarray(rng.rand(b, h // 2, w // 2, 1)
                                  .astype(np.float32) + 0.5),
    }

    losses = compute_losses(cfg, preds, batch, jax.random.PRNGKey(0))
    assert set(losses) == {"ins", "cat", "dpt", "pln", "lav"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
        assert float(v) >= 0, k

    # Gradients flow into the prediction pytree.
    def total(mask_pred):
        p = dict(preds, mask_pred=mask_pred)
        ls = compute_losses(cfg, p, batch, jax.random.PRNGKey(0))
        return ls["ins"] + ls["lav"]

    g = jax.grad(total)(preds["mask_pred"])
    assert np.abs(np.asarray(g)).sum() > 0


def test_edge_centred_gated_instance_grads_finite():
    """Regression: an instance whose mass center sits in the LAST grid
    row/column and that is scale-gated OUT of a level used to leave an
    unclamped window cell (>= g*g) on a padded positive slot; the NaN that
    take_along_axis's fill mode gathers there poisoned the ins/lav backward
    through 0*NaN even though pvalid masked the forward (params silently
    NaN on the first real train step — round-4 closed-loop finding)."""
    cfg = PlaneRecNet_50_config.copy(dict(
        max_instances=4, max_positives=16, vnl_samples=32))
    rng = np.random.RandomState(7)
    b, h, w = 1, 64, 64
    batch = _tiny_batch(cfg, rng, b=b, h=h, w=w, n=4)
    # A thin strip hugging the bottom edge: its mass center (y=62.5 of 64)
    # lands in the LAST grid row of every level (floor(62.5/64*g) == g-1
    # for g in {40,36,24,16}); its sqrt-area (~7) only hits the finest
    # scale range, so coarser levels see hit=False with coord_h = g-1
    # (ci = g -> raw cells >= g*g before the fix).
    masks = np.asarray(batch["masks"]).copy()
    boxes = np.asarray(batch["boxes"]).copy()
    valid = np.asarray(batch["gt_valid"]).copy()
    masks[0, 1, 62:64, 40:64] = 1
    boxes[0, 1] = [40, 62, 64, 64]
    valid[0, 1] = True
    batch = dict(batch, masks=jnp.asarray(masks), boxes=jnp.asarray(boxes),
                 gt_valid=jnp.asarray(valid))

    sv = cfg.solov2
    n_k = sv.num_kernels
    preds = {
        "cate_preds": [jnp.asarray(rng.randn(b, g, g, cfg.num_classes)
                                   .astype(np.float32))
                       for g in sv.num_grids[:4]],
        "kernel_preds": [jnp.asarray(rng.randn(b, g, g, n_k)
                                     .astype(np.float32) * 0.1)
                         for g in sv.num_grids[:4]],
        "mask_pred": jnp.asarray(rng.randn(b, h // 4, w // 4, n_k)
                                 .astype(np.float32) * 0.1),
        "depth_pred": jnp.asarray(rng.rand(b, h // 2, w // 2, 1)
                                  .astype(np.float32) + 0.5),
    }

    @jax.jit
    def val_and_grad(preds):
        def f(p):
            ls = compute_losses(cfg, p, batch, jax.random.PRNGKey(0))
            return ls["ins"] + ls["lav"], ls
        return jax.value_and_grad(f, has_aux=True)(preds)

    (v, ls), g = val_and_grad(preds)
    assert np.isfinite(float(v))
    for leaf in jax.tree_util.tree_leaves(g):
        assert bool(jnp.isfinite(leaf).all())


def test_vnl_zero_for_perfect_plane():
    """A depth map that is exactly a fronto-parallel plane with matching GT
    normal must give ~0 planar loss."""
    h, w = 48, 64
    depth = jnp.full((h, w), 2.0)
    masks = np.zeros((1, h, w), bool)
    masks[0, 8:40, 8:56] = True
    normals = jnp.asarray([[0.0, 0.0, 1.0]])
    k = jnp.asarray([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]])
    loss = vnl_loss_single(
        jax.random.PRNGKey(1), depth, jnp.asarray(masks), normals,
        jnp.asarray([True]), depth, k, num_samples=128,
        sample_nonplanar=False)
    assert float(loss) < 1e-3


def test_vnl_nonzero_for_wrong_normal():
    h, w = 48, 64
    # Sloped depth: d = 1 + 0.05 * u -> normal far from [0,0,1].
    u = jnp.arange(w, dtype=jnp.float32)[None, :]
    depth = jnp.broadcast_to(1.0 + 0.05 * u, (h, w))
    masks = np.zeros((1, h, w), bool)
    masks[0, 8:40, 8:56] = True
    normals = jnp.asarray([[0.0, 0.0, 1.0]])
    k = jnp.asarray([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]])
    loss = vnl_loss_single(
        jax.random.PRNGKey(2), depth, jnp.asarray(masks), normals,
        jnp.asarray([True]), depth, k, num_samples=128,
        sample_nonplanar=False)
    assert float(loss) > 0.05


def test_vnl_sampler_uniform_over_mask():
    """The two-stage (bbox-rejection + inverse-CDF) sampler draws only
    in-mask pixels, with-replacement, roughly uniformly."""
    from planerecnet_tpu.losses.vnl import _sample_mask_indices

    h, w = 60, 80
    mask = np.zeros((h, w), bool)
    mask[10:40, 20:70] = True          # 1500 px in a 30x50 bbox
    mask[15:25, 30:40] = False         # hole: acceptance < 1 inside bbox
    flat = jnp.asarray(mask.reshape(-1))

    idx, ok = _sample_mask_indices(
        jax.random.PRNGKey(3), flat, (3, 2000), (h, w))
    idx = np.asarray(idx).reshape(-1)
    assert bool(ok)
    assert mask.reshape(-1)[idx].all()          # only in-mask pixels

    # Rough uniformity: the left and right halves of the mask get samples
    # proportional to their areas (within 15% relative).
    xs = idx % w
    left_area = mask[:, :45].sum()
    right_area = mask[:, 45:].sum()
    left_frac = (xs < 45).mean()
    expect = left_area / (left_area + right_area)
    assert abs(left_frac - expect) / expect < 0.15, (left_frac, expect)

    # Empty mask -> ok is False.
    _, ok0 = _sample_mask_indices(
        jax.random.PRNGKey(0), jnp.zeros(h * w, bool), (3, 64), (h, w))
    assert not bool(ok0)


def test_vnl_ori_zero_for_identical_depths():
    """vnl_loss_ori on identical gt/pred depth must be ~0: every surviving
    triplet's gt and pred normals coincide."""
    from planerecnet_tpu.losses import vnl_loss_ori
    h, w = 48, 64
    u = jnp.arange(w, dtype=jnp.float32)[None, :]
    v = jnp.arange(h, dtype=jnp.float32)[:, None]
    depth = (1.5 + 0.02 * u + 0.01 * v)[None].repeat(2, axis=0)
    loss = vnl_loss_ori(jax.random.PRNGKey(0), depth, depth,
                        jnp.float32(40.0), jnp.float32(40.0),
                        num_samples=512)
    assert float(loss) < 1e-4


def test_vnl_ori_matches_reference_torch():
    """Drive the reference's VNL_Loss_ori (vnl.py:168-346) on CPU torch with
    injected sample indices and compare against the index-injectable core of
    the JAX implementation pooled the same way."""
    import torch
    from reference_torch import load_reference
    load_reference()
    import models.functions.vnl as ref_vnl

    from planerecnet_tpu.losses.vnl import (_hardest75_mean,
                                            _vnl_ori_from_indices)

    b, h, w, m = 2, 40, 56, 700
    rng = np.random.RandomState(7)
    gt = (1.0 + rng.rand(b, h, w).astype(np.float32) * 3.0)
    pred = gt + rng.randn(b, h, w).astype(np.float32) * 0.15
    fx, fy = 37.0, 41.0
    idx = rng.randint(0, h * w, size=(3, m))

    # Reference on CPU: .cuda() -> identity, fixed select_index.
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        ref = ref_vnl.VNL_Loss_ori((h, w))
        ref.select_index = lambda: {
            "p1_x": idx[0] % w, "p1_y": idx[0] // w,
            "p2_x": idx[1] % w, "p2_y": idx[1] // w,
            "p3_x": idx[2] % w, "p3_y": idx[2] // w,
        }
        ref_val = ref(torch.from_numpy(gt[:, None]),
                      torch.from_numpy(pred[:, None]),
                      torch.tensor(fx), torch.tensor(fy), select=True)
        ref_val = float(ref_val)
    finally:
        torch.Tensor.cuda = orig_cuda

    losses, valid = jax.vmap(
        lambda g, p: _vnl_ori_from_indices(
            jnp.asarray(idx), g.reshape(-1), p.reshape(-1),
            jnp.float32(fx), jnp.float32(fy), w // 2, h // 2, w,
            0.867, 0.005, 1e-4))(jnp.asarray(gt), jnp.asarray(pred))
    ours = float(_hardest75_mean(losses.reshape(-1), valid.reshape(-1)))

    assert np.sum(np.asarray(valid)) > 100        # the filter kept triplets
    assert abs(ours - ref_val) < 1e-4 * max(1.0, abs(ref_val)), (
        ours, ref_val)
