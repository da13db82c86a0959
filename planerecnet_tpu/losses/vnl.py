"""Plane-surface-normal (VNL) loss, TPU-native.

Re-designs reference models/functions/vnl.py:6-165 as shape-static jitted
code. The reference samples ``int(num_mask_pixels * 0.3)`` random point
triplets per plane with host numpy RNG and variable-length boolean indexing;
here every plane gets a fixed ``num_samples`` triplets drawn *uniformly over
the plane's mask pixels* via an exact two-level (row-CDF then within-row)
inverse-CDF sampler with ``jax.random`` (matching
``np.random.choice(num, replace=True)`` sampling semantics for ANY
non-empty mask, with fixed rather than mask-proportional sample count).

The "hardest 75%" selection (reference vnl.py:135-137: sort ascending, drop
the first 25%) becomes a descending sort + static prefix mask.

Divergences from the reference (deliberate):
  * fixed sample count per plane instead of 0.3 * mask-area (same
    expectation, different variance);
  * a plane whose mask yields zero valid triplets contributes 0 instead of
    NaN (the reference produces 0/0 and relies on the trainer's
    skip-non-finite-step guard, train.py:352-354);
  * ``pw_pred[pw_pred[:, 2, :] == 0] = 0.0001`` (vnl.py:154) — which due to a
    dimension mix-up overwrites coordinate *rows*, not points — is replaced
    by the intended z-clamp.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


_BLOCK = 256


def _sample_mask_indices(rng: jax.Array, mask_flat: jnp.ndarray,
                         shape: Tuple[int, ...],
                         hw: Tuple[int, int]
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Uniformly sample flat pixel indices from a boolean mask, with
    replacement. Returns (indices, ok) where ok=False iff the mask is empty.

    EXACT hierarchical inverse-CDF sampler (round 4): the global CDF is
    evaluated in two levels — (1) a per-256-pixel-block count CDF
    (H*W/256 entries, ``compare_all`` search: one fused broadcast-compare
    + reduce on the VPU); (2) gather each query's 256 mask BITS (int8, so a
    query costs 256 B vs the 2.5 KB f32 row-CDF gather of the first exact
    sampler — per-element gathers cost ~40x their bytes on TPU and were the
    whole regression, 355 vs 312 ms/step) and locate the residual count by
    an in-register cumsum-compare. One uniform integer draw per sample
    walks the TRUE global inverse CDF, so the marginal law is exactly
    uniform-over-mask for ANY non-empty mask — including the 1-2 px
    diagonal strips and fragmented masks that defeated the bbox-rejection
    sampler (zero-acceptance on masks filling < ~0.1% of their bbox;
    VERDICT round-3 weak item 5).

    History: round-1 carried an (N, H*W) s32 full CDF through an XLA while
    loop (~315 ms of a 533 ms PRN-101 bs=8 step); round-2/3 used bbox
    rejection (fast, but silent zero-loss on thin masks;
    ``PRN_VNL_SAMPLER=bbox`` restores it for A/B runs); the round-4
    row-CDF exact sampler fixed correctness but gathered full f32 CDF rows.
    """
    n_total = 1
    for s in shape:
        n_total *= s

    m = mask_flat.astype(jnp.int8)
    pad = (-m.shape[0]) % _BLOCK
    if pad:
        m = jnp.pad(m, (0, pad))                  # zero bits: never sampled
    nb = m.shape[0] // _BLOCK
    blocks = m.reshape(nb, _BLOCK)
    block_counts = jnp.sum(blocks, axis=1, dtype=jnp.int32)     # (NB,)
    block_cdf = jnp.cumsum(block_counts)
    total = block_cdf[-1]
    ok = total > 0

    u = jax.random.randint(rng, shape, 1, jnp.maximum(total, 1) + 1)
    blk = jnp.searchsorted(block_cdf, u, side="left",
                           method="compare_all")                # (*shape,)
    blk = jnp.minimum(blk, nb - 1)

    bits = blocks[blk]                            # (*shape, BLOCK) int8
    # Residual rank within the block: u_rel in [1, count(blk)] by CDF
    # construction; the u_rel-th set bit's position is the sampled column.
    prev = block_cdf[blk] - jnp.sum(bits, axis=-1, dtype=jnp.int32)
    u_rel = u - prev
    bit_cdf = jnp.cumsum(bits.astype(jnp.int32), axis=-1)
    col = jnp.sum((bit_cdf < u_rel[..., None]).astype(jnp.int32), axis=-1)
    idx = blk * _BLOCK + jnp.minimum(col, _BLOCK - 1)
    return jnp.minimum(idx, mask_flat.shape[0] - 1), ok


def _sample_mask_indices_bbox(rng: jax.Array, mask_flat: jnp.ndarray,
                              shape: Tuple[int, ...],
                              hw: Tuple[int, int],
                              oversample: int = 3
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The round-2/3 bbox-rejection sampler, kept for A/B measurement
    (select with ``PRN_VNL_SAMPLER=bbox``).

    Draws ``oversample * prod(shape)`` candidate pixels uniformly from the
    mask's bounding box, gathers their mask bits, and resamples the required
    count among the accepted candidates via an inverse-CDF search over the
    SMALL candidate cumsum. Uniform-over-mask marginally, but samples are
    weakly correlated through the shared candidate set and a mask filling
    < ~0.1% of its bounding box can accept zero candidates (ok=False, the
    plane silently contributes 0) — the failure mode the exact sampler
    above removes.
    """
    h, w = hw
    n_total = 1
    for s in shape:
        n_total *= s
    n_cand = oversample * n_total
    r_yx, r_u = jax.random.split(rng)

    m2 = mask_flat.reshape(h, w)
    rows = jnp.any(m2, axis=1)
    cols = jnp.any(m2, axis=0)
    y0 = jnp.argmax(rows).astype(jnp.int32)
    y1 = (h - 1 - jnp.argmax(rows[::-1])).astype(jnp.int32)
    x0 = jnp.argmax(cols).astype(jnp.int32)
    x1 = (w - 1 - jnp.argmax(cols[::-1])).astype(jnp.int32)

    pyx = jax.random.randint(
        r_yx, (2, n_cand), jnp.stack([y0, x0])[:, None],
        jnp.stack([y1, x1])[:, None] + 1)
    cand = pyx[0] * w + pyx[1]                              # (n_cand,)
    good = mask_flat[cand]
    counts = jnp.cumsum(good.astype(jnp.int32))
    total = counts[-1]
    ok = total > 0

    u = jax.random.randint(r_u, shape, 1, jnp.maximum(total, 1) + 1)
    # compare_all: one fused broadcast-compare + reduce instead of a binary
    # search — TPU per-element gathers cost ~40x their bytes, while the
    # O(queries x candidates) compare streams on the VPU (~0.6 ms/step vs
    # ~33 ms for the unrolled search at production shapes).
    pos = jnp.searchsorted(counts, u, side="left", method="compare_all")
    idx = cand[jnp.minimum(pos, n_cand - 1)]
    return jnp.minimum(idx, mask_flat.shape[0] - 1), ok


# Import-time A/B switch (PERF.md round 4): "exact" (default) or "bbox".
_SAMPLER = (_sample_mask_indices_bbox
            if os.environ.get("PRN_VNL_SAMPLER", "exact") == "bbox"
            else _sample_mask_indices)


def _form_triplets(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather (M, 3pts, 3xyz) triplets from (P, 3) points and (3, M) ids,
    transposed to the reference's [M, 3(xyz), 3(p1,p2,p3)] layout
    (vnl.py:57-74)."""
    pw = points[idx]                       # (3, M, 3xyz)
    return jnp.transpose(pw, (1, 2, 0))    # (M, 3xyz, 3pts)


def _form_triplets_from_depth(depth_flat: jnp.ndarray, idx: jnp.ndarray,
                              fx: jnp.ndarray, fy: jnp.ndarray,
                              u0: float, v0: float, w: int) -> jnp.ndarray:
    """``_form_triplets(_point_cloud(depth), idx)`` with the back-projection
    moved AFTER the gather: gathers 1 depth value per sample instead of a
    3-vector point, so the backward scatters 1/3 the data into (H*W,)
    instead of (H*W, 3) and the (H*W, 3) point cloud is never
    materialised — the VNL backward scatter was ~8 ms of the round-4
    train step (PERF.md). Identical math: x=(u-u0)|d|/fx, y=(v-v0)|d|/fy
    recompute from the integer pixel ids (reference vnl.py:34-41).
    ``idx``: (3, M) flat pixel ids. Returns (M, 3xyz, 3pts).
    """
    d = depth_flat[idx]                                 # (3, M)
    ad = jnp.abs(d)
    u = (idx % w).astype(jnp.float32) - u0
    v = (idx // w).astype(jnp.float32) - v0
    pw = jnp.stack([u * ad / fx, v * ad / fy, d], axis=1)   # (3pts, 3xyz, M)
    return jnp.transpose(pw, (2, 1, 0))                 # (M, 3xyz, 3pts)


def _filter_mask(pw: jnp.ndarray, delta_z: float,
                 delta_cos: float = 0.985,
                 delta_diff: float = 0.005) -> jnp.ndarray:
    """Triplet validity filter (reference vnl.py:76-104).

    ``pw``: (M, 3xyz, 3pts). Rejects triplets that are near-collinear
    (any pairwise |cos| of difference vectors > delta_cos), have any
    non-positive/padding depth, or are degenerate-near in all 3 axes.
    """
    pw = jax.lax.stop_gradient(pw)  # the filter gates, it never backprops
    pw12 = pw[:, :, 1] - pw[:, :, 0]
    pw13 = pw[:, :, 2] - pw[:, :, 0]
    pw23 = pw[:, :, 2] - pw[:, :, 1]
    pw_diff = jnp.stack([pw12, pw13, pw23], axis=2)          # (M, 3xyz, 3)

    q = jnp.transpose(pw_diff, (0, 2, 1))                    # (M, 3vec, 3xyz)
    qn = jnp.linalg.norm(q, axis=2)                          # (M, 3)
    nm = qn[:, :, None] * qn[:, None, :]                     # (M, 3, 3)
    energy = jnp.einsum("mik,mjk->mij", q, q)
    norm_energy = energy / (nm + 1e-8)
    mask_cos = jnp.sum((norm_energy > delta_cos)
                       | (norm_energy < -delta_cos), axis=(1, 2)) > 3

    mask_pad = jnp.sum(pw[:, 2, :] > delta_z, axis=1) == 3

    near = jnp.abs(pw_diff) < delta_diff                     # (M, 3xyz, 3)
    mask_x = jnp.any(near[:, 0, :], axis=1)
    mask_y = jnp.any(near[:, 1, :], axis=1)
    mask_z = jnp.any(near[:, 2, :], axis=1)

    mask_ignore = (mask_x & mask_y & mask_z) | mask_cos
    return mask_pad & ~mask_ignore


def _safe_norm(x: jnp.ndarray, axis, keepdims=False,
               eps: float = 1e-12) -> jnp.ndarray:
    """Norm with a NaN-free gradient at the zero vector (d||x||/dx at 0 is
    NaN in plain autodiff, which would poison the whole gradient even on
    masked-out degenerate triplets — e.g. when sampling-with-replacement
    draws the same pixel twice)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)


def _normals(pw: jnp.ndarray) -> jnp.ndarray:
    """Unit normals from (M, 3xyz, 3pts) triplets (reference vnl.py:106-117)."""
    p12 = pw[:, :, 1] - pw[:, :, 0]
    p13 = pw[:, :, 2] - pw[:, :, 0]
    normal = jnp.cross(p12, p13)
    norm = _safe_norm(normal, axis=1, keepdims=True)
    norm = norm + (norm < 1e-5).astype(jnp.float32) * 0.01
    return normal / norm


def _hardest75_mean(loss: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Mean of the hardest 75% of valid losses (reference vnl.py:135-139:
    ascending sort, drop the first 25%, nansum / kept count).

    Gradient-safe: selection runs on a detached key so autodiff only flows
    through the gathered (selected) loss values.
    """
    m = loss.shape[0]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    keep = n_valid - (n_valid // 4)
    key = jax.lax.stop_gradient(jnp.where(valid, loss, -jnp.float32(1e30)))
    _, top_idx = jax.lax.top_k(key, m)                       # descending
    sel = (jnp.arange(m) < keep).astype(loss.dtype)
    total = jnp.sum(loss[top_idx] * sel)
    return jnp.where(keep > 0, total / jnp.maximum(keep, 1), 0.0)


def _point_cloud(depth: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray,
                 u0: float, v0: float) -> jnp.ndarray:
    """Back-project (H, W) depth to (H*W, 3) camera-space points
    (reference vnl.py:34-41: x=(u-u0)|d|/fx, y=(v-v0)|d|/fy, z=d)."""
    h, w = depth.shape
    u = jnp.arange(w, dtype=jnp.float32)[None, :] - u0
    v = jnp.arange(h, dtype=jnp.float32)[:, None] - v0
    ad = jnp.abs(depth)
    x = u * ad / fx
    y = v * ad / fy
    return jnp.stack([x, y, depth], axis=-1).reshape(-1, 3)


def _cos_abs(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    num = jnp.sum(a * b, axis=-1)
    den = _safe_norm(a, axis=-1) * _safe_norm(b, axis=-1)
    return jnp.abs(num / jnp.maximum(den, 1e-8))


def _vnl_ori_from_indices(idx: jnp.ndarray,
                          gt_flat: jnp.ndarray,
                          pred_flat: jnp.ndarray,
                          fx: jnp.ndarray, fy: jnp.ndarray,
                          u0: float, v0: float, w: int,
                          delta_cos: float, delta_diff: float,
                          delta_z: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One image's whole-image virtual-normal triplet losses from given flat
    pixel ids ``idx`` (3, M). Returns (per-triplet L1 normal loss (M,),
    validity (M,)) — the index-injectable core of :func:`vnl_loss_ori`, split
    out so tests can drive it with the reference's sampled indices."""
    pw_gt = _form_triplets_from_depth(gt_flat, idx, fx, fy, u0, v0, w)
    valid = _filter_mask(pw_gt, delta_z, delta_cos=delta_cos,
                         delta_diff=delta_diff)
    pw_pred = _form_triplets_from_depth(pred_flat, idx, fx, fy, u0, v0, w)
    # Intended z-clamp; the reference's ``pw_groups_pred[...== 0] = 0.0001``
    # (vnl.py:307) boolean-indexes the COORDINATE axis with a POINT-axis
    # mask (the same dimension mix-up as vnl.py:154) — replaced by the
    # intended semantics, as in vnl_loss_single.
    z = pw_pred[:, 2, :]
    pw_pred = pw_pred.at[:, 2, :].set(jnp.where(z == 0, 1e-4, z))
    gt_n = _normals(pw_gt)
    dt_n = _normals(pw_pred)
    return jnp.sum(jnp.abs(gt_n - dt_n), axis=1), valid


@functools.partial(jax.jit, static_argnames=("num_samples", "delta_z",
                                             "select"))
def vnl_loss_ori(rng: jax.Array,
                 gt_depth: jnp.ndarray,
                 pred_depth: jnp.ndarray,
                 fx: jnp.ndarray,
                 fy: jnp.ndarray,
                 num_samples: int = 2048,
                 delta_cos: float = 0.867,
                 delta_diff: float = 0.005,
                 delta_z: float = 1e-4,
                 select: bool = True) -> jnp.ndarray:
    """The original whole-image virtual-normal loss, TPU-native
    (reference ``VNL_Loss_ori``, vnl.py:168-346 — unused dead code in the
    reference training loop, provided here for inventory completeness and
    as a drop-in depth-supervision alternative).

    Semantics mirrored: three independent uniform pixel draws over the FULL
    image per triplet corner (reference select_index, vnl.py:214-233 — the
    reference draws ``int(H*W*0.15)`` triplets with host numpy; here a fixed
    shape-static ``num_samples`` with ``jax.random``), GT-geometry triplet
    filter with delta_cos=0.867 / delta_diff=0.005 (vnl.py:259-291), unit
    normals with the +0.01 zero-norm guard (vnl.py:330-343), per-triplet
    loss = sum_xyz |n_gt - n_pred| pooled across the whole batch
    (vnl.py:344-345), and with ``select`` the easiest 25% are dropped before
    the mean (ascending sort, drop first quarter — vnl.py:346-348).

    Documented divergence: the reference calls ``select_index()`` ONCE and
    indexes every image of the batch with the same p123 set
    (``pw[:, p1_y, p1_x]``, vnl.py:214-233 + 294-307); here each image
    draws independent triplet indices (``jax.random.split`` per image).
    Distributionally equivalent supervision — arguably better, since
    images no longer share sampling noise — but batch losses are not
    bit-comparable to the reference for a fixed host seed.

    Args:
      gt_depth, pred_depth: (B, H, W) depth maps.
      fx, fy: scalar focal lengths (the reference takes them per call since
        "we can't assume that every image are taken by the same camera",
        vnl.py:170-172).
    """
    b, h, w = gt_depth.shape
    u0, v0 = w // 2, h // 2

    def per_image(rng_i, gt_i, pred_i):
        idx = jax.random.randint(rng_i, (3, num_samples), 0, h * w)
        return _vnl_ori_from_indices(idx, gt_i.reshape(-1),
                                     pred_i.reshape(-1), fx, fy, u0, v0, w,
                                     delta_cos, delta_diff, delta_z)

    rngs = jax.random.split(rng, b)
    losses, valid = jax.vmap(per_image)(rngs, gt_depth, pred_depth)
    # The reference pools every image's surviving triplets into ONE set
    # before the hardest-75% selection (reshape(1, -1, 3, 3), vnl.py:309-312).
    losses = losses.reshape(-1)
    valid = valid.reshape(-1)
    if select:
        return _hardest75_mean(losses, valid)
    n = jnp.sum(valid.astype(jnp.float32))
    return jnp.sum(jnp.where(valid, losses, 0.0)) / jnp.maximum(n, 1.0)


@functools.partial(jax.jit, static_argnames=("num_samples", "delta_z",
                                             "sample_nonplanar"))
def vnl_loss_single(rng: jax.Array,
                    pred_depth: jnp.ndarray,
                    gt_masks: jnp.ndarray,
                    plane_normals: jnp.ndarray,
                    gt_valid: jnp.ndarray,
                    gt_depth: jnp.ndarray,
                    k_matrix: jnp.ndarray,
                    np_mask: Optional[jnp.ndarray] = None,
                    num_samples: int = 512,
                    delta_z: float = 1e-4,
                    sample_nonplanar: bool = True) -> jnp.ndarray:
    """VNL loss for one image (reference VNL_Loss.forward, vnl.py:119-165).

    Args:
      pred_depth: (H, W) predicted depth at full input resolution.
      gt_masks:   (N, H, W) bool GT plane masks (padded).
      plane_normals: (N, 3) GT plane normals.
      gt_valid:   (N,) instance validity.
      gt_depth:   (H, W) GT depth.
      k_matrix:   (3, 3) camera intrinsics.
      np_mask:    optional (H*W,) bool non-planar region. When the caller
                  compacts ``gt_masks`` to a plane cap, this must be computed
                  from the FULL pre-compaction set — otherwise pixels of
                  dropped planes would be treated as non-planar and fed into
                  the pred-vs-gt normal consistency term.
    """
    n, h, w = gt_masks.shape
    fx = k_matrix[0, 0]
    fy = k_matrix[1, 1]
    u0, v0 = w // 2, h // 2

    pred_depth_flat = pred_depth.reshape(-1)                  # (H*W,)
    masks_flat = gt_masks.reshape(n, -1)

    def per_plane(rng_i, mask_i, normal_i, valid_i):
        idx, ok = _SAMPLER(rng_i, mask_i, (3, num_samples), (h, w))
        pw = _form_triplets_from_depth(pred_depth_flat, idx, fx, fy,
                                       u0, v0, w)
        tri_valid = _filter_mask(pw, delta_z) & ok & valid_i
        dt_normal = _normals(pw)
        loss = 1.0 - _cos_abs(dt_normal, normal_i[None, :])
        return _hardest75_mean(loss, tri_valid), ok & valid_i

    rngs = jax.random.split(rng, n + 1)
    plane_losses, plane_ok = jax.vmap(per_plane)(
        rngs[:n], masks_flat, plane_normals, gt_valid)
    n_planes = jnp.sum(plane_ok.astype(jnp.float32))
    losses_sum = jnp.sum(jnp.where(plane_ok, plane_losses, 0.0))

    if not sample_nonplanar:
        return losses_sum / jnp.maximum(n_planes, 1.0)

    # Non-planar region: virtual-normal consistency pred vs gt point clouds
    # (reference vnl.py:141-162).
    if np_mask is None:
        np_mask = ~jnp.any(
            gt_masks & gt_valid[:, None, None], axis=0).reshape(-1)
    idx, np_ok = _SAMPLER(rngs[n], np_mask, (3, num_samples), (h, w))
    pw_gt = _form_triplets_from_depth(gt_depth.reshape(-1), idx, fx, fy,
                                      u0, v0, w)
    tri_valid = _filter_mask(pw_gt, delta_z, delta_diff=0.1) & np_ok
    pw_pred = _form_triplets_from_depth(pred_depth_flat, idx, fx, fy,
                                        u0, v0, w)
    z = pw_pred[:, 2, :]
    pw_pred = pw_pred.at[:, 2, :].set(jnp.where(z == 0, 1e-4, z))
    gt_normal = _normals(pw_gt)
    dt_normal = _normals(pw_pred)
    np_loss = _hardest75_mean(1.0 - _cos_abs(dt_normal, gt_normal), tri_valid)

    has_np = np_ok & (jnp.sum(tri_valid) > 0)
    with_np = (losses_sum + np_loss) / jnp.maximum(n_planes + 1.0, 1.0)
    without = losses_sum / jnp.maximum(n_planes, 1.0)
    return jnp.where(has_np, with_np, without)
