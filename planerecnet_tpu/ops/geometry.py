"""Depth / point-cloud geometry ops.

TPU-native re-implementations of the reference geometry utilities
(reference models/functions/funcs.py:226-292): depth back-projection,
GeoNet least-squares surface normals, PCA plane fitting. Unlike the
reference — which round-trips determinants and inverses through the CPU
(funcs.py:267, 279) — everything here stays on device: XLA batches the
3x3 solves natively.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def get_points_coordinate(depth: jnp.ndarray,
                          intrinsic_inv: jnp.ndarray) -> jnp.ndarray:
    """Back-project (B, H, W, 1) depth to (B, H, W, 3) camera-space points
    (reference funcs.py:226-237, NHWC layout)."""
    b, h, w, _ = depth.shape
    x = jnp.arange(w, dtype=jnp.float32)
    y = jnp.arange(h, dtype=jnp.float32)
    xx, yy = jnp.meshgrid(x, y)
    xy1 = jnp.stack([xx, yy, jnp.ones_like(xx)], axis=0).reshape(3, -1)
    rays = jnp.einsum("bij,jp->bip", intrinsic_inv.astype(jnp.float32), xy1)
    pts = rays * depth.reshape(b, 1, -1)
    return pts.reshape(b, 3, h, w).transpose(0, 2, 3, 1)


def _unfold_5x5_dilated2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W, 25, C): the 5x5 dilation-2 neighbourhood
    used by GeoNet (torch ``F.unfold(kernel=5, padding=4, dilation=2)``,
    reference funcs.py:245-247)."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
    taps = []
    for dy in range(0, 10, 2):
        for dx in range(0, 10, 2):
            taps.append(xp[:, dy:dy + h, dx:dx + w, :])
    return jnp.stack(taps, axis=3)


def get_surface_normal(point_clouds: jnp.ndarray,
                       valid_condition: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel least-squares surface normals (GeoNet; reference
    funcs.py:240-285).

    Args:
      point_clouds:    (B, H, W, 3) camera-space points.
      valid_condition: (B, H, W, 1) validity (e.g. depth > 0).

    Returns (B, H, W, 3) unit normals. Pixels whose masked normal system is
    near-singular (det < 1e-5) fall back to solving with the identity matrix,
    matching the reference's gating (funcs.py:268-278).
    """
    a = _unfold_5x5_dilated2(point_clouds)                    # (B,H,W,25,3)
    valid = _unfold_5x5_dilated2(valid_condition) > 0.5       # (B,H,W,25,1)
    a_valid = jnp.where(valid, a, 0.0)

    # NB: reference funcs.py:263 overwrites the masked transpose with the
    # unmasked one (`matrix_a_trans = matrix_a.transpose(3, 4)`), so the
    # system solved is Aᵀ(A_valid)n = Aᵀ1 — replicated faithfully.
    ata = jnp.einsum("bhwki,bhwkj->bhwij", a, a_valid)        # (B,H,W,3,3)
    atb = jnp.sum(a, axis=3)[..., None]                       # Aᵀ·1 (B,H,W,3,1)

    det = jnp.linalg.det(ata)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=ata.dtype), ata.shape)
    safe = jnp.where((det >= 1e-5)[..., None, None], ata, eye)
    normal = jnp.linalg.solve(safe, atb)[..., 0]              # (B,H,W,3)
    norm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    return normal / jnp.maximum(norm, 1e-12)


def pca_svd(pts: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Least-squares plane fit of (N, 3) points: (centroid, unit normal)
    — the smallest-singular-vector of the scatter matrix
    (reference funcs.py:287-292)."""
    mean = pts.mean(axis=0)
    adj = pts - mean
    h = adj.T @ adj
    u, _, _ = jnp.linalg.svd(h)
    return mean, u[:, 2]


def point_to_plane_error(points: jnp.ndarray, mask: jnp.ndarray,
                         normal: jnp.ndarray, offset: jnp.ndarray
                         ) -> jnp.ndarray:
    """Mean |p·n - d| over the masked, positive-depth points — the dataset
    geometric-consistency statistic (reference data/datasets.py:373-380)."""
    m = mask & (points[..., 2] > 0)
    dist = jnp.abs(points @ normal - offset)
    return jnp.sum(jnp.where(m, dist, 0.0)) / jnp.maximum(jnp.sum(m), 1)
