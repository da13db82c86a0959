"""Point / Matrix / Mask NMS as shape-static XLA ops.

Re-designs reference models/functions/nms.py:8-81 for TPU: fixed-capacity
candidate sets with validity masks instead of dynamic boolean indexing, and
the mask-IoU matrix as a single MXU matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def point_nms(heat: jnp.ndarray, kernel: int = 2) -> jnp.ndarray:
    """Local-peak gate on category heatmaps (reference nms.py:8-12).

    ``heat``: (B, S, S, C) sigmoid scores. A cell survives iff it equals the
    max of the 2x2 window covering itself and its up/left neighbours
    (the reference's ``max_pool2d(k=2, s=1, p=1)`` followed by
    ``hmax[:, :, :-1, :-1] == heat``).
    """
    assert kernel == 2
    hmax = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (1, 0), (1, 0), (0, 0)))
    keep = (hmax == heat).astype(heat.dtype)
    return heat * keep


def matrix_nms(labels: jnp.ndarray,
               seg_masks: jnp.ndarray,
               sum_masks: jnp.ndarray,
               scores: jnp.ndarray,
               valid: jnp.ndarray,
               sigma: float = 2.0,
               kernel: str = "gaussian") -> jnp.ndarray:
    """SOLOv2 matrix (soft) NMS (reference nms.py:15-50), fixed capacity N.

    Args:
      labels:    (N,) int class labels.
      seg_masks: (N, P) binary masks flattened over pixels (float or bool).
      sum_masks: (N,) mask areas.
      scores:    (N,) candidate scores.
      valid:     (N,) bool validity of each slot.

    Returns updated scores (invalid slots get 0).
    """
    n = scores.shape[0]
    m = seg_masks.astype(jnp.float32)
    m = m * valid[:, None]
    inter = jnp.dot(m, m.T, preferred_element_type=jnp.float32)   # (N, N)
    areas = jnp.where(valid, sum_masks, 0.0)
    union = areas[None, :] + areas[:, None] - inter
    iou = jnp.where(union > 0, inter / union, 0.0)
    triu = jnp.triu(jnp.ones((n, n), dtype=jnp.float32), k=1)
    iou = iou * triu

    label_match = (labels[None, :] == labels[:, None]).astype(jnp.float32)
    label_match = label_match * triu
    label_match = label_match * (valid[None, :] & valid[:, None]).astype(
        jnp.float32)

    decay_iou = iou * label_match                    # (N, N), [i, j]
    # Per-candidate max overlap with any higher-scoring same-class mask.
    compensate = jnp.max(decay_iou, axis=0)          # (N,)

    if kernel == "gaussian":
        decay_matrix = jnp.exp(-sigma * decay_iou ** 2)
        compensate_matrix = jnp.exp(-sigma * compensate[:, None] ** 2)
        coeff = jnp.min(decay_matrix / compensate_matrix, axis=0)
    elif kernel == "linear":
        coeff = jnp.min((1 - decay_iou) / (1 - compensate[:, None]), axis=0)
    else:
        raise NotImplementedError(kernel)

    return jnp.where(valid, scores * coeff, 0.0)


def mask_nms(labels: jnp.ndarray,
             seg_masks: jnp.ndarray,
             sum_masks: jnp.ndarray,
             scores: jnp.ndarray,
             valid: jnp.ndarray,
             nms_thr: float = 0.5) -> jnp.ndarray:
    """Greedy hard mask NMS (reference nms.py:53-81), fixed capacity.

    Candidates must already be sorted by descending score. Returns the
    bool keep mask. Implemented as a sequential scan over rows (the greedy
    dependency is inherently sequential) with vectorised inner updates.
    """
    n = scores.shape[0]
    m = seg_masks.astype(jnp.float32) * valid[:, None]
    inter = jnp.dot(m, m.T, preferred_element_type=jnp.float32)
    areas = jnp.where(valid, sum_masks, 0.0)
    union = areas[None, :] + areas[:, None] - inter
    # reference: if union > 0 suppress when iou > thr, else suppress.
    suppress_pair = jnp.where(union > 0, inter / union > nms_thr, True)
    label_match = labels[None, :] == labels[:, None]
    suppress_pair = suppress_pair & label_match

    def body(i, keep):
        row = suppress_pair[i] & keep[i] & valid[i]
        col_ids = jnp.arange(n)
        suppress = row & (col_ids > i)
        return keep & ~suppress

    keep = jax.lax.fori_loop(0, n - 1, body, valid)
    return keep
