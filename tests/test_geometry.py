"""Geometry op tests: back-projection, GeoNet normals, PCA plane fit."""

import numpy as np

import jax.numpy as jnp

from planerecnet_tpu.ops.geometry import (get_points_coordinate,
                                          get_surface_normal, pca_svd,
                                          point_to_plane_error)


def _plane_depth(h, w, k, normal, d):
    """Depth map of the plane n·p = d under intrinsics k."""
    u, v = np.meshgrid(np.arange(w, dtype=np.float64),
                       np.arange(h, dtype=np.float64))
    k_inv = np.linalg.inv(k)
    rays = np.einsum("ij,jhw->ihw", k_inv,
                     np.stack([u, v, np.ones_like(u)]))
    return d / np.einsum("i,ihw->hw", normal, rays)


def test_backprojection_inverts_projection():
    h, w = 24, 32
    k = np.array([[30.0, 0, 16], [0, 30.0, 12], [0, 0, 1]])
    normal = np.array([0.1, -0.2, 0.97])
    normal /= np.linalg.norm(normal)
    depth = _plane_depth(h, w, k, normal, 2.0)

    pts = get_points_coordinate(
        jnp.asarray(depth[None, :, :, None], jnp.float32),
        jnp.asarray(np.linalg.inv(k)[None], jnp.float32))[0]
    # every back-projected point satisfies the plane equation
    err = point_to_plane_error(
        pts, jnp.ones((h, w), bool), jnp.asarray(normal, jnp.float32),
        jnp.asarray(2.0, jnp.float32))
    assert float(err) < 1e-3


def test_surface_normal_on_plane():
    h, w = 24, 32
    k = np.array([[30.0, 0, 16], [0, 30.0, 12], [0, 0, 1]])
    normal = np.array([0.0, 0.0, 1.0])
    depth = _plane_depth(h, w, k, normal, 2.0)
    pts = get_points_coordinate(
        jnp.asarray(depth[None, :, :, None], jnp.float32),
        jnp.asarray(np.linalg.inv(k)[None], jnp.float32))
    valid = jnp.ones((1, h, w, 1), jnp.float32)
    normals = np.asarray(get_surface_normal(pts, valid))
    # interior normals align with +z (up to sign)
    inner = np.abs(normals[0, 8:-8, 8:-8, 2])
    assert inner.min() > 0.99


def test_pca_plane_fit():
    rng = np.random.RandomState(0)
    normal = np.array([0.3, 0.4, np.sqrt(1 - 0.25)])
    basis = np.linalg.svd(normal[None])[2][1:]  # two in-plane directions
    coeffs = rng.randn(200, 2)
    pts = coeffs @ basis + 2.0 * normal
    center, n_fit = pca_svd(jnp.asarray(pts, jnp.float32))
    cos = abs(float(np.dot(np.asarray(n_fit), normal)))
    assert cos > 0.999
    np.testing.assert_allclose(np.asarray(center), 2.0 * normal, atol=0.2)
