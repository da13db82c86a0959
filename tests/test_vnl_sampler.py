"""VNL mask-sampler tests: exactness on degenerate thin/fragmented masks
(VERDICT round-3 weak item 5 / task 7).

The round-2/3 bbox-rejection sampler accepts zero candidates with high
probability when the mask fills a tiny fraction of its bounding box — e.g.
an occlusion-split plane visible as two small fragments at opposite image
corners — silently zeroing that plane's VNL contribution. The exact
two-level sampler has no such failure mode; these tests quantify the old
failure and pin the new sampler's correctness (uniform marginal law, thin
strips and fragmented masks always sampled).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from planerecnet_tpu.losses.vnl import (_sample_mask_indices,
                                        _sample_mask_indices_bbox,
                                        vnl_loss_single)


def _two_fragment_mask(h=320, w=320, blob=3):
    """An occlusion-split plane: two tiny fragments at opposite corners.
    Bbox spans the whole image; fill ratio = 2*blob^2 / (h*w) ~ 0.02%."""
    m = np.zeros((h, w), bool)
    m[2:2 + blob, 2:2 + blob] = True
    m[-2 - blob:-2, -2 - blob:-2] = True
    return m


def _thin_diag_strip(h=320, w=320, width=2):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.abs(yy - xx) < width


def test_bbox_sampler_fails_on_fragmented_mask():
    """Quantifies the documented failure mode: on the two-fragment mask the
    rejection sampler accepts zero candidates most of the time."""
    m = _two_fragment_mask()
    flat = jnp.asarray(m.reshape(-1))
    fails = 0
    trials = 40
    for i in range(trials):
        _, ok = _sample_mask_indices_bbox(
            jax.random.PRNGKey(i), flat, (3, 128), m.shape)
        fails += int(not bool(ok))
    # fill ratio 18/102400 ~ 0.018%; zero-acceptance prob ~ (1-p)^(3*128*3)
    # ~ 81% -- assert the failure actually happens at scale
    assert fails / trials > 0.5, (
        f"expected the bbox sampler to fail most trials, failed "
        f"{fails}/{trials}")


@pytest.mark.parametrize("mask_fn", [_two_fragment_mask, _thin_diag_strip])
def test_exact_sampler_never_fails_and_stays_in_mask(mask_fn):
    m = mask_fn()
    flat = jnp.asarray(m.reshape(-1))
    for i in range(10):
        idx, ok = _sample_mask_indices(
            jax.random.PRNGKey(i), flat, (3, 128), m.shape)
        assert bool(ok)
        assert bool(jnp.all(flat[idx])), "sampled a pixel outside the mask"


def test_exact_sampler_uniform_marginal():
    """Empirical per-pixel frequency on a small irregular mask matches the
    uniform law (5-sigma gate on the max deviation)."""
    rng = np.random.RandomState(0)
    m = rng.rand(24, 17) > 0.7
    m[0, 0] = True                     # ensure non-empty, include a corner
    flat = jnp.asarray(m.reshape(-1))
    n_pix = int(m.sum())
    draws = 300
    counts = np.zeros(m.size)
    for i in range(draws):
        idx, ok = _sample_mask_indices(
            jax.random.PRNGKey(i), flat, (4, 64), m.shape)
        np.add.at(counts, np.asarray(idx).reshape(-1), 1)
    total = draws * 4 * 64
    assert counts[~m.reshape(-1)].sum() == 0
    p = 1.0 / n_pix
    sigma = np.sqrt(total * p * (1 - p))
    dev = np.abs(counts[m.reshape(-1)] - total * p).max()
    assert dev < 5 * sigma, f"max deviation {dev} vs 5 sigma {5 * sigma}"


def test_exact_sampler_empty_mask_flags_not_ok():
    flat = jnp.zeros(64 * 64, bool)
    idx, ok = _sample_mask_indices(jax.random.PRNGKey(0), flat, (3, 32),
                                   (64, 64))
    assert not bool(ok)
    assert idx.shape == (3, 32)


def test_thin_strip_plane_contributes_loss():
    """A 4-px diagonal strip of a tilted plane: the exact sampler feeds the
    VNL term real triplets, so a wrong predicted depth is penalised (the
    bbox sampler zeroed such planes out)."""
    h = w = 128
    m = np.abs(np.add.outer(np.arange(h), -np.arange(w))) < 4
    k = np.array([[100.0, 0, w / 2], [0, 100.0, h / 2], [0, 0, 1]],
                 np.float32)
    # gt plane: n . X = d with a strong tilt
    n = np.array([0.6, 0.0, 0.8], np.float32)
    d = 2.0
    uu, vv = np.meshgrid(np.arange(w), np.arange(h))
    rays = np.linalg.inv(k) @ np.stack(
        [uu.ravel(), vv.ravel(), np.ones(h * w)])
    gt_depth = (d / (n @ rays)).reshape(h, w).astype(np.float32)
    flat_pred = np.full((h, w), 2.5, np.float32)    # flat, wrong shape

    loss = vnl_loss_single(
        jax.random.PRNGKey(3), jnp.asarray(flat_pred),
        jnp.asarray(m[None]), jnp.asarray(n[None]),
        jnp.ones(1, bool), jnp.asarray(gt_depth), jnp.asarray(k),
        num_samples=256, sample_nonplanar=False)
    assert np.isfinite(float(loss))
    assert float(loss) > 0.05, (
        "thin-strip plane should contribute a real penalty, got "
        f"{float(loss)}")


def test_depth_gather_triplets_match_point_cloud_form():
    """The depth-gather triplet form (backward scatters 1/3 the data) is
    bit-equal to gathering from the materialised point cloud."""
    from planerecnet_tpu.losses.vnl import (_form_triplets,
                                            _form_triplets_from_depth,
                                            _point_cloud)
    rng = np.random.RandomState(0)
    h, w = 24, 17
    depth = jnp.asarray(rng.rand(h, w).astype(np.float32) * 4 - 0.5)
    fx = jnp.float32(50.0)
    fy = jnp.float32(55.0)
    u0, v0 = w // 2, h // 2
    idx = jnp.asarray(rng.randint(0, h * w, size=(3, 64)), jnp.int32)
    ref = _form_triplets(_point_cloud(depth, fx, fy, u0, v0), idx)
    new = _form_triplets_from_depth(depth.reshape(-1), idx, fx, fy,
                                    u0, v0, w)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(new))
