"""Deformable conv tests against a slow, independent numpy reference.

The numpy oracle implements the published DCNv2 semantics (zero out-of-bounds
bilinear sampling, per-tap modulation) with plain python loops.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from planerecnet_tpu.ops.dcn import deform_conv2d


def numpy_deform_conv2d(x, offset, mask, weight, bias, stride, padding):
    """Slow loop oracle. x: (B,H,W,C); offset: (B,Ho,Wo,2K); mask: (B,Ho,Wo,K);
    weight: (kh,kw,Cin,Cout)."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    _, ho, wo, _ = offset.shape
    out = np.zeros((b, ho, wo, cout), np.float64)

    def sample(img, y, xq):
        y0, x0 = int(np.floor(y)), int(np.floor(xq))
        fy, fx = y - y0, xq - x0
        val = np.zeros(cin, np.float64)
        for dy, wy in ((0, 1 - fy), (1, fy)):
            for dx, wx in ((0, 1 - fx), (1, fx)):
                yy, xx = y0 + dy, x0 + dx
                if 0 <= yy < h and 0 <= xx < w:
                    val += wy * wx * img[yy, xx]
        return val

    for bi in range(b):
        for i in range(ho):
            for j in range(wo):
                acc = np.zeros(cout, np.float64)
                for ki in range(kh):
                    for kj in range(kw):
                        k = ki * kw + kj
                        dy = offset[bi, i, j, 2 * k]
                        dx = offset[bi, i, j, 2 * k + 1]
                        y = i * stride - padding + ki + dy
                        xq = j * stride - padding + kj + dx
                        v = sample(x[bi], y, xq) * mask[bi, i, j, k]
                        acc += v @ weight[ki, kj]
                out[bi, i, j] = acc + (bias if bias is not None else 0)
    return out.astype(np.float32)


@pytest.mark.parametrize("stride", [1, 2])
def test_deform_conv_matches_numpy(stride):
    rng = np.random.RandomState(0)
    b, h, w, cin, cout = 2, 7, 9, 4, 6
    ho = (h + 2 - 3) // stride + 1
    wo = (w + 2 - 3) // stride + 1
    x = rng.randn(b, h, w, cin).astype(np.float32)
    offset = (rng.randn(b, ho, wo, 18) * 2).astype(np.float32)
    mask = rng.rand(b, ho, wo, 9).astype(np.float32) * 2
    weight = rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1
    bias = rng.randn(cout).astype(np.float32)

    got = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), jnp.asarray(bias),
        stride=stride, padding=1, kernel_size=3))
    want = numpy_deform_conv2d(x, offset, mask, weight, bias, stride, 1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_zero_offset_equals_regular_conv():
    """With zero offsets and unit modulators, DCN == plain 3x3 conv
    (the reference zero-inits offset/modulator so DCN starts as a regular
    conv, models/dcn.py:32-43 — modulo the 2*sigmoid(0)=1 factor)."""
    rng = np.random.RandomState(1)
    b, h, w, cin, cout = 1, 8, 8, 3, 5
    x = rng.randn(b, h, w, cin).astype(np.float32)
    weight = rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1
    offset = np.zeros((b, h, w, 18), np.float32)
    mask = np.ones((b, h, w, 9), np.float32)

    got = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), None, stride=1, padding=1))
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(weight),
        window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-5)


def test_deform_conv_grads_flow():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 6, 6, 3).astype(np.float32))
    offset = jnp.asarray(rng.randn(1, 6, 6, 18).astype(np.float32) * 0.5)
    mask = jnp.asarray(rng.rand(1, 6, 6, 9).astype(np.float32))
    weight = jnp.asarray(rng.randn(3, 3, 3, 4).astype(np.float32) * 0.1)

    def loss(x, offset, mask, weight):
        return jnp.sum(deform_conv2d(x, offset, mask, weight, None,
                                     stride=1, padding=1) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, offset, mask, weight)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.abs(np.asarray(g)).sum() > 0


def test_custom_vjp_matches_autodiff(monkeypatch):
    """The hand-written DCN backward must match plain autodiff of the
    reference implementation on all five inputs."""
    import planerecnet_tpu.ops.dcn as dcn_mod
    from planerecnet_tpu.ops.dcn import deform_conv2d_reference
    monkeypatch.setattr(dcn_mod, "USE_CUSTOM_VJP", True)

    rng = np.random.RandomState(3)
    b, h, w, cin, cout = 2, 9, 8, 4, 6
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    offset = jnp.asarray(rng.randn(b, h, w, 18).astype(np.float32) * 1.5)
    mask = jnp.asarray(rng.rand(b, h, w, 9).astype(np.float32))
    weight = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * .1)
    bias = jnp.asarray(rng.randn(cout).astype(np.float32))
    cot = jnp.asarray(rng.randn(b, h, w, cout).astype(np.float32))

    def loss_custom(*args):
        return jnp.sum(deform_conv2d(*args, stride=1, padding=1) * cot)

    def loss_ref(*args):
        return jnp.sum(deform_conv2d_reference(*args, stride=1, padding=1)
                       * cot)

    g_c = jax.grad(loss_custom, argnums=(0, 1, 2, 3, 4))(
        x, offset, mask, weight, bias)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        x, offset, mask, weight, bias)
    names = ["dx", "doffset", "dmask", "dweight", "dbias"]
    for n, a, b_ in zip(names, g_c, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-4, err_msg=n)


def test_batch_chunking_bit_exact(monkeypatch):
    """Scan-chunked, unchunked, and adaptive-threshold forwards must agree
    bit-exactly (chunking is a pure scheduling decision)."""
    import planerecnet_tpu.ops.dcn as dcn_mod

    rng = np.random.RandomState(11)
    b, h, w, cin, cout = 4, 7, 9, 4, 6
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    offset = jnp.asarray(rng.randn(b, h, w, 18).astype(np.float32) * 1.2)
    mask = jnp.asarray(rng.rand(b, h, w, 9).astype(np.float32))
    weight = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * .1)

    def run():
        # jit cache keys on static args only, so clear between variants.
        deform_conv2d.clear_cache()
        return np.asarray(deform_conv2d(x, offset, mask, weight, None,
                                        stride=1, padding=1,
                                        gather_mode="rows"))

    monkeypatch.setattr(dcn_mod, "DCN_BATCH_CHUNK", 1)
    monkeypatch.setattr(dcn_mod, "DCN_CHUNK_MAX_MB", 0.0)
    chunked = run()

    monkeypatch.setattr(dcn_mod, "DCN_BATCH_CHUNK", 0)
    unchunked = run()

    monkeypatch.setattr(dcn_mod, "DCN_BATCH_CHUNK", 1)
    # Corner set here is ~0.03 MB, far under threshold -> unchunked path.
    monkeypatch.setattr(dcn_mod, "DCN_CHUNK_MAX_MB", 1.0)
    adaptive_skip = run()

    # Threshold below the corner set -> chunked path.
    monkeypatch.setattr(dcn_mod, "DCN_CHUNK_MAX_MB", 1e-6)
    adaptive_chunk = run()

    np.testing.assert_array_equal(chunked, unchunked)
    np.testing.assert_array_equal(chunked, adaptive_skip)
    np.testing.assert_array_equal(chunked, adaptive_chunk)


def test_custom_vjp_patch_fwd_xla_scatter(monkeypatch):
    """The hybrid training path (custom VJP with a patch-mode forward and
    the XLA scatter-add for dx) must be bit-exact in the primal and match
    autodiff in all five gradients."""
    import planerecnet_tpu.ops.dcn as dcn_mod
    from planerecnet_tpu.ops.dcn import deform_conv2d_reference
    monkeypatch.setattr(dcn_mod, "USE_CUSTOM_VJP", True)
    monkeypatch.setattr(dcn_mod, "CUSTOM_FWD_GATHER", "patch")
    monkeypatch.setattr(dcn_mod, "CUSTOM_BWD_SCATTER", "xla")

    rng = np.random.RandomState(7)
    b, h, w, cin, cout = 2, 9, 8, 4, 6
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    offset = jnp.asarray(rng.randn(b, h, w, 18).astype(np.float32) * 1.5)
    mask = jnp.asarray(rng.rand(b, h, w, 9).astype(np.float32))
    weight = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * .1)
    bias = jnp.asarray(rng.randn(cout).astype(np.float32))
    cot = jnp.asarray(rng.randn(b, h, w, cout).astype(np.float32))

    out_c = deform_conv2d(x, offset, mask, weight, bias, stride=1, padding=1)
    out_r = deform_conv2d_reference(x, offset, mask, weight, bias,
                                    stride=1, padding=1)
    np.testing.assert_array_equal(np.asarray(out_c), np.asarray(out_r))

    def loss_custom(*args):
        return jnp.sum(deform_conv2d(*args, stride=1, padding=1) * cot)

    def loss_ref(*args):
        return jnp.sum(deform_conv2d_reference(*args, stride=1, padding=1)
                       * cot)

    g_c = jax.grad(loss_custom, argnums=(0, 1, 2, 3, 4))(
        x, offset, mask, weight, bias)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        x, offset, mask, weight, bias)
    for n, a, b_ in zip(["dx", "doffset", "dmask", "dweight", "dbias"],
                        g_c, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-4, err_msg=n)


def test_custom_vjp_zero_offsets_integer_positions(monkeypatch):
    """Offset gradients at exactly-integer sample positions (the zero-init
    state) must include the neighbouring-pixel terms."""
    import planerecnet_tpu.ops.dcn as dcn_mod
    from planerecnet_tpu.ops.dcn import deform_conv2d_reference
    monkeypatch.setattr(dcn_mod, "USE_CUSTOM_VJP", True)

    rng = np.random.RandomState(4)
    b, h, w, cin, cout = 1, 6, 6, 3, 4
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    offset = jnp.zeros((b, h, w, 18), jnp.float32)
    mask = jnp.ones((b, h, w, 9), jnp.float32)
    weight = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * .1)
    cot = jnp.asarray(rng.randn(b, h, w, cout).astype(np.float32))

    g_c = jax.grad(lambda o: jnp.sum(
        deform_conv2d(x, o, mask, weight, None, stride=1, padding=1) * cot))(
            offset)
    g_r = jax.grad(lambda o: jnp.sum(
        deform_conv2d_reference(x, o, mask, weight, None, stride=1,
                                padding=1) * cot))(offset)
    assert np.abs(np.asarray(g_r)).max() > 0
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_r),
                               rtol=1e-3, atol=1e-4)


def test_pallas_scatter_matches_xla(monkeypatch):
    """The Pallas dx scatter kernel vs the XLA fallback (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu
    from planerecnet_tpu.ops.pallas.dcn_scatter import (
        dcn_input_grad_pallas, dcn_input_grad_xla)

    rng = np.random.RandomState(5)
    b, r, c, h, w = 2, 100, 8, 7, 9
    idx = np.stack([rng.randint(0, h + 1, (b, r)),
                    rng.randint(0, w + 1, (b, r))], axis=-1).astype(np.int32)
    cw = rng.rand(b, r, 4).astype(np.float32)
    dcols = rng.randn(b, r, c).astype(np.float32)

    want = np.asarray(dcn_input_grad_xla(
        jnp.asarray(idx), jnp.asarray(cw), jnp.asarray(dcols), h, w))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(dcn_input_grad_pallas(
            jnp.asarray(idx), jnp.asarray(cw), jnp.asarray(dcols), h, w))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_scatter_banded(monkeypatch):
    """Force multiple accumulator bands to exercise the band routing."""
    from jax.experimental.pallas import tpu as pltpu
    import planerecnet_tpu.ops.pallas.dcn_scatter as ds

    monkeypatch.setattr(ds, "_BAND_BYTES", 2048)  # tiny -> many bands
    rng = np.random.RandomState(6)
    b, r, c, h, w = 2, 300, 8, 13, 11
    idx = np.stack([rng.randint(0, h + 1, (b, r)),
                    rng.randint(0, w + 1, (b, r))], axis=-1).astype(np.int32)
    cw = rng.rand(b, r, 4).astype(np.float32)
    dcols = rng.randn(b, r, c).astype(np.float32)
    want = np.asarray(ds.dcn_input_grad_xla(
        jnp.asarray(idx), jnp.asarray(cw), jnp.asarray(dcols), h, w))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(ds.dcn_input_grad_pallas(
            jnp.asarray(idx), jnp.asarray(cw), jnp.asarray(dcols), h, w))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_patch_gather_mode_bit_exact():
    """gather_mode='patch' (one 2x2xC patch gather) must match the
    row-gather path bit-for-bit on the FORWARD (the path inference uses;
    patch is inference-only by policy) and to 2-ulp tolerance on gradients
    (the backward scatters accumulate in a different order), including far
    out-of-bounds offsets.

    NB: the modes are selected via the EXPLICIT static ``gather_mode``
    argument — the path production uses (runner/backbone pass
    ``default_gather_mode(train)``). An earlier version of this test
    flipped the module-global ``CORNER_GATHER`` between calls, which the
    jit cache silently ignores (same shapes + static args -> cache hit),
    making the comparison vacuous — and hiding the ulp-level backward
    difference this version documents."""
    from planerecnet_tpu.ops import dcn

    rng = np.random.RandomState(3)
    b, h, w, cin, cout = 2, 9, 12, 8, 16
    x = jnp.asarray(rng.randn(b, h, w, cin), jnp.float32)
    off = jnp.asarray(rng.randn(b, h, w, 18) * 4, jnp.float32)
    m = jnp.asarray(rng.rand(b, h, w, 9), jnp.float32)
    wt = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.1, jnp.float32)

    def loss(mode, *a):
        return jnp.sum(jnp.square(dcn.deform_conv2d(*a, gather_mode=mode)))

    ref = dcn.deform_conv2d(x, off, m, wt, gather_mode="rows")
    gref = jax.grad(loss, argnums=(1, 2, 3, 4))("rows", x, off, m, wt)
    new = dcn.deform_conv2d(x, off, m, wt, gather_mode="patch")
    gnew = jax.grad(loss, argnums=(1, 2, 3, 4))("patch", x, off, m, wt)

    np.testing.assert_array_equal(np.asarray(ref), np.asarray(new))
    for a, c in zip(gref, gnew):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=3e-7, atol=5e-7)


def test_onehot_gather_mode_close():
    """gather_mode='onehot' (interp-matmul; backward is a matmul instead of
    a scatter) must match the row-gather path to f32 matmul tolerance,
    forward and all gradients, including out-of-bounds offsets and the
    'onehot:<HW>[:fb]' per-layer threshold form."""
    from planerecnet_tpu.ops import dcn

    rng = np.random.RandomState(5)
    b, h, w, cin, cout = 2, 9, 12, 8, 16
    x = jnp.asarray(rng.randn(b, h, w, cin), jnp.float32)
    off = jnp.asarray(rng.randn(b, h, w, 18) * 4, jnp.float32)
    m = jnp.asarray(rng.rand(b, h, w, 9), jnp.float32)
    wt = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.1, jnp.float32)

    def loss(mode, *a):
        return jnp.sum(jnp.square(dcn.deform_conv2d(*a, gather_mode=mode)))

    ref = dcn.deform_conv2d(x, off, m, wt, gather_mode="rows")
    gref = jax.grad(loss, argnums=(1, 2, 3, 4))("rows", x, off, m, wt)
    for mode in ("onehot", f"onehot:{h * w}", "onehot:4:patch"):
        new = dcn.deform_conv2d(x, off, m, wt, gather_mode=mode)
        gnew = jax.grad(loss, argnums=(1, 2, 3, 4))(mode, x, off, m, wt)
        if mode == "onehot:4:patch":      # threshold not met -> fallback
            np.testing.assert_array_equal(np.asarray(ref), np.asarray(new))
            continue
        np.testing.assert_allclose(np.asarray(ref), np.asarray(new),
                                   rtol=1e-5, atol=1e-5)
        for a, c in zip(gref, gnew):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=1e-4, atol=1e-4)


def test_default_gather_mode_policy(monkeypatch):
    """Training must NEVER default to the patch gather (its autodiff
    backward is catastrophic — PERF.md round 3); inference defaults to it
    (+10% end-to-end). PRN_CORNER_GATHER overrides both."""
    import planerecnet_tpu.ops.dcn as dcn

    monkeypatch.delenv("PRN_CORNER_GATHER", raising=False)
    assert dcn.default_gather_mode(train=True) == "rows"
    assert dcn.default_gather_mode(train=False) == "patch"
    monkeypatch.setenv("PRN_CORNER_GATHER", "rows")
    assert dcn.default_gather_mode(train=False) == "rows"


def test_outer_prep_bit_exact(monkeypatch):
    """Hoisting the corner prep out of the chunk scan (DCN_OUTER_PREP) is a
    pure scheduling decision: forward AND grads must match the in-body
    formulation bit-exactly for every gather mode."""
    import planerecnet_tpu.ops.dcn as dcn

    rng = np.random.RandomState(23)
    b, h, w, cin, cout = 4, 7, 9, 4, 6
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    off = jnp.asarray(rng.randn(b, h, w, 18).astype(np.float32) * 1.2)
    m = jnp.asarray(rng.rand(b, h, w, 9).astype(np.float32))
    wt = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * .1)

    def loss(mode, *a):
        return jnp.sum(jnp.square(dcn.deform_conv2d(*a, gather_mode=mode)))

    monkeypatch.setattr(dcn, "DCN_BATCH_CHUNK", 1)
    monkeypatch.setattr(dcn, "DCN_CHUNK_MAX_MB", 0.0)
    for mode in ("rows", "patch", "onehot", "mix:4", f"mix:{h * w * 9}",
                 f"onehot:{h * w}", "onehot:4"):
        outs, grads = [], []
        for outer in (False, True):
            monkeypatch.setattr(dcn, "DCN_OUTER_PREP", outer)
            dcn.deform_conv2d.clear_cache()
            outs.append(np.asarray(
                dcn.deform_conv2d(x, off, m, wt, None, gather_mode=mode)))
            grads.append(jax.grad(loss, argnums=(1, 2, 3, 4))(
                mode, x, off, m, wt))
        np.testing.assert_array_equal(outs[0], outs[1], err_msg=mode)
        for a, c in zip(grads[0], grads[1]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c),
                                          err_msg=mode)
