"""bfloat16 compute-path tests: same params, close outputs, bf16 tensors in
the hot path, f32 params throughout."""

import numpy as np

import jax
import jax.numpy as jnp

from planerecnet_tpu.config import PlaneRecNet_50_config
from planerecnet_tpu.models.planerecnet import PlaneRecNet


def _tiny(dtype):
    cfg = PlaneRecNet_50_config
    return PlaneRecNet(cfg.copy(dict(
        max_size=64, compute_dtype=dtype,
        solov2=cfg.solov2.copy(dict(num_grids=(10, 9, 6, 4))))))


def test_bf16_matches_f32_closely():
    m32 = _tiny("float32")
    mbf = _tiny("bfloat16")
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                    jnp.float32)
    v = m32.init(jax.random.PRNGKey(0), x, train=False)

    # same variable structure -> bf16 is a pure compute-dtype change
    v_bf = mbf.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v) == \
        jax.tree_util.tree_structure(v_bf)
    for leaf in jax.tree.leaves(v_bf):
        assert leaf.dtype == jnp.float32  # params/stats stay f32

    out32 = m32.apply(v, x, train=False)
    outbf = mbf.apply(v, x, train=False)

    d32 = np.asarray(out32["depth_pred"], np.float32)
    dbf = np.asarray(outbf["depth_pred"], np.float32)
    denom = np.abs(d32).mean() + 1e-6
    assert np.abs(d32 - dbf).mean() / denom < 0.05

    c32 = np.asarray(out32["cate_preds"][0], np.float32)
    cbf = np.asarray(outbf["cate_preds"][0], np.float32)
    assert np.abs(c32 - cbf).mean() < 0.1
