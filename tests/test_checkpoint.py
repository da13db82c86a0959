"""Checkpoint I/O + PyTorch converter tests.

The converter test builds a synthetic torch-layout state_dict whose keys are
generated *independently* (from the published reference module structure,
reference models/backbone.py + planerecnet.py) and checks that every flax
leaf converts, shapes agree, and a round-trip through the forward changes
outputs (i.e. the weights actually landed).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from planerecnet_tpu.config import PlaneRecNet_50_config
from planerecnet_tpu.models.planerecnet import PlaneRecNet
from planerecnet_tpu.utils import checkpoint as ckpt
from planerecnet_tpu.utils.torch_convert import (convert_state_dict,
                                                 flax_path_to_torch_key)


@pytest.fixture(scope="module")
def small_model():
    cfg = PlaneRecNet_50_config.copy(dict(max_size=64))
    model = PlaneRecNet(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return cfg, model, variables


def test_weights_roundtrip(tmp_path, small_model):
    cfg, model, variables = small_model
    path = str(tmp_path / "w.npz")
    ckpt.save_weights(path, variables)
    loaded = ckpt.load_weights(path)

    flat_a = ckpt.flatten_pytree(variables)
    flat_b = ckpt.flatten_pytree(loaded)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]), flat_b[k])


def _synthetic_torch_sd(variables):
    """Build a torch-layout state_dict covering every flax leaf, with
    torch-convention shapes (conv OIHW)."""
    rng = np.random.RandomState(0)
    sd = {}
    for coll, tree in variables.items():
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            p = tuple(x.key for x in path)
            tkey = flax_path_to_torch_key(p)
            assert tkey is not None, f"no torch key for {coll}/{p}"
            arr = np.asarray(leaf)
            if p[-1] in ("kernel", "regular_conv_kernel"):
                # flax HWIO -> torch OIHW
                shape = (arr.shape[3], arr.shape[2], arr.shape[0],
                         arr.shape[1])
            else:
                shape = arr.shape
            w = rng.randn(*shape).astype(np.float32) * 0.05
            if tkey.endswith("running_var"):
                w = np.abs(w) + 0.5  # variances must be positive
            sd[tkey] = w
    return sd


def test_torch_converter_complete_and_effective(small_model):
    cfg, model, variables = small_model
    sd = _synthetic_torch_sd(variables)
    converted = convert_state_dict(sd, variables)

    # structure preserved
    assert jax.tree_util.tree_structure(converted) == \
        jax.tree_util.tree_structure(variables)

    # a known leaf landed with the right transpose
    w_t = sd["backbone.conv1.weight"]           # (64, 3, 7, 7)
    w_f = converted["params"]["backbone"]["conv1"]["kernel"]
    np.testing.assert_allclose(np.transpose(w_t, (2, 3, 1, 0)), w_f)

    # forward output actually changes under the converted weights
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    out_a = model.apply(variables, x, train=False)
    out_b = model.apply(jax.tree.map(jnp.asarray, converted), x, train=False)
    assert np.abs(np.asarray(out_a["depth_pred"])
                  - np.asarray(out_b["depth_pred"])).max() > 1e-6


def test_converter_rejects_incomplete(small_model):
    cfg, model, variables = small_model
    sd = _synthetic_torch_sd(variables)
    sd.pop("backbone.conv1.weight")
    with pytest.raises(KeyError):
        convert_state_dict(sd, variables)


def test_dcn_blocks_have_offset_convs(small_model):
    """PRN-50 (ResNet50-DCNv2, dcn_layers=(0,4,6,3)) must contain DCN conv2
    blocks in stages 1-3 (reference data/config.py:246-250)."""
    cfg, model, variables = small_model
    params = variables["params"]["backbone"]
    dcn_blocks = [k for k, v in params.items()
                  if isinstance(v, dict) and "conv2" in v
                  and isinstance(v["conv2"], dict)
                  and "offset_conv" in v["conv2"]]
    # stage 1: 4 blocks, stage 2: 6, stage 3: 3 -> all DCN (interval 1)
    assert len(dcn_blocks) == 13


def test_converted_conv_bn_matches_torch_numerics():
    """Weight conversion fidelity: a torch Conv2d+BatchNorm2d(eval) pipeline
    and the flax twin under converted weights produce identical outputs
    (validates OIHW->HWIO, BN stat mapping, NCHW<->NHWC)."""
    torch = pytest.importorskip("torch")
    import flax.linen as fnn

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)  # NCHW for torch

    tconv = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=True)
    tbn = torch.nn.BatchNorm2d(8, eps=1e-5)
    tbn.eval()
    with torch.no_grad():
        tbn.running_mean.normal_()
        tbn.running_var.uniform_(0.5, 2.0)
        tbn.weight.normal_()
        tbn.bias.normal_()
        want = tbn(tconv(torch.from_numpy(x))).numpy()

    class Twin(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            x = fnn.Conv(8, (3, 3), strides=(2, 2),
                         padding=[(1, 1), (1, 1)], name="conv")(x)
            return fnn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                 name="bn")(x)

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    m = Twin()
    variables = {
        "params": {
            "conv": {
                "kernel": jnp.asarray(np.transpose(
                    tconv.weight.detach().numpy(), (2, 3, 1, 0))),
                "bias": jnp.asarray(tconv.bias.detach().numpy()),
            },
            "bn": {
                "scale": jnp.asarray(tbn.weight.detach().numpy()),
                "bias": jnp.asarray(tbn.bias.detach().numpy()),
            },
        },
        "batch_stats": {
            "bn": {
                "mean": jnp.asarray(tbn.running_mean.numpy()),
                "var": jnp.asarray(tbn.running_var.numpy()),
            },
        },
    }
    got = np.transpose(np.asarray(m.apply(variables, x_nhwc)), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_train_state_optimizer_layout_migration(tmp_path):
    """A train-state checkpoint whose opt_state layout predates the
    optax.flatten optimizer core must still resume: params/batch_stats/step
    restored, optimizer moments re-initialised (with a warning) instead of
    the loader refusing the file."""
    import optax
    from planerecnet_tpu.config import PlaneRecNet_tiny_config
    from planerecnet_tpu.trainer import TrainState, make_optimizer

    params = {"backbone": {"w": jnp.full((3,), 2.0)},
              "head": {"b": jnp.full((2,), -1.0)}}
    batch_stats = {"bn": {"mean": jnp.zeros((3,))}}

    # Old-style state: per-leaf Adam moments (no optax.flatten).
    old = TrainState.create(
        apply_fn=lambda *a, **k: None, params=params,
        tx=optax.adam(1e-3), batch_stats=batch_stats,
        rng=jax.random.PRNGKey(0))
    old = old.replace(step=17)
    path = str(tmp_path / "old_layout.npz")
    ckpt.save_train_state(path, old)

    # Current-style template: flattened Adam core.
    new = TrainState.create(
        apply_fn=lambda *a, **k: None,
        params=jax.tree.map(jnp.zeros_like, params),
        tx=make_optimizer(PlaneRecNet_tiny_config),
        batch_stats=jax.tree.map(jnp.zeros_like, batch_stats),
        rng=jax.random.PRNGKey(1))
    fresh_opt = jax.tree.map(np.asarray, new.opt_state)

    with pytest.warns(UserWarning, match="opt_state layout"):
        restored = ckpt.load_train_state(path, new)

    assert restored.step == 17
    np.testing.assert_array_equal(
        np.asarray(restored.params["backbone"]["w"]), np.full((3,), 2.0))
    np.testing.assert_array_equal(
        np.asarray(restored.batch_stats["bn"]["mean"]), np.zeros((3,)))
    # opt_state kept the template's (fresh) layout and values
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), b), restored.opt_state, fresh_opt)


def test_train_state_roundtrip_same_layout(tmp_path):
    """Same-layout save/load restores the optimizer moments exactly."""
    from planerecnet_tpu.config import PlaneRecNet_tiny_config
    from planerecnet_tpu.trainer import TrainState, make_optimizer

    params = {"w": jnp.ones((4,))}
    bs = {"bn": {"mean": jnp.zeros((4,))}}
    tx = make_optimizer(PlaneRecNet_tiny_config)
    state = TrainState.create(apply_fn=lambda *a, **k: None, params=params,
                              tx=tx, batch_stats=bs, rng=jax.random.PRNGKey(0))
    # take one update so the moments are non-trivial
    grads = {"w": jnp.full((4,), 0.5)}
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    state = state.replace(
        params=jax.tree.map(lambda p, u: p + u, state.params, updates),
        opt_state=opt_state, step=3)

    path = str(tmp_path / "state.npz")
    ckpt.save_train_state(path, state)
    template = TrainState.create(
        apply_fn=lambda *a, **k: None,
        params=jax.tree.map(jnp.zeros_like, params), tx=tx,
        batch_stats=jax.tree.map(jnp.zeros_like, bs),
        rng=jax.random.PRNGKey(9))
    restored = ckpt.load_train_state(path, template)
    assert restored.step == 3
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), restored.opt_state, state.opt_state)


def test_converted_groupnorm_matches_torch():
    torch = pytest.importorskip("torch")
    import flax.linen as fnn

    rng = np.random.RandomState(1)
    x = rng.randn(2, 64, 8, 8).astype(np.float32)
    tgn = torch.nn.GroupNorm(32, 64)
    with torch.no_grad():
        tgn.weight.normal_()
        tgn.bias.normal_()
        want = tgn(torch.from_numpy(x)).numpy()

    m = fnn.GroupNorm(num_groups=32, epsilon=1e-5)
    variables = {"params": {
        "scale": jnp.asarray(tgn.weight.detach().numpy()),
        "bias": jnp.asarray(tgn.bias.detach().numpy())}}
    got = np.transpose(
        np.asarray(m.apply(variables,
                           jnp.asarray(np.transpose(x, (0, 2, 3, 1))))),
        (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
