"""End-to-end numeric parity against the actual torch reference network.

For each of the three shipped presets, this builds the *reference* model from
/root/reference/planerecnet.py:20-289 (CPU torch, ``torchvision.ops
.deform_conv2d`` stubbed with the vectorised implementation in
tests/reference_torch.py), converts its randomly-initialised ``state_dict``
through ``convert_state_dict``, and asserts that

* the raw prediction tensors (cate / kernel / mask / depth) of the JAX
  forward match the torch forward, and
* the post-processed outputs (scores / classes / masks / boxes) of the
  fixed-capacity TPU pipeline match the reference's dynamic
  ``inference_single_image`` (reference planerecnet.py:182-289).

This is the substantiation of the ±1% mAP/RMSE conversion-fidelity budget
(SURVEY.md §7 hard part (e)) available without the released weights: it
covers the FPN accumulator quirk (reference models/fpn.py:49-56), BN
eps/momentum, reflect pads, the NCHW->NHWC kernel flattening order in the
depth decoder (reference planerecnet.py:586-592), and the whole
post-processing semantics, composed end to end.

DCN offset/modulator convs are zero-initialised by the reference (identity
sampling), so after conversion we randomise them on the torch side and
re-convert — the parity run exercises true fractional deformable sampling.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_torch import load_reference, torch_deform_conv2d

import planerecnet_tpu.config as tpu_config
from planerecnet_tpu.models.planerecnet import PlaneRecNet
from planerecnet_tpu.ops.postprocess import postprocess_batch
from planerecnet_tpu.utils.torch_convert import convert_state_dict

H, W = 128, 160  # /32-divisible, small enough for CPU

PRESETS = [
    "PlaneRecNet_50_config",
    "PlaneRecNet_101_config",
    "PlaneRecNet_base_config",
]


def test_torch_dcn_stub_matches_numpy_oracle():
    """The torch deform_conv2d stub must match the same numpy oracle that
    validates the JAX op — the two parity sides are independently pinned."""
    from test_dcn import numpy_deform_conv2d

    rng = np.random.RandomState(0)
    b, h, w, cin, cout = 2, 7, 9, 4, 6
    x = rng.randn(b, cin, h, w).astype(np.float32)
    offset = (rng.randn(b, 18, h, w) * 2).astype(np.float32)
    mask = (rng.rand(b, 9, h, w) * 2).astype(np.float32)
    weight = (rng.randn(cout, cin, 3, 3) * 0.1).astype(np.float32)
    bias = rng.randn(cout).astype(np.float32)

    got = torch_deform_conv2d(
        input=torch.from_numpy(x), offset=torch.from_numpy(offset),
        weight=torch.from_numpy(weight), bias=torch.from_numpy(bias),
        stride=1, padding=1, mask=torch.from_numpy(mask)).numpy()
    want = numpy_deform_conv2d(
        np.transpose(x, (0, 2, 3, 1)),
        np.transpose(offset, (0, 2, 3, 1)),
        np.transpose(mask, (0, 2, 3, 1)),
        np.transpose(weight, (2, 3, 1, 0)), bias, 1, 1)
    np.testing.assert_allclose(
        np.transpose(got, (0, 2, 3, 1)), want, rtol=2e-4, atol=2e-4)


def _build_reference_net(preset):
    """Reference net (random init, randomized DCN offsets, frozen BN) and
    the reference config module."""
    ref_config = load_reference()
    ref_config.set_cfg(preset)
    ref_config.cfg.device = "cpu"
    from utils import timer as ref_timer
    ref_timer.disable_all()
    import planerecnet as ref_prn

    torch.manual_seed(0)
    net = ref_prn.PlaneRecNet(ref_config.cfg)
    # Give the zero-initialised DCN offset/modulator convs real values so
    # parity covers fractional deformable sampling, not just the
    # identity-offset special case.
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for name, p in net.named_parameters():
            if "offset_conv" in name or "modulator_conv" in name:
                p.copy_(torch.randn(p.shape, generator=gen) * 0.1)
    # Latent reference bug: with 5 instance levels configured (the base
    # preset), the depth decoder's 1x1 compress is built for
    # sum(S^2 over ALL num_grids) = 3872 input channels
    # (reference planerecnet.py:575-577), but split_feats only ever yields
    # 4 levels (planerecnet.py:113-118), so the forward feeds 3728 channels
    # and the reference CRASHES on its own base config. Patch the torch net
    # to the 4-level width (the first 3728 channels are exactly the 4 real
    # levels in flatten order) so end-to-end parity can still run; our JAX
    # model infers the actual width and has no such crash.
    import torch.nn as nn
    old = net.depth_decoder.conv1x1[0]
    used = sum(s * s for s in ref_config.cfg.solov2.num_grids[:4])
    if old.in_channels != used:
        new = nn.Conv2d(used, old.out_channels, 1,
                        bias=old.bias is not None)
        with torch.no_grad():
            new.weight.copy_(old.weight[:, :used])
            if old.bias is not None:
                new.bias.copy_(old.bias)
        net.depth_decoder.conv1x1[0] = new

    net.train()
    net.freeze_bn()  # BNs -> running stats, matching our train=False
    return net, ref_config


def _tpu_cfg(preset):
    return tpu_config.get_cfg(preset)


def _convert(net, cfg):
    model = PlaneRecNet(cfg)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, H, W, 3), jnp.float32), train=False)
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    return model, convert_state_dict(sd, template)


def _nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


@pytest.mark.parametrize("preset", PRESETS)
def test_forward_and_postprocess_parity(preset):
    net, ref_config = _build_reference_net(preset)
    cfg = _tpu_cfg(preset)
    model, variables = _convert(net, cfg)

    rng = np.random.RandomState(42)
    x = rng.randn(1, H, W, 3).astype(np.float32)
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

    # ---- raw prediction parity (training branch vs train=False) ----
    with torch.no_grad():
        t_mask, t_cate, t_kernel, t_depth = net(tx)
    preds = jax.jit(
        lambda v, xx: model.apply(v, xx, train=False))(variables, x)

    np.testing.assert_allclose(
        _nchw(preds["mask_pred"]), t_mask.numpy(),
        rtol=1e-4, atol=1e-5, err_msg="mask_pred")
    np.testing.assert_allclose(
        _nchw(preds["depth_pred"]), t_depth.numpy(),
        rtol=1e-4, atol=1e-5, err_msg="depth_pred")
    for lvl, (ours, theirs) in enumerate(zip(preds["cate_preds"], t_cate)):
        np.testing.assert_allclose(
            _nchw(ours), theirs.numpy(), rtol=1e-4, atol=1e-5,
            err_msg=f"cate_preds[{lvl}]")
    for lvl, (ours, theirs) in enumerate(zip(preds["kernel_preds"],
                                             t_kernel)):
        np.testing.assert_allclose(
            _nchw(ours), theirs.numpy(), rtol=1e-4, atol=1e-5,
            err_msg=f"kernel_preds[{lvl}]")

    # ---- post-processed parity (eval branch) ----
    # Random-init cate scores sit near the focal prior pi=0.01, below the
    # preset score_thr=0.1; pick a threshold admitting ~150 candidates so
    # the whole pipeline (area filter, maskness, matrix-NMS, top-k) runs.
    with torch.no_grad():
        flat_scores = []
        for cp in t_cate:
            s = torch.sigmoid(cp)
            import torch.nn.functional as TF
            peaks = TF.max_pool2d(s, (2, 2), stride=1, padding=1)
            s = s * (peaks[:, :, :-1, :-1] == s).float()  # ref nms.py:8-12
            flat_scores.append(s.flatten())
        flat_scores = torch.cat(flat_scores).numpy()
    thr = float(np.quantile(flat_scores, 1 - 150 / flat_scores.size))

    # The reference copies thresholds into attributes at __init__
    # (planerecnet.py:45-52), so set them on the net directly.
    net.score_threshold = thr
    net.update_threshold = 1e-6
    net.eval()
    with torch.no_grad():
        ref_results = net(tx)
    ref_res = ref_results[0]

    cfg2 = cfg.copy(dict(solov2=cfg.solov2.copy(dict(
        score_thr=thr, update_thr=1e-6))))
    out = postprocess_batch(
        jax.tree.map(jnp.asarray, preds), cfg2, (H, W))

    valid = np.asarray(out["pred_valid"][0])
    n_ours = int(valid.sum())
    assert ref_res["pred_scores"] is not None, "reference produced nothing"
    n_ref = int(ref_res["pred_scores"].shape[0])
    assert n_ours == n_ref, (n_ours, n_ref)

    np.testing.assert_allclose(
        np.asarray(out["pred_scores"][0])[:n_ref],
        ref_res["pred_scores"].numpy(), rtol=1e-3, atol=1e-4,
        err_msg="pred_scores")
    np.testing.assert_array_equal(
        np.asarray(out["pred_classes"][0])[:n_ref],
        ref_res["pred_classes"].numpy())

    ours_masks = np.asarray(out["pred_masks"][0])[:n_ref]
    ref_masks = ref_res["pred_masks"].numpy()
    inter = np.logical_and(ours_masks, ref_masks).sum(axis=(1, 2))
    union = np.logical_or(ours_masks, ref_masks).sum(axis=(1, 2))
    iou = inter / np.maximum(union, 1)
    assert (iou > 0.995).all(), iou.min()

    np.testing.assert_allclose(
        np.asarray(out["pred_boxes"][0])[:n_ref],
        ref_res["pred_boxes"].numpy(), atol=2.0, err_msg="pred_boxes")

    np.testing.assert_allclose(
        np.asarray(out["pred_depth"][0]),
        ref_res["pred_depth"].numpy()[0, 0], rtol=1e-3, atol=1e-3,
        err_msg="pred_depth")


@pytest.mark.parametrize("family,t_momentum,eps", [
    ("backbone", 0.1, 1e-5),        # reference backbone BN defaults
    ("depth_decoder", 0.01, 1e-3),  # reference planerecnet.py:515-538
])
def test_train_mode_bn_running_stats(family, t_momentum, eps):
    """One TRAIN-mode step's running statistics pin against torch for both
    BN families, including torch's UNBIASED batch-variance convention for
    the running_var update (torch normalises with the biased variance but
    stores var * n/(n-1); flax.linen.BatchNorm stores the biased one —
    models/layers.py::TorchBatchNorm carries the correction)."""
    from planerecnet_tpu.models.layers import TorchBatchNorm

    rng = np.random.RandomState(7)
    c = 6
    x = rng.randn(2, 4, 5, c).astype(np.float32) * 3 + 1.5  # NHWC

    tbn = torch.nn.BatchNorm2d(c, eps=eps, momentum=t_momentum)
    tbn.train()
    with torch.no_grad():
        tbn.running_mean.normal_()
        tbn.running_var.uniform_(0.5, 2.0)
        tbn.weight.normal_()
        tbn.bias.normal_()
        rm0 = tbn.running_mean.numpy().copy()
        rv0 = tbn.running_var.numpy().copy()
        w0 = tbn.weight.numpy().copy()
        b0 = tbn.bias.numpy().copy()
        want_y = tbn(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)))).numpy()
        want_rm = tbn.running_mean.numpy()
        want_rv = tbn.running_var.numpy()

    m = TorchBatchNorm(use_running_average=False,
                       momentum=1.0 - t_momentum, epsilon=eps)
    variables = {
        "params": {"scale": jnp.asarray(w0), "bias": jnp.asarray(b0)},
        "batch_stats": {"mean": jnp.asarray(rm0), "var": jnp.asarray(rv0)},
    }
    y, mutated = m.apply(variables, jnp.asarray(x),
                         mutable=["batch_stats"])

    np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 3, 1, 2)),
                               want_y, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["mean"]),
                               want_rm, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["var"]),
                               want_rv, rtol=1e-5, atol=1e-6)

    # The biased (flax) convention would be visibly wrong at this n:
    n = x.size // c
    assert n / (n - 1) > 1.02  # the test has the power to catch it
