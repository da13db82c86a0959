"""Model forward shape tests + post-processing smoke (CPU, small inputs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from planerecnet_tpu.config import (PlaneRecNet_50_config,
                                    PlaneRecNet_base_config)
from planerecnet_tpu.models import PlaneRecNet
from planerecnet_tpu.ops.postprocess import postprocess_batch


# Small test config: tiny grids, same structure.
TINY = PlaneRecNet_50_config.copy(dict(
    solov2=PlaneRecNet_50_config.solov2.copy(dict(
        num_grids=(10, 9, 6, 4),
        max_candidates=64,
        nms_pre=64,
        top_k=16,
    )),
))


@pytest.fixture(scope="module")
def tiny_model():
    model = PlaneRecNet(TINY)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


def test_forward_shapes(tiny_model):
    model, variables = tiny_model
    x = jnp.ones((2, 64, 64, 3), jnp.float32)
    preds = model.apply(variables, x)
    grids = TINY.solov2.num_grids
    assert [p.shape for p in preds["cate_preds"]] == [
        (2, s, s, 2) for s in grids]
    assert [p.shape for p in preds["kernel_preds"]] == [
        (2, s, s, 128) for s in grids]
    assert preds["mask_pred"].shape == (2, 16, 16, 128)
    assert preds["depth_pred"].shape == (2, 32, 32, 1)
    assert np.all(np.asarray(preds["depth_pred"]) >= 0)  # softplus


def test_train_mode_runs(tiny_model):
    model, variables = tiny_model
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    preds, mutated = model.apply(variables, x, train=True,
                                 mutable=["batch_stats"])
    assert "batch_stats" in mutated


def test_postprocess_shapes(tiny_model):
    model, variables = tiny_model
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    preds = model.apply(variables, x)
    out = postprocess_batch(preds, TINY, (64, 64))
    k = TINY.solov2.top_k
    assert out["pred_masks"].shape == (2, k, 64, 64)
    assert out["pred_scores"].shape == (2, k)
    assert out["pred_classes"].shape == (2, k)
    assert out["pred_boxes"].shape == (2, k, 4)
    assert out["pred_valid"].shape == (2, k)
    assert out["pred_depth"].shape == (2, 64, 64)
    # invalid slots are zeroed
    valid = np.asarray(out["pred_valid"])
    scores = np.asarray(out["pred_scores"])
    assert (scores[~valid] == 0).all()


def test_backbone_dcn_plan():
    """DCN insertion flags replicate reference backbone.py:170,184."""
    from planerecnet_tpu.models.backbone import _stage_plan
    # ResNet50-DCNv2: dcn_layers=[0,4,6,3]
    plan = _stage_plan((3, 4, 6, 3), (0, 4, 6, 3), 1)
    assert plan[0][4] == (False, False, False)
    assert plan[1][4] == (True, True, True, True)
    assert plan[2][4] == (True, True, True, True, True, True)
    assert plan[3][4] == (True, True, True)
    # ResNet101-DCN-interval3: dcn_layers=[0,4,23,3], interval 3
    plan = _stage_plan((3, 4, 23, 3), (0, 4, 23, 3), 3)
    assert plan[1][4] == (True, False, False, True)
    # stage 3: first block True, then i%3==0
    assert plan[2][4][0] is True
    assert sum(plan[2][4]) == 1 + len([i for i in range(1, 23) if i % 3 == 0])
    assert plan[3][4] == (True, False, False)


def test_use_dcn_in_instance_builds_deformable_towers():
    """use_dcn_in_instance=True builds DCNv2 tower convs in the instance
    head. NB the reference's own plumbing for this flag is dead code
    (reference planerecnet.py:324 unpacks ``use_deformable``, line 326
    hard-codes ``conv_func = nn.Conv2d``); we implement the *intended*
    semantics and keep the default-False path byte-identical."""
    cfg = TINY.copy(dict(solov2=TINY.solov2.copy(dict(
        use_dcn_in_instance=True))))
    model = PlaneRecNet(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    head = variables["params"]["inst_head"]
    dcn_convs = [k for k, v in head.items()
                 if k.endswith("_conv") and isinstance(v, dict)
                 and "offset_conv" in v]
    # 3 tower convs per shared cate/kernel tower (PRN-50 light config)
    assert len(dcn_convs) == 2 * TINY.solov2.num_instance_convs

    preds = model.apply(variables, x)
    assert len(preds["cate_preds"]) == 4

    # default-False structure stays plain (no offset convs anywhere in head)
    plain = PlaneRecNet(TINY)
    v2 = plain.init(jax.random.PRNGKey(0), x)
    assert not any("offset_conv" in v for v in
                   v2["params"]["inst_head"].values()
                   if isinstance(v, dict))


def test_fpn_high_level_original():
    """Base config appends p6 via stride-2 subsample (reference fpn.py:66)."""
    model = PlaneRecNet(PlaneRecNet_base_config.copy(dict(
        solov2=PlaneRecNet_base_config.solov2.copy(dict(
            num_grids=(10, 9, 6, 4, 3), max_candidates=64, nms_pre=64,
            top_k=8)))))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    preds = model.apply(variables, x)
    # The base config lists 5 instance features (p2..p6) but the reference's
    # split_feats (planerecnet.py:113-118) always returns exactly 4 levels —
    # p6 exists in the pyramid yet is never consumed by the instance head.
    assert len(preds["cate_preds"]) == 4
