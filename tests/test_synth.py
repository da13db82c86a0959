"""Synthetic planar-scene generator tests (tools/synth_scenes.py).

Validates that the generated ScanNet-layout data is (a) consumable by the
standard dataset stack unchanged and (b) geometrically exact: depth
back-projected with the stored intrinsics lands on the annotated planes
(the reference's own dataset debug statistic, data/datasets.py:373-382).
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from planerecnet_tpu.config import PlaneRecNet_50_config
from planerecnet_tpu.data import build_dataset
from tools.synth_scenes import generate_dataset


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("synthws"))
    root = generate_dataset(out, n_train=2, n_val=0, n_eval=1,
                            h=120, w=160, seed=5, min_area=60,
                            progress=False)
    return root


def _cfg_for(root, split="train"):
    cfg = PlaneRecNet_50_config
    return cfg.copy(dict(dataset=cfg.dataset.copy(dict(
        train_images=os.path.join(root, "scans") + "/",
        train_info=os.path.join(root, "scannet_train.json"),
        eval_images=os.path.join(root, "scans") + "/",
        eval_info=os.path.join(root, "scannet_eval.json"),
    ))))


def test_loads_through_scannet_dataset(synth_root):
    cfg = _cfg_for(synth_root)
    ds = build_dataset(cfg, "train", transform=None)
    assert len(ds) == 2
    img, inst, depth = ds[0]
    h, w = img.shape[:2]
    assert (h, w) == (120, 160)
    assert depth.shape == (h, w, 1)
    assert inst["masks"].shape[0] == inst["boxes"].shape[0] \
        == inst["plane_paras"].shape[0] >= 3
    assert np.all(depth > 0.04), "closed room: every pixel has depth"
    # intrinsics parsed from the ScanNet-style txt
    k = inst["k_matrix"]
    assert k[0, 0] > 0 and abs(k[0, 2] - w / 2) < 1 and k[2, 2] == 1


def test_depth_lies_on_annotated_planes(synth_root):
    """Back-projected GT depth within each mask satisfies n·X = d to the
    mm-quantisation floor — the GT channels are mutually exact."""
    cfg = _cfg_for(synth_root)
    ds = build_dataset(cfg, "train", transform=None)
    for i in range(len(ds)):
        img, inst, depth = ds[i]
        h, w = depth.shape[:2]
        k_inv = np.linalg.inv(inst["k_matrix"])
        uu, vv = np.meshgrid(np.arange(w), np.arange(h))
        pts = (k_inv @ np.stack([uu.ravel(), vv.ravel(),
                                 np.ones(h * w)])) * depth.ravel()
        for j in range(inst["masks"].shape[0]):
            m = inst["masks"][j].reshape(-1).astype(bool)
            n = inst["plane_paras"][j, :3]
            d = inst["plane_paras"][j, 3]
            assert abs(np.linalg.norm(n) - 1) < 1e-5
            err = np.abs(n @ pts[:, m] - d).mean()
            assert err < 2e-3, f"img {i} plane {j}: {err}"


def test_masks_disjoint_and_boxes_tight(synth_root):
    cfg = _cfg_for(synth_root)
    ds = build_dataset(cfg, "train", transform=None)
    img, inst, depth = ds[0]
    masks = inst["masks"].astype(bool)
    assert np.all(masks.sum(0) <= 1), "plane masks are a partition"
    for j in range(masks.shape[0]):
        ys, xs = np.nonzero(masks[j])
        x0, y0, x1, y1 = inst["boxes"][j]
        assert x0 == xs.min() and y0 == ys.min()
        assert x1 == xs.max() + 1 and y1 == ys.max() + 1


def test_train_transform_chain_runs(synth_root):
    """The stock SSDAugmentation chain consumes the synthetic data."""
    from planerecnet_tpu.data import SSDAugmentation, collate_batch
    cfg = _cfg_for(synth_root).copy(dict(max_size=64))
    ds = build_dataset(cfg, "train",
                       transform=SSDAugmentation(
                           cfg, rng=np.random.RandomState(0)))
    batch = collate_batch(cfg, [ds[0], ds[1]])
    assert batch["image"].shape == (2, 64, 64, 3)
    assert batch["gt_valid"].any()
    assert np.isfinite(batch["depth_q"]).all()
