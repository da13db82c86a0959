"""Data pipeline tests: COCO reader/RLE codec, augmentations, dataset loading
from a synthetic on-disk ScanNet-style dataset, fixed-capacity collate."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from planerecnet_tpu.config import PlaneRecNet_50_config
from planerecnet_tpu.data import (BatchIterator, COCO, BaseTransform,
                                  SSDAugmentation, build_dataset,
                                  collate_batch, mask_to_rle, rle_to_mask)
from planerecnet_tpu.data.augmentations import (random_mirror, resize_square)


def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    mask = (rng.rand(23, 17) > 0.6).astype(np.uint8)
    rle = mask_to_rle(mask)
    back = rle_to_mask(rle)
    np.testing.assert_array_equal(mask, back)


def test_compressed_rle_known_value():
    """LEB128-ish COCO counts string decode: round-trip a simple case built
    by hand. counts [2, 3, 1] over a 2x3 (h=2,w=3) grid, column-major."""
    # flat(F-order) = [0,0,1,1,1,0]; element (r,c) sits at index c*h+r.
    rle = {"size": [2, 3], "counts": [2, 3, 1]}
    m = rle_to_mask(rle)
    want = np.array([[0, 1, 1], [0, 1, 0]])
    np.testing.assert_array_equal(m, want)


def _write_synthetic_scannet(root):
    scene = "scene0000_00"
    color_dir = os.path.join(root, scene, "color")
    depth_dir = os.path.join(root, scene, "depth")
    intr_dir = os.path.join(root, scene, "frame", "intrinsic")
    os.makedirs(color_dir)
    os.makedirs(depth_dir)
    os.makedirs(intr_dir)

    rng = np.random.RandomState(0)
    h, w = 96, 128
    images, annotations = [], []
    for i in range(3):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(color_dir, f"{i}.jpg"), img)
        depth = (rng.rand(h, w) * 3000 + 500).astype(np.uint16)
        cv2.imwrite(os.path.join(depth_dir, f"{i}.png"), depth)
        images.append({"id": i, "file_name": f"{scene}/color/{i}.jpg",
                       "height": h, "width": w})
        mask = np.zeros((h, w), np.uint8)
        y0, x0 = 10 + i * 5, 20
        mask[y0:y0 + 40, x0:x0 + 60] = 1
        from planerecnet_tpu.data import mask_to_rle
        annotations.append({
            "id": i + 1, "image_id": i, "category_id": 1,
            "segmentation": mask_to_rle(mask),
            "bbox": [x0, y0, 60, 40], "area": 2400, "iscrowd": 0,
            "plane_paras": [0.0, 0.0, 1.0, 2.0],
        })

    # intrinsics txt: line 10 (index 9) holds 16 values at words[2:18]
    lines = ["x\n"] * 9
    k = ["K", "=", "500", "0", "64", "0", "0", "500", "48", "0",
         "0", "0", "1", "0", "0", "0", "0", "1"]
    lines.append(" ".join(k) + "\n")
    with open(os.path.join(intr_dir, scene + ".txt"), "w") as f:
        f.writelines(lines)

    anno = {"images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "plane"}]}
    anno_path = os.path.join(root, "train.json")
    with open(anno_path, "w") as f:
        json.dump(anno, f)
    return anno_path


@pytest.fixture
def scannet_root(tmp_path):
    root = str(tmp_path / "scans")
    os.makedirs(root)
    anno = _write_synthetic_scannet(root)
    return root, anno


def _cfg_for(root, anno, max_size=64):
    cfg = PlaneRecNet_50_config
    return cfg.copy(dict(
        max_size=max_size, max_instances=4,
        dataset=cfg.dataset.copy(dict(
            train_images=root + "/", train_info=anno)),
    ))


def test_dataset_pull_item(scannet_root):
    root, anno = scannet_root
    cfg = _cfg_for(root, anno)
    ds = build_dataset(cfg, "train", transform=BaseTransform(cfg))
    img, inst, depth = ds[0]
    assert img.shape == (64, 64, 3)
    assert depth.shape == (64, 64, 1)
    # depth png values were ~500-3500 mm -> metres via depth_resolution 1e-3
    assert 0.4 < depth.mean() < 3.6
    assert inst["masks"].shape[1:] == (64, 64)
    assert inst["k_matrix"].shape == (3, 3)
    assert inst["k_matrix"][0, 0] == 500.0
    assert inst["plane_paras"].shape[-1] == 4


def test_train_augmentation_and_collate(scannet_root):
    root, anno = scannet_root
    cfg = _cfg_for(root, anno)
    aug = SSDAugmentation(cfg, rng=np.random.RandomState(3))
    ds = build_dataset(cfg, "train", transform=aug)
    batch = next(iter(BatchIterator(cfg, ds, batch_size=2, seed=0)))
    # compact wire format (PERF.md round 4): u8 image, bit-packed masks,
    # u16 depth; unpack_wire_batch restores the dense contract on device
    assert batch["image"].shape == (2, 64, 64, 3)
    assert batch["image"].dtype == np.uint8
    assert batch["depth_q"].shape == (2, 64, 64, 1)
    assert batch["depth_q"].dtype == np.uint16
    # valid-slot mask wire (default): only valid rows ship, padded to a
    # multiple of 16; densify_sparse_masks restores (B, N_cap, H, W/8)
    assert batch["masks_sparse"].shape == (16, 64, 8)
    assert batch["mask_slots"].shape == (16,)
    assert batch["mask_slots"].max() == 2 * 4  # padding rows out-of-range
    assert batch["boxes"].shape == (2, 4, 4)
    assert batch["gt_valid"].shape == (2, 4)
    assert batch["plane_paras"].shape == (2, 4, 4)
    assert batch["k_matrix"].shape == (2, 3, 3)
    assert batch["gt_valid"].any()

    import jax
    from planerecnet_tpu.losses import compute_losses
    from planerecnet_tpu.trainer import unpack_wire_batch
    dense = unpack_wire_batch(cfg, batch)
    assert dense["image"].dtype == np.float32
    assert dense["depth"].shape == (2, 64, 64, 1)
    assert dense["masks"].shape == (2, 4, 64, 64)
    # masks stay binary after pack/unpack
    assert int(jax.numpy.max(dense["masks"])) <= 1
    batch = dense

    # feeds the loss end-to-end
    sv = cfg.solov2
    rng = np.random.RandomState(0)
    preds = {
        "cate_preds": [np.asarray(rng.randn(2, g, g, cfg.num_classes),
                                  np.float32)
                       for g in sv.num_grids[:4]],
        "kernel_preds": [np.asarray(rng.randn(2, g, g, sv.num_kernels),
                                    np.float32) * 0.1
                         for g in sv.num_grids[:4]],
        "mask_pred": np.asarray(rng.randn(2, 16, 16, sv.num_kernels),
                                np.float32) * 0.1,
        "depth_pred": np.asarray(rng.rand(2, 32, 32, 1), np.float32) + 0.5,
    }
    cfg2 = cfg.copy(dict(max_positives=32, vnl_samples=32))
    losses = compute_losses(cfg2, preds, batch, jax.random.PRNGKey(0))
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_sparse_mask_wire_bit_exact(scannet_root):
    """The valid-slot mask wire (masks_sparse + mask_slots) must densify
    to EXACTLY the all-slots masks_packed wire, on both the numpy path
    (pjit shard_args) and the jitted device scatter — including uneven
    valid counts, a zero-instance image, and a full-capacity image."""
    import jax.numpy as jnp
    from planerecnet_tpu.data import collate_batch
    from planerecnet_tpu.trainer import densify_sparse_masks
    root, anno = scannet_root
    cfg = _cfg_for(root, anno)
    n_cap, h, w = cfg.max_instances, 64, 64
    rng = np.random.RandomState(11)

    def sample(n_inst):
        img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        depth = rng.rand(h, w, 1).astype(np.float32) * 3
        inst = {
            "masks": (rng.rand(n_inst, h, w) > 0.7).astype(np.float32),
            "boxes": rng.rand(n_inst, 4).astype(np.float32) * w,
            "classes": np.zeros((n_inst,), np.int32),
            "plane_paras": rng.randn(n_inst, 4).astype(np.float32),
            "k_matrix": np.eye(3, dtype=np.float32) * 500,
        }
        return img, inst, depth

    samples = [sample(2), sample(0), sample(n_cap), sample(1)]
    dense = collate_batch(cfg, samples, sparse_masks=False)
    sparse = collate_batch(cfg, samples, sparse_masks=True)
    assert sparse["masks_sparse"].shape[0] == 16  # 7 valid -> one bucket
    assert "masks_packed" not in sparse

    out_np = densify_sparse_masks(cfg, dict(sparse))
    np.testing.assert_array_equal(out_np["masks_packed"],
                                  dense["masks_packed"])
    assert "masks_sparse" not in out_np

    on_dev = {k: jnp.asarray(v) for k, v in sparse.items()}
    out_dev = densify_sparse_masks(cfg, on_dev)
    np.testing.assert_array_equal(np.asarray(out_dev["masks_packed"]),
                                  dense["masks_packed"])

    # and the remaining wire keys are identical between the two forms
    for k in ("image", "depth_q", "boxes", "classes", "plane_paras",
              "gt_valid", "k_matrix"):
        np.testing.assert_array_equal(dense[k], sparse[k])


def test_mirror_flips_boxes_and_normals():
    rng_hit = np.random.RandomState(1)  # first randint(2) == 1 -> mirrors
    img = np.zeros((10, 20, 3), np.float32)
    depth = np.zeros((10, 20), np.float32)
    masks = np.zeros((1, 10, 20), np.float32)
    masks[0, 2:5, 3:8] = 1
    boxes = np.array([[3.0, 2.0, 8.0, 5.0]])
    planes = np.array([[1.0, 0.0, 0.0, 2.0]], np.float32)
    img2, depth2, masks2, boxes2, planes2 = random_mirror(
        img, depth, masks, boxes, planes, rng_hit)
    np.testing.assert_allclose(boxes2[0], [20 - 8, 2, 20 - 3, 5])
    np.testing.assert_allclose(planes2[0], [-1, 0, 0, 2])
    assert masks2[0, 2:5, 20 - 8:20 - 3].all()


def test_resize_and_pad_and_enforce_size():
    from planerecnet_tpu.data import Pad, ResizeAndPad, enforce_size

    cfg = PlaneRecNet_50_config.copy(dict(max_size=64))
    rng = np.random.RandomState(0)
    img = rng.rand(32, 48, 3).astype(np.float32) * 255
    depth = rng.rand(32, 48).astype(np.float32)
    masks = np.zeros((1, 32, 48), np.float32)
    masks[0, 8:24, 8:40] = 1
    boxes = np.array([[8.0, 8.0, 40.0, 24.0]], np.float32)
    labels = np.array([0])
    planes = np.zeros((1, 4), np.float32)

    out = ResizeAndPad(cfg)(img, depth, masks, boxes, labels, planes)
    img2, depth2, masks2, boxes2 = out[:4]
    assert img2.shape == (64, 64, 3)
    assert depth2.shape == (64, 64)
    assert masks2.shape[1:] == (64, 64)
    # aspect preserved: 32x48 -> 42x64; rows beyond 42 are mean fill
    assert np.allclose(img2[50, 50], np.asarray([103.94, 116.78, 123.68]),
                       atol=1e-3)

    img3, depth3, masks3, *_ = Pad(80, 70)(img, depth, masks, boxes, labels,
                                           planes)
    assert img3.shape == (70, 80, 3) and masks3.shape == (1, 70, 80)

    inst = {"masks": masks, "boxes": boxes.copy(), "classes": labels,
            "plane_paras": planes, "k_matrix": np.eye(3, dtype=np.float32)}
    img4, depth4, inst4 = enforce_size(cfg, img, depth, inst, 64, 64)
    assert img4.shape == (64, 64, 3)
    assert inst4["masks"].shape == (1, 64, 64)


def test_label_map_identity_when_none():
    from planerecnet_tpu.data.datasets import get_label_map

    cfg = PlaneRecNet_50_config
    cfg2 = cfg.copy(dict(dataset=cfg.dataset.copy(dict(label_map=None))))
    assert get_label_map(cfg2) == {1: 1}
    assert get_label_map(cfg) == {1: 1}


def test_prefetch_iterator():
    from planerecnet_tpu.data import PrefetchIterator

    src = [{"a": np.ones((2, 2)) * i} for i in range(5)]
    out = list(PrefetchIterator(src, buffer_size=2, to_device=False))
    assert len(out) == 5
    for i, item in enumerate(out):
        np.testing.assert_array_equal(item["a"], np.ones((2, 2)) * i)
    # re-iterable
    assert len(list(PrefetchIterator(src, to_device=False))) == 5


def test_batch_iterator_multihost_sharding(scannet_root):
    """Per-process shards are disjoint and reassemble the global batch
    (multi-host input sharding, SURVEY.md §5 distributed growth path)."""
    root, anno = scannet_root
    cfg = _cfg_for(root, anno)
    ds = build_dataset(cfg, "train", transform=BaseTransform(cfg))

    whole = next(iter(BatchIterator(cfg, ds, batch_size=2, seed=7)))
    shards = [next(iter(BatchIterator(cfg, ds, batch_size=2, seed=7,
                                      shard_index=i, num_shards=2)))
              for i in range(2)]
    assert shards[0]["image"].shape[0] == 1
    rebuilt = np.concatenate([s["image"] for s in shards], axis=0)
    np.testing.assert_array_equal(rebuilt, whole["image"])

    with pytest.raises(ValueError):
        BatchIterator(cfg, ds, batch_size=2, num_shards=4)


def test_batch_iterator_sharded_tail_always_dropped(scannet_root):
    """With num_shards > 1 a short tail batch is dropped even when
    drop_last=False: a partial global batch would give processes
    empty/unequal shards and desynchronise their step counts."""
    root, anno = scannet_root
    cfg = _cfg_for(root, anno)
    ds = build_dataset(cfg, "train", transform=BaseTransform(cfg))
    assert len(ds) == 3  # batch_size=2 -> one full batch + a 1-image tail

    # Unsharded, drop_last=False: the tail IS yielded (batch of 1).
    solo = list(BatchIterator(cfg, ds, batch_size=2, seed=3, drop_last=False))
    assert [b["image"].shape[0] for b in solo] == [2, 1]

    # Sharded: every process sees exactly the same (full) batch count.
    counts = []
    for i in range(2):
        batches = list(BatchIterator(cfg, ds, batch_size=2, seed=3,
                                     shard_index=i, num_shards=2,
                                     drop_last=False))
        assert all(b["image"].shape[0] == 1 for b in batches)
        counts.append(len(batches))
    assert counts == [1, 1]
