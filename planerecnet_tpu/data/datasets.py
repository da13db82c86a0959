"""COCO-format plane datasets and the fixed-capacity TPU batcher.

Re-implements reference data/datasets.py:21-316: COCO-json annotations
extended with ``plane_paras`` and camera intrinsics, per-dataset path
conventions (ScanNet / NYU / Stanford-2D3DS), 16-bit depth PNG loading with
``depth_resolution`` scaling, and empty-GT resampling.

TPU divergence: instead of the reference's variable-length list collate
(``detection_collate``, datasets.py:250-273), instances are padded to
``cfg.max_instances`` with a validity mask so a whole batch is one dict of
fixed-shape arrays — the shape the jitted train step consumes.
"""

from __future__ import annotations

import json
import os
import os.path as osp
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from planerecnet_tpu.config import PlaneRecNetConfig
from planerecnet_tpu.data.coco import COCO


def get_label_map(cfg: PlaneRecNetConfig) -> Dict[int, int]:
    """category_id -> label map (reference data/datasets.py:15-19)."""
    lm = cfg.dataset.label_map
    if lm is None:
        return {x + 1: x + 1
                for x in range(len(cfg.dataset.class_names))}
    return dict(lm)


class PlaneAnnoDataset:
    """Base reader: RGB image + 16-bit depth PNG + COCO instance anns with
    plane parameters and intrinsics (reference datasets.py:21-117)."""

    def __init__(self, cfg: PlaneRecNetConfig, image_path: str,
                 anno_file: str, transform=None, dataset_name: str = None,
                 has_gt: bool = True, has_pos: bool = True):
        self.cfg = cfg
        self.root = image_path
        self.coco = COCO(anno_file)
        self.ids = list(self.coco.imgToAnns.keys())
        if len(self.ids) == 0 or not has_gt:
            self.ids = list(self.coco.imgs.keys())
        self.transform = transform
        self.name = dataset_name
        self.has_gt = has_gt
        self.has_pos = has_pos

    def __len__(self) -> int:
        return len(self.ids)

    def __getitem__(self, index: int):
        return self.pull_item(index)

    def pull_image(self, index: int) -> np.ndarray:
        """Original BGR image (reference datasets.py:126-132)."""
        img_id = self.ids[index]
        path = self.coco.loadImgs(img_id)[0]["file_name"]
        return cv2.imread(osp.join(self.root, path), cv2.IMREAD_COLOR)

    def pull_depth(self, index: int) -> np.ndarray:
        """Original uint16 depth map (reference datasets.py:134-144)."""
        img_id = self.ids[index]
        img_path = self.coco.loadImgs(img_id)[0]["file_name"]
        return cv2.imread(self.get_depth_path(img_path), cv2.IMREAD_ANYDEPTH)

    def pull_anno(self, index: int):
        """Original annotations (reference datasets.py:147-157)."""
        img_id = self.ids[index]
        return self.coco.loadAnns(self.coco.getAnnIds(imgIds=img_id))

    # -- path conventions overridden per dataset --
    def get_depth_path(self, rgb_file_name: str) -> str:
        raise NotImplementedError

    def get_camera_matrix(self, rgb_file_name: str) -> np.ndarray:
        raise NotImplementedError

    def get_plane_para(self, target: List[Dict]) -> List[List[float]]:
        return [[obj["plane_paras"][i] for i in range(4)] for obj in target]

    def pull_item(self, index: int):
        """Returns (HWC float image, instances dict, HxWx1 depth in metres)
        (reference datasets.py:52-117, channel-last instead of CHW)."""
        cfg = self.cfg
        img_id = self.ids[index]
        if self.has_gt:
            target = [a for a in self.coco.loadAnns(
                self.coco.getAnnIds(imgIds=img_id))
                if a["image_id"] == img_id]
        else:
            target = []
        file_name = self.coco.loadImgs(img_id)[0]["file_name"]
        path = osp.join(self.root, file_name)
        assert osp.exists(path), f"Image path does not exist: {path}"
        img = cv2.imread(path).astype(np.float32)
        height, width, _ = img.shape

        depth = cv2.imread(self.get_depth_path(file_name),
                           cv2.IMREAD_UNCHANGED).astype(np.float32)

        if self.has_pos:
            k_matrix = self.get_camera_matrix(file_name)
            s = cfg.dataset.scale_factor
            scale = np.asarray([[s, 0, s], [0, s, s], [0, 0, 1]])
            k_matrix = scale * k_matrix
        else:
            k_matrix = np.zeros((3, 3))

        masks = boxes = labels = plane_paras = None
        if len(target) > 0:
            masks = np.stack([self.coco.annToMask(o) for o in target]
                             ).reshape(-1, height, width)
            boxes = np.array([[o["bbox"][0], o["bbox"][1],
                               o["bbox"][0] + o["bbox"][2],
                               o["bbox"][1] + o["bbox"][3]] for o in target],
                             np.float32)
            lm = get_label_map(cfg)
            labels = np.array([lm[o["category_id"]] - 1 for o in target])
            if cfg.dataset.has_pos:
                plane_paras = np.array(self.get_plane_para(target),
                                       np.float32)
            else:
                plane_paras = np.zeros((len(target), 4), np.float32)

        if self.transform is not None and len(target) > 0:
            img, depth, masks, boxes, labels, plane_paras = self.transform(
                img, depth, masks, boxes, labels, plane_paras)

        if masks is None or len(masks) == 0:
            # Empty-GT resample (reference datasets.py:112-115).
            return self.pull_item(np.random.randint(0, len(self.ids)))

        instances = {
            "masks": masks.astype(np.float32),
            "boxes": boxes.astype(np.float32),
            "classes": labels.astype(np.int32),
            "plane_paras": plane_paras.astype(np.float32),
            "k_matrix": k_matrix.astype(np.float32),
        }
        depth_m = depth[..., None] * (cfg.dataset.depth_resolution or 1.0)
        # Keep the transform's dtype: SSDAugmentation(device_normalize=True)
        # emits u8 wire images (normalisation happens on device).
        if img.dtype != np.uint8:
            img = img.astype(np.float32)
        return img, instances, depth_m.astype(np.float32)


class ScanNetDataset(PlaneAnnoDataset):
    """ScanNet path conventions (reference datasets.py:181-207)."""

    def get_depth_path(self, rgb_file_name: str) -> str:
        name = rgb_file_name.replace("color", "depth").replace(".jpg", ".png")
        return osp.join(self.root, name)

    def get_camera_matrix(self, rgb_file_name: str) -> np.ndarray:
        sens = rgb_file_name.split("/")[0]
        pose_path = os.path.join(self.root, sens, "frame", "intrinsic",
                                 sens + ".txt")
        with open(pose_path) as f:
            lines = f.readlines()
        words = lines[9].split(" ")
        return np.asarray([float(words[i]) for i in range(2, 18)]
                          ).reshape(4, 4)[:3, :3]


class NYUDataset(PlaneAnnoDataset):
    """NYU depth path convention (reference datasets.py:210-220)."""

    def get_depth_path(self, rgb_file_name: str) -> str:
        root = self.root.replace("images", "depths")
        return osp.join(root, rgb_file_name.replace(".jpg", ".png"))


class S2D3DSDataset(PlaneAnnoDataset):
    """Stanford 2D-3D-S conventions (reference datasets.py:223-247)."""

    def get_depth_path(self, rgb_file_name: str) -> str:
        root = self.root.replace("images", "depths")
        name = rgb_file_name.replace("rgb", "depth").replace(".jpg", ".png")
        return osp.join(root, name)

    def get_camera_matrix(self, rgb_file_name: str) -> np.ndarray:
        root = self.root.replace("images_val", "poses").replace(
            "images", "poses")
        name = rgb_file_name.replace("rgb", "pose").replace(".jpg", ".json")
        with open(os.path.join(root, name)) as f:
            pose = json.load(f)
        return np.asarray(pose["camera_k_matrix"])

    def get_plane_para(self, target: List[Dict]) -> List[List[float]]:
        return [[o["plane_paras"][i] for i in range(6)] for o in target]


DATASET_CLASSES = {
    "PlaneAnnoDataset": PlaneAnnoDataset,
    "ScanNetDataset": ScanNetDataset,
    "NYUDataset": NYUDataset,
    "S2D3DSDataset": S2D3DSDataset,
}


def build_dataset(cfg: PlaneRecNetConfig, split: str = "train",
                  transform=None) -> PlaneAnnoDataset:
    """Registry-based constructor replacing the reference's
    ``eval(cfg.dataset.name)`` (reference train.py:220-222)."""
    d = cfg.dataset
    paths = {
        "train": (d.train_images, d.train_info),
        "valid": (d.valid_images, d.valid_info),
        "eval": (d.eval_images, d.eval_info),
    }[split]
    cls = DATASET_CLASSES[d.name]
    return cls(cfg, paths[0], paths[1], transform=transform,
               dataset_name=d.name, has_gt=d.has_gt, has_pos=d.has_pos)


def pad_instances(cfg: PlaneRecNetConfig, instances: Dict,
                  img_hw: Tuple[int, int]) -> Dict[str, np.ndarray]:
    """Pad one image's instance dict to ``cfg.max_instances`` slots with a
    validity mask (the TPU replacement for variable-length GT lists)."""
    n_cap = cfg.max_instances
    h, w = img_hw
    n = min(len(instances["classes"]), n_cap)
    out = {
        # Binary masks cross the host->device boundary as uint8: the padded
        # (N_cap, H, W) f32 form dominated the per-step transfer (~210 MB
        # vs ~52 MB per batch-8 640^2 step); the loss stack casts on device.
        # The float->uint8 assignment TRUNCATES fractional resize-edge
        # values — exactly the reference's ``gt_masks.to(torch.uint8)``
        # before its 1/4 rescale (reference losses.py:243). Divergence:
        # the reference computes center_of_mass on the pre-truncation float
        # masks (losses.py:239); here it sees the truncated mask — a
        # sub-pixel shift that only matters if it crosses a grid-cell edge.
        "masks": np.zeros((n_cap, h, w), np.uint8),
        "boxes": np.zeros((n_cap, 4), np.float32),
        "classes": np.zeros((n_cap,), np.int32),
        "plane_paras": np.zeros((n_cap, max(
            4, instances["plane_paras"].shape[-1]
            if instances["plane_paras"].ndim == 2 else 4)), np.float32),
        "gt_valid": np.zeros((n_cap,), bool),
        "k_matrix": instances["k_matrix"].astype(np.float32),
    }
    if n:
        out["masks"][:n] = instances["masks"][:n]
        out["boxes"][:n] = instances["boxes"][:n]
        out["classes"][:n] = instances["classes"][:n]
        if instances["plane_paras"].ndim == 2 and instances["plane_paras"].size:
            pp = instances["plane_paras"][:n]
            out["plane_paras"][:n, :pp.shape[1]] = pp
        out["gt_valid"][:n] = True
    return out


def collate_batch(cfg: PlaneRecNetConfig, samples: List,
                  stats: Optional[Dict[str, int]] = None,
                  sparse_masks: Optional[bool] = None
                  ) -> Dict[str, np.ndarray]:
    """Stack padded samples into the fixed-shape WIRE batch dict; the
    trainer's ``unpack_wire_batch`` restores the dense form on device
    before ``compute_losses`` (replaces reference detection_collate,
    datasets.py:250-273).

    Wire format (host->device transfer is the sustained-throughput
    bottleneck on a remote-attached chip — measured ~30 MB/s through this
    deployment's tunnel, PERF.md round 4):
      * ``masks_sparse`` + ``mask_slots`` (default, ``cfg.wire_sparse_masks``):
        only the VALID instance slots' bit-packed masks, as a (M16, H,
        ceil(W/8)) u8 row array plus an int32 vector mapping row -> flat
        (image, slot) index; M16 = n_valid rounded up to a multiple of 16
        (bounds the jit-shape count of the device-side scatter,
        ``trainer.densify_sparse_masks``, to <= B*max_instances/16
        variants of a trivial program). Padding rows carry the
        out-of-range slot ``B * max_instances`` and are dropped by the
        scatter. ~5x fewer mask bytes at the ~6-planes-per-scene ScanNet
        regime.
      * ``masks_packed`` (``sparse_masks=False``): all ``max_instances``
        slots, binary GT masks bit-packed along W (``np.packbits``) — 8x
        smaller than the u8 dense form, 32x smaller than f32; device
        unpack is a shift-and-mask. Multi-host runs use this form (every
        process must feed the SAME shapes into
        ``make_array_from_process_local_data``; per-batch valid counts
        differ across shards).
      * ``depth_q``: u16 depth in ``depth_resolution`` units — LOSSLESS
        for datasets read from 16-bit PNGs at that resolution (ScanNet
        convention); augmentation-interpolated values round to half a
        unit (0.5 mm).
      * ``image``: u8 BGR when the transform defers normalisation to the
        device (SSDAugmentation), f32 otherwise (eval transforms).
    """
    imgs, insts, depths = zip(*samples)
    h, w = imgs[0].shape[:2]
    padded = [pad_instances(cfg, i, (h, w)) for i in insts]
    if stats is not None:
        # Training-side GT truncation is OBSERVABLE, not silent (the eval
        # pipeline surfaces its analogue as ``candidates_clipped``):
        # instances beyond max_instances are dropped by pad_instances, and
        # planes beyond vnl_max_planes never reach the VNL sampler
        # (losses/vnl.py valid-first compaction). ScanNet frames can
        # legitimately exceed both caps.
        for i in insts:
            n = len(i["classes"])
            stats["instances_dropped"] = stats.get(
                "instances_dropped", 0) + max(0, n - cfg.max_instances)
            if cfg.use_plane_loss:
                stats["vnl_planes_dropped"] = stats.get(
                    "vnl_planes_dropped", 0) + max(
                        0, min(n, cfg.max_instances) - cfg.vnl_max_planes)
    depth = np.stack(depths)
    res = cfg.dataset.depth_resolution or 1e-3
    batch = {
        "image": np.stack(imgs),
        "depth_q": np.clip(np.round(depth / res), 0, 65535).astype(
            np.uint16),
    }
    if sparse_masks is None:
        sparse_masks = getattr(cfg, "wire_sparse_masks", True)
    if sparse_masks:
        n_cap = cfg.max_instances
        rows, slots = [], []
        for bi, p in enumerate(padded):
            n = int(p["gt_valid"].sum())
            if n:
                rows.append(np.packbits(p["masks"][:n], axis=-1))
                slots.extend(range(bi * n_cap, bi * n_cap + n))
        m = len(slots)
        m16 = max(16, -(-m // 16) * 16)
        w8 = -(-w // 8)
        masks_sparse = np.zeros((m16, h, w8), np.uint8)
        if m:
            masks_sparse[:m] = np.concatenate(rows, axis=0)
        mask_slots = np.full((m16,), len(padded) * n_cap, np.int32)
        mask_slots[:m] = slots
        batch["masks_sparse"] = masks_sparse
        batch["mask_slots"] = mask_slots
    else:
        masks = np.stack([p["masks"] for p in padded])
        batch["masks_packed"] = np.packbits(masks, axis=-1)
    for key in ("boxes", "classes", "plane_paras", "gt_valid",
                "k_matrix"):
        batch[key] = np.stack([p[key] for p in padded])
    # The loss consumes 4-vector plane params (normal + offset); S2D3DS
    # stores 6 values, of which the first 4 are used (reference
    # losses.py:157-160 takes [:, :3] and [:, 3]).
    batch["plane_paras"] = batch["plane_paras"][:, :, :4]
    return batch


def enforce_size(cfg: PlaneRecNetConfig, img: np.ndarray,
                 depth: np.ndarray, instances: Dict, new_w: int,
                 new_h: int):
    """Aspect-preserving resize + top-left zero pad to (new_h, new_w)
    (reference data/datasets.py:276-316, numpy/cv2 instead of torch)."""
    h, w = img.shape[:2]
    if h == new_h and w == new_w:
        return img, depth, instances

    w_prime = new_w
    h_prime = h * new_w / w
    if h_prime > new_h:
        w_prime *= new_h / h_prime
        h_prime = new_h
    w_prime, h_prime = int(w_prime), int(h_prime)

    img = cv2.resize(img, (w_prime, h_prime), interpolation=cv2.INTER_LINEAR)
    depth = cv2.resize(depth, (w_prime, h_prime),
                       interpolation=cv2.INTER_LINEAR)
    masks = instances["masks"]
    if masks.size:
        m = cv2.resize(masks.transpose(1, 2, 0), (w_prime, h_prime),
                       interpolation=cv2.INTER_LINEAR)
        masks = m[None] if m.ndim == 2 else m.transpose(2, 0, 1)

    boxes = instances["boxes"].copy()
    boxes[:, [0, 2]] *= w_prime / new_w
    boxes[:, [1, 3]] *= h_prime / new_h

    def pad2(x, tgt_h, tgt_w):
        out = np.zeros(x.shape[:-2] + (tgt_h, tgt_w) if x.ndim == 3
                       else (tgt_h, tgt_w) + x.shape[2:], x.dtype)
        if x.ndim == 3:
            out[:, :x.shape[1], :x.shape[2]] = x
        else:
            out[:x.shape[0], :x.shape[1], ...] = x
        return out

    img_p = np.zeros((new_h, new_w) + img.shape[2:], img.dtype)
    img_p[:h_prime, :w_prime] = img
    depth_p = np.zeros((new_h, new_w) + depth.shape[2:], depth.dtype)
    depth_p[:h_prime, :w_prime] = depth
    masks_p = np.zeros((masks.shape[0], new_h, new_w), masks.dtype)
    if masks.size:
        masks_p[:, :h_prime, :w_prime] = masks

    out = dict(instances)
    out["masks"] = masks_p
    out["boxes"] = boxes
    return img_p, depth_p, out


class PrefetchIterator:
    """Background-thread prefetcher: overlaps host-side loading/augmentation
    (and optional ``jax.device_put``) with device compute.

    The TPU equivalent of the reference's ``DataLoader(num_workers=2,
    pin_memory=True)`` (train.py:290-293): while the jitted step runs on
    device, the next batch is decoded, augmented, collated and shipped.
    """

    def __init__(self, iterable, buffer_size: int = 2,
                 to_device: bool = True):
        self.iterable = iterable
        self.buffer_size = buffer_size
        self.to_device = to_device
        # Occupancy probe (sustained-throughput studies, PERF.md round 4):
        # sampled at every consumer get; occupancy ~0 means the device waits
        # on the host loader, ~buffer_size means the loader keeps up.
        self.occupancy_sum = 0
        self.occupancy_n = 0

    def mean_occupancy(self) -> float:
        return self.occupancy_sum / max(self.occupancy_n, 1)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.buffer_size)
        sentinel = object()

        def worker():
            try:
                for item in self.iterable:
                    if self.to_device:
                        import jax
                        item = jax.device_put(item)
                    q.put(item)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            self.occupancy_sum += q.qsize()
            self.occupancy_n += 1
            item = q.get()
            if item is sentinel:
                return
            yield item


class BatchIterator:
    """Shuffled epoch iterator yielding fixed-shape batches.

    Multi-host sharding (SURVEY.md §5 distributed growth path): with
    ``num_shards > 1`` every process draws the SAME seeded permutation but
    loads only its ``shard_index``-th slice of each global batch, so the
    per-process batches are disjoint and together form the global batch —
    no host ever loads (or feeds) data owned by another process.
    ``batch_size`` stays the GLOBAL batch size; the yielded batch has
    ``batch_size // num_shards`` rows.
    """

    def __init__(self, cfg: PlaneRecNetConfig, dataset: PlaneAnnoDataset,
                 batch_size: int, seed: int = 0, drop_last: bool = True,
                 shard_index: int = 0, num_shards: int = 1):
        if batch_size % num_shards != 0:
            raise ValueError(
                f"global batch size {batch_size} not divisible by "
                f"{num_shards} processes")
        self.cfg = cfg
        self.dataset = dataset
        self.batch_size = batch_size
        self.rng = np.random.RandomState(seed)
        self.drop_last = drop_last
        self.shard_index = shard_index
        self.num_shards = num_shards
        # GT-truncation counters, accumulated across epochs by
        # collate_batch; train.py reports and resets them per epoch.
        self.truncation_stats: Dict[str, int] = {}

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self.rng.permutation(len(self.dataset))
        per_shard = self.batch_size // self.num_shards
        for i in range(0, len(order), self.batch_size):
            idx = order[i:i + self.batch_size]
            # A short tail batch is always dropped when sharding: a partial
            # global batch would give processes empty/unequal shards and
            # desynchronise their step counts.
            if len(idx) < self.batch_size and (
                    self.drop_last or self.num_shards > 1):
                return
            lo = self.shard_index * per_shard
            samples = [self.dataset[j] for j in idx[lo:lo + per_shard]]
            # Sparse mask rows have a data-dependent count — multi-host
            # runs need shape-uniform per-process shards, so they fall
            # back to the all-slots wire (see collate_batch docstring).
            yield collate_batch(
                self.cfg, samples, stats=self.truncation_stats,
                sparse_masks=(getattr(self.cfg, "wire_sparse_masks", True)
                              and self.num_shards == 1))
