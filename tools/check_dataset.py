"""Dataset geometric-consistency checker.

Re-implements the reference's dataset debug harness
(reference data/datasets.py:319-386): iterates the loader and reports, per
image, the mean point-to-plane distance between GT plane parameters and the
GT-depth point cloud — an end-to-end sanity check of annotations,
intrinsics and depth scaling.

Usage: python tools/check_dataset.py --config PlaneRecNet_50_config \
           [--dataset scannet_dataset] [--split valid] [--max_images N]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Debugging datasets.")
    parser.add_argument("--dataset", default=None, type=str)
    parser.add_argument("--config", default="PlaneRecNet_50_config")
    parser.add_argument("--split", default="valid",
                        choices=["train", "valid", "eval"])
    parser.add_argument("--max_images", default=5000, type=int)
    args = parser.parse_args()

    import jax.numpy as jnp
    from planerecnet_tpu.config import set_cfg, set_dataset
    from planerecnet_tpu.data import SSDAugmentation, build_dataset
    from planerecnet_tpu.ops.geometry import (get_points_coordinate,
                                              point_to_plane_error)

    cfg = set_cfg(args.config)
    if args.dataset is not None:
        cfg = set_dataset(cfg, args.dataset)
    print(cfg.backbone.name, cfg.backbone.path)

    dataset = build_dataset(cfg, args.split, transform=SSDAugmentation(cfg))

    for idx in range(min(len(dataset), args.max_images)):
        img, inst, depth = dataset[idx]
        k = inst["k_matrix"]
        k_inv = np.linalg.inv(k)
        pts = get_points_coordinate(
            jnp.asarray(depth[None]), jnp.asarray(k_inv[None]))[0]

        masks = inst["masks"].astype(bool)
        normals = inst["plane_paras"][:, :3].astype(np.float64)
        offsets = inst["plane_paras"][:, 3].astype(np.float64)
        n = masks.shape[0]
        print(f"gt masks: {masks.shape}, gt planes: "
              f"{inst['plane_paras'].shape}")
        error = 0.0
        for j in range(n):
            error += float(point_to_plane_error(
                pts, jnp.asarray(masks[j]), jnp.asarray(normals[j]),
                jnp.asarray(offsets[j])))
        print(error / max(n, 1))
        print()


if __name__ == "__main__":
    main()
