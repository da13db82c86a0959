"""Record the reference network's outputs on the bundled smoke asset.

Builds the seeded reference PlaneRecNet-50 (``tests/reference_torch.py::
seeded_prn50_net`` — deterministic weights with realistic BN statistics, the
offline stand-in for the released ``.pth``), runs the *reference* inference
pipeline (reference simple_inference.py:143-177: aspect-preserving resize,
/32 pad, FastBaseTransform, eval forward) on ``data/example_nyu.jpg``
(mirroring the reference's bundled asset, reference planerecnet.py:610-677),
and writes the outputs to ``data/golden/example_nyu_prn50_seed0.npz``.

``tests/test_cli.py::test_pth_golden_on_bundled_asset`` then asserts that
loading the same seeded state_dict through the ``.pth`` converter reproduces
these masks/scores/boxes/depth end to end — pinning checkpoint-conversion
fidelity at realistic weight/BN distributions without the released weights.

Run from the repo root:  python tools/make_pth_golden.py
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, REPO)

MAX_SIZE = 160   # keep the CPU torch forward affordable in the test suite
SEED = 0


def main():
    import cv2
    import torch

    from reference_torch import seeded_prn50_net

    net, ref_config = seeded_prn50_net(SEED)

    # Reference preprocessing (reference simple_inference.py:146-153 with
    # funcs.calc_size_preserve_ar + funcs.pad_even_divided, then
    # FastBaseTransform's normalize — done inline because the reference
    # module hard-codes ``.cuda()`` at construction,
    # reference data/augmentations.py:506-507).
    from models.functions.funcs import calc_size_preserve_ar  # reference
    from models.functions.funcs import pad_even_divided  # reference

    frame = cv2.imread(os.path.join(REPO, "data/example_nyu.jpg"))
    h, w, _ = frame.shape
    frame = cv2.resize(frame, calc_size_preserve_ar(w, h, MAX_SIZE),
                       interpolation=cv2.INTER_LINEAR)
    frame = pad_even_divided(frame).astype(np.float32)
    means = np.asarray(ref_config.MEANS, np.float32)
    std = np.asarray(ref_config.STD, np.float32)
    norm = (frame - means) / std          # BGR, HWC
    batch = torch.from_numpy(
        norm[..., ::-1].copy()).permute(2, 0, 1).unsqueeze(0)  # RGB, NCHW

    # Random-init cate scores sit near the focal prior; pick a threshold
    # that admits ~80 candidates so the full post-processing pipeline
    # (area filter, maskness rescore, matrix-NMS, top-k) is exercised.
    with torch.no_grad():
        net.train()
        net.freeze_bn()
        mask_p, cate_p, kernel_p, depth_p = net(batch)
        import torch.nn.functional as F
        flat = []
        for cp in cate_p:
            s = torch.sigmoid(cp)
            peaks = F.max_pool2d(s, (2, 2), stride=1, padding=1)
            flat.append((s * (peaks[:, :, :-1, :-1] == s).float()).flatten())
        flat = torch.cat(flat).numpy()
    thr = float(np.quantile(flat, 1 - 80 / flat.size))

    net.score_threshold = thr
    net.update_threshold = 1e-6
    net.eval()
    with torch.no_grad():
        results = net(batch)
    res = results[0]

    masks = res["pred_masks"].numpy().astype(bool)
    out = dict(
        max_size=np.int32(MAX_SIZE),
        seed=np.int32(SEED),
        score_thr=np.float64(thr),
        input_hw=np.asarray(frame.shape[:2], np.int32),
        scores=res["pred_scores"].numpy().astype(np.float32),
        classes=res["pred_classes"].numpy().astype(np.int32),
        boxes=res["pred_boxes"].numpy().astype(np.float32),
        masks_shape=np.asarray(masks.shape, np.int32),
        masks_packed=np.packbits(masks),
        depth=res["pred_depth"].numpy()[0, 0].astype(np.float32),
    )
    os.makedirs(os.path.join(REPO, "data/golden"), exist_ok=True)
    path = os.path.join(REPO, "data/golden/example_nyu_prn50_seed0.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: {masks.shape[0]} instances, thr={thr:.6f}, "
          f"input {frame.shape}, {os.path.getsize(path) / 1024:.0f} KiB")


if __name__ == "__main__":
    main()
