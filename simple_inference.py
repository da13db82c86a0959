"""PlaneRecNet-TPU inference CLI.

Preserves the reference CLI surface (reference simple_inference.py:25-369):
``--image in[:out]``, ``--images in:out``, ``--ibims1 in:out``,
``--ibims1_pd in:out``, display toggles and NMS overrides — with the whole
compute path (preprocess -> model -> post-process) running as one jitted XLA
program per input shape.
"""

import argparse
import os
from collections import defaultdict
from pathlib import Path

import numpy as np

import cv2

from planerecnet_tpu.config import COLORS, set_cfg
from planerecnet_tpu.ops.image import calc_size_preserve_ar, pad_to_multiple
from planerecnet_tpu.runner import PlaneRecNetRunner
from planerecnet_tpu.utils import timer

color_cache = defaultdict(dict)
args = None


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="PlaneRecNet Inference")
    parser.add_argument("--trained_model", default=None, type=str,
                        help="Trained weights file (.npz, or reference .pth "
                             "to auto-convert).")
    parser.add_argument("--config", default="PlaneRecNet_50_config",
                        help="The config object to use.")
    parser.add_argument("--image", default=None, type=str,
                        help="Inference with a single image (in[:out]).")
    parser.add_argument("--images", default=None, type=str,
                        help="Inference with multiple images (in:out).")
    parser.add_argument("--max_img", default=0, type=int)
    parser.add_argument("--ibims1", default=None, type=str,
                        help="iBims-1 .mat outputs (in:out).")
    parser.add_argument("--ibims1_pd", default=None, type=str,
                        help="iBims-1 with PCA plane-depth re-render.")
    parser.add_argument("--no_mask", action="store_true")
    parser.add_argument("--no_box", action="store_true")
    parser.add_argument("--no_text", action="store_true")
    parser.add_argument("--top_k", default=100, type=int)
    parser.add_argument("--nms_mode", default="matrix", type=str,
                        choices=["matrix", "mask"])
    # NB: --score_threshold here does NOT mean what it means in eval.py.
    # This CLI preserves the reference's remap VERBATIM (reference
    # simple_inference.py:330-338): the flag overrides mask_thr AND
    # update_thr (binarisation + post-NMS rescored-confidence filter)
    # while score_thr stays at the config preset — so reference users'
    # muscle memory ("--score_threshold 0.5 shows fewer masks") carries
    # over exactly. eval.py instead pins the flag to score_thr with its
    # own documented reference-actual semantics (eval.py:46-80), because
    # the published metrics depend on the preset thresholds. Pinned by
    # tests/test_cli.py::test_simple_inference_score_threshold_remap.
    parser.add_argument("--score_threshold", default=0.3, type=float,
                        help="Reference-exact remap: overrides mask_thr "
                             "and update_thr (NOT score_thr) — the "
                             "reference CLI's actual behaviour "
                             "(simple_inference.py:330-338).")
    parser.add_argument("--depth_mode", default="colored", type=str,
                        choices=["colored", "gray"])
    parser.add_argument("--depth_shift", default=512, type=float)
    global args
    args = parser.parse_args(argv)
    return args


def get_color(j):
    color_idx = (j * 5) % len(COLORS)
    color = COLORS[color_idx]
    return (color[2], color[1], color[0])


def display_on_frame(result, frame, cfg, mask_alpha=0.5, no_mask=False,
                     no_box=False, no_text=False, det_index=0):
    """Alpha-blend masks + contours + boxes + labels onto a BGR frame
    (reference simple_inference.py:49-140). ``result`` holds numpy arrays for
    one image; invalid prediction slots are pre-filtered by the caller."""
    frame_f = frame.astype(np.float32) / 255.0
    pred_depth = np.asarray(result["pred_depth"])
    pred_scores = result["pred_scores"]
    num_dets = 0 if pred_scores is None else len(pred_scores)

    if no_mask or num_dets == 0:
        return frame.astype(np.uint8), pred_depth

    pred_masks = np.asarray(result["pred_masks"], np.float32)
    pred_boxes = np.asarray(result["pred_boxes"])
    pred_classes = np.asarray(result["pred_classes"])

    for j in range(num_dets):
        color = np.asarray(get_color(j), np.float32) / 255.0
        m = pred_masks[j][:, :, None]
        frame_f = frame_f * (1 - mask_alpha * m) + m * color * mask_alpha
    frame_numpy = (frame_f * 255).astype(np.uint8)

    for j in range(num_dets):
        mask_np = pred_masks[j].astype(np.uint8)
        contours, _ = cv2.findContours(mask_np, cv2.RETR_TREE,
                                       cv2.CHAIN_APPROX_SIMPLE)
        cv2.drawContours(frame_numpy, contours, -1, (255, 255, 255), 1)

    if not (no_text and no_box):
        for j in reversed(range(num_dets)):
            x1, y1, x2, y2 = pred_boxes[j].astype(int)
            color = get_color(j)
            score = float(pred_scores[j])
            if not no_box:
                cv2.rectangle(frame_numpy, (x1, y1), (x2, y2), color, 1)
            if not no_text:
                _class = cfg.dataset.class_names[
                    min(int(pred_classes[j]),
                        len(cfg.dataset.class_names) - 1)]
                text_str = "%s: %.2f" % (_class, score)
                font = cv2.FONT_HERSHEY_DUPLEX
                tw, th = cv2.getTextSize(text_str, font, 0.6, 1)[0]
                cv2.rectangle(frame_numpy, (x1, y1),
                              (x1 + tw, y1 + th + 4), color, -1)
                cv2.putText(frame_numpy, text_str, (x1, y1 + th + 1), font,
                            0.6, [255, 255, 255], 1, cv2.LINE_AA)
    return frame_numpy, pred_depth


def _valid_result(batched, idx=0):
    """Slice one image out of the batched fixed-shape output and drop
    invalid slots (the dynamic-shape boundary lives on host, off the
    jitted path)."""
    valid = np.asarray(batched["pred_valid"][idx])
    clip = np.asarray(batched.get("candidates_clipped",
                                  np.zeros(1))).reshape(-1)
    if bool(clip[min(idx, clip.size - 1)]):
        print("WARNING: >max_candidates cells passed score_thr; overflow "
              "candidates were dropped before mask scoring (raise "
              "cfg.solov2.max_candidates or score_thr for exact reference "
              "semantics).")
    out = {"pred_depth": np.asarray(batched["pred_depth"][idx])}
    if valid.any():
        for k in ("pred_masks", "pred_scores", "pred_classes", "pred_boxes"):
            out[k] = np.asarray(batched[k][idx])[valid]
    else:
        for k in ("pred_masks", "pred_scores", "pred_classes", "pred_boxes"):
            out[k] = None
    return out


def save_depth(depth, depth_path, depth_mode="colored", depth_shift=512.0):
    if depth_mode == "colored":
        vmin = np.percentile(depth, 1)
        vmax = np.percentile(depth, 99)
        depth = depth.clip(min=vmin, max=vmax)
        rng = max(depth.max() - depth.min(), 1e-12)
        depth = ((depth - depth.min()) / rng * 255).astype(np.uint8)
        cv2.imwrite(depth_path, cv2.applyColorMap(depth,
                                                  cv2.COLORMAP_VIRIDIS))
    else:
        cv2.imwrite(depth_path, (depth * depth_shift).astype(np.uint16))


def inference_image(net: PlaneRecNetRunner, path: str, save_path: str = None,
                    depth_mode: str = "colored", no_mask=False, no_box=False,
                    no_text=False, depth_shift=512.0):
    """Single-image pipeline (reference simple_inference.py:143-177)."""
    frame_np = cv2.imread(path)
    if frame_np is None:
        return
    h, w, _ = frame_np.shape
    frame_np = cv2.resize(frame_np, calc_size_preserve_ar(
        w, h, net.cfg.max_size), interpolation=cv2.INTER_LINEAR)
    frame_np = pad_to_multiple(frame_np.astype(np.float32), 32)

    batched = net.infer(frame_np[None])
    result = _valid_result(batched, 0)
    blended, depth = display_on_frame(result, frame_np, net.cfg,
                                      no_mask=no_mask, no_box=no_box,
                                      no_text=no_text)
    if save_path is None:
        name, ext = os.path.splitext(path)
        save_path = name + "_seg" + ext
        depth_path = name + "_dep.png"
    else:
        name, ext = os.path.splitext(save_path)
        depth_path = name + "_dep.png"
    cv2.imwrite(save_path, blended)
    save_depth(depth, depth_path, depth_mode, depth_shift)


def inference_images(net, in_folder, out_folder, max_img=0,
                     depth_mode="colored", **kw):
    """Folder pipeline (reference simple_inference.py:180-199)."""
    os.makedirs(out_folder, exist_ok=True)
    index = 0
    input_list = list(Path(in_folder).glob("*"))
    max_img = min(max_img, len(input_list)) if max_img > 0 else len(input_list)
    for p in sorted(input_list):
        img_path = str(p)
        name, ext = os.path.splitext(os.path.basename(img_path))
        if ext not in (".png", ".jpg"):
            continue
        out_path = os.path.join(out_folder, name + ext)
        inference_image(net, img_path, out_path, depth_mode=depth_mode, **kw)
        print("Inference images: " + os.path.basename(img_path) + " -> "
              + os.path.basename(out_path), end="\r")
        index += 1
        if index >= max_img:
            break
    print("\nDone.")


def ibims1(net, in_folder, out_folder):
    """iBims-1 .mat depth pipeline (reference simple_inference.py:202-237)."""
    import scipy.io
    os.makedirs(out_folder, exist_ok=True)
    for p in sorted(Path(in_folder).glob("*")):
        img_path = str(p)
        name, ext = os.path.splitext(os.path.basename(img_path))
        if ext != ".mat":
            continue
        depth_out_path = os.path.join(out_folder, name + "_results.mat")
        data = scipy.io.loadmat(img_path)["data"]
        rgb = data["rgb"][0][0]
        if rgb is None:
            return
        batched = net.infer(np.asarray(rgb, np.float32)[None])
        pred_depth = np.asarray(batched["pred_depth"][0])
        scipy.io.savemat(depth_out_path, {"pred_depths": pred_depth})
        save_depth(pred_depth, depth_out_path.replace(".mat", ".png"))
        print(os.path.basename(img_path), end="\r")
    print("\nDone.")


def pca_svd(pts: np.ndarray):
    """Least-squares plane fit: mean + smallest-eigenvalue direction
    (reference funcs.py:287-292)."""
    mean = pts.mean(axis=0)
    adj = pts - mean
    h = adj.T @ adj
    u, s, _ = np.linalg.svd(h)
    return mean, u[:, 2]


def ibims1_pd(net, in_folder, out_folder):
    """iBims-1 with per-mask PCA plane fit + plane-depth re-render
    (reference simple_inference.py:240-324)."""
    import scipy.io
    os.makedirs(out_folder, exist_ok=True)
    for p in sorted(Path(in_folder).glob("*")):
        img_path = str(p)
        name, ext = os.path.splitext(os.path.basename(img_path))
        if ext != ".mat":
            continue
        depth_out_path = os.path.join(out_folder, name + "_results.mat")
        data = scipy.io.loadmat(img_path)["data"]
        calib = data["calib"][0][0]
        rgb = data["rgb"][0][0]
        if rgb is None:
            return
        batched = net.infer(np.asarray(rgb, np.float32)[None])
        result = _valid_result(batched, 0)
        pred_depth = np.asarray(result["pred_depth"], np.float64)
        pred_masks = result["pred_masks"]

        if pred_masks is not None:
            k_matrix = np.asarray(calib).T.astype(np.float64)
            k_inv = np.linalg.inv(k_matrix)
            h, w = pred_depth.shape
            u, v = np.meshgrid(np.arange(w), np.arange(h))
            cx, cy = k_matrix[0][2], k_matrix[1][2]
            fx, fy = k_matrix[0][0], k_matrix[1][1]
            z = pred_depth
            x = (u - cx) * z / fx
            y = (v - cy) * z / fy
            point_cloud = np.stack([x, y, z], axis=-1)

            xy1 = np.stack([u.ravel(), v.ravel(),
                            np.ones(h * w)]).astype(np.float64)
            k_inv_dot_xy1 = k_inv @ xy1
            for idx in range(pred_masks.shape[0]):
                mask = pred_masks[idx].astype(bool)
                pts = point_cloud[mask]
                if pts.shape[0] < 3:
                    continue
                center, normal = pca_svd(pts)
                plane_depth = (center @ normal) / (normal @ k_inv_dot_xy1)
                plane_depth = plane_depth.reshape(h, w)
                pred_depth = np.where(mask, plane_depth, pred_depth)

        pred_depth[pred_depth <= 0] = np.nan
        pred_depth[pred_depth >= 10] = np.nan
        scipy.io.savemat(depth_out_path, {"pred_depths": pred_depth})
        finite = np.nan_to_num(pred_depth, nan=0.0)
        save_depth(finite, depth_out_path.replace(".mat", ".png"))
        print(os.path.basename(img_path), end="\r")
    print("\nDone.")


def main(argv=None):
    parse_args(argv)
    timer.disable_all()
    from planerecnet_tpu.utils.utils import enable_tpu_compile_cache
    enable_tpu_compile_cache()
    cfg = set_cfg(args.config)
    cfg = cfg.copy(dict(solov2=cfg.solov2.copy(dict(
        nms_type=args.nms_mode,
        mask_thr=args.score_threshold,
        update_thr=args.score_threshold,
        top_k=args.top_k,
    ))))

    net = PlaneRecNetRunner(cfg)
    if args.trained_model is not None:
        net.load_weights(args.trained_model)
    else:
        backbone_path = "weights/" + cfg.backbone.path
        net.init_weights(backbone_path if os.path.exists(backbone_path)
                         else None)
        print(cfg.backbone.name)

    kw = dict(no_mask=args.no_mask, no_box=args.no_box, no_text=args.no_text,
              depth_shift=args.depth_shift)
    if args.image is not None:
        if ":" in args.image:
            inp, out = args.image.split(":")
            print(f"Inference image: {inp}")
            inference_image(net, inp, out, depth_mode=args.depth_mode, **kw)
        else:
            print(f"Inference image: {args.image}")
            inference_image(net, args.image, depth_mode=args.depth_mode, **kw)
    if args.images is not None:
        inp, out = args.images.split(":")
        inference_images(net, inp, out, max_img=args.max_img,
                         depth_mode=args.depth_mode, **kw)
    if args.ibims1 is not None:
        inp, out = args.ibims1.split(":")
        ibims1(net, inp, out)
    if args.ibims1_pd is not None:
        inp, out = args.ibims1_pd.split(":")
        ibims1_pd(net, inp, out)


if __name__ == "__main__":
    main()
