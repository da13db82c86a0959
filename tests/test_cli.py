"""CLI smoke tests: simple_inference on a synthetic image, eval loop on the
synthetic dataset — with a tiny config patched in so the CPU compile stays
fast."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax

from planerecnet_tpu.config import PlaneRecNet_50_config


def _tiny_cfg(**over):
    cfg = PlaneRecNet_50_config
    base = dict(
        max_size=64, max_instances=4, max_positives=16, vnl_samples=32,
        solov2=cfg.solov2.copy(dict(
            num_grids=(10, 9, 6, 4), max_candidates=32, nms_pre=32,
            top_k=8)),
    )
    base.update(over)
    return cfg.copy(base)


def test_simple_inference_single_image(tmp_path, monkeypatch):
    import simple_inference

    img_path = str(tmp_path / "in.jpg")
    rng = np.random.RandomState(0)
    cv2.imwrite(img_path, (rng.rand(48, 64, 3) * 255).astype(np.uint8))
    out_path = str(tmp_path / "out.jpg")

    tiny = _tiny_cfg()
    monkeypatch.setattr(simple_inference, "set_cfg", lambda name: tiny)
    simple_inference.main([
        "--image", f"{img_path}:{out_path}",
        "--config", "PlaneRecNet_50_config",
        "--score_threshold", "0.05",
    ])
    assert os.path.exists(out_path)
    assert os.path.exists(str(tmp_path / "out_dep.png"))
    seg = cv2.imread(out_path)
    assert seg.shape[:2] == (64, 64)  # 48x64 -> resized long side 64, pad /32
    dep = cv2.imread(str(tmp_path / "out_dep.png"))
    assert dep is not None


def test_display_on_frame_runs():
    from simple_inference import display_on_frame

    cfg = _tiny_cfg()
    frame = (np.random.RandomState(1).rand(32, 32, 3) * 255).astype(
        np.float32)
    masks = np.zeros((2, 32, 32), bool)
    masks[0, 4:12, 4:12] = True
    masks[1, 16:28, 16:28] = True
    result = {
        "pred_masks": masks,
        "pred_boxes": np.array([[4, 4, 12, 12], [16, 16, 28, 28]],
                               np.float32),
        "pred_classes": np.array([0, 0]),
        "pred_scores": np.array([0.9, 0.7], np.float32),
        "pred_depth": np.ones((32, 32), np.float32),
    }
    blended, depth = display_on_frame(result, frame, cfg)
    assert blended.shape == (32, 32, 3)
    assert blended.dtype == np.uint8
    assert depth.shape == (32, 32)
    # masked region changed vs raw frame
    assert np.abs(blended[5, 5].astype(int)
                  - frame[5, 5].astype(int)).sum() > 0


def test_bench_json_shape(monkeypatch, capsys):
    """bench.py must print exactly one parseable JSON line."""
    import bench

    tiny = _tiny_cfg()
    import planerecnet_tpu.config as config_mod
    monkeypatch.setattr(config_mod, "set_cfg", lambda name: tiny)
    monkeypatch.setattr(
        "sys.argv",
        ["bench.py", "--iters", "2", "--warmup", "1",
         "--height", "64", "--width", "64"])
    # bench imports set_cfg lazily from planerecnet_tpu.config
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(payload)
    assert payload["value"] > 0


def test_ibims1_pipelines(tmp_path, monkeypatch):
    """iBims-1 .mat reader/writer + PCA plane-depth re-render
    (reference simple_inference.py:202-324)."""
    scipy_io = pytest.importorskip("scipy.io")
    import simple_inference
    from planerecnet_tpu.runner import PlaneRecNetRunner

    in_dir = tmp_path / "ibims_in"
    out_dir = tmp_path / "ibims_out"
    in_dir.mkdir()
    rng = np.random.RandomState(0)
    rgb = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    calib = np.array([[50.0, 0, 0], [0, 50.0, 0], [32.0, 32.0, 1.0]])
    data = np.zeros((1, 1), dtype=[("rgb", "O"), ("calib", "O")])
    data["rgb"][0, 0] = rgb
    data["calib"][0, 0] = calib
    scipy_io.savemat(str(in_dir / "scene1.mat"), {"data": data})

    net = PlaneRecNetRunner(_tiny_cfg(solov2=_tiny_cfg().solov2.copy(
        dict(score_thr=0.01, update_thr=0.01))))
    simple_inference.ibims1(net, str(in_dir), str(out_dir))
    assert (out_dir / "scene1_results.mat").exists()
    assert (out_dir / "scene1_results.png").exists()
    pred = scipy_io.loadmat(str(out_dir / "scene1_results.mat"))
    assert pred["pred_depths"].shape == (64, 64)

    out_dir2 = tmp_path / "ibims_pd_out"
    simple_inference.ibims1_pd(net, str(in_dir), str(out_dir2))
    assert (out_dir2 / "scene1_results.mat").exists()
    pred2 = scipy_io.loadmat(str(out_dir2 / "scene1_results.mat"))
    assert pred2["pred_depths"].shape == (64, 64)
