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


def test_official_parity_thresholds():
    """A flagless eval run must use the PRESET thresholds — the
    configuration the reference actually evaluated with (its CLI override
    is wiped by a second set_cfg, reference eval.py:377-387), i.e. the one
    behind the published Table-2 metrics."""
    import eval as eval_cli

    args = eval_cli.parse_args(["--config", "PlaneRecNet_50_config"])
    cfg = eval_cli.apply_nms_overrides(PlaneRecNet_50_config, args)
    # reference data/config.py:319-333 presets (== reference-actual run)
    assert cfg.solov2.score_thr == 0.1
    assert cfg.solov2.mask_thr == 0.1
    assert cfg.solov2.update_thr == 0.15
    assert cfg.solov2.top_k == 100
    assert cfg.solov2.nms_type == "matrix"
    # flagless => the config object is untouched (no silent rebuild)
    assert cfg.solov2 is PlaneRecNet_50_config.solov2

    # explicit flags do what their help text says
    args = eval_cli.parse_args([
        "--config", "PlaneRecNet_50_config",
        "--score_threshold", "0.3", "--mask_threshold", "0.2",
        "--update_threshold", "0.4", "--top_k", "17",
        "--nms_mode", "mask"])
    cfg = eval_cli.apply_nms_overrides(PlaneRecNet_50_config, args)
    assert cfg.solov2.score_thr == 0.3
    assert cfg.solov2.mask_thr == 0.2
    assert cfg.solov2.update_thr == 0.4
    assert cfg.solov2.top_k == 17
    assert cfg.solov2.nms_type == "mask"


def _train_cfg(tmp_path, **over):
    """Tiny trainable config over the synthetic on-disk ScanNet set."""
    from test_data import _write_synthetic_scannet
    from planerecnet_tpu.config import PlaneRecNet_tiny_config

    root = str(tmp_path / "scans")
    os.makedirs(root, exist_ok=True)
    anno = _write_synthetic_scannet(root)
    cfg = PlaneRecNet_tiny_config.copy(dict(
        max_instances=2, max_positives=16, vnl_samples=32, max_size=64,
        max_iter=2, lr_steps=(1,),
    ))
    base = dict(dataset=cfg.dataset.copy(dict(
        train_images=root + "/", train_info=anno)))
    base.update(over)
    return cfg.copy(base)


def _train_args(tmp_path, extra=()):
    return ["--config", "PlaneRecNet_tiny_config",
            "--save_folder", str(tmp_path / "weights") + "/",
            "--log_folder", str(tmp_path / "logs") + "/",
            "--batch_size", "2", "--num_workers", "1",
            "--validation_epoch", "0", "--n_devices", "1",
            "--save_interval", "1", "--no_autoscale"] + list(extra)


def test_train_non_main_process_writes_nothing(tmp_path, monkeypatch):
    """In a multi-host run a non-zero process must not create TensorBoard
    writers, print progress, or write checkpoint files (checkpoint races on
    shared storage; VERDICT r2 weak item 4)."""
    import jax
    import train

    cfg = _train_cfg(tmp_path)
    monkeypatch.setattr(train, "set_cfg", lambda name: cfg)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    monkeypatch.setattr(jax, "process_count", lambda: 2)

    # --reproductablity: a deterministic seed skips the broadcast collective
    # (which cannot run under a monkeypatched process_count; the REAL
    # 2-process broadcast path is covered by tests/test_multihost.py)
    train.main(_train_args(tmp_path, ["--reproductablity"]))

    weights = tmp_path / "weights"
    saved = [p for p in weights.iterdir()] if weights.exists() else []
    assert saved == [], f"non-main process wrote checkpoints: {saved}"
    logs = tmp_path / "logs"
    assert not logs.exists() or list(logs.iterdir()) == []


def test_train_main_process_saves_and_interrupt(tmp_path, monkeypatch):
    """Process 0 writes periodic checkpoints; a KeyboardInterrupt raised by
    the very first step (the compile window — the likeliest ctrl-C moment)
    still lands an ``*_interrupt`` checkpoint (reference train.py:404-410)."""
    import train
    from planerecnet_tpu.utils import SavePath

    cfg = _train_cfg(tmp_path)
    monkeypatch.setattr(train, "set_cfg", lambda name: cfg)
    train.main(_train_args(tmp_path))
    weights = tmp_path / "weights"
    saved = sorted(p.name for p in weights.iterdir())
    assert saved, "main process saved no checkpoints"

    # Interrupt on the first step call, before any iteration completes.
    def exploding_step(cfg_, mesh, spatial=False):
        def step(state, batch):
            raise KeyboardInterrupt
        return step

    monkeypatch.setattr(train, "jit_train_step", exploding_step)
    tmp2 = tmp_path / "run2"
    os.makedirs(tmp2)
    cfg2 = _train_cfg(tmp2)
    monkeypatch.setattr(train, "set_cfg", lambda name: cfg2)
    train.main(_train_args(tmp2))
    interrupt = SavePath.get_interrupt(str(tmp2 / "weights") + "/")
    assert interrupt and "interrupt" in interrupt


def test_train_host_rss_guard_checkpoints_and_exits_75(tmp_path,
                                                       monkeypatch):
    """With --max_host_rss_gb below the process footprint the guard must
    checkpoint after the first completed iteration and exit with the
    recycle code 75, and --resume latest must find that checkpoint
    (the supervisor contract used by tools/closed_loop.py to survive the
    remote-TPU PJRT host-transfer leak, PERF.md round 4)."""
    import pytest
    import train
    from planerecnet_tpu.utils import SavePath

    cfg = _train_cfg(tmp_path)
    monkeypatch.setattr(train, "set_cfg", lambda name: cfg)
    with pytest.raises(SystemExit) as exc:
        train.main(_train_args(tmp_path, ["--max_host_rss_gb", "0.001"]))
    assert exc.value.code == train.RECYCLE_EXIT_CODE
    latest = SavePath.get_latest(str(tmp_path / "weights") + "/", cfg.name)
    assert latest is not None
    assert SavePath.from_str(latest).iteration == 1


def test_evaluate_batched_matches_batch1(tmp_path):
    """evaluate(batch_size=2) must reproduce the batch-1 metrics exactly
    (tail padding discarded; per-image bookkeeping unchanged)."""
    import random

    import eval as eval_script
    from planerecnet_tpu.data import BaseTransform, build_dataset
    from planerecnet_tpu.runner import PlaneRecNetRunner

    cfg = _train_cfg(tmp_path)
    cfg = cfg.copy(dict(solov2=cfg.solov2.copy(dict(
        score_thr=0.01, update_thr=0.01))))
    ds = build_dataset(cfg, "train", transform=BaseTransform(cfg))
    net = PlaneRecNetRunner(cfg)

    random.seed(5)
    maps1, depth1 = eval_script.evaluate(net, ds, eval_nums=3, no_bar=True,
                                         batch_size=1)
    random.seed(5)
    maps2, depth2 = eval_script.evaluate(net, ds, eval_nums=3, no_bar=True,
                                         batch_size=2)
    np.testing.assert_allclose(np.asarray(depth1), np.asarray(depth2),
                               rtol=1e-5, atol=1e-7)
    assert maps1 == maps2


def test_output_coco_json_dump(tmp_path):
    """--output_coco_json writes score-sorted COCO-format box + mask-RLE
    detections at the ORIGINAL image resolution, decodable by the
    framework's own COCO reader (reference eval.py:41-45 parses these flags
    but never implements the dump)."""
    import random

    import eval as eval_script
    from planerecnet_tpu.data import BaseTransform, build_dataset
    from planerecnet_tpu.data.coco import rle_to_mask
    from planerecnet_tpu.runner import PlaneRecNetRunner

    cfg = _train_cfg(tmp_path)
    cfg = cfg.copy(dict(solov2=cfg.solov2.copy(dict(
        score_thr=0.01, update_thr=0.01))))
    ds = build_dataset(cfg, "train", transform=BaseTransform(cfg))
    net = PlaneRecNetRunner(cfg)

    random.seed(5)
    dumper = eval_script.COCODetectionDumper(ds)
    maps, depth = eval_script.evaluate(net, ds, eval_nums=3, no_bar=True,
                                       batch_size=1, dumper=dumper)
    assert maps is None and depth is None  # dump-only mode skips metrics
    bbox_file = str(tmp_path / "res" / "bbox.json")
    mask_file = str(tmp_path / "res" / "mask.json")
    dumper.dump(bbox_file, mask_file)

    bbox = json.load(open(bbox_file))
    masks = json.load(open(mask_file))
    assert len(bbox) == len(masks) > 0
    img_infos = {i: ds.coco.imgs[i] for i in ds.ids}
    per_image_scores = {}
    for b, m in zip(bbox, masks):
        assert set(b) == {"image_id", "category_id", "bbox", "score"}
        assert set(m) == {"image_id", "category_id", "segmentation",
                          "score"}
        info = img_infos[b["image_id"]]
        oh, ow = info["height"], info["width"]
        # mask decodes at the original resolution
        decoded = rle_to_mask(m["segmentation"])
        assert decoded.shape == (oh, ow)
        # bbox is [x, y, w, h] inside the original image
        x, y, w, h = b["bbox"]
        assert 0 <= x <= ow + 1 and 0 <= y <= oh + 1
        assert 0 <= w <= ow + 1 and 0 <= h <= oh + 1
        per_image_scores.setdefault(b["image_id"], []).append(b["score"])
    for scores in per_image_scores.values():
        assert scores == sorted(scores, reverse=True)


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


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_NPZ = os.path.join(REPO_ROOT,
                          "data/golden/example_nyu_prn50_seed0.npz")


@pytest.mark.slow
def test_pth_golden_on_bundled_asset(tmp_path, monkeypatch):
    """Released-weights-style golden (VERDICT r2 missing item 1): the seeded
    reference PRN-50 state_dict, written to disk as a ``.pth`` and loaded
    through the converter, must reproduce the RECORDED reference outputs
    (tools/make_pth_golden.py) on the bundled ``data/example_nyu.jpg``
    (mirroring the reference's own smoke asset, reference
    planerecnet.py:610-677) — masks, scores, boxes and depth, end to end
    through ``simple_inference.py``'s CLI ``.pth`` path.

    This pins checkpoint-conversion fidelity at realistic weight and
    BN-statistic distributions (the offline stand-in for the ±1% mAP/RMSE
    budget of SURVEY.md §7(e) until the released weights are available).
    """
    torch = pytest.importorskip("torch")
    import simple_inference
    from reference_torch import seeded_prn50_net
    from planerecnet_tpu.ops.image import (calc_size_preserve_ar,
                                           pad_to_multiple)
    from planerecnet_tpu.runner import PlaneRecNetRunner

    g = np.load(GOLDEN_NPZ)
    net, _ = seeded_prn50_net(int(g["seed"]))
    pth = str(tmp_path / "prn50_seeded.pth")
    torch.save(net.state_dict(), pth)
    del net

    thr = float(g["score_thr"])
    cfg = PlaneRecNet_50_config.copy(dict(
        max_size=int(g["max_size"]), compute_dtype="float32",
        solov2=PlaneRecNet_50_config.solov2.copy(dict(
            score_thr=thr, update_thr=1e-6))))

    # --- numeric golden through the .pth loader -------------------------
    runner = PlaneRecNetRunner(cfg)
    runner.load_weights(pth)
    frame = cv2.imread(os.path.join(REPO_ROOT, "data/example_nyu.jpg"))
    h, w, _ = frame.shape
    frame = cv2.resize(frame, calc_size_preserve_ar(w, h, cfg.max_size),
                       interpolation=cv2.INTER_LINEAR)
    frame = pad_to_multiple(frame.astype(np.float32), 32)
    assert tuple(frame.shape[:2]) == tuple(g["input_hw"])

    batched = runner.infer(frame[None])
    valid = np.asarray(batched["pred_valid"][0])
    n_ref = int(g["scores"].shape[0])
    assert int(valid.sum()) == n_ref

    np.testing.assert_allclose(
        np.asarray(batched["pred_scores"][0])[:n_ref], g["scores"],
        rtol=1e-3, atol=1e-4, err_msg="pred_scores")
    np.testing.assert_array_equal(
        np.asarray(batched["pred_classes"][0])[:n_ref], g["classes"])
    np.testing.assert_allclose(
        np.asarray(batched["pred_boxes"][0])[:n_ref], g["boxes"],
        atol=2.0, err_msg="pred_boxes")

    mshape = tuple(int(x) for x in g["masks_shape"])
    ref_masks = np.unpackbits(
        g["masks_packed"], count=int(np.prod(mshape))).reshape(mshape)
    ours = np.asarray(batched["pred_masks"][0])[:n_ref]
    inter = np.logical_and(ours, ref_masks).sum(axis=(1, 2))
    union = np.logical_or(ours, ref_masks).sum(axis=(1, 2))
    iou = inter / np.maximum(union, 1)
    assert (iou > 0.99).all(), iou.min()

    np.testing.assert_allclose(
        np.asarray(batched["pred_depth"][0]), g["depth"],
        rtol=1e-3, atol=1e-3, err_msg="pred_depth")

    # --- CLI smoke: the same .pth + asset through simple_inference ------
    monkeypatch.setattr(simple_inference, "set_cfg", lambda name: cfg)
    out_path = str(tmp_path / "out.jpg")
    simple_inference.main([
        "--image",
        os.path.join(REPO_ROOT, "data/example_nyu.jpg") + ":" + out_path,
        "--trained_model", pth,
        "--score_threshold", str(thr),
    ])
    assert os.path.exists(out_path)
    assert os.path.exists(str(tmp_path / "out_dep.png"))


def test_evaluate_device_metrics_match_host(tmp_path):
    """The on-device pred-vs-GT mask-IoU path (device_metrics=True, the
    default) must reproduce the host readback path bit-for-bit: binary
    masks accumulate exact integers in f32, so the IoU matrices — and
    therefore every AP data point — are identical (runner.py
    ``infer_normalized_with_gt_iou``)."""
    import random

    import eval as eval_script
    from planerecnet_tpu.data import BaseTransform, build_dataset
    from planerecnet_tpu.runner import PlaneRecNetRunner

    cfg = _train_cfg(tmp_path)
    cfg = cfg.copy(dict(solov2=cfg.solov2.copy(dict(
        score_thr=0.01, update_thr=0.01))))
    ds = build_dataset(cfg, "train", transform=BaseTransform(cfg))
    net = PlaneRecNetRunner(cfg)

    random.seed(7)
    maps_host, depth_host = eval_script.evaluate(
        net, ds, eval_nums=3, no_bar=True, batch_size=2,
        device_metrics=False)
    random.seed(7)
    maps_dev, depth_dev = eval_script.evaluate(
        net, ds, eval_nums=3, no_bar=True, batch_size=2,
        device_metrics=True)
    np.testing.assert_array_equal(np.asarray(depth_host),
                                  np.asarray(depth_dev))
    assert maps_host == maps_dev


def test_evaluate_device_metrics_capacity_fallback(tmp_path):
    """A batch containing an image with more GT planes than
    cfg.max_instances must fall back to the host-IoU path (not silently
    truncate GT) and still reproduce the host metrics exactly."""
    import json
    import random

    import eval as eval_script
    from planerecnet_tpu.data import BaseTransform, build_dataset
    from planerecnet_tpu.runner import PlaneRecNetRunner

    cfg = _train_cfg(tmp_path)
    cfg = cfg.copy(dict(solov2=cfg.solov2.copy(dict(
        score_thr=0.01, update_thr=0.01))))
    # Duplicate image-0's annotation until it exceeds max_instances (=2).
    info = cfg.dataset.train_info
    j = json.load(open(info))
    extra = [dict(a, id=100 + i) for a in j["annotations"]
             if a["image_id"] == j["images"][0]["id"] for i in range(3)]
    j["annotations"] = j["annotations"] + extra
    info2 = str(tmp_path / "overcap.json")
    json.dump(j, open(info2, "w"))
    cfg = cfg.copy(dict(dataset=cfg.dataset.copy(dict(train_info=info2))))

    ds = build_dataset(cfg, "train", transform=BaseTransform(cfg))
    net = PlaneRecNetRunner(cfg)
    assert any(len(ds.pull_item(i)[1]["classes"]) > cfg.max_instances
               for i in range(len(ds)))

    random.seed(11)
    maps_host, depth_host = eval_script.evaluate(
        net, ds, eval_nums=3, no_bar=True, batch_size=2,
        device_metrics=False)
    random.seed(11)
    maps_dev, depth_dev = eval_script.evaluate(
        net, ds, eval_nums=3, no_bar=True, batch_size=2,
        device_metrics=True)
    np.testing.assert_array_equal(np.asarray(depth_host),
                                  np.asarray(depth_dev))
    assert maps_host == maps_dev


def test_verify_released_harness_on_seeded_golden(tmp_path, monkeypatch):
    """tools/verify_released.py (the packaged north-star ±1% reproduction
    procedure) must execute end to end on the seeded golden ``.pth``
    stand-in: config parsed from the checkpoint name, conversion + the
    real eval.py flow, the measured-metrics json, and the budget verdict
    logic pinned both ways. The published-table comparison itself stays
    environment-blocked until the released weights exist (BASELINE.md)."""
    torch = pytest.importorskip("torch")
    import copy
    import sys

    sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))
    import eval as eval_script  # resolve OUR eval.py before reference_torch
    import verify_released     # puts /root/reference on sys.path
    from reference_torch import seeded_prn50_net
    from test_data import _write_synthetic_scannet

    net, _ = seeded_prn50_net(0)
    pth = str(tmp_path / "PlaneRecNet_50_9_125000.pth")
    torch.save(net.state_dict(), pth)
    del net

    root = str(tmp_path / "scans")
    os.makedirs(root, exist_ok=True)
    anno = _write_synthetic_scannet(root)

    # Run eval.py IN-PROCESS (the conftest pins the CPU platform; a
    # subprocess would grab the TPU plugin and full-size compiles).
    def call_inproc(cmd, cwd=None):
        assert cmd[1].endswith("eval.py"), cmd
        eval_script.main(cmd[2:])
        return 0

    monkeypatch.setattr(verify_released.subprocess, "call", call_inproc)

    # num_grids must stay at the preset: the depth decoder's cross-task
    # injection width depends on it, so changing it would break loading
    # the full checkpoint. max_size & postprocess caps are param-free.
    tiny = json.dumps({
        "max_size": 64, "max_instances": 4, "max_positives": 16,
        "solov2": {"max_candidates": 32, "nms_pre": 32, "top_k": 8}})
    mjson = str(tmp_path / "measured.json")
    with pytest.raises(SystemExit) as e:
        verify_released.main([
            "--pth", pth, "--images", root, "--annotations", anno,
            "--max_images", "2", "--metrics_json", mjson,
            "--cfg_overrides", tiny])
    # seeded random-ish weights on synthetic data won't hit Table 2; the
    # harness must still complete and emit the measured metrics.
    assert e.value.code in (0, 1)
    with open(mjson) as f:
        measured = json.load(f)
    assert "mask" in measured and "box" in measured and "depth" in measured
    assert set(measured["depth"]) >= {"abs_rel", "rmse", "a1"}

    # Verdict logic: an identical table passes the ±1% budget...
    table = {k: dict(measured[k]) for k in ("mask", "box", "depth")}
    assert verify_released.compare(measured, copy.deepcopy(table), 1.0)
    # ...and a budgeted metric >1% off fails it.
    off = copy.deepcopy(table)
    off["depth"]["rmse"] = float(off["depth"]["rmse"]) * 1.05 + 0.01
    assert not verify_released.compare(measured, off, 1.0)


def test_simple_inference_score_threshold_remap(monkeypatch):
    """simple_inference's --score_threshold overrides mask_thr AND
    update_thr and leaves score_thr at the preset — the reference CLI's
    actual remap (reference simple_inference.py:330-338), deliberately
    DIFFERENT from eval.py's pinned score_thr semantics (eval.py:46-80);
    both are documented in their own help text."""
    import simple_inference

    captured = {}

    class _Stub:
        def __init__(self, cfg):
            captured["cfg"] = cfg
            raise RuntimeError("stop after config resolution")

    monkeypatch.setattr(simple_inference, "PlaneRecNetRunner", _Stub)
    with pytest.raises(RuntimeError):
        simple_inference.main(["--image", "x:y",
                               "--config", "PlaneRecNet_50_config",
                               "--score_threshold", "0.42"])
    cfg = captured["cfg"]
    assert cfg.solov2.mask_thr == 0.42
    assert cfg.solov2.update_thr == 0.42
    assert cfg.solov2.score_thr == PlaneRecNet_50_config.solov2.score_thr


def test_roofline_dcn_byte_accounting():
    """tools/roofline.py --dcn_bytes: the gather-floor accounting in
    PERF.md's round-5 roofline section. Pins the per-stage DCN block
    counts to the backbone's own _stage_plan (PRN-50: 4/6/3 = 13 blocks,
    PRN-101 interval-3: 2/8/1 = 11 — the counts every DCN perf claim in
    PERF.md relies on) and the bytes/image formula H*W*9taps*4corners*
    C*2 (bf16) against a hand computation."""
    import argparse
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import roofline

    from planerecnet_tpu.config import PlaneRecNet_101_config

    args = argparse.Namespace(config="PlaneRecNet_50_config",
                              height=480, width=640, gather_gbs=None)
    total = roofline.dcn_bytes(PlaneRecNet_50_config, args)
    # conv3: 4 x 60*80*36*128*2; conv4: 6 x 30*40*36*256*2;
    # conv5: 3 x 15*20*36*512*2
    expect = (4 * 60 * 80 * 36 * 128 * 2 + 6 * 30 * 40 * 36 * 256 * 2
              + 3 * 15 * 20 * 36 * 512 * 2)
    assert total == expect

    args.config = "PlaneRecNet_101_config"
    total101 = roofline.dcn_bytes(PlaneRecNet_101_config, args)
    expect101 = (2 * 60 * 80 * 36 * 128 * 2 + 8 * 30 * 40 * 36 * 256 * 2
                 + 1 * 15 * 20 * 36 * 512 * 2)
    assert total101 == expect101
