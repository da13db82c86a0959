"""Real 2-process multi-host training test (VERDICT round-3 task 3).

Launches actual OS processes through ``tools/run_multihost.py`` — each a
full ``train.py --multihost`` worker with its own JAX runtime, joined via
``jax.distributed.initialize`` on a localhost coordinator with Gloo CPU
collectives. Unlike the monkeypatched process_index tests in test_cli.py,
this exercises collective init order, real disjoint input shards,
``make_array_from_process_local_data`` global-batch assembly and the
main-process-only writer gating, and checks the 2-process run computes the
SAME parameters as a 1-process run over the same global batches.

Stochastic augmentation is disabled for the parity check: the shared
augmentation RNG stream is consumed per-process in shard order, so its
draws differ across topologies (real multi-host runs keep it on — it is
randomness, not state that needs cross-topology reproducibility).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.run_multihost import launch  # noqa: E402


def _overrides(root, anno):
    return {
        "max_instances": 2, "max_positives": 16, "vnl_samples": 32,
        "max_size": 64, "max_iter": 4, "lr_steps": [2],
        "augment": {"photometric_distort": False, "random_mirror": False,
                    "random_flip": False},
        "dataset": {"train_images": root + "/", "train_info": anno},
    }


def _train_args(save_folder, overrides):
    return ["--config", "PlaneRecNet_tiny_config",
            "--cfg_overrides", json.dumps(overrides),
            "--save_folder", save_folder + "/",
            "--batch_size", "2", "--num_workers", "1",
            "--validation_epoch", "0", "--no_tensorboard",
            "--save_interval", "100", "--no_autoscale",
            "--reproductablity"]


def _final_ckpt(save_folder):
    files = [f for f in os.listdir(save_folder) if f.endswith(".npz")]
    assert files, f"no checkpoint written in {save_folder}"
    assert len(files) == 1, files
    return os.path.join(save_folder, files[0])


@pytest.mark.slow
def test_two_process_run_matches_single_process(tmp_path):
    from test_data import _write_synthetic_scannet

    root = str(tmp_path / "scans")
    os.makedirs(root)
    anno = _write_synthetic_scannet(root)
    overrides = _overrides(root, anno)

    save1 = str(tmp_path / "w1")
    save2 = str(tmp_path / "w2")
    os.makedirs(save1)
    os.makedirs(save2)

    # 1 process x 2 local devices: the reference trajectory.
    launch(1, 2, _train_args(save1, overrides),
           log_dir=str(tmp_path / "log1"), timeout=1200)

    # 2 processes x 1 device each over the same global batch.
    logs = launch(2, 1, _train_args(save2, overrides),
                  log_dir=str(tmp_path / "log2"), timeout=1200,
                  extra_env={"PRN_DEBUG_BATCH_SUM": "1"})

    # exactly one process writes checkpoints
    ckpt1 = _final_ckpt(save1)
    ckpt2 = _final_ckpt(save2)

    # disjoint per-process shards: the per-iteration batch checksums of the
    # two workers never coincide (each loads only its own slice)
    sums = {}
    for pid, log in enumerate(logs):
        with open(log) as f:
            for line in f:
                if "batch_sum" in line:
                    it = int(line.split("iter")[1].split()[0])
                    sums.setdefault(it, {})[pid] = float(
                        line.rsplit(" ", 1)[1])
    assert len(sums) >= 4, f"expected 4 iterations of sums, got {sums}"
    for it, by_pid in sums.items():
        assert len(by_pid) == 2
        assert by_pid[0] != by_pid[1], f"iter {it}: identical shards"

    # the 2-process run computed the same training trajectory
    a = np.load(ckpt1)
    b = np.load(ckpt2)
    assert set(a.files) == set(b.files)
    assert int(a["step"]) == int(b["step"]) == 4
    for key in a.files:
        if a[key].dtype.kind == "f":
            np.testing.assert_allclose(
                a[key], b[key], rtol=2e-4, atol=2e-5,
                err_msg=f"leaf {key} diverged between topologies")
        else:
            np.testing.assert_array_equal(a[key], b[key])

    # main-process gating: worker 1 printed no progress lines
    with open(logs[1]) as f:
        w1 = f.read()
    assert "Begin training!" not in w1
    assert "Saving state" not in w1
